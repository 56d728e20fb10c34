"""Connected components over near-dup pair graphs."""

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.operators.graph import connected_components, dedup_groups


def _cc_bruteforce(pairs):
    """Driver-side BFS reference."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, out = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        stack, comp = [start], []
        seen.add(start)
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        root = min(comp)
        for n in comp:
            out[n] = root
    return out


def test_components_match_bfs_reference(spark):
    import random

    rng = random.Random(7)
    pairs = {(rng.randrange(200), rng.randrange(200)) for _ in range(150)}
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    assert got == _cc_bruteforce(pairs)


def test_two_components_and_canonicals(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_groups(df).collect()}
    assert {n: rows[n]["component_id"] for n in rows} == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert {n for n in rows if rows[n]["is_canonical"]} == {1, 10}


def test_nonconvergence_raises(spark):
    # a 6-chain needs ~5 rounds; cap at 2 to prove the guard trips
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_star_contraction_matches_bfs_on_random_graphs(spark):
    """Property: large-star/small-star produces the identical label
    assignment as the BFS reference (and hence as min-label
    propagation, tested above against the same reference) across
    random graph shapes."""
    import random

    from etl_cms_spark.operators.graph import connected_components_star

    for seed, n_nodes, n_edges in [(7, 200, 150), (11, 60, 30), (13, 40, 80)]:
        rng = random.Random(seed)
        pairs = {(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)}
        pairs = [(a, b) for a, b in pairs if a != b]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["doc_id"]: r["component_id"]
            for r in connected_components_star(df).collect()
        }
        assert got == _cc_bruteforce(pairs), f"seed={seed}"


def test_star_contraction_handles_long_chain_where_minlabel_raises(spark):
    """The reason the variant exists: a path graph of length 30 needs
    ~30 label-propagation rounds (the default max_iter=25 raises —
    correct failure mode), while star contraction collapses it in
    O(log n) rounds."""
    from etl_cms_spark.operators.graph import connected_components_star

    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df).collect()
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components_star(df).collect()
    }
    assert got == {i: 0 for i in range(31)}


def test_star_contraction_star_and_two_node_fixpoints(spark):
    from etl_cms_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(
        [(5, 9), (100, 40), (40, 73), (40, 41)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components_star(df).collect()
    }
    assert got == {5: 5, 9: 5, 40: 40, 41: 40, 73: 40, 100: 40}


def test_star_contraction_keeps_self_loop_only_nodes(spark):
    """Shared contract: every node appearing in `edges` is labeled.
    A node seen ONLY as a self-loop must come out as its own
    singleton component from BOTH algorithms (star used to drop it)."""
    from etl_cms_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 2), (9, 9), (9, 9)], "id_a long, id_b long"
    )
    want = {(1, 1), (2, 1), (5, 5), (9, 9)}
    for fn in (connected_components, connected_components_star):
        got = {
            (r["doc_id"], r["component_id"]) for r in fn(edges).collect()
        }
        assert got == want, fn.__name__


def test_star_contraction_all_self_loops(spark):
    from etl_cms_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame([(3, 3), (7, 7)], "id_a long, id_b long")
    got = {(r["doc_id"], r["component_id"]) for r in connected_components_star(edges).collect()}
    assert got == {(3, 3), (7, 7)}
