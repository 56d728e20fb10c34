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
