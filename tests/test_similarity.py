import math
import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.operators.similarity import (
    IVFIndex,
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
    srp_lsh_pairs,
)


def _query_vec(embeddings):
    row = embeddings.orderBy("vec_id").first()
    return [float(x) for x in row["embedding"]]


def _perturbed_union(embeddings, eps=0.02):
    """Original vectors ∪ slightly-perturbed copies (id+100000):
    every (i, i+100000) pair has cosine just under 1 — a non-trivial
    recall fixture (identical copies would be found by ANY LSH)."""
    pert = embeddings.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.sequence(F.lit(0), F.size("embedding") - 1),
            lambda x, d: x.cast("float")
            + (F.pmod(F.xxhash64(d, F.col("vec_id")), 200).cast("float") / 100.0 - 1.0)
            * F.lit(eps),
        ).alias("embedding"),
    )
    return embeddings.select("vec_id", "embedding").unionByName(pert)


def test_cosine_topk_matches_python(spark, embeddings):
    q = _query_vec(embeddings)
    got = cosine_topk(embeddings, "embedding", "vec_id", q, k=5).collect()

    rows = embeddings.collect()
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))
    expect = sorted(
        ((round(cos([float(x) for x in r["embedding"]], q), 4), r["vec_id"]) for r in rows),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r["cos_sim"], r["vec_id"]) for r in got] == [(s, i) for s, i in expect]
    assert got[0]["vec_id"] == 0 and got[0]["cos_sim"] == 1.0  # self-match first


def test_ivf_index_recall_at_10(spark, tmp_path):
    """Build the index ONCE over the sf0.1 corpus augmented with 12
    perturbed near-neighbors per vector (26k vectors — real retrieval
    workloads have neighbor structure; uniform-random vectors are the
    no-structure worst case where every ANN index degrades to its
    probe fraction, measured below).  Recall@10 >= 0.9 over 20 queries
    at n_probes=4 of 16 cells, with NO re-assignment pass per query."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    copies = [
        emb.select(
            (F.col("vec_id") + 1000000 * c).alias("vec_id"),
            F.zip_with(
                "embedding",
                F.sequence(F.lit(0), F.size("embedding") - 1),
                lambda x, d: x.cast("float")
                + (F.pmod(F.xxhash64(d, F.col("vec_id"), F.lit(c)), 200).cast("float") / 100.0 - 1.0)
                * F.lit(0.05),
            ).alias("embedding"),
        )
        for c in range(1, 13)
    ]
    corpus = emb
    for cdf in copies:
        corpus = corpus.unionByName(cdf)
    corpus = corpus.localCheckpoint()
    idx_path = os.path.join(str(tmp_path), "ivf")
    idx = IVFIndex.build(corpus, "embedding", "vec_id", idx_path, n_cells=16)
    queries = emb.orderBy("vec_id").limit(20).collect()
    recalls = []
    for r in queries:
        q = [float(x) for x in r["embedding"]]
        exact = {x["vec_id"] for x in cosine_topk(corpus, "embedding", "vec_id", q, k=10).collect()}
        approx = {x["vec_id"] for x in idx.topk(q, k=10, n_probes=4).collect()}
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.9, f"recall@10 = {sum(recalls)/len(recalls):.3f}"


def test_ivf_uniform_data_recall_tracks_probe_fraction(spark, tmp_path):
    """Honest worst case: the raw synthetic embeddings are near
    uniform-random (no cluster structure), where IVF recall cannot
    beat ~probe fraction.  Assert the index still achieves at least
    the probe fraction (i.e. assignment isn't broken) at 8/16 cells."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    idx_path = os.path.join(str(tmp_path), "ivf_u")
    idx = IVFIndex.build(emb, "embedding", "vec_id", idx_path, n_cells=16)
    queries = emb.orderBy("vec_id").limit(10).collect()
    recalls = []
    for r in queries:
        q = [float(x) for x in r["embedding"]]
        exact = {x["vec_id"] for x in cosine_topk(emb, "embedding", "vec_id", q, k=10).collect()}
        approx = {x["vec_id"] for x in idx.topk(q, k=10, n_probes=8).collect()}
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivf_query_prunes_partitions(spark, embeddings, tmp_path):
    """The probe scan must be partition-pruned: its parquet relation
    reads only n_probes of n_cells cell directories."""
    idx_path = os.path.join(str(tmp_path), "ivf")
    idx = IVFIndex.build(embeddings, "embedding", "vec_id", idx_path, n_cells=8)
    q = _query_vec(embeddings)
    plan = idx.topk(q, k=5, n_probes=2)._jdf.queryExecution().executedPlan().toString()
    # the scan must carry a PartitionFilter on `cell` (partition
    # pruning — only n_probes of n_cells directories are read).
    import re

    m = re.search(r"PartitionFilters: \[cell#\d+ IN \(([^)]*)\)\]", plan)
    assert m, f"no partition filter on cell in plan:\n{plan[:2000]}"
    assert len(m.group(1).split(",")) == 2


def test_ivf_wrapper_reuses_persisted_index(spark, embeddings, tmp_path):
    idx_path = os.path.join(str(tmp_path), "ivf")
    q = _query_vec(embeddings)
    first = ivf_topk(embeddings, "embedding", "vec_id", q, k=5, index_path=idx_path).collect()
    mtime = os.path.getmtime(os.path.join(idx_path, "_centroids.json"))
    second = ivf_topk(embeddings, "embedding", "vec_id", q, k=5, index_path=idx_path).collect()
    assert os.path.getmtime(os.path.join(idx_path, "_centroids.json")) == mtime
    assert [tuple(r) for r in first] == [tuple(r) for r in second]
    assert first[0]["vec_id"] == 0


def test_srp_lsh_subset_of_exact(spark, embeddings):
    """Exact precision: every LSH pair passes the exact threshold."""
    both = _perturbed_union(embeddings.limit(150))
    exact = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(both, "embedding", "vec_id", 0.9).collect()}
    lsh = {(r.id_a, r.id_b) for r in srp_lsh_pairs(both, "embedding", "vec_id", 0.9).collect()}
    assert lsh <= exact


def test_srp_lsh_recall(spark, embeddings):
    """Recall >= 0.9 of EXACT pairs on the perturbed fixture — guards
    against a degenerate LSH that returns nothing."""
    both = _perturbed_union(embeddings.limit(150))
    exact = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(both, "embedding", "vec_id", 0.9).collect()}
    assert len(exact) >= 100, "fixture must contain near-dup pairs"
    lsh = {(r.id_a, r.id_b) for r in srp_lsh_pairs(both, "embedding", "vec_id", 0.9).collect()}
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"SRP-LSH recall {recall:.3f} over {len(exact)} exact pairs"


def test_srp_lsh_finds_identical_vectors_always(spark, embeddings):
    """Identical vectors have identical signatures — recall 1.0 by
    construction, independent of banding luck."""
    sub = embeddings.limit(100).select("vec_id", "embedding")
    both = sub.unionByName(sub.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    lsh = {(r.id_a, r.id_b) for r in srp_lsh_pairs(both, "embedding", "vec_id", 0.95).collect()}
    expected = {(r["vec_id"], r["vec_id"] + 100000) for r in sub.select("vec_id").collect()}
    assert expected <= lsh


def test_srp_lsh_plan_has_no_cartesian(spark, embeddings):
    both = _perturbed_union(embeddings.limit(150))
    plan = srp_lsh_pairs(both, "embedding", "vec_id", 0.9)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_srp_cell_portable_py_matches_spark(spark, embeddings):
    """The driver-side cell twin (used to pick probe cells) must agree
    with the Spark expression vector-for-vector — same fold order,
    same doubles."""
    from etl_cms_spark.operators.similarity import srp_cell_portable, srp_cell_portable_py

    rows = embeddings.limit(64).select(
        "vec_id", "embedding", srp_cell_portable(F.col("embedding"), 4).alias("cell")
    ).collect()
    for r in rows:
        assert r["cell"] == srp_cell_portable_py([float(x) for x in r["embedding"]], 4), r["vec_id"]


def test_ivf_portable_topk_finds_perturbed_neighbor(spark, embeddings):
    """A near-identical perturbed copy of the query vector must be
    probed and ranked on top: tiny perturbations only flip a cell bit
    when a projection sits at 0, and the probe ball covers one flip."""
    from etl_cms_spark.operators.similarity import ivf_portable_topk

    both = _perturbed_union(embeddings.limit(500), eps=0.01)
    q = _query_vec(embeddings)
    got = ivf_portable_topk(both, "embedding", "vec_id", q, k=10)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids[0] == 0  # the vector itself
    assert 100000 in ids  # its perturbed twin, found through the probe


def test_ivf_portable_probe_prunes(spark, embeddings):
    """The hamming-ball probe must actually skip most of the corpus
    (guards against a degenerate plane family putting every vector in
    one cell): 5 of 16 cells probed -> well under half the rows scored."""
    from etl_cms_spark.operators.similarity import (
        srp_cell_portable,
        srp_cell_portable_py,
    )

    emb = embeddings.limit(1000)
    q = _query_vec(embeddings)
    qcell = srp_cell_portable_py(q, 4)
    probe = [c for c in range(16) if bin(c ^ qcell).count("1") <= 1]
    cells = emb.select(srp_cell_portable(F.col("embedding"), 4).alias("cell"))
    total = cells.count()
    probed = cells.where(F.col("cell").isin(probe)).count()
    assert 0 < probed < total * 0.6, (probed, total)
