import math

from etl_cms_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
)


def _query_vec(embeddings):
    row = embeddings.orderBy("vec_id").first()
    return [float(x) for x in row["embedding"]]


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


def test_ivf_topk_contains_self_and_is_subset(spark, embeddings):
    q = _query_vec(embeddings)
    exact = {r["vec_id"]: r["cos_sim"] for r in cosine_topk(embeddings, "embedding", "vec_id", q, k=20).collect()}
    approx = ivf_topk(embeddings, "embedding", "vec_id", q, k=5, n_cells=8, n_probes=4).collect()
    assert approx[0]["vec_id"] == 0  # the query vector itself is found
    # approximate scores are true cosine scores (no score distortion)
    for r in approx:
        if r["vec_id"] in exact:
            assert abs(r["cos_sim"] - exact[r["vec_id"]]) < 1e-6


def test_neardup_pairs_blocked_is_subset_of_exact(spark, embeddings):
    sub = embeddings.limit(120)
    exact = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(sub, "embedding", "vec_id", 0.9).collect()}
    blocked = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(sub, "embedding", "vec_id", 0.9, block_bits=2).collect()}
    assert blocked <= exact
