from pyspark.sql import functions as F

from etl_cms_spark.functions import text as X
from etl_cms_spark.operators.textdedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_clusters,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  x ",)], "t string")
    got = [r[0] for r in df.select(X.token_count(F.col("t"))).collect()]
    assert got == [3, 0, 1]


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("hello   world",), ("different",)], "t string"
    )
    fps = [r[0] for r in df.select(X.fingerprint(F.col("t"))).collect()]
    assert fps[0] == fps[1] and fps[0] != fps[2]


def test_quality_and_ratios(spark):
    df = spark.createDataFrame([("the quick brown fox 123!",)], "t string")
    row = df.select(
        X.alpha_ratio(F.col("t")).alias("a"),
        X.digit_ratio(F.col("t")).alias("d"),
        X.stopword_ratio(F.col("t")).alias("s"),
        X.quality_score(F.col("t")).alias("q"),
    ).first()
    assert 0 < row.a < 1 and 0 < row.d < 1
    assert abs(row.s - 0.2) < 1e-9  # 'the' is 1 of 5 tokens
    assert 0 <= row.q <= 1


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of it",), ("der hund und das haus und",), ("le chat et les maisons et le",)],
        "t string",
    )
    got = [r[0] for r in df.select(X.lang_id(F.col("t"))).collect()]
    assert got == ["en", "de", "fr"]


def test_exact_dedup_finds_dupe_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "Same Text, Here!"), (3, "unique")],
        "doc_id long, text string",
    )
    out = exact_dedup(df, "text", "doc_id").collect()
    assert len(out) == 1 and out[0]["keeper_id"] == 1 and out[0]["dup_count"] == 2


def _dup_docs(spark):
    base = "spark merge window hash join filter group sort key value batch stream"
    near = base + " extra"
    other = "completely different words nothing shared with anything else at all ok"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], "doc_id long, text string"
    )


def test_ngram_jaccard_pairs(spark):
    out = ngram_jaccard_pairs(_dup_docs(spark), "text", "doc_id", n=3, threshold=0.5)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5
    assert all(4 not in p for p in pairs)


def test_minhash_recall_on_exact_dupes(spark):
    out = minhash_lsh_pairs(
        _dup_docs(spark), "text", "doc_id", n_hashes=16, bands=4, verify_threshold=0.5
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in pairs  # identical docs always agree on all bands
    assert all(4 not in p for p in pairs)


def test_minhash_agrees_with_exact_jaccard(spark, documents):
    """On the real documents table: every LSH-confirmed pair (exact
    jaccard computed on candidates) must appear in the exhaustive
    exact-jaccard pairs at the same threshold (no false positives;
    recall is probabilistic by design)."""
    docs = documents.limit(200)
    lsh = minhash_lsh_pairs(docs, "text", "doc_id", n_hashes=16, bands=8, verify_threshold=0.7)
    exact = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.7)
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh.collect()}
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    assert lsh_pairs <= exact_pairs


def test_minhash_lsh_recall_on_near_dupes(spark, documents):
    """Recall: a ⊆-only check passes a degenerate LSH that returns
    nothing.  Corpus = docs ∪ mutated copies (3 alien words appended,
    so copy-pairs are NEAR-identical, not identical); LSH must recover
    >= 0.9 of the exhaustive exact-jaccard pairs at the threshold."""
    from pyspark.sql import functions as F

    docs = documents.limit(200).select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zxq1 zxq2 zxq3")).alias("text"),
    )
    both = docs.unionByName(mutated)
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(both, "text", "doc_id", n=3, threshold=0.7).collect()
    }
    assert len(exact) >= 50, "fixture must contain near-dup pairs"
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            both, "text", "doc_id", n_hashes=16, bands=8, verify_threshold=0.7
        ).collect()
    }
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"minhash LSH recall {recall:.3f} over {len(exact)} pairs"


def test_simhash_clusters_identical_docs(spark):
    out = simhash_clusters(_dup_docs(spark), "text", "doc_id").collect()
    assert any(r.cluster_size >= 2 and r.keeper_id == 1 for r in out)


def test_simhash_neardup_pairs_pigeonhole_recall(spark, documents):
    """Pigeonhole banding is EXACT at the hamming budget: the banded
    join must return precisely the pairs a brute-force hamming check
    finds (100% recall and precision, unlike probabilistic MinHash)."""
    from pyspark.sql import functions as F

    from etl_cms_spark.operators.textdedup import simhash, simhash_neardup_pairs

    docs = documents.limit(150).select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    both = docs.unionByName(mutated)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(both, "text", "doc_id", bits=32, max_hamming=3).collect()
    }
    hashes = [(r["doc_id"], r["_h"]) for r in both.select(
        "doc_id", simhash(F.col("text"), 32).alias("_h")).collect()]
    brute = {
        (a, b, bin(ha ^ hb).count("1"))
        for i, (a, ha) in enumerate(hashes)
        for b, hb in hashes[i + 1:]
        if bin(ha ^ hb).count("1") <= 3
        for a, b in [(min(a, b), max(a, b))]
    }
    assert len(brute) >= 50, "fixture must contain near pairs"
    assert got == brute


def test_simhash_neardup_plan_has_no_cartesian(spark, documents):
    from etl_cms_spark.operators.textdedup import simhash_neardup_pairs

    plan = simhash_neardup_pairs(
        documents.limit(50), "text", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_simhash_portable_pairs_pigeonhole_recall(spark, documents):
    """The PORTABLE polynomial-hash SimHash (oracle-checked in
    queries.simhash_portable_q) must also be exactly brute-force at
    the hamming budget."""
    from pyspark.sql import functions as F

    from etl_cms_spark.operators.textdedup import simhash_neardup_pairs, simhash_portable

    docs = documents.limit(150).select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    both = docs.unionByName(mutated)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(
            both, "text", "doc_id", bits=32, max_hamming=3, portable=True
        ).collect()
    }
    hashes = [(r["doc_id"], r["_h"]) for r in both.select(
        "doc_id", simhash_portable(F.col("text"), 32).alias("_h")).collect()]
    brute = {
        (a, b, bin(ha ^ hb).count("1"))
        for i, (a, ha) in enumerate(hashes)
        for b, hb in hashes[i + 1:]
        if bin(ha ^ hb).count("1") <= 3
        for a, b in [(min(a, b), max(a, b))]
    }
    assert len(brute) >= 20, "fixture must contain near pairs"
    assert got == brute


def test_sketch_accuracy_vs_exact(spark):
    """Approximate sketches (HLL++ distinct counts, GK percentile) vs
    exact answers on the documents table: the approximations this
    engine would use for 100 TB profiling must land within their
    documented error bounds.  (Sketch values are engine-specific, so
    this is a pytest bound, not a DuckDB hash oracle — the exact
    forms are the oracle-checked `doc_length_quartiles` /
    `distinct_users_per_type` entries.)"""
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = d.agg(
        F.countDistinct("source").alias("nd"),
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
    ).first()
    approx = d.agg(
        F.approx_count_distinct("source", rsd=0.02).alias("nd"),
        F.percentile_approx("n_chars", 0.5, 10_000).alias("p50"),
    ).first()
    assert abs(approx["nd"] - exact["nd"]) <= max(1, 0.05 * exact["nd"])
    assert abs(approx["p50"] - exact["p50"]) <= max(2, 0.02 * exact["p50"])
