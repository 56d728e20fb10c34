"""Deterministic per-key sampling: cap, replay-stability across
partitionings, and seed independence."""

from pyspark.sql import functions as F

from etl_cms_spark.operators.sampling import deterministic_sample_per_key


def _corpus(spark):
    # skewed: key "big" has 500 rows, "small" has 3
    return spark.range(503).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, "big").otherwise("small").alias("src"),
    )


def test_per_key_cap_and_skew(spark):
    out = deterministic_sample_per_key(_corpus(spark), ["src"], k=10, id_col="doc_id")
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["big"] == 10  # capped despite skew
    assert counts["small"] == 3  # fewer rows than k -> all kept


def test_replay_stable_across_partitionings(spark):
    df = _corpus(spark)
    a = deterministic_sample_per_key(df, ["src"], k=10, id_col="doc_id")
    b = deterministic_sample_per_key(df.repartition(13), ["src"], k=10, id_col="doc_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_seed_draws_different_sample(spark):
    df = _corpus(spark)
    s0 = set(r["doc_id"] for r in deterministic_sample_per_key(df, ["src"], 10, "doc_id", seed=0).collect())
    s1 = set(r["doc_id"] for r in deterministic_sample_per_key(df, ["src"], 10, "doc_id", seed=1).collect())
    assert s0 != s1
    # but each seed is individually stable
    s0b = set(r["doc_id"] for r in deterministic_sample_per_key(df, ["src"], 10, "doc_id", seed=0).collect())
    assert s0 == s0b


def test_weighted_sample_favors_heavy_rows(spark):
    """A row with overwhelming weight must be selected under (nearly)
    every seed; zero-weight rows never appear."""
    from etl_cms_spark.operators.sampling import weighted_sample_per_key

    df = spark.createDataFrame(
        [(i, "s", 1.0 if i else 1e9) for i in range(50)] + [(99, "s", 0.0)],
        "doc_id long, src string, w double",
    )
    hits = 0
    for seed in range(10):
        got = weighted_sample_per_key(df, ["src"], k=5, id_col="doc_id", weight_col="w", seed=seed)
        ids = {r["doc_id"] for r in got.collect()}
        assert 99 not in ids  # zero weight never selected
        hits += 0 in ids
    assert hits >= 9  # weight 1e9 vs 1: doc 0 wins essentially always


def test_weighted_sample_replay_stable(spark):
    from etl_cms_spark.operators.sampling import weighted_sample_per_key

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    a = weighted_sample_per_key(df, ["src"], 5, "doc_id", "w", seed=3)
    b = weighted_sample_per_key(df.repartition(17), ["src"], 5, "doc_id", "w", seed=3)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_big_id_hash_matches_duckdb_no_overflow(spark):
    """Round-3 ADVICE regression: ids above ~3.47e9 must hash
    identically in Spark and DuckDB (the old (id+seed)*K form
    overflowed int64 and wrapped differently per engine)."""
    import duckdb

    from etl_cms_spark.operators.sampling import sample_rank_hash

    ids = [0, 1, 3_470_000_000, 10_000_000_000, 2**62, 2**63 - 8]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    ours = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", sample_rank_hash(F.col("doc_id"), seed=7).alias("h")).collect()
    }
    con = duckdb.connect()
    for i in ids:
        expect = con.execute(
            f"SELECT ((({i} + 7) % 2147483647) * 2654435761) % 2147483647"
        ).fetchone()[0]
        assert ours[i] == expect, i
