#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement;
everything exploratory lives here — guide §1.4 noop-sink isolation,
plan captures, and pinned A/Bs for the pieces being optimized).

Subcommands:
  plans <tag>        dump .explain('formatted') of the CDC epoch's
                     dedup/merge/demux frames to plans/r06/*_<tag>.txt
  queryplans <tag>   dump plans for the headline bench queries
  epoch-decompose    time the stages of one plain epoch in isolation
                     (noop sink) — staging read, dedup, map, merge
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _dump(name: str, tag: str, df) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
        f.write(_plan(df))
    print(f"wrote plans/r06/{name}_{tag}.txt")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session():
    from bench import _tuned_session

    return _tuned_session(CPUS)


def dump_cdc_plans(tag: str) -> None:
    """Capture the physical plans of the CDC epoch's stages: the
    deduped+mapped batch (the observe job) and the CoW merge pre-write
    frame, reconstructed exactly as the CURRENT pipeline builds them.

    The committed ``*_before.txt`` files were captured by this function
    at round start, when the defaults were mapper="udf" and the merge's
    own ``max_by(struct)`` per-key reduction; the function now mirrors
    the post-optimization defaults (mapper="join",
    ``batch_deduped=True`` merge fed by the window dedup), so a run
    with tag "after" documents the new shape."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn_window
    from etl_cms_spark.plans.mapping import map_concepts_join
    from etl_cms_spark.plans.pipeline import KEY_COLS, CDCPipeline

    spark = _session()
    root = tempfile.mkdtemp(prefix="plan_cdc_")
    stage = tempfile.mkdtemp(prefix="plan_stage_")
    try:
        n = 200_000
        ch = gen_source_changes(spark, n_events=n, n_keys=n // 5, n_repos=100)
        p = CDCPipeline(spark, root, n_buckets=64)
        meta = p.stage(ch, stage, n_epochs=2)
        p.run_staged(n_epochs=1, staging_dir=stage, meta=meta)

        batch = spark.read.parquet(os.path.join(stage, "_epoch=1"))
        latest = latest_by_lsn_window(batch, KEY_COLS, "lsn")
        mapped = map_concepts_join(spark, latest)
        is_unmapped = (F.col("domain") == "unmapped") & (F.col("op") != "D")
        updates = mapped.withColumn("_quar", is_unmapped).withColumn(
            "op", F.when(F.col("_quar"), F.lit("D")).otherwise(F.col("op"))
        )
        _dump("cdc_epoch_observe", tag, updates)

        # CoW merge pre-write frame, reconstructed as merge_epoch does
        t = p.table
        manifest = t._load_manifest()
        key_cols = manifest["key_cols"]
        schema = manifest["schema"]
        up = updates.drop("_quar").withColumn("_bucket", t.bucket_expr(key_cols))
        up = up.withColumn("_lsn", F.col("lsn").cast("long"))
        proj = [
            (F.col(c) if c in up.columns else F.lit(None)).cast(ty).alias(c)
            for c, ty in schema.items()
        ]
        up_norm = up.select(
            *proj, F.col("_lsn"), F.col("_bucket"),
            (F.col("op") == "D").alias("_deleted"),
        )
        payload = [c for c in up_norm.columns if c not in key_cols]
        # batch_deduped=True path: the window dedup already guarantees
        # one row per key, so the batch feeds the outer join directly —
        # no groupBy(max_by(struct)) reduction (the before-plan's two
        # SortAggregates + Sorts + Exchange).
        target = t._read_buckets(manifest, None)
        ts = target.select(*key_cols, F.struct(*payload).alias("_t"))
        us = up_norm.select(*key_cols, F.struct(*payload).alias("_u"))
        joined = ts.join(us.hint("SHUFFLE_HASH"), list(key_cols), "full")
        pick = (
            F.when(F.col("_t").isNull(), F.col("_u"))
            .when(F.col("_u").isNull(), F.col("_t"))
            .when(F.col("_u._lsn") >= F.col("_t._lsn"), F.col("_u"))
            .otherwise(F.col("_t"))
        )
        winner = joined.select(*key_cols, *[pick[c].alias(c) for c in payload])
        final = winner.repartition(64, F.col("_bucket")).sortWithinPartitions(
            "_bucket", *key_cols
        )
        _dump("cdc_cow_merge", tag, final)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        spark.stop()


def epoch_decompose(n: int = 2_000_000) -> None:
    """Noop-sink isolation of the plain epoch's stages (guide §1.4):
    each stage timed cumulatively from the staged parquet batch."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn_window
    from etl_cms_spark.plans.mapping import map_concepts_join, map_concepts_udf
    from etl_cms_spark.plans.pipeline import KEY_COLS

    spark = _session()
    sc = spark.sparkContext
    stage = tempfile.mkdtemp(prefix="decomp_stage_")
    try:
        ch = gen_source_changes(spark, n_events=n, n_keys=n // 5, n_repos=100)
        ch.repartition(CPUS).write.mode("overwrite").parquet(stage)
        batch = spark.read.parquet(stage)
        out = {}

        def timed(name, df, warm=1, reps=2):
            sc.setJobDescription(name)
            for _ in range(warm):
                _force(df)
            ts = []
            for _ in range(reps):
                t0 = time.time()
                _force(df)
                ts.append(round(time.time() - t0, 2))
            out[name] = min(ts)
            sc.setJobDescription(None)

        timed("scan_only", batch)
        timed("dedup_window", latest_by_lsn_window(batch, KEY_COLS, "lsn"))
        mapped_u = map_concepts_udf(spark, latest_by_lsn_window(batch, KEY_COLS, "lsn"))
        timed("dedup_map_udf", mapped_u)
        mapped_j = map_concepts_join(spark, latest_by_lsn_window(batch, KEY_COLS, "lsn"))
        timed("dedup_map_join", mapped_j)
        # map without sha2 to isolate the hash cost
        nosha = map_concepts_udf(spark, latest_by_lsn_window(batch, KEY_COLS, "lsn")).drop(
            "content_sha"
        )
        timed("dedup_map_udf_nosha", nosha)
        print("DECOMP " + json.dumps(out))
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        spark.stop()


def small_batch_ab(n: int = 4_000_000) -> None:
    """Steady-state demux merge timing (one small epoch against a
    large existing table), both tombstone modes, one warm session."""
    from bench import run_small_batch

    spark = _session()
    out = {"n_base": n, "rows": []}
    for mode, targeted in (("blanket", False), ("targeted", True)):
        r = run_small_batch(
            spark, n_base=n, n_batch=n // 20, mode="cow",
            demux=True, demux_targeted=targeted,
        )
        out["rows"].append({
            "tombstones": mode,
            "merge_seconds": r["merge_seconds"],
            "domain_read_seconds": r["domain_read_seconds"],
        })
    print("SMALLBATCH_AB " + json.dumps(out))
    spark.stop()


def dump_rewrite_plans() -> None:
    """Before/after physical plans for the round-6 ROW_NUMBER rewrites
    at their other two sites (the CoW merge pair lives in
    ``dump_cdc_plans``):

    * ``salted_dedup``: before = the round-start two-phase
      ``max_by(struct)`` form (reconstructed verbatim from the
      pre-rewrite ``operators/skew.py``), after = the shipped
      two-phase ROW_NUMBER-window form.
    * ``mor_merge``: the un-pre-deduped MoR batch reduction (the
      chain-transport / foreachBatch path), before = the round-start
      ``groupBy(max_by(struct))``, after = the shipped
      ``_window_one_per_key`` + repartition-to-bucket frame.
    """
    from pyspark.sql import Window

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.skew import salted_latest_by_lsn
    from etl_cms_spark.plans.pipeline import KEY_COLS

    spark = _session()
    stage = tempfile.mkdtemp(prefix="plan_rw_")
    try:
        n = 200_000
        ch = gen_source_changes(spark, n_events=n, n_keys=n // 5, n_repos=100)
        ch.repartition(CPUS).write.mode("overwrite").parquet(stage)
        df = spark.read.parquet(stage)
        key_cols = list(KEY_COLS)
        payload = [c for c in df.columns if c not in key_cols]

        # -- salted dedup, round-start form (pre-5ac1b4c skew.py) --
        n_salts = 16
        salted = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("lsn")), F.lit(n_salts))
        )
        phase1 = salted.groupBy(*key_cols, "_salt").agg(
            F.max_by(F.struct(*payload), F.col("lsn")).alias("_w"),
            F.max("lsn").alias("_max_lsn"),
        )
        phase2 = phase1.groupBy(*key_cols).agg(
            F.max_by(F.col("_w"), F.col("_max_lsn")).alias("_w")
        )
        old_salted = phase2.select(
            *key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload]
        )
        _dump("salted_dedup", "before", old_salted)
        _dump("salted_dedup", "after", salted_latest_by_lsn(df, key_cols, "lsn"))

        # -- MoR merge batch reduction (un-pre-deduped caller path) --
        up_norm = (
            df.withColumn("_lsn", F.col("lsn").cast("long"))
            .withColumn(
                "_bucket",
                F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(64)).cast(
                    "int"
                ),
            )
            .withColumn("_deleted", F.col("op") == "D")
            .drop("lsn", "op")
        )
        pay2 = [c for c in up_norm.columns if c not in key_cols]
        old_u = up_norm.groupBy(*key_cols).agg(
            F.max_by(F.struct(*pay2), F.col("_lsn")).alias("_u")
        )
        old_winner = old_u.select(
            *key_cols, *[F.col(f"_u.{c}").alias(c) for c in pay2]
        )
        w = Window.partitionBy(*key_cols).orderBy(F.col("_lsn").desc())
        new_winner = (
            up_norm.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        for tag, winner in (("before", old_winner), ("after", new_winner)):
            final = winner.repartition(64, F.col("_bucket")).sortWithinPartitions(
                "_bucket", *key_cols
            )
            _dump("mor_merge", tag, final)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if cmd == "plans":
        dump_cdc_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif cmd == "rewrite-plans":
        dump_rewrite_plans()
    elif cmd == "smallbatch-ab":
        small_batch_ab(int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000)
    elif cmd == "epoch-decompose":
        epoch_decompose(int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000)
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
