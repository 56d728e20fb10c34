"""Incremental rollup (continuous aggregate): multi-epoch fold equals
the one-shot aggregate, replays are no-ops, and a fresh instance
resumes from the committed state."""

import os

from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.rollup import IncrementalRollup


def _mk(spark, root):
    return IncrementalRollup(
        spark,
        root,
        key_exprs={"repo": F.col("repo")},
        measures={
            "n_events": F.count(F.lit(1)),
            "n_deletes": F.sum((F.col("op") == "D").cast("long")),
        },
    )


def _expected(changes):
    return changes.groupBy("repo").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
    )


def _epochs(changes, n):
    hi = changes.agg(F.max("lsn")).first()[0]
    width = (hi + n) // n
    return [
        changes.where((F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width))
        for e in range(n)
    ]


def test_incremental_fold_equals_one_shot(spark, tmp_root):
    changes = gen_source_changes(spark, n_events=4000, n_keys=500, n_repos=12)
    r = _mk(spark, os.path.join(tmp_root, "rollup"))
    for e, batch in enumerate(_epochs(changes, 3)):
        r.apply_epoch(batch, e)
    got = r.read()
    exp = _expected(changes).select(*got.columns)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_replay_and_resume_are_exactly_once(spark, tmp_root):
    changes = gen_source_changes(spark, n_events=3000, n_keys=300, n_repos=8)
    root = os.path.join(tmp_root, "rollup2")
    r = _mk(spark, root)
    batches = _epochs(changes, 3)
    r.apply_epoch(batches[0], 0)
    r.apply_epoch(batches[1], 1)
    # replay epoch 1 on the same instance: no-op
    rec = r.apply_epoch(batches[1], 1)
    assert rec.get("skipped_duplicate_epoch")
    # fresh instance on the same root (crash-resume): re-offer all
    # epochs — committed ones skip, the missing one applies.
    r2 = _mk(spark, root)
    recs = [r2.apply_epoch(b, e) for e, b in enumerate(batches)]
    assert recs[0].get("skipped_duplicate_epoch")
    assert recs[1].get("skipped_duplicate_epoch")
    assert not recs[2].get("skipped_duplicate_epoch")
    got = r2.read()
    exp = _expected(changes).select(*got.columns)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
