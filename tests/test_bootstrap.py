"""Initial-snapshot bootstrap → changelog-tail handoff
(CDCPipeline.bootstrap; Debezium's snapshot-then-stream model).

The correctness trap under test: replaying a tail that OVERLAPS the
snapshot is NOT absorbed by max-LSN resolution alone — a key deleted
before the snapshot has no snapshot row to outrank its older
pre-delete upserts, so an ungated overlap replay resurrects it.  The
checkpointed watermark gate (events at lsn <= snapshot_lsn dropped)
closes it; these tests pin the convergence, the gate's persistence
across restarts, and the repair-flow exemption."""

import json
import os

import pytest

from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.operators.dedup import latest_by_lsn
from etl_cms_spark.plans.pipeline import BOOTSTRAP_EPOCH, CDCPipeline
from tests.conftest import assert_df_equal


def _source_snapshot(changes, w):
    """Consistent source-image snapshot as of lsn <= w: per key the
    latest row; keys whose latest event is a delete are absent."""
    latest = latest_by_lsn(changes.where(F.col("lsn") <= w), ["repo", "path"], "lsn")
    return latest.where(F.col("op") != "D").drop("lsn", "op")


def test_bootstrap_plus_tail_equals_pure_replay(spark, tmp_root):
    from datetime import datetime

    changes = gen_source_changes(spark, n_events=3000, n_keys=400, n_repos=10)
    hi = changes.agg(F.max("lsn")).first()[0]
    w = int(hi) // 2
    # inject the resurrection trap explicitly: a key upserted inside
    # the overlap window and deleted before the watermark, never seen
    # again — an ungated overlap replay would re-insert its old upsert.
    t0 = datetime(2024, 1, 1)
    ghost = spark.createDataFrame(
        [
            (w - 10, "U", t0, "repo-ghost", "src/g/ghost.txt", "cg1", "sql",
             "ghost v1", None),
            (w - 2, "D", t0, "repo-ghost", "src/g/ghost.txt", None, None,
             None, None),
        ],
        "lsn long, op string, ts timestamp, repo string, path string, "
        "commit string, lang string, content string, schema_change string",
    )
    changes = changes.unionByName(ghost)
    snap = _source_snapshot(changes, w)

    # precondition: the trap key is pre-watermark-deleted and absent
    # from both the snapshot and the post-watermark tail
    pre_deleted = (
        latest_by_lsn(changes.where(F.col("lsn") <= w), ["repo", "path"], "lsn")
        .where(F.col("op") == "D")
        .select("repo", "path")
    )
    post_keys = changes.where(F.col("lsn") > w).select("repo", "path").distinct()
    assert pre_deleted.join(post_keys, ["repo", "path"], "left_anti").count() > 0

    ref = CDCPipeline(spark, os.path.join(tmp_root, "ref"), n_buckets=4)
    ref.run(changes, n_epochs=2)

    # exact cutover, a partially overlapping tail, and a full replay
    # must all converge to the pure-replay state.
    for name, tail_from in (("exact", w), ("overlap", w // 3), ("full", -1)):
        p = CDCPipeline(spark, os.path.join(tmp_root, name), n_buckets=4)
        rec = p.bootstrap(snap, w)
        assert rec["bootstrap_lsn"] == w
        tail = changes.where(F.col("lsn") > tail_from)
        p.run(tail, n_epochs=2)
        assert_df_equal(
            p.current_state(), ref.current_state(), f"handoff tail_from={name}"
        )


def test_bootstrap_watermark_survives_restart(spark, tmp_root):
    changes = gen_source_changes(spark, n_events=1500, n_keys=250, n_repos=8)
    hi = int(changes.agg(F.max("lsn")).first()[0])
    w = hi // 2
    root = os.path.join(tmp_root, "restart")
    p1 = CDCPipeline(spark, root, n_buckets=4)
    p1.bootstrap(_source_snapshot(changes, w), w)
    del p1  # crash between bootstrap and first tail epoch

    p2 = CDCPipeline(spark, root, n_buckets=4)
    p2.run(changes, n_epochs=2)  # FULL overlap; gate must come from disk
    ref = CDCPipeline(spark, os.path.join(tmp_root, "restart_ref"), n_buckets=4)
    ref.run(changes, n_epochs=2)
    assert_df_equal(p2.current_state(), ref.current_state(), "gate from checkpoint")

    # ...and tail checkpoint saves carry the watermark forward
    with open(p2.checkpoint_path) as f:
        cp = json.load(f)
    assert cp["bootstrap_lsn"] == w and cp["last_epoch"] >= 0


def test_bootstrap_guards(spark, tmp_root):
    changes = gen_source_changes(spark, n_events=800, n_keys=150, n_repos=6)
    hi = int(changes.agg(F.max("lsn")).first()[0])
    w = hi // 2
    snap = _source_snapshot(changes, w)
    root = os.path.join(tmp_root, "guards")
    p = CDCPipeline(spark, root, n_buckets=4)

    with pytest.raises(ValueError, match="source-image"):
        p.bootstrap(snap.withColumn("lsn", F.lit(1)), w)
    with pytest.raises(ValueError, match=">= 0"):
        p.bootstrap(snap, -5)

    p.bootstrap(snap, w)
    # re-bootstrap at the SAME watermark before any tail: idempotent
    # duplicate-epoch no-op (the crash-retry path)
    rec = p.bootstrap(snap, w)
    assert rec.get("skipped_duplicate_epoch") and rec["bootstrap_lsn"] == w
    # different watermark: refused
    with pytest.raises(ValueError, match="already bootstrapped"):
        p.bootstrap(snap, w + 1)

    # after tail epochs the table is no longer fresh
    p.run(changes.where(F.col("lsn") > w), n_epochs=1)
    with pytest.raises(ValueError, match="fresh table"):
        p.bootstrap(snap, w)

    # the reserved id is fenced off from the repair namespace
    with pytest.raises(ValueError, match="BOOTSTRAP_EPOCH"):
        p.reprocess_quarantine(source_epoch=0, repair_epoch=BOOTSTRAP_EPOCH)


def test_bootstrap_quarantine_repair_exempt_from_gate(spark, tmp_root):
    """Rows quarantined out of the SNAPSHOT itself carry lsn ==
    snapshot_lsn; the repair flow re-offers them at that LSN, which
    the tail gate (lsn > W) would drop — repairs are exempt."""
    snap = spark.createDataFrame(
        [
            ("r", "f", "c1", "lua", "print(1)"),  # unmapped at ingest
            ("r", "g", "c2", "sql", "select 1"),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    root = os.path.join(tmp_root, "bq")
    p = CDCPipeline(spark, root, n_buckets=4)
    p.bootstrap(snap, 100)
    assert {(r["repo"], r["path"]) for r in p.current_state().collect()} == {("r", "g")}
    assert p.quarantine().count() == 1

    p2 = CDCPipeline(
        spark, root, n_buckets=4, extra_mappings={"lua": (9901, "script")}
    )
    rec = p2.reprocess_quarantine(source_epoch=BOOTSTRAP_EPOCH, repair_epoch=-1)
    assert rec["rows_upserted"] == 1
    state = {(r["repo"], r["path"]) for r in p2.current_state().collect()}
    assert state == {("r", "f"), ("r", "g")}
    # the repair must not advance the source cursor past the watermark
    assert p2.checkpoint()["bootstrap_lsn"] == 100
