"""Write-audit-publish staged epochs (LakeTable.stage_epoch).

The Iceberg WAP pattern as an ingest quality gate: the merge's full
compute + data write runs up front, audits inspect the EXACT would-be
post-publish state, and publish() is a pure metadata CAS commit — no
second merge, no reader-visible window with unaudited rows.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.sink.lake import ConcurrentCommitError, LakeTable
from tests.conftest import assert_df_equal

SCHEMA = {
    "repo": "string",
    "path": "string",
    "commit": "string",
    "lang": "string",
    "content": "string",
}


def _mk(spark, root, mode="mor", n_buckets=8):
    t = LakeTable(spark, root, n_buckets=n_buckets, merge_mode=mode)
    if not t.exists():
        t.create(["repo", "path"], SCHEMA)
    return t


def _halves(spark, n_events=1200, n_keys=200):
    ch = gen_source_changes(spark, n_events=n_events, n_keys=n_keys, n_repos=10)
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    return ch.where(F.col("lsn") <= mid), ch.where(F.col("lsn") > mid)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_stage_audit_publish_roundtrip(spark, tmp_root, mode):
    e1, e2 = _halves(spark)
    t = _mk(spark, os.path.join(tmp_root, f"wap_{mode}"), mode=mode)
    t.merge_epoch(e1, 0)
    pre = sorted(map(str, t.read().collect()))

    staged = t.stage_epoch(e2, 1)
    # invisible until publish: readers still see the pre-stage state
    assert sorted(map(str, t.read().collect())) == pre
    assert t.committed_epochs() == {0}
    # the audit surface equals the direct-merge result on a twin table
    twin = _mk(spark, os.path.join(tmp_root, f"twin_{mode}"), mode=mode)
    twin.merge_epoch(e1, 0)
    twin.merge_epoch(e2, 1)
    assert_df_equal(staged.read(), twin.read(), "staged audit view")
    s = staged.summary()
    assert s["rows_upserted"] > 0 and s["changed_buckets"]

    rec = staged.publish()
    assert rec["epoch"] == 1 and not rec.get("skipped_duplicate_epoch")
    assert t.committed_epochs() == {0, 1}
    assert_df_equal(t.read(), twin.read(), "published state")
    # publish is idempotent on the handle
    assert staged.publish() == rec


def test_stage_discard_leaves_no_trace(spark, tmp_root):
    e1, e2 = _halves(spark)
    t = _mk(spark, os.path.join(tmp_root, "wap_discard"))
    t.merge_epoch(e1, 0)
    pre = sorted(map(str, t.read().collect()))
    staged = t.stage_epoch(e2, 1)
    staged_dir = os.path.join(t.root, staged._rel_dir)
    assert os.path.isdir(staged_dir)
    staged.discard()
    assert not os.path.exists(staged_dir)
    assert t.committed_epochs() == {0}
    assert sorted(map(str, t.read().collect())) == pre
    # the released number is reusable: the next merge commits cleanly
    t.merge_epoch(e2, 1)
    assert t.committed_epochs() == {0, 1}
    with pytest.raises(ValueError):
        staged.publish()
    with pytest.raises(ValueError):
        staged.read()


def test_publish_rebases_over_concurrent_commit(spark, tmp_root):
    """A commit landing while the epoch sits staged: publish() takes
    the same rebase path a direct MoR merge does."""
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "wap_rebase")
    ta = _mk(spark, root)
    staged = ta.stage_epoch(e1, 1)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    tb.merge_epoch(e2, 2)  # lands between stage and publish
    rec = staged.publish()
    assert not rec.get("skipped_duplicate_epoch")
    assert ta.committed_epochs() == {1, 2}
    serial = _mk(spark, os.path.join(tmp_root, "serial"))
    serial.merge_epoch(e2, 2)
    serial.merge_epoch(e1, 1)
    assert_df_equal(ta.read(), serial.read(), "published rebase == serial")


def test_publish_conflicts_when_cow_buckets_raced(spark, tmp_root):
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "wap_conflict")
    ta = _mk(spark, root, mode="cow")
    ta.merge_epoch(e1, 0)
    staged = ta.stage_epoch(e2, 1)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="cow")
    tb.merge_epoch(e2.withColumn("lsn", F.col("lsn") + 100000), 5)
    with pytest.raises(ConcurrentCommitError):
        staged.publish()
    assert 1 not in ta.committed_epochs()
    # the conflicted stage cleaned up after itself
    assert not os.path.exists(os.path.join(ta.root, f"data/v{staged._new_version}"))


def test_stage_already_committed_epoch_is_noop(spark, tmp_root):
    e1, _ = _halves(spark)
    t = _mk(spark, os.path.join(tmp_root, "wap_dup"))
    t.merge_epoch(e1, 1)
    staged = t.stage_epoch(e1, 1)
    assert staged.already_committed
    rec = staged.publish()
    assert rec.get("skipped_duplicate_epoch")
    assert_df_equal(staged.read(), t.read(), "dup stage reads current")


def test_staged_epoch_survives_vacuum(spark, tmp_root):
    """Concurrent commits push CURRENT past the staged number, then
    vacuum runs: the live reservation marker protects the staged data
    dir, and publish still lands."""
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "wap_vacuum")
    ta = _mk(spark, root)
    ta.merge_epoch(e1, 0)
    staged = ta.stage_epoch(e2, 1)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    half2_lo, half2_hi = e2.agg(F.min("lsn"), F.max("lsn")).first()
    bump = tb_batch = e2.withColumn("lsn", F.col("lsn") + 1000000)
    tb.merge_epoch(bump, 2)
    tb.merge_epoch(bump.withColumn("lsn", F.col("lsn") + 1000000), 3)
    assert tb._current_version() > staged._new_version
    tb.vacuum(keep_last=1)
    assert os.path.isdir(os.path.join(ta.root, staged._rel_dir))
    rec = staged.publish()
    assert not rec.get("skipped_duplicate_epoch")
    assert ta.committed_epochs() == {0, 1, 2, 3}


def test_empty_stage_publishes_zero_row_commit(spark, tmp_root):
    e1, _ = _halves(spark)
    t = _mk(spark, os.path.join(tmp_root, "wap_empty"))
    t.merge_epoch(e1, 0)
    staged = t.stage_epoch(e1.where(F.col("lsn") < 0), 1)
    assert staged.summary()["rows_upserted"] == 0
    rec = staged.publish()
    assert rec["rows_upserted"] == 0
    assert t.committed_epochs() == {0, 1}


def test_audit_reject_flow(spark, tmp_root):
    """The quality-gate shape: a batch whose delete ratio trips the
    audit is discarded without ever being visible."""
    e1, e2 = _halves(spark)
    t = _mk(spark, os.path.join(tmp_root, "wap_gate"))
    t.merge_epoch(e1, 0)
    pre_rows = t.read().count()
    poison = e2.withColumn("op", F.lit("D"))  # mass delete
    staged = t.stage_epoch(poison, 1)
    s = staged.summary()
    delete_ratio = s["rows_deleted"] / max(s["rows_deleted"] + s["rows_upserted"], 1)
    assert delete_ratio > 0.5  # audit trips
    # the audit can also inspect the would-be state directly
    assert staged.read().count() < pre_rows
    staged.discard()
    assert t.read().count() == pre_rows
    assert t.committed_epochs() == {0}
