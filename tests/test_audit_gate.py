"""Epoch-level write-audit-publish quality gate (CDCPipeline
epoch_audit): each epoch's merged result is staged and audited before
readers can see it; rejected epochs are retained in quarantine for the
standard repair flow, and the source cursor still advances.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.pipeline import CDCPipeline
from tests.conftest import assert_df_equal


def test_pass_gate_equals_plain_run(spark, changes, tmp_root):
    audited = CDCPipeline(
        spark, os.path.join(tmp_root, "gate"),
        epoch_audit=lambda staged: staged.summary()["rows_upserted"] >= 0,
    )
    audited.run(changes, n_epochs=3)
    plain = CDCPipeline(spark, os.path.join(tmp_root, "plain"))
    plain.run(changes, n_epochs=3)
    assert_df_equal(
        audited.current_state(), plain.current_state(), "pass-gate == plain"
    )


def test_reject_quarantines_and_advances(spark, changes, tmp_root):
    """Epoch 1 of 3 trips the audit: its rows never land, the batch is
    retained in quarantine, later epochs commit, and the repair flow
    restores the full state."""
    rejected = []

    def audit(staged):
        if staged.epoch == 1:
            rejected.append(staged.summary())
            return False
        return True

    root = os.path.join(tmp_root, "rej")
    p = CDCPipeline(spark, root, epoch_audit=audit)
    recs = p.run(changes, n_epochs=3)
    assert recs[1].get("audit_rejected") and rejected
    assert p.table.committed_epochs() == {0, 2}
    # cursor advanced past the rejected epoch
    with open(p.checkpoint_path) as f:
        assert json.load(f)["last_epoch"] == 2
    # quarantine holds the whole rejected batch
    q = spark.read.parquet(os.path.join(root, "quarantine", "epoch=1"))
    assert q.count() == recs[1]["rows_quarantined"] > 0

    # repair: re-offer the rejected epoch (original LSNs) -> the state
    # converges to the full run's (later epochs already applied)
    repair = CDCPipeline(spark, root, epoch_audit=lambda s: True)
    rrec = repair.reprocess_quarantine(1, -7)
    assert not rrec.get("audit_rejected")
    full = CDCPipeline(spark, os.path.join(tmp_root, "full"))
    full.run(changes, n_epochs=3)
    assert_df_equal(
        repair.current_state(), full.current_state(), "repaired == full"
    )


def test_reject_replay_is_idempotent(spark, changes, tmp_root):
    root = os.path.join(tmp_root, "rep")
    audit = lambda staged: staged.epoch != 1  # noqa: E731
    p = CDCPipeline(spark, root, epoch_audit=audit)
    p.run(changes, n_epochs=3)
    before = sorted(map(str, p.current_state().collect()))
    q_before = spark.read.parquet(os.path.join(root, "quarantine", "epoch=1")).count()
    # crash-resume replay over the same range: committed epochs skip,
    # the rejected epoch re-rejects and rewrites (not duplicates) its slice
    p2 = CDCPipeline(spark, root, epoch_audit=audit)
    recs = p2.run(changes, n_epochs=3)
    assert recs[0].get("skipped_duplicate_epoch")
    assert recs[1].get("audit_rejected")
    assert sorted(map(str, p2.current_state().collect())) == before
    q_after = spark.read.parquet(os.path.join(root, "quarantine", "epoch=1")).count()
    assert q_after == q_before


def test_audit_exception_propagates_without_commit(spark, changes, tmp_root):
    def audit(staged):
        raise RuntimeError("audit infra down")

    p = CDCPipeline(spark, os.path.join(tmp_root, "boom"), epoch_audit=audit)
    with pytest.raises(RuntimeError, match="audit infra down"):
        p.run(changes, n_epochs=1)
    assert p.table.committed_epochs() == set()


def test_gate_rejects_demux_combination(spark, tmp_root):
    with pytest.raises(ValueError, match="demux"):
        CDCPipeline(
            spark, os.path.join(tmp_root, "bad"),
            demux_domains=True, epoch_audit=lambda s: True,
        )


def test_gate_under_streaming(spark, tmp_root):
    """The gate rides foreachBatch unchanged: a rejected micro-batch
    quarantines whole and the stream keeps flowing past it."""
    from etl_cms_spark.streaming.stream import start_stream

    changes = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=10)
    log_dir = os.path.join(tmp_root, "changelog")
    changes.repartition(4).write.parquet(log_dir)
    lake = os.path.join(tmp_root, "lake")

    q, p = start_stream(
        spark, log_dir, lake, max_files_per_trigger=2,
        epoch_audit=lambda staged: staged.epoch != 0,
    )
    q.awaitTermination(300)
    recs = p.table.lineage()
    assert recs, "stream produced no committed epochs"
    assert 0 not in p.table.committed_epochs()
    assert len(p.table.committed_epochs()) >= 1
    q0 = spark.read.parquet(os.path.join(lake, "quarantine", "epoch=0"))
    assert q0.count() > 0
