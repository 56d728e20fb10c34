"""Epoch-level write-audit-publish quality gate (CDCPipeline
epoch_audit): each epoch's merged result is staged and audited before
readers can see it; rejected epochs are retained in quarantine for the
standard repair flow, and the source cursor still advances.

With demux_domains the gate is a MULTI-TABLE transaction
(StagedEpochGroup): main + every touched domain sink stage together,
one verdict publishes or discards them all — domains first, the main
commit last as the completion marker, crash-mid-publish rolls forward
on replay.
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


def _assert_all_tables_equal(a: CDCPipeline, b: CDCPipeline, msg: str):
    assert_df_equal(a.current_state(), b.current_state(), f"{msg}: main")
    assert sorted(a.domain_tables) == sorted(b.domain_tables)
    for d in a.domain_tables:
        assert_df_equal(
            a.domain_tables[d].read(), b.domain_tables[d].read(),
            f"{msg}: domain {d}",
        )


def _no_leftover_reservations(p: CDCPipeline):
    import glob

    for t in [p.table, *p.domain_tables.values()]:
        stray = glob.glob(os.path.join(t._manifest_dir, ".reserve.*"))
        assert not stray, f"leftover reservations on {t.root}: {stray}"


def test_demux_gate_pass_equals_plain_demux(spark, changes, tmp_root):
    """Multi-table WAP: a passing gate over demux sinks is invisible —
    main AND every domain table equal the ungated demux run."""
    audits = []

    def audit(gate):
        audits.append(gate.summary())
        # exercise the multi-table audit surface: the would-be state
        # of every live domain is readable before anything commits.
        for d in gate.domains:
            assert gate.read(d).count() >= 0
        return True

    gated = CDCPipeline(
        spark, os.path.join(tmp_root, "mg"), n_buckets=8,
        demux_domains=True, epoch_audit=audit,
    )
    gated.run(changes, n_epochs=3)
    plain = CDCPipeline(
        spark, os.path.join(tmp_root, "mp"), n_buckets=8, demux_domains=True
    )
    plain.run(changes, n_epochs=3)
    _assert_all_tables_equal(gated, plain, "demux pass-gate == plain demux")
    assert len(audits) == 3
    # summary carries per-domain staged detail + the flat main counters
    assert audits[0]["rows_upserted"] >= 0 and audits[0]["domains"]
    _no_leftover_reservations(gated)


def test_demux_gate_reject_retracts_every_table(spark, changes, tmp_root):
    """A rejected epoch lands NOWHERE: no main commit, no domain
    commit, batch quarantined; the repair flow then converges every
    table to the full run's state."""
    root = os.path.join(tmp_root, "mrej")
    p = CDCPipeline(
        spark, root, n_buckets=8, demux_domains=True,
        epoch_audit=lambda g: g.epoch != 1,
    )
    recs = p.run(changes, n_epochs=3)
    assert recs[1].get("audit_rejected")
    assert p.table.committed_epochs() == {0, 2}
    for d, t in p.domain_tables.items():
        assert 1 not in t.committed_epochs(), f"domain {d} kept epoch 1"
    q = spark.read.parquet(os.path.join(root, "quarantine", "epoch=1"))
    assert q.count() == recs[1]["rows_quarantined"] > 0
    _no_leftover_reservations(p)

    repair = CDCPipeline(
        spark, root, n_buckets=8, demux_domains=True,
        epoch_audit=lambda g: True,
    )
    repair.reprocess_quarantine(1, -3)
    full = CDCPipeline(
        spark, os.path.join(tmp_root, "mfull"), n_buckets=8,
        demux_domains=True,
    )
    full.run(changes, n_epochs=3)
    _assert_all_tables_equal(repair, full, "repaired demux == full demux")


def test_demux_gate_crash_mid_publish_rolls_forward(
    spark, changes, tmp_root, monkeypatch
):
    """Crash AFTER the domain publishes but BEFORE the main commit:
    the replay finds committed participants and rolls the transaction
    FORWARD (publishes the rest) without re-judging — publishes only
    ever follow a pass verdict."""
    from etl_cms_spark.sink.lake import StagedEpoch

    root = os.path.join(tmp_root, "mcrash")
    p = CDCPipeline(
        spark, root, n_buckets=8, demux_domains=True,
        epoch_audit=lambda g: True,
    )
    orig = StagedEpoch.publish

    def crash_on_main(self):
        if self._table.root == p.table.root and not self.already_committed:
            raise RuntimeError("crash before main commit")
        return orig(self)

    monkeypatch.setattr(StagedEpoch, "publish", crash_on_main)
    with pytest.raises(RuntimeError, match="crash before main commit"):
        p.run(changes, n_epochs=1)
    monkeypatch.setattr(StagedEpoch, "publish", orig)
    assert p.table.committed_epochs() == set()  # main never landed
    committed_domains = {
        d for d, t in p.domain_tables.items() if 0 in t.committed_epochs()
    }
    assert committed_domains  # ...but some domains did

    audited = []

    def vetoing_audit(gate):
        audited.append(gate.epoch)
        return False  # must be IGNORED for the crashed epoch

    p2 = CDCPipeline(
        spark, root, n_buckets=8, demux_domains=True,
        epoch_audit=vetoing_audit,
    )
    recs = p2.run(changes, n_epochs=1)
    assert audited == []  # roll-forward skipped the re-judgment
    assert not recs[0].get("audit_rejected")
    assert p2.table.committed_epochs() == {0}
    for d, t in p2.domain_tables.items():
        rec = recs[0]["domains"][d]
        assert 0 in t.committed_epochs() or rec.get("skipped_empty_epoch")

    full = CDCPipeline(
        spark, os.path.join(tmp_root, "mcfull"), n_buckets=8,
        demux_domains=True,
    )
    full.run(changes, n_epochs=1)
    _assert_all_tables_equal(p2, full, "rolled-forward == plain demux")
    # the crashed attempt's main-table reservation + staged dir remain
    # on disk by design (crash debris) — vacuum's orphan GC owns them
    # (tests/test_lake_wap.py); current state must survive a vacuum.
    p2.table.vacuum(keep_last=1)
    assert p2.table.read().count() == full.table.read().count()


def test_demux_gate_replay_of_published_epoch_is_noop(
    spark, changes, tmp_root
):
    root = os.path.join(tmp_root, "mnoop")
    p = CDCPipeline(
        spark, root, n_buckets=8, demux_domains=True,
        epoch_audit=lambda g: True,
    )
    p.run(changes, n_epochs=2)
    before = {
        d: sorted(map(str, t.read().collect()))
        for d, t in p.domain_tables.items()
    }
    p2 = CDCPipeline(
        spark, root, n_buckets=8, demux_domains=True,
        epoch_audit=lambda g: True,
    )
    recs = p2.run(changes, n_epochs=2)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    for d, t in p2.domain_tables.items():
        assert sorted(map(str, t.read().collect())) == before[d]


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


def test_demux_gate_under_streaming(spark, tmp_root):
    """Multi-table WAP through foreachBatch: a rejected micro-batch
    lands in NO table (main nor any domain sink), later batches flow,
    and the repair re-offer converges every table to the plain demux
    stream's state."""
    from etl_cms_spark.streaming.stream import start_stream

    changes = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=10)
    log_dir = os.path.join(tmp_root, "schangelog")
    changes.repartition(4).write.parquet(log_dir)
    lake = os.path.join(tmp_root, "slake")

    q, p = start_stream(
        spark, log_dir, lake, max_files_per_trigger=2, n_buckets=8,
        demux_domains=True, epoch_audit=lambda gate: gate.epoch != 0,
    )
    q.awaitTermination(300)
    assert 0 not in p.table.committed_epochs()
    assert len(p.table.committed_epochs()) >= 1
    for d, t in p.domain_tables.items():
        assert 0 not in t.committed_epochs(), f"domain {d} kept batch 0"
    assert spark.read.parquet(
        os.path.join(lake, "quarantine", "epoch=0")
    ).count() > 0

    repair = CDCPipeline(
        spark, lake, n_buckets=8, demux_domains=True,
        epoch_audit=lambda g: True,
    )
    repair.reprocess_quarantine(0, -5)

    plain_lake = os.path.join(tmp_root, "plake")
    q2, plain = start_stream(
        spark, log_dir, plain_lake, max_files_per_trigger=2, n_buckets=8,
        demux_domains=True,
    )
    q2.awaitTermination(300)
    _assert_all_tables_equal(repair, plain, "repaired stream == plain stream")
