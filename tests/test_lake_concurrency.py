"""Optimistic-concurrency commits (the Iceberg-catalog CAS model).

A last-writer-wins CURRENT swap silently DROPS the loser's commit when
two writers race one table (the quarantine-repair flow against the
streaming loop, a concurrent compaction, demux catch-up).  These tests
pin the protocol in sink/lake.py: version reservation (unique data
dirs), parent-version compare-and-swap at commit, automatic rebase for
commutable commits (MoR appends, disjoint-bucket CoW), and explicit
``ConcurrentCommitError`` for everything else.

The interleave is DETERMINISTIC: a hook on ``_commit_manifest`` runs
the concurrent writer's full commit at the exact moment the victim
first tries to commit, so the victim's parent is always stale.
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


def _interleave(monkeypatch, victim, concurrent_fn):
    """Run ``concurrent_fn`` the first time ``victim`` tries to commit,
    making the victim's parent deterministically stale."""
    orig = LakeTable._commit_manifest
    state = {"fired": False}

    def hooked(self, manifest):
        if self is victim and not state["fired"]:
            state["fired"] = True
            concurrent_fn()
        return orig(self, manifest)

    monkeypatch.setattr(LakeTable, "_commit_manifest", hooked)


def _halves(spark, n_events=1200, n_keys=200):
    ch = gen_source_changes(spark, n_events=n_events, n_keys=n_keys, n_repos=10)
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    return ch.where(F.col("lsn") <= mid), ch.where(F.col("lsn") > mid)


def test_mor_concurrent_appends_both_commit(spark, tmp_root, monkeypatch):
    """MoR deltas commute: the interleaved commit wins the version
    race, the victim REBASES — neither epoch is lost."""
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_mor")
    ta = _mk(spark, root)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e2, 2))
    rec = ta.merge_epoch(e1, 1)
    assert not rec.get("skipped_duplicate_epoch")
    assert ta.committed_epochs() == {1, 2}
    # the rebased commit sits ON TOP of the interleaved one
    recs = {r["epoch"]: r for r in ta.lineage()}
    assert recs[1]["parent_version"] == recs[2]["snapshot_version"]
    serial = _mk(spark, os.path.join(tmp_root, "serial"))
    serial.merge_epoch(e2, 2)
    serial.merge_epoch(e1, 1)
    assert_df_equal(ta.read(), serial.read(), "occ == serial")
    # CDC-out across the version gap uses the recorded parent
    assert ta.changes_for_epoch(1).count() > 0


def test_cow_disjoint_buckets_rebase(spark, tmp_root, monkeypatch):
    """CoW merges touching DISJOINT buckets commute — the victim
    rebases instead of failing."""
    ch = gen_source_changes(spark, n_events=1200, n_keys=200, n_repos=10)
    root = os.path.join(tmp_root, "occ_cow_disjoint")
    ta = _mk(spark, root, mode="cow")
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="cow")
    b = ta.bucket_expr(["repo", "path"])
    e1 = ch.where(b < 4)
    e2 = ch.where(b >= 4)
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e2, 2))
    ta.merge_epoch(e1, 1)
    assert ta.committed_epochs() == {1, 2}
    serial = _mk(spark, os.path.join(tmp_root, "serial_cd"), mode="cow")
    serial.merge_epoch(e2, 2)
    serial.merge_epoch(e1, 1)
    assert_df_equal(ta.read(), serial.read(), "disjoint cow occ == serial")


def test_cow_overlapping_buckets_conflict_then_retry(
    spark, tmp_root, monkeypatch
):
    """CoW winners were computed FROM the raced buckets: the victim
    must NOT commit — it raises, and a plain re-run succeeds against
    the new snapshot."""
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_cow_overlap")
    ta = _mk(spark, root, mode="cow")
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="cow")
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e2, 2))
    with pytest.raises(ConcurrentCommitError):
        ta.merge_epoch(e1, 1)
    # nothing half-committed: only the interleaved epoch landed
    assert ta.committed_epochs() == {2}
    ta.merge_epoch(e1, 1)  # retry sees the new snapshot
    assert ta.committed_epochs() == {1, 2}
    serial = _mk(spark, os.path.join(tmp_root, "serial_ov"), mode="cow")
    serial.merge_epoch(e2, 2)
    serial.merge_epoch(e1, 1)
    assert_df_equal(ta.read(), serial.read(), "overlap cow retry == serial")


def test_concurrent_duplicate_epoch_is_idempotent(
    spark, tmp_root, monkeypatch
):
    """Two at-least-once deliveries of the SAME epoch racing each
    other: exactly one commits, the other reports the skip."""
    e1, _ = _halves(spark)
    root = os.path.join(tmp_root, "occ_dup")
    ta = _mk(spark, root)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e1, 1))
    rec = ta.merge_epoch(e1, 1)
    assert rec.get("skipped_duplicate_epoch")
    assert ta.committed_epochs() == {1}
    once = _mk(spark, os.path.join(tmp_root, "once"))
    once.merge_epoch(e1, 1)
    assert_df_equal(ta.read(), once.read(), "dup race applied once")


def test_empty_batch_commit_rebases(spark, tmp_root, monkeypatch):
    """The zero-row lineage commit takes the same CAS path."""
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_empty")
    ta = _mk(spark, root)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    empty = e1.where(F.col("lsn") < 0)
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e2, 2))
    rec = ta.merge_epoch(empty, 1)
    assert rec["rows_upserted"] == 0 and not rec.get("skipped_duplicate_epoch")
    assert ta.committed_epochs() == {1, 2}
    only2 = _mk(spark, os.path.join(tmp_root, "only2"))
    only2.merge_epoch(e2, 2)
    assert_df_equal(ta.read(), only2.read(), "empty epoch adds nothing")


def test_compact_raced_by_merge_conflicts_and_retries(
    spark, tmp_root, monkeypatch
):
    """Maintenance commits don't rebase: a merge racing a compaction
    surfaces as ConcurrentCommitError and the compaction re-runs."""
    e1, e2 = _halves(spark)
    lo, hi = e1.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    root = os.path.join(tmp_root, "occ_compact")
    ta = _mk(spark, root)
    # two epochs so delta stacks exist and compact() has work to commit
    ta.merge_epoch(e1.where(F.col("lsn") <= mid), 0)
    ta.merge_epoch(e1.where(F.col("lsn") > mid), 1)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e2, 2))
    with pytest.raises(ConcurrentCommitError):
        ta.compact()
    assert ta.committed_epochs() == {0, 1, 2}
    before = sorted(map(str, ta.read().collect()))
    ta.compact()  # retry against the new snapshot
    assert sorted(map(str, ta.read().collect())) == before
    m = ta._load_manifest()
    assert all(len(ta._bucket_dirs(m, b)) == 1 for b in m["buckets"])


def test_merge_raced_by_compact_conflicts(spark, tmp_root, monkeypatch):
    """The mirror race: a MoR delta computed against a delta stack a
    concurrent compaction REPLACED may not append (its write ordinal
    would mis-order against the folded rows) — it must re-run."""
    e1, e2 = _halves(spark)
    lo, hi = e1.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    root = os.path.join(tmp_root, "occ_merge_vs_compact")
    ta = _mk(spark, root)
    # two epochs so the concurrent compact actually folds delta stacks
    ta.merge_epoch(e1.where(F.col("lsn") <= mid), 0)
    ta.merge_epoch(e1.where(F.col("lsn") > mid), 1)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    _interleave(monkeypatch, ta, lambda: tb.compact())
    with pytest.raises(ConcurrentCommitError):
        ta.merge_epoch(e2, 2)
    assert ta.committed_epochs() == {0, 1}
    ta.merge_epoch(e2, 2)  # plain re-run
    serial = _mk(spark, os.path.join(tmp_root, "serial_mc"))
    serial.merge_epoch(e1, 1)
    serial.merge_epoch(e2, 2)
    assert_df_equal(ta.read(), serial.read(), "merge-vs-compact retry")


def test_vacuum_reclaims_spent_reservations_and_conflict_orphans(
    spark, tmp_root, monkeypatch
):
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_vacuum")
    ta = _mk(spark, root, mode="cow")
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="cow")
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e2, 2))
    with pytest.raises(ConcurrentCommitError):
        ta.merge_epoch(e1, 1)  # leaves an orphaned data dir + reservation
    ta.merge_epoch(e1, 1)
    before = sorted(map(str, ta.read().collect()))
    ta.vacuum(keep_last=1)
    mdir = os.path.join(root, "_manifests")
    spent = [
        f
        for f in os.listdir(mdir)
        if f.startswith(".reserve.")
        and int(f.rsplit("v", 1)[1]) <= ta._current_version()
    ]
    assert spent == [], f"spent reservations not reclaimed: {spent}"
    assert sorted(map(str, ta.read().collect())) == before


def test_schema_change_raced_conflicts(spark, tmp_root, monkeypatch):
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_schema")
    ta = _mk(spark, root)
    ta.merge_epoch(e1, 1)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    _interleave(monkeypatch, ta, lambda: tb.merge_epoch(e2, 2))
    with pytest.raises(ConcurrentCommitError):
        ta.apply_schema_change({"add": "stars:bigint"})
    ta.apply_schema_change({"add": "stars:bigint"})  # retry
    assert "stars" in ta.schema()


def test_merge_raced_by_schema_change_conflicts(spark, tmp_root, monkeypatch):
    """A merge normalized the batch to the OLD schema — committing it
    under the new one would write files the manifest mis-describes."""
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_merge_vs_schema")
    ta = _mk(spark, root)
    ta.merge_epoch(e1, 1)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    _interleave(
        monkeypatch, ta, lambda: tb.apply_schema_change({"add": "stars:bigint"})
    )
    with pytest.raises(ConcurrentCommitError):
        ta.merge_epoch(e2, 2)
    ta.merge_epoch(e2, 2)  # re-run normalizes to the evolved schema
    assert ta.committed_epochs() == {1, 2}
    assert "stars" in ta.read().columns


def test_partial_merge_detects_commit_in_hydrate_window(
    spark, tmp_root, monkeypatch
):
    """merge_epoch_partial hydrates against a snapshot BEFORE the
    inner merge reloads the manifest; a commit landing in that window
    must be detected (the hydrated images are stale) — pinned via
    ``computed_on_version``."""
    from etl_cms_spark.operators.dedup import fold_partial_updates

    ch = gen_source_changes(spark, n_events=1500, n_keys=250, n_repos=10)
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    e0 = ch.where(F.col("lsn") <= cut1)
    e1 = ch.where((F.col("lsn") > cut1) & (F.col("lsn") <= cut2))
    e2 = ch.where(F.col("lsn") > cut2)
    keys = ["repo", "path"]
    strip = lambda d: d.select(  # noqa: E731  partial images: lang absent on lsn%5==0
        "repo", "path", "lsn", "op",
        *[
            F.when((F.col("lsn") % 5 != 0) & (F.col("op") != "D"), F.col(c)).alias(c)
            for c in ("commit", "lang", "content")
        ],
    )
    root = os.path.join(tmp_root, "occ_hydrate")
    ta = _mk(spark, root, mode="cow")
    ta.merge_epoch(e0, 0)
    tb = LakeTable(spark, root, n_buckets=8, merge_mode="cow")
    folded1 = fold_partial_updates(strip(e1), keys, "lsn", op_col="op")

    orig = LakeTable.hydrate_partial
    state = {"fired": False}

    def hooked(self, *a, **kw):
        out = orig(self, *a, **kw)
        if self is ta and not state["fired"]:
            state["fired"] = True
            tb.merge_epoch(e2, 2)  # lands between hydrate and merge
        return out

    monkeypatch.setattr(LakeTable, "hydrate_partial", hooked)
    with pytest.raises(ConcurrentCommitError):
        ta.merge_epoch_partial(folded1, 1)
    assert ta.committed_epochs() == {0, 2}
    ta.merge_epoch_partial(folded1, 1)  # retry re-hydrates on the new snapshot
    assert ta.committed_epochs() == {0, 1, 2}


def test_branch_writers_race_rebases_on_branch_head(spark, tmp_root, monkeypatch):
    """Two writers on the SAME branch: the victim's CAS is against the
    branch REF; MoR deltas commute, so it rebases onto the interleaved
    branch commit — both epochs land on the branch, main untouched."""
    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_branch")
    t = _mk(spark, root)
    t.merge_epoch(e1.limit(0), 0)  # establish an epoch-0 commit
    t.create_branch("race")
    ba = t.branch_table("race")
    bb = t.branch_table("race")
    _interleave(monkeypatch, ba, lambda: bb.merge_epoch(e2, 2))
    rec = ba.merge_epoch(e1, 1)
    assert not rec.get("skipped_duplicate_epoch")
    assert ba.committed_epochs() == {0, 1, 2}
    assert t.committed_epochs() == {0}  # main never moved
    serial = _mk(spark, os.path.join(tmp_root, "occ_branch_serial"))
    serial.merge_epoch(e2, 2)
    serial.merge_epoch(e1, 1)
    assert_df_equal(ba.read(), serial.read(), "branch occ == serial")
    # and the whole raced history publishes cleanly
    t.fast_forward("race")
    assert_df_equal(t.read(), serial.read(), "published == serial")


def test_branch_commit_ignores_concurrent_main_commit(spark, tmp_root, monkeypatch):
    """A main commit landing mid-branch-write is a DIFFERENT lineage:
    the branch writer's CAS (against its ref) never sees it — no
    conflict, no rebase — but the diverged main then refuses the
    fast-forward."""
    from etl_cms_spark.sink.lake import ConcurrentCommitError

    e1, e2 = _halves(spark)
    root = os.path.join(tmp_root, "occ_branch_main")
    t = _mk(spark, root)
    t.merge_epoch(e1.limit(0), 0)
    t.create_branch("iso")
    b = t.branch_table("iso")
    t2 = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    _interleave(monkeypatch, b, lambda: t2.merge_epoch(e2, 2))
    rec = b.merge_epoch(e1, 1)
    assert not rec.get("skipped_duplicate_epoch")
    assert b.committed_epochs() == {0, 1}   # branch never saw main's 2
    assert t.committed_epochs() == {0, 2}   # main took the interleaved commit
    with pytest.raises(ConcurrentCommitError, match="fast-forward impossible"):
        t.fast_forward("iso")
