"""Epoch-incremental MinHash-LSH dedup index (operators/textindex.py).

The invariant under test everywhere: N epochs of incremental upkeep
produce EXACTLY the pair set a from-scratch batch build over the
final corpus state would produce, at O(changes)/epoch cost — the
signature frame never rescans the corpus, the probe never shuffles
the index side, and at-ingest detection flags a duplicate in the
epoch its copy arrives.
"""

import os

from pyspark.sql import functions as F

from etl_cms_spark.operators.textindex import IncrementalTextDedupIndex

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_B = "an entirely different document describing spark incremental band indexes"
DOC_C = "structured streaming applies each micro batch through the same epoch path"
DOC_D = "tiny"  # < shingle_n tokens: not indexable


def _mk(spark, rows):
    """rows: list of (doc_id, text, lsn, op)."""
    return spark.createDataFrame(
        [(int(i), t, int(lsn), op) for i, t, lsn, op in rows],
        "doc_id long, text string, lsn long, op string",
    )


def _base(spark):
    return _mk(
        spark,
        [
            (1, DOC_A, 1, "I"),
            (2, DOC_B, 2, "I"),
            (3, DOC_C, 3, "I"),
            (4, DOC_D, 4, "I"),
            (5, DOC_A, 5, "I"),
        ],
    )


def _epochs(spark):
    e1 = _mk(
        spark,
        [
            (6, DOC_B, 10, "I"),          # dup of 2 → detect at ingest
            (1, DOC_C, 11, "U"),          # rewrite: 1 now dups 3, leaves A-cluster
            (7, DOC_D, 12, "I"),          # still not indexable
        ],
    )
    e2 = _mk(
        spark,
        [
            (3, None, 20, "D"),           # delete: kills the 1-3 pair
            (8, DOC_A, 21, "I"),          # dup of 5's near-dup base text
        ],
    )
    return [e1, e2]


def _build(spark, path):
    return IncrementalTextDedupIndex.build(spark, path, "text", "doc_id")


def _apply_all(spark, path, frames, **kw):
    idx = _build(spark, path)
    for n, f in enumerate(frames):
        idx.apply_epoch(f, epoch=n, **kw)
    return idx


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], r["est_jaccard"]) for r in df.collect())


def _final_corpus(spark, frames):
    state = {}
    for f in frames:
        for r in sorted(f.collect(), key=lambda r: r["lsn"]):
            if r["op"] == "D":
                state.pop(r["doc_id"], None)
            else:
                state[r["doc_id"]] = (r["text"], r["lsn"])
    return _mk(spark, [(i, t, lsn, "I") for i, (t, lsn) in state.items()])


def test_incremental_equals_batch_rebuild(spark, tmp_root):
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames)
    fresh = _build(spark, os.path.join(tmp_root, "fresh"))
    fresh.apply_epoch(_final_corpus(spark, frames), epoch=0, probe=False)
    assert _pairs(idx.live_pairs()) == _pairs(fresh.live_pairs())
    # and the state is what the change history implies: 1 moved to the
    # C-cluster but C was deleted, so only the A-cluster + the B dup
    # remain live.
    got = {(a, b) for a, b, _ in _pairs(idx.live_pairs())}
    assert (2, 6) in got and (5, 8) in got
    assert all(3 not in p for p in got)


def test_detects_duplicate_in_arrival_epoch(spark, tmp_root):
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames)
    det = {(r["id_a"], r["id_b"]): r["epoch"] for r in idx.detected_pairs().collect()}
    assert det[(1, 5)] == 0       # within-batch dup in the initial load
    assert det[(2, 6)] == 1       # dup of live doc flagged when it arrived
    assert det[(1, 3)] == 1       # rewrite of 1 collided with live 3 at ingest
    assert det[(5, 8)] == 2


def test_update_retires_old_band_rows(spark, tmp_root):
    """A rewrite changes every band key; the old bucket's row must
    lose on any read — the text analogue of vecindex's cross-cell
    move."""
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames)
    live1 = idx.live_sigs().where(F.col("doc_id") == 1).collect()
    assert len(live1) == 1 and live1[0]["_v"] == 11
    # doc 1 no longer pairs with the A-cluster it was born into
    assert all(1 not in (a, b) for a, b, _ in _pairs(idx.live_pairs()))


def test_delete_removes_doc_everywhere(spark, tmp_root):
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames)
    assert idx.live_sigs().where(F.col("doc_id") == 3).count() == 0
    assert idx.live_bands().where(F.col("doc_id") == 3).count() == 0


def test_unindexable_docs_excluded_but_masked(spark, tmp_root):
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames)
    assert idx.live_sigs().where(F.col("doc_id").isin(4, 7)).count() == 0
    # an update TO unindexable text retires the old signature
    e3 = _mk(spark, [(2, "now tiny", 30, "U")])
    idx.apply_epoch(e3, epoch=3)
    assert idx.live_sigs().where(F.col("doc_id") == 2).count() == 0
    assert all(2 not in (a, b) for a, b, _ in _pairs(idx.live_pairs()))


def test_apply_epoch_idempotent_and_reopens(spark, tmp_root):
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames)
    before = _pairs(idx.live_pairs())
    rec = idx.apply_epoch(_epochs(spark)[0], epoch=1)
    assert rec["skipped_duplicate_epoch"]
    idx2 = IncrementalTextDedupIndex(spark, idx.path)
    assert _pairs(idx2.live_pairs()) == before


def test_compact_preserves_state_and_detection_log(spark, tmp_root):
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames)
    before, det = _pairs(idx.live_pairs()), _pairs(idx.detected_pairs().drop("epoch"))
    idx.compact()
    assert _pairs(idx.live_pairs()) == before
    assert _pairs(idx.detected_pairs().drop("epoch")) == det
    # post-compaction epochs still apply on top of the folded base
    idx.apply_epoch(_mk(spark, [(9, DOC_B, 40, "I")]), epoch=3)
    got = {(a, b) for a, b, _ in _pairs(idx.live_pairs())}
    assert (6, 9) in got


def test_sig_frame_scans_only_the_changes(spark, tmp_root):
    """The O(changes) guarantee: the per-epoch signature plan reads
    ZERO index files — its only scan is the changes frame."""
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames[:2])
    frame = idx.sig_frame(frames[2].where(F.col("op") != "D"), "lsn")
    files = frame.inputFiles()
    assert all(idx.path not in f for f in files)


def test_probe_broadcasts_batch_not_index(spark, tmp_root):
    """The probe's scale contract: with broadcast_batch the executed
    plan must broadcast-exchange the BATCH side only — no shuffle
    exchange may touch the index scan (the corpus-sized side stays
    scan-local, as in targeted demux's previous-version lookup)."""
    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ix"), frames[:2])
    e = frames[2].where(F.col("op") != "D")
    sigs = idx.sig_frame(e, "lsn")
    plan = (
        idx.probe(sigs, idx.band_frame(sigs), broadcast_batch=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every join against the bands store is a BroadcastHashJoin
    assert "BroadcastHashJoin" in plan
    bands_dir = os.path.join(idx.path, "bands")
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert bands_dir not in line


def test_lake_integration_indexes_lake_content(spark, tmp_root):
    """update_from_lake tails the lake's own CDC-out diff: after two
    pipeline epochs the index's live docs equal the lake's current
    rows (stable-id keyed), and a content duplicate arriving in epoch
    2 is detected at ingest."""
    from etl_cms_spark.sink.lake import LakeTable

    body = "def handler(request): return render(template, context) # " + "x " * 20
    path = os.path.join(tmp_root, "lake")
    lake = LakeTable(spark, path, n_buckets=4)
    lake.create(["repo", "path"], {"repo": "string", "path": "string", "content": "string"})

    def batch(rows):
        return spark.createDataFrame(rows, "repo string, path string, content string, op string, lsn long")

    lake.merge_epoch(
        batch([("r1", "a.py", body + "alpha", "U", 1), ("r1", "b.py", "short", "U", 2)]),
        epoch=0,
    )
    idx = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "ix"), "content", "doc_id"
    )
    rec0 = idx.update_from_lake(lake, 0)
    assert rec0["n_indexable"] == 1  # "short" has no shingles
    lake.merge_epoch(
        batch([("r2", "copy.py", body + "alpha", "U", 3)]), epoch=1
    )
    rec1 = idx.update_from_lake(lake, 1)
    assert rec1["n_pairs_detected"] == 1
    live_ids = {r["doc_id"] for r in idx.live_sigs().collect()}
    expect = {
        r["doc_id"]
        for r in lake.read()
        .where(F.length("content") > 20)
        .select(F.xxhash64("repo", "path").alias("doc_id"))
        .collect()
    }
    assert live_ids == expect


def test_pipeline_sidecar_rides_epochs_and_heals_crash_window(spark, tmp_root):
    """sidecars=[index] on CDCPipeline: every committed epoch's
    CDC-out diff flows into the index inside the exactly-once loop,
    and a sidecar that MISSED epochs (the crash window between the
    main commit and the sidecar sync) catches up on replay — the
    duplicate-epoch skip path still offers the diff."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, 1200, 200, 10)
    idx = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "ix"), "content", "doc_id"
    )
    root = os.path.join(tmp_root, "lake")
    p = CDCPipeline(spark, root, sidecars=[idx])
    recs = p.run(changes, n_epochs=3)
    assert all("sidecars" in r for r in recs)
    assert idx.meta["applied_epochs"] == [0, 1, 2]
    # the index's live doc set == the lake's current rows (every
    # generated content has >= 3 tokens, so all rows are indexable)
    live_ids = {r["doc_id"] for r in idx.live_sigs().collect()}
    expect = {
        r["doc_id"]
        for r in p.current_state()
        .select(F.xxhash64("repo", "path").alias("doc_id"))
        .collect()
    }
    assert live_ids == expect
    # crash-window heal: a fresh sidecar (missed every epoch) attached
    # to a replay over the already-committed lake converges without
    # any epoch re-merging.
    idx2 = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "ix2"), "content", "doc_id"
    )
    p2 = CDCPipeline(spark, root, sidecars=[idx2])
    recs2 = p2.run(changes, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs2)
    assert idx2.meta["applied_epochs"] == [0, 1, 2]
    assert {r["doc_id"] for r in idx2.live_sigs().collect()} == live_ids


def _groups(df):
    return sorted(
        (r["doc_id"], r["component_id"], r["is_canonical"]) for r in df.collect()
    )


def _batch_groups(idx):
    from etl_cms_spark.operators.graph import dedup_groups

    return dedup_groups(idx.live_pairs(), "id_a", "id_b", "doc_id")


def test_incremental_groups_match_batch_every_epoch(spark, tmp_root):
    """maintain_groups: after EVERY epoch the incrementally-relabeled
    groups equal a from-scratch CC over the live pair graph — through
    a merge (new pair bridges components), a split-by-rewrite (doc 1
    leaves the A-cluster), and a split-by-delete (doc 3's group
    dissolves to a singleton, whose label must disappear)."""
    frames = [_base(spark)] + _epochs(spark)
    idx = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "ix"), "text", "doc_id", maintain_groups=True
    )
    for n, f in enumerate(frames):
        idx.apply_epoch(f, epoch=n)
        assert _groups(idx.live_groups()) == _groups(_batch_groups(idx)), f"epoch {n}"
    # final shape: {2,6} and {5,8}; 1 and 3 ungrouped
    got = {r["doc_id"]: r["component_id"] for r in idx.live_groups().collect()}
    assert got == {2: 2, 6: 2, 5: 5, 8: 5}


def test_groups_replay_idempotent_and_compact(spark, tmp_root):
    frames = [_base(spark)] + _epochs(spark)
    idx = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "ix"), "text", "doc_id", maintain_groups=True
    )
    for n, f in enumerate(frames):
        idx.apply_epoch(f, epoch=n)
    before = _groups(idx.live_groups())
    assert idx.apply_epoch(frames[1], epoch=1)["skipped_duplicate_epoch"]
    assert _groups(idx.live_groups()) == before
    idx.compact()
    assert _groups(idx.live_groups()) == before
    # a post-compaction merge: 9 dups doc 2's text → joins group 2
    idx.apply_epoch(_mk(spark, [(9, DOC_B, 40, "I")]), epoch=3)
    assert _groups(idx.live_groups()) == _groups(_batch_groups(idx))
    got = {r["doc_id"]: r["component_id"] for r in idx.live_groups().collect()}
    assert got[9] == 2


def test_groups_require_probe(spark, tmp_root):
    import pytest

    idx = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "ix"), "text", "doc_id", maintain_groups=True
    )
    with pytest.raises(ValueError, match="maintain_groups"):
        idx.apply_epoch(_base(spark), epoch=0, probe=False)


def _dup_pipeline(spark, tmp_root, name="lake"):
    from etl_cms_spark.plans.pipeline import CDCPipeline

    ix = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, f"{name}_ix"), "content", "doc_id"
    )
    p = CDCPipeline(
        spark, os.path.join(tmp_root, name), n_buckets=8, dedup_filter_index=ix
    )
    p.init_tables()
    return p, ix


def _ev(rows):
    """rows: (lsn, op, repo, path, content)"""
    return [
        (int(l), op, r, pa, c, None if op == "D" else f"c{l}", "python", None)
        for l, op, r, pa, c in rows
    ]


def _mkch(spark, rows):
    import datetime

    return spark.createDataFrame(
        [
            (l, op, datetime.datetime(2024, 1, 1), r, pa, cm, lg, c, sc)
            for (l, op, r, pa, c, cm, lg, sc) in rows
        ],
        "lsn long, op string, ts timestamp, repo string, path string, "
        "commit string, lang string, content string, schema_change string",
    ).select("lsn", "op", "ts", "repo", "path", "commit", "lang", "content", "schema_change")


def test_ingest_dedup_filter_suppresses_new_duplicates(spark, tmp_root):
    """Canonical-first-wins: a NEW document duplicating a live
    canonical (or a smaller-id same-batch peer) is logged, not merged;
    updates of existing keys always flow even when their content
    matches another doc."""
    from pyspark.sql import functions as F  # noqa: F401

    body = "def main(): return compute(data) over the shared corpus " + "pad " * 10
    other = "a completely different module with its own logic entirely " + "word " * 10
    p, ix = _dup_pipeline(spark, tmp_root)
    e0 = _mkch(spark, _ev([
        (1, "U", "r1", "a.py", body),
        (2, "U", "r1", "b.py", other),
        (3, "U", "r2", "copy_in_batch.py", body),   # within-batch dup of a.py
    ]))
    rec0 = p.process_epoch(e0, 0)
    # exactly one of {a.py, copy_in_batch.py} survives — the smaller doc_id
    st0 = p.current_state()
    assert st0.count() == 2
    assert rec0["rows_suppressed_duplicates"] == 1
    dup0 = p.duplicates().collect()
    assert len(dup0) == 1

    e1 = _mkch(spark, _ev([
        (10, "U", "r3", "late_copy.py", body),      # dup of live canonical
        (11, "U", "r1", "b.py", body),              # EXISTING key update: flows
        (12, "U", "r4", "fresh.py", "totally novel content here nothing like it " + "tok " * 10),
    ]))
    rec1 = p.process_epoch(e1, 1)
    assert rec1["rows_suppressed_duplicates"] == 1  # only late_copy.py
    st1 = {r["path"]: r["content"] for r in p.current_state().collect()}
    assert "late_copy.py" not in st1
    assert st1["b.py"] == body          # update flowed though it matches a.py
    assert "fresh.py" in st1
    # the log names the canonical each loser matched
    d = {r["path"]: r["dup_of_doc_id"] for r in p.duplicates().collect()}
    assert set(d) == {"copy_in_batch.py", "late_copy.py"}
    # the sidecar indexed only committed rows (suppressed docs absent)
    live = {r["doc_id"] for r in ix.live_sigs().collect()}
    committed = {
        r["doc_id"]
        for r in p.current_state()
        .selectExpr("xxhash64(repo, path) as doc_id")
        .collect()
    }
    assert live == committed


def test_ingest_dedup_filter_replay_is_deterministic(spark, tmp_root):
    """Crash-replay: re-running every epoch over the committed lake
    reproduces the identical duplicates log and final state (the
    probe reads pre-epoch corpus state; the sidecar sync is strictly
    post-commit)."""
    from etl_cms_spark.plans.pipeline import CDCPipeline

    body = "shared function body for the replay determinism test " + "fill " * 12
    p, ix = _dup_pipeline(spark, tmp_root)
    epochs = [
        _mkch(spark, _ev([(1, "U", "r1", "x.py", body), (2, "U", "r1", "y.py", "unrelated text " * 8)])),
        _mkch(spark, _ev([(10, "U", "r2", "z.py", body)])),
    ]
    for n, e in enumerate(epochs):
        p.process_epoch(e, n)
    state = sorted(map(str, p.current_state().collect()))
    dups = sorted(map(str, p.duplicates().collect()))
    # fresh pipeline + fresh index over the SAME lake: all epochs skip,
    # the index catches up, nothing re-routes
    ix2 = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "ix2"), "content", "doc_id"
    )
    p2 = CDCPipeline(
        spark, os.path.join(tmp_root, "lake"), n_buckets=8, dedup_filter_index=ix2
    )
    p2.init_tables()
    for n, e in enumerate(epochs):
        assert p2.process_epoch(e, n)["skipped_duplicate_epoch"]
    assert sorted(map(str, p2.current_state().collect())) == state
    assert sorted(map(str, p2.duplicates().collect())) == dups
    assert {r["doc_id"] for r in ix2.live_sigs().collect()} == {
        r["doc_id"] for r in ix.live_sigs().collect()
    }


# ------------------------------------------------ compaction crash safety
#
# compact() publishes through the incstore two-phase protocol: tmps are
# fully written first, then ONE atomic meta write persists the pending
# destructive steps together with the bumped next_write, then the steps
# run.  These tests crash at each window and assert the index either
# kept its old state (pre-commit) or is healed at the next open
# (post-commit) — in particular that a post-crash apply_epoch can never
# reuse the folded base's write-group id and silently overwrite the
# corpus (the failure the protocol exists to prevent).


def test_compact_crash_after_pending_commit_recovers(spark, tmp_root, monkeypatch):
    import pytest

    from etl_cms_spark.operators import incstore

    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ixc1"), frames)
    before = _pairs(idx.live_pairs())
    k = idx.meta["next_write"]

    def boom(root, steps):
        raise RuntimeError("crash before any destructive step")

    monkeypatch.setattr(incstore, "run_steps", boom)
    with pytest.raises(RuntimeError):
        idx.compact()
    monkeypatch.undo()

    idx2 = IncrementalTextDedupIndex(spark, idx.path)  # recovery at open
    assert "pending_steps" not in idx2.meta
    assert idx2.meta["next_write"] == k + 1
    assert _pairs(idx2.live_pairs()) == before
    # the next epoch allocates w{k+1}; the folded base at w{k} survives
    idx2.apply_epoch(_mk(spark, [(9, DOC_B, 40, "I")]), epoch=3)
    got = {(a, b) for a, b, _ in _pairs(idx2.live_pairs())}
    assert (2, 6) in got and (6, 9) in got


def test_compact_crash_mid_swap_recovers(spark, tmp_root, monkeypatch):
    import pytest

    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ixc2"), frames)
    before = _pairs(idx.live_pairs())
    real_rename = os.rename
    tripped = []

    def flaky(src, dst):
        if "_compact_tmp" in str(src) and not tripped:
            tripped.append(src)
            raise OSError("crash between rmtree(old groups) and rename")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky)
    with pytest.raises(OSError):
        idx.compact()
    monkeypatch.undo()

    # the sigs dir was destroyed mid-swap; reopen finishes the rename
    idx2 = IncrementalTextDedupIndex(spark, idx.path)
    assert "pending_steps" not in idx2.meta
    assert _pairs(idx2.live_pairs()) == before


def test_compact_crash_before_pending_commit_leaves_old_state(
    spark, tmp_root, monkeypatch
):
    import pytest

    from etl_cms_spark.operators import incstore

    frames = [_base(spark)] + _epochs(spark)
    idx = _apply_all(spark, os.path.join(tmp_root, "ixc3"), frames)
    before = _pairs(idx.live_pairs())
    k = idx.meta["next_write"]

    def boom(path, obj):
        raise OSError("crash before the pending-steps meta write")

    monkeypatch.setattr(incstore, "atomic_json", boom)
    with pytest.raises(OSError):
        idx.compact()
    monkeypatch.undo()

    idx2 = IncrementalTextDedupIndex(spark, idx.path)
    assert idx2.meta["next_write"] == k  # nothing committed
    assert _pairs(idx2.live_pairs()) == before
    idx2.compact()  # orphan tmps are overwritten by the next attempt
    assert _pairs(idx2.live_pairs()) == before


def test_stream_dedup_filter_enforces_suppression(spark, tmp_root):
    """--stream with a filter index must ENFORCE corpus dedup (route
    near-duplicate new docs to the duplicates/ log), not just maintain
    the index — streaming and batch take the same process_epoch path."""
    from etl_cms_spark.streaming.stream import start_stream

    body = "def main(): return compute(data) over the shared corpus " + "pad " * 10
    other = "a completely different module with its own logic entirely " + "word " * 10
    changes = _mkch(spark, _ev([
        (1, "U", "r1", "a.py", body),
        (2, "U", "r1", "b.py", other),
        (3, "U", "r2", "copy.py", body),   # near-dup of a.py
    ]))
    log_dir = os.path.join(tmp_root, "slog")
    changes.repartition(1).write.parquet(log_dir)
    ix = IncrementalTextDedupIndex.build(
        spark, os.path.join(tmp_root, "six"), "content", "doc_id"
    )
    q, p = start_stream(
        spark, log_dir, os.path.join(tmp_root, "slake"),
        n_buckets=8, dedup_filter_index=ix,
    )
    q.awaitTermination(300)
    assert p.current_state().count() == 2       # one of the dup pair survives
    assert p.duplicates().count() == 1          # the other was routed, not merged
    assert len({r["doc_id"] for r in ix.live_sigs().collect()}) == 2  # index in sync
