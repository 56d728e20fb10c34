"""Epoch-incremental ANN index maintenance (operators/vecindex.py).

The invariant under test everywhere: N epochs of incremental upkeep
produce EXACTLY the index a from-scratch build over the final corpus
state would produce (same cell function), at O(changes)/epoch cost —
assignment never rescans the corpus, probes stay partition-pruned.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.operators.similarity import cosine_topk
from etl_cms_spark.operators.vecindex import IncrementalVectorIndex


def _mk(spark, rows):
    """rows: list of (vec_id, [floats], op, lsn)."""
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v], op, int(lsn)) for i, v, op, lsn in rows],
        "vec_id long, embedding array<double>, op string, lsn long",
    )


def _base_corpus(spark, n=120, dim=8):
    rows = []
    for i in range(n):
        # deterministic spread over a few directions + noise
        vec = [math.sin(0.1 * i * (d + 1)) + 0.01 * ((i * 7 + d) % 13) for d in range(dim)]
        rows.append((i, vec, "I", i))
    return _mk(spark, rows)


def _epochs(spark, dim=8):
    """Three epochs: updates that stay in-cell, updates that MOVE cells
    (negated vectors flip every SRP sign), inserts, deletes."""
    e1 = _mk(
        spark,
        [(i, [math.sin(0.1 * i * (d + 1)) + 0.3 for d in range(dim)], "U", 1000 + i)
         for i in range(0, 120, 5)]
        + [(200 + i, [math.cos(0.2 * i * (d + 1)) for d in range(dim)], "I", 1200 + i)
           for i in range(10)],
    )
    e2 = _mk(
        spark,
        [(i, [-(math.sin(0.1 * i * (d + 1)) + 0.3) for d in range(dim)], "U", 2000 + i)
         for i in range(0, 120, 10)]  # negation moves SRP cell
        + [(i, [0.0] * dim, "D", 2500 + i) for i in range(3, 120, 40)],
    )
    e3 = _mk(
        spark,
        [(205, [math.cos(0.2 * 5 * (d + 1)) * 2.0 for d in range(dim)], "U", 3000)]
        + [(201, [0.0] * dim, "D", 3001)],
    )
    return [e1, e2, e3]


def _apply_all(spark, base, epochs, path, kind, **kw):
    idx = IncrementalVectorIndex.build(base, "embedding", "vec_id", path, kind=kind, **kw)
    for n, e in enumerate(epochs):
        idx.apply_epoch(e, epoch=n + 1)
    return idx


def _final_state(base, epochs):
    """Driver-side replay: latest op per id wins, deletes drop."""
    state = {}
    for df in [base] + epochs:
        for r in sorted(df.collect(), key=lambda r: r["lsn"]):
            if r["op"] == "D":
                state.pop(r["vec_id"], None)
            else:
                state[r["vec_id"]] = [float(x) for x in r["embedding"]]
    return state


@pytest.mark.parametrize("kind", ["srp", "kmeans"])
def test_incremental_equals_rebuild(spark, tmp_root, kind):
    """live() after N epochs == a from-scratch assignment of the final
    corpus state under the SAME cell function (frozen centroids for
    kmeans — the invariant incremental upkeep must preserve)."""
    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs, os.path.join(tmp_root, "ix"), kind)
    expect = _final_state(base, epochs)

    live = {r["vec_id"]: ([float(x) for x in r["vec"]], r["cell"]) for r in idx.live().collect()}
    assert set(live) == set(expect)
    for i, vec in expect.items():
        assert live[i][0] == vec
    # cells match a fresh assignment pass with the same cell function
    final_df = _mk(spark, [(i, v, "I", 0) for i, v in expect.items()])
    re_assigned = {
        r["vec_id"]: r["cell"]
        for r in idx.assignment_frame(final_df, "lsn").collect()
    }
    assert {i: c for i, (_, c) in live.items()} == re_assigned


@pytest.mark.parametrize("kind", ["srp", "kmeans"])
def test_topk_equals_bruteforce_over_probed_cells(spark, tmp_root, kind):
    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs, os.path.join(tmp_root, "ix"), kind)
    q = [float(x) for x in base.orderBy("vec_id").first()["embedding"]]
    probe = idx._query_cells(q, n_probes=4, max_flip=1)
    live = idx.live(cells=probe).select("vec_id", F.col("vec").alias("embedding"))
    expect = [
        (r["vec_id"], r["cos_sim"])
        for r in cosine_topk(live, "embedding", "vec_id", q, k=10).collect()
    ]
    got = [(r["vec_id"], r["cos_sim"]) for r in idx.topk(q, k=10, n_probes=4).collect()]
    assert got == expect


def test_apply_epoch_idempotent(spark, tmp_root):
    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs, os.path.join(tmp_root, "ix"), "srp")
    before = sorted((r["vec_id"], r["_v"]) for r in idx.live().collect())
    rec = idx.apply_epoch(epochs[1], epoch=2)  # replay
    assert rec["skipped_duplicate_epoch"]
    # reopen from disk: the meta round-trips and the replay wrote nothing
    idx2 = IncrementalVectorIndex(spark, idx.path)
    assert sorted((r["vec_id"], r["_v"]) for r in idx2.live().collect()) == before


def test_assignment_scans_only_the_changes(spark, tmp_root):
    """The no-full-rescan guarantee: the per-epoch assignment plan
    reads ZERO index files — its only scan is the changes frame."""
    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs[:1], os.path.join(tmp_root, "ix"), "srp")
    frame = idx.assignment_frame(epochs[1].where(F.col("op") != "D"), "lsn")
    files = frame.inputFiles()
    assert all(idx.path not in f for f in files), files


def test_probe_reads_only_probed_cell_partitions(spark, tmp_root):
    """Every cells/w* scan in the probe plan must carry a
    PartitionFilter restricted to the probed cells (inputFiles() lists
    the relation pre-pruning, so the assertion reads the executed
    plan, as in test_similarity.test_ivf_query_prunes_partitions)."""
    import re

    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs, os.path.join(tmp_root, "ix"), "srp")
    q = [float(x) for x in base.orderBy("vec_id").first()["embedding"]]
    probe = set(idx._query_cells(q, n_probes=4, max_flip=1))
    plan = idx.topk(q, k=5)._jdf.queryExecution().executedPlan().toString()
    filters = re.findall(r"PartitionFilters: \[cell#\d+ IN \(([^)]*)\)\]", plan)
    assert filters, plan[:2000]
    for vals in filters:
        assert {int(v) for v in vals.split(",")} <= probe, vals


def test_cross_cell_move_retires_old_copy(spark, tmp_root):
    """An update whose vector lands in a DIFFERENT cell must vanish
    from the old cell on any probe — the narrow mask kills the stale
    row wherever it lives (the index analogue of the demux departure
    tombstone)."""
    dim = 8
    base = _mk(spark, [(1, [1.0 + 0.1 * d for d in range(dim)], "I", 1)])
    path = os.path.join(tmp_root, "ix")
    idx = IncrementalVectorIndex.build(base, "embedding", "vec_id", path, kind="srp")
    old_cell = idx.live().first()["cell"]
    moved = _mk(spark, [(1, [-(1.0 + 0.1 * d) for d in range(dim)], "U", 2)])
    idx.apply_epoch(moved, epoch=1)
    live = idx.live().collect()
    assert len(live) == 1 and live[0]["cell"] != old_cell and live[0]["_v"] == 2
    assert idx.live(cells=[old_cell]).count() == 0


def test_delete_only_epoch(spark, tmp_root):
    base = _base_corpus(spark)
    path = os.path.join(tmp_root, "ix")
    idx = IncrementalVectorIndex.build(base, "embedding", "vec_id", path, kind="srp")
    dels = _mk(spark, [(i, [0.0], "D", 1000 + i) for i in range(0, 120, 2)])
    idx.apply_epoch(dels, epoch=1)
    ids = {r["vec_id"] for r in idx.live().collect()}
    assert ids == set(range(1, 120, 2))


def test_compact_preserves_live_and_clears_mask(spark, tmp_root):
    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs, os.path.join(tmp_root, "ix"), "srp")
    before = sorted((r["vec_id"], r["_v"], r["cell"]) for r in idx.live().collect())
    idx.compact()
    assert not os.path.isdir(os.path.join(idx.path, "mask"))
    assert sorted((r["vec_id"], r["_v"], r["cell"]) for r in idx.live().collect()) == before
    # still appendable after compaction
    idx.apply_epoch(_mk(spark, [(999, [1.0] * 8, "I", 9999)]), epoch=10)
    assert 999 in {r["vec_id"] for r in idx.live().collect()}


def test_drift_tracking_flags_only_drifted_cell(spark, tmp_root):
    """kmeans kind: ingesting vectors far from their assigned centroid
    raises that cell's drift stat; recluster() is then BOUNDED to the
    flagged cells and preserves the live set."""
    dim = 8
    # two tight clusters -> 2 centroids the build will find
    a = [(i, [1.0 + 0.001 * i] + [0.0] * (dim - 1), "I", i) for i in range(40)]
    b = [(100 + i, [0.0] * (dim - 1) + [1.0 + 0.001 * i], "I", 100 + i) for i in range(40)]
    base = _mk(spark, a + b)
    path = os.path.join(tmp_root, "ix")
    idx = IncrementalVectorIndex.build(
        base, "embedding", "vec_id", path, kind="kmeans", n_cells=2, sample_per_cell=40
    )
    # ingest vectors BETWEEN the clusters (drift ~= 1 - cos(45deg))
    drifty = _mk(
        spark,
        # +0.001*(i+1) on the LAST dim: strictly nearer cluster B for
        # every row (i=0 would tie and argmin-break into cluster A).
        [(500 + i, [0.7] + [0.0] * (dim - 2) + [0.7 + 0.001 * (i + 1)], "I", 500 + i)
         for i in range(20)],
    )
    rec = idx.apply_epoch(drifty, epoch=1)
    assert rec["n_upserts"] == 20
    drifted = idx.drifted_cells(threshold=0.05, min_n=5)
    assert len(drifted) == 1
    stats = idx.meta["cell_stats"]
    assert str(drifted[0]) in stats

    before_ids = {r["vec_id"] for r in idx.live().collect()}
    other = [c for c in range(2) if c != drifted[0]][0]
    untouched_centroid = list(idx.meta["centroids"][other])
    out = idx.recluster(drifted)
    assert out["recentered"] == drifted
    assert idx.meta["centroids"][other] == untouched_centroid  # bounded
    assert {r["vec_id"] for r in idx.live().collect()} == before_ids
    # post-recluster invariant: stored cells == fresh assignment under
    # the UPDATED centroids
    live = idx.live().collect()
    final_df = _mk(spark, [(r["vec_id"], [float(x) for x in r["vec"]], "I", 0) for r in live])
    re_assigned = {
        r["vec_id"]: r["cell"] for r in idx.assignment_frame(final_df, "lsn").collect()
    }
    assert {r["vec_id"]: r["cell"] for r in live} == re_assigned


def test_recall_retained_after_incremental_epochs(spark, tmp_root):
    """Recall >= 0.9 on the perturbed-neighbor corpus when the
    neighbors arrive INCREMENTALLY (3 epochs) after the initial build
    — upkeep must not degrade retrieval vs the one-shot index."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    base = emb.withColumn("op", F.lit("I")).withColumn("lsn", F.col("vec_id"))
    path = os.path.join(tmp_root, "ix")
    idx = IncrementalVectorIndex.build(
        base, "embedding", "vec_id", path, kind="kmeans", n_cells=16
    )
    copies = []
    for c in range(1, 13):
        copies.append(
            emb.select(
                (F.col("vec_id") + 1000000 * c).alias("vec_id"),
                F.zip_with(
                    "embedding",
                    F.sequence(F.lit(0), F.size("embedding") - 1),
                    lambda x, d: x
                    + (F.pmod(F.xxhash64(d, F.col("vec_id"), F.lit(c)), 200).cast("double") / 100.0 - 1.0)
                    * F.lit(0.05),
                ).alias("embedding"),
            ).withColumn("op", F.lit("I")).withColumn("lsn", F.col("vec_id"))
        )
    for n in range(3):  # 4 copies per epoch
        batch = copies[n * 4]
        for cdf in copies[n * 4 + 1 : n * 4 + 4]:
            batch = batch.unionByName(cdf)
        idx.apply_epoch(batch.localCheckpoint(), epoch=n + 1)

    corpus = emb
    for cdf in copies:
        corpus = corpus.unionByName(cdf.select("vec_id", "embedding"))
    corpus = corpus.localCheckpoint()
    recalls = []
    for r in emb.orderBy("vec_id").limit(10).collect():
        q = [float(x) for x in r["embedding"]]
        exact = {x["vec_id"] for x in cosine_topk(corpus, "embedding", "vec_id", q, k=10).collect()}
        approx = {x["vec_id"] for x in idx.topk(q, k=10, n_probes=4).collect()}
        recalls.append(len(exact & approx) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_update_from_lake_syncs_index_with_snapshot(spark, tmp_root):
    """The CDC-loop wiring: the index tails the lake's own per-epoch
    CDC-out diff and its live set tracks the lake snapshot exactly —
    index upkeep lives INSIDE the exactly-once machinery."""
    from etl_cms_spark.sink.lake import LakeTable

    t = LakeTable(spark, os.path.join(tmp_root, "vecs"), n_buckets=4)
    t.create(["vec_id"], {"vec_id": "long", "embedding": "array<double>"})
    dim = 8

    def batch(rows):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v], op, int(lsn)) for i, v, op, lsn in rows],
            "vec_id long, embedding array<double>, op string, lsn long",
        )

    e1 = [(i, [math.sin(0.3 * i * (d + 1)) for d in range(dim)], "I", i) for i in range(60)]
    t.merge_epoch(batch(e1), epoch=1)
    idx = IncrementalVectorIndex.build(
        spark.createDataFrame([], "vec_id long, embedding array<double>"),
        "embedding", "vec_id", os.path.join(tmp_root, "ix"), kind="srp",
    )
    idx.update_from_lake(t, 1)

    e2 = [(i, [-math.sin(0.3 * i * (d + 1)) for d in range(dim)], "U", 100 + i)
          for i in range(0, 60, 6)] + [(i, [0.0] * dim, "D", 200 + i) for i in range(5, 60, 20)]
    t.merge_epoch(batch(e2), epoch=2)
    idx.update_from_lake(t, 2)
    idx.update_from_lake(t, 2)  # replay: no-op

    lake_state = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in t.read().collect()}
    live = {r["vec_id"]: [float(x) for x in r["vec"]] for r in idx.live().collect()}
    assert live == lake_state


# ------------------------------------------------ maintenance crash safety
#
# compact() and recluster() publish through the incstore two-phase
# protocol (tmps fully written -> ONE atomic meta write persisting the
# pending destructive steps with the bumped next_write -> steps run).
# Crash at each window: pre-commit leaves the old state intact;
# post-commit is healed at the next open, and a post-crash apply_epoch
# can never reuse the published write-group id and overwrite the base.


def _live_set(idx):
    return sorted((r["vec_id"], r["_v"], r["cell"]) for r in idx.live().collect())


def test_compact_crash_after_pending_commit_recovers(spark, tmp_root, monkeypatch):
    from etl_cms_spark.operators import incstore

    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs, os.path.join(tmp_root, "ixc1"), "srp")
    before = _live_set(idx)
    k = idx.meta["next_write"]

    def boom(root, steps):
        raise RuntimeError("crash before any destructive step")

    monkeypatch.setattr(incstore, "run_steps", boom)
    with pytest.raises(RuntimeError):
        idx.compact()
    monkeypatch.undo()

    idx2 = IncrementalVectorIndex(spark, idx.path)  # recovery at open
    assert "pending_steps" not in idx2.meta
    assert idx2.meta["next_write"] == k + 1
    assert _live_set(idx2) == before
    idx2.apply_epoch(_mk(spark, [(999, [1.0] * 8, "I", 9999)]), epoch=10)
    ids = {r["vec_id"] for r in idx2.live().collect()}
    assert 999 in ids and len(ids) == len(before) + 1


def test_compact_crash_mid_swap_recovers(spark, tmp_root, monkeypatch):
    base, epochs = _base_corpus(spark), _epochs(spark)
    idx = _apply_all(spark, base, epochs, os.path.join(tmp_root, "ixc2"), "srp")
    before = _live_set(idx)
    real_rename = os.rename
    tripped = []

    def flaky(src, dst):
        if "cells_compact_tmp" in str(src) and not tripped:
            tripped.append(src)
            raise OSError("crash between rmtree(old groups) and rename")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", flaky)
    with pytest.raises(OSError):
        idx.compact()
    monkeypatch.undo()

    idx2 = IncrementalVectorIndex(spark, idx.path)
    assert "pending_steps" not in idx2.meta
    assert _live_set(idx2) == before


def test_recluster_crash_after_pending_commit_recovers(spark, tmp_root, monkeypatch):
    """Same two clusters as the drift test; crash recluster() after the
    pending commit.  Reopen must publish BOTH the moved rows and their
    mask together — no duplicate copies, no moved rows without mask —
    and the committed meta already carries the updated centroids."""
    from etl_cms_spark.operators import incstore

    dim = 8
    a = [(i, [1.0 + 0.001 * i] + [0.0] * (dim - 1), "I", i) for i in range(40)]
    b = [(100 + i, [0.0] * (dim - 1) + [1.0 + 0.001 * i], "I", 100 + i) for i in range(40)]
    base = _mk(spark, a + b)
    idx = IncrementalVectorIndex.build(
        base, "embedding", "vec_id", os.path.join(tmp_root, "ixc3"),
        kind="kmeans", n_cells=2, sample_per_cell=40,
    )
    drifty = _mk(
        spark,
        [(500 + i, [0.7] + [0.0] * (dim - 2) + [0.7 + 0.001 * (i + 1)], "I", 500 + i)
         for i in range(20)],
    )
    idx.apply_epoch(drifty, epoch=1)
    before_ids = {r["vec_id"] for r in idx.live().collect()}
    drifted = idx.drifted_cells(threshold=0.05, min_n=5)

    def boom(root, steps):
        raise RuntimeError("crash before the rename steps")

    monkeypatch.setattr(incstore, "run_steps", boom)
    with pytest.raises(RuntimeError):
        idx.recluster(drifted)
    monkeypatch.undo()

    idx2 = IncrementalVectorIndex(spark, idx.path)
    assert "pending_steps" not in idx2.meta
    live = idx2.live().collect()
    assert {r["vec_id"] for r in live} == before_ids  # each id exactly once
    assert len(live) == len(before_ids)
    # stored cells == fresh assignment under the recovered centroids
    final_df = _mk(spark, [(r["vec_id"], [float(x) for x in r["vec"]], "I", 0) for r in live])
    re_assigned = {
        r["vec_id"]: r["cell"] for r in idx2.assignment_frame(final_df, "lsn").collect()
    }
    assert {r["vec_id"]: r["cell"] for r in live} == re_assigned
