"""Partial-image change batches (binlog row_image=MINIMAL):
fold_partial_updates + LakeTable.merge_epoch_partial.

The invariant under test: applying PARTIAL images epoch-by-epoch
(fold per batch, hydrate against the table, merge) converges to the
same table state as folding the ENTIRE event stream in one pass —
i.e. hydration exactly reconstructs the full images a
row_image=FULL producer would have sent.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.operators.dedup import fold_partial_updates
from etl_cms_spark.sink.lake import LakeTable
from tests.conftest import assert_df_equal

KEYS = ["repo", "path"]
VALS = ["commit", "lang", "content"]
SCHEMA = {"repo": "string", "path": "string", "commit": "string",
          "lang": "string", "content": "string"}


def _partialize(ch):
    """Deterministically strip columns from full-image events: each
    value column is present only on a coprime-modulus subset of LSNs
    (deletes already carry no payload)."""
    keep = {"commit": 3, "lang": 5, "content": 7}
    return ch.select(
        "repo", "path", "lsn", "op",
        *[
            F.when((F.col("lsn") % m != 0) & (F.col("op") != "D"), F.col(c)).alias(c)
            for c, m in keep.items()
        ],
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_partial_epochs_equal_global_fold(spark, tmp_root, mode):
    ch = gen_source_changes(spark, n_events=2000, n_keys=300, n_repos=10)
    pe = _partialize(ch).cache()
    lo, hi = pe.agg(F.min("lsn"), F.max("lsn")).first()
    cuts = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3]
    batches = [
        pe.where(F.col("lsn") <= cuts[0]),
        pe.where((F.col("lsn") > cuts[0]) & (F.col("lsn") <= cuts[1])),
        pe.where(F.col("lsn") > cuts[1]),
    ]
    t = LakeTable(spark, os.path.join(tmp_root, f"pi_{mode}"), n_buckets=8,
                  merge_mode=mode)
    t.create(KEYS, SCHEMA)
    for i, b in enumerate(batches):
        folded = fold_partial_updates(b, KEYS, "lsn", op_col="op", reset_col="_reset")
        t.merge_epoch_partial(folded, i, reset_col="_reset")

    expected = (
        fold_partial_updates(pe, KEYS, "lsn", op_col="op")
        .where(F.col("op") != "D")
        .select(*KEYS, *VALS)
    )
    assert_df_equal(t.read().select(*KEYS, *VALS), expected,
                    f"{mode}: epoch-wise partial == global fold")


def test_partial_merge_replay_is_noop(spark, tmp_root):
    ch = gen_source_changes(spark, n_events=600, n_keys=100, n_repos=5)
    pe = _partialize(ch)
    t = LakeTable(spark, os.path.join(tmp_root, "pi_replay"), n_buckets=4)
    t.create(KEYS, SCHEMA)
    folded = fold_partial_updates(pe, KEYS, "lsn", op_col="op", reset_col="_reset")
    t.merge_epoch_partial(folded, 0, reset_col="_reset")
    before = t.read().select(*KEYS, *VALS)
    rec = t.merge_epoch_partial(folded, 0, reset_col="_reset")
    assert rec.get("skipped_duplicate_epoch")
    assert_df_equal(t.read().select(*KEYS, *VALS), before, "replay")


def test_partial_merge_mask_explicit_null_set(spark, tmp_root):
    t = LakeTable(spark, os.path.join(tmp_root, "pi_mask"), n_buckets=2)
    t.create(["k"], {"k": "string", "a": "string", "b": "string"})
    sch = "k string, lsn long, op string, a string, b string, changed array<string>"
    e1 = spark.createDataFrame([("k1", 1, "U", "a1", "b1", ["a", "b"])], sch)
    t.merge_epoch_partial(e1, 0, changed_cols_col="changed")
    # epoch 1 EXPLICITLY sets a to NULL (a in the mask, value NULL);
    # b is absent from the mask and must survive
    e2 = spark.createDataFrame([("k1", 2, "U", None, None, ["a"])], sch)
    t.merge_epoch_partial(e2, 1, changed_cols_col="changed")
    row = t.read().first()
    assert row["a"] is None and row["b"] == "b1"


def test_partial_merge_midbatch_delete_resets(spark, tmp_root):
    """A key deleted and re-created INSIDE one batch must not drag its
    pre-batch column values through hydration."""
    t = LakeTable(spark, os.path.join(tmp_root, "pi_reset"), n_buckets=2)
    t.create(["k"], {"k": "string", "a": "string", "b": "string"})
    sch = "k string, lsn long, op string, a string, b string"
    t.merge_epoch_partial(
        spark.createDataFrame([("k1", 1, "U", "a1", "b1")], sch), 0)
    batch = spark.createDataFrame(
        [("k1", 2, "D", None, None), ("k1", 3, "U", "a2", None)], sch)
    folded = fold_partial_updates(batch, ["k"], "lsn", op_col="op",
                                  reset_col="_reset")
    t.merge_epoch_partial(folded, 1, reset_col="_reset")
    row = t.read().first()
    assert row["a"] == "a2" and row["b"] is None, dict(row.asDict())
    # without the reset marker the same flow WOULD resurrect b1 —
    # assert the marker actually carried
    assert folded.first()["_reset"] is True


def test_partial_merge_plain_delete(spark, tmp_root):
    t = LakeTable(spark, os.path.join(tmp_root, "pi_del"), n_buckets=2)
    t.create(["k"], {"k": "string", "a": "string"})
    sch = "k string, lsn long, op string, a string"
    t.merge_epoch_partial(spark.createDataFrame([("k1", 1, "U", "a1")], sch), 0)
    t.merge_epoch_partial(spark.createDataFrame([("k1", 2, "D", None)], sch), 1)
    assert t.read().count() == 0


def _partialize_keep_lang(ch):
    """Mask commit/content only — lang stays present on I/U events so
    the quarantine decision (lang-driven) is identical to full mode
    and the global-fold oracle below is exact."""
    return ch.select(
        "repo", "path", "lsn", "op", "ts", "lang", "schema_change",
        F.when((F.col("lsn") % 3 != 0) & (F.col("op") != "D"), F.col("commit")).alias("commit"),
        F.when((F.col("lsn") % 7 != 0) & (F.col("op") != "D"), F.col("content")).alias("content"),
    )


def test_pipeline_row_image_minimal(spark, tmp_root):
    """CDCPipeline(row_image='minimal') over a masked changelog: the
    final main-table state must equal a single global fold of the
    partial stream (mapped langs only — unmapped keys quarantine
    exactly as in full mode)."""
    from etl_cms_spark.plans.mapping import UNMAPPED_LANGS
    from etl_cms_spark.plans.pipeline import CDCPipeline

    ch = gen_source_changes(spark, n_events=3000, n_keys=400, n_repos=15)
    pe = _partialize_keep_lang(ch).cache()
    p = CDCPipeline(spark, os.path.join(tmp_root, "pimin"), n_buckets=8,
                    row_image="minimal")
    p.run(pe, n_epochs=3)

    folded = fold_partial_updates(
        pe.drop("ts", "schema_change"), KEYS, "lsn", op_col="op"
    )
    expected = (
        folded.where(
            (F.col("op") != "D") & ~F.col("lang").isin(list(UNMAPPED_LANGS))
        ).select(*KEYS, *VALS)
    )
    assert_df_equal(p.current_state().select(*KEYS, *VALS), expected,
                    "minimal-row-image pipeline == global fold")
    # replay is a no-op
    recs = p.run(pe, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert_df_equal(p.current_state().select(*KEYS, *VALS), expected, "replay")


def test_pipeline_row_image_minimal_demux(spark, tmp_root):
    """Partial feed through the per-domain demux: hydration happens
    before mapping, so domain routing sees complete rows and the
    domain tables partition the main state exactly as in full mode."""
    from etl_cms_spark.plans.pipeline import CDCPipeline

    ch = gen_source_changes(spark, n_events=2000, n_keys=250, n_repos=10)
    pe = _partialize_keep_lang(ch)
    p = CDCPipeline(spark, os.path.join(tmp_root, "pimind"), n_buckets=8,
                    row_image="minimal", demux_domains=True)
    p.run(pe, n_epochs=2)
    main = p.current_state().select(*KEYS, *VALS)
    union = None
    for d in p.domains:
        s = p.domain_state(d).select(*KEYS, *VALS)
        union = s if union is None else union.unionByName(s)
    assert_df_equal(main, union, "domains partition the main state")


def test_stream_row_image_minimal_matches_global_fold(spark, tmp_root):
    """Partial-column feed through the Structured Streaming front-end:
    micro-batches (in LSN order — the mode's contract; mtime-ordered
    file source, one file per trigger) fold + hydrate per batch and
    converge to the one-pass global fold."""
    import glob
    import time

    from etl_cms_spark.plans.mapping import UNMAPPED_LANGS
    from etl_cms_spark.streaming.stream import start_stream

    ch = gen_source_changes(spark, n_events=1500, n_keys=200, n_repos=8)
    pe = _partialize_keep_lang(ch).cache()
    lo, hi = pe.agg(F.min("lsn"), F.max("lsn")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    slices = [
        pe.where(F.col("lsn") <= cut1),
        pe.where((F.col("lsn") > cut1) & (F.col("lsn") <= cut2)),
        pe.where(F.col("lsn") > cut2),
    ]
    log_dir = os.path.join(tmp_root, "pstream_log")
    os.makedirs(log_dir)
    now = time.time()
    for i, s in enumerate(slices):
        s.coalesce(1).write.mode("append").parquet(log_dir)
        # the file source orders micro-batches by mtime — stamp each
        # slice's files strictly ascending so LSN order == batch order
        for f in glob.glob(os.path.join(log_dir, "*.parquet")):
            if os.path.getmtime(f) > now - 5000 + i:  # newly written
                os.utime(f, (now - 5000 + i, now - 5000 + i))
    q, p = start_stream(
        spark, log_dir, os.path.join(tmp_root, "pstream_lake"),
        max_files_per_trigger=1, row_image="minimal", n_buckets=8,
    )
    q.awaitTermination(300)
    assert len(p.table.lineage()) >= 3  # really incremental

    expected = (
        fold_partial_updates(pe.drop("ts", "schema_change"), KEYS, "lsn", op_col="op")
        .where((F.col("op") != "D") & ~F.col("lang").isin(list(UNMAPPED_LANGS)))
        .select(*KEYS, *VALS)
    )
    assert_df_equal(p.current_state().select(*KEYS, *VALS), expected,
                    "streamed partial == global fold")


# ---------------------------------------------------------------- #
# Columnar merge-on-read: ORDER-INDEPENDENT partial epochs          #
# ---------------------------------------------------------------- #


def _columnar_table(spark, root):
    t = LakeTable(spark, root, n_buckets=8, merge_mode="mor")
    t.create(KEYS, SCHEMA, partial_columnar=True)
    return t


def _epoch_slices(pe, n=3):
    lo, hi = pe.agg(F.min("lsn"), F.max("lsn")).first()
    cuts = [lo + (hi - lo) * (i + 1) // n for i in range(n - 1)]
    bounds = [lo - 1, *cuts, hi]
    return [
        pe.where((F.col("lsn") > bounds[i]) & (F.col("lsn") <= bounds[i + 1]))
        for i in range(n)
    ]


def test_columnar_partial_any_epoch_order_converges(spark, tmp_root):
    """The headline property: applying the SAME partial epochs in
    different orders yields byte-identical table state — per-column
    LWW read resolution makes order irrelevant."""
    import itertools

    ch = gen_source_changes(spark, n_events=1500, n_keys=250, n_repos=10)
    pe = _partialize(ch).cache()
    slices = _epoch_slices(pe, 3)
    states = []
    for perm in [(0, 1, 2), (2, 0, 1), (1, 2, 0)]:
        t = _columnar_table(spark, os.path.join(tmp_root, f"col_{''.join(map(str, perm))}"))
        for e in perm:
            t.append_partial_epoch(slices[e], e)
        states.append(t.read().select(*KEYS, *VALS))
    expected = (
        fold_partial_updates(pe, KEYS, "lsn", op_col="op")
        .where(F.col("op") != "D")
        .select(*KEYS, *VALS)
    )
    for i, s in enumerate(states):
        assert_df_equal(s, expected, f"perm {i} == global fold")


def test_columnar_partial_compaction_preserves_state(spark, tmp_root):
    """Compaction after the out-of-order window drained: state is
    unchanged, and a NEW higher-LSN epoch on the compacted base still
    folds correctly.  An epoch reaching below the compaction LSN
    watermark is REJECTED — collapsing the delta stack discards the
    per-column setting-LSNs such an epoch would need to order
    against (the columnar mode's documented compaction contract)."""
    ch = gen_source_changes(spark, n_events=1200, n_keys=200, n_repos=8)
    pe = _partialize(ch).cache()
    slices = _epoch_slices(pe, 4)
    t = _columnar_table(spark, os.path.join(tmp_root, "col_cmp"))
    # epochs 0-2 land OUT OF ORDER, then the window drains -> compact
    t.append_partial_epoch(slices[2], 2)
    t.append_partial_epoch(slices[0], 0)
    t.append_partial_epoch(slices[1], 1)
    before = t.read().select(*KEYS, *VALS)
    rec = t.compact()
    assert rec["compacted_buckets"] > 0
    assert_df_equal(t.read().select(*KEYS, *VALS), before, "compaction no-op")
    # a NEW epoch (all LSNs above the watermark) folds onto the base
    t.append_partial_epoch(slices[3], 3)
    expected = (
        fold_partial_updates(pe, KEYS, "lsn", op_col="op")
        .where(F.col("op") != "D")
        .select(*KEYS, *VALS)
    )
    assert_df_equal(t.read().select(*KEYS, *VALS), expected,
                    "post-compaction epoch == global fold")
    # an epoch reaching BELOW the watermark is rejected, not silently wrong
    with pytest.raises(ValueError, match="compaction watermark"):
        t.append_partial_epoch(slices[0], 99)


def test_columnar_partial_replay_is_noop(spark, tmp_root):
    ch = gen_source_changes(spark, n_events=600, n_keys=100, n_repos=5)
    pe = _partialize(ch).cache()
    t = _columnar_table(spark, os.path.join(tmp_root, "col_rp"))
    t.append_partial_epoch(pe, 0)
    before = t.read().select(*KEYS, *VALS)
    rec = t.append_partial_epoch(pe, 0)
    assert rec.get("skipped_duplicate_epoch")
    assert_df_equal(t.read().select(*KEYS, *VALS), before, "replay")


def test_columnar_partial_midbatch_delete_out_of_order(spark, tmp_root):
    """delete+re-create inside one epoch, applied BEFORE an older
    epoch: the tombstone delta row must still reset the older epoch's
    column values."""
    t = LakeTable(spark, os.path.join(tmp_root, "col_dr"), n_buckets=2,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "a": "string", "b": "string"},
             partial_columnar=True)
    sch = "k string, lsn long, op string, a string, b string"
    # epoch 1 (applied FIRST): delete at 5, re-create a at 6
    t.append_partial_epoch(
        spark.createDataFrame([("k1", 5, "D", None, None),
                               ("k1", 6, "U", "a2", None)], sch), 1)
    # epoch 0 (applied SECOND, lower LSNs): sets a and b
    t.append_partial_epoch(
        spark.createDataFrame([("k1", 1, "U", "a1", "b1")], sch), 0)
    row = t.read().first()
    assert row["a"] == "a2" and row["b"] is None, dict(row.asDict())


def test_columnar_requires_flag_and_mor(spark, tmp_root):
    t = LakeTable(spark, os.path.join(tmp_root, "col_g1"), n_buckets=2,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "a": "string"})
    sch = "k string, lsn long, op string, a string"
    with pytest.raises(ValueError, match="partial_columnar"):
        t.append_partial_epoch(spark.createDataFrame([("k1", 1, "U", "a")], sch), 0)
    t2 = LakeTable(spark, os.path.join(tmp_root, "col_g2"), n_buckets=2)
    t2.create(["k"], {"k": "string", "a": "string"}, partial_columnar=True)
    with pytest.raises(ValueError, match="mor"):
        t2.append_partial_epoch(spark.createDataFrame([("k1", 1, "U", "a")], sch), 0)


def test_columnar_partial_schema_evolution(spark, tmp_root):
    """add + widen + rename mid-history on a columnar table: old
    deltas normalize to the current schema per write-group and the
    per-column fold treats a never-written new column as absent."""
    t = LakeTable(spark, os.path.join(tmp_root, "col_se"), n_buckets=2,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "a": "string", "n": "int"},
             partial_columnar=True)
    sch1 = "k string, lsn long, op string, a string, n int"
    t.append_partial_epoch(
        spark.createDataFrame([("k1", 1, "U", "a1", 7),
                               ("k2", 2, "U", "a2", None)], sch1), 0)
    t.apply_schema_change({"add": "b:string"})
    t.apply_schema_change({"widen": "n:long"})
    t.apply_schema_change({"rename": "a:alpha"})
    # post-evolution epoch: new column set for k2 only; OLD name still
    # emitted by a lagging producer (rename maps it forward)
    sch2 = "k string, lsn long, op string, a string, n long, b string"
    t.append_partial_epoch(
        spark.createDataFrame([("k2", 3, "U", None, 4_000_000_000, "b2")], sch2), 1)
    got = {r["k"]: (r["alpha"], r["n"], r["b"]) for r in t.read().collect()}
    assert got["k1"] == ("a1", 7, None)
    # k2: alpha folds from epoch 0 (absent in epoch 1), n widened past
    # int range, b from epoch 1
    assert got["k2"] == ("a2", 4_000_000_000, "b2")
    # compaction across the widen boundary stays readable and equal
    before = sorted(map(str, t.read().collect()))
    t.compact()
    assert sorted(map(str, t.read().collect())) == before


def test_columnar_read_resolution_is_one_shuffle(spark, tmp_root):
    """The per-column fold (window for the tombstone gate + groupBy on
    the same keys) must reuse one hashpartitioning — a single Exchange
    in the resolved-read plan, same budget as whole-row MoR."""
    t = LakeTable(spark, os.path.join(tmp_root, "col_plan"), n_buckets=2,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "a": "string"}, partial_columnar=True)
    sch = "k string, lsn long, op string, a string"
    t.append_partial_epoch(spark.createDataFrame([("k1", 1, "U", "a1")], sch), 0)
    t.append_partial_epoch(spark.createDataFrame([("k1", 2, "U", None)], sch), 1)
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_columnar_folded_rejects_interleaved_epochs(spark, tmp_root):
    """Folded deltas stamp columns with the key's batch-max LSN, so a
    batch whose raw LSN range overlaps a committed epoch must be
    rejected — silently accepting it mis-orders interleaved columns
    (code-review finding)."""
    t = LakeTable(spark, os.path.join(tmp_root, "col_il"), n_buckets=2,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "a": "string", "b": "string"},
             partial_columnar=True)
    sch = "k string, lsn long, op string, a string, b string"
    # epoch A: lsn 1 and 3
    t.append_partial_epoch(
        spark.createDataFrame([("k1", 1, "U", "a1", None),
                               ("k1", 3, "U", None, "b2")], sch), 0)
    # epoch B interleaves at lsn 2
    with pytest.raises(ValueError, match="overlaps committed epoch"):
        t.append_partial_epoch(
            spark.createDataFrame([("k1", 2, "U", "a9", None)], sch), 1)


def test_columnar_raw_mode_exact_under_interleaving(spark, tmp_root):
    """fold_batch=False keeps every column's true setting-LSN, so even
    interleaved epoch ranges converge to the sequential model: the
    lsn-2 a=a9 must LOSE to nothing (it is the latest a) while b keeps
    its lsn-3 value."""
    t = LakeTable(spark, os.path.join(tmp_root, "col_raw"), n_buckets=2,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "a": "string", "b": "string"},
             partial_columnar=True)
    sch = "k string, lsn long, op string, a string, b string"
    t.append_partial_epoch(
        spark.createDataFrame([("k1", 1, "U", "a1", None),
                               ("k1", 3, "U", None, "b2")], sch), 0,
        fold_batch=False)
    t.append_partial_epoch(
        spark.createDataFrame([("k1", 2, "U", "a9", None)], sch), 1,
        fold_batch=False)
    row = t.read().first()
    assert (row["a"], row["b"]) == ("a9", "b2"), dict(row.asDict())
    # and with the folded mode on DISJOINT ranges the same stream via a
    # single epoch agrees
    t2 = LakeTable(spark, os.path.join(tmp_root, "col_raw2"), n_buckets=2,
                   merge_mode="mor")
    t2.create(["k"], {"k": "string", "a": "string", "b": "string"},
              partial_columnar=True)
    t2.append_partial_epoch(
        spark.createDataFrame([("k1", 1, "U", "a1", None),
                               ("k1", 2, "U", "a9", None),
                               ("k1", 3, "U", None, "b2")], sch), 0)
    row2 = t2.read().first()
    assert (row2["a"], row2["b"]) == ("a9", "b2")


def test_bucketed_tail_with_row_image_minimal(spark, tmp_root):
    """The producer-bucketed staging path composed with the minimal
    row-image mode (the bench exposes this combination): run_from_table
    over a bucketed PARTIAL changelog equals the global fold."""
    from etl_cms_spark.plans.mapping import UNMAPPED_LANGS
    from etl_cms_spark.plans.pipeline import CDCPipeline, stage_changelog_bucketed

    ch = gen_source_changes(spark, n_events=2000, n_keys=250, n_repos=10)
    pe = _partialize_keep_lang(ch).cache()
    table = "t_partial_bucketed"
    try:
        stage_changelog_bucketed(spark, pe, table, n_buckets=8, n_epochs=2)
        p = CDCPipeline(spark, os.path.join(tmp_root, "pbt"), n_buckets=8,
                        row_image="minimal")
        p.run_from_table(table)
        expected = (
            fold_partial_updates(pe.drop("ts", "schema_change"), KEYS, "lsn",
                                 op_col="op")
            .where((F.col("op") != "D") & ~F.col("lang").isin(list(UNMAPPED_LANGS)))
            .select(*KEYS, *VALS)
        )
        assert_df_equal(p.current_state().select(*KEYS, *VALS), expected,
                        "bucketed partial tail == global fold")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
