"""Transaction-boundary-aligned epoch slicing (``CDCPipeline(
txn_col=...)``): binlog events of one source transaction are
contiguous in LSN order, and the slicer assigns every row of a
transaction to the epoch of its COMMIT (max) LSN — so no epoch
boundary splits a transaction and no committed snapshot ever shows a
half-applied one.  Debezium surfaces the same contract as transaction
boundary events; the reference has no analogue (its CSV batches are
whole-file), so this is engine-level CDC semantics beyond it.
"""

import os

from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.pipeline import CDCPipeline
from tests.conftest import assert_df_equal

N_EPOCHS = 3


def _with_txns(changes):
    """Deterministic transaction ids: consecutive-LSN groups of ~8
    events per txn (lsn = 2i+1, so floor(lsn/16) groups 8 rows), with
    every 7th txn's rows left NULL (non-transactional writes)."""
    tid = F.floor(F.col("lsn") / 16)
    return changes.withColumn(
        "txn_id",
        F.when(F.pmod(tid, F.lit(7)) == 3, F.lit(None)).otherwise(
            F.concat(F.lit("txn-"), tid.cast("string"))
        ),
    )


def test_staged_assignment_never_splits_a_txn(spark, tmp_root):
    ch = _with_txns(gen_source_changes(spark, n_events=2000, n_keys=300))
    p = CDCPipeline(spark, os.path.join(tmp_root, "t"), n_buckets=4, txn_col="txn_id")
    staging = os.path.join(tmp_root, "staging")
    meta = p.stage(ch, staging, n_epochs=N_EPOCHS)
    staged = spark.read.parquet(staging)
    split = (
        staged.where(F.col("txn_id").isNotNull())
        .groupBy("txn_id")
        .agg(F.countDistinct("_epoch").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert split == 0, "a transaction's rows landed in two epochs"
    # NULL-txn rows slice by their own lsn, exactly like plain mode
    lo, width = meta["lo"], meta["width"]
    off_nominal = (
        staged.where(F.col("txn_id").isNull())
        .where(
            F.col("_epoch")
            != F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width)).cast("int")
        )
        .count()
    )
    assert off_nominal == 0
    # at least one txn actually spans a nominal boundary, else the
    # fixture proves nothing
    spanning = (
        staged.where(F.col("txn_id").isNotNull())
        .groupBy("txn_id")
        .agg(
            F.min(F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width))).alias("elo"),
            F.max(F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width))).alias("ehi"),
        )
        .where(F.col("elo") != F.col("ehi"))
        .count()
    )
    assert spanning > 0, "fixture has no boundary-spanning transaction"


def test_final_state_matches_plain_slicing(spark, tmp_root):
    """Commit-LSN assignment must be invisible in the converged state
    (latest-wins is order-free within an epoch) — both the unstaged
    and the staged txn paths."""
    ch = _with_txns(gen_source_changes(spark, n_events=1500, n_keys=250))
    plain = CDCPipeline(spark, os.path.join(tmp_root, "plain"), n_buckets=4)
    plain.run(ch.drop("txn_id"), n_epochs=N_EPOCHS)
    txn = CDCPipeline(spark, os.path.join(tmp_root, "txn"), n_buckets=4, txn_col="txn_id")
    txn.run(ch, n_epochs=N_EPOCHS)
    assert_df_equal(
        txn.current_state(), plain.current_state(), "txn slicing vs plain, unstaged"
    )
    staged = CDCPipeline(
        spark, os.path.join(tmp_root, "staged"), n_buckets=4, txn_col="txn_id"
    )
    staged.run(ch, n_epochs=N_EPOCHS, staging_dir=os.path.join(tmp_root, "stage_dir"))
    assert_df_equal(
        staged.current_state(), plain.current_state(), "txn slicing vs plain, staged"
    )


def test_half_applied_txn_never_visible(spark, tmp_root):
    """The semantic point, pinned by hand: txn t1 updates TWO keys
    with LSNs 5 and 6 — either side of the nominal epoch cut at
    lsn 5|6 (2 epochs over lsn 1..10).  Plain slicing would commit
    epoch 0 with key a at c1 but key b still at c0 (t1 half-applied);
    commit-LSN slicing defers ALL of t1 to epoch 1, so every committed
    snapshot shows t1 fully applied or not at all."""
    rows = [
        (1, "U", "r", "a", "c0", "sql", "v0 a", None, "t0"),
        (2, "U", "r", "b", "c0", "sql", "v0 b", None, "t0"),
        (5, "U", "r", "a", "c1", "sql", "v1 a", None, "t1"),
        (6, "U", "r", "b", "c1", "sql", "v1 b", None, "t1"),
        (10, "U", "r", "c", "c2", "sql", "v0 c", None, "t2"),
    ]
    ch = spark.createDataFrame(
        rows,
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, schema_change string, txn_id string",
    )
    p = CDCPipeline(spark, tmp_root, n_buckets=4, txn_col="txn_id")
    recs = p.run(ch, n_epochs=2)
    assert [r["epoch"] for r in recs] == [0, 1]
    after_e0 = {
        (r["path"], r["commit"])
        for r in p.table.read_at(p.table.version_at_epoch(0))
        .select("path", "commit")
        .collect()
    }
    assert after_e0 == {("a", "c0"), ("b", "c0")}, (
        f"epoch-0 snapshot shows a half-applied transaction: {after_e0}"
    )
    final = {
        (r["path"], r["commit"])
        for r in p.current_state().select("path", "commit").collect()
    }
    assert final == {("a", "c1"), ("b", "c1"), ("c", "c2")}


def test_txn_replay_is_noop(spark, tmp_root):
    ch = _with_txns(gen_source_changes(spark, n_events=800, n_keys=150))
    root = os.path.join(tmp_root, "rp")
    CDCPipeline(spark, root, n_buckets=4, txn_col="txn_id").run(ch, n_epochs=N_EPOCHS)
    before = CDCPipeline(spark, root, n_buckets=4).current_state().count()
    recs = CDCPipeline(spark, root, n_buckets=4, txn_col="txn_id").run(
        ch, n_epochs=N_EPOCHS
    )
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert CDCPipeline(spark, root, n_buckets=4).current_state().count() == before


# ---------------- streaming gate (start_stream txn_col) ----------------

CH_TXN_SCHEMA = (
    "lsn long, op string, ts timestamp, repo string, path string, "
    "commit string, lang string, content string, schema_change string, "
    "txn_id string, txn_total int"
)


def _rows_df(spark, rows):
    return spark.createDataFrame(rows, CH_TXN_SCHEMA)


def _r(lsn, key, commit, txn, total):
    import datetime

    return (
        lsn, "U", datetime.datetime(2024, 1, 1, 0, 0, lsn % 60), "r", key,
        commit, "sql", f"content {key} {commit}", None, txn, total,
    )


def test_stream_gate_unit_defers_and_releases(spark, tmp_root):
    """Direct gate calls (replay-deterministic micro-batch split):
    batch 0 holds txn t1's first two of three rows — they must defer;
    batch 1 delivers the tail — all three release together."""
    from etl_cms_spark.streaming.stream import _txn_boundary_gate

    state = os.path.join(tmp_root, "txnstate")
    b0 = _rows_df(spark, [
        _r(1, "a", "c0", "t0", 1),
        _r(5, "b", "c1", "t1", 3),
        _r(6, "c", "c1", "t1", 3),
    ])
    out0, c0 = _txn_boundary_gate(spark, b0, 0, "txn_id", "txn_total", state, None)
    assert {r["path"] for r in out0.collect()} == {"a"}
    c0.unpersist()
    b1 = _rows_df(spark, [_r(7, "d", "c1", "t1", 3), _r(9, "e", "c2", None, None)])
    out1, c1 = _txn_boundary_gate(spark, b1, 1, "txn_id", "txn_total", state, None)
    assert {r["path"] for r in out1.collect()} == {"b", "c", "d", "e"}
    c1.unpersist()
    # REPLAY of batch 1 (its own state dir already written) must
    # recompute the identical split from batch-0 state.
    out1r, c1r = _txn_boundary_gate(spark, b1, 1, "txn_id", "txn_total", state, None)
    assert {r["path"] for r in out1r.collect()} == {"b", "c", "d", "e"}
    c1r.unpersist()


def test_stream_gate_unit_flush_lag(spark, tmp_root):
    """A transaction whose tail never arrives force-flushes once its
    newest row lags the stream head past txn_flush_lsn_lag."""
    from etl_cms_spark.streaming.stream import _txn_boundary_gate

    state = os.path.join(tmp_root, "txnstate_fl")
    b0 = _rows_df(spark, [_r(1, "a", "c0", "tlost", 2)])
    out0, c0 = _txn_boundary_gate(spark, b0, 0, "txn_id", "txn_total", state, 10)
    assert out0.count() == 0
    c0.unpersist()
    b1 = _rows_df(spark, [_r(50, "b", "c1", "t2", 1)])
    out, c1 = _txn_boundary_gate(spark, b1, 1, "txn_id", "txn_total", state, 10)
    assert {r["path"] for r in out.collect()} == {"a", "b"}
    c1.unpersist()


def test_stream_txn_converges_and_never_half_applies(spark, tmp_root):
    """End-to-end: a changelog whose final transaction is missing its
    last row.  Run 1 must apply NOTHING of that transaction (no
    half-applied state at stream end); appending the tail and
    resuming on the same checkpoint applies it whole, exactly once."""
    from etl_cms_spark.streaming.stream import start_stream

    log_dir = os.path.join(tmp_root, "log")
    lake = os.path.join(tmp_root, "lake")
    part1 = _rows_df(spark, [
        _r(1, "k1", "c0", "ta", 1),
        _r(2, "k2", "c0", "tb", 2),
        _r(3, "k3", "c0", "tb", 2),
        _r(100, "a", "c9", "t9", 3),
        _r(101, "b", "c9", "t9", 3),
    ])
    part1.coalesce(2).write.mode("append").parquet(log_dir)
    q1, p1 = start_stream(
        spark, log_dir, lake, max_files_per_trigger=1, txn_col="txn_id"
    )
    q1.awaitTermination(300)
    paths1 = {r["path"] for r in p1.current_state().select("path").collect()}
    assert paths1 == {"k1", "k2", "k3"}, f"t9 half-applied: {paths1}"

    _rows_df(spark, [_r(102, "c", "c9", "t9", 3)]).coalesce(1).write.mode(
        "append"
    ).parquet(log_dir)
    q2, p2 = start_stream(
        spark, log_dir, lake, max_files_per_trigger=1, txn_col="txn_id"
    )
    q2.awaitTermination(300)
    paths2 = {r["path"] for r in p2.current_state().select("path").collect()}
    assert paths2 == {"k1", "k2", "k3", "a", "b", "c"}
    # restart once more: nothing new anywhere
    n_epochs = len(p2.table.lineage())
    q3, p3 = start_stream(
        spark, log_dir, lake, max_files_per_trigger=1, txn_col="txn_id"
    )
    q3.awaitTermination(300)
    assert len(p3.table.lineage()) == n_epochs
    assert {r["path"] for r in p3.current_state().select("path").collect()} == paths2


def test_stream_txn_guards(spark, tmp_root):
    import pytest as _pytest

    from etl_cms_spark.streaming.stream import start_stream

    with _pytest.raises(ValueError, match="changelog tailing only"):
        start_stream(
            spark, None, os.path.join(tmp_root, "l1"),
            source_table=os.path.join(tmp_root, "up"), txn_col="txn_id",
        )
    with _pytest.raises(ValueError, match="minimal"):
        start_stream(
            spark, os.path.join(tmp_root, "log2"), os.path.join(tmp_root, "l2"),
            txn_col="txn_id", row_image="minimal",
        )


def test_stream_gate_inconsistent_totals_one_decision(spark, tmp_root):
    """A malformed feed stamping one transaction's rows with
    different txn_total values must still get ONE per-transaction
    decision (window max), never a split."""
    from etl_cms_spark.streaming.stream import _txn_boundary_gate

    state = os.path.join(tmp_root, "txnstate_mix")
    rows = _rows_df(spark, [
        (3, "U", None, "r", "x", "c0", "sql", "cx", None, "tm", 2),
        (4, "U", None, "r", "y", "c0", "sql", "cy", None, "tm", 3),
    ])
    out0, c0 = _txn_boundary_gate(spark, rows, 0, "txn_id", "txn_total", state, None)
    assert out0.count() == 0, "max-total rule: 2 of 3 rows must all pend"
    c0.unpersist()
    tail = _rows_df(spark, [(5, "U", None, "r", "z", "c0", "sql", "cz", None, "tm", 3)])
    out1, c1 = _txn_boundary_gate(spark, tail, 1, "txn_id", "txn_total", state, None)
    assert {r["path"] for r in out1.collect()} == {"x", "y", "z"}
    c1.unpersist()


def test_txn_assignment_plan_single_exchange(spark):
    """Commit-LSN assignment costs exactly ONE Exchange (the window
    over the transaction id) on top of the scan — the measured ~3.5%
    (BENCH/txn_ab.json) is plan-bounded, not incidental."""
    ch = _with_txns(gen_source_changes(spark, n_events=500, n_keys=100))
    p = CDCPipeline.__new__(CDCPipeline)
    p.txn_col = "txn_id"
    assigned = p._epoch_ids(ch, 1, 100)
    plan = assigned._sc._jvm.PythonSQLUtils.explainString(
        assigned._jdf.queryExecution(), "formatted"
    )
    # formatted explain lists each node twice (tree + detail): count
    # the numbered detail entries.
    import re

    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan
    assert "Window" in plan


def test_txn_composes_with_demux(spark, tmp_root):
    """txn_col gates BEFORE the epoch body, so the multi-table demux
    fan-out inherits transaction atomicity untouched: final per-domain
    tables equal a plain demux run's."""
    ch = _with_txns(gen_source_changes(spark, n_events=1200, n_keys=200, n_repos=10))
    ref = CDCPipeline(
        spark, os.path.join(tmp_root, "ref"), n_buckets=4, demux_domains=True
    )
    ref.run(ch.drop("txn_id"), n_epochs=N_EPOCHS)
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "txn"), n_buckets=4, demux_domains=True,
        txn_col="txn_id",
    )
    p.run(ch, n_epochs=N_EPOCHS)
    for d in p.domains:
        assert_df_equal(p.domain_state(d), ref.domain_state(d), f"domain {d}")


def test_stream_gate_duplicate_delivery_does_not_release(spark, tmp_root):
    """Completion counts DISTINCT LSNs: a cross-batch re-delivery of
    an already-pending row (the case the watermarked dedup can no
    longer catch once its state expired) must not inflate the
    seen-count and release a half-applied transaction."""
    from etl_cms_spark.streaming.stream import _txn_boundary_gate

    state = os.path.join(tmp_root, "txnstate_dup")
    b0 = _rows_df(spark, [_r(5, "b", "c1", "t1", 3), _r(6, "c", "c1", "t1", 3)])
    out0, c0 = _txn_boundary_gate(spark, b0, 0, "txn_id", "txn_total", state, None)
    assert out0.count() == 0
    c0.unpersist()
    # duplicate of lsn 5 arrives again: 3 rows but only 2 distinct LSNs
    b1 = _rows_df(spark, [_r(5, "b", "c1", "t1", 3)])
    out1, c1 = _txn_boundary_gate(spark, b1, 1, "txn_id", "txn_total", state, None)
    assert out1.count() == 0, "duplicate delivery released a half-applied txn"
    c1.unpersist()
    b2 = _rows_df(spark, [_r(7, "d", "c1", "t1", 3)])
    out2, c2 = _txn_boundary_gate(spark, b2, 2, "txn_id", "txn_total", state, None)
    # releases the txn whole; the duplicated lsn-5 row may appear
    # twice (byte-identical) — the merge resolves that downstream.
    assert {r["path"] for r in out2.collect()} == {"b", "c", "d"}
    c2.unpersist()


def test_txn_batch_guards(spark, tmp_root):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="minimal"):
        CDCPipeline(spark, os.path.join(tmp_root, "g1"), txn_col="txn_id",
                    row_image="minimal")
    p = CDCPipeline(spark, os.path.join(tmp_root, "g2"), txn_col="txn_id")
    with _pytest.raises(ValueError, match="run_from_table"):
        p.run_from_table("some_table")
