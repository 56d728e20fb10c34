"""DROP COLUMN schema evolution: metadata-only, time-travel-safe,
re-add never resurrects dropped data (the field-id-free analogue of
Iceberg's rule that a reused column name never rebinds to old data).

Reference parity note: ETL-CMS handles schema drift by regenerating
its whole output (python_etl rewrites every CDM csv per run); here the
drop is a metadata commit on an incrementally-maintained table, so the
guarantee under replay/compaction has to be explicit.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_schema_events, gen_source_changes
from etl_cms_spark.plans.pipeline import CDCPipeline
from etl_cms_spark.sink.lake import LakeTable
from tests.conftest import assert_df_equal


def _batch(spark, rows):
    """rows: (k, v, c, op, lsn)"""
    return spark.createDataFrame(rows, "k string, v int, c string, op string, lsn long")


def _mk(spark, root, mode):
    t = LakeTable(spark, root, n_buckets=4, merge_mode=mode)
    t.create(["k"], {"k": "string", "v": "int", "c": "string"})
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_drop_hides_column_and_values(spark, tmp_root, mode):
    t = _mk(spark, os.path.join(tmp_root, f"d_{mode}"), mode)
    t.merge_epoch(_batch(spark, [("a", 1, "x", "U", 1), ("b", 2, "y", "U", 2)]), 0)
    v_pre = t._current_version()
    t.apply_schema_change({"drop": "c"})
    got = t.read()
    assert "c" not in got.columns
    assert sorted((r["k"], r["v"]) for r in got.collect()) == [("a", 1), ("b", 2)]
    # time travel BELOW the drop still sees the column with its values
    old = t.read_at(v_pre)
    assert "c" in old.columns
    assert sorted((r["k"], r["c"]) for r in old.collect()) == [("a", "x"), ("b", "y")]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_readd_after_drop_starts_from_null(spark, tmp_root, mode):
    """The resurrection test: physical files written BEFORE the drop
    still contain the old values; a re-added column of the same name
    must read NULL from them, and only post-re-add writes show."""
    t = _mk(spark, os.path.join(tmp_root, f"r_{mode}"), mode)
    t.merge_epoch(_batch(spark, [("a", 1, "old-a", "U", 1), ("b", 2, "old-b", "U", 2)]), 0)
    t.apply_schema_change({"drop": "c"})
    t.apply_schema_change({"add": "c:string"})
    # update only 'b' after the re-add; 'a' keeps its pre-drop file
    t.merge_epoch(_batch(spark, [("b", 20, "new-b", "U", 3)]), 1)
    got = {r["k"]: (r["v"], r["c"]) for r in t.read().collect()}
    assert got == {"a": (1, None), "b": (20, "new-b")}
    # compaction / CoW rewrite must not bring the old values back
    t.compact()
    got = {r["k"]: (r["v"], r["c"]) for r in t.read().collect()}
    assert got == {"a": (1, None), "b": (20, "new-b")}


def test_drop_after_rename_hides_all_physical_spellings(spark, tmp_root):
    """rename c->cc, then drop cc: files written under the ORIGINAL
    physical name must hide too (the drop records every physical
    spelling), and a re-add of cc starts from NULL."""
    t = _mk(spark, os.path.join(tmp_root, "rn"), "mor")
    t.merge_epoch(_batch(spark, [("a", 1, "pre-rename", "U", 1)]), 0)
    t.apply_schema_change({"rename": "c:cc"})
    t.merge_epoch(
        spark.createDataFrame(
            [("b", 2, "post-rename", "U", 2)],
            "k string, v int, cc string, op string, lsn long",
        ),
        1,
    )
    t.apply_schema_change({"drop": "cc"})
    assert "cc" not in t.read().columns and "c" not in t.read().columns
    t.apply_schema_change({"add": "cc:string"})
    got = {r["k"]: r["cc"] for r in t.read().collect()}
    assert got == {"a": None, "b": None}


def test_drop_key_column_rejected(spark, tmp_root):
    t = _mk(spark, os.path.join(tmp_root, "kc"), "cow")
    with pytest.raises(ValueError, match="key column"):
        t.apply_schema_change({"drop": "k"})


def test_drop_missing_column_is_replay_noop(spark, tmp_root):
    t = _mk(spark, os.path.join(tmp_root, "nx"), "cow")
    t.apply_schema_change({"drop": "c"})
    v = t._current_version()
    t.apply_schema_change({"drop": "c"})  # replayed schema event
    assert t._current_version() == v  # no new snapshot committed


def test_changes_between_across_drop_boundary(spark, tmp_root):
    """CDC-out spanning a drop: payload structs use the CURRENT
    schema, and a pre-drop row whose only surviving columns are
    unchanged must NOT be reported as an update."""
    t = _mk(spark, os.path.join(tmp_root, "cb"), "cow")
    t.merge_epoch(_batch(spark, [("a", 1, "x", "U", 1), ("b", 2, "y", "U", 2)]), 0)
    v0 = t._current_version()
    t.apply_schema_change({"drop": "c"})
    t.merge_epoch(
        spark.createDataFrame(
            [("b", 20, "U", 3)], "k string, v int, op string, lsn long"
        ),
        1,
    )
    ch = t.changes_between(v0).collect()
    assert {r["k"]: r["op"] for r in ch} == {"b": "U"}
    assert "c" not in t.changes_between(v0).select("after.*").columns


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_pipeline_drop_event_in_changelog(spark, tmp_root, mode):
    """{"drop": ...} carried as an op='SCHEMA' changelog event, applied
    mid-stream by the epoch loop; replay converges (exactly-once)."""
    base = gen_source_changes(spark, n_events=800, n_keys=160, n_repos=8)
    # data lsns are odd 1..1599; 2 epochs split at 801 — the even lsn
    # 802 lands the event in epoch 1, colliding with no data event.
    sev = gen_schema_events(spark, {802: '{"drop": "commit"}'})
    ch = base.unionByName(sev)
    p = CDCPipeline(spark, os.path.join(tmp_root, f"pl_{mode}"), n_buckets=8,
                    merge_mode=mode)
    p.run(ch, n_epochs=2)
    st = p.current_state()
    assert "commit" not in st.columns
    # plain run minus the column == dropped run (values untouched)
    q = CDCPipeline(spark, os.path.join(tmp_root, f"plain_{mode}"), n_buckets=8,
                    merge_mode=mode)
    q.run(base, n_epochs=2)
    assert_df_equal(st, q.current_state().drop("commit"), "drop == plain minus col")
    # replay is a no-op and leaves the schema dropped
    p2 = CDCPipeline(spark, os.path.join(tmp_root, f"pl_{mode}"), n_buckets=8,
                     merge_mode=mode)
    p2.run(ch, n_epochs=2)
    assert_df_equal(p2.current_state(), st, "replay converges across drop")


def test_drop_readd_update_roundtrip_pipeline(spark, tmp_root):
    """drop+re-add inside one epoch window: epoch-0 winners read NULL
    for the re-added column, epoch-1 winners carry real values."""
    base = gen_source_changes(spark, n_events=800, n_keys=160, n_repos=8)
    sev = gen_schema_events(
        spark, {802: '{"drop": "commit"}', 804: '{"add": "commit:string"}'}
    )
    p = CDCPipeline(spark, os.path.join(tmp_root, "rr"), n_buckets=8)
    p.run(base.unionByName(sev), n_epochs=2)
    st = p.current_state()
    q = CDCPipeline(spark, os.path.join(tmp_root, "rr_plain"), n_buckets=8)
    q.run(base, n_epochs=2)
    # keys whose final upsert lands in epoch 1 (lsn >= 801): commit ==
    # plain run's; epoch-0 winners: NULL (dropped, re-added fresh).
    plain = {
        (r["repo"], r["path"]): r["commit"] for r in q.current_state().collect()
    }
    winners = {
        (r["repo"], r["path"]): r["lsn"]
        for r in base.where(F.col("op") != "D")
        .groupBy("repo", "path").agg(F.max("lsn").alias("lsn")).collect()
    }
    for r in st.collect():
        k = (r["repo"], r["path"])
        if winners[k] >= 801:
            assert r["commit"] == plain[k], k
        else:
            assert r["commit"] is None, k
