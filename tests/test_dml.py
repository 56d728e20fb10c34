"""Ad-hoc bulk DML (DELETE FROM / UPDATE ... WHERE) expressed as one
more idempotent change epoch: flows through CDC-out, time travel, and
later source events overwrite it like any competing writer."""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.sink.lake import LakeTable
from tests.conftest import assert_df_equal

LANGS = ["ada", "c", "go", "js", "py", "rs"]


def _make(spark, root, n=4000):
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(
        ["k"], {"k": "string", "num": "int", "lang": "string", "v": "string"}
    )
    base = spark.range(n).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).cast("int").alias("num"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.col("id"), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
        (F.col("id") + 1).alias("lsn"),
        F.lit("U").alias("op"),
    )
    t.merge_epoch(base.where("id % 2 = 0"), 0)
    t.merge_epoch(base.where("id % 2 = 1"), 1)
    return t


def test_delete_where_predicate(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "dml_del"))
    before = t.read().count()
    rec = t.delete_where({"lang": ("go", "go")})
    # DML ids live in their own band: a future SOURCE epoch 2 must not
    # collide with this commit and be silently skipped as a duplicate
    assert rec["epoch"] == LakeTable.DML_EPOCH_BASE
    assert rec["rows_deleted"] > 0
    assert rec["dml"] == {"kind": "delete", "predicates": {"lang": ["go", "go"]}}
    assert_df_equal(
        t.read(),
        t.read_at_epoch(1).where("lang <> 'go'"),
        "post-delete state",
    )
    assert t.read().count() == before - rec["rows_deleted"]
    # CDC-out carries the deletes for downstream consumers
    out = t.changes_for_epoch(rec["epoch"])
    assert out.where("op = 'D'").count() == rec["rows_deleted"]
    # idempotent replay: committed epoch is a no-op
    again = t.delete_where({"lang": ("go", "go")}, epoch=rec["epoch"])
    assert again.get("skipped_duplicate_epoch")
    assert t.read().count() == before - rec["rows_deleted"]


def test_delete_all_is_logical_truncate_with_history(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "dml_trunc"), n=500)
    v_before = t._load_manifest()["version"]
    t.delete_where()
    assert t.read().count() == 0
    assert t.read_at(v_before).count() == 500  # time travel sees through


def test_update_where_and_lsn_ordering(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "dml_upd"), n=1000)
    rec = t.update_where(
        {"v": F.lit("redacted"), "num": -1}, {"lang": ["go", "py"]}
    )
    assert rec["dml"]["set_cols"] == ["num", "v"]
    got = t.read().where("lang in ('go','py')")
    assert got.where("v <> 'redacted' or num <> -1").count() == 0
    assert t.read().where("lang not in ('go','py') and v = 'redacted'").count() == 0
    # a later source event (higher lsn) overwrites the DML image
    hi = max(r["lsn_max"] for r in t.lineage() if r.get("lsn_max"))
    fix = spark.createDataFrame(
        [("k0", 7, "go", "fresh", "U", hi + 1)],
        "k string, num int, lang string, v string, op string, lsn long",
    )
    t.merge_epoch(fix, 10)
    row = t.read().where("k = 'k0'").first()
    assert row["v"] == "fresh" and row["num"] == 7
    # and a DML issued after that lands ABOVE the new high-water mark
    t.delete_where({"k": ("k0", "k0")})
    assert t.read().where("k = 'k0'").count() == 0


def test_dml_guards(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "dml_guard"), n=100)
    with pytest.raises(ValueError, match="key columns"):
        t.update_where({"k": "nope"})
    with pytest.raises(ValueError, match="no such columns"):
        t.update_where({"missing": 1})
    t2 = LakeTable(
        spark, os.path.join(tmp_root, "dml_pc"), n_buckets=2, merge_mode="mor"
    )
    t2.create(["k"], {"k": "string", "a": "int"}, partial_columnar=True)
    with pytest.raises(ValueError, match="partial_columnar"):
        t2.delete_where()


def test_delete_where_uses_pruned_scan(spark, tmp_root):
    """After compaction + stats, the victim scan is file-pruned (same
    plan_where machinery); results stay exact."""
    t = _make(spark, os.path.join(tmp_root, "dml_prune"))
    t.compact(cluster_by=["lang"], target_file_rows=300)
    t.refresh_stats(["lang"])
    plan = t.plan_where({"lang": ("go", "go")})
    assert plan["files_read"] < plan["files_total"]
    rec = t.delete_where({"lang": ("go", "go")})
    assert rec["rows_deleted"] > 0
    assert t.read().where("lang = 'go'").count() == 0


def test_merge_into_upsert(spark, tmp_root):
    """Matched rows take the source's full image, unmatched rows
    insert; the whole merge is one idempotent epoch at a fresh LSN."""
    t = _make(spark, os.path.join(tmp_root, "mi_upsert"), n=1000)
    src = spark.createDataFrame(
        [("k5", 500, "go", "img5"), ("k999999", 1, "py", "new")],
        "k string, num int, lang string, v string",
    )
    rec = t.merge_into(src)
    assert rec["dml"]["kind"] == "merge_into"
    got = {r["k"]: r for r in t.read().where("k in ('k5','k999999')").collect()}
    assert got["k5"]["v"] == "img5" and got["k5"]["num"] == 500
    assert got["k999999"]["v"] == "new"
    assert t.read().count() == 1001  # one insert, one update
    again = t.merge_into(src, epoch=rec["epoch"])
    assert again.get("skipped_duplicate_epoch")


def test_merge_into_conditional_delete(spark, tmp_root):
    """when_matched='delete' + matched_condition: only matched rows
    satisfying the condition (over the `target` struct) die; unmatched
    source rows are ignored, non-satisfying matched rows fall through."""
    t = _make(spark, os.path.join(tmp_root, "mi_del"), n=1000)
    before = {r["k"]: r["num"] for r in t.read().where(
        "k in ('k1','k2','k3')").collect()}
    src = spark.createDataFrame(
        [("k1",), ("k2",), ("k3",), ("k_missing",)], "k string"
    )
    thresh = sorted(before.values())[1]  # kill exactly the lowest two... or fewer on ties
    rec = t.merge_into(
        src,
        when_matched="delete",
        matched_condition=f"target.num <= {thresh}",
        when_not_matched="ignore",
    )
    assert rec["rows_deleted"] == sum(1 for v in before.values() if v <= thresh)
    left = {r["k"] for r in t.read().where("k in ('k1','k2','k3')").collect()}
    assert left == {k for k, v in before.items() if v > thresh}
    assert t.read().where("k = 'k_missing'").count() == 0


def test_merge_into_guards(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "mi_guard"), n=200)
    dup = spark.createDataFrame(
        [("k1", 1, "go", "a"), ("k1", 2, "go", "b")],
        "k string, num int, lang string, v string",
    )
    with pytest.raises(ValueError, match="multiple rows per key"):
        t.merge_into(dup)
    with pytest.raises(ValueError, match="lacks columns"):
        t.merge_into(spark.createDataFrame([("k1",)], "k string"))
    with pytest.raises(ValueError, match="when_matched"):
        t.merge_into(dup.limit(1), when_matched="upsert")
    with pytest.raises(ValueError, match="reserved"):
        t.merge_into(
            spark.createDataFrame([("k1", 1)], "k string, target int")
        )


def test_merge_into_bucket_pruned_probe(spark, tmp_root):
    """The target probe touches only the source keys' hash buckets —
    the lineage's changed_buckets stays at the source's bucket set."""
    t = _make(spark, os.path.join(tmp_root, "mi_prune"), n=2000)
    src = spark.createDataFrame(
        [("k7", -7, "go", "seven")], "k string, num int, lang string, v string"
    )
    rec = t.merge_into(src)
    assert len(rec["changed_buckets"]) == 1
    assert t.read().where("k = 'k7'").first()["v"] == "seven"


def test_dml_epoch_namespace_no_source_collision(spark, tmp_root):
    """After an auto-id DML, the NEXT source epoch id (2 here) must
    still apply — a max+1 DML id would swallow it as a duplicate
    (the repair-epoch hazard); out-of-band explicit ids are refused."""
    t = _make(spark, os.path.join(tmp_root, "dml_ns"), n=300)
    t.delete_where({"lang": ("go", "go")})
    hi = max(r["lsn_max"] for r in t.lineage() if r.get("lsn_max"))
    nxt = spark.createDataFrame(
        [("brand_new", 1, "go", "v", "U", hi + 1)],
        "k string, num int, lang string, v string, op string, lsn long",
    )
    rec = t.merge_epoch(nxt, 2)  # the id a max+1 DML would have taken
    assert not rec.get("skipped_duplicate_epoch")
    assert t.read().where("k = 'brand_new'").count() == 1
    with pytest.raises(ValueError, match="reserved DML namespace"):
        t.delete_where(epoch=5)
    # second auto-id DML advances within the band
    rec2 = t.update_where({"num": -1}, {"k": ("brand_new", "brand_new")})
    assert rec2["epoch"] == LakeTable.DML_EPOCH_BASE + 1
