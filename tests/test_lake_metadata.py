"""Metadata tables: snapshots_df / files_df (the Iceberg `snapshots`
and `files` metadata-table analogues — plan over the metadata layer,
distribute the footer reads)."""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.sink.lake import LakeTable


def _mk(spark, root, mode):
    t = LakeTable(spark, root, n_buckets=4, merge_mode=mode)
    t.create(["k"], {"k": "string", "v": "int"})
    rows = [(f"k{i:03d}", i, "U" if i % 7 else "D", i + 1) for i in range(120)]
    t.merge_epoch(
        spark.createDataFrame(rows, "k string, v int, op string, lsn long"), 0
    )
    rows2 = [(f"k{i:03d}", i * 10, "U", 200 + i) for i in range(0, 120, 3)]
    t.merge_epoch(
        spark.createDataFrame(rows2, "k string, v int, op string, lsn long"), 1
    )
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_files_df_row_counts_reconcile(spark, tmp_root, mode):
    """sum of footer row counts == unresolved physical rows; the
    footer key stats bound the actual key range."""
    t = _mk(spark, os.path.join(tmp_root, f"f_{mode}"), mode)
    files = t.files_df()
    agg = files.agg(
        F.sum("row_count").alias("n"),
        F.min("key_min").alias("lo"),
        F.max("key_max").alias("hi"),
        F.countDistinct("write_dir").alias("n_writes"),
    ).first()
    raw = t._read_buckets(t._load_manifest(), None, resolve=False)
    assert agg["n"] == raw.count()
    ks = raw.agg(F.min("k"), F.max("k")).first()
    assert agg["lo"] == ks[0] and agg["hi"] == ks[1]
    if mode == "mor":
        # epoch-1 deltas are separate write groups in the file listing
        assert agg["n_writes"] >= 2
    # every file sits in a manifest-referenced bucket dir
    assert files.where(~F.col("file_path").contains("_bucket=")).count() == 0


def test_files_df_tracks_snapshot_version(spark, tmp_root):
    """files_df(version) lists the OLD snapshot's files after more
    commits — the planning input for time travel."""
    t = _mk(spark, os.path.join(tmp_root, "tv"), "cow")
    v1 = t._current_version()
    n_v1 = t.files_df().agg(F.sum("row_count")).first()[0]
    t.merge_epoch(
        spark.createDataFrame([("zz", 1, "U", 999)], "k string, v int, op string, lsn long"),
        2,
    )
    assert t.files_df(v1).agg(F.sum("row_count")).first()[0] == n_v1
    assert t.files_df().agg(F.sum("row_count")).first()[0] == n_v1 + 1


def test_snapshots_df_history(spark, tmp_root):
    t = _mk(spark, os.path.join(tmp_root, "s"), "cow")
    t.apply_schema_change({"add": "extra:string"})
    snaps = t.snapshots_df().collect()
    cur = [r for r in snaps if r["is_current"]]
    assert len(cur) == 1 and cur[0]["version"] == t._current_version()
    assert cur[0]["n_schema_cols"] == 3 and cur[0]["n_epochs"] == 2
    # parent chain walks back through the history
    by_v = {r["version"]: r for r in snaps}
    v = cur[0]["version"]
    seen = 0
    while by_v.get(v) and by_v[v]["parent_version"] is not None:
        v = by_v[v]["parent_version"]
        seen += 1
    assert seen >= 2  # create -> epoch0 -> epoch1 -> schema change


def test_files_df_empty_table(spark, tmp_root):
    t = LakeTable(spark, os.path.join(tmp_root, "e"), n_buckets=4)
    t.create(["k"], {"k": "string", "v": "int"})
    assert t.files_df().count() == 0
    assert t.snapshots_df().where("is_current").count() == 1


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_partitions_df_rollup(spark, tmp_root, mode):
    """partitions_df == files_df grouped by bucket; MoR buckets touched
    by epoch-1 deltas report depth >= 2 (read amplification the
    compactor plans from), CoW buckets always depth 1."""
    t = _mk(spark, os.path.join(tmp_root, f"p_{mode}"), mode)
    parts = t.partitions_df().collect()
    assert {r["bucket"] for r in parts} <= set(range(4))
    files = t.files_df()
    tot = files.agg(F.sum("row_count"), F.count("*")).first()
    assert sum(r["row_count"] for r in parts) == tot[0]
    assert sum(r["n_files"] for r in parts) == tot[1]
    if mode == "cow":
        assert all(r["depth"] == 1 for r in parts)
    else:
        assert max(r["depth"] for r in parts) >= 2
