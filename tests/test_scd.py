"""SCD2 history maintenance: multi-epoch incremental fold equals the
one-shot LEAD() recompute, replays and crash windows heal, deletes
close / re-inserts reopen, monotonicity violations refuse, and the
close step is bucket-pruned."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.scd import Scd2History
from tests.conftest import assert_df_equal

PAY = {"commit": "string", "lang": "string", "content": "string"}
COLS = ["repo", "path", "valid_from_lsn", "valid_to_lsn",
        "commit", "lang", "content", "is_current"]


def _mk(spark, root, n_buckets=8, merge_mode="cow"):
    return Scd2History(
        spark, root, ["repo", "path"], PAY, n_buckets=n_buckets,
        merge_mode=merge_mode,
    )


def _expected(changes):
    w = Window.partitionBy("repo", "path").orderBy("lsn")
    return (
        changes.select("repo", "path", "lsn", "op", "commit", "lang", "content")
        .withColumn("valid_to_lsn", F.lead("lsn").over(w))
        .where(F.col("op") != "D")
        .select(
            "repo", "path",
            F.col("lsn").alias("valid_from_lsn"), "valid_to_lsn",
            "commit", "lang", "content",
            F.col("valid_to_lsn").isNull().alias("is_current"),
        )
    )


def _epochs(changes, n):
    hi = changes.agg(F.max("lsn")).first()[0]
    width = (hi + n) // n
    return [
        changes.where((F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width))
        for e in range(n)
    ]


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_incremental_history_equals_one_shot(
    spark, tmp_root, changes, merge_mode
):
    # "mor" also covers version-closing updates resolved at read time
    # through the (_lsn, _write_version) delta-stack tie-break.
    s = _mk(spark, os.path.join(tmp_root, "scd"), merge_mode=merge_mode)
    for e, batch in enumerate(_epochs(changes, 3)):
        s.apply_epoch(batch, e)
    assert_df_equal(
        s.history_df().select(*COLS), _expected(changes).select(*COLS),
        "scd2 incremental == LEAD() one-shot",
    )


def test_replay_and_crash_window_heal(spark, tmp_root, changes, monkeypatch):
    s = _mk(spark, os.path.join(tmp_root, "scd"))
    e0, e1, e2 = _epochs(changes, 3)
    s.apply_epoch(e0, 0)
    # replay of a committed epoch is a no-op
    rec = s.apply_epoch(e0, 0)
    assert rec["skipped_duplicate_epoch"]
    # crash AFTER the history commit, BEFORE the current merge
    real = s.current.merge_epoch
    monkeypatch.setattr(
        s.current, "merge_epoch",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError):
        s.apply_epoch(e1, 1)
    assert 1 in s.history.committed_epochs()
    assert 1 not in s.current.committed_epochs()
    monkeypatch.setattr(s.current, "merge_epoch", real)
    # replay heals: history merge skips, current merge lands
    s.apply_epoch(e1, 1)
    s.apply_epoch(e2, 2)
    assert_df_equal(
        s.history_df().select(*COLS),
        _expected(changes).select(*COLS),
        "crash window heals on replay",
    )


def test_delete_closes_and_reinsert_reopens(spark, tmp_root):
    rows = [
        # key A: U@1, D@5 (epoch 0)  ->  reopened U@9 (epoch 1)
        (1, "U", "r", "a", "c1", "py", "v1"),
        (5, "D", "r", "a", None, None, None),
        (9, "U", "r", "a", "c2", "go", "v2"),
        # key B: open at 3, closed by epoch-1 update at 11
        (3, "U", "r", "b", "c3", "py", "w1"),
        (11, "U", "r", "b", "c4", "py", "w2"),
    ]
    schema = "lsn long, op string, repo string, path string, commit string, lang string, content string"
    df = spark.createDataFrame(rows, schema)
    s = _mk(spark, os.path.join(tmp_root, "scd"), n_buckets=4)
    s.apply_epoch(df.where("lsn < 8"), 0)
    mid = {
        (r["path"], r["valid_from_lsn"]): (r["valid_to_lsn"], r["is_current"])
        for r in s.history_df().collect()
    }
    # after epoch 0: A's v1 closed by the delete, nothing open for A
    assert mid[("a", 1)] == (5, False)
    assert mid[("b", 3)] == (None, True)
    s.apply_epoch(df.where("lsn >= 8"), 1)
    assert_df_equal(
        s.history_df().select(*COLS), _expected(df).select(*COLS),
        "delete-close / reopen across epochs",
    )


def test_non_monotone_epoch_refuses(spark, tmp_root, changes):
    e0, e1, e2 = _epochs(changes, 3)
    s = _mk(spark, os.path.join(tmp_root, "scd"))
    s.apply_epoch(e1, 0)  # the MIDDLE lsn slice first
    with pytest.raises(ValueError, match="monotone"):
        s.apply_epoch(e0, 1)  # lower lsns for the same keys
    # nothing committed for the refused epoch on either table
    assert 1 not in s.history.committed_epochs()
    assert 1 not in s.current.committed_epochs()


def test_close_step_is_bucket_pruned(spark, tmp_root, changes):
    s = _mk(spark, os.path.join(tmp_root, "scd"), n_buckets=32)
    e0, e1, e2 = _epochs(changes, 3)
    s.apply_epoch(e0, 0)
    one_key = e1.join(
        e1.select("repo", "path").distinct().orderBy("repo", "path").limit(1),
        ["repo", "path"],
    )
    rec = s.apply_epoch(one_key, 1)
    assert rec["closed_buckets_read"] == 1


def test_asof_enrichment(spark, tmp_root, changes):
    s = _mk(spark, os.path.join(tmp_root, "scd"))
    for e, batch in enumerate(_epochs(changes, 3)):
        s.apply_epoch(batch, e)
    facts = changes.select(
        "repo", "path", (F.col("lsn") + 1).alias("at_lsn")
    )
    got = s.asof(facts, "at_lsn").select(
        "repo", "path", "at_lsn", "dim_commit", "dim_lang", "dim_content"
    )
    hist = _expected(changes)
    cond = (
        (facts["repo"] == hist["repo"]) & (facts["path"] == hist["path"])
        & (facts["at_lsn"] >= hist["valid_from_lsn"])
        & (hist["valid_to_lsn"].isNull() | (facts["at_lsn"] < hist["valid_to_lsn"]))
    )
    exp = facts.join(hist, cond, "inner").select(
        facts["repo"], facts["path"], "at_lsn",
        F.col("commit").alias("dim_commit"),
        F.col("lang").alias("dim_lang"),
        F.col("content").alias("dim_content"),
    )
    assert_df_equal(got, exp, "as-of enrichment == interval-join recompute")
    # interval disjointness: no fact row fans out
    assert got.count() == got.select("repo", "path", "at_lsn").distinct().count()


def test_scd_sidecar_follows_lake_rename(spark, tmp_root):
    """A lake rename mid-stream propagates into both SCD tables before
    the fold (the lake's epoch batches arrive under its CURRENT
    names); tracked history survives under the new name."""
    from etl_cms_spark.fixtures.generator import gen_schema_events
    from etl_cms_spark.plans.pipeline import CDCPipeline

    base = gen_source_changes(spark, n_events=900, n_keys=150, n_repos=5)
    sev = gen_schema_events(spark, {899: '{"rename": "lang:language"}'})
    scd = Scd2History(
        spark, os.path.join(tmp_root, "scd"), ["repo", "path"],
        {"commit": "string", "lang": "string"},
        n_buckets=8, merge_mode="mor",
    )
    p = CDCPipeline(spark, os.path.join(tmp_root, "lake"), n_buckets=8,
                    merge_mode="mor", sidecars=[scd])
    p.run(base.unionByName(sev), n_epochs=2)
    assert scd.payload_cols == ["commit", "language"]
    cur = scd.current.read()
    assert "language" in cur.columns and "lang" not in cur.columns
    assert_df_equal(
        cur.select("repo", "path", "commit", "language"),
        p.current_state().select("repo", "path", "commit", "language"),
        "scd current == lake live state across the rename",
    )
    # history columns renamed too; pre-rename versions kept their data
    h = scd.history_df()
    assert "language" in h.columns
    assert h.where(F.col("language").isNull()).count() == 0
