from pyspark.sql import functions as F

from etl_cms_spark.operators.dedup import (
    dense_stable_id,
    first_write_wins,
    keyed_dedup_stable_id,
    latest_by_lsn,
    latest_by_lsn_window,
)
from etl_cms_spark.operators.skew import salted_latest_by_lsn
from tests.conftest import assert_df_equal


def test_latest_by_lsn_forms_agree(changes):
    a = latest_by_lsn(changes, ["repo", "path"], "lsn")
    b = latest_by_lsn_window(changes, ["repo", "path"], "lsn")
    c = salted_latest_by_lsn(changes, ["repo", "path"], "lsn", n_salts=8)
    cols = ["repo", "path", "lsn", "op", "commit"]
    assert_df_equal(a.select(cols), b.select(cols), "max_by vs window")
    assert_df_equal(a.select(cols), c.select(cols), "max_by vs salted")


def test_latest_by_lsn_is_max(changes):
    out = latest_by_lsn(changes, ["repo", "path"], "lsn")
    mx = changes.groupBy("repo", "path").agg(F.max("lsn").alias("lsn"))
    assert_df_equal(out.select("repo", "path", "lsn"), mx, "kept lsn == max lsn")


def test_first_write_wins(changes):
    out = first_write_wins(changes, ["repo", "path"], "lsn")
    mn = changes.groupBy("repo", "path").agg(F.min("lsn").alias("lsn"))
    assert_df_equal(out.select("repo", "path", "lsn"), mn)


def test_stable_ids_deterministic(changes):
    a = keyed_dedup_stable_id(changes, ["repo", "path"])
    b = keyed_dedup_stable_id(changes, ["repo", "path"])
    assert_df_equal(a, b, "hash ids replay-stable")
    n = a.count()
    assert a.select("surrogate_id").distinct().count() == n


def test_dense_ids_are_dense(changes):
    d = dense_stable_id(changes, ["repo", "path"])
    n = d.count()
    row = d.agg(F.min("surrogate_id"), F.max("surrogate_id"), F.count_distinct("surrogate_id")).first()
    assert row[0] == 1 and row[1] == n and row[2] == n


def test_dense_ids_match_global_row_number(spark, changes):
    """The two-pass partition-offset form must be byte-identical to
    ROW_NUMBER() OVER (ORDER BY key) — the contract the DuckDB oracle
    replays — including with multi-partition, unsorted input."""
    from pyspark.sql import Window

    shuffled = changes.repartition(16)  # destroy any incidental order
    got = dense_stable_id(shuffled, ["repo", "path"], "vid", num_partitions=5)
    w = Window.orderBy("repo", "path")
    want = (
        changes.select("repo", "path")
        .dropDuplicates(["repo", "path"])
        .withColumn("vid", F.row_number().over(w).cast("long"))
    )
    assert_df_equal(got, want, "dense ids == global row_number")


def test_dense_ids_have_no_single_partition_window(changes):
    """Scale guard: the plan must contain NO Window operator at all —
    the old form's unpartitioned WindowExec moved every key to one
    partition (the reference's global counter reborn as a driver
    killer at 10^10 keys)."""
    d = dense_stable_id(changes, ["repo", "path"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_wide_id_distinguishes_null_placement(spark):
    """('a', NULL, 'b') and ('a', 'b', NULL) are distinct natural keys
    and must mint distinct 128-bit ids (concat_ws alone would silently
    drop the NULLs and collide them)."""
    df = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None), ("a", None, None)],
        "k1 string, k2 string, k3 string",
    )
    out = keyed_dedup_stable_id(df, ["k1", "k2", "k3"], wide=True)
    assert out.count() == 3
    assert out.select("surrogate_id").distinct().count() == 3


def test_salted_equals_strict_on_hot_keys(spark):
    """Hot-key fixture: a few keys receive most updates; the salted
    two-phase form must still agree with the plain form."""
    from etl_cms_spark.fixtures.generator import gen_source_changes

    skewed = gen_source_changes(
        spark, n_events=4000, n_keys=300, n_repos=10, key_skew=3.0
    )
    # verify the fixture IS skewed: hottest key >> average
    top = (
        skewed.groupBy("repo", "path").count().orderBy(F.col("count").desc()).first()
    )
    assert top["count"] > 4000 / 300 * 5
    a = latest_by_lsn(skewed, ["repo", "path"], "lsn")
    b = salted_latest_by_lsn(skewed, ["repo", "path"], "lsn", n_salts=8)
    cols = ["repo", "path", "lsn", "commit"]
    assert_df_equal(a.select(cols), b.select(cols), "salted on skew")


def test_join_form_prunes_to_max_lsn(spark, changes):
    from etl_cms_spark.operators.dedup import latest_by_lsn_join

    out = latest_by_lsn_join(changes, ["repo", "path"], "lsn")
    mx = changes.groupBy("repo", "path").agg(F.max("lsn").alias("lsn"))
    # every surviving row carries its key's max lsn (exact dups may
    # both survive; multiset of (key, lsn) pairs collapses to mx).
    assert_df_equal(out.select("repo", "path", "lsn").distinct(), mx, "join pruner")


def test_dense_id_partition_autosizing():
    """Round-3 verdict item 8: the range-partition count scales with
    the input instead of pinning to shuffle.partitions — 10^10 keys
    get thousands of partitions, small inputs keep the session floor."""
    from etl_cms_spark.operators.dedup import (
        _DENSE_ID_KEYS_PER_PART,
        _dense_id_partitions,
    )

    assert _dense_id_partitions(1_000, floor=32) == 32
    assert _dense_id_partitions(10 * _DENSE_ID_KEYS_PER_PART, floor=4) == 10
    assert _dense_id_partitions(10_000_000_000, floor=200) == 2500
    # ceil, not floor: one extra partial partition
    assert _dense_id_partitions(_DENSE_ID_KEYS_PER_PART + 1, floor=1) == 2
    # a wild over-estimate (stat-less plan sentinel) hits the hard cap
    # instead of asking for billions of range partitions
    from etl_cms_spark.operators.dedup import _DENSE_ID_MAX_PARTS

    assert _dense_id_partitions(2**63 - 1, floor=32) == _DENSE_ID_MAX_PARTS


def test_estimated_rows_statless_plan_falls_back_to_count():
    """Catalyst reports sizeInBytes = Long.MaxValue for stat-less
    plans (and multiplies it under joins); sizing partitions off that
    garbage number must fall back to an exact count instead."""
    from etl_cms_spark.operators.dedup import _estimated_rows

    class _RC:
        def isDefined(self):
            return False

    class _Stats:
        def rowCount(self):
            return _RC()

        def sizeInBytes(self):
            return 9223372036854775807  # Long.MaxValue

    class _QE:
        def optimizedPlan(self):
            return self

        def stats(self):
            return _Stats()

    class _JDF:
        def queryExecution(self):
            return _QE()

    class _DF:
        _jdf = _JDF()

        def count(self):
            return 1234

    assert _estimated_rows(_DF()) == 1234


def test_broadcast_form_matches_join_form(spark, changes):
    from etl_cms_spark.operators.dedup import (
        latest_by_lsn_broadcast,
        latest_by_lsn_join,
    )

    a = latest_by_lsn_broadcast(changes, ["repo", "path"], "lsn")
    b = latest_by_lsn_join(changes, ["repo", "path"], "lsn")
    cols = ["repo", "path", "lsn", "commit"]
    assert_df_equal(a.select(cols), b.select(cols), "broadcast==join")
    mx = changes.groupBy("repo", "path").agg(F.max("lsn").alias("lsn"))
    assert_df_equal(a.select("repo", "path", "lsn").distinct(), mx, "broadcast pruner")


# ---------------------------------------------------------------- #
# fold_partial_updates — binlog row_image=MINIMAL / partial columns #
# ---------------------------------------------------------------- #


def _partial_events(spark):
    # (key, lsn, op, a, b, changed)
    rows = [
        # k1: a set, then b set, then a overwritten — fold merges all
        ("k1", 1, "I", "a1", None, ["a"]),
        ("k1", 2, "U", None, "b1", ["b"]),
        ("k1", 3, "U", "a2", None, ["a"]),
        # k2: built, deleted, rebuilt partially — pre-delete b must die
        ("k2", 1, "I", "ax", "bx", ["a", "b"]),
        ("k2", 2, "D", None, None, []),
        ("k2", 3, "U", "ay", None, ["a"]),
        # k3: ends deleted
        ("k3", 1, "I", "az", "bz", ["a", "b"]),
        ("k3", 2, "D", None, None, []),
        # k4: explicit NULL-set of a via the mask (a in changed, value NULL)
        ("k4", 1, "I", "a4", "b4", ["a", "b"]),
        ("k4", 2, "U", None, None, ["a"]),
    ]
    return spark.createDataFrame(
        rows, "key string, lsn long, op string, a string, b string, changed array<string>"
    )


def test_fold_partial_null_means_absent(spark):
    from etl_cms_spark.operators.dedup import fold_partial_updates

    df = _partial_events(spark).drop("changed")
    out = fold_partial_updates(df, ["key"], "lsn", op_col="op")
    got = {r["key"]: (r["a"], r["b"], r["lsn"], r["op"]) for r in out.collect()}
    assert got["k1"] == ("a2", "b1", 3, "U")
    # delete resets: bx (lsn 1) must NOT survive k2's delete at lsn 2
    assert got["k2"] == ("ay", None, 3, "U")
    assert got["k3"] == (None, None, 2, "D")
    # without the mask, k4's NULL update is just "absent" — a4 survives
    assert got["k4"] == ("a4", "b4", 2, "U")


def test_fold_partial_mask_explicit_null_set(spark):
    from etl_cms_spark.operators.dedup import fold_partial_updates

    out = fold_partial_updates(
        _partial_events(spark), ["key"], "lsn", op_col="op", changed_cols_col="changed"
    )
    got = {r["key"]: (r["a"], r["b"], r["lsn"], r["op"]) for r in out.collect()}
    # with the mask, k4's lsn-2 event EXPLICITLY sets a to NULL
    assert got["k4"] == (None, "b4", 2, "U")
    assert got["k1"] == ("a2", "b1", 3, "U")
    assert got["k2"] == ("ay", None, 3, "U")
    assert got["k3"] == (None, None, 2, "D")


def test_fold_partial_full_image_equals_latest_by_lsn(changes):
    """When every event carries the full image (the fixture's regime),
    the fold degenerates to plain max-LSN dedup."""
    from etl_cms_spark.operators.dedup import fold_partial_updates

    df = (
        changes.select("repo", "path", "lsn", "commit", "content")
        # the fixture's delete events carry NULL content — those are
        # partial images by the fold's definition, so restrict the
        # degeneracy claim to rows that really are full images
        .where(F.col("content").isNotNull() & F.col("commit").isNotNull())
    )
    cols = ["repo", "path", "lsn", "commit", "content"]
    a = fold_partial_updates(df, ["repo", "path"], "lsn").select(cols)
    b = latest_by_lsn(df, ["repo", "path"], "lsn").select(cols)
    assert_df_equal(a, b, "full-image fold == latest_by_lsn")


def test_fold_partial_is_one_shuffle(spark):
    """Window (max delete-LSN per key) + groupBy on the same keys must
    reuse the window's hashpartitioning — ONE Exchange total."""
    from etl_cms_spark.operators.dedup import fold_partial_updates

    df = _partial_events(spark).drop("changed")
    plan = fold_partial_updates(df, ["key"], "lsn", op_col="op")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
