"""As-of join: equivalence with the naive theta-join argmax form,
tie/tolerance semantics, and the plan shape (no join node, one
exchange)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_cms_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _naive_asof(spark, left, right, key, lt, rt, pay):
    """Reference semantics: theta join + argmax by (time, payload) —
    O(n*versions), used only as the oracle here."""
    j = left.join(right, key, "left")
    w = [F.col(c) for c in left.columns]
    return (
        j.groupBy(*w)
        .agg(
            F.max(
                F.when(
                    F.col(rt).isNotNull() & (F.col(rt) <= F.col(lt)),
                    F.struct(F.col(rt).alias("_t"), *[F.col(c) for c in pay]),
                )
            ).alias("_m")
        )
        .select(
            *w,
            F.col("_m._t").alias(f"{rt}"),
            *[F.col(f"_m.{c}").alias(c) for c in pay],
        )
    )


def test_asof_matches_naive_argmax(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u1", _ts("2024-01-01T09:00:00")),  # before any right row
            (4, "u2", _ts("2024-01-02T00:00:00")),
            (5, "u3", _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00:00"), 100),  # simultaneous: matches (inclusive)
            ("u1", _ts("2024-01-01T11:00:00"), 101),
            ("u2", _ts("2024-01-01T00:00:00"), 200),
        ],
        "user_id string, rts timestamp, version long",
    )
    got = asof_join(
        left, right, on=["user_id"], left_time="ts", right_time="rts",
        right_cols=["version"], suffix="",
    )
    exp = _naive_asof(spark, left, right, ["user_id"], "ts", "rts", ["version"])
    exp = exp.select(*got.columns)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    row = {r["event_id"]: r for r in got.collect()}
    assert row[1]["version"] == 100  # inclusive bound
    assert row[2]["version"] == 101
    assert row[3]["version"] is None  # left-join semantics
    assert row[5]["version"] is None


def test_asof_tie_break_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-05T00:00:00")), (2, "k", _ts("2024-03-01T00:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T00:00:00"), 1),
            ("k", _ts("2024-01-01T00:00:00"), 2),  # same time: highest _tb wins
        ],
        "user_id string, rts timestamp, version long",
    )
    got = asof_join(
        left, right, on=["user_id"], left_time="ts", right_time="rts",
        right_cols=["version"], right_order="version", suffix="",
    ).collect()
    by_id = {r["event_id"]: r for r in got}
    assert by_id[1]["version"] == 2
    # tolerance: the march event is ~60 days after the only version —
    # a 30-day staleness bound must null it out.
    tol = asof_join(
        left, right, on=["user_id"], left_time="ts", right_time="rts",
        right_cols=["version"], right_order="version",
        tolerance=F.expr("INTERVAL 30 DAYS"), suffix="",
    ).collect()
    by_id = {r["event_id"]: r for r in tol}
    assert by_id[1]["version"] == 2
    assert by_id[2]["version"] is None


def test_asof_plan_has_no_join_one_exchange(spark):
    """The union-window composition must not plan a join (the naive
    theta form explodes on long histories) and needs exactly one
    exchange — the window's hash partitioning on the key."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("user_id"),
        F.col("id").cast("timestamp").alias("ts"),
    )
    right = spark.range(20).select(
        (F.col("id") % 10).alias("user_id"),
        (F.col("id") * 3).cast("timestamp").alias("rts"),
        F.col("id").alias("version"),
    )
    plan = asof_join(
        left, right, on=["user_id"], left_time="ts", right_time="rts",
        right_cols=["version"],
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
