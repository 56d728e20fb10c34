import datetime as dt

from pyspark.sql import functions as F

from etl_cms_spark.operators.eras import build_eras, build_eras_faithful, sessionize
from tests.conftest import assert_df_equal


def _era_fixture(spark):
    """FIXTURES.md §3.8: null ends handled upstream; overlaps, exactly-30d
    boundary, 31d break, same-day duplicates."""
    rows = [
        # person 1, concept 10: overlap + 30d boundary chain
        (1, 10, "2020-01-01", "2020-01-10"),
        (1, 10, "2020-01-05", "2020-01-20"),   # overlaps
        (1, 10, "2020-02-19", "2020-02-25"),   # gap = exactly 30d from 01-20 -> same era
        (1, 10, "2020-03-28", "2020-04-02"),   # gap 32d -> new era
        # person 1, concept 20: same-day duplicate
        (1, 20, "2020-06-01", "2020-06-01"),
        (1, 20, "2020-06-01", "2020-06-01"),
        # person 2: single
        (2, 10, "2021-01-01", "2021-01-02"),
    ]
    df = spark.createDataFrame(
        rows, "person_id int, concept_id int, start_s string, end_s string"
    )
    return df.select(
        "person_id",
        "concept_id",
        F.to_date("start_s").alias("start_date"),
        F.to_date("end_s").alias("end_date"),
    )


def test_eras_one_pass_semantics(spark):
    out = build_eras(
        _era_fixture(spark), ["person_id", "concept_id"], "start_date", "end_date", 30
    )
    got = {
        (r.person_id, r.concept_id, str(r.era_start), str(r.era_end)): r.event_count
        for r in out.collect()
    }
    assert got == {
        (1, 10, "2020-01-01", "2020-02-25"): 3,
        (1, 10, "2020-03-28", "2020-04-02"): 1,
        (1, 20, "2020-06-01", "2020-06-01"): 2,
        (2, 10, "2021-01-01", "2021-01-02"): 1,
    }


def test_faithful_form_matches_one_pass(spark, orders):
    """Property: the reference-shaped 2-window+range-join form equals
    the one-pass form on real data (orders per customer, 30d gap)."""
    df = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("s"),
        F.col("o_orderdate").alias("e"),
    )
    a = build_eras(df, ["k"], "s", "e", 30)
    b = build_eras_faithful(df, ["k"], "s", "e", 30)
    assert_df_equal(a, b, "faithful vs one-pass")


def test_faithful_form_matches_on_synthetic(spark):
    df = _era_fixture(spark)
    a = build_eras(df, ["person_id", "concept_id"], "start_date", "end_date", 30)
    b = build_eras_faithful(df, ["person_id", "concept_id"], "start_date", "end_date", 30)
    assert_df_equal(a, b, "faithful vs one-pass (synthetic)")


def test_sessionize(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0)),
        (1, dt.datetime(2024, 1, 1, 10, 20)),   # <=30m gap, same session
        (1, dt.datetime(2024, 1, 1, 11, 0)),    # 40m gap -> new session
        (2, dt.datetime(2024, 1, 1, 9, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize(df, ["user_id"], "ts", "30 minutes")
    got = sorted(
        (r.user_id, r.event_count) for r in out.collect()
    )
    assert got == [(1, 1), (1, 2), (2, 1)]
