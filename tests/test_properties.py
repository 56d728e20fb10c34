"""Property-based tests (hypothesis) over the core operator laws.

Few, small examples — each example round-trips through Spark.
deadline=None because Spark job latency is environment noise; the
``spark`` fixture is session-scoped so reuse across examples is safe.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_cms_spark.operators.dedup import latest_by_lsn, latest_by_lsn_window
from etl_cms_spark.operators.eras import build_eras, build_eras_faithful
from etl_cms_spark.operators.skew import salted_latest_by_lsn

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals = st.lists(
    st.tuples(
        st.integers(0, 3),           # key
        st.integers(0, 120),         # start offset days
        st.integers(0, 15),          # duration days
    ),
    min_size=1,
    max_size=12,
)


@settings(**_SETTINGS)
@given(spark_intervals=intervals)
def test_era_forms_agree_on_random_intervals(spark, spark_intervals):
    base = dt.date(2020, 1, 1)
    rows = [
        (k, base + dt.timedelta(days=s), base + dt.timedelta(days=s + d))
        for k, s, d in spark_intervals
    ]
    df = spark.createDataFrame(rows, "k int, s date, e date")
    a = build_eras(df, ["k"], "s", "e", 30)
    b = build_eras_faithful(df, ["k"], "s", "e", 30)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


events = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 1000)),  # (key, lsn)
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[1],
)


@settings(**_SETTINGS)
@given(evts=events)
def test_dedup_forms_agree_on_random_streams(spark, evts):
    rows = [(k, lsn, f"payload-{k}-{lsn}") for k, lsn in evts]
    df = spark.createDataFrame(rows, "k int, lsn long, payload string")
    a = latest_by_lsn(df, ["k"], "lsn")
    b = latest_by_lsn_window(df, ["k"], "lsn")
    c = salted_latest_by_lsn(df, ["k"], "lsn", n_salts=4)
    ra = sorted(map(str, a.collect()))
    assert ra == sorted(map(str, b.collect())) == sorted(map(str, c.collect()))
    # law: kept lsn is the max per key
    expect = {}
    for k, lsn in evts:
        expect[k] = max(expect.get(k, -1), lsn)
    got = {r["k"]: r["lsn"] for r in a.collect()}
    assert got == expect
