from pyspark.sql import functions as F

from etl_cms_spark.functions import scalars as S


def test_yyyymmdd_to_date(spark):
    df = spark.createDataFrame([("20200131",), ("",), (None,)], "d string")
    got = [str(r[0]) for r in df.select(S.yyyymmdd_to_date(F.col("d"))).collect()]
    assert got == ["2020-01-31", "None", "None"]


def test_gender_race_ethnicity(spark):
    df = spark.createDataFrame([("1",), ("2",), ("9",)], "c string")
    g = [r[0] for r in df.select(S.gender_concept(F.col("c"))).collect()]
    assert g == [8507, 8532, 0]
    r_ = [r[0] for r in df.select(S.race_concept(F.col("c"))).collect()]
    assert r_ == [8527, 8516, 0]


def test_ssa_state_and_location_key(spark):
    df = spark.createDataFrame([("5", "7"), ("33", "123")], "st string, cty string")
    rows = df.select(
        S.ssa_state(F.col("st")).alias("state"),
        S.location_key(F.col("st"), F.col("cty")).alias("key"),
    ).collect()
    assert rows[0]["state"] == "CA" and rows[0]["key"] == "05-007"
    assert rows[1]["state"] == "NY" and rows[1]["key"] == "33-123"


def test_normalize_vocab(spark):
    df = spark.createDataFrame(
        [("CPT4", "123.45"), ("ICD9CM", "V45.1"), ("NDC", "999")],
        "v string, c string",
    )
    v, c = S.normalize_vocab(F.col("v"), F.col("c"))
    rows = df.select(v.alias("v"), c.alias("c")).collect()
    assert [(r.v, r.c) for r in rows] == [
        ("HCPCS", "12345"),
        ("ICD9", "V451"),
        ("NDC", "999"),
    ]


def test_add_months_clamped(spark):
    df = spark.createDataFrame([("2020-01-31",)], "d string")
    got = df.select(S.add_months_clamped(F.to_date("d"), 1)).first()[0]
    assert str(got) == "2020-02-29"


def test_default_end_date(spark):
    df = spark.createDataFrame(
        [("2020-01-01", "2020-02-01", 10), ("2020-01-01", None, 10), ("2020-01-01", None, None)],
        "s string, e string, ds int",
    )
    out = df.select(
        S.default_end_date(F.to_date("e"), F.to_date("s"), F.col("ds")).alias("x")
    ).collect()
    assert [str(r.x) for r in out] == ["2020-02-01", "2020-01-11", "2020-01-02"]


def test_null_guarded_sum_and_greatest(spark):
    df = spark.createDataFrame([(1.0, None, "3"), (None, None, None)], "a double, b double, c string")
    s = df.select(S.null_guarded_sum(F.col("a"), F.col("b"), F.col("c")).alias("x")).collect()
    assert [r.x for r in s] == [4.0, 0.0]
