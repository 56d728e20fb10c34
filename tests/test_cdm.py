import pytest
from pyspark.sql import functions as F

from etl_cms_spark.plans.cdm import (
    build_death,
    build_drug_eras,
    build_location,
    build_observation_period,
    build_payer_plan_period,
    build_person,
    latest_year_rows,
)


@pytest.fixture(scope="module")
def bene(spark):
    # (desynpuf_id, year, birth, death, sex, race, state, county,
    #  hi_mons, smi_mons, hmo_mons, partd_mons, row_order)
    rows = [
        # person A: 3 years, full coverage, one duplicate 2008 row
        ("A", 2008, "19360501", None, "1", "1", "05", "70", 12, 12, 0, 12, 1),
        ("A", 2008, "19991231", None, "2", "2", "99", "99", 1, 1, 1, 1, 2),  # dup, ignored
        ("A", 2009, "19360501", None, "1", "1", "05", "70", 12, 12, 0, 12, 3),
        ("A", 2010, "19360501", None, "1", "1", "05", "70", 6, 6, 0, 6, 4),
        # person B: one year, dies 2009, partial coverage
        ("B", 2009, "19420315", "20091120", "2", "5", "33", "123", 11, 0, 0, 0, 5),
    ]
    return spark.createDataFrame(
        rows,
        "desynpuf_id string, year int, bene_birth_dt string, bene_death_dt string, "
        "bene_sex_ident_cd string, bene_race_cd string, sp_state_code string, "
        "bene_county_cd string, bene_hi_cvrage_tot_mons int, bene_smi_cvrage_tot_mons int, "
        "bene_hmo_cvrage_tot_mons int, plan_cvrg_mos_num int, row_order int",
    )


def test_latest_year_first_write_wins(spark, bene):
    latest = {r["desynpuf_id"]: r for r in latest_year_rows(bene).collect()}
    assert latest["A"]["year"] == 2010
    assert latest["A"]["bene_birth_dt"] == "19360501"  # dup 2008 row ignored


def test_person(spark, bene):
    p = {r["person_source_value"]: r for r in build_person(bene).collect()}
    a, b = p["A"], p["B"]
    assert (a["gender_concept_id"], a["race_concept_id"]) == (8507, 8527)
    assert (a["year_of_birth"], a["month_of_birth"], a["day_of_birth"]) == (1936, 5, 1)
    assert a["location_source_value"] == "05-070"
    assert b["gender_concept_id"] == 8532 and b["ethnicity_concept_id"] == 38003563
    # replay-stable ids
    p2 = {r["person_source_value"]: r["person_id"] for r in build_person(bene).collect()}
    assert p2 == {k: v["person_id"] for k, v in p.items()}


def test_location_dimension(spark, bene):
    locs = {r["location_source_value"]: r for r in build_location(bene).collect()}
    assert set(locs) == {"05-070", "99-099", "33-123"}
    assert locs["05-070"]["state"] == "CA" and locs["33-123"]["state"] == "NY"


def test_observation_period(spark, bene):
    obs = {r["person_id"]: r for r in build_observation_period(bene).collect()}
    a_id = spark.createDataFrame([("A",)], "k string").select(F.xxhash64("k")).first()[0]
    b_id = spark.createDataFrame([("B",)], "k string").select(F.xxhash64("k")).first()[0]
    assert str(obs[a_id]["observation_period_start_date"]) == "2008-01-01"
    assert str(obs[a_id]["observation_period_end_date"]) == "2010-06-30"  # 6 months of 2010
    assert str(obs[b_id]["observation_period_end_date"]) == "2009-11-30"  # 11 months


def test_death(spark, bene):
    d = build_death(bene).collect()
    assert len(d) == 1 and str(d[0]["death_date"]) == "2009-11-20"


def test_payer_plan_period_merges_contiguous_years(spark, bene):
    pp = build_payer_plan_period(bene).collect()
    by_plan = {}
    for r in pp:
        by_plan.setdefault(r["plan_source_value"], []).append(
            (str(r["payer_plan_period_start_date"]), str(r["payer_plan_period_end_date"]))
        )
    # person A HI: 2008 full + 2009 full + 2010 half merge into one period
    spans = sorted(by_plan["MEDICARE_HI"])
    assert ("2008-01-01", "2010-06-30") in spans
    # person B HI: 2009 Jan-Nov only
    assert ("2009-01-01", "2009-11-30") in spans
    # HMO never covered for A (0 months) except dup row which was dropped
    assert "MEDICARE_HMO" not in by_plan


def test_drug_eras(spark):
    exposures = spark.createDataFrame(
        [
            # person 1, drug 100 (-> ingredient 11): chain within 30d gaps
            (1, 100, "2020-01-01", None, 10),       # end -> 01-11
            (1, 100, "2020-02-01", None, 5),        # gap 21d -> same era, end 02-06
            (1, 100, "2020-04-01", "2020-04-02", 1),  # gap 55d -> new era
            # person 1, drug 0 excluded; negative days_supply excluded
            (1, 0, "2020-01-01", None, 10),
            (1, 100, "2020-01-01", None, -3),
            # person 2, drug 200 (-> ingredient 22)
            (2, 200, "2021-06-01", None, None),     # end -> start+1d
        ],
        "person_id int, drug_concept_id int, s string, e string, days_supply int",
    ).select(
        "person_id",
        "drug_concept_id",
        F.to_date("s").alias("drug_exposure_start_date"),
        F.to_date("e").alias("drug_exposure_end_date"),
        "days_supply",
    )
    ancestor = spark.createDataFrame(
        [(11, 100), (22, 200)], "ancestor_concept_id int, descendant_concept_id int"
    )
    concept = spark.createDataFrame(
        [(11, "RxNorm", "Ingredient"), (22, "RxNorm", "Ingredient"), (100, "RxNorm", "Drug")],
        "concept_id int, vocabulary_id string, concept_class_id string",
    )
    eras = build_drug_eras(exposures, ancestor, concept, gap_days=30).collect()
    got = {
        (r["person_id"], r["drug_concept_id"], str(r["drug_era_start_date"]), str(r["drug_era_end_date"])): r["drug_exposure_count"]
        for r in eras
    }
    assert got == {
        (1, 11, "2020-01-01", "2020-02-06"): 2,
        (1, 11, "2020-04-01", "2020-04-02"): 1,
        (2, 22, "2021-06-01", "2021-06-02"): 1,
    }


def test_link_payer_plan_period_out_of_range_survives(spark):
    """Round-3 ADVICE regression: a cost row whose (person, plan) HAS
    periods in the dim but none covering the cost date must survive
    with NULL payer_plan_period_id — same as a row with no key match
    at all (the old filter form silently dropped it)."""
    import datetime

    from etl_cms_spark.plans import claims

    d = datetime.date
    cost = spark.createDataFrame(
        [
            ("P1", "planA", d(2008, 6, 1)),   # covered
            ("P1", "planA", d(2012, 6, 1)),   # key matches, date out of range
            ("P9", "planA", d(2008, 6, 1)),   # no key match
        ],
        "person_source_value string, plan_source_value string, cost_date date",
    )
    ppp = spark.createDataFrame(
        [("P1", "planA", d(2008, 1, 1), d(2008, 12, 31), 101)],
        "person_source_value string, plan_source_value string, "
        "payer_plan_period_start_date date, payer_plan_period_end_date date, "
        "payer_plan_period_id long",
    ).withColumn("person_id", F.xxhash64("person_source_value"))
    out = claims.link_payer_plan_period(cost, ppp, "cost_date")
    rows = {
        (r["person_source_value"], str(r["cost_date"])): r["payer_plan_period_id"]
        for r in out.collect()
    }
    assert len(rows) == 3  # nothing silently dropped
    assert rows[("P1", "2008-06-01")] == 101
    assert rows[("P1", "2012-06-01")] is None
    assert rows[("P9", "2008-06-01")] is None
