"""Worked reference-parity example: SynPUF-shaped input → CDM-shaped
output tables, built entirely from the operator/function library.

This is the engine's re-expression of the reference's per-beneficiary
builders (write_person_record CMS_SynPuf_ETL_CDM_v5.py:595-643,
observation-period derivation :844-860, payer_plan_period :648-699) —
but as set-oriented DataFrame plans instead of the row-at-a-time
accumulation loop (:2056-2087).  Every scalar transform comes from
functions/scalars.py with its own reference citation.

Input shape (FIXTURES.md §3.1): one row per (beneficiary, year) with
possible duplicate year rows (first wins) — columns
  desynpuf_id, year, bene_birth_dt (yyyyMMdd), bene_death_dt,
  bene_sex_ident_cd, bene_race_cd, sp_state_code, bene_county_cd,
  bene_hi_cvrage_tot_mons, bene_smi_cvrage_tot_mons,
  bene_hmo_cvrage_tot_mons, plan_cvrg_mos_num
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_cms_spark.functions import scalars as S
from etl_cms_spark.operators.dedup import first_write_wins


def latest_year_rows(bene: DataFrame) -> DataFrame:
    """G3+G4: duplicate year rows keep the first seen (reference
    beneficiary.py:121-124), then the latest year wins per person
    (LatestYearData, beneficiary.py:126-132)."""
    first = first_write_wins(bene, ["desynpuf_id", "year"], "row_order")
    last = F.max_by(
        F.struct(*[c for c in first.columns if c != "desynpuf_id"]), F.col("year")
    )
    agg = first.groupBy("desynpuf_id").agg(last.alias("_r"))
    keep = [c for c in first.columns if c != "desynpuf_id"]
    return agg.select("desynpuf_id", *[F.col(f"_r.{c}").alias(c) for c in keep])


def build_person(bene: DataFrame) -> DataFrame:
    """person table (reference write_person_record, :595-643):
    demographics from the latest year row, replay-stable person_id."""
    latest = latest_year_rows(bene)
    birth = S.yyyymmdd_to_date(F.col("bene_birth_dt"))
    return latest.select(
        F.xxhash64("desynpuf_id").alias("person_id"),
        F.col("desynpuf_id").alias("person_source_value"),
        S.gender_concept(F.col("bene_sex_ident_cd")).alias("gender_concept_id"),
        S.race_concept(F.col("bene_race_cd")).alias("race_concept_id"),
        S.ethnicity_concept(F.col("bene_race_cd")).alias("ethnicity_concept_id"),
        F.year(birth).alias("year_of_birth"),
        F.month(birth).alias("month_of_birth"),
        F.dayofmonth(birth).alias("day_of_birth"),
        S.location_key(F.col("sp_state_code"), F.col("bene_county_cd")).alias(
            "location_source_value"
        ),
    )


def build_location(bene: DataFrame) -> DataFrame:
    """location dimension, first-write-wins on the state-county key
    (reference get_location_id / write_location_record :258-284,
    813-839) with hash identity instead of the persisted counter."""
    locs = bene.select(
        S.location_key(F.col("sp_state_code"), F.col("bene_county_cd")).alias(
            "location_source_value"
        ),
        S.ssa_state(F.col("sp_state_code")).alias("state"),
        F.lpad(F.col("bene_county_cd").cast("string"), 3, "0").alias("county"),
    ).dropDuplicates(["location_source_value"])
    return locs.withColumn("location_id", F.xxhash64("location_source_value"))


def build_observation_period(bene: DataFrame) -> DataFrame:
    """observation_period: per person, [min coverage start, max
    coverage end] derived from per-year coverage months (reference
    beneficiary.py:146-163 uses calendar month math; last_day is the
    Spark equivalent).  A year row with max(coverage months)==m covers
    January..month m of that year."""
    months = S.max_coverage_months(
        F.col("bene_hi_cvrage_tot_mons"),
        F.col("bene_smi_cvrage_tot_mons"),
        F.col("bene_hmo_cvrage_tot_mons"),
        F.col("plan_cvrg_mos_num"),
    )
    bene = first_write_wins(bene, ["desynpuf_id", "year"], "row_order")
    per_year = bene.where(months > 0).select(
        "desynpuf_id",
        F.make_date(F.col("year"), F.lit(1), F.lit(1)).alias("start"),
        S.month_end(F.make_date(F.col("year"), months.cast("int"), F.lit(1))).alias("end"),
    )
    return per_year.groupBy(
        F.xxhash64("desynpuf_id").alias("person_id"),
    ).agg(
        F.min("start").alias("observation_period_start_date"),
        F.max("end").alias("observation_period_end_date"),
    )


def build_death(bene: DataFrame) -> DataFrame:
    """death table: persons with a death date (latest year row wins —
    reference :860-880 region)."""
    latest = latest_year_rows(bene)
    return latest.where(
        F.col("bene_death_dt").isNotNull() & (F.col("bene_death_dt") != "")
    ).select(
        F.xxhash64("desynpuf_id").alias("person_id"),
        S.yyyymmdd_to_date(F.col("bene_death_dt")).alias("death_date"),
    )


def build_payer_plan_period(bene: DataFrame) -> DataFrame:
    """payer_plan_period, contiguous-coverage form: per person × year
    × plan (4 plan columns unpivoted via stack — G7, reference
    beneficiary.py:134-142), coverage months m → period [Jan 1, end of
    month m]; adjacent years merge into one period per plan via
    gaps-and-islands.  Duplicate year rows are first-write-wins
    deduped (G4, beneficiary.py:121-124) before coverage derivation.

    NOT identical to the reference's hand-enumerated year combos
    (:720-797) — that literal form is
    ``build_payer_plan_period_faithful`` below; the two agree on full
    runs and trailing partial years and differ on leading partials
    (the spec counts those backward from Dec 31), mid-run partials
    (the spec splits records), and standalone partial ends (spec:
    Jan 1 + m months) — all pinned in tests/test_properties.py."""
    bene = first_write_wins(bene, ["desynpuf_id", "year"], "row_order")
    unpivoted = bene.selectExpr(
        "desynpuf_id",
        "year",
        "stack(4, 'MEDICARE_HI', bene_hi_cvrage_tot_mons, "
        "'MEDICARE_SMI', bene_smi_cvrage_tot_mons, "
        "'MEDICARE_HMO', bene_hmo_cvrage_tot_mons, "
        "'PART_D', plan_cvrg_mos_num) as (plan_source_value, months)",
    ).where(F.col("months") > 0)
    periods = unpivoted.select(
        "desynpuf_id",
        "plan_source_value",
        F.make_date(F.col("year"), F.lit(1), F.lit(1)).alias("start"),
        S.month_end(F.make_date(F.col("year"), F.col("months").cast("int"), F.lit(1))).alias("end"),
        F.col("months").alias("months"),
    )
    from etl_cms_spark.operators.eras import build_eras

    eras = build_eras(
        periods, ["desynpuf_id", "plan_source_value"], "start", "end", gap_days=1
    )
    return eras.select(
        F.xxhash64("desynpuf_id").alias("person_id"),
        "plan_source_value",
        F.col("era_start").alias("payer_plan_period_start_date"),
        F.col("era_end").alias("payer_plan_period_end_date"),
        # replay-stable surrogate id (the reference mints these from
        # the global counter; cost tables join back through it).
        F.xxhash64(
            "desynpuf_id", "plan_source_value", F.col("era_start").cast("string")
        ).alias("payer_plan_period_id"),
    )


def build_payer_plan_period_faithful(bene: DataFrame) -> DataFrame:
    """The reference's LITERAL year-combo enumeration
    (get_payer_plan_period_date_list, CMS_SynPuf_ETL_CDM_v5.py:720-797;
    spec at python_etl/README.md §j) as one vectorized plan: pivot the
    three years' coverage months per (person, plan), emit each branch's
    period segments via conditional array concat, explode.

    Semantics (exhaustively tested vs a plain-Python transcription of
    the spec in tests/test_properties.py):
    * a full-12 run is one merged period;
    * a partial year FOLLOWING a full run extends it
      (end = Dec-31-of-prev-year + m months, day-clamped);
    * a partial year PRECEDING a full run counts BACKWARD from Dec 31
      (start = Dec 31 - m months) and merges into the run;
    * any other partial year is its own [Jan 1, Jan 1 + m months]
      record — NOT merged with an adjacent year.
    The windowed form (build_payer_plan_period) differs by design: it
    counts every partial year forward from Jan 1 and merges whenever
    periods are date-adjacent; tests/test_properties.py pins exactly
    where the two agree and differ.
    """
    bene = first_write_wins(bene, ["desynpuf_id", "year"], "row_order")
    unpivoted = bene.selectExpr(
        "desynpuf_id",
        "year",
        "stack(4, 'MEDICARE_HI', bene_hi_cvrage_tot_mons, "
        "'MEDICARE_SMI', bene_smi_cvrage_tot_mons, "
        "'MEDICARE_HMO', bene_hmo_cvrage_tot_mons, "
        "'PART_D', plan_cvrg_mos_num) as (plan_source_value, months)",
    )
    ym = lambda y: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("year") == y, F.col("months").cast("int"))), F.lit(0)
    )
    per_plan = unpivoted.groupBy("desynpuf_id", "plan_source_value").agg(
        ym(2008).alias("m8"), ym(2009).alias("m9"), ym(2010).alias("m10")
    )
    m8, m9, m10 = F.col("m8"), F.col("m9"), F.col("m10")
    f8, f9, f10 = m8 == 12, m9 == 12, m10 == 12
    d = lambda s: F.lit(s).cast("date")  # noqa: E731
    seg_t = "array<struct<s:date,e:date>>"

    def seg(cond, s, e):
        return F.when(
            cond, F.array(F.struct(s.alias("s"), e.alias("e")))
        ).otherwise(F.array().cast(seg_t))

    # leading-partial 2008 start: backward from Dec 31 (0 months → the
    # run starts at 2009-01-01), reference :766-778.
    start8_back = F.when(m8 == 0, d("2009-01-01")).otherwise(
        F.add_months(d("2008-12-31"), -m8)
    )
    segments = F.concat(
        seg(f8 & f9 & f10, d("2008-01-01"), d("2010-12-31")),
        seg(f8 & f9 & ~f10, d("2008-01-01"), F.add_months(d("2009-12-31"), m10)),
        seg(f8 & ~f9, d("2008-01-01"), d("2008-12-31")),
        seg(f8 & ~f9 & (m9 > 0), d("2009-01-01"), F.add_months(d("2009-01-01"), m9)),
        seg(f8 & ~f9 & f10, d("2010-01-01"), d("2010-12-31")),
        seg(f8 & ~f9 & ~f10 & (m10 > 0), d("2010-01-01"), F.add_months(d("2010-01-01"), m10)),
        seg(~f8 & f9 & f10, start8_back, d("2010-12-31")),
        seg(~f8 & f9 & ~f10, start8_back, F.add_months(d("2009-12-31"), m10)),
        seg(~f8 & ~f9 & (m8 > 0), d("2008-01-01"), F.add_months(d("2008-01-01"), m8)),
        seg(~f8 & ~f9 & (m9 > 0), d("2009-01-01"), F.add_months(d("2009-01-01"), m9)),
        seg(~f8 & ~f9 & f10, d("2010-01-01"), d("2010-12-31")),
        seg(~f8 & ~f9 & ~f10 & (m10 > 0), d("2010-01-01"), F.add_months(d("2010-01-01"), m10)),
    )
    return per_plan.select(
        F.xxhash64("desynpuf_id").alias("person_id"),
        "plan_source_value",
        F.explode(segments).alias("_p"),
    ).select(
        "person_id",
        "plan_source_value",
        F.col("_p.s").alias("payer_plan_period_start_date"),
        F.col("_p.e").alias("payer_plan_period_end_date"),
    )


def build_drug_eras(
    drug_exposure: DataFrame,
    concept_ancestor: DataFrame,
    concept: DataFrame,
    gap_days: int = 30,
) -> DataFrame:
    """drug_era — the reference's hardest relational workload
    (SQL/create_CDMv5_drug_era_non_stockpile.sql, ≈48 h in PostgreSQL):

    1. ingredient rollup (J6): drug → RxNorm ingredient via the
       concept_ancestor snowflake (sql:38-43) — two broadcast joins;
    2. end-date defaulting (F12, sql:28-36);
    3. gaps-and-islands per (person, ingredient) — the reference runs
       the 2-window stack twice (sub-exposures :46-99, then eras over
       sub-exposures :112-160); with the one-pass form the first
       collapse already merges everything the second would, so one
       pass suffices (property: era sets identical — the second level
       only mattered because the faithful SQL pads ends by 30d twice).
    """
    from etl_cms_spark.operators.eras import build_eras

    ingredients = concept.where(
        (F.col("vocabulary_id") == "RxNorm")
        & (F.col("concept_class_id") == "Ingredient")
    ).select(F.col("concept_id").alias("ingredient_concept_id"))
    rollup = (
        drug_exposure.where(F.col("drug_concept_id") != 0)
        .where(F.coalesce(F.col("days_supply"), F.lit(0)) >= 0)
        .join(
            F.broadcast(concept_ancestor),
            F.col("drug_concept_id") == F.col("descendant_concept_id"),
        )
        .join(
            F.broadcast(ingredients),
            F.col("ancestor_concept_id") == F.col("ingredient_concept_id"),
        )
    )
    normalized = rollup.select(
        "person_id",
        "ingredient_concept_id",
        F.col("drug_exposure_start_date").alias("start"),
        S.default_end_date(
            F.col("drug_exposure_end_date"),
            F.col("drug_exposure_start_date"),
            F.col("days_supply"),
        ).alias("end"),
    )
    eras = build_eras(
        normalized, ["person_id", "ingredient_concept_id"], "start", "end", gap_days
    )
    return eras.select(
        "person_id",
        F.col("ingredient_concept_id").alias("drug_concept_id"),
        F.col("era_start").alias("drug_era_start_date"),
        F.col("era_end").alias("drug_era_end_date"),
        F.col("event_count").alias("drug_exposure_count"),
    )


def drug_era_collapse_two_level(normalized: DataFrame, gap_days: int = 30) -> DataFrame:
    """The reference's LITERAL two-level era stack over normalized
    (person_id, ingredient_concept_id, start, end) exposures:

    1. sub-exposures — collapse OVERLAPPING exposures, gap 0
       (cteSubExposureEndDates..cteSubExposures,
       create_CDMv5_drug_era_non_stockpile.sql:46-99);
    2. eras — collapse sub-exposures with the 30-day persistence
       window, carrying summed exposure counts
       (cteEndDates..final INSERT, sql:101-160).

    Kept as the parity witness: tests/test_properties.py proves this
    two-level stack ≡ the one-pass ``build_eras(gap_days)`` on random
    interval sets (the claim ``build_drug_eras`` relies on: a gap-0
    pre-merge cannot split or join anything the 30-day merge wouldn't,
    and counts are additive across levels)."""
    from etl_cms_spark.operators.eras import build_eras_faithful

    keys = ["person_id", "ingredient_concept_id"]
    sub = build_eras_faithful(normalized, keys, "start", "end", gap_days=0)
    return build_eras_faithful(
        sub, keys, "era_start", "era_end", gap_days=gap_days, weight_col="event_count"
    )
