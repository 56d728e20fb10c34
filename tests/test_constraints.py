"""Integrity gates — the engine-side analogue of the reference's
PostgreSQL PK/FK constraint validation (SQL/create_CDMv5_constraints.sql,
545 lines; python_etl/README.md:224-227 treats a constrained load as
an integrity test).  Runs over the DE_0 golden pipeline outputs:

* primary keys unique (person, location, visit, care_site, provider);
* foreign keys resolve (event → visit, event → person, person →
  location, provider → care_site);
* NOT-NULL contracts on required CDM columns.
"""

import pytest
from pyspark.sql import functions as F

from tests.test_reference_golden import de0  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def cdm(spark, de0):  # noqa: F811
    from etl_cms_spark.plans import cdm as cdm_mod
    from etl_cms_spark.plans import claims

    return {
        "person": cdm_mod.build_person(de0["bene"]).localCheckpoint(),
        "location": cdm_mod.build_location(de0["bene"]).localCheckpoint(),
        "visit": claims.build_visit_occurrence(de0["mapped"]).localCheckpoint(),
        "condition": claims.build_condition_occurrence(de0["mapped"]).localCheckpoint(),
        "procedure": claims.build_procedure_occurrence(de0["mapped"]).localCheckpoint(),
        "care_site": claims.build_care_site(
            de0["inpat"], de0["outpat"], de0["carrier"]
        ).localCheckpoint(),
        "provider": claims.build_provider(
            de0["inpat"], de0["outpat"], de0["carrier"]
        ).localCheckpoint(),
    }


def _assert_unique(df, col):
    dup = df.groupBy(col).count().where(F.col("count") > 1).count()
    assert dup == 0, f"duplicate {col}"


def test_primary_keys_unique(spark, cdm):
    _assert_unique(cdm["person"], "person_id")
    _assert_unique(cdm["location"], "location_id")
    _assert_unique(cdm["visit"], "visit_occurrence_id")
    _assert_unique(cdm["care_site"], "care_site_id")
    _assert_unique(cdm["provider"], "provider_id")


def _assert_fk(child, col, parent, pcol):
    orphans = (
        child.where(F.col(col).isNotNull())
        .join(parent.select(F.col(pcol).alias(col)), col, "left_anti")
        .count()
    )
    assert orphans == 0, f"orphan {col}"


def test_foreign_keys_resolve(spark, cdm):
    _assert_fk(cdm["condition"], "visit_occurrence_id", cdm["visit"], "visit_occurrence_id")
    _assert_fk(cdm["procedure"], "visit_occurrence_id", cdm["visit"], "visit_occurrence_id")
    _assert_fk(
        cdm["condition"], "person_source_value", cdm["person"], "person_source_value"
    )
    _assert_fk(
        cdm["visit"], "person_source_value", cdm["person"], "person_source_value"
    )
    _assert_fk(
        cdm["person"], "location_source_value", cdm["location"], "location_source_value"
    )
    _assert_fk(
        cdm["provider"], "care_site_source_value", cdm["care_site"], "care_site_source_value"
    )


def test_not_null_contracts(spark, cdm):
    for tbl, cols in {
        "person": ["person_id", "gender_concept_id", "year_of_birth"],
        "visit": ["visit_occurrence_id", "visit_concept_id", "visit_start_date", "visit_end_date"],
        "condition": ["condition_concept_id", "condition_start_date", "condition_type_concept_id"],
        "procedure": ["procedure_concept_id", "procedure_date", "procedure_type_concept_id"],
    }.items():
        df = cdm[tbl]
        for c in cols:
            n = df.where(F.col(c).isNull()).count()
            assert n == 0, f"{tbl}.{c} has {n} NULLs"
