"""SynPUF claim-file readers (reference parity inputs).

Header-driven CSV scans for the five DE_SynPUF file types (the
reference addresses the same files positionally through layout classes,
python_etl/constants.py:139-509 and SynPufFiles.py).  All columns are
read as strings with '' → NULL — the reference's de-facto NULL — and
date/number parsing happens in the downstream plans, so a malformed
cell degrades to a NULL, not a crashed scan.

Year extraction for beneficiary summaries comes from the file name
(DE1_0_<year>_Beneficiary_...), mirroring the reference's FILE_YEAR
token (constants.py BENEFICIARY_SUMMARY_RECORD.FILE_YEAR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_all_strings(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    paths = paths if isinstance(paths, list) else [paths]
    return (
        spark.read.option("header", "true")
        .option("nullValue", "")
        .option("inferSchema", "false")
        .csv(paths)
    )


def read_beneficiary_summaries(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One row per (beneficiary, file-year); `year` parsed from the
    file name, `row_order` = replay-stable order key for
    first-write-wins dedup among duplicate (beneficiary, year) rows
    (the reference keeps the first duplicate row per year,
    beneficiary.py:121-124 AddYearData).

    The reference's "first in FILE order" is a property of a serial
    scan that no parallel reader can reproduce stably —
    monotonically_increasing_id() changes with the partition layout,
    so two replays could pick different winners (breaking the
    engine's replay-convergence invariant).  The order key is instead
    derived from the DATA: a content hash over every payload column.
    Any replay, any partitioning, any cluster picks the same winner;
    for the common case (exact duplicate rows) the picked row is
    byte-identical to the reference's, and a content-divergent
    duplicate gets a deterministic canonical pick instead of a
    scan-order-dependent one."""
    df = _read_all_strings(spark, paths).withColumn(
        "year",
        F.regexp_extract(F.input_file_name(), r"DE1_0_(\d{4})_Beneficiary", 1).cast("int"),
    )
    payload = [c for c in df.columns if c != "year"]
    df = df.withColumn("row_order", F.xxhash64(*[F.col(c) for c in payload]))
    return df.select(*[F.col(c).alias(c.lower()) for c in df.columns])


def read_inpatient_claims(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _read_all_strings(spark, paths)


def read_outpatient_claims(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _read_all_strings(spark, paths)


def read_carrier_claims(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Carrier A + B halves share a layout — pass both; the scan is
    the UNION ALL (S4)."""
    return _read_all_strings(spark, paths)


def read_prescription_events(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _read_all_strings(spark, paths)
