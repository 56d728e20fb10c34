"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 (plus the training-data pipeline ops) as
(Spark callable, DuckDB oracle) pairs — see etl_cms_spark/queries.py.
``entry`` runs the CDC flagship end-to-end at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_cms_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic source-code changelog → epoch-merged
    exactly-once lake state (the engine's end-to-end path)."""
    return QUERIES["cdc_pipeline_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
