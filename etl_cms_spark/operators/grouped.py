"""Grouped whole-entity transform (SURVEY.md §2.G1, K).

The reference's main loop is one giant per-person UDTF: accumulate a
beneficiary's rows from 5 sorted files, then emit rows for 19 tables
(process_beneficiary, reference CMS_SynPuf_ETL_CDM_v5.py:1790-1805,
group-break detection at :2061-2087).  The Spark-native shape is
``groupBy(key).applyInPandas`` — each group arrives as one Arrow
batch, the transform is vectorized pandas, and the output schema is
declared up front.

``grouped_transform`` is the generic harness; ``person_rollup`` is a
worked example reproducing the reference's G2/G3 semantics (latest
year row + observation-period min/max) in one grouped pass — but note
that when the per-group logic IS expressible as aggregations, the
pure-SQL form (``person_rollup_sql``) is strictly better (no Python
boundary); applyInPandas earns its cost only for genuinely imperative
per-entity logic like the reference's 27-branch payer-plan derivation.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_transform(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema,
) -> DataFrame:
    """One Arrow round-trip per group; fn: group pdf -> output pdf."""
    return df.groupBy(*key_cols).applyInPandas(fn, output_schema)


PERSON_ROLLUP_SCHEMA = (
    "user_id bigint, n_events bigint, first_ts timestamp, last_ts timestamp, "
    "latest_type string, latest_value double, total_value double"
)


def person_rollup(df: DataFrame) -> DataFrame:
    """Per-user rollup via applyInPandas (the process_beneficiary
    analogue over the events fixture)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        last = pdf.iloc[-1]
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "first_ts": [pdf["ts"].min()],
                "last_ts": [pdf["ts"].max()],
                "latest_type": [last["event_type"]],
                "latest_value": [float(last["value"])],
                "total_value": [float(pdf["value"].sum())],
            }
        )

    return df.groupBy("user_id").applyInPandas(fn, PERSON_ROLLUP_SCHEMA)


def person_rollup_sql(df: DataFrame) -> DataFrame:
    """Same semantics as pure aggregation — one hash agg, no Python.
    The pair is property-tested equal (tests/test_grouped.py)."""
    latest = F.max_by(
        F.struct("event_type", "value"), F.struct("ts", "event_id")
    )
    return df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        latest["event_type"].alias("latest_type"),
        latest["value"].cast("double").alias("latest_value"),
        F.sum("value").cast("double").alias("total_value"),
    )
