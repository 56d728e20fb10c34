"""Era building / gaps-and-islands (SURVEY.md §2.W1-W3, J5, G5).

The reference's hardest relational workload: collapse per-key date
ranges into "eras" when gaps are <= ``gap`` days
(SQL/create_CDMv5_condition_era.sql, ~48 h in PostgreSQL per the
reference README).  Two implementations with identical output:

* ``build_eras_faithful`` — the reference's literal shape: UNION ALL
  of starts and gap-padded ends, two window passes, the
  ``2*start_ordinal - overall_ord = 0`` islands filter, then a
  range join back + MIN aggregation
  (create_CDMv5_condition_era.sql:48-117).
* ``build_eras`` — the idiomatic one-pass form: lag the running max
  end within the key, flag gap-breaks, running-sum the flags into an
  island id, aggregate.  One shuffle (the window partition), no
  self-join — this is the production path; the faithful form exists
  to prove semantic parity (property-tested equal in
  tests/test_eras.py).

Scale notes: both forms shuffle once on the grouping key; the
one-pass form avoids the range join whose build side is O(rows),
making it strictly cheaper at 100 TB.  Window partitions = keys, so
skew follows the key distribution — for pathological keys, pre-split
by (key, coarse time bucket) and merge boundary eras in a second
tiny pass (not needed at current scales).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_eras(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    gap_days: int = 30,
) -> DataFrame:
    """One-pass gaps-and-islands.

    Returns one row per era: key cols, ``era_start``, ``era_end``,
    ``event_count`` — matching the reference's
    condition_era(person_id, concept_id, start, end, count) shape.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(start_col), F.col(end_col))
    # running max of end date seen so far, excluding current row.
    prev_max_end = F.max(F.col(end_col)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_island",
        F.when(
            prev_max_end.isNull()
            | (F.col(start_col) > F.date_add(prev_max_end, gap_days)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_island",
        F.sum("_new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(*keys, F.col("_island"))
        .agg(
            F.min(start_col).alias("era_start"),
            F.max(end_col).alias("era_end"),
            F.count("*").alias("event_count"),
        )
        .drop("_island")
    )


def build_eras_faithful(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    gap_days: int = 30,
    weight_col: str | None = None,
) -> DataFrame:
    """The reference's UNION-ALL + two-window + islands-filter +
    range-join shape (create_CDMv5_condition_era.sql:48-117), kept
    column-for-column recognizable:

    - starts get event_type=-1, ends are padded by ``gap_days`` and
      get event_type=+1 (sql:64-85)
    - start_ordinal = row_number over starts only (W2, sql:62)
    - overall_ord = row_number over the merged stream (sql:71-72)
    - era ends where 2*start_ordinal - overall_ord = 0 (W3, sql:87)
    - each start joins to its MIN qualifying end (J5 + G5, sql:98-117)
    """
    keys = [F.col(c) for c in key_cols]
    starts = df.select(
        *keys,
        F.col(start_col).alias("event_date"),
        F.lit(-1).alias("event_type"),
    )
    ends = df.select(
        *keys,
        F.date_add(F.col(end_col), gap_days).alias("event_date"),
        F.lit(1).alias("event_type"),
    )
    merged = starts.unionByName(ends)
    w_all = Window.partitionBy(*keys).orderBy("event_date", "event_type")
    # start_ordinal: MAX(ordinal among starts) pulled down across rows
    # — the reference computes row_number over starts then a running
    # MAX with ROWS UNBOUNDED PRECEDING (W1, sql:61).
    numbered = merged.withColumn(
        "_start_ord_raw",
        F.when(
            F.col("event_type") == -1,
            F.sum(F.when(F.col("event_type") == -1, 1).otherwise(0)).over(
                w_all.rowsBetween(Window.unboundedPreceding, 0)
            ),
        ),
    ).withColumn(
        "start_ordinal",
        F.max("_start_ord_raw").over(w_all.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("overall_ord", F.row_number().over(w_all))
    era_ends = numbered.where(
        (F.lit(2) * F.col("start_ordinal") - F.col("overall_ord")) == 0
    ).select(
        *keys,
        F.date_sub(F.col("event_date"), gap_days).alias("era_end_date"),
    )
    # J5: each raw event row joins to the earliest era end >= its start.
    # Duplicate (key, start, end) rows are pre-counted so they survive
    # the grouping (the reference carries condition_occurrence_id;
    # a count is the shuffle-cheaper equivalent).
    # ``weight_col`` lets a second-level pass carry first-level event
    # counts (the reference's cteDrugEraEnds sums sub-exposure counts,
    # create_CDMv5_drug_era_non_stockpile.sql:112-160).
    if weight_col is None:
        evt = (
            df.select(*keys, F.col(start_col).alias("_s"), F.col(end_col).alias("_e"))
            .groupBy(*keys, "_s", "_e")
            .agg(F.count("*").alias("_n"))
        )
    else:
        evt = (
            df.select(
                *keys,
                F.col(start_col).alias("_s"),
                F.col(end_col).alias("_e"),
                F.col(weight_col).alias("_w"),
            )
            .groupBy(*keys, "_s", "_e")
            .agg(F.sum("_w").alias("_n"))
        )
    joined = evt.join(era_ends, [*key_cols], "inner").where(
        F.col("era_end_date") >= F.col("_s")
    )
    with_era = joined.groupBy(*keys, "_s", "_e", "_n").agg(
        F.min("era_end_date").alias("_era_end")
    )
    return (
        with_era.groupBy(*keys, F.col("_era_end"))
        .agg(
            F.min("_s").alias("era_start"),
            F.max("_e").alias("era_end"),
            F.sum("_n").alias("event_count"),
        )
        .drop("_era_end")
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Timestamp flavor of gaps-and-islands: split a key's event
    stream into sessions separated by > ``gap`` of silence.  Returns
    session_start, session_end, event_count per session."""
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    flagged = df.withColumn(
        "_new_session",
        F.when(
            prev_ts.isNull()
            | (F.col(ts_col) > prev_ts + F.expr(f"INTERVAL {gap}")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_session",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(*keys, F.col("_session"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("event_count"),
        )
        .drop("_session")
    )
