"""As-of (temporal) join — attach, to each left row, the most recent
right row for the same key at or before the left row's time.

The CDC-shaped lookup the reference approximates with driver-side
"current row per entity" dicts (e.g. the latest beneficiary year used
while scanning claims, CMS_SynPuf_ETL_CDM_v5.py beneficiary handling)
and what SQL engines call ASOF JOIN (DuckDB has it natively — which is
exactly what lets this operator be oracle-checked end to end).

Spark has no asof-join physical operator, so this composes one from
primitives the optimizer already handles well — the classic
union-and-window form:

1. tag right rows side=0, left rows side=1, union on (key, time);
2. one window per key ordered by (time, side, right-order): running
   ``last(right_payload, ignorenulls=True)`` — each left row sees the
   latest right row at-or-before it;
3. keep the left side, unpack the carried payload.

Cost at 100 TB: ONE shuffle of (left + right) on the key, then a
per-key sort — the same plan shape as any windowed aggregation,
skew-safe per key group, no range-explosion (a naive
``l.t >= r.t`` theta join is O(|l| x versions-per-key) and blows up
on long histories; this is O((|l|+|r|) log per-key)).  A broadcast
variant is deliberately absent: if the right side fits in a broadcast
you can afford ``F.max_by`` after a plain broadcast range join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str] | None = None,
    tolerance: Column | None = None,
    right_order: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join.

    For each ``left`` row, the matched ``right`` row is the one with
    equal ``on`` keys and the greatest ``right_time`` <= the left
    row's ``left_time`` (inclusive).  Unmatched left rows keep NULL
    payload (left-join semantics).

    ``right_cols``  — right payload columns to carry (default: all
                      non-key, non-time columns), each emitted as
                      ``<name><suffix>``; ``right_time`` is always
                      carried as ``<right_time><suffix>``.
    ``tolerance``   — optional max staleness (an interval/delta
                      Column): matches older than ``left_time -
                      tolerance`` are nulled out, like pandas
                      ``merge_asof(tolerance=...)``.
    ``right_order`` — tie-break column when several right rows share
                      (key, right_time); highest wins.  Required for
                      deterministic output if such ties exist.
    """
    keys = list(on)
    pay = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_time
    ]
    carried = F.struct(
        F.col(right_time).alias("_t"),
        *[F.col(c).alias(c) for c in pay],
    )
    order_tb = (
        F.col(right_order) if right_order is not None else F.lit(0)
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("_evt_t"),
        F.lit(0).alias("_side"),
        order_tb.alias("_tb"),
        carried.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        *keys,
        F.col(left_time).alias("_evt_t"),
        F.lit(1).alias("_side"),
        F.lit(0).alias("_tb"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # side 0 (right) sorts before side 1 (left) at equal time, so an
    # exactly-simultaneous right version matches (inclusive bound);
    # among same-time right rows the highest tie-break sorts last and
    # therefore wins the running last().
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_evt_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l).withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    matched = F.col("_m")
    if tolerance is not None:
        matched = F.when(
            F.col("_m")["_t"] >= F.col("_evt_t") - tolerance, F.col("_m")
        )
    return u.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        matched["_t"].alias(f"{right_time}{suffix}"),
        *[matched[c].alias(f"{c}{suffix}") for c in pay],
    )
