"""Multi-output demux (SURVEY.md §2.I) — the reference's signature
operator: route each row to one of N destination tables by a derived
domain column (domain_destination_file_list,
reference CMS_SynPuf_ETL_CDM_v5.py:212-229, dispatch chains
:1228-1290/:1377-1439/:1526-1619).

Spark-first shape: derive ``dest`` once, then either
(a) a single partitioned write (one pass over the data), or
(b) per-destination merges off one cached upstream (the CDC path —
    one MERGE per destination table per epoch).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def route(df: DataFrame, rules: dict[str, Column], default: str = "unmapped",
          dest_col: str = "dest") -> DataFrame:
    """Attach a destination column from the first matching rule —
    the declarative analogue of the reference's if/elif dispatch."""
    expr = None
    for dest, cond in rules.items():
        expr = F.when(cond, F.lit(dest)) if expr is None else expr.when(cond, F.lit(dest))
    expr = expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
    return df.withColumn(dest_col, expr)


def write_demux_partitioned(df: DataFrame, out_dir: str, dest_col: str = "dest") -> None:
    """(a) single-pass demux: one job, files physically partitioned by
    destination — each downstream consumer reads only its partition
    (partition pruning makes per-destination reads O(destination))."""
    df.write.mode("overwrite").partitionBy(dest_col).parquet(out_dir)


def merge_demux(
    df: DataFrame,
    dest_col: str,
    merge_fn: Callable[[str, DataFrame], dict],
    destinations: list[str] | None = None,
) -> dict[str, dict]:
    """(b) per-destination merge off one cached upstream.  ``merge_fn``
    receives (destination, slice) — in the CDC pipeline it is a
    LakeTable.merge_epoch bound to that destination's table."""
    cached = df.persist()
    try:
        if destinations is None:
            destinations = [
                r[dest_col] for r in cached.select(dest_col).distinct().collect()
            ]
        return {
            d: merge_fn(d, cached.where(F.col(dest_col) == d))
            for d in sorted(destinations)
        }
    finally:
        cached.unpersist()
