"""Hot-key skew handling (SURVEY.md §4: "salting for hot repo keys").

AQE's skew-join splitting covers joins; ``groupBy`` dedup over a
Zipf-skewed repo key still funnels a hot key into one reducer.  The
two-phase salted form below bounds any single task's input at
``rows(key)/n_salts`` for phase 1, then reduces only the n_salts
partial winners in phase 2 — the classic partial-aggregation trick
applied to ``max_by``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_latest_by_lsn(
    df: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase max-LSN dedup: phase 1 aggregates within
    (key, salt) buckets, phase 2 reduces the <= n_salts survivors
    per key.  Result is identical to ``dedup.latest_by_lsn``.

    Note: Spark's hash aggregation already does map-side partial
    aggregation, which handles *moderate* skew; explicit salting is
    for the pathological case where even one key's partial states
    overwhelm a reducer (10^10-event changelogs with a megarepo).
    """
    payload = [c for c in df.columns if c not in key_cols]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(n_salts)))
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        F.max_by(F.struct(*payload), F.col(lsn_col)).alias("_w"),
        F.max(lsn_col).alias("_max_lsn"),
    )
    phase2 = phase1.groupBy(*key_cols).agg(
        F.max_by(F.col("_w"), F.col("_max_lsn")).alias("_w")
    )
    return phase2.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
