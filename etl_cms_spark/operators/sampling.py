"""Deterministic stratified sampling — per-key caps for training-data
mixing.

A 100 TB corpus pipeline constantly needs "at most k documents per
source / language / dedup-cluster, chosen pseudo-randomly but
REPRODUCIBLY" (data-mixing recipes, eval holdouts, per-domain caps).
``df.sample`` cannot express per-key caps and ``rand()`` breaks
replay-stability, so this orders each key's rows by a deterministic
multiplicative hash of the row id and keeps the first k.

Plan shape: one hash-partitioned window per key (rank within key) —
the same cost as any per-key ranking; no global sort, no collect.
Skewed keys cost O(key size log k-ish) in the per-partition sort, and
the output is at most k rows per key regardless of input skew.

The hash is the portable Knuth multiplicative scheme (NOT xxhash64)
so an external engine replays the exact sample — the catalog entry
``stratified_sample_per_source`` is hash-checked against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_MUL = 2654435761  # Knuth multiplicative constant
SAMPLE_MOD = 2_147_483_647


def sample_rank_hash(id_col: Column, seed: int = 0) -> Column:
    """Deterministic pseudo-random rank key:
    (((id + seed) mod p) * K) mod p.  Portable integer arithmetic —
    any engine reproduces the ordering.  The id is reduced mod p
    BEFORE the multiply so the product stays < 2^63 for any int64 id
    ((p-1) * K ≈ 5.7e18): no silent wraparound in default Spark, no
    overflow error under spark.sql.ansi.enabled, and the value agrees
    with DuckDB at 10^10-row id ranges (round-3 ADVICE fix)."""
    return F.pmod(
        F.pmod(id_col.cast("long") + F.lit(seed), F.lit(SAMPLE_MOD))
        * F.lit(SAMPLE_MUL),
        F.lit(SAMPLE_MOD),
    )


def weighted_sample_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int,
    id_col: str,
    weight_col: str,
    seed: int = 0,
    rank_col: str | None = None,
) -> DataFrame:
    """Deterministic WEIGHTED sample of ``k`` rows per key:
    P(row selected) increases with ``weight_col`` (A-Res reservoir
    scheme, Efraimidis & Spirakis: priority = u^(1/w) with u uniform
    from the row id's hash; keep the k largest priorities per key).

    The training-data use case: sample per-source documents
    proportionally to quality/length instead of uniformly.  Everything
    is derived from (id, seed), so the draw is replay-stable and an
    external engine reproduces the exact sample (priorities are
    rounded to 9 dp before ranking, ties broken by id, so a last-ulp
    pow() difference between engines cannot flip the order).

    Rows with weight <= 0 are never selected.
    """
    keys = [F.col(c) for c in key_cols]
    u = (sample_rank_hash(F.col(id_col), seed) + 1) / F.lit(float(SAMPLE_MOD + 1))
    w = F.col(weight_col).cast("double")
    pri = F.when(w > 0, F.round(F.pow(u, 1.0 / w), 9))
    win = Window.partitionBy(*keys).orderBy(pri.desc_nulls_last(), F.col(id_col))
    out = (
        df.withColumn("_pri", pri)
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= k)
        .where(F.col("_pri").isNotNull())
        .drop("_pri")
    )
    if rank_col is not None:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")


def deterministic_sample_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int,
    id_col: str,
    seed: int = 0,
    rank_col: str | None = None,
) -> DataFrame:
    """At most ``k`` rows per distinct key, chosen by deterministic
    hash order (ties broken by the id itself, so output is unique for
    unique ids).  ``rank_col`` optionally exposes the 1-based sample
    rank.  Changing ``seed`` draws an independent sample; the same
    seed always returns byte-identical rows — replay-stable."""
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        sample_rank_hash(F.col(id_col), seed), F.col(id_col)
    )
    out = df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    if rank_col is not None:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")
