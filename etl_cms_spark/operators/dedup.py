"""Keyed deduplication operators.

Re-expressions of the reference's dedup semantics (SURVEY.md §2.E):

* ``latest_by_lsn``       — E5: per key keep the event with max LSN
  (the CDC analogue of the reference's "last write to a dict key
  wins" state updates).
* ``first_write_wins``    — E2: the reference's write-once dimension
  rows (care_site/provider/location,
  reference CMS_SynPuf_ETL_CDM_v5.py:258-284).
* ``keyed_dedup_stable_id`` — E1: the reference's visit dedup that
  mints one surrogate id per distinct natural key
  (determine_visits, reference CMS_SynPuf_ETL_CDM_v5.py:541-590) —
  but with replay-stable hash identity instead of a mutable counter.

All are single-shuffle hash aggregations / windows; for hot keys use
``operators.skew.salted_latest_by_lsn`` (two-phase).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_lsn(
    df: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
) -> DataFrame:
    """Per key, keep the row with the greatest LSN — one hash
    aggregation (partial + final, map-side combine for free), no
    window sort.  ``max_by`` over a struct keeps the whole row.

    Ties on (key, lsn) — injected duplicates — collapse to one row
    because ``max_by`` compares the lsn only and the payload of a
    duplicate is identical by construction (exactly-once fixture).
    """
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(lsn_col)).alias("_latest")
    )
    return agg.select(*key_cols, *[F.col(f"_latest.{c}").alias(c) for c in payload])


def latest_by_lsn_join(
    df: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
) -> DataFrame:
    """Join-back form: hash-aggregate max(lsn) per key (pure longs →
    HashAggregate with map-side combine), then semi-join the raw rows
    on (key, lsn).

    WHY: ``max_by(struct(payload))`` compiles to SortAggregate (struct
    agg buffers are not hash-aggregable), which sorts every partition;
    this form keeps both sides hash-based.  CAVEAT: exact duplicate
    (key, lsn) rows (at-least-once delivery) both survive — they are
    byte-identical by construction, so any downstream per-key reducer
    (e.g. the lake merge) resolves them deterministically; use
    ``latest_by_lsn`` when strict one-row-per-key output is required.
    """
    mx = df.groupBy(*key_cols).agg(F.max(lsn_col).alias(lsn_col))
    # hint on the build (right) side: hash relation over (key, max lsn)
    # pairs; avoids SMJ's sort of the full payload side.
    return df.join(mx.hint("SHUFFLE_HASH"), [*key_cols, lsn_col], "leftsemi")


def latest_by_lsn_window(
    df: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
) -> DataFrame:
    """Window-function form (row_number desc == 1).  Same result as
    ``latest_by_lsn``; kept because the windowed plan is sometimes
    preferable when the payload is extremely wide (avoids building
    structs in the aggregation buffer)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def first_write_wins(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Per key, keep the first-seen row (min order_col) — the
    reference's written-flag dimension emit (E2)."""
    payload = [c for c in df.columns if c not in key_cols]
    agg = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*payload), F.col(order_col)).alias("_first")
    )
    return agg.select(*key_cols, *[F.col(f"_first.{c}").alias(c) for c in payload])


def keyed_dedup_stable_id(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str = "surrogate_id",
    wide: bool = False,
) -> DataFrame:
    """Distinct natural keys, each with a replay-stable surrogate id.

    The reference mints ids from a mutable counter persisted across
    runs (utility_classes.py:5-100) which forbids parallelism; here
    identity is content-derived (xxhash64 of the key), so any replay
    on any cluster converges to the same ids with zero coordination.

    Collision bound (64-bit birthday): P(any collision) ~= n^2 / 2^65
    — negligible below ~10^8 keys (3e-4 at 1e8) but 2.7% at 1e9 and
    near-certain at 1e10.  For key populations that can exceed ~10^8,
    pass ``wide=True`` to mint a 128-bit id (hex string, first 16
    bytes of sha2-256): P(collision) ~= n^2 / 2^129, ~1e-19 even at
    1e10 keys.  64-bit stays the default because a long id joins and
    sorts cheaper than a 32-char string.
    """
    if wide:
        key_repr = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in key_cols]
        )
        id_expr = F.substring(F.sha2(key_repr, 256), 1, 32)
    else:
        id_expr = F.xxhash64(*[F.col(c) for c in key_cols])
    return (
        df.select(*key_cols)
        .dropDuplicates(list(key_cols))
        .withColumn(id_col, id_expr)
    )


def dense_stable_id(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str = "surrogate_id",
) -> DataFrame:
    """Dense 1..N ids via row_number over the key order — use when a
    downstream contract requires dense ids.  Deterministic given the
    key set; costs a global sort (range partition), so prefer
    ``keyed_dedup_stable_id`` at scale."""
    w = Window.orderBy(*[F.col(c) for c in key_cols])
    return (
        df.select(*key_cols)
        .dropDuplicates(list(key_cols))
        .withColumn(id_col, F.row_number().over(w).cast("long"))
    )
