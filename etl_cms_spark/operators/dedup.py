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


def latest_by_lsn_broadcast(
    df: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
) -> DataFrame:
    """Broadcast-semi form: the payload side NEVER shuffles in the
    dedup stage.  max(lsn) per key is a narrow hash aggregation
    ((key, lsn) longs only, map-side combined); the winner set is
    broadcast and the payload rows semi-join against it scan-local.

    This removes the one per-epoch payload Exchange that the plain
    (non-bucketed) tail pays — the isolated scaling penalty measured
    in BENCH/BASELINE.md's decomposition table — at the price of a
    driver/executor broadcast of one (key, max-lsn) row per distinct
    key.  Appropriate whenever the epoch's DISTINCT KEY count is
    broadcastable (steady-state CDC micro-batches; ~10-60 bytes/key,
    so low tens of millions of keys at most); for corpus-sized
    backfills use ``latest_by_lsn_join`` (both sides shuffle narrow)
    or the window form.  Same caveat as the join form: exact
    duplicate (key, lsn) deliveries both survive (byte-identical by
    the at-least-once contract; any downstream per-key reducer
    resolves them deterministically).
    """
    mx = df.groupBy(*key_cols).agg(F.max(lsn_col).alias(lsn_col))
    return df.join(F.broadcast(mx), [*key_cols, lsn_col], "leftsemi")


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


def fold_partial_updates(
    df: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str | None = None,
    changed_cols_col: str | None = None,
    value_cols: Sequence[str] | None = None,
    reset_col: str | None = None,
    del_lsn_col: str | None = None,
) -> DataFrame:
    """Fold PARTIAL-IMAGE change events into one full(est)-image row
    per key — the binlog ``row_image=MINIMAL`` / Debezium
    partial-column regime, where an update carries only the columns
    that changed.  The reference's row builders always see full
    source rows (CMS_SynPuf_ETL_CDM_v5.py builders); real WAL tails
    frequently do not, so the engine folds them Spark-side instead of
    forcing the producer to re-hydrate.

    Semantics, per key:

    * each VALUE column independently resolves to its value on the
      highest-LSN event where that column is PRESENT;
    * presence is ``changed_cols_col`` (an ``array<string>`` of the
      columns the event actually set — supports explicitly setting a
      column to NULL) when given, else ``IS NOT NULL`` (the common
      sparse-row encoding, matching DuckDB ``arg_max``'s skip-NULL);
    * a DELETE (``op_col == 'D'``) RESETS state: only events with a
      strictly greater LSN than the key's last delete contribute, so
      a re-created key is built solely from its post-delete events;
    * output ``lsn_col`` is the key's max LSN over ALL events and
      ``op_col`` (when given) is ``'D'`` iff no update survives the
      last delete — i.e. the folded batch is directly consumable by
      ``LakeTable.merge_epoch`` / ``merge_epoch_partial``;
    * ``reset_col`` (when given, requires ``op_col``) adds a boolean
      marking keys that were DELETED WITHIN this batch and then
      re-created — ``merge_epoch_partial`` must not hydrate such a
      row against the key's pre-batch table state (the delete already
      invalidated it), so pass the same column name there;
    * ``del_lsn_col`` (when given, requires ``op_col``) adds the
      key's max delete LSN (NULL if the batch holds no delete) — the
      columnar-MoR append (``LakeTable.append_partial_epoch``) turns
      it into an explicit tombstone delta row so read-time fold
      resolution reproduces the reset under ANY epoch order.

    Plan shape: when ``op_col`` is given, one whole-partition window
    (max delete-LSN per key) followed by the hash aggregation on the
    SAME keys — Catalyst reuses the window's hashpartitioning, so the
    whole fold is ONE shuffle of the narrow event stream; without
    deletes it is a single hash aggregation (map-side combined).  No
    UDFs, no sort: ``max_by`` with a NULL-gated ordering expression
    skips absent events exactly like a FILTER clause.
    """
    if (reset_col or del_lsn_col) and not op_col:
        raise ValueError(
            "reset_col/del_lsn_col require op_col — without delete "
            "events there is nothing to mark, and silently omitting "
            "the column would skip the caller's hydration reset guard"
        )
    sys_cols = {lsn_col} | ({op_col} if op_col else set()) | (
        {changed_cols_col} if changed_cols_col else set()
    )
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in key_cols and c not in sys_cols]

    def present(c: str):
        if changed_cols_col:
            return F.array_contains(F.col(changed_cols_col), F.lit(c))
        return F.col(c).isNotNull()

    if op_col:
        w = Window.partitionBy(*[F.col(k) for k in key_cols])
        df = df.withColumn(
            "_del_lsn",
            F.max(F.when(F.col(op_col) == "D", F.col(lsn_col))).over(w),
        )
        upd = (F.col(op_col) != "D") & (
            F.col("_del_lsn").isNull() | (F.col(lsn_col) > F.col("_del_lsn"))
        )
    else:
        upd = F.lit(True)

    aggs = [
        F.max_by(F.col(c), F.when(present(c) & upd, F.col(lsn_col))).alias(c)
        for c in value_cols
    ]
    aggs.append(F.max(F.col(lsn_col)).alias(lsn_col))
    if op_col:
        aggs.append(F.max(F.when(upd, F.col(lsn_col))).alias("_last_upd"))
        if reset_col:
            aggs.append(F.max(F.col("_del_lsn")).isNotNull().alias(reset_col))
        if del_lsn_col:
            aggs.append(F.max(F.col("_del_lsn")).alias(del_lsn_col))
    out = df.groupBy(*key_cols).agg(*aggs)
    if op_col:
        out = out.withColumn(
            op_col, F.when(F.col("_last_upd").isNull(), F.lit("D")).otherwise(F.lit("U"))
        ).drop("_last_upd")
    return out


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
        # NULL-safe key encoding: concat_ws silently DROPS null
        # elements, which would collide ('a', NULL, 'b') with
        # ('a', 'b', NULL) — exactly the silent merge the wide id
        # exists to prevent.  Coalesce each column to a sentinel that
        # cannot appear in a cast(string) value (\x00 prefix) before
        # joining on \x1f.
        key_repr = F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
                for c in key_cols
            ],
        )
        id_expr = F.substring(F.sha2(key_repr, 256), 1, 32)
    else:
        id_expr = F.xxhash64(*[F.col(c) for c in key_cols])
    return (
        df.select(*key_cols)
        .dropDuplicates(list(key_cols))
        .withColumn(id_col, id_expr)
    )


# target keys per range partition for dense_stable_id's auto-sizing:
# narrow key rows at ~100 B/key put a 4M-key partition at ~400 MB of
# shuffle input — comfortably inside executor memory, large enough
# that 10^10 keys get ~2,500 partitions instead of the stock 200.
_DENSE_ID_KEYS_PER_PART = 4_000_000
# Hard cap on the derived range-partition count: 65536 × 4M ≈ 2.6×10^11
# keys — comfortably past the 10^10 target — while bounding the damage
# of a wild over-estimate (task-scheduling overhead, not a dead driver).
_DENSE_ID_MAX_PARTS = 65_536
# Catalyst's stat-less sentinel: plans with no statistics report
# sizeInBytes = defaultSizeInBytes (Long.MaxValue), and join estimates
# MULTIPLY child sizes — either way the number is astronomically past
# any real input, so treat anything >= 2^62 bytes as "unknown".
_STATLESS_SIZE_SENTINEL = 1 << 62


def _dense_id_partitions(est_keys: int, floor: int) -> int:
    """Range-partition count for ``dense_stable_id``: ~4M keys per
    partition, floored at the session shuffle parallelism and capped
    at ``_DENSE_ID_MAX_PARTS`` (an over-estimate must cost tasks, not
    a repartitionByRange with billions of partitions)."""
    return min(_DENSE_ID_MAX_PARTS, max(floor, -(-est_keys // _DENSE_ID_KEYS_PER_PART)))


def _estimated_rows(df: DataFrame) -> int:
    """Driver-side row estimate from Catalyst plan statistics — ZERO
    Spark jobs.  Uses the optimizer's rowCount when the plan carries
    one (CBO / cached relations); otherwise sizeInBytes over a
    conservative 32-byte row width, which over-estimates for wide rows
    — the safe direction, since the estimate only SIZES partitions
    (more partitions than needed is mild overhead; 5×10^7 keys per
    partition is an OOM)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        sz = int(str(stats.sizeInBytes()))
        if sz >= _STATLESS_SIZE_SENTINEL:
            # no real statistics (defaultSizeInBytes leaf, or a join
            # that multiplied them) — an exact count job beats sizing
            # partitions off a garbage number.
            return df.count()
        return max(1, sz // 32)
    except Exception:  # py4j surface drift: fall back to one count job
        return df.count()


def dense_stable_id(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str = "surrogate_id",
    num_partitions: int | None = None,
    est_keys: int | None = None,
) -> DataFrame:
    """Dense 1..N ids over the key order — the reference's persisted
    surrogate-id counters (utility_classes.py:5-100) re-expressed so a
    replay on any cluster mints the same ids with zero coordination.

    Two-pass partition-offset scheme (the zipWithIndex shape, kept in
    the DataFrame/Arrow world):

    1. distinct keys → ``repartitionByRange`` on the key (each range
       partition holds a contiguous, disjoint slice of the global key
       order) → ``sortWithinPartitions`` → pin with localCheckpoint so
       pass 2 sees the identical layout;
    2. count rows per partition (one tiny job, ≤ num_partitions rows
       to the driver), prefix-sum the counts into per-partition start
       offsets, then assign ``offset + local position`` inside an
       Arrow ``mapInPandas`` — no window, no single-partition
       collapse, each partition numbered independently.

    Output is byte-identical to ``row_number() OVER (ORDER BY key)``
    (asserted in tests) but the old form moved ALL keys to ONE
    partition (WindowExec "No Partition Defined" — a driver-killer at
    10^10 keys); this form's widest machine state is one range
    partition.

    ``num_partitions`` defaults to a size-derived count: the caller's
    ``est_keys`` if given, else a Catalyst plan-statistics estimate
    (ZERO extra jobs — the round-4 ADVICE replaced an unconditional
    full ``count()`` over the possibly-expensive input lineage), and
    the range partitioning targets ~``_DENSE_ID_KEYS_PER_PART`` keys
    per partition (floored at spark.sql.shuffle.partitions so small
    inputs behave as before).  A fixed shuffle.partitions default
    under-partitions catastrophically at 10^10 keys (5×10^7 keys per
    partition at the stock 200) — round-3 verdict item.  The minted
    ids are partition-count-independent (byte-identity at two counts
    is pinned in tests), so the estimate only sizes memory, never
    changes results — callers with duplicate-heavy inputs should pass
    ``est_keys`` (the row-based estimate over-partitions there).
    """
    import pandas as pd

    spark = df.sparkSession
    floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if num_partitions is not None:
        n_part = num_partitions
    else:
        if est_keys is None:
            est_keys = _estimated_rows(df)  # upper bound on distinct keys
        n_part = _dense_id_partitions(est_keys, floor)
    key_list = list(key_cols)
    keys = (
        df.select(*key_list)
        .dropDuplicates(key_list)
        .repartitionByRange(n_part, *[F.col(c) for c in key_list])
        .sortWithinPartitions(*[F.col(c) for c in key_list])
        .withColumn("_pid", F.spark_partition_id())
    )
    # pin partition layout + order so the count pass and the assign
    # pass see the same data (range boundaries come from a sample).
    keys = keys.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["n"]
        for r in keys.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = keys.drop("_pid").schema.add(id_col, "long", False)

    def assign(batches):
        base, seen = None, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                # Direct index: if the checkpointed partition layout
                # ever diverged between the count pass and this pass,
                # a missing pid must FAIL (KeyError) rather than fall
                # back to offset 0 and mint duplicate surrogate ids
                # (round-3 ADVICE).
                base = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out[id_col] = pd.RangeIndex(
                base + seen + 1, base + seen + len(pdf) + 1
            ).astype("int64")
            seen += len(pdf)
            yield out

    return keys.mapInPandas(assign, schema=out_schema)
