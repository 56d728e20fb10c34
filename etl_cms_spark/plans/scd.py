"""SCD Type-2 dimension history maintained incrementally from a
changelog.

The reference keeps only LATEST state per entity (its OMOP rows are
overwritten per run; e.g. the first-write-wins provider/care_site
dimensions in ``python_etl/CMS_SynPuf_ETL_CDM_v5.py``).  A CDC engine
can do strictly better: every change event opens a new dimension
VERSION, and the full version history — ``valid_from_lsn`` /
``valid_to_lsn`` intervals per key — is queryable (audit, as-of
enrichment, time-travel joins).  This module maintains that history
INCREMENTALLY, O(epoch) work per epoch, never a re-sort of the full
history.

Design — the key observation is that a CLOSED version is immutable:

* ``history`` LakeTable, keyed by (natural key…, ``valid_from_lsn``):
  append-only.  A version row is written exactly once, at the moment
  the NEXT event for its key arrives (which fixes its
  ``valid_to_lsn``).  No row here is ever rewritten, so the merge is
  pure insert traffic and compaction never has conflicting images.
* ``current`` LakeTable, keyed by the natural key alone: the one OPEN
  version per live key (``valid_to_lsn`` is NULL by construction, so
  it isn't stored).  Ordinary max-LSN merge semantics apply — a
  delete event tombstones the key (the open version it closes still
  lands in ``history``).

Per epoch (events must arrive LSN-monotone per key across epochs —
the tail/bootstrap contract the rest of the engine already holds):

1. Within the batch, ``LEAD(lsn) OVER (PARTITION BY key ORDER BY
   lsn)`` closes every event that has a successor IN the same epoch —
   those versions go straight to ``history``.
2. The previous epoch's open versions for touched keys are closed by
   the key's FIRST lsn in this epoch.  This reads the ``current``
   table pruned to the touched keys' buckets (natural-key bucketing
   makes this O(epoch distinct keys), not O(live keys)).
3. The per-key LAST event of the epoch becomes the new open version
   (or a tombstone, for deletes) via the ordinary ``merge_epoch``.

Exactly-once: both tables commit the SAME epoch id; replaying a
committed epoch is a manifest no-op on each, and a crash between the
two commits heals on replay because the history append is recomputed
from the (unchanged) pre-epoch ``current`` snapshot before the
``current`` merge is attempted.  History commits FIRST; see
``apply_epoch``.

Read shapes:

* ``history_df()`` — closed versions UNION the open ones
  (``valid_to_lsn`` NULL, ``is_current`` true).
* ``asof(facts, fact_lsn)`` — enrich a fact stream with the dimension
  version that was valid at each fact's LSN: an interval join
  ``valid_from_lsn <= fact_lsn < valid_to_lsn`` (open versions bound
  only below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_cms_spark.sink.lake import LakeTable


class Scd2History:
    """Incremental SCD2 maintenance over a changelog.

    ``payload_schema`` maps payload column name -> Spark SQL type
    string (the natural key columns and ``valid_from_lsn`` /
    ``valid_to_lsn`` are added automatically).  Batches offered to
    ``apply_epoch`` must carry the key columns, ``lsn`` (long,
    unique per key), ``op`` ('I'/'U'/'D') and the payload columns,
    with at most one event per (key, lsn) — the pipeline's dedup
    contract.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        payload_schema: dict[str, str],
        n_buckets: int = 8,
        merge_mode: str = "cow",
    ):
        self.spark = spark
        self.key_cols = list(key_cols)
        self.payload_cols = [c for c in payload_schema if c not in self.key_cols]
        key_schema = {
            c: t for c, t in payload_schema.items() if c in self.key_cols
        } or {c: "string" for c in self.key_cols}
        pay = {c: payload_schema[c] for c in self.payload_cols}
        self.history = LakeTable(
            spark, f"{root}/history", n_buckets, merge_mode=merge_mode
        )
        if not self.history.exists():
            self.history.create(
                [*self.key_cols, "valid_from_lsn"],
                key_schema
                | {"valid_from_lsn": "long", "valid_to_lsn": "long"}
                | pay,
            )
        self.current = LakeTable(
            spark, f"{root}/current", n_buckets, merge_mode=merge_mode
        )
        if not self.current.exists():
            self.current.create(
                self.key_cols, key_schema | {"valid_from_lsn": "long"} | pay
            )

    # ---------------- epoch fold ----------------

    def apply_epoch(self, batch: DataFrame, epoch: int) -> dict:
        """Fold one change epoch into the version history, exactly
        once.  Events must be LSN-monotone vs every earlier epoch
        (per key); violations raise before anything commits."""
        committed_hist = self.history.committed_epochs()
        committed_cur = self.current.committed_epochs()
        if epoch in committed_hist and epoch in committed_cur:
            return {"epoch": epoch, "skipped_duplicate_epoch": True}

        k = self.key_cols
        ev = batch.select(
            *k, F.col("lsn").cast("long").alias("lsn"), "op", *self.payload_cols
        )
        w = Window.partitionBy(*k).orderBy("lsn")
        # One shuffle on the natural key serves lead(), first-lsn and
        # last-event-per-key below (same partitioning, reused).
        ann = ev.select(
            "*",
            F.lead("lsn").over(w).alias("_next_lsn"),
            F.min("lsn").over(Window.partitionBy(*k)).alias("_first_lsn"),
        ).localCheckpoint(eager=False)

        # (2) close the previous epoch's open versions: read only the
        # buckets the batch touches, then keep only touched keys.
        touched = ann.where(F.col("lsn") == F.col("_first_lsn")).select(
            *k, F.col("lsn").alias("_close_lsn")
        )
        bks = sorted(
            r["b"]
            for r in touched.select(
                self.current.bucket_expr(k).alias("b")
            ).distinct().collect()
        )
        prev_open = (
            self.current.read(bucket_ids=[int(b) for b in bks])
            .join(touched, k, "inner")
            if bks
            else None
        )
        if prev_open is not None:
            stale = prev_open.where(
                F.col("_close_lsn") <= F.col("valid_from_lsn")
            ).limit(1)
            if stale.take(1):
                raise ValueError(
                    "epoch is not LSN-monotone: it carries an event at or "
                    "below an already-open version's valid_from_lsn"
                )
            closed_prev = prev_open.select(
                *k,
                "valid_from_lsn",
                F.col("_close_lsn").alias("valid_to_lsn"),
                *self.payload_cols,
            )

        # (1) versions closed WITHIN the batch (successor in-epoch);
        # delete events never open a version, so they close but do
        # not emit.
        closed_in = ann.where(
            F.col("_next_lsn").isNotNull() & (F.col("op") != "D")
        ).select(
            *k,
            F.col("lsn").alias("valid_from_lsn"),
            F.col("_next_lsn").alias("valid_to_lsn"),
            *self.payload_cols,
        )
        closed = (
            closed_in.unionByName(closed_prev)
            if prev_open is not None
            else closed_in
        )
        hist_batch = closed.select(
            *k,
            "valid_from_lsn",
            "valid_to_lsn",
            *self.payload_cols,
            F.lit("I").alias("op"),
            # closing lsn orders re-writes; each (key, valid_from) is
            # closed exactly once so this is pure insert traffic.
            F.col("valid_to_lsn").alias("lsn"),
        )
        # History FIRST: it is recomputed from the pre-epoch `current`
        # snapshot, so a crash after this commit but before the
        # `current` merge replays into (no-op history, fresh current).
        # The reverse order would recompute the close set against an
        # already-advanced `current` and lose the closed rows.
        rec_h = (
            self.history.merge_epoch(hist_batch, epoch)
            if epoch not in committed_hist
            else {"skipped_duplicate_epoch": True}
        )

        # (3) the per-key last event becomes the new open version.
        last = ann.where(F.col("_next_lsn").isNull()).select(
            *k,
            F.col("lsn").alias("valid_from_lsn"),
            *self.payload_cols,
            "op",
            "lsn",
        )
        rec_c = self.current.merge_epoch(last, epoch)
        return {
            "epoch": epoch,
            "history": rec_h,
            "current": rec_c,
            "closed_buckets_read": len(bks),
        }

    # ---------------- read shapes ----------------

    def history_df(self) -> DataFrame:
        """Full version history: every closed interval plus the open
        version per live key (``valid_to_lsn`` NULL, ``is_current``)."""
        closed = self.history.read().select(
            *self.key_cols,
            "valid_from_lsn",
            "valid_to_lsn",
            *self.payload_cols,
        )
        open_ = self.current.read().select(
            *self.key_cols,
            "valid_from_lsn",
            F.lit(None).cast("long").alias("valid_to_lsn"),
            *self.payload_cols,
        )
        return closed.unionByName(open_).withColumn(
            "is_current", F.col("valid_to_lsn").isNull()
        )

    def asof(
        self, facts: DataFrame, fact_lsn: Column | str, how: str = "inner"
    ) -> DataFrame:
        """Enrich ``facts`` (carrying the natural key columns) with
        the dimension version valid at each fact's LSN:
        ``valid_from_lsn <= fact_lsn < valid_to_lsn`` (open versions
        bound only below).  Version intervals per key are disjoint by
        construction, so this never fans out."""
        lsn = F.col(fact_lsn) if isinstance(fact_lsn, str) else fact_lsn
        dim = self.history_df().select(
            *self.key_cols,
            "valid_from_lsn",
            "valid_to_lsn",
            *[F.col(c).alias(f"dim_{c}") for c in self.payload_cols],
        )
        cond = (lsn >= dim["valid_from_lsn"]) & (
            dim["valid_to_lsn"].isNull() | (lsn < dim["valid_to_lsn"])
        )
        for c in self.key_cols:
            cond = cond & (facts[c] == dim[c])
        return facts.join(dim, cond, how).drop(
            *[dim[c] for c in self.key_cols]
        )

    # ---------------- pipeline sidecar protocol ----------------

    @property
    def name(self) -> str:
        return f"scd2:{self.history.root.rstrip('/').rsplit('/', 2)[-2]}"

    def update_from_lake(self, lake, epoch: int) -> dict:
        """CDCPipeline sidecar hook: maintain the version history of
        the LAKE's own state.  The fold input is the epoch's
        EFFECTIVE changes (``lake.epoch_effective_batch`` — the
        committed MoR epoch's deduped batch, one event per key with
        its LSN in exactly the (lsn, op, key, payload) shape
        ``apply_epoch`` folds, filtered to the keys the epoch's
        CDC-out diff says actually CHANGED; the filter is FREE for
        provably LSN-monotone epochs).  The filter
        matters under out-of-order epochs (a file-split streaming
        micro-batch can carry an event OLDER than the key's live row):
        such an event loses the lake's last-writer-wins merge and
        never appears in any lake state, so it must not mint a
        history version either — and for every key the diff does
        include, the epoch's batch row IS the new winner, so its LSN
        is the version boundary.  History therefore tracks the lake's
        per-epoch visible versions, not the raw wire stream.
        Idempotent via the two tables' manifest checks (checked
        BEFORE touching the lake, so a late catch-up never re-reads
        vacuumed epochs it already applied).  Equal-LSN re-wins (a
        repair upsert beating a same-LSN row by write version) change
        the lake but are not representable in an LSN-keyed history —
        the monotonicity guard raises loud rather than corrupting
        intervals."""
        if (
            epoch in self.history.committed_epochs()
            and epoch in self.current.committed_epochs()
        ):
            return {"epoch": epoch, "skipped_duplicate_epoch": True}
        self._sync_schema(lake)
        try:
            batch = lake.epoch_effective_batch(epoch)
        except ValueError as e:
            raise ValueError(
                "scd2 sidecar needs the epoch's own change batch "
                "(merge_mode='mor' lake with un-vacuumed deltas): "
                f"{e}"
            ) from e
        return self.apply_epoch(batch, epoch)

    def _sync_schema(self, lake) -> list[dict]:
        """Propagate lake renames of tracked payload columns into both
        SCD tables before folding (the lake's epoch batches arrive
        normalized to its CURRENT logical names; without the rename
        the fold would select a vanished column).  Renames resolve
        via the lake manifest's chained physical→logical map; a
        tracked column that was DROPPED from the lake (or is
        otherwise unresolvable) raises — a history cannot silently
        stop versioning a column it promised to track."""
        lm = lake._load_manifest()
        changes: list[dict] = []
        for i, c in enumerate(list(self.payload_cols)):
            if c in lm["schema"]:
                continue
            tgt = lm["renames"].get(c)
            if not tgt or tgt not in lm["schema"]:
                raise ValueError(
                    f"scd2 tracked payload column {c!r} no longer exists "
                    "in the lake (dropped or unresolvable rename); evolve "
                    "the history explicitly"
                )
            ch = {"rename": f"{c}:{tgt}"}
            self.history.apply_schema_change(ch)
            self.current.apply_schema_change(ch)
            self.payload_cols[i] = tgt
            changes.append(ch)
        return changes
