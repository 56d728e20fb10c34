"""CDCPipeline — the epoch loop: tail → dedup → map → route → merge.

Batch-epoch driver over a changelog (Structured Streaming wraps the
same ``process_epoch`` via foreachBatch — see streaming/stream.py).
Semantics per epoch:

1. **schema events first** (op='SCHEMA', carried in the changelog per
   FIXTURES.md §2) — applied to the target table in LSN order as
   metadata-only commits (Iceberg-style ALTER TABLE).
2. **max-LSN dedup** per key (repo, path) — operators.dedup (E5);
   salted two-phase under hot-key skew (operators.skew).
3. **broadcast-dict mapping** — plans.mapping, vectorized Arrow UDF.
4. **routing/demux** — mapped rows upsert into the main table;
   unmapped rows (probe misses) are *excluded* from the main table
   and appended to a quarantine log, mirroring the reference's
   unmapped_code_log.txt append channel
   (reference CMS_SynPuf_ETL_CDM_v5.py:2038-2039, :1306-1308): an
   update that turns a previously-mapped key unmapped is applied to
   the main table as a delete.
5. **merge** — LakeTable.merge_epoch: bucketed copy-on-write,
   idempotent per (epoch), lineage recorded in the commit manifest.

Replay from any checkpoint converges: dedup is max-LSN (order-free),
identity is key-hash, merges are epoch-idempotent, quarantine appends
are epoch-keyed overwrites.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from etl_cms_spark.operators.dedup import (
    latest_by_lsn_broadcast,
    latest_by_lsn_join,
    latest_by_lsn_window,
)
from etl_cms_spark.operators.skew import estimate_key_stats, salted_latest_by_lsn
from etl_cms_spark.plans.mapping import map_concepts_join, map_concepts_udf
from etl_cms_spark.session import cluster_shape
from etl_cms_spark.sink.lake import LakeTable

KEY_COLS = ["repo", "path"]

MAIN_SCHEMA = {
    "repo": "string",
    "path": "string",
    "commit": "string",
    "lang": "string",
    "content": "string",
    "concept_id": "int",
    "domain": "string",
    "content_sha": "string",
}

# Reserved epoch id for the initial-snapshot bootstrap (see
# CDCPipeline.bootstrap).  Lives in the negative (non-source) epoch
# namespace like repair ids, pinned far below any plausible
# caller-chosen repair epoch; the repair flows reject it explicitly.
BOOTSTRAP_EPOCH = -(2**62)

# "watermark not read from the checkpoint yet" sentinel (None is a
# valid cached value: no bootstrap happened).
_UNSET = object()


class StagedEpochGroup:
    """The audit surface of a MULTI-TABLE write-audit-publish epoch
    (``CDCPipeline(epoch_audit=..., demux_domains=True)``): the main
    table's staged epoch plus one staged epoch per domain sink the
    batch touches.  A single verdict gates all of them — the pipeline
    publishes domains first and the main commit last (the completion
    marker), or discards every participant.

    Compatible with single-table audit callbacks: ``.epoch`` and the
    flat counters of ``.summary()`` are the MAIN table's (main carries
    the whole batch, so batch-level rules like a delete-ratio breaker
    read the same numbers either way); per-domain detail nests under
    ``summary()["domains"]``.
    """

    def __init__(self, main, domains: dict, skipped: dict):
        self.main = main
        #: live domain name -> StagedEpoch (domains the batch touches)
        self.domains = dict(domains)
        #: domain name -> skip record (no rows this epoch; never staged)
        self.skipped = dict(skipped)

    @property
    def epoch(self) -> int:
        return self.main.epoch

    def summary(self) -> dict:
        return {
            **self.main.summary(),
            "domains": {d: s.summary() for d, s in sorted(self.domains.items())},
            "skipped_domains": sorted(self.skipped),
        }

    def read(self, table: str = "main", bucket_ids: list | None = None):
        """Would-be post-publish state of ``table`` ("main" or a
        domain name)."""
        h = self.main if table == "main" else self.domains[table]
        return h.read(bucket_ids)

    def discard_all(self) -> None:
        """Drop every participant's staged files + reservations.
        Already-committed (replayed) participants are left alone."""
        for h in [self.main, *self.domains.values()]:
            if not h.already_committed and not h.published:
                h.discard()


class CDCPipeline:
    # MoR domain sinks compact whenever any bucket's base+delta stack
    # exceeds this depth (when no explicit compact_depth/compact_every
    # policy is given) — bounds read amplification by work done.
    _DEFAULT_DOMAIN_COMPACT_DEPTH = 8
    # targeted-demux lookup: batches at or below this many rows get a
    # broadcast semi prefilter of the previous-snapshot side (keys are
    # ~40-60 B/row, so 500k keys ≈ 25 MB broadcast — safe; above it,
    # batch ≈ keyspace and the filter would remove almost nothing).
    _LOOKUP_PREFILTER_MAX_ROWS = 500_000

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 32,
        salt_hot_keys: bool = False,
        mapper: str = "join",
        dedup_mode: str = "strict",
        merge_mode: str = "cow",
        compact_every: int | None = None,
        compact_depth: int | None = None,
        compact_cluster_by: list[str] | None = None,
        compact_cluster_layout: str = "linear",
        stats_cols: list[str] | None = None,
        member_cols: list[str] | None = None,
        vacuum_every: int | None = None,
        vacuum_keep_last: int = 8,
        demux_domains: bool = False,
        demux_tombstones: str = "targeted",
        domain_merge_mode: str | None = None,
        domain_n_buckets: int | None = None,
        detailed_lineage: bool = False,
        extra_mappings: dict[str, tuple[int, str]] | None = None,
        sidecars: list | None = None,
        dedup_filter_index: "object | None" = None,
        salt_task_row_budget: int = 32_000_000,
        broadcast_dedup_max_rows: int = 500_000,
        row_image: str = "full",
        epoch_audit: "object | None" = None,
        txn_col: str | None = None,
    ):
        """dedup_mode:
        * "strict" (default) — max-LSN dedup before mapping.  Measured
          1.7x faster end-to-end than "merge" at 5 versions/key: the
          pre-dedup shrinks the batch BEFORE the Arrow UDF + sha256 +
          merge join, which outweighs its extra shuffle.  The strict
          implementation is the ROW_NUMBER window form — measured
          (round 2, 4M events × 2 epochs, local[32] tuned): window
          13.4-14.5 s vs max_by-struct SortAggregate 19-22 s vs
          max(lsn)+semi-join 17.9 s end-to-end; the window sorts only
          (key, lsn) pairs within partitions while the struct
          aggregation sorts whole payload rows.
        * "join" — max(lsn) hash-agg + semi-join back (operators.
          dedup.latest_by_lsn_join): the dedup shuffle carries only
          (key, lsn) pairs on the agg side instead of window-sorting
          payload rows.  Exact duplicate (key, lsn) deliveries both
          survive (byte-identical; the merge resolves them).
        * "broadcast" — max(lsn) hash-agg + BROADCAST semi-join back
          (operators.dedup.latest_by_lsn_broadcast): the payload side
          never shuffles in the dedup stage at all — only the narrow
          winner set moves.  For epochs whose distinct-key count fits
          a broadcast (steady-state micro-batches); same duplicate-
          (key,lsn) caveat as "join".
        * "merge" — no pre-dedup; the lake merge's per-key reduction
          subsumes it (one fewer shuffle; only wins when the update
          ratio is near 1 version/key).  Quarantine then logs every
          unmapped event occurrence, like the reference's append log.
        * "salted" — two-phase salted dedup for pathological hot keys.
        * "auto" — resolve per EPOCH from a measured signal
          (_resolve_dedup_mode): a sampled estimate of the staged
          batch picks "salted" only when the HOTTEST KEY's estimated
          absolute row count reaches ``salt_task_row_budget`` (the
          regime where one window task would sort/spill that whole
          stream; the pinned A/B in BENCH/skew_ab.json measured the
          window form FASTER than salted at every sandbox-reachable
          skew, top-key share 0.03→0.35, so share alone must not
          trigger salting — the driver of the decision is rows per
          task); otherwise "strict".  r6 re-measure: with the
          merge-reduction skip (merge_epoch ``batch_deduped``, which
          only the one-row-per-key forms earn) the window form is
          fastest in absolute terms AND pinned 2→8 scaling at every
          measured regime (BENCH/scaling.json r6: strict 0.768 vs
          join 0.708 vs broadcast 0.710; small-batch A/B a tie within
          noise), so the r5 join/broadcast auto branches are retired —
          both forms remain explicit opt-ins.  The resolved mode +
          estimates land in the epoch's lineage.

        ``demux_domains=True`` routes each mapped row into a
        PER-DOMAIN destination LakeTable (the reference's multi-output
        dispatch to per-CDM-table files, CMS_SynPuf_ETL_CDM_v5.py
        :1228-1290, as exactly-once CDC sinks).  Cross-domain moves
        are handled by DELETE FAN-OUT (see ``demux_tombstones``), so a
        key whose latest version changed domain disappears from the
        old table on any replay order.  Domain sinks are merge-on-read
        by default (``domain_merge_mode``) with depth-triggered
        compaction, and tombstones are narrow key-only rows — the
        payload never fans out.  Never-present-key tombstones are
        expired by compact(expire_tombstones=True) after the replay
        horizon.

        ``sidecars`` — incremental index sidecars (objects exposing
        ``update_from_lake(lake, epoch)``, e.g.
        operators.vecindex.IncrementalVectorIndex or
        operators.textindex.IncrementalTextDedupIndex).  After every
        committed epoch each sidecar tails the lake's own CDC-out
        diff for that epoch, so index upkeep rides the exactly-once
        loop at O(changes)/epoch.  Replaying a committed epoch still
        syncs the sidecars — that closes the crash window between the
        main-table commit and the sidecar update (each sidecar's own
        applied-epoch set makes the re-offer a no-op once caught up).

        ``dedup_filter_index`` — ingest-time corpus dedup ENFORCEMENT
        (opt-in): an IncrementalTextDedupIndex whose live corpus each
        epoch's NEW keys are probed against BEFORE the merge; a new
        document that near-duplicates a live canonical (or a
        smaller-id document arriving in the same batch) is routed to
        the ``duplicates/`` log instead of the main table —
        canonical-first-wins, the training-corpus crawl-dedup rule.
        Updates and deletes of EXISTING keys always flow (a key's own
        content history is never suppressed).  The index is
        auto-registered as a sidecar, so it indexes exactly what the
        table commits (suppressed docs never enter it) strictly AFTER
        the commit — which is what makes a crash-replay recompute the
        identical routing: the in-epoch probe always sees the
        pre-epoch corpus.  Requires a pre-deduped batch (any
        dedup_mode except "merge").

        ``demux_tombstones`` picks the fan-out strategy:
        * "targeted" (default) — the batch keys' previous domains are
          looked up from the main table (bucket-pruned read of the
          pre-epoch snapshot, key/domain columns only) and a domain
          receives only its own upserts plus tombstones for keys that
          actually LEFT it.  Merge surface: ~batch + moves.  Requires
          in-order epoch application — run()/streaming always apply
          in order, and committed epochs replay as no-ops either way.
        * "blanket" — every non-owning domain receives a (narrow)
          tombstone for every batch key; converges under ANY epoch
          application order.  Merge surface: n_domains x batch.  Opt
          in when epochs may be first-applied out of order.

        ``row_image`` — "full" (default): every changelog event
        carries the complete row (the reference's CSV regime).
        "minimal": events carry only CHANGED columns (binlog
        row_image=MINIMAL); the epoch then folds per-column latest
        values (operators.dedup.fold_partial_updates — replaces the
        dedup_mode forms, which are whole-row) and HYDRATES full
        images against the main table (LakeTable.hydrate_partial —
        bucket-pruned, broadcast-semi, table side never shuffles)
        BEFORE concept mapping, so mapping/quarantine/demux/merge see
        complete rows and the rest of the epoch is unchanged.  Cost:
        one extra bucket-pruned table read per epoch — inherent to
        partial feeds.  Requires in-order epoch application (run()/
        streaming always apply in order).

        ``txn_col`` — TRANSACTION-BOUNDARY-ALIGNED epoch slicing for
        the batch tail (``run``/``stage``/``run_staged``).  Binlog
        events of one source transaction are contiguous in LSN order;
        naming the transaction-id column makes the slicer assign every
        row of a transaction to the epoch its COMMIT (max) LSN falls
        in, so no epoch boundary ever splits a transaction and no
        reader of any committed snapshot observes a half-applied one —
        the atomicity contract Debezium surfaces as transaction-
        boundary events.  Epochs may reach BACK below their nominal
        LSN floor (a boundary-spanning transaction commits in the
        later epoch), never forward; the converged state is
        byte-identical to plain slicing (latest-wins is order-free
        within an epoch).  Rows with NULL transaction id (schema
        events, heartbeats, non-transactional writes) slice by their
        own LSN, exactly as without ``txn_col``."""
        self.spark = spark
        self.root = root
        if row_image not in ("full", "minimal"):
            raise ValueError(f"row_image must be full|minimal, got {row_image}")
        self.row_image = row_image
        # epoch_audit: write-audit-publish quality gate.  Called once
        # per epoch with the StagedEpoch handle (exact would-be
        # post-merge state via .read(), job-free counts via
        # .summary()); truthy -> publish, falsy -> the epoch is
        # DISCARDED and its whole batch lands in the quarantine log
        # for the reprocess_quarantine repair flow (the source cursor
        # still advances — rejected data is retained, not re-pulled).
        # With demux_domains the gate becomes a MULTI-TABLE
        # transaction: the main epoch AND every domain slice are
        # staged, the audit sees the combined would-be state
        # (StagedEpochGroup), and the verdict publishes or discards
        # ALL of them — domains first, the main commit last as the
        # completion marker, so a crash mid-publish rolls forward on
        # replay (publishes only ever follow a pass).
        self.epoch_audit = epoch_audit
        if txn_col is not None and row_image == "minimal":
            # deferring a spanning transaction applies its rows AFTER
            # higher-LSN rows of completed ones — out-of-order
            # application, which the per-column partial fold cannot
            # accept (same refusal as start_stream's gate).
            raise ValueError(
                "txn_col defers transactions across epoch boundaries — "
                "out-of-order application, which row_image='minimal' "
                "per-column folding cannot accept"
            )
        self.txn_col = txn_col
        self.demux_domains = demux_domains
        if demux_tombstones not in ("blanket", "targeted"):
            raise ValueError(f"demux_tombstones must be blanket|targeted, got {demux_tombstones}")
        self.demux_tombstones = demux_tombstones
        self.table = LakeTable(
            spark, os.path.join(root, "tables", "files"), n_buckets, merge_mode=merge_mode
        )
        if demux_domains:
            from etl_cms_spark.plans.mapping import CONCEPT_MAP

            self.domains = sorted({d for _, d in CONCEPT_MAP.values()})
            # Domain sinks default to MERGE-ON-READ regardless of the
            # main table's mode: a CoW domain merge rewrites the whole
            # domain table every epoch (any epoch whose batch touches
            # all buckets pays table-size × n_domains in writes), while
            # MoR writes only each epoch's slice and the depth-
            # triggered compaction below amortizes the rewrite.  At
            # 10^10 events this is the difference between demux write
            # amplification O(epochs × table) and O(changes).  Pass
            # domain_merge_mode="cow" to opt out (e.g. read-latency-
            # critical domain tables).
            self.domain_merge_mode = domain_merge_mode or "mor"
            # each domain holds ~1/n_domains of the keys — give its
            # table proportionally fewer buckets (floor 8) so per-epoch
            # delta writes produce n_domains× fewer directories/files.
            # Reopening existing tables takes n_buckets from their
            # manifests, so the default only shapes NEW tables.
            nbd = domain_n_buckets or max(8, n_buckets // max(1, len(self.domains)))
            self.domain_tables = {
                d: LakeTable(
                    spark,
                    os.path.join(root, "tables", f"files_{d}"),
                    nbd,
                    merge_mode=self.domain_merge_mode,
                )
                for d in self.domains
            }
        # compaction policy (MoR): time-based (every N epochs) and/or
        # depth-based (when any bucket's base+delta stack exceeds
        # ``compact_depth`` file sets — bounds read amplification by
        # WORK DONE rather than wall time, the right trigger when epoch
        # sizes vary).
        self.compact_every = compact_every
        self.compact_depth = compact_depth
        # retention policy: without scheduled vacuum a sustained
        # pipeline's storage grows one superseded snapshot per epoch,
        # forever.  ``vacuum_keep_last`` is the time-travel / replay /
        # changelog-consumer horizon — size it past the slowest
        # downstream's checkpoint lag (lake_changelog consumers below
        # the horizon fail fast and must sync_snapshot).
        self.vacuum_every = vacuum_every
        self.vacuum_keep_last = vacuum_keep_last
        # value-column clustering applied at each scheduled MAIN-table
        # compaction (LakeTable.compact(cluster_by=...)): tight
        # row-group stats for selective non-key predicates, traded
        # against point-lookup stats — see the compact() docstring.
        self.compact_cluster_by = compact_cluster_by
        # "linear" or "zorder" (functions/zorder): z-order gives
        # EVERY clustered column bounded row-group stats, linear
        # only the leading one.
        self.compact_cluster_layout = compact_cluster_layout
        # planning-time pruning cache upkeep (sink/stats.py): after a
        # scheduled compaction rewrites dirs, refresh their stats in
        # the same epoch so read_where stays covered.
        self.stats_cols = stats_cols
        # membership sketches (equality/IN file pruning) ride the
        # same upkeep hook
        self.member_cols = member_cols
        self.quarantine_dir = os.path.join(root, "quarantine")
        self.duplicates_dir = os.path.join(root, "duplicates")
        self.checkpoint_path = os.path.join(root, "_checkpoint.json")
        self.salt_hot_keys = salt_hot_keys
        self.mapper = mapper
        # vocabulary updates: the concept dictionary this pipeline
        # maps with = the base CONCEPT_MAP plus any entries added
        # since (the repair flow re-offers quarantined rows under the
        # extended dictionary).
        from etl_cms_spark.plans.mapping import CONCEPT_MAP

        self.mapping = {**CONCEPT_MAP, **(extra_mappings or {})}
        self.dedup_mode = "salted" if salt_hot_keys else dedup_mode
        if self.dedup_mode not in ("strict", "salted", "join", "broadcast", "merge", "auto"):
            raise ValueError(
                "dedup_mode must be strict|salted|join|broadcast|merge|auto, "
                f"got {self.dedup_mode}"
            )
        self.salt_task_row_budget = salt_task_row_budget
        self.broadcast_dedup_max_rows = broadcast_dedup_max_rows
        # Modes that guarantee ONE row per key in the deduped batch.
        # 'auto' qualifies: its resolver refuses the join/broadcast
        # forms whenever a one-row consumer is attached (needs_one_row
        # in _resolve_dedup_mode).  The join/broadcast forms keep
        # byte-identical duplicate (key, lsn) survivors — harmless to
        # the merges, but they double-count in any per-row consumer
        # (targeted demux's stale-claim analysis, the dedup filter's
        # suppression log), so those consumers reject them up front
        # instead of silently miscounting.
        one_row_modes = ("strict", "salted", "auto")
        if (
            demux_domains
            and demux_tombstones == "targeted"
            and self.dedup_mode not in one_row_modes
        ):
            # targeted routing reasons about ONE row per key per
            # batch (its stale-claim analysis is per-row vs the
            # table); an un-pre-deduped batch can carry a delete and
            # an older upsert of the same key whose interaction only
            # blanket fan-out resolves.
            raise ValueError(
                "demux_tombstones='targeted' requires a one-row-per-key "
                "batch (dedup_mode 'strict', 'salted', or 'auto'); use "
                "demux_tombstones='blanket' with dedup_mode "
                f"{self.dedup_mode!r}"
            )
        # per-PARTITION lineage (north rule): record per-bucket rows
        # applied/deleted + LSN range each epoch.  One extra hash agg
        # per epoch over the cached batch (output = n_buckets rows),
        # so it's off by default on the hot path.
        self.detailed_lineage = detailed_lineage
        self.sidecars = list(sidecars or [])
        self.dedup_filter_index = dedup_filter_index
        if dedup_filter_index is not None:
            if self.dedup_mode not in one_row_modes:
                raise ValueError(
                    "dedup_filter_index requires a one-row-per-key batch "
                    "(dedup_mode 'strict', 'salted', or 'auto'); the "
                    f"{self.dedup_mode!r} form's duplicate (key,lsn) "
                    "survivors would double-count in the suppression log"
                )
            if dedup_filter_index not in self.sidecars:
                self.sidecars.append(dedup_filter_index)
        self.metrics: list[dict[str, Any]] = []
        self._bootstrap_lsn: "int | None | object" = _UNSET

    # ---------------- lifecycle ----------------

    def init_tables(self) -> None:
        if not self.table.exists():
            self.table.create(KEY_COLS, MAIN_SCHEMA)
        if self.demux_domains:
            for t in self.domain_tables.values():
                if not t.exists():
                    t.create(KEY_COLS, MAIN_SCHEMA)

    def checkpoint(self) -> dict:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as f:
                return json.load(f)
        return {"last_epoch": -1, "lsn_hi": -1}

    def _save_checkpoint(self, epoch: int, lsn_hi: int | None) -> None:
        payload = {"last_epoch": epoch, "lsn_hi": lsn_hi}
        b = self._bootstrap_watermark()
        if b is not None:
            # the snapshot watermark is part of the cursor: every
            # later save must carry it forward or a restarted
            # pipeline would lose the tail gate.
            payload["bootstrap_lsn"] = b
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.checkpoint_path)

    def _bootstrap_watermark(self) -> "int | None":
        """Snapshot LSN recorded by ``bootstrap()`` (None when the
        table was built from the changelog alone).  Read once from
        the checkpoint, then cached — a fresh pipeline object on an
        existing root picks it up from disk."""
        if self._bootstrap_lsn is _UNSET:
            self._bootstrap_lsn = self.checkpoint().get("bootstrap_lsn")
        return self._bootstrap_lsn

    def bootstrap(self, snapshot: DataFrame, snapshot_lsn: int) -> dict:
        """Initial load → changelog-tail HANDOFF (Debezium's
        snapshot-then-stream model; the reference's one-shot full
        load, python_etl's whole-file reads, generalized to a
        resumable cutover).

        ``snapshot`` is a SOURCE-image snapshot — one row per live
        key, the changelog's columns minus (lsn, op) — consistent as
        of ``snapshot_lsn``.  Every row is stamped ``op='I'`` at
        ``lsn=snapshot_lsn`` and applied through the FULL epoch path
        (dedup no-ops, mapping, quarantine, demux fan-out, lineage)
        under the reserved ``BOOTSTRAP_EPOCH``, so a bootstrapped
        table is indistinguishable from a replayed one.

        The handoff trap this closes: replaying a tail that OVERLAPS
        the snapshot (lsn <= snapshot_lsn) is NOT absorbed by max-LSN
        resolution alone — a key deleted before the snapshot has no
        snapshot row to outrank its older pre-delete upserts, so an
        overlapping replay would RESURRECT it.  ``bootstrap`` records
        ``snapshot_lsn`` in the checkpoint and every subsequent
        ``process_epoch`` drops events (and schema events) at
        ``lsn <= snapshot_lsn`` — a scan-level pushed-down predicate
        (monotone lsn ⇒ parquet row-group/file stats prune whole
        overlap files at re-tail scale), after which any remaining
        overlap convergence IS guaranteed by max-LSN.  Tail feeds may
        therefore start anywhere at or before the cutover; correctness
        no longer depends on the producer cutting exactly at W.

        Idempotent: a crash before the checkpoint write re-runs the
        merge as a duplicate-epoch no-op; re-bootstrapping an already
        tailed table, or with a different watermark, fails fast."""
        if snapshot_lsn < 0:
            raise ValueError(f"snapshot_lsn must be >= 0, got {snapshot_lsn}")
        overlap = {"lsn", "op"} & set(snapshot.columns)
        if overlap:
            raise ValueError(
                "snapshot must be a source-image (no changelog "
                f"bookkeeping columns), found {sorted(overlap)}"
            )
        self.init_tables()
        prior = {int(e) for e in self.table.committed_epochs()}
        if prior - {BOOTSTRAP_EPOCH}:
            raise ValueError(
                "bootstrap requires a fresh table: epochs "
                f"{sorted(prior - {BOOTSTRAP_EPOCH})[:5]} already committed"
            )
        existing = self._bootstrap_watermark()
        if existing is not None and existing != snapshot_lsn:
            raise ValueError(
                f"table already bootstrapped at lsn {existing}; "
                f"cannot re-bootstrap at {snapshot_lsn}"
            )
        events = snapshot.select(
            "*",
            F.lit(int(snapshot_lsn)).cast("long").alias("lsn"),
            F.lit("I").alias("op"),
        )
        # is_repair=True: the epoch write must not advance the source
        # cursor — the watermark save below IS the cursor update.
        rec = self.process_epoch(events, BOOTSTRAP_EPOCH, is_repair=True)
        self._bootstrap_lsn = int(snapshot_lsn)
        cp = self.checkpoint()
        self._save_checkpoint(
            cp.get("last_epoch", -1),
            max(cp.get("lsn_hi") or -1, int(snapshot_lsn)),
        )
        rec["bootstrap_lsn"] = int(snapshot_lsn)
        return rec

    def _apply_schema_change_all(self, change: dict) -> None:
        """Schema events evolve EVERY destination table (the main
        table and, in demux mode, each domain table)."""
        self.table.apply_schema_change(change)
        if self.demux_domains:
            for t in self.domain_tables.values():
                t.apply_schema_change(change)

    # ---------------- epoch processing ----------------

    def process_epoch(
        self,
        batch: DataFrame,
        epoch: int,
        schema_events: list | None = None,
        is_repair: bool = False,
    ) -> dict:
        """Apply one change batch.  Idempotent per epoch.

        ``schema_events`` (list of (lsn, schema_change-json) tuples)
        lets a batch driver pre-extract ALL schema events in one job
        for the whole changelog instead of one collect job per epoch —
        the per-epoch serial job count is what bounds scaling
        efficiency at high parallelism.  None = scan this batch."""
        # The MAIN commit is the LAST write of an epoch (domain merges
        # run first, 5a), so main-committed implies every domain that
        # had rows committed too — checking only the main table is
        # crash-safe AND stays correct now that untouched domains skip
        # their merge entirely (no epoch record, no version bump).  A
        # crash inside the domain fan-out leaves main uncommitted; the
        # re-run is absorbed by each domain merge's own idempotency.
        committed = {str(e) for e in self.table.committed_epochs()}
        if str(epoch) in committed:
            rec = {"epoch": epoch, "skipped_duplicate_epoch": True}
            # a crash may have landed between the main commit and the
            # sidecar sync: re-offer the committed epoch to every
            # sidecar (no-op once each has applied it).
            sc = self._sync_sidecars(epoch)
            if sc:
                rec["sidecars"] = sc
            self.metrics.append(rec)
            return rec

        # 1a. bootstrap tail gate: after an initial-snapshot load,
        #     events at or before the snapshot watermark are already
        #     reflected in (or intentionally absent from) the table —
        #     replaying them would resurrect pre-snapshot deletes.
        #     Pushed-down scan predicate; repairs are exempt (their
        #     rows legitimately carry old LSNs, incl. lsn == W for
        #     quarantined bootstrap rows).
        blsn = None if is_repair else self._bootstrap_watermark()
        if blsn is not None:
            batch = batch.where(F.col("lsn") > F.lit(int(blsn)))
            if schema_events is not None:
                schema_events = [(l, c) for (l, c) in schema_events if l > blsn]

        # 1. schema-evolution events (tiny — driver-side apply).
        if "schema_change" in batch.columns:
            if schema_events is None:
                schema_events = [
                    (r["lsn"], r["schema_change"])
                    for r in batch.where(F.col("op") == "SCHEMA")
                    .select("lsn", "schema_change")
                    .orderBy("lsn")
                    .collect()
                ]
            for _, change in sorted(schema_events):
                self._apply_schema_change_all(json.loads(change))
            data = batch.where(F.col("op") != "SCHEMA").drop("schema_change")
        else:
            data = batch

        # 2. per-key max-LSN dedup (see dedup_mode in __init__).
        mode = self.dedup_mode
        auto_rec = None
        if self.row_image == "minimal":
            # partial images: whole-row dedup forms don't apply —
            # fold per-column latest values, then hydrate full images
            # against the pre-epoch main table so mapping/quarantine/
            # demux downstream see complete rows (see __init__).
            # persist the folded batch: the hydration's bucket
            # discovery would otherwise execute the whole fold once
            # just to list buckets, and again when the batch
            # materializes (code-review finding).
            from etl_cms_spark.operators.dedup import fold_partial_updates

            folded = fold_partial_updates(
                data, KEY_COLS, "lsn", op_col="op", reset_col="_reset"
            ).persist()
            latest = self.table.hydrate_partial(folded, reset_col="_reset")
        elif mode == "auto":
            mode, auto_rec = self._resolve_dedup_mode(data)
        if self.row_image == "minimal":
            pass  # latest already folded+hydrated above
        elif mode == "strict":
            latest = latest_by_lsn_window(data, KEY_COLS, "lsn")
        elif mode == "salted":
            latest = salted_latest_by_lsn(data, KEY_COLS, "lsn")
        elif mode == "join":
            # max(lsn) hash-agg + semi-join back: shuffles only
            # (key, lsn) pairs through the agg instead of sorting
            # payload-bearing rows in the window — the round-3 advice
            # experiment for the plain tail's shuffle efficiency.
            # Exact duplicate (key, lsn) rows both survive (byte-
            # identical; the merge resolves them deterministically).
            latest = latest_by_lsn_join(data, KEY_COLS, "lsn")
        elif mode == "broadcast":
            # broadcast-semi: the payload side never shuffles in the
            # dedup stage — only the narrow (key, max-lsn) winner set
            # moves (then broadcasts).  For epochs whose distinct-key
            # count fits a broadcast; see operators/dedup.py.
            latest = latest_by_lsn_broadcast(data, KEY_COLS, "lsn")
        else:  # "merge": the lake merge's per-key reduction dedups.
            latest = data

        # One row per key GUARANTEED?  The window/salted forms (and
        # the partial fold+hydrate path) emit exactly one row per key;
        # the merge can then skip its own per-key reduction entirely
        # (two SortAggregates + two Sorts + one Exchange of payload
        # rows per epoch — measured r6).  The join/broadcast/merge
        # forms may keep duplicate (key, lsn) survivors, so they
        # cannot make the guarantee.
        batch_deduped = self.row_image == "minimal" or mode in ("strict", "salted")

        # 2b. ingest-time duplicate suppression (opt-in — see
        #     ``dedup_filter_index`` in __init__).
        n_suppressed = 0
        if self.dedup_filter_index is not None:
            latest, n_suppressed = self._filter_duplicates(latest, epoch)

        # 3. broadcast-dict concept mapping (Arrow UDF — no per-row Python).
        #    Persisted: the epoch re-reads this batch (quarantine,
        #    merge) — without the cache the dedup shuffle + UDF would
        #    re-execute per job.
        map_fn = map_concepts_udf if self.mapper == "udf" else map_concepts_join
        mapped = map_fn(self.spark, latest, mapping=self.mapping).persist()
        try:
            # 4. route: unmapped upserts leave the main table (delete)
            #    and land in the quarantine log.  All lineage stats
            #    ride the single cache-materialization job via
            #    observe() — the per-epoch serial job count is what
            #    bounds scaling efficiency, so keep it at 2 (stats +
            #    merge write; +1 when quarantine has rows).
            is_unmapped = (F.col("domain") == "unmapped") & (F.col("op") != "D")
            updates = mapped.withColumn("_quar", is_unmapped).withColumn(
                "op", F.when(F.col("_quar"), F.lit("D")).otherwise(F.col("op"))
            )
            obs = Observation()
            observed = updates.observe(
                obs,
                F.count(F.lit(1)).alias("n_total"),
                F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
                F.min("lsn").alias("lsn_lo"),
                F.max("lsn").alias("lsn_hi"),
                F.collect_set(self.table.bucket_expr(KEY_COLS)).alias("buckets"),
                F.sum(F.col("_quar").cast("long")).alias("n_quar"),
            )
            observed.write.format("noop").mode("overwrite").save()
            stats = obs.get
            qn = int(stats["n_quar"] or 0)
            if qn:
                # epoch-keyed overwrite => replaying the epoch
                # rewrites, not duplicates, the quarantine slice.
                mapped.where(is_unmapped).withColumn("epoch", F.lit(epoch)).write.mode(
                    "overwrite"
                ).parquet(os.path.join(self.quarantine_dir, f"epoch={epoch}"))

            extra = {"rows_quarantined": qn}
            if self.row_image == "minimal":
                extra["row_image"] = "minimal"
            if auto_rec is not None:
                extra["dedup_auto"] = auto_rec
            if self.dedup_filter_index is not None:
                extra["rows_suppressed_duplicates"] = n_suppressed
            if self.detailed_lineage:
                # per-bucket lineage: rows applied/deleted + source LSN
                # range per partition (bucket) — the north rule's
                # per-partition lineage record.
                extra["partitions"] = {
                    str(r["_b"]): {
                        "rows": r["n"],
                        "deletes": r["d"],
                        "lsn_min": r["lo"],
                        "lsn_max": r["hi"],
                    }
                    for r in updates.groupBy(
                        self.table.bucket_expr(KEY_COLS).alias("_b")
                    )
                    .agg(
                        F.count("*").alias("n"),
                        F.sum((F.col("op") == "D").cast("long")).alias("d"),
                        F.min("lsn").alias("lo"),
                        F.max("lsn").alias("hi"),
                    )
                    .collect()
                }
            # 5a. per-domain destination tables (demux I) — BEFORE the
            # main merge, so the "targeted" mode's previous-domain
            # lookup reads the pre-epoch snapshot even on crash-resume
            # (the main commit is the last write; if it exists, every
            # domain commit already does).
            dom_recs = None
            dom_staged = None
            if self.demux_domains:
                if self.epoch_audit is None:
                    dom_recs = self._demux_merge(mapped, stats, epoch)
                else:
                    # multi-table WAP: domain slices are STAGED (full
                    # merge compute + data write, no commit) so the
                    # audit verdict gates every sink of the epoch
                    # atomically — see the gate block below.
                    dom_recs, dom_staged = self._demux_merge(
                        mapped, stats, epoch, stage=True
                    )

            # 5b. exactly-once main merge with lineage — optionally
            # through the write-audit-publish gate (epoch_audit).
            merge_stats = {
                "n_total": int(stats["n_total"] or 0),
                "n_deletes": int(stats["n_deletes"] or 0),
                "lsn_lo": stats["lsn_lo"],
                "lsn_hi": stats["lsn_hi"],
                "changed_buckets": sorted(stats["buckets"] or []),
            }
            if self.epoch_audit is None:
                rec = self.table.merge_epoch(
                    updates.drop("_quar"), epoch,
                    extra_lineage=extra, stats=merge_stats,
                    batch_deduped=batch_deduped,
                )
            else:
                staged = self.table.stage_epoch(
                    updates.drop("_quar"), epoch,
                    extra_lineage=extra, stats=merge_stats,
                    batch_deduped=batch_deduped,
                )
                gate = (
                    StagedEpochGroup(staged, dom_staged or {}, dom_recs or {})
                    if self.demux_domains
                    else staged
                )
                # ROLL FORWARD: publishes only ever happen after a
                # PASS verdict, so any participant already committed
                # (a replay of a fully published epoch, or a crash
                # between the domain publishes and the main commit)
                # proves this epoch's verdict was pass — complete the
                # transaction instead of re-judging a partially
                # visible state.
                roll_forward = staged.already_committed or any(
                    s.already_committed for s in (dom_staged or {}).values()
                )
                if roll_forward:
                    passed = True
                else:
                    try:
                        passed = bool(self.epoch_audit(gate))
                    except BaseException:
                        if self.demux_domains:
                            gate.discard_all()
                        else:
                            staged.discard()
                        raise
                if passed:
                    # domains publish FIRST, the main commit LAST —
                    # the main epoch record is the transaction's
                    # completion marker (same ordering as the
                    # unstaged demux path), so a crash anywhere in
                    # the publish fan-out replays into the
                    # roll-forward branch above.
                    if dom_staged:
                        from concurrent.futures import ThreadPoolExecutor

                        with ThreadPoolExecutor(
                            max_workers=len(dom_staged)
                        ) as pool:
                            futs = {
                                d: pool.submit(s.publish)
                                for d, s in dom_staged.items()
                            }
                            dom_recs.update(
                                {d: f.result() for d, f in futs.items()}
                            )
                    rec = staged.publish()
                else:
                    if self.demux_domains:
                        gate.discard_all()
                        dom_recs.update(
                            {
                                d: {
                                    "epoch": epoch,
                                    "audit_rejected": True,
                                    "rows_upserted": 0,
                                    "rows_deleted": 0,
                                }
                                for d in (dom_staged or {})
                            }
                        )
                    else:
                        staged.discard()
                    # retain the WHOLE batch for the repair flow
                    # (epoch-keyed overwrite: replays rewrite, not
                    # duplicate, the slice — same idempotency as
                    # the unmapped quarantine above).
                    mapped.withColumn("epoch", F.lit(epoch)).write.mode(
                        "overwrite"
                    ).parquet(
                        os.path.join(self.quarantine_dir, f"epoch={epoch}")
                    )
                    rec = {
                        **extra,
                        "epoch": epoch,
                        "audit_rejected": True,
                        "rows_upserted": 0,
                        "rows_deleted": 0,
                        "rows_quarantined": int(stats["n_total"] or 0),
                        "lsn_min": stats["lsn_lo"],
                        "lsn_max": stats["lsn_hi"],
                    }
            if dom_recs is not None:
                rec["domains"] = dom_recs
        finally:
            mapped.unpersist()
            if self.row_image == "minimal":
                folded.unpersist()
        due = bool(self.compact_every and (epoch + 1) % self.compact_every == 0)
        if self.table.merge_mode == "mor":
            if due:
                # scheduled compaction folds the whole delta set (the
                # periodic full-layout refresh, incl. re-clustering)
                rec["compaction"] = self.table.compact(
                    cluster_by=self.compact_cluster_by,
                    cluster_layout=self.compact_cluster_layout,
                )
                if self.stats_cols:
                    rec["stats_refresh"] = self.table.refresh_stats(
                        self.stats_cols
                    )
                if self.member_cols:
                    rec["member_refresh"] = self.table.refresh_member_stats(
                        self.member_cols
                    )
            elif self.compact_depth:
                # depth-triggered compaction is SELECTIVE: fold only
                # the buckets past the cap — read amplification is
                # per-bucket, so the fix is per-bucket too.  With
                # skewed keys a few buckets deepen fast; rewriting the
                # other ~10^4 along with them is O(table) work for
                # O(hot-bucket) benefit.
                deep = [
                    b for b, depth in self.table.delta_depths().items()
                    if depth > self.compact_depth
                ]
                if deep:
                    rec["compaction"] = self.table.compact(
                        cluster_by=self.compact_cluster_by, buckets=deep,
                        cluster_layout=self.compact_cluster_layout,
                    )
        if self.demux_domains:
            # domain tables accrue delta stacks (and, in blanket mode,
            # a full-batch tombstone fan-out) every epoch — left
            # uncompacted their depth grows without bound, so each
            # MoR domain table compacts on ITS OWN depth/schedule,
            # independent of the main table's mode.
            depth_cap = self.compact_depth or self._DEFAULT_DOMAIN_COMPACT_DEPTH
            domc = {}
            for d, t in sorted(self.domain_tables.items()):
                if t.merge_mode != "mor":
                    continue
                if due:
                    domc[d] = t.compact()
                else:
                    deep = [
                        b for b, depth in t.delta_depths().items()
                        if depth > depth_cap
                    ]
                    if deep:
                        domc[d] = t.compact(buckets=deep)
            if domc:
                rec["domain_compactions"] = domc
        if self.vacuum_every and (epoch + 1) % self.vacuum_every == 0:
            # scheduled retention AFTER any compaction above: the
            # vacuum can then drop the dirs that fold just superseded.
            rec["vacuum"] = self.table.vacuum(keep_last=self.vacuum_keep_last)
            if self.demux_domains:
                rec["domain_vacuums"] = {
                    d: t.vacuum(keep_last=self.vacuum_keep_last)
                    for d, t in sorted(self.domain_tables.items())
                }
        sc = self._sync_sidecars(epoch)
        if sc:
            rec["sidecars"] = sc
        if not is_repair:
            # A repair epoch is out-of-band: it must never advance the
            # SOURCE cursor (its rows carry old LSNs; overwriting the
            # checkpoint with them would re-deliver the source tail).
            self._save_checkpoint(epoch, rec.get("lsn_max"))
        self.metrics.append(rec)
        return rec

    def _resolve_dedup_mode(self, data: DataFrame) -> tuple[str, dict]:
        """Per-epoch resolution of ``dedup_mode="auto"``.

        One measured signal (r6 — the r5 small-batch/cluster-shape
        branches are retired, see the inline note below):

        1. HOT-KEY ROWS — ``estimate_key_stats`` (2% Bernoulli
           sample of the key columns; one narrow extra job) gives
           (top_key_share, est_rows); their product estimates the
           hottest key's absolute event count.  Salting triggers
           only when that reaches ``salt_task_row_budget`` — the
           regime where the window form's single hot task would
           sort/spill the key's whole stream.  The pinned A/B
           (BENCH/skew_ab.json) measured the window form FASTER
           than salted at every sandbox-reachable skew (share
           0.034/0.146/0.352 of 4M events → salted "speedup"
           0.78/0.40/0.56): salting's two payload-carrying
           aggregation phases cost more than the imbalance they
           cure until a single task's row count becomes the
           bottleneck, so SHARE ALONE MUST NOT TRIGGER IT.  The
           budget default (32M rows) is the scale-out extrapolation
           — beyond it a task's sort exceeds comfortable
           memory/stage budgets and salting's bound (rows/n_salts
           per task) wins.  The sample seed is fixed, so a replayed
           epoch resolves identically.
        Everything else resolves to "strict" (the window form).

        Every resolved mode produces identical output rows, so the
        decision never affects correctness — only the shuffle shape.
        The cluster-shape signal is still computed and recorded in the
        lineage for observability.
        """
        share, est_rows = estimate_key_stats(data, KEY_COLS)
        hot_rows = int(share * est_rows)
        n_exec, cores = cluster_shape(self.spark)
        # r6 re-measure: with the merge-reduction skip (merge_epoch
        # batch_deduped — only the one-row-per-key forms qualify), the
        # WINDOW form is fastest in absolute terms AND scaling at
        # every measured regime — pinned 2→8 strict 0.768 vs join
        # 0.708 vs broadcast 0.710 (BENCH/scaling.json r6; r4's join
        # advantage, 0.773 vs 0.535, predates the skip), and the
        # 200k-epoch small-batch A/B is a tie within noise (strict
        # 3.25-4.67 s vs broadcast 3.62-3.90 s) where broadcast was
        # 1.8× ahead in r5.  So auto now resolves to just two forms:
        # salted when one key's absolute rows would swamp a task,
        # else strict.  The join/broadcast forms remain explicit
        # opt-ins (they also forfeit the merge skip, since their
        # duplicate-(key,lsn) survivors void the one-row guarantee).
        mode = "salted" if hot_rows >= self.salt_task_row_budget else "strict"
        return mode, {
            "resolved": mode,
            "top_key_share_est": round(share, 4),
            "hot_key_rows_est": hot_rows,
            "batch_rows_est": est_rows,
            "n_executors": n_exec,
            "cores_per_executor": cores,
        }

    def _filter_duplicates(self, latest: DataFrame, epoch: int) -> tuple[DataFrame, int]:
        """Route near-duplicate NEW documents out of the batch (2b).

        Mechanics, all pre-epoch-state so replays recompute the same
        routing:
        * new keys = batch upserts minus existing table keys — the
          table side is prefiltered with a broadcast semi join on the
          batch keys (scan-local narrow read, the targeted-demux
          lookup shape) so the anti join never shuffles the table;
        * each new doc's portable MinHash signature probes the filter
          index's live bands (batch side broadcast, index side never
          shuffled) and its within-batch peers;
        * suppression rule: a new doc loses to any LIVE canonical it
          matches, and to any SMALLER-id batch doc it matches
          (deterministic, replay-stable);
        * losers land in ``duplicates/epoch=N`` (epoch-keyed
          overwrite — replays rewrite, never duplicate) with the
          canonical they matched and the estimated Jaccard.
        """
        idx = self.dedup_filter_index
        did = F.xxhash64(*KEY_COLS)
        ups = latest.where(F.col("op") != "D").withColumn("_doc_id", did)
        chg_ids = latest.select(did.alias("doc_id")).dropDuplicates()
        bkeys = ups.select(*KEY_COLS).dropDuplicates()
        tbl_keys = self.table.read().select(*KEY_COLS)
        hit = tbl_keys.join(F.broadcast(bkeys), KEY_COLS, "leftsemi")
        news = ups.join(F.broadcast(hit), KEY_COLS, "left_anti")
        sigs = idx.sig_frame(
            news.select(F.col("_doc_id").alias("doc_id"), F.col("content"), "lsn"),
            "lsn",
        )
        nb = idx.band_frame(sigs).select("doc_id", "band", "bkt").dropDuplicates()
        live_b = idx.live_bands().join(F.broadcast(chg_ids), "doc_id", "left_anti")
        live_s = idx.live_sigs().join(F.broadcast(chg_ids), "doc_id", "left_anti")
        vs_live = (
            live_b.join(
                F.broadcast(nb.withColumnRenamed("doc_id", "_bid")), ["band", "bkt"]
            )
            .select(F.col("doc_id").alias("id_a"), F.col("_bid").alias("id_b"))
            .dropDuplicates()
        )
        v1 = idx._verify(vs_live, live_s, sigs)
        within = (
            nb.alias("x")
            .join(nb.alias("y"), ["band", "bkt"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
            .dropDuplicates()
        )
        v2 = idx._verify(within, sigs, sigs)
        sup = (
            v1.unionByName(v2)
            .groupBy("id_b")
            .agg(
                F.min("id_a").alias("dup_of_doc_id"),
                F.max("est_jaccard").alias("est_jaccard"),
            )
            .withColumnRenamed("id_b", "_doc_id")
        )
        logged = news.join(sup, "_doc_id").select(
            *KEY_COLS,
            "lsn",
            F.col("_doc_id").alias("doc_id"),
            "dup_of_doc_id",
            "est_jaccard",
        )
        logged.write.mode("overwrite").parquet(
            os.path.join(self.duplicates_dir, f"epoch={epoch}")
        )
        # the write above already materialized the whole probe
        # pipeline (sigs → band joins → verify → groupBy); read the
        # suppression set back from the log instead of re-executing
        # that lineage a second time in the keep-side anti join.
        written = self.spark.read.parquet(
            os.path.join(self.duplicates_dir, f"epoch={epoch}")
        )
        n_sup = written.count()
        if not n_sup:
            return latest, 0
        keep = latest.withColumn("_doc_id", did).join(
            F.broadcast(written.select(F.col("doc_id").alias("_doc_id"))),
            "_doc_id",
            "left_anti",
        ).drop("_doc_id")
        return keep, n_sup

    def duplicates(self) -> DataFrame:
        """The ingest-time duplicate log (dedup_filter_index mode)."""
        return self.spark.read.parquet(self.duplicates_dir)

    def catch_up_sidecars(self) -> dict:
        """Back-fill every registered sidecar with ALL committed
        epochs it has not applied yet, in commit order.  Batch mode
        never needs this (run() re-offers every epoch and the
        duplicate-epoch skip path syncs sidecars), but a STREAMING
        restart does: the Structured Streaming checkpoint does not
        re-deliver committed micro-batches, so a sidecar attached
        after the fact — or one that missed the crash window between
        a commit and its sync — must catch up from the lake's epoch
        history.  Requires the epochs' snapshots to still be retained
        (vacuum/expiry can GC them; a sidecar older than the retained
        horizon should be rebuilt instead)."""
        out = {}
        for epoch in sorted(self.table.committed_epochs()):
            r = self._sync_sidecars(epoch)
            if r:
                out[epoch] = r
        return out

    def catch_up_domains(self, repair_epoch: int) -> dict:
        """Converge the per-domain destination tables to the MAIN
        table's current routing — the domain analogue of
        ``catch_up_sidecars``.

        The duplicate-epoch skip consults only the main table's epoch
        markers (the main commit is written LAST, so in-process crash
        windows are covered), which means domain tables that are
        behind for any OTHER reason — ``demux_domains`` enabled over
        a lake populated without it, or a domain table restored from
        an older backup — can never be backfilled by replaying the
        changelog: every epoch short-circuits on the main marker.
        This repairs them directly from the main table's CURRENT raw
        state in ONE bounded pass (no per-epoch replay): the live
        state plus main-table tombstones, each at its winning LSN, is
        offered through the blanket demux fan-out as a single repair
        epoch — every domain receives its own rows as upserts and a
        tombstone for every other key, and max-LSN resolution makes
        the offer a no-op for any domain already in sync.

        ``repair_epoch`` must be NEGATIVE (the reserved repair
        namespace shared with ``reprocess_quarantine``) so it can
        never collide with source epoch ids or streaming batch ids;
        re-running with the same id is a per-table duplicate-epoch
        no-op.

        Caveat (same horizon rule as ``catch_up_sidecars``): a key
        whose main-table tombstone has been vacuumed past retention
        can no longer be tombstoned here — rebuild domain tables
        instead of repairing across a GC horizon.
        """
        if not self.demux_domains:
            raise ValueError("catch_up_domains requires demux_domains=True")
        if repair_epoch >= 0:
            raise ValueError(
                "repair_epoch must be negative (reserved repair namespace), "
                f"got {repair_epoch}"
            )
        if repair_epoch == BOOTSTRAP_EPOCH:
            raise ValueError(
                "repair_epoch collides with the reserved BOOTSTRAP_EPOCH"
            )
        cur = self.table.read_raw()
        payload = [c for c in cur.columns if c not in ("_lsn", "_deleted")]
        batch = cur.select(
            *payload,
            F.col("_lsn").alias("lsn"),
            F.when(F.col("_deleted"), F.lit("D")).otherwise(F.lit("U")).alias("op"),
        ).persist()
        # targeted tombstones can't express this repair: its departure
        # analysis diffs the batch against the main table's previous
        # domains, and this batch IS the main table — a stale row in a
        # DOMAIN table (the thing being repaired) is invisible to it.
        # Blanket fan-out tombstones every key into every non-owning
        # domain, which is exactly the repair semantics.
        saved = self.demux_tombstones
        self.demux_tombstones = "blanket"
        try:
            recs = self._demux_merge(
                batch, {"n_total": None, "buckets": []}, repair_epoch
            )
        finally:
            self.demux_tombstones = saved
            batch.unpersist()
        return recs

    def _sync_sidecars(self, epoch: int) -> dict | None:
        """Offer a committed epoch's CDC-out diff to every registered
        index sidecar.  Runs AFTER the main commit (the epoch's
        completion marker) and again on duplicate-epoch replays, so a
        crash between commit and sync is healed on the next offer;
        each sidecar's applied-epoch set keeps the re-offer
        idempotent."""
        if not self.sidecars:
            return None
        out = {}
        for i, sc in enumerate(self.sidecars):
            name = getattr(sc, "name", None) or f"{type(sc).__name__}#{i}"
            out[name] = sc.update_from_lake(self.table, epoch)
        return out

    def _demux_merge(
        self, mapped: DataFrame, stats: dict, epoch: int, stage: bool = False
    ) -> dict:
        """Route the mapped batch into the per-domain destination
        tables (demux I — the reference's multi-output dispatch,
        CMS_SynPuf_ETL_CDM_v5.py:1228-1290, as exactly-once CDC sinks).

        ``stage=True`` (the multi-table write-audit-publish path) runs
        the identical routing + merge compute but STAGES each live
        domain's epoch (``LakeTable.stage_epoch``) instead of
        committing it, returning ``(skip_records, {domain:
        StagedEpoch})`` — nothing is reader-visible until the caller
        publishes.  Empty-epoch domains are skipped the same way in
        both modes (no staging handle, no version reservation).

        Shape decisions, all for the 10^10-event case:

        * A domain's UPSERT slice filters the already-persisted batch
          directly — the full payload (``content`` at ~KB/row) never
          shuffles through any routing join.
        * Tombstones are NARROW rows (key cols + lsn + op='D' only;
          payload normalizes to NULL inside merge_epoch): what fans
          out across domains is ~40 bytes/row, not the payload.
        * "targeted" (default) looks up each batch key's previous
          version from the pre-epoch main snapshot (bucket-pruned,
          key/domain/_lsn columns only, tombstones included) and
          routes only: (a) DEPARTURE tombstones — a fresh row whose
          key left a live previous domain tombstones that domain at
          the row's LSN; (b) STALE-CLAIM tombstones — a row older
          than the table's version (out-of-LSN-order delivery, e.g.
          file-source micro-batches) fabricates a tombstone into its
          CLAIMED domain at the previous version's (winning) LSN, so
          its own upsert loses the in-batch max-LSN resolution and a
          stale redelivery can never resurrect a key in a domain
          table.  Merge surface ~ batch + moves instead of
          n_domains × batch — and because the max-LSN merge is
          order-independent and every non-final cross-domain upsert
          is covered by a higher-LSN tombstone (from the row that
          overtook it, or from its own stale-claim), domain tables
          converge under ANY epoch application order, same as
          blanket.
        * "blanket" tombstones every batch key into every non-owning
          domain — the brute-force fallback (no snapshot lookup);
          also the only mode that tolerates dedup_mode="merge"
          (un-pre-deduped batches) in demux.
        * The n_domains merges are independent tables — they run on a
          thread pool so their (small) per-merge jobs overlap instead
          of serializing n_domains× the per-epoch job floor.
        * Every domain merge receives PRECOMPUTED stats (n_total /
          n_deletes / lsn range / changed buckets), derived from ONE
          narrow grouped job over the cached batch (plus one tiny job
          over the departures frame in targeted mode, which doubles as
          its eager cache materialization) — without this each of the
          n_domains merges runs its own stats job over the slice, and
          the per-epoch serial job count is what bounds scaling
          efficiency.
        """
        from concurrent.futures import ThreadPoolExecutor

        items = sorted(self.domain_tables.items())
        nbd = {t.n_buckets for _, t in items}
        assert len(nbd) == 1, f"domain tables disagree on n_buckets: {nbd}"
        bexpr = items[0][1].bucket_expr(KEY_COLS)

        # one narrow job: per-(domain, is-delete) counts/lsn/buckets.
        groups = (
            mapped.groupBy("domain", (F.col("op") == "D").alias("_isd"))
            .agg(
                F.count("*").alias("n"),
                F.min("lsn").alias("lo"),
                F.max("lsn").alias("hi"),
                F.collect_set(bexpr).alias("bks"),
            )
            .collect()
        )

        def _acc(rows):
            n = sum(r["n"] for r in rows)
            lo = min((r["lo"] for r in rows), default=None)
            hi = max((r["hi"] for r in rows), default=None)
            bks = sorted({b for r in rows for b in r["bks"]})
            return n, lo, hi, bks

        departures = None
        dep = {}
        if self.demux_tombstones == "targeted":
            changed = [int(b) for b in (stats["buckets"] or [])]
            prev = self.table.read_raw(bucket_ids=changed).select(
                *KEY_COLS,
                F.col("domain").alias("_prev_domain"),
                F.col("_lsn").alias("_prev_lsn"),
                F.col("_deleted").alias("_prev_del"),
            )
            # Small-batch regime (steady-state tail): the batch touches
            # a small fraction of the key space, but bucket pruning
            # stops helping once its keys spread over every bucket —
            # the lookup would shuffle the FULL table side.  A
            # broadcast LEFT-SEMI prefilter keeps the table side
            # scan-local (only batch keys survive the scan), leaving a
            # tiny shuffle.  prev rows whose key is absent from the
            # batch produce nothing in the left join, so the filter
            # never changes results.  Skipped for large batches (keys
            # too big to broadcast, and batch≈keyspace removes ~0).
            if 0 < int(stats["n_total"] or 0) <= self._LOOKUP_PREFILTER_MAX_ROWS:
                prev = prev.join(
                    F.broadcast(mapped.select(*KEY_COLS)), KEY_COLS, "leftsemi"
                )
            # SHUFFLE_HASH: both sides are narrow (key/domain/lsn);
            # the hash build avoids SMJ's per-partition sorts of both.
            keyinfo = mapped.select(*KEY_COLS, "lsn", "op", "domain").join(
                prev.hint("SHUFFLE_HASH"), KEY_COLS, "left"
            )
            fresh = F.col("_prev_lsn").isNull() | (
                F.col("lsn") >= F.col("_prev_lsn")
            )
            live_prev = F.col("_prev_domain").isNotNull() & ~F.coalesce(
                F.col("_prev_del"), F.lit(False)
            )
            # (a) fresh rows that LEFT a live previous domain.
            depart = keyinfo.where(
                fresh
                & live_prev
                & (
                    (F.col("op") == "D")
                    | F.col("domain").isNull()
                    | (F.col("domain") != F.col("_prev_domain"))
                )
            ).select(
                *KEY_COLS, "lsn", F.lit("D").alias("op"),
                F.col("_prev_domain").alias("_tomb_domain"),
            )
            # (b) stale rows (older than the table's version) whose
            # claimed domain would otherwise gain a zombie row: a
            # tombstone at the WINNING lsn outranks the stale upsert
            # inside the same merge batch.
            stale = keyinfo.where(
                ~fresh
                & (F.col("op") != "D")
                & F.col("domain").isin(list(self.domain_tables))
                & (
                    F.coalesce(F.col("_prev_del"), F.lit(False))
                    | (F.col("domain") != F.col("_prev_domain"))
                )
            ).select(
                *KEY_COLS, F.col("_prev_lsn").alias("lsn"),
                F.lit("D").alias("op"), F.col("domain").alias("_tomb_domain"),
            )
            departures = depart.unionByName(stale).persist()
            # tiny job; also materializes the cache BEFORE the merge
            # threads fan out (a lazy persist would be raced by
            # n_domains threads, each recomputing the lookup join).
            dep = {
                r["_tomb_domain"]: r
                for r in departures.groupBy("_tomb_domain")
                .agg(
                    F.count("*").alias("n"),
                    F.min("lsn").alias("lo"),
                    F.max("lsn").alias("hi"),
                    F.collect_set(bexpr).alias("bks"),
                )
                .collect()
            }

        def _stats_for(d: str) -> dict:
            mine_up = [r for r in groups if r["domain"] == d and not r["_isd"]]
            if departures is not None:
                tomb = [dep[d]] if d in dep else []
            else:
                tomb = [r for r in groups if not (r["domain"] == d and not r["_isd"])]
            n_up, _, _, _ = _acc(mine_up)
            n_tomb, _, _, _ = _acc(tomb)
            _, lo, hi, bks = _acc(mine_up + tomb)
            return {
                "n_total": n_up + n_tomb,
                "n_deletes": n_tomb,
                "lsn_lo": lo,
                "lsn_hi": hi,
                "changed_buckets": bks,
            }

        def _slice(d: str) -> DataFrame:
            owns = (F.col("domain") == d) & (F.col("op") != "D")
            upserts = mapped.where(owns)
            if departures is not None:
                tombs = departures.where(F.col("_tomb_domain") == d).drop(
                    "_tomb_domain"
                )
            else:
                tombs = mapped.where(~owns).select(
                    *KEY_COLS, "lsn", F.lit("D").alias("op")
                )
            return upserts.unionByName(tombs, allowMissingColumns=True)

        # MERGE FLOOR: a domain with zero upserts AND zero tombstones
        # this epoch is skipped ENTIRELY — no merge job, no manifest
        # commit, no version bump (its table provably gains no
        # snapshot; at small batches the per-merge fixed cost across
        # untouched domains is what made targeted mode tie blanket).
        # Replay stays exactly-once: the slice is deterministic, so a
        # re-offered epoch skips the same domains again, and the main
        # table's commit (written last) is the epoch's completion
        # marker.
        dom_stats = {d: _stats_for(d) for d, _ in items}
        recs = {
            d: {
                "epoch": epoch,
                "skipped_empty_epoch": True,
                "rows_upserted": 0,
                "rows_deleted": 0,
            }
            for d, _ in items
            if not dom_stats[d]["n_total"]
        }
        live = [(d, t) for d, t in items if dom_stats[d]["n_total"]]
        try:
            staged: dict = {}
            if live:
                with ThreadPoolExecutor(max_workers=len(live)) as pool:
                    futs = {
                        d: pool.submit(
                            t.stage_epoch if stage else t.merge_epoch,
                            _slice(d),
                            epoch,
                            stats=dom_stats[d],
                            # MoR sinks: read-time per-key resolution
                            # subsumes the batch-local reduction, so the
                            # per-domain SortAggregate is skipped and each
                            # merge is a pure repartition+write.
                            skip_batch_dedup=(t.merge_mode == "mor"),
                        )
                        for d, t in live
                    }
                    if stage:
                        staged = {d: f.result() for d, f in futs.items()}
                    else:
                        recs.update({d: f.result() for d, f in futs.items()})
            return (recs, staged) if stage else recs
        finally:
            if departures is not None:
                departures.unpersist()

    def run(
        self,
        changes: DataFrame,
        n_epochs: int = 4,
        start_epoch: int | None = None,
        staging_dir: str | None = None,
    ) -> list[dict]:
        """Batch mode: split the changelog into ``n_epochs`` contiguous
        LSN ranges and apply them in order.  ``start_epoch`` simulates
        resuming from a checkpoint (earlier epochs are re-offered and
        skipped by the idempotent merge).

        ``staging_dir`` enables epoch-partitioned staging: the
        changelog is written once partitioned by epoch id, and each
        epoch reads its partition directory.  Two wins at scale:
        (a) exact partition pruning instead of an lsn-range filter
        over the full changelog per epoch, and (b) every epoch's plan
        is literal-identical, so whole-stage codegen compiles once
        instead of per-epoch (changing lsn literals defeat the
        codegen cache)."""
        meta = None
        if staging_dir is not None:
            meta = self.stage(changes, staging_dir, n_epochs=n_epochs)
            if meta is None:
                return []
        return self.run_staged(
            changes,
            n_epochs=n_epochs,
            start_epoch=start_epoch,
            staging_dir=staging_dir,
            meta=meta,
        )

    def _epoch_ids(self, changes: DataFrame, lo: int, width: int):
        """The slicer's ``_epoch`` expression source: returns
        ``changes`` with an ``_epoch`` int column.

        Plain mode: ``floor((lsn - lo) / width)`` — contiguous LSN
        ranges.  With ``txn_col`` (see __init__): commit-LSN
        assignment, ``floor((max(lsn) over txn - lo) / width)`` — one
        window over the transaction id, so a source transaction's rows
        always share an epoch.  NULL transaction ids slice by their
        own LSN via per-row SINGLETON window partitions (a "\\x00row:"
        synthetic key — the NUL byte keeps it outside any real id
        alphabet): same result as plain mode for those rows, and the
        shuffle stays skew-free instead of funneling every
        non-transactional row into one giant NULL partition."""
        if self.txn_col is None:
            return changes.withColumn(
                "_epoch",
                F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width)).cast("int"),
            )
        if self.txn_col not in changes.columns:
            # fail with a configuration error here, not an opaque
            # AnalysisException inside the window/scan later (r5
            # ADVICE).
            raise ValueError(
                f"txn_col {self.txn_col!r} not found in the changelog "
                f"(columns: {changes.columns})"
            )
        from pyspark.sql import Window

        part = F.coalesce(
            F.col(self.txn_col).cast("string"),
            F.concat(F.lit("\x00row:"), F.col("lsn").cast("string")),
        )
        commit_lsn = F.max("lsn").over(Window.partitionBy(part))
        return changes.withColumn(
            "_epoch",
            F.floor((commit_lsn - F.lit(lo)) / F.lit(width)).cast("int"),
        )

    def stage(self, changes: DataFrame, staging_dir: str, n_epochs: int = 4) -> dict | None:
        """PRODUCER-side half of the staged protocol: write the
        changelog once, partitioned by epoch id, and pre-extract the
        (tiny) schema-event list.  Returns the epoch metadata to hand
        to ``run_staged``.  Separated from the tail so the staging
        write — producer work, paid once and amortized over every
        consumer and replay, exactly like ``stage_changelog_bucketed``
        — can be measured (and billed) apart from ingest."""
        bounds = changes.agg(F.min("lsn"), F.max("lsn")).first()
        lo, hi = bounds[0], bounds[1]
        if lo is None:
            return None
        width = max(1, (hi - lo + 1 + n_epochs - 1) // n_epochs)
        (
            self._epoch_ids(changes, lo, width)
            .write.mode("overwrite")
            .partitionBy("_epoch")
            .parquet(staging_dir)
        )
        return {
            "lo": lo,
            "hi": hi,
            "width": width,
            "schema_events": self._collect_schema_events(changes),
        }

    def run_staged(
        self,
        changes: DataFrame | None = None,
        n_epochs: int = 4,
        start_epoch: int | None = None,
        staging_dir: str | None = None,
        meta: dict | None = None,
    ) -> list[dict]:
        """CONSUMER-side tail: the epoch loop only.  With
        ``staging_dir`` + ``meta`` (from ``stage``) each epoch is an
        exact partition-directory read; otherwise epochs filter
        ``changes`` by LSN range."""
        self.init_tables()
        if meta is None:
            if changes is None:
                raise ValueError("run_staged needs either meta or changes")
            bounds = changes.agg(F.min("lsn"), F.max("lsn")).first()
            lo, hi = bounds[0], bounds[1]
            if lo is None:
                return []
            width = max(1, (hi - lo + 1 + n_epochs - 1) // n_epochs)
            all_schema_events = self._collect_schema_events(changes)
        else:
            lo, hi, width = meta["lo"], meta["hi"], meta["width"]
            all_schema_events = meta["schema_events"]
        results = []
        first = start_epoch if start_epoch is not None else 0
        # txn_col + no staging: materialize the commit-LSN epoch
        # assignment ONCE (one window shuffle) instead of per epoch.
        assigned = (
            self._epoch_ids(changes, lo, width).persist()
            if self.txn_col is not None and staging_dir is None and changes is not None
            else None
        )
        try:
            results = self._epoch_loop(
                changes, n_epochs, first, lo, hi, width,
                staging_dir, assigned, all_schema_events,
            )
        finally:
            if assigned is not None:
                assigned.unpersist()
        return results

    def _epoch_loop(
        self, changes, n_epochs, first, lo, hi, width,
        staging_dir, assigned, all_schema_events,
    ) -> list[dict]:
        results = []
        for e in range(first, n_epochs):
            epoch_lo = lo + e * width
            epoch_hi = min(hi, epoch_lo + width - 1)
            if epoch_lo > hi:
                break
            if staging_dir is not None:
                part = os.path.join(staging_dir, f"_epoch={e}")
                if not os.path.exists(part):
                    continue
                batch = self.spark.read.parquet(part)
            elif assigned is not None:
                batch = assigned.where(F.col("_epoch") == e).drop("_epoch")
            else:
                batch = changes.where(
                    (F.col("lsn") >= epoch_lo) & (F.col("lsn") <= epoch_hi)
                )
            if self.txn_col is not None and self.txn_col in batch.columns:
                # the id did its slicing job; keep it out of the
                # mapped/merged payload schema.
                batch = batch.drop(self.txn_col)
            ev = (
                None
                if all_schema_events is None
                else [t for t in all_schema_events if epoch_lo <= t[0] <= epoch_hi]
            )
            results.append(self.process_epoch(batch, e, schema_events=ev))
        return results

    def _collect_schema_events(self, changes: DataFrame) -> list | None:
        """One job for the whole changelog instead of one per epoch
        (schema events are rare and tiny; the per-epoch scan was pure
        serial-floor overhead)."""
        if "schema_change" not in changes.columns:
            return None
        return [
            (r["lsn"], r["schema_change"])
            for r in changes.where(F.col("op") == "SCHEMA")
            .select("lsn", "schema_change")
            .collect()
        ]

    def run_from_table(self, table_name: str) -> list[dict]:
        """Batch mode over a PRODUCER-BUCKETED changelog table (see
        ``stage_changelog_bucketed``): each epoch reads one `_epoch`
        partition of a table bucketed on (repo, path), so the max-LSN
        dedup aggregation inherits the table's hash distribution and
        runs with NO Exchange — the per-epoch shuffle that bounded
        round-1 scaling efficiency disappears from the plan
        (asserted in tests/test_plans.py).  At 10^10 events this is
        the difference between shuffling the batch payload once per
        epoch and never shuffling it at all before the merge."""
        if self.txn_col is not None:
            # the table's _epoch partitions were assigned at
            # stage_changelog_bucketed time by plain LSN ranges;
            # silently running them would void the advertised
            # transaction atomicity.
            raise ValueError(
                "txn_col is not supported with run_from_table: the "
                "bucketed table's _epoch partitions are pre-assigned "
                "by plain LSN ranges — use run()/run_staged(), whose "
                "slicer owns the epoch assignment"
            )
        self.init_tables()
        tbl = self.spark.table(table_name)
        epochs = [r["_epoch"] for r in tbl.select("_epoch").distinct().collect()]
        sev: dict[int, list] = {}
        if "schema_change" in tbl.columns:
            for r in (
                tbl.where(F.col("op") == "SCHEMA")
                .select("_epoch", "lsn", "schema_change")
                .collect()
            ):
                sev.setdefault(int(r["_epoch"]), []).append((r["lsn"], r["schema_change"]))
        results = []
        for e in sorted(epochs):
            batch = tbl.where(F.col("_epoch") == e).drop("_epoch")
            results.append(
                self.process_epoch(batch, int(e), schema_events=sev.get(int(e), []))
            )
        return results

    # ---------------- read side ----------------

    def current_state(self) -> DataFrame:
        return self.table.read()

    def domain_state(self, domain: str) -> DataFrame:
        """Current snapshot of one domain's destination table
        (``demux_domains=True`` mode)."""
        return self.domain_tables[domain].read()

    def read_consistent(self, epoch: int | None = None) -> dict[str, DataFrame]:
        """One atomic cut across ALL the pipeline's sinks: the main
        table and every demux domain table, each pinned (``read_at``)
        at the snapshot version recording its state after source
        epochs <= ``epoch`` (``LakeTable.version_at_epoch``).  Within
        an epoch the domain sinks merge BEFORE the main table, so the
        main commit is the epoch's completion marker — defaulting
        ``epoch`` to the main table's newest committed source epoch
        means a crash (or in-flight merge) that tore a LATER epoch
        across some sinks is invisible: the torn sinks are simply
        read one version earlier.  This is the multi-table snapshot
        isolation Iceberg needs a transactional catalog for,
        recovered here from the shared epoch ids alone.  Returns
        ``{"main": df, "<domain>": df, ...}``; readers needing the
        routed union take ``unionByName`` over the domain entries.
        Versions inside the vacuum horizon only — an expired boundary
        fails loud in ``read_at``."""
        if epoch is None:
            src = [e for e in self.table.committed_epochs() if e >= 0]
            if not src:
                raise ValueError("no committed source epochs to align on")
            epoch = max(src)
        out = {"main": self.table.read_at(self.table.version_at_epoch(epoch))}
        for d, t in sorted(getattr(self, "domain_tables", {}).items()):
            out[d] = t.read_at(t.version_at_epoch(epoch))
        return out

    def quarantine(self) -> DataFrame:
        return self.spark.read.parquet(self.quarantine_dir)

    def reprocess_quarantine(self, source_epoch: int, repair_epoch: int) -> dict:
        """Repair flow: re-offer one quarantined epoch slice through
        the full pipeline after the concept dictionary gained the
        missing entries (construct the pipeline with
        ``extra_mappings``).

        The reference's unmapped_code_log is write-only — rows lost
        to a vocabulary gap stay lost until a full re-run.  Here the
        quarantined rows keep their ORIGINAL LSNs, so re-offering
        them as a fresh (exactly-once) epoch converges correctly
        against everything that happened since: the original epoch
        tombstoned the unmapped key at LSN L, the repair's upsert at
        the same L wins the merge tie (batch beats table at equal
        LSN: CoW's explicit ">=" rule; MoR's (_lsn, _write_version)
        read resolution), and any LATER source update at L' > L still
        outranks the repaired row.  Rows whose lang is STILL unmapped
        simply re-quarantine under ``repair_epoch``.

        ``repair_epoch`` must be NEGATIVE: repair epochs share the
        per-table idempotency keyspace with source epoch ids and
        streaming batch ids (both assigned upward from 0), so a
        caller-chosen positive id could later collide with a real
        batch — whose merge would then be silently skipped as a
        duplicate epoch (round-4 ADVICE).  Negative ids are a
        reserved namespace no source path ever mints.  Repairs also
        never advance the source checkpoint (their rows carry OLD
        LSNs; overwriting the cursor with them would rewind the
        source tail)."""
        if repair_epoch >= 0:
            raise ValueError(
                "repair_epoch must be negative (reserved repair "
                "namespace): non-negative epoch ids belong to source "
                f"batches and streaming micro-batches, got {repair_epoch}"
            )
        if repair_epoch == BOOTSTRAP_EPOCH:
            raise ValueError(
                "repair_epoch collides with the reserved BOOTSTRAP_EPOCH"
            )
        qdir = os.path.join(self.quarantine_dir, f"epoch={source_epoch}")
        rows = self.spark.read.parquet(qdir)
        # strip bookkeeping + previously-derived mapping columns: the
        # repair re-derives them under the current dictionary.
        drop = [
            c
            for c in ("epoch", "_quar", "concept_id", "domain", "content_sha")
            if c in rows.columns
        ]
        return self.process_epoch(rows.drop(*drop), repair_epoch, is_repair=True)


def stage_changelog_bucketed(
    spark: SparkSession,
    changes: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    n_epochs: int = 4,
) -> str:
    """Producer-side staging: write the changelog as an epoch-
    partitioned, (repo, path)-bucketed table.

    This is the round-2 answer to the dedup Exchange: measured in
    round 1, bucketing INSIDE the ingest pipeline is a net loss (the
    bucketed write costs more than the dedup shuffle it saves), but a
    changelog that arrives bucketed at rest — the producer pays the
    bucketing once, amortized across every consumer and replay — lets
    every epoch's groupBy(repo, path) run Exchange-free.  ``_epoch``
    partitioning additionally gives exact partition pruning and
    literal-identical per-epoch plans (one codegen compile).

    Returns the table name.  NOTE: Spark only preserves bucket
    metadata through ``saveAsTable`` (a path write loses it), so the
    consumer must read via ``spark.table``/``run_from_table``.
    """
    bounds = changes.agg(F.min("lsn"), F.max("lsn")).first()
    lo, hi = bounds[0], bounds[1]
    if lo is None:
        raise ValueError("stage_changelog_bucketed: empty changelog (no lsn values)")
    width = max(1, (hi - lo + 1 + n_epochs - 1) // n_epochs)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        changes.withColumn(
            "_epoch", F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("_epoch")
        .bucketBy(n_buckets, "repo", "path")
        .sortBy("repo", "path")
        .saveAsTable(table_name)
    )
    return table_name
