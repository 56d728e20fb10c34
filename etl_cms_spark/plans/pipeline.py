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

from etl_cms_spark.operators.dedup import latest_by_lsn_window
from etl_cms_spark.operators.skew import salted_latest_by_lsn
from etl_cms_spark.plans.mapping import map_concepts_join, map_concepts_udf
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


class CDCPipeline:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 32,
        salt_hot_keys: bool = False,
        mapper: str = "udf",
        dedup_mode: str = "strict",
        merge_mode: str = "cow",
        compact_every: int | None = None,
        compact_depth: int | None = None,
        demux_domains: bool = False,
        demux_tombstones: str = "blanket",
        detailed_lineage: bool = False,
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
        * "merge" — no pre-dedup; the lake merge's per-key reduction
          subsumes it (one fewer shuffle; only wins when the update
          ratio is near 1 version/key).  Quarantine then logs every
          unmapped event occurrence, like the reference's append log.
        * "salted" — two-phase salted dedup for pathological hot keys.

        ``demux_domains=True`` routes each mapped row into a
        PER-DOMAIN destination LakeTable (the reference's multi-output
        dispatch to per-CDM-table files, CMS_SynPuf_ETL_CDM_v5.py
        :1228-1290, as exactly-once CDC sinks).  Cross-domain moves
        are handled by DELETE FAN-OUT: every upsert into its own
        domain's table is mirrored as a tombstone into every other
        domain's table, so a key whose latest version changed domain
        disappears from the old table on any replay order.  Cost: the
        merge work multiplies by n_domains (each table sees the full
        batch's keys); tombstones for never-present keys are expired
        by compact(expire_tombstones=True) after the replay horizon.
        At scale, prefer this only when domain count is small (the
        reference has 6).

        ``demux_tombstones`` picks the fan-out strategy:
        * "blanket" (default) — every non-owning domain receives a
          tombstone for every batch key; converges under ANY epoch
          application order.  Merge surface: n_domains x batch.
        * "targeted" — the batch keys' previous domains are looked up
          from the main table (bucket-pruned read of the pre-epoch
          snapshot) and a domain receives only its own upserts plus
          tombstones for keys that actually LEFT it.  Merge surface:
          ~batch + moves.  Requires in-order epoch application (all
          engine runners apply in order; committed epochs replay as
          no-ops either way)."""
        self.spark = spark
        self.root = root
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
            self.domain_tables = {
                d: LakeTable(
                    spark,
                    os.path.join(root, "tables", f"files_{d}"),
                    n_buckets,
                    merge_mode=merge_mode,
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
        self.quarantine_dir = os.path.join(root, "quarantine")
        self.checkpoint_path = os.path.join(root, "_checkpoint.json")
        self.salt_hot_keys = salt_hot_keys
        self.mapper = mapper
        self.dedup_mode = "salted" if salt_hot_keys else dedup_mode
        # per-PARTITION lineage (north rule): record per-bucket rows
        # applied/deleted + LSN range each epoch.  One extra hash agg
        # per epoch over the cached batch (output = n_buckets rows),
        # so it's off by default on the hot path.
        self.detailed_lineage = detailed_lineage
        self.metrics: list[dict[str, Any]] = []

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
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_epoch": epoch, "lsn_hi": lsn_hi}, f)
        os.replace(tmp, self.checkpoint_path)

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
    ) -> dict:
        """Apply one change batch.  Idempotent per epoch.

        ``schema_events`` (list of (lsn, schema_change-json) tuples)
        lets a batch driver pre-extract ALL schema events in one job
        for the whole changelog instead of one collect job per epoch —
        the per-epoch serial job count is what bounds scaling
        efficiency at high parallelism.  None = scan this batch."""
        committed = {str(e) for e in self.table.committed_epochs()}
        if self.demux_domains:
            # a crash between per-table commits leaves the epoch
            # partially applied — only skip when EVERY table has it
            # (each individual merge is idempotent anyway).
            for t in self.domain_tables.values():
                committed &= {str(e) for e in t.committed_epochs()}
        if str(epoch) in committed:
            rec = {"epoch": epoch, "skipped_duplicate_epoch": True}
            self.metrics.append(rec)
            return rec

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
        if self.dedup_mode == "strict":
            latest = latest_by_lsn_window(data, KEY_COLS, "lsn")
        elif self.dedup_mode == "salted":
            latest = salted_latest_by_lsn(data, KEY_COLS, "lsn")
        else:  # "merge": the lake merge's per-key reduction dedups.
            latest = data

        # 3. broadcast-dict concept mapping (Arrow UDF — no per-row Python).
        #    Persisted: the epoch re-reads this batch (quarantine,
        #    merge) — without the cache the dedup shuffle + UDF would
        #    re-execute per job.
        map_fn = map_concepts_udf if self.mapper == "udf" else map_concepts_join
        mapped = map_fn(self.spark, latest).persist()
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
            if self.demux_domains:
                dom_recs = {}
                if self.demux_tombstones == "targeted":
                    # tombstone ONLY real moves: look up each batch
                    # key's previous domain from the main table
                    # (bucket-pruned to the batch's buckets) and
                    # delete from that domain iff the key left it.
                    # Merge surface ~ batch + moves, not
                    # n_domains x batch.  Requires in-order epoch
                    # application (run()/streaming always are);
                    # "blanket" remains the arbitrary-order-safe mode.
                    changed = [int(b) for b in (stats["buckets"] or [])]
                    prev = self.table.read(bucket_ids=changed).select(
                        *KEY_COLS, F.col("domain").alias("_prev_domain")
                    )
                    joined = mapped.join(prev, KEY_COLS, "left").persist()
                    try:
                        for d, t in sorted(self.domain_tables.items()):
                            is_mine = (F.col("domain") == d) & (F.col("op") != "D")
                            was_mine = F.col("_prev_domain") == d
                            slice_d = (
                                joined.where(is_mine | was_mine)
                                .withColumn(
                                    "op",
                                    F.when(is_mine, F.col("op")).otherwise(F.lit("D")),
                                )
                                .drop("_prev_domain")
                            )
                            dom_recs[d] = t.merge_epoch(slice_d, epoch)
                    finally:
                        joined.unpersist()
                else:
                    # blanket delete fan-out: upsert into the row's own
                    # domain, tombstone into every other — cross-domain
                    # moves converge under ANY replay order.
                    for d, t in sorted(self.domain_tables.items()):
                        slice_d = mapped.withColumn(
                            "op",
                            F.when(
                                (F.col("domain") == d) & (F.col("op") != "D"),
                                F.col("op"),
                            ).otherwise(F.lit("D")),
                        )
                        dom_recs[d] = t.merge_epoch(slice_d, epoch)

            # 5b. exactly-once main merge with lineage.
            rec = self.table.merge_epoch(
                updates.drop("_quar"),
                epoch,
                extra_lineage=extra,
                stats={
                    "n_total": int(stats["n_total"] or 0),
                    "n_deletes": int(stats["n_deletes"] or 0),
                    "lsn_lo": stats["lsn_lo"],
                    "lsn_hi": stats["lsn_hi"],
                    "changed_buckets": sorted(stats["buckets"] or []),
                },
            )
            if dom_recs is not None:
                rec["domains"] = dom_recs
        finally:
            mapped.unpersist()
        if self.table.merge_mode == "mor" and (
            (self.compact_every and (epoch + 1) % self.compact_every == 0)
            or (self.compact_depth and self.table.max_delta_depth() > self.compact_depth)
        ):
            rec["compaction"] = self.table.compact()
            # domain tables accrue a full-batch delete fan-out every
            # epoch (tombstones into every non-owning domain) — left
            # uncompacted their delta depth grows without bound, so the
            # same trigger compacts them too.
            if self.demux_domains:
                rec["domain_compactions"] = {
                    d: t.compact() for d, t in sorted(self.domain_tables.items())
                    if t.merge_mode == "mor"
                }
        self._save_checkpoint(epoch, rec.get("lsn_max"))
        self.metrics.append(rec)
        return rec

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
            changes.withColumn(
                "_epoch", F.floor((F.col("lsn") - F.lit(lo)) / F.lit(width)).cast("int")
            )
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
            else:
                batch = changes.where(
                    (F.col("lsn") >= epoch_lo) & (F.col("lsn") <= epoch_hi)
                )
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

    def quarantine(self) -> DataFrame:
        return self.spark.read.parquet(self.quarantine_dir)


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
