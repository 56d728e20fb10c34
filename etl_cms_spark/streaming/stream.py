"""Structured Streaming front-end (SURVEY.md §2.L).

The batch ``CDCPipeline.process_epoch`` IS the streaming sink body:
``foreachBatch`` hands each micro-batch (with its monotone batch id)
to the same code path, so exactly-once and lineage semantics are
identical in both modes — the manifest's epoch key is the stream's
batch id, and Spark's checkpointLocation replays unacknowledged
batches with the same id, which the idempotent merge then skips.

Watermarked dedup: ``dropDuplicatesWithinWatermark`` bounds the
in-flight dedup state for *within-stream* duplicate (lsn,key) pairs;
cross-batch duplicates are handled by max-LSN merge in the sink (no
unbounded state anywhere — the reference's unbounded
visit_occurrence_ids dict, CMS_SynPuf_ETL_CDM_v5.py:146, is the
anti-pattern this replaces).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_cms_spark.plans.pipeline import CDCPipeline

CHANGELOG_SCHEMA = (
    "lsn long, op string, ts timestamp, repo string, path string, "
    "commit string, lang string, content string, schema_change string"
)

# Debezium-style wire shape of the same changelog (see
# sources/envelopes.py): op c/r/u/d, before/after row images, the log
# position under source.lsn.  ``start_stream(envelope_format=
# "debezium")`` tails this shape directly.
ENVELOPE_SCHEMA = (
    "op string, "
    "before struct<repo:string,path:string,commit:string,lang:string,content:string>, "
    "after struct<repo:string,path:string,commit:string,lang:string,content:string>, "
    "source struct<lsn:bigint>, ts timestamp"
)


def start_stream(
    spark: SparkSession,
    changelog_dir: str | None,
    lake_root: str,
    checkpoint_dir: str | None = None,
    source_table: "str | list[str] | None" = None,
    watermark: str = "24 hours",
    max_files_per_trigger: int = 4,
    salt_hot_keys: bool = False,
    n_buckets: int = 32,
    merge_mode: str = "cow",
    demux_domains: bool = False,
    sidecars: list | None = None,
    dedup_filter_index: "object | None" = None,
    row_image: str = "full",
    epoch_audit: "object | None" = None,
    compact_depth: int | None = None,
    vacuum_every: int | None = None,
    vacuum_keep_last: int = 8,
    max_versions_per_batch: int | None = None,
    consumer_id: str | None = None,
    processing_time: str | None = None,
    envelope_format: str = "flat",
    on_key_change: str = "split",
    txn_col: str | None = None,
    txn_total_col: str = "txn_total",
    txn_flush_lsn_lag: int | None = None,
) -> tuple[StreamingQuery, CDCPipeline]:
    """Tail a changelog directory (file source — swap for Kafka/
    binlog reader by changing only this readStream) and upsert each
    micro-batch through the batch pipeline.

    ``watermark`` must be >= the source's maximum event-time disorder:
    rows older than (max seen ts - watermark) are dropped as late by
    the stateful dedup.  A file source replaying history delivers
    files in arbitrary order, so the default is wide; a live tail with
    bounded lag can tighten it to bound dedup state.

    ``source_table`` (instead of ``changelog_dir``) CHAINS pipelines:
    the changelog is another MoR LakeTable's own commit history,
    tailed through the ``lake_changelog`` streaming source
    (sources/lakestream.py) — the multi-hop bronze→silver shape.  The
    lake source's delivery is exactly-once by construction (offsets =
    committed snapshot versions, deterministic content), and each
    epoch's batch is already one row per (key, lsn), so the
    watermarked duplicate-drop stage is skipped; if the upstream
    schema carries ``ts``, the observe() metrics still report the
    batch's event-time reach.

    ``envelope_format="debezium"`` tails a WIRE-FORMAT changelog
    directory (ENVELOPE_SCHEMA: op c/r/u/d + before/after images +
    source.lsn — what a Debezium/connect sink actually lands) and
    flattens it in-stream through ``sources.envelopes.from_debezium``
    before the watermark stage; key-changing updates split per
    ``on_key_change`` (default ``"split"``), so a WAL tail needs no
    pre-flattening batch job.  The stateful duplicate-drop then keys
    on the flattened (lsn, repo, path) — a split pair shares its LSN
    but not its key, so both halves survive.

    ``txn_col`` — STREAMING transaction-boundary gate (the micro-batch
    analogue of ``CDCPipeline(txn_col=...)`` batch slicing): a
    micro-batch cut can land mid-transaction, so each batch applies
    only COMPLETE transactions and carries the incomplete tail into
    the next batch.  Completion comes from ``txn_total_col`` (int):
    the transaction's total event count, which is exactly what
    Debezium's transaction-metadata END events publish per data
    collection — a txn is complete once all its rows have arrived.
    Rows with NULL txn id (or NULL total) pass straight through.
    Carried rows live under ``<checkpoint>/_txn_pending/batch=<id>``
    (pending state AFTER that batch) — per-batch, overwrite-idempotent
    and derived only from the checkpointed source offsets, so a
    replayed micro-batch recomputes the identical gate decision and
    the sink's exactly-once contract is untouched; state resets with
    the checkpoint, as stream progress should.  A deferred
    transaction's rows apply in a LATER epoch than higher-LSN rows of
    completed transactions — the standard out-of-order-delivery case
    the max-LSN merge and tombstones already resolve (refused for
    ``row_image="minimal"``, whose per-column fold requires in-order
    application).  ``txn_flush_lsn_lag`` bounds pending state: a
    transaction whose newest row lags the stream head by more than
    this many LSNs is force-flushed incomplete (a lost tail
    otherwise pends forever — surface, don't stall)."""
    if (changelog_dir is None) == (source_table is None):
        raise ValueError("pass exactly one of changelog_dir / source_table")
    if envelope_format not in ("flat", "debezium"):
        raise ValueError(f"envelope_format must be flat|debezium, got {envelope_format!r}")
    if envelope_format != "flat" and source_table is not None:
        raise ValueError("envelope_format applies to changelog_dir tailing only")
    if max_versions_per_batch is not None and source_table is None:
        raise ValueError("max_versions_per_batch applies to source_table chaining only")
    if txn_col is not None:
        if source_table is not None:
            raise ValueError(
                "txn_col applies to changelog tailing only: a chained "
                "lake source replays whole committed epochs, whose "
                "transactions the upstream pipeline already resolved"
            )
        if envelope_format != "flat":
            raise ValueError(
                "txn_col needs the flat changelog shape (Debezium "
                "transaction metadata is a separate stream; flatten and "
                "join it upstream, then tail the flat form)"
            )
        if row_image == "minimal":
            raise ValueError(
                "txn_col defers transactions across micro-batches — "
                "out-of-order application, which row_image='minimal' "
                "per-column folding cannot accept"
            )
    if max_versions_per_batch is not None and processing_time is None:
        # the Python lake source runs AvailableNow as a SINGLE batch
        # (see sources/lakestream.py): a cap would stop the drain after
        # the first capped batch and silently strand the backlog.
        raise ValueError(
            "max_versions_per_batch needs a processing_time trigger "
            "(e.g. '10 seconds'): the default available-now run is a "
            "single batch, which a cap would truncate"
        )
    # n_buckets/merge_mode only apply when the lake table is created
    # here; reopening an existing table takes n_buckets from its
    # manifest (LakeTable guards the mismatch).
    pipeline = CDCPipeline(
        spark,
        lake_root,
        n_buckets=n_buckets,
        salt_hot_keys=salt_hot_keys,
        merge_mode=merge_mode,
        demux_domains=demux_domains,
        sidecars=sidecars,
        # enforcement, not just upkeep: with a filter index, each
        # micro-batch's near-duplicate NEW docs are routed to the
        # duplicates/ log exactly as in batch mode (the pipeline adds
        # the index to its sidecars itself).
        dedup_filter_index=dedup_filter_index,
        # partial-column feeds (binlog row_image=MINIMAL): each
        # micro-batch folds per-column latest values and hydrates
        # against the table — streaming applies batches in id order,
        # satisfying the mode's in-order contract.
        row_image=row_image,
        # write-audit-publish gate per MICRO-BATCH: a rejected batch
        # quarantines whole and the stream keeps flowing (the
        # checkpoint advances past it; repair is out-of-band).
        epoch_audit=epoch_audit,
        # a STREAM is the sustained case: unmaintained, MoR depth and
        # snapshot history grow one step per micro-batch, forever.
        # compact_depth folds hot buckets selectively; vacuum_every
        # bounds storage (size vacuum_keep_last past the slowest
        # downstream changelog consumer's lag).
        compact_depth=compact_depth,
        vacuum_every=vacuum_every,
        vacuum_keep_last=vacuum_keep_last,
    )
    pipeline.init_tables()
    if sidecars or dedup_filter_index is not None:
        # the streaming checkpoint never re-delivers committed
        # micro-batches, so a sidecar that lags the table (attached
        # later, or crashed between a commit and its sync) back-fills
        # here before new batches flow.
        pipeline.catch_up_sidecars()

    from pyspark.sql import functions as F

    if source_table is not None:
        from etl_cms_spark.sources.lakestream import register

        register(spark)
        # FAN-IN: a list of table roots unions N upstream shards into
        # one silver pipeline — Spark checkpoints offsets PER SOURCE,
        # so each shard resumes independently and exactly-once.
        # Correctness contract: either the shards hold disjoint key
        # ranges (the usual sharding), or their LSNs share one global
        # domain so cross-shard latest-wins is meaningful.
        roots = (
            [source_table] if isinstance(source_table, str) else list(source_table)
        )
        def _shard(i, r):
            reader = spark.readStream.format("lake_changelog").option("path", r)
            if max_versions_per_batch is not None:
                # Kafka-style admission control on the chained source:
                # a silver pipeline attached to a deep bronze backlog
                # drains it in bounded, checkpointed steps.  Fan-in
                # shards get per-shard pacing files (suffix = shard
                # index) under each upstream's _consumers/.
                reader = reader.option("maxVersionsPerBatch", max_versions_per_batch)
                reader = reader.option(
                    "consumerId", f"{consumer_id or 'silver'}-{i}"
                )
            return reader.load()

        shards = [_shard(i, r) for i, r in enumerate(roots)]
        stream = shards[0]
        for s in shards[1:]:
            stream = stream.unionByName(s)
        if "ts" not in stream.columns:
            stream = stream.withColumn("ts", F.lit(None).cast("timestamp"))
    elif envelope_format == "debezium":
        from etl_cms_spark.sources.envelopes import from_debezium

        raw = (
            spark.readStream.schema(ENVELOPE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(changelog_dir)
        )
        stream = (
            from_debezium(
                raw,
                ["repo", "path"],
                on_key_change=on_key_change,
                passthrough_cols=["ts"],
            )
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["lsn", "repo", "path"])
        )
    else:
        schema = CHANGELOG_SCHEMA
        if txn_col is not None:
            schema = f"{schema}, {txn_col} string, {txn_total_col} int"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(changelog_dir)
            .withWatermark("ts", watermark)
            # bound within-stream duplicate state by event time.
            .dropDuplicatesWithinWatermark(["lsn", "repo", "path"])
        )
    # per-batch ingest metrics surfaced in query.lastProgress
    # ["observedMetrics"]["ingest"]: rows that SURVIVED the
    # watermarked dedup + their lsn/event-time range.  Late rows
    # dropped by the watermark are the gap vs the source count —
    # the reference's records_read/records_written bookkeeping
    # (FileControl.py:255-259), stream-side.  The micro-batch is
    # persisted inside apply_batch, so these fire once per batch
    # (an uncached foreachBatch frame re-evaluates per action);
    # ``late_data_stats`` pairs them with the watermark-drop
    # counter, and the sink's lineage has exact applied counts.
    stream = stream.observe(
        "ingest",
        F.count(F.lit(1)).alias("rows_after_dedup"),
        F.min("lsn").alias("lsn_min"),
        F.max("lsn").alias("lsn_max"),
        F.max("ts").alias("max_event_time"),
    )

    ckpt = checkpoint_dir or os.path.join(lake_root, "_stream_checkpoint")
    txn_state_dir = os.path.join(ckpt, "_txn_pending")

    def apply_batch(batch_df, batch_id: int):  # noqa: ANN001
        # rows later than the watermark were already dropped by the
        # stateful dedup operator; what reaches here is applied.
        # PERSIST the micro-batch: the epoch runs several actions
        # (schema-event scan, stats, quarantine, merge) and an
        # uncached foreachBatch frame re-reads the source AND re-runs
        # the stateful dedup per action — wasted work, and the
        # numRowsDroppedByWatermark metric would count each re-run.
        batch_df.persist()
        try:
            if txn_col is not None:
                complete, cache = _txn_boundary_gate(
                    spark, batch_df, int(batch_id), txn_col, txn_total_col,
                    txn_state_dir, txn_flush_lsn_lag,
                )
                try:
                    # complete is a cheap filter over the gate's
                    # persisted cache — no extra persist needed.
                    pipeline.process_epoch(
                        complete.drop(txn_col, txn_total_col), int(batch_id)
                    )
                finally:
                    cache.unpersist()
            else:
                pipeline.process_epoch(batch_df, int(batch_id))
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.queryName("cdc_ingest")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
    )
    # default: drain-what's-there-and-stop; processing_time runs a
    # continuous paced tail (required with max_versions_per_batch).
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start(), pipeline


def _txn_boundary_gate(
    spark: SparkSession,
    batch_df,
    batch_id: int,
    txn_col: str,
    txn_total_col: str,
    state_dir: str,
    flush_lsn_lag: int | None,
):
    """The per-micro-batch transaction gate (see ``start_stream``'s
    ``txn_col``): union the previous batch's pending rows, split on
    completion (rows seen == ``txn_total_col``; NULL txn id or NULL
    total passes through), persist the new pending tail as
    ``batch=<id>`` (state AFTER this batch), and return the complete
    rows for the epoch merge.

    Replay determinism is the whole design: processing batch N reads
    pending state from the highest ``batch=<id>`` with id < N — never
    its own — so a replayed batch (same checkpointed source offsets)
    recomputes the identical split even if its own state dir was
    already written before the crash.  The pending write is an
    overwrite; superseded state dirs (below the one replays of this
    id still need) are pruned after.  Pending is small by
    construction — only transactions open across the current batch
    edge — so it is written ``coalesce(1)``.

    Returns ``(complete, cache)``: the caller runs the epoch from
    ``complete`` (a cheap filter over the persisted ``cache``) and
    unpersists ``cache`` when the epoch is done — the union + window
    executes ONCE per batch, not once per downstream action."""
    import shutil

    missing = [c for c in (txn_col, txn_total_col) if c not in batch_df.columns]
    if missing:
        raise ValueError(
            f"txn_col gate: column(s) {missing} absent from the stream "
            f"batch (columns: {batch_df.columns}) — the changelog must "
            "carry the transaction id and per-transaction row total"
        )
    os.makedirs(state_dir, exist_ok=True)
    ids = [
        int(n.split("=", 1)[1])
        for n in os.listdir(state_dir)
        if n.startswith("batch=") and n.split("=", 1)[1].isdigit()
    ]
    prev = [i for i in ids if i < batch_id]
    rows = batch_df
    if prev:
        # schema-explicit read: an empty pending dir (just _SUCCESS)
        # must load as zero rows, not fail schema inference.
        rows = rows.unionByName(
            spark.read.schema(batch_df.schema).parquet(
                os.path.join(state_dir, f"batch={max(prev)}")
            )
        )
    # NULL txn ids get per-row singleton groups (same synthetic key
    # as the batch slicer's _epoch_ids, same reason): a mostly
    # non-transactional stream must not funnel into one giant NULL
    # transaction group.
    key = F.coalesce(
        F.col(txn_col).cast("string"),
        F.concat(F.lit("\x00row:"), F.col("lsn").cast("string")),
    )
    # Progress is counted in DISTINCT LSNs, not rows: a cross-batch
    # duplicate delivery (which the watermarked dedup can no longer
    # catch once its state expired — see the module docstring) must
    # not inflate the seen-count and release a half-applied
    # transaction.  The expected total is the MAX of txn_total — one
    # decision per TRANSACTION even if a malformed feed stamps rows
    # of one txn with different totals (a per-row comparison could
    # split it).  Shape (r6, VERDICT #5): a narrow GROUP BY + join
    # back instead of collect_set over a window — the old form held a
    # giant transaction's ENTIRE LSN set in one window buffer, while
    # count_distinct is a spillable two-phase hash aggregate whose
    # shuffle carries (txn, lsn) pairs only; the join then shuffles
    # the same rows the window form shuffled.
    keyed = rows.withColumn("_txn_key", key)
    per_txn = keyed.groupBy("_txn_key").agg(
        F.count_distinct(F.col("lsn")).alias("_txn_seen"),
        F.max(txn_total_col).alias("_txn_total"),
        F.max("lsn").alias("_txn_maxlsn"),
    )
    counted = keyed.join(per_txn.hint("SHUFFLE_HASH"), "_txn_key").persist()
    done = (
        F.col(txn_col).isNull()
        | F.col("_txn_total").isNull()
        | (F.col("_txn_seen") >= F.col("_txn_total"))
    )
    if flush_lsn_lag is not None:
        # agg over the cache (populated by the pending write below at
        # the latest; first() here just materializes it a step early).
        head = counted.agg(F.max("lsn")).first()[0]
        if head is not None:
            # a transaction whose NEWEST row already lags the stream
            # head by more than the budget has lost its tail — flush
            # it incomplete rather than pend forever.
            lagged = F.col("_txn_maxlsn") < F.lit(int(head) - int(flush_lsn_lag))
            # SURFACE the atomicity violation (r5 ADVICE): a silently
            # half-applied transaction is indistinguishable from a
            # complete one at the sink without this count.  One tiny
            # agg over the cache, only on the opt-in lag path.
            n_forced = (
                counted.where(~done & lagged)
                .agg(F.count_distinct("_txn_key"))
                .first()[0]
            )
            if n_forced:
                import logging

                logging.getLogger("etl_cms_spark.streaming").warning(
                    "txn gate batch %s: force-flushed %d incomplete "
                    "transaction(s) whose newest row lags the stream head "
                    "(lsn %s) by more than txn_flush_lsn_lag=%s",
                    batch_id, n_forced, head, flush_lsn_lag,
                )
            done = done | lagged
    helper_cols = ("_txn_key", "_txn_seen", "_txn_total", "_txn_maxlsn")
    complete = counted.where(done).drop(*helper_cols)
    pending = counted.where(~done).drop(*helper_cols)
    pending.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch={batch_id}")
    )
    keep_from = max(prev) if prev else batch_id
    for i in ids:
        if i < keep_from:
            shutil.rmtree(
                os.path.join(state_dir, f"batch={i}"), ignore_errors=True
            )
    return complete, counted


class LateDataListener:
    """Incremental watermark/late-data accounting: a
    ``StreamingQueryListener`` that accumulates
    ``numRowsDroppedByWatermark`` per progress event as it arrives —
    exact over the whole stream lifetime, unlike ``recentProgress``
    which Spark caps (last ~100 reports) and therefore undercounts on
    long tails.  Register BEFORE starting the query:

        listener = LateDataListener.install(spark)
        q, pipe = start_stream(...)
        ...; q.awaitTermination(); print(listener.stats())
    """

    def __init__(self) -> None:
        self.rows_dropped_late = 0
        self.max_dedup_state_rows = 0
        self._delegate = None

    def _on_progress(self, progress) -> None:  # noqa: ANN001
        for op in progress.stateOperators or []:
            self.rows_dropped_late += int(op.numRowsDroppedByWatermark or 0)
            self.max_dedup_state_rows = max(
                self.max_dedup_state_rows, int(op.numRowsTotal or 0)
            )

    def stats(self) -> dict:
        return {
            "rows_dropped_late": self.rows_dropped_late,
            "max_dedup_state_rows": self.max_dedup_state_rows,
        }

    @classmethod
    def install(cls, spark: SparkSession) -> "LateDataListener":
        from pyspark.sql.streaming import StreamingQueryListener

        acc = cls()

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: ANN001
                pass

            def onQueryProgress(self, event):  # noqa: ANN001
                acc._on_progress(event.progress)

            def onQueryIdle(self, event):  # noqa: ANN001
                pass

            def onQueryTerminated(self, event):  # noqa: ANN001
                pass

        acc._delegate = _L()
        spark.streams.addListener(acc._delegate)
        return acc

    def uninstall(self, spark: SparkSession) -> None:
        if self._delegate is not None:
            spark.streams.removeListener(self._delegate)
            self._delegate = None


def late_data_stats(query: StreamingQuery) -> dict:
    """Watermark/late-data accounting from the query's progress:
    rows the stateful dedup DROPPED as later than the watermark
    (Spark's ``numRowsDroppedByWatermark``), plus the state size the
    watermark is bounding — the reference's records_read vs
    records_written gap (FileControl.py:255-259), stream-side.

    CAVEAT: ``recentProgress`` is capped by
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100
    reports), so this post-hoc sum undercounts on streams longer than
    the retention window — use ``LateDataListener`` (registered before
    the query starts) for exact lifetime totals; this helper remains
    for short availableNow= drains where the cap cannot bite."""
    dropped = 0
    state_rows = 0
    for p in query.recentProgress:
        for op in p.get("stateOperators", []) or []:
            dropped += int(op.get("numRowsDroppedByWatermark", 0) or 0)
            state_rows = max(state_rows, int(op.get("numRowsTotal", 0) or 0))
    return {"rows_dropped_late": dropped, "max_dedup_state_rows": state_rows}
