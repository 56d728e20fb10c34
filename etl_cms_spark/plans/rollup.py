"""Incremental rollup maintenance (continuous aggregate / IVM).

The "hypertable rollup" pattern: a small aggregate table (events per
(key, hour), bytes per repo, …) kept current INCREMENTALLY as change
epochs arrive, instead of re-scanning the full history per refresh —
the reference's analogue is its per-run record counters persisted
across samples (FileControl recs_written bookkeeping), which never
survive a crash mid-run.

Design: per epoch, aggregate ONLY the batch (a map-side-combined hash
agg over epoch-sized input), join the (small, already-aggregated)
current rollup state, add, and MERGE the touched keys back through the
ordinary LakeTable epoch commit.  Exactly-once, crash-resume, lineage,
time travel, and compaction all come from the sink for free:

* replaying a committed epoch is a manifest no-op (merge_epoch);
* the read-modify-write is safe because the committed-epoch check
  happens BEFORE the read — a crash after commit replays into a skip,
  a crash before recomputes from the unchanged snapshot;
* the merge rewrites only the buckets whose keys the epoch touched —
  cost ~ O(epoch distinct keys), never O(rollup history).

Scope: monotone additive measures of the changelog itself (counts,
sums over events) — each change event contributes once, so no
retraction is needed.  Aggregates over CURRENT ROW STATE (e.g. "bytes
in latest versions") need old-value retraction on update/delete;
derive those from the main table snapshot instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cms_spark.sink.lake import LakeTable


class IncrementalRollup:
    """A LakeTable-backed continuous aggregate.

    ``measures`` maps output column name -> aggregate Column over the
    raw batch (e.g. ``{"n_events": F.count(F.lit(1)),
    "total_bytes": F.sum(F.length("content"))}``).  Measures must be
    ADDITIVE (count/sum): epoch deltas are added to the stored state.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_exprs: dict[str, Column],
        measures: dict[str, Column],
        n_buckets: int = 8,
    ):
        self.spark = spark
        self.key_cols = list(key_exprs)
        self.key_exprs = key_exprs
        self.measures = measures
        schema = {k: "string" for k in self.key_cols} | {
            m: "long" for m in measures
        }
        self.table = LakeTable(spark, root, n_buckets)
        if not self.table.exists():
            self.table.create(self.key_cols, schema)

    def apply_epoch(self, batch: DataFrame, epoch: int) -> dict:
        """Fold one change batch into the rollup, exactly once."""
        if str(epoch) in {str(e) for e in self.table.committed_epochs()}:
            return {"epoch": epoch, "skipped_duplicate_epoch": True}
        delta = batch.groupBy(
            # keys stored as strings (the table's declared schema) —
            # deterministic cross-engine text form for dates/hours too.
            *[expr.cast("string").alias(name) for name, expr in self.key_exprs.items()]
        ).agg(*[m.cast("long").alias(name) for name, m in self.measures.items()])
        current = self.table.read().select(
            *self.key_cols,
            *[F.col(m).alias(f"_cur_{m}") for m in self.measures],
        )
        merged = delta.join(current, self.key_cols, "left").select(
            *self.key_cols,
            *[
                (F.col(m) + F.coalesce(F.col(f"_cur_{m}"), F.lit(0))).alias(m)
                for m in self.measures
            ],
            F.lit("U").alias("op"),
            F.lit(int(epoch)).alias("lsn"),
        )
        return self.table.merge_epoch(merged, epoch)

    def read(self) -> DataFrame:
        return self.table.read().select(*self.key_cols, *self.measures)
