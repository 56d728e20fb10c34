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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cms_spark.operators.dedup import latest_by_lsn
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
    ):
        self.spark = spark
        self.root = root
        self.table = LakeTable(spark, os.path.join(root, "tables", "files"), n_buckets)
        self.quarantine_dir = os.path.join(root, "quarantine")
        self.checkpoint_path = os.path.join(root, "_checkpoint.json")
        self.salt_hot_keys = salt_hot_keys
        self.mapper = mapper
        self.metrics: list[dict[str, Any]] = []

    # ---------------- lifecycle ----------------

    def init_tables(self) -> None:
        if not self.table.exists():
            self.table.create(KEY_COLS, MAIN_SCHEMA)

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

    # ---------------- epoch processing ----------------

    def process_epoch(self, batch: DataFrame, epoch: int) -> dict:
        """Apply one change batch.  Idempotent per epoch."""
        if str(epoch) in {str(e) for e in self.table.committed_epochs()}:
            rec = {"epoch": epoch, "skipped_duplicate_epoch": True}
            self.metrics.append(rec)
            return rec

        # 1. schema-evolution events (tiny — driver-side apply).
        if "schema_change" in batch.columns:
            schema_events = (
                batch.where(F.col("op") == "SCHEMA")
                .select("lsn", "schema_change")
                .orderBy("lsn")
                .collect()
            )
            for ev in schema_events:
                self.table.apply_schema_change(json.loads(ev["schema_change"]))
            data = batch.where(F.col("op") != "SCHEMA").drop("schema_change")
        else:
            data = batch

        # 2. per-key max-LSN dedup (single shuffle; salted if skewed).
        dedup = salted_latest_by_lsn if self.salt_hot_keys else latest_by_lsn
        latest = dedup(data, KEY_COLS, "lsn")

        # 3. broadcast-dict concept mapping (Arrow UDF — no per-row Python).
        #    Persisted: the epoch runs 3 jobs over this batch (lineage
        #    stats, quarantine, merge write) — without the cache the
        #    dedup shuffle + UDF would execute three times.
        map_fn = map_concepts_udf if self.mapper == "udf" else map_concepts_join
        mapped = map_fn(self.spark, latest).persist()
        try:
            # 4. route: unmapped upserts leave the main table (delete)
            #    and land in the quarantine log.
            is_unmapped = (F.col("domain") == "unmapped") & (F.col("op") != "D")
            updates = mapped.withColumn(
                "op", F.when(is_unmapped, F.lit("D")).otherwise(F.col("op"))
            )
            quarantined = mapped.where(is_unmapped).withColumn("epoch", F.lit(epoch))
            # epoch-keyed overwrite => replaying the epoch rewrites, not
            # duplicates, the quarantine slice (idempotent append).
            qn = quarantined.count()
            if qn:
                quarantined.write.mode("overwrite").parquet(
                    os.path.join(self.quarantine_dir, f"epoch={epoch}")
                )

            # 5. exactly-once merge with lineage.
            rec = self.table.merge_epoch(
                updates, epoch, extra_lineage={"rows_quarantined": qn}
            )
        finally:
            mapped.unpersist()
        self._save_checkpoint(epoch, rec.get("lsn_max"))
        self.metrics.append(rec)
        return rec

    def run(
        self,
        changes: DataFrame,
        n_epochs: int = 4,
        start_epoch: int | None = None,
    ) -> list[dict]:
        """Batch mode: split the changelog into ``n_epochs`` contiguous
        LSN ranges and apply them in order.  ``start_epoch`` simulates
        resuming from a checkpoint (earlier epochs are re-offered and
        skipped by the idempotent merge)."""
        self.init_tables()
        bounds = changes.agg(F.min("lsn"), F.max("lsn")).first()
        lo, hi = bounds[0], bounds[1]
        if lo is None:
            return []
        width = max(1, (hi - lo + 1 + n_epochs - 1) // n_epochs)
        results = []
        first = start_epoch if start_epoch is not None else 0
        for e in range(first, n_epochs):
            epoch_lo = lo + e * width
            epoch_hi = min(hi, epoch_lo + width - 1)
            if epoch_lo > hi:
                break
            batch = changes.where(
                (F.col("lsn") >= epoch_lo) & (F.col("lsn") <= epoch_hi)
            )
            results.append(self.process_epoch(batch, e))
        return results

    # ---------------- read side ----------------

    def current_state(self) -> DataFrame:
        return self.table.read()

    def quarantine(self) -> DataFrame:
        return self.spark.read.parquet(self.quarantine_dir)
