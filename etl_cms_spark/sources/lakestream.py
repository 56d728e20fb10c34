"""Structured Streaming source over a LakeTable's own change history
(pipeline CHAINING): downstream consumers tail an upstream lake's
epoch commits as a binlog-style changelog, with Spark's checkpointed
offset machinery giving exactly-once delivery into any epoch-keyed
sink.

    spark.dataSource.register(LakeChangelogDataSource)
    ch = (spark.readStream.format("lake_changelog")
            .option("path", upstream_root).load())
    # columns: <upstream logical schema> + lsn (bigint) + op ('U'/'D')

This is the Spark-4 Python DataSource API (pyspark.sql.datasource) —
the idiomatic replacement for a driver-side polling loop.  Design:

* OFFSETS ARE SNAPSHOT VERSIONS.  ``initialOffset`` = the
  ``startingVersion`` option (default 0 = the table's whole retained
  history); ``latestOffset`` = the manifest's CURRENT pointer.  A
  micro-batch covers the committed versions in ``(start, end]``.
* PARTITIONS ARE DELTA BUCKET DIRS.  For a MERGE-ON-READ table each
  epoch's ``data/v{N}/_bucket=B`` dir IS the change set (the deduped
  batch: full after-images + tombstones) — so planning an epoch is a
  pure manifest read and each Spark task reads one bucket dir with
  pyarrow, executor-side.  Nothing is re-diffed, nothing re-shuffles:
  the upstream merge already paid for the delta layout.  10^10-event
  scale: the stream's work is O(new change rows), driver work is
  O(epochs × changed buckets) manifest arithmetic.
* SCHEMA IS THE UPSTREAM LOGICAL SCHEMA at query start, plus
  ``lsn``/``op``.  Rename evolution is resolved via the manifest's
  cumulative physical→logical map; widened columns are cast up and
  columns added later than a delta file materialize as NULLs — the
  same normalization contract as ``LakeTable.read`` (lake.py:365).
* MAINTENANCE COMMITS ARE INVISIBLE.  Compaction / rebucket /
  rollback / schema commits carry no epoch record, so they emit no
  rows — logical state didn't change.  CoW epochs REFUSE loudly (a
  CoW data dir is a bucket rewrite, not a delta; streaming it would
  re-emit unchanged rows): chain from MoR tables.  Partial-columnar
  tables refuse too (their deltas are per-column partials, not full
  images).
* RETENTION = VACUUM HORIZON.  Delta dirs of superseded versions
  stay on disk until ``vacuum`` drops them (Kafka-retention
  semantics): keep ``vacuum(keep_last=...)`` at or beyond the
  slowest consumer's checkpoint lag.  Offsets below the horizon
  FAIL FAST (Kafka's OffsetOutOfRange) — never a silent skip.
* ``Trigger.AvailableNow`` falls back to SINGLE-BATCH execution
  (Python stream readers don't implement the AvailableNow admission
  contract yet): one micro-batch covering checkpoint→CURRENT, then
  stop.  Identical delivery/exactly-once semantics; only the
  batch-size pacing differs.
* ADMISSION CONTROL: ``maxVersionsPerBatch`` caps each micro-batch
  at N snapshot versions (Kafka's ``maxOffsetsPerTrigger``) so a
  far-behind consumer drains its backlog in bounded, individually
  checkpointed steps.  Use it with a ``processingTime`` trigger —
  under AvailableNow's single-batch fallback a cap would stop the
  drain after the first capped batch.

Exactly-once chaining (tests/test_lakestream.py): the natural sink is
``foreachBatch(lambda df, bid: downstream.merge_epoch(df, bid))`` —
Spark replays a failed micro-batch with the SAME batch id, and
``merge_epoch`` is idempotent per epoch id, so the downstream table
converges to the upstream state under any crash/restart interleaving.

Reference analogue: the reference's consumers re-read whole CSV
dumps; this is the incremental-subscription form of the same
source-to-target contract (ETL-CMS README pipeline diagram).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_LSN = "_lsn"
_DELETED = "_deleted"

# Spark-DDL type -> pyarrow type factory (None = leave the file's
# physical type alone and let Spark's arrow ingestion handle it).
_DDL_TO_ARROW = {
    "string": "string",
    "int": "int32",
    "integer": "int32",
    "long": "int64",
    "bigint": "int64",
    "short": "int16",
    "smallint": "int16",
    "byte": "int8",
    "tinyint": "int8",
    "double": "float64",
    "float": "float32",
    "boolean": "bool",
    "date": "date32",
}


def _arrow_type(ddl: str):
    import pyarrow as pa

    d = ddl.lower()
    if d.startswith("timestamp"):
        # Spark's arrow ingestion takes microseconds; pyarrow reads
        # Spark-written parquet timestamps as nanoseconds.
        return pa.timestamp("us")
    name = _DDL_TO_ARROW.get(d)
    return getattr(pa, name)() if name else None


def _manifest(root: str, version: int | None = None) -> dict:
    mdir = os.path.join(root, "_manifests")
    if version is None:
        with open(os.path.join(mdir, "CURRENT")) as f:
            version = int(f.read().strip())
    with open(os.path.join(mdir, f"v{version}.json")) as f:
        return json.load(f)


class _DeltaDir(InputPartition):
    """One epoch's delta files for one bucket, plus the projection
    plan (logical name, candidate file names new-first, target DDL type)
    resolved driver-side from the manifest."""

    def __init__(self, path: str, columns: list):
        self.path = path
        self.columns = columns  # [(logical, physical, ddl_type), ...]


class _LakeChangelogStreamReader(DataSourceStreamReader):
    """Pacing state (``maxVersionsPerBatch``): ``latestOffset()`` gets
    no view of the query's checkpoint (the Python source API has no
    admission-control hook), and Spark happily walks offsets BACKWARD
    if ``latestOffset`` ever returns less than the checkpointed end —
    silently re-emitting committed batches.  Observed call order makes
    in-memory pacing unsafe: on a fresh start ``latestOffset`` fires
    BEFORE ``initialOffset`` (an in-memory floor caps nothing on batch
    1), and on a clean-commit restart it fires before any
    ``partitions`` call (a floor seeded from ``startingVersion`` would
    sit BEHIND the checkpoint).  So the floor — the highest snapshot
    version ever PLANNED for this consumer — is persisted under the
    table root (``_consumers/<consumerId>.pace``), written on every
    ``partitions``/``commit``.  Invariant: floor >= every end Spark
    has ever planned, hence ``min(current, floor + max)`` is always >=
    the checkpoint and offsets only move forward.  The file is
    advisory pacing state, never correctness state: deleting it costs
    at most one uncapped catch-up batch (delete it / switch
    ``consumerId`` when resetting a consumer onto a new checkpoint,
    otherwise the first batch jumps straight to the old floor)."""

    def __init__(self, root: str, start_version: int, max_versions: int | None = None,
                 consumer_id: str = "default"):
        self.root = root
        self.start_version = start_version
        self.max_versions = max_versions
        self._pace_path = os.path.join(root, "_consumers", f"{consumer_id}.pace")
        self._floor = start_version
        if max_versions is not None and os.path.exists(self._pace_path):
            try:
                with open(self._pace_path) as f:
                    self._floor = max(self._floor, int(f.read().strip()))
            except (ValueError, OSError):
                pass  # corrupt/racing hint: fall back to startingVersion

    def _advance_floor(self, version: int) -> None:
        if version <= self._floor:
            return
        self._floor = version
        if self.max_versions is None:
            return
        os.makedirs(os.path.dirname(self._pace_path), exist_ok=True)
        tmp = f"{self._pace_path}.tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pace_path)

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        cur = _manifest(self.root)["version"]
        if self.max_versions is not None:
            cur = min(cur, self._floor + self.max_versions)
        return {"version": cur}

    def commit(self, end: dict) -> None:
        # delivery offsets live in the query checkpoint (retention is
        # vacuum's keep_last policy); only the pacing floor is ours.
        self._advance_floor(int(end["version"]))

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        self._advance_floor(e)
        if s >= e:
            return []
        m = _manifest(self.root, e)
        if m.get("partial_columnar"):
            raise ValueError(
                "lake_changelog cannot stream a partial_columnar table: "
                "its deltas are per-column partial images, not full rows"
            )
        # Candidate file-column names for each CURRENT logical column:
        # a delta written AFTER a rename carries the new name, one
        # written BEFORE carries the old physical name — same
        # new-name-first coalesce as LakeTable._normalize (lake.py).
        old = {v: k for k, v in m.get("renames", {}).items()}
        cols = [
            (c, [c] + ([old[c]] if c in old else []), t)
            for c, t in m["schema"].items()
        ]
        recs = sorted(
            (r for r in m["epochs"].values() if s < r["snapshot_version"] <= e),
            key=lambda r: r["snapshot_version"],
        )
        parts: list[_DeltaDir] = []
        for r in recs:
            if r.get("mode", "mor") != "mor":
                raise ValueError(
                    f"lake_changelog requires merge-on-read epochs; epoch "
                    f"{r['epoch']} (snapshot v{r['snapshot_version']}) was "
                    f"committed mode={r['mode']} — a CoW data dir is a "
                    f"bucket rewrite, not a delta"
                )
            base = os.path.join(self.root, "data", f"v{r['snapshot_version']}")
            for b in r.get("changed_buckets", []):
                d = os.path.join(base, f"_bucket={b}")
                if os.path.isdir(d):
                    parts.append(_DeltaDir(d, cols))
                else:
                    # A MoR epoch writes every changed bucket, so a
                    # missing dir means vacuum dropped this version —
                    # the consumer fell behind the retention horizon.
                    # FAIL FAST (Kafka's OffsetOutOfRange): silently
                    # skipping would be silent data loss downstream.
                    raise ValueError(
                        f"lake_changelog: epoch {r['epoch']} (snapshot "
                        f"v{r['snapshot_version']}) delta files are gone — "
                        f"vacuumed past this consumer's offset.  Restart "
                        f"with .option('startingVersion', <a retained "
                        f"version>) and reconcile the gap (e.g. a full "
                        f"re-sync), or raise vacuum(keep_last=...) above "
                        f"the slowest consumer's lag"
                    )
        return parts

    def read(self, partition: _DeltaDir):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.path, format="parquet")
        for batch in dataset.to_batches():
            n = batch.num_rows
            if not n:
                continue
            names_in = set(batch.schema.names)
            arrays, names = [], []
            for logical, candidates, ddl in partition.columns:
                target = _arrow_type(ddl)
                present = [c for c in candidates if c in names_in]
                if present:
                    arr = (
                        batch.column(present[0])
                        if len(present) == 1
                        else pc.coalesce(*[batch.column(c) for c in present])
                    )
                    if target is not None and arr.type != target:
                        arr = pc.cast(arr, target)
                else:
                    # column added after this delta was written
                    arr = pa.nulls(n, target or pa.string())
                arrays.append(arr)
                names.append(logical)
            arrays.append(pc.cast(batch.column(_LSN), pa.int64()))
            names.append("lsn")
            arrays.append(
                pc.if_else(
                    pc.fill_null(batch.column(_DELETED), False),
                    pa.scalar("D"),
                    pa.scalar("U"),
                )
            )
            names.append("op")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

class LakeChangelogDataSource(DataSource):
    """``spark.readStream.format("lake_changelog").option("path", root)``
    — see module docstring.  Options: ``path`` (table root, required),
    ``startingVersion`` (first EXCLUDED snapshot version; default 0 =
    full retained history), ``maxVersionsPerBatch`` (admission control,
    Kafka's ``maxOffsetsPerTrigger`` analogue: cap each micro-batch at
    N snapshot versions so a consumer with a deep backlog drains it in
    bounded, individually checkpointed steps instead of one giant
    batch; default unbounded), ``consumerId`` (names this consumer's
    pacing-floor file under ``<root>/_consumers/`` — set it when
    several paced consumers tail the same table, see the reader
    docstring)."""

    @classmethod
    def name(cls) -> str:
        return "lake_changelog"

    def _opt(self, key: str, default=None):
        # option keys arrive lower-cased from the Spark side
        for k, v in self.options.items():
            if k.lower() == key.lower():
                return v
        return default

    def _root(self) -> str:
        root = self._opt("path")
        if not root:
            raise ValueError("lake_changelog requires .option('path', <table root>)")
        return root

    def _validated_max(self) -> int | None:
        max_versions = self._opt("maxVersionsPerBatch")
        if max_versions is None:
            return None
        max_versions = int(max_versions)
        if max_versions < 1:
            raise ValueError(
                f"maxVersionsPerBatch must be >= 1, got {max_versions}"
            )
        return max_versions

    def schema(self) -> str:
        self._validated_max()  # schema() runs eagerly at .load(): fail fast
        m = _manifest(self._root())
        cols = ", ".join(f"`{c}` {t}" for c, t in m["schema"].items())
        return f"{cols}, lsn bigint, op string"

    def streamReader(self, schema) -> _LakeChangelogStreamReader:
        root = self._root()
        start = int(self._opt("startingVersion", 0))
        current = _manifest(root)["version"]
        if start > current:
            # a typo'd startingVersion would otherwise stream nothing,
            # silently, forever (offsets only grow toward it).
            raise ValueError(
                f"startingVersion {start} is ahead of the table's "
                f"current snapshot v{current} at {root}"
            )
        return _LakeChangelogStreamReader(
            root, start, self._validated_max(), self._opt("consumerId", "default")
        )


def register(spark) -> None:
    spark.dataSource.register(LakeChangelogDataSource)


def sync_snapshot(spark, upstream_root: str, downstream) -> int:
    """FULL RE-SYNC for a consumer below the retention horizon (the
    recovery path the vacuum fail-fast points at): merge the
    upstream's CURRENT snapshot into ``downstream`` as ONE epoch,
    then resume streaming with ``startingVersion`` = the returned
    snapshot version.

    Rows carry their ORIGINAL per-row ``_lsn`` (``read_raw``), and
    tombstones ride along as deletes — so epochs streamed AFTER the
    sync merge correctly against the synced rows under the normal
    max-LSN rule (a streamed update older than a synced row loses,
    exactly as it would have upstream), and a key deleted upstream
    cannot resurrect downstream.  The sync epoch id is
    ``-(version + 1)`` — the reserved negative namespace
    (CDCPipeline.reprocess_quarantine), so it can never collide with
    Spark's non-negative micro-batch ids; re-running the sync for
    the same version is the usual exactly-once no-op.

    CAVEAT for a STALE (non-empty) downstream: deletes are conveyed
    by upstream tombstone rows, so the sync is complete only while
    the upstream's tombstone-expiry horizon
    (``compact(expire_tombstones=True)``) covers the consumer's
    staleness — an expired tombstone cannot delete the stale copy's
    live row.  A fresh downstream has no such exposure.

    Returns the upstream snapshot version the sync captured.
    """
    from pyspark.sql import functions as F

    from etl_cms_spark.sink.lake import LakeTable

    up = LakeTable(spark, upstream_root)
    version = up._current_version()
    key_cols = up._load_manifest()["key_cols"]
    payload = [c for c in up.schema() if c not in key_cols]
    snap = up.read_raw().select(
        *key_cols,
        *payload,
        F.col("_lsn").alias("lsn"),
        F.when(F.col("_deleted"), "D").otherwise("U").alias("op"),
    )
    downstream.merge_epoch(snap, -(version + 1))
    return version
