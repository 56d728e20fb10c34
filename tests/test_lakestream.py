"""lake_changelog streaming source (sources/lakestream.py): tail a
MoR LakeTable's epoch commits as a Structured Streaming changelog —
offsets are snapshot versions, partitions are the epochs' delta bucket
dirs, and foreachBatch + merge_epoch gives exactly-once chaining into
a downstream table.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.pipeline import CDCPipeline
from etl_cms_spark.sink.lake import LakeTable
from etl_cms_spark.sources.lakestream import LakeChangelogDataSource
from tests.conftest import assert_df_equal


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(LakeChangelogDataSource)


def _drain(spark, root, name, checkpoint=None, starting=None):
    reader = spark.readStream.format("lake_changelog").option("path", root)
    if starting is not None:
        reader = reader.option("startingVersion", starting)
    w = reader.load().writeStream.format("memory").queryName(name)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(300)
    return spark.table(name)


def test_stream_emits_exact_epoch_deltas(spark, tmp_root):
    """Handcrafted two-epoch MoR history: the stream must emit exactly
    the per-epoch deduped batches — after-images, tombstones with NULL
    payload, intra-epoch losers dropped, cross-epoch versions BOTH
    kept (they were separate commits)."""
    root = os.path.join(tmp_root, "exact")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "string"})
    e0 = spark.createDataFrame(
        [("a", "a0", 1, "U"), ("a", "a1", 2, "U"),  # intra-epoch loser a0
         ("b", "b0", 3, "U")],
        "k string, v string, lsn long, op string",
    )
    e1 = spark.createDataFrame(
        [("a", None, 10, "D"), ("c", "c0", 11, "U")],
        "k string, v string, lsn long, op string",
    )
    t.merge_epoch(e0, 0)
    t.merge_epoch(e1, 1)
    got = _drain(spark, root, "exact_tail")
    exp = spark.createDataFrame(
        [("a", "a1", 2, "U"), ("b", "b0", 3, "U"),
         ("a", None, 10, "D"), ("c", "c0", 11, "U")],
        "k string, v string, lsn long, op string",
    )
    assert_df_equal(got, exp, "streamed deltas == per-epoch batches")


def test_chained_pipeline_converges(spark, changes, tmp_root):
    """CHAINING: upstream CDCPipeline (MoR) -> lake_changelog stream ->
    foreachBatch merge_epoch into a downstream table.  The downstream
    state must equal the upstream state (latest-wins transport is
    lossless); a restart over new upstream epochs resumes from the
    checkpoint exactly-once."""
    up = CDCPipeline(
        spark, os.path.join(tmp_root, "up"), n_buckets=8, merge_mode="mor"
    )
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    up.run(changes.where(F.col("lsn") <= mid), n_epochs=2)

    down = LakeTable(
        spark, os.path.join(tmp_root, "down"), n_buckets=8, merge_mode="mor"
    )
    down.create(["repo", "path"], up.table.schema())

    def apply(df, bid):
        down.merge_epoch(df, bid)

    ckpt = os.path.join(tmp_root, "ckpt")

    def run_once():
        q = (
            spark.readStream.format("lake_changelog")
            .option("path", up.table.root).load()
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    run_once()
    assert_df_equal(down.read(), up.current_state(), "chained == upstream")

    # no new data: a re-run moves nothing and commits nothing
    v = down._current_version()
    run_once()
    assert down._current_version() == v

    # upstream advances; the restarted stream ships ONLY the new epochs
    up2 = CDCPipeline(
        spark, os.path.join(tmp_root, "up"), n_buckets=8, merge_mode="mor"
    )
    up2.run(changes, n_epochs=4, start_epoch=2)
    run_once()
    assert_df_equal(
        down.read(), up2.current_state(), "chained after restart == upstream"
    )


def test_rename_and_add_evolution_resolve_to_current_schema(spark, tmp_root):
    """Deltas written before a rename carry the OLD physical name;
    deltas written before an add lack the column.  A fresh
    full-history stream must present every row under the CURRENT
    logical schema (renamed column populated, added column NULL for
    old rows)."""
    root = os.path.join(tmp_root, "evo")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "string"})
    t.merge_epoch(
        spark.createDataFrame(
            [("a", "a0", 1, "U")], "k string, v string, lsn long, op string"
        ),
        0,
    )
    t.apply_schema_change({"rename": "v:val"})
    t.apply_schema_change({"add": "extra:int"})
    t.merge_epoch(
        spark.createDataFrame(
            [("b", "b0", 5, 7, "U")],
            "k string, val string, extra int, lsn long, op string",
        ),
        1,
    )
    got = _drain(spark, root, "evo_tail")
    # manifest JSON is the schema's canonical (alphabetical) order
    assert sorted(got.columns) == sorted(["k", "val", "extra", "lsn", "op"])
    exp = spark.createDataFrame(
        [("a", "a0", None, 1, "U"), ("b", "b0", 5, 7, "U")],
        "k string, val string, extra int, lsn long, op string",
    )
    assert_df_equal(
        got.select("k", "val", "extra", "lsn", "op"), exp, "evolved stream rows"
    )


def test_start_stream_from_lake_source(spark, changes, tmp_root):
    """Multi-hop medallion: a BRONZE lake holds the raw (unmapped)
    changelog; ``start_stream(source_table=...)`` runs the full SILVER
    pipeline (map, quarantine, dedup, merge) off bronze's commit
    history via the lake_changelog source.  Silver must equal the
    batch pipeline run directly on the original changelog — bronze's
    per-epoch latest-wins compression is invisible to the final
    state."""
    from etl_cms_spark.streaming.stream import start_stream

    bronze = LakeTable(
        spark, os.path.join(tmp_root, "bronze"), n_buckets=8, merge_mode="mor"
    )
    raw_cols = ["repo", "path", "commit", "lang", "content", "ts"]
    bronze.create(
        ["repo", "path"],
        {c: ("timestamp" if c == "ts" else "string") for c in raw_cols},
    )
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    raw = changes.select(*raw_cols, "lsn", "op")
    bronze.merge_epoch(raw.where(F.col("lsn") <= mid), 0)
    bronze.merge_epoch(raw.where(F.col("lsn") > mid), 1)

    q, silver = start_stream(
        spark, None, os.path.join(tmp_root, "silver"), n_buckets=8,
        source_table=bronze.root,
    )
    q.awaitTermination(300)
    ref = CDCPipeline(spark, os.path.join(tmp_root, "ref"), n_buckets=8)
    ref.run(changes, n_epochs=2)
    assert_df_equal(
        silver.current_state(), ref.current_state(), "silver == batch ref"
    )

    def test_requires_exactly_one_source():
        with pytest.raises(ValueError, match="exactly one"):
            start_stream(spark, None, os.path.join(tmp_root, "x"))
        with pytest.raises(ValueError, match="exactly one"):
            start_stream(
                spark, "somewhere", os.path.join(tmp_root, "x"),
                source_table=bronze.root,
            )

    test_requires_exactly_one_source()


def test_cow_epochs_refuse(spark, tmp_root):
    root = os.path.join(tmp_root, "cowt")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="cow")
    t.create(["k"], {"k": "string", "v": "string"})
    t.merge_epoch(
        spark.createDataFrame(
            [("a", "a0", 1, "U")], "k string, v string, lsn long, op string"
        ),
        0,
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="merge-on-read"):
        _drain(spark, root, "cow_tail")


def test_partial_columnar_refuses(spark, tmp_root):
    root = os.path.join(tmp_root, "colt")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "string"}, partial_columnar=True)
    t.append_partial_epoch(
        spark.createDataFrame(
            [("a", "a0", 1, "U")], "k string, v string, lsn long, op string"
        ),
        0,
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="partial_columnar"):
        _drain(spark, root, "col_tail")


def test_start_stream_fans_in_multiple_shards(spark, changes, tmp_root):
    """FAN-IN: two bronze shards (disjoint repo ranges) union into one
    silver pipeline — Spark checkpoints offsets per source, and the
    silver state equals the batch pipeline over the concatenated
    changelog."""
    from etl_cms_spark.streaming.stream import start_stream

    raw_cols = ["repo", "path", "commit", "lang", "content", "ts"]
    schema = {c: ("timestamp" if c == "ts" else "string") for c in raw_cols}
    shard_roots = []
    for i, pred in enumerate(
        [F.crc32(F.col("repo")) % 2 == 0, F.crc32(F.col("repo")) % 2 == 1]
    ):
        b = LakeTable(
            spark, os.path.join(tmp_root, f"shard{i}"), n_buckets=4,
            merge_mode="mor",
        )
        b.create(["repo", "path"], schema)
        b.merge_epoch(changes.where(pred).select(*raw_cols, "lsn", "op"), 0)
        shard_roots.append(b.root)

    q, silver = start_stream(
        spark, None, os.path.join(tmp_root, "fansilver"), n_buckets=8,
        source_table=shard_roots,
    )
    q.awaitTermination(300)
    ref = CDCPipeline(spark, os.path.join(tmp_root, "fanref"), n_buckets=8)
    ref.run(changes, n_epochs=1)
    assert_df_equal(
        silver.current_state(), ref.current_state(), "fan-in silver == ref"
    )


def test_vacuumed_offsets_fail_fast(spark, tmp_root):
    """Retention contract: a consumer whose offsets point below the
    vacuum horizon must FAIL LOUDLY (Kafka's OffsetOutOfRange), never
    silently skip vacuumed epochs — silent skipping is downstream
    data loss."""
    root = os.path.join(tmp_root, "vac")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "string"})
    for e in range(3):
        # same key every epoch -> a real delta stack in one bucket
        t.merge_epoch(
            spark.createDataFrame(
                [("a", f"v{e}", e + 1, "U")],
                "k string, v string, lsn long, op string",
            ),
            e,
        )
    rec = t.compact()      # folds deltas; old version dirs now orphaned
    assert rec["compacted_buckets"] > 0
    vac = t.vacuum(keep_last=1)  # ...and dropped
    assert vac["removed_bucket_dirs"] > 0

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="vacuumed past"):
        _drain(spark, root, "vac_tail")  # full history from version 0

    # a consumer starting at the retained horizon still works: the
    # compacted state is reachable via a fresh snapshot sync, and new
    # epochs stream fine from here.
    t.merge_epoch(
        spark.createDataFrame(
            [("k9", "v9", 99, "U")], "k string, v string, lsn long, op string"
        ),
        3,
    )
    got = _drain(
        spark, root, "vac_tail2", starting=t._current_version() - 1
    )
    assert [r["k"] for r in got.collect()] == ["k9"]


def test_starting_version_ahead_of_current_refuses(spark, tmp_root):
    root = os.path.join(tmp_root, "ahead")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "string"})
    from pyspark.errors.exceptions.captured import StreamingQueryException

    # streamReader construction is lazy: the refusal surfaces at
    # query start, not at .load()
    with pytest.raises(StreamingQueryException, match="ahead of the table"):
        _drain(spark, root, "ahead_tail", starting=99)


def test_sync_snapshot_recovers_below_horizon(spark, tmp_root):
    """The recovery path the retention fail-fast points at: a consumer
    below the vacuum horizon full-syncs the upstream snapshot (one
    negative-namespace epoch, original per-row LSNs, tombstones ride
    along), then resumes streaming from the synced version — and
    converges with upstream as new epochs land."""
    from etl_cms_spark.sources.lakestream import sync_snapshot

    root = os.path.join(tmp_root, "recov_up")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "string"})
    for e in range(3):
        t.merge_epoch(
            spark.createDataFrame(
                [("a", f"v{e}", 10 + e, "U"), (f"k{e}", f"x{e}", 20 + e, "U")],
                "k string, v string, lsn long, op string",
            ),
            e,
        )
    t.merge_epoch(
        spark.createDataFrame(
            [("k0", None, 30, "D")], "k string, v string, lsn long, op string"
        ),
        3,
    )
    t.compact()
    t.vacuum(keep_last=1)

    down = LakeTable(
        spark, os.path.join(tmp_root, "recov_down"), n_buckets=4,
        merge_mode="mor",
    )
    down.create(["k"], {"k": "string", "v": "string"})
    v = sync_snapshot(spark, root, down)
    assert_df_equal(down.read(), t.read(), "synced == upstream snapshot")
    # idempotent: re-sync of the same version is a no-op
    assert sync_snapshot(spark, root, down) == v

    # resume streaming ABOVE the synced version; new epochs flow
    t.merge_epoch(
        spark.createDataFrame(
            [("a", "final", 99, "U")], "k string, v string, lsn long, op string"
        ),
        4,
    )
    ckpt = os.path.join(tmp_root, "recov_ckpt")
    q = (
        spark.readStream.format("lake_changelog")
        .option("path", root).option("startingVersion", v).load()
        .writeStream.foreachBatch(lambda df, bid: down.merge_epoch(df, bid))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    assert_df_equal(down.read(), t.read(), "recovered consumer == upstream")


def test_max_versions_per_batch_paces_the_drain(spark, tmp_root):
    """maxVersionsPerBatch=2 over a 6-epoch backlog: the drain takes
    >= 3 micro-batches, every batch's rows span <= 2 epochs, and the
    union of all batches == the unpaced changelog (pacing changes
    batch boundaries, never content)."""
    import time

    root = os.path.join(tmp_root, "paced")
    t = LakeTable(spark, root, n_buckets=2, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "int"})
    # epoch e writes keys (e, e+100) with lsn base e*10 — disjoint
    # lsn ranges let the test recover each row's epoch from its lsn.
    for e in range(6):
        t.merge_epoch(
            spark.createDataFrame(
                [(f"k{e}", e, "U", e * 10 + 1), (f"k{e + 100}", e, "U", e * 10 + 2)],
                "k string, v int, op string, lsn long",
            ),
            e,
        )

    batches = []  # (bid, [lsn...])

    def sink(df, bid):
        batches.append((bid, [r["lsn"] for r in df.select("lsn").collect()]))

    q = (
        spark.readStream.format("lake_changelog")
        .option("path", root)
        .option("maxVersionsPerBatch", 2)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp_root, "paced_ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if sum(len(ls) for _, ls in batches) >= 12:
                break
            time.sleep(0.25)
    finally:
        q.stop()
        q.awaitTermination(60)

    got = sorted(l for _, ls in batches for l in ls)
    assert got == sorted(e * 10 + d for e in range(6) for d in (1, 2))
    nonempty = [ls for _, ls in batches if ls]
    assert len(nonempty) >= 3, f"expected a paced drain, got {len(nonempty)} batches"
    for ls in nonempty:
        assert len({l // 10 for l in ls}) <= 2, f"batch spans >2 epochs: {ls}"


def test_max_versions_per_batch_validates(spark, tmp_root):
    root = os.path.join(tmp_root, "pv")
    t = LakeTable(spark, root, n_buckets=2, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "int"})
    with pytest.raises(Exception, match="maxVersionsPerBatch"):
        (
            spark.readStream.format("lake_changelog")
            .option("path", root)
            .option("maxVersionsPerBatch", 0)
            .load()
            .writeStream.format("noop")
            .start()
        )


def test_paced_drain_restart_no_duplicates_still_capped(spark, tmp_root):
    """Stop a capped drain midway, restart on the same checkpoint: the
    union is exactly-once (no re-emission — the persisted pacing floor
    keeps latestOffset from ever regressing behind the checkpoint) and
    the post-restart batches are still capped at 2 epochs."""
    import time

    root = os.path.join(tmp_root, "paced_rs")
    t = LakeTable(spark, root, n_buckets=2, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "int"})
    for e in range(8):
        t.merge_epoch(
            spark.createDataFrame(
                [(f"k{e}", e, "U", e * 10 + 1)],
                "k string, v int, op string, lsn long",
            ),
            e,
        )

    ckpt = os.path.join(tmp_root, "paced_rs_ckpt")
    batches = []

    def sink(df, bid):
        batches.append((bid, [r["lsn"] for r in df.select("lsn").collect()]))

    def run(stop_after_rows):
        q = (
            spark.readStream.format("lake_changelog")
            .option("path", root)
            .option("maxVersionsPerBatch", 2)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 240
            while time.time() < deadline:
                if sum(len(ls) for _, ls in batches) >= stop_after_rows:
                    break
                time.sleep(0.25)
        finally:
            q.stop()
            q.awaitTermination(60)

    run(3)          # first leg: at least 3 of 8 rows
    n_leg1 = len(batches)
    run(8)          # second leg: same checkpoint, drain the rest
    # q.stop() can land AFTER the sink ran but BEFORE the batch's
    # checkpoint commit — Spark then re-delivers that batch with the
    # SAME id on restart.  That is the delivery contract (replays
    # share the id; the real chained sink's merge_epoch dedupes on
    # it), so the test sink dedupes by id too: last write wins.
    by_bid = {bid: ls for bid, ls in batches}
    got = sorted(l for ls in by_bid.values() for l in ls)
    assert got == [e * 10 + 1 for e in range(8)], f"dupes/loss: {got}"
    for _, ls in batches[n_leg1:]:
        assert len({l // 10 for l in ls}) <= 2, f"restart batch spans >2 epochs: {ls}"


def test_start_stream_paced_chaining(spark, changes, tmp_root):
    """start_stream(source_table=..., max_versions_per_batch=1,
    processing_time=...): the silver pipeline drains a 4-epoch bronze
    backlog one version per micro-batch and converges to the batch
    reference; the cap+available-now combination refuses."""
    import time

    from etl_cms_spark.streaming.stream import start_stream

    bronze = LakeTable(
        spark, os.path.join(tmp_root, "bronze_p"), n_buckets=8, merge_mode="mor"
    )
    raw_cols = ["repo", "path", "commit", "lang", "content", "ts"]
    bronze.create(
        ["repo", "path"],
        {c: ("timestamp" if c == "ts" else "string") for c in raw_cols},
    )
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    raw = changes.select(*raw_cols, "lsn", "op")
    width = (hi - lo) // 4 + 1
    for e in range(4):
        bronze.merge_epoch(
            raw.where(
                (F.col("lsn") >= lo + e * width) & (F.col("lsn") < lo + (e + 1) * width)
            ),
            e,
        )

    with pytest.raises(ValueError, match="processing_time"):
        start_stream(
            spark, None, os.path.join(tmp_root, "silver_bad"),
            source_table=bronze.root, max_versions_per_batch=1,
        )

    ref = CDCPipeline(spark, os.path.join(tmp_root, "ref_p"), n_buckets=8)
    ref.run(changes, n_epochs=4)
    n_ref = ref.current_state().count()

    q, silver = start_stream(
        spark, None, os.path.join(tmp_root, "silver_p"), n_buckets=8,
        source_table=bronze.root, max_versions_per_batch=1,
        processing_time="50 milliseconds", consumer_id="t",
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if silver.table.exists() and silver.current_state().count() == n_ref:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert_df_equal(
        silver.current_state(), ref.current_state(), "paced silver == batch ref"
    )
    # pacing touched more than one micro-batch epoch (one per version)
    assert len([m for m in silver.metrics if m.get("rows_upserted")]) >= 3


def test_branch_publish_flows_into_stream(spark, tmp_root):
    """Epochs staged on a BRANCH are invisible to the changelog stream
    until fast_forward; the publish then surfaces them as ordinary
    epoch commits (the adopted manifests ARE main commits), so a
    chained downstream table picks up the whole backfill atomically
    and exactly-once on its existing checkpoint."""
    root = os.path.join(tmp_root, "brflow")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "string"})
    t.merge_epoch(spark.createDataFrame(
        [("a", "a0", 1, "U")], "k string, v string, lsn long, op string"), 0)
    t.create_branch("bulk")
    b = t.branch_table("bulk")
    b.merge_epoch(spark.createDataFrame(
        [("b", "b0", 2, "U")], "k string, v string, lsn long, op string"), 1)
    b.merge_epoch(spark.createDataFrame(
        [("a", None, 3, "D"), ("c", "c0", 4, "U")],
        "k string, v string, lsn long, op string"), 2)

    down = LakeTable(spark, os.path.join(tmp_root, "brflow_down"),
                     n_buckets=4, merge_mode="mor")
    down.create(["k"], {"k": "string", "v": "string"})
    ck = os.path.join(tmp_root, "brflow_ck")

    def run_once():
        q = (
            spark.readStream.format("lake_changelog")
            .option("path", root).load()
            .writeStream.foreachBatch(lambda df, bid: down.merge_epoch(df, bid))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    run_once()
    # branch commits invisible pre-publish
    assert {(x["k"], x["v"]) for x in down.read().collect()} == {("a", "a0")}

    t.fast_forward("bulk")
    t.drop_branch("bulk")
    run_once()
    assert {(x["k"], x["v"]) for x in down.read().collect()} == {
        ("b", "b0"), ("c", "c0"),
    }
    assert_df_equal(down.read(), t.read(), "downstream == published upstream")
