"""Edge interactions: schema evolution x MoR deltas x compaction."""

import os

from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_schema_events, gen_source_changes
from etl_cms_spark.plans.pipeline import CDCPipeline
from tests.conftest import assert_df_equal


def test_rename_with_mor_deltas(spark, tmp_root):
    """Rename mid-stream with MoR: pre-rename base files and
    post-rename delta files coexist; reads must normalize both."""
    base = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=10)
    sev = gen_schema_events(spark, {999: '{"rename": "lang:language"}'})
    ch = base.unionByName(sev)
    p = CDCPipeline(spark, os.path.join(tmp_root, "m"), n_buckets=8, merge_mode="mor")
    p.run(ch, n_epochs=2)
    st = p.current_state()
    assert "language" in st.columns and "lang" not in st.columns
    assert st.where(F.col("language").isNull()).count() == 0
    # compaction across the rename boundary preserves everything
    before = sorted(map(str, st.collect()))
    p.table.compact()
    assert sorted(map(str, p.current_state().collect())) == before


def test_add_column_then_mor(spark, tmp_root):
    base = gen_source_changes(spark, n_events=600, n_keys=150, n_repos=5)
    sev = gen_schema_events(spark, {599: '{"add": "stars:bigint"}'})
    p = CDCPipeline(spark, os.path.join(tmp_root, "a"), n_buckets=8, merge_mode="mor")
    p.run(base.unionByName(sev), n_epochs=2)
    st = p.current_state()
    assert "stars" in st.columns
    assert st.where(F.col("stars").isNotNull()).count() == 0


def test_mor_equals_cow_under_evolution(spark, tmp_root):
    base = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=10)
    sev = gen_schema_events(spark, {999: '{"rename": "lang:language"}'})
    ch = base.unionByName(sev)
    cow = CDCPipeline(spark, os.path.join(tmp_root, "c"), n_buckets=8, merge_mode="cow")
    cow.run(ch, n_epochs=3)
    mor = CDCPipeline(spark, os.path.join(tmp_root, "r"), n_buckets=8, merge_mode="mor")
    mor.run(ch, n_epochs=3)
    assert_df_equal(cow.current_state(), mor.current_state(), "evolution mor==cow")


def test_staged_run_equals_plain(spark, tmp_root):
    ch = gen_source_changes(spark, n_events=1200, n_keys=250, n_repos=10)
    plain = CDCPipeline(spark, os.path.join(tmp_root, "p"), n_buckets=8)
    plain.run(ch, n_epochs=3)
    staged = CDCPipeline(spark, os.path.join(tmp_root, "s"), n_buckets=8)
    staged.run(ch, n_epochs=3, staging_dir=os.path.join(tmp_root, "stage"))
    assert_df_equal(plain.current_state(), staged.current_state(), "staged == plain")


def test_time_travel_sees_pre_evolution_schema(spark, tmp_root):
    base = gen_source_changes(spark, n_events=800, n_keys=150, n_repos=5)
    sev = gen_schema_events(spark, {1700: '{"rename": "lang:language"}'})
    p = CDCPipeline(spark, os.path.join(tmp_root, "tt"), n_buckets=8)
    p.run(base.unionByName(sev), n_epochs=2)
    v1 = p.table.lineage()[0]["snapshot_version"]
    old = p.table.read_at(v1)
    assert "lang" in old.columns and "language" not in old.columns
    new = p.current_state()
    assert "language" in new.columns


def test_reopen_with_wrong_n_buckets_uses_manifest(spark, tmp_root):
    """Reopening an existing table with a different constructor
    n_buckets must take the manifest value — else changed_buckets maps
    keys into new bucket dirs while stale rows remain in old ones."""
    import warnings

    from etl_cms_spark.sink.lake import LakeTable

    ch = gen_source_changes(spark, n_events=400, n_keys=100, n_repos=5)
    root = os.path.join(tmp_root, "nb")
    p64 = CDCPipeline(spark, root, n_buckets=64)
    p64.run(ch.where(F.col("lsn") <= 400), n_epochs=1)
    # reopen with the OTHER default (streaming used 32, batch 64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t = LakeTable(spark, os.path.join(root, "tables", "files"), n_buckets=32)
        assert any("n_buckets" in str(x.message) for x in w)
    assert t.n_buckets == 64
    p32 = CDCPipeline(spark, root, n_buckets=32)
    p32.run(ch, n_epochs=2)  # epoch 0 skipped (idempotent), epoch 1 applied
    assert p32.table.n_buckets == 64
    # full replay on a fresh table must equal the two-phase reopen run
    fresh = CDCPipeline(spark, os.path.join(tmp_root, "nb2"), n_buckets=64)
    fresh.run(ch, n_epochs=2)
    assert_df_equal(p32.current_state(), fresh.current_state(), "reopen == fresh")


def test_expire_tombstones_on_cow_table(spark, tmp_root):
    """expire_tombstones must rewrite ALL buckets (CoW tables carry no
    deltas; tombstones live in ordinary bucket files)."""
    ch = gen_source_changes(spark, n_events=600, n_keys=150, n_repos=5)
    p = CDCPipeline(spark, os.path.join(tmp_root, "ts"), n_buckets=8, merge_mode="cow")
    p.run(ch, n_epochs=2)
    before = sorted(map(str, p.current_state().collect()))
    m = p.table._load_manifest()
    raw = p.table._read_buckets(m, None)
    n_tomb = raw.where(F.col("_deleted")).count()
    assert n_tomb > 0, "fixture must produce deletes"
    rec = p.table.compact(expire_tombstones=True)
    assert rec["compacted_buckets"] > 0
    m2 = p.table._load_manifest()
    raw2 = p.table._read_buckets(m2, None)
    assert raw2.where(F.col("_deleted")).count() == 0
    assert sorted(map(str, p.current_state().collect())) == before


def test_bucket_files_are_key_sorted(spark, tmp_root):
    """Clustered layout contract: every bucket data file is sorted by
    the table key, so parquet row-group min/max stats are tight and
    in-bucket point/range reads can skip row groups."""
    import glob

    import pyarrow.parquet as pq

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, n_events=4000, n_keys=800, n_repos=10)
    root = os.path.join(tmp_root, "clustered_lake")
    p = CDCPipeline(spark, root, n_buckets=4)
    p.run(changes, n_epochs=2)
    files = glob.glob(os.path.join(root, "tables", "files", "data", "v*", "_bucket=*", "*.parquet"))
    assert files
    checked = 0
    for f in files:
        t = pq.read_table(f, columns=["repo", "path"])
        keys = list(zip(t.column("repo").to_pylist(), t.column("path").to_pylist()))
        if len(keys) > 1:
            assert keys == sorted(keys), f"unsorted bucket file {f}"
            checked += 1
    assert checked > 0


def test_point_lookup_prunes_to_one_bucket_with_pushed_filter(spark, tmp_root):
    """lookup(): driver-side bucket hash -> single-bucket read, key
    equality pushed to the parquet scan, exactly the live row back."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, n_events=3000, n_keys=400, n_repos=10)
    root = os.path.join(tmp_root, "lookup_lake")
    p = CDCPipeline(spark, root, n_buckets=16)
    p.run(changes, n_epochs=2)
    # pick a key that survives (latest version not a delete, mapped lang)
    live = p.current_state().limit(1).collect()[0]
    out = p.table.lookup({"repo": live["repo"], "path": live["path"]})
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["commit"] == live["commit"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # key equality reached the scan
    assert "PushedFilters: [" in plan and "IsNotNull(repo)" in plan
    # only ONE bucket directory is in the scan's file listing
    import re
    scanned = set(re.findall(r"_bucket=(\d+)", plan))
    assert len(scanned) <= 1


def test_changes_between_replays_to_target_snapshot(spark, tmp_root):
    """CDC OUT: the exported diff between two snapshots, applied to
    the older state, must reproduce the newer state exactly — and the
    op labels must partition correctly (I keys absent before, D keys
    absent after, U keys present in both with changed payload)."""
    from pyspark.sql import functions as F

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, n_events=4000, n_keys=300, n_repos=10)
    root = os.path.join(tmp_root, "cdcout_lake")
    p = CDCPipeline(spark, root, n_buckets=8)
    p.run(changes, n_epochs=2)
    lin = p.table.lineage()
    v1 = lin[0]["snapshot_version"]
    diff = p.table.changes_between(v1).cache()
    s1 = p.table.read_at(v1)
    s2 = p.table.read()
    keys = ["repo", "path"]
    k1 = {tuple(r) for r in s1.select(*keys).collect()}
    k2 = {tuple(r) for r in s2.select(*keys).collect()}
    by_op = {
        o: {tuple(r) for r in diff.where(F.col("op") == o).select(*keys).collect()}
        for o in ("I", "U", "D")
    }
    assert by_op["I"] == k2 - k1
    assert by_op["D"] == k1 - k2
    assert by_op["U"] <= (k1 & k2)
    # replay: old state minus (U/D keys) plus after-rows of I/U == new state
    payload = [c for c in s1.columns if c not in keys]
    changed = diff.select(*keys)
    kept = s1.join(changed, keys, "left_anti")
    applied = diff.where(F.col("op") != "D").select(
        *keys, *[F.col(f"after.{c}").alias(c) for c in payload]
    )
    rebuilt = kept.unionByName(applied).select(*s2.columns)
    assert rebuilt.exceptAll(s2).count() == 0
    assert s2.exceptAll(rebuilt).count() == 0
    diff.unpersist()


def test_rollback_restores_state_and_reapplies_epochs(spark, tmp_root):
    """rollback(): current state returns to the target snapshot under
    a NEW version, and the undone epoch re-applies on replay."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, n_events=3000, n_keys=300, n_repos=10)
    root = os.path.join(tmp_root, "rb_lake")
    p = CDCPipeline(spark, root, n_buckets=8)
    p.run(changes, n_epochs=2)
    lin = p.table.lineage()
    v1 = lin[0]["snapshot_version"]
    s1 = p.table.read_at(v1).collect()
    final = {tuple(r) for r in p.table.read().collect()}
    p.table.rollback(v1)
    assert {tuple(r) for r in p.table.read().collect()} == {tuple(r) for r in s1}
    # epoch 1 left the committed set -> replaying the changelog
    # re-applies it and converges to the original final state.
    p2 = CDCPipeline(spark, root, n_buckets=8)
    p2.run(changes, n_epochs=2)
    assert {tuple(r) for r in p2.table.read().collect()} == final


def test_vacuum_gc_keeps_current_drops_expired(spark, tmp_root):
    """vacuum(): current snapshot still reads (shared bucket dirs are
    retained), expired versions fail fast, orphaned dirs are gone."""
    import glob

    import pytest

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, n_events=3000, n_keys=300, n_repos=10)
    root = os.path.join(tmp_root, "vac_lake")
    p = CDCPipeline(spark, root, n_buckets=8)
    p.run(changes, n_epochs=3)
    table_root = os.path.join(root, "tables", "files")
    before = p.table.read().collect()
    n_dirs_before = len(glob.glob(os.path.join(table_root, "data", "v*", "_bucket=*")))
    lin = p.table.lineage()
    old_v = lin[0]["snapshot_version"]
    rep = p.table.vacuum(keep_last=1)
    assert rep["removed_bucket_dirs"] > 0
    n_dirs_after = len(glob.glob(os.path.join(table_root, "data", "v*", "_bucket=*")))
    assert n_dirs_after < n_dirs_before
    # current snapshot intact
    assert sorted(map(str, p.table.read().collect())) == sorted(map(str, before))
    # expired version fails fast
    with pytest.raises(FileNotFoundError):
        p.table.read_at(old_v)


def test_vacuum_skips_inflight_ahead_version(spark, tmp_root):
    """Round-3 ADVICE regression: a data/v{N+1} dir written by an
    in-flight merge that has not yet committed its manifest must NOT
    be reclaimed by vacuum — only dirs at or below the current
    version are GC candidates."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, n_events=1000, n_keys=100, n_repos=5)
    root = os.path.join(tmp_root, "vac_inflight")
    p = CDCPipeline(spark, root, n_buckets=4)
    p.run(changes, n_epochs=2)
    table_root = os.path.join(root, "tables", "files")
    cur = p.table._current_version()
    ahead = os.path.join(table_root, "data", f"v{cur + 1}", "_bucket=0")
    os.makedirs(ahead)
    with open(os.path.join(ahead, "part-inflight.parquet"), "w") as f:
        f.write("x")
    p.table.vacuum(keep_last=1)
    assert os.path.exists(os.path.join(ahead, "part-inflight.parquet"))


def test_vacuum_skips_inflight_ahead_manifest(spark, tmp_root):
    """Same guard as the data dirs: a v{N+1}.json written by an
    in-flight commit (just before its CURRENT swap) must survive
    vacuum."""
    import json

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, n_events=1000, n_keys=100, n_repos=5)
    root = os.path.join(tmp_root, "vac_inflight_m")
    p = CDCPipeline(spark, root, n_buckets=4)
    p.run(changes, n_epochs=2)
    t = p.table
    cur = t._current_version()
    ahead = os.path.join(t._manifest_dir, f"v{cur + 1}.json")
    with open(ahead, "w") as f:
        json.dump({"version": cur + 1}, f)
    p.table.vacuum(keep_last=1)
    assert os.path.exists(ahead)


def test_changes_for_epoch_equals_full_diff(spark, tmp_root):
    """Bucket-pruned per-epoch CDC-out == the unpruned snapshot diff
    (changes only occur in buckets the merge touched)."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.sink.lake import LakeTable
    from pyspark.sql import functions as F
    from tests.conftest import assert_df_equal

    ch = gen_source_changes(spark, n_events=2000, n_keys=300, n_repos=10)
    root = os.path.join(tmp_root, "cfe")
    t = LakeTable(spark, root, n_buckets=16)
    t.create(["repo", "path"], {"repo": "string", "path": "string",
                                "commit": "string", "lang": "string",
                                "content": "string"})
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    t.merge_epoch(ch.where(F.col("lsn") <= mid), 0)
    v1 = t._current_version()
    t.merge_epoch(ch.where(F.col("lsn") > mid), 1)
    v2 = t._current_version()

    flat = lambda d: d.select(  # noqa: E731
        "repo", "path", "op",
        F.col("before.commit").alias("bc"), F.col("after.commit").alias("ac"),
    )
    assert_df_equal(
        flat(t.changes_for_epoch(1)),
        flat(t.changes_between(v1, v2)),
        "pruned == full diff",
    )
    # epoch 0: diff against the empty v0 — all inserts
    d0 = t.changes_for_epoch(0)
    assert d0.where(F.col("op") != "I").count() == 0


def test_epoch_batch_reads_back_the_merged_batch(spark, tmp_root):
    """MoR epoch_batch == the deduped batch the epoch merged (flat
    op/lsn/payload, NULL payload on deletes), straight from the
    epoch's own delta files — no snapshot diff; CoW epochs raise."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.sink.lake import LakeTable
    from pyspark.sql import functions as F
    from tests.conftest import assert_df_equal

    ch = gen_source_changes(spark, n_events=2000, n_keys=300, n_repos=10)
    sel = ["lsn", "op", "repo", "path", "commit", "lang", "content"]
    t = LakeTable(spark, os.path.join(tmp_root, "eb"), n_buckets=16,
                  merge_mode="mor")
    t.create(["repo", "path"], {"repo": "string", "path": "string",
                                "commit": "string", "lang": "string",
                                "content": "string"})
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    b0 = latest_by_lsn(ch.where(F.col("lsn") <= mid).select(*sel),
                       ["repo", "path"], "lsn")
    b1 = latest_by_lsn(ch.where(F.col("lsn") > mid).select(*sel),
                       ["repo", "path"], "lsn")
    t.merge_epoch(b0, 0)
    t.merge_epoch(b1, 1)
    cols = ["repo", "path", "op", "lsn", "commit", "lang", "content"]
    for e, b in ((0, b0), (1, b1)):
        is_d = F.col("op") == "D"
        expected = b.select(
            "repo", "path",
            F.when(is_d, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("lsn").cast("long").alias("lsn"),
            *[F.when(is_d, F.lit(None).cast("string"))
              .otherwise(F.col(c)).alias(c)
              for c in ("commit", "lang", "content")],
        )
        assert_df_equal(t.epoch_batch(e).select(*cols), expected,
                        f"epoch_batch({e}) == merged batch")

    # empty commit: flat empty changelog with the right schema
    t.merge_epoch(b1.limit(0), 2)
    eb2 = t.epoch_batch(2)
    assert eb2.count() == 0
    assert set(eb2.columns) == set(cols)
    assert eb2.columns[:4] == ["repo", "path", "op", "lsn"]

    cow = LakeTable(spark, os.path.join(tmp_root, "ebc"), n_buckets=8)
    cow.create(["repo", "path"], {"repo": "string", "path": "string",
                                  "commit": "string", "lang": "string",
                                  "content": "string"})
    cow.merge_epoch(b0, 0)
    import pytest
    with pytest.raises(ValueError, match="mode"):
        cow.epoch_batch(0)
    with pytest.raises(ValueError, match="not committed"):
        t.epoch_batch(99)


def test_rebucket_grows_bucket_count_mid_history(spark, tmp_root):
    """Bucket-count evolution: epochs 0-1 land in 4 buckets, rebucket
    to 16, epoch 2 lands in the new layout — final state equals an
    untouched-table run, replay of pre-boundary epochs stays a no-op,
    and time travel reads the OLD snapshot under its own bucketing."""
    ch = gen_source_changes(spark, n_events=1500, n_keys=300, n_repos=10)
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    width = (hi - lo + 1 + 2) // 3

    p = CDCPipeline(spark, os.path.join(tmp_root, "g"), n_buckets=4)
    p.init_tables()
    slices = [
        ch.where((F.col("lsn") >= lo + e * width) & (F.col("lsn") < lo + (e + 1) * width))
        for e in range(3)
    ]
    p.process_epoch(slices[0], 0)
    p.process_epoch(slices[1], 1)
    pre_version = p.table._load_manifest()["version"]
    pre_state = sorted(map(str, p.current_state().collect()))

    rec = p.table.rebucket(16)
    assert rec["n_buckets"] == 16 and rec["old_n_buckets"] == 4
    assert p.table.n_buckets == 16
    # the rewrite itself changes nothing visible
    assert sorted(map(str, p.current_state().collect())) == pre_state

    p.process_epoch(slices[2], 2)
    # equality with a never-rebucketed run
    q = CDCPipeline(spark, os.path.join(tmp_root, "plain"), n_buckets=4)
    q.run(ch, n_epochs=3)
    assert_df_equal(p.current_state(), q.current_state(), "rebucketed == plain")

    # replay across the boundary is exactly-once
    assert p.process_epoch(slices[0], 0)["skipped_duplicate_epoch"]
    assert p.process_epoch(slices[2], 2)["skipped_duplicate_epoch"]

    # time travel: the pre-rebucket snapshot reads under ITS bucketing
    old = p.table.read_at(pre_version)
    new_pre = sorted(map(str, old.collect()))
    assert new_pre == pre_state

    # CDC-out across the boundary: the post-rebucket epoch's diff is
    # computed under the new bucketing and replays onto the old state
    diff = p.table.changes_for_epoch(2)
    assert diff.count() > 0

    # bucket-pruned point lookup works under the new count
    k = p.current_state().select("repo", "path").first()
    row = p.table.lookup({"repo": k["repo"], "path": k["path"]})
    assert row.count() == 1


def test_rebucket_mor_with_deltas_and_tombstones(spark, tmp_root):
    """Rebucket of a merge-on-read table folds base+deltas and keeps
    tombstones (replays of old epochs must not resurrect deleted
    keys); post-rebucket deltas stack on the new buckets."""
    ch = gen_source_changes(spark, n_events=1200, n_keys=240, n_repos=8)
    p = CDCPipeline(spark, os.path.join(tmp_root, "m"), n_buckets=4, merge_mode="mor")
    p.run(ch, n_epochs=3)
    before = sorted(map(str, p.current_state().collect()))
    rec = p.table.rebucket(8)
    assert rec["n_buckets"] == 8
    assert sorted(map(str, p.current_state().collect())) == before
    # deleted keys stay deleted on replay of every epoch
    p2 = CDCPipeline(spark, os.path.join(tmp_root, "m"), merge_mode="mor")
    recs = p2.run(ch, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert sorted(map(str, p2.current_state().collect())) == before


def test_compact_cluster_by_enables_rowgroup_pruning(spark, tmp_root):
    """compact(cluster_by=['lang']): bucket files sort by (lang, key)
    instead of (key), so row-group min/max stats on lang become tight
    and a selective lang predicate can SKIP row groups — measured here
    directly from the parquet footers against a key-sorted twin of the
    same data.  State must be identical either way."""
    import glob

    import pyarrow.parquet as pq

    from etl_cms_spark.sink.lake import LakeTable

    # small row groups so each ~15k-row bucket file holds several
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        langs = ["ada", "c", "go", "js", "py", "rs"]
        base = spark.range(60_000).select(
            F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("k"),
            F.element_at(
                F.array(*[F.lit(x) for x in langs]),
                (F.pmod(F.col("id"), F.lit(len(langs))) + 1).cast("int"),
            ).alias("lang"),
            F.repeat(F.sha2(F.col("id").cast("string"), 256), 3).alias("v"),
            (F.col("id") + 1).alias("lsn"),
            F.lit("U").alias("op"),
        )

        def build(name, cluster_by):
            t = LakeTable(
                spark, os.path.join(tmp_root, name), n_buckets=4,
                merge_mode="mor",
            )
            t.create(["k"], {"k": "string", "lang": "string", "v": "string"})
            t.merge_epoch(base.where("id % 2 = 0"), 0)
            t.merge_epoch(base.where("id % 2 = 1"), 1)
            t.compact(cluster_by=cluster_by)
            return t

        plain = build("plain", None)
        clustered = build("clust", ["lang"])
        assert_df_equal(clustered.read(), plain.read(), "layout is invisible")

        def overlap_ratio(t):
            files = glob.glob(
                os.path.join(t.root, "data", "v*-compact", "_bucket=*", "*.parquet")
            )
            assert files
            total = hit = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                idx = md.schema.to_arrow_schema().get_field_index("lang")
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(idx).statistics
                    total += 1
                    if st.min <= "go" <= st.max:
                        hit += 1
            return hit, total

        p_hit, p_total = overlap_ratio(plain)
        c_hit, c_total = overlap_ratio(clustered)
        assert p_total >= 8 and c_total >= 8  # several row groups exist
        # key-sorted layout: langs interleave, every row group overlaps
        assert p_hit == p_total
        # clustered layout: most row groups exclude the predicate value
        assert c_hit < c_total
        assert c_hit / c_total <= 0.5, (c_hit, c_total)

        # cluster_by must reference existing columns
        import pytest

        with pytest.raises(ValueError, match="no such columns"):
            plain.compact(cluster_by=["nope"])
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)


def test_bounded_tombstone_expiry_keeps_young_markers(spark, tmp_root):
    """expire_tombstones_below=L drops only markers with _lsn < L —
    the production retention rule.  Current state is invariant; a kept
    (young) tombstone still defeats an out-of-order older upsert,
    which is the whole reason the bound exists."""
    ch = gen_source_changes(spark, n_events=800, n_keys=200, n_repos=5)
    p = CDCPipeline(spark, os.path.join(tmp_root, "bts"), n_buckets=8, merge_mode="mor")
    p.run(ch, n_epochs=2)
    before = sorted(map(str, p.current_state().collect()))
    stats = p.table.tombstone_stats().collect()
    assert stats, "fixture must produce deletes"
    lo = min(r["min_lsn"] for r in stats)
    hi = max(r["max_lsn"] for r in stats)
    assert lo < hi, "need tombstones on both sides of a horizon"
    horizon = (lo + hi) // 2 + 1

    raw = p.table.read_raw().where(F.col("_deleted"))
    n_old = raw.where(F.col("_lsn") < horizon).count()
    n_young = raw.where(F.col("_lsn") >= horizon).count()
    assert n_old > 0 and n_young > 0

    rec = p.table.compact(expire_tombstones_below=horizon)
    assert rec["compacted_buckets"] > 0
    after = p.table.read_raw().where(F.col("_deleted"))
    assert after.where(F.col("_lsn") < horizon).count() == 0
    assert after.where(F.col("_lsn") >= horizon).count() == n_young
    assert sorted(map(str, p.current_state().collect())) == before

    # a kept tombstone still wins against an out-of-order OLDER upsert
    victim = after.orderBy(F.col("_lsn").desc()).first()
    stale = spark.createDataFrame(
        [(victim["repo"], victim["path"], "cX", "sql", "stale body",
          int(victim["_lsn"]) - 1, "U")],
        "repo string, path string, commit string, lang string, "
        "content string, lsn long, op string",
    )
    p.table.merge_epoch(
        stale.withColumn("concept_id", F.lit(1))
        .withColumn("domain", F.lit("script"))
        .withColumn("content_sha", F.sha2(F.col("content"), 256)),
        9000,
    )
    assert (
        p.table.read()
        .where((F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"]))
        .count()
        == 0
    ), "young tombstone must still suppress the stale upsert"


def test_maintenance_plans_tombstone_expiry(spark, tmp_root):
    """plan_maintenance(expire_tombstones_below=L) finds the buckets
    paying retention for old markers, folds their deltas in the SAME
    rewrite (no double compaction), and run_maintenance executes it."""
    from etl_cms_spark.sink.maintenance import plan_maintenance, run_maintenance

    ch = gen_source_changes(spark, n_events=800, n_keys=200, n_repos=5)
    p = CDCPipeline(spark, os.path.join(tmp_root, "mts"), n_buckets=8, merge_mode="mor")
    p.run(ch, n_epochs=3)
    before = sorted(map(str, p.current_state().collect()))
    hi = max(r["max_lsn"] for r in p.table.tombstone_stats().collect())
    horizon = int(hi) + 1  # everything is old -> expire all

    plan = plan_maintenance(
        p.table, max_depth=1, expire_tombstones_below=horizon
    )
    kinds = [a["action"] for a in plan["actions"]]
    assert "expire_tombstones" in kinds
    exp = next(a for a in plan["actions"] if a["action"] == "expire_tombstones")
    comp = [a for a in plan["actions"] if a["action"] == "compact"]
    if comp:  # expiry buckets must not be compacted twice
        assert not set(comp[0]["buckets"]) & set(exp["buckets"])

    results = run_maintenance(p.table, plan)
    assert any(r["action"] == "expire_tombstones" for r in results)
    assert p.table.read_raw().where(F.col("_deleted")).count() == 0
    assert sorted(map(str, p.current_state().collect())) == before
    # idempotent: a fresh plan finds nothing left to expire
    plan2 = plan_maintenance(p.table, max_depth=1, expire_tombstones_below=horizon)
    assert "expire_tombstones" not in [a["action"] for a in plan2["actions"]]


def test_epoch_batch_normalizes_across_rename_and_fails_loud_on_vacuum(
    spark, tmp_root
):
    """epoch_batch reads old delta files through the CURRENT logical
    schema (a pre-rename epoch comes back with the new column name),
    and a vacuumed epoch raises instead of returning a partial batch."""
    import pytest
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.sink.lake import LakeTable
    from pyspark.sql import functions as F

    ch = gen_source_changes(spark, n_events=900, n_keys=150, n_repos=5)
    sel = ["lsn", "op", "repo", "path", "commit", "lang", "content"]
    t = LakeTable(spark, os.path.join(tmp_root, "ebn"), n_buckets=4,
                  merge_mode="mor")
    t.create(["repo", "path"], {"repo": "string", "path": "string",
                                "commit": "string", "lang": "string",
                                "content": "string"})
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    t.merge_epoch(latest_by_lsn(ch.where(F.col("lsn") <= mid).select(*sel),
                                ["repo", "path"], "lsn"), 0)
    t.apply_schema_change({"rename": "lang:language"}, epoch=1)
    # the PRE-rename epoch reads back under the CURRENT name
    eb0 = t.epoch_batch(0)
    assert "language" in eb0.columns and "lang" not in eb0.columns
    assert eb0.where(F.col("op") == "U")\
              .where(F.col("language").isNull()).count() == 0

    t.merge_epoch(
        latest_by_lsn(ch.where(F.col("lsn") > mid).select(*sel),
                      ["repo", "path"], "lsn")
        .withColumnRenamed("lang", "language"),
        2,
    )
    t.compact()
    t.vacuum(keep_last=1)
    with pytest.raises(ValueError, match="vacuum"):
        t.epoch_batch(0)
