"""Merge-on-read vs copy-on-write equivalence + compaction safety."""

import os

from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.pipeline import CDCPipeline
from tests.conftest import assert_df_equal


def _run(spark, root, changes, **kw):
    p = CDCPipeline(spark, root, n_buckets=16, **kw)
    p.run(changes, n_epochs=3)
    return p


def test_mor_equals_cow(spark, changes, tmp_root):
    cow = _run(spark, os.path.join(tmp_root, "cow"), changes, merge_mode="cow")
    mor = _run(spark, os.path.join(tmp_root, "mor"), changes, merge_mode="mor")
    assert_df_equal(cow.current_state(), mor.current_state(), "mor == cow")


def test_compaction_preserves_state(spark, changes, tmp_root):
    mor = _run(spark, os.path.join(tmp_root, "m"), changes, merge_mode="mor")
    before = mor.current_state().collect()
    rec = mor.table.compact()
    assert rec["compacted_buckets"] > 0
    after = mor.current_state()
    assert sorted(map(str, before)) == sorted(map(str, after.collect()))
    # post-compaction every bucket has a single dir
    m = mor.table._load_manifest()
    assert all(len(mor.table._bucket_dirs(m, b)) == 1 for b in m["buckets"])


def test_mor_epoch_is_append_only(spark, changes, tmp_root):
    mor = _run(spark, os.path.join(tmp_root, "m2"), changes, merge_mode="mor")
    m = mor.table._load_manifest()
    # 3 epochs touching overlapping buckets -> delta lists accumulate
    assert any(len(mor.table._bucket_dirs(m, b)) > 1 for b in m["buckets"])


def test_mor_replay_skips(spark, changes, tmp_root):
    mor = _run(spark, os.path.join(tmp_root, "m3"), changes, merge_mode="mor")
    before = mor.current_state()
    recs = mor.run(changes, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert_df_equal(mor.current_state(), before, "mor replay")


def test_auto_compaction(spark, changes, tmp_root):
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "m4"), n_buckets=16,
        merge_mode="mor", compact_every=2,
    )
    recs = p.run(changes, n_epochs=4)
    assert any("compaction" in r for r in recs)
    cow = _run(spark, os.path.join(tmp_root, "c4"), changes, merge_mode="cow")
    # run() above used 4 epochs; rerun cow with 4 for comparability
    import shutil
    shutil.rmtree(os.path.join(tmp_root, "c4"), ignore_errors=True)
    c = CDCPipeline(spark, os.path.join(tmp_root, "c4b"), n_buckets=16)
    c.run(changes, n_epochs=4)
    assert_df_equal(p.current_state(), c.current_state(), "auto-compacted mor == cow")


def test_mor_tombstone_expiry(spark, tmp_root):
    ch = gen_source_changes(spark, n_events=800, n_keys=200, n_repos=10)
    p = CDCPipeline(spark, os.path.join(tmp_root, "m5"), n_buckets=8, merge_mode="mor")
    p.run(ch, n_epochs=2)
    state_before = p.current_state()
    p.table.compact(expire_tombstones=True)
    assert_df_equal(p.current_state(), state_before, "expiry preserves live rows")


def test_depth_based_compaction_bounds_read_amplification(spark, tmp_root):
    """compact_depth: the base+delta stack per bucket must never
    exceed the policy depth + 1 (the epoch that trips the trigger),
    regardless of epoch count, and state is unchanged by compaction."""
    import os

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    ch = gen_source_changes(spark, n_events=1600, n_keys=100, n_repos=5)
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "cd"), n_buckets=4,
        merge_mode="mor", compact_depth=3,
    )
    p.run(ch, n_epochs=8)
    assert p.table.max_delta_depth() <= 4
    assert any("compaction" in r for r in p.metrics)
    plain = CDCPipeline(spark, os.path.join(tmp_root, "cd_plain"), n_buckets=4)
    plain.run(ch, n_epochs=8)
    assert_df_equal(p.current_state(), plain.current_state(), "depth-compacted == plain")


def test_mor_widen_then_delta_is_readable(spark, tmp_root):
    """Round-4 soak finding, pinned: a MoR delta stack mixing int and
    long physical files for a widened column must read correctly
    (mergeSchema refuses int-vs-long; the read normalizes per write
    group instead)."""
    from etl_cms_spark.sink.lake import LakeTable
    from pyspark.sql import functions as F

    t = LakeTable(spark, os.path.join(tmp_root, "widen_mor"), n_buckets=2,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "size": "int"})
    rows = lambda vals, lsn0: spark.createDataFrame(  # noqa: E731
        [(f"k{i}", v, lsn0 + i, "U") for i, v in enumerate(vals)],
        "k string, size long, lsn long, op string",
    )
    t.merge_epoch(rows([1, 2, 3], 0), 0)          # int physical files
    t.apply_schema_change({"widen": "size:long"})
    t.merge_epoch(rows([10, 20], 100), 1)         # long physical files
    got = {r["k"]: r["size"] for r in t.read().collect()}
    assert got == {"k0": 10, "k1": 20, "k2": 3}
    assert dict(t.read().dtypes)["size"] == "bigint"
    # compaction folds the mixed-type stack cleanly too
    t.compact()
    got2 = {r["k"]: r["size"] for r in t.read().collect()}
    assert got2 == got


def test_mor_equal_lsn_tie_breaks_to_later_write(spark, tmp_root):
    """Round-4 ADVICE (medium): two rows for the same key at the SAME
    LSN in different MoR writes — e.g. an epoch's tombstone and a
    later quarantine repair re-offered at the original LSN — must
    resolve deterministically to the more recently COMMITTED write
    (the MoR analogue of CoW's explicit batch-beats-table ">=" rule),
    and compaction must preserve that resolution."""
    from etl_cms_spark.sink.lake import LakeTable

    def batch(rows):
        return spark.createDataFrame(rows, "k int, v string, op string, lsn long")

    t = LakeTable(spark, os.path.join(tmp_root, "tie"), n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "int", "v": "string"})
    t.merge_epoch(batch([(1, "orig", "U", 5), (2, "keep", "U", 5)]), 0)
    t.merge_epoch(batch([(1, None, "D", 10)]), 1)          # tombstone @10
    t.merge_epoch(batch([(1, "repaired", "U", 10)]), 2)    # repair @ SAME lsn
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) == [
        (1, "repaired"), (2, "keep"),
    ]
    t.compact()
    assert sorted((r["k"], r["v"]) for r in t.read().collect()) == [
        (1, "repaired"), (2, "keep"),
    ]

    # mirror order: upsert first, tombstone in a LATER write at the
    # same LSN -> the key stays deleted.
    t2 = LakeTable(spark, os.path.join(tmp_root, "tie2"), n_buckets=4, merge_mode="mor")
    t2.create(["k"], {"k": "int", "v": "string"})
    t2.merge_epoch(batch([(1, "orig", "U", 10)]), 0)
    t2.merge_epoch(batch([(1, None, "D", 10)]), 1)
    assert t2.read().where(F.col("k") == 1).count() == 0


def test_undeduped_single_dir_delta_still_resolves(spark, tmp_root):
    """merge_epoch(skip_batch_dedup=True) may write several rows per
    key into ONE delta dir (demux slices do: an upsert plus a
    higher-LSN routing tombstone).  On a FRESH bucket that dir is the
    whole stack — the read must still run per-key max-LSN resolution,
    or the tombstone is filtered and the stale upsert resurrects."""
    import os

    from etl_cms_spark.sink.lake import LakeTable

    root = os.path.join(tmp_root, "undeduped")
    t = LakeTable(spark, root, n_buckets=2, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "int"})
    batch = spark.createDataFrame(
        [("a", 1, "U", 5), ("a", None, "D", 10), ("b", 2, "U", 7)],
        "k string, v int, op string, lsn long",
    )
    t.merge_epoch(batch, 0, skip_batch_dedup=True)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows == {"b": 2}, f"stale upsert resurrected past its tombstone: {rows}"
    # count_where must agree (it rides the same resolution gate)
    assert t.read().count() == 1
