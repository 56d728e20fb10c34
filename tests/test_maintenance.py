"""Maintenance planner (sink/maintenance.py) + selective compaction
(LakeTable.compact(buckets=...)): fold only the buckets that need it,
decided from the table's own metadata layer."""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.sink.lake import LakeTable
from etl_cms_spark.sink.maintenance import plan_maintenance, run_maintenance
from tests.conftest import assert_df_equal


def _mk_skewed(spark, root, n_epochs_hot=5):
    """Base epoch covers all 4 buckets; then n_epochs_hot epochs touch
    ONE key — only its bucket deepens."""
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "int"})
    base = [(f"k{i:03d}", i, "U", i + 1) for i in range(80)]
    t.merge_epoch(
        spark.createDataFrame(base, "k string, v int, op string, lsn long"), 0
    )
    for e in range(n_epochs_hot):
        t.merge_epoch(
            spark.createDataFrame(
                [("k000", 1000 + e, "U", 1000 + e)],
                "k string, v int, op string, lsn long",
            ),
            e + 1,
        )
    return t


def test_selective_compact_folds_only_chosen_buckets(spark, tmp_root):
    t = _mk_skewed(spark, os.path.join(tmp_root, "sel"))
    depths = t.delta_depths()
    hot = [b for b, d in depths.items() if d == max(depths.values())]
    cold_before = {b: d for b, d in depths.items() if b not in hot}
    before = t.read().collect()

    rec = t.compact(buckets=hot)
    assert rec["compacted_buckets"] == len(hot)

    after = t.delta_depths()
    for b in hot:
        assert after[b] == 1, f"hot bucket {b} not folded: {after}"
    for b, d in cold_before.items():
        assert after[b] == d, f"cold bucket {b} was rewritten: {after}"
    assert_df_equal(
        t.read(), spark.createDataFrame(before, t.read().schema),
        "selective compaction never changes query results",
    )


def test_selective_compact_unknown_bucket_refuses(spark, tmp_root):
    t = _mk_skewed(spark, os.path.join(tmp_root, "unk"), n_epochs_hot=1)
    with pytest.raises(ValueError, match="no such buckets"):
        t.compact(buckets=[99])


def test_plan_picks_deep_buckets_and_run_fixes_them(spark, tmp_root):
    t = _mk_skewed(spark, os.path.join(tmp_root, "plan"))
    plan = plan_maintenance(t, max_depth=2, min_small_files=None)
    compacts = [a for a in plan["actions"] if a["action"] == "compact"]
    assert len(compacts) == 1
    deep_true = sorted(b for b, d in t.delta_depths().items() if d > 2)
    assert compacts[0]["buckets"] == deep_true
    assert all("depth" in r for r in compacts[0]["reasons"].values())

    before = t.read().collect()
    results = run_maintenance(t, plan)
    assert results[0]["action"] == "compact"
    assert max(t.delta_depths().values()) <= 2
    assert_df_equal(
        t.read(), spark.createDataFrame(before, t.read().schema),
        "maintenance never changes query results",
    )
    # a second planning pass over the repaired table is a no-op
    assert plan_maintenance(t, max_depth=2, min_small_files=None)["actions"] == []


def test_plan_small_files_reason(spark, tmp_root):
    """Five one-row delta files in one bucket: tiny mean file size at
    depth > 1 -> small_files reason even with a high depth cap."""
    t = _mk_skewed(spark, os.path.join(tmp_root, "small"))
    plan = plan_maintenance(
        t, max_depth=None, min_small_files=3, small_file_bytes=32 << 20
    )
    compacts = [a for a in plan["actions"] if a["action"] == "compact"]
    assert len(compacts) == 1
    assert any(
        "small_files" in r for r in compacts[0]["reasons"].values()
    ), compacts[0]


def test_plan_retention_vacuum(spark, tmp_root):
    t = _mk_skewed(spark, os.path.join(tmp_root, "ret"))
    plan = plan_maintenance(
        t, max_depth=None, min_small_files=None, keep_last_snapshots=2
    )
    assert plan["actions"] == [{"action": "vacuum", "keep_last": 2}]
    results = run_maintenance(t, plan)
    assert results[0]["action"] == "vacuum"
    assert (
        plan_maintenance(
            t, max_depth=None, min_small_files=None, keep_last_snapshots=2
        )["actions"]
        == []
    )


def test_plan_cow_never_compacts(spark, tmp_root):
    t = LakeTable(spark, os.path.join(tmp_root, "cow"), n_buckets=4, merge_mode="cow")
    t.create(["k"], {"k": "string", "v": "int"})
    for e in range(4):
        t.merge_epoch(
            spark.createDataFrame(
                [("a", e, "U", e + 1)], "k string, v int, op string, lsn long"
            ),
            e,
        )
    plan = plan_maintenance(t, max_depth=1)
    assert [a["action"] for a in plan["actions"]] == []


def test_pipeline_depth_trigger_is_selective(spark, tmp_root):
    """CDCPipeline(compact_depth=N) under CONCENTRATED skew (a broad
    base epoch, then epochs touching one key): the triggered
    compaction folds only the hot key's bucket, the cold buckets keep
    their depth-2 stacks untouched, and depth stays bounded."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, 1200, 400, 10)
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "pipe"), n_buckets=16,
        merge_mode="mor", compact_depth=2,
    )
    p.init_tables()
    # broad base: the first merge writes every bucket's base (depth 1)
    p.process_epoch(changes, 0)
    base_dirs = {
        b: tuple(p.table._bucket_dirs(p.table._load_manifest(), str(b)))
        for b in range(16)
    }
    hot = changes.orderBy("lsn").limit(1).select("repo", "path").first()
    hot_only = changes.where(
        (F.col("repo") == hot["repo"]) & (F.col("path") == hot["path"])
    ).withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
    for e in range(1, 5):
        p.process_epoch(
            hot_only.withColumn("lsn", F.col("lsn") + F.lit(e)), e
        )
    comps = [r["compaction"] for r in p.metrics if "compaction" in r]
    assert comps, "depth trigger never fired"
    # each triggered fold touched only the hot bucket, never all 16
    assert all(c["compacted_buckets"] == 1 for c in comps), comps
    depths = p.table.delta_depths()
    assert max(depths.values()) <= 3  # trigger fires at cap+1, folds to 1
    # the cold buckets still reference their ORIGINAL base dirs — the
    # selective folds never rewrote them
    m = p.table._load_manifest()
    end_dirs = {
        b: tuple(p.table._bucket_dirs(m, str(b))) for b in range(16)
    }
    untouched = [b for b in range(16) if end_dirs[b] == base_dirs[b]]
    assert len(untouched) >= 15, f"cold buckets were rewritten: {end_dirs}"


def test_pipeline_scheduled_vacuum_bounds_history(spark, tmp_root):
    """CDCPipeline(vacuum_every=2, vacuum_keep_last=3): retention runs
    inside the epoch loop, the manifest history stays bounded, state
    stays correct, and replay (exactly-once) still works because epoch
    records ride the CURRENT manifest, not the expired ones."""
    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn
    from etl_cms_spark.plans.mapping import CONCEPT_MAP
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, 2000, 300, 12)
    root = os.path.join(tmp_root, "vac")
    p = CDCPipeline(
        spark, root, n_buckets=8, merge_mode="mor",
        vacuum_every=2, vacuum_keep_last=3,
    )
    p.run(changes, n_epochs=6)
    assert any("vacuum" in r for r in p.metrics)
    mdir = os.path.join(root, "tables", "files", "_manifests")
    n_manifests = len([f for f in os.listdir(mdir) if f.startswith("v")])
    assert n_manifests <= 5, f"history unbounded: {n_manifests} manifests"

    exp = (
        latest_by_lsn(changes.where(F.col("op") != "SCHEMA"), ["repo", "path"], "lsn")
        .where(F.col("op") != "D")
        .where(F.col("lang").isin(list(CONCEPT_MAP.keys())))
        .select("repo", "path", "commit")
    )
    assert_df_equal(
        p.current_state().select("repo", "path", "commit"), exp,
        "state correct under scheduled vacuum",
    )
    # replay after vacuum: every epoch skips as a duplicate
    p2 = CDCPipeline(
        spark, root, n_buckets=8, merge_mode="mor",
        vacuum_every=2, vacuum_keep_last=3,
    )
    recs = p2.run(changes, n_epochs=6)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)


def test_merge_mode_persisted_on_reopen(spark, tmp_root):
    """merge_mode rides the manifest like n_buckets: a reopener that
    defaults (or misstates) the mode gets the table's true mode — the
    planner and CLI read it without being told."""
    root = os.path.join(tmp_root, "modep")
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(["k"], {"k": "string", "v": "int"})
    t.merge_epoch(
        spark.createDataFrame([("a", 1, "U", 1)], "k string, v int, op string, lsn long"),
        0,
    )
    assert LakeTable(spark, root).merge_mode == "mor"          # default reopen
    assert LakeTable(spark, root, merge_mode="cow").merge_mode == "mor"


def test_run_maintenance_retries_on_concurrent_commit(spark, tmp_root, monkeypatch):
    """A merge racing the planned compaction: run_maintenance re-derives
    the bucket list against the new snapshot and retries instead of
    dying; the final state includes BOTH the merge and the fold."""
    from etl_cms_spark.sink.lake import LakeTable as LT

    t = _mk_skewed(spark, os.path.join(tmp_root, "race"))
    plan = plan_maintenance(t, max_depth=2, min_small_files=None)
    assert plan["actions"], "precondition: something to compact"

    writer = LakeTable(spark, t.root, n_buckets=4, merge_mode="mor")
    orig = LT._commit_manifest
    state = {"fired": False}

    def hooked(self, manifest):
        if self is t and not state["fired"]:
            state["fired"] = True
            writer.merge_epoch(
                spark.createDataFrame(
                    [("k000", 9999, "U", 9999)],
                    "k string, v int, op string, lsn long",
                ),
                99,
            )
        return orig(self, manifest)

    monkeypatch.setattr(LT, "_commit_manifest", hooked)
    attempts = []
    orig_compact = t.compact

    def counting_compact(*a, **kw):
        attempts.append(kw.get("buckets"))
        return orig_compact(*a, **kw)

    monkeypatch.setattr(t, "compact", counting_compact)
    results = run_maintenance(t, plan)
    assert results[0]["action"] == "compact"
    assert "skipped_concurrent" not in results[0], results
    assert len(attempts) == 2, f"retry path not exercised: {attempts}"
    got = t.read().where("k = 'k000'").select("v").first()
    assert got["v"] == 9999, "racing merge must survive the fold"


def test_plan_refresh_stats_policy(spark, tmp_root):
    """Once a table opts into the pruning cache (one refresh_stats
    call), the planner notices uncovered live dirs after new epochs
    and schedules a refresh — LAST, so a compaction in the same plan
    gets its new dirs covered by the same run."""
    t = _mk_skewed(spark, os.path.join(tmp_root, "mstats"), n_epochs_hot=5)
    # no cache, no stats_cols -> no stats action
    plan0 = plan_maintenance(t, max_depth=4)
    assert not [a for a in plan0["actions"] if a["action"] == "refresh_stats"]
    t.refresh_stats(["v"])  # opt in
    t.merge_epoch(
        spark.createDataFrame(
            [("k001", 7, "U", 5000)], "k string, v int, op string, lsn long"
        ),
        99,
    )
    plan = plan_maintenance(t, max_depth=4)
    acts = [a["action"] for a in plan["actions"]]
    assert "refresh_stats" in acts
    assert acts[-1] == "refresh_stats"  # ordered after compact/vacuum
    assert plan["stats"]["stats_dirs_missing"] > 0
    res = run_maintenance(t, plan)
    ref = [r for r in res if r["action"] == "refresh_stats"]
    assert ref and ref[0]["files_scanned"] > 0
    # steady state: everything covered (incl. dirs the compaction wrote)
    plan2 = plan_maintenance(t, max_depth=4)
    assert not [a for a in plan2["actions"] if a["action"] == "refresh_stats"]
    assert plan2["stats"]["stats_dirs_missing"] == 0
    # explicit stats_cols overrides cache-derived columns
    plan3 = plan_maintenance(t, max_depth=4, stats_cols=["k", "v"])
    assert [a for a in plan3["actions"] if a["action"] == "refresh_stats"]
