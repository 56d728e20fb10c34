"""Planning-time file pruning from the manifest-layer stats cache
(sink/stats.py): read_where == read().where() always, and after a
clustered + file-capped compaction the plan provably skips files."""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.sink.lake import LakeTable
from tests.conftest import assert_df_equal

LANGS = ["ada", "c", "go", "js", "py", "rs"]


def _base(spark, n=30_000):
    return spark.range(n).select(
        F.concat(F.lit("k"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("k"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(8192)).cast("int").alias("num"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.col("id"), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
        (F.col("id") + 1).alias("lsn"),
        F.when(F.pmod(F.col("id"), F.lit(37)) == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )


def _make(spark, root, compacted=False, **compact_kw):
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor")
    t.create(
        ["k"], {"k": "string", "num": "int", "lang": "string", "v": "string"}
    )
    base = _base(spark)
    t.merge_epoch(base.where("id % 2 = 0"), 0)
    t.merge_epoch(base.where("id % 2 = 1"), 1)
    if compacted:
        t.compact(**compact_kw)
    return t


def test_read_where_equals_filter_on_mor_stack(spark, tmp_root):
    """No compaction, no stats: stacked buckets read whole, results
    identical, plan admits everything (cold cache = plain read)."""
    t = _make(spark, os.path.join(tmp_root, "sp_stack"))
    preds = {"num": (1000, 2999), "lang": ("go", "go")}
    plan = t.plan_where(preds)
    assert plan["files_read"] == plan["files_total"] > 0
    assert plan["buckets_read"] == plan["buckets_total"]
    expect = t.read().where("num between 1000 and 2999 and lang = 'go'")
    assert_df_equal(t.read_where(preds), expect, "stacked, cold cache")


def test_read_where_prunes_files_after_clustered_compact(spark, tmp_root):
    """Z-order + target_file_rows -> several files per bucket, each a
    contiguous curve slice; refresh_stats + read_where then skips
    files at PLANNING time, results byte-identical."""
    t = _make(
        spark,
        os.path.join(tmp_root, "sp_zc"),
        compacted=True,
        cluster_by=["num", "lang"],
        cluster_layout="zorder",
        target_file_rows=1500,
    )
    r = t.refresh_stats(["num", "lang"])
    assert r["files_scanned"] > 4  # several files per bucket exist
    preds = {"lang": ("go", "go")}
    plan = t.plan_where(preds)
    assert plan["files_total"] > 8
    assert plan["files_read"] < plan["files_total"], plan
    expect = t.read().where("lang = 'go'")
    assert_df_equal(t.read_where(preds), expect, "zorder pruned read")

    # leading numeric column prunes too
    plan_n = t.plan_where({"num": (0, 799)})
    assert plan_n["files_read"] < plan_n["files_total"], plan_n
    assert_df_equal(
        t.read_where({"num": (0, 799)}),
        t.read().where("num between 0 and 799"),
        "numeric pruned read",
    )
    # refresh is incremental: immutable dirs are never re-read
    assert t.refresh_stats(["num", "lang"])["files_scanned"] == 0

    cov = t.stats_coverage()
    assert cov["dirs_covered"] == cov["dirs_total"] > 0
    assert cov["cols"] == ["lang", "num"]
    assert cov["files_covered"] == plan["files_total"]

    # the physical scan's file list IS the admitted list — pruning
    # happened at planning time, not behind a runtime filter
    scanned = {p.replace("file:", "").replace("///", "/")
               for p in t.read_where(preds).inputFiles()}
    admitted = {f for fs in plan["admit_files"].values() for f in fs}
    assert scanned <= admitted, scanned - admitted
    assert len(scanned) == plan["files_read"]


def test_whole_table_skip_out_of_range(spark, tmp_root):
    t = _make(
        spark,
        os.path.join(tmp_root, "sp_skip"),
        compacted=True,
        cluster_by=["num"],
        target_file_rows=1500,
    )
    t.refresh_stats(["num"])
    plan = t.plan_where({"num": (10_000_000, 20_000_000)})
    assert plan["buckets_read"] == 0 and plan["files_read"] == 0
    assert t.read_where({"num": (10_000_000, 20_000_000)}).count() == 0


def test_stacked_bucket_whole_skip_needs_full_coverage(spark, tmp_root):
    """A bucket with a delta stack may be skipped only WHOLE and only
    when every file has stats excluding the predicate."""
    t = _make(spark, os.path.join(tmp_root, "sp_cov"))
    t.refresh_stats(["num"])
    # fully covered + out of range -> all stacked buckets skip
    plan = t.plan_where({"num": (10_000_000, 20_000_000)})
    assert plan["buckets_read"] == 0
    # in-range predicate on a stack -> whole buckets read (no file cuts)
    plan2 = t.plan_where({"num": (0, 99)})
    assert plan2["buckets_read"] == plan2["buckets_total"]
    assert plan2["files_read"] == plan2["files_total"]
    assert_df_equal(
        t.read_where({"num": (0, 99)}),
        t.read().where("num between 0 and 99"),
        "stacked in-range",
    )


def test_rename_evolution_admits_old_files(spark, tmp_root):
    """Files written before a rename carry the OLD physical name; the
    cache has no entry for the new name -> conservative admit, results
    still correct through _normalize."""
    root = os.path.join(tmp_root, "sp_ren")
    t = _make(spark, root, compacted=True, cluster_by=["lang"],
              target_file_rows=1500)
    t.refresh_stats(["lang"])
    t.apply_schema_change({"rename": "lang:language"})
    preds = {"language": ("go", "go")}
    plan = t.plan_where(preds)
    assert plan["files_read"] == plan["files_total"]  # nothing provable
    assert_df_equal(
        t.read_where(preds),
        t.read().where("language = 'go'"),
        "post-rename read_where",
    )


def test_refresh_and_read_where_guards(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "sp_guard"))
    with pytest.raises(ValueError, match="no such columns"):
        t.refresh_stats(["nope"])
    with pytest.raises(ValueError, match="no such column"):
        t.plan_where({"nope": (0, 1)})
    t2 = LakeTable(
        spark, os.path.join(tmp_root, "sp_pc"), n_buckets=4, merge_mode="mor"
    )
    t2.create(["k"], {"k": "string", "a": "int", "b": "int"},
              partial_columnar=True)
    with pytest.raises(ValueError, match="partial_columnar"):
        t2.plan_where({"a": (0, 1)})


def test_vacuumed_dirs_drop_from_cache(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "sp_vac"))
    t.refresh_stats(["num"])
    from etl_cms_spark.sink.stats import load_stats

    before = set(load_stats(t.root)["dirs"])
    t.compact()  # folds the stack; old dirs leave the manifest
    t.vacuum(keep_last=1)
    t.refresh_stats(["num"])
    after = set(load_stats(t.root)["dirs"])
    assert after and after != before
    # every cached dir is live in the current manifest
    m = t._load_manifest()
    live = {d for b in m["buckets"] for d in t._bucket_dirs(m, b)}
    assert after <= live
    assert_df_equal(
        t.read_where({"num": (0, 99)}),
        t.read().where("num between 0 and 99"),
        "post-vacuum read_where",
    )


def test_key_equality_prunes_to_one_bucket(spark, tmp_root):
    """Predicates pinning the full key to one value plan exactly one
    hash bucket (lookup's driver-side prune) and agree with both
    read().where() and lookup()."""
    t = _make(spark, os.path.join(tmp_root, "sp_key"))
    key = "k0000200"
    preds = {"k": (key, key)}
    plan = t.plan_where(preds)
    assert plan["key_bucket"] is not None
    assert plan["buckets_read"] <= 1
    assert plan["bucket_ids"] in ([], [plan["key_bucket"]])
    assert_df_equal(
        t.read_where(preds), t.read().where(F.col("k") == key), "key read_where"
    )
    assert_df_equal(t.read_where(preds), t.lookup({"k": key}), "vs lookup")
    # key + value predicate compound in one plan
    both = t.read_where({"k": (key, key), "num": (0, 10_000)})
    exp = t.read().where(f"k = '{key}' and num between 0 and 10000")
    assert_df_equal(both, exp, "key + value predicates")


def test_read_where_time_travel(spark, tmp_root):
    """version= plans against the older manifest: pre-compaction
    snapshots read their own dir set, results == read_at().where()."""
    t = _make(spark, os.path.join(tmp_root, "sp_tt"))
    v_before = t._load_manifest()["version"]
    t.compact(cluster_by=["lang"], cluster_layout="zorder",
              target_file_rows=1500)
    t.refresh_stats(["lang"])
    preds = {"lang": ("go", "go")}
    # current snapshot prunes; the old one reads its (stacked) dirs whole
    assert t.plan_where(preds)["files_read"] < t.plan_where(preds)["files_total"]
    old = t.plan_where(preds, version=v_before)
    assert old["files_read"] == old["files_total"]
    assert_df_equal(
        t.read_where(preds, version=v_before),
        t.read_at(v_before).where("lang = 'go'"),
        "time-travel read_where",
    )


def test_membership_predicates(spark, tmp_root):
    """Lists mean IN: files admit iff any value falls in [min,max];
    results == read().where(isin); a 1-element list on the full key
    takes the single-bucket fast path."""
    t = _make(
        spark,
        os.path.join(tmp_root, "sp_in"),
        compacted=True,
        cluster_by=["lang"],
        cluster_layout="zorder",
        target_file_rows=1500,
    )
    t.refresh_stats(["lang", "num"])
    preds = {"lang": ["ada", "rs"]}
    plan = t.plan_where(preds)
    assert plan["files_read"] < plan["files_total"], plan
    assert_df_equal(
        t.read_where(preds),
        t.read().where(F.col("lang").isin("ada", "rs")),
        "IN pruned read",
    )
    # mixed range + membership
    mixed = {"lang": ["go"], "num": (0, 4000)}
    assert_df_equal(
        t.read_where(mixed),
        t.read().where("lang = 'go' and num between 0 and 4000"),
        "mixed predicates",
    )
    # single-value IN on the key -> one-bucket plan
    plan_k = t.plan_where({"k": ["k0000123"]})
    assert plan_k["key_bucket"] is not None and plan_k["buckets_read"] <= 1
    # guards
    with pytest.raises(ValueError, match="empty IN list"):
        t.plan_where({"lang": []})
    with pytest.raises(ValueError, match="range tuple"):
        t.plan_where({"num": (1, 2, 3)})
    with pytest.raises(ValueError, match="tuple or a"):
        t.plan_where({"num": 5})


def test_pipeline_refreshes_stats_after_scheduled_compaction(spark, tmp_root):
    """CDCPipeline(stats_cols=[...]) keeps the pruning cache covered
    right after each scheduled compaction rewrites dirs."""
    import tempfile

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import CDCPipeline

    changes = gen_source_changes(spark, 2000, 300, 12)
    root = os.path.join(tmp_root, "sp_pipe")
    p = CDCPipeline(spark, root, merge_mode="mor", compact_every=2,
                    compact_cluster_by=["lang"],
                    compact_cluster_layout="zorder",
                    stats_cols=["lang"], member_cols=["commit"])
    p.init_tables()
    recs = p.run(changes, n_epochs=4)
    refreshed = [r["stats_refresh"] for r in recs if "stats_refresh" in r]
    assert refreshed and any(r["files_scanned"] > 0 for r in refreshed)
    mrefreshed = [r["member_refresh"] for r in recs if "member_refresh" in r]
    assert mrefreshed and any(r["files_scanned"] > 0 for r in mrefreshed)
    t = p.table
    plan = t.plan_where({"lang": ("go", "go")})
    # compacted dirs are covered; later epochs' deltas admit conservatively
    assert plan["files_total"] > 0
    assert_df_equal(
        t.read_where({"lang": ("go", "go")}),
        t.read().where("lang = 'go'"),
        "pipeline-maintained cache",
    )
    # membership sketch maintained the same way: a live commit's point
    # lookup equals the plain filtered read
    probe = t.read().select("commit").first()["commit"]
    assert_df_equal(
        t.read_where({"commit": (probe, probe)}),
        t.read().where(F.col("commit") == probe),
        "pipeline-maintained member sketch",
    )


def test_widen_evolution_keeps_pruning_safe(spark, tmp_root):
    """Stats recorded while num was int stay valid after a widen to
    long (values compare numerically); post-widen files record longs."""
    t = _make(spark, os.path.join(tmp_root, "sp_widen"), compacted=True,
              cluster_by=["num"], target_file_rows=1500)
    t.refresh_stats(["num"])
    t.apply_schema_change({"widen": "num:long"})
    big = spark.createDataFrame(
        [("kwide", 3_000_000_000, "go", "x", "U", 10_000_000)],
        "k string, num long, lang string, v string, op string, lsn long",
    )
    t.merge_epoch(big, 7)
    t.refresh_stats(["num"])
    preds = {"num": (2_999_999_999, 3_000_000_001)}
    got = t.read_where(preds)
    assert [r.k for r in got.collect()] == ["kwide"]
    assert_df_equal(
        t.read_where({"num": (0, 799)}),
        t.read().where("num between 0 and 799"),
        "pre-widen range still prunes correctly",
    )


def test_rebucket_then_read_where(spark, tmp_root):
    """Bucket-count evolution: plans use the NEW manifest's bucket set
    and count (key fast path included); old stats dirs left the
    manifest, so the cache re-covers on refresh."""
    t = _make(spark, os.path.join(tmp_root, "sp_rb"))
    t.refresh_stats(["lang"])
    t.rebucket(16)
    t.refresh_stats(["lang"])
    cov = t.stats_coverage()
    assert cov["dirs_covered"] == cov["dirs_total"] > 0
    key = "k0000321"
    plan = t.plan_where({"k": (key, key)})
    assert plan["buckets_total"] == 16 and plan["buckets_read"] <= 1
    assert_df_equal(
        t.read_where({"k": (key, key)}), t.lookup({"k": key}),
        "post-rebucket key plan",
    )
    assert_df_equal(
        t.read_where({"lang": ("go", "go")}),
        t.read().where("lang = 'go'"),
        "post-rebucket value predicate",
    )


def test_drop_readd_stale_stats_stay_safe(spark, tmp_root):
    """Old files carry data (and cached stats) for a dropped-then-
    re-added column, but the read path hides those physical values
    (they read as NULL).  ANY stats decision on them is safe: an
    exclusion drops rows that would read NULL and fail the
    null-rejecting predicate anyway; an admission leaves the residual
    filter to drop them.  Pin both directions."""
    t = _make(spark, os.path.join(tmp_root, "sp_drop"), compacted=True,
              cluster_by=["num"], target_file_rows=1500)
    t.refresh_stats(["num"])
    t.apply_schema_change({"drop": "num"})
    t.apply_schema_change({"add": "num:int"})
    fresh = spark.createDataFrame(
        [("knew", 77, "go", "x", "U", 20_000_000)],
        "k string, num int, lang string, v string, op string, lsn long",
    )
    t.merge_epoch(fresh, 8)
    # in-range vs the STALE stats (old files admitted or not — rows
    # read NULL and fail): only the fresh row may match
    got = t.read_where({"num": (0, 10_000)})
    exp = t.read().where("num between 0 and 10000")
    assert_df_equal(got, exp, "drop/re-add read_where")
    assert [r.k for r in got.collect()] == ["knew"]


# ---------------------------------------------------------------------
# Membership sketches (Bloom-style): equality/IN pruning on unclustered
# high-cardinality columns, where min/max stats are structurally
# useless (random sha256 strings span ~the full range in EVERY file).
# ---------------------------------------------------------------------


def _some_v(t, k="k0000042"):
    """A value actually present in the table, plus one provably absent."""
    present = t.read().where(F.col("k") == k).first()["v"]
    return present, "0" * 64  # sha256 hex never all-zeros here


def test_member_sketch_prunes_equality_on_unclustered_column(spark, tmp_root):
    """min/max on a random-hash column admits ~every file; the
    membership sketch prunes the same probe to the files that actually
    contain it — and proves an absent value reads ZERO files."""
    t = _make(spark, os.path.join(tmp_root, "mb_eq"), compacted=True,
              cluster_by=["num"], target_file_rows=1500)
    t.refresh_stats(["v"])
    present, absent = _some_v(t)
    plan_minmax = t.plan_where({"v": (present, present)})
    # random hashes: ranges overlap everywhere, minmax can't prune much
    assert plan_minmax["files_read"] > plan_minmax["files_total"] // 2

    t.refresh_member_stats(["v"])
    plan = t.plan_where({"v": (present, present)})
    assert 1 <= plan["files_read"] < plan_minmax["files_read"]
    assert_df_equal(
        t.read_where({"v": (present, present)}),
        t.read().where(F.col("v") == present),
        "member-pruned equality",
    )
    plan_absent = t.plan_where({"v": (absent, absent)})
    assert plan_absent["files_read"] == 0
    assert t.read_where({"v": (absent, absent)}).count() == 0
    cov = t.stats_coverage()
    assert cov["member_cols"] == ["v"]


def test_member_sketch_in_list_composes_with_ranges(spark, tmp_root):
    """IN over (present, absent) values plus a numeric range: the
    sketch admits only the present value's files, the range applies as
    residual — results identical to the plain filtered read."""
    t = _make(spark, os.path.join(tmp_root, "mb_in"), compacted=True,
              cluster_by=["num"], target_file_rows=1500)
    t.refresh_member_stats(["v"])
    present, absent = _some_v(t)
    preds = {"v": [present, absent], "num": (0, 8191)}
    assert_df_equal(
        t.read_where(preds),
        t.read().where(
            F.col("v").isin(present, absent) & F.col("num").between(0, 8191)
        ),
        "IN + range composition",
    )
    # the absent value adds no files beyond the present value's
    assert (
        t.plan_where({"v": [present, absent]})["files_read"]
        == t.plan_where({"v": (present, present)})["files_read"]
    )


def test_member_sketch_whole_bucket_skip_on_mor_stack(spark, tmp_root):
    """Delta-stack buckets resolve winners across files, so they skip
    only WHOLE — full sketch coverage proving every file excludes the
    probe skips the bucket; a present probe reads its bucket whole."""
    t = _make(spark, os.path.join(tmp_root, "mb_stack"))  # 2-epoch stack
    # stacked files hold ~7.5k distinct values: size the sketch so it
    # doesn't saturate (2 bits/value << 32768 cap at 2^16 width)
    t.refresh_member_stats(["v"], bits=1 << 16)
    present, absent = _some_v(t)
    plan_absent = t.plan_where({"v": (absent, absent)})
    assert plan_absent["buckets_read"] == 0
    assert t.read_where({"v": (absent, absent)}).count() == 0
    plan = t.plan_where({"v": (present, present)})
    assert 1 <= plan["buckets_read"] < plan["buckets_total"]
    assert_df_equal(
        t.read_where({"v": (present, present)}),
        t.read().where(F.col("v") == present),
        "stacked bucket, member-pruned",
    )


def test_member_sketch_saturation_admits_everything(spark, tmp_root):
    """A sketch too narrow for the file's distinct count saturates and
    is stored as FULL — no information, no pruning, results intact."""
    t = _make(spark, os.path.join(tmp_root, "mb_full"), compacted=True,
              cluster_by=["num"], target_file_rows=1500)
    t.refresh_member_stats(["v"], bits=64)  # ~1500 distinct >> 32 cap
    # pin the mechanism: most sketches saturated to FULL (tiny tail
    # slices under ~17 distinct values may legitimately stay exact)
    from etl_cms_spark.sink import stats as stats_mod

    sketches = [
        sk
        for d in stats_mod.load_stats(t.root)["dirs"].values()
        for f in d.get("member", {}).values()
        for sk in f.values()
    ]
    n_full = sum(1 for sk in sketches if sk == "FULL")
    assert n_full > len(sketches) // 2
    present, absent = _some_v(t)
    plan = t.plan_where({"v": (absent, absent)})
    # every FULL sketch admits; only the few exact tail sketches prune
    assert plan["files_read"] >= n_full
    assert_df_equal(
        t.read_where({"v": (present, present)}),
        t.read().where(F.col("v") == present),
        "saturated sketch",
    )


def test_member_refresh_guards(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "mb_guard"))
    with pytest.raises(ValueError, match="no such columns"):
        t.refresh_member_stats(["nope"])
    with pytest.raises(ValueError, match="multiple of 64"):
        t.refresh_member_stats(["v"], bits=8)
    with pytest.raises(ValueError, match="multiple of 64"):
        t.refresh_member_stats(["v"], bits=100)
    td = LakeTable(spark, os.path.join(tmp_root, "mb_dbl"), n_buckets=2)
    td.create(["k"], {"k": "string", "score": "double"})
    with pytest.raises(ValueError, match="unsupported sketch types"):
        td.refresh_member_stats(["score"])


def test_member_sketch_encodings_agree():
    """Sparse-list and packed-bitmap encodings of the SAME value set
    admit and exclude identically (the build side picks by density;
    the probe side must not care)."""
    import base64

    from etl_cms_spark.sink.stats import _member_admits, _member_positions

    bits, values = 256, [f"val{i}" for i in range(7)]
    pos = set()
    for v in values:
        pos.update(_member_positions(v, bits))
    buf = bytearray(bits // 8)
    for p in pos:
        buf[p >> 3] |= 1 << (p & 7)
    sparse = {"c": {"b": bits, "s": sorted(pos)}}
    packed = {"c": {"b": bits, "p": base64.b64encode(bytes(buf)).decode()}}
    for probe in values + ["absent-1", "absent-2", 42]:
        pv = {"c": [probe]}
        assert _member_admits(sparse, pv) == _member_admits(packed, pv)
    for v in values:
        assert _member_admits(packed, {"c": [v]})
    # 20 random absent probes: at 7 values x 2 bits in 256, at least
    # one must be provably absent under BOTH encodings
    misses = [p for p in (f"miss{i}" for i in range(20))
              if not _member_admits(packed, {"c": [p]})]
    assert misses
    for p in misses:
        assert not _member_admits(sparse, {"c": [p]})


def test_maintenance_keeps_member_sketches_current(spark, tmp_root):
    """New epochs add uncovered dirs; the maintenance planner schedules
    a refresh_member_stats action (prior opt-in), after which the probe
    prunes the NEW dir's files too."""
    from etl_cms_spark.sink.maintenance import plan_maintenance, run_maintenance

    t = _make(spark, os.path.join(tmp_root, "mb_maint"))
    t.refresh_member_stats(["v"])
    fresh = spark.createDataFrame(
        [("knew1", 1, "go", "vnew1", "U", 30_000_000),
         ("knew2", 2, "py", "vnew2", "U", 30_000_001)],
        "k string, num int, lang string, v string, op string, lsn long",
    )
    t.merge_epoch(fresh, 7)
    plan = plan_maintenance(t)
    kinds = [a["action"] for a in plan["actions"]]
    assert "refresh_member_stats" in kinds
    run_maintenance(t, plan)
    assert plan_maintenance(t)["stats"].get("member_dirs_missing", 0) == 0
    # the new row's value now prunes like any other
    p = t.plan_where({"v": ("vnew1", "vnew1")})
    assert p["files_read"] <= p["files_total"]
    got = t.read_where({"v": ("vnew1", "vnew1")})
    assert [r.k for r in got.collect()] == ["knew1"]


# ---------------------------------------------------------------- count_where


def test_count_where_bare_count_is_metadata_only(spark, tmp_root):
    """After compaction + a counts refresh (cols=[] suffices), a bare
    count(*) runs ZERO scan jobs: every single-dir file contributes
    rows - tombstones from the sidecar."""
    t = _make(spark, os.path.join(tmp_root, "cw_meta"), compacted=True,
              target_file_rows=4000)
    t.refresh_stats([])  # counts-only refresh
    rep = t.count_where()
    assert rep["count"] == t.read().count()
    assert rep["files_scanned"] == 0 and rep["buckets_scanned"] == 0
    assert rep["files_meta"] > 0


def test_count_where_predicates_prove_and_scan_boundaries(spark, tmp_root):
    """Range predicate over a lang-clustered layout: interior files
    prove all-match (metadata count), boundary/mixed files scan, the
    total always equals the filtered read."""
    t = _make(spark, os.path.join(tmp_root, "cw_pred"), compacted=True,
              cluster_by=["lang", "num"], target_file_rows=600)
    t.refresh_stats(["lang", "num"])
    expect = t.read().where("lang = 'go'").count()
    rep = t.count_where({"lang": ("go", "go")})
    assert rep["count"] == expect
    assert rep["files_meta"] > 0, rep          # proofs fired
    assert rep["files_pruned"] > 0, rep        # and pruning fired
    # IN-list over the clustered column: single-value files prove
    rep_in = t.count_where({"lang": ["go", "py"]})
    assert rep_in["count"] == t.read().where("lang in ('go','py')").count()
    # composed with a numeric range that forces residual scans
    preds = {"lang": ("go", "go"), "num": (0, 4000)}
    rep_mix = t.count_where(preds)
    assert rep_mix["count"] == t.read().where(
        "lang = 'go' and num between 0 and 4000"
    ).count()


def test_count_where_delta_stack_falls_back_to_scan(spark, tmp_root):
    """Stacked buckets count by scan (winner resolution is cross-file),
    but a fully-covered out-of-range predicate still whole-skips."""
    t = _make(spark, os.path.join(tmp_root, "cw_stack"))
    rep = t.count_where()
    assert rep["count"] == t.read().count()
    assert rep["files_meta"] == 0 and rep["buckets_scanned"] > 0
    t.refresh_stats(["num"])
    rep2 = t.count_where({"num": (9000, 9999)})  # num < 8192 everywhere
    assert rep2 == {
        "count": 0, "files_meta": 0, "files_scanned": 0,
        "files_pruned": rep2["files_pruned"], "buckets_scanned": 0,
    }
    assert rep2["files_pruned"] > 0


def test_count_where_cold_cache_equals_plain_count(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "cw_cold"), compacted=True)
    rep = t.count_where({"lang": ("go", "py")})
    assert rep["files_meta"] == 0
    assert rep["count"] == t.read().where("lang >= 'go' and lang <= 'py'").count()


def test_count_where_time_travel_and_guards(spark, tmp_root):
    t = _make(spark, os.path.join(tmp_root, "cw_tt"))
    v_before = t._load_manifest()["version"]
    t.compact(target_file_rows=4000)
    t.refresh_stats([])
    assert t.count_where()["count"] == t.read().count()
    assert (
        t.count_where(version=v_before)["count"]
        == t.read_at(v_before).count()
    )
    with pytest.raises(ValueError, match="no such column"):
        t.count_where({"nope": (0, 1)})
    t2 = LakeTable(
        spark, os.path.join(tmp_root, "cw_pc"), n_buckets=4, merge_mode="mor"
    )
    t2.create(["k"], {"k": "string", "a": "int"}, partial_columnar=True)
    with pytest.raises(ValueError, match="partial_columnar"):
        t2.count_where()


def test_count_where_after_more_deletes_and_refresh(spark, tmp_root):
    """Counts stay exact across a later epoch of pure deletes +
    compaction + incremental refresh: tombstones subtract."""
    t = _make(spark, os.path.join(tmp_root, "cw_del"), compacted=True,
              target_file_rows=4000)
    t.refresh_stats([])
    before = t.count_where()["count"]
    dels = _base(spark).where("id % 5 = 0").withColumn(
        "op", F.lit("D")
    ).withColumn("lsn", F.col("lsn") + 100_000)
    t.merge_epoch(dels, 2)
    t.compact(target_file_rows=4000)
    t.refresh_stats([])
    rep = t.count_where()
    assert rep["count"] == t.read().count() < before
    assert rep["files_scanned"] == 0, rep


def test_read_where_safe_on_undeduped_single_dir(spark, tmp_root):
    """r5 ADVICE: an UNDEDUPED single-dir MoR delta (skip_batch_dedup)
    may hold a stale upsert AND its covering tombstone in separate
    files of ONE dir.  Per-file pruning would exclude the tombstone's
    all-null-stats file while admitting the upsert's, resurrecting the
    deleted row — such buckets must take the whole-bucket branch."""
    root = os.path.join(tmp_root, "undeduped_prune")
    t = LakeTable(spark, root, n_buckets=2, merge_mode="mor")
    t.create(["k"], {"k": "string", "lang": "string", "v": "string"})
    batch = spark.createDataFrame(
        [
            ("kx", "go", "v1", 1, "U"),   # stale upsert ...
            ("kx", None, None, 2, "D"),   # ... covered by a tombstone
            ("ky", "py", "v2", 3, "U"),
        ],
        "k string, lang string, v string, lsn long, op string",
    )
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")  # file per row
    try:
        t.merge_epoch(batch, 0, skip_batch_dedup=True)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
    t.refresh_stats(["lang"])
    truth = t.read().where("lang = 'go'")
    assert truth.count() == 0, "tombstone must win the resolved read"
    got = t.read_where({"lang": ("go", "go")})
    assert_df_equal(
        got, truth.drop("_lsn", "_bucket", "_deleted"), "undeduped single-dir read_where"
    )
    cw = t.count_where({"lang": ("go", "go")})
    assert cw["count"] == 0, cw
    # and the live key still plans/reads correctly
    assert t.read_where({"lang": ("py", "py")}).count() == 1
    assert t.count_where({"lang": ("py", "py")})["count"] == 1
