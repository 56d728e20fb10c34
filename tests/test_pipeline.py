import json
import os

import pytest

from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import (
    gen_schema_events,
    gen_source_changes,
    with_injected_duplicates,
)
from etl_cms_spark.operators.dedup import latest_by_lsn
from etl_cms_spark.plans.mapping import CONCEPT_MAP, UNMAPPED_LANGS, map_concepts_join, map_concepts_udf
from etl_cms_spark.plans.pipeline import CDCPipeline
from tests.conftest import assert_df_equal


def _expected_keys(changes):
    latest = latest_by_lsn(changes.where(F.col("op") != "SCHEMA"), ["repo", "path"], "lsn")
    return (
        latest.where(F.col("op") != "D")
        .where(F.col("lang").isin(list(CONCEPT_MAP.keys())))
        .select("repo", "path", "commit")
    )


def test_pipeline_matches_global_dedup(spark, changes, tmp_root):
    p = CDCPipeline(spark, tmp_root)
    recs = p.run(changes, n_epochs=3)
    assert [r["epoch"] for r in recs] == [0, 1, 2]
    assert_df_equal(
        p.current_state().select("repo", "path", "commit"),
        _expected_keys(changes),
        "incremental epochs == one-shot dedup",
    )


def test_content_sha_invariant(spark, changes, tmp_root):
    p = CDCPipeline(spark, tmp_root)
    p.run(changes, n_epochs=2)
    st = p.current_state()
    assert st.where(F.col("content_sha") != F.sha2(F.col("content"), 256)).count() == 0


def test_replay_is_noop(spark, changes, tmp_root):
    p = CDCPipeline(spark, tmp_root)
    p.run(changes, n_epochs=3)
    before = p.current_state()
    recs = p.run(changes, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert_df_equal(p.current_state(), before, "replay converges")


def test_crash_resume_from_checkpoint(spark, changes, tmp_root):
    p1 = CDCPipeline(spark, tmp_root)
    p1.init_tables()
    bounds = changes.agg(F.min("lsn"), F.max("lsn")).first()
    lo, hi = bounds
    width = (hi - lo + 1 + 2) // 3
    p1.process_epoch(changes.where((F.col("lsn") >= lo) & (F.col("lsn") <= lo + width - 1)), 0)
    del p1  # crash
    p2 = CDCPipeline(spark, tmp_root)
    assert p2.checkpoint()["last_epoch"] == 0
    recs = p2.run(changes, n_epochs=3)
    assert recs[0].get("skipped_duplicate_epoch")
    assert_df_equal(
        p2.current_state().select("repo", "path", "commit"),
        _expected_keys(changes),
        "resume converges",
    )


def test_duplicate_lsn_key_pairs_idempotent(spark, tmp_root):
    base = gen_source_changes(spark, n_events=1500, n_keys=300, n_repos=10)
    dup = with_injected_duplicates(base, every_nth=10)
    pa = CDCPipeline(spark, os.path.join(tmp_root, "a"))
    pa.run(base, n_epochs=2)
    pb = CDCPipeline(spark, os.path.join(tmp_root, "b"))
    pb.run(dup, n_epochs=2)
    assert_df_equal(pa.current_state(), pb.current_state(), "dup lsn/key injection")


def test_schema_evolution_mid_stream(spark, tmp_root):
    base = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=10)
    sev = gen_schema_events(
        spark, {999: '{"add": "stars:bigint"}', 1501: '{"rename": "lang:language"}'}
    )
    p = CDCPipeline(spark, tmp_root)
    p.run(base.unionByName(sev), n_epochs=2)
    st = p.current_state()
    assert "stars" in st.columns and "language" in st.columns and "lang" not in st.columns
    # renamed column stays populated for rows written before AND after.
    assert st.where(F.col("language").isNull()).count() == 0


def test_replay_across_evolution_boundary(spark, tmp_root):
    base = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=10)
    sev = gen_schema_events(spark, {999: '{"rename": "lang:language"}'})
    ch = base.unionByName(sev)
    p = CDCPipeline(spark, os.path.join(tmp_root, "x"))
    p.run(ch, n_epochs=4)
    q = CDCPipeline(spark, os.path.join(tmp_root, "y"))
    q.run(ch, n_epochs=2)  # different epoching must converge to same state
    assert_df_equal(
        p.current_state().select("repo", "path", "commit", "language"),
        q.current_state().select("repo", "path", "commit", "language"),
        "epoch-split independence across evolution",
    )


def test_quarantine_channel(spark, changes, tmp_root):
    p = CDCPipeline(spark, tmp_root)
    p.run(changes, n_epochs=2)
    q = p.quarantine()
    assert q.where(~F.col("lang").isin(list(UNMAPPED_LANGS))).count() == 0
    assert q.count() > 0
    # quarantined keys must not be in the main table
    joined = p.current_state().join(q.select("repo", "path"), ["repo", "path"], "inner")
    # keys can be re-mapped later only if a later event had mapped lang;
    # check against latest state per key instead:
    latest = latest_by_lsn(changes, ["repo", "path"], "lsn")
    unmapped_latest = latest.where(
        F.col("lang").isin(list(UNMAPPED_LANGS)) & (F.col("op") != "D")
    ).select("repo", "path")
    assert p.current_state().join(unmapped_latest, ["repo", "path"], "inner").count() == 0


def test_mapping_udf_equals_join(spark, changes):
    latest = latest_by_lsn(changes.where(F.col("op") != "D"), ["repo", "path"], "lsn")
    a = map_concepts_udf(spark, latest).select("repo", "path", "concept_id", "domain", "content_sha")
    b = map_concepts_join(spark, latest).select("repo", "path", "concept_id", "domain", "content_sha")
    assert_df_equal(a, b, "broadcast-dict UDF == broadcast join")


def test_lineage_records(spark, changes, tmp_root):
    p = CDCPipeline(spark, tmp_root)
    p.run(changes, n_epochs=3)
    lin = p.table.lineage()
    assert len(lin) == 3
    for rec in lin:
        assert rec["lsn_min"] <= rec["lsn_max"]
        assert rec["rows_upserted"] >= 0 and "events_per_sec" in rec
    # manifest on disk is valid JSON with epochs keyed
    mdir = os.path.join(tmp_root, "tables", "files", "_manifests")
    with open(os.path.join(mdir, "CURRENT")) as f:
        v = int(f.read())
    with open(os.path.join(mdir, f"v{v}.json")) as f:
        m = json.load(f)
    assert set(m["epochs"].keys()) == {"0", "1", "2"}


def test_time_travel(spark, changes, tmp_root):
    p = CDCPipeline(spark, tmp_root)
    p.run(changes, n_epochs=3)
    v_first = p.table.lineage()[0]["snapshot_version"]
    early = p.table.read_at(v_first).count()
    now = p.current_state().count()
    assert early > 0 and now >= 0 and early != 0


def test_tombstones_prevent_resurrection(spark, tmp_root):
    """Out-of-order application: a delete applied before an older
    update must win (tombstone semantics) — the streaming path
    delivers micro-batches in arbitrary LSN order."""
    rows = [
        (10, "U", "r1", "p1", "c-old", "python", "old content"),
        (20, "D", "r1", "p1", None, None, None),
    ]
    ch = spark.createDataFrame(
        rows, "lsn long, op string, repo string, path string, commit string, lang string, content string"
    ).selectExpr("lsn", "op", "timestamp('2024-01-01') as ts", "repo", "path", "commit", "lang", "content")
    p = CDCPipeline(spark, tmp_root)
    p.init_tables()
    # epoch 0 applies the DELETE first, epoch 1 the older UPDATE.
    p.process_epoch(ch.where(F.col("op") == "D"), 0)
    p.process_epoch(ch.where(F.col("op") == "U"), 1)
    assert p.current_state().count() == 0


def test_demux_domain_tables_match_filtered_state(spark, tmp_root):
    """demux_domains: each domain table == the main state filtered to
    that domain."""
    import os

    from etl_cms_spark.fixtures.generator import gen_source_changes

    ch = gen_source_changes(spark, n_events=1200, n_keys=250, n_repos=10)
    p = CDCPipeline(spark, os.path.join(tmp_root, "dx"), n_buckets=8, demux_domains=True)
    p.run(ch, n_epochs=2)
    state = p.current_state()
    for d in p.domains:
        expect = state.where(F.col("domain") == d)
        got = p.domain_state(d)
        assert_df_equal(expect, got, f"domain {d}")
    n_domains_rows = sum(p.domain_state(d).count() for d in p.domains)
    assert n_domains_rows == state.count()


def test_demux_cross_domain_move_deletes_old_row(spark, tmp_root):
    """A key whose latest version changed domain must vanish from the
    old domain's table (delete fan-out), under replay too."""
    import os

    rows = [
        # key (r, f): v1 lang=sql (domain query), v2 lang=html (markup)
        (1, "U", "r", "f", "c1", "sql", "select 1", None),
        (5, "U", "r", "f", "c2", "html", "<p>hi</p>", None),
        # key (r, g): stays sql
        (2, "U", "r", "g", "c3", "sql", "select 2", None),
    ]
    ch = spark.createDataFrame(
        rows,
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, schema_change string",
    )
    root = os.path.join(tmp_root, "mv")
    p = CDCPipeline(spark, root, n_buckets=4, demux_domains=True)
    p.run(ch, n_epochs=2)
    markup = {(r["repo"], r["path"]) for r in p.domain_state("markup").collect()}
    query = {(r["repo"], r["path"]) for r in p.domain_state("query").collect()}
    assert ("r", "f") in markup and ("r", "f") not in query
    assert ("r", "g") in query
    # replay is a no-op everywhere
    p2 = CDCPipeline(spark, root, n_buckets=4, demux_domains=True)
    recs = p2.run(ch, n_epochs=2)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert {(r["repo"], r["path"]) for r in p2.domain_state("markup").collect()} == markup


def test_demux_schema_evolution_reaches_domain_tables(spark, tmp_root):
    """Schema events must evolve EVERY destination table — a rename
    mid-stream shows up in each domain table's state."""
    import os

    from etl_cms_spark.fixtures.generator import gen_schema_events, gen_source_changes

    base = gen_source_changes(spark, n_events=800, n_keys=150, n_repos=5)
    sev = gen_schema_events(spark, {799: '{"rename": "lang:language"}'})
    p = CDCPipeline(spark, os.path.join(tmp_root, "dse"), n_buckets=4, demux_domains=True)
    p.run(base.unionByName(sev), n_epochs=2)
    for d in p.domains:
        st = p.domain_state(d)
        assert "language" in st.columns and "lang" not in st.columns, d


def test_detailed_per_partition_lineage(spark, tmp_root):
    """detailed_lineage records per-bucket rows/deletes/LSN ranges
    that reconcile exactly with the epoch totals (north rule:
    per-partition lineage — source LSN range, rows applied/deleted)."""
    import os

    from etl_cms_spark.fixtures.generator import gen_source_changes

    ch = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=10)
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "dl"), n_buckets=8, detailed_lineage=True
    )
    p.run(ch, n_epochs=2)
    for rec in p.table.lineage():
        parts = rec["partitions"]
        assert set(map(int, parts)) == set(rec["changed_buckets"])
        assert sum(v["rows"] for v in parts.values()) == (
            rec["rows_upserted"] + rec["rows_deleted"]
        )
        assert sum(v["deletes"] for v in parts.values()) == rec["rows_deleted"]
        assert min(v["lsn_min"] for v in parts.values()) == rec["lsn_min"]
        assert max(v["lsn_max"] for v in parts.values()) == rec["lsn_max"]


def test_demux_targeted_equals_blanket_and_handles_moves(spark, tmp_root):
    """demux_tombstones='targeted' must produce domain tables
    identical to the blanket fan-out (including cross-domain moves and
    deletes), with replay a no-op — while merging only ~batch keys per
    domain instead of every key into every domain."""
    import os

    from etl_cms_spark.fixtures.generator import gen_source_changes

    ch = gen_source_changes(spark, n_events=1500, n_keys=250, n_repos=10)
    roots = {}
    for mode in ("blanket", "targeted"):
        root = os.path.join(tmp_root, f"dxt_{mode}")
        p = CDCPipeline(
            spark, root, n_buckets=8, demux_domains=True, demux_tombstones=mode
        )
        p.run(ch, n_epochs=3)
        roots[mode] = p
    pb, pt = roots["blanket"], roots["targeted"]
    for d in pb.domains:
        assert_df_equal(pb.domain_state(d), pt.domain_state(d), f"domain {d} ({0})")
    # the targeted fan-out applied far fewer rows per domain epoch
    def domain_rows(p):
        return sum(
            r2["rows_upserted"] + r2["rows_deleted"]
            for t in p.domain_tables.values()
            for r2 in t.lineage()
        )

    assert domain_rows(pt) < domain_rows(pb) / 2
    # replay is a no-op for targeted too
    p3 = CDCPipeline(
        spark, os.path.join(tmp_root, "dxt_targeted"), n_buckets=8,
        demux_domains=True, demux_tombstones="targeted",
    )
    recs = p3.run(ch, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)


def test_demux_targeted_cross_domain_move(spark, tmp_root):
    """The explicit move scenario under targeted tombstones: the key
    vanishes from the old domain and only the moved key's delete is
    fanned out."""
    import os

    rows = [
        (1, "U", "r", "f", "c1", "sql", "select 1", None),
        (5, "U", "r", "f", "c2", "html", "<p>hi</p>", None),
        (2, "U", "r", "g", "c3", "sql", "select 2", None),
    ]
    ch = spark.createDataFrame(
        rows,
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, schema_change string",
    )
    root = os.path.join(tmp_root, "mv_t")
    p = CDCPipeline(
        spark, root, n_buckets=4, demux_domains=True, demux_tombstones="targeted"
    )
    p.run(ch, n_epochs=2)
    markup = {(r["repo"], r["path"]) for r in p.domain_state("markup").collect()}
    query = {(r["repo"], r["path"]) for r in p.domain_state("query").collect()}
    assert ("r", "f") in markup and ("r", "f") not in query
    assert ("r", "g") in query


def test_demux_targeted_converges_under_any_epoch_order(spark, tmp_root):
    """Order-independence of the targeted fan-out (round-4 design):
    applying LSN-range epochs in ARBITRARY first-application order
    must converge every domain table to the in-order blanket state —
    stale cross-domain upserts are neutralized by stale-claim
    tombstones at the winning LSN."""
    import itertools
    import os

    from etl_cms_spark.fixtures.generator import gen_source_changes

    ch = gen_source_changes(spark, n_events=900, n_keys=120, n_repos=8)
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    n_ep = 3
    width = (hi - lo + n_ep) // n_ep
    slices = [
        ch.where((F.col("lsn") >= lo + i * width) & (F.col("lsn") < lo + (i + 1) * width))
        for i in range(n_ep)
    ]

    ref = CDCPipeline(
        spark, os.path.join(tmp_root, "ooo_ref"), n_buckets=4,
        demux_domains=True, demux_tombstones="blanket",
    )
    ref.run(ch, n_epochs=n_ep)

    for perm in [(2, 0, 1), (1, 2, 0), (2, 1, 0)]:
        root = os.path.join(tmp_root, f"ooo_{''.join(map(str, perm))}")
        p = CDCPipeline(
            spark, root, n_buckets=4, demux_domains=True,
            demux_tombstones="targeted",
        )
        p.init_tables()
        for e in perm:
            p.process_epoch(slices[e], e)
        for d in ref.domains:
            assert_df_equal(
                ref.domain_state(d), p.domain_state(d), f"perm {perm} domain {d}"
            )
        assert_df_equal(ref.current_state(), p.current_state(), f"perm {perm} main")


def test_crash_between_domain_and_main_commit_resumes(spark, tmp_root):
    """The crash-resume ordering argument, exercised: domain tables
    commit BEFORE the main merge, so a crash in that window leaves the
    epoch partially applied — on re-offer the domain merges skip as
    duplicates, the main merge applies, and the end state equals a
    clean run's."""
    import os

    import pytest

    from etl_cms_spark.fixtures.generator import gen_source_changes

    ch = gen_source_changes(spark, n_events=1000, n_keys=200, n_repos=8)
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    s0, s1 = ch.where(F.col("lsn") <= mid), ch.where(F.col("lsn") > mid)

    root = os.path.join(tmp_root, "crashwin")
    p = CDCPipeline(spark, root, n_buckets=4, demux_domains=True)
    p.init_tables()
    p.process_epoch(s0, 0)

    orig = p.table.merge_epoch
    p.table.merge_epoch = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("crash before main commit")
    )
    with pytest.raises(RuntimeError, match="crash before main commit"):
        p.process_epoch(s1, 1)
    p.table.merge_epoch = orig
    # the crash window is real: domains with epoch-1 rows committed
    # it, main did not (untouched domains skip their merge entirely)
    assert any(
        "1" in {str(e) for e in t.committed_epochs()}
        for t in p.domain_tables.values()
    )
    assert "1" not in {str(e) for e in p.table.committed_epochs()}

    rec = p.process_epoch(s1, 1)  # resume
    assert all(
        r.get("skipped_duplicate_epoch") or r.get("skipped_empty_epoch")
        for r in rec["domains"].values()
    )

    clean = CDCPipeline(spark, os.path.join(tmp_root, "crashwin_ref"), n_buckets=4,
                        demux_domains=True)
    clean.init_tables()
    clean.process_epoch(s0, 0)
    clean.process_epoch(s1, 1)
    assert_df_equal(p.current_state(), clean.current_state(), "main converges")
    for d in p.domains:
        assert_df_equal(p.domain_state(d), clean.domain_state(d), f"domain {d}")


def test_widen_schema_evolution_mid_stream(spark, tmp_root):
    """{"widen": "col:type"} promotes a column losslessly (int→long)
    as a metadata-only commit: old files keep int, reads cast, later
    epochs write long, replay across the boundary converges."""
    import os

    import pytest

    from etl_cms_spark.fixtures.generator import gen_schema_events, gen_source_changes

    base = gen_source_changes(spark, n_events=800, n_keys=150, n_repos=5)
    lo, hi = base.agg(F.min("lsn"), F.max("lsn")).first()
    sev = gen_schema_events(spark, {int((lo + hi) // 2): '{"widen": "concept_id:long"}'})
    full = base.unionByName(sev)
    root = os.path.join(tmp_root, "widen")
    p = CDCPipeline(spark, root, n_buckets=4)
    p.run(full, n_epochs=2)
    st = p.current_state()
    assert dict(st.dtypes)["concept_id"] == "bigint"
    # replay from scratch over the same changelog is a no-op
    p2 = CDCPipeline(spark, root, n_buckets=4)
    recs = p2.run(full, n_epochs=2)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    # lossy demotion is refused
    with pytest.raises(ValueError, match="not a lossless"):
        p.table.apply_schema_change({"widen": "concept_id:int"})


def test_quarantine_repair_flow(spark, tmp_root):
    """Vocabulary-update repair: rows quarantined for a missing lang
    re-enter through reprocess_quarantine once the dictionary gains
    the entry — keeping their original LSNs so later source updates
    still outrank them; replay of the repair epoch is a no-op."""
    import os

    rows = [
        # key (r, f): lua (unmapped at ingest time), v1
        (10, "U", "r", "f", "c1", "lua", "print(1)", None),
        # key (r, g): mapped normally
        (11, "U", "r", "g", "c2", "sql", "select 1", None),
        # key (r, h): lua v1 then a LATER sql version — repair of v1
        # must not overwrite the newer version
        (12, "U", "r", "h", "c3", "lua", "old lua", None),
        (20, "U", "r", "h", "c4", "sql", "new sql", None),
    ]
    ch = spark.createDataFrame(
        rows,
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, schema_change string",
    )
    root = os.path.join(tmp_root, "repair")
    p = CDCPipeline(spark, root, n_buckets=4)
    p.init_tables()
    # epoch 0: the lua rows + the sql row; epoch 1: the newer sql
    # version of (r, h).  (Within ONE epoch the pre-dedup would drop
    # the older lua version of (r, h) before it could quarantine.)
    p.process_epoch(ch.where(F.col("lsn") <= 12), 0)
    p.process_epoch(ch.where(F.col("lsn") > 12), 1)
    state0 = {(r["repo"], r["path"]) for r in p.current_state().collect()}
    assert ("r", "f") not in state0  # quarantined
    assert p.quarantine().count() == 2  # both lua rows

    # the dictionary gains lua; a NEW pipeline (vocab update) repairs
    p2 = CDCPipeline(
        spark, root, n_buckets=4, extra_mappings={"lua": (9901, "script")}
    )
    # positive repair ids collide with the source/streaming epoch
    # keyspace and are refused (round-4 ADVICE)
    with pytest.raises(ValueError, match="must be negative"):
        p2.reprocess_quarantine(source_epoch=0, repair_epoch=1000)
    ckpt_before = p2.checkpoint()
    rec = p2.reprocess_quarantine(source_epoch=0, repair_epoch=-1)
    assert not rec.get("skipped_duplicate_epoch")
    cur = {(r["repo"], r["path"]): r for r in p2.current_state().collect()}
    assert cur[("r", "f")]["lang"] == "lua" and cur[("r", "f")]["concept_id"] == 9901
    # the later sql version of (r, h) survived the lower-LSN repair
    assert cur[("r", "h")]["content"] == "new sql"
    # repair epoch is exactly-once
    rec2 = p2.reprocess_quarantine(source_epoch=0, repair_epoch=-1)
    assert rec2.get("skipped_duplicate_epoch")
    # the repair never advances the SOURCE cursor
    assert p2.checkpoint() == ckpt_before


def test_bucketed_tail_with_demux_matches_plain(spark, tmp_root):
    """The producer-bucketed tail (run_from_table, Exchange-free
    dedup) composed WITH per-domain demux — the two headline bench
    paths together — must produce the same main and domain states as
    the plain staged path."""
    import os

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.pipeline import stage_changelog_bucketed

    ch = gen_source_changes(spark, n_events=1500, n_keys=250, n_repos=10)
    table = "t_bucketed_demux"
    stage_changelog_bucketed(spark, ch, table, n_buckets=8, n_epochs=2)
    try:
        pb = CDCPipeline(
            spark, os.path.join(tmp_root, "bdx"), n_buckets=8, demux_domains=True
        )
        pb.run_from_table(table)
        pp = CDCPipeline(
            spark, os.path.join(tmp_root, "bdx_ref"), n_buckets=8, demux_domains=True
        )
        pp.run(ch, n_epochs=2)
        assert_df_equal(pb.current_state(), pp.current_state(), "main state")
        for d in pb.domains:
            assert_df_equal(pb.domain_state(d), pp.domain_state(d), f"domain {d}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_demux_untouched_domain_skips_merge_entirely(spark, tmp_root):
    """Merge-floor trim: a domain with zero upserts AND zero
    tombstones in an epoch must not run a merge at all — no epoch
    record, no manifest commit, no snapshot version gained — while
    replay of the epoch stays a no-op (main commit is the epoch's
    completion marker)."""
    import os

    rows0 = [
        (1, "U", "r", "a", "c1", "sql", "select 1", None),
        (2, "U", "r", "b", "c2", "html", "<p>x</p>", None),
    ]
    rows1 = [
        (10, "U", "r", "a", "c3", "sql", "select 2", None),
        (11, "U", "r", "c", "c4", "sql", "select 3", None),
    ]
    schema = (
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, schema_change string"
    )
    s0 = spark.createDataFrame(rows0, schema)
    s1 = spark.createDataFrame(rows1, schema)
    root = os.path.join(tmp_root, "skipmerge")
    p = CDCPipeline(
        spark, root, n_buckets=4, demux_domains=True, demux_tombstones="targeted"
    )
    p.init_tables()
    p.process_epoch(s0, 0)
    markup = p.domain_tables["markup"]
    lin_before = markup.lineage()
    ver_before = lin_before[-1]["snapshot_version"]

    rec = p.process_epoch(s1, 1)  # epoch 1 touches only sql → query
    assert rec["domains"]["markup"].get("skipped_empty_epoch")
    assert not rec["domains"]["query"].get("skipped_empty_epoch")
    # untouched domain gained NOTHING: no epoch record, no version
    assert "1" not in {str(e) for e in markup.committed_epochs()}
    assert markup.lineage() == lin_before
    assert markup.lineage()[-1]["snapshot_version"] == ver_before

    # replay of both epochs is still a clean no-op (main-table marker)
    recs = p.run(s0.unionByName(s1), n_epochs=2)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    # and the markup table still serves its epoch-0 state
    assert {(r["repo"], r["path"]) for r in p.domain_state("markup").collect()} == {("r", "b")}


def test_broadcast_dedup_mode_matches_strict(spark, changes, tmp_root):
    """dedup_mode='broadcast' (payload never shuffles in the dedup
    stage) converges to the same final state as the strict window
    form, duplicate (key, lsn) deliveries included."""
    p = CDCPipeline(spark, os.path.join(tmp_root, "b"), dedup_mode="broadcast")
    p.run(with_injected_duplicates(changes), n_epochs=3)
    assert_df_equal(
        p.current_state().select("repo", "path", "commit"),
        _expected_keys(changes),
        "broadcast mode == strict state",
    )


def test_unknown_dedup_mode_rejected(spark, tmp_root):
    with pytest.raises(ValueError, match="dedup_mode"):
        CDCPipeline(spark, tmp_root, dedup_mode="stricts")


def test_auto_dedup_mode_local_resolves_strict(spark, changes, tmp_root):
    """auto on a fat local box + uniform keys -> window form, same
    final state; the decision lands in the epoch lineage."""
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "auto1"), dedup_mode="auto",
        broadcast_dedup_max_rows=0,
    )
    recs = p.run(changes, n_epochs=2)
    assert all(r["dedup_auto"]["resolved"] == "strict" for r in recs)
    assert all(r["dedup_auto"]["n_executors"] == 1 for r in recs)
    assert_df_equal(
        p.current_state().select("repo", "path", "commit"),
        _expected_keys(changes),
        "auto(local) == strict state",
    )


def test_auto_dedup_mode_cluster_shape_resolves_strict(spark, changes, tmp_root, monkeypatch):
    """Emulated many-executors/few-cores shape -> still the window
    form (r6 re-measure: with the merge-reduction skip, strict beats
    the join form in absolute AND pinned 2->8 efficiency, 0.768 vs
    0.708 — BENCH/scaling.json); the shape signal still lands in the
    lineage for observability."""
    monkeypatch.setenv("ETL_CMS_CLUSTER_SHAPE", "250x4")
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "auto2"), dedup_mode="auto",
        broadcast_dedup_max_rows=0,
    )
    recs = p.run(with_injected_duplicates(changes), n_epochs=2)
    assert all(r["dedup_auto"]["resolved"] == "strict" for r in recs)
    assert all(r["dedup_auto"]["n_executors"] == 250 for r in recs)
    assert_df_equal(
        p.current_state().select("repo", "path", "commit"),
        _expected_keys(changes),
        "auto(cluster) == strict state",
    )


def test_auto_dedup_mode_cluster_targeted_demux_keeps_strict(spark, tmp_root, monkeypatch):
    """Under targeted demux, auto never hands the routing a batch with
    duplicate (key, lsn) survivors -> strict even on the cluster shape."""
    monkeypatch.setenv("ETL_CMS_CLUSTER_SHAPE", "250x4")
    ch = gen_source_changes(spark, n_events=2000, n_keys=400)
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "auto4"), dedup_mode="auto",
        demux_domains=True, demux_tombstones="targeted",
    )
    recs = p.run(ch, n_epochs=1)
    assert all(r["dedup_auto"]["resolved"] == "strict" for r in recs)


def test_auto_dedup_mode_hot_keys_resolve_salted(spark, tmp_root):
    """A hot-megarepo batch whose hottest key's estimated row count
    reaches the task-row budget -> salted.  (Share alone never
    triggers salting — BENCH/skew_ab.json measured the window form
    faster at every sandbox-reachable share, 0.03-0.35; the budget is
    lowered here to exercise the path at fixture scale.)"""
    hot = gen_source_changes(spark, n_events=4000, n_keys=800, key_skew=6.0)
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "auto3"), dedup_mode="auto",
        salt_task_row_budget=500,
    )
    recs = p.run(hot, n_epochs=1)
    assert all(r["dedup_auto"]["resolved"] == "salted" for r in recs)
    assert all(r["dedup_auto"]["hot_key_rows_est"] >= 500 for r in recs)
    assert all(r["dedup_auto"]["top_key_share_est"] >= 0.08 for r in recs)
    assert_df_equal(
        p.current_state().select("repo", "path", "commit"),
        _expected_keys(hot),
        "auto(salted) == strict state",
    )


def test_auto_dedup_mode_share_alone_does_not_salt(spark, tmp_root):
    """Measured rule: high top-key SHARE with small absolute rows
    stays on the window form (salting lost the A/B at every
    sandbox-reachable skew)."""
    hot = gen_source_changes(spark, n_events=4000, n_keys=800, key_skew=6.0)
    p = CDCPipeline(
        spark, os.path.join(tmp_root, "auto5"), dedup_mode="auto",
        broadcast_dedup_max_rows=0,
    )
    recs = p.run(hot, n_epochs=1)
    assert all(r["dedup_auto"]["resolved"] == "strict" for r in recs)
    assert all(r["dedup_auto"]["top_key_share_est"] >= 0.08 for r in recs)


def test_auto_dedup_mode_small_batch_resolves_strict(spark, changes, tmp_root):
    """Small batches also take the window form now (r6 re-measure:
    with the merge-reduction skip the 200k-epoch small-batch A/B is a
    tie within noise, strict 3.25-4.67 s vs broadcast 3.62-3.90 s, so
    the simpler no-cliff form wins; r5's 1.8x broadcast advantage
    predates the skip).  Duplicate (key,lsn) deliveries converge."""
    p = CDCPipeline(spark, os.path.join(tmp_root, "auto6"), dedup_mode="auto")
    recs = p.run(with_injected_duplicates(changes), n_epochs=2)
    assert all(r["dedup_auto"]["resolved"] == "strict" for r in recs)
    assert all(r["dedup_auto"]["batch_rows_est"] > 0 for r in recs)
    assert_df_equal(
        p.current_state().select("repo", "path", "commit"),
        _expected_keys(changes),
        "auto(small batch) == strict state",
    )


def test_estimate_top_key_share_orders_skew_levels(spark):
    """The sampled estimator separates uniform from hot-key batches."""
    from etl_cms_spark.operators.skew import estimate_top_key_share

    uni = gen_source_changes(spark, n_events=5000, n_keys=1000)
    hot = gen_source_changes(spark, n_events=5000, n_keys=1000, key_skew=6.0)
    s_uni = estimate_top_key_share(uni, ["repo", "path"], sample_frac=0.5)
    s_hot = estimate_top_key_share(hot, ["repo", "path"], sample_frac=0.5)
    assert s_uni < 0.03
    assert s_hot > 0.15
    assert s_hot > 5 * s_uni


def test_cluster_shape_local_and_override(spark, monkeypatch):
    from etl_cms_spark.session import cluster_shape

    n_exec, cores = cluster_shape(spark)
    assert n_exec == 1 and cores == spark.sparkContext.defaultParallelism
    monkeypatch.setenv("ETL_CMS_CLUSTER_SHAPE", "1000x4")
    assert cluster_shape(spark) == (1000, 4)


def test_one_row_consumers_reject_duplicate_surviving_modes(spark, tmp_root):
    """Targeted demux and the ingest dedup filter reason per-row over a
    one-row-per-key batch; the join/broadcast forms' byte-identical
    duplicate (key,lsn) survivors would double-count there, so the
    constructor rejects the combination (the auto resolver already
    refuses those forms when such a consumer is attached)."""
    from etl_cms_spark.operators.textindex import IncrementalTextDedupIndex

    for mode in ("join", "broadcast", "merge"):
        with pytest.raises(ValueError, match="one-row-per-key"):
            CDCPipeline(
                spark, os.path.join(tmp_root, f"d_{mode}"),
                demux_domains=True, demux_tombstones="targeted", dedup_mode=mode,
            )
        ix = IncrementalTextDedupIndex.build(
            spark, os.path.join(tmp_root, f"ix_{mode}"), "content", "doc_id"
        )
        with pytest.raises(ValueError, match="one-row-per-key"):
            CDCPipeline(
                spark, os.path.join(tmp_root, f"f_{mode}"),
                dedup_mode=mode, dedup_filter_index=ix,
            )
    # 'auto' stays allowed for both: its resolver keeps the one-row contract
    CDCPipeline(
        spark, os.path.join(tmp_root, "ok1"),
        demux_domains=True, demux_tombstones="targeted", dedup_mode="auto",
    )


def test_catch_up_domains_backfills_late_enabled_demux(spark, tmp_root):
    """Domain tables can lag the main table for reasons the in-process
    crash-window logic never sees (demux enabled over a lake populated
    without it; a domain table restored from an older copy) — and the
    duplicate-epoch skip consults only the main marker, so changelog
    replay can never heal them.  catch_up_domains converges every
    domain table from the main table's current state in one repair
    epoch."""
    from etl_cms_spark.fixtures.generator import gen_source_changes

    ch = gen_source_changes(spark, n_events=1200, n_keys=250, n_repos=10)
    root = os.path.join(tmp_root, "cud")
    p0 = CDCPipeline(spark, root, n_buckets=8)  # populated WITHOUT demux
    p0.run(ch, n_epochs=2)

    p = CDCPipeline(spark, root, n_buckets=8, demux_domains=True)
    p.init_tables()
    recs = p.run(ch, n_epochs=2)  # replay: every epoch short-circuits
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert all(p.domain_state(d).count() == 0 for d in p.domains)  # the gap

    p.catch_up_domains(-7)
    state = p.current_state()
    total = 0
    for d in p.domains:
        assert_df_equal(
            state.where(F.col("domain") == d), p.domain_state(d), f"domain {d}"
        )
        total += p.domain_state(d).count()
    assert total == state.count()

    # re-running the same repair id is a per-table duplicate-epoch no-op
    recs2 = p.catch_up_domains(-7)
    assert recs2 and all(r.get("skipped_duplicate_epoch") for r in recs2.values())
    # and new epochs still apply on top of the repaired tables
    with pytest.raises(ValueError, match="negative"):
        p.catch_up_domains(3)
    with pytest.raises(ValueError, match="demux_domains"):
        p0.catch_up_domains(-8)


def test_read_consistent_hides_torn_later_epoch(spark, changes, tmp_root):
    """Epoch-aligned multi-table cut: after an extra epoch is merged
    into ONE domain sink only (a mid-epoch crash / in-flight merge),
    read_consistent() pins every table at the main table's newest
    completed source epoch — the torn rows are invisible and the
    routed union still equals the main state."""
    from functools import reduce

    from pyspark.sql import functions as F

    p = CDCPipeline(spark, tmp_root, n_buckets=8, demux_domains=True)
    p.run(changes, n_epochs=2)
    cols = ["repo", "path", "commit", "lang", "content",
            "concept_id", "domain", "content_sha"]
    dom, t = sorted(p.domain_tables.items())[0]
    n_before = t.read().count()
    v_before = t.version_at_epoch(1)

    torn = spark.createDataFrame(
        [(10**9, "U", "torn-repo", f"f{i}", "c0", "python", "x",
          9001, dom, "s") for i in range(5)],
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, concept_id long, domain string, "
        "content_sha string",
    )
    t.merge_epoch(torn, 2)
    # naive read sees the tear; the pinned version does not move
    assert t.read().count() == n_before + 5
    assert t.version_at_epoch(1) == v_before
    assert t.version_at_epoch(2) > v_before

    cut = p.read_consistent()  # defaults to main's newest epoch (1)
    assert set(cut) == {"main", *p.domain_tables}
    union = reduce(
        lambda a, b: a.unionByName(b),
        [cut[d] for d in sorted(p.domain_tables)],
    )
    assert union.where(F.col("repo") == "torn-repo").count() == 0
    assert_df_equal(union.select(*cols), p.current_state().select(*cols),
                    "consistent routed union == main state")
    assert_df_equal(cut["main"].select(*cols), p.current_state().select(*cols),
                    "consistent main == current (main was not torn)")
    # explicit later boundary includes the tear
    cut2 = p.read_consistent(epoch=2)
    assert cut2[dom].where(F.col("repo") == "torn-repo").count() == 5


def test_scd_and_rollup_sidecars_ride_pipeline(spark, changes, tmp_root):
    """Scd2History and StateRollup ride the exactly-once epoch loop as
    sidecars: the SCD current table converges to the lake's live
    state, the rollup equals the one-shot GROUP BY over it, and a
    LATE-ATTACHED sidecar catches up through replays (crash-window
    heal) to the same state as one attached from the start."""
    from pyspark.sql import functions as F

    from etl_cms_spark.plans.rollup import StateRollup
    from etl_cms_spark.plans.scd import Scd2History

    def mk_sidecars(root):
        scd = Scd2History(
            spark, os.path.join(root, "scd"), ["repo", "path"],
            {"commit": "string", "domain": "string"},
            n_buckets=8, merge_mode="mor",
        )
        roll = StateRollup(
            spark, os.path.join(root, "roll"),
            key_exprs={"domain": F.col("domain")},
            row_measures={"n_files": F.lit(1)},
            count_measure="n_files", n_buckets=4,
        )
        return scd, roll

    scd, roll = mk_sidecars(tmp_root)
    p = CDCPipeline(spark, os.path.join(tmp_root, "lake"), n_buckets=8,
                    merge_mode="mor", sidecars=[scd, roll])
    p.run(changes, n_epochs=3)

    live = p.current_state()
    assert_df_equal(
        scd.current.read().select("repo", "path", "commit", "domain"),
        live.select("repo", "path", "commit", "domain"),
        "scd2 sidecar current == lake live state",
    )
    assert_df_equal(
        roll.read(),
        live.groupBy("domain").agg(
            F.count("*").cast("long").alias("n_files")
        ),
        "rollup sidecar == one-shot GROUP BY over live state",
    )
    # history versions are disjoint per key: every closed version ends
    # at or before its successor's start (a delete-then-recreate gap
    # is legitimate — the delete closes a version with no history row
    # of its own), and only the LAST version may be open
    h = scd.history_df()
    from pyspark.sql.window import Window
    w = Window.partitionBy("repo", "path").orderBy("valid_from_lsn")
    bad = h.select(
        "*", F.lead("valid_from_lsn").over(w).alias("_next")
    ).where(
        (F.col("_next").isNotNull()
         & (F.col("valid_to_lsn").isNull()
            | (F.col("valid_to_lsn") > F.col("_next"))))
    )
    assert bad.count() == 0

    # late attach: pipeline ran 3 epochs WITHOUT sidecars; attaching
    # them and replaying converges to the same state
    root2 = os.path.join(tmp_root, "late")
    p2 = CDCPipeline(spark, os.path.join(root2, "lake"), n_buckets=8,
                     merge_mode="mor")
    p2.run(changes, n_epochs=3)
    scd2, roll2 = mk_sidecars(root2)
    p3 = CDCPipeline(spark, os.path.join(root2, "lake"), n_buckets=8,
                     merge_mode="mor", sidecars=[scd2, roll2])
    recs = p3.run(changes, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs)
    assert_df_equal(scd2.history_df(), scd.history_df(),
                    "late-attached scd == from-start scd")
    assert_df_equal(roll2.read(), roll.read(),
                    "late-attached rollup == from-start rollup")
