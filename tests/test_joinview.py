"""Materialized join-view maintenance: per-epoch incremental fold
equals the full fact⋈dim recompute after EVERY epoch (inner and
left), dim-only and fact-only epochs work, late-arriving dims
resurrect unmatched facts, dim-key moves relocate, deletes retract,
and replays are no-ops."""

import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.operators.dedup import latest_by_lsn
from etl_cms_spark.plans.joinview import MaterializedJoinView
from etl_cms_spark.sink.lake import LakeTable
from tests.conftest import assert_df_equal

FACT_SCHEMA = {"repo": "string", "path": "string", "commit": "string",
               "lang": "string", "content": "string"}
DIM_SCHEMA = {"lang": "string", "concept_id": "long", "domain": "string"}


def _dim_epochs(spark):
    """Three deterministic dim epochs over the lang key: epoch 0
    inserts even langs, epoch 1 updates half of those + inserts the
    odd ones, epoch 2 deletes every 5th lang."""
    from etl_cms_spark.fixtures.generator import LANG_VOCAB

    def rows(pred, op, bump):
        return [
            (100 * bump + i, op, lang, 1000 + 10 * i + bump, f"dom{i % 3}")
            for i, lang in enumerate(LANG_VOCAB)
            if pred(i)
        ]

    schema = "lsn long, op string, lang string, concept_id long, domain string"
    e0 = spark.createDataFrame(rows(lambda i: i % 2 == 0, "U", 1), schema)
    e1 = spark.createDataFrame(
        rows(lambda i: i % 4 == 0, "U", 2) + rows(lambda i: i % 2 == 1, "U", 2),
        schema,
    )
    e2 = spark.createDataFrame(
        [(300 + i, "D", lang, None, None)
         for i, lang in enumerate(LANG_VOCAB) if i % 5 == 0],
        schema,
    )
    return [e0, e1, e2]


def _fact_epochs(spark, n_events=2500):
    ch = gen_source_changes(spark, n_events=n_events, n_keys=400, n_repos=10)
    hi = ch.agg(F.max("lsn")).first()[0]
    width = (hi + 3) // 3
    return [
        ch.where((F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width))
        .select("lsn", "op", "repo", "path", "commit", "lang", "content")
        for e in range(3)
    ]


def _setup(spark, root, how="inner", n_buckets=8, merge_mode="cow"):
    fact = LakeTable(spark, os.path.join(root, "fact"), n_buckets,
                     merge_mode=merge_mode)
    fact.create(["repo", "path"], FACT_SCHEMA)
    dim = LakeTable(spark, os.path.join(root, "dim"), 4,
                    merge_mode=merge_mode)
    dim.create(["lang"], DIM_SCHEMA)
    view = MaterializedJoinView(
        spark, os.path.join(root, "view"), fact, dim, ["lang"],
        n_buckets=n_buckets, how=how, merge_mode=merge_mode,
    )
    return fact, dim, view


def _expected(fact, dim, how):
    return fact.read().join(dim.read(), "lang", how).select(
        "repo", "path", "commit", "lang", "content", "concept_id", "domain"
    )


def _run_epochs(spark, fact, dim, view, fact_batches, dim_batches, check=None):
    for e in range(max(len(fact_batches), len(dim_batches))):
        if e < len(fact_batches) and fact_batches[e] is not None:
            fact.merge_epoch(
                latest_by_lsn(fact_batches[e], ["repo", "path"], "lsn"), e
            )
        if e < len(dim_batches) and dim_batches[e] is not None:
            dim.merge_epoch(latest_by_lsn(dim_batches[e], ["lang"], "lsn"), e)
        view.apply_epoch(e)
        if check:
            check(e)


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_inner_view_tracks_full_recompute_every_epoch(
    spark, tmp_root, merge_mode
):
    # "mor" exercises the epoch_batch fast path (the fold reads the
    # epoch's own delta files); "cow" the changes_for_epoch fallback.
    fact, dim, view = _setup(spark, tmp_root, "inner", merge_mode=merge_mode)
    def check(e):
        assert_df_equal(
            view.read().select("repo", "path", "commit", "lang", "content",
                               "concept_id", "domain"),
            _expected(fact, dim, "inner"),
            f"inner view == full join after epoch {e}",
        )
    _run_epochs(spark, fact, dim, view,
                _fact_epochs(spark), _dim_epochs(spark), check)


def test_left_view_tracks_full_recompute_every_epoch(spark, tmp_root):
    fact, dim, view = _setup(spark, tmp_root, "left", merge_mode="mor")
    def check(e):
        assert_df_equal(
            view.read().select("repo", "path", "commit", "lang", "content",
                               "concept_id", "domain"),
            _expected(fact, dim, "left"),
            f"left view == full left join after epoch {e}",
        )
    _run_epochs(spark, fact, dim, view,
                _fact_epochs(spark), _dim_epochs(spark), check)


def test_replay_is_noop(spark, tmp_root):
    fact, dim, view = _setup(spark, tmp_root)
    _run_epochs(spark, fact, dim, view,
                _fact_epochs(spark), _dim_epochs(spark))
    before = view.read().collect()
    rec = view.apply_epoch(1)
    assert rec["skipped_duplicate_epoch"]
    assert sorted(map(tuple, view.read().collect())) == sorted(map(tuple, before))


def test_late_arriving_dim_resurrects_unmatched_facts(spark, tmp_root):
    fact, dim, view = _setup(spark, tmp_root, "inner")
    fe = _fact_epochs(spark)
    de = _dim_epochs(spark)
    # epoch 0: facts only — inner view must be EMPTY (no dims yet)
    _run_epochs(spark, fact, dim, view, [fe[0]], [None])
    assert view.read().count() == 0
    # epoch 1: dims arrive, NO fact changes — previously-unmatched
    # facts must appear via the dim-side fact-table lookup
    fact_keys_before = fact.read().count()
    _run_epochs(spark, fact, dim, view, [None, None], [None, de[0]])
    assert_df_equal(
        view.read().select("repo", "path", "commit", "lang", "content",
                           "concept_id", "domain"),
        _expected(fact, dim, "inner"),
        "late dim resurrects unmatched facts",
    )
    assert fact.read().count() == fact_keys_before


def test_dim_key_move_and_fact_delete(spark, tmp_root):
    fact, dim, view = _setup(spark, tmp_root, "inner", n_buckets=4)
    f_schema = "lsn long, op string, repo string, path string, commit string, lang string, content string"
    d_schema = "lsn long, op string, lang string, concept_id long, domain string"
    f0 = spark.createDataFrame(
        [(1, "U", "r", "a", "c1", "py", "v1"),
         (2, "U", "r", "b", "c2", "go", "v1")], f_schema)
    d0 = spark.createDataFrame(
        [(1, "U", "py", 10, "d0"), (2, "U", "go", 20, "d0")], d_schema)
    # epoch 1: fact a MOVES py->go; fact b deleted; dim py updated
    f1 = spark.createDataFrame(
        [(11, "U", "r", "a", "c3", "go", "v2"),
         (12, "D", "r", "b", None, None, None)], f_schema)
    d1 = spark.createDataFrame([(11, "U", "py", 99, "d9")], d_schema)
    def check(e):
        assert_df_equal(
            view.read().select("repo", "path", "commit", "lang", "content",
                               "concept_id", "domain"),
            _expected(fact, dim, "inner"),
            f"move/delete epoch {e}",
        )
    _run_epochs(spark, fact, dim, view, [f0, f1], [d0, d1], check)
    rows = {r["path"]: r for r in view.read().collect()}
    assert set(rows) == {"a"}
    assert rows["a"]["concept_id"] == 20  # moved to go's dim row


def test_pipeline_sidecar_rides_epochs(spark, tmp_root):
    """sidecars=[view] on CDCPipeline: the view folds every committed
    fact epoch inside the exactly-once loop; a crashed (fresh) view
    attached to a replay catches up without re-merging."""
    from etl_cms_spark.plans.pipeline import CDCPipeline

    # the pipeline's mapped table already carries concept_id/domain
    # (broadcast concept enrichment), so the sidecar dim uses its own
    # payload names.
    dim = LakeTable(spark, os.path.join(tmp_root, "dim"), 4)
    dim.create(["lang"], {"lang": "string", "lang_family": "string",
                          "lang_rank": "long"})
    dim.merge_epoch(
        latest_by_lsn(
            _dim_epochs(spark)[0].select(
                "lsn", "op", "lang",
                F.concat(F.lit("fam-"), F.col("domain")).alias("lang_family"),
                F.col("concept_id").alias("lang_rank"),
            ),
            ["lang"], "lsn",
        ),
        0,
    )
    root = os.path.join(tmp_root, "lake")
    changes = gen_source_changes(spark, n_events=1200, n_keys=200, n_repos=10)
    p = CDCPipeline(spark, root)
    view = MaterializedJoinView(
        spark, os.path.join(tmp_root, "view"), p.table, dim, ["lang"]
    )
    p.sidecars.append(view)
    recs = p.run(changes, n_epochs=3)
    assert all("sidecars" in r for r in recs)

    def expected():
        return p.current_state().join(dim.read(), "lang", "inner").select(
            "repo", "path", "lang", "content", "lang_family", "lang_rank"
        )

    sel = ["repo", "path", "lang", "content", "lang_family", "lang_rank"]
    assert_df_equal(
        view.read().select(*sel), expected(),
        "sidecar-maintained view == full join",
    )
    # crash-window heal: a fresh view over the committed lake
    view2 = MaterializedJoinView(
        spark, os.path.join(tmp_root, "view2"), p.table, dim, ["lang"]
    )
    p2 = CDCPipeline(spark, root, sidecars=[view2])
    recs2 = p2.run(changes, n_epochs=3)
    assert all(r.get("skipped_duplicate_epoch") for r in recs2)
    assert_df_equal(
        view2.read().select(*sel), expected(),
        "healed view == full join",
    )


def test_snowflake_chain_tracks_full_recompute_every_epoch(spark, tmp_root):
    """Two STACKED views (view1 = fact⋈dim1 is view2's fact, joined
    to dim2 on a dim1 payload column) track the one-shot 3-way join
    after every epoch — including a late-arriving dim2 row (its whole
    subtree resurrects) and a dim2 delete (the subtree retracts)."""
    fact, dim1, v1 = _setup(spark, tmp_root, "inner", merge_mode="mor")
    dim2 = LakeTable(spark, os.path.join(tmp_root, "dim2"), 2,
                     merge_mode="mor")
    dim2.create(["domain"], {"domain": "string", "rank": "long"})
    v2 = MaterializedJoinView(
        spark, os.path.join(tmp_root, "v2"), v1.table, dim2, ["domain"],
        n_buckets=8, merge_mode="mor",
    )
    d2_schema = "lsn long, op string, domain string, rank long"
    d2 = [
        spark.createDataFrame([(1, "U", "dom0", 10), (2, "U", "dom1", 20)],
                              d2_schema),
        spark.createDataFrame([(11, "U", "dom2", 30), (12, "U", "dom0", 99)],
                              d2_schema),
        spark.createDataFrame([(21, "D", "dom1", None)], d2_schema),
    ]
    fe, de = _fact_epochs(spark), _dim_epochs(spark)
    for e in range(3):
        fact.merge_epoch(latest_by_lsn(fe[e], ["repo", "path"], "lsn"), e)
        dim1.merge_epoch(latest_by_lsn(de[e], ["lang"], "lsn"), e)
        v1.apply_epoch(e)
        dim2.merge_epoch(latest_by_lsn(d2[e], ["domain"], "lsn"), e)
        v2.apply_epoch(e)
        cols = ["repo", "path", "commit", "lang", "content",
                "concept_id", "domain", "rank"]
        assert_df_equal(
            v2.read().select(*cols),
            fact.read().join(dim1.read(), "lang", "inner")
                .join(dim2.read(), "domain", "inner").select(*cols),
            f"chained view == 3-way join after epoch {e}",
        )


def test_view_follows_base_schema_evolution(spark, tmp_root):
    """Base-table evolution propagates into the view before each fold:
    a fact RENAME renames the view column (no silent NULL-fill — the
    round-5 bug class _sync_schema exists for), a fact ADD appears, a
    fact DROP disappears, and a dim RENAME follows too; the long-lived
    view object keeps tracking the full recompute throughout."""
    f_schema = "lsn long, op string, repo string, path string, commit string, lang string, content string"
    d_schema = "lsn long, op string, lang string, concept_id long, domain string"
    fact, dim, view = _setup(spark, tmp_root, "inner", merge_mode="mor")
    f0 = spark.createDataFrame(
        [(1, "U", "r", "a", "c1", "py", "v1"),
         (2, "U", "r", "b", "c2", "go", "v1")], f_schema)
    d0 = spark.createDataFrame(
        [(1, "U", "py", 10, "d0"), (2, "U", "go", 20, "d1")], d_schema)
    fact.merge_epoch(f0, 0)
    dim.merge_epoch(d0, 0)
    view.apply_epoch(0)

    # epoch 1: fact renames content->body and adds stars; dim renames
    # domain->realm
    fact.apply_schema_change({"rename": "content:body"})
    fact.apply_schema_change({"add": "stars:bigint"})
    dim.apply_schema_change({"rename": "domain:realm"})
    f1 = spark.createDataFrame(
        [(11, "U", "r", "a", "c3", "py", "v2", 7)],
        f_schema.replace("content string", "body string") + ", stars bigint",
    )
    d1 = spark.createDataFrame(
        [(11, "U", "py", 99, "d9")],
        d_schema.replace("domain", "realm"),
    )
    fact.merge_epoch(f1, 1)
    dim.merge_epoch(d1, 1)
    view.apply_epoch(1)  # long-lived object, post-evolution
    cols = ["repo", "path", "commit", "lang", "body", "stars",
            "concept_id", "realm"]
    assert set(view.read().columns) == set(cols)
    assert_df_equal(
        view.read().select(*cols),
        fact.read().join(dim.read(), "lang", "inner").select(*cols),
        "view tracks recompute across rename/add",
    )
    # pre-evolution rows kept their payload under the NEW name
    row_b = view.read().where(F.col("path") == "b").first()
    assert row_b["body"] == "v1" and row_b["stars"] is None

    # epoch 2: fact drops commit — the view drops it too
    fact.apply_schema_change({"drop": "commit"})
    f2 = spark.createDataFrame(
        [(21, "U", "r", "b", "go", "v3", 1)],
        "lsn long, op string, repo string, path string, lang string, "
        "body string, stars bigint",
    )
    fact.merge_epoch(f2, 2)
    dim.merge_epoch(d1.limit(0), 2)
    view.apply_epoch(2)
    assert "commit" not in view.read().columns
    cols2 = ["repo", "path", "lang", "body", "stars", "concept_id", "realm"]
    assert_df_equal(
        view.read().select(*cols2),
        fact.read().join(dim.read(), "lang", "inner").select(*cols2),
        "view tracks recompute across drop",
    )


def test_lake_refuses_key_column_rename(spark, tmp_root):
    import pytest

    t = LakeTable(spark, os.path.join(tmp_root, "k"), 4)
    t.create(["repo", "path"], FACT_SCHEMA)
    with pytest.raises(ValueError, match="key column"):
        t.apply_schema_change({"rename": "repo:repository"})


def test_dim_epoch_prunes_fact_scan_when_clustered(spark, tmp_root):
    """r5 verdict item 6: with the fact z-ordered by the dim key and
    its stats refreshed, a dim-changing epoch's fact scan must skip
    files that cannot hold a changed key (read_where plan), and the
    pruned fold must equal the broadcast-semi fallback's result."""
    root = os.path.join(tmp_root, "jv_prune")
    fact = LakeTable(spark, os.path.join(root, "fact"), n_buckets=4,
                     merge_mode="mor")
    fact.create(["repo", "path"], FACT_SCHEMA)
    dim = LakeTable(spark, os.path.join(root, "dim"), n_buckets=2)
    dim.create(["lang"], DIM_SCHEMA)
    fact_epochs = _fact_epochs(spark, n_events=6000)
    dim_epochs = _dim_epochs(spark)
    fact.merge_epoch(latest_by_lsn(fact_epochs[0], ["repo", "path"]), 0)
    fact.merge_epoch(latest_by_lsn(fact_epochs[1], ["repo", "path"]), 1)
    dim.merge_epoch(dim_epochs[0], 0)
    dim.merge_epoch(dim_epochs[1], 1)
    # cluster the fact by the dim key and cover it in the stats cache
    fact.compact(cluster_by=["lang"], cluster_layout="zorder",
                 target_file_rows=25)
    fact.refresh_stats(["lang"])

    va = MaterializedJoinView(spark, os.path.join(root, "va"), fact, dim,
                              ["lang"], n_buckets=4)
    va.apply_epoch(0)
    va.apply_epoch(1)
    # dim-only epoch 2 (deletes every 5th lang) — the pruned path
    dim.merge_epoch(dim_epochs[2], 2)
    changed = [r["lang"] for r in dim_epochs[2].select("lang").distinct().collect()]
    plan = fact.plan_where({"lang": changed})
    assert plan["files_read"] < plan["files_total"], plan
    va.apply_epoch(2)

    # fallback twin: force the broadcast-semi scan, same epochs
    vb = MaterializedJoinView(spark, os.path.join(root, "vb"), fact, dim,
                              ["lang"], n_buckets=4)
    vb._DIM_PRUNE_MAX_KEYS = 0  # instance override: always fall back
    vb.apply_epoch(0)
    vb.apply_epoch(1)
    vb.apply_epoch(2)
    assert_df_equal(va.read(), vb.read(), "pruned == broadcast-semi fold")
