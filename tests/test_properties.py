"""Property-based tests (hypothesis) over the core operator laws.

Few, small examples — each example round-trips through Spark.
deadline=None because Spark job latency is environment noise; the
``spark`` fixture is session-scoped so reuse across examples is safe.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_cms_spark.operators.dedup import latest_by_lsn, latest_by_lsn_window
from etl_cms_spark.operators.eras import build_eras, build_eras_faithful
from etl_cms_spark.operators.skew import salted_latest_by_lsn

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals = st.lists(
    st.tuples(
        st.integers(0, 3),           # key
        st.integers(0, 120),         # start offset days
        st.integers(0, 15),          # duration days
    ),
    min_size=1,
    max_size=12,
)


@settings(**_SETTINGS)
@given(spark_intervals=intervals)
def test_era_forms_agree_on_random_intervals(spark, spark_intervals):
    base = dt.date(2020, 1, 1)
    rows = [
        (k, base + dt.timedelta(days=s), base + dt.timedelta(days=s + d))
        for k, s, d in spark_intervals
    ]
    df = spark.createDataFrame(rows, "k int, s date, e date")
    a = build_eras(df, ["k"], "s", "e", 30)
    b = build_eras_faithful(df, ["k"], "s", "e", 30)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


events = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 1000)),  # (key, lsn)
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[1],
)


@settings(**_SETTINGS)
@given(evts=events)
def test_dedup_forms_agree_on_random_streams(spark, evts):
    rows = [(k, lsn, f"payload-{k}-{lsn}") for k, lsn in evts]
    df = spark.createDataFrame(rows, "k int, lsn long, payload string")
    from etl_cms_spark.operators.dedup import latest_by_lsn_broadcast

    a = latest_by_lsn(df, ["k"], "lsn")
    b = latest_by_lsn_window(df, ["k"], "lsn")
    c = salted_latest_by_lsn(df, ["k"], "lsn", n_salts=4)
    d = latest_by_lsn_broadcast(df, ["k"], "lsn")
    ra = sorted(map(str, a.collect()))
    assert ra == sorted(map(str, b.collect())) == sorted(map(str, c.collect()))
    # broadcast-semi form: unique (k, lsn) fixture => exact equality
    assert ra == sorted(map(str, d.collect()))
    # law: kept lsn is the max per key
    expect = {}
    for k, lsn in evts:
        expect[k] = max(expect.get(k, -1), lsn)
    got = {r["k"]: r["lsn"] for r in a.collect()}
    assert got == expect


@settings(**_SETTINGS)
@given(spark_intervals=intervals)
def test_two_level_drug_era_equals_one_pass(spark, spark_intervals):
    """The reference stacks two gaps-and-islands passes (overlap merge
    at gap 0, then the 30-day persistence merge,
    create_CDMv5_drug_era_non_stockpile.sql:46-160); build_drug_eras
    collapses them into ONE pass.  Era boundaries AND exposure counts
    must agree on arbitrary interval sets."""
    from etl_cms_spark.plans.cdm import drug_era_collapse_two_level

    base = dt.date(2020, 1, 1)
    rows = [
        (k % 2, k // 2, base + dt.timedelta(days=s), base + dt.timedelta(days=s + d))
        for k, s, d in spark_intervals
    ]
    df = spark.createDataFrame(
        rows, "person_id int, ingredient_concept_id int, start date, end date"
    )
    one = build_eras(df, ["person_id", "ingredient_concept_id"], "start", "end", 30)
    two = drug_era_collapse_two_level(df, gap_days=30)
    assert sorted(map(str, one.collect())) == sorted(map(str, two.collect()))


# ---------------------------------------------------------------------
# payer_plan_period: faithful year-combo enumeration vs Python spec
# ---------------------------------------------------------------------


def _spec_period_list(m8, m9, m10):
    """Plain-Python transcription of README.md §j (the reference's
    get_payer_plan_period_date_list, CMS_SynPuf_ETL_CDM_v5.py:720-797)
    kept in the spec's own elif structure as an independent oracle."""
    import calendar

    def addm(d, delta):
        m = (d.month + delta) % 12
        y = d.year + (d.month + delta - 1) // 12
        if m == 0:
            m = 12
        day = min(d.day, calendar.monthrange(y, m)[1])
        return dt.date(y, m, day)

    out = []
    if m8 == 12 and m9 == 12 and m10 == 12:
        out.append((dt.date(2008, 1, 1), dt.date(2010, 12, 31)))
    elif m8 == 12 and m9 == 12 and m10 < 12:
        out.append((dt.date(2008, 1, 1), addm(dt.date(2009, 12, 31), m10)))
    elif m8 == 12 and m9 < 12 and m10 == 12:
        out.append((dt.date(2008, 1, 1), dt.date(2008, 12, 31)))
        if m9 > 0:
            out.append((dt.date(2009, 1, 1), addm(dt.date(2009, 1, 1), m9)))
        out.append((dt.date(2010, 1, 1), dt.date(2010, 12, 31)))
    elif m8 == 12 and m9 < 12 and m10 < 12:
        out.append((dt.date(2008, 1, 1), dt.date(2008, 12, 31)))
        if m9 > 0:
            out.append((dt.date(2009, 1, 1), addm(dt.date(2009, 1, 1), m9)))
        if m10 > 0:
            out.append((dt.date(2010, 1, 1), addm(dt.date(2010, 1, 1), m10)))
    elif m8 < 12 and m9 == 12 and m10 == 12:
        s = dt.date(2009, 1, 1) if m8 == 0 else addm(dt.date(2008, 12, 31), -m8)
        out.append((s, dt.date(2010, 12, 31)))
    elif m8 < 12 and m9 == 12 and m10 < 12:
        s = dt.date(2009, 1, 1) if m8 == 0 else addm(dt.date(2008, 12, 31), -m8)
        out.append((s, addm(dt.date(2009, 12, 31), m10)))
    elif m8 < 12 and m9 < 12 and m10 == 12:
        if m8 > 0:
            out.append((dt.date(2008, 1, 1), addm(dt.date(2008, 1, 1), m8)))
        if m9 > 0:
            out.append((dt.date(2009, 1, 1), addm(dt.date(2009, 1, 1), m9)))
        out.append((dt.date(2010, 1, 1), dt.date(2010, 12, 31)))
    else:
        if m8 > 0:
            out.append((dt.date(2008, 1, 1), addm(dt.date(2008, 1, 1), m8)))
        if m9 > 0:
            out.append((dt.date(2009, 1, 1), addm(dt.date(2009, 1, 1), m9)))
        if m10 > 0:
            out.append((dt.date(2010, 1, 1), addm(dt.date(2010, 1, 1), m10)))
    return out


def _bene_rows_for_combos(combos):
    """One synthetic beneficiary per (m8, m9, m10) combo, coverage on
    the Part-A column only (other plans 0 months)."""
    rows = []
    order = 0
    for i, (m8, m9, m10) in enumerate(combos):
        pid = f"P{i:05d}"
        for year, m in ((2008, m8), (2009, m9), (2010, m10)):
            rows.append((pid, year, str(m), "0", "0", "0", order))
            order += 1
    return rows


def test_faithful_payer_plan_enumeration_exhaustive(spark):
    """ALL 13^3 = 2197 (m2008, m2009, m2010) combos at once: the Spark
    branch-segment plan must equal the literal Python spec."""
    from itertools import product

    from etl_cms_spark.plans.cdm import build_payer_plan_period_faithful
    from pyspark.sql import functions as F

    combos = list(product(range(13), repeat=3))
    bene = spark.createDataFrame(
        _bene_rows_for_combos(combos),
        "desynpuf_id string, year int, bene_hi_cvrage_tot_mons string, "
        "bene_smi_cvrage_tot_mons string, bene_hmo_cvrage_tot_mons string, "
        "plan_cvrg_mos_num string, row_order long",
    )
    got = build_payer_plan_period_faithful(bene)
    id_map = {
        r["desynpuf_id"]: r["pid"]
        for r in bene.select(
            "desynpuf_id", F.xxhash64("desynpuf_id").alias("pid")
        ).distinct().collect()
    }
    got_a = {}
    for r in got.where(F.col("plan_source_value") == "MEDICARE_HI").collect():
        got_a.setdefault(r["person_id"], []).append(
            (r["payer_plan_period_start_date"], r["payer_plan_period_end_date"])
        )
    for i, (m8, m9, m10) in enumerate(combos):
        pid = id_map[f"P{i:05d}"]
        expect = _spec_period_list(m8, m9, m10)
        assert sorted(got_a.get(pid, [])) == sorted(expect), (m8, m9, m10)


def test_windowed_vs_faithful_payer_plan_divergence_is_pinned(spark):
    """The windowed form is NOT the 27-branch spec: it counts every
    partial year forward from Jan 1 and merges date-adjacent periods.
    Pin both the agreement set and one known divergence so a change
    in either form is caught."""
    from etl_cms_spark.plans.cdm import (
        build_payer_plan_period,
        build_payer_plan_period_faithful,
    )
    from pyspark.sql import functions as F

    # agreement: full runs + a partial year trailing a full run (the
    # spec extends Dec 31 by m months, which lands on month-end —
    # same as the windowed month_end).
    agree = [(12, 12, 12), (12, 12, 6), (12, 0, 0), (0, 12, 12)]
    # divergence: (a) leading partial — spec counts BACKWARD from
    # Dec 31; (b) mid-run partial — spec splits where windowed merges;
    # (c) standalone partial — spec ends at Jan 1 + m months (the 1st
    # of the following month), windowed at month_end(m).
    diverge = [(6, 12, 12), (12, 6, 12), (3, 5, 0), (0, 0, 7)]
    combos = agree + diverge
    bene = spark.createDataFrame(
        _bene_rows_for_combos(combos),
        "desynpuf_id string, year int, bene_hi_cvrage_tot_mons string, "
        "bene_smi_cvrage_tot_mons string, bene_hmo_cvrage_tot_mons string, "
        "plan_cvrg_mos_num string, row_order long",
    )
    def periods(df):
        out = {}
        for r in df.where(F.col("plan_source_value") == "MEDICARE_HI").collect():
            out.setdefault(r["person_id"], set()).add(
                (str(r["payer_plan_period_start_date"]), str(r["payer_plan_period_end_date"]))
            )
        return out
    w = periods(build_payer_plan_period(bene))
    f = periods(build_payer_plan_period_faithful(bene))
    id_map = {
        r["desynpuf_id"]: r["pid"]
        for r in bene.select(
            "desynpuf_id", F.xxhash64("desynpuf_id").alias("pid")
        ).distinct().collect()
    }
    for i, combo in enumerate(combos):
        pid = id_map[f"P{i:05d}"]
        if combo in agree:
            assert w.get(pid) == f.get(pid), combo
        else:
            assert w.get(pid) != f.get(pid), combo
    # the known divergence shape: (6,12,12) — faithful counts 2008
    # backward from Dec 31; windowed counts forward from Jan 1 and
    # cannot merge across the mid-year gap.
    pid = id_map[f"P{combos.index((6, 12, 12)):05d}"]
    assert f[pid] == {("2008-06-30", "2010-12-31")}
    assert w[pid] == {("2008-01-01", "2008-06-30"), ("2009-01-01", "2010-12-31")}


asof_data = st.tuples(
    # left rows: (key, time)
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=12),
    # right rows: (key, time) — version minted from position; unique
    # (key, time) so the as-of winner is well-defined on both forms
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        max_size=12,
        unique_by=lambda t: (t[0], t[1]),
    ),
)


@settings(**_SETTINGS)
@given(data=asof_data)
def test_asof_join_agrees_with_naive_on_random_data(spark, data):
    """asof_join (union+window) == theta-join argmax on arbitrary
    left/right streams: inclusive bound, unmatched lefts, keys absent
    from either side."""
    from pyspark.sql import functions as F

    from etl_cms_spark.operators.asof import asof_join

    lrows, rrows = data
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], "event_id long, k long, lt long"
    )
    right = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t) in enumerate(rrows)] or [(99, 0, 0)],
        "k long, rt long, version long",
    )
    got = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        right_cols=["version"], suffix="",
    )
    exp = (
        left.join(right, "k", "left")
        .groupBy("event_id", "k", "lt")
        .agg(
            F.max(
                F.when(
                    F.col("rt").isNotNull() & (F.col("rt") <= F.col("lt")),
                    F.struct("rt", "version"),
                )
            ).alias("_m")
        )
        .select("event_id", "k", "lt", F.col("_m.rt").alias("rt"), F.col("_m.version").alias("version"))
    )
    assert sorted(map(str, got.collect())) == sorted(map(str, exp.collect()))


lake_script = st.lists(
    st.sampled_from(["epoch", "compact", "rollback", "replay"]),
    min_size=3,
    max_size=7,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(script=lake_script, mor=st.booleans())
def test_lake_soak_random_op_interleavings(spark, tmp_path_factory, script, mor):
    """Model-based soak: any interleaving of epoch applies, compactions,
    rollbacks, and full replays must leave the lake equal to the
    model — max-LSN winners over every epoch COMMITTED at the end,
    tombstones excluded.  Rollback is always followed by a full replay
    (the documented recovery contract), so the final committed set is
    every offered epoch."""
    import shutil

    from pyspark.sql import functions as F

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn_window
    from etl_cms_spark.sink.lake import LakeTable

    changes = gen_source_changes(spark, n_events=600, n_keys=120, n_repos=6).drop(
        "schema_change", "ts"
    ).cache()
    n_epochs = 3
    hi = changes.agg(F.max("lsn")).first()[0]
    width = (hi + n_epochs) // n_epochs
    batches = [
        changes.where((F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width))
        for e in range(n_epochs)
    ]
    root = str(tmp_path_factory.mktemp("soak"))
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor" if mor else "cow")
    t.create(["repo", "path"], {
        "repo": "string", "path": "string", "commit": "string",
        "lang": "string", "content": "string",
    })

    def offer(e):
        t.merge_epoch(batches[e], e)

    next_epoch = 0
    for op in script:
        if op == "epoch" and next_epoch < n_epochs:
            offer(next_epoch)
            next_epoch += 1
        elif op == "compact" and t.merge_mode == "mor":
            t.compact()
        elif op == "rollback" and t.lineage():
            t.rollback(t.lineage()[0]["snapshot_version"])
            for e in range(n_epochs):
                offer(e)
            next_epoch = n_epochs
        elif op == "replay":
            for e in range(next_epoch):
                offer(e)
    # drain the rest so the model (all epochs) applies
    for e in range(next_epoch, n_epochs):
        offer(e)

    model = latest_by_lsn_window(changes, ["repo", "path"], "lsn").where(
        F.col("op") != "D"
    ).select("repo", "path", "commit", "lang", "content")
    got = t.read().select(*model.columns)
    assert got.exceptAll(model).count() == 0
    assert model.exceptAll(got).count() == 0


lake_script_v2 = st.lists(
    st.sampled_from(["epoch", "compact", "rollback", "replay", "widen", "vacuum"]),
    min_size=4,
    max_size=8,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(script=lake_script_v2, mor=st.booleans())
def test_lake_soak_with_schema_and_gc(spark, tmp_path_factory, script, mor):
    """Round-4 soak extension: the round-3 alphabet plus WIDEN (a
    lossless int→long type promotion mid-stream — metadata-only, so
    the model only changes by a cast) and VACUUM (snapshot-expiry GC,
    which must never disturb the current state; rollback respects the
    documented vacuum-horizon contract by checking the target
    manifest still exists)."""
    import os as _os
    import shutil

    from pyspark.sql import functions as F

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.operators.dedup import latest_by_lsn_window
    from etl_cms_spark.sink.lake import LakeTable

    changes = (
        gen_source_changes(spark, n_events=600, n_keys=120, n_repos=6)
        .drop("schema_change", "ts")
        .withColumn("size", F.coalesce(F.length("content"), F.lit(0)).cast("int"))
        .cache()
    )
    n_epochs = 3
    hi = changes.agg(F.max("lsn")).first()[0]
    width = (hi + n_epochs) // n_epochs
    batches = [
        changes.where((F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width))
        for e in range(n_epochs)
    ]
    root = str(tmp_path_factory.mktemp("soak2"))
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable(spark, root, n_buckets=4, merge_mode="mor" if mor else "cow")
    t.create(["repo", "path"], {
        "repo": "string", "path": "string", "commit": "string",
        "lang": "string", "content": "string", "size": "int",
    })

    def offer(e):
        t.merge_epoch(batches[e], e)

    next_epoch = 0
    for op in script:
        if op == "epoch" and next_epoch < n_epochs:
            offer(next_epoch)
            next_epoch += 1
        elif op == "compact" and t.merge_mode == "mor":
            t.compact()
        elif op == "rollback" and t.lineage():
            v = t.lineage()[0]["snapshot_version"]
            if _os.path.exists(_os.path.join(t._manifest_dir, f"v{v}.json")):
                t.rollback(v)
                for e in range(n_epochs):
                    offer(e)
                next_epoch = n_epochs
        elif op == "replay":
            for e in range(next_epoch):
                offer(e)
        elif op == "widen":
            t.apply_schema_change({"widen": "size:long"})
        elif op == "vacuum":
            t.vacuum(keep_last=2)
    for e in range(next_epoch, n_epochs):
        offer(e)

    model = latest_by_lsn_window(changes, ["repo", "path"], "lsn").where(
        F.col("op") != "D"
    ).select(
        "repo", "path", "commit", "lang", "content",
        F.col("size").cast("long").alias("size"),
    )
    got = t.read().select("repo", "path", "commit", "lang", "content",
                          F.col("size").cast("long").alias("size"))
    assert got.exceptAll(model).count() == 0
    assert model.exceptAll(got).count() == 0


# ------------------------------------------------------------------ #
# Partial-image fold: model-based random streams                     #
# ------------------------------------------------------------------ #

partial_events = st.lists(
    st.tuples(
        st.integers(0, 4),                       # key
        st.integers(0, 400),                     # lsn
        st.sampled_from(["U", "U", "U", "D"]),   # op (~25% deletes)
        st.one_of(st.none(), st.integers(0, 9)),  # col a (None = absent)
        st.one_of(st.none(), st.integers(0, 9)),  # col b
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda t: t[1],  # distinct lsns (the changelog contract)
)


def _model_fold(evts):
    """Reference model: apply events in LSN order to per-key dicts —
    delete clears, update sets only present columns."""
    state = {}
    last = {}
    for k, lsn, op, a, b in sorted(evts, key=lambda t: t[1]):
        last[k] = lsn
        if op == "D":
            state.pop(k, None)
            continue
        row = state.setdefault(k, {})
        if a is not None:
            row["a"] = a
        if b is not None:
            row["b"] = b
    return {
        k: (st_.get("a"), st_.get("b"), last[k]) for k, st_ in state.items()
    }, {k for k in last if k not in state}


@settings(**_SETTINGS)
@given(evts=partial_events)
def test_fold_partial_matches_sequential_model(spark, evts):
    from etl_cms_spark.operators.dedup import fold_partial_updates

    rows = [
        (k, lsn, op, None if op == "D" else a, None if op == "D" else b)
        for k, lsn, op, a, b in evts
    ]
    df = spark.createDataFrame(rows, "k int, lsn long, op string, a int, b int")
    out = fold_partial_updates(df, ["k"], "lsn", op_col="op")
    got_live = {
        r["k"]: (r["a"], r["b"], r["lsn"]) for r in out.collect() if r["op"] == "U"
    }
    got_deleted = {r["k"] for r in out.collect() if r["op"] == "D"}
    want_live, want_deleted = _model_fold(rows)
    assert got_live == want_live
    assert got_deleted == want_deleted


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evts=partial_events, order=st.permutations([0, 1, 2]))
def test_columnar_epochs_match_model_under_any_order(
    spark, tmp_path_factory, evts, order
):
    """Random partial streams, split into 3 LSN-range epochs, applied
    to a columnar table in a RANDOM order — final state must equal the
    sequential per-key dict model."""
    from etl_cms_spark.sink.lake import LakeTable

    rows = [
        (k, lsn, op, None if op == "D" else a, None if op == "D" else b)
        for k, lsn, op, a, b in evts
    ]
    df = spark.createDataFrame(rows, "k int, lsn long, op string, a int, b int")
    root = str(tmp_path_factory.mktemp("colprop"))
    t = LakeTable(spark, root, n_buckets=2, merge_mode="mor")
    t.create(["k"], {"k": "int", "a": "int", "b": "int"},
             partial_columnar=True)
    from pyspark.sql import functions as F

    bounds = [(0, 134), (134, 267), (267, 401)]
    for e in order:
        lo, hi = bounds[e]
        t.append_partial_epoch(
            df.where((F.col("lsn") >= lo) & (F.col("lsn") < hi)), e
        )
    got = {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}
    want_live, _ = _model_fold(rows)
    assert got == {k: (a, b) for k, (a, b, _) in want_live.items()}


# ---- planning-time file pruning: read_where == read().where() ----
# under random data (nulls included), random epoch splits, random
# maintenance (layout/file cap), random range/IN predicates.

prune_rows = st.lists(
    st.tuples(
        st.integers(0, 40),                          # key id
        st.one_of(st.none(), st.integers(-50, 50)),  # num (nullable)
        st.sampled_from(["ada", "c", "go", "js", "py"]),
        st.booleans(),                               # delete?
    ),
    min_size=4,
    max_size=40,
)
prune_pred = st.one_of(
    st.tuples(st.integers(-60, 60), st.integers(0, 40)).map(
        lambda t: {"num": (t[0], t[0] + t[1])}
    ),
    st.lists(
        st.sampled_from(["ada", "c", "go", "js", "py", "zz"]),
        min_size=1, max_size=3,
    ).map(lambda v: {"lang": v}),
    st.tuples(st.sampled_from(["ada", "go", "zz"]),
              st.sampled_from(["js", "py", "rs"])).map(
        lambda t: {"lang": (min(t), max(t))}
    ),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=prune_rows, pred=prune_pred, compact=st.booleans(),
       layout=st.sampled_from(["linear", "zorder"]),
       cap=st.sampled_from([0, 7]),
       member=st.sampled_from([0, 512, 64]))
def test_read_where_always_equals_filtered_read(
    spark, tmp_path_factory, rows, pred, compact, layout, cap, member
):
    import os

    from etl_cms_spark.sink.lake import LakeTable
    from tests.conftest import assert_df_equal

    root = str(tmp_path_factory.mktemp("prune_prop"))
    t = LakeTable(spark, os.path.join(root, "t"), n_buckets=4,
                  merge_mode="mor")
    t.create(["k"], {"k": "string", "num": "int", "lang": "string"})
    data = [
        (f"k{kid:02d}", num, lang, "D" if is_del else "U", i + 1)
        for i, (kid, num, lang, is_del) in enumerate(rows)
    ]
    half = max(1, len(data) // 2)
    for epoch, chunk in enumerate([data[:half], data[half:]]):
        if chunk:
            t.merge_epoch(
                spark.createDataFrame(
                    chunk, "k string, num int, lang string, op string, lsn long"
                ),
                epoch,
            )
    if compact:
        t.compact(cluster_by=["num", "lang"], cluster_layout=layout,
                  target_file_rows=cap or None)
        t.refresh_stats(["num", "lang"])
    if member:
        # membership sketches too (64-bit width often saturates ->
        # FULL path; 512 usually stays exact) — equality/IN probes on
        # lang must prune identically under both
        t.refresh_member_stats(["lang", "num"], bits=member)
    got = t.read_where(pred)
    exp = t.read()
    from pyspark.sql import functions as F

    for c, v in pred.items():
        if isinstance(v, tuple):
            exp = exp.where(F.col(c).between(F.lit(v[0]), F.lit(v[1])))
        else:
            exp = exp.where(F.col(c).isin(*v))
    assert_df_equal(got, exp, f"pred={pred} compact={compact} {layout}/{cap}")
    # metadata-assisted counting must agree under every random
    # data/maintenance/predicate draw (proof ladder never over- or
    # under-counts, with or without stats coverage)
    assert t.count_where(pred)["count"] == exp.count(), (
        f"count_where pred={pred} compact={compact} {layout}/{cap}"
    )


jv_events = st.lists(
    st.tuples(
        st.integers(0, 3),            # key (path id)
        st.sampled_from(["U", "U", "U", "D"]),
        st.integers(0, 2),            # lang id (join key)
        st.integers(0, 5),            # payload value
        st.integers(0, 2),            # epoch ASSIGNMENT (arbitrary: not lsn-ordered!)
    ),
    min_size=1,
    max_size=14,
)


@settings(**_SETTINGS)
@given(evts=jv_events)
def test_joinview_tracks_join_under_arbitrary_epoch_assignment(
    spark, evts, tmp_path_factory
):
    """The maintained view equals fact⋈dim after folding epochs whose
    event→epoch assignment is ARBITRARY (hypothesis-chosen), i.e. a
    later epoch may carry earlier LSNs for a key — the file-split
    streaming shape.  A stale batch row that lost the lake's LWW
    merge must never overwrite the view (epoch_effective_batch's
    diff-key filter); LSNs are the global event index, so winners are
    well-defined."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from etl_cms_spark.plans.joinview import MaterializedJoinView
    from etl_cms_spark.sink.lake import LakeTable

    root = str(tmp_path_factory.mktemp("jv_prop"))
    try:
        fact = LakeTable(spark, os.path.join(root, "fact"), 4,
                         merge_mode="mor")
        fact.create(["path"], {"path": "string", "lang": "string",
                               "val": "long"})
        dim = LakeTable(spark, os.path.join(root, "dim"), 2,
                        merge_mode="mor")
        dim.create(["lang"], {"lang": "string", "rank": "long"})
        dim.merge_epoch(
            spark.createDataFrame(
                [(i + 1, "U", f"l{i}", 10 + i) for i in range(3)],
                "lsn long, op string, lang string, rank long",
            ),
            0,
        )
        view = MaterializedJoinView(
            spark, os.path.join(root, "view"), fact, dim, ["lang"],
            n_buckets=4, merge_mode="mor",
        )
        schema = "lsn long, op string, path string, lang string, val long"
        for e in range(3):
            rows = [
                (i, op, f"k{k}",
                 None if op == "D" else f"l{lng}",
                 None if op == "D" else v)
                for i, (k, op, lng, v, ep) in enumerate(evts)
                if ep == e
            ]
            batch = spark.createDataFrame(rows, schema)
            # one winner per (key) within the epoch: max lsn
            from etl_cms_spark.operators.dedup import latest_by_lsn
            fact.merge_epoch(latest_by_lsn(batch, ["path"], "lsn"), e)
            view.apply_epoch(e)
        cols = ["path", "lang", "val", "rank"]
        got = sorted(map(tuple, view.read().select(*cols).collect()))
        exp = sorted(map(tuple,
                         fact.read().join(dim.read(), "lang", "inner")
                         .select(*cols).collect()))
        assert got == exp, f"view diverged: {got} != {exp}"
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------
# Branch refs: random changelog, random fork point, publish vs drop
# ---------------------------------------------------------------------

branch_events = st.lists(
    st.tuples(
        st.integers(0, 9),            # key id
        st.sampled_from(["U", "D"]),  # op
        st.integers(0, 99),           # payload seed
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(evts=branch_events, fork_at=st.integers(0, 23), publish=st.booleans(),
       mor=st.booleans())
def test_branch_publish_or_drop_matches_fold(
    spark, tmp_path_factory, evts, fork_at, publish, mor
):
    """Epochs before the fork commit to main, the rest to a branch.
    fast_forward => final state == latest-wins over ALL events;
    drop_branch => final state == latest-wins over the MAIN prefix
    only.  Random key overlap and deletes cross the fork boundary."""
    from etl_cms_spark.sink.lake import LakeTable

    fork_at = min(fork_at, len(evts))
    rows = [
        (i + 1, op, "r", f"k{k}", f"c{seed}", "py", f"body-{seed}" if op == "U" else None)
        for i, (k, op, seed) in enumerate(evts)
    ]
    # deletes carry no payload
    rows = [
        (lsn, op, repo, path, None if op == "D" else c,
         None if op == "D" else lang, body)
        for (lsn, op, repo, path, c, lang, body) in rows
    ]
    schema = ("lsn long, op string, repo string, path string, "
              "commit string, lang string, content string")
    root = str(tmp_path_factory.mktemp("brprop"))
    t = LakeTable(spark, f"{root}/t", n_buckets=2,
                  merge_mode="mor" if mor else "cow")
    t.create(["repo", "path"], {"repo": "string", "path": "string",
                                "commit": "string", "lang": "string",
                                "content": "string"})
    if rows[:fork_at]:
        t.merge_epoch(spark.createDataFrame(rows[:fork_at], schema), 0)
    t.create_branch("p")
    b = t.branch_table("p")
    tail = rows[fork_at:]
    # split the tail into up to two branch epochs
    mid = len(tail) // 2
    for e, chunk in enumerate([tail[:mid], tail[mid:]]):
        if chunk:
            b.merge_epoch(spark.createDataFrame(chunk, schema), e + 1)
    if publish:
        t.fast_forward("p")
        visible = rows
    else:
        t.drop_branch("p")
        visible = rows[:fork_at]
    # model: latest-wins fold, deletes remove
    model = {}
    for (lsn, op, repo, path, c, lang, body) in visible:
        if op == "D":
            model.pop((repo, path), None)
        else:
            model[(repo, path)] = (c, body)
    got = {
        (x["repo"], x["path"]): (x["commit"], x["content"])
        for x in t.read().collect()
    }
    assert got == model
