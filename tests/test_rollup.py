"""Incremental rollup (continuous aggregate): multi-epoch fold equals
the one-shot aggregate, replays are no-ops, and a fresh instance
resumes from the committed state."""

import os

from pyspark.sql import functions as F

from etl_cms_spark.fixtures.generator import gen_source_changes
from etl_cms_spark.plans.rollup import IncrementalRollup


def _mk(spark, root):
    return IncrementalRollup(
        spark,
        root,
        key_exprs={"repo": F.col("repo")},
        measures={
            "n_events": F.count(F.lit(1)),
            "n_deletes": F.sum((F.col("op") == "D").cast("long")),
        },
    )


def _expected(changes):
    return changes.groupBy("repo").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
    )


def _epochs(changes, n):
    hi = changes.agg(F.max("lsn")).first()[0]
    width = (hi + n) // n
    return [
        changes.where((F.col("lsn") >= e * width) & (F.col("lsn") < (e + 1) * width))
        for e in range(n)
    ]


def test_incremental_fold_equals_one_shot(spark, tmp_root):
    changes = gen_source_changes(spark, n_events=4000, n_keys=500, n_repos=12)
    r = _mk(spark, os.path.join(tmp_root, "rollup"))
    for e, batch in enumerate(_epochs(changes, 3)):
        r.apply_epoch(batch, e)
    got = r.read()
    exp = _expected(changes).select(*got.columns)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_replay_and_resume_are_exactly_once(spark, tmp_root):
    changes = gen_source_changes(spark, n_events=3000, n_keys=300, n_repos=8)
    root = os.path.join(tmp_root, "rollup2")
    r = _mk(spark, root)
    batches = _epochs(changes, 3)
    r.apply_epoch(batches[0], 0)
    r.apply_epoch(batches[1], 1)
    # replay epoch 1 on the same instance: no-op
    rec = r.apply_epoch(batches[1], 1)
    assert rec.get("skipped_duplicate_epoch")
    # fresh instance on the same root (crash-resume): re-offer all
    # epochs — committed ones skip, the missing one applies.
    r2 = _mk(spark, root)
    recs = [r2.apply_epoch(b, e) for e, b in enumerate(batches)]
    assert recs[0].get("skipped_duplicate_epoch")
    assert recs[1].get("skipped_duplicate_epoch")
    assert not recs[2].get("skipped_duplicate_epoch")
    got = r2.read()
    exp = _expected(changes).select(*got.columns)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


# ---------------------------------------------------------------------
# StateRollup: retraction-capable aggregates over current row state
# ---------------------------------------------------------------------

from etl_cms_spark.plans.rollup import StateRollup
from etl_cms_spark.sink.lake import LakeTable


def _mk_state(spark, root):
    return StateRollup(
        spark,
        root,
        key_exprs={"lang": F.col("lang")},
        row_measures={
            "n_files": F.lit(1),
            "content_chars": F.coalesce(F.length("content"), F.lit(0)),
        },
        count_measure="n_files",
    )


def _snapshot_agg(table):
    return table.read().groupBy(F.col("lang").cast("string").alias("lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.coalesce(F.length("content"), F.lit(0))).cast("long").alias("content_chars"),
    )


def _mk_lake(spark, root):
    t = LakeTable(spark, root, n_buckets=4)
    t.create(["repo", "path"], {"repo": "string", "path": "string",
                                "commit": "string", "lang": "string",
                                "content": "string"})
    return t


def test_state_rollup_tracks_snapshot_through_updates_and_deletes(spark, tmp_root):
    """Multi-epoch fold of the CDC-out diff == one-shot GROUP BY over
    the final snapshot, with updates retracting old contributions."""
    from tests.conftest import assert_df_equal

    ch = gen_source_changes(spark, n_events=3000, n_keys=400, n_repos=10)
    t = _mk_lake(spark, os.path.join(tmp_root, "sr_files"))
    r = _mk_state(spark, os.path.join(tmp_root, "sr_roll"))
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    width = (hi - lo + 3) // 3
    for e in range(3):
        v0 = t._current_version()
        t.merge_epoch(
            ch.where((F.col("lsn") >= lo + e * width) & (F.col("lsn") < lo + (e + 1) * width)), e
        )
        r.apply_diff(t.changes_between(v0), epoch=e)
    assert_df_equal(r.read(), _snapshot_agg(t), "state rollup == snapshot agg")


def test_state_rollup_key_move_and_zero_count_tombstone(spark, tmp_root):
    """An update moving a row between rollup keys retracts from the
    old key; a key whose last row is deleted disappears (count-zero
    tombstone)."""
    rows1 = [
        (1, "U", "r", "a", "c1", "sql", "select 1"),
        (2, "U", "r", "b", "c2", "py", "print(1)"),
    ]
    rows2 = [
        (11, "U", "r", "a", "c3", "py", "print(22)"),  # sql -> py move
        (12, "D", "r", "b", None, None, None),          # delete a py row
    ]
    schema = ("lsn long, op string, repo string, path string, "
              "commit string, lang string, content string")
    t = _mk_lake(spark, os.path.join(tmp_root, "sr2_files"))
    r = _mk_state(spark, os.path.join(tmp_root, "sr2_roll"))
    for e, rows in enumerate([rows1, rows2]):
        v0 = t._current_version()
        t.merge_epoch(spark.createDataFrame(rows, schema), e)
        r.apply_diff(t.changes_between(v0), epoch=e)
    got = {row["lang"]: (row["n_files"], row["content_chars"]) for row in r.read().collect()}
    # 'sql' had its only row move to py -> tombstoned out entirely
    assert "sql" not in got
    # py: +print(1) at e0; e1 adds print(22) (9 chars) and deletes print(1)
    assert got == {"py": (1, 9)}


def test_state_rollup_replay_is_noop(spark, tmp_root):
    ch = gen_source_changes(spark, n_events=800, n_keys=100, n_repos=5)
    t = _mk_lake(spark, os.path.join(tmp_root, "sr3_files"))
    r = _mk_state(spark, os.path.join(tmp_root, "sr3_roll"))
    v0 = t._current_version()
    t.merge_epoch(ch, 0)
    diff = t.changes_between(v0)
    r.apply_diff(diff, epoch=0)
    before = sorted(map(str, r.read().collect()))
    rec = r.apply_diff(diff, epoch=0)
    assert rec.get("skipped_duplicate_epoch")
    assert sorted(map(str, r.read().collect())) == before


def test_incremental_hll_distinct_rollup(spark, tmp_root):
    """distinct= measures: per-group HLL sketches unioned per epoch.
    N epochs of unions must yield the IDENTICAL estimate to a one-shot
    sketch over all rows (union = register-wise max), the estimate
    must track exact COUNT(DISTINCT) within HLL error, and replay is
    a no-op."""
    import os

    from etl_cms_spark.fixtures.generator import gen_source_changes
    from etl_cms_spark.plans.rollup import IncrementalRollup

    changes = gen_source_changes(spark, n_events=6000, n_keys=900, n_repos=30)
    r = IncrementalRollup(
        spark,
        os.path.join(tmp_root, "hllr"),
        key_exprs={"lang": F.coalesce(F.col("lang"), F.lit("-"))},
        measures={"n_events": F.count(F.lit(1))},
        distinct={"n_repos": "repo", "n_paths": "path"},
    )
    lo, hi = changes.agg(F.min("lsn"), F.max("lsn")).first()
    width = (hi - lo + 3) // 3
    for e in range(3):
        r.apply_epoch(
            changes.where(
                (F.col("lsn") >= lo + e * width)
                & (F.col("lsn") < lo + (e + 1) * width)
            ),
            e,
        )
    got = {x["lang"]: x for x in r.read().collect()}

    oneshot = {
        x["lang"]: x
        for x in changes.groupBy(
            F.coalesce(F.col("lang"), F.lit("-")).alias("lang")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("repo")).alias("n_repos"),
            F.hll_sketch_estimate(F.hll_sketch_agg("path")).alias("n_paths"),
        )
        .collect()
    }
    exact = {
        x["lang"]: x
        for x in changes.groupBy(
            F.coalesce(F.col("lang"), F.lit("-")).alias("lang")
        )
        .agg(
            F.count_distinct("repo").alias("n_repos"),
            F.count_distinct("path").alias("n_paths"),
        )
        .collect()
    }
    assert set(got) == set(oneshot) == set(exact)
    for lang in got:
        for m in ("n_repos", "n_paths"):
            # incremental unions == one-shot sketch, exactly
            assert got[lang][m] == oneshot[lang][m], (lang, m)
            # and within HLL error of the exact count (lgk=12 default:
            # ~1.6% rse; allow 5%)
            e_ = exact[lang][m]
            assert abs(got[lang][m] - e_) <= max(2, 0.05 * e_), (lang, m)

    # replay no-op: re-offering epoch 1 is skipped, estimates unchanged
    rec = r.apply_epoch(changes.where(F.col("lsn") < lo + 2 * width), 1)
    assert rec.get("skipped_duplicate_epoch")
    again = {x["lang"]: x for x in r.read().collect()}
    assert {k: (v["n_repos"], v["n_paths"]) for k, v in again.items()} == {
        k: (v["n_repos"], v["n_paths"]) for k, v in got.items()
    }


# ---------------------------------------------------------------------
# StateRollup min/max: non-additive extrema under retraction
# ---------------------------------------------------------------------

import pytest


def _mk_extrema(spark, root):
    return StateRollup(
        spark,
        root,
        key_exprs={"lang": F.col("lang")},
        row_measures={"n_files": F.lit(1)},
        count_measure="n_files",
        min_measures={"min_chars": F.length("content")},
        max_measures={"max_chars": F.length("content")},
    )


def _extrema_snapshot(table):
    return table.read().groupBy(
        F.col("lang").cast("string").alias("lang")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.min(F.length("content")).cast("long").alias("min_chars"),
        F.max(F.length("content")).cast("long").alias("max_chars"),
    )


_ROW_SCHEMA = ("lsn long, op string, repo string, path string, "
               "commit string, lang string, content string")


def test_extrema_rollup_tracks_snapshot_every_epoch(spark, tmp_root):
    """Incremental MIN/MAX (with organic extremum-killing deletes from
    the random changelog) equals the one-shot GROUP BY after EVERY
    epoch, not just the last."""
    from tests.conftest import assert_df_equal

    ch = gen_source_changes(spark, n_events=3000, n_keys=400, n_repos=10)
    t = _mk_lake(spark, os.path.join(tmp_root, "ext_files"))
    r = _mk_extrema(spark, os.path.join(tmp_root, "ext_roll"))
    lo, hi = ch.agg(F.min("lsn"), F.max("lsn")).first()
    width = (hi - lo + 3) // 3
    for e in range(3):
        t.merge_epoch(
            ch.where((F.col("lsn") >= lo + e * width)
                     & (F.col("lsn") < lo + (e + 1) * width)), e
        )
        r.update_from_lake(t, e)
        assert_df_equal(
            r.read(), _extrema_snapshot(t), f"extrema rollup epoch {e}"
        )


def test_extrema_transitions_rescan_only_when_killed(spark, tmp_root):
    """The bookkeeping cases, pinned one by one — with source=None
    proving the rescan path is never touched unless an extremum's
    multiplicity actually reaches zero."""
    t = _mk_lake(spark, os.path.join(tmp_root, "ext2_files"))
    r = _mk_extrema(spark, os.path.join(tmp_root, "ext2_roll"))

    def fold(epoch, rows, with_source=False):
        v0 = t._current_version()
        t.merge_epoch(spark.createDataFrame(rows, _ROW_SCHEMA), epoch)
        # source must reflect the POST-epoch snapshot: build it after
        # the merge (LakeTable.read pins the manifest at construction)
        return r.apply_diff(t.changes_between(v0), epoch,
                            source=t.read() if with_source else None)

    def state():
        return {x["lang"]: (x["n_files"], x["min_chars"], x["max_chars"])
                for x in r.read().collect()}

    # e0: three rows, min 5 (multiplicity 2), max 9
    rec = fold(0, [
        (1, "U", "r", "a", "c", "py", "aaaaa"),
        (2, "U", "r", "b", "c", "py", "bbbbb"),
        (3, "U", "r", "c", "c", "py", "ccccccccc"),
    ])
    assert rec["rescanned_groups"] == 0
    assert state() == {"py": (3, 5, 9)}

    # e1: delete ONE of the two min rows + insert mid-range — free
    rec = fold(1, [
        (11, "D", "r", "a", None, None, None),
        (12, "U", "r", "d", "c", "py", "ddddddd"),
    ])
    assert rec["rescanned_groups"] == 0
    assert state() == {"py": (3, 5, 9)}

    # e2: delete the LAST min row — multiplicity hits 0: without a
    # source the fold refuses loudly (and commits nothing)...
    v0 = t._current_version()
    t.merge_epoch(spark.createDataFrame(
        [(21, "D", "r", "b", None, None, None)], _ROW_SCHEMA), 2)
    diff = t.changes_between(v0)
    with pytest.raises(ValueError, match="rescan"):
        r.apply_diff(diff, 2, source=None)
    assert state() == {"py": (3, 5, 9)}  # aborted fold left no trace
    # ...and with the source, only the killed group rescans
    rec = r.apply_diff(diff, 2, source=t.read())
    assert rec["rescanned_groups"] == 1
    assert state() == {"py": (2, 7, 9)}

    # e3: insert strictly below the min — free replacement
    rec = fold(3, [(31, "U", "r", "e", "c", "py", "eee")])
    assert rec["rescanned_groups"] == 0
    assert state() == {"py": (3, 3, 9)}

    # e4: delete the unique MAX row — max-side rescan
    rec = fold(4, [(41, "D", "r", "c", None, None, None)],
               with_source=True)
    assert rec["rescanned_groups"] == 1
    assert state() == {"py": (2, 3, 7)}

    # e5: delete the whole group — death tombstones WITHOUT a rescan
    rec = fold(5, [
        (51, "D", "r", "d", None, None, None),
        (52, "D", "r", "e", None, None, None),
    ])
    assert rec["rescanned_groups"] == 0
    assert state() == {}


def test_extrema_replay_is_noop_and_guards(spark, tmp_root):
    t = _mk_lake(spark, os.path.join(tmp_root, "ext3_files"))
    r = _mk_extrema(spark, os.path.join(tmp_root, "ext3_roll"))
    v0 = t._current_version()
    t.merge_epoch(spark.createDataFrame(
        [(1, "U", "r", "a", "c", "py", "xxxx")], _ROW_SCHEMA), 0)
    diff = t.changes_between(v0)
    r.apply_diff(diff, 0)
    before = sorted(map(str, r.read().collect()))
    assert r.apply_diff(diff, 0).get("skipped_duplicate_epoch")
    assert sorted(map(str, r.read().collect())) == before

    with pytest.raises(ValueError, match="count_measure"):
        StateRollup(spark, os.path.join(tmp_root, "ext4_roll"),
                    key_exprs={"lang": F.col("lang")},
                    row_measures={"n": F.lit(1)},
                    min_measures={"m": F.length("content")})
    with pytest.raises(ValueError, match="collision"):
        StateRollup(spark, os.path.join(tmp_root, "ext5_roll"),
                    key_exprs={"lang": F.col("lang")},
                    row_measures={"m": F.lit(1)}, count_measure="m",
                    min_measures={"m": F.length("content")})


def test_incremental_monotone_minmax(spark, tmp_root):
    """min/max over an APPEND-ONLY changelog fold monotonically
    (least/greatest vs stored) — multi-epoch == one-shot, replay is a
    no-op, NULL-content deletes don't poison the extrema."""
    changes = gen_source_changes(spark, n_events=3000, n_keys=300, n_repos=8)
    r = IncrementalRollup(
        spark,
        os.path.join(tmp_root, "mono_roll"),
        key_exprs={"repo": F.col("repo")},
        measures={"n_events": F.count(F.lit(1))},
        min_measures={"min_chars": F.length("content")},
        max_measures={"max_chars": F.length("content")},
    )
    batches = _epochs(changes, 3)
    for e, b in enumerate(batches):
        r.apply_epoch(b, e)
    exp = changes.groupBy("repo").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.length("content")).cast("long").alias("min_chars"),
        F.max(F.length("content")).cast("long").alias("max_chars"),
    )
    got = r.read()
    exp = exp.select(*got.columns)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    rec = r.apply_epoch(batches[1], 1)
    assert rec.get("skipped_duplicate_epoch")

    with pytest.raises(ValueError, match="collision"):
        IncrementalRollup(
            spark, os.path.join(tmp_root, "mono_bad"),
            key_exprs={"repo": F.col("repo")},
            measures={"m": F.count(F.lit(1))},
            min_measures={"m": F.length("content")},
        )


def test_extrema_late_catchup_pins_epoch_state(spark, tmp_root):
    """A rollup attached AFTER the lake advanced catches up epoch by
    epoch; a rescan while replaying epoch e must read the lake AT e
    (read_at_epoch), not the final state — otherwise the multiplicity
    it records poisons a later fold.  Epochs engineered so mis-pinned
    rescans surface as a wrong FINAL extremum: e1 kills the min
    (rescan at the e1 state must say 9), e2 adds a smaller row, e3
    retracts it (rescan must say 9 again — a rescan that had seen the
    e2 row early would carry multiplicity 2 at 3 and skip this one)."""
    from tests.conftest import assert_df_equal

    t = _mk_lake(spark, os.path.join(tmp_root, "extl_files"))
    epochs = [
        [(1, "U", "r", "x", "c", "py", "aaaaa"),       # 5
         (2, "U", "r", "y", "c", "py", "bbbbbbbbb")],  # 9
        [(11, "D", "r", "x", None, None, None)],       # kill min -> 9
        [(21, "U", "r", "z", "c", "py", "ccc")],       # 3
        [(31, "D", "r", "z", None, None, None)],       # kill min -> 9
    ]
    for e, rows in enumerate(epochs):
        t.merge_epoch(spark.createDataFrame(rows, _ROW_SCHEMA), e)
    # late attach: fold all four epochs now
    r = _mk_extrema(spark, os.path.join(tmp_root, "extl_roll"))
    rescans = [r.update_from_lake(t, e).get("rescanned_groups", 0)
               for e in range(4)]
    assert rescans == [0, 1, 0, 1]
    got = {x["lang"]: (x["n_files"], x["min_chars"], x["max_chars"])
           for x in r.read().collect()}
    assert got == {"py": (1, 9, 9)}
    assert_df_equal(r.read(), _extrema_snapshot(t), "late catch-up")


def test_state_rollup_survives_nonmonotone_epoch_ids(spark, tmp_root):
    """DML epochs live at 10^12 and repair epochs are negative — the
    fold's merge LSN must come from the APPLICATION ordinal, not the
    raw epoch id, or every source epoch after a DML fold loses the
    rollup table's max-LSN merge and the affected groups freeze."""
    from tests.conftest import assert_df_equal

    t = _mk_lake(spark, os.path.join(tmp_root, "nm_files"))
    r = _mk_state(spark, os.path.join(tmp_root, "nm_roll"))

    def rows(*triples):
        return spark.createDataFrame(
            [(repo, p, "c", lang, content, "U", lsn)
             for repo, p, lang, content, lsn in triples],
            "repo string, path string, commit string, lang string, "
            "content string, op string, lsn long",
        )

    v0 = t._current_version()
    t.merge_epoch(rows(("r", "a", "go", "xx", 1), ("r", "b", "go", "yyy", 2)), 0)
    r.apply_diff(t.changes_between(v0), epoch=0)
    # GDPR-style DML: its epoch id lands in the 10^12 band
    v1 = t._current_version()
    dml = t.delete_where({"path": ("a", "a")})
    assert dml["epoch"] >= 10**12
    r.apply_diff(t.changes_between(v1), epoch=dml["epoch"])
    # a LATER source epoch touching the same group must still fold
    v2 = t._current_version()
    t.merge_epoch(rows(("r", "c", "go", "zzzz", 10), ("r", "b", "go", "y", 11)), 1)
    r.apply_diff(t.changes_between(v2), epoch=1)
    assert_df_equal(r.read(), _snapshot_agg(t), "rollup after DML-band epoch")
