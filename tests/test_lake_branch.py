"""Writable branch refs: fork, commit epochs in isolation, publish
atomically via fast-forward (or discard), with vacuum pinning and
version-number safety.  The mutable sibling of tags — the
Iceberg/Nessie branch model over the same manifest CAS."""

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_cms_spark.sink.lake import ConcurrentCommitError, LakeTable

_SCHEMA = ("lsn long, op string, repo string, path string, "
           "commit string, lang string, content string")


def _mk(spark, root, mode="mor"):
    t = LakeTable(spark, root, n_buckets=4, merge_mode=mode)
    t.create(["repo", "path"], {"repo": "string", "path": "string",
                                "commit": "string", "lang": "string",
                                "content": "string"})
    return t


def _rows(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _state(t):
    return {
        (x["repo"], x["path"]): (x["commit"], x["content"])
        for x in t.read().collect()
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_branch_isolated_commits_then_fast_forward(spark, tmp_root, mode):
    t = _mk(spark, os.path.join(tmp_root, f"br_{mode}"), mode)
    t.merge_epoch(_rows(spark, [
        (1, "U", "r", "a", "c1", "py", "one"),
        (2, "U", "r", "b", "c1", "py", "two"),
    ]), 0)
    fork_state = _state(t)
    fork_v = t._current_version()

    t.create_branch("backfill")
    b = t.branch_table("backfill")
    b.merge_epoch(_rows(spark, [
        (11, "U", "r", "a", "c2", "py", "one-v2"),
        (12, "U", "r", "c", "c2", "py", "three"),
    ]), 1)
    b.merge_epoch(_rows(spark, [
        (21, "D", "r", "b", None, None, None),
    ]), 2)

    # isolation both ways: main unmoved, branch sees its fold
    assert _state(t) == fork_state
    assert t.committed_epochs() == {0}
    assert _state(b) == {
        ("r", "a"): ("c2", "one-v2"),
        ("r", "c"): ("c2", "three"),
    }
    assert b.committed_epochs() == {0, 1, 2}

    # version-number safety: a main commit AFTER branch commits must
    # reserve past the branch's (still-reserved) numbers
    t.merge_epoch(_rows(spark, [(31, "U", "r", "d", "c3", "go", "four")]), 7)
    assert t._current_version() > b._current_version()

    # main moved past the fork -> fast-forward must refuse
    with pytest.raises(ConcurrentCommitError, match="fast-forward impossible"):
        t.fast_forward("backfill")

    # fresh fork from the NEW head publishes cleanly
    t.create_branch("bf2")
    b2 = t.branch_table("bf2")
    b2.merge_epoch(_rows(spark, [
        (41, "U", "r", "e", "c4", "py", "five"),
    ]), 8)
    pre_ff_branch = _state(b2)
    head = t.fast_forward("bf2")
    assert t._current_version() == head
    assert _state(t) == pre_ff_branch
    # branch epochs are now main epochs: replay is exactly-once
    rec = t.merge_epoch(_rows(spark, [(41, "U", "r", "e", "c4", "py", "five")]), 8)
    assert rec.get("skipped_duplicate_epoch")
    # CDC-out and time travel cover the adopted commits
    assert t.changes_for_epoch(8).count() == 1
    assert {x["path"] for x in t.read_at(fork_v).collect()} == {"a", "b"}


def test_branch_guards_and_refs(spark, tmp_root):
    t = _mk(spark, os.path.join(tmp_root, "br_guard"))
    t.merge_epoch(_rows(spark, [(1, "U", "r", "a", "c", "py", "x")]), 0)
    t.create_branch("exp")
    assert t.branches() == {"exp": {"head": t._current_version(),
                                    "fork": t._current_version()}}
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("exp")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("bad/name")
    with pytest.raises(ValueError, match="unknown or vacuumed"):
        t.create_branch("ghost", version=999)
    with pytest.raises(ValueError, match="no such branch"):
        t.branch_table("nope")

    b = t.branch_table("exp")
    for op in ["compact", "vacuum", "rebucket", "tag", "rollback",
               "create_branch", "branch_table", "fast_forward",
               "drop_branch", "delete_where", "apply_schema_change",
               "refresh_stats", "stage_epoch"]:
        with pytest.raises(ValueError, match="not supported on a branch"):
            if op == "compact":
                b.compact()
            elif op == "vacuum":
                b.vacuum()
            elif op == "rebucket":
                b.rebucket(8)
            elif op == "tag":
                b.tag("t1")
            elif op == "rollback":
                b.rollback(0)
            elif op == "create_branch":
                b.create_branch("nested")
            elif op == "branch_table":
                b.branch_table("exp")
            elif op == "fast_forward":
                b.fast_forward("exp")
            elif op == "drop_branch":
                b.drop_branch("exp")
            elif op == "delete_where":
                b.delete_where({"lang": ("py", "py")})
            elif op == "apply_schema_change":
                b.apply_schema_change({"add": "extra:string"})
            elif op == "refresh_stats":
                b.refresh_stats(["lang"])
            elif op == "stage_epoch":
                b.stage_epoch(_rows(spark, []), 5)

    b.merge_epoch(_rows(spark, [(2, "U", "r", "z", "c", "py", "y")]), 1)
    t.drop_branch("exp")
    assert t.branches() == {}
    with pytest.raises(ValueError, match="no such branch"):
        t.branch_table("exp")
    # main untouched by the whole branch lifetime
    assert _state(t) == {("r", "a"): ("c", "x")}


def test_vacuum_pins_branch_inherited_dirs(spark, tmp_root):
    """A branch forked from an old snapshot keeps reading correctly
    after main compacts + vacuums PAST the fork point: the branch's
    manifests pin the inherited data dirs (and its own numbers stay
    reserved), even when the fork manifest itself expires."""
    t = _mk(spark, os.path.join(tmp_root, "br_vac"), "mor")
    for e in range(3):
        t.merge_epoch(_rows(spark, [
            (10 * e + 1, "U", "r", f"p{e}", f"c{e}", "py", f"body-{e}"),
        ]), e)
    t.create_branch("old")
    b = t.branch_table("old")
    b.merge_epoch(_rows(spark, [(100, "U", "r", "bp", "cb", "go", "branch-row")]), 50)
    expect_branch = _state(b)

    # main advances, compacts, vacuums hard (fork falls out the window)
    for e in range(3, 8):
        t.merge_epoch(_rows(spark, [
            (10 * e + 1, "U", "r", f"p{e}", f"c{e}", "py", f"body-{e}"),
        ]), e)
    t.compact()
    rep = t.vacuum(keep_last=1, expire_reservations=True)
    assert rep["removed_manifests"]  # the window really expired things
    assert _state(b) == expect_branch  # branch intact
    # ...and its reservations survived explicit expiry (number safety)
    head = b._current_version()
    assert os.path.exists(os.path.join(t._manifest_dir, f".reserve.v{head}"))

    # drop + vacuum reclaims the branch's own dirs once current passes
    t.drop_branch("old")
    t.merge_epoch(_rows(spark, [(999, "U", "r", "zz", "cz", "py", "tail")]), 99)
    t.vacuum(keep_last=1, expire_reservations=True)
    assert not os.path.exists(os.path.join(t.root, f"data/v{head}"))


def test_fast_forward_crash_rolls_forward(spark, tmp_root):
    """A crash between adopting the branch manifests and swapping
    CURRENT leaves a valid (longer) main chain; retrying fast_forward
    resumes from the landed prefix instead of refusing."""
    t = _mk(spark, os.path.join(tmp_root, "br_crash"))
    t.merge_epoch(_rows(spark, [(1, "U", "r", "a", "c", "py", "x")]), 0)
    t.create_branch("ff")
    b = t.branch_table("ff")
    b.merge_epoch(_rows(spark, [(2, "U", "r", "b", "c", "py", "y")]), 1)
    b.merge_epoch(_rows(spark, [(3, "U", "r", "c", "c", "py", "z")]), 2)
    chain = t._branch_chain("ff")
    # simulate the crash: first branch manifest adopted, CURRENT not
    first = chain[0]
    with open(os.path.join(t._manifest_dir, f"v{first['version']}.json"), "w") as f:
        json.dump(first, f)
    head = t.fast_forward("ff")
    assert t._current_version() == head == chain[-1]["version"]
    assert _state(t) == {("r", "a"): ("c", "x"), ("r", "b"): ("c", "y"),
                         ("r", "c"): ("c", "z")}
    assert t.committed_epochs() == {0, 1, 2}


def test_fast_forward_empty_branch_is_noop(spark, tmp_root):
    t = _mk(spark, os.path.join(tmp_root, "br_noop"))
    t.merge_epoch(_rows(spark, [(1, "U", "r", "a", "c", "py", "x")]), 0)
    v = t._current_version()
    t.create_branch("idle")
    assert t.fast_forward("idle") == v
    assert t._current_version() == v


def test_fast_forward_is_metadata_only(spark, tmp_root):
    """fast_forward adopts manifests and swaps CURRENT — pure driver-
    side file ops, NO Spark jobs, no data read/rewrite.  Proven by
    removing the session from the handle for the call."""
    t = _mk(spark, os.path.join(tmp_root, "br_meta"))
    t.merge_epoch(_rows(spark, [(1, "U", "r", "a", "c", "py", "x")]), 0)
    t.create_branch("m")
    b = t.branch_table("m")
    b.merge_epoch(_rows(spark, [(2, "U", "r", "b", "c", "py", "y")]), 1)
    t.spark = None  # any Spark touch would AttributeError
    try:
        head = t.fast_forward("m")
    finally:
        t.spark = spark
    assert t._current_version() == head
    assert _state(t) == {("r", "a"): ("c", "x"), ("r", "b"): ("c", "y")}


def test_refs_df_lists_tags_and_branches(spark, tmp_root):
    """refs_df (Iceberg's `refs` metadata table): tags and branches as
    data, branches with fork point and commits-ahead count."""
    t = _mk(spark, os.path.join(tmp_root, "br_refs"))
    t.merge_epoch(_rows(spark, [(1, "U", "r", "a", "c", "py", "x")]), 0)
    v = t._current_version()
    t.tag("release-1")
    t.create_branch("wip")
    b = t.branch_table("wip")
    b.merge_epoch(_rows(spark, [(2, "U", "r", "b", "c", "py", "y")]), 1)
    got = {x["name"]: (x["type"], x["version"], x["fork_version"], x["n_commits"])
           for x in t.refs_df().collect()}
    assert got == {
        "release-1": ("tag", v, None, None),
        "wip": ("branch", b._current_version(), v, 1),
    }
