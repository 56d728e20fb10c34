"""Table-maintenance planner: turn the lake's metadata tables into a
declarative action plan, then execute it.

At 100 TB maintenance is a scheduling problem, not a button: a
maintenance job wakes up, reads the table's OWN metadata (footer
stats via ``partitions_df`` — one distributed job over manifests and
parquet footers, never the data), decides which buckets actually need
work, and does only that work.  This module is that loop's brain:

    plan = plan_maintenance(table, max_depth=4)
    results = run_maintenance(table, plan)

The plan is plain data (JSON-safe dicts) so a scheduler can log it,
budget it, defer it, or split it across windows; ``run_maintenance``
is a thin executor over ``LakeTable.compact(buckets=...)`` /
``vacuum``.

Policies (each independently optional):

* **depth**: fold buckets whose base+delta stack exceeds
  ``max_depth`` file sets — MoR read amplification is per-bucket, so
  only the offending buckets are rewritten (O(hot data), not
  O(table)).
* **small files**: fold buckets whose mean file size is under
  ``small_file_bytes`` once they hold at least ``min_small_files``
  files — compaction rewrites the bucket as one key-sorted file set,
  which IS the bin-pack.
* **retention**: ``vacuum(keep_last=...)`` once the snapshot history
  exceeds the window (respects tags/reservations — vacuum's own
  rules apply; the planner only decides WHEN to call it).
* **stats**: keep the planning-time pruning cache (sink/stats.py)
  covering every live dir.  Columns come from ``stats_cols`` or, by
  default, from whatever the cache already tracks — one manual
  ``refresh_stats`` call opts a table in, and maintenance keeps it
  current as epochs add dirs.  Runs LAST so a compaction in the same
  plan gets its new dirs covered immediately.

Reference analogue: the reference's ETL reloads tables wholesale each
run (python_etl re-extracts per-state dumps); an incremental lake has
to do its upkeep incrementally too, or compaction becomes the new
full reload.
"""

from __future__ import annotations

from typing import Any

from etl_cms_spark.sink.lake import LakeTable

_DEFAULT_SMALL_FILE_BYTES = 32 << 20  # files under 32 MiB count as small


def plan_maintenance(
    table: LakeTable,
    *,
    max_depth: int | None = 4,
    small_file_bytes: int = _DEFAULT_SMALL_FILE_BYTES,
    min_small_files: int | None = 8,
    keep_last_snapshots: int | None = None,
    stats_cols: list[str] | None = None,
    member_cols: list[str] | None = None,
    expire_tombstones_below: int | None = None,
) -> dict:
    """Build a maintenance plan from the table's metadata layer.

    Pass ``max_depth=None`` / ``min_small_files=None`` /
    ``keep_last_snapshots=None`` to disable a policy.  Compaction
    policies apply to merge-on-read tables only (a CoW bucket is
    rewritten whole at every merge — there is never a delta stack to
    fold); retention applies to both modes.

    ``expire_tombstones_below=L`` adds a TOMBSTONE-RETENTION policy
    (both modes): buckets holding tombstones with ``_lsn < L`` get an
    ``expire_tombstones`` action — a compaction that also drops those
    markers (``LakeTable.compact(expire_tombstones_below=L)``).  The
    caller owns choosing a safe L (the oldest LSN any out-of-order
    source — chained consumer, quarantine repair, columnar window —
    can still deliver); the planner only finds where retention is
    being paid.  Buckets already chosen for expiry are excluded from
    the plain compact action (the expiry rewrite folds their deltas
    too — one rewrite, not two).

    Returns ``{"actions": [...], "stats": {...}}`` where each action
    is ``{"action": "compact", "buckets": [...], "reasons": {bucket:
    [reason...]}}``, ``{"action": "expire_tombstones", "below": L,
    "buckets": [...]}``, or ``{"action": "vacuum", "keep_last": N}``.
    """
    actions: list[dict[str, Any]] = []
    reasons: dict[int, list[str]] = {}
    stats: dict[str, Any] = {"merge_mode": table.merge_mode}

    expiry_buckets: list[int] = []
    if expire_tombstones_below is not None:
        expiry_buckets = sorted(
            int(r["_bucket"])
            for r in table.tombstone_stats().collect()
            if r["min_lsn"] < expire_tombstones_below
        )
        stats["tombstone_expiry_buckets"] = len(expiry_buckets)
        if expiry_buckets:
            actions.append(
                {
                    "action": "expire_tombstones",
                    "below": int(expire_tombstones_below),
                    "buckets": expiry_buckets,
                }
            )

    wants_compact = table.merge_mode == "mor" and (
        max_depth is not None or min_small_files is not None
    )
    if wants_compact:
        parts = table.partitions_df().collect()
        stats["buckets"] = len(parts)
        stats["max_depth_seen"] = max((r["depth"] for r in parts), default=1)
        for r in parts:
            b = int(r["bucket"])
            why = []
            if max_depth is not None and r["depth"] > max_depth:
                why.append("depth")
            if (
                min_small_files is not None
                and r["n_files"] >= min_small_files
                and r["size_bytes"] / r["n_files"] < small_file_bytes
                # a single-dir bucket has nothing to fold: compaction
                # targets delta stacks, depth-1 buckets are skipped
                and r["depth"] > 1
            ):
                why.append("small_files")
            if why and b not in expiry_buckets:
                reasons[b] = why
        if reasons:
            actions.append(
                {
                    "action": "compact",
                    "buckets": sorted(reasons),
                    "reasons": {str(b): reasons[b] for b in sorted(reasons)},
                }
            )

    if keep_last_snapshots is not None:
        n_snapshots = table.snapshots_df().count()
        stats["snapshots"] = n_snapshots
        if n_snapshots > keep_last_snapshots:
            actions.append({"action": "vacuum", "keep_last": keep_last_snapshots})

    from etl_cms_spark.sink import stats as stats_mod

    cache = stats_mod.load_stats(table.root)
    cols = stats_cols or sorted(
        {c for d in cache["dirs"].values() for c in d.get("cols", [])}
    )
    if cols:
        m = table._load_manifest()
        live = {d for b in m["buckets"] for d in table._bucket_dirs(m, b)}
        missing = [
            d
            for d in live
            if not set(cols) <= set(cache["dirs"].get(d, {}).get("cols", []))
        ]
        stats["stats_dirs_missing"] = len(missing)
        if missing:
            # last on purpose: a compact/vacuum earlier in this plan
            # changes the dir set, and refresh_stats re-derives its
            # todo list from the manifest at EXECUTION time — so the
            # new dirs get covered in the same maintenance window.
            actions.append({"action": "refresh_stats", "cols": cols})

    # membership sketches keep current the same way: opt-in explicitly
    # via ``member_cols`` or implicitly via any prior
    # refresh_member_stats call; new dirs covered at plan execution
    mcols = member_cols or sorted(
        {c for d in cache["dirs"].values() for c in d.get("member_cols", [])}
    )
    if mcols:
        m = table._load_manifest()
        live = {d for b in m["buckets"] for d in table._bucket_dirs(m, b)}
        mmissing = [
            d
            for d in live
            if not set(mcols)
            <= set(cache["dirs"].get(d, {}).get("member_cols", []))
        ]
        stats["member_dirs_missing"] = len(mmissing)
        if mmissing:
            actions.append({"action": "refresh_member_stats", "cols": mcols})

    return {"actions": actions, "stats": stats}


def run_maintenance(table: LakeTable, plan: dict, retries: int = 1) -> list[dict]:
    """Execute a plan from :func:`plan_maintenance` in order (compact
    before vacuum, as planned: vacuum can then drop the dirs the
    compaction just superseded).  Returns one result record per
    action, each echoing the action it ran.

    Maintenance runs BESIDE live writers by design, so a compaction
    losing the commit CAS to a concurrent merge is expected, not
    exceptional: the action is retried against a FRESH plan for the
    same policy inputs (up to ``retries`` times — the stale plan's
    bucket list may be wrong for the new snapshot), then recorded as
    ``{"skipped_concurrent": ...}`` so the scheduler's next wake-up
    picks it up rather than the job dying mid-plan."""
    from etl_cms_spark.sink.lake import ConcurrentCommitError

    results = []
    for action in plan["actions"]:
        kind = action["action"]
        attempt, spec = 0, action
        while True:
            try:
                if kind == "compact":
                    rec = table.compact(buckets=[int(b) for b in spec["buckets"]])
                elif kind == "expire_tombstones":
                    rec = table.compact(
                        buckets=[int(b) for b in spec["buckets"]],
                        expire_tombstones_below=int(spec["below"]),
                    )
                elif kind == "vacuum":
                    rec = table.vacuum(keep_last=spec["keep_last"])
                elif kind == "refresh_stats":
                    rec = table.refresh_stats(spec["cols"])
                elif kind == "refresh_member_stats":
                    rec = table.refresh_member_stats(spec["cols"])
                else:
                    raise ValueError(f"unknown maintenance action {kind!r}")
                break
            except ConcurrentCommitError as e:
                if attempt >= retries:
                    rec = {"skipped_concurrent": str(e)}
                    break
                attempt += 1
                if kind == "compact":
                    # re-derive: of the buckets this plan chose, which
                    # still carry a delta stack in the NEW snapshot
                    depths = table.delta_depths()
                    still = [
                        b
                        for b in (int(x) for x in spec["buckets"])
                        if depths.get(b, 1) > 1
                    ]
                    if not still:
                        rec = {"compacted_buckets": 0, "seconds": 0.0}
                        break
                    spec = {"action": "compact", "buckets": still}
                elif kind == "expire_tombstones":
                    # re-derive against the new snapshot: which buckets
                    # still hold tombstones below the horizon
                    below = int(spec["below"])
                    still = sorted(
                        int(r["_bucket"])
                        for r in table.tombstone_stats().collect()
                        if r["min_lsn"] < below
                    )
                    if not still:
                        rec = {"compacted_buckets": 0, "seconds": 0.0}
                        break
                    spec = {
                        "action": "expire_tombstones",
                        "below": below,
                        "buckets": still,
                    }
        results.append({"action": kind, **rec})
    return results
