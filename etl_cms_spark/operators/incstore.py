"""Shared machinery for epoch-incremental index sidecars.

Both :class:`~etl_cms_spark.operators.vecindex.IncrementalVectorIndex`
(ANN cells) and
:class:`~etl_cms_spark.operators.textindex.IncrementalTextDedupIndex`
(MinHash-LSH bands) keep their state as the same merge-on-read shape
the lake uses for MoR deltas (sink/lake.py): append-only write groups
``w{k}`` plus a narrow mask ``(id, _v)`` whose max ``(_v, _write)``
per id retires every older row for that id at read time.  This module
is that shared shape — atomic meta JSON, write-group stamping, and the
latest-wins mask resolution — so the two indexes (and any future
sidecar) share one implementation of the replay/tie-break rules.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

V_COL = "_v"          # change version (source LSN / lake snapshot version)
WV_COL = "_write"     # write-group ordinal (commit recency tie-break)


def atomic_json(path: str, obj) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def run_steps(root: str, steps: list[dict]) -> None:
    """Idempotently execute (or resume) a persisted destructive-step
    list.  Each step infers its own completion from the filesystem, so
    replaying the whole list after a crash at ANY point converges:

    * ``swap``   — replace directory ``dir`` wholesale with write
      group ``final`` renamed from ``tmp`` (compaction).  If ``tmp``
      is gone the swap already happened.
    * ``rename`` — move ``tmp`` to ``final`` (non-destructive publish,
      e.g. recluster's moved-rows group).  ``os.rename`` is atomic, so
      exactly one of tmp/final exists.
    * ``rmtree`` — delete a directory if present (mask retirement).

    All paths are stored relative to ``root`` so the step list stays
    valid if the index directory is relocated between crash and
    recovery.
    """
    for s in steps:
        kind = s["kind"]
        if kind == "swap":
            tmp = os.path.join(root, s["tmp"])
            if os.path.isdir(tmp):
                d = os.path.join(root, s["dir"])
                if os.path.isdir(d):
                    shutil.rmtree(d)
                os.makedirs(d, exist_ok=True)
                os.rename(tmp, os.path.join(root, s["final"]))
        elif kind == "rename":
            tmp = os.path.join(root, s["tmp"])
            if os.path.isdir(tmp):
                final = os.path.join(root, s["final"])
                os.makedirs(os.path.dirname(final), exist_ok=True)
                os.rename(tmp, final)
        elif kind == "rmtree":
            p = os.path.join(root, s["path"])
            if os.path.isdir(p):
                shutil.rmtree(p)
        else:  # pragma: no cover - future-proofing
            raise ValueError(f"unknown pending step kind {kind!r}")


def commit_steps(root: str, meta: dict, steps: list[dict]) -> None:
    """Two-phase destructive commit for an index maintenance op.

    The caller has already (a) fully materialized every ``tmp``
    directory the steps reference and (b) applied the op's meta
    updates to ``meta`` IN MEMORY (``next_write`` bump, centroid
    moves, ...).  This persists meta WITH the step list attached
    (the atomic commit point — from here the op is guaranteed to
    complete, and the bumped ``next_write`` means no later epoch can
    clobber the published write group), runs the destructive steps,
    then clears the list.  A crash before the first save leaves the
    old state fully intact (orphan tmps are overwritten by the next
    attempt); a crash after it is finished by ``recover_pending`` at
    the next open.
    """
    meta_path = os.path.join(root, "_meta.json")
    meta["pending_steps"] = steps
    atomic_json(meta_path, meta)
    run_steps(root, steps)
    del meta["pending_steps"]
    atomic_json(meta_path, meta)


def recover_pending(root: str, meta: dict) -> bool:
    """Finish a maintenance op that crashed mid-``commit_steps``.
    Call at index open, before any read.  Returns True if recovery
    ran."""
    steps = meta.get("pending_steps")
    if not steps:
        return False
    run_steps(root, steps)
    del meta["pending_steps"]
    atomic_json(os.path.join(root, "_meta.json"), meta)
    return True


def has_parquet(d: str) -> bool:
    for _, _, files in os.walk(d):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def stamped_union(
    spark: SparkSession,
    root: str,
    prune=None,
) -> DataFrame | None:
    """Union all ``w{k}`` write groups under ``root``, each stamped
    with its ordinal as ``_write``.  ``prune(df)`` (optional) filters
    each group BEFORE the union so parquet partition pruning applies
    per write group.  Rowless groups (a delete-only epoch leaves only
    _SUCCESS) are skipped — reading them would fail schema inference
    and they contribute nothing."""
    if not os.path.isdir(root):
        return None
    parts = []
    for w in sorted(os.listdir(root)):
        if not w.startswith("w") or not has_parquet(os.path.join(root, w)):
            continue
        p = spark.read.parquet(os.path.join(root, w))
        p = p.withColumn(WV_COL, F.lit(int(w[1:].split("-")[0])))
        if prune is not None:
            p = prune(p)
        parts.append(p)
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def mask_resolve(rows: DataFrame, mask: DataFrame | None, id_col: str) -> DataFrame:
    """Latest-wins read resolution: a row survives iff no mask entry
    for its id carries a strictly greater ``(_v, _write)``.  The mask
    is narrow (id + version) and bounded by changes since the last
    compaction, so it joins as the hash-build side."""
    if mask is None:
        return rows.drop(WV_COL)
    top = mask.groupBy(id_col).agg(
        F.max(F.struct(F.col(V_COL), F.col(WV_COL))).alias("_m")
    )
    j = rows.join(top.hint("SHUFFLE_HASH"), id_col, "left")
    keep = F.col("_m").isNull() | (
        F.struct(F.col(V_COL), F.col(WV_COL)) >= F.col("_m")
    )
    return j.where(keep).drop("_m", WV_COL)
