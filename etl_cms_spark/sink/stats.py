"""Manifest-layer column statistics + planning-time file pruning.

Iceberg plans scans from per-file column min/max recorded in manifest
files, so a selective predicate skips data files WITHOUT opening their
footers.  This module re-expresses that for LakeTable: a sidecar stats
cache (``<root>/_stats.json``) holds per-file [min, max] for chosen
value columns, ``refresh_stats`` fills it with DISTRIBUTED footer reads
(mapInPandas, the files_df idiom — the driver never funnels footer
I/O), and ``read_where`` prunes the scan's file list before Spark ever
plans it.

Why this matters at 100 TB even though parquet already row-group-prunes:
the builtin pruning happens AFTER every file is opened and its footer
fetched — ~10^6 round trips on a large table.  Planning-time pruning is
driver-side dict arithmetic over the cache.  Z-order clustering
(functions/zorder.py) is the natural partner: it makes per-file stats
TIGHT on every clustered column, so the same layout that helps row
groups lets whole files drop out here.

Correctness model — pruning granularity follows resolution granularity:

* Buckets with a DELTA STACK resolve winners per key across files, so a
  file may only be skipped if its absence cannot change any winner.
  We therefore skip such buckets only WHOLE, and only when EVERY file
  in every dir excludes the predicate (then every physical row fails
  it, hence every resolved winner fails it too).
* Single-dir buckets (CoW, or MoR after compaction — the steady state
  maintenance produces) carry one physical row per key: each row is
  its own winner, so individual FILES prune safely.
* ``partial_columnar`` tables assemble one logical row from MANY
  physical rows (per-column LWW) — a pruned row could carry another
  column's winning value — so ``read_where`` refuses them.
* The cache is a pure planning CACHE: data dirs are immutable once
  written, so entries never go stale; files without an entry (new
  deltas, renamed columns, vacuumed-and-rewritten history) are ADMITTED
  conservatively.  Correctness never depends on freshness — a cold
  cache just reads everything, exactly like ``read``.
* The residual predicate is ALWAYS applied to the admitted rows; stats
  only decide what not to read.

NULL semantics: ``read_where`` predicates are closed ranges
``col BETWEEN lo AND hi`` (tuples) or value membership ``col IN
(...)`` (lists) — both null-rejecting.  A file whose footers
PROVE the column all-null (every row group's null_count == num_rows)
is excluded; a file with stats merely absent is admitted (nothing
provable).  Strings compare binary/lexicographic, matching Spark's
default collation.

Scale note: the sidecar is O(files x cols) JSON.  At 10^6+ files shard
it per write dir (the Iceberg manifest-file shape) — the read path
below only needs the union; kept single-file here for inspectability.

MEMBERSHIP SKETCHES (Bloom-style, ``refresh_member_stats``): min/max
pruning is useless for EQUALITY probes on an unclustered
high-cardinality column (random commit hashes span the full range in
every file, so every [min, max] admits every probe).  Iceberg solves
this with parquet bloom filters written at file-write time; here the
sketch is built post-hoc like the range stats — one distributed pass
reading ONLY the sketched column of uncovered files — and stored in
the same sidecar as per-file bit sets (k=2 sha1-derived positions per
distinct value, ``bits`` wide; a sparse position list while cheap, a
packed base64 bitmap past ``bits/32`` set positions — the bitmap is a
fixed ``bits/8`` bytes where sparse costs ~8 B/position, so sidecar
size stays bounded at any cardinality).  ``read_where`` then
drops files whose sketch PROVES the probed value absent; a sketch can
only prove absence, so false positives cost a read, never a row.
Sketches that saturate past half the bit width are stored as ``FULL``
(admit everything — no information).  Hashing is canonical-JSON +
sha1, computed in plain Python on both the build (executor) and probe
(driver) sides, so no Spark/Python hash parity is ever needed.
Restricted to string/integer columns: float equality probes are a
data-modeling smell and canonical float encoding is locale-trappy.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATS_FILE = "_stats.json"
_STATABLE = ("string", "int", "bigint", "long", "float", "double",
             "smallint", "tinyint")
# membership sketches: equality semantics must be exact under the
# canonical encoding, so floats are excluded on purpose
_MEMBERABLE = ("string", "int", "bigint", "long", "smallint", "tinyint")
_MEMBER_BITS_DEFAULT = 4096
_MEMBER_K = 2  # hash positions per value (two sha1 halves)


def _member_positions(value, bits: int) -> tuple[int, ...]:
    """The k bit positions of ``value`` in a ``bits``-wide sketch.
    Canonical encoding: json.dumps of the Python value (parquet int64
    -> int, string -> str — the same types ``read_where`` probes carry),
    hashed once with sha1; the two unsigned 64-bit halves mod ``bits``
    are the positions.  Pure Python on purpose — identical arithmetic
    executor-side (build) and driver-side (probe)."""
    import hashlib

    h = hashlib.sha1(json.dumps(value).encode("utf-8")).digest()
    return (
        int.from_bytes(h[:8], "big") % bits,
        int.from_bytes(h[8:16], "big") % bits,
    )


def _stats_path(root: str) -> str:
    return os.path.join(root, _STATS_FILE)


def load_stats(root: str) -> dict:
    p = _stats_path(root)
    if not os.path.exists(p):
        return {"dirs": {}}
    with open(p) as f:
        return json.load(f)


def _save_stats(root: str, stats: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=root, prefix="_stats_", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, _stats_path(root))


def refresh_stats(table, cols: list[str]) -> dict:
    """Record per-file [min, max] of ``cols`` for every data dir in the
    CURRENT manifest that the cache doesn't cover yet.  Footer reads
    run executor-side (mapInPandas over the file list); the driver
    collects one small row per (file, col).  Dirs are immutable, so a
    covered dir is never re-read; dirs that left the manifest (vacuum,
    rollback past them) are dropped from the cache.  Returns
    ``{"files_scanned": n, "dirs_covered": n}``."""
    m = table._load_manifest()
    schema = m["schema"]
    bad = [c for c in cols if c not in schema]
    if bad:
        raise ValueError(f"refresh_stats: no such columns {bad}")
    untyped = [
        c for c in cols
        if not any(schema[c].startswith(t) for t in _STATABLE)
    ]
    if untyped:
        raise ValueError(
            f"refresh_stats: unsupported stat types {{{', '.join(f'{c}: {schema[c]}' for c in untyped)}}}"
        )
    stats = load_stats(table.root)
    live_dirs = {
        d for b in m["buckets"] for d in table._bucket_dirs(m, b)
    }
    stats["dirs"] = {d: v for d, v in stats["dirs"].items() if d in live_dirs}
    todo = []
    for d in sorted(live_dirs):
        cached = stats["dirs"].get(d, {})
        need = [c for c in cols if c not in cached.get("cols", [])]
        absdir = os.path.join(table.root, d)
        if not os.path.isdir(absdir):
            continue
        names = [fn for fn in os.listdir(absdir) if fn.endswith(".parquet")]
        have_counts = cached.get("counts", {})
        # a dir covered for these columns by an older (pre-counts)
        # refresh still re-scans once if any file lacks its row/
        # tombstone counts; cols=[] is a counts-only refresh
        if not need and all(fn in have_counts for fn in names):
            continue
        for fn in names:
            todo.append((d, fn, os.path.join(absdir, fn)))
    if not todo:
        return {"files_scanned": 0, "dirs_covered": len(stats["dirs"])}

    paths = table.spark.createDataFrame(
        todo, "rel_dir string, file string, file_path string"
    )
    want = list(cols)

    def _footers(batches):
        import pandas as pd
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            counts = []
            for r in pdf.itertuples(index=False):
                pf = pq.ParquetFile(r.file_path)
                md = pf.metadata
                arrow = md.schema.to_arrow_schema()
                names = set(arrow.names)
                # per-file row/tombstone counts for metadata-only
                # aggregates (count_where).  Tombstones: footer-only
                # when every row group's boolean stats pin _deleted
                # to one value; otherwise ONE cheap column read
                # (RLE'd boolean) makes the count exact.
                dels = None
                if "_deleted" in names:
                    didx = arrow.get_field_index("_deleted")
                    dels, footer_ok = 0, True
                    for g in range(md.num_row_groups):
                        rg = md.row_group(g)
                        st = rg.column(didx).statistics
                        if st is not None and st.has_min_max and st.min == st.max:
                            dels += rg.num_rows if st.min else 0
                        else:
                            footer_ok = False
                            break
                    if not footer_ok:
                        col = pf.read(columns=["_deleted"]).column("_deleted")
                        dels = int(
                            pc.sum(col.cast("int8"), min_count=0).as_py() or 0
                        )
                nulls = {}
                for c in want:
                    if c not in names:
                        continue
                    cidx = arrow.get_field_index(c)
                    tot, known = 0, True
                    for g in range(md.num_row_groups):
                        st = md.row_group(g).column(cidx).statistics
                        if st is not None and st.has_null_count:
                            tot += st.null_count
                        else:
                            known = False
                            break
                    nulls[c] = tot if known else None
                counts.append(
                    (r.rel_dir, r.file, None, None, None,
                     json.dumps({"rows": md.num_rows, "dels": dels,
                                 "nulls": nulls}))
                )
                for c in want:
                    if c not in names:
                        # pre-rename / pre-add file: no stats, admit
                        continue
                    idx = arrow.get_field_index(c)
                    mins, maxs = [], []
                    proven_all_null = True
                    for g in range(md.num_row_groups):
                        rg = md.row_group(g)
                        st = rg.column(idx).statistics
                        if st is not None and st.has_min_max:
                            mins.append(st.min)
                            maxs.append(st.max)
                            proven_all_null = False
                        elif not (
                            st is not None
                            and st.has_null_count
                            and st.null_count == rg.num_rows
                        ):
                            # stats absent but rows may be non-null:
                            # nothing provable, record nothing (admit)
                            proven_all_null = False
                    if mins:
                        out.append(
                            (r.rel_dir, r.file, c,
                             json.dumps(min(mins)), json.dumps(max(maxs)),
                             None)
                        )
                    elif proven_all_null:
                        # every row group proves null-only: range
                        # predicates (null-rejecting) exclude the file
                        out.append((r.rel_dir, r.file, c, None, None, None))
            yield pd.DataFrame(
                out + counts,
                columns=["rel_dir", "file", "col", "mn", "mx", "cnt"],
            )

    rows = paths.mapInPandas(
        _footers,
        "rel_dir string, file string, col string, mn string, mx string, "
        "cnt string",
    ).collect()
    per_dir: dict[str, dict] = {}
    per_dir_counts: dict[str, dict] = {}
    for r in rows:
        if r.cnt is not None:
            per_dir_counts.setdefault(r.rel_dir, {})[r.file] = json.loads(r.cnt)
            continue
        ent = per_dir.setdefault(r.rel_dir, {})
        fent = ent.setdefault(r.file, {})
        if r.mn is not None:
            fent[r.col] = [json.loads(r.mn), json.loads(r.mx)]
        else:
            fent[r.col] = None  # all-null: matches no range predicate... admit
    # merge-on-save: RELOAD the cache and fold our results into it, so
    # a concurrent refresh (different columns, or maintenance racing a
    # manual call) isn't clobbered.  Entries are per-dir immutable
    # facts, so the merge is a plain union — any residual save race
    # loses only freshness, never correctness, and the next refresh
    # converges (it re-derives its todo from what's missing).
    final = load_stats(table.root)
    final["dirs"] = {
        d: v for d, v in final["dirs"].items() if d in live_dirs
    }
    scanned = set()
    for d, fn, _ in todo:
        scanned.add((d, fn))
        dent = final["dirs"].setdefault(d, {"cols": [], "files": {}})
        dent["files"].setdefault(fn, {}).update(per_dir.get(d, {}).get(fn, {}))
        new_cnt = per_dir_counts.get(d, {}).get(fn)
        if new_cnt is not None:
            cent = dent.setdefault("counts", {}).setdefault(fn, {})
            # rows/dels are per-file immutable facts; null counts merge
            # per column across refreshes of different column sets
            nulls = cent.setdefault("nulls", {})
            nulls.update(new_cnt.pop("nulls", {}))
            cent.update(new_cnt)
    for d in {d for d, _, _ in todo}:
        dent = final["dirs"][d]
        dent["cols"] = sorted(set(dent.get("cols", [])) | set(cols))
    _save_stats(table.root, final)
    return {"files_scanned": len(scanned), "dirs_covered": len(final["dirs"])}


def refresh_member_stats(
    table, cols: list[str], bits: int = _MEMBER_BITS_DEFAULT
) -> dict:
    """Record per-file membership sketches of ``cols`` for every data
    dir the cache doesn't cover yet (same incremental/immutable-dir
    contract as :func:`refresh_stats`).  One distributed pass reads
    ONLY the sketched columns of the uncovered files (column-pruned
    parquet reads, executor-side); the driver collects one small row
    per (file, col).  A sketch whose set-bit count exceeds half the
    width carries no information and is stored as ``FULL`` (admits
    every probe).  Returns ``{"files_scanned": n, "dirs_covered": n}``."""
    m = table._load_manifest()
    schema = m["schema"]
    bad = [c for c in cols if c not in schema]
    if bad:
        raise ValueError(f"refresh_member_stats: no such columns {bad}")
    untyped = [
        c for c in cols
        if not any(schema[c].startswith(t) for t in _MEMBERABLE)
    ]
    if untyped:
        raise ValueError(
            "refresh_member_stats: unsupported sketch types "
            f"{{{', '.join(f'{c}: {schema[c]}' for c in untyped)}}} "
            "(string/integer columns only)"
        )
    if bits < 64 or bits % 64:
        raise ValueError(
            f"refresh_member_stats: bits must be a multiple of 64 >= 64, got {bits}"
        )
    stats = load_stats(table.root)
    live_dirs = {
        d for b in m["buckets"] for d in table._bucket_dirs(m, b)
    }
    stats["dirs"] = {d: v for d, v in stats["dirs"].items() if d in live_dirs}
    todo = []
    for d in sorted(live_dirs):
        cached = stats["dirs"].get(d, {})
        need = [c for c in cols if c not in cached.get("member_cols", [])]
        if not need:
            continue
        absdir = os.path.join(table.root, d)
        if not os.path.isdir(absdir):
            continue
        for fn in os.listdir(absdir):
            if fn.endswith(".parquet"):
                todo.append((d, fn, os.path.join(absdir, fn)))
    if not todo:
        return {"files_scanned": 0, "dirs_covered": len(stats["dirs"])}

    paths = table.spark.createDataFrame(
        todo, "rel_dir string, file string, file_path string"
    )
    want, width, cap = list(cols), bits, bits // 2

    def _sketches(batches):
        import pandas as pd
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pf = pq.ParquetFile(r.file_path)
                names = set(pf.schema_arrow.names)
                present = [c for c in want if c in names]
                if not present:
                    continue  # pre-rename / pre-add file: admit
                tbl = pf.read(columns=present)
                for c in present:
                    vals = pc.unique(tbl.column(c)).to_pylist()
                    pos: set[int] = set()
                    for v in vals:
                        if v is None:
                            continue  # probes are null-rejecting
                        pos.update(_member_positions(v, width))
                        if len(pos) > cap:
                            break
                    if len(pos) > cap:
                        out.append((r.rel_dir, r.file, c, None))
                    elif len(pos) * 32 > width:
                        # dense: a packed bitmap (width/8 bytes) beats
                        # the sparse position list (~8 B/position)
                        import base64

                        buf = bytearray(width // 8)
                        for p in pos:
                            buf[p >> 3] |= 1 << (p & 7)
                        out.append((
                            r.rel_dir, r.file, c,
                            json.dumps(
                                {"b": width,
                                 "p": base64.b64encode(bytes(buf)).decode()}
                            ),
                        ))
                    else:
                        out.append((
                            r.rel_dir, r.file, c,
                            json.dumps({"b": width, "s": sorted(pos)}),
                        ))
            yield pd.DataFrame(
                out, columns=["rel_dir", "file", "col", "pos"]
            )

    rows = paths.mapInPandas(
        _sketches, "rel_dir string, file string, col string, pos string"
    ).collect()
    per_dir: dict[str, dict] = {}
    for r in rows:
        fent = per_dir.setdefault(r.rel_dir, {}).setdefault(r.file, {})
        fent[r.col] = "FULL" if r.pos is None else json.loads(r.pos)
    # merge-on-save, same contract as refresh_stats
    final = load_stats(table.root)
    final["dirs"] = {
        d: v for d, v in final["dirs"].items() if d in live_dirs
    }
    scanned = set()
    for d, fn, _ in todo:
        scanned.add((d, fn))
        dent = final["dirs"].setdefault(d, {"cols": [], "files": {}})
        ment = dent.setdefault("member", {})
        ment.setdefault(fn, {}).update(per_dir.get(d, {}).get(fn, {}))
    for d in {d for d, _, _ in todo}:
        dent = final["dirs"][d]
        dent["member_cols"] = sorted(
            set(dent.get("member_cols", [])) | set(cols)
        )
    _save_stats(table.root, final)
    return {"files_scanned": len(scanned), "dirs_covered": len(final["dirs"])}


def _norm_predicates(predicates: dict) -> dict:
    """Validate + normalize: a TUPLE ``(lo, hi)`` is a closed range, a
    LIST/SET is value membership (IN).  The distinction is by Python
    type on purpose — a 2-element list would otherwise be ambiguous."""
    out = {}
    for c, v in predicates.items():
        if isinstance(v, tuple):
            if len(v) != 2:
                raise ValueError(
                    f"predicate {c}: range tuple must be (lo, hi), got {v!r}"
                )
            out[c] = ("range", v)
        elif isinstance(v, (list, set, frozenset)):
            vals = sorted(set(v))
            if not vals:
                raise ValueError(f"predicate {c}: empty IN list")
            out[c] = ("in", vals)
        else:
            raise ValueError(
                f"predicate {c}: pass a (lo, hi) tuple or a [v, ...] list, "
                f"got {type(v).__name__}"
            )
    return out


def _file_admits(fstats: dict | None, preds: dict) -> bool:
    """True if the file may contain rows matching ALL predicates
    (normalized form).  Missing stats for a column -> conservatively
    true for that column."""
    if fstats is None:
        return True
    for c, (kind, v) in preds.items():
        rng = fstats.get(c, ...)
        if rng is ...:
            continue  # no stats recorded for this col: admit
        if rng is None:
            # proven all-null: both BETWEEN and IN are null-rejecting
            return False
        mn, mx = rng
        try:
            if kind == "range":
                lo, hi = v
                if mx < lo or mn > hi:
                    return False
            else:  # membership: admit iff ANY value falls inside [mn, mx]
                if not any(mn <= x <= mx for x in v):
                    return False
        except TypeError:
            continue  # incomparable (type-widened history): admit
    return True


def _member_probe_values(preds: dict) -> dict[str, list]:
    """Per column, the equality probe set a membership sketch can act
    on: IN lists as-is, a closed range (v, v) as the single value v.
    True ranges (lo < hi) carry no equality information — min/max
    stats handle those."""
    out = {}
    for c, (kind, v) in preds.items():
        if kind == "in":
            out[c] = list(v)
        elif kind == "range" and v[0] == v[1]:
            out[c] = [v[0]]
    return out


def _member_admits(ment: dict | None, probe_vals: dict[str, list]) -> bool:
    """True if the file's membership sketches cannot PROVE every probe
    value absent for some column.  Missing sketch / FULL sketch /
    unencodable probe value -> conservatively true for that column."""
    if ment is None or not probe_vals:
        return True
    for c, vals in probe_vals.items():
        sk = ment.get(c)
        if sk is None or sk == "FULL":
            continue
        bits = sk["b"]
        if "p" in sk:  # packed bitmap
            import base64

            buf = base64.b64decode(sk["p"])
            has = lambda p: bool(buf[p >> 3] & (1 << (p & 7)))  # noqa: E731
        else:  # sparse position list
            setpos = set(sk["s"])
            has = setpos.__contains__
        admit_col = False
        for x in vals:
            try:
                need = _member_positions(x, bits)
            except TypeError:
                admit_col = True  # unencodable probe: nothing provable
                break
            if all(has(p) for p in need):
                admit_col = True
                break
        if not admit_col:
            return False
    return True


def _undeduped_stack(table, m: dict, dirs: list[str]) -> bool:
    """True when this bucket's files must resolve winners ACROSS files
    before any per-file pruning is sound: a multi-dir delta stack, or
    any dir written by an UNDEDUPED merge (skip_batch_dedup — demux
    slices, merge-mode batches), whose single dir may legitimately
    hold several rows per key.  Without the second clause a
    tombstone-only file with all-null predicate columns is excluded by
    ``_file_admits`` while the stale upsert's file is admitted, and
    the resolved read resurrects a deleted row (r5 ADVICE)."""
    if len(dirs) > 1:
        return True
    from etl_cms_spark.sink.lake import _write_ordinal

    undeduped = {
        r["snapshot_version"]
        for r in m.get("epochs", {}).values()
        if r.get("undeduped")
    }
    return bool(undeduped) and any(
        _write_ordinal(os.path.dirname(d)) in undeduped for d in dirs
    )


def plan_where(
    table, predicates: dict[str, tuple], version: int | None = None
) -> dict:
    """Planning report + file admission for ``read_where`` — pure
    driver-side arithmetic over the manifest and the stats cache.
    ``version`` plans against an older snapshot (time travel): its
    manifest's own dir set and bucket count apply; dirs the cache
    covers prune exactly as on the current snapshot (dirs are
    immutable, so stats recorded later are still valid for them)."""
    m = table._load_manifest(version)
    if m.get("partial_columnar"):
        raise ValueError(
            "read_where: partial_columnar tables assemble rows from many "
            "physical rows (per-column LWW); file pruning is unsafe — "
            "compact + read() instead"
        )
    for c in predicates:
        if c not in m["schema"]:
            raise ValueError(f"read_where: no such column {c}")
    preds = _norm_predicates(predicates)
    probe_vals = _member_probe_values(preds)
    stats = load_stats(table.root)["dirs"]
    # key-equality fast path: when the predicates pin EVERY key column
    # to a single value, the row can only live in one hash bucket —
    # the same driver-side prune as LakeTable.lookup, compounding with
    # the per-file stats below (read_where subsumes lookup + value
    # predicates in one plan).
    def _single(p):
        kind, v = p
        if kind == "range" and v[0] == v[1]:
            return v[0]
        if kind == "in" and len(v) == 1:
            return v[0]
        return None

    key_cols = m["key_cols"]
    key_bucket: int | None = None
    if all(
        c in preds and _single(preds[c]) is not None for c in key_cols
    ):
        one = table.spark.createDataFrame(
            [tuple(_single(preds[c]) for c in key_cols)],
            ", ".join(f"`{c}` {m['schema'][c]}" for c in key_cols),
        )
        key_bucket = int(
            one.select(
                table.bucket_expr(
                    key_cols, m.get("n_buckets", table.n_buckets)
                ).alias("b")
            ).first()["b"]
        )
    admit: dict[str, list[str]] = {}
    bucket_ids: list[int] = []
    files_total = files_read = 0
    for b in m["buckets"]:
        if key_bucket is not None and int(b) != key_bucket:
            continue
        dirs = table._bucket_dirs(m, b)
        per_dir: dict[str, list[str]] = {}
        any_admitted = False
        all_covered = True
        for d in dirs:
            dent = stats.get(d)
            fentries = (dent or {}).get("files", {})
            mentries = (dent or {}).get("member", {})
            absdir = os.path.join(table.root, d)
            names = (
                [fn for fn in os.listdir(absdir) if fn.endswith(".parquet")]
                if os.path.isdir(absdir)
                else []
            )
            files_total += len(names)
            kept = []
            for fn in names:
                fstats = fentries.get(fn)
                ment = mentries.get(fn)
                if fstats is None and ment is None:
                    # no proof structure at all: the whole-bucket skip
                    # (delta stacks) needs every file provably excluded
                    all_covered = False
                if _file_admits(fstats, preds) and _member_admits(
                    ment, probe_vals
                ):
                    kept.append(os.path.join(absdir, fn))
            per_dir[d] = kept
            if kept:
                any_admitted = True
        if _undeduped_stack(table, m, dirs):
            # delta stack (or undeduped single dir): winners resolve
            # across files — skip only the WHOLE bucket, and only on
            # full stats coverage proving no physical row matches.
            if any_admitted or not all_covered:
                bucket_ids.append(int(b))
                files_read += sum(
                    len([f for f in os.listdir(os.path.join(table.root, d))
                         if f.endswith(".parquet")])
                    if os.path.isdir(os.path.join(table.root, d)) else 0
                    for d in dirs
                )
        else:
            # single dir: every row is its own winner — prune per FILE.
            if any_admitted:
                bucket_ids.append(int(b))
                admit.update(per_dir)
                files_read += sum(len(v) for v in per_dir.values())
    return {
        "bucket_ids": bucket_ids,
        "admit_files": admit,
        "buckets_total": len(m["buckets"]),
        "buckets_read": len(bucket_ids),
        "files_total": files_total,  # files in buckets considered
        "files_read": files_read,
        "key_bucket": key_bucket,
    }


def read_where(
    table, predicates: dict[str, tuple], version: int | None = None
) -> DataFrame:
    """Current snapshot filtered by predicates — ``{col: (lo, hi)}``
    closed range (equality = ``(v, v)``) or ``{col: [v1, v2, ...]}``
    membership — with the scan's file
    list pruned at PLANNING time from the stats cache — identical
    results to ``read().where(...)`` by construction (the residual
    filter always applies; stats only remove files that provably
    contain no matching row)."""
    plan = plan_where(table, predicates, version)
    m = table._load_manifest(version)
    df = table._read_buckets(
        m, plan["bucket_ids"], admit_files=plan["admit_files"]
    )
    from etl_cms_spark.sink.lake import _BUCKET_COL, _DELETED_COL, _LSN_COL

    df = df.where(~F.col(_DELETED_COL)).drop(_LSN_COL, _BUCKET_COL, _DELETED_COL)
    for c, (kind, v) in _norm_predicates(predicates).items():
        if kind == "range":
            df = df.where(F.col(c).between(F.lit(v[0]), F.lit(v[1])))
        else:
            df = df.where(F.col(c).isin(*v))
    return df


def _file_all_match(fstats: dict | None, cnt: dict | None, preds: dict) -> bool:
    """True only if the sidecar PROVES every physical row in the file
    satisfies ALL predicates: for each predicate column the file must
    carry [min, max] fully inside the predicate and a recorded null
    count of zero (range/IN predicates are null-rejecting, so one
    unprovable null forces a scan).  No predicates -> trivially true.
    IN lists prove containment only via min == max ∈ list (constant
    column)."""
    if not preds:
        return True
    if fstats is None or cnt is None:
        return False
    nulls = cnt.get("nulls", {})
    for c, (kind, v) in preds.items():
        rng = fstats.get(c)
        if rng is None:  # absent or proven-all-null: nothing provable
            return False
        if nulls.get(c) != 0:
            return False
        mn, mx = rng
        try:
            if kind == "range":
                lo, hi = v
                if not (lo <= mn and mx <= hi):
                    return False
            else:
                if not (mn == mx and mn in v):
                    return False
        except TypeError:
            return False  # incomparable (type-widened history)
    return True


def count_where(
    table, predicates: dict | None = None, version: int | None = None
) -> dict:
    """``SELECT count(*)`` (optionally under ``read_where``-style
    predicates) answered from the stats sidecar wherever it can be
    PROVEN, scanning only the residue — the Iceberg metadata-only-scan
    shape.  At 100 TB a bare count over a compacted table is pure
    driver-side arithmetic: per-file row/tombstone counts were recorded
    once by ``refresh_stats`` (any column list, including ``[]``).

    Proof ladder, per file of a SINGLE-DIR bucket (one physical row
    per key — the resolution-granularity rule of this module):

    * stats exclude the file (``_file_admits`` false / sketch-absent)
      -> contributes 0, never read;
    * stats prove EVERY row matches (full range containment + zero
      recorded nulls) and its tombstone count is recorded
      -> contributes ``rows - dels`` from metadata, never read;
    * otherwise -> the file joins ONE residual scan job with the
      predicate applied.

    Buckets with a delta stack resolve winners across files, so they
    are counted by scan unless the stats prove the WHOLE bucket empty
    of matches (same rule as ``plan_where``).  Tombstone rows may
    carry null payloads, so files containing deletes typically fail
    the all-match proof on payload predicates and fall back to the
    scan — conservative, never wrong; key-column predicates and the
    bare count are unaffected (keys are never null).

    Returns ``{"count", "files_meta", "files_scanned", "files_pruned",
    "buckets_scanned"}``; ``count`` equals
    ``read_where(predicates).count()`` by construction."""
    m = table._load_manifest(version)
    if m.get("partial_columnar"):
        raise ValueError(
            "count_where: partial_columnar tables assemble rows from many "
            "physical rows (per-column LWW); per-file counting is unsafe — "
            "compact + read().count() instead"
        )
    for c in predicates or {}:
        if c not in m["schema"]:
            raise ValueError(f"count_where: no such column {c}")
    preds = _norm_predicates(predicates or {})
    probe_vals = _member_probe_values(preds)
    stats = load_stats(table.root)["dirs"]
    meta_count = files_meta = files_scanned = files_pruned = 0
    scan_buckets: list[int] = []
    scan_admit: dict[str, list[str]] = {}
    for b in m["buckets"]:
        dirs = table._bucket_dirs(m, b)
        names_by_dir = {}
        for d in dirs:
            absdir = os.path.join(table.root, d)
            names_by_dir[d] = (
                [fn for fn in os.listdir(absdir) if fn.endswith(".parquet")]
                if os.path.isdir(absdir)
                else []
            )
        if _undeduped_stack(table, m, dirs):
            # delta stack (or undeduped single dir): per-file counts
            # can't see cross-file winner resolution — scan the bucket
            # unless every file is provably match-free (then every
            # resolved winner is too)
            any_admitted = False
            all_covered = True
            n_files = 0
            for d in dirs:
                dent = stats.get(d) or {}
                for fn in names_by_dir[d]:
                    n_files += 1
                    fstats = dent.get("files", {}).get(fn)
                    ment = dent.get("member", {}).get(fn)
                    if fstats is None and ment is None:
                        all_covered = False
                    if _file_admits(fstats, preds) and _member_admits(
                        ment, probe_vals
                    ):
                        any_admitted = True
            if any_admitted or not all_covered:
                scan_buckets.append(int(b))
                files_scanned += n_files
            else:
                files_pruned += n_files
            continue
        d = dirs[0]
        dent = stats.get(d) or {}
        fentries = dent.get("files", {})
        mentries = dent.get("member", {})
        centries = dent.get("counts", {})
        kept: list[str] = []
        for fn in names_by_dir[d]:
            fstats = fentries.get(fn)
            ment = mentries.get(fn)
            if not (
                _file_admits(fstats, preds)
                and _member_admits(ment, probe_vals)
            ):
                files_pruned += 1
                continue
            cnt = centries.get(fn)
            if (
                cnt is not None
                and cnt.get("dels") is not None
                and _file_all_match(fstats, cnt, preds)
            ):
                meta_count += cnt["rows"] - cnt["dels"]
                files_meta += 1
            else:
                kept.append(os.path.join(table.root, d, fn))
                files_scanned += 1
        if kept:
            scan_buckets.append(int(b))
            scan_admit[d] = kept
    scanned_count = 0
    if scan_buckets:
        df = table._read_buckets(m, scan_buckets, admit_files=scan_admit)
        from etl_cms_spark.sink.lake import _DELETED_COL

        df = df.where(~F.col(_DELETED_COL))
        for c, (kind, v) in preds.items():
            if kind == "range":
                df = df.where(F.col(c).between(F.lit(v[0]), F.lit(v[1])))
            else:
                df = df.where(F.col(c).isin(*v))
        scanned_count = df.count()
    return {
        "count": meta_count + scanned_count,
        "files_meta": files_meta,
        "files_scanned": files_scanned,
        "files_pruned": files_pruned,
        "buckets_scanned": len(scan_buckets),
    }


def stats_coverage(table) -> dict:
    """Operability report: how much of the CURRENT snapshot the
    planning cache covers — drive alerting/scheduling from this (the
    maintenance planner's stats policy consumes the same inputs)."""
    m = table._load_manifest()
    cache = load_stats(table.root)["dirs"]
    live = sorted({d for b in m["buckets"] for d in table._bucket_dirs(m, b)})
    covered = [d for d in live if d in cache]
    cols = sorted({c for d in covered for c in cache[d].get("cols", [])})
    member_cols = sorted(
        {c for d in covered for c in cache[d].get("member_cols", [])}
    )
    files_covered = sum(len(cache[d].get("files", {})) for d in covered)
    return {
        "dirs_total": len(live),
        "dirs_covered": len(covered),
        "files_covered": files_covered,
        "cols": cols,
        "member_cols": member_cols,
    }
