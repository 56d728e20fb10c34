"""LakeTable — a from-scratch exactly-once upsert sink.

No Iceberg runtime jar ships in this environment, so the engine
implements the subset of lake-table semantics the north rule needs
directly over Parquet + JSON manifests (the interface is the same
shape as an Iceberg ``MERGE INTO`` path, so a catalog-backed
implementation can slot in):

* **Snapshots**: every commit writes ``_manifests/v{N}.json`` and
  atomically swaps ``_manifests/CURRENT`` (os.replace) — readers see
  the old or the new snapshot, never a torn one.  A crash after data
  files are written but before CURRENT is swapped leaves orphan files
  and an intact old snapshot (Iceberg's model exactly).
* **Bucketed copy-on-write MERGE**: rows are hash-bucketed by key
  (``pmod(xxhash64(key), n_buckets)``).  An epoch's merge reads ONLY
  the buckets that received changes, merges via max-LSN, and rewrites
  just those buckets; untouched buckets are carried by reference in
  the new manifest.  Upsert cost is O(changed data), not O(table).
* **Exactly-once**: commits are keyed by epoch in the manifest
  (``epochs`` map = the commit manifest of the north rule).  Replaying
  an already-committed epoch is a no-op; replaying *uncommitted* work
  converges because identity is key-hash derived and merge is
  max-LSN idempotent.
* **Schema evolution**: add/rename column events bump the manifest
  schema without rewriting data; reads normalize old files via
  ``coalesce(new, old)`` + null-fill (Iceberg name-mapping, done with
  column names instead of field ids).

Lineage: every epoch commit records (lsn range, rows upserted/
deleted, snapshot version, wall-clock, events/s) — SURVEY.md §7 M4.

The reference analogue of all of this is the flat-file control
directory + mutable ID counters (reference
python_etl/utility_classes.py:5-100, CMS_SynPuf_ETL_CDM_v5.py:299-370)
which forced strictly sequential runs; the manifest + hash-identity
design is what makes the same semantics parallel and replayable.
"""

from __future__ import annotations

import fcntl
import json
import os
import re
import time
import uuid
from contextlib import contextmanager
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LSN_COL = "_lsn"
_BUCKET_COL = "_bucket"
# tombstone marker: deletes persist as marked rows so max-LSN merge
# converges under ANY application order (streaming micro-batches are
# not LSN-ordered across batches; a physical delete would let a
# late-arriving older update resurrect the key).  GC of tombstones
# older than a replay horizon belongs to a compaction pass.
_DELETED_COL = "_deleted"
# transient read-side column: the snapshot-version ordinal of the
# write group a row came from (parsed from its data/vN[-compact] dir).
# Never persisted — it exists only to order equal-LSN ties in MoR
# resolution by commit recency.
_WV_COL = "_write_version"


def _write_ordinal(write_dir: str) -> int:
    m = re.search(r"v(\d+)", os.path.basename(write_dir))
    return int(m.group(1)) if m else -1


def _atomic_write_json(path: str, obj: Any) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class ConcurrentCommitError(RuntimeError):
    """A concurrent commit interleaved with this one in a way that
    cannot be rebased automatically (overlapping CoW buckets, a schema
    / bucket-count / compaction-watermark change, …).  The operation
    made NO commit; re-run it against the new current snapshot."""


class _StaleParent(Exception):
    """Internal: the manifest's parent is no longer the latest
    committed version — rebase (merge_epoch) or surface as
    ConcurrentCommitError (maintenance commits)."""

    def __init__(self, latest: int):
        self.latest = latest
        super().__init__(f"latest committed version is now {latest}")


class LakeTable:
    """An upsert-able, snapshot-versioned, schema-evolving table."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 32,
        merge_mode: str = "cow",
    ):
        """merge_mode:
        * "cow" — copy-on-write: each epoch rewrites the touched
          buckets with winners resolved.  Reads are plain scans.
          Cost per epoch: O(touched table); best for low-frequency,
          large-ratio batches.
        * "mor" — merge-on-read: each epoch only appends the deduped
          batch as per-bucket DELTA files — no target read, no
          table-side shuffle; winners are resolved at read time across
          base+deltas.  Cost per epoch: O(batch).  Call ``compact()``
          periodically to fold deltas back into the base (Iceberg's
          MoR + maintenance model).
        """
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.merge_mode = merge_mode
        self._manifest_dir = os.path.join(root, "_manifests")
        # writable-branch handle marker (``branch_table``): None = the
        # main lineage.  Set AFTER construction by branch_table — the
        # constructor itself always resolves the main manifest (the
        # table layout/merge-mode contract is lineage-independent).
        self._branch: str | None = None
        # bucket count is part of the on-disk layout: reopening an
        # existing table with a different constructor value would
        # compute wrong changed_buckets and scatter keys into new
        # bucket dirs while stale rows stay in old ones.  The manifest
        # is authoritative for an existing table.
        if self.exists():
            m = self._load_manifest()
            persisted = m.get("n_buckets")
            if persisted is not None and int(persisted) != n_buckets:
                import warnings

                warnings.warn(
                    f"LakeTable {root}: constructor n_buckets={n_buckets} "
                    f"!= manifest n_buckets={persisted}; using the manifest value",
                    stacklevel=2,
                )
                self.n_buckets = int(persisted)
            # merge_mode is persisted too: a reopener that forgets (or
            # defaults) the mode must not silently flip write strategy
            # — and read-only consumers (maintenance planner, CLI)
            # need the true mode without being told.  Pre-field
            # manifests keep the constructor value.
            persisted_mode = m.get("merge_mode")
            if persisted_mode is not None and persisted_mode != merge_mode:
                self.merge_mode = persisted_mode

    # ---------------- manifest plumbing ----------------

    def exists(self) -> bool:
        if self._branch is not None:
            return os.path.exists(self._branch_ref_path(self._branch))
        return os.path.exists(os.path.join(self._manifest_dir, "CURRENT"))

    # -------- branch plumbing (writable refs; see create_branch) ----

    def _branch_ref_path(self, name: str) -> str:
        return os.path.join(self._manifest_dir, f"branch.{name}.json")

    def _branch_manifest_dir(self, name: str) -> str:
        return os.path.join(self._manifest_dir, "branches", name)

    def _load_branch_ref(self, name: str) -> dict:
        try:
            with open(self._branch_ref_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            raise ValueError(f"no such branch {name!r}") from None

    def _require_main(self, op: str) -> None:
        if self._branch is not None:
            raise ValueError(
                f"{op} is not supported on a branch handle "
                f"(branch {self._branch!r}): branches carry data epochs "
                "and reads only — run maintenance/evolution/refs on the "
                "main table, or fast_forward the branch first"
            )

    def _current_version(self) -> int:
        if self._branch is not None:
            return int(self._load_branch_ref(self._branch)["head"])
        with open(os.path.join(self._manifest_dir, "CURRENT")) as f:
            return int(f.read().strip())

    def _load_manifest(self, version: int | None = None) -> dict:
        v = self._current_version() if version is None else version
        if self._branch is not None:
            # branch commits live in the branch dir; versions at or
            # below the fork point resolve from the main lineage
            bpath = os.path.join(self._branch_manifest_dir(self._branch), f"v{v}.json")
            if os.path.exists(bpath):
                with open(bpath) as f:
                    return json.load(f)
        with open(os.path.join(self._manifest_dir, f"v{v}.json")) as f:
            return json.load(f)

    # -------- optimistic concurrency (the Iceberg-catalog CAS) -----
    #
    # Multiple writers may race one table (the repair flow against the
    # streaming loop, demux threads, a concurrent compaction).  A
    # last-writer-wins CURRENT swap would silently DROP the loser's
    # commit, so commits are serialized through a compare-and-swap on
    # the manifest lineage instead:
    #
    # * every writer RESERVES a globally unique version number before
    #   writing data (O_CREAT|O_EXCL marker), so in-flight data dirs
    #   never collide;
    # * every manifest records its ``parent_version``; the commit
    #   section (flock on _manifests/.commitlock — the local-FS stand-
    #   in for an Iceberg catalog's atomic swap) admits a manifest
    #   only while its parent is STILL the latest committed version,
    #   else raises ``_StaleParent`` for the writer to rebase or
    #   surface as ``ConcurrentCommitError``;
    # * CURRENT only ever advances (monotonic swap under the lock).
    #
    # Version numbers may therefore have GAPS (abandoned reservations)
    # and an epoch's previous snapshot is its recorded parent, not
    # version-1 — changes_for_epoch reads ``parent_version``.

    def _latest_committed_version(self) -> int:
        latest = -1
        for f in os.listdir(self._manifest_dir):
            m = re.fullmatch(r"v(\d+)\.json", f)
            if m:
                latest = max(latest, int(m.group(1)))
        return latest

    def _reserve_version(self) -> int:
        """Claim a globally unique, monotonically increasing version
        number (its data dir name) ahead of the data write."""
        n = self._latest_known_version() + 1
        while True:
            try:
                fd = os.open(
                    os.path.join(self._manifest_dir, f".reserve.v{n}"),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                os.close(fd)
                return n
            except FileExistsError:
                n += 1

    def _latest_known_version(self) -> int:
        latest = self._latest_committed_version()
        for f in os.listdir(self._manifest_dir):
            m = re.fullmatch(r"\.reserve\.v(\d+)", f)
            if m:
                latest = max(latest, int(m.group(1)))
        return latest

    def _abandon_version(self, version: int, rel_dir: str | None) -> None:
        """A conflicted commit's compute is unusable — reclaim its
        data dir and release its reservation before surfacing the
        ConcurrentCommitError."""
        import shutil

        if rel_dir is not None:
            shutil.rmtree(os.path.join(self.root, rel_dir), ignore_errors=True)
        try:
            os.remove(os.path.join(self._manifest_dir, f".reserve.v{version}"))
        except FileNotFoundError:
            pass

    @contextmanager
    def _commit_lock(self):
        fd = os.open(
            os.path.join(self._manifest_dir, ".commitlock"),
            os.O_CREAT | os.O_WRONLY,
        )
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _commit_manifest(self, manifest: dict) -> int:
        if self._branch is not None:
            return self._commit_branch_manifest(manifest)
        v = manifest["version"]
        parent = manifest.get("parent_version", v - 1)
        manifest["parent_version"] = parent
        path = os.path.join(self._manifest_dir, f"v{v}.json")
        with self._commit_lock():
            latest = self._latest_committed_version()
            if latest != parent:
                raise _StaleParent(latest)
            if os.path.exists(path):  # unreserved racer took our number
                raise _StaleParent(latest)
            _atomic_write_json(path, manifest)
            cur = os.path.join(self._manifest_dir, "CURRENT")
            tmp = f"{cur}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(str(v))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, cur)
        # the reservation is spent: the manifest file now carries the
        # number (monotonicity) and the data dir is referenced (vacuum
        # safety).  A LIVE reservation marker is what tells vacuum a
        # dir belongs to an in-flight or WAP-staged write.
        try:
            os.remove(os.path.join(self._manifest_dir, f".reserve.v{v}"))
        except FileNotFoundError:
            pass
        return v

    def _commit_branch_manifest(self, manifest: dict) -> int:
        """Branch commits CAS against the branch REF (never CURRENT):
        same lock, same _StaleParent/rebase protocol, separate
        lineage.  The version RESERVATION is deliberately KEPT after
        commit — branch manifests are invisible to the main lineage's
        version scan, so the live marker is what (a) stops the number
        from being re-issued and (b) shields the branch's data dirs
        from vacuum until fast_forward or drop_branch settles them."""
        name = self._branch
        v = manifest["version"]
        bdir = self._branch_manifest_dir(name)
        path = os.path.join(bdir, f"v{v}.json")
        with self._commit_lock():
            ref = self._load_branch_ref(name)
            head = int(ref["head"])
            parent = manifest.get("parent_version", head)
            manifest["parent_version"] = parent
            if head != parent:
                raise _StaleParent(head)
            if os.path.exists(path):
                raise _StaleParent(head)
            os.makedirs(bdir, exist_ok=True)
            _atomic_write_json(path, manifest)
            _atomic_write_json(
                self._branch_ref_path(name), {**ref, "head": v}
            )
        return v

    # ---------------- writable branch refs ----------------

    def create_branch(self, name: str, version: int | None = None) -> int:
        """Fork a WRITABLE named ref off a committed snapshot (the
        Iceberg/Nessie branch model; ``tag`` is the immutable
        sibling).  A ``branch_table(name)`` handle reads the branch
        head and commits data epochs to it through the ordinary
        idempotent ``merge_epoch`` path — isolated from the main
        lineage — then ``fast_forward(name)`` publishes the branch's
        commits onto main atomically (all epochs or none), or
        ``drop_branch`` discards them.  Staging whole multi-epoch
        backfills, trying a risky reprocess against real data, or
        dual-running a pipeline variant all ride this.

        Branches carry DATA EPOCHS ONLY: maintenance (compact/vacuum/
        rebucket), schema evolution, DML, tags and nested branching
        stay on main — a fast-forward can then never have to merge
        layout or schema drift, only append manifests.
        """
        self._require_main("create_branch")
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name or ""):
            raise ValueError(f"invalid branch name {name!r}")
        v = self._current_version() if version is None else int(version)
        if not os.path.exists(os.path.join(self._manifest_dir, f"v{v}.json")):
            raise ValueError(f"cannot branch at snapshot {v}: unknown or vacuumed")
        path = self._branch_ref_path(name)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ValueError(
                f"branch {name!r} already exists (drop_branch first)"
            ) from None
        with os.fdopen(fd, "w") as f:
            json.dump({"head": v, "fork": v}, f)
            f.flush()
            os.fsync(f.fileno())
        return v

    def branches(self) -> dict[str, dict]:
        out = {}
        for f in sorted(os.listdir(self._manifest_dir)):
            m = re.fullmatch(r"branch\.(.+)\.json", f)
            if m:
                out[m.group(1)] = self._load_branch_ref(m.group(1))
        return out

    def branch_table(self, name: str) -> "LakeTable":
        """A handle whose reads/commits resolve through the branch ref
        instead of CURRENT.  Same root, same layout, same merge mode."""
        self._require_main("branch_table")
        self._load_branch_ref(name)  # fail fast on unknown branch
        t = LakeTable(self.spark, self.root, self.n_buckets, self.merge_mode)
        t._branch = name
        return t

    def _branch_chain(self, name: str) -> list[dict]:
        """The branch's own manifests, fork-exclusive to head, in
        commit order (parents first)."""
        ref = self._load_branch_ref(name)
        fork, v = int(ref["fork"]), int(ref["head"])
        chain = []
        while v != fork:
            with open(
                os.path.join(self._branch_manifest_dir(name), f"v{v}.json")
            ) as f:
                m = json.load(f)
            chain.append(m)
            v = int(m["parent_version"])
        return list(reversed(chain))

    def fast_forward(self, name: str) -> int:
        """Publish the branch onto main: adopt its manifest chain as
        main commits and advance CURRENT to the branch head — atomic
        under the commit lock, so readers see ALL branch epochs or
        none.  Requires main still at the fork point (the fast-forward
        precondition; a diverged main raises ConcurrentCommitError —
        replay the branch's epochs onto main instead, idempotently).
        Crash mid-publish ROLLS FORWARD: adopted manifests are a valid
        main chain, so a retry resumes from whatever prefix landed.
        The branch ref stays (now at fork == ff'd head ancestry);
        drop_branch when done."""
        self._require_main("fast_forward")
        ref = self._load_branch_ref(name)
        head, fork = int(ref["head"]), int(ref["fork"])
        if head == fork:
            return self._current_version()
        chain = self._branch_chain(name)
        chain_versions = [int(m["version"]) for m in chain]
        with self._commit_lock():
            latest = self._latest_committed_version()
            if latest != fork and latest not in chain_versions:
                raise ConcurrentCommitError(
                    f"branch {name!r} forked at {fork} but main is at "
                    f"{latest}: fast-forward impossible — replay the "
                    "branch epochs through merge_epoch instead"
                )
            todo = (
                chain
                if latest == fork
                else chain[chain_versions.index(latest) + 1 :]
            )
            for m in todo:
                _atomic_write_json(
                    os.path.join(self._manifest_dir, f"v{m['version']}.json"), m
                )
            cur = os.path.join(self._manifest_dir, "CURRENT")
            tmp = f"{cur}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(str(head))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, cur)
            _atomic_write_json(self._branch_ref_path(name), {"head": head, "fork": head})
        # now main manifests carry the numbers: release the markers
        for v in chain_versions:
            try:
                os.remove(os.path.join(self._manifest_dir, f".reserve.v{v}"))
            except FileNotFoundError:
                pass
        return head

    def drop_branch(self, name: str) -> None:
        """Discard a branch: ref, its manifests, and their version
        reservations.  Its data dirs become orphans that the next
        vacuums reclaim (once CURRENT passes their numbers)."""
        self._require_main("drop_branch")
        import shutil

        ref = self._load_branch_ref(name)
        chain_versions = [int(m["version"]) for m in self._branch_chain(name)]
        os.remove(self._branch_ref_path(name))
        shutil.rmtree(self._branch_manifest_dir(name), ignore_errors=True)
        for v in chain_versions:
            try:
                os.remove(os.path.join(self._manifest_dir, f".reserve.v{v}"))
            except FileNotFoundError:
                pass
        del ref

    def create(
        self,
        key_cols: list[str],
        schema: dict[str, str],
        partial_columnar: bool = False,
    ) -> None:
        """schema: logical column name -> Spark SQL type string.
        Key columns must be part of the schema.

        ``partial_columnar=True`` declares a COLUMNAR merge-on-read
        table: deltas hold PARTIAL row images (NULL = column not set)
        and read resolution folds each column independently to its
        latest present value (tombstone-gated) instead of picking one
        whole winning row — see ``append_partial_epoch``.  The
        property this buys: partial epochs may be applied in ANY
        order and reads converge to the same state (LWW per column by
        (lsn, write-version)).  Explicit set-to-NULL is NOT
        representable in this mode (NULL means absent)."""
        self._require_main("create")
        os.makedirs(self._manifest_dir, exist_ok=True)
        if self.exists():
            raise ValueError(f"table already exists at {self.root}")
        manifest = {
            "version": 0,
            "key_cols": list(key_cols),
            "schema": dict(schema),
            "renames": {},  # physical-name -> logical-name (cumulative)
            "buckets": {},  # bucket-id(str) -> list of relative data dirs (base + deltas)
            "epochs": {},  # epoch(str) -> lineage record
            "n_buckets": self.n_buckets,
            "merge_mode": self.merge_mode,
        }
        if partial_columnar:
            manifest["partial_columnar"] = True
        try:
            self._commit_manifest(manifest)
        except _StaleParent:
            raise ValueError(f"table already exists at {self.root}") from None

    # ---------------- read path ----------------

    def schema(self) -> dict[str, str]:
        return dict(self._load_manifest()["schema"])

    def committed_epochs(self) -> set[int]:
        return {int(e) for e in self._load_manifest()["epochs"]}

    def lineage(self) -> list[dict]:
        m = self._load_manifest()
        return [m["epochs"][k] for k in sorted(m["epochs"], key=int)]

    def _normalize(self, df: DataFrame, manifest: dict) -> DataFrame:
        """Apply rename mapping + null-fill so any mix of old/new
        physical files presents the current logical schema."""
        for old, new in manifest["renames"].items():
            if old in df.columns and new in df.columns:
                df = df.withColumn(new, F.coalesce(F.col(new), F.col(old))).drop(old)
            elif old in df.columns:
                df = df.withColumnRenamed(old, new)
        for name, typ in manifest["schema"].items():
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None).cast(typ))
            else:
                df = df.withColumn(name, F.col(name).cast(typ))
        return df

    @staticmethod
    def _bucket_dirs(manifest: dict, bucket: str) -> list[str]:
        v = manifest["buckets"][bucket]
        return [v] if isinstance(v, str) else list(v)

    def _read_buckets(
        self,
        manifest: dict,
        bucket_ids: list[int] | None,
        resolve: bool = True,
        admit_files: "dict[str, list[str]] | None" = None,
    ) -> DataFrame:
        """``admit_files`` (sink/stats.py planning-time pruning): maps a
        RELATIVE leaf dir to the subset of its parquet files admitted by
        manifest-layer column stats — dirs absent from the map are read
        whole; an empty list skips the dir.  Callers guarantee the
        subset is resolution-safe (stats.py only file-prunes buckets
        with no delta stack, where every row is its own winner)."""
        sel = manifest["buckets"]
        if bucket_ids is not None:
            sel = {b: d for b, d in sel.items() if int(b) in set(bucket_ids)}
        rel_dirs = sorted(
            {d for b in sel for d in self._bucket_dirs(manifest, b)}
        )
        if admit_files is not None:
            rel_dirs = [
                d
                for d in rel_dirs
                if d not in admit_files or admit_files[d]
            ]
        dirs = [os.path.join(self.root, d) for d in rel_dirs]
        # Resolution is needed when any bucket has a delta STACK — or
        # when any selected single dir came from an UN-DEDUPED write
        # (merge_epoch skip_batch_dedup: demux slices, merge-mode
        # batches), whose one dir may legitimately hold several rows
        # per key.  Without this, a fresh domain bucket's first delta
        # would surface a stale upsert past its own routing tombstone.
        undeduped_versions = {
            r["snapshot_version"]
            for r in manifest.get("epochs", {}).values()
            if r.get("undeduped")
        }
        has_deltas = any(
            len(self._bucket_dirs(manifest, b)) > 1 for b in sel
        ) or any(
            _write_ordinal(os.path.dirname(d)) in undeduped_versions
            for d in rel_dirs
        )
        cols = [*manifest["schema"].keys(), _LSN_COL, _BUCKET_COL, _DELETED_COL]
        if not dirs:
            fields = [
                T.StructField(n, T._parse_datatype_string(t))
                for n, t in manifest["schema"].items()
            ] + [
                T.StructField(_LSN_COL, T.LongType()),
                T.StructField(_BUCKET_COL, T.IntegerType()),
                T.StructField(_DELETED_COL, T.BooleanType()),
            ]
            return self.spark.createDataFrame([], T.StructType(fields))
        # Group dirs by their WRITE (the data/vN component): files
        # within one write share a schema, but ACROSS writes both
        # column names (renames) and physical types (widen) may
        # differ — parquet mergeSchema refuses int-vs-long mixes, so
        # each write-group is read + normalized to the CURRENT
        # logical schema independently and the groups union by name.
        # (Found by the round-4 soak: a widen followed by one more
        # MoR delta made the stack unreadable under mergeSchema.)
        by_write: dict[str, list[str]] = {}
        for rd, d in zip(rel_dirs, dirs):
            if admit_files is not None and rd in admit_files:
                # stats-admitted subset: read file paths, not the dir
                by_write.setdefault(os.path.dirname(d), []).extend(
                    sorted(admit_files[rd])
                )
            else:
                by_write.setdefault(os.path.dirname(d), []).append(d)
        parts = []
        for wdir, ds in sorted(by_write.items()):
            p = self.spark.read.parquet(*sorted(ds))
            # Stamp each write group with its snapshot-version ordinal
            # (parsed from the data/vN[-compact] dir name).  MoR
            # resolution orders by (_lsn, _write_version): two rows for
            # the same key at the SAME LSN — e.g. an epoch's tombstone
            # and a later quarantine repair re-offered at the original
            # LSN — resolve to the most recently COMMITTED write
            # instead of nondeterministically (round-4 ADVICE).  This
            # is the MoR analogue of the CoW merge's explicit
            # batch-beats-table ">=" rule.
            wv = _write_ordinal(wdir)
            p = p.withColumn(_WV_COL, F.lit(wv))
            # dropped-column hide, version-aware: a physical column
            # dropped at snapshot D is invisible in write groups older
            # than D (then _normalize null-fills if the name was later
            # re-added); write groups at/after D carry re-added data
            # and keep it.  read_at() of a pre-drop snapshot uses that
            # snapshot's manifest (no/earlier dropped entry), so time
            # travel still sees the column.
            for dcol, dver in manifest.get("dropped", {}).items():
                if dcol in p.columns and wv < dver:
                    p = p.drop(dcol)
            # bucket ids are stored as `_bucket=N` leaf dirs; reading
            # the leaf directly drops the partition column, so
            # recompute it from the key hash (deterministic by
            # construction).
            if _BUCKET_COL in p.columns:
                p = p.drop(_BUCKET_COL)
            if _DELETED_COL not in p.columns:
                p = p.withColumn(_DELETED_COL, F.lit(False))
            p = p.withColumn(
                _DELETED_COL, F.coalesce(F.col(_DELETED_COL), F.lit(False))
            )
            p = self._normalize(p, manifest)
            # bucket under THIS manifest's count — an older snapshot
            # predating a rebucket() keeps its own bucketing.
            p = p.withColumn(
                _BUCKET_COL,
                self.bucket_expr(
                    manifest["key_cols"], manifest.get("n_buckets", self.n_buckets)
                ),
            )
            parts.append(p.select(*cols, _WV_COL))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if resolve and manifest.get("partial_columnar"):
            # COLUMNAR merge-on-read: each value column independently
            # resolves to its latest PRESENT value by (lsn, write-
            # version), gated past the key's latest tombstone — the
            # read-time form of operators.dedup.fold_partial_updates.
            # Runs even with a single dir (one epoch's delta may hold
            # a tombstone + re-create pair for the same key).  Order-
            # independent by construction: the fold depends only on
            # the multiset of delta rows and their (lsn, wv).
            key_cols = manifest["key_cols"]
            value_cols = [c for c in manifest["schema"] if c not in key_cols]
            ord_ = F.struct(F.col(_LSN_COL), F.col(_WV_COL))
            w = Window.partitionBy(*[F.col(k) for k in key_cols])
            df = df.withColumn(
                "_del_ord", F.max(F.when(F.col(_DELETED_COL), ord_)).over(w)
            )
            upd = ~F.col(_DELETED_COL) & (
                F.col("_del_ord").isNull() | (ord_ > F.col("_del_ord"))
            )
            folded = df.groupBy(*key_cols).agg(
                *[
                    F.max_by(F.col(c), F.when(F.col(c).isNotNull() & upd, ord_)).alias(c)
                    for c in value_cols
                ],
                F.max(F.col(_LSN_COL)).alias(_LSN_COL),
                F.first(F.col(_BUCKET_COL)).alias(_BUCKET_COL),
                F.max(F.when(upd, ord_)).isNull().alias(_DELETED_COL),
                F.first(F.col("_del_ord")).alias("_del_ord"),
            )
            # A re-created key's LATEST TOMBSTONE must survive as its
            # own row: folding it away (as the whole-row path may)
            # would let a LATER-applied but OLDER-LSN epoch resurrect
            # pre-delete column values after compaction.  So keys that
            # were deleted AND re-created resolve to TWO rows — the
            # live row plus a value-less tombstone at the delete ord.
            live_or_final = folded.select(*cols)
            recreated_tombs = (
                folded.where(F.col("_del_ord").isNotNull() & ~F.col(_DELETED_COL))
                .select(
                    *key_cols,
                    *[F.lit(None).cast(manifest["schema"][c]).alias(c) for c in value_cols],
                    F.col("_del_ord")[_LSN_COL].alias(_LSN_COL),
                    F.col(_BUCKET_COL),
                    F.lit(True).alias(_DELETED_COL),
                )
                .select(*cols)
            )
            df = live_or_final.unionByName(recreated_tombs)
        elif resolve and has_deltas:
            # merge-on-read: resolve the winner per key across base +
            # delta files by (max LSN, then max write version) — the
            # write-version ordinal breaks equal-LSN ties toward the
            # most recently committed write.  ROW_NUMBER window, not
            # max_by(struct): the struct buffer forces two
            # SortAggregates with a sort each, the window is one
            # Exchange + WindowGroupLimit with map-side top-1 pruning
            # (same r6 rewrite as merge_epoch's batch reduction).
            key_cols = manifest["key_cols"]
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(_LSN_COL).desc(), F.col(_WV_COL).desc()
            )
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(*cols)  # canonical column order; drops _rn/_wv
            )
        else:
            df = df.select(*cols)
        return df

    def read(self, bucket_ids: list[int] | None = None) -> DataFrame:
        """Current snapshot as a DataFrame (tombstones filtered,
        system columns dropped)."""
        m = self._load_manifest()
        df = self._read_buckets(m, bucket_ids)
        return df.where(~F.col(_DELETED_COL)).drop(_LSN_COL, _BUCKET_COL, _DELETED_COL)

    def refresh_stats(self, cols: list[str]) -> dict:
        """Record per-file column min/max in the ``_stats.json``
        planning cache (distributed footer reads; immutable dirs are
        read once, ever).  See sink/stats.py."""
        self._require_main("refresh_stats")
        from etl_cms_spark.sink import stats as _stats

        return _stats.refresh_stats(self, cols)

    def refresh_member_stats(self, cols: list[str], bits: int = 4096) -> dict:
        """Record per-file membership sketches (Bloom-style) of
        ``cols`` for equality/IN pruning on unclustered
        high-cardinality columns — see ``sink/stats.py``."""
        self._require_main("refresh_member_stats")
        from etl_cms_spark.sink import stats as _stats

        return _stats.refresh_member_stats(self, cols, bits)

    def read_where(
        self, predicates: dict[str, tuple], version: int | None = None
    ) -> DataFrame:
        """Snapshot (current, or ``version`` for time travel) filtered
        by ``{col: (lo, hi)}`` closed ranges, with files pruned at
        PLANNING time from the stats cache — Iceberg's manifest-stats
        scan planning.  Identical results to ``read().where(...)`` /
        ``read_at(version).where(...)``; see sink/stats.py for the
        resolution-safety model."""
        from etl_cms_spark.sink import stats as _stats

        return _stats.read_where(self, predicates, version)

    def plan_where(
        self, predicates: dict[str, tuple], version: int | None = None
    ) -> dict:
        """The planning report ``read_where`` acts on (buckets/files
        total vs read) — observability for pruning effectiveness."""
        from etl_cms_spark.sink import stats as _stats

        return _stats.plan_where(self, predicates, version)

    def count_where(
        self, predicates: dict | None = None, version: int | None = None
    ) -> dict:
        """``SELECT count(*)`` (optionally filtered) answered from the
        stats sidecar wherever provable, scanning only the residue —
        Iceberg's metadata-only scan.  ``["count"]`` equals
        ``read_where(predicates).count()`` by construction; the report
        also carries files_meta / files_scanned / files_pruned.  See
        sink/stats.py::count_where for the proof ladder."""
        from etl_cms_spark.sink import stats as _stats

        return _stats.count_where(self, predicates, version)

    def stats_coverage(self) -> dict:
        """How much of the current snapshot the pruning cache covers
        (dirs/files/cols) — see sink/stats.py."""
        from etl_cms_spark.sink import stats as _stats

        return _stats.stats_coverage(self)

    # ------------------------------------------------------------- DML
    # Ad-hoc bulk DELETE / UPDATE (the `DELETE FROM ... WHERE` /
    # `UPDATE ... SET ... WHERE` admin surface — retention, GDPR
    # erasure, backfill corrections).  Both are expressed as ONE MORE
    # CHANGE EPOCH: victims are found through the stats-pruned
    # read_where plan, stamped with an LSN above every committed
    # change, and merged through the ordinary idempotent epoch commit —
    # so DML replays exactly-once, appears in CDC-out / changes_for_
    # epoch (downstream views and chained pipelines absorb it like any
    # source change), respects time travel, and a later source event
    # with a higher LSN overwrites it, exactly like any competing
    # writer.  No new write path, no special-cased state.

    # DML epochs live in their own id band: far above any source epoch
    # (run()'s 0..n-1 slices, streaming's monotonic batch ids) and
    # disjoint from the negative repair namespace — an auto-picked
    # max+1 would let a FUTURE source epoch with that id be silently
    # skipped as a duplicate (the repair-epoch hazard, round-4 advice).
    DML_EPOCH_BASE = 10**12

    def _dml_context(self, epoch: "int | None") -> tuple[dict, int, int]:
        m = self._load_manifest()
        if m.get("partial_columnar"):
            raise ValueError(
                "DML: partial_columnar tables assemble rows per column — "
                "apply a partial change epoch (merge_epoch_partial) instead"
            )
        if epoch is None:
            ids = [int(e) for e in m["epochs"]]
            epoch = max(
                (i for i in ids if i >= self.DML_EPOCH_BASE),
                default=self.DML_EPOCH_BASE - 1,
            ) + 1
        elif epoch < self.DML_EPOCH_BASE:
            raise ValueError(
                f"DML epoch ids must be >= {self.DML_EPOCH_BASE} (the "
                "reserved DML namespace) — source epochs and streaming "
                "batch ids own the low band, repairs own the negatives; "
                f"got {epoch}"
            )
        his = [
            rec.get("lsn_max")
            for rec in m["epochs"].values()
            if rec.get("lsn_max") is not None
        ]
        return m, int(epoch), int(max(his, default=0)) + 1

    @staticmethod
    def _json_preds(predicates: dict | None) -> dict:
        return {
            c: list(v) if isinstance(v, (tuple, set, frozenset)) else v
            for c, v in (predicates or {}).items()
        }

    def delete_where(
        self, predicates: dict | None = None, epoch: int | None = None
    ) -> dict:
        """Tombstone every current live row matching ``predicates``
        (``read_where`` forms; ``None`` = all rows, i.e. a logical
        TRUNCATE that history/time-travel still sees through).  The
        victim scan is stats-pruned; the deletes commit as epoch
        ``epoch`` (default: next sequential id) at an LSN above every
        committed change.  Idempotent: a committed epoch replays as a
        no-op.  Returns the lineage record."""
        self._require_main("delete_where")
        m, epoch, lsn = self._dml_context(epoch)
        if str(epoch) in m["epochs"]:
            rec = dict(m["epochs"][str(epoch)])
            rec["skipped_duplicate_epoch"] = True
            return rec
        victims = self.read_where(predicates or {})
        batch = (
            victims.select(*m["key_cols"])
            .withColumn("op", F.lit("D"))
            .withColumn("lsn", F.lit(lsn).cast("long"))
        )
        return self.merge_epoch(
            batch,
            epoch,
            extra_lineage={
                "dml": {"kind": "delete",
                        "predicates": self._json_preds(predicates)}
            },
        )

    def update_where(
        self,
        assignments: dict,
        predicates: dict | None = None,
        epoch: int | None = None,
    ) -> dict:
        """Rewrite every current live row matching ``predicates`` with
        ``assignments`` (``{col: Column-expression-or-literal}``) and
        commit the new images as epoch ``epoch`` at an LSN above every
        committed change.  Key columns cannot be assigned (a
        key-changing update is a delete+insert pair — emit those as
        source events instead, see sources/debezium key-change
        handling).  Same pruned-scan / idempotent-epoch contract as
        :meth:`delete_where`."""
        self._require_main("update_where")
        from pyspark.sql import Column

        m, epoch, lsn = self._dml_context(epoch)
        bad = [c for c in assignments if c not in m["schema"]]
        if bad:
            raise ValueError(f"update_where: no such columns {bad}")
        keyed = [c for c in assignments if c in m["key_cols"]]
        if keyed:
            raise ValueError(
                f"update_where: cannot assign key columns {keyed} — a "
                "key-changing update is a delete+insert pair of change events"
            )
        if str(epoch) in m["epochs"]:
            rec = dict(m["epochs"][str(epoch)])
            rec["skipped_duplicate_epoch"] = True
            return rec
        batch = self.read_where(predicates or {})
        for c, v in assignments.items():
            expr = v if isinstance(v, Column) else F.lit(v)
            batch = batch.withColumn(c, expr.cast(m["schema"][c]))
        batch = batch.withColumn("op", F.lit("U")).withColumn(
            "lsn", F.lit(lsn).cast("long")
        )
        return self.merge_epoch(
            batch,
            epoch,
            extra_lineage={
                "dml": {"kind": "update",
                        "set_cols": sorted(assignments),
                        "predicates": self._json_preds(predicates)}
            },
        )

    def merge_into(
        self,
        source: DataFrame,
        when_matched: str = "update",
        matched_condition=None,
        when_not_matched: str = "insert",
        epoch: int | None = None,
    ) -> dict:
        """SQL ``MERGE INTO`` parity (Delta/Iceberg ``whenMatched`` /
        ``whenNotMatched``), expressed as one more idempotent change
        epoch.  ``source`` carries one row per key (duplicates raise —
        same-LSN siblings would resolve nondeterministically):

        - matched rows (key live in the table) → ``when_matched``:
          ``"update"`` (upsert the source's full row image),
          ``"delete"``, or ``"ignore"``; ``matched_condition`` (Column
          or SQL string over the source columns plus the current row
          as a ``target`` struct, e.g. ``"target.num < source_num"``)
          restricts the clause — non-satisfying matched rows fall
          through to NOTHING, standard MERGE semantics.
        - unmatched rows → ``when_not_matched``: ``"insert"`` or
          ``"ignore"``.

        The target probe reads ONLY the hash buckets the source's keys
        live in (same pruning as the pipeline's previous-version
        lookup), the change batch commits at an LSN above every
        committed change, and everything downstream — CDC-out, time
        travel, exactly-once replay, later-LSN overwrites — follows
        from the ordinary epoch path.  Partial-column SET on matched
        rows is :meth:`update_where`'s job; MERGE takes full images."""
        self._require_main("merge_into")
        from pyspark.sql import Column

        if when_matched not in ("update", "delete", "ignore"):
            raise ValueError(f"when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched: {when_not_matched!r}")
        if "target" in source.columns:
            raise ValueError(
                "merge_into: rename the source's `target` column — the "
                "name is reserved for the current-row struct in "
                "matched_condition"
            )
        m, epoch, lsn = self._dml_context(epoch)
        if str(epoch) in m["epochs"]:
            rec = dict(m["epochs"][str(epoch)])
            rec["skipped_duplicate_epoch"] = True
            return rec
        key_cols = m["key_cols"]
        need_payload = when_matched == "update" or when_not_matched == "insert"
        need = list(m["schema"]) if need_payload else list(key_cols)
        missing = [c for c in need if c not in source.columns]
        if missing:
            raise ValueError(f"merge_into: source lacks columns {missing}")
        payload = [c for c in m["schema"] if c not in key_cols]

        src = source.localCheckpoint()  # pin: probed + joined + merged
        dup = (
            src.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .where("n > 1")
            .take(1)
        )
        if dup:
            raise ValueError(
                "merge_into: source has multiple rows per key "
                f"(e.g. {tuple(dup[0][c] for c in key_cols)}) — "
                "pre-dedup (latest_by_lsn) before merging"
            )
        bks = [
            r["b"]
            for r in src.select(self.bucket_expr(key_cols).alias("b"))
            .distinct()
            .collect()
        ]
        tgt = self.read(bucket_ids=sorted(bks)).select(
            *key_cols,
            F.struct(*[F.col(c) for c in payload]).alias("target"),
            F.lit(True).alias("_matched"),
        )
        # SHUFFLE_HASH: the probe side is bucket-pruned but can still be
        # big; SMJ's sorts would be pure waste for a key-equality probe.
        j = src.join(tgt.hint("shuffle_hash"), on=key_cols, how="left")

        matched = F.coalesce(F.col("_matched"), F.lit(False))
        if matched_condition is None:
            cond = F.lit(True)
        elif isinstance(matched_condition, Column):
            cond = matched_condition
        else:
            cond = F.expr(matched_condition)
        op = F.when(
            matched & cond,
            F.lit(None if when_matched == "ignore"
                  else ("U" if when_matched == "update" else "D")),
        ).when(
            ~matched,
            F.lit("U" if when_not_matched == "insert" else None),
        )
        is_del = F.col("op") == "D"
        batch = (
            j.withColumn("op", op)
            .where(F.col("op").isNotNull())
            .select(
                *key_cols,
                *[
                    (
                        F.when(is_del, F.lit(None))
                        .otherwise(F.col(c) if c in source.columns else F.lit(None))
                        .cast(m["schema"][c])
                        .alias(c)
                    )
                    for c in payload
                ],
                "op",
                F.lit(lsn).cast("long").alias("lsn"),
            )
        )
        return self.merge_epoch(
            batch,
            epoch,
            extra_lineage={
                "dml": {
                    "kind": "merge_into",
                    "when_matched": when_matched,
                    "when_not_matched": when_not_matched,
                    "conditioned": matched_condition is not None,
                }
            },
        )

    def read_raw(self, bucket_ids: list[int] | None = None) -> DataFrame:
        """Current snapshot INCLUDING tombstone rows and the ``_lsn``
        / ``_deleted`` system columns (MoR stacks resolved).  For
        callers that need previous-version metadata — e.g. the demux
        previous-domain lookup must see a deleted key's LSN to
        recognize a stale redelivery that would otherwise resurrect
        the key in a domain table."""
        m = self._load_manifest()
        return self._read_buckets(m, bucket_ids).drop(_BUCKET_COL)

    def tombstone_stats(self) -> DataFrame:
        """Per-bucket tombstone census — (``_bucket``, ``n_tombstones``,
        ``min_lsn``, ``max_lsn``) — the input to choosing a bounded
        expiry horizon for ``compact(expire_tombstones_below=L)``:
        rows below every consumer's replay horizon are pure retention
        cost.  One aggregation over the resolved snapshot; output is
        at most ``n_buckets`` rows."""
        m = self._load_manifest()
        return (
            self._read_buckets(m, None)
            .where(F.col(_DELETED_COL))
            .groupBy(_BUCKET_COL)
            .agg(
                F.count(F.lit(1)).alias("n_tombstones"),
                F.min(_LSN_COL).alias("min_lsn"),
                F.max(_LSN_COL).alias("max_lsn"),
            )
        )

    def read_at(self, version: int, bucket_ids: list[int] | None = None) -> DataFrame:
        """Time travel: read an older snapshot (optionally bucket-pruned)."""
        m = self._load_manifest(version)
        df = self._read_buckets(m, bucket_ids)
        return df.where(~F.col(_DELETED_COL)).drop(_LSN_COL, _BUCKET_COL, _DELETED_COL)

    def version_at_epoch(self, epoch: int) -> int:
        """The snapshot version holding this table's state AFTER
        applying source epochs <= ``epoch``: the largest committed
        SOURCE epoch id (>= 0; the negative repair namespace commits
        later in wall time and is deliberately outside the boundary)
        at most ``epoch``, mapped to its recorded snapshot version —
        or 0 (the empty created table) when no such epoch exists.
        Driver-side manifest arithmetic only.  The returned version
        stays readable until ``vacuum`` expires it; ``read_at`` then
        fails loud rather than approximating.

        This is the alignment primitive for CONSISTENT MULTI-TABLE
        reads (CDCPipeline.read_consistent): tables sharing source
        epoch ids each pin their own version for the same boundary,
        giving one atomic cut across sinks without multi-table
        transactions."""
        cands = [
            (int(e), int(r["snapshot_version"]))
            for e, r in self._load_manifest()["epochs"].items()
            if 0 <= int(e) <= epoch
        ]
        return max(cands)[1] if cands else 0

    def read_at_epoch(self, epoch: int) -> DataFrame:
        """The table's state after source epochs <= ``epoch``
        (``read_at`` of ``version_at_epoch``).  Aligning several
        tables that share epoch ids — the lake, its demux sinks, SCD2
        / join-view / rollup sidecar tables — on the same ``epoch``
        yields one consistent cross-table cut."""
        return self.read_at(self.version_at_epoch(epoch))

    def rollback(self, version: int) -> int:
        """Restore an older snapshot as a NEW commit (write-side time
        travel).  The target version's bucket map and epoch set become
        current under a new version number — nothing is rewritten or
        deleted, so the rolled-back-over versions remain readable and
        the undone epochs will re-apply on replay (their ids left the
        epoch set with the rollback)."""
        self._require_main("rollback")
        target = self._load_manifest(version)
        cur = self._load_manifest()
        new = dict(target)
        new["version"] = self._reserve_version()
        new["parent_version"] = cur["version"]
        new["rolled_back_from"] = cur["version"]
        new["rolled_back_to"] = version
        try:
            v = self._commit_manifest(new)
        except _StaleParent as sp:
            self._abandon_version(new["version"], None)
            raise ConcurrentCommitError(
                f"concurrent commit (now at snapshot {sp.latest}) raced "
                "this rollback; re-run it against the current snapshot"
            ) from None
        # the restored manifest may predate a rebucket() — keep the
        # instance's bucket count in step with what is now current.
        self.n_buckets = int(new.get("n_buckets", self.n_buckets))
        return v

    # ---------------- named refs (tags) ----------------

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under an immutable name (Iceberg tag):
        ``vacuum`` retains tagged snapshots beyond its ``keep_last``
        window, so audits / releases / reproducibility pins survive
        routine GC.  Tags are write-once (O_EXCL ref file — two racing
        taggers cannot silently overwrite each other); re-pointing a
        name requires an explicit ``drop_tag`` first."""
        self._require_main("tag")
        if not re.fullmatch(r"[A-Za-z0-9._-]+", name):
            raise ValueError(f"invalid tag name {name!r}")
        v = self._current_version() if version is None else int(version)
        if not os.path.exists(os.path.join(self._manifest_dir, f"v{v}.json")):
            raise ValueError(f"cannot tag snapshot {v}: unknown or vacuumed")
        try:
            fd = os.open(
                os.path.join(self._manifest_dir, f"ref.{name}"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            raise ValueError(
                f"tag {name!r} already exists (drop_tag to re-point)"
            ) from None
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        return v

    def tags(self) -> dict[str, int]:
        out = {}
        for f in os.listdir(self._manifest_dir):
            if f.startswith("ref."):
                with open(os.path.join(self._manifest_dir, f)) as fh:
                    out[f[4:]] = int(fh.read().strip())
        return out

    def drop_tag(self, name: str) -> None:
        self._require_main("drop_tag")
        p = os.path.join(self._manifest_dir, f"ref.{name}")
        if not os.path.exists(p):
            raise ValueError(f"no such tag {name!r}")
        os.remove(p)

    def read_tag(self, name: str, bucket_ids: list[int] | None = None) -> DataFrame:
        t = self.tags()
        if name not in t:
            raise ValueError(f"no such tag {name!r}")
        return self.read_at(t[name], bucket_ids)

    def vacuum(self, keep_last: int = 2, expire_reservations: bool = False) -> dict:
        """Snapshot expiry + orphan GC.  Keeps the last ``keep_last``
        versions (time travel horizon) plus every TAGGED snapshot
        (``tag`` — retention pins); deletes every bucket data dir
        not referenced by a kept manifest — including orphans from
        crashes between data write and CURRENT swap — and drops the
        expired manifests so reads of vacuumed versions fail fast.

        Safety: the referenced set is the UNION over kept manifests
        (buckets are carried across versions by reference, so an old
        version's dir may still back the current snapshot — it is
        kept).  Rollback beyond the vacuum horizon is impossible by
        construction; choose ``keep_last`` >= the replay/audit window.

        Data dirs whose version holds a LIVE reservation marker are
        never touched: they belong to an in-flight merge or a
        WAP-staged epoch (``stage_epoch``), even when concurrent
        commits have advanced CURRENT past their number.  Markers are
        dropped on commit/discard, so a lingering marker is either a
        live writer or crash debris; pass ``expire_reservations=True``
        (only when no writers are in flight) to reclaim debris markers
        at or below CURRENT together with their unreferenced dirs.
        """
        import shutil

        self._require_main("vacuum")
        cur = self._current_version()
        reserved = {
            int(m.group(1))
            for f in os.listdir(self._manifest_dir)
            if (m := re.fullmatch(r"\.reserve\.v(\d+)", f))
        }
        window = set(range(max(0, cur - keep_last + 1), cur + 1))
        # tagged snapshots are retention pins: their manifests and the
        # data dirs they reference survive any keep_last window.
        window |= set(self.tags().values())
        keep = [
            v
            for v in sorted(window)
            if os.path.exists(os.path.join(self._manifest_dir, f"v{v}.json"))
        ]
        referenced: set[str] = set()
        for v in keep:
            m = self._load_manifest(v)
            for b in m["buckets"]:
                referenced.update(self._bucket_dirs(m, b))
        # live branches pin everything their manifests reference —
        # including dirs INHERITED from fork-point snapshots that the
        # keep_last window has already expired — and their version
        # numbers stay off-limits to reservation expiry (a branch
        # commit's live marker is a ref, not crash debris).
        branch_pinned: set[int] = set()
        for bname in self.branches():
            for m in self._branch_chain(bname):
                branch_pinned.add(int(m["version"]))
                for b in m["buckets"]:
                    referenced.update(self._bucket_dirs(m, b))
        reserved |= branch_pinned
        removed_dirs = []
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for vdir in sorted(os.listdir(data_root)):
                vpath = os.path.join(data_root, vdir)
                if not os.path.isdir(vpath):
                    continue
                # Never touch data dirs AHEAD of the current version:
                # an in-flight merge_epoch writes data/v{N+1} before
                # its manifest swap, so those files are a live write,
                # not garbage (round-3 ADVICE — makes a concurrent
                # vacuum safe against the single in-order writer; a
                # dir orphaned by a crash is reclaimed by the NEXT
                # vacuum, once current has moved past it).
                mnum = re.match(r"v(\d+)", vdir)
                vnum = int(mnum.group(1)) if mnum else None
                if vnum is not None and vnum > cur:
                    continue
                if vnum in reserved and not expire_reservations:
                    # live reservation: an in-flight or WAP-staged
                    # write whose number commits have moved past.
                    continue
                for leaf in sorted(os.listdir(vpath)):
                    rel = f"data/{vdir}/{leaf}"
                    if leaf.startswith(f"{_BUCKET_COL}=") and rel not in referenced:
                        shutil.rmtree(os.path.join(vpath, leaf), ignore_errors=True)
                        removed_dirs.append(rel)
                remaining = [
                    x for x in os.listdir(vpath) if x.startswith(f"{_BUCKET_COL}=")
                ]
                if not remaining:
                    shutil.rmtree(vpath, ignore_errors=True)
        removed_manifests = []
        for f in sorted(os.listdir(self._manifest_dir)):
            if re.fullmatch(r"v\d+\.json", f):
                v = int(f[1:-5])
                # v > cur is an in-flight commit's manifest written
                # just before its CURRENT swap — live, same guard as
                # the data dirs above.
                if v not in keep and v <= cur:
                    os.remove(os.path.join(self._manifest_dir, f))
                    removed_manifests.append(v)
            elif expire_reservations:
                m = re.fullmatch(r"\.reserve\.v(\d+)", f)
                # debris markers (crashed writers) at or below current
                # — reclaim only on explicit request, since a live
                # in-flight writer's marker looks identical.  Branch
                # commits' markers are REFS (they alone keep the number
                # unissuable), never debris.
                if m and int(m.group(1)) <= cur and int(m.group(1)) not in branch_pinned:
                    os.remove(os.path.join(self._manifest_dir, f))
        return {
            "kept_versions": keep,
            "removed_bucket_dirs": len(removed_dirs),
            "removed_manifests": removed_manifests,
        }

    def changes_between(
        self,
        v_from: int,
        v_to: int | None = None,
        bucket_ids: list[int] | None = None,
    ) -> DataFrame:
        """CDC OUT — export the row-level diff between two snapshots
        as a Debezium-shaped changelog: key columns + ``op``
        ('I'/'U'/'D') + ``before``/``after`` payload structs (before
        NULL on insert, after NULL on delete).  This closes the CDC
        loop: downstream consumers subscribe to the lake's own
        changes the same way this engine tails its source.

        Implementation is a snapshot diff (FULL OUTER join of the two
        live states on the key, bucket-aligned on both sides so the
        join shuffles each snapshot once at most), optionally pruned
        to ``bucket_ids``.  For CONSECUTIVE epochs use
        ``changes_for_epoch`` — it prunes the diff to the epoch's
        changed buckets, making the export O(changed buckets) instead
        of O(both snapshots); the unpruned form is the right tool for
        arbitrary version pairs (backfills, audits, late consumers).
        """
        m = self._load_manifest()
        key_cols = m["key_cols"]
        payload = [c for c in m["schema"] if c not in key_cols]
        old = self.read_at(v_from, bucket_ids).select(
            *key_cols,
            F.lit(True).alias("_b_present"),
            F.struct(*[F.col(c).alias(c) for c in payload]).alias("before"),
        )
        new = (
            self.read_at(v_to, bucket_ids)
            if v_to is not None
            else self.read(bucket_ids=bucket_ids)
        ).select(
            *key_cols,
            F.lit(True).alias("_a_present"),
            F.struct(*[F.col(c).alias(c) for c in payload]).alias("after"),
        )
        j = old.join(new, list(key_cols), "full")
        op = (
            F.when(F.col("_b_present").isNull(), F.lit("I"))
            .when(F.col("_a_present").isNull(), F.lit("D"))
            # null-safe struct compare: a payload field moving to/from
            # NULL is a change, and equal-with-nulls is NOT a change.
            .when(~F.col("before").eqNullSafe(F.col("after")), F.lit("U"))
        )
        return (
            j.withColumn("op", op)
            .where(F.col("op").isNotNull())
            .select(*key_cols, "op", "before", "after")
        )

    def epoch_batch(self, epoch: int) -> DataFrame:
        """The deduped change batch a committed MoR epoch merged, read
        back from the epoch's OWN delta files — O(epoch rows), no
        snapshot diff, no join.  Columns: key…, ``op`` ('U'/'D',
        derived from the tombstone marker), ``lsn``, payload (NULL on
        deletes), normalized to the current logical schema (renames /
        added columns).  The cheap feed for consumers that only need
        the AFTER image per key (e.g. plans/joinview.py) — consumers
        that need the before image use ``changes_for_epoch``.

        CoW epochs raise (their data dirs are bucket rewrites, not
        deltas); vacuumed epochs raise rather than silently return a
        partial batch (same contract as the lake_changelog stream
        source)."""
        m = self._load_manifest()
        rec = m["epochs"].get(str(epoch))
        if rec is None:
            raise ValueError(f"epoch {epoch} is not committed")
        if rec.get("mode", "mor") != "mor":
            raise ValueError(
                f"epoch {epoch} was committed mode={rec.get('mode')}; its "
                "data dirs are bucket rewrites, not deltas — use "
                "changes_for_epoch"
            )
        key_cols = m["key_cols"]
        payload = [c for c in m["schema"] if c not in key_cols]
        v = rec["snapshot_version"]
        dirs, missing = [], []
        for b in rec.get("changed_buckets", []):
            d = os.path.join(self.root, "data", f"v{v}", f"_bucket={b}")
            (dirs if os.path.isdir(d) else missing).append(d)
        if missing:
            raise ValueError(
                f"epoch {epoch} delta files are gone (vacuumed): {missing[:3]}"
            )
        if not dirs:
            schema = T.StructType(
                [
                    T.StructField(c, T._parse_datatype_string(m["schema"][c]))
                    for c in key_cols
                ]
                + [
                    T.StructField("op", T.StringType()),
                    T.StructField("lsn", T.LongType()),
                ]
                + [
                    T.StructField(c, T._parse_datatype_string(m["schema"][c]))
                    for c in payload
                ]
            )
            return self.spark.createDataFrame([], schema)
        df = self._normalize(self.spark.read.parquet(*dirs), m)
        return df.select(
            *key_cols,
            F.when(F.col(_DELETED_COL), F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col(_LSN_COL).cast("long").alias("lsn"),
            *[
                F.when(F.col(_DELETED_COL), F.lit(None).cast(m["schema"][c]))
                .otherwise(F.col(c))
                .alias(c)
                for c in payload
            ],
        )

    def epoch_effective_batch(self, epoch: int) -> DataFrame:
        """``epoch_batch`` filtered to the keys the epoch actually
        CHANGED — the feed for consumers that must never see a STALE
        event (one that lost the last-writer-wins merge because an
        earlier-committed epoch already carried a higher LSN for its
        key; file-split streaming micro-batches are not LSN-ordered,
        so this is a real shape, not an edge case).  For every key
        the epoch's diff includes, the epoch's (deduped) batch row IS
        the new winner, so the filtered batch is exactly the epoch's
        visible effect with true LSNs attached.

        Cost: FREE when the epoch is provably LSN-monotone vs every
        earlier epoch (its recorded lsn_min strictly above all prior
        lsn_max — driver-side lineage arithmetic, no extra job; the
        batch-mode pipeline's contiguous LSN slices always pass);
        otherwise one bucket-pruned ``changes_for_epoch`` diff feeds
        a key semi-join.  Repair epochs (negative ids) re-offer OLD
        LSNs by design and always take the diff path."""
        batch = self.epoch_batch(epoch)
        m = self._load_manifest()
        rec = m["epochs"][str(epoch)]
        lo = rec.get("lsn_min")
        prior = [
            r.get("lsn_max")
            for e, r in m["epochs"].items()
            if int(e) < int(epoch) and r.get("lsn_max") is not None
        ]
        if int(epoch) >= 0 and lo is not None and (not prior or lo > max(prior)):
            return batch
        changed = self.changes_for_epoch(epoch).select(*m["key_cols"])
        return batch.join(changed, m["key_cols"], "semi")

    def changes_for_epoch(self, epoch: int) -> DataFrame:
        """CDC OUT for ONE committed epoch, bucket-pruned: reads the
        epoch's lineage record for its snapshot version and changed
        buckets and diffs only those buckets of (v-1, v).  Changes
        can only occur in buckets the merge touched, so the result is
        identical to the full ``changes_between(v-1, v)`` at
        O(changed buckets) cost — the incremental feed a downstream
        consumer (e.g. plans.rollup.StateRollup) tails per epoch."""
        m = self._load_manifest()
        rec = m["epochs"].get(str(epoch))
        if rec is None:
            raise ValueError(f"epoch {epoch} is not committed")
        v = rec["snapshot_version"]
        buckets = rec.get("changed_buckets")
        if not buckets:
            # empty or schema-change commit: no row changes by
            # construction — return an empty changelog DIRECTLY
            # instead of diffing two identical full snapshots
            # (changes_between(v, v) read both and ran a full-outer
            # self-join just to produce nothing — round-4 ADVICE).
            key_cols = m["key_cols"]
            payload = [c for c in m["schema"] if c not in key_cols]
            pay_t = T.StructType(
                [
                    T.StructField(c, T._parse_datatype_string(m["schema"][c]))
                    for c in payload
                ]
            )
            schema = T.StructType(
                [
                    T.StructField(c, T._parse_datatype_string(m["schema"][c]))
                    for c in key_cols
                ]
                + [
                    T.StructField("op", T.StringType()),
                    T.StructField("before", pay_t),
                    T.StructField("after", pay_t),
                ]
            )
            return self.spark.createDataFrame([], schema)
        # the previous snapshot is the epoch's recorded PARENT — with
        # optimistic concurrency, version numbers may have gaps and a
        # rebased commit's parent is whatever it committed on top of.
        return self.changes_between(
            rec.get("parent_version", v - 1), v, bucket_ids=[int(b) for b in buckets]
        )

    # ---------------- metadata tables ----------------

    def snapshots_df(self) -> DataFrame:
        """The table's snapshot history as a DataFrame (Iceberg's
        ``snapshots`` metadata table): one row per retained manifest —
        version, parent, committed-epoch count, schema width, bucket
        count, and whether it is CURRENT.  Manifests are tiny JSON
        (O(buckets)), so this is a driver-side read of the metadata
        layer only — no data files are touched."""
        cur = self._current_version()
        rows = []
        for f in os.listdir(self._manifest_dir):
            m = re.fullmatch(r"v(\d+)\.json", f)
            if not m:
                continue
            man = self._load_manifest(int(m.group(1)))
            rows.append(
                (
                    int(man["version"]),
                    man.get("parent_version"),
                    len(man["epochs"]),
                    len(man["schema"]),
                    int(man.get("n_buckets", self.n_buckets)),
                    int(man["version"]) == cur,
                )
            )
        return self.spark.createDataFrame(
            sorted(rows),
            "version long, parent_version long, n_epochs long, "
            "n_schema_cols int, n_buckets int, is_current boolean",
        )

    def refs_df(self) -> DataFrame:
        """Named refs as a DataFrame (Iceberg's ``refs`` metadata
        table): one row per tag (immutable pin) and per branch
        (writable lineage; ``n_commits`` = commits ahead of its fork).
        Driver-side metadata read only."""
        rows = [
            (name, "tag", int(v), None, None)
            for name, v in self.tags().items()
        ] + [
            (
                name,
                "branch",
                int(ref["head"]),
                int(ref["fork"]),
                len(self._branch_chain(name)),
            )
            for name, ref in self.branches().items()
        ]
        return self.spark.createDataFrame(
            sorted(rows),
            "name string, type string, version long, fork_version long, "
            "n_commits int",
        )

    def files_df(self, version: int | None = None) -> DataFrame:
        """The data files referenced by a snapshot (Iceberg's ``files``
        metadata table): bucket, path, write dir, footer row count,
        on-disk bytes, and the parquet column-statistics min/max of
        the leading key column.  The FILE LIST comes from the manifest
        (the metadata layer, driver-side, O(files) strings — exactly
        Iceberg's planning input); the per-file FOOTER reads are
        distributed via ``mapInPandas`` (pyarrow, executor-side,
        Arrow-batched) so a million-file table never funnels footer
        I/O through the driver."""
        manifest = self._load_manifest(version)
        lead_key = manifest["key_cols"][0]
        entries = []
        for b in manifest["buckets"]:
            for d in self._bucket_dirs(manifest, b):
                # manifest bucket entries are the `_bucket=N` leaf dirs;
                # their parent (data/vN[...]) is the write group.
                bdir = os.path.join(self.root, d)
                if not os.path.isdir(bdir):
                    continue
                entries.extend(
                    (int(b), os.path.join(bdir, fn), os.path.dirname(d))
                    for fn in os.listdir(bdir)
                    if fn.endswith(".parquet")
                )
        paths = self.spark.createDataFrame(
            entries or [], "bucket int, file_path string, write_dir string"
        )

        def _footers(batches):
            import pandas as pd
            import pyarrow.parquet as pq

            for pdf in batches:
                out = []
                for r in pdf.itertuples(index=False):
                    md = pq.ParquetFile(r.file_path).metadata
                    idx = md.schema.to_arrow_schema().get_field_index(lead_key)
                    mins, maxs = [], []
                    for g in range(md.num_row_groups):
                        st = md.row_group(g).column(idx).statistics
                        if st is not None and st.has_min_max:
                            mins.append(st.min)
                            maxs.append(st.max)
                    out.append(
                        (
                            r.bucket,
                            r.file_path,
                            r.write_dir,
                            md.num_rows,
                            os.path.getsize(r.file_path),
                            str(min(mins)) if mins else None,
                            str(max(maxs)) if maxs else None,
                        )
                    )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "bucket", "file_path", "write_dir", "row_count",
                        "size_bytes", "key_min", "key_max",
                    ],
                )

        return paths.mapInPandas(
            _footers,
            "bucket int, file_path string, write_dir string, "
            "row_count long, size_bytes long, key_min string, key_max string",
        )

    def partitions_df(self, version: int | None = None) -> DataFrame:
        """Per-bucket rollup of ``files_df`` (Iceberg's ``partitions``
        metadata table): physical rows, bytes, file count, write-group
        (delta-stack) depth, and key range — the observability surface
        a compaction/maintenance scheduler plans from (depth ==
        read-amplification for MoR buckets; tiny-file counts feed
        bin-packing)."""
        return (
            self.files_df(version)
            .groupBy("bucket")
            .agg(
                F.sum("row_count").alias("row_count"),
                F.sum("size_bytes").alias("size_bytes"),
                F.count("*").alias("n_files"),
                F.countDistinct("write_dir").alias("depth"),
                F.min("key_min").alias("key_min"),
                F.max("key_max").alias("key_max"),
            )
        )

    def lookup(self, key_values: dict[str, Any]) -> DataFrame:
        """Point lookup by full key: hash the key to its bucket on the
        DRIVER, read only that bucket's file set, and push the key
        equality into the parquet scan.  Three prunes compound:
        1/n_buckets of the table by bucket, then row groups inside the
        bucket files via the clustered (key-sorted) layout's min/max
        stats, then pages via the pushed filter.  At 100 TB this is
        the difference between a key probe and a table scan."""
        m = self._load_manifest()
        key_cols = m["key_cols"]
        if set(key_values) != set(key_cols):
            raise ValueError(f"lookup needs the full key {key_cols}, got {list(key_values)}")
        one = self.spark.createDataFrame(
            [tuple(key_values[c] for c in key_cols)],
            ", ".join(f"`{c}` {m['schema'][c]}" for c in key_cols),
        )
        bucket = one.select(self.bucket_expr(key_cols).alias("b")).first()["b"]
        out = self.read(bucket_ids=[int(bucket)])
        for c in key_cols:
            out = out.where(F.col(c) == F.lit(key_values[c]))
        return out

    def bucket_expr(self, key_cols: list[str], n_buckets: int | None = None):
        """Bucket id of a row.  ``n_buckets`` defaults to the CURRENT
        bucket count; reads of an older snapshot must pass that
        manifest's own value (bucket-count evolution — ``rebucket``)."""
        n = self.n_buckets if n_buckets is None else int(n_buckets)
        return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n)).cast("int")

    # ---------------- write path ----------------

    def merge_epoch(
        self,
        updates: DataFrame,
        epoch: int,
        op_col: str = "op",
        lsn_col: str = "lsn",
        extra_lineage: dict | None = None,
        stats: dict | None = None,
        skip_batch_dedup: bool = False,
        batch_deduped: bool = False,
        computed_on_version: int | None = None,
        _stage: bool = False,
    ) -> dict:
        """MERGE an epoch's deduped change batch into the table.

        ``updates`` must carry the key columns, ``op`` ('I'/'U'/'D'),
        ``lsn``, and payload columns (a subset/superset of the logical
        schema is normalized).  Must already be deduped to one row per
        key (operators.dedup.latest_by_lsn) — enforced cheaply by the
        max-LSN merge anyway, so violations degrade to extra work, not
        wrong answers.

        ``batch_deduped=True`` is the caller's GUARANTEE that the batch
        holds exactly one row per key (e.g. it just ran the window or
        salted dedup): the merge then skips its own per-key ``max_by``
        reduction — for CoW the batch side feeds the outer join
        directly, for MoR the delta is written as-is WITHOUT the
        ``undeduped`` manifest flag (every row is its own winner, so
        single-dir reads stay prune-safe).  Measured (r6): the skipped
        reduction is two SortAggregates + two Sorts + one Exchange of
        full payload rows per epoch.  Unlike ``skip_batch_dedup`` it
        must not be passed for batches that may hold several rows per
        key — that would produce duplicate keys in a CoW table.

        ``stats`` (optional) skips the internal stats job when the
        caller already computed {n_total, n_deletes, lsn_lo, lsn_hi,
        changed_buckets} — the pipeline does this via ``observe()`` on
        the batch-materialization job, saving one job per epoch (the
        per-epoch serial floor is what limits scaling efficiency).

        Returns the lineage record; if ``epoch`` was already committed
        the call is a NO-OP and returns the recorded lineage
        (exactly-once on replay).
        """
        manifest = self._load_manifest()
        if str(epoch) in manifest["epochs"]:
            rec = dict(manifest["epochs"][str(epoch)])
            rec["skipped_duplicate_epoch"] = True
            if _stage:
                return StagedEpoch(self, manifest, None, None, set(), [],
                                   dict(epoch=epoch), dup_rec=rec)
            return rec
        if (
            computed_on_version is not None
            and manifest["version"] != computed_on_version
        ):
            # the batch (e.g. merge_epoch_partial's hydration) was
            # computed against an OLDER snapshot than the one this
            # merge would base on — the CAS below couldn't see that
            # staleness, so it must be rejected here.
            raise ConcurrentCommitError(
                f"batch was computed on snapshot {computed_on_version} "
                f"but the table is now at {manifest['version']}; re-run "
                "against the current snapshot"
            )

        t0 = time.time()
        key_cols = manifest["key_cols"]
        schema = manifest["schema"]

        up = updates.withColumn(_BUCKET_COL, self.bucket_expr(key_cols))
        up = up.withColumn(_LSN_COL, F.col(lsn_col).cast("long"))
        if stats is None:
            # one job: per-op counts + lsn range + changed buckets.
            stats_rows = (
                up.groupBy(op_col)
                .agg(
                    F.count("*").alias("n"),
                    F.min(_LSN_COL).alias("lo"),
                    F.max(_LSN_COL).alias("hi"),
                    F.collect_set(_BUCKET_COL).alias("bks"),
                )
                .collect()
            )
            stats = {
                "n_total": sum(r["n"] for r in stats_rows),
                "n_deletes": sum(r["n"] for r in stats_rows if r[op_col] == "D"),
                "lsn_lo": min((r["lo"] for r in stats_rows), default=None),
                "lsn_hi": max((r["hi"] for r in stats_rows), default=None),
                "changed_buckets": sorted({b for r in stats_rows for b in r["bks"]}),
            }
        if not stats["n_total"]:
            v = self._reserve_version()
            if _stage:
                return StagedEpoch(
                    self, manifest, v, None, set(), [],
                    dict(epoch=epoch, n_upserts=0, n_deletes=0,
                         lsn_lo=None, lsn_hi=None, t0=t0,
                         extra_lineage=extra_lineage),
                )
            return self._commit_epoch_with_rebase(
                manifest, v, None, set(), [], epoch, 0, 0, None, None,
                t0, extra_lineage,
            )
        changed_buckets = sorted(stats["changed_buckets"])
        lsn_lo = stats["lsn_lo"]
        lsn_hi = stats["lsn_hi"]
        n_deletes = stats["n_deletes"]
        n_upserts = stats["n_total"] - n_deletes

        # normalize updates to logical schema (+ mark deletes): a
        # changelog producer may still emit pre-rename column names
        # after a RENAME_COL event — map them forward.
        for old, new in manifest["renames"].items():
            if old in up.columns and new not in up.columns:
                up = up.withColumnRenamed(old, new)
        proj = [
            (F.col(c) if c in up.columns else F.lit(None)).cast(t).alias(c)
            for c, t in schema.items()
        ]
        up_norm = up.select(
            *proj,
            F.col(_LSN_COL),
            F.col(_BUCKET_COL),
            (F.col(op_col) == "D").alias(_DELETED_COL),
        )
        payload = [c for c in up_norm.columns if c not in key_cols]
        if self.merge_mode == "mor" and (skip_batch_dedup or batch_deduped):
            # MoR + caller-asserted near-deduped batch: the delta is
            # written AS IS — the read path's per-key max-LSN
            # resolution across base+deltas subsumes the batch-local
            # reduction, so the per-merge SortAggregate (struct agg
            # buffer) disappears entirely and the merge is a pure
            # repartition+write.  Residual same-key rows (e.g. an
            # upsert plus a higher-LSN routing tombstone) cost delta
            # bytes, never correctness.  Invalid for CoW: the outer
            # join needs one batch row per key.
            winner = up_norm
        elif self.merge_mode == "mor":
            # one winner per key within the batch.  ROW_NUMBER window,
            # not max_by(struct): the struct aggregation buffer forces
            # two SortAggregates (partial+final, a sort each), while
            # the window is one Exchange plus WindowGroupLimit — which
            # additionally prunes each map partition to its per-key
            # top-1 BEFORE the shuffle (r2 measured the window dedup
            # 13.4 s vs struct-agg 19-22 s end-to-end; r6 A/B on the
            # chain-transport row re-confirms for the merge).  Exact
            # duplicate (key, lsn) rows from at-least-once delivery
            # are byte-identical, so the tie pick stays deterministic
            # in effect — the same contract max_by gave.  merge-on-
            # read: the deduped batch IS the delta — no target read,
            # no table-side shuffle.
            winner = self._window_one_per_key(up_norm, key_cols)
        else:
            if batch_deduped:
                # caller-guaranteed one row per key: the batch feeds
                # the outer join directly — no per-key reduction.
                u = up_norm.select(
                    *key_cols, F.struct(*payload).alias("_u")
                )
            else:
                u = self._window_one_per_key(up_norm, key_cols).select(
                    *key_cols, F.struct(*payload).alias("_u")
                )
            target = self._read_buckets(manifest, changed_buckets)
            # max-LSN wins per key (E5 + MERGE); deletes persist as
            # tombstone rows so out-of-order replays cannot resurrect
            # keys.  FULL OUTER shuffled-hash join rather than
            # union + max_by: struct-buffer aggregation would compile
            # to SortAggregate (sorting every partition of
            # table+batch); the hash join shuffles each side once with
            # zero sorts.
            t = target.select(*key_cols, F.struct(*payload).alias("_t"))
            joined = t.join(u.hint("SHUFFLE_HASH"), list(key_cols), "full")
            pick = (
                F.when(F.col("_t").isNull(), F.col("_u"))
                .when(F.col("_u").isNull(), F.col("_t"))
                .when(F.col(f"_u.{_LSN_COL}") >= F.col(f"_t.{_LSN_COL}"), F.col("_u"))
                .otherwise(F.col("_t"))
            )
            winner = joined.select(
                *key_cols, *[pick[c].alias(c) for c in payload]
            )

        new_version = self._reserve_version()
        rel_dir = f"data/v{new_version}"
        out_dir = os.path.join(self.root, rel_dir)
        # task count: enough for parallelism, not one per bucket — a
        # task writes several bucket dirs via partitionBy; 64 tiny
        # tasks on 2 cores would just pay scheduling overhead.
        default_par = self.spark.sparkContext.defaultParallelism
        n_tasks = max(1, min(len(changed_buckets), default_par * 2))
        (
            winner.repartition(n_tasks, F.col(_BUCKET_COL))
            # clustered layout: each bucket file is key-sorted, so
            # parquet row-group min/max stats are tight on the key —
            # point/range reads inside a bucket skip row groups
            # instead of scanning the whole bucket.  The sort rides
            # the merge's existing shuffle (per-task, no extra
            # exchange); cost is CPU-only and small next to the write.
            .sortWithinPartitions(_BUCKET_COL, *key_cols)
            .write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(out_dir)
        )
        # manifest: changed buckets -> new dir; untouched carried over.
        written = {
            int(p.split("=", 1)[1])
            for p in os.listdir(out_dir)
            if p.startswith(f"{_BUCKET_COL}=")
        }

        # an un-deduped MoR delta may hold several rows per key: the
        # read path must know to resolve even when the bucket stack is
        # a single dir (see _read_buckets' has_deltas gate).  A
        # batch_deduped delta is one-row-per-key by the caller's
        # guarantee, so it never needs the flag.
        undeduped = (
            self.merge_mode == "mor" and skip_batch_dedup and not batch_deduped
        )
        if _stage:
            return StagedEpoch(
                self, manifest, new_version, rel_dir, written,
                changed_buckets,
                dict(epoch=epoch, n_upserts=n_upserts, n_deletes=n_deletes,
                     lsn_lo=lsn_lo, lsn_hi=lsn_hi, t0=t0,
                     extra_lineage=extra_lineage, undeduped=undeduped),
            )
        return self._commit_epoch_with_rebase(
            manifest, new_version, rel_dir, written, changed_buckets,
            epoch, n_upserts, n_deletes, lsn_lo, lsn_hi, t0, extra_lineage,
            undeduped=undeduped,
        )

    @staticmethod
    def _window_one_per_key(up_norm: DataFrame, key_cols: list) -> DataFrame:
        """Max-LSN winner per key via ROW_NUMBER — the hash-free
        reduction merge_epoch uses for un-pre-deduped batches (see the
        call sites for why it beats ``max_by(struct(...))``)."""
        w = Window.partitionBy(*key_cols).orderBy(F.col(_LSN_COL).desc())
        return (
            up_norm.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _staged_bucket_edits(
        self, m: dict, rel_dir: str, written: set, changed_buckets: list[int]
    ) -> dict:
        """The bucket-map delta a staged/merged epoch applies on top of
        manifest ``m`` (CoW replaces the touched buckets' dirs, MoR
        appends its delta dir to their stacks)."""
        b_map = dict(m["buckets"])
        for b in changed_buckets:
            new_dir = f"{rel_dir}/{_BUCKET_COL}={b}"
            if b in written:
                if self.merge_mode == "mor":
                    cur = (
                        self._bucket_dirs(m, str(b))
                        if str(b) in m["buckets"]
                        else []
                    )
                    b_map[str(b)] = [*cur, new_dir]
                else:
                    b_map[str(b)] = [new_dir]
            elif self.merge_mode != "mor":
                # CoW bucket produced no rows (shouldn't happen with
                # tombstones, but keep the manifest consistent).
                b_map.pop(str(b), None)
        return b_map

    def _commit_epoch_with_rebase(
        self,
        base: dict,
        new_version: int,
        rel_dir: str,
        written: set,
        changed_buckets: list[int],
        epoch: int,
        n_upserts: int,
        n_deletes: int,
        lsn_lo,
        lsn_hi,
        t0: float,
        extra_lineage: dict | None,
        undeduped: bool = False,
    ) -> dict:
        # Commit with optimistic rebase: the data write ran once
        # against the BASE snapshot; if another writer committed since,
        # re-point the manifest at the new latest (validated compatible
        # — see _validate_rebase) without touching the data files.
        cur_m = base
        while True:
            rec = self._lineage_record(
                epoch, n_upserts, n_deletes, lsn_lo, lsn_hi, new_version, t0, extra_lineage
            )
            rec["changed_buckets"] = changed_buckets
            rec["parent_version"] = cur_m["version"]
            # persisted so downstream consumers (sources/lakestream)
            # can tell delta-shaped epochs (MoR: data dir == the
            # change set) from CoW rewrites without guessing.
            rec["mode"] = self.merge_mode
            if undeduped:
                # this delta may hold several rows per key — reads of
                # its dirs must resolve even in single-dir stacks.
                rec["undeduped"] = True
            new_m = dict(cur_m)
            new_m["buckets"] = self._staged_bucket_edits(
                cur_m, rel_dir, written, changed_buckets
            )
            new_m["epochs"] = {**cur_m["epochs"], str(epoch): rec}
            new_m["version"] = new_version
            new_m["parent_version"] = cur_m["version"]
            try:
                self._commit_manifest(new_m)
                return rec
            except _StaleParent as sp:
                latest_m = self._load_manifest(sp.latest)
                if str(epoch) in latest_m["epochs"]:
                    dup = dict(latest_m["epochs"][str(epoch)])
                    dup["skipped_duplicate_epoch"] = True
                    self._abandon_version(new_version, rel_dir)
                    return dup
                try:
                    self._validate_rebase(base, latest_m, changed_buckets)
                except ConcurrentCommitError:
                    self._abandon_version(new_version, rel_dir)
                    raise
                if new_version <= sp.latest:
                    # a later-committed writer took a higher number:
                    # renumber so the write ordinal (MoR equal-LSN
                    # tie-break) stays ordered by COMMIT order.
                    n2 = self._reserve_version()
                    if rel_dir is not None:  # None: zero-row commit
                        os.rename(
                            os.path.join(self.root, f"data/v{new_version}"),
                            os.path.join(self.root, f"data/v{n2}"),
                        )
                        rel_dir = f"data/v{n2}"
                    # the old number is deliberately abandoned — drop
                    # its reservation so it reads as debris, not as a
                    # live in-flight write.
                    try:
                        os.remove(
                            os.path.join(
                                self._manifest_dir, f".reserve.v{new_version}"
                            )
                        )
                    except FileNotFoundError:
                        pass
                    new_version = n2
                cur_m = latest_m

    def _validate_rebase(
        self, base: dict, latest: dict, changed_buckets: list[int]
    ) -> None:
        """Decide whether a merge computed against ``base`` may commit
        on top of ``latest`` (written by concurrent committers) without
        re-running.  Raises ConcurrentCommitError when it may not."""
        for fld in (
            "schema",
            "renames",
            "dropped",
            "key_cols",
            "n_buckets",
            "partial_columnar",
            "columnar_compact_lsn_watermark",
        ):
            if base.get(fld) != latest.get(fld):
                raise ConcurrentCommitError(
                    f"concurrent commit changed {fld!r} between snapshot "
                    f"{base['version']} and {latest['version']}; re-run "
                    "the merge against the current snapshot"
                )
        for b in changed_buckets:
            old_d = self._bucket_dirs(base, str(b)) if str(b) in base["buckets"] else []
            new_d = (
                self._bucket_dirs(latest, str(b)) if str(b) in latest["buckets"] else []
            )
            if self.merge_mode != "mor":
                # CoW winners were computed FROM these buckets' contents
                # — any concurrent change to them invalidates the merge.
                if old_d != new_d:
                    raise ConcurrentCommitError(
                        f"concurrent commit rewrote bucket {b} read by "
                        f"this CoW merge (snapshot {base['version']} -> "
                        f"{latest['version']}); re-run the merge against "
                        "the current snapshot"
                    )
            elif new_d[: len(old_d)] != old_d:
                # MoR deltas commute with other APPENDS (read-time
                # max-(lsn, write-version) resolution), but a concurrent
                # compact/rebucket REPLACED the stack this delta's
                # ordinal orders against.
                raise ConcurrentCommitError(
                    f"concurrent maintenance rewrote bucket {b}'s delta "
                    f"stack (snapshot {base['version']} -> "
                    f"{latest['version']}); re-run the merge against the "
                    "current snapshot"
                )

    def stage_epoch(
        self,
        updates: DataFrame,
        epoch: int,
        op_col: str = "op",
        lsn_col: str = "lsn",
        extra_lineage: dict | None = None,
        stats: dict | None = None,
        skip_batch_dedup: bool = False,
        batch_deduped: bool = False,
    ) -> "StagedEpoch":
        """WRITE-AUDIT-PUBLISH: run the full merge compute + data
        write for ``epoch`` WITHOUT committing, and return a
        ``StagedEpoch`` handle.  ``handle.read()`` is the exact
        post-publish table state (the audit surface), ``publish()``
        commits it atomically through the same CAS/rebase path as
        ``merge_epoch``, ``discard()`` drops the staged files.

        This is the ingest quality gate at scale: audits run against
        the REAL merged result once, and publishing is a pure
        metadata commit — no second merge, no window where readers
        see unaudited rows."""
        self._require_main("stage_epoch")
        return self.merge_epoch(
            updates, epoch, op_col=op_col, lsn_col=lsn_col,
            extra_lineage=extra_lineage, stats=stats,
            skip_batch_dedup=skip_batch_dedup,
            batch_deduped=batch_deduped, _stage=True,
        )

    def merge_epoch_partial(
        self,
        updates: DataFrame,
        epoch: int,
        op_col: str = "op",
        lsn_col: str = "lsn",
        changed_cols_col: str | None = None,
        reset_col: str | None = None,
        extra_lineage: dict | None = None,
    ) -> dict:
        """MERGE a PARTIAL-IMAGE change batch (binlog
        ``row_image=MINIMAL``: each update row carries only the
        columns it sets — the rest are NULL, or enumerated in
        ``changed_cols_col`` when explicit NULL-sets must be
        distinguishable).  The Iceberg analogue is ``MERGE INTO ...
        WHEN MATCHED THEN UPDATE SET <specific columns>``.

        The batch must be one row per key (``operators.dedup.
        fold_partial_updates`` output).  Each row is HYDRATED to a
        full image against the key's current table state, then the
        hydrated batch flows through the standard ``merge_epoch``
        (same idempotent manifest commit, MoR/CoW strategies, stats,
        lineage) — so replays, crash-resume and schema evolution all
        behave identically to full-image merges.  Hydration is safe
        to replay: the manifest is untouched until the inner commit,
        so a crashed epoch re-hydrates against the identical
        pre-epoch snapshot.

        Plan shape: the previous images are read ONLY from the
        batch's changed buckets (manifest pruning) and pre-filtered
        with a BROADCAST semi-join on the batch keys — the table side
        never shuffles; the surviving previous rows (≤ batch size)
        broadcast into the hydration join, so the whole hydration
        adds zero wide shuffles to the merge.

        ORDERING CAVEAT: per-column folding assumes epochs apply in
        LSN order per key (the pipeline's contract).  An
        out-of-order replayed LOWER-LSN partial row loses whole-row
        to the table's max-LSN rule — state never regresses, but that
        row's columns are not re-folded (true per-column merging
        across out-of-order epochs would need per-column LSNs).
        """
        manifest = self._load_manifest()
        if str(epoch) in manifest["epochs"]:
            rec = dict(manifest["epochs"][str(epoch)])
            rec["skipped_duplicate_epoch"] = True
            return rec
        hydrated = self.hydrate_partial(
            updates, op_col=op_col, lsn_col=lsn_col,
            changed_cols_col=changed_cols_col, reset_col=reset_col,
        )
        extra = {"partial_image": True, **(extra_lineage or {})}
        # pin the snapshot the hydration read: a commit landing between
        # here and the inner merge's own manifest load would otherwise
        # slip past the CAS (the hydrated images would be stale).
        return self.merge_epoch(
            hydrated, epoch, op_col=op_col, lsn_col=lsn_col, extra_lineage=extra,
            computed_on_version=manifest["version"],
        )

    # hydration join strategy gate: batches at or below this many rows
    # broadcast (keys for the semi prefilter, then the surviving
    # previous rows — ≤ batch size) so the table side never shuffles;
    # above it (backfill/batch≈keyspace: broadcasting the table's
    # worth of previous images would OOM the driver at 10^10 keys) the
    # hydration falls back to one shuffled hash join, no prefilter
    # (it would remove ~nothing and shuffle prev twice).
    _HYDRATE_BROADCAST_MAX_ROWS = 500_000

    def hydrate_partial(
        self,
        updates: DataFrame,
        op_col: str = "op",
        lsn_col: str = "lsn",
        changed_cols_col: str | None = None,
        reset_col: str | None = None,
        batch_rows: int | None = None,
    ) -> DataFrame:
        """Reconstruct FULL row images from a partial-image batch by
        per-column coalescing against each key's current table state
        (see ``merge_epoch_partial`` — this is its hydration stage,
        exposed so callers can hydrate BEFORE enrichment stages that
        need complete rows, e.g. the pipeline's concept mapping).

        Returns ``[*key_cols, *schema value cols, lsn, op]``.  Reads
        only the batch's changed buckets.  Join strategy is gated on
        the batch size (``batch_rows`` if the caller knows it, else a
        Catalyst plan-statistics estimate): steady-state micro-batches
        broadcast (table side stays scan-local, zero wide shuffles);
        corpus-sized batches take one shuffled hash join instead —
        broadcasting ~keyspace worth of previous images is a
        driver-killer at 10^10 keys.  Pure transformation — no
        commit, safe to re-run.
        """
        manifest = self._load_manifest()
        key_cols = manifest["key_cols"]
        schema = manifest["schema"]

        up = updates
        for old, new in manifest["renames"].items():
            if old in up.columns and new not in up.columns:
                up = up.withColumnRenamed(old, new)
        value_cols = [c for c in schema if c not in key_cols]

        bks = (
            up.select(self.bucket_expr(key_cols).alias("b"))
            .distinct()
            .collect()
        )
        changed = sorted(int(r["b"]) for r in bks)
        if not changed:
            # empty batch — project to the output shape and pass
            # through (the caller's merge records a zero-row commit).
            return up.select(
                *key_cols,
                *[
                    (F.col(c) if c in up.columns else F.lit(None)).cast(schema[c]).alias(c)
                    for c in value_cols
                ],
                F.col(lsn_col),
                F.col(op_col),
            )
        prev = self.read(bucket_ids=changed)
        if batch_rows is None:
            from etl_cms_spark.operators.dedup import _estimated_rows

            batch_rows = _estimated_rows(up)
        if batch_rows <= self._HYDRATE_BROADCAST_MAX_ROWS:
            keys_only = up.select(*key_cols).distinct()
            prev_hit = prev.join(F.broadcast(keys_only), list(key_cols), "leftsemi")
            prev_t = prev_hit.select(
                *key_cols,
                F.struct(*[F.col(c) for c in value_cols if c in prev_hit.columns]).alias("_prev"),
            )
            joined = up.join(F.broadcast(prev_t), list(key_cols), "left")
        else:
            prev_t = prev.select(
                *key_cols,
                F.struct(*[F.col(c) for c in value_cols if c in prev.columns]).alias("_prev"),
            )
            joined = up.join(prev_t.hint("SHUFFLE_HASH"), list(key_cols), "left")
        if reset_col and reset_col in up.columns:
            # the key was deleted (and possibly re-created) WITHIN the
            # batch — fold_partial_updates(reset_col=...) marked it;
            # its pre-batch image is invalid, hydrate from scratch.
            joined = joined.withColumn(
                "_prev", F.when(~F.col(reset_col), F.col("_prev"))
            )

        def fold(c: str):
            new_v = F.col(c) if c in up.columns else F.lit(None).cast(schema[c])
            old_v = F.col(f"_prev.{c}")
            if changed_cols_col and changed_cols_col in up.columns:
                set_here = F.array_contains(F.col(changed_cols_col), F.lit(c))
                v = F.when(F.col("_prev").isNull(), new_v).when(set_here, new_v).otherwise(old_v)
            else:
                v = F.when(F.col("_prev").isNull(), new_v).otherwise(
                    F.coalesce(new_v, old_v)
                )
            # a delete row's payload is ignored by the tombstone —
            # don't drag previous values through it.
            return F.when(F.col(op_col) == "D", new_v).otherwise(v).alias(c)

        return joined.select(
            *key_cols,
            *[fold(c) for c in value_cols],
            F.col(lsn_col),
            F.col(op_col),
        )

    def append_partial_epoch(
        self,
        updates: DataFrame,
        epoch: int,
        op_col: str = "op",
        lsn_col: str = "lsn",
        fold_batch: bool = True,
        extra_lineage: dict | None = None,
    ) -> dict:
        """MERGE a partial-image batch into a COLUMNAR merge-on-read
        table (``create(partial_columnar=True)``) — the ORDER-
        INDEPENDENT alternative to ``merge_epoch_partial``.

        No table read at merge time at all: the batch is folded to
        one row per key (plus an explicit tombstone row at each key's
        max delete LSN, so a mid-batch delete-reset survives as data)
        and APPENDED as a delta through the standard idempotent
        ``merge_epoch`` append path.  Read/compaction resolve each
        column independently to its latest present value by
        (lsn, write-version), tombstone-gated — so ANY application
        order of the epochs converges to the same state (per-column
        LWW; the fold depends only on the delta-row multiset).  This
        removes ``merge_epoch_partial``'s in-order contract at the
        price of read amplification until compaction — the same
        CoW/MoR trade the whole-row modes make, one level deeper.

        The order freedom is bounded by COMPACTION: collapsing the
        delta stack discards each column's setting-LSN, so epochs
        reaching below the compaction LSN watermark are rejected —
        drain the out-of-order window before compacting (see
        ``compact``).

        ``fold_batch`` picks the delta granularity:
        * True (default) — one folded row per key (+ tombstones).
          The fold promotes each column's setting-LSN to the key's
          batch-max LSN, which is exact ONLY when epoch LSN ranges
          are DISJOINT (the changelog-slicing contract) — a batch
          whose raw LSN range overlaps an already-committed epoch's
          is REJECTED rather than silently mis-ordered
          (code-review finding).
        * False — raw per-event delta rows: every column keeps its
          true setting-LSN, so even INTERLEAVED epoch ranges (multi-
          producer feeds) converge exactly, at the price of
          event-count (not key-count) read amplification until
          compaction.
        """
        if self.merge_mode != "mor":
            raise ValueError("append_partial_epoch requires merge_mode='mor'")
        manifest = self._load_manifest()
        if not manifest.get("partial_columnar"):
            raise ValueError(
                "table was not created with partial_columnar=True — "
                "whole-row read resolution would return partial images"
            )
        if str(epoch) in manifest["epochs"]:
            rec = dict(manifest["epochs"][str(epoch)])
            rec["skipped_duplicate_epoch"] = True
            return rec
        lo, hi = updates.agg(
            F.min(F.col(lsn_col)), F.max(F.col(lsn_col))
        ).first()
        wm = manifest.get("columnar_compact_lsn_watermark")
        if wm is not None and lo is not None and int(lo) <= int(wm):
            raise ValueError(
                f"epoch {epoch} reaches lsn {lo} at or below the "
                f"compaction watermark {wm}: per-column ordering "
                "against compacted values is no longer possible — "
                "apply out-of-order epochs before compacting (see "
                "compact() docstring)"
            )
        if fold_batch and lo is not None:
            # the fold stamps every column with the key's batch-max
            # LSN — exact only if this batch's raw LSN range is
            # disjoint from every committed epoch's.
            for eid, rec in manifest["epochs"].items():
                rlo = rec.get("raw_lsn_lo", rec.get("lsn_min"))
                rhi = rec.get("raw_lsn_hi", rec.get("lsn_max"))
                if rlo is None or rhi is None:
                    continue
                if int(lo) <= int(rhi) and int(hi) >= int(rlo):
                    raise ValueError(
                        f"epoch {epoch} (lsn {lo}..{hi}) overlaps "
                        f"committed epoch {eid} (lsn {rlo}..{rhi}): the "
                        "folded delta would mis-order interleaved "
                        "columns — use fold_batch=False for "
                        "interleaved/multi-producer feeds"
                    )
        key_cols = manifest["key_cols"]

        if fold_batch:
            from etl_cms_spark.operators.dedup import fold_partial_updates

            folded = fold_partial_updates(
                updates, key_cols, lsn_col, op_col=op_col, del_lsn_col="_del_lsn"
            )
            value_cols = [c for c in folded.columns
                          if c not in key_cols and c not in (lsn_col, op_col, "_del_lsn")]
            upserts = folded.where(F.col(op_col) == "U").drop("_del_lsn")
            tombs = (
                folded.where(F.col("_del_lsn").isNotNull())
                .select(
                    *key_cols,
                    *[F.lit(None).cast(folded.schema[c].dataType).alias(c) for c in value_cols],
                    F.col("_del_lsn").alias(lsn_col),
                    F.lit("D").alias(op_col),
                )
            )
            delta = upserts.unionByName(tombs)
        else:
            # raw per-event delta: every column keeps its true
            # setting-LSN; delete events become tombstone rows through
            # the merge's own op-column handling.
            delta = updates
        extra = {
            "partial_columnar": True,
            "raw_lsn_lo": lo,
            "raw_lsn_hi": hi,
            **(extra_lineage or {}),
        }
        # skip_batch_dedup: the delta legitimately holds up to two rows
        # per key (tombstone + re-create) — read-time fold resolves.
        return self.merge_epoch(
            delta, epoch, op_col=op_col, lsn_col=lsn_col,
            extra_lineage=extra, skip_batch_dedup=True,
        )

    # lossless type promotions (Iceberg's schema-evolution rules):
    # anything else would silently truncate old data on read.
    _WIDENINGS = {
        ("short", "int"), ("short", "long"), ("short", "double"),
        ("int", "long"), ("int", "double"),
        ("long", "double"),
        ("float", "double"),
    }

    def apply_schema_change(self, change: dict, epoch: int | None = None) -> None:
        """``{"add": "name:type"}``, ``{"rename": "old:new"}``,
        ``{"widen": "name:type"}`` or ``{"drop": "name"}`` —
        metadata-only commit, no data rewrite (Iceberg-style).
        ``widen`` promotes a column to a wider type from the
        allowlisted lossless set; physical files keep the old type and
        ``_normalize`` casts on read, exactly like renames.  ``drop``
        removes the column from the logical schema without touching
        data files: every physical name that currently resolves to it
        is recorded in the manifest's ``dropped`` map with THIS
        commit's snapshot version, and the read path hides those
        physical columns only in write groups older than that version
        — so time travel to a pre-drop snapshot still sees the data,
        and a later re-``add`` of the same name starts from NULLs
        instead of resurrecting dropped values (the version check is
        the field-id-free analogue of Iceberg's field-id rule that a
        reused name never rebinds to old column data)."""
        self._require_main("apply_schema_change")
        manifest = self._load_manifest()
        dropped_phys: set[str] = set()
        if "drop" in change:
            name = change["drop"]
            if name in manifest["key_cols"]:
                raise ValueError(f"drop: {name!r} is a key column")
            if name not in manifest["schema"]:
                return  # already dropped — idempotent on replay
            del manifest["schema"][name]
            # every physical spelling of this logical column: the
            # current name plus any pre-rename names still on disk.
            dropped_phys = {name} | {
                p for p, l in manifest["renames"].items() if l == name
            }
            manifest["renames"] = {
                p: l for p, l in manifest["renames"].items() if l != name
            }
        elif "widen" in change:
            name, typ = change["widen"].split(":", 1)
            cur = manifest["schema"].get(name)
            if cur is None:
                raise ValueError(f"widen: no such column {name!r}")
            if cur != typ:
                if (cur, typ) not in self._WIDENINGS:
                    raise ValueError(
                        f"widen {name}: {cur} -> {typ} is not a lossless "
                        f"promotion (allowed: {sorted(self._WIDENINGS)})"
                    )
                manifest["schema"][name] = typ
        elif "add" in change:
            name, typ = change["add"].split(":", 1)
            if name not in manifest["schema"]:
                manifest["schema"][name] = typ
        elif "rename" in change:
            old, new = change["rename"].split(":", 1)
            if old in manifest["key_cols"]:
                # key_cols, bucket hashing and every consumer's join
                # logic are keyed by name; a silent schema-only rename
                # would desynchronize them (schema would say `new`
                # while key_cols still said `old`).
                raise ValueError(f"rename: {old!r} is a key column")
            if (
                old in manifest["schema"]
                and new in manifest["schema"]
                and new != old
            ):
                raise ValueError(f"rename: target {new!r} already exists")
            if old in manifest["schema"]:
                manifest["schema"] = {
                    (new if k == old else k): v for k, v in manifest["schema"].items()
                }
                # chain renames: physical files may carry any older name.
                manifest["renames"] = {
                    p: (new if l == old else l) for p, l in manifest["renames"].items()
                }
                manifest["renames"][old] = new
        else:
            raise ValueError(f"unsupported schema change: {change}")
        parent = manifest["version"]
        manifest["version"] = self._reserve_version()
        manifest["parent_version"] = parent
        if dropped_phys:
            d = dict(manifest.get("dropped", {}))
            for p in dropped_phys:
                # latest drop wins: files written before THIS version
                # hide the column; re-added data (written later) shows.
                d[p] = manifest["version"]
            manifest["dropped"] = d
        if epoch is not None:
            manifest["epochs"].setdefault(
                str(epoch),
                {
                    "epoch": epoch,
                    "schema_change": change,
                    "snapshot_version": manifest["version"],
                    "parent_version": parent,
                },
            )
        try:
            self._commit_manifest(manifest)
        except _StaleParent as sp:
            self._abandon_version(manifest["version"], None)
            raise ConcurrentCommitError(
                f"concurrent commit (now at snapshot {sp.latest}) raced "
                "this schema change; re-run it against the current snapshot"
            ) from None

    def max_delta_depth(self) -> int:
        """Deepest base+delta stack over all buckets — the read-side
        amplification MoR accumulates between compactions (a read of a
        bucket merges this many file sets).  Drives the depth-based
        compaction policy in CDCPipeline."""
        return max(self.delta_depths().values(), default=1)

    def delta_depths(self) -> dict[int, int]:
        """Per-bucket base+delta stack depth (pure manifest arithmetic,
        no Spark job, no filesystem listing) — the input for SELECTIVE
        compaction: at 10^4 buckets a handful of hot keys deepen a few
        buckets while the rest sit at depth 1-2, and folding only the
        deep ones makes maintenance O(hot data) instead of O(table)."""
        m = self._load_manifest()
        return {int(b): len(self._bucket_dirs(m, b)) for b in m["buckets"]}

    def compact(
        self,
        expire_tombstones: bool = False,
        cluster_by: list[str] | None = None,
        buckets: list[int] | None = None,
        cluster_layout: str = "linear",
        target_file_rows: int | None = None,
        expire_tombstones_below: int | None = None,
    ) -> dict:
        """Fold merge-on-read deltas back into one base file set per
        bucket (Iceberg-style maintenance).  Winners are resolved with
        the same max-LSN rule reads use, so compaction never changes
        query results — property-tested in tests/test_lake_modes.py.

        Tombstones are kept by default (they guard replays of older
        epochs); pass ``expire_tombstones=True`` once the replay
        horizon has passed them.

        ``expire_tombstones_below=L`` is the BOUNDED form — the
        production retention rule (Kafka compaction's
        delete.retention, Iceberg's delete-file expiry): drop only
        tombstones whose ``_lsn < L``, keep every younger one.  A
        delete-heavy changelog otherwise grows the table with one
        marker row per ever-deleted key forever; full expiry
        (``expire_tombstones=True``) is only safe once NO out-of-order
        source remains anywhere.  The safe horizon L is the minimum
        LSN that can still arrive out of order: the oldest chained
        consumer's pacing floor, the quarantine repair horizon
        (quarantined rows re-offer at their ORIGINAL LSNs — take the
        min over undrained quarantine epochs), and any columnar
        out-of-order window.  A tombstone at ``_lsn >= L`` still
        guards those; one below L can no longer be outranked into a
        resurrection by anything the horizon admits.

        ``cluster_by``: optional VALUE-COLUMN clustering (the Z-order/
        sort-cluster maintenance knob).  Buckets hash-partition by
        key, so a secondary predicate (``lang = 'go'``) normally
        overlaps every row group in every bucket; sorting each bucket
        file by (cluster_by, key) instead of (key) makes parquet
        row-group min/max stats TIGHT on those columns, and Spark's
        pushed filters then skip whole row groups — the 100 TB answer
        to selective scans on non-key columns.  The trade, explicit:
        key-column stats loosen within each cluster value, so point
        lookups scan proportionally more row groups per bucket
        (``lookup`` stays correct — stats pruning is best-effort by
        construction).  Compaction is the cheapest moment to
        (re)establish either layout; the choice is sticky only until
        the next compact() call.

        ``cluster_layout``: ``"linear"`` (default) sorts
        lexicographically by (cluster_by, key) — tight stats on the
        LEADING cluster column only.  ``"zorder"`` sorts by a Morton
        interleave of per-column rank indices
        (functions/zorder.zorder_key), so EVERY clustered column gets
        bounded min/max per row group — the multi-predicate layout
        (Delta/Iceberg ``OPTIMIZE ZORDER BY``).  Costs one extra
        bounded approxQuantile pass over the buckets being rewritten;
        measured A/B in tests/test_zorder.py: with a high-cardinality
        leading column, the second column's row-group overlap drops
        from 100% (linear) to a fraction, while the leading column
        keeps useful (coarser) pruning.

        ``target_file_rows``: cap rows per output FILE
        (``maxRecordsPerFile``) so each bucket dir holds several
        files, each covering a contiguous slice of the sort order —
        with clustering that makes per-FILE stats tight, which is
        what the PLANNING-time pruner (sink/stats.py ``read_where``)
        skips on; without it a compacted bucket is one file spanning
        the full value range and only row-group pruning can help.

        COLUMNAR tables additionally record a compaction LSN
        WATERMARK (the max lsn_hi of the epochs committed so far):
        the per-column fold is order-independent only while every
        column's setting-LSN is still materialized in the delta
        stack — compaction collapses each key to its folded values,
        so a not-yet-applied epoch with LSNs below the watermark
        could no longer be ordered against them per column.
        ``append_partial_epoch`` rejects such epochs; compact a
        columnar table only once the out-of-order window has
        drained past it (the streaming/batch drivers apply in order,
        where this is automatic)."""
        self._require_main("compact")
        t0 = time.time()
        manifest = self._load_manifest()
        unknown = [c for c in (cluster_by or []) if c not in manifest["schema"]]
        if unknown:
            raise ValueError(f"cluster_by: no such columns {unknown}")
        if cluster_layout not in ("linear", "zorder"):
            raise ValueError(
                f"cluster_layout must be 'linear' or 'zorder', got {cluster_layout!r}"
            )
        if cluster_layout == "zorder" and not cluster_by:
            raise ValueError("cluster_layout='zorder' requires cluster_by")
        if manifest.get("partial_columnar"):
            his = [
                rec.get("lsn_max")
                for rec in manifest["epochs"].values()
                if rec.get("lsn_max") is not None
            ]
            if his:
                manifest["columnar_compact_lsn_watermark"] = max(
                    int(h) for h in his
                )
        expiring = expire_tombstones or expire_tombstones_below is not None
        delta_buckets = [
            b for b in manifest["buckets"] if len(self._bucket_dirs(manifest, b)) > 1
        ]
        # tombstone expiry must visit EVERY bucket (tombstones live in
        # delta-free buckets too — CoW tables have no deltas at all);
        # plain compaction only folds the buckets that carry deltas.
        target_buckets = sorted(manifest["buckets"]) if expiring else delta_buckets
        if buckets is not None:
            # SELECTIVE compaction: fold only the requested buckets —
            # the O(hot data) maintenance path (delta_depths() picks
            # them).  With expire_tombstones, expiry applies only to
            # the selected buckets; buckets are independent key
            # domains, so per-bucket expiry is exactly per-bucket
            # replay-horizon narrowing, nothing cross-bucket.
            unknown_b = [b for b in buckets if str(b) not in manifest["buckets"]]
            if unknown_b:
                raise ValueError(f"compact(buckets=...): no such buckets {unknown_b}")
            chosen = {str(b) for b in buckets}
            target_buckets = [b for b in target_buckets if b in chosen]
        if not target_buckets:
            return {"compacted_buckets": 0, "seconds": 0.0}
        resolved = self._read_buckets(manifest, [int(b) for b in target_buckets])
        if expire_tombstones:
            resolved = resolved.where(~F.col(_DELETED_COL))
        elif expire_tombstones_below is not None:
            resolved = resolved.where(
                ~F.col(_DELETED_COL)
                | (F.col(_LSN_COL) >= F.lit(int(expire_tombstones_below)))
            )
        if cluster_layout == "zorder":
            from etl_cms_spark.functions.zorder import zorder_key

            resolved = resolved.withColumn(
                "_zcluster", zorder_key(resolved, list(cluster_by))
            )
            sort_cols: list = [_BUCKET_COL, "_zcluster", *manifest["key_cols"]]
        else:
            sort_cols = [_BUCKET_COL, *(cluster_by or []), *manifest["key_cols"]]
        new_version = self._reserve_version()
        rel_dir = f"data/v{new_version}-compact"
        out_dir = os.path.join(self.root, rel_dir)
        default_par = self.spark.sparkContext.defaultParallelism
        n_tasks = max(1, min(self.n_buckets, default_par * 2))
        (
            resolved.repartition(n_tasks, F.col(_BUCKET_COL))
            # compaction rewrites whole buckets — the cheapest moment
            # to (re)establish the clustered layout: key-sorted by
            # default (tight key stats for point lookups), or
            # value-clustered (linear or z-order) when cluster_by asks
            # for predicate row-group pruning (see docstring).  The
            # z key is dropped before the write: it exists only to
            # order rows, the pruning evidence lives in the data
            # columns' own footer stats.
            .sortWithinPartitions(*sort_cols)
            .drop("_zcluster")
            .write.mode("overwrite")
            .option(
                "maxRecordsPerFile", int(target_file_rows or 0)
            )  # 0 = unlimited (Spark default)
            .partitionBy(_BUCKET_COL)
            .parquet(out_dir)
        )
        written = {
            int(p.split("=", 1)[1])
            for p in os.listdir(out_dir)
            if p.startswith(f"{_BUCKET_COL}=")
        }
        for b in target_buckets:
            if int(b) in written:
                manifest["buckets"][b] = [f"{rel_dir}/{_BUCKET_COL}={int(b)}"]
            else:
                # bucket held only tombstones that just expired.
                manifest["buckets"].pop(b, None)
        parent = manifest["version"]
        manifest["version"] = new_version
        manifest["parent_version"] = parent
        try:
            self._commit_manifest(manifest)
        except _StaleParent as sp:
            self._abandon_version(new_version, rel_dir)
            raise ConcurrentCommitError(
                f"concurrent commit (now at snapshot {sp.latest}) raced "
                "this compaction; re-run it against the current snapshot"
            ) from None
        return {
            "compacted_buckets": len(target_buckets),
            "snapshot_version": new_version,
            "cluster_layout": cluster_layout if cluster_by else None,
            "seconds": round(time.time() - t0, 2),
        }

    def rebucket(self, new_n_buckets: int) -> dict:
        """Bucket-count EVOLUTION (the Iceberg partition-spec-evolution
        analog): rewrite the current rows into ``new_n_buckets`` hash
        buckets as a fresh snapshot.  A table sized for last year's
        volume concentrates too many keys per bucket as it grows —
        merge tasks and bucket-pruned reads both degrade — and the
        bucket count is baked into every file's placement, so growing
        it is necessarily one bounded full rewrite (paid once,
        amortized over every epoch after).

        Guarantees:
        * tombstones are carried over — replays of older epochs still
          resolve against their LSNs, so exactly-once survives the
          boundary;
        * prior versions stay readable under THEIR OWN bucket count
          (each snapshot's manifest records its ``n_buckets`` and the
          read path buckets rows per-manifest), so time travel and
          ``changes_between`` across the boundary stay correct;
        * like ``compact``, this is a maintenance commit: no epoch
          record, so CDC-out per epoch is unaffected (any epoch's
          (v-1, v) pair lies entirely on one side of the boundary).

        A producer-BUCKETED changelog aligned to the old count keeps
        working but loses its Exchange-free co-bucketing until the
        producer re-buckets to match (the merge recomputes bucket ids
        itself, so only the shuffle saving is lost, never
        correctness).
        """
        self._require_main("rebucket")
        t0 = time.time()
        manifest = self._load_manifest()
        old_n = int(manifest.get("n_buckets", self.n_buckets))
        if int(new_n_buckets) == old_n:
            return {
                "snapshot_version": manifest["version"],
                "n_buckets": old_n,
                "skipped_noop": True,
            }
        resolved = self._read_buckets(manifest, None)  # tombstones included
        key_cols = manifest["key_cols"]
        resolved = resolved.withColumn(
            _BUCKET_COL, self.bucket_expr(key_cols, int(new_n_buckets))
        )
        new_version = self._reserve_version()
        rel_dir = f"data/v{new_version}-rebucket"
        out_dir = os.path.join(self.root, rel_dir)
        default_par = self.spark.sparkContext.defaultParallelism
        n_tasks = max(1, min(int(new_n_buckets), default_par * 2))
        (
            resolved.repartition(n_tasks, F.col(_BUCKET_COL))
            .sortWithinPartitions(_BUCKET_COL, *key_cols)
            .write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(out_dir)
        )
        written = {
            int(p.split("=", 1)[1])
            for p in os.listdir(out_dir)
            if p.startswith(f"{_BUCKET_COL}=")
        }
        manifest["buckets"] = {
            str(b): [f"{rel_dir}/{_BUCKET_COL}={b}"] for b in sorted(written)
        }
        manifest["n_buckets"] = int(new_n_buckets)
        if manifest.get("partial_columnar"):
            # the rewrite collapses the delta stack exactly like
            # compact() — record the same LSN watermark, or a not-yet-
            # applied older epoch could silently lose the per-column
            # ordering compact() protects against.
            his = [
                rec.get("lsn_max")
                for rec in manifest["epochs"].values()
                if rec.get("lsn_max") is not None
            ]
            if his:
                manifest["columnar_compact_lsn_watermark"] = max(
                    int(h) for h in his
                )
        parent = manifest["version"]
        manifest["version"] = new_version
        manifest["parent_version"] = parent
        try:
            self._commit_manifest(manifest)
        except _StaleParent as sp:
            self._abandon_version(new_version, rel_dir)
            raise ConcurrentCommitError(
                f"concurrent commit (now at snapshot {sp.latest}) raced "
                "this rebucket; re-run it against the current snapshot"
            ) from None
        self.n_buckets = int(new_n_buckets)
        return {
            "snapshot_version": new_version,
            "n_buckets": int(new_n_buckets),
            "old_n_buckets": old_n,
            "seconds": round(time.time() - t0, 2),
        }

    @staticmethod
    def _lineage_record(epoch, n_upserts, n_deletes, lsn_lo, lsn_hi, version, t0, extra):
        dt = time.time() - t0
        rec = {
            "epoch": epoch,
            "rows_upserted": n_upserts,
            "rows_deleted": n_deletes,
            "lsn_min": lsn_lo,
            "lsn_max": lsn_hi,
            "snapshot_version": version,
            "merge_seconds": round(dt, 3),
            "events_per_sec": round((n_upserts + n_deletes) / dt, 1) if dt > 0 else None,
        }
        if extra:
            rec.update(extra)
        return rec


class StagedEpoch:
    """A WRITE-AUDIT-PUBLISH staged merge (Iceberg's WAP pattern,
    ``LakeTable.stage_epoch``): the epoch's data files are written and
    its manifest delta computed, but NOTHING is reader-visible until
    ``publish()`` runs the same CAS/rebase commit a direct
    ``merge_epoch`` uses.  ``read()`` exposes the WOULD-BE post-publish
    state so data-quality audits run against the real merged result —
    not a re-derivation that could drift from what actually lands —
    and ``discard()`` drops the staged files without ever committing.

    The staged snapshot stays valid across concurrent commits exactly
    as far as a direct merge would: ``publish()`` rebases when the
    interleaved commits commute (MoR appends, disjoint CoW buckets)
    and raises ``ConcurrentCommitError`` otherwise."""

    def __init__(
        self,
        table: LakeTable,
        base: dict,
        new_version: int | None,
        rel_dir: str | None,
        written: set,
        changed_buckets: list[int],
        rec_args: dict,
        dup_rec: dict | None = None,
    ):
        self._table = table
        self._base = base
        self._new_version = new_version
        self._rel_dir = rel_dir
        self._written = written
        self._changed_buckets = changed_buckets
        self._rec_args = rec_args
        self._dup_rec = dup_rec
        self._published: dict | None = None
        self._discarded = False

    @property
    def epoch(self) -> int:
        return self._rec_args["epoch"]

    @property
    def already_committed(self) -> bool:
        """True when the epoch was already in the manifest at staging
        time — publish() is then the usual exactly-once no-op."""
        return self._dup_rec is not None

    @property
    def published(self) -> bool:
        return self._published is not None

    def summary(self) -> dict:
        """Audit-cheap stats of the staged batch (no jobs)."""
        if self._dup_rec is not None:
            return dict(self._dup_rec)
        return {
            "epoch": self._rec_args["epoch"],
            "rows_upserted": self._rec_args["n_upserts"],
            "rows_deleted": self._rec_args["n_deletes"],
            "lsn_min": self._rec_args["lsn_lo"],
            "lsn_max": self._rec_args["lsn_hi"],
            "changed_buckets": list(self._changed_buckets),
            "staged_version": self._new_version,
        }

    def _staged_manifest(self) -> dict:
        m = dict(self._base)
        m["buckets"] = self._table._staged_bucket_edits(
            self._base, self._rel_dir, self._written, self._changed_buckets
        )
        if self._rec_args.get("undeduped"):
            # the audit read must resolve this staged delta's dirs
            # even in single-dir stacks, exactly as the published
            # epoch record will instruct (see _read_buckets).
            m["epochs"] = {
                **m["epochs"],
                str(self._rec_args["epoch"]): {
                    "snapshot_version": self._new_version,
                    "undeduped": True,
                },
            }
        return m

    def read(self, bucket_ids: list[int] | None = None) -> DataFrame:
        """The table state publish() would produce (tombstones
        filtered, system columns dropped) — the audit surface."""
        if self._discarded:
            raise ValueError("staged epoch was discarded")
        if self._dup_rec is not None:
            return self._table.read(bucket_ids)
        df = self._table._read_buckets(self._staged_manifest(), bucket_ids)
        return df.where(~F.col(_DELETED_COL)).drop(
            _LSN_COL, _BUCKET_COL, _DELETED_COL
        )

    def publish(self) -> dict:
        """Commit the staged epoch (idempotent: repeated calls return
        the first result; an epoch committed by someone else in the
        meantime returns their record with skipped_duplicate_epoch)."""
        if self._discarded:
            raise ValueError("staged epoch was discarded")
        if self._dup_rec is not None:
            return dict(self._dup_rec)
        if self._published is None:
            a = self._rec_args
            self._published = self._table._commit_epoch_with_rebase(
                self._base, self._new_version, self._rel_dir, self._written,
                self._changed_buckets, a["epoch"], a["n_upserts"],
                a["n_deletes"], a["lsn_lo"], a["lsn_hi"], a["t0"],
                a["extra_lineage"], undeduped=a.get("undeduped", False),
            )
        return self._published

    def discard(self) -> None:
        """Drop the staged (never-visible) data files and release the
        version reservation."""
        import shutil

        if self._published is not None:
            raise ValueError("staged epoch was already published")
        self._discarded = True
        if self._rel_dir is not None:
            shutil.rmtree(
                os.path.join(self._table.root, self._rel_dir),
                ignore_errors=True,
            )
        if self._new_version is not None:
            try:
                os.remove(
                    os.path.join(
                        self._table._manifest_dir,
                        f".reserve.v{self._new_version}",
                    )
                )
            except FileNotFoundError:
                pass
