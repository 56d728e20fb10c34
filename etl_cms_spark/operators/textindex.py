"""Epoch-incremental MinHash-LSH text-dedup index — dedup-at-ingest
for the CDC loop.

A 100 TB training corpus under CDC gains/loses/rewrites documents
every epoch; re-running corpus-wide MinHash-LSH
(operators/textdedup.py) per epoch re-shingles everything.  This
sidecar keeps the LSH band index current at **O(changed docs)** per
epoch and answers "which live documents does this batch near-duplicate"
AT INGEST TIME, before the batch is even committed:

* per epoch, signatures are computed for the epoch's changed docs
  ONLY (plan-asserted in tests: the signature frame scans no index
  file);
* the batch's band rows probe the existing index with the batch side
  broadcast when small — the index side is scanned in place, never
  shuffled (the same batch-side-broadcast shape as targeted demux's
  previous-version lookup, plans/pipeline.py);
* new band/signature rows append as write groups; every change (incl.
  deletes) appends a narrow ``(doc_id, _v)`` mask row that retires any
  older row for that id in ANY band bucket at read time — cross-bucket
  moves (a rewrite changes the signature, hence every band key) are
  correct without knowing the old buckets.  Same merge-on-read shape
  as the lake's MoR deltas and the ANN sidecar
  (operators/incstore.py);
* ``compact()`` folds masks into a fresh base, bounded and amortized.

Verification is **signature-estimated Jaccard** (fraction of agreeing
MinHash components) — the right verifier at ingest scale because it
needs no second pass over document text.  With the default threshold
``verify_min = n_hashes - bands + 1`` the result is EXACT with
respect to the banding, by pigeonhole: a pair with ≥ n-(bands-1)
agreeing components has fewer than ``bands`` mismatches, so at least
one band agrees completely and the pair is guaranteed to collide in
the band join — i.e. the detected pair set is exactly
``{pairs with agreement ≥ verify_min}`` regardless of the bucket hash
function.  That is what lets the DuckDB oracle
(queries.textdedup_incremental) replay the whole protocol from raw
text with NO staged hashes: it computes agreement over all live pairs
directly.  Below the pigeonhole bound the index degrades to standard
LSH recall; keep the default for oracle-exact behavior.

Reference analogue: the reference persists cross-run lookup state and
updates it in place rather than rebuilding (CMS_SynPuf_ETL_CDM_v5.py
:299-370); this is that idea applied to the dedup-index sidecar, the
text twin of operators/vecindex.py.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cms_spark.operators.incstore import (
    V_COL as _V_COL,
    atomic_json as _atomic_json,
    commit_steps as _commit_steps,
    mask_resolve,
    recover_pending as _recover_pending,
    stamped_union,
)
from etl_cms_spark.operators.textdedup import minhash_signatures_portable


def sig_agreement(a: Column, b: Column) -> Column:
    """Number of agreeing MinHash components between two signature
    arrays — a pure array fold (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )


class IncrementalTextDedupIndex:
    """A MinHash-LSH band index that stays current under CDC epochs.

    Layout under ``path``::

        _meta.json                 hash family params, applied epochs,
                                   next write ordinal
        sigs/w{k}/*.parquet        (doc_id, sig array<long>, _v)
        bands/w{k}/*.parquet       (doc_id, band, bkt, _v) — narrow
        mask/w{k}/*.parquet        (doc_id, _v) — read-time kill list
        pairs/e{n}/*.parquet       (id_a, id_b, est_jaccard) detected
                                   when epoch n was ingested

    Documents whose text yields zero shingles (< shingle_n tokens)
    are not indexable — they carry no MinHash evidence — and are
    excluded from sigs/bands (their mask rows still retire any older
    indexed version).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "_meta.json")) as f:
            self.meta = json.load(f)
        # finish any compaction that crashed mid-swap (incstore
        # two-phase protocol) before the first read.
        _recover_pending(path, self.meta)

    # ------------------------------------------------------------ build

    @staticmethod
    def build(
        spark: SparkSession,
        path: str,
        text_col: str,
        id_col: str,
        n_hashes: int = 16,
        bands: int = 4,
        shingle_n: int = 3,
        verify_min: int | None = None,
        maintain_groups: bool = False,
    ) -> "IncrementalTextDedupIndex":
        """Create an EMPTY index; the base corpus is just epoch 0 of
        ``apply_epoch`` — one code path for initial load and upkeep.

        ``verify_min`` defaults to ``n_hashes - bands + 1``, the
        pigeonhole bound that makes detection exact w.r.t. agreement
        (see module docstring).

        ``maintain_groups=True`` additionally keeps DEDUP GROUPS
        (connected components of the live near-dup pair graph, min-id
        canonical) current per epoch at O(touched components), not
        O(corpus) — see ``live_groups``."""
        if n_hashes % bands:
            raise ValueError("bands must divide n_hashes")
        os.makedirs(path, exist_ok=True)
        meta = {
            "text_col": text_col,
            "id_col": id_col,
            "n_hashes": n_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
            "verify_min": int(verify_min if verify_min is not None else n_hashes - bands + 1),
            "maintain_groups": bool(maintain_groups),
            "applied_epochs": [],
            "next_write": 0,
        }
        _atomic_json(os.path.join(path, "_meta.json"), meta)
        idx = IncrementalTextDedupIndex.__new__(IncrementalTextDedupIndex)
        idx.spark, idx.path, idx.meta = spark, path, meta
        return idx

    # --------------------------------------------------------- framing

    def sig_frame(self, upserts: DataFrame, lsn_col: str) -> DataFrame:
        """(doc_id, sig, _v) for the epoch's indexable upserts — a
        pure computation over the CHANGES frame (never reads the
        index; plan-asserted in tests).  Several versions of one doc
        in a batch each get their own row; the mask's (_v, _write)
        resolution keeps only the newest at read time."""
        m = self.meta
        from etl_cms_spark.functions.text import word_shingles

        rows = upserts.select(
            F.col(m["id_col"]).cast("long").alias("doc_id"),
            F.col(m["text_col"]).alias("_text"),
            F.col(lsn_col).cast("long").alias(_V_COL),
        ).where(F.size(word_shingles(F.col("_text"), m["shingle_n"])) > 0)
        sigs = minhash_signatures_portable(
            rows, "_text", "doc_id", m["n_hashes"], m["shingle_n"], extra_cols=[_V_COL]
        )
        return sigs.select(
            F.col("_id").alias("doc_id"),
            F.array(*[F.col(f"_m{i}") for i in range(m["n_hashes"])]).alias("sig"),
            _V_COL,
        )

    def band_frame(self, sigs: DataFrame) -> DataFrame:
        """Narrow band rows (doc_id, band, bkt, _v): one xxhash64
        bucket per band over that band's signature slice.  Bucket
        collisions only ever ADD candidates; the agreement verify
        removes them, so correctness never depends on the bucket
        hash (the oracle exploits exactly this)."""
        m = self.meta
        r = m["n_hashes"] // m["bands"]
        slices = F.array(
            *[
                F.xxhash64(
                    F.lit(b), *[F.element_at("sig", b * r + j + 1) for j in range(r)]
                )
                for b in range(m["bands"])
            ]
        )
        return sigs.select(
            "doc_id", F.posexplode(slices).alias("band", "bkt"), _V_COL
        )

    # ---------------------------------------------------- epoch updates

    def _verify(self, cand: DataFrame, sig_a: DataFrame, sig_b: DataFrame) -> DataFrame:
        """cand(id_a, id_b) × signatures → pairs passing the
        agreement threshold, with the estimated Jaccard."""
        n = self.meta["n_hashes"]
        j = cand.join(
            sig_a.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("_sa")), "id_a"
        ).join(
            sig_b.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("_sb")), "id_b"
        )
        agree = sig_agreement(F.col("_sa"), F.col("_sb"))
        return (
            j.withColumn("_agree", agree)
            .where(F.col("_agree") >= self.meta["verify_min"])
            .select(
                "id_a",
                "id_b",
                F.round(F.col("_agree") / F.lit(float(n)), 4).alias("est_jaccard"),
            )
        )

    def probe(
        self,
        sigs: DataFrame,
        new_bands: DataFrame,
        changed_ids: DataFrame | None = None,
        broadcast_batch: bool = True,
    ) -> DataFrame:
        """Near-dup pairs between the batch and the LIVE index, plus
        within-batch pairs.  ``broadcast_batch`` keeps the index side
        scan-local (no shuffle of the corpus-sized side) — the right
        default whenever the batch is epoch-sized; disable for a
        corpus-sized initial load and the band join shuffles both
        sides on (band, bkt).

        ``changed_ids`` (doc_id): every id the batch touches, deletes
        included.  Those ids' PRE-epoch index rows are excluded from
        the live side — an updated doc probes with its new signature
        via the within-batch path, a deleted doc must not pair at
        all."""
        latest = sigs.groupBy("doc_id").agg(
            F.max_by(F.struct("sig", _V_COL), F.col(_V_COL)).alias("_l")
        ).select("doc_id", F.col("_l.sig").alias("sig"))
        nb = new_bands.select("doc_id", "band", "bkt").dropDuplicates()
        nbx = F.broadcast(nb) if broadcast_batch else nb
        live_b = self.live_bands()
        live_s = self.live_sigs()
        if changed_ids is not None:
            ids = changed_ids.select(F.col(changed_ids.columns[0]).alias("doc_id"))
            ids = F.broadcast(ids) if broadcast_batch else ids
            live_b = live_b.join(ids, "doc_id", "left_anti")
            live_s = live_s.join(ids, "doc_id", "left_anti")
        # signature lookup must hit the right store per side: the
        # live doc's sig comes from the index, the batch doc's from
        # this epoch's frame (it may not be appended yet).
        vs_live = (
            live_b.join(nbx.withColumnRenamed("doc_id", "_bid"), ["band", "bkt"])
            .where(F.col("doc_id") != F.col("_bid"))
            .select(F.col("doc_id").alias("id_a"), F.col("_bid").alias("id_b"))
            .dropDuplicates()
        )
        vl = self._verify(vs_live, live_s, latest).select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "est_jaccard",
        )
        within = (
            nb.alias("x")
            .join(nb.alias("y"), ["band", "bkt"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
            )
            .dropDuplicates()
        )
        vw = self._verify(within, latest, latest)
        return vl.unionByName(vw).dropDuplicates(["id_a", "id_b"])

    def apply_epoch(
        self,
        changes: DataFrame,
        epoch: int,
        op_col: str = "op",
        lsn_col: str = "lsn",
        probe: bool = True,
        broadcast_batch: bool | None = None,
    ) -> dict:
        """Apply one epoch of document changes (op 'I'/'U'/'D').

        Idempotent: an already-applied epoch is a no-op (replay-safe,
        the LakeTable.merge_epoch contract).  Cost is O(changes):
        signature/band computation maps over the epoch's upserts only;
        the probe reads the index but never shuffles it (batch side
        broadcast under ``broadcast_batch``, auto: batches ≤ 100k
        indexable docs); writes are appends sized by the batch."""
        if epoch in self.meta["applied_epochs"]:
            return {"epoch": epoch, "skipped_duplicate_epoch": True}
        if self.meta.get("maintain_groups") and not probe:
            raise ValueError(
                "maintain_groups requires probe=True (group maintenance "
                "consumes the epoch's detected pairs)"
            )
        t0 = time.time()
        k = self.meta["next_write"]
        changes = changes.persist()
        try:
            upserts = changes.where(F.col(op_col) != "D")
            sigs = self.sig_frame(upserts, lsn_col).persist()
            n_indexable = sigs.count()  # also materializes the cache
            bandrows = self.band_frame(sigs)
            n_pairs = None
            chg_ids = changes.select(
                F.col(self.meta["id_col"]).cast("long").alias("doc_id")
            ).dropDuplicates()
            if probe:
                bb = (
                    broadcast_batch
                    if broadcast_batch is not None
                    else n_indexable <= 100_000
                )
                pairs = self.probe(sigs, bandrows, chg_ids, broadcast_batch=bb)
                pairs.write.mode("overwrite").parquet(
                    os.path.join(self.path, "pairs", f"e{epoch}")
                )
                n_pairs = self.spark.read.parquet(
                    os.path.join(self.path, "pairs", f"e{epoch}")
                ).count()
            sigs.write.mode("overwrite").parquet(
                os.path.join(self.path, "sigs", f"w{k}")
            )
            bandrows.write.mode("overwrite").parquet(
                os.path.join(self.path, "bands", f"w{k}")
            )
            changes.select(
                F.col(self.meta["id_col"]).cast("long").alias("doc_id"),
                F.col(lsn_col).cast("long").alias(_V_COL),
            ).write.mode("overwrite").parquet(os.path.join(self.path, "mask", f"w{k}"))
            n_total = changes.count()
            if self.meta.get("maintain_groups"):
                # AFTER the appends: the subgraph recompute reads the
                # post-epoch live state.  Crash-safe because every
                # write in this epoch (data and groups) lands at the
                # same ordinal k and replay overwrites it identically.
                new_pairs = self.spark.read.parquet(
                    os.path.join(self.path, "pairs", f"e{epoch}")
                )
                self._update_groups(k, chg_ids, new_pairs)
            sigs.unpersist()
        finally:
            changes.unpersist()
        self.meta["applied_epochs"].append(epoch)
        self.meta["next_write"] = k + 1
        _atomic_json(os.path.join(self.path, "_meta.json"), self.meta)
        return {
            "epoch": epoch,
            "write": k,
            "n_changes": n_total,
            "n_indexable": n_indexable,
            "n_pairs_detected": n_pairs,
            "seconds": round(time.time() - t0, 3),
        }

    # ----------------------------------------------------- dedup groups

    def _pairs_among(self, members: DataFrame) -> DataFrame:
        """Live near-dup pairs restricted to ``members`` (doc_id) —
        the bounded subgraph read that makes group maintenance
        O(touched components): only the touched components' band rows
        join, never the whole index."""
        b = (
            self.live_bands()
            .join(members, "doc_id", "leftsemi")
            .select("doc_id", "band", "bkt")
            .dropDuplicates()
        )
        cand = (
            b.alias("x")
            .join(b.alias("y"), ["band", "bkt"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
            .dropDuplicates()
        )
        s = self.live_sigs().join(members, "doc_id", "leftsemi")
        return self._verify(cand, s, s)

    def _update_groups(self, k: int, chg_ids: DataFrame, new_pairs: DataFrame) -> None:
        """Bounded per-epoch relabel: recompute connected components
        for ONLY the components touched by this epoch (a changed doc,
        a deleted doc, or a new pair endpoint), then retire every
        touched member's old label and append the fresh ones.  Merges
        (a new pair bridging two components) and SPLITS (a delete or
        rewrite severing a bridge doc) both fall out of the subgraph
        recompute — the hard case batch CC re-runs the corpus for."""
        from etl_cms_spark.operators.graph import connected_components

        labels = self._group_labels()
        seeds = (
            chg_ids.select("doc_id")
            .unionByName(new_pairs.select(F.col("id_a").alias("doc_id")))
            .unionByName(new_pairs.select(F.col("id_b").alias("doc_id")))
            .dropDuplicates()
        )
        # touched comps come from the seeds' RAW label history (every
        # write group, mask-unresolved): a crash during a previous
        # attempt's glabels write can leave a component half-relabeled
        # (some members on the new id, some on the old), and only the
        # union of both ids re-collects the whole membership on
        # replay.  The superset only ever ADDS members (bounded by
        # label history, which compact() folds away).
        raw = stamped_union(self.spark, os.path.join(self.path, "glabels"))
        if raw is None:
            raw = self.spark.createDataFrame([], "doc_id long, comp long, _v long")
        touched = (
            raw.join(seeds, "doc_id", "leftsemi").select("comp").dropDuplicates()
        )
        members = (
            labels.join(touched, "comp", "leftsemi")
            .select("doc_id")
            .unionByName(seeds)
            .dropDuplicates()
            .persist()
        )
        try:
            sub = self._pairs_among(members)
            comp = connected_components(sub, "id_a", "id_b", "doc_id", "comp")
            # glabels BEFORE gmask: if the process dies between the
            # two, old and new label rows coexist and (_v, _write)
            # resolution already prefers the new ones; the replay
            # rewrites both groups identically.
            comp.select(
                "doc_id", "comp", F.lit(int(k)).cast("long").alias(_V_COL)
            ).write.mode("overwrite").parquet(
                os.path.join(self.path, "glabels", f"w{k}")
            )
            members.select("doc_id", F.lit(int(k)).cast("long").alias(_V_COL)).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.path, "gmask", f"w{k}"))
        finally:
            members.unpersist()

    def _group_labels(self) -> DataFrame:
        rows = stamped_union(self.spark, os.path.join(self.path, "glabels"))
        if rows is None:
            return self.spark.createDataFrame([], "doc_id long, comp long, _v long")
        mask = stamped_union(self.spark, os.path.join(self.path, "gmask"))
        return mask_resolve(rows, mask, "doc_id").select("doc_id", "comp", _V_COL)

    def live_groups(self) -> DataFrame:
        """Current dedup groups (maintain_groups=True indexes): one
        row per grouped doc with its component id (min member id —
        replay-stable canonical) and the survivor flag.  Matches a
        from-scratch ``graph.dedup_groups(live_pairs())`` at every
        epoch boundary (tested), maintained incrementally."""
        g = self._group_labels()
        return g.select(
            "doc_id",
            F.col("comp").alias("component_id"),
            (F.col("doc_id") == F.col("comp")).alias("is_canonical"),
        )

    def update_from_lake(self, lake, epoch: int, text_col: str = "content") -> dict:
        """Tail a LakeTable's own CDC-out diff into the index — dedup
        upkeep INSIDE the engine's exactly-once loop.  The doc id is
        the xxhash64 of the table key (replay-stable, the same
        identity rule as operators/dedup.keyed_dedup_stable_id); the
        change version is the epoch's snapshot version (monotone per
        commit)."""
        manifest = lake._load_manifest()
        v = manifest["epochs"][str(epoch)]["snapshot_version"]
        key_cols = manifest["key_cols"]
        ch = lake.changes_for_epoch(epoch).select(
            F.xxhash64(*key_cols).alias("doc_id"),
            "op",
            F.col(f"after.{text_col}").alias(text_col),
            F.lit(int(v)).cast("long").alias("lsn"),
        )
        return self.apply_epoch(
            ch, epoch, op_col="op", lsn_col="lsn"
        )

    # ------------------------------------------------------------ reads

    def live_sigs(self) -> DataFrame:
        rows = stamped_union(self.spark, os.path.join(self.path, "sigs"))
        if rows is None:
            return self.spark.createDataFrame([], "doc_id long, sig array<bigint>, _v long")
        mask = stamped_union(self.spark, os.path.join(self.path, "mask"))
        return mask_resolve(rows, mask, "doc_id").select("doc_id", "sig", _V_COL)

    def live_bands(self) -> DataFrame:
        rows = stamped_union(self.spark, os.path.join(self.path, "bands"))
        if rows is None:
            return self.spark.createDataFrame(
                [], "doc_id long, band int, bkt long, _v long"
            )
        mask = stamped_union(self.spark, os.path.join(self.path, "mask"))
        return mask_resolve(rows, mask, "doc_id").select("doc_id", "band", "bkt", _V_COL)

    def live_pairs(self) -> DataFrame:
        """Near-dup pairs over the CURRENT corpus state — the
        reporting/convergence query (band self-join + agreement
        verify).  Equals a from-scratch batch LSH over the latest
        text of every live doc (tested; the catalog oracle replays
        it from raw text)."""
        b = self.live_bands().select("doc_id", "band", "bkt").dropDuplicates()
        cand = (
            b.alias("x")
            .join(b.alias("y"), ["band", "bkt"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
            .dropDuplicates()
        )
        s = self.live_sigs()
        return self._verify(cand, s, s)

    def detected_pairs(self) -> DataFrame:
        """The at-ingest detection log: every pair each epoch reported
        when its batch arrived, stamped with that epoch."""
        root = os.path.join(self.path, "pairs")
        parts = []
        if os.path.isdir(root):
            for e in sorted(os.listdir(root)):
                d = os.path.join(root, e)
                if e.startswith("e") and os.path.isdir(d):
                    parts.append(
                        self.spark.read.parquet(d).withColumn(
                            "epoch", F.lit(int(e[1:]))
                        )
                    )
        if not parts:
            return self.spark.createDataFrame(
                [], "id_a long, id_b long, est_jaccard double, epoch int"
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # ------------------------------------------------------ maintenance

    def compact(self) -> dict:
        """Fold masks into fresh bases for sigs and bands: one bounded
        rewrite of the LIVE rows each (amortizes the read-side mask
        away).  Applied epochs are retained so replay idempotency
        survives.

        Crash-safe via the incstore two-phase protocol: every folded
        base is fully written to a ``*_compact_tmp`` dir while the old
        groups stay readable, then the destructive swap (rmtree old
        groups + rename + mask retirement) is persisted as pending
        steps WITH the bumped ``next_write`` in one atomic meta write.
        A crash before that write leaves the old state intact (orphan
        tmps are overwritten next attempt); a crash after it is
        finished at the next open — in particular the bumped
        ``next_write`` means a post-crash ``apply_epoch`` can never
        reuse the folded base's write-group id and overwrite the
        corpus.
        """
        k = self.meta["next_write"]
        folds = [("sigs", self.live_sigs()), ("bands", self.live_bands())]
        if os.path.isdir(os.path.join(self.path, "glabels")):
            folds.append(("glabels", self._group_labels()))
        steps: list[dict] = []
        for sub, frame in folds:
            tmp = f"{sub}_compact_tmp"
            frame.write.mode("overwrite").parquet(os.path.join(self.path, tmp))
            steps.append(
                {"kind": "swap", "dir": sub, "tmp": tmp, "final": f"{sub}/w{k}"}
            )
        steps.append({"kind": "rmtree", "path": "mask"})
        steps.append({"kind": "rmtree", "path": "gmask"})
        self.meta["next_write"] = k + 1
        _commit_steps(self.path, self.meta, steps)
        return {"compacted_write": k}
