"""Incremental rollup maintenance (continuous aggregate / IVM).

The "hypertable rollup" pattern: a small aggregate table (events per
(key, hour), bytes per repo, …) kept current INCREMENTALLY as change
epochs arrive, instead of re-scanning the full history per refresh —
the reference's analogue is its per-run record counters persisted
across samples (FileControl recs_written bookkeeping), which never
survive a crash mid-run.

Design: per epoch, aggregate ONLY the batch (a map-side-combined hash
agg over epoch-sized input), join the (small, already-aggregated)
current rollup state, add, and MERGE the touched keys back through the
ordinary LakeTable epoch commit.  Exactly-once, crash-resume, lineage,
time travel, and compaction all come from the sink for free:

* replaying a committed epoch is a manifest no-op (merge_epoch);
* the read-modify-write is safe because the committed-epoch check
  happens BEFORE the read — a crash after commit replays into a skip,
  a crash before recomputes from the unchanged snapshot;
* the merge rewrites only the buckets whose keys the epoch touched —
  cost ~ O(epoch distinct keys), never O(rollup history).

Scope: ``IncrementalRollup`` covers monotone additive measures of the
changelog itself (counts, sums over events) — each change event
contributes once, so no retraction is needed.  Aggregates over
CURRENT ROW STATE (e.g. "bytes in latest versions") need old-value
retraction on update/delete — that is ``StateRollup`` below, fed by
the lake's own CDC-out diff (``LakeTable.changes_between``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cms_spark.sink.lake import LakeTable


class IncrementalRollup:
    """A LakeTable-backed continuous aggregate.

    ``measures`` maps output column name -> aggregate Column over the
    raw batch (e.g. ``{"n_events": F.count(F.lit(1)),
    "total_bytes": F.sum(F.length("content"))}``).  Measures must be
    ADDITIVE (count/sum): epoch deltas are added to the stored state.

    ``distinct`` maps output column name -> INPUT column for
    distinct-count measures — the aggregate additive folding cannot
    maintain (COUNT(DISTINCT) is not a sum of per-epoch distincts).
    Maintained as MERGEABLE HLL SKETCHES (Apache DataSketches via
    ``F.hll_sketch_agg``): the state table stores each group's sketch
    as a binary column, each epoch unions its delta sketch in
    (register-wise max — O(epoch groups) work, and naturally
    idempotent under replay on top of the epoch-keyed merge), and
    ``read()`` exposes the estimate.  N epochs of unions produce the
    IDENTICAL estimate to a one-shot sketch over all rows
    (union = register max is associative/commutative) — tested, plus
    an accuracy bound vs exact COUNT(DISTINCT).  This is the 100 TB
    shape: per-epoch distinct state is O(groups × sketch size), never
    O(distinct values).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_exprs: dict[str, Column],
        measures: dict[str, Column],
        n_buckets: int = 8,
        distinct: dict[str, str] | None = None,
        min_measures: dict[str, Column] | None = None,
        max_measures: dict[str, Column] | None = None,
    ):
        self.spark = spark
        self.key_cols = list(key_exprs)
        self.key_exprs = key_exprs
        self.measures = measures
        self.distinct = dict(distinct or {})
        # MIN/MAX over an APPEND-ONLY changelog are MONOTONE — each
        # epoch can only improve them, never retract — so the fold is
        # a pure least()/greatest() against the stored value.  (Over
        # CURRENT ROW STATE they are NOT monotone: that retraction
        # case is StateRollup's min_measures/max_measures.)
        self.monotone: dict[str, tuple[Column, str]] = {
            **{m: (v, "min") for m, v in (min_measures or {}).items()},
            **{m: (v, "max") for m, v in (max_measures or {}).items()},
        }
        names = [*self.measures, *self.distinct, *self.monotone]
        if len(set(names)) != len(names) or len(self.monotone) != len(
            min_measures or {}
        ) + len(max_measures or {}):
            raise ValueError(f"measure name collision: {sorted(names)}")
        schema = (
            {k: "string" for k in self.key_cols}
            | {m: "long" for m in measures}
            | {d: "binary" for d in self.distinct}
            | {m: "long" for m in self.monotone}
        )
        self.table = LakeTable(spark, root, n_buckets)
        if not self.table.exists():
            self.table.create(self.key_cols, schema)

    def apply_epoch(self, batch: DataFrame, epoch: int) -> dict:
        """Fold one change batch into the rollup, exactly once."""
        done = self.table.committed_epochs()
        if str(epoch) in {str(e) for e in done}:
            return {"epoch": epoch, "skipped_duplicate_epoch": True}
        # The merge LSN must be MONOTONE in APPLICATION order, and the
        # raw epoch id is not: DML epochs live at 10^12 and repair /
        # bootstrap epochs are negative, so stamping the id itself
        # would freeze groups behind a DML fold (later source epochs
        # lose the max-LSN merge) or silently discard repair folds.
        # The fold is serialized per sidecar and replays skip above,
        # so the count of already-applied epochs is a deterministic
        # monotone write ordinal.
        seq = len(done)
        delta = batch.groupBy(
            # keys stored as strings (the table's declared schema) —
            # deterministic cross-engine text form for dates/hours too.
            *[expr.cast("string").alias(name) for name, expr in self.key_exprs.items()]
        ).agg(
            *[m.cast("long").alias(name) for name, m in self.measures.items()],
            *[
                F.hll_sketch_agg(F.col(src)).alias(name)
                for name, src in self.distinct.items()
            ],
            *[
                (F.min(v) if kind == "min" else F.max(v))
                .cast("long")
                .alias(name)
                for name, (v, kind) in self.monotone.items()
            ],
        )
        current = self.table.read().select(
            *self.key_cols,
            *[
                F.col(c).alias(f"_cur_{c}")
                for c in [*self.measures, *self.distinct, *self.monotone]
            ],
        )
        merged = delta.join(current, self.key_cols, "left").select(
            *self.key_cols,
            *[
                (F.col(m) + F.coalesce(F.col(f"_cur_{m}"), F.lit(0))).alias(m)
                for m in self.measures
            ],
            *[
                # union = register-wise max: associative, commutative,
                # and idempotent — N epochs of unions == one-shot.
                F.when(F.col(f"_cur_{d}").isNull(), F.col(d))
                .otherwise(F.hll_union(F.col(d), F.col(f"_cur_{d}")))
                .alias(d)
                for d in self.distinct
            ],
            *[
                # least/greatest skip NULLs: a group's first epoch (or
                # an all-NULL epoch) folds to the other side's value.
                (F.least if kind == "min" else F.greatest)(
                    F.col(m), F.col(f"_cur_{m}")
                ).alias(m)
                for m, (_, kind) in self.monotone.items()
            ],
            F.lit("U").alias("op"),
            F.lit(int(seq)).alias("lsn"),
        )
        return self.table.merge_epoch(merged, epoch)

    def read(self) -> DataFrame:
        """Current rollup state; distinct measures surface as their
        HLL ESTIMATES (long)."""
        return self.table.read().select(
            *self.key_cols,
            *self.measures,
            *[
                F.hll_sketch_estimate(F.col(d)).alias(d)
                for d in self.distinct
            ],
            *self.monotone,
        )


class StateRollup:
    """Retraction-capable continuous aggregate over CURRENT ROW STATE
    (round-4: the mode ``IncrementalRollup`` documents as out of
    scope) — e.g. "bytes in the LATEST versions per language", which
    an additive fold over the changelog cannot maintain because an
    update must RETRACT the old row's contribution.

    Input is the lake's own CDC-out diff (``LakeTable.
    changes_between``): Debezium-shaped rows with ``before`` /
    ``after`` payload images.  Each refresh folds one diff:

        delta(key) =  Σ measure(after-image)  —  Σ measure(before-image)

    so updates subtract the old value and add the new, deletes only
    subtract, inserts only add — including when the ROLLUP KEY itself
    moved (the before-image subtracts from the old key, the
    after-image adds to the new).  The signed fold is a single
    map-side-combined hash agg over the diff (O(changed rows)), and
    the merge back through the LakeTable epoch commit keeps
    exactly-once / crash-resume / lineage, like IncrementalRollup.

    ``row_measures`` maps output column -> per-ROW value expression
    over (table key cols + payload cols), summed with sign: counts
    are ``F.lit(1)``, sums are the summand (NOT an aggregate).
    ``count_measure`` optionally names the measure that counts rows;
    keys whose count reaches zero are tombstoned from the rollup
    instead of lingering at 0.

    ``min_measures`` / ``max_measures`` maintain MIN/MAX per group —
    the NON-additive aggregates a signed fold cannot carry, because
    retracting a row that held the extremum says nothing about the
    runner-up.  Standard IVM extremum bookkeeping: alongside each
    extremum ``m`` the state stores ``m__n``, the number of CURRENT
    rows sitting exactly at the extremum.  Per epoch (all from the
    same single signed pass over the diff):

    * an insert strictly better than the extremum REPLACES it (its
      per-value net count becomes the new multiplicity) — free;
    * inserts/deletes AT the extremum adjust ``m__n`` — free;
    * deletes elsewhere are irrelevant to the extremum — free;
    * only when ``m__n`` falls to zero (the last extremum row was
      retracted and nothing better arrived) is the true runner-up
      unknowable from the diff: those groups — and ONLY those — are
      recomputed from current source rows (one bucket-parallel pass,
      broadcast-semi-pruned to the affected groups).

    So the common case stays O(changed rows); the rescan is bounded
    by the affected groups' data and is skipped entirely (no source
    read, no job) when no extremum was killed.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_exprs: dict[str, Column],
        row_measures: dict[str, Column],
        count_measure: str | None = None,
        n_buckets: int = 8,
        min_measures: dict[str, Column] | None = None,
        max_measures: dict[str, Column] | None = None,
    ):
        self.spark = spark
        self.key_cols = list(key_exprs)
        self.key_exprs = key_exprs
        self.row_measures = row_measures
        if count_measure is not None and count_measure not in row_measures:
            raise ValueError(f"count_measure {count_measure!r} not in row_measures")
        self.count_measure = count_measure
        self.extrema: dict[str, tuple[Column, str]] = {
            **{m: (v, "min") for m, v in (min_measures or {}).items()},
            **{m: (v, "max") for m, v in (max_measures or {}).items()},
        }
        names = [*row_measures, *self.extrema]
        if len(set(names)) != len(names) or len(self.extrema) != len(
            min_measures or {}
        ) + len(max_measures or {}):
            raise ValueError("measure name collision across row/min/max measures")
        if any(n.startswith("_") or n.endswith("__n") for n in names):
            raise ValueError("measure names must not start with '_' or end '__n'")
        if self.extrema and self.count_measure is None:
            # group-death detection is what lets a killed extremum skip
            # the rescan when the whole group is gone
            raise ValueError("min/max measures require a count_measure")
        schema = (
            {k: "string" for k in self.key_cols}
            | {m: "long" for m in row_measures}
            | {c: "long" for m in self.extrema for c in (m, f"{m}__n")}
        )
        self.table = LakeTable(spark, root, n_buckets)
        if not self.table.exists():
            self.table.create(self.key_cols, schema)

    def _extremum_update(self, signed: DataFrame, m: str, kind: str) -> DataFrame:
        """Per-group extremum transition for one measure, from the
        signed per-value net counts of this epoch's diff.  Returns
        (keys, _upd_m marker, _new_m, _new_m__n, _rescan_m)."""
        v = F.col(f"_v_{m}")
        per_value = (
            signed.where(v.isNotNull())
            .groupBy(*self.key_cols, v.alias("_v"))
            .agg(F.sum("_sign").alias("_dn"))
            .where(F.col("_dn") != 0)
        )
        st = self.table.read().select(
            *self.key_cols,
            F.col(m).alias("_cur"),
            F.col(f"{m}__n").alias("_curn"),
        )
        j = per_value.join(st, self.key_cols, "left")
        better = (
            F.col("_v") < F.col("_cur")
            if kind == "min"
            else F.col("_v") > F.col("_cur")
        )
        # net-new rows strictly better than the stored extremum (or a
        # group with no stored extremum): the best of them wins, and
        # its net count IS the new multiplicity (nothing pre-existing
        # can sit strictly beyond the old extremum).
        cand_struct = F.when(
            (F.col("_dn") > 0) & (F.col("_cur").isNull() | better),
            F.struct(F.col("_v").alias("v"), F.col("_dn").alias("n")),
        )
        agg = j.groupBy(*self.key_cols).agg(
            F.first("_cur").alias("_cur"),
            F.first("_curn").alias("_curn"),
            F.sum(
                F.when(F.col("_v") == F.col("_cur"), F.col("_dn")).otherwise(F.lit(0))
            ).alias("_dnat"),
            (F.min(cand_struct) if kind == "min" else F.max(cand_struct)).alias(
                "_cand"
            ),
        )
        n_same = F.coalesce(F.col("_curn"), F.lit(0)) + F.col("_dnat")
        return agg.select(
            *self.key_cols,
            F.lit(True).alias(f"_upd_{m}"),
            F.when(F.col("_cand").isNotNull(), F.col("_cand.v"))
            .when(n_same > 0, F.col("_cur"))
            .alias(f"_new_{m}"),
            F.when(F.col("_cand").isNotNull(), F.col("_cand.n"))
            .when(n_same > 0, n_same)
            .alias(f"_new_{m}__n"),
            (
                F.col("_cand").isNull()
                & F.col("_cur").isNotNull()
                & (n_same <= 0)
            ).alias(f"_rescan_{m}"),
        )

    def _rescan(self, source: DataFrame, need: DataFrame) -> DataFrame:
        """Exact extremum + multiplicity for the affected groups,
        recomputed from current source rows (one pass, semi-pruned)."""
        src = source.select(
            *[
                expr.cast("string").alias(name)
                for name, expr in self.key_exprs.items()
            ],
            *[
                vex.cast("long").alias(f"_v_{m}")
                for m, (vex, _) in self.extrema.items()
            ],
        ).join(F.broadcast(need), self.key_cols, "semi")
        out = None
        for m, (_, kind) in self.extrema.items():
            per_v = (
                src.where(F.col(f"_v_{m}").isNotNull())
                .groupBy(*self.key_cols, F.col(f"_v_{m}").alias("_v"))
                .agg(F.count(F.lit(1)).alias("_n"))
            )
            s = F.struct(F.col("_v").alias("v"), F.col("_n").alias("n"))
            best = per_v.groupBy(*self.key_cols).agg(
                (F.min(s) if kind == "min" else F.max(s)).alias("_b")
            ).select(
                *self.key_cols,
                F.col("_b.v").alias(f"_rs_{m}"),
                F.col("_b.n").alias(f"_rs_{m}__n"),
            )
            out = best if out is None else out.join(best, self.key_cols, "outer")
        return out

    def apply_diff(
        self, diff: DataFrame, epoch: int, source: DataFrame | None = None
    ) -> dict:
        """Fold one ``changes_between`` diff into the rollup, exactly
        once per ``epoch`` (use the source table's target version as
        the epoch id for a natural idempotency key).  ``source`` — the
        source table's row state AT this epoch — is consulted only if
        a killed extremum forces a group rescan (never read, never
        even planned, otherwise); required only when min/max measures
        are configured."""
        done = self.table.committed_epochs()
        if str(epoch) in {str(e) for e in done}:
            return {"epoch": epoch, "skipped_duplicate_epoch": True}
        # monotone write ordinal — see IncrementalRollup.apply_epoch:
        # raw epoch ids (DML 10^12 band, negative repairs) are not
        # monotone in application order and would corrupt the merge's
        # last-writer-wins ordering.
        seq = len(done)
        key_top = [c for c in diff.columns if c not in ("op", "before", "after")]

        def _side(image: str, sign: int) -> DataFrame:
            rows = diff.where(F.col(image).isNotNull()).select(
                *key_top, F.col(f"{image}.*")
            )
            return rows.select(
                *[
                    expr.cast("string").alias(name)
                    for name, expr in self.key_exprs.items()
                ],
                *[
                    (F.lit(sign) * v.cast("long")).alias(name)
                    for name, v in self.row_measures.items()
                ],
                *[
                    vex.cast("long").alias(f"_v_{m}")
                    for m, (vex, _) in self.extrema.items()
                ],
                F.lit(sign).alias("_sign"),
            )

        signed = _side("after", +1).unionByName(_side("before", -1))
        delta = signed.groupBy(*self.key_cols).agg(
            *[F.sum(m).alias(m) for m in self.row_measures]
        )
        current = self.table.read().select(
            *self.key_cols,
            *[F.col(m).alias(f"_cur_{m}") for m in self.row_measures],
            *[
                F.col(c).alias(f"_cur_{c}")
                for m in self.extrema
                for c in (m, f"{m}__n")
            ],
        )
        new_vals = {
            m: F.col(m) + F.coalesce(F.col(f"_cur_{m}"), F.lit(0))
            for m in self.row_measures
        }
        op = F.lit("U")
        if self.count_measure is not None:
            op = F.when(
                new_vals[self.count_measure] == 0, F.lit("D")
            ).otherwise(F.lit("U"))
        merged = delta.join(current, self.key_cols, "left")
        if not self.extrema:
            out = merged.select(
                *self.key_cols,
                *[v.alias(m) for m, v in new_vals.items()],
                op.alias("op"),
                F.lit(int(seq)).alias("lsn"),
            )
            return self.table.merge_epoch(out, epoch)

        for m, (_, kind) in self.extrema.items():
            merged = merged.join(
                self._extremum_update(signed, m, kind), self.key_cols, "left"
            )
        group_dies = new_vals[self.count_measure] == 0
        ext_cols, rescan_flags = [], []
        for m in self.extrema:
            # a group whose diff rows were all NULL for this value has
            # no _upd row: its extremum is untouched — carry the state
            carried_v = F.when(
                F.col(f"_upd_{m}").isNotNull(), F.col(f"_new_{m}")
            ).otherwise(F.col(f"_cur_{m}"))
            carried_n = F.when(
                F.col(f"_upd_{m}").isNotNull(), F.col(f"_new_{m}__n")
            ).otherwise(F.col(f"_cur_{m}__n"))
            ext_cols += [carried_v.alias(m), carried_n.alias(f"{m}__n")]
            rescan_flags.append(
                (F.coalesce(F.col(f"_rescan_{m}"), F.lit(False)) & ~group_dies)
                .alias(f"_rescan_{m}")
            )
        pre = merged.select(
            *self.key_cols,
            *[v.alias(m) for m, v in new_vals.items()],
            *ext_cols,
            *rescan_flags,
            op.alias("op"),
            F.lit(int(seq)).alias("lsn"),
        ).localCheckpoint()
        any_rescan = None
        for m in self.extrema:
            flag = F.col(f"_rescan_{m}")
            any_rescan = flag if any_rescan is None else (any_rescan | flag)
        need = pre.where(any_rescan).select(*self.key_cols)
        n_rescan = need.count()
        if n_rescan:
            if source is None:
                raise ValueError(
                    "extremum retracted below multiplicity 0: apply_diff "
                    "needs `source` (the source table's rows at this "
                    "epoch) to rescan the affected groups"
                )
            rec = self._rescan(source, need)
            pre = pre.join(rec, self.key_cols, "left")
            fixed = []
            for m in self.extrema:
                flag = F.col(f"_rescan_{m}")
                fixed += [
                    F.when(flag, F.col(f"_rs_{m}")).otherwise(F.col(m)).alias(m),
                    F.when(flag, F.col(f"_rs_{m}__n"))
                    .otherwise(F.col(f"{m}__n"))
                    .alias(f"{m}__n"),
                ]
            pre = pre.select(
                *self.key_cols,
                *self.row_measures,
                *fixed,
                "op",
                "lsn",
            )
        else:
            pre = pre.drop(*[f"_rescan_{m}" for m in self.extrema])
        res = self.table.merge_epoch(pre, epoch)
        res["rescanned_groups"] = int(n_rescan)
        return res

    def read(self) -> DataFrame:
        return self.table.read().select(
            *self.key_cols, *self.row_measures, *self.extrema
        )

    # ---------------- pipeline sidecar protocol ----------------

    @property
    def name(self) -> str:
        return f"state_rollup:{self.table.root.rstrip('/').rsplit('/', 1)[-1]}"

    def update_from_lake(self, lake, epoch: int) -> dict:
        """CDCPipeline sidecar hook: fold the lake's own per-epoch
        CDC-out diff (before/after images — retractions need the
        before side, so this stays on ``changes_for_epoch`` rather
        than the flat ``epoch_batch``).  Idempotent via the rollup
        table's manifest check, performed BEFORE reading the lake so
        replays of long-vacuumed epochs it already applied stay
        no-ops.  With min/max measures configured the lake's own row
        state AT this epoch (``read_at_epoch``) is the rescan source —
        still lazy: it is only ever evaluated for an epoch that kills
        an extremum."""
        if str(epoch) in {str(e) for e in self.table.committed_epochs()}:
            return {"epoch": epoch, "skipped_duplicate_epoch": True}
        source = lake.read_at_epoch(epoch) if self.extrema else None
        return self.apply_diff(lake.changes_for_epoch(epoch), epoch, source=source)
