"""CDC envelope adapters.

Real-world changelog feeds rarely arrive as the engine's flat
``(key, payload, lsn, op)`` rows — the de-facto wire format is the
Debezium-style envelope: a nested record with ``op`` (``c``/``r``/
``u``/``d``), ``before``/``after`` row images, and a ``source`` block
carrying the log position.  The reference ingests flat CSVs
(python_etl CSV readers — SURVEY.md §2.S1) so it never needed this;
a WAL tail does.

The adapter is a pure narrow projection — no shuffle, no UDF — so it
fuses into the scan's WholeStageCodegen and costs nothing at 10^10
events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Debezium op -> engine op.  'r' is a snapshot read (initial load):
# semantically an insert.
_OP_MAP = [("c", "I"), ("r", "I"), ("u", "U"), ("d", "D")]


def from_debezium(
    df: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str] | None = None,
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
    lsn_expr: str = "source.lsn",
    on_key_change: str = "split",
    passthrough_cols: Sequence[str] = (),
) -> DataFrame:
    """Flatten Debezium-style envelopes into the engine's changelog.

    * keys resolve from ``after`` with ``before`` as fallback —
      deletes carry only the before-image;
    * payload columns come from ``after`` (NULL on delete, matching
      the generator's deletes-carry-no-payload convention and the
      lake's tombstone write);
    * ``op`` maps c/r -> I, u -> U, d -> D; unknown ops fail fast via
      a raise_error branch rather than silently dropping events;
    * ``lsn`` is taken from ``lsn_expr`` (default ``source.lsn`` —
      pass e.g. ``source.sequence`` or ``ts_ms`` for feeds that
      position differently);
    * **primary-key changes**: an ``u`` whose before-image keys
      differ (null-safely) from its after-image keys moves the row
      to a new identity.  Taking only the after-key (the pre-round-5
      behaviour) upserts the NEW key and strands the OLD key's row
      forever.  ``on_key_change`` controls the fix:

      - ``"split"`` (default) — emit TWO events at the envelope's
        LSN: a ``D`` tombstone at the old key and an ``I`` at the
        new key.  This is exactly what Debezium's own connectors do
        for key-updating statements (they emit a delete + create
        pair); feeds that pre-split never trip the branch and pay
        only the one-element explode.
      - ``"error"`` — raise on the first key-changing update (for
        feeds contractually pre-split upstream, where one arriving
        anyway means a misconfigured connector).
      - ``"ignore"`` — the old behaviour (after-key only), for
        feeds whose before-images are unreliable.

    ``passthrough_cols``: top-level envelope columns copied verbatim
    onto every emitted event — BOTH halves of a key-change split
    (e.g. ``ts`` for a downstream event-time watermark).

    Returns columns ``[*key_cols, *payload_cols, lsn, op,
    *passthrough_cols]`` — ready for ``fold_partial_updates`` /
    ``latest_by_lsn`` and ``LakeTable.merge_epoch``.

    Plan shape: ``"ignore"``/``"error"`` stay a pure narrow
    projection; ``"split"`` adds one Generate (explode of a 1-or-2
    element array) — still narrow, still shuffle-free, so the
    adapter's cost at 10^10 events remains scan-bound.
    """
    if on_key_change not in ("split", "error", "ignore"):
        raise ValueError(
            f"on_key_change must be split|error|ignore, got {on_key_change!r}"
        )
    if payload_cols is None:
        after_fields = [f.name for f in df.schema[after_col].dataType.fields]
        payload_cols = [c for c in after_fields if c not in key_cols]

    op_mapped = F.lit(None).cast("string")
    for src, dst in reversed(_OP_MAP):
        op_mapped = F.when(F.col(op_col) == src, F.lit(dst)).otherwise(op_mapped)
    op_mapped = F.when(
        op_mapped.isNull(),
        F.raise_error(F.concat(F.lit("unknown CDC op: "), F.col(op_col))),
    ).otherwise(op_mapped)

    lsn = F.expr(lsn_expr).cast("long").alias("lsn")
    coalesced_keys = [
        F.coalesce(F.col(f"{after_col}.{k}"), F.col(f"{before_col}.{k}")).alias(k)
        for k in key_cols
    ]
    after_payload = [F.col(f"{after_col}.{c}").alias(c) for c in payload_cols]

    if on_key_change != "ignore":
        # Null-safe: a NULL before-image (feeds configured without
        # before rows) can't witness a key change and never trips.
        key_changed = (F.col(op_col) == "u") & F.col(before_col).isNotNull()
        differs = F.lit(False)
        for k in key_cols:
            differs = differs | ~F.col(f"{before_col}.{k}").eqNullSafe(
                F.col(f"{after_col}.{k}")
            )
        key_changed = key_changed & differs

        if on_key_change == "error":
            guard = F.when(
                key_changed,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "key-changing update in envelope feed "
                            "(on_key_change='error'): before/after key mismatch "
                            "at lsn "
                        ),
                        F.expr(lsn_expr).cast("string"),
                    )
                ),
            ).otherwise(op_mapped)
            return df.select(
                *coalesced_keys,
                *after_payload,
                lsn,
                guard.alias("op"),
                *[F.col(c) for c in passthrough_cols],
            )

        # split: 1-or-2 event structs per envelope, exploded.  The
        # new-key half is an insert — the row is NEW under that
        # identity (matches Debezium's delete+create pair).
        event_t = F.struct(
            *[F.col(f"{after_col}.{k}").alias(k) for k in key_cols],
            *after_payload,
            F.lit("I").alias("op"),
        )
        null_payload = [
            F.lit(None).cast(df.schema[after_col].dataType[c].dataType).alias(c)
            for c in payload_cols
        ]
        tombstone_t = F.struct(
            *[F.col(f"{before_col}.{k}").alias(k) for k in key_cols],
            *null_payload,
            F.lit("D").alias("op"),
        )
        plain_t = F.struct(
            *coalesced_keys,
            *after_payload,
            op_mapped.alias("op"),
        )
        events = F.when(
            key_changed, F.array(tombstone_t, event_t)
        ).otherwise(F.array(plain_t))
        return df.select(
            F.explode(events).alias("_e"),
            lsn,
            *[F.col(c) for c in passthrough_cols],
        ).select(
            *[F.col(f"_e.{k}").alias(k) for k in key_cols],
            *[F.col(f"_e.{c}").alias(c) for c in payload_cols],
            "lsn",
            F.col("_e.op").alias("op"),
            *passthrough_cols,
        )

    return df.select(
        *coalesced_keys,
        *after_payload,
        lsn,
        op_mapped.alias("op"),
        *[F.col(c) for c in passthrough_cols],
    )


def to_debezium(
    changes: DataFrame,
    key_cols: Sequence[str],
    lsn,
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
) -> DataFrame:
    """CDC OUT as wire format: wrap ``LakeTable.changes_between`` /
    ``changes_for_epoch`` output (flat keys + ``op`` I/U/D +
    before/after payload structs) into Debezium-style envelopes —
    key fields folded INTO the row images (Debezium's shape: a
    delete carries keys in ``before`` only), op mapped I→c / U→u /
    D→d, and a ``source`` struct carrying ``lsn`` (pass the snapshot
    version for per-epoch exports — every row of one epoch's diff
    shares its commit position, exactly like rows of one transaction
    share a WAL position).

    ``from_debezium(to_debezium(diff)) `` round-trips to a changelog
    whose replay reproduces the exporting table's state
    (``debezium_roundtrip`` oracle entry).  Pure narrow projection:
    fuses into the scan, nothing shuffles.
    """
    lsn_col = lsn if not isinstance(lsn, (int, float)) else F.lit(int(lsn))
    payload = [f.name for f in changes.schema[after_col].dataType.fields]

    def image(col: str):
        return F.when(
            F.col(col).isNotNull(),
            F.struct(
                *[F.col(k).alias(k) for k in key_cols],
                *[F.col(f"{col}.{c}").alias(c) for c in payload],
            ),
        )

    op = (
        F.when(F.col(op_col) == "I", F.lit("c"))
        .when(F.col(op_col) == "U", F.lit("u"))
        .when(F.col(op_col) == "D", F.lit("d"))
    )
    op = F.when(
        op.isNull(),
        F.raise_error(F.concat(F.lit("unknown diff op: "), F.col(op_col))),
    ).otherwise(op)
    return changes.select(
        image(before_col).alias("before"),
        image(after_col).alias("after"),
        op.alias("op"),
        F.struct(lsn_col.cast("long").alias("lsn")).alias("source"),
    )
