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
      position differently).

    Returns columns ``[*key_cols, *payload_cols, lsn, op]`` — ready
    for ``fold_partial_updates`` / ``latest_by_lsn`` and
    ``LakeTable.merge_epoch``.
    """
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

    return df.select(
        *[
            F.coalesce(F.col(f"{after_col}.{k}"), F.col(f"{before_col}.{k}")).alias(k)
            for k in key_cols
        ],
        *[F.col(f"{after_col}.{c}").alias(c) for c in payload_cols],
        F.expr(lsn_expr).cast("long").alias("lsn"),
        op_mapped.alias("op"),
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
