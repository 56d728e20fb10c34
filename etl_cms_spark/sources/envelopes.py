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
