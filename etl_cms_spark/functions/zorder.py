"""Z-order (Morton) interleaved sort keys for MULTI-column row-group
clustering — pure JVM column expressions, no Python in the loop.

The linear ``compact(cluster_by=[a, b])`` layout sorts
lexicographically, so parquet row-group min/max stats are tight on
``a`` but on ``b`` only within ties of ``a`` — with a high-cardinality
leading column the second column never prunes.  Interleaving the bits
of per-column RANK indices instead gives every clustered column a
bounded coordinate range inside each row group (a z-curve range is a
sub-rectangle of the value space), so selective predicates on ANY of
the clustered columns skip row groups.  This is the Delta/Iceberg
``OPTIMIZE ZORDER BY`` layout re-expressed as a Spark sort key.

Per-column index construction (all codegen-friendly expressions):

* numeric / date / timestamp — rank-bucket against ``2^bits - 1``
  approx-quantile boundaries (one bounded ``approxQuantile`` driver
  action per ``zorder_key`` call: ≤ cols × 255 doubles; quantile
  buckets make the curve robust to skew, where uniform min/max
  bucketing would collapse under a heavy hitter).  NULLs take index 0
  (sort first, deterministic).
* string — LEXICOGRAPHIC rank against boundaries drawn from a
  bounded deterministic sample (top-4096 by value hash — a map-side
  TakeOrdered, no shuffle).  Rank, not hash: parquet string stats
  prune by [min, max] RANGE, so the curve coordinate must preserve
  lexicographic adjacency or a predicate value lexicographically
  between two present values "overlaps" every row group.
* boolean — cast to {0, 1}.
* binary / other — ``xxhash64 mod 2^bits`` (equality grouping only;
  footer stats rarely prune these).

The interleave itself is ``bits × cols`` shift/mask expressions folded
into one BIGINT — wide but flat, and whole-stage codegen compiles it
to straight-line JVM bytecode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAX_TOTAL_BITS = 63  # result must fit a signed BIGINT


def interleave_bits(indices: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide non-negative integer columns
    into one BIGINT: bit ``i`` of column ``j`` lands at position
    ``i * k + (k - 1 - j)`` — column 0 owns the most significant bit
    of every group, so earlier ``cluster_by`` columns keep (slightly)
    coarser-grained priority, matching the linear layout's intuition."""
    k = len(indices)
    if k == 0:
        raise ValueError("interleave_bits: need at least one index column")
    if bits * k > _MAX_TOTAL_BITS:
        raise ValueError(
            f"interleave_bits: {k} columns x {bits} bits = {bits * k} "
            f"> {_MAX_TOTAL_BITS} result bits"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, idx in enumerate(indices):
            bit = F.shiftright(idx.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * k + (k - 1 - j)))
    return out


def _rank_index(col: Column, boundaries: list, bits: int) -> Column:
    """Index in [0, 2^bits): count of quantile boundaries <= value
    (numeric or string — Spark compares either kind against literals),
    SCALED across the full bit range.  The scaling matters: a
    low-cardinality column (6 langs -> raw ranks 0..6) would otherwise
    vary only in its LOW bits, and the interleave would hand the
    entire high-order curve to the other columns — i.e. no clustering
    for exactly the columns clustering helps most.  NULL comparisons
    yield false everywhere -> index 0 (nulls sort first)."""
    if not boundaries:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in boundaries])
    idx = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(col >= b, F.lit(1)).otherwise(F.lit(0)),
    )
    hi = (1 << bits) - 1
    return F.floor(idx * F.lit(hi) / F.lit(len(boundaries))).cast("int")


_STRING_SAMPLE = 4096


def _string_boundaries(df: DataFrame, name: str, bits: int) -> list[str]:
    """Lexicographic rank boundaries for a string column from a
    deterministic bounded sample: one representative DISTINCT value
    per hash bucket (groupBy 4096 buckets + min — map-side combined,
    the driver collects at most 4096 rows regardless of input size),
    sorted, cut at 2^bits quantile positions.  Low-cardinality
    columns (the common clustering case) are captured exactly;
    high-cardinality ones get an approximate but order-preserving
    rank, which is all the curve needs."""
    rows = (
        df.select(F.col(name).alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy(F.pmod(F.xxhash64(F.col("_v")), F.lit(_STRING_SAMPLE)))
        .agg(F.min("_v").alias("_v"))
        .collect()
    )
    vals = sorted({r._v for r in rows})
    n_cuts = (1 << bits) - 1
    if len(vals) <= n_cuts:
        return vals
    out: list[str] = []
    for i in range(1, n_cuts + 1):
        v = vals[(i * len(vals)) // (n_cuts + 1)]
        if not out or v > out[-1]:
            out.append(v)
    return out


def _as_number(name: str, dt: T.DataType) -> Column | None:
    """Numeric view of a column for quantile bucketing, or None if the
    type has no meaningful order embedding (strings hash instead)."""
    c = F.col(name)
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.to_date(F.lit("1970-01-01"))).cast("double")
    if isinstance(dt, T.TimestampType):
        return c.cast("double")  # seconds since epoch
    return None


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    relative_error: float = 0.01,
) -> Column:
    """Z-order sort key over ``cols`` for ``df``.

    Runs bounded driver actions to learn rank boundaries — ONE
    ``approxQuantile`` across all orderable columns at once, plus one
    4096-bucket representative sample per STRING column — then
    returns a pure column expression; callers sort by it exactly like
    any other column.  Cost model at 100 TB: each boundary pass is a
    map-side-combined aggregate over the data being rewritten (and
    compaction, the intended call site, is already a full rewrite of
    its target buckets), every collect is ≤ 4096 rows, and the key
    itself is codegen'd arithmetic.
    """
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    if bits < 1 or bits * len(cols) > _MAX_TOTAL_BITS:
        raise ValueError(
            f"zorder_key: {len(cols)} columns x {bits} bits must be in "
            f"[1, {_MAX_TOTAL_BITS}]"
        )
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder_key: no such columns {missing}")

    numeric: dict[str, Column] = {}
    for c in cols:
        num = _as_number(c, dtypes[c])
        if num is not None:
            numeric[c] = num

    boundaries: dict[str, list[float]] = {}
    if numeric:
        probe = df.select(
            *[expr.alias(f"_z_{c}") for c, expr in numeric.items()]
        )
        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        quants = probe.approxQuantile(
            [f"_z_{c}" for c in numeric], probs, relative_error
        )
        for c, qs in zip(numeric, quants):
            # dedupe: a skewed column repeats boundaries; keeping one
            # copy keeps the index strictly monotone in the value.
            seen: list[float] = []
            for b in qs:
                if not seen or b > seen[-1]:
                    seen.append(b)
            boundaries[c] = seen

    indices: list[Column] = []
    for c in cols:
        dt = dtypes[c]
        if c in numeric:
            indices.append(_rank_index(numeric[c], boundaries[c], bits))
        elif isinstance(dt, T.StringType):
            indices.append(
                _rank_index(F.col(c), _string_boundaries(df, c, bits), bits)
            )
        elif isinstance(dt, T.BooleanType):
            indices.append(F.col(c).cast("int"))
        else:
            # binary / anything else: equality clustering via a
            # stable hash (footer stats rarely prune these anyway).
            indices.append(
                F.pmod(F.xxhash64(F.col(c)), F.lit(1 << bits)).cast("int")
            )
    return interleave_bits(indices, bits)
