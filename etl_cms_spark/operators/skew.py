"""Hot-key skew handling (SURVEY.md §4: "salting for hot repo keys").

AQE's skew-join splitting covers joins; ``groupBy`` dedup over a
Zipf-skewed repo key still funnels a hot key into one reducer.  The
two-phase salted form below bounds any single task's input at
``rows(key)/n_salts`` for phase 1, then reduces only the n_salts
partial winners in phase 2 — the classic partial-aggregation trick
applied to ``max_by``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_latest_by_lsn(
    df: DataFrame,
    key_cols: Sequence[str],
    lsn_col: str = "lsn",
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase max-LSN dedup: phase 1 reduces within (key, salt)
    buckets, phase 2 reduces the <= n_salts survivors per key.
    Result is identical to ``dedup.latest_by_lsn``.

    Both phases are ROW_NUMBER windows, not ``max_by(struct(...))``
    aggregations (r6): the struct agg buffer compiles each phase to
    TWO SortAggregates with a sort each, while a window is one
    Exchange plus WindowGroupLimit, which prunes every map partition
    to its per-group top-1 before the shuffle.  Skew bounds are
    unchanged — phase 1 partitions on (key, salt) so a hot key spreads
    over n_salts reducers, phase 2 sees at most n_salts rows per key.

    Note: Spark's map-side top-1 pruning (WindowGroupLimit) already
    handles *moderate* skew; explicit salting is for the pathological
    case where even one key's per-map-partition winners overwhelm a
    reducer (10^10-event changelogs with a megarepo).
    """
    payload = [c for c in df.columns if c not in key_cols]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(lsn_col)), F.lit(n_salts)))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(F.col(lsn_col).desc())
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col(lsn_col).desc())
    phase2 = (
        phase1.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return phase2.select(*key_cols, *payload)


def estimate_key_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    sample_frac: float = 0.02,
    seed: int = 7,
    min_sampled: int = 5000,
) -> tuple[float, int]:
    """(top_key_share, estimated_rows) of a batch, measured on a
    ``sample_frac`` Bernoulli sample of the KEY COLUMNS ONLY (narrow
    rows; the payload is never read).

    One cheap extra job per decision — the sample shrinks the shuffle
    to ~``sample_frac`` of the batch's (key) pairs, and hot keys are
    by definition the ones a small sample estimates well (a key with
    p% of 10^7+ events appears ~p% of any 2% sample; keys too rare to
    sample reliably are also too cold to matter for the decision).
    Deterministic ``seed`` so a replayed epoch resolves identically.

    A sample below ``min_sampled`` rows is too noisy to trust (a
    40-row sample calls a uniform batch "hot"); such a batch is small
    enough (≲ min_sampled/sample_frac rows) that an EXACT narrow pass
    over it is itself cheap, so we take one instead — in that case
    the row estimate is exact.

    Returns (0.0, 0) for an empty batch.
    """
    keys = df.select(*key_cols)
    s = keys.sample(fraction=sample_frac, seed=seed)
    row = (
        s.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n").alias("_mx"), F.sum("_n").alias("_tot"))
        .first()
    )
    scale = 1.0 / sample_frac
    if row is None or not row["_tot"] or row["_tot"] < min_sampled:
        row = (
            keys.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("_mx"), F.sum("_n").alias("_tot"))
            .first()
        )
        scale = 1.0
    if row is None or not row["_tot"]:
        return 0.0, 0
    share = float(row["_mx"]) / float(row["_tot"])
    return share, int(row["_tot"] * scale)


def estimate_top_key_share(
    df: DataFrame,
    key_cols: Sequence[str],
    sample_frac: float = 0.02,
    seed: int = 7,
    min_sampled: int = 5000,
) -> float:
    """The share component of ``estimate_key_stats`` (see there)."""
    return estimate_key_stats(df, key_cols, sample_frac, seed, min_sampled)[0]
