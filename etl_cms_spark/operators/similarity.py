"""Similarity search over embedding columns.

* ``cosine_topk``       — exact brute-force top-k (the correctness
  baseline; one pass, no shuffle until the final top-k).
* ``ivf_topk``          — IVF-style: deterministic centroid seeds,
  vectors assigned to nearest centroid once, queries probe only
  ``n_probes`` cells — the scale path (search cost / ncells).
* ``cosine_neardup_pairs`` — all pairs above a cosine threshold via
  LSH-free blocked self-join (small n) — used by the embedding
  near-dup deduper.

Top-k uses a deterministic tie-break (score desc, id asc) so results
are oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_cms_spark.functions.vectors import cosine, dot, norm


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.
    The query folds into the plan as an array literal — every score
    is a codegen'd array fold; the only exchange is the final top-k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probes: int = 4,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids are the ``n_cells`` lowest-id vectors (deterministic —
    at scale you'd k-means these offline; the assignment/probe
    machinery is identical).  Vectors are assigned to their nearest
    centroid; the query scans only its ``n_probes`` nearest cells.
    """
    cents = [
        (r[0], [float(x) for x in r[1]])
        for r in df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(n_cells).collect()
    ]

    def nearest_cell_expr(vec):
        entries = [
            F.struct(
                (-cosine(vec, F.array(*[F.lit(x) for x in cvec]))).alias("neg"),
                F.lit(int(ci)).alias("cell"),
            )
            for ci, cvec in cents
        ]
        return F.array_min(F.array(*entries))["cell"]

    assigned = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        nearest_cell_expr(F.col(vec_col)).alias("_cell"),
    )
    # driver-side: rank cells for the query (n_cells is tiny).
    import math

    def cos_py(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe_cells = [
        ci for ci, _ in sorted(cents, key=lambda c: -cos_py(c[1], query_vec))[:n_probes]
    ]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = assigned.where(F.col("_cell").isin(probe_cells)).select(
        "vec_id", F.round(cosine(F.col("_v"), q), 4).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    block_bits: int = 0,
) -> DataFrame:
    """All (id_a, id_b, cos_sim) pairs with cosine >= threshold.

    With block_bits=0 this is the exact O(n^2) self-join (fine to
    ~10^5 rows).  With block_bits>0, a sign-pattern block key from the
    first ``block_bits`` dimensions prunes the join (near-identical
    vectors share signs with high probability) — approximate."""
    lhs = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    rhs = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if block_bits > 0:
        def block_key(vec):
            return F.concat_ws(
                "",
                *[
                    F.when(F.element_at(vec, j + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
                    for j in range(block_bits)
                ],
            )
        lhs = lhs.withColumn("_blk", block_key(F.col("_va")))
        rhs = rhs.withColumn("_blk", block_key(F.col("_vb")))
        joined = lhs.join(rhs, "_blk")
    else:
        joined = lhs.crossJoin(rhs)
    out = (
        joined.where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .where(F.col("cos_sim") >= threshold)
    )
    return out.select("id_a", "id_b", "cos_sim")
