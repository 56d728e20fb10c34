"""Similarity search over embedding columns.

* ``cosine_topk``        — exact brute-force top-k (the correctness
  baseline; one pass, no shuffle until the final top-k).
* ``IVFIndex``           — a real IVF index: deterministic k-means
  centroids from a bounded sample, the cell assignment persisted ONCE
  as parquet partitioned by cell; each query prunes to its
  ``n_probes`` cells via partition pruning (search cost ~ n_probes /
  n_cells of the corpus, no per-query assignment pass).
* ``srp_lsh_pairs``      — embedding near-duplicate pairs at scale:
  signed-random-projection (Rademacher hyperplane) bit signatures,
  LSH banding, bucket join on (band, bandhash) — the same shuffle
  shape as textdedup.minhash_lsh_pairs (24 bytes/row) — then EXACT
  cosine verification on candidates only.  Approximate recall, exact
  precision.
* ``cosine_neardup_pairs`` — exact all-pairs verifier (O(n^2) self
  join; the ≤10^5-row path and the recall yardstick for the LSH form).

Top-k and pair outputs use deterministic tie-breaks / roundings so
results are oracle-comparable.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cms_spark.functions.vectors import cosine


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


# ---------------------------------------------------------------------
# IVF: build-once index, probe-pruned queries
# ---------------------------------------------------------------------


def _cos_py(a: list[float], b: list[float]) -> float:
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb) if na and nb else 0.0


def _nearest_cell_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """argmax-cosine cell id as a codegen'd array_min over
    (-cos, cell) structs — no UDF, ties break to the lowest cell."""
    entries = [
        F.struct(
            (-cosine(vec, F.array(*[F.lit(float(x)) for x in cvec]))).alias("neg"),
            F.lit(int(ci)).alias("cell"),
        )
        for ci, cvec in enumerate(centroids)
    ]
    return F.array_min(F.array(*entries))["cell"]


class IVFIndex:
    """Inverted-file ANN index over an embedding column.

    ``build`` runs exactly two Spark jobs — a bounded deterministic
    sample for k-means and one full assignment pass written as parquet
    partitioned by ``cell`` — then every query is a partition-pruned
    scan of ``n_probes`` cells.  Centroids live in a JSON sidecar.
    At 100 TB the build is one shuffle-free map + partitioned write;
    queries never touch the other (n_cells - n_probes)/n_cells of the
    corpus (Parquet partition pruning does the skipping).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "_centroids.json")) as f:
            meta = json.load(f)
        self.centroids: list[list[float]] = meta["centroids"]
        self.n_cells: int = len(self.centroids)
        self.id_col: str = meta["id_col"]
        self.vec_col: str = meta["vec_col"]

    @staticmethod
    def build(
        df: DataFrame,
        vec_col: str,
        id_col: str,
        path: str,
        n_cells: int = 16,
        sample_per_cell: int = 32,
        kmeans_iters: int = 5,
        seed: int = 42,
    ) -> "IVFIndex":
        spark = df.sparkSession
        # deterministic bounded sample: top-k by key hash (a TakeOrdered,
        # not a full sort) — order-stable across replays and partitions.
        n_sample = n_cells * sample_per_cell
        sample = [
            [float(x) for x in r["_v"]]
            for r in df.select(F.col(vec_col).alias("_v"), F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
            .orderBy("_h")
            .limit(n_sample)
            .collect()
        ]
        centroids = _kmeans_cosine(sample, n_cells, kmeans_iters)
        assigned = df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            _nearest_cell_expr(F.col(vec_col), centroids).alias("cell"),
        )
        assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
        meta = {"centroids": centroids, "id_col": id_col, "vec_col": vec_col}
        with open(os.path.join(path, "_centroids.json"), "w") as f:
            json.dump(meta, f)
        return IVFIndex(spark, path)

    def topk(self, query_vec: list[float], k: int = 10, n_probes: int = 4) -> DataFrame:
        """Scan only the ``n_probes`` cells nearest the query.  The
        cell ranking is driver-side over n_cells tiny centroids; the
        scan is partition-pruned by the ``cell IN (...)`` predicate."""
        probe = sorted(
            range(self.n_cells),
            key=lambda ci: (-_cos_py(self.centroids[ci], query_vec), ci),
        )[:n_probes]
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = (
            self.spark.read.parquet(self.path)
            .where(F.col("cell").isin(probe))
            .select("vec_id", F.round(cosine(F.col("vec"), q), 4).alias("cos_sim"))
        )
        return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def _kmeans_cosine(sample: list[list[float]], n_cells: int, iters: int) -> list[list[float]]:
    """Spherical k-means on a driver-side sample (numpy, deterministic
    init = first n_cells sample rows).  The sample is bounded
    (n_cells * sample_per_cell rows), so this is O(KB) driver work."""
    import numpy as np

    X = np.asarray(sample, dtype="float64")
    if len(X) == 0:
        raise ValueError("empty sample for IVF build")
    n_cells = min(n_cells, len(X))
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[:n_cells].copy()
    for _ in range(iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        labels = np.argmax(Xn @ Cn.T, axis=1)
        for j in range(n_cells):
            members = Xn[labels == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(x) for x in row] for row in C]


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probes: int = 4,
    index_path: str | None = None,
) -> DataFrame:
    """Convenience wrapper: build (or reuse) the IVF index, query it.
    Pass ``index_path`` to persist/reuse across queries — the whole
    point of IVF; without it a throwaway index is built in a temp dir
    (fine for one-off correctness checks only)."""
    import tempfile

    path = index_path or tempfile.mkdtemp(prefix="ivf_idx_")
    if not os.path.exists(os.path.join(path, "_centroids.json")):
        IVFIndex.build(df, vec_col, id_col, path, n_cells=n_cells)
    idx = IVFIndex(df.sparkSession, path)
    return idx.topk(query_vec, k=k, n_probes=n_probes)


# ---------------------------------------------------------------------
# Portable-hash IVF: data-independent SRP cells, fully oracle-checkable
# ---------------------------------------------------------------------

SRP_MUL = 1315423911
SRP_ADD = 2654435761
SRP_MOD = 2_147_483_647


def _srp_parity_sign(plane_index: Column) -> Column:
    """±1.0 hyperplane component from a multiplicative parity hash —
    deliberately NOT xxhash64 so DuckDB replays it (same rationale as
    textdedup.poly_hash)."""
    par = (
        F.pmod(
            F.lit(SRP_MUL).cast("long") * plane_index.cast("long") + F.lit(SRP_ADD),
            F.lit(SRP_MOD),
        )
        % 2
    )
    return par.cast("double") * 2.0 - 1.0


def srp_cell_portable(vec: Column, cell_bits: int = 4) -> Column:
    """IVF cell id = ``cell_bits`` signed-random-projection signs,
    packed little-endian.  Data-INDEPENDENT partitioning (no k-means,
    no sample, no stored centroids): any engine computes the same cell
    for the same vector, so the cell assignment — the heart of the IVF
    layout — is oracle-checkable end to end.  Near-identical vectors
    share a cell by construction (signs move only when a projection
    crosses 0).

    Supports at most 4096 dimensions: plane components are derived
    from index ``d + j*4096``, so beyond 4096 dims the index ranges of
    different cell bits would overlap and the sign projections become
    correlated (round-3 ADVICE) — a guard raises instead of silently
    degrading."""
    def _term(j: int):
        # closure factory: zip_with requires a 2-arg lambda (a j=j
        # default would make pyspark count 3 parameters).
        return lambda x, d: x.cast("double") * _srp_parity_sign(d + F.lit(j * 4096))

    cell = F.lit(0).cast("long")
    for j in range(cell_bits):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), _term(j)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cell = cell + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    guard = F.when(
        F.size(vec) > 4096,
        F.raise_error(F.lit("srp_cell_portable supports at most 4096 dimensions")),
    ).otherwise(F.lit(0)).cast("long")
    return cell + guard


def srp_cell_portable_py(vec: list[float], cell_bits: int = 4) -> int:
    """Driver-side twin of ``srp_cell_portable`` (same fold order →
    same doubles) — used to pick the probe cells for a query vector."""
    if len(vec) > 4096:
        raise ValueError("srp_cell_portable supports at most 4096 dimensions")
    cell = 0
    for j in range(cell_bits):
        proj = 0.0
        for d, x in enumerate(vec):
            par = ((SRP_MUL * (d + j * 4096) + SRP_ADD) % SRP_MOD) % 2
            proj += float(x) * (par * 2.0 - 1.0)
        if proj >= 0:
            cell |= 1 << j
    return cell


def ivf_portable_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    cell_bits: int = 4,
    max_flip: int = 1,
) -> DataFrame:
    """IVF probe with portable SRP cells: score ONLY the cells within
    ``max_flip`` sign flips of the query's cell (5 of 16 cells at the
    defaults — a literal ``cell IN (...)`` predicate, i.e. partition
    pruning when the assignment is persisted partitioned by cell, as
    ``IVFIndex`` does for the k-means form).  Exact cosine + top-k
    with deterministic tie-break over the probed subset."""
    qcell = srp_cell_portable_py(query_vec, cell_bits)
    probe = [c for c in range(1 << cell_bits) if bin(c ^ qcell).count("1") <= max_flip]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cells = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        srp_cell_portable(F.col(vec_col), cell_bits).alias("cell"),
    )
    scored = cells.where(F.col("cell").isin(probe)).select(
        "vec_id", F.round(cosine(F.col("_v"), q), 4).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


# ---------------------------------------------------------------------
# Near-duplicate pairs
# ---------------------------------------------------------------------


def srp_bits(vec: Column, n_bits: int = 32, seed: int = 42) -> Column:
    """Signed-random-projection signature: bit j = sign(<v, r_j>)
    where r_j is a Rademacher (±1) hyperplane derived from
    xxhash64(j, dim, seed) — deterministic, no stored planes, pure
    codegen array folds.  P(bits agree) = 1 - angle(u,v)/pi."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda j: (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda x, d: x.cast("double")
                    * (F.pmod(F.xxhash64(j, d, F.lit(seed)), 2).cast("double") * 2.0 - 1.0),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0
        ).cast("int"),
    )


def srp_lsh_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs via SRP-LSH banding + exact verify.

    Same shuffle shape as textdedup.minhash_lsh_pairs: the band join
    moves only (id, band, bandhash); vectors are re-attached to the
    (far smaller) candidate set for exact cosine verification, so
    precision is exact and only recall is approximate.  For
    threshold 0.95 (angle ≤ 18.2°, per-bit agreement ≥ 0.899) the
    default 8 bands × 4 bits give candidate probability ≥ 0.9998;
    identical vectors are always found (identical signatures).
    Output: (id_a, id_b, cos_sim), id_a < id_b, cos_sim rounded 4dp.
    """
    rows_per_band = n_bits // bands
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    sigs = base.select("_id", srp_bits(F.col("_v"), n_bits, seed).alias("_bits"))
    banded = sigs.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(F.col("_bits"), b * rows_per_band + j + 1).cast("string")
                            for j in range(rows_per_band)
                        ],
                    ),
                    b,
                ),
            )
        ).alias("_band", "_bhash"),
    )
    a = banded.select(F.col("_id").alias("id_a"), "_band", "_bhash")
    b = banded.select(F.col("_id").alias("id_b"), "_band", "_bhash")
    cand = (
        a.join(b, ["_band", "_bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    withv = cand.join(
        base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va")), "id_a"
    ).join(base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb")), "id_b")
    out = withv.withColumn(
        "cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 4)
    ).where(F.col("cos_sim") >= threshold)
    return out.select("id_a", "id_b", "cos_sim")


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """EXACT all-pairs near-dup (O(n^2) self-join) — the verifier /
    recall yardstick for ``srp_lsh_pairs`` and the direct path below
    ~10^5 rows.  Use ``srp_lsh_pairs`` as the default at scale."""
    lhs = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    rhs = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    out = (
        lhs.crossJoin(rhs)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .where(F.col("cos_sim") >= threshold)
    )
    return out.select("id_a", "id_b", "cos_sim")
