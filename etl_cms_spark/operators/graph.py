"""Connected components over near-duplicate pair graphs — the step a
100 TB dedup pipeline runs AFTER pair generation: LSH emits edges
(near-dup pairs), components turn them into dedup GROUPS, and one
canonical document per group survives.

Algorithm: iterative min-label propagation on the DataFrame API (no
GraphFrames/GraphX dependency): every node starts labeled with
itself; each round a node takes the min label among itself and its
neighbors; fixpoint = every node carries the min node id of its
component.

Scale shape (the reason this is written the way it is):

* each round is ONE hash-partitioned join (edges ⨝ labels on the
  node key) + ONE map-side-combined min aggregation — no driver-side
  graph, no collect of anything but the per-round changed-count
  scalar;
* the symmetric edge list and each round's labels are pinned with
  ``localCheckpoint`` so the loop's lineage stays O(1) instead of
  growing a plan per round (the classic iterative-Spark failure
  mode);
* rounds needed = max component DIAMETER, not component count.
  Near-dup components are band-cliques plus short bridges (diameter
  ≲ 3-4 in practice), so the loop terminates in a handful of rounds
  at any corpus size.  Adversarial long-chain graphs would need the
  large-star/small-star variant (O(log n) rounds); out of scope
  here and guarded by ``max_iter`` raising rather than silently
  returning partial labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "doc_id",
    label_out: str = "component_id",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node appearing in ``edges`` with the MIN node id of
    its connected component (deterministic, replay-stable canonical
    representative).  Nodes with no edges are absent — a document
    without near-dups belongs to no dedup group."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prop = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("label")
        )
        new = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        n_changed = (
            new.join(labels.withColumnRenamed("label", "_old"), "node")
            .where(F.col("label") != F.col("_old"))
            .count()
        )
        labels = new
        if n_changed == 0:
            return labels.select(
                F.col("node").alias(id_out), F.col("label").alias(label_out)
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds the bound — use a star-contraction "
        "variant for chain-shaped graphs)"
    )


def dedup_groups(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "doc_id",
) -> DataFrame:
    """Components + the canonical pick: one row per grouped document
    with its component id and whether it is the group's survivor
    (the min-id member — deterministic across replays and engines)."""
    comp = connected_components(edges, src, dst, id_out=id_out)
    return comp.select(
        id_out,
        "component_id",
        (F.col(id_out) == F.col("component_id")).alias("is_canonical"),
    )
