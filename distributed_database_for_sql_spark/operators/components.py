"""Connected components over a pair list — near-dup pairs → dedup groups.

Pairwise near-duplicate detection (MinHash/LSH, SimHash, embedding cosine)
emits EDGES; deduplication needs GROUPS: if A~B and B~C, then {A,B,C} is
one cluster and one survivor should be kept.  That's the connected
components of the similarity graph — transitive closure, not expressible
as a fixed-depth SQL query.

Algorithm: iterative min-label propagation (the DataFrame form of
large-star/small-star).  Each node's label starts as its own id; every
round each node adopts the minimum label in its closed neighborhood; stop
when no label changes.  Rounds needed ≈ graph diameter ≤ O(log n) for the
short chains dedup graphs produce.

Scale notes:
- Each round is one shuffle (groupBy node) over the edge list — the same
  loop GraphX/GraphFrames run; no driver-side adjacency structure, edges
  never leave the cluster.
- Convergence check is a distributed count of changed labels (a scalar
  action per round), not a collect of the labels.
- Iterations persist their label frame and unpersist the previous one —
  lineage would otherwise grow unboundedly (each round would recompute
  all prior rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in `pairs`; component = min node id
    reachable via the undirected edge set."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()

    for _ in range(max_iter):
        # Candidate labels: own label + each neighbor's label.
        neighbor_labels = (
            edges.join(labels, edges.v == labels.node)
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.select("node", "label").union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels.select("node", F.col("label").alias("component"))
