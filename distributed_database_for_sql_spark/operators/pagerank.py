"""Fixed-iteration weighted PageRank as a DataFrame loop.

Iterative algorithms are the one class of computation a single declarative
query can't express; the Spark-native shape is a driver-side loop over
DataFrames where each iteration is one shuffle (join ranks to edges on
src, aggregate contributions by dst).  The loop unrolls into a single
lazy plan — nothing is collected between iterations — and for a fixed,
small iteration count the lineage stays shallow enough that no
checkpointing is needed (for long loops, callers should checkpoint every
~10 iterations to cut lineage growth).

Semantics (classic damped PageRank on a weighted digraph):

    rank_0(v)   = 1 / N
    rank_t+1(v) = (1-d)/N  +  d * sum_{u->v} rank_t(u) * w(u,v) / outw(u)

Nodes with no outgoing edges leak their damped mass (no dangling-mass
redistribution) — the simplest standard variant, and exactly what the
DuckDB oracle recomputes.

Scale: each iteration shuffles the edge table once on src (join) and
once on dst (agg).  At 100 TB the edge table should be pre-partitioned
by src and the per-node frames are tiny by comparison; the rank frame is
re-used across iterations so AQE can pick broadcast when N is small.

The reference implements no graph (or any) operators (SURVEY.md §2.A —
a Go Raft core); this extends the §2.C target surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Run `iterations` rounds of weighted PageRank over an edge frame.

    Returns one row per node (column `node`) with its final `rank`.
    The node set is the union of sources and destinations."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")

    # The edge build may be expensive (e.g. multi-join over a fact
    # table); everything downstream re-reads it, so cache it — and the
    # node set, which every iteration's left join re-references.
    edges = edges.persist()
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct()
             .persist())
    n_nodes = nodes.count()  # one scalar; drives the teleport term

    outw = edges.groupBy(src).agg(F.sum(weight).alias("__outw"))
    # Edge transition probability src -> dst; computed once and reused
    # by every iteration.
    trans = (edges.join(outw, src)
             .select(F.col(src).alias("__src"), F.col(dst).alias("__dst"),
                     (F.col(weight) / F.col("__outw")).alias("__p"))
             .persist())

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contrib = (
            trans.join(ranks, trans["__src"] == ranks["node"])
            .select(F.col("__dst").alias("node"),
                    (F.col("rank") * F.col("__p")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                 ).alias("rank"),
            )
        )
    return ranks
