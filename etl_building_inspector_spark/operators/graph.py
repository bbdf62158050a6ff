"""Bounded graph traversal: BFS hop distance from a seed set.

The frontier/delta-iteration shape — the third iterative-graph pattern
next to min-label CC (diameter rounds, full edge set each round) and
alternating star CC (log rounds, shrinking edges). BFS only ever joins
the CURRENT FRONTIER against the edges: per round the shuffled volume
is O(frontier ∂ edges), not O(all edges), which is what makes k-hop
queries (contamination blast radius, near-dup neighborhoods, related-
document expansion) cheap even on a 100 TB-scale pair graph — the
frontier decays after the first hops in power-law graphs.

Per round: one equi-join (frontier → neighbors) + one left-anti join
(drop already-visited) + a distinct. All shuffles key on node id.
localCheckpoint per round cuts lineage; superseded rounds' blocks are
freed (operators/_cache contract). max_hops bounds state and rounds —
the BFS twin of a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import free_local_checkpoint, track_local_checkpoint, track_persist


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_hops: int = 3,
) -> DataFrame:
    """Minimum hop distance (0..max_hops) from any seed node over the
    undirected `edges` graph. Returns (node, hops); nodes further than
    max_hops (or unreachable) are absent. `seeds` must have one
    column; seed nodes get hops=0 whether or not they appear in
    edges."""
    sym = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    ).unionByName(
        edges.select(F.col(dst).cast("long").alias("s"), F.col(src).cast("long").alias("d"))
    )
    sym = track_persist(sym)
    frontier = track_local_checkpoint(
        seeds.select(F.col(seeds.columns[0]).cast("long").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
    )
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = track_local_checkpoint(
            sym.join(frontier, sym["s"] == frontier["node"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
        )
        if nxt.limit(1).count() == 0:
            free_local_checkpoint(nxt)
            break
        new_visited = track_local_checkpoint(visited.unionByName(nxt))
        # the union is materialized; the per-round pieces are now dead
        free_local_checkpoint(visited)
        if frontier is not visited:
            free_local_checkpoint(frontier)
        free_local_checkpoint(nxt)
        visited = new_visited
        frontier = new_visited.filter(F.col("hops") == h)
    return visited
