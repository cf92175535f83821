"""Graph operators over an edge list derived from event co-occurrence:
edge extraction with a flood cap, and multi-source BFS hop counts.

The companion to operators/curation.py's connected components: components
answer "which nodes touch at all", BFS hop counts answer "how close" —
the building block for influence radii, fraud-ring proximity, and
crawl-frontier scheduling over user/item interaction graphs.

Reference parity: none (beyond-parity).  The DuckDB oracle for BFS is a
recursive CTE bounded by the same max_hops, so every (node, hop) value is
cross-checked exactly — hop counts are pure integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def co_occurrence_edges(
    df: DataFrame,
    key_cols: list,
    node_col: str = "user_id",
    max_bucket_size: int = 20,
) -> DataFrame:
    """Undirected edges (src < dst) between nodes that share a bucket key
    (e.g. same item touched within the same hour).

    Scale: the bucket reduces to DISTINCT (key, node) first, then a
    per-bucket size cap (`max_bucket_size`) drops flood buckets BEFORE the
    self-join — the same discipline as the MinHash banding join: candidate
    pairs are O(buckets × cap²), never all-pairs, and one adversarial
    mega-bucket (a bot item every user touched) cannot go m².  Both joins
    are hash equi-joins on the bucket key."""
    keyed = df.select(
        *[F.col(c).alias(f"k{i}") for i, c in enumerate(key_cols)],
        F.col(node_col).alias("node"),
    ).distinct()
    kc = [f"k{i}" for i in range(len(key_cols))]
    ok = keyed.groupBy(*kc).agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") <= max_bucket_size
    )
    capped = keyed.join(ok.select(*kc), kc)
    a = capped.select(*kc, F.col("node").alias("src"))
    b = capped.select(*kc, F.col("node").alias("dst"))
    return (
        a.join(b, kc)
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str | None = None,
) -> DataFrame:
    """Multi-source BFS over the undirected edge list: (node, hop) with the
    MINIMUM hop distance from any seed, limited to `max_hops`.  Nodes a
    frontier reaches for the first time get that round's hop — first
    visit IS the minimum, so no final re-aggregation is needed and the
    result is order-independent (deterministic on any engine/partitioning).

    ``seeds`` contributes exactly one column of node ids: pass its name as
    ``seed_col``, or leave it None for a single-column frame.  A
    multi-column seeds frame without an explicit ``seed_col`` raises —
    silently guessing a column would make the hop origin ambiguous.

    Scale: max_hops rounds, each ONE hash equi-join (frontier ⋈ edges on
    the node id) + a distinct + an anti-join against the visited set;
    per-round lineage is cut with localCheckpoint (the house iterative
    pattern, see operators/curation.connected_components).  Frontier and
    visited frames hold (node, hop) only — never edge payloads.  The
    driver never sees rows; each round is O(frontier-degree sum)."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    sym = sym.localCheckpoint(eager=True)
    if seed_col is None:
        if len(seeds.columns) != 1:
            raise ValueError(
                "seeds has columns "
                f"{seeds.columns}; pass seed_col to pick the node-id column"
            )
        seed_col = seeds.columns[0]
    visited = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast(IntegerType()))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for i in range(1, max_hops + 1):
        reached = (
            frontier.join(sym, frontier.node == sym.s)
            .select(F.col("d").alias("node"))
            .distinct()
        )
        fresh = (
            reached.join(visited, "node", "left_anti")
            .withColumn("hop", F.lit(i).cast(IntegerType()))
            .localCheckpoint(eager=True)
        )
        if fresh.isEmpty():
            break
        visited = visited.union(fresh).localCheckpoint(eager=True)
        frontier = fresh
    return visited.select(F.col("node"), F.col("hop"))
