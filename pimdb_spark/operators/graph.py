"""Graph operators over an edge list derived from event co-occurrence:
edge extraction with a flood cap, multi-source BFS hop counts, PageRank,
and triangle counting.

The companion to operators/curation.py's connected components: components
answer "which nodes touch at all", BFS hop counts "how close", PageRank
"how central", triangles "how clustered" — the building blocks for
influence radii, fraud-ring proximity, and crawl-frontier scheduling
over user/item interaction graphs.

Reference parity: none (beyond-parity).  Oracles: BFS is a recursive CTE
bounded by the same max_hops (integer-exact); PageRank unrolls the same
power iterations with ordered-fold contribution sums (bit-exact floats,
the kmeans discipline); triangles are exact integer counts.
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


def pagerank(
    edges: DataFrame,
    n_iter: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over the undirected edge list (both directions walk), the
    classic importance score for interaction graphs.  Returns (node, rank)
    after ``n_iter`` power iterations from the uniform vector.

    Bit-determinism (the house rule for float iteration, see
    clustering.kmeans_assignments): each node's incoming contributions are
    summed as an ORDERED fold over neighbors sorted by source id — never a
    partial-aggregation-order groupBy sum — so every iteration is exactly
    reproducible and a DuckDB oracle can unroll the same iterations to the
    last bit.  The node count rides along as a one-row broadcast attach
    (never collected to the driver).

    Scale: per iteration, ONE hash equi-join (ranks ⋈ edges on the source
    node) + one groupBy on the destination — both partition on a node id,
    so AQE reuses the exchange; state is (node, rank, degree) only.  The
    ordered fold makes the per-group cost O(degree) with an O(degree)
    collected list: for web-scale supernodes swap the fold for a plain
    sum (losing bit-parity, not correctness).  A symmetric simple graph
    has no dangling nodes, so no dangling-mass redistribution term is
    needed; rank mass is conserved by construction."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    n_row = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    # (node, deg, n): the per-node loop state frame
    state = deg.crossJoin(F.broadcast(n_row)).select(
        F.col("s").alias("node"), "deg", "n", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = sym.join(
            state.select(
                F.col("node").alias("s"), (F.col("rank") / F.col("deg")).alias("c")
            ),
            "s",
        )
        summed = contrib.groupBy("d").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(F.col("s"), F.col("c")))),
                F.lit(0.0),
                lambda acc, v: acc + v["c"],
            ).alias("in_sum")
        )
        state = (
            state.join(summed, state.node == summed.d)
            .select(
                "node",
                "deg",
                "n",
                (
                    (1.0 - damping) / F.col("n") + damping * F.col("in_sum")
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select("node", "rank")


def triangle_count(
    edges: DataFrame,
    max_degree: int | None = None,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge list
    (rows src < dst, distinct).  Returns (node, n_triangles) for every
    node on at least one triangle.

    Each triangle a<b<c is generated exactly once: (a,b) ⋈ (b,c) wedges
    (the shared vertex is the middle id) closed by an (a,c) edge-existence
    semi-check — two hash equi-joins, never a cross product.  With
    ``max_degree``, vertices above the cap are dropped first (both the
    wedge volume Σ deg(b)² and the output drop; the standard high-degree
    mitigation — a celebrity node's triangles are rarely worth their
    quadratic wedge cost, and the drop is explicit, not an overflow).

    Scale: wedge volume is Σ_b deg(b)² bounded by the cap; the close join
    ships (a, b, c) triples keyed on (a, c).  Per-node counts come from
    exploding each triangle's three corners — 3 rows per triangle, one
    final groupBy."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    if max_degree is not None:
        sym = e.select(F.col("a").alias("v")).union(e.select("b"))
        ok = (
            sym.groupBy("v")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") <= max_degree)
            .select("v")
        )
        e = (
            e.join(ok.withColumnRenamed("v", "a"), "a")
            .join(ok.withColumnRenamed("v", "b"), "b")
            .select("a", "b")
        )
    wedges = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )  # a<b<c by construction
    closed = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    ).select("a", "b", "c")
    corners = closed.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) over the undirected edge list: every node starts in its own
    community (label = node id) and each round adopts the MOST FREQUENT
    label among its neighbors, ties broken by the smallest label — a
    deterministic total order, so the result is exactly reproducible and
    a DuckDB oracle can unroll the identical rounds (the pagerank
    discipline, with no float state at all: labels and counts are
    integers).  Distinct from connected components (dedup.dup_clusters):
    LPA converges to DENSE regions — bridges between communities do not
    merge them the way any path does for components.

    Returns (node, label) after ``n_iter`` rounds for every node with at
    least one edge.

    Scale: per round, ONE hash equi-join (labels ⋈ edges on the source
    node), one (dst, label) groupBy count, and one per-node window argmax
    — all partitioned on node ids, so AQE reuses the exchange; state is
    (node, label) only.  Lineage is cut per round with localCheckpoint —
    the iterative-plan-depth rule."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    labels = sym.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(n_iter):
        counts = (
            sym.join(labels.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
    return labels
