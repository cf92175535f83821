"""Distributed k-means over embedding columns (Lloyd's algorithm as pure
DataFrame plans) — the clustering primitive a training-data pipeline uses
for corpus partitioning, diversity sampling, and IVF coarse quantizers
(operators/similarity.ivf_topk consumes exactly this kind of centroid
table).

Reference parity: none (beyond-parity family, like dedup/ANN).

Design for 100 TB:
- Assignment is a PROJECTION: the k centroid rows collapse to a ONE-ROW
  broadcast array (the ivf_topk / pq_encode house shape) and each vector
  computes its argmin in place — zero exchanges, no shuffle of the
  candidates at all.  (Until builder r19 this was a k-row broadcast
  nested-loop + a per-vector min(struct(dist, cid)) groupBy, which
  shuffled one corpus-sized row per vector per assignment pass; the
  projection form computes the identical doubles with the identical
  lowest-distance-then-lowest-cid tie-break — array_min's struct
  ordering IS min(struct)'s — so assignments are bit-identical.)
- Because the assignment is a projection, the assigned frame can carry
  the vector column for free, and the centroid update consumes it
  directly — the (assignment ⋈ vectors) shuffle join the aggregate form
  needed is gone.  One exchange per Lloyd's iteration total (the
  cluster-id update shuffle).
- The update step shuffles once on cluster id.  Two variants:
  * exact=True (default): per-cluster ordered fold — collect_list of
    (id, vector), sorted by id, folded left-to-right in double — so the
    centroid is BIT-DETERMINISTIC across engines and runs, which is what
    makes the whole iteration oracle-checkable (float + is not
    associative; a plain avg depends on partial-agg order).  Memory is
    O(cluster size x dim) per group — fine up to tens of millions of
    rows per cluster; beyond that use exact=False.
  * exact=False: posexplode + avg per (cluster, dimension) — fully
    scalable partial aggregation, deterministic up to float summation
    order (last-ulp).
- Empty clusters keep their previous centroid (left join + coalesce), so
  k never silently shrinks.
- Iterations are a driver-side loop over DataFrames (the idiomatic Spark
  form of iterative ML — compare MLlib KMeans); each iteration extends
  the plan, so for many iterations localCheckpoint the centroid frame
  (k rows — trivial) to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def init_centroids(
    vecs: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic init: the k smallest-id vectors, cid = 0..k-1 in id
    order (seeded sampling would also do; smallest-id keeps the oracle
    trivial)."""
    w = Window.orderBy(id_col)
    return (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cvec"),
        )
    )


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """Collapse the k-row (cid, cvec) centroid table to a ONE-ROW
    broadcastable frame holding `_cents`: array of (cid, cvec) structs in
    cid order (array_sort compares the leading cid; cids are unique, so
    the cvec field never participates in the sort)."""
    return centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cid"), F.col("cvec")))
        ).alias("_cents")
    )


def _nearest_cid(vec_col: str):
    """Projection-form argmin against the in-scope `_cents` array:
    array_min over struct(sqdist, cid) — the same sqdist double fold and
    the same lexicographic struct ordering (lowest distance, ties to the
    lowest cid) as the aggregate form min(struct(dist, cid)), evaluated
    per row with no shuffle.  Bit-identical assignments.  Built as ONE
    F.expr string — the nested Python HOF builders cost dozens of py4j
    round trips per call for the same resolved expressions (see
    similarity._subdist_tables)."""
    return F.expr(
        f"array_min(transform(_cents, c -> struct("
        f"aggregate(zip_with(`{vec_col}`, c.cvec, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0.0D, (acc, v) -> acc + v) AS _d, c.cid AS cid))).cid"
    )


def _assign_members(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cid) in ONE shuffle-free projection: the one-row
    centroid-array attach (ivf_topk's coarse-quantizer shape) + the
    in-place argmin.  Carrying the vector is free here — the downstream
    centroid update (and semdedup's pair stage) consume it directly
    instead of shuffle-joining the assignment back onto the vectors."""
    carr = _centroid_array(centroids)
    return vecs.crossJoin(F.broadcast(carr)).select(
        id_col, vec_col, _nearest_cid(vec_col).alias("cid")
    )


def assign_clusters(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid) for each vector: nearest centroid by squared L2
    (sequential double fold — oracle-reproducible), ties to the lowest
    cid.  A PROJECTION over the candidate scan against the one-row
    broadcast centroid array — no exchange at all (builder r19; the
    prior k-row-broadcast + min(struct(dist, cid)) groupBy form shuffled
    one row per vector per pass; values are bit-identical, see
    _nearest_cid)."""
    return _assign_members(vecs, centroids, id_col, vec_col).select(
        id_col, "cid"
    )


def _update_members_exact(
    members: DataFrame,
    prev_centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """update_centroids_exact over a members frame that ALREADY carries
    the vector (_assign_members' output) — one cluster-id exchange, no
    assignment-to-vectors join."""
    summed = F.expr(
        f"aggregate(sort_array(collect_list(struct(`{id_col}` AS _sid, "
        f"transform(`{vec_col}`, x -> CAST(x AS DOUBLE)) AS _sv))), "
        f"array_repeat(0.0D, {dim}), "
        f"(acc, sv) -> zip_with(acc, sv._sv, (a, x) -> a + x))"
    )
    upd = members.groupBy("cid").agg(
        F.count(F.lit(1)).alias("_n"), summed.alias("_sum")
    )
    upd = upd.select(
        "cid", F.transform(F.col("_sum"), lambda x: x / F.col("_n")).alias("_new")
    )
    return prev_centroids.join(upd, "cid", "left").select(
        "cid", F.coalesce(F.col("_new"), F.col("cvec")).alias("cvec")
    )


def update_centroids_exact(
    assigned: DataFrame,
    vecs: DataFrame,
    prev_centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster mean via ordered fold: members sorted by id, summed
    left-to-right per dimension in double, divided by the member count —
    bit-deterministic.  Empty clusters keep prev_centroids' row.

    Takes a bare (id, cid) assignment and joins the vectors back on —
    kmeans_assignments itself skips this join by assigning with
    _assign_members (the vector rides the assignment projection)."""
    members = assigned.join(vecs.select(id_col, vec_col), id_col)
    return _update_members_exact(
        members, prev_centroids, dim, id_col, vec_col
    )


def _update_members_scalable(
    members: DataFrame,
    prev_centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """update_centroids_scalable over a vector-carrying members frame —
    same join-free contract as _update_members_exact."""
    per_dim = (
        members.select("cid", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
    )
    upd = per_dim.groupBy("cid").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "m"))
        ).alias("_pm")
    ).select("cid", F.transform(F.col("_pm"), lambda s: s["m"]).alias("_new"))
    return prev_centroids.join(upd, "cid", "left").select(
        "cid", F.coalesce(F.col("_new"), F.col("cvec")).alias("cvec")
    )


def update_centroids_scalable(
    assigned: DataFrame,
    vecs: DataFrame,
    prev_centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(cluster, dimension) avg via posexplode — partial aggregation
    all the way down (the 100 TB path; summation order, and hence the
    last ulp, is runtime-dependent).  Join-back form, like
    update_centroids_exact."""
    members = assigned.join(vecs.select(id_col, vec_col), id_col)
    return _update_members_scalable(
        members, prev_centroids, dim, id_col, vec_col
    )


def _kmeans_members(
    vecs: DataFrame,
    k: int,
    n_iter: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Lloyd's k-means returning the FINAL (id, vec, cid) members frame —
    the vector rides every assignment projection, so the whole loop costs
    exactly one exchange per centroid update and the caller (semdedup)
    never joins the assignment back onto the vectors."""
    update = _update_members_exact if exact else _update_members_scalable
    cents = init_centroids(vecs, k, id_col, vec_col)
    for _ in range(n_iter - 1):
        members = _assign_members(vecs, cents, id_col, vec_col)
        cents = update(members, cents, dim, id_col, vec_col)
    return _assign_members(vecs, cents, id_col, vec_col)


def kmeans_assignments(
    vecs: DataFrame,
    k: int,
    n_iter: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Lloyd's k-means, returning the final (id, cluster) assignment after
    n_iter assignment passes (n_iter - 1 centroid updates in between).
    exact=True uses the ordered-fold update (bit-deterministic, oracle-
    checkable); exact=False the posexplode-avg update (fully scalable)."""
    members = _kmeans_members(vecs, k, n_iter, dim, id_col, vec_col, exact)
    return members.select(id_col, F.col("cid").alias("cluster"))


def semdedup(
    vecs: DataFrame,
    k: int,
    n_iter: int = 2,
    threshold: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "fold",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space with k-means, then WITHIN each cluster drop every
    vector that has a lower-id neighbor with cosine >= threshold — the
    keep-one-per-semantic-duplicate-group pass that removes paraphrases
    and templated rewrites exact/MinHash dedup cannot see.  Returns one
    row per vector: (id, cluster, keep).

    Scale: this is the published algorithm's exact reason to exist — the
    candidate pair join is blocked by cluster id, so pair cost is
    sum(cluster_size^2), and k grows with the corpus to keep cluster
    sizes bounded (the paper uses k ~ sqrt(n)).  The pipeline inherits
    kmeans_assignments' shapes (broadcast-argmin assignment, one keyed
    update shuffle); the pair stage is one equi-join shuffle on cluster
    id; the dominated-id set distincts to at most n rows of one column.

    scorer="fold" is the JVM sequential fold — bit-reproducible against
    the DuckDB oracle but an INTERPRETED higher-order function, ~100 us
    per pair; scorer="numpy" scores the pair stage with the Arrow-batched
    einsum (similarity.cosine_pandas) — measured 7.7x faster on the 10x
    scale bench (148 s -> 19 s on a duplication-dense blow-up whose pair
    volume grows ~30x) and the right choice whenever exact oracle hashes
    are not required.

    The self-join side is localCheckpoint-ed before joining — Catalyst's
    self-join attribute dedup mis-rebinds lambda variables inside
    higher-order functions (see similarity.embedding_dup_pairs), and a
    checkpointed leaf has no nested plan to mis-rewrite."""
    from pimdb_spark.operators.similarity import cosine_pandas, dot, norm

    # The final k-means assignment carries the vector (projection-form
    # argmin, see _assign_members), so the side frame is one more
    # projection — the former vecs ⋈ assignment shuffle join is gone.
    # Per-vector norms are computed ONCE here, before the checkpoint and
    # the pair join: the pair stage then runs a single 64-element fold
    # (the dot product) per candidate instead of three (dot + both
    # norms).  Bit-parity with the oracle is preserved — sqrt(fold) over
    # the same floats yields the same double whether evaluated per vector
    # or per pair.  Measured ~3x less interpreted-lambda work on the
    # fold scorer.
    members = _kmeans_members(vecs, k, n_iter, dim, id_col, vec_col)
    side = (
        members.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            norm(F.col(vec_col)).alias("nrm"),
            F.col("cid").alias("cluster"),
        )
        .localCheckpoint(eager=False)
    )
    a = side.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"), "cluster",
    )
    b = side.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"), "cluster",
    )
    pairs = a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b"))
    if scorer == "numpy":
        scored = pairs.withColumn("cos", cosine_pandas("vec_a", "vec_b"))
    elif scorer == "fold":
        scored = pairs.withColumn(
            "cos",
            dot(F.col("vec_a"), F.col("vec_b")) / (F.col("nrm_a") * F.col("nrm_b")),
        )
    else:
        raise ValueError(f"unknown scorer {scorer!r}: use 'fold' or 'numpy'")
    dominated = (
        scored.filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias("_dropped"))
        .distinct()
    )
    return (
        side.join(dominated, side.id == F.col("_dropped"), "left")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            F.col("_dropped").isNull().alias("keep"),
        )
    )
