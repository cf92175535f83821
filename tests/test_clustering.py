"""Distributed k-means (operators/clustering): exact ordered-fold vs
scalable posexplode-avg update parity, empty-cluster handling, and
determinism of the assignment."""

from __future__ import annotations


def test_exact_and_scalable_updates_agree(spark):
    from pimdb_spark.operators.clustering import kmeans_assignments

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ex = {
        r.vec_id: r.cluster
        for r in kmeans_assignments(vecs, k=4, n_iter=2, dim=64, exact=True).collect()
    }
    sc = {
        r.vec_id: r.cluster
        for r in kmeans_assignments(vecs, k=4, n_iter=2, dim=64, exact=False).collect()
    }
    # identical up to float-summation last-ulp boundary flips — none occur
    # on this data; a nonzero-but-tiny diff count would also be acceptable
    assert ex == sc
    assert len(set(ex.values())) == 4  # all clusters populated


def test_empty_cluster_keeps_previous_centroid(spark):
    """Three identical vectors, k=2: both init centroids coincide, every
    vector ties to cid 0, cluster 1 goes empty — the update must keep its
    previous centroid (not drop to k=1 or crash)."""
    from pimdb_spark.operators.clustering import (
        assign_clusters,
        init_centroids,
        kmeans_assignments,
        update_centroids_exact,
    )

    vecs = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(3)], "vec_id long, embedding array<float>"
    )
    out = kmeans_assignments(vecs, k=2, n_iter=2, dim=2)
    assert {r.cluster for r in out.collect()} == {0}

    cents = init_centroids(vecs, 2)
    assigned = assign_clusters(vecs, cents)
    updated = update_centroids_exact(assigned, vecs, cents, dim=2)
    got = {r.cid: r.cvec for r in updated.collect()}
    assert len(got) == 2  # cluster 1 survived with its init centroid
    assert got[1] == [1.0, 2.0]


def test_assignment_deterministic_across_runs(spark):
    from pimdb_spark.operators.clustering import kmeans_assignments

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    a = sorted(map(tuple, kmeans_assignments(vecs, 3, 2, 64).collect()))
    b = sorted(map(tuple, kmeans_assignments(vecs, 3, 2, 64).collect()))
    assert a == b


def test_semdedup_drops_higher_id_twin(spark):
    from pyspark.sql import Row

    from pimdb_spark.operators.clustering import semdedup

    # two tight groups far apart; 11 duplicates 1, 12 duplicates 4
    vecs = {
        1: [1.0, 0.0], 2: [0.99, 0.01], 3: [0.98, -0.01],
        4: [0.0, 1.0], 5: [0.01, 0.99],
        11: [1.0, 0.0], 12: [0.0, 1.0],
    }
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in sorted(vecs.items())]
    )
    rows = {r["vec_id"]: r for r in semdedup(df, k=2, n_iter=2, threshold=0.9999999, dim=2).collect()}
    assert len(rows) == 7  # one row per vector
    assert not rows[11]["keep"] and not rows[12]["keep"]  # twins dropped
    for i in (1, 2, 3, 4, 5):
        assert rows[i]["keep"]  # originals and non-dups survive
    # twins land in their original's cluster
    assert rows[11]["cluster"] == rows[1]["cluster"]
    assert rows[12]["cluster"] == rows[4]["cluster"]


def test_kmeans_chain_single_update_exchange(spark):
    """The full two-pass Lloyd's chain must cost exactly ONE shuffle
    exchange — the cluster-id centroid-update groupBy.  Both assignment
    passes are projections against the one-row broadcast centroid array
    (builder r19: the former aggregate-form argmin shuffled one row per
    vector per pass, and the update joined the assignment back onto the
    vectors for a further two exchanges)."""
    import contextlib
    import io

    from pimdb_spark.operators.clustering import kmeans_assignments

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    df = kmeans_assignments(vecs, k=4, n_iter=2, dim=64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    shuffles = [
        l for l in tree.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(shuffles) == 1, tree
