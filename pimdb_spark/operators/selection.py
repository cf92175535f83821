"""Embedding-level data selection for training-set curation: hard-negative
mining for contrastive training (the retrieval-training data op), kNN
label-error detection (confident-learning-lite, Northcutt et al. 2021),
and k-center greedy coreset selection (Sener & Savarese 2018).

All three compose the repo's established embedding machinery — the
symmetric-int8 quantized scorer (exact integer dots, one fixed-shape
double rescale) for the two similarity-ranked operators, and the
ordered-fold double sqdist for the coreset — so every ranking decision
is engine-reproducible under the same numeric-parity rules as the ANN
family (round-4 scores, ties broken by candidate id).

Reference scope note: the reference engine (pimdb) has no embedding
surface at all; this module extends the training-data-pipeline tier the
build plan adds beyond reference parity (SURVEY.md §2.9 "beyond the
reference" families), reusing `operators/similarity.py`'s quantizer and
plan shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pimdb_spark.operators.similarity import int8_score, int8_struct, norm, sqdist


def _quantized(df: DataFrame, id_col: str, vec_col: str, pfx: str, *extra: str) -> DataFrame:
    """(pfx_id, pfx_q struct, pfx_nrm [, extras]) int8 side for the
    shared quantized scorer."""
    return df.select(
        F.col(id_col).alias(f"{pfx}_id"),
        int8_struct(F.col(vec_col)).alias(f"{pfx}_q"),
        norm(F.col(vec_col)).alias(f"{pfx}_nrm"),
        *[F.col(c).alias(f"{pfx}_{c}") for c in extra],
    )


def _labeled_scored(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    round_digits: int | None,
) -> DataFrame:
    """Shared labeled scoring stage for the selection family — the
    similarity._int8_brute pattern with label columns carried through:
    broadcast the quantized query side, stream the candidates once,
    exclude self-matches, emit (q_id, q_<label>, c_id, c_<label>, qcos)
    with the round-4 discipline.  The query side is lazily
    localCheckpoint-ed (the self-join HOF rebind guard)."""
    q = _quantized(queries, id_col, vec_col, "q", label_col).localCheckpoint(
        eager=False
    )
    c = _quantized(candidates, id_col, vec_col, "c", label_col)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            f"q_{label_col}",
            "c_id",
            f"c_{label_col}",
            int8_score().alias("qcos"),
        )
    )
    if round_digits is not None:
        scored = scored.withColumn("qcos", F.round("qcos", round_digits))
    return scored


def hard_negative_mining(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    round_digits: int | None = 4,
) -> DataFrame:
    """Per query: the k most-similar DIFFERENT-label candidates (the hard
    negatives a contrastive trainer wants), the best same-label positive
    score, and the margin pos - neg per mined pair.  A pair with a small
    or negative margin is exactly the informative one: the negative that
    out-scores (or nearly out-scores) the best positive.

    Scoring is the quantized int8 cosine (exact integer dot, one
    fixed-shape double rescale, round-4) with ties broken by candidate
    id; the per-query positive best is a MAX over round-4 doubles —
    order-free, so no fold discipline is needed.  Queries with no
    same-label candidate get NULL pos_qcos / margin (not 0.0 — absence,
    not a zero score).

    Scale: identical plan economics to int8_ann_topk — the query side
    broadcasts, candidates stream through ONE pass (8x narrower than
    float on the wire; the scoring expressions evaluate once), then a
    single q_id shuffle serves BOTH readouts: the positive best is a
    whole-partition MAX window and the negative top-k a rank window
    over the same exchange (no second scoring pass, no extra join).
    The label predicates prune rows, not bytes; at corpus scale compose
    with the LSH/IVF candidate generators exactly as the other
    quantized scorers do — mining changes the predicate, not the join
    strategy.
    """
    scored = _labeled_scored(
        queries, candidates, id_col, vec_col, label_col, round_digits
    )
    same = F.col(f"c_{label_col}") == F.col(f"q_{label_col}")
    wq = Window.partitionBy("q_id")
    with_pos = scored.withColumn(
        "pos_qcos", F.max(F.when(same, F.col("qcos"))).over(wq)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qcos"), "c_id")
    return (
        with_pos.filter(~same)
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            "q_id",
            F.col(f"q_{label_col}").alias("q_label"),
            "neg_rank",
            F.col("c_id").alias("neg_id"),
            F.col(f"c_{label_col}").alias("neg_label"),
            F.col("qcos").alias("neg_qcos"),
            "pos_qcos",
            (F.col("pos_qcos") - F.col("qcos")).alias("margin"),
        )
    )


def knn_label_errors(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_digits: int | None = 4,
) -> DataFrame:
    """Confident-learning-lite label-error detection: for each query
    vector, take its k nearest candidates (quantized int8 cosine,
    self-matches excluded), vote their labels, and flag the row when the
    neighbourhood majority disagrees with its own label.  The classic
    first-pass mislabel screen for classifier / preference training data
    (Northcutt et al. 2021's kNN baseline).

    Every decision after the round-4 ranking is INTEGER: votes are
    counts, the majority is (count DESC, label ASC) — deterministic and
    engine-identical.  Output per query: own label, the kNN-majority
    label, n_agree (own-label votes among the k), and is_suspect.

    Scale: one broadcast-query candidate pass + WindowGroupLimit (same
    as int8_ann_topk), then a per-(query,label) count over at most
    queries x k rows — the vote stage is bounded by the top-k output,
    not the corpus.  Compose with IVF/LSH candidate generation at
    corpus scale; the vote is oblivious to how candidates were found.
    """
    scored = _labeled_scored(
        queries, candidates, id_col, vec_col, label_col, round_digits
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qcos"), "c_id")
    knn = scored.withColumn("nn_rank", F.row_number().over(w)).filter(
        F.col("nn_rank") <= k
    )
    votes = knn.groupBy("q_id", f"q_{label_col}", f"c_{label_col}").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("q_id").orderBy(
        F.desc("n_votes"), F.col(f"c_{label_col}")
    )
    # n_agree = the own-label group's vote count, i.e. the sum of
    # n_votes over the partition's rows whose candidate label matches
    # the query label (q_label is constant per q_id).  Folding it into
    # the SAME q_id-partitioned window pass that ranks the majority
    # vote removes the second aggregation over the knn frame and the
    # q_id-keyed join that re-attached it — one exchange serves both.
    wa = Window.partitionBy("q_id")
    return (
        votes.withColumn("vote_rank", F.row_number().over(wv))
        .withColumn(
            "_n_agree",
            F.sum(
                F.when(
                    F.col(f"c_{label_col}") == F.col(f"q_{label_col}"),
                    F.col("n_votes"),
                )
            ).over(wa),
        )
        .filter(F.col("vote_rank") == 1)
        .select(
            F.col("q_id").alias(id_col),
            F.col(f"q_{label_col}").alias("label"),
            F.col(f"c_{label_col}").alias("knn_label"),
            F.coalesce("_n_agree", F.lit(0).cast("long")).alias("n_agree"),
            (F.col(f"c_{label_col}") != F.col(f"q_{label_col}")).alias(
                "is_suspect"
            ),
        )
    )


def _min_sqdist_to(centers_arr: Column, vec: Column) -> Column:
    """Min ordered-fold sqdist from ``vec`` to an array of center
    vectors — list_min over per-center folds: the min is order-free, and
    each per-pair fold is a fixed left-to-right double sequence both
    engines replay identically."""
    return F.array_min(F.transform(centers_arr, lambda cv: sqdist(vec, cv)))


def kcenter_greedy(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """k-center greedy coreset selection (Sener & Savarese 2018): seed
    with the smallest id, then k-1 times pick the point FARTHEST from
    its nearest already-chosen center (squared L2; ties by id).  The
    selected rows are the classic diversity sample — the 2-approximation
    of the k-center cover — used to pick a maximally-spread subset for
    annotation or distillation.

    Output: (sel_rank, vec_id, dmin) in selection order, where dmin is
    the point's distance-to-selected-set at the moment of selection —
    i.e. row r's dmin IS the k-center coverage radius after r-1 centers,
    so the column is the whole objective curve (monotone non-increasing
    from row 2 down), not just the picks.  The seed row's dmin is NULL
    (no prior set — absence, not 0.0).

    Determinism: each candidate-center sqdist is the repo's ordered
    double fold; the per-point min over centers is order-free
    (array_min); argmax ties break by id.  Both engines replay the
    identical expression shapes, so the selection sequence is
    hash-exact.

    Scale: each round is ONE narrow pass over the corpus — the chosen
    centers travel as a single broadcast row (k x dim doubles, driver
    never sees a data-sized frame), the per-point dmin is a map-side
    expression, and the argmax is a TakeOrdered(1), not a sort.  k
    rounds = k scans; lineage is cut per round (localCheckpoint) so the
    plan stays O(1) deep — the kmeans/BPE driver-sequencing discipline.
    The O(N*k) total work is the algorithm's own bound, not a plan
    artifact.
    """
    pts = vecs.select(F.col(id_col).alias("p_id"), F.col(vec_col).alias("p_vec"))
    seed = (
        pts.orderBy("p_id")
        .limit(1)
        .select(
            F.lit(1).alias("sel_rank"),
            F.col("p_id"),
            F.lit(None).cast("double").alias("dmin"),
            "p_vec",
        )
    )
    chosen = seed.localCheckpoint(eager=True)
    for r in range(2, k + 1):
        centers_row = chosen.agg(F.collect_list("p_vec").alias("cvs"))
        far = (
            pts.join(F.broadcast(chosen.select("p_id")), "p_id", "left_anti")
            .crossJoin(F.broadcast(centers_row))
            .select(
                "p_id",
                "p_vec",
                _min_sqdist_to(F.col("cvs"), F.col("p_vec")).alias("dmin"),
            )
            .orderBy(F.desc("dmin"), "p_id")
            .limit(1)
            .select(F.lit(r).alias("sel_rank"), "p_id", "dmin", "p_vec")
        )
        chosen = chosen.union(far).localCheckpoint(eager=True)
    return chosen.select(
        "sel_rank", F.col("p_id").alias(id_col), "dmin"
    ).orderBy("sel_rank")
