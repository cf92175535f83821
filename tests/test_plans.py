"""Physical-plan quality gates: these assert the plan SHAPE that survives a
100 TB scale-up — pushdown into the parquet scan, broadcast for dim joins,
top-k without a global sort, window-group-limit pushdown, and shuffle
counts for the composed operators.  A correct-but-badly-planned query fails
here even though the oracle check passes."""

from __future__ import annotations

import contextlib
import io

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def tree_nodes(plan: str) -> list[str]:
    """Operator names from the tree section only (formatted explain prints
    each node twice: once in the tree, once in the detail listing)."""
    tree = plan.split("\n\n")[0]
    return [
        line.split("(")[0].strip().lstrip("+-: ").strip()
        for line in tree.splitlines()
        if "(" in line
    ]


def count_op(plan: str, op: str) -> int:
    return sum(1 for n in tree_nodes(plan) if n.startswith(op))


def test_filter_and_projection_push_into_scan(spark):
    from pimdb_spark.catalog import q_filter_project_rename

    plan = plan_of(q_filter_project_rename(spark, SF))
    assert "PushedFilters: [" in plan
    assert "l_discount" in plan.split("PushedFilters")[1].split("]")[0]
    # projection pruning: the scan must not read all 11 lineitem columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_partkey" not in read_schema  # unused by this query


def test_dim_joins_broadcast(spark):
    from pimdb_spark.catalog import q5_region_revenue

    plan = plan_of(q5_region_revenue(spark, SF))
    # dims (nation/region/supplier/customer-side) broadcast; at sf0.001 the
    # fact join auto-broadcasts too, at larger SF it becomes SMJ — either
    # way NO nested loop and >=3 broadcast joins
    assert count_op(plan, "BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_topk_avoids_global_sort(spark):
    from pimdb_spark.catalog import q_topk_orders

    plan = plan_of(q_topk_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_window_rank_group_limit(spark):
    from pimdb_spark.catalog import q_window_rank

    plan = plan_of(q_window_rank(spark, SF))
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle


def test_distinct_uses_partial_aggregation(spark):
    from pimdb_spark.catalog import q_distinct_multi

    plan = plan_of(q_distinct_multi(spark, SF))
    # partial + final hash aggregate around one exchange
    assert count_op(plan, "HashAggregate") >= 2
    assert count_op(plan, "Exchange") == 1


def test_asof_join_single_shuffle(spark):
    """The union+carry-forward as-of join must cost ONE shuffle on the key
    (plus nothing per-row quadratic)."""
    from pimdb_spark.catalog_asof import q_asof_join

    plan = plan_of(q_asof_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert count_op(plan, "Exchange") <= 2  # hashpartitioning(user_id) (+AQE reuse)


def test_range_join_is_equi_join(spark):
    """Neighbor-bucket explode must turn the range condition into a hash
    join, never a nested loop."""
    from pimdb_spark.catalog_asof import q_range_join

    plan = plan_of(q_range_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_approx_distinct_error_bound(spark):
    from pimdb_spark.catalog import load
    from pimdb_spark.catalog_sql_surface import approx_distinct_full, q_approx_distinct

    for r in approx_distinct_full(load(spark, SF, "lineitem")).collect():
        assert abs(r.approx_orders - r.exact_orders) / r.exact_orders < 0.1
    # the catalog entry's own verdict column (what the oracle hash-checks)
    rows = q_approx_distinct(spark, SF).collect()
    assert len(rows) > 0 and all(r.within_bound == 1 for r in rows)


def _all_entries():
    from pimdb_spark import entrypoints  # noqa: F401 — loads every catalog module
    from pimdb_spark.catalog import _EXTRA_BENCH, _REGISTRY, CatalogEntry

    # bench-only twins (register_bench_only) get the identical plan audit:
    # consolidation out of the oracle registry must not drop them from the
    # 100 TB red-flag sweep
    extras = {
        name: CatalogEntry(name=name, fn=fn, oracle=None)
        for name, fn in _EXTRA_BENCH.items()
    }
    return sorted({**_REGISTRY, **extras}.items())


import pytest  # noqa: E402


@pytest.mark.parametrize("name,entry", _all_entries(), ids=[n for n, _ in _all_entries()])
def test_no_plan_red_flags(spark, name, entry):
    """Sweep EVERY catalog query's physical plan for patterns that are fatal
    at 100 TB: cartesian/nested-loop joins anywhere, and row-at-a-time
    Python UDF eval (BatchEvalPython) in the hot path.  Arrow-batched
    evaluation (mapInPandas / ArrowEvalPython) is the sanctioned slow path.

    Allowed exceptions, each deliberate:
    - q_token_decompose: BatchEvalPython over DISTINCT values only — the
      UDF input cardinality is the token-combination count, not the row
      count (the reference's lru_cache/temp-table trick, SURVEY E4).
    - q_cosine_topk: brute-force exact ANN IS a broadcast nested-loop by
      design — a small bounded query set broadcast against the candidate
      scan is one shuffle-free pass; the LSH variant (q_lsh_ann_topk) is
      the scale path and must stay an equi-join.
    - q_int8_ann_topk: same brute-force broadcast shape as q_cosine_topk
      over int8-quantized codes (the 8x-narrower candidate pass); the
      scale path composes the quantizer with the LSH/IVF equi-join
      candidate generators.
    - q_ivf_ann_topk: the cross join attaches the ONE-ROW broadcast
      centroid array to every row (O(n) work, no pairing); the actual
      probe join is a hash equi-join on cell id.
    - q_ivf_int8_topk: same one-row centroid attach as q_ivf_ann_topk;
      the probe join stays a cell equi-join — int8 changes the pair
      payload (codes instead of float vectors), not the join shape.
    - q_pq_adc_topk: the one-row codebook attach (both sides) plus the
      q_cosine_topk brute shape over 8-byte PQ codes — table-lookup
      scoring is the cheap-scan design; IVF-PQ composes the cell
      equi-join in front exactly like q_ivf_int8_topk.
    - q_ivf_pq_topk: two one-row broadcast attaches (coarse centroids +
      PQ codebooks); the scoring join itself is the hash equi-join on
      cell id — the production IVF-PQ layout, no pairing outside cells.
    - q_pq_trained_topk: q_pq_adc_topk's exact shape (one-row codebook
      attaches + the brute broadcast scoring pass over 8-byte codes)
      with TRAINED codebooks; the training chain adds per-subspace
      k-means assignment passes, each the q_kmeans_assignments
      one-row-array broadcast attach + in-place argmin (a BOUNDED
      m x 16-entry build side against the vector scan, never
      data x data), and the trained one-row codebook frame is
      localCheckpoint-ed so scoring re-reads it, not the chains.
    - q_ivf_pq_trained_topk: q_ivf_pq_topk's exact shape (two one-row
      attaches, hash equi-join on cell id for scoring) plus the same
      bounded per-subspace k-means training chains as q_pq_trained_topk
      behind the checkpointed codebook row.
    - q_ivf_pq_residual_topk: q_ivf_pq_topk's exact shape again — the
      residual form changes WHAT is coded (vec minus its cell
      centroid), not the join strategy; the codebook build side is a
      bounded n_cells+n_centroids-row frame, and scoring stays the cell
      hash equi-join.
    - q_token_df_idf: same one-row-broadcast shape — the corpus size
      (a 1-row aggregate) attaches to every (token, df) row.
    - q_bm25_topk: same one-row-broadcast shape — the (N, avgdl) corpus
      stats row attaches to every query-term hit.
    - q_corpus_divergence: two one-row total-count broadcasts attach to
      every (token, count) row — constant attach, no pairing.
    - q_kmeans_assignments: the cross join broadcasts the ONE-ROW
      centroid ARRAY (k=4 entries; bounded by the cluster count, never
      by data size) against the vector scan — the assignment is one
      shuffle-free projection, the exact shape of q_ivf_ann_topk's
      coarse quantizer (r19: formerly a k-row attach + argmin groupBy).
    - q_cluster_quota: q_kmeans_assignments' exact sanctioned shape (the
      k-row centroid broadcast) feeding the quota stage, which is one
      cluster-keyed WindowGroupLimit — no new join shape.
    - q11_important_stock: the ONE-ROW grand-total aggregate broadcast-
      attaches to every (partkey, value) row for the threshold filter —
      constant attach, no pairing (same shape as q_token_df_idf).
    - q_heavy_hitters: the ONE-ROW row-total aggregate broadcast-attaches
      to the k top-key rows for the share division — constant attach over
      an already-k-row frame.
    - q_mixture_plan: the ONE-ROW binding-source frame (ORDER BY + LIMIT 1
      off the |sources|-row inventory) broadcast-attaches to that same
      bounded inventory — planning arithmetic, corpus-size-independent.
    - q_bpe_apply: the ENTIRE merge list collapses to a ONE-ROW broadcast
      array (agg-without-groupBy) attached to the word stream and applied
      by a single fold — one constant attach total, no pairing
      (q_bpe_train itself returns checkpointed one-row frames, so its
      plan has no join at all).
    - q_ngram_lm_score: the ONE-ROW vocabulary-size aggregate broadcast-
      attaches to every (doc, gram) row for the smoothing denominator —
      constant attach, no pairing (same shape as q_token_df_idf).
    - q_ngram_lm_score_jm: the same ONE-ROW attach carrying (T, V) —
      the interpolated scorer adds a reference-sized unigram broadcast
      HASH join, not a second nested-loop shape.
    - q_perplexity_buckets: q_ngram_lm_score's ONE-ROW vocabulary-size
      attach (the bucketing entry scores with the identical LM chain);
      the bucketing itself adds one per-language window exchange, no
      join shape at all.
    - q_normalize_dedup: ONE one-row broadcast attach (the
      1 + max(doc_id) noisy-copy offset, the pipeline entry's form);
      the dedup proper is two digest-only groupBys and a two-row UNION
      — no data-sized join anywhere.
    - q_curation_pipeline: TWO one-row broadcast attaches (the
      1 + max(doc_id) copy offset and q_ngram_lm_score's vocabulary
      size); every data-sized join is an equi-join (gram/w1 model
      joins, the doc_id verdict join — the fp dedup join became a
      window min over the digest partition in r19).
    - q_bloom_decontaminate: the ONE-ROW bloom-bitmap map (<= m/32
      entries collapsed via map_from_entries — the bpe_apply pattern)
      broadcast-attaches to every (doc, gram) probe row; the unrolled
      codegen bit tests replace a k-row fanout + hash join + fold-back
      exchange (measured faster, see operators/membership.bloom_probe).
    - q_cms_heavy_hitters: the same ONE-ROW sketch attach — the d x w
      count-min counter map broadcast-attaches to every distinct item
      for the unrolled d-lookup estimate (operators/sketch.cms_estimate).
    - q_ann_recall_lsh: contains q_cosine_topk's brute-force broadcast
      shape as the EXACT BASELINE side of the recall evaluation — the
      measured ground truth an approximate index is judged against; the
      approximate side stays a bucket equi-join.
    - q_hll_distinct: a ONE-ROW x ONE-ROW attach (the 64-register HLL
      estimate row joined to the exact-distinct row for side-by-side
      output) — two bounded aggregates, no pairing.
    - q_bpe_train_batched: two bounded non-data joins per round — the
      conflict anti-join of the <=batch_size-row pool against itself
      (non-equi on pool position + arrays_overlap; <=m^2 pairs, never
      data-sized) and the same one-row merge-array attach as
      q_bpe_apply.
    - q_dsir_importance: two ONE-ROW total-count attaches (N_target and
      N_raw, the add-one denominators) cross-joined onto the per-doc
      feature rows — the same one-row broadcast shape as
      q_ngram_lm_score's totals attach; the feature/model joins proper
      are broadcast HASH joins on the B-row tables.
    - q_hard_negatives: q_int8_ann_topk's exact brute-force broadcast
      shape (bounded query set against the quantized candidate pass) —
      mining changes the label predicate and adds a bounded positive-
      best hash join, not a second nested-loop; the scale path composes
      the LSH/IVF equi-join candidate generators unchanged.
    - q_knn_label_errors: the same q_int8_ann_topk brute shape feeding
      the vote stage — everything after the top-k is bounded by
      queries x k rows, and candidate generation composes with IVF/LSH
      equi-joins at corpus scale.
    - q_neardup_dedup_pipeline: ONE one-row broadcast attach — the
      1 + max(doc_id) copy-offset row cross-joined onto the planted-copy
      fixture slice (collision-free on any id range, never collected);
      the pipeline proper is the banding equi-join + CC label joins.
    - q_minhash_lsh_pairs: the same ONE one-row broadcast attach (r17 —
      retired the catalog's last literal planted-id offset, +1,000,000,
      for the derived 1 + max(doc_id) form); the detector proper is the
      shared _minhash_doc_signatures chain + banding equi-join with
      candidate-only verification.
    - q_leakage_safe_split: the same ONE one-row broadcast attach (the
      1 + max(doc_id) planted-copy offset, shared fixture shape with
      q_neardup_dedup_pipeline); the split itself is a projection over
      the CC labels and the leak audit one component-keyed collect_set
      window (r19 — the former countDistinct groupBy + labels join-back
      is gone) — no data-sized join beyond the pipeline's audited
      stages.
    - q_cross_neardup_filter: the same ONE one-row broadcast attach
      (the 1 + max(doc_id) truncated-copy offset, r14 — retired the
      literal +2,000,000 fixture offset); the gate proper is the
      two-sided banding equi-join + candidate-only verification.
    - q_dedup_recall_lsh: the same ONE one-row broadcast attach (the
      1 + max(doc_id) truncated-copy offset, r15 — retired the literal
      +1,000,000 fixture offset); the evaluation proper is the banding
      equi-join vs the shared-shingle ground-truth equi-join.
    - q_containment_pairs: ONE one-row broadcast attach (the
      1 + max(doc_id) planted-excerpt offset, the pipeline entry's
      form); candidates are the capped-shingle equi-join (Σ df²
      bounded) and verification re-joins shingle sets for candidates
      alone — never all-pairs.
    - q_eval_span_excise: ONE one-row broadcast attach (the min_by
      eval-snippet row cross-joined onto the planted contamination
      slice — a bounded aggregate, never collected); the excision
      proper is the audited dup_span_excise span-hash equi-join.
    - q_eval_leak_report: the same ONE one-row snip attach (shared
      fixture with q_eval_span_excise); the report proper is the
      (span, df) equi-join against the eval side's distinct spans —
      df rides the span row, so no carrier pairs materialize.
    - q_containment_lsh_pairs: the same ONE one-row broadcast attach
      as q_containment_pairs (the shared planted-excerpt fixture);
      candidates are the (band, min) equi-join with the flood-cap
      broadcast anti-join — never all-pairs.
    - q_mixture_plan_temp: q_mixture_plan's planning shape with TWO
      one-row broadcast attaches (the binding row and the exact integer
      weight-sum row) onto the |sources|-row inventory frame —
      corpus-size-independent, nothing data-sized crosses.
    - q_ivf_pq_residual_trained_topk: the same two one-row broadcast
      attaches as q_ivf_pq_residual_topk (coarse centroids, trained
      books — both bounded aggregates collapsed to single rows) plus
      the one-row training threshold; scoring proper is the cell hash
      equi-join.  Training adds m bounded k-means chains whose only
      joins are broadcast centroid attaches (the q_kmeans_assignments
      shape).
    - q_pq_from_codes_topk: q_pq_trained_topk's sanctioned shapes with
      the candidate-coding pass moved to write time — the serving plan
      keeps ONE query-side one-row books attach and the brute broadcast
      pass over pre-encoded 8-byte codes (training at n_iter=1 adds the
      bounded init pass only); no new join shape.
    - q_pq_adc_rerank_topk: stage 1 is q_pq_adc_topk's exact sanctioned
      shape (one-row codebook attach + the brute broadcast scoring pass
      over 8-byte codes); stage 2 adds ONLY broadcast HASH joins — the
      |Q| x shortlist survivor list broadcasts against the candidate
      scan for the raw-vector fetch, so the exact re-rank never pairs
      data x data.
    - q_ivf_pq_rerank_topk: stage 1 is q_ivf_pq_topk's exact sanctioned
      shape (two one-row attaches, cell hash equi-join for ADC
      scoring); stage 2 is q_pq_adc_rerank_topk's broadcast-hash-join
      raw-vector fetch — the full stack adds no new nested-loop shape.
    - q_quantile_sketch: the readout joins the <=512-row bounded EH
      bucket table against the 3-row quantile-target frame (non-equi
      cum >= rank) — bounded x bounded, corpus-size-independent; the
      sketch build itself is one map-side-combined groupBy (the CMS
      shape), and the exact side is the quality-gate ground truth
      (rank lookup via one full sort, the ann_recall discipline).
    - q_dup_clusters_star: ONE one-row broadcast attach (the
      1 + max(vec_id) planted-copy offset, r17 — retired the literal
      +100,000); the contraction itself is groupBy + re-join equi-joins
      per round.  (The hash-min twin q_dup_clusters carries the same
      attach but localCheckpoints every round, so its FINAL plan is
      lineage-cut and never shows the attach — same shape, different
      visibility.)
    - q_incremental_split_inherit: TWO one-row broadcast attaches (the
      1 + max(doc_id) planted-copy offset used by both fixture slices);
      the fence proper is the audited banding equi-joins (new x new and
      new x ref), the CC label joins, and the per-component side
      aggregate joined back on component — nothing data-sized crosses.
    - q_snapshot_diff / q_snapshot_merge: ONE one-row broadcast attach
      each (the 1 + max(o_orderkey) re-insert offset, r18 — retired the
      catalog's last literal id offsets, +10,000,000); the diff proper
      is the (key, digest) full-outer equi-join and the merge the
      key anti-join — the offset row never collects."""
    plan = plan_of(entry.fn(spark, SF))
    if name not in (
        "q_cosine_topk",
        "q_cosine_topk_np",
        "q_int8_ann_topk",
        "q_ivf_ann_topk",
        "q_ivf_ann_topk_np",
        "q_ivf_int8_topk",
        "q_pq_adc_topk",
        "q_pq_from_codes_topk",
        "q_pq_adc_rerank_topk",
        "q_ivf_pq_topk",
        "q_ivf_pq_rerank_topk",
        "q_pq_trained_topk",
        "q_ivf_pq_trained_topk",
        "q_ivf_pq_residual_topk",
        "q_ivf_pq_residual_trained_topk",
        "q_neardup_dedup_pipeline",
        "q_minhash_lsh_pairs",
        "q_leakage_safe_split",
        "q_cross_neardup_filter",
        "q_dedup_recall_lsh",
        "q_containment_pairs",
        "q_containment_lsh_pairs",
        "q_eval_span_excise",
        "q_eval_leak_report",
        "q_token_df_idf",
        "q_bm25_topk",
        "q_kmeans_assignments",
        "q_cluster_quota",
        "q_corpus_divergence",
        "q11_important_stock",
        "q_heavy_hitters",
        "q_mixture_plan",
        "q_mixture_plan_temp",
        "q_ngram_lm_score",
        "q_ngram_lm_score_jm",
        "q_perplexity_buckets",
        "q_normalize_dedup",
        "q_curation_pipeline",
        "q_bloom_decontaminate",
        "q_cms_heavy_hitters",
        "q_ann_recall_lsh",
        "q_hll_distinct",
        "q_bpe_apply",
        "q_bpe_train_batched",
        "q_dsir_importance",
        "q_hard_negatives",
        "q_knn_label_errors",
        "q_quantile_sketch",
        "q_dup_clusters_star",
        "q_incremental_split_inherit",
        "q_snapshot_diff",
        "q_snapshot_merge",
    ):
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    if name != "q_token_decompose":
        assert "BatchEvalPython" not in plan, name


def test_grouping_analytics_expand(spark):
    """ROLLUP/CUBE/GROUPING SETS each compile to a single Expand + hash
    agg — all levels in one pass, never one scan per level."""
    from pimdb_spark.catalog_sql_surface import q_grouping_analytics

    plan = plan_of(q_grouping_analytics(spark, SF))
    # one Expand per grouping op (rollup, cube, grouping sets)
    assert count_op(plan, "Expand") == 3, plan


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with ZERO exchanges — the 100 TB co-located-join path."""
    from pimdb_spark.plans.store import write_bucketed

    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(o.select("o_orderkey", "o_orderstatus"), "b_orders", "o_orderkey", 4)
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the bucketed path (not a broadcast) is chosen
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
        )
        plan = plan_of(joined)
        assert count_op(plan, "Exchange") == 0
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes(spark, tmp_path):
    """Partition-by write + equality filter must prune at the directory
    level (PartitionFilters in the scan), not scan-and-discard."""
    from pimdb_spark.plans.store import ParquetDatabase

    db = ParquetDatabase(spark, str(tmp_path / "pdb"))
    o = spark.read.parquet(f"{SF}/orders.parquet")
    db.write(o, "orders_p", partition_by="o_orderstatus")
    got = db.read("orders_p").filter("o_orderstatus = 'F'")
    plan = plan_of(got)
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "o_orderstatus" in pf
    assert got.count() == o.filter("o_orderstatus = 'F'").count()


def test_salted_join_spreads_keys(spark):
    """The salted join must plan as an equi-join on (key, salt) — no
    nested loop — and return exactly the plain join's aggregate."""
    from pimdb_spark.catalog_sql_surface import q_salted_join

    df = q_salted_join(spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {r.o_orderstatus: (r.n, r.sum_price) for r in df.collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    import pyspark.sql.functions as F

    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
    expected = {r.o_orderstatus: (r.n, r.sum_price) for r in plain.collect()}
    assert got == expected


def test_partial_salted_join_replicates_only_heavy_keys(spark):
    """Partial salting: row-identical to the plain join, broadcasts the
    heavy-key set, and replicates the build side only for heavy keys."""
    from pyspark.sql import Row
    import pyspark.sql.functions as F

    from pimdb_spark.operators.skew import partial_salted_join

    left = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(20)]      # heavy key
        + [Row(k=2, v=100), Row(k=3, v=200)]    # light keys
    )
    right = spark.createDataFrame(
        [Row(k=1, name="hot"), Row(k=2, name="a"), Row(k=3, name="b"), Row(k=4, name="c")]
    )
    joined = partial_salted_join(left, right, on="k", n_salts=4, heavy_threshold=5)
    got = joined.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("name").alias("names")
    )
    rows = {r.k: (r.n, r.names) for r in got.collect()}
    assert rows == {1: (20, 1), 2: (1, 1), 3: (1, 1)}  # k=4 unmatched, no dup rows

    plan = plan_of(joined)
    assert count_op(plan, "BroadcastHashJoin") >= 1  # heavy-set tagging
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hash_split_is_shuffle_free_projection(spark):
    """The split assignment itself must be a pure projection — rows never
    move.  (q_hash_split's single Exchange is its summary groupBy.)"""
    from pimdb_spark.catalog import load
    from pimdb_spark.catalog_curation import q_hash_split
    from pimdb_spark.operators.curation import hash_split

    assigned = hash_split(load(spark, SF, "documents"), "doc_id")
    assert count_op(plan_of(assigned), "Exchange") == 0
    assert count_op(plan_of(q_hash_split(spark, SF)), "Exchange") == 1


def test_domain_quota_group_limit(spark):
    """Per-domain quota must plan WindowGroupLimit: each group's sort stops
    at rank k instead of fully sorting every domain's documents."""
    from pimdb_spark.catalog_curation import q_domain_quota

    assert "WindowGroupLimit" in plan_of(q_domain_quota(spark, SF))


def test_seq_packing_single_shuffle(spark):
    """Packing = one Exchange on the shard key; the running-sum window AND
    the (shard, seq_id) aggregate both reuse that partitioning (hash
    partitioning on a subset of the grouping keys satisfies the agg's
    clustering requirement)."""
    from pimdb_spark.catalog_curation import q_seq_packing

    assert count_op(plan_of(q_seq_packing(spark, SF)), "Exchange") == 1


def test_anti_join_family_plans(spark):
    """Q21/Q22/Q16 shapes must plan as hash semi/anti joins — the NOT
    EXISTS chain and null-aware NOT IN never fall back to a nested loop."""
    from pimdb_spark.catalog_sql_surface import (
        q16_supplier_parts,
        q21_waiting_suppliers,
        q22_idle_customers,
    )

    p21 = plan_of(q21_waiting_suppliers(spark, SF))
    assert "LeftSemi" in p21 and "LeftAnti" in p21, p21
    p16 = plan_of(q16_supplier_parts(spark, SF))
    assert "LeftAnti" in p16, p16  # single-col NOT IN → null-aware anti join
    p22 = plan_of(q22_idle_customers(spark, SF))
    assert "LeftAnti" in p22, p22
    for p in (p21, p16, p22):
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_salted_join_rejects_replication_unsafe_outer(spark):
    """right/full outer would emit unmatched other-rows n_salts times —
    salted_join must refuse rather than be silently wrong."""
    from pimdb_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    for bad in ("right", "rightouter", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(li, li, on="l_orderkey", how=bad)
    # the safe types still construct (no evaluation needed)
    for ok in ("inner", "left", "left_semi", "left_anti"):
        salted_join(li, li, on="l_orderkey", how=ok)


def test_q8_widest_join_broadcasts_all_dims(spark):
    """Q8's 8-table join must broadcast every dim (both nation roles,
    region, customer, supplier, part) — the only real shuffle at scale is
    orders⋈lineitem plus the year agg."""
    from pimdb_spark.catalog_sql_surface import q8_market_share

    plan = plan_of(q8_market_share(spark, SF))
    assert count_op(plan, "BroadcastHashJoin") >= 6
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_exists_is_semi_join_with_residual(spark):
    """The correlated EXISTS with a cross-side date inequality must plan
    as ONE hash semi-join on the order key (inequality as residual), not
    a nested loop and not a join-then-distinct."""
    from pimdb_spark.catalog_sql_surface import q4_priority_count

    plan = plan_of(q4_priority_count(spark, SF))
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_is_projection(spark):
    """Membership is decided row-locally by id hash — the sample itself
    must add no exchange (the summary agg is the only one)."""
    from pimdb_spark.catalog_curation import q_stratified_sample

    plan = plan_of(q_stratified_sample(spark, SF))
    assert count_op(plan, "Exchange") <= 1, plan


def test_interval_join_is_equi_join(spark):
    """Grid-cell explode must turn the overlap condition into a hash
    equi-join on (key, cell) — never a nested loop — and each qualifying
    pair must surface exactly once (first-shared-cell attribution, no
    distinct pass in the plan)."""
    from pimdb_spark.catalog_asof import q_interval_join

    df = q_interval_join(spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan
    rows = df.collect()
    assert len(rows) == len({(r.user_id, r.l_id, r.r_id) for r in rows})


def test_approx_percentile_error_bound(spark):
    """The sketch quantiles must land within 2% relative error of the
    exact percentiles at every probed quantile."""
    from pimdb_spark.catalog import load
    from pimdb_spark.catalog_sql_surface import (
        approx_percentile_full,
        q_approx_percentile,
    )

    rows = approx_percentile_full(load(spark, SF, "lineitem")).collect()
    assert len(rows) > 0 and all(r.q_idx in (0, 1, 2) for r in rows)
    for r in rows:
        assert abs(r.approx_val - r.exact_val) / r.exact_val < 0.02, (
            r.l_returnflag,
            r.q_idx,
            r.approx_val,
            r.exact_val,
        )
    # the catalog entry's own verdict column (what the oracle hash-checks)
    gate = q_approx_percentile(spark, SF).collect()
    assert len(gate) == len(rows) and all(r.within_bound == 1 for r in gate)


def test_runtime_bloom_filter_semijoin_reduction(spark):
    """Spark's runtime bloom-filter join: when one shuffle-join side is
    selective, its join keys build a bloom filter that pre-filters the
    BIG side before the shuffle — at 100 TB this is the difference
    between shuffling every lineitem row and shuffling only plausible
    matches.  Thresholds are lowered so the tiny test tables qualify;
    the assertion is on the injected plan shape, which is scale-invariant."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    import pyspark.sql.functions as F

    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert j.count() >= 0
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_list_membership_join_is_equi_join(spark):
    """The find_in_set-shaped membership join must plan as explode + hash
    EQUI-join (broadcast people dim), never a BroadcastNestedLoopJoin over
    the raw theta condition, and must agree with the array_contains doc
    form including membership-once semantics for repeated list ids."""
    from pyspark.sql import functions as F

    from pimdb_spark.catalog_sql_surface import q_list_membership_join

    df = q_list_membership_join(spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "Generate" in plan  # the explode
    got = {(r.person_id, r.n_titles) for r in df.collect()}

    # doc form: array_contains filter per person (theta join semantics)
    from pimdb_spark.catalog import load

    o = load(spark, SF, "orders")
    crew = o.select(
        "o_orderkey",
        F.array_distinct(
            F.array(
                F.concat(F.lit("d"), (F.col("o_orderkey") % 31).cast("string")),
                F.concat(F.lit("d"), ((F.col("o_orderkey") + 7) % 31).cast("string")),
                F.concat(F.lit("d"), ((F.col("o_orderkey") * 3 + 1) % 31).cast("string")),
            )
        ).alias("members"),
    )
    s = load(spark, SF, "supplier")
    people = s.groupBy(
        F.concat(F.lit("d"), (F.col("s_suppkey") % 31).cast("string")).alias("person_id")
    ).agg(F.min("s_name").alias("person_name"))
    theta = (
        crew.join(people, F.array_contains(F.col("members"), F.col("person_id")))
        .groupBy("person_id")
        .agg(F.count(F.lit(1)).alias("n_titles"))
    )
    want = {(r.person_id, r.n_titles) for r in theta.collect()}
    assert got == want


def test_bm25_filter_before_corpus_shuffle(spark):
    """The only corpus-sized shuffle in q_bm25_topk must carry query-term
    hits only: the isin Filter sits below the first Exchange (between the
    token Generate and the (doc, token) aggregate), and the global top-k
    plans as TakeOrderedAndProject, never a full sort."""
    from pimdb_spark.catalog_text import q_bm25_topk

    plan = plan_of(q_bm25_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    gen = next(i for i, l in enumerate(lines) if "Generate" in l)
    # walking UP from the Generate (children print below parents), the
    # term Filter must appear before any Exchange
    above = lines[:gen][::-1]
    order = [l for l in above if "Filter" in l or "Exchange" in l]
    assert order and "Filter" in order[0]


def test_weighted_sample_topk_plan(spark):
    """q_weighted_sample: draws aggregate in ONE shuffle; top-k is
    TakeOrderedAndProject (per-partition heap), not a global Sort."""
    from pimdb_spark.catalog_curation import q_weighted_sample

    plan = plan_of(q_weighted_sample(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert count_op(plan, "Exchange") == 1


def test_kmeans_assignment_is_projection(spark):
    """A single k-means assignment pass must be a PROJECTION over the
    candidate scan: the k centroid rows collapse to a ONE-ROW broadcast
    array and the argmin is computed in place (builder r19 — the former
    k-row-broadcast + min(struct(dist, cid)) groupBy shuffled one row per
    vector per pass; the projection form computes identical doubles with
    the identical tie-break, proven by the unchanged oracle hashes, and
    removes the candidate-side exchange entirely)."""
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.clustering import assign_clusters, init_centroids

    vecs = load(spark, SF, "embeddings").select("vec_id", "embedding")
    plan = plan_of(assign_clusters(vecs, init_centroids(vecs, 4)))
    assert "BroadcastNestedLoopJoin" in plan  # the one-row array attach
    assert "array_min" in plan  # projection-form argmin
    # the only Window is init_centroids' rank over its k-row limit (the
    # broadcast side); the candidate-side argmin itself is window-free
    assert count_op(plan, "Window") <= 1
    assert "WindowGroupLimit" not in plan
    # ZERO shuffle exchanges: init's TakeOrderedAndProject is already
    # single-partition, the collect_list pair is adjacent, and the only
    # Exchange node is the broadcast build of the one-row centroid array
    tree = plan.split("\n\n")[0]
    shuffles = sum(
        1
        for l in tree.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    )
    assert shuffles == 0, plan
    assert count_op(plan, "BroadcastExchange") == 1


def test_gram_matrix_single_exchange(spark):
    """The int8 Gram AGGREGATION must cost exactly ONE exchange — the
    bounded (i, j) groupBy; the 2,080-cell fan-out is map-side.  Since
    the r18 optimization round the entry also carries the documented
    _cand_emb repartition pin (a RoundRobin exchange BEFORE the fan-out,
    measured 2.46 -> 0.85 s at sf0.1 — the dim^2 per-row products were a
    1-task stage on the single-split scan), so the plan holds exactly
    TWO exchanges: one REPARTITION_BY_NUM, one hashpartitioning
    aggregation — and still no join."""
    from pimdb_spark.catalog import _REGISTRY

    plan = plan_of(_REGISTRY["q_embedding_gram_int8"].fn(spark, SF))
    assert count_op(plan, "Exchange") == 2
    assert plan.count("REPARTITION_BY_NUM") == 1
    assert "Join" not in plan


def test_random_projection_shuffle_free(spark):
    """JL projection is a pure projection: zero exchanges, zero joins,
    no Python eval."""
    from pimdb_spark.catalog import _REGISTRY

    plan = plan_of(_REGISTRY["q_random_projection_int8"].fn(spark, SF))
    assert count_op(plan, "Exchange") == 0
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_bloom_probe_is_shuffle_free_and_codegen(spark):
    """The unrolled bloom probe: one-row broadcast map attach, NO
    hash-join against the bloom table, no fold-back exchange, and the
    md5 bit tests inside WholeStageCodegen (the measured design —
    operators/membership.bloom_probe)."""
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.corpus import ngrams
    from pimdb_spark.operators.membership import bloom_build, bloom_probe

    import pyspark.sql.functions as F

    docs = load(spark, SF, "documents")
    grams = docs.select(
        F.col("doc_id"), F.explode(ngrams("text", 5)).alias("gram")
    )
    bloom = bloom_build(
        docs.filter(F.col("doc_id") % 13 == 0).select(
            F.explode(ngrams("text", 5)).alias("gram")
        ),
        "gram", 65536, 3,
    )
    plan = plan_of(bloom_probe(grams, "gram", bloom, 65536, 3))
    # probe side: no per-gram hash join against the bloom table, no
    # fold-back exchange — the only join is the ONE-ROW map attach
    # (BroadcastNestedLoopJoin, constant), and the only exchange is the
    # bloom BUILD's own bit_or groupBy
    assert count_op(plan, "BroadcastHashJoin") == 0
    assert count_op(plan, "BroadcastNestedLoopJoin") == 1
    # every exchange sits on the bounded BUILD side: the eval-gram
    # distinct, the bit_or groupBy (<= m/32 rows), and the one-row
    # map_from_entries collapse — NOTHING scales with the probe side
    assert count_op(plan, "Exchange") == 3
    assert "BatchEvalPython" not in plan


def test_hll_registers_bounded_single_exchange(spark):
    """HLL register aggregation: one exchange into a <= 64-group
    aggregate, no joins."""
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.sketch import hll_registers

    import pyspark.sql.functions as F

    docs = load(spark, SF, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("item"))
    plan = plan_of(hll_registers(toks, "item"))
    assert count_op(plan, "Exchange") == 1
    assert "Join" not in plan


def test_sparse_doc_sim_norms_ride_pair_groupby(spark):
    """The fold-scorer similarity plan carries the per-doc norm as a
    doc-partitioned window + functionally dependent grouping keys, NOT
    as post-aggregation doc-keyed joins onto the pair frame (builder
    r19: beyond the broadcast threshold those were two pair-frame-sized
    sort-merge joins).  Bonus of the window form: its doc-hash exchange
    also satisfies the pair groupBy's distribution (doc_a is a subset
    of the grouping keys on the streamed side), so the dots aggregation
    adds no exchange of its own."""
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.retrieval import sparse_doc_similarity

    docs = load(spark, SF, "documents")
    plan = plan_of(sparse_doc_similarity(docs, max_df=10, threshold=0.0))
    tree = plan.split("\n\n")[0]
    # the ONLY join is the gram-keyed pair join (ngram_weights' bounded
    # joins sit behind the lazy localCheckpoint leaf)
    joins = sum(
        tree.count(j)
        for j in (
            "SortMergeJoin",
            "BroadcastHashJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
    )
    assert joins == 1, plan
    # norms ride the pair groupBy as grouping keys, fed by the window
    assert "_n2_a" in plan and "_n2_b" in plan, plan
    assert count_op(plan, "Window") >= 2, plan


def test_cms_heavy_hitters_one_pass_no_hash_join(spark):
    """cms_heavy_hitter_candidates: the exact counts ride the distinct
    enumeration's item-keyed groupBy and the sketch builds FROM those
    counts (associative BIGINT sums), so the initial plan holds exactly
    two scan branches of the SAME count subtree (runtime exchange reuse
    covers them) and ZERO hash joins — the only join is the sanctioned
    one-row sketch-map attach.  The prior form scanned the stream three
    times and paid a candidate semi-join plus a join-back (r19)."""
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.sketch import cms_heavy_hitter_candidates

    import pyspark.sql.functions as F

    docs = load(spark, SF, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("item"))
    plan = plan_of(
        cms_heavy_hitter_candidates(toks, "item", width=64, depth=3, min_est=100)
    )
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 2, plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in tree, plan
    assert count_op(plan, "BroadcastNestedLoopJoin") == 1, plan


def test_knn_label_errors_single_exchange_vote_stage(spark):
    """knn_label_errors: everything after the brute candidate pass runs
    on ONE q_id exchange — the votes groupBy (q_id-prefixed grouping
    keys), the majority-rank window and the n_agree window-sum all
    share it; the former second aggregation over the knn frame plus the
    q_id-keyed join that re-attached n_agree are gone (r19)."""
    from pimdb_spark.catalog import load
    from pimdb_spark.operators.selection import knn_label_errors

    import pyspark.sql.functions as F

    emb = load(spark, SF, "embeddings")
    queries = load(spark, SF, "embeddings").filter(F.col("vec_id") < 32)
    plan = plan_of(knn_label_errors(queries, emb, k=5))
    tree = plan.split("\n\n")[0]
    shuffles = sum(
        1
        for l in tree.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    )
    assert shuffles == 1, plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in tree, plan
    assert count_op(plan, "BroadcastNestedLoopJoin") == 1, plan
