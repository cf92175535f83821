"""Streaming MinHash+LSH near-dup (streaming/neardup.py): pair set must
match a Python model computed from the batch signature pipeline, and
state must carry across micro-batches (a doc arriving later pairs with a
stored doc from an earlier file)."""

from __future__ import annotations

import itertools


def _model_pairs(spark, docs_df, bands=4, rows_per_band=4, threshold=0.8):
    """Expected pairs from the BATCH signature/banding expressions (already
    property-tested against Python): bucket by band hash, then
    signature-estimate >= threshold for every in-bucket pair."""
    from pyspark.sql import functions as F

    from pimdb_spark.operators.dedup import (
        lsh_band_hashes,
        minhash_signature,
        word_shingles,
    )

    toks = F.split(F.col("text"), " ")
    sig_arr = minhash_signature(word_shingles(toks, 3), 16)
    rows = docs_df.select(
        "doc_id",
        sig_arr.alias("sig"),
        lsh_band_hashes(sig_arr, bands, rows_per_band).alias("bh"),
    ).collect()
    pairs = set()
    for band in range(bands):
        buckets: dict[str, list] = {}
        for r in rows:
            buckets.setdefault(r.bh[band], []).append(r)
        for members in buckets.values():
            for x, y in itertools.combinations(sorted(members, key=lambda r: r.doc_id), 2):
                est = sum(1 for a, b in zip(x.sig, y.sig) if a == b) / 16.0
                if est >= threshold:
                    pairs.add((x.doc_id, y.doc_id))
    return pairs


def _docs_subset(spark, pred):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(pred)
        .select("doc_id", "text")
    )


def test_stream_neardup_matches_model(spark, tmp_path):
    import duckdb

    from pimdb_spark.streaming.events import run_to_memory
    from pimdb_spark.streaming.neardup import neardup_pairs_stream

    src = tmp_path / "docs_stream"
    src.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id, text
        FROM '/root/testdata/sf0.001/documents.parquet' WHERE doc_id < 300)
        TO '{src}/a.parquet' (FORMAT PARQUET)"""
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = neardup_pairs_stream(stream, threshold=0.8)
    run_to_memory(out, "neardup_pairs", output_mode="append")
    got = {(r.id_a, r.id_b) for r in spark.table("neardup_pairs").collect()}

    expected = _model_pairs(spark, _docs_subset(spark, "doc_id < 300"))
    assert got == expected
    assert len(got) > 0  # the testdata contains near-dups below 300


def test_stream_neardup_state_spans_micro_batches(spark, tmp_path):
    """Pairs whose members arrive in DIFFERENT micro-batches must still be
    found: maxFilesPerTrigger=1 forces the two files through separate
    micro-batches of one query, so every (even, odd) cross-file pair
    proves the bucket state carried over between batches."""
    import duckdb

    from pimdb_spark.streaming.events import run_to_memory
    from pimdb_spark.streaming.neardup import neardup_pairs_stream

    src = tmp_path / "docs_incr"
    src.mkdir()
    con = duckdb.connect()
    for tag, parity in (("a", 0), ("b", 1)):
        con.execute(
            f"""COPY (SELECT doc_id, text
            FROM '/root/testdata/sf0.001/documents.parquet'
            WHERE doc_id < 300 AND doc_id % 2 = {parity})
            TO '{src}/{tag}.parquet' (FORMAT PARQUET)"""
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = neardup_pairs_stream(stream, threshold=0.8)
    run_to_memory(out, "neardup_incr", output_mode="append")
    got = {(r.id_a, r.id_b) for r in spark.table("neardup_incr").collect()}

    expected = _model_pairs(spark, _docs_subset(spark, "doc_id < 300"))
    assert got == expected
    cross = {(a, b) for a, b in got if (a % 2 == 0) != (b % 2 == 0)}
    assert cross  # pairs span the per-file micro-batches -> state worked


def test_stream_neardup_resumes_from_checkpoint(spark, tmp_path):
    """Cross-QUERY state restore: drain file A with a checkpoint, then
    start a NEW query on the same checkpoint after file B arrives — the
    second drain processes only B, so every (A, B) pair it emits proves
    the bucket state was restored from the state store, not recomputed."""
    import duckdb

    from pimdb_spark.streaming.neardup import neardup_pairs_stream

    src = tmp_path / "docs_chk"
    src.mkdir()
    chk = tmp_path / "chk"
    con = duckdb.connect()
    pairs: set = set()
    batches: list[int] = []

    def drain():
        def sink(batch_df, _epoch):
            got = batch_df.collect()
            batches.append(len(got))
            for r in got:
                pairs.add((r.id_a, r.id_b))

        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        q = (
            neardup_pairs_stream(stream, threshold=0.8)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    con.execute(
        f"""COPY (SELECT doc_id, text
        FROM '/root/testdata/sf0.001/documents.parquet'
        WHERE doc_id < 300 AND doc_id % 2 = 0)
        TO '{src}/a.parquet' (FORMAT PARQUET)"""
    )
    drain()
    con.execute(
        f"""COPY (SELECT doc_id, text
        FROM '/root/testdata/sf0.001/documents.parquet'
        WHERE doc_id < 300 AND doc_id % 2 = 1)
        TO '{src}/b.parquet' (FORMAT PARQUET)"""
    )
    drain()

    expected = _model_pairs(spark, _docs_subset(spark, "doc_id < 300"))
    assert pairs == expected
    cross = {(a, b) for a, b in pairs if (a % 2 == 0) != (b % 2 == 0)}
    assert cross  # found by the SECOND query -> state came from checkpoint


def test_cross_neardup_stream_matches_batch_across_splits(spark, tmp_path):
    """Drained-batch parity for the incremental-ingest gate twin: the new
    corpus arrives in two micro-batch files, every per-doc verdict must
    equal the batch cross_neardup_filter over the whole new corpus (a
    verdict depends only on the doc itself vs the static reference, so
    parity is structural — this asserts it anyway), and the fixture
    plants truncated copies so matched and unmatched rows both occur."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from pimdb_spark.catalog import load
    from pimdb_spark.operators.dedup import cross_neardup_filter
    from pimdb_spark.streaming.neardup import cross_neardup_stream

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    ref = docs.filter(F.col("doc_id") % 7 == 0)
    toks = F.split("text", " ")
    off = docs.agg((F.lit(1) + F.max("doc_id")).alias("_o"))
    trunc = (
        ref.filter(F.col("doc_id") % 3 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("_o")).alias("doc_id"),
            F.concat_ws(
                " ",
                F.slice(toks, 1, F.expr("(3 * size(split(text, ' '))) div 5")),
            ).alias("text"),
        )
    )
    new = docs.filter(F.col("doc_id") % 7 != 0).union(trunc)

    src = tmp_path / "new_stream"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"stage_{name}"
        new.filter(F.col("doc_id") % 2 == half).coalesce(1).write.parquet(
            str(stage)
        )
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    out_path = str(tmp_path / "verdicts")
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    q = cross_neardup_stream(
        stream, ref, out_path, str(tmp_path / "chk"), threshold=0.5
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {
        r.doc_id: (r.n_ref_matches, r.best_ref, r.best_jacc, r.matched)
        for r in spark.read.parquet(out_path).collect()
    }
    expected = {
        r.doc_id: (r.n_ref_matches, r.best_ref, r.best_jacc, r.matched)
        for r in cross_neardup_filter(new, ref, threshold=0.5).collect()
    }
    assert got == expected
    assert len(got) == new.count()
    assert any(v[3] == 1 for v in got.values())  # planted copies caught
    assert any(v[3] == 0 for v in got.values())  # organic docs pass


def test_incremental_split_stream_matches_batch_id_ordered(spark, tmp_path):
    """Drained-batch parity for the streaming leakage fence under the
    stated order contract (id-ordered ingest: every cluster's min-id
    member arrives first): per-doc 'split' / 'inherited' verdicts must
    equal the one-shot batch composition over the whole new corpus,
    because the growing reference reproduces the component closure hop
    by hop — copies of the same source doc split across micro-batches
    inherit the same side through the admitted earlier copy."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from pimdb_spark.catalog import load
    from pimdb_spark.operators.curation import (
        connected_components,
        incremental_split_inherit,
    )
    from pimdb_spark.operators.dedup import (
        _minhash_doc_signatures,
        cross_minhash_pairs_from_signatures,
        minhash_pairs_from_signatures,
    )
    from pimdb_spark.operators.curation import hash_bucket
    from pimdb_spark.streaming.neardup import incremental_split_stream

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    ref = docs
    ref_splits = docs.select(
        F.col("doc_id").alias("ref_id"),
        F.when(hash_bucket(F.col("doc_id")) < 90, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
    # new shard: TWO exact copies of every 10th doc (>=3 tokens) so a
    # near-dup cluster spans micro-batches, plus token-reversed texts of
    # every 10th-plus-1 doc as known fresh singletons
    off = docs.agg((F.lit(1) + F.max("doc_id")).alias("_o"))
    eligible = docs.filter(
        (F.col("doc_id") % 10 == 0) & (F.size(F.split("text", " ")) >= 3)
    )
    copy1 = eligible.crossJoin(F.broadcast(off)).select(
        (F.col("doc_id") + F.col("_o")).alias("doc_id"), "text"
    )
    copy2 = eligible.crossJoin(F.broadcast(off)).select(
        (F.col("doc_id") + 2 * F.col("_o")).alias("doc_id"), "text"
    )
    fresh = (
        docs.filter(F.col("doc_id") % 10 == 1)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + 3 * F.col("_o")).alias("doc_id"),
            F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
        )
    )
    new = copy1.union(copy2).union(fresh)
    o = off.first()[0]
    cut = 2 * o  # batch A: first copies (+ nothing else below 2*o)

    src = tmp_path / "new_stream"
    src.mkdir()
    for name, pred in (
        ("a", F.col("doc_id") < cut),
        ("b", F.col("doc_id") >= cut),
    ):
        stage = tmp_path / f"stage_{name}"
        new.filter(pred).coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    splits_path = str(tmp_path / "ref_splits")
    ref_splits.write.parquet(splits_path)
    out_path = str(tmp_path / "verdicts")
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    q = incremental_split_stream(
        stream,
        ref,
        splits_path,
        str(tmp_path / "admitted"),
        out_path,
        str(tmp_path / "chk"),
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {
        r.id: (r.split, r.inherited)
        for r in spark.read.parquet(out_path).collect()
    }

    # one-shot batch composition over the whole new corpus
    sig_new = _minhash_doc_signatures(new, "doc_id", "text", 3, 16)
    sig_ref = _minhash_doc_signatures(ref, "doc_id", "text", 3, 16)
    nn = minhash_pairs_from_signatures(sig_new, 16, 4, 0.8)
    comp = connected_components(
        nn, "id_a", "id_b", nodes=new.select("doc_id"), max_iter=100
    )
    cross = cross_minhash_pairs_from_signatures(
        sig_new, sig_ref, 16, 8, 0.5
    ).select(F.col("id_a").alias("new_id"), F.col("id_b").alias("ref_id"))
    expected = {
        r.id: (r.split, r.inherited)
        for r in incremental_split_inherit(
            comp.select(F.col("id").alias("doc_id"), "component"),
            cross,
            ref_splits,
            id_col="doc_id",
        ).collect()
    }
    assert got == expected
    assert len(got) == new.count()
    # cross-batch inheritance actually exercised: every second copy
    # (batch B) is inherited, and its side matches its batch-A sibling
    for r in spark.read.parquet(out_path).collect():
        if 2 * o <= r.id < 3 * o:
            sib = got.get(r.id - o)
            assert sib is not None and r.inherited == 1
            assert r.split == sib[0]
    assert any(v[1] == 0 for v in got.values())  # fresh singletons exist


def test_incremental_split_stream_never_splits_cluster_any_order(spark, tmp_path):
    """The fence's order-robustness contract: under arrival order that
    VIOLATES min-id-first (batches fed in reverse id order), which side a
    fresh cluster lands on may differ from the one-shot split, but no
    near-dup cluster may ever straddle train/eval — later members inherit
    through the admitted earlier member."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from pimdb_spark.catalog import load
    from pimdb_spark.operators.curation import hash_bucket
    from pimdb_spark.streaming.neardup import incremental_split_stream

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    ref = docs
    ref_splits = docs.select(
        F.col("doc_id").alias("ref_id"),
        F.when(hash_bucket(F.col("doc_id")) < 90, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
    off = docs.agg((F.lit(1) + F.max("doc_id")).alias("_o"))
    eligible = docs.filter(
        (F.col("doc_id") % 10 == 0) & (F.size(F.split("text", " ")) >= 3)
    )
    copy1 = eligible.crossJoin(F.broadcast(off)).select(
        (F.col("doc_id") + F.col("_o")).alias("doc_id"), "text"
    )
    copy2 = eligible.crossJoin(F.broadcast(off)).select(
        (F.col("doc_id") + 2 * F.col("_o")).alias("doc_id"), "text"
    )
    new = copy1.union(copy2)
    o = off.first()[0]

    src = tmp_path / "new_stream"
    src.mkdir()
    # REVERSED order: the higher-id copies (batch file sorts
    # lexicographically, so name them to arrive high-ids-first)
    for name, pred in (
        ("a", F.col("doc_id") >= 2 * o),
        ("b", F.col("doc_id") < 2 * o),
    ):
        stage = tmp_path / f"stage_{name}"
        new.filter(pred).coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    out_path = str(tmp_path / "verdicts")
    splits_path = str(tmp_path / "ref_splits")
    ref_splits.write.parquet(splits_path)
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    q = incremental_split_stream(
        stream,
        ref,
        splits_path,
        str(tmp_path / "admitted"),
        out_path,
        str(tmp_path / "chk"),
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {r.id: r.split for r in spark.read.parquet(out_path).collect()}
    assert len(got) == new.count()
    # every copy pair (d+o, d+2o) is one near-dup cluster: same side,
    # regardless of which member arrived first
    for d in [r.doc_id for r in eligible.collect()]:
        a, b = got[d + o], got[d + 2 * o]
        assert a == b, (d, a, b)
        assert a in ("train", "eval", "conflict")


# ---------------------------------------------------------------------------
# Replay contract of the incremental fence (the r15 ADVICE fixes): an
# epoch re-fired with the same batch id and rows must re-emit IDENTICAL
# verdict rows — no self-match 'inherited' flip, no same-batch
# opposite-sides 'conflict' flip, counts included — and later epochs
# must be unaffected by the duplicate reference appends the replay left.
# ---------------------------------------------------------------------------

_R1_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_R2_TEXT = "one two three four five six seven eight nine ten"
_UNIQ_TEXT = "red orange yellow green blue indigo violet crimson amber teal"
_LONG_TEXT = (
    "north south east west up down left right front back spring summer "
    "autumn winter morning noon evening night dawn dusk"
)
# 70% prefix: 12/18 distinct shingles shared -> Jaccard 0.667, inside the
# ADVICE's [0.5, 0.8) window (cross gate at 0.5 sees the pair; the 0.8
# self-closure does not)
_PREFIX_TEXT = " ".join(_LONG_TEXT.split(" ")[:14])


def _fence_fixture(spark, tmp_path):
    """(ref_docs, splits_path, admitted_path, out_path, batch0) — ids 103
    (fresh side train) and 112 (fresh side eval) carry the prefix pair;
    101 copies the train reference; 102 is a unique singleton DELIVERED
    TWICE in the batch (at-least-once duplicate)."""
    from pyspark.sql import functions as F  # noqa: F401

    ref_docs = spark.createDataFrame(
        [(1, _R1_TEXT), (2, _R2_TEXT)], "doc_id long, text string"
    )
    splits_path = str(tmp_path / "ref_splits")
    # seed WITHOUT an epoch column — the pre-stream-seed compat path
    spark.createDataFrame(
        [(1, "train"), (2, "eval")], "ref_id long, split string"
    ).write.parquet(splits_path)
    batch0 = spark.createDataFrame(
        [
            (101, _R1_TEXT),
            (102, _UNIQ_TEXT),
            (102, _UNIQ_TEXT),  # within-batch duplicate delivery
            (103, _LONG_TEXT),
            (112, _PREFIX_TEXT),
        ],
        "doc_id long, text string",
    )
    return (
        ref_docs,
        splits_path,
        str(tmp_path / "admitted"),
        str(tmp_path / "verdicts"),
        batch0,
    )


def test_incremental_split_batch_replay_identical(spark, tmp_path):
    """Re-running an epoch appends byte-identical verdict rows: the epoch
    fence hides the epoch's own admissions from its replay."""
    from pimdb_spark.operators.dedup import (
        _minhash_doc_signatures,
        cross_minhash_pairs_from_signatures,
    )
    from pimdb_spark.streaming.neardup import incremental_split_batch

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    # fixture self-check: the prefix pair IS cross-detectable at the 8x2
    # banding / 0.5 gate (otherwise the conflict-flip scenario this test
    # exists to rule out could never fire and the test would pass vacuously)
    sig_a = _minhash_doc_signatures(
        batch0.filter("doc_id = 103"), "doc_id", "text", 3, 16
    )
    sig_b = _minhash_doc_signatures(
        batch0.filter("doc_id = 112"), "doc_id", "text", 3, 16
    )
    gate_pairs = cross_minhash_pairs_from_signatures(sig_a, sig_b, 16, 8, 0.5).collect()
    sig_a.unpersist(), sig_b.unpersist()
    assert len(gate_pairs) == 1 and 0.5 <= gate_pairs[0].jacc < 0.8, gate_pairs

    kw = dict(
        ref_splits_path=splits_path, admitted_path=admitted_path, out_path=out_path
    )
    incremental_split_batch(batch0, 0, ref_docs, **kw)
    first = sorted(
        tuple(r) for r in spark.read.parquet(out_path).collect()
    )
    # one verdict row per DISTINCT doc id (the duplicate 102 delivery
    # collapses), correct decisions
    assert [t[0] for t in first] == [101, 102, 103, 112]
    by_id = {t[0]: t for t in first}
    assert by_id[101][4] == "train" and by_id[101][5] == 1  # inherited from R1
    assert by_id[102][4] == "train" and by_id[102][5] == 0  # fresh, hb(102)=23
    assert by_id[103][4] == "train" and by_id[103][5] == 0  # fresh, hb(103)=82
    assert by_id[112][4] == "eval" and by_id[112][5] == 0  # fresh, hb(112)=94

    # REPLAY epoch 0: same batch, same epoch id
    incremental_split_batch(batch0, 0, ref_docs, **kw)
    replayed = sorted(tuple(r) for r in spark.read.parquet(out_path).collect())
    # exactly two copies of each first-run row — every column identical:
    # no 'conflict' flip on 103/112, no inherited flip on any doc, counts
    # unchanged
    assert replayed == sorted(first + first)


def test_incremental_split_batch_later_epoch_ignores_replay_duplicates(
    spark, tmp_path
):
    """A replayed epoch appends duplicate reference rows; a LATER epoch
    must dedupe them on read — counts stay exact and duplicated admitted
    texts never corrupt the signature input."""
    from pimdb_spark.streaming.neardup import incremental_split_batch

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    kw = dict(
        ref_splits_path=splits_path, admitted_path=admitted_path, out_path=out_path
    )
    incremental_split_batch(batch0, 0, ref_docs, **kw)
    incremental_split_batch(batch0, 0, ref_docs, **kw)  # replay
    # epoch 1: a copy of 102's text must inherit 102's side with
    # n_train_refs EXACTLY 1 (102 was admitted twice by the replay)
    batch1 = spark.createDataFrame(
        [(201, _UNIQ_TEXT)], "doc_id long, text string"
    )
    incremental_split_batch(batch1, 1, ref_docs, **kw)
    (row,) = [
        r for r in spark.read.parquet(out_path).collect() if r.id == 201
    ]
    assert row.split == "train" and row.inherited == 1
    assert row.n_train_refs == 1 and row.n_eval_refs == 0


def test_incremental_split_batch_corrupt_admitted_fails_loudly(spark, tmp_path):
    """Only the first-batch missing admitted path is survivable; a corrupt
    reference read must fail the batch, not silently drop the reference
    (a dropped reference = a permanent train/eval leak)."""
    import os

    import pytest

    from pimdb_spark.streaming.neardup import incremental_split_batch

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    os.makedirs(admitted_path)
    with open(os.path.join(admitted_path, "part-00000.parquet"), "wb") as f:
        f.write(b"definitely not parquet bytes")
    with pytest.raises(Exception, match="(?i)parquet|footer|FAILED_READ"):
        incremental_split_batch(
            batch0,
            0,
            ref_docs,
            ref_splits_path=splits_path,
            admitted_path=admitted_path,
            out_path=out_path,
        )
    # and nothing was emitted for the failed epoch
    assert not os.path.exists(out_path) or not [
        f for f in os.listdir(out_path) if f.endswith(".parquet")
    ]


def test_incremental_split_batch_signature_table_parity(spark, tmp_path):
    """SIGNATURE mode (static signatures computed once + the admitted
    signature TABLE) emits verdicts identical to TEXT mode epoch by
    epoch, stays replay-identical under the same epoch fence, and never
    re-shingles reference text — proven structurally by handing sig mode
    a ref_docs frame with POISONED text: verdicts can only be right if
    the gate reads the signature frames, not the texts."""
    from pyspark.sql import functions as F

    from pimdb_spark.operators.dedup import minhash_doc_signatures
    from pimdb_spark.streaming.neardup import incremental_split_batch

    results = {}
    for mode in ("text", "sig"):
        base = tmp_path / mode
        ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
            spark, base
        )
        kw = dict(
            ref_splits_path=splits_path,
            admitted_path=admitted_path,
            out_path=out_path,
        )
        handler_ref = ref_docs
        sig_static = None
        if mode == "sig":
            sig_static = minhash_doc_signatures(ref_docs, "doc_id", "text", 3, 16)
            kw["ref_signatures"] = sig_static
            kw["admitted_signatures_path"] = str(base / "admitted_sigs")
            # poison the text column: any code path that re-shingles the
            # static reference now produces wrong verdicts
            handler_ref = ref_docs.select(
                "doc_id", F.lit("poisoned text only").alias("text")
            )
        # epoch 1: 201 inherits 102's side through the admitted state;
        # 202 (copy of 103's text) reaches admitted 103 (train) AND
        # admitted 112 (eval, J=0.667) -> conflict via admitted state
        batch1 = spark.createDataFrame(
            [(201, _UNIQ_TEXT), (202, _LONG_TEXT)], "doc_id long, text string"
        )
        incremental_split_batch(batch0, 0, handler_ref, **kw)
        if mode == "sig":
            incremental_split_batch(batch0, 0, handler_ref, **kw)  # replay
        incremental_split_batch(batch1, 1, handler_ref, **kw)
        rows = [tuple(r) for r in spark.read.parquet(out_path).collect()]
        if mode == "sig":
            # replay appended a second identical copy of every epoch-0 row
            by_id = {}
            for t in rows:
                by_id.setdefault(t[0], []).append(t)
            for i in (101, 102, 103, 112):
                assert len(by_id[i]) == 2 and by_id[i][0] == by_id[i][1], by_id[i]
            # caller-owned static signatures are NOT unpersisted per batch
            assert sig_static.storageLevel.useMemory
            sig_static.unpersist()
        results[mode] = set(rows)
    assert results["sig"] == results["text"]
    by_id = {t[0]: t for t in results["sig"]}
    # (id, component, n_train_refs, n_eval_refs, split, inherited)
    assert by_id[201][2:] == (1, 0, "train", 1)  # through admitted state
    assert by_id[202][2:] == (1, 1, "conflict", 1)  # straddling admissions


def test_incremental_split_stream_signature_mode(spark, tmp_path):
    """End-to-end SIGNATURE-mode stream: two micro-batch files drain with
    admitted_signatures_path set — cross-batch inheritance flows through
    the admitted signature TABLE and the static signatures computed once
    by the wrapper."""
    import glob
    import shutil

    from pimdb_spark.streaming.neardup import incremental_split_stream

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    batch1 = spark.createDataFrame(
        [(201, _UNIQ_TEXT), (202, _LONG_TEXT)], "doc_id long, text string"
    )
    import os
    import time

    src = tmp_path / "stream_src"
    src.mkdir()
    now = time.time()
    for i, (name, df) in enumerate((("a", batch0), ("b", batch1))):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        dest = src / f"{name}.parquet"
        shutil.copy(part, dest)
        # distinct mtimes pin micro-batch order (file source orders by
        # modification time): batch0 must be admitted before batch1
        os.utime(dest, (now - 20 + 10 * i, now - 20 + 10 * i))

    stream = (
        spark.readStream.schema(batch0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = incremental_split_stream(
        stream,
        ref_docs,
        splits_path,
        admitted_path,
        out_path,
        str(tmp_path / "chk"),
        admitted_signatures_path=str(tmp_path / "admitted_sigs"),
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {
        r.id: (r.n_train_refs, r.n_eval_refs, r.split, r.inherited)
        for r in spark.read.parquet(out_path).collect()
    }
    assert got[101] == (1, 0, "train", 1)   # inherits the static reference
    assert got[201] == (1, 0, "train", 1)   # inherits through the sig table
    assert got[202] == (1, 1, "conflict", 1)
    assert got[103][2] == "train" and got[112][2] == "eval"


def test_incremental_split_stream_mode_switch_guard_and_backfill(spark, tmp_path):
    """A TEXT-mode history must not silently under-reference a
    SIGNATURE-mode restart (a near-dup of an un-migrated admitted doc
    would get a fresh hash side — the leak the fence prevents): the
    stream-start guard raises until backfill_admitted_signatures
    migrates, after which signature mode inherits through the backfilled
    rows exactly as text mode would."""
    import pytest

    from pimdb_spark.streaming.neardup import (
        _max_epoch,
        backfill_admitted_signatures,
        incremental_split_batch,
        incremental_split_stream,
    )

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    kw = dict(
        ref_splits_path=splits_path, admitted_path=admitted_path, out_path=out_path
    )
    incremental_split_batch(batch0, 0, ref_docs, **kw)  # TEXT-mode epoch 0

    sig_path = str(tmp_path / "admitted_sigs")
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(batch0.schema).parquet(str(src))
    with pytest.raises(ValueError, match="backfill_admitted_signatures"):
        incremental_split_stream(
            stream,
            ref_docs,
            splits_path,
            admitted_path,
            out_path,
            str(tmp_path / "chk"),
            admitted_signatures_path=sig_path,
        )

    n = backfill_admitted_signatures(spark, admitted_path, sig_path)
    assert n == 4  # 101, 102, 103, 112 — one row each, original epochs
    assert _max_epoch(spark, sig_path) == _max_epoch(spark, admitted_path) == 0

    # SIGNATURE-mode epoch 1 inherits through the BACKFILLED rows
    batch1 = spark.createDataFrame(
        [(201, _UNIQ_TEXT)], "doc_id long, text string"
    )
    incremental_split_batch(
        batch1, 1, ref_docs, admitted_signatures_path=sig_path, **kw
    )
    (row,) = [r for r in spark.read.parquet(out_path).collect() if r.id == 201]
    assert (row.n_train_refs, row.n_eval_refs, row.split, row.inherited) == (
        1, 0, "train", 1,
    )


def test_incremental_split_batch_short_doc_marker_rows(spark, tmp_path):
    """A shingle-less admitted doc (< k tokens) gets a NULL-signature
    MARKER row: the signature table's epoch coverage stays equal to the
    texts table's (no false mode-switch alarm) and the marker never
    reaches the banding pass."""
    from pimdb_spark.streaming.neardup import _max_epoch, incremental_split_batch

    ref_docs, splits_path, admitted_path, out_path, _ = _fence_fixture(
        spark, tmp_path
    )
    sig_path = str(tmp_path / "sigs")
    kw = dict(
        ref_splits_path=splits_path,
        admitted_path=admitted_path,
        out_path=out_path,
        admitted_signatures_path=sig_path,
    )
    b0 = spark.createDataFrame([(301, "too short")], "doc_id long, text string")
    incremental_split_batch(b0, 0, ref_docs, **kw)
    (marker,) = spark.read.parquet(sig_path).collect()
    assert marker.doc == 301 and marker.shingles is None and marker.epoch == 0

    b1 = spark.createDataFrame([(302, _UNIQ_TEXT)], "doc_id long, text string")
    incremental_split_batch(b1, 1, ref_docs, **kw)
    rows = {r.id: r.split for r in spark.read.parquet(out_path).collect()}
    assert rows[301] in ("train", "eval") and rows[302] in ("train", "eval")
    assert _max_epoch(spark, admitted_path) == _max_epoch(spark, sig_path) == 1


def test_incremental_split_batch_reset_checkpoint_guard(spark, tmp_path):
    """A batch whose epoch is BEHIND the admitted table's max means the
    stream's checkpoint was reset (foreachBatch ids restart at 0) — the
    epoch fence would then hide every prior admission, handing a
    near-dup of an admitted doc a fresh hash side.  The batch must fail
    loudly; a legitimate replay of the LAST epoch still runs."""
    import pytest

    from pimdb_spark.streaming.neardup import incremental_split_batch

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    kw = dict(
        ref_splits_path=splits_path, admitted_path=admitted_path, out_path=out_path
    )
    incremental_split_batch(batch0, 0, ref_docs, **kw)
    batch1 = spark.createDataFrame([(201, _UNIQ_TEXT)], "doc_id long, text string")
    incremental_split_batch(batch1, 1, ref_docs, **kw)
    # replay of the LAST epoch: allowed, replay-identical
    incremental_split_batch(batch1, 1, ref_docs, **kw)
    rows = [r for r in spark.read.parquet(out_path).collect() if r.id == 201]
    assert len(rows) == 2 and tuple(rows[0]) == tuple(rows[1])
    # reset checkpoint: epoch restarts at 0 while the table reaches 1
    with pytest.raises(ValueError, match="checkpoint was reset"):
        incremental_split_batch(batch0, 0, ref_docs, **kw)
    # and the failed batch emitted nothing new
    assert len(spark.read.parquet(out_path).collect()) == 6  # 4 + 2 replays


def test_cross_neardup_stream_unpersists_batch_signatures(spark, tmp_path):
    """The cross gate's handler owns the per-batch new-side signature
    frame and unpersists it after the sink write: a long-running stream
    must not accumulate one cached frame per micro-batch (only the
    stream-lifetime static reference signatures stay cached)."""
    import glob
    import shutil

    from pimdb_spark.streaming.neardup import cross_neardup_stream

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    src = tmp_path / "src"
    src.mkdir()
    for name, half in (("a", 0), ("b", 1)):
        stage = tmp_path / f"stage_{name}"
        batch0.filter(f"doc_id % 2 = {half}").coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    stream = (
        spark.readStream.schema(batch0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = cross_neardup_stream(
        stream, ref_docs, str(tmp_path / "verdicts"), str(tmp_path / "chk")
    )
    assert q.awaitTermination(300), "stream drain timed out"
    # two micro-batches ran; at most ONE new cached entry survives (the
    # stream-owned static sig_ref) — per-batch sig_new frames are gone
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)
    got = {r.doc_id for r in spark.read.parquet(str(tmp_path / "verdicts")).collect()}
    assert got == {101, 102, 103, 112}


def test_backfill_admitted_signatures_keeps_min_epoch(spark, tmp_path):
    """A doc admitted in MULTIPLE epochs (at-least-once delivery across
    batches) must backfill with its MINIMUM epoch: the text-mode fence
    made it visible from min+1 onward, so a replay of any later epoch
    must still see it — keeping an arbitrary later epoch would break the
    replay-identical contract the migration preserves."""
    from pimdb_spark.streaming.neardup import (
        _max_epoch,
        backfill_admitted_signatures,
    )

    admitted_path = str(tmp_path / "admitted")
    spark.createDataFrame(
        [
            (101, _UNIQ_TEXT, 0),
            (101, _UNIQ_TEXT, 2),  # re-delivered two epochs later
            (102, _LONG_TEXT, 2),
        ],
        "doc_id long, text string, epoch int",
    ).write.parquet(admitted_path)
    sig_path = str(tmp_path / "sigs")
    n = backfill_admitted_signatures(spark, admitted_path, sig_path)
    assert n == 2
    epochs = {r.doc: r.epoch for r in spark.read.parquet(sig_path).collect()}
    assert epochs == {101: 0, 102: 2}
    assert _max_epoch(spark, sig_path) == 2


def test_backfill_admitted_signatures_legacy_null_epochs(spark, tmp_path):
    """A text-mode table whose early rows PREDATE epoch stamping reads
    those rows with NULL epoch under mergeSchema (the epoch-column check
    is table-level, not row-level).  Backfill must resolve them to -1 —
    the always-visible legacy convention _visible_before applies to the
    source table — never write NULL epochs, which the fence's
    strictly-less filter would silently hide from every batch.  A doc
    in BOTH generations must likewise keep -1 (the coalesced min), so
    the min-epoch window has to sort the COALESCED column."""
    from pimdb_spark.streaming.neardup import (
        _read_state_table,
        backfill_admitted_signatures,
    )

    admitted_path = str(tmp_path / "admitted")
    # generation 1: pre-fence writer, no epoch column
    spark.createDataFrame(
        [(201, _UNIQ_TEXT), (203, _LONG_TEXT)], "doc_id long, text string"
    ).write.parquet(admitted_path)
    # generation 2: epoch-stamped writer appends (203 re-delivered)
    spark.createDataFrame(
        [(202, _LONG_TEXT, 1), (203, _LONG_TEXT, 2)],
        "doc_id long, text string, epoch int",
    ).write.mode("append").parquet(admitted_path)
    sig_path = str(tmp_path / "sigs")
    n = backfill_admitted_signatures(spark, admitted_path, sig_path)
    assert n == 3
    epochs = {r.doc: r.epoch for r in spark.read.parquet(sig_path).collect()}
    assert epochs == {201: -1, 202: 1, 203: -1}
    # legacy rows are visible to EVERY epoch, including the first
    vis0 = {r.doc for r in _read_state_table(spark, sig_path, 0).collect()}
    assert vis0 == {201, 203}


def test_signature_mode_prefers_real_signature_over_marker(spark, tmp_path):
    """A doc admitted once shingle-less (NULL-signature marker row) and
    later with real text must resolve to its REAL signature row on the
    reference side: markers are filtered BEFORE the per-doc dedup, so
    the dedup cannot silently drop the doc from the banding pass."""
    from pyspark.sql import functions as F

    from pimdb_spark.streaming.neardup import incremental_split_batch

    ref_docs, splits_path, admitted_path, out_path, _ = _fence_fixture(
        spark, tmp_path
    )
    sig_path = str(tmp_path / "sigs")
    kw = dict(
        ref_splits_path=splits_path,
        admitted_path=admitted_path,
        out_path=out_path,
        admitted_signatures_path=sig_path,
    )
    # epoch 0: 301 arrives shingle-less -> NULL marker row
    b0 = spark.createDataFrame([(301, "too short")], "doc_id long, text string")
    incremental_split_batch(b0, 0, ref_docs, **kw)
    # epoch 1: 301 re-delivered with real text -> real signature row
    b1 = spark.createDataFrame([(301, _UNIQ_TEXT)], "doc_id long, text string")
    incremental_split_batch(b1, 1, ref_docs, **kw)
    sig_rows = spark.read.parquet(sig_path).filter(F.col("doc") == 301).collect()
    assert {r.epoch for r in sig_rows} == {0, 1}
    assert any(r.shingles is not None for r in sig_rows)
    # epoch 2: a copy of 301's real text must inherit 301's side — the
    # reference side resolved 301 to the real row, not the marker
    b2 = spark.createDataFrame([(401, _UNIQ_TEXT)], "doc_id long, text string")
    incremental_split_batch(b2, 2, ref_docs, **kw)
    (row,) = [r for r in spark.read.parquet(out_path).collect() if r.id == 401]
    side_301 = {r.id: r.split for r in spark.read.parquet(out_path).collect()}[301]
    assert row.inherited == 1 and row.split == side_301
    assert row.n_train_refs + row.n_eval_refs == 1


def test_incremental_split_stream_epoch_guard_is_one_scan(
    spark, tmp_path, monkeypatch
):
    """The reset-checkpoint guard costs ONE admitted-table scan at stream
    start; per micro-batch it is an O(1) check against the handler's
    closure-maintained max — no per-batch parquet scan+agg of the
    (reference-sized) admitted table in either fence mode."""
    import glob
    import os
    import shutil
    import time

    from pimdb_spark.streaming import neardup as N

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    batch1 = spark.createDataFrame(
        [(201, _UNIQ_TEXT)], "doc_id long, text string"
    )

    calls: list[str] = []
    real = N._max_epoch

    def counting(s, p):
        calls.append(p)
        return real(s, p)

    monkeypatch.setattr(N, "_max_epoch", counting)

    src = tmp_path / "stream_src"
    src.mkdir()
    now = time.time()
    for i, (name, df) in enumerate((("a", batch0), ("b", batch1))):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        (part,) = glob.glob(str(stage / "part-*.parquet"))
        dest = src / f"{name}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (now - 20 + 10 * i, now - 20 + 10 * i))

    stream = (
        spark.readStream.schema(batch0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = N.incremental_split_stream(
        stream,
        ref_docs,
        splits_path,
        admitted_path,
        out_path,
        str(tmp_path / "chk"),
    )
    assert q.awaitTermination(300), "stream drain timed out"
    # two micro-batches drained, yet the admitted table was scanned for
    # its max epoch exactly once — at stream start
    assert calls.count(admitted_path) == 1
    ids = {r.id for r in spark.read.parquet(out_path).collect()}
    assert {101, 102, 103, 112, 201} <= ids


def test_incremental_split_batch_epoch_state_guard(spark, tmp_path, monkeypatch):
    """A caller-owned epoch_state dict makes the guard O(1): the admitted
    table is never rescanned, the closure max stays monotone across
    batches (including a legitimate last-epoch replay), and a reset
    epoch still fails loudly."""
    import pytest

    from pimdb_spark.streaming import neardup as N

    ref_docs, splits_path, admitted_path, out_path, batch0 = _fence_fixture(
        spark, tmp_path
    )
    kw = dict(
        ref_splits_path=splits_path, admitted_path=admitted_path, out_path=out_path
    )
    state = {"max_epoch": N._max_epoch(spark, admitted_path)}
    assert state["max_epoch"] is None  # table missing pre-stream

    def boom(s, p):  # any rescan with epoch_state present is the bug
        raise AssertionError("guard must not rescan the admitted table")

    monkeypatch.setattr(N, "_max_epoch", boom)
    N.incremental_split_batch(batch0, 0, ref_docs, epoch_state=state, **kw)
    assert state["max_epoch"] == 0
    batch1 = spark.createDataFrame(
        [(201, _UNIQ_TEXT)], "doc_id long, text string"
    )
    N.incremental_split_batch(batch1, 1, ref_docs, epoch_state=state, **kw)
    assert state["max_epoch"] == 1
    # replay of the LAST epoch: allowed, monotone value unchanged
    N.incremental_split_batch(batch1, 1, ref_docs, epoch_state=state, **kw)
    assert state["max_epoch"] == 1
    # reset checkpoint: epoch restarts at 0 while the closure max is 1
    with pytest.raises(ValueError, match="checkpoint was reset"):
        N.incremental_split_batch(batch0, 0, ref_docs, epoch_state=state, **kw)
