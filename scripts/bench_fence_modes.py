"""Measure the streaming fence's two reference-side modes
(streaming/neardup.incremental_split_batch): TEXT mode re-shingles the
whole reference (static + admitted) every batch; SIGNATURE mode computes
signatures exactly once at admission and reads them back per batch.

Protocol: reference = all sf documents with a doc-level hash-split seed;
three 250-doc micro-batches (token-reversed texts of the first 750 docs
— fresh singletons, so every batch admits everything and the admitted
side GROWS).  Per mode, time each epoch's full handler call; signature
mode also reports the one-time static-signature build (admission cost,
paid once per stream — not per batch).

Usage: python scripts/bench_fence_modes.py [sf_dir] [ref_multiplier]
[batch_rows]
``ref_multiplier`` unions k offset-id copies of the documents table into
the reference, demonstrating how the saving scales with reference size
(text mode re-shingles the WHOLE reference every batch; signature mode's
per-batch reference cost is a signature-row scan).  ``batch_rows``
(default 500) sets the micro-batch size — shrink it while growing the
multiplier to measure the corpus-size-vs-batch-size separation at a
production-like reference:batch ratio.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pimdb_spark.catalog import load  # noqa: E402
from pimdb_spark.operators.curation import hash_bucket  # noqa: E402
from pimdb_spark.operators.dedup import minhash_doc_signatures  # noqa: E402
from pimdb_spark.session import get_spark  # noqa: E402
from pimdb_spark.streaming.neardup import incremental_split_batch  # noqa: E402

N_BATCHES = 4
BATCH_ROWS = 500


def main() -> None:
    global BATCH_ROWS
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("fence-mode-bench")
    spark.sparkContext.setLogLevel("ERROR")
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if len(sys.argv) > 3:
        BATCH_ROWS = int(sys.argv[3])
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    span = docs.agg(F.lit(1) + F.max("doc_id")).first()[0]
    ref = docs
    for i in range(1, mult):
        ref = ref.union(
            docs.select(
                (F.col("doc_id") + F.lit(i * span)).alias("doc_id"), "text"
            )
        )
    ref = ref.repartition(par).localCheckpoint(eager=True)
    out_mult = mult
    off = ref.agg(F.lit(1) + F.max("doc_id")).first()[0]
    fresh = (
        ref.orderBy("doc_id")
        .limit(N_BATCHES * BATCH_ROWS)
        .select(
            (F.col("doc_id") + F.lit(off)).alias("doc_id"),
            F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    batches = [
        fresh.filter(
            (F.col("doc_id") - off) % N_BATCHES == i
        ).localCheckpoint(eager=True)
        for i in range(N_BATCHES)
    ]
    splits_seed = ref.select(
        F.col("doc_id").alias("ref_id"),
        F.when(hash_bucket(F.col("doc_id")) < 90, F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )

    out: dict = {"metric": "fence_mode_per_batch_sec", "sf_dir": sf_dir,
                 "ref_docs": ref.count(), "batch_rows": BATCH_ROWS,
                 "ref_multiplier": out_mult}
    # warm-up: one throwaway text-mode epoch in a scratch dir so the timed
    # passes measure steady-state execution, not JIT/codegen compilation
    warm = tempfile.mkdtemp(prefix="fence_warm_")
    wsp = os.path.join(warm, "splits")
    splits_seed.write.parquet(wsp)
    incremental_split_batch(
        batches[0], 0, ref, ref_splits_path=wsp,
        admitted_path=os.path.join(warm, "admitted"),
        out_path=os.path.join(warm, "verdicts"),
    )
    shutil.rmtree(warm, ignore_errors=True)
    for mode in ("text", "sig"):
        base = tempfile.mkdtemp(prefix=f"fence_{mode}_")
        splits_path = os.path.join(base, "splits")
        splits_seed.write.parquet(splits_path)
        kw = dict(
            ref_splits_path=splits_path,
            admitted_path=os.path.join(base, "admitted"),
            out_path=os.path.join(base, "verdicts"),
        )
        if mode == "sig":
            t0 = time.perf_counter()
            sig_static = minhash_doc_signatures(ref, "doc_id", "text", 3, 16)
            sig_static.count()  # materialize: the one-time admission cost
            out["sig_static_build_sec"] = round(time.perf_counter() - t0, 3)
            kw["ref_signatures"] = sig_static
            kw["admitted_signatures_path"] = os.path.join(base, "admitted_sigs")
        epochs = []
        for i, b in enumerate(batches):
            t0 = time.perf_counter()
            incremental_split_batch(b, i, ref, **kw)
            epochs.append(round(time.perf_counter() - t0, 3))
        out[f"{mode}_epochs"] = epochs
        if mode == "sig":
            kw["ref_signatures"].unpersist()
        shutil.rmtree(base, ignore_errors=True)
    out["per_batch_speedup"] = round(
        sum(out["text_epochs"]) / sum(out["sig_epochs"]), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
