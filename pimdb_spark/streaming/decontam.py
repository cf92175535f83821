"""Streaming eval-set decontamination — the continuous form of
operators/corpus.ngram_decontaminate, via the foreachBatch + static-side
pattern: the eval set is a STATIC table (it changes on benchmark
releases, not per event), each arriving micro-batch of training
documents runs the exact batch operator against it, and verdicts append
to the sink.

Why foreachBatch instead of a stateful operator: decontamination is
PER-DOCUMENT — a verdict depends only on the document's own n-grams and
the static eval set, never on other stream rows — so there is no state
to carry and the batch plan IS the streaming plan.  This is the general
recipe for every stateless operator in this repo (text quality, langid,
token counts, fingerprints, redaction): stream them through foreachBatch
unchanged, and batch parity is structural rather than re-proven
(each document lands in exactly one micro-batch; the tests assert the
drained union equals the batch output anyway).

Scale: per micro-batch the eval side reduces to distinct n-gram md5s
and BROADCASTS (no corpus-side shuffle — the batch operator's own plan);
re-deriving the eval-gram frame per batch is a metadata-cheap re-plan,
and on a real cluster one would localCheckpoint it once since the
static side does not change between batches."""

from __future__ import annotations

from pyspark.sql import DataFrame

from pimdb_spark.operators.corpus import ngram_decontaminate


def decontaminate_stream(
    doc_stream: DataFrame,
    eval_docs: DataFrame,
    out_path: str,
    checkpoint: str,
    n: int = 8,
    threshold: int = 1,
):
    """doc_stream (doc_id, text, ...) x static eval_docs -> append-mode
    parquet sink of (doc_id, n_shared_ngrams, keep) verdicts; returns the
    started StreamingQuery (AvailableNow trigger — call repeatedly to
    drain arrivals, the house file-ingest pattern).

    Sink contract: AT-LEAST-ONCE, stated not hidden.  foreachBatch gives
    exactly-once only if the handler is idempotent per epoch; a plain
    parquet append is not — if the process dies between the append and
    the checkpoint commit, the restarted query re-runs the epoch and the
    batch's verdicts land TWICE.  That is safe here by construction:
    verdicts are deterministic per doc_id (a replay writes identical
    rows), so any reader that keeps one row per doc_id — the natural
    access pattern for a keep/drop verdict table — sees exactly-once
    results.  Readers that aggregate raw rows must dedup on doc_id
    first.  The upgrade path when the sink itself must be exactly-once:
    write each epoch to an epoch-keyed subdirectory with mode
    "overwrite" (replays overwrite themselves — idempotent), or use a
    transactional table format that records the (queryId, epoch) pair."""

    def handle(batch_df: DataFrame, _epoch: int) -> None:
        out = ngram_decontaminate(batch_df, eval_docs, n=n, threshold=threshold)
        out.write.mode("append").parquet(out_path)

    return (
        doc_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
