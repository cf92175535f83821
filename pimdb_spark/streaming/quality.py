"""Streaming quality gate: CCNet perplexity filtering at ingest.

The batch operator (operators/lm.perplexity_buckets) is a per-language
EQUAL-FREQUENCY split — a global rank, undefined over an unbounded
stream.  The streaming form is the operator's own documented production
variant: per-group score THRESHOLDS are a scheduled batch product of the
curation cycle (operators/lm.perplexity_gate_thresholds — |groups| rows,
broadcast-sized), and each arriving document is scored against the
STATIC reference-LM model and gated by its group's bar.  This is the
decontam/cross_neardup recipe: stream vs static side, stateless per doc.

Why foreachBatch and not a stateful operator: a verdict depends only on
the document itself, the static reference model, and the static
threshold table — never on other stream rows — so the batch plan IS the
streaming plan and batch parity is structural (each doc lands in exactly
one micro-batch).  The gate applies operators/lm.perplexity_gate_apply
per micro-batch, the SAME function the batch path runs, so parity is a
shared code path, not a re-implementation.

Sink contract: AT-LEAST-ONCE, stated not hidden (the decontam twin's
taxonomy).  A replayed epoch re-writes IDENTICAL rows (scores and
verdicts are deterministic per doc), so keep-one-row-per-doc_id readers
see exactly-once results; aggregating readers must dedup on doc_id
first.  Exactly-once upgrade path: epoch-keyed overwrite subdirectories
or a transactional table format.

Scale: the model tables are proportional to the curated REFERENCE corpus
and broadcast; the threshold table is |groups| rows; each micro-batch's
only shuffle is its own per-doc score groupBy.  On a real cluster,
localCheckpoint the model tables once outside the handler — the static
side never changes between batches (the cross_neardup_stream note).
Threshold REFRESH is a curation-cycle event, not an in-stream update:
restart the query with the new table (the boilerplate-strip df-table
discipline, COVERAGE.md streaming matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def perplexity_gate_stream(
    doc_stream: DataFrame,
    ref_docs: DataFrame,
    thresholds: DataFrame,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
):
    """documents stream -> (id, group, n_bigrams, lm_score, keep) per-doc
    quality verdicts against the static reference LM + threshold table."""
    from pimdb_spark.operators.lm import perplexity_gate_apply

    def handle(batch_df: DataFrame, _epoch: int) -> None:
        out = perplexity_gate_apply(
            batch_df, ref_docs, thresholds, id_col, text_col, group_col
        )
        out.write.mode("append").parquet(out_path)

    return (
        doc_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
