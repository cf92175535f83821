"""JSONL (newline-delimited JSON) source/sink — the de-facto interchange
format of LLM training-data pipelines (one document object per line),
complementing the reference-parity gzipped-TSV source (sources/tsv.py;
the reference ingests TSV only, common.py:183-265).

Scale notes: Spark's json reader splits plain .jsonl files by line ranges
(fully parallel scan); .jsonl.gz is one task per file — shard compressed
inputs, same rule as TSV.  An explicit schema is REQUIRED here: schema
inference reads the whole input once before the real scan, which is a
full extra pass at 100 TB.  Malformed lines land in a corrupt-record
column instead of failing the job (PERMISSIVE), so one bad shard cannot
kill a pipeline; count them and alert instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField(CORRUPT_COL, StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Permissive line-JSON scan with corrupt-record capture.  The schema
    must include a string CORRUPT_COL field; malformed lines parse to a
    row whose only non-null column is that one."""
    return spark.read.json(
        path,
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
    )


def read_documents_jsonl(
    spark: SparkSession, path: str, dedup_key: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Ingest a documents corpus from JSONL: returns (clean, corrupt).

    clean = parsed rows with a derived n_chars column (documents-table
    shape), keep-FIRST deduplicated on ``dedup_key`` in input order —
    the same contract as the TSV transfer path (S3).  corrupt = the raw
    offending lines, for quarantine/alerting."""
    from pimdb_spark.sources.tsv import dedup_keep_first

    raw = read_jsonl(spark, path, DOCUMENTS_JSONL_SCHEMA)
    clean = (
        raw.filter(F.col(CORRUPT_COL).isNull())
        .drop(CORRUPT_COL)
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    # Spark refuses plans whose ONLY referenced column from a raw JSON scan
    # is the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    # the quarantine side re-scans as text and re-parses with from_json —
    # an independent second scan, which is what a real pipeline wants
    # anyway (quarantine is its own job, not a fork of the ingest plan).
    parsed = F.from_json(
        F.col("value"),
        DOCUMENTS_JSONL_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    corrupt = (
        spark.read.text(path)
        .select("value", parsed.alias("_p"))
        .filter(F.col(f"_p.{CORRUPT_COL}").isNotNull() | F.col("_p").isNull())
        .select(F.col("value").alias(CORRUPT_COL))
    )
    return dedup_keep_first(clean, [dedup_key]), corrupt


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSONL sink (overwrite).  single_file coalesces to one output file —
    for exports consumed by line-oriented tools; leave False at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
