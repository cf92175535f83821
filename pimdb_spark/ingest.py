"""`transfer`: TSV datasets → typed, deduplicated dataset tables
(SURVEY §3.1).  The reference's row-at-a-time loop (read → type-coerce →
dedup → 1024-row INSERT batches, database.py:524-566) becomes one Spark
job per dataset: csv scan → conjunctive filter → typed projection →
keep-first window dedup → parquet write."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from pimdb_spark.plans.store import ParquetDatabase
from pimdb_spark.schemas import IMDB_DATASET_NAMES, camelized_dot_name
from pimdb_spark.sources.tsv import read_dataset


def dataset_file(source_dir: str, dataset: str) -> str:
    """Prefer .tsv.gz (the distributed form), fall back to .tsv."""
    gz = os.path.join(source_dir, f"{dataset}.tsv.gz")
    return gz if os.path.exists(gz) else os.path.join(source_dir, f"{dataset}.tsv")


def transfer(
    spark: SparkSession,
    source_dir: str,
    db: ParquetDatabase,
    datasets: list[str] | None = None,
    filtered_name_to_values_map: dict[str, list[str]] | None = None,
) -> None:
    for dataset in datasets or IMDB_DATASET_NAMES:
        df = read_dataset(
            spark, dataset_file(source_dir, dataset), dataset, filtered_name_to_values_map
        )
        db.write(df, camelized_dot_name(dataset))
