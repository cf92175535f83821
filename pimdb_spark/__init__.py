"""pimdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of roskakori/pimdb (see SURVEY.md), re-expressed
Spark-first: DataFrame/Spark SQL plans, Parquet storage, broadcast/shuffle
joins, window functions and posexplode instead of row-at-a-time ETL loops.

Layout:
  session    - tuned SparkSession factory (AQE, shuffle partitions, UTC)
  schemas    - IMDb dataset + normalized StructTypes, key maps, name utils
  sources/   - TSV/Parquet/JDBC readers and writers, HTTP download
  plans/     - the normalized-build DAG and the SQL query surface
  operators/ - relational + LLM-data-pipeline operators (dedup, similarity,
               text analysis, multimodal, explode/renumber helpers)
  functions/ - column-expression helpers (hashing, surrogate ids)
  streaming/ - Structured Streaming variants of the event pipeline
"""

__version__ = "0.1.0"
