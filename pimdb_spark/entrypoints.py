"""Import-all module: importing this registers every catalog module's
queries into pimdb_spark.catalog._REGISTRY.  __spark_entry__.py and
bench.py import from here so the registry is always complete.

Imports are deliberately HARD: a transitive import error in any catalog
module must fail loudly here rather than silently shrinking the
registry, the bench list, and the rotation window (r9 verdict watch
item 1).  All modules exist unconditionally; there is no optional
dependency to guard.
"""

from __future__ import annotations

import pimdb_spark.catalog  # noqa: F401  (core relational operators)
import pimdb_spark.catalog_explode  # noqa: F401  (explode/flatten family)
import pimdb_spark.catalog_text  # noqa: F401  (text analysis + dedup)
import pimdb_spark.catalog_similarity  # noqa: F401  (embeddings / ANN)
import pimdb_spark.catalog_temporal  # noqa: F401  (event-time / sessionize)
import pimdb_spark.catalog_multimodal  # noqa: F401  (binary payload columns)
import pimdb_spark.catalog_asof  # noqa: F401  (as-of / range joins)
import pimdb_spark.catalog_sql_surface  # noqa: F401  (rollup/cube/subqueries)
import pimdb_spark.catalog_curation  # noqa: F401  (splits/quota/packing/clusters)
import pimdb_spark.catalog_delta  # noqa: F401  (snapshot diff / upsert merge)
import pimdb_spark.catalog_corpus  # noqa: F401  (df/idf, n-grams, decontamination)
import pimdb_spark.catalog_tpch_full  # noqa: F401  (TPC-H Q2/Q11/Q12/Q20)
import pimdb_spark.catalog_pipeline  # noqa: F401  (paragraph dedup, chunking, skew/histogram profiling)
import pimdb_spark.catalog_analytics  # noqa: F401  (cohorts/attribution/paths/graph)

from pimdb_spark.catalog import bench_queries, oracle_sql, queries  # noqa: E402,F401
