"""Bench the splittable-ingest path: ONE large .tsv.gz transferred
(a) directly — the whole parse/type/dedup/encode pipeline serializes into
the single gzip task — vs (b) through sources.tsv.split_gz_tsv — the
serial part shrinks to the streaming gunzip, everything downstream fans
out across SPARK_GRAFT_CPUS.

This is the 100 TB transfer story for the reference's single
title.principals.tsv.gz (the biggest IMDb dump file): recorded in
SCALE.md's "splittable ingest" section.  Run twice with different
SPARK_GRAFT_CPUS to see the split path scale with cores while the direct
path stays flat.

Usage: python scripts/bench_split.py [n_rows]   (default 2_000_000)
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pimdb_spark.session import get_spark  # noqa: E402
from pimdb_spark.sources.tsv import read_dataset, split_gz_tsv  # noqa: E402


def synth_principals_gz(path: str, n_rows: int) -> None:
    """One big title.principals-shaped gz: ~55 B/row, 10% duplicate keys
    so the keep-first dedup window does real work."""
    with gzip.open(path, "wt", compresslevel=1) as f:
        f.write("tconst\tordering\tnconst\tcategory\tjob\tcharacters\n")
        for i in range(n_rows):
            t, o = i // 10, i % 10
            f.write(
                f"tt{t:07d}\t{o}\tnm{i % 97_003:07d}\tactor\t\\N\t"
                f'["Character {i % 13}"]\n'
            )
        for i in range(0, n_rows, 10):  # late duplicates that must lose
            t, o = i // 10, i % 10
            f.write(f"tt{t:07d}\t{o}\tnm9999999\tactor\t\\N\t\\N\n")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("pimdb-spark-bench-split")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_split_")
    try:
        gz = os.path.join(work, "title.principals.tsv.gz")
        t0 = time.perf_counter()
        synth_principals_gz(gz, n_rows)
        gen_s = time.perf_counter() - t0
        gz_mb = os.path.getsize(gz) / (1 << 20)

        def run(tag: str, **kw) -> float:
            out = os.path.join(work, f"out_{tag}")
            t0 = time.perf_counter()
            read_dataset(spark, gz, "title.principals", **kw).write.mode(
                "overwrite"
            ).parquet(out)
            return time.perf_counter() - t0

        direct_s = run("direct")

        t0 = time.perf_counter()
        shards = split_gz_tsv(
            gz, os.path.join(work, "shards"), target_shard_bytes=32 << 20
        )
        split_io_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        read_dataset(
            spark, os.path.join(work, "shards"), "title.principals"
        ).write.mode("overwrite").parquet(os.path.join(work, "out_split"))
        split_spark_s = time.perf_counter() - t0

        n_direct = spark.read.parquet(os.path.join(work, "out_direct")).count()
        n_split = spark.read.parquet(os.path.join(work, "out_split")).count()
        print(
            json.dumps(
                {
                    "metric": "split_ingest",
                    "cpus": int(cpus),
                    "n_rows": n_rows,
                    "gz_mb": round(gz_mb, 1),
                    "gen_sec": round(gen_s, 2),
                    "direct_sec": round(direct_s, 2),
                    "split_gunzip_sec": round(split_io_s, 2),
                    "split_spark_sec": round(split_spark_s, 2),
                    "split_total_sec": round(split_io_s + split_spark_s, 2),
                    "n_shards": len(shards),
                    "rows_match": n_direct == n_split,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
