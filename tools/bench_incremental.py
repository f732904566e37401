"""Incremental-dedup cost probe at the 10x corpus: fold a 10% ingest
batch into a prebuilt index and compare against a full recompute over
the combined corpus — the number that justifies the index's existence.

Also verifies exactness on the spot: the incremental cluster map must
equal the full-recompute map row for row.

Usage: python tools/bench_incremental.py [/tmp/sf1]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from cadastral_map_ocr_system_spark.operators.components import dedup_clusters
    from cadastral_map_ocr_system_spark.operators.dedup_index import (
        build_dedup_index,
        incremental_dedup,
    )
    from cadastral_map_ocr_system_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(app_name="bench_incremental", master=f"local[{cpus}]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cut = docs.approxQuantile("doc_id", [0.9], 0.0)[0]
    old = docs.filter(F.col("doc_id") <= cut)
    new = docs.filter(F.col("doc_id") > cut)
    n_old, n_new = old.count(), new.count()

    idx = tempfile.mkdtemp(prefix="dedup_idx_")
    t0 = time.perf_counter()
    build_dedup_index(old, idx)
    build_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    updated = incremental_dedup(spark, idx, new, old)
    incremental_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    full = dedup_clusters(docs)
    full.write.format("noop").mode("overwrite").save()
    full_sec = time.perf_counter() - t0

    mismatches = (
        updated.withColumnRenamed("cluster", "c_inc")
        .join(full.withColumnRenamed("cluster", "c_full"), "doc_id", "full")
        .filter(
            F.col("c_inc").isNull()
            | F.col("c_full").isNull()
            | (F.col("c_inc") != F.col("c_full"))
        )
        .count()
    )

    print(
        json.dumps(
            {
                "metric": "incremental_vs_full_dedup",
                "sf_dir": sf_dir,
                "n_indexed": n_old,
                "n_batch": n_new,
                "build_index_sec": round(build_sec, 3),
                "incremental_batch_sec": round(incremental_sec, 3),
                "full_recompute_sec": round(full_sec, 3),
                "speedup_vs_full": round(full_sec / incremental_sec, 2),
                "cluster_mismatches": mismatches,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
