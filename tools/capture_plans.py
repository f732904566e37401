"""Capture .explain("formatted") output for registry queries.

Usage: python tools/capture_plans.py <repo_root> <out_dir> <suffix> <sf_dir> <query ...>

Writes <out_dir>/<query>_<suffix>.txt for each query. Run once from
the round-start tree (suffix=before) and once from the optimized tree
(suffix=after); the judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir, suffix, sf_dir, *names = sys.argv[1:]
    sys.path.insert(0, repo)
    from cadastral_map_ocr_system_spark.plans.queries import REGISTRY
    from cadastral_map_ocr_system_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans_{suffix}", master="local[8]")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
