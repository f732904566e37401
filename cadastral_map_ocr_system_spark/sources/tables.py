"""Parquet/Iceberg table access.

The engine's canonical catalog format is Iceberg (north_rule); this
sandbox has no Iceberg runtime jar, so the same call sites read/write
parquet directories with dynamic partition overwrite — which preserves
the property the design needs (idempotent partition-grain rewrite).
Swapping in Iceberg is a format string change, not a plan change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Idempotent partition-grain write (resume-safe, SURVEY.md §4.5).

    With spark.sql.sources.partitionOverwriteMode=dynamic (session.py),
    re-writing a partition replaces exactly that partition — a re-run
    of a half-written partition cannot duplicate rows.
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
