"""Crawl-dump ingest: JSONL -> documents rows with corrupt-record
accounting.

A 100 TB corpus arrives as JSON-lines crawl dumps, not parquet; the
ingest step must (a) enforce the documents schema up front — NEVER
let Spark infer it, which costs an extra full pass over the data and
can silently widen types between dumps — and (b) account for every
malformed line instead of dropping it silently (the no-silent-caps
rule applied to ingest). Spark's PERMISSIVE mode gives exactly this:
bad lines land with all schema fields null and the raw line preserved
in the corrupt-record column, one scan, fully parallel per file
split. (The reference ingests via a directory scan of image files,
OCR/src/main.py:37-58; a corpus engine's equivalent is the crawl
dump.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_line"

# the documents table contract (sources/tables.py tables are parquet
# with exactly this shape)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """One-scan PERMISSIVE read of a JSONL dump against the explicit
    documents schema. Returns every input line as a row: parsed ones
    with their fields set, malformed ones with the raw line in
    `_corrupt_line` and all fields null.

    NOTE: Spark refuses any query over this frame whose referenced
    columns prune down to only the corrupt-record column (and a bare
    count() prunes to exactly that) — use `ingest_documents_jsonl`,
    which materializes the parse, for anything touching the ledger.
    """
    schema = T.StructType(
        DOCUMENTS_SCHEMA.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def ingest_documents_jsonl(
    spark: SparkSession, src_path: str, bronze_path: str
) -> DataFrame:
    """The production ingest: parse the dump ONCE against the explicit
    schema and persist the parsed result — the bronze table — then
    answer everything (clean frame, reject ledger, counts) from that
    materialization. This is both the lakehouse shape a 100 TB ingest
    wants (the raw dump is scanned exactly once, downstream stages
    read columnar parquet with pushdown) and the documented answer to
    Spark's corrupt-record-only-query restriction. Returns the bronze
    frame."""
    raw = read_documents_jsonl(spark, src_path)
    raw.write.mode("overwrite").parquet(bronze_path)
    return spark.read.parquet(bronze_path)


def valid_rows(ingested: DataFrame) -> DataFrame:
    """The clean documents frame: parsed rows, contract columns only."""
    return ingested.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in DOCUMENTS_SCHEMA.fields]
    )


def corrupt_rows(ingested: DataFrame) -> DataFrame:
    """The reject ledger: raw malformed lines, for quarantine/replay."""
    return ingested.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
