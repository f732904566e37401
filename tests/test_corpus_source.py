"""Spark 4 Python DataSource corpus scan (sources/corpus_source.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cadastral_map_ocr_system_spark import synth
from cadastral_map_ocr_system_spark.sources.corpus_source import (
    MediaCorpusDataSource,
)


def _load(spark, n_docs, seed, partitions):
    spark.dataSource.register(MediaCorpusDataSource)
    return (
        spark.read.format("mediacorpus")
        .option("n_docs", n_docs)
        .option("seed", seed)
        .option("partitions", partitions)
        .load()
    )


def test_source_matches_driver_generator(spark):
    docs = _load(spark, 120, 42, 8)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in docs.collect()
    }
    want = {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in d["spans"]
        ]
        for d in synth.synth_docs_pylist(120, seed=42)
    }
    assert got == want


def test_source_is_actually_partitioned(spark):
    docs = _load(spark, 100, 7, 10)
    n_parts = (
        docs.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert n_parts == 10
    # slices cover the range exactly once
    assert docs.select("doc_id").distinct().count() == 100


def test_extract_runs_over_the_source(spark):
    """The source plugs into the golden path: extract() over the
    DataSource equals the oracle for the same corpus."""
    from cadastral_map_ocr_system_spark import oracle
    from cadastral_map_ocr_system_spark.plans.pipeline import extract

    docs = _load(spark, 30, 11, 4)
    golden = oracle.extract_corpus(synth.synth_docs_pylist(30, seed=11))
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in r["spans"]
        ]
        for r in extract(docs).collect()
    }
    assert got == golden
