"""Pluggable corpus source via the Spark 4 Python DataSource API.

The driver's tables arrive as parquet (tables.load), but the
reference's corpus scan is a directory walk feeding the extractor
(OCR/src/batch.py batch loop). This is that source surface done the
idiomatic Spark way: a registered `mediacorpus` format whose reader
partitions the doc-id range and synthesizes each partition's documents
executor-side — the same shape a real deployment uses to list a blob
store and fetch objects per InputPartition, with Spark handling
parallelism, retries, and locality. No driver-side materialization:
the driver only plans [start, end) slices.

    spark.dataSource.register(MediaCorpusDataSource)
    docs = (spark.read.format("mediacorpus")
            .option("n_docs", 100_000).option("seed", 42).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

CORPUS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


class DocRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class MediaCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 42))
        self.skew_frac = float(options.get("skew_frac", 0.01))
        self.n_partitions = int(options.get("partitions", 32))

    def partitions(self):
        n = max(1, min(self.n_partitions, self.n_docs))
        step = -(-self.n_docs // n)
        return [
            DocRange(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: DocRange):
        # executor-side: generation is a pure function of (seed, i), so
        # a retried partition reproduces its slice exactly
        from ..synth import gen_doc

        for i in range(partition.start, partition.end):
            d = gen_doc(self.seed, i, self.skew_frac)
            yield (
                d["doc_id"],
                [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in d["spans"]
                ],
            )


class MediaCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mediacorpus"

    def schema(self) -> str:
        return CORPUS_SCHEMA

    def reader(self, schema) -> MediaCorpusReader:
        return MediaCorpusReader(self.options)
