"""Resume test (SURVEY.md §5 step 5): kill after k commits, re-run,
final output identical and committed partitions not recomputed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cadastral_map_ocr_system_spark import oracle, synth
from cadastral_map_ocr_system_spark.schema import DOCS
from cadastral_map_ocr_system_spark.sources.checkpoint import (
    SimulatedFailure,
    read_extracted,
    run_extraction,
)

N_DOCS = 120


def _collect(df):
    return {
        row["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]
        ]
        for row in df.collect()
    }


def test_resume_idempotent(spark, tmp_path):
    docs_py = synth.synth_docs_pylist(N_DOCS, seed=21)
    docs = spark.createDataFrame(docs_py, schema=DOCS)
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "checkpoint")

    with pytest.raises(SimulatedFailure):
        run_extraction(
            spark, docs, out, ckpt, run_id="r1",
            n_buckets=8, buckets_per_commit=3, fail_after_commits=1,
        )

    ck = spark.read.parquet(ckpt)
    committed_before = {r["partition_id"] for r in ck.select("partition_id").collect()}
    assert len(committed_before) == 3  # exactly one commit group landed

    # resume: finishes the remaining buckets
    run_extraction(
        spark, docs, out, ckpt, run_id="r1", n_buckets=8, buckets_per_commit=3
    )

    ck2 = spark.read.parquet(ckpt)
    per_part = (
        ck2.groupBy("partition_id").count().collect()
    )
    assert {r["partition_id"] for r in per_part} == set(range(8))
    # committed partitions were NOT recomputed: still exactly one lineage row
    assert all(r["count"] == 1 for r in per_part)

    got = _collect(read_extracted(spark, out))
    golden = oracle.extract_corpus(docs_py)
    assert got == golden

    # lineage metrics add up
    totals = ck2.agg(
        F.sum("n_docs").alias("d"), F.sum("n_output_rows").alias("o"),
        F.sum("n_tiles").alias("t"),
    ).first()
    assert totals["d"] == N_DOCS
    assert totals["o"] == N_DOCS  # one output row per doc
    # E3 tiling lineage: skew docs (media://big payloads) were tiled
    assert totals["t"] > 0


def test_rerun_after_success_is_noop(spark, tmp_path):
    docs_py = synth.synth_docs_pylist(40, seed=3)
    docs = spark.createDataFrame(docs_py, schema=DOCS)
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "checkpoint")
    run_extraction(spark, docs, out, ckpt, run_id="r1", n_buckets=4)
    before = _collect(read_extracted(spark, out))
    run_extraction(spark, docs, out, ckpt, run_id="r1", n_buckets=4)
    ck = spark.read.parquet(ckpt)
    assert ck.count() == 4  # nothing re-attempted
    assert _collect(read_extracted(spark, out)) == before


def test_tile_metrics_dedup_on_retries(tmp_path):
    """Retry-exact lineage (VERDICT r3 #8): per-attempt metric files are
    MAX-deduped per (stage, partition), so a retried/speculative task
    attempt can never double-count its tiles."""
    import json

    from cadastral_map_ocr_system_spark.operators.mediapath import (
        read_tile_metrics,
    )

    d = str(tmp_path / "tiles")
    import os

    os.makedirs(d)
    rows = [
        {"stage_id": 5, "partition_id": 0, "attempt": 0, "n_tiles": 7, "n_tiles_skipped": 1},
        {"stage_id": 5, "partition_id": 1, "attempt": 0, "n_tiles": 3, "n_tiles_skipped": 0},
        # partition 1 retried: same work, higher attempt — must replace,
        # not add
        {"stage_id": 5, "partition_id": 1, "attempt": 1, "n_tiles": 3, "n_tiles_skipped": 0},
    ]
    for r in rows:
        name = f"s{r['stage_id']}_p{r['partition_id']}_a{r['attempt']}.json"
        json.dump(r, open(os.path.join(d, name), "w"))
    got = read_tile_metrics(d)
    assert got == {"n_tiles": 10, "n_tiles_skipped": 1, "max_attempt": 1}
    assert read_tile_metrics(str(tmp_path / "missing")) == {
        "n_tiles": 0, "n_tiles_skipped": 0, "max_attempt": 0,
    }
