"""Skew test (SURVEY.md §5 step 6): giant-span documents with
multi-region media still match the oracle, and the greedy dedup
semantics hold under the per-span spread."""

from __future__ import annotations

from cadastral_map_ocr_system_spark import oracle, synth
from cadastral_map_ocr_system_spark.plans.pipeline import extract
from cadastral_map_ocr_system_spark.schema import DOCS


def test_skewed_corpus_matches_oracle(spark):
    # 25% of docs get 48 spans and >=16-region "map" payloads
    docs_py = synth.synth_docs_pylist(40, seed=99, skew_frac=0.25, max_spans=48)
    n_skew = sum(1 for d in docs_py if len(d["spans"]) == 48)
    assert n_skew >= 3, "fixture should actually contain skewed docs"
    docs = spark.createDataFrame(docs_py, schema=DOCS)
    got = {
        row["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]
        ]
        for row in extract(docs).collect()
    }
    golden = oracle.extract_corpus(docs_py)
    assert got == golden


def test_grouped_dedup_operator_matches_oracle_semantics(spark):
    """The standalone grouped-map dedup (operators/dedup.py) applied on
    top of the in-batch dedup is a no-op — same survivors."""
    from pyspark.sql import functions as F

    from cadastral_map_ocr_system_spark.operators.dedup import dedup_detections
    from cadastral_map_ocr_system_spark.operators.mediapath import media_detections
    from cadastral_map_ocr_system_spark.plans.pipeline import explode_spans

    docs_py = synth.synth_docs_pylist(60, seed=5)
    docs = spark.createDataFrame(docs_py, schema=DOCS)
    media = explode_spans(docs).filter(F.col("kind") == "media")
    det = media_detections(media)
    key_cols = ["doc_id", "offset", "region_idx", "token_idx", "text"]
    before = sorted(tuple(r) for r in det.select(*key_cols).collect())
    after = sorted(
        tuple(r) for r in dedup_detections(det).select(*key_cols).collect()
    )
    assert before == after
