"""End-to-end golden invariant (SURVEY.md §5 step 2, BASELINE.json):
for every doc_id the pipeline's span sequence (kind, text, media_ref,
order) exactly equals the independent single-process oracle's."""

from __future__ import annotations

from cadastral_map_ocr_system_spark import oracle, synth
from cadastral_map_ocr_system_spark.plans.pipeline import extract
from cadastral_map_ocr_system_spark.schema import DOCS

N_DOCS = 200
SEED = 42


def _spark_result(spark, docs):
    df = spark.createDataFrame(docs, schema=DOCS)
    out = extract(df).collect()
    return {
        row["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["order"]) for s in row["spans"]
        ]
        for row in out
    }


def test_span_sequence_equality(spark):
    docs = synth.synth_docs_pylist(N_DOCS, seed=SEED)
    golden = oracle.extract_corpus(docs)
    got = _spark_result(spark, docs)
    assert set(got) == set(golden)  # every doc present, even if empty
    mismatches = {d: (got[d], golden[d]) for d in golden if got[d] != golden[d]}
    assert not mismatches, f"{len(mismatches)} docs diverge; first: " + str(
        next(iter(mismatches.items()))
    )


def test_every_doc_survives_at_scale(spark):
    """N=2000: no document vanishes, including docs whose spans are all
    media with every region rejected (those ride through span_batches as
    null-kind sentinels — regression test for the round-1 dropout where
    seed-42 doc-000000000805 was absent from extract() output)."""
    docs = synth.synth_docs_pylist(2000, seed=42)
    golden = oracle.extract_corpus(docs)
    got = _spark_result(spark, docs)
    missing = set(golden) - set(got)
    assert not missing, f"{len(missing)} docs vanished: {sorted(missing)[:5]}"
    empty_docs = [d for d, seq in golden.items() if not seq]
    assert empty_docs, "fixture must include at least one fully-empty doc"
    for d in empty_docs:
        assert got[d] == []


def test_determinism(spark):
    """Two runs produce identical output (SURVEY.md §5 step 4)."""
    docs = synth.synth_docs_pylist(50, seed=7)
    assert _spark_result(spark, docs) == _spark_result(spark, docs)


def test_order_is_dense(spark):
    docs = synth.synth_docs_pylist(60, seed=13)
    for seq in _spark_result(spark, docs).values():
        assert [t[3] for t in seq] == list(range(len(seq)))
