"""JSONL crawl-dump ingest: explicit-schema parse, corrupt-record
ledger, and bronze-materialization behavior."""

from __future__ import annotations

import pytest

from cadastral_map_ocr_system_spark.sources.ingest import (
    corrupt_rows,
    ingest_documents_jsonl,
    read_documents_jsonl,
    valid_rows,
)

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "crawl", "n_chars": 11}',
    '{"doc_id": 2, "text": "tab\\tnewline\\nquote\\" unicode \\u00e9", "lang": "de", "source": "crawl", "n_chars": 30}',
    '{"doc_id": 3, "text": null, "lang": "fr", "source": "crawl", "n_chars": 0}',
]
BAD = [
    "not json",
    '{"doc_id": "three", "text": "type error"}',
    '{"truncated": ',
]


def _dump(tmp_path, lines):
    p = tmp_path / "dump"
    p.mkdir()
    (p / "part0.jsonl").write_text("\n".join(lines) + "\n")
    return str(p)


def test_ingest_splits_valid_and_corrupt(spark, tmp_path):
    src = _dump(tmp_path, GOOD + BAD)
    bronze = ingest_documents_jsonl(spark, src, str(tmp_path / "bronze"))
    ok = {r["doc_id"]: r for r in valid_rows(bronze).collect()}
    assert set(ok) == {1, 2, 3}
    # escape round trip: the parsed text carries the real control chars
    assert ok[2]["text"] == 'tab\tnewline\nquote" unicode é'
    assert ok[3]["text"] is None and ok[3]["lang"] == "fr"
    bad = sorted(r["raw_line"] for r in corrupt_rows(bronze).collect())
    assert bad == sorted(BAD)


def test_type_error_lands_in_ledger_not_zeroed(spark, tmp_path):
    """A well-formed JSON line with an uncastable doc_id must be a
    ledger row, not a silently nulled parse."""
    src = _dump(tmp_path, [GOOD[0], '{"doc_id": "x9", "text": "t", "lang": "en", "source": "s", "n_chars": 1}'])
    bronze = ingest_documents_jsonl(spark, src, str(tmp_path / "bronze"))
    assert valid_rows(bronze).count() == 1
    assert corrupt_rows(bronze).count() == 1


def test_raw_read_refuses_corrupt_only_query(spark, tmp_path):
    """Pins the Spark restriction that motivates the bronze shape: a
    ledger-only query straight off the raw JSON scan raises, while the
    same query off the bronze materialization works."""
    from pyspark.errors.exceptions.captured import AnalysisException

    src = _dump(tmp_path, GOOD + BAD)
    raw = read_documents_jsonl(spark, src)
    with pytest.raises(AnalysisException):
        corrupt_rows(raw).count()
    bronze = ingest_documents_jsonl(spark, src, str(tmp_path / "bronze"))
    assert corrupt_rows(bronze).count() == len(BAD)
