"""JSONL source with quarantine (sources/jsonl.py): malformed lines and
id-less rows must land in quarantine, never as NULL-text ghost rows."""

from __future__ import annotations

import json

from database2ogr_spark.sources.jsonl import read_jsonl


def _write(tmp_path, lines):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_read_jsonl_splits_good_and_quarantine(spark, tmp_path):
    ok1 = json.dumps({"doc_id": 1, "text": "hello", "lang": "en", "source": "s", "n_chars": 5})
    ok2 = json.dumps({"doc_id": 2, "text": "world", "lang": "en", "source": "s", "n_chars": 5})
    broken = '{"doc_id": 3, "text": "unterminated'
    no_id = json.dumps({"text": "orphan", "lang": "en", "source": "s", "n_chars": 6})
    path = _write(tmp_path, [ok1, broken, ok2, no_id])

    good, quarantine = read_jsonl(spark, path)
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert "_corrupt_record" not in good.columns
    raws = [r.raw for r in quarantine.collect()]
    assert len(raws) == 2
    assert any("unterminated" in r for r in raws)


def test_read_jsonl_all_good_roundtrip(spark, tmp_path):
    rows = [
        json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "s", "n_chars": 5})
        for i in range(10)
    ]
    good, quarantine = read_jsonl(spark, _write(tmp_path, rows))
    assert good.count() == 10
    assert quarantine.count() == 0
