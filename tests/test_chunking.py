"""Chunking UDTF semantics (operators/chunking.py)."""

from __future__ import annotations

from database2ogr_spark.operators.chunking import chunk_documents


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, **kw).collect()
    return sorted((r.doc_id, r.chunk_id, r.chunk, r.n_tokens) for r in out)


def test_window_and_stride(spark):
    got = _chunks(spark, [(1, "a b c d e f g")], size=4, stride=3)
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),
        (1, 2, "g", 1),  # final short window starts at token 6
    ]


def test_exact_multiple_no_phantom_tail(spark):
    # n == size: exactly one window, no empty trailing chunk
    got = _chunks(spark, [(1, "a b c")], size=3, stride=3)
    assert got == [(1, 0, "a b c", 3)]


def test_empty_and_whitespace_docs_yield_nothing(spark):
    got = _chunks(spark, [(1, ""), (2, "   "), (3, None), (4, "x")], size=2, stride=2)
    assert got == [(4, 0, "x", 1)]


def test_whitespace_normalization(spark):
    got = _chunks(spark, [(1, "  a\tb\n c  ")], size=2, stride=2)
    assert got == [(1, 0, "a b", 2), (1, 1, "c", 1)]
