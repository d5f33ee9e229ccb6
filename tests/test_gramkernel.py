"""Tier-equivalence tests: the Arrow gram kernel
(functions/gramkernel.py) must be bit-identical to the Column-expression
machinery (functions/hashing.py) it accelerates — same md5 halves, same
rolling chains, same fallback semantics — on adversarial inputs: empty
text, single word, exactly k words, k-1 words, repeated tokens.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import database2ogr_spark.operators.dedup as DD
from database2ogr_spark.operators.repetition import repetition_stats

TEXTS = [
    (0, ""),
    (1, "one"),
    (2, "two words"),
    (3, "exactly three words"),
    (4, "a a a a a a"),
    (5, "the quick brown fox jumps over the lazy dog"),
    (6, "Tabs\tand\nnewlines   collapse  into one space"),
    (7, "repeat repeat repeat repeat repeat"),
    (8, "MiXeD CaSe TOKENS lower identically"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_signatures_tier_equivalence(docs):
    a = _rows(DD.minhash_signatures(docs, use_arrow=True))
    b = _rows(DD.minhash_signatures(docs, use_arrow=False))
    assert a == b


def test_simhash_signatures_tier_equivalence(docs):
    a = _rows(DD.simhash_signatures(docs, use_arrow=True))
    b = _rows(DD.simhash_signatures(docs, use_arrow=False))
    assert a == b


def test_repetition_stats_tier_equivalence(docs):
    a = _rows(repetition_stats(docs, use_arrow=True))
    b = _rows(repetition_stats(docs, use_arrow=False))
    assert a == b


def test_ngram_jaccard_tier_equivalence(docs):
    a = _rows(DD.ngram_jaccard_pairs(docs, threshold=0.0, use_arrow=True))
    b = _rows(DD.ngram_jaccard_pairs(docs, threshold=0.0, use_arrow=False))
    assert a == b


def test_decontaminate_tier_equivalence(docs):
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    a = _rows(DD.decontaminate(corpus, bench, k=3, use_arrow=True).select("doc_id"))
    b = _rows(DD.decontaminate(corpus, bench, k=3, use_arrow=False).select("doc_id"))
    assert a == b


def test_distinct_gram_table_fallback_semantics(spark, docs):
    # every doc yields >= 1 gram: short docs fall back to a whole-doc gram,
    # the empty doc to gram 0 — mirroring shingle_structs_of exactly
    from database2ogr_spark.functions.gramkernel import distinct_gram_table

    out = distinct_gram_table(docs, "doc_id", "text", 3)
    per_doc = {r.id: r["count"] for r in out.groupBy("id").count().collect()}
    assert per_doc[0] == 1  # empty text -> single fallback gram
    assert out.filter((F.col("id") == 0) & (F.col("gram") == 0)).count() == 1
    assert per_doc[1] == 1  # one word -> whole-doc fallback
    assert per_doc[3] == 1  # exactly k words -> one real gram
    assert per_doc[4] == 1  # identical trigrams dedup to one


def test_tier_equivalence_property(spark):
    # random unicode corpora: the Arrow kernel and the expression tier must
    # agree byte-for-byte on signatures and gram tables (tokenization uses
    # the explicit ASCII whitespace class on both sides, so unicode spaces
    # and case oddities must flow through identically)
    from hypothesis import given, settings, strategies as st

    texts_strategy = st.lists(
        st.text(max_size=60), min_size=1, max_size=6
    )

    @settings(max_examples=10, deadline=None, derandomize=True)
    @given(texts=texts_strategy)
    def check(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = _rows(DD.minhash_signatures(df, use_arrow=True))
        b = _rows(DD.minhash_signatures(df, use_arrow=False))
        assert a == b
        c = _rows(DD.simhash_signatures(df, use_arrow=True))
        d = _rows(DD.simhash_signatures(df, use_arrow=False))
        assert c == d

    check()
