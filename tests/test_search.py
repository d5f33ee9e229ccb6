"""Boolean retrieval over the inverted index (operators/search.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_and_semantics_and_index_only_query(spark, tmp_path):
    from database2ogr_spark.operators.search import (
        build_inverted_index,
        search_all_terms,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark window agg"),
            (2, "spark only here"),
            (3, "window without the other term"),
            (4, "spark window twice spark window"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_inverted_index(docs, idx)
    hits = {r.doc_id for r in search_all_terms(spark, idx, ["spark", "window"]).collect()}
    assert hits == {1, 4}
    # single term
    assert {r.doc_id for r in search_all_terms(spark, idx, ["spark"]).collect()} == {1, 2, 4}
    # unknown term -> empty (AND with nothing matching)
    assert search_all_terms(spark, idx, ["spark", "nosuchtoken"]).count() == 0


def test_postings_are_sorted_and_df_consistent(spark, tmp_path):
    from database2ogr_spark.operators.search import build_inverted_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "idx2")
    build_inverted_index(docs, idx)
    rows = spark.read.parquet(idx).collect()
    assert rows
    for r in rows:
        assert list(r.postings) == sorted(set(r.postings))  # sorted, distinct
        assert r.df == len(r.postings)


def test_phrase_search_consecutive_and_overlapping(spark, tmp_path):
    from database2ogr_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),        # 'a b a' at 0 and 2 (overlapping)
            (2, "b a b"),            # no 'a b a'
            (3, "a x b a"),          # terms present but never consecutive
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "pidx")
    build_positional_index(docs, idx)
    rows = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(spark, idx, ["a", "b", "a"]).collect()
    }
    assert rows == {1: (2, 0)}
    # two-term phrase
    rows2 = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(spark, idx, ["b", "a"]).collect()
    }
    assert rows2 == {1: (2, 1), 2: (1, 0), 3: (1, 2)}
    # single-term phrase degenerates to tf counting
    rows1 = {
        r.doc_id: r.n_matches
        for r in phrase_search(spark, idx, ["a"]).collect()
    }
    assert rows1 == {1: 3, 2: 1, 3: 2}
    # unknown term -> empty
    assert phrase_search(spark, idx, ["a", "nosuch"]).count() == 0


def test_positional_index_positions_sorted(spark, tmp_path):
    from database2ogr_spark.operators.search import build_positional_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "pidx2")
    build_positional_index(docs, idx)
    rows = spark.read.parquet(idx).limit(200).collect()
    assert rows
    for r in rows:
        assert list(r.positions) == sorted(r.positions)
        assert r.tf == len(r.positions)


def test_bm25_hand_computed(spark, tmp_path):
    import math

    from database2ogr_spark.operators.search import (
        bm25_topk,
        build_positional_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark spark window"),   # both terms, spark tf=2
            (2, "spark noise noise noise noise"),  # one term, long doc
            (3, "window"),               # one term, shortest doc
            (4, "noise only here"),      # no query terms
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bmidx")
    build_positional_index(docs, idx)
    out = {
        r.doc_id: r.score
        for r in bm25_topk(spark, idx, ["spark", "window"], k=10).collect()
    }
    assert set(out) == {1, 2, 3}

    # replay the formula in python
    dls = {1: 3, 2: 5, 3: 1, 4: 3}
    n, avgdl, k1, b = 4, 3.0, 1.2, 0.75

    def idf(df):
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def part(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = idf(2) * part(2, dls[1]) + idf(2) * part(1, dls[1])
    exp2 = idf(2) * part(1, dls[2])
    exp3 = idf(2) * part(1, dls[3])
    assert abs(out[1] - round(exp1, 6)) < 1e-6
    assert abs(out[2] - round(exp2, 6)) < 1e-6
    assert abs(out[3] - round(exp3, 6)) < 1e-6
    # both-terms doc outranks single-term docs; short doc beats long doc
    assert out[1] > out[3] > out[2]
    # k cut is respected and deterministic
    top1 = bm25_topk(spark, idx, ["spark", "window"], k=1).collect()
    assert [r.doc_id for r in top1] == [1]


def test_rrf_fuse_hand_computed(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse([a, b], k_rrf=60).collect()}
    # doc1: 1/61 + 1/62; doc3: 1/63 + 1/61; doc2: 1/62; doc4: 1/63
    assert abs(out[1].rrf_score - round(1 / 61 + 1 / 62, 6)) < 1e-9
    assert abs(out[3].rrf_score - round(1 / 63 + 1 / 61, 6)) < 1e-9
    assert out[1].n_lists == 2 and out[2].n_lists == 1
    # doc1 beats doc3 (1/62 > 1/63 on the second contribution)
    assert out[1].fused_rank == 1 and out[3].fused_rank == 2
    assert {out[2].fused_rank, out[4].fused_rank} == {3, 4}
    top2 = rrf_fuse([a, b], top_n=2).collect()
    assert len(top2) == 2
    with _pytest.raises(ValueError):
        rrf_fuse([])
    with _pytest.raises(ValueError):
        rrf_fuse([a], k_rrf=0)


def test_ql_topk_ranks_matching_docs_first(spark, tmp_path):
    import pytest as _p

    from database2ogr_spark.operators.search import build_positional_index, ql_topk

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle spark shuffle"),   # both terms, repeated
            (2, "spark window function"),          # one term
            (3, "pandas numpy matplotlib"),        # neither
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "idx")
    build_positional_index(docs, out)
    res = ql_topk(spark, out, ["spark", "shuffle"], k=3).collect()
    order = [r.doc_id for r in res]
    assert order[0] == 1 and order[1] == 2 and order[2] == 3
    # scores are log-probs: negative and strictly ordered
    assert res[0].score < 0 and res[0].score > res[1].score > res[2].score
    with _p.raises(ValueError):
        ql_topk(spark, out, ["spark"], mu=0)


def test_prf_topk_expands_recall(spark, tmp_path):
    import pytest as _p

    from database2ogr_spark.operators.search import build_positional_index, prf_topk

    # doc 1 matches the query and pairs 'spark' with 'shuffle'; doc 2
    # contains only 'shuffle' — invisible to the original query, found
    # after expansion through doc 1's vocabulary
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle spark shuffle tuning"),
            (2, "shuffle tuning guide"),
            (3, "gardening tips"),
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "idx")
    build_positional_index(docs, out)
    res = {r.doc_id for r in prf_topk(spark, out, ["spark"], k=3, fb_docs=1, fb_terms=3).collect()}
    assert 1 in res and 2 in res       # doc 2 reached via expansion
    assert 3 not in res
    with _p.raises(ValueError):
        prf_topk(spark, out, ["spark"], fb_docs=0)
