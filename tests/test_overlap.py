"""Cross-source shingle overlap matrix (operators/overlap.py)."""

from __future__ import annotations


def test_source_overlap_hand_computed(spark):
    from database2ogr_spark.operators.overlap import source_overlap_matrix

    docs = spark.createDataFrame(
        [
            # A grams: {a b c, b c d}
            (1, "A", "a b c d"),
            # B grams: {a b c} (shared) + {x y z}
            (2, "B", "a b c"),
            (3, "B", "x y z"),
            # C: short doc -> one whole-text fallback shingle (kernel
            # contract), shared with nobody -> no pairs involving C
            (4, "C", "too short"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(docs, n=3).collect()
    }
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert (r.grams_a, r.grams_b, r.n_common) == (2, 2, 1)
    assert r.jaccard == round(1 / 3, 6)


def test_source_overlap_duplicate_grams_counted_once(spark):
    from database2ogr_spark.operators.overlap import source_overlap_matrix

    docs = spark.createDataFrame(
        [
            (1, "A", "p q r"),
            (2, "A", "p q r"),  # same gram again in A -> still one
            (3, "B", "p q r"),
        ],
        "doc_id long, source string, text string",
    )
    r = source_overlap_matrix(docs, n=3).collect()[0]
    assert (r.grams_a, r.grams_b, r.n_common, r.jaccard) == (1, 1, 1, 1.0)


def test_corpus_divergence_identity_and_disjoint(spark):
    import math

    import pytest as _pytest

    from database2ogr_spark.operators.overlap import corpus_divergence

    df = spark.createDataFrame(
        [
            ("a", "cat dog cat bird"),
            ("b", "cat dog cat bird"),      # identical distribution -> 0
            ("c", "qqq zzz qqq www xyz"),   # disjoint vocabulary
        ],
        "source string, text string",
    )
    out = {(r.group_a, r.group_b): r.jsd for r in corpus_divergence(df, n_buckets=64).collect()}
    assert out[("a", "b")] == 0.0
    # disjoint vocab: far from 0, below the ln2 bound (smoothing keeps it off it)
    assert 0.001 < out[("a", "c")] < math.log(2)
    assert out[("a", "c")] == out[("b", "c")]  # a and b are the same corpus
    with _pytest.raises(ValueError):
        corpus_divergence(df, n_buckets=1)


def test_burrows_delta_style_separation(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.overlap import burrows_delta

    # two groups sharing a style (same function-word mix), one divergent
    sty1 = "the of and to the of and to it is"
    sty2 = "wow amazing totally wow amazing totally yes yes no no"
    df = spark.createDataFrame(
        [("a", sty1 * 3), ("b", sty1 * 3 + " extra"), ("c", sty2 * 3)],
        "source string, text string",
    )
    out = {(r.group_a, r.group_b): r.delta
           for r in burrows_delta(df, top_n_words=8).collect()}
    assert out[("a", "b")] < out[("a", "c")]
    assert out[("a", "b")] < out[("b", "c")]
    with _pytest.raises(ValueError):
        burrows_delta(df, top_n_words=0)


def test_fightin_words_surfaces_distinctive_terms(spark):
    import pytest as _p

    from database2ogr_spark.operators.overlap import fightin_words

    # 'spam' dominates source A; 'ham' dominates B; 'the' is common
    rows = []
    i = 0
    for _ in range(20):
        rows.append((i, "A", "the spam spam offer")); i += 1
        rows.append((i, "B", "the ham ham recipe")); i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = fightin_words(df, top_n=2).collect()
    top = {(r.source, r.token) for r in out}
    assert ("A", "spam") in top and ("B", "ham") in top
    # 'the' is never the most distinctive for either side
    assert ("A", "the") not in top and ("B", "the") not in top
    za = {r.token: r.zscore for r in out if r.source == "A"}
    assert za["spam"] > 0
    with _p.raises(ValueError):
        fightin_words(df, top_n=0)
