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
