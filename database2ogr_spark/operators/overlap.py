"""Cross-source corpus overlap: exact pairwise shingle Jaccard between
the corpus's source partitions — the "how much do my crawl snapshots /
data vendors overlap" audit that decides whether two sources should be
deduplicated against each other at all (a near-zero matrix means the
expensive cross-source near-dup pass can be skipped; a high cell means
one source is largely a re-crawl of the other).

Scale design: the corpus is touched once to produce the distinct
(source, shingle) table; everything after operates on shingles, never
text. Per-shingle source-sets are collected with ``collect_set`` —
bounded by the NUMBER OF SOURCES (single digits), not corpus size — and
pair expansion happens inside codegen on that tiny array, so there is no
shingle-table self-join (which would shuffle the gram table twice and
explode on hot shingles). Output is #source-pairs rows. The sketch path
for 1000s of sources is MinHash-union (operators/dedup.py signatures);
this operator is the exact audit for the common few-sources case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_overlap_matrix(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact pairwise word-``n``-gram Jaccard between sources.

    Returns one row per unordered source pair (a < b lexically):
    ``(source_a, source_b, grams_a, grams_b, n_common, jaccard)`` with
    jaccard rounded to 6 dp. Documents shorter than ``n`` tokens
    contribute no shingles.
    """
    toks = F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "")
    # sequence(1, size-(n-1)) DESCENDS when size < n — gate on length so
    # short documents contribute an empty gram list, not a bad slice
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sg = (
        docs.select(F.col(source_col).alias("source"), grams.alias("gs"))
        .filter(F.size("gs") > 0)
        .select("source", F.explode("gs").alias("gram"))
        .distinct()
    )
    per_source = sg.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    # per-gram source set (bounded by #sources) -> in-codegen pair fanout
    sets = sg.groupBy("gram").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    pairs = (
        sets.filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ss"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("ss"), i + 2, F.size("ss")
                            ),
                            lambda y: F.struct(
                                x.alias("a"), y.alias("b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = per_source.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("grams_a")
    )
    cb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("grams_b")
    )
    return (
        pairs.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a",
            "source_b",
            "grams_a",
            "grams_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("grams_a") + F.col("grams_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
