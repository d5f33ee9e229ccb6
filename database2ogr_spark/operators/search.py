"""Boolean text retrieval: a materialized inverted index and AND-semantics
term search over it — the search half of a corpus platform (the analysis
half is tfidf/textstats).

Index-as-a-dataset, same philosophy as the persistent IVF index: build
once (one explode + one groupBy), store ``(token, df, postings
array<bigint>)`` parquet, and serve every query from the index without
touching the corpus. Postings are sorted doc-id arrays — deterministic
files, and intersection-friendly.

Query plan: filter the index to the query's terms (an IN over the
token — at 100 TB the index is written bucketed/sorted by token so this
prunes at file level), explode the few matching posting lists, and keep
doc ids appearing in ALL term lists (count == #terms — classic
merge-by-count AND). Cost scales with the QUERY terms' posting sizes,
never the corpus. OR-semantics is the same plan with count >= 1; ranked
retrieval composes with tfidf's weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Write the inverted index parquet: (token, df, postings). Tokens are
    the whitespace split shared with the rest of the text stack."""
    postings = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), "\\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc")).alias("postings"),
        )
    )
    postings.write.mode("overwrite").parquet(out_dir)
    return out_dir


def search_all_terms(
    spark: SparkSession, index_dir: str, terms: list[str]
) -> DataFrame:
    """Docs containing ALL ``terms`` (AND semantics): returns (doc_id)."""
    idx = spark.read.parquet(index_dir).filter(F.col("token").isin(terms))
    n = len(set(terms))
    return (
        idx.select(F.explode("postings").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == n)
        .select("doc_id")
    )
