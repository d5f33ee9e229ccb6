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


def build_positional_index(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Write the POSITIONAL inverted index parquet: one row per
    (token, doc, positions array<int>, tf) — the long-form layout that
    stays bucketable/sortable by token (file-level pruning on the query's
    terms at 100 TB, same deployment shape as the boolean index).
    Positions are 0-based over the empty-filtered whitespace split, sorted
    ascending — deterministic files."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "")
        ).alias("pos", "token"),
    )
    postings = (
        toks.groupBy("token", "doc")
        .agg(
            F.sort_array(F.collect_list("pos")).alias("positions"),
            F.count(F.lit(1)).alias("tf"),
        )
        .sort("token", "doc")
    )
    postings.write.mode("overwrite").parquet(out_dir)
    return out_dir


def phrase_search(
    spark: SparkSession, index_dir: str, phrase: list[str]
) -> DataFrame:
    """Docs containing ``phrase`` as CONSECUTIVE tokens, via the classic
    positional-intersection plan: each phrase term at offset j must appear
    at position p+j — subtract the offset and count distinct offsets per
    (doc, start). Handles repeated tokens in the phrase (each offset
    contributes independently).

    Returns (doc_id, n_matches, first_pos). Cost scales with the QUERY
    terms' posting sizes (index filtered by an IN over token — file-pruned
    when the index is token-sorted), never the corpus; the one shuffle is
    the (doc, start) count, bounded by the smallest term's postings."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    offsets = spark.createDataFrame(
        [(t, i) for i, t in enumerate(phrase)], ["token", "off"]
    )
    idx = spark.read.parquet(index_dir).filter(
        F.col("token").isin(list(set(phrase)))
    )
    starts = (
        idx.join(F.broadcast(offsets), "token")
        .select("doc", "off", F.explode("positions").alias("pos"))
        .select("doc", "off", (F.col("pos") - F.col("off")).alias("start"))
        .groupBy("doc", "start")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == len(phrase))
    )
    return (
        starts.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("start").cast("int").alias("first_pos"),
        )
        .select(F.col("doc").alias("doc_id"), "n_matches", "first_pos")
    )
