"""Collocation extraction — pointwise mutual information over adjacent
token pairs (the classic Church & Hanks 1990 association measure).

The corpus-analytics companion to tfidf/build_vocab: PMI surfaces
multi-word units ("new york", "machine learning") whose co-occurrence
beats chance, feeding tokenizer merge candidates, stop-phrase lists, and
boilerplate detection in a training-data pipeline.

Scale shape: one explode+agg for unigram counts, one adjacent-pair
explode+agg for bigram counts (both map-side combinable, shuffling at most
vocabulary/bigram-vocabulary rows), two equi-joins of unigram counts onto
the bigram table keyed on the token (shuffle keys are tokens —
high-cardinality, well distributed), totals broadcast as a 1-row cross
join, and a distributed TakeOrdered for the top-N.  Nothing scales with
document size except the two linear explodes.

Determinism: counts are exact integers; PMI is a fixed left-to-right
expression over correctly-rounded IEEE divisions, rounded to 6 — the same
cross-engine contract as the rest of the repo — with (token_a, token_b)
tie-breaks, so the DuckDB oracle replays the exact top-N set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database2ogr_spark.functions.hashing import words


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Top-``top_n`` adjacent-token bigrams by PMI with bigram count ≥
    ``min_count`` (the standard guard — PMI of hapax pairs is pure noise).

    PMI = ln( p(a,b) / (p(a)·p(b)) ) with p() estimated from corpus
    counts: (c_ab/M) / ((c_a/N)·(c_b/N)) for N total tokens, M total
    bigrams.  Output: (token_a, token_b, n_pair, pmi) — pmi rounded 6.
    """
    ws = words(F.col(text_col))
    n1 = F.greatest(F.size(ws) - 1, F.lit(0))
    toks = df.select(F.explode(ws).alias("w"))
    pairs = df.select(
        F.explode(
            F.zip_with(
                F.slice(ws, 1, n1),
                F.slice(ws, 2, n1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("token_a"), F.col("p.b").alias("token_b"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    big = pairs.groupBy("token_a", "token_b").agg(
        F.count(F.lit(1)).alias("n_pair")
    )
    # r11 (guide §2.3/§2.4): the totals used to re-run the token AND
    # bigram explode+count over the corpus (two extra wide passes); both
    # are exact per-document integer identities — n_tok = Σ size(ws),
    # n_big = Σ max(size-1, 0) — so ONE narrow agg pass (no explode, no
    # shuffle beyond the 1-row partial agg) replaces them
    n_sz = F.size(ws)
    totals = df.agg(
        F.sum(n_sz).alias("n_tok"),
        F.sum(F.greatest(n_sz - 1, F.lit(0))).alias("n_big"),
    )
    d = "double"
    joined = (
        big.filter(F.col("n_pair") >= min_count)
        .join(
            uni.select(F.col("w").alias("token_a"), F.col("c").alias("c_a")),
            "token_a",
        )
        .join(
            uni.select(F.col("w").alias("token_b"), F.col("c").alias("c_b")),
            "token_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast(d) / F.col("n_big").cast(d))
            / (
                (F.col("c_a").cast(d) / F.col("n_tok").cast(d))
                * (F.col("c_b").cast(d) / F.col("n_tok").cast(d))
            )
        ),
        6,
    )
    return (
        joined.select("token_a", "token_b", "n_pair", pmi.alias("pmi"))
        .orderBy(
            F.col("pmi").desc(), F.col("token_a").asc(), F.col("token_b").asc()
        )
        .limit(top_n)
    )


def windowed_pmi(
    df: DataFrame,
    text_col: str = "text",
    *,
    window: int = 4,
    min_count: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Skip-gram collocations: PMI over ORDERED token pairs co-occurring
    within ``window`` positions (offset 1..window) — the word2vec-style
    context statistic; :func:`pmi_bigrams` is the ``window=1`` special
    case with its own denominator.

    Pair expansion happens IN CODEGEN: for each offset d, zip the token
    array with itself shifted by d (slice+zip_with), flattened across
    offsets — linear in tokens × window, never the per-document
    quadratic a positions self-join would pay on long documents. Counts
    then follow the pmi_bigrams shape (two token-keyed joins, 1-row
    totals broadcast, distributed TakeOrdered).

    Output: (token_a, token_b, n_pair, pmi) — PMI under the pair
    distribution ln((c_ab/M) / ((c_a/N)(c_b/N))), rounded 6 dp,
    (pmi DESC, token_a, token_b) top-``top_n``.
    """
    ws = words(F.col(text_col))
    offs = F.sequence(F.lit(1), F.lit(window))
    pairs = df.select(
        F.explode(
            F.flatten(
                F.transform(
                    offs,
                    lambda d: F.zip_with(
                        F.slice(
                            ws, 1, F.greatest(F.size(ws) - d, F.lit(0))
                        ),
                        F.slice(
                            ws,
                            d + 1,
                            F.greatest(F.size(ws) - d, F.lit(0)),
                        ),
                        lambda a, b: F.struct(
                            a.alias("a"), b.alias("b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.a").alias("token_a"), F.col("p.b").alias("token_b"))
    toks = df.select(F.explode(ws).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    big = pairs.groupBy("token_a", "token_b").agg(
        F.count(F.lit(1)).alias("n_pair")
    )
    # r11 (guide §2.3/§2.4): the totals used to re-run the token AND the
    # windowed-pair explode+count over the corpus (two extra wide
    # passes); both are exact per-document integer identities —
    # n_tok = Σ size(ws), n_big = Σ_d∈1..w max(size-d, 0), the number of
    # elements each shifted zip emits — so ONE narrow agg pass replaces
    # them (no explode, nothing shuffled beyond the 1-row partial agg)
    n_sz = F.size(ws)
    totals = df.agg(
        F.sum(n_sz).alias("n_tok"),
        F.sum(
            F.aggregate(
                offs,
                F.lit(0).cast("bigint"),
                lambda acc, d: acc + F.greatest(n_sz - d, F.lit(0)),
            )
        ).alias("n_big"),
    )
    d_ = "double"
    joined = (
        big.filter(F.col("n_pair") >= min_count)
        .join(
            uni.select(F.col("w").alias("token_a"), F.col("c").alias("c_a")),
            "token_a",
        )
        .join(
            uni.select(F.col("w").alias("token_b"), F.col("c").alias("c_b")),
            "token_b",
        )
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast(d_) / F.col("n_big").cast(d_))
            / (
                (F.col("c_a").cast(d_) / F.col("n_tok").cast(d_))
                * (F.col("c_b").cast(d_) / F.col("n_tok").cast(d_))
            )
        ),
        6,
    )
    return (
        joined.select("token_a", "token_b", "n_pair", pmi.alias("pmi"))
        .orderBy(
            F.col("pmi").desc(), F.col("token_a").asc(), F.col("token_b").asc()
        )
        .limit(top_n)
    )


def term_dispersion(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    min_count: int = 10,
    top_n: int = 100,
) -> DataFrame:
    """Corpus dispersion per term — Gries' DP ("deviation of
    proportions", public Gries 2008): how evenly a term spreads over the
    corpus parts (sources / shards / time slices). DP ≈ 0 = the term
    follows the part sizes (function words); DP → 1 = the term is
    CLUMPED into few parts (topical / boilerplate / single-source
    artifacts — the terms a frequency list overrates).

        DP(t) = ½ Σ_parts |v_i − s_i|,  v_i = term share in part i,
                                         s_i = part's token share

    Absent parts contribute |0 − s_i| = s_i, so the sum needs NO part
    spine per term: over PRESENT parts only,
    ``DP = ½ (Σ|v_i − s_i| + 1 − Σ s_i)`` — the algebraic fold that
    keeps the computation on the (term, part) count table. Output: the
    ``top_n`` most clumped terms with corpus count ≥ ``min_count`` as
    ``(term, count, dp)``, (dp desc, term) deterministic.

    Scale: one token explode → (part, term) partial-agg'd counts; part
    sizes and term totals derive from it; per-term fold is one agg on
    the term key; the cut is a distributed TakeOrdered.
    """
    from database2ogr_spark.functions.hashing import words

    toks = df.select(
        F.col(group_col).alias("g"), F.explode(words(text_col)).alias("w")
    )
    pc = toks.groupBy("g", "w").agg(F.count(F.lit(1)).alias("c"))
    sizes = pc.groupBy("g").agg(F.sum("c").alias("gn"))
    tot = sizes.agg(F.sum("gn").alias("nn"))
    tc = pc.groupBy("w").agg(F.sum("c").alias("tc")).filter(
        F.col("tc") >= min_count
    )
    joined = (
        pc.join(tc, "w")
        .join(sizes, "g")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "tc",
            (F.col("c") / F.col("tc").cast("double")).alias("v"),
            (F.col("gn") / F.col("nn").cast("double")).alias("s"),
        )
    )
    return (
        joined.groupBy("w", "tc")
        .agg(
            F.round(
                F.lit(0.5)
                * (
                    F.sum(F.abs(F.col("v") - F.col("s")))
                    + F.lit(1.0)
                    - F.sum("s")
                ),
                6,
            ).alias("dp")
        )
        .select(F.col("w").alias("term"), F.col("tc").alias("count"), "dp")
        .orderBy(F.col("dp").desc(), F.col("term").asc())
        .limit(top_n)
    )


def entropy_rate(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group bigram conditional entropy H(w₂|w₁) — the sequence-level
    predictability audit (an entropy RATE estimate under a first-order
    model): templated/boilerplate-heavy groups sit low (the next word is
    nearly determined), incoherent token soup sits near the unigram
    entropy H(w₂). Both are reported, plus their gap (the information the
    previous word carries — near zero for shuffled text).

        H(w₂|w₁) = −Σ_{w1,w2} p(w₁,w₂) ln p(w₂|w₁)

    Output: (group_col, n_bigrams, h_cond, h_uni, info_gain) rounded
    6 dp; groups with no bigrams are absent.

    Scale: one bigram zip_with explode → (group, w₁, w₂) partial-agg'd
    counts; the left-marginal and the entropies all derive from that
    table, aggregated per group — the mutual_information shape with a
    group dimension.
    """
    from database2ogr_spark.functions.hashing import words

    ws = words(text_col)
    m = F.greatest(F.size(ws) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, 1, m), F.slice(ws, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bp = df.select(
        F.col(group_col).alias("g"), F.explode(bigrams).alias("b")
    ).select("g", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c = bp.groupBy("g", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    left = c.groupBy("g", "w1").agg(F.sum("n").alias("n1"))
    right = c.groupBy("g", "w2").agg(F.sum("n").alias("n2"))
    tot = c.groupBy("g").agg(F.sum("n").alias("nn"))
    h_cond = (
        c.join(left, ["g", "w1"])
        .join(tot, "g")
        .groupBy("g")
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            (
                -F.sum(
                    (F.col("n") / F.col("nn"))
                    * F.log(F.col("n") / F.col("n1"))
                )
            ).alias("hc"),
        )
    )
    h_uni = (
        right.join(tot, "g")
        .groupBy("g")
        .agg(
            (
                -F.sum(
                    (F.col("n2") / F.col("nn"))
                    * F.log(F.col("n2") / F.col("nn"))
                )
            ).alias("hu")
        )
    )
    return (
        h_cond.join(h_uni, "g")
        .select(
            F.col("g").alias(group_col),
            "n_bigrams",
            F.round(F.col("hc"), 6).alias("h_cond"),
            F.round(F.col("hu"), 6).alias("h_uni"),
            F.round(F.col("hu") - F.col("hc"), 6).alias("info_gain"),
        )
    )


def detect_phrases(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    threshold: float = 0.1,
    delta: int = 5,
) -> DataFrame:
    """word2phrase bigram scoring (public Mikolov et al. 2013, the
    word2vec phrase-detection preprocessor):

        score(w₁,w₂) = (c₁₂ − δ) · N / (c₁ · c₂)

    — bigrams that co-occur far above chance become single tokens before
    embedding training ("new_york"). Returns the learned phrase table
    ``(w1, w2, n12, score)`` with ``c₁₂ ≥ min_count`` and
    ``score > threshold``, rounded 6 dp; apply it with
    :func:`apply_phrases`.

    Scale: the bigram and unigram counts are the usual partial-agg'd
    shuffles; the score join is keyed on the words. The phrase table is
    vocabulary-bounded.
    """
    from database2ogr_spark.functions.hashing import words

    ws = words(text_col)
    m = F.greatest(F.size(ws) - 1, F.lit(0))
    bp = df.select(
        F.explode(
            F.zip_with(
                F.slice(ws, 1, m), F.slice(ws, 2, m),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bp.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12")).filter(
        F.col("n12") >= min_count
    )
    uni = df.select(F.explode(ws).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = uni.agg(F.sum("c").alias("N"))
    return (
        c12.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n12",
            F.round(
                (F.col("n12") - F.lit(delta)).cast("double")
                * F.col("N")
                / (F.col("c1") * F.col("c2")).cast("double"),
                6,
            ).alias("score"),
        )
        .filter(F.col("score") > threshold)
    )


def apply_phrases(
    df: DataFrame,
    phrases: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    joiner: str = "_",
) -> DataFrame:
    """Rewrite token streams merging detected phrases LEFTMOST-GREEDY,
    non-overlapping (the classic word2phrase application order): at each
    maximal run of consecutive merge candidates, every other candidate
    starting from the run's first merges — pure gaps-and-islands
    arithmetic, no sequential scan. ``a a a`` with phrase (a,a) becomes
    ``a_a a``, exactly as the reference tool does.

    Output: (id_col, text, n_merges) with the rewritten space-joined
    token stream.

    Scale: one posexplode + a lead() window on the id partition to form
    bigram candidates, one keyed join against the (vocabulary-bounded)
    phrase table, the islands window, and one ordered reassembly agg —
    all shuffles on the id key except the phrase join.
    """
    from database2ogr_spark.functions.hashing import words

    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(words(text_col)).alias("pos", "w")
    )
    wseq = Window.partitionBy("id").orderBy("pos")
    with_next = toks.withColumn("w_next", F.lead("w").over(wseq))
    cand = with_next.join(
        F.broadcast(phrases.select(
            F.col("w1"), F.col("w2"), F.lit(True).alias("__m")
        )),
        (F.col("w") == F.col("w1")) & (F.col("w_next") == F.col("w2")),
        "left",
    ).select(
        "id", "pos", "w", "w_next", F.coalesce(F.col("__m"), F.lit(False)).alias("c")
    )
    # islands of consecutive candidates: within each, merge at every
    # other position starting from the island head (leftmost-greedy)
    wc = Window.partitionBy("id").orderBy("pos")
    runs = cand.withColumn(
        "rn", F.row_number().over(wc)
    ).withColumn(
        "grp",
        F.when(F.col("c"), F.col("pos") - F.sum(F.when(F.col("c"), 1).otherwise(0)).over(
            wc.rowsBetween(Window.unboundedPreceding, 0)
        )),
    )
    wg = Window.partitionBy("id", "grp").orderBy("pos")
    marked = runs.withColumn(
        "merge_here",
        F.col("c") & ((F.row_number().over(wg) % 2) == 1),
    )
    # a position is CONSUMED if the previous position merged
    consumed = marked.withColumn(
        "prev_merged", F.coalesce(F.lag("merge_here").over(wc), F.lit(False))
    )
    out_tokens = consumed.filter(~F.col("prev_merged")).select(
        "id",
        "pos",
        F.when(
            F.col("merge_here"),
            F.concat(F.col("w"), F.lit(joiner), F.col("w_next")),
        ).otherwise(F.col("w")).alias("tok"),
        F.col("merge_here").cast("int").alias("nm"),
    )
    return (
        out_tokens.groupBy("id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
            ).alias("text"),
            F.sum("nm").cast("bigint").alias("n_merges"),
        )
        .select(F.col("id").alias(id_col), "text", "n_merges")
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    *,
    window: int = 2,
    iters: int = 3,
    top_n: int = 50,
) -> DataFrame:
    """TextRank keyword extraction (public Mihalcea & Tarau 2004):
    PageRank over the token co-occurrence graph — a token matters when it
    co-occurs with tokens that matter, which surfaces corpus keywords
    plain frequency ranking misses (and demotes boilerplate tokens whose
    neighbors are all the same).

    The graph: one DISTINCT undirected edge per token pair co-occurring
    within ``window`` positions, built with the same in-codegen
    slice+zip_with expansion as :func:`windowed_pmi` (linear in tokens ×
    window — never a positions self-join), canonicalized (least, greatest)
    BEFORE the distinct so the dedup shuffle carries each undirected edge
    once, then symmetrized with one explode — a union of two selects over
    the pair stream would plan (and execute) the corpus expansion twice.
    Centrality: :func:`graph.pagerank_integer` — scaled-
    integer arithmetic, so ranks are deterministic across engines,
    partitionings, and retries, and the top-``top_n`` cut is stable.

    Output: (token, rank_c9), (rank DESC, token ASC) top-``top_n``.

    Scale: pair expansion is corpus-linear; the distinct-edge reduction
    and the per-iteration join+agg shuffle on token keys are the standard
    PageRank cost (|E| per round), with the degree-annotated edge table
    persisted once by pagerank_integer. Windows never exceed ``window``
    so edge fanout per token position is bounded.
    """
    from database2ogr_spark.operators.graph import pagerank_integer

    if window < 1:
        raise ValueError("window must be >= 1")
    ws = words(F.col(text_col))
    offs = F.sequence(F.lit(1), F.lit(window))
    pairs = df.select(
        F.explode(
            F.flatten(
                F.transform(
                    offs,
                    lambda d: F.zip_with(
                        F.slice(ws, 1, F.greatest(F.size(ws) - d, F.lit(0))),
                        F.slice(
                            ws, d + 1, F.greatest(F.size(ws) - d, F.lit(0))
                        ),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    # r11 (guide §2.3/§2.4): canonicalize before the distinct — half the
    # dedup shuffle bytes — and symmetrize AFTER it with one explode over
    # the (far smaller) distinct-edge table; the old
    # pairs.union(pairs.select(b, a)) planned the corpus pair expansion
    # twice. Set-equal to the old edges: every undirected pair appears in
    # exactly both orientations either way.
    und = (
        pairs.filter(F.col("a") != F.col("b"))
        .select(
            F.least(F.col("a"), F.col("b")).alias("a"),
            F.greatest(F.col("a"), F.col("b")).alias("b"),
        )
        .distinct()
    )
    edges = und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    ranks = pagerank_integer(edges, iters=iters, src_col="a", dst_col="b")
    return (
        ranks.select(F.col("node").alias("token"), "rank_c9")
        .orderBy(F.col("rank_c9").desc(), F.col("token").asc())
        .limit(top_n)
    )
