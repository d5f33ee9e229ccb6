"""Sampling / packing / redaction operator semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from database2ogr_spark.functions.text import redact
from database2ogr_spark.operators.sampling import deterministic_sample, pack_sequences


def test_deterministic_sample_stable_under_repartition(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in deterministic_sample(df, pct=10).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(df.repartition(7), pct=10).collect()
    }
    assert a == b  # layout-independent
    assert 40 <= len(a) <= 200  # ~10% of 1000, hash-uniform
    # monotone: a 20% sample contains the 10% sample
    c = {r.doc_id for r in deterministic_sample(df, pct=20).collect()}
    assert a <= c


def test_pack_sequences_boundaries(spark):
    rows = [(i, "en", 60) for i in range(1, 6)]  # cumsum 60..300, budget 100
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {r.doc_id: r.bin_id for r in pack_sequences(df, budget=100).collect()}
    # prev-cumsums: 0, 60, 120, 180, 240 → bins 0, 0, 1, 1, 2
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_pack_sequences_groups_independent(spark):
    rows = [(1, "en", 90), (2, "en", 90), (1, "fr", 90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {(r.lang, r.doc_id): r.bin_id for r in pack_sequences(df, budget=100).collect()}
    assert out[("en", 1)] == 0 and out[("en", 2)] == 0  # prev-cumsum 90 < 100
    assert out[("fr", 1)] == 0  # fr restarts its own bins


def test_redact(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@example.co.uk or call 4165551234 ext 12")],
        "id long, text string",
    )
    out = df.select(redact("text").alias("t")).first().t
    assert out == "mail me at [EMAIL] or call [NUM] ext 12"


def test_tfidf_top_terms(spark):
    from database2ogr_spark.operators.tfidf import tfidf_top_terms

    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "banana banana durian"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, top_n=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'banana' appears in every doc → idf 0; rarer terms win
    assert top == {1: "apple", 2: "cherry", 3: "durian"}


def test_stratified_sample_nested_and_deterministic(spark):
    from database2ogr_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    lo = stratified_sample(docs, {"en": 20}, default_pct=5)
    hi = stratified_sample(docs, {"en": 50}, default_pct=10)
    lo_ids = {r.doc_id for r in lo.select("doc_id").collect()}
    hi_ids = {r.doc_id for r in hi.select("doc_id").collect()}
    assert lo_ids <= hi_ids  # raising rates strictly grows the sample
    # per-stratum rates land near target (hash uniformity)
    n_en = docs.filter("lang = 'en'").count()
    k_en = hi.filter("lang = 'en'").count()
    assert abs(k_en / n_en - 0.5) < 0.15
    # determinism: same call → same rows
    again = {r.doc_id for r in stratified_sample(docs, {"en": 50}, default_pct=10).select("doc_id").collect()}
    assert again == hi_ids


def test_split_corpus_disjoint_exhaustive_append_stable(spark):
    from database2ogr_spark.operators.sampling import split_corpus

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = split_corpus(df, {"train": 90, "val": 5, "test": 5})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 1000  # exhaustive — no NULL split
    assert set(counts) == {"train", "val", "test"}
    assert 850 <= counts["train"] <= 950
    # append stability: growing the corpus never reassigns old rows
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    bigger = split_corpus(
        spark.range(2000).withColumnRenamed("id", "doc_id"),
        {"train": 90, "val": 5, "test": 5},
    )
    second = {r["doc_id"]: r["split"] for r in bigger.collect()}
    assert all(second[k] == v for k, v in first.items())
    import pytest

    with pytest.raises(ValueError):
        split_corpus(df, {"train": 90, "val": 5})


def test_top_fraction_per_group_quality_calibration(spark):
    import pytest
    from database2ogr_spark.operators.sampling import top_fraction_per_group

    rows = [(i, "big", float(i)) for i in range(100)] + [
        (200, "tiny", 1.0),
        (201, "tiny", 2.0),
        (202, "tiny", 3.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = top_fraction_per_group(
        df, fraction=0.25, score_col="score", group_col="source"
    )
    by = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert by == {"big": 25, "tiny": 1}  # ceil guard: tiny group keeps 1
    # the kept rows are the TOP scores
    assert {r.doc_id for r in out.filter("source = 'big'").collect()} == set(
        range(75, 100)
    )
    assert {r.doc_id for r in out.filter("source = 'tiny'").collect()} == {202}
    with pytest.raises(ValueError):
        top_fraction_per_group(df, fraction=0.0, score_col="score")


def test_temperature_resample_flattens_and_upsamples(spark):
    from database2ogr_spark.operators.sampling import temperature_resample

    # 10:1 skew; alpha=0.5 targets sqrt-flattened shares, so the rare
    # source must be upsampled (epochs > 0) and the common one trimmed
    rows = [(i, "big", "x") for i in range(200)] + [
        (1000 + i, "rare", "x") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_resample(df, alpha=0.5)
    by = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # targets: z = sqrt(200)+sqrt(20); rare -> sqrt(20)/z*220 ~ 53, big ~ 167
    assert 40 <= by["rare"] <= 66 and 150 <= by["big"] <= 185
    assert out.filter("source = 'rare' and epoch >= 1").count() > 0
    assert out.filter("source = 'big' and epoch >= 1").count() == 0
    # total preserved in expectation
    assert abs(sum(by.values()) - 220) <= 25


def test_temperature_resample_alpha_one_is_identity_rates(spark):
    from database2ogr_spark.operators.sampling import temperature_resample

    rows = [(i, f"s{i % 3}", "x") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_resample(df, alpha=1.0)
    # alpha=1 -> every rate is exactly 1.0 -> the corpus unchanged, epoch 0
    assert sorted(r.doc_id for r in out.collect()) == list(range(90))
    assert out.filter("epoch != 0").count() == 0


def test_temperature_resample_deterministic(spark):
    from database2ogr_spark.operators.sampling import temperature_resample

    rows = [(i, "a" if i < 150 else "b", "x") for i in range(180)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = sorted((r.doc_id, r.epoch) for r in temperature_resample(df).collect())
    b = sorted(
        (r.doc_id, r.epoch)
        for r in temperature_resample(df.repartition(7)).collect()
    )
    assert a == b


def test_build_vocab_rank_and_cutoffs(spark):
    from database2ogr_spark.operators.tfidf import build_vocab

    rows = [
        (1, "apple apple apple banana banana cherry"),
        (2, "apple banana zebra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    v = {r.token: (r.token_id, r["count"]) for r in build_vocab(df, min_count=2).collect()}
    # apple(4) -> id 0, banana(3) -> id 1; cherry/zebra cut by min_count
    assert v == {"apple": (0, 4), "banana": (1, 3)}
    top1 = build_vocab(df, min_count=1, max_size=1).collect()
    assert len(top1) == 1 and top1[0].token == "apple"


def test_temperature_resample_copy_bounds_property(spark):
    # TRUE invariant for any corpus: every row emits floor(r_s) or
    # floor(r_s)+1 copies, so each source's output count lies in
    # [n_s*floor(r_s), n_s*ceil(r_s)] with r_s the rounded power rate
    import math

    from hypothesis import given, settings, strategies as st

    from database2ogr_spark.operators.sampling import temperature_resample

    @settings(max_examples=6, deadline=None, derandomize=True)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=2, max_size=4),
        alpha=st.sampled_from([0.3, 0.5, 0.7]),
    )
    def check(sizes, alpha):
        rows = [
            (s * 1000 + i, f"s{s}", "x")
            for s, n in enumerate(sizes)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = temperature_resample(df, alpha=alpha)
        by = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
        N = sum(sizes)
        z = sum(n**alpha for n in sizes)
        for s, n in enumerate(sizes):
            r = round(n**alpha / z * N / n, 6)
            lo, hi = n * math.floor(r), n * math.ceil(r)
            assert lo <= by.get(f"s{s}", 0) <= hi, (s, n, r, by)

    check()


def test_score_buckets_equal_frequency_and_order(spark):
    from database2ogr_spark.operators.sampling import score_buckets

    rows = [(i, "a", float(100 - i)) for i in range(20)] + [
        (100 + i, "b", float(i)) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = score_buckets(df, n_buckets=4, score_col="score")
    a = {r.doc_id: r.bucket for r in out.filter("source = 'a'").collect()}
    # group a: 20 rows into 4 tiers of 5; best scores (lowest ids) -> bucket 1
    assert [a[i] for i in range(20)] == [1 + i // 5 for i in range(20)]
    b = {r.doc_id: r.bucket for r in out.filter("source = 'b'").collect()}
    # group b: 7 rows -> sizes 2,2,2,1; best score is doc 106
    assert b[106] == 1 and b[100] == 4
    assert sorted(b.values()) == [1, 1, 2, 2, 3, 3, 4]


def test_grouped_split_never_splits_a_near_dup_group(spark):
    """Leakage-safe split: every near-dup group lands wholly in one split —
    and the plain id-keyed split demonstrably LEAKS on the same corpus
    (at least one group straddles train/val), which is the reason this
    operator exists."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    out = entrymod.queries()["split_corpus_grouped"](
        spark, "/root/testdata/sf0.001"
    )
    per_group = out.groupBy("group_id").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0
    multi = per_group.filter(F.col("n_docs") > 1).count()
    assert multi > 0  # corpus actually HAS near-dup groups to protect

    # the plain id-keyed split leaks on the same corpus: some group gets
    # both train and val members
    from database2ogr_spark.operators.sampling import split_corpus

    plain = split_corpus(
        out.select("doc_id", "group_id"), {"train": 95, "val": 5}
    )
    leaked = (
        plain.groupBy("group_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert leaked > 0


def test_training_order_dense_unique_and_layout_invariant(spark):
    from database2ogr_spark.operators.sampling import training_order

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id"
    )
    a = {r.doc_id: r.position for r in training_order(d).collect()}
    n = len(a)
    assert sorted(a.values()) == list(range(n))  # dense, unique, 0-based
    b = {
        r.doc_id: r.position
        for r in training_order(d.repartition(13)).collect()
    }
    assert a == b  # partition-layout invariant (unlike mono_increasing_id)
    c = {
        r.doc_id: r.position
        for r in training_order(d, seed=99).collect()
    }
    assert a != c  # the seed actually reshuffles


def test_training_order_populates_all_buckets(spark):
    """The round-4 advisor catch: a 56-shift over the 60-bit hash fills
    only 16 of the claimed 256 buckets.  With the 52-shift, ~600 docs must
    spread far beyond 16 buckets (the per-bucket window parallelism the
    operator exists to provide), and a smaller power-of-two n_buckets must
    fill essentially all of them."""
    from pyspark.sql import functions as F

    from database2ogr_spark.functions.hashing import stable_hash64
    from database2ogr_spark.operators.sampling import training_order

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id"
    )
    n_filled = (
        d.select(
            F.shiftright(
                stable_hash64(F.col("doc_id").cast("string"), seed=7), 52
            ).alias("b")
        )
        .distinct()
        .count()
    )
    assert n_filled > 100  # 600 balls into 256 bins fills >100 whp

    import pytest

    with pytest.raises(ValueError):
        training_order(d, n_buckets=100)  # not a power of two
    # n_buckets is honored: 4 buckets → positions still dense + unique
    a = {r.doc_id: r.position for r in training_order(d, n_buckets=4).collect()}
    assert sorted(a.values()) == list(range(len(a)))


def test_training_order_no_global_sort_funnel(spark):
    """The corpus-sized window must be partitioned (by bucket); only the
    256-row offsets window may be global."""
    from database2ogr_spark.operators.sampling import training_order

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        training_order(d)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    windows = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    assert windows
    # the row_number over the full data must carry a partition spec (_b)
    assert any("_b" in w for w in windows)


def test_pack_manifest_offsets_tile_each_bin(spark):
    """Within every bin, doc spans are contiguous, non-overlapping, start at
    0, and sum to the bin's token total — the block-diagonal mask contract."""
    from database2ogr_spark.operators.sampling import pack_manifest

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = pack_manifest(
        d, budget=10_000, group_col="lang", id_col="doc_id", token_col="n_chars"
    ).collect()
    bins = {}
    for r in rows:
        bins.setdefault((r.lang, r.bin_id), []).append(r)
    assert any(len(v) > 1 for v in bins.values())  # multi-doc bins exist
    for spans in bins.values():
        spans.sort(key=lambda r: r.start)
        assert spans[0].start == 0
        for a, b in zip(spans, spans[1:]):
            assert a.end == b.start  # contiguous, no gap/overlap
        for r in spans:
            assert r.end - r.start > 0


def test_weighted_sample_deterministic_and_weight_proportional(spark):
    from database2ogr_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id for r in weighted_sample(docs, "n_chars", 20, group_col="source").collect()}
    b = {
        r.doc_id
        for r in weighted_sample(
            docs.repartition(13), "n_chars", 20, group_col="source"
        ).collect()
    }
    assert a == b  # hash-keyed, layout-invariant
    # per-group cap respected
    from pyspark.sql import functions as F

    out = weighted_sample(docs, "n_chars", 5, group_col="source")
    sizes = out.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in sizes)
    # weight-proportionality: on a 2-point corpus with a 99:1 weight skew,
    # a k=1 sample across many seeds should pick the heavy doc most times
    rows = [(i, 99.0 if i % 2 == 0 else 1.0) for i in range(2)]
    df2 = spark.createDataFrame(rows, "doc_id long, w double")
    heavy = 0
    for seed in range(40):
        picked = weighted_sample(df2, "w", 1, seed=seed).collect()[0].doc_id
        heavy += picked == 0
    assert heavy >= 30  # ~99% expected; 30/40 is a loose floor


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from database2ogr_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -1.0), (3, None), (4, 2.0)],
        "doc_id long, w double",
    )
    got = {r.doc_id for r in weighted_sample(df, "w", 10).collect()}
    assert got == {4}


def test_weighted_sample_global_uses_take_ordered(spark):
    """The global (ungrouped) variant must be a distributed TakeOrdered
    (limit-pushdown), not a single-partition global sort window."""
    from database2ogr_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = weighted_sample(docs, "n_chars", 7)
    assert out.count() == 7
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_curriculum_order_tier_major_and_shuffled(spark):
    from pyspark.sql import functions as F

    from database2ogr_spark.operators.sampling import curriculum_order

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curriculum_order(docs).collect()
    n = len(out)
    assert sorted(r.position for r in out) == list(range(n))  # dense
    # tier-major: every bucket-b position precedes every bucket-(b+1) one
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.position)
    buckets = sorted(by_bucket)
    for a, b in zip(buckets, buckets[1:]):
        assert max(by_bucket[a]) < min(by_bucket[b])
    # within a tier the order is hash-shuffled, not score- or id-sorted
    first = sorted(by_bucket[buckets[0]])
    ids_in_order = {r.position: r.doc_id for r in out if r.bucket == buckets[0]}
    seq = [ids_in_order[p] for p in first]
    assert seq != sorted(seq)
    # layout invariance
    again = {
        r.doc_id: r.position
        for r in curriculum_order(docs.repartition(13)).collect()
    }
    assert again == {r.doc_id: r.position for r in out}


def test_length_bucketed_batches_structure(spark):
    from database2ogr_spark.operators.sampling import length_bucketed_batches

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = length_bucketed_batches(docs, batch_size=8, bucket_width=16).collect()
    assert sum(r.n_docs for r in rep) == docs.count()
    # every batch except possibly the last per bucket is full
    by_bucket = {}
    for r in rep:
        by_bucket.setdefault(r.length_bucket, []).append(r)
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r.batch_index)
        assert all(r.n_docs == 8 for r in rs[:-1])
        assert [r.batch_index for r in rs] == list(range(len(rs)))
    for r in rep:
        # pad_frac is exactly 1 - total/(max*n)
        assert r.pad_frac == round(1 - r.total_tokens / (r.batch_max_tokens * r.n_docs), 6)


def test_length_bucketing_beats_unbucketed_padding(spark):
    from database2ogr_spark.operators.sampling import length_bucketed_batches

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def waste(width):
        rep = length_bucketed_batches(docs, batch_size=8, bucket_width=width).collect()
        pad = sum(r.batch_max_tokens * r.n_docs - r.total_tokens for r in rep)
        tot = sum(r.batch_max_tokens * r.n_docs for r in rep)
        return pad / tot

    # narrow buckets → less padding than one giant bucket (hash-random batches)
    assert waste(8) < waste(1 << 30)


def test_length_bucketed_batches_layout_invariant(spark):
    from database2ogr_spark.operators.sampling import length_bucketed_batches

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, length_bucketed_batches(docs, batch_size=8).collect()))
    b = sorted(map(tuple, length_bucketed_batches(
        docs.repartition(7), batch_size=8).collect()))
    assert a == b


def test_select_to_budget_greedy_prefix(spark):
    from database2ogr_spark.operators.sampling import select_to_budget

    df = spark.createDataFrame(
        [
            # group a: scores 9,8,7,6 with costs 40,30,40,5
            (1, "a", 9.0, 40),
            (2, "a", 8.0, 30),
            (3, "a", 7.0, 40),
            (4, "a", 6.0, 5),
            # group b: single row over budget
            (5, "b", 5.0, 200),
        ],
        "doc_id long, source string, score double, n_tokens long",
    )
    out = select_to_budget(
        df, budget=100, cost_col="n_tokens", score_col="score"
    ).collect()
    kept = {r.doc_id: r.cum_cost for r in out}
    # greedy prefix: 40, 70, 110 > 100 stops the prefix — row 3 AND the
    # cheap row 4 behind it are both out (prefix, not knapsack)
    assert kept == {1: 40, 2: 70}


def test_select_to_budget_deterministic_tiebreak(spark):
    from database2ogr_spark.operators.sampling import select_to_budget

    df = spark.createDataFrame(
        [(i, "s", 1.0, 10) for i in range(10)],
        "doc_id long, source string, score double, n_tokens long",
    )
    out = select_to_budget(
        df, budget=35, cost_col="n_tokens", score_col="score"
    ).collect()
    # all scores tie -> id asc decides; 3 rows of cost 10 fit in 35
    assert sorted(r.doc_id for r in out) == [0, 1, 2]


def test_select_to_budget_rejects_bad_budget(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.sampling import select_to_budget

    df = spark.createDataFrame([(1, "a", 1.0, 1)], "doc_id long, source string, score double, n_tokens long")
    with _pytest.raises(ValueError):
        select_to_budget(df, budget=0, cost_col="n_tokens", score_col="score")


def _dsir_reference(rows, n_buckets, alpha=1.0):
    """Pure-Python DSIR log-weights (hashed unigram+bigram buckets)."""
    import hashlib
    import math
    import re

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(text):
        ws = [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if w]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    c_r, c_t = {}, {}
    for _id, text, tgt in rows:
        for g in grams(text):
            b = h64(g) % n_buckets
            c_r[b] = c_r.get(b, 0) + 1
            if tgt:
                c_t[b] = c_t.get(b, 0) + 1
    n_r, n_t = sum(c_r.values()), sum(c_t.values())
    out = {}
    for _id, text, tgt in rows:
        lw, nf = 0.0, 0
        for g in grams(text):
            b = h64(g) % n_buckets
            lw += math.log((c_t.get(b, 0) + alpha) / (n_t + alpha * n_buckets))
            lw -= math.log((c_r.get(b, 0) + alpha) / (n_r + alpha * n_buckets))
            nf += 1
        out[_id] = (nf, round(lw, 6))
    return out


def test_dsir_weights_match_reference(spark):
    from pyspark.sql import functions as F

    from database2ogr_spark.operators.sampling import dsir_weights

    rows = [
        (1, "the quick brown fox", 1),
        (2, "the quick brown dog", 1),
        (3, "lorem ipsum dolor sit amet", 0),
        (4, "the quick brown fox jumps", 0),
        (5, "zzz yyy xxx", 0),
        (6, "", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    out = {
        r.doc_id: (r.n_feats, r.log_weight)
        for r in dsir_weights(df, F.col("tgt") == 1, n_buckets=64).collect()
    }
    ref = _dsir_reference(rows, 64)
    assert set(out) == {1, 2, 3, 4, 5, 6}
    for i in (1, 2, 3, 4, 5):
        assert out[i][0] == ref[i][0]
        assert abs(out[i][1] - ref[i][1]) < 1e-5, (i, out[i], ref[i])
    assert out[6] == (0, 0.0)  # empty doc: no evidence, kept
    # target-like docs must outrank the off-target ones
    assert min(out[1][1], out[2][1]) > max(out[3][1], out[5][1])


def test_dsir_sample_gumbel_topk(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from database2ogr_spark.operators.sampling import dsir_sample

    rows = [(i, "good text here" if i % 2 else "junk noise blob", i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    out = dsir_sample(df, F.col("tgt") == 1, k=5, n_buckets=64).collect()
    assert len(out) == 5
    # deterministic across replays
    out2 = dsir_sample(df, F.col("tgt") == 1, k=5, n_buckets=64).collect()
    assert [r.doc_id for r in out] == [r.doc_id for r in out2]
    # scores are sorted desc with id tie-break
    scores = [(r.score, r.doc_id) for r in out]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    # near-zero temperature degenerates to top-k by weight: all selected
    # rows are target-like (odd ids have strictly higher weight)
    cold = dsir_sample(df, F.col("tgt") == 1, k=5, n_buckets=64, temperature=1e-6).collect()
    assert all(r.doc_id % 2 == 1 for r in cold)
    with _pytest.raises(ValueError):
        dsir_sample(df, F.col("tgt") == 1, k=0)
    with _pytest.raises(ValueError):
        dsir_sample(df, F.col("tgt") == 1, k=5, temperature=0)


def test_skipgram_negative_samples_structure(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from database2ogr_spark.operators.sampling import skipgram_negative_samples

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "c c a")], "doc_id long, text string"
    )
    out = skipgram_negative_samples(df, window=2, n_neg=3).persist()
    pos = out.filter("label = 1")
    neg = out.filter("label = 0")
    # doc1: 4 tokens -> offsets ±1: 3 pairs each dir; ±2: 2 pairs each dir = 10
    # doc2: 3 tokens -> ±1: 2+2, ±2: 1+1 = 6 positives
    assert pos.count() == 16
    # exact fixed fanout
    assert neg.count() == 16 * 3
    # every negative context is a corpus word
    vocab = {r.w for r in df.select(F.explode(
        F.split(F.lower("text"), " ")).alias("w")).distinct().collect()}
    assert {r.context for r in neg.collect()} <= vocab
    # determinism
    out2 = skipgram_negative_samples(df, window=2, n_neg=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))
    out.unpersist()
    with _pytest.raises(ValueError):
        skipgram_negative_samples(df, window=0)
    with _pytest.raises(ValueError):
        skipgram_negative_samples(df, n_neg=0)


def test_skipgram_negatives_follow_unigram_power(spark):
    from database2ogr_spark.operators.sampling import skipgram_negative_samples

    # one dominant word: negatives should hit it far more often than a rare one
    text = " ".join(["common"] * 50 + ["rare"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    neg = skipgram_negative_samples(df, window=1, n_neg=4).filter("label = 0")
    hits = {r["context"]: r["n"] for r in neg.groupBy("context").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert hits.get("common", 0) > 10 * hits.get("rare", 0)


def test_temporal_split_user_blocked(spark):
    rows = [
        (1, 10, "2024-01-01 00:00:00"),  # train
        (2, 10, "2024-02-01 00:00:00"),  # known user after cutoff -> discard
        (3, 20, "2024-02-02 00:00:00"),  # cold-start user -> test
        (4, 20, "2024-02-03 00:00:00"),  # same cold-start user -> test
        (5, 30, "2024-01-15 00:00:00"),  # train
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    from database2ogr_spark.operators.sampling import temporal_split

    out = {r.event_id: r.split for r in temporal_split(df, cutoff="2024-02-01 00:00:00").collect()}
    assert out == {1: "train", 2: "discard", 3: "test", 4: "test", 5: "train"}


def test_kfold_assign_balance_and_determinism(spark):
    import pytest as _p

    from database2ogr_spark.operators.sampling import kfold_assign

    rows = [(i, "a" if i % 10 < 7 else "b") for i in range(103)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = kfold_assign(df, k=5, stratify_col="lang")
    sizes = {
        (r.lang, r.fold): r.n
        for r in out.groupBy("lang", "fold").count().withColumnRenamed("count", "n").collect()
    }
    # exact ±1 balance within each stratum
    for lang in ("a", "b"):
        per = [sizes.get((lang, f), 0) for f in range(5)]
        assert max(per) - min(per) <= 1, per
    assert out.filter((F.col("fold") < 0) | (F.col("fold") >= 5)).count() == 0
    # deterministic under repartitioning
    a = {r.doc_id: r.fold for r in out.collect()}
    b = {r.doc_id: r.fold for r in kfold_assign(df.repartition(7), k=5, stratify_col="lang").collect()}
    assert a == b
    # unstratified path still balances overall (sub-strata each +-1)
    u = kfold_assign(df, k=5)
    per = [r["count"] for r in u.groupBy("fold").count().collect()]
    assert max(per) - min(per) <= 256  # bounded by sub-stratum count
    with _p.raises(ValueError):
        kfold_assign(df, k=1)


def test_class_weights_hand_values(spark):
    import pytest as _p

    from database2ogr_spark.operators.sampling import class_weights

    # beta=0.5: n=1 -> eff = (1-.5)/.5 = 1; n=2 -> (1-.25)/.5 = 1.5
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "b")], "id long, lab string")
    out = {r.lab: r for r in class_weights(df, "lab", beta=0.5).collect()}
    assert abs(out["a"].effective_n - 1.0) < 1e-6
    assert abs(out["b"].effective_n - 1.5) < 1e-6
    # raw weights 1, 2/3 -> normalized to mean 1: sum = 5/3, k=2
    assert abs(out["a"].weight - (1.0 * 2 / (5 / 3))) < 1e-6
    assert abs(out["b"].weight - ((2 / 3) * 2 / (5 / 3))) < 1e-6
    with _p.raises(ValueError):
        class_weights(df, "lab", beta=1.0)


def test_nested_subsets_monotone_and_stable(spark):
    import pytest as _p

    from database2ogr_spark.operators.sampling import nested_subsets

    df = spark.createDataFrame([(i, i % 50 + 1) for i in range(4000)], "doc_id long, n_chars long")
    out = sorted(nested_subsets(df, mass_col="n_chars").collect(), key=lambda r: r.level)
    # full corpus at the top level
    assert out[-1].n_rows == 4000
    # strictly nested: counts monotone nondecreasing, roughly halving
    for a, b in zip(out, out[1:]):
        assert a.n_rows <= b.n_rows
    assert 0.3 < out[-2].n_rows / out[-1].n_rows < 0.7
    # repartition stability
    again = sorted(nested_subsets(df.repartition(11), mass_col="n_chars").collect(), key=lambda r: r.level)
    assert [(r.n_rows, r.mass) for r in out] == [(r.n_rows, r.mass) for r in again]
    with _p.raises(ValueError):
        nested_subsets(df, levels=1)
