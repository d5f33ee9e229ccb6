"""Classic relational query pack (TPC-H-shaped) over the driver's tables.

The reference's relational surface is tiny (one equi-join, one pivot agg —
SURVEY.md §2.4-2.5); a usable analytics engine also needs the classic
join-heavy / filter-agg / outer-join / window shapes. Every function here is a
pure ``DataFrame -> DataFrame`` transform built only from native Column
expressions, so Catalyst owns the physical strategy end to end.

Scale design (the part that matters at 100 TB / 1000 executors):

- **Filter before join, always.** Each input is filtered and column-pruned
  before the first join so the parquet scan sees the predicate
  (``PushedFilters``) and the shuffle moves only surviving columns.
- **Broadcast only what is small by schema, not by scale factor.**
  ``nation`` (25 rows) and ``region`` (5 rows) are broadcast-hinted — their
  size is fixed by the data model. ``customer``/``supplier``/``orders`` grow
  with SF, so they go through shuffle joins and AQE decides at runtime
  whether a filtered side shrank enough to convert to broadcast
  (``spark.sql.adaptive.autoBroadcastJoinThreshold``).
- **Money sums on scaled integers.** Double summation is
  accumulation-order-dependent and diverges across engines/partitionings;
  per-addend ``round(x * 10000) :: bigint`` is associative, overflow-safe
  (2^63 / 10^4 ≈ 9·10^14 currency units), and bit-identical everywhere.
- **Top-k is TakeOrderedAndProject**, not a global sort: ``orderBy().limit()``
  keeps k rows per partition then merges k·P rows on the driver.
- **The window query partitions by a low-cardinality key** (market segment,
  5 values) — at extreme scale that is 5 sort tasks; acceptable here because
  only (o_orderkey, o_totalprice) survive projection into the sort. For
  high-cardinality per-group top-k prefer the same ``row_number`` shape
  partitioned by the high-cardinality key (parallelism = #groups).

Reference parity note: the reference delegates all of this to Postgres's
planner (SURVEY.md §4, `src/from-ground-up.js:117-121`); here Catalyst + AQE
play that role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _c4(col: F.Column) -> F.Column:
    """Per-addend scaled-integer money term: round(x * 10000) as bigint."""
    return F.round(col * 10000).cast("bigint")


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    topk: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one market segment.

    lineitem ⋈ orders is the big shuffle (both sides huge, same key); the
    filtered customer side joins after and is a candidate for AQE broadcast
    conversion once the segment filter cuts it to ~1/5.
    """
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit(cutoff))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = lineitem.filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit(cutoff))
    ).select(
        "l_orderkey",
        _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
        .select(
            "o_orderkey",
            "revenue_c4",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue_c4").desc(), F.col("o_orderkey").asc())
        .limit(topk)
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where supplier and customer share a
    nation inside one region.

    region (5 rows) and nation (25 rows) are broadcast by construction; the
    nation list is pre-joined onto both customer and supplier so the
    region predicate prunes *before* the big shuffles. The only large
    shuffles left are lineitem ⋈ orders (orderkey) and the custkey/suppkey
    joins; the s_nationkey = c_nationkey constraint rides along as a cheap
    post-join filter on already-co-located rows.
    """
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    c = customer.join(
        F.broadcast(nr.withColumnRenamed("n_nationkey", "c_nk")),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "c_nationkey")
    s = supplier.join(
        F.broadcast(nr.select(F.col("n_nationkey").alias("s_nk"), "n_name")),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    o = orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
    )


def forecast_revenue(
    lineitem: DataFrame,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo_pct: int = 5,
    disc_hi_pct: int = 7,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins — the
    predicate-pushdown canary. All three predicates reach the parquet reader
    (min/max row-group pruning on l_shipdate); the aggregate is a single
    partial-sum + 1-row final merge. The discount band compares on rounded
    integer percent so float representation never decides membership.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(date_to)))
        & F.round(F.col("l_discount") * 100).cast("int").between(disc_lo_pct, disc_hi_pct)
        & (F.col("l_quantity") < max_qty)
    )
    return li.agg(
        F.sum(_c4(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue_c4"),
        F.count(F.lit(1)).alias("n_items"),
    )


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    date_from: str = "1997-07-01",
    date_to: str = "1997-10-01",
    topk: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returned items in
    one quarter. Group-by key includes the carried customer attributes
    (functionally dependent on c_custkey) so no second join is needed after
    the aggregate; nation is broadcast. c_acctbal passes through untouched —
    no arithmetic, so the double stays bit-identical across engines.
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
    )
    c = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
        .orderBy(F.col("revenue_c4").desc(), F.col("c_custkey").asc())
        .limit(topk)
    )


def order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that had at least one line item
    shipped after the order date (EXISTS → **left-semi join**).

    The semi join is the right physical shape at scale: it shuffles only the
    join keys + the one comparison column from lineitem, never materializes
    the multiplicity of matching line items, and short-circuits per probe row.
    The extra non-equi term (l_shipdate > o_orderdate) rides on the equi-join
    as a post-match condition, so this stays a hash/sort-merge semi join, not
    a nested loop. (This dataset has no commitdate/receiptdate; the
    late-shipped predicate plays Q4's lateness role.)
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, *, since: str = "1998-01-01"
) -> DataFrame:
    """NOT EXISTS → **left-anti join**: customers with no orders since a
    date, counted per market segment. Anti join shuffles only o_custkey from
    the probe side — at 100 TB that is one bigint column of orders, not the
    table (and the date filter prunes row groups before the shuffle). The
    follow-up aggregate groups 5 segments: trivial shuffle, map-side partial.
    """
    recent = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit(since))
    ).select("o_custkey")
    return (
        customer.select("c_custkey", "c_mktsegment")
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer, including
    zero-order customers — the left-outer-join + double-aggregation shape.
    First agg shuffles on c_custkey (high cardinality, even spread); the
    second groups ~100 distinct counts, a trivial shuffle. At 100 TB the
    left join is the cost: both sides shuffle on custkey, no skew (TPC-H
    custkeys are uniform), AQE coalesces the post-filter partitions.
    """
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def nation_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between two nations, by direction and
    year. The nation dim is broadcast onto *both* ends of the fact (supplier
    via lineitem, customer via orders) so the two-nation predicate prunes each
    side before the orderkey shuffle; the cross-pair constraint
    ``supp_nation != cust_nation`` is a cheap post-join filter. Year comes
    from ``year(l_shipdate)`` — evaluated on already-filtered rows.
    """
    nat = nation.filter(F.col("n_name").isin([nation_a, nation_b])).select(
        "n_nationkey", "n_name"
    )
    s = supplier.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("s_nk"),
                               F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    c = customer.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("c_nk"),
                               F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(date_to)))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_c4").alias("revenue_c4"))
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    date_from: str = "1997-09-01",
    date_to: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promo parts — the
    conditional-aggregation ratio. part (fixed 200k rows/SF vs 6M lineitem)
    is broadcast; both sums come out of one pass (a ``when()`` inside the
    aggregate), so there is exactly one scan, one broadcast join, one 1-row
    final agg. Ratio in basis points on the scaled-integer sums keeps the
    result engine-portable.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit(date_to)))
    ).select(
        "l_partkey",
        _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
    )
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li.l_partkey == F.col("p_partkey"),
    )
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_c4")).otherwise(F.lit(0)))
        .alias("promo_rev_c4"),
        F.sum("rev_c4").alias("total_rev_c4"),
    )
    return agg.select(
        "promo_rev_c4",
        "total_rev_c4",
        (F.round(F.col("promo_rev_c4") * 10000 / F.col("total_rev_c4"))
         .cast("bigint")).alias("promo_share_bp"),
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    date_from: str = "1997-07-01",
    date_to: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue — the
    scalar-subquery-against-an-aggregate shape. The per-supplier revenue agg
    is computed once; the 1-row global max is cross-joined back (Catalyst
    plans a broadcast nested-loop of a single row — free) instead of
    recomputing the revenue view twice as literal SQL would. Ties all
    survive, matching the SQL semantics.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit(date_from)))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit(date_to)))
        )
        .select(
            "l_suppkey",
            _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("rev_c4").alias("total_revenue_c4"))
    )
    mx = rev.agg(F.max("total_revenue_c4").alias("max_rev_c4"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue_c4 == mx.max_rev_c4)
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_c4")
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    brand: str = "Brand#23",
    frac: float = 0.2,
) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of a part's average
    quantity — the correlated-scalar-subquery shape, decorrelated into an
    aggregate + self-broadcast-join. lineitem is scanned twice but the
    per-part average table is #parts-of-one-brand rows (tiny), broadcast onto
    the second scan — no shuffle of lineitem at all. avg on a scaled-integer
    sum / count keeps the threshold engine-portable.
    """
    p = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = li.groupBy("l_partkey").agg(
        (F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
         / (100.0 * F.count(F.lit(1)))).alias("avg_qty")
    ).select(F.col("l_partkey").alias("a_partkey"), "avg_qty")
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < frac * F.col("avg_qty"))
        .agg(
            F.sum(_c4(F.col("l_extendedprice"))).alias("small_qty_rev_c4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    min_qty: int = 300,
    topk: int = 10,
) -> DataFrame:
    """TPC-H Q18 shape: customers with orders above a total-quantity
    threshold — the GROUP BY + HAVING → semi-join shape. The heavy agg
    (sum of quantity per orderkey) runs first and the HAVING filter cuts it
    to a handful of orderkeys, which then *broadcast*-semi-join back onto
    orders; customer attaches last. lineitem shuffles once, on its natural
    key, and nothing downstream touches it again.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("qty_c2"))
        .filter(F.col("qty_c2") > min_qty * 100)
        .select("l_orderkey", (F.col("qty_c2") / 100.0).alias("total_qty"))
    )
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(topk)
    )


def disjunctive_band_revenue(
    lineitem: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """TPC-H Q19 shape: revenue over an OR-of-ANDs of (brand, size,
    quantity) bands — the disjunctive-predicate join. The single
    part-attribute disjunction stays one broadcast hash join with the OR as
    the join residual; the shared conjuncts (p_size >= 1) are factored out
    so they still push into the part scan. No engine should turn this into
    three unions of the fact table.
    """
    p = part.filter(F.col("p_size") >= 1).select("p_partkey", "p_brand", "p_size")
    li = lineitem.select(
        "l_partkey", "l_quantity",
        _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
    )
    band = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), (li.l_partkey == p.p_partkey) & band)
        .agg(
            F.sum("rev_c4").alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    *,
    since: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders — global-average scalar broadcast + anti join. The 1-row average
    (over strictly-positive balances) broadcast-nested-loop-joins onto
    customer (free), the anti join probes with just o_custkey after the date
    filter pruned the orders scan, and the final agg groups 5 market
    segments (phone-prefix stand-in: this schema has no c_phone; "no orders
    ever" is also vacuous in this data — every customer has orders). At
    100 TB: one pass over customer, one single-column pass over recent
    orders, no wide shuffle anywhere.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
         / (100.0 * F.count(F.lit(1)))).alias("avg_bal")
    )
    rich = (
        customer.select("c_custkey", "c_mktsegment", "c_acctbal")
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit(since))
    ).select("o_custkey")
    return (
        rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("total_bal_c2"),
        )
    )


def market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "EUROPE",
    target_nation: str = "NATION_5",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue, per year —
    the grouped conditional-ratio over a multi-join. The region predicate
    prunes customers through a broadcast nation⋈region dim *before* the big
    shuffles; the supplier's nation rides along as a broadcast-attached tag
    and the share is a CASE inside one aggregate (no second pass). Share in
    basis points on scaled-integer sums stays engine-portable.
    """
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("c_nk"))
    c = customer.join(F.broadcast(nr), F.col("c_nationkey") == F.col("c_nk")).select(
        "c_custkey"
    )
    s = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    o = orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_c4"),
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
    )
    agg = j.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == target_nation, F.col("rev_c4")).otherwise(
                F.lit(0)
            )
        ).alias("nation_rev_c4"),
        F.sum("rev_c4").alias("total_rev_c4"),
    )
    return agg.select(
        "o_year",
        "nation_rev_c4",
        "total_rev_c4",
        F.round(F.col("nation_rev_c4") * 10000 / F.col("total_rev_c4"))
        .cast("bigint")
        .alias("share_bp"),
    )


def late_lines_by_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q12 shape: per line status, count late-shipped lines on
    critical- vs non-critical-priority orders — the post-join CASE-count
    aggregation. One shuffle join on orderkey (only priority + date cross
    the wire from orders), the conditional split is a CASE pair inside one
    aggregate. (No shipmode column in this schema; l_linestatus plays the
    grouping role, shipped-after-order-date the lateness role.)
    """
    o = orders.filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_linestatus", "l_shipdate")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def sole_late_suppliers(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    topk: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY supplier shipping late
    on a multi-supplier order — the semi-join + anti-join composition on the
    same fact table.

    Three derived views of lineitem, all reduced to (orderkey, suppkey)
    before any join: the candidate late lines, a semi-join proving another
    supplier exists on the order, and an anti-join disproving any *other*
    late supplier. Both probes shuffle two bigints per row; the candidate
    side never re-reads the full width of lineitem. (This schema has no
    commitdate/receiptdate; shipped-after-order-date plays the lateness
    role, as in the Q4 shape.)
    """
    li = lineitem.select("l_orderkey", "l_suppkey")
    late = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # some other supplier participated in the order …
    has_other = late.alias("c").join(
        li.alias("x"),
        (F.col("c.l_orderkey") == F.col("x.l_orderkey"))
        & (F.col("c.l_suppkey") != F.col("x.l_suppkey")),
        "leftsemi",
    )
    # … but no OTHER supplier was late on it
    only_late = has_other.alias("h").join(
        late.alias("l2"),
        (F.col("h.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("h.l_suppkey") != F.col("l2.l_suppkey")),
        "left_anti",
    )
    return (
        only_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "s_suppkey", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(topk)
    )


def top_orders_per_segment(
    customer: DataFrame, orders: DataFrame, *, k: int = 3
) -> DataFrame:
    """Per-group top-k via ``row_number`` — the window-function surface.

    Partition key is c_mktsegment (5 groups). The rank runs *after* an
    aggressive projection (3 columns survive into the sort) and the filter
    ``rn <= k`` is applied before anything else touches the result. For
    high-cardinality partitions this same shape scales linearly; for
    low-cardinality ones like this, AQE's skew handling can split the sort
    spill, and an alternative two-phase top-k (per-partition heap via
    ``orderBy().limit()`` per group) is only worth it when k·groups is tiny.
    """
    j = orders.select("o_orderkey", "o_custkey", "o_totalprice").join(
        customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )
    return (
        j.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= k)
    )


# ---------------------------------------------------------------------------
# The five partsupp-dependent TPC-H shapes, adapted to this schema.
#
# This dataset has no partsupp table (TESTDATA.md), so Q2/Q9/Q11/Q16/Q20
# cannot be run literally. What matters for engine coverage is each query's
# *plan shape* — the decorrelated correlated-min join, the multi-dim profit
# rollup, the global-fraction HAVING, the distinct-count-with-NOT-IN, and the
# nested grouped-HAVING semi-join chain. Each adaptation below keeps that
# shape exactly and substitutes lineitem as the part↔supplier bridge (it is
# the only table relating parts to suppliers here) and p_retailprice /
# s_acctbal for the missing cost/complaint columns.


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "EUROPE",
    size: int = 15,
    topk: int = 10,
) -> DataFrame:
    """TPC-H Q2 shape: for each part of one size, the region supplier offering
    it at the minimum unit price — the correlated scalar-min subquery,
    decorrelated into an aggregate + equality join back.

    ``offers`` (per part×supplier min unit price, region suppliers only) is
    computed ONCE and reused for both the per-part min and the winner join —
    literal SQL would scan the bridge twice. Unit price is ``floor(100·price
    /qty)`` (floor, not round: IEEE division then floor is bit-identical
    across engines, no half-way cases). The region filter prunes the bridge
    BEFORE the per-part aggregate, so at 100 TB the heavy groupBy only sees
    one region's rows; the per-part min table is #parts-of-one-size rows —
    broadcast back. Ref parity: `src/from-ground-up.js` has no such query;
    this is engine-completeness surface (SURVEY.md §2.4 join family).
    """
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    offers = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            F.floor(100.0 * F.col("l_extendedprice") / F.col("l_quantity"))
            .cast("bigint")
            .alias("unit_c2"),
        )
        .join(s.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"), "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_c2").alias("cost_c2"))
    )
    p = part.filter(F.col("p_size") == size).select("p_partkey", "p_brand", "p_type")
    best = (
        offers.join(F.broadcast(p.select("p_partkey")),
                    F.col("l_partkey") == F.col("p_partkey"), "leftsemi")
        .groupBy("l_partkey")
        .agg(F.min("cost_c2").alias("min_cost_c2"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    return (
        offers.join(
            F.broadcast(best),
            (offers.l_partkey == F.col("b_partkey"))
            & (offers.cost_c2 == F.col("min_cost_c2")),
        )
        .join(F.broadcast(p), offers.l_partkey == p.p_partkey)
        .join(s, offers.l_suppkey == s.s_suppkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "p_type",
            "s_suppkey", "cost_c2",
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(topk)
    )


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    name_token: str = "bolt",
    cost_frac: float = 0.6,
) -> DataFrame:
    """TPC-H Q9 shape: profit on one product family by supplier nation and
    order year. Margin uses ``cost_frac·p_retailprice·l_quantity`` as the
    cost basis (no ps_supplycost in this schema).

    The name-filtered part dim is broadcast FIRST so the fact shrinks to one
    product family before the only big shuffle (orderkey, for the year);
    supplier→nation rides as a second broadcast. Margins can be negative —
    both engines round half-away-from-zero, so the c4 term stays portable.
    """
    p = part.filter(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = (
        lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            _c4(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - cost_frac * F.col("p_retailprice") * F.col("l_quantity")
            ).alias("margin_c4"),
        )
    )
    return (
        li.join(orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("supp_nation", "o_year")
        .agg(F.sum("margin_c4").alias("profit_c4"))
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "NATION_7",
    fraction: float = 0.002,
) -> DataFrame:
    """TPC-H Q11 shape: parts holding more than a fixed fraction of one
    nation's total traded value — the scalar-subquery-in-HAVING.

    The per-part aggregate is computed once; the grand total is a GLOBAL
    WINDOW over those rows. A separate ``.agg()`` + join-back reads nicer but
    Catalyst does not share common subplans — the per_part subtree (and the
    fact scan under it) would be duplicated, verified in
    tests/test_relational.py. The window funnels only the ~#parts aggregated
    rows (16 B each) through one task — at 100 TB the fact is touched
    exactly once and the single-partition exchange moves the small side. If
    #parts itself were huge, persist per_part and take the two-stage total
    instead. Value basis is discounted revenue (no ps_availqty·ps_supplycost
    here).
    """
    s = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            _c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val_c4"),
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey, "leftsemi")
        .groupBy("l_partkey")
        .agg(F.sum("val_c4").alias("part_value_c4"))
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("total_c4", F.sum("part_value_c4").over(w))
        .filter(F.col("part_value_c4") > fraction * F.col("total_c4"))
        .select("l_partkey", "part_value_c4")
        .orderBy(F.col("part_value_c4").desc(), F.col("l_partkey").asc())
    )


def supplier_part_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    *,
    exclude_brand: str = "Brand#5",
    sizes: tuple[int, ...] = (1, 9, 14, 19, 23, 36, 45, 49),
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can ship each
    (brand, type, size) — count-distinct over a bridge, minus a NOT-IN
    supplier denylist (negative account balance stands in for Q16's
    complaint filter).

    The denylist is an anti join probing with ONE bigint column; the
    attribute dim is broadcast; the count-distinct shuffles (brand,type,size,
    suppkey) — Spark plans the standard two-phase distinct-agg expand. The
    bridge's duplicate (part,supplier) pairs are absorbed by the distinct
    count, not pre-deduped — one shuffle instead of two.
    """
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.filter(
        (F.col("p_brand") != exclude_brand) & F.col("p_size").isin(list(sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


def promotable_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    name_token: str = "red",
    nation_name: str = "NATION_3",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    min_qty: int = 50,
) -> DataFrame:
    """TPC-H Q20 shape: one nation's suppliers who moved real volume of a
    product family in a year — the nested grouped-HAVING semi-join chain
    (part-name subquery → per-(supplier,part) quantity aggregate → HAVING →
    supplier semi-join).

    The name-filtered part list broadcasts into the fact scan (with the date
    predicate pushed down), the volume aggregate groups the surviving
    sliver, and the supplier probe is a semi join on one key column. Nothing
    wide ever shuffles. (Q20's ``0.5·avail_qty`` threshold becomes the flat
    ``min_qty`` — no availqty column exists here.)
    """
    p = part.filter(F.col("p_name").contains(name_token)).select("p_partkey")
    movers = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit(date_from)))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit(date_to)))
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey, "leftsemi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("qty_c2"))
        .filter(F.col("qty_c2") > min_qty * 100)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(movers, F.col("s_suppkey") == movers.l_suppkey, "leftsemi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def lineitem_measures_long(lineitem: DataFrame) -> DataFrame:
    """Unpivot (melt) surface: the Q1-style wide aggregate turned long —
    one (flag, status, measure, value) row per measure.

    ``DataFrame.unpivot`` is a zero-shuffle narrow op (each row expands to
    #measures rows in place), so the only exchange is the preceding 6-group
    aggregate. All measures are cast to one bigint domain first — unpivot
    requires a common value type, and scaled integers keep the values
    engine-portable. The inverse (pivot) surface is covered by ``warnify``
    (SURVEY.md §2.5).
    """
    wide = lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("sum_qty_c2"),
        F.sum(_c4(F.col("l_extendedprice"))).alias("sum_base_c4"),
        F.sum(_c4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("sum_disc_c4"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return wide.unpivot(
        ["l_returnflag", "l_linestatus"],
        ["sum_qty_c2", "sum_base_c4", "sum_disc_c4", "n_lines"],
        "measure",
        "value",
    )
