"""Analytical join/aggregation operators over the TPC-H-ish testdata.

These exercise the engine's scan/filter/join/agg/sort surface (SURVEY §2.2,
§2.3, §2.4, §2.6) at benchmark scale. Plans are deliberately Catalyst-
friendly:
- dimension tables are broadcast (region/nation/customer/supplier fit in MB
  even at 100 TB fact scale);
- filters sit directly on the scans (pushdown to parquet row-group stats);
- aggregates use decimal accumulation so results hash-match the DuckDB
  oracle exactly regardless of partial-agg ordering (double SUM is
  order-sensitive; DECIMAL SUM is exact integer arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dsum(col, scale: int = 6) -> F.Column:
    """Order-insensitive exact sum of a double expression: round each element
    into a decimal, sum exactly, emit double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2001-09-01") -> DataFrame:
    """Pricing summary report: groupBy 2 cols + 8 aggregates (TPC-H Q1 shape)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    base = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    return (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    segment: str = "BUILDING", date: str = "1998-01-01",
) -> DataFrame:
    """Unshipped-orders revenue: 3-way join, top-10 (TPC-H Q3 shape).

    customer is broadcast; orders⋈lineitem shuffles on orderkey only.
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < F.lit(date).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.where(F.col("l_shipdate") > F.lit(date).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(
    region: DataFrame, nation: DataFrame, customer: DataFrame,
    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
    region_name: str = "ASIA", d1: str = "1996-01-01", d2: str = "1997-01-01",
) -> DataFrame:
    """Revenue per nation where customer and supplier share the nation
    (TPC-H Q5 shape): 6-way join; all dims broadcast, facts shuffle once."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    r = region.where(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(d2).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(_dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q6_forecast_revenue(
    lineitem: DataFrame, d1: str = "1996-01-01", d2: str = "1997-01-01",
    disc_lo: float = 0.02, disc_hi: float = 0.06, qty_lt: float = 24.0,
) -> DataFrame:
    """Filter + single aggregate (TPC-H Q6 shape): pure pushdown showcase."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(d2).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < qty_lt)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def customers_without_recent_orders(
    customer: DataFrame, orders: DataFrame, d1: str = "1995-01-01",
    d2: str = "1996-01-01",
) -> DataFrame:
    """J4 anti-join: customers with no orders in a window (NOT EXISTS)."""
    recent = orders.where(
        (F.col("o_orderdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(d2).cast("timestamp"))
    ).select(F.col("o_custkey"))
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customers_with_big_orders(
    customer: DataFrame, orders: DataFrame, min_total: float = 400000.0
) -> DataFrame:
    """Semi-join (EXISTS): customers having at least one large order."""
    big = orders.where(F.col("o_totalprice") > min_total).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


def q4_order_priority(
    orders: DataFrame, lineitem: DataFrame,
    d1: str = "1996-01-01", d2: str = "1996-04-01",
) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS semi-join then
    count per priority. The semi-join shuffles on orderkey; the tiny
    priority agg broadcasts nothing."""
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(d2).cast("timestamp"))
    )
    late = lineitem.select("l_orderkey", "l_shipdate")
    matched = o.join(
        late,
        (o.o_orderkey == late.l_orderkey) & (late.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    d1: str = "1996-01-01", d2: str = "1996-04-01", k: int = 20,
) -> DataFrame:
    """Returned-item revenue per customer, top-k (TPC-H Q10 shape):
    fact⋈fact on orderkey, customer broadcast, agg, global top-k."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(d2).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(_dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def q12_priority_shipping(
    orders: DataFrame, lineitem: DataFrame,
    d1: str = "1996-01-01", d2: str = "1997-01-01",
) -> DataFrame:
    """Conditional aggregation over a join (TPC-H Q12 shape): per return
    flag, how many lines belong to critical- vs normal-priority orders."""
    l = lineitem.where(
        (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(d2).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = orders.select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(crit).alias("high_line_count"),
            F.sum(1 - crit).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q14_promo_revenue(
    part: DataFrame, lineitem: DataFrame,
    d1: str = "1996-01-01", d2: str = "1996-02-01",
) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): broadcast dim join +
    two conditional decimal sums folded into one ratio."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    l = lineitem.where(
        (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(d2).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = part.select("p_partkey", "p_type")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return joined.agg(
        (F.lit(100.0) * _dsum(promo) / _dsum(revenue)).alias("promo_revenue_pct"),
        _dsum(revenue).alias("total_revenue"),
    )


def q7_volume_shipping(
    supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
    customer: DataFrame, nation: DataFrame,
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
    d1: str = "1996-01-01", d2: str = "1998-01-01",
) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7 shape): 5-way join
    with a symmetric pair predicate and per-year decimal revenue. Nation
    is broadcast twice under different aliases; the fact-fact joins
    shuffle once per key."""
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    l = lineitem.where(
        (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(d2).cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    joined = (
        l.join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_dsum(revenue).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
    customer: DataFrame, nation: DataFrame, region: DataFrame,
    target_nation: str = "NATION_3", region_name: str = "ASIA",
    p_type: str = "PROMO", d1: str = "1996-01-01", d2: str = "1998-01-01",
) -> DataFrame:
    """National market share inside a region (TPC-H Q8 shape): 7-way join,
    then a conditional-sum / total-sum ratio per order year."""
    l = lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(d1).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(d2).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust_nation = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)
                          .select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    joined = (
        l.join(
            F.broadcast(
                part.where(F.col("p_type") == p_type).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_nation, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == target_nation, volume).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((_dsum(target) / _dsum(volume)).alias("mkt_share"))
        .orderBy("o_year")
    )


def q2_min_cost_supplier(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
    size: int = 15, limit: int = 100,
) -> DataFrame:
    """Groupwise-min join-back (TPC-H Q2 essence, adapted: the testdata has
    no partsupp table, so the per-(part, supplier) offer price is the min
    observed unit price in lineitem). For each part of a given size, keep
    the supplier(s) offering the global-min unit price; order by supplier
    account balance. The per-part min is a scalar-correlated subquery in
    SQL; here it is an aggregate broadcast-joined back on (partkey, price).
    """
    p = part.where(F.col("p_size") == size).select("p_partkey", "p_name")
    offers = (
        lineitem.select(
            "l_partkey", "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "p_name", "l_suppkey")
        .agg(F.min("unit_price").alias("offer_price"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("offer_price").alias("min_price")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("offer_price") == F.col("min_price")),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_acctbal", "s_name", "p_name", "l_partkey", "offer_price")
        .orderBy(F.col("s_acctbal").desc(), "l_partkey", "s_name")
        .limit(limit)
    )


def q9_product_profit(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
    nation: DataFrame, name_like: str = "%gear%",
) -> DataFrame:
    """Product-type profit per nation per year (TPC-H Q9 shape, adapted:
    supply cost proxied by 0.6 * p_retailprice since there is no partsupp).
    5-way join; part filter broadcast; profit decimal-accumulated."""
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    p = part.where(F.col("p_name").like(name_like)).select(
        "p_partkey", "p_retailprice"
    )
    joined = (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount", "l_quantity",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_parts(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
    nation_name: str = "NATION_1", fraction: float = 0.001,
) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape, adapted: part value
    = lineitem revenue for suppliers of one nation, no partsupp). Parts
    whose value exceeds ``fraction`` of the total — a HAVING against a
    scalar subquery; Spark-side the total is a 1-row cross-joined agg so
    the plan stays fully declarative (no driver collect)."""
    s = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                nation.where(F.col("n_name") == nation_name).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_dsum(F.col("l_extendedprice")).alias("part_value"))
    )
    total = value.agg(
        _dsum(F.col("part_value"), scale=4).alias("total_value")
    )
    return (
        value.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("total_value") * F.lit(fraction))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = "4-NOT SPECIFIED"
) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER join
    so zero-order customers survive, two stacked aggregations. The outer
    join shuffles once on custkey; the second agg is tiny."""
    o = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(
    supplier: DataFrame, lineitem: DataFrame,
    d1: str = "1996-01-01", d2: str = "1996-04-01",
) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape): revenue "view"
    aggregated once and reused for both the global max (1 row, broadcast)
    and the equality join-back — no recompute, no correlated rescan."""
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(d2).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top),
                     F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "total_revenue")
        .orderBy("s_suppkey")
    )


def q17_small_quantity_revenue(
    part: DataFrame, lineitem: DataFrame, brand: str = "Brand#13"
) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): per-part average
    quantity (the correlated subquery) computed once as an aggregate and
    broadcast back; lineitems below 20% of their part's average contribute
    extendedprice / 7."""
    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    l = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        ((_dsum(F.col("l_quantity")) / F.count("*")) * F.lit(0.2)).alias("qty_cut")
    )
    return (
        l.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def q19_disjunctive_predicates(
    part: DataFrame, lineitem: DataFrame,
) -> DataFrame:
    """Discounted revenue under OR'd brand/size/quantity triples (TPC-H Q19
    shape): one broadcast join, the disjunction evaluated post-join in a
    single codegen stage — Catalyst extracts the common l_quantity bounds
    (<= 30) for scan-level pushdown."""
    l = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = part.select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & (F.col("p_size").between(1, 50))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


def q21_waiting_suppliers(
    supplier: DataFrame, lineitem: DataFrame, orders: DataFrame,
    nation: DataFrame, nation_name: str = "NATION_2",
    grace_days: int = 60, limit: int = 100,
) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape, adapted: no
    commit/receipt dates, so "late" = shipped more than ``grace_days``
    after the order date). For finished multi-supplier orders: the target
    supplier was late (semi) and no OTHER supplier was late (anti) —
    the classic EXISTS + NOT EXISTS double-correlation as one aggregated
    self-join instead of two rescans of lineitem."""
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {grace_days} DAYS"
    )
    l = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    per_supp = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("supp_late")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count("*").alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    culprit = (
        per_supp.where(F.col("supp_late") == 1)
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            F.col("l_orderkey") == F.col("g_orderkey"),
        )
    )
    s = supplier.select("s_suppkey", "s_name", "s_nationkey").join(
        F.broadcast(
            nation.where(F.col("n_name") == nation_name).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        culprit.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(limit)
    )


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame, n_groups: int = 7,
    dormant_since: str = "2000-01-01",
) -> DataFrame:
    """Dormant high-balance customers (TPC-H Q22 shape, adapted: country
    code = c_custkey % n_groups since names carry no phone prefix, and
    "dormant" = no orders since ``dormant_since`` because every synthetic
    customer has some order). Scalar AVG subquery (positive balances)
    broadcast as a 1-row frame; anti-join drops recently-active customers;
    grouped decimal sums."""
    cust = customer.select(
        "c_custkey", "c_acctbal", (F.col("c_custkey") % n_groups).alias("cntrycode")
    )
    cutoff = cust.where(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(dormant_since).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(cutoff))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q16_parts_supplier_relationship(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
    exclude_brand: str = "Brand#1", exclude_type: str = "PROMO",
) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape, adapted: the
    part↔supplier bridge is lineitem, not partsupp; "complaint" suppliers
    = negative account balance). COUNT DISTINCT per part attribute triple,
    suppliers excluded via broadcast anti-join (the NOT IN subquery)."""
    sizes = [1, 5, 10, 15, 20, 25, 30, 35]
    p = part.where(
        (F.col("p_brand") != exclude_brand)
        & (F.col("p_type") != exclude_type)
        & F.col("p_size").isin(sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q20_excess_shippers(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame, nation: DataFrame,
    name_prefix: str = "small%", nation_name: str = "NATION_1",
    d1: str = "1996-01-01", d2: str = "1997-01-01", min_qty: float = 40.0,
) -> DataFrame:
    """Suppliers shipping excess volume of selected parts (TPC-H Q20 shape,
    adapted: availqty has no partsupp source, so "excess" = total shipped
    quantity of a matching part above ``min_qty`` in the window). The
    nested IN subqueries become: per-(supplier, part) agg → HAVING →
    distinct suppkeys → semi-join into the nation-filtered supplier dim."""
    p = part.where(F.col("p_name").like(name_prefix)).select("p_partkey")
    heavy = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(d2).cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
        .select("l_suppkey")
    )
    s = supplier.join(
        F.broadcast(
            nation.where(F.col("n_name") == nation_name).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_quantity: float = 150.0, limit: int = 20,
) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): grouped HAVING on the fact
    table semi-restricts the join — the heavy groupBy runs once and its
    output (few keys) drives the rest."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > min_quantity)
    )
    return (
        big.join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(limit)
    )
