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
