"""Property-based TPC-H shape checks: random query parameters, Spark vs a
DuckDB oracle on the same sf0.001 parquet. Extends the fixed-parameter
driver gate (scripts/check_oracle.py) to the whole parameter space —
date bounds, segments, thresholds — with hypothesis shrinking."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bytehub_spark.operators import tpch
from bytehub_spark.sources import load_table

SF = "/root/testdata/sf0.001"

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in _TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def tables(spark):
    return {t: load_table(spark, SF, t).cache() for t in _TABLES}


def _assert_match(sdf, ddf):
    s = sdf.toPandas()
    d = ddf.df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    if not len(s):
        return
    cols = sorted(s.columns)
    s = s[cols].sort_values(cols).reset_index(drop=True)
    d = d[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_float_dtype(s[c]):
            a, b = s[c].to_numpy(dtype=float), d[c].to_numpy(dtype=float)
            mask = ~(np.isnan(a) & np.isnan(b))
            np.testing.assert_allclose(a[mask], b[mask], rtol=1e-12)
        else:
            assert s[c].astype(str).tolist() == d[c].astype(str).tolist(), c


dates = st.integers(min_value=0, max_value=2400).map(
    lambda d: (pd.Timestamp("1995-01-01") + pd.Timedelta(days=d)).strftime("%Y-%m-%d")
)


@given(cutoff=dates)
@settings(**SETTINGS)
def test_q1_any_cutoff(tables, con, cutoff):
    _assert_match(
        tpch.q1_pricing_summary(tables["lineitem"], cutoff),
        con.execute(
            f"""
            SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
                CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
                count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            """
        ),
    )


@given(
    segment=st.sampled_from(
        ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
    ),
    date=dates,
)
@settings(**SETTINGS)
def test_q3_any_segment_date(tables, con, segment, date):
    _assert_match(
        tpch.q3_shipping_priority(
            tables["customer"], tables["orders"], tables["lineitem"], segment, date
        ),
        con.execute(
            f"""
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM customer, orders, lineitem
            WHERE c_mktsegment = '{segment}'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '{date} 00:00:00'
              AND l_shipdate > TIMESTAMP '{date} 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
            """
        ),
    )


@given(
    start=st.integers(min_value=0, max_value=2000),
    span=st.integers(min_value=30, max_value=400),
    disc_lo=st.sampled_from([0.0, 0.02, 0.04]),
    width=st.sampled_from([0.02, 0.04, 0.08]),
    qty_lt=st.sampled_from([10.0, 24.0, 45.0]),
)
@settings(**SETTINGS)
def test_q6_any_window(tables, con, start, span, disc_lo, width, qty_lt):
    d1 = (pd.Timestamp("1995-01-01") + pd.Timedelta(days=start)).strftime("%Y-%m-%d")
    d2 = (
        pd.Timestamp("1995-01-01") + pd.Timedelta(days=start + span)
    ).strftime("%Y-%m-%d")
    hi = disc_lo + width
    _assert_match(
        tpch.q6_forecast_revenue(tables["lineitem"], d1, d2, disc_lo, hi, qty_lt),
        con.execute(
            f"""
            SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   count(*) AS n
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{d1} 00:00:00'
              AND l_shipdate < TIMESTAMP '{d2} 00:00:00'
              AND l_discount >= {disc_lo} AND l_discount <= {hi}
              AND l_quantity < {qty_lt}
            """
        ),
    )


@given(min_qty=st.sampled_from([80.0, 120.0, 150.0, 200.0, 280.0]))
@settings(**SETTINGS)
def test_q18_any_threshold(tables, con, min_qty):
    _assert_match(
        tpch.q18_large_orders(
            tables["customer"], tables["orders"], tables["lineitem"], min_qty, 20
        ),
        con.execute(
            f"""
            SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, t.total_qty
            FROM (
                SELECT l_orderkey,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > {min_qty}
            ) t
            JOIN orders o ON t.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY t.total_qty DESC, o.o_orderkey ASC LIMIT 20
            """
        ),
    )


@given(
    n_groups=st.integers(min_value=2, max_value=11),
    since=st.sampled_from(["1997-06-01", "1999-01-01", "2000-01-01", "2001-06-01"]),
)
@settings(**SETTINGS)
def test_q22_any_grouping(tables, con, n_groups, since):
    _assert_match(
        tpch.q22_global_sales_opportunity(
            tables["customer"], tables["orders"], n_groups, since
        ),
        con.execute(
            f"""
            SELECT c_custkey % {n_groups} AS cntrycode, count(*) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
            FROM customer c
            WHERE c_acctbal > (
                SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                FROM customer WHERE c_acctbal > 0.0
            )
            AND NOT EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{since} 00:00:00'
            )
            GROUP BY cntrycode ORDER BY cntrycode
            """
        ),
    )


# nations that actually have suppliers at sf0.001 — the default NATION_1/
# NATION_2 params yield empty results at this sf, which would let a flipped
# predicate pass unnoticed (ADVICE r01); these tests pin the non-empty path.
_SUPPLIER_NATIONS = (
    "NATION_3", "NATION_8", "NATION_12", "NATION_13", "NATION_15",
    "NATION_18", "NATION_19", "NATION_20", "NATION_21", "NATION_24",
)


@given(
    nn=st.sampled_from(_SUPPLIER_NATIONS),
    frac=st.sampled_from([0.0005, 0.001, 0.002, 0.005]),
)
@settings(**SETTINGS)
def test_q11_nonempty_any_nation(tables, con, nn, frac):
    sdf = tpch.q11_important_parts(
        tables["lineitem"], tables["supplier"], tables["nation"],
        nation_name=nn, fraction=frac,
    )
    ddf = con.execute(f"""
        WITH value AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS part_value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = '{nn}' GROUP BY l_partkey)
        SELECT l_partkey, part_value FROM value
        WHERE part_value > (
            SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,4))) AS DOUBLE) * {frac}
            FROM value)
        ORDER BY part_value DESC, l_partkey
    """)
    s = sdf.toPandas()
    assert len(s) > 0, "parameterization must exercise the non-empty path"
    _assert_match(sdf, ddf)


@given(
    nn=st.sampled_from(_SUPPLIER_NATIONS),
    mq=st.sampled_from([1.0, 5.0, 10.0]),
)
@settings(**SETTINGS)
def test_q20_nonempty_any_nation(tables, con, nn, mq):
    sdf = tpch.q20_excess_shippers(
        tables["part"], tables["supplier"], tables["lineitem"], tables["nation"],
        name_prefix="%", nation_name=nn, min_qty=mq,
    )
    ddf = con.execute(f"""
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = '{nn}'
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%'
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_suppkey, l_partkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > {mq})
        ORDER BY s_name
    """)
    s = sdf.toPandas()
    assert len(s) > 0, "parameterization must exercise the non-empty path"
    _assert_match(sdf, ddf)


@given(
    nn=st.sampled_from(_SUPPLIER_NATIONS),
    gd=st.sampled_from([5, 15, 30, 60]),
)
@settings(**SETTINGS)
def test_q21_matches_any_nation(tables, con, nn, gd):
    sdf = tpch.q21_waiting_suppliers(
        tables["supplier"], tables["lineitem"], tables["orders"], tables["nation"],
        nation_name=nn, grace_days=gd,
    )
    ddf = con.execute(f"""
        WITH per_supp AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_shipdate > o_orderdate + INTERVAL {gd} DAY
                       THEN 1 ELSE 0 END) AS supp_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey),
        per_order AS (
            SELECT l_orderkey AS g_orderkey, count(*) AS n_supp,
                   sum(supp_late) AS n_late_supp
            FROM per_supp GROUP BY l_orderkey)
        SELECT s_name, count(*) AS numwait
        FROM per_supp
        JOIN per_order ON l_orderkey = g_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE supp_late = 1 AND n_supp > 1 AND n_late_supp = 1
          AND n_name = '{nn}'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """)
    _assert_match(sdf, ddf)


def test_q21_nonempty_path_exercised(tables, con):
    """At least one configuration returns rows at sf0.001 (NATION_3,
    grace 5d probed non-empty)."""
    s = tpch.q21_waiting_suppliers(
        tables["supplier"], tables["lineitem"], tables["orders"],
        tables["nation"], nation_name="NATION_3", grace_days=5,
    ).toPandas()
    assert len(s) > 0
