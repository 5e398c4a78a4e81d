"""Advanced relational coverage: as-of join, TPC-H Q5/Q6 shapes,
unpivot, exact percentiles, correlated/scalar subqueries, HAVING."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.operators.asof import asof_join_last
from sparkstreamingtwitter_presidential_spark.queries.registry import query


# ---------------------------------------------------------------------------
# As-of join: every click gets the user's latest purchase value at or
# before it. Oracle = DuckDB's native ASOF JOIN.
# ---------------------------------------------------------------------------
@query(
    "asof_join_last_purchase",
    oracle="""
        WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
                        WHERE event_type = 'click'),
        purchases AS (SELECT user_id, ts, value FROM events
                      WHERE event_type = 'purchase')
        SELECT c.event_id, c.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
               floor((p.value) * 10000 + 0.5) / 10000 AS value_asof
        FROM clicks c
        ASOF LEFT JOIN purchases p
            ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="backward as-of join via union+window (one shuffle); DuckDB ASOF oracle",
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join_last(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        (F.floor((F.col("value_asof")) * 10000 + F.lit(0.5)) / 10000).alias("value_asof"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: pure filter + single aggregate — the pushdown poster
# child (every predicate reaches the parquet scan).
# ---------------------------------------------------------------------------
@query(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6: multi-predicate scan + global agg, all filters pushed",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.floor((F.sum(F.col("l_extendedprice") * F.col("l_discount"))) * 100 + F.lit(0.5)) / 100).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-table join — region/nation broadcast, the three fact
# tables join on keys, revenue per nation.
# ---------------------------------------------------------------------------
@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name AS nation_name,
               floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5: 6-table join, local-supplier condition, broadcast dims",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            (F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Unpivot via stack(): wide -> long.
# ---------------------------------------------------------------------------
@query(
    "unpivot_customer_balances",
    oracle="""
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey' AS metric, c_nationkey::DOUBLE AS val FROM customer
    """,
    doc="unpivot (stack): two measure columns into (metric, val) rows",
)
def unpivot_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, "
            "'nationkey', cast(c_nationkey as double)) AS (metric, val)"
        ),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated, matching DuckDB quantile_cont).
# ---------------------------------------------------------------------------
@query(
    "percentiles_order_totalprice",
    oracle="""
        SELECT o_orderpriority,
               floor((quantile_cont(o_totalprice, 0.5)) * 10000 + 0.5) / 10000 AS p50,
               floor((quantile_cont(o_totalprice, 0.9)) * 10000 + 0.5) / 10000 AS p90,
               floor((quantile_cont(o_totalprice, 0.99)) * 10000 + 0.5) / 10000 AS p99
        FROM orders GROUP BY o_orderpriority
    """,
    doc="exact interpolated percentiles per group (percentile == quantile_cont)",
)
def percentiles_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        (F.floor((F.expr("percentile(o_totalprice, 0.5)")) * 10000 + F.lit(0.5)) / 10000).alias("p50"),
        (F.floor((F.expr("percentile(o_totalprice, 0.9)")) * 10000 + F.lit(0.5)) / 10000).alias("p90"),
        (F.floor((F.expr("percentile(o_totalprice, 0.99)")) * 10000 + F.lit(0.5)) / 10000).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery + HAVING: customers whose account balance
# exceeds their nation's average.
# ---------------------------------------------------------------------------
@query(
    "subquery_above_nation_avg",
    oracle="""
        SELECT c_custkey, c_nationkey, floor((c_acctbal) * 100 + 0.5) / 100 AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="correlated scalar subquery (decorrelated by Catalyst into a join)",
)
def subquery_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, floor((c_acctbal) * 100 + 0.5) / 100 AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "having_high_volume_suppliers",
    oracle="""
        SELECT l_suppkey, count(*) AS n_lines
        FROM lineitem
        GROUP BY l_suppkey
        HAVING count(*) > 500
    """,
    doc="GROUP BY + HAVING over the fact table",
)
def having_high_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") > 500)
    )
