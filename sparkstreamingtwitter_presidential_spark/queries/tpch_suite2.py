"""TPC-H suite completion (round 4): the remaining canonical query
shapes expressible over the fixture's column subset — Q7 (two-nation
volume shipping), Q8 (national market share), Q9 (product-type profit,
adapted: no partsupp table, so profit = discounted revenue), Q13
(customer order-count distribution), Q15 (top supplier by windowed
revenue, scalar-max subquery), Q17 (small-quantity threshold via a
correlated per-part average), Q22 (high-balance customers with no
orders; country code adapted from c_nationkey — the fixture carries no
c_phone).

Queries omitted as NOT expressible over the fixture (recorded here so
the suite's boundary is explicit, not silent): Q2/Q11/Q16/Q20 need the
``partsupp`` table; Q12/Q21 need ``l_shipmode``/``l_commitdate``/
``l_receiptdate``; the fixture ships none of those columns (TESTDATA.md).

Scale shapes: every query is joins + grouped aggregation with the tiny
dims (nation/region/supplier at fixed cardinality) explicitly broadcast
— the fact tables never shuffle for a dim join; scalar subqueries
(Q15 max, Q17 per-part avg, Q22 global avg) become one extra aggregate
over an already-shuffled grouping or a broadcast scalar, never a
correlated per-row rescan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query


def _round2(col: Column) -> Column:
    """Engine-portable 2-decimal floor-round (see DESIGN.md)."""
    return F.floor(col * 100 + F.lit(0.5)) / 100


@query(
    "tpch_q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               floor(sum(volume) * 100 + 0.5) / 100 AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l.l_shipdate) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="Q7: bidirectional two-nation shipping volume by year; both "
    "nation joins broadcast, disjunctive cross-dim predicate",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
        SELECT o_year,
               floor(sum(CASE WHEN nation = 'NATION_3' THEN volume
                              ELSE 0 END)
                     / sum(volume) * 10000 + 0.5) / 10000 AS mkt_share
        FROM (
            SELECT year(o.o_orderdate) AS o_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        )
        GROUP BY o_year
    """,
    doc="Q8: NATION_3's share of ASIA PROMO-part revenue by order year "
    "— 7-table join, conditional aggregation ratio",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share = F.sum(
        F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    ) / F.sum(vol)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.floor(share * 10000 + F.lit(0.5)) / 10000).alias("mkt_share"))
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100
                     + 0.5) / 100 AS profit
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_type = 'STANDARD'
        GROUP BY nation, o_year
    """,
    doc="Q9 shape (adapted: no partsupp table in the fixture, so profit "
    "is discounted revenue): per-supplier-nation, per-year profit on "
    "STANDARD parts",
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            _round2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("profit")
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    doc="Q13 (adapted: fixture has no o_comment to exclude): order-count "
    "histogram over a left outer join — customers with zero orders count "
    "in the 0 bucket",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   floor(sum(l_extendedprice * (1 - l_discount)) * 100
                         + 0.5) / 100 AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="Q15: top supplier by Q1-1996 revenue; the scalar max is a "
    "broadcast of one row, not a re-aggregation per supplier",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _round2(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
        SELECT floor(sum(l.l_extendedprice) / 7.0 * 100 + 0.5) / 100
                   AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
          )
    """,
    doc="Q17 (adapted: brand filter only, fixture has no p_container): "
    "revenue from below-one-fifth-of-average-quantity orders; the "
    "correlated average decorrelates into one grouped aggregate + join",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    # decorrelated: per-part threshold computed once, joined back.
    # Aggregate BEFORE the brand filter prunes nothing (thresholds are
    # per-part), so restrict to the brand's parts first via a semi join.
    # No explicit broadcast here: the brand subset is small at test SFs
    # (Catalyst auto-broadcasts it) but grows with the part table, and a
    # forced broadcast would OOM at cluster scale — size-based strategy
    # + AQE picks the right join per deployment.
    brand_keys = p.select("p_partkey")
    thresholds = (
        l.join(brand_keys, l.l_partkey == brand_keys.p_partkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.floor(F.sum("l_extendedprice") / 7.0 * 100 + F.lit(0.5)) / 100)
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
        SELECT cntrycode, count(*) AS numcust,
               floor(sum(acctbal) * 100 + 0.5) / 100 AS totacctbal
        FROM (
            SELECT c.c_nationkey % 5 AS cntrycode, c.c_acctbal AS acctbal
            FROM customer c
            WHERE c.c_acctbal > (
                SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
            )
            AND NOT EXISTS (
                SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            )
        )
        GROUP BY cntrycode
    """,
    doc="Q22 (adapted: country code from c_nationkey%5, fixture has no "
    "c_phone): high-balance customers who never ordered — scalar-avg "
    "subquery + anti join",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.pmod("c_nationkey", F.lit(5)).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _round2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
