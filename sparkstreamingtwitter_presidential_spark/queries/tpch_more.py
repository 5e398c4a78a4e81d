"""More TPC-H-shaped coverage adapted to the fixture schema: late-order
counts (Q4 shape: EXISTS with a derived date predicate), returned-item
revenue (Q10), promo revenue share (Q14: conditional aggregation over a
join), large-volume customers (Q18: IN-subquery over a grouped HAVING),
and a disjunctive multi-predicate join (Q19 shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query


@query(
    "tpch_q4_late_orders",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o.o_orderpriority
    """,
    doc="Q4 shape: EXISTS over lineitem with a cross-table date predicate",
)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(late.select("l_orderkey").distinct(),
               o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "tpch_q10_returned_item_revenue",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="Q10: revenue lost to returns per customer, top 20",
)
def tpch_q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_custkey", "c_name")
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_revenue_share",
    oracle="""
        SELECT floor(
                 100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount))
                 * 10000.0 + 0.5) / 10000.0 AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="Q14: promo revenue share via conditional aggregation over a join",
)
def tpch_q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    pct = F.lit(100.0) * F.sum(promo) / F.sum(rev)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg((F.floor(pct * 10000.0 + F.lit(0.5)) / 10000.0).alias("promo_pct"))
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey,
               floor((sum(l.l_quantity)) * 100 + 0.5) / 100 AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        )
        GROUP BY c.c_custkey, o.o_orderkey
    """,
    doc="Q18: IN-subquery over grouped HAVING (large-volume orders)",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(l.select(F.col("l_orderkey").alias("lk"), "l_quantity"),
              F.col("o_orderkey") == F.col("lk"))
        .groupBy("c_custkey", "o_orderkey")
        .agg((F.floor((F.sum("l_quantity")) * 100 + F.lit(0.5)) / 100).alias("total_qty"))
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle="""
        SELECT floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
               count(*) AS n
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 40)
    """,
    doc="Q19 shape: disjunction of conjunctive ranges across the join",
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#5")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond1 | cond2)
        .agg(
            (F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"),
            F.count("*").alias("n"),
        )
    )
