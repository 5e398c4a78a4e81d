"""Scalar-function coverage sweeps: string, date/time, conditional and
null-handling builtins — one wide query per family, every output column
oracle-checked against DuckDB. These pin the cross-engine semantics an
analytics user relies on (trim/pad, regexp capture, date arithmetic,
case/least/greatest, coalesce/nullif)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query


@query(
    "sweep_string_functions",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS up,
               lower(p_brand) AS lo,
               length(p_name) AS len,
               substr(p_name, 1, 5) AS sub5,
               trim(' ' || p_brand || ' ') AS trimmed,
               lpad(p_brand, 12, '*') AS padded,
               replace(p_type, ' ', '_') AS underscored,
               regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
               concat_ws('/', p_brand, p_type) AS joined,
               reverse(p_brand) AS rev,
               strpos(p_name, 'a') AS a_pos
        FROM part
    """,
    doc="string builtins sweep over part",
)
def sweep_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("underscored"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.concat_ws("/", "p_brand", "p_type").alias("joined"),
        F.reverse("p_brand").alias("rev"),
        F.instr("p_name", "a").cast("long").alias("a_pos"),
    )


@query(
    "sweep_date_functions",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS y,
               month(o_orderdate) AS m,
               day(o_orderdate) AS d,
               dayofweek(o_orderdate) + 1 AS dow,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
        FROM orders
    """,
    doc="date/time builtins sweep over orders (dow normalized: Spark is 1=Sunday)",
)
def sweep_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),  # 1=Sunday; duck dayofweek 0=Sunday
        F.date_format(F.date_add("o_orderdate", 30), "yyyy-MM-dd").alias("plus30"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(
            "o_orderdate", F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_95"),
    )


@query(
    "sweep_conditional_null_functions",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'low'
                    ELSE 'high' END AS balance_band,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
               least(c_acctbal, 1000.0) AS capped_low,
               greatest(c_acctbal, 0.0) AS floored,
               CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS is_positive,
               ifnull(NULL, c_nationkey) AS nk
        FROM customer
    """,
    doc="case/when, nullif+coalesce, least/greatest, ifnull sweep",
)
def sweep_conditional_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.least("c_acctbal", F.lit(1000.0)).alias("capped_low"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("floored"),
        F.when(F.col("c_acctbal") >= 0, 1).otherwise(0).alias("is_positive"),
        F.ifnull(F.lit(None), F.col("c_nationkey")).alias("nk"),
    )


@query(
    "sweep_array_functions",
    oracle="""
        SELECT vec_id,
               len(embedding) AS n_dims,
               -- ::DOUBLE casts matter: FLOAT * 10000.0(DECIMAL) stays FLOAT
               -- in DuckDB, while Spark computes in double after the cast
               floor(embedding[1]::DOUBLE * 10000.0 + 0.5) / 10000.0 AS first_dim,
               floor(list_max(embedding)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS max_dim,
               floor(list_min(embedding)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS min_dim,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               floor(list_reduce(list_prepend(0.0::DOUBLE,
                         list_transform(embedding[1:8], x -> x::DOUBLE)),
                     (a, x) -> a + x) * 10000.0 + 0.5) / 10000.0 AS head_sum
        FROM embeddings WHERE embedding IS NOT NULL
    """,
    doc="array builtins sweep: size/element_at/min/max/filter/slice/aggregate",
)
def sweep_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    rnd = lambda c: F.floor(c * 10000.0 + F.lit(0.5)) / 10000.0  # noqa: E731
    head = F.slice("embedding", 1, 8)
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        rnd(F.element_at("embedding", 1).cast("double")).alias("first_dim"),
        rnd(F.array_max("embedding").cast("double")).alias("max_dim"),
        rnd(F.array_min("embedding").cast("double")).alias("min_dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        rnd(
            F.aggregate(head, F.lit(0.0), lambda a, x: a + x.cast("double"))
        ).alias("head_sum"),
    )


@query(
    "join_full_outer_nation_coverage",
    oracle="""
        SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
               coalesce(cn.n_customers, 0) AS n_customers,
               coalesce(sn.n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
              FROM customer GROUP BY 1) cn
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
              FROM supplier GROUP BY 1) sn
          ON cn.nationkey = sn.nationkey
    """,
    doc="full outer join of two aggregates with null-coalesced counts",
)
def join_full_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    joined = c.alias("cn").join(
        s.alias("sn"), F.col("cn.nationkey") == F.col("sn.nationkey"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("cn.nationkey"), F.col("sn.nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@query(
    "cross_join_region_pairs",
    oracle="""
        SELECT a.r_name AS region_a, b.r_name AS region_b
        FROM region a CROSS JOIN region b
        WHERE a.r_regionkey < b.r_regionkey
    """,
    doc="explicit cross join (tiny dims only — 5x5) with pair filter",
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    a, b = r.alias("a"), r.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))
    )
