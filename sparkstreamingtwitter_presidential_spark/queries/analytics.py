"""The built-in analytics surface the new engine claims beyond the
reference (SURVEY.md §2.3-2.4 "new engine" rows): joins of every flavor,
sorts, set ops, distinct aggregation, window functions, rollup/cube,
pivot, JSON extraction, and batch event-time windowing.

Everything is a declarative DataFrame/SQL plan — Catalyst picks broadcast
vs sort-merge, pushes filters into the parquet scans, prunes columns.
Explicit ``F.broadcast`` hints mark dimension tables that stay tiny at
every scale factor (region/nation/supplier), so the 100 TB plan never
shuffles the fact table for those joins.

Float determinism: every double aggregate is rounded identically in both
engines; every LIMIT rides a total order with a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query


# ---------------------------------------------------------------------------
# TPC-H Q1 shape: the canonical scan -> filter -> wide hash-aggregate.
# Partial aggregation (map-side combine) makes this shuffle only one row
# per (group x partition) — the safest possible 100 TB aggregation.
# ---------------------------------------------------------------------------
@query(
    "tpch_q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               floor((sum(l_quantity)) * 100 + 0.5) / 100                                    AS sum_qty,
               floor((sum(l_extendedprice)) * 100 + 0.5) / 100                               AS sum_base_price,
               floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100            AS sum_disc_price,
               floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100 AS sum_charge,
               floor((avg(l_quantity)) * 10000 + 0.5) / 10000                                    AS avg_qty,
               floor((avg(l_extendedprice)) * 10000 + 0.5) / 10000                               AS avg_price,
               floor((avg(l_discount)) * 10000 + 0.5) / 10000                                    AS avg_disc,
               count(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: filter -> 8-agg hash aggregate",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.floor((F.sum("l_quantity")) * 100 + F.lit(0.5)) / 100).alias("sum_qty"),
            (F.floor((F.sum("l_extendedprice")) * 100 + F.lit(0.5)) / 100).alias("sum_base_price"),
            (F.floor((F.sum(disc_price)) * 100 + F.lit(0.5)) / 100).alias("sum_disc_price"),
            (F.floor((F.sum(disc_price * (1 + F.col("l_tax")))) * 100 + F.lit(0.5)) / 100).alias("sum_charge"),
            (F.floor((F.avg("l_quantity")) * 10000 + F.lit(0.5)) / 10000).alias("avg_qty"),
            (F.floor((F.avg("l_extendedprice")) * 10000 + F.lit(0.5)) / 10000).alias("avg_price"),
            (F.floor((F.avg("l_discount")) * 10000 + F.lit(0.5)) / 10000).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Broadcast dimension join: fact customer joined to nation+region dims.
# nation (25 rows) and region (5 rows) are broadcast at ANY scale — the
# customer table never shuffles.
# ---------------------------------------------------------------------------
@query(
    "join_broadcast_dims",
    oracle="""
        SELECT r.r_name AS region_name,
               count(*) AS n_customers,
               floor((sum(c.c_acctbal)) * 100 + 0.5) / 100 AS total_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    doc="broadcast-hash join of fact to tiny dims; zero fact-side shuffle pre-agg",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            (F.floor((F.sum("c_acctbal")) * 100 + F.lit(0.5)) / 100).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way fact join + group + top-k. The two big tables
# (orders, lineitem) sort-merge/shuffled-hash join on o_orderkey; AQE
# handles skew. Top-k via ordered limit (TakeOrderedAndProject — no full
# sort at scale).
# ---------------------------------------------------------------------------
@query(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey AS order_key,
               floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, order_key
        LIMIT 10
    """,
    doc="TPC-H Q3: selective dim filter -> big-big join -> agg -> top-k",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("l_orderkey").alias("order_key"), F.col("o_orderdate"))
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .select(
            "order_key",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), F.col("order_key"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Semi / anti joins — EXISTS / NOT EXISTS without materializing the right
# side's columns (the build side only ships its join key).
# ---------------------------------------------------------------------------
@query(
    "join_semi_customers_with_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="left-semi join (EXISTS)",
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="left-anti join (NOT EXISTS)",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Outer join preserving unmatched rows (order count per customer incl. 0).
# ---------------------------------------------------------------------------
@query(
    "join_left_outer_order_counts",
    oracle="""
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    doc="left-outer join + count(col) NULL semantics (0 for no matches)",
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Sort + limit: TakeOrderedAndProject, not a global sort.
# ---------------------------------------------------------------------------
@query(
    "sort_top_orders",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
    doc="multi-column sort with limit (top-k, no full sort at scale)",
)
def sort_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------
@query(
    "setop_union_nations",
    oracle="""
        SELECT n_nationkey AS nationkey FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        UNION
        SELECT n_nationkey AS nationkey FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    doc="UNION (distinct) of two key sets",
)
def setop_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT of customer and supplier nations",
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT: nations with customers but no suppliers",
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct), as opposed to exceptAll


# ---------------------------------------------------------------------------
# Distinct aggregation (exact; approx_count_distinct is engine-specific so
# it ships as a capability, not an oracle query).
# ---------------------------------------------------------------------------
@query(
    "distinct_agg_parts_per_supplier",
    oracle="""
        SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_suppkey
    """,
    doc="count(distinct) alongside plain count in one aggregate",
)
def distinct_agg_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions: top-k per group and running totals.
# ---------------------------------------------------------------------------
@query(
    "window_topk_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    doc="top-3 orders per customer via row_number window",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_sum_quantity",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(sum(l_quantity) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber,
                            l_quantity, l_extendedprice, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS running_qty
        FROM lineitem
    """,
    doc=(
        "running sum per supplier ordered by ship date (ROWS frame). "
        "Summed as BIGINT (quantities are whole): double prefix sums are "
        "association-dependent — DuckDB's windowed sum uses tree "
        "aggregation, Spark accumulates sequentially, and at 600k rows "
        "some prefix lands on a rounding boundary. The CAST wraps the "
        "whole window expression: DuckDB's windowed sum over any integer "
        "type OUTPUTS HUGEINT, whose repr ('Decimal(7093)') hash-diverges "
        "from Spark's BIGINT even when values match"
    ),
)
def window_running_sum_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the synthetic lineitem is not TPC-H-strict: (l_orderkey,
    # l_linenumber) has a duplicate at sf0.1, so the order includes the
    # measure columns to stay total (prefix sums need a total order to
    # be deterministic across engines)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_partkey",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(F.col("l_quantity").cast("long")).over(w).alias("running_qty"),
        )
    )


@query(
    "window_lag_order_gap_days",
    oracle="""
        SELECT o_custkey, o_orderkey,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    """,
    doc="lag window: days since the customer's previous order",
)
def window_lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), prev).cast("long").alias("gap_days"),
        )
    )


# ---------------------------------------------------------------------------
# Rollup / cube — multi-grain aggregates in one pass.
# ---------------------------------------------------------------------------
@query(
    "rollup_lineitem_status",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP: (flag,status), (flag), () grains in one aggregate",
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), (F.floor((F.sum("l_quantity")) * 100 + F.lit(0.5)) / 100).alias("sum_qty"))
    )


@query(
    "cube_orders_status_priority",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE: all four grouping grains in one pass",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Pivot — oracle expressed as portable conditional aggregation.
# ---------------------------------------------------------------------------
@query(
    "pivot_returnflag_by_linestatus",
    oracle="""
        SELECT l_returnflag,
               floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100 + 0.5) / 100 AS O,
               floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100 + 0.5) / 100 AS F
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="pivot on l_linestatus (explicit value list keeps the plan single-pass)",
)
def pivot_returnflag_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    return df.select("l_returnflag", (F.floor((F.col("O")) * 100 + F.lit(0.5)) / 100).alias("O"), (F.floor((F.col("F")) * 100 + F.lit(0.5)) / 100).alias("F"))


# ---------------------------------------------------------------------------
# JSON extraction from the events props column.
# ---------------------------------------------------------------------------
@query(
    "events_json_extract",
    oracle="""
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    doc="get_json_object over the props JSON-string column",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.get_json_object("props", "$.k").cast("long").alias("k"))
    )


# ---------------------------------------------------------------------------
# Batch event-time windowing: tumbling hourly stats (the batch twin of the
# streaming window in streaming/windows.py — same grouping semantics).
# ---------------------------------------------------------------------------
@query(
    "events_hourly_tumbling",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n,
               floor((sum(value)) * 100 + 0.5) / 100 AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="tumbling 1h event-time window as batch groupBy (streaming twin exists)",
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), (F.floor((F.sum("value")) * 100 + F.lit(0.5)) / 100).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured ingestion (Spark 4's open-variant type): parse
# heterogeneous JSON ONCE into the binary variant encoding, then typed
# path extraction — the schema-flexible ingestion shape for event streams
# whose payloads vary by producer. Contrast events_json_extract
# (get_json_object re-parses the string per path; variant parses once and
# extraction is a binary traversal).
# ---------------------------------------------------------------------------
@query(
    "events_variant_extract",
    oracle="""
        WITH synth AS (
            SELECT event_id, event_type,
                   CASE
                     WHEN event_id % 3 = 0 THEN
                       '{"a": {"b": ' || CAST(value AS VARCHAR)
                       || '}, "tag": "' || event_type || '"}'
                     WHEN event_id % 3 = 1 THEN
                       '{"a": {"b": null}, "n": ' || CAST(user_id AS VARCHAR)
                       || '}'
                     ELSE
                       '[' || CAST(event_id AS VARCHAR) || ', '
                       || CAST(user_id AS VARCHAR) || ']'
                   END AS payload
            FROM events
        ), ext AS (
            SELECT event_type,
                   CAST(json_extract(payload, '$.a.b') AS DOUBLE) AS ab,
                   CAST(json_extract(payload, '$.n') AS BIGINT) AS n,
                   CAST(json_extract(payload, '$[0]') AS BIGINT) AS arr0,
                   json_extract_string(payload, '$.tag') AS tag
            FROM synth
        )
        SELECT event_type,
               COUNT(ab) AS n_ab,
               FLOOR(SUM(COALESCE(ab, 0)) * 100 + 0.5) / 100 AS sum_ab,
               CAST(SUM(COALESCE(n, 0)) AS BIGINT) AS sum_n,
               CAST(SUM(COALESCE(arr0, 0)) AS BIGINT) AS sum_arr0,
               COUNT(tag) AS n_tag
        FROM ext GROUP BY event_type
    """,
    doc=(
        "NEW r6: VARIANT ingestion — deterministically synthesized "
        "heterogeneous JSON (three producer shapes: nested object, "
        "null-valued nested field + top-level int, bare array) parsed "
        "ONCE via parse_json into Spark 4's binary variant encoding, "
        "then typed variant_get path extraction ($.a.b double, $.n "
        "long, $[0] array index, $.tag string) with missing-path nulls; "
        "aggregated per event_type against a json_extract oracle — "
        "fails if variant parsing, path traversal, typed casts, or "
        "null-vs-missing semantics diverge"
    ),
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    payload = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.lit('{"a": {"b": '),
                F.col("value").cast("string"),
                F.lit('}, "tag": "'),
                F.col("event_type"),
                F.lit('"}'),
            ),
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                F.lit('{"a": {"b": null}, "n": '),
                F.col("user_id").cast("string"),
                F.lit("}"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("["),
                F.col("event_id").cast("string"),
                F.lit(", "),
                F.col("user_id").cast("string"),
                F.lit("]"),
            )
        )
    )
    v = F.parse_json(payload)
    ext = ev.select(
        "event_type",
        F.variant_get(v, "$.a.b", "double").alias("ab"),
        F.variant_get(v, "$.n", "long").alias("n"),
        F.variant_get(v, "$[0]", "long").alias("arr0"),
        F.variant_get(v, "$.tag", "string").alias("tag"),
    )
    return ext.groupBy("event_type").agg(
        F.count("ab").alias("n_ab"),
        (F.floor(F.sum(F.coalesce(F.col("ab"), F.lit(0.0))) * 100 + F.lit(0.5)) / 100).alias("sum_ab"),
        F.sum(F.coalesce(F.col("n"), F.lit(0))).alias("sum_n"),
        F.sum(F.coalesce(F.col("arr0"), F.lit(0))).alias("sum_arr0"),
        F.count("tag").alias("n_tag"),
    )
