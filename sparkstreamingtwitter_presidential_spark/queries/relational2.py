"""Second relational sweep: ranking windows, GROUPING SETS, lateral
explode over array columns, and a bucketized range self-join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query


@query(
    "window_ranking_functions",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               ntile(4) OVER w AS quartile,
               floor(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank,
               floor(cume_dist() OVER w * 10000.0 + 0.5) / 10000.0 AS cume,
               dense_rank() OVER w AS drank
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="ntile / percent_rank / cume_dist / dense_rank in one window",
)
def window_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    rnd = lambda c: F.floor(c * 10000.0 + F.lit(0.5)) / 10000.0  # noqa: E731
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w)).alias("pct_rank"),
        rnd(F.cume_dist().over(w)).alias("cume"),
        F.dense_rank().over(w).alias("drank"),
    )


@query(
    "grouping_sets_orders",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="explicit GROUPING SETS with grouping() indicator columns",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               grouping(o_orderstatus) + 2 * grouping(o_orderpriority) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "lateral_explode_embedding_dims",
    oracle="""
        SELECT vec_id, dim - 1 AS dim,
               floor(val * 10000.0 + 0.5) / 10000.0 AS val
        FROM (SELECT vec_id, unnest(embedding::DOUBLE[]) AS val,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings WHERE embedding IS NOT NULL)
        WHERE dim <= 4
    """,
    doc="posexplode an array column (first 4 dims per vector)",
)
def lateral_explode_embedding_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    return (
        e.select("vec_id", F.posexplode("embedding").alias("dim", "fval"))
        .filter(F.col("dim") <= 3)
        .select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            (F.floor(F.col("fval").cast("double") * 10000.0 + F.lit(0.5)) / 10000.0).alias("val"),
        )
    )


@query(
    "events_from_json_struct",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod
        FROM events WHERE props IS NOT NULL
    """,
    doc="from_json with an explicit schema (vs get_json_object string path)",
)
def events_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = ev.select(
        "event_id", F.from_json("props", "k BIGINT").alias("j")
    )
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") % 10).alias("k_mod"),
    )


@query(
    "sample_events_seeded",
    oracle=None,  # Bernoulli sampling is engine-specific; rows-only
    doc="seeded TABLESAMPLE: deterministic within Spark, ~1% of events",
)
def sample_events_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .sample(fraction=0.01, seed=42)
        .select("event_id", "event_type")
    )


@query(
    "range_join_close_events",
    oracle="""
        SELECT a.event_id AS id_a, b.event_id AS id_b
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
    doc=(
        "range self-join (events of same user within 5 min) via time-bucket "
        "equi-join + filter — the bucketize-range-join scale pattern"
    ),
)
def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    gap = 300  # seconds
    # Bucketize: a pair within `gap` lives in the same or adjacent bucket,
    # so probe buckets {b, b+1} with an equi-join on (user_id, bucket)
    # instead of a full per-user cross product (the non-equi condition
    # alone would force a broadcast-nested-loop at scale).
    a = ev.select(
        F.col("event_id").alias("id_a"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("ts_a"),
        F.explode(
            F.array(
                (F.col("ts").cast("long") / gap).cast("long"),
                (F.col("ts").cast("long") / gap).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("u2"),
        F.col("ts").alias("ts_b"),
        (F.col("ts").cast("long") / gap).cast("long").alias("bucket2"),
    )
    return (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("bucket") == F.col("bucket2")))
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES"))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
