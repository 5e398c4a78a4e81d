"""Batch sessionization + approximate sketches + skew-safe aggregation.

Batch sessionization uses the lag/gap cumulative-sum window pattern
(the guide's classic) — same session definition as the streaming
session_window path, so the two oracles share SQL shape. Approximate
sketches (HLL distinct, approx quantiles) are engine-specific by
design -> rows-only. Salted aggregation is value-identical to plain
groupBy and oracle-checked as such."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.operators.scale import salted_groupby_count
from sparkstreamingtwitter_presidential_spark.queries.registry import query

GAP_S = 30 * 60


@query(
    "sessionize_batch_lag_cumsum",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             >= {GAP_S}::BIGINT * 1000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                               ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               count(*) AS n_events,
               floor(sum(value) * 100 + 0.5) / 100 AS total_value
        FROM sess
        GROUP BY user_id, session_id
    """,
    doc="batch sessionization: lag + gap flag + cumulative sum + per-session agg",
)
def sessionize_batch_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # exact microsecond arithmetic: cast-to-long truncates to whole
    # seconds, which disagrees with sub-second gaps at a 30-min boundary
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(gap >= GAP_S * 1_000_000, 1).otherwise(0).alias("new_session"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wc))
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.count("*").alias("n_events"),
        # exact half-up via floor: Spark round() is HALF_UP, DuckDB's
        # disagrees on .xx5 boundaries — cross-engine rule, see DESIGN.md
        (F.floor(F.sum("value") * 100 + 0.5) / 100).alias("total_value"),
    )


@query(
    "salted_groupby_count_parts",
    oracle="""
        SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey
    """,
    doc="skew-safe two-phase salted aggregation == plain groupBy count",
)
def salted_groupby_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return salted_groupby_count(load_table(spark, sf_dir, "lineitem"), "l_partkey")


@query(
    "approx_sketches",
    oracle=None,  # HLL / KLL sketches are engine-specific by construction
    doc="approx_count_distinct (HLL) + approx quantiles per return flag",
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count("*").alias("n"),
    )


@query(
    "salted_join_order_segment",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n,
               FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    doc=(
        "NEW r5: skew-resistant salted equi-join — the fact side "
        "(orders) is salted, the dim side (customer) replicated once "
        "per salt, the join runs on (key, salt) so a hot key spreads "
        "over n_salts reducers; aggregating the joined result must "
        "equal the oracle's PLAIN join+aggregate exactly (salting is a "
        "physical rewrite, never a semantic one) — the manual twin of "
        "AQE skew-split for pre-shuffle skew and stable partitionings"
    ),
)
def salted_join_order_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.scale import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, "o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        (F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)) / 100).alias(
            "total_price"
        ),
    )


@query(
    "scale_global_row_numbers",
    oracle="""
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS row_num
        FROM documents
    """,
    doc=(
        "NEW r5: ROW_NUMBER() OVER (ORDER BY key) computed WITHOUT the "
        "Exchange SinglePartition a global window sort plans — range "
        "shuffle + per-partition count pass (metadata-sized collect) + "
        "map-only offset numbering; must equal the oracle's true global "
        "ROW_NUMBER exactly (the plan-pin test asserts no single-"
        "partition exchange in the physical plan)"
    ),
)
def scale_global_row_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.scale import global_row_numbers

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return global_row_numbers(d, "doc_id", n_partitions=16)


@query(
    "sketch_user_rollup",
    oracle=None,  # HLL estimates are implementation-defined (Apache
    # DataSketches seeds/registers); the <3% relative-error and
    # merge-equals-direct contracts live in tests/test_sketches.py
    doc=(
        "NEW r5: mergeable sketch artifacts — per (day, event_type) HLL "
        "sketches built in ONE scan, then rolled up per event_type by "
        "MERGING stored sketches (cost ∝ slices, raw data never "
        "re-read): the incremental distinct-counting pattern; exact row "
        "sums ride alongside the estimates"
    ),
)
def sketch_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.sketches import (
        build_sketches,
        merge_estimates,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    sketches = build_sketches(ev, ["day", "event_type"], "user_id")
    return merge_estimates(sketches, ["event_type"])


@query(
    "sketch_event_type_overlap",
    oracle=None,  # theta estimates are implementation-defined; the
    # planted-overlap error bounds live in tests/test_sketches.py
    doc=(
        "NEW r6: theta-sketch slice overlap — per-event_type theta "
        "sketches over user_id built in ONE scan, then every pairwise "
        "audience overlap + Jaccard estimated by intersecting STORED "
        "sketches (constant-size binary ops over slices, never a re-join "
        "of the raw data): the set-operation pattern HLL cannot express"
    ),
)
def sketch_event_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.sketches import (
        build_theta_sketches,
        slice_overlap_estimates,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sketches = build_theta_sketches(ev, ["event_type"], "user_id")
    return slice_overlap_estimates(sketches, "event_type")


@query(
    "sketch_length_quantiles",
    oracle=None,  # KLL estimates are implementation-defined; the
    # rank-error bounds vs exact percentiles live in tests/test_sketches.py
    doc=(
        "NEW r6: KLL quantile-sketch artifacts — per-source sketches of "
        "doc length built in ONE scan, then corpus p50/p90/p99 answered "
        "by FOLDING stored sketches (pairwise kll_sketch_merge via a "
        "higher-order aggregate over the slice-bounded sketch list): "
        "the mergeable-percentile pattern completing the sketch family "
        "(HLL distincts, theta set algebra, KLL quantiles)"
    ),
)
def sketch_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.sketches import (
        build_kll_sketches,
        merge_quantile_estimates,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    sk = build_kll_sketches(docs, ["source"], "n_chars")
    return merge_quantile_estimates(sk)


@query(
    "sketch_rollup_exact_agg",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS est_within_5pct
        FROM events GROUP BY event_type
    """,
    doc=(
        "NEW r7 (r6 verdict item 9): the sketch family's driver-graded "
        "twin — per (day, event_type) HLL sketches rolled up per "
        "event_type by MERGING stored sketches, with every value-graded "
        "column EXACT (row sums ride the sketch build; exact distincts "
        "from a parallel countDistinct) and the implementation-defined "
        "estimate surfaced as a 5%-relative-error boolean the oracle "
        "pins TRUE (HLL at lgK=12 is deterministic and ~0.8% typical, "
        "so the bound is stable): a hash-graded proof that the sketch "
        "build + union-merge pipeline neither loses rows nor degrades "
        "past its documented error bound"
    ),
)
def sketch_rollup_exact_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.sketches import (
        build_sketches,
        merge_estimates,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    rolled = merge_estimates(
        build_sketches(ev, ["day", "event_type"], "user_id"), ["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return rolled.join(exact, "event_type").select(
        "event_type",
        "n_rows",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            < 0.05
        ).alias("est_within_5pct"),
    )
