"""Scale-pattern operators: the shuffle-shaping techniques a 100 TB
deployment leans on, packaged as reusable transforms with correctness
oracles (each is semantically identical to its naive counterpart — the
tests assert exactly that).

  salted_groupby_agg   two-phase aggregation over a salted key for
                       skewed distributions: shuffle 1 spreads a hot
                       key over ``n_salts`` reducers, shuffle 2 merges
                       the partials (tiny: n_salts rows per key).
  write_bucketed /     co-located joins: pre-bucket both sides on the
  bucketed_join_plan   join key so repeated joins run with ZERO
                       exchange (verified via plans.plan_audit).
  salted_join          skew-resistant big-big equi-join: fact salted,
                       dim replicated once per salt, join on
                       (key, salt) — inner/left only.

AQE's skew-join splitting handles join-side skew automatically; manual
salting remains the tool for aggregation-side skew and for stable
production plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Write with a ``dt`` date partition column derived from the event
    time — the canonical 100 TB layout: a date-filtered query then scans
    only the matching directories (partition pruning), which plan audits
    see as ``PartitionFilters`` instead of row-level filters."""
    (
        df.withColumn("dt", F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )


def salted_groupby_count(
    df: DataFrame, key: str, n_salts: int = 16, count_alias: str = "n"
) -> DataFrame:
    """groupBy(key).count() computed in two phases over a salted key.

    Phase 1 groups on (key, salt) — a key receiving 1e9 rows spreads
    over n_salts reducers instead of hot-spotting one. Phase 2 sums the
    at-most-n_salts partials per key. Result is EXACTLY groupBy+count
    (asserted against the plain plan in tests and the DuckDB oracle).
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias(count_alias))


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist ``df`` as a bucketed managed table: rows are hash-
    partitioned into ``n_buckets`` files per partition ON WRITE, so any
    later equi-join or aggregation on ``bucket_col`` between tables
    bucketed the same way requires no exchange at query time — the
    write-once shuffle is amortized over every subsequent join."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket column. With matching
    bucketing, Catalyst plans SortMergeJoin with NO Exchange on either
    side (assert via plans.plan_audit(...).n_exchanges == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``fact`` rows get a salt, the ``dim``
    side is replicated once per salt value, and the join key becomes
    (on, salt) — a hot key's 1e9 fact rows spread over ``n_salts``
    reducers instead of hot-spotting one. Result is EXACTLY the plain
    join (each fact row matches only its own salt's replica; asserted
    against the DuckDB oracle).

    Use when the dim side is too large to broadcast but far smaller
    than the fact side — the price is dim x n_salts replication, the
    manual twin of AQE's skew-join split for the cases AQE cannot see
    (pre-shuffle skew, non-AQE engines, stateful reuse of one
    partitioning). Only inner and left joins are salt-correct: a
    right/full join would emit one null-extended row per UNMATCHED dim
    replica (n_salts copies), so those raise."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner|left, got {how!r}: right/full "
            "would duplicate unmatched dim rows once per salt"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(replicated, [*keys, "__salt"], how).drop("__salt")
