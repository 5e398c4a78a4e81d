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

from contextlib import contextmanager

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


def global_row_numbers(
    df: DataFrame,
    order_col: str,
    row_col: str = "row_num",
    n_partitions: int = 32,
    handle_out: list | None = None,
) -> DataFrame:
    """ROW_NUMBER() OVER (ORDER BY order_col) without the single-
    partition sort.

    Spark's ``row_number().over(Window.orderBy(...))`` with no
    PARTITION BY plans an ``Exchange SinglePartition`` — every row of a
    100 TB table funnels through ONE task. This operator produces the
    identical numbering (asserted against the window plan and the
    DuckDB twin) with a range shuffle instead:

      1. ``repartitionByRange(order_col)`` + ``sortWithinPartitions``
         — partition k holds a contiguous key range, all ranges in
         partition order, every partition sorted. Persisted, because
         the range boundaries come from a sample job and both passes
         below must see the SAME partitioning.
      2. count pass: rows per partition — ``n_partitions`` rows to the
         driver (metadata-sized, never data-sized).
      3. number pass: map-only ``mapInPandas`` adds
         ``exclusive_prefix_offset[pid] + local position`` (1-based).

    The numbering is total iff ``order_col`` is a total order (unique
    key); with duplicate keys Spark's own window ROW_NUMBER is equally
    tie-arbitrary. The persisted intermediate backs the returned frame
    — long-lived pipelines should use ``scoped_global_row_numbers``
    (context manager: releases the blocks deterministically on exit)
    or pass ``handle_out`` to get the persisted frame to
    ``.unpersist()`` themselves.
    """
    numbered, _ranged = _global_row_numbers(
        df, order_col, row_col, n_partitions
    )
    if handle_out is not None:
        handle_out.append(_ranged)
    return numbered


def _global_row_numbers(
    df: DataFrame,
    order_col: str,
    row_col: str,
    n_partitions: int,
) -> tuple[DataFrame, DataFrame]:
    ranged = (
        df.repartitionByRange(n_partitions, F.col(order_col))
        .sortWithinPartitions(order_col)
        .persist()
    )
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("__pid"))
        .count()
        .collect()
    )
    sizes = {r["__pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(row_col, T.LongType(), False)]
    )
    keep = [f.name for f in df.schema.fields]
    tagged = ranged.withColumn("__pid", F.spark_partition_id())

    def number(batches):
        local = 0
        off = None
        for b in batches:
            if len(b) == 0:
                continue
            if off is None:
                off = offsets[int(b["__pid"].iloc[0])]
            out = b[keep].copy()
            start = off + local + 1
            out[row_col] = range(start, start + len(b))
            local += len(b)
            yield out

    return tagged.mapInPandas(number, schema=out_schema), ranged


@contextmanager
def scoped_global_row_numbers(
    df: DataFrame,
    order_col: str,
    row_col: str = "row_num",
    n_partitions: int = 32,
):
    """Context-managed ``global_row_numbers``: yields the numbered
    frame and UNPERSISTS the range-partitioned intermediate on exit,
    so a long-lived pipeline releases the storage deterministically
    instead of waiting for LRU eviction. Consume (write/collect) the
    frame inside the block — after exit it recomputes from scratch."""
    numbered, ranged = _global_row_numbers(df, order_col, row_col, n_partitions)
    try:
        yield numbered
    finally:
        ranged.unpersist()
