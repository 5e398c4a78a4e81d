"""Scale-pattern correctness + plan-shape tests: salted aggregation is
value-identical to the plain groupBy; bucketed joins run with zero
exchanges."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators.scale import (
    bucketed_join,
    salted_groupby_count,
    write_bucketed,
    write_date_partitioned,
)
from sparkstreamingtwitter_presidential_spark.plans import plan_audit

SF_DIR = "/root/testdata/sf0.001"


def test_salted_groupby_equals_plain(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = {(r.l_suppkey, r.n) for r in
             li.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()}
    salted = {(r.l_suppkey, r.n) for r in
              salted_groupby_count(li, "l_suppkey").collect()}
    assert salted == plain and len(plain) > 0


def test_date_partitioned_write_prunes(spark):
    from sparkstreamingtwitter_presidential_spark.io import load_table

    path = f"/tmp/part_events_{uuid.uuid4().hex[:8]}"
    try:
        ev = load_table(spark, SF_DIR, "events")
        write_date_partitioned(ev, path)
        scan = spark.read.parquet(path).filter(F.col("dt") == "2024-01-05")
        a = plan_audit(scan)
        assert a.partition_filters, f"no partition pruning:\n{a.text[:1500]}"
        assert any("dt" in f for f in a.partition_filters)
        # row-level filters did NOT have to do the work
        want = ev.filter(F.to_date("ts") == "2024-01-05").count()
        assert scan.count() == want and want > 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_bucketed_join_runs_without_exchange(spark):
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    try:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, lt, "o_orderkey")
        write_bucketed(lineitem, rt, "o_orderkey")
        joined = bucketed_join(spark, lt, rt, "o_orderkey")
        a = plan_audit(joined)
        assert a.n_exchanges == 0, f"expected zero shuffles, plan:\n{a.text[:2000]}"
        # and it's still a correct join
        want = orders.join(lineitem, "o_orderkey").count()
        assert joined.count() == want
    finally:
        for t in (lt, rt):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_salted_join_equals_plain_join(spark):
    """Salting is a physical rewrite only: inner and left results must
    equal the plain join exactly, including unmatched fact rows (left)
    and duplicate fact keys."""
    from pyspark.sql import Row

    from sparkstreamingtwitter_presidential_spark.operators.scale import salted_join

    fact = spark.createDataFrame(
        [Row(k=i % 5, v=i) for i in range(200)]  # key 0..4, heavy reuse
        + [Row(k=99, v=-1)]  # unmatched in dim
    )
    dim = spark.createDataFrame([Row(k=i, name=f"d{i}") for i in range(5)])

    for how in ("inner", "left"):
        plain = {(r["k"], r["v"], r["name"])
                 for r in fact.join(dim, "k", how).collect()}
        salted = {(r["k"], r["v"], r["name"])
                  for r in salted_join(fact, dim, "k", 7, how).collect()}
        assert salted == plain, how
    # plain inner drops the unmatched row, left keeps it null-extended
    assert (99, -1, None) in {
        (r["k"], r["v"], r["name"])
        for r in salted_join(fact, dim, "k", 7, "left").collect()
    }


def test_salted_join_rejects_right_full(spark):
    import pytest
    from pyspark.sql import Row

    from sparkstreamingtwitter_presidential_spark.operators.scale import salted_join

    df = spark.createDataFrame([Row(k=1)])
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner|left"):
            salted_join(df, df, "k", 4, how)


def test_global_row_numbers_equals_window(spark):
    from pyspark.sql import Window
    from sparkstreamingtwitter_presidential_spark.operators.scale import global_row_numbers

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    ours = {
        (r.doc_id, r.row_num)
        for r in global_row_numbers(d, "doc_id", n_partitions=8).collect()
    }
    window = {
        (r.doc_id, r.row_num)
        for r in d.select(
            "doc_id",
            F.row_number().over(Window.orderBy("doc_id")).alias("row_num"),
        ).collect()
    }
    assert ours == window and len(ours) == 500
    spark.catalog.clearCache()


def test_global_row_numbers_plan_has_no_single_partition(spark):
    from pyspark.sql import Window
    from sparkstreamingtwitter_presidential_spark.operators.scale import global_row_numbers

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    ours = global_row_numbers(d, "doc_id", n_partitions=8)
    plan = ours._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the naive window DOES plan one — the thing this operator removes
    naive = d.select(
        "doc_id", F.row_number().over(Window.orderBy("doc_id")).alias("rn")
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan
    spark.catalog.clearCache()


def test_global_row_numbers_more_partitions_than_rows(spark):
    from sparkstreamingtwitter_presidential_spark.operators.scale import global_row_numbers

    d = spark.createDataFrame([(3,), (1,), (2,)], "k int")
    rows = sorted(
        (r.k, r.row_num)
        for r in global_row_numbers(d, "k", n_partitions=8).collect()
    )
    assert rows == [(1, 1), (2, 2), (3, 3)]
    spark.catalog.clearCache()


def test_global_row_numbers_empty_input(spark):
    from sparkstreamingtwitter_presidential_spark.operators.scale import global_row_numbers

    d = spark.createDataFrame([], "k int")
    assert global_row_numbers(d, "k", n_partitions=4).count() == 0
    spark.catalog.clearCache()


def test_scoped_global_row_numbers_releases_cache(spark):
    """The context manager must free the persisted range-partitioned
    intermediate on exit (deterministic release, not LRU)."""
    from sparkstreamingtwitter_presidential_spark.operators.scale import (
        scoped_global_row_numbers,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.range(1000).select(F.col("id").alias("k"))
    with scoped_global_row_numbers(df, "k") as numbered:
        rows = numbered.orderBy("k").limit(3).collect()
        assert [r.row_num for r in rows] == [1, 2, 3]
        assert jsc.getPersistentRDDs().size() > before
    assert jsc.getPersistentRDDs().size() == before


def test_global_row_numbers_handle_out(spark):
    from sparkstreamingtwitter_presidential_spark.operators.scale import (
        global_row_numbers,
    )

    handle: list = []
    df = spark.range(100).select(F.col("id").alias("k"))
    out = global_row_numbers(df, "k", handle_out=handle)
    assert out.count() == 100
    assert len(handle) == 1
    handle[0].unpersist()  # caller-driven release path
