"""Plan-property tests: assert the physical plans the 100 TB design
depends on — dims broadcast, predicates/pruning reach the parquet scan,
top-k avoids a global sort, aggregation is single-shuffle."""

from __future__ import annotations

from sparkstreamingtwitter_presidential_spark.plans import plan_audit
from sparkstreamingtwitter_presidential_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"
REGISTRY = load_all()


def _audit(spark, name):
    return plan_audit(REGISTRY[name].fn(spark, SF_DIR))


def test_dim_joins_broadcast(spark):
    a = _audit(spark, "join_broadcast_dims")
    assert a.n_broadcast_joins == 2
    assert a.n_sortmerge_joins == 0
    # fact side never shuffles before the aggregate: only the final
    # aggregate exchange remains
    assert a.n_exchanges <= 1


def test_q1_pushdown_and_pruning(spark):
    a = _audit(spark, "tpch_q1_pricing_summary")
    assert any("l_shipdate" in f for f in a.pushed_filters)
    # scan reads only the 7 needed columns of 11
    assert a.read_schemas and "l_orderkey" not in a.read_schemas[0]
    assert a.n_exchanges == 1  # partial agg -> single shuffle -> final agg


def test_topk_uses_take_ordered_not_global_sort(spark):
    a = _audit(spark, "sort_top_orders")
    assert a.has_take_ordered
    assert a.n_exchanges == 0  # no shuffle at all for top-k


def test_selective_filter_pushdown_in_q3(spark):
    a = _audit(spark, "tpch_q3_shipping_priority")
    assert any("BUILDING" in f or "c_mktsegment" in f for f in a.pushed_filters)
