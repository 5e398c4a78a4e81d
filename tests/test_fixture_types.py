"""Type-drift canary (r3 lesson): the events fixture's physical ``ts``
type changed under us (TIMESTAMP(NANOS) -> tz-naive timestamp[us], which
Spark 4.x infers as TIMESTAMP_NTZ) and 7 graded queries plus bench.py
died with cryptic per-query AnalysisExceptions. This test pins the exact
post-``load_table`` dtype map for every fixture table, so the next silent
environment or fixture change fails HERE in seconds with a readable
message instead.
"""

from __future__ import annotations

import pytest

from sparkstreamingtwitter_presidential_spark.io import TABLES, load_table

from conftest import SF_DIR

# The normalized logical schema every query in the engine is written
# against. If a fixture regenerates with different physical types,
# load_table must keep producing exactly this.
EXPECTED_DTYPES = {
    "region": {
        "r_regionkey": "int",
        "r_name": "string",
    },
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # THE r3 regression: must never be _ntz/bigint
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("name", TABLES)
def test_fixture_dtypes_pinned(spark, name):
    got = dict(load_table(spark, SF_DIR, name).dtypes)
    want = EXPECTED_DTYPES[name]
    assert got == want, (
        f"fixture type drift in table {name!r}:\n"
        f"  got : {got}\n"
        f"  want: {want}\n"
        "If the fixture legitimately changed, update load_table's "
        "normalization (io.py) so queries still see the types above, "
        "then update this map only if the LOGICAL schema truly changed."
    )
