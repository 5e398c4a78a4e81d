"""Shared pytest fixtures: one local SparkSession, a DuckDB oracle
connection over the same parquet fixtures, and a differential-compare
helper mirroring the driver's check (row count + column names +
order-insensitive values, with float tolerance for debuggability)."""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from sparkstreamingtwitter_presidential_spark.io import TABLES, table_path  # noqa: E402
from sparkstreamingtwitter_presidential_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("sparkstreamingtwitter-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        p = table_path(SF_DIR, name)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    """Normalize a cell for order-insensitive comparison. Floats compare
    EXACTLY (no tolerance): the driver value-hashes raw values, so every
    query is designed to be bit-identical across engines — a tolerance
    here would hide divergence the driver will flag.

    Values are TYPE-TAGGED: the driver hashes reprs, where
    Decimal('7093') != 7093 != 7093.0 even though Python's == collapses
    all three. Round 1 shipped two driver hash failures (DuckDB windowed
    sum(BIGINT) -> HUGEINT -> Decimal) that this harness waved through
    for exactly that reason."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, int):
        return ("i", str(v))
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if hasattr(v, "isoformat"):  # datetime/date
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return tuple((x is None, str(x)) for x in row)


def assert_df_matches_oracle(spark_df, con, sql):
    """Differential check: same column names (sorted), same row multiset.

    The oracle side is fetched via Arrow, NOT fetchall(): fetchall()
    downcasts DuckDB HUGEINT to Python int, hiding exactly the
    Decimal-vs-int repr divergence the driver's value hash flags (the
    round-1 `window_running_sum_quantity` failure reproduced locally
    only through the Arrow path: HUGEINT -> decimal128 -> Decimal)."""
    tbl = con.execute(sql).arrow()
    want_cols = list(tbl.schema.names)
    want = [tuple(d[c] for c in want_cols) for d in tbl.to_pylist()]
    got_rows = spark_df.collect()
    got_cols = spark_df.columns

    assert sorted(got_cols) == sorted(want_cols), (
        f"column mismatch: spark={sorted(got_cols)} oracle={sorted(want_cols)}"
    )
    assert len(got_rows) == len(want), (
        f"row count mismatch: spark={len(got_rows)} oracle={len(want)}"
    )

    g_order = [got_cols.index(c) for c in sorted(got_cols)]
    w_order = [want_cols.index(c) for c in sorted(want_cols)]
    got_set = sorted(
        (tuple(_norm(r[i]) for i in g_order) for r in got_rows), key=_key
    )
    want_set = sorted(
        (tuple(_norm(r[i]) for i in w_order) for r in want), key=_key
    )
    for i, (g, w) in enumerate(zip(got_set, want_set)):
        assert g == w, f"row {i} mismatch:\n  spark : {g}\n  oracle: {w}"
