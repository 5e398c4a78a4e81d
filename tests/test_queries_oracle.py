"""Oracle-differential suite: every registered query with a DuckDB oracle
is executed on Spark and DuckDB over the same sf0.001 parquet and compared
(row count + column names + order-insensitive values). This mirrors the
driver's CORRECTNESS gate so failures surface locally first."""

from __future__ import annotations

import pytest

from sparkstreamingtwitter_presidential_spark.queries import load_all
from tests.conftest import SF_DIR, assert_df_matches_oracle

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert_df_matches_oracle(df, oracle, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    # Driver's weaker check: runs, stable schema, >= 0 rows.
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["event_type", "n"]


def test_contract_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert e.FLAGSHIP in qs


def test_graded_window_is_full_and_oracled():
    """The driver grades exactly the FIRST 50 registry entries; every
    slot must be spent on an oracled query (a rows-only entry in the
    window wastes a correctness check), all GRADED_FIRST names must
    exist, and the head of the registry must be GRADED_FIRST verbatim.

    No exceptions: the r14 verdict (item 1) oracled the last rows-only
    window entry (streaming_state_v2_running_totals), so the window is
    100% hash-checked again."""
    import __spark_entry__ as e
    from sparkstreamingtwitter_presidential_spark.queries.registry import GRADED_FIRST

    qs, os_ = e.queries(), e.oracle_sql()
    names = list(qs)
    assert len(GRADED_FIRST) == 50
    assert names[:50] == GRADED_FIRST
    missing_oracle = [n for n in names[:50] if n not in os_]
    assert not missing_oracle, f"rows-only queries in graded window: {missing_oracle}"


def test_every_oracled_query_has_been_graded():
    """Cumulative driver coverage: every oracled query must appear in the
    CURRENT graded window or a past round's window (GRADED_HISTORY) — a
    never-graded oracled query is unverified-by-driver debt (round-2
    verdict finding #1). New oracled queries must be rotated into
    GRADED_FIRST before (or in the round) they ship."""
    import __spark_entry__ as e
    from sparkstreamingtwitter_presidential_spark.queries.registry import (
        GRADED_FIRST,
        GRADED_HISTORY,
    )

    ever_graded = set(GRADED_FIRST)
    for window in GRADED_HISTORY.values():
        ever_graded.update(window)
    never = sorted(set(e.oracle_sql()) - ever_graded)
    assert not never, f"oracled queries never in any graded window: {never}"
