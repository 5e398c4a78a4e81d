"""Bench-contract invariants (r12, verdict item 3 made structural).

The recurring gap across rounds 10 and 11: a query entered the graded
window without entering `bench.py`'s HEADLINE, so new surfaces shipped
with no recorded perf floor. HEADLINE-ON-GRADE is now a tested policy —
rotating a query into `registry.GRADED_FIRST` without adding it to
HEADLINE (floor recorded in BASELINE.md) fails this suite, not a later
verdict.
"""

import importlib.util
import os

from sparkstreamingtwitter_presidential_spark.queries.registry import (
    GRADED_FIRST,
    load_all,
)

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _headline() -> list[str]:
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.HEADLINE


def test_every_graded_query_is_bench_headlined():
    headline = set(_headline())
    missing = [n for n in GRADED_FIRST if n not in headline]
    assert not missing, (
        "graded-window queries without a bench perf floor (add them to "
        f"bench.py HEADLINE and record floors in BASELINE.md): {missing}"
    )


def test_every_headline_query_is_registered():
    registry = load_all()
    unknown = [n for n in _headline() if n not in registry]
    assert not unknown, f"HEADLINE names not in the registry: {unknown}"


def test_headline_has_no_duplicates():
    names = _headline()
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, f"duplicate HEADLINE entries: {dupes}"
