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


def test_headline_scalars_survive_driver_tail_truncation():
    """r12 verdict item 4: the driver archives only the LAST 2000 chars
    of bench stdout. The artifact's headline scalars (metric / value /
    sf / clean / error_count) must therefore be the FINAL keys of the
    JSON line, after the per-query map, so truncation can never eat
    them — even at 200 headline queries."""
    import json

    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    timings = {f"query_{i:03d}_with_a_long_name": 1.234 for i in range(200)}
    errors = {"query_err": "RuntimeError: boom"}
    line = json.dumps(mod.format_output(timings, errors, 0.1))
    tail = line[-2000:]
    for key in ('"metric"', '"value"', '"sf"', '"clean"', '"error_count"'):
        assert key in tail, f"{key} lost to tail truncation"
    assert tail.rstrip().endswith("}")
    # and the artifact still parses as-is when NOT truncated
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total_sec"
    assert parsed["value"] == round(sum(timings.values()), 3)
    assert parsed["clean"] is False and parsed["error_count"] == 1


def test_bench_sidecar_mirrors_stdout_artifact(tmp_path):
    """r16 (VERDICT r15 item 8): the same JSON the bench prints is also
    written to bench_last.json so a truncated stdout capture can never
    null the next round's comparison. The sidecar must parse to the
    exact artifact dict, and an unwritable path must not raise (a
    read-only checkout must not fail the bench)."""
    import json

    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.format_output({"q": 1.5}, {}, 0.1)
    target = tmp_path / "bench_last.json"
    mod.write_sidecar(out, str(target))
    assert json.loads(target.read_text()) == out
    # best-effort on unwritable paths: no exception
    mod.write_sidecar(out, str(tmp_path / "no_such_dir" / "x.json"))
