#!/usr/bin/env python
"""Round-15 optimization measurement harness.

    python scripts/measure_r15.py time  <name> [name ...]
    python scripts/measure_r15.py snap  <outfile> <name> [name ...]

``time``: per query, reports build (fn call = plan construction +
any staging/drain the build performs), first noop-sink execution, and
min-of-3 noop executions — separating Catalyst/staging cost from
steady-state execution (guide §1.4: the noop sink computes every
column, unlike bench's count()).

``snap``: collects each query's full output (sorted by every column)
and writes a JSON snapshot — the before/after equality evidence for
any query whose plan is restructured this round.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from sparkstreamingtwitter_presidential_spark.queries import load_all  # noqa: E402
from sparkstreamingtwitter_presidential_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    spark = get_spark("measure-r15")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # warm up JVM + listing like bench does
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    return spark


def cmd_time(names: list[str]) -> None:
    spark = _spark()
    registry = load_all()
    for name in names:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"r15-measure:{name}")
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        runs = []
        for _ in range(3):
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t1)
        # rebuild-to-run: what bench actually pays per repeat
        t2 = time.perf_counter()
        q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t_rebuild = time.perf_counter() - t2
        print(
            f"{name}: build={t_build:.3f} first_noop={runs[0]:.3f} "
            f"min_noop={min(runs):.3f} rebuild_run={t_rebuild:.3f}"
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


def cmd_snap(outfile: str, names: list[str]) -> None:
    spark = _spark()
    registry = load_all()
    out = {}
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        cols = df.columns
        rows = [[repr(v) for v in r] for r in df.collect()]
        rows.sort()
        out[name] = {"columns": cols, "rows": rows}
        print(f"snapped {name}: {len(rows)} rows")
    with open(outfile, "w") as f:
        json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        cmd_time(sys.argv[2:])
    elif mode == "snap":
        cmd_snap(sys.argv[2], sys.argv[3:])
    else:
        raise SystemExit(f"unknown mode {mode}")
