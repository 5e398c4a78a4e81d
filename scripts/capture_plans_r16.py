#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/r16/.

Usage:
    python scripts/capture_plans_r16.py before [name ...]
    python scripts/capture_plans_r16.py after  [name ...]

With no names, captures every registry query (batch queries get their
logical-plan explain; streaming/drain queries return a materialized
result whose plan is the sink read — recorded as such). The files are
the round-15 optimization evidence: <query>_<tag>.txt under plans/r16/.

Plans are captured WITHOUT executing the query where possible: the
DataFrame is built and explained, not acted on. Queries whose build
itself drains a stream or stages tables will pay that cost once.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from sparkstreamingtwitter_presidential_spark.queries import load_all  # noqa: E402
from sparkstreamingtwitter_presidential_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO_ROOT, "plans", "r16")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture-r16")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    registry = load_all()
    targets = names or list(registry)
    for name in targets:
        q = registry[name]
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        try:
            df = q.fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"ok   {name}")
        except Exception as e:  # noqa: BLE001 - capture must survive
            with open(path, "w") as f:
                f.write(f"ERROR capturing plan: {type(e).__name__}: {e}\n")
            print(f"ERR  {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
