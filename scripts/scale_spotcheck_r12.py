"""r12 scale spot-check (r11 verdict item 8): the ICEBERG Puffin-DV
READ path at large vector cardinalities, across the driver-vs-executor
decode switch (`iceberg._PAIRS_DRIVER_MAX` = 100k pairs; the Delta twin
was measured in r10, this is the Iceberg side).

One v3 table (4M rows, 8 files), three forged DV backlogs: 50k pairs
(driver-side LocalRelation build), 500k and 3M pairs (executor-side
distributed decode). For each: cold `read_iceberg` count+sum, compared
to the DV-free read of the same table. PASS = correct survivor counts,
no cliff at the 100k switch (the executor path's ratio grows smoothly
with backlog, never a step), and the 3M read stays within small
multiples of the plain scan.

Run: python scripts/scale_spotcheck_r12.py  (quiet machine; ~3 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("spotcheck-r12")
        .getOrCreate()
    )


def main() -> None:
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _entries_and_deletes_for_snapshot,
        _load_metadata,
        _PAIRS_DRIVER_MAX,
        _snapshot,
        forge_v3_dv_commit,
        read_iceberg,
        write_iceberg,
    )

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    N = 4_000_000
    base = tempfile.mkdtemp(prefix="spot_r12_")
    print(f"# Iceberg Puffin-DV read at scale (N={N:,} rows, 8 files)")
    print("backlog_pairs path          read_s  ratio_vs_plain  survivors_ok")
    try:
        plain_t = os.path.join(base, "plain")
        write_iceberg(
            spark.range(N).selectExpr(
                "id", "cast(id * 1.5 as double) as v"
            ).repartition(8),
            plain_t,
            format_version=3,
        )
        t0 = time.perf_counter()
        row = read_iceberg(spark, plain_t).agg(
            F.count("*"), F.sum("id")
        ).collect()[0]
        plain_s = time.perf_counter() - t0
        assert row[0] == N
        print(f"{'0':>12} {'(no DVs)':<13} {plain_s:6.2f} {'1.00':>14}")

        for k in (50_000, 500_000, 3_000_000):
            t = os.path.join(base, f"dv{k}")
            write_iceberg(
                spark.range(N).selectExpr(
                    "id", "cast(id * 1.5 as double) as v"
                ).repartition(8),
                t,
                format_version=3,
            )
            meta = _load_metadata(t)
            entries, _ = _entries_and_deletes_for_snapshot(
                t, _snapshot(meta, None)
            )
            # delete the first ceil(k / 8) positions of each file —
            # position lists, no data read needed
            per = -(-k // len(entries))
            deletes, assigned = {}, 0
            for e in entries:
                fp = e["data_file"]["file_path"]
                n = int(e["data_file"]["record_count"])
                take = min(per, n - 1, k - assigned)  # never 100%-delete
                if take <= 0:
                    continue
                deletes[fp] = list(range(take))
                assigned += take
            forge_v3_dv_commit(t, deletes)
            t0 = time.perf_counter()
            row = read_iceberg(spark, t).agg(
                F.count("*"), F.sum("id")
            ).collect()[0]
            dv_s = time.perf_counter() - t0
            ok = row[0] == N - assigned
            path = (
                "driver" if assigned <= _PAIRS_DRIVER_MAX else "executor"
            )
            print(
                f"{assigned:>12,} {path:<13} {dv_s:6.2f} "
                f"{dv_s / plain_s:>14.2f} {ok!s:>13}"
            )
            assert ok, (row[0], N - assigned)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print("PASS")


if __name__ == "__main__":
    main()
