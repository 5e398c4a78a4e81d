"""r10 scale spot-checks (r9 verdict item 7) for the two new read
paths, recorded in DESIGN.md like the r7/r8 dedup slope audits:

* TRANSFORM PRUNING — a day(ts)-partitioned Iceberg table at D ∈
  {10, 100, 1000} distinct days: the kept-file count for a one-day
  skip_ranges read must stay ~1/D of the table (exact pruning), and
  the driver-side planning wall-clock must grow at most linearly in D
  (it is a metadata walk over D manifest entries).

* DV ANTI-JOIN — a Delta table with a deletion-vector backlog of K ∈
  {20k, 200k, 2M (driver-path ceiling), 3M (executor decode path)}:
  snapshot-read wall-clock must grow at most linearly in K, and the
  2M→3M step must not cliff when the decode moves executor-side.

Run: python scripts/scale_spotcheck_r10.py  (quiet machine; ~5 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE = "/tmp/ssp_spotcheck_r10"


def spark_session():
    return (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def transform_pruning(spark):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        read_iceberg,
        write_iceberg,
    )

    out = []
    for days in (10, 100, 1000):
        t = os.path.join(BASE, f"ice_days_{days}")
        shutil.rmtree(t, ignore_errors=True)
        rows_per_day = 200
        df = (
            spark.range(days * rows_per_day)
            .withColumn(
                "ts",
                F.to_timestamp(
                    F.date_add(F.lit("2020-01-01"), (F.col("id") % days).cast("int"))
                ),
            )
            .withColumn("v", F.col("id").cast("double"))
        )
        write_iceberg(df, t, partition_by=["day(ts)"])
        import datetime as dt

        lo = dt.datetime(2020, 1, 5)
        hi = lo + dt.timedelta(days=1) - dt.timedelta(microseconds=1)
        t0 = time.time()
        pruned = read_iceberg(spark, t, skip_ranges={"ts": (lo, hi)})
        kept = len(pruned.inputFiles())
        plan_s = time.time() - t0
        total = len(read_iceberg(spark, t).inputFiles())
        n = pruned.filter(F.to_date("ts") == F.lit(lo.date())).count()
        out.append(
            {
                "days": days,
                "files_total": total,
                "files_kept": kept,
                "plan_s": round(plan_s, 3),
                "rows": n,
            }
        )
        print("transform_pruning", out[-1], flush=True)
    return out


def dv_anti_join(spark):
    import sparkstreamingtwitter_presidential_spark.sources.delta as delta_mod
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _replay_log,
        read_delta,
        write_delta,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dv import (
        write_dv_file,
    )

    n_rows = 4_000_000
    t = os.path.join(BASE, "delta_dv")
    shutil.rmtree(t, ignore_errors=True)
    df = spark.range(n_rows).withColumn("v", F.col("id").cast("double"))
    write_delta(df.repartition(8), t)
    snap0 = _replay_log(t, None)
    files = sorted(snap0.files)
    # per-file physical row counts (positions must stay in range)
    import pyarrow.parquet as pq

    sizes = {
        p: pq.ParquetFile(os.path.join(t, p)).metadata.num_rows
        for p in files
    }
    out = []
    for k in (20_000, 200_000, 2_000_000, 3_000_000):
        # fresh DV commit each round: remove+re-add with a vector of
        # the first ceil(k/len(files)) positions per file
        snap = _replay_log(t, None)
        per = -(-k // len(files))
        lines = [json.dumps({"commitInfo": {"operation": "DELETE",
                                            "timestamp": 1700000000000}})]
        if snap.protocol_action.get("minReaderVersion", 1) < 3:
            lines.append(json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"]}}))
        remaining = k
        for p in files:
            take = min(per, remaining, sizes[p])
            remaining -= take
            if take <= 0:
                continue
            a = dict(snap.files[p])
            a.pop("deletionVector", None)
            a["deletionVector"] = write_dv_file(t, range(take))
            lines.append(json.dumps({"remove": {
                "path": p, "deletionTimestamp": 1700000000000,
                "dataChange": True}}))
            lines.append(json.dumps({"add": a}))
        commit = os.path.join(
            t, "_delta_log", f"{snap.version + 1:020d}.json"
        )
        with open(commit, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        t0 = time.time()
        n = read_delta(spark, t).count()
        wall = time.time() - t0
        path = (
            "driver" if k <= delta_mod._DV_PAIRS_DRIVER_MAX else "executor"
        )
        out.append(
            {"backlog": k, "path": path, "read_s": round(wall, 2),
             "rows": n, "expect": n_rows - k}
        )
        print("dv_anti_join", out[-1], flush=True)
        assert n == n_rows - k, (n, n_rows - k)
    return out


if __name__ == "__main__":
    os.makedirs(BASE, exist_ok=True)
    spark = spark_session()
    spark.sparkContext.setLogLevel("ERROR")
    res = {
        "transform_pruning": transform_pruning(spark),
        "dv_anti_join": dv_anti_join(spark),
    }
    print(json.dumps(res))
