"""r11 scale spot-checks (r10 verdict item 10) for the round's new
surfaces, recorded in DESIGN.md like the r10 transform-pruning / DV
anti-join audits:

* SCOPED EQUALITY-DELETE READ — an identity-partitioned Iceberg table
  at P ∈ {20, 200, 2000} partition tuples with one partition-scoped
  equality delete live: the delete application must stay a CONSTANT
  factor over the plain scan (victim resolution is a driver dict walk;
  the anti-join's build side never grows with P). The headline number
  is dominated by tiny-file scheduling in local mode — compare the
  ratio column, not the absolute.

* CDF STREAM DRAIN — the same 6,000 change rows split over C ∈
  {3, 10, 30} commits, drained cold with readChangeFeed=true:
  per-commit cost must FALL (fixed stream startup amortizes; planning
  is one log walk per micro-batch over only that commit's cdc files).

* DV-DML PROBE PLAN WIDTH — a 100-partition v3 table's DV-delete
  probe must plan as ONE FileScan node (the _read_files(with_path_pos)
  hive path), never a per-partition union.

Run: python scripts/scale_spotcheck_r11.py  (quiet machine; ~4 min)
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
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def scoped_eq_sweep(spark: SparkSession) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        read_iceberg,
        write_iceberg,
    )

    print("— scoped equality-delete read sweep —")
    for nparts in (20, 200, 2000):
        t = f"/tmp/ssp_r11_eq_{nparts}"
        tp = f"/tmp/ssp_r11_eqplain_{nparts}"
        for path, with_delete in ((tp, False), (t, True)):
            shutil.rmtree(path, ignore_errors=True)
            n = nparts * 10
            df = spark.range(n).selectExpr(
                "id", f"cast(id % {nparts} as string) as g",
                "cast(id as double) as v",
            )
            write_iceberg(df, path, partition_by=["g"])
            if with_delete:
                ddir = os.path.join(path, "data", "eqdel")
                os.makedirs(ddir, exist_ok=True)
                dfile = os.path.join(ddir, "eq.parquet")
                pq.write_table(
                    pa.table({"id": pa.array([0], pa.int64())}), dfile
                )
                eq = {
                    "content": 2, "file_path": dfile,
                    "file_format": "PARQUET", "partition": {"g": "0"},
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(dfile),
                    "lower_bounds": None, "upper_bounds": None,
                    "equality_ids": [1],
                }
                meta = I._load_metadata(path)
                sch = I._schema_for(meta, meta.get("current-schema-id", 0))
                pf = I._partition_fields(meta, sch)
                I._commit_snapshot(
                    path, meta, sch, pf, added_files=[],
                    existing_entries=[], deleted_entries=[],
                    carry_prior_manifests=True, operation="delete",
                    added_delete_files=[eq],
                )
        read_iceberg(spark, t).count()  # warm
        t0 = time.time(); read_iceberg(spark, t).count()
        with_del = time.time() - t0
        read_iceberg(spark, tp).count()
        t0 = time.time(); read_iceberg(spark, tp).count()
        plain = time.time() - t0
        print(
            f"  P={nparts}: read+delete {with_del:.2f}s  plain "
            f"{plain:.2f}s  overhead {with_del / max(plain, 1e-9):.2f}x"
        )
        shutil.rmtree(t, ignore_errors=True)
        shutil.rmtree(tp, ignore_errors=True)


def cdf_drain_sweep(spark: SparkSession) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        write_delta,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        update_delta,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_stream_ds import (
        register_delta_stream,
    )

    register_delta_stream(spark)
    print("— CDF stream drain sweep —")
    for ncommits in (3, 10, 30):
        t = f"/tmp/ssp_r11_cdf_{ncommits}"
        shutil.rmtree(t, ignore_errors=True)
        df = spark.range(2000).selectExpr("id", "cast(id as double) as v")
        write_delta(
            df.repartition(2), t, mode="append",
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        for i in range(ncommits - 1):
            update_delta(
                spark, t, {"v": "v + 1"},
                f"id % {ncommits - 1} = {i % (ncommits - 1)}",
            )
        scratch = tempfile.mkdtemp()
        rows: list[int] = []
        t0 = time.time()
        q = (
            spark.readStream.format("delta_native")
            .option("readChangeFeed", "true").load(t)
            .writeStream.outputMode("append")
            .foreachBatch(lambda d, b: rows.append(d.count()))
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .start()
        )
        q.processAllAvailable(); q.stop(); q.awaitTermination(30)
        dt = time.time() - t0
        print(
            f"  C={ncommits}: {sum(rows)} change rows in {dt:.2f}s "
            f"({dt / ncommits:.2f}s/commit)"
        )
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(t, ignore_errors=True)


def dv_probe_plan_width(spark: SparkSession) -> None:
    from sparkstreamingtwitter_presidential_spark.sources import iceberg_dv as dv
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        write_iceberg,
    )

    print("— DV probe plan width at 100 partitions —")
    t = "/tmp/ssp_r11_dvwide"
    shutil.rmtree(t, ignore_errors=True)
    df = spark.range(5000).selectExpr(
        "id", "cast(id % 100 as string) as g", "cast(id * 1.5 as double) as val"
    )
    write_iceberg(df, t, format_version=3, partition_by=["g"])
    *_, scan = dv._plan(spark, t, "audit")
    probe = scan.filter(F.expr("id % 100 = 3")).select(
        dv._PATH_COL, dv._POS_COL
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    print(
        f"  FileScan nodes: {plan.count('FileScan')}  "
        f"Union nodes: {plan.count('Union')} (want 1 / 0)"
    )
    shutil.rmtree(t, ignore_errors=True)


if __name__ == "__main__":
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    scoped_eq_sweep(spark)
    cdf_drain_sweep(spark)
    dv_probe_plan_width(spark)
    spark.stop()
