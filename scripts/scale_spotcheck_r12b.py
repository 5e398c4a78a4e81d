"""r12-late scale spot-check: the three new write-path surfaces.

1. IDENTITY generation slope — `write_delta(identity=...)` at 100k /
   1M / 4M rows. The assignment is one per-partition count job + a
   map-only stamp (no Exchange), so cost per row must FALL or stay
   flat per decade (the shuffle-free claim, measurable).
2. WAP publish cost vs table size — `fast_forward(main, audit)` on
   tables whose branch holds 8 vs 256 data files. Publish is one
   metadata-json rewrite (O(1) in files); the two publishes must cost
   the same to within noise, and neither may read a data manifest.
3. SHALLOW CLONE cost vs file count — `clone_delta` at 8 vs 256 live
   files: driver metadata O(files); the per-file cost must not grow
   (no data reads, no Spark job — asserted via the job-count being
   ZERO during clone).

PASS criteria are printed per check. Run on a quiet machine (~3 min):
python scripts/scale_spotcheck_r12b.py
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
        .appName("spotcheck-r12b")
        .getOrCreate()
    )


def check_identity_slope(spark, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        read_delta,
        write_delta,
    )

    print("== 1. identity generation slope (shuffle-free claim)")
    prev_per_row = None
    for n in (100_000, 1_000_000, 4_000_000):
        t = os.path.join(root, f"ident_{n}")
        df = (
            spark.range(0, n, 1, 32)
            .withColumn("s", F.concat(F.lit("doc-"), F.col("id")))
            .drop("id")
        )
        t0 = time.time()
        write_delta(df, t, identity={"rid": {"start": 1, "step": 1}})
        dt = time.time() - t0
        per_row = dt / n * 1e6
        got = read_delta(spark, t).agg(
            F.count("*").alias("n"),
            F.count_distinct("rid").alias("d"),
            F.max("rid").alias("hi"),
        ).collect()[0]
        ok = got.n == got.d == n and got.hi == n
        print(
            f"   n={n:>9,}  write={dt:6.2f}s  {per_row:6.2f} us/row  "
            f"unique+max ok={ok}"
        )
        assert ok
        if prev_per_row is not None:
            assert per_row < prev_per_row * 1.5, (
                "per-row identity cost grew superlinearly"
            )
        prev_per_row = per_row
    print("   PASS: per-row cost flat-or-falling per decade")


def _stage_iceberg_branch(spark, t: str, files: int) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        create_ref,
        write_iceberg,
    )

    df = (
        spark.range(0, files * 1000, 1, files)
        .withColumn("s", F.lit("x"))
    )
    write_iceberg(df, t)
    create_ref(t, "audit", kind="branch")
    write_iceberg(
        spark.range(0, files * 1000, 1, files).withColumn("s", F.lit("y")),
        t,
        mode="append",
        branch="audit",
    )


def check_wap_publish_o1(spark, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        fast_forward,
    )

    print("== 2. WAP publish cost vs table size (O(1) metadata claim)")
    costs = {}
    for files in (8, 256):
        t = os.path.join(root, f"wap_{files}")
        _stage_iceberg_branch(spark, t, files)
        t0 = time.time()
        fast_forward(t, "main", "audit")
        costs[files] = time.time() - t0
        print(f"   files={files:>4}  publish={costs[files]*1000:7.1f} ms")
    ratio = costs[256] / max(costs[8], 1e-9)
    print(f"   256-file/8-file publish ratio = {ratio:.2f}")
    assert ratio < 3.0, "publish cost scaled with file count"
    print("   PASS: publish cost independent of data size")


def check_clone_metadata_only(spark, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        clone_delta,
        read_delta,
        write_delta,
    )

    print("== 3. shallow clone: O(files) driver metadata, zero jobs")
    per_file = {}
    for files in (8, 256):
        src = os.path.join(root, f"clone_src_{files}")
        dst = os.path.join(root, f"clone_dst_{files}")
        write_delta(
            spark.range(0, files * 1000, 1, files).withColumn(
                "s", F.lit("x")
            ),
            src,
        )
        tracker = spark.sparkContext.statusTracker()
        jobs_before = len(tracker.getJobIdsForGroup() or [])
        t0 = time.time()
        clone_delta(src, dst)
        dt = time.time() - t0
        jobs_after = len(tracker.getJobIdsForGroup() or [])
        per_file[files] = dt / files * 1000
        print(
            f"   files={files:>4}  clone={dt*1000:7.1f} ms "
            f"({per_file[files]:6.3f} ms/file)  spark jobs during "
            f"clone={jobs_after - jobs_before}"
        )
        assert jobs_after == jobs_before, "clone launched a Spark job"
        n = read_delta(spark, dst).count()
        assert n == files * 1000
    assert per_file[256] < per_file[8] * 3.0
    print("   PASS: metadata-only, per-file cost flat")


def main() -> None:
    spark = _spark()
    root = tempfile.mkdtemp(prefix="spotcheck_r12b_")
    try:
        check_identity_slope(spark, root)
        check_wap_publish_o1(spark, root)
        check_clone_metadata_only(spark, root)
        print("ALL CHECKS PASSED")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
