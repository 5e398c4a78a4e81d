"""r14 scale spot-check (r13 verdict item 9): the two surfaces this
round touched, probed at 10-100x the graded fixtures' metadata scale.

1. MOR PLANNER AT 10^4 SLICES: a forged (structure-only) MOR table
   with 10,000 file slices, each carrying one log file, planned by
   `_mor_slices`. PASS = sub-second driver-side planning and exact
   slice/log attribution. The r13 planner was O(slices x logs) —
   10^8 tuple comparisons at this scale (tens of seconds); the r14
   planner pre-groups logs by slice key, O(S + L). Planning never
   opens data files, so the forge (real timeline + commit metadata +
   empty-named files) exercises exactly the measured code path.

2. MIXED-SPEC POSITION DELETES AT 400 FILES: the r13 spot-check's
   spec-evolution staging (4 spec generations x 100 partitions,
   400 partition tuples) takes a position DELETE whose
   predicate matches rows in EVERY generation (all four id%4 classes), then
   rewrite_position_deletes folds the backlog. PASS = correct
   surviving rows, every DELETE manifest spec-homogeneous (its
   entries' partition records typed by its own spec id), and the
   fold leaving zero delete manifests with all survivors intact.

Run: python scripts/scale_spotcheck_r14.py  (quiet machine; ~3 min)
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


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("spotcheck-r14")
        .getOrCreate()
    )


def check_mor_planner_10k_slices(root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
        _mor_slices,
    )

    t = os.path.join(root, "mor10k")
    hd = os.path.join(t, ".hoodie")
    os.makedirs(hd)
    with open(os.path.join(hd, "hoodie.properties"), "w") as fh:
        fh.write(
            "hoodie.table.name=mor10k\n"
            "hoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.recordkey.fields=id\n"
        )
    n = 10_000
    i_base = "20260101000000000"
    i_delta = "20260101000001000"
    base_stats, log_stats = [], []
    for k in range(n):
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
        open(os.path.join(hd, f"{inst}.{action}.requested"), "w").close()
        open(os.path.join(hd, f"{inst}.inflight"), "w").close()
        with open(os.path.join(hd, f"{inst}.{action}"), "w") as fh:
            json.dump(
                {
                    "operationType": "UPSERT",
                    "partitionToWriteStats": {"": stats},
                },
                fh,
            )
    t0 = time.time()
    slices = _mor_slices(t)
    plan_s = time.time() - t0
    assert len(slices) == n, len(slices)
    assert all(len(s[4]) == 1 for s in slices), "log attribution lost"
    assert all(s[4][0][0] == i_delta for s in slices)
    # the r13 quadratic loop needed tens of seconds here
    assert plan_s < 2.0, f"planning {n} slices took {plan_s:.2f}s"
    print(
        f"  MOR planner: {n} slices x 1 log planned in {plan_s:.3f}s "
        "(r13 quadratic loop: O(10^8) comparisons) -> OK"
    )


def check_mixed_spec_posdelete_400_files(spark: SparkSession, root: str) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.avro import (
        read_container,
    )
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _load_metadata,
        delete_iceberg_positional,
        read_iceberg,
        rewrite_position_deletes,
        update_partition_spec,
        write_iceberg,
    )

    t = os.path.join(root, "posdel400")
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
        return sub.repartition(*[F.col(c) for c in cols])

    write_iceberg(
        clustered(df.filter("id % 4 = 0"), gens[0]), t, partition_by=gens[0]
    )
    for i, g in enumerate(gens[1:], start=1):
        update_partition_spec(t, g)
        write_iceberg(
            clustered(df.filter(f"id % 4 = {i}"), g),
            t,
            mode="append",
            partition_by=g,
        )
    n_files = len(read_iceberg(spark, t).inputFiles())
    t0 = time.time()
    delete_iceberg_positional(spark, t, "id % 125 = 17")
    del_s = time.time() - t0
    assert read_iceberg(spark, t).count() == 200_000 - 1_600
    meta = _load_metadata(t)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, manifests = read_container(snap["manifest-list"])
    dmans = [m for m in manifests if m["content"] == 1]
    specs_seen = set()
    for m in dmans:
        _h, mmeta, entries = read_container(m["manifest_path"])
        declared = int(mmeta["partition-spec-id"].decode())
        assert declared == m["partition_spec_id"]
        names = {
            pf["name"]
            for pf in next(
                sp["fields"]
                for sp in meta["partition-specs"]
                if sp["spec-id"] == declared
            )
        }
        for e in entries:
            assert set(e["data_file"].get("partition") or {}) == names
        specs_seen.add(declared)
    # id % 125 = 17 lands in every id%4 residue class -> every
    # generation must contribute a delete manifest OF ITS OWN SPEC
    assert len(specs_seen) == 4, specs_seen
    n_gens_live = len(specs_seen)
    t0 = time.time()
    rewrite_position_deletes(spark, t)
    fold_s = time.time() - t0
    meta = _load_metadata(t)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, manifests = read_container(snap["manifest-list"])
    assert not [m for m in manifests if m["content"] == 1]
    assert read_iceberg(spark, t).count() == 200_000 - 1_600
    print(
        f"  mixed-spec posdelete: {n_files} files / 4 generations, "
        f"DELETE {del_s:.2f}s ({len(dmans)} spec-homogeneous delete "
        f"manifests over {n_gens_live} live specs), fold {fold_s:.2f}s, "
        "0 delete manifests after -> OK"
    )


def main() -> None:
    root = tempfile.mkdtemp(prefix="spotcheck_r14_")
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print("r14 scale spot-checks:")
        check_mor_planner_10k_slices(root)
        check_mixed_spec_posdelete_400_files(spark, root)
        print("ALL OK")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
