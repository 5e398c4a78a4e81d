#!/usr/bin/env python
"""r16 scale spot-check (VERDICT r15 item 1): the heavy compute
operators at an sf1-class scale, 8 vs 32 cores.

The r15 c8/c32 block showed every benched column overhead-bound at
sf0.1 (ratios <= 1 for the lakehouse/streaming families), so the r15
shuffle/join work was argued-safe but unmeasured at a scale where
compute dominates. This script generates DETERMINISTIC scaled inputs
under /tmp (pure SQL expressions, seedless trig/hash synthesis — no
RNG, no wall clock) and times the five operators the verdict names,
each sized to >= 10 s at 32 cores:

  jaccard    word-3-gram pair join, hashed keys (operators/dedup.py)
  span       duplicate_span_stats k-gram shuffle (operators/span_dedup)
  semantic   cosine pairs -> connected components (operators/dedup.py)
  diff       keyed full-outer changelog diff, SHJ-hinted (changefeed)
  mor        MOR snapshot read: per-slice Arrow merge over dirty slices

Usage:
  python scripts/scale_spotcheck_r16.py gen            # build fixtures
  python scripts/scale_spotcheck_r16.py run 32 [ops]   # time at local[32]
  python scripts/scale_spotcheck_r16.py run 8  [ops]   # time at local[8]

Timing: noop sink (guide §1.4), min of SPOTCHECK_REPS in-process reps
(default 2), one JSON line per run. Alternate 32/8 invocations to keep
the ambient-noise window matched (BASELINE.md variance note).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

ROOT = "/tmp/ssp_scale_r16"
DOCS = os.path.join(ROOT, "documents_big.parquet")
EMB = os.path.join(ROOT, "embeddings_big.parquet")
EV_OLD = os.path.join(ROOT, "events_old.parquet")
EV_NEW = os.path.join(ROOT, "events_new.parquet")
MOR = os.path.join(ROOT, "mor_big")
READY = os.path.join(ROOT, "_READY")

#: ~60x the sf0.1 documents table: 60k near-dup families x 5 copies,
#: 120 words each. Posting lists are family-local (vocab 50k), so the
#: pair join fans out ~10 ordered pairs per shingle — the compute-bound
#: regime (~70M joined rows, ~1 GB posting shuffle per side).
N_FAMILIES, N_COPIES, N_WORDS, VOCAB = 60_000, 5, 120, 50_000
#: span_stats' coverage explode is ~6x heavier per doc than the pair
#: join (k tokens per dup-gram occurrence, two count_distincts), so it
#: runs on the first SPAN_FAMILIES families of the same fixture.
SPAN_FAMILIES = 14_000
#: 30x the sf0.1 embeddings table: 1,200 blocks x 50 vectors, 64 dims.
N_BLOCKS, BLOCK_SZ, DIM = 1_200, 50, 64
#: 8M-key changelog diff (old vs new with 10% deletes, ~14% updates,
#: 10% inserts) — the SHJ-hinted full-outer at a compute-bound size.
N_EVENTS = 8_000_000
#: MOR: 4M rows in 64 file groups, then a 50% upsert puts one log file
#: on every slice — the snapshot read pays the per-slice Arrow merge
#: (Python cost ~ log records, so the update fraction is the knob).
MOR_ROWS, MOR_GROUPS, MOR_UPD_MOD = 4_000_000, 64, 2

REPS = int(os.environ.get("SPOTCHECK_REPS", "2"))


def _spark(cpus: int) -> SparkSession:
    from sparkstreamingtwitter_presidential_spark.session import get_spark

    # UI on (engine default is off) so the run can report spill bytes
    # for the no-spill/no-OOM claim on the SHJ-hinted diff.
    return get_spark(
        f"scale-spotcheck-r16-c{cpus}",
        cpus=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )


def _spill_bytes(spark: SparkSession) -> tuple[int, int]:
    """Sum (memoryBytesSpilled, diskBytesSpilled) over all completed
    stages via the UI REST API. Returns (-1, -1) if the UI is off."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return (-1, -1)
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages") as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return (mem, disk)


def _docs_big(spark: SparkSession) -> DataFrame:
    ids = spark.range(N_FAMILIES * N_COPIES).withColumn(
        "fam", F.expr("id div {}".format(N_COPIES))
    ).withColumn("cp", F.expr("id % {}".format(N_COPIES)))
    # family base word at position p; copies perturb every 29th word
    # (copy-unique token), leaving jaccard ~0.8-0.9 within a family
    word = (
        "case when cp > 0 and pmod(p, 29) = cp "
        "then concat('p', fam, '_', p, '_', cp) "
        "else concat('w', pmod(xxhash64(concat(fam, ':', p)), {v})) end"
    ).format(v=VOCAB)
    return ids.select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(0, {n} - 1), "
            "p -> {w}), ' ')".format(n=N_WORDS, w=word)
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.expr("concat('src', pmod(fam, 10))").alias("source"),
    ).withColumn("n_chars", F.length("text"))


def _emb_big(spark: SparkSession) -> DataFrame:
    # block center + per-vector noise; even ids get small noise (dense
    # near-dup edges inside the block), odd ids large (below threshold)
    return spark.range(N_BLOCKS * BLOCK_SZ).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, {d} - 1), d -> cast("
            "sin(cast(id div {b} as double) * 131.0 + cast(d as double))"
            " + (case when id % 2 = 0 then 0.05 else 0.8 end)"
            " * sin(cast(id as double) * 7.13 + cast(d as double) * 1.7)"
            " as float))".format(d=DIM, b=BLOCK_SZ)
        ).alias("embedding"),
        F.expr("cast(id div {b} as int)".format(b=BLOCK_SZ)).alias("label"),
    )


def _events_pair(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    base = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.expr("concat('t', pmod(id, 7))").alias("event_type"),
        F.expr("cast(pmod(id, 1000) as double) * 0.5").alias("value"),
        F.expr("pmod(xxhash64(id), 100000)").alias("user_id"),
    )
    old = base
    new = (
        base.filter("event_id % 10 != 0")  # 10% deletes
        .withColumn(
            "value",
            F.expr(
                "case when event_id % 7 = 3 then value * 2 else value end"
            ),
        )  # ~14% updates
        .unionByName(
            spark.range(N_EVENTS, N_EVENTS + N_EVENTS // 10).select(
                F.col("id").alias("event_id"),
                F.expr("concat('t', pmod(id, 7))").alias("event_type"),
                F.expr("cast(pmod(id, 1000) as double) * 0.5").alias("value"),
                F.expr("pmod(xxhash64(id), 100000)").alias("user_id"),
            )
        )  # 10% inserts
    )
    return old, new


def gen() -> None:
    if os.path.exists(READY):
        print(f"fixtures already built under {ROOT}")
        return
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    spark = _spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    t0 = time.perf_counter()
    _docs_big(spark).repartition(64).write.parquet(DOCS)
    _emb_big(spark).repartition(16).write.parquet(EMB)
    old, new = _events_pair(spark)
    old.repartition(64).write.parquet(EV_OLD)
    new.repartition(64).write.parquet(EV_NEW)
    # MOR table: one insert commit (64 groups), one 25% upsert commit
    # (log file on every slice), so the snapshot read is all-dirty
    from sparkstreamingtwitter_presidential_spark.sources.hudi import write_hudi
    from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
        upsert_hudi_mor,
    )

    rows = spark.range(MOR_ROWS).select(
        F.col("id"),
        F.expr("concat('t', pmod(id, 7))").alias("event_type"),
        F.expr("cast(pmod(id, 1000) as double) * 0.5").alias("value"),
    )
    write_hudi(
        rows,
        MOR,
        record_key="id",
        n_file_groups=MOR_GROUPS,
        table_type="MERGE_ON_READ",
    )
    upd = rows.filter(f"id % {MOR_UPD_MOD} = 0").withColumn(
        "value", F.col("value") + 1000.0
    )
    upsert_hudi_mor(spark, MOR, source=upd)
    open(READY, "w").close()
    print(f"generated {ROOT} in {time.perf_counter() - t0:.1f}s")
    spark.stop()


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def op_jaccard(spark: SparkSession) -> None:
    from sparkstreamingtwitter_presidential_spark.operators.dedup import (
        jaccard_pairs,
    )

    docs = spark.read.parquet(DOCS)
    out = jaccard_pairs(docs, "doc_id", "text", 0.5, hashed=True)
    _noop(out)


def op_span(spark: SparkSession) -> None:
    from sparkstreamingtwitter_presidential_spark.operators.span_dedup import (
        duplicate_span_stats,
    )

    docs = spark.read.parquet(DOCS).filter(
        F.col("doc_id") < SPAN_FAMILIES * N_COPIES
    )
    _noop(duplicate_span_stats(docs, k=8, hashed=True))


def op_semantic(spark: SparkSession) -> None:
    from sparkstreamingtwitter_presidential_spark.operators.dedup import (
        semantic_dedup,
    )

    emb = spark.read.parquet(EMB)
    _noop(semantic_dedup(emb, 0.4))


def op_diff(spark: SparkSession) -> None:
    from pyspark import StorageLevel
    from sparkstreamingtwitter_presidential_spark.sources.changefeed import (
        keyed_change_rows,
    )

    cols = ["event_id", "event_type", "value", "user_id"]
    old = spark.read.parquet(EV_OLD).persist(StorageLevel.MEMORY_AND_DISK)
    new = spark.read.parquet(EV_NEW).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        old.count(), new.count()  # stats-free persisted sides, like prod
        out = keyed_change_rows(
            old, new, ["event_id"], cols, "_commit_version", F.lit(1)
        )
        _noop(out)
    finally:
        old.unpersist()
        new.unpersist()


def op_mor(spark: SparkSession) -> None:
    from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
        read_hudi_mor,
    )

    _noop(read_hudi_mor(spark, MOR))


OPS = {
    "jaccard": op_jaccard,
    "span": op_span,
    "semantic": op_semantic,
    "diff": op_diff,
    "mor": op_mor,
}


def run(cpus: int, names: list[str]) -> None:
    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(DOCS).limit(1).count()  # JVM warmup
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} c{cpus} rep{rep}")
            t0 = time.perf_counter()
            OPS[name](spark)
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 2)
        print(f"  {name}: {timings[name]}s (min of {REPS})", flush=True)
    mem_sp, disk_sp = _spill_bytes(spark)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "timings": timings,
                "memoryBytesSpilled": mem_sp,
                "diskBytesSpilled": disk_sp,
            }
        )
    )
    spark.stop()


def main() -> None:
    mode = sys.argv[1]
    if mode == "gen":
        gen()
    elif mode == "run":
        cpus = int(sys.argv[2])
        names = sys.argv[3].split(",") if len(sys.argv) > 3 else list(OPS)
        run(cpus, names)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
