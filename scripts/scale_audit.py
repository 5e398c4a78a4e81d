#!/usr/bin/env python
"""Scale audit: measure how the heavy dedup / similarity / text
operators scale from sf0.1 to a synthetic 10x corpus, to back the
100 TB design claims with slopes instead of assertions.

Builds (once, under /tmp) a 10x documents+embeddings set: 10 replicas
of the sf0.1 tables with offset ids. Replica TEXTS are Caesar-rotated
per replica (``translate`` over the lowercase alphabet), so shingles
never collide across replicas — duplicate DENSITY stays that of the
original corpus instead of every doc gaining 9 exact twins, which is
what keeps pair outputs comparable and the timing ratio meaningful.
Embeddings are replicated as-is (bucket/cell collision rates then
stress candidate generation 10x, the realistic hazard).

Usage: python scripts/scale_audit.py [--skip-build]
Prints one markdown table + one JSON line.

Interpretation: an operator whose wall-clock ratio is ~10x (or less,
fixed overheads amortizing) scales linearly in corpus size; ratios
far above 10x flag a superlinear path that 1000 executors cannot save.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sparkstreamingtwitter_presidential_spark.io import load_table  # noqa: E402
from sparkstreamingtwitter_presidential_spark.operators import dedup as D  # noqa: E402
from sparkstreamingtwitter_presidential_spark.operators import sampling as smp  # noqa: E402
from sparkstreamingtwitter_presidential_spark.operators import decontam as DC  # noqa: E402
from sparkstreamingtwitter_presidential_spark.operators import projection as PJ  # noqa: E402
from sparkstreamingtwitter_presidential_spark.operators import span_dedup as SD  # noqa: E402
from sparkstreamingtwitter_presidential_spark.operators import similarity as S  # noqa: E402
from sparkstreamingtwitter_presidential_spark.operators.components import (  # noqa: E402
    connected_components,
)
from sparkstreamingtwitter_presidential_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SYNTH_DIR = "/tmp/spark_graft_scale10x_v1"
X1_DIR = os.path.join(SYNTH_DIR, "x1")
REPLICAS = 10
LOWER = string.ascii_lowercase


def build_synth(spark) -> None:
    """Stage the x10 corpus AND an x1 copy through the same writer
    (multi-file parquet): the fixture stores each table as ONE file, so
    reading it directly would compare a 1-partition scan against a
    32-partition one and measure parallelism, not the operator."""
    if os.path.exists(os.path.join(SYNTH_DIR, "_BUILT")):
        return
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(X1_DIR, "documents.parquet")
    )
    emb.repartition(8).write.mode("overwrite").parquet(
        os.path.join(X1_DIR, "embeddings.parquet")
    )
    n_docs = 10_000  # id stride > max doc_id
    doc_parts = []
    for r in range(REPLICAS):
        rot = LOWER[r:] + LOWER[:r]
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
                F.translate(F.col("text"), LOWER, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big_docs = doc_parts[0]
    for p in doc_parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SYNTH_DIR, "documents.parquet")
    )
    emb_parts = [
        emb.select(
            (F.col("vec_id") + F.lit(r * 10_000)).alias("vec_id"),
            "embedding",
            "label",
        )
        for r in range(REPLICAS)
    ]
    big_emb = emb_parts[0]
    for p in emb_parts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SYNTH_DIR, "embeddings.parquet")
    )
    open(os.path.join(SYNTH_DIR, "_BUILT"), "w").close()


def _load(spark, base: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base, f"{name}.parquet"))


def cases(spark, base):
    docs = lambda: _load(spark, base, "documents")  # noqa: E731
    emb = lambda: _load(spark, base, "embeddings")  # noqa: E731
    qids = [0, 101, 202, 303, 404]

    def chain_pairs():
        from pyspark.sql import Window

        w = Window.partitionBy("source").orderBy("doc_id")
        return (
            docs()
            .select("doc_id", "source")
            .withColumn("prev", F.lag("doc_id").over(w))
            .filter(F.col("prev").isNotNull())
            .select(F.col("prev").alias("id_a"), F.col("doc_id").alias("id_b"))
        )

    def incremental():
        base_sigs = D.lsh_signature_table(
            docs().filter(F.col("doc_id") % 5 != 0), "doc_id", "text"
        )
        new_sigs = D.lsh_signature_table(
            docs().filter(F.col("doc_id") % 5 == 0), "doc_id", "text"
        )
        return D.incremental_lsh_pairs(base_sigs, new_sigs, 0.5)

    def canonicalize():
        from sparkstreamingtwitter_presidential_spark.operators.components import (
            canonical_members,
        )

        return canonical_members(docs(), connected_components(chain_pairs()))

    def salted():
        from sparkstreamingtwitter_presidential_spark.operators.scale import salted_join

        return salted_join(
            docs().select("doc_id", "source"),
            docs().select(F.col("doc_id"), F.col("n_chars")).limit(100),
            "doc_id",
            n_salts=4,
        )

    return {
        "exact_dedup": lambda: D.exact_dedup(docs(), "text", "doc_id"),
        "jaccard_pairs": lambda: D.jaccard_pairs(docs(), "doc_id", "text", 0.5),
        "minhash_lsh_pairs": lambda: D.minhash_lsh_pairs(docs(), "doc_id", "text", 0.5),
        "incremental_lsh": incremental,
        "simhash_pairs": lambda: D.simhash_pairs(docs(), "doc_id", "text"),
        "components_chain": lambda: connected_components(chain_pairs()),
        "canonical_members": canonicalize,
        "brute_force_topk": lambda: S.brute_force_topk(emb(), qids),
        "lsh_topk": lambda: S.lsh_topk(emb(), qids),
        "ivf_topk": lambda: S.ivf_topk(emb(), qids),
        "pq_topk": _pq(emb, qids),
        "ivfpq_topk": _ivfpq(emb, qids),
        "stratified_sample": lambda: smp.deterministic_sample(
            docs().select("doc_id"), "doc_id", 0.1
        ),
        "sharded_shuffle": lambda: smp.sharded_shuffle(
            docs().select("doc_id", "source"), "doc_id", n_shards=8
        ),
        "salted_join": salted,
        "decontam_hits": lambda: DC.contamination_hits(
            docs().filter(F.col("doc_id") % 10 != 0),
            docs().filter(F.col("doc_id") % 10 == 0),
            n=6,
            hashed=True,
        ),
        "span_stats": lambda: SD.duplicate_span_stats(docs(), k=8, hashed=True),
        "srp_project": lambda: PJ.project_for_ann(emb(), out_dim=64),
        "bpe_encode": _bpe(docs),
        "global_row_numbers": _rownum(docs),
        "paragraph_dedup": lambda: D.paragraph_dedup(docs()),
    }


def _bpe(docs):
    def run():
        from sparkstreamingtwitter_presidential_spark.operators.bpe import (
            bpe_encode,
            train_bpe,
        )

        merges = train_bpe(docs(), num_merges=48, max_words=50_000)
        return bpe_encode(docs(), merges).select(
            "doc_id", F.size("tokens").alias("n_tokens")
        )

    return run


def _rownum(docs):
    def run():
        from sparkstreamingtwitter_presidential_spark.operators.scale import (
            global_row_numbers,
        )

        return global_row_numbers(docs().select("doc_id"), "doc_id")

    return run


def _pq(emb, qids):
    def run():
        from sparkstreamingtwitter_presidential_spark.operators.pq import pq_topk

        return pq_topk(emb(), qids)

    return run


def _ivfpq(emb, qids):
    def run():
        from sparkstreamingtwitter_presidential_spark.operators.pq import ivfpq_topk

        return ivfpq_topk(emb(), qids)

    return run


X100_DIR = "/tmp/spark_graft_scale100x_v1"


def build_synth_x100(spark) -> None:
    """Stage suffix-transformed x10 and x100 corpora for the 100x spot
    check. Caesar rotation (the x10 builder) only has 26 distinct
    rotations, so at 100 replicas texts would collide across replicas
    and duplicate density would explode; instead every WORD gets a
    per-replica suffix (``regexp_replace(\\w+ -> $1_rK)``) — shingles
    and k-grams never collide across replicas while each replica keeps
    the original corpus's internal duplicate structure exactly. Both
    scales use the SAME transform so the x100/x10 ratio is a clean
    per-decade slope."""
    if os.path.exists(os.path.join(X100_DIR, "_BUILT")):
        return
    docs = load_table(spark, SF_DIR, "documents")
    stride = 10_000

    def replica(r: int):
        return docs.select(
            (F.col("doc_id") + F.lit(r * stride)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\w+)", f"$1_r{r}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    for n, sub in ((10, "x10"), (100, "x100")):
        parts = [replica(r) for r in range(n)]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(X100_DIR, sub, "documents.parquet")
        )
    open(os.path.join(X100_DIR, "_BUILT"), "w").close()


def steep_cases(spark, base):
    """The two steepest x10 slopes (r5 verdict item 3): the ones where
    a 10x run could hide superlinear onset."""
    docs = lambda: spark.read.parquet(  # noqa: E731
        os.path.join(base, "documents.parquet")
    )

    def incremental():
        base_sigs = D.lsh_signature_table(
            docs().filter(F.col("doc_id") % 5 != 0), "doc_id", "text"
        )
        new_sigs = D.lsh_signature_table(
            docs().filter(F.col("doc_id") % 5 == 0), "doc_id", "text"
        )
        return D.incremental_lsh_pairs(base_sigs, new_sigs, 0.5)

    def bpe_case():
        from sparkstreamingtwitter_presidential_spark.operators.bpe import (
            bpe_encode,
            train_bpe,
        )

        # train is histogram-bounded (max_words cap) — its cost is a
        # near-constant offset at both scales, so including it makes
        # the measured ratio a FLOOR-biased view of encode's slope;
        # same composition as the 10x audit's _bpe for comparability
        merges = train_bpe(docs(), num_merges=48, max_words=50_000)
        return bpe_encode(docs(), merges).select(
            "doc_id", F.size("tokens").alias("n_tokens")
        )

    return {
        "incremental_lsh": incremental,
        "span_stats": lambda: SD.duplicate_span_stats(docs(), k=8, hashed=True),
        # r6 verdict item 7: the steepest slope not yet spot-checked
        # at 100x (2.2x per decade at 10x)
        "bpe_encode": bpe_case,
        # r7 verdict item 6: the last >=1.8x@10x slope unchecked at
        # 100x (banded LSH bucket self-join; cost tracks bucket
        # collisions, which the suffix transform keeps per-replica)
        "minhash_lsh_pairs": lambda: D.minhash_lsh_pairs(
            docs(), "doc_id", "text", 0.5
        ),
    }


def main_x100() -> None:
    spark = get_spark("scale-audit-x100")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skip-build" not in sys.argv:
        build_synth_x100(spark)
    for sub in ("x10", "x100"):
        spark.read.parquet(os.path.join(X100_DIR, sub, "documents.parquet")).count()

    # Shuffle partitions scale WITH the data, as they would on a real
    # cluster (partitions ~ bytes / maxPartitionBytes; a 100x corpus on
    # 1000 executors gets ~100x the partitions, it does not cram 100x
    # bytes into the same 32). Holding 32 partitions fixed at x100
    # measures sort/agg SPILL, not the operator: the first x100 run did
    # exactly that and read 17x/decade for span_stats; right-sized it
    # is ~4x/decade (linear, overheads amortizing).
    parts = {"x10": "32", "x100": "256"}
    results = {}
    for sub in ("x10", "x100"):
        base = os.path.join(X100_DIR, sub)
        spark.conf.set("spark.sql.shuffle.partitions", parts[sub])
        for name, fn in steep_cases(spark, base).items():
            t0 = time.perf_counter()
            n = fn().count()
            dt = time.perf_counter() - t0
            results.setdefault(name, {})[sub] = {"sec": round(dt, 2), "rows": n}
            spark.catalog.clearCache()

    print("\n| operator | x10 sec | x100 sec | per-decade ratio | x10 rows | x100 rows |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        ratio = r["x100"]["sec"] / max(r["x10"]["sec"], 1e-9)
        print(
            f"| {name} | {r['x10']['sec']} | {r['x100']['sec']} | "
            f"{ratio:.1f}x | {r['x10']['rows']} | {r['x100']['rows']} |"
        )
    print(json.dumps({"scale_audit_x100": results}))


def main() -> None:
    spark = get_spark("scale-audit")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skip-build" not in sys.argv:
        build_synth(spark)
    # warm-up
    _load(spark, X1_DIR, "documents").count()
    _load(spark, SYNTH_DIR, "documents").count()

    results = {}
    for base, tag in [(X1_DIR, "x1"), (SYNTH_DIR, "x10")]:
        for name, fn in cases(spark, base).items():
            t0 = time.perf_counter()
            n = fn().count()
            dt = time.perf_counter() - t0
            results.setdefault(name, {})[tag] = {"sec": round(dt, 2), "rows": n}
            # operators persist intermediates; free them so one case's
            # cache never skews the next case's timing
            spark.catalog.clearCache()

    print("\n| operator | x1 sec | x10 sec | ratio | x1 rows | x10 rows |")
    print("|---|---|---|---|---|---|")
    for name, r in results.items():
        ratio = r["x10"]["sec"] / max(r["x1"]["sec"], 1e-9)
        print(
            f"| {name} | {r['x1']['sec']} | {r['x10']['sec']} | "
            f"{ratio:.1f}x | {r['x1']['rows']} | {r['x10']['rows']} |"
        )
    print(json.dumps({"scale_audit": results}))


if __name__ == "__main__":
    if "--x100" in sys.argv:
        main_x100()
    else:
        main()
