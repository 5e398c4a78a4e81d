"""Mergeable sketch artifacts: the incremental distinct-counting
pattern a 100 TB deployment runs instead of re-scanning history.

`approx_count_distinct` answers one query over one scan. The artifact
pattern is stronger: build a compact HLL sketch PER SLICE (day,
source, tenant) once, store the binary sketches, and answer any
range/rollup later by MERGING sketches — cost ∝ slices, not rows, and
yesterday's data is never re-read. Spark 4 ships Apache DataSketes
HLL under `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
all JVM aggregates with map-side partials.

  build_sketches    one scan -> (slice..., n_rows exact, sketch bytes)
  merge_estimates   any grouping of stored sketches -> estimated
                    distinct count per group (plus exact row sums)

The sketch column is an opaque `binary` — persist it like any column
(parquet/Delta); the estimate is engine-specific (HLL is seeded and
implementation-defined), so correctness contracts are RELATIVE-ERROR
bounds vs exact distinct counts (tests pin < 3% at lgK=12), the same
policy as the approx_sketches query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_K = 12  # 2^12 registers: ~0.8% typical HLL error, 4 KB per sketch


def build_sketches(
    df: DataFrame,
    slice_cols: list[str],
    distinct_col: str,
    lg_k: int = LG_K,
) -> DataFrame:
    """(slice_cols..., n_rows, sketch): one scan, one shuffle on the
    slice key; the sketch is a mergeable binary artifact."""
    return df.groupBy(*slice_cols).agg(
        F.count("*").alias("n_rows"),
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("sketch"),
    )


def merge_estimates(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Roll stored sketches up to ``group_cols`` (None = grand total):
    estimated distinct count + exact row sum per group. Reads ONLY the
    sketch table — the raw data is never touched again."""
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct"
        ),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)


def build_theta_sketches(
    df: DataFrame,
    slice_cols: list[str],
    distinct_col: str,
    lg_k: int = LG_K,
) -> DataFrame:
    """Theta-sketch artifacts per slice. HLL answers only distinct
    COUNTS; theta sketches additionally support set INTERSECTION and
    DIFFERENCE across stored sketches — the overlap-estimation pattern
    (shared content between corpus slices, audience overlap between
    tenants) that would otherwise need a full join of the raw data."""
    return df.groupBy(*slice_cols).agg(
        F.count("*").alias("n_rows"),
        F.theta_sketch_agg(distinct_col, F.lit(lg_k)).alias("sketch"),
    )


def slice_overlap_estimates(
    sketches: DataFrame, slice_col: str
) -> DataFrame:
    """Pairwise estimated overlap between slices from STORED theta
    sketches: (slice_a, slice_b, distinct_a, distinct_b,
    overlap_est, jaccard_est) for every unordered pair. The join is
    sketch-count x sketch-count (slices, not rows) and each cell is a
    constant-size binary op — at 100 TB this reads kilobytes where the
    exact computation re-shuffles the corpus."""
    a = sketches.select(
        F.col(slice_col).alias("slice_a"),
        F.col("sketch").alias("sk_a"),
    )
    b = sketches.select(
        F.col(slice_col).alias("slice_b"),
        F.col("sketch").alias("sk_b"),
    )
    pairs = a.join(b, F.col("slice_a") < F.col("slice_b"))
    inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
    )
    union = F.theta_sketch_estimate(F.theta_union(F.col("sk_a"), F.col("sk_b")))
    return pairs.select(
        "slice_a",
        "slice_b",
        F.theta_sketch_estimate("sk_a").alias("distinct_a"),
        F.theta_sketch_estimate("sk_b").alias("distinct_b"),
        inter.alias("overlap_est"),
        (inter / union).alias("jaccard_est"),
    )


def build_kll_sketches(
    df: DataFrame,
    slice_cols: list[str],
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """KLL quantile-sketch artifacts per slice (Apache DataSketches
    KLL, bigint stream): the mergeable-PERCENTILE pattern completing
    the sketch family — HLL counts distincts, theta does set algebra,
    KLL answers "what is p50/p99 of X over any slice rollup" from
    stored artifacts, without re-scanning history. k=200 gives ~1.65%
    one-sided rank error (the library default)."""
    return df.groupBy(*slice_cols).agg(
        F.count("*").alias("n_rows"),
        F.kll_sketch_agg_bigint(
            F.col(value_col).cast("bigint"), F.lit(k)
        ).alias("sketch"),
    )


def merge_quantile_estimates(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    quantiles: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Roll stored KLL sketches up to ``group_cols`` (None = grand
    total): estimated quantiles + exact row sums per group, reading
    ONLY the sketch table. Quantile columns are named q50/q90/q99
    style from the fraction.

    Spark exposes KLL merge as a PAIRWISE scalar
    (kll_sketch_merge_bigint(left, right)), not an aggregate, so the
    rollup collects each group's sketches into an array (bounded by
    the group's SLICE count — metadata, never rows) and folds it with
    a higher-order aggregate."""
    aggs = [
        F.sum("n_rows").alias("n_rows"),
        F.collect_list("sketch").alias("__sks"),
    ]
    arr = F.col("__sks")
    merged = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: F.kll_sketch_merge_bigint(acc, x),
    )
    proj = [
        F.kll_sketch_get_quantile_bigint(merged, F.lit(q)).alias(
            f"q{int(q * 100)}"
        )
        for q in quantiles
    ]
    if group_cols:
        base = sketches.groupBy(*group_cols).agg(*aggs)
        return base.select(*group_cols, "n_rows", *proj)
    return sketches.agg(*aggs).select("n_rows", *proj)
