"""Sequence packing: assign documents to fixed-token-budget bins — the
step between a curated corpus and a training run (pack documents into
~budget-token training sequences with minimal padding).

This is GREEDY SEQUENTIAL packing: documents are taken in a
deterministic order (doc_id within each group) and a document starts a
new bin when it would overflow the budget. That is the streaming/
distributed-friendly variant — optimal bin packing is NP-hard and
order-dependent heuristics (first-fit-decreasing) need a global sort +
sequential state, which turns into a single-task bottleneck at scale.
Sequential packing is one window cumsum per group, deterministic,
engine-portable, and what large training-data pipelines actually run.

Bin boundary rule (exactly expressible in SQL, so the DuckDB oracle is
EXACT): a document with cumulative token count c (inclusive) and length
t belongs to bin floor((c - t) / budget) — i.e. bins are budget-sized
intervals of the EXCLUSIVE prefix sum. Documents longer than the budget
occupy their own bin(s) boundary-wise rather than erroring: at 100 TB
you filter or chunk oversized docs upstream (token_chunks below).

Scale: one shuffle per group column (window partition); state is the
running sum — no driver involvement, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions.text_stats import ws_token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, doc_id, n_tokens, bin_id, bin_offset): greedy sequential
    packing of each group's documents (doc_id order) into bins of
    ``budget`` whitespace tokens. bin_offset is the document's token
    start position within its bin."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
    )
    # exclusive prefix sum: tokens BEFORE this document in its group
    start = F.coalesce(
        F.sum("n_tokens").over(
            Window.partitionBy("grp")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    return toks.select(
        "grp",
        "doc_id",
        "n_tokens",
        F.floor(start / budget).cast("long").alias("bin_id"),
        (start % budget).cast("long").alias("bin_offset"),
    )


def token_chunks(
    docs: DataFrame,
    chunk_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into ``chunk_tokens``-sized
    chunks: (doc_id, chunk_index, chunk_text). The upstream companion to
    pack_sequences for documents longer than the budget. One generate
    off a materialized token array — map-only, no shuffle."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
    )
    # The GENERATOR INPUT is the cheap sequence(0, n-1); the token array
    # rides along as a plain projected column — only generator inputs
    # get re-evaluated per output row (round-2 Generate-inlining trap).
    n_chunks = F.ceil(F.size("toks") / F.lit(chunk_tokens)).cast("int")
    return toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
    ).select(
        "doc_id",
        "chunk_index",
        F.array_join(
            F.slice(
                F.col("toks"), F.col("chunk_index") * chunk_tokens + 1, chunk_tokens
            ),
            " ",
        ).alias("chunk_text"),
    )


def strided_token_chunks(
    docs: DataFrame,
    chunk_tokens: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping (strided) token windows: chunk i covers tokens
    [i*stride, i*stride + chunk_tokens); the last window starts at the
    final stride position that still begins inside the document, so
    every token is covered and trailing windows may be short. With
    stride == chunk_tokens this degenerates to token_chunks.

    The long-document slicing used for context-window training/eval
    (stride < size gives each boundary token a window where it has
    left context). Same plan shape as token_chunks: generator input is
    the cheap sequence, token array rides as a projected column —
    map-only, no shuffle, no UDF."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 < stride <= chunk_tokens:
        raise ValueError(f"stride must be in (0, chunk_tokens], got {stride}")
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
    )
    # number of windows = 1 + ceil((n - chunk)/stride) clamped at >= 1,
    # i.e. floor((max(n - chunk + stride - 1, 0)) / stride) + 1
    n = F.size("toks")
    n_windows = (
        F.floor(F.greatest(n - chunk_tokens + stride - 1, F.lit(0)) / stride) + 1
    ).cast("int")
    return toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_windows - 1)).alias("chunk_index"),
    ).select(
        "doc_id",
        "chunk_index",
        F.array_join(
            F.slice(F.col("toks"), F.col("chunk_index") * stride + 1, chunk_tokens),
            " ",
        ).alias("chunk_text"),
    )


def length_bucket_boundaries(
    df: DataFrame, length_col: str, n_buckets: int
) -> list[float]:
    """Equal-frequency bucket boundaries for ``length_col``: the
    (1/n .. (n-1)/n) interior percentiles, floor-rounded to 1e-6 (the
    house convention that keeps Spark and a SQL twin bit-identical on
    interpolated doubles). One aggregate job; the boundary list is
    n_buckets-1 doubles to the driver — metadata, never data."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.percentile(F.col(length_col), F.array(*[F.lit(p) for p in fracs])).alias(
            "b"
        )
    ).first()
    return [int(b * 1e6 + 0.5) / 1e6 for b in row["b"]]


def bucket_by_length(
    df: DataFrame,
    length_col: str,
    n_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Sequence-length bucketing (the padding-waste reducer for
    training batch assembly): assign each row an equal-frequency
    bucket id in [0, n_buckets) by its length percentile, so batches
    drawn within one bucket pad to a near-uniform length instead of
    the corpus max.

    Scale shape: ONE percentile aggregate for the boundary list
    (driver gets n_buckets-1 doubles), then a map-only CASE-chain
    assignment fused into the scan — no shuffle of the data, no
    global sort (contrast NTILE, whose unpartitioned window is an
    Exchange SinglePartition). Ties at a boundary go to the LOWER
    bucket (len <= boundary), deterministically."""
    bounds = length_bucket_boundaries(df, length_col, n_buckets)
    c = F.col(length_col)
    expr = F.lit(n_buckets - 1)
    for i in range(n_buckets - 2, -1, -1):
        expr = F.when(c <= F.lit(bounds[i]), F.lit(i)).otherwise(expr)
    return df.withColumn(bucket_col, expr.cast("int"))


def bucket_padding_stats(
    df: DataFrame,
    length_col: str,
    n_buckets: int,
) -> DataFrame:
    """Per-bucket padding economics: (bucket, n_docs, min_len, max_len,
    pad_waste) where pad_waste = 1 - sum(len)/(n_docs*max_len) — the
    fraction of a batch's tokens that would be padding if every doc in
    the bucket pads to the bucket max. The un-bucketed waste (pad to
    corpus max) is what this operator exists to beat."""
    b = bucket_by_length(df, length_col, n_buckets)
    c = F.col(length_col)
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(c).alias("min_len"),
            F.max(c).alias("max_len"),
            (
                F.floor(
                    (1 - F.sum(c) / (F.count("*") * F.max(c))) * 1e6 + F.lit(0.5)
                )
                / 1e6
            ).alias("pad_waste"),
        )
    )
