"""Distributed BPE tokenizer: corpus-scale training and encoding.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") is the tokenizer family behind
modern LLM pipelines; a training-data engine needs BOTH halves:

  train_bpe    learn a merge list from a corpus. The corpus-sized
               step — the word histogram — runs distributed (one
               pre-tokenize + groupBy shuffle over the full corpus);
               the merge loop then runs driver-side over the bounded
               top-``max_words`` histogram. That split is exactly how
               production tokenizer training works (count words with
               the cluster, fit the tokenizer on the counter): at
               100 TB the distinct-word histogram is ~1e8 rows, the
               mass-covering top slice a few hundred thousand — merge
               selection on the truncated histogram is the standard
               practical approximation and the driver cost is
               O(max_words * num_merges) on metadata-sized input,
               never corpus-sized.
  bpe_encode   apply a learned merge list to every document: map-only
               (ZERO shuffle). Pre-tokenization happens JVM-side with
               the exact same regex as text_stats.bpe_token_count so
               count and encode agree; the merge application is an
               Arrow-batched mapInPandas with per-batch word
               memoization — Zipf's law means the hot words hit the
               memo dict, so per-row work collapses to a lookup.

Determinism: merge selection breaks count ties by lexicographically
smallest pair; the histogram truncation breaks count ties by word.
Two trainings over the same corpus produce identical merge lists, and
encoding is a pure function of (text, merges).

Encoding applies merges in learned-rank order (lowest rank first, all
occurrences left-to-right), which reproduces exactly the symbol
sequences the training loop saw — asserted against an independent
pure-Python twin in tests/test_bpe.py.

Extension op (not reference parity): the reference's text pipeline
stops at char bigrams (Collector.scala:73-76); BPE is part of the
north-star LLM-pipeline extension surface (SURVEY.md §4 custom-rule
assessment / BASELINE.json).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkstreamingtwitter_presidential_spark.functions.text_stats import BPE_TOKEN_RE

Pair = tuple[str, str]


# ---------------------------------------------------------------- training


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, weight) for every distinct pre-token in the corpus.

    The one corpus-scale step of training: JVM-side regex pre-tokenize
    (same BPE_TOKEN_RE as token counting), explode, hash-aggregate.
    Partial aggregation (map-side combine) means the shuffle carries
    distinct words per task, not corpus tokens.
    """
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
    )


def _pair_counts(
    histogram: Iterable[tuple[tuple[str, ...], int]],
) -> dict[Pair, int]:
    counts: dict[Pair, int] = {}
    for syms, weight in histogram:
        for pair in zip(syms, syms[1:]):
            counts[pair] = counts.get(pair, 0) + weight
    return counts


def _apply_merge(syms: tuple[str, ...], pair: Pair, joined: str) -> tuple[str, ...]:
    """Merge all left-to-right occurrences of ``pair`` in ``syms``."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def merge_loop(
    histogram: list[tuple[str, int]], num_merges: int
) -> list[Pair]:
    """The classic BPE merge loop over an in-memory word histogram.

    Each iteration: count adjacent symbol pairs (weighted by word
    frequency), merge the most frequent pair everywhere. Ties break to
    the lexicographically smallest pair, so the result is a pure
    function of the histogram.
    """
    state = [(tuple(word), weight) for word, weight in histogram]
    merges: list[Pair] = []
    for _ in range(num_merges):
        counts = _pair_counts(state)
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        joined = best[0] + best[1]
        state = [(_apply_merge(s, best, joined), w) for s, w in state]
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 256,
    max_words: int = 100_000,
) -> list[Pair]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Distributed histogram -> bounded top-``max_words`` slice (count
    desc, word asc — deterministic) -> driver merge loop. The collect
    is metadata-sized by construction: ``max_words`` rows of
    (word, weight), never corpus rows.
    """
    hist_rows = (
        word_histogram(docs, text_col)
        .orderBy(F.col("weight").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return merge_loop([(r["word"], r["weight"]) for r in hist_rows], num_merges)


# ---------------------------------------------------------------- encoding


def encode_word(word: str, ranks: dict[Pair, int]) -> list[str]:
    """Tokenize one pre-token by applying merges in rank order.

    Repeatedly find the present pair with the lowest merge rank and
    merge all its occurrences — exactly the sequence of states the
    training loop produced, so train-then-encode round-trips.
    """
    syms: list[str] = list(word)
    while len(syms) > 1:
        best_rank: int | None = None
        best_pair: Pair | None = None
        for pair in zip(syms, syms[1:]):
            rank = ranks.get(pair)
            if rank is not None and (best_rank is None or rank < best_rank):
                best_rank, best_pair = rank, pair
        if best_pair is None:
            break
        syms = list(_apply_merge(tuple(syms), best_pair, best_pair[0] + best_pair[1]))
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[Pair],
    text_col: str = "text",
    output_col: str = "tokens",
) -> DataFrame:
    """All input columns + ``output_col``: array<string> of BPE tokens.

    Plan shape: one JVM-side ``regexp_extract_all`` projection (same
    regex as token counting — pre-tokenization semantics are shared by
    construction, not by parallel reimplementation), then a map-only
    Arrow-batched mapInPandas that applies the merge table per word
    with a memo dict. No shuffle, no driver data movement; the merge
    table ships once per task in the closure (a few KB per thousand
    merges).
    """
    pre_col = "__bpe_pre"
    with_pre = docs.withColumn(
        pre_col,
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0)),
    )
    out_schema = T.StructType(
        list(docs.schema.fields) + [T.StructField(output_col, T.ArrayType(T.StringType()))]
    )
    ranks = {pair: i for i, pair in enumerate(merges)}
    keep = [f.name for f in docs.schema.fields]

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(words: list[str]) -> list[str]:
            out: list[str] = []
            for w in words:
                hit = memo.get(w)
                if hit is None:
                    hit = encode_word(w, ranks)
                    memo[w] = hit
                out.extend(hit)
            return out

        for batch in batches:
            result = batch[keep].copy()
            result[output_col] = [enc(list(ws)) for ws in batch[pre_col]]
            yield result

    return with_pre.mapInPandas(encode_batches, schema=out_schema)


# ------------------------------------------------------------------ artifact


def save_merges(merges: list[Pair], path: str) -> None:
    """Persist a merge list as a JSON artifact (rank order == list
    order — the entire tokenizer state; model-persistence parity with
    the ML sinks, SURVEY.md §2.8 ML4)."""
    import json

    with open(path, "w") as f:
        json.dump([[a, b] for a, b in merges], f)


def load_merges(path: str) -> list[Pair]:
    import json

    with open(path) as f:
        return [(a, b) for a, b in json.load(f)]
