"""Operator-level contracts for sequence packing, token chunking, and
BM25 search (the driver oracles prove cross-engine equality; these pin
the semantic promises on hand-computable fixtures)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators.packing import (
    pack_sequences,
    token_chunks,
)
from sparkstreamingtwitter_presidential_spark.operators.search import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_golden(spark):
    """Hand-packed: budget 10, tokens [5, 5, 5] -> bins [0, 0, 1] with
    offsets [0, 5, 0]; an oversized doc straddles bins boundary-wise."""
    d = _docs(
        spark,
        [
            (0, "a", "t t t t t"),
            (1, "a", "t t t t t"),
            (2, "a", "t t t t t"),
            # 12 tokens: starts at cumsum 15 -> bin 1, offset 5
            (3, "a", " ".join(["t"] * 12)),
            # next doc starts at 27 -> bin 2, offset 7
            (4, "a", "t t"),
            (5, "b", "t"),  # separate group restarts at bin 0
        ],
    )
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"], r["n_tokens"])
        for r in pack_sequences(d, budget=10).collect()
    }
    assert got == {
        0: (0, 0, 5),
        1: (0, 5, 5),
        2: (1, 0, 5),
        3: (1, 5, 12),
        4: (2, 7, 2),
        5: (0, 0, 1),
    }


def test_pack_rejects_bad_budget(spark):
    d = _docs(spark, [(0, "a", "t")])
    with pytest.raises(ValueError):
        pack_sequences(d, budget=0)


def test_chunks_golden_and_reassembly(spark):
    """5 tokens at chunk size 2 -> ['a b', 'c d', 'e']; joining chunks
    in order reproduces the whitespace-normalized document."""
    d = _docs(spark, [(0, "a", "a b c d e"), (1, "a", "x"), (2, "a", "p q")])
    rows = token_chunks(d, chunk_tokens=2).collect()
    by_doc: dict[int, list[tuple[int, str]]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_index"], r["chunk_text"]))
    chunks = {k: [t for _, t in sorted(v)] for k, v in by_doc.items()}
    assert chunks == {0: ["a b", "c d", "e"], 1: ["x"], 2: ["p q"]}
    assert " ".join(chunks[0]) == "a b c d e"


def test_bm25_golden(spark):
    """3-doc corpus, query {'cat'}: score computed by hand with the same
    formula; the doc mentioning 'cat' twice in fewer tokens ranks first."""
    d = _docs(
        spark,
        [
            (0, "a", "cat cat dog"),  # tf=2, dl=3
            (1, "a", "cat dog bird fish mouse"),  # tf=1, dl=5
            (2, "a", "dog bird"),  # no hit
        ],
    )
    got = [
        (r["doc_id"], r["n_terms_hit"], r["score"])
        for r in bm25_topk(d, ["cat"], k=5).collect()
    ]
    n_docs, avgdl = 3, (3 + 5 + 2) / 3  # avgdl spans the whole corpus
    idf = math.log(1 + (n_docs - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        raw = idf * (tf * (BM25_K1 + 1)) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)
        )
        return math.floor(raw * 10000.0 + 0.5) / 10000.0

    assert got == [(0, 1, score(2, 3)), (1, 1, score(1, 5))]
    assert got[0][2] > got[1][2]


def test_bm25_multi_term_and_absent_term(spark):
    """n_terms_hit counts distinct matched query terms; a vocabulary
    term absent from the corpus contributes nothing (no NaN/inf)."""
    d = _docs(
        spark,
        [
            (0, "a", "cat dog"),
            (1, "a", "cat cat cat"),
            (2, "a", "fish"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_topk(d, ["cat", "dog", "unicorn"], k=5).collect()
    }
    assert set(got) == {0, 1}
    assert got[0][0] == 2 and got[1][0] == 1
    assert all(math.isfinite(s) for _, s in got.values())
    # two matched terms beat one repeated term here (tf saturation)
    assert got[0][1] > got[1][1]


def test_strided_chunks_cover_and_overlap(spark):
    from sparkstreamingtwitter_presidential_spark.operators.packing import (
        strided_token_chunks,
        token_chunks,
    )

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6"), (2, "a b"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_index"]): r["chunk_text"]
        for r in strided_token_chunks(docs, chunk_tokens=4, stride=2).collect()
    }
    # 7 tokens, size 4, stride 2 -> starts 0,2,4 (last window short)
    assert got == {
        (1, 0): "t0 t1 t2 t3",
        (1, 1): "t2 t3 t4 t5",
        (1, 2): "t4 t5 t6",
        (2, 0): "a b",
    }
    # stride == chunk degenerates to token_chunks exactly
    a = sorted(
        map(tuple, strided_token_chunks(docs, chunk_tokens=3, stride=3).collect())
    )
    b = sorted(map(tuple, token_chunks(docs, chunk_tokens=3).collect()))
    assert a == b


def test_strided_chunks_validate_stride(spark):
    import pytest

    from sparkstreamingtwitter_presidential_spark.operators.packing import strided_token_chunks

    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        strided_token_chunks(d, chunk_tokens=4, stride=0)
    with pytest.raises(ValueError):
        strided_token_chunks(d, chunk_tokens=4, stride=5)


def test_hybrid_rrf_with_dead_lexical_leg(spark):
    """Query terms matching nothing: the lexical leg is empty and the
    fused ranking degenerates to the semantic leg's RRF scores."""
    from sparkstreamingtwitter_presidential_spark.operators.search import hybrid_rrf_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = hybrid_rrf_topk(docs, emb, ["zzzqqqxxx"], 101, k_each=5, k=3).collect()
    assert len(out) == 3
    assert all(r.rank_lex is None and r.rank_sem is not None for r in out)
    assert [r.rank_sem for r in out] == [1, 2, 3]


def test_bucket_by_length_equal_frequency_and_order(spark):
    from sparkstreamingtwitter_presidential_spark.operators.packing import (
        bucket_by_length,
        length_bucket_boundaries,
    )

    df = spark.range(1000).select((F.col("id") + 1).alias("len"))
    out = bucket_by_length(df, "len", 4)
    sizes = {r.bucket: r.cnt for r in out.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert all(abs(v - 250) <= 1 for v in sizes.values())  # equal frequency
    # order preserved: every member of bucket k is <= every member of k+1
    maxes = {r.bucket: r.m for r in out.groupBy("bucket").agg(F.max("len").alias("m")).collect()}
    mins = {r.bucket: r.m for r in out.groupBy("bucket").agg(F.min("len").alias("m")).collect()}
    assert maxes[0] <= mins[1] and maxes[1] <= mins[2] and maxes[2] <= mins[3]
    with pytest.raises(ValueError, match="n_buckets"):
        length_bucket_boundaries(df, "len", 1)


def test_bucketing_reduces_padding_waste(spark):
    """The operator's raison d'etre: per-bucket padding waste must be
    well under the pad-to-corpus-max waste on a skewed length mix."""
    from sparkstreamingtwitter_presidential_spark.operators.packing import (
        bucket_padding_stats,
    )

    # bimodal: many short docs, few very long ones — the bad case for
    # corpus-max padding
    df = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, F.col("id") % 97 + 900)
        .otherwise(F.col("id") % 37 + 10)
        .alias("len")
    )
    stats = bucket_padding_stats(df, "len", 4).collect()
    total = df.agg(
        (1 - F.sum("len") / (F.count("*") * F.max("len"))).alias("w")
    ).first()["w"]
    assert total > 0.8  # corpus-max padding is terrible here
    weighted = sum(r.pad_waste * r.n_docs for r in stats) / sum(
        r.n_docs for r in stats
    )
    assert weighted < total / 2  # bucketing at least halves the waste
