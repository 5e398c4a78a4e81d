"""C4-style line-cleaning semantics and deterministic shard-and-shuffle
contracts (both r5 training-data-assembly operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions import text_stats as ts
from sparkstreamingtwitter_presidential_spark.operators import sampling as smp


def _clean(spark, text):
    df = spark.createDataFrame([Row(id=1, text=text)])
    arrs = df.select(
        "id", "text", ts.clean_lines("text").alias("lines")
    ).select("id", "text", "lines", ts.c4_kept_lines("lines").alias("kept"))
    r = arrs.select(
        F.col("kept"),
        ts.c4_doc_pass("text", "kept").alias("ok"),
    ).collect()[0]
    return list(r["kept"]), r["ok"]


def test_c4_line_rules(spark):
    kept, _ = _clean(
        spark,
        "This sentence survives the filter.\n"
        "no terminal punctuation here\n"
        "Too short.\n"
        "An embedded javascript tracker line.\n"
        "Another good sentence stays put!\n",
    )
    assert kept == [
        "This sentence survives the filter.",
        "Another good sentence stays put!",
    ]


def test_c4_doc_gates(spark):
    good = "One good line here.\nSecond good line here.\nThird good line here."
    assert _clean(spark, good)[1] is True
    # too few kept lines
    assert _clean(spark, "Only one good line here.")[1] is False
    # lorem ipsum placeholder anywhere in the doc
    assert _clean(spark, good + "\nLorem Ipsum dolor sit amet.")[1] is False
    # curly braces (code) anywhere in the doc
    assert _clean(spark, good + "\nif (x) { y(); }")[1] is False


def _docs(spark, n=200):
    return spark.createDataFrame(
        [Row(doc_id=i, source=f"s{i % 3}") for i in range(n)]
    )


def test_shuffle_is_a_partition_with_contiguous_positions(spark):
    d = _docs(spark)
    out = smp.sharded_shuffle(d, "doc_id", n_shards=8).collect()
    assert len(out) == 200
    assert {r["doc_id"] for r in out} == set(range(200))
    assert all(0 <= r["shard"] < 8 for r in out)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_deterministic_and_partitioning_invariant(spark):
    d = _docs(spark)
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in smp.sharded_shuffle(d, "doc_id", n_shards=8).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in smp.sharded_shuffle(
             d.repartition(13), "doc_id", n_shards=8).collect()}
    assert a == b


def test_shuffle_salt_reshuffles(spark):
    d = _docs(spark)
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in smp.sharded_shuffle(d, "doc_id", 8, salt=0).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in smp.sharded_shuffle(d, "doc_id", 8, salt=1).collect()}
    assert a != b


def test_shuffle_actually_shuffles(spark):
    """Within a shard, hash order must not be id order (the whole
    point); Kendall-style check: many adjacent inversions vs ids."""
    d = _docs(spark, 400)
    rows = smp.sharded_shuffle(d, "doc_id", n_shards=2).collect()
    shard0 = sorted(
        (r["pos"], r["doc_id"]) for r in rows if r["shard"] == 0
    )
    ids = [doc for _, doc in shard0]
    inversions = sum(1 for x, y in zip(ids, ids[1:]) if x > y)
    assert inversions > len(ids) / 4, "hash order looks like id order"


def test_shuffle_rejects_bad_shards(spark):
    with pytest.raises(ValueError, match="n_shards"):
        smp.sharded_shuffle(_docs(spark), "doc_id", n_shards=0)
