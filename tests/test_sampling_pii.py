"""Operator-level contracts for deterministic sampling and PII
scrubbing (the driver oracles prove cross-engine equality; these pin
the semantic promises the oracles can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions import text_stats as ts
from sparkstreamingtwitter_presidential_spark.operators import sampling as smp

SF_DIR = "/root/testdata/sf0.1"  # documents don't scale below sf0.1


def _docs(spark):
    from sparkstreamingtwitter_presidential_spark.io import load_table

    return load_table(spark, SF_DIR, "documents")


def test_sample_rates_converge_per_stratum(spark):
    """Observed keep-rate per stratum tracks the requested rate (binomial
    tolerance at n=250 per source)."""
    d = _docs(spark).select("doc_id", "source")
    rates = {"src0": 0.5, "src1": 0.1}
    kept = smp.stratified_sample(d, "doc_id", "source", rates, default_rate=0.0)
    totals = dict(d.groupBy("source").count().collect())
    observed = dict(kept.groupBy("source").count().collect())
    assert set(observed) <= set(rates)  # default 0.0 drops every other stratum
    for src, rate in rates.items():
        got = observed.get(src, 0) / totals[src]
        # 4-sigma binomial window around the target rate
        sigma = (rate * (1 - rate) / totals[src]) ** 0.5
        assert abs(got - rate) <= 4 * sigma, f"{src}: {got} vs {rate}"


def test_sample_is_deterministic_and_partition_independent(spark):
    """The same rows are kept regardless of how the input is partitioned
    — the property seeded df.sample cannot give."""
    d = _docs(spark).select("doc_id")
    a = {r.doc_id for r in smp.deterministic_sample(d, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in smp.deterministic_sample(d.repartition(7), "doc_id", 0.3).collect()
    }
    assert a == b and 0 < len(a) < 5000


def test_sample_hash_matches_duckdb_for_negative_ids(spark):
    """Spark pmod vs SQL %: the oracle's pmod-equivalent form
    ((x % m) + m) % m must select the exact same rows for ALL int64 ids,
    negative included (r2 advice — bare % takes the dividend's sign in
    DuckDB and silently diverges)."""
    import duckdb

    ids = list(range(-500, 500))
    d = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id for r in smp.deterministic_sample(d, "doc_id", 0.3).collect()}
    thr = smp.rate_threshold(0.3)
    want = {
        r[0]
        for r in duckdb.sql(
            "SELECT i FROM (SELECT unnest(range(-500, 500)) AS i) "
            f"WHERE (((i * {smp.HASH_MULT}) % {smp.HASH_MOD}) + {smp.HASH_MOD})"
            f" % {smp.HASH_MOD} < {thr}"
        ).fetchall()
    }
    assert got == want and 0 < len(got) < len(ids)


def test_subset_rates_nest(spark):
    """Lower rates select subsets of higher rates (same hash, smaller
    threshold) — so shrinking a mix never introduces unseen rows."""
    d = _docs(spark).select("doc_id")
    small = {r.doc_id for r in smp.deterministic_sample(d, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in smp.deterministic_sample(d, "doc_id", 0.4).collect()}
    assert small <= big


def test_scrub_pii_redacts_and_is_idempotent(spark):
    rows = [
        (1, "mail me at jane.doe+spam@mail.example.org today"),
        (2, "server 192.168.001.1 port"),
        (3, "call +1-555-0199 00 now"),
        (4, "clean text, nothing to redact"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    once = df.select("id", ts.scrub_pii("t").alias("s"))
    got = {r.id: r.s for r in once.collect()}
    assert got[1] == "mail me at [EMAIL] today"
    assert got[2] == "server [IP] port"
    assert got[3] == "call [PHONE] now"
    assert got[4] == rows[3][1]
    twice = once.select("id", ts.scrub_pii("s").alias("s2"))
    assert {r.id: r.s2 for r in twice.collect()} == got  # placeholders stay put


def test_pii_counts_match_scrub_chain(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co and c@d.org via 10.0.0.1 call +1-555-0100 42")],
        "id int, t string",
    )
    counts = ts.pii_counts(F.col("t"))
    r = df.select(
        counts["n_emails"].alias("e"), counts["n_ips"].alias("i"), counts["n_phones"].alias("p")
    ).collect()[0]
    assert (r.e, r.i, r.p) == (2, 1, 1)


def test_weighted_mix_full_copies_and_fractions(spark):
    """Weight 2.0 -> exactly two full copies; weight 1.5 -> one full copy
    plus ~half on epoch 1; weight 0.4 -> ~40% on epoch 0; unlisted ->
    absent. Epoch 0 of a weight>=1 stratum is the whole stratum."""
    d = _docs(spark).select("doc_id", "source")
    mixed = smp.weighted_mix(
        d, "doc_id", "source", {"src0": 2.0, "src1": 1.5, "src2": 0.4}
    )
    totals = dict(d.groupBy("source").count().collect())
    by = {
        (r["source"], r["epoch"]): r["count"]
        for r in mixed.groupBy("source", "epoch").count().collect()
    }
    assert by[("src0", 0)] == totals["src0"]
    assert by[("src0", 1)] == totals["src0"]
    assert by[("src1", 0)] == totals["src1"]
    assert 0.35 * totals["src1"] <= by[("src1", 1)] <= 0.65 * totals["src1"]
    assert 0.25 * totals["src2"] <= by[("src2", 0)] <= 0.55 * totals["src2"]
    assert ("src2", 1) not in by
    assert not any(s == "src3" for s, _ in by)


def test_weighted_mix_epoch_fractions_decorrelated(spark):
    """The fractional subset of epoch 1 must differ from epoch 0's (the
    salt works): two half-rate epochs of the same stratum overlap on
    roughly a quarter, never all."""
    d = _docs(spark).select("doc_id", "source")
    mixed = smp.weighted_mix(d, "doc_id", "source", {"src4": 1.5})
    e1 = {r["doc_id"] for r in mixed.filter("epoch = 1").collect()}
    half0 = {
        r["doc_id"]
        for r in smp.stratified_sample(
            d.filter("source = 'src4'"), "doc_id", "source", {"src4": 0.5}
        ).collect()
    }
    assert e1 and half0
    overlap = len(e1 & half0) / min(len(e1), len(half0))
    assert overlap < 0.8, "epoch salt failed to decorrelate selections"


def test_weighted_mix_all_zero_weights_raises(spark):
    """Every weight 0.0 passes the negative check but selects nothing;
    that must be a clear ValueError, not an IndexError deep inside."""
    import pytest

    d = _docs(spark).select("doc_id", "source")
    with pytest.raises(ValueError, match="zero"):
        smp.weighted_mix(d, "doc_id", "source", {"src0": 0.0, "src1": 0.0})


def test_weighted_mix_epoch0_matches_identity_hash(spark):
    """epoch_hash(id, 0) == sample_hash(id): a weight-1.0 mix selects
    exactly the rows deterministic_sample(rate=1.0) keeps (everything),
    and fraction-only mixes agree with stratified_sample."""
    d = _docs(spark).select("doc_id", "source")
    frac = smp.weighted_mix(d, "doc_id", "source", {"src5": 0.3})
    strat = smp.stratified_sample(d, "doc_id", "source", {"src5": 0.3})
    assert {r["doc_id"] for r in frac.collect()} == {
        r["doc_id"] for r in strat.collect()
    }


def test_split_assign_partitions_exactly(spark):
    from sparkstreamingtwitter_presidential_spark.operators.sampling import split_assign

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 2000  # partition: no dup, no drop
    sizes = {}
    for r in rows:
        sizes[r["split"]] = sizes.get(r["split"], 0) + 1
    assert set(sizes) == {"train", "val", "test"}
    # hash-measure fractions land near nominal on 2k sequential ids
    assert abs(sizes["train"] / 2000 - 0.8) < 0.05
    assert abs(sizes["val"] / 2000 - 0.1) < 0.03
    assert abs(sizes["test"] / 2000 - 0.1) < 0.03


def test_split_assign_salt_redeals_and_is_deterministic(spark):
    from sparkstreamingtwitter_presidential_spark.operators.sampling import split_assign

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.5, "test": 0.5}
    a = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id", fr).collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id", fr).collect()}
    c = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id", fr, salt=7).collect()}
    assert a == b  # rerun-stable
    assert a != c  # salt rotates the holdout
    assert sum(v != a[k] for k, v in c.items()) > 50


def test_split_assign_validates_fractions(spark):
    import pytest

    from sparkstreamingtwitter_presidential_spark.operators.sampling import split_assign

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", {})
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", {"a": 1.5, "b": -0.5})
