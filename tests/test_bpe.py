"""BPE tokenizer: the distributed train/encode pair against an
independent pure-Python twin, plus hand-computable semantics."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators import bpe
from sparkstreamingtwitter_presidential_spark.io import load_table
from tests.conftest import SF_DIR

# Python-re twin of text_stats.BPE_TOKEN_RE (Java \p{L}/\p{N} -> re
# unicode classes). Only used to sanity the histogram on ASCII fixture
# text, where the two dialects agree.
_PY_TOKEN_RE = re.compile(r"[^\W\d_]+|\d+|[^\s\w]", re.UNICODE)


# ---------------------------------------------------------------- twin


def _twin_train(word_counts: dict[str, int], num_merges: int):
    """Independent reimplementation of classic BPE for differential
    testing (deliberately different data structures from bpe.py)."""
    state = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + word_counts[w]
        if not pair_counts:
            break
        best = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append(best)
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges, state


# ---------------------------------------------------------------- tests


def test_merge_loop_hand_case():
    # histogram {aaab:5, aab:3}: (a,a)=13 beats (a,b)=8; after the
    # merge, (aa,a)=5 ties (a,b)=5 and lexicographic order picks (a,b).
    merges = bpe.merge_loop([("aaab", 5), ("aab", 3)], 2)
    assert merges == [("a", "a"), ("a", "b")]


def test_train_matches_twin_on_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe.train_bpe(docs, num_merges=40, max_words=5000)

    texts = [r["text"] for r in docs.select("text").collect()]
    counts: dict[str, int] = {}
    for t in texts:
        for w in _PY_TOKEN_RE.findall(t):
            counts[w] = counts.get(w, 0) + 1
    twin_merges, _ = _twin_train(counts, 40)
    assert merges == twin_merges


def test_train_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = bpe.train_bpe(docs, num_merges=12, max_words=1000)
    b = bpe.train_bpe(docs, num_merges=12, max_words=1000)
    assert a == b and len(a) == 12


def test_encode_round_trips_and_matches_twin(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(80)
    merges = bpe.train_bpe(docs, num_merges=30, max_words=5000)
    encoded = bpe.bpe_encode(docs, merges).select("doc_id", "text", "tokens")
    rows = encoded.collect()
    assert len(rows) == 80
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = set("".join(r["text"] for r in rows)) - set(" \t\n")
    vocab |= {a + b for a, b in merges}
    for r in rows:
        words = _PY_TOKEN_RE.findall(r["text"])
        # concatenation invariant: tokens spell the pre-token stream
        assert "".join(r["tokens"]) == "".join(words)
        # every token is alphabet or a merge product
        assert all(t in vocab for t in r["tokens"])
        # per-word twin: encode_word is the only merge-application path
        twin = []
        for w in words:
            twin.extend(bpe.encode_word(w, ranks))
        assert r["tokens"] == twin


def test_more_merges_fewer_tokens(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(60)
    m64 = bpe.train_bpe(docs, num_merges=64, max_words=5000)
    n_chars = bpe.bpe_encode(docs, []).select(
        F.sum(F.size("tokens")).alias("n")
    ).collect()[0]["n"]
    n_bpe = bpe.bpe_encode(docs, m64).select(
        F.sum(F.size("tokens")).alias("n")
    ).collect()[0]["n"]
    assert n_bpe < n_chars
    # merge-list prefix property: first k merges of a longer training
    # run equal a shorter run's list (greedy loop is prefix-stable)
    m16 = bpe.train_bpe(docs, num_merges=16, max_words=5000)
    assert m64[:16] == m16


def test_encode_plan_is_map_only(spark):
    docs = load_table(spark, SF_DIR, "documents")
    merges = [("t", "h"), ("th", "e")]
    plan = (
        bpe.bpe_encode(docs, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_merges_artifact_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    merges = bpe.train_bpe(docs, num_merges=10, max_words=1000)
    p = str(tmp_path / "merges.json")
    bpe.save_merges(merges, p)
    assert bpe.load_merges(p) == merges


def test_encode_word_concatenation_property():
    """Pure-Python property sweep (no Spark): for arbitrary words and
    merge tables drawn from the word's own pairs, tokens always spell
    the word and all merge products come from adjacent pairs."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abcdefg", min_size=1, max_size=12),
        st.integers(min_value=0, max_value=6),
    )
    def check(word, n_merges):
        pairs = sorted({(a, b) for a, b in zip(word, word[1:])})
        merges = []
        syms = list(word)
        for p in pairs[:n_merges]:
            merges.append(p)
        ranks = {p: i for i, p in enumerate(merges)}
        toks = bpe.encode_word(word, ranks)
        assert "".join(toks) == word
        assert all(len(t) >= 1 for t in toks)

    check()
