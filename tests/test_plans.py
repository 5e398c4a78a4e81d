"""Plan-property tests: assert the physical plans the 100 TB design
depends on — dims broadcast, predicates/pruning reach the parquet scan,
top-k avoids a global sort, aggregation is single-shuffle."""

from __future__ import annotations

from sparkstreamingtwitter_presidential_spark.plans import plan_audit
from sparkstreamingtwitter_presidential_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"
REGISTRY = load_all()


def _audit(spark, name):
    return plan_audit(REGISTRY[name].fn(spark, SF_DIR))


def test_dim_joins_broadcast(spark):
    a = _audit(spark, "join_broadcast_dims")
    assert a.n_broadcast_joins == 2
    assert a.n_sortmerge_joins == 0
    # fact side never shuffles before the aggregate: only the final
    # aggregate exchange remains
    assert a.n_exchanges <= 1


def test_q1_pushdown_and_pruning(spark):
    a = _audit(spark, "tpch_q1_pricing_summary")
    assert any("l_shipdate" in f for f in a.pushed_filters)
    # scan reads only the 7 needed columns of 11
    assert a.read_schemas and "l_orderkey" not in a.read_schemas[0]
    assert a.n_exchanges == 1  # partial agg -> single shuffle -> final agg


def test_topk_uses_take_ordered_not_global_sort(spark):
    a = _audit(spark, "sort_top_orders")
    assert a.has_take_ordered
    assert a.n_exchanges == 0  # no shuffle at all for top-k


def test_selective_filter_pushdown_in_q3(spark):
    a = _audit(spark, "tpch_q3_shipping_priority")
    assert any("BUILDING" in f or "c_mktsegment" in f for f in a.pushed_filters)


def test_jaccard_length_filter_is_in_join_not_post_agg(spark):
    """The size-compatibility prune must run inside the posting-list
    join (bounding its fan-out) — not as a filter after the per-pair
    aggregation, where it would be too late to help. No cartesian
    product anywhere."""
    a = _audit(spark, "dedup_ngram_jaccard_pairs")
    assert "CartesianProduct" not in a.text and "BroadcastNestedLoopJoin" not in a.text
    join_part = a.text.split("HashAggregate")[-1]  # below the pair agg
    assert "n_sh" in join_part, "length filter not in the join subtree"


def test_ivf_probe_broadcasts_query_side(spark):
    """IVF candidate generation joins corpus cells against the tiny
    exploded query-probe side — the probe side must broadcast; the
    corpus must never land in a nested loop."""
    a = _audit(spark, "sim_ivf_topk")
    assert a.n_broadcast_joins >= 1
    assert "CartesianProduct" not in a.text
    # r16: the recall-gate join against the bounded exact twin
    # (TOP_K x |QUERY_IDS| rows) is broadcast-hinted — the engine's
    # last static SortMergeJoin is gone
    assert a.n_sortmerge_joins == 0


def test_q8_seven_table_join_stays_broadcast_single_exchange(spark):
    """Q8's 7-table star join must resolve every dim side as a broadcast
    hash join (no sort-merge on the fact path) with the PROMO/ASIA
    filters pushed to the scans and ONE exchange (the final group-by) —
    the shape that survives a 100x fact scale-up."""
    a = _audit(spark, "tpch_q8_market_share")
    assert a.n_sortmerge_joins == 0
    assert a.n_broadcast_joins >= 4
    assert a.n_exchanges == 1
    assert any("PROMO" in f for f in a.pushed_filters)
    assert "CartesianProduct" not in a.text


def test_q15_scalar_max_is_broadcast_not_rescan(spark):
    """Q15's scalar max(total_revenue) must broadcast one row back onto
    the revenue aggregate — never re-aggregate lineitem per supplier.
    The date range filter must reach the parquet scan."""
    a = _audit(spark, "tpch_q15_top_supplier")
    assert a.n_broadcast_joins >= 2
    assert any("l_shipdate" in f for f in a.pushed_filters)
    assert "CartesianProduct" not in a.text


def test_repetition_signals_map_only(spark):
    """The repetition-signal pass is pure per-row expression work: one
    pruned scan (doc_id, text), zero exchanges — at 100 TB it runs at
    scan speed."""
    a = _audit(spark, "text_repetition_signals")
    assert a.n_exchanges == 0
    assert a.read_schemas and "lang" not in a.read_schemas[0]
    assert any("IsNotNull(text)" in f for f in a.pushed_filters)


def test_c4_clean_map_only(spark):
    """C4 line cleaning is pure per-row expression work: one pruned
    scan, zero exchanges — runs at scan speed at any corpus size."""
    a = _audit(spark, "text_c4_line_clean")
    assert a.n_exchanges == 0
    assert a.read_schemas and "lang" not in a.read_schemas[0]


def test_sharded_shuffle_single_exchange_no_global_sort(spark):
    """The shard-and-shuffle must cost exactly ONE hash-partition
    exchange (on shard) with per-shard window sorts — a global Sort or
    range exchange would single-thread the corpus at scale."""
    a = _audit(spark, "shuffle_documents_sharded")
    assert a.n_exchanges == 1
    assert "Exchange rangepartitioning" not in a.text
    assert "TakeOrderedAndProject" not in a.text


def test_partitioned_read_has_partition_filters(spark):
    """The hive-layout query's source filter must prune DIRECTORIES
    (PartitionFilters on the scan), not rows after listing."""
    a = _audit(spark, "io_partitioned_parquet_agg")
    assert any("source" in f for f in a.partition_filters), a.partition_filters


def test_salted_join_explodes_dim_no_cartesian(spark):
    """The salt must appear as a Generate (dim replicated per salt) and
    the join must stay an equi-join — a CartesianProduct would mean the
    salt key fell out of the join condition."""
    a = _audit(spark, "salted_join_order_segment")
    assert "Generate" in a.text
    assert "CartesianProduct" not in a.text
    assert a.n_exchanges <= 2  # (optional join shuffle) + final agg


def test_unigram_scalar_total_broadcasts(spark):
    """The corpus total must reach per-doc scoring as a broadcast
    single-row join — never a re-aggregation per doc; wordcount +
    word-join + doc-agg bound the exchanges."""
    a = _audit(spark, "text_unigram_logprob")
    assert a.n_exchanges <= 4
    assert a.n_broadcast_joins >= 1 or "BroadcastNestedLoopJoin" in a.text


def test_canonicalize_broadcasts_labels_single_window_exchange(spark):
    """Survivor selection must broadcast the (tiny) labels table on
    both the inner and anti join, leaving ONE exchange — the
    per-component window over the clustered slice only."""
    a = _audit(spark, "dedup_canonicalize")
    assert a.n_broadcast_joins >= 2
    assert a.n_exchanges == 1
    assert "CartesianProduct" not in a.text


def test_oov_vocab_broadcasts(spark):
    """The top-V vocabulary must broadcast onto the token stream (a
    shuffle join on words would shuffle the corpus twice)."""
    a = _audit(spark, "text_oov_rate")
    assert a.n_broadcast_joins >= 1
    assert a.n_exchanges <= 3


def test_ivfpq_cell_prune_precedes_encode(spark):
    """IVF-PQ's probe-cell filter must sit BELOW the PQ encode map
    (filters cannot push through opaque Python maps, so the operator
    places it there by construction): exactly two MapInPandas (encode +
    ADC scan), the cell IN-filter feeding the encode's input from the
    cached assignment table, and no cartesian anywhere."""
    import re

    a = _audit(spark, "sim_ivfpq_topk")
    assert a.text.count("MapInPandas") == 2
    below_last_map = a.text.split("MapInPandas")[-1]
    assert re.search(r"\bcell#\d+", below_last_map), (
        "cell filter not below the encode map"
    )
    assert "CartesianProduct" not in a.text


def test_ivf_production_path_is_single_treatment(spark):
    """With the recall gate off (production path), the IVF query must be
    the probe alone: no brute-force twin join (no in_exact_topk column),
    exactly one parquet scan of the embeddings corpus feeding the cached
    assignment table, and no extra exchanges from the exact twin."""
    from sparkstreamingtwitter_presidential_spark.queries.similarity import (
        ivf_topk_query,
    )

    df = ivf_topk_query(spark, SF_DIR, check_recall=False)
    assert "in_exact_topk" not in df.columns
    a = plan_audit(df)
    assert "MapInPandas" not in a.text, "exact brute-force twin leaked in"
    # corpus is read once into the persisted assignment table; both the
    # query side and the candidate join consume the cache. Since r15
    # the KMeans feature frame is ALSO persisted (fit-time win), and it
    # feeds the assignment table, so each of the two assignment-cache
    # consumers prints a nested scan of the feature cache: 2 consumers
    # x (assignment cache + nested feature cache) = 4.
    assert a.text.count("InMemoryTableScan") == 4
    assert "CartesianProduct" not in a.text


def test_bruteforce_topk_partial_before_merge(spark):
    """Brute-force similarity must rank via per-batch partial top-k
    (MapInPandas) BEFORE the per-query merge window — a window directly
    over the scored cross-join would funnel |corpus| rows into one task
    per query at scale. The partial stage must sit below the window's
    shuffle in the plan."""
    a = _audit(spark, "sim_bruteforce_topk")
    assert "MapInPandas" in a.text, "partial top-k stage missing"
    # the window (RunningWindowFunction/Window) must consume the partial
    # output: MapInPandas appears in the subtree under the window sort
    head, _, tail = a.text.partition("Window")
    assert "MapInPandas" in tail, "window does not consume the partial top-k"


def test_incremental_dedup_reads_signature_cache(spark):
    """All three consumers of the unioned signature table (bucket
    explode x2 + verification) must read the persisted copy, not
    recompute the MinHash pipeline (the 58s->3s round-2 fix)."""
    a = _audit(spark, "dedup_incremental")
    assert a.text.count("InMemoryTableScan") >= 3


def test_pack_single_shuffle_pruned_scan(spark):
    """Packing is ONE window shuffle on the group key over a pruned
    scan (doc_id, text, source only) with the null filter pushed down."""
    a = _audit(spark, "pack_documents_by_source")
    assert a.n_exchanges == 1
    assert any("IsNotNull(text)" in f for f in a.pushed_filters)
    assert a.read_schemas and "n_chars" not in a.read_schemas[0]


def test_pipeline_two_shuffles_gates_fused(spark):
    """The full curation pipeline (gate -> dedup -> pack) must stay at
    two shuffles (dedup window on text, pack window on source); the
    quality/lang gates fuse into the scan stage, never a shuffle."""
    a = _audit(spark, "pipeline_curate_pack")
    assert a.n_exchanges == 2
    assert any("IsNotNull(text)" in f for f in a.pushed_filters)


def test_bm25_caches_postings_and_broadcasts_stats(spark):
    """BM25: the query-vocab posting table fans out to the df aggregate
    and the scoring join — both must read the persisted copy (ONE parquet
    scan for postings; corpus stats is the only other scan). df and
    corpus stats must broadcast; the corpus never enters a shuffle join."""
    a = _audit(spark, "search_bm25_topk")
    # Both posting consumers hit the cache. (InMemoryRelation prints its
    # stored lineage including the original FileScan, so counting "Scan
    # parquet" overcounts — count the cache reads instead.)
    assert a.text.count("InMemoryTableScan") == 2
    assert a.n_broadcast_joins >= 1
    assert a.n_sortmerge_joins == 0
    assert a.has_take_ordered


def test_decontam_probe_set_broadcasts(spark):
    """The eval n-gram set is the canonical small side: it must
    broadcast onto the exploded corpus grams (shuffling the corpus's
    grams to meet the probe set would be a corpus-sized shuffle), and
    only post-join HIT rows ever shuffle."""
    a = _audit(spark, "decontam_eval_overlap")
    assert a.n_broadcast_joins >= 1
    assert a.n_sortmerge_joins == 0
    # eval-gram distinct + the two-phase count(distinct) per doc —
    # both corpus-side exchanges sit ABOVE the broadcast join, so they
    # carry hit rows only, not the corpus
    assert a.n_exchanges <= 3


def test_span_stats_single_gram_shuffle_dup_set_broadcasts(spark):
    """Duplicated-span stats: ONE corpus-sized shuffle (gram count);
    the >=2-docs gram set joins back as a broadcast, never sort-merge."""
    a = _audit(spark, "dedup_duplicate_span_stats")
    assert a.n_broadcast_joins >= 1
    assert a.n_sortmerge_joins == 0
    assert "CartesianProduct" not in a.text


def test_random_projection_map_only(spark):
    """SRP is a pure per-row transform: zero exchanges, zero joins,
    scan pruned to (vec_id, embedding)."""
    a = _audit(spark, "sim_random_projection")
    assert a.n_exchanges == 0
    assert a.n_broadcast_joins + a.n_sortmerge_joins + a.n_shuffled_hash_joins == 0
    assert any("embedding" in s and "label" not in s for s in a.read_schemas)


def test_hybrid_rrf_fusion_is_broadcast_sized(spark):
    """Hybrid RRF: the corpus appears only inside the two legs (posting
    cache + similarity scan) and joins there only via broadcast. The
    ONE non-broadcast join is the fusion full-outer (Spark cannot
    broadcast full outer), and its inputs are the two <= k_each-row leg
    outputs — k rows, never the corpus. Since the session prefers
    shuffled hash joins (r15) it plans as SHJ; the invariant is that
    there is exactly one such join, whatever its physical flavor. The
    final top-k is a TakeOrderedAndProject, not a global sort."""
    a = _audit(spark, "search_hybrid_rrf")
    # fusion only, on k-row inputs
    assert a.n_sortmerge_joins + a.n_shuffled_hash_joins == 1
    assert a.n_broadcast_joins == 1  # bm25 df(term) hash join
    # both corpus-side constant attachments are broadcast nested-loop
    # crosses of 1-row/k-row frames (bm25 corpus stats, cosine queries)
    assert a.text.count("BroadcastNestedLoopJoin") == 2
    assert a.has_take_ordered


def test_global_row_numbers_no_single_partition_exchange(spark):
    a = _audit(spark, "scale_global_row_numbers")
    assert "SinglePartition" not in a.text
    assert "rangepartitioning" in a.text  # the parallel range shuffle


def test_span_dedup_dup_gram_join_is_unhinted(spark):
    """The duplicated-gram side of span dedup is unbounded on a web
    corpus (Lee et al.'s own finding: a large fraction of k-gram TYPES
    are cross-document duplicates), so neither span operator may force
    a broadcast of it — the optimized logical plan must carry no join
    hint at all; AQE alone decides the physical strategy (r5 verdict
    item 1, the paragraph_dedup discipline)."""
    from sparkstreamingtwitter_presidential_spark.operators import span_dedup as SD
    from sparkstreamingtwitter_presidential_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents")
    for df in (
        SD.duplicate_span_stats(docs, k=8),
        SD.trim_duplicate_spans(docs, k=8),
    ):
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in opt
        assert "broadcast" not in opt.lower()
