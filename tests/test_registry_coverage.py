"""Registry hygiene (r13, VERDICT r12 item 10): every ROWS-ONLY query
— one registered with ``oracle=None``, so the driver only checks it
returns rows — must declare at least one NAMED pytest that pins its
operator's semantics. The link is enforced, not conventional: adding a
rows-only query without declaring coverage here fails the suite, and a
declared test that is renamed or deleted fails it too."""

from __future__ import annotations

import os

from sparkstreamingtwitter_presidential_spark.queries import load_all
from sparkstreamingtwitter_presidential_spark.queries.registry import QUERIES

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))

# rows-only query -> [(test file, test function), ...]: the named
# pytests that pin the semantics the missing oracle would have checked.
ROWS_ONLY_COVERAGE: dict[str, list[tuple[str, str]]] = {
    "approx_sketches": [
        ("test_sketches.py", "test_merged_estimate_within_error_bound"),
        ("test_sketches.py", "test_merge_equals_direct_sketch"),
    ],
    "sketch_user_rollup": [
        ("test_sketches.py", "test_rollup_groups_match_exact_within_bound"),
    ],
    "sketch_event_type_overlap": [
        ("test_sketches.py", "test_theta_overlap_estimates_within_error"),
    ],
    "sketch_length_quantiles": [
        (
            "test_sketches.py",
            "test_kll_merged_quantiles_track_exact_percentiles",
        ),
    ],
    "sample_events_seeded": [
        (
            "test_sampling_pii.py",
            "test_sample_is_deterministic_and_partition_independent",
        ),
        ("test_sampling_pii.py", "test_sample_rates_converge_per_stratum"),
    ],
    "text_bpe_vocab_top": [
        ("test_bpe.py", "test_train_matches_twin_on_corpus"),
        ("test_bpe.py", "test_train_deterministic"),
    ],
    "dedup_simhash_pairs": [
        ("test_dedup.py", "test_simhash_pairs_rank_by_similarity"),
        ("test_dedup.py", "test_simhash_columnar_equals_hof_path"),
    ],
    "sim_pq_topk": [
        ("test_pq.py", "test_recall_floor_vs_exact"),
        ("test_pq.py", "test_planted_near_duplicate_always_recovered"),
    ],
    "sim_ivfpq_topk": [
        ("test_pq.py", "test_ivfpq_recall_floor_vs_exact"),
        ("test_pq.py", "test_ivfpq_planted_near_duplicate_recovered"),
    ],
    "sim_ivf_topk": [
        ("test_similarity.py", "test_ivf_recall_on_near_duplicates"),
    ],
    "sim_ivf_incremental_topk": [
        (
            "test_similarity.py",
            "test_incremental_index_finds_delta_neighbors",
        ),
        ("test_similarity.py", "test_ivf_assign_matches_fitted_quantizer"),
    ],
    "streaming_stateful_milestones": [
        ("test_stateful.py", "test_milestones_match_batch_rule"),
    ],
    "streaming_collector_bounded": [
        ("test_streaming.py", "test_bounded_collector_stop_after_n"),
    ],
    "ml_kmeans_document_clusters": [
        ("test_ml.py", "test_kmeans_centroids_and_coverage"),
        ("test_ml.py", "test_kmeans_deterministic_under_seed"),
    ],
    "ml_kmeans_cluster_sizes": [
        ("test_ml.py", "test_kmeans_cluster_sizes_golden"),
    ],
    "ml_quality_classifier_by_source": [
        ("test_quality_model.py", "test_model_discriminates_and_roundtrips"),
        ("test_quality_model.py", "test_model_generalizes_past_rules"),
    ],
    "multimodal_byte_features": [
        (
            "test_multimodal.py",
            "test_feature_extraction_shape_and_determinism",
        ),
        ("test_multimodal.py", "test_real_feature_extraction_golden"),
    ],
    "multimodal_frame_samples": [
        ("test_multimodal.py", "test_real_frame_sampling_decodable"),
    ],
    "pipeline_rag_ingest": [
        ("test_packing_search.py", "test_bm25_golden"),
        ("test_packing_search.py", "test_strided_chunks_cover_and_overlap"),
        ("test_dedup.py", "test_paragraph_dedup_semantics"),
    ],
    "lakehouse_iceberg_row_lineage": [
        (
            "test_iceberg_dv_dml.py",
            "test_row_lineage_read_exposes_stable_ids",
        ),
        ("test_iceberg_dv_dml.py", "test_row_lineage_carries_through_dv_dml"),
    ],
}


def test_rows_only_queries_all_declare_named_coverage():
    load_all()
    rows_only = {n for n, q in QUERIES.items() if q.oracle is None}
    declared = set(ROWS_ONLY_COVERAGE)
    missing = sorted(rows_only - declared)
    stale = sorted(declared - rows_only)
    assert not missing, (
        f"rows-only queries without declared pytest coverage: {missing} — "
        "add them to ROWS_ONLY_COVERAGE with the named tests that pin "
        "their semantics"
    )
    assert not stale, (
        f"ROWS_ONLY_COVERAGE entries that are no longer rows-only "
        f"registry queries: {stale}"
    )


def test_declared_coverage_tests_exist_by_name():
    srcs: dict[str, str] = {}
    for q, pairs in ROWS_ONLY_COVERAGE.items():
        assert pairs, f"{q} declares an empty coverage list"
        for fname, tname in pairs:
            path = os.path.join(TESTS_DIR, fname)
            assert os.path.isfile(path), f"{q}: {fname} does not exist"
            if fname not in srcs:
                with open(path, encoding="utf-8") as fh:
                    srcs[fname] = fh.read()
            assert f"def {tname}(" in srcs[fname], (
                f"{q}: {fname} has no test named {tname!r} — the "
                "declared semantic coverage link is broken"
            )
