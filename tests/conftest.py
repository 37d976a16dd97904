from __future__ import annotations

import os
import sys
from pathlib import Path

# Bare `pytest tests/` (no -m) doesn't put the repo root on sys.path the way
# `python -m pytest` does; insert it so `custom_vector_database_spark` imports
# under either invocation.
_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from custom_vector_database_spark.session import get_spark

    s = get_spark("cvdb-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


# ---------------------------------------------------------------------------
# Test profiles (round 15): the driver's default run (`pytest tests/`,
# addopts `-m 'not slow'` in pyproject.toml) must finish inside its time
# budget (~25 min; the full suite is ~46 min). The tests below are the
# measured multi-minute tail — crash-replay choreography, sidecar
# rebuckets, recall sweeps, and the heavy protocol rows' parity/smoke
# replicas — each of whose OPERATOR keeps at least one faster test (or
# an oracle-parity row) in the default profile. Run everything with
# `pytest tests/ -m ""` (the nightly/full profile). Names are matched on
# the test id's final component, so parametrized entries pin specific
# params. A stale name here is harmless (nothing matches).
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    "test_all_queries_run_smoke[ivfpq_build]",
    "test_all_queries_run_smoke[knn_graph_build]",
    "test_all_queries_run_smoke[maintenance_execute]",
    "test_all_queries_run_smoke[maintenance_plan]",
    "test_all_queries_run_smoke[maxsim_crud]",
    "test_all_queries_run_smoke[neardup_ingest_compact]",
    "test_all_queries_run_smoke[semdedup_ingest_compact]",
    "test_all_queries_run_smoke[sidecar_report]",
    "test_all_queries_run_smoke[stream_classifier_gated_ingest]",
    "test_all_queries_run_smoke[stream_maxsim_ingest]",
    "test_all_queries_run_smoke[stream_neardup_ingest]",
    "test_all_queries_run_smoke[stream_payload_cdc_ingest]",
    "test_all_queries_run_smoke[stream_semdedup_ingest]",
    "test_auto_sized_ivfpq_builds_and_searches_through_arrow",
    "test_autopilot_rebuild_and_beam_calibrate",
    "test_backlinks_lift_in_edge_recall",
    "test_bootstrap_excluded_id_reuse_refuses",
    "test_bq_recall_vs_exact",
    "test_calibrate_pin_and_auto",
    "test_cdc_compact_and_rebucket",
    "test_cdc_crash_replay_reconciles",
    "test_cdc_in_sidecar_report_and_maintenance",
    "test_classifier_gated_ingest_composes",
    "test_compact_mh_sidecar_folds_files_and_probe_survives",
    "test_connected_components_matches_union_find",
    "test_connected_components_pointer_jumping_beats_diameter",
    "test_delete_tombstone_compact_lifecycle",
    "test_dsir_gated_ingest_composes_with_neardup",
    "test_dsir_gated_ingest_composes_with_semdedup",
    "test_execute_runs_exactly_the_plan",
    "test_execute_skips_lease_held_corpus_and_continues",
    "test_filtered_search_walks_unrestricted_emits_matching",
    "test_fp_sidecar_rebucket_preserves_decisions",
    "test_gated_semdedup_refuses_bad_vectors_on_raw_batch",
    "test_ivf_cosine_recall_vs_exact",
    "test_ivf_recall_vs_exact",
    "test_ivf_upsert_refuses_tombstoned_id_until_compact",
    "test_ivfbq_recall_and_crud_lifecycle",
    "test_ivfpq_cosine_recall_and_distances",
    "test_ivfpq_dot_recall_and_scores",
    "test_ivfpq_recall_and_nprobe_monotonicity",
    "test_knn_graph_recall_and_shape",
    "test_logistic_gate_deployed_score_separates_raw",
    "test_maxsim_calibration_end_to_end",
    "test_maxsim_unit_arrow_assign_matches_codegen",
    "test_mh_rebucket_crash_safety",
    "test_mh_sidecar_rebucket_preserves_decisions_and_shape",
    "test_minibatch_kmeans_deterministic_and_sane",
    "test_mixture_quota_matches_reference",
    "test_neardup_crash_replay_heals_partial_appends",
    "test_oracle_emits_no_unmatched_special_floats[sidecar_report]",
    "test_oracle_parity[crud_lifecycle]",
    "test_oracle_parity[ivf_recall_calibration]",
    "test_oracle_parity[ivfpq_build]",
    "test_oracle_parity[knn_graph_build]",
    "test_oracle_parity[maintenance_execute]",
    "test_oracle_parity[maintenance_plan]",
    "test_oracle_parity[maxsim_crud]",
    "test_oracle_parity[maxsim_pruned_bq]",
    "test_oracle_parity[maxsim_search_many_pruned]",
    "test_oracle_parity[neardup_ingest_compact]",
    "test_oracle_parity[semdedup_ingest_compact]",
    "test_oracle_parity[sidecar_report]",
    "test_oracle_parity[stream_maxsim_ingest]",
    "test_oracle_parity[stream_neardup_ingest]",
    "test_oracle_parity[stream_payload_cdc_ingest]",
    "test_oracle_parity[stream_purchase_click_join]",
    "test_oracle_parity[stream_semdedup_ingest]",
    "test_pagerank_matches_reference",
    "test_payload_ingest_multimodal_member",
    "test_plan_emits_calibrate_after_rebuild_for_pinned_layout",
    "test_plan_surfaces_resize_and_execute_refits_at_computed_k",
    "test_pq_rerank_recall_vs_exact",
    "test_pq_staleness_report_trips_on_drifted_delta",
    "test_quality_classifier_separates_and_persists[lcr]",
    "test_quality_classifier_separates_and_persists[logistic]",
    "test_r9_review_regressions",
    "test_r9_second_pass_regressions",
    "test_resize_subsumes_rebuild_and_recalibrates_in_one_run",
    "test_rrf_fuse_matches_python_reference",
    "test_save_folds_backlinks_with_degree_prune",
    "test_sb_sidecar_rebucket_preserves_decisions",
    "test_search_many_dispatches_to_ivfbq",
    "test_search_many_matches_exact_batch",
    "test_semantic_prune_greedy_matches_bruteforce",
    "test_semdedup_crash_replay_heals_partial_appends",
    "test_semdedup_probe_never_reads_corpus",
    "test_semdedup_refusals_and_shape_pin",
    "test_simhash_hamming_orders_similarity",
    "test_sq8_recall_vs_exact",
    "test_staleness_report_covers_ivf_and_maxsim",
    "test_stream_corpus_ingest_probe_never_reads_corpus",
    "test_stream_corpus_neardup_ingest_drops_near_and_exact",
    "test_stream_corpus_semdedup_ingest_drops_near_and_exact",
    "test_stream_vector_ingest_batches_equal_merge_once",
    "test_stream_vector_ingest_replay_is_idempotent",
    "test_stream_vector_ingest_works_on_binary_index",
    "test_stream_vector_ingest_works_on_compressed_index",
    "test_two_frame_family_verbs_take_the_lease[minhash]",
    "test_upsert_appends_and_is_searchable",
    "test_upsert_delete_compact_crud",
    "test_upsert_replay_heals_row_exactly",
    "test_upsert_writes_backlinks_not_edge_rewrites",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid.rsplit("::", 1)[-1] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
