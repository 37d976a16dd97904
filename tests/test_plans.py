"""Physical-plan regression tests: the scale-critical plan shapes from
PLANS.md, asserted so a refactor can't silently trade them away."""

from __future__ import annotations

import pytest

from custom_vector_database_spark import queries_registry as reg

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = reg.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_knn_exact_is_heap_topk_with_pruned_scan(spark):
    plan = _plan(spark, "knn_exact")
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in plan


def test_knn_filtered_pushes_predicate_to_scan(spark):
    plan = _plan(spark, "knn_filtered")
    assert "PushedFilters: [IsNotNull(label), EqualTo(label,3)]" in plan


def test_get_by_id_pushes_key_lookup(spark):
    plan = _plan(spark, "get_by_id")
    assert "EqualTo(vec_id,42)" in plan


def test_broadcast_enrich_uses_broadcast_joins(spark):
    plan = _plan(spark, "join_broadcast_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact


def test_tpch_q5_broadcasts_dims_and_pushes_date_filter(spark):
    plan = _plan(spark, "tpch_q5_local_supplier_revenue")
    assert "BroadcastHashJoin" in plan  # nation/region stay broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the date range reaches the orders parquet scan
    assert "GreaterThanOrEqual(o_orderdate" in plan and "LessThan(o_orderdate" in plan


def test_knn_join_never_shuffles_vectors(spark):
    plan = _plan(spark, "knn_join_topk")
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "embedding" not in line and "qvec" not in line, line


def test_range_join_is_not_cartesian(spark):
    plan = _plan(spark, "range_join_event_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semi_anti_joins_planned_as_existence_joins(spark):
    assert "LeftSemi" in _plan(spark, "semi_join_customers")
    assert "LeftAnti" in _plan(spark, "anti_join_customers")


def test_aggregation_is_partial_plus_final(spark):
    plan = _plan(spark, "agg_pricing_summary")
    # two HashAggregate levels = map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2


@pytest.mark.parametrize("name", ["knn_exact", "agg_pricing_summary"])
def test_no_python_udfs_in_core_paths(spark, name):
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
