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


def test_join_strategy_hints_are_honored(spark):
    """The engine exposes Spark's full join-strategy surface: hints must
    override the optimizer's default pick (broadcast vs sort-merge vs
    shuffled-hash for the same join)."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")

    def plan_of(hint):
        j = orders.join(cust.hint(hint), orders["o_custkey"] == cust["c_custkey"])
        return j._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan_of("broadcast")
    assert "SortMergeJoin" in plan_of("merge")
    assert "ShuffledHashJoin" in plan_of("shuffle_hash")


def test_observe_metrics_in_single_pass(spark):
    """df.observe collects data-quality counters during the main job —
    no second scan — and they must equal a direct aggregation."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("null_qty"),
    )
    observed.write.format("noop").mode("overwrite").save()
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
    ).first()
    got = obs.get
    assert got["n_rows"] == direct["n"]
    assert got["sum_qty"] == direct["s"]
    assert got["null_qty"] == 0


def test_sql_knn_compiles_to_same_plan_as_dataframe_knn(spark):
    """SQL scalar functions are inlined at analysis time: the pure-SQL kNN
    must plan as heap top-k over a codegen'd expression — no Python
    evaluation node, no global sort."""
    plan = _plan(spark, "sql_knn_exact")
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_sq8_search_is_heap_topk_no_second_scan(spark):
    plan = _plan(spark, "sq8_search")
    assert "TakeOrderedAndProject" in plan  # int-code candidate heap
    # one scan of the embeddings table feeds candidates AND rerank payload
    assert plan.count("embeddings.parquet]") == 2  # data scan + scale agg scan
    assert "BatchEvalPython" not in plan  # whole path stays JVM-side


def test_bloom_prune_joins_are_broadcast_only(spark):
    plan = _plan(spark, "bloom_pruned_revenue")
    # orders must not shuffle before the final aggregate: every join on the
    # probe path is a broadcast hash join
    assert plan.count("BroadcastHashJoin") >= 3  # 2 bloom probes + semi join
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lateral_topn_plans_as_window_not_loop(spark):
    plan = _plan(spark, "lateral_top_orders_per_customer")
    # Spark de-correlates LATERAL ... ORDER BY ... LIMIT into a ranked
    # window (one pass), not per-row re-execution / nested loops
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_multi_granularity_rollup_is_one_expand_pass(spark):
    plan = _plan(spark, "multi_granularity_rollup")
    assert plan.count("Expand") == 1  # grouping sets = one Expand, one scan
    assert plan.count("events.parquet]") == 1


def test_recursive_cte_executes_distributed_union_loop(spark):
    plan = _plan(spark, "recursive_ancestor_rollup")
    assert "UnionLoop" in plan or "Recursion" in plan or "recursive" in plan.lower()


def test_ivfpq_search_probes_are_partition_pruned(spark):
    """The registered ivfpq_search query searches the SAVED cluster-
    partitioned layout; its candidate scan must read ONLY the nprobe
    probed partitions (PartitionFilters prune at file-listing time), not
    the whole code table."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.queries.vector_queries import (
        ivfpq_saved_index,
        load_spread,
    )

    idx = ivfpq_saved_index(spark, SF)  # the exact index the query uses
    emb = load_spread(spark, SF, "embeddings")
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    nprobe = 8
    probed = set(idx._probe(query, nprobe))
    # rerank=0 exposes the candidate stage the reranked query collects from
    cand = idx.search(query, k=10, nprobe=nprobe, rerank=0)

    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    # the IN-list driving the pruning must be exactly the probed clusters
    # (inputFiles() can't prove this — it lists the relation pre-pruning)
    import re

    m = re.search(r"PartitionFilters: \[cluster#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    in_list = {int(x) for x in m.group(1).split(",")}
    assert in_list == probed, (in_list, probed)
    # and the pruned candidate scan still yields the right answer
    assert cand.count() == 10


def test_ivf_search_many_probes_are_partition_pruned(spark, tmp_path):
    """Batch ANN (ivf.search_many) must scan only the UNION of the
    queries' probed partitions — the isin filter from the exploded query
    side's distinct clusters reaches the file listing as a
    PartitionFilter, and the query side joins in as a broadcast (probe
    work ∝ queries × nprobe, never the full layout)."""
    import re

    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.ivf import IvfIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ivf = IvfIndex.fit(emb, id_col="vec_id", vec_col="embedding", n_clusters=8)
    path = str(tmp_path / "ivf_many_plan")
    ivf.save(path)
    loaded = IvfIndex.load(spark, path)
    qrows = emb.filter(F.col("vec_id") < 2).collect()
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    nprobe = 2
    expected = set()
    for r in qrows:
        expected |= set(loaded._probe_clusters(list(r["embedding"]), nprobe))
    out = loaded.search_many(queries, k=3, nprobe=nprobe)

    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[.*?cluster#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    in_list = {int(x) for x in m.group(1).split(",")}
    assert in_list == expected, (in_list, expected)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # and the pruned batch still answers every query
    assert out.count() == 2 * 3


def test_load_spread_is_size_aware(spark, tmp_path):
    """load_spread must not insert a repartition shuffle when the source
    already has >= target natural splits (the 100 TB case: thousands of
    parquet files), must still spread a single-file fixture to session
    parallelism, and must honor the max_partitions fan-out cap."""
    from custom_vector_database_spark.queries_registry import load_spread

    spark.range(1000).repartition(8).write.parquet(str(tmp_path / "many.parquet"))
    many = load_spread(spark, str(tmp_path), "many")
    plan = many._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan and "Exchange" not in plan

    spark.range(100).coalesce(1).write.parquet(str(tmp_path / "one.parquet"))
    one = load_spread(spark, str(tmp_path), "one")
    plan_one = one._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan_one
    assert one.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

    capped = load_spread(spark, str(tmp_path), "one", max_partitions=2)
    assert capped.rdd.getNumPartitions() == 2


def test_matryoshka_is_two_stage_heap_topk(spark):
    plan = _plan(spark, "matryoshka_search")
    # stage-1 candidate cut AND final rerank are both heap top-ks -- no
    # global sort shuffle anywhere in the two-stage pipeline
    assert plan.count("TakeOrderedAndProject") == 2
    assert "SortMergeJoin" not in plan
    assert "Exchange rangepartitioning" not in plan  # = no global sort


def test_embedding_outliers_broadcasts_centroids(spark):
    plan = _plan(spark, "embedding_outliers")
    # the tiny centroid table must broadcast; the vector table never
    # shuffles through a SortMergeJoin
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # only scalar columns move through the top-k window's exchange
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "embedding" not in line, line


def test_mixture_resample_broadcasts_quotas(spark):
    plan = _plan(spark, "mixture_resample_docs")
    # weights / budget-scalar / quota joins all broadcast -- the only
    # exchanges are the per-stratum rank window and the final aggregate
    assert "SortMergeJoin" not in plan


def test_pack_sequences_single_window_no_join(spark):
    plan = _plan(spark, "pack_sequences_docs")
    assert "Join" not in plan  # pure window + aggregate pipeline


def test_tpch_q4_semi_join_no_multiplicity(spark):
    # the EXISTS must plan as a semi join (orders never multiplied by
    # matching lineitems) and the date range must reach the orders scan
    plan = _plan(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_tpch_q17_decorrelates_to_broadcast_aggregate(spark):
    # the per-part avg-quantity "correlated subquery" must be a keyed
    # aggregate joined back broadcast — never a re-scan per outer row
    plan = _plan(spark, "tpch_q17_small_qty_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q21_no_correlated_rescan(spark):
    # the EXISTS/NOT-EXISTS pair compiles to per-order aggregates: exactly
    # two shuffles of (orderkey, suppkey) scalars, no nested-loop join
    plan = _plan(spark, "tpch_q21_waiting_suppliers")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "l_extendedprice" not in line, line


def test_ivfpq_search_many_scans_codes_not_vectors(spark, tmp_path):
    """Batch ADC must (1) prune the code scan to the union of probed
    partitions and (2) never read a vector column in the candidate stage
    — the compressed path's whole point is scanning codes, not vectors."""
    import re

    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.pq import IvfPqIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = IvfPqIndex.fit(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=8, m=8, k=16
    )
    path = str(tmp_path / "ivfpq_many_plan")
    idx.save(path)
    loaded = IvfPqIndex.load(spark, path)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    nprobe = 2
    expected = set()
    for r in emb.filter(F.col("vec_id") < 2).collect():
        expected |= set(loaded._probe(list(r["embedding"]), nprobe))
    out = loaded.search_many(queries, k=3, nprobe=nprobe)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[.*?cluster#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    assert {int(x) for x in m.group(1).split(",")} == expected
    # the codes relation read schema carries codes only — no vectors
    for mm in re.finditer(r"ReadSchema: (\S+)", plan):
        assert "embedding" not in mm.group(1), mm.group(1)
    assert out.count() == 2 * 3


def test_tpch_q7_no_cartesian_dims_broadcast(spark):
    # the 8-table join graph must never degrade to a cartesian/NLJ even
    # with two nation legs; all dims broadcast
    plan = _plan(spark, "tpch_q7_volume_shipping")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q13_left_join_preserved(spark):
    # zero-order customers must survive: the two-level agg keeps an outer
    # join (Catalyst may flip build sides; any Outer form qualifies)
    plan = _plan(spark, "tpch_q13_customer_distribution")
    assert "Outer" in plan
    assert "CartesianProduct" not in plan


def test_bq_search_is_heap_topk_and_projects_scan(spark):
    """BQ candidate ranking must end in TakeOrderedAndProject (per-
    partition heaps, no global sort) over a scan that reads only the id
    and vector columns — the packed-code projection is codegen'd into
    the scan stage, never a shuffle of its own."""
    plan = _plan(spark, "bq_search")
    assert "TakeOrderedAndProject" in plan
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in plan


def test_duplicate_spans_prunes_scan_to_id_and_text(spark):
    """The span extractor must not drag unused document columns through
    the gram explode — column pruning down to (doc_id, text) at the
    scan."""
    plan = _plan(spark, "duplicate_span_extract")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_winnow_fingerprints_ranks_scalars_only(spark):
    """Everything downstream of winnowing's one materialized text pass
    is scalar (doc_id, n_grams, pos, h): no text or gram column may
    reach the window/shuffle stages. (The parquet scan itself sits
    behind the localCheckpoint, so the executed plan reads the
    materialized RDD — assert its column set, which is the guarantee
    that matters for the shuffles.)"""
    plan = _plan(spark, "winnow_fingerprint_docs")
    import re

    rdd_scans = re.findall(r"Scan ExistingRDD\[([^\]]*)\]", plan)
    assert rdd_scans, plan[:500]
    for cols in rdd_scans:
        names = {c.split("#")[0] for c in cols.split(",")}
        assert names == {"doc_id", "n_grams", "pos", "h"}, names
    assert "text" not in plan and "gram#" not in plan


@pytest.mark.parametrize(
    "name", ["tpch_q15_top_supplier", "tpch_q20_excess_suppliers"]
)
def test_tpch_scalar_aggregates_are_not_single_partition_windows(spark, name):
    """q15's MAX and q20's AVG are one scalar each: they must be computed
    as an aggregate + broadcast crossJoin, never a Window.partitionBy()
    (which moves every per-supplier row to ONE partition)."""
    plan = _plan(spark, name)
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_triangle_count_degree_oriented_joins_are_hash_joins(spark):
    """The degree-orientation rework must stay all equi-join: degree
    attach, wedge fan-out, and the closing semi-join each hash/sort-merge
    on node keys — never a cartesian or nested-loop fallback (the
    (deg, id) struct comparison rides as a post-join filter, not as the
    join condition's only clause)."""
    plan = _plan(spark, "triangle_count_docs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_maxsim_broadcasts_query_bag_and_heap_topk(spark):
    """MaxSim must broadcast the bounded query token bag over ONE token
    scan (never sort-merge the fan-out) and take the final top-10 as a
    heap, not a global sort."""
    plan = _plan(spark, "maxsim_late_interaction")
    assert "BroadcastNestedLoopJoin" in plan  # the bounded cross join
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_maxsim_pruned_probes_saved_layout_partitions(spark):
    """The registered maxsim_pruned/maxsim_pruned_bq rows search the
    SAVED token layout (VERDICT r7 'done' criterion): the stage-1
    candidate scan must read ONLY the probed cluster partitions of the
    exact index instance the queries use — never a per-call refit over
    a freshly encoded full scan — and the stage-2 gather must prune to
    the candidates' doc buckets with the id filter pushed to parquet."""
    import re

    from pyspark.sql import functions as F

    from custom_vector_database_spark.queries.vector_queries import (
        _MAXSIM_Q_TOKS,
        saved_index,
    )

    idx = saved_index(spark, SF, "maxsim")  # the instance the queries hit
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qrows = emb.filter(F.col("vec_id") < _MAXSIM_Q_TOKS).collect()
    probe = idx.probe_union([list(r["embedding"]) for r in qrows], 1)
    assert len(probe) < len(idx.centroids)  # pruning engaged

    plan = (
        idx._pruned_rows(probe)
        ._jdf.queryExecution().executedPlan().toString()
    )
    m = re.search(r"PartitionFilters: \[.*?cluster#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    assert {int(x) for x in m.group(1).split(",")} == set(probe)

    # quantized stage 1 (maxsim_pruned_bq) reads sign codes, not floats
    qd = [{"qvec": list(r["embedding"])} for r in qrows]
    cand = idx._candidate_docs(qd, 1, 32, quantized=True)
    qplan = cand._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in qplan.splitlines() if "FileScan" in ln]
    assert scans and all("embedding" not in ln for ln in scans), qplan

    # stage-2 gather: doc-bucket partition pruning + pushed id filter
    g = idx._gather(spark.createDataFrame([(0,), (3,)], "doc bigint"), 100)
    gplan = g._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*?dbkt#\d+ IN \(", gplan), gplan
    assert re.search(r"PushedFilters: \[.*?In\(doc", gplan), gplan


def test_dsir_select_is_broadcast_ratio_heap_topn(spark):
    """DSIR's physical shape: the bucket log-ratio table is BROADCAST to
    the (doc, bucket) tf aggregate (never a shuffled join keyed on the
    Zipf-skewed bucket), the only nested-loop joins are against one-row
    total aggregates, and the final selection is a heap top-n, not a
    global sort."""
    plan = _plan(spark, "dsir_select_docs")
    assert "TakeOrderedAndProject(limit=40" in plan
    assert "BroadcastHashJoin [bucket" in plan
    # the per-doc weight aggregate is map-side combined
    assert "partial_sum" in plan
    # no shuffled join keyed on bucket anywhere
    assert "SortMergeJoin [bucket" not in plan
    assert "ShuffledHashJoin [bucket" not in plan


def test_neardup_decontaminate_broadcasts_holdout_bands(spark):
    """The fuzzy decontamination verb's physical shape: the holdout's
    exploded band rows BROADCAST to the train side (never a shuffled
    join keyed on band hashes), and the per-train-doc aggregate is
    map-side combined."""
    plan = _plan(spark, "neardup_decontaminate_docs")
    assert "BroadcastHashJoin [band" in plan
    assert "SortMergeJoin [band" not in plan
    assert "ShuffledHashJoin [band" not in plan
    assert "partial_max" in plan  # per-train-doc max agreement combines map-side


def test_semdedup_sidecar_probes_are_partition_pruned(spark, tmp_path):
    """The semantic-dedup steady-state probe's scale contract in the
    PLAN (the garbage-corpus test proves it physically; this pins the
    mechanism): the bands-frame candidate read and the vecs-frame
    gather both carry PartitionFilters over their bucket columns — the
    scans list only the batch's band-key / candidate-id buckets, never
    the whole sidecar."""
    import re

    from pyspark.sql import functions as F

    from custom_vector_database_spark.streaming.stream_ops import (
        _SB_BANDS,
        _SB_VECS,
        _ensure_sb_sidecar,
        _read_sb_bands,
        _read_sb_vecs,
    )

    docs = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
    )
    corpus = str(tmp_path / "corpus")
    docs.write.parquet(corpus)
    _ensure_sb_sidecar(spark, corpus, "doc_id", "embedding", 4, 16, 16)

    band_side = _read_sb_bands(spark, f"{corpus}/{_SB_BANDS}")
    probe = band_side.filter(F.col("bb").isin([1, 3, 5]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[.*?bb#\d+L? IN \(([^)]*)\)", plan)
    assert m, plan
    assert {int(x) for x in m.group(1).split(",")} == {1, 3, 5}

    vec_side = _read_sb_vecs(spark, f"{corpus}/{_SB_VECS}")
    gather = vec_side.filter(F.col("idb").isin([0, 7]))
    vplan = gather._jdf.queryExecution().executedPlan().toString()
    mv = re.search(r"PartitionFilters: \[.*?idb#\d+L? IN \(([^)]*)\)", vplan)
    assert mv, vplan
    assert {int(x) for x in mv.group(1).split(",")} == {0, 7}


def test_payload_fp_sidecar_probe_is_partition_pruned(spark, tmp_path):
    """The payload-md5 exact member's steady-state probe carries the
    same PartitionFilters contract as the text member (the fpb
    bucket-pruned anti-join in corpus_ingest_apply_batch): the sidecar
    scan lists only the batch's fingerprint buckets, never the whole
    sidecar — the mechanism behind the payload garbage-corpus proof."""
    import os
    import re

    from pyspark.sql import functions as F

    from custom_vector_database_spark.streaming.stream_ops import (
        _FP_SIDECAR,
        _ensure_fp_sidecar,
        _read_fp_sidecar,
    )

    media = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(20)
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").cast("binary").alias("payload"),
        )
    )
    corpus = str(tmp_path / "corpus")
    media.write.parquet(corpus)
    _ensure_fp_sidecar(
        spark, corpus, os.path.join(corpus, _FP_SIDECAR), "payload", 16,
        fp_kind="payload_md5",
    )
    sidecar = _read_fp_sidecar(spark, os.path.join(corpus, _FP_SIDECAR))
    probe = sidecar.filter(F.col("fpb").isin([2, 9, 11]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[.*?fpb#\d+L? IN \(([^)]*)\)", plan)
    assert m, plan
    assert {int(x) for x in m.group(1).split(",")} == {2, 9, 11}
