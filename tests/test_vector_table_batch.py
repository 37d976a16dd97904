"""Batch mutation API (the scalable path: one rewrite per batch, vs the
reference's rewrite-per-mutation loop) + bucketed co-located join evidence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from custom_vector_database_spark.vector_table import (
    DimensionMismatchError,
    VectorTable,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    t = VectorTable(spark, str(tmp_path / "tbl")).init(dim=2)
    t.add([([float(i), float(i + 1)], None) for i in range(10)])
    return t


def test_delete_many_single_rewrite(tbl):
    assert tbl.delete_many([2, 4, 6, 999]) == 3  # 999 doesn't exist
    ids = {r["id"] for r in tbl.df().select("id").collect()}
    assert ids == {1, 3, 5, 7, 8, 9, 10}
    assert tbl.delete_many([]) == 0


def test_update_many_existing_only(spark, tbl):
    batch = spark.createDataFrame(
        [(3, [30.0, 30.0], '{"u":1}'), (5, [50.0, 50.0], None),
         (999, [9.0, 9.0], None)],
        "id LONG, vec ARRAY<FLOAT>, metadata STRING",
    )
    assert tbl.update_many(batch) == 2  # 999 skipped (reference semantics)
    row, found = tbl.get(3)
    assert found and row["vec"] == [30.0, 30.0] and row["metadata"] == '{"u":1}'
    assert tbl.df().count() == 10  # no phantom inserts


def test_update_many_dim_check(spark, tbl):
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0], None)], "id LONG, vec ARRAY<FLOAT>, metadata STRING"
    )
    with pytest.raises(DimensionMismatchError):
        tbl.update_many(bad)


def test_compact_rewrites_to_n_files(spark, tbl, tmp_path):
    import os

    tbl.compact(2)
    data_dir = os.path.join(str(tmp_path / "tbl"), "data")
    files = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
    assert len(files) == 2
    assert tbl.df().count() == 10  # contents untouched


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Co-located join via bucketBy: both sides bucketed on the join key →
    the sort-merge join reads pre-bucketed data with NO Exchange on either
    side — the 100 TB fact-fact join strategy."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    # disable broadcast so the co-located SMJ path is what gets planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the join itself consumes bucketed scans — no exchange feeds it
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange hashpartitioning(o_orderkey" not in join_part
        assert "Exchange hashpartitioning(l_orderkey" not in join_part
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_update_many_rejects_duplicate_batch_ids(spark, tmp_path):
    from custom_vector_database_spark.vector_table import VectorTable

    t = VectorTable(spark, str(tmp_path / "db")).init(dim=2)
    t.add([([1.0, 1.0], None), ([2.0, 2.0], None)])
    batch = spark.createDataFrame(
        [(1, [9.0, 9.0], "a"), (1, [8.0, 8.0], "b")],
        "id LONG, vec ARRAY<FLOAT>, metadata STRING",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        t.update_many(batch)
    # table untouched: still exactly one id=1 row
    assert t.df().filter("id = 1").count() == 1


def test_add_bumps_counter_before_rewrite(spark, tmp_path, monkeypatch):
    """Crash between the two persists must leave an id GAP, never reuse:
    the counter write precedes the data rewrite."""
    from custom_vector_database_spark.vector_table import VectorTable

    t = VectorTable(spark, str(tmp_path / "db")).init(dim=2)
    t.add([([1.0, 1.0], None)])

    def boom(df, **kwargs):
        raise RuntimeError("simulated crash during rewrite")

    monkeypatch.setattr(t, "_rewrite", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        t.add([([2.0, 2.0], None)])
    monkeypatch.undo()
    # data unchanged, but the counter advanced past the failed batch
    assert t.df().count() == 1
    assert t.meta.next_id == 3
    assert t.add([([3.0, 3.0], None)]) == [3]  # gap at id 2, no reuse
