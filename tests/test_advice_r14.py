"""Round-14 ADVICE regression tests (see ADVICE.md, r13 judge round):

1. (low) search_many validates entry_probes alongside k/beam_width/
   rounds: entry_probes<=0 would emit empty shortlists and silently
   drop every query — the silent-vanish class the same function refuses
   elsewhere.
2. (low) A NULL cluster reaching the Arrow residual/LUT kernels arrives
   as NaN (nullable int32 -> float64 pandas conversion); `ci is not
   None` passed it and int(NaN) failed the whole Arrow batch. Both
   kernels must yield a per-row NULL instead.
3. (low) rowwise_l2_sq_col must not np.stack rows of DIFFERENT dims
   into one matrix: two rows each pairwise-consistent (len(x)==len(y))
   but of different lengths used to fail the whole batch where the
   zip_with fold it replaces yielded per-row values.
4. (low) upsert surfaces an upsert-specific error (split the delta and
   upsert per batch) for deltas above the 100k search_many broadcast
   bound, instead of the search-oriented remedy.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_graph(spark, tmp_path_factory):
    """A 2-dim saved KnnGraphIndex small enough for guard tests."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    base = spark.range(80).select(
        F.col("id"),
        F.array(
            (F.col("id") % 9).cast("double"),
            (F.col("id") % 7).cast("double"),
        ).alias("vec"),
    )
    path = str(tmp_path_factory.mktemp("advice14") / "g")
    KnnGraphIndex.fit(
        base, degree=4, iterations=1, target_rows_per_cluster=20,
    ).save(path)
    return path


# ---------------------------------------------------------------- item 1


def test_entry_probes_guard(spark, tiny_graph):
    """entry_probes=0 (or negative) must refuse loudly, not return zero
    rows for every query."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    idx = KnnGraphIndex.load(spark, tiny_graph)
    qt = spark.createDataFrame(
        [(0, [1.0, 1.0])], "qid int, qvec array<double>"
    )
    for bad in (0, -1):
        with pytest.raises(ValueError, match="entry_probes"):
            idx.search_many(qt, k=3, beam_width=8, entry_probes=bad)
    # and a positive value still answers
    assert (
        idx.search_many(qt, k=3, beam_width=8, entry_probes=1).count() == 3
    )


# ---------------------------------------------------------------- item 2


def test_null_cluster_residual_and_luts_are_null_not_batch_failure(spark):
    """A valid vector with a NULL cluster id must produce a NULL
    residual / NULL LUT row — before the fix int(NaN) raised inside the
    pandas batch and failed the whole task."""
    from custom_vector_database_spark.operators.pq import (
        _query_luts_col,
        _residual_vs_centroid_col,
    )

    cents = [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]]
    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [2.0, 2.0]]]
    df = spark.createDataFrame(
        [
            (1, [1.0, 1.0, 1.0, 1.0], 1),
            (2, [2.0, 2.0, 2.0, 2.0], None),  # NULL cluster, valid vec
            (3, None, 0),  # NULL vec, valid cluster
        ],
        "id int, vec array<double>, cluster int",
    )
    rows = {
        r["id"]: (r["res"], r["luts"])
        for r in df.select(
            "id",
            _residual_vs_centroid_col(cents)(
                F.col("vec"), F.col("cluster")
            ).alias("res"),
            _query_luts_col(cents, books, 4)(
                F.col("vec"), F.col("cluster")
            ).alias("luts"),
        ).collect()
    }
    assert rows[1][0] == [0.0, 0.0, 0.0, 0.0]
    assert rows[1][1] is not None
    assert rows[2] == (None, None), (
        "NULL cluster must yield NULL, not fail the Arrow batch"
    )
    assert rows[3] == (None, None)


# ---------------------------------------------------------------- item 3


def test_rowwise_l2_mixed_dims_across_rows(spark):
    """Rows with pairwise-equal but ACROSS-ROW different vector lengths
    score per row (the fold's semantics) — one np.stack over the lot
    used to raise and kill the batch."""
    from custom_vector_database_spark.operators.fitting import (
        rowwise_l2_sq_col,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 3.0], [4.0, 3.0]),
            (2, [1.0, 1.0, 1.0], [2.0, 2.0, 2.0]),  # different dim
            (3, [1.0], [5.0, 5.0]),  # mismatched pair -> NULL
            (4, None, [1.0]),
        ],
        "id int, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: r["d"]
        for r in df.select(
            "id", rowwise_l2_sq_col(F.col("a"), F.col("b")).alias("d")
        ).collect()
    }
    assert rows[1] == pytest.approx(16.0)
    assert rows[2] == pytest.approx(3.0)
    assert rows[3] is None and rows[4] is None


def test_rowwise_l2_mixed_dims_match_fold(spark):
    """Cross-check the grouped-stack kernel against the Catalyst fold on
    a mixed-dim frame."""
    from custom_vector_database_spark.operators.fitting import (
        rowwise_l2_sq_col,
    )

    rng = np.random.RandomState(7)
    data = []
    for i in range(30):
        d = [2, 5, 8][i % 3]
        data.append(
            (i, rng.randn(d).tolist(), rng.randn(d).tolist())
        )
    df = spark.createDataFrame(data, "id int, a array<double>, b array<double>")
    fold = F.expr(
        "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (s, v) -> s + v)"
    )
    got = df.select(
        "id",
        rowwise_l2_sq_col(F.col("a"), F.col("b")).alias("k"),
        fold.alias("f"),
    ).collect()
    for r in got:
        assert r["k"] == pytest.approx(r["f"], rel=1e-12), r["id"]


# ---------------------------------------------------------------- item 4


def test_upsert_oversized_delta_gets_upsert_remedy(spark, tiny_graph):
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    idx = KnnGraphIndex.load(spark, tiny_graph)
    delta = spark.range(1000, 102_000).select(
        F.col("id"),
        F.array(
            (F.col("id") % 11).cast("double"),
            (F.col("id") % 13).cast("double"),
        ).alias("vec"),
    )
    with pytest.raises(ValueError, match="upsert"):
        idx.upsert(delta)
