"""Range-clustered write layout: the per-file min/max zone maps must be
tight and disjoint, and Spark must push the range predicate into the scan —
together those two facts are what make a date-range query on a 100 TB table
read ~its selectivity's worth of files instead of all of them."""

from __future__ import annotations

import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.layout import range_sorted_write

N_FILES = 6


@pytest.fixture(scope="module")
def clustered(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    tmp = tempfile.mkdtemp(prefix="cvdb_layout_")
    path = f"{tmp}/lineitem_by_shipdate"
    range_sorted_write(li, path, "l_shipdate", n_files=N_FILES)
    yield path
    shutil.rmtree(tmp, ignore_errors=True)


def _file_ranges(spark, path):
    """(min, max) of l_shipdate per parquet file, from the footers."""
    files = [f for f in spark.read.parquet(path).inputFiles()]
    ranges = []
    for f in files:
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st is not None and st.has_min_max, "footer stats missing"
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_zone_maps_disjoint(spark, clustered):
    """repartitionByRange gives each file a distinct quantile range: the
    [min, max] intervals overlap at most at single boundary values, so a
    range predicate prunes every file outside its window."""
    ranges = sorted(_file_ranges(spark, clustered))
    assert len(ranges) > 1
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"file ranges overlap: ({lo_a},{hi_a}) vs ({lo_b},{hi_b})"


def test_row_groups_sorted_within_file(spark, clustered):
    """sortWithinPartitions makes row-group zone maps monotonic inside each
    file — row-group-level pruning works, not just file-level."""
    files = spark.read.parquet(clustered).inputFiles()
    checked = 0
    for f in files:
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        if md.num_row_groups < 2:
            continue
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        stats = [md.row_group(rg).column(col_idx).statistics for rg in range(md.num_row_groups)]
        for a, b in zip(stats, stats[1:]):
            assert a.max <= b.min
            checked += 1
    # single-row-group files are fine; the sort is still asserted by the
    # per-file disjointness test


def test_range_scan_is_pushed_down_and_correct(spark, sf_smoke, clustered):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    lo, hi = "1994-01-01", "1994-06-30"
    pred = F.col("l_shipdate").between(lo, hi)
    clustered_df = spark.read.parquet(clustered).filter(pred)
    plan = clustered_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan
    # same rows as the unclustered table: layout changes I/O, never results
    assert clustered_df.count() == li.filter(pred).count()


def _spans(spark, path, col):
    """Per-file (max-min) span of `col`, plus the global span, from footers."""
    import pyarrow.parquet as pq_

    files = spark.read.parquet(path).inputFiles()
    spans, gmin, gmax = [], None, None
    for f in files:
        md = pq_.ParquetFile(f.replace("file:", "")).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        mins = [md.row_group(rg).column(idx).statistics.min for rg in range(md.num_row_groups)]
        maxs = [md.row_group(rg).column(idx).statistics.max for rg in range(md.num_row_groups)]
        lo, hi = min(mins), max(maxs)
        spans.append(hi - lo)
        gmin = lo if gmin is None else min(gmin, lo)
        gmax = hi if gmax is None else max(gmax, hi)
    return spans, (gmax - gmin)


def test_zorder_clusters_both_dimensions(spark, sf_smoke):
    """Z-order narrows per-file zone maps on BOTH interleaved columns;
    a plain single-column sort narrows only its own column and leaves the
    other spanning ~the full range (no pruning possible on it)."""
    from custom_vector_database_spark.operators.layout import zorder_write

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    tmp = tempfile.mkdtemp(prefix="cvdb_zorder_")
    try:
        zpath, spath = f"{tmp}/z", f"{tmp}/single"
        zorder_write(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)
        range_sorted_write(li, spath, "l_partkey", n_files=8)

        # correctness: layout never changes content
        assert spark.read.parquet(zpath).count() == li.count()

        for col in ("l_partkey", "l_suppkey"):
            spans, g = _spans(spark, zpath, col)
            avg = sum(spans) / len(spans)
            assert avg < 0.85 * g, f"z-order did not narrow {col}: {avg} vs {g}"

        # the single-sort baseline: sorted col is tightly clustered...
        spans_p, g_p = _spans(spark, spath, "l_partkey")
        assert sum(spans_p) / len(spans_p) < 0.5 * g_p
        # ...but the OTHER column spans ~everything in every file
        spans_s, g_s = _spans(spark, spath, "l_suppkey")
        assert sum(spans_s) / len(spans_s) > 0.9 * g_s
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_files_reduces_count_and_preserves_data(spark, tmp_path):
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.layout import compact_files

    path = str(tmp_path / "accreted")
    df = spark.range(0, 50_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    # simulate streaming-sink accretion: 20 tiny appends
    for i in range(20):
        df.filter(F.col("id") % 20 == i).coalesce(1).write.mode("append").parquet(path)
    import os

    before = sum(f.endswith(".parquet") for _r, _d, fs in os.walk(path) for f in fs)
    assert before >= 20

    def fingerprint():
        return (
            spark.read.parquet(path)
            .agg(
                F.count("*"),
                F.bit_xor(F.xxhash64("id", "v")),
            )
            .collect()[0]
        )

    base = tuple(fingerprint())
    after = compact_files(spark, path, target_bytes=1 << 30, sort_by="id")
    assert after < before
    assert tuple(fingerprint()) == base
    # re-clustered: per-file id ranges disjoint (zone maps preserved)
    import pyarrow.parquet as pq

    ranges = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                md = pq.read_metadata(os.path.join(root, f))
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(0)
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
                ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # pairwise disjoint after sort_by compaction
