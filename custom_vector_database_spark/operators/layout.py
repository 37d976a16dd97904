"""Write-time data layout: range-clustered Parquet for zone-map pruning.

The reference has no storage layout at all (one JSON file,
/root/reference/src/vectordb.cpp:158-178). At 100 TB, layout IS the query
optimizer's biggest lever: Parquet keeps per-file and per-row-group min/max
statistics, and a scan with a pushed-down range predicate skips every
file/row-group whose [min, max] interval misses the predicate — but only if
the write clustered the data so those intervals are narrow and disjoint.

``range_sorted_write`` is that clustering step:

  repartitionByRange(n, col)   — one range shuffle; file i holds the i-th
                                 quantile range of ``col`` (sampled bounds)
  .sortWithinPartitions(col)   — per-file sort (no extra shuffle) so every
                                 ROW GROUP inside a file is tight too
  .write.parquet(path)         — min/max land in the footers for free

After this, `read.parquet(path).filter(col BETWEEN a AND b)` reads
~(b-a)/(max-min) of the files instead of all of them. That is the same
contract as a clustered/Z-ordered table in lakehouse formats, built from
nothing but a range shuffle. (For multi-column pruning, pass a tuple of
columns — the leading column dominates, like a composite sort key.)

tests/test_layout.py proves the contract: after writing lineitem clustered
by l_shipdate, the per-file [min, max] date intervals are pairwise disjoint
(pyarrow footer read), so any date-range scan can skip all non-overlapping
files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def range_sorted_write(
    df: DataFrame,
    path: str,
    cols: str | list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` by ``cols`` into ``n_files`` range-partitioned,
    internally-sorted Parquet files (footer min/max become tight zone maps).

    One range shuffle total; the per-partition sort is shuffle-free. At
    cluster scale pick ``n_files`` so each file lands near the target file
    size (e.g. total_bytes / 512 MB) — too few files caps scan parallelism,
    too many drowns the footer metadata.
    """
    if isinstance(cols, str):
        cols = [cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
