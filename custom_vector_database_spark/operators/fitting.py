"""Shared MLlib-fit helpers for the ANN index builders (ann/ivf/pq)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def bounded_train_sample(
    feats: DataFrame, n: int, fit_sample: int, seed: int
) -> DataFrame:
    """A materialized, size-bounded, partition-compacted training sample.

    Two scale facts drive this:
    - at 100 TB you never run Lloyd's iterations over the full table — a
      uniform sample of ``fit_sample`` rows is statistically plenty for
      k ≪ sample centroids, and it bounds per-iteration cost by the sample
      size (only the single assign pass is full-table);
    - on a tiny sample, task count — not data volume — dominates fit cost
      (every Lloyd's iteration of every fit launches a job over it), so
      the sample is coalesced to ~8 KiB-rows-per-partition and
      localCheckpoint'd once for all fits that share it.
    """
    sample = (
        feats.sample(fraction=min(1.0, fit_sample / n), seed=seed)
        if n > fit_sample
        else feats
    )
    n_parts = max(1, min(8, int(min(n, fit_sample)) // 8192 + 1))
    return sample.coalesce(n_parts).localCheckpoint(eager=True)
