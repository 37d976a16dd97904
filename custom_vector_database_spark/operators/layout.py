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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """(df, z) where z is a Z-order (Morton) key interleaving the bits of
    each column's rank-normalized bucket — pure Catalyst bit arithmetic.

    A single-column sort gives perfect pruning on that column and NONE on
    any other; Z-order trades a little of each for useful pruning on ALL
    ``cols`` at once (a file covers ~2^(-B/k) of each column's range for k
    columns) — the standard multi-dimensional clustering used by lakehouse
    OPTIMIZE ZORDER.

    Bucketization is linear min-max scaling from one tiny min/max
    aggregate (a driver-side job over 2·k scalars — O(1) state at any
    table size). Linear buckets skew with skewed data; for heavy skew,
    substitute quantile bounds from approxQuantile. NULLs land in bucket
    0, sorting together like NULLS FIRST.
    """
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).first()
    max_bucket = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.lit(max_bucket),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * max_bucket),
        )
        bucket = F.greatest(F.lit(0), F.coalesce(bucket, F.lit(0))).cast("long")
        # spread bucket's bits to positions j, j+k, j+2k, ... (bit interleave)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
            )
    return df, z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering: range-partition + sort by the Z-order
    key, drop it, write Parquet. Every column in ``cols`` gets narrowed
    per-file min/max zone maps, so predicates on ANY of them prune files
    (tests/test_layout.py measures the narrowing on both dimensions)."""
    df2, z = zorder_key(df, cols, bits)
    (
        df2.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_files(
    spark,
    path: str,
    target_bytes: int = 128 << 20,
    sort_by: str | None = None,
) -> int:
    """Small-file compaction (the OPTIMIZE maintenance verb): rewrite a
    parquet directory into ~``ceil(total_bytes / target_bytes)`` files,
    atomically (tmp write → rename swap).

    Streaming sinks and incremental batch appends accrete files far below
    the ~128 MB a scan wants (each file costs a task + a footer read +
    object-store request); at 100 TB unchecked accretion makes scans
    metadata-bound. With ``sort_by`` the rewrite re-clusters via a range
    shuffle (preserving zone-map pruning, see range_sorted_write);
    otherwise a plain round-robin repartition — no sort, cheapest bin-pack.

    The swap is two renames, so a crash can land between them; entry
    therefore starts with the same roll-forward/roll-back recovery as
    streaming.stream_ops.recover_swap (complete tmp = the new state) and
    clears stale tmp/old dirs so the renames cannot collide.

    Returns the new file count.
    """
    import math
    import os
    import shutil

    tmp = f"{path.rstrip('/')}_compact_tmp"
    old = f"{path.rstrip('/')}_compact_old"
    if not os.path.exists(path) and os.path.exists(old):
        if os.path.exists(tmp) and os.path.exists(f"{tmp}/_SUCCESS"):
            os.rename(tmp, path)  # roll forward: compacted write completed
        else:
            os.rename(old, path)  # roll back: swap never started
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    if sort_by is not None:
        out = df.repartitionByRange(n, F.col(sort_by)).sortWithinPartitions(sort_by)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def recover_partitioned_swap(rows_path: str) -> None:
    """Heal a crash between compact_partitioned's two renames: a complete
    tmp (_SUCCESS present) rolls FORWARD, anything else rolls BACK to the
    old dir. Called at compact entry AND by the index load() paths, so a
    half-swapped layout is reachable again through the normal API without
    hand-renaming directories."""
    import os

    if os.path.exists(rows_path):
        return
    tmp = f"{rows_path.rstrip('/')}_compact_tmp"
    old = f"{rows_path.rstrip('/')}_compact_old"
    if os.path.exists(old):
        if os.path.exists(tmp) and os.path.exists(f"{tmp}/_SUCCESS"):
            os.rename(tmp, rows_path)  # roll forward: rewrite completed
        else:
            os.rename(old, rows_path)  # roll back: swap never started


def tombstones_path(base_path: str) -> str:
    return f"{base_path.rstrip('/')}/tombstones"


def read_tombstones(spark, base_path: str, id_col: str):
    """The tombstone sidecar as a single-column DataFrame, or None when no
    tombstones exist. The sidecar is a plain parquet directory of deleted
    ids next to the partitioned layout — small relative to the layout by
    design (deletes between compactions), so the anti-joins that consume
    it broadcast."""
    import os

    p = tombstones_path(base_path)
    has_parts = os.path.isdir(p) and any(
        f.endswith(".parquet")
        for _dp, _dn, fs in os.walk(p)
        for f in fs
    )
    if not has_parts:
        return None
    return spark.read.parquet(p).select(id_col).distinct()


def append_tombstones(ids_df, base_path: str) -> None:
    """Append deleted ids to the sidecar. Parquet append is the same
    object-store-portable commit the layout's delta appends use."""
    ids_df.write.mode("append").parquet(tombstones_path(base_path))


def clear_tombstones(base_path: str) -> None:
    import shutil

    shutil.rmtree(tombstones_path(base_path), ignore_errors=True)


def compact_partitioned(
    spark,
    rows_path: str,
    partition_col: str,
    n_partitions: int,
    files_per_partition: int = 1,
    salt_col: str | None = None,
    transform=None,
) -> dict:
    """Compact a ``partitionBy(partition_col)`` parquet layout so each
    partition directory holds ``files_per_partition`` part files — the
    index-layout form of compact_files, shared by IvfIndex.compact and
    IvfPqIndex.compact. One hash repartition on (partition_col[, salt])
    sends each partition's rows to exactly files_per_partition tasks, so
    the rewrite is a single shuffle of the layout; the swap is the same
    tmp-write → two-rename dance with roll-forward/roll-back recovery on
    entry (complete tmp = the new state).

    Concurrency contract: the swap is crash-safe but NOT reader-safe — a
    search or scan in flight during the two-rename window (or holding file
    handles into the old dir after its part files are deleted) fails with
    missing-file errors. Compaction requires exclusive access to the
    layout: schedule it like any table-maintenance window, with upserts
    and searches quiesced. Spark has no cross-session lock to take here;
    on a shared lakehouse, the table-format transaction log (Delta/Iceberg)
    is the right tool — this parquet-native verb trades that isolation for
    zero dependencies.

    ``transform`` (DataFrame -> DataFrame), when given, is applied to the
    layout before the rewrite — how index compaction physically drops
    tombstoned rows (the rewrite is the one moment the whole layout is
    already being rewritten, so the filter is free).

    Returns {files_before, files_after, n_rows}; the caller re-reads
    rows_path afterwards for a fresh handle.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    recover_partitioned_swap(rows_path)
    tmp = f"{rows_path.rstrip('/')}_compact_tmp"
    old = f"{rows_path.rstrip('/')}_compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    def _count_files() -> int:
        return sum(
            1
            for dp, _, fs in os.walk(rows_path)
            for f in fs
            if f.endswith(".parquet")
        )

    files_before = _count_files()
    df = spark.read.parquet(rows_path)
    if transform is not None:
        df = transform(df)
    # n_rows rides the rewrite as an observation — the separate count()
    # was a second full pass over the layout purely for the stats dict
    from pyspark.sql import Observation

    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))
    if files_per_partition == 1:
        packed = df.repartition(n_partitions, F.col(partition_col))
    else:
        # the salt MUST be deterministic per row: a nondeterministic key
        # (e.g. monotonically_increasing_id) re-evaluates differently on a
        # shuffle-map retry and can drop/duplicate rows mid-rewrite — the
        # fallback hashes every data column instead
        salt_src = (
            [F.col(salt_col)]
            if salt_col is not None
            else [F.col(c) for c in df.columns if c != partition_col]
        )
        salt = F.pmod(F.hash(*salt_src), F.lit(files_per_partition))
        packed = df.repartition(
            n_partitions * files_per_partition, F.col(partition_col), salt
        )
    packed.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    n_rows = obs.get["n"]  # the write completed; the observation is final
    os.rename(rows_path, old)
    os.rename(tmp, rows_path)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": _count_files(),
        "n_rows": int(n_rows),
    }


def in_literals(col_name: str, values) -> Column:
    """``col IN (v1, v2, ...)`` built as ONE parsed SQL expression.

    ``Column.isin`` constructs one literal Column per value through
    py4j — measured ~5–7 s of pure driver time at ~6k string values
    (round 15), charged per call. The SQL parser ingests the same list
    in ~10 ms and yields the IDENTICAL plan (In → InSet past the
    conversion threshold), so per-row execution keeps the hash-set
    probe the big-list call sites were chosen for. Strings are quoted
    with '' escaping; ints/floats pass through str(). An empty list
    matches isin([]): no row qualifies."""
    vals = list(values)
    if not vals:
        return F.lit(False)

    def _lit(v) -> str:
        if hasattr(v, "item"):  # numpy scalar → python scalar
            v = v.item()
        if isinstance(v, str):
            return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return str(v)
        raise TypeError(f"unsupported IN-literal type: {type(v)!r}")

    return F.expr(f"`{col_name}` IN ({','.join(_lit(v) for v in vals)})")


def check_model_id(
    pinned: str | None, supplied: str | None, what: str
) -> None:
    """Refuse vectors from a DIFFERENT embedding model than the one an
    embedding-keyed artifact was built from — the one remaining
    silent-wrongness class in the embedding path: re-embedding a corpus
    with a new model and upserting into an old layout (or probing an old
    sign-band sidecar) compares vectors across incompatible spaces, so
    every distance/cosine verdict is garbage and nothing else fires.
    The reference refuses wrong-SPACE vectors at every write (dim check,
    vectordb.cpp:39-41, 65-67); this is the same contract one level up —
    same dim, wrong model.

    Opt-in, the n_buckets/minhash-shape pin pattern: the check refuses
    only when BOTH sides declare a model. A legacy artifact (no pin) or
    an undeclared caller (model_id=None) passes — so every pre-pin
    layout loads and every existing call keeps working, while two
    DECLARED-and-different models always refuse."""
    if pinned is None or supplied is None:
        return
    if str(pinned) != str(supplied):
        raise ValueError(
            f"{what} was built from embedding model {pinned!r} but this "
            f"call supplies vectors from model {supplied!r} — vectors "
            "from different models live in incompatible spaces, so every "
            "distance/cosine verdict against the stored vectors would be "
            "silently wrong; re-embed with the pinned model, or rebuild "
            "the artifact from vectors of the new model"
        )


from contextlib import contextmanager


@contextmanager
def meta_write_lease(path: str, verb: str, attempts: int = 20,
                     wait_s: float = 0.05):
    """Serialize a saved layout's ``meta.json`` install against
    calibrate's read-modify-replace (operators/calibrate.py
    ``_persist_calibration``). Both writers take the artifact's sibling
    ``<path>_lock`` lease — the same lock ``install_dir_swap`` and the
    autopilot's gc already use — so a direct ``save()`` landing between
    calibrate's locked read and its ``os.replace`` can no longer have
    its fresh meta clobbered by the old body + pin (r11 ADVICE finding:
    only the swap path took the lock; MaxSim's commit-marker install
    and the IVF-family's direct meta writes did not).

    Every hold through here is sub-second (one JSON rewrite or one
    marker rename), so a conflict is retried briefly before the typed
    ``WriterLeaseHeld`` refusal propagates; ``stale_after_s`` matches
    the swap lock's hour rule so a crashed holder can never wedge
    saves forever."""
    import time

    from custom_vector_database_spark.streaming.lease import (
        WriterLeaseHeld,
        acquire_writer_lease,
        release_writer_lease,
    )

    lock_dir = str(path) + "_lock"
    for attempt in range(int(attempts)):
        try:
            acquire_writer_lease(lock_dir, verb, stale_after_s=3600.0)
            break
        except WriterLeaseHeld:
            if attempt == attempts - 1:
                raise
            time.sleep(float(wait_s))
    try:
        yield
    finally:
        release_writer_lease(lock_dir)


def install_dir_swap(path: str, write_tmp, heal=None) -> None:
    """The ONE copy of the whole-directory artifact-install choreography
    (r10 review finding: it existed as drifting near-copies in
    VectorTable._swap_index_in and the maintenance autopilot): heal a
    prior mid-swap crash, have ``write_tmp(tmp_dir)`` write a COMPLETE
    artifact into the sibling tmp, rename the old artifact away, rename
    the tmp in, drop the old. A crash at any point leaves either the old
    artifact or the new one — never neither, never a mix.

    ``heal`` overrides the default heal (rename ``_old`` back when the
    target is missing) for callers with a completeness marker that can
    also roll FORWARD (VectorTable's kind.json).

    The whole choreography runs under a sibling ``<path>_lock`` writer
    lease (streaming/lease.py — the lock must live BESIDE the artifact,
    not inside it, because the artifact dir itself is renamed): the
    autopilot's gc action takes the same lock before deleting
    ``_tmp``/``_old`` leftovers, so a gc in another process can never
    rmtree the tmp this swap is about to rename in (r11 review
    finding). A crashed swap's lock self-clears via the lease's
    dead-pid reclaim; the empty ``_lock`` dir that remains is the
    stable mutex point, not debris."""
    import os
    import shutil

    from custom_vector_database_spark.streaming.lease import writer_lease

    tmp, old = path + "_tmp", path + "_old"
    # stale_after_s: an hour-old lock whose holder stopped heartbeating
    # is a crashed holder no matter what host it names — without this, a
    # foreign-host (or renamed-host) crash would wedge every future
    # save/rebuild of the artifact behind a force knob no caller on
    # this path exposes (r11 second-review finding)
    # heartbeat_s: the guarded region INCLUDES write_tmp — a full
    # artifact rewrite that can far outlast any fixed staleness budget
    # at scale. The beat refreshes the lock's mtime while the write
    # runs, so stale_after_s only ever fences a holder that truly
    # stopped beating, never a slow live writer mid-write (r11
    # third-review finding).
    with writer_lease(path + "_lock", "install_dir_swap",
                      stale_after_s=3600, heartbeat_s=600):
        if heal is not None:
            heal()
        elif not os.path.isdir(path) and os.path.isdir(old):
            os.rename(old, path)  # crash between the two renames
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        write_tmp(tmp)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
