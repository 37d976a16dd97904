"""Structured Streaming twins of the batch event-time windows.

The reference is strictly batch (every CLI call is load→op→save,
main.cpp:66-70) — streaming is a pure extension (SURVEY §2.2 'Streaming':
ABSENT → Structured Streaming reserved for the events extension).

Pattern: file-source readStream over the same events parquet → watermarked
windowed aggregation → memory sink, driven with trigger(availableNow) so a
test can await completion and compare against the batch window() result
bit-for-bit (tests/test_streaming.py). ``outputMode("complete")`` emits
every window, making the final memory-table state directly comparable.

At scale the same plan runs against a Kafka source with a real watermark:
the aggregation state is keyed by (window), partitioned by the grouping
keys, and late events beyond the watermark are dropped instead of
re-opening state — the standard Spark streaming story, nothing custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from custom_vector_database_spark.streaming.lease import (
    holds_writer_lease,
    writer_lease,
)

__all__ = [
    "streaming_events",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_agg",
    "stream_purchase_click_join",
    "run_stream_to_memory",
    "stream_corpus_ingest",
    "stream_corpus_neardup_ingest",
    "stream_corpus_dsir_ingest",
    "fit_dsir_gate",
    "fit_quality_classifier",
    "load_dsir_gate",
    "load_quality_gate",
    "compact_fp_sidecar",
    "compact_mh_sidecar",
    "compact_sb_sidecar",
    "stream_corpus_semdedup_ingest",
    "stream_corpus_cdc_ingest",
    "corpus_cdc_apply_batch",
    "compact_cdc_sidecar",
    "sidecar_report",
    "list_sidecar_debris",
]


def _materialized_barrier(df: DataFrame) -> tuple[DataFrame, int]:
    """Cut lineage AND materialize ``df`` before the caller appends to a
    directory the plan reads — the ingest protocols' read-own-appends
    barrier, in ONE place (r14 verdict: the ordering invariant used to
    live in per-site comments; an edit replacing the count with a
    partial-scan action would silently reintroduce read-own-appends).
    The lazy checkpoint costs no dedicated job: the full-scan count
    right here persists every partition. Returns (df, row_count)."""
    df = df.localCheckpoint(eager=False)
    return df, df.count()


def run_stream_to_memory(
    spark: SparkSession,
    agg_df: DataFrame,
    prefix: str,
    output_mode: str = "complete",
    timeout: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a streaming aggregation to completion (availableNow) into a
    uniquely-named memory sink and return its table. Raises TimeoutError
    if the stream does not finish — reading the sink mid-stream would
    silently return PARTIAL aggregates.

    ``state_partitions``: a stream pins its state-store instance count
    from spark.sql.shuffle.partitions at START (per-checkpoint, for the
    stream's whole life). These bounded test/bench streams carry tiny
    state, where 32 stores × micro-batches is pure per-task overhead
    (~3-5× the runtime) — so the conf is temporarily lowered around
    .start() and restored after. On a production cluster with real
    key cardinality pass None to inherit the session setting."""
    import uuid

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    _drive_bounded_stream(
        spark,
        lambda: (
            agg_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        ),
        name=name,
        timeout=timeout,
        state_partitions=state_partitions,
    )
    return spark.table(name)


def _drive_bounded_stream(
    spark: SparkSession,
    start,
    name: str,
    timeout: int,
    state_partitions: int | None,
) -> None:
    """Shared drive loop for bounded (availableNow) streams: pin the
    state-store count down around .start() (see run_stream_to_memory's
    rationale), await completion, raise on timeout."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(int(old), state_partitions)),
            )
        q = start()
        if not q.awaitTermination(timeout):
            q.stop()
            raise TimeoutError(f"stream {name} did not finish within {timeout}s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

_DEC = "decimal(18,2)"

# events.parquet schema: ts is a naive TIMESTAMP(MICROS); declaring plain
# TimestampType here makes the file-stream source read it as session-tz
# (UTC) timestamps, identical to the batch loader's NTZ→TIMESTAMP cast.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, same ts semantics as the batch
    loader (events_queries.load_events). Handles BOTH table layouts: a
    directory of part files (every real table — stream it directly, one
    source file per part) and the single-file fixture (the file-stream
    source needs a DIRECTORY basePath, so point at sf_dir with a filename
    glob). The sf1 probe caught the directory case: the old glob-only
    path matched zero part files and streamed an empty source."""
    import os

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        return spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(path)
    return (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def stream_tumbling_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked 1-hour tumbling window: (window_start_us, n_events,
    total_value) — identical output shape to the batch
    event_tumbling_window query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "n_events",
            "total_value",
        )
    )


def stream_sliding_agg(
    events: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked SLIDING window (width > slide ⇒ overlapping windows,
    each event counted in width/slide of them). State cost scales with the
    overlap factor — the watermark bounds how many open windows exist at
    once regardless of stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "n_events",
            "total_value",
        )
    )


def stream_purchase_click_join(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    user_filter: int | None = None,
) -> DataFrame:
    """Stream-STREAM inner join: each purchase matched to the same user's
    clicks in the preceding ``lookback`` (attribution). Both legs derive
    from one source stream (a self-join — two independent state stores);
    the event-time range condition plus the watermarks let Spark EVICT
    state: a click older than watermark+lookback can never match a future
    purchase and is dropped, so state is bounded by the time window, not
    the stream length. Without the range condition this join would buffer
    both streams forever — the condition is the scale contract, not an
    optimization.

    Returns append-mode rows (user_id, purchase_id, click_id, lag_us).
    """
    base = events if user_filter is None else events.filter(
        F.col("user_id") < user_filter
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )


def stream_session_agg(
    events: DataFrame, gap: str = "12 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked per-user session window (inactivity gap) — streaming twin
    of event_session_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
            "total_value",
        )
    )


def recover_swap(target_dir: str) -> None:
    """Repair an interrupted tmp→data swap (see stream_upsert_latest).

    A leftover ``data_old`` with no ``data`` is rolled forward when a
    complete tmp write exists (``_SUCCESS`` marker — it IS the new state)
    or rolled back otherwise; stale tmp/old dirs from killed runs are
    cleared so the next swap's renames cannot collide.
    """
    import os
    import shutil

    data = f"{target_dir}/data"
    tmp = f"{target_dir}/data_tmp"
    old = f"{target_dir}/data_old"
    if not os.path.exists(data) and os.path.exists(old):
        if os.path.exists(tmp) and os.path.exists(f"{tmp}/_SUCCESS"):
            os.rename(tmp, data)  # roll forward: tmp write completed
        else:
            os.rename(old, data)  # roll back: swap never started
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)


def stream_upsert_latest(
    spark: SparkSession,
    events: DataFrame,
    target_dir: str,
    timeout: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """foreachBatch upsert sink: keep the newest event per user in a parquet
    target, merged batch-by-batch.

    Each micro-batch reduces to its per-user latest row (``max_by`` over
    (ts, event_id) — one map-side-combined aggregation), then merges with
    the target by the same argmax over the union. Because max_by over
    (ts, event_id) is associative, merging per batch is equivalent to one
    argmax over the whole stream — the registered oracle checks exactly
    that equivalence.

    Crash safety: the swap is tmp → (data → old, tmp → data) — two renames,
    so a crash can land between them. Every batch therefore starts with a
    recovery step: a leftover ``data_old`` with no ``data`` is rolled
    forward (complete tmp exists → it IS the new state) or back; stale
    tmp/old from killed runs are cleared before reuse. Re-running a batch
    after recovery is idempotent because the merge is an argmax.

    At scale the target would be partitioned by a user_id bucket and each
    batch would overwrite only the partitions it touches (dynamic
    partition overwrite); the full-target union here matches the fixture's
    whole-file model.
    """
    import os
    import shutil

    ordering = F.struct(F.col("ts"), F.col("event_id"))
    payload = F.struct("event_id", "event_type", "value", "ts")

    def latest_per_user(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max_by(payload, ordering).alias("s")
        ).select("user_id", "s.*")

    data = f"{target_dir}/data"
    tmp = f"{target_dir}/data_tmp"
    old = f"{target_dir}/data_old"

    def recover() -> None:
        recover_swap(target_dir)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        recover()
        if os.path.exists(data):
            merged = latest_per_user(
                spark.read.parquet(data).unionByName(latest_per_user(batch))
            )
        else:
            merged = latest_per_user(batch)
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(data):
            os.rename(data, old)
            os.rename(tmp, data)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, data)

    _drive_bounded_stream(
        spark,
        lambda: (
            events.writeStream.foreachBatch(upsert)
            .option("checkpointLocation", f"{target_dir}/ckpt")
            .trigger(availableNow=True)
            .start()
        ),
        name="stream_upsert_latest",
        timeout=timeout,
        state_partitions=state_partitions,
    )
    recover()
    return spark.read.parquet(data)


def stream_vector_ingest(
    spark: SparkSession,
    delta_dir: str,
    index,
    vec_schema: T.StructType,
    max_files_per_trigger: int = 2,
    timeout: int = 120,
    model_id: str | None = None,
) -> int:
    """Continuous ANN index maintenance: stream a directory of vector
    delta files into a saved IVF layout via foreachBatch — each
    micro-batch pays only its own delta-encode (IvfIndex.upsert), so the
    index stays searchable while ingesting; no rebuild, no full re-encode.

    This is the streaming form of the ivf_upsert verb: batch-by-batch
    upsert must equal merge-once (the appends are disjoint row sets into
    a partitioned layout — order-independent), which the registered
    query's oracle certifies. maxFilesPerTrigger forces MULTIPLE
    micro-batches under trigger(availableNow) so the test exercises the
    repeated-merge path, not a degenerate single batch.

    Idempotence: foreachBatch is AT-LEAST-once — after a crash the
    restarted query replays uncommitted batch ids. The sink records each
    applied batch id in a sidecar next to the checkpoint (the documented
    foreachBatch dedup pattern) and skips already-applied ids, which
    narrows the duplicate window to a crash landing exactly BETWEEN the
    parquet append and the sidecar record (record-after-apply — the
    reverse order could silently LOSE a batch, which is worse than
    duplicating one). Within that narrow window the guarantee is
    at-least-once, not exactly-once; a deployment that cannot tolerate
    even that should dedup by id downstream or rebuild on recovery.
    The sidecar lives with the checkpoint: reuse both to resume, delete
    both to start over.

    A declared ``model_id`` against a pin-unaware sink refuses BEFORE
    the stream starts (signature probe below) — otherwise the TypeError
    fires inside foreachBatch and surfaces as an opaque
    StreamingQueryException mid-stream (r10 ADVICE).

    Returns the number of micro-batches processed this call. Checkpoint
    lifecycle: callers own the delta_dir parent (bounded drive, fresh
    checkpoint per call; a production deployment pins both dirs)."""
    import json as _json
    import os

    if model_id is not None:
        import inspect

        # refuse a declared pin against a pin-unaware sink UP FRONT: a
        # duck-typed index whose upsert(batch) takes no model_id kwarg
        # would otherwise TypeError inside foreachBatch and surface as
        # an opaque StreamingQueryException mid-stream
        try:
            params = inspect.signature(index.upsert).parameters.values()
            pin_aware = any(
                p.name == "model_id"
                or p.kind is inspect.Parameter.VAR_KEYWORD
                for p in params
            )
        except (TypeError, ValueError):
            pin_aware = True  # signature unavailable: let the call decide
        if not pin_aware:
            raise ValueError(
                f"model_id={model_id!r} was declared but this sink's "
                f"upsert ({type(index).__name__}.upsert) accepts no "
                "model_id kwarg — it cannot enforce the embedding-model "
                "pin; drop model_id= or use a pin-aware index"
            )

    n_batches = 0
    ckpt = os.path.join(delta_dir, "_ckpt")
    applied_path = os.path.join(delta_dir, "_applied_batches.json")

    def _applied() -> set[int]:
        try:
            with open(applied_path) as f:
                return set(_json.load(f))
        except (OSError, ValueError):
            return set()

    def ingest(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        if batch.isEmpty():
            return
        done = _applied()
        if batch_id in done:  # replayed after a crash: already appended
            return
        # the embedding-model pin rides the stream: a declared-different
        # model refuses on the FIRST batch, before anything lands. The
        # kwarg is forwarded only when declared — `index` is duck-typed
        # (anything with .upsert(batch) streams), and an undeclared
        # caller must keep working against pin-unaware sinks
        if model_id is None:
            index.upsert(batch)
        else:
            index.upsert(batch, model_id=model_id)
        # record-AFTER-apply: a crash between the two replays the batch,
        # never skips it; the sidecar write is a same-dir atomic rename
        tmp = applied_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(sorted(done | {batch_id}), f)
        os.replace(tmp, applied_path)
        n_batches += 1

    stream = (
        spark.readStream.schema(vec_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(delta_dir)
    )

    def start():
        return (
            stream.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _drive_bounded_stream(spark, start, "vector_ingest", timeout, None)
    return n_batches


_FP_SIDECAR = "_fingerprints"      # inside corpus_dir; "_" prefix hides it
_FP_CLAIMS = "_ingest_claims"      # write-ahead claim markers, one per batch


def _corpus_has_data(corpus_dir: str) -> bool:
    """True iff the corpus dir holds at least one parquet data file
    OUTSIDE the underscore-prefixed metadata dirs (sidecar/claims) that
    Spark's file listing skips anyway — the existence test a bare
    ``os.path.isdir`` cannot answer, because the claim marker's mkdir
    creates corpus_dir before the first corpus append lands."""
    import os

    if not os.path.isdir(corpus_dir):
        return False
    for entry in os.listdir(corpus_dir):
        if entry.startswith(("_", ".")):
            continue
        full = os.path.join(corpus_dir, entry)
        if entry.endswith(".parquet") and os.path.isfile(full):
            return True
        if os.path.isdir(full):  # partitioned corpus: key=value subdirs
            for _, _, fs in os.walk(full):
                if any(f.endswith(".parquet") for f in fs):
                    return True
    return False


def _corpus_fp_bucket(fp_col, n_buckets: int):
    """Stable integer bucket from a fingerprint's first 4 hex chars —
    the sidecar's partition key, identical in bootstrap, append, and
    probe so partition pruning always sees the same function."""
    return (F.conv(F.substring(fp_col, 1, 4), 16, 10).cast("long") % n_buckets)


def _read_fp_sidecar(spark: SparkSession, sidecar_dir: str):
    # explicit schema: an empty bootstrap (empty corpus) writes a
    # zero-file sidecar that parquet schema inference cannot read
    return spark.read.schema("fp string, batch_id long, fpb long").parquet(
        sidecar_dir
    )


def _write_sidecar_meta(
    sidecar_dir: str,
    n_buckets: int,
    n_perms: int | None = None,
    n_bands: int | None = None,
    band_bits: int | None = None,
    model_id: str | None = None,
    fp_kind: str | None = None,
    cdc_mask: int | None = None,
    cdc_window: int | None = None,
) -> None:
    import json
    import os

    meta: dict = {"n_buckets": int(n_buckets)}
    if n_perms is not None:
        meta["n_perms"] = int(n_perms)
    if n_bands is not None:
        meta["n_bands"] = int(n_bands)
    if band_bits is not None:
        meta["band_bits"] = int(band_bits)
    if model_id is not None:
        meta["model_id"] = str(model_id)
    if fp_kind is not None:
        meta["fp_kind"] = str(fp_kind)
    if cdc_mask is not None:
        meta["cdc_mask"] = int(cdc_mask)
    if cdc_window is not None:
        meta["cdc_window"] = int(cdc_window)
    with open(os.path.join(sidecar_dir, "_sidecar_meta.json"), "w") as f:
        json.dump(meta, f)


def _read_sidecar_meta(sidecar_dir: str) -> dict | None:
    """Raw meta dict, or None for a sidecar predating the meta file. A
    PRESENT but unparseable meta raises loudly — silently guessing any
    pinned parameter would reintroduce the mis-probe class the meta file
    exists to prevent."""
    import json
    import os

    meta_path = os.path.join(sidecar_dir, "_sidecar_meta.json")
    try:
        with open(meta_path) as f:
            raw = f.read()
    except FileNotFoundError:
        return None
    try:
        meta = json.loads(raw)
        if not isinstance(meta, dict):
            raise ValueError(f"meta is {type(meta).__name__}, not a dict")
        return meta
    except ValueError as e:
        raise ValueError(
            f"corrupt sidecar meta {meta_path!r} ({e!r}) — refusing to "
            "guess the pinned parameters; restore the meta file or rebuild "
            "the sidecar (delete it and let bootstrap re-derive it from "
            "the corpus)"
        ) from e


def _sidecar_n_buckets(sidecar_dir: str, default: int) -> int:
    """The AUTHORITATIVE bucket count of an existing sidecar — persisted
    at bootstrap/compaction so a caller passing a different n_buckets
    later cannot silently probe the wrong partitions (a mismatched
    modulus would miss existing fingerprints and re-append duplicates).
    ``default`` covers only a sidecar predating the meta file
    (FileNotFoundError) — a PRESENT but unparseable meta raises loudly:
    silently falling back to the caller's modulus on a sidecar built
    with a different one would mis-prune probe buckets and re-append
    duplicates, the exact bug the meta file exists to prevent."""
    meta = _read_sidecar_meta(sidecar_dir)
    if meta is None:
        return default
    try:
        return int(meta["n_buckets"])
    except (ValueError, KeyError, TypeError) as e:
        raise ValueError(
            f"corrupt sidecar meta in {sidecar_dir!r} ({e!r}) — refusing "
            "to guess the bucket modulus; restore the meta file or rebuild "
            "the sidecar (delete it and let bootstrap re-derive it from "
            "the corpus)"
        ) from e


def _check_mh_shape(sidecar_dir: str, n_perms: int, n_bands: int) -> None:
    """Refuse a minhash probe/rebuild whose (n_perms, n_bands) differ from
    the shape the sidecar's signatures and band hashes were built with.
    A mismatched shape does NOT fail loudly on its own: band hashes simply
    diverge (missing every near-duplicate) and signature agreement over
    mismatched-length signatures NULL-pads and undercounts — the silent
    mis-probe class the n_buckets meta exists to prevent, now pinned for
    the minhash shape too. Sidecars whose meta predates shape pinning
    (or the meta file entirely) pass through on the caller's values."""
    meta = _read_sidecar_meta(sidecar_dir)
    if meta is None:
        return
    pinned_p, pinned_b = meta.get("n_perms"), meta.get("n_bands")
    if pinned_p is None and pinned_b is None:
        return
    if (pinned_p is None) != (pinned_b is None):
        # a one-sided pin is corrupt meta (hand-restored or truncated),
        # not a legacy pre-pin sidecar: int(None) below would raise a
        # bare TypeError, and trusting the present half risks the same
        # silent mis-probe the pin exists to prevent
        raise ValueError(
            f"corrupt sidecar meta in {sidecar_dir!r}: exactly one of "
            f"n_perms ({pinned_p!r}) / n_bands ({pinned_b!r}) is pinned — "
            "refusing to guess the missing half; restore the meta file or "
            "rebuild the sidecar (delete both frames and let bootstrap "
            "re-derive them)"
        )
    if int(pinned_p) != int(n_perms) or int(pinned_b) != int(n_bands):
        raise ValueError(
            f"minhash sidecar {sidecar_dir!r} was built with "
            f"n_perms={pinned_p}, n_bands={pinned_b} but this call asked "
            f"for n_perms={n_perms}, n_bands={n_bands} — a mismatched "
            "shape silently misses near-duplicates (band hashes diverge; "
            "agreement over mismatched-length signatures undercounts); "
            "pass the pinned shape, or rebuild the sidecar under the new "
            "one (delete both frames and let bootstrap re-derive them)"
        )


def _check_sb_shape(sidecar_dir: str, n_bands: int, band_bits: int) -> None:
    """The sign-band analogue of _check_mh_shape: a probe or rebuild
    whose (n_bands, band_bits) differ from the pinned shape would band
    the SAME vectors into different keys and silently miss every
    semantic near-duplicate. Pre-pin metas pass on the caller's values."""
    meta = _read_sidecar_meta(sidecar_dir)
    if meta is None:
        return
    pinned_b, pinned_w = meta.get("n_bands"), meta.get("band_bits")
    if pinned_b is None and pinned_w is None:
        return
    if (pinned_b is None) != (pinned_w is None):
        # one-sided pin = corrupt meta, not legacy — see _check_mh_shape
        raise ValueError(
            f"corrupt sidecar meta in {sidecar_dir!r}: exactly one of "
            f"n_bands ({pinned_b!r}) / band_bits ({pinned_w!r}) is pinned — "
            "refusing to guess the missing half; restore the meta file or "
            "rebuild the sidecar (delete both frames and let bootstrap "
            "re-derive them)"
        )
    if int(pinned_b) != int(n_bands) or int(pinned_w) != int(band_bits):
        raise ValueError(
            f"sign-band sidecar {sidecar_dir!r} was built with "
            f"n_bands={pinned_b}, band_bits={pinned_w} but this call "
            f"asked for n_bands={n_bands}, band_bits={band_bits} — a "
            "mismatched shape silently misses semantic near-duplicates "
            "(band keys diverge); pass the pinned shape, or rebuild the "
            "sidecar under the new one (delete both frames and let "
            "bootstrap re-derive them)"
        )


def _check_sidecar_model(sidecar_dir: str, model_id: str | None) -> None:
    """The embedding-model pin on the sign-band sidecar — the layout
    family's check_model_id contract on the streaming artifact: a batch
    of vectors from a DIFFERENT embedding model than the sidecar was
    bootstrapped from bands and cosine-verifies in an incompatible
    space, so every drop/keep verdict is silently garbage. Opt-in like
    the shape pins: refuses only when BOTH the meta and the caller
    declare a model; legacy metas and undeclared callers pass."""
    from custom_vector_database_spark.operators.layout import check_model_id

    meta = _read_sidecar_meta(sidecar_dir)
    if meta is None:
        return
    check_model_id(
        meta.get("model_id"), model_id, f"sign-band sidecar {sidecar_dir!r}"
    )


# The exact family's fingerprint KINDS: how the key column becomes the
# sidecar's fp string. 'text' is the original normalized-text member
# (lowercase/collapse-spaces/trim md5 — operators/text.fingerprint_md5);
# 'payload_md5' is the round-10 MULTIMODAL member: a raw md5 over an
# opaque BINARY payload column (image/audio/video bytes) — byte-level
# exact dedup needs NO codec, so it works in any environment the decode
# stubs don't (multimodal.py's env-gates). Same sidecar, same claims,
# same crash story; only the fingerprint expression differs.
_FP_KINDS = ("text", "payload_md5")


def _fp_expr(col_name: str, fp_kind: str):
    from custom_vector_database_spark.operators.text import fingerprint_md5

    if fp_kind == "text":
        return fingerprint_md5(F.col(col_name))
    if fp_kind == "payload_md5":
        return F.md5(F.col(col_name))
    raise ValueError(
        f"unknown fp_kind {fp_kind!r}; expected one of {_FP_KINDS}"
    )


def _durable_claim(claims_dir: str, claim: str) -> None:
    """Create the write-ahead claim marker DURABLY (fsync the file and
    its directory entry) before any append lands. The claim is the WAL
    the crash-replay protocol reconciles against: if a power loss
    persisted the sidecar append but lost a page-cache-only claim, the
    replay would run with recovering=False, see the batch's own rows
    already in the sidecar, and drop the whole batch permanently — the
    sidecar forever shadowing content that never reached the corpus
    (r11 review finding; the lease writer fsyncs for the same reason)."""
    import os

    created_dir = not os.path.isdir(claims_dir)
    os.makedirs(claims_dir, exist_ok=True)
    fd = os.open(claim, os.O_CREAT | os.O_WRONLY, 0o644)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    dfd = os.open(claims_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    if created_dir:
        # first batch of a fresh sidecar: claims_dir's own directory
        # entry in the corpus dir is still page-cache-only — a power
        # loss could drop the whole claims dir (and this claim) while
        # the sidecar append survives, re-opening exactly the
        # batch-shadowing hazard the claim fsync closes (r11 ADVICE
        # finding). Only needed when the makedirs actually created it.
        pfd = os.open(os.path.dirname(claims_dir) or ".", os.O_RDONLY)
        try:
            os.fsync(pfd)
        finally:
            os.close(pfd)


def _check_fp_kind(sidecar_dir: str, fp_kind: str) -> None:
    """The fingerprint-KIND pin: a text-fp sidecar probed with payload
    hashes (or vice versa) never collides, so every duplicate silently
    re-appends — the n_buckets/model_id silent-wrongness class on the
    exact family. Legacy metas (no fp_kind key) pin 'text', the only
    kind that existed before round 10."""
    meta = _read_sidecar_meta(sidecar_dir)
    if meta is None:
        return
    pinned = meta.get("fp_kind", "text")
    if str(pinned) != str(fp_kind):
        raise ValueError(
            f"fingerprint sidecar {sidecar_dir!r} was built with "
            f"fp_kind={pinned!r} but this call uses fp_kind={fp_kind!r} — "
            "fingerprints of different kinds never collide, so every "
            "duplicate would silently re-append; probe with the pinned "
            "kind, or rebuild the sidecar (delete it and let bootstrap "
            "re-derive fingerprints under the new kind)"
        )


@holds_writer_lease("bootstrap:exact")
def _ensure_fp_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    sidecar_dir: str,
    text_col: str,
    n_buckets: int,
    fp_kind: str = "text",
) -> None:
    """One-time bootstrap: derive the fingerprint sidecar from a single
    corpus scan (the ONLY steady-state-free corpus read in the ingest
    path), written crash-safe via the tmp-then-rename swap so a partial
    bootstrap can never masquerade as a complete fingerprint set."""
    import os
    import shutil

    old_dir = sidecar_dir + "_old"
    if not os.path.isdir(sidecar_dir) and os.path.isdir(old_dir):
        # a compaction crashed between its two renames: the _old dir IS
        # the complete pre-compaction sidecar — roll it back rather than
        # paying a fresh corpus-scan bootstrap
        os.rename(old_dir, sidecar_dir)
    if os.path.isdir(sidecar_dir):
        # fail fast BEFORE any stream starts (the _check_mh_shape story)
        _check_fp_kind(sidecar_dir, fp_kind)
        return
    # _corpus_has_data, not bare isdir: a corpus dir holding ONLY the
    # underscore metadata dirs (claims after a first-batch crash, or a
    # deleted-for-rebuild sidecar) has no Spark-visible files and a bare
    # read dies with a schema-inference error instead of bootstrapping
    # empty — the same failure corpus_ingest_apply_batch's recovery
    # guards against
    if _corpus_has_data(corpus_dir):
        fps = (
            spark.read.parquet(corpus_dir)
            .select(_fp_expr(text_col, fp_kind).alias("fp"))
            .distinct()
        )
    else:
        fps = spark.createDataFrame([], "fp string")
    tmp = sidecar_dir + "_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        fps.select(
            "fp",
            F.lit(-1).cast("long").alias("batch_id"),
            _corpus_fp_bucket(F.col("fp"), n_buckets).alias("fpb"),
        )
        .write.partitionBy("fpb")
        .parquet(tmp)
    )
    _write_sidecar_meta(tmp, n_buckets, fp_kind=fp_kind)
    os.rename(tmp, sidecar_dir)


def _refuse_null_text(batch: DataFrame, text_col: str) -> None:
    """Fail fast on NULL text in an ingest batch: fingerprint_md5(NULL)
    is NULL, and NULL never equi-joins — so a NULL-text doc would bypass
    every dedup probe AND every crash-replay reconcile anti-join,
    re-appending itself on each replay. Filter or impute upstream."""
    if batch.filter(F.col(text_col).isNull()).limit(1).count():
        raise ValueError(
            f"NULL {text_col!r} in ingest batch: a NULL fingerprint can "
            "neither dedup nor reconcile on crash replay (NULL never "
            "equi-joins) — filter or impute upstream before streaming "
            "into the corpus"
        )


@holds_writer_lease("apply:exact")
def corpus_ingest_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    fp_kind: str = "text",
) -> int:
    """Apply ONE dedup-on-ingest micro-batch against the fingerprint
    sidecar. Returns the number of documents appended. ``fp_kind``
    selects the fingerprint expression over ``text_col`` (which then
    names the KEY column): 'text' = normalized-text md5 (the original
    member), 'payload_md5' = raw md5 over a BINARY payload column (the
    codec-free multimodal member); the sidecar meta pins the kind and a
    mismatch refuses (_check_fp_kind).

    Steady state never reads the corpus: the anti-join probe side is the
    bucket-pruned sidecar — compact (fp, batch_id) rows partitioned by
    fingerprint prefix — so probe I/O is fp-sidecar bytes (~40 B/row)
    over only the buckets this batch's fingerprints can land in, never a
    corpus rescan + re-hash (the round-6 shape this replaces: a 100 TB
    corpus paid corpus-sized I/O per 2-file micro-batch).

    Crash safety (write-ahead claims): the order is claim marker ->
    sidecar append -> corpus append; the CALLER records the batch
    applied and then removes the claim. A replayed batch that finds its
    own claim takes the recovery path: probe excluding its own claimed
    rows, then ONE reconciling corpus scan decides which claimed
    fingerprints already carry their documents — so a crash at any point
    re-applies exactly the missing half and never duplicates either
    side. Recovery is the only corpus read, and only a crashed batch
    pays it."""
    import os

    from pyspark.sql import Window

    sidecar_dir = os.path.join(corpus_dir, _FP_SIDECAR)
    claims_dir = os.path.join(corpus_dir, _FP_CLAIMS)
    claim = os.path.join(claims_dir, f"claim_{batch_id}")
    recovering = os.path.exists(claim)
    # the persisted bucket count is authoritative: probing with a
    # different modulus than the sidecar was written with would skip the
    # partitions existing fingerprints live in and re-append duplicates
    n_buckets = _sidecar_n_buckets(sidecar_dir, n_buckets)
    _check_fp_kind(sidecar_dir, fp_kind)

    w = Window.partitionBy("__fp").orderBy(id_col)
    fresh = (
        batch.withColumn("__fp", _fp_expr(text_col, fp_kind))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
        .withColumn("__fpb", _corpus_fp_bucket(F.col("__fp"), n_buckets))
    )
    sidecar = _read_fp_sidecar(spark, sidecar_dir)
    probe = sidecar
    if recovering:
        probe = probe.filter(F.col("batch_id") != batch_id)
    # bucket-pruned probe: ONE bounded agg over the raw batch answers
    # both the NULL-text guard (_refuse_null_text's contract) and the
    # <= n_buckets bucket set that restricts the sidecar scan to the
    # partitions this batch can hit. One cheap md5+mod projection — NOT
    # the fresh plan, whose per-fp window shuffle would otherwise run
    # twice; previously the guard and the bucket collect were two
    # separate jobs over the same batch.
    pre = batch.agg(
        F.sum(F.col(text_col).isNull().cast("long")).alias("n_null"),
        F.collect_set(
            _corpus_fp_bucket(_fp_expr(text_col, fp_kind), n_buckets)
        ).alias("bkts"),
    ).first()
    if pre["n_null"]:
        raise ValueError(
            f"NULL {text_col!r} in ingest batch: a NULL fingerprint can "
            "neither dedup nor reconcile on crash replay (NULL never "
            "equi-joins) — filter or impute upstream before streaming "
            "into the corpus"
        )
    buckets = list(pre["bkts"])
    if len(buckets) < n_buckets:
        probe = probe.filter(F.col("fpb").isin(buckets))
    # else: the batch hits every bucket — the IN-list (and its per-dir
    # listing) prunes nothing and only adds predicate + listing overhead
    # (measured in the r12 sf100 CDC probe: a saturated 3170-value isin
    # over 4096 partition dirs cost 2.7x the plain full probe)
    probe = probe.select(F.col("fp").alias("__fp"))
    survivors = fresh.join(probe, "__fp", "left_anti")
    if recovering:
        # reconcile sidecar/corpus divergence: claimed fps whose
        # documents already landed must not re-append. The very first
        # batch can crash between claim creation and the corpus append —
        # at that point corpus_dir exists (the claim marker lives inside
        # it) but holds ONLY underscore-prefixed sidecar/claims dirs,
        # which Spark's file listing skips, so a bare read dies with a
        # schema-inference error instead of recovering. Replay must
        # reconcile against an EMPTY fingerprint set in that state
        # (mirrors _ensure_fp_sidecar's empty-corpus branch).
        if _corpus_has_data(corpus_dir):
            corpus_fps = (
                spark.read.parquet(corpus_dir)
                .select(_fp_expr(text_col, fp_kind).alias("__fp"))
                .distinct()
            )
        else:
            corpus_fps = spark.createDataFrame([], "__fp string")
        survivors = survivors.join(corpus_fps, "__fp", "left_anti")
    # materialize BEFORE the appends (the lazy plan reads the very
    # frames the appends below grow): the shared barrier persists every
    # partition in the count's job — one job, ordering enforced in code
    survivors, n_new = _materialized_barrier(survivors)
    if n_new:
        # write-ahead: the DURABLE claim lands before either append
        _durable_claim(claims_dir, claim)
        new_fps = survivors.select(
            F.col("__fp").alias("fp"),
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.col("__fpb").alias("fpb"),
        )
        if recovering:
            claimed = sidecar.filter(F.col("batch_id") == batch_id).select("fp")
            new_fps = new_fps.join(claimed, "fp", "left_anti")
        new_fps.write.mode("append").partitionBy("fpb").parquet(sidecar_dir)
        survivors.drop("__fp", "__fpb").write.mode("append").parquet(corpus_dir)
    return n_new


@holds_writer_lease("compact:exact", force_arg="force_lease")
def compact_fp_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    n_buckets: int = 16,
    new_n_buckets: int | None = None,
    force_lease: bool = False,
) -> dict:
    """Compact the fingerprint sidecar: per-batch appends leave one
    small file per touched bucket per micro-batch, and a year of daily
    drops is ~6k files/bucket whose open/footer overhead eventually
    dominates the probe — the same small-file story ivf_compact closes
    for index layouts, on the ingest sidecar. Rewrites each bucket to
    one file via the tmp-then-rename swap; a crash at any point leaves a
    complete sidecar recoverable — before the first rename the original
    is untouched (a stale tmp is re-rolled), and between the two renames
    the _old dir holds it intact and the next compact/ingest call rolls
    it back automatically. Refuses
    while any claim marker is outstanding: a crashed batch's recovery
    reads its own batch_id rows, which compaction collapses to -1.

    ``new_n_buckets`` REBUCKETS during the rewrite: every fingerprint's
    bucket is recomputed under the new modulus and the meta pin updates
    with it — the maintenance verb for a corpus that outgrew its
    bootstrap-time bucket count (probe pruning degrades as buckets
    widen; production sizes n_buckets to batch width). The fingerprint
    SET is untouched, so every probe decision is identical before and
    after; the single-frame swap makes modulus + layout change
    atomically (the _old dir always holds a self-consistent sidecar).

    Returns {"files_before", "files_after", "n_fps", "n_buckets"}."""
    import glob
    import os
    import shutil

    sidecar_dir = os.path.join(corpus_dir, _FP_SIDECAR)
    claims_dir = os.path.join(corpus_dir, _FP_CLAIMS)
    old_dir = sidecar_dir + "_old"
    if not os.path.isdir(sidecar_dir) and os.path.isdir(old_dir):
        # a prior compaction crashed between its two renames; _old is
        # the complete pre-compaction sidecar — roll back and compact it
        os.rename(old_dir, sidecar_dir)
    n_buckets = _sidecar_n_buckets(sidecar_dir, n_buckets)
    if new_n_buckets is not None and int(new_n_buckets) <= 0:
        raise ValueError(
            f"new_n_buckets must be positive, got {new_n_buckets!r}"
        )
    out_buckets = (
        int(new_n_buckets) if new_n_buckets is not None else n_buckets
    )
    outstanding = glob.glob(os.path.join(claims_dir, "claim_*"))
    if outstanding:
        raise ValueError(
            f"{len(outstanding)} unresolved ingest claim(s) "
            f"({sorted(os.path.basename(c) for c in outstanding)[:3]}…): "
            "re-drive stream_corpus_ingest to let recovery resolve them "
            "before compacting (compaction erases the per-batch claim "
            "rows recovery reconciles against)"
        )
    count_files = lambda d: sum(  # noqa: E731
        1
        for dp, _dn, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )
    files_before = count_files(sidecar_dir)
    fps = _read_fp_sidecar(spark, sidecar_dir)
    n_fps = fps.count()
    tmp = sidecar_dir + "_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        fps.select(
            "fp",
            F.lit(-1).cast("long").alias("batch_id"),
            # recomputed, not copied: identical under the pinned modulus,
            # the rebucket itself under a new one
            _corpus_fp_bucket(F.col("fp"), out_buckets).alias("fpb"),
        )
        .repartition(out_buckets, "fpb")  # one writer task per bucket
        .write.partitionBy("fpb")
        .parquet(tmp)
    )
    # carry the kind pin verbatim — a compaction that dropped it would
    # strip the mismatch guard from a sidecar that had it
    _meta = _read_sidecar_meta(sidecar_dir) or {}
    _write_sidecar_meta(tmp, out_buckets, fp_kind=_meta.get("fp_kind"))
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)
    os.rename(sidecar_dir, old_dir)
    os.rename(tmp, sidecar_dir)
    shutil.rmtree(old_dir)
    return {
        "files_before": files_before,
        "files_after": count_files(sidecar_dir),
        "n_fps": n_fps,
        "n_buckets": out_buckets,
    }


def _run_ingest_stream(
    spark: SparkSession,
    delta_dir: str,
    doc_schema: T.StructType,
    claims_dir: str,
    apply_fn,
    max_files_per_trigger: int,
    timeout: int,
    label: str,
) -> int:
    """The ONE copy of the corpus-ingest family's at-least-once
    micro-batch protocol (exact / near-dup / DSIR-gated verbs differ
    only in their ``apply_fn(batch, batch_id)``): skip batches already
    in the applied-id marker (cleaning their stale claim — the marker
    gates first, so the claim is inert); record-AFTER-apply via a
    same-dir atomic rename so a crash between the appends and the
    marker replays the batch into apply_fn's recovery path, never
    skips it; drive with trigger(availableNow). Returns batches
    applied this call."""
    import json as _json
    import os

    n_batches = 0
    ckpt = os.path.join(delta_dir, "_ckpt")
    applied_path = os.path.join(delta_dir, "_applied_batches.json")

    def _applied() -> set[int]:
        try:
            with open(applied_path) as f:
                return set(_json.load(f))
        except (OSError, ValueError):
            return set()

    def ingest(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        if batch.isEmpty():
            return
        claim = os.path.join(claims_dir, f"claim_{batch_id}")
        done = _applied()
        if batch_id in done:
            if os.path.exists(claim):
                os.remove(claim)
            return
        apply_fn(batch, batch_id)
        tmp = applied_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(sorted(done | {batch_id}), f)
        os.replace(tmp, applied_path)
        if os.path.exists(claim):
            os.remove(claim)
        n_batches += 1

    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(delta_dir)
    )

    def start():
        return (
            stream.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _drive_bounded_stream(spark, start, label, timeout, None)
    return n_batches


@holds_writer_lease("ingest:exact", force_arg="force_lease")
def stream_corpus_ingest(
    spark: SparkSession,
    delta_dir: str,
    corpus_dir: str,
    doc_schema: T.StructType,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 2,
    timeout: int = 120,
    n_buckets: int = 16,
    fp_kind: str = "text",
    force_lease: bool = False,
) -> int:
    """Continuous corpus ingestion with dedup-on-ingest: stream a
    directory of document delta files into a parquet corpus, appending
    only documents whose normalized-text fingerprint
    (operators/text.fingerprint_md5) is new — the daily-crawl verb that
    keeps a training corpus exactly-deduplicated WITHOUT re-running a
    full dedup pass per drop. The streaming form of dedup_exact_docs,
    exactly as stream_vector_ingest is the streaming form of ivf_upsert.

    ``fp_kind='payload_md5'`` is the round-10 MULTIMODAL member: point
    ``text_col`` at an opaque BINARY payload column (image/audio/video
    bytes) and the fingerprint becomes a raw md5 over the bytes —
    byte-level exact dedup-on-ingest for media corpora, needing no
    codec (the decode stubs' env-gates never apply). Everything else —
    sidecar, claims, replay, compaction — is the proven exact-family
    machinery; the sidecar meta pins the kind and a mismatched probe
    refuses (_check_fp_kind).

    Per batch (corpus_ingest_apply_batch): dedup within the batch
    (deterministic min-id keeper per fingerprint), bucket-pruned
    anti-join against the FINGERPRINT SIDECAR — a compact (fp, batch_id)
    parquet table at ``corpus_dir/_fingerprints`` partitioned by
    fingerprint prefix, maintained by the same per-batch appends and
    bootstrapped once from a single corpus scan — then append survivors
    to both. The "_"-prefixed sidecar is invisible to plain parquet
    reads of the corpus. Which physical copy of a duplicate survives
    depends on arrival order (batch splits are an execution detail), so
    the ingest CONTRACT — and the registered query's oracle — is
    fingerprint-set equality: the final corpus carries exactly the
    distinct fingerprints of corpus ∪ deltas, each once.

    Scale: steady-state probe I/O is sidecar bytes over the batch's
    buckets — independent of corpus width and free of re-hashing; the
    corpus parquet is read only at first-time bootstrap and when
    recovering a crashed batch (tests prove a steady-state probe
    succeeds with the corpus files unreadable). At-least-once idempotence
    uses the same applied-batch-id sidecar as stream_vector_ingest
    (record-after-apply) plus per-batch write-ahead claim markers that
    route replays into the reconciling recovery path.

    Returns the number of micro-batches applied this call."""
    import os

    sidecar_dir = os.path.join(corpus_dir, _FP_SIDECAR)
    claims_dir = os.path.join(corpus_dir, _FP_CLAIMS)
    _ensure_fp_sidecar(
        spark, corpus_dir, sidecar_dir, text_col, n_buckets,
        fp_kind=fp_kind,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        corpus_ingest_apply_batch(
            spark, batch, batch_id, corpus_dir,
            id_col=id_col, text_col=text_col, n_buckets=n_buckets,
            fp_kind=fp_kind,
        )

    return _run_ingest_stream(
        spark, delta_dir, doc_schema, claims_dir, apply,
        max_files_per_trigger, timeout, "corpus_ingest",
    )


# ---------------------------------------------------------------------------
# Streaming NEAR-duplicate corpus ingest: the fuzzy sibling of
# stream_corpus_ingest. Exact dedup-on-ingest misses the dominant
# real-crawl duplicate class (boilerplate variants, re-dated reposts), so
# this verb keeps a MINHASH SIDECAR next to the fingerprint idea: two
# compact frames under corpus_dir —
#   _mh_sigs : (fp, sig array<long>, batch_id, fpb)   partitioned by fp prefix
#   _mh_bands: (band, bh, fp, batch_id, bhb)          partitioned by bh % n
# and drops an arriving document iff it is an exact fingerprint match OR a
# band-collision candidate whose signature agreement >= min_agree (the
# standard two-stage LSH decision, computed ENTIRELY from the sidecar: the
# corpus text is never read in steady state, so probe I/O is sidecar bytes
# over the batch's buckets — corpus-width-independent, the same bound the
# exact sidecar proved). All signature arithmetic is the engine-reproducible
# operators/dedup.with_minhash_sig scheme, so a SQL oracle can recompute
# every drop decision exactly.
# ---------------------------------------------------------------------------
_MH_SIGS = "_mh_sigs"
_MH_BANDS = "_mh_bands"
_MH_CLAIMS = "_mh_claims"


def _read_mh_sigs(spark: SparkSession, d: str):
    return spark.read.schema(
        "fp string, sig array<bigint>, batch_id long, fpb long"
    ).parquet(d)


def _read_mh_bands(spark: SparkSession, d: str):
    return spark.read.schema(
        "band int, bh long, fp string, batch_id long, bhb long"
    ).parquet(d)


def _mh_encode(
    df: DataFrame, text_col: str, n_perms: int, n_bands: int
) -> DataFrame:
    """(__fp, __sig, __bands) columns appended — the shared encode of
    bootstrap and per-batch ingest (ONE definition so the probe always
    hashes exactly like the sidecar it probes)."""
    from custom_vector_database_spark.operators.dedup import (
        sig_band_structs,
        with_minhash_sig,
    )
    from custom_vector_database_spark.operators.text import fingerprint_md5

    out = with_minhash_sig(
        df.withColumn("__fp", fingerprint_md5(F.col(text_col))),
        text_col=text_col,
        out_col="__sig",
        n_perms=n_perms,
    )
    return out.withColumn(
        "__bands", sig_band_structs("__sig", n_perms, n_bands)
    )


def _mh_sig_rows(enc: DataFrame, batch_id: int, n_buckets: int) -> DataFrame:
    return enc.select(
        F.col("__fp").alias("fp"),
        F.col("__sig").alias("sig"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        _corpus_fp_bucket(F.col("__fp"), n_buckets).alias("fpb"),
    )


def _mh_band_rows(enc: DataFrame, batch_id: int, n_buckets: int) -> DataFrame:
    b = enc.select("__fp", F.explode("__bands").alias("b"))
    return b.select(
        F.col("b.band").alias("band"),
        F.col("b.bh").alias("bh"),
        F.col("__fp").alias("fp"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        (F.pmod(F.col("b.bh"), F.lit(n_buckets))).cast("long").alias("bhb"),
    )


@holds_writer_lease("bootstrap:neardup")
def _ensure_mh_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    text_col: str,
    n_perms: int,
    n_bands: int,
    n_buckets: int,
) -> None:
    """One-time bootstrap of BOTH minhash sidecar frames from a single
    corpus scan, tmp-then-rename per frame with the SIGS rename LAST as
    the commit point: a crash after the bands rename leaves sigs missing,
    and the next ensure rebuilds both (deleting the orphan bands dir), so
    a partial bootstrap can never serve probes. A sigs frame without a
    bands frame (crash between the two renames of a future compaction)
    rebuilds bands FROM the sigs frame — no corpus scan."""
    import os
    import shutil

    sigs_dir = os.path.join(corpus_dir, _MH_SIGS)
    bands_dir = os.path.join(corpus_dir, _MH_BANDS)
    _heal_two_frame_rebucket(
        corpus_dir, _MH_REBUCKET_MARKER, (sigs_dir, bands_dir)
    )
    for d in (sigs_dir, bands_dir):
        # a compaction crashed between a frame's two renames: _old IS
        # the complete pre-compaction frame — roll back, never re-derive
        if not os.path.isdir(d) and os.path.isdir(d + "_old"):
            os.rename(d + "_old", d)
    if os.path.isdir(sigs_dir) and os.path.isdir(bands_dir):
        # fail fast BEFORE any stream starts: a shape mismatch would
        # otherwise only surface inside the first micro-batch's probe
        _check_mh_shape(sigs_dir, n_perms, n_bands)
        return
    from custom_vector_database_spark.operators.dedup import sig_band_structs

    tmp_b = bands_dir + "_tmp"
    if os.path.isdir(sigs_dir):
        # bands missing only: re-derive from the signature frame — with
        # the caller's shape validated against the pinned one first, so
        # the rebuilt bands can never hash differently than the sigs
        n_buckets = _sidecar_n_buckets(sigs_dir, n_buckets)
        _check_mh_shape(sigs_dir, n_perms, n_bands)
        # carry each row's ORIGINAL batch_id so a concurrent crashed
        # batch's recovery still recognizes its own claimed rows
        sigs = _read_mh_sigs(spark, sigs_dir)
        rebuilt = sigs.select(
            F.explode(sig_band_structs("sig", n_perms, n_bands)).alias("b"),
            "fp",
            "batch_id",
        ).select(
            F.col("b.band").alias("band"),
            F.col("b.bh").alias("bh"),
            "fp",
            "batch_id",
            F.pmod(F.col("b.bh"), F.lit(n_buckets)).cast("long").alias("bhb"),
        )
        if os.path.isdir(tmp_b):
            shutil.rmtree(tmp_b)
        rebuilt.write.partitionBy("bhb").parquet(tmp_b)
        _write_sidecar_meta(tmp_b, n_buckets, n_perms, n_bands)
        if os.path.isdir(bands_dir):
            shutil.rmtree(bands_dir)
        os.rename(tmp_b, bands_dir)
        return
    if os.path.isdir(bands_dir):  # orphan: sigs is the commit marker
        shutil.rmtree(bands_dir)
    if _corpus_has_data(corpus_dir):
        # one doc per fingerprint: identical normalized text => identical
        # signature, so any representative carries the right sig
        corpus = spark.read.parquet(corpus_dir)
        enc = (
            _mh_encode(corpus, text_col, n_perms, n_bands)
            .select("__fp", "__sig", "__bands")
            .dropDuplicates(["__fp"])
        )
    else:
        enc = spark.createDataFrame(
            [],
            "__fp string, __sig array<bigint>, "
            "__bands array<struct<band:int,bh:bigint>>",
        )
    enc = enc.localCheckpoint(eager=False)  # two writers below share
    # it (lazy: the first write materializes, the second reads cache)
    tmp_s = sigs_dir + "_tmp"
    for t in (tmp_s, tmp_b):
        if os.path.isdir(t):
            shutil.rmtree(t)
    _mh_band_rows(enc, -1, n_buckets).write.partitionBy("bhb").parquet(tmp_b)
    _write_sidecar_meta(tmp_b, n_buckets, n_perms, n_bands)
    _mh_sig_rows(enc, -1, n_buckets).write.partitionBy("fpb").parquet(tmp_s)
    _write_sidecar_meta(tmp_s, n_buckets, n_perms, n_bands)
    os.rename(tmp_b, bands_dir)
    os.rename(tmp_s, sigs_dir)  # commit point


@holds_writer_lease("apply:neardup")
def corpus_neardup_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perms: int = 16,
    n_bands: int = 4,
    min_agree: int = 8,
    n_buckets: int = 16,
) -> int:
    """Apply ONE near-dup-on-ingest micro-batch against the minhash
    sidecar. A document is dropped iff (a) its fingerprint already exists
    (exact), or (b) some LSH band collides with a sidecar row AND the two
    signatures agree on >= ``min_agree`` of ``n_perms`` components (the
    estimator: matches/n_perms ≈ Jaccard, so min_agree=8/16 ≈ J>=0.5).
    Within a batch, the same decision runs pairwise with the smaller
    ``id_col`` surviving (dedup_keep_min's documented one-hop semantics:
    chains may keep an extra representative). Steady state reads ONLY the
    two bucket-pruned sidecar frames — never the corpus.

    Crash safety mirrors corpus_ingest_apply_batch: write-ahead claim ->
    sigs append -> bands append -> corpus append; a replayed batch probes
    with its own batch_id rows excluded (recomputing the identical
    survivor set), anti-joins its claimed rows per frame, and reconciles
    the corpus append against one corpus fingerprint scan — so recovery
    re-applies exactly the missing pieces. Returns docs appended."""
    import os

    from pyspark.sql import Window

    from custom_vector_database_spark.operators.dedup import sig_agreement

    sigs_dir = os.path.join(corpus_dir, _MH_SIGS)
    bands_dir = os.path.join(corpus_dir, _MH_BANDS)
    _heal_two_frame_rebucket(
        corpus_dir, _MH_REBUCKET_MARKER, (sigs_dir, bands_dir)
    )
    claims_dir = os.path.join(corpus_dir, _MH_CLAIMS)
    claim = os.path.join(claims_dir, f"claim_{batch_id}")
    recovering = os.path.exists(claim)
    n_buckets = _sidecar_n_buckets(sigs_dir, n_buckets)
    _check_mh_shape(sigs_dir, n_perms, n_bands)

    w = Window.partitionBy("__fp").orderBy(id_col)
    enc = (
        _mh_encode(batch, text_col, n_perms, n_bands)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
        .localCheckpoint(eager=False)  # fp+sig+bands computed once; the
        # exact probe, candidate join, verify join, intra-batch pass, and
        # both sidecar appends all reuse it (lazy: the guard agg right
        # below materializes it — one job instead of two)
    )
    sig_side = _read_mh_sigs(spark, sigs_dir)
    band_side = _read_mh_bands(spark, bands_dir)
    if recovering:
        sig_side = sig_side.filter(F.col("batch_id") != batch_id)
        band_side = band_side.filter(F.col("batch_id") != batch_id)

    # (a) exact: bucket-pruned fingerprint anti-join (<= n_buckets
    # values). ONE bounded agg answers the NULL-text guard
    # (_refuse_null_text's contract — enc keeps the raw columns, so the
    # check reads the same data) AND the fingerprint-bucket set;
    # previously the guard and the bucket collect were two jobs.
    pre = enc.agg(
        F.sum(F.col(text_col).isNull().cast("long")).alias("n_null"),
        F.collect_set(
            _corpus_fp_bucket(F.col("__fp"), n_buckets)
        ).alias("fpbs"),
    ).first()
    if pre["n_null"]:
        raise ValueError(
            f"NULL {text_col!r} in ingest batch: a NULL fingerprint can "
            "neither dedup nor reconcile on crash replay (NULL never "
            "equi-joins) — filter or impute upstream before streaming "
            "into the corpus"
        )
    fpbs = list(pre["fpbs"])
    exact_fps = sig_side.filter(F.col("fpb").isin(fpbs)).select(
        F.col("fp").alias("__fp")
    )
    s1 = enc.join(exact_fps, "__fp", "left_anti")

    # (b) near vs corpus: band candidates from the bucket-pruned bands
    # frame, verified by signature agreement from the bucket-pruned sigs
    # frame — both prunes are bounded collects (<= n_buckets values each)
    bb = s1.select("__fp", "__sig", F.explode("__bands").alias("b")).select(
        "__fp",
        "__sig",
        F.col("b.band").alias("band"),
        F.col("b.bh").alias("bh"),
    )
    bhbs = [
        r["bhb"]
        for r in bb.select(
            F.pmod(F.col("bh"), F.lit(n_buckets)).alias("bhb")
        )
        .distinct()
        .collect()
    ]
    cand = (
        bb.join(
            band_side.filter(F.col("bhb").isin(bhbs)).select(
                "band", "bh", F.col("fp").alias("__cfp")
            ),
            ["band", "bh"],
        )
        .select("__fp", "__sig", "__cfp")
        .distinct()
        .localCheckpoint(eager=False)  # bounded: batch docs x their
        # collisions (lazy: the bucket collect below materializes it)
    )
    cfpbs = [
        r["fpb"]
        for r in cand.select(
            _corpus_fp_bucket(F.col("__cfp"), n_buckets).alias("fpb")
        )
        .distinct()
        .collect()
    ]
    near_fps = (
        cand.join(
            sig_side.filter(F.col("fpb").isin(cfpbs)).select(
                F.col("fp").alias("__cfp"), F.col("sig").alias("__csig")
            ),
            "__cfp",
        )
        .filter(sig_agreement("__sig", "__csig") >= min_agree)
        .select("__fp")
        .distinct()
    )
    s2 = s1.join(near_fps, "__fp", "left_anti")

    # (c) near within the batch: keep-min-id over verified band collisions
    # the inner join on s2's (unique) fps both restricts bb to the
    # corpus-survivors and attaches the keep-min id — no separate semi
    bb2 = bb.join(s2.select("__fp", F.col(id_col).alias("__id")), "__fp")
    intra_victims = (
        bb2.alias("x")
        .join(
            bb2.select(
                F.col("band"),
                F.col("bh"),
                F.col("__fp").alias("__vfp"),
                F.col("__sig").alias("__vsig"),
                F.col("__id").alias("__vid"),
            ).alias("y"),
            ["band", "bh"],
        )
        .filter(F.col("x.__id") < F.col("__vid"))
        .select(F.col("x.__sig").alias("__ksig"), "__vfp", "__vsig")
        .distinct()
        .filter(sig_agreement("__ksig", "__vsig") >= min_agree)
        .select(F.col("__vfp").alias("__fp"))
        .distinct()
    )
    survivors = s2.join(intra_victims, "__fp", "left_anti")
    if recovering:
        from custom_vector_database_spark.operators.text import fingerprint_md5

        if _corpus_has_data(corpus_dir):
            # the minhash family is text-keyed only (fp_kind is the
            # EXACT family's dispatch) — this is fingerprint_md5, not
            # _fp_expr (r10 review finding: a stray _fp_expr here
            # NameError'd every near-dup crash replay)
            corpus_fps = (
                spark.read.parquet(corpus_dir)
                .select(fingerprint_md5(F.col(text_col)).alias("__fp"))
                .distinct()
            )
        else:
            corpus_fps = spark.createDataFrame([], "__fp string")
        survivors = survivors.join(corpus_fps, "__fp", "left_anti")
    # materialize BEFORE the appends (the lazy plan reads the very
    # frames the appends below grow): the shared barrier persists every
    # partition in the count's job — one job, ordering enforced in code
    survivors, n_new = _materialized_barrier(survivors)
    if n_new:
        # write-ahead: the DURABLE claim lands before any append
        _durable_claim(claims_dir, claim)
        new_sigs = _mh_sig_rows(survivors, batch_id, n_buckets)
        new_bands = _mh_band_rows(survivors, batch_id, n_buckets)
        if recovering:
            claimed_s = _read_mh_sigs(spark, sigs_dir).filter(
                F.col("batch_id") == batch_id
            ).select("fp")
            new_sigs = new_sigs.join(claimed_s, "fp", "left_anti")
            claimed_b = _read_mh_bands(spark, bands_dir).filter(
                F.col("batch_id") == batch_id
            ).select("band", "fp")
            new_bands = new_bands.join(claimed_b, ["band", "fp"], "left_anti")
        new_sigs.write.mode("append").partitionBy("fpb").parquet(sigs_dir)
        new_bands.write.mode("append").partitionBy("bhb").parquet(bands_dir)
        survivors.drop("__fp", "__sig", "__bands").write.mode("append").parquet(
            corpus_dir
        )
    return n_new


@holds_writer_lease("ingest:neardup", force_arg="force_lease")
def stream_corpus_neardup_ingest(
    spark: SparkSession,
    delta_dir: str,
    corpus_dir: str,
    doc_schema: T.StructType,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 2,
    timeout: int = 120,
    n_perms: int = 16,
    n_bands: int = 4,
    min_agree: int = 8,
    n_buckets: int = 16,
    force_lease: bool = False,
) -> int:
    """Continuous corpus ingestion with NEAR-dup-on-ingest (see
    corpus_neardup_apply_batch for the decision rule and crash story) —
    the streaming form of minhash dedup, exactly as stream_corpus_ingest
    is the streaming form of dedup_exact_docs. Returns micro-batches
    applied this call. Same at-least-once idempotence machinery as
    stream_corpus_ingest (applied-batch marker + write-ahead claims)."""
    import os

    claims_dir = os.path.join(corpus_dir, _MH_CLAIMS)
    _ensure_mh_sidecar(spark, corpus_dir, text_col, n_perms, n_bands, n_buckets)

    def apply(batch: DataFrame, batch_id: int) -> None:
        corpus_neardup_apply_batch(
            spark, batch, batch_id, corpus_dir,
            id_col=id_col, text_col=text_col, n_perms=n_perms,
            n_bands=n_bands, min_agree=min_agree, n_buckets=n_buckets,
        )

    return _run_ingest_stream(
        spark, delta_dir, doc_schema, claims_dir, apply,
        max_files_per_trigger, timeout, "corpus_neardup_ingest",
    )


_MH_REBUCKET_MARKER = "_mh_rebucket_commit"
_SB_REBUCKET_MARKER = "_sb_rebucket_commit"


def _heal_two_frame_rebucket(
    corpus_dir: str, marker_name: str, frame_dirs
) -> None:
    """Complete a crashed two-frame REBUCKET whose commit marker exists:
    install each frame's complete ``_tmp`` (written under the new
    modulus, meta included) via the _old rename dance, then remove the
    marker. Idempotent from any mid-swap crash point (the MaxSimIndex
    _complete_save_swap pattern). Without the marker a crashed rebucket
    left nothing renamed — its partial tmps are inert and the next
    compact deletes them. The marker exists because the two frames must
    change modulus ATOMICALLY: a probe reads the bucket modulus from the
    sigs/vecs meta and prunes the BANDS frame with it, so frames on
    different moduli would silently miss collisions."""
    import os
    import shutil

    marker = os.path.join(corpus_dir, marker_name)
    if not os.path.exists(marker):
        return
    for d in frame_dirs:
        tmp, old = d + "_tmp", d + "_old"
        if os.path.isdir(tmp):
            if os.path.isdir(d):
                if os.path.isdir(old):
                    shutil.rmtree(old)
                os.rename(d, old)
            os.rename(tmp, d)
        shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)


@holds_writer_lease("compact:neardup", force_arg="force_lease")
def compact_mh_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    n_buckets: int = 16,
    new_n_buckets: int | None = None,
    force_lease: bool = False,
) -> dict:
    """Compact BOTH minhash sidecar frames (compact_fp_sidecar's story on
    the near-dup probe tables): per-batch appends leave one small file
    per touched bucket per micro-batch in each frame, and this rewrites
    every bucket to one file via the per-frame tmp-then-rename swap
    (batch_id collapsed to -1). Frames compact one at a time and each
    swap is individually crash-safe — before a frame's first rename its
    original is untouched; between its two renames the _old dir holds it
    intact and _ensure_mh_sidecar (or the next compact) rolls it back.
    Refuses while any ingest claim is outstanding, for the same reason
    the fp version does: recovery reads its own batch_id rows.

    ``new_n_buckets`` REBUCKETS during the rewrite (the maintenance verb
    for a corpus that outgrew its bootstrap bucket count): both frames'
    bucket columns are recomputed under the new modulus and their meta
    pins update with it. Unlike the same-modulus path, the two swaps
    must be atomic TOGETHER — probes read the modulus from the sigs
    meta and prune the bands frame with it — so the rebucket writes
    both tmps first, then a commit marker, then swaps; a crash anywhere
    either leaves the old modulus fully intact (pre-marker) or rolls
    forward at the next compact/ensure/probe (_heal_two_frame_rebucket).
    The (fp, sig, band) row SET is untouched, so every probe decision
    is identical before and after. The minhash SHAPE (n_perms/n_bands)
    never changes here — signatures would have to be refit.

    Returns {"files_before", "files_after", "n_sigs", "n_band_rows",
    "n_buckets"}."""
    counts, meta = _compact_two_frame_sidecar(
        spark,
        corpus_dir,
        _MH_REBUCKET_MARKER,
        _MH_CLAIMS,
        "stream_corpus_neardup_ingest",
        (
            (_MH_SIGS, _read_mh_sigs, "fpb",
             lambda out: _corpus_fp_bucket(F.col("fp"), out)),
            (_MH_BANDS, _read_mh_bands, "bhb",
             lambda out: F.pmod(F.col("bh"), F.lit(out)).cast("long")),
        ),
        n_buckets,
        new_n_buckets,
    )
    return {
        "files_before": meta["files_before"],
        "files_after": meta["files_after"],
        "n_sigs": counts[_MH_SIGS],
        "n_band_rows": counts[_MH_BANDS],
        "n_buckets": meta["n_buckets"],
    }


def _compact_two_frame_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    marker_name: str,
    claims_name: str,
    resolve_verb: str,
    frames,
    n_buckets: int,
    new_n_buckets: int | None,
):
    """The ONE copy of the two-frame sidecar compact/rebucket
    choreography (minhash and sign-band verbs differ only in frame
    names, readers, and bucket expressions — the crash-critical swap
    ordering must not exist in drifting copies, the _run_ingest_stream
    rationale): heal a crashed rebucket, roll back per-frame _old dirs,
    refuse outstanding claims, resolve the pinned modulus, rewrite each
    frame (batch_id collapsed to -1, bucket column RECOMPUTED under the
    output modulus, all pinned meta keys carried verbatim), and swap —
    per-frame tmp-then-rename when the modulus is unchanged, the
    both-tmps-then-commit-marker protocol when rebucketing (frames must
    change modulus atomically: probes read it from the first frame's
    meta and prune the second frame with it).

    ``frames``: ((name, reader, part_col, bucket_expr_fn), ...) with
    the FIRST frame's meta authoritative. Returns (counts-by-name,
    {"files_before", "files_after", "n_buckets"})."""
    import glob
    import os
    import shutil

    frame_dirs = [os.path.join(corpus_dir, name) for name, *_ in frames]
    claims_dir = os.path.join(corpus_dir, claims_name)
    _heal_two_frame_rebucket(corpus_dir, marker_name, frame_dirs)
    for d in frame_dirs:
        if not os.path.isdir(d) and os.path.isdir(d + "_old"):
            os.rename(d + "_old", d)
    outstanding = glob.glob(os.path.join(claims_dir, "claim_*"))
    if outstanding:
        raise ValueError(
            f"{len(outstanding)} unresolved ingest claim(s) "
            f"({sorted(os.path.basename(c) for c in outstanding)[:3]}…): "
            f"re-drive {resolve_verb} to resolve them before "
            "compacting (compaction erases the per-batch claim rows "
            "recovery reconciles against)"
        )
    n_buckets = _sidecar_n_buckets(frame_dirs[0], n_buckets)
    if new_n_buckets is not None and int(new_n_buckets) <= 0:
        raise ValueError(
            f"new_n_buckets must be positive, got {new_n_buckets!r}"
        )
    out_buckets = (
        int(new_n_buckets) if new_n_buckets is not None else n_buckets
    )
    # carry every pinned shape key through compaction verbatim — a
    # compaction that dropped one would strip the mismatch guard from a
    # sidecar that had it
    _meta = _read_sidecar_meta(frame_dirs[0]) or {}
    count_files = lambda d: sum(  # noqa: E731
        1 for dp, _dn, fs in os.walk(d) for f in fs if f.endswith(".parquet")
    )
    files_before = sum(count_files(d) for d in frame_dirs)
    counts = {}
    rebucketing = out_buckets != n_buckets
    for (name, reader, part_col, bucket_expr_fn), d in zip(
        frames, frame_dirs
    ):
        rows = (
            reader(spark, d)
            .withColumn("batch_id", F.lit(-1).cast("long"))
            .withColumn(part_col, bucket_expr_fn(out_buckets))
            # ^ recomputed, not copied: identical under the pinned
            # modulus, the rebucket itself under a new one
        )
        counts[name] = rows.count()
        tmp = d + "_tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        (
            rows.repartition(out_buckets, part_col)  # one writer per bucket
            .write.partitionBy(part_col)
            .parquet(tmp)
        )
        _write_sidecar_meta(
            tmp, out_buckets, _meta.get("n_perms"), _meta.get("n_bands"),
            _meta.get("band_bits"), _meta.get("model_id"),
        )
        if rebucketing:
            continue  # both tmps land before ANY rename — see below
        old = d + "_old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)
    if rebucketing:
        with open(os.path.join(corpus_dir, marker_name), "w"):
            pass  # commit point: both tmps complete with the new modulus
        _heal_two_frame_rebucket(corpus_dir, marker_name, frame_dirs)
        # ^ executes the swap
    return counts, {
        "files_before": files_before,
        "files_after": sum(count_files(d) for d in frame_dirs),
        "n_buckets": out_buckets,
    }


# ---------------------------------------------------------------------------
# Streaming DSIR quality gate: fit the hashed-n-gram log-ratio table ONCE
# (against a target corpus and a pool sample), persist it, and gate every
# arriving micro-batch with one codegen scoring pass — keep only documents
# whose importance log-weight clears a threshold, then hand the keepers to
# the exact dedup-on-ingest path. The fit-once / score-many split is the
# whole point: steady-state ingest never touches the target corpus, only
# the persisted num_buckets-row table (broadcast per batch).
# ---------------------------------------------------------------------------
_DSIR_GATE_META = "_gate_meta.json"


def _persist_gate(lr: DataFrame, gate_dir: str, meta: dict) -> None:
    """Persist a (bucket, lr_micro) gate table + meta crash-safely: the
    sidecar _old dance — a crash between the two renames leaves _old
    holding the complete previous gate, which load rolls back; at no
    instant is there NO gate. ONE copy shared by the DSIR fit and the
    learned-classifier fit."""
    import json
    import os
    import shutil

    tmp = gate_dir + "_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    lr.coalesce(1).write.parquet(tmp)
    with open(os.path.join(tmp, _DSIR_GATE_META), "w") as f:
        json.dump(meta, f)
    old = gate_dir + "_old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(gate_dir):
        os.rename(gate_dir, old)
    os.rename(tmp, gate_dir)
    shutil.rmtree(old, ignore_errors=True)


def fit_dsir_gate(
    pool: DataFrame,
    target: DataFrame,
    gate_dir: str,
    text_col: str = "text",
    num_buckets: int = 64,
) -> None:
    """Fit and persist the DSIR log-ratio table. The meta file pins
    num_buckets so a scorer can never hash with a different modulus
    than the table was fit with. Refit over an existing gate is
    crash-safe via _persist_gate's _old dance."""
    from custom_vector_database_spark.operators.curation import (
        dsir_bucket_logratios,
    )

    lr = dsir_bucket_logratios(
        pool, target, text_col=text_col, num_buckets=num_buckets
    )
    _persist_gate(
        lr, gate_dir,
        {"num_buckets": int(num_buckets), "kind": "dsir",
         "intercept_micro": 0},
    )


def fit_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    gate_dir: str,
    text_col: str = "text",
    num_buckets: int = 64,
    method: str = "lcr",
    fit_sample: int = 50_000,
    seed: int = 42,
    iters: int = 800,
    step: float = 0.01,
    l2: float = 1e-3,
) -> None:
    """Fit and persist a LEARNED linear quality classifier over hashed
    unigram+bigram bucket features (the fastText-style gate of Joulin et
    al. 2016 — the supervised sibling of the DSIR importance gate, fit
    on LABELED good/bad corpora instead of target/pool distributions).
    Scoring is the same one-codegen-pass dot product against the
    broadcast (bucket, lr_micro) table, plus the persisted intercept;
    the persisted gate slots into stream_corpus_dsir_ingest's dispatch
    unchanged (the gate directory self-describes via its meta "kind").

    ``method="lcr"`` (default): log-count-ratio weights — Wang &
    Manning 2012's NB-SVM feature weights, the closed form of the
    linear classifier. Exactly dsir_bucket_logratios with the roles
    bound to (pool=neg, target=pos); fully deterministic and
    SQL-reproducible, so a registered row's oracle can recompute every
    weight and score (intercept 0 — the decision threshold absorbs the
    class prior).

    ``method="logistic"``: discriminative logistic regression by
    deterministic full-batch gradient descent over a bounded,
    md5-rank-sampled doc set, driver-side numpy (the kmeans_fit_np /
    collect_sample_matrix convention — fits are sample-bounded
    driver-side, encodes stay distributed; an MLlib LBFGS fit would
    need a per-row vector-assembly UDF and is run-order-sensitive).
    The fit runs on RAW tf counts — exactly the Σ tf·w + intercept
    feature the deployed scorer thresholds, so gate decisions implement
    the trained classifier verbatim. Weights and intercept persist as
    micro-integers; scoring stays the identical codegen path."""
    if method not in ("lcr", "logistic"):
        raise ValueError(f"method must be 'lcr' or 'logistic', got {method!r}")
    from custom_vector_database_spark.operators.curation import (
        dsir_bucket_logratios,
    )

    if method == "lcr":
        lr = dsir_bucket_logratios(
            neg, pos, text_col=text_col, num_buckets=num_buckets
        )
        _persist_gate(
            lr, gate_dir,
            {"num_buckets": int(num_buckets), "kind": "classifier_lcr",
             "intercept_micro": 0},
        )
        return

    import numpy as np

    from custom_vector_database_spark.operators.fitting import logreg_fit_np

    spark = pos.sparkSession
    X_pos = _collect_tf_matrix(pos, text_col, num_buckets, fit_sample, seed)
    X_neg = _collect_tf_matrix(neg, text_col, num_buckets, fit_sample, seed)
    X = np.vstack([X_pos, X_neg])
    y = np.concatenate(
        [np.ones(len(X_pos)), np.zeros(len(X_neg))]
    )
    w, b = logreg_fit_np(X, y, iters=iters, step=step, l2=l2)
    rows = [(int(i), int(np.floor(w[i] * 1e6))) for i in range(num_buckets)]
    lr = spark.createDataFrame(rows, "bucket int, lr_micro long")
    _persist_gate(
        lr, gate_dir,
        {"num_buckets": int(num_buckets), "kind": "classifier_logistic",
         "intercept_micro": int(np.floor(b * 1e6))},
    )


def _collect_tf_matrix(
    docs: DataFrame, text_col: str, num_buckets: int, fit_sample: int,
    seed: int,
):
    """Dense (n_docs x num_buckets) hashed-gram tf matrix of a BOUNDED
    deterministic sample: docs ranked by md5(seed‖row md5) — the repo's
    derandomized-draw convention — top fit_sample taken, tf aggregated
    distributed, only the (doc, bucket, tf) triples collected (≤ sample
    × num_buckets rows). Feature hashing is _dsir_gram_stream, so the
    fit sees exactly what the scorer hashes."""
    import numpy as np

    from pyspark.sql import Window

    from custom_vector_database_spark.operators.curation import (
        _dsir_gram_stream,
    )

    # distributed top-k by md5 rank (TakeOrderedAndProject — no global
    # sort, no corpus-wide window); the row_number index only runs over
    # the <= fit_sample SAMPLE
    sampled = (
        docs.select(F.col(text_col))
        .withColumn("__rk", F.md5(F.concat(F.lit(str(seed)), F.col(text_col))))
        .orderBy("__rk", text_col)
        .limit(fit_sample)
    )
    ranked = (
        sampled.withColumn(
            "__doc", F.row_number().over(Window.orderBy("__rk", text_col))
        )
        .select("__doc", F.col(text_col))
        .localCheckpoint(eager=False)  # the tf collect AND the row
        # count below share one materialization (the first full-scan
        # consumer persists it) — without it each pays the full corpus
        # top-k scan again
    )
    tf = (
        _dsir_gram_stream(ranked, ["__doc"], text_col, num_buckets)
        .groupBy("__doc", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    )
    n = int(ranked.count())
    X = np.zeros((n, num_buckets), dtype=np.float64)
    for r in tf:
        X[r["__doc"] - 1, r["bucket"]] = float(r["tf"])
    # RAW tf, deliberately un-normalized: the deployed gate thresholds
    # Σ tf·w + intercept (dsir_score_with's sum), so the fit must see
    # the exact feature the scorer computes — a length-normalized fit
    # here would train a different classifier than the one deployed
    # (review finding r9: decisions would skew with document length).
    # The smaller default step in fit_quality_classifier compensates
    # for the larger raw-count gradients.
    return X


def load_dsir_gate(spark: SparkSession, gate_dir: str):
    """(lr DataFrame, num_buckets) from a persisted gate — the original
    two-field form; load_quality_gate returns the full self-describing
    tuple. A missing or unparseable meta raises — scoring with a
    guessed modulus would silently mis-bucket every gram (the
    _sidecar_n_buckets rationale)."""
    lr, nb, _intercept, _kind = load_quality_gate(spark, gate_dir)
    return lr, nb


def load_quality_gate(spark: SparkSession, gate_dir: str):
    """(lr DataFrame, num_buckets, intercept_micro, kind) from a
    persisted gate directory — DSIR or learned-classifier, the meta
    self-describes (gates persisted before the classifier existed read
    as kind='dsir', intercept 0). Heals a crashed refit first."""
    import json
    import os

    old = gate_dir + "_old"
    if not os.path.isdir(gate_dir) and os.path.isdir(old):
        # a refit crashed between its two renames: _old IS the complete
        # previous gate — roll it back rather than halting ingestion
        os.rename(old, gate_dir)
    meta_path = os.path.join(gate_dir, _DSIR_GATE_META)
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        nb = int(meta["num_buckets"])
    except (OSError, ValueError, KeyError, TypeError) as e:
        raise ValueError(
            f"missing/corrupt quality gate meta {meta_path!r} ({e!r}) — "
            "refit the gate (fit_dsir_gate / fit_quality_classifier) "
            "rather than guessing the bucket modulus"
        ) from e
    lr = spark.read.schema("bucket int, lr_micro long").parquet(gate_dir)
    return (
        lr, nb, int(meta.get("intercept_micro", 0)),
        str(meta.get("kind", "dsir")),
    )


@holds_writer_lease("ingest:gated", force_arg="force_lease")
def stream_corpus_dsir_ingest(
    spark: SparkSession,
    delta_dir: str,
    corpus_dir: str,
    gate_dir: str,
    doc_schema: T.StructType,
    min_logw_micro: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 2,
    timeout: int = 120,
    n_buckets: int = 16,
    dedup: str = "exact",
    n_perms: int = 16,
    n_bands: int = 4,
    min_agree: int = 8,
    vec_col: str = "embedding",
    band_bits: int = 16,
    max_cos_dist: float = 0.1,
    model_id: str | None = None,
    force_lease: bool = False,
) -> int:
    """Continuous QUALITY-GATED corpus ingestion: per micro-batch, score
    every document against the persisted DSIR log-ratio table
    (operators/curation.dsir_score_with — one codegen pass + a broadcast
    of the tiny table) and keep only docs with
    logw_micro >= ``min_logw_micro``; the keepers then run the
    dedup-on-ingest path — ``dedup="exact"`` (fingerprint sidecar,
    corpus_ingest_apply_batch), ``dedup="neardup"`` (minhash sidecars,
    corpus_neardup_apply_batch: importance gate + fuzzy dedup in one
    stream; ``n_perms``/``n_bands``/``min_agree`` parameterize it
    exactly as on stream_corpus_neardup_ingest), or ``dedup="semdedup"``
    (sign-band sidecars, corpus_semdedup_apply_batch: the gate scores
    the TEXT, the dedup keys on the EMBEDDING — the multimodal
    production stack for docs carrying both; ``n_bands``/``band_bits``/
    ``max_cos_dist`` parameterize it as on
    stream_corpus_semdedup_ingest). A shape mismatching an existing
    sidecar's pinned meta refuses rather than mis-probing. Replay
    idempotence and crash
    recovery are EXACTLY the chosen dedup verb's proven story — the
    gate is a pure per-batch filter with no state of its own, so a
    replayed batch gates identically. Returns micro-batches applied."""
    import os

    if dedup not in ("exact", "neardup", "semdedup"):
        raise ValueError(
            f"dedup must be 'exact', 'neardup', or 'semdedup', got {dedup!r}"
        )
    # the gate directory self-describes: a DSIR fit or a learned
    # classifier (fit_quality_classifier) slot in identically — scoring
    # is the same codegen dot product, plus the persisted intercept
    lr, gate_buckets, intercept_micro, _kind = load_quality_gate(
        spark, gate_dir
    )
    if dedup == "exact":
        claims_dir = os.path.join(corpus_dir, _FP_CLAIMS)
        sidecar_dir = os.path.join(corpus_dir, _FP_SIDECAR)
        _ensure_fp_sidecar(spark, corpus_dir, sidecar_dir, text_col, n_buckets)
    elif dedup == "neardup":
        claims_dir = os.path.join(corpus_dir, _MH_CLAIMS)
        _ensure_mh_sidecar(
            spark, corpus_dir, text_col, n_perms, n_bands, n_buckets
        )
    else:
        claims_dir = os.path.join(corpus_dir, _SB_CLAIMS)
        _ensure_sb_sidecar(
            spark, corpus_dir, id_col, vec_col, n_bands, band_bits, n_buckets,
            model_id=model_id,
        )

    def apply(batch: DataFrame, batch_id: int) -> None:
        from custom_vector_database_spark.operators.curation import (
            dsir_score_with,
        )

        # refuse NULL text — and, on the semantic path, undecidable
        # vectors/duplicate ids — on the RAW batch: a bad doc whose text
        # happens to score under the threshold would otherwise be
        # silently gate-dropped before the dedup verb's own refusal ever
        # sees it, making the family's fail-fast contract
        # threshold-dependent
        _refuse_null_text(batch, text_col)
        if dedup == "semdedup":
            _refuse_bad_vectors(
                batch, id_col, vec_col, n_bands * band_bits
            )
        scores = dsir_score_with(
            lr, batch, id_col=id_col, text_col=text_col,
            num_buckets=gate_buckets,
        )
        kept = batch.join(
            scores.filter(
                F.col("logw_micro") + F.lit(intercept_micro)
                >= min_logw_micro
            ).select(
                id_col
            ),
            id_col,
            "left_semi",
        ).localCheckpoint(eager=False)
        # ^ checkpoint: apply_batch evaluates its batch several times
        # (guard agg, survivors checkpoint) — without the barrier each
        # evaluation re-runs the full gate scoring; lazy, the first
        # evaluation materializes it
        if dedup == "exact":
            corpus_ingest_apply_batch(
                spark, kept, batch_id, corpus_dir,
                id_col=id_col, text_col=text_col, n_buckets=n_buckets,
            )
        elif dedup == "neardup":
            corpus_neardup_apply_batch(
                spark, kept, batch_id, corpus_dir,
                id_col=id_col, text_col=text_col, n_perms=n_perms,
                n_bands=n_bands, min_agree=min_agree, n_buckets=n_buckets,
            )
        else:
            corpus_semdedup_apply_batch(
                spark, kept, batch_id, corpus_dir,
                id_col=id_col, vec_col=vec_col, n_bands=n_bands,
                band_bits=band_bits, max_cos_dist=max_cos_dist,
                n_buckets=n_buckets, model_id=model_id,
            )

    return _run_ingest_stream(
        spark, delta_dir, doc_schema, claims_dir, apply,
        max_files_per_trigger, timeout, "corpus_dsir_ingest",
    )


# ---------------------------------------------------------------------------
# Streaming SEMANTIC (embedding) dedup-on-ingest: the fourth corpus-ingest
# family member (exact fingerprints / minhash near-dup / DSIR gate /
# SEMANTIC), for embedding-first pipelines whose duplicate key is the
# VECTOR, not the text — reformatted or translated duplicates that share
# no shingles but sit at near-zero cosine distance. The sidecar is the
# streaming form of operators/dedup.sign_band_neardup_pairs' band-then-
# verify contract (Charikar 2002 sign bits, identity projection — fully
# engine-reproducible, so a SQL oracle recomputes every drop):
#   _sb_vecs : (id, vec, batch_id, idb)            partitioned by id mod n
#   _sb_bands: (band, key, id, batch_id, bb)       partitioned by key mod n
# An arriving document drops iff some sign band's key collides with a
# sidecar row AND the exact cosine distance to that candidate (recomputed
# on the float vectors of the CANDIDATES only, round-6 — the
# sign_band_neardup_pairs arithmetic verbatim) is <= max_cos_dist.
# Steady state reads ONLY bucket-pruned sidecar bytes over the batch's
# band-key and candidate-id buckets — corpus-width-independent, the same
# bound the exact and minhash sidecars prove. Identical vectors collide
# on every band at distance 0, so exact duplicates need no separate path.
# Reference anchor: this replaces the add -> full-rebuild cost model of
# the reference engine (vectordb.cpp:82-118) — a batch re-dedup per crawl
# drop is exactly that rebuild.
# ---------------------------------------------------------------------------
_SB_VECS = "_sb_vecs"
_SB_BANDS = "_sb_bands"
_SB_CLAIMS = "_sb_claims"


def _read_sb_vecs(spark: SparkSession, d: str):
    return spark.read.schema(
        "id long, vec array<float>, batch_id long, idb long"
    ).parquet(d)


def _read_sb_bands(spark: SparkSession, d: str):
    return spark.read.schema(
        "band int, key long, id long, batch_id long, bb long"
    ).parquet(d)


def _sb_cos_dist(va, vb):
    """The band-then-verify exact cosine — ONE definition shared with
    the batch twin (operators/dedup.sign_band_cos_dist), so stream
    drops, batch pairs, and the DuckDB oracle can never diverge."""
    from custom_vector_database_spark.operators.dedup import (
        sign_band_cos_dist,
    )

    return sign_band_cos_dist(va, vb)


def _sb_vec_rows(
    enc: DataFrame, id_col: str, vec_col: str, batch_id: int, n_buckets: int
) -> DataFrame:
    return enc.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        F.lit(batch_id).cast("long").alias("batch_id"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets)).alias("idb"),
    )


def _sb_band_rows(
    enc: DataFrame, id_col: str, batch_id: int, n_buckets: int
) -> DataFrame:
    return enc.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode("__keys").alias("band", "key"),
    ).select(
        "band",
        "key",
        "id",
        F.lit(batch_id).cast("long").alias("batch_id"),
        F.pmod(F.col("key"), F.lit(n_buckets)).cast("long").alias("bb"),
    )


def _sb_undecidable(vec, dim: int):
    """The semantic-dedup undecidability predicate — ONE definition
    shared by the batch refusal and the bootstrap exclusion: NULL,
    wrong-dim, any-NULL-component, or zero-norm vectors all band
    (sign bit 0 everywhere it matters) but can never VERIFY (their
    cosine is NULL), so they would bypass the probe forever."""
    return (
        vec.isNull()
        | (F.size(vec) != dim)
        | F.exists(vec, lambda x: x.isNull())
        | (
            F.aggregate(
                vec,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
            == 0.0
        )
    )


def _check_sb_args(n_bands: int, band_bits: int) -> None:
    """The batch twin's (sign_band_neardup_pairs) argument contract on
    the streaming family: band_bits >= 63 silently overflows the int64
    key fold (acc*2+v wraps under non-ANSI Spark, producing keys no SQL
    oracle reproduces), so refuse it at the front door everywhere."""
    if band_bits >= 63 or n_bands <= 0 or band_bits <= 0:
        raise ValueError("need 0 < band_bits < 63 and n_bands > 0")


def _refuse_bad_vectors(
    batch: DataFrame, id_col: str, vec_col: str, dim: int
) -> None:
    """Fail fast on an ingest batch the semantic probe cannot decide:
    a NULL, wrong-dim, NULL-COMPONENT, or ZERO-NORM vector cannot dedup
    (NULL components and zero norms still band — NULL > 0 and 0 > 0 are
    false, sign bit 0 — but their cosine against anything is NULL, never
    'near', so the row AND every later copy of it would bypass the
    probe forever), and duplicate ids make the sidecar's id->vector
    mapping ambiguous (ids are the corpus key the crash-replay
    reconcile anti-joins on). One aggregate job checks all five."""
    vec = F.col(vec_col)
    s = batch.agg(
        F.sum(_sb_undecidable(vec, dim).cast("long")).alias("bad"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    if s["bad"]:
        raise ValueError(
            f"{s['bad']} document(s) with NULL, wrong-dimension, "
            f"NULL-component, or zero-norm {vec_col!r} (need exactly "
            f"{dim} = n_bands x band_bits non-NULL components, not all "
            "zero): an undecidable vector bypasses every semantic dedup "
            "probe — filter or impute upstream"
        )
    if s["nd"] != s["n"]:
        raise ValueError(
            f"{s['n'] - s['nd']} duplicate {id_col!r} value(s) in the "
            "ingest batch: ids key the sidecar's vector frame and the "
            "crash-replay reconcile — deduplicate ids upstream"
        )


@holds_writer_lease("bootstrap:semdedup")
def _ensure_sb_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    id_col: str,
    vec_col: str,
    n_bands: int,
    band_bits: int,
    n_buckets: int,
    model_id: str | None = None,
) -> None:
    """One-time bootstrap of BOTH sign-band sidecar frames from a single
    corpus scan — the _ensure_mh_sidecar crash story verbatim: bands tmp
    renamed first, VECS rename last as the commit point; an orphan bands
    dir is deleted and rebuilt; a vecs frame without bands rebuilds the
    bands FROM the stored vectors (no corpus scan). Corpus rows whose
    vector is NULL or off-dimension cannot band and are excluded from
    the sidecar (they stay in the corpus, un-probed — the apply path
    refuses such rows in new batches)."""
    import os
    import shutil

    from custom_vector_database_spark.operators.dedup import sign_band_keys

    _check_sb_args(n_bands, band_bits)
    vecs_dir = os.path.join(corpus_dir, _SB_VECS)
    bands_dir = os.path.join(corpus_dir, _SB_BANDS)
    _heal_two_frame_rebucket(
        corpus_dir, _SB_REBUCKET_MARKER, (vecs_dir, bands_dir)
    )
    for d in (vecs_dir, bands_dir):
        if not os.path.isdir(d) and os.path.isdir(d + "_old"):
            os.rename(d + "_old", d)
    if os.path.isdir(vecs_dir) and os.path.isdir(bands_dir):
        # fail fast BEFORE any stream starts (the _check_mh_shape story)
        _check_sb_shape(vecs_dir, n_bands, band_bits)
        _check_sidecar_model(vecs_dir, model_id)
        return
    dim = n_bands * band_bits
    tmp_b = bands_dir + "_tmp"
    if os.path.isdir(vecs_dir):
        # bands missing only: re-derive from the stored vectors
        n_buckets = _sidecar_n_buckets(vecs_dir, n_buckets)
        _check_sb_shape(vecs_dir, n_bands, band_bits)
        _check_sidecar_model(vecs_dir, model_id)
        vecs = _read_sb_vecs(spark, vecs_dir)
        # vec=NULL rows are the bootstrap-excluded id MARKERS (r10): they
        # must never band — sign_band_keys(NULL) is an array of n_bands
        # NULLs (the outer transform runs over a non-null sequence), so
        # an unfiltered posexplode would emit n_bands key=NULL band rows
        # per marker into the healed frame (r10 review finding)
        rebuilt = vecs.filter(F.col("vec").isNotNull()).select(
            "id",
            "batch_id",
            F.posexplode(
                sign_band_keys("vec", n_bands, band_bits)
            ).alias("band", "key"),
        ).select(
            "band",
            "key",
            "id",
            "batch_id",
            F.pmod(F.col("key"), F.lit(n_buckets)).cast("long").alias("bb"),
        )
        if os.path.isdir(tmp_b):
            shutil.rmtree(tmp_b)
        rebuilt.write.partitionBy("bb").parquet(tmp_b)
        # the rebuilt frame inherits the VECS frame's pin, not the
        # caller's — the stored vectors define the model space
        vmeta = _read_sidecar_meta(vecs_dir) or {}
        _write_sidecar_meta(tmp_b, n_buckets, None, n_bands, band_bits,
                            vmeta.get("model_id"))
        if os.path.isdir(bands_dir):
            shutil.rmtree(bands_dir)
        os.rename(tmp_b, bands_dir)
        return
    if os.path.isdir(bands_dir):  # orphan: vecs is the commit marker
        shutil.rmtree(bands_dir)
    if _corpus_has_data(corpus_dir):
        raw = spark.read.parquet(corpus_dir)
        corpus = (
            raw
            # the full undecidability predicate, not just wrong-dim:
            # NULL-component and zero-norm rows would enter the sidecar
            # as permanently unverifiable band rows (cosine NULL)
            .filter(~_sb_undecidable(F.col(vec_col), dim))
            .dropDuplicates([id_col, vec_col])
        )
        # bootstrap-EXCLUDED ids still occupy the corpus id space: record
        # them in the vecs frame as vec=NULL rows (no band rows — they can
        # never surface as cosine candidates) so the apply path's id-reuse
        # clash check sees them. Without this, a batch reusing an excluded
        # row's id passes the clash probe, double-maps the id in the
        # corpus, and a crash replay's corpus-id reconcile silently drops
        # the doc while leaving its appended sidecar rows as ghosts —
        # the exact hazard the check exists to prevent (ADVICE r9).
        excluded_ids = (
            raw.filter(_sb_undecidable(F.col(vec_col), dim))
            .select(F.col(id_col).cast("long").alias("id"))
            .distinct()
            # at most one vecs row per id: an id that ALSO has a decidable
            # vector is already represented by its real row
            .join(
                corpus.select(F.col(id_col).cast("long").alias("id")),
                "id",
                "left_anti",
            )
        )
        # refuse the ambiguous id->vector mapping the apply path refuses
        # per batch: after exact-duplicate collapse, one id with TWO
        # different vectors has no single sidecar row to reconcile on
        dup = (
            corpus.groupBy(id_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"corpus has duplicate {id_col!r} values with differing "
                f"{vec_col!r} vectors — the sidecar's id->vector mapping "
                "would be ambiguous (the same contract every ingest batch "
                "is held to); deduplicate the corpus before bootstrapping"
            )
        enc = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            sign_band_keys(vec_col, n_bands, band_bits).alias("__keys"),
        )
    else:
        enc = spark.createDataFrame(
            [], f"{id_col} long, {vec_col} array<float>, __keys array<bigint>"
        )
        excluded_ids = spark.createDataFrame([], "id long")
    enc = enc.localCheckpoint(eager=False)  # two writers below share
    # it (lazy: the first write materializes, the second reads cache)
    tmp_v = vecs_dir + "_tmp"
    for t in (tmp_v, tmp_b):
        if os.path.isdir(t):
            shutil.rmtree(t)
    _sb_band_rows(enc, id_col, -1, n_buckets).write.partitionBy("bb").parquet(
        tmp_b
    )
    _write_sidecar_meta(tmp_b, n_buckets, None, n_bands, band_bits, model_id)
    excluded_rows = excluded_ids.select(
        "id",
        F.lit(None).cast("array<float>").alias("vec"),
        F.lit(-1).cast("long").alias("batch_id"),
        F.pmod(F.col("id"), F.lit(n_buckets)).alias("idb"),
    )
    _sb_vec_rows(enc, id_col, vec_col, -1, n_buckets).unionByName(
        excluded_rows
    ).write.partitionBy("idb").parquet(tmp_v)
    _write_sidecar_meta(tmp_v, n_buckets, None, n_bands, band_bits, model_id)
    os.rename(tmp_b, bands_dir)
    os.rename(tmp_v, vecs_dir)  # commit point


@holds_writer_lease("apply:semdedup")
def corpus_semdedup_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_bits: int = 16,
    max_cos_dist: float = 0.1,
    n_buckets: int = 16,
    model_id: str | None = None,
) -> int:
    """Apply ONE semantic-dedup-on-ingest micro-batch against the
    sign-band sidecar. A document is dropped iff some band key collides
    with a sidecar row AND the exact round-6 cosine distance to that
    candidate is <= ``max_cos_dist`` (band recall knob, exact-verify
    precision — the sign_band_neardup_pairs contract on a stream).
    Within a batch the same decision runs pairwise with the smaller
    ``id_col`` surviving (dedup_keep_min's documented one-hop
    semantics). Steady state reads ONLY the two bucket-pruned sidecar
    frames — never the corpus.

    Crash safety is corpus_neardup_apply_batch's proven story: write-
    ahead claim -> vecs append -> bands append -> corpus append; a
    replayed batch probes with its own batch_id rows excluded, anti-
    joins its claimed rows per frame, and reconciles the corpus append
    against one column-pruned corpus id scan. Returns docs appended."""
    import os

    from custom_vector_database_spark.operators.dedup import sign_band_keys

    _check_sb_args(n_bands, band_bits)
    vecs_dir = os.path.join(corpus_dir, _SB_VECS)
    bands_dir = os.path.join(corpus_dir, _SB_BANDS)
    _heal_two_frame_rebucket(
        corpus_dir, _SB_REBUCKET_MARKER, (vecs_dir, bands_dir)
    )
    claims_dir = os.path.join(corpus_dir, _SB_CLAIMS)
    claim = os.path.join(claims_dir, f"claim_{batch_id}")
    recovering = os.path.exists(claim)
    n_buckets = _sidecar_n_buckets(vecs_dir, n_buckets)
    _check_sb_shape(vecs_dir, n_bands, band_bits)
    _check_sidecar_model(vecs_dir, model_id)
    dim = n_bands * band_bits

    enc = batch.withColumn(
        "__keys", sign_band_keys(vec_col, n_bands, band_bits)
    ).localCheckpoint(eager=False)  # keys computed once; the candidate
    # join, verify join, intra-batch pass, and all three appends reuse
    # it (lazy: the bucket agg right below materializes it)
    vec_side = _read_sb_vecs(spark, vecs_dir)
    band_side = _read_sb_bands(spark, bands_dir)
    if recovering:
        vec_side = vec_side.filter(F.col("batch_id") != batch_id)
        band_side = band_side.filter(F.col("batch_id") != batch_id)

    # refuse batch ids already present in the sidecar (review finding
    # r9): an id reuse would append a second id->vector mapping on the
    # normal path, while a crash replay's corpus-id reconcile would
    # silently DROP the doc yet leave its sidecar rows behind — ghost
    # rows dropping future near-dups of a document that never landed.
    # Bucket-pruned and bounded like every other probe; the recovering
    # filter above already excluded this batch's OWN claimed rows, so
    # replay sees exactly the pre-batch id set and decides identically.
    # ONE bounded agg answers the batch-quality guards
    # (_refuse_bad_vectors's contract: undecidable vectors, duplicate
    # ids) AND both bucket sets (id buckets for the clash/verify prunes,
    # band-key buckets for the candidate prune) — previously three
    # separate jobs over the same batch. The band-bucket set folds each
    # row's keys into ONE long bitmask before aggregating (bit_or), so
    # the agg buffer is 8 bytes — never batch_rows x n_bands values
    # (ADVICE r14); past 62 buckets the set falls back to a separate
    # distributed distinct (bounded by n_buckets, never by batch size).
    aggs = [
        F.sum(_sb_undecidable(F.col(vec_col), dim).cast("long")).alias("bad"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
        F.collect_set(
            F.pmod(F.col(id_col).cast("long"), F.lit(n_buckets))
        ).alias("idbs"),
    ]
    small_mask = n_buckets <= 62
    if small_mask:
        aggs.append(
            F.bit_or(
                F.aggregate(
                    F.transform(
                        F.col("__keys"),
                        lambda kk: F.pmod(kk, F.lit(n_buckets)),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, b: acc.bitwiseOR(
                        # F.shiftleft only takes a literal bit count;
                        # call the SQL function directly for a Column one
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"), b.cast("int")
                        )
                    ),
                )
            ).alias("bbmask")
        )
    pre = enc.agg(*aggs).first()
    if pre["bad"]:
        raise ValueError(
            f"{pre['bad']} document(s) with NULL, wrong-dimension, "
            f"NULL-component, or zero-norm {vec_col!r} (need exactly "
            f"{dim} = n_bands x band_bits non-NULL components, not all "
            "zero): an undecidable vector bypasses every semantic dedup "
            "probe — filter or impute upstream"
        )
    if pre["nd"] != pre["n"]:
        raise ValueError(
            f"{pre['n'] - pre['nd']} duplicate {id_col!r} value(s) in the "
            "ingest batch: ids key the sidecar's vector frame and the "
            "crash-replay reconcile — deduplicate ids upstream"
        )
    idbs = list(pre["idbs"])
    clash = (
        vec_side.filter(F.col("idb").isin(idbs))
        .select("id")
        .join(
            enc.select(F.col(id_col).cast("long").alias("id")),
            "id",
            "left_semi",
        )
        .limit(1)
        .count()
    )
    if clash:
        raise ValueError(
            f"ingest batch reuses {id_col!r} value(s) already in the "
            "corpus: ids key the sidecar's vector frame and the "
            "crash-replay reconcile, so a reuse either double-maps the "
            "id or silently drops the document on replay — assign fresh "
            "ids upstream"
        )

    # candidates: band-key collisions from the bucket-pruned bands frame
    # (bounded collect: <= n_buckets values)
    bb = enc.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.posexplode("__keys").alias("band", "key"),
    )
    if small_mask:
        mask_v = int(pre["bbmask"] or 0)
        bbs = [i for i in range(n_buckets) if (mask_v >> i) & 1]
    else:
        bbs = [
            r["bb"]
            for r in bb.select(
                F.pmod(F.col("key"), F.lit(n_buckets)).alias("bb")
            ).distinct().collect()
        ]
    cand = (
        bb.join(
            band_side.filter(F.col("bb").isin(bbs)).select(
                "band", "key", F.col("id").alias("__cid")
            ),
            ["band", "key"],
        )
        .select("__id", "__cid")
        .distinct()
        .localCheckpoint(eager=False)  # bounded: batch docs x collisions
        # (lazy: the bucket collect below materializes it)
    )
    # verify: exact cosine against ONLY the candidates' stored vectors,
    # gathered from the id-bucket-pruned vecs frame
    cidbs = [
        r["idb"]
        for r in cand.select(
            F.pmod(F.col("__cid"), F.lit(n_buckets)).alias("idb")
        )
        .distinct()
        .collect()
    ]
    near_ids = (
        cand.join(
            vec_side.filter(F.col("idb").isin(cidbs)).select(
                F.col("id").alias("__cid"), F.col("vec").alias("__cvec")
            ),
            "__cid",
        )
        .join(
            enc.select(
                F.col(id_col).alias("__id"), F.col(vec_col).alias("__bvec")
            ),
            "__id",
        )
        .filter(_sb_cos_dist("__bvec", "__cvec") <= max_cos_dist)
        .select(F.col("__id").alias(id_col))
        .distinct()
    )
    s1 = enc.join(near_ids, id_col, "left_anti")

    # intra-batch: keep-min-id over verified band collisions among the
    # corpus-survivors (the corpus_neardup_apply_batch convention)
    bb1 = bb.join(s1.select(F.col(id_col).alias("__id")), "__id")
    pairs = (
        bb1.alias("x")
        .join(
            bb1.select(
                "band", "key", F.col("__id").alias("__vid")
            ).alias("y"),
            ["band", "key"],
        )
        .filter(F.col("x.__id") < F.col("__vid"))
        .select(F.col("x.__id").alias("__kid"), "__vid")
        .distinct()
    )
    bvecs = enc.select(
        F.col(id_col).alias("__pid"), F.col(vec_col).alias("__pvec")
    )
    intra_victims = (
        pairs.join(
            bvecs.select(
                F.col("__pid").alias("__kid"), F.col("__pvec").alias("__kvec")
            ),
            "__kid",
        )
        .join(
            bvecs.select(
                F.col("__pid").alias("__vid"), F.col("__pvec").alias("__vvec")
            ),
            "__vid",
        )
        .filter(_sb_cos_dist("__kvec", "__vvec") <= max_cos_dist)
        .select(F.col("__vid").alias(id_col))
        .distinct()
    )
    survivors = s1.join(intra_victims, id_col, "left_anti")
    if recovering:
        # reconcile the corpus append against the ids already landed —
        # a column-pruned scan of id_col only (recovery-path-only cost,
        # mirroring the near-dup verb's fingerprint reconcile)
        if _corpus_has_data(corpus_dir):
            corpus_ids = (
                spark.read.parquet(corpus_dir).select(F.col(id_col)).distinct()
            )
        else:
            corpus_ids = spark.createDataFrame([], f"{id_col} long")
        survivors = survivors.join(corpus_ids, id_col, "left_anti")
    # materialize BEFORE the appends (the lazy plan reads the very
    # frames the appends below grow): the shared barrier persists every
    # partition in the count's job — one job, ordering enforced in code
    survivors, n_new = _materialized_barrier(survivors)
    if n_new:
        # write-ahead: the DURABLE claim lands before any append
        _durable_claim(claims_dir, claim)
        new_vecs = _sb_vec_rows(survivors, id_col, vec_col, batch_id, n_buckets)
        new_bands = _sb_band_rows(survivors, id_col, batch_id, n_buckets)
        if recovering:
            claimed_v = _read_sb_vecs(spark, vecs_dir).filter(
                F.col("batch_id") == batch_id
            ).select("id")
            new_vecs = new_vecs.join(claimed_v, "id", "left_anti")
            claimed_b = _read_sb_bands(spark, bands_dir).filter(
                F.col("batch_id") == batch_id
            ).select("band", "id")
            new_bands = new_bands.join(claimed_b, ["band", "id"], "left_anti")
        new_vecs.write.mode("append").partitionBy("idb").parquet(vecs_dir)
        new_bands.write.mode("append").partitionBy("bb").parquet(bands_dir)
        survivors.drop("__keys").write.mode("append").parquet(corpus_dir)
    return n_new


@holds_writer_lease("ingest:semdedup", force_arg="force_lease")
def stream_corpus_semdedup_ingest(
    spark: SparkSession,
    delta_dir: str,
    corpus_dir: str,
    doc_schema: T.StructType,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 2,
    timeout: int = 120,
    n_bands: int = 4,
    band_bits: int = 16,
    max_cos_dist: float = 0.1,
    n_buckets: int = 16,
    model_id: str | None = None,
    force_lease: bool = False,
) -> int:
    """Continuous corpus ingestion with SEMANTIC dedup-on-ingest (see
    corpus_semdedup_apply_batch for the decision rule and crash story) —
    the streaming form of sign-band embedding near-dup, completing the
    corpus-ingest family: exact / near-dup / quality-gated / semantic,
    all on the ONE at-least-once replay/claim protocol
    (_run_ingest_stream). Returns micro-batches applied this call."""
    import os

    claims_dir = os.path.join(corpus_dir, _SB_CLAIMS)
    _ensure_sb_sidecar(
        spark, corpus_dir, id_col, vec_col, n_bands, band_bits, n_buckets,
        model_id=model_id,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        corpus_semdedup_apply_batch(
            spark, batch, batch_id, corpus_dir,
            id_col=id_col, vec_col=vec_col, n_bands=n_bands,
            band_bits=band_bits, max_cos_dist=max_cos_dist,
            n_buckets=n_buckets, model_id=model_id,
        )

    return _run_ingest_stream(
        spark, delta_dir, doc_schema, claims_dir, apply,
        max_files_per_trigger, timeout, "corpus_semdedup_ingest",
    )


@holds_writer_lease("compact:semdedup", force_arg="force_lease")
def compact_sb_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    n_buckets: int = 16,
    new_n_buckets: int | None = None,
    force_lease: bool = False,
) -> dict:
    """Compact BOTH sign-band sidecar frames — compact_mh_sidecar's
    story on the semantic probe tables: per-frame tmp-then-rename swap
    (batch_id collapsed to -1, the pinned shape carried verbatim),
    refuses while any ingest claim is outstanding. ``new_n_buckets``
    REBUCKETS under the compact_mh_sidecar marker protocol: both tmps
    land under the new modulus first, then the commit marker, then the
    swap — a crash leaves the old modulus fully intact or rolls forward
    at the next entry point, never frames on different moduli.

    Returns {"files_before", "files_after", "n_vecs", "n_band_rows",
    "n_buckets"}."""
    counts, meta = _compact_two_frame_sidecar(
        spark,
        corpus_dir,
        _SB_REBUCKET_MARKER,
        _SB_CLAIMS,
        "stream_corpus_semdedup_ingest",
        (
            (_SB_VECS, _read_sb_vecs, "idb",
             lambda out: F.pmod(F.col("id"), F.lit(out)).cast("long")),
            (_SB_BANDS, _read_sb_bands, "bb",
             lambda out: F.pmod(F.col("key"), F.lit(out)).cast("long")),
        ),
        n_buckets,
        new_n_buckets,
    )
    return {
        "files_before": meta["files_before"],
        "files_after": meta["files_after"],
        "n_vecs": counts[_SB_VECS],
        "n_band_rows": counts[_SB_BANDS],
        "n_buckets": meta["n_buckets"],
    }


# ---------------------------------------------------------------------------
# Streaming NEAR-duplicate PAYLOAD ingest (round 11): the codec-free
# fuzzy sibling of fp_kind='payload_md5'. Byte-identical md5 misses
# re-containered media — the same content stream behind a retagged
# header or a different wrapper — the most common duplicate class in
# scraped multimodal corpora. This family fingerprints payloads by
# CONTENT-DEFINED CHUNKING (operators/multimodal.payload_cdc_chunks: a
# rolling hash picks boundary positions from the bytes alone, so
# boundaries move WITH the content and two containers of one payload
# share almost all chunk md5s), keeps a chunk-fingerprint sidecar under
# corpus_dir —
#   _cdc_chunks: (fp, id, n_chunks, batch_id, fpb)  partitioned by fp prefix
# — and drops an arriving payload iff some batch sibling with a smaller
# id, or some corpus payload, shares >= overlap_pct% of its distinct
# chunks (containment of the NEW doc; one-hop like the minhash family:
# the drop decision never chains through other drops, so it is exactly
# recomputable in SQL). Steady state reads only the bucket-pruned
# sidecar; chunking is pure Catalyst (no codec, no Python), and the
# identical integer polynomial runs in DuckDB, so a SQL oracle
# recomputes every boundary, chunk hash, and drop verdict bit-for-bit.
# Same claims/replay/compaction machinery as the exact family; the
# sidecar meta pins (n_buckets, cdc_mask, cdc_window) and mismatches
# refuse. Short payloads are the documented soft spot: a ~16-byte mean
# chunk length needs a few chunks to vote, so sub-100-byte payloads can
# escape containment under heavy header churn — real media (KBs+) give
# the threshold plenty of chunks.
# ---------------------------------------------------------------------------
_CDC_CHUNKS = "_cdc_chunks"
_CDC_CLAIMS = "_cdc_claims"
# The document-frequency sketch lives INSIDE the chunk sidecar dir as an
# underscore-prefixed subdir: parquet readers ignore "_"-named entries,
# so the main `spark.read.parquet(sidecar_dir)` never sees it, and it
# rides the sidecar's tmp-then-rename swap atomically (bootstrap,
# compact and rebucket replace chunks + sketch in ONE rename).
_CDC_DF_SUBDIR = "_df"
# An fp kept by the compact-time fold iff at least this many payloads
# contain it. The sketch exists for PREFIX RANKING only (rarest-first —
# PPJoin, Xiao et al., WWW 2008, public method): a missing or stale df
# can only degrade join pruning, never a drop verdict, so hot-only
# retention keeps the probe-time read O(hot fps + deltas since
# compact), flat in corpus size.
CDC_HOT_DF_MIN = 16
# Per-apply probe shape (round 14): the batch side (chunk fps, prefix
# rows, candidate old ids) is BROADCAST into every sidecar read, so the
# corpus-sized frames are never shuffled and each probe phase is one
# restricted column-pruned scan. The broadcasts are bounded by the
# batch's chunk count; past this many chunk rows the applies fall back
# to plain joins (Spark's planner picks the strategy) rather than risk
# an oversized broadcast — micro-batches sit orders of magnitude below
# the cap (200 payloads × ~30 chunks ≈ 6k rows vs 1M).
CDC_BROADCAST_MAX_CHUNKS = 1_000_000
# Past this many distinct batch fps the per-apply parquet IN pushdown
# is skipped (the predicate itself would dominate row-group stat
# checks) and the probes fall back to the broadcast-semi shape.
CDC_PUSHDOWN_MAX_FPS = 20_000


def _read_cdc_sidecar(spark: SparkSession, sidecar_dir: str):
    return spark.read.schema(
        "fp string, id long, n_chunks long, batch_id long, fpb long"
    ).parquet(sidecar_dir)


def _read_cdc_df(spark: SparkSession, sidecar_dir: str):
    """The df sketch: (fp, n, batch_id) delta rows — compact-time folds
    carry batch_id=-1 and only HOT fps (df ≥ CDC_HOT_DF_MIN); per-batch
    appends carry their batch_id and every fp the batch committed.
    Missing dir (a sidecar written before round 13) reads as empty —
    every chunk then ranks as rare, which is the pre-r13 join shape,
    correct and merely unpruned until the next compact writes the
    sketch."""
    import os

    d = os.path.join(sidecar_dir, _CDC_DF_SUBDIR)
    schema = "fp string, n long, batch_id long"
    if not os.path.isdir(d):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(d)


def _write_cdc_df_fold(rows, out_dir: str) -> None:
    """Fold chunk rows → the hot-only df sketch at ``out_dir/_df`` (one
    groupBy over rows the caller is already rewriting — bootstrap and
    compact pay nothing extra but this aggregate)."""
    import os

    (
        rows.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= CDC_HOT_DF_MIN)
        .select("fp", "n", F.lit(-1).cast("long").alias("batch_id"))
        .coalesce(1)
        .write.parquet(os.path.join(out_dir, _CDC_DF_SUBDIR))
    )


def _check_cdc_shape(sidecar_dir: str, mask: int) -> None:
    """Refuse a probe/rebuild whose chunking shape differs from the
    sidecar's pinned one: chunks cut under a different mask (or window)
    never collide with the stored fingerprints, so every duplicate
    would silently re-append — the fp_kind/modulus wrongness class on
    the CDC family. No legacy case: every CDC sidecar is written with
    its pins (the family is newer than the meta file)."""
    from custom_vector_database_spark.operators.multimodal import CDC_WINDOW

    meta = _read_sidecar_meta(sidecar_dir)
    if meta is None:
        return  # bootstrap in progress (tmp dir): nothing to check yet
    pinned_mask, pinned_w = meta.get("cdc_mask"), meta.get("cdc_window")
    if pinned_mask is None or pinned_w is None:
        raise ValueError(
            f"corrupt CDC sidecar meta in {sidecar_dir!r}: the chunking "
            "shape pins (cdc_mask, cdc_window) are missing — restore the "
            "meta file or rebuild the sidecar (delete it and let "
            "bootstrap re-derive it from the corpus)"
        )
    if int(pinned_mask) != int(mask) or int(pinned_w) != int(CDC_WINDOW):
        raise ValueError(
            f"CDC sidecar {sidecar_dir!r} pins chunking shape "
            f"(mask={pinned_mask}, window={pinned_w}) but this call uses "
            f"(mask={mask}, window={CDC_WINDOW}) — chunks cut under "
            "different shapes never collide, so every duplicate would "
            "silently re-append; probe with the pinned shape or rebuild "
            "the sidecar"
        )


def _refuse_bad_payloads(batch: DataFrame, id_col: str,
                         payload_col: str) -> None:
    """Fail fast on undecidable ingest rows: a NULL or EMPTY payload has
    no chunk set (nothing to dedup or reconcile on replay), and a
    duplicated id makes the keep decision ambiguous AND breaks the
    replay reconcile (which keys on id)."""
    bad = F.col(payload_col).isNull() | (F.length(F.col(payload_col)) == 0)
    if batch.filter(bad).limit(1).count():
        raise ValueError(
            f"NULL or empty {payload_col!r} in CDC ingest batch: an "
            "empty chunk set can neither dedup nor reconcile on crash "
            "replay — filter upstream before streaming into the corpus"
        )
    if (
        batch.groupBy(id_col).count().filter(F.col("count") > 1)
        .limit(1).count()
    ):
        raise ValueError(
            f"duplicate {id_col!r} within a CDC ingest batch: the keep "
            "decision between two payloads under one id is undecidable, "
            "and crash-replay reconciliation keys on the id — dedup ids "
            "upstream"
        )


def _cdc_chunk_rows(batch: DataFrame, id_col: str, payload_col: str,
                    mask: int, n_buckets: int) -> DataFrame:
    """(id, n_chunks, fp, fpb) — one row per DISTINCT chunk fingerprint
    per payload; n_chunks is the containment denominator."""
    from custom_vector_database_spark.operators.multimodal import (
        payload_cdc_chunks,
    )

    return (
        batch.select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                payload_cdc_chunks(payload_col, mask=mask)
            ).alias("_chunks"),
        )
        .withColumn("n_chunks", F.size("_chunks").cast("long"))
        .select("id", "n_chunks", F.explode("_chunks").alias("fp"))
        .withColumn("fpb", _corpus_fp_bucket(F.col("fp"), n_buckets))
    )


@holds_writer_lease("bootstrap:payload_cdc")
def _ensure_cdc_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    id_col: str,
    payload_col: str,
    n_buckets: int,
    mask: int,
) -> None:
    """One-time bootstrap of the chunk-fingerprint sidecar from a single
    corpus scan — _ensure_fp_sidecar's crash story (tmp-then-rename, the
    _old rollback) on the CDC frame."""
    import os
    import shutil

    sidecar_dir = os.path.join(corpus_dir, _CDC_CHUNKS)
    old_dir = sidecar_dir + "_old"
    if not os.path.isdir(sidecar_dir) and os.path.isdir(old_dir):
        os.rename(old_dir, sidecar_dir)
    if os.path.isdir(sidecar_dir):
        _check_cdc_shape(sidecar_dir, mask)
        return
    if _corpus_has_data(corpus_dir):
        # repartition before chunking: per-payload chunking dominates
        # the bootstrap, and a few-file corpus would otherwise chunk on
        # a few tasks
        rows = _cdc_chunk_rows(
            spark.read.parquet(corpus_dir)
            .repartition(spark.sparkContext.defaultParallelism),
            id_col, payload_col, mask, n_buckets,
        ).select("fp", "id", "n_chunks",
                 F.lit(-1).cast("long").alias("batch_id"), "fpb")
    else:
        rows = spark.createDataFrame(
            [], "fp string, id long, n_chunks long, batch_id long, fpb long"
        )
    tmp = sidecar_dir + "_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    rows = rows.localCheckpoint(eager=False)  # chunking runs once:
    # feeds the sidecar write AND the df-sketch fold below (lazy: the
    # write materializes it)
    # same sorted-by-fp bucket layout as compact (compression locality)
    (
        rows.repartition(n_buckets, "fpb")
        .sortWithinPartitions("fp")
        .write.partitionBy("fpb")
        .parquet(tmp)
    )
    _write_cdc_df_fold(rows, tmp)  # hot-chunk df sketch, same swap
    from custom_vector_database_spark.operators.multimodal import CDC_WINDOW

    _write_sidecar_meta(tmp, n_buckets, cdc_mask=mask, cdc_window=CDC_WINDOW)
    os.rename(tmp, sidecar_dir)


@holds_writer_lease("apply:payload_cdc")
def corpus_cdc_apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    corpus_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    overlap_pct: int = 50,
    n_buckets: int = 16,
    mask: int | None = None,
) -> int:
    """Apply ONE CDC near-dup-on-ingest micro-batch. A payload is
    dropped iff (a) some batch sibling with a SMALLER id shares
    >= ``overlap_pct``% of its distinct chunk fps (one-hop, never
    chained through other drops), or (b) some corpus payload does. The
    threshold compares integers (shared*100 >= pct*n_chunks) — exact on
    both engines. Steady state reads ONLY the bucket-pruned sidecar,
    and every sidecar pass streams through broadcast joins keyed by the
    batch side (prefix fps / batch fps / candidate olds) — the corpus
    frames are scanned, never shuffled, and a candidate-free batch (the
    common case) stops after the single prefix-restricted scan.

    Crash safety is the exact family's: write-ahead claim -> sidecar
    append -> corpus append; a replayed batch probes with its own
    batch_id rows excluded (recomputing the identical drop verdicts),
    anti-joins its claimed (id, fp) sidecar rows so a partial chunk
    append self-heals row-exactly, and reconciles the corpus append by
    id against one recovery-only corpus scan."""
    import os

    from custom_vector_database_spark.operators.multimodal import CDC_MASK

    if mask is None:
        mask = CDC_MASK
    # the payload guards (_refuse_bad_payloads's contract) fold into the
    # single chunk-stats agg below — no separate guard jobs
    sidecar_dir = os.path.join(corpus_dir, _CDC_CHUNKS)
    claims_dir = os.path.join(corpus_dir, _CDC_CLAIMS)
    claim = os.path.join(claims_dir, f"claim_{batch_id}")
    recovering = os.path.exists(claim)
    n_buckets = _sidecar_n_buckets(sidecar_dir, n_buckets)
    _check_cdc_shape(sidecar_dir, mask)
    pct = int(overlap_pct)

    # spread the chunker across the cluster BEFORE computing: a
    # micro-batch read from one delta file arrives as ONE partition, and
    # per-payload chunking is the batch's dominant compute — without
    # this a 4k-payload batch chunks serially on a single task
    par = spark.sparkContext.defaultParallelism
    # ONE agg over the raw batch answers both payload guards
    # (_refuse_bad_payloads's contract: NULL/empty payloads, duplicate
    # ids) — previously two separate limit-count jobs
    g = batch.agg(
        F.sum(
            (
                F.col(payload_col).isNull()
                | (F.length(F.col(payload_col)) == 0)
            ).cast("long")
        ).alias("bad"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
        # count_distinct ignores NULLs, so a NULL id would otherwise
        # surface as a misleading 'duplicate id' error (ADVICE r14) —
        # count them in the same agg and refuse with the real cause
        F.sum(F.col(id_col).isNull().cast("long")).alias("nullid"),
    ).first()
    if g["bad"]:
        raise ValueError(
            f"NULL or empty {payload_col!r} in CDC ingest batch: an "
            "empty chunk set can neither dedup nor reconcile on crash "
            "replay — filter upstream before streaming into the corpus"
        )
    if g["nullid"]:
        raise ValueError(
            f"{g['nullid']} NULL {id_col!r} value(s) in CDC ingest "
            "batch: the sidecar and crash-replay reconciliation key on "
            "the id, so a NULL id can neither dedup nor replay — assign "
            "ids upstream"
        )
    if g["nd"] != g["n"]:
        raise ValueError(
            f"duplicate {id_col!r} within a CDC ingest batch: the keep "
            "decision between two payloads under one id is undecidable, "
            "and crash-replay reconciliation keys on the id — dedup ids "
            "upstream"
        )
    ex = _cdc_chunk_rows(
        batch.repartition(par), id_col, payload_col, mask, n_buckets
    )
    # chunking runs once, not once per consumer below (the survivors
    # plan reads it three ways); lazy — the chunk-stats agg right below
    # materializes it
    ex = ex.localCheckpoint(eager=False)

    # (a) intra-batch one-hop: b dropped iff EXISTS a < b with
    # containment(b in a) >= pct% — independent of a's own fate, so the
    # verdict is order-free and SQL-recomputable
    a, b = ex.alias("a"), ex.alias("b")
    drop_intra = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("b.id").alias("id"),
                 F.col("b.n_chunks").alias("n_chunks"),
                 F.col("a.id").alias("aid"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") * 100 >= F.lit(pct) * F.col("n_chunks"))
        .select("id")
    )

    # (b) vs the sidecar, bucket-pruned to the batch's buckets. ONE
    # bounded agg answers the bucket set (<= n_buckets values), the
    # chunk-row count (the broadcast-size gate), and the distinct-fp
    # count (the InSet-pushdown gate) — previously a distinct+collect
    # job plus a count job; recovery excludes this batch's own rows
    exstats = ex.agg(
        F.collect_set("fpb").alias("fpbs"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("fp").alias("n_fps"),
    ).first()
    buckets = list(exstats["fpbs"])
    # batch-side frames are broadcast into every sidecar read below so
    # the corpus-sized scans never shuffle; bounded by the batch's own
    # chunk count
    small_batch = int(exstats["n_rows"]) <= CDC_BROADCAST_MAX_CHUNKS

    def _bcast(df):
        return F.broadcast(df) if small_batch else df

    exfps = ex.select("fp").distinct()
    probe = _read_cdc_sidecar(spark, sidecar_dir)
    if recovering:
        probe = probe.filter(F.col("batch_id") != batch_id)
    if len(buckets) < n_buckets:
        probe = probe.filter(F.col("fpb").isin(buckets))
    # batch-fp pre-filter: only sidecar rows whose fp the BATCH contains
    # can ever feed a candidate or a shared-chunk count, so the batch's
    # fp set rides in as ONE codegen InSet filter ahead of every join —
    # an InSet probe per row is ~2.5× cheaper than pushing 94M rows
    # through a broadcast-hash-join probe (measured at sf100), and the
    # rows that survive are exactly the joinable ones. Deliberately NOT
    # pushed into the parquet reader: a multi-thousand-literal IN
    # overflows the row-group filter's recursive Or evaluation, and on
    # uniform hash fps the per-row-group dictionary checks cost more
    # than the pruning saves (both measured; PLANS.md round-14 CDC
    # note). Semantics-free restriction — verdicts identical; the
    # collect is bounded by the caps.
    fp_list: list | None = None
    if small_batch and int(exstats["n_fps"]) <= CDC_PUSHDOWN_MAX_FPS:
        from custom_vector_database_spark.operators.layout import (
            in_literals,
        )

        # the collect is bounded by the cap, and skipped entirely when
        # the gate (known from the stats agg) says it would be discarded.
        # in_literals, not Column.isin: the same InSet plan, but built in
        # ONE parse instead of one py4j literal per fp (~5-7 s of pure
        # driver time at ~6k fps — measured r15, the bulk of this row's
        # sf0.1 cost and the r14 verdict's suspected regression)
        fp_list = sorted(r["fp"] for r in exfps.collect())
        probe = probe.filter(in_literals("fp", fp_list))
    # else: a chunk-heavy batch (~30 distinct fps per payload) hits
    # every bucket, and the saturated IN-list + per-dir listing only
    # adds overhead over the full probe it cannot avoid (measured in
    # the r12 sf100 probe: 2.7x at 4096 buckets) — see the PLANS.md
    # round-12 CDC scale note for the hot-chunk fan-out diagnosis
    probe = probe.select(
        F.col("fp"), F.col("id").alias("old_id")
    )

    # PPJoin-style PREFIX FILTERING (Xiao et al., WWW 2008 — public
    # method; r12 verdict item 2). The naive ex⋈probe on fp fans out
    # on HOT chunks: the r12 sf100 probe measured 86M join rows for a
    # 200-payload batch (hottest fp in 1.07M corpus payloads) — 125.96 s
    # per apply where sf10 took 8.13 s. Pigeonhole fix: a payload b
    # needs shared ≥ required = ceil(pct·|b|/100); any qualifying old
    # payload must therefore share at least one of ANY
    # (|b| − required + 1) chosen chunks of b. Choosing the RAREST
    # chunks (by the sidecar-maintained df sketch) makes the candidate
    # join touch only low-fan-out fps; the full containment count is
    # then verified EXACTLY over just the candidate pairs — verdicts
    # are bit-identical to the naive join (the SQL oracle recomputes
    # them unchanged), only the candidate generation shrinks. A chunk
    # absent from the sketch ranks df=0 (rare) — new and cold chunks
    # are the best prefix members; sketch staleness can only cost
    # pruning, never a verdict.
    from pyspark.sql import Window

    # the sketch read is restricted to the batch's own fps BEFORE the
    # fold (broadcast left-semi — the hot file + deltas stream through
    # unshuffled), so dfagg is ≤ one row per batch chunk fp regardless
    # of sketch size and the ranking join below can broadcast it
    dfagg = (
        _read_cdc_df(spark, sidecar_dir)
        .join(_bcast(exfps), "fp", "left_semi")
        .groupBy("fp")
        .agg(F.sum("n").alias("_df"))
    )
    required = F.expr(f"CAST((n_chunks * {pct} + 99) DIV 100 AS LONG)")
    w_rare = Window.partitionBy("id").orderBy(
        F.col("_df").asc(), F.col("fp").asc()
    )
    prefix = (
        ex.join(_bcast(dfagg), "fp", "left")
        .withColumn("_df", F.coalesce(F.col("_df"), F.lit(0)))
        .withColumn("_rk", F.row_number().over(w_rare))
        .filter(F.col("_rk") <= F.col("n_chunks") - required + 1)
        .select("fp", "id")
    )
    # candidate scan: ONE pass over the bucket-pruned sidecar with the
    # (small, rarest-chunk) prefix BROADCAST into the join — the
    # corpus-sized side streams through a broadcast hash join, never a
    # shuffle, and only prefix-fp rows (low fan-out by construction)
    # survive the probe
    cand = (
        probe.join(_bcast(prefix), "fp")
        .select("id", "old_id")
        .distinct()
        .localCheckpoint(eager=True)  # the plan below reads it twice
    )
    # verification, fan-out-free by construction: pair-chunk rows
    # (cand × the NEW payload's chunks — bounded by |cand| × ~30)
    # meet the candidate olds' OWN chunk rows (probe semi-joined to
    # candidate ids — a broadcast hash semi over the sidecar scan,
    # no shuffle of it) on BOTH (fp, old_id), so each output row is
    # one genuinely shared chunk of one candidate pair — never a
    # hot-fp cross product. A batch with NO candidates (every
    # payload content-fresh — the steady-state common case) skips
    # the verification's second sidecar scan entirely: one bounded
    # count against the checkpointed cand.
    if cand.limit(1).count() == 0:
        drop_cross = ex.select("id").limit(0)
    else:
        # verification scan: restricted on BOTH axes before anything
        # joins — fp ∈ the batch's chunk fps (the InSet filter when
        # small_batch, the broadcast semi otherwise) and old_id ∈ the
        # candidate olds; both sides broadcast, so this second sidecar
        # pass also never shuffles and its output is bounded by
        # |cand| × chunks-per-payload
        probe_cand = (
            probe if fp_list is not None
            else probe.join(_bcast(exfps), "fp", "left_semi")
        ).join(
            F.broadcast(cand.select("old_id").distinct()),
            "old_id", "left_semi",
        )
        drop_cross = (
            cand.join(ex.select("id", "n_chunks", "fp"), "id")
            .join(probe_cand, ["fp", "old_id"], "left_semi")
            .groupBy("id", "n_chunks", "old_id")
            .agg(F.count(F.lit(1)).alias("shared"))
            .filter(
                F.col("shared") * 100 >= F.lit(pct) * F.col("n_chunks")
            )
            .select("id")
        )

    dropped = drop_intra.union(drop_cross).distinct()
    survivors = batch.join(
        dropped.withColumnRenamed("id", id_col), id_col, "left_anti"
    )
    if recovering:
        # claimed payloads already in the corpus must not re-append
        if _corpus_has_data(corpus_dir):
            corpus_ids = spark.read.parquet(corpus_dir).select(
                F.col(id_col)
            ).distinct()
        else:
            corpus_ids = spark.createDataFrame([], f"{id_col} long")
        survivors = survivors.join(corpus_ids, id_col, "left_anti")
    # materialize BEFORE the appends (the lazy plan reads the very
    # frames the appends below grow): the shared barrier persists every
    # partition in the count's job — one job, ordering enforced in code
    survivors, n_new = _materialized_barrier(survivors)
    if n_new:
        # write-ahead: the DURABLE claim lands before either append
        _durable_claim(claims_dir, claim)
        # derive the sidecar rows from the CHECKPOINTED ex, never by
        # re-chunking the survivors: per-payload chunking is the batch's
        # dominant compute and in steady state most payloads survive
        # (r11 review finding — the naive form chunked twice per batch)
        new_rows = ex.join(
            survivors.select(F.col(id_col).alias("id")), "id"
        ).select("fp", "id", "n_chunks",
                 F.lit(batch_id).cast("long").alias("batch_id"), "fpb")
        if recovering:
            claimed = _read_cdc_sidecar(spark, sidecar_dir).filter(
                F.col("batch_id") == batch_id
            ).select("id", "fp")
            # per-ROW anti-join: a crash mid-append can land PART of a
            # payload's chunk rows; replay re-appends exactly the
            # missing (id, fp) rows, never a duplicate row
            new_rows = new_rows.join(claimed, ["id", "fp"], "left_anti")
        new_rows = new_rows.localCheckpoint(eager=False)  # feeds the
        # sidecar append AND the df-delta append below, computed once
        # (lazy: the first append materializes it)
        new_rows.write.mode("append").partitionBy("fpb").parquet(sidecar_dir)
        # df-sketch delta: append-time counts, folded (and pruned to
        # hot fps) at compact. RANKING data only — a replay that
        # re-appends a delta can at worst over-rank a chunk as hot,
        # which costs pruning, never a verdict; the per-batch anti-join
        # above already bounds new_rows to exactly the missing chunk
        # rows, so the delta matches what actually landed.
        (
            new_rows.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("fp", "n", F.lit(batch_id).cast("long").alias("batch_id"))
            .coalesce(1)
            .write.mode("append")
            .parquet(os.path.join(sidecar_dir, _CDC_DF_SUBDIR))
        )
        survivors.write.mode("append").parquet(corpus_dir)
    return n_new


@holds_writer_lease("ingest:payload_cdc", force_arg="force_lease")
def stream_corpus_cdc_ingest(
    spark: SparkSession,
    delta_dir: str,
    corpus_dir: str,
    doc_schema: T.StructType,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_files_per_trigger: int = 2,
    timeout: int = 120,
    n_buckets: int = 16,
    overlap_pct: int = 50,
    mask: int | None = None,
    force_lease: bool = False,
) -> int:
    """Continuous NEAR-dup payload ingestion (see corpus_cdc_apply_batch
    for the decision rule and crash story) — the codec-free fuzzy member
    of the corpus-ingest family, completing the payload pair exactly as
    stream_corpus_neardup_ingest completes the text pair. Returns
    micro-batches applied this call; same at-least-once machinery as
    every family member (_run_ingest_stream)."""
    import os

    from custom_vector_database_spark.operators.multimodal import CDC_MASK

    if mask is None:
        mask = CDC_MASK
    claims_dir = os.path.join(corpus_dir, _CDC_CLAIMS)
    _ensure_cdc_sidecar(spark, corpus_dir, id_col, payload_col,
                        n_buckets, mask)

    def apply(batch: DataFrame, batch_id: int) -> None:
        corpus_cdc_apply_batch(
            spark, batch, batch_id, corpus_dir,
            id_col=id_col, payload_col=payload_col,
            overlap_pct=overlap_pct, n_buckets=n_buckets, mask=mask,
        )

    return _run_ingest_stream(
        spark, delta_dir, doc_schema, claims_dir, apply,
        max_files_per_trigger, timeout, "corpus_cdc_ingest",
    )


@holds_writer_lease("compact:payload_cdc", force_arg="force_lease")
def compact_cdc_sidecar(
    spark: SparkSession,
    corpus_dir: str,
    n_buckets: int = 16,
    new_n_buckets: int | None = None,
    force_lease: bool = False,
) -> dict:
    """Compact the CDC chunk sidecar — compact_fp_sidecar's story
    (single-frame tmp-then-rename swap, batch_id collapsed to -1,
    refuses over outstanding claims, ``new_n_buckets`` rebuckets with
    the meta pin updated atomically in the same swap); the chunking
    shape pins are carried verbatim. Returns {"files_before",
    "files_after", "n_rows", "n_buckets"}."""
    import glob
    import os
    import shutil

    sidecar_dir = os.path.join(corpus_dir, _CDC_CHUNKS)
    claims_dir = os.path.join(corpus_dir, _CDC_CLAIMS)
    old_dir = sidecar_dir + "_old"
    if not os.path.isdir(sidecar_dir) and os.path.isdir(old_dir):
        os.rename(old_dir, sidecar_dir)
    n_buckets = _sidecar_n_buckets(sidecar_dir, n_buckets)
    if new_n_buckets is not None and int(new_n_buckets) <= 0:
        raise ValueError(
            f"new_n_buckets must be positive, got {new_n_buckets!r}"
        )
    out_buckets = (
        int(new_n_buckets) if new_n_buckets is not None else n_buckets
    )
    outstanding = glob.glob(os.path.join(claims_dir, "claim_*"))
    if outstanding:
        raise ValueError(
            f"{len(outstanding)} unresolved ingest claim(s) "
            f"({sorted(os.path.basename(c) for c in outstanding)[:3]}…): "
            "re-drive stream_corpus_cdc_ingest to let recovery resolve "
            "them before compacting (compaction erases the per-batch "
            "claim rows recovery reconciles against)"
        )
    count_files = lambda d: sum(  # noqa: E731
        1 for dp, _dn, fs in os.walk(d) for f in fs if f.endswith(".parquet")
    )
    files_before = count_files(sidecar_dir)
    rows = _read_cdc_sidecar(spark, sidecar_dir)
    n_rows = rows.count()
    tmp = sidecar_dir + "_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        rows.select(
            "fp", "id", "n_chunks",
            F.lit(-1).cast("long").alias("batch_id"),
            _corpus_fp_bucket(F.col("fp"), out_buckets).alias("fpb"),
        )
        .repartition(out_buckets, "fpb")
        # sorted-by-fp within each bucket: duplicate chunk fps land
        # adjacent, so dictionary/RLE encoding compresses the sidecar's
        # dominant column and the per-apply InSet scan reads less.
        # (Finer-grained layouts were measured and rejected: 256 KiB
        # row groups + IN pushdown cost more in per-row-group stat and
        # dictionary checks than they pruned on uniform hash fps —
        # PLANS.md round-14 CDC note.)
        .sortWithinPartitions("fp")
        .write.partitionBy("fpb")
        .parquet(tmp)
    )
    # fold the df sketch FROM THE FRESHLY-WRITTEN TMP (exact counts,
    # hot-only retention) — per-batch deltas collapse into one frame,
    # and the swap below replaces chunks + sketch atomically. Reading
    # tmp back (page-cache warm, compacted file count) instead of
    # re-evaluating the lazy `rows` avoids a third full scan of the
    # OLD fragmented sidecar, the family's largest frame (r13 review
    # finding); the "_df" subdir write is invisible to this read
    # (underscore-hidden).
    _write_cdc_df_fold(_read_cdc_sidecar(spark, tmp), tmp)
    _meta = _read_sidecar_meta(sidecar_dir) or {}
    _write_sidecar_meta(
        tmp, out_buckets,
        cdc_mask=_meta.get("cdc_mask"), cdc_window=_meta.get("cdc_window"),
    )
    if os.path.isdir(old_dir):
        shutil.rmtree(old_dir)
    os.rename(sidecar_dir, old_dir)
    os.rename(tmp, sidecar_dir)
    shutil.rmtree(old_dir)
    return {
        "files_before": files_before,
        "files_after": count_files(sidecar_dir),
        "n_rows": n_rows,
        "n_buckets": out_buckets,
    }


_FAMILY_FRAMES = {
    "exact": (_FP_SIDECAR,),
    "minhash": (_MH_SIGS, _MH_BANDS),
    "signband": (_SB_VECS, _SB_BANDS),
    "payload_cdc": (_CDC_CHUNKS,),
}
_FAMILY_MARKERS = {
    "minhash": _MH_REBUCKET_MARKER,
    "signband": _SB_REBUCKET_MARKER,
}


def list_sidecar_debris(corpus_dir: str) -> dict:
    """Crashed-session leftovers that are SAFE to delete, per family:
    ``<frame>_tmp`` dirs with no pending rebucket commit marker (a
    crashed pre-commit write — inert by the swap protocol, rewritten
    from scratch before any use) and ``<frame>_old`` dirs whose main
    frame is present (a completed swap's pre-cleanup leftover; the live
    frame is authoritative). An ``_old`` WITHOUT its main frame is NOT
    debris — it is the heal path's rollback source — and a pending
    marker makes the tmps part of an in-flight rebucket, also not
    debris. Every swap is individually crash-safe, but debris was only
    cleaned at the NEXT touch of the same artifact; a 100 TB estate
    accumulates it, so the autopilot surfaces it as a ``gc`` action
    (r10 verdict item 5). Returns {family: [dir names]} — names
    relative to corpus_dir; pure file-stats, no data read."""
    import os

    out: dict = {}
    for family, frames in _FAMILY_FRAMES.items():
        marker = _FAMILY_MARKERS.get(family)
        pending = marker is not None and os.path.exists(
            os.path.join(corpus_dir, marker)
        )
        names = []
        for fr in frames:
            d = os.path.join(corpus_dir, fr)
            if os.path.isdir(d + "_tmp") and not pending:
                names.append(fr + "_tmp")
            if os.path.isdir(d + "_old") and os.path.isdir(d):
                names.append(fr + "_old")
        if names:
            out[family] = sorted(names)
    return out


def sidecar_report(spark: SparkSession, corpus_dir: str) -> dict:
    """Operational snapshot of every dedup-on-ingest sidecar present
    under ``corpus_dir`` — the ingest family's describe() (the ops
    verb pairing with embedding_drift / key_skew_report): per family
    (exact fingerprint / minhash / sign-band), the pinned meta
    (modulus + shape), per-frame row and parquet-file counts, files
    per bucket (the compact-when signal — probe latency grows with
    per-bucket file fragmentation), and outstanding crash-recovery
    claims (the resolve-before-compacting signal). Frames are read
    whole — sidecars are corpus-METADATA-sized by design, and this is
    a maintenance verb, not a probe path.

    Two-frame families heal a pending rebucket commit marker FIRST
    (the compact/ensure/probe convention): post-marker pre-heal the
    two frames sit on DIFFERENT moduli and the stale first-frame meta
    would price files_per_bucket against the wrong n_buckets — in
    exactly the state an operator consults this verb to decide whether
    to compact."""
    import glob
    import os

    def _frame_stats(d: str) -> tuple[int, int]:
        """(n_files, n_rows) from ONE walk: row counts come from the
        parquet FOOTERS (exact metadata, identical to a count job) —
        the walk already visits every file for the file count, so the
        per-frame Spark count jobs this verb used to run priced pure
        scheduler overhead (sidecars are corpus-metadata-sized)."""
        import pyarrow.parquet as _pq

        n_files = 0
        n_rows = 0
        for dp, _dn, fs in os.walk(d):
            for f in fs:
                if f.endswith(".parquet"):
                    n_files += 1
                    n_rows += _pq.ParquetFile(
                        os.path.join(dp, f)
                    ).metadata.num_rows
        return n_files, n_rows

    report: dict = {}
    families = (
        ("exact", ((_FP_SIDECAR, _read_fp_sidecar),), _FP_CLAIMS, None),
        ("minhash", ((_MH_SIGS, _read_mh_sigs), (_MH_BANDS, _read_mh_bands)),
         _MH_CLAIMS, _MH_REBUCKET_MARKER),
        ("signband", ((_SB_VECS, _read_sb_vecs), (_SB_BANDS, _read_sb_bands)),
         _SB_CLAIMS, _SB_REBUCKET_MARKER),
        ("payload_cdc", ((_CDC_CHUNKS, _read_cdc_sidecar),), _CDC_CLAIMS,
         None),
    )
    for family, frames, claims_name, marker_name in families:
        if marker_name is not None and os.path.exists(
            os.path.join(corpus_dir, marker_name)
        ):
            # the heal MUTATES (it completes a crashed rebucket swap),
            # so it runs under the writer lease — but only if the lease
            # is free: a LIVE writer mid-rebucket owns its own swap and
            # will finish it, and racing its renames is exactly what the
            # lease exists to prevent. A report over a live writer
            # simply prices the pre-heal state (transient by definition).
            from custom_vector_database_spark.streaming.lease import (
                WriterLeaseHeld,
            )

            try:
                with writer_lease(corpus_dir, "heal:report"):
                    _heal_two_frame_rebucket(
                        corpus_dir,
                        marker_name,
                        tuple(
                            os.path.join(corpus_dir, name)
                            for name, _ in frames
                        ),
                    )
            except WriterLeaseHeld:
                pass  # live writer holds the lease; it owns the heal
    # ONE debris stat-walk for the whole report, not one per family
    # (r11 review finding) — and AFTER every heal above, so the listed
    # debris reflects what is actually on disk post-heal
    _debris = list_sidecar_debris(corpus_dir)
    for family, frames, claims_name, marker_name in families:
        # a family is reported when ANY frame is present — a family
        # whose FIRST frame crashed away but whose second survives is
        # exactly a heal-pending state the operator must see, not an
        # "absent family" to omit (r10 review finding); the meta comes
        # from the first PRESENT frame (all frames pin identical meta)
        present = [
            os.path.join(corpus_dir, name)
            for name, _ in frames
            if os.path.isdir(os.path.join(corpus_dir, name))
        ]
        if not present:
            continue
        meta = _read_sidecar_meta(present[0]) or {}
        fam: dict = {
            "meta": meta,
            "frames": {},
            "debris": _debris.get(family, []),
        }
        for name, _reader in frames:
            d = os.path.join(corpus_dir, name)
            if not os.path.isdir(d):
                fam["frames"][name] = None  # half-present: heal pending
                continue
            n_files, n_rows = _frame_stats(d)
            n_buckets = int(meta.get("n_buckets", 0)) or 1
            fam["frames"][name] = {
                "n_rows": n_rows,
                "n_files": n_files,
                "files_per_bucket": round(n_files / n_buckets, 2),
            }
        claims = sorted(
            os.path.basename(c)
            for c in glob.glob(
                os.path.join(corpus_dir, claims_name, "claim_*")
            )
        )
        fam["outstanding_claims"] = claims
        report[family] = fam
    return report
