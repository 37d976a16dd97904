"""Recall auto-calibration for the saved IVF-family layouts.

Every pruned search in the engine carries an accuracy knob — ``nprobe``,
the number of coarse clusters a query visits. Until now each registered
row pinned a hand-calibrated value (measured once, documented in the
row's comment); a 100 TB operator cannot hand-tune per corpus, per
metric, per rebuild. ``calibrate_nprobe`` closes that loop the same way
``quantization_error_report`` closes the when-to-rebuild loop:

1. take a BOUNDED query bag (``max_queries`` enforced with an explicit
   count — the broadcast discipline of knn_join);
2. compute the exact top-k once per query via the exact broadcast k-NN
   join (ground truth — one distributed job, never a driver loop);
3. sweep ``nprobe`` over a doubling schedule (1, 2, 4, …, n_clusters),
   measuring mean recall@k of the pruned batch search at each step —
   each step is one partition-pruned ``search_many`` job whose collect
   is bounded by k × |bag| id pairs;
4. pick the SMALLEST nprobe whose measured recall meets the caller's
   target, and optionally pin the choice into the saved layout's
   ``meta.json`` (atomic read-modify-replace under the layout's sibling
   swap lock) so searches can default to it via ``nprobe="auto"``.

Cost model at 100 TB: the sweep is O(log n_clusters) pruned batch
searches over a fixed small bag — each step scans ≈ nprobe/n_clusters
of the corpus for |bag| queries, so the whole calibration costs about
as much as ONE full-probe batch search of the bag (the doubling
schedule's geometric sum), run once per (re)build, not per query.

Lifecycle semantics (mirrors the staleness protocol):
- ``compact`` does not touch ``meta.json`` → a pinned calibration
  survives compaction (the quantizer is unchanged, so it stays valid);
- a refit/rebuild writes a FRESH meta → the pin is deliberately
  dropped; a new quantizer must re-earn its recall contract;
- upserted deltas shift the corpus gradually — that drift is the
  staleness protocol's job (``quantization_error_report``); the pin
  reflects the distribution it was measured on.

Reference anchor: the reference's search is always exact
(vectordb.cpp:120-156 scans every row); an approximate layout earns
that trust only with a measured recall contract. This verb is that
contract's measuring instrument.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "calibrate_nprobe",
    "calibrate_nprobe_maxsim",
    "auto_nprobe",
    "AutoNprobeMixin",
]


class AutoNprobeMixin:
    """Gives a saved layout the calibration-pin surface: a
    ``calibration`` slot round-tripped by the class's save/load, and
    ``nprobe="auto"`` resolution in its search verbs. ONE copy — the
    resolution previously existed verbatim in three index classes, and a
    fourth layout author would have had to rediscover and re-paste it
    (r11 fifth-review finding; ``maintenance_plan`` probes for
    ``_resolve_nprobe`` to decide pin-capability)."""

    calibration: dict | None = None  # nprobe pin (calibrate_nprobe)

    def _resolve_nprobe(self, nprobe):
        """``nprobe="auto"`` reads the layout's pinned recall calibration
        (calibrate_nprobe persist=True); anything else passes through
        untouched."""
        if nprobe == "auto":
            return auto_nprobe(self)
        return nprobe


def _recall_at_k(
    exact: dict[object, set], approx: dict[object, set]
) -> float:
    """Mean over queries of |approx ∩ exact| / |exact| (|exact| ≤ k)."""
    if not exact:
        return 0.0
    total = 0.0
    for qid, truth in exact.items():
        if not truth:
            continue
        total += len(approx.get(qid, set()) & truth) / len(truth)
    return total / len(exact)


def _id_sets(rows, qid_col: str, id_col: str) -> dict[object, set]:
    out: dict[object, set] = {}
    for r in rows:
        out.setdefault(r[qid_col], set()).add(r[id_col])
    return out


def calibrate_nprobe(
    idx,
    queries: DataFrame,
    *,
    corpus: DataFrame | None = None,
    corpus_vec: str | None = None,
    k: int = 10,
    target_recall: float = 0.9,
    query_id: str = "qid",
    query_vec: str = "qvec",
    max_queries: int = 256,
    full_sweep: bool = False,
    persist: bool = False,
    model_id: str | None = None,
    search_kwargs: dict | None = None,
) -> dict:
    """Measure recall@k of ``idx.search_many`` against the exact answer
    over a doubling nprobe schedule; return the calibration report and
    optionally pin the chosen nprobe into the saved layout's meta.

    ``idx`` is an IVF-family index handle exposing ``centroids``,
    ``search_many(queries, k, nprobe, query_id=, query_vec=, model_id=)``
    and (for the default ground truth) ``clustered_df()`` with raw
    vectors — IvfIndex on any metric (the dot layout's M-augmented
    stored vectors are sliced back to raw for the ground truth);
    code-only layouts (IvfPqIndex, IvfBqIndex) need ``corpus=`` the
    source table — ground truth must never come from the quantized
    codes being judged. ``search_kwargs`` passes extra arguments into
    every sweep step's ``search_many``; when the index's search_many
    REQUIRES ``base_df`` (IvfBqIndex's mandatory exact rerank) and the
    caller didn't supply it, the ground-truth corpus is injected
    automatically.

    Returns ``{"k", "target_recall", "n_queries", "n_clusters",
    "steps": [{"nprobe", "recall"}, …], "nprobe", "recall", "met",
    "scan_fraction"}`` — ``nprobe`` is None when even the full probe
    misses the target (possible for ADC-ranked layouts), and
    ``persist=True`` refuses in that case rather than pinning a knob
    that cannot deliver the contract.
    """
    if not hasattr(idx, "search_many") or not hasattr(idx, "centroids"):
        raise ValueError(
            "calibrate_nprobe needs an IVF-family index handle exposing "
            "centroids and search_many(queries, k, nprobe=, query_id=, "
            "query_vec=, model_id=) (IvfIndex, IvfPqIndex, IvfBqIndex); "
            "got " + type(idx).__name__
        )
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    n_q = queries.count()
    if n_q == 0:
        raise ValueError("empty query bag — nothing to calibrate on")
    if n_q > max_queries:
        raise ValueError(
            f"query bag has {n_q} rows > max_queries={max_queries}; "
            "calibration broadcasts the bag into every sweep step — "
            "sample it down (a few hundred queries bound recall tightly)"
        )

    metric = getattr(idx, "metric", "l2_sq")
    vec_col = corpus_vec or getattr(idx, "vec_col", None)
    if corpus is None:
        if not hasattr(idx, "clustered_df") or vec_col is None:
            raise ValueError(
                "this layout stores codes, not raw vectors (IVF-PQ/BQ) — "
                "pass corpus= the source table (and corpus_vec= its vector "
                "column) so ground truth is exact, not a comparison of the "
                "codes against themselves"
            )
        corpus = idx.clustered_df()
        if metric == "dot":
            # the dot layout stores M-AUGMENTED dim+1 vectors (the MIPS
            # reduction); judged against the raw dim-d queries they would
            # zip_with NULL-padded distances and the "exact" top-k would
            # degenerate to the k lowest ids — slice the augmentation off
            # to recover the raw vectors exactly (r11 review finding)
            want = idx._expected_input_dim()
            corpus = corpus.withColumn(
                vec_col, F.expr(f"slice(`{vec_col}`, 1, {int(want)})")
            )
        # cosine layouts store unit-normalized vectors: cosine ranking is
        # normalization-invariant, so the ground truth is unaffected
    if vec_col is None or vec_col not in corpus.columns:
        raise ValueError(
            f"corpus has no vector column {vec_col!r} — pass corpus_vec= "
            "the corpus's vector column name"
        )
    # ground truth must reflect the LIVE corpus: a user-supplied source
    # table (or the injected base_df below, which derives from it) still
    # contains rows the index has tombstone-deleted, and the pruned
    # search can never return those — measured recall would be
    # systematically deflated on any corpus with deletes, failing or
    # inflating the pin for a perfectly healthy layout (r11 fifth-review
    # finding). IvfIndex's default clustered_df() is already live; the
    # anti-join is a no-op without tombstones.
    live = getattr(idx, "_live", None)
    if callable(live):
        corpus = live(corpus)

    # ground truth: ONE exact broadcast k-NN join, collected as bounded
    # (qid, id) pairs — k × |bag| rows
    from custom_vector_database_spark.operators.knn import knn_join

    exact_rows = knn_join(
        corpus.select(F.col(idx.id_col), F.col(vec_col)),
        queries.select(F.col(query_id), F.col(query_vec)),
        k=k,
        data_id=idx.id_col,
        data_vec=vec_col,
        query_id=query_id,
        query_vec=query_vec,
        metric=metric,
        # the bag bound was already enforced with the count above —
        # max_query_rows here would re-run the bag's upstream plan for a
        # second count (r11 review finding)
        max_query_rows=None,
    ).select(query_id, idx.id_col).collect()
    exact = _id_sets(exact_rows, query_id, idx.id_col)

    search_kwargs = dict(search_kwargs or {})
    if "base_df" not in search_kwargs:
        import inspect

        try:
            params = inspect.signature(idx.search_many).parameters
        except (TypeError, ValueError):
            params = {}
        need_base = (
            "base_df" in params
            and params["base_df"].default is inspect.Parameter.empty
        )
        if need_base:
            # a mandatory-rerank layout (IVF-BQ): rerank against the same
            # raw-vector table the ground truth was computed from, under
            # the column names the layout's rejoin expects
            search_kwargs["base_df"] = corpus.select(
                F.col(idx.id_col),
                F.col(vec_col).alias(getattr(idx, "vec_col", vec_col)),
            )

    n_clusters = len(idx.centroids)
    schedule = []
    p = 1
    while p < n_clusters:
        schedule.append(p)
        p *= 2
    schedule.append(n_clusters)

    steps: list[dict] = []
    chosen: int | None = None
    chosen_recall = 0.0
    for nprobe in schedule:
        approx_rows = (
            idx.search_many(
                queries, k=k, nprobe=nprobe,
                query_id=query_id, query_vec=query_vec, model_id=model_id,
                **search_kwargs,
            )
            .select(query_id, idx.id_col)
            .collect()
        )
        recall = _recall_at_k(
            exact, _id_sets(approx_rows, query_id, idx.id_col)
        )
        steps.append({"nprobe": nprobe, "recall": recall})
        if chosen is None and recall >= target_recall:
            chosen, chosen_recall = nprobe, recall
            if not full_sweep:
                break

    report = {
        "k": k,
        "target_recall": target_recall,
        "n_queries": n_q,
        "n_clusters": n_clusters,
        "steps": steps,
        "nprobe": chosen,
        "recall": chosen_recall if chosen is not None else steps[-1]["recall"],
        "met": chosen is not None,
        "scan_fraction": (chosen / n_clusters) if chosen is not None else None,
    }
    if persist:
        if chosen is None:
            raise ValueError(
                "calibration missed the target even at a full probe "
                f"(recall {steps[-1]['recall']:.3f} < {target_recall}); "
                "refusing to pin — raise k candidates, lower the target, "
                "or rebuild with more clusters"
            )
        _persist_calibration(idx, report)
    return report


def _persist_calibration(idx, report: dict) -> None:
    """Pin the chosen nprobe into the saved layout's meta.json — atomic
    read-modify-replace under the layout's sibling swap lock (the
    install_dir_swap convention), so a concurrent compact/rebuild swap
    can never interleave with the meta rewrite."""
    path = getattr(idx, "_path", None)
    if path is None:
        raise ValueError(
            "persist=True requires a saved index (call save() or load() "
            "first) — an unsaved handle has no meta.json to pin into"
        )
    from custom_vector_database_spark.operators.layout import (
        meta_write_lease,
    )

    pin = {
        "nprobe": report["nprobe"],
        "recall": report["recall"],
        "k": report["k"],
        "target_recall": report["target_recall"],
        "n_queries": report["n_queries"],
    }
    meta_path = os.path.join(path, "meta.json")
    # the same sibling lock every save() now takes around ITS meta
    # install (layout.meta_write_lease) — a direct save can no longer
    # land between this read and the os.replace below, which would have
    # clobbered the fresh save's meta with the old body + pin (r11
    # ADVICE finding; the quantizer-identity check below still guards
    # the rebuild-while-sweeping case)
    with meta_write_lease(path, "calibrate_nprobe"):
        with open(meta_path) as f:
            meta = json.load(f)
        # the sweep ran UNLOCKED (it is minutes of Spark jobs): a rebuild
        # may have swapped in a fresh quantizer since — pinning the old
        # measurement onto the new meta would re-add exactly the stale
        # pin a rebuild exists to drop. The quantizer params in the meta
        # are the identity; refuse on mismatch (r11 review finding).
        if meta.get("centroids") != idx.centroids or meta.get(
            "codebooks"
        ) != getattr(idx, "codebooks", None):
            raise ValueError(
                "the saved layout was rebuilt while this calibration ran "
                "(its quantizer no longer matches the handle that was "
                "measured): refusing to pin — reload the index and "
                "recalibrate"
            )
        meta["calibration"] = pin
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
    idx.calibration = pin


def auto_nprobe(idx) -> int:
    """Resolve ``nprobe="auto"`` from the layout's pinned calibration;
    refuse with the remedy when the layout was never calibrated."""
    pin = getattr(idx, "calibration", None)
    if not pin or "nprobe" not in pin:
        raise ValueError(
            'nprobe="auto" needs a pinned calibration — run '
            "calibrate_nprobe(idx, queries, persist=True) once after "
            "build (and after every rebuild; a refit drops the pin)"
        )
    return int(pin["nprobe"])


def calibrate_nprobe_maxsim(
    idx,
    query_tokens: DataFrame,
    *,
    corpus_tokens: DataFrame | None = None,
    k: int = 10,
    target_recall: float = 0.9,
    qid_col: str = "qid",
    qtok_col: str = "qtid",
    qvec_col: str = "qvec",
    max_queries: int = 256,
    full_sweep: bool = False,
    persist: bool = False,
    model_id: str | None = None,
    search_kwargs: dict | None = None,
) -> dict:
    """calibrate_nprobe for the MaxSim (late-interaction) layout — the
    one pruned layout whose query is a token TABLE, not a vector column:
    ``query_tokens`` is (qid, qtid, qvec), one row per query token, and
    recall@k is measured over per-qid DOC sets against the exact batch
    scorer (ranking.maxsim_scores_many over the layout's LIVE raw token
    rows — MaxSim stores full-precision token vectors, so the layout
    itself is a valid ground-truth source; pass ``corpus_tokens=`` to
    judge against a different token table). ``search_kwargs`` forwards
    extra knobs (n_candidates, quantized) into every sweep step.

    Same schedule, report shape, pin lifecycle, and ``nprobe="auto"``
    resolution as calibrate_nprobe; persist reuses the same
    quantizer-identity-verified meta rewrite under the layout's swap
    lock."""
    if not hasattr(idx, "search_many") or not hasattr(idx, "centroids"):
        raise ValueError(
            "calibrate_nprobe_maxsim needs a MaxSim index handle "
            "exposing centroids and search_many(query_tokens, ...); got "
            + type(idx).__name__
        )
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    n_q = query_tokens.select(qid_col).distinct().count()
    if n_q == 0:
        raise ValueError("empty query bag — nothing to calibrate on")
    if n_q > max_queries:
        raise ValueError(
            f"query bag has {n_q} distinct queries > max_queries="
            f"{max_queries}; calibration broadcasts the bag into every "
            "sweep step — sample it down"
        )

    from custom_vector_database_spark.operators.ranking import (
        maxsim_scores_many,
    )

    corpus = corpus_tokens if corpus_tokens is not None else idx.rows_df()
    live = getattr(idx, "_live", None)
    if callable(live):
        # the calibrate_nprobe rationale: ground truth must reflect the
        # LIVE corpus — a user-supplied token table still contains docs
        # the index tombstone-deleted
        corpus = live(corpus)
    exact_rows = (
        maxsim_scores_many(
            corpus.select(F.col(idx.doc_col), F.col(idx.vec_col)),
            query_tokens,
            k=k,
            doc_col=idx.doc_col,
            vec_col=idx.vec_col,
            qid_col=qid_col,
            qtok_col=qtok_col,
            qvec_col=qvec_col,
        )
        .select(qid_col, idx.doc_col)
        .collect()
    )
    exact = _id_sets(exact_rows, qid_col, idx.doc_col)

    search_kwargs = dict(search_kwargs or {})
    n_clusters = len(idx.centroids)
    schedule = []
    p = 1
    while p < n_clusters:
        schedule.append(p)
        p *= 2
    schedule.append(n_clusters)

    steps: list[dict] = []
    chosen: int | None = None
    chosen_recall = 0.0
    for nprobe in schedule:
        approx_rows = (
            idx.search_many(
                query_tokens, k=k, nprobe=nprobe,
                qid_col=qid_col, qtok_col=qtok_col, qvec_col=qvec_col,
                model_id=model_id, **search_kwargs,
            )
            .select(qid_col, idx.doc_col)
            .collect()
        )
        recall = _recall_at_k(
            exact, _id_sets(approx_rows, qid_col, idx.doc_col)
        )
        steps.append({"nprobe": nprobe, "recall": recall})
        if chosen is None and recall >= target_recall:
            chosen, chosen_recall = nprobe, recall
            if not full_sweep:
                break

    report = {
        "k": k,
        "target_recall": target_recall,
        "n_queries": n_q,
        "n_clusters": n_clusters,
        "steps": steps,
        "nprobe": chosen,
        "recall": chosen_recall if chosen is not None else steps[-1]["recall"],
        "met": chosen is not None,
        "scan_fraction": (chosen / n_clusters) if chosen is not None else None,
    }
    if persist:
        if chosen is None:
            raise ValueError(
                "calibration missed the target even at a full probe "
                f"(recall {steps[-1]['recall']:.3f} < {target_recall}); "
                "refusing to pin — raise n_candidates, lower the target, "
                "or rebuild with more clusters"
            )
        _persist_calibration(idx, report)
    return report
