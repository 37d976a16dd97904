"""Rebuild/compact autopilot: ONE verb that reads the repo's two
maintenance signals — ``quantization_error_report`` (when is a fitted
layout's quantizer stale, operators/pq.py) and ``sidecar_report`` (when
is a dedup-on-ingest sidecar fragmented, streaming/stream_ops.py) — and
turns them into a ranked action table, optionally executing it via the
existing crash-safe verbs.

This closes the ops loop the reference hands the operator as an explicit
``rebuild`` command (main.cpp:34, vectordb.cpp:82-118): since round 9
the signals exist on all five fitted layouts and all three sidecar
families, but ACTING on them was N manual calls. A 100 TB operator runs
exactly this verb on a schedule: plan mode is metadata-cheap (two scalar
aggregates per layout, sidecar frame counts — never a corpus scan), and
execute mode only ever drives the verbs that already own their crash
stories (compact_fp/mh/sb_sidecar; a caller-supplied refit + the
tmp-then-rename swap VectorTable._swap_index_in proved).

Action semantics:

- ``rebuild`` (a layout): its staleness report tripped ``stale`` —
  recent rows quantize ``err_ratio``× worse than the build corpus.
  Executable only when the entry supplies ``refit`` (a zero-arg callable
  returning a NEW fitted index over the data the layout must serve —
  refit hyperparameters are owner knowledge) and a save ``path``.
- ``compact`` (a sidecar family): some frame's files_per_bucket exceeds
  the threshold. Blocked while the family has outstanding claims —
  compaction erases the per-batch rows crash recovery reconciles
  against, the same refusal the compact verbs themselves make.
- ``resolve_claims`` (a sidecar family): outstanding crash-recovery
  claims exist; never executed by this verb (re-driving the ingest
  stream is the resolution), always ranked FIRST — nothing else in the
  family is safe to run over it.
- ``heal`` (a sidecar family): a frame is missing (crashed swap left a
  half-present family); surfaced unconditionally and ranked with the
  blockers — the family's own ensure/ingest verb heals it, so this verb
  never executes it.
- ``gc`` (a sidecar family or a layout): crashed-session leftovers that
  are SAFE to delete — ``_tmp`` dirs with no pending commit marker and
  ``_old`` dirs whose live artifact is present (every swap is
  individually crash-safe, but debris was only cleaned at the NEXT
  touch of the same artifact; a 100 TB estate accumulates it).
  Executable; the removal re-derives the debris set from disk under the
  corpus's writer lease rather than trusting the plan row.
- ``resize`` (a layout): mean occupancy (live rows / n_clusters,
  ONE scalar aggregate over the layout frame) exceeds
  ``occupancy_trip`` × ``target_rows_per_cluster`` — the corpus has
  outgrown its cluster count and every probe's cost now grows linearly
  with further ingest (the r11 sf100 pathology: fixed 16 clusters took
  ivfpq_search 1.8 s → 7.2 s across one decade; 10× the clusters made
  it 4.4× faster). Executable when the entry supplies ``resize_refit``
  (a callable taking the COMPUTED n_clusters —
  fitting.auto_n_clusters over the live row count, re-derived at
  execute time) and a save path; installed via the same crash-safe
  swap as rebuild. A planned resize SUBSUMES a same-entry rebuild row
  (its refit refreshes the stale quantizer too) and, like rebuild,
  drops the recall pin — the calibrate row ranked after it re-earns
  the pin in the same run.
- ``calibrate`` (a layout): the layout supports the recall-calibration
  pin (operators/calibrate.py) but carries none — every refit/rebuild
  deliberately drops the pin, so this row is how the loop closes:
  rebuild → recalibrate. Executable only when the entry supplies
  ``calibrate=`` a spec dict (``{"queries": <bounded bag DataFrame>,
  "k": …, "target_recall": …}`` — the bag is owner knowledge) and the
  layout is saved; the plan ranks it AFTER rebuild, so one execute run
  rebuilds the stale quantizer first and then calibrates the NEW
  layout (reloaded from its path post-swap). A sweep that misses the
  target refuses to pin and is recorded as skipped, never silently
  dropped. Without a spec the row is advisory with the remedy in the
  reason.
- ``none``: the signal was read and is healthy; listed so the plan is a
  complete audit, ranked last.

The plan is DATA (a list of dicts): execute mode re-reads nothing and
runs exactly the actions its own plan listed — the property the
execute-mode test pins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_SIDECAR_COMPACT_VERBS = {
    "exact": "compact_fp_sidecar",
    "minhash": "compact_mh_sidecar",
    "signband": "compact_sb_sidecar",
    "payload_cdc": "compact_cdc_sidecar",
}


def _named_corpora(corpora):
    """Normalize ``corpora`` entries to (name, corpus_dir) pairs — ONE
    copy of the naming rule so plan targets and execute routing can
    never disagree on what a bare-dir entry is called."""
    return [
        tuple(item) if isinstance(item, (tuple, list))
        else (os.path.basename(str(item)), item)
        for item in corpora
    ]


def _severity(action: str, metric: float, threshold: float) -> tuple:
    """Rank key: claims first (blockers), then actionable by how far
    past threshold, then gc (cheap, never urgent), then healthy rows."""
    order = {
        "heal": 0, "resolve_claims": 0, "rebuild": 1, "compact": 1,
        "resize": 1, "gc": 2, "calibrate": 2, "none": 3,
    }[action]
    over = (metric / threshold) if threshold else 0.0
    return (order, -over)


def _live_rows_df(idx):
    """The layout's live-row frame for the occupancy signal, whatever
    the family calls it (clustered_df on IVF, encoded_df on the code
    layouts, rows_df on MaxSim); None when the layout has no per-row
    frame (nothing to size)."""
    for name in ("clustered_df", "encoded_df", "rows_df"):
        fn = getattr(idx, name, None)
        if callable(fn):
            return fn()
    return None


def _list_layout_debris(path: str) -> list:
    """Safe-to-delete leftovers of a crashed layout install
    (layout.install_dir_swap): the ``_tmp`` sibling (inert — rewritten
    from scratch before any use) and the ``_old`` sibling when the main
    artifact is present (a completed swap's pre-cleanup leftover). An
    ``_old`` without its main artifact is the heal path's rollback
    source, never debris. Returns full paths."""
    out = []
    if path and os.path.isdir(str(path) + "_tmp"):
        out.append(str(path) + "_tmp")
    if path and os.path.isdir(str(path) + "_old") and os.path.isdir(path):
        out.append(str(path) + "_old")
    return out


def maintenance_plan(
    spark: SparkSession,
    layouts=(),
    corpora=(),
    max_files_per_bucket: float = 4.0,
) -> list[dict]:
    """Build the ranked action table.

    ``layouts``: dicts with keys ``name``, ``index`` (a fitted/loaded
    instance of any staleness-protocol layout), ``build_df``,
    ``recent_df`` (the quantization_error_report inputs), optional
    ``vec_col`` (default "vec"), ``ratio_threshold`` (default 2.0),
    ``model_id``, ``refit`` (zero-arg callable -> new fitted index),
    ``path`` (where the rebuilt layout is swapped in; defaults to the
    index's saved path).

    ``corpora``: (name, corpus_dir) pairs (or bare dirs, named by their
    basename); every sidecar family present under each corpus is read
    via sidecar_report.

    Returns plan rows ``{target, kind, action, metric_name, metric,
    threshold, blocked, executable, reason}``, most urgent first."""
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )
    from custom_vector_database_spark.streaming.stream_ops import (
        sidecar_report,
    )

    # materialize both inputs ONCE: this function iterates them several
    # times (dup checks, plan loops) and run_maintenance re-derives its
    # routing map from the same sequences — a generator would silently
    # exhaust after the first pass and the autopilot would report a
    # clean estate it never looked at (r11 review finding)
    layouts = list(layouts)
    corpora = list(corpora)
    names = [ent["name"] for ent in layouts]
    if len(names) != len(set(names)):
        # ambiguous in EVERY mode: plan targets collide, and execute's
        # by-name routing would silently run the LAST entry's refit for
        # both rebuild rows (r10 review findings — the check lives HERE
        # so plan-only and execute surfaces agree)
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"duplicate layout name(s) {dupes}: plan targets and "
            "execute routing are keyed by name — give every layout "
            "entry a unique name"
        )
    cnames = [n for n, _ in _named_corpora(corpora)]
    if len(cnames) != len(set(cnames)):
        # same ambiguity on the corpus side (r11 review finding): two
        # bare dirs sharing a basename would collapse in execute's
        # name->dir map and compact/gc the WRONG corpus while the
        # executed log claims success on the other
        cd = sorted({n for n in cnames if cnames.count(n) > 1})
        raise ValueError(
            f"duplicate corpus name(s) {cd}: plan targets and execute "
            "routing are keyed by name — pass (name, dir) pairs with "
            "unique names instead of same-basename bare dirs"
        )

    plan: list[dict] = []
    for ent in layouts:
        idx = ent["index"]
        thr = float(ent.get("ratio_threshold", 2.0))
        rep_df = quantization_error_report(
            idx,
            ent["build_df"],
            ent["recent_df"],
            vec_col=ent.get("vec_col", "vec"),
            ratio_threshold=thr,
            model_id=ent.get("model_id"),
        )
        # the occupancy count rides the SAME job as the staleness
        # report (one crossJoined scalar agg) instead of a second pass
        # over the layout frame
        live_rows = _live_rows_df(idx)
        has_occ = hasattr(idx, "centroids") and live_rows is not None
        if has_occ:
            rep_df = rep_df.crossJoin(
                live_rows.agg(F.count(F.lit(1)).alias("_n_live"))
            )
        rep = rep_df.first()
        stale = bool(rep["stale"])
        can_exec = ent.get("refit") is not None and (
            ent.get("path") or getattr(idx, "_path", None)
        )
        # occupancy signal (round 12): mean live rows per coarse cluster
        # vs the sizing target — the complement of the staleness signal
        # (calibrate tunes recall at fixed layout; resize tunes the
        # layout at fixed recall). One scalar aggregate over the layout
        # frame, same cost class as the staleness report's two. The r11
        # sf100 probe measured the pathology this row exists to catch: a
        # fixed cluster count leaves the flat search regime one decade
        # past wherever it was tuned (probed-slice rows grow linearly
        # with the corpus).
        occ = None
        target_rpc = int(ent.get("target_rows_per_cluster", 512))
        trip = float(ent.get("occupancy_trip", 4.0))
        if has_occ:
            occ = int(rep["_n_live"]) / max(1, len(idx.centroids))
        resize_tripped = occ is not None and occ > trip * target_rpc
        resize_exec = callable(ent.get("resize_refit")) and (
            ent.get("path") or getattr(idx, "_path", None)
        )
        resize_planned = bool(resize_tripped and resize_exec)
        rebuild_planned = bool(stale and can_exec and not resize_planned)
        plan.append({
            "target": ent["name"],
            "kind": f"layout:{type(idx).__name__}",
            "action": "rebuild" if stale else "none",
            "metric_name": "err_ratio",
            "metric": float(rep["err_ratio"]),
            "threshold": thr,
            "blocked": False,
            # a planned resize SUBSUMES the rebuild: the resize runner
            # refits at the computed cluster count, which refreshes the
            # stale quantizer too — running both would have the
            # fixed-k rebuild undo the resize, in whichever order the
            # rank put them
            "executable": rebuild_planned,
            "reason": (
                f"recent rows quantize {rep['err_ratio']}x worse than the "
                "build corpus" if stale else "err_ratio within threshold"
            )
            + ("" if can_exec or not stale
               else "; not executable: supply refit= and path=")
            + ("; superseded by the resize row (its refit at the "
               "computed cluster count refreshes the quantizer too)"
               if stale and resize_planned else ""),
        })
        if resize_tripped:
            plan.append({
                "target": ent["name"],
                "kind": f"layout:{type(idx).__name__}",
                "action": "resize",
                "metric_name": "rows_per_cluster",
                "metric": float(occ),
                "threshold": float(trip * target_rpc),
                "blocked": False,
                "executable": resize_planned,
                "reason": (
                    f"mean occupancy {occ:.0f} rows/cluster exceeds "
                    f"{trip:g}x the {target_rpc}-row sizing target — the "
                    "probed slice grows linearly with the corpus from "
                    "here"
                )
                + (
                    "; refit at the computed cluster count runs on "
                    "execute" if resize_planned
                    else "; not executable: supply resize_refit= (a "
                    "callable taking the computed n_clusters) and a "
                    "saved path — or rebuild with n_clusters='auto'"
                ),
            })
        if (
            hasattr(idx, "_resolve_nprobe") or hasattr(idx, "_resolve_beam")
        ) and (
            getattr(idx, "calibration", None) is None
            or rebuild_planned
            or resize_planned
        ):
            # the layout takes a recall pin but has none — freshly fitted,
            # or a rebuild just dropped it (the pin is only valid for the
            # quantizer it was measured on). Executable when the entry
            # supplies the query bag; ranked after rebuild so one execute
            # run refreshes the quantizer FIRST and calibrates the result.
            # A PINNED layout whose rebuild row is planned executable also
            # gets the calibrate row: the rebuild is guaranteed to drop
            # the pin, and without this row the docstring's one-run
            # rebuild→recalibrate loop would leave the rebuilt layout
            # unpinned until the NEXT maintenance run (r11 ADVICE
            # finding).
            cal_exec = ent.get("calibrate") is not None and (
                ent.get("path") or getattr(idx, "_path", None)
            )
            pinned_now = getattr(idx, "calibration", None) is not None
            plan.append({
                "target": ent["name"],
                "kind": f"layout:{type(idx).__name__}",
                "action": "calibrate",
                "metric_name": "has_recall_pin",
                "metric": 1.0 if pinned_now else 0.0,
                "threshold": 1.0,
                "blocked": False,
                "executable": bool(cal_exec),
                "reason": (
                    ("the resize" if resize_planned else "the rebuild")
                    + " planned this run drops the pin"
                    if pinned_now
                    else "no pinned recall calibration"
                )
                + (
                    f" — {_cal_verb(idx)}(persist=True) runs on execute"
                    if cal_exec
                    else f" — run {_cal_verb(idx)}(index, query_bag, "
                    "persist=True), or supply "
                    "calibrate={'queries': …} and a saved path to make "
                    "this row executable; a refit/rebuild drops the pin"
                ),
            })
        debris = _list_layout_debris(
            ent.get("path") or getattr(idx, "_path", None)
        )
        if debris:
            plan.append({
                "target": ent["name"],
                "kind": f"layout:{type(idx).__name__}",
                "action": "gc",
                "metric_name": "n_debris",
                "metric": float(len(debris)),
                "threshold": 0.0,
                "blocked": False,
                "executable": True,
                "reason": "crashed-install leftovers safe to remove: "
                + ", ".join(os.path.basename(d) for d in debris),
            })
    for name, corpus_dir in _named_corpora(corpora):
        from custom_vector_database_spark.streaming.stream_ops import (
            list_sidecar_debris,
        )

        # debris comes from its own lister, not the report: a family
        # whose frames are entirely gone can still own a stray _tmp dir
        # the report (which keys on present frames) would never surface
        for family, debris_names in sorted(
            list_sidecar_debris(corpus_dir).items()
        ):
            plan.append({
                "target": f"{name}:{family}",
                "kind": f"sidecar:{family}",
                "action": "gc",
                "metric_name": "n_debris",
                "metric": float(len(debris_names)),
                "threshold": 0.0,
                "blocked": False,
                "executable": True,
                "reason": "crashed-session leftovers safe to remove: "
                + ", ".join(debris_names),
            })
        rep = sidecar_report(spark, corpus_dir)
        for family in sorted(rep):
            fam = rep[family]
            target = f"{name}:{family}"
            n_claims = len(fam["outstanding_claims"])
            frames = [v for v in fam["frames"].values() if v is not None]
            heal_pending = len(frames) != len(fam["frames"])
            fpb = max(
                (f["files_per_bucket"] for f in frames), default=0.0
            )
            if heal_pending:
                # a crashed swap left a frame missing: the family needs
                # healing (the next ensure/ingest call heals it) before
                # ANY other maintenance — surfaced unconditionally, not
                # hidden behind a healthy fragmentation number (r10
                # review finding)
                plan.append({
                    "target": target,
                    "kind": f"sidecar:{family}",
                    "action": "heal",
                    "metric_name": "n_missing_frames",
                    "metric": float(len(fam["frames"]) - len(frames)),
                    "threshold": 0.0,
                    "blocked": False,
                    "executable": False,
                    "reason": "a frame is missing (crashed swap): re-run "
                    "the family's ensure/ingest verb to heal before any "
                    "other maintenance",
                })
            if n_claims:
                plan.append({
                    "target": target,
                    "kind": f"sidecar:{family}",
                    "action": "resolve_claims",
                    "metric_name": "n_claims",
                    "metric": float(n_claims),
                    "threshold": 0.0,
                    "blocked": False,
                    "executable": False,
                    "reason": "re-drive the ingest stream to resolve "
                    "outstanding claims; compaction is unsafe over them",
                })
            if fpb > max_files_per_bucket and not heal_pending:
                # a heal-pending family emits NO compact row: its
                # fragmentation is measured on the surviving frame only
                # (half-blind) and compaction cannot run before the heal
                # — heal first, re-plan after
                plan.append({
                    "target": target,
                    "kind": f"sidecar:{family}",
                    "action": "compact",
                    "metric_name": "files_per_bucket",
                    "metric": float(fpb),
                    "threshold": float(max_files_per_bucket),
                    "blocked": bool(n_claims),
                    "executable": not n_claims,
                    "reason": (
                        "blocked by outstanding claims" if n_claims
                        else f"{fpb} files/bucket exceeds "
                        f"{max_files_per_bucket}"
                    ),
                })
            elif not n_claims and not heal_pending:
                plan.append({
                    "target": target,
                    "kind": f"sidecar:{family}",
                    "action": "none",
                    "metric_name": "files_per_bucket",
                    "metric": float(fpb),
                    "threshold": float(max_files_per_bucket),
                    "blocked": False,
                    "executable": False,
                    "reason": "fragmentation within threshold",
                })
    plan.sort(
        key=lambda a: _severity(a["action"], a["metric"], a["threshold"])
        + (a["target"],)
    )
    return plan


def _cal_verb(idx) -> str:
    """The calibration verb THIS layout actually takes — the remedy the
    plan's reason text names must match what the execute path would
    dispatch (r13 second-review finding: telling a graph-layout user to
    run calibrate_nprobe sends them to a verb that rejects the handle)."""
    if hasattr(idx, "_resolve_beam"):
        return "graph_ann.calibrate_beam"
    if hasattr(idx, "doc_col") and hasattr(idx, "rows_df"):
        return "calibrate_nprobe_maxsim"
    return "calibrate_nprobe"


def _swap_layout_in(index, path: str) -> None:
    """Install a freshly fitted layout at ``path`` crash-safely via the
    shared whole-directory swap (layout.install_dir_swap — ONE copy of
    the rename choreography, shared with VectorTable._swap_index_in);
    no completeness marker needed: these layouts self-describe via
    meta.json."""
    from custom_vector_database_spark.operators.layout import (
        install_dir_swap,
    )

    install_dir_swap(path, index.save)
    if hasattr(index, "_path"):
        index._path = path


def run_maintenance(
    spark: SparkSession,
    layouts=(),
    corpora=(),
    max_files_per_bucket: float = 4.0,
    execute: bool = False,
) -> tuple[list[dict], list[dict]]:
    """Plan, and optionally execute. Returns (plan, executed) where
    ``executed`` records one entry per executable action — the run's
    result, a ``{"skipped": <reason>}`` record (a LIVE writer held the
    target's lease, or a calibration sweep refused to pin), or a
    ``{"failed": <error>}`` record (any other runner error — a claim
    planted between plan and execute, a refit crash): one bad target
    must not abort maintenance everywhere else, and silently omitting
    the refusal would read as "done" (r11 review findings). Always a
    subset of the plan's ``executable`` rows (the autopilot contract:
    it only runs what its own plan listed, and nothing blocked)."""
    import custom_vector_database_spark.streaming.stream_ops as so
    from custom_vector_database_spark.streaming.lease import (
        WriterLeaseHeld,
    )

    # materialize once HERE too: this function reads both sequences
    # before and after handing them to maintenance_plan
    layouts = list(layouts)
    corpora = list(corpora)
    by_name = {ent["name"]: ent for ent in layouts}
    # target -> corpus_dir stays an INTERNAL map: the returned plan is a
    # fixed-shape data table ({target, kind, action, ...}) and must not
    # leak private routing keys to serializers/consumers (r10 ADVICE).
    # Targets are f"{name}:{family}" and family names have no colons,
    # so rsplit recovers the corpus name unambiguously.
    dir_by_name = dict(_named_corpora(corpora))
    # duplicate names refuse inside maintenance_plan below — before any
    # by_name routing can misfire
    plan = maintenance_plan(
        spark, layouts, corpora, max_files_per_bucket=max_files_per_bucket
    )
    executed: list[dict] = []
    if not execute:
        return plan, executed
    def _run_gc(a: dict) -> dict:
        import shutil

        from custom_vector_database_spark.streaming.lease import (
            writer_lease,
        )
        from custom_vector_database_spark.streaming.stream_ops import (
            list_sidecar_debris,
        )

        removed = []
        if a["kind"].startswith("sidecar:"):
            family = a["kind"].split(":", 1)[1]
            corpus_dir = dir_by_name[a["target"].rsplit(":", 1)[0]]
            # re-list under the writer lease: the debris set is
            # re-derived from disk at removal time (never parsed out of
            # the plan row), and the lease excludes a writer whose
            # in-flight swap could make a tmp dir live again.
            # heartbeat + staleness (r12 review finding): every corpus
            # contender now ages out a lease 3600 s past its last beat
            # (the cross-host TTL), so an UN-beaten gc outlasting the
            # budget on a huge debris tree would be fenced mid-delete —
            # the same hazard the layout branch below already guards
            with writer_lease(corpus_dir, "gc",
                              stale_after_s=3600, heartbeat_s=600):
                for nm in list_sidecar_debris(corpus_dir).get(family, []):
                    shutil.rmtree(os.path.join(corpus_dir, nm))
                    removed.append(nm)
        else:
            ent = by_name[a["target"]]
            path = ent.get("path") or getattr(ent["index"], "_path", None)
            # same hazard as the sidecar branch: a LIVE install_dir_swap
            # in another process is mid-rename on these very dirs — the
            # swap's sibling lock (layout.py) excludes it (r11 review
            # finding: the naive rmtree raced the swap's tmp rename);
            # same hour-staleness rule AND heartbeat as the swap itself —
            # rmtree of a huge debris tree can outlast the budget, and an
            # un-beaten gc lock stolen mid-delete hands the swap a
            # half-deleted tmp to install (max-review finding)
            with writer_lease(str(path) + "_lock", "gc",
                              stale_after_s=3600, heartbeat_s=600):
                for d in _list_layout_debris(path):
                    shutil.rmtree(d)
                    removed.append(os.path.basename(d))
        return {"target": a["target"], "action": "gc", "removed": removed}

    def _run_compact(a: dict) -> dict:
        family = a["kind"].split(":", 1)[1]
        verb = getattr(so, _SIDECAR_COMPACT_VERBS[family])
        corpus_name = a["target"].rsplit(":", 1)[0]
        stats = verb(spark, dir_by_name[corpus_name])
        return {"target": a["target"], "action": "compact", "stats": stats}

    def _run_rebuild(a: dict) -> dict:
        ent = by_name[a["target"]]
        new_idx = ent["refit"]()
        path = ent.get("path") or getattr(ent["index"], "_path")
        _swap_layout_in(new_idx, path)
        return {"target": a["target"], "action": "rebuild", "path": path}

    def _run_resize(a: dict) -> dict:
        from custom_vector_database_spark.operators.fitting import (
            auto_n_clusters,
        )

        ent = by_name[a["target"]]
        # the cluster count is recomputed from the rows the layout must
        # serve NOW (never parsed out of the plan row — the gc
        # discipline): one scalar aggregate, then the owner's refit at
        # the computed k, installed through the same crash-safe swap as
        # rebuild. The refit drops any recall pin; the calibrate row
        # (ranked after) re-earns it in the same execute run.
        live_rows = _live_rows_df(ent["index"])
        n_live = live_rows.count()
        k = auto_n_clusters(
            n_live, int(ent.get("target_rows_per_cluster", 512))
        )
        new_idx = ent["resize_refit"](k)
        path = ent.get("path") or getattr(ent["index"], "_path")
        _swap_layout_in(new_idx, path)
        return {"target": a["target"], "action": "resize",
                "n_clusters": k, "path": path}

    def _run_calibrate(a: dict) -> dict:
        from custom_vector_database_spark.operators.calibrate import (
            calibrate_nprobe,
            calibrate_nprobe_maxsim,
        )

        ent = by_name[a["target"]]
        spec = dict(ent["calibrate"])
        queries = spec.pop("queries")
        path = ent.get("path") or getattr(ent["index"], "_path")
        # ALWAYS reload from the saved path: when this very run just
        # executed the rebuild row (ranked before calibrate), the entry's
        # handle still points at the replaced quantizer — the pin must be
        # measured on what is actually installed
        idx = type(ent["index"]).load(spark, path)
        # dispatch by layout shape: a MaxSim-style layout (token-table
        # queries, per-doc recall — doc_col + rows_df, no clustered_df /
        # query_vec signature) calibrates through its own verb; routing
        # it into the vector-flavor calibrate_nprobe could only ever
        # fail or mis-skip with a 'pass corpus=' message that does not
        # apply (r11 ADVICE finding)
        is_maxsim = hasattr(idx, "doc_col") and hasattr(idx, "rows_df")
        is_graph = hasattr(idx, "_resolve_beam")
        if is_graph:
            # the k-NN-graph layout pins beam_width, not nprobe — its
            # own calibrate verb (the r11 MaxSim mis-dispatch lesson,
            # applied to the third calibration flavor up front)
            from custom_vector_database_spark.operators.graph_ann import (
                calibrate_beam,
            )

            cal = calibrate_beam
        else:
            cal = calibrate_nprobe_maxsim if is_maxsim else calibrate_nprobe
        try:
            rep = cal(idx, queries, persist=True, **spec)
        except WriterLeaseHeld:
            raise  # the loop's per-action skip handles a busy layout
        except ValueError as e:
            # the sweep missed the target (or the bag was unusable):
            # the calibrator refused to pin — record the refusal with
            # its remedy instead of aborting every other action
            return {"target": a["target"], "action": "calibrate",
                    "skipped": str(e)}
        if is_graph:
            return {"target": a["target"], "action": "calibrate",
                    "beam_width": rep["beam_width"], "recall": rep["recall"]}
        return {"target": a["target"], "action": "calibrate",
                "nprobe": rep["nprobe"], "recall": rep["recall"]}

    runners = {"gc": _run_gc, "compact": _run_compact,
               "rebuild": _run_rebuild, "resize": _run_resize,
               "calibrate": _run_calibrate}
    for a in plan:
        if not a["executable"] or a["blocked"]:
            continue
        try:
            executed.append(runners[a["action"]](a))
        except WriterLeaseHeld as e:
            # a LIVE writer owns this corpus right now: skip THIS action
            # and keep maintaining everything else — aborting the whole
            # run (and losing the executed record) over one busy corpus
            # was the r11 review finding; the refusal is recorded, never
            # silent
            executed.append({
                "target": a["target"], "action": a["action"],
                "skipped": str(e),
            })
        except Exception as e:  # noqa: BLE001 — per-action isolation
            # ANY other runner failure (a claim planted between plan and
            # execute making compact refuse, a refit() crash, a vanished
            # layout path) is the same ops situation as a busy corpus:
            # record it against ITS action and keep maintaining the rest
            # of the estate — one failed target must not discard the
            # executed record or strand every remaining action (r11
            # third-review finding; 'skipped' vs 'failed' distinguishes
            # a deliberate refusal from an error)
            executed.append({
                "target": a["target"], "action": a["action"],
                "failed": f"{type(e).__name__}: {e}",
            })
    return plan, executed
