"""Graph-ANN search (round 13): the saved k-NN-graph layout and its
distributed beam search (operators/graph_ann.py — the reference's
searchKnn path, hnsw.h:104-132). Pins: recall vs exact, the saved-layout
round trip, the calibrate_beam pin + beam_width="auto" resolution,
beam-width monotonicity, cosine metric, the staleness protocol, and the
input guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def base(emb):
    return emb.filter(F.col("vec_id") < 400).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


@pytest.fixture(scope="module")
def saved(spark, base, tmp_path_factory):
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    path = str(tmp_path_factory.mktemp("gann") / "g")
    KnnGraphIndex.fit(
        base, degree=10, iterations=2, target_rows_per_cluster=64,
        model_id="emb-v1",
    ).save(path)
    return path


def _recall(exact_rows, approx_rows):
    ex: dict = {}
    ap: dict = {}
    for r in exact_rows:
        ex.setdefault(r[0], set()).add(r[1])
    for r in approx_rows:
        ap.setdefault(r[0], set()).add(r[1])
    return sum(
        len(ap.get(q, set()) & s) / len(s) for q, s in ex.items()
    ) / len(ex)


def test_save_load_roundtrip_and_recall(spark, base, saved):
    from custom_vector_database_spark.operators import knn as knn_ops
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    idx = KnnGraphIndex.load(spark, saved)
    d = idx.describe()
    assert d["kind"] == "knn_graph" and d["saved"] and d["n_nodes"] == 400
    assert d["n_entries"] == d["n_clusters"] == len(idx.centroids)

    qt = base.filter(F.col("id") < 25).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    exact = [
        (r["qid"], r["id"])
        for r in knn_ops.knn_join(base, qt, k=10).collect()
    ]
    approx = [
        (r["qid"], r["id"])
        for r in idx.search_many(
            qt, k=10, beam_width=40, rounds=3, model_id="emb-v1"
        ).collect()
    ]
    assert _recall(exact, approx) >= 0.9
    # ≤ k rows per query, best-first per query
    per_q: dict = {}
    for q, i in approx:
        per_q[q] = per_q.get(q, 0) + 1
    assert max(per_q.values()) <= 10 and len(per_q) == 25


def test_search_many_deterministic(spark, base, saved):
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    idx = KnnGraphIndex.load(spark, saved)
    qt = base.filter(F.col("id") < 8).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    a = sorted(
        map(tuple, idx.search_many(qt, 5, beam_width=16, rounds=2,
                                   model_id="emb-v1").collect())
    )
    b = sorted(
        map(tuple, idx.search_many(qt, 5, beam_width=16, rounds=2,
                                   model_id="emb-v1").collect())
    )
    assert a == b


def test_calibrate_pin_and_auto(spark, base, saved):
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
        calibrate_beam,
    )

    idx = KnnGraphIndex.load(spark, saved)
    qt = base.filter(F.col("id") < 10).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    with pytest.raises(ValueError, match="auto"):
        idx.search_many(qt, 5, beam_width="auto", model_id="emb-v1")
    rep = calibrate_beam(
        idx, qt, k=5, target_recall=0.9, persist=True, model_id="emb-v1",
        full_sweep=True,
    )
    assert rep["met"] and rep["beam_width"] is not None
    # monotone recall over the doubling sweep (tolerate float noise)
    recs = [s["recall"] for s in rep["steps"]]
    assert all(a <= b + 0.05 for a, b in zip(recs, recs[1:]))
    assert recs[-1] >= rep["target_recall"]
    # the pin round-trips through the saved meta and "auto" resolves
    idx2 = KnnGraphIndex.load(spark, saved)
    assert idx2.calibration["beam_width"] == rep["beam_width"]
    hits = idx2.search_many(
        qt, 5, beam_width="auto", model_id="emb-v1"
    ).collect()
    assert len(hits) == 50


def test_guards(spark, base, saved):
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
        calibrate_beam,
    )

    idx = KnnGraphIndex.load(spark, saved)
    qt = base.limit(3).select(
        F.col("id").alias("qid"), F.expr("slice(vec, 1, 3)").alias("qvec")
    )
    with pytest.raises(ValueError, match="dim"):
        idx.search_many(qt, 5, beam_width=8, model_id="emb-v1")
    with pytest.raises(ValueError, match="model"):
        idx.search_many(
            base.limit(1).select(
                F.col("id").alias("qid"), F.col("vec").alias("qvec")
            ),
            5, beam_width=8, model_id="emb-v2",
        )
    good = base.limit(3).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        idx.search_many(good, 5, beam_width=8, max_query_rows=2,
                        model_id="emb-v1")
    with pytest.raises(ValueError, match="empty"):
        calibrate_beam(idx, good.filter(F.lit(False)), model_id="emb-v1")
    with pytest.raises(ValueError, match="saved"):
        from custom_vector_database_spark.operators.graph_ann import (
            KnnGraphIndex as K,
        )

        fresh = K.load(spark, saved)
        fresh._path = None
        calibrate_beam(fresh, good, k=3, target_recall=0.1, persist=True,
                       model_id="emb-v1")


def test_cosine_metric(spark, base):
    from custom_vector_database_spark.operators import knn as knn_ops
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    small = base.filter(F.col("id") < 200)
    idx = KnnGraphIndex.fit(
        small, degree=8, iterations=1, metric="cosine",
        target_rows_per_cluster=64,
    )
    qt = small.filter(F.col("id") < 10).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    exact = [
        (r["qid"], r["id"])
        for r in knn_ops.knn_join(
            small, qt, k=5, metric="cosine", dist_col="cos_dist"
        ).collect()
    ]
    got = idx.search_many(qt, k=5, beam_width=32, rounds=3)
    assert got.columns == ["qid", "id", "cos_dist"]
    approx = [(r["qid"], r["id"]) for r in got.collect()]
    assert _recall(exact, approx) >= 0.85
    # the query's own row always ranks first at cos_dist ~0
    firsts = {
        r["qid"]: r["id"]
        for r in got.filter(F.col("cos_dist") < 1e-6).collect()
    }
    assert all(q == i for q, i in firsts.items())


def test_staleness_protocol(spark, base, saved):
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )
    from custom_vector_database_spark.operators.pq import (
        quantization_error_report,
    )

    idx = KnnGraphIndex.load(spark, saved)
    drift = base.limit(32).select(
        "id",
        F.expr(
            "transform(vec, x -> CAST(CAST(x AS DOUBLE) + 3.0 AS FLOAT))"
        ).alias("vec"),
    )
    rep = quantization_error_report(
        idx, base, drift, vec_col="vec", model_id="emb-v1"
    ).first()
    assert rep["n_recent"] == 32 and rep["err_ratio"] > 1.0


def test_upsert_appends_and_is_searchable(spark, emb, base, tmp_path):
    """HNSW-insert analogue: upserted nodes get degree out-edges (best
    of old-graph beam results ∪ intra-delta exact), land in the saved
    layout, and are returned by a later search; duplicate ids refuse."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    path = str(tmp_path / "g_up")
    KnnGraphIndex.fit(
        base, degree=8, iterations=1, target_rows_per_cluster=64
    ).save(path)
    idx = KnnGraphIndex.load(spark, path)
    delta = emb.filter(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 430)
    ).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    assert idx.upsert(delta, beam_width=16, rounds=2) == 30
    assert idx.nodes.count() == 430
    deg = (
        idx.edges.filter(F.col("src") >= 400)
        .groupBy("src")
        .count()
        .collect()
    )
    assert len(deg) == 30 and all(r["count"] <= 8 for r in deg)
    # an upserted node is findable as a QUERY over the refreshed layout
    q = [float(x) for x in delta.filter(F.col("id") == 410).first()["vec"]]
    # its own out-edges make its neighborhood searchable; the query
    # itself seeds from entries, so give the beam some width
    got = idx.search(q, k=5, beam_width=64, rounds=4)
    ids = [r["id"] for r in got.collect()]
    assert len(ids) == 5
    # duplicate ids refuse
    with pytest.raises(ValueError, match="reuses id"):
        idx.upsert(delta)
    # intra-delta edges exist: some upserted node links to another
    assert (
        idx.edges.filter(
            (F.col("src") >= 400) & (F.col("dst") >= 400)
        ).count()
        > 0
    )


def test_beam_plan_has_no_cartesian_or_perrow_python(spark, base, saved):
    """The beam's final plan (and, via the checkpoints, every round's):
    equi-joins only — no CartesianProduct/BroadcastNestedLoop over the
    node or edge tables, and never row-at-a-time Python."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    idx = KnnGraphIndex.load(spark, saved)
    qt = base.limit(4).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    out = idx.search_many(qt, 5, beam_width=8, rounds=1, model_id="emb-v1")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_auto_restores_all_pinned_knobs(spark, base, saved):
    """beam_width="auto" restores the calibration's rounds and
    entry_probes too (the pinned recall was measured AT those knobs);
    explicit values still win (r13 review finding)."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
        calibrate_beam,
    )

    idx = KnnGraphIndex.load(spark, saved)
    qt = base.filter(F.col("id") < 6).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    calibrate_beam(
        idx, qt, k=3, target_recall=0.5, rounds=4, entry_probes=3,
        persist=True, model_id="emb-v1",
    )
    idx2 = KnnGraphIndex.load(spark, saved)
    bw, rd, ep = idx2._resolve_beam("auto", None, None)
    assert (rd, ep) == (4, 3) and bw == idx2.calibration["beam_width"]
    bw2, rd2, ep2 = idx2._resolve_beam("auto", 7, None)
    assert (rd2, ep2) == (7, 3)  # explicit rounds wins, probes pinned
    assert idx2._resolve_beam(16, None, None) == (16, 3, 2)


def test_bad_query_vectors_refused(spark, base, saved):
    """NULL-element / non-finite query vectors and duplicate qids
    refuse loudly instead of silently vanishing from the output (r13
    review findings)."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    idx = KnnGraphIndex.load(spark, saved)
    nanq = base.limit(2).select(
        F.col("id").alias("qid"),
        F.expr(
            "transform(vec, (x, i) -> CASE WHEN i = 0 THEN "
            "CAST('NaN' AS FLOAT) ELSE x END)"
        ).alias("qvec"),
    )
    with pytest.raises(ValueError, match="non-finite"):
        idx.search_many(nanq, 3, beam_width=8, model_id="emb-v1")
    dupq = base.limit(2).select(
        F.lit(1).alias("qid"), F.col("vec").alias("qvec")
    )
    with pytest.raises(ValueError, match="duplicate"):
        idx.search_many(dupq, 3, beam_width=8, model_id="emb-v1")


def test_memberless_clusters_still_seed_every_query(spark, base):
    """Entry seeding ranks only ENTRY-BEARING clusters: a query whose
    nearest raw centroids are memberless must still get seeds and
    return rows (r13 review finding — previously the inner join ate
    the seed and the query silently vanished)."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )
    from custom_vector_database_spark.operators import knn as knn_ops

    small = base.filter(F.col("id") < 60)
    idx = KnnGraphIndex.fit(
        small, degree=6, iterations=1, target_rows_per_cluster=16
    )
    # graft two FAR memberless centroids that would out-rank every real
    # one for a shifted query; no entries exist for them
    far = [[1000.0] * idx.dim, [1001.0] * idx.dim]
    idx.centroids = far + idx.centroids
    idx.entries = [[c + 2, e] for c, e in idx.entries]
    q = small.limit(3).select(
        F.col("id").alias("qid"),
        F.expr(
            "transform(vec, x -> CAST(CAST(x AS DOUBLE) + 900.0 AS FLOAT))"
        ).alias("qvec"),
    )
    got = idx.search_many(q, 2, beam_width=8, rounds=1, entry_probes=2)
    assert {r["qid"] for r in got.collect()} == {0, 1, 2}


def test_upsert_replay_heals_row_exactly(spark, base, tmp_path):
    """A crashed upsert (edges landed, nodes did not) replays to the
    exact final state: no duplicate (src, dst) edge rows, nodes
    appended once (r13 review finding)."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    def fresh(path):
        KnnGraphIndex.fit(
            base.filter(F.col("id") < 300), degree=6, iterations=1,
            target_rows_per_cluster=64,
        ).save(path)
        return KnnGraphIndex.load(spark, path)

    delta = base.filter((F.col("id") >= 300) & (F.col("id") < 320))
    # learn the edges a clean upsert writes
    p1 = str(tmp_path / "clean")
    idx1 = fresh(p1)
    idx1.upsert(delta, beam_width=16, rounds=2)
    clean_edges = sorted(
        map(tuple, idx1.edges.filter(F.col("src") >= 300).collect())
    )
    # simulate the crash on a second fresh layout: append those edges,
    # skip the node append, then run the real upsert (the replay)
    p2 = str(tmp_path / "crashed")
    idx2 = fresh(p2)
    spark.createDataFrame(
        clean_edges, idx2.edges.schema
    ).write.mode("append").parquet(f"{p2}/edges")
    idx2.edges = spark.read.parquet(f"{p2}/edges")
    assert idx2.upsert(delta, beam_width=16, rounds=2) == 20
    got_edges = sorted(
        map(tuple, idx2.edges.filter(F.col("src") >= 300).collect())
    )
    assert got_edges == clean_edges  # healed row-exactly, no duplicates
    assert idx2.nodes.count() == 320


def test_filtered_search_walks_unrestricted_emits_matching(
    spark, emb, tmp_path
):
    """filter_map: the walk crosses non-matching nodes (connectivity
    preserved) but every emitted row matches the query's attribute —
    pinned against the exact per-label k-NN."""
    from custom_vector_database_spark.operators import knn as knn_ops
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    data = emb.filter(F.col("vec_id") < 300).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        (F.col("vec_id") % 3).cast("int").alias("lbl"),
    )
    path = str(tmp_path / "g_filt")
    KnnGraphIndex.fit(
        data, degree=8, iterations=1, target_rows_per_cluster=64,
        carry_cols=["lbl"],
    ).save(path)
    idx = KnnGraphIndex.load(spark, path)
    assert idx.carry_cols == ["lbl"]
    qt = data.filter(F.col("id") < 9).select(
        F.col("id").alias("qid"),
        F.col("vec").alias("qvec"),
        F.col("lbl").alias("qlbl"),
    )
    got = idx.search_many(
        qt, k=3, beam_width=48, rounds=4, entry_probes=4,
        filter_map={"lbl": "qlbl"},
    ).collect()
    # every hit matches its query's label (label ≡ id mod 3 here)
    assert got and all(r["id"] % 3 == r["qid"] % 3 for r in got)
    # recall vs the exact per-label answer at a generous beam
    exact = knn_ops.knn_join(
        data, qt, k=3, predicate=F.col("lbl") == F.col("qlbl")
    ).collect()
    ex: dict = {}
    ap: dict = {}
    for r in exact:
        ex.setdefault(r["qid"], set()).add(r["id"])
    for r in got:
        ap.setdefault(r["qid"], set()).add(r["id"])
    rec = sum(
        len(ap.get(q, set()) & s) / len(s) for q, s in ex.items()
    ) / len(ex)
    assert rec >= 0.7
    # guard: filtering on a column the layout does not carry refuses
    with pytest.raises(ValueError, match="carry_cols"):
        idx.search_many(qt, 3, beam_width=8, filter_map={"nope": "qlbl"})


def test_autopilot_rebuild_and_beam_calibrate(spark, base, tmp_path):
    """The graph layout joins the maintenance autopilot: a drifted
    recent slice plans the rebuild; the calibrate row dispatches to
    calibrate_beam (never the vector/MaxSim flavors), and one execute
    run refreshes the layout AND pins beam_width — resolvable via
    beam_width="auto" on the reloaded handle."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )
    from custom_vector_database_spark.operators.maintenance import (
        run_maintenance,
    )

    small = base.filter(F.col("id") < 200)
    path = str(tmp_path / "g_auto")
    KnnGraphIndex.fit(
        small, degree=6, iterations=1, target_rows_per_cluster=64
    ).save(path)
    idx = KnnGraphIndex.load(spark, path)
    drift = small.limit(32).select(
        "id",
        F.expr(
            "transform(vec, x -> CAST(CAST(x AS DOUBLE) + 5.0 AS FLOAT))"
        ).alias("vec"),
    )
    qt = small.filter(F.col("id") < 8).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    ent = {
        "name": "g",
        "index": idx,
        "build_df": small,
        "recent_df": drift,
        "path": path,
        "refit": lambda: KnnGraphIndex.fit(
            small, degree=6, iterations=1, target_rows_per_cluster=64
        ),
        # NOTE: unlike IVF's full probe, a full-width beam is NOT brute
        # force — reachability is bounded by rounds and the digraph's
        # in-edges — so the test certifies DISPATCH + pin round-trip at
        # a modest deterministic target with generous walk knobs, not a
        # high-recall contract (that lives in the dedicated recall
        # tests)
        "calibrate": {"queries": qt, "k": 3, "target_recall": 0.5,
                      "rounds": 5, "entry_probes": 6},
    }
    plan, executed = run_maintenance(spark, layouts=[ent], execute=True)
    actions = {(r["target"], r["action"]) for r in executed}
    assert ("g", "rebuild") in actions and ("g", "calibrate") in actions
    cal = next(r for r in executed if r["action"] == "calibrate")
    assert "beam_width" in cal and cal["recall"] >= 0.5
    re = KnnGraphIndex.load(spark, path)
    assert re.calibration["beam_width"] == cal["beam_width"]
    hits = re.search_many(qt, 3, beam_width="auto").collect()
    assert len({r["qid"] for r in hits}) == 8


def test_delete_tombstone_compact_lifecycle(spark, base, tmp_path):
    """The graph joins the tombstone contract: delete() hides nodes
    from search immediately (while still ROUTING through them),
    upsert refuses tombstoned ids, compact physically drops nodes +
    touching edges and re-picks entries, and the freed id upserts
    cleanly afterwards."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    small = base.filter(F.col("id") < 200)
    path = str(tmp_path / "g_del")
    KnnGraphIndex.fit(
        small, degree=6, iterations=1, target_rows_per_cluster=64
    ).save(path)
    idx = KnnGraphIndex.load(spark, path)

    # pick the victim FROM an observed result: a kNN digraph node can
    # genuinely have zero in-edges (unreachable except as an entry), so
    # "member id X is returned" is not a graph invariant — but "the
    # observed top-1, once deleted, yields the observed top-2" is
    q = [float(x) for x in small.filter(F.col("id") == 7).first()["vec"]]
    # search output has no orderBy contract — sort client-side
    top0 = sorted(
        idx.search(q, 2, beam_width=32, rounds=3).collect(),
        key=lambda r: (r["dist_sq"], r["id"]),
    )
    victim, runner_up = top0[0]["id"], top0[1]["id"]
    other = 199 if runner_up != 199 else 198
    assert idx.delete([victim, other]) == 2
    assert idx.delete([victim]) == 0  # already tombstoned counts zero
    d = idx.describe()
    assert d["n_tombstones"] == 2 and d["n_live_nodes"] == 198
    top = idx.search(q, 1, beam_width=32, rounds=3).first()
    assert top["id"] == runner_up  # victim hidden, same walk otherwise
    # a reload sees the sidecar
    idx = KnnGraphIndex.load(spark, path)
    assert idx._tombstone_count() == 2
    # upsert of a tombstoned id refuses with the compact remedy
    deltav = small.filter(F.col("id") == victim)
    with pytest.raises(ValueError, match="compact"):
        idx.upsert(deltav)
    stats = idx.compact()
    assert stats["n_tombstones_dropped"] == 2
    assert stats["n_nodes"] == 198
    assert idx.edges.filter(
        (F.col("src").isin(victim, other))
        | (F.col("dst").isin(victim, other))
    ).count() == 0
    # entries re-picked from live nodes only
    assert all(e not in (victim, other) for _c, e in idx.entries)
    # the freed id is insertable again (its OUT-edges land; in-edge
    # reachability returns at the next rebuild — the documented
    # append-only upsert asymmetry)
    assert idx.upsert(deltav, beam_width=16, rounds=2) == 1
    assert idx.nodes.count() == 199
    assert idx.edges.filter(F.col("src") == victim).count() > 0


def test_rounds_zero_scores_entries_only(spark, base, saved):
    """rounds=0 degenerates to scoring the entry seeds — still valid
    output (≤ k per query), the bounded floor of the contract."""
    from custom_vector_database_spark.operators.graph_ann import (
        KnnGraphIndex,
    )

    idx = KnnGraphIndex.load(spark, saved)
    qt = base.limit(4).select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    got = idx.search_many(qt, 3, beam_width=8, rounds=0,
                          entry_probes=2, model_id="emb-v1").collect()
    per_q: dict = {}
    for r in got:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
    assert per_q and max(per_q.values()) <= 3
