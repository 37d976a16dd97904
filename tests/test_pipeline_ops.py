"""Semantic tests for the batch-2 pipeline operators (bloom join pruning,
BM25 ranking, fuzzy ER, fingerprints, time decay). Oracle parity for their
registered queries is covered by test_oracle_parity; these assert the
operator-level contracts the oracle can't see (no false negatives, pruning
actually prunes, fingerprints react to single-row changes, ...)."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_vector_database_spark.operators import bloom as bl
from custom_vector_database_spark.operators import ranking as rk
from custom_vector_database_spark.queries_registry import QUERIES


def test_bloom_no_false_negatives_and_prunes(spark):
    build = spark.range(0, 100).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 100_000).select(F.col("id").alias("k"))
    bf = bl.bloom_build(build, "k", num_bits=1 << 14)
    kept = bl.bloom_prune(probe, "k", bf)
    kept_set = {r["k"] for r in kept.collect()}
    # every true member survives
    assert {i * 7 for i in range(100)} <= kept_set
    # and the filter actually prunes the ~99.9% non-members (fp rate small)
    assert len(kept_set) < 5_000


def test_bloom_words_table_is_bounded(spark):
    build = spark.range(0, 10_000).select(F.col("id").alias("k"))
    bf = bl.bloom_build(build, "k", num_bits=1 << 10)
    assert bf.words.count() <= (1 << 10) // 64
    assert (bf.num_bits, bf.num_hashes) == (1 << 10, 2)


def test_bm25_ranks_term_density(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),
            (2, "spark is here and spark again with padding padding padding"),
            (3, "nothing relevant at all"),
            (4, "one spark mention"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in rk.bm25(docs, ["spark"]).collect()}
    assert 3 not in got  # no matching term -> absent
    assert got[1] > got[2] > 0  # denser + shorter doc wins
    assert got[4] > 0


def test_bm25_multi_term_sums_per_term_scores(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "beta")],
        "doc_id long, text string",
    )
    both = {r["doc_id"]: r["score"] for r in rk.bm25(docs, ["alpha", "beta"]).collect()}
    assert both[1] > both[2] and both[1] > both[3]


def test_fuzzy_pairs_blocked_and_symmetric_free(spark, sf_smoke):
    rows = QUERIES["fuzzy_part_name_pairs"](spark, sf_smoke).collect()
    assert rows, "expected at least one near-match pair"
    for r in rows:
        assert r["name_a"] < r["name_b"]  # each unordered pair exactly once
        assert r["lev"] <= 4
        assert r["name_a"].split(" ")[-1] == r["name_b"].split(" ")[-1]


def test_fingerprint_detects_single_row_change(spark):
    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("v"))
    serial = F.concat_ws("|", "id", "v")
    h = F.conv(F.substring(F.md5(serial), 1, 15), 16, 10).cast("long")

    def fp(d):
        return d.select(h.alias("h")).agg(F.bit_xor("h")).collect()[0][0]

    base = fp(df)
    # partition/order independence
    assert fp(df.repartition(13)) == base
    assert fp(df.orderBy(F.desc("id"))) == base
    # single-value change flips the fingerprint
    changed = df.withColumn(
        "v", F.when(F.col("id") == 500, F.lit(99)).otherwise(F.col("v"))
    )
    assert fp(changed) != base


def test_time_decay_weights_recent_orders_higher(spark, sf_smoke):
    out = QUERIES["time_decayed_revenue"](spark, sf_smoke)
    rows = out.collect()
    assert rows and len(rows) <= 100
    # decayed revenue can never exceed the undecayed total
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    totals = {
        r["o_custkey"]: float(r["t"])
        for r in orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t"))
        .collect()
    }
    for r in rows:
        assert r["decayed_revenue"] <= totals[r["o_custkey"]] + 1e-9
        assert r["decayed_revenue"] > 0


def test_stream_upsert_latest_multi_batch(spark, sf_smoke, tmp_path):
    """Force ≥2 micro-batches (two source files, maxFilesPerTrigger=1) so
    the merge-with-existing-target branch actually executes; per-batch
    merging must equal one argmax over the whole stream."""
    from custom_vector_database_spark.queries.events_queries import load_events
    from custom_vector_database_spark.streaming.stream_ops import stream_upsert_latest

    ev = load_events(spark, sf_smoke).select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    src = str(tmp_path / "src")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    target_dir = str(tmp_path / "tgt")
    got = stream_upsert_latest(spark, stream, target_dir)

    offsets = list((tmp_path / "tgt" / "ckpt" / "offsets").iterdir())
    assert len(offsets) >= 2, "expected at least two micro-batches"

    expected = {
        (r["user_id"], r["event_id"])
        for r in ev.groupBy("user_id")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
        .collect()
    }
    assert {(r["user_id"], r["event_id"]) for r in got.collect()} == expected
    # exactly one row per user
    assert got.count() == got.select("user_id").distinct().count()


def test_snapshot_diff_classifies_changes(spark):
    from custom_vector_database_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {2: "UPDATE", 3: "DELETE", 4: "INSERT"}
    # UPDATE/INSERT carry the new payload; DELETE carries nulls
    rows = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert rows[2]["s"] == "B" and rows[4]["v"] == 40.0
    assert rows[3]["s"] is None and rows[3]["v"] is None


def test_snapshot_diff_distinguishes_null_from_empty(spark):
    from custom_vector_database_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, s string")
    new = spark.createDataFrame([(1, "")], "k long, s string")
    got = snapshot_diff(old, new, "k").collect()
    assert len(got) == 1 and got[0]["change_type"] == "UPDATE"


def test_merge_agg_delta_equals_full_recompute(spark):
    from custom_vector_database_spark.operators.cdc import merge_agg_delta

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v")
    )
    def agg(d):
        return d.groupBy("g").agg(
            F.sum("v").alias("total"), F.count("*").alias("n"), F.max("v").alias("mx")
        )

    stored = agg(df.filter(F.col("v") < 600))
    delta = agg(df.filter(F.col("v") >= 600))
    merged = merge_agg_delta(
        stored, delta, ["g"], {"total": "sum", "n": "count", "mx": "max"}
    )
    full = {r["g"]: (r["total"], r["n"], r["mx"]) for r in agg(df).collect()}
    got = {r["g"]: (r["total"], r["n"], r["mx"]) for r in merged.collect()}
    assert got == full

    import pytest as _pytest
    with _pytest.raises(ValueError):
        merge_agg_delta(stored, delta, ["g"], {"total": "avg"})


def test_rolling_hll_within_error_of_exact(spark, sf_smoke):
    from custom_vector_database_spark.queries.events_queries import (
        load_events,
        rolling_active_users_hll,
    )

    ev = load_events(spark, sf_smoke)
    exact = {
        r["day"]: r["active_users"]
        for r in QUERIES["rolling_7d_active_users"](spark, sf_smoke).collect()
    }
    approx = {r["day"]: r["active_users"] for r in rolling_active_users_hll(ev).collect()}
    assert set(approx) == set(exact)
    for day, est in approx.items():
        # HLL default lgConfigK=12 → ~1.6% standard error; allow 5% + slack 2
        assert abs(est - exact[day]) <= max(2, 0.05 * exact[day]), (day, est, exact[day])


def test_merge_upsert_broadcast_path_equivalent_and_mapside(spark):
    from custom_vector_database_spark.operators.merge import merge_upsert

    target = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v"), F.lit("old").alias("s")
    )
    source = spark.createDataFrame(
        [(5, 99, "upd"), (10_500, 1, "new"), (7, None, "half")],
        "k long, v long, s string",
    )
    base = {(r["k"], r["v"], r["s"]) for r in merge_upsert(target, source, "k").collect()}
    fast = merge_upsert(target, source, "k", broadcast_source=True)
    assert {(r["k"], r["v"], r["s"]) for r in fast.collect()} == base
    # null source column keeps the target value (coalesce semantics)
    row7 = {r["k"]: (r["v"], r["s"]) for r in fast.collect()}[7]
    assert row7 == (2, "half")
    # the wide target rows go through a broadcast join, not a full-outer SMJ
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "FullOuter" not in plan


def test_bloom_geometry_travels_with_filter(spark):
    from custom_vector_database_spark.operators import bloom as bl

    build = spark.range(0, 50).select((F.col("id") * 3).alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    # non-default geometry: probe must still be false-negative-free without
    # the caller restating num_bits/num_hashes
    bf = bl.bloom_build(build, "k", num_bits=1 << 12, num_hashes=3)
    kept = {r["k"] for r in bl.bloom_prune(probe, "k", bf).collect()}
    assert {i * 3 for i in range(50)} <= kept


def test_recover_swap_rolls_forward_and_back(spark, tmp_path):
    import os

    from custom_vector_database_spark.streaming.stream_ops import recover_swap

    def mk(dirname, marker=True):
        d = tmp_path / dirname
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
        if marker:
            (d / "_SUCCESS").write_bytes(b"")
        return d

    # crash between rename(data, old) and rename(tmp, data), tmp complete
    mk("data_old")
    mk("data_tmp")
    recover_swap(str(tmp_path))
    assert (tmp_path / "data" / "_SUCCESS").exists()  # rolled forward
    assert not (tmp_path / "data_old").exists()
    assert not (tmp_path / "data_tmp").exists()

    # crash with an INCOMPLETE tmp (no _SUCCESS): roll back to old state
    import shutil

    shutil.rmtree(tmp_path / "data")
    mk("data_old")
    mk("data_tmp", marker=False)
    recover_swap(str(tmp_path))
    assert (tmp_path / "data").exists()  # rolled back
    assert not (tmp_path / "data_tmp").exists()

    # healthy state is left alone (stale tmp cleared)
    mk("data_tmp", marker=False)
    recover_swap(str(tmp_path))
    assert (tmp_path / "data").exists() and not (tmp_path / "data_tmp").exists()


def test_bm25_rejects_empty_terms(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        rk.bm25(docs, [])


def test_salted_join_equals_plain_join_and_spreads_keys(spark):
    from custom_vector_database_spark.operators.skew import salted_join

    # one pathological heavy hitter: 90% of facts share key 7
    fact = spark.range(0, 20_000).select(
        F.col("id").alias("rid"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
    )
    dim = spark.range(0, 100).select(F.col("id").alias("dk"), (F.col("id") * 2).alias("attr"))
    plain = fact.join(dim, fact["k"] == dim["dk"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("attr").alias("s")
    )
    salted = salted_join(fact, dim, "k", "dk", salt_src="rid", salt=8).groupBy(
        "k"
    ).agg(F.count("*").alias("n"), F.sum("attr").alias("s"))
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}
    # the salt actually splits the hot key across sub-partitions
    spread = (
        fact.filter(F.col("k") == 7)
        .select(F.pmod(F.xxhash64("rid"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert spread == 8


def test_connected_components_pointer_jumping_beats_diameter(spark):
    """A 120-node path (diameter 119) exceeds plain hash-min's 25-round
    budget; the default escalation policy flips pointer jumping on after
    4 unconverged rounds (graph.escalate_after default) and still
    finishes inside the budget — and labels
    every node with the path's minimum id."""
    import pytest as _pytest

    from custom_vector_database_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "id_a long, id_b long"
    )
    # escalation disabled -> plain hash-min needs 119 rounds and must raise
    with _pytest.raises(RuntimeError):
        connected_components(chain, max_iter=25, escalate_after=25)
    # default policy: 4 plain rounds then pointer jumping, well under 25
    esc = connected_components(chain, max_iter=25)
    esc_labels = {r["node"]: r["cluster_id"] for r in esc.collect()}
    assert len(esc_labels) == 120 and set(esc_labels.values()) == {0}
    got = connected_components(chain, max_iter=10, accelerate=True)
    labels = {r["node"]: r["cluster_id"] for r in got.collect()}
    assert len(labels) == 120
    assert set(labels.values()) == {0}
    # acceleration must not disturb ordinary clump graphs
    clumps = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)], "id_a long, id_b long"
    )
    got2 = {
        r["node"]: r["cluster_id"]
        for r in connected_components(clumps, accelerate=True).collect()
    }
    assert got2 == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_token_chunks_overlap_and_coverage(spark):
    from custom_vector_database_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(60))), (2, "only three tokens"), (3, "")],
        "doc_id long, text string",
    )
    out = docs.select(
        "doc_id", F.posexplode(tx.token_chunks("text", size=32, overlap=8)).alias("i", "c")
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["c"]["chunk"].split(" "))
    # 60 tokens, stride 24 -> 3 chunks; consecutive chunks share 8 tokens
    chunks = by_doc[1]
    assert len(chunks) == 3
    assert chunks[0][-8:] == chunks[1][:8]
    assert [len(c) for c in chunks] == [32, 32, 12]
    # full coverage, in order, no token lost
    reassembled = chunks[0] + chunks[1][8:] + chunks[2][8:]
    assert reassembled == [f"t{i}" for i in range(60)]
    # short doc -> single short chunk; empty doc -> no chunks
    assert [len(c) for c in by_doc[2]] == [3]
    assert 3 not in by_doc
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tx.token_chunks("text", size=8, overlap=8)

    # the overcount region: ntok mod stride in [1, overlap] must NOT emit
    # a final chunk that's a pure suffix of the previous one, and NULL
    # text must emit nothing (oracle parity)
    edge = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(32))),   # exactly one window
         (2, " ".join(f"t{i}" for i in range(50))),   # 50 mod 24 = 2 <= 8
         (3, None)],
        "doc_id long, text string",
    )
    got = edge.select(
        "doc_id", F.posexplode(tx.token_chunks("text", size=32, overlap=8)).alias("i", "c")
    ).collect()
    counts = {}
    for r in got:
        counts.setdefault(r["doc_id"], []).append(r["c"]["n_tokens"])
    assert counts[1] == [32]          # not [32, 8]
    assert counts[2] == [32, 26]      # chunk 2 = tokens 25..50, 18 new
    assert 3 not in counts


def test_salted_join_rejects_dim_preserving_outer(spark):
    import pytest as _pytest

    from custom_vector_database_spark.operators.skew import salted_join

    fact = spark.range(10).select(F.col("id").alias("rid"), (F.col("id") % 3).alias("k"))
    dim = spark.range(5).select(F.col("id").alias("dk"))
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError):
            salted_join(fact, dim, "k", "dk", salt_src="rid", how=how)
    # left join is fact-preserving and stays exact
    got = salted_join(fact, dim, "k", "dk", salt_src="rid", salt=4, how="left")
    assert got.count() == 10


def test_pagerank_star_center_ranks_highest(spark):
    from custom_vector_database_spark.operators.graph import pagerank

    # star: node 0 connected to 1..8 -> center collects mass
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "id_a long, id_b long"
    )
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert set(pr) == set(range(9))
    leaves = [pr[i] for i in range(1, 9)]
    assert pr[0] > max(leaves)
    assert len(set(leaves)) == 1  # symmetric leaves tie exactly (integer math)
    # total mass stays within truncation loss of the scale
    assert 0.9 * 10**12 < sum(pr.values()) <= 10**12


def test_pagerank_deterministic_across_partitioning(spark):
    from custom_vector_database_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 17) for i in range(17)], "id_a long, id_b long"
    )
    a = sorted((r["node"], r["rank"]) for r in pagerank(edges, iters=4).collect())
    b = sorted(
        (r["node"], r["rank"])
        for r in pagerank(edges.repartition(5), iters=4).collect()
    )
    assert a == b


def test_pagerank_zero_iters_is_uniform(spark):
    from custom_vector_database_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iters=0).collect()}
    assert set(pr.values()) == {10**12 // 3}


def test_bm25_batch_matches_single_query(spark, sf_oracle):
    from custom_vector_database_spark.operators import ranking as rk
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    qdefs = [(0, ["spark", "join"]), (1, ["filter", "scan", "table"])]
    queries = spark.createDataFrame(qdefs, "qid int, terms array<string>")
    batch = rk.bm25_batch(docs, queries, k=5, max_terms=3)
    got = {
        (r["qid"], r["rk"]): (r["doc_id"], r["score"])
        for r in batch.collect()
    }
    for qid, terms in qdefs:
        single = (
            rk.bm25(docs, terms)
            .select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), "doc_id")
            .limit(5)
            .collect()
        )
        for rank, row in enumerate(single, start=1):
            assert got[(qid, rank)] == (row["doc_id"], row["score"]), (qid, rank)


def test_bm25_batch_validates(spark, sf_oracle):
    import pytest as _pytest

    from custom_vector_database_spark.operators import ranking as rk

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    empty_q = spark.createDataFrame([(0, [])], "qid int, terms array<string>")
    with _pytest.raises(ValueError):
        rk.bm25_batch(docs, empty_q)
    # ONE empty query among valid ones must also raise, not silently
    # vanish from the output
    mixed_q = spark.createDataFrame(
        [(0, []), (1, ["spark"])], "qid int, terms array<string>"
    )
    with _pytest.raises(ValueError):
        rk.bm25_batch(docs, mixed_q)
    with _pytest.raises(ValueError):
        rk.bm25_batch(
            docs,
            spark.createDataFrame([(0, ["spark"])], "qid int, terms array<string>"),
            max_queries=0,
        )
    wide_q = spark.createDataFrame(
        [(0, ["a", "b", "c", "d"])], "qid int, terms array<string>"
    )
    with _pytest.raises(ValueError):
        rk.bm25_batch(docs, wide_q, max_terms=3)
    # duplicate qids would silently merge two queries' terms into one
    # ranking group via the per-position fixed-order sum
    dup_q = spark.createDataFrame(
        [(0, ["spark"]), (0, ["join"])], "qid int, terms array<string>"
    )
    with _pytest.raises(ValueError, match="duplicate qid"):
        rk.bm25_batch(docs, dup_q)


def test_rrf_fuse_combines_and_handles_absent_docs(spark):
    import pytest

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rk.rrf_fuse([a, b], k=60.0).collect()}
    assert set(got) == {1, 2, 3}
    # doc 2 appears in both lists -> two contributions; best fused score
    assert got[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    # absent side contributes 0 and surfaces a NULL rank
    assert got[1]["rrf_score"] == round(1 / 61, 6) and got[1]["rank_1"] is None
    assert got[3]["rrf_score"] == round(1 / 62, 6) and got[3]["rank_0"] is None
    # ordering: doc 2 first (two lists beat one)
    top = rk.rrf_fuse([a, b], topk=1).collect()
    assert top[0]["doc_id"] == 2
    with pytest.raises(ValueError):
        rk.rrf_fuse([])
    with pytest.raises(ValueError):
        rk.rrf_fuse([a], k=0)
