"""Property-based checks (hypothesis) for the scalar kernels: the Catalyst
expressions must agree with straightforward Python/numpy reference
implementations on arbitrary inputs, not just fixture data.

Each property generates a BATCH of rows per example (one Spark job per
example, not per row) to keep runtime sane."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from custom_vector_database_spark.functions.vector import (
    cosine_similarity,
    l2_squared,
    parse_vector,
)
from custom_vector_database_spark.operators.text import shingles, token_count, tokenize

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)
vec8 = st.lists(finite_floats, min_size=8, max_size=8)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(vec8, vec8), min_size=1, max_size=8))
def test_l2_squared_matches_numpy(spark, pairs):
    df = spark.createDataFrame(
        [(list(a), list(b)) for a, b in pairs], "a ARRAY<FLOAT>, b ARRAY<FLOAT>"
    )
    got = [r[0] for r in df.select(l2_squared("a", "b")).collect()]
    for (a, b), g in zip(pairs, got):
        a32 = np.array(a, dtype=np.float32).astype(np.float64)
        b32 = np.array(b, dtype=np.float32).astype(np.float64)
        expected = float(((a32 - b32) ** 2).sum())
        assert math.isclose(g, expected, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(vec8, vec8), min_size=1, max_size=8))
def test_cosine_similarity_bounded_and_matches(spark, pairs):
    df = spark.createDataFrame(
        [(list(a), list(b)) for a, b in pairs], "a ARRAY<FLOAT>, b ARRAY<FLOAT>"
    )
    got = [r[0] for r in df.select(cosine_similarity("a", "b")).collect()]
    for (a, b), g in zip(pairs, got):
        a32 = np.array(a, dtype=np.float32).astype(np.float64)
        b32 = np.array(b, dtype=np.float32).astype(np.float64)
        na, nb = np.sqrt((a32**2).sum()), np.sqrt((b32**2).sum())
        if na * nb == 0:
            assert g is None  # zero-norm contract: NULL, never NaN
        else:
            expected = float(a32 @ b32) / (na * nb)
            assert math.isclose(g, expected, rel_tol=1e-6, abs_tol=1e-6)
            assert -1.0 - 1e-6 <= g <= 1.0 + 1e-6


@settings(max_examples=10, deadline=None)
@given(st.lists(vec8, min_size=1, max_size=8))
def test_parse_vector_roundtrip(spark, vecs):
    df = spark.createDataFrame([(list(v),) for v in vecs], "v ARRAY<FLOAT>")
    back = df.select(
        F.col("v"), parse_vector(F.array_join("v", ",")).alias("p")
    ).collect()
    for r in back:
        assert r["p"] == r["v"]  # float32 → shortest-repr string → float32 exact


texts = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs"), max_codepoint=0x7F),
    max_size=200,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(texts, min_size=1, max_size=10))
def test_tokenize_and_shingle_invariants(spark, docs):
    df = spark.createDataFrame([(t,) for t in docs], "t STRING")
    rows = df.select(
        tokenize("t").alias("toks"),
        token_count("t").alias("n"),
        shingles("t", 3).alias("sh"),
    ).collect()
    for r in rows:
        assert r["n"] == len(r["toks"])
        assert all(tok for tok in r["toks"])  # never empty tokens
        # shingle count bounded by token count; empty when < 3 tokens
        if r["n"] < 3:
            assert r["sh"] == []
        else:
            assert 1 <= len(r["sh"]) <= r["n"] - 2
            assert all(len(s.split(" ")) == 3 for s in r["sh"])


def test_knn_join_broadcast_guard(spark):
    from custom_vector_database_spark.operators.knn import knn_join

    data = spark.createDataFrame([(1, [0.0, 0.0])], "id LONG, vec ARRAY<FLOAT>")
    queries = spark.range(100).selectExpr(
        "id as qid", "array(cast(id as float), 0.0F) as qvec"
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        knn_join(data, queries, k=1, max_query_rows=10)


def test_approx_percentile_rank_error_bound(spark):
    """The GK-sketch percentiles must land within the documented rank-error
    bound (1/accuracy) of the exact quantile — checked by computing the true
    rank of each approximate value at sf0.01. The registered query now emits
    bound-check booleans (so the driver can hash-match it); those must all
    come back TRUE too."""
    from custom_vector_database_spark import queries_registry as reg

    sf = "/root/testdata/sf0.01"
    acc = 10_000
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    approx = {
        r["status"]: r
        for r in orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            *[
                F.approx_percentile("o_totalprice", F.lit(q), F.lit(acc)).alias(c)
                for c, q in [("ap50", 0.5), ("ap90", 0.9), ("ap99", 0.99)]
            ]
        )
        .collect()
    }
    for status, row in approx.items():
        grp = orders.filter(F.col("o_orderstatus") == status)
        n = grp.count()
        for col, q in [("ap50", 0.5), ("ap90", 0.9), ("ap99", 0.99)]:
            rank = grp.filter(F.col("o_totalprice") <= row[col]).count()
            # rank error tolerance: 1/accuracy of n, plus 1 for discreteness
            assert abs(rank - q * n) <= n / acc + 1, (status, col)

    for r in reg.QUERIES["approx_percentiles_order_price"](spark, sf).collect():
        assert r["ap50_ok"] and r["ap90_ok"] and r["ap99_ok"], r


def test_parse_vector_rejects_unparseable_floats(spark):
    """Reference parseVector throws on bad tokens (main.cpp:14-16); the
    cast's silent NULL elements must not flow through."""
    from custom_vector_database_spark.functions.vector import parse_vector

    df = spark.createDataFrame([("1.0,bogus,3.0",)], "s STRING")
    # ANSI mode (Spark 4 default) errors in the cast itself
    # (CAST_INVALID_INPUT); with ANSI off the explicit null-element guard
    # fires ("unparseable") — either way it's a hard error, never a
    # NULL-holed vector
    with pytest.raises(Exception, match="unparseable|CAST_INVALID_INPUT"):
        df.select(parse_vector("s", dim=3).alias("v")).collect()
    ok = spark.createDataFrame([("1.0,2.0,3.0",)], "s STRING")
    assert ok.select(parse_vector("s", dim=3).alias("v")).first()["v"] == [1.0, 2.0, 3.0]


def test_events_ts_loads_as_utc_timestamp(spark, sf_smoke):
    """events.parquet stores naive TIMESTAMP(MICROS); the loader must yield
    session-tz (UTC) TIMESTAMP so unix_micros matches DuckDB's epoch_us."""
    from custom_vector_database_spark.queries.events_queries import load_events

    ev = load_events(spark, sf_smoke)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    import duckdb

    first = ev.select(F.unix_micros("ts").alias("us")).orderBy("us").first()["us"]
    duck = duckdb.sql(
        f"SELECT MIN(epoch_us(ts)) FROM read_parquet('{sf_smoke}/events.parquet')"
    ).fetchone()[0]
    assert first == duck


def test_cli_arity_errors_before_spark():
    from custom_vector_database_spark.cli import main

    assert main(["/tmp/nope", "init"]) == 1          # missing dim
    assert main(["/tmp/nope", "search", "5"]) == 1   # missing query vector
    assert main(["/tmp/nope", "update", "1"]) == 1   # missing vector


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_matches_union_find(spark, edge_list):
    """Hash-min label propagation must equal a plain union-find on
    arbitrary small graphs (cycles, chains, self-merging clumps)."""
    from custom_vector_database_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    expected = {n: find(n) for n in parent}

    edges = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == expected


def test_stratified_sample_deterministic_and_rate_bounded(spark):
    """md5-threshold stratified sampling: identical across reruns AND
    repartitionings (row-content hash, not position), rates near the
    requested fractions, no rows from unlisted strata."""
    from custom_vector_database_spark.queries.breadth_queries import (
        _STRATA_THRESHOLDS,
        q_stratified_sample_orders,
    )

    sf = "/root/testdata/sf0.01"
    a = {r["status"]: r["n_sampled"] for r in
         q_stratified_sample_orders(spark, sf).collect()}
    b = {r["status"]: r["n_sampled"] for r in
         q_stratified_sample_orders(spark, sf).collect()}
    assert a == b

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    totals = {r["o_orderstatus"]: r["count"] for r in
              orders.groupBy("o_orderstatus").count().collect()}
    fractions = {"F": 0.2, "O": 0.1, "P": 0.5}
    assert set(a) <= set(_STRATA_THRESHOLDS)
    for status, frac in fractions.items():
        rate = a.get(status, 0) / totals[status]
        assert abs(rate - frac) < 0.05, (status, rate)


# ---------------------------------------------------------------------------
# Curation-operator properties: the budget/packing/rank arithmetic must
# agree with a straightforward Python reference on arbitrary inputs.
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=60), min_size=2, max_size=4),
    weights=st.lists(st.integers(min_value=1, max_value=5), min_size=2, max_size=4),
)
def test_mixture_quota_matches_reference(spark, counts, weights):
    from custom_vector_database_spark.operators.curation import mixture_resample

    k = min(len(counts), len(weights))
    counts, weights = counts[:k], weights[:k]
    strata = [f"s{i}" for i in range(k)]
    rows, nid = [], 0
    for s, c in zip(strata, counts):
        for _ in range(c):
            rows.append((nid, s))
            nid += 1
    wmap = dict(zip(strata, weights))
    df = spark.createDataFrame(rows or [(0, "s0")], "doc_id long, source string")
    if not rows:
        df = df.limit(0)
    sel = mixture_resample(df, "source", "doc_id", wmap)
    got = {s: 0 for s in strata}
    for r in sel.collect():
        got[r["source"]] += 1
    # reference: N = min_s floor(cnt_s*W/w_s); take_s = floor(w_s*N/W)
    W = sum(weights)
    N = min(c * W // w for c, w in zip(counts, weights))
    for s, w in zip(strata, weights):
        assert got[s] == w * N // W, (counts, weights, got)


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12),
    budget=st.integers(min_value=1, max_value=64),
)
def test_pack_sequences_matches_reference(spark, toks, budget):
    from custom_vector_database_spark.operators.curation import pack_sequences

    rows = [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"])
        for r in pack_sequences(df, "shard", "doc_id", budget=budget).collect()
    }
    cum = 0
    for i, n in enumerate(toks):
        assert got[i] == (n, cum // budget), (toks, budget, got)
        cum += n


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    ),
)
def test_pagerank_matches_reference(spark, edges):
    from custom_vector_database_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    # Python reference of the exact integer recurrence
    und = set()
    for a, b in edges:
        und.add((a, b)); und.add((b, a))
    nodes = {a for a, _ in und}
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    scale, n = 10**12, len(nodes)
    base = 15 * scale // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(3):
        nxt = {v: base for v in nodes}
        for a, b in und:
            nxt[b] += 85 * r[a] // (100 * deg[a])
        r = nxt
    assert got == r, (edges, got, r)


@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=30), min_size=1, max_size=8,
            unique=True,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=15, deadline=None)
def test_rrf_fuse_matches_python_reference(spark, rankings):
    """rrf_fuse == the textbook formula for arbitrary rank lists: for
    every doc, score = Σ_i 1/(60 + rank_i) over the lists containing it,
    regardless of list sizes or overlaps."""
    from custom_vector_database_spark.operators.ranking import rrf_fuse
    dfs = []
    expect: dict[int, float] = {}
    for ids in rankings:
        rows = [(int(d), r + 1) for r, d in enumerate(ids)]
        dfs.append(spark.createDataFrame(rows, "doc_id long, rank int"))
        for d, r in rows:
            expect[d] = expect.get(d, 0.0) + 1.0 / (60.0 + r)
    got = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse(dfs).collect()}
    assert set(got) == set(expect)
    for d, s in expect.items():
        assert got[d] == round(s, 6), d


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=6,
    )
)
def test_duplicate_spans_matches_bruteforce(spark, docs):
    """duplicate_spans must agree with a direct Python re-implementation
    (mark every token covered by an n-gram window appearing in >= 2
    distinct docs, emit maximal runs of marked tokens) on arbitrary tiny
    corpora — a 1-letter alphabet makes collisions and long overlapping
    runs common, the regime where island-merge bugs hide."""
    from custom_vector_database_spark.operators.text import duplicate_spans

    n = 3
    toks = [d.split() if d else [] for d in docs]
    grams: dict[str, set[int]] = {}
    for i, ts in enumerate(toks):
        for p in range(len(ts) - n + 1):
            grams.setdefault(" ".join(ts[p : p + n]), set()).add(i)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    expected = set()
    for i, ts in enumerate(toks):
        marked = set()
        for p in range(len(ts) - n + 1):
            if " ".join(ts[p : p + n]) in dup:
                marked.update(range(p + 1, p + n + 1))  # 1-based tokens
        run: list[int] = []
        for t in sorted(marked) + [None]:
            if run and (t is None or t != run[-1] + 1):
                expected.add((i, run[0], run[-1], run[-1] - run[0] + 1))
                run = []
            if t is not None:
                run.append(t)
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(df, n=n, min_docs=2).collect()
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(
                st.floats(
                    min_value=-4, max_value=4,
                    allow_nan=False, allow_infinity=False,
                ),
                min_size=4, max_size=4,
            ),
            st.integers(min_value=0, max_value=1),  # cluster
        ),
        min_size=1,
        max_size=12,
    )
)
def test_semantic_prune_greedy_matches_bruteforce(spark, rows):
    """semantic_prune_greedy must agree with a direct Python greedy scan
    (ascending id; keep iff no KEPT lower-id cluster-mate within thr;
    zero-norm rows always kept, never droppers) on arbitrary tiny
    clusters — low-dim vectors in a narrow range make near-threshold
    cosine pairs and zero norms common."""
    from custom_vector_database_spark.operators.dedup import semantic_prune_greedy

    thr = 0.3
    expected = set()
    for c in {cl for _v, cl in rows}:
        kept_vecs: list[tuple[int, np.ndarray]] = []
        for i, (v, cl) in enumerate(rows):
            if cl != c:
                continue
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            drop = False
            if n > 0:
                for _j, u in kept_vecs:
                    if round(1.0 - float(x @ u) / n, 6) <= thr:
                        drop = True
                        break
            if not drop:
                expected.add(i)
                if n > 0:
                    kept_vecs.append((i, x / n))
    df = spark.createDataFrame(
        [(i, v, cl) for i, (v, cl) in enumerate(rows)],
        "vec_id long, embedding array<double>, label int",
    )
    got = {
        r["vec_id"]
        for r in semantic_prune_greedy(
            df, cluster_col="label", max_cos_dist=thr
        ).collect()
    }
    assert got == expected
