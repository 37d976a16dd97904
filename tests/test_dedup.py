"""Dedup semantics with PLANTED duplicates: each family must collapse known
near-copies (and exact copies) while leaving unrelated documents alone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.operators import dedup as dd

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and the optimizer prunes columns "
    "from the parquet scan before the aggregation runs"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one-token edit
UNRELATED = (
    "completely different content about databases indexes vectors embeddings "
    "similarity search approximate neighbors hashing buckets bands signatures "
    "jaccard cosine euclidean manhattan distances metrics"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),          # exact duplicate of 0
        (2, NEAR),          # near duplicate of 0
        (3, UNRELATED),
        (4, "tiny"),        # shorter than one shingle
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING").cache()


def test_exact_dedup_collapses_identical(docs):
    out = {r["doc_id"]: r for r in dd.exact_dedup(docs).collect()}
    assert out[1]["rep_id"] == 0 and out[1]["is_dup"] == 1
    assert out[0]["is_dup"] == 0
    assert out[3]["is_dup"] == 0
    assert out[0]["fingerprint"] == out[1]["fingerprint"]


def test_rolling_fingerprint_semantics(spark):
    from custom_vector_database_spark.operators.text import (
        ROLLING_BASE,
        ROLLING_MOD,
        fingerprint_rolling,
    )

    rows = [
        (0, "ab"),
        (1, "ba"),          # same bag of chars, different order → different fp
        (2, "AB"),          # case-normalized → same as 0
        (3, "a    b"),      # whitespace-collapsed → hash of "a b"
        (4, ""),            # empty → 0
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", fingerprint_rolling("text").alias("fp")
        ).collect()
    }

    def horner(s):
        acc = 0
        for ch in s:
            acc = (acc * ROLLING_BASE + ord(ch)) % ROLLING_MOD
        return acc

    assert out[0] == horner("ab")
    assert out[1] == horner("ba") and out[1] != out[0]  # order-sensitive
    assert out[2] == out[0]
    assert out[3] == horner("a b")
    assert out[4] == 0


def test_minhash_finds_planted_near_dup(docs):
    pairs = dd.minhash_dedup_pairs(
        docs, jaccard_dist_threshold=0.6, num_hash_tables=5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found          # exact dup: jaccard distance 0
    assert (0, 2) in found or (1, 2) in found  # near dup survives threshold
    assert all({a, b} != {0, 3} for a, b in found)  # unrelated never pairs


def test_dedup_keep_min_representatives(docs):
    pairs = dd.minhash_dedup_pairs(docs, jaccard_dist_threshold=0.6)
    kept = dd.dedup_keep_min(docs, pairs)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in ids            # min-id representative survives
    assert 1 not in ids        # exact dup removed
    assert 3 in ids and 4 in ids


def test_ngram_jaccard_exact_values(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(docs, min_jaccard=0.1).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical shingle sets
    assert 0.5 < pairs[(0, 2)] < 1.0  # near dup: high but not total overlap
    assert (0, 3) not in pairs


def test_simhash_hamming_orders_similarity(docs):
    sig = {
        r["doc_id"]: r["bits"]
        for r in docs.select(
            "doc_id", dd.simhash_bits("text").alias("bits")
        ).collect()
    }
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert ham(sig[0], sig[1]) == 0          # identical text, identical sig
    assert ham(sig[0], sig[2]) < ham(sig[0], sig[3])  # near < unrelated
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.simhash_neardup_pairs(docs, max_hamming=16).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs


def test_embedding_neardup_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # nearly parallel to 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_dist"]
        for r in dd.embedding_neardup_pairs(df, max_cos_dist=0.1).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] < 0.01
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_connected_components_transitive_chain(spark):
    """A-B and B-C must collapse to one cluster even though A-C never
    matched directly; disjoint pairs stay separate; min id wins."""
    from custom_vector_database_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_cross_corpus_contamination_semantics(spark):
    """Planted overlap: a train doc sharing exactly half its trigrams with
    the holdout scores 0.5; a fully-contained doc scores 1.0; a disjoint
    doc scores 0.0. Docs shorter than n tokens are excluded."""
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # 4 trigrams, 2 shared
            (2, "the quick brown fox"),                  # fully in holdout
            (3, "completely different words here now"),  # disjoint
            (4, "too short"),                            # < 3 tokens: excluded
        ],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(100, "alpha beta gamma delta plus the quick brown fox tail")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_sh"], r["n_overlap"], r["contamination"])
        for r in dd.cross_corpus_contamination(train, holdout).collect()
    }
    assert got[1] == (4, 2, 0.5)
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (3, 0, 0.0)
    assert 4 not in got


def test_redact_pii_and_counts(spark):
    from custom_vector_database_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "mail a.user+tag@sub.example.org or call +1-555-0042 from 10.0.8.1 ok"),
            (2, "no pii here at all"),
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            tx.pii_count("text", "email").alias("e"),
            tx.pii_count("text", "phone").alias("p"),
            tx.pii_count("text", "ipv4").alias("i"),
            tx.redact_pii("text").alias("red"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["p"], rows[1]["i"]) == (1, 1, 1)
    assert rows[1]["red"] == "mail [EMAIL] or call [PHONE] from [IP] ok"
    assert (rows[2]["e"], rows[2]["p"], rows[2]["i"]) == (0, 0, 0)
    assert rows[2]["red"] == "no pii here at all"


def test_repetition_ratio_semantics(spark):
    from custom_vector_database_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 7 total trigrams, 3 distinct
            (2, "one two three four"),  # 2 total, 2 distinct -> 0.0
            (3, "xy"),                  # < n tokens -> 0.0
        ],
        "id long, text string",
    )
    got = {
        r["id"]: (r["t"], r["d"], r["rep"])
        for r in df.select(
            "id",
            tx.ngram_total_count("text", 3).alias("t"),
            F.size(tx.shingles("text", 3)).alias("d"),
            tx.repetition_ratio("text", 3).alias("rep"),
        ).collect()
    }
    assert got[1] == (7, 3, round(1 - 3 / 7, 6))
    assert got[2] == (2, 2, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_duplicate_spans_merges_maximal_runs(spark):
    """Two docs share a 10-token run; with n=4 every window start inside
    the run flags, and the island merge must return ONE maximal span per
    doc covering exactly the shared tokens — plus nothing from the
    unshared prefix/suffix. A third doc with no 4-gram overlap emits no
    spans."""
    from custom_vector_database_spark.operators import text as tx

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [
            (1, "xx yy " + shared + " zz"),
            (2, shared + " aa bb cc"),
            (3, "nothing in common here at all truly"),
        ],
        "doc_id long, text string",
    )
    rows = (
        tx.duplicate_spans(df, n=4, min_docs=2)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    got = [(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in rows]
    # doc 1: shared run occupies tokens 3..12; doc 2: tokens 1..10
    assert got == [(1, 3, 12, 10), (2, 1, 10, 10)]


def test_duplicate_spans_merges_gapped_overlapping_windows(spark):
    """Flagged window starts with a GAP whose token intervals still
    overlap must merge into one disjoint span (ADVICE r6: starts 1 and 3
    at n=4 cover tokens 1..4 and 3..6 — one run 1..6, never two
    overlapping rows whose span_tokens double-count). Docs 1/2 share
    'a b c d' (start 1) and 'c d e f' (start 3) but NOT the middle
    window 'b c d e' — doc 2's interposed 'q' breaks it, so only doc 1
    contains it and dfreq stays below min_docs."""
    from custom_vector_database_spark.operators import text as tx

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d q c d e f"),
        ],
        "doc_id long, text string",
    )
    rows = (
        tx.duplicate_spans(df, n=4, min_docs=2)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    got = [(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in rows]
    # doc 1: windows at 1 ('a b c d') and 3 ('c d e f') both shared;
    # window 2 ('b c d e') is doc-1-only -> starts 1 and 3, gap 2 <= 4,
    # intervals [1,4] and [3,6] overlap -> ONE span [1,6]
    assert (1, 1, 6, 6) in got
    # spans must be disjoint per doc: no overlapping intervals anywhere
    by_doc: dict = {}
    for d, s_, e_, _t in got:
        by_doc.setdefault(d, []).append((s_, e_))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 > e1, spans


def test_semantic_prune_greedy_by_id_within_cluster(spark):
    """Chain case: 3 close to 1, 5 close to 3 but NOT to 1 — the
    greedy-by-id rule drops every row with ANY closer lower-id neighbor,
    so both 3 and 5 drop (5 via the already-dropped 3: the rule is
    'exists lower id within tau', deliberately not transitive-keeper).
    Cross-cluster closeness never prunes."""
    from custom_vector_database_spark.operators.dedup import semantic_prune

    rows = [
        (1, [1.0, 0.0], 0),
        (3, [0.96, 0.28], 0),   # ~0.04 cos_dist to 1
        (5, [0.80, 0.60], 0),   # ~0.06 to 3, ~0.2 to 1
        (7, [0.0, 1.0], 0),     # far from all
        (9, [1.0, 0.0], 1),     # identical to 1 but another cluster
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    kept = {
        r["vec_id"]
        for r in semantic_prune(df, cluster_col="label", max_cos_dist=0.1).collect()
    }
    assert kept == {1, 7, 9}


def test_sign_band_neardup_catches_exact_dups_and_verifies(spark):
    """An exact duplicate always shares every band (sign codes identical),
    so it MUST surface with cos_dist +0.0 / is_near true; an
    opposite-sign vector can never band with it; ragged rows are
    excluded from banding entirely."""
    from custom_vector_database_spark.operators.dedup import sign_band_neardup_pairs

    base = [1.0 if i % 3 else -1.0 for i in range(64)]
    rows = [
        (1, base),
        (2, list(base)),                 # exact dup of 1
        (5, [-x for x in base]),         # antipode: zero band agreement
        (9, base[:10]),                  # ragged: cannot band
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"]): (r["cos_dist"], r["is_near"])
        for r in sign_band_neardup_pairs(df, max_cos_dist=0.5).collect()
    }
    assert got == {(1, 2): (0.0, True)}
    import math

    assert math.copysign(1.0, got[(1, 2)][0]) == 1.0  # +0.0, never -0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="band_bits"):
        sign_band_neardup_pairs(df, band_bits=64)


def test_triangle_count_semantics(spark):
    """A 4-clique yields C(3,2)=3 triangles per member; a chain closes
    none; duplicate and reversed edges dedupe to the canonical
    orientation before counting."""
    from custom_vector_database_spark.operators.graph import triangle_count

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(10, 11), (11, 12), (12, 13)]
    # reversed-only edge (21,20), self-loop, and duplicates must all
    # canonicalize: the reversed edge closes the 20-21-22 triangle
    noisy = clique + chain + [(2, 1), (1, 2), (7, 7)]
    noisy += [(20, 22), (21, 22), (21, 20)]
    df = spark.createDataFrame(noisy, "id_a long, id_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 20: 1, 21: 1, 22: 1}


def test_cut_token_spans_mechanics(spark):
    """Span surgery removes exactly the listed 1-based token intervals,
    handles overlapping spans, leaves span-free docs untouched, and a
    fully-covered doc comes back empty."""
    from custom_vector_database_spark.operators.text import cut_token_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z"), (3, "p q")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 5), (3, 1, 2)],  # overlapping 2-3 and 3-5 on doc 1
        "doc_id long, span_start int, span_end int",
    )
    got = {r["doc_id"]: r for r in cut_token_spans(docs, spans).collect()}
    assert (got[1]["n_tokens"], got[1]["n_cut"], got[1]["cleaned"]) == (6, 4, "a f")
    assert (got[2]["n_tokens"], got[2]["n_cut"], got[2]["cleaned"]) == (3, 0, "x y z")
    assert (got[3]["n_tokens"], got[3]["n_cut"], got[3]["cleaned"]) == (2, 2, "")


def test_winnowing_guarantee_and_density(spark):
    """The winnowing theorem on crafted docs: two documents sharing a
    run of >= n+w-1 tokens MUST select at least one identical hash; the
    selection density sits near 2/(w+1); and a doc with fewer than n
    tokens fingerprints empty."""
    from custom_vector_database_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog today"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one"),
            (2, shared + " completely different ending words"),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    # guarantee check needs the selected hash SETS, not just checksums:
    # recompute via the operator's building blocks
    from custom_vector_database_spark.operators.text import positioned_grams
    from pyspark.sql import functions as F

    out = {r["doc_id"]: r for r in winnow_fingerprints(docs, n=5, w=4).collect()}
    assert out[3]["n_grams"] == 0 and out[3]["n_selected"] == 0
    for d in (1, 2):
        dens = out[d]["n_selected"] / out[d]["n_grams"]
        assert 0.2 <= dens <= 0.8, (d, dens)  # 2/(w+1)=0.4 with slack
    # shared-substring guarantee: selected hash sets intersect. Shared
    # run is 10 tokens >= n+w-1 = 8.
    grams = docs.select(
        "doc_id", F.posexplode(positioned_grams(F.col("text"), 5)).alias("p", "g")
    )
    # brute-force the winnow per doc in python
    rows = grams.collect()
    import hashlib

    per_doc: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["p"])):
        per_doc.setdefault(r["doc_id"], []).append(
            int(hashlib.md5(r["g"].encode()).hexdigest()[:15], 16)
        )
    sel_hashes, sel_pos = {}, {}
    for d, hs in per_doc.items():
        picked = set()
        for s in range(0, len(hs) - 4 + 1):
            win = hs[s : s + 4]
            m = min(win)
            picked.add(s + max(i for i, h in enumerate(win) if h == m))
        sel_pos[d] = picked
        sel_hashes[d] = {hs[p] for p in picked}
    assert sel_hashes[1] & sel_hashes[2], "shared 10-token run must share a fingerprint"
    # the operator's counts and checksums agree with the brute force
    # exactly (n_selected = distinct positions; checksum sums per
    # POSITION, so a hash selected at two positions counts twice)
    for d in (1, 2):
        assert out[d]["n_selected"] == len(sel_pos[d]), d
        assert out[d]["fp_checksum"] == sum(
            per_doc[d][p] % 1_000_000_007 for p in sel_pos[d]
        ), d


def test_triangle_count_low_id_hub_wheel(spark):
    """Wheel graph with the hub at the LOWEST id (the degree-orientation
    regression case: id-orientation fanned deg² wedges out of node 0).
    Hub 0 joins every rim node 1..12; rim is a cycle. Every rim edge
    closes exactly one triangle with the hub: 12 triangles total, hub in
    all 12, each rim node in 3 (two hub triangles + its own rim corner
    count... exactly: rim node i sits in triangles (0,i-1,i), (0,i,i+1)
    -> 2, plus none rim-only), so rim counts are 2."""
    from custom_vector_database_spark.operators.graph import triangle_count

    n = 12
    edges = [(0, i) for i in range(1, n + 1)]
    edges += [(i, i + 1) for i in range(1, n)] + [(n, 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got[0] == n
    assert all(got[i] == 2 for i in range(1, n + 1)), got
    assert sum(got.values()) == 3 * n  # n triangles, 3 corners each


def test_semantic_prune_greedy_keeps_chain_third_member(spark):
    """The ADVICE r6 chain: B within thr of A (dropped), C within thr of
    ONLY B. The pessimistic rule drops C too; the paper-faithful greedy
    scan must KEEP C because its only near neighbor B is itself dropped
    — A stays the sole representative of the A-B pair and C of itself."""
    import math

    from custom_vector_database_spark.operators.dedup import (
        semantic_prune,
        semantic_prune_greedy,
    )

    # unit circle: angles chosen so cos_dist(A,B) and cos_dist(B,C) are
    # under thr=0.2 but cos_dist(A,C) is over it
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    df = spark.createDataFrame(
        [(1, v(0), 0), (2, v(30), 0), (3, v(60), 0)],
        "vec_id long, embedding array<double>, label int",
    )
    # cos_dist: 30 deg apart = 1-cos(30) ~ 0.134 < 0.2; 60 deg ~ 0.5 > 0.2
    greedy = {
        r["vec_id"]
        for r in semantic_prune_greedy(
            df, cluster_col="label", max_cos_dist=0.2
        ).collect()
    }
    assert greedy == {1, 3}
    pessimistic = {
        r["vec_id"]
        for r in semantic_prune(df, cluster_col="label", max_cos_dist=0.2).collect()
    }
    assert pessimistic == {1}  # the documented over-pruning divergence


def test_semantic_prune_greedy_edge_cases(spark):
    """Zero-norm vectors are always kept and never drop others; clusters
    are independent; empty input returns empty; the max_cluster_rows
    guard raises with the refit hint."""
    import pytest as _pytest

    from custom_vector_database_spark.operators.dedup import (
        semantic_prune_greedy,
        semantic_prune_greedy_flags,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.0, 0.0], 0),   # zero-norm: kept, drops nobody
            (3, [1.0, 0.001], 0),  # near id 1 -> dropped
            (4, [1.0, 0.0], 1),   # other cluster: kept despite matching id 1
        ],
        "vec_id long, embedding array<double>, label int",
    )
    kept = {
        r["vec_id"]
        for r in semantic_prune_greedy(
            df, cluster_col="label", max_cos_dist=0.1
        ).collect()
    }
    assert kept == {1, 2, 4}
    empty = df.limit(0)
    assert semantic_prune_greedy(empty, cluster_col="label").count() == 0
    with _pytest.raises(Exception, match="max_cluster_rows"):
        semantic_prune_greedy_flags(
            df, cluster_col="label", max_cluster_rows=2
        ).collect()


def test_semantic_prune_greedy_tolerates_null_and_ragged_vectors(spark):
    """ADVICE r7: NULL / mismatched-length embeddings previously crashed
    the Arrow batch with an opaque numpy error; they must get the
    zero-norm treatment instead — always kept, never droppers — while
    the well-formed rows still prune normally around them."""
    from custom_vector_database_spark.operators.dedup import (
        semantic_prune_greedy,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, None, 0),            # NULL: kept, drops nobody
            (3, [1.0, 0.0, 9.0], 0),  # ragged: kept, drops nobody
            (4, [1.0, 0.001], 0),    # near id 1 -> dropped
            (5, [0.0, 1.0], 0),      # orthogonal: kept
        ],
        "vec_id long, embedding array<double>, label int",
    )
    kept = {
        r["vec_id"]
        for r in semantic_prune_greedy(
            df, cluster_col="label", max_cos_dist=0.1
        ).collect()
    }
    assert kept == {1, 2, 3, 5}


def test_neardup_contamination_flags_reformatted_leaks(spark):
    """A dot-level reformatting (same token stream, different
    fingerprint) must flag as contaminated with full agreement; an
    unrelated doc stays clean; a too-short doc has a NULL signature and
    can never be flagged."""
    from pyspark.sql import functions as F

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different words about distributed query engines"),
            (3, "xy zz"),  # < 3 tokens: NULL signature
        ],
        "doc_id long, text string",
    )
    hold = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight.")],
        "doc_id long, text string",
    )
    from custom_vector_database_spark.operators.dedup import (
        neardup_contamination,
    )

    out = {
        r["doc_id"]: (r["n_cand"], r["max_agree"], r["contaminated"])
        for r in neardup_contamination(train, hold).collect()
    }
    assert out[1] == (1, 16, True)  # identical token stream: J=1
    assert out[2] == (0, 0, False)
    assert out[3] == (0, 0, False)


def test_decontaminate_span_cut_surgery(spark):
    """Span-level decontamination contract: a train doc containing a
    holdout passage loses exactly that span (all its tokens, merged
    maximally) and KEEPS the rest; a doc that IS entirely holdout text
    cleans to empty; an uncontaminated doc passes through byte-for-byte;
    the leak is cut from EVERY occurrence (holdout owns it — no
    keep-one policy here, unlike span_cut_docs)."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.text import (
        contaminated_spans,
        decontaminate_span_cut,
    )

    leak = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    holdout = spark.createDataFrame(
        [(1, f"eval question: {leak} answer follows")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # leak mid-doc: span cut, prefix+suffix kept
            (10, f"intro words here {leak} closing words here now"),
            # two occurrences in one doc: both cut
            (11, f"x1 y2 z3 {leak} mid section {leak} tail t1 t2"),
            # entirely leaked text: cleans to empty
            (12, leak),
            # clean doc: untouched
            (13, "completely unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate_span_cut(
            train, holdout, n=8
        ).collect()
    }
    assert out[10]["cleaned"] == "intro words here closing words here now"
    assert out[10]["n_cut"] == 10
    assert out[11]["cleaned"] == "x1 y2 z3 mid section tail t1 t2"
    assert out[11]["n_cut"] == 20
    assert out[12]["cleaned"] == "" and out[12]["n_cut"] == 10
    assert out[13]["cleaned"] == train.collect()[3]["text"]
    assert out[13]["n_cut"] == 0
    # the span table itself: disjoint, 1-based, maximal — exactly one
    # 10-token span for docs 10/12, two for doc 11, none for doc 13
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_tokens"])
        for r in contaminated_spans(train, holdout, n=8).collect()
    )
    assert spans == [(10, 4, 10), (11, 4, 10), (11, 16, 10), (12, 1, 10)]


def test_semantic_contamination_flags_planted_leaks(spark):
    """Semantic decontamination contract: scaled copies of holdout
    vectors flag at cosine distance 0; negated and orthogonal-ish
    vectors don't; vectors that cannot band (wrong dim) report
    0/NULL/false rather than erroring."""
    from pyspark.sql import functions as F

    from custom_vector_database_spark.operators.dedup import (
        semantic_contamination,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    hold = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    leak = hold.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.expr(
            "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 2.0 AS FLOAT))"
        ).alias("embedding"),
    )
    clean = (
        emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 30))
        .select((F.col("vec_id") + 200).alias("doc_id"),
                F.expr("transform(embedding, x -> -x)").alias("embedding"))
    )
    short = spark.createDataFrame(
        [(999, [1.0, 2.0])], "doc_id long, embedding array<float>"
    )
    train = leak.unionByName(clean).unionByName(short)
    out = {
        r["doc_id"]: r
        for r in semantic_contamination(train, hold).collect()
    }
    assert all(out[100 + i]["contaminated"] for i in range(10))
    assert all(out[100 + i]["min_cos_dist"] == 0.0 for i in range(10))
    assert not any(out[220 + i]["contaminated"] for i in range(10))
    assert not out[999]["contaminated"] and out[999]["n_cand"] == 0
    assert out[999]["min_cos_dist"] is None
