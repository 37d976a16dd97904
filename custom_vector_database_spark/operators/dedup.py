"""Deduplication operators for LLM training-data pipelines (builder brief):
exact, MinHash+LSH, n-gram Jaccard, SimHash, and embedding-cosine near-dup.

Scale shapes (the reason each implementation looks the way it does):
- exact_dedup         — one hash-groupBy on a 32-byte digest; never compares
                        full documents, never shuffles text bodies twice.
- minhash_dedup_pairs — shingle → HashingTF → MinHashLSH; candidate pairs
                        come from LSH band-bucket joins (MLlib
                        approxSimilarityJoin), NEVER the n² cross product.
- ngram_jaccard_pairs — inverted-index candidate generation: explode
                        shingles, equi-join on the shingle, count common
                        shingles per pair, compute exact Jaccard. Only pairs
                        sharing ≥1 shingle are ever materialized.
- simhash             — 64-bit signature via a single aggregate expression
                        over token hashes (no UDF); near-dup candidates via
                        16-bit band buckets, verified by Hamming distance.
- embedding_neardup   — brute-force cosine within a bounded probe set (the
                        correctness baseline); the scale path is the LSH
                        similarity join in operators/ann.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.text import fingerprint_md5, shingles, tokenize

__all__ = [
    "exact_dedup",
    "minhash_dedup_pairs",
    "dedup_keep_min",
    "ngram_jaccard_pairs",
    "simhash_bits",
    "simhash_signatures",
    "bits_to_hex",
    "simhash_hex",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    "cross_corpus_contamination",
    "neardup_contamination",
    "minhash_perm_consts",
    "with_minhash_sig",
    "sig_band_structs",
    "sig_agreement",
]


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on the normalized-text digest.
# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adds (fingerprint, rep_id, is_dup): every duplicate group is
    represented by its minimum id — deterministic and order-free."""
    fp = df.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))
    reps = fp.groupBy("fingerprint").agg(F.min(id_col).alias("rep_id"))
    return (
        fp.join(reps, "fingerprint")
        .withColumn("is_dup", (F.col(id_col) != F.col("rep_id")).cast("int"))
        .select(id_col, "fingerprint", "rep_id", "is_dup")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidate pairs.
# ---------------------------------------------------------------------------
def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_dist_threshold: float = 0.5,
    shingle_n: int = 3,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard_dist) via MinHashLSH.

    shingle (word n-grams) → HashingTF set-vector → MinHash signatures →
    band-bucket join. jaccard_dist is MLlib's (1 - estimated Jaccard).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(F.col(id_col), shingles(text_col, shingle_n).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features)
    # localCheckpoint = optimization barrier: approxSimilarityJoin's hash UDF
    # is deterministic, so Catalyst may reorder it BELOW the empty-shingle
    # filter (filter/project reordering), crashing MinHash on zero vectors.
    # Materializing the filtered featurization truncates the lineage so no
    # rewrite can resurrect unfiltered rows; the fit+join pair reuses the
    # materialized data anyway (two passes).
    feats = tf.transform(sh).localCheckpoint(eager=True)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, jaccard_dist_threshold, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def dedup_keep_min(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep-min-id representative selection: a row survives unless a
    smaller-id near-duplicate exists. One anti-join — no iteration (documented
    single-pass approximation of connected components; transitive chains
    longer than one hop may keep an extra representative)."""
    victims = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(victims, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted-index candidate generation.
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets for every pair sharing at
    least one shingle. Returns (id_a, id_b, jaccard) with id_a < id_b.

    inverted index (explode) → equi-join on shingle → count common →
    jaccard = common / (|A| + |B| - common). The equi-join keys on the
    shingle string, so only genuinely-overlapping pairs are generated.

    The exploded index is localCheckpoint'ed before the self-join: the
    tokenize+shingle expression is the hot per-row cost, and without the
    barrier Catalyst re-evaluates it for BOTH join branches and the size
    aggregate (3 full passes; measured ~2x the query wall time at sf0.1).
    The checkpoint holds (id, shingle) pairs — O(corpus tokens) on
    executor-local disk, the same barrier the MinHash path uses. Sizes
    come from the index itself (shingles are distinct per doc, so the
    per-doc row count IS the set size) — no third shingle pass.
    """
    inv = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    ).localCheckpoint(eager=True)
    sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = inv.select(F.col(id_col).alias("id_a"), "shingle")
    b = inv.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash: 64-bit signature. Two formulations with identical values:
# - simhash_bits: a single column expression (handy inline, but it folds a
#   64-wide array per token inside one expression tree — fine for short
#   texts, quadratic-feeling for long ones);
# - simhash_signatures: the SCALE path — explode tokens, hash each token
#   once, aggregate 64 conditional sums in one map-side-combined hash
#   aggregate, reassemble the bit vector. One shuffle keyed by doc id.
# ---------------------------------------------------------------------------
def simhash_bits(col: Column | str, bits: int = 64) -> Column:
    """SimHash bit vector (array<int> of 0/1, length ``bits``) over word
    tokens. Per token, xxhash64 supplies the bit pattern; each bit position
    accumulates +1/-1; the sign of the total is the signature bit. One
    aggregate expression — runs in codegen, no UDF, no explode."""
    toks = tokenize(col)
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)

    def tok_contrib(acc: Column, t: Column) -> Column:
        h = F.xxhash64(t)
        # static bit positions → plain Python ints (shiftright needs a
        # literal shift amount)
        bit_arr = F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(bits)
            ]
        )
        return F.zip_with(acc, bit_arr, lambda a, v: a + v)

    totals = F.aggregate(toks, zeros, tok_contrib)
    return F.transform(totals, lambda v: F.when(v > 0, 1).otherwise(0))


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, bits) SimHash signatures via explode + one hash aggregate —
    same values as simhash_bits, scalable to arbitrarily long documents.
    Docs with zero tokens get the all-zero signature (left join back)."""
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("tok"))
    hashed = toks.select(id_col, F.xxhash64("tok").alias("h"))
    sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    bit_arr = F.array(
        *[F.when(F.col(f"_b{i}") > 0, 1).otherwise(0) for i in range(bits)]
    )
    sigs = sums.select(F.col(id_col), bit_arr.alias("bits"))
    zero = F.array_repeat(F.lit(0), bits)
    return (
        df.select(id_col)
        .join(sigs, id_col, "left")
        .select(F.col(id_col), F.coalesce("bits", zero).alias("bits"))
    )


def bits_to_hex(bits_col: Column | str) -> Column:
    """Bit array (length divisible by 4) → lowercase hex string."""
    bits_arr = F.col(bits_col) if isinstance(bits_col, str) else bits_col
    nibble_idx = F.sequence(F.lit(0), F.lit(15))
    nibbles = F.transform(
        nibble_idx,
        lambda i: F.lower(
            F.conv(
                (
                    F.element_at(bits_arr, (i * 4 + 1).cast("int")) * 8
                    + F.element_at(bits_arr, (i * 4 + 2).cast("int")) * 4
                    + F.element_at(bits_arr, (i * 4 + 3).cast("int")) * 2
                    + F.element_at(bits_arr, (i * 4 + 4).cast("int"))
                ).cast("string"),
                10,
                16,
            )
        ),
    )
    return F.array_join(nibbles, "")


def simhash_hex(col: Column | str) -> Column:
    """64-bit SimHash as a 16-char hex string (inline-expression flavor;
    prefer simhash_signatures + bits_to_hex at scale)."""
    return bits_to_hex(simhash_bits(col, 64))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band-bucket candidates verified with the
    exact Hamming distance. Returns (id_a, id_b, hamming).

    Banding is COMPLETE for the requested threshold: with ``n_bands``
    bands, two signatures within hamming ≤ n_bands − 1 must agree on at
    least one band (pigeonhole), so ``n_bands`` is chosen as the smallest
    divisor of 64 exceeding ``max_hamming`` — no qualifying pair can be
    silently dropped. The cost side: more/narrower bands collide more, so
    candidate volume grows with the threshold; keep ``max_hamming`` small
    at scale (3 ≈ the usual SimHash near-dup bar for 64-bit signatures,
    Manku et al., WWW 2007)."""
    if not 0 <= max_hamming <= 63:
        raise ValueError("max_hamming must be in [0, 63]")
    n_bands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_hamming)
    band_bits = 64 // n_bands
    sigs = simhash_signatures(df, id_col=id_col, text_col=text_col)
    banded = sigs.select(
        id_col,
        "bits",
        *[
            F.array_join(
                F.slice("bits", b * band_bits + 1, band_bits), ""
            ).alias(f"band{b}")
            for b in range(n_bands)
        ],
    )
    cands = None
    for b in range(n_bands):
        a = banded.select(
            F.col(id_col).alias("id_a"),
            F.col("bits").alias("bits_a"),
            F.col(f"band{b}").alias("band"),
        )
        c = banded.select(
            F.col(id_col).alias("id_b"),
            F.col("bits").alias("bits_b"),
            F.col(f"band{b}").alias("band"),
        )
        pb = a.join(c, "band").filter(F.col("id_a") < F.col("id_b")).drop("band")
        cands = pb if cands is None else cands.unionByName(pb)
    hamming = F.aggregate(
        F.zip_with(
            "bits_a", "bits_b", lambda x, y: F.when(x != y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cands.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (bounded brute force — the oracle-checkable
# baseline; LSH in operators/ann.py is the 100 TB path).
# ---------------------------------------------------------------------------
def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cos_dist: float = 0.6,
    probe: Column | None = None,
) -> DataFrame:
    """Pairs (id_a, id_b, cos_dist) with cosine distance ≤ threshold.
    ``probe`` (a predicate over ``df``'s columns) bounds the left side so the
    join is |probe| × |df| with the probe side broadcast.

    Norms are computed ONCE PER SIDE before the join — the per-pair work is
    a single dot-product fold plus scalar arithmetic, not three array folds
    (cosine_similarity inline would recompute both norms per pair)."""
    from custom_vector_database_spark.functions.vector import dot_product, l2_norm

    left_src = df.filter(probe) if probe is not None else df
    left = left_src.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        l2_norm(vec_col).alias("norm_a"),
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        l2_norm(vec_col).alias("norm_b"),
    )
    pairs = F.broadcast(left).crossJoin(right).filter(F.col("id_a") < F.col("id_b"))
    denom = F.col("norm_a") * F.col("norm_b")
    cos_dist = F.round(
        F.lit(1.0)
        - F.when(denom != 0.0, dot_product(F.col("vec_a"), F.col("vec_b")) / denom),
        6,
    )
    return (
        pairs.select("id_a", "id_b", cos_dist.alias("cos_dist"))
        .filter(F.col("cos_dist") <= max_cos_dist)
    )


# ---------------------------------------------------------------------------
# Train/eval decontamination: n-gram overlap against a held-out corpus.
# ---------------------------------------------------------------------------
def cross_corpus_contamination(
    train: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-train-document contamination against a held-out (eval) corpus:
    (id, n_sh, n_overlap, contamination) where contamination =
    |shingles(doc) ∩ shingles(holdout)| / |shingles(doc)|. The standard
    benchmark-decontamination primitive for LLM training sets (filter or
    audit docs whose contamination exceeds a threshold); the reference
    has no cross-corpus operator at all (SURVEY §2.2).

    Scale shape: the holdout's DISTINCT shingle set is tiny next to the
    training corpus (eval benchmarks are thousands of documents), so it
    broadcasts and the overlap count is a broadcast semi-style inner join
    on the shingle string — the training side shuffles nothing, and no
    pair of documents is ever materialized (unlike ngram_jaccard_pairs,
    membership in the holdout SET is enough). Docs with zero shingles
    (shorter than n tokens) are excluded, mirroring the n_sh > 0
    contract of the pair operators. For a holdout too large to
    broadcast, drop the hint and the same plan degrades gracefully to a
    shuffle join keyed by shingle.
    """
    # one shingle pass: the exploded index feeds both the size aggregate
    # and the overlap probe (shingles are distinct per doc, so the per-doc
    # row count IS the set size) — same barrier as ngram_jaccard_pairs,
    # which measured the un-checkpointed double evaluation at ~2x wall
    inv = train.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    ).localCheckpoint(eager=True)
    sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    holdout_sh = (
        holdout.select(F.explode(shingles(text_col, n)).alias("shingle"))
        .distinct()
    )
    # shingles are distinct per doc, so one match per (doc, shingle):
    # the count IS |doc-shingles ∩ holdout-shingles|
    overlap = (
        inv.join(F.broadcast(holdout_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        sizes.join(overlap, id_col, "left")
        .select(
            id_col,
            "n_sh",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)).cast("double") / F.col("n_sh"),
                6,
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup, Abbas et al. 2023): within a cluster,
# keep one representative per near-duplicate neighborhood.
# ---------------------------------------------------------------------------
def semantic_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    max_cos_dist: float = 0.2,
) -> DataFrame:
    """Drop embedding near-duplicates within each cluster: a row survives
    iff NO lower-id row in the same cluster sits within ``max_cos_dist``
    cosine distance. The lowest-id member of every neighborhood is the
    deterministic keeper (engine-reproducible, unlike SemDeDup's
    arbitrary-representative choice). DELIBERATE DIVERGENCE from the
    paper's greedy scan (ADVICE r6): the dropping side here includes
    lower-id rows that were THEMSELVES dropped, so chains over-prune —
    B near A drops B; C near only B is still dropped although its
    nearest kept row A is far. This one-shot pessimistic rule is what a
    pure relational plan (and therefore an exact DuckDB oracle) can
    express; it removes a SUPERSET of the greedy scan's drops, which is
    a safe direction for dedup recall but not the paper's contract. For
    the paper-faithful keep-one-representative semantics use
    semantic_prune_greedy (sequential per-cluster scan, guarantee-
    oracled). Returns the surviving rows with all original columns.

    The cluster column IS the scale story, exactly as in the paper: pair
    generation is blocked per cluster (k-means cells there; compose with
    IvfIndex.fit's assignments or any blocking key here), so the join is
    sum-of-squares over bounded cells, never corpus-n². Norms are
    computed once per side; per-pair work is one dot-product fold."""
    from custom_vector_database_spark.functions.vector import dot_product, l2_norm

    a = df.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
        l2_norm(vec_col).alias("__na"),
    )
    b = df.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
        l2_norm(vec_col).alias("__nb"),
    )
    denom = F.col("__na") * F.col("__nb")
    cos_dist = F.round(
        F.lit(1.0)
        - F.when(denom != 0.0, dot_product(F.col("__va"), F.col("__vb")) / denom),
        6,
    )
    dropped = (
        a.join(b, "__c")
        .filter(F.col("__ida") < F.col("__idb"))
        .select(F.col("__idb"), cos_dist.alias("__cd"))
        .filter(F.col("__cd") <= max_cos_dist)
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def semantic_prune_greedy_flags(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    max_cos_dist: float = 0.2,
    max_cluster_rows: int = 16_000,
) -> DataFrame:
    """SemDeDup's ACTUAL greedy scan (Abbas et al. 2023 §3), per
    cluster: visit rows in ascending id and keep a row iff no
    ALREADY-KEPT lower-id row sits within ``max_cos_dist`` cosine
    distance. Unlike semantic_prune's pessimistic one-shot rule (which
    also drops rows whose only near neighbor was itself dropped — the
    documented non-transitive divergence), the greedy scan yields the
    paper's keep-one-representative contract exactly: the kept set is
    the unique maximal id-ordered independent set of the thresholded
    cosine graph restricted to each cluster, so (a) every dropped row
    has a KEPT lower-id near neighbor in its cluster and (b) no two
    kept cluster-mates are within the threshold — both verifiable
    invariants the registered query certifies in-plan. Returns
    (id_col, cluster_col, __keep boolean), one row per input row.

    Shape: a sequential scan is not relational, so this is the repo's
    one deliberate applyInPandas dedup operator — Arrow-batched, one
    group per cluster, O(c²) numpy inside (a single c×c BLAS gram
    matrix + an O(c) row sweep), memory c·d + c² floats bounded by the
    CLUSTER contract (compose with IvfIndex.fit so occupancy n/k stays
    constant as the corpus grows; ``max_cluster_rows`` hard-stops a
    degenerate cell instead of OOMing an executor — the 16k default
    caps the per-task gram matrix at 16k² × 8 B ≈ 2 GiB + a 256 MiB
    bool mask, sized so the ValueError fires before memory does). Each vector rides
    the cluster shuffle exactly once — byte-minimal for this operator:
    within-cluster candidates are DENSE (every pair), so the
    sparse-candidate shape used by sign_band_neardup_pairs (scalars
    first, vectors joined back per candidate) would shuffle
    pairs×dim ≥ rows×dim bytes, strictly more for any cell over 2 rows.

    Zero-norm vectors have undefined cosine: they are always kept and
    never drop others (semantic_prune's NULL-comparison convention).
    NULL and ragged (length != the cluster's modal dim) vectors get the
    same treatment — kept, never droppers — rather than crashing the
    Arrow batch with an opaque numpy error.
    """
    import pandas as pd

    id_t = dict(df.dtypes)[id_col]
    cl_t = dict(df.dtypes)[cluster_col]
    thr = float(max_cos_dist)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        c = len(pdf)
        if c > max_cluster_rows:
            raise ValueError(
                f"cluster {pdf[cluster_col].iloc[0]!r} has {c} rows > "
                f"max_cluster_rows={max_cluster_rows}; refit with more "
                "clusters (occupancy = n / n_clusters is the memory "
                "contract of the per-cell gram matrix)"
            )
        pdf = pdf.sort_values(id_col, kind="mergesort")
        # NULL or ragged (mismatched-length) vectors get the zero-norm
        # treatment — always kept, never droppers — instead of an opaque
        # np.stack/norm crash, mirroring the relational semantic_prune's
        # NULL-comparison tolerance. The reference dim is the modal
        # length of the non-NULL vectors (ties break to the larger dim).
        vals = [None if v is None else np.asarray(v, dtype=np.float64)
                for v in pdf[vec_col]]
        lengths = [len(v) for v in vals if v is not None]
        d = (max(set(lengths), key=lambda L: (lengths.count(L), L))
             if lengths else 0)
        x = np.zeros((c, d), dtype=np.float64)
        for i, v in enumerate(vals):
            if v is not None and len(v) == d:
                x[i] = v
        norms = np.linalg.norm(x, axis=1)
        ok = norms > 0.0
        u = np.zeros_like(x)
        u[ok] = x[ok] / norms[ok, None]
        # round(1 - cos, 6) <= thr mirrors the relational family's
        # comparison convention up to the rounding RULE: np.round is
        # half-even where Spark's F.round is half-up, so a value landing
        # exactly on x.xxxxx5e-6 can differ — callers certifying against
        # Spark-side distances must compare with a band wider than 1e-6
        # (q_semdedup_ivf_prune uses ±2e-6)
        near = np.round(1.0 - (u @ u.T), 6) <= thr
        near &= ok[:, None] & ok[None, :]
        keep = np.ones(c, dtype=bool)
        for i in range(1, c):
            if near[i, :i][keep[:i]].any():
                keep[i] = False
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                cluster_col: pdf[cluster_col].values,
                "__keep": keep,
            }
        )

    return (
        df.select(id_col, cluster_col, vec_col)
        .groupBy(cluster_col)
        .applyInPandas(
            prune, schema=f"`{id_col}` {id_t}, `{cluster_col}` {cl_t}, __keep boolean"
        )
    )


def semantic_prune_greedy(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    max_cos_dist: float = 0.2,
    max_cluster_rows: int = 16_000,
) -> DataFrame:
    """Surviving rows (all original columns) under the greedy
    keep-one-representative scan — see semantic_prune_greedy_flags."""
    flags = semantic_prune_greedy_flags(
        df, id_col, vec_col, cluster_col, max_cos_dist, max_cluster_rows
    )
    return df.join(
        flags.filter(F.col("__keep")).select(id_col), id_col, "left_semi"
    )


# ---------------------------------------------------------------------------
# Embedding near-dup pairs at CORPUS scale via sign-bit banding
# (SimHash/sign-random-projection applied to the raw axes) — the
# unbounded-corpus complement to embedding_neardup_pairs, whose probe
# predicate exists to bound one join side.
# ---------------------------------------------------------------------------
def sign_band_keys(
    vec_col: Column | str, n_bands: int, band_bits: int
) -> Column:
    """``n_bands`` integer band keys from a vector's sign bits: key_b
    packs the signs of ``band_bits`` consecutive dimensions (1 iff
    component > 0) as a base-2 integer — the deterministic identity
    projection shared by sign_band_neardup_pairs and the streaming
    semantic-dedup sidecar (ONE definition so a probe always hashes
    exactly like the sidecar it probes, and a SQL oracle can recompute
    every key)."""
    bits = F.transform(
        F.col(vec_col) if isinstance(vec_col, str) else vec_col,
        lambda x: F.when(x > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.aggregate(
            F.slice(bits, b * band_bits + 1, band_bits),
            F.lit(0).cast("long"),
            lambda acc, v: acc * 2 + v,  # <= 2^band_bits, far inside int64
        ),
    )


def sign_band_cos_dist(va, vb, na=None, nb=None) -> Column:
    """The ONE copy of the band-then-verify exact-cosine arithmetic:
    round-6 cosine distance, NULL for a zero-norm side (an undefined
    angle is never 'near'), +0.0 normalizing -0.0 from identical-vector
    matches — shared by sign_band_neardup_pairs and the streaming
    semantic-dedup sidecar so a stream drop can never diverge from the
    batch pair set or the DuckDB oracle. ``na``/``nb`` take precomputed
    norm COLUMNS when the caller stored them; omitted, norms fold
    inline (identical deterministic arithmetic either way)."""
    from custom_vector_database_spark.functions.vector import (
        dot_product,
        l2_norm,
    )

    va = F.col(va) if isinstance(va, str) else va
    vb = F.col(vb) if isinstance(vb, str) else vb
    na = l2_norm(va) if na is None else na
    nb = l2_norm(vb) if nb is None else nb
    denom = na * nb
    return (
        F.round(
            F.lit(1.0) - F.when(denom != 0.0, dot_product(va, vb) / denom),
            6,
        )
        + F.lit(0.0)
    )


def sign_band_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_bits: int = 16,
    max_cos_dist: float = 0.7,
) -> DataFrame:
    """Candidate pairs whose sign codes agree on at least one band of
    ``band_bits`` consecutive dimensions, each verified with its exact
    cosine distance: (id_a, id_b, cos_dist, is_near) with is_near =
    cos_dist <= threshold. Charikar's bound makes band agreement a
    recall knob (P[bit agrees] = 1 − θ/π per dimension), and the
    verify step makes precision exact — the same
    band-then-verify contract as the MinHash and SimHash text paths,
    here over embeddings with the deterministic identity projection, so
    both candidate generation AND verification are engine-reproducible
    (no seeded hyperplanes).

    Scale shape: the band frame carries only (band, key, id) — vectors
    never ride the band shuffle; candidate pairs (bounded by bucket
    sizes, never corpus-n²) join BACK to the vector table twice for the
    one-dot-fold verify. Rows whose vector length differs from
    n_bands × band_bits cannot band consistently and are excluded (the
    caller's dim contract; NULL vectors fall out the same way)."""
    if band_bits >= 63 or n_bands <= 0 or band_bits <= 0:
        raise ValueError("need 0 < band_bits < 63 and n_bands > 0")
    from custom_vector_database_spark.functions.vector import dot_product, l2_norm

    dim = n_bands * band_bits
    keys = sign_band_keys(vec_col, n_bands, band_bits)
    bands = (
        df.filter(F.size(F.col(vec_col)) == dim)
        .select(F.col(id_col), F.posexplode(keys).alias("band", "key"))
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    vecs = df.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(vec_col).alias("__norm"),
    )
    a = vecs.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
    )
    b = vecs.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    cos_dist = sign_band_cos_dist(
        F.col("__va"), F.col("__vb"), na=F.col("__na"), nb=F.col("__nb")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            cos_dist.alias("cos_dist"),
            (cos_dist <= max_cos_dist).alias("is_near"),
        )
    )


# ---------------------------------------------------------------------------
# Engine-reproducible MinHash signatures (the streaming near-dup sidecar's
# signature scheme; unlike MLlib's MinHashLSH, whose seeded murmur hashes
# are engine-private, every value here is md5 + integer arithmetic a SQL
# oracle recomputes exactly).
# ---------------------------------------------------------------------------
MINHASH_P = 2_147_483_647  # Mersenne prime 2^31-1: h,a < P keeps h*a+b < 2^62

def minhash_perm_consts(n_perms: int) -> list[tuple[int, int]]:
    """Fixed affine-permutation constants (a_j, b_j), a_j != 0, shared
    verbatim by the Spark expression and the DuckDB oracle."""
    return [
        (((j + 1) * 2_654_435_761) % MINHASH_P or 1, ((j + 1) * 40_503) % MINHASH_P)
        for j in range(n_perms)
    ]


def with_minhash_sig(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "sig",
    n_perms: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Append a MinHash signature column (array<long> length ``n_perms``,
    NULL when the document has fewer than ``shingle_n`` tokens):
    component j = MIN over distinct word shingles of
    (a_j · h + b_j) mod P, h = first-15-hex(md5(shingle)) mod P.

    One md5 per shingle (materialized as an intermediate column so the
    n_perms affine maps reuse it instead of re-hashing), then n_perms
    cheap integer transforms — all codegen, no UDF. Docs shorter than a
    shingle get a NULL signature: they can never be NEAR-duplicates
    (no shingle evidence), only exact ones (fingerprint path)."""
    hs_col = f"__mh_hs_{out_col}"
    hs = F.transform(
        shingles(text_col, shingle_n),
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(MINHASH_P),
        ),
    )
    def _affine(a: int, b: int):
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_P))

    comps = [
        F.array_min(F.transform(F.col(hs_col), _affine(a, b)))
        for a, b in minhash_perm_consts(n_perms)
    ]
    return (
        df.withColumn(hs_col, hs)
        .withColumn(
            out_col,
            F.when(F.size(hs_col) > 0, F.array(*comps)).otherwise(
                F.lit(None).cast("array<long>")
            ),
        )
        .drop(hs_col)
    )


def sig_band_structs(sig_col: Column | str, n_perms: int, n_bands: int) -> Column:
    """LSH band hashes of a MinHash signature: array<struct<band:int,
    bh:bigint>> with bh = first-15-hex(md5('_'-joined band components)) —
    the '_' join in component order makes the band key a pure string
    function both engines compute identically. NULL signature -> empty
    array (short docs emit no bands)."""
    if n_bands <= 0 or n_perms % n_bands:
        raise ValueError(
            f"n_bands must be positive and divide n_perms evenly "
            f"(got n_perms={n_perms}, n_bands={n_bands})"
        )
    r = n_perms // n_bands
    c = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at(c, b * r + i + 1).cast("string")
                                for i in range(r)
                            ],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("bh"),
        )
        for b in range(n_bands)
    ]
    return F.when(c.isNotNull(), F.array(*bands)).otherwise(
        F.array().cast("array<struct<band:int,bh:bigint>>")
    )


def sig_agreement(a: Column | str, b: Column | str) -> Column:
    """Number of equal components between two equal-length signatures —
    the unbiased Jaccard estimator's numerator (matches/n_perms ≈ J)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.size(
        F.filter(F.zip_with(ca, cb, lambda x, y: x == y), lambda m: m)
    )


def neardup_contamination(
    train: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perms: int = 16,
    n_bands: int = 4,
    min_agree: int = 8,
) -> DataFrame:
    """NEAR-duplicate benchmark decontamination — the fuzzy sibling of
    cross_corpus_contamination (which counts EXACT shingle overlap and
    understates reformatted leaks: a dot-level edit keeps the token
    stream but changes nothing it measures per-shingle). Flags every
    train document that is an LSH band-collision candidate of some
    holdout document with MinHash signature agreement >= ``min_agree``
    of ``n_perms`` (agreement/n_perms ≈ Jaccard). Returns
    (id, n_cand, max_agree, contaminated) for every train doc —
    n_cand = distinct holdout docs band-colliding with it, max_agree the
    best agreement among them (0/0/false when no candidate, including
    docs too short to shingle).

    Scale shape: one signature encode per corpus (engine-reproducible
    with_minhash_sig — codegen, no UDF); the holdout's exploded band
    rows BROADCAST (eval benchmarks are thousands of docs — kilobytes of
    (band, bh, id) triples), so the train side shuffles only its
    band-collision candidates into the per-train-doc max aggregate. No
    document pair outside a band collision is ever materialized, and
    the train corpus text never rides a shuffle."""
    tsig = with_minhash_sig(train, text_col, "__sig", n_perms).select(
        F.col(id_col), "__sig"
    )
    hsig = with_minhash_sig(holdout, text_col, "__sig", n_perms).select(
        F.col(id_col).alias("__hid"), F.col("__sig").alias("__hsig")
    )
    tb = tsig.select(
        id_col,
        "__sig",
        F.explode(sig_band_structs("__sig", n_perms, n_bands)).alias("b"),
    ).select(id_col, "__sig", "b.band", "b.bh")
    hb = hsig.select(
        "__hid",
        "__hsig",
        F.explode(sig_band_structs("__hsig", n_perms, n_bands)).alias("b"),
    ).select("__hid", "__hsig", "b.band", "b.bh")
    cand = (
        tb.join(F.broadcast(hb), ["band", "bh"])
        .select(id_col, "__sig", "__hid", "__hsig")
        .distinct()
    )
    per_doc = (
        cand.withColumn("__m", sig_agreement("__sig", "__hsig"))
        .groupBy(id_col)
        .agg(
            F.count_distinct("__hid").alias("n_cand"),
            F.max("__m").alias("max_agree"),
        )
    )
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
            F.coalesce("max_agree", F.lit(0)).alias("max_agree"),
            (F.coalesce("max_agree", F.lit(0)) >= min_agree).alias(
                "contaminated"
            ),
        )
    )


def semantic_contamination(
    train: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    n_bands: int = 4,
    band_bits: int = 16,
    max_cos_dist: float = 0.1,
) -> DataFrame:
    """SEMANTIC benchmark decontamination — the embedding member of the
    decontamination trio (exact shingle overlap: cross_corpus_
    contamination; fuzzy text: neardup_contamination; THIS: the
    duplicate key is the vector, catching paraphrased or translated
    leaks that share neither shingles nor minhash bands). Flags every
    train document whose embedding is a sign-band collision candidate
    of some holdout embedding at exact round-6 cosine distance <=
    ``max_cos_dist`` (sign_band_keys + sign_band_cos_dist — the ONE
    band-then-verify definition shared with the batch pair operator and
    the streaming sidecar, so an oracle recomputes every flag).
    Returns (id, n_cand, min_cos_dist, contaminated) for every train
    doc — n_cand = distinct holdout docs band-colliding with it,
    min_cos_dist the closest verified candidate (NULL when no
    candidate or undecidable vectors only).

    Scale shape: the holdout's exploded (band, key, id, vec) rows
    BROADCAST (eval benchmarks are thousands of docs); the train side
    shuffles only its band-collision candidates into the per-train-doc
    min aggregate. No pair outside a band collision is materialized.
    Train rows whose vector cannot band (NULL / off-dim) report
    0/NULL/false — the caller's dim contract, as in
    sign_band_neardup_pairs."""
    if band_bits >= 63 or n_bands <= 0 or band_bits <= 0:
        raise ValueError("need 0 < band_bits < 63 and n_bands > 0")
    dim = n_bands * band_bits
    tb = (
        train.filter(F.size(F.col(vec_col)) == dim)
        .select(
            F.col(id_col),
            F.col(vec_col).alias("__tv"),
            F.posexplode(
                sign_band_keys(vec_col, n_bands, band_bits)
            ).alias("band", "key"),
        )
    )
    hb = (
        holdout.filter(F.size(F.col(vec_col)) == dim)
        .select(
            F.col(id_col).alias("__hid"),
            F.col(vec_col).alias("__hv"),
            F.posexplode(
                sign_band_keys(vec_col, n_bands, band_bits)
            ).alias("band", "key"),
        )
    )
    cand = (
        tb.join(F.broadcast(hb), ["band", "key"])
        .select(id_col, "__tv", "__hid", "__hv")
        .distinct()
    )
    per_doc = (
        cand.withColumn("__cd", sign_band_cos_dist("__tv", "__hv"))
        .groupBy(id_col)
        .agg(
            F.count_distinct("__hid").alias("n_cand"),
            F.min("__cd").alias("min_cos_dist"),
        )
    )
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
            F.col("min_cos_dist"),
            F.coalesce(
                F.col("min_cos_dist") <= F.lit(float(max_cos_dist)),
                F.lit(False),
            ).alias("contaminated"),
        )
    )
