"""Corpus-curation operators for LLM training-data pipelines (builder
brief): domain-mixture resampling, token-budget sequence packing,
cross-document boilerplate detection, and embedding outlier scoring.

These are the verbs a pretraining data pipeline runs AFTER dedup/quality
filtering (operators/dedup.py, operators/text.py): decide how much of each
domain to keep (mixture), turn documents into model-sized training
sequences (packing), strip template/boilerplate n-grams the quality score
misses (boilerplate), and flag embedding-space anomalies for audit
(outliers).

Scale shapes:
- mixture_resample  — quota-exact stratified selection: one tiny per-stratum
                      count aggregate, one md5-ordered rank window per
                      stratum. The window is a per-stratum sort (the same
                      cost class as any global ORDER BY — range-partitioned
                      at scale); when ±√n quota tolerance is acceptable the
                      zero-shuffle md5-THRESHOLD variant (see
                      queries/pipeline_queries.dataset_split_docs) is the
                      cheaper path. Selection is a pure function of
                      md5(key), so it is reproducible across engines,
                      reruns, and repartitioning, and stable under appends
                      of new strata.
- pack_sequences    — concat-and-chunk packing: one running-sum window per
                      shard column. Packing is embarrassingly parallel
                      across shards (each shard's window is independent);
                      a 100 TB corpus packs per shard/partition exactly
                      like production tokenizer pipelines do.
- boilerplate_ngrams — inverted-index doc-frequency: explode shingles once,
                      count docs per shingle, semi-join each doc's
                      shingles against the boilerplate set. No document
                      pairs are ever materialized (same bound as
                      decontamination, dedup.cross_corpus_contamination).
- centroid_outliers — per-label centroids from exact integer micro-sums
                      (order-independent), broadcast back (n_labels×dim
                      doubles — tiny at any corpus scale), per-row distance
                      as ONE codegen'd zip_with/aggregate fold, then a
                      per-label top-k window. No explode of the vector
                      column ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from custom_vector_database_spark.operators.text import shingles, tokenize

__all__ = [
    "mixture_resample",
    "pack_sequences",
    "boilerplate_ngrams",
    "label_centroids",
    "centroid_outliers",
    "length_buckets",
    "unigram_logprob",
    "bigram_logprob",
    "leakage_safe_split",
    "cap_per_group",
    "dsir_logweights",
    "dsir_resample",
    "dsir_bucket_logratios",
    "dsir_score_with",
]


# ---------------------------------------------------------------------------
# Domain-mixture resampling.
# ---------------------------------------------------------------------------
def mixture_resample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Deterministically select the LARGEST possible subset whose stratum
    proportions match integer ``weights`` exactly (up to per-stratum
    floor) — the data-mixture step of a pretraining pipeline ("2 parts
    web, 1 part code, 1 part books…").

    With W = Σ weights: the achievable total is
    N = min_s floor(count_s · W / w_s) (the stratum that runs out first
    binds the budget), and each stratum contributes
    take_s = floor(w_s · N / W) rows. Rows are chosen by md5(key) rank
    within the stratum — a pure function of the data, so the sample is
    identical in any engine and stable under reruns/repartitioning.
    All budget arithmetic is integer (div), never float.

    Strata not present in ``weights`` are dropped (weight 0). Returns the
    selected rows with their stratum rank ``rk`` (1-based).
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be non-empty positive integers")
    w_total = sum(weights.values())
    spark = df.sparkSession
    # stratum field type follows the input column (string domains, integer
    # domain ids, ... — nothing here requires string strata)
    from pyspark.sql.types import LongType, StructField, StructType

    stratum_type = df.schema[stratum_col].dataType
    wdf = spark.createDataFrame(
        [(k, int(v)) for k, v in weights.items()],
        StructType(
            [
                StructField(stratum_col, stratum_type, False),
                StructField("w", LongType(), False),
            ]
        ),
    )
    present = (
        df.join(F.broadcast(wdf), stratum_col)
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # LEFT join from the weight table so a weighted stratum with ZERO rows
    # counts as 0 — exact proportions are then unsatisfiable and N = 0
    # (empty selection), rather than silently dropping the stratum from
    # the mixture
    counts = wdf.join(F.broadcast(present), stratum_col, "left").select(
        stratum_col, "w", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    # N = min_s floor(cnt_s * W / w_s): one-row aggregate, cross-joined back
    n_row = counts.select(
        F.min(F.expr(f"cnt * {w_total} div w")).alias("n_total")
    )
    takes = (
        counts.crossJoin(F.broadcast(n_row))
        .select(
            stratum_col,
            F.expr(f"w * n_total div {w_total}").alias("take"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy(stratum_col).orderBy(
            F.md5(F.col(key_col).cast("string")), key_col
        )
    )
    return (
        df.join(F.broadcast(wdf.select(stratum_col)), stratum_col)
        .withColumn("rk", rk)
        .join(F.broadcast(takes), stratum_col)
        .filter(F.col("rk") <= F.col("take"))
        .drop("take")
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing.
# ---------------------------------------------------------------------------
def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str | list[str],
    budget: int,
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a training sequence under concat-and-chunk
    packing: within a shard, documents are laid out in ``order_col`` order
    and the token stream is cut every ``budget`` tokens; a document belongs
    to the sequence where it STARTS (the standard attribution when
    documents may straddle chunk boundaries).

    ``order_col`` (a column name or a list of them) MUST be a total order
    within each shard — ties would make the running sum's accumulation
    order engine-/partitioning-dependent and seq_id nondeterministic.
    Pass the unique document id, or end the list with one.

    Adds (n_tokens, seq_id). seq_id = (cumulative tokens before this doc)
    div budget — one running-sum window per shard, exact LONG integer
    arithmetic end to end (a float division here would start misassigning
    seq_ids past ~2^53 cumulative tokens per shard), reproducible in any
    engine.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    n_tokens = F.size(tokenize(text_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(F.col("n_tokens")).over(w) - F.col("n_tokens")
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("_tokens_before", before.cast("long"))
        .withColumn(
            "seq_id", F.expr(f"_tokens_before div CAST({int(budget)} AS BIGINT)")
        )
        .drop("_tokens_before")
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate n-grams.
# ---------------------------------------------------------------------------
def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 3,
) -> DataFrame:
    """Per-document boilerplate statistics: a word ``n``-gram is
    boilerplate when it appears in at least ``min_docs`` DISTINCT
    documents (template headers/footers, license blurbs, generation
    loops shared across pages — the cross-document complement of the
    intra-document repetition_ratio rule).

    Returns one row per input document: (id, n_shingles, n_boiler,
    boiler_frac) where boiler_frac = n_boiler / n_shingles over the
    document's DISTINCT shingles (0.0 for docs shorter than n tokens).

    Shape: the exploded shingle index is materialized once
    (localCheckpoint — same barrier rationale as ngram_jaccard_pairs);
    doc-frequency is one map-side-combined count per shingle; the
    boilerplate probe is a semi-join of the index against the filtered
    shingle set. No document pairs exist anywhere.
    """
    inv = df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    ).localCheckpoint(eager=True)
    # shingles() emits distinct grams per doc, so COUNT(*) per shingle IS
    # the document frequency
    boiler = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .filter(F.col("dfreq") >= min_docs)
        .select("shingle")
    )
    totals = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    boiler_counts = (
        inv.join(boiler, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(boiler_counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            F.round(
                F.when(
                    F.coalesce("n_shingles", F.lit(0)) > 0,
                    F.coalesce("n_boiler", F.lit(0)).cast("double")
                    / F.col("n_shingles"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("boiler_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding outliers: distance to the label centroid.
# ---------------------------------------------------------------------------
def label_centroids(
    df: DataFrame,
    label_col: str | list[str] = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(*labels, n, centroid array<double>) per label group — ``label_col``
    may be a list for composite groupings (e.g. (label, snapshot) for the
    drift monitor: ONE explode pass computes every group's centroid).
    Component sums are exact integer micro-sums (floor(x·1e6) as BIGINT —
    the centroid_per_label pattern), so the cross-row aggregation is
    associative and engine/order-independent; each component then pays
    exactly ONE IEEE division s/(n·1e6), which every engine computes
    identically. The result is n_groups × dim doubles — broadcastable at
    any corpus scale."""
    labels = [label_col] if isinstance(label_col, str) else list(label_col)
    parts = df.select(
        *labels, F.posexplode(vec_col).alias("pos", "val")
    ).select(
        *labels,
        "pos",
        F.floor(F.col("val").cast("double") * 1e6).cast("long").alias("micro"),
    )
    sums = parts.groupBy(*labels, "pos").agg(
        F.count(F.lit(1)).alias("n"), F.sum("micro").alias("s")
    )
    comp = sums.select(
        *labels,
        "pos",
        "n",
        (F.col("s").cast("double") / (F.col("n").cast("double") * 1e6)).alias("c"),
    )
    return comp.groupBy(*labels).agg(
        F.max("n").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid"),
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` embedding outliers per label: squared L2 distance to the
    label centroid, ranked descending — the audit query that surfaces
    mislabeled / out-of-distribution vectors before they poison an index
    or a training mix.

    The distance is a per-row zip_with/aggregate fold over the broadcast
    centroid (whole-stage codegen, fixed element order — so the float sum
    is deterministic and, with round(6), oracle-matchable); ranking is a
    per-label top-k window over (dist2, id) scalars. The vector column
    never shuffles."""
    cents = label_centroids(df, label_col=label_col, vec_col=vec_col)
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = df.join(F.broadcast(cents), label_col).select(
        F.col(label_col), F.col(id_col), F.round(d2, 6).alias("dist2")
    )
    rk = F.row_number().over(
        Window.partitionBy(label_col).orderBy(F.desc("dist2"), id_col)
    )
    return scored.withColumn("rk", rk).filter(F.col("rk") <= k)


# ---------------------------------------------------------------------------
# Length-bucketed batching.
# ---------------------------------------------------------------------------
def length_buckets(
    df: DataFrame,
    shard_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4,
) -> DataFrame:
    """Assign each document to a length bucket within its shard: ntile
    over (token count, id) — the batching trick that groups similar-length
    sequences so per-batch padding waste (pad-to-longest) stays small.

    Adds (n_tokens, bucket). Exact ntile needs a per-shard sort (the same
    cost class as any ORDER BY — range-partitioned at scale); when exact
    equal-size buckets aren't required, approx-quantile cut points give a
    zero-sort variant (percentile_approx thresholds + a filter)."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    n_tokens = F.size(tokenize(text_col))
    w = Window.partitionBy(shard_col).orderBy("n_tokens", id_col)
    return df.withColumn("n_tokens", n_tokens).withColumn(
        "bucket", F.ntile(n_buckets).over(w)
    )


# ---------------------------------------------------------------------------
# Unigram log-probability quality score.
# ---------------------------------------------------------------------------
def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average unigram log-probability — the classic cheap
    perplexity proxy (a KenLM-style LM score without the LM): documents
    full of corpus-rare tokens score low; templated/common text scores
    high. Two passes over the token index: vocabulary counts, then a
    per-doc sum of token log-probs.

    Cross-engine boundary risk, quantified: the one ln() per DISTINCT
    token may differ by 1 ulp between JVM and libm; floor(1e6·ln) flips
    only when the fractional part lies within ~2e-9 of 0, so the
    per-token flip odds are ~2e-9 — material only past ~1e8 distinct
    tokens, far beyond any unigram vocabulary (and the oracle harness
    only ever checks fixture-scale vocabularies).

    Determinism: per-token logprob is floor(1e6 · ln(count/total)) — the
    ln runs once per DISTINCT token on an exact integer ratio and is
    floored to an integer, so the per-doc aggregation is an exact BIGINT
    sum (associative, engine-independent); the final average is one IEEE
    division. Shape: two codegen tokenize passes (vocab counts, then the
    per-doc probe) — deliberately NOT a materialized token index: unlike
    the shingle self-join in ngram_jaccard_pairs (3 evaluations feeding
    one stage), the two consumers here are separate stages, and at scale
    re-running a codegen'd tokenize is cheaper than writing the whole
    O(tokens) stream to executor disk (measured equal-or-better at the
    10x probe too). Vocab counts are a map-side-combined aggregate.

    Returns (id, n_tokens, lp_micro_sum, avg_logprob)."""
    toks = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total_row = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total_row)).select(
        "token",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("lp_micro"),
    )
    # BROADCAST the per-token logprob table: it is O(distinct tokens)
    # (unigram vocabularies are ~1e6-1e7 entries — megabytes), while a
    # hash join keyed on the token would shuffle the WHOLE token stream
    # into heavy-hitter-skewed partitions (Zipf: the top token alone is
    # ~5% of all rows). Measured 21 s -> 9 s at the 10x probe scale.
    per_doc = (
        toks.join(F.broadcast(lp), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp_micro").alias("lp_micro_sum"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("lp_micro_sum", F.lit(0)).alias("lp_micro_sum"),
            F.round(
                F.when(
                    F.coalesce("n_tokens", F.lit(0)) > 0,
                    F.col("lp_micro_sum").cast("double")
                    / (F.col("n_tokens").cast("double") * 1e6),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split.
# ---------------------------------------------------------------------------
def leakage_safe_split(
    df: DataFrame,
    cluster_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hashing the near-dup CLUSTER id instead of
    the document id, so every member of a duplicate cluster lands in the
    SAME split — the contamination guard a per-document split lacks: a
    near-duplicate of a training document in the test split silently
    inflates eval (the classic train/test leakage mode of web-scale
    corpora; see the dedup literature's motivation for cluster-level
    handling). Compose with operators/graph.connected_components over any
    near-dup pair source (n-gram Jaccard, MinHash, SimHash, embedding
    cosine) to produce ``cluster_col``.

    Same determinism contract as the md5-threshold split
    (queries/pipeline_queries.dataset_split_docs): the split is a pure
    function of md5(cluster_id) against exact integer thresholds
    (floor(frac·2^60) — identical arithmetic in any engine), so it is
    reproducible across engines, reruns, and repartitioning, and adding
    new documents to an EXISTING cluster never moves that cluster.
    One codegen expression, zero shuffles."""
    if not (0.0 < train_frac and 0.0 <= val_frac and train_frac + val_frac < 1.0):
        raise ValueError("need 0 < train_frac, 0 <= val_frac, sum < 1")
    import math
    from fractions import Fraction

    # exact floor(frac * 2^60) from the DECIMAL the caller wrote, not the
    # nearest binary float: int(0.8 * (1 << 60)) is 52 too high, which
    # would put a (vanishingly rare but real) hash band in 'train' here
    # and 'val' in any engine computing the documented floor
    t1 = math.floor(Fraction(str(train_frac)) * (1 << 60))
    t2 = math.floor((Fraction(str(train_frac)) + Fraction(str(val_frac))) * (1 << 60))
    h = F.conv(
        F.substring(F.md5(F.col(cluster_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    split = (
        F.when(h < F.lit(t1), "train")
        .when(h < F.lit(t2), "val")
        .otherwise("test")
    )
    return df.withColumn(split_col, split)


# ---------------------------------------------------------------------------
# Per-source cap (domain caps — the Gopher/C4-style rule limiting any one
# domain's share of the corpus).
# ---------------------------------------------------------------------------
def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, selected by md5(id) rank
    (id tie-break) — a deterministic uniform-without-replacement draw per
    group, reproducible across engines, reruns, and repartitioning
    (same contract as the md5-threshold split family). The over-cap
    groups are exactly the heavy domains the rule exists to dampen.

    Shape: one window partitioned by the group — the shuffle is keyed on
    the group column, and rank state per partition is O(1). A skewed
    mega-domain makes that one partition wide; if a single domain
    outgrows an executor, pre-aggregate with a salted count to find the
    heavy groups and sample them by md5-threshold instead of ranking."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document add-one-smoothed bigram log-likelihood — the
    second-order perplexity proxy (unigram_logprob's big sibling): docs
    whose CONTEXT-conditional transitions are improbable under the
    corpus score low even when their individual words are common (the
    word-salad failure mode the unigram model cannot see).

    P(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V), V = unigram vocab size —
    add-one smoothing keeps every transition finite. Per-token log-probs
    become floor(1e6·ln p) micro-integers so per-doc sums are exact
    BIGINTs in any engine (the unigram operator's contract).

    Shape: one tokenize pass feeds the bigram explode; counts are two
    map-side-combined aggregates; scoring joins the bigram stream to
    its probability table keyed ON THE BIGRAM — a shuffle join, not the
    unigram path's broadcast: a bigram vocabulary is O(corpus) at scale
    (1e8+ rows — too big to broadcast) and its frequency distribution
    is far flatter than the unigram Zipf head, so the hash join's skew
    exposure is mild (salt the top transitions if a corpus proves
    otherwise). Returns (id, n_bigrams, lp_micro_sum, avg_logprob).
    """
    toks = tokenize(F.col(text_col))
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    big = df.select(F.col(id_col), F.explode(grams).alias("bigram"))
    bcnt = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    left = bcnt.withColumn(
        "w1", F.substring_index("bigram", " ", 1)
    )
    lcnt = left.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v_row = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("token"))
        .agg(F.count_distinct("token").alias("v"))
    )
    lp = (
        left.join(lcnt, "w1")
        .crossJoin(F.broadcast(v_row))
        .select(
            "bigram",
            F.floor(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    per_doc = (
        big.join(lp, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").alias("lp_micro_sum"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("lp_micro_sum", F.lit(0)).alias("lp_micro_sum"),
            F.round(
                F.when(
                    F.coalesce("n_bigrams", F.lit(0)) > 0,
                    F.col("lp_micro_sum").cast("double")
                    / (F.col("n_bigrams").cast("double") * 1e6),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
# arXiv:2302.03169) — select raw-pool documents whose hashed-n-gram
# distribution looks like a TARGET corpus.
# ---------------------------------------------------------------------------

# The DuckDB twins of _dsir_gram_stream below — defined HERE, next to the
# Spark expression they mirror, so the feature convention cannot silently
# fork between the DSIR oracles (dsir_select_docs in curation_queries and
# the gate oracle in pipeline_queries both import these; keeping them in a
# query module would cycle the query-package imports).
DSIR_GRAMS_DUCK = (
    "toks || CASE WHEN len(toks) >= 2 THEN list_transform("
    "range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) "
    "ELSE [] END"
)


def dsir_bucket_duck(num_buckets: int) -> str:
    return (
        "CAST(CAST(concat('0x', substr(md5(gram), 1, 8)) AS BIGINT) "
        f"% {num_buckets} AS INT)"
    )


def _dsir_gram_stream(
    df: DataFrame, cols: list[str], text_col: str, num_buckets: int
) -> DataFrame:
    """The DSIR feature stream: hashed unigram+bigram bucket per gram —
    ONE definition shared by weight fitting, scoring, and the gate, so a
    persisted log-ratio table always hashes exactly like its probes."""
    from custom_vector_database_spark.operators.text import (
        md5_prefix_long,
        positioned_grams,
    )

    grams = F.concat(tokenize(text_col), positioned_grams(text_col, 2))
    return df.select(*cols, F.explode(grams).alias("gram")).select(
        *cols,
        (md5_prefix_long("gram", 8) % num_buckets).cast("int").alias("bucket"),
    )


def _dsir_lr(spark, pc: DataFrame, qc: DataFrame, b: int) -> DataFrame:
    """Assemble the (bucket, lr_micro) log-ratio table from target/pool
    bucket-count frames: floor(1e6·ln p̂_b) − floor(1e6·ln q̂_b), add-one
    smoothed — exact BIGINT per bucket."""

    def log_micro(cnt_col: str, tot_col: str) -> Column:
        return F.floor(
            F.log(
                (F.coalesce(F.col(cnt_col), F.lit(0)) + F.lit(1.0))
                / (F.coalesce(F.col(tot_col), F.lit(0)) + F.lit(float(b)))
            )
            * 1e6
        ).cast("long")

    spine = spark.range(b).select(F.col("id").cast("int").alias("bucket"))
    pt = pc.agg(F.sum("pc").alias("pc_tot"))
    qt = qc.agg(F.sum("qc").alias("qc_tot"))
    return (
        spine.join(pc, "bucket", "left")
        .join(qc, "bucket", "left")
        .crossJoin(F.broadcast(pt))
        .crossJoin(F.broadcast(qt))
        .select(
            "bucket",
            (log_micro("pc", "pc_tot") - log_micro("qc", "qc_tot")).alias(
                "lr_micro"
            ),
        )
    )


def _dsir_score_tf(
    docs: DataFrame, tf: DataFrame, lr: DataFrame, id_col: str
) -> DataFrame:
    """Score a (id, bucket, tf) frame against a broadcast log-ratio table:
    (id, n_grams, logw_micro), gram-less docs at 0/0."""
    per_doc = (
        tf.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_grams"),
            F.sum(F.col("tf") * F.col("lr_micro")).alias("logw_micro"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("logw_micro", F.lit(0)).alias("logw_micro"),
        )
    )


def dsir_bucket_logratios(
    pool: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = 64,
) -> DataFrame:
    """Fit the DSIR log-ratio table alone — (bucket, lr_micro), tiny
    (num_buckets rows) — for the fit-once / score-many shape: persist it
    and gate arriving data with dsir_score_with (the streaming quality
    gate, streaming/stream_ops.stream_corpus_dsir_ingest). p̂ from
    ``target``, q̂ from ``pool`` (add-one smoothed hashed unigram+bigram
    distributions, the paper's features)."""
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    pc = (
        _dsir_gram_stream(target, [], text_col, num_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    qc = (
        _dsir_gram_stream(pool, [], text_col, num_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("qc"))
    )
    return _dsir_lr(pool.sparkSession, pc, qc, num_buckets)


def dsir_score_with(
    lr: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> DataFrame:
    """Score documents against a PRECOMPUTED log-ratio table (the other
    half of the fit-once / score-many split): one codegen tokenize+hash
    pass over ``docs``, a map-side-combined (id, bucket) aggregate, a
    broadcast of the num_buckets-row table. ``num_buckets`` MUST equal
    the fit's (the caller persists it next to the table — see
    stream_ops.fit_dsir_gate's meta file)."""
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    tf = (
        _dsir_gram_stream(docs, [id_col], text_col, num_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _dsir_score_tf(docs, tf, lr, id_col)


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> DataFrame:
    """Per-document DSIR importance log-weights, in exact micro-integer
    form: ``(id, n_grams, logw_micro)`` with
    logw_micro = Σ_buckets tf_b · lr_micro(b), where lr_micro(b) =
    floor(1e6·ln p̂_b) − floor(1e6·ln q̂_b) over add-one-smoothed hashed
    unigram+bigram bucket distributions (p̂ from ``target``, q̂ from
    ``raw`` — the paper's bag-of-hashed-ngrams features). High logw =
    the document looks like the target corpus relative to the pool.

    Determinism (the unigram_logprob convention): ln runs once per
    BUCKET on exact integer ratios and is floored to an integer, so the
    per-document aggregation is an exact BIGINT sum — associative,
    engine-independent, no fixed-order fold needed. The only
    cross-engine risk is a 1-ulp ln() divergence flipping a floor,
    odds ~2e-9 per bucket.

    Scale shape: ONE codegen'd tokenize+hash pass per corpus — the raw
    pass feeds a map-side-combined (id, bucket) tf aggregate (≤ docs ×
    num_buckets rows, materialized once) from which BOTH the pool
    distribution q̂ and the per-doc weights roll up; the target pass is
    a groupBy on ≤``num_buckets`` keys. The num_buckets-row log-ratio
    table is BROADCAST back (never a shuffled join keyed on the
    Zipf-skewed bucket). Nothing driver-side except the bucket spine; no
    vocabulary is ever materialized (that is the point of the hashing
    trick — the feature space is fixed-width at any corpus size).
    """
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    # the pool distribution q̂ rolls up from the per-doc tf aggregate —
    # ONE tokenize+hash pass over the raw corpus feeds both q̂ and the
    # per-doc weights (tf is the determinism-critical frame either way)
    tf = (
        _dsir_gram_stream(raw, [id_col], text_col, num_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    qc = tf.groupBy("bucket").agg(F.sum("tf").alias("qc"))
    pc = (
        _dsir_gram_stream(target, [], text_col, num_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    lr = _dsir_lr(raw.sparkSession, pc, qc, num_buckets)
    return _dsir_score_tf(raw, tf, lr, id_col)


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR's second half: sample ``n`` documents without replacement
    with probability ∝ exp(logw) via the Gumbel-top-k identity —
    top-n by logw + Gumbel(0,1), with the Gumbel draw derandomized to
    g = −ln(−ln(u)), u = (md5_32(salt‖id) + 0.5) / 2³², so the selection
    is a pure function of the data (reproducible across engines, reruns,
    and repartitioning — the md5-rank-draw contract of
    mixture_resample). Returns ``(id, n_grams, logw_micro, key_micro)``
    nearest-first; key_micro = logw_micro + floor(1e6·g) stays an exact
    BIGINT so ordering and values are engine-exact. ``n`` ≥ pool size
    returns the whole pool. The selection itself is one
    TakeOrderedAndProject — no extra shuffle beyond dsir_logweights."""
    from custom_vector_database_spark.operators.text import md5_prefix_long

    if n <= 0:
        raise ValueError("n must be positive")
    w = dsir_logweights(
        raw, target, id_col=id_col, text_col=text_col, num_buckets=num_buckets
    )
    u = (
        md5_prefix_long(
            F.concat(F.lit(salt), F.col(id_col).cast("string")), 8
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    g_micro = F.floor(-F.log(-F.log(u)) * 1e6).cast("long")
    return (
        w.withColumn("key_micro", F.col("logw_micro") + g_micro)
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(n)
    )
