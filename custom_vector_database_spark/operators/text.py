"""Text-analysis operators for LLM training-data pipelines — tokenization,
token statistics, quality scoring, language-ID heuristic, fingerprinting,
and shingling. All pure Catalyst column expressions (no Python UDFs): at
100 TB these run inside whole-stage codegen on the JVM, vectorized over the
Parquet scan.

Regex patterns stick to plain character classes so Java regex (Spark) and
RE2 (DuckDB) agree — keeps every one of these oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokenize",
    "token_count",
    "bpe_ish_token_count",
    "stopword_ratio",
    "punct_ratio",
    "quality_score",
    "lang_scores",
    "fingerprint_md5",
    "fingerprint_rolling",
    "shingles",
    "PII_PATTERNS",
    "pii_count",
    "redact_pii",
    "ngram_total_count",
    "repetition_ratio",
    "feature_hash_bucket",
    "hashed_tf",
    "positioned_grams",
    "duplicate_spans",
    "cut_token_spans",
    "winnow_fingerprints",
]

# Tiny per-language marker lists for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "von"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]

# "BPE-ish" token pattern: runs of letters, runs of digits, or single
# non-space punctuation — the classic pre-tokenizer split.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_prefix_long(col: Column | str, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of md5 as a non-negative long — THE
    engine-reproducible hash used everywhere a DuckDB oracle must
    recompute the identical value (feature hashing, winnowing,
    md5-threshold splits). n_hex <= 15 keeps the value inside int64."""
    return F.conv(F.substring(F.md5(_c(col)), 1, n_hex), 16, 10).cast("long")


def tokenize(col: Column | str) -> Column:
    """Lowercase word tokens: split on non-alphanumeric runs, drop empties."""
    toks = F.split(F.lower(_c(col)), "[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Pre-tokenizer-style token count via regexp extraction."""
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords — a quality signal."""
    stopwords = stopwords or EN_STOPWORDS
    toks = tokenize(col)
    stops = F.filter(
        toks, lambda t: F.array_contains(F.array(*[F.lit(s) for s in stopwords]), t)
    )
    return F.when(
        F.size(toks) > 0, F.size(stops).cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = _c(col)
    stripped = F.regexp_replace(F.lower(c), "[a-z0-9 ]", "")
    return F.when(
        F.length(c) > 0, F.length(stripped).cast("double") / F.length(c)
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: rewarded for a natural stopword
    rate and a sane mean token length, penalized for punctuation soup."""
    c = _c(col)
    n_toks = token_count(c)
    mean_tok_len = F.when(n_toks > 0, F.length(c).cast("double") / n_toks).otherwise(
        F.lit(0.0)
    )
    len_ok = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), 1.0).otherwise(0.5)
    stop_component = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    return F.round(
        (stop_component * 0.4 + len_ok * 0.4 + (1.0 - F.least(punct_ratio(c) * 5.0, F.lit(1.0))) * 0.2),
        6,
    )


def lang_scores(col: Column | str) -> list[Column]:
    """One hit-count column per language in LANG_MARKERS (aliased
    ``{lang}_hits``) plus a ``predicted`` column (argmax, ties → 'und')."""
    toks = tokenize(col)

    def _contains(arr: Column):
        # single-arg lambda: a second default arg would make PySpark pass
        # the element INDEX into it (filter's (elem, idx) signature)
        return lambda t: F.array_contains(arr, t)

    hit_cols = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hit_cols[lang] = F.size(F.filter(toks, _contains(arr)))
    best = F.greatest(*hit_cols.values())
    predicted = F.lit("und")
    # deterministic: first language (sorted) reaching the max wins
    for lang in sorted(LANG_MARKERS):
        predicted = F.when(
            (hit_cols[lang] == best) & (best > 0) & (predicted == "und"), F.lit(lang)
        ).otherwise(predicted)
    cols = [hit_cols[lang].alias(f"{lang}_hits") for lang in sorted(LANG_MARKERS)]
    cols.append(predicted.alias("predicted"))
    return cols


def fingerprint_md5(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed). Same digest in Spark and DuckDB."""
    norm = F.trim(F.regexp_replace(F.lower(_c(col)), "[ ]+", " "))
    return F.md5(norm)


# Rolling-hash parameters: classic Rabin–Karp base/modulus. M < 2^31 keeps
# every intermediate (acc*B + code ≤ (M-1)·B + 2^21) far inside int64, so
# the fold is exact in any engine's 64-bit integer arithmetic.
ROLLING_BASE = 131
ROLLING_MOD = 1_000_000_007


def fingerprint_rolling(col: Column | str) -> Column:
    """Polynomial rolling hash (Rabin–Karp / Horner fold) of the normalized
    text: fp = Σ code(c_i)·B^(n-1-i) mod M, folded left-to-right over the
    character code points. This is the fingerprint family used for
    content-defined chunking / winnowing in dedup pipelines; unlike
    fingerprint_md5 it is incrementally maintainable over a sliding window.

    Entirely JVM-side: split-to-chars → ascii() code points → exact integer
    aggregate fold. Reproducible in ANSI SQL (see the
    rolling_fingerprint_docs oracle) because every step is exact int64."""
    norm = F.trim(F.regexp_replace(F.lower(_c(col)), "[ ]+", " "))
    codes = F.transform(F.split(norm, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD,
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) — the dedup unit for
    MinHash/Jaccard.

    Built from n shifted slices of the token array zipped pairwise —
    gram[i] = toks[i] ‖ ' ' ‖ … ‖ toks[i+n-1] — so the tokenizer runs O(n)
    times per row. (The previous sequence+element_at formulation re-evaluated
    the whole tokenize expression per accessed element: ~3·|shingles|
    tokenizations per row, which dominated the profile.)"""
    toks = tokenize(col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))  # shingle count
    parts = [F.slice(toks, F.lit(i + 1), m) for i in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def token_chunks(
    col: Column | str, size: int = 32, overlap: int = 8
) -> Column:
    """Fixed-size overlapping token chunks — the LLM training-data prep
    step that turns documents into model-sized pieces. Returns
    array<struct<chunk string, n_tokens int>> where chunk i covers tokens
    [i·stride, i·stride + size) with stride = size − overlap; the last
    chunk may be short. Pure Catalyst (tokenize → transform/slice), so
    chunking stays in whole-stage codegen and is reproducible in ANSI SQL
    (the doc_chunking oracle).
    """
    if not (0 <= overlap < size):
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap
    # coalesce first: tokenize(NULL) is NULL and would slip past the
    # empty-guard below as a single bogus '' chunk
    toks = tokenize(F.coalesce(_c(col), F.lit("")))
    # chunks beyond the first exist only for tokens PAST the first window:
    # n = 1 + ceil((ntok - size)/stride). The naive ceil(ntok/stride)
    # overcounts whenever ntok mod stride ∈ [1, overlap], emitting a final
    # chunk that is a pure suffix of the previous one (duplicate content).
    n = 1 + F.greatest(
        F.ceil((F.size(toks) - size) / F.lit(stride)).cast("int"), F.lit(0)
    )
    idx = F.sequence(F.lit(0), n - 1)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(toks, i * stride + 1, size)).alias("chunk"),
            F.size(F.slice(toks, i * stride + 1, size)).alias("n_tokens"),
        ),
    )
    return F.when(F.size(toks) == 0, F.expr(
        "array()"
    ).cast("array<struct<chunk:string,n_tokens:int>>")).otherwise(chunks)


# ---------------------------------------------------------------------------
# PII redaction: regex scrubbing — the pre-training privacy pass.
# Patterns stick to character classes + bounded quantifiers so Java regex
# (Spark) and RE2 (DuckDB) match identically, keeping redaction
# oracle-checkable end to end. Each entry: (kind, pattern, replacement).
# ---------------------------------------------------------------------------
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+", "[EMAIL]"),
    ("phone", "[+][0-9][0-9-]{5,}[0-9]", "[PHONE]"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "[IP]"),
]


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind (before redaction)."""
    pattern = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), 0))


def redact_pii(col: Column | str) -> Column:
    """Text with every PII_PATTERNS match replaced by its placeholder.
    Patterns apply in list order over the already-redacted text (so an
    email is never double-counted as a phone); each regexp_replace is a
    single codegen'd pass — no Python in the pipeline."""
    out = _c(col)
    for _, pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


# ---------------------------------------------------------------------------
# Intra-document repetition — the "repeated n-gram fraction" quality rule
# (public Gopher/C4-style filter): highly repetitive documents (boilerplate,
# keyword stuffing, generation loops) get a high ratio and are dropped.
# ---------------------------------------------------------------------------
def ngram_total_count(col: Column | str, n: int = 3) -> Column:
    """TOTAL (non-distinct) word n-gram occurrences: max(|tokens|-n+1, 0)."""
    return F.greatest(F.size(tokenize(col)) - (n - 1), F.lit(0))


def repetition_ratio(col: Column | str, n: int = 3) -> Column:
    """1 - distinct/total n-grams in [0, 1); 0 for docs shorter than n
    tokens. Pure per-row expression — embarrassingly parallel, the scan
    is the only pass."""
    total = ngram_total_count(col, n)
    distinct = F.size(shingles(col, n))
    return F.when(
        total > 0,
        F.round(F.lit(1.0) - distinct.cast("double") / total.cast("double"), 6),
    ).otherwise(F.lit(0.0))


def feature_hash_bucket(col: Column | str, num_buckets: int = 32) -> Column:
    """Feature-hashing bucket for a token column: the first 32 bits of
    md5(token) mod ``num_buckets``. md5 rather than xxhash64 keeps the
    bucket assignment reproducible in ANSI SQL (the feature_hash_docs
    oracle); the hashing-trick collision properties are the same."""
    if num_buckets <= 0:
        # modulo-by-zero would yield NULL buckets silently
        raise ValueError("num_buckets must be positive")
    return (md5_prefix_long(col, 8) % num_buckets).cast("int")


def hashed_tf(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
):
    """Hashed term-frequency features (the hashing trick, Weinberger et
    al. 2009): (id, bucket, tf) sparse rows with bucket =
    md5(token) mod num_buckets — the fixed-width, vocabulary-free
    featurization step of a training pipeline (MLlib's HashingTF, but as
    pure Catalyst expressions with an engine-independent hash, so the
    features themselves are oracle-checkable).

    Shape: one tokenize pass, explode, map-side-combined groupBy on
    (id, bucket) — tf shuffle rows bounded by docs × num_buckets."""
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("token"))
    return (
        toks.select(
            id_col, feature_hash_bucket("token", num_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def positioned_grams(col: Column | str, n: int) -> Column:
    """Word n-grams in POSITION order (array<string>, index i = the gram
    starting at token i) — the span-addressable sibling of shingles(),
    which deduplicates and therefore discards offsets. Same shifted-slice
    construction: O(n) tokenizer evaluations per row."""
    toks = tokenize(col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, F.lit(i + 1), m) for i in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def duplicate_spans(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
):
    """Maximal cross-document duplicated token spans — the span-level
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): any n-token window shared by >= min_docs distinct
    documents marks its tokens duplicated; maximal runs of MARKED TOKENS
    become spans. Two flagged window starts p1 < p2 belong to one span
    whenever p2 <= p1 + n — their token intervals [p, p+n-1] overlap or
    touch — so output spans are DISJOINT per document and span_tokens is
    additive across rows (starts 1 and 3 at n=8 merge to [1, 10], never
    the overlapping [1, 8] + [3, 10] pair; ADVICE r6 finding). Returns
    one row per span: (id, span_start, span_end, span_tokens), 1-based
    token offsets — the cut list a span-level deduper consumes, where
    boilerplate_ngrams only scores documents.

    Shape (all relational, no UDFs): one tokenize pass -> posexplode ->
    map-side-combined groupBy(gram) for document frequency (the inverted
    index — never doc pairs) -> semi-join flagged starts back on gram ->
    per-document islands via lag + running-sum gap detection (two
    same-partitioning windows per document, so state is bounded by the
    longest doc and nothing reshuffles between them).
    """
    grams = df.select(
        F.col(id_col),
        F.posexplode(positioned_grams(F.col(text_col), n)).alias("pos0", "gram"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("dfreq"))
        .filter(F.col("dfreq") >= min_docs)
        .select("gram")
    )
    flagged = grams.join(dup, "gram").select(id_col, "pos")
    return _spans_from_flagged(flagged, id_col, n)


def _spans_from_flagged(flagged, id_col: str, n: int):
    """Maximal disjoint spans from flagged n-token window starts — the
    ONE copy of the island merge shared by duplicate_spans (intra-corpus
    dfreq flags) and contaminated_spans (holdout-membership flags).
    Two flagged starts p1 < p2 merge whenever p2 <= p1 + n (their token
    intervals overlap or touch), so output spans are DISJOINT per
    document and span_tokens is additive across rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    # a gap of more than n between flagged starts leaves at least one
    # unmarked token between their windows — only then does a new
    # island begin (gap <= n means the [pos, pos+n-1] intervals overlap
    # or touch, i.e. one contiguous run of duplicated tokens)
    islands = (
        flagged.withColumn("__gap", F.col("pos") - F.lag("pos").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__gap").isNull() | (F.col("__gap") > n), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("__new").over(w))
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def contaminated_spans(
    train,
    holdout,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
):
    """Maximal TRAIN-doc token spans whose every n-token window appears
    somewhere in the HOLDOUT corpus — duplicate_spans' inverted-index +
    island machinery with the flag condition swapped from intra-corpus
    document frequency to holdout-gram membership (the span-level form
    of cross_corpus_contamination, dedup.py): a train position is
    flagged iff its n-gram exists in the holdout's DISTINCT gram set,
    and maximal runs of flagged windows become (id, span_start,
    span_end, span_tokens) rows — the cut list decontaminate_span_cut
    feeds to cut_token_spans.

    Scale shape: the holdout's distinct grams are an aggregate far
    smaller than the holdout (eval sets are small by construction at
    100 TB), joined to train grams on the gram — no doc pair, no
    train-width state; the island windows partition by train doc."""
    train_grams = train.select(
        F.col(id_col),
        F.posexplode(positioned_grams(F.col(text_col), n)).alias("pos0", "gram"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "gram")
    holdout_grams = (
        holdout.select(
            F.explode(positioned_grams(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    flagged = train_grams.join(holdout_grams, "gram", "left_semi").select(
        id_col, "pos"
    )
    return _spans_from_flagged(flagged, id_col, n)


def decontaminate_span_cut(
    train,
    holdout,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
):
    """Span-level decontamination: cut the holdout-contaminated spans
    out of each train document and KEEP the document — the surgical
    alternative to doc-drop decontamination (decontaminate_docs /
    neardup_decontaminate_docs flag whole docs; against a large train
    corpus, dropping a whole document for one leaked paragraph costs
    real yield). Composes contaminated_spans' cut list with
    cut_token_spans' indexed-filter surgery; ownership policy is
    implicit — the HOLDOUT owns every leaked span, so all occurrences
    in train are cut. Returns (id, n_tokens, n_cut, cleaned)."""
    spans = contaminated_spans(
        train, holdout, id_col=id_col, text_col=text_col, n=n
    )
    return cut_token_spans(train, spans, id_col=id_col, text_col=text_col)


def cut_token_spans(
    df,
    spans,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Apply a span cut-list to documents: remove the tokens covered by
    each doc's (span_start, span_end) intervals (1-based, inclusive —
    duplicate_spans' output shape) and rebuild the cleaned text from the
    survivors. This is the surgery half of span-level dedup: pair with
    duplicate_spans and a KEEP POLICY of the caller's choosing (e.g.
    filter the span table to all-but-one occurrence before passing it
    here — ownership is policy, mechanics are this operator).

    Shape: spans aggregate to one array per document (bounded by the
    doc's own span count), broadcast-friendly join back to the doc
    table, then ONE codegen projection — an indexed filter over the
    token array with an exists() probe per token. No shuffle beyond the
    span groupBy. Returns (id, n_tokens, n_cut, cleaned) where cleaned
    is the surviving tokens joined by single spaces (the tokenizer is
    lossy by design — token-level dedup operates on token streams).
    """
    spans_per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    toks = tokenize(F.col(text_col))
    covered = lambda t, i: F.exists(  # noqa: E731 — inline 2-arg lambda
        F.col("__spans"),
        lambda s: (s["span_start"] <= i + 1) & (i + 1 <= s["span_end"]),
    )
    kept = F.filter(toks, lambda t, i: ~covered(t, i))
    kept_or_all = F.when(F.col("__spans").isNull(), toks).otherwise(kept)
    return (
        df.join(spans_per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.size(toks).alias("n_tokens"),
            # size of the kept ARRAY, not a re-tokenize of the joined
            # string - the second full-text pass was pure waste
            F.size(kept_or_all).alias("__n_kept"),
            F.array_join(kept_or_all, " ").alias("cleaned"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.col("__n_kept")).alias("n_cut"),
            "cleaned",
        )
    )


def winnow_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    w: int = 4,
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003): hash every word n-gram, slide a window of ``w`` consecutive
    hashes, and in each window select the minimal hash (rightmost on
    ties) — the selected (position, hash) set is the fingerprint. The
    guarantee that makes winnowing the plagiarism/local-similarity
    fingerprint: any shared substring of at least n + w - 1 tokens
    yields at least one IDENTICAL selected hash in both documents, and
    expected density is 2/(w+1) — a tunable, position-robust sample
    where fingerprint_md5 is all-or-nothing and fingerprint_rolling is
    whole-document.

    Shape: one tokenize pass -> positioned n-gram hashes -> explode the
    w window memberships per gram (a bounded w× row blowup of
    (id, window, pos, hash) scalars — never text) -> per-window
    rightmost-min via one row_number window -> distinct selected
    positions per doc. Hashes are md5-prefix integers, so the whole
    fingerprint is engine-reproducible. Returns per document:
    (id, n_grams, n_selected, fp_checksum) with the checksum summing
    selected hashes mod 1e9+7 (exact BIGINT in any engine)."""
    if n <= 0 or w <= 0:
        raise ValueError("n and w must be positive")
    grams = positioned_grams(F.col(text_col), n)
    # ONE pass over the text builds (n_grams, pos, hash) — posexplode_outer
    # keeps zero-gram docs as a NULL row so the doc totals come from the
    # SAME scan; materialized once because two consumers (totals + the
    # window pick) read it (the ngram_jaccard inverted-index pattern)
    rows = (
        df.select(F.col(id_col), grams.alias("__g"))
        .select(
            F.col(id_col),
            F.size("__g").alias("n_grams"),
            F.posexplode_outer("__g").alias("pos0", "gram"),
        )
        .select(
            id_col,
            "n_grams",
            (F.col("pos0") + 1).alias("pos"),
            md5_prefix_long("gram", 15).alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    totals = rows.groupBy(id_col).agg(F.max("n_grams").alias("n_grams"))
    # gram at pos belongs to windows starting at s in
    # [max(pos-w+1, 1), min(pos, n_grams-w+1)] — the upper clip drops the
    # trailing short-window starts BEFORE they reach the ranking shuffle
    lo = F.greatest(F.col("pos") - (w - 1), F.lit(1))
    hi = F.least(F.col("pos"), F.col("n_grams") - (w - 1))
    member = rows.filter(F.col("pos").isNotNull()).select(
        id_col,
        "pos",
        "h",
        F.explode(
            F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("s"),
    )
    from pyspark.sql import Window

    pick = Window.partitionBy(id_col, "s").orderBy(
        F.col("h").asc(), F.col("pos").desc()
    )
    selected = (
        member.withColumn("__rk", F.row_number().over(pick))
        .filter(F.col("__rk") == 1)
        .select(id_col, "pos", "h")
        .distinct()
    )
    agg = selected.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum(F.col("h") % 1_000_000_007).alias("fp_checksum"),
    )
    return (
        totals.join(agg, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_selected", F.lit(0)).alias("n_selected"),
            F.coalesce("fp_checksum", F.lit(0)).alias("fp_checksum"),
        )
    )
