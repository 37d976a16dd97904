"""Shared fit helpers for the ANN index builders (ann/ivf/pq).

Design decision (measured, not guessed): KMeans training for these
indexes is ALWAYS sample-bounded — at 100 TB you never run Lloyd's
iterations over the full table; a uniform sample of ``fit_sample`` rows
is statistically plenty for k ≪ sample centroids. Given that bound, the
fit itself is small math (≤ fit_sample × dim floats — 100k × 64-d is
~50 MB), so it runs DRIVER-side in numpy: one distributed sampling pass
collects the matrix, then Lloyd's runs in vectorized numpy with zero
Spark jobs. The MLlib alternative launches a job per Lloyd's iteration
per fit (a PQ build is m fits → 100+ tiny jobs), which is pure
scheduler latency at this sample size and measurably dominated index
build time in bench.py.

Only the fit is driver-side. The full-table ENCODE/ASSIGN pass stays
distributed — as pure Catalyst expressions (``nearest_centroid_expr``
below compiles to zip_with/aggregate/array_position) at the small
cluster counts every fixture uses, and as an Arrow-batched numpy matmul
(``nearest_centroid_col`` / ``nprobe_clusters_col``) past
ARROW_ASSIGN_FROM centroids, where the interpreted higher-order-function
lambdas become the bottleneck (measured round 12: k=4096 assign 77 s →
0.6 s on the same slice; identical assignments on both paths). Either
way it is ONE distributed pass, never an MLlib model UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def collect_sample_matrix(
    df: DataFrame, vec_col: str, n: int, fit_sample: int, seed: int
) -> np.ndarray:
    """One distributed sampling pass → the bounded (≤ fit_sample, dim)
    float64 training matrix on the driver. The collect is bounded by
    ``fit_sample`` rows by construction — the 100 TB table never reaches
    the driver, only the sample does. Arrow transfer (toPandas), not the
    row-pickle path: 100k × 64-d through pickle is millions of boxed
    Python floats; through Arrow it is a handful of buffers.

    Non-finite vector components are rejected up front: one NaN would
    silently poison centroid means (and downstream SQL literals) — the
    hard-error mirrors the reference's parseVector contract
    (main.cpp:14-21)."""
    sample = (
        df.sample(fraction=min(1.0, fit_sample / n), seed=seed)
        if n > fit_sample
        else df
    )
    pdf = sample.select(F.col(vec_col).cast("array<double>").alias("v")).toPandas()
    if pdf.empty:
        raise ValueError("cannot fit on an empty table")
    x = np.asarray(list(pdf["v"]), dtype=np.float64)
    if not np.isfinite(x).all():
        raise ValueError("non-finite values in the training sample")
    return x


def auto_n_clusters(
    n_rows: int,
    target_rows_per_cluster: int = 512,
    min_clusters: int = 8,
    max_clusters: int = 4096,
) -> int:
    """The layout-sizing rule: coarse-cluster count derived from corpus
    size so per-cluster occupancy stays near ``target_rows_per_cluster``
    as the corpus grows — ``ceil(n / target)`` clamped to
    [min_clusters, max_clusters] and never above ``n_rows``.

    Why this matters at 100 TB: a FIXED n_clusters leaves the flat
    search regime one decade past wherever it was tuned — the r11 sf100
    probe measured ivfpq_search going 1.8 s → 7.2 s across one decade at
    k=16 because each probed cluster's row count grows linearly with the
    corpus, and re-fitting the same corpus at 10× the clusters made the
    probed slice 10× smaller and the search 4.4× faster (PLANS.md sf100
    table). ``n_clusters="auto"`` at fit/rebuild time makes that cure
    the default: probe cost ≈ nprobe × target_rows_per_cluster rows, a
    CONSTANT as the corpus scales, while scan fraction nprobe/k falls.
    The same n/512 convention has sized ``semdedup_ivf_prune``'s cells
    since round 8 (queries/text_queries.py).

    The ``max_clusters`` clamp bounds the two k-proportional fixed
    costs: the driver-side Lloyd's fit over the bounded sample
    (O(sample × k × dim) flops per iteration) and the per-query
    centroid shortlist (O(k × dim)); the full-table assign itself is
    k-affordable at any clamped value via the Arrow matmul path
    (nearest_centroid_col). A corpus that saturates the clamp
    (n > ~2M rows at the default target) should raise
    ``target_rows_per_cluster`` (probe cost grows with it, still flat
    in corpus size) or shard the layout. min_clusters=8 mirrors
    semdedup's ``max(8, n // 512)`` floor so tiny fixtures keep a real
    multi-cluster layout.

    Monotone in ``n_rows`` by construction (the registered
    ivf_auto_sizing row certifies this against the SQL oracle)."""
    n_rows = int(n_rows)
    if n_rows <= 0:
        raise ValueError("auto_n_clusters needs a positive row count")
    target = int(target_rows_per_cluster)
    if target <= 0:
        raise ValueError(
            f"target_rows_per_cluster must be positive, got {target}"
        )
    k = -(-n_rows // target)  # ceil
    k = max(int(min_clusters), min(int(max_clusters), k))
    return max(1, min(n_rows, k))


def resolve_n_clusters(
    n_clusters,
    n_rows: int,
    target_rows_per_cluster: int = 512,
    fit_sample: int = 100_000,
) -> int:
    """``n_clusters="auto"`` → the auto_n_clusters sizing rule, with the
    clamp additionally bounded so every centroid keeps ≥ 8 training
    points from the bounded fit sample; any other value passes through
    as an int (the explicit-knob path is untouched). ONE copy — every
    IVF-family fit (ivf/pq/ivfbq/maxsim) resolves through here so the
    sizing rule can never drift between layouts."""
    if n_clusters == "auto":
        return auto_n_clusters(
            n_rows,
            target_rows_per_cluster,
            max_clusters=min(4096, max(8, int(fit_sample) // 8)),
        )
    return int(n_clusters)


# Where the driver fit switches from exact full-batch Lloyd's to the
# deterministic minibatch variant. Full Lloyd's over the bounded sample
# costs O(max_iter × n × k × dim) flops plus an (n, k) float64 distance
# block PER ITERATION (3.1 GB at n=100k, k=3907) plus an O(k × n)
# Python update loop — measured 230.6 s at the sf100 auto-sized k=3907
# (PLANS.md round-12 table), paid per rebuild and re-triggered by the
# autopilot's resize action. Past this threshold the fit runs ONE
# shuffled streaming epoch in fixed-size batches (Sculley, "Web-Scale
# K-Means Clustering", WWW 2010 — public method): ~max_iter× fewer
# flops, ~12× less peak memory, fully vectorized updates. A coarse IVF
# quantizer needs balanced cells, not converged ones — the recall
# calibration (operators/calibrate.py) re-earns the nprobe pin against
# whatever centroids the fit produced, so search quality is closed-loop
# regardless of fit variant. Below the threshold nothing changes: every
# fixture-scale fit keeps the exact, long-pinned path.
KMEANS_MINIBATCH_FROM = 512


def _kmeans_minibatch_np(
    x: np.ndarray, k: int, seed: int, batch: int = 8192
) -> list[list[float]]:
    """Deterministic minibatch Lloyd's: seeded random-point init, ONE
    rng-shuffled pass over the sample in fixed-size batches, each batch
    updating its assigned centers' RUNNING MEANS (count-weighted — the
    Sculley per-center 1/n learning rate, batched). Pure function of
    (x, k, seed, batch): fixed step count, no data-dependent stopping.
    Centers no batch ever picked keep their seeded init point (a real
    data row), so every returned centroid is finite and in-distribution."""
    n, d = x.shape
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(n, size=min(k, n), replace=False)].astype(
        np.float64
    ).copy()
    if len(cent) < k:  # fewer sample rows than centroids: duplicate rows
        cent = np.vstack([cent, x[rng.choice(n, size=k - len(cent))]])
    counts = np.zeros(k, dtype=np.float64)
    sums = np.zeros((k, d), dtype=np.float64)
    perm = rng.permutation(n)
    for s in range(0, n, batch):
        bx = x[perm[s : s + batch]]
        d2 = (
            (bx * bx).sum(axis=1, keepdims=True)
            - 2.0 * bx @ cent.T
            + (cent * cent).sum(axis=1)
        )
        a = d2.argmin(axis=1)
        counts += np.bincount(a, minlength=k)
        # per-dim bincount beats ufunc.at by orders of magnitude and a
        # k-length Python loop by more — d small (≤ a few hundred), so
        # this is d dense O(batch) passes
        sums += np.stack(
            [np.bincount(a, weights=bx[:, t], minlength=k) for t in range(d)],
            axis=1,
        )
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]
    return [[float(v) for v in c] for c in cent]


def assign_nearest_np(x: np.ndarray, cents: np.ndarray,
                      chunk: int = 16384) -> np.ndarray:
    """Nearest-centroid ids for every row of ``x`` against ``cents``,
    CHUNKED so the (n, k) float64 distance block never materializes
    whole — 3.1 GB at the auto-k maximum (k≈4000) over the 100k fit
    sample, vs ~0.5 GB peak chunked. Same first-minimum tie rule as the
    distributed assign paths."""
    c2 = (cents * cents).sum(axis=1)
    out = np.empty(len(x), dtype=np.int64)
    for s in range(0, len(x), chunk):
        xs = x[s : s + chunk]
        d2 = (xs * xs).sum(axis=1, keepdims=True) - 2.0 * xs @ cents.T + c2
        out[s : s + chunk] = d2.argmin(axis=1)
    return out


def kmeans_fit_np(
    x: np.ndarray, k: int, seed: int, max_iter: int = 10,
    minibatch_from: int = KMEANS_MINIBATCH_FROM,
) -> list[list[float]]:
    """Vectorized Lloyd's over the bounded sample; deterministic for a
    seed (random-point init, empty clusters re-seeded from the data).
    Past ``minibatch_from`` centroids the fit switches to the
    deterministic one-epoch minibatch variant (_kmeans_minibatch_np —
    the auto-k fit-cost rationale above); below it, the exact
    full-batch path is unchanged. Returns centroids as plain float
    lists (engine-independent — they are embedded into Catalyst
    expressions and saved as JSON)."""
    n = len(x)
    if k >= minibatch_from and n > 2 * k:
        return _kmeans_minibatch_np(x, k, seed)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(n, size=min(k, n), replace=False)].copy()
    if len(cent) < k:  # fewer sample rows than centroids: duplicate rows
        cent = np.vstack([cent, x[rng.choice(n, size=k - len(cent))]])
    for _ in range(max_iter):
        # (n, k) squared distances via ||x||² - 2x·c + ||c||²
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2.0 * x @ cent.T
            + (cent * cent).sum(axis=1)
        )
        assign = d2.argmin(axis=1)
        new = np.empty_like(cent)
        for j in range(k):
            members = x[assign == j]
            new[j] = members.mean(axis=0) if len(members) else x[rng.randint(n)]
        if np.allclose(new, cent):
            cent = new
            break
        cent = new
    return [[float(v) for v in c] for c in cent]


# The expression builders below emit SQL TEXT, not composed Column objects:
# a PQ encode is m × k nested higher-order functions, and building that
# through the Python Column API costs hundreds of py4j round-trips
# (measured ~2 s of pure driver-side construction for m=16, k=16). One
# F.expr over generated SQL is a single round-trip; the JVM parses it in
# milliseconds and the resulting plan is identical.


def _sql_double(v: float) -> str:
    v = float(v)
    if v != v or v in (float("inf"), float("-inf")):
        # 'nanD'/'infD' would parse as column references and die with an
        # unrelated resolution error; emit a proper non-finite literal
        # (fit rejects non-finite samples, so this is belt-and-braces)
        return f"CAST('{v}' AS DOUBLE)"
    return format(v, ".17g") + "D"  # 17 sig digits: exact float64


def array_literal_sql(c: list[float]) -> str:
    return "array(" + ",".join(_sql_double(x) for x in c) + ")"


def centroids_literal_sql(centroids: list[list[float]]) -> str:
    """The centroid table as a SQL array<array<double>> literal."""
    return "array(" + ",".join(array_literal_sql(c) for c in centroids) + ")"


def squared_distances_sql(vec_sql: str, centroids: list[list[float]]) -> str:
    """SQL for array<double> of squared L2 distances from ``vec_sql`` to
    every centroid — transform over the literal centroid table, zip_with +
    aggregate per centroid; all whole-stage codegen."""
    return (
        f"transform({centroids_literal_sql(centroids)}, c -> "
        f"aggregate(zip_with({vec_sql}, c, (a, b) -> (a - b) * (a - b)), "
        f"0.0D, (s, d) -> s + d))"
    )


def nearest_centroid_sql(vec_sql: str, centroids: list[list[float]]) -> str:
    """SQL for the 0-based id of the nearest centroid (the distributed
    assign/encode pass of every quantizer here). Ties break to the first
    (lowest-id) centroid — deterministic.

    The distance array is bound once with a single-element transform (a
    SQL let-binding) so the centroid literal table appears ONCE in the
    expression, not twice — half the parse/codegen size of the naive
    array_position(d, array_min(d)) form."""
    d = squared_distances_sql(vec_sql, centroids)
    return (
        f"element_at(transform(array({d}), ds -> "
        f"CAST(array_position(ds, array_min(ds)) - 1 AS INT)), 1)"
    )


def nprobe_clusters_sql(
    vec_sql: str, centroids: list[list[float]], nprobe: int
) -> str:
    """SQL for the array<int> of the ``nprobe`` nearest centroid ids to
    ``vec_sql`` — the per-ROW probe shortlist that makes batch ANN search
    (one query TABLE against a cluster-partitioned layout) a single
    codegen'd projection instead of a per-query driver loop.

    The distance array appears ONCE as zip_with's first ARGUMENT (so the
    centroid literal table isn't duplicated), zipped against the cluster
    ids — deliberately NOT the one-element-transform let-binding whose
    inner ``i -> element_at(ds, i+1)`` lambda captures the outer
    variable: a captured outer lambda variable leaks a phantom exprId
    into canonicalized.references on Spark 4.1.2 and silently breaks
    pandas-UDF extraction for any UDF collapsed onto the expression
    (ivf._unit_normalize_expr docstring; tests/test_udf_extraction.py).
    The sort key is a struct<d:double, c:int>, so equal distances
    tie-break to the lower cluster id — deterministic."""
    d = squared_distances_sql(vec_sql, centroids)
    n = len(centroids)
    nprobe = min(nprobe, n)
    return (
        f"transform(slice(array_sort(zip_with({d}, sequence(0, {n - 1}), "
        f"(dd, cc) -> struct(dd AS d, cc AS c))), 1, {nprobe}), "
        f"s -> s.c)"
    )


def centroids_literal(centroids: list[list[float]]) -> Column:
    """The centroid table as a literal array<array<double>> column."""
    return F.expr(centroids_literal_sql(centroids))


def nearest_centroid_expr(vec_sql: str, centroids: list[list[float]]) -> Column:
    """Column wrapper over ``nearest_centroid_sql``; ``vec_sql`` is a SQL
    fragment (a column name or expression) yielding array<double>."""
    return F.expr(nearest_centroid_sql(vec_sql, centroids))


# Where the Arrow assign path takes over from the codegen expression.
# Spark's higher-order functions (transform/zip_with/aggregate) evaluate
# their lambdas INTERPRETED, so the literal-table fold costs ~7M
# element-ops per core-second (measured round 12) — fine at the k<=160
# every fixture uses, ruinous at the k an auto-sized big corpus computes
# (k=4096 over 2M rows would be ~40 core-minutes). Past this threshold
# the assignment runs as an Arrow-batched pandas_udf doing ONE numpy
# matmul per batch (||x||^2 - 2xC^T + ||c||^2) at GFLOPS — the brief's
# sanctioned slow-path escape hatch, ~50x faster than the interpreted
# fold at k=1000+. Below it, nothing changes: the proven whole-stage-
# codegen expression keeps every existing plan assertion intact.
ARROW_ASSIGN_FROM = 192


def _centroid_matrix(centroids: list[list[float]]):
    cents = np.asarray(centroids, dtype=np.float64)
    return cents, (cents * cents).sum(axis=1)


def stack_valid(v: "pd.Series", dim: int):
    """(vals, good_indices, x) from a pandas Series of per-row vectors
    as Arrow delivers them (object array of numpy float64 arrays).
    SHARED by every Arrow assign/encode UDF. The one rule: never call
    ``.tolist()`` on the Series — that boxes every float into a Python
    object (measured: the sf100 2M-row assign spent 250 s of its wall
    in exactly that, vs ~25 s stacking the ndarray elements directly).
    ``np.stack`` of the valid rows is a C-side copy; ``np.asarray`` per
    element is a no-op view when Arrow already handed us float64."""
    vals = v.to_numpy()
    good = [
        i for i, e in enumerate(vals)
        if e is not None and len(e) == dim
    ]
    if not good:
        return vals, good, None
    x = np.stack([np.asarray(vals[i], dtype=np.float64) for i in good])
    return vals, good, x


def nearest_centroid_col(
    vec_sql: str,
    centroids: list[list[float]],
    arrow_from: int = ARROW_ASSIGN_FROM,
) -> Column:
    """Nearest-centroid id as a Column — the codegen expression below
    ``arrow_from`` centroids, the Arrow matmul path at or above it (see
    ARROW_ASSIGN_FROM). Same semantics either way: 0-based id, ties to
    the lowest id, NULL/wrong-dim vectors assign NULL (float near-ties
    may differ between the fold's sequential sum and the vectorized
    identity — immaterial for a quantizer and deterministic within a
    path, and the path choice is itself a pure function of k)."""
    if len(centroids) < arrow_from:
        return nearest_centroid_expr(vec_sql, centroids)
    from pyspark.sql.functions import pandas_udf

    cents, c2 = _centroid_matrix(centroids)
    dim = cents.shape[1]

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        vals, good, x = stack_valid(v, dim)
        res: list = [None] * len(vals)
        if good:
            d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cents.T) + c2
            am = d2.argmin(axis=1)  # first minimum: the fold's tie rule
            # NULL vector ELEMENTS pass the len/None screen but become
            # NaN under the stack, making every distance NaN and argmin
            # silently 0 — the SQL fold yields NULL for the same row.
            # Mask non-finite-distance rows back to None so both paths
            # agree (ADVICE r12).
            ok = np.isfinite(d2).all(axis=1)
            for j, i in enumerate(good):
                if ok[j]:
                    res[i] = int(am[j])
        return pd.Series(res, dtype="Int32")

    return _assign(F.expr(vec_sql))


def nprobe_clusters_col(
    vec_sql: str,
    centroids: list[list[float]],
    nprobe: int,
    arrow_from: int = ARROW_ASSIGN_FROM,
) -> Column:
    """The per-row nprobe-nearest-centroid shortlist as a Column — the
    codegen expression below ``arrow_from`` centroids, the Arrow matmul
    path at or above it (nearest_centroid_col rationale: at k=4096 the
    SQL route pays ~20 s of parse + interpreted fold per BATCH). Ties
    break to the lower cluster id in both paths (stable argsort == the
    struct<d,c> sort)."""
    n = len(centroids)
    nprobe = min(int(nprobe), n)
    if n < arrow_from:
        return F.expr(nprobe_clusters_sql(vec_sql, centroids, nprobe))
    from pyspark.sql.functions import pandas_udf

    cents, c2 = _centroid_matrix(centroids)
    dim = cents.shape[1]

    @pandas_udf("array<int>")
    def _probe(v: pd.Series) -> pd.Series:
        vals, good, x = stack_valid(v, dim)
        res: list = [None] * len(vals)
        if good:
            d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cents.T) + c2
            order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            # NULL-element rows → NaN distances; keep them NULL like the
            # SQL path does (see nearest_centroid_col).
            ok = np.isfinite(d2).all(axis=1)
            for j, i in enumerate(good):
                if ok[j]:
                    res[i] = order[j].astype("int32").tolist()
        return pd.Series(res)

    return _probe(F.expr(vec_sql))


def rowwise_l2_sq_col(a_col: Column, b_col: Column) -> Column:
    """Squared L2 distance between two VECTOR COLUMNS of one row, as an
    Arrow-batched numpy kernel — the pair-scoring twin of the assign
    path. The Catalyst zip_with/aggregate fold evaluates its lambdas
    interpreted (~7M element-ops/core-s ≈ 100k 64-d pairs/core-s); a
    graph build scores hundreds of millions of candidate pairs, where
    the fold becomes the dominant cost (the ARROW_ASSIGN_FROM story,
    per-pair instead of per-centroid). Semantics match the fold: NULL
    either side or mismatched dims → NULL; NULL elements → NULL (the
    fold's NULL-propagating sum). NaN elements land NULL here where
    the fold yields NaN — the same documented convention as the Arrow
    assign paths; upstream guards refuse such vectors anyway."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _d(a: pd.Series, b: pd.Series) -> pd.Series:
        va = a.to_numpy()
        vb = b.to_numpy()
        out = pd.array([None] * len(va), dtype="Float64")
        good = [
            i for i, (x, y) in enumerate(zip(va, vb))
            if x is not None and y is not None and len(x) == len(y)
        ]
        # stack PER LENGTH GROUP: len(x)==len(y) holds per row, but rows
        # of different dims in one batch would make a single np.stack
        # raise and fail the whole task where the fold it replaces
        # yielded per-row values (ADVICE r13 — shared-primitive guard)
        by_len: dict = {}
        for i in good:
            by_len.setdefault(len(va[i]), []).append(i)
        for idxs in by_len.values():
            X = np.stack([np.asarray(va[i], dtype=np.float64) for i in idxs])
            Y = np.stack([np.asarray(vb[i], dtype=np.float64) for i in idxs])
            d = ((X - Y) ** 2).sum(axis=1)
            for t, i in enumerate(idxs):
                # NaN here means a NULL element upstream (Arrow None →
                # NaN under stack) — the fold yields NULL for those
                out[i] = float(d[t]) if d[t] == d[t] else None
        return pd.Series(out, dtype="Float64")

    return _d(a_col, b_col)


def logreg_fit_np(
    X: np.ndarray,
    y: np.ndarray,
    iters: int = 200,
    step: float = 0.5,
    l2: float = 1e-3,
) -> tuple[np.ndarray, float]:
    """Binary logistic regression by deterministic FULL-BATCH gradient
    descent (driver-side numpy — the kmeans_fit_np convention: fits run
    on a bounded sample on the driver, scoring stays a distributed
    codegen projection). No stochastic minibatching, no data-dependent
    stopping: a fixed iteration count over the full sample makes the
    fit a pure function of (X, y, hyperparameters) — same inputs, same
    weights, bit for bit. L2 on the weights only (not the intercept).
    Returns (w, b) with scores = X @ w + b (sigmoid monotone — the
    threshold comparison needs only the linear score)."""
    n, d = X.shape
    if n == 0:
        raise ValueError("cannot fit a classifier on an empty sample")
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    yf = y.astype(np.float64)
    for _ in range(int(iters)):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - yf
        gw = (X.T @ g) / n + l2 * w
        gb = float(g.sum()) / n
        w -= step * gw
        b -= step * gb
    return w, float(b)
