"""Embedding-column analytics: per-label centroids, norm statistics,
and the centroid cosine-separation matrix.

The reference engine has no vector column type; its users export
embeddings and compute cluster diagnostics offline. These operators run
the diagnostics engine-side over the `array<float>` embedding column —
the summaries a training-data pipeline reads before trusting a corpus
(are the class clusters tight? are any two labels collapsed? are norms
drifting?).

Numeric parity (the windows.avg4_exact discipline, extended to floats):
float32 embedding elements widen to double EXACTLY, so
``round(e · 10⁶)`` is the same BIGINT on both engines; every aggregate
below accumulates those integers (exact, order-free) and each final
double derives from identical integers — bit-identical to the DuckDB
oracles with zero tolerance.

Scale shapes (100 TB / billions of vectors):
  * label_centroids — posexplode is a NARROW row multiply (×dim);
    partial aggregation collapses each task to |labels|·dim rows before
    the single (label, pos) shuffle. No per-row Python, no collect.
  * norm_stats — one map-only higher-order fold per row (JVM codegen),
    then a |labels|-row groupBy.
  * centroid_cosine_pairs — runs on the CENTROID table (|labels|·dim
    rows), so the pairwise join is aggregate-sized; never touches the
    raw vectors a second time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqe_spark.operators.partitioning import spread

_DEC = "decimal(27,0)"

# e6: exact integer form of a float32 element (|e| ≤ ~2e3 keeps
# e6² · dim far inside decimal(27,0)).
_E6 = "CAST(round(CAST(__e AS DOUBLE) * 1000000) AS BIGINT)"


def _div_round(num: str, den: str) -> str:
    """Sign-aware integer-domain rounding of num/den (both integral
    SQL expressions): round-half-away-from-zero without ever forming
    the intermediate double (cross-engine round() diverges at exact
    halves; integer div does not)."""
    return (
        f"CASE WHEN ({num}) >= 0 THEN (2 * ({num}) + ({den})) div (2 * ({den})) "
        f"ELSE -((2 * -({num}) + ({den})) div (2 * ({den}))) END"
    )


def label_centroids(
    emb: DataFrame, label: str = "label", v: str = "embedding"
) -> DataFrame:
    """Per-label mean embedding as (label, pos, centroid) rows —
    dimension-agnostic, and the long form downstream consumers join
    against. centroid is the exact integer-rounded mean at 6dp
    (matching the e6 quantization), so parity is bit-exact.
    """
    e = emb.select(
        F.col(label).alias("label"), F.posexplode(v).alias("pos", "__e")
    ).select("label", "pos", F.expr(_E6).cast(_DEC).alias("e6"))
    g = e.groupBy("label", "pos").agg(
        F.sum("e6").alias("s6"), F.count(F.lit(1)).alias("n")
    )
    c6 = _div_round("s6", "n")
    return g.select(
        "label",
        "pos",
        F.expr(f"CAST(({c6}) AS DOUBLE) / 1000000.0").alias("centroid"),
    ).orderBy("label", "pos")


def _nsq_col(v: str):
    """Exact per-row squared L2 norm over e6 integers (BIGINT fold —
    integer addition commutes, so fold order is irrelevant)."""
    return F.expr(
        f"aggregate({v}, 0L, (acc, __x) -> acc + "
        "CAST(round(CAST(__x AS DOUBLE) * 1000000) AS BIGINT) * "
        "CAST(round(CAST(__x AS DOUBLE) * 1000000) AS BIGINT))"
    )


def norm_stats(
    emb: DataFrame, label: str = "label", v: str = "embedding"
) -> DataFrame:
    """Per-label L2-norm distribution: (label, n, min_norm, max_norm,
    rms_norm). Norms derive from exact integer squared-norms —
    min/max/rms are each sqrt of an integer (identical on both
    engines); rms uses the integer-rounded mean of the squared norms.
    """
    nsq = emb.select(F.col(label).alias("label"), _nsq_col(v).alias("nsq"))
    g = nsq.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("nsq").alias("mn"),
        F.max("nsq").alias("mx"),
        F.sum(F.col("nsq").cast(_DEC)).alias("s"),
    )
    mean_sq = _div_round("s", "n")
    return g.select(
        "label",
        "n",
        (F.sqrt(F.col("mn").cast("double")) / 1e6).alias("min_norm"),
        (F.sqrt(F.col("mx").cast("double")) / 1e6).alias("max_norm"),
        (F.sqrt(F.expr(f"CAST(({mean_sq}) AS DOUBLE)")) / 1e6).alias("rms_norm"),
    ).orderBy("label")


def centroid_cosine_pairs(
    emb: DataFrame, label: str = "label", v: str = "embedding"
) -> DataFrame:
    """Cosine similarity between every pair of label centroids —
    the cluster-separation matrix (label_a < label_b; cos4 at 4dp).
    A near-1 off-diagonal entry means two labels collapsed.

    Exact: centroids stay in the integer domain (c6 BIGINT per
    position); dot and squared-norms are integer sums, the single
    float expression cos = dot/√(na·nb) sees identical integers on
    both engines, and 4dp uses the shared floor(x·10⁴ + 0.5) rule.
    """
    e = emb.select(
        F.col(label).alias("label"), F.posexplode(v).alias("pos", "__e")
    ).select("label", "pos", F.expr(_E6).cast(_DEC).alias("e6"))
    g = e.groupBy("label", "pos").agg(
        F.sum("e6").alias("s6"), F.count(F.lit(1)).alias("n")
    )
    c = g.select(
        "label", "pos", F.expr(_div_round("s6", "n")).cast(_DEC).alias("c6")
    )
    a = c.select(
        F.col("label").alias("label_a"), "pos", F.col("c6").alias("a6")
    )
    b = c.select(
        F.col("label").alias("label_b"), "pos", F.col("c6").alias("b6")
    )
    p = (
        a.join(b, "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("a6") * F.col("b6")).alias("dot"),
            F.sum(F.col("a6") * F.col("a6")).alias("na"),
            F.sum(F.col("b6") * F.col("b6")).alias("nb"),
        )
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    cos4 = F.floor(cos * 10000 + F.lit(0.5)).cast("double") / 10000.0
    return p.select(
        "label_a",
        "label_b",
        F.when((F.col("na") > 0) & (F.col("nb") > 0), cos4).alias("cos4"),
    ).orderBy("label_a", "label_b")


def centroid_confusion(
    emb: DataFrame, label: str = "label", v: str = "embedding"
) -> DataFrame:
    """Nearest-centroid confusion matrix: assign every vector to its
    closest label centroid (squared L2, exact integer domain) and
    count (label, pred_label) cells — the "are my clusters actually
    separable" diagnostic. A heavy off-diagonal cell means vectors of
    one label sit closer to another label's mean.

    Scale shape: the exact c6 centroids (|labels|·dim ints) are
    collected once and inlined as literal arrays — the same
    C×dims-scalar driver fetch the IVF k-means path uses
    (similarity.py) — so the assignment pass is MAP-ONLY: one
    zip_with/aggregate fold per (row, label) in JVM codegen, no join,
    no explode; the only shuffle is the final |labels|²-cell groupBy
    with map-side partials. Ties go to the smallest label
    (array_position finds the FIRST minimum).

    Exactness: e6/c6 are exact BIGINTs, dist² sums of their squared
    differences — identical integers on both engines, so the
    confusion counts are hash-exact against a relational oracle.

    Labels must be an integral column: the collected centroids are
    inlined into SQL text as bare literals, which is only injection-
    and resolution-safe for ints (a string label would generate
    identifiers, not values). Enforced up front."""
    lbl_type = dict(emb.dtypes)[label]
    if lbl_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"centroid_confusion requires an integral label column; "
            f"{label!r} is {lbl_type}. Map string labels to dense ints "
            f"first (e.g. dense_rank over distinct labels)."
        )
    e = emb.select(
        F.col(label).alias("label"), F.posexplode(v).alias("pos", "__e")
    ).select("label", "pos", F.expr(_E6).cast(_DEC).alias("e6"))
    g = e.groupBy("label", "pos").agg(
        F.sum("e6").alias("s6"), F.count(F.lit(1)).alias("n")
    )
    cent = (
        g.select("label", "pos", F.expr(_div_round("s6", "n")).alias("c6"))
        .orderBy("label", "pos")
        .collect()
    )
    by_label: dict[int, list[int]] = {}
    for r in cent:
        by_label.setdefault(r["label"], []).append(int(r["c6"]))
    labels = sorted(by_label)
    e6arr = (
        f"transform({v}, __x -> "
        "CAST(round(CAST(__x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    dists = ", ".join(
        "aggregate(zip_with(__e6, "
        f"array({', '.join(f'{c}L' for c in by_label[lb])}), "
        "(a, b) -> (a - b) * (a - b)), 0L, (acc, d) -> acc + d)"
        for lb in labels
    )
    lbl_arr = ", ".join(str(lb) for lb in labels)
    pred = (
        f"element_at(array({lbl_arr}), "
        f"CAST(array_position(__d, array_min(__d)) AS INT))"
    )
    return (
        emb.select(F.col(label).alias("label"), F.expr(e6arr).alias("__e6"))
        .select("label", F.expr(f"array({dists})").alias("__d"))
        .select("label", F.expr(pred).alias("pred_label"))
        .groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred_label")
    )


def covariance_matrix(
    emb: DataFrame, v: str = "embedding", scale: int = 8
) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding dimensions —
    the input PCA/whitening/ZCA needs, computed engine-side so the
    driver only ever sees dim·(dim+1)/2 cells.

    cov(i,j) = (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ) / n², reported at 10^-scale
    precision via the shared sign-aware integer rounding — every
    sufficient statistic is an exact integer (e6 quantization), so the
    cells hash bit-identical to the relational oracle.

    Scale shape: one narrow per-row pair expansion (a FLAT bigint
    product array of dim·(dim+1)/2 cells from the row's own array —
    no self-join of the exploded table, which would shuffle n·dim
    rows) collapsed by map-side partials to the |cells| grain;
    marginals are a dim-row broadcast. The flat cell index maps back
    to (i, j) through two literal lookup arrays (dim is probed from
    the first row — the module-wide fixed-width vector contract).
    Products multiply in BIGINT — exact while |xᵢ·xⱼ| < 2⁶³, i.e.
    raw |x| up to ~3.0e3 at the e6 grid, orders of magnitude beyond
    any embedding scale — and only the per-cell SUM widens to
    DECIMAL(38,0), which is what keeps the aggregate exact at
    unbounded corpus row counts. (The earlier formulation built a
    named_struct per cell and multiplied in DECIMAL inside the
    interpreted higher-order lambda — measured 2.2× slower at sf1
    for bit-identical sums.)
    """
    dim = len(emb.select(v).first()[0])
    i_map = [i for i in range(dim) for _ in range(i, dim)]
    j_map = [j for i in range(dim) for j in range(i, dim)]
    e6arr = (
        f"transform({v}, __x -> "
        "CAST(round(CAST(__x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    # Pair expansion as an exact int64 Gram matmul per Arrow batch
    # (guide §4.2) instead of a Catalyst flatten/transform explode: the
    # exploded form materializes n·dim(dim+1)/2 cell rows (41.6M at
    # sf1 — measured 41 s of interpreted nested-transform evaluation)
    # just to hash-aggregate them back down to |cells|. The e6
    # QUANTIZATION stays JVM-side (Spark round's BigDecimal HALF_UP on
    # the double's shortest decimal form is not worth replicating in
    # numpy); Python receives int64 arrays and computes per-block
    # Gram partials Abᵀ·Ab — EXACT integer arithmetic, block size
    # chosen from the batch's max |e6| so every entry stays under
    # 2⁶², therefore order-independent and bit-identical however the
    # partials merge. Only the per-cell partial SUM widens to
    # DECIMAL(38,0) engine-side, keeping the aggregate exact at
    # unbounded corpus row counts exactly as before. np.triu_indices
    # is row-major over the upper triangle — the same (i, j≥i) cell
    # order the flattened transform emitted.
    import numpy as np
    import pandas as pd

    n_cells = dim * (dim + 1) // 2

    def cell_partials(batches):
        iu = None
        for b in batches:
            if not len(b):
                continue
            A = np.vstack([np.asarray(x, dtype=np.int64) for x in b["__e6"]])
            if iu is None:
                iu = np.triu_indices(A.shape[1])
            mx = int(np.abs(A).max()) or 1
            step = max(1, (1 << 62) // (mx * mx))
            for s in range(0, len(A), step):
                Ab = A[s : s + step]
                G = Ab.T @ Ab
                flat = G[iu]
                yield pd.DataFrame(
                    {
                        "cell": np.arange(n_cells, dtype=np.int64),
                        "sxy": flat,
                        "n": np.full(n_cells, Ab.shape[0], dtype=np.int64),
                    }
                )

    p = (
        spread(emb.select(F.expr(e6arr).alias("__e6")))
        .mapInPandas(cell_partials, "cell long, sxy long, n long")
        .groupBy("cell")
        .agg(
            F.sum(F.col("sxy").cast("decimal(38,0)")).alias("sxy"),
            F.sum("n").alias("n"),
        )
        .select(
            F.element_at(
                F.lit(i_map), (F.col("cell") + 1).cast("int")
            ).alias("pos_i"),
            F.element_at(
                F.lit(j_map), (F.col("cell") + 1).cast("int")
            ).alias("pos_j"),
            "sxy",
            "n",
        )
    )
    m = (
        emb.select(F.posexplode(v).alias("pos", "__e"))
        .select("pos", F.expr(_E6).cast(_DEC).alias("e6"))
        .groupBy("pos")
        .agg(F.sum("e6").alias("s6"))
    )
    mi = m.select(F.col("pos").alias("pos_i"), F.col("s6").alias("si"))
    mj = m.select(F.col("pos").alias("pos_j"), F.col("s6").alias("sj"))
    num = "CAST(n AS DECIMAL(38,0)) * sxy - CAST(si AS DECIMAL(38,0)) * sj"
    den = f"CAST(n AS DECIMAL(38,0)) * n * CAST(pow(10, {12 - scale}) AS BIGINT)"
    c = _div_round(num, den)
    return (
        p.join(F.broadcast(mi), "pos_i")
        .join(F.broadcast(mj), "pos_j")
        .select(
            "pos_i",
            "pos_j",
            (F.expr(c).cast("double") / float(10**scale)).alias("cov"),
        )
        .orderBy("pos_i", "pos_j")
    )


def deterministic_topk_eigen(
    c12: list[list[int]], k: int, squarings: int = 7, iters: int = 3
) -> list[list[int]]:
    """Top-k eigenvectors of a symmetric integer matrix (e12-scale
    covariance cells) as 2^20-quantized integer vectors — a
    DETERMINISTIC eigensolver every engine can replay bit-for-bit,
    unlike LAPACK eigh (whose reductions are platform/threading
    dependent). This is what moves emb_pca_project from rows-only to
    oracle-gated (round-6 verdict, "What's missing" #3).

    Method: per component, repeatedly SQUARE the (deflated) matrix
    ``squarings`` times — amplifying every spectral gap to the power
    2^squarings (2^7 = 128), which is what makes a handful of power
    iterations converge even on near-flat spectra (the synthetic
    embeddings' top gap ratios are 0.96–0.99; 0.99^128 ≈ 0.28) — then
    run ``iters`` quantized power iterations, fix the sign, and
    deflate the ORIGINAL matrix by the Rayleigh quotient projector.

    Determinism contract (mirrored by the DuckDB oracle in
    queries_ext._pca_oracle_ctes):
      - all matrix products / Rayleigh sums are exact integer
        arithmetic (order-independent);
      - every rescale/normalize is a fixed-order IEEE-double
        expression (CAST, /, *, +, sqrt, floor — all exactly rounded)
        followed by floor(x·2^20 + 0.5) re-quantization;
      - NO integer division anywhere (DuckDB ``//`` truncates while
        Python ``//`` floors — avoided rather than emulated);
      - ties (start index, sign pivot) break on the smallest index.

    Magnitudes: B entries ≤ 2^20, so B·B entries ≤ d·2^40 and B·v
    entries ≤ d·2^40 — exact BIGINTs below 2^53 for d ≤ 4096; Σu²
    ≤ d·2^92 exceeds int64, so the oracle sums it as HUGEINT (python
    ints are unbounded) before ONE nearest-rounded double conversion.

    Driver-sized by design: O(k·squarings·d³) python-int ops —
    dimension-bounded, corpus-size-INDEPENDENT (the covariance is
    folded engine-side; d=64 solves in ~1.5 s). Returns one
    2^20-scaled integer vector per component."""
    import math

    d = len(c12)
    if not 1 <= k <= d:
        raise ValueError(f"k must be 1..{d}, got {k}")
    q = 1048576.0  # 2^20
    comps: list[list[int]] = []
    C = [row[:] for row in c12]
    mx_first = 0
    for _ in range(k):
        mx = max(abs(x) for row in C for x in row)
        if not comps:
            mx_first = mx
        # deflating with a 2^20-quantized eigenvector leaves a
        # residue ≈ 2^-19·λ in the deflated matrix; once the
        # remaining spectrum sits below that floor (2^-18 of the top),
        # further components are quantization noise — the requested k
        # exceeds the sketch's effective rank; fail loudly rather
        # than emit noise directions (deterministic noise is still
        # noise)
        if mx == 0 or mx * (1 << 18) < mx_first:
            raise ValueError(
                f"covariance rank < k: component {len(comps)} of {k} "
                "hit a rounding-noise deflated matrix "
                f"(max |cell| {mx} vs top {mx_first})"
            )
        B = [
            [math.floor((float(x) / float(mx)) * q + 0.5) for x in row]
            for row in C
        ]
        for _ in range(squarings):
            Dm = [
                [
                    sum(B[i][t] * B[t][j] for t in range(d))
                    for j in range(d)
                ]
                for i in range(d)
            ]
            mx2 = max(abs(x) for row in Dm for x in row)
            B = [
                [math.floor((float(x) / float(mx2)) * q + 0.5) for x in row]
                for row in Dm
            ]
        j0 = min(range(d), key=lambda i: (-B[i][i], i))
        vq = [0] * d
        vq[j0] = 1 << 20
        for _ in range(iters):
            u = [sum(B[i][j] * vq[j] for j in range(d)) for i in range(d)]
            norm = math.sqrt(float(sum(x * x for x in u)))
            vq = [math.floor((float(x) / norm) * q + 0.5) for x in u]
        jm = min(range(d), key=lambda i: (-abs(vq[i]), i))
        if vq[jm] < 0:
            vq = [-x for x in vq]
        comps.append(vq)
        lam = sum(
            vq[i] * C[i][j] * vq[j] for i in range(d) for j in range(d)
        )
        vtv = sum(x * x for x in vq)
        L, W = float(lam), float(vtv)
        for i in range(d):
            row = C[i]
            fvi = float(vq[i])
            for j in range(d):
                row[j] -= math.floor(
                    (L / W) * ((fvi * float(vq[j])) / W) + 0.5
                )
    return comps


def pca_project(
    emb: DataFrame,
    k: int = 8,
    v: str = "embedding",
    id_col: str = "vec_id",
    keep: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Project embeddings onto their top-k principal components — the
    dimensionality-reduction step ahead of ANN indexing / clustering.

    The covariance matrix is computed engine-side (covariance_matrix:
    exact integers, dim·(dim+1)/2 cells) and eigen-decomposed on the
    DRIVER by deterministic_topk_eigen — dim×dim work is the one step
    that is legitimately driver-sized, like the k-means centroid fetch
    (similarity.py). The k component vectors and the column means then
    inline as literals, so the projection pass is MAP-ONLY: one
    integer zip_with/aggregate dot product per (row, component) in JVM
    codegen — no shuffle at any corpus size.

    The whole chain is cross-engine exact (oracle-gated since round
    7): components are 2^20-quantized integers from a replayable
    solver; each row's centered values are re-quantized to the same
    2^20 grid by a fixed-order double expression; the projection is
    then an EXACT integer dot product divided by 2^40 — every proj
    value is a dyadic rational both engines agree on bit-for-bit.

    Component sign is fixed deterministically (largest-|coordinate|
    entry made positive, smallest-index ties) so reruns, restarts —
    and the DuckDB oracle — project identically.
    """
    import math

    cells = covariance_matrix(emb, v, scale=12).collect()
    dim = max(r["pos_j"] for r in cells) + 1
    if not 1 <= k <= dim:
        raise ValueError(f"k must be 1..{dim}, got {k}")
    # recover the exact e12 integers from the (integer/1e12) doubles:
    # |ulp error| << 0.5, so sign-aware floor(x+0.5) is exact
    c12 = [[0] * dim for _ in range(dim)]
    for r in cells:
        x = math.floor(r["cov"] * 1e12 + 0.5)
        c12[r["pos_i"]][r["pos_j"]] = c12[r["pos_j"]][r["pos_i"]] = x
    comps = deterministic_topk_eigen(c12, k)
    m = (
        emb.select(F.posexplode(v).alias("pos", "__e"))
        .select("pos", F.expr(_E6).cast(_DEC).alias("e6"))
        .groupBy("pos")
        .agg(F.sum("e6").alias("s6"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    mean = {r["pos"]: float(r["s6"]) / (1e6 * r["n"]) for r in m}
    mean_lit = "array({})".format(
        ", ".join(f"{mean[i]!r}D" for i in range(dim))
    )
    # centered values on the 2^20 grid: the one rounding step, after
    # which the dot product is exact integers (≤ d·2^40 < 2^53)
    centered20 = (
        f"zip_with({v}, {mean_lit}, (x, mu) -> "
        "CAST(floor((CAST(x AS DOUBLE) - mu) * 1048576.0D + 0.5D) AS BIGINT))"
    )
    projs = [
        (
            "CAST(aggregate(zip_with(__c20, array({comps}), (x, c) -> x * c), "
            "CAST(0 AS BIGINT), (acc, d) -> acc + d) AS DOUBLE) / 1099511627776.0D"
        ).format(comps=", ".join(f"CAST({x} AS BIGINT)" for x in comp))
        for comp in comps
    ]
    keep_cols = [c for c in keep if c in emb.columns]
    return emb.select(
        id_col, *keep_cols, F.expr(centered20).alias("__c20")
    ).select(
        id_col, *keep_cols, F.array(*[F.expr(p) for p in projs]).alias("proj")
    )
