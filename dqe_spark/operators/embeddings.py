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

    Scale shape: one narrow per-row pair expansion (dim·(dim+1)/2
    structs from the row's own array — no self-join of the exploded
    table, which would shuffle n·dim rows) collapsed by map-side
    partials to the |cells| grain; marginals are a dim-row broadcast.
    """
    e6arr = (
        f"transform({v}, __x -> "
        "CAST(round(CAST(__x AS DOUBLE) * 1000000) AS BIGINT))"
    )
    pairs = (
        "flatten(transform(sequence(0, size(__e6) - 1), i -> "
        "transform(sequence(i, size(__e6) - 1), j -> "
        "named_struct('i', i, 'j', j, "
        "'xy', CAST(__e6[i] AS DECIMAL(38,0)) * __e6[j]))))"
    )
    p = (
        emb.select(F.expr(e6arr).alias("__e6"))
        .select(F.explode(F.expr(pairs)).alias("p"))
        .groupBy(F.col("p.i").alias("pos_i"), F.col("p.j").alias("pos_j"))
        .agg(F.sum("p.xy").alias("sxy"), F.count(F.lit(1)).alias("n"))
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
    DRIVER — a dim×dim symmetric eigh is microseconds and is the one
    step that is legitimately driver-sized, like the k-means centroid
    fetch (similarity.py). The k component vectors and the column
    means then inline as literals, so the projection pass is MAP-ONLY:
    one zip_with/aggregate dot product per (row, component) in JVM
    codegen — no shuffle at any corpus size.

    Component sign is fixed deterministically (largest-|coordinate|
    entry made positive) so reruns and restarts project identically.
    Iterative/linalg semantics are not SQL-expressible — correctness
    is pinned against numpy in tests/test_embeddings.py instead of a
    DuckDB oracle.
    """
    import numpy as np

    cells = covariance_matrix(emb, v, scale=12).collect()
    dim = max(r["pos_j"] for r in cells) + 1
    if not 1 <= k <= dim:
        raise ValueError(f"k must be 1..{dim}, got {k}")
    C = np.zeros((dim, dim))
    for r in cells:
        C[r["pos_i"], r["pos_j"]] = C[r["pos_j"], r["pos_i"]] = r["cov"]
    w, V = np.linalg.eigh(C)  # ascending eigenvalues
    comps = []
    for c in range(1, k + 1):
        vec = V[:, -c]
        if vec[int(np.argmax(np.abs(vec)))] < 0:
            vec = -vec
        comps.append(vec)
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
    projs = [
        (
            "aggregate(zip_with(__c, array({comps}), (x, c) -> x * c), "
            "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
        ).format(comps=", ".join(f"{float(x)!r}D" for x in comp))
        for comp in comps
    ]
    centered = (
        f"zip_with({v}, {mean_lit}, (x, mu) -> CAST(x AS DOUBLE) - mu)"
    )
    keep_cols = [c for c in keep if c in emb.columns]
    return emb.select(
        id_col, *keep_cols, F.expr(centered).alias("__c")
    ).select(
        id_col, *keep_cols, F.array(*[F.expr(p) for p in projs]).alias("proj")
    )
