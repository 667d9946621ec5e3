"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; an IVF (inverted-file)
variant as the scale path — centroids from the label column (or any
coarse quantizer), probe the nearest partitions only.

Dot products run through built-in higher-order functions
(zip_with + aggregate) — JVM-side, no Python. Math is done in double
with a left-to-right fold so the DuckDB oracle (list_dot_product on
DOUBLE[]) reproduces results bit-for-bit before rounding.

Scale notes: brute-force is a broadcast of the query set against a
full scan — linear, embarrassingly parallel, no shuffle; right up to
~10⁹ vectors it is usually the honest baseline. IVF turns that scan
into a partition-pruned scan (probe p of C centroids ≈ p/C of the
data). For persistent serving you'd bucket the table by centroid id so
probes prune at the file level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential fold, double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def knn_bruteforce(
    df: DataFrame,
    query: DataFrame,
    k: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (single-row) query against
    the corpus; deterministic tie-break on id. Output (vec_id, cos)."""
    q = query.select(F.col(vec).alias("__q"))
    scored = df.crossJoin(F.broadcast(q)).select(
        F.col(id_col), F.round(cosine(F.col(vec), F.col("__q")), 6).alias("cos")
    )
    return scored.orderBy(F.col("cos").desc(), F.col(id_col).asc()).limit(k)


def centroids_by_label(
    df: DataFrame, vec: str = "embedding", label: str = "label"
) -> DataFrame:
    """Per-label mean vector (the IVF coarse quantizer). posexplode →
    groupBy(label, dim) → re-assemble ordered array."""
    dims = df.select(F.col(label), F.posexplode(F.col(vec)).alias("pos", "x"))
    per_dim = dims.groupBy(label, "pos").agg(F.avg(F.col("x").cast("double")).alias("c"))
    return (
        per_dim.groupBy(label)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(label, F.expr("transform(pc, s -> s.c)").alias("centroid"))
    )


def knn_ivf(
    df: DataFrame,
    query: DataFrame,
    k: int,
    probes: int = 2,
    vec: str = "embedding",
    id_col: str = "vec_id",
    label: str = "label",
) -> DataFrame:
    """IVF-style ANN: rank label-partitions by centroid cosine to the
    query, brute-force search only the top `probes` partitions.

    Approximate by construction (recall depends on the quantizer);
    deterministic given the data. Output (vec_id, cos)."""
    cents = centroids_by_label(df, vec, label)
    q = query.select(F.col(vec).alias("__q"))
    probe_labels = (
        cents.crossJoin(F.broadcast(q))
        .select(label, cosine(F.col("centroid"), F.col("__q")).alias("ccos"))
        .orderBy(F.col("ccos").desc(), F.col(label).asc())
        .limit(probes)
        .select(label)
    )
    pruned = df.join(F.broadcast(probe_labels), on=label, how="left_semi")
    return knn_bruteforce(pruned, query, k, vec, id_col)


def neardup_cosine_pairs(
    df: DataFrame,
    threshold: float,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (i < j) with cosine ≥ threshold — the exact O(n²)
    near-duplicate reference. At scale, run minhash/LSH-bucketed or
    IVF-partitioned variants and use this only on candidates."""
    a = df.select(F.col(id_col).alias("id_i"), F.col(vec).alias("va"))
    b = df.select(F.col(id_col).alias("id_j"), F.col(vec).alias("vb"))
    pairs = a.crossJoin(b).where(F.col("id_i") < F.col("id_j"))
    c = cosine(F.col("va"), F.col("vb"))
    return pairs.select("id_i", "id_j", F.round(c, 6).alias("cos")).where(
        F.col("cos") >= threshold
    )
