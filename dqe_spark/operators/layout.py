"""Z-order (Morton-curve) data layout: multi-dimensional clustering
for file skipping at scale.

At 100 TB, the cheapest query is the one that never reads the file:
parquet row-group min/max statistics prune scans, but a layout sorted
on ONE column only skips for predicates on that column. Interleaving
the bits of two (or more) quantized dimensions — the Z-order curve
Delta Lake's OPTIMIZE ZORDER BY and Iceberg's sort orders use — makes
rows that are close in EVERY dimension land in the same files, so
min/max pruning fires for predicates on any participating column.

Everything is integer arithmetic (rank-free min/max quantization to a
fixed bit budget, then bit interleave), generated for both engine
dialects, so the DuckDB oracle replays the curve bit-for-bit.

Pieces:

  * ``zvalue_sql`` — the interleave expression (dialect-aware);
  * ``zorder_write`` — range-partition by z, sort within partitions,
    write parquet: the actual layout pass (one shuffle, linear);
  * ``zorder_locality`` — the diagnostic relation the registry query
    exposes: bucket rows by z prefix and report each bucket's
    per-dimension span in basis points of the global range. Z-order
    working = spans ≪ 10000; a random layout would show ~10000.

Beyond-reference (the Erlang dqe has no storage-layout surface);
designed against the published Morton-curve literature and the Delta
OPTIMIZE ZORDER semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shl(v: str, n: int, dialect: str) -> str:
    if dialect == "duckdb":
        return f"({v} << {n})"
    return f"shiftleft({v}, {n})"


def _shr(v: str, n: int, dialect: str) -> str:
    if dialect == "duckdb":
        return f"({v} >> {n})"
    return f"shiftright({v}, {n})"


def quantize_sql(col: str, mn: str, mx: str, bits: int, dialect: str) -> str:
    """Scale ``col`` from [mn, mx] onto the integer grid
    [0, 2^bits − 1] with INTEGER floor division (Spark ``div``,
    DuckDB ``//`` — never ``/``, which both engines widen to double).
    All inputs are BIGINTs; the multiply must stay under 2^63
    (callers keep bits ≤ 16 and ranges under ~2^46)."""
    top = (1 << bits) - 1
    op = "//" if dialect == "duckdb" else "div"
    return (
        f"CAST((({col} - {mn}) * {top}) {op} greatest({mx} - {mn}, 1) "
        f"AS BIGINT)"
    )


def interleave_sql(xq: str, yq: str, bits: int, dialect: str) -> str:
    """Morton interleave of two ``bits``-wide non-negative integers:
    x's bit i lands at 2i, y's at 2i+1."""
    return interleave_n_sql([xq, yq], bits, dialect)


def interleave_n_sql(cols: list[str], bits: int, dialect: str) -> str:
    """Morton interleave of n ``bits``-wide non-negative integers:
    column d's bit i lands at position n·i + d. n·bits must stay
    under 63 (signed-int64 z values in both engines)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"z value would need {n * bits} bits (> 62)")
    terms = []
    for i in range(bits):
        for d, c in enumerate(cols):
            terms.append(
                _shl(f"({_shr(c, i, dialect)} & 1)", n * i + d, dialect)
            )
    return "(" + " + ".join(terms) + ")"


def zvalue_sql(
    x: str, y: str, mnx: str, mxx: str, mny: str, mxy: str,
    bits: int, dialect: str,
) -> tuple[str, str]:
    """(x_quantized_expr, y_quantized_expr) — interleave separately
    staged by callers to keep expression trees shallow."""
    return (
        quantize_sql(x, mnx, mxx, bits, dialect),
        quantize_sql(y, mny, mxy, bits, dialect),
    )


def _with_z(
    df: DataFrame, xcol: str, ycol: str, bits: int
) -> DataFrame:
    """Attach the z column declaratively: global min/max ride a
    1-row broadcast (no driver collect), quantization and interleave
    are staged integer Column math — whole-stage codegen end to end.
    """
    ext = df.agg(
        F.min(xcol).cast("long").alias("_mnx"),
        F.max(xcol).cast("long").alias("_mxx"),
        F.min(ycol).cast("long").alias("_mny"),
        F.max(ycol).cast("long").alias("_mxy"),
    )
    xq, yq = zvalue_sql(
        f"CAST({xcol} AS BIGINT)", f"CAST({ycol} AS BIGINT)",
        "_mnx", "_mxx", "_mny", "_mxy", bits, "spark",
    )
    return (
        df.crossJoin(F.broadcast(ext))
        .withColumn("_xq", F.expr(xq))
        .withColumn("_yq", F.expr(yq))
        .withColumn("z", F.expr(interleave_sql("_xq", "_yq", bits, "spark")))
    )


def zorder_write(
    df: DataFrame, path: str, xcol: str, ycol: str,
    bits: int = 16, n_files: int | None = None,
) -> None:
    """The layout pass: range-partition on the z value (equal-depth
    via Spark's range partitioner sampling), sort within partitions,
    write parquet. One shuffle, linear in the data; file count
    defaults to spark.sql.shuffle.partitions. Parquet min/max stats
    then prune on BOTH xcol and ycol predicates — the pytest asserts
    the actual row-group stats."""
    zed = _with_z(df, xcol, ycol, bits)
    parts = n_files or int(
        zed.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    (
        zed.repartitionByRange(parts, "z")
        .sortWithinPartitions("z")
        .drop("_mnx", "_mxx", "_mny", "_mxy", "_xq", "_yq")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_locality(
    df: DataFrame, xcol: str, ycol: str,
    bits: int = 16, bucket_bits: int = 6,
) -> DataFrame:
    """Diagnostic: cut the z range into 2^bucket_bits prefix buckets
    (what range-partitioned files would hold) and report each
    bucket's row count and per-dimension span in basis points of the
    global range — the quantity parquet pruning actually exploits.
    Output: (bucket, n_rows, x_span_bp, y_span_bp), bucket ascending.
    """
    shift = 2 * bits - bucket_bits
    zed = _with_z(df, xcol, ycol, bits)
    top = (1 << bits) - 1
    return (
        zed.withColumn("bucket", F.expr(f"shiftright(z, {shift})"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr(
                f"CAST((max(_xq) - min(_xq)) * 10000 DIV {top} AS BIGINT)"
            ).alias("x_span_bp"),
            F.expr(
                f"CAST((max(_yq) - min(_yq)) * 10000 DIV {top} AS BIGINT)"
            ).alias("y_span_bp"),
        )
        .orderBy("bucket")
    )
