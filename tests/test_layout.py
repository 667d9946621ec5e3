"""Z-order layout (operators/layout.py): curve correctness against a
python reference, and the claim that actually matters at 100 TB —
after zorder_write, parquet row-group min/max statistics prune a
two-dimensional predicate box down to a small fraction of row groups,
where a single-column sort cannot."""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from dqe_spark.operators import layout as L


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    expr = L.interleave_sql("x", "y", 6, "spark")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", F.expr(expr)).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_ref(x, y, 6), (x, y)


def test_quantize_endpoints(spark):
    df = spark.createDataFrame([(0,), (500,), (1000,)], "v long")
    e = L.quantize_sql("v", "0", "1000", 16, "spark")
    vals = [r.q for r in df.withColumn("q", F.expr(e)).collect()]
    assert vals[0] == 0 and vals[2] == (1 << 16) - 1
    assert 0 < vals[1] < (1 << 16) - 1


def test_zorder_locality_bounds(spark):
    """Every z-prefix bucket must be tight on BOTH dimensions — the
    simultaneous-tightness single-column sorts cannot give."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    rows = L.zorder_locality(li, "l_partkey", "l_suppkey").collect()
    assert len(rows) > 8
    # 64 buckets on a 2-d curve → per-dim span ≈ 1/8 of the range;
    # allow generous slack for sparse key grids at smoke scale
    assert max(r.x_span_bp for r in rows) < 4000
    assert max(r.y_span_bp for r in rows) < 4000


def _rowgroups_overlapping(path: str, col: str, lo: int, hi: int):
    """(overlapping, total) row groups whose [min, max] for ``col``
    intersects [lo, hi] — exactly the parquet predicate-pushdown
    pruning decision, read from the real footers."""
    overlap = total = 0
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                overlap += 1
    return overlap, total


@pytest.mark.parametrize("layout", ["zorder", "hilbert", "xsort"])
def test_zorder_write_prunes_both_dimensions(spark, tmp_path, layout):
    """The end-to-end file-skipping claim: write lineitem z-ordered on
    (l_partkey, l_suppkey) into many small row groups, then check the
    row-group stats against a predicate box on EACH dimension. The
    z-layout must prune hard on both; the single-column sort control
    prunes only its own column — the contrast IS the reason the
    operator exists."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    out = str(tmp_path / layout)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    if layout == "zorder":
        L.zorder_write(li, out, "l_partkey", "l_suppkey", n_files=64)
    elif layout == "hilbert":
        L.hilbert_write(li, out, "l_partkey", "l_suppkey", n_files=64)
    else:
        li.repartitionByRange(64, "l_partkey").sortWithinPartitions(
            "l_partkey"
        ).write.mode("overwrite").parquet(out)

    ext = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    mnx, mxx, mny, mxy = ext
    # a ~10%-wide box on each dimension, mid-range
    xlo = mnx + (mxx - mnx) * 45 // 100
    xhi = mnx + (mxx - mnx) * 55 // 100
    ylo = mny + (mxy - mny) * 45 // 100
    yhi = mny + (mxy - mny) * 55 // 100

    xo, xt = _rowgroups_overlapping(out, "l_partkey", xlo, xhi)
    yo, yt = _rowgroups_overlapping(out, "l_suppkey", ylo, yhi)
    assert xt >= 32 and yt >= 32, "need enough row groups to measure"
    if layout in ("zorder", "hilbert"):
        # 64 curve-files → 3 prefix bits per dimension → 12.5% spans; a
        # 10% box overlaps at most 2 octants per dimension (≈ 25% of
        # files) even when it crosses an octant boundary
        assert xo / xt < 0.4, (xo, xt)
        assert yo / yt < 0.4, (yo, yt)
        # and the data still round-trips
        back = spark.read.parquet(out)
        assert back.count() == li.count()
        assert back.where(
            (F.col("l_partkey") >= xlo) & (F.col("l_partkey") <= xhi)
        ).count() == li.where(
            (F.col("l_partkey") >= xlo) & (F.col("l_partkey") <= xhi)
        ).count()
    else:
        # the control: its own column prunes to almost nothing,
        # the other column cannot prune at all
        assert xo / xt <= 0.25, (xo, xt)
        assert yo / yt > 0.8, (yo, yt)


def test_interleave_n_three_dims(spark):
    """3-d Morton interleave against a python reference; the 2-arg
    form must equal interleave_n_sql([x, y]) bit-for-bit."""
    rows = [(x, y, z) for x in (0, 3, 7) for y in (0, 5, 6) for z in (1, 4)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    e3 = L.interleave_n_sql(["x", "y", "z"], 3, "spark")
    got = df.withColumn("m", F.expr(e3)).collect()
    for r in got:
        want = 0
        for i in range(3):
            want |= ((r.x >> i) & 1) << (3 * i)
            want |= ((r.y >> i) & 1) << (3 * i + 1)
            want |= ((r.z >> i) & 1) << (3 * i + 2)
        assert r.m == want, (r.x, r.y, r.z)
    with pytest.raises(ValueError):
        L.interleave_n_sql(["a", "b", "c", "d"], 16, "spark")


def _xy2d_ref(bits, x, y):
    """Pure-python reference xy2d (reflections over the full grid)."""
    n = 1 << bits
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_exhaustively(spark):
    from dqe_spark.operators import layout as L

    bits = 4
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x LONG, y LONG"
    )
    # full-range grid → quantization is the identity
    rows = L._with_hilbert(grid, "x", "y", bits).select("x", "y", "h").collect()
    assert all(r["h"] == _xy2d_ref(bits, r["x"], r["y"]) for r in rows)


def test_hilbert_is_a_unit_step_space_filling_curve(spark):
    """Bijective onto [0, n²) and every consecutive pair of cells is
    one grid step apart — the property that makes every h-prefix
    bucket a CONNECTED region (and which Morton lacks)."""
    from dqe_spark.operators import layout as L

    bits = 5
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x LONG, y LONG"
    )
    rows = L._with_hilbert(grid, "x", "y", bits).select("x", "y", "h").collect()
    byh = {r["h"]: (r["x"], r["y"]) for r in rows}
    assert sorted(byh) == list(range(n * n))
    for i in range(n * n - 1):
        (x0, y0), (x1, y1) = byh[i], byh[i + 1]
        assert abs(x1 - x0) + abs(y1 - y0) == 1


def test_hilbert_beats_morton_under_equal_depth_cuts(spark):
    """Where the curves actually differ: ALIGNED prefix buckets are
    axis-aligned quadtree nodes on both curves (identical spans on a
    uniform grid — measured), but the layout WRITER cuts the curve at
    arbitrary equal-depth boundaries (repartitionByRange's sampled
    bounds). A Morton file straddling a quad boundary holds two
    far-apart rectangles (the Z jump) and its min/max span balloons;
    every Hilbert segment stays CONNECTED (unit-step curve) no matter
    where it is cut. 60 equal-depth cuts on a uniform 128×128 grid:
    Hilbert's worst combined span must beat Morton's outright (pure-
    python replay of this fixture: 3621 vs 6534 bp)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dqe_spark.operators import layout as L

    bits, cuts = 7, 60
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x LONG, y LONG"
    ).repartition(8)
    top = n - 1
    worst = {}
    for name, curve_col, frame in (
        ("hilbert", "h", L._with_hilbert(grid, "x", "y", bits)),
        ("morton", "z", L._with_z(grid, "x", "y", bits)),
    ):
        ranked = frame.withColumn(
            "bucket",
            ((F.row_number().over(Window.orderBy(curve_col)) - 1)
             * cuts / (n * n)).cast("long"),
        )
        rows = (
            ranked.groupBy("bucket")
            .agg(
                F.expr(f"(max(x) - min(x)) * 10000 div {top}").alias("xs"),
                F.expr(f"(max(y) - min(y)) * 10000 div {top}").alias("ys"),
            )
            .collect()
        )
        assert len(rows) == cuts
        worst[name] = max(r["xs"] + r["ys"] for r in rows)
    assert worst["hilbert"] < worst["morton"], worst
    assert worst["hilbert"] <= 4000, worst  # connected segments stay tight
