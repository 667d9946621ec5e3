"""Portable Bloom runtime filter: prune a huge probe side BEFORE its
shuffle, with a bitset built from a filtered build side.

The 100 TB problem this solves: a fact⋈dim semijoin where the dim's
filtered key set is too large to broadcast AS ROWS (tens of millions
of keys) but its Bloom bitset is a few hundred KB. Spark's own AQE
injects such runtime filters for some shapes
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but the aggregate
(`bloom_filter_agg`) is not public SQL surface in this build and its
sketch bytes are engine-private — the same reason the portable HLL
exists next to DataSketches (operators/sketches.py). This module is
the portable twin: the filter is a RELATION ``(word, bits)`` — a
bitset of m bits stored as m/64 int64 words — built with md5-derived
double hashing, so

  * the probe prefilter is K broadcast hash joins on ``word`` plus a
    mask test — map-only over the probe, zero Python, zero shuffle
    of probe rows before the filter;
  * a DuckDB oracle replays bitset construction AND the probe test
    bit-for-bit (every op is integer //, %, |, &, << on the shared
    60-bit md5 hash), so even the false-positive-rate diagnostic is
    hash-gated, not merely bounded;
  * the bitset is MERGEABLE (bit_or of word rows), so incremental
    build sides fold in without a rebuild — same contract as the
    register ladders.

Correctness contract: a Bloom filter has NO false negatives, so
``bloom_semijoin`` composes prefilter → exact semijoin and its result
is EXACTLY the plain semijoin (the oracle is ordinary SQL); the Bloom
only changes how many probe rows reach the exchange. False positives
cost re-shuffled rows, never wrong answers.

Sizing: m auto-scales with the build-side key count — m =
next_pow2(BITS_PER_KEY·n) with K = 4 probes gives FPR =
(1 − e^(−K·n/m))^K ≤ ~0.24 % at the m = 16n floor (halving each time
the pow2 ceiling doubles headroom). The count() that sizes m scans
only the SMALL side (the same bounded sizing pass as auto_planes /
auto_clusters); fixed-size sketches were the round-7 scale-design
finding — this one is born auto-scaled.

Sign caveat baked into the expressions: bit 63's mask is negative in
signed int64 and DuckDB's ``>>`` is arithmetic while Spark's
``shiftright`` matches — so the membership test is shift-free:
``(bits & mask) = mask``, identical semantics in both engines
regardless of the sign bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dqe_spark.operators.sketches import hash60_expr, with_hash60

#: number of hash probes per key (double hashing h1 + i·h2).
K = 4
#: target bits per build-side key before rounding m up to a power of
#: two; 16 bits/key at K=4 → worst-case FPR ≈ 0.24 %.
BITS_PER_KEY = 16
#: step-hash extractor of the 60-bit md5 hash: h1 = the FULL 60-bit
#: hash (so positions cover m up to 2^60 — with a 30-bit h1 no bit
#: above ~2^32 could ever be set once n > 2^28 keys), h2 = top 30
#: bits (forced odd) steps — classic Kirsch-Mitzenmacher double
#: hashing, independent enough for K=4.
_H_SPLIT = 1 << 30


def next_pow2(v: int) -> int:
    """Smallest power of two ≥ v (v ≥ 1) — mirrors the SQL form
    ``1 << length(bin(v - 1))`` used by the DuckDB oracle replay."""
    return 1 << (v - 1).bit_length() if v > 1 else 1


def _pos_sql(h: str, i: int, m_bits: int) -> str:
    """Dialect-common probe position i for hash column ``h``: every op
    is integer arithmetic both engines define identically (h < 2^60,
    step < 2^30, i ≤ 3 → h + i·step < 2^60 + 2^32, no int64 overflow
    anywhere). h1 is the full hash so positions reach every bit of m
    up to 2^60 — a 30-bit h1 would silently cap the usable bitset at
    ~2^32 bits once the build side passes ~2^28 distinct keys."""
    return (
        f"({h} + {i} * (({h} div {_H_SPLIT}) | 1)) % {m_bits}"
    )


def _pos_duck(h: str, i: int, m_expr: str) -> str:
    """DuckDB spelling of _pos_sql (// for integer division; m may be
    a correlated column, not a literal)."""
    return f"({h} + {i} * (({h} // {_H_SPLIT}) | 1)) % {m_expr}"


def _mask_duck(bit: str) -> str:
    """DuckDB int64 mask for bit ∈ [0,64): DuckDB raises on the
    signed overflow of ``1 << 63`` that Spark's shiftleft wraps to the
    sign bit, so bit 63 is spelled as the int64 minimum literal."""
    return (
        f"CASE WHEN ({bit}) = 63 THEN ((-9223372036854775807)::BIGINT - 1) "
        f"ELSE (1::BIGINT << CAST(({bit}) AS INT)) END"
    )


def _bloom_words(keys: DataFrame, col: str, m_bits: int) -> DataFrame:
    """Bitset words from an ALREADY-DISTINCT key relation — the shared
    tail of bloom_build/sized_bloom_build/bloom_semijoin, so the
    ~1.6 µs/row md5 runs once per distinct key, never per source row."""
    pos = with_hash60(keys, col).select("__h").select(
        F.explode(
            F.array(
                *[F.expr(_pos_sql("__h", i, m_bits)) for i in range(K)]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(__m)").alias("bits"))
    )


def bloom_build(df: DataFrame, col: str, m_bits: int) -> DataFrame:
    """Bitset relation (word:long, bits:long) over the distinct values
    of ``df.col``: K positions per key, OR-folded per 64-bit word.
    ≤ m/64 rows regardless of key count; one groupBy on word (the
    build side is the small side by assumption). Mergeable: two
    builds union + bit_or to the build of the union. Keys dedupe
    BEFORE hashing — hash work ∝ distinct keys, not source rows."""
    return _bloom_words(df.select(col).distinct(), col, m_bits)


def sized_bloom_build(df: DataFrame, col: str) -> tuple[DataFrame, int]:
    """Auto-sized build: m = next_pow2(BITS_PER_KEY · n_distinct).
    The distinct key relation is materialized ONCE (checkpoint) and
    feeds both the sizing count and the bitset — one build-side scan,
    one dedupe, however many consumers."""
    keys = df.select(col).distinct().localCheckpoint(eager=True)
    m_bits = next_pow2(max(BITS_PER_KEY * keys.count(), 64))
    # materialize the (≤ m/64)-row bitset too: the prefilter
    # broadcasts it K times, and without this each broadcast re-runs
    # the bitset aggregation (measured 10.9 s vs ~1 s at sf0.1 — the
    # bitset itself is KBs)
    words = _bloom_words(keys, col, m_bits).localCheckpoint(eager=True)
    return words, m_bits


def bloom_prefilter(
    probe: DataFrame, col: str, words: DataFrame, m_bits: int
) -> DataFrame:
    """Keep probe rows whose K probe bits are ALL set: K broadcast
    hash joins on word + shift-free mask tests. Map-only over the
    probe — the plan moves no probe row to an exchange, which is the
    entire point at 100 TB. May pass false positives (bounded by the
    sizing above), never drops a true match.

    The hash rides the with_hash60 Generate barrier: the K join keys
    and K mask tests all derive from it, and Catalyst inlines plain
    aliases — 8 inlined md5 chains measured 9.6 s where the barrier
    form runs 1.0 s on the same sf0.1 probe. The probe is spread
    first: its md5 chain is the expensive map work and a small
    probe table can arrive as one row group (at scale the scan
    already splits and spread is a no-op, so the map-only plan shape
    is preserved exactly where it matters). The widening hashes on
    the probe key itself — high-cardinality by construction (it is
    the join key) — because a keyless repartition pays a one-task
    sort of the whole single-split probe first (see spread's
    docstring; sf1 medians 3.52 round-robin vs 2.60 hash-by-key)."""
    from dqe_spark.operators.partitioning import spread

    out = with_hash60(spread(probe, by=col), col)
    cond = F.lit(True)
    for i in range(K):
        out = (
            out.withColumn(f"__p{i}", F.expr(_pos_sql("__h", i, m_bits)))
            .withColumn(f"__w{i}", F.expr(f"__p{i} div 64"))
            .withColumn(
                f"__m{i}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT))"
                ),
            )
            .join(
                F.broadcast(
                    words.select(
                        F.col("word").alias(f"__bw{i}"),
                        F.col("bits").alias(f"__bb{i}"),
                    )
                ),
                F.col(f"__w{i}") == F.col(f"__bw{i}"),
                "left",
            )
        )
        cond = cond & (
            F.expr(f"(__bb{i} & __m{i}) = __m{i}")
        )
    drop = ["__h"] + [
        c
        for i in range(K)
        for c in (f"__p{i}", f"__w{i}", f"__m{i}", f"__bw{i}", f"__bb{i}")
    ]
    return out.where(cond).drop(*drop)


def bloom_semijoin(
    probe: DataFrame, pcol: str, build: DataFrame, bcol: str
) -> DataFrame:
    """EXACT semijoin probe⋉build with a Bloom prefilter ahead of the
    exchange: build the auto-sized bitset from build[bcol], prefilter
    the probe map-side, then the ordinary leftsemi join removes the
    Bloom's false positives. Result == probe.join(build, leftsemi) by
    the no-false-negative property; only the shuffled row count
    differs. The build side is scanned ONCE into a checkpointed
    distinct key relation that feeds the sizing count, the bitset,
    and the exact semijoin."""
    keys = (
        build.select(F.col(bcol).alias(pcol))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m_bits = next_pow2(max(BITS_PER_KEY * keys.count(), 64))
    words = _bloom_words(keys, pcol, m_bits).localCheckpoint(eager=True)
    pre = bloom_prefilter(probe, pcol, words, m_bits)
    return pre.join(keys, pcol, "leftsemi")


def bloom_oracle_ctes(
    build_sql: str, bkey: str, probe_sql: str, pkey: str
) -> str:
    """DuckDB replay of build + probe: CTEs ending in ``bloom_pass``
    (the distinct probe keys passing all K bits). ``build_sql`` /
    ``probe_sql`` are full SELECTs projecting one key column each
    (``bkey`` / ``pkey``). Mirrors bloom_build/bloom_prefilter op for
    op — the same md5 hash, positions, masks, and the same shift-free
    membership test."""
    h_b = hash60_expr(bkey, "duckdb")
    h_p = hash60_expr(pkey, "duckdb")
    pos_rows = " UNION ALL ".join(
        f"SELECT __h, {_pos_duck('__h', i, 'm')} AS pos FROM bloom_bh, bloom_m"
        for i in range(K)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {pkey}, {_pos_duck('__h', i, 'm')} AS pos "
        f"FROM bloom_ph, bloom_m"
        for i in range(K)
    )
    return f"""bloom_bkeys AS (
  SELECT DISTINCT {bkey} FROM ({build_sql})
), bloom_m AS (
  SELECT (1::BIGINT
          << length(bin(greatest(count(*) * {BITS_PER_KEY}, 64) - 1))) AS m
  FROM bloom_bkeys
), bloom_bh AS (
  SELECT DISTINCT {h_b} AS __h FROM bloom_bkeys
), bloom_words AS (
  SELECT pos // 64 AS word, bit_or({_mask_duck('pos % 64')}) AS bits
  FROM ({pos_rows}) GROUP BY 1
), bloom_pkeys AS (
  SELECT DISTINCT {pkey} FROM ({probe_sql})
), bloom_ph AS (
  SELECT {pkey}, {h_p} AS __h FROM bloom_pkeys
), bloom_pass AS (
  SELECT p.{pkey}
  FROM ({probe_rows}) p
  JOIN bloom_words w ON w.word = p.pos // 64
   AND (w.bits & ({_mask_duck('p.pos % 64')}))
       = ({_mask_duck('p.pos % 64')})
  GROUP BY 1 HAVING count(*) = {K}
)"""
