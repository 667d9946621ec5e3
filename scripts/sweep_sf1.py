"""Full-registry oracle sweep at sf1 (the 10× scale audit) — TIERED.

Usage:  python scripts/sweep_sf1.py [sf_dir] [--full] [--rotate K]
                                    [--out SWEEP.json] [--no-cache]

``--out`` writes a MACHINE-READABLE artifact (round-9 verdict #2 —
the sweep's coverage and wall must be adjudicable without PERF.md
prose): per query {mode, status, seconds, heavy group, whether its
oracle digest came from cache} plus the summary counts, committed as
SWEEP_sf1_r{N}.json alongside the BENCH files.

ORACLE DIGEST CACHE (round-9 verdict #7): in digest mode the DuckDB
side is a pure function of (oracle SQL, parquet bytes) — both static
across sweeps of the same generated sf dir — so its (count, sum)
digest is cached on disk keyed by md5(sql) + per-table (size, mtime).
The heaviest sweep rows were ORACLE compute (dedup_clusters 697 s at
sf1 is almost entirely DuckDB's label-prop replay), so a warm cache
sweeps the full registry paying only the ENGINE side — which is the
thing under test. Row-compare tiers never use the cache (they compare
actual row multisets), so every query still gets a genuinely
independent full compare on its 3-round rotation. ``--no-cache``
forces fresh oracle digests.

Coverage policy (round-9: the flat row-compare sweep hit 55 min at the
215-query registry and grows every round):

  * DEFAULT tier — in-engine DIGEST compare: both engines fold every
    output row to (row_count, Σ hash60(canonical row)) entirely
    in-engine and only two scalars cross into Python. This removes the
    double row fetch + Python multiset sort that dominates the big
    outputs at sf1 (millions of rows through two collect paths), while
    a single flipped bit in any row still moves the sum.
  * ROTATING FULL tier — every query whose md5(name) lands in the
    ``K % 3`` residue class is row-compared EXACTLY like the driver
    gate (tests/oracle_util.compare: count + column names + value
    multiset). Pass --rotate with the round number: every query gets
    a full row compare at least once every 3 rounds.
  * HEAVY rotation — the 12 queries in ``HEAVY_GROUPS`` each cost
    50–700 s at sf1 (measured round 9; the wall is ORACLE/engine
    COMPUTE — e.g. DuckDB's textbook range join, the label-prop
    cluster oracle — so no comparison-mode change can cut it). They
    are split into 3 cost-balanced groups (~12–13 min each); ONE
    group runs per sweep (digest mode), the other two are SKIPPED
    LOUDLY and counted in the summary — never a silent cap. Every
    heavy query is still sf1-verified every 3 rounds, and ALL of them
    run at sf0.01 in every driver gate and at sf0.1 in every
    full-row audit, so the rotation only thins the third, most
    expensive tier of a three-scale ladder.
  * --full — row-compare everything, heavy included (the pre-round-9
    behavior; 53 min at the 217-query registry).
  * Queries whose schema carries nested types (array/map/struct) are
    always row-compared: engine string renderings of nested values
    don't agree, so digesting them would be vacuous or flaky.

Digest canonicalization: columns are rendered to one string per row
with sorted-name column order (the driver's canonicalization), '|'
separators, NULLs as an explicit sentinel (Spark's concat_ws SKIPS
nulls; DuckDB's || nulls the row — both replaced by coalesce), and
doubles via fixed '%.6f' printf (every registry double is rounded at
≥4dp, so 6 decimals preserve the contract; Java format_string and C
printf agree on fixed format) with NaN/±Inf spelled out explicitly.

SAFETY NET: a digest mismatch is NOT trusted on its own — the query is
re-checked with the full row compare, and only a row-level mismatch
counts as a failure (a digest false-positive from a canonicalization
edge prints a warning and is recorded ok). Digests can therefore never
fake a failure; they can only save time.

Budget: the r8 flat sweep ran 55 min; the tiered default is the same
compute with ~2/3 of the fetch/sort removed.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: sentinel for NULL fields inside the canonical row string
_NULL = "␀"

#: compute-heavy sf1 queries, split into cost-balanced rotation groups
#: (round-10 DIGEST-mode seconds in comments — the tier heavies
#: actually run in; group sums ≈ 11.8/11.7/11.9 min uncached). Group
#: ``rotate % 3`` runs each sweep; the rest run too when their oracle
#: digest is cached (engine-only cost), else are skipped loudly.
#: Membership criterion: > 50 s at sf1 — revisit when a new query
#: crosses that line. image_dedup_dhash joined in round 10: its
#: ENGINE is 38 s (52.8M banded pairs), but the rows-tier compare
#: fetched that output twice into Python (1126 s) — exactly the cost
#: class the digest tier exists for.
#: round-11 re-measure (cold oracle seconds at sf1 + engine): the
#: binned-equi-join oracle restatement cut both range joins 80-84 s →
#: 0.5 s, the candidate-pruned verify cut dedup_minhash_incr 135 →
#: 8.7 s, and the integral fast digest cut the md5 tails — so those
#: rows (plus neardup_cosine at 1.3 s oracle / ~3 s engine,
#: image_dedup_dhash at ~17 s, dedup_minhash_lsh ~25 s, emb_* ≤ 10 s)
#: fell under the 50 s line and LEFT the heavy rotation; they now run
#: every sweep. Remaining heavies keep their historical group numbers.
HEAVY_GROUPS = {
    "dedup_clusters": 0,               # 9.7 oracle + ~40 engine
    "dql_neardup": 0,                  # 81.3 sweep row (hybrid replay via DQL)
    "knn_ann_serve": 0,                # 71.7 sweep row (ANN build replay)
    "dedup_simhash_neardup": 1,        # 51.7 oracle (fast digest) + 17 engine
    "neardup_ivf": 1,                  # 50.7 oracle (Lloyd replay) + 11 engine
    "neardup_hybrid": 2,               # 77.8 oracle + ~17 engine
    "dedup_ngram_jaccard": 2,          # 91.8 oracle + ~131 engine
}


#: numeric fast-digest constants: two 31-bit primes (different moduli,
#: so per-column value collisions need v ≡ v' mod p1·p2 ≈ 2^62 — not
#: reachable from distinct int64s except at astronomically unlikely
#: exact multiples) and a golden-ratio multiplier stream for the
#: per-column mixing constants. All row arithmetic stays in BIGINT
#: (c < 2^31, multiplier < 2^31 → every product < 2^62), so the digest
#: is whole-stage-codegen long math in BOTH engines — measured ~2.7x
#: cheaper than the md5-over-canonical-string path on the 170M-row
#: pair outputs it exists for. The md5 path remains for any schema
#: with non-integral columns.
_P1, _P2 = 2147483647, 2147483629
_GOLD = 0x9E3779B97F4A7C15

_INTEGRAL = {"bigint", "int", "smallint", "tinyint"}


def _all_integral(cols_types) -> bool:
    return all(dt in _INTEGRAL for _, dt in cols_types)


def _int_row_hash(cols_types, dialect: str) -> str:
    """Per-row modular mix for ALL-INTEGRAL schemas: for each of two
    31-bit prime moduli, fold the (name-sorted) columns as
    Σ_j mix_j(v_j) mod p with per-column multipliers (NULL gets its
    own per-column constant), then square-mix for nonlinearity; the
    two 31-bit hashes pack into one int64. A digest is then
    (count, Σ row-hash) exactly like the md5 path — one flipped value
    in any row moves the sum (miss probability ~2^-62 per corruption,
    and the row-compare safety net still backs every mismatch)."""
    hs = []
    for p in (_P1, _P2):
        h = None
        for j, (name, _dt) in enumerate(sorted(cols_types)):
            q = f'"{name}"' if dialect == "duckdb" else f"`{name}`"
            mul = (_GOLD * (2 * j + 1)) % p or 1
            nul = (_GOLD * (2 * j + 2)) % p or 1
            # widen BEFORE the +p (an INT column would overflow int32)
            c = f"(((CAST({q} AS BIGINT) % {p}) + {p}) % {p})"
            term = (
                f"(CASE WHEN {q} IS NULL THEN {nul} "
                f"ELSE ({c} * {mul}) % {p} END)"
            )
            h = term if h is None else f"({h} + {term})"
        h = f"(({h}) % {p})"
        hs.append(f"((({h} * {h}) % {p} + {h}) % {p})")
    return f"({hs[0]} * 2147483648 + {hs[1]})"


def _canon_cols(cols_types, dialect: str) -> list[str]:
    """Per-column canonical string expressions, sorted by column name.
    ``cols_types``: list of (name, dtype-string) from the SPARK frame
    (DuckDB columns match by the driver-contract name equality)."""
    out = []
    for name, dt in sorted(cols_types):
        q = f'"{name}"' if dialect == "duckdb" else f"`{name}`"
        if dt in ("double", "float"):
            # 6-decimal fixed quantization via SHARED IEEE arithmetic
            # (floor(x·1e6 + 0.5) is bit-identical in both engines) —
            # a printf('%.6f') twin is NOT: Java's formatter rounds
            # half-up while C rounds half-even, and 4dp-rounded doubles
            # sit on those boundaries often enough to scatter false
            # digest mismatches (15/217 in calibration).
            inf = (
                ("'infinity'::DOUBLE", "'-infinity'::DOUBLE")
                if dialect == "duckdb"
                else ("double('inf')", "double('-inf')")
            )
            st = "VARCHAR" if dialect == "duckdb" else "STRING"
            e = (
                f"CASE WHEN isnan({q}) THEN 'NaN' "
                f"WHEN {q} = {inf[0]} THEN 'Inf' "
                f"WHEN {q} = {inf[1]} THEN '-Inf' "
                f"ELSE CAST(CAST(floor({q} * 1000000 + 0.5) AS BIGINT)"
                f" AS {st}) END"
            )
        else:
            e = f"CAST({q} AS VARCHAR)" if dialect == "duckdb" else f"CAST({q} AS STRING)"
        out.append(f"coalesce({e}, '{_NULL}')")
    return out


def _nested(dtypes) -> bool:
    return any(
        dt.startswith(("array", "map", "struct")) for _, dt in dtypes
    )


def spark_digest(df):
    from pyspark.sql import functions as F

    if _all_integral(df.dtypes):
        h = df.selectExpr(
            f"CAST({_int_row_hash(df.dtypes, 'spark')} AS DECIMAL(38,0)) AS h"
        )
    else:
        exprs = _canon_cols(df.dtypes, "spark")
        s = " || '|' || ".join(exprs)
        h = df.selectExpr(f"{s} AS __s").selectExpr(
            "CAST(conv(substr(md5(__s), 1, 15), 16, 10) AS DECIMAL(38,0)) AS h"
        )
    row = h.agg(
        F.count("*").alias("n"), F.sum("h").cast("decimal(38,0)").alias("s")
    ).first()
    return int(row["n"]), int(row["s"] or 0)


def duck_digest(con, sql, spark_dtypes):
    if _all_integral(spark_dtypes):
        e = f"CAST({_int_row_hash(spark_dtypes, 'duckdb')} AS HUGEINT)"
        row = con.execute(
            f"SELECT count(*), sum({e}) FROM ({sql}) __t"
        ).fetchone()
        return int(row[0]), int(row[1] or 0)
    exprs = _canon_cols(spark_dtypes, "duckdb")
    s = " || '|' || ".join(exprs)
    row = con.execute(
        f"SELECT count(*), sum(('0x' || substr(md5({s}), 1, 15))"
        f"::BIGINT::HUGEINT) FROM ({sql}) __t"
    ).fetchone()
    return int(row[0]), int(row[1] or 0)


def _rot(name: str) -> int:
    return int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % 3


def _data_fingerprint(sf: str) -> str:
    """Static-input fingerprint for the oracle digest cache: the
    per-table parquet (size, mtime) pairs. The sf dirs are generated
    once (make_sf1.py / the driver); any regeneration changes mtimes
    and invalidates every cached digest."""
    parts = []
    for t in TABLES:
        p = Path(sf) / f"{t}.parquet"
        st = p.stat()
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


class OracleDigestCache:
    """Disk cache of DuckDB oracle digests, keyed by (query name,
    md5(oracle sql), md5(spark dtypes), data fingerprint). Lives under
    the gitignored _store tree; one JSON file per sf dir."""

    def __init__(self, sf: str, enabled: bool = True) -> None:
        import json

        self._json = json
        self.enabled = enabled
        self.fp = _data_fingerprint(sf) if enabled else ""
        self.path = (
            Path(__file__).resolve().parent.parent
            / "_store"
            / f"oracle_digests_{Path(sf.rstrip('/')).name}.json"
        )
        self.data: dict[str, list] = {}
        if enabled and self.path.exists():
            try:
                self.data = json.loads(self.path.read_text())
            except Exception:
                self.data = {}
        self.hits = 0

    def _key(self, name: str, sql: str, dtypes) -> str:
        h = hashlib.md5(sql.encode()).hexdigest()
        dt = hashlib.md5(repr(sorted(dtypes)).encode()).hexdigest()[:8]
        # integral schemas digest with the numeric fast hash (round
        # 11) — a different value space than the md5 digests cached
        # before it, so the key carries the digest algorithm to keep
        # stale md5 values from forcing row-compare fallbacks
        ver = "|i2" if _all_integral(dtypes) else ""
        return f"{name}|{h}|{dt}|{self.fp}{ver}"

    def peek(self, name: str, sql: str, dtypes):
        """Like get, but does not count a hit (availability checks)."""
        if not self.enabled:
            return None
        v = self.data.get(self._key(name, sql, dtypes))
        return (int(v[0]), int(v[1])) if v is not None else None

    def get(self, name: str, sql: str, dtypes):
        v = self.peek(name, sql, dtypes)
        if v is not None:
            self.hits += 1
        return v

    def put(self, name: str, sql: str, dtypes, digest) -> None:
        if not self.enabled:
            return
        self.data[self._key(name, sql, dtypes)] = [
            digest[0], str(digest[1])
        ]
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(self._json.dumps(self.data))


def main() -> int:
    import json

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.oracle_util import compare

    args = [a for a in sys.argv[1:]]
    full = "--full" in args
    no_cache = "--no-cache" in args
    # --all-heavy: run off-rotation heavy queries in digest mode even
    # on a cache MISS (paying their oracle replay once to fill the
    # cache) — the one-time warm-up that makes every later sweep cover
    # the full registry at engine-only heavy cost
    all_heavy = "--all-heavy" in args
    rotate = 0
    if "--rotate" in args:
        rotate = int(args[args.index("--rotate") + 1])
        del args[args.index("--rotate"): args.index("--rotate") + 2]
    out_path = None
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        del args[args.index("--out"): args.index("--out") + 2]
    pos = [a for a in args if not a.startswith("--")]
    sf = pos[0] if pos else "/root/repo/_testdata/sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        # one session runs 200+ queries back-to-back; localCheckpoint
        # blocks from finished queries linger until the ContextCleaner
        # notices their references died (default periodicGC is 30 min
        # — longer than the whole sweep), which OOM'd a 24g heap at
        # sf1 mid-run. A short GC interval + more headroom keeps the
        # long-session block churn bounded.
        .config("spark.driver.memory", "40g")
        .config("spark.cleaner.periodicGC.interval", "2min")
        # the periodic System.gc() must not be a stop-the-world full
        # collection on a 40g heap mid-row (see session.py round 11:
        # in-sweep rows measured up to 3x their fresh-session cost
        # before this flag; weak refs still clear at the concurrent
        # cycle's remark so checkpoint blocks keep being freed)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+ExplicitGCInvokesConcurrent",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for n in TABLES:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{sf}/{n}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    cache = OracleDigestCache(sf, enabled=not no_cache)
    fails, t_all = [], time.perf_counter()
    n_digest = n_rows = n_fallback = 0
    skipped = []
    record: dict[str, dict] = {}
    for i, name in enumerate(sorted(osql)):
        t0 = time.perf_counter()
        hg = HEAVY_GROUPS.get(name)
        off_rotation = not full and hg is not None and hg != rotate % 3
        cached = False
        try:
            df = qs[name](spark, sf)
            if off_rotation and (
                _nested(df.dtypes)
                or (
                    not all_heavy
                    and cache.peek(name, osql[name], df.dtypes) is None
                )
            ):
                # off-rotation heavy with no verified cached oracle:
                # the DuckDB side would cost its full replay — skip
                # LOUDLY; it runs at its rotation (which fills the
                # cache, so later sweeps cover it digest-mode free)
                skipped.append(name)
                record[name] = {
                    "mode": "skip",
                    "status": "heavy-skip",
                    "sec": 0.0,
                    "heavy_group": hg,
                }
                print(
                    f"[{i + 1}/{len(osql)}] {name} SKIP (heavy group "
                    f"{hg}, active {rotate % 3}, no cached oracle; "
                    f"runs when rotate % 3 == {hg})",
                    flush=True,
                )
                continue
            mode = (
                "rows"
                if full
                or (name not in HEAVY_GROUPS and _rot(name) == rotate % 3)
                or _nested(df.dtypes)
                else "digest"
            )
            if mode == "digest":
                got = spark_digest(df)
                want = cache.get(name, osql[name], df.dtypes)
                cached = want is not None
                if want is None:
                    want = duck_digest(con, osql[name], df.dtypes)
                    if got == want:
                        # only MATCHED digests are cached: a mismatch
                        # is never trusted (see below), so a cached
                        # value is always a previously-verified oracle
                        cache.put(name, osql[name], df.dtypes, want)
                if got != want:
                    # never trust a digest mismatch: the row compare
                    # is the authority (canonicalization edges must
                    # not fake a failure)
                    print(
                        f"WARN {name}: digest mismatch {got} != {want}"
                        f"{' (cached oracle)' if cached else ''}; "
                        "re-checking with full row compare",
                        flush=True,
                    )
                    compare(qs[name](spark, sf), con, osql[name])
                    mode = "digest->rows"
                    n_fallback += 1
                else:
                    n_digest += 1
            else:
                compare(df, con, osql[name])
                n_rows += 1
        except Exception as e:  # noqa: BLE001 — sweep must finish
            fails.append(name)
            record[name] = {
                "mode": "error",
                "status": "fail",
                "sec": round(time.perf_counter() - t0, 1),
                "heavy_group": hg,
                "error": str(e)[:200],
            }
            print(f"FAIL {name}: {str(e)[:200]}", flush=True)
            continue
        record[name] = {
            "mode": mode,
            "status": "ok",
            "sec": round(time.perf_counter() - t0, 1),
            "heavy_group": hg,
            "oracle_cached": cached,
        }
        print(
            f"[{i + 1}/{len(osql)}] {name} ok ({mode}"
            f"{', cached oracle' if cached else ''}, "
            f"{time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    wall_min = round((time.perf_counter() - t_all) / 60, 1)
    summary = {
        "sf_dir": sf,
        "registry_size": len(osql),
        "checked": len(osql) - len(skipped),
        "failed": len(fails),
        "fails": fails,
        "digest": n_digest,
        "rows": n_rows,
        "fallback": n_fallback,
        "heavy_skipped": skipped,
        "rotate": rotate % 3,
        "full": full,
        "oracle_cache_hits": cache.hits,
        "wall_min": wall_min,
    }
    print(
        f"checked {summary['checked']}/{len(osql)} failed {len(fails)} "
        f"(digest {n_digest}, rows {n_rows}, fallback {n_fallback}, "
        f"heavy-skipped {len(skipped)}, rotate {rotate % 3}, "
        f"oracle-cache hits {cache.hits}) in {wall_min} min"
    )
    if skipped:
        print("HEAVY-SKIPPED (run at their rotation or with --full):", skipped)
    if fails:
        print("FAILED:", fails)
    if out_path:
        Path(out_path).write_text(
            json.dumps({"summary": summary, "queries": record}, indent=1)
            + "\n"
        )
        print(f"artifact written: {out_path}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
