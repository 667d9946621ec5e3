"""Full-registry oracle sweep at sf1 (the 10× scale audit) — TIERED.

Usage:  python scripts/sweep_sf1.py [sf_dir] [--full] [--rotate K]

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
#: (round-9 measured seconds in comments; group sums ≈ 12.5/12.1/13.0
#: min). Group ``rotate % 3`` runs each sweep; the rest are skipped
#: loudly. Membership criterion: > 50 s at sf1 in the round-9 flat
#: profile — revisit when a new query crosses that line.
HEAVY_GROUPS = {
    "dedup_clusters": 0,               # 697.5 (label-prop oracle)
    "neardup_ivf": 0,                  # 54.9
    "dedup_minhash_incr": 1,           # 522.2 (store rebuild twin)
    "dql_range_join": 1,               # 76.3  (DuckDB textbook range join)
    "neardup_hybrid": 1,               # 73.3
    "dedup_minhash_lsh": 1,            # 56.2
    "dedup_simhash_neardup": 2,        # 254.4 (~170M true pairs)
    "neardup_cosine": 2,               # 191.7
    "dedup_ngram_jaccard": 2,          # 144.1
    "range_join_click_near_error": 2,  # 75.9
    "emb_pca_project": 2,              # 59.5
    "emb_covariance": 2,               # 52.0
}


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
    exprs = _canon_cols(spark_dtypes, "duckdb")
    s = " || '|' || ".join(exprs)
    row = con.execute(
        f"SELECT count(*), sum(('0x' || substr(md5({s}), 1, 15))"
        f"::BIGINT::HUGEINT) FROM ({sql}) __t"
    ).fetchone()
    return int(row[0]), int(row[1] or 0)


def _rot(name: str) -> int:
    return int(hashlib.md5(name.encode()).hexdigest()[:8], 16) % 3


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.oracle_util import compare

    args = [a for a in sys.argv[1:]]
    full = "--full" in args
    rotate = 0
    if "--rotate" in args:
        rotate = int(args[args.index("--rotate") + 1])
        del args[args.index("--rotate"): args.index("--rotate") + 2]
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
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for n in TABLES:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{sf}/{n}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    fails, t_all = [], time.perf_counter()
    n_digest = n_rows = n_fallback = 0
    skipped = []
    for i, name in enumerate(sorted(osql)):
        t0 = time.perf_counter()
        if not full and HEAVY_GROUPS.get(name, rotate % 3) != rotate % 3:
            skipped.append(name)
            print(
                f"[{i + 1}/{len(osql)}] {name} SKIP (heavy group "
                f"{HEAVY_GROUPS[name]}, active {rotate % 3}; runs when "
                f"rotate % 3 == {HEAVY_GROUPS[name]})",
                flush=True,
            )
            continue
        try:
            df = qs[name](spark, sf)
            mode = (
                "rows"
                if full
                or (name not in HEAVY_GROUPS and _rot(name) == rotate % 3)
                or _nested(df.dtypes)
                else "digest"
            )
            if mode == "digest":
                got = spark_digest(df)
                want = duck_digest(con, osql[name], df.dtypes)
                if got != want:
                    # never trust a digest mismatch: the row compare
                    # is the authority (canonicalization edges must
                    # not fake a failure)
                    print(
                        f"WARN {name}: digest mismatch {got} != {want}; "
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
            print(f"FAIL {name}: {str(e)[:200]}", flush=True)
            continue
        print(
            f"[{i + 1}/{len(osql)}] {name} ok ({mode}, "
            f"{time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    print(
        f"checked {len(osql) - len(skipped)}/{len(osql)} failed {len(fails)} "
        f"(digest {n_digest}, rows {n_rows}, fallback {n_fallback}, "
        f"heavy-skipped {len(skipped)}, rotate {rotate % 3}) "
        f"in {(time.perf_counter() - t_all) / 60:.1f} min"
    )
    if skipped:
        print("HEAVY-SKIPPED (run at their rotation or with --full):", skipped)
    if fails:
        print("FAILED:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
