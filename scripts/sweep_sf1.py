"""Full-registry oracle sweep at sf1 (the 10× scale audit).

Usage:  python scripts/sweep_sf1.py [sf_dir]   (default _testdata/sf1)

Same row-for-row compare as the driver gate (tests/oracle_util) for
every query whose output is fetchable, plus a DIGEST compare for
queries whose TRUE output is too large to pull through two Python
fetch paths: both engines compute (row_count, Σ hash60(row)) entirely
in-engine — hash60 is the 60-bit md5 prefix of the '|'-joined
stringified row with columns in sorted-name order (the driver's
canonicalization), summed exactly (DECIMAL(38,0) / HUGEINT, no
overflow below ~2^67 rows) — and only the two scalars cross into
Python. Order-insensitive, value- and column-complete; a single
flipped bit in any row moves the sum.

Round 8 context: dedup_simhash_neardup's true output at sf1 is ~170M
pairs (the cross-copy corpus makes nearly every copy-pair a near-dup).
The r7 sweep skipped it and dedup_clusters because their ORACLES were
quadratic; the oracles are fixed (banded over distinct signatures) and
the digest path closes the remaining materialization gap — no named
skips.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: queries compared by in-engine digest instead of row fetch (true
#: output too large to pull twice into Python at sf1)
DIGEST = {"dedup_simhash_neardup"}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def spark_digest(df):
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    s = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = df.select(s.alias("__s")).selectExpr(
        "CAST(conv(substr(md5(__s), 1, 15), 16, 10) AS DECIMAL(38,0)) AS h"
    )
    row = h.agg(
        F.count("*").alias("n"), F.sum("h").cast("decimal(38,0)").alias("s")
    ).first()
    return int(row["n"]), int(row["s"] or 0)


def duck_digest(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    s = " || '|' || ".join(f'CAST("{c}" AS VARCHAR)' for c in cols)
    row = con.execute(
        f"SELECT count(*), sum(('0x' || substr(md5({s}), 1, 15))"
        f"::BIGINT::HUGEINT) FROM ({sql}) __t"
    ).fetchone()
    return int(row[0]), int(row[1] or 0)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.oracle_util import compare

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_testdata/sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for n in TABLES:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{sf}/{n}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    fails, t_all = [], time.perf_counter()
    for i, name in enumerate(sorted(osql)):
        t0 = time.perf_counter()
        try:
            if name in DIGEST:
                got = spark_digest(qs[name](spark, sf))
                want = duck_digest(con, osql[name])
                assert got == want, f"digest mismatch: {got} != {want}"
                mode = "digest"
            else:
                compare(qs[name](spark, sf), con, osql[name])
                mode = "rows"
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
        f"checked {len(osql)} failed {len(fails)} "
        f"in {(time.perf_counter() - t_all) / 60:.1f} min"
    )
    if fails:
        print("FAILED:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
