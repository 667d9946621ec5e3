"""Deterministic corpus sampling for training-data mixing.

A training-data pipeline rarely takes a corpus whole: it takes "200k
documents from source A, 50k from B" (mixing quotas) with a sample
that is REPRODUCIBLE across runs and engines. Random sampling
(``df.sample``/``sampleBy``) is neither — it depends on partitioning
and seed plumbing. Here the sample is a pure function of the data:
rank every row by a 32-bit md5-derived hash of (stratum, id) and keep
the ``quota`` smallest per stratum. The DuckDB oracle replays the
exact ranking, so the gate verifies the sample membership itself.

Scale design: a naive per-stratum row_number() sends EVERY row of a
stratum through one window partition — the classic single-reducer
skew for a 10-billion-row stratum. The hash prefilter fixes that:
per-stratum counts are tiny (one groupBy), and since the rank hash is
uniform on [0, 2³²), the ``quota`` smallest hashes almost surely lie
under ``safety × quota / count`` of the hash space. Only rows below
that threshold (≈ safety × quota per stratum, independent of stratum
size) reach the window sort. The threshold arithmetic is integer, so
the oracle replays it bit-for-bit; correctness does not depend on the
bound holding — both engines apply the same filter, and with the
default safety=4 the probability of clipping a true top-quota row is
Chernoff-small (P[Binomial(n, 4q/n) < q] < exp(-q)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32


def rank_hash(strata: str, id_col: str):
    """Deterministic per-row rank: first 8 hex chars of
    md5('0:' || stratum || ':' || id), as a long — the engine-wide
    md5/32-bit scheme (dedup._hash32 over the composite key)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit("0"), F.col(strata), F.col(id_col).cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def sample_stratified(
    df: DataFrame,
    quota: int,
    strata: str = "source",
    id_col: str = "doc_id",
    safety: int = 4,
) -> DataFrame:
    """Keep the ``quota`` rows with the smallest rank hash per stratum
    (ties broken by id — exact, deterministic, engine-independent).

    Output: (strata, id_col, rn) with rn ∈ [1, quota] the within-
    stratum sample rank. Strata smaller than the quota are kept whole.
    """
    ranked = df.select(F.col(strata), F.col(id_col), rank_hash(strata, id_col).alias("rh"))
    counts = ranked.groupBy(strata).agg(F.count("*").alias("__n"))
    # pure-integer threshold — replayed bit-for-bit by the oracle
    thr = F.expr(f"CAST(({quota * safety} * {HASH_SPACE}) DIV __n AS LONG)")
    keep = (F.col("__n") <= quota * safety) | (F.col("rh") <= thr)
    survivors = ranked.join(F.broadcast(counts), strata).where(keep)
    w = Window.partitionBy(strata).orderBy(F.col("rh").asc(), F.col(id_col).asc())
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= quota)
        .select(strata, id_col, "rn")
    )


def sample_fraction_deterministic(
    df: DataFrame,
    pct: int,
    strata: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hash-threshold percentage sample: keep rows whose rank hash
    falls in the lowest ``pct`` % of the hash space — map-only (zero
    shuffles), stable under re-runs and insertions (a row's membership
    never depends on other rows). ``strata`` only salts the hash so
    per-stratum samples are independent."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be in [0, 100], got {pct}")
    s = strata if strata is not None else id_col
    rh = rank_hash(s, id_col)
    return df.where(rh * 100 < HASH_SPACE * pct)
