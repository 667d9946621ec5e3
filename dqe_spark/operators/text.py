"""Text-analysis operators for large-scale training-data pipelines.

All pure built-in Column expressions (JVM-side, codegen'd): language-ID
heuristic, quality scoring, token counting, document fingerprinting.
Designed so each has an exact DuckDB-SQL equivalent for the oracle gate.

At 100 TB these are narrow map-only transforms — no shuffle at all;
they pipeline with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny English stopword set for the n-gram/stopword language heuristic
STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def stopword_hits(text: Column) -> Column:
    """Count of stopword occurrences via word-boundary regex."""
    hits = None
    for w in STOPWORDS:
        c = F.size(F.expr(f"regexp_extract_all(text, '\\\\b{w}\\\\b', 0)"))
        hits = c if hits is None else hits + c
    return hits.cast("long")


def lang_id(text: Column) -> Column:
    """Stopword-ratio language ID: English if >2% of tokens are
    stopwords, else 'unk'. (A real deployment swaps in a trained n-gram
    model; the operator shape — narrow expr over tokens — is the same.)"""
    ratio = stopword_hits(text) / token_count(text)
    return F.when(ratio > 0.02, F.lit("en")).otherwise(F.lit("unk"))


def quality_score(text: Column) -> Column:
    """Length × lexical-diversity quality heuristic in [0, 1]:
    min(1, n_tokens/100) * (distinct_tokens / n_tokens), 4dp."""
    n = token_count(text)
    return F.round(
        F.least(F.lit(1.0), n / F.lit(100.0)) * (distinct_token_count(text) / n), 4
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (Rolling-hash shingle fingerprints live in dedup.simhash.)"""
    return F.md5(F.lower(F.trim(text)))


def annotate(df: DataFrame, col: str = "text") -> DataFrame:
    """Attach all text-analysis columns in one narrow projection."""
    t = F.col(col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )


#: GPT-2-style pretokenizer pattern: contractions, letter runs, digit
#: runs, punctuation runs, whitespace remnants — the standard BPE
#: pre-split, minus the lookahead (unsupported in RE2/Java regex alike)
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-pretokenizer segmentation (JVM-side regexp_extract_all)."""
    return F.expr(
        f"regexp_extract_all(text, \"{BPE_PATTERN}\", 0)"
    )


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram, slide a
    w-hash window, keep each window's minimum; the DISTINCT selected
    hashes are the fingerprint set. Guarantee: two documents sharing
    any substring of length ≥ w+k−1 share a fingerprint, so the
    overlap join below finds partial-copy candidates that whole-doc
    or bag-of-shingles methods miss.

    Shape at scale: posexplode is map-side; the only shuffle is the
    per-document window sort (key doc_id — uniform), and output is
    ~n/w fingerprints per doc. Documents shorter than w+k−1 chars
    have no complete window and produce no fingerprints (below the
    guarantee threshold by construction).

    Hashes are the engine-wide md5/32-bit scheme so the DuckDB oracle
    replays the algorithm (dedup._hash32)."""
    from pyspark.sql import Window

    from dqe_spark.operators.dedup import _hash32

    t = F.col(col)
    grams = (
        df.where(F.length(t) >= k + w - 1)
        .select(
            id_col,
            (F.length(t) - (k - 1)).alias("n"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length({col}) - {k - 1}), "
                    f"i -> substring({col}, i, {k}))"
                )
            ).alias("pos", "gram"),
        )
        .select(id_col, "n", "pos", _hash32(F.col("gram"), 0).alias("h"))
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("wmin", F.min("h").over(win))
        .where(F.col("pos") <= F.col("n") - w)
        .select(F.col(id_col), F.col("wmin").alias("fp"))
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Partial-overlap candidates: pairs of documents sharing at least
    min_shared winnowing fingerprints. The equi-join on fingerprint
    value is linear per bucket; fingerprints appearing in more than
    max_df documents (boilerplate) are dropped first — the same skew
    guard as the shingle join, bounding any bucket's contribution to
    max_df² pairs."""
    fp = winnow_fingerprints(df, k, w, col, id_col)
    rare = (
        fp.groupBy("fp").count().where(F.col("count") <= max_df).select("fp")
    )
    fpr = fp.join(rare, "fp")
    a = fpr.select(F.col(id_col).alias("id_i"), "fp")
    b = fpr.select(F.col(id_col).alias("id_j"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_i") < F.col("id_j"))
        .groupBy("id_i", "id_j")
        .agg(F.count("*").alias("shared_fp"))
        .where(F.col("shared_fp") >= min_shared)
    )
