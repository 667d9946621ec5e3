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
