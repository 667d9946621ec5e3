"""Text-analysis operators for large-scale training-data pipelines.

All pure built-in Column expressions (JVM-side, codegen'd): language-ID
heuristic, quality scoring, token counting, document fingerprinting.
Designed so each has an exact DuckDB-SQL equivalent for the oracle gate.

At 100 TB these are narrow map-only transforms — no shuffle at all;
they pipeline with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def quality_e4(col_name: str = "text") -> Column:
    """quality_score in exact integer 1e-4 units:
    (min(n,100) * n_distinct * 10000) DIV (100 * n) — integer math end
    to end, so Spark and the DuckDB oracle agree bit-for-bit."""
    return F.expr(
        f"CAST((least(size(split(trim({col_name}), '\\\\s+')), 100) "
        f"* size(array_distinct(split(trim({col_name}), '\\\\s+'))) * 10000) "
        f"DIV (100 * size(split(trim({col_name}), '\\\\s+'))) AS long)"
    )


def quality_features(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The Gopher/C4-style per-document quality feature set, one narrow
    map-only pass (zero shuffles — pipelines with the scan):

      n_tokens, n_distinct_tokens   — length / lexical diversity
      mean_token_len_e2             — avg word length, int 1e-2 units
      symbol_ratio_e4               — non-alphanumeric-non-space chars
                                      / chars, int 1e-4 units
      stopword_ratio_e4             — stopword hits / tokens, 1e-4
      max_line_frac_e4              — longest line / chars (detects
                                      one-blob documents), 1e-4

    All ratios are integer-domain (x · 10⁴ DIV y) so the DuckDB oracle
    agrees bit-for-bit — these are the gates a pretraining corpus
    filter thresholds on, and a half-boundary float flip would move
    documents across the gate."""
    t = F.col(col)
    tk = tokens(t)
    n = F.size(tk).cast("long")
    nchars = F.length(t).cast("long")
    # total token chars = chars minus whitespace runs collapsed by split
    tok_chars = F.expr(
        f"aggregate(split(trim({col}), '\\\\s+'), 0L, (a, x) -> a + length(x))"
    )
    symbols = nchars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9 \n\t]", ""))
    max_line = F.array_max(F.transform(F.split(t, "\n"), F.length)).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.size(F.array_distinct(tk)).cast("long").alias("n_distinct_tokens"),
        (tok_chars * 100 / n).cast("long").alias("mean_token_len_e2"),
        (symbols * 10000 / nchars).cast("long").alias("symbol_ratio_e4"),
        (stopword_hits(t) * 10000 / n).cast("long").alias("stopword_ratio_e4"),
        (max_line * 10000 / nchars).cast("long").alias("max_line_frac_e4"),
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


def vocab_stats(
    df: DataFrame,
    k: int = 100,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by term frequency, with document
    frequency — the tf/df table behind IDF weighting, vocabulary
    pruning, and tokenizer-training corpus stats.

    The canonical distributed wordcount: explode is map-side, then ONE
    shuffle keyed by token for the combined (tf, df) aggregate —
    count(*) and approx-free count(DISTINCT doc) share the exchange.
    Token frequency is Zipfian by nature (the head token can be ~5% of
    all occurrences) but partial aggregation absorbs the skew: each map
    task pre-merges its local counts, so the hot token's reducer
    receives one partial row per task, not one row per occurrence.
    Deterministic total order (tf desc, token asc) makes top-k stable.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(col))).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(k)
    )


#: redaction patterns — kept to syntax shared by Java regex (Spark)
#: and RE2 (DuckDB) so the oracle replays the exact same rewrite.
REDACT_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def redact(text: Column) -> Column:
    """PII scrubbing: emails, URLs, phone-shaped numbers → typed
    placeholder tokens. Narrow regexp_replace chain — map-only,
    pipelines with the scan; the standard pre-training privacy pass."""
    out = text
    for _name, pat, repl in REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def split_assign(id_col: Column, train_pct: int = 98, val_pct: int = 1) -> Column:
    """Deterministic train/val/test assignment from a stable content
    hash — never random: reruns, backfills, and incremental ingests
    land every document in the same split, which is what prevents
    train/eval contamination. Bucket = md5(id) mod 100."""
    bucket = (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def clean_corpus(
    df: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_quality_e4: int = 3000,
    col: str = "text",
) -> DataFrame:
    """C4-style corpus cleanup as ONE composed narrow pass: token
    bounds + quality threshold + language gate + redaction + split
    assignment. Everything is a Column expression over a single scan —
    no shuffle, no UDF; at 100 TB this runs at parquet-read speed and
    the filters push into the scan where the columns are physical.
    Quality compares in exact integer 1e-4 units (quality_e4)."""
    t = F.col(col)
    n = token_count(t)
    return (
        df.where((n >= min_tokens) & (n <= max_tokens))
        .where(quality_e4(col) >= min_quality_e4)
        .where(lang_id(t) == "en")
        .select(
            "doc_id",
            redact(t).alias("clean_text"),
            n.alias("n_tokens"),
            quality_e4(col).alias("quality_e4"),
            split_assign(F.col("doc_id")).alias("split"),
        )
    )


def split_contamination(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 100,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decontamination scan: document pairs in DIFFERENT splits that
    share ≥ min_shared winnowing fingerprints — substring-level overlap
    between train and eval data is exactly the leakage that inflates
    benchmark scores, and the winnowing guarantee (any shared substring
    of length ≥ w+k−1 shares a fingerprint) is what whole-doc hashes
    miss. Runs AFTER split assignment, which is why assignment must be
    deterministic (split_assign): the contamination report stays valid
    across reruns. Output (id_i, id_j, split_i, split_j, shared_fp)."""
    pairs = winnow_overlap_pairs(df, k, w, min_shared, max_df, col, id_col)
    # no join needed for the split columns: assignment is a pure
    # function of the id, so recompute it on the pair row — the whole
    # decoration stays a narrow projection over the (tiny) pair set.
    return pairs.select(
        "id_i",
        "id_j",
        split_assign(F.col("id_i")).alias("split_i"),
        split_assign(F.col("id_j")).alias("split_j"),
        "shared_fp",
    ).where(F.col("split_i") != F.col("split_j"))


def dedup_lines(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", sep: str = "\n"
) -> DataFrame:
    """Intra-document repetition removal: drop repeated lines, keeping
    each distinct line's FIRST occurrence in order — the standard
    boilerplate/chorus cleaning rule for web-scraped training text
    (repeated nav bars, cookie banners, chat headers).

    Map-only: split → array_distinct (first-occurrence order is the
    documented Spark semantics) → rejoin; zero shuffles, pipelines with
    the scan. Output per doc: the cleaned text, line counts, and the
    duplicate-line ratio in integer 1e-4 units (exact cross-engine).
    """
    lines = F.split(F.col(col), sep)
    uniq = F.array_distinct(lines)
    n, nu = F.size(lines), F.size(uniq)
    return df.select(
        F.col(id_col),
        F.array_join(uniq, sep).alias("text_clean"),
        n.cast("long").alias("n_lines"),
        nu.cast("long").alias("n_distinct_lines"),
        ((n - nu) * F.lit(10000) / n).cast("long").alias("dup_line_ratio_e4"),
    )


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

    Shape at scale: MAP-ONLY — the k-gram hashes live in a per-doc
    array and each window's min comes from array_min(slice(...)), so
    the whole fingerprint derivation is a narrow Project with zero
    shuffles (the earlier posexplode + per-doc window sort + distinct
    formulation shuffled ~L rows per document twice). array_distinct
    dedups within the doc, and cross-doc duplicates can't exist for a
    (doc_id, fp) output, so no distinct is needed afterwards. Output
    is ~L/w fingerprints per doc. Documents shorter than w+k−1 chars
    have no complete window and produce no fingerprints (below the
    guarantee threshold by construction).

    Hashes are the engine-wide md5/32-bit scheme so the DuckDB oracle
    replays the algorithm (dedup._hash32)."""
    from dqe_spark.operators.partitioning import spread

    t = F.col(col)
    # h[i] = hash32 of the i-th k-gram (1-based), one md5 per gram
    hs = (
        f"transform(sequence(1, length({col}) - {k - 1}), "
        f"i -> cast(conv(substring(md5(concat('0:', "
        f"substring({col}, i, {k}))), 1, 8), 16, 10) as bigint))"
    )
    # window i covers h[i .. i+w-1]; L-(k+w-2) windows total
    fps = (
        f"array_distinct(transform(sequence(1, length({col}) - {k + w - 2}), "
        f"i -> array_min(slice(__h, i, {w}))))"
    )
    return (
        spread(df)
        .where(F.length(t) >= k + w - 1)
        .select(id_col, F.col(col), F.expr(hs).alias("__h"))
        .select(id_col, F.explode(F.expr(fps)).alias("fp"))
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


# -- repetition quality signals (Gopher-style filters) ----------------------

# 0-based word n-grams; guarded so short docs yield an empty (typed)
# array instead of a descending sequence()
_G2 = (
    "CASE WHEN size(__tk) >= 2 THEN "
    "transform(sequence(0, size(__tk) - 2), "
    "i -> concat(__tk[i], ' ', __tk[i + 1])) "
    "ELSE CAST(array() AS array<string>) END"
)
_G3 = (
    "CASE WHEN size(__tk) >= 3 THEN "
    "transform(sequence(0, size(__tk) - 3), "
    "i -> concat(__tk[i], ' ', __tk[i + 1], ' ', __tk[i + 2])) "
    "ELSE CAST(array() AS array<string>) END"
)

# run-length fold over the SORTED 2-gram array: longest run = the modal
# gram and its count. Strict '>' keeps the FIRST (lexicographically
# smallest) gram on ties — the same deterministic tie-break as the
# oracle's ORDER BY cnt DESC, gram ASC.
_TOP2 = """
aggregate(
  array_sort(__g2),
  named_struct('prev', CAST(NULL AS STRING), 'run', 0,
               'best', CAST(NULL AS STRING), 'bc', 0),
  (a, x) -> named_struct(
    'prev', x,
    'run',  CASE WHEN x = a.prev THEN a.run + 1 ELSE 1 END,
    'best', CASE WHEN (CASE WHEN x = a.prev THEN a.run + 1 ELSE 1 END) > a.bc
                 THEN x ELSE a.best END,
    'bc',   CASE WHEN (CASE WHEN x = a.prev THEN a.run + 1 ELSE 1 END) > a.bc
                 THEN (CASE WHEN x = a.prev THEN a.run + 1 ELSE 1 END)
                 ELSE a.bc END),
  a -> named_struct('g', a.best, 'c', a.bc))
"""

# occurrences belonging to any duplicated 3-gram: when a run reaches 2
# both occurrences count, each further repeat adds 1
_DUP3 = """
aggregate(
  array_sort(__g3),
  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'dup', 0),
  (a, x) -> named_struct(
    'prev', x,
    'run', CASE WHEN x = a.prev THEN a.run + 1 ELSE 1 END,
    'dup', a.dup + CASE WHEN x = a.prev
                        THEN CASE WHEN a.run = 1 THEN 2 ELSE 1 END
                        ELSE 0 END),
  a -> a.dup)
"""


def repetition_signals(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1):
    the modal word 2-gram with its count and character coverage, and
    the fraction of 3-gram occurrences belonging to a duplicated
    3-gram. Docs dominated by a repeated phrase score high on both and
    get dropped by quality gates.

    Scale shape: entirely map-only — per-document sorted-array
    run-length folds in JVM higher-order functions (no explode, no
    shuffle, no Python). Work is O(tokens log tokens) per document,
    embarrassingly parallel at any corpus size.

    Exactness: counts and lengths are integers on both engines; each
    output fraction is ONE IEEE division of identical integers, so
    results are bit-identical to the SQL oracle with zero tolerance.
    """
    base = df.select(
        F.col(id_col),
        F.col(col).alias("__text"),
        F.split(F.trim(F.col(col)), r"\s+").alias("__tk"),
    ).select(
        id_col,
        "__text",
        F.expr(_G2).alias("__g2"),
        F.expr(_G3).alias("__g3"),
    )
    top = base.select(
        id_col,
        "__text",
        F.expr(_TOP2).alias("__t2"),
        F.expr(_DUP3).alias("__d3"),
        F.size("__g3").alias("__n3"),
    )
    return top.select(
        id_col,
        F.col("__t2.g").alias("top2_gram"),
        F.col("__t2.c").cast("long").alias("top2_cnt"),
        (
            (F.col("__t2.c") * F.length("__t2.g")).cast("double")
            / F.length("__text").cast("double")
        ).alias("top2_char_frac"),
        F.when(
            F.col("__n3") > 0,
            F.col("__d3").cast("double") / F.col("__n3").cast("double"),
        ).alias("dup3_frac"),
    )


# -- declarative quality gating ---------------------------------------------

#: ordered gate names (first failing gate is the verdict)
GATE_ORDER = ("too_short", "too_long", "lang", "low_quality", "repetitive")


def quality_gates(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 5000,
    langs: tuple[str, ...] = ("en",),
    min_quality_e4: int = 2000,
    max_dup3_bp: int = 500,
) -> DataFrame:
    """The corpus admission filter as ONE declarative map-only pass:
    every document gets a verdict — the FIRST failing gate in
    GATE_ORDER, or 'pass' — plus the integer-domain signals the
    decision used (auditable: a verdict can be re-derived from the
    row). Gates: token-count band, language allowlist, lexical-quality
    floor (quality_e4 units of 1e-4), duplicated-3-gram ceiling in
    basis points.

    All signals are exact integers (the established cross-engine
    discipline), so verdicts hash bit-identical to the SQL oracle; the
    whole pass is narrow expressions over each doc's own token array —
    no shuffle, no Python."""
    base = df.select(
        F.col(id_col),
        F.col(col).alias("text"),  # stopword_hits resolves `text` by name
        F.split(F.trim(F.col(col)), r"\s+").alias("__tk"),
    ).select(
        id_col,
        "text",
        "__tk",
        F.expr(_G3).alias("__g3"),
    )
    sig = base.select(
        id_col,
        F.size("__tk").cast("long").alias("n_tokens"),
        F.when(
            50 * stopword_hits(F.col("text")) > F.size("__tk"), F.lit("en")
        ).otherwise(F.lit("unk")).alias("lang_pred"),
        F.expr(
            "CAST((least(size(__tk), 100) * size(array_distinct(__tk)) "
            "* 10000) DIV (100 * size(__tk)) AS long)"
        ).alias("quality_e4"),
        F.expr(_DUP3).alias("__d3"),
        F.size("__g3").cast("long").alias("__n3"),
    ).select(
        id_col,
        "n_tokens",
        "lang_pred",
        "quality_e4",
        F.expr(
            "CAST(CASE WHEN __n3 > 0 THEN (10000 * __d3) div __n3 "
            "ELSE 0 END AS long)"
        ).alias("dup3_bp"),
    )
    lang_ok = F.col("lang_pred").isin(*langs)
    verdict = (
        F.when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("n_tokens") > max_tokens, "too_long")
        .when(~lang_ok, "lang")
        .when(F.col("quality_e4") < min_quality_e4, "low_quality")
        .when(F.col("dup3_bp") > max_dup3_bp, "repetitive")
        .otherwise("pass")
    )
    return sig.select(
        id_col, "n_tokens", "lang_pred", "quality_e4", "dup3_bp",
        verdict.alias("verdict"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k salient terms per document by TF-IDF — per-document
    keyword extraction over the whole corpus (the per-doc complement
    of BM25, which ranks documents for one query).

    Token rule matches the inverted index (lowercase, [a-z0-9] runs).
    Scoring stays in the INTEGER domain so both engines rank
    identically: idf is BM25's rational form (N − df + ½)/(df + ½)
    without the log (log's last-bit noise diverges cross-engine on ~8%
    of inputs — measured for bm25_search), and

        score_e6 = tf · (2N − 2df + 1) · 10⁶ div (2df + 1)

    is one exact floor division. The numerator is computed in
    DECIMAL(38,0) (like bm25_search's rational idf) so it cannot
    silently wrap a 64-bit long on a huge corpus (tf·N products pass
    ~9.2·10¹⁸ around N ≈ 4·10¹⁰ at tf ≤ 100); the quotient itself
    always fits a long because score_e6 ≤ tf · 2N · 10⁶. Ties break
    on term asc, so top-k membership is fully deterministic.

    Plan shape: explode → (id, term) groupBy for tf (partial agg
    absorbs the fan-out), a vocabulary-sized groupBy for df, an
    AQE-sized join of tf against the vocab table (no broadcast hint —
    a 100 TB corpus's vocabulary may not broadcast), a 1-row count
    cross-joined broadcast, and a per-document window whose partitions
    are bounded by each doc's distinct-term count.

    Output: (id, rk, term, score_e6).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    tk = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = tk.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_e6",
            F.expr(
                "CAST(CAST(tf AS DECIMAL(38,0)) * (2 * n_docs - 2 * df + 1)"
                " * 1000000 AS DECIMAL(38,0))"
                " DIV CAST(2 * df + 1 AS DECIMAL(38,0))"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_e6").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select(id_col, "rk", "term", "score_e6")
    )


def unigram_surprisal(
    df: DataFrame,
    vocab_cap: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Information-theoretic corpus quality score: each document's
    mean unigram surprisal −ln p(token) in nano-nats, where p is the
    corpus's own unigram model — the KenLM-style perplexity filter's
    distribution-free little sibling (low = repetitive boilerplate,
    high = rare-token soup; the healthy middle is what a pretraining
    mix keeps).

    Cross-engine exact: ln comes from the deterministic integer-ln of
    operators/sketches.py (bit-length mantissa split + atanh series —
    no libm call crosses engines), per-token surprisal is quantized to
    integer nano-nats BEFORE summing (float sums are reduction-order
    dependent; integer sums are not), and the per-doc mean is one
    floor division — so the DuckDB oracle replays every value
    bit-for-bit.

    OOV rule: only the ``vocab_cap`` most frequent tokens (count desc,
    token asc — fully deterministic) carry their own counts; rarer
    tokens score as count = 1 (maximal surprisal). This bounds the
    vocabulary join side at any corpus size — at 100 TB the raw
    distinct-token count is unbounded (typos, ids), the capped vocab
    broadcasts.

    Plan shape: explode → vocabulary groupBy (partial aggs absorb the
    Zipf skew), deterministic top-cap, per-token scores joined back
    (broadcast — the capped vocab is small by construction), one
    per-doc aggregate. Output: (id, n_tokens, mean_surprisal_e9).
    """
    from dqe_spark.operators.partitioning import spread
    from dqe_spark.operators.sketches import ln_int_expr

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    # widen the scan first: the integer-ln scoring is ~40 expression
    # terms per token and the corpus arrives as a couple of row
    # groups — and the spread exchange is REUSED by all three
    # branches that re-derive the token stream (vocab, total, score)
    tk = spread(df).select(F.col(id_col), F.explode(toks).alias("term"))
    counts = tk.groupBy("term").agg(F.count("*").alias("c"))
    # distributed top-k (TakeOrdered), NOT a global row_number window —
    # the full vocabulary never funnels through one partition
    vocab = counts.orderBy(F.col("c").desc(), F.col("term").asc()).limit(
        vocab_cap
    )
    total = tk.agg(F.count("*").alias("n_total"))
    ln_n = ln_int_expr("n_total", "spark")
    ln_c = ln_int_expr("coalesce(c, 1)", "spark")
    scored = (
        tk.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.expr(
                f"CAST(floor(({ln_n} - {ln_c}) * 1000000000.0 + 0.5) AS BIGINT)"
            ).alias("s_e9"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.expr("sum(s_e9) div count(*)").alias("mean_surprisal_e9"),
    )


def dsir_gram_buckets(
    df: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, _is_t, bucket) — ONE ROW PER hashed uni+bigram occurrence,
    map-only (tokenize → explode → hash % B). The pre-aggregation form
    shared by dsir_bucket_counts and the STREAMING model twin
    (streaming/ingest.stream_dsir_model needs a single aggregation
    over this stream — chained streaming groupBys are unsupported)."""
    from dqe_spark.operators.partitioning import spread
    from dqe_spark.operators.sketches import hash60_expr

    # the per-gram md5 chain is ~1.6 µs/row of CPU and the documents
    # corpus arrives as a couple of row groups — without widening, the
    # whole tokenize+hash pass runs on one or two cores (winnow's
    # spread rationale; streaming frames pass through untouched)
    df = spread(df)

    B = int(n_buckets)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    d = df.select(
        F.col(id_col), target.cast("boolean").alias("_is_t"),
        toks.alias("_toks"),
    )
    grams = d.select(
        id_col,
        "_is_t",
        F.explode(
            F.concat(
                F.col("_toks"),
                F.expr(
                    "zip_with(slice(_toks, 1, greatest(size(_toks)-1, 0)),"
                    " slice(_toks, 2, greatest(size(_toks)-1, 0)),"
                    " (x, y) -> concat(x, ' ', y))"
                ),
            )
        ).alias("gram"),
    )
    return grams.select(
        id_col,
        "_is_t",
        F.expr(f"{hash60_expr('gram', 'spark')} % {B}").alias("bucket"),
    )


def dsir_bucket_counts(
    df: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, _is_t, bucket, c) hashed uni+bigram occurrence counts —
    the ONE corpus-sized shuffle of the DSIR ladder (map-side-combined
    groupBy), shared by the inline model fit, the persisted model
    store (sources/dsir_store.py — counts are ADDITIVE, so the store
    increments by sum-merge like the CMS ladder), and pool scoring."""
    return dsir_gram_buckets(df, target, n_buckets, id_col, text_col).groupBy(
        id_col, "_is_t", "bucket"
    ).agg(F.count("*").cast("long").alias("c"))


def dsir_model_counts(bk: DataFrame) -> DataFrame:
    """Fold (doc, bucket) counts to the ≤B-row model relation
    (bucket, ct, cr) — target and raw occurrence totals per bucket.
    ADDITIVE: two corpora's model counts sum to the union's (the
    increment contract of sources/dsir_store.py)."""
    return bk.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(F.col("_is_t"), 0).otherwise(F.col("c")))
        .cast("long")
        .alias("cr"),
    )


def dsir_lambda(model: DataFrame, n_buckets: int = 4096) -> DataFrame:
    """Per-bucket nano-nat log-likelihood ratio λ from the model
    counts: λ[b] = ln(ct+1) − ln(nt+B) − ln(cr+1) + ln(nr+B), every ln
    the deterministic integer series the oracle replays. ≤B rows —
    broadcasts at any corpus size."""
    from dqe_spark.operators.sketches import ln_int_expr

    B = int(n_buckets)
    tot = model.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    return model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.expr(
            "CAST(floor(("
            f"{ln_int_expr('ct + 1', 'spark')}"
            f" - {ln_int_expr(f'nt + {B}', 'spark')}"
            f" - {ln_int_expr('cr + 1', 'spark')}"
            f" + {ln_int_expr(f'nr + {B}', 'spark')}"
            ") * 1000000000.0 + 0.5) AS BIGINT)"
        ).alias("lam_e9"),
    )


def dsir_select(
    df: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: DataFrame | None = None,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, NeurIPS): pick the k raw-pool documents whose hashed n-gram
    distribution looks most like a small trusted TARGET corpus.

    The published recipe, made bit-exact across engines:

      1. features: unigrams + space-joined bigrams of the index-rule
         tokens, hashed into ``n_buckets`` buckets (md5-derived
         hash60 % B — both engines agree);
      2. bag-of-buckets models with add-1 smoothing fit on the target
         split and the raw split in ONE aggregation pass;
      3. per-bucket log-likelihood ratio
         λ[b] = ln(n_t[b]+1) − ln(N_t+B) − ln(n_r[b]+1) + ln(N_r+B)
         computed with the deterministic integer-ln of
         operators/sketches.py and quantized to integer nano-nats —
         per-doc importance log-weights are then INTEGER sums, immune
         to float reduction order;
      4. Gumbel-top-k resampling without replacement: the noise is
         g = −ln(−ln u) with u derived from hash60('g:'‖doc_id), so
         the "random" draw is a pure function of the doc id that
         DuckDB replays exactly (−ln u is quantized to nano-nats,
         then fed back through the integer-ln).

    Scale shape: the exploded gram stream collapses ONCE to
    (doc, bucket) occurrence counts (map-side-combined — the only
    corpus-sized shuffle); the model fit reduces that to ≤ B rows
    (B is a constant — the λ relation broadcasts at any corpus size);
    scoring is the count relation joined broadcast-to-λ with
    Σ c·λ per doc; selection is a distributed top-k (TakeOrdered),
    never a global sort. Zero-gram raw docs stay in the pool with
    logw = 0 via the final left join.

    ``model`` (bucket, ct, cr — e.g. from sources/dsir_store.py's
    persisted relation) skips the model fit AND the target split's
    gram pass entirely: only the raw pool is tokenized, so a
    selection against a persisted model pays ONE corpus pass instead
    of two — and repeated selections at different k are model-free.

    Output: (doc_id, n_grams, logw_e9, score_e9), the k selected rows,
    ordered (score_e9 DESC, doc_id ASC).
    """
    from dqe_spark.operators.sketches import hash60_expr, ln_int_expr

    B = int(n_buckets)
    if model is None:
        # collapse the exploded gram stream to (doc, bucket)
        # occurrence counts FIRST — one map-side-combined shuffle at
        # the finest granularity any consumer needs; the model fit
        # (B rows) and the per-doc scoring both derive from this far
        # smaller relation instead of each re-shuffling the raw stream
        bk = dsir_bucket_counts(df, target, B, id_col, text_col)
        model = dsir_model_counts(bk)
    else:
        # persisted model: gram only the raw pool (the target split
        # never re-tokenizes)
        bk = dsir_bucket_counts(
            df.where(~target), F.lit(False), B, id_col, text_col
        )
    lam = dsir_lambda(model, B)
    logw = (
        bk.where(~F.col("_is_t"))
        .join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("lam_e9")).cast("long").alias(
                "logw_e9"
            ),
        )
    )
    # deterministic Gumbel noise from the doc id, STAGED through
    # short column refs — ln_int_expr repeats its argument ~20× per
    # level, so nesting it on itself would blow the expression tree
    # up exponentially (greatest(...,1) keeps the nested ln total on
    # the measure-zero u == 1 corner)
    h = hash60_expr(f"concat('g:', CAST({id_col} AS STRING))", "spark")
    t_e9 = (
        f"greatest(CAST(floor(({ln_int_expr(str(1 << 60), 'spark')}"
        f" - {ln_int_expr('_h + 1', 'spark')})"
        " * 1000000000.0 + 0.5) AS BIGINT), 1)"
    )
    g_e9 = (
        f"CAST(floor(({ln_int_expr('1000000000', 'spark')}"
        f" - {ln_int_expr('_t_e9', 'spark')})"
        " * 1000000000.0 + 0.5) AS BIGINT)"
    )
    pool = (
        df.where(~target)
        .select(id_col)
        .join(logw, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("logw_e9", F.lit(0).cast("long")).alias("logw_e9"),
            F.expr(h).alias("_h"),
        )
        .withColumn("_t_e9", F.expr(t_e9))
        .withColumn("score_e9", F.expr(f"logw_e9 + ({g_e9})"))
        .drop("_h", "_t_e9")
    )
    return pool.orderBy(
        F.col("score_e9").desc(), F.col(id_col).asc()
    ).limit(k)
