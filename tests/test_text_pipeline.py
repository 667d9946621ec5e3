"""Corpus-pipeline text ops: redaction on strings that actually carry
PII, deterministic splits, and the composed clean pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_redact_patterns(spark):
    from dqe_spark.operators.text import redact

    rows = [
        (1, "contact me at john.doe+spam@example.co.uk please"),
        (2, "see https://example.com/a?b=1#frag and http://x.io"),
        (3, "call +1 (555) 123-4567 now"),
        (4, "clean text no pii at all"),
        (5, "mixed: a@b.io https://c.d +44 20 7946 0958 end"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", redact(F.col("text")).alias("c")).collect()
    }
    assert got[1] == "contact me at <EMAIL> please"
    assert got[2] == "see <URL> and <URL>"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "clean text no pii at all"
    assert got[5] == "mixed: <EMAIL> <URL> <PHONE> end"


def test_redact_matches_duckdb(spark, duck):
    """Java-regex vs RE2 parity on PII-bearing strings (the sf corpus
    has none, so the registry hash check alone can't prove this)."""
    from dqe_spark.operators.text import redact
    from dqe_spark.queries_ext import _REDACT_SQL

    texts = [
        "a@b.io then https://x.y/z and +1 555 000 1111 done",
        "no pii", "e: x.y-z%w@dom.org.", "tel 0123456789",
        "https://u:p@h/p?q=1 a@b.cd",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", redact(F.col("text")).alias("c")).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE _redact(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO _redact VALUES (?, ?)", list(enumerate(texts)))
    sql = _REDACT_SQL.replace("documents", "_redact")
    want = dict(duck.execute(
        f"SELECT doc_id, {sql} FROM _redact").fetchall())
    assert got == want


def test_split_deterministic_and_complete(spark):
    from dqe_spark.operators.text import split_assign
    from dqe_spark.sources.metric_store import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    s1 = d.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    s2 = d.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    splits = {r["s"] for r in s1}
    assert splits <= {"train", "val", "test"}
    n = len(s1)
    n_train = sum(r["s"] == "train" for r in s1)
    assert n_train / n > 0.9  # 98% nominal


def test_clean_corpus_filters_compose(spark):
    from dqe_spark.operators.text import clean_corpus, quality_e4, token_count
    from dqe_spark.sources.metric_store import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    out = clean_corpus(d)
    rows = out.collect()
    assert rows, "clean pass should keep some documents"
    for r in rows:
        assert 20 <= r["n_tokens"] <= 100_000
        assert r["quality_e4"] >= 3000
        assert r["split"] in {"train", "val", "test"}
    # the pass never invents documents
    assert out.count() <= d.count()


def test_dedup_lines_semantics(spark):
    """First occurrence kept in order; ratio exact; single-line docs
    pass through (the sf corpus has no newlines, so the registry hash
    check alone can't prove the multi-line path)."""
    from dqe_spark.operators.text import dedup_lines

    rows = [
        (1, "nav\nbody one\nnav\nbody two\nnav"),
        (2, "only line"),
        (3, "a\na\na\na"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in dedup_lines(df).collect()}
    assert got[1]["text_clean"] == "nav\nbody one\nbody two"
    assert got[1]["n_lines"] == 5 and got[1]["n_distinct_lines"] == 3
    assert got[1]["dup_line_ratio_e4"] == 4000  # 2/5
    assert got[2]["text_clean"] == "only line"
    assert got[2]["dup_line_ratio_e4"] == 0
    assert got[3]["text_clean"] == "a" and got[3]["dup_line_ratio_e4"] == 7500


def test_sample_stratified_quota_and_prefilter_equivalence(spark):
    """The hash prefilter must not change the sample: top-quota by
    (rank hash, id) with the threshold filter equals the same ranking
    without it; quotas are exact; small strata are kept whole."""
    from dqe_spark.operators.sampling import rank_hash, sample_stratified

    rows = [(i, "big" if i % 10 else "small") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sample_stratified(df, 50, strata="source").collect()
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r["source"], []).append(r)
    assert len(by_stratum["big"]) == 50
    # 'small' has 200 rows (i % 10 == 0) -> quota still 50
    assert len(by_stratum["small"]) == 50
    assert {r["rn"] for r in by_stratum["big"]} == set(range(1, 51))

    # brute-force reference ranking without any prefilter
    ranked = df.select(
        "source", "doc_id", rank_hash("source", "doc_id").alias("rh")
    ).collect()
    want = {}
    for src in ("big", "small"):
        rs = sorted(
            (r for r in ranked if r["source"] == src),
            key=lambda r: (r["rh"], r["doc_id"]),
        )[:50]
        want[src] = {r["doc_id"] for r in rs}
    for src in ("big", "small"):
        assert {r["doc_id"] for r in by_stratum[src]} == want[src]

    # strata smaller than the quota are kept whole
    tiny = spark.createDataFrame([(i, "t") for i in range(7)], "doc_id long, source string")
    assert len(sample_stratified(tiny, 50, strata="source").collect()) == 7


def test_sample_fraction_deterministic(spark):
    """Membership is a pure row function: same rows in, same rows out,
    and subsetting the input never changes a surviving row's fate."""
    from dqe_spark.operators.sampling import sample_fraction_deterministic

    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    a = {r["doc_id"] for r in sample_fraction_deterministic(df, 10).collect()}
    b = {r["doc_id"] for r in sample_fraction_deterministic(df, 10).collect()}
    assert a == b and 300 < len(a) < 700  # ~10% of 5000
    half = df.where(F.col("doc_id") < 2500)
    c = {r["doc_id"] for r in sample_fraction_deterministic(half, 10).collect()}
    assert c == {x for x in a if x < 2500}
    assert sample_fraction_deterministic(df, 0).count() == 0
    assert sample_fraction_deterministic(df, 100).count() == 5000


def test_repetition_signals(spark):
    """Hand-checkable repetition math: modal 2-gram, its char
    coverage, and the duplicated-3-gram occurrence fraction."""
    from dqe_spark.operators.text import repetition_signals

    # "spam ham spam ham spam" -> 2-grams: [spam ham, ham spam,
    # spam ham, ham spam] -> modal = "ham spam"/"spam ham" tied at 2;
    # tie-break = lexicographically smallest = "ham spam".
    # 3-grams: [spam ham spam, ham spam ham, spam ham spam] -> dup
    # occurrences 2 of 3.
    rows = [(1, "spam ham spam ham spam"), (2, "all distinct words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert r1.top2_gram == "ham spam" and r1.top2_cnt == 2
    assert r1.top2_char_frac == 2 * len("ham spam") / len("spam ham spam ham spam")
    assert r1.dup3_frac == 2 / 3
    r2 = out[2]
    assert r2.top2_cnt == 1 and r2.dup3_frac == 0.0


def test_quality_gates_verdict_order(spark):
    """Gate order is deterministic: a doc failing several gates gets
    the FIRST one; signals allow re-deriving each verdict."""
    from dqe_spark.operators.text import quality_gates

    rows = [
        (1, "short doc"),                                 # too_short
        (2, " ".join(f"w{i}" for i in range(200))),       # too_long (+unk lang)
        (3, " ".join(f"x{i}" for i in range(30))),        # lang (no stopwords)
        (4, "the a of and to " * 6),                      # en, repeated phrase
        (5, "the quick brown fox jumps over a lazy dog and then "
            "wanders off to find some other interesting things today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in quality_gates(
        df, min_tokens=10, max_tokens=100, min_quality_e4=1000,
        max_dup3_bp=0).collect()}
    assert out[1].verdict == "too_short"
    assert out[2].verdict == "too_long"      # length precedes lang
    assert out[3].verdict == "lang"
    assert out[4].verdict in ("low_quality", "repetitive")
    assert out[5].verdict == "pass"
    # signals are auditable
    assert out[3].lang_pred == "unk" and out[5].lang_pred == "en"
    assert out[4].dup3_bp > 0


def test_tfidf_rare_terms_outrank_common(spark):
    """At equal tf, a rarer term (lower df) must score strictly higher;
    ties break alphabetically; rk is dense 1..k per doc."""
    from dqe_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "alpha beta common common"),
            (2, "alpha gamma common common"),
            (3, "common common common delta"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=3).orderBy("doc_id", "rk").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_e6 for r in rs]
        assert scores == sorted(scores, reverse=True)
    # beta/gamma/delta are df=1; 'common' is df=3 and tf-heavy, but idf
    # dominates: the unique term must rank first in each doc
    assert by_doc[1][0].term == "beta"
    assert by_doc[2][0].term == "gamma"
    assert by_doc[3][0].term == "delta"


def test_substring_spans_and_strip_semantics(spark):
    """Constructed corpus: a 6-token phrase shared by three docs. The
    cut list marks it only in the NON-owner docs (owner = min doc_id),
    strip removes exactly those occurrences (the canonical copy
    survives), overlapping grams merge into one maximal span, and an
    undupped doc passes through untouched."""
    from dqe_spark.operators.dedup import (
        duplicate_substring_spans,
        strip_duplicate_substrings,
        substring_dedup_stats,
    )

    phrase = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (1, f"intro one {phrase} tail one"),
        (2, f"{phrase} closing words here"),
        (3, f"pre {phrase} post"),
        (4, "completely unique text with no shared grams at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    spans = {
        r["doc_id"]: (r["span_start"], r["span_tokens"])
        for r in duplicate_substring_spans(df, k=5).collect()
    }
    # owner (doc 1) keeps its copy; docs 2 and 3 get one merged span
    # covering the phrase's two overlapping 5-grams (6 tokens total)
    assert 1 not in spans and 4 not in spans
    assert spans[2] == (0, 6)
    assert spans[3] == (1, 6)

    got = {
        r["doc_id"]: r.asDict()
        for r in strip_duplicate_substrings(df, k=5).collect()
    }
    assert got[1]["removed_tokens"] == 0
    assert phrase in got[1]["clean_text"]
    assert got[2]["clean_text"] == "closing words here"
    assert got[3]["clean_text"] == "pre post"
    assert got[4]["removed_tokens"] == 0
    # every duplicated gram still occurs somewhere (the owner's copy)
    assert phrase in " | ".join(g["clean_text"] for g in got.values())

    # the report twin counts ALL covered positions (owner included)
    rep = {
        r["doc_id"]: r.asDict()
        for r in substring_dedup_stats(df, k=5).collect()
    }
    assert rep[1]["dup_tokens"] == 6 and rep[1]["n_spans"] == 1
    assert rep[4]["dup_tokens"] == 0 and rep[4]["dup_bp"] == 0


def test_substring_intra_doc_repetition_is_not_duplication(spark):
    """A k-gram repeated MANY times inside one doc but appearing in no
    other doc is not cross-doc duplication: the gram-window test is
    min(doc) != max(doc) over the gram's occurrence rows, and several
    rows from the same doc collapse to min == max. Pins the window
    formulation against the count_distinct >= 2 semantics it replaced
    (a per-ROW count would see 3 occurrences and wrongly cut), and
    that a cross-doc gram inside such a doc still cuts exactly its
    own span."""
    from dqe_spark.operators.dedup import (
        duplicate_substring_spans,
        strip_duplicate_substrings,
        substring_dedup_stats,
    )

    loop = "red green blue cyan magenta"  # one 5-gram, repeated 3x
    shared = "one two three four five"
    rows = [
        (1, f"{loop} {loop} {loop}"),  # intra-doc repetition only
        (2, f"lead {shared} trail"),
        (3, f"{shared} ending"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    spans = {
        r["doc_id"]: (r["span_start"], r["span_tokens"])
        for r in duplicate_substring_spans(df, k=5).collect()
    }
    # doc 1's self-repeats are untouched; doc 3 (non-owner) cuts the
    # shared phrase, doc 2 (owner) keeps it
    assert 1 not in spans and 2 not in spans
    assert spans[3] == (0, 5)

    got = {
        r["doc_id"]: r.asDict()
        for r in strip_duplicate_substrings(df, k=5).collect()
    }
    assert got[1]["removed_tokens"] == 0
    assert got[1]["clean_text"].count("red") == 3
    assert got[3]["clean_text"] == "ending"

    # the report twin likewise scores doc 1 clean
    rep = {
        r["doc_id"]: r.asDict()
        for r in substring_dedup_stats(df, k=5).collect()
    }
    assert rep[1]["dup_tokens"] == 0 and rep[1]["n_spans"] == 0
    assert rep[2]["dup_tokens"] == 5 and rep[3]["dup_tokens"] == 5


def test_unigram_surprisal_orders_rare_above_common(spark):
    """A doc of corpus-frequent tokens scores lower mean surprisal
    than a doc of rare ones; sub-cap vocab keeps exact counts; and the
    score is scale-exact: a token appearing c times in N total scores
    floor((ln N - ln c)*1e9 + 0.5) nano-nats."""
    import math

    from dqe_spark.operators.text import unigram_surprisal

    rows = [(1, "common " * 50), (2, "common rare"), (3, "unique1 unique2")]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict() for r in unigram_surprisal(df).collect()
    }
    n_total = 50 + 2 + 2  # 54 tokens
    s = lambda c: math.floor(
        (math.log(n_total) - math.log(c)) * 1e9 + 0.5
    )
    # the deterministic series-ln is its own spec: it agrees with libm
    # to ~1 nano-nat but not bit-for-bit (that's the point — libm
    # isn't cross-engine reproducible; the series is)
    assert abs(got[1]["mean_surprisal_e9"] - s(51)) <= 2  # count 51
    assert abs(got[2]["mean_surprisal_e9"] - (s(51) + s(1)) // 2) <= 2
    assert abs(got[3]["mean_surprisal_e9"] - s(1)) <= 2
    assert got[1]["mean_surprisal_e9"] < got[3]["mean_surprisal_e9"]


def test_dsir_select_semantics(spark):
    """DSIR (operators/text.dsir_select): docs sharing the target's
    n-gram distribution must outrank distribution-foreign docs; the
    selection draws only from the raw pool; zero-gram docs stay
    eligible at logw 0; the hash-Gumbel draw is a pure function of
    doc_id (re-run identical)."""
    from dqe_spark.operators.text import dsir_select

    tgt_text = "the quick brown fox jumps over the lazy dog"
    rows = [(i, tgt_text, True) for i in range(8)]
    # raw pool: 0..3 echo the target distribution, 4..7 are foreign
    rows += [(100 + i, tgt_text, False) for i in range(4)]
    rows += [(200 + i, "zzz qqq xxx vvv kkk www yyy uuu", False)
             for i in range(4)]
    rows += [(300, "", False)]  # zero-gram doc stays in the pool
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")

    out = dsir_select(df, F.col("is_t"), n_buckets=512, k=9).collect()
    ids = [r.doc_id for r in out]
    assert set(ids) <= {100, 101, 102, 103, 200, 201, 202, 203, 300}
    assert len(ids) == 9
    # importance weights: target-like docs strictly above foreign docs
    w = {r.doc_id: r.logw_e9 for r in out}
    assert min(w[i] for i in (100, 101, 102, 103)) > max(
        w[i] for i in (200, 201, 202, 203)
    )
    assert w[300] == 0 and next(
        r.n_grams for r in out if r.doc_id == 300
    ) == 0
    # echo docs share one text → identical logw; scores still total-
    # ordered by the per-doc Gumbel tiebreak
    assert len({w[i] for i in (100, 101, 102, 103)}) == 1
    scores = [r.score_e9 for r in out]
    assert scores == sorted(scores, reverse=True)
    # determinism: same inputs → same rows in the same order
    again = dsir_select(df, F.col("is_t"), n_buckets=512, k=9).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]
    # k truncates
    assert len(dsir_select(df, F.col("is_t"), k=3).collect()) == 3
