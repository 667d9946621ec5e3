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
