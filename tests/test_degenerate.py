"""Frozen degenerate-data corpus (round-7 verdict #5): every
adversarial shape a scale sweep has ever caught, encoded as a
fast in-repo pytest so the dedup / similarity / text families
re-prove them in seconds instead of at 10-minute sf1 sweep cost.

Shapes and where they bit:
  * ALL-IDENTICAL DOCUMENTS — r6 sweep: identical-ts replicas;
    byte-identical texts collapse every signature and band key.
  * IDENTICAL EMBEDDINGS — r7 sweep: the sf1 cross-copy corpus
    collapsed simhash/SRP band keys and made banded self-joins
    quadratic (fixed by grouping identical signatures first).
  * EMPTY / WHITESPACE / ONE-TOKEN DOCUMENTS — shingle/gram floors:
    docs shorter than the window produce no shingles/grams at all and
    must flow through (not crash, not pair).
  * SINGLE HOT TAG KEY — every row in one group: group-by plans must
    still be correct when there is exactly one (skewed) key.

The assertions pin CURRENT contract behavior (shared with the DuckDB
oracles), including the deliberate split-semantics floor that an
empty/whitespace text counts ONE token (split(trim('')) = ['']) —
that floor is what keeps every ratio feature division-safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# ---------------------------------------------------------------- fixtures

IDENT_TEXT = (
    "the quick brown fox jumps over the lazy dog again and again"
)


def _ident_docs(spark, n=12):
    return spark.createDataFrame(
        [(i, IDENT_TEXT) for i in range(n)], "doc_id long, text string"
    )


def _weird_docs(spark):
    return spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "hello"), (4, "x"), (5, "two words")],
        "doc_id long, text string",
    )


def _ident_embs(spark, n=10):
    base = [1.0, 0.0, 2.0, -1.0]
    rows = [(i, base) for i in range(n)]
    rows += [(100, [0.0, 1.0, 0.0, 0.0]), (101, [-1.0, 0.0, -2.0, 1.0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------------------ identical documents


def test_identical_docs_exact_dedup(spark):
    from dqe_spark.operators import dedup as D

    rows = D.dedup_exact(_ident_docs(spark)).collect()
    assert len(rows) == 1
    assert rows[0]["keep_id"] == 0 and rows[0]["n_copies"] == 12


def test_identical_docs_minhash_all_pairs_jaccard_one(spark):
    from dqe_spark.operators import dedup as D

    pairs = D.minhash_lsh_pairs(_ident_docs(spark), 0.7).collect()
    assert len(pairs) == 12 * 11 // 2
    assert all(r["jaccard"] == 1.0 and r["id_i"] < r["id_j"] for r in pairs)


def test_identical_docs_simhash_collapse_one_cluster(spark):
    from dqe_spark.operators import dedup as D

    d = _ident_docs(spark)
    sigs = D.simhash_signatures(d).select("simhash").distinct().collect()
    assert len(sigs) == 1  # full signature collapse — the r7 shape
    pairs = D.simhash_neardup_pairs(d, max_hamming=3)
    got = pairs.collect()
    assert len(got) == 12 * 11 // 2
    assert all(r["hamming"] == 0 for r in got)
    clusters = D.dedup_clusters(d, pairs.select("id_i", "id_j")).collect()
    assert {r["cluster_id"] for r in clusters} == {0}
    assert len(clusters) == 12


def test_identical_docs_substring_strip_keeps_only_owner(spark):
    from dqe_spark.operators import dedup as D

    d = _ident_docs(spark)
    spans = D.duplicate_substring_spans(d).collect()
    n_tok = len(IDENT_TEXT.split())
    # every non-owner doc is one full-width span
    assert sorted(r["doc_id"] for r in spans) == list(range(1, 12))
    assert all(
        r["span_start"] == 0 and r["span_tokens"] == n_tok for r in spans
    )
    stripped = {
        r["doc_id"]: r["clean_text"]
        for r in D.strip_duplicate_substrings(d).collect()
    }
    assert stripped[0] == IDENT_TEXT.lower()
    assert all(stripped[i] == "" for i in range(1, 12))


# -------------------------------------------------- empty/one-token corpus


def test_empty_and_tiny_docs_flow_through_text_features(spark):
    from dqe_spark.operators import text as T

    w = _weird_docs(spark)
    counts = {
        r["doc_id"]: r["n"]
        for r in w.select(
            "doc_id", T.token_count(F.col("text")).alias("n")
        ).collect()
    }
    # the deliberate floor: split(trim('')) = [''] → one token, which
    # keeps every downstream ratio division-safe (shared by the oracle)
    assert counts == {1: 1, 2: 1, 3: 1, 4: 1, 5: 2}
    # quality + lang-id evaluate without error on every row
    q = w.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("q"),
        T.lang_id(F.col("text")).alias("lang"),
    ).collect()
    assert len(q) == 5 and all(r["q"] is not None for r in q)


def test_empty_docs_produce_no_shingles_or_pairs(spark):
    from dqe_spark.operators import dedup as D

    w = _weird_docs(spark)
    assert D.shingle_sets(w).count() == 0  # all below the shingle window
    assert D.minhash_lsh_pairs(w, 0.5).count() == 0
    assert D.duplicate_substring_spans(w).count() == 0
    # strip over a corpus with no duplicated grams returns every doc
    assert D.strip_duplicate_substrings(w).count() == 5


def test_empty_docs_surprisal_drops_tokenless_rows(spark):
    from dqe_spark.operators import text as T

    got = {
        r["doc_id"]: r["n_tokens"]
        for r in T.unigram_surprisal(_weird_docs(spark)).collect()
    }
    # '' and '   ' produce no token rows — they are absent, not NULL
    assert got == {3: 1, 4: 1, 5: 2}


# ------------------------------------------------------ identical embeddings


def test_identical_embeddings_neardup_and_survivors(spark):
    from dqe_spark.operators import similarity as S

    emb = _ident_embs(spark)
    pairs = S.neardup_srp_pairs(emb, 0.999)
    got = pairs.collect()
    # the 10 identical vectors pair completely at cosine 1.0; the two
    # distinct vectors pair with nothing at this threshold
    assert len(got) == 10 * 9 // 2
    assert all(r["id_i"] < r["id_j"] < 10 for r in got)
    assert all(abs(r["cos"] - 1.0) < 1e-12 for r in got)
    survivors = sorted(
        r["vec_id"]
        for r in S.semantic_survivors(
            emb, pairs.select("id_i", "id_j")
        ).collect()
    )
    assert survivors == [0, 100, 101]


def test_identical_embeddings_knn_is_total(spark):
    from dqe_spark.operators import similarity as S

    emb = _ident_embs(spark)
    q = emb.where(F.col("vec_id") == 0)
    corpus = emb.where(F.col("vec_id") != 0)
    top = S.knn_bruteforce(corpus, q, 9).collect()
    assert len(top) == 9
    # the nine identical twins outrank both distinct vectors
    assert {r["vec_id"] for r in top} == set(range(1, 10))


# ---------------------------------------------------------- single hot key


def test_single_hot_tag_key_group_by(spark):
    """Every row in ONE group: the grouped windowed aggregate must
    equal the global aggregate — correctness under maximal key skew
    (AQE handles the physical skew; this pins the logical result)."""
    from dqe_spark.operators.windows import window_agg

    rows = [("m", "hot", 60_000 * (i % 7), float(i)) for i in range(400)]
    df = spark.createDataFrame(
        rows, "metric string, host string, ts_ms long, value double"
    )
    got = {
        (r["host"], r["wts"]): r["value"]
        for r in window_agg(
            df, 3_600_000, F.avg("value"), "value", keys=("host",)
        ).collect()
    }
    want = {
        (r["host"], r["wts"]): r["value"]
        for r in df.groupBy(
            "host",
            (F.col("ts_ms") - F.col("ts_ms") % F.lit(3_600_000)).alias("wts"),
        )
        .agg(F.avg("value").alias("value"))
        .collect()
    }
    assert got == want and len(got) == 1


def test_dsir_degenerate_pools(spark):
    """DSIR corners: an all-target corpus has an empty raw pool
    (empty frame, not an error); an all-raw corpus scores against an
    empty target model (every bucket count 0 — smoothing keeps the
    lns total); identical docs get identical importance weights."""
    from dqe_spark.operators.text import dsir_select

    all_t = spark.createDataFrame(
        [(i, "alpha beta", True) for i in range(4)],
        "doc_id long, text string, is_t boolean",
    )
    assert dsir_select(all_t, F.col("is_t"), k=5).count() == 0

    all_r = spark.createDataFrame(
        [(i, "alpha beta", False) for i in range(4)],
        "doc_id long, text string, is_t boolean",
    )
    rows = dsir_select(all_r, F.col("is_t"), k=5).collect()
    assert len(rows) == 4
    assert len({r.logw_e9 for r in rows}) == 1  # identical docs


def test_zorder_constant_dimension(spark):
    """A constant column has range 0 — greatest(...,1) pins the
    quantizer; every row lands in one z bucket per constant dim and
    the curve degrades to a 1-d sort on the varying dim."""
    from dqe_spark.operators import layout as L

    df = spark.createDataFrame(
        [(7, i) for i in range(256)], "x long, y long"
    )
    rows = L.zorder_locality(df, "x", "y", bits=8, bucket_bits=4).collect()
    assert sum(r.n_rows for r in rows) == 256
    assert all(r.x_span_bp == 0 for r in rows)  # constant dim is a point
    # the varying dim owns only the odd bit positions, so a 4-bit
    # bucket prefix sees 2 of its bits → exactly 4 buckets at ~1/4
    # of the y range each
    assert len(rows) == 4
    assert max(r.y_span_bp for r in rows) < 3000


def test_jpeg_arith_degenerate_sizes(spark):
    """1×1 and single-row/column images round-trip through both
    arithmetic flavors (MCU padding, empty AC bands, EOB-only
    blocks)."""
    import numpy as np

    from dqe_spark.operators import jpeg_codec as J
    from dqe_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
        encode_jpeg_arith_progressive,
    )

    for shape in ((1, 1), (1, 37), (37, 1), (8, 8)):
        px = np.full(shape, 200, np.uint8)
        for enc in (encode_jpeg_arith, encode_jpeg_arith_progressive):
            d = J.decode_jpeg(enc(px))
            assert d["mean_luma"] == 200.0, (enc.__name__, shape)


def test_bloom_degenerate_builds(spark):
    """Empty build side → m floors at 64 bits, nothing passes; single
    key → only that key (plus possible FPs that the exact semijoin
    then removes — the composed result is exactly one key)."""
    from pyspark.sql import functions as F

    from dqe_spark.operators import bloomfilter as B

    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    empty = probe.where(F.lit(False))
    words, m = B.sized_bloom_build(empty, "k")
    assert m == 64 and words.count() == 0
    assert B.bloom_prefilter(probe, "k", words, m).count() == 0
    assert B.bloom_semijoin(probe, "k", empty, "k").count() == 0
    one = spark.createDataFrame([(7,)], "k LONG")
    got = [r["k"] for r in B.bloom_semijoin(probe, "k", one, "k").collect()]
    assert got == [7]


def test_retention_degenerate_overlaps(spark):
    """Full overlap (same users every day) → returning ≈ day1_users
    (retention ≈ 10000 bp); zero overlap (disjoint user ranges per
    day) → returning near 0. Built through the real sketch functions,
    not the store, so the test is corpus-shaped, not fixture-shaped."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.sketches import hll_estimate, hll_merge, hll_registers

    DAY = 86_400_000
    rows_full = [("e", d * DAY, f"u{i}") for d in range(3) for i in range(300)]
    rows_disj = [
        ("e", d * DAY, f"u{d}_{i}") for d in range(3) for i in range(300)
    ]
    for rows, full_overlap in ((rows_full, True), (rows_disj, False)):
        df = spark.createDataFrame(rows, "event_type STRING, wts LONG, user_id STRING")
        dreg = hll_merge(hll_registers(df, ["event_type", "wts"], "user_id"),
                         ["event_type", "wts"])
        dest = hll_estimate(dreg, ["event_type", "wts"], "n")
        preg = hll_merge(
            dreg.select(
                "event_type",
                F.explode(F.array(F.col("wts"), F.col("wts") - F.lit(DAY))).alias("p"),
                "bucket", "r",
            ),
            ["event_type", "p"],
        )
        pest = {r["p"]: r["n"] for r in
                hll_estimate(preg, ["event_type", "p"], "n").collect()}
        day = {r["wts"]: r["n"] for r in dest.collect()}
        for d in (0, DAY):
            inter = day[d] + day[d + DAY] - pest[d]
            if full_overlap:
                assert abs(inter - day[d]) <= 0.1 * day[d]
            else:
                assert inter <= 0.1 * day[d]


def test_cms_degenerate_single_and_empty(spark):
    """A single hot key's estimate is exact (min over D counters it
    alone occupies... unless a collision adds, never subtracts); an
    all-NULL value column sketches to an empty relation."""
    from pyspark.sql import functions as F

    from dqe_spark.operators import sketches as SK

    hot = spark.createDataFrame(
        [("k", "u1")] * 500, "k STRING, v STRING"
    )
    regs = SK.cms_registers(hot, ["k"], "v")
    est = SK.cms_probe(regs, ["k"], hot.select("v").distinct(), "v").first()
    assert est["est_count"] == 500
    nulls = spark.createDataFrame(
        [("k", None)] * 10, "k STRING, v STRING"
    )
    assert SK.cms_registers(nulls, ["k"], "v").count() == 0


def test_dsir_model_degenerate_corpora(spark):
    """The persisted-model selection path survives the same floors the
    inline path does: an all-target corpus has an EMPTY raw pool (0
    selected rows, no crash), an all-raw corpus fits a model with
    nt = 0 (every λ is the same constant — selection degenerates to
    pure Gumbel order, still deterministic), and an empty-model
    DataFrame scores every pool doc logw = 0."""
    from pyspark.sql import functions as F

    from dqe_spark.operators import text as T

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx", f"alpha beta gamma {i}")
         for i in range(20)],
        "doc_id LONG, lang STRING, text STRING",
    )
    model = T.dsir_model_counts(
        T.dsir_bucket_counts(docs, F.col("lang") == "en")
    )
    # all-target: raw pool is empty
    got = T.dsir_select(
        docs, F.lit(True), k=5, model=model
    ).collect()
    assert got == []
    # all-raw: nt = 0 model still selects deterministically
    m0 = T.dsir_model_counts(
        T.dsir_bucket_counts(docs, F.lit(False))
    )
    a = T.dsir_select(docs, F.lit(False), k=5, model=m0).collect()
    b = T.dsir_select(docs, F.lit(False), k=5, model=m0).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 5
    # empty model: every pool doc flows through with logw = 0
    empty = model.where(F.lit(False))
    c = T.dsir_select(docs, F.col("lang") == "en", k=5, model=empty)
    rows = c.collect()
    assert len(rows) == 5 and all(r["logw_e9"] == 0 for r in rows)


def test_range_agg_join_degenerate_sides(spark):
    """Empty right side keeps every left row at aggregate identity;
    empty left side yields an empty result; radius 1 (minimum bin)
    still plans the equi-join shape."""
    from pyspark.sql import functions as F

    from dqe_spark.operators.temporal import range_agg_join

    left = spark.createDataFrame(
        [("u1", 100), ("u2", 200)], "user_id STRING, ts_ms LONG"
    )
    right_empty = spark.createDataFrame(
        [], "user_id STRING, ts_ms LONG, value DOUBLE"
    )
    got = range_agg_join(
        left, right_empty, key="user_id", radius_ms=1000,
        aggs={"n": F.count("value"), "mx": F.max("value")},
    ).collect()
    assert sorted((r["user_id"], r["n"], r["mx"]) for r in got) == [
        ("u1", 0, None), ("u2", 0, None)
    ]
    got2 = range_agg_join(
        left.where(F.lit(False)), left.withColumn("value", F.lit(1.0)),
        key="user_id", radius_ms=1, aggs={"n": F.count("value")},
    ).collect()
    assert got2 == []
