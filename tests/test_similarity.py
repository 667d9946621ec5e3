"""Learned-IVF (k-means) ANN: determinism, convergence, exactness at
full probes — the claims the rows-only registry check can't make."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _blobs(spark, n_per=40, dims=8, centers=((0.0,) * 8, (10.0,) * 8, (-10.0, 10.0) * 4)):
    rng = random.Random(7)
    rows = []
    for ci, c in enumerate(centers):
        for j in range(n_per):
            rows.append(
                (ci * n_per + j, [c[d] + rng.gauss(0, 0.5) for d in range(dims)])
            )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), centers


def test_kmeans_deterministic_and_recovers_blobs(spark):
    from dqe_spark.operators.similarity import _nearest_centroid, kmeans_centroids

    df, centers = _blobs(spark)
    c1 = kmeans_centroids(df, n_clusters=3, iters=5)
    c2 = kmeans_centroids(df, n_clusters=3, iters=5)
    assert c1 == c2  # pure function of the data

    # every learned centroid sits on one true blob center (±1)
    def nearest_true(c):
        return min(
            range(len(centers)),
            key=lambda i: sum((a - b) ** 2 for a, b in zip(c, centers[i])),
        )

    assert sorted(nearest_true(c) for c in c1) == [0, 1, 2]
    for c in c1:
        t = centers[nearest_true(c)]
        assert math.dist(c, t) < 1.0, (c, t)

    # assignments are pure: each blob maps to exactly one cell
    a = df.withColumn("cid", _nearest_centroid(F.col("embedding"), c1))
    cells = (
        a.withColumn("blob", (F.col("vec_id") / 40).cast("int"))
        .groupBy("blob")
        .agg(F.countDistinct("cid").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in cells)


def test_ivf_full_probes_equals_bruteforce(spark):
    from dqe_spark.operators.similarity import knn_bruteforce, knn_ivf_kmeans
    from dqe_spark.sources.metric_store import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    query = e.where(F.col("vec_id") == 0)
    corpus = e.where(F.col("vec_id") != 0)
    exact = knn_bruteforce(corpus, query, 10).collect()
    full = knn_ivf_kmeans(
        corpus, query, 10, n_clusters=4, probes=4, iters=3
    ).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in exact]


def test_ivf_probe_subset_is_consistent(spark):
    """probes < C returns the exact top-k OF THE PROBED CELLS: every
    returned row must also appear in the probed cells' brute-force
    ranking, in the same order."""
    from dqe_spark.operators.similarity import (
        _nearest_centroid,
        kmeans_centroids,
        knn_bruteforce,
        knn_ivf_kmeans,
    )
    from dqe_spark.sources.metric_store import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    query = e.where(F.col("vec_id") == 0)
    corpus = e.where(F.col("vec_id") != 0)
    got = knn_ivf_kmeans(corpus, query, 5, n_clusters=4, probes=2, iters=3).collect()
    assert len(got) == 5
    # re-derive the probed subset the operator searched
    cents = kmeans_centroids(corpus, 4, 3)
    a = corpus.withColumn("cid", _nearest_centroid(F.col("embedding"), cents))
    probed_ids = {r["cid"] for r in a.join(
        spark.createDataFrame([(r["vec_id"],) for r in got], "vec_id long"),
        "vec_id", "left_semi").collect()}
    assert len(probed_ids) <= 2
    sub = a.join(F.broadcast(a.sparkSession.createDataFrame(
        [(c,) for c in probed_ids], "cid int")), "cid", "left_semi").drop("cid")
    want = knn_bruteforce(sub, query, 5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pq_full_rerank_equals_bruteforce_l2(spark):
    """With rerank covering the whole corpus, PQ degrades to exact L2
    top-k — the ADC stage only orders candidates."""
    import numpy as np
    from pyspark.sql import functions as F

    from dqe_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = emb.count()
    q = emb.where(F.col("vec_id") == 3).select("embedding")
    got = [r.vec_id for r in S.knn_pq_adc(emb, q, 5, rerank=n).collect()]
    data = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    qv = data[3]
    exact = sorted(data, key=lambda i: (round(((data[i] - qv) ** 2).sum(), 6), i))[:5]
    assert got == exact


def test_pq_adc_matches_numpy_reconstruction(spark):
    """ADC scores are exactly the sum of per-subspace distance-table
    entries for each row's codes (verifies encode + lookup plumbing)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dqe_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    books = S.pq_codebooks(emb, m_sub=8, n_codes=16, iters=2)
    B = np.asarray(books)
    enc = {r.vec_id: list(r.codes) for r in S.pq_encode(emb, books).collect()}
    # the ADC table is built from the QUANTIZED query (knn_pq_adc
    # quantizes so every table entry is an exact dyadic rational —
    # the oracle-replay contract); reconstruct on the same grid
    qv = S._quantize(
        np.array(
            emb.where(F.col("vec_id") == 3).first().embedding, dtype=np.float64
        )
    )
    sub = B.shape[2]
    table = np.array(
        [[((qv[s * sub:(s + 1) * sub] - B[s, c]) ** 2).sum() for c in range(16)]
         for s in range(8)]
    )
    expect = {
        i: round(sum(table[s, c] for s, c in enumerate(cs)), 6)
        for i, cs in enc.items()
    }
    got = {
        r.vec_id: r.adc
        for r in S.knn_pq_adc(
            emb,
            emb.where(F.col("vec_id") == 3).select("embedding"),
            emb.count(),
            iters=2,  # must match the pq_codebooks() call above
        ).collect()
    }
    assert got == expect


def test_pq_rerank_recall(spark):
    """rerank=50 recovers ≥0.8 recall@10 vs exact L2 on the smoke set."""
    import numpy as np
    from pyspark.sql import functions as F

    from dqe_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 7).select("embedding")
    got = {r.vec_id for r in S.knn_pq_adc(emb, q, 10, rerank=50).collect()}
    data = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    qv = data[7]
    exact = set(sorted(data, key=lambda i: (((data[i] - qv) ** 2).sum(), i))[:10])
    assert len(got & exact) >= 8


def test_neardup_ivf_subset_of_exact_with_recall(spark):
    """Every IVF-bucketed pair must appear in the exact all-pairs
    answer with the same cosine (no false positives by construction —
    candidates are verified); recall is bounded below: cells only miss
    cross-cell boundary pairs."""
    from dqe_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = {
        (r["id_i"], r["id_j"]): r["cos"]
        for r in S.neardup_cosine_pairs(emb, 0.2, exact=True).collect()
    }
    got = {
        (r["id_i"], r["id_j"]): r["cos"]
        for r in S.neardup_ivf_pairs(emb, 0.2).collect()
    }
    assert got and set(got) <= set(exact)
    assert all(exact[k] == v for k, v in got.items())
    # near-random vectors are the hardest case for a learned quantizer
    # (real corpora cluster far better); the bound that must ALWAYS
    # hold is that learned cells beat random bucketing (recall 1/C)
    # by at least 2x
    assert len(got) >= 2 * len(exact) / 8


def test_neardup_hybrid_dominates_ivf_recall(spark):
    """The IVF ∪ SRP union is a superset of each generator's verified
    pairs, and its fixed-probe recall is >= the IVF-only recall (SRP
    bands recover cross-cell boundary pairs)."""
    import __spark_entry__ as E

    qs = E.queries()
    hyb = qs["neardup_hybrid"](spark, SF_SMOKE).collect()
    ivf = qs["neardup_ivf"](spark, SF_SMOKE).collect()
    hp = {(r["id_i"], r["id_j"]) for r in hyb}
    ip = {(r["id_i"], r["id_j"]) for r in ivf}
    assert ip <= hp
    assert hyb[0]["probe_recall_bp"] >= ivf[0]["probe_recall_bp"]
    # exactness: every emitted pair is a true near-dup at the threshold
    assert all(r["cos"] >= 0.2 for r in hyb)


def test_srp_band_keys_match_packed_signature(spark):
    """The (band, key) generator (srp_band_keys — no 63-plane cap)
    must produce EXACTLY the band values the historical packed-long
    path derives by shifting srp_signature: band b of the packed sig
    == element b of the key array, for the pinned 32/8 shape. This is
    the bit-identity claim that lets _srp_candidates change physical
    form without moving any oracle hash."""
    import dqe_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    planes = S.rademacher_planes(32, 64)
    bands, bits = 8, 4
    mask = (1 << bits) - 1
    both = emb.select(
        "vec_id",
        S.srp_signature(F.col("embedding"), planes).alias("sig"),
        S.srp_band_keys(F.col("embedding"), planes, bands).alias("keys"),
    ).collect()
    assert both
    for r in both:
        for b in range(bands):
            assert ((r["sig"] >> (b * bits)) & mask) == r["keys"][b]


def test_auto_planes_deterministic_and_sized(spark):
    """auto_planes is a pure function of (n, dims): same corpus →
    same matrix; width follows bands·⌈log₂(n/target)⌉ with the
    documented floor; and a too-wide band is rejected by
    srp_band_keys (long-key bound)."""
    import math

    import pytest

    import dqe_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n = emb.count()
    m1 = S.auto_planes(emb, bands=8)
    m2 = S.auto_planes(emb, bands=8)
    assert m1 == m2
    bits = max(2, min(48, math.ceil(math.log2(max(2, n / 128)))))
    assert len(m1) == 8 * bits and len(m1[0]) == 64
    with pytest.raises(ValueError, match="> 63"):
        S.srp_band_keys(
            F.col("embedding"), S.rademacher_planes(128, 64), bands=2
        )


def test_pair_dot_bit_identical_to_sequential_fold(spark):
    """_pair_dot's columnwise Arrow accumulation must reproduce the
    interpreted aggregate/zip_with fold BIT-FOR-BIT: both perform the
    same left-to-right IEEE-754 double chain per pair, so the rounded
    verification cosines (and therefore every oracle hash downstream)
    cannot move. Checked over every banded candidate pair of the
    smoke corpus, unrounded doubles compared exactly."""
    import dqe_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pm = S.auto_planes(emb, bands=8)
    keyed = S._keyed_frame(emb, pm, 8)
    cand = S._srp_pairs_from_keyed(keyed, len(pm), 8)
    vi = keyed.select(
        F.col("vec_id").alias("id_i"), F.col("embedding").alias("va")
    )
    vj = keyed.select(
        F.col("vec_id").alias("id_j"), F.col("embedding").alias("vb")
    )
    j = cand.join(vi, "id_i").join(vj, "id_j")
    arrow = j.select(
        "id_i", "id_j", S._pair_dot(F.col("va"), F.col("vb")).alias("d")
    )
    fold = j.select(
        "id_i", "id_j", S.dot(F.col("va"), F.col("vb")).alias("d")
    )
    got = sorted((r["id_i"], r["id_j"], r["d"]) for r in arrow.collect())
    want = sorted((r["id_i"], r["id_j"], r["d"]) for r in fold.collect())
    assert len(got) > 0
    assert got == want  # exact equality, no rounding


def test_fused_verify_bit_identical_to_join_form(spark, monkeypatch):
    """_verify_fused (broadcast matrix, pair ids only across the Arrow
    boundary) must reproduce the join form BIT-FOR-BIT — same pair
    set, same unrounded cosines — over every banded candidate pair of
    the smoke corpus. Also pins the size gate: with the budget forced
    to 0, _verify_from_keyed falls back to the join form (no broadcast
    built), and with the default budget the smoke corpus takes the
    fused path; both routes return the identical relation."""
    import dqe_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pm = S.auto_planes(emb, bands=8)
    keyed = S._keyed_frame(emb, pm, 8)
    cand = S._srp_pairs_from_keyed(keyed, len(pm), 8)
    # threshold below -1: keep EVERY candidate, so the whole cosine
    # column is compared, not just the survivors
    fused = S._verify_fused(keyed, cand, -2.0)
    join = S._verify_withn(
        keyed.select(F.col("vec_id"), F.col("embedding"), F.col("__nn")),
        cand,
        -2.0,
    )
    got = sorted(map(tuple, fused.collect()))
    want = sorted(map(tuple, join.collect()))
    assert len(got) > 0
    assert got == want  # exact equality: ids and rounded cosines

    # the dispatcher: budget 0 → join form; default budget → fused
    monkeypatch.setenv("DQE_VERIFY_BCAST_MB", "0")
    via_join = S._verify_from_keyed(keyed, cand, 0.2)
    assert "MapInPandas" not in via_join._jdf.queryExecution().toString()
    monkeypatch.delenv("DQE_VERIFY_BCAST_MB")
    via_fused = S._verify_from_keyed(keyed, cand, 0.2)
    assert "MapInPandas" in via_fused._jdf.queryExecution().toString()
    assert sorted(map(tuple, via_join.collect())) == sorted(
        map(tuple, via_fused.collect())
    )


def test_allpairs_fused_bit_identical_to_crossjoin(spark, monkeypatch):
    """_allpairs_fused (broadcast matrix + columnwise block scoring,
    slack pre-filter, authoritative JVM round+threshold) must
    reproduce the crossJoin + interpreted-fold form row-for-row:
    same pairs, same rounded cosines — at a positive threshold AND at
    a negative one that keeps every pair (so the whole cosine column
    is compared, including values the slack logic must not clip).
    With the broadcast budget forced to 0, neardup_cosine_pairs takes
    the crossJoin route; default budget takes the fused route."""
    import dqe_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")

    def crossjoin_form(thr):
        a = emb.select(F.col("vec_id").alias("id_i"), F.col("embedding").alias("va"))
        b = emb.select(F.col("vec_id").alias("id_j"), F.col("embedding").alias("vb"))
        pairs = a.crossJoin(b).where(F.col("id_i") < F.col("id_j"))
        c = S.cosine(F.col("va"), F.col("vb"))
        return pairs.select(
            "id_i", "id_j", F.round(c, 6).alias("cos")
        ).where(F.col("cos") >= thr)

    for thr in (0.2, -2.0):
        got = sorted(map(tuple, S._allpairs_fused(emb, thr).collect()))
        want = sorted(map(tuple, crossjoin_form(thr).collect()))
        assert len(got) > 0
        assert got == want

    monkeypatch.setenv("DQE_VERIFY_BCAST_MB", "0")
    via_cross = S.neardup_cosine_pairs(emb, 0.2, exact=True)
    assert "MapInPandas" not in via_cross._jdf.queryExecution().toString()
    monkeypatch.delenv("DQE_VERIFY_BCAST_MB")
    via_fused = S.neardup_cosine_pairs(emb, 0.2, exact=True)
    assert "MapInPandas" in via_fused._jdf.queryExecution().toString()


def test_pq_codebooks_single_sample_equal_per_subspace_scans(spark):
    """pq_codebooks (round-10: ONE sample collect, subspaces sliced
    driver-side) must reproduce the per-subspace sliced-scan training
    bit-for-bit: rank_hash orders by id only, so each subspace always
    trained on the same rows, and slicing commutes with the
    elementwise 2⁻²⁰ quantization."""
    import dqe_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = S.pq_codebooks(emb, m_sub=8, n_codes=4, iters=3)
    sub = 64 // 8
    want = [
        S.kmeans_centroids(
            emb.select(
                F.col("vec_id"),
                F.slice(F.col("embedding"), s * sub + 1, sub).alias("embedding"),
            ),
            4,
            3,
        )
        for s in range(8)
    ]
    assert got == want


def test_srp_earliest_band_pairs_equal_distinct_set(spark):
    """The earliest-matching-band join predicate must emit exactly
    the DISTINCT banded pair set (each pair once, no distinct paid):
    compare against the naive any-band join + distinct on the smoke
    corpus, packed-signature form."""
    import dqe_spark.operators.similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pm = S.auto_planes(emb, bands=8)
    keyed = S._keyed_frame(emb, pm, 8)
    got_rows = S._srp_pairs_from_keyed(keyed, len(pm), 8).collect()
    got = sorted((r["id_i"], r["id_j"]) for r in got_rows)
    assert len(got) == len(set(got)), "pair emitted for two bands"
    bits = len(pm) // 8
    mask = (1 << bits) - 1
    naive = (
        keyed.select(
            "vec_id",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("__sig"), b * bits).bitwiseAND(
                            F.lit(mask)
                        )
                        for b in range(8)
                    ]
                )
            ).alias("band", "key"),
        )
    )
    a = naive.select(F.col("vec_id").alias("id_i"), "band", "key")
    b = naive.select(F.col("vec_id").alias("id_j"), "band", "key")
    want_rows = (
        a.join(b, ["band", "key"])
        .where(F.col("id_i") < F.col("id_j"))
        .select("id_i", "id_j")
        .distinct()
        .collect()
    )
    want = sorted((r["id_i"], r["id_j"]) for r in want_rows)
    assert got == want


def test_verify_dispatch_both_paths_oracle_green_at_gate_scale(
    spark, monkeypatch
):
    """The broadcast-budget dispatch boundary (DQE_VERIFY_BCAST_MB)
    pinned END-TO-END: a declared verify-using query runs ORACLE-GREEN
    on BOTH physical forms at the driver's gate scale (sf0.01) — the
    past-budget join fallback is the 100 TB path and must not rot
    while every smoke-scale dispatch picks the fused route. The plan
    assertion proves each leg actually took its intended form."""
    import duckdb

    import __spark_entry__ as E
    from tests.conftest import SF_CORRECT
    from tests.oracle_util import compare

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{SF_CORRECT}/{name}.parquet'"
        )
    qs, osql = E.queries(), E.oracle_sql()
    qname = "dedup_semantic_keep"
    monkeypatch.setenv("DQE_VERIFY_BCAST_MB", "0")  # force join fallback
    df = qs[qname](spark, SF_CORRECT)
    assert "MapInPandas" not in df._jdf.queryExecution().toString()
    compare(df, con, osql[qname])
    monkeypatch.delenv("DQE_VERIFY_BCAST_MB")  # default: fused broadcast
    df = qs[qname](spark, SF_CORRECT)
    assert "MapInPandas" in df._jdf.queryExecution().toString()
    compare(df, con, osql[qname])
    con.close()
