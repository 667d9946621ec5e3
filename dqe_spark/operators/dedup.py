"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All deterministic and expressible as built-in Column expressions, so
(a) the DuckDB oracle can replay them exactly (hashes are md5-derived,
not engine-private), and (b) everything stays JVM-side/codegen'd.

Scale design (100 TB):
  * exact dedup — one hash-groupBy; the key (md5) is uniform, no skew.
  * ngram-jaccard — the shingle self-join explodes ~L shingles/doc and
    joins on shingle; frequent shingles create join skew, so the
    pair-generation step drops shingles above a document-frequency cap
    (stopword-shingle suppression), the standard ALL-pairs trick.
  * minhash-LSH — fixed-width signature (K hashes) per doc, then a
    band-bucket equi-join: candidate generation is linear in docs per
    bucket, never all-pairs. This is the scale path; exact jaccard
    verification runs only on candidates.
  * simhash — one 32-bit signature per doc (map-only), hamming
    verification on band-bucket candidates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dqe_spark.operators.partitioning import spread
from dqe_spark.operators.text import tokens

SHINGLE_N = 3
MINHASH_K = 16
MINHASH_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 32
DF_CAP_DEFAULT = 1000  # shingle document-frequency cap (skew guard)


def dedup_exact(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: per group the kept id
    (min), the duplicate count, and the hash."""
    return (
        df.select(F.md5(F.col(col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def shingle_sets(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word-level n-gram shingles per document as one array
    row → (id, shs array<string>). Fully narrow: transform(sequence())
    builds the n-grams JVM-side, array_distinct dedups in place — no
    explode, no shuffle."""
    t = tokens(F.col(col))
    # total-function guard: collapsed projections can evaluate the
    # gram transform BEFORE the row filter (Catalyst reorders
    # freely), and for short docs sequence(0, size-3) runs DOWNWARD
    # ([0, -1, …] — two-arg sequence infers a negative step), so
    # bracket indexing crashes on rows the filter is about to drop.
    # get() returns NULL out of bounds instead; in-bounds accesses —
    # every row the where() keeps — are value-identical to tk[i]
    grams = F.expr(
        f"transform(sequence(0, size(tk) - {SHINGLE_N}), "
        f"i -> concat_ws(' ', get(tk, i), get(tk, i+1), get(tk, i+2)))"
    )
    return (
        df.select(F.col(id_col), t.alias("tk"))
        .where(F.size("tk") >= SHINGLE_N)
        .select(id_col, F.array_distinct(grams).alias("shs"))
    )


def shingles(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exploded incidence form → (id, shingle), for inverted-index
    joins (ngram_jaccard_pairs)."""
    return shingle_sets(df, col, id_col).select(
        id_col, F.explode("shs").alias("sh")
    )


def shingle_sizes(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = None,
) -> DataFrame:
    """All near-duplicate pairs (i < j) with shingle-set Jaccard ≥
    threshold. Output: (id_i, id_j, jaccard 4dp).

    Round-10 rewrite candidates, both MEASURED and rejected at sf1
    (interleaved digest A/B, row-identical outputs): (a) a
    content-group restatement — pair md5(text) groups and expand
    members, the sig_space_hamming_pairs move — ran 190 vs 131 s
    BECAUSE this corpus has near-zero exact-text duplication at every
    scale (50 000 docs → 49 920 distinct texts), so the grouping
    machinery is pure overhead unless the corpus is exact-copy-heavy;
    (b) checkpointing the shingle incidence for its three consumers
    measured neutral (the inverted-index join dominates; the
    derivation is map-only noise) and at 100 TB would trade a
    recomputable narrow map for a corpus-sized materialization. The
    operator keeps the plain inverted-index shape; its scale path
    remains minhash_lsh_pairs."""
    sh = shingles(spread(df), col, id_col)
    if df_cap is not None:
        # skew guard: drop shingles shared by more than df_cap docs —
        # they contribute O(df²) candidate pairs and almost no signal.
        # No broadcast hint: the shingle-frequency table grows with the
        # corpus vocabulary and does NOT broadcast at 100 TB; the
        # semi-join shares the upstream `sh` partitioning on `sh`, and
        # AQE still picks a broadcast when the filtered side is small.
        freq = sh.groupBy("sh").agg(F.count("*").alias("df"))
        sh = sh.join(freq.where(F.col("df") <= df_cap), "sh", "left_semi")
    sizes = shingle_sizes(sh, id_col)
    a = sh.select(F.col(id_col).alias("id_i"), "sh")
    b = sh.select(F.col(id_col).alias("id_j"), "sh")
    inter = (
        a.join(b, on="sh")
        .where(F.col("id_i") < F.col("id_j"))
        .groupBy("id_i", "id_j")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_i"), F.col("n_sh").alias("n_i"))
    nb = sizes.select(F.col(id_col).alias("id_j"), F.col("n_sh").alias("n_j"))
    jac = F.col("inter") / (F.col("n_i") + F.col("n_j") - F.col("inter"))
    # per-doc size table is O(corpus): no broadcast hint — AQE
    # broadcasts it at test scale and shuffles it at corpus scale
    return (
        inter.join(na, "id_i")
        .join(nb, "id_j")
        .where(jac >= threshold)
        .select("id_i", "id_j", F.round(jac, 4).alias("jaccard"))
    )


def _hash32(col: Column, salt: int) -> Column:
    """Deterministic 32-bit hash: first 8 hex chars of md5(salt:val).
    md5-based (not xxhash) so the DuckDB oracle reproduces it exactly."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 8), 16, 10
    ).cast("long")


def _minhash_digest_cols(shs: str, k: int) -> list[Column]:
    """Per-group digest arrays: _dg = transform(shs, s -> md5('g:'||s)).
    One md5 per (shingle, group) — the minimum possible digest count
    for the banked scheme (4 lanes per digest)."""
    groups = (k + 3) // 4
    return [
        F.expr(f"transform({shs}, s -> md5(concat('{g}:', s)))").alias(f"_d{g}")
        for g in range(groups)
    ]


def _minhash_lane_cols(k: int) -> list[Column]:
    """mh_j from the _dg digest arrays. The min is taken over the HEX
    lane substrings: fixed-width lowercase hex compares lexicographically
    in numeric order, so min(hex) == hex(min) and the conv(16,10) runs
    once per DOCUMENT instead of once per shingle."""
    out = []
    for j in range(k):
        g, lane = divmod(j, 4)
        out.append(
            F.conv(
                F.array_min(
                    F.expr(f"transform(_d{g}, x -> substring(x, {1 + 8 * lane}, 8))")
                ),
                16,
                10,
            )
            .cast("long")
            .alias(f"mh{j}")
        )
    return out


def minhash_signatures(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", k: int = MINHASH_K
) -> DataFrame:
    """K-permutation MinHash signature per document: sig_j = min over
    shingles of hash_j(shingle).

    Plan shape: MAP-ONLY. The per-doc shingle array never explodes —
    digests come from transform() over the array and the per-doc min
    from array_min(), so signature computation is a narrow Project
    with zero shuffles (the earlier explode + groupBy(doc) formulation
    measured ~5× slower at sf0.1 and shuffled the whole incidence).
    Values are bit-identical: min over repeated shingles equals min
    over distinct ones, and the hex-lane min equals the numeric min
    (fixed-width hex is order-preserving)."""
    sets = shingle_sets(spread(df), col, id_col)
    return sets.select(id_col, *_minhash_digest_cols("shs", k)).select(
        id_col, *_minhash_lane_cols(k)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs: band signatures into buckets,
    candidate = docs sharing any band bucket, then verify candidates
    with exact shingle Jaccard ≥ threshold.

    Output: (id_i, id_j, jaccard). Candidate generation is the LSH
    equi-join (linear per bucket) — the exact verification only ever
    sees candidate pairs, which is what makes this the 100 TB path.

    The per-doc shingle-set table is persisted (MEMORY_AND_DISK) and
    reused by all three consumers (signatures, verify-left,
    verify-right), so documents are tokenized exactly once; at corpus
    scale this materialization is the standard multi-pass-LSH
    checkpoint and spills to disk. Verification is two joins keyed on
    doc id against the tiny candidate set (AQE broadcasts it) +
    array_intersect per pair — no second shuffle of the shingle
    incidence."""
    from pyspark import StorageLevel

    sets = shingle_sets(spread(df), col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    sig = sets.select(id_col, *_minhash_digest_cols("shs", k)).select(
        id_col, *_minhash_lane_cols(k)
    )
    rows = k // bands
    band_cols = [
        F.md5(F.concat_ws(",", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    # the banded frame (id + bands md5 keys — ~1/1000 of corpus bytes)
    # is MATERIALIZED before the self-join: both join sides otherwise
    # re-run the K-digest minhash pass (the expensive map work, one
    # transform-md5 per shingle per digest group) from the persisted
    # shingle sets — measured ~0.5 s of the 2 s query at sf0.1. The
    # SRP twin of this move is _keyed_frame in similarity.py.
    #
    # The candidate .distinct() STAYS: the earliest-shared-band join
    # predicate that replaced distinct in the SRP generator was A/B'd
    # here and measured SLOWER (string md5 band keys must ride both
    # sides of the join as arrays, where SRP compares shift/masks of
    # one int64), so the pair-keyed exchange is the cheaper dedupe for
    # this operator.
    banded = sig.select(id_col, *band_cols).localCheckpoint(eager=True)
    # long-form (id, band_idx, key) so one self-join covers all bands
    stack = ", ".join(f"'{b}', band{b}" for b in range(MINHASH_BANDS))
    lf = banded.select(
        id_col, F.expr(f"stack({bands}, {stack}) AS (band, key)")
    )
    a = lf.select(F.col(id_col).alias("id_i"), "band", "key")
    b = lf.select(F.col(id_col).alias("id_j"), "band", "key")
    cand = (
        a.join(b, on=["band", "key"])
        .where(F.col("id_i") < F.col("id_j"))
        .select("id_i", "id_j")
        .distinct()
    )
    # exact verification on candidates only
    si = sets.select(F.col(id_col).alias("id_i"), F.col("shs").alias("shs_i"))
    sj = sets.select(F.col(id_col).alias("id_j"), F.col("shs").alias("shs_j"))
    inter = F.size(F.array_intersect("shs_i", "shs_j"))
    jac = F.col("inter") / (F.size("shs_i") + F.size("shs_j") - F.col("inter"))
    return (
        cand.join(si, "id_i")
        .join(sj, "id_j")
        .withColumn("inter", inter)
        .where(jac >= threshold)
        .select("id_i", "id_j", F.round(jac, 4).alias("jaccard"))
    )


def simhash_signatures(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash: per document, each bit of the signature is the sign of
    the sum of ±1 votes from each distinct token's hash bit. One
    explode + one groupBy; md5-derived hashes for oracle parity."""
    tok = (
        spread(df).select(
            F.col(id_col), F.explode(F.array_distinct(tokens(F.col(col)))).alias("t")
        )
    )
    h = _hash32(F.col("t"), 0)
    tok = tok.select(id_col, h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0)),
        range(bits),
        F.lit(0).cast("long"),
    )
    return agg.select(id_col, sig.alias("simhash"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every document
    gets a cluster_id = the smallest doc id reachable through the
    near-dup graph (singletons cluster with themselves). The keep-one-
    per-cluster step of a dedup pipeline.

    Distributed min-label propagation WITH pointer doubling: each
    round every node (1) adopts the minimum label in its edge
    neighborhood, then (2) shortcuts to its label's own label
    (lbl := lbl(lbl), the large-star/small-star-style path halving).
    Step 2 halves label-chain depth every round, so convergence is
    O(log diameter) instead of O(diameter) — a 1000-node chain of
    pairwise near-dups settles in ~10 rounds, not ~1000. Each round
    is two keyed joins (edge set + label table), never all-pairs; the
    driver-side loop carries only a convergence scalar.

    Monotonicity argument: labels only decrease, and every label value
    is always the id of a node in the same component (start: self;
    step 1 takes ids from neighbors; step 2 from a component-mate's
    label), so the fixpoint is exactly the component minimum.

    Pass stats={} to receive {"rounds": n} for observability/tests.
    """
    ids = df.select(F.col(id_col).alias("id")).distinct()
    edges = (
        pairs.select(F.col("id_i").alias("a"), F.col("id_j").alias("b"))
        .unionByName(pairs.select(F.col("id_j").alias("a"), F.col("id_i").alias("b")))
        .distinct()
        # materialize once — every propagation round joins the edge
        # set; without this the (possibly expensive) pair-generation
        # pipeline upstream would re-execute per round
        .localCheckpoint(eager=True)
    )
    labels = ids.withColumn("lbl", F.col("id"))
    prev_sum = None
    rounds = 0
    while True:
        lmap = labels.select(F.col("id").alias("mid"), F.col("lbl").alias("mlbl"))
        neigh = (
            edges.join(lmap, edges["b"] == lmap["mid"])
            .groupBy("a")
            .agg(F.min("mlbl").alias("nl"))
        )
        step = (
            labels.join(neigh, labels["id"] == neigh["a"], "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nl", "lbl")).alias("lbl"),
            )
        )
        # pointer doubling: follow the label's own (possibly smaller)
        # label — every id is present in the table, so the left join
        # only misses when lbl == id (already a root)
        smap = step.select(F.col("id").alias("mid"), F.col("lbl").alias("mlbl"))
        new = (
            step.join(smap, step["lbl"] == smap["mid"], "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("mlbl", "lbl")).alias("lbl"),
            )
        )
        new = new.localCheckpoint(eager=True)  # cut the growing lineage
        rounds += 1
        # labels are monotone non-increasing, so Σlbl strictly drops
        # until the fixpoint — convergence needs one tiny agg, no join
        cur_sum = new.agg(F.sum("lbl")).collect()[0][0]
        labels = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(
        F.col("id").alias(id_col), F.col("lbl").alias("cluster_id")
    )


def simhash_cluster_assignments(
    df: DataFrame,
    max_hamming: int = 3,
    col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    stats: dict | None = None,
) -> DataFrame:
    """Cluster assignment over SimHash near-dups, computed in
    SIGNATURE space — the engine twin of the oracle's round-8
    restatement (queries_ext._sig_cluster_prop_sql), landed round 10
    after the sf1 sweep showed the doc-level path at 612 s ENGINE
    time: on a cross-copy corpus many docs share a signature, so the
    doc-level edge set is output-sized (~10⁸ rows at sf1) and every
    label-propagation round re-shuffles it.

    But docs sharing a signature are near-dups by definition
    (hamming 0 ≤ max_hamming), so the component structure lives
    entirely in the graph of DISTINCT signatures: nodes = distinct
    simhash values (thousands at any sf), edges = banded signature
    pairs at ≤ max_hamming (hamming_neardup_pairs — the same exact
    pigeonhole, over a relation that cannot exceed 2^SIMHASH_BITS
    rows at ANY corpus size). Label propagation runs on that tiny
    graph (dedup_clusters, O(log diameter) rounds of small joins);
    cluster_id = the min member doc over the signature component,
    mapped back to docs through two |signatures|-sized joins that AQE
    broadcasts. Output (doc_id, cluster_id) — row-identical to
    dedup_clusters(df, simhash_neardup_pairs(df, max_hamming)), which
    remains the generic any-pair-relation path (pinned in
    tests/test_temporal.py)."""
    sig = simhash_signatures(df, col, id_col)
    # one corpus pass; the node relation is reused by the pair
    # generation, the component fold, and the final expansion
    nodes = (
        sig.groupBy("simhash")
        .agg(F.min(id_col).alias("__mindoc"))
        .localCheckpoint(eager=True)
    )
    spairs = hamming_neardup_pairs(
        nodes.select("simhash"),
        max_hamming=max_hamming,
        bits=SIMHASH_BITS,
        bands=bands,
        id_col="simhash",
        sig_col="simhash",
    ).select("id_i", "id_j")
    scomp = dedup_clusters(
        nodes, spairs, id_col="simhash", stats=stats
    ).withColumnRenamed("cluster_id", "__comp")
    cmin = (
        scomp.join(nodes, "simhash")
        .groupBy("__comp")
        .agg(F.min("__mindoc").alias("cluster_id"))
    )
    return (
        sig.join(scomp, "simhash")
        .join(cmin, "__comp")
        .select(id_col, "cluster_id")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """SimHash near-duplicate pairs with hamming distance ≤
    max_hamming, via EXACT banded candidate generation: with
    bands > max_hamming, the pigeonhole principle guarantees any pair
    within distance max_hamming agrees on at least one band — banding
    loses nothing. Output (id_i, id_j, hamming).

    The banding runs in SIGNATURE space, not doc space (the same
    rewrite dedup_clusters and the oracle received): docs sharing a
    signature are hamming-0 near-dups wholesale, so on a cross-copy
    corpus the doc-level banded self-join shuffles an output-sized
    candidate multiset (Σ|bucket|² ≥ 4× the ~10⁸ final pairs at sf1)
    and then pays a doc-level DISTINCT over it — the two largest
    exchanges of the old plan. Banding the DISTINCT signatures instead
    (≤ 2^SIMHASH_BITS rows at ANY corpus size) makes the candidate
    join and its distinct trivially small; doc pairs fall out by
    expanding each signature pair through two |docs|-sided joins that
    AQE broadcasts, plus a same-signature self-join for the hamming-0
    block. Each unordered doc pair appears for exactly ONE signature
    pair (a doc has one signature), so the expansion needs NO
    doc-level distinct — the rows are identical to the old path
    (pinned in tests/test_temporal.py). The signature frame is
    checkpointed: 12 bytes/doc, one corpus tokenize pass total where
    the self-join re-derived it per side."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "for the banded candidates to be exact"
        )
    return sig_space_hamming_pairs(
        simhash_signatures(df, col, id_col),
        max_hamming=max_hamming,
        bits=SIMHASH_BITS,
        bands=bands,
        id_col=id_col,
        sig_col="simhash",
    )


def sig_space_hamming_pairs(
    sig: DataFrame,
    max_hamming: int,
    bits: int = 64,
    bands: int = 8,
    id_col: str = "doc_id",
    sig_col: str = "dhash",
) -> DataFrame:
    """Doc-level hamming pairs of a (id, signature) relation via the
    DISTINCT-SIGNATURE graph — the shared expansion behind
    simhash_neardup_pairs and the dHash image-dedup path.

    Banding directly in doc space pays three avoidable costs on a
    corpus with duplicate signatures: the signature DERIVATION runs
    once per self-join side (for dHash that is the whole PNG
    decode/resize/hash pipeline, twice), the banded join shuffles an
    output-sized candidate MULTISET (every shared band re-proposes the
    pair), and a doc-level DISTINCT collapses it. Pairing the distinct
    signatures instead (≤ 2^bits rows at ANY corpus size) and
    expanding members through joins pays each cost once at signature
    granularity: each doc holds ONE signature, so every unordered doc
    pair arises from exactly one signature pair (cross block, via
    least/greatest) or one same-signature pair (hamming 0 block) — no
    doc-level distinct exists in the plan. Row-identical to banding in
    doc space (pinned in tests/test_temporal.py).

    The two small frames are explicitly re-widened: AQE coalesces the
    checkpointed signature relation and the signature-pair distinct to
    ~1 partition at smoke scale, and broadcast-join output inherits
    the STREAM side's partitioning — without this the output-sized
    expansion (and anything computed over it) runs single-threaded
    (measured at sf1: digest wall 291 → 74 s only WITH the widening).
    The exchanges cost |docs| skinny rows and |sig pairs| rows —
    noise next to the derivation pass at any scale."""
    par = sig.sparkSession.sparkContext.defaultParallelism
    sig = (
        sig.select(F.col(id_col), F.col(sig_col))
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    spairs = (
        hamming_neardup_pairs(
            sig.select(sig_col).distinct(),
            max_hamming=max_hamming,
            bits=bits,
            bands=bands,
            id_col=sig_col,
            sig_col=sig_col,
        )
        .select(
            F.col("id_i").alias("__si"), F.col("id_j").alias("__sj"), "hamming"
        )
        .repartition(par)
    )
    mi = sig.select(F.col(sig_col).alias("__si"), F.col(id_col).alias("__di"))
    mj = sig.select(F.col(sig_col).alias("__sj"), F.col(id_col).alias("__dj"))
    cross = (
        spairs.join(mi, "__si")
        .join(mj, "__sj")
        .select(
            F.least("__di", "__dj").alias("id_i"),
            F.greatest("__di", "__dj").alias("id_j"),
            "hamming",
        )
    )
    same = (
        sig.select(sig_col, F.col(id_col).alias("__di"))
        .join(sig.select(sig_col, F.col(id_col).alias("__dj")), sig_col)
        .where(F.col("__di") < F.col("__dj"))
        .select(
            F.col("__di").alias("id_i"),
            F.col("__dj").alias("id_j"),
            F.lit(0).cast("long").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def hamming_neardup_pairs(
    sig: DataFrame,
    max_hamming: int = 6,
    bits: int = 64,
    bands: int = 8,
    id_col: str = "doc_id",
    sig_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate pairs under hamming distance over an arbitrary
    integer signature column (dHash, simhash64, …) — the pigeonhole
    banding of simhash_neardup_pairs generalized: with
    bands > max_hamming any qualifying pair agrees on at least one
    band, so candidates come from an equi-join (linear per bucket) and
    the banding is EXACT, never all-pairs. Output (id_i, id_j,
    hamming)."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "for the banded candidates to be exact"
        )
    if bits % bands:
        raise ValueError(f"bits ({bits}) must divide into bands ({bands})")
    bits_per = bits // bands
    mask = (1 << bits_per) - 1
    # posexplode carries the band index alongside the band value, so
    # the join key (band, k) never conflates equal values from
    # different bit ranges
    lf = sig.select(
        id_col,
        F.col(sig_col).alias("__s"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(sig_col), b * bits_per)
                    .bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "k"),
    )
    a = lf.select(F.col(id_col).alias("id_i"), F.col("__s").alias("sa"), "band", "k")
    b = lf.select(F.col(id_col).alias("id_j"), F.col("__s").alias("sb"), "band", "k")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long")
    return (
        a.join(b, ["band", "k"])
        .where(F.col("id_i") < F.col("id_j"))
        .select("id_i", "id_j", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def positional_grams(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of the exact-substring family: index-rule
    tokens and k-grams AT EVERY POSITION. Returns (base, grams):
    base = (id, __toks, n_tokens), grams = (id, p, gram) with p the
    0-based token position of the gram's first token. Map-only; the
    fan-out is one row per token position.

    ``hashed=True`` (default) emits md5 gram keys — the PERSISTED
    gram-store layout contract (sources/gram_store.py buckets on
    crc32(gram) of these values; stores on disk never change meaning
    under a code upgrade), and the md5 is also what keeps arbitrary
    document content out of the store files. ``hashed=False`` emits
    the raw k-token string instead, for the purely in-query substring
    family: gram EQUALITY is all the downstream owner/cut logic needs,
    raw keys make it exact rather than exact-modulo-collisions, a
    typical 5-token gram is no wider than the 32-char md5 it replaces,
    and skipping the hash removes ~40% of the gram pass's map-side
    cost (the whole pipeline is gram-pass-bound). Shuffle uniformity
    is unaffected: partitioning applies Murmur3 to the key either way.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    base = df.select(F.col(id_col), toks.alias("__toks")).select(
        id_col, "__toks", F.size("__toks").alias("n_tokens")
    )

    def gram_at(i):  # i is the 0-based start position
        s = F.concat_ws(
            " ",
            *[
                F.element_at(F.col("__toks"), (i + j + 1).cast("int"))
                for j in range(k)
            ],
        )
        return F.md5(s) if hashed else s

    # element_at per token beats slice-then-join inside the transform
    # lambda (~25% on the interpreted higher-order path), and the
    # 0-based sequence makes posexplode's index the gram position
    # directly
    grams = base.where(F.col("n_tokens") >= k).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tokens") - k), gram_at
            )
        ).alias("p", "gram"),
    )
    return base, grams


def merge_position_islands(
    cuts: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Merge covered gram positions [p, p+k-1] into maximal spans per
    doc (gaps-and-islands: a new span starts exactly when p > lag + k).
    Input (id, p) distinct rows; output (id, span_start, span_tokens).
    One window pass; the (id, island) groupBy reuses the window's
    hash(id) distribution."""
    w = Window.partitionBy(id_col).orderBy("p")
    return (
        cuts.withColumn("__lag", F.lag("p").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__lag").isNull() | (F.col("p") > F.col("__lag") + k), 1
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "__island")
        .agg(
            F.min("p").cast("long").alias("span_start"),
            (F.max("p") - F.min("p") + k).cast("long").alias("span_tokens"),
        )
        .select(id_col, "span_start", "span_tokens")
    )


def duplicate_substring_spans(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CUT LIST of exact-substring dedup: for every document, the
    merged token spans covered by k-grams that also occur in another
    document AND whose canonical copy lives elsewhere — the actionable
    artifact of Lee et al. 2021 (keep ONE copy, cut the rest), where
    substring_dedup_stats is only the per-doc report.

    Ownership rule: each duplicated gram's canonical copy is the
    smallest doc_id containing it; a doc's occurrence of a gram it
    does not own is a cut candidate. Deterministic, relational, and
    exactly replayable by the DuckDB oracle.

    Plan shape (matches substring_dedup_stats): ONE narrow positional
    gram pass, ONE gram-keyed Exchange, one per-doc window for island
    merging — never all-pairs. The owner/duplicated decision is a
    whole-partition window over the gram key rather than an aggregate
    + join back: "occurs in ≥2 distinct docs" is exactly
    min(doc) != max(doc) (no count_distinct, whose partial-distinct
    pre-aggregate costs a second (gram, doc)-keyed Exchange), the
    canonical owner is the same window's min, and each gram row
    carries its own (id, p) — so the cut set falls out of the single
    shuffled pass with no join, no second gram scan, and no dedupe
    (grams has exactly one row per (id, p); the SELECT DISTINCT the
    DuckDB oracle spells is a no-op here). This is the same
    "decide in the space you already shuffled" move as the
    signature-space cluster rewrite — at any corpus size the pipeline
    is one gram-wide shuffle plus one (id, p)-skinny shuffle.

    Output: (id, span_start, span_tokens) — 0-based token position and
    length of each maximal cut span."""
    _, grams = positional_grams(df, k, id_col, text_col, hashed=False)
    wg = Window.partitionBy("gram")
    cuts = (
        grams.withColumn("__own", F.min(id_col).over(wg))
        .withColumn("__mx", F.max(id_col).over(wg))
        .where(
            (F.col("__own") != F.col("__mx"))
            & (F.col(id_col) != F.col("__own"))
        )
        .select(id_col, "p")
    )
    return merge_position_islands(cuts, k, id_col)


def strip_duplicate_substrings(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surgical exact-substring dedup: rebuild each document with its
    cut spans (duplicate_substring_spans) removed — the canonical copy
    of every duplicated k-gram survives in its owner document, every
    other occurrence is excised, and unaffected text is untouched.

    Rebuild is positional and pays ONLY for affected docs: untouched
    documents (the vast majority of a healthy corpus) take a map-only
    token re-join — no explode, no shuffle beyond the anti-join
    against the (small) cut-doc id set; affected docs explode their
    own positions (fan-out bounded by doc length), drop the cut ones,
    and re-join survivors in order.

    Output: (id, clean_text, n_tokens, removed_tokens)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )
    base = df.select(F.col(id_col), toks.alias("__toks"))
    # the cut list feeds three branches (untouched anti-join, affected
    # semi-join, positional cuts); checkpoint it once — it is the
    # SMALL side by construction (one row per cut span), while its
    # lineage is the full gram shuffle
    spans = duplicate_substring_spans(df, k, id_col, text_col).localCheckpoint(
        eager=True
    )
    cut_ids = spans.select(id_col).distinct()
    untouched = base.join(cut_ids, id_col, "left_anti").select(
        id_col,
        F.array_join("__toks", " ").alias("clean_text"),
        F.size("__toks").cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("removed_tokens"),
    )
    cut_pos = spans.select(
        id_col,
        F.explode(
            F.sequence(
                F.col("span_start"),
                F.col("span_start") + F.col("span_tokens") - 1,
            )
        ).alias("pos"),
    )
    affected = base.join(cut_ids, id_col, "left_semi")
    tok_rows = affected.select(
        id_col, F.posexplode("__toks").alias("pos", "tok")
    )
    kept = tok_rows.join(cut_pos, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count("*").cast("long").alias("kept_tokens"),
    )
    stripped = (
        affected.select(
            id_col, F.size("__toks").cast("long").alias("n_tokens")
        )
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            # a fully-cut doc rebuilds to the empty string
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("kept_tokens", F.lit(0)))
            .cast("long")
            .alias("removed_tokens"),
        )
    )
    return untouched.unionByName(stripped)


def substring_dedup_stats(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-duplication report per document: how much of
    each doc is covered by token k-grams that also occur in ANOTHER
    document (the doc-level readout of exact-substring dedup a la Lee
    et al., "Deduplicating Training Data Makes Language Models
    Better" — theirs marks 50-token spans via a suffix array; the
    Spark-native equivalent is k-gram keying, which needs no global
    sorted structure and shuffles on uniform hash-partitioned keys).

    Pipeline (one narrow pass + two hash shuffles, never all-pairs):
      1. map-only: tokens (index token rule: lowercase [a-z0-9] runs)
         -> positional raw k-grams via transform over the token array
         (the persisted gram STORE keeps md5 keys,
         sources/gram_store.py);
      2. ONE gram-keyed Exchange: "this gram occurs in >= 2 distinct
         docs" is min(doc) != max(doc) over a whole-partition window
         on the gram key — each row carries its own (id, p), so the
         hit set needs no aggregate, no join back, and no second
         gram scan (see duplicate_substring_spans);
      3. merge overlapping/adjacent covered intervals [p, p+k-1] per
         doc: sorted by start and all equal length, a new span begins
         exactly when p > lag(p) + k — one window pass, and the
         (id, island) groupBy reuses the window's hash(id)
         distribution (no extra Exchange).

    Output: (id, n_tokens, dup_tokens, dup_bp, n_spans) for EVERY
    input doc — clean docs report zeros, so the result doubles as a
    corpus-quality report (dup_bp = 10000*dup_tokens div n_tokens).
    """
    base, grams = positional_grams(df, k, id_col, text_col, hashed=False)
    wg = Window.partitionBy("gram")
    hits = (
        grams.withColumn("__own", F.min(id_col).over(wg))
        .withColumn("__mx", F.max(id_col).over(wg))
        .where(F.col("__own") != F.col("__mx"))
        .select(id_col, "p")
    )
    w = Window.partitionBy(id_col).orderBy("p")
    spans = (
        hits.withColumn("__lag", F.lag("p").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__lag").isNull() | (F.col("p") > F.col("__lag") + k), 1
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(id_col, "__island")
        .agg((F.max("p") - F.min("p") + k).alias("__len"))
        .groupBy(id_col)
        .agg(
            F.sum("__len").cast("long").alias("dup_tokens"),
            F.count("*").cast("long").alias("n_spans"),
        )
    )
    return (
        base.select(id_col, "n_tokens")
        .join(spans, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.expr(
                "CASE WHEN n_tokens > 0 THEN "
                "(10000 * coalesce(dup_tokens, 0)) div n_tokens ELSE 0 END"
            )
            .cast("long")
            .alias("dup_bp"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )
    )
