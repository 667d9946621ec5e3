"""Training-batch assembly: epoch shuffling, sequence packing, and
mixture weighting — the last mile between a cleaned corpus and a
training run.

Pretraining consumes a corpus as a token STREAM: each epoch the
documents are (1) shuffled deterministically, (2) concatenated in that
order, and (3) cut into fixed-size context windows ("sequence
packing", the concat-and-chunk scheme used by GPT-style pipelines).
These operators compute that assignment as metadata — which shard,
which byte/token offset, which context chunk each document lands in —
without ever materializing the token stream itself.

Determinism contract: all ordering derives from the engine-wide
md5/32-bit rank hash (see operators/sampling.rank_hash), so the DuckDB
oracle replays shuffle order, shard assignment, offsets, and chunk ids
bit-for-bit, and two runs (or two engines) produce the same epoch.

Scale design:

- ``epoch_shard`` is MAP-ONLY: shard = hash % n_shards, order = the
  hash itself. No global row_number — a total order over 100 TB needs
  no single sequence, only a sort key; readers range-partition on
  (shard, ord).
- ``pack_sequences`` needs a prefix sum of token counts in shuffle
  order. A corpus-wide window is the classic single-reducer sort, so
  the prefix sum runs WITHIN each shard (one window partition per
  shard, shards sized by n_shards to fit an executor; 100 TB / 4096
  shards ≈ 25 GB of (id, n_tokens) pairs — and the window carries only
  those two columns, not the text). Chunk ids are shard-local by
  construction; (shard, chunk) is the global key.
- ``mixture_weights`` groups per source — a tiny aggregate broadcast
  back to the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dqe_spark.operators.sampling import HASH_SPACE
from dqe_spark.operators.text import token_count

#: default number of epoch shards; at 100 TB pick ~#executor-slots × 4
DEFAULT_SHARDS = 8


def _epoch_hash(epoch: int, id_col: str):
    """Deterministic per-(epoch, doc) order key: first 8 hex chars of
    md5('e<epoch>:' || id) as a long. A new epoch re-keys every
    document, so consecutive epochs see independent orders."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"e{epoch}:"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def epoch_shard(
    df: DataFrame,
    epoch: int = 0,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch shuffle: (id, shard, ord).

    ``shard`` = which of ``n_shards`` stream partitions the document
    belongs to this epoch; ``ord`` = its sort key within the shard.
    Map-only — the caller range-sorts on (shard, ord) when writing, so
    the only shuffle in the whole epoch assembly is that final
    repartitionByRange, sized by the writer.
    """
    h = _epoch_hash(epoch, id_col)
    return df.select(
        F.col(id_col),
        (h % n_shards).cast("int").alias("shard"),
        h.alias("ord"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    epoch: int = 0,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style pretraining batches).

    Documents are laid out in deterministic epoch-shuffle order within
    each shard; the token stream is cut every ``budget`` tokens. Each
    document's placement is fully described by its exclusive prefix
    sum of token counts:

        offset      = sum of n_tokens of all earlier docs in the shard
        chunk_first = offset div budget          (chunk it starts in)
        chunk_last  = (offset + n_tokens - 1) div budget

    A document with chunk_first != chunk_last straddles a context
    boundary and is split across chunks — exactly the concat-then-cut
    semantics, reproduced as metadata. Output:
    (id, shard, ord, n_tokens, offset, chunk_first, chunk_last).

    Plan shape: one narrow projection (tokenize + hash), then ONE
    window per shard for the running sum — the window input is just
    (shard, ord, n_tokens), so the sort never carries document text.
    """
    h = _epoch_hash(epoch, id_col)
    base = df.select(
        F.col(id_col),
        (h % n_shards).cast("int").alias("shard"),
        h.alias("ord"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "shard",
        "ord",
        "n_tokens",
        offset.alias("offset"),
        F.expr(f"offset DIV {budget}").alias("chunk_first"),
        F.expr(f"(offset + n_tokens - 1) DIV {budget}").alias("chunk_last"),
    )


def chunk_documents(
    df: DataFrame,
    size: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token chunks with overlap —
    the per-document counterpart of ``pack_sequences`` (RAG indexing
    and long-context pretraining both consume this shape: windows of
    ``size`` tokens advancing by ``size − overlap``).

    Chunk ``i`` covers tokens [i·stride, i·stride + size); the last
    chunk is the first one whose window reaches the end of the
    document, so every token is covered and no chunk starts past the
    end. A document with n ≤ size tokens yields exactly one chunk.

    Output: (id, chunk_id, tok_start, chunk_tokens, chunk_text).

    Plan shape: MAP-ONLY — tokenize, compute the chunk count
    arithmetically, explode a 0..n_chunks−1 sequence, and slice the
    token array per chunk. No shuffle, no window; output rows are
    produced in the same partition that read the document, so the
    operator scales linearly with corpus bytes. The explode fan-out is
    bounded by n/stride per document (a 100k-token doc at the default
    stride is ~450 rows), and the text column is read once.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size("__toks")
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.expr(f"CAST((size(__toks) - {overlap} + {stride - 1}) DIV {stride} AS INT)")
    )
    d = d.withColumn("__i", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
    start = F.col("__i") * stride
    return d.select(
        id_col,
        F.col("__i").cast("long").alias("chunk_id"),
        start.cast("long").alias("tok_start"),
        F.least(F.lit(size), n - start).cast("long").alias("chunk_tokens"),
        F.array_join(F.slice("__toks", start + 1, F.lit(size)), " ").alias(
            "chunk_text"
        ),
    )


def mixture_weights(
    df: DataFrame,
    strata: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum (alpha = 0.5,
    i.e. sqrt-smoothing — the multilingual-sampling scheme that
    upweights small sources without letting any source dominate).

        weight_s ~ sqrt(tokens_s) / sum_s' sqrt(tokens_s')

    Computed entirely in the INTEGER domain so it is deterministic
    across engines and run orders: isqrt = floor(sqrt(n_tokens)) (IEEE
    sqrt is correctly rounded, so the floor is engine-identical), the
    normalizer is an integer sum (order-independent — a float sum's
    value depends on reduction order), and the weight is fixed-point
    parts-per-billion via integer division. A float formulation
    measured ~20 last-ulp mismatches vs the oracle purely from
    summation order.
    Output: (strata, n_docs, n_tokens, weight_ppb).

    Plan: one grouped aggregate (partial-agg absorbs skew) over a
    narrow (strata, n_tokens) projection; the normalizing sum is a
    single-row cross-joined broadcast.
    """
    isq = F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    per = (
        df.select(F.col(strata), token_count(F.col(text_col)).alias("nt"))
        .groupBy(strata)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
        .withColumn("__isq", isq)
    )
    total = per.agg(F.sum("__isq").alias("__z"))
    return per.crossJoin(F.broadcast(total)).select(
        strata,
        "n_docs",
        "n_tokens",
        F.expr("(__isq * 1000000000) DIV __z").alias("weight_ppb"),
    )


__all__ = ["epoch_shard", "pack_sequences", "mixture_weights", "DEFAULT_SHARDS"]
