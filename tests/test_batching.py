"""Training-batch assembly (operators/batching.py): packing invariants,
epoch independence, mixture-weight normalization."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_pack_offsets_are_exclusive_prefix_sums(spark):
    """Within each shard, offsets in (ord, id) order are the running
    sum of earlier docs' token counts — i.e. the concatenated stream
    has no gaps and no overlaps."""
    from dqe_spark.operators.batching import pack_sequences

    rows = (
        pack_sequences(_docs(spark), budget=512, epoch=0)
        .orderBy("shard", "ord", "doc_id")
        .collect()
    )
    assert rows
    run = {}
    for r in rows:
        assert r.offset == run.get(r.shard, 0), (r.shard, r.doc_id)
        run[r.shard] = r.offset + r.n_tokens
        assert r.chunk_first == r.offset // 512
        assert r.chunk_last == (r.offset + r.n_tokens - 1) // 512
        assert r.chunk_first <= r.chunk_last


def test_pack_chunks_cover_stream_exactly(spark):
    """Every chunk id in [0, last] is touched by at least one document
    — cutting the stream every `budget` tokens leaves no empty
    context windows."""
    from dqe_spark.operators.batching import pack_sequences

    rows = pack_sequences(_docs(spark), budget=256, epoch=0).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, set()).update(
            range(r.chunk_first, r.chunk_last + 1)
        )
    for shard, chunks in by_shard.items():
        assert chunks == set(range(max(chunks) + 1)), shard


def test_epochs_reshuffle(spark):
    """Different epochs produce different orders (and the same epoch
    reproduces itself exactly)."""
    from dqe_spark.operators.batching import epoch_shard

    d = _docs(spark)
    e0 = {r.doc_id: (r.shard, r.ord) for r in epoch_shard(d, epoch=0).collect()}
    e0b = {r.doc_id: (r.shard, r.ord) for r in epoch_shard(d, epoch=0).collect()}
    e1 = {r.doc_id: (r.shard, r.ord) for r in epoch_shard(d, epoch=1).collect()}
    assert e0 == e0b
    changed = sum(1 for k in e0 if e0[k] != e1[k])
    assert changed > len(e0) * 0.9  # re-keying moves essentially everything


def test_mixture_weights_normalized(spark):
    """ppb weights are positive and sum to 1e9 within integer-division
    truncation (one ulp per stratum)."""
    from dqe_spark.operators.batching import mixture_weights

    rows = mixture_weights(_docs(spark)).collect()
    assert rows
    total = sum(r.weight_ppb for r in rows)
    assert 10**9 - len(rows) <= total <= 10**9
    small = min(rows, key=lambda r: r.n_tokens)
    big = max(rows, key=lambda r: r.n_tokens)
    # sqrt-temperature: weight ratio is damped vs token ratio
    assert big.weight_ppb / small.weight_ppb <= big.n_tokens / small.n_tokens


def test_pack_window_never_carries_text(spark):
    """The window sort input is the narrow (shard, ord, n_tokens)
    projection — document text must be pruned before the exchange."""
    from dqe_spark.operators.batching import pack_sequences

    plan = pack_sequences(_docs(spark), budget=512)._jdf.queryExecution().executedPlan().toString()
    # plan text is top-down: the Window/Sort/Exchange lines are the
    # post-shuffle operators — none of them may reference the text col
    shuffle_ops = [
        ln for ln in plan.splitlines()
        if any(op in ln for op in ("Window", "Sort", "Exchange"))
    ]
    assert shuffle_ops and all("text#" not in ln for ln in shuffle_ops), plan


def test_chunk_documents_tiling(spark):
    """Chunks tile each document: chunk i starts at i*stride, every
    token is covered, consecutive chunks overlap by exactly `overlap`
    (except a shorter final chunk), and rejoining the chunk texts with
    the overlap removed reconstructs the token stream."""
    from dqe_spark.operators.batching import chunk_documents

    out = chunk_documents(_docs(spark), size=32, overlap=8)
    rows = out.orderBy("doc_id", "chunk_id").collect()
    docs = {r.doc_id: r.text.strip().split() for r in _docs(spark).collect()}
    per = {}
    for r in rows:
        per.setdefault(r.doc_id, []).append(r)
    assert per.keys() == docs.keys()
    for doc_id, chunks in per.items():
        toks = docs[doc_id]
        n = len(toks)
        for i, c in enumerate(chunks):
            assert c.chunk_id == i
            assert c.tok_start == i * 24
            assert c.chunk_tokens == min(32, n - c.tok_start)
            assert c.chunk_text.split() == toks[c.tok_start : c.tok_start + 32]
        last = chunks[-1]
        # full coverage: the last chunk reaches the end of the doc
        assert last.tok_start + last.chunk_tokens == n
        # no chunk starts at-or-past the end
        assert all(c.tok_start < n for c in chunks)


def test_chunk_documents_single_chunk_and_args(spark):
    from dqe_spark.operators.batching import chunk_documents
    import pytest

    one = chunk_documents(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string"),
        size=8,
        overlap=2,
    ).collect()
    assert len(one) == 1 and one[0].chunk_tokens == 3 and one[0].chunk_text == "a b c"
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark), size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark), size=8, overlap=-1)
