"""Generate sf1 (10x sf0.1) for the scaling measurement in PERF.md.

The driver ships sf{0.001,0.01,0.1} only; the 100x-scale argument for
the engine's plans is otherwise plan-reading. This script materializes
a 10x corpus by replicating sf0.1 ten times with DISJOINT key spaces,
so the data grows the way production data grows:

  * events: 10x points in the SAME time window (denser series) with a
    10x user population — windowed aggregates fold 10x rows per
    window, sessionize/asof get 10x partitions;
  * lineitem/orders/customer: keys shifted per copy so every join
    still resolves within its copy (10x fact rows, same dims);
  * documents: per-copy texts get a one-token suffix — cross-copy
    pairs are NEAR-duplicates (the realistic heavy case for
    MinHash/SimHash), not byte-identical rows;
  * embeddings: 10x vectors (identical geometry per copy — ANN cost
    scales with corpus size, which is the axis under test).

Perf-only data: no oracle runs at sf1 (correctness is gated at
sf0.01); dims (region/nation/part/supplier) stay single-copy like
real dimension tables. Deterministic — pure column arithmetic, no
RNG. Output: /root/repo/_testdata/sf1 (gitignored).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
DST = Path(__file__).resolve().parent.parent / "_testdata" / "sf1"
COPIES = 10


def _shift(table: pa.Table, col: str, off: int) -> pa.Table:
    i = table.schema.get_field_index(col)
    shifted = pc.add(table.column(col), pa.scalar(off, table.schema.field(col).type))
    return table.set_column(i, table.schema.field(col), shifted)


def replicate(
    name: str,
    keys: dict[str, int],
    text_suffix: bool = False,
    ts_jitter_col: str | None = None,
) -> None:
    """Write 10 copies of `name`, shifting each listed key column by
    copy_index * span so key spaces never collide across copies.
    ``ts_jitter_col`` shifts that timestamp by copy_index MILLISECONDS:
    without it every copy lands on IDENTICAL timestamps, making
    first/last-style aggregates (arg_min/arg_max on ts) ill-defined —
    engines legitimately disagree on which of 10 equal-ts points is
    "first" (found by the round-6 sf1 oracle sweep). A few ms keeps
    every point in its original window for all practical purposes
    while restoring unique per-series timestamps."""
    src = pq.read_table(SRC / f"{name}.parquet")
    parts = []
    for c in range(COPIES):
        t = src
        for col, span in keys.items():
            t = _shift(t, col, c * span)
        if ts_jitter_col is not None and c > 0:
            i = t.schema.get_field_index(ts_jitter_col)
            jittered = pc.add(
                t.column(ts_jitter_col), pa.scalar(c, pa.duration("ms"))
            )
            t = t.set_column(i, t.schema.field(ts_jitter_col), jittered)
        if text_suffix and c > 0:
            i = t.schema.get_field_index("text")
            txt = pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), f" rev{c}", ""
            )
            t = t.set_column(i, t.schema.field("text"), txt)
        parts.append(t)
    out = pa.concat_tables(parts)
    if ts_jitter_col is not None:
        # The engine works at MILLISECOND resolution (ts_ms): originals
        # less than COPIES ms apart in one series make jittered copies
        # collide at the same ms with different values, so first/last/
        # lag-style aggregates would again be ill-defined. Drop the
        # later-event_id row of any (event_type, ms) collision —
        # deterministic, removes a handful of rows out of a million.
        import duckdb

        con = duckdb.connect()
        con.register("t", out)
        out = con.sql(
            f"""
            SELECT * FROM t QUALIFY row_number() OVER (
              PARTITION BY event_type, epoch_ns({ts_jitter_col}) // 1000000
              ORDER BY event_id) = 1
            """
        ).arrow().cast(out.schema)
    pq.write_table(out, DST / f"{name}.parquet", row_group_size=1 << 20)
    print(f"{name}: {src.num_rows} -> {out.num_rows}")


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    span = {}
    for t, col in [
        ("events", "event_id"), ("events", "user_id"),
        ("orders", "o_orderkey"), ("orders", "o_custkey"),
        ("lineitem", "l_orderkey"),
        ("customer", "c_custkey"),
        ("documents", "doc_id"), ("embeddings", "vec_id"),
    ]:
        m = pc.max(pq.read_table(SRC / f"{t}.parquet", columns=[col]).column(col))
        span[(t, col)] = int(m.as_py()) + 1

    replicate("events", {
        "event_id": span[("events", "event_id")],
        "user_id": span[("events", "user_id")],
    }, ts_jitter_col="ts")
    # customers without orders can push max(c_custkey) past
    # max(o_custkey); shifting BOTH custkey columns by the larger span
    # keeps copies' customer key ranges disjoint (a smaller shift would
    # overlap consecutive copies and fan out every customer join)
    cust_span = max(span[("orders", "o_custkey")], span[("customer", "c_custkey")])
    replicate("orders", {
        "o_orderkey": span[("orders", "o_orderkey")],
        "o_custkey": cust_span,
    })
    replicate("lineitem", {"l_orderkey": span[("orders", "o_orderkey")]})
    replicate("customer", {"c_custkey": cust_span})
    replicate("documents", {"doc_id": span[("documents", "doc_id")]},
              text_suffix=True)
    replicate("embeddings", {"vec_id": span[("embeddings", "vec_id")]})
    for dim in ("region", "nation", "part", "supplier"):
        shutil.copy(SRC / f"{dim}.parquet", DST / f"{dim}.parquet")
        print(f"{dim}: copied")


if __name__ == "__main__":
    main()
