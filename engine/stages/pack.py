"""Sequence packing: assign documents to fixed-length training sequences.

The standard LLM-pretraining step after tokenization: documents are laid
end-to-end into a token stream and cut into ``seq_len``-token sequences; a
document's pack id is ``floor(stream_offset / seq_len)`` of its first
token.  Requires a GLOBAL ordered prefix sum over the corpus — the
canonical distributed two-phase pattern:

1. sort by the id column (defines the stream order), materialize;
2. pass 1: per-block partial token sums keyed by the block's min id
   (disjoint ranges after the sort), collected to the driver — one tiny
   row per block, never the corpus;
3. driver computes per-block stream offsets (a prefix sum over block
   sums) and broadcasts the {block_key: offset} dict;
4. pass 2: per-block intra-cumsum + broadcast offset -> per-doc stream
   offset and pack id.

Both passes run over the SAME materialized blocks, so block boundaries
(and the min-id keys) are identical between passes.  Token counts use the
engine's SQL-portable whitespace tokenizer (engine.stages.text._TOKEN).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from engine.stages.text import _TOKEN


def _count_tokens_arr(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized token-run count (RE2 C kernel; identical semantics to
    len(_TOKEN.findall(t or '')) — the pattern has no lookarounds)."""
    import pyarrow.compute as pc

    return (
        pc.count_substring_regex(pc.fill_null(col, ""), pattern=_TOKEN.pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    sort_col: str | None = None,
) -> ray.data.Dataset:
    """(id, text) -> (id, n_tokens, stream_offset, pack_id), in stream
    order (id order by default; ``sort_col`` order when given).

    ``stream_offset`` is the document's first-token position in the packed
    stream; ``pack_id = stream_offset // seq_len``.

    ``sort_col`` overrides the STREAM ORDER (default: id order) — pass a
    seeded shuffle key (sample.shuffle_corpus's ``md5(f"{seed}:{id}")``)
    to pack in shuffled order without any join.  The column's values must
    be unique (block offsets are keyed by each block's first value; ids
    are unique by contract, md5 keys collide with negligible 2^-64
    probability) and it is consumed here, not emitted.
    """
    order_col = sort_col or id_col
    s = ds.sort(order_col).materialize()

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(order_col)
        n = _count_tokens_arr(t.column(text_col))
        return pa.table(
            {
                "block_key": pa.array([ids[0].as_py()] if len(ids) else [], ids.type),
                "block_sum": pa.array([int(n.sum())] if len(ids) else [], pa.int64()),
            }
        )

    # one tiny row per block -> driver prefix sum (block count, not corpus)
    parts = s.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    parts.sort(key=lambda r: r["block_key"])
    offsets = {}
    acc = 0
    for r in parts:
        offsets[r["block_key"]] = acc
        acc += r["block_sum"]
    off_ref = ray.put(offsets)

    def assign(t: pa.Table, ref=off_ref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.column(id_col).type),
                    "n_tokens": pa.array([], pa.int64()),
                    "stream_offset": pa.array([], pa.int64()),
                    "pack_id": pa.array([], pa.int64()),
                }
            )
        offs = ray.get(ref)
        ids = t.column(id_col)
        n = _count_tokens_arr(t.column(text_col))
        base = offs[t.column(order_col)[0].as_py()]
        cum_before = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(n, pa.int64()),
                "stream_offset": pa.array(cum_before, pa.int64()),
                "pack_id": pa.array(cum_before // seq_len, pa.int64()),
            }
        )

    return s.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
