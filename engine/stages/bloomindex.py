"""Per-shard term Bloom filters — equality-predicate shard skipping.

Companion to `engine/stages/zonemap.py`: zone maps prune shards for RANGE
predicates on a sort-correlated column; a per-shard Bloom filter over each
shard's distinct tokens prunes shards for EQUALITY/term predicates — the
structure behind Elasticsearch's can-match shard pre-filtering and
Parquet's column bloom filters (public: Bloom CACM'70; the reference's
terminal store runs the server-side equivalent when ES routes a term query
to shards).  A term query consults the driver-sized bloom index first and
only opens shards whose filter says "maybe".

Layout: ``m`` = 4 words x 63 bits (bit 63 never set, so every word stays
int64-exact on both the Arrow side and the DuckDB oracle), ``k`` = 2 probe
positions derived from one 64-bit FNV-1a of the token —
``p1 = h % 252``, ``p2 = (h >> 32) % 252`` — bit-identical to the SQL
oracle's ``_sql_fnv`` fold.

Shape: one map_batches pass tokenizes each block and emits
per-(block, shard) bloom-word partials plus a per-probe actual-containment
bitmask; the bloom index is ``rows / shard_size`` entries — driver-sized
by construction — so the merge is a guarded driver bitwise-OR
(`common.collect_arrow_blocks`), not a shuffle.  Token text never leaves
its block: only (shard, 4 int64 words, 1 int64 mask) rows move.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import ray.data

_M = 252  # 4 words x 63 usable bits
_WORDS = 4
_WORD_COLS = [f"b{i}" for i in range(_WORDS)]


def _positions(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """k=2 bloom positions from one uint64 FNV-1a hash."""
    p1 = (h % np.uint64(_M)).astype(np.int64)
    p2 = ((h >> np.uint64(32)) % np.uint64(_M)).astype(np.int64)
    return p1, p2


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(words, pos // 63, np.int64(1) << (pos % 63))


def _empty(probe_terms: Sequence[str]) -> pa.Table:
    return pa.table(
        {
            "shard": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "maybe": pa.array([], pa.bool_()),
            "actual": pa.array([], pa.bool_()),
        }
    )


def shard_term_bloom(
    ds: ray.data.Dataset,
    probe_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_size: int = 50,
) -> pa.Table:
    """Build per-shard (``shard = id // shard_size``) term Bloom filters
    and route each probe term: returns ``(shard, term, maybe, actual)``
    sorted by (shard, term).  ``maybe`` is the bloom verdict (no false
    negatives — pinned by test), ``actual`` the true containment, so the
    output also exposes the realized false-positive behaviour."""
    from engine.stages.text import _TOKEN, fnv1a_batch

    probes: List[str] = list(probe_terms)
    if len(probes) > 62:
        raise ValueError("probe mask packs into one int64: <= 62 terms")

    def partial(t: pa.Table) -> pa.Table:
        from collections import defaultdict

        ids = (
            t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            // shard_size
        )
        texts = t.column(text_col).to_pylist()
        toks: dict = defaultdict(set)
        for s, txt in zip(ids, texts):
            toks[int(s)].update(_TOKEN.findall(txt or ""))
        shards = sorted(toks)
        words = np.zeros((len(shards), _WORDS), dtype=np.int64)
        masks = np.zeros(len(shards), dtype=np.int64)
        for i, s in enumerate(shards):
            tl = sorted(toks[s])
            h = fnv1a_batch([w.encode("utf-8") for w in tl])
            p1, p2 = _positions(h)
            _set_bits(words[i], p1)
            _set_bits(words[i], p2)
            for j, term in enumerate(probes):
                if term in toks[s]:
                    masks[i] |= np.int64(1) << np.int64(j)
        cols = {"shard": pa.array(shards, pa.int64())}
        for w in range(_WORDS):
            cols[_WORD_COLS[w]] = pa.array(words[:, w], pa.int64())
        cols["amask"] = pa.array(masks, pa.int64())
        return pa.table(cols)

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        required_col="amask",
    )
    if not blocks:
        return _empty(probes)
    t = pa.concat_tables(blocks, promote_options="default")
    shard = t.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(shard, kind="stable")
    shard = shard[order]
    uniq, firsts = np.unique(shard, return_index=True)
    merged = np.zeros((len(uniq), _WORDS + 1), dtype=np.int64)
    for c in range(_WORDS):
        col = t.column(_WORD_COLS[c]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )[order]
        merged[:, c] = np.bitwise_or.reduceat(col, firsts)
    amask = t.column("amask").to_numpy(zero_copy_only=False).astype(np.int64)[
        order
    ]
    merged[:, _WORDS] = np.bitwise_or.reduceat(amask, firsts)

    # route every probe term against every shard's filter
    ph = fnv1a_batch([w.encode("utf-8") for w in probes])
    pp1, pp2 = _positions(ph)
    out_shard: List[int] = []
    out_term: List[str] = []
    out_maybe: List[bool] = []
    out_actual: List[bool] = []
    for i, s in enumerate(uniq):
        for j, term in enumerate(probes):
            hit1 = (merged[i, pp1[j] // 63] >> (pp1[j] % 63)) & 1
            hit2 = (merged[i, pp2[j] // 63] >> (pp2[j] % 63)) & 1
            out_shard.append(int(s))
            out_term.append(term)
            out_maybe.append(bool(hit1 and hit2))
            out_actual.append(bool((merged[i, _WORDS] >> j) & 1))
    return pa.table(
        {
            "shard": pa.array(out_shard, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "maybe": pa.array(out_maybe, pa.bool_()),
            "actual": pa.array(out_actual, pa.bool_()),
        }
    ).sort_by([("shard", "ascending"), ("term", "ascending")])
