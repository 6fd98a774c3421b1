"""Content-defined chunking — storage-level dedup for archival corpora.

Fixed-size chunking breaks on a single inserted byte; content-defined
chunking (public: LBFS/Rabin, FastCDC — Xia et al., ATC'16) places chunk
boundaries where a rolling hash of the last W bytes hits a mask, so an
edit only disturbs the chunks it touches and the rest of the document
dedups against the previous capture — the WARC-storage analog of the
revisit-record dedup export, one level below it (partial-overlap pages
share chunks even when the page digest changes).

The gear rolling hash has a bounded dependency window:

    h_i = Σ_{k=0..W-1} gear[b_{i-k}] << k   (mod 2^64)

so, unlike the classic sequential formulation, it vectorizes: one
gear-table lookup array, W shifted adds (W ≈ 32 numpy vector ops per
document batch), boundary candidates where ``h & mask == 0``, then a
sparse driver-speed scan over CANDIDATES ONLY to enforce min/max chunk
sizes.  Deterministic end to end (the gear table is splitmix64(i), no
RNG; min/max enforcement is a left-to-right greedy that any
implementation reproduces).
"""

from __future__ import annotations

from hashlib import md5
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

_W = 32  # rolling window (bytes)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_GEAR = _splitmix64(np.arange(256, dtype=np.uint64))


def cdc_boundaries(
    data: bytes, *, mask_bits: int = 8, min_size: int = 64, max_size: int = 1024
) -> List[int]:
    """Chunk END offsets (exclusive) for one payload — vectorized gear
    hash + greedy min/max enforcement over the sparse candidate list."""
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for k in range(_W):
            # gear[b[i-k]] << k contributes to h[i]
            h[k:] += g[: n - k] << np.uint64(k)
    mask = np.uint64((1 << mask_bits) - 1)
    cand = np.flatnonzero((h & mask) == 0) + 1  # boundary AFTER byte i
    ends: List[int] = []
    start = 0
    for c in cand:
        c = int(c)
        if c - start < min_size:
            continue
        while c - start > max_size:
            start += max_size
            ends.append(start)
        ends.append(c)
        start = c
    while n - start > max_size:
        start += max_size
        ends.append(start)
    if start < n:
        ends.append(n)
    return ends


def cdc_chunk_stats(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    mask_bits: int = 8,
    min_size: int = 64,
    max_size: int = 1024,
) -> pa.Table:
    """Corpus-level storage-dedup estimate under content-defined
    chunking: one row ``(n_chunks, n_unique_chunks, total_bytes,
    unique_bytes, saved_ppm)`` — what a chunk store would save vs storing
    every payload whole.

    Shape: per batch, chunk + md5 each payload and PRE-AGGREGATE to
    distinct (chunk_hash, size) rows with local counts; ONE
    corpus-keyed groupby(h) merges; per-block summary partials (tiny)
    reduce on the driver.  Payload bytes never shuffle — only 16-byte
    digests and counts."""
    from ray.data.aggregate import Max, Sum

    from engine.stages.common import collect_arrow_blocks

    def chunk_partial(t: pa.Table) -> pa.Table:
        hs: List[str] = []
        sz: List[int] = []
        for txt in t.column(text_col).to_pylist():
            data = (txt or "").encode()
            start = 0
            for end in cdc_boundaries(
                data, mask_bits=mask_bits, min_size=min_size, max_size=max_size
            ):
                hs.append(md5(data[start:end]).hexdigest())
                sz.append(end - start)
                start = end
        out = pa.table(
            {
                "h": pa.array(hs, pa.string()),
                "size": pa.array(sz, pa.int64()),
            }
        )
        return (
            out.group_by("h")
            .aggregate([("size", "max"), ("size", "count")])
            .select(["h", "size_max", "size_count"])
            .rename_columns(["h", "size", "n"])
        )

    merged = (
        ds.map_batches(chunk_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Max("size", alias_name="size"), Sum("n", alias_name="n"))
    )

    def summary(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select(["size", "n"])
        sizes = t.column("size").to_numpy(zero_copy_only=False)
        ns = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_chunks": pa.array([int(ns.sum())], pa.int64()),
                "n_unique": pa.array([t.num_rows], pa.int64()),
                "total_bytes": pa.array([int((sizes * ns).sum())], pa.int64()),
                "unique_bytes": pa.array([int(sizes.sum())], pa.int64()),
            }
        )

    blocks = collect_arrow_blocks(
        merged.map_batches(summary, batch_format="pyarrow", zero_copy_batch=True),
        required_col="n_chunks",
    )
    if not blocks:
        return pa.table(
            {
                "n_chunks": pa.array([0], pa.int64()),
                "n_unique": pa.array([0], pa.int64()),
                "total_bytes": pa.array([0], pa.int64()),
                "unique_bytes": pa.array([0], pa.int64()),
                "saved_ppm": pa.array([0], pa.int64()),
            }
        )
    allp = pa.concat_tables(blocks, promote_options="default")
    n_chunks = int(sum(allp.column("n_chunks").to_pylist()))
    n_unique = int(sum(allp.column("n_unique").to_pylist()))
    total_b = int(sum(allp.column("total_bytes").to_pylist()))
    unique_b = int(sum(allp.column("unique_bytes").to_pylist()))
    saved = ((total_b - unique_b) * 1_000_000) // total_b if total_b else 0
    return pa.table(
        {
            "n_chunks": pa.array([n_chunks], pa.int64()),
            "n_unique": pa.array([n_unique], pa.int64()),
            "total_bytes": pa.array([total_b], pa.int64()),
            "unique_bytes": pa.array([unique_b], pa.int64()),
            "saved_ppm": pa.array([saved], pa.int64()),
        }
    )
