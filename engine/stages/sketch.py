"""Mergeable sketches as Ray Data aggregations.

The pattern (per the Ray guide's "Aggregation at scale"): emit ONE serialized
sketch per (group, batch) from a vectorized ``map_batches``, then merge the
small sketches in a tiny second stage — the shuffle moves sketch bytes, never
rows.  Implemented here: HyperLogLog (Flajolet et al. 2007) with the
standard bias corrections, register width 6 bits packed in a numpy array.

Deterministic: hashing is blake2b (no Python hash), estimates are exact
functions of the input multiset.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Iterable, List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


class HLL:
    """HyperLogLog with 2^p registers (p=12 -> ~1.6% relative error)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, values: Iterable) -> None:
        p = self.p
        regs = self.registers
        for v in values:
            h = int.from_bytes(blake2b(str(v).encode(), digest_size=8).digest(), "big")
            idx = h >> (64 - p)
            rest = h & ((1 << (64 - p)) - 1)
            # rank = leading zeros of the remaining bits + 1
            rank = (64 - p) - rest.bit_length() + 1
            if rank > regs[idx]:
                regs[idx] = rank

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        out = HLL(self.p)
        np.maximum(self.registers, other.registers, out=out.registers)
        return out

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        h = cls(b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    p: int = 12,
) -> ray.data.Dataset:
    """Approximate count-distinct of ``value_col`` per ``key_col``.

    map_batches emits one HLL per (key, batch); groupby(key).map_groups
    merges them.  Output: (key_col, approx_distinct: int64).
    """

    def partial(t: pa.Table) -> pa.Table:
        keys_out: List = []
        sk_out: List[bytes] = []
        df = pd.DataFrame(
            {"k": t.column(key_col).to_pylist(), "v": t.column(value_col).to_pylist()}
        )
        for k, g in df.groupby("k", sort=True):
            h = HLL(p)
            h.add_many(g["v"])
            keys_out.append(k)
            sk_out.append(h.to_bytes())
        return pa.table({key_col: pa.array(keys_out), "sketch": pa.array(sk_out, pa.binary())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = HLL(p)
        for b in df["sketch"]:
            acc = acc.merge(HLL.from_bytes(b))
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "approx_distinct": np.array([round(acc.estimate())], dtype=np.int64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: sketch pass + exact confirm pass
# ---------------------------------------------------------------------------

def _mg_compress(counts: dict, k: int) -> dict:
    """Compress a counter to <= k entries with Misra-Gries semantics:
    subtract the (k+1)-th largest count from everything and drop the
    non-positive remainder (Agarwal et al., Mergeable Summaries, PODS'12
    — this is the mergeable formulation; each surviving estimate
    underestimates the true count by at most total_weight/(k+1))."""
    if len(counts) <= k:
        return dict(counts)
    vals = sorted(counts.values(), reverse=True)
    cut = vals[k]  # (k+1)-th largest
    return {t: c - cut for t, c in counts.items() if c > cut}


def heavy_hitters(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    phi_ppm: int = 2000,
    safety: int = 4,
) -> ray.data.Dataset:
    """EXACT phi-heavy hitters — tokens whose corpus frequency satisfies
    ``count * 1_000_000 >= phi_ppm * N`` — without ever shuffling the full
    (token, cf) table (the scale advantage over term_stats' groupby):

    1. Sketch pass: one Misra-Gries summary of k = safety/phi entries per
       batch (vectorized Counter + _mg_compress), merged on the DRIVER —
       the summaries are k-sized, the merge is dict addition + one final
       compress.  The MG bound guarantees every true heavy hitter
       survives with estimate >= true - N/(k+1); with k >= safety/phi the
       candidate filter ``est*1e6 >= phi_ppm*N - ppm(N/(k+1))`` keeps a
       small superset of the answer.
    2. Confirm pass: broadcast the candidate set, count ONLY candidate
       tokens per batch (map-side filter), groupby(token).Sum — the
       shuffle carries O(candidates x blocks) rows.  Output counts are
       exact, so the whole operator is SQL-verifiable despite the sketch.

    Output: (token, cnt) — every token with cnt/N >= phi_ppm ppm, exact.
    Integer threshold math end-to-end (no float ratios).
    """
    from collections import Counter

    from engine.stages.text import _TOKEN

    k = max(8, (safety * 1_000_000) // max(phi_ppm, 1))

    def sketch(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        n = 0
        for txt in t.column(text_col).to_pylist():
            toks = _TOKEN.findall(txt or "")
            n += len(toks)
            cnt.update(toks)
        mg = _mg_compress(cnt, k)
        # sentinel row ('' token, est 0) carries this batch's token total N
        toks = [""] + list(mg.keys())
        ests = [0] + [mg[t_] for t_ in mg]
        n_part = [n] + [0] * len(mg)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "est": pa.array(ests, pa.int64()),
                "n_part": pa.array(n_part, pa.int64()),
            }
        )

    # driver merge: summaries are k-sized per block — tiny
    from engine.stages.common import collect_arrow_blocks

    merged: dict = {}
    n_total = 0
    for blk in collect_arrow_blocks(
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
    ):
        n_total += int(
            np.asarray(blk.column("n_part").to_numpy(zero_copy_only=False)).sum()
        )
        for tok, est in zip(
            blk.column("token").to_pylist(), blk.column("est").to_pylist()
        ):
            if tok:
                merged[tok] = merged.get(tok, 0) + est
    merged = _mg_compress(merged, k)

    # candidate superset: MG estimate can undercount by N/(k+1)
    slack = n_total // (k + 1)
    thresh_num = phi_ppm * n_total  # compare count*1e6 >= thresh_num
    cands = [
        t for t, est in merged.items() if (est + slack) * 1_000_000 >= thresh_num
    ]
    if not cands or n_total == 0:
        return ray.data.from_arrow(
            pa.table({"token": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
        )
    cand_set = pa.array(sorted(cands), pa.string())

    def confirm(t: pa.Table) -> pa.Table:
        cset = set(cand_set.to_pylist())
        cnt: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            cnt.update(_TOKEN.findall(txt or ""))  # C-speed count, then
        toks = sorted(set(cnt) & cset)  # keep candidates only
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "cnt": pa.array([cnt[t_] for t_ in toks], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(confirm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def final_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.greater_equal(
            pc.multiply(pc.cast(t.column("cnt"), pa.int64()), pa.scalar(1_000_000, pa.int64())),
            pa.scalar(thresh_num, pa.int64()),
        )
        return t.filter(keep)

    return exact.map_batches(final_filter, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Bloom filter: incremental dedup membership without a join
# ---------------------------------------------------------------------------
#
# The 100-TB motivation: re-crawls keep arriving while the already-indexed
# corpus is too large to semi-join against per wave.  A Bloom filter over
# the seen corpus's content hashes is a few MB, broadcasts once, and
# answers "definitely new" map-side with zero shuffle; the classic
# guarantee (no false negatives) means no seen document ever sneaks back
# in, at the cost of a bounded false-positive drop rate
# (~(1-e^{-kn/m})^k).  Partial bitmaps are trivially mergeable (bitwise
# OR), so the build is one streaming pass emitting a bitmap row per batch.


def _bloom_idx(h1: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit indices via double hashing (Kirsch-Mitzenmacher:
    g_i = h1 + i*h2, full-period because h2 is forced odd and m is a
    power of two)."""
    h2 = (h1 ^ (h1 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h2 |= np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def _set_bits(bm: np.ndarray, idx: np.ndarray) -> None:
    np.bitwise_or.at(bm, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))


def _test_bits(bm: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """All-k-bits-set mask of shape (n,) for (k, n) indices."""
    hit = (bm[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=0)


def bloom_build(
    seen: ray.data.Dataset,
    *,
    text_col: str = "text",
    m_bits: int = 1 << 23,
    k: int = 4,
) -> np.ndarray:
    """One streaming pass over the seen corpus -> a merged uint64 bitmap
    (``m_bits`` must be a power of two; 2^23 bits = 1 MiB handles ~1M
    docs at <3% FP with k=4).  Each batch emits ONE bitmap row; the
    driver ORs them (mergeable-sketch pattern — at larger fleets, OR in
    a tree via a tiny groupby on a constant key)."""
    from engine.stages.common import collect_arrow_blocks
    from engine.stages.text import fnv1a_batch

    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(m_bits // 64, dtype=np.uint64)
        h1 = fnv1a_batch([(x or "").encode() for x in t.column(text_col).to_pylist()])
        if h1.size:
            _set_bits(bm, _bloom_idx(h1, m_bits, k))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    merged = np.zeros(m_bits // 64, dtype=np.uint64)
    for blk in collect_arrow_blocks(
        seen.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        required_col="bm",
    ):
        for b in blk.column("bm").to_pylist():
            merged |= np.frombuffer(b, dtype=np.uint64)
    return merged


def bloom_filter_new(
    ds: ray.data.Dataset,
    seen: ray.data.Dataset,
    *,
    text_col: str = "text",
    m_bits: int = 1 << 23,
    k: int = 4,
) -> ray.data.Dataset:
    """Keep only rows of ``ds`` whose content is DEFINITELY not in
    ``seen`` (no false negatives: every seen text is dropped; a bounded
    share of genuinely-new texts false-positive away).  The bitmap
    broadcasts once via ``ray.put``; filtering is a stateless streaming
    map — no shuffle, nothing corpus-sized on the driver."""
    from engine.stages.text import fnv1a_batch

    bm_ref = ray.put(bloom_build(seen, text_col=text_col, m_bits=m_bits, k=k))

    def keep_new(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bm = ray.get(bm_ref)
        h1 = fnv1a_batch([(x or "").encode() for x in t.column(text_col).to_pylist()])
        maybe_seen = _test_bits(bm, _bloom_idx(h1, m_bits, k))
        return t.filter(pa.array(~maybe_seen))

    return ds.map_batches(keep_new, batch_format="pyarrow", zero_copy_batch=True)


def cms_counts(
    ds: ray.data.Dataset,
    terms: List[str],
    *,
    text_col: str = "text",
    width: int = 2048,
    depth: int = 4,
) -> ray.data.Dataset:
    """Count-Min sketch point queries (Cormode & Muthukrishnan 2005):
    estimated corpus frequencies for ``terms`` from a ``depth x width``
    sketch — ``(token, cms_count)``, where cms_count >= the true count
    always (one-sided error) and <= true + (e/width)*N with probability
    1 - e^-depth per query.  The constant-size alternative to a full
    (token, cf) shuffle when only a handful of point queries is needed.

    Mergeable-partial shape (the module pattern): each batch counts into
    its own local sketch and emits <= depth*width (slot, cnt) rows — the
    nonzero cells only — so the shuffle volume is bounded by the SKETCH
    size times blocks, independent of vocabulary or corpus size; one
    groupby(slot) Sum merges (counter addition commutes), the merged
    sketch (depth*width rows) collects on the driver, and estimates are
    min over the depth rows.  Hashing: blake2b(token, salt=row index) —
    deterministic, no Python hash().
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    from engine.stages.text import _TOKEN

    def _slot(tok: str, row: int) -> int:
        h = int.from_bytes(
            blake2b(tok.encode("utf-8"), digest_size=8,
                    salt=row.to_bytes(4, "little") * 4).digest(),
            "little",
        )
        return row * width + (h % width)

    def partial(t: pa.Table) -> pa.Table:
        cf: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            cf.update(_TOKEN.findall(txt or ""))
        cells: Counter = Counter()
        for tok, n in cf.items():
            for r in range(depth):
                cells[_slot(tok, r)] += n
        items = list(cells.items())
        return pa.table(
            {
                "slot": pa.array([s for s, _ in items], pa.int64()),
                "cnt": pa.array([n for _, n in items], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("slot")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    sketch = np.zeros(depth * width, dtype=np.int64)
    from engine.stages.common import collect_arrow_blocks

    for blk in collect_arrow_blocks(merged, required_col="cnt"):
        sl = blk.column("slot").to_numpy(zero_copy_only=False)
        cn = blk.column("cnt").to_numpy(zero_copy_only=False)
        sketch[sl] += cn
    ests = [
        int(min(sketch[_slot(tok, r)] for r in range(depth))) for tok in terms
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array(list(terms), pa.string()),
                "cms_count": pa.array(ests, pa.int64()),
            }
        )
    )
