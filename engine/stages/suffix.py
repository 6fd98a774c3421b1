"""Distributed suffix array over the corpus token stream (prefix
doubling / Manber-Myers, the parallel formulation of Larsson-Sadakane).

Lee et al. (arXiv:2107.06499) deduplicate training data by EXACT
substring match over a corpus-wide suffix array; ``clean.span_dedup``
implements the window-hash approximation, and this module provides the
exact structure itself: every (doc, token-position) ranked in the global
lexicographic order of token-level suffixes (suffixes do not cross
document boundaries).  Equal suffixes share a rank (dense-rank
semantics), which is exactly what substring-dedup consumes — a shared
rank at full comparison depth IS an exact duplicate suffix.

Algorithm (log-round, all-vectorized):

  r_0   = dense rank of each position's token (one string sort)
  round: r_{k+1} = dense rank of the pair (r_k(i), r_k(i + 2^k)),
         with rank -1 when i + 2^k passes the document end (the
         prefix rule: a shorter suffix sorts first)
  stop when every rank is distinct or 2^k covers the longest document.

Each round costs ONE corpus-wide sort (Ray Data's distributed sort)
plus ONE coarse doc-bucket groupby for the shift — the shift never
joins: positions are contiguous per document, so ``r(i + gap)`` is an
index offset inside the bucket after a vectorized doc-major sort.
Dense ranks come from the sort via a per-block scan with an
O(num_blocks) driver boundary exchange (`_dense_rank`) — raw Ray tasks
are used ONLY there, because a cross-block order-sensitive scan is the
one thing ``map_batches`` cannot express (blocks carry no global
position).  ceil(log2(max_doc_len)) rounds total: a 100 TB corpus of
<=64k-token documents costs 17 sorts of (int64,int64) keys — heavy but
the honest price of the exact structure, and every sort is Ray's
streaming shuffle, nothing corpus-sized on the driver.

SQL-verified bit-for-bit: DuckDB orders the suffix LISTS directly
(list comparison is exactly token-sequence comparison incl. the prefix
rule) and dense_rank() replays the tie semantics.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from engine.stages.common import as_arrow
from engine.stages.text import _TOKEN

_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "pos": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
    }
)


@ray.remote
def _block_summary(blk: pa.Table, keys: Tuple[str, ...]):
    """(n_rows, n_starts, first_key, last_key) of one sorted block; a
    'start' is a row whose key differs from its predecessor (the first
    row counts — the driver cancels it when the previous block ends on
    the same key)."""
    if blk.num_rows == 0:
        return (0, 0, None, None)
    cols = [blk.column(k) for k in keys]
    starts = 1
    if blk.num_rows > 1:
        neq = np.zeros(blk.num_rows - 1, dtype=bool)
        for c in cols:
            v = c.to_numpy(zero_copy_only=False)
            neq |= v[1:] != v[:-1]
        starts += int(neq.sum())
    first = tuple(c[0].as_py() for c in cols)
    last = tuple(c[-1].as_py() for c in cols)
    return (blk.num_rows, starts, first, last)


@ray.remote
def _block_rank(
    blk: pa.Table, keys: Tuple[str, ...], n_starts_before: int, first_continues: bool
) -> pa.Table:
    """Attach the global dense rank to one sorted block.
    ``n_starts_before`` = classes that start strictly before this block;
    rank(row) = n_starts_before + (class starts within the block up to
    and including the row) - 1.  A first row continuing the previous
    block's class contributes no start, landing on rank
    ``n_starts_before - 1`` — that class's own index."""
    if blk.num_rows == 0:
        return blk.append_column("r", pa.array([], pa.int64()))
    flags = np.zeros(blk.num_rows, dtype=np.int64)
    flags[0] = 0 if first_continues else 1
    if blk.num_rows > 1:
        neq = np.zeros(blk.num_rows - 1, dtype=bool)
        for k in keys:
            v = blk.column(k).to_numpy(zero_copy_only=False)
            neq |= v[1:] != v[:-1]
        flags[1:] = neq
    r = (n_starts_before - 1) + np.cumsum(flags)
    return blk.append_column("r", pa.array(r, pa.int64()))


def _dense_rank(
    ds: ray.data.Dataset, keys: List[str]
) -> Tuple[ray.data.Dataset, int]:
    """Globally sort by ``keys`` and attach the dense rank as column
    ``r``; returns (ranked dataset, number of distinct keys).  One
    distributed sort + an O(num_blocks) driver exchange."""
    kt = tuple(keys)
    sorted_ds = ds.sort(keys).materialize()
    refs = sorted_ds.to_arrow_refs()  # block order == sort order
    summaries = ray.get([_block_summary.remote(r, kt) for r in refs])

    out_refs = []
    offset = 0
    prev_last = None
    for ref, (n_rows, n_starts, first, last) in zip(refs, summaries):
        if n_rows == 0:
            continue
        cont = prev_last is not None and first == prev_last
        if cont:
            n_starts -= 1
        out_refs.append(_block_rank.remote(ref, kt, offset, cont))
        offset += n_starts
        prev_last = last
    if not out_refs:
        return ds, 0
    return ray.data.from_arrow_refs(out_refs), offset


def suffix_array(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Corpus-wide token-level suffix array: one row ``(doc_id, pos,
    rank)`` per token position, ``rank`` the dense rank of the suffix
    ``tokens[pos:]`` in global lexicographic order (ties = exact equal
    suffixes share a rank)."""
    pos_ds, n_total, max_len = _token_positions(ds, id_col, text_col)
    if n_total == 0:
        return ray.data.from_arrow(_EMPTY)
    state, _, _ = _rank_to_gap(pos_ds, n_total, max_len, n_buckets)
    return state.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pos": t.column("pos"),
                "rank": t.column("r"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _token_positions(ds, id_col: str, text_col: str):
    """Flatten the corpus to one row per token position; returns
    (positions dataset, total positions, longest document)."""

    def positions(t: pa.Table) -> pa.Table:
        ids, poss, toks = [], [], []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            tt = _TOKEN.findall(txt or "")
            ids.extend([d] * len(tt))
            poss.extend(range(len(tt)))
            toks.extend(tt)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "token": pa.array(toks, pa.string()),
            }
        )

    pos_ds = ds.map_batches(
        positions, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_total = pos_ds.count()
    max_len = (int(pos_ds.max("pos")) + 1) if n_total else 0
    return pos_ds, n_total, max_len


def _shift_pairs(state, gap: int, n_buckets: int, keep_dl: bool = False):
    """One coarse doc-bucket pass turning (doc_id, pos, r) into
    (doc_id, pos, r1, r2[, dl]): r2 = rank ``gap`` positions ahead in
    the SAME document (-1 past the end — the prefix-rule sentinel),
    dl = document token length.  No join: positions are contiguous per
    document, so the lookup is an index offset after a doc-major sort
    inside the bucket."""

    def shift(df, gap=gap):
        df = df.sort_values(["doc_id", "pos"], kind="stable")
        r = df["r"].to_numpy()
        doc = df["doc_id"].to_numpy()
        n = len(df)
        r2 = np.full(n, -1, dtype=np.int64)
        if 0 < gap < n:
            same_doc = doc[gap:] == doc[:-gap]
            idx = np.flatnonzero(same_doc)
            r2[idx] = r[idx + gap]
        elif gap == 0:
            r2 = r.copy()
        cols = ["doc_id", "pos", "r1", "r2"]
        df = df.rename(columns={"r": "r1"}).assign(r2=r2)
        if keep_dl:
            # positions are 0..len-1 per doc: length = group size
            df = df.assign(
                dl=df.groupby("doc_id")["pos"].transform("size").to_numpy()
            )
            cols.append("dl")
        return df[cols]

    def bucket(t: pa.Table) -> pa.Table:
        db = t.column("doc_id").to_numpy(zero_copy_only=False) % n_buckets
        return t.append_column("db", pa.array(db, pa.int64()))

    return as_arrow(
        state.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("db")
        .map_groups(shift, batch_format="pandas")
    )


def _rank_to_gap(
    pos_ds, n_total: int, target_gap: int, n_buckets: int, collect: bool = False
):
    """Prefix-doubling rounds until the rank prefix length reaches
    ``target_gap`` (or every rank is already distinct).  Returns
    (state ``(doc_id, pos, r)``, reached gap, distinct classes[,
    rounds]) — ``rounds`` (with ``collect=True``) is the list of
    (prefix_length, state) per level, the sparse table LCP queries
    descend."""
    ranked, n_classes = _dense_rank(pos_ds, ["token"])
    state = ranked.map_batches(
        lambda t: t.select(["doc_id", "pos", "r"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    gap = 1
    rounds = [(1, state)]
    while n_classes < n_total and gap < target_gap:
        paired = _shift_pairs(state, gap, n_buckets)
        ranked, n_classes = _dense_rank(paired, ["r1", "r2"])
        state = ranked.map_batches(
            lambda t: t.select(["doc_id", "pos", "r"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        gap *= 2
        if collect:
            rounds.append((gap, state))
    if collect:
        return state, gap, n_classes, rounds
    return state, gap, n_classes


def dup_spans(
    ds: ray.data.Dataset,
    *,
    span_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT duplicated-window detection (the Lee et al. detection step,
    collision-free where ``clean.span_dedup`` trusts window hashes):
    for every position with a full ``span_len``-token window, how many
    times that exact window occurs corpus-wide — ``(doc_id, pos,
    n_occ)``; duplicated spans are the rows with ``n_occ >= 2``.

    Sparse-table device: after doubling to ``g = 2^floor(log2 L)``, the
    L-window at ``i`` equals the one at ``j`` iff the rank PAIRS
    ``(r_g(i), r_g(i + L - g))`` match — the two g-blocks overlap and
    cover [i, i+L).  So duplicates need only ceil(log2 L) doubling
    rounds (not log of the document length), one final pair ranking,
    and ONE coarse rank-bucket groupby to attach class sizes — never a
    join, never the window text."""
    assert span_len >= 1
    pos_ds, n_total, max_len = _token_positions(ds, id_col, text_col)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "n_occ": pa.array([], pa.int64()),
        }
    )
    if n_total == 0 or max_len < span_len:
        return ray.data.from_arrow(empty)

    g = 1
    while g * 2 <= span_len:
        g *= 2
    state, _, _ = _rank_to_gap(pos_ds, n_total, g, n_buckets)

    # final combine: rank pairs (r_g(i), r_g(i + L - g)) on positions
    # whose full window exists (pos + L <= doclen)
    paired = _shift_pairs(state, span_len - g, n_buckets, keep_dl=True)

    def valid(t: pa.Table) -> pa.Table:
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        dl = t.column("dl").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pos + span_len <= dl)).select(
            ["doc_id", "pos", "r1", "r2"]
        )

    windows = paired.map_batches(
        valid, batch_format="pyarrow", zero_copy_batch=True
    )
    ranked, _ = _dense_rank(windows, ["r1", "r2"])

    # class sizes without a join: coarse rank-bucket groupby, sizes
    # resolved vectorized inside the bucket (every row of a class lands
    # in one bucket)
    def rbucket(t: pa.Table) -> pa.Table:
        rb = t.column("r").to_numpy(zero_copy_only=False) % n_buckets
        return t.append_column("rb", pa.array(rb, pa.int64()))

    def attach(df):
        n = df.groupby("r")["r"].transform("size").to_numpy()
        return df.assign(n_occ=n.astype(np.int64))[["doc_id", "pos", "n_occ"]]

    return as_arrow(
        ranked.map_batches(rbucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("rb")
        .map_groups(attach, batch_format="pandas")
    )


@ray.remote
def _block_last_row(blk: pa.Table):
    if blk.num_rows == 0:
        return None
    return (
        blk.num_rows,
        tuple(blk.column(c)[-1].as_py() for c in ("doc_id", "pos", "dl")),
    )


@ray.remote
def _block_nrows(blk: pa.Table) -> int:
    return blk.num_rows


@ray.remote
def _block_pairs(blk: pa.Table, prev_row) -> pa.Table:
    """Adjacent (row, predecessor) pairs of one sorted block; the first
    row pairs with the previous block's last row (``prev_row``), or is
    OMITTED when there is none (the global first suffix, emitted by the
    caller with lcp 0)."""
    empty = pa.table(
        {
            "di": pa.array([], pa.int64()),
            "pi": pa.array([], pa.int64()),
            "li": pa.array([], pa.int64()),
            "dj": pa.array([], pa.int64()),
            "pj": pa.array([], pa.int64()),
            "lj": pa.array([], pa.int64()),
        }
    )
    n = blk.num_rows
    if n == 0 or (n == 1 and prev_row is None):
        return empty
    doc = blk.column("doc_id").to_numpy(zero_copy_only=False)
    pos = blk.column("pos").to_numpy(zero_copy_only=False)
    dl = blk.column("dl").to_numpy(zero_copy_only=False)
    if prev_row is None:
        di, pi, ln = doc[1:], pos[1:], (dl - pos)[1:]
        dj, pj, lp = doc[:-1], pos[:-1], (dl - pos)[:-1]
    else:
        pd_, pp, pdl = prev_row
        di, pi, ln = doc, pos, dl - pos
        dj = np.concatenate([[pd_], doc[:-1]])
        pj = np.concatenate([[pp], pos[:-1]])
        lp = np.concatenate([[pdl - pp], (dl - pos)[:-1]])
    return pa.table(
        {
            "di": pa.array(di, pa.int64()),
            "pi": pa.array(pi, pa.int64()),
            "li": pa.array(ln, pa.int64()),
            "dj": pa.array(dj, pa.int64()),
            "pj": pa.array(pj, pa.int64()),
            "lj": pa.array(lp, pa.int64()),
            "acc": pa.array(np.zeros(len(di), dtype=np.int64), pa.int64()),
        }
    )


def lcp_adjacent(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    driver_max_positions: int = 100_000,
) -> ray.data.Dataset:
    """LCP array over the corpus suffix order: for every token position,
    the longest common prefix (in tokens) between its suffix and the
    PREVIOUS suffix in global lexicographic order — ``(doc_id, pos,
    lcp)``; the first suffix gets 0.  SA + LCP is the complete Lee et
    al. repeat-analysis structure: a maximal duplicated span of length
    >= L exists iff some lcp >= L, and the offending positions are the
    rows themselves.

    Sparse-table queries over the doubling rounds: LCP(i, j) greedily
    descends the per-round rank tables — if ranks at level g match,
    the suffixes share g more tokens and both cursors advance by g
    (binary decomposition, so ceil(log2 n) levels answer any pair).
    Each level costs TWO position-keyed lookups implemented as native
    hash joins of the still-active pairs against that level's rank
    table; candidate rows always match (a cursor never leaves its
    document while ``acc < remaining``), so the joins stay inner —
    no outer-join schema hazards.  Rank equality at a TRUNCATED window
    means the remainders are entirely equal (prefix-rule ranks encode
    length), which can overshoot ``acc`` by at most that level — the
    final ``min(acc, len_i, len_j)`` clamp restores exactness (proved
    case-by-case in the tests against a literal-suffix oracle)."""
    from engine.stages.dedup import _join_partitions

    pos_ds, n_total, max_len = _token_positions(ds, id_col, text_col)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "lcp": pa.array([], pa.int64()),
        }
    )
    if n_total == 0:
        return ray.data.from_arrow(empty)

    if (
        n_total <= driver_max_positions
        and max_len <= 2_000
        and n_total * max_len <= 20_000_000
    ):
        # size-gated driver fast path (the crawl small-wave device): the
        # distributed pair walk pays TWO native joins per doubling level
        # (~log2(max_len) levels of acero aggregator spin-up — PERF.md
        # #37 territory, measured 43 s at a 27k-position sweep), while a
        # direct single-process pass over the already-collected token
        # positions is seconds AND is the same construction the literal
        # oracle test uses; test_lcp_driver_matches_distributed pins the
        # two paths identical.  The n_total*max_len product gate bounds
        # the O(sum len^2 / 2) suffix-slice memory at ~1e7 tuple slots
        # (sum len_d^2 <= n_total*max_len) — corpora past it take the
        # distributed walk rather than a GB-scale driver spike.
        from engine.stages.common import collect_arrow_blocks

        toks_by_doc: Dict[int, Dict[int, str]] = {}
        for blk in collect_arrow_blocks(pos_ds, required_col="token"):
            for d, p, tok in zip(
                blk.column("doc_id").to_pylist(),
                blk.column("pos").to_pylist(),
                blk.column("token").to_pylist(),
            ):
                toks_by_doc.setdefault(int(d), {})[int(p)] = tok
        suf: List[Tuple[Tuple[str, ...], int, int]] = []
        for d in toks_by_doc:
            pm = toks_by_doc[d]
            toks = tuple(pm[i] for i in range(len(pm)))
            for p in range(len(toks)):
                suf.append((toks[p:], d, p))
        # adjacency order (suffix tokens, doc_id, pos) == the distributed
        # (dense rank, doc_id, pos): equal content shares a rank
        suf.sort()
        out_d: List[int] = []
        out_p: List[int] = []
        out_l: List[int] = []
        prev: Optional[Tuple[str, ...]] = None
        for s, d, p in suf:
            l = 0
            if prev is not None:
                m = min(len(s), len(prev))
                while l < m and s[l] == prev[l]:
                    l += 1
            out_d.append(d)
            out_p.append(p)
            out_l.append(l)
            prev = s
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(out_d, pa.int64()),
                    "pos": pa.array(out_p, pa.int64()),
                    "lcp": pa.array(out_l, pa.int64()),
                }
            )
        )

    _, _, _, rounds = _rank_to_gap(pos_ds, n_total, max_len, n_buckets, collect=True)

    # final suffix order with doc lengths along: (doc_id, pos, r, dl)
    withdl = _shift_pairs(rounds[-1][1], 0, n_buckets, keep_dl=True).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pos": t.column("pos"),
                "r": t.column("r1"),
                "dl": t.column("dl"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ordered = withdl.sort(["r", "doc_id", "pos"]).materialize()
    refs = ordered.to_arrow_refs()
    lasts = ray.get([_block_last_row.remote(b) for b in refs])
    pair_refs = []
    prev = None
    first_identity = None
    for ref, info in zip(refs, lasts):
        if info is None:  # empty block
            continue
        n_rows, last = info
        if prev is None:
            first_identity = ray.get(ref).slice(0, 1)
            if n_rows > 1:  # the global-first row has no predecessor
                pair_refs.append(_block_pairs.remote(ref, None))
        else:
            pair_refs.append(_block_pairs.remote(ref, prev))
        prev = last
    if not pair_refs:  # single suffix in the whole corpus
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": first_identity.column("doc_id"),
                    "pos": first_identity.column("pos"),
                    "lcp": pa.array([0], pa.int64()),
                }
            )
        )
    pairs = ray.data.from_arrow_refs(pair_refs).materialize()

    npart = max(1, min(_join_partitions(), n_total // 64 + 1))
    for g, st in sorted(rounds, key=lambda x: -x[0]):
        def _active_mask(t: pa.Table) -> pa.Array:
            return pc.and_(
                pc.less(t.column("acc"), t.column("li")),
                pc.less(t.column("acc"), t.column("lj")),
            )

        active = pairs.map_batches(
            lambda t: t.filter(_active_mask(t)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        if active.count() == 0:
            break
        rest = pairs.map_batches(
            lambda t: t.filter(pc.invert(_active_mask(t))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def keyed(t: pa.Table) -> pa.Table:
            return t.append_column(
                "ki", pc.add(t.column("pi"), t.column("acc"))
            ).append_column("kj", pc.add(t.column("pj"), t.column("acc")))

        looked = (
            active.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
            .join(
                st,
                join_type="inner",
                num_partitions=npart,
                on=("di", "ki"),
                right_on=("doc_id", "pos"),
                right_suffix="_a",
            )
            .join(
                st,
                join_type="inner",
                num_partitions=npart,
                on=("dj", "kj"),
                right_on=("doc_id", "pos"),
                right_suffix="_b",
            )
        )

        def update(t: pa.Table, g=g) -> pa.Table:
            ra = t.column("r").to_numpy(zero_copy_only=False)
            rb = t.column("r_b").to_numpy(zero_copy_only=False)
            acc = t.column("acc").to_numpy(zero_copy_only=False).copy()
            acc[ra == rb] += g
            out = {
                c: t.column(c) for c in ("di", "pi", "li", "dj", "pj", "lj")
            }
            out["acc"] = pa.array(acc, pa.int64())
            return pa.table(out)

        stepped = looked.map_batches(
            update, batch_format="pyarrow", zero_copy_batch=True
        )
        pairs = stepped.union(rest).materialize()

    # drop zero-row blocks before the final projection: they BYPASS the
    # map fns (CLAUDE.md) and would leak loop-internal schemas (join key
    # columns) into the output union, corrupting a downstream sort
    p_refs = pairs.to_arrow_refs()
    p_counts = ray.get([_block_nrows.remote(r) for r in p_refs])
    pairs = ray.data.from_arrow_refs(
        [r for r, c in zip(p_refs, p_counts) if c]
    )

    result = pairs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("di"),
                "pos": t.column("pi"),
                "lcp": pa.array(
                    np.minimum(
                        t.column("acc").to_numpy(zero_copy_only=False),
                        np.minimum(
                            t.column("li").to_numpy(zero_copy_only=False),
                            t.column("lj").to_numpy(zero_copy_only=False),
                        ),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    first = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": first_identity.column("doc_id"),
                "pos": first_identity.column("pos"),
                "lcp": pa.array([0], pa.int64()),
            }
        )
    )
    return result.union(first)
