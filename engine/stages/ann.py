"""Approximate-nearest-neighbor search over an embedding column.

Two paths (per the build brief):

- ``brute_force_topk`` — the exactness baseline: broadcast the query matrix
  (``ray.put`` once), each ``map_batches`` task computes a *partial* top-k
  per query against its batch (numpy matmul — vectorized), then one tiny
  ``groupby(query_id).map_groups`` merges partials.  Shuffle volume is
  O(n_queries * k * n_blocks), independent of corpus size — the
  pre-aggregate-then-merge pattern.
- ``ivf_topk`` — the scale path: k-means-style coarse quantizer (fixed
  seeded centroids refined by a few Lloyd iterations, all in Ray Data),
  vectors assigned to their nearest centroid list; queries probe only
  ``n_probe`` lists.  Recall < 1.0 by design; the baseline is the oracle.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _PartialTopK:
    """Per-batch partial top-k cosine scores against broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)  # (query_id list, matrix)
        self.q_ids, qm = q
        self.qn = _normalize(np.asarray(qm, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        vecs = _normalize(np.array(batch.column(self.vec_col).to_pylist(), dtype=np.float64))
        sims = self.qn @ vecs.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_sim = [], [], []
        # partial top-k per query within this batch, selected by the SAME
        # total order the merge stage uses (sim desc, vec_id asc): a bare
        # argpartition would keep positional ties, making the survivor set
        # depend on batch partitioning
        for qi in range(sims.shape[0]):
            idx = _topk_by_order(sims[qi], ids, k)
            for j in idx:
                out_q.append(self.q_ids[qi])
                out_id.append(ids[j])
                out_sim.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_id),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def _topk_by_order(sims: np.ndarray, ids, k: int) -> np.ndarray:
    """Indices of the top-k by (sim desc, id asc) — the total order used at
    merge time, so partial winners are independent of batch partitioning."""
    try:
        id_arr = np.asarray(ids)
        order = np.lexsort((id_arr, -sims))
    except (TypeError, ValueError):  # non-sortable id dtype: Python fallback
        order = np.array(
            sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j])), dtype=np.int64
        )
    return order[:k]


def _merge_topk_factory(k: int):
    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort")
        out = df.head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        out["sim"] = out["sim"].round(6)
        return out

    return merge


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: List,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_size: int = 4096,
    concurrency=(1, 2),
) -> ray.data.Dataset:
    """Exact cosine top-k: (query_id, vec_id, sim, rank), rank 1..k.

    Ties broken by vec_id ascending (total order -> deterministic under any
    parallelism).
    """
    qref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float64)))
    partial = ds.map_batches(
        _PartialTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    merged = partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )
    # callers typically sort the result; Arrow-convert so that shuffle
    # doesn't run over pandas blocks (~20x slower; PERF.md #31)
    from engine.stages.common import as_arrow

    return as_arrow(merged)


def train_centroids(
    ds: ray.data.Dataset,
    n_lists: int,
    *,
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    seed: int = 20240817,
) -> np.ndarray:
    """Deterministic spherical k-means: seeded init from a bounded sample,
    then ``lloyd_iters`` distributed assignment passes (per-batch partial
    (sum, count) rows -> tiny driver reduce — the corpus never
    materializes).  Shared by ivf_topk's coarse quantizer, semdedup's
    cluster stage and cluster_topics.  Returns (<=n_lists, dim)
    L2-normalized centroids.

    The init sample is PARTITIONING-INVARIANT: rows are ranked by a
    64-bit FNV hash of the vector bytes and the lowest-hash rows win
    (``global_topk``'s per-block-candidate selection — no all-to-all
    sort), so repartitioning the input cannot change which rows seed the
    draw (a plain ``limit()`` takes whatever rows the current block
    layout yields first, which permuted clusters under repartition).
    Hash ties only occur between bit-identical vectors, which seed the
    same centroid either way."""
    rs = np.random.RandomState(seed)

    from engine.stages.text import fnv1a_batch
    from engine.stages.topk import global_topk

    def add_key(t: pa.Table) -> pa.Table:
        vs = t.column(vec_col).to_pylist()
        keys = fnv1a_batch(
            [np.asarray(v, dtype=np.float64).tobytes() for v in vs]
        ) & np.uint64((1 << 63) - 1)
        return t.append_column("_k", pa.array(keys.astype(np.int64), pa.int64()))

    sample = (
        global_topk(
            ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True),
            order_cols=["_k"],
            descending=[False],
            k=max(n_lists * 8, 256),
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    if len(sample) == 0:
        raise ValueError("train_centroids: empty corpus")
    sm = _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))
    # corpora (or limit() samples) smaller than n_lists: clamp so the
    # no-replacement centroid draw cannot raise
    n_lists = min(n_lists, len(sm))
    cent = sm[rs.choice(len(sm), size=n_lists, replace=False)]

    for _ in range(lloyd_iters):
        cref = ray.put(cent)

        def assign_sum(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            v = _normalize(np.array(t.column(vec_col).to_pylist(), dtype=np.float64))
            a = np.argmax(v @ c.T, axis=1)
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, a, v)
            np.add.at(counts, a, 1)
            return pa.table(
                {
                    "list_id": pa.array(np.arange(len(c)), pa.int32()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        parts = ds.map_batches(assign_sum, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for _, row in parts.iterrows():
            sums[row["list_id"]] += np.asarray(row["vsum"])
            counts[row["list_id"]] += row["n"]
        nz = counts > 0
        cent[nz] = _normalize(sums[nz] / counts[nz, None])

    return cent


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: List,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    seed: int = 20240817,
) -> ray.data.Dataset:
    """IVF ANN: coarse-quantize the corpus into ``n_lists`` inverted lists,
    probe the ``n_probe`` nearest lists per query.

    Centroid training runs as Ray Data aggregations (per-batch partial sums
    -> tiny driver reduce) — the corpus is never materialized.  Recall is
    approximate; compare against brute_force_topk for quality checks.
    """
    cent = train_centroids(
        ds, n_lists, vec_col=vec_col, lloyd_iters=lloyd_iters, seed=seed
    )

    cref = ray.put(cent)
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    probe_lists = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    wanted: dict = {}
    for qi, lists in enumerate(probe_lists):
        for l in lists:
            wanted.setdefault(int(l), []).append(qi)
    wref = ray.put(wanted)
    qref = ray.put((list(query_ids), qn))

    def probe(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        want = ray.get(wref)
        q_ids, qm = ray.get(qref)
        v = _normalize(np.array(t.column(vec_col).to_pylist(), dtype=np.float64))
        ids = t.column(id_col).to_pylist()
        assign = np.argmax(v @ c.T, axis=1)
        out_q, out_id, out_sim = [], [], []
        for li, qis in want.items():
            mask = assign == li
            if not mask.any():
                continue
            sub = v[mask]
            sub_ids = [ids[i] for i in np.nonzero(mask)[0]]
            sims = qm[qis] @ sub.T
            kk = min(k, sims.shape[1])
            for r, qi in enumerate(qis):
                for j in _topk_by_order(sims[r], sub_ids, kk):
                    out_q.append(q_ids[qi])
                    out_id.append(sub_ids[j])
                    out_sim.append(float(sims[r, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_id),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    partial = ds.map_batches(probe, batch_format="pyarrow")
    merged = partial.groupby("query_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas"
    )
    from engine.stages.common import as_arrow

    return as_arrow(merged)


# ---------------------------------------------------------------------------
# int8-quantized ANN: integer candidate generation + exact rerank fetch
# ---------------------------------------------------------------------------

def _dim_scales(ds: ray.data.Dataset, vec_col: str) -> np.ndarray:
    """Per-dimension max-abs of the L2-NORMALIZED corpus (one streaming
    column pass, per-batch partials reduced on the driver)."""

    def partial(t: pa.Table) -> pa.Table:
        v = _normalize(np.array(t.column(vec_col).to_pylist(), dtype=np.float64))
        return pa.table({"mx": pa.array([np.abs(v).max(axis=0)], pa.list_(pa.float64()))})

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        required_col="mx",
    )
    if not blocks:
        raise ValueError("quantized_topk: empty corpus")
    mx = np.max(
        [np.array(row, dtype=np.float64) for b in blocks for row in b.column("mx").to_pylist()],
        axis=0,
    )
    mx[mx == 0] = 1.0
    return mx / 127.0


def _quantize(v: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return np.clip(np.round(v / scales), -127, 127).astype(np.int32)


class _QuantizedPartial:
    """Per-batch partial top-m candidates by int32 quantized dot score.

    The per-block cut AND the merge both use the (int_score desc, vec_id
    asc) total order — selection is pure integer arithmetic, so the
    candidate set is exactly partitioning-invariant (float rerank happens
    in a later, candidate-only pass)."""

    def __init__(self, state_ref, m: int, id_col: str, vec_col: str):
        self.q_ids, self.qq, self.scales = ray.get(state_ref)
        self.m = m
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        v = _normalize(np.array(batch.column(self.vec_col).to_pylist(), dtype=np.float64))
        dq = _quantize(v, self.scales)
        scores = self.qq @ dq.T  # int32 (n_q, batch) — exact integers
        m = min(self.m, scores.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(scores.shape[0]):
            idx = _topk_by_order(scores[qi].astype(np.float64), ids, m)
            for j in idx:
                out_q.append(self.q_ids[qi])
                out_id.append(ids[j])
                out_s.append(int(scores[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_id),
                "iscore": pa.array(out_s, pa.int64()),
            }
        )


def quantized_topk(
    ds: ray.data.Dataset,
    query_ids: List,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_size: int = 4096,
) -> pa.Table:
    """int8-quantized cosine top-k with exact rerank — the memory-scale
    ANN path (4x smaller vectors in flight; integer matmul candidates).

    Three streaming passes: (1) per-dim max-abs scales of the normalized
    corpus; (2) integer candidate generation — per-block partial
    top-(k*rerank_factor) by quantized dot, merged per query under the
    SAME (iscore desc, id asc) total order, so the candidate set is
    bit-reproducible under any partitioning; (3) an exact rerank FETCH:
    only candidate rows are re-read (broadcast id set), their float64
    cosines computed and the final top-k ranked by (sim rounded to 1e-6
    desc, id asc).  Driver state is O(n_queries * k * rerank_factor).
    Returns (query_id, vec_id, sim, rank) like brute_force_topk; recall
    vs the exact baseline is quantization-bounded, test-measured."""
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    scales = _dim_scales(ds, vec_col)
    qq = _quantize(qm, scales)
    state_ref = ray.put((list(query_ids), qq, scales))
    m = k * rerank_factor
    partial = ds.map_batches(
        _QuantizedPartial,
        fn_constructor_kwargs=dict(state_ref=state_ref, m=m, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 2),
    )

    def merge_int(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["iscore", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(m)

    cand = (
        partial.groupby("query_id").map_groups(merge_int, batch_format="pandas")
    ).to_pandas()
    return _exact_rerank(ds, cand, query_ids, qm, k, id_col, vec_col)


_EMPTY_TOPK = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
        "rank": pa.array([], pa.int64()),
    }
)


def _exact_rerank(
    ds: ray.data.Dataset,
    cand: pd.DataFrame,
    query_ids: List,
    qm_norm: np.ndarray,
    k: int,
    id_col: str,
    vec_col: str,
) -> pa.Table:
    """Shared rerank FETCH for the compressed-candidate ANN paths
    (int8 / PQ): re-read ONLY candidate rows (broadcast Arrow id set +
    pc.is_in — no per-row Python), score float64 cosines, final top-k
    per query by (sim rounded to 1e-6 desc, id asc)."""
    if len(cand) == 0:
        return _EMPTY_TOPK
    ids_ref = ray.put(pa.array(sorted(set(cand["vec_id"].tolist()))))

    def fetch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(t.column(id_col), value_set=ray.get(ids_ref))
        return t.filter(keep).select([id_col, vec_col])

    rows = (
        ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    vmap = {
        i: _normalize(np.asarray([v], dtype=np.float64))[0]
        for i, v in zip(rows[id_col], rows[vec_col])
    }
    out_q, out_id, out_sim, out_rank = [], [], [], []
    by_q = {}
    for q, vid in zip(cand["query_id"], cand["vec_id"]):
        by_q.setdefault(q, []).append(vid)
    qrow = {qid: qm_norm[i] for i, qid in enumerate(query_ids)}
    for q in sorted(by_q):
        scored = sorted(
            (
                (round(float(np.dot(qrow[q], vmap[vid])), 6), vid)
                for vid in set(by_q[q])
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for r, (s, vid) in enumerate(scored, 1):
            out_q.append(q)
            out_id.append(vid)
            out_sim.append(s)
            out_rank.append(r)
    return pa.table(
        {
            "query_id": pa.array(out_q),
            "vec_id": pa.array(out_id),
            "sim": pa.array(out_sim, pa.float64()),
            "rank": pa.array(out_rank, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Product quantization: sub-vector codebooks + ADC candidate generation
# ---------------------------------------------------------------------------

def _driver_kmeans(x: np.ndarray, n_cent: int, iters: int = 8, seed: int = 20240817) -> np.ndarray:
    """Deterministic numpy Lloyd's on a (bounded) sample: seeded init
    without replacement, argmin assignment (ties -> lowest index), empty
    clusters keep their previous centroid."""
    rs = np.random.RandomState(seed)
    n_cent = min(n_cent, len(x))
    cent = x[rs.choice(len(x), size=n_cent, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        for c in range(n_cent):
            rows = x[a == c]
            if len(rows):
                cent[c] = rows.mean(axis=0)
    return cent


def _hash_sample(ds: ray.data.Dataset, vec_col: str, k: int) -> np.ndarray:
    """Partitioning-invariant corpus sample: lowest-FNV-hash rows win
    (same device as train_centroids' init sample)."""
    from engine.stages.text import fnv1a_batch
    from engine.stages.topk import global_topk

    def add_key(t: pa.Table) -> pa.Table:
        vs = t.column(vec_col).to_pylist()
        keys = fnv1a_batch(
            [np.asarray(v, dtype=np.float64).tobytes() for v in vs]
        ) & np.uint64((1 << 63) - 1)
        return t.append_column("_k", pa.array(keys.astype(np.int64), pa.int64()))

    sample = (
        global_topk(
            ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True),
            order_cols=["_k"],
            descending=[False],
            k=k,
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    if len(sample) == 0:
        raise ValueError("pq_topk: empty corpus")
    return _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))


class _PQPartial:
    """Per-batch PQ encode + ADC partial top-m.

    The ADC score of a (query, doc) pair is a fixed-order sum of
    ``n_sub`` float64 LUT entries — identical in every partitioning — and
    selection uses the (score desc, id asc) total order, so the candidate
    set is partitioning-invariant without integer arithmetic."""

    def __init__(self, state_ref, m: int, id_col: str, vec_col: str):
        self.q_ids, self.luts, self.books, self.slices = ray.get(state_ref)
        self.m = m
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        v = _normalize(np.array(batch.column(self.vec_col).to_pylist(), dtype=np.float64))
        n = len(ids)
        scores = np.zeros((len(self.q_ids), n), dtype=np.float64)
        for j, (lo, hi) in enumerate(self.slices):
            sub = v[:, lo:hi]
            cb = self.books[j]  # (n_cent, sub_dim)
            d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            code = np.argmin(d, axis=1)  # ties -> lowest index
            scores += self.luts[j][:, code]  # (n_q, n)
        m = min(self.m, n)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(self.q_ids)):
            idx = _topk_by_order(scores[qi], ids, m)
            for jj in idx:
                out_q.append(self.q_ids[qi])
                out_id.append(ids[jj])
                out_s.append(float(scores[qi, jj]))
        return pa.table(
            {
                "query_id": pa.array(out_q),
                "vec_id": pa.array(out_id),
                "adc": pa.array(out_s, pa.float64()),
            }
        )


def pq_topk(
    ds: ray.data.Dataset,
    query_ids: List,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    n_sub: int = 8,
    n_cent: int = 16,
    rerank_factor: int = 4,
    sample_k: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_size: int = 4096,
) -> pa.Table:
    """Product-quantization ANN with exact rerank — the deep-compression
    scale path (vectors live as ``n_sub`` one-byte codes: 4-16x smaller
    than int8, ~dim*8/n_sub x smaller than float64).

    Codebooks are trained on a partitioning-invariant hash sample with a
    seeded driver-side Lloyd's (PQ codebooks are classically
    sample-trained); candidates come from asymmetric-distance (ADC)
    lookup-table scoring — a fixed-order float64 sum per pair, so the
    per-block cut and merge under (adc desc, id asc) are bit-reproducible
    under any partitioning; the final answer reuses the exact rerank
    FETCH (``_exact_rerank``).  Returns (query_id, vec_id, sim, rank);
    recall vs the exact baseline is compression-bounded, test-measured.
    """
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    dim = qm.shape[1]
    n_sub = min(n_sub, dim)
    bounds = np.linspace(0, dim, n_sub + 1).astype(int)
    slices = [(int(bounds[j]), int(bounds[j + 1])) for j in range(n_sub)]
    sample = _hash_sample(ds, vec_col, sample_k)
    books = [
        _driver_kmeans(sample[:, lo:hi], n_cent) for lo, hi in slices
    ]
    luts = [qm[:, lo:hi] @ books[j].T for j, (lo, hi) in enumerate(slices)]
    state_ref = ray.put((list(query_ids), luts, books, slices))
    m = k * rerank_factor
    partial = ds.map_batches(
        _PQPartial,
        fn_constructor_kwargs=dict(state_ref=state_ref, m=m, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 2),
    )

    def merge_adc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["adc", "vec_id"], ascending=[False, True], kind="mergesort")
        return df.head(m)

    cand = (
        partial.groupby("query_id").map_groups(merge_adc, batch_format="pandas")
    ).to_pandas()
    return _exact_rerank(ds, cand, list(query_ids), qm, k, id_col, vec_col)


def mmr_rerank(
    ds: ray.data.Dataset,
    query_vec: np.ndarray,
    *,
    k: int = 10,
    n_candidates: int = 100,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR'98)
    — diversity-aware final ranking over an ANN candidate set, the
    standard answer to near-duplicate-saturated retrieval results (a
    training-data sampler that takes only cosine top-k from a crawl
    corpus gets k near-copies; MMR trades relevance against novelty):
    greedily pick ``argmax_d  lam * sim(q, d) - (1 - lam) * max_{s in
    selected} sim(d, s)``, ties broken id-ascending.

    Output ``(rank, vec_id, relevance, mmr)`` for the k selected
    candidates in selection order (floats — rows-only; the numpy
    reference oracle is pinned in tests).

    Shape: the candidate FETCH is the distributed part and reuses the
    exact machinery — ``brute_force_topk`` partial-top-k merge for the
    top ``n_candidates`` (shuffle volume O(k x blocks), corpus never
    concentrates), then one ``pc.is_in`` filtered pass ships ONLY the
    candidate vectors (n_candidates x dim — driver-sized by construction)
    for the greedy loop, which is inherently sequential and O(k *
    n_candidates) — the standard rerank-window design (rerank depth
    bounds driver work, not corpus size)."""
    q = np.asarray(query_vec, dtype=np.float64).reshape(1, -1)
    cand = (
        brute_force_topk(
            ds, [0], q, k=n_candidates, id_col=id_col, vec_col=vec_col
        )
        .to_pandas()
        .sort_values("rank")
    )
    empty = pa.table(
        {
            "rank": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "relevance": pa.array([], pa.float64()),
            "mmr": pa.array([], pa.float64()),
        }
    )
    if len(cand) == 0:
        return empty
    ids_ref = ray.put(pa.array(sorted(int(i) for i in cand["vec_id"])))

    def fetch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(t.column(id_col), value_set=ray.get(ids_ref))
        return t.filter(keep).select([id_col, vec_col])

    rows = ds.map_batches(
        fetch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    vmap = {
        int(i): v
        for i, v in zip(
            rows[id_col],
            _normalize(np.asarray(rows[vec_col].tolist(), dtype=np.float64)),
        )
    }
    cand_ids = [int(i) for i in cand["vec_id"] if int(i) in vmap]
    cm = np.stack([vmap[i] for i in cand_ids])  # (n_cand, dim), normalized
    qn = _normalize(q)[0]
    rel = cm @ qn  # cosine relevance
    pair = cm @ cm.T  # candidate-candidate cosines
    n = len(cand_ids)
    selected: List[int] = []
    max_div = np.full(n, -np.inf)
    picked = np.zeros(n, bool)
    out = {"rank": [], "id": [], "rel": [], "mmr": []}
    id_arr = np.asarray(cand_ids, dtype=np.int64)
    for r in range(1, min(k, n) + 1):
        if selected:
            score = lam * rel - (1.0 - lam) * max_div
        else:
            score = lam * rel  # first pick: pure relevance
        score = np.where(picked, -np.inf, score)
        # argmax with id-ascending ties: lexsort order
        best = np.lexsort((id_arr, -score))[0]
        picked[best] = True
        selected.append(best)
        out["rank"].append(r)
        out["id"].append(int(id_arr[best]))
        out["rel"].append(float(rel[best]))
        out["mmr"].append(float(score[best]))
        max_div = np.maximum(max_div, pair[:, best])
    return pa.table(
        {
            "rank": pa.array(out["rank"], pa.int64()),
            id_col: pa.array(out["id"], pa.int64()),
            "relevance": pa.array(out["rel"], pa.float64()),
            "mmr": pa.array(out["mmr"], pa.float64()),
        }
    )
