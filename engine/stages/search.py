"""Distributed BM25 top-k retrieval.

The reference pipeline's target store is Elasticsearch, whose relevance
function is Lucene BM25 (public: Robertson & Zaragoza 2009; Lucene's
idf = ln(1 + (N - df + 0.5)/(df + 0.5))).  This operator reproduces that
scoring Ray-Data-first, so a reference user can run the same
"index then search" flow without the ES cluster:

1. ONE tokenize pass (a single Counter per doc — O(dl + m), any query
   size) materializes the sparse tf table: one self-contained row per doc
   with >= 1 matching term, carrying (dl, matched term ids, tfs) as list
   columns — never the text, never absent-term zeros.
2. Corpus statistics (N, sum dl, df per term) ride along as one stats row
   per block from the SAME pass, collected to the driver.
3. A scoring pass over the tf table (broadcast constants) that emits a
   PARTIAL top-k per block (score desc, id asc), merged by one tiny
   driver-side sort over <= k * n_blocks candidates — no all-to-all
   shuffle (same pattern as ann._PartialTopK).

Output is RANK-ONLY (rank, doc_id): float scores are not bit-stable
across engines (ln ULP), but the ordering is — same device as the
SQL-green ann_topk.  Ties break by doc_id ascending, deterministic.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute  # noqa: F401 — pa.compute used below
import ray
import ray.data

from engine.stages.text import _TOKEN


def _sparse_tf_pass(
    ds: ray.data.Dataset,
    terms: List[str],
    id_col: str,
    text_col: str,
):
    """ONE tokenize pass over the corpus for a fixed term list: returns
    ``(tf_ds, N, sum_dl, dfs)`` — the materialized sparse tf table (one
    self-contained row per doc matching >= 1 term: id, dl, tids asc, tfs
    aligned; plus one kind=1 stats row per block), corpus doc count, total
    token count, and the per-term document frequencies.  Term ids are
    POSITIONS in ``terms`` — callers that need token-ascending summation
    order must pass ``terms`` sorted.  Shared by bm25_topk (fixed query)
    and more_like_this (seed-derived terms)."""
    m = len(terms)
    term_id = {t: j for j, t in enumerate(terms)}

    # Sparse tf table: one SELF-CONTAINED row per doc that matches >= 1
    # query term — (doc_id, dl, tids sorted asc, tfs aligned) — docs with
    # no query term emit nothing (they score 0 and are excluded anyway), so
    # the table shrinks with selectivity instead of growing with m.  Each
    # block also emits exactly one stats row (kind=1) carrying its partial
    # (n_docs, sum_dl, df per term), so corpus statistics need no second
    # tokenize pass.  One Counter per doc: O(dl + m), not the old
    # O(dl * m) per-term ``toks.count``.  Self-contained rows make scoring
    # immune to block re-batching/splitting between the two passes.
    def tf_extract(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        sum_dl = 0
        df = np.zeros(m, dtype=np.int64)
        out_id: List[int] = []
        out_dl: List[int] = []
        out_tids: List[List[int]] = []
        out_tfs: List[List[int]] = []
        for i, txt in enumerate(texts):
            toks = _TOKEN.findall(txt or "")
            sum_dl += len(toks)
            cnt = Counter(toks)
            # iterate the smaller side: query terms when m is small,
            # distinct doc tokens when the query set is large
            if m <= len(cnt):
                hits = sorted((j, cnt[tok]) for tok, j in term_id.items() if tok in cnt)
            else:
                hits = sorted((term_id[tok], c) for tok, c in cnt.items() if tok in term_id)
            if hits:
                out_id.append(ids[i])
                out_dl.append(len(toks))
                out_tids.append([h[0] for h in hits])
                out_tfs.append([h[1] for h in hits])
                df[[h[0] for h in hits]] += 1
        n_doc = len(out_id)
        return pa.table(
            {
                "kind": pa.array([0] * n_doc + [1], pa.int8()),
                id_col: pa.array(out_id + [-1], pa.int64()),
                "dl": pa.array(out_dl + [sum_dl], pa.int64()),
                "n": pa.array([0] * n_doc + [len(texts)], pa.int64()),
                "tids": pa.array(out_tids + [[]], pa.list_(pa.int32())),
                "tfs": pa.array(out_tfs + [[]], pa.list_(pa.int64())),
                "df": pa.array([None] * n_doc + [df.tolist()], pa.list_(pa.int64())),
            }
        )

    tf_ds = ds.map_batches(
        tf_extract, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def stats_rows(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.equal(t.column("kind"), 1)).select(
            ["dl", "n", "df"]
        )

    from engine.stages.common import collect_arrow_blocks

    # required_col guards the zero-row bypass: an EMPTY corpus never calls
    # tf_extract, so the blocks here would be schema-less (no "n" column)
    stats_blocks = collect_arrow_blocks(
        tf_ds.map_batches(
            stats_rows, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="n",
    )
    pt = (
        pa.concat_tables(stats_blocks, promote_options="default")
        if stats_blocks
        else pa.table({"n": pa.array([], pa.int64())})
    )
    N = int(pa.compute.sum(pt.column("n")).as_py() or 0)
    if N == 0:
        return tf_ds, 0, 0, np.zeros(m, dtype=np.int64)
    sum_dl = int(pa.compute.sum(pt.column("dl")).as_py() or 0)
    df_list = [d for d in pt.column("df").to_pylist() if d is not None]
    dfs = np.array(df_list, dtype=np.int64).reshape(-1, m).sum(axis=0)
    return tf_ds, N, sum_dl, dfs


def bm25_topk(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Top-k documents by BM25 over ``terms``; returns a driver-side Arrow
    table (rank, id_col) — inherently k rows.  Docs with score 0 (no
    query term present) are excluded."""
    terms = list(terms)
    m = len(terms)
    tf_ds, N, sum_dl, dfs = _sparse_tf_pass(ds, terms, id_col, text_col)
    if N == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
        )
    avgdl = float(sum_dl) / N
    idfs = np.array(
        [math.log(1 + (N - int(dfs[j]) + 0.5) / (int(dfs[j]) + 0.5)) for j in range(m)],
        dtype=np.float64,
    )

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t.column("kind"), 0))
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        # list_flatten / list_value_length are slice- and chunk-safe
        counts = (
            pa.compute.list_value_length(t.column("tids"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tid = pa.compute.list_flatten(t.column("tids")).to_numpy(zero_copy_only=False)
        tf = (
            pa.compute.list_flatten(t.column("tfs"))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        offs = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        # per-(doc, term) component, fully vectorized; dl repeated per hit
        dl_rep = np.repeat(dl, counts)
        comp = (idfs[tid] * tf * (k1 + 1.0)) / (
            tf + k1 * (1 - b + b * (dl_rep / avgdl))
        )
        # per-doc sum in ascending term order — bit-identical to the SQL
        # oracle's term-ordered `+` chain (absent terms contribute an exact
        # 0.0 there, and x + 0.0 == x); Python left-to-right accumulation,
        # no pairwise reassociation
        s = np.empty(len(ids), dtype=np.float64)
        for g in range(len(ids)):
            acc = 0.0
            for v in comp[offs[g] : offs[g + 1]]:
                acc += v
            s[g] = acc
        keep = s > 0
        ids_k = ids[keep]
        s_k = s[keep]
        # partial top-k per block by the SAME total order the driver merge
        # uses (score desc, id asc) — survivors are partitioning-independent
        # and are a superset of the global top-k, so no AllToAll sort is
        # needed: shuffle volume is O(k * n_blocks), not O(matched docs).
        if len(ids_k) > k:
            order = np.lexsort((ids_k, -s_k))[:k]
            ids_k = ids_k[order]
            s_k = s_k[order]
        return pa.table(
            {
                id_col: pa.array(ids_k, pa.int64()),
                "score": pa.array(s_k, pa.float64()),
            }
        )

    scored = tf_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    # per-block candidates are k rows max each — the driver merge is tiny.
    from engine.stages.common import collect_arrow_blocks

    cand = collect_arrow_blocks(scored, required_col="score")
    if not cand:
        return pa.table(
            {"rank": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
        )
    allc = pa.concat_tables(cand, promote_options="default")
    a_ids = allc.column(id_col).to_numpy(zero_copy_only=False)
    a_s = allc.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((a_ids, -a_s))[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
            id_col: pa.array(a_ids[order], pa.int64()),
        }
    )


# Deterministic query for the SQL-verified bm25_topk contract entry; the
# oracle SQL in __ray_entry__ is generated from this same constant.
BM25_TERMS: Tuple[str, ...] = ("table", "hash", "merge")


# more_like_this defaults — the SQL-verified contract entry's constants;
# the oracle in __ray_entry__ is generated from these (single source).
MLT_SEED_MOD = 97       # seed docs: id % MOD == 0, n smallest ids
MLT_N_SEEDS = 5
MLT_N_TERMS = 3         # query terms selected per seed
MLT_K = 5               # results per seed
MLT_MAX_DF_RATIO = 1.0  # ES max_doc_freq analog; 1.0 = disabled (ES default
                        # too — the synthetic corpus's shared Zipf vocabulary
                        # makes any lower gate drop every term)


def more_like_this(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed_mod: int = MLT_SEED_MOD,
    n_seeds: int = MLT_N_SEEDS,
    n_terms: int = MLT_N_TERMS,
    k: int = MLT_K,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_ratio: float = MLT_MAX_DF_RATIO,
) -> pa.Table:
    """Elasticsearch ``more_like_this`` re-expressed Ray-Data-first: for
    each seed document, select its ``n_terms`` most significant terms
    (tf x Lucene-idf, ES's MLT term selection, with the ``max_doc_freq``
    analog dropping terms in more than ``max_df_ratio`` of the corpus)
    and retrieve the top-``k`` other documents by BM25 over those terms.
    This is the "similar pages" feature the reference serves FROM its
    Elasticsearch index (the reference only loads ES; MLT is ES-side) —
    here it runs directly on the corpus.

    Returns a driver-side Arrow table (seed_id, rank, doc_id), rank-only
    (float scores are ln-ULP-unstable across engines; the ordering is not
    — same device as bm25_topk/ann_topk).

    Shape: seed fetch is one column-pruned filter pass (on a real archive
    the CDX index — stages.cdx.cdx_lookup — makes this a point lookup
    instead); then ONE shared tokenize pass builds the sparse tf table
    over the union of all seeds' tokens (term ids assigned in sorted
    token order, so per-doc hit lists are token-ascending), df rides the
    same pass; term selection is a driver-side computation over the tiny
    (seed x term) grid; scoring reuses the tf table with a per-block
    partial top-k PER SEED (k x n_seeds x n_blocks candidate rows to the
    driver, no all-to-all sort)."""
    # 1. seed fetch: the only full-text read that benefits a point index
    def seed_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = pa.array(ids % seed_mod == 0)  # pyarrow 16 has no pc.mod
        return t.filter(keep).select([id_col, text_col])

    from engine.stages.common import collect_arrow_blocks

    empty = pa.table(
        {
            "seed_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
        }
    )
    seed_blocks = collect_arrow_blocks(
        ds.map_batches(seed_rows, batch_format="pyarrow", zero_copy_batch=True),
        required_col=text_col,
    )
    if not seed_blocks:
        return empty
    st = pa.concat_tables(seed_blocks, promote_options="default")
    pairs = sorted(
        zip(
            st.column(id_col).to_pylist(), st.column(text_col).to_pylist()
        )
    )[:n_seeds]
    seed_cnt = {int(i): Counter(_TOKEN.findall(txt or "")) for i, txt in pairs}
    terms = sorted(set().union(*[set(c) for c in seed_cnt.values()])) if seed_cnt else []
    if not terms:
        return empty

    # 2. one shared tokenize pass: tf table + df over ALL seed tokens
    tf_ds, N, sum_dl, dfs = _sparse_tf_pass(ds, terms, id_col, text_col)
    if N == 0:
        return empty
    avgdl = float(sum_dl) / N
    m = len(terms)
    idfs = np.array(
        [math.log(1 + (N - int(dfs[j]) + 0.5) / (int(dfs[j]) + 0.5)) for j in range(m)],
        dtype=np.float64,
    )

    # 3. driver-side term selection per seed: (tf * lnidf desc, token asc)
    # over terms under the df gate — the whole grid is n_seeds x m
    seed_ids = sorted(seed_cnt)
    seed_term_mask = {}
    for sid in seed_ids:
        cand = [
            (-float(seed_cnt[sid][terms[j]]) * idfs[j], terms[j], j)
            for j in range(m)
            if seed_cnt[sid][terms[j]] > 0 and float(dfs[j]) <= max_df_ratio * N
        ]
        cand.sort()
        mask = np.zeros(m, dtype=bool)
        for _, _, j in cand[:n_terms]:
            mask[j] = True
        seed_term_mask[sid] = mask

    # 4. scoring pass: per block, per seed, partial top-k (score desc, id
    # asc).  Per-hit components are computed ONCE with the global idf
    # vector; each seed zero-masks the terms outside its query — an exact
    # 0.0 contribution, so the token-ascending left-to-right accumulation
    # matches the oracle's ordered SUM bit-for-bit (x + 0.0 == x).
    masks = [seed_term_mask[sid] for sid in seed_ids]
    sids = list(seed_ids)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t.column("kind"), 0))
        out_seed: List[int] = []
        out_id: List[int] = []
        out_s: List[float] = []
        if t.num_rows:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
            counts = (
                pa.compute.list_value_length(t.column("tids"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            tid = pa.compute.list_flatten(t.column("tids")).to_numpy(
                zero_copy_only=False
            )
            tf = (
                pa.compute.list_flatten(t.column("tfs"))
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
            offs = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            dl_rep = np.repeat(dl, counts)
            comp = (idfs[tid] * tf * (k1 + 1.0)) / (
                tf + k1 * (1 - b + b * (dl_rep / avgdl))
            )
            for sid, mask in zip(sids, masks):
                masked = np.where(mask[tid], comp, 0.0)
                s = np.empty(len(ids), dtype=np.float64)
                for g in range(len(ids)):
                    acc = 0.0
                    for v in masked[offs[g] : offs[g + 1]]:
                        acc += v
                    s[g] = acc
                keep = (s > 0) & (ids != sid)
                ids_k = ids[keep]
                s_k = s[keep]
                if len(ids_k) > k:
                    order = np.lexsort((ids_k, -s_k))[:k]
                    ids_k = ids_k[order]
                    s_k = s_k[order]
                out_seed.extend([sid] * len(ids_k))
                out_id.extend(int(x) for x in ids_k)
                out_s.extend(float(x) for x in s_k)
        return pa.table(
            {
                "seed_id": pa.array(out_seed, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    cand_blocks = collect_arrow_blocks(
        tf_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        required_col="score",
    )
    if not cand_blocks:
        return empty
    allc = pa.concat_tables(cand_blocks, promote_options="default")
    out_seed: List[int] = []
    out_rank: List[int] = []
    out_id: List[int] = []
    a_seed = allc.column("seed_id").to_numpy(zero_copy_only=False)
    a_ids = allc.column(id_col).to_numpy(zero_copy_only=False)
    a_s = allc.column("score").to_numpy(zero_copy_only=False)
    for sid in sids:
        sel = a_seed == sid
        ids_k = a_ids[sel]
        s_k = a_s[sel]
        order = np.lexsort((ids_k, -s_k))[:k]
        out_seed.extend([sid] * len(order))
        out_rank.extend(range(1, len(order) + 1))
        out_id.extend(int(x) for x in ids_k[order])
    return pa.table(
        {
            "seed_id": pa.array(out_seed, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
        }
    )


def phrase_search(
    ds: ray.data.Dataset,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    last_prefix: bool = False,
) -> ray.data.Dataset:
    """Positional phrase query — ES/Lucene ``match_phrase`` analog over the
    reference's tokenizer (the ChatNoir frontend's quoted-phrase search;
    the reference indexes positions via ES ``index_options`` defaults,
    es_sink mappings).  A doc matches when the phrase's tokens occur
    CONSECUTIVELY in ``_TOKEN`` order; emits ``(id, first_pos,
    phrase_count)`` with 1-based token positions and OVERLAPPING
    occurrence counts ("a a a" contains "a a" twice).

    Embarrassingly parallel — one map_batches pass, no shuffle, nothing on
    the driver.  Per batch the kernel is vectorized over the FLATTENED
    token stream: one Arrow ``equal`` per phrase word, shifted-AND for
    consecutive matches, doc boundaries masked via the repeat/cumsum
    offsets, per-doc counts by prefix-sum differences — no per-doc Python
    loop beyond tokenization itself.
    """
    words = _TOKEN.findall(phrase)
    if not words:
        raise ValueError("phrase must contain at least one token")
    k = len(words)

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64()),
            "phrase_count": pa.array([], pa.int64()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        n_pos = total - k + 1
        if n_pos <= 0:
            return empty
        flat = pa.array(
            [w for tl in tok_lists for w in tl], pa.string()
        )
        hit: np.ndarray | None = None
        for j, w in enumerate(words):
            if last_prefix and j == k - 1:
                # ES match_phrase_prefix: the FINAL position matches any
                # token with this prefix (no expansion cap — equivalent
                # to max_expansions=inf; the direct scan needs no
                # dictionary rewrite, documented deviation)
                mj = pc.starts_with(flat, pattern=w).to_numpy(
                    zero_copy_only=False
                )
            else:
                mj = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            mj = mj[j : j + n_pos]
            hit = mj if hit is None else (hit & mj)
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        # flat position p starts an in-doc phrase iff p+k stays within the
        # owning doc: mask candidates that would cross a doc boundary
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)[:n_pos]
        hit &= (np.arange(n_pos, dtype=np.int64) + k) <= starts[doc_of + 1]
        if not hit.any():
            return empty
        pref = np.zeros(n_pos + 1, np.int64)
        np.cumsum(hit, out=pref[1:])
        s0 = np.minimum(starts[:-1], n_pos)
        s1 = np.minimum(starts[1:], n_pos)
        cnt = pref[s1] - pref[np.minimum(s0, s1)]
        keep = cnt > 0
        hit_idx = np.flatnonzero(hit)
        hit_doc = doc_of[hit_idx]  # nondecreasing
        first_doc, first_i = np.unique(hit_doc, return_index=True)
        first_pos = np.zeros(len(lens), np.int64)
        first_pos[first_doc] = hit_idx[first_i] - starts[first_doc] + 1
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "first_pos": pa.array(first_pos[keep], pa.int64()),
                "phrase_count": pa.array(cnt[keep], pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def snippet_search(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    before: int = 40,
    width: int = 120,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Conjunctive search with SERP snippet generation — the ES
    ``highlight`` analog the ChatNoir frontend renders under each result
    (reference target mappings keep ``body`` stored for exactly this).

    A doc matches when EVERY term occurs (case-insensitive substring on
    the lowercased text).  For each match: ``anchor_term`` = the term
    whose first occurrence comes earliest (ties break by query-term
    order), ``anchor_pos`` = that occurrence's 1-based CHARACTER position
    in the lowercased text, ``snippet`` = the ``width``-char window of the
    lowercased text starting ``before`` chars left of the anchor
    (normalized-snippet contract: the window is cut from ``lower(text)``
    so engine and oracle agree codepoint-for-codepoint).

    One map_batches pass, no shuffle.  Matching is vectorized Arrow
    (``utf8_lower`` + one ``find_substring`` per term); ``find_substring``
    returns BYTE offsets, so rows where ``binary_length != utf8_length``
    (non-ASCII) are re-resolved per row with Python ``str.find`` (char
    offsets) — the established masked-fallback pattern (PERF.md #38).
    The per-row snippet slice runs ONLY over matched rows — at scale this
    is the post-retrieval materialization step, proportional to result
    size, not corpus size.
    """
    terms = [w.lower() for w in terms]
    if not terms or any(not w for w in terms):
        raise ValueError("terms must be non-empty strings")
    sentinel = np.int64(1) << 60

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "anchor_term": pa.array([], pa.string()),
            "anchor_pos": pa.array([], pa.int64()),
            "snippet": pa.array([], pa.string()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        low = pc.fill_null(
            pc.utf8_lower(t.column(text_col).combine_chunks()), ""
        )
        # (m, n) first-occurrence positions; byte offsets from Arrow,
        # char offsets required -> fix up non-ASCII rows per row
        pos = np.stack(
            [
                pc.find_substring(low, pattern=w)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                for w in terms
            ]
        )
        non_ascii = pc.not_equal(
            pc.binary_length(low), pc.utf8_length(low)
        ).to_numpy(zero_copy_only=False)
        if non_ascii.any():
            idxs = np.flatnonzero(non_ascii)
            for i in idxs:
                s = low[int(i)].as_py()
                for j, w in enumerate(terms):
                    pos[j, int(i)] = s.find(w)
        pos = np.where(pos < 0, sentinel, pos)
        matched = (pos < sentinel).all(axis=0)
        if not matched.any():
            return empty
        anchor = pos.min(axis=0)
        term_idx = pos.argmin(axis=0)  # first term on ties: query order
        sel = np.flatnonzero(matched)
        ids = (
            t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)[sel]
        )
        snippets: List[str] = []
        for i in sel:
            s = low[int(i)].as_py()
            a = int(anchor[i])
            start = max(0, a - before)
            snippets.append(s[start : start + width])
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "anchor_term": pa.array(
                    [terms[int(j)] for j in term_idx[sel]], pa.string()
                ),
                "anchor_pos": pa.array(anchor[sel] + 1, pa.int64()),
                "snippet": pa.array(snippets, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def search_facets(
    ds: ray.data.Dataset,
    term: str,
    facets: Sequence[str] = ("lang", "source"),
    *,
    text_col: str = "text",
) -> pa.Table:
    """Faceted search aggregation — the ES ``terms`` aggregations the
    ChatNoir UI renders beside results (per-language / per-source result
    counts for a query).  Matching is case-insensitive substring
    containment of ``term``; output is long-format ``(facet, value,
    doc_count)`` over the given facet columns.

    Facet-value cardinality is driver-sized (languages, sources), so a
    ``groupby`` would spin hash-aggregator actors to move a handful of
    rows (PERF.md #24): instead each block emits <= sum(|facet values|)
    partial rows via Arrow ``value_counts`` and the driver merges them —
    no shuffle at all.
    """
    import pyarrow.compute as pc  # noqa: F401 — used in closure

    term_l = term.lower()

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        low = pc.utf8_lower(t.column(text_col))
        kept = t.filter(
            pc.not_equal(pc.find_substring(low, pattern=term_l), -1)
        )
        out_f: List[str] = []
        out_v: List[str] = []
        out_n: List[int] = []
        for f in facets:
            vc = pc.value_counts(kept.column(f).combine_chunks())
            out_f.extend([f] * len(vc))
            out_v.extend(v.as_py() for v in vc.field("values"))
            out_n.extend(c.as_py() for c in vc.field("counts"))
        return pa.table(
            {
                "facet": pa.array(out_f, pa.string()),
                "value": pa.array(out_v, pa.string()),
                "doc_count": pa.array(out_n, pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        ds.select_columns(list(facets) + [text_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="doc_count",
    )
    if not blocks:
        return pa.table(
            {
                "facet": pa.array([], pa.string()),
                "value": pa.array([], pa.string()),
                "doc_count": pa.array([], pa.int64()),
            }
        )
    allp = pa.concat_tables(blocks, promote_options="default")
    merged = (
        allp.group_by(["facet", "value"])
        .aggregate([("doc_count", "sum")])
        .select(["facet", "value", "doc_count_sum"])
        .rename_columns(["facet", "value", "doc_count"])
    )
    return merged.set_column(
        merged.schema.get_field_index("doc_count"),
        "doc_count",
        pc.cast(merged.column("doc_count"), pa.int64()),
    )


def regex_search(
    ds: ray.data.Dataset,
    pattern: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Regex query — the ES ``regexp``/grep analog: docs whose text
    contains >= 1 match of the RE2 ``pattern``, with the non-overlapping
    match count.  Pure Arrow kernels (``match_substring_regex`` +
    ``count_substring_regex`` — both RE2, same leftmost non-overlapping
    semantics as DuckDB's ``regexp_extract_all``), one map_batches pass,
    no shuffle, no Python in the loop.
    """

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = t.column(text_col)
        mask = pc.fill_null(pc.match_substring_regex(txt, pattern=pattern), False)
        kept = t.filter(mask)
        return pa.table(
            {
                id_col: kept.column(id_col).cast(pa.int64()),
                "n_matches": pc.cast(
                    pc.count_substring_regex(
                        kept.column(text_col), pattern=pattern
                    ),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def _lev_batch(terms: List[str], query: str) -> np.ndarray:
    """Plain Levenshtein distance from ``query`` to every term, batched:
    the DP iterates (len(query) x max_len) SCALAR steps, each an O(n_terms)
    numpy vector op — no per-term Python DP.  Codepoint-exact (numpy
    unicode view), matches DuckDB ``levenshtein``."""
    n = len(terms)
    if n == 0:
        return np.zeros(0, np.int64)
    lens = np.fromiter((len(t) for t in terms), np.int64, count=n)
    L = int(lens.max())
    m = len(query)
    # pad to (n, L) codepoint matrix: U<L view gives one uint32 per char
    arr = np.zeros((n, max(L, 1)), np.uint32)
    buf = np.array(terms, dtype=f"<U{max(L, 1)}")
    arr[:, :] = buf.view(np.uint32).reshape(n, -1)[:, : max(L, 1)]
    q = np.array([ord(c) for c in query], np.uint32)
    prev = np.tile(np.arange(L + 1, dtype=np.int64), (n, 1))
    for j in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = j
        qc = q[j - 1]
        sub_cost = (arr != qc).astype(np.int64)  # (n, L)
        for k in range(1, L + 1):
            cur[:, k] = np.minimum(
                np.minimum(cur[:, k - 1] + 1, prev[:, k] + 1),
                prev[:, k - 1] + sub_cost[:, k - 1],
            )
        prev = cur
    return prev[np.arange(n), lens]



def _vocab_cf(ds: ray.data.Dataset, text_col: str) -> ray.data.Dataset:
    """(term, cf) vocabulary table: per-batch Counter partials -> one
    vocab-sized groupby (the only shuffle).  Shared by the suggesters."""
    from ray.data.aggregate import Sum

    def cf_partials(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        cf: Counter = Counter()
        for txt in texts:
            cf.update(_TOKEN.findall(txt or ""))
        toks = sorted(cf.keys())
        return pa.table(
            {
                "term": pa.array(toks, pa.string()),
                "cf": pa.array([cf[tok] for tok in toks], pa.int64()),
            }
        )

    return (
        ds.map_batches(cf_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
    )


def spell_suggest(
    ds: ray.data.Dataset,
    query: str,
    *,
    k: int = 5,
    max_dist: int = 2,
    text_col: str = "text",
) -> pa.Table:
    """Spell suggestion — the ES term-suggester analog the ChatNoir
    frontend's did-you-mean uses: top-``k`` vocabulary terms within
    Levenshtein distance ``max_dist`` of ``query``, ranked (dist asc,
    cf desc, term asc).  An exact-match term ranks first by construction.

    Shape: per-batch Counter partials -> one (token, cf) groupby (the
    only shuffle; the table is vocab-sized, already reduced) -> per-block
    LENGTH-GATED batched-DP Levenshtein (``_lev_batch``: numpy vector ops,
    no per-term Python DP) + partial top-k -> driver merge of <= k x
    blocks candidate rows.  cf is global after the groupby, so per-block
    top-k under the global order is exact (ann._PartialTopK pattern).
    """
    vocab = _vocab_cf(ds, text_col)

    m = len(query)
    empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            "cf": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )

    def candidates(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select(["term", "cf"])
        lens = pc.utf8_length(t.column("term"))
        gated = t.filter(
            pc.and_(
                pc.greater_equal(lens, m - max_dist),
                pc.less_equal(lens, m + max_dist),
            )
        )
        if gated.num_rows == 0:
            return empty
        terms = gated.column("term").to_pylist()
        dist = _lev_batch(terms, query)
        keep = dist <= max_dist
        out = pa.table(
            {
                "term": pa.array([t_ for t_, kp in zip(terms, keep) if kp]),
                "cf": pa.array(
                    gated.column("cf").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "dist": pa.array(dist[keep], pa.int64()),
            }
        )
        if out.num_rows <= k:
            return out
        return out.take(pc.sort_indices(out, sort_keys=_SUGGEST_KEYS)[:k])

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        vocab.map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True),
        required_col="dist",
    )
    if not blocks:
        return empty
    import pyarrow.compute as pc

    allc = pa.concat_tables(blocks, promote_options="default")
    return allc.take(pc.sort_indices(allc, sort_keys=_SUGGEST_KEYS)[:k])


_SUGGEST_KEYS = [
    ("dist", "ascending"),
    ("cf", "descending"),
    ("term", "ascending"),
]


def prefix_suggest(
    ds: ray.data.Dataset,
    prefix: str,
    *,
    k: int = 5,
    text_col: str = "text",
) -> pa.Table:
    """Autocomplete — the ES completion-suggester analog: top-``k``
    vocabulary terms starting with ``prefix``, ranked (cf desc, term
    asc).  Same shape as spell_suggest over the shared ``_vocab_cf``
    table: Arrow ``starts_with`` filter + per-block partial top-k under
    the global order (cf is global after the groupby), driver merge of
    <= k x blocks rows.  SQL-verified."""
    if not prefix:
        raise ValueError("prefix must be non-empty")
    keys = [("cf", "descending"), ("term", "ascending")]
    empty = pa.table(
        {"term": pa.array([], pa.string()), "cf": pa.array([], pa.int64())}
    )

    def candidates(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select(["term", "cf"])
        hit = t.filter(pc.starts_with(t.column("term"), pattern=prefix))
        if hit.num_rows == 0:
            return empty
        hit = hit.set_column(
            hit.schema.get_field_index("cf"),
            "cf",
            pc.cast(hit.column("cf"), pa.int64()),
        )
        if hit.num_rows <= k:
            return hit
        return hit.take(pc.sort_indices(hit, sort_keys=keys)[:k])

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        _vocab_cf(ds, text_col).map_batches(
            candidates, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="cf",
    )
    if not blocks:
        return empty
    import pyarrow.compute as pc

    allc = pa.concat_tables(blocks, promote_options="default")
    return allc.take(pc.sort_indices(allc, sort_keys=keys)[:k])


def significant_terms(
    ds: ray.data.Dataset,
    query: str,
    *,
    k: int = 10,
    text_col: str = "text",
) -> pa.Table:
    """Significant-terms aggregation — the ES feature that surfaces what
    makes a result set DIFFERENT from the index: terms ranked by how much
    their document frequency in the foreground (docs matching ``query``,
    case-insensitive substring) exceeds their background (whole corpus)
    rate.  Integer-exact score with cross-multiplied rates:
    ``score = fg_df * N_bg - bg_df * N_fg`` (> 0 iff fg rate > bg rate;
    no division, so the DuckDB oracle reproduces it bit-for-bit).  Rank
    (score desc, term asc), top-``k``, fg_df >= 1.

    Shape: ONE tokenize pass emits per-block (term, fg_df, bg_df)
    partials (df semantics — distinct per doc) plus one kind=1 stats row
    per block carrying (n_fg, n_bg) — the _sparse_tf_pass device; one
    vocab-sized groupby; scoring + per-block partial top-k over the
    grouped output with the driver-broadcast N's; tiny driver merge.
    """
    q = query.lower()
    empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            "fg_df": pa.array([], pa.int64()),
            "bg_df": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        }
    )

    def partials(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = t.column(text_col).to_pylist()
        low = pc.fill_null(pc.utf8_lower(t.column(text_col)), "")
        is_fg = pc.not_equal(
            pc.find_substring(low, pattern=q), -1
        ).to_numpy(zero_copy_only=False)
        fg: Counter = Counter()
        bg: Counter = Counter()
        n_fg = 0
        for i, txt in enumerate(texts):
            toks = set(_TOKEN.findall(txt or ""))
            bg.update(toks)
            if is_fg[i]:
                n_fg += 1
                fg.update(toks)
        terms = sorted(bg.keys())
        return pa.table(
            {
                "kind": pa.array([0] * len(terms) + [1], pa.int8()),
                "term": pa.array(terms + [""], pa.string()),
                "fg_df": pa.array(
                    [fg[t_] for t_ in terms] + [n_fg], pa.int64()
                ),
                "bg_df": pa.array(
                    [bg[t_] for t_ in terms] + [len(texts)], pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    from engine.stages.common import collect_arrow_blocks

    part_ds = ds.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    stats = collect_arrow_blocks(
        part_ds.map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("kind"), 1)).select(
                ["fg_df", "bg_df"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        required_col="fg_df",
    )
    if not stats:
        return empty
    st = pa.concat_tables(stats, promote_options="default")
    n_fg = int(pa.compute.sum(st.column("fg_df")).as_py() or 0)
    n_bg = int(pa.compute.sum(st.column("bg_df")).as_py() or 0)
    if n_fg == 0:
        return empty

    grouped = (
        part_ds.map_batches(
            lambda t: t.filter(pa.compute.equal(t.column("kind"), 0)).select(
                ["term", "fg_df", "bg_df"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("term")
        .aggregate(Sum("fg_df", alias_name="fg_df"), Sum("bg_df", alias_name="bg_df"))
    )

    keys = [("score", "descending"), ("term", "ascending")]

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select(["term", "fg_df", "bg_df"])
        t = t.filter(pc.greater_equal(t.column("fg_df"), 1))
        if t.num_rows == 0:
            return empty
        fgv = t.column("fg_df").to_numpy(zero_copy_only=False).astype(np.int64)
        bgv = t.column("bg_df").to_numpy(zero_copy_only=False).astype(np.int64)
        sc = fgv * n_bg - bgv * n_fg
        out = pa.table(
            {
                "term": t.column("term"),
                "fg_df": pa.array(fgv, pa.int64()),
                "bg_df": pa.array(bgv, pa.int64()),
                "score": pa.array(sc, pa.int64()),
            }
        )
        if out.num_rows <= k:
            return out
        return out.take(pc.sort_indices(out, sort_keys=keys)[:k])

    blocks = collect_arrow_blocks(
        grouped.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        required_col="score",
    )
    if not blocks:
        return empty
    import pyarrow.compute as pc

    allc = pa.concat_tables(blocks, promote_options="default")
    return allc.take(pc.sort_indices(allc, sort_keys=keys)[:k])


def collapse_topk(
    ds: ray.data.Dataset,
    term: str,
    *,
    group_col: str = "source",
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Field collapsing — the ES ``collapse`` feature: rank docs by the
    term frequency of ``term`` (token-exact tf, ties doc-id asc), keep
    only the BEST doc per ``group_col`` value (one result per site/source
    on the SERP), return the top-``k`` collapsed results as ``(rank,
    group, id, tf)``.

    Per batch the tf kernel is the phrase_search device at length 1
    (flattened Arrow ``equal`` + prefix-sum differences — no per-doc
    Python); each block then keeps only its best row per group (group
    cardinality is driver-sized — sources, hosts), so the driver merge
    sees <= |groups| x blocks tiny rows and re-collapses (PERF.md #24
    shape: no groupby actors).
    """
    empty = pa.table(
        {
            "rank": pa.array([], pa.int64()),
            group_col: pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        pref = np.zeros(total + 1, np.int64)
        np.cumsum(hit, out=pref[1:])
        tf = pref[starts[1:]] - pref[starts[:-1]]
        keep = tf > 0
        if not keep.any():
            return empty
        sub = pa.table(
            {
                group_col: t.column(group_col).combine_chunks().filter(
                    pa.array(keep)
                ),
                id_col: t.column(id_col).cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                "tf": pa.array(tf[keep], pa.int64()),
            }
        )
        return _collapse_best(sub, group_col, id_col)

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True),
        required_col="tf",
    )
    if not blocks:
        return empty
    import pyarrow.compute as pc

    allc = _collapse_best(
        pa.concat_tables(
            [b.select([group_col, id_col, "tf"]) for b in blocks],
            promote_options="default",
        ),
        group_col,
        id_col,
    )
    order = pc.sort_indices(
        allc, sort_keys=[("tf", "descending"), (id_col, "ascending")]
    )[:k]
    top = allc.take(order)
    return pa.table(
        {
            "rank": pa.array(range(1, top.num_rows + 1), pa.int64()),
            group_col: top.column(group_col),
            id_col: top.column(id_col),
            "tf": top.column("tf"),
        }
    )


def _collapse_best(t: pa.Table, group_col: str, id_col: str) -> pa.Table:
    """Best row per group under (tf desc, id asc): sort then first-per-
    group mask — vectorized, no per-group Python."""
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t,
        sort_keys=[
            (group_col, "ascending"),
            ("tf", "descending"),
            (id_col, "ascending"),
        ],
    )
    s = t.take(idx)
    g = s.column(group_col).to_numpy(zero_copy_only=False)
    first = np.ones(len(g), bool)
    first[1:] = g[1:] != g[:-1]
    return s.filter(pa.array(first))


def rescore_topk(
    ds: ray.data.Dataset,
    first_term: str,
    second_term: str,
    *,
    window: int = 50,
    k: int = 10,
    w1: int = 2,
    w2: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Two-phase ranking — the ES ``rescore`` feature: a cheap first
    phase ranks everything, an expensive second phase re-ranks only the
    top ``window``.  Integer-exact throughout so the oracle is
    bit-for-bit: phase 1 score = tf(first_term), window by (tf1 desc, id
    asc); phase 2 score = w1*tf1 + w2*tf2 over the window only; final
    top-``k`` by (score2 desc, id asc) with 1-based rank.

    Shape: ONE pass computes both term frequencies per doc (flattened-
    stream kernel, two Arrow ``equal``s) and keeps a per-block partial
    top-``window`` under the PHASE-1 order — so the driver merge sees
    <= window x blocks integer rows and the phase-2 rescore runs on the
    window only, exactly the ES contract (the expensive scorer never
    touches the corpus).
    """
    empty = pa.table(
        {
            "rank": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "tf1": pa.array([], pa.int64()),
            "tf2": pa.array([], pa.int64()),
            "score2": pa.array([], pa.int64()),
        }
    )
    phase1_keys = [("tf1", "descending"), (id_col, "ascending")]

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        pref1 = np.zeros(total + 1, np.int64)
        np.cumsum(
            pc.equal(flat, first_term).to_numpy(zero_copy_only=False),
            out=pref1[1:],
        )
        pref2 = np.zeros(total + 1, np.int64)
        np.cumsum(
            pc.equal(flat, second_term).to_numpy(zero_copy_only=False),
            out=pref2[1:],
        )
        tf1 = pref1[starts[1:]] - pref1[starts[:-1]]
        tf2 = pref2[starts[1:]] - pref2[starts[:-1]]
        keep = tf1 > 0
        if not keep.any():
            return empty
        out = pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "tf1": pa.array(tf1[keep], pa.int64()),
                "tf2": pa.array(tf2[keep], pa.int64()),
            }
        )
        if out.num_rows <= window:
            return out
        import pyarrow.compute as pc2

        return out.take(pc2.sort_indices(out, sort_keys=phase1_keys)[:window])

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True),
        required_col="tf1",
    )
    if not blocks:
        return empty
    import pyarrow.compute as pc

    allc = pa.concat_tables(
        [b.select([id_col, "tf1", "tf2"]) for b in blocks],
        promote_options="default",
    )
    win = allc.take(pc.sort_indices(allc, sort_keys=phase1_keys)[:window])
    score2 = pc.add(
        pc.multiply(win.column("tf1"), w1), pc.multiply(win.column("tf2"), w2)
    )
    win = win.append_column("score2", pc.cast(score2, pa.int64()))
    top = win.take(
        pc.sort_indices(
            win, sort_keys=[("score2", "descending"), (id_col, "ascending")]
        )[:k]
    )
    return pa.table(
        {
            "rank": pa.array(range(1, top.num_rows + 1), pa.int64()),
            id_col: top.column(id_col),
            "tf1": top.column("tf1"),
            "tf2": top.column("tf2"),
            "score2": top.column("score2"),
        }
    )


def fuzzy_search(
    ds: ray.data.Dataset,
    query: str,
    *,
    max_dist: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Fuzzy term query — the ES ``fuzzy`` query (AUTO fuzziness): docs
    containing >= 1 token within Levenshtein ``max_dist`` of ``query``,
    with the matching-occurrence count and the best (minimum) distance
    present in the doc.

    Two stages, same contract as a real engine's fuzzy rewrite: (1) the
    query REWRITES against the term dictionary — ``_vocab_cf`` +
    length-gated ``_lev_batch`` produce the matched-term set (a rewrite
    is bounded by the vocabulary near the query, driver-sized by
    construction); (2) one vectorized scan pass counts matched-term
    occurrences per doc (flattened ``index_in`` against the broadcast
    term list; per-doc best distance via ``np.minimum.at``).  Text never
    shuffles; the only shuffle is the vocab groupby."""
    import pyarrow.compute as pc

    vocab_blocks = _vocab_cf(ds, text_col)
    m = len(query)

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select(["term"])
        lens = pc.utf8_length(t.column("term"))
        g = t.filter(
            pc.and_(
                pc.greater_equal(lens, m - max_dist),
                pc.less_equal(lens, m + max_dist),
            )
        )
        if g.num_rows == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        terms = g.column("term").to_pylist()
        d = _lev_batch(terms, query)
        keep = d <= max_dist
        return pa.table(
            {
                "term": pa.array([t_ for t_, kp in zip(terms, keep) if kp]),
                "dist": pa.array(d[keep], pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        vocab_blocks.map_batches(
            gate, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="dist",
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_fuzzy_tokens": pa.array([], pa.int64()),
            "best_dist": pa.array([], pa.int64()),
        }
    )
    if not blocks:
        return ray.data.from_arrow(empty)
    matched = pa.concat_tables(blocks, promote_options="default")
    terms_arr = matched.column("term").combine_chunks()
    dists = matched.column("dist").to_numpy(zero_copy_only=False).astype(np.int64)
    terms_ref = ray.put((terms_arr, dists))

    def scan(t: pa.Table, ref=terms_ref) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        tarr, tdist = ray.get(ref)
        texts = t.column(text_col).to_pylist()
        ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        code = (
            pc.fill_null(pc.index_in(flat, value_set=tarr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        hit = code >= 0
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        cnt = np.bincount(doc_of[hit], minlength=len(lens))
        best = np.full(len(lens), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best, doc_of[hit], tdist[code[hit]])
        keep = cnt > 0
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_fuzzy_tokens": pa.array(cnt[keep], pa.int64()),
                "best_dist": pa.array(best[keep], pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def bool_search(
    ds: ray.data.Dataset,
    *,
    must: Sequence[str] = (),
    should: Sequence[str] = (),
    must_not: Sequence[str] = (),
    min_should: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Boolean query — the ES ``bool`` query over case-insensitive
    substring clauses: every ``must`` term present, no ``must_not`` term
    present, and at least ``min_should`` of the ``should`` terms present
    (``min_should`` is ignored when ``should`` is empty, like ES'
    minimum_should_match default with must clauses).  Output ``(id,
    n_should)`` for matching docs.

    One map_batches pass, one Arrow ``find_substring`` per clause on the
    lowercased text, boolean algebra in numpy — no Python per row, no
    shuffle."""
    must = [w.lower() for w in must]
    should = [w.lower() for w in should]
    must_not = [w.lower() for w in must_not]

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        low = pc.fill_null(pc.utf8_lower(t.column(text_col)), "")

        def has(w: str) -> np.ndarray:
            return (
                pc.not_equal(pc.find_substring(low, pattern=w), -1)
                .to_numpy(zero_copy_only=False)
            )

        n = t.num_rows
        ok = np.ones(n, bool)
        for w in must:
            ok &= has(w)
        for w in must_not:
            ok &= ~has(w)
        n_should = np.zeros(n, np.int64)
        for w in should:
            n_should += has(w)
        if should:
            ok &= n_should >= min_should
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()).filter(pa.array(ok)),
                "n_should": pa.array(n_should[ok], pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def percolate(
    ds: ray.data.Dataset,
    stored_queries: Sequence[Tuple[int, Sequence[str], Sequence[str]]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Percolation — the ES percolator, search INVERTED: the queries are
    stored, each incoming document is matched against all of them (the
    alerting/saved-search/routing primitive).  ``stored_queries`` is a
    driver-sized registry of ``(query_id, must_terms, must_not_terms)``
    with case-insensitive substring clauses; output is one row per
    (doc, matching query): ``(id, query_id)``.

    The registry broadcasts in the task closure (small by definition —
    it is authored by humans); per batch each clause costs ONE Arrow
    ``find_substring`` over the lowercased column and the doc x query
    match matrix is numpy boolean algebra — no shuffle, no Python per
    row, output grows only with matches."""
    reg = [
        (int(qid), [w.lower() for w in must], [w.lower() for w in must_not])
        for qid, must, must_not in stored_queries
    ]
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "query_id": pa.array([], pa.int64()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        low = pc.fill_null(pc.utf8_lower(t.column(text_col)), "")
        n = t.num_rows
        # each distinct clause term evaluated once across all queries
        terms = sorted(
            {w for _, mu, mn in reg for w in mu}
            | {w for _, mu, mn in reg for w in mn}
        )
        has = {
            w: pc.not_equal(pc.find_substring(low, pattern=w), -1)
            .to_numpy(zero_copy_only=False)
            for w in terms
        }
        ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
        out_id: List[np.ndarray] = []
        out_q: List[np.ndarray] = []
        for qid, must, must_not in reg:
            ok = np.ones(n, bool)
            for w in must:
                ok &= has[w]
            for w in must_not:
                ok &= ~has[w]
            if ok.any():
                out_id.append(ids[ok])
                out_q.append(np.full(int(ok.sum()), qid, np.int64))
        if not out_id:
            return empty
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def search_after_page(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    after: Tuple[int, int] | None = None,
    size: int = 10,
) -> ray.data.Dataset:
    """ES ``search_after`` keyset pagination — the deep-paging protocol the
    ChatNoir frontend uses against the reference's ES index (from/size
    breaks past window limits; search_after threads the last hit's sort
    values as a cursor).  Sort order is ``(n_tokens DESC, id ASC)`` — an
    integer relevance proxy plus the unique tiebreaker ES requires — and
    ``after=(count, id)`` keeps only rows STRICTLY after the cursor in
    that order.

    Shape: one vectorized map_batches pass (token counts via
    ``pc.count_substring_regex``, cursor filter as boolean algebra on
    int64 arrays), then the ``global_topk`` candidate pattern — each block
    forwards <= size rows, one tiny final resolve; no all-to-all sort, the
    text never leaves its block.  Page-local 1-based ``rank``."""
    from engine.stages.topk import global_topk

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = pc.fill_null(t.column(text_col), "")
        n_tok = (
            pc.count_substring_regex(col, pattern=_TOKEN.pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.ones(len(ids), bool)
        if after is not None:
            c0, i0 = int(after[0]), int(after[1])
            keep = (n_tok < c0) | ((n_tok == c0) & (ids > i0))
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
            }
        )

    scored = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return global_topk(
        scored,
        order_cols=["n_tokens", id_col],
        descending=[True, False],
        k=size,
    )


def multi_match(
    ds: ray.data.Dataset,
    term: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    title_tokens: int = 6,
    title_weight: int = 3,
    body_weight: int = 1,
    k: int = 10,
) -> ray.data.Dataset:
    """ES ``multi_match`` with per-field boosts (``title^3`` + body), the
    canonical web-search field weighting (the reference's ES mapping
    indexes title and body as separate fields, es_sink mappings).  The
    corpus table has one text column, so the "title" field is the
    document's first ``title_tokens`` tokens — deterministic and
    SQL-replayable (DuckDB list slice).  Integer scoring
    ``title_weight*tf_title + body_weight*tf_body`` keeps the result
    bit-verifiable (no float BM25 here; rank-verified BM25 lives in
    bm25_topk).

    Shape: phrase_search's flattened-token device — one Arrow ``equal``
    over the concatenated token stream, per-doc tf split at the title
    boundary via the repeat/cumsum offsets, ``np.bincount`` partial
    scores — then the global_topk candidate merge.  No shuffle of text.
    """
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "tf_title": pa.array([], pa.int64()),
            "tf_body": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        hit = np.asarray(hit, bool)
        if not hit.any():
            return empty
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos_in_doc = np.arange(total, dtype=np.int64) - starts[doc_of]
        hit_idx = np.flatnonzero(hit)
        hd = doc_of[hit_idx]
        in_title = pos_in_doc[hit_idx] < title_tokens
        tf_title = np.bincount(hd[in_title], minlength=len(lens)).astype(np.int64)
        tf_body = np.bincount(hd[~in_title], minlength=len(lens)).astype(np.int64)
        keep = (tf_title + tf_body) > 0
        score = title_weight * tf_title + body_weight * tf_body
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "tf_title": pa.array(tf_title[keep], pa.int64()),
                "tf_body": pa.array(tf_body[keep], pa.int64()),
                "score": pa.array(score[keep], pa.int64()),
            }
        )

    from engine.stages.topk import global_topk

    scored = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return global_topk(
        scored,
        order_cols=["score", id_col],
        descending=[True, False],
        k=k,
    )


def span_near(
    ds: ray.data.Dataset,
    term_a: str,
    term_b: str,
    *,
    slop: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """ES/Lucene ``span_near`` (unordered) — proximity search: a doc
    matches when ``term_a`` and ``term_b`` occur within ``slop + 1`` token
    positions of each other, in either order (``slop`` counts the
    positions BETWEEN the two spans, Lucene's convention; adjacency is
    ``min_gap == 1``).  Output ``(id, min_gap)`` with the doc's MINIMUM
    position distance over all occurrence pairs — the quantity Lucene's
    SpanNearQuery iterates spans to find.  Complements phrase_search
    (exact adjacency in fixed order) and bool_search (bag-of-substrings,
    no positions); the reference's ES mapping indexes positions
    (es_sink.py mappings, index_options defaults) so its terminal store
    answers the server-side equivalent.

    Shape: embarrassingly parallel — one map_batches pass, no shuffle,
    nothing leaves the block but (id, gap) int64 pairs.  Per batch the
    kernel runs on the FLATTENED token stream (phrase_search's device):
    one Arrow ``equal`` per term, then the min distance from every
    ``term_a`` position to the nearest ``term_b`` via segmented
    forward/backward fills (``np.maximum.accumulate`` of last-b indices,
    reversed ``np.minimum.accumulate`` of next-b indices, invalidated
    across doc boundaries by the repeat/cumsum offsets), and the per-doc
    minimum via ``np.minimum.reduceat`` — no per-doc Python loop beyond
    tokenization itself."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    window = slop + 1
    _HUGE = np.int64(2**62)

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "min_gap": pa.array([], pa.int64()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        a = np.asarray(
            pc.equal(flat, term_a).to_numpy(zero_copy_only=False), bool
        )
        b = np.asarray(
            pc.equal(flat, term_b).to_numpy(zero_copy_only=False), bool
        )
        if not (a.any() and b.any()):
            return empty
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        idx = np.arange(total, dtype=np.int64)
        # last b at or before each position (global ffill, then doc-gated)
        last_b = np.maximum.accumulate(np.where(b, idx, np.int64(-1)))
        dist_l = np.where(last_b >= starts[doc_of], idx - last_b, _HUGE)
        # next b at or after each position (reversed cummin, doc-gated)
        next_b = np.minimum.accumulate(
            np.where(b, idx, np.int64(total))[::-1]
        )[::-1]
        dist_r = np.where(next_b < starts[doc_of + 1], next_b - idx, _HUGE)
        d = np.where(a, np.minimum(dist_l, dist_r), _HUGE)
        # per-doc minimum over a-positions (empty docs clip to a dummy
        # segment and are masked right after)
        seg = np.minimum(starts[:-1], np.int64(total - 1))
        min_gap = np.minimum.reduceat(d, seg)
        min_gap[lens == 0] = _HUGE
        keep = min_gap <= window
        if not keep.any():
            return empty
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "min_gap": pa.array(min_gap[keep], pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


RANK_EVAL_TERMS = ("merge", "batch", "value")
RANK_EVAL_K = 10
RANK_EVAL_TITLE_TOKENS = 6


def rank_eval(
    ds: ray.data.Dataset,
    terms: Sequence[str] = RANK_EVAL_TERMS,
    *,
    k: int = RANK_EVAL_K,
    title_tokens: int = RANK_EVAL_TITLE_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """ES ``_rank_eval`` — ranking-quality evaluation of the search system
    itself: for each query term, run the ranking (integer term frequency
    DESC, id ASC — the bit-exact relevance proxy; float BM25 rank parity
    lives in bm25_topk), judge each retrieved doc against a deterministic
    relevance label (term present in the doc's first ``title_tokens``
    tokens — the same title proxy as multi_match), and emit the standard
    metrics per query: ``(term, n_ret, n_rel, prec_bp, mrr_fp)`` where
    ``prec_bp`` is precision@k in basis points (``n_rel * 10000 //
    n_ret``) and ``mrr_fp`` is fixed-point reciprocal rank (``1_000_000
    // first_relevant_rank``, 0 when nothing relevant) — all integers, so
    every value is bit-verifiable against the SQL oracle.

    Shape: ONE map_batches pass evaluates every query term over the
    flattened token stream (multi_match's device: one Arrow ``equal`` per
    term, per-doc tf by ``np.bincount``, title membership from the
    repeat/cumsum position offsets), emitting only (term, id, tf, rel)
    hit rows; ``grouped_topk`` keeps <= k rows per term per block, so the
    final resolve and the metric fold see <= k x terms rows — driver-sized
    by construction, never a corpus sort."""
    from engine.stages.common import collect_arrow_blocks
    from engine.stages.topk import grouped_topk

    terms = list(terms)

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "rel": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos_in_doc = np.arange(total, dtype=np.int64) - starts[doc_of]
        out_term: List[str] = []
        out_id: List[np.ndarray] = []
        out_tf: List[np.ndarray] = []
        out_rel: List[np.ndarray] = []
        for term in terms:
            hit = np.asarray(
                pc.equal(flat, term).to_numpy(zero_copy_only=False), bool
            )
            if not hit.any():
                continue
            hit_idx = np.flatnonzero(hit)
            hd = doc_of[hit_idx]
            tf = np.bincount(hd, minlength=len(lens)).astype(np.int64)
            in_title = pos_in_doc[hit_idx] < title_tokens
            rel_cnt = np.bincount(hd[in_title], minlength=len(lens))
            keep = tf > 0
            out_term.extend([term] * int(keep.sum()))
            out_id.append(ids[keep])
            out_tf.append(tf[keep])
            out_rel.append((rel_cnt[keep] > 0).astype(np.int64))
        if not out_id:
            return empty
        return pa.table(
            {
                "term": pa.array(out_term, pa.string()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "tf": pa.array(np.concatenate(out_tf), pa.int64()),
                "rel": pa.array(np.concatenate(out_rel), pa.int64()),
            }
        )

    hits = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    topk = grouped_topk(
        hits,
        group_col="term",
        order_cols=["tf", id_col],
        descending=[True, False],
        k=k,
    )
    blocks = collect_arrow_blocks(topk, required_col="rank")
    rows = {"term": [], "n_ret": [], "n_rel": [], "prec_bp": [], "mrr_fp": []}
    if blocks:
        merged = pa.concat_tables(blocks)
        tcol = np.asarray(merged.column("term").to_pylist())
        rel = merged.column("rel").to_numpy(zero_copy_only=False)
        rank = merged.column("rank").to_numpy(zero_copy_only=False)
        for term in sorted(set(tcol.tolist())):
            m = tcol == term
            n_ret = int(m.sum())
            n_rel = int(rel[m].sum())
            rel_ranks = rank[m][rel[m] == 1]
            rows["term"].append(term)
            rows["n_ret"].append(n_ret)
            rows["n_rel"].append(n_rel)
            rows["prec_bp"].append(n_rel * 10000 // n_ret)
            rows["mrr_fp"].append(
                1_000_000 // int(rel_ranks.min()) if len(rel_ranks) else 0
            )
    return pa.table(
        {
            "term": pa.array(rows["term"], pa.string()),
            "n_ret": pa.array(rows["n_ret"], pa.int64()),
            "n_rel": pa.array(rows["n_rel"], pa.int64()),
            "prec_bp": pa.array(rows["prec_bp"], pa.int64()),
            "mrr_fp": pa.array(rows["mrr_fp"], pa.int64()),
        }
    )


def terms_set_search(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    req_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """ES ``terms_set`` query: a doc matches when at least ``req_col``
    (the per-document ``minimum_should_match_field``) of the DISTINCT
    query ``terms`` appear in its token set — exact whole-token
    membership, unlike bool_search's substring clauses.  Output
    ``(id, n_matched, required)`` for matching docs.

    One vectorized pass: the text splits once
    (``split_pattern_regex``), then one flattened equality + reduceat
    per query term (terms lists are user-query sized, single digits);
    distinctness is structural — each term contributes 0/1 per doc.
    No shuffle."""
    import numpy as np
    import pyarrow.compute as pc

    uniq = sorted(set(terms))
    out_schema = {
        id_col: pa.int64(),
        "n_matched": pa.int64(),
        "required": pa.int64(),
    }

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([], v) for k, v in out_schema.items()})
        text = pc.fill_null(t.column(text_col), "")
        toks = pc.split_pattern_regex(text, pattern=r"[\t\n\x0b\x0c\r ]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = (
            pc.list_value_length(toks)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        n_matched = np.zeros(len(lens), np.int64)
        for term in uniq:
            hit = (
                pc.equal(flat, term)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            if len(hit):
                per_doc = np.add.reduceat(hit, starts)
                per_doc = np.where(lens > 0, per_doc, 0)
            else:
                per_doc = np.zeros(len(lens), np.int64)
            n_matched += (per_doc > 0).astype(np.int64)
        req = (
            pc.fill_null(t.column(req_col), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = n_matched >= req
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()).filter(pa.array(keep)),
                "n_matched": pa.array(n_matched[keep], pa.int64()),
                "required": pa.array(req[keep], pa.int64()),
            }
        )

    return ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def ltr_features(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Learning-to-rank feature extraction (the ES LTR-plugin artifact):
    one row per (query term, matching doc) with the features a ranking
    model trains on — tf, doc length, matched-term count, and
    fixed-point idf / BM25 (k1=1.2, b=0.75; constants pre-folded to the
    LITERALS 2.2 / 0.3 / 0.9 so both engines evaluate the identical
    double expression — the unigram_nll/tfidf_nano reproducibility
    device).  Output (id, token, tf, dl, n_matched, idf_nano,
    bm25_nano).

    Shape at scale: ONE tokenize pass emits only matched (id, token,
    tf, dl, n_matched) rows (selectivity-sized — df per term is their
    per-token row count, a query-sized driver reduce); corpus stats
    (n_docs, total_tokens) come from a cheap vectorized
    count_substring_regex scan, no second tokenize.  Scoring is a
    stateless vectorized pass; nothing corpus-sized shuffles.
    ``bm25_nano = floor(1e9 * ln((n_docs - df + 0.5) / (df + 0.5))
    * (tf * 2.2) / (tf + 0.3 + 0.9 * dl * n_docs / total_tokens))``.
    """
    import pyarrow.compute as pc

    from engine.stages.common import collect_arrow_blocks

    term_set = sorted(set(terms))
    mid_schema = {
        id_col: pa.int64(),
        "token": pa.string(),
        "tf": pa.int64(),
        "dl": pa.int64(),
        "n_matched": pa.int64(),
    }
    out_schema = dict(mid_schema)
    out_schema.update({"idf_nano": pa.int64(), "bm25_nano": pa.int64()})

    def match_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([], v) for k, v in mid_schema.items()})
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        cols = {k: [] for k in mid_schema}
        for i, txt in enumerate(texts):
            toks = _TOKEN.findall(txt or "")
            cnt = Counter(toks)
            hits = [(tok, cnt[tok]) for tok in term_set if tok in cnt]
            if not hits:
                continue
            for tok, c in hits:
                cols[id_col].append(int(ids[i]))
                cols["token"].append(tok)
                cols["tf"].append(c)
                cols["dl"].append(len(toks))
                cols["n_matched"].append(len(hits))
        return pa.table(
            {k: pa.array(v, typ) for (k, typ), v in
             zip(mid_schema.items(), cols.values())}
        )

    rows = ds.map_batches(
        match_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # selectivity-sized; reused for df reduce + scoring

    # query-sized df reduce: one row per (doc, term) -> df = rows per term
    df_blocks = collect_arrow_blocks(
        rows.map_batches(
            lambda t: t.select(["token"]).group_by("token").aggregate([("token", "count")]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        required_col="token",
    )
    df: dict = {}
    for blk in df_blocks:
        for tok, c in zip(
            blk.column("token").to_pylist(), blk.column("token_count").to_pylist()
        ):
            df[tok] = df.get(tok, 0) + int(c)

    # corpus stats: vectorized token-count scan (no second tokenize)
    def stats(t: pa.Table) -> pa.Table:
        ntok = pc.count_substring_regex(
            pc.fill_null(t.column(text_col), ""), pattern=_TOKEN.pattern
        )
        s = pc.sum(ntok).as_py() or 0
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "total_tokens": pa.array([int(s)], pa.int64()),
            }
        )

    st_blocks = collect_arrow_blocks(
        ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True),
        required_col="n_docs",
    )
    n_docs = sum(int(b.column("n_docs")[0].as_py()) for b in st_blocks)
    total_tokens = sum(
        int(b.column("total_tokens")[0].as_py()) for b in st_blocks
    )
    if n_docs == 0 or total_tokens == 0 or not df:
        return ray.data.from_arrow(
            pa.table({k: pa.array([], v) for k, v in out_schema.items()})
        )
    import math

    idf_map = {
        tok: math.log((n_docs - d + 0.5) / (d + 0.5)) for tok, d in df.items()
    }
    score_ref = ray.put((idf_map, n_docs, total_tokens))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([], v) for k, v in out_schema.items()})
        imap, nd, tt = ray.get(score_ref)
        idf = np.array(
            [imap[tok] for tok in t.column("token").to_pylist()], np.float64
        )
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        # (dl * n_docs) exact in int64 BEFORE the float division — mirrors
        # DuckDB's BIGINT multiply + float '/' evaluation order
        norm = (dl * nd).astype(np.float64) / float(tt)
        bm25 = 1000000000.0 * idf * (tf * 2.2) / (tf + 0.3 + 0.9 * norm)
        return pa.table(
            {
                id_col: t.column(id_col),
                "token": t.column("token"),
                "tf": t.column("tf"),
                "dl": t.column("dl"),
                "n_matched": t.column("n_matched"),
                "idf_nano": pa.array(
                    np.floor(1000000000.0 * idf).astype(np.int64), pa.int64()
                ),
                "bm25_nano": pa.array(
                    np.floor(bm25).astype(np.int64), pa.int64()
                ),
            }
        )

    return rows.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dis_max(
    ds: ray.data.Dataset,
    terms,
    *,
    tie_milli: int = 300,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> ray.data.Dataset:
    """ES ``dis_max`` query — best-field discipline: each term is a
    sub-query scored as its integer tf over the document; the document
    score is ``max(tf)`` plus ``tie_breaker`` times the REST, here in
    exact milli-units: ``score_milli = 1000*max_tf + tie_milli*(sum_tf -
    max_tf)`` (ES's tie_breaker in [0,1] as an integer, so both engines
    evaluate identical int64 algebra).  Complements ``multi_match``
    (sum-discipline with field boosts) — together they cover ES's two
    multi-query score disciplines.

    Shape: ONE tokenize pass per batch, one Arrow ``equal`` + bincount
    per term over the same flattened token stream (terms is
    query-sized), then the global_topk candidate merge.  No shuffle of
    text.
    """
    terms = list(terms)
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "max_tf": pa.array([], pa.int64()),
            "sum_tf": pa.array([], pa.int64()),
            "score_milli": pa.array([], pa.int64()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        tf = np.zeros((len(lens), len(terms)), np.int64)
        for j, term in enumerate(terms):
            hit = np.asarray(
                pc.equal(flat, term).to_numpy(zero_copy_only=False), bool
            )
            if hit.any():
                tf[:, j] = np.bincount(doc_of[hit], minlength=len(lens))
        sum_tf = tf.sum(axis=1)
        keep = sum_tf > 0
        if not keep.any():
            return empty
        max_tf = tf[keep].max(axis=1)
        sum_k = sum_tf[keep]
        score = 1000 * max_tf + tie_milli * (sum_k - max_tf)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "max_tf": pa.array(max_tf, pa.int64()),
                "sum_tf": pa.array(sum_k, pa.int64()),
                "score_milli": pa.array(score, pa.int64()),
            }
        )

    from engine.stages.topk import global_topk

    scored = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return global_topk(
        scored,
        order_cols=["score_milli", id_col],
        descending=[True, False],
        k=k,
    )


PRF_K_FB = 10
PRF_N_TERMS = 10


def prf_expansion(
    ds: ray.data.Dataset,
    terms: Sequence[str] = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_fb: int = PRF_K_FB,
    n_terms: int = PRF_N_TERMS,
) -> pa.Table:
    """Pseudo-relevance-feedback query expansion (Rocchio / RM1 with
    integer tf weights — Lucene's MoreLikeThis-style feedback loop on the
    ES side): retrieve the top ``k_fb`` docs for ``terms`` by BM25, then
    rank every term occurring in that feedback set by its summed term
    frequency (tf_sum desc, term asc), excluding the original query
    terms, and return the first ``n_terms`` as (term, fb_df, tf_sum).

    Scale shape: the feedback id set is k-sized (driver-trivial) and
    broadcasts via ray.put; the expansion pass is ONE tokenize
    map_batches over the corpus that Counter-aggregates ONLY rows whose
    id is in the set (a task FUNCTION, not an actor — the setup is just a
    broadcast get), so the shuffle-free partials total (feedback vocab x
    blocks) tiny rows merged on the driver.  Integer-only output — fully
    hash-verifiable."""
    from collections import Counter as _Counter

    if terms is None:
        terms = BM25_TERMS
    terms = list(terms)
    top = bm25_topk(ds, terms, id_col=id_col, text_col=text_col, k=k_fb)
    fb_ids = frozenset(top.column(id_col).to_pylist())
    if not fb_ids:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "fb_df": pa.array([], pa.int64()),
                "tf_sum": pa.array([], pa.int64()),
            }
        )
    fbref = ray.put(fb_ids)
    qset = frozenset(terms)

    def partials(t: pa.Table) -> pa.Table:
        fb = ray.get(fbref)
        tf: _Counter = _Counter()
        df: _Counter = _Counter()
        for i, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            if i not in fb:
                continue
            cnt = _Counter(_TOKEN.findall(txt or ""))
            tf.update(cnt)
            df.update(cnt.keys())
        toks = [tok for tok in tf if tok not in qset]
        return pa.table(
            {
                "term": pa.array(toks, pa.string()),
                "fb_df": pa.array([df[tok] for tok in toks], pa.int64()),
                "tf_sum": pa.array([tf[tok] for tok in toks], pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True),
        required_col="term",
    )
    tf_acc: dict = {}
    for tab in blocks:
        for term, fdf, ts in zip(
            tab.column("term").to_pylist(), tab.column("fb_df").to_pylist(),
            tab.column("tf_sum").to_pylist(),
        ):
            a = tf_acc.get(term)
            if a is None:
                tf_acc[term] = [fdf, ts]
            else:
                a[0] += fdf
                a[1] += ts
    ordered = sorted(tf_acc.items(), key=lambda kv: (-kv[1][1], kv[0]))[:n_terms]
    return pa.table(
        {
            "term": pa.array([t_ for t_, _ in ordered], pa.string()),
            "fb_df": pa.array([v[0] for _, v in ordered], pa.int64()),
            "tf_sum": pa.array([v[1] for _, v in ordered], pa.int64()),
        }
    )


def wand_topk(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    chunk: int = 256,
    return_stats: bool = False,
):
    """Block-max WAND / MaxScore-style PRUNED BM25 top-k — identical
    output to ``bm25_topk`` (same sparse pass, same exact per-doc
    accumulation, same merge order), but each block scores its candidate
    docs in UPPER-BOUND order and stops as soon as the remaining bound
    cannot beat the running k-th best, so the expensive exact-order
    accumulation runs on a fraction of the candidates (the essential skip
    of Broder et al.'s WAND / Ding & Suel's block-max variant).

    The per-doc bound is the fast vectorized sum of the per-hit BM25
    components inflated by a rounding cover (components are nonnegative,
    so any summation order is within ``n*eps`` relative error of the
    exact left-to-right sum — the inflation makes the bound sound), and
    pruning compares STRICTLY below the k-th best score, so score ties
    (which the merge breaks by id) are never pruned.  With
    ``return_stats=True`` also returns {'n_candidates', 'n_scored'}.
    """
    import heapq

    terms = list(terms)
    m = len(terms)
    tf_ds, N, sum_dl, dfs = _sparse_tf_pass(ds, terms, id_col, text_col)
    empty = pa.table(
        {"rank": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
    )
    if N == 0:
        return (empty, {"n_candidates": 0, "n_scored": 0}) if return_stats else empty
    avgdl = float(sum_dl) / N
    idfs = np.array(
        [math.log(1 + (N - int(dfs[j]) + 0.5) / (int(dfs[j]) + 0.5)) for j in range(m)],
        dtype=np.float64,
    )

    def wscore(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.equal(t.column("kind"), 0))
        blk_empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "n_cand": pa.array([], pa.int64()),
                "n_scored": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return blk_empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        counts = (
            pa.compute.list_value_length(t.column("tids"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tid = pa.compute.list_flatten(t.column("tids")).to_numpy(zero_copy_only=False)
        tf = (
            pa.compute.list_flatten(t.column("tfs"))
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        offs = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        dl_rep = np.repeat(dl, counts)
        comp = (idfs[tid] * tf * (k1 + 1.0)) / (
            tf + k1 * (1 - b + b * (dl_rep / avgdl))
        )
        # sound upper bound of the exact left-to-right sum: fast sum of
        # NONNEGATIVE addends x rounding cover (rel err <= n*eps any order)
        ub = np.add.reduceat(comp, offs[:-1])
        ub *= 1.0 + 1e-12 * float(counts.max() + 2)
        order = np.argsort(-ub, kind="stable")
        heap: list = []  # min-heap of exact scores, size <= k
        out_ids, out_s = [], []
        n_scored = 0
        pos = 0
        n = len(ids)
        while pos < n:
            # all remaining bounds are <= ub[order[pos]]; STRICT compare so
            # score ties (id-broken in the merge) are never pruned
            if len(heap) >= k and ub[order[pos]] < heap[0]:
                break
            hi = min(pos + chunk, n)
            for oi in order[pos:hi]:
                if len(heap) >= k and ub[oi] < heap[0]:
                    continue  # within-chunk tail already under threshold
                acc = 0.0
                for v in comp[offs[oi] : offs[oi + 1]]:
                    acc += v
                n_scored += 1
                if acc <= 0:
                    continue
                out_ids.append(int(ids[oi]))
                out_s.append(acc)
                if len(heap) < k:
                    heapq.heappush(heap, acc)
                elif acc > heap[0]:
                    heapq.heapreplace(heap, acc)
            pos = hi
        ids_k = np.asarray(out_ids, dtype=np.int64)
        s_k = np.asarray(out_s, dtype=np.float64)
        if len(ids_k) > k:
            sel = np.lexsort((ids_k, -s_k))[:k]
            ids_k = ids_k[sel]
            s_k = s_k[sel]
        nr = len(ids_k)
        return pa.table(
            {
                id_col: pa.array(ids_k, pa.int64()),
                "score": pa.array(s_k, pa.float64()),
                "n_cand": pa.array(np.full(nr, n, dtype=np.int64), pa.int64()),
                "n_scored": pa.array(
                    np.full(nr, n_scored, dtype=np.int64), pa.int64()
                ),
            }
        )

    scored = tf_ds.map_batches(wscore, batch_format="pyarrow", zero_copy_batch=True)
    from engine.stages.common import collect_arrow_blocks

    cand = collect_arrow_blocks(scored, required_col="score")
    if not cand:
        return (empty, {"n_candidates": 0, "n_scored": 0}) if return_stats else empty
    stats = {
        "n_candidates": sum(int(c.column("n_cand")[0].as_py()) for c in cand),
        "n_scored": sum(int(c.column("n_scored")[0].as_py()) for c in cand),
    }
    allc = pa.concat_tables(cand, promote_options="default")
    a_ids = allc.column(id_col).to_numpy(zero_copy_only=False)
    a_s = allc.column("score").to_numpy(zero_copy_only=False)
    order = np.lexsort((a_ids, -a_s))[:k]
    res = pa.table(
        {
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
            id_col: pa.array(a_ids[order], pa.int64()),
        }
    )
    return (res, stats) if return_stats else res


def boosting_search(
    ds: ray.data.Dataset,
    positive,
    negative,
    *,
    neg_milli: int = 300,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> ray.data.Dataset:
    """ES ``boosting`` query — positive matches scored normally, documents
    that ALSO match the negative sub-query are demoted (not excluded) by
    ``negative_boost``: here in exact milli-units, ``base_milli =
    1000 * sum(tf over positive terms)``; if any negative term occurs the
    score becomes ``floor(base_milli * neg_milli / 1000)`` (ES's
    negative_boost in [0,1] as an integer — identical int64 algebra both
    engines).  Emits ``(id, pos_tf, demoted, score_milli, rank)`` for the
    top ``k``; docs with no positive hit do not match (ES semantics).

    Shape: ONE tokenize pass per batch, one Arrow ``equal`` + bincount
    per positive term and one ``is_in`` over the negative set, then the
    ``global_topk`` candidate merge — no shuffle of text.
    """
    positive = list(positive)
    negative = list(negative)
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "pos_tf": pa.array([], pa.int64()),
            "demoted": pa.array([], pa.int64()),
            "score_milli": pa.array([], pa.int64()),
        }
    )

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos_tf = np.zeros(len(lens), np.int64)
        for term in positive:
            hit = np.asarray(
                pc.equal(flat, term).to_numpy(zero_copy_only=False), bool
            )
            if hit.any():
                pos_tf += np.bincount(doc_of[hit], minlength=len(lens))
        nhit = np.asarray(
            pc.is_in(flat, value_set=pa.array(negative, pa.string())).to_numpy(
                zero_copy_only=False
            ),
            bool,
        )
        demoted = np.zeros(len(lens), bool)
        if nhit.any():
            demoted = np.bincount(doc_of[nhit], minlength=len(lens)) > 0
        keep = pos_tf > 0
        if not keep.any():
            return empty
        base = 1000 * pos_tf[keep]
        dem = demoted[keep]
        score = np.where(dem, base * neg_milli // 1000, base)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "pos_tf": pa.array(pos_tf[keep], pa.int64()),
                "demoted": pa.array(dem.astype(np.int64), pa.int64()),
                "score_milli": pa.array(score, pa.int64()),
            }
        )

    from engine.stages.topk import global_topk

    scored = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return global_topk(
        scored,
        order_cols=["score_milli", id_col],
        descending=[True, False],
        k=k,
        rank_col="rank",
    )


def rrf_fuse(
    rankings,
    *,
    id_col: str = "doc_id",
    rank_const: int = 60,
    k: int = 20,
) -> ray.data.Dataset:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009;
    ES's ``rrf`` retriever): combine N ranked candidate lists into one
    ranking by ``score(d) = sum over lists of 1/(rank_const + rank_d)``
    — the standard hybrid-search merge (BM25 x vector, relevance x
    prior) that needs no score calibration, only ranks.  Exact integers:
    each contribution is ``1_000_000 // (rank_const + rank)`` micro-units
    (identical int64 algebra in the oracle).  Output ``(id, rrf_micro,
    n_lists, rank)`` for the top ``k``; only retrieved candidates
    contribute (ES semantics — no corpus-wide default).

    Shape: each input list is already top-k-sized; one union + ONE
    groupby Sum/Count + the global_topk candidate merge.  Nothing
    corpus-sized moves.
    """
    from engine.stages.topk import global_topk
    from ray.data.aggregate import Sum

    parts = []
    for r in rankings:
        parts.append(
            r.map_batches(
                lambda t: pa.table(
                    {
                        id_col: t.column(id_col).cast(pa.int64()),
                        "m": pa.compute.cast(
                            pa.compute.divide(
                                pa.scalar(1_000_000, pa.int64()),
                                pa.compute.add(
                                    t.column("rank").cast(pa.int64()),
                                    pa.scalar(rank_const, pa.int64()),
                                ),
                            ),
                            pa.int64(),
                        ),
                        "one": pa.array([1] * t.num_rows, pa.int64()),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    fused = (
        u.groupby(id_col)
        .aggregate(Sum("m", alias_name="rrf_micro"), Sum("one", alias_name="n_lists"))
        .map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    "rrf_micro": t.column("rrf_micro").cast(pa.int64()),
                    "n_lists": t.column("n_lists").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return global_topk(
        fused,
        order_cols=["rrf_micro", id_col],
        descending=[True, False],
        k=k,
        rank_col="rank",
    )


def geo_distance(
    ds: ray.data.Dataset,
    *,
    center_lat_u: int,
    center_lon_u: int,
    radius_u: int,
    id_col: str = "doc_id",
    lat_col: str = "lat_u",
    lon_col: str = "lon_u",
    k: int = 50,
) -> ray.data.Dataset:
    """ES ``geo_distance`` query over integer MICRODEGREE coordinates:
    documents within ``radius_u`` of a center, nearest-first top ``k``.
    Distance is the equirectangular (flat-earth) squared metric in
    microdegrees — ``d2 = dlat^2 + dlon^2`` — kept as EXACT int64 (a
    haversine float would not be bit-reproducible; at city-scale radii
    the ranking is the same, documented deviation).  Output ``(id, d2,
    rank)``.

    The classic two-phase geo scan: a vectorized BOUNDING-BOX prefilter
    (two compares per axis — at 100 TB this is the predicate pushed into
    the parquet row-group zone maps, same device as ``zone_prune``)
    drops everything except the disc's bbox, then the exact d2 circle
    test runs only on bbox survivors; per-block partial top-k merges via
    ``global_topk``.  One pass, no shuffle.
    """
    import pyarrow.compute as pc

    from engine.stages.topk import global_topk

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
        }
    )

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        lat = t.column(lat_col)
        lon = t.column(lon_col)
        # bbox prefilter: cheap compares, prunes before any arithmetic
        box = pc.and_(
            pc.and_(
                pc.greater_equal(lat, center_lat_u - radius_u),
                pc.less_equal(lat, center_lat_u + radius_u),
            ),
            pc.and_(
                pc.greater_equal(lon, center_lon_u - radius_u),
                pc.less_equal(lon, center_lon_u + radius_u),
            ),
        )
        t = t.filter(box)
        if t.num_rows == 0:
            return empty
        dlat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        ) - center_lat_u
        dlon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        ) - center_lon_u
        d2 = dlat * dlat + dlon * dlon
        keep = d2 <= radius_u * radius_u
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "d2": pa.array(d2[keep], pa.int64()),
            }
        )

    scored = ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
    return global_topk(
        scored,
        order_cols=["d2", id_col],
        descending=[False, False],
        k=k,
        rank_col="rank",
    )
