"""Inverted-index construction primitives.

The reference pipeline's terminal store is Elasticsearch, whose value is
the inverted index it builds from the documents it receives
(`/root/reference/warc_indexer/es_sink.py` hands documents to ES and the
index construction happens server-side).  These operators materialize the
same index artifacts Ray-Data-first, so the "index" half of the engine is
inspectable and testable without an ES cluster:

``term_stats``
    The term dictionary: per token, document frequency (df) and collection
    frequency (cf) — the statistics every BM25/idf computation needs.
    One tokenize pass; each batch pre-aggregates its own Counter partials
    so the shuffle moves (token, df_partial, cf_partial) rows — never
    positions, never text.  A final groupby(token).Sum + sort(cf desc) +
    limit(top_n) yields the head of the dictionary.  At 100 TB the
    intermediate is bounded by (distinct tokens per block × blocks) rows of
    ~24 bytes; the groupby is the only shuffle.

``postings``
    The postings lists for a fixed term set: (token, doc_id, tf) rows,
    globally sorted by (token, doc_id) — exactly the structure a search
    index stores per term.  Same single tokenize pass; only matching docs
    emit rows, so output scales with selectivity, not corpus size.

Both are integer-only and SQL-expressible, hence driver hash-verified
(queries ``term_stats`` / ``postings``).
"""

from __future__ import annotations

from collections import Counter
from typing import List, Sequence

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from engine.stages.text import _TOKEN


def term_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 200,
) -> ray.data.Dataset:
    """Term dictionary head: (token, df, cf) for the ``top_n`` tokens by
    (cf desc, token asc).  df counts documents containing the token, cf
    counts total occurrences."""

    def partials(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        df: Counter = Counter()
        cf: Counter = Counter()
        for txt in texts:
            cnt = Counter(_TOKEN.findall(txt or ""))
            cf.update(cnt)
            df.update(cnt.keys())
        toks = list(cf.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df": pa.array([df[tok] for tok in toks], pa.int64()),
                "cf": pa.array([cf[tok] for tok in toks], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )

    _KEYS = [("cf", "descending"), ("token", "ascending")]

    def head_partial(t: pa.Table) -> pa.Table:
        # per-block partial top-n by the SAME total order the driver merge
        # uses (cf desc, token asc); the groupby puts each token in exactly
        # one block, so per-block winners are a superset of the global head
        # — no vocab-wide AllToAll sort needed (ann._PartialTopK pattern).
        t = t.select(["token", "df", "cf"])
        if t.num_rows <= top_n:
            return t
        import pyarrow.compute as pc

        return t.take(pc.sort_indices(t, sort_keys=_KEYS)[:top_n])

    from engine.stages.common import collect_arrow_blocks

    cand = collect_arrow_blocks(
        agg.map_batches(
            head_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="token",
    )
    if not cand:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "cf": pa.array([], pa.int64()),
            }
        )
        return ray.data.from_arrow(empty)
    import pyarrow.compute as pc

    allc = pa.concat_tables(cand, promote_options="default")
    head = allc.take(pc.sort_indices(allc, sort_keys=_KEYS)[:top_n])
    return ray.data.from_arrow(head)


def postings(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Postings lists for ``terms``: (token, doc_id, tf) sorted by
    (token, doc_id).  Only documents containing a term emit rows."""
    term_set = frozenset(terms)

    def extract(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        out_tok: List[str] = []
        out_id: List[int] = []
        out_tf: List[int] = []
        for i, txt in enumerate(texts):
            cnt = Counter(_TOKEN.findall(txt or ""))
            # iterate the smaller side (same device as search.tf_extract)
            if len(term_set) <= len(cnt):
                hits = [(tok, cnt[tok]) for tok in term_set if tok in cnt]
            else:
                hits = [(tok, c) for tok, c in cnt.items() if tok in term_set]
            for tok, c in hits:
                out_tok.append(tok)
                out_id.append(ids[i])
                out_tf.append(c)
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    return ds.map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    ).sort(key=["token", id_col])


def tfidf_topk(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 500,
    top_m: int = 5,
) -> ray.data.Dataset:
    """Sparse tf-idf document vectors: for each doc, its ``top_m`` terms
    by tf-idf over a frequency-capped vocabulary — (id, token, tf,
    tfidf_nano), the sklearn ``max_features`` construction.

    ``tfidf_nano = floor(1e9 * tf * ln(n_docs / df))`` — the fixed-point
    quantization lm.py's unigram_nll proved hash-reproducible against
    DuckDB's ``ln`` (same libm doubles on both sides), so the whole vector
    set is SQL-verifiable including the scores.  Ties rank (tfidf_nano
    desc, token asc), matching the oracle's ROW_NUMBER order exactly.

    Shape at scale: one (token, df, cf) partial-count shuffle (term_stats)
    caps the vocabulary at ``vocab_size`` on the driver; the df map
    broadcasts once via ``ray.put`` and scoring is a stateless second
    pass — no per-doc shuffle, output ≤ top_m rows per doc.
    """
    import math

    vocab_t = _as_table(term_stats(ds, id_col=id_col, text_col=text_col,
                                   top_n=vocab_size))
    n_docs = ds.count()
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "tfidf_nano": pa.array([], pa.int64()),
        }
    )
    if n_docs == 0 or vocab_t.num_rows == 0:
        return ray.data.from_arrow(empty)
    # idf precomputed per vocab term (vocab-sized dict, shipped once)
    idf = {
        tok: math.log(float(n_docs) / float(df))
        for tok, df in zip(
            vocab_t.column("token").to_pylist(),
            vocab_t.column("df").to_pylist(),
        )
    }
    idf_ref = ray.put(idf)

    def score(t: pa.Table, ref=idf_ref) -> pa.Table:
        idf_map = ray.get(ref)
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        out_id: List[int] = []
        out_tok: List[str] = []
        out_tf: List[int] = []
        out_sc: List[int] = []
        for i, txt in enumerate(texts):
            cnt = Counter(_TOKEN.findall(txt or ""))
            scored = [
                # eval order matches the oracle: (1e9 * tf) * ln(...)
                (math.floor(1e9 * c * idf_map[tok]), tok, c)
                for tok, c in cnt.items()
                if tok in idf_map
            ]
            scored.sort(key=lambda s: (-s[0], s[1]))
            for sc, tok, c in scored[:top_m]:
                out_id.append(ids[i])
                out_tok.append(tok)
                out_tf.append(c)
                out_sc.append(sc)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "token": pa.array(out_tok, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "tfidf_nano": pa.array(out_sc, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _as_table(ds_or_table) -> pa.Table:
    """Driver-side Arrow table from a (small) Dataset or Table."""
    if isinstance(ds_or_table, pa.Table):
        return ds_or_table
    blocks = [
        t
        for t in ray.get(ds_or_table.to_arrow_refs())
        if isinstance(t, pa.Table) and t.num_rows
    ]
    if not blocks:
        return pa.table({"token": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64()),
                         "cf": pa.array([], pa.int64())})
    return pa.concat_tables(blocks, promote_options="default")


def positional_postings(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Positional postings for ``terms``: ``(token, id, tf, positions)``
    with 1-based token positions as a comma-joined string (hash-stable
    across engines; the list form is trivially derivable).  The position
    payload is what lets an index serve phrase queries without touching
    text again — the ES ``index_options: positions`` analog of the plain
    ``postings`` above.

    Per batch the kernel is vectorized over the flattened token stream
    (one Arrow ``equal`` per term; hit -> doc via the repeat/offsets
    device; per-doc position lists by np.split on doc boundaries) — no
    per-doc Python beyond tokenization.  Sorted (token, id) like
    ``postings``."""
    import numpy as np

    term_list = list(terms)
    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "positions": pa.array([], pa.string()),
        }
    )

    def extract(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

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
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        out_tok: List[str] = []
        out_id: List[int] = []
        out_tf: List[int] = []
        out_pos: List[str] = []
        for w in term_list:
            hit = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(hit)
            if len(idx) == 0:
                continue
            docs = doc_of[idx]
            pos = idx - starts[docs] + 1
            cut = np.flatnonzero(docs[1:] != docs[:-1]) + 1
            for d, plist in zip(
                docs[np.concatenate(([0], cut))], np.split(pos, cut)
            ):
                out_tok.append(w)
                out_id.append(int(ids[d]))
                out_tf.append(len(plist))
                out_pos.append(",".join(map(str, plist)))
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
                "tf": pa.array(out_tf, pa.int64()),
                "positions": pa.array(out_pos, pa.string()),
            }
        )

    return ds.map_batches(
        extract, batch_format="pyarrow", zero_copy_batch=True
    ).sort(key=["token", id_col])


def phrase_from_index(
    ds: ray.data.Dataset,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Phrase query answered the way a POSITIONAL INDEX answers it — the
    Lucene/ES algorithm (intersect per-doc position lists of the phrase
    words, shifted by word offset) rather than search.phrase_search's
    direct text scan.  Output is the SAME contract: ``(id, first_pos,
    phrase_count)``, overlapping occurrences, 1-based; a conformance test
    pins both paths identical.

    Shape: ONE tokenize pass emits ``(id, p, j)`` rows — word ``j`` of
    the phrase occurs at position ``p + j`` — so a phrase occurrence at
    ``p`` is exactly a ``(id, p)`` group with all ``k`` word-slots
    present.  Rows shuffle ONCE by a coarse hash bucket of ``(id, p)``
    (corpus-sized key -> bucketed vectorized reduce, the PERF.md #31/#37
    device: lexsort + run-length inside the bucket, no per-group Python),
    then phrase starts reduce per doc by a second coarse bucket on
    ``id``.  Only integer triples ever move — never text, never
    positions lists."""
    import numpy as np

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

    nb = n_buckets or max(
        4, int(ray.cluster_resources().get("CPU", 8))
    )

    def emit(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = t.column(text_col).to_pylist()
        ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "p": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        o_id: List[np.ndarray] = []
        o_p: List[np.ndarray] = []
        o_j: List[np.ndarray] = []
        for j, w in enumerate(words):
            idx = np.flatnonzero(pc.equal(flat, w).to_numpy(zero_copy_only=False))
            if len(idx) == 0:
                continue
            docs = doc_of[idx]
            p = (idx - starts[docs] + 1) - j  # phrase-start candidate
            keep = p >= 1
            o_id.append(ids[docs[keep]])
            o_p.append(p[keep])
            o_j.append(np.full(int(keep.sum()), j, np.int64))
        if not o_id:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "p": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        ai = np.concatenate(o_id)
        ap = np.concatenate(o_p)
        return pa.table(
            {
                id_col: pa.array(ai, pa.int64()),
                "p": pa.array(ap, pa.int64()),
                "j": pa.array(np.concatenate(o_j), pa.int64()),
                "bucket": pa.array(
                    ((ai * 1_000_003 + ap) % nb + nb) % nb, pa.int64()
                ),
            }
        )

    slots = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)

    def starts_in_bucket(g: pa.Table) -> pa.Table:
        import numpy as np

        i = g.column(id_col).to_numpy(zero_copy_only=False)
        p = g.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, i))
        i, p = i[order], p[order]
        new = np.ones(len(i), bool)
        new[1:] = (i[1:] != i[:-1]) | (p[1:] != p[:-1])
        grp = np.cumsum(new) - 1
        cnt = np.bincount(grp)
        # distinct j per (id, p) is len of run IFF no duplicate (id,p,j)
        # rows exist — true by construction (a word occupies one slot)
        full = cnt == k
        firsts = np.flatnonzero(new)
        sel = firsts[full]
        return pa.table(
            {
                id_col: pa.array(i[sel], pa.int64()),
                "p": pa.array(p[sel], pa.int64()),
            }
        )

    found = slots.groupby("bucket").map_groups(
        starts_in_bucket, batch_format="pyarrow"
    )

    def doc_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "p": pa.array([], pa.int64()),
                    "dbucket": pa.array([], pa.int64()),
                }
            )
        i = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t.column(id_col),
                "p": t.column("p"),
                "dbucket": pa.array((i % nb + nb) % nb, pa.int64()),
            }
        )

    def per_doc(g: pa.Table) -> pa.Table:
        import numpy as np

        i = g.column(id_col).to_numpy(zero_copy_only=False)
        p = g.column("p").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, i))
        i, p = i[order], p[order]
        new = np.ones(len(i), bool)
        new[1:] = i[1:] != i[:-1]
        grp = np.cumsum(new) - 1
        cnt = np.bincount(grp)
        firsts = np.flatnonzero(new)
        return pa.table(
            {
                id_col: pa.array(i[firsts], pa.int64()),
                "first_pos": pa.array(p[firsts], pa.int64()),
                "phrase_count": pa.array(cnt, pa.int64()),
            }
        )

    out = (
        found.map_batches(doc_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dbucket")
        .map_groups(per_doc, batch_format="pyarrow")
    )

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "phrase_count" not in t.column_names:
            return empty
        return t.select([id_col, "first_pos", "phrase_count"])

    return out.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


def index_size_est(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Postings-list size estimate under delta + LEB128-varint coding —
    the back-of-envelope every search-cluster sizing exercise runs
    (Lucene's postings are delta+vint at heart): per term, the document
    frequency and the EXACT byte count of varint-coding the sorted
    doc-id gap sequence (first id absolute).  Integer arithmetic only.

    Shape: the ``postings`` pass (tf rows, text never shuffles) -> one
    (token, id) sort -> per-block run-aware gap bytes: block-local gaps
    vectorized via searchsorted on the varint thresholds, plus ONE
    boundary row per (block, token) carrying the block's first/last id so
    the driver stitches cross-block gaps exactly — O(terms x blocks)
    driver rows, not O(postings)."""
    import numpy as np

    plist = postings(ds, terms, id_col=id_col, text_col=text_col)
    # varint byte count of value v (v >= 0): 1 + floor(log128(max(v,1)))
    # (thresholds capped at 2^56 — int64 ids use at most 9 vint bytes)
    TH = np.array([1 << (7 * k) for k in range(1, 9)], np.int64)

    def vbytes(v: np.ndarray) -> np.ndarray:
        return 1 + np.searchsorted(TH, np.maximum(v, 0), side="right").astype(
            np.int64
        )

    def block_partial(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(toks)
        if n == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "in_bytes": pa.array([], pa.int64()),
                    "first_id": pa.array([], pa.int64()),
                    "last_id": pa.array([], pa.int64()),
                }
            )
        tok_arr = np.asarray(toks, dtype=object)
        new = np.ones(n, bool)
        new[1:] = tok_arr[1:] != tok_arr[:-1]
        grp = np.cumsum(new) - 1
        gaps = np.zeros(n, np.int64)
        gaps[1:] = ids[1:] - ids[:-1]
        gaps[new] = 0  # run-internal gaps only; boundaries stitched later
        gb = vbytes(gaps)
        gb[new] = 0
        sums = np.bincount(grp, weights=gb).astype(np.int64)
        cnts = np.bincount(grp).astype(np.int64)
        firsts = np.flatnonzero(new)
        lasts = np.concatenate((firsts[1:] - 1, [n - 1]))
        return pa.table(
            {
                "token": pa.array([toks[i] for i in firsts], pa.string()),
                "df": pa.array(cnts, pa.int64()),
                "in_bytes": pa.array(sums, pa.int64()),
                "first_id": pa.array(ids[firsts], pa.int64()),
                "last_id": pa.array(ids[lasts], pa.int64()),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        plist.map_batches(
            block_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ),
        required_col="in_bytes",
    )
    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "postings_bytes": pa.array([], pa.int64()),
        }
    )
    if not blocks:
        return empty
    import pyarrow.compute as pc

    allp = pa.concat_tables(blocks, promote_options="default")
    # stitch: per token, blocks arrive in (token, id)-sorted runs; order
    # rows by first_id within token and add cross-boundary gap bytes +
    # the absolute first id's bytes
    allp = allp.take(
        pc.sort_indices(
            allp,
            sort_keys=[("token", "ascending"), ("first_id", "ascending")],
        )
    )
    toks = allp.column("token").to_pylist()
    df = allp.column("df").to_numpy(zero_copy_only=False)
    ib = allp.column("in_bytes").to_numpy(zero_copy_only=False)
    fi = allp.column("first_id").to_numpy(zero_copy_only=False)
    li = allp.column("last_id").to_numpy(zero_copy_only=False)
    out_t: List[str] = []
    out_df: List[int] = []
    out_b: List[int] = []
    i = 0
    n = len(toks)
    while i < n:
        j = i
        total_df = 0
        total_b = 0
        prev_last = None
        while j < n and toks[j] == toks[i]:
            total_df += int(df[j])
            total_b += int(ib[j])
            if prev_last is None:
                total_b += int(vbytes(np.array([fi[j]], np.int64))[0])
            else:
                total_b += int(
                    vbytes(np.array([fi[j] - prev_last], np.int64))[0]
                )
            prev_last = int(li[j])
            j += 1
        out_t.append(toks[i])
        out_df.append(total_df)
        out_b.append(total_b)
        i = j
    return pa.table(
        {
            "token": pa.array(out_t, pa.string()),
            "df": pa.array(out_df, pa.int64()),
            "postings_bytes": pa.array(out_b, pa.int64()),
        }
    )


def stopword_list(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df_ppm: int = 500_000,
) -> ray.data.Dataset:
    """Corpus-driven stopword candidates: (token, df, df_ppm) for every
    token whose document frequency is at least ``min_df_ppm`` parts per
    million of the corpus (``df_ppm = floor(1e6 * df / n_docs)`` — the
    bit-reproducible fixed-point convention of text.quality_scores).

    The analyzer-side artifact ES derives implicitly (`common terms` /
    `cutoff_frequency`): the list a search stack feeds back into its
    analyzer as a stop filter.  Same shuffle shape as ``term_stats`` —
    per-batch Counter partials, one (token, df) groupby; the threshold
    filter runs post-aggregate so no sort and no driver funnel.
    """
    n_docs = ds.count()

    def partials(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        df: Counter = Counter()
        for txt in texts:
            df.update(set(_TOKEN.findall(txt or "")))
        toks = list(df.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df": pa.array([df[tok] for tok in toks], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )

    def threshold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "df_ppm": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "token" not in t.column_names or n_docs == 0:
            return empty
        import numpy as np
        import pyarrow.compute as pc

        df = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        ppm = np.floor(1_000_000.0 * df / float(n_docs)).astype(np.int64)
        keep = ppm >= min_df_ppm
        return pa.table(
            {
                "token": t.column("token").filter(pa.array(keep)),
                "df": pa.array(df[keep], pa.int64()),
                "df_ppm": pa.array(ppm[keep], pa.int64()),
            }
        )

    return agg.map_batches(
        threshold, batch_format="pyarrow", zero_copy_batch=True
    )


def rare_terms(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    rare_divisor: int = 10,
    limit: int = 50,
) -> ray.data.Dataset:
    """ES ``rare_terms`` bucket aggregation: the LONG-TAIL terms — those
    whose document frequency is at most ``n_docs // rare_divisor`` —
    ordered by (df asc, token asc), first ``limit`` buckets.

    ES's rare_terms takes an absolute ``max_doc_count``; this engine makes
    the cutoff corpus-relative (documented deviation) so the same query is
    meaningful at every scale factor.  ES approximates with a CuckooFilter
    to avoid materializing the tail; here the tail stays exact — the
    shuffle moves only (token, df_partial) rows (same shape as
    term_stats), the threshold filter runs post-aggregate inside each
    groupby output block, and only per-block partial heads (<= limit rows
    each, by the SAME total order as the final merge) reach the driver.
    """
    n_docs = ds.count()
    max_df = max(1, n_docs // rare_divisor)

    def partials(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        df: Counter = Counter()
        for txt in texts:
            df.update(set(_TOKEN.findall(txt or "")))
        toks = list(df.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df": pa.array([df[tok] for tok in toks], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )

    _KEYS = [("df", "ascending"), ("token", "ascending")]
    _EMPTY = pa.table(
        {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
    )

    def tail_partial(t: pa.Table) -> pa.Table:
        # groupby puts each token in exactly one block, so per-block
        # (df asc, token asc) heads of the filtered tail are a superset of
        # the global head — no vocab-wide AllToAll sort (term_stats
        # pattern).
        if t.num_rows == 0 or "token" not in t.column_names:
            return _EMPTY
        import pyarrow.compute as pc

        t = t.select(["token", "df"]).filter(
            pc.less_equal(t.column("df"), max_df)
        )
        if t.num_rows <= limit:
            return t
        return t.take(pc.sort_indices(t, sort_keys=_KEYS)[:limit])

    from engine.stages.common import collect_arrow_blocks

    cand = collect_arrow_blocks(
        agg.map_batches(
            tail_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="token",
    )
    if not cand:
        return ray.data.from_arrow(_EMPTY)
    import pyarrow.compute as pc

    allc = pa.concat_tables(cand, promote_options="default")
    head = allc.take(pc.sort_indices(allc, sort_keys=_KEYS)[:limit])
    return ray.data.from_arrow(head)
