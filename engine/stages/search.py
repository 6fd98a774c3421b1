"""Distributed BM25 top-k retrieval.

The reference pipeline's target store is Elasticsearch, whose relevance
function is Lucene BM25 (public: Robertson & Zaragoza 2009; Lucene's
idf = ln(1 + (N - df + 0.5)/(df + 0.5))).  This operator reproduces that
scoring Ray-Data-first, so a reference user can run the same
"index then search" flow without the ES cluster:

1. ONE tokenize pass materializes the tiny per-doc term-frequency table
   (doc_id, dl, tf per query term — never the text).
2. Corpus statistics (N, sum dl, df per term) are per-block partial sums
   collected to the driver (one tiny row per block).
3. A scoring pass over the tf table (broadcast constants), then a
   distributed sort by (score desc, id asc) + limit(k).

Output is RANK-ONLY (rank, doc_id): float scores are not bit-stable
across engines (ln ULP), but the ordering is — same device as the
SQL-green ann_topk.  Ties break by doc_id ascending, deterministic.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute  # noqa: F401 — pa.compute used below
import ray
import ray.data

from engine.stages.text import _TOKEN


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

    def tf_extract(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = len(texts)
        dl = np.zeros(n, dtype=np.int64)
        tfs = np.zeros((n, m), dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = _TOKEN.findall(txt or "")
            dl[i] = len(toks)
            for j, term in enumerate(terms):
                tfs[i, j] = toks.count(term)
        cols = {id_col: t.column(id_col), "dl": pa.array(dl)}
        for j in range(m):
            cols[f"tf_{j}"] = pa.array(tfs[:, j])
        return pa.table(cols)

    tf_ds = ds.map_batches(
        tf_extract, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def partials(t: pa.Table) -> pa.Table:
        cols = {
            "n": pa.array([t.num_rows], pa.int64()),
            "sum_dl": pa.array(
                [int(t.column("dl").to_numpy(zero_copy_only=False).sum())],
                pa.int64(),
            ),
        }
        for j in range(m):
            arr = t.column(f"tf_{j}").to_numpy(zero_copy_only=False)
            cols[f"df_{j}"] = pa.array([int((arr > 0).sum())], pa.int64())
        return pa.table(cols)

    pt = pa.concat_tables(
        ray.get(
            tf_ds.map_batches(partials, batch_format="pyarrow").to_arrow_refs()
        ),
        promote_options="default",
    )
    N = int(pa.compute.sum(pt.column("n")).as_py() or 0)
    if N == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
        )
    sum_dl = int(pa.compute.sum(pt.column("sum_dl")).as_py() or 0)
    avgdl = float(sum_dl) / N
    dfs = [int(pa.compute.sum(pt.column(f"df_{j}")).as_py() or 0) for j in range(m)]
    idfs = [math.log(1 + (N - dfs[j] + 0.5) / (dfs[j] + 0.5)) for j in range(m)]

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        # term order and operation order mirror the SQL oracle exactly
        norm = dl / avgdl
        s = np.zeros(len(dl), dtype=np.float64)
        for j in range(m):
            tf = t.column(f"tf_{j}").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            s = s + (idfs[j] * tf * (k1 + 1.0)) / (
                tf + k1 * (1 - b + b * norm)
            )
        keep = s > 0
        return pa.table(
            {
                id_col: t.column(id_col).filter(pa.array(keep)),
                "score": pa.array(s[keep], pa.float64()),
            }
        )

    scored = tf_ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    top = scored.sort(key=["score", id_col], descending=[True, False]).limit(k)
    rows = top.take_all()
    return pa.table(
        {
            "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
            id_col: pa.array([r[id_col] for r in rows]),
        }
    )


# Deterministic query for the SQL-verified bm25_topk contract entry; the
# oracle SQL in __ray_entry__ is generated from this same constant.
BM25_TERMS: Tuple[str, ...] = ("table", "hash", "merge")
