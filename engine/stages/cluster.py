"""Corpus topic discovery: k-means over hashed bag-of-words vectors with
per-cluster top-term labeling.

Cluster-based curation is a first-class training-data operation (SemDeDup
prunes within clusters; DataComp/DoReMi-style pipelines balance or filter
BY cluster) — this operator produces the clusters and a human-readable
label for each: the top-k tokens by in-cluster count.

Shapes (text never shuffles, the corpus never materializes):
1. Feature hashing (Weinberger et al., ICML 2009): token -> FNV bucket,
   tf counts, one stateless pass -> (id, dim-float vector) rows, dim*8
   bytes/doc.
2. Centroids via the shared ``ann.train_centroids`` (seeded, per-batch
   partial sums, driver reduce over n_clusters rows).
3. ONE fused pass over the original text recomputes the hashed vector,
   assigns the cluster map-side (broadcast centroids), and pre-aggregates
   (cluster, token, cnt) Counter partials — assignment never joins back
   to the text.
4. groupby (cluster, token) Sum merges partials; ``grouped_topk`` ranks
   terms per cluster (per-block candidates, no all-to-all sort).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from engine.stages.text import _TOKEN, fnv1a_batch


def _hash_vector(tokens, dim: int) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float64)
    if tokens:
        h = fnv1a_batch([t.encode("utf-8") for t in tokens])
        np.add.at(v, (h % np.uint64(dim)).astype(np.int64), 1.0)
    return v


def hashed_tf_vectors(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
) -> ray.data.Dataset:
    """(id, embedding) hashed term-frequency vectors — the deterministic
    no-model featurizer (feature hashing)."""

    def feat(t: pa.Table) -> pa.Table:
        vecs = [
            list(_hash_vector(_TOKEN.findall(txt or ""), dim))
            for txt in t.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: t.column(id_col),
                "embedding": pa.array(vecs, pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(feat, batch_format="pyarrow", zero_copy_batch=True)


def cluster_topics(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_clusters: int = 8,
    dim: int = 256,
    top_k: int = 8,
    lloyd_iters: int = 2,
    seed: int = 20240817,
) -> ray.data.Dataset:
    """Top-k label terms per k-means cluster: ``(cluster_id, token,
    term_count, term_rank)``.  Deterministic end to end (seeded init,
    hash featurizer, total-order ranking)."""
    from engine.stages.ann import train_centroids
    from engine.stages.topk import grouped_topk

    empty = pa.table(
        {
            "cluster_id": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "term_count": pa.array([], pa.int64()),
            "term_rank": pa.array([], pa.int64()),
        }
    )
    feats = hashed_tf_vectors(
        ds, id_col=id_col, text_col=text_col, dim=dim
    ).materialize()
    if feats.count() == 0:
        return ray.data.from_arrow(empty)
    cent = train_centroids(
        feats, n_clusters, vec_col="embedding", lloyd_iters=lloyd_iters, seed=seed
    )
    cref = ray.put(cent)

    def assign_count(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        cnt: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            toks = _TOKEN.findall(txt or "")
            v = _hash_vector(toks, dim)
            n = np.linalg.norm(v)
            if n > 0:
                v = v / n
            a = int(np.argmax(v @ c.T))
            for tok in toks:
                cnt[(a, tok)] += 1
        items = list(cnt.items())
        return pa.table(
            {
                "cluster_id": pa.array([a for (a, _), _ in items], pa.int64()),
                "token": pa.array([tok for (_, tok), _ in items], pa.string()),
                "cnt": pa.array([n for _, n in items], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(assign_count, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cluster_id", "token"])
        .aggregate(Sum("cnt", alias_name="term_count"))
        .map_batches(
            lambda t: pa.table(
                {
                    "cluster_id": t.column("cluster_id").cast(pa.int64()),
                    "token": t.column("token"),
                    "term_count": t.column("term_count").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return grouped_topk(
        counts,
        group_col="cluster_id",
        order_cols=["term_count", "token"],
        descending=[True, False],
        k=top_k,
        rank_col="term_rank",
    )
