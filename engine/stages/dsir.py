"""DSIR: Data Selection via Importance Resampling (Xie et al.,
arXiv:2302.03169).

Scores every raw document by how target-like it is under hashed n-gram
bag-of-words language models: features are unigrams + bigrams hashed into
``n_buckets`` buckets, the target and raw corpora each induce an add-one-
smoothed bucket distribution, and a document's log importance weight is

    w(d) = sum_b c_b(d) * [ ln p_target(b) - ln p_raw(b) ]

with c_b(d) the document's count in bucket b.  High-weight documents look
like the target distribution; resampling by w (top-k, or Gumbel-perturbed
top-k in the paper) selects the training subset.  This module produces the
weight table; selection composes with the existing top-k / sampling
operators.

Bit-reproducibility device (the ``unigram_nll`` pattern, lm.py): both the
engine and the DuckDB oracle accumulate the per-bucket components
``c_b * lambda_b`` in BUCKET-ASCENDING order with a left-to-right ``+``
chain, over identical doubles (add-one ratios -> identical libm ln), so
the fixed-point ``w_nanonat = floor(1e9 * w)`` is hash-verifiable per
document.  The gram hash is the repo-wide 64-bit FNV-1a
(``text.fnv1a_batch``), which the oracle replays in SQL.

Scale plan (100 TB) — NO shuffle anywhere:

1. Distribution passes: per-batch ``np.bincount`` partials over the
   n_buckets-sized feature space, emitted as (bucket, cnt) rows and summed
   on the DRIVER — bucket cardinality is fixed and driver-sized (1024 by
   default), exactly the pre-aggregate-then-driver-reduce rule for
   driver-sized key spaces (CLAUDE.md; PERF.md #24).  Two streaming
   passes, one over raw and one over target; each ships <= n_buckets rows
   per block.
2. Scoring pass: the 2 x n_buckets log-ratio vector broadcasts once
   (``ray.put``), and scoring is one stateless streaming ``map_batches``
   over the raw corpus — text never shuffles, nothing corpus-sized ever
   reaches the driver.

Reference anchor: the chatnoir indexer feeds downstream corpus-quality
selection (SURVEY.md §2.7 payload enrichment); DSIR is the modern
selection operator that consumes exactly such per-document signals.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from engine.stages.common import collect_arrow_blocks
from engine.stages.text import _TOKEN, fnv1a_batch


def _grams(txt: str) -> list:
    """Unigram + bigram feature strings (DSIR's feature map)."""
    toks = _TOKEN.findall(txt or "")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket_ids(grams: list, n_buckets: int) -> np.ndarray:
    if not grams:
        return np.empty(0, dtype=np.int64)
    h = fnv1a_batch([g.encode("utf-8") for g in grams])
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _bucket_counts(
    ds: ray.data.Dataset, text_col: str, n_buckets: int
) -> np.ndarray:
    """One streaming pass -> length-n_buckets int64 counts, reduced on the
    driver (partials are <= n_buckets rows per block — driver-sized)."""

    def partial(t: pa.Table) -> pa.Table:
        acc = np.zeros(n_buckets, dtype=np.int64)
        for txt in t.column(text_col).to_pylist():
            b = _bucket_ids(_grams(txt), n_buckets)
            if b.size:
                acc += np.bincount(b, minlength=n_buckets)
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "cnt": pa.array(acc[nz], pa.int64()),
            }
        )

    counts = np.zeros(n_buckets, dtype=np.int64)
    for blk in collect_arrow_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        required_col="bucket",
    ):
        counts[blk.column("bucket").to_numpy(zero_copy_only=False)] += blk.column(
            "cnt"
        ).to_numpy(zero_copy_only=False)
    return counts


def dsir_weights(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> ray.data.Dataset:
    """Per-document DSIR log importance weight vs a target corpus:
    (id_col, n_grams, w_nanonat).  ``w_nanonat = floor(1e9 * w)`` —
    fixed-point, bit-reproducible (module docstring); higher = more
    target-like.  Documents with zero grams score 0."""
    ct = _bucket_counts(target, text_col, n_buckets)
    cr = _bucket_counts(ds, text_col, n_buckets)
    nt = int(ct.sum())
    nr = int(cr.sum())
    # add-one smoothing; expression shape mirrors the oracle SQL exactly:
    # ln((c+1)/(N+B)) with int/int Python division (correctly-rounded
    # double, same as DuckDB's DOUBLE/BIGINT)
    lam = np.array(
        [
            math.log((int(ct[b]) + 1) / (nt + n_buckets))
            - math.log((int(cr[b]) + 1) / (nr + n_buckets))
            for b in range(n_buckets)
        ],
        dtype=np.float64,
    )
    lam_ref = ray.put(lam)

    def score(t: pa.Table) -> pa.Table:
        lam_v = ray.get(lam_ref)
        n_grams, w_nano = [], []
        for txt in t.column(text_col).to_pylist():
            grams = _grams(txt)
            b = _bucket_ids(grams, n_buckets)
            # np.unique returns buckets SORTED ASC — the oracle's
            # list(cmp ORDER BY bucket) accumulation order
            uniq, cnts = np.unique(b, return_counts=True)
            acc = 0.0
            for bb, c in zip(uniq.tolist(), cnts.tolist()):
                acc += c * lam_v[bb]  # left-to-right, bucket-asc
            n_grams.append(len(grams))
            w_nano.append(math.floor(1e9 * acc))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_grams": pa.array(n_grams, pa.int64()),
                "w_nanonat": pa.array(w_nano, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
