"""Linear quality classifier over hashed bag-of-words features — the
CCNet / GPT-3-style corpus quality filter (Wenzek et al. arXiv:1911.00359
§4.4 train a classifier to separate target-like from raw text; Brown et
al. arXiv:2005.14165 Appendix A use a logistic classifier over hashed
features to score Common Crawl against a curated positive set).

Model: logistic regression on L1-normalized hashed unigram+bigram bucket
counts (the DSIR feature map, dsir._grams / dsir._bucket_ids), trained by
full-batch gradient descent and applied as one stateless scoring pass.

Determinism device (new here, extending the repo's fixed-point family):
every per-document gradient contribution is quantized to int64 nano-units
BEFORE accumulation — ``floor(1e9 * r * x_j)`` per (doc, bucket) — so the
epoch gradient is an integer sum, order-free under ANY partitioning, and
the driver fast path and the distributed path produce BIT-IDENTICAL
weights (pinned by test).  Floats appear only in driver-sequenced places
(the weight update, the sigmoid), which are identical in both paths.

Scale shape (100 TB):
- TRAINING at 100 TB runs on a sample: hash-gate the input Dataset
  upstream (sample.stratified_sample's md5 device); below ``driver_max_train`` the sample's sparse features
  collect to the driver and train in numpy (one pass over the corpus,
  then zero Ray executions per epoch); above it each epoch is ONE
  streaming map_batches pass emitting <= n_buckets+2 int64 partial rows
  per block, reduced on the driver (driver-sized key space, PERF.md #24).
  Text never shuffles; nothing corpus-sized reaches the driver.
- SCORING is one stateless map_batches with the (n_buckets+1) weight
  vector broadcast via ``ray.put`` — zero shuffle, zero state.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from engine.stages.common import collect_arrow_blocks
from engine.stages.dsir import _bucket_ids, _grams

_NANO = 1_000_000_000


def _doc_features(txt: str, n_buckets: int) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse L1-normalized features: (bucket ids, weights). Empty doc ->
    empty arrays (bias-only contribution)."""
    b = _bucket_ids(_grams(txt), n_buckets)
    if not b.size:
        return b, np.empty(0, dtype=np.float64)
    ids, cnt = np.unique(b, return_counts=True)
    return ids, cnt.astype(np.float64) / float(cnt.sum())


def _dot_nano(ids: np.ndarray, x: np.ndarray, w: np.ndarray) -> int:
    """FIXED-POINT dot product: sum of floor(1e9 * w_j * x_j) integers —
    order-free, so the per-doc margin is identical no matter which path
    (per-doc loop, vectorized driver epoch, distributed partials, test
    oracle) computes it.  A float ``w[ids] @ x`` would NOT be: BLAS dot,
    ``np.add.reduceat`` and ``np.bincount`` sum in different orders and
    can differ in the last bit, which the floor() then amplifies."""
    if not ids.size:
        return 0
    return int(np.floor(w[ids] * x * _NANO).astype(np.int64).sum())


def _grad_nano(
    ids: np.ndarray, x: np.ndarray, y: int, w: np.ndarray, bias: float
) -> Tuple[np.ndarray, int]:
    """Per-doc integer gradient: (nano units per present bucket, bias)."""
    z = bias + _dot_nano(ids, x, w) / _NANO
    r = 1.0 / (1.0 + math.exp(-z)) - float(y)
    g = np.floor(r * x * _NANO).astype(np.int64)
    return g, int(math.floor(r * _NANO))


def train_quality_classifier(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    n_buckets: int = 1024,
    epochs: int = 30,
    lr: float = 25.0,
    driver_max_train: int = 100_000,
) -> Tuple[np.ndarray, float]:
    """Train; returns (w[n_buckets] float64, bias). Deterministic under
    any partitioning (integer gradient sums)."""

    def featurize(t: pa.Table) -> pa.Table:
        dids = t.column(id_col).to_numpy(zero_copy_only=False)
        labels = t.column(label_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_d, out_y, out_b, out_x = [], [], [], []
        for i in range(len(dids)):
            ids, x = _doc_features(texts[i], n_buckets)
            out_d.append(int(dids[i]))
            out_y.append(1 if labels[i] == positive else 0)
            out_b.append(ids.tolist())
            out_x.append(x.tolist())
        return pa.table(
            {
                "did": pa.array(out_d, pa.int64()),
                "y": pa.array(out_y, pa.int64()),
                "b": pa.array(out_b, pa.list_(pa.int64())),
                "x": pa.array(out_x, pa.list_(pa.float64())),
            }
        )

    feats = ds.map_batches(
        featurize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_train = feats.count()
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    if n_train == 0:
        return w, bias

    if n_train <= driver_max_train:
        # driver fast path: collect the SAMPLE's sparse features once into
        # CSR-style flat arrays, then each epoch is a handful of numpy
        # kernels (no per-doc Python).  Integer accumulations run through
        # float64 np.bincount weights — exact because every addend and
        # every partial sum is an integer below 2^53 (per-element
        # |g| <= 1e9; guarded by the n_train assert), so the results are
        # bit-identical to the distributed path's int64 sums.
        assert n_train <= 4_000_000, "float64-exact integer-sum bound"
        ys, docs_idx, flat_ids, flat_x = [], [], [], []
        row = 0
        for blk in collect_arrow_blocks(feats, required_col="did"):
            for y, b, x in zip(
                blk.column("y").to_pylist(),
                blk.column("b").to_pylist(),
                blk.column("x").to_pylist(),
            ):
                ys.append(int(y))
                docs_idx.extend([row] * len(b))
                flat_ids.extend(b)
                flat_x.extend(x)
                row += 1
        y_arr = np.asarray(ys, np.float64)
        dcode = np.asarray(docs_idx, np.int64)
        ids_f = np.asarray(flat_ids, np.int64)
        x_f = np.asarray(flat_x, np.float64)
        for _ in range(epochs):
            wx = np.floor(w[ids_f] * x_f * _NANO)  # integer-valued float64
            z = np.bincount(dcode, weights=wx, minlength=n_train) / _NANO
            r = 1.0 / (1.0 + np.exp(-(bias + z))) - y_arr
            g = np.floor(r[dcode] * x_f * _NANO)
            acc = np.bincount(ids_f, weights=g, minlength=n_buckets)
            accb = int(np.floor(r * _NANO).sum())
            w = w - lr * (acc / _NANO) / n_train
            bias = bias - lr * (accb / _NANO) / n_train
        return w, bias

    for _ in range(epochs):
        w_ref = ray.put((w, bias))

        def epoch_partial(t: pa.Table, ref=w_ref) -> pa.Table:
            cw, cb = ray.get(ref)
            acc = np.zeros(n_buckets, dtype=np.int64)
            accb = 0
            for y, b, x in zip(
                t.column("y").to_pylist(),
                t.column("b").to_pylist(),
                t.column("x").to_pylist(),
            ):
                bi = np.asarray(b, np.int64)
                g, gb = _grad_nano(bi, np.asarray(x, np.float64), int(y), cw, cb)
                np.add.at(acc, bi, g)
                accb += gb
            nz = np.nonzero(acc)[0]
            return pa.table(
                {
                    "bucket": pa.array(
                        np.concatenate([nz, [-1]]).astype(np.int64), pa.int64()
                    ),
                    "g": pa.array(
                        np.concatenate([acc[nz], [accb]]).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

        acc = np.zeros(n_buckets, dtype=np.int64)
        accb = 0
        for blk in collect_arrow_blocks(
            feats.map_batches(
                epoch_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            required_col="bucket",
        ):
            bk = blk.column("bucket").to_numpy(zero_copy_only=False)
            gv = blk.column("g").to_numpy(zero_copy_only=False)
            bias_rows = bk == -1
            accb += int(gv[bias_rows].sum())
            # np.add.at, not fancy-index +=: a collected block is not
            # guaranteed to hold exactly one partial table, and buffered
            # fancy indexing drops duplicate-bucket contributions
            np.add.at(acc, bk[~bias_rows], gv[~bias_rows])
        w = w - lr * (acc.astype(np.float64) / _NANO) / n_train
        bias = bias - lr * (accb / _NANO) / n_train
    return w, bias


def classifier_scores(
    ds: ray.data.Dataset,
    w: np.ndarray,
    bias: float,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    n_buckets: int = 1024,
) -> ray.data.Dataset:
    """Stateless scoring pass: (doc_id, label, prob_nano). prob_nano =
    floor(1e9 * sigmoid(w.x + b)) — fixed point, partitioning-invariant."""
    w_ref = ray.put((np.asarray(w, np.float64), float(bias)))

    def score(t: pa.Table, ref=w_ref) -> pa.Table:
        cw, cb = ray.get(ref)
        probs = []
        labels = t.column(label_col).to_pylist()
        for txt in t.column(text_col).to_pylist():
            ids, x = _doc_features(txt, n_buckets)
            z = cb + _dot_nano(ids, x, cw) / _NANO
            probs.append(int(math.floor(_NANO / (1.0 + math.exp(-z)))))
        return pa.table(
            {
                id_col: t.column(id_col),
                "label": pa.array(
                    [1 if l == positive else 0 for l in labels], pa.int64()
                ),
                "prob_nano": pa.array(probs, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def quality_classifier(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    n_buckets: int = 1024,
    epochs: int = 30,
    lr: float = 25.0,
    driver_max_train: int = 100_000,
) -> ray.data.Dataset:
    """Train on ds (hash-gate upstream for a sample at scale), score ds."""
    w, bias = train_quality_classifier(
        ds,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        positive=positive,
        n_buckets=n_buckets,
        epochs=epochs,
        lr=lr,
        driver_max_train=driver_max_train,
    )
    return classifier_scores(
        ds,
        w,
        bias,
        id_col=id_col,
        text_col=text_col,
        label_col=label_col,
        positive=positive,
        n_buckets=n_buckets,
    )
