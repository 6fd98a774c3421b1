"""Distributed embedding statistics: exact covariance and PCA.

The scale path for embedding-space curation (SemDeDup-style pruning,
whitening before ANN, outlier detection) needs second-moment statistics
over a corpus-sized embedding column.  Float summation is
order-dependent, so a naive distributed reduce is not
partition-invariant; this module quantizes components to fixed-point
integers (the same device as the quality classifier's integer-quantized
gradients) so every partial is an EXACT integer and the merged moments
are bit-identical under any partitioning — and SQL-verifiable
(__ray_entry__ oracle ``emb_covariance``).

Shape: one map_batches pass emits ONE tiny partial row per block
(n, component sums, upper-triangle of the Gram matrix — d(d+1)/2 int64s
via one ``Q.T @ Q`` matmul); the driver merges partials with Python
integers (arbitrary precision — no int64 overflow however large the
corpus; per-block partials stay within int64 for any realistic block:
|q| < 2^scale_bits ⋅ max|x|, so a 10^6-row block of unit-scale vectors
is < 2^(2⋅16) ⋅ 10^6 ≈ 2^52).  No shuffle at all.

PCA runs on the driver over the merged d×d matrix (driver-sized by
definition): a deterministic symmetric eigensolve, sign-canonicalized.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _vec_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    """(rows, d) float64 matrix from a list<float> column — one
    list_flatten + reshape, no per-row Python."""
    import pyarrow.compute as pc

    col = t.column(vec_col)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if len(lens) == 0:
        return np.zeros((0, 0), np.float64)
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError("ragged embedding column")
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(len(lens), d)


def covariance_moments(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    scale_bits: int = 16,
) -> Tuple[int, List[int], List[List[int]]]:
    """Exact integer moments of the quantized embeddings: ``(n, s, S2)``
    with ``q = floor(x * 2**scale_bits + 0.5)`` (round-half-up — the same
    expression DuckDB evaluates, IEEE-identical), ``s[i] = Σ q_i`` and
    ``S2[i][j] = Σ q_i q_j``.  Python-int exact merge."""
    scale = float(1 << scale_bits)

    def partial(t: pa.Table) -> pa.Table:
        X = _vec_matrix(t, vec_col)
        if X.size == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.int64())),
                    "s2": pa.array([], pa.list_(pa.int64())),
                }
            )
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        d = Q.shape[1]
        iu = np.triu_indices(d)
        return pa.table(
            {
                "n": pa.array([Q.shape[0]], pa.int64()),
                "s": pa.array([Q.sum(axis=0).tolist()], pa.list_(pa.int64())),
                "s2": pa.array([(Q.T @ Q)[iu].tolist()], pa.list_(pa.int64())),
            }
        )

    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(
        ds.select_columns([vec_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="s2",
    )
    if not blocks:
        return 0, [], []
    n = 0
    s: List[int] | None = None
    s2f: List[int] | None = None
    for b in blocks:
        for row in range(b.num_rows):
            n += b.column("n")[row].as_py()
            bs = b.column("s")[row].as_py()
            bs2 = b.column("s2")[row].as_py()
            if s is None:
                s, s2f = list(bs), list(bs2)
            else:
                s = [a + c for a, c in zip(s, bs)]
                s2f = [a + c for a, c in zip(s2f, bs2)]
    assert s is not None and s2f is not None
    d = len(s)
    S2 = [[0] * d for _ in range(d)]
    it = iter(s2f)
    for i in range(d):
        for j in range(i, d):
            v = next(it)
            S2[i][j] = v
            S2[j][i] = v
    return n, s, S2


def emb_covariance(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    scale_bits: int = 16,
) -> pa.Table:
    """Driver-side table of the exact quantized second moments — one row
    per UPPER-TRIANGLE pair (1-based ``i <= j``): ``(i, j, s2, si, sj,
    n)``.  d(d+1)/2 rows; the consumer derives the covariance as
    ``(n*s2 - si*sj) / (n*(n-1)) / 2**(2*scale_bits)``.  SQL-verified."""
    n, s, S2 = covariance_moments(ds, vec_col=vec_col, scale_bits=scale_bits)
    oi: List[int] = []
    oj: List[int] = []
    os2: List[int] = []
    osi: List[int] = []
    osj: List[int] = []
    d = len(s)
    for i in range(d):
        for j in range(i, d):
            oi.append(i + 1)
            oj.append(j + 1)
            os2.append(S2[i][j])
            osi.append(s[i])
            osj.append(s[j])
    return pa.table(
        {
            "i": pa.array(oi, pa.int64()),
            "j": pa.array(oj, pa.int64()),
            "s2": pa.array(os2, pa.int64()),
            "si": pa.array(osi, pa.int64()),
            "sj": pa.array(osj, pa.int64()),
            "n": pa.array([n] * len(oi), pa.int64()),
        }
    )


def emb_pca(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    n_components: int = 2,
    scale_bits: int = 16,
) -> pa.Table:
    """Top principal components of the embedding covariance: rows
    ``(component, i, loading, eigenvalue)`` with 1-based component and
    coordinate indices.  The covariance comes from the EXACT integer
    moments (partition-invariant); the eigensolve is a driver-side
    deterministic ``numpy.linalg.eigh``, sign canonicalized so each component's
    largest-|loading| coordinate (lowest index on ties) is positive.
    Rows-only (floats); the oracle test checks the eigen-equation
    residual ``||C v - λ v||`` and component orthonormality directly."""
    n, s, S2 = covariance_moments(ds, vec_col=vec_col, scale_bits=scale_bits)
    if n < 2:
        return pa.table(
            {
                "component": pa.array([], pa.int64()),
                "i": pa.array([], pa.int64()),
                "loading": pa.array([], pa.float64()),
                "eigenvalue": pa.array([], pa.float64()),
            }
        )
    d = len(s)
    sv = np.array(s, np.float64)
    S2v = np.array(S2, np.float64)
    denom = float(n) * (n - 1) * float(1 << scale_bits) ** 2
    C = (n * S2v - np.outer(sv, sv)) / denom
    # full symmetric eigensolve on the DRIVER-SIZED d x d matrix: the
    # covariance is bit-identical under any partitioning (integer
    # moments), so the decomposition is reproducible; eigh also handles
    # the near-degenerate spectra real embedding corpora have, where
    # power iteration stalls (λ2/λ1 -> 1)
    w, V = np.linalg.eigh(C)
    comps: List[np.ndarray] = []
    eigs: List[float] = []
    for c in range(min(n_components, d)):
        v = V[:, d - 1 - c].copy()
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v)
        eigs.append(float(w[d - 1 - c]))
    oc: List[int] = []
    oi: List[int] = []
    ol: List[float] = []
    oe: List[float] = []
    for c, (v, lam) in enumerate(zip(comps, eigs), 1):
        oc.extend([c] * d)
        oi.extend(range(1, d + 1))
        ol.extend(float(x) for x in v)
        oe.extend([lam] * d)
    return pa.table(
        {
            "component": pa.array(oc, pa.int64()),
            "i": pa.array(oi, pa.int64()),
            "loading": pa.array(ol, pa.float64()),
            "eigenvalue": pa.array(oe, pa.float64()),
        }
    )
