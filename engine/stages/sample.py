"""Deterministic (stratified) sampling for training-data pipelines.

Down-sampling a 100 TB corpus must be reproducible across runs, engines,
and partitionings — ``random_sample`` is none of those.  The standard
pattern is hash-gating: keep a row iff ``H(id) mod 100 < rate_pct`` with a
cross-engine hash.  md5 is used (DuckDB has it natively), taking the first
8 hex chars as an integer — every engine that can md5 a string reproduces
the same sample, which also makes the operator SQL-verifiable
(__ray_entry__ oracle ``sample_stratified``).

Stateless, vectorized ``map_batches``; no shuffle, no RNG, no state.
"""

from __future__ import annotations

from hashlib import md5
from typing import Dict, Optional

import pyarrow as pa
import ray.data


def _bucket(vals, salt: str) -> list:
    """Deterministic 0-99 bucket per value: first 8 hex chars of
    md5(salt + str(value)) as an int, mod 100."""
    return [
        int(md5((salt + str(v)).encode()).hexdigest()[:8], 16) % 100 for v in vals
    ]


def deterministic_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    rate_pct: int = 10,
    salt: str = "",
) -> ray.data.Dataset:
    """Keep ~rate_pct% of rows, chosen by id hash (reproducible anywhere)."""

    def keep(t: pa.Table) -> pa.Table:
        b = _bucket(t.column(id_col).to_pylist(), salt)
        return t.filter(pa.array([x < rate_pct for x in b]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    rates: Optional[Dict[str, int]] = None,
    default_rate_pct: int = 10,
    salt: str = "",
) -> ray.data.Dataset:
    """Per-stratum hash-gated sampling: each ``strata_col`` value gets its
    own keep-rate (percent), e.g. up-sample rare languages while
    down-sampling the head.  Same determinism guarantees as
    ``deterministic_sample``."""
    rates = rates or {}

    def keep(t: pa.Table) -> pa.Table:
        b = _bucket(t.column(id_col).to_pylist(), salt)
        strata = t.column(strata_col).to_pylist()
        mask = [
            x < rates.get(s, default_rate_pct) for x, s in zip(b, strata)
        ]
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
