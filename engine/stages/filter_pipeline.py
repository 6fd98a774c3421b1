"""End-to-end corpus cleaning verdicts — the C4/CCNet-style filter chain.

A reference user's real pipeline is not one operator; it is the COMPOSITION
exact-dedup -> PII-density gate -> language gate -> length gate ->
repetition gate -> quality gate, applied in a fixed order with the FIRST
failing rule recorded per document (C4, Raffel et al. 2020 §2.2; Gopher
rules, Rae et al. 2021 A1; CCNet, Wenzek et al. 2019).  The PII gate sits
early so high-PII documents are flagged as such rather than masked by a
later heuristic.  ``corpus_filter`` runs the whole chain and emits one
verdict row per document.

Scale shape (the reason this is one operator, not six chained queries):

- ONE fused ``map_batches`` pass computes every per-document signal
  (md5 content hash, stopword language id, token/char counts, duplicate-
  word ppm, alpha ppm, PII match counts) — the 100 TB of text is read
  once and dropped at the stage boundary; only compact signal rows
  (~100 B/doc) continue.
- ONE ``groupby(content_hash)`` over the signal rows resolves the
  duplicate rule (keep-first = min id, same exchange as
  ``dedup.dedup_keep_first``: the shuffle never carries text) and applies
  the ordered rule chain inside the group task.  No other shuffle exists.

Every signal reuses the repo's SQL-verified kernel (text.quality_scores,
text.lang_id, clean.repetition_stats, pii.PII_RULES), so the composed
verdict is itself DuckDB-verifiable end to end (__ray_entry__ oracle
``corpus_filter``) — rule thresholds appear verbatim in both.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from engine.stages import clean as cl
from engine.stages import text as tx
from engine.stages.pii import PII_RULES

# Ordered rule chain: (status, predicate over the signal row). The first
# matching rule wins; 'kept' otherwise. Thresholds are module constants so
# the oracle SQL quotes the same numbers (single source of truth).
MIN_CHARS = 200
MIN_WORDS = 40
MAX_DUP_WORD_PPM = 900_000  # >90% of tokens belong to a repeated token
MIN_ALPHA_PPM = 760_000  # <76% [A-Za-z] chars
MAX_PII = 2  # >2 PII matches per doc


def corpus_filter(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Composed cleaning verdicts: (id_col, n_chars, n_words, status) with
    status in {'kept','duplicate','lang','short','repetition','quality',
    'pii'} — first failing rule in the fixed chain (module docstring)."""

    def signals(t: pa.Table) -> pa.Table:
        t = tx.quality_scores(t, text_col)
        t = cl.repetition_stats(t, text_col)
        t = tx.lang_id(t, text_col)
        t = tx.content_hash(t, text_col)
        txt = pc.fill_null(t.column(text_col), "")
        n_pii = pa.array([0] * t.num_rows, pa.int64())
        for _, pattern, _ in PII_RULES:
            n_pii = pc.add(
                n_pii,
                pc.cast(pc.count_substring_regex(txt, pattern=pattern), pa.int64()),
            )
        t = t.append_column("n_pii", n_pii)
        return t.select(
            [
                id_col,
                "content_md5",
                "lang_pred",
                "n_chars",
                "n_words",
                "dup_word_ppm",
                "alpha_ppm",
                "n_pii",
            ]
        )

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized first-match rule chain (np.select evaluates conditions
        # in order) — a degenerate content hash (e.g. empty text) makes one
        # hot group, so this must not be a per-row Python loop
        keep_id = df[id_col].min()
        status = np.select(
            [
                df[id_col].to_numpy() != keep_id,
                df["n_pii"].to_numpy() > MAX_PII,
                df["lang_pred"].to_numpy() == "unknown",
                (df["n_chars"].to_numpy() < MIN_CHARS)
                | (df["n_words"].to_numpy() < MIN_WORDS),
                df["dup_word_ppm"].to_numpy() > MAX_DUP_WORD_PPM,
                df["alpha_ppm"].to_numpy() < MIN_ALPHA_PPM,
            ],
            ["duplicate", "pii", "lang", "short", "repetition", "quality"],
            default="kept",
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64")
                if pd.api.types.is_integer_dtype(df[id_col])
                else df[id_col],
                "n_chars": df["n_chars"].astype("int64"),
                "n_words": df["n_words"].astype("int64"),
                "status": pd.Series(status, index=df.index, dtype="object"),
            }
        )

    return (
        ds.map_batches(signals, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("content_md5")
        .map_groups(verdict, batch_format="pandas")
    )


def filter_report(verdicts: ray.data.Dataset) -> Dict[str, int]:
    """Tiny driver-side rollup: status -> doc count (for logs/CLI)."""
    from ray.data.aggregate import Count

    out = verdicts.groupby("status").aggregate(Count(alias_name="n")).take_all()
    return {r["status"]: r["n"] for r in out}
