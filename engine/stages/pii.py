"""PII scrubbing for training corpora.

Large-scale LLM data pipelines redact personally identifiable information
before training (e.g. the C4 and Dolma cleanup passes; BigScience ROOTS
PII filtering).  This operator replaces emails, IPv4 addresses and
phone numbers with typed placeholders and reports per-document match
counts, so downstream stages can gate on PII density as well.

Everything is vectorized RE2 on Arrow string arrays —
``pc.count_substring_regex`` / ``pc.replace_substring_regex`` — with zero
per-row Python.  DuckDB's regex engine is ALSO RE2, so the oracle's
``regexp_extract_all`` / ``regexp_replace(..., 'g')`` reproduce the exact
same matches and the whole output (including the scrubbed text) is
hash-verifiable.  Rules apply in a FIXED order (emails first — their
local/domain parts contain digits and dots that the later rules could
otherwise bite into), each counting against the previous rule's output,
and the oracle mirrors the same staged order.

Scale: one streaming ``map_batches`` pass, no shuffle, no state — the
cheapest possible operator shape; throughput is RE2 scan speed.
"""

from __future__ import annotations

from typing import Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (name, RE2 pattern, placeholder) — applied in order; counts are taken
# on each stage's input (the previous stage's output)
PII_RULES: Tuple[Tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+\d{1,2}[ -]\d{3}[ -]\d{3}[ -]\d{4}", "<PHONE>"),
)


def pii_scrub(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Redact PII: (id_col, n_emails, n_ips, n_phones, clean_text,
    clean_chars) per document (module docstring)."""

    def scrub(t: pa.Table) -> pa.Table:
        txt = pc.coalesce(t.column(text_col), "")
        cols = {id_col: t.column(id_col)}
        for name, pattern, repl in PII_RULES:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(txt, pattern=pattern), pa.int64()
            )
            txt = pc.replace_substring_regex(txt, pattern=pattern, replacement=repl)
        cols["clean_text"] = txt
        cols["clean_chars"] = pc.cast(pc.utf8_length(txt), pa.int64())
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
