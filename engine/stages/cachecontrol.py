"""HTTP Cache-Control -> crawler revisit policy.

A polite recrawler honors origin caching directives (RFC 9111) the same
way a shared cache does: ``no-store`` / ``no-cache`` / ``private`` mean
"do not reuse — refetch on next visit" (a crawler's store is a shared
cache, so ``private`` excludes it), ``max-age=N`` bounds reuse at N
seconds, and an absent header falls back to the crawl default.  The
reference fetches WARCs (headers travel in the records,
`/root/reference/warc_indexer/indexer/warcio.py` record payloads) but
never interprets them; a live recrawl scheduler must.

``cache_policy`` maps a header-string column to
``(id, max_age, no_store, revisit_s)``:

- ``max_age``   — parsed ``max-age`` seconds, -1 when absent/unparsable
- ``no_store``  — 1 when any of no-store / no-cache / private is present
                  (token-boundary matched, so ``no-cachex`` never counts)
- ``revisit_s`` — 0 when no_store, else max_age when present, else
                  ``default_s``

Shape: one stateless ``map_batches`` pass, ZERO per-row Python — the
directives are matched by ``pc.match_substring_regex`` with token
boundaries and ``max-age`` is pulled by one ``pc.extract_regex``; all
decisions are int64 numpy algebra.  No shuffle; headers never leave
their block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# token-boundary directive match: start-or-separator before, end-or-
# separator after (RFC 9111 directives are comma-separated tokens)
_NOSTORE_RX = r"(?i)(?:^|[\s,])(?:no-store|no-cache|private)(?:$|[\s,=])"
_MAXAGE_RX = r"(?i)(?:^|[\s,])max-age=(?P<age>[0-9]+)(?:$|[\s,])"


def cache_policy(
    ds: ray.data.Dataset,
    *,
    header_col: str = "cache_control",
    id_col: str = "doc_id",
    default_s: int = 86400,
) -> ray.data.Dataset:
    """(id, max_age, no_store, revisit_s) per row; see module docstring."""

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "max_age": pa.array([], pa.int64()),
                "no_store": pa.array([], pa.int64()),
                "revisit_s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        hdr = pc.fill_null(t.column(header_col), "")
        no_store = np.asarray(
            pc.match_substring_regex(hdr, pattern=_NOSTORE_RX)
            .to_numpy(zero_copy_only=False),
            bool,
        )
        ext = pc.extract_regex(hdr, pattern=_MAXAGE_RX)
        age_str = pc.fill_null(pc.struct_field(ext, "age"), "-1")
        max_age = np.asarray(
            pc.cast(age_str, pa.int64()).to_numpy(zero_copy_only=False)
        )
        revisit = np.where(
            no_store, np.int64(0), np.where(max_age >= 0, max_age, default_s)
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "max_age": pa.array(max_age, pa.int64()),
                "no_store": pa.array(no_store.astype(np.int64), pa.int64()),
                "revisit_s": pa.array(revisit, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
