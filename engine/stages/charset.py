"""Charset sniffing over raw HTML payloads (binary column).

A crawler sees BYTES; decoding them needs the WHATWG encoding-sniffing
ladder (https://encoding.spec.whatwg.org/#specifying-the-documents-
character-encoding, the subset a batch pipeline needs):

1. **BOM** — EF BB BF -> utf-8, FF FE -> utf-16le, FE FF -> utf-16be.
   A BOM OVERRIDES any in-document declaration (the spec's rule; variant
   v6 in the query pins the conflict case).
2. **In-document declaration** — first ``charset=`` in the head prefix
   (covers both ``<meta charset=...>`` and the http-equiv
   ``content="text/html; charset=..."`` form), name lowercased.
3. **Content heuristic** — no high byte in the prefix -> ascii, else
   assumed utf-8 (the web default).

The reference stores payloads as bytes and lets Elasticsearch/resiliparse
deal with encodings (`/root/reference/warc_indexer/indexer/process.py`
payload handling); this stage is the explicit, testable version of that
decision for the PAGES `html:binary` column (BASELINE.json input_hint).

Shape: one stateless ``map_batches`` pass, ZERO per-row Python — BOM
checks are two ``binary_slice`` + ``equal`` kernels, the declaration is
one ``extract_regex`` over the ``binary_slice(0, sniff_len)`` prefix,
the heuristic one high-byte regex match; the verdict is an ``np.select``
ladder.  No shuffle; payloads never leave their block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_DECL_RX = r"""(?i)charset=["']?(?P<cs>[A-Za-z0-9_.:-]+)"""
_HIGH_RX = r"[^\x00-\x7f]"


def charset_sniff(
    ds: ray.data.Dataset,
    *,
    payload_col: str = "html",
    id_col: str = "doc_id",
    sniff_len: int = 1024,
) -> ray.data.Dataset:
    """(id, encoding, bom, declared) per row; see module docstring.
    ``bom``/``declared`` are 0/1 int64 provenance flags (which ladder
    rung decided)."""

    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "encoding": pa.array([], pa.string()),
                "bom": pa.array([], pa.int64()),
                "declared": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        raw = pc.fill_null(t.column(payload_col), b"")
        head = pc.binary_slice(raw, 0, sniff_len)
        b3 = pc.binary_slice(raw, 0, 3)
        b2 = pc.binary_slice(raw, 0, 2)

        def eq(col, val: bytes) -> np.ndarray:
            return np.asarray(
                pc.equal(col, val).to_numpy(zero_copy_only=False), bool
            )

        utf8_bom = eq(b3, b"\xef\xbb\xbf")
        u16le = eq(b2, b"\xff\xfe") & ~utf8_bom
        u16be = eq(b2, b"\xfe\xff")
        ext = pc.extract_regex(head, pattern=_DECL_RX)
        decl = pc.fill_null(
            pc.cast(pc.struct_field(ext, "cs"), pa.string()), ""
        )
        decl = np.asarray(pc.utf8_lower(decl).to_pylist(), dtype=object)
        high = np.asarray(
            pc.match_substring_regex(head, pattern=_HIGH_RX)
            .to_numpy(zero_copy_only=False),
            bool,
        )
        any_bom = utf8_bom | u16le | u16be
        has_decl = (decl != "") & ~any_bom
        enc = np.select(
            [utf8_bom, u16le, u16be, has_decl, ~high],
            [
                np.full(len(ids), "utf-8", object),
                np.full(len(ids), "utf-16le", object),
                np.full(len(ids), "utf-16be", object),
                decl,
                np.full(len(ids), "ascii", object),
            ],
            default=np.full(len(ids), "utf-8", object),
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "encoding": pa.array(list(enc), pa.string()),
                "bom": pa.array(any_bom.astype(np.int64), pa.int64()),
                "declared": pa.array(has_decl.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
