"""C4-style line-level corpus cleaning (Raffel et al., arXiv:1910.10683 §2.2).

The C4 pipeline's line rules are the canonical webtext cleaning pass a
crawler feeds to LM training: keep a line only if it ends in terminal
punctuation and has enough words, drop lines mentioning javascript,
drop whole documents containing code markers, and drop documents left
with too few lines.  ``c4_line_filter`` computes the full verdict
ledger per document so the drop reasons are auditable (the counts a
data-quality dashboard shows), not just the surviving text.

Rule order per line (each line counted in exactly ONE bucket):
1. ``drop_banned``  — matches ``banned_rx`` (default ``(?i)javascript``)
2. ``drop_short``   — fewer than ``min_words`` words
3. ``drop_punct``   — does not end in terminal punctuation ``[.!?"]``
Document verdict: ``doc_kept = 1`` iff the text contains no ``{`` (C4's
code-page marker) AND at least ``min_lines`` lines survive.
``clean_chars`` is the length of the kept lines joined by ``\\n``.

Shape: ONE stateless ``map_batches`` pass, zero per-row Python — the
line split is ``pc.split_pattern``, every line signal is an Arrow
kernel over the FLATTENED line array, and per-doc rollups are
``np.add.reduceat`` over the list offsets.  No shuffle; text never
leaves its block.  At 100 TB this is embarrassingly parallel and reads
only (id, text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from engine.stages.text import _TOKEN

_TERMINAL_RX = r'[.!?"]$'
_BANNED_RX = r"(?i)javascript"


def c4_line_filter(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
    banned_rx: str = _BANNED_RX,
) -> ray.data.Dataset:
    """Per-document C4 line-filter ledger; see module docstring.

    Returns (id, n_lines, kept_lines, drop_banned, drop_short,
    drop_punct, doc_kept, clean_chars) — all int64.
    """

    out_schema = {
        id_col: pa.int64(),
        "n_lines": pa.int64(),
        "kept_lines": pa.int64(),
        "drop_banned": pa.int64(),
        "drop_short": pa.int64(),
        "drop_punct": pa.int64(),
        "doc_kept": pa.int64(),
        "clean_chars": pa.int64(),
    }

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({k: pa.array([], v) for k, v in out_schema.items()})
        text = pc.fill_null(t.column(text_col), "")
        lines = pc.split_pattern(text, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines)
        lens = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        # splitting "" yields [""] so every row has >= 1 line — reduceat
        # segment starts are always valid
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])

        term = pc.match_substring_regex(flat, _TERMINAL_RX)
        words = pc.count_substring_regex(flat, pattern=_TOKEN.pattern)
        ban = pc.match_substring_regex(flat, banned_rx)
        ban_np = ban.to_numpy(zero_copy_only=False).astype(bool)
        short_np = (~ban_np) & (
            words.to_numpy(zero_copy_only=False).astype(np.int64) < min_words
        )
        punct_np = (
            (~ban_np)
            & (~short_np)
            & ~term.to_numpy(zero_copy_only=False).astype(bool)
        )
        keep_np = ~(ban_np | short_np | punct_np)
        flat_chars = (
            pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        )

        def roll(v: np.ndarray) -> np.ndarray:
            return np.add.reduceat(v.astype(np.int64), starts)

        kept = roll(keep_np)
        clean = roll(np.where(keep_np, flat_chars, 0)) + np.maximum(
            kept - 1, 0
        )
        has_curly = (
            pc.match_substring(text, "{")
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        doc_kept = ((~has_curly) & (kept >= min_lines)).astype(np.int64)
        ids = t.column(id_col)
        return pa.table(
            {
                id_col: ids.cast(pa.int64()),
                "n_lines": pa.array(lens, pa.int64()),
                "kept_lines": pa.array(kept, pa.int64()),
                "drop_banned": pa.array(roll(ban_np), pa.int64()),
                "drop_short": pa.array(roll(short_np), pa.int64()),
                "drop_punct": pa.array(roll(punct_np), pa.int64()),
                "doc_kept": pa.array(doc_kept, pa.int64()),
                "clean_chars": pa.array(clean, pa.int64()),
            }
        )

    return ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )
