"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own operators (extraction/enrichment), these are the
per-document text statistics a 100 TB corpus pipeline needs: token counting,
quality scoring, language id, and document fingerprinting.  All are
vectorized ``map_batches`` bodies over Arrow batches; definitions are chosen
to be expressible in ANSI SQL so the DuckDB oracle can verify them
bit-for-bit (see __ray_entry__.oracle_sql).

Definitions (keep in sync with the oracle SQL):
- n_chars  = length(text) in codepoints
- n_tokens = number of ``\\S+`` runs
- avg_token_len = round(sum(len(token)) / n_tokens, 6)  (0.0 if no tokens)
- alpha_ratio   = round(count([A-Za-z]) / n_chars, 6)   (0.0 if empty)
- digit_ratio   = round(count([0-9]) / n_chars, 6)
- fingerprint: 64-bit FNV-1a of the whitespace-normalized text (stable,
  SQL-free; oracle checks rows-only), plus a rolling-window minimum
  ("winnowing"-style, Schleimer et al. SIGMOD'03) over token hashes.
"""

from __future__ import annotations

import re
from hashlib import md5
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.lang import detect_batch

# Explicit ASCII whitespace class, NOT r"\S+": Python re's \S excludes
# Unicode spaces (NBSP etc.) while DuckDB/RE2's \S does not — the oracle SQL
# and this tokenizer must agree character-for-character.
_TOKEN = re.compile(r"[^\t\n\v\f\r ]+")
_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT = re.compile(r"[0-9]")
# GPT-2-style pre-tokenizer regex (Radford et al. 2019, public): contraction
# pieces, letter runs, digit runs, punctuation runs, trailing spaces.
_BPE = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÿ0-9]+|\s+(?!\S)|\s+"""
)

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars / n_tokens / tok_chars / avg_token_len columns.

    ``tok_chars`` (total non-whitespace chars) is exposed so callers never
    re-run the tokenizer regex — the SQL-verified tokenizer definition lives
    here and only here.

    Fully vectorized: ``pc.count_substring_regex`` (RE2, C speed) counts
    token runs and whitespace chars; no per-row Python.  Verified identical
    to ``len(_TOKEN.findall(t))`` on nulls/unicode/all-ws edge cases (the
    pattern has no lookarounds, so RE2 and Python re agree).
    """
    col = pc.fill_null(batch.column(text_col), "")
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = (
        pc.count_substring_regex(col, pattern=_TOKEN.pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    # every codepoint is either ASCII-whitespace or part of a token
    n_ws = (
        pc.count_substring_regex(col, pattern=r"[\t\n\v\f\r ]")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    tok_chars = n_chars - n_ws
    avg = np.where(n_tokens > 0, np.round(tok_chars / np.maximum(n_tokens, 1), 6), 0.0)
    return (
        batch.append_column("n_chars", pa.array(n_chars))
        .append_column("n_tokens", pa.array(n_tokens))
        .append_column("tok_chars", pa.array(tok_chars))
        .append_column("avg_token_len", pa.array(avg, type=pa.float64()))
    )


def bpe_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_bpe_tokens: GPT-2-style pre-tokenizer piece count (the
    "BPE-ish regex" token counter; a cheap proxy for LLM token budgets)."""
    texts = batch.column(text_col).to_pylist()
    n = np.fromiter(
        (len(_BPE.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
    )
    return batch.append_column("n_bpe_tokens", pa.array(n))


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append quality columns: exact counts, ppm integers, and float ratios.

    - n_alpha / n_digit — exact [A-Za-z] / [0-9] codepoint counts.
    - alpha_ppm / digit_ppm — ``floor(1e6 * count / n_chars)`` as int64.
      Bit-reproducible across engines: ``1e6*count`` is exact in a double
      (< 2^53), the division is correctly rounded IEEE, and ``floor`` is
      deterministic — unlike ``round(x, 6)``, whose half-way handling
      differs between Python (correctly-rounded dtoa) and DuckDB (scaled
      rint); measured disagreement ~0.1% of rows on the testdata.  These
      are the SQL-verified quality columns.
    - alpha_ratio / digit_ratio — ``round(count/n, 6)`` floats for API
      consumers; NOT oracle-checked (see above).
    """
    col = pc.fill_null(batch.column(text_col), "")
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    n_alpha = (
        pc.count_substring_regex(col, pattern=_ALPHA.pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_digit = (
        pc.count_substring_regex(col, pattern=_DIGIT.pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nz = np.maximum(n_chars, 1)
    nonempty = n_chars > 0
    alpha_ppm = np.where(
        nonempty, np.floor(1000000.0 * n_alpha / nz), 0
    ).astype(np.int64)
    digit_ppm = np.where(
        nonempty, np.floor(1000000.0 * n_digit / nz), 0
    ).astype(np.int64)
    # Python round (correctly-rounded) per row, NOT np.round — keeps the
    # float columns bit-identical to the previous kernel; this loop is over
    # precomputed ints, ~100x cheaper than the old per-row regex findall
    alpha = np.fromiter(
        (round(a / nc, 6) if nc else 0.0 for a, nc in zip(n_alpha, n_chars)),
        dtype=np.float64,
        count=len(n_chars),
    )
    digit = np.fromiter(
        (round(d / nc, 6) if nc else 0.0 for d, nc in zip(n_digit, n_chars)),
        dtype=np.float64,
        count=len(n_chars),
    )
    return (
        batch.append_column("n_chars", pa.array(n_chars))
        .append_column("n_alpha", pa.array(n_alpha))
        .append_column("n_digit", pa.array(n_digit))
        .append_column("alpha_ppm", pa.array(alpha_ppm))
        .append_column("digit_ppm", pa.array(digit_ppm))
        .append_column("alpha_ratio", pa.array(alpha))
        .append_column("digit_ratio", pa.array(digit))
    )


def lang_id(batch: pa.Table, text_col: str = "text", out_col: str = "lang_pred") -> pa.Table:
    """Append detected-language column (engine.lang trigram/stopword scorer)."""
    preds = detect_batch(batch.column(text_col).to_pylist())
    return batch.append_column(out_col, pa.array(preds, type=pa.string()))


def content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_md5") -> pa.Table:
    """Append md5 hex of the raw text (exact-dedup key; SQL: md5(text))."""
    hashes = [
        md5((t or "").encode("utf-8")).hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column(out_col, pa.array(hashes, type=pa.string()))


# Below this many still-active rows, the columnwise numpy update's fixed
# overhead (~2 us/op) exceeds the plain-int scalar cost (~60 ns/byte x k):
# finish those rows' suffixes scalar.
_FNV_TAIL = 32
_FNV_MASK = 0xFFFFFFFFFFFFFFFF


def fnv1a_batch(items) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over a sequence of ``bytes`` values.

    FNV is sequential per string but vectorizable ACROSS strings: sort rows
    by length descending so the set of rows still active at byte position j
    is a prefix, then one xor + one wrapping uint64 multiply per position
    updates every active hash at once.  When fewer than ``_FNV_TAIL`` rows
    remain (the long-document tail of a skewed batch), their suffixes finish
    in a plain-int scalar loop.  Bit-identical to the per-byte reference
    loop (pinned in tests/test_stages.py); ~30-50x on realistic batches.
    """
    n = len(items)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return h
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    if maxlen == 0:
        return h
    cat = np.frombuffer(b"".join(items), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    order = np.argsort(-lens, kind="stable")
    lens_asc = lens[order][::-1]  # ascending view for searchsorted
    starts_s = starts[order]
    h_s = h[order]  # fancy indexing copies; safe to mutate
    j = 0
    while j < maxlen:
        k = n - int(np.searchsorted(lens_asc, j, side="right"))  # rows with len > j
        if k <= _FNV_TAIL:
            for i in range(k):
                hh = int(h_s[i])
                for byte in items[order[i]][j:]:
                    hh = ((hh ^ byte) * 0x100000001B3) & _FNV_MASK
                h_s[i] = hh
            break
        bj = cat[starts_s[:k] + j].astype(np.uint64)
        h_s[:k] = (h_s[:k] ^ bj) * _FNV_PRIME  # uint64 multiply wraps mod 2^64
        j += 1
    h[order] = h_s
    return h


def hash_bucket_column(
    t: "pa.Table", col: str, n_buckets: int, out: str = "tb"
) -> "pa.Table":
    """Append ``out`` = fnv1a(col) % n_buckets as int64 — THE coarse-bucket
    groupby key (PERF.md #31).  Null cells hash as the empty string, so
    sentinel rows land in a deterministic bucket instead of raising."""
    h = fnv1a_batch([(s or "").encode("utf-8") for s in t.column(col).to_pylist()])
    tb = (h % np.uint64(n_buckets)).astype(np.int64)
    return t.append_column(out, pa.array(tb, pa.int64()))

def fingerprint(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Append doc_fp (FNV-1a of normalized text) and win_fp (winnowing min).

    win_fp = minimum token-hash over sliding windows, a cheap robust
    fingerprint for near-identical detection; deterministic, order-free of
    any dict iteration.

    Both hash families go through ``fnv1a_batch``: the normalized documents
    as one batch, and ALL tokens of the batch flattened into a second call
    (split back per doc by counts) — no per-byte Python on the hot path.
    """
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    tok_lists = [_TOKEN.findall(t or "") for t in texts]
    doc_fp = fnv1a_batch([" ".join(toks).encode("utf-8") for toks in tok_lists])
    flat = [tok.encode("utf-8") for toks in tok_lists for tok in toks]
    th_all = fnv1a_batch(flat)
    counts = np.fromiter((len(toks) for toks in tok_lists), dtype=np.int64, count=n)
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    win_fp = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        th = th_all[bounds[i] : bounds[i + 1]]
        if len(th) == 0:
            continue
        if len(th) >= window:
            mins = np.lib.stride_tricks.sliding_window_view(th, window).min(axis=1)
            win_fp[i] = np.bitwise_xor.reduce(np.unique(mins))
        else:
            win_fp[i] = th.min()
    return batch.append_column("doc_fp", pa.array(doc_fp, type=pa.uint64())).append_column(
        "win_fp", pa.array(win_fp, type=pa.uint64())
    )


def chunk_docs(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 64,
    overlap: int = 16,
):
    """Split documents into overlapping token windows — the RAG /
    long-context preprocessing step (fixed-size chunks with overlap so no
    span is cut at a boundary without context).  Output one row per chunk:
    (id_col, chunk_id, start_tok, n_tok, chunk_text), where chunk k covers
    tokens [k*stride, k*stride + seq_len) with stride = seq_len - overlap,
    and chunk_text re-joins the tokens with single spaces (whitespace-
    normalized, so the text is deterministic and SQL-reproducible via
    list_slice + array_to_string — oracle ``chunk_docs``).  Docs with zero
    tokens emit zero chunks.  Chunking stops once a window reaches the
    document end: a chunk whose tokens are entirely contained in the
    previous window (redundant tail) is never emitted.

    Scale: stateless streaming flat expansion inside ``map_batches`` — no
    shuffle, no state; output volume ~ input x (1 + overlap/stride).
    """
    import pyarrow as pa
    import ray.data  # noqa: F401

    if overlap >= seq_len:
        raise ValueError("overlap must be < seq_len")
    stride = seq_len - overlap

    def chunks(t: pa.Table) -> pa.Table:
        out_id, out_ck, out_st, out_n, out_tx = [], [], [], [], []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            toks = _TOKEN.findall(txt or "")
            n = len(toks)
            k = 0
            # stop once the previous window already reached the document end
            # (k*stride + overlap == (k-1)*stride + seq_len): a further chunk
            # would be entirely contained in it, duplicating tail tokens
            while n > 0 and (k == 0 or k * stride + overlap < n):
                start = k * stride
                piece = toks[start : start + seq_len]
                out_id.append(d)
                out_ck.append(k)
                out_st.append(start)
                out_n.append(len(piece))
                out_tx.append(" ".join(piece))
                k += 1
        return pa.table(
            {
                id_col: pa.array(out_id, t.column(id_col).type),
                "chunk_id": pa.array(out_ck, pa.int64()),
                "start_tok": pa.array(out_st, pa.int64()),
                "n_tok": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_tx, pa.string()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


def token_entropy(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-document token-distribution Shannon entropy — the
    information-theoretic repetitiveness signal (a low-entropy doc is
    dominated by few tokens: boilerplate, keyword stuffing, spam):

        H(d) = -sum_{distinct t} (tf/dl) * ln(tf/dl)

    Output ``(id_col, n_tokens, entropy_nanonat)``; each distinct-token
    contribution floors to integer nanonats INDIVIDUALLY (order-free
    integer sums, the source_kl device), so the query is SQL-verified.
    Purely per-document — a stateless streaming map, zero shuffle."""
    import math
    from collections import Counter

    dls, ents = [], []
    for txt in batch.column(text_col).to_pylist():
        cnt = Counter(_TOKEN.findall(txt or ""))
        dl = sum(cnt.values())
        acc = 0
        for tf in cnt.values():
            acc += math.floor((-1e9 * (tf / dl)) * math.log(tf / dl))
        dls.append(dl)
        ents.append(acc)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pa.array(dls, pa.int64()),
            "entropy_nanonat": pa.array(ents, pa.int64()),
        }
    )


def compress_ratio(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-document zlib compression ratio — the Gopher/FineWeb-style
    redundancy filter (highly compressible text is repetitive
    boilerplate; incompressible text is often binary junk or gibberish):

        ratio_ppm = floor(1e6 * len(zlib(utf8(text), level=6)) / len(utf8(text)))

    Output ``(id_col, n_bytes, zlib_ratio_ppm)``; empty docs score
    (0, 0).  zlib level 6 is deterministic for a given input, so the
    operator is exactly reproducible (unit-tested against a direct
    zlib call); rows-only at the driver (no SQL analog).  Stateless
    streaming map, zero shuffle."""
    import zlib

    nb, ratios = [], []
    for txt in batch.column(text_col).to_pylist():
        raw = (txt or "").encode("utf-8")
        if not raw:
            nb.append(0)
            ratios.append(0)
            continue
        nb.append(len(raw))
        ratios.append((1_000_000 * len(zlib.compress(raw, 6))) // len(raw))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_bytes": pa.array(nb, pa.int64()),
            "zlib_ratio_ppm": pa.array(ratios, pa.int64()),
        }
    )


def readability(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Flesch reading-ease per document, integer-exact — a classic
    quality-curation signal (readability-band filtering in webtext
    pipelines).  Counting rules: words = ``_TOKEN`` runs, sentences =
    ``[.!?]+`` runs (floored at 1), syllables = ``[aeiouy]+`` runs in
    the lowercased text (the standard vowel-group approximation).
    ``flesch_milli = 206835 - (1015*W)//S - (84600*Syl)//W`` — all
    positive-operand floor divisions, so DuckDB's integer ``//``
    reproduces it bit-for-bit (no float in sight).  Docs with zero words
    are dropped.  Pure RE2 Arrow kernels, one pass, no shuffle."""
    import ray.data  # noqa: F401

    def per_batch(t: pa.Table) -> pa.Table:
        col = pc.fill_null(t.column(text_col), "")
        w = (
            pc.count_substring_regex(col, pattern=_TOKEN.pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        s = (
            pc.count_substring_regex(col, pattern=r"[.!?]+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        syl = (
            pc.count_substring_regex(
                pc.utf8_lower(col), pattern=r"[aeiouy]+"
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        s = np.maximum(s, 1)
        keep = w > 0
        wk, sk, sylk = w[keep], s[keep], syl[keep]
        flesch = 206835 - (1015 * wk) // sk - (84600 * sylk) // np.maximum(wk, 1)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                "n_words": pa.array(wk, pa.int64()),
                "n_sentences": pa.array(sk, pa.int64()),
                "n_syllables": pa.array(sylk, pa.int64()),
                "flesch_milli": pa.array(flesch, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def oov_rate(
    ds: "ray.data.Dataset",
    *,
    vocab_size: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Vocabulary coverage — the analytic behind every tokenizer
    vocab-size decision: build the top-``vocab_size`` term dictionary by
    (cf desc, term asc), then report each document's out-of-vocabulary
    token count and rate (exact integer ppm).  Two passes: the
    suggesters' shared ``_vocab_cf`` groupby + partial top-k head, then
    one vectorized scan (``index_in`` against the broadcast vocab).
    Docs with zero tokens drop.  SQL-verified."""
    import numpy as np
    import ray
    import ray.data

    from engine.stages.common import collect_arrow_blocks
    from engine.stages.search import _vocab_cf

    keys = [("cf", "descending"), ("term", "ascending")]

    def head_partial(t: pa.Table) -> pa.Table:
        t = t.select(["term", "cf"])
        if t.num_rows <= vocab_size:
            return t
        return t.take(pc.sort_indices(t, sort_keys=keys)[:vocab_size])

    blocks = collect_arrow_blocks(
        _vocab_cf(ds, text_col).map_batches(
            head_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="cf",
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "n_oov": pa.array([], pa.int64()),
            "oov_ppm": pa.array([], pa.int64()),
        }
    )
    if not blocks:
        return ray.data.from_arrow(empty)
    allc = pa.concat_tables(blocks, promote_options="default")
    head = allc.take(pc.sort_indices(allc, sort_keys=keys)[:vocab_size])
    vocab_arr = head.column("term").combine_chunks()
    vocab_ref = ray.put(vocab_arr)

    def scan(t: pa.Table, ref=vocab_ref) -> pa.Table:
        if t.num_rows == 0:
            return empty
        va = ray.get(ref)
        texts = t.column(text_col).to_pylist()
        ids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        total = int(lens.sum())
        if total == 0:
            return empty
        flat = pa.array([w for tl in tok_lists for w in tl], pa.string())
        inv = (
            pc.fill_null(pc.index_in(flat, value_set=va), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            >= 0
        )
        pref = np.zeros(total + 1, np.int64)
        np.cumsum(~inv, out=pref[1:])
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        oov = pref[starts[1:]] - pref[starts[:-1]]
        keep = lens > 0
        nk, ok = lens[keep], oov[keep]
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_tokens": pa.array(nk, pa.int64()),
                "n_oov": pa.array(ok, pa.int64()),
                "oov_ppm": pa.array((1_000_000 * ok) // nk, pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def lexical_diversity(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Type-token ratio per document — the lexical-diversity quality
    signal (low TTR = repetitive boilerplate/spam; used alongside the
    Gopher repetition rules): ``(doc_id, n_tokens, n_types, ttr_ppm)``
    with ``ttr_ppm = floor(1e6 * n_types / n_tokens)`` in exact
    integers; zero-token docs emit ttr_ppm = -1.

    Shape: one stateless pass; tokens flatten once and the per-doc
    distinct count is a vectorized pandas groupby-nunique over the
    (doc_of, token) frame — no per-doc Python set loop, no shuffle.
    """
    import pandas as pd

    def per_batch(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "n_types": pa.array([], pa.int64()),
                "ttr_ppm": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lists = [_TOKEN.findall(x or "") for x in texts]
        lens = np.fromiter(
            (len(tl) for tl in tok_lists), np.int64, count=len(tok_lists)
        )
        types = np.zeros(len(lens), np.int64)
        total = int(lens.sum())
        if total:
            doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            flat = [w for tl in tok_lists for w in tl]
            nun = (
                pd.DataFrame({"d": doc_of, "t": flat})
                .groupby("d")["t"]
                .nunique()
            )
            types[nun.index.to_numpy()] = nun.to_numpy()
        ttr = np.where(lens > 0, (1_000_000 * types) // np.maximum(lens, 1), -1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "n_types": pa.array(types, pa.int64()),
                "ttr_ppm": pa.array(ttr.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def sentence_stats(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Rule-based sentence segmentation — the unit-of-work producer for
    sentence-level pipelines (per-sentence dedup a la CCNet, bitext
    alignment, sentence-boundary token packing).  A sentence ends at
    ``[.!?]`` followed by whitespace; emits one row per sentence:
    ``(id, sent_idx 1-based, sentence, n_chars, n_tokens)``.

    FULLY Arrow-vectorized — no per-row Python: one RE2
    ``replace_substring_regex`` rewrites each boundary to ``<punct>\\x01``
    (RE2 has no lookbehind, so the sentinel-insert + split device
    replaces the classic split-after-group regex on BOTH engines; DuckDB
    mirrors with ``regexp_replace(..., '\\1' || chr(1), 'g')`` +
    ``string_split``), then ``split_pattern`` -> ``list_flatten`` +
    ``list_parent_indices`` explode rows, in-list positions come from the
    repeat/cumsum offset arithmetic, and the per-sentence stats are
    ``utf8_length`` / ``split_whitespace`` kernels on the flat array.
    Stateless flat expansion inside ``map_batches`` — no shuffle.
    """
    import pyarrow.compute as pc

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "sent_idx": pa.array([], pa.int64()),
            "sentence": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        }
    )

    def split(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        txt = pc.fill_null(t.column(text_col), "")
        rep = pc.replace_substring_regex(
            txt, pattern=r"([.!?])[\t\n\x0b\x0c\r ]+", replacement="\\1\x01"
        )
        lists = pc.split_pattern(rep, pattern="\x01")
        flat = pc.list_flatten(lists)
        if len(flat) == 0:
            return empty
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        sent_idx = np.arange(len(flat), dtype=np.int64) - starts[parent] + 1
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = pc.list_value_length(pc.utf8_split_whitespace(flat))
        return pa.table(
            {
                id_col: pa.array(ids[parent], pa.int64()),
                "sent_idx": pa.array(sent_idx, pa.int64()),
                "sentence": flat,
                "n_chars": pc.cast(pc.utf8_length(flat), pa.int64()),
                "n_tokens": pc.cast(n_tok, pa.int64()),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)


def fold_accents(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Case + diacritic folding — the match-normalization step search
    analyzers (ES ``asciifolding`` + ``lowercase``) and dedup keys apply
    before hashing: lowercase, then canonical-compatibility decompose
    (NFKD) and strip combining marks, so ``Ée`` == ``ee`` and ``WÖRLD``
    == ``world``.  Characters with no mark decomposition (ø, ß) pass
    through — exactly DuckDB's ``strip_accents(lower(x))``, which the
    oracle uses, and the probe-verified parity this query pins.

    ASCII fast path: rows where ``binary_length == utf8_length`` take one
    vectorized ``ascii_lower``; only genuinely non-ASCII rows pay the
    per-row ``unicodedata`` call, spliced back with ``replace_with_mask``
    (the ``clean.normalize_text`` device).  Emits ``(id, folded,
    changed)``.  One stateless pass, no shuffle.
    """
    import pyarrow.compute as pc

    def fold(t: pa.Table) -> pa.Table:
        import unicodedata

        txt = t.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
            if isinstance(txt, pa.ChunkedArray):
                txt = (
                    txt.chunk(0) if txt.num_chunks else pa.array([], pa.string())
                )
        txt = pc.fill_null(txt, "")
        nonascii = pc.not_equal(pc.binary_length(txt), pc.utf8_length(txt))
        out = pc.ascii_lower(txt)
        if pc.any(nonascii).as_py():
            idx = np.flatnonzero(nonascii.to_numpy(zero_copy_only=False))
            repl = pa.array(
                [
                    "".join(
                        c
                        for c in unicodedata.normalize(
                            "NFKD", txt[int(i)].as_py().lower()
                        )
                        if not unicodedata.combining(c)
                    )
                    for i in idx
                ],
                pa.string(),
            )
            out = pc.replace_with_mask(out, nonascii, repl)
        changed = pc.cast(pc.invert(pc.equal(out, txt)), pa.int64())
        return pa.table(
            {
                id_col: t.column(id_col),
                "folded": out,
                "changed": changed,
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
