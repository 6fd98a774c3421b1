"""Distributed BPE vocabulary training + application.

Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm; pre-tokenization uses the GPT-2-style regex already defined in
``engine.stages.text._BPE``).  The reference indexer has no tokenizer
trainer — this is part of the training-data operator suite, the piece a
100 TB corpus pipeline runs to fit the tokenizer before token counting /
sequence packing.

Shape at scale:

``word_counts``
    One ``map_batches`` pass pre-aggregates a Counter of pre-tokens per
    batch, so the only shuffle moves (word, n) partial rows — bounded by
    distinct-words-per-block × blocks, never text.  A frequency cap then
    reduces the table to the top ``max_words`` words by (n desc, word asc)
    using the per-block-candidates + driver-merge pattern (each word lives
    in exactly one post-groupby block, so block-local top-k is a superset
    of the global head — no vocab-wide AllToAll sort).

``train_bpe``
    The merge loop itself runs on the DRIVER over the capped word table —
    the standard practice for BPE training (production tokenizers fit on a
    frequency-capped / min-count word table; the tail's counts cannot
    change early merge decisions and the cap makes the loop O(max_words)).
    Pair counts are maintained incrementally with a pair → word-index map,
    so each merge touches only the words containing it.  Ties break
    deterministically: highest count, then lexicographically smallest
    (left, right).

``apply_bpe``
    Distributed encoder: merges ship once via ``ray.put`` and every batch
    greedily applies them in rank order (lowest-rank applicable pair
    first — the standard BPE encode), emitting per-doc token counts.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from engine.stages.text import _BPE

_EOW = "</w>"


def word_counts(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    max_words: Optional[int] = None,
) -> pa.Table:
    """(word, n) for the corpus's pre-tokens, frequency-capped to the top
    ``max_words`` by (n desc, word asc).  Returns a driver-local Arrow
    table (max_words-bounded by construction)."""

    def partials(t: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            cnt.update(_BPE.findall(txt or ""))
        words = list(cnt.keys())
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array([cnt[w] for w in words], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    _KEYS = [("n", "descending"), ("word", "ascending")]

    def head_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.select(["word", "n"])
        if max_words is None or t.num_rows <= max_words:
            return t
        return t.take(pc.sort_indices(t, sort_keys=_KEYS)[:max_words])

    from engine.stages.common import collect_arrow_blocks

    cand = collect_arrow_blocks(
        agg.map_batches(
            head_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="word",
    )
    empty = pa.table(
        {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if not cand:
        return empty
    import pyarrow.compute as pc

    allc = pa.concat_tables(cand, promote_options="default")
    idx = pc.sort_indices(allc, sort_keys=_KEYS)
    if max_words is not None:
        idx = idx[:max_words]
    return allc.take(idx)


def _word_symbols(word: str) -> Tuple[str, ...]:
    return tuple(word) + (_EOW,)


def train_bpe(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 20_000,
    min_pair_count: int = 2,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges; returns (rank, left, right, n) —
    n is the pair's count at merge time.  Stops early when no pair reaches
    ``min_pair_count`` (merging a pair seen once memorizes noise)."""
    wf = word_counts(ds, text_col=text_col, max_words=max_words)
    words: List[Tuple[str, ...]] = [
        _word_symbols(w) for w in wf.column("word").to_pylist()
    ]
    freqs = wf.column("n").to_numpy(zero_copy_only=False).astype(np.int64)

    pair_counts: Counter = Counter()
    pair_words: Dict[Tuple[str, str], set] = {}
    for wi, syms in enumerate(words):
        f = int(freqs[wi]) if wi < len(freqs) else 0
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(wi)

    ranks: List[int] = []
    lefts: List[str] = []
    rights: List[str] = []
    ns: List[int] = []
    for rank in range(num_merges):
        if not pair_counts:
            break
        # deterministic argmax: highest count, then smallest (left, right)
        best, best_n = None, 0
        for p, c in pair_counts.items():
            if c > best_n or (c == best_n and (best is None or p < best)):
                best, best_n = p, c
        if best is None or best_n < min_pair_count:
            break
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            f = int(freqs[wi])
            # retract this word's old pair contributions
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            # rewrite the word with the merged symbol (left-to-right scan,
            # the canonical greedy application)
            out: List[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = tuple(out)
            for p in zip(words[wi], words[wi][1:]):
                pair_counts[p] += f
                pair_words.setdefault(p, set()).add(wi)
        ranks.append(rank)
        lefts.append(best[0])
        rights.append(best[1])
        ns.append(best_n)
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "n": pa.array(ns, pa.int64()),
        }
    )


def encode_word(
    word: str, rank_of: Dict[Tuple[str, str], int]
) -> Tuple[str, ...]:
    """Encode one pre-token with trained merges: repeatedly merge the
    LOWEST-RANK adjacent pair present (the standard BPE encode order —
    ties inside one word cannot disagree because each rank names one
    pair).  O(len(word)^2) worst case, amortized away by apply_bpe's
    per-task word cache (the GPT-2 pre-tokenizer bounds word length in
    practice: runs break at letter/digit/punct boundaries)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def apply_bpe(
    ds: ray.data.Dataset,
    merges: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-doc BPE token count using trained merges — (id_col,
    n_bpe_tokens).  Merges ship once via ``ray.put`` and each task builds
    its rank map + per-word encode cache in-process; unseen-pair words
    fall back to character symbols (standard open-vocab behavior)."""
    merges_ref = ray.put(
        list(
            zip(merges.column("left").to_pylist(),
                merges.column("right").to_pylist())
        )
    )

    def count(t: pa.Table, pairs_ref) -> pa.Table:
        rank_of = {p: i for i, p in enumerate(ray.get(pairs_ref))}
        cache: Dict[str, int] = {}
        counts = []
        for txt in t.column(text_col).to_pylist():
            n = 0
            for w in _BPE.findall(txt or ""):
                k = cache.get(w)
                if k is None:
                    k = cache[w] = len(encode_word(w, rank_of))
                n += k
            counts.append(n)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_bpe_tokens": pa.array(counts, pa.int64()),
            }
        )

    return ds.map_batches(
        count,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_args=(merges_ref,),
    )
