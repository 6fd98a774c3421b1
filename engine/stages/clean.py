"""Corpus-cleaning operators for LLM training-data pipelines.

Three standard web-corpus cleaning stages (all public-method; Rae et al.
"Gopher" arXiv:2112.11446 §A1.1 repetition filters; Wenzek et al. "CCNet"
arXiv:1911.00359 line-level dedup; benchmark decontamination as in public
LM reports), each expressed Ray-Data-first and each with an exact DuckDB
oracle (see __ray_entry__.oracle_sql):

- ``repetition_stats``: per-document repetition signals — duplicate-word
  and duplicate-2-gram occurrence fractions and the top-2-gram fraction,
  emitted as floor-ppm integers (bit-reproducible across engines, same
  device as quality_scores).
- ``line_dedup``: cross-corpus boilerplate line removal — a line dropped
  from every document when it appears in >= ``min_docs`` DISTINCT
  documents.  Shuffle moves (line_md5, doc_id) pairs, never text; the hot
  set is collected only above ``min_docs`` (boilerplate sets are small by
  construction) and applied via a size-gated broadcast.  Above the gate,
  the fallback computes only the tiny (doc_id, ord) DROP list (hot-line
  hits) via a union+groupby semi-join over hash triples and applies it in
  one vectorized map_batches over the original dataset — text never
  shuffles (all three paths test-pinned identical).
- ``decontam``: benchmark-overlap flagging — each document's DISTINCT
  word n-grams intersected with the eval corpus's n-gram set.  The eval
  set is broadcast as raw strings under ``broadcast_max`` (exact; test
  scale) and as 64-bit FNV-1a hashes above it (8 bytes/gram, the 100 TB
  path; collision probability ~|grams|^2/2^64).
- ``span_dedup``: exact duplicated-SPAN removal (Lee et al.
  "Deduplicating Training Data Makes Language Models Better"
  arXiv:2107.06499, adapted from suffix arrays to fixed-width token
  windows so the operator shuffles nothing but 8-byte window hashes and
  stays one-pass-verifiable in SQL): every ``width``-token window that
  occurs >= 2 times anywhere in the corpus keeps its GLOBALLY FIRST
  occurrence (smallest (doc_id, position)) and every other occurrence's
  tokens are dropped; documents are rebuilt from the surviving tokens.
  Same three size-gated paths as ``line_dedup`` (hot-window broadcast /
  (doc_id, start) drop-list broadcast / one doc-keyed shuffle), all
  pinned identical by tests; text itself never shuffles below the last
  gate.
- ``corpus_overlap``: corpus-vs-corpus distinct word n-gram overlap with
  NO broadcast and NO driver funnel — both sides emit 63-bit FNV gram
  hashes, membership resolves via one union + groupby(h) semi-join, and
  per-doc totals ride the same shuffle as negative-hash sentinel rows.
  The scale path ``decontam`` must not use when both sides are
  corpus-sized (decontam's broadcast is right only for tiny eval sets).

Tokenization is the repo-wide SQL-portable whitespace tokenizer
(engine.stages.text._TOKEN).
"""

from __future__ import annotations

from collections import Counter
from hashlib import md5
from typing import Dict, List, Optional, Set, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from engine.stages.common import as_arrow
from engine.stages.text import _TOKEN, fnv1a_batch


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_words / dup_word_ppm / dup_gram2_ppm / top_gram2_ppm.

    dup_*_ppm = floor(1e6 * (occurrences belonging to a unit seen >= 2
    times in the doc) / total units); top_gram2_ppm = floor(1e6 *
    max 2-gram count / total 2-grams).  0 when the doc has no units.
    """
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_words = np.zeros(n, dtype=np.int64)
    dup_w = np.zeros(n, dtype=np.int64)
    dup_g = np.zeros(n, dtype=np.int64)
    top_g = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _TOKEN.findall(t or "")
        nw = len(toks)
        n_words[i] = nw
        if nw:
            wc = Counter(toks)
            dups = sum(c for c in wc.values() if c >= 2)
            dup_w[i] = int(np.floor(1000000.0 * dups / nw))
        ng = nw - 1
        if ng > 0:
            gc = Counter(
                toks[j] + " " + toks[j + 1] for j in range(ng)
            )
            gdups = sum(c for c in gc.values() if c >= 2)
            gmax = max(gc.values())
            dup_g[i] = int(np.floor(1000000.0 * gdups / ng))
            top_g[i] = int(np.floor(1000000.0 * gmax / ng))
    return (
        batch.append_column("n_words", pa.array(n_words))
        .append_column("dup_word_ppm", pa.array(dup_w))
        .append_column("dup_gram2_ppm", pa.array(dup_g))
        .append_column("top_gram2_ppm", pa.array(top_g))
    )


def _doc_lines(text: str) -> List[str]:
    return (text or "").split("\n")


def line_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    broadcast_max: int = 5_000_000,
    drop_broadcast_max: int = 50_000_000,
) -> ray.data.Dataset:
    """CCNet-style cross-corpus line dedup (module docstring).

    Output: (id_col, n_lines, n_dropped, clean_text, clean_chars) — the
    document with boilerplate lines removed, plus stats.

    ``broadcast_max`` gates the hot-hash broadcast (primary path);
    ``drop_broadcast_max`` gates the fallback's (doc_id, ord) drop-list
    broadcast — above BOTH gates, text shuffles once (by doc).
    """

    def explode(t: pa.Table) -> pa.Table:
        hs: List[str] = []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            # distinct lines PER DOC: the count below is then the number
            # of distinct docs containing the line
            for ln in set(_doc_lines(txt)):
                hs.append(md5(ln.encode()).hexdigest())
        return pa.table({"h": pa.array(hs, pa.string())})

    counts = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Count(alias_name="n"))
    )
    import pyarrow.compute as pc

    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), min_docs)).select(["h"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    n_hot = hot.count()

    def rebuild_with(hot_lookup) -> "callable":
        def rebuild(t: pa.Table) -> pa.Table:
            hotset = hot_lookup()
            ids = t.column(id_col).to_pylist()
            out_nl, out_nd, out_txt, out_ch = [], [], [], []
            for txt in t.column(text_col).to_pylist():
                lines = _doc_lines(txt)
                kept = [
                    ln
                    for ln in lines
                    if md5(ln.encode()).hexdigest() not in hotset
                ]
                out_nl.append(len(lines))
                out_nd.append(len(lines) - len(kept))
                clean = "\n".join(kept)
                out_txt.append(clean)
                out_ch.append(len(clean))
            return pa.table(
                {
                    id_col: t.column(id_col),
                    "n_lines": pa.array(out_nl, pa.int64()),
                    "n_dropped": pa.array(out_nd, pa.int64()),
                    "clean_text": pa.array(out_txt, pa.string()),
                    "clean_chars": pa.array(out_ch, pa.int64()),
                }
            )

        return rebuild

    if n_hot <= broadcast_max:
        if n_hot == 0:
            ref = ray.put(frozenset())
        else:
            ht = pa.concat_tables(
                ray.get(hot.to_arrow_refs()), promote_options="default"
            )
            ref = ray.put(frozenset(ht.column("h").to_pylist()))
        return ds.map_batches(
            rebuild_with(lambda: ray.get(ref)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    # scale fallback (round-3 VERDICT #3, inverted): text NEVER shuffles
    # through the hash exchange.  Explode only (doc_id, ord, line_md5)
    # triples, semi-join against the hot hashes via union + groupby — NOT
    # the native acero join, whose hash partitions lose their schema when
    # a partition gets zero right-side rows ("No match for FieldRef h") —
    # and keep only the HITS: the (doc_id, ord) DROP list.  Hot lines are
    # boilerplate, i.e. a small distinct set hit a bounded number of times
    # per doc, so the drop list is O(hot occurrences) << O(corpus lines).
    # Under drop_broadcast_max the list is broadcast as a doc->ords map
    # and applied in ONE vectorized map_batches over the original dataset
    # (zero text shuffles); above it, the drop rows union+groupby with
    # the docs (one text shuffle — down from the old fallback's two plus
    # a per-doc map_groups reassembly of the whole corpus).
    from engine.stages.join import _arrow_types

    id_type = _arrow_types(ds).get(id_col, pa.int64())

    def explode_ord(t: pa.Table) -> pa.Table:
        out_id, out_ord, out_h = [], [], []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            for o, ln in enumerate(_doc_lines(txt)):
                out_id.append(d)
                out_ord.append(o)
                out_h.append(md5(ln.encode()).hexdigest())
        n = len(out_id)
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "ord": pa.array(out_ord, pa.int64()),
                "h": pa.array(out_h, pa.string()),
                "_hot": pa.array([False] * n, pa.bool_()),
            }
        )

    def hot_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_col: pa.array([None] * n, id_type),
                "ord": pa.array([-1] * n, pa.int64()),
                "h": t.column("h"),
                "_hot": pa.array([True] * n, pa.bool_()),
            }
        )

    occs = ds.map_batches(
        explode_ord, batch_format="pyarrow", zero_copy_batch=True
    )
    unioned = occs.union(
        hot.map_batches(hot_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def hits(df) -> "pd.DataFrame":
        if not df["_hot"].any():
            return df[[id_col, "ord"]].iloc[0:0]
        out = df[~df["_hot"]][[id_col, "ord"]].copy()
        # groups holding a null-id marker row promote int ids to float64
        # in pandas; restore the declared id type after the markers go
        if pa.types.is_integer(id_type):
            out[id_col] = out[id_col].astype("int64")
        return out

    drops = unioned.groupby("h").map_groups(hits, batch_format="pandas").materialize()
    n_drops = drops.count()

    if n_drops <= drop_broadcast_max:
        drop_map: Dict = {}
        if n_drops:
            dt = pa.concat_tables(
                ray.get(drops.to_arrow_refs()), promote_options="default"
            )
            for d, o in zip(
                dt.column(id_col).to_pylist(), dt.column("ord").to_pylist()
            ):
                drop_map.setdefault(d, set()).add(o)
        dref = ray.put(drop_map)

        def rebuild_by_ord(t: pa.Table) -> pa.Table:
            dm = ray.get(dref)
            out_nl, out_nd, out_txt, out_ch = [], [], [], []
            for d, txt in zip(
                t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
            ):
                lines = _doc_lines(txt)
                ords = dm.get(d)
                kept = (
                    lines
                    if not ords
                    else [ln for o, ln in enumerate(lines) if o not in ords]
                )
                out_nl.append(len(lines))
                out_nd.append(len(lines) - len(kept))
                clean = "\n".join(kept)
                out_txt.append(clean)
                out_ch.append(len(clean))
            return pa.table(
                {
                    id_col: t.column(id_col),
                    "n_lines": pa.array(out_nl, pa.int64()),
                    "n_dropped": pa.array(out_nd, pa.int64()),
                    "clean_text": pa.array(out_txt, pa.string()),
                    "clean_chars": pa.array(out_ch, pa.int64()),
                }
            )

        return ds.map_batches(
            rebuild_by_ord, batch_format="pyarrow", zero_copy_batch=True
        )

    # drop list itself too big to broadcast: ONE doc-keyed shuffle — union
    # the docs with the drop rows and rebuild per doc (each group is one
    # document plus its drop ords)
    def doc_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_col: t.column(id_col),
                text_col: t.column(text_col),
                "ord": pa.array([-1] * n, pa.int64()),
            }
        )

    def drop_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_col: t.column(id_col),
                text_col: pa.array([None] * n, pa.string()),
                "ord": t.column("ord"),
            }
        )

    both = ds.map_batches(
        doc_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(drops.map_batches(drop_rows, batch_format="pyarrow", zero_copy_batch=True))

    def rebuild_group(df) -> "pd.DataFrame":
        import pandas as pd

        doc = df[df["ord"] < 0]
        txt = doc[text_col].iloc[0]
        lines = _doc_lines(txt)
        ords = set(df.loc[df["ord"] >= 0, "ord"].astype("int64").tolist())
        kept = [ln for o, ln in enumerate(lines) if o not in ords]
        clean = "\n".join(kept)
        did = doc[id_col].iloc[0]
        return pd.DataFrame(
            {
                id_col: pd.Series([did], dtype=doc[id_col].dtype),
                "n_lines": pd.Series([len(lines)], dtype="int64"),
                "n_dropped": pd.Series([len(lines) - len(kept)], dtype="int64"),
                "clean_text": [clean],
                "clean_chars": pd.Series([len(clean)], dtype="int64"),
            }
        )

    return both.groupby(id_col).map_groups(rebuild_group, batch_format="pandas")


_FNV_OFF = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_M64 = 1 << 64


def _fnv1a(s: str) -> int:
    """Scalar FNV-1a 64 (reference definition; batch paths use
    engine.stages.text.fnv1a_batch, pinned bit-identical to this)."""
    h = _FNV_OFF
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) % _M64
    return h


def _word_ngrams(text: str, n: int) -> Set[str]:
    toks = _TOKEN.findall(text or "")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def decontam(
    ds: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    broadcast_max: int = 2_000_000,
) -> ray.data.Dataset:
    """Benchmark decontamination (module docstring).

    Output: (id_col, n_grams, contam_grams) — distinct word n-grams and
    how many of them appear in the eval corpus's n-gram set.
    """

    def eval_grams(t: pa.Table) -> pa.Table:
        grams: Set[str] = set()
        for txt in t.column(text_col).to_pylist():
            grams |= _word_ngrams(txt, n)
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    ev = (
        eval_ds.map_batches(eval_grams, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Count(alias_name="_c"))
        .materialize()
    )
    n_ev = ev.count()
    if n_ev == 0:
        gram_set: frozenset = frozenset()
        hashed = False
    else:
        et = pa.concat_tables(ray.get(ev.to_arrow_refs()), promote_options="default")
        strs = et.column("g").to_pylist()
        hashed = n_ev > broadcast_max
        # above the gate: broadcast 8-byte FNV hashes, not strings (the
        # 100 TB path; exact below the gate).  Batch-vectorized kernel,
        # bit-identical to scalar _fnv1a.
        gram_set = (
            frozenset(
                fnv1a_batch([s.encode("utf-8") for s in strs]).tolist()
            )
            if hashed
            else frozenset(strs)
        )
    ref = ray.put(gram_set)

    def flag(t: pa.Table, _hashed=hashed) -> pa.Table:
        ev_set = ray.get(ref)
        gram_lists = [
            sorted(_word_ngrams(txt, n)) for txt in t.column(text_col).to_pylist()
        ]
        out_n = [len(g) for g in gram_lists]
        if _hashed:
            # flatten all grams across the batch, hash once, count per doc
            flat = [g.encode("utf-8") for grams in gram_lists for g in grams]
            hv = fnv1a_batch(flat).tolist()
            out_c, pos = [], 0
            for cnt in out_n:
                out_c.append(sum(1 for x in hv[pos : pos + cnt] if x in ev_set))
                pos += cnt
        else:
            out_c = [sum(1 for g in grams if g in ev_set) for grams in gram_lists]
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_grams": pa.array(out_n, pa.int64()),
                "contam_grams": pa.array(out_c, pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


# --- exact duplicated-span removal (Lee et al. arXiv:2107.06499) ---------

# (doc_id, window_start) packed into ONE int64 so the "globally first
# occurrence" reduces to a single Min aggregate: doc_id * 2^20 + p.
# Caps documents at 2^20 - 1 tokens (guarded loudly below); doc ids up to
# 2^43 still fit the int64.  The SQL oracle uses the same packing.
_SPAN_SHIFT = 1 << 20


def _span_hash(span: str) -> int:
    """60-bit window key: int(md5[:15 hex], 16).  md5 (not FNV) so DuckDB
    can reproduce it exactly; 15 hex chars keep the key int64 (the repo
    rule: uint64 keys fall off Arrow's native aggregate path).  8-byte
    keys are the 100 TB shuffle story — window hashes dominate this
    operator's exchange volume (~one row per corpus token)."""
    return int(md5(span.encode("utf-8")).hexdigest()[:15], 16)


def _doc_windows(toks: List[str], width: int) -> List[int]:
    """Window keys for every ``width``-token window, index i = start."""
    return [
        _span_hash(" ".join(toks[i : i + width]))
        for i in range(len(toks) - width + 1)
    ]


def span_dedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    broadcast_max: int = 5_000_000,
    drop_broadcast_max: int = 50_000_000,
) -> ray.data.Dataset:
    """Exact duplicated-span removal (module docstring).

    Output: (id_col, n_tokens, n_dropped, clean_text, clean_chars) —
    the document rebuilt from tokens not covered by any non-first
    occurrence of a duplicated ``width``-token window.

    Plan (mirrors ``line_dedup``'s gated shapes):

    1. one pass: per-batch PARTIAL (window_hash -> count, min packed
       (doc_id, start)) dicts -> groupby(h).aggregate(Sum, Min) — the
       shuffle carries 24 B per distinct window per block, never text.
    2. hot windows (count >= 2) with their first-occurrence key: rare by
       construction (duplicated spans are boilerplate), so under
       ``broadcast_max`` they broadcast as an {h: first_key} dict and a
       second vectorized pass recomputes each doc's windows and drops
       the covered tokens of every non-first hot occurrence.
    3. above the gate: union+groupby semi-join (NOT the native acero
       join — empty hash partitions lose their schema) emits only the
       (doc_id, start) DROP list; under ``drop_broadcast_max`` it is
       broadcast, else ONE doc-keyed shuffle rebuilds per group.
    """

    def explode(t: pa.Table) -> pa.Table:
        agg: Dict[int, List[int]] = {}
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            toks = _TOKEN.findall(txt or "")
            if len(toks) >= _SPAN_SHIFT:
                raise ValueError(
                    f"span_dedup: document {d!r} has {len(toks)} tokens; "
                    f"the (doc_id, start) packing caps docs at "
                    f"{_SPAN_SHIFT - 1} tokens"
                )
            for i, h in enumerate(_doc_windows(toks, width)):
                mk = d * _SPAN_SHIFT + (i + 1)
                cur = agg.get(h)
                if cur is None:
                    agg[h] = [1, mk]
                else:
                    cur[0] += 1
                    if mk < cur[1]:
                        cur[1] = mk
        hs = list(agg.keys())
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "n": pa.array([agg[h][0] for h in hs], pa.int64()),
                "mk": pa.array([agg[h][1] for h in hs], pa.int64()),
            }
        )

    import pyarrow.compute as pc

    counts = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .aggregate(Sum("n", alias_name="n"), Min("mk", alias_name="mk"))
    )
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), 2)).select(["h", "mk"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    n_hot = hot.count()

    def out_schema(ids, n_tok, n_drop, txts):
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_dropped": pa.array(n_drop, pa.int64()),
                "clean_text": pa.array(txts, pa.string()),
                "clean_chars": pa.array([len(x) for x in txts], pa.int64()),
            }
        )

    def rebuild_doc(d, toks: List[str], first_of) -> Tuple[int, str]:
        """first_of: h -> packed first key (only hot windows present)."""
        dropped: Set[int] = set()
        for i, h in enumerate(_doc_windows(toks, width)):
            fk = first_of(h)
            if fk is not None and d * _SPAN_SHIFT + (i + 1) != fk:
                dropped.update(range(i, i + width))
        kept = [tk for j, tk in enumerate(toks) if j not in dropped]
        return len(dropped), " ".join(kept)

    if n_hot <= broadcast_max:
        if n_hot == 0:
            ref = ray.put({})
        else:
            ht = pa.concat_tables(
                ray.get(hot.to_arrow_refs()), promote_options="default"
            )
            ref = ray.put(
                dict(zip(ht.column("h").to_pylist(), ht.column("mk").to_pylist()))
            )

        def rebuild(t: pa.Table) -> pa.Table:
            hm = ray.get(ref)
            ids = t.column(id_col).to_pylist()
            n_tok, n_drop, txts = [], [], []
            for d, txt in zip(ids, t.column(text_col).to_pylist()):
                toks = _TOKEN.findall(txt or "")
                nd, clean = rebuild_doc(d, toks, hm.get)
                n_tok.append(len(toks))
                n_drop.append(nd)
                txts.append(clean)
            return out_schema(t.column(id_col), n_tok, n_drop, txts)

        return ds.map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)

    # hot set too large to broadcast: semi-join occurrences against the
    # hot windows via union + groupby (h) and keep only the DROP list —
    # (doc_id, start) of non-first hot occurrences, O(duplicate
    # occurrences) << O(corpus windows).
    from engine.stages.join import _arrow_types

    id_type = _arrow_types(ds).get(id_col, pa.int64())

    def occ_rows(t: pa.Table) -> pa.Table:
        out_id, out_p, out_h = [], [], []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            toks = _TOKEN.findall(txt or "")
            for i, h in enumerate(_doc_windows(toks, width)):
                out_id.append(d)
                out_p.append(i + 1)
                out_h.append(h)
        n = len(out_id)
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "p": pa.array(out_p, pa.int64()),
                "h": pa.array(out_h, pa.int64()),
                "mk": pa.array([-1] * n, pa.int64()),
                "_hot": pa.array([False] * n, pa.bool_()),
            }
        )

    def hot_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_col: pa.array([None] * n, id_type),
                "p": pa.array([-1] * n, pa.int64()),
                "h": t.column("h"),
                "mk": t.column("mk"),
                "_hot": pa.array([True] * n, pa.bool_()),
            }
        )

    unioned = ds.map_batches(
        occ_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(hot.map_batches(hot_rows, batch_format="pyarrow", zero_copy_batch=True))

    def hits(df) -> "pd.DataFrame":
        hot_mask = df["_hot"]
        if not hot_mask.any():
            return df[[id_col, "p"]].iloc[0:0]
        fk = int(df.loc[hot_mask, "mk"].iloc[0])
        out = df[~hot_mask][[id_col, "p"]].copy()
        if pa.types.is_integer(id_type):
            # null-id marker rows promote ids to float64 in pandas
            out[id_col] = out[id_col].astype("int64")
        packed = out[id_col].astype("int64") * _SPAN_SHIFT + out["p"].astype("int64")
        return out[packed != fk]

    drops = unioned.groupby("h").map_groups(hits, batch_format="pandas").materialize()
    n_drops = drops.count()

    if n_drops <= drop_broadcast_max:
        drop_map: Dict = {}
        if n_drops:
            dt = pa.concat_tables(
                ray.get(drops.to_arrow_refs()), promote_options="default"
            )
            for d, p in zip(
                dt.column(id_col).to_pylist(), dt.column("p").to_pylist()
            ):
                drop_map.setdefault(d, []).append(p)
        dref = ray.put(drop_map)

        def rebuild_by_start(t: pa.Table) -> pa.Table:
            dm = ray.get(dref)
            ids = t.column(id_col).to_pylist()
            n_tok, n_drop, txts = [], [], []
            for d, txt in zip(ids, t.column(text_col).to_pylist()):
                toks = _TOKEN.findall(txt or "")
                starts = dm.get(d)
                if not starts:
                    n_tok.append(len(toks))
                    n_drop.append(0)
                    txts.append(" ".join(toks))
                    continue
                dropped: Set[int] = set()
                for p in starts:
                    dropped.update(range(p - 1, p - 1 + width))
                kept = [tk for j, tk in enumerate(toks) if j not in dropped]
                n_tok.append(len(toks))
                n_drop.append(len(dropped))
                txts.append(" ".join(kept))
            return out_schema(t.column(id_col), n_tok, n_drop, txts)

        return ds.map_batches(
            rebuild_by_start, batch_format="pyarrow", zero_copy_batch=True
        )

    # drop list too large to broadcast: ONE doc-keyed shuffle — union the
    # docs with their drop rows and rebuild per group
    def doc_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_col: t.column(id_col),
                text_col: t.column(text_col),
                "p": pa.array([-1] * n, pa.int64()),
            }
        )

    def drop_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_col: t.column(id_col),
                text_col: pa.array([None] * n, pa.string()),
                "p": t.column("p"),
            }
        )

    both = ds.map_batches(
        doc_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(drops.map_batches(drop_rows, batch_format="pyarrow", zero_copy_batch=True))

    def rebuild_group(df) -> "pd.DataFrame":
        import pandas as pd

        doc = df[df["p"] < 0]
        txt = doc[text_col].iloc[0]
        toks = _TOKEN.findall(txt or "")
        dropped: Set[int] = set()
        for p in df.loc[df["p"] > 0, "p"].astype("int64").tolist():
            dropped.update(range(p - 1, p - 1 + width))
        kept = [tk for j, tk in enumerate(toks) if j not in dropped]
        clean = " ".join(kept)
        return pd.DataFrame(
            {
                id_col: pd.Series([doc[id_col].iloc[0]], dtype=doc[id_col].dtype),
                "n_tokens": pd.Series([len(toks)], dtype="int64"),
                "n_dropped": pd.Series([len(dropped)], dtype="int64"),
                "clean_text": [clean],
                "clean_chars": pd.Series([len(clean)], dtype="int64"),
            }
        )

    return both.groupby(id_col).map_groups(rebuild_group, batch_format="pandas")


# --- corpus-vs-corpus n-gram overlap (distributed semi-join) -------------

def corpus_overlap(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    n_buckets: Optional[int] = None,
    est_docs: Optional[int] = None,
) -> ray.data.Dataset:
    """Corpus-vs-corpus word n-gram overlap, fully distributed: for each
    document in corpus A, how many of its DISTINCT word ``n``-grams occur
    anywhere in corpus B.

    ``decontam`` above broadcasts the small side's gram set — right for
    eval benchmarks (tiny by definition), wrong when BOTH sides are
    corpus-scale.  Here nothing is ever collected on the driver and
    nothing is broadcast: both sides emit 63-bit FNV-1a gram-hash rows
    (collision odds ~|grams|^2/2^63 — the SQL oracle groups the strings
    themselves and agrees on the fixture), and membership is resolved by
    ONE union + groupby semi-join (never the native acero join — empty
    hash partitions lose their schema).  The groupby key is a HASH BUCKET
    (h % n_buckets), not h itself: equal hashes still co-locate, but each
    Python group call resolves thousands of hashes VECTORIZED (np.isin +
    one pandas groupby) instead of paying per-group overhead per distinct
    gram — measured 5x on the sf0.01 fixture, and the win grows with
    gram count.  Buckets are uniform by construction (63-bit hash), so no
    hot group; ``n_buckets`` auto-sizes from the doc counts so a bucket's
    rows stay group-task sized at any corpus scale.  Per-doc totals ride
    the same shuffle as one sentinel row per document (tot >= 0, passed
    through).  The exchange carries ~25-byte (hash, bucket, doc_id, flag)
    rows, never text; the final per-doc reduce pre-aggregates per block.

    Output: (id_col, n_grams, overlap_grams) per corpus-A document.
    """
    _MASK63 = (1 << 63) - 1
    if n_buckets is None:
        # ~512 distinct grams/doc is a generous estimate; target ~200k
        # rows per bucket so a group task stays comfortably in memory.
        # Prefer the caller's est_docs (e.g. from parquet footers): a
        # count() here EXECUTES both lazy input pipelines once just to
        # size buckets, then the union re-executes them for the gram rows
        # — double input I/O.  Any same-order estimate works; buckets are
        # uniform by construction.
        if est_docs is None:
            est_docs = ds_a.count() + ds_b.count()
        est_rows = est_docs * 512
        n_buckets = int(min(1 << 20, max(16, est_rows // 200_000)))

    def a_rows(t: pa.Table) -> pa.Table:
        out_h: List[int] = []
        out_id: List[int] = []
        out_tot: List[int] = []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            grams = sorted(_word_ngrams(txt, n))
            hv = fnv1a_batch([g.encode("utf-8") for g in grams])
            out_h.extend((int(x) & _MASK63) for x in hv)
            out_id.extend([d] * len(grams))
            out_tot.extend([-1] * len(grams))
            # the per-doc total rides the same shuffle (tot >= 0 marks it)
            out_h.append(-(d + 1))
            out_id.append(d)
            out_tot.append(len(grams))
        hs = np.asarray(out_h, dtype=np.int64)
        return pa.table(
            {
                "bk": pa.array(np.mod(hs, n_buckets), pa.int64()),
                "h": pa.array(hs, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "tot": pa.array(out_tot, pa.int64()),
                "_b": pa.array([False] * len(out_h), pa.bool_()),
            }
        )

    def b_rows(t: pa.Table) -> pa.Table:
        grams: Set[str] = set()
        for txt in t.column(text_col).to_pylist():
            grams |= _word_ngrams(txt, n)
        gl = sorted(grams)
        hv = fnv1a_batch([g.encode("utf-8") for g in gl])
        hs = np.asarray([int(x) & _MASK63 for x in hv], dtype=np.int64)
        m = len(hs)
        return pa.table(
            {
                "bk": pa.array(np.mod(hs, n_buckets), pa.int64()),
                "h": pa.array(hs, pa.int64()),
                id_col: pa.array([None] * m, pa.int64()),
                "tot": pa.array([-1] * m, pa.int64()),
                "_b": pa.array([True] * m, pa.bool_()),
            }
        )

    unioned = ds_a.map_batches(
        a_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(ds_b.map_batches(b_rows, batch_format="pyarrow", zero_copy_batch=True))

    def resolve_bucket(df) -> "pd.DataFrame":
        import pandas as pd

        out = []
        sent = df["tot"] >= 0
        if sent.any():
            # sentinel rows: unique per doc, pass totals through
            out.append(
                pd.DataFrame(
                    {
                        # null-id B rows promote ids to float64 in pandas
                        id_col: df.loc[sent, id_col].astype("int64").to_numpy(),
                        "n_grams": df.loc[sent, "tot"].astype("int64").to_numpy(),
                        "overlap_grams": np.zeros(int(sent.sum()), dtype=np.int64),
                    }
                )
            )
        a_mask = (~sent) & (~df["_b"])
        if a_mask.any():
            bh = df.loc[df["_b"], "h"].to_numpy()
            hit = np.isin(df.loc[a_mask, "h"].to_numpy(), bh).astype(np.int64)
            agg = (
                pd.DataFrame(
                    {
                        id_col: df.loc[a_mask, id_col].astype("int64").to_numpy(),
                        "hit": hit,
                    }
                )
                .groupby(id_col, as_index=False)["hit"]
                .sum()
            )
            out.append(
                pd.DataFrame(
                    {
                        id_col: agg[id_col].astype("int64"),
                        "n_grams": np.zeros(len(agg), dtype=np.int64),
                        "overlap_grams": agg["hit"].astype("int64"),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    "overlap_grams": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    resolved = unioned.groupby("bk").map_groups(
        resolve_bucket, batch_format="pandas"
    )
    # Arrow-convert before the second shuffle (pandas-block groupby is
    # ~20x slower; PERF.md #31)
    return as_arrow(resolved).groupby(id_col).aggregate(
        Sum("n_grams", alias_name="n_grams"),
        Sum("overlap_grams", alias_name="overlap_grams"),
    )


# --- all-pairs slice overlap (bitmask device, no pair joins) --------------

def source_overlap(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT pairwise Jaccard overlap between every pair of corpus slices
    over distinct-token sets: ``(src_a, src_b, inter, uni, jacc_ppm)``
    with ``jacc_ppm = floor(1e6 * |A∩B| / |A∪B|)`` — all integers, so the
    result is bit-exact and SQL-verifiable.  The mixture-design signal:
    which sources are near-duplicates of each other before weighting.

    The bitmask device: a naive all-pairs overlap is a self-join of the
    (slice, token) table — quadratic in slices and token-heavy.  Instead
    each token resolves to ONE int64 bitmask of the slices containing it
    (slice count <= 63; wider fleets chunk the mask into multiple words),
    masks reduce to driver-sized ``(mask, count)`` rows, and every pair
    statistic is a popcount sum over that tiny table:

        inter(i,j) = sum counts of masks containing bits i and j
        |S_i|      = sum counts of masks containing bit i

    Scale shape: per-batch distinct-(slice, token) Counter partials (text
    never shuffles), ONE coarse token-hash-bucket groupby (PERF.md #31 —
    per-token OR resolved vectorized inside the bucket via factorize +
    bitwise_or.reduceat, no per-group Python), <= distinct-masks rows per
    bucket to the driver.  No join anywhere."""
    import pandas as pd

    from engine.stages.common import collect_arrow_blocks
    from engine.stages.text import fnv1a_batch

    # slice universe (driver-sized): deterministic lexicographic bit order
    groups: Set[str] = set()
    for blk in collect_arrow_blocks(
        ds.map_batches(
            lambda t: pa.table({group_col: t.column(group_col).unique()}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        required_col=group_col,
    ):
        groups.update(blk.column(group_col).to_pylist())
    names = sorted(g for g in groups if g is not None)
    empty = pa.table(
        {
            "src_a": pa.array([], pa.string()),
            "src_b": pa.array([], pa.string()),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64()),
            "jacc_ppm": pa.array([], pa.int64()),
        }
    )
    if len(names) < 2:
        return ray.data.from_arrow(empty)
    if len(names) > 63:
        raise NotImplementedError(
            "source_overlap packs slice membership into one int64 mask; "
            ">63 slices need the multi-word mask extension"
        )
    bit = {g: i for i, g in enumerate(names)}

    def partial(t: pa.Table, bit=bit) -> pa.Table:
        # one fused pass: (token, mask, bucket) — fusing keeps the
        # zero-row-block bypass surface to a single stage (empty input
        # blocks skip map fns and keep their upstream schema, CLAUDE.md)
        m: Dict[str, int] = {}
        for g, txt in zip(
            t.column(group_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            if g is None:
                continue
            b = 1 << bit[g]
            for tok in set(_TOKEN.findall(txt or "")):
                m[tok] = m.get(tok, 0) | b
        toks = list(m.keys())
        tb = (
            fnv1a_batch([s.encode("utf-8") for s in toks])
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "mask": pa.array([m[k] for k in toks], pa.int64()),
                "tb": pa.array(tb, pa.int64()),
            }
        )

    def resolve(df: "pd.DataFrame") -> "pd.DataFrame":
        codes, _ = pd.factorize(df["token"], sort=False)
        order = np.argsort(codes, kind="stable")
        masks = df["mask"].to_numpy()[order]
        bounds = np.flatnonzero(np.diff(codes[order], prepend=-1))
        per_token = np.bitwise_or.reduceat(masks, bounds)
        mask_vals, mask_cnts = np.unique(per_token, return_counts=True)
        return pd.DataFrame({"mask": mask_vals, "cnt": mask_cnts.astype(np.int64)})

    counts: Counter = Counter()
    bucketed = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(resolve, batch_format="pandas")
    )
    for blk in collect_arrow_blocks(bucketed, required_col="cnt"):
        for m, c in zip(blk.column("mask").to_pylist(), blk.column("cnt").to_pylist()):
            counts[int(m)] += int(c)

    sizes = [0] * len(names)
    for m, c in counts.items():
        for i in range(len(names)):
            if m >> i & 1:
                sizes[i] += c
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            both = (1 << i) | (1 << j)
            inter = sum(c for m, c in counts.items() if m & both == both)
            uni = sizes[i] + sizes[j] - inter
            rows.append(
                (names[i], names[j], inter, uni, inter * 1_000_000 // uni if uni else 0)
            )
    return ray.data.from_arrow(
        pa.table(
            {
                "src_a": pa.array([r[0] for r in rows], pa.string()),
                "src_b": pa.array([r[1] for r in rows], pa.string()),
                "inter": pa.array([r[2] for r in rows], pa.int64()),
                "uni": pa.array([r[3] for r in rows], pa.int64()),
                "jacc_ppm": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
    )


def normalize_text(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Unicode + whitespace normalization (the first stage of every web
    cleaning chain: CCNet normalizes before hashing, arXiv:1911.00359 §3).

    NFC-normalize, replace C0/DEL control characters with spaces, collapse
    whitespace runs, trim.  ONE stateless map_batches with no shuffle and
    no state; control/whitespace handling is Arrow RE2 kernels.

    NFC composition: ``pc.utf8_normalize(form="NFC")`` in the installed
    Arrow performs canonical DEcomposition+reorder but does NOT recompose
    (measured: e+U+0301 stays two codepoints), which diverges from every
    conformant normalizer.  So composition uses ``unicodedata.normalize``
    (CPython's C implementation) on the NON-ASCII rows only — the ASCII
    fast path is a vectorized ``binary_length != utf8_length`` mask, and
    on web text the slow path is a single C call per non-ASCII row.

    NFC (not NFKC) so the operator is SQL-verifiable bit-for-bit: DuckDB
    ships only ``nfc_normalize``.  Emits ``norm_text``, ``changed``
    (0/1 vs the input), ``n_chars`` (codepoints).
    """

    def norm(t: pa.Table) -> pa.Table:
        import unicodedata

        import pyarrow.compute as pc

        txt = t.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            # replace_with_mask requires a plain Array (mask too)
            txt = txt.combine_chunks()
            if isinstance(txt, pa.ChunkedArray):
                txt = (
                    txt.chunk(0) if txt.num_chunks else pa.array([], pa.string())
                )
        nonascii = pc.fill_null(
            pc.not_equal(pc.binary_length(txt), pc.utf8_length(txt)), False
        )
        if pc.any(nonascii).as_py():
            # splice only the flagged rows (replace_with_mask): on web
            # text most batches contain SOME non-ASCII row, and a full
            # pandas-object round trip of the whole batch would defeat
            # the fast path
            idx = np.flatnonzero(nonascii.to_numpy(zero_copy_only=False))
            repl = pa.array(
                [unicodedata.normalize("NFC", txt[int(i)].as_py()) for i in idx],
                pa.string(),
            )
            out = pc.replace_with_mask(txt, nonascii, repl)
        else:
            out = txt
        out = pc.replace_substring_regex(out, pattern=r"[\x00-\x1f\x7f]", replacement=" ")
        out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
        out = pc.utf8_trim_whitespace(out)
        changed = pc.cast(pc.invert(pc.equal(out, txt)), pa.int64())
        return pa.table(
            {
                id_col: t.column(id_col),
                "norm_text": out,
                "changed": changed,
                "n_chars": pc.cast(pc.utf8_length(out), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def ngram_novelty(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_buckets: int = 64,
    doc_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-document n-gram novelty: of a document's DISTINCT word n-grams,
    the fraction that occur in NO other document — the inverse of the
    repetition/boilerplate signals (a low-novelty doc is assembled from
    corpus-common phrases; a high-novelty doc is fresh text).  Emits
    (doc_id, n_grams, uniq_grams, novelty_ppm), integer-exact, SQL-green.

    Shape (the corpus_overlap/bigram_nll device): each doc emits its
    distinct 63-bit FNV gram hashes ONCE (one fnv1a_batch call per batch,
    flattened); df resolves in ONE coarse hash(h)-bucket groupby (all
    rows of an h co-locate; df == rows), per-doc bucket partials
    (uniq_in_bucket, tot_in_bucket) are vectorized bincounts; a second
    coarse doc-bucket groupby sums the <= docs x buckets partial rows.
    Text never shuffles.  A negative-hash sentinel row per doc rides the
    first shuffle so zero-gram docs stay in the output with tot=0
    (mirrors the oracle's LEFT JOIN).
    """

    def pairs(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        flat: List[bytes] = []
        out_d: List[int] = []
        sent_d: List[int] = []
        for d, txt in zip(ids, texts):
            grams = _word_ngrams(txt, n)
            flat.extend(g.encode("utf-8") for g in grams)
            out_d.extend([int(d)] * len(grams))
            sent_d.append(int(d))
        if flat:
            h = (fnv1a_batch(flat) & np.uint64((1 << 63) - 1)).astype(np.int64)
        else:
            h = np.empty(0, dtype=np.int64)
        hb = h % np.int64(n_buckets)
        d_arr = np.asarray(out_d + sent_d, dtype=np.int64)
        h_all = np.concatenate([h, np.full(len(sent_d), -1, dtype=np.int64)])
        hb_all = np.concatenate(
            [hb, np.asarray(sent_d, dtype=np.int64) % np.int64(n_buckets)]
        )
        return pa.table(
            {
                "hb": pa.array(hb_all, pa.int64()),
                "h": pa.array(h_all, pa.int64()),
                "d": pa.array(d_arr, pa.int64()),
            }
        )

    def bucket_reduce(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        sent = df[df["h"] < 0]
        real = df[df["h"] >= 0]
        parts = []
        if len(real):
            hc, _ = pd.factorize(real["h"], sort=False)
            df_per_h = np.bincount(hc)
            uniq_row = df_per_h[hc] == 1
            dc, dvals = pd.factorize(real["d"], sort=False)
            tot = np.bincount(dc)
            uniq = np.bincount(dc, weights=uniq_row).astype(np.int64)
            parts.append(
                pd.DataFrame(
                    {
                        "d": dvals.astype(np.int64),
                        "uniq": uniq,
                        "tot": tot.astype(np.int64),
                    }
                )
            )
        if len(sent):
            parts.append(
                pd.DataFrame(
                    {
                        "d": sent["d"].to_numpy(np.int64),
                        "uniq": np.zeros(len(sent), np.int64),
                        "tot": np.zeros(len(sent), np.int64),
                    }
                )
            )
        if not parts:
            return pd.DataFrame(
                {
                    "d": np.asarray([], np.int64),
                    "uniq": np.asarray([], np.int64),
                    "tot": np.asarray([], np.int64),
                }
            )
        return pd.concat(parts, ignore_index=True)

    def add_db(t: pa.Table) -> pa.Table:
        db = t.column("d").to_numpy(zero_copy_only=False) % np.int64(doc_buckets)
        return t.append_column("db", pa.array(db, pa.int64()))

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = df.groupby("d", sort=False, as_index=False)[["uniq", "tot"]].sum()
        tot = g["tot"].to_numpy(np.int64)
        uniq = g["uniq"].to_numpy(np.int64)
        ppm = np.where(tot > 0, uniq * np.int64(1_000_000) // np.maximum(tot, 1), 0)
        return pd.DataFrame(
            {
                "doc_id": g["d"].to_numpy(np.int64),
                "n_grams": tot,
                "uniq_grams": uniq,
                "novelty_ppm": ppm.astype(np.int64),
            }
        )

    return (
        as_arrow(
            ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("hb")
            .map_groups(
                lambda df: bucket_reduce(df.drop(columns=["hb"])),
                batch_format="pandas",
            )
        )
        .map_batches(add_db, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("db")
        .map_groups(
            lambda df: final(df.drop(columns=["db"])), batch_format="pandas"
        )
    )


def encoding_anomalies(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-document encoding-damage signal — the mojibake/truncation
    detector webtext cleaners run before training (replacement chars mean
    a decoder already lost bytes; stray C0 controls mean binary leaked
    into text): counts of U+FFFD and of C0/DEL controls that are NOT
    whitespace (\\t \\n \\x0b \\x0c \\r are legitimate), and the combined
    rate in exact integer ppm of the codepoint count.  Pure RE2 Arrow
    kernels, one pass, no shuffle; docs with empty text drop (no rate).
    SQL-verified bit-for-bit (same regex classes, floor division)."""
    import numpy as np
    import pyarrow.compute as pc

    def per_batch(t: pa.Table) -> pa.Table:
        col = pc.fill_null(t.column(text_col), "")
        n_chars = (
            pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        n_repl = (
            pc.count_substring_regex(col, pattern="\N{REPLACEMENT CHARACTER}")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_ctrl = (
            pc.count_substring_regex(
                col, pattern=r"[\x00-\x08\x0e-\x1f\x7f]"
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = n_chars > 0
        nc, nr, nt = n_chars[keep], n_repl[keep], n_ctrl[keep]
        ppm = (1_000_000 * (nr + nt)) // nc
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()).filter(pa.array(keep)),
                "n_chars": pa.array(nc, pa.int64()),
                "n_replacement": pa.array(nr, pa.int64()),
                "n_control": pa.array(nt, pa.int64()),
                "anomaly_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
