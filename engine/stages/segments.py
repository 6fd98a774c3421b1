"""Index-segment lifecycle: merge and tombstones (Lucene/ES semantics).

The reference's terminal store is Elasticsearch
(`/root/reference/warc_indexer/indexer/es_sink.py`); the part of ES the
indexer feeds is Lucene's SEGMENT machinery — each refresh writes an
immutable segment (its own term dictionary + postings), background
merges stitch segments together by REMAPPING term ids through a merged
dictionary, and deletes are tombstones filtered at read time until a
merge reclaims them.  These operators materialize those two lifecycle
steps Ray-Data-first so the index half of the engine is inspectable
without an ES cluster (companions to ``index_build.term_stats`` /
``postings``):

``segment_merge``
    Build ``n_segments`` immutable segments (doc -> segment by
    ``doc_id % n_segments``), each with its OWN sorted term dictionary
    (local term ids) and postings, then merge: the merged dictionary is
    the sorted union of the per-segment dictionaries and every posting
    is remapped ``local_term_id -> term_id``.  Output carries both ids
    so the remap itself is verifiable row-by-row.

``apply_deletes``
    Merge-on-read over a tombstone set: per-token ``df_total`` (stored
    df), ``df_live`` / ``cf_live`` (what a searcher actually sees) —
    the dictionary-level view ES exposes as ``docs.count`` vs
    ``docs.deleted``.

Shapes at 100 TB:
- One tokenize pass emits (seg, token, doc_id, tf) rows; they ARE the
  stored segment postings, so materializing them mirrors what a real
  index holds on disk (output scales with distinct (token, doc) pairs,
  never with text size — text never shuffles).
- Term dictionaries are the vocab-sized small side: per-batch DISTINCT
  (seg, token) partials reduce on the driver (driver-sized keys rule,
  CLAUDE.md) behind an explicit ``dict_max`` gate; the merged remap
  ships ONCE via ``ray.put`` and the remap pass is stateless map_batches
  with per-segment ``pc.index_in`` — no shuffle.  A vocabulary beyond
  ``dict_max`` needs the join fallback documented below rather than a
  silent driver OOM.
- ``apply_deletes`` pre-aggregates per-batch Counter partials so the
  only shuffle moves (token, df, df_live, cf_live) rows, exactly like
  ``index_build.term_stats``.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, List, Set, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from engine.stages.text import _TOKEN

_POSTINGS_SCHEMA = {
    "seg": pa.int64(),
    "token": pa.string(),
    "doc_id": pa.int64(),
    "tf": pa.int64(),
}


def _empty(cols: dict) -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in cols.items()})


def _tf_rows(n_segments: int, id_col: str, text_col: str):
    """Per-batch (seg, token, doc_id, tf) partials — one tokenize pass."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(_POSTINGS_SCHEMA)
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        out_seg: List[int] = []
        out_tok: List[str] = []
        out_id: List[int] = []
        out_tf: List[int] = []
        for i, txt in enumerate(texts):
            cnt = Counter(_TOKEN.findall(txt or ""))
            did = int(ids[i])
            seg = did % n_segments
            for tok, c in cnt.items():
                out_seg.append(seg)
                out_tok.append(tok)
                out_id.append(did)
                out_tf.append(c)
        return pa.table(
            {
                "seg": pa.array(out_seg, pa.int64()),
                "token": pa.array(out_tok, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    return fn


def segment_merge(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_segments: int = 3,
    dict_max: int = 500_000,
) -> ray.data.Dataset:
    """Merge ``n_segments`` per-segment inverted indexes into one.

    Returns (term_id, token, seg, local_term_id, doc_id, tf) sorted by
    (term_id, doc_id): ``local_term_id`` is the token's rank in its
    segment's own sorted dictionary (what the segment stored),
    ``term_id`` its rank in the merged dictionary (what the merge
    rewrote it to) — Lucene's ``MergeState.DocMap`` analog on the term
    side.  Raises if the union dictionary exceeds ``dict_max`` entries
    (the driver-reduce gate; beyond it the dictionaries themselves need
    a distributed build: dense_rank via sort + cumulative offsets).
    """
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    rows = ds.map_batches(
        _tf_rows(n_segments, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # the stored segments; reused by dict pass + remap

    # dictionary pass: per-batch DISTINCT (seg, token) -> driver union
    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.select(["seg", "token"]).group_by(["seg", "token"]).aggregate([])

    from engine.stages.common import collect_arrow_blocks

    pair_blocks = collect_arrow_blocks(
        rows.map_batches(
            distinct_pairs, batch_format="pyarrow", zero_copy_batch=True
        ),
        required_col="token",
    )
    out_schema = {
        "term_id": pa.int64(),
        "token": pa.string(),
        "seg": pa.int64(),
        "local_term_id": pa.int64(),
        "doc_id": pa.int64(),
        "tf": pa.int64(),
    }
    if not pair_blocks:
        return ray.data.from_arrow(_empty(out_schema))
    pairs: Set[Tuple[int, str]] = set()
    for blk in pair_blocks:
        pairs.update(
            zip(blk.column("seg").to_pylist(), blk.column("token").to_pylist())
        )
        if len(pairs) > dict_max:
            raise ValueError(
                f"segment dictionaries exceed dict_max={dict_max}; "
                "use a distributed dictionary build for this vocabulary"
            )
    seg_dicts: dict[int, pa.Array] = {}
    for s in sorted({p[0] for p in pairs}):
        seg_dicts[s] = pa.array(
            sorted(tok for g, tok in pairs if g == s), pa.string()
        )
    merged = pa.array(sorted({tok for _, tok in pairs}), pa.string())
    remap_ref = ray.put((seg_dicts, merged))

    def remap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(out_schema)
        import pyarrow.compute as pc

        sd, md = ray.get(remap_ref)
        seg = t.column("seg").to_numpy(zero_copy_only=False).astype(np.int64)
        tok = t.column("token")
        gid = pc.index_in(tok, value_set=md).to_numpy(zero_copy_only=False)
        lid = np.zeros(t.num_rows, dtype=np.int64)
        for s, d in sd.items():
            mask = seg == s
            if not mask.any():
                continue
            li = pc.index_in(tok.filter(pa.array(mask)), value_set=d)
            lid[mask] = li.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "term_id": pa.array(gid.astype(np.int64), pa.int64()),
                "token": tok,
                "seg": t.column("seg"),
                "local_term_id": pa.array(lid, pa.int64()),
                "doc_id": t.column("doc_id"),
                "tf": t.column("tf"),
            }
        )

    return rows.map_batches(
        remap, batch_format="pyarrow", zero_copy_batch=True
    ).sort(key=["term_id", "doc_id"])


def apply_deletes(
    ds: ray.data.Dataset,
    deleted_ids: Iterable[int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    deleted_max: int = 5_000_000,
) -> ray.data.Dataset:
    """Merge-on-read dictionary stats under a tombstone set.

    Returns (token, df_total, df_live, cf_live): stored document
    frequency vs what a searcher sees after filtering ``deleted_ids``
    — ES's ``docs.count`` / ``docs.deleted`` split at term granularity.
    The tombstone set ships once (``ray.put``); per-batch Counter
    partials mean the groupby moves (token, 3 ints) rows only.
    """
    dels = frozenset(int(x) for x in deleted_ids)
    if len(dels) > deleted_max:
        raise ValueError(
            f"tombstone set {len(dels)} exceeds deleted_max={deleted_max}; "
            "switch to the semi-join form (union + groupby on doc_id)"
        )
    dels_ref = ray.put(dels)
    out_schema = {
        "token": pa.string(),
        "df_total": pa.int64(),
        "df_live": pa.int64(),
        "cf_live": pa.int64(),
    }

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty(out_schema)
        dd = ray.get(dels_ref)
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_pylist()
        df: Counter = Counter()
        df_live: Counter = Counter()
        cf_live: Counter = Counter()
        for i, txt in enumerate(texts):
            cnt = Counter(_TOKEN.findall(txt or ""))
            df.update(cnt.keys())
            if int(ids[i]) not in dd:
                df_live.update(cnt.keys())
                cf_live.update(cnt)
        toks = list(df.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df_total": pa.array([df[k] for k in toks], pa.int64()),
                "df_live": pa.array([df_live[k] for k in toks], pa.int64()),
                "cf_live": pa.array([cf_live[k] for k in toks], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(
            Sum("df_total", alias_name="df_total"),
            Sum("df_live", alias_name="df_live"),
            Sum("cf_live", alias_name="cf_live"),
        )
    )
