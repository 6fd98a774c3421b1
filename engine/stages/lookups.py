"""Rank-file parsing + lookup-table preparation.

Reference: the ``prepare-lookups`` entry point
(/root/reference/warc_indexer/index.py:197-242) reads newline-delimited rank
files (``UnfusedReadFromText``), parses ``<id> <value>`` / ``<value> <id>``
lines (process.py:477-505, silently dropping malformed lines), re-keys ids
to Webis UUIDs (process.py:333-344) and stores a Redis hash.

Ray-Data-native: ``read_text`` (native parallel line reader replaces the
hand-built splittable DoFn, SURVEY.md §2.1 S4-S6) -> vectorized parse in
``map_batches`` -> ``write_parquet`` of a lookup table that the extract
stage broadcast-joins (SURVEY.md §2.5 J1-J2).  No external KV store.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from engine.ids import webis_uuid_batch

_SPACE = re.compile(r"\s+")


def _parse_lines(batch: pa.Table, value_first: bool, val_type: str) -> pa.Table:
    """Split lines into (id, value); malformed lines are silently dropped
    (reference map_id_val/map_val_id semantics, process.py:486-490)."""
    ids, vals = [], []
    for line in batch.column("text").to_pylist():
        if line is None:
            continue
        parts = _SPACE.split(line.strip(), maxsplit=1)
        if len(parts) != 2:
            continue
        k, v = (parts[1], parts[0]) if value_first else (parts[0], parts[1])
        try:
            vals.append(int(v) if val_type == "int" else float(v))
            ids.append(k)
        except ValueError:
            continue
    vt = pa.int64() if val_type == "int" else pa.float64()
    return pa.table({"id": pa.array(ids, pa.string()), "value": pa.array(vals, vt)})


def parse_rank_file(
    path: str, *, value_first: bool, val_type: str = "float"
) -> ray.data.Dataset:
    """read_text -> (id, value) rows.

    ``value_first=True`` parses ``<value> <id>`` lines (spam ranks,
    index.py:231), False parses ``<id> <value>`` (page ranks, index.py:236).
    """
    return ray.data.read_text(path).map_batches(
        _parse_lines,
        fn_kwargs=dict(value_first=value_first, val_type=val_type),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def rekey_to_webis_uuid(ds: ray.data.Dataset, corpus_prefix: str) -> ray.data.Dataset:
    """(id, value) -> (doc_id=webis_uuid(prefix, id), value); M11."""

    def rekey(t: pa.Table) -> pa.Table:
        uuids = webis_uuid_batch(corpus_prefix, t.column("id").to_pylist())
        return pa.table({"doc_id": pa.array(uuids, pa.string()), "value": t.column("value")})

    return ds.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True)


def prepare_lookups(
    out_path: str,
    corpus_prefix: str,
    spam_ranks_path: Optional[str] = None,
    page_ranks_path: Optional[str] = None,
) -> str:
    """Build the lookup Parquet table (doc_id, spam_rank, page_rank).

    Replaces the reference's Redis hash sink (AddToRedisHash,
    process.py:510-554): the downstream join reads this table once per actor
    (broadcast).  Outer-merges the two rank sources by doc_id.
    """
    import pandas as pd

    frames = []
    if spam_ranks_path:
        spam = rekey_to_webis_uuid(
            parse_rank_file(spam_ranks_path, value_first=True, val_type="int"),
            corpus_prefix,
        ).to_pandas()
        frames.append(spam.rename(columns={"value": "spam_rank"}))
    if page_ranks_path:
        page = rekey_to_webis_uuid(
            parse_rank_file(page_ranks_path, value_first=False, val_type="float"),
            corpus_prefix,
        ).to_pandas()
        frames.append(page.rename(columns={"value": "page_rank"}))

    if not frames:
        merged = pd.DataFrame({"doc_id": [], "spam_rank": [], "page_rank": []})
    elif len(frames) == 1:
        merged = frames[0]
    else:
        merged = frames[0].merge(frames[1], on="doc_id", how="outer")
    for col in ("spam_rank", "page_rank"):
        if col not in merged.columns:
            merged[col] = np.nan
    merged = merged.sort_values("doc_id").reset_index(drop=True)
    t = pa.table(
        {
            "doc_id": pa.array(merged["doc_id"], pa.string()),
            "spam_rank": pa.array(
                [None if pd.isna(v) else int(v) for v in merged["spam_rank"]], pa.int64()
            ),
            "page_rank": pa.array(
                [None if pd.isna(v) else float(v) for v in merged["page_rank"]],
                pa.float64(),
            ),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(t, out_path)
    return out_path
