"""Pages-table source helpers (replaces the reference WARC reader,
/root/reference/warc_indexer/indexer/warcio.py:46-198).

Ray's ``read_parquet`` natively provides what the reference hand-builds with
MatchFiles | Reshuffle | splittable DoFn: file globbing, per-file/row-group
block splitting, task retries, and streaming scheduling (SURVEY.md §2.1).
"""

from __future__ import annotations

import base64
from typing import List, Optional

import pyarrow as pa
import ray.data

from engine.schema import PAGES


def _to_naive_utc(v):
    """Normalize a datetime to a naive UTC instant: tz-aware values are
    CONVERTED to UTC before the tzinfo is dropped (a bare replace() would
    store the local wall-clock, making identical instants with different
    offsets yield different warc_ts values)."""
    import datetime as _dt

    if v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def read_pages(
    path: str,
    columns: Optional[List[str]] = None,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Read a pages Parquet table/directory, pruning columns at the read.

    Always pass ``columns`` when a stage needs only a subset (e.g. the
    frontier seed loader needs just ``url``) — at 100 TB the ``html`` column
    dominates and must not leave storage unless extraction runs.
    """
    if is_warc_path(path):
        from engine.sources.warc import read_warc

        return read_warc(
            path, columns=columns, override_num_blocks=override_num_blocks
        )
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def is_warc_path(path: str) -> bool:
    """True when ``path`` is a WARC file or a directory of WARC files —
    dispatches read_pages to the container reader (engine.sources.warc).
    The SINGLE format sniffer: the resumable index pipeline reuses it so
    the two dispatch points cannot drift.  A directory holding BOTH
    parquet and WARC files is treated as parquet (with a warning) —
    mixed-format page dirs are a layout error, not a supported input."""
    import os as _os

    if str(path).endswith((".warc", ".warc.gz")):
        return True
    if _os.path.isdir(path):
        names = _os.listdir(path)
        has_warc = any(n.endswith((".warc", ".warc.gz")) for n in names)
        has_parquet = any(n.endswith(".parquet") for n in names)
        if has_warc and has_parquet:
            import warnings

            warnings.warn(
                f"pages dir {path!r} mixes .parquet and .warc files; "
                "reading the parquet files only",
                stacklevel=2,
            )
        return has_warc and not has_parquet
    return False


def read_pages_jsonl(
    path: str,
    columns: Optional[List[str]] = None,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Read a pages table from JSONL files into the canonical PAGES schema.

    Second source format alongside Parquet (crawl dumps frequently ship as
    line-delimited JSON).  Per-record fields:

    - ``url``        : string (required)
    - ``warc_ts``    : ISO-8601 string or epoch microseconds (optional)
    - ``html_b64``   : base64-encoded page bytes (JSON cannot carry raw
                       binary — the standard encoding for html payloads)
    - ``text``/``lang``: optional pass-through enrichment columns

    Output schema is exactly ``engine.schema.PAGES`` (url, warc_ts, html,
    text, lang) so every downstream pipeline (extraction, crawl, bucketize)
    consumes it unchanged.  Column pruning happens after decode — JSON has
    no columnar projection; prefer Parquet at scale (this reader exists for
    ingest interoperability, not as the 100 TB hot path).
    """
    import datetime as _dt

    ds = ray.data.read_json(path, override_num_blocks=override_num_blocks) \
        if override_num_blocks else ray.data.read_json(path)

    def coerce(t: pa.Table) -> pa.Table:
        names = t.column_names
        n = t.num_rows

        def col(name):
            return t.column(name).to_pylist() if name in names else [None] * n

        urls = col("url")
        raw_ts = col("warc_ts")
        ts = []
        for v in raw_ts:
            if v is None:
                ts.append(None)
            elif isinstance(v, (int, float)):
                ts.append(_dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(v)))
            elif isinstance(v, _dt.datetime):
                ts.append(_to_naive_utc(v))
            else:
                ts.append(_to_naive_utc(
                    _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))
                ))
        htmls = [
            base64.b64decode(v) if v is not None else None for v in col("html_b64")
        ]
        out = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(col("text"), pa.string()),
                "lang": pa.array(col("lang"), pa.string()),
            },
            schema=PAGES,
        )
        if columns:
            out = out.select(columns)
        return out

    return ds.map_batches(coerce, batch_format="pyarrow", zero_copy_batch=True)
