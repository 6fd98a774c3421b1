"""Pages-table source helpers (replaces the reference WARC reader,
/root/reference/warc_indexer/indexer/warcio.py:46-198).

Ray's ``read_parquet`` natively provides what the reference hand-builds with
MatchFiles | Reshuffle | splittable DoFn: file globbing, per-file/row-group
block splitting, task retries, and streaming scheduling (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import List, Optional

import ray.data


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
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns, **kwargs)
