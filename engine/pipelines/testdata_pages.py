"""Derive a deterministic pages table (input_hint schema) from the driver's
``documents`` testdata table.

The correctness harness runs queries over /root/testdata/sf*/ which has no
pages table; crawl/extraction queries therefore synthesize one — pure
function of the documents rows (doc_id, text, source), no RNG, no wall
clock — so Ray-pipeline and oracle runs see identical input at any sf.

Layout: one host per ``source`` value; one page per document; pages link to
the next 3 documents of the same source (cyclic) plus one cross-source
link, giving the frontier a connected, reproducible graph.
"""

from __future__ import annotations

import datetime as dt
from typing import Dict, List

import pyarrow as pa
import ray.data

BASE_TS = dt.datetime(2024, 1, 1)


def _page_url(source: str, doc_id: int, replica: int = 0) -> str:
    if replica == 0:
        return f"https://{source}.example.com/docs/{doc_id}.html"
    return f"https://{source}.example.com/docs/{doc_id}r{replica}.html"


def synth_pages_batch(
    batch: pa.Table,
    link_map: Dict[int, List[int]],
    id_to_source: Dict[int, str],
    replicate: int = 1,
) -> pa.Table:
    urls, tss, htmls = [], [], []
    for doc_id, text, source in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("text").to_pylist(),
        batch.column("source").to_pylist(),
    ):
        body = (text or "").replace("<", "&lt;")
        for r in range(replicate):
            url = _page_url(source, doc_id, r)
            links = "".join(
                f'<a href="{_page_url(id_to_source[t], t, r)}">d{t}</a> '
                for t in link_map.get(doc_id, [])
            )
            html = (
                "<!DOCTYPE html><html><head>"
                f"<title>Document {doc_id}.{r}</title>"
                f'<meta name="description" content="synthetic doc {doc_id} from {source}">'
                f'<meta name="keywords" content="{source}, doc{doc_id}, synthetic">'
                "</head><body>"
                f"<nav>{links}</nav>"
                f"<article><h1>Document {doc_id}.{r}</h1><p>{body}</p></article>"
                "</body></html>"
            )
            urls.append(url)
            tss.append(BASE_TS + dt.timedelta(seconds=int(doc_id) % 86400 + r))
            htmls.append(html.encode("utf-8"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * len(urls), pa.string()),
            "lang": pa.array([None] * len(urls), pa.string()),
        }
    )


def build_link_maps(sf_dir: str):
    """Driver-side link topology from the (small) doc_id/source projection.

    Reads only two columns; at 100 TB the link map would instead be a
    derived Parquet table joined by doc_id — this broadcast dict is the
    small-side equivalent.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    ids = t.column("doc_id").to_pylist()
    srcs = t.column("source").to_pylist()
    by_src: Dict[str, List[int]] = {}
    id_to_source: Dict[int, str] = {}
    for i, s in zip(ids, srcs):
        by_src.setdefault(s, []).append(i)
        id_to_source[i] = s
    link_map: Dict[int, List[int]] = {}
    all_sorted = sorted(ids)
    for s, members in sorted(by_src.items()):
        members.sort()
        n = len(members)
        for pos, i in enumerate(members):
            targets = [members[(pos + d) % n] for d in (1, 2, 3) if members[(pos + d) % n] != i]
            cross = all_sorted[(i * 7 + 3) % len(all_sorted)]
            if cross != i:
                targets.append(cross)
            link_map[i] = list(dict.fromkeys(targets))
    return link_map, id_to_source


def pages_dataset(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    """documents.parquet -> pages Dataset (url, warc_ts, html, text, lang).

    ``replicate`` > 1 amplifies the corpus deterministically (each doc gets
    R distinct URLs / intra-replica link graphs) — used by bench.py so the
    measured pipeline runs at a meaningful page count regardless of sf.
    """
    link_map, id_to_source = build_link_maps(sf_dir)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return docs.map_batches(
        synth_pages_batch,
        fn_kwargs=dict(link_map=link_map, id_to_source=id_to_source, replicate=replicate),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def seeds_table(sf_dir: str, n_seeds: int = 8) -> pa.Table:
    """First document of the first n_seeds sources (deterministic)."""
    link_map, id_to_source = build_link_maps(sf_dir)
    by_src: Dict[str, int] = {}
    for i in sorted(id_to_source):
        s = id_to_source[i]
        if s not in by_src:
            by_src[s] = i
    seeds = [
        _page_url(s, by_src[s]) for s in sorted(by_src)[:n_seeds]
    ]
    return pa.table({"url": pa.array(seeds, pa.string())})
