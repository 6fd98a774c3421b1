"""ray-crawl-engine: a Ray-Data-native web-crawl frontier + extraction engine.

From-scratch re-expression of the query/data-processing semantics of
chatnoir-eu/chatnoir-warc-indexer (an Apache Beam/Flink WARC->Elasticsearch
pipeline) as ``ray.data.Dataset`` pipelines over Arrow batches:

- pages table (url, warc_ts, html, text, lang) read from Parquet
- deterministic ID derivation (``engine.ids``)
- URL canonicalization + SURT (``engine.canonicalize``)
- pure-Python HTML main-content extraction + language id
  (``engine.html_extract``, ``engine.lang``) -- the single-threaded oracle
  that the distributed pipeline must match byte-for-byte per URL
- sharded cuckoo-filter URL-seen set (``engine.state.cuckoo``)
- per-host politeness crawl scheduler (``engine.pipelines.crawl``)
- per-partition checkpoint manifests for resume (``engine.state.checkpoint``)

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (tests / bench.py / CLI).
"""

__version__ = "0.1.0"
