"""End-to-end pipeline conformance (SURVEY.md §5 layers 3-4).

- Byte-identical invariant: pipeline-extracted text per url == fixture
  ``text`` column (which was produced by the single-threaded oracle).
- Determinism under parallelism: outputs identical after sort by uuid.
- Meta/data view semantics and broadcast lookup join.
"""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data

from engine.pipelines.index_pipeline import (
    data_view,
    extract_dataset,
    meta_view,
    run_index_pipeline,
)


@pytest.fixture(scope="module")
def extracted_dir(ray_session, fixture_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e"))
    ex_dir, _ = run_index_pipeline(
        os.path.join(fixture_dir, "pages.parquet"),
        out,
        lookup_path=os.path.join(fixture_dir, "lookups.parquet"),
        concurrency=2,
        batch_size=64,
    )
    return ex_dir


def test_byte_identical_text_invariant(extracted_dir, fixture_dir):
    fixture = pq.read_table(
        os.path.join(fixture_dir, "pages.parquet"), columns=["url", "text", "lang"]
    )
    got = pq.read_table(extracted_dir, columns=["warc_target_uri", "body", "lang", "skip_reason"])

    exp_text = {}
    exp_lang = {}
    for u, t, l in zip(
        fixture.column("url").to_pylist(),
        fixture.column("text").to_pylist(),
        fixture.column("lang").to_pylist(),
    ):
        exp_text.setdefault(u, t)
        exp_lang.setdefault(u, l)

    n_checked = 0
    for u, body, lang, skip in zip(
        got.column("warc_target_uri").to_pylist(),
        got.column("body").to_pylist(),
        got.column("lang").to_pylist(),
        got.column("skip_reason").to_pylist(),
    ):
        if skip is None:
            assert body == exp_text[u], f"text mismatch for {u}"
            assert lang == exp_lang[u], f"lang mismatch for {u}"
            n_checked += 1
        else:
            assert exp_text[u] is None, f"{u} skipped ({skip}) but fixture has text"
    assert n_checked > 500


def test_skip_reasons_present(extracted_dir):
    t = pq.read_table(extracted_dir, columns=["warc_target_uri", "skip_reason"])
    reasons = {
        r
        for r, u in zip(
            t.column("skip_reason").to_pylist(), t.column("warc_target_uri").to_pylist()
        )
        if r is not None and "/edge/" in u
    }
    assert {"too_short", "too_big", "not_text", "no_body",
            "replacement_chars", "main_too_short"} <= reasons


def test_determinism_under_parallelism(ray_session, fixture_dir):
    pages = os.path.join(fixture_dir, "pages.parquet")

    def run(concurrency, batch_size, blocks):
        ds = ray.data.read_parquet(pages, override_num_blocks=blocks)
        out = extract_dataset(ds, concurrency=concurrency, batch_size=batch_size)
        t = out.to_arrow_refs()
        import ray as _ray
        import pyarrow as pa

        tbl = pa.concat_tables([_ray.get(r) for r in t])
        return tbl.sort_by([("uuid", "ascending"), ("source_offset", "ascending")])

    # NB: pool size must leave CPU headroom for the read stage — a fixed
    # actor pool equal to the cluster CPU count deadlocks the pipeline
    # (ReadParquet backpressured forever).  Engine guidance: concurrency
    # <= ~0.75 * cluster CPUs (see extract_dataset docstring).
    a = run(1, 512, 1)
    b = run(3, 32, 8)
    assert a.num_rows == b.num_rows
    assert a.equals(b), "parallelism changed extraction output"


def test_meta_data_views(extracted_dir, fixture_dir):
    meta = meta_view(extracted_dir).to_pandas()
    data = data_view(extracted_dir).to_pandas()
    # default semantics: meta rows only for kept docs (process.py:190-193)
    assert len(meta) == len(data)
    meta_all = meta_view(extracted_dir, always_index_meta=True).to_pandas()
    n_pages = pq.read_metadata(os.path.join(fixture_dir, "pages.parquet")).num_rows
    assert len(meta_all) == n_pages
    assert "body" not in meta.columns
    assert {"uuid", "idx_id", "warc_date"} <= set(meta.columns)
    assert {"title", "body", "full_body", "lang"} <= set(data.columns)
    # uuids unique per (uuid, source_offset); duplicate url row shares uuid
    assert data["uuid"].notna().all()


def test_lookup_join(extracted_dir, fixture_dir):
    lk = pq.read_table(os.path.join(fixture_dir, "lookups.parquet"))
    data = data_view(extracted_dir).to_pandas()
    joined = data[data["spam_rank"].notna() | data["page_rank"].notna()]
    assert len(joined) > 0, "no lookup ranks joined"
    lk_map = {
        d: (s, p)
        for d, s, p in zip(
            lk.column("doc_id").to_pylist(),
            lk.column("spam_rank").to_pylist(),
            lk.column("page_rank").to_pylist(),
        )
    }
    for _, row in joined.head(50).iterrows():
        s, p = lk_map[row["uuid"]]
        if s is not None:
            assert row["spam_rank"] == s
        if p is not None:
            assert abs(row["page_rank"] - p) < 1e-9


def test_jsonl_pages_source(ray_session, tmp_path):
    """JSONL pages source: same rows as the Parquet source for the same
    corpus (base64 html round-trip, ts coercion), and the extraction
    pipeline consumes it unchanged."""
    import base64
    import json

    import pyarrow.parquet as pq

    from engine.pipelines.index_pipeline import extract_dataset
    from engine.pipelines.testdata_pages import pages_dataset
    from engine.sources.pages import read_pages_jsonl

    pages = pages_dataset("/root/testdata/sf0.001").limit(64).to_pandas()
    jl = tmp_path / "pages.jsonl"
    with open(jl, "w") as f:
        for _, r in pages.iterrows():
            f.write(json.dumps({
                "url": r["url"],
                "warc_ts": r["warc_ts"].isoformat(),
                "html_b64": base64.b64encode(r["html"]).decode(),
            }) + "\n")

    ds = read_pages_jsonl(str(jl))
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = pages.sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == exp["url"].tolist()
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in exp["html"]]
    assert got["warc_ts"].tolist() == exp["warc_ts"].tolist()

    # extraction consumes the JSONL source unchanged
    ex = extract_dataset(ds, concurrency=(1, 2), batch_size=32).to_pandas()
    assert len(ex) == len(exp)
    assert (ex["skip_reason"].isna()).sum() > 0


def test_warc_source_roundtrip(ray_session, tmp_path):
    """WARC container source: a .warc.gz written from the corpus rows
    round-trips to the SAME rows as the Parquet path (url, warc_ts, html
    all equal), and the extraction pipeline consumes it unchanged —
    closing the reference's warcio.py:84-198 surface with a pure-Python
    record parser (one gzip member per record, the Common Crawl layout)."""
    from engine.pipelines.index_pipeline import extract_dataset
    from engine.pipelines.testdata_pages import pages_dataset
    from engine.sources.warc import iter_warc_records, read_warc, write_warc

    pages = pages_dataset("/root/testdata/sf0.001").limit(64).to_pandas()
    wf = tmp_path / "pages.warc.gz"
    n = write_warc(
        ((r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
         for _, r in pages.iterrows()),
        str(wf),
    )
    assert n == len(pages)

    got = read_warc(str(wf)).to_pandas().sort_values("url").reset_index(drop=True)
    exp = pages.sort_values("url").reset_index(drop=True)
    assert got["url"].tolist() == exp["url"].tolist()
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in exp["html"]]
    assert got["warc_ts"].tolist() == [
        t.replace(microsecond=0) for t in exp["warc_ts"]  # WARC-Date is 1 s
    ]

    # extraction consumes the WARC source unchanged (same kept count as
    # the equivalent Parquet-sourced extraction)
    ex = extract_dataset(
        read_warc(str(wf)), concurrency=(1, 2), batch_size=32
    ).to_pandas()
    assert len(ex) == len(exp)
    assert (ex["skip_reason"].isna()).sum() > 0

    # record-type filtering + overly-long payload stripping (reference
    # overly_long_keep_meta: row kept, payload dropped)
    import gzip as _gz

    extra = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://x/\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
    )
    blob = _gz.compress(extra) + wf.read_bytes()
    recs = list(iter_warc_records(blob, max_content_length=10))
    assert len(recs) == len(exp)  # request record skipped
    assert all(h is None for _, _, h in recs)  # all payloads over 10 bytes


def test_warc_resumable_index_pipeline(ray_session, tmp_path):
    """The resumable index pipeline consumes a DIRECTORY of .warc.gz files
    (third ingest format) with manifest accounting intact."""
    from engine.pipelines.index_pipeline import (
        extracted_parts_view,
        run_index_pipeline_resumable,
    )
    from engine.pipelines.testdata_pages import pages_dataset
    from engine.sources.warc import write_warc

    pages = pages_dataset("/root/testdata/sf0.001").limit(48).to_pandas()
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    halves = [pages.iloc[:24], pages.iloc[24:]]
    for i, half in enumerate(halves):
        write_warc(
            ((r["url"], r["warc_ts"].to_pydatetime(), bytes(r["html"]))
             for _, r in half.iterrows()),
            str(wdir / f"crawl-{i:02d}.warc.gz"),
        )
    out = run_index_pipeline_resumable(
        str(wdir), str(tmp_path / "out"), files_per_partition=1,
        concurrency=(1, 2), batch_size=32,
    )
    got = extracted_parts_view(out).to_pandas()
    assert len(got) == len(pages)
    assert sorted(got["warc_target_uri"]) == sorted(pages["url"])

    # manifest rows_in is an INDEPENDENT input-side record count (a
    # header-walk pass over the .warc.gz), not an echo of rows_out
    from engine.state.checkpoint import load_manifest

    man = load_manifest(out).to_pandas()
    assert sorted(man["rows_in"]) == [24, 24]
    assert (man["rows_in"] == man["rows_out"]).all()


def test_warc_record_count_and_http_parsing(tmp_path):
    """count_page_records_bytes mirrors iter_warc_records' record policy,
    and chunked-transfer detection parses the Transfer-Encoding header
    line (a substring scan would false-positive on e.g. an 'X-Cache:
    chunked-proxy' header)."""
    import gzip as _gz

    from engine.sources.warc import (
        _http_body,
        count_page_records_bytes,
        iter_warc_records,
    )

    def rec(rtype: bytes, url: bytes, payload: bytes) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: " + rtype + b"\r\n"
            b"WARC-Target-URI: " + url + b"\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            b"Content-Length: %d\r\n\r\n" % len(payload) + payload + b"\r\n\r\n"
        )

    body = b"<html>hello</html>"
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    blob = (
        _gz.compress(rec(b"request", b"http://a/", b"GET"))
        + _gz.compress(rec(b"response", b"http://a/", resp))
        + _gz.compress(rec(b"metadata", b"http://a/", b"x"))
        + _gz.compress(rec(b"resource", b"http://b/", body))
    )
    assert count_page_records_bytes(blob) == 2
    assert count_page_records_bytes(blob) == len(list(iter_warc_records(blob)))
    # truncated final record: neither yielded nor counted
    trunc = blob + _gz.compress(rec(b"response", b"http://c/", resp)[:-30])
    assert count_page_records_bytes(trunc) == 2
    assert len(list(iter_warc_records(trunc))) == 2

    # chunked body decodes through the real Transfer-Encoding header ...
    chunked = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    real = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked
    )
    assert _http_body(real) == b"hello world"
    # ... but an unrelated header containing the word does NOT trigger it
    decoy = (
        b"HTTP/1.1 200 OK\r\nX-Cache: chunked-proxy\r\n"
        b"Transfer-Encoding: identity\r\n\r\n" + chunked
    )
    assert _http_body(decoy) == chunked


def test_mixed_pages_dir_warns_and_reads_parquet(tmp_path):
    """A directory mixing .parquet and .warc files is a layout error:
    the sniffer warns and treats it as parquet-only."""
    import warnings

    import pyarrow as pa

    from engine.sources.pages import is_warc_path

    pq.write_table(pa.table({"url": pa.array(["http://a/"])}),
                   str(tmp_path / "p.parquet"))
    (tmp_path / "c.warc.gz").write_bytes(b"\x1f\x8b")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert is_warc_path(str(tmp_path)) is False
    assert any("mixes" in str(x.message) for x in w)


def test_jsonl_tz_offsets_normalize_to_utc(ray_session, tmp_path):
    """Identical instants written with different UTC offsets coerce to the
    SAME naive-UTC warc_ts (ADVICE r2: bare replace() kept local wall-clock)."""
    import datetime as dt
    import json

    from engine.sources.pages import read_pages_jsonl

    jl = tmp_path / "tz.jsonl"
    rows = [
        {"url": "http://a/", "warc_ts": "2024-01-01T12:00:00+02:00"},
        {"url": "http://b/", "warc_ts": "2024-01-01T10:00:00Z"},
        {"url": "http://c/", "warc_ts": "2024-01-01T05:00:00-05:00"},
        {"url": "http://d/", "warc_ts": "2024-01-01T10:00:00"},  # naive = UTC
    ]
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    got = read_pages_jsonl(str(jl)).to_pandas().sort_values("url")
    want = dt.datetime(2024, 1, 1, 10, 0, 0)
    assert got["warc_ts"].tolist() == [want] * 4


def test_build_corpus_end_to_end(ray_session, tmp_path):
    """The composed corpus build runs documents -> shards, is byte-
    deterministic, and the gated-broadcast and union+groupby key paths
    produce identical shard manifests (pins select_by_keys invert too)."""
    import pandas as pd
    import ray.data

    from engine.pipelines.corpus_pipeline import build_corpus

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    manifests = []
    for run, gate in ((0, 5_000_000), (1, 0)):
        man, stats = build_corpus(
            docs,
            out_dir=str(tmp_path / f"shards{run}"),
            weights_bp={f"src{i}": 500 for i in range(20)},
            out_frac_pct=100,
            seq_len=256,
            n_shards=4,
            broadcast_max=gate,
        )
        df = man.to_pandas().sort_values("shard").reset_index(drop=True)
        manifests.append(df)
        assert stats["input"] >= stats["kept"] >= stats["final_docs"] >= 0
        assert stats["kept"] - stats["neardup_dropped"] >= stats["final_docs"]
        assert stats["exported_rows"] == stats["final_docs"]
        assert stats["final_docs"] > 0  # the chain keeps something
    pd.testing.assert_frame_equal(manifests[0], manifests[1])


def test_build_corpus_shuffled_pack_order(ray_session, tmp_path):
    """shuffle_seed packs in seeded-shuffled stream order: shard MEMBERSHIP
    (id-hash assignment) is unchanged vs the unshuffled build, the
    permutation actually reorders the stream, and the shuffled build is
    itself deterministic across runs."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from engine.pipelines.corpus_pipeline import build_corpus

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )

    def run(out, seed):
        man, stats = build_corpus(
            docs, out_dir=str(out), seq_len=256, n_shards=4,
            shuffle_seed=seed,
        )
        rows = (
            pq.read_table(str(out), columns=["doc_id", "stream_offset", "pack_id"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return man.to_pandas().sort_values("shard").reset_index(drop=True), rows

    man_plain, rows_plain = run(tmp_path / "plain", None)
    man_a, rows_a = run(tmp_path / "shuf_a", 42)
    man_b, rows_b = run(tmp_path / "shuf_b", 42)

    # membership identical (manifest counts are id-hash based, order-free)
    pd.testing.assert_frame_equal(man_plain, man_a)
    assert rows_plain["doc_id"].tolist() == rows_a["doc_id"].tolist()
    # the stream really is permuted, deterministically
    assert rows_a["stream_offset"].tolist() != rows_plain["stream_offset"].tolist()
    pd.testing.assert_frame_equal(rows_a, rows_b)
    # same token stream, different order: total stream length matches
    last_plain = rows_plain["stream_offset"].max()
    assert rows_a["stream_offset"].max() <= last_plain + rows_plain["stream_offset"].diff().max()


def test_build_corpus_all_filtered_is_clean(ray_session, tmp_path):
    """A corpus where the filter keeps NOTHING finishes with 0 shards and
    a typed empty manifest — no schema-less KeyError in the dedup stage,
    no FileNotFoundError reading back an unwritten shard dir (both were
    real crashes: zero-row blocks lose their schema, and zero-row writes
    produce no files)."""
    import pyarrow as pa
    import ray.data

    from engine.pipelines.corpus_pipeline import build_corpus

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["", "x", ""], pa.string()),
            }
        )
    )
    for run, seed in enumerate((None, 42)):
        man, stats = build_corpus(
            docs, out_dir=str(tmp_path / f"s{run}"), seq_len=64,
            n_shards=2, shuffle_seed=seed,
        )
        assert stats == {
            "input": 3, "kept": 0, "neardup_dropped": 0,
            "final_docs": 0, "shards": 0, "exported_rows": 0,
        }
        t = pa.concat_tables(
            [b for b in __import__("ray").get(man.to_arrow_refs())
             if isinstance(b, pa.Table)] or
            [pa.table({"shard": pa.array([], pa.int64()),
                       "n_rows": pa.array([], pa.int64()),
                       "sum_idh": pa.array([], pa.int64())})],
            promote_options="default",
        )
        assert t.num_rows == 0
        assert set(t.column_names) == {"shard", "n_rows", "sum_idh"}
