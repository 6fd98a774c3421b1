"""CDX capture-index tests — logical index vs a single-process oracle, and
the physical index proven by RANDOM ACCESS: every indexed (offset, length)
is fetched back out of the .warc.gz shards and byte-compared."""

import os
from hashlib import md5

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from engine.stages.cdx import cdx_fetch, cdx_index, cdx_index_shards, cdx_lookup


def test_cdx_index_matches_window_oracle(ray_session):
    """Logical index == oracle: revisit iff an earlier capture of the SAME
    url has the SAME digest; equal-ts duplicates are all originals; output
    sorted by (surt, ts); block layout irrelevant."""
    caps = [
        # url, ts, content
        ("http://a.com/x", 3, "v1"),   # revisit of ts=1
        ("http://a.com/x", 1, "v1"),
        ("http://a.com/x", 2, "v2"),   # content changed: original
        ("http://a.com/x", 5, "v2"),   # revisit of ts=2
        ("http://b.com/y", 1, "v1"),   # same digest, different url: original
        ("http://b.com/y", 1, "v1"),   # equal-ts duplicate: ALSO original
        ("http://b.com/y", 4, "v1"),   # revisit
    ]
    expect = {}  # (url, ts, digest) -> revisit
    for url, ts, content in caps:
        d = md5(content.encode()).hexdigest()
        first = min(t for u, t, c in caps if u == url and
                    md5(c.encode()).hexdigest() == d)
        expect[(url, ts, d)] = ts > first

    t = pa.table(
        {
            "url": pa.array([c[0] for c in caps], pa.string()),
            "ts": pa.array([c[1] for c in caps], pa.int64()),
            "content": pa.array([c[2] for c in caps], pa.string()),
        }
    )
    for n_blocks in (1, 4):
        got = (
            cdx_index(ray.data.from_arrow(t).repartition(n_blocks))
            .to_pandas()
        )
        assert len(got) == len(caps)
        # sorted by (surt, ts)
        keys = list(zip(got["surt"], got["ts"]))
        assert keys == sorted(keys)
        for r in got.itertuples():
            assert bool(r.revisit) == expect[(r.url, int(r.ts), r.digest)], r
            assert int(r.length) == len(
                [c for c in caps if c[0] == r.url and int(c[1]) == int(r.ts)][0][2]
            )


def test_cdx_index_empty(ray_session):
    got = cdx_index(
        ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "ts": pa.array([], pa.int64()),
                    "content": pa.array([], pa.string()),
                }
            )
        )
    )
    assert got.count() == 0
    assert set(got.schema().names) == {
        "surt", "ts", "url", "digest", "length", "revisit"
    }


@pytest.fixture(scope="module")
def shard_archive(ray_session, tmp_path_factory):
    """Small pages corpus exported as 4 .warc.gz shards + its CDX."""
    from engine.pipelines.testdata_pages import pages_dataset
    from engine.stages.export import export_warc_shards

    td = str(tmp_path_factory.mktemp("cdx_shards"))
    export_warc_shards(
        pages_dataset("/root/testdata/sf0.001"), out_dir=td, n_shards=4
    ).materialize()
    idx = cdx_index_shards(td).materialize().to_pandas()
    return td, idx


def test_cdx_shards_random_access_roundtrip(shard_archive):
    """EVERY indexed record seeks back out of its shard: url and body
    digest match, offsets tile each file exactly (no gaps, no overlaps),
    and the index is (surt, ts)-sorted."""
    td, idx = shard_archive
    assert len(idx) == 500  # one response record per sf0.001 document
    keys = list(zip(idx["surt"], idx["ts"]))
    assert keys == sorted(keys)

    for r in idx.itertuples():
        url, ts, html = cdx_fetch(
            os.path.join(td, r.filename), int(r.offset), int(r.length)
        )
        assert url == r.url
        assert md5(html).hexdigest() == r.digest
        assert len(str(int(r.ts))) == 14  # CDX14 timestamp

    # per file, member ranges tile [0, filesize) exactly
    for fname, g in idx.groupby("filename"):
        g = g.sort_values("offset")
        offs = g["offset"].to_numpy()
        lens = g["length"].to_numpy()
        assert offs[0] == 0
        assert (offs[1:] == offs[:-1] + lens[:-1]).all()
        assert offs[-1] + lens[-1] == os.path.getsize(os.path.join(td, fname))


def test_cdx_lookup_bisect(shard_archive):
    """cdx_lookup binary-searches the sorted surt column: a present url
    returns exactly its captures, an absent one returns zero rows."""
    td, idx = shard_archive
    tbl = pa.Table.from_pandas(idx)
    url = idx.iloc[123]["url"]
    hit = cdx_lookup(tbl, url)
    assert hit.num_rows == 1 and hit.column("url")[0].as_py() == url
    # random access through the lookup row
    r = hit.to_pylist()[0]
    u2, _, html = cdx_fetch(os.path.join(td, r["filename"]), r["offset"], r["length"])
    assert u2 == url and md5(html).hexdigest() == r["digest"]
    miss = cdx_lookup(tbl, "https://nosuch.example.org/none.html")
    assert miss.num_rows == 0


def test_cdx_digest_agrees_across_indexes(ray_session, shard_archive):
    """The logical and physical digests agree: indexing the SAME capture
    through cdx_index (url/ts/content rows) and through the written WARC
    (cdx_index_shards) yields the same md5 — the extracted body IS the
    content (the two indexes can cross-reference each other's records)."""
    td, idx = shard_archive
    r = idx.iloc[42]
    _, _, html = cdx_fetch(os.path.join(td, r.filename), int(r.offset), int(r.length))
    t = pa.table(
        {
            "url": pa.array([r.url], pa.string()),
            "ts": pa.array([int(r.ts)], pa.int64()),
            "content": pa.array([html.decode("utf-8")], pa.string()),
        }
    )
    logical = cdx_index(ray.data.from_arrow(t)).to_pandas()
    assert logical.iloc[0]["digest"] == r.digest
    assert logical.iloc[0]["surt"] == r.surt


def test_warc_dedup_export_roundtrip(ray_session, tmp_path):
    """Dedup archive round trip: the revisit-aware index over the written
    shards reconstructs the EXACT input capture multiset — originals by
    direct fetch, revisits resolved through digest lookup — and revisits
    actually save payload bytes (every revisit member is smaller than its
    original's)."""
    from engine.pipelines.queries import _cdx_captures
    from engine.stages.cdx import digest_map, resolve_revisit
    from engine.stages.export import export_warc_dedup_shards

    td = str(tmp_path / "dedup_shards")
    caps = _cdx_captures("/root/testdata/sf0.001").to_pandas()
    manifest = export_warc_dedup_shards(
        ray.data.from_arrow(pa.Table.from_pandas(caps)), out_dir=td, n_shards=4
    ).to_pandas()

    # every doc with doc_id % 3 == 2 contributes one revisit (capture 2
    # repeats capture 0's digest)
    assert manifest["n_records"].sum() == len(caps)
    assert manifest["n_revisits"].sum() > 0

    idx = cdx_index_shards(td).materialize().to_pandas()
    assert len(idx) == len(caps)

    tbl = pa.Table.from_pandas(idx)
    dmap = digest_map(tbl)  # build the dedup DB once; O(1) per resolve
    got = []
    for r in idx.to_dict("records"):
        body = resolve_revisit(tbl, r, td, dmap=dmap)
        got.append((r["url"], int(r["ts"]), md5(body).hexdigest()))
    expect = [
        (u, int(t), md5((c or "").encode()).hexdigest())
        for u, t, c in zip(caps["url"], caps["ts"], caps["content"])
    ]
    assert sorted(got) == sorted(expect)

    # storage actually saved: each revisit's member is smaller than the
    # payload-bearing member it references
    by_digest = idx[idx["mime"] != "warc/revisit"].set_index("digest")["length"]
    rev = idx[idx["mime"] == "warc/revisit"]
    assert len(rev) == manifest["n_revisits"].sum()
    assert (rev["length"].to_numpy() <
            by_digest.loc[rev["digest"]].to_numpy()).all()
    assert (rev["body_len"] == 0).all()


def test_warc_dedup_duplicate_captures(ray_session, tmp_path):
    """EXACT duplicate captures (same url, ts, content — the
    most-duplicated input a dedup exporter sees): only ONE row per digest
    stores a payload; the key-equal duplicates become revisits (positional
    winner marking, matching the oracle's row_number semantics)."""
    from engine.stages.cdx import digest_map, resolve_revisit
    from engine.stages.export import export_warc_dedup_shards

    td = str(tmp_path / "dup_shards")
    t = pa.table(
        {
            "url": pa.array(
                ["http://a.com/x"] * 3 + ["http://b.com/y"], pa.string()
            ),
            "ts": pa.array([20240101000000] * 3 + [20240102000000], pa.int64()),
            "content": pa.array(["same"] * 3 + ["same"], pa.string()),
        }
    )
    manifest = export_warc_dedup_shards(
        ray.data.from_arrow(t), out_dir=td, n_shards=2
    ).to_pandas()
    assert manifest["n_records"].sum() == 4
    assert manifest["n_revisits"].sum() == 3  # one payload for the digest
    d = md5(b"same").hexdigest()
    assert manifest["payload_bytes"].sum() == len(b"same")

    idx = cdx_index_shards(td).materialize().to_pandas()
    originals = idx[idx["mime"] != "warc/revisit"]
    assert len(originals) == 1 and originals.iloc[0]["digest"] == d
    # every row still resolves to the payload
    tbl = pa.Table.from_pandas(idx)
    dmap = digest_map(tbl)
    for r in idx.to_dict("records"):
        assert resolve_revisit(tbl, r, td, dmap=dmap) == b"same"


def test_cdx_shards_rejects_whole_file_gzip(ray_session, tmp_path):
    """A whole-file-gzipped WARC (multiple records in one gzip member) is
    valid for sequential read_warc ingest but has no per-record byte
    ranges — cdx_index_shards must refuse loudly, not silently index only
    the first record."""
    import gzip

    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: http://a.com/%d\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 4\r\n\r\nbody\r\n\r\n"
    )
    p = str(tmp_path / "whole.warc.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress((rec % 0) + (rec % 1)))
    with pytest.raises(Exception, match="record-per-member"):
        cdx_index_shards(p).materialize()
    # sequential ingest still reads both records
    from engine.sources.warc import read_warc

    assert read_warc(p).count() == 2


def test_cdx_shards_lf_delimited_member(ray_session, tmp_path):
    """LF-only writers: the payload boundary comes from the header
    parser's stream position, so the digest is md5 of the real body (a
    CRLF re-scan would silently yield md5('') and break revisit
    resolution)."""
    import gzip

    rec = (
        b"WARC/1.0\nWARC-Type: resource\n"
        b"WARC-Target-URI: http://lf.example.com/a\n"
        b"WARC-Date: 2024-03-04T05:06:07Z\n"
        b"Content-Length: 5\n\nhello\n\n"
    )
    p = str(tmp_path / "lf.warc.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(rec))
    idx = cdx_index_shards(p).materialize().to_pandas()
    assert len(idx) == 1
    r = idx.iloc[0]
    assert r["digest"] == md5(b"hello").hexdigest()
    assert int(r["body_len"]) == 5
    assert int(r["ts"]) == 20240304050607
    url, ts, body = cdx_fetch(p, int(r["offset"]), int(r["length"]))
    assert (url, body) == ("http://lf.example.com/a", b"hello")


def test_cdx_fetch_revisit_row(tmp_path):
    """cdx_fetch inverts a revisit row too: (url, ts, None) — slim records
    carry no payload; resolution goes through resolve_revisit."""
    import gzip

    rec = (
        b"WARC/1.0\r\nWARC-Type: revisit\r\n"
        b"WARC-Target-URI: http://a.com/x\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"WARC-Payload-Digest: md5:" + md5(b"same").hexdigest().encode() + b"\r\n"
        b"Content-Length: 0\r\n\r\n\r\n\r\n"
    )
    p = str(tmp_path / "rev.warc.gz")
    blob = gzip.compress(rec)
    with open(p, "wb") as f:
        f.write(blob)
    url, ts, body = cdx_fetch(p, 0, len(blob))
    assert url == "http://a.com/x"
    assert body is None
