"""WAT metadata-archive export tests — writer/parser round trip."""


def test_wat_export_roundtrip(ray_session, tmp_path):
    """WAT shards round-trip: read_wat returns one metadata row per page
    with the digest/length/outlinks the writer computed, and outlinks
    match discover_links on the source html."""
    from hashlib import md5 as _md5

    import pyarrow as pa
    import ray.data

    from engine.pipelines.crawl_common import discover_links
    from engine.stages.export import export_wat_shards, read_wat

    html0 = (
        b"<html><body><a href='https://a.example.com/x.html'>x</a>"
        b"<a href='https://b.example.com/y.html'>y</a>"
        b"<a href='https://a.example.com/x.html'>dup</a></body></html>"
    )
    html1 = b"<html><body>no links</body></html>"
    t = pa.table(
        {
            "url": pa.array(
                ["https://s.example.com/0.html", "https://s.example.com/1.html"],
                pa.string(),
            ),
            "warc_ts": pa.array([None, None], pa.timestamp("us")),
            "html": pa.array([html0, html1], pa.binary()),
        }
    )
    td = str(tmp_path / "wat")
    manifest = export_wat_shards(
        ray.data.from_arrow(t), out_dir=td, n_shards=2
    ).to_pandas()
    assert manifest["n_records"].sum() == 2
    assert manifest["sum_links"].sum() == 2  # href dedup: 2 distinct targets

    rows = read_wat(td).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(rows) == 2
    assert rows.iloc[0]["digest"] == _md5(html0).hexdigest()
    assert list(rows.iloc[0]["outlinks"]) == discover_links(
        "https://s.example.com/0.html", html0
    )
    assert int(rows.iloc[0]["html_len"]) == len(html0.decode())
    assert int(rows.iloc[1]["n_links"]) == 0


def test_wat_export_empty(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from engine.stages.export import export_wat_shards

    t = pa.table(
        {
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
        }
    )
    got = export_wat_shards(
        ray.data.from_arrow(t), out_dir=str(tmp_path / "we"), n_shards=2
    )
    assert got.count() == 0


def test_balanced_shards_balance_and_invariance(ray_session):
    """Byte balance bound (max-min <= max doc size), rank bijection, and
    identical output at 1 vs 9 blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.stages.export import balanced_shards

    rng = np.random.default_rng(5)
    sizes = rng.integers(1, 5000, size=200)
    t = pa.table(
        {
            "doc_id": pa.array(range(200), pa.int64()),
            "n_chars": pa.array(sizes, pa.int64()),
        }
    )
    a = (
        balanced_shards(ray.data.from_arrow(t), n_shards=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        balanced_shards(ray.data.from_arrow(t).repartition(9), n_shards=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert sorted(a["rank"]) == list(range(200))
    order = a.sort_values("rank")
    assert (order["n_chars"].to_numpy()[:-1] >= order["n_chars"].to_numpy()[1:]).all()
    sums = a.groupby("shard")["n_chars"].sum()
    assert sums.max() - sums.min() <= a["n_chars"].max()
