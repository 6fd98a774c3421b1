"""Unit tests for stage modules: text analysis, rank-file lookups,
multimodal plumbing, dedup signatures."""

import os

import numpy as np
import pyarrow as pa
import pytest

from engine.stages import text as tx
from engine.stages.dedup import SimHashStage, minhash_signature, _shingles
from engine.stages.multimodal import DecodeMedia, synth_media_table


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_stats():
    t = tx.token_stats(_batch(["a bb  ccc", "", None, "  x "]))
    assert t.column("n_tokens").to_pylist() == [3, 0, 0, 1]
    assert t.column("n_chars").to_pylist() == [9, 0, 0, 4]
    assert t.column("avg_token_len").to_pylist()[0] == 2.0


def test_quality_scores():
    t = tx.quality_scores(_batch(["abc123", "!!!!", ""]))
    assert t.column("alpha_ratio").to_pylist() == [0.5, 0.0, 0.0]
    assert t.column("digit_ratio").to_pylist() == [0.5, 0.0, 0.0]


def test_content_hash_matches_md5():
    from hashlib import md5

    t = tx.content_hash(_batch(["hello world"]))
    assert t.column("content_md5").to_pylist()[0] == md5(b"hello world").hexdigest()


def test_fingerprint_deterministic_and_sensitive():
    a = tx.fingerprint(_batch(["the quick brown fox jumps over the lazy dog"]))
    b = tx.fingerprint(_batch(["the quick brown fox jumps over the lazy dog"]))
    c = tx.fingerprint(_batch(["the quick brown fox jumps over the lazy cat"]))
    assert a.column("doc_fp").to_pylist() == b.column("doc_fp").to_pylist()
    assert a.column("doc_fp").to_pylist() != c.column("doc_fp").to_pylist()
    # whitespace-normalization invariance
    d = tx.fingerprint(_batch(["the  quick\nbrown fox jumps  over the lazy dog"]))
    assert a.column("doc_fp").to_pylist() == d.column("doc_fp").to_pylist()


def _fnv1a_scalar(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv1a_batch_matches_scalar():
    """Vectorized kernel is bit-identical to the per-byte reference loop on
    empties, unicode, skewed lengths, and rows long enough to cross the
    scalar-tail switch."""
    rng = np.random.default_rng(7)
    items = [
        b"",
        b"a",
        "héllo wörld ☃".encode("utf-8"),
        b"x" * 5000,  # long tail row: exercises the < _FNV_TAIL suffix path
    ]
    items += [bytes(rng.integers(0, 256, size=int(n)).tolist())
              for n in rng.integers(0, 300, size=200)]
    got = tx.fnv1a_batch(items).tolist()
    want = [_fnv1a_scalar(b) for b in items]
    assert got == want


def test_fnv1a_batch_matches_clean_scalar():
    from engine.stages.clean import _fnv1a

    strs = ["one two three", "", "naïve café", "z" * 999]
    got = tx.fnv1a_batch([s.encode("utf-8") for s in strs]).tolist()
    assert got == [_fnv1a(s) for s in strs]


def test_minhash_similarity_tracks_jaccard():
    base = "w" + " w".join(str(i) for i in range(100))
    near = base.replace("w5 ", "w5x ")  # small edit
    far = " ".join(f"z{i}" for i in range(100))
    s_base, s_near, s_far = (minhash_signature(x) for x in (base, near, far))
    est_near = (s_base == s_near).mean()
    est_far = (s_base == s_far).mean()
    assert est_near > 0.7
    assert est_far < 0.2


def test_shingles_dedup_and_short_docs():
    assert len(_shingles("a b", k=3)) == 1
    sh = _shingles("a b c a b c a b c", k=3)
    assert len(sh) <= 7


def test_simhash_hamming_properties():
    st = SimHashStage()
    t = st(_batch(["the quick brown fox " * 10,
                   "the quick brown fox " * 10 + "extra token",
                   "completely different words here entirely"]))
    h = [int(x, 16) for x in t.column("simhash").to_pylist()]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])


def test_media_decode_fake_plumbing():
    media = synth_media_table(n=12)
    dec = DecodeMedia(fake=True)
    out = dec(media)
    assert out.num_rows == 12
    d = out.to_pydict()
    for mt, w, dur in zip(d["media_type"], d["width"], d["duration_ms"]):
        if mt == "audio":
            assert w is None and dur is not None
        elif mt == "image":
            assert w is not None and dur is None
    assert all(len(f) == 16 for f in d["feature"])
    # deterministic per payload
    out2 = DecodeMedia(fake=True)(media)
    assert out.equals(out2)


def test_media_decode_real_raises_for_codec_formats():
    """Opaque random payloads (PNG/JPEG/MP4 stand-ins) still raise: only
    the container-less formats decode without codec libraries."""
    with pytest.raises(NotImplementedError):
        DecodeMedia(fake=False)(synth_media_table(n=2))


def test_media_decode_real_byte_level_oracle():
    """fake=False decodes handcrafted BMP / PPM / WAV payloads to exact,
    hand-derivable metadata and features."""
    from engine.stages.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
        MEDIA_SCHEMA,
    )

    # 2x2 image: red, green / blue, white — known bytes through both codecs
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # hand-built BMP bytes (not via encode_bmp): bottom-up 24-bit, 1x2
    import struct as _struct

    raw = (
        _struct.pack("<2sIHHI", b"BM", 54 + 8, 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, 8, 0, 0, 0, 0)
        + bytes([10, 20, 30, 0])   # bottom row BGR + pad
        + bytes([40, 50, 60, 0])   # top row BGR + pad
    )
    got = decode_bmp(raw)
    assert got.tolist() == [[[60, 50, 40]], [[30, 20, 10]]]  # top-first RGB

    # WAV: 4 samples at 1000 Hz -> 4 ms; exact float conversion
    s = np.array([0, 16384, -16384, 32767], dtype=np.int16)
    dec, rate = decode_wav(encode_wav(s, 1000))
    assert rate == 1000
    assert np.allclose(dec, s.astype(np.float32) / 32768.0)

    # end-to-end through the stage: exact metadata
    t = pa.table(
        {
            "media_id": pa.array(["img", "wav"], pa.string()),
            "media_type": pa.array(["image", "audio"], pa.string()),
            "payload": pa.array([encode_bmp(px), encode_wav(s, 1000)], pa.binary()),
            "mime": pa.array(["image/bmp", "audio/wav"], pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = DecodeMedia(fake=False)(t).to_pydict()
    assert out["width"] == [2, None]
    assert out["height"] == [2, None]
    assert out["duration_ms"] == [None, 4]
    assert out["n_frames"] == [1, 4]
    f_img = out["feature"][0]
    # mean RGB of (red, green, blue, white) = (510/4, 510/4, 510/4)/255 = .5
    assert f_img[0] == pytest.approx(0.5)
    assert f_img[1] == pytest.approx(0.5)
    assert f_img[2] == pytest.approx(0.5)
    assert f_img[14] == pytest.approx(1.0)   # w/h
    assert f_img[15] == pytest.approx(2.0)   # log2(4)
    f_wav = out["feature"][1]
    exp = s.astype(np.float32) / 32768.0
    assert f_wav[0] == pytest.approx(float(exp.mean()))
    assert f_wav[2] == pytest.approx(float(np.sqrt((exp * exp).mean())))
    assert f_wav[12] == pytest.approx(np.log2(1000))


def test_media_decode_real_roundtrip_table(ray_session):
    """The synthetic real-media table decodes end-to-end through the actor
    pool with true dimensions (cross-checked against the generator RNG)."""
    import ray.data

    from engine.stages.multimodal import decode_media_dataset, synth_real_media_table

    media = synth_real_media_table(n=24)
    out = (
        decode_media_dataset(ray.data.from_arrow(media), fake=False)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert len(out) == 24
    img = out[out["media_type"] == "image"]
    aud = out[out["media_type"] == "audio"]
    assert (img["width"] >= 4).all() and (img["width"] < 40).all()
    assert img["duration_ms"].isna().all()
    assert (aud["duration_ms"] > 0).all()
    assert aud["width"].isna().all()


def test_rank_file_parsing(ray_session, tmp_path):
    from engine.stages.lookups import parse_rank_file, prepare_lookups

    spam = tmp_path / "spam.txt"
    spam.write_text("5 doc-a\n12 doc-b\nmalformed\n9 doc-a\n")
    page = tmp_path / "page.txt"
    page.write_text("doc-a 0.85\ndoc-c 0.1\nnope\n")
    ds = parse_rank_file(str(spam), value_first=True, val_type="int")
    rows = ds.to_pandas().sort_values(["id", "value"]).to_records(index=False).tolist()
    assert rows == [("doc-a", 5), ("doc-a", 9), ("doc-b", 12)]

    out = prepare_lookups(str(tmp_path / "lk.parquet"), "cc",
                          spam_ranks_path=str(spam), page_ranks_path=str(page))
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows >= 3
    assert set(t.column_names) == {"doc_id", "spam_rank", "page_rank"}


def test_hll_accuracy_and_merge(ray_session):
    import pyarrow as pa
    import ray.data

    from engine.stages.sketch import HLL, approx_distinct

    # merge law: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    a, b = HLL(), HLL()
    a.add_many(range(0, 5000))
    b.add_many(range(2500, 8000))
    u = HLL()
    u.add_many(range(0, 8000))
    assert (a.merge(b).registers == u.registers).all()
    assert abs(u.estimate() - 8000) / 8000 < 0.05

    # end-to-end per-key approx vs exact
    keys = ["x"] * 4000 + ["y"] * 1000
    vals = [f"u{i}" for i in range(4000)] + [f"v{i % 137}" for i in range(1000)]
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(vals)}))
    got = approx_distinct(ds, "k", "v").to_pandas().set_index("k")["approx_distinct"]
    assert abs(got["x"] - 4000) / 4000 < 0.08
    assert abs(got["y"] - 137) / 137 < 0.08


def test_minhash_small_and_scale_paths_agree(ray_session):
    """The size-gated broadcast path and the native-join scale path must
    produce identical verified pairs (gates forced to 0 to exercise the
    join path on small data)."""
    import ray.data

    from engine.stages.dedup import minhash_lsh_pairs

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    small = (
        minhash_lsh_pairs(ds, threshold=0.5)
        .sort(["doc_a", "doc_b"])
        .to_pandas()
    )
    scale = (
        minhash_lsh_pairs(
            ds, threshold=0.5, broadcast_hot_max=0, broadcast_pairs_max=0
        )
        .sort(["doc_a", "doc_b"])
        .to_pandas()
    )
    assert len(small) > 0
    assert small.reset_index(drop=True).equals(scale.reset_index(drop=True))


def test_minhash_and_cc_zero_pair_corpus(ray_session):
    """All-unique corpus: zero candidate pairs must yield typed empty
    results on BOTH gated paths, and connected_components on an empty pair
    set must return a typed empty cluster table (block-less materialized
    datasets lose their schema — regression for the early-exit guards)."""
    import ray.data

    from engine.stages.dedup import connected_components, minhash_lsh_pairs

    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(
                [
                    f"unique document number {i} "
                    + " ".join(f"w{i}x{j}" for j in range(30))
                    for i in range(40)
                ],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    for hot_max, pairs_max in ((10**6, 10**5), (0, 0)):
        p = minhash_lsh_pairs(
            ds, threshold=0.5,
            broadcast_hot_max=hot_max, broadcast_pairs_max=pairs_max,
        )
        assert p.count() == 0
        assert set(p.schema().names) == {"doc_a", "doc_b", "jaccard"}
    cc = connected_components(
        ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    )
    assert cc.count() == 0
    assert set(cc.schema().names) == {"doc_id", "cluster_id"}


def test_pack_sequences_prefix_sum(ray_session):
    """Distributed two-phase prefix sum == serial cumsum; pack boundaries
    at floor(stream_offset / seq_len)."""
    import ray.data

    from engine.stages.pack import pack_sequences

    texts = [f"{'tok ' * (i % 7 + 1)}" for i in range(200)]
    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = (
        pack_sequences(ray.data.from_arrow(t), seq_len=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    acc = 0
    for i, row in out.iterrows():
        n = i % 7 + 1
        assert row["n_tokens"] == n
        assert row["stream_offset"] == acc
        assert row["pack_id"] == acc // 10
        acc += n


def test_deterministic_sampling(ray_session):
    """Hash-gated sampling: reproducible across runs/partitionings, rate
    approximately honored, strata rates independent."""
    import ray.data

    from engine.stages.sample import deterministic_sample, stratified_sample

    t = pa.table({
        "doc_id": pa.array(range(2000), pa.int64()),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(2000)], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    a = deterministic_sample(ds, rate_pct=10).to_pandas()["doc_id"].tolist()
    b = deterministic_sample(
        ray.data.from_arrow(t).repartition(7), rate_pct=10
    ).to_pandas()["doc_id"].tolist()
    assert sorted(a) == sorted(b)  # partitioning-independent
    assert 120 <= len(a) <= 280  # ~10% of 2000

    s = stratified_sample(
        ds, rates={"en": 50}, default_rate_pct=10
    ).to_pandas()
    n_en = (s["lang"] == "en").sum()
    n_de = (s["lang"] == "de").sum()
    assert 400 <= n_en <= 600  # ~50% of 1000
    assert 60 <= n_de <= 140   # ~10% of 1000
    # subset law: the 10% sample is a subset of the 50% sample per id
    ten = set(deterministic_sample(ds, rate_pct=10).to_pandas()["doc_id"])
    fifty = set(deterministic_sample(ds, rate_pct=50).to_pandas()["doc_id"])
    assert ten <= fifty


def test_simhash_pairs_hamming(ray_session):
    """SimHash band pairing finds near-identical docs (hamming <= 3) and
    the pigeonhole guarantee holds: every pair within distance 3 appears."""
    import ray.data

    from engine.stages.dedup import SimHashStage, simhash_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = [base, base + "extra", "entirely different words " * 10,
             base.replace("quick", "quik"), "unrelated content here " * 12]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = simhash_pairs(ray.data.from_arrow(t), max_hamming=3).to_pandas()
    found = {(r["doc_a"], r["doc_b"]) for _, r in got.iterrows()}

    # exact oracle: all-pairs hamming over the same fingerprints
    sims = [int(x, 16) for x in SimHashStage()(t).column("simhash").to_pylist()]
    expect = set()
    for i in range(len(sims)):
        for j in range(i + 1, len(sims)):
            if bin(sims[i] ^ sims[j]).count("1") <= 3:
                expect.add((i, j))
    assert found == expect
    for _, r in got.iterrows():
        assert bin(sims[r["doc_a"]] ^ sims[r["doc_b"]]).count("1") == r["hamming"]


def test_bucket_pairs_star_gate():
    """Above the gate a bucket emits the O(m) star pattern (min-id rep x
    members), not O(m^2) all-pairs — the 100 TB hot-bucket bound."""
    import pandas as pd

    from engine.stages.dedup import _bucket_pairs

    m = 10_000
    df = pd.DataFrame({"doc_id": pd.Series(range(m), dtype="int64")})
    star = _bucket_pairs(df, max_bucket=4096)
    assert len(star) == m - 1  # O(m), not m*(m-1)/2
    assert (star["doc_a"] == 0).all()
    assert sorted(star["doc_b"]) == list(range(1, m))

    # below the gate: unchanged all-pairs
    small = _bucket_pairs(pd.DataFrame({"doc_id": pd.Series([3, 1, 2], dtype="int64")}))
    assert sorted(map(tuple, small.values.tolist())) == [(1, 2), (1, 3), (2, 3)]


def test_star_gate_keeps_clusters_connected(ray_session):
    """With a tiny gate forcing the star path end-to-end, identical docs
    still verify (J=1.0) and cluster into ONE component."""
    import ray.data

    from engine.stages.dedup import connected_components, minhash_lsh_pairs

    texts = ["same boilerplate text repeated for every page " * 4] * 12
    ds = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(12), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
    )
    pairs = minhash_lsh_pairs(ds, threshold=0.5, max_bucket=4).materialize()
    p = pairs.to_pandas()
    assert (p["jaccard"] == 1.0).all()
    # star pattern: far fewer than all 66 pairs, but still spanning
    assert len(p) < 66
    clusters = connected_components(pairs).to_pandas()
    assert clusters["cluster_id"].nunique() == 1
    assert set(clusters["doc_id"]) == set(range(12))


def test_star_gate_recall_quantified(ray_session):
    """Quantify the star-gate pairwise-recall loss end-to-end (r3 verdict
    #8).  Corpus: one hot bucket of m=24 identical docs + one ordinary
    near-dup pair outside it.  Pinned numbers (documented in COVERAGE.md):

    - within the hot bucket, star recall = (m-1)/C(m,2) = 2/m ~ 0.083;
    - OUTSIDE the hot bucket recall is 1.0 (the gate only ever fires
      inside the pathological bucket);
    - CLUSTER-level recall is 1.0: connected_components over the gated
      pairs produces the identical partition, because the star spans the
      bucket and every star edge verifies at J=1.0.
    """
    import ray.data

    from engine.stages.dedup import connected_components, minhash_lsh_pairs

    m = 24
    hot = ["hot boilerplate navigation footer text " * 5] * m
    near = [
        "rare quartz zebra melody harbor lantern velvet osprey " * 4,
        "rare quartz zebra melody harbor lantern velvet osprey " * 4
        + "trailing tail",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(m)) + [100, 101], pa.int64()),
            "text": pa.array(hot + near, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)

    def pairset(pairs):
        p = pairs.to_pandas()
        return {(int(a), int(b)) for a, b in zip(p["doc_a"], p["doc_b"])}

    truth_ds = minhash_lsh_pairs(ds, threshold=0.5, max_bucket=10_000).materialize()
    star_ds = minhash_lsh_pairs(ds, threshold=0.5, max_bucket=4).materialize()
    truth, star = pairset(truth_ds), pairset(star_ds)

    hot_truth = {p for p in truth if p[0] < m}
    hot_star = {p for p in star if p[0] < m}
    assert hot_truth == {(i, j) for i in range(m) for j in range(i + 1, m)}
    assert hot_star == {(0, j) for j in range(1, m)}
    recall_hot = len(hot_star & hot_truth) / len(hot_truth)
    assert recall_hot == (m - 1) / (m * (m - 1) // 2)  # = 2/m ~ 0.083

    # outside the hot bucket: untouched, recall 1.0
    assert (truth - hot_truth) == (star - hot_star) == {(100, 101)}

    # cluster-level recall 1.0: identical partitions either way
    def partition(pairs):
        cl = connected_components(pairs).to_pandas()
        groups = cl.groupby("cluster_id")["doc_id"].apply(frozenset)
        return set(groups)

    assert partition(truth_ds) == partition(star_ds)


def test_star_gate_dropped_edge_recall():
    """The documented failure mode of the star pattern (_STAR_GATE
    comment): when rep-to-member similarity is BELOW the caller's
    threshold, verification drops that star edge and recall inside the
    pathological bucket is partial — quantified here on a graded bucket.

    Members i=0..9 with shingle sets S_i = [5i, 5i+50): J(i,j) =
    (50-5d)/(50+5d) for d=|i-j|, so at threshold 0.5 the TRUE pair graph
    is the d<=3 chain band (24 edges, one connected component).  The star
    keeps only rep edges (0,j) with J >= 0.5, i.e. j <= 3: recall 3/24 =
    0.125 and members 4..9 disconnect.  This is the tradeoff the gate
    logs: connectivity is only guaranteed when the bucket's members all
    verify against the representative (e.g. identical boilerplate, the
    case the gate exists for)."""
    import pandas as pd

    from engine.stages.dedup import _bucket_pairs

    n = 10
    sets = {i: set(range(5 * i, 5 * i + 50)) for i in range(n)}

    def jac(a, b):
        return len(sets[a] & sets[b]) / len(sets[a] | sets[b])

    ids = pd.DataFrame({"doc_id": pd.Series(range(n), dtype="int64")})
    verify = lambda df: {
        (int(a), int(b))
        for a, b in zip(df["doc_a"], df["doc_b"])
        if jac(int(a), int(b)) >= 0.5
    }
    truth = verify(_bucket_pairs(ids, max_bucket=10_000))
    star = verify(_bucket_pairs(ids, max_bucket=4))
    assert truth == {(i, j) for i in range(n) for j in range(i + 1, n) if j - i <= 3}
    assert star == {(0, 1), (0, 2), (0, 3)}
    assert len(star) / len(truth) == 0.125  # pinned partial recall

    # connectivity loss: truth spans one component; star isolates 4..9
    def components(edges):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        return len({find(i) for i in range(n)})

    assert components(truth) == 1
    assert components(star) == 1 + (n - 4)  # {0..3} plus 6 singletons


def test_simhash_star_gate(ray_session):
    import ray.data

    from engine.stages.dedup import simhash_pairs

    texts = ["identical content words here " * 6] * 8
    t = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = simhash_pairs(ray.data.from_arrow(t), max_hamming=3, max_bucket=4).to_pandas()
    assert (got["hamming"] == 0).all()
    # star: rep 0 paired with everyone; no quadratic blowup
    assert set(zip(got["doc_a"], got["doc_b"])) == {(0, j) for j in range(1, 8)}


def test_embedding_star_gate(ray_session):
    import ray.data

    from engine.stages.dedup import embedding_nn_pairs

    vec = [1.0, 0.5, -0.25, 0.125]
    t = pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([vec] * 10, pa.list_(pa.float64())),
    })
    got = embedding_nn_pairs(
        ray.data.from_arrow(t), threshold=0.9, max_bucket=4
    ).to_pandas()
    assert (got["cos"] == 1.0).all()
    assert set(zip(got["id_a"], got["id_b"])) == {(0, j) for j in range(1, 10)}


def test_semdedup_matches_greedy_oracle(ray_session):
    """semdedup == a single-process oracle running the same centroid
    assignment + greedy keep-first-by-id, at several partitionings; the
    star-gate path keeps worst-case memory linear and is pinned on an
    all-identical cluster where it agrees with the exact path."""
    import ray.data

    from engine.stages.ann import _normalize, train_centroids
    from engine.stages.dedup import semdedup

    rs = np.random.RandomState(11)
    base = rs.randn(30, 12)
    ids, vecs = [], []
    k = 0
    for i in range(30):
        ids.append(k); vecs.append(base[i]); k += 1
        if i % 3 == 0:  # jittered near-copy
            ids.append(k); vecs.append(base[i] + 1e-3 * rs.randn(12)); k += 1
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
        ),
    })

    cent = train_centroids(ray.data.from_arrow(t), 5, lloyd_iters=2)
    vn = _normalize(np.array(vecs, dtype=np.float64))
    assign = np.argmax(vn @ cent.T, axis=1)
    expected = {}
    for c in set(assign.tolist()):
        members = [i for i in range(len(ids)) if assign[i] == c]  # id asc
        kept: list = []
        for i in members:
            dup = any(float(vn[j] @ vn[i]) >= 0.95 for j in kept)
            expected[ids[i]] = not dup
            if not dup:
                kept.append(i)

    for nparts in (1, 4):
        out = (
            semdedup(
                ray.data.from_arrow(t).repartition(nparts),
                n_clusters=5, threshold=0.95,
            )
            .to_pandas()
        )
        assert dict(zip(out["vec_id"], out["kept"])) == expected, nparts
        # every dropped doc has a kept lower-id neighbor in its cluster
        assert out["cluster_id"].isin(range(5)).all()

    # star gate: identical vectors, gate smaller than the cluster — the
    # degraded path must agree with the exact path here (all dup of #0)
    t2 = pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "embedding": pa.array([[1.0, 0.5, -0.25]] * 12, pa.list_(pa.float64())),
    })
    star = semdedup(
        ray.data.from_arrow(t2), n_clusters=2, threshold=0.9, max_cluster=4
    ).to_pandas().sort_values("vec_id")
    assert star["kept"].tolist() == [True] + [False] * 11


def test_distributed_quantiles_exact(ray_session):
    """grouped_quantiles_disc is EXACT vs a single-process numpy sort, at
    several block counts, including heavy-duplicate distributions (the
    rank-bounded window must handle ties across blocks)."""
    import math

    import ray.data

    from engine.stages.quantiles import grouped_quantiles_disc

    rng = np.random.RandomState(7)
    n = 20_000
    groups = rng.choice(["a", "b", "c"], size=n)
    # mixture: continuous + heavy duplicates + constant group
    vals = np.where(
        rng.rand(n) < 0.5, rng.randn(n), rng.randint(0, 5, size=n).astype(float)
    )
    vals[groups == "c"] = 42.0  # all-equal group
    t = pa.table({"g": pa.array(groups.tolist()), "v": pa.array(vals, pa.float64())})
    qs = (0.5, 0.9, 0.99)

    def oracle(g, q):
        s = np.sort(vals[groups == g])
        return float(s[max(0, math.ceil(q * len(s)) - 1)])

    for blocks in (1, 7, 32):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = grouped_quantiles_disc(
            ds, group_col="g", value_col="v", qs=qs, sample_per_block=16
        )
        got = {r["g"]: r for r in out.to_pylist()}
        for g in ("a", "b", "c"):
            for q in qs:
                assert got[g][f"q{q}"] == oracle(g, q), (g, q, blocks)
            assert got[g]["n_rows"] == int((groups == g).sum())


def test_quantile_window_planner_vectorized():
    """_plan_windows_group (vectorized sweep) matches the naive per-candidate
    bisect oracle exactly, and its driver cost stays ~linear in block count
    (round-3 VERDICT #2: the old planner was O(candidates x blocks))."""
    import math
    import time
    from bisect import bisect_right

    from engine.stages.quantiles import _plan_windows_group

    def naive(summaries, qs):
        n_total = sum(s[0] for s in summaries)
        cand = sorted({v for _, _, vals in summaries for v in vals})
        windows = {}
        for q in qs:
            k = max(1, math.ceil(q * n_total))
            lo, hi = -math.inf, math.inf
            for v in cand:
                lb = ub = 0
                for n, ranks, vals in summaries:
                    j = bisect_right(vals, v)
                    lb += 0 if j == 0 else ranks[j - 1] + 1
                    ub += n if j == len(vals) else ranks[j]
                if ub < k:
                    lo = v
                if lb >= k and v < hi:
                    hi = v
            windows[q] = (lo, hi)
        return n_total, windows

    rng = np.random.RandomState(11)

    def make_summaries(blocks, s=8):
        out = []
        for _ in range(blocks):
            n = rng.randint(s, 4 * s)
            # heavy duplicates: integer-valued blocks exercise tie handling
            arr = np.sort(rng.randint(0, 10, size=n).astype(float))
            step = max(1, math.ceil(n / s))
            idx = np.arange(0, n, step, dtype=np.int64)
            if idx[-1] != n - 1:
                idx = np.append(idx, n - 1)
            out.append((n, idx.tolist(), arr[idx].tolist()))
        return out

    qs = (0.1, 0.5, 0.9, 1.0)
    for blocks in (1, 3, 17, 60):
        summ = make_summaries(blocks)
        assert _plan_windows_group(summ, qs) == naive(summ, qs), blocks

    # linearity: 4x the blocks must cost well under 4^2/2 the time
    def timed(blocks):
        summ = make_summaries(blocks, s=16)
        t0 = time.perf_counter()
        for _ in range(3):
            _plan_windows_group(summ, qs)
        return (time.perf_counter() - t0) / 3

    timed(64)  # warm numpy
    t1k, t4k = timed(1_000), timed(4_000)
    assert t4k < 8 * max(t1k, 1e-4), (t1k, t4k)


def test_bulk_sink_retry_protocol(ray_session, tmp_path):
    """Per-document sink failure semantics (es_sink parity): transient
    failures retry ONLY the failed docs, 400-analogs quarantine without
    retry, persistent failures exhaust max_retries; accepted rows and
    quarantined rows split losslessly."""
    from hashlib import md5 as _md5

    import ray.data

    from engine.stages.sink_policy import (
        BulkSinkStage,
        deterministic_fault_injector,
        run_bulk_sink,
        write_with_quarantine,
    )

    ids = list(range(1, 400))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    got = (
        run_bulk_sink(ds, bulk_fn=deterministic_fault_injector, max_retries=3)
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(got) == len(ids)
    for i in ids:
        hv = int(_md5(str(i).encode()).hexdigest()[:8], 16)
        if hv % 23 == 0:
            exp = ("failed", 3, "bulk_error")
        elif hv % 23 == 1:
            exp = ("rejected", 1, "rejected_400")
        elif hv % 5 == 0:
            exp = ("indexed", 2, "")
        else:
            exp = ("indexed", 1, "")
        r = got.loc[i]
        assert (r["status"], r["attempts"], r["reason"]) == exp, i
    # every status class must actually occur in this id range
    assert set(got["status"]) == {"indexed", "rejected", "failed"}
    assert (got[got["status"] == "indexed"]["attempts"] == 2).any()

    # quarantine split is lossless and disjoint
    n_ok, n_bad = write_with_quarantine(
        ds,
        str(tmp_path / "ok"),
        str(tmp_path / "bad"),
        bulk_fn=deterministic_fault_injector,
    )
    assert n_ok + n_bad == len(ids)
    assert n_ok == (got["status"] == "indexed").sum()
    bad = ray.data.read_parquet(str(tmp_path / "bad")).to_pandas()
    assert set(bad["status"]) == {"rejected", "failed"}

    # idempotent re-run: directories are cleared, not appended to
    n_ok2, n_bad2 = write_with_quarantine(
        ds,
        str(tmp_path / "ok"),
        str(tmp_path / "bad"),
        bulk_fn=deterministic_fault_injector,
    )
    assert (n_ok2, n_bad2) == (n_ok, n_bad)
    assert ray.data.read_parquet(str(tmp_path / "ok")).count() == n_ok
    assert ray.data.read_parquet(str(tmp_path / "bad")).count() == n_bad

    # ignore_persistent_400=False mirrors the reference raise
    reject_id = next(
        i for i in ids if int(_md5(str(i).encode()).hexdigest()[:8], 16) % 23 == 1
    )
    stage = BulkSinkStage(
        bulk_fn=deterministic_fault_injector, ignore_persistent_400=False
    )
    with pytest.raises(RuntimeError):
        stage(pa.table({"doc_id": pa.array([reject_id], pa.int64())}))

    # batches are emitted sorted by id (the reference's pre-flush sort)
    out = BulkSinkStage()(pa.table({"doc_id": pa.array([5, 3, 9], pa.int64())}))
    assert out.column("doc_id").to_pylist() == [3, 5, 9]


def test_approx_quantiles_accuracy(ray_session):
    """The one-pass mergeable digest's rank error stays under 3/delta at
    every probed quantile, across block counts (HLL-style accuracy-bound
    test for an approximate-by-design operator)."""
    import ray.data

    from engine.stages.quantiles import grouped_quantiles_approx

    rng = np.random.RandomState(11)
    n = 50_000
    groups = rng.choice(["x", "y"], size=n)
    vals = np.where(rng.rand(n) < 0.3, rng.randn(n) * 100, rng.exponential(10, n))
    t = pa.table({"g": pa.array(groups.tolist()), "v": pa.array(vals, pa.float64())})
    delta = 100
    qs = (0.1, 0.5, 0.9, 0.99)
    for blocks in (4, 32):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = grouped_quantiles_approx(
            ds, group_col="g", value_col="v", qs=qs, delta=delta
        )
        got = {r["g"]: r for r in out.to_pylist()}
        for g in ("x", "y"):
            sorted_g = np.sort(vals[groups == g])
            ng = len(sorted_g)
            assert got[g]["n_rows"] == ng
            for q in qs:
                est = got[g][f"q{q}"]
                rank = np.searchsorted(sorted_g, est) / ng
                assert abs(rank - q) < 3.0 / delta, (g, q, blocks, rank)


def test_line_dedup_drops_boilerplate(ray_session):
    """CCNet-style line dedup: lines in >= min_docs DISTINCT docs are
    dropped everywhere; order preserved; broadcast and join paths are
    pinned identical."""
    import ray.data

    from engine.stages.clean import line_dedup

    docs = [
        (1, "alpha\nSHARED FOOTER\nbeta"),
        (2, "SHARED FOOTER\ngamma"),
        (3, "unique only"),
        (4, ""),
        (5, "SHARED FOOTER"),
        (6, "dup\ndup\ndelta"),  # within-doc dup only: NOT boilerplate
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    got = (
        line_dedup(ds, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = {
        1: (3, 1, "alpha\nbeta"),
        2: (2, 1, "gamma"),
        3: (1, 0, "unique only"),
        4: (1, 0, ""),
        5: (1, 1, ""),
        6: (3, 0, "dup\ndup\ndelta"),
    }
    for _, r in got.iterrows():
        nl, nd, ct = exp[r["doc_id"]]
        assert (r["n_lines"], r["n_dropped"], r["clean_text"]) == (nl, nd, ct), r["doc_id"]
        assert r["clean_chars"] == len(ct)

    # scale paths must be identical: (a) drop-list broadcast fallback
    # (broadcast_max=0 forces it), (b) doc-shuffle fallback (both gates 0)
    cols = ["doc_id", "n_lines", "n_dropped", "clean_text", "clean_chars"]
    for kw in (
        dict(broadcast_max=0),
        dict(broadcast_max=0, drop_broadcast_max=-1),
    ):
        got_fb = (
            line_dedup(ray.data.from_arrow(t).repartition(3), min_docs=2, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got_fb[cols].equals(got[cols]), kw


def test_corpus_overlap_counts_shared_grams(ray_session):
    """Distributed corpus-vs-corpus overlap: per A-doc count of distinct
    word 5-grams that occur anywhere in corpus B — no broadcast, the
    whole resolution is one union + groupby(h) semi-join with sentinel
    total rows."""
    import ray.data

    from engine.stages.clean import corpus_overlap

    shared = "one two three four five"          # 1 shared 5-gram
    a_docs = [
        (2, f"{shared} six seven"),             # grams: 3, shared: 1
        (4, "p q r s t u"),                     # grams: 2, shared: 0
        (6, f"x {shared}"),                     # grams: 2, shared: 1
        (8, "tiny doc"),                        # < 5 tokens: 0 grams
    ]
    b_docs = [
        (1, f"zz {shared} yy"),
        (3, "totally different words here indeed"),
    ]

    def mk(rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([d for d, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        })).repartition(2)

    got = (
        corpus_overlap(mk(a_docs), mk(b_docs), n=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = {2: (3, 1), 4: (2, 0), 6: (2, 1), 8: (0, 0)}
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert (r["n_grams"], r["overlap_grams"]) == exp[r["doc_id"]], r["doc_id"]

    # empty B side: all zeros, every A doc still present
    got0 = corpus_overlap(mk(a_docs), mk(b_docs).filter(
        lambda r: False), n=5).to_pandas().sort_values("doc_id")
    assert got0["overlap_grams"].sum() == 0 and len(got0) == len(a_docs)


def test_span_dedup_keeps_first_occurrence(ray_session):
    """Exact duplicated-span removal (Lee et al. 2107.06499, fixed-width
    variant): every 8-token window occurring >= 2 times anywhere keeps
    only its globally-first occurrence (min (doc_id, start)); all three
    size-gated paths are pinned identical."""
    import ray.data

    from engine.stages.clean import span_dedup

    span = "a b c d e f g h"  # the duplicated 8-token span
    docs = [
        (1, f"x {span} y"),            # first occurrence (packed key min)
        (2, f"{span} tail1 tail2"),    # later doc: span dropped
        (3, f"pre1 pre2 {span}"),      # later doc: span dropped
        (4, "s1 s2 s3 s4 s5 s6 s7 s8 mid s1 s2 s3 s4 s5 s6 s7 s8"),
        (5, "tiny"),                   # < width tokens: no windows
        (6, ""),                       # empty
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    got = (
        span_dedup(ds, width=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = {
        1: (10, 0, f"x {span} y"),
        2: (10, 8, "tail1 tail2"),
        3: (10, 8, "pre1 pre2"),
        # within-doc repeat: second copy dropped, first + separator kept
        4: (17, 8, "s1 s2 s3 s4 s5 s6 s7 s8 mid"),
        5: (1, 0, "tiny"),
        6: (0, 0, ""),
    }
    for _, r in got.iterrows():
        nt, nd, ct = exp[r["doc_id"]]
        assert (r["n_tokens"], r["n_dropped"], r["clean_text"]) == (nt, nd, ct), (
            r["doc_id"]
        )
        assert r["clean_chars"] == len(ct)

    # scale paths must be identical: (a) drop-list broadcast fallback
    # (broadcast_max=-1 forces it), (b) doc-keyed shuffle (both gates off)
    cols = ["doc_id", "n_tokens", "n_dropped", "clean_text", "clean_chars"]
    for kw in (
        dict(broadcast_max=-1),
        dict(broadcast_max=-1, drop_broadcast_max=-1),
    ):
        got_fb = (
            span_dedup(ray.data.from_arrow(t).repartition(3), width=8, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got_fb[cols].equals(got[cols]), kw

    # the (doc_id, start) packing guard trips loudly on over-long docs
    big = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array([" ".join(["t"] * (1 << 20))], pa.string()),
    })
    with pytest.raises(Exception, match="caps docs at"):
        span_dedup(ray.data.from_arrow(big), width=8).materialize()


def test_bm25_wide_query_matches_dense_numpy_oracle(ray_session):
    """50-term query: the sparse Counter-based tf path must rank exactly
    like a dense numpy evaluation of the same Lucene-BM25 formula (the
    pre-sparse implementation's semantics: j-loop over ALL terms with
    zeros for absent ones, sequential float accumulation)."""
    import ray.data

    from engine.stages.search import bm25_topk

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(5, 60))))
        for _ in range(200)
    ]
    terms = [f"w{i}" for i in range(0, 100, 2)]  # 50 terms
    k1, b, k = 1.2, 0.75, 30

    # dense oracle
    import re as _re

    tok = _re.compile(r"[^\t\n\v\f\r ]+")
    toks = [tok.findall(t) for t in texts]
    dl = np.array([len(ts) for ts in toks], dtype=np.float64)
    N = len(texts)
    avgdl = float(dl.sum()) / N
    tf = np.zeros((N, len(terms)), dtype=np.float64)
    for i, ts in enumerate(toks):
        for j, term in enumerate(terms):
            tf[i, j] = ts.count(term)
    scores = np.zeros(N, dtype=np.float64)
    for j in range(len(terms)):
        df = float((tf[:, j] > 0).sum())
        idf = np.log(1 + (N - df + 0.5) / (df + 0.5))
        scores = scores + (idf * tf[:, j] * (k1 + 1.0)) / (
            tf[:, j] + k1 * (1 - b + b * (dl / avgdl))
        )
    order = sorted(range(N), key=lambda i: (-scores[i], i))
    want = [i for i in order if scores[i] > 0][:k]

    ds = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(N), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
    ).repartition(5)
    got = bm25_topk(ds, terms, k=k, k1=k1, b=b)
    assert got.column("doc_id").to_pylist() == want
    assert got.column("rank").to_pylist() == list(range(1, len(want) + 1))


def test_decontam_string_and_hash_paths_agree(ray_session):
    """Benchmark decontamination: overlap counts are exact, and the
    above-gate FNV-hash broadcast path matches the raw-string path."""
    import ray.data

    from engine.stages.clean import decontam

    corpus = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different words with no benchmark overlap at all"),
        (3, "xx the quick brown fox jumps over yy zz ww"),
        (4, "short doc"),
    ]
    ev = [(100, "the quick brown fox jumps over the fence")]
    ct = pa.table({
        "doc_id": pa.array([d for d, _ in corpus], pa.int64()),
        "text": pa.array([x for _, x in corpus], pa.string()),
    })
    et = pa.table({
        "doc_id": pa.array([d for d, _ in ev], pa.int64()),
        "text": pa.array([x for _, x in ev], pa.string()),
    })
    for bmax in (2_000_000, 0):  # string path, then forced FNV-hash path
        got = (
            decontam(
                ray.data.from_arrow(ct),
                ray.data.from_arrow(et),
                n=5,
                broadcast_max=bmax,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 1: grams of ev text overlap on 5-grams within the shared
        # prefix 'the quick brown fox jumps over the'
        assert got.loc[0, "n_grams"] == 6
        assert got.loc[0, "contam_grams"] == 3
        assert got.loc[1, "contam_grams"] == 0
        assert got.loc[2, "contam_grams"] == 2
        assert got.loc[3, "n_grams"] == 0 and got.loc[3, "contam_grams"] == 0


@pytest.mark.parametrize(
    "gate", [2_000_000, 0], ids=["driver-path", "distributed-path"]
)
def test_pagerank_matches_power_iteration(ray_session, gate):
    """Both PageRank paths (gated driver numpy, distributed join rounds)
    == single-process numpy power iteration with the identical formula
    (damping, dangling-mass correction, multigraph edge semantics), on a
    graph with a dangling node, a sink-only node, and a duplicate edge."""
    import ray.data

    from engine.stages.graph import pagerank

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 1), (4, 5)]
    # node 5 is dangling (no out-edges); node 3 has no in-edges
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    got = (
        pagerank(ray.data.from_arrow(t).repartition(3), damping=0.85, iters=12,
                 driver_max_edges=gate)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes = sorted({x for e in E for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    outdeg = np.zeros(N)
    for a, _ in E:
        outdeg[idx[a]] += 1
    r = np.full(N, 1.0 / N)
    d = 0.85
    for _ in range(12):
        contrib = np.zeros(N)
        for a, b in E:
            contrib[idx[b]] += r[idx[a]] / outdeg[idx[a]]
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / N + d * (contrib + dangling / N)
    assert got["node"].tolist() == nodes
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_pagerank_sink_heavy_graph(ray_session):
    """Sink-heavy graph (2 source nodes fanning out to 200 sinks):
    n_nodes//32 exceeds the distinct-src count, so without the n_src cap
    the hash joins would create empty partitions (acero schema loss).
    Result must still match power iteration."""
    import ray.data

    from engine.stages.graph import pagerank

    E = [(0, d) for d in range(2, 102)] + [(1, d) for d in range(102, 202)]
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    got = (
        pagerank(ray.data.from_arrow(t).repartition(4), damping=0.85, iters=5,
                 driver_max_edges=0)  # the test targets the DISTRIBUTED joins
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes = sorted({x for e in E for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    outdeg = np.zeros(N)
    for a, _ in E:
        outdeg[idx[a]] += 1
    r = np.full(N, 1.0 / N)
    d = 0.85
    for _ in range(5):
        contrib = np.zeros(N)
        for a, b in E:
            contrib[idx[b]] += r[idx[a]] / outdeg[idx[a]]
        dangling = r[outdeg == 0].sum()
        r = (1 - d) / N + d * (contrib + dangling / N)
    assert got["node"].tolist() == nodes
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)


def test_snapshot_diff_classifies(ray_session):
    """added/removed/changed/same classification, partitioning-independent."""
    import ray.data

    from engine.stages.diff import snapshot_diff

    old = pa.table({
        "url": pa.array(["a", "b", "c", "d"], pa.string()),
        "text": pa.array(["1", "2", "3", "4"], pa.string()),
    })
    new = pa.table({
        "url": pa.array(["a", "b", "e"], pa.string()),
        "text": pa.array(["1", "CHANGED", "5"], pa.string()),
    })
    got = (
        snapshot_diff(
            ray.data.from_arrow(old).repartition(2),
            ray.data.from_arrow(new).repartition(3),
            key_col="url",
            content_col="text",
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert dict(zip(got["url"], got["status"])) == {
        "a": "same", "b": "changed", "c": "removed", "d": "removed", "e": "added",
    }


def test_latest_events_argmax(ray_session):
    """Argmax per key with (ts, id) tie-break; identical across block
    layouts (the per-batch candidate pre-aggregation must not change the
    answer)."""
    import ray.data

    from engine.stages.diff import latest_events

    rows = [
        (1, 10, 100, "x"), (1, 11, 300, "y"), (1, 12, 300, "z"),  # tie on ts
        (2, 20, 50, "p"), (3, 30, 1, "q"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts_us": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    for blocks in (1, 4):
        got = (
            latest_events(
                ray.data.from_arrow(t).repartition(blocks),
                key_col="user_id", ts_col="ts_us",
                tiebreak_col="event_id", carry_cols=("event_type",),
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert got[["user_id", "event_id", "event_type"]].values.tolist() == [
            [1, 12, "z"], [2, 20, "p"], [3, 30, "q"],
        ]


def test_index_build_matches_counter_oracle(ray_session):
    """term_stats / postings == a single-process Counter oracle: df counts
    documents containing the token, cf total occurrences; the top_n cut is
    total-ordered (cf desc, token asc — token unique); postings emit only
    the fixed term set, (token, doc_id)-sorted."""
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from engine.stages.index_build import postings, term_stats
    from engine.stages.text import _TOKEN

    docs = [
        (1, "alpha beta beta gamma"),
        (2, "beta gamma gamma delta"),
        (3, "alpha alpha epsilon"),
        (4, ""),  # empty doc: no tokens
        (5, "zeta zeta zeta beta"),
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })

    df_o, cf_o = Counter(), Counter()
    for _, txt in docs:
        c = Counter(_TOKEN.findall(txt))
        cf_o.update(c)
        df_o.update(c.keys())
    expect = sorted(cf_o, key=lambda k: (-cf_o[k], k))[:4]

    got = term_stats(
        ray.data.from_arrow(t).repartition(3), top_n=4
    ).to_pandas()
    assert got["token"].tolist() == expect
    for _, r in got.iterrows():
        assert (r["df"], r["cf"]) == (df_o[r["token"]], cf_o[r["token"]])

    got_p = postings(
        ray.data.from_arrow(t).repartition(3), ("beta", "alpha", "nosuch")
    ).to_pandas()
    exp_rows = sorted(
        (tok, d, Counter(_TOKEN.findall(txt))[tok])
        for d, txt in docs
        for tok in ("beta", "alpha")
        if tok in _TOKEN.findall(txt)
    )
    assert [tuple(r) for r in got_p[["token", "doc_id", "tf"]].values] == exp_rows


def test_unigram_nll_matches_math_oracle(ray_session):
    """Unigram-LM mean NLL == a single-process math oracle (same
    token-asc left-to-right summation), and the hybrid scale path
    (forced tiny head) is bit-identical to the broadcast path."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from engine.stages.lm import unigram_nll
    from engine.stages.text import _TOKEN

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog ate the cat"),
        (3, "rare words xylophone quasar"),
        (4, ""),  # empty: (0, 0)
        (5, "the the the"),
    ]
    corpus = Counter()
    for _, txt in docs:
        corpus.update(_TOKEN.findall(txt))
    n_total = sum(corpus.values())

    def oracle(txt):
        cnt = Counter(_TOKEN.findall(txt))
        dl = sum(cnt.values())
        acc = 0.0
        for tok in sorted(cnt):
            acc += cnt[tok] * math.log(corpus[tok] / n_total)
        return dl, (math.floor((-1e9 * acc) / dl) if dl else 0)

    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    cols = ["doc_id", "n_tokens", "nll_nanonat"]
    got = (
        unigram_nll(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        dl, nll = oracle(dict(docs)[r["doc_id"]])
        assert (r["n_tokens"], r["nll_nanonat"]) == (dl, nll), r["doc_id"]
    # doc 5 is all-stopword (highest prob -> lowest nll); doc 3 all-rare
    by_id = got.set_index("doc_id")["nll_nanonat"]
    assert by_id[5] < by_id[1] < by_id[3]

    for hm in (2, 0):  # head covers some / none of the vocab
        fb = (
            unigram_nll(ray.data.from_arrow(t).repartition(3), head_max=hm)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert fb[cols].astype("int64").equals(got[cols].astype("int64")), hm

    # keep_cols carries metadata through BOTH paths join-free
    t2 = t.append_column(
        "lang", pa.array([f"l{d % 2}" for d, _ in docs], pa.string())
    )
    for hm in (5_000_000, 2, 0):
        kc = (
            unigram_nll(
                ray.data.from_arrow(t2).repartition(3),
                head_max=hm,
                keep_cols=("lang",),
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert kc[cols].astype("int64").equals(got[cols].astype("int64")), hm
        assert kc["lang"].tolist() == [f"l{d % 2}" for d, _ in docs], hm


def test_ppl_buckets_semantics(ray_session):
    """Per-language quartile bucketing: low nll (fluent) -> 'head', high ->
    'tail'; thresholds are per-LANGUAGE so a language whose docs are all
    alike still splits 25/50/25 by its own distribution."""
    import pyarrow as pa
    import ray.data

    from engine.stages.lm import ppl_buckets

    # lang 'a': 8 docs of graded rarity; lang 'b': 4 identical docs
    docs = [(i, "the " * 8 + "rareword%d " % i * i, "a") for i in range(1, 9)]
    docs += [(10 + j, "the cat sat", "b") for j in range(4)]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
            "text": pa.array([x for _, x, _ in docs], pa.string()),
            "lang": pa.array([l for _, _, l in docs], pa.string()),
        }
    )
    out = (
        ppl_buckets(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    a = out[out["lang"] == "a"].sort_values("nll_nanonat")
    # quartile split of 8: 2 head / 4 middle / 2 tail, ordered by nll
    assert a["bucket"].tolist() == ["head"] * 2 + ["middle"] * 4 + ["tail"] * 2
    # identical docs: all at the threshold -> all 'head' (nll <= t_lo)
    assert (out[out["lang"] == "b"]["bucket"] == "head").all()


def test_pii_scrub_redacts_and_counts(ray_session):
    """RE2 scrub kernels: emails first (their parts contain digits/dots),
    then IPv4, then phones; counts are per-stage; multiple occurrences and
    PII-free docs handled."""
    import pyarrow as pa
    import ray.data

    from engine.stages.pii import pii_scrub

    docs = [
        (1, "mail a.b+c@x-y.co.uk and d@e.io today"),
        (2, "server 10.0.255.1 and 192.168.0.254 up"),
        (3, "call +1 555 867 5309 or +49 123 456 7890"),
        (4, "plain text, no pii at all"),
        (5, "mix u@v.com at 8.8.8.8 dial +1 222 333 4444"),
        (6, None),
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    got = (
        pii_scrub(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    exp = {
        1: (2, 0, 0, "mail <EMAIL> and <EMAIL> today"),
        2: (0, 2, 0, "server <IP> and <IP> up"),
        3: (0, 0, 2, "call <PHONE> or <PHONE>"),
        4: (0, 0, 0, "plain text, no pii at all"),
        5: (1, 1, 1, "mix <EMAIL> at <IP> dial <PHONE>"),
        6: (0, 0, 0, ""),
    }
    for d, (ne, ni, np_, ct) in exp.items():
        r = got.loc[d]
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (ne, ni, np_), d
        assert r["clean_text"] == ct, (d, r["clean_text"])
        assert r["clean_chars"] == len(ct)


def test_mixture_sample_targets_and_determinism(ray_session):
    """mixture_sample hits the per-domain targets (within hash-gate noise),
    drops unweighted domains, and is partitioning-independent."""
    import pyarrow as pa
    import ray.data

    from engine.stages.sample import mixture_sample

    n = 3000
    doms = ["a", "b", "c"]  # c unweighted -> dropped
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array([doms[i % 3] for i in range(n)], pa.string()),
        }
    )
    # out target = 40% of 3000 = 1200; a gets 75% of it, b 25%
    weights = {"a": 7500, "b": 2500}
    kw = dict(id_col="doc_id", domain_col="source", weights_bp=weights,
              out_frac_pct=40)
    got1 = mixture_sample(
        ray.data.from_arrow(t), **kw
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    got8 = mixture_sample(
        ray.data.from_arrow(t).repartition(8), **kw
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got1.equals(got8)  # partitioning-independent
    by = got1.groupby("source").size().to_dict()
    assert "c" not in by
    # rate_bp: a = min(10000, 7500*1200//1000) = 9000 -> ~900 of 1000
    # (hash-gate binomial noise; 5 sigma ~ 47)
    assert abs(by["a"] - 900) < 60, by
    # b = 2500*1200//1000 = 3000 -> ~300
    assert abs(by["b"] - 300) < 60, by
    # capping: weight so large the domain cannot supply it -> keep all
    gotcap = mixture_sample(
        ray.data.from_arrow(t),
        id_col="doc_id", domain_col="source",
        weights_bp={"a": 10000}, out_frac_pct=400,
    ).to_pandas()
    assert len(gotcap) == 1000 and set(gotcap["source"]) == {"a"}


def test_grouped_topk_matches_pandas(ray_session):
    """Two-stage grouped top-k == single-process pandas oracle across block
    counts (stage-1 locality must never discard a global winner)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from engine.stages.topk import grouped_topk

    rs = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "g": rs.randint(0, 7, 500),
            "v": rs.randint(0, 40, 500),  # heavy ties -> tiebreaker matters
            "id": np.arange(500, dtype=np.int64),
        }
    )
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(5)
    )
    exp = exp.sort_values(["g", "v", "id"], ascending=[True, False, True]).reset_index(drop=True)
    exp["rank"] = exp.groupby("g").cumcount() + 1
    for nblocks in (1, 4, 16):
        got = (
            grouped_topk(
                ray.data.from_pandas(df).repartition(nblocks),
                group_col="g",
                order_cols=["v", "id"],
                descending=[True, False],
                k=5,
            )
            .to_pandas()
            .sort_values(["g", "v", "id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["g", "v", "id", "rank"]], exp[["g", "v", "id", "rank"]]
        )


def test_corpus_filter_rule_chain(ray_session):
    """Each rule fires on a purpose-built doc; first-failing-rule order is
    pinned (duplicate > pii > lang > short > repetition > quality)."""
    import pyarrow as pa
    import ray.data

    from engine.stages.filter_pipeline import corpus_filter

    good = (
        "the quick brown fox jumps over the lazy dog while many other animals "
        "watch from the forest and some birds fly across the open sky in the "
        "morning light with a gentle wind that carries leaves along the quiet "
        "river path today"
    )
    pii3 = good + " a@b.com c@d.com e@f.gov"
    # all-stopword filler: passes the lang gate, ~99.6% repeated tokens
    rep = "the and " * 125 + "fox"
    # 40 DISTINCT digit tokens + stopwords: no word repeats (repetition
    # passes), alpha ratio far below the gate, enough stopword evidence
    nonalpha = (
        " ".join(str(1000000000 + i) for i in range(40))
        + " the is and of to on in at"
    )
    docs = [
        (1, good),            # kept
        (2, good),            # duplicate of 1 (min id wins)
        (3, pii3),            # pii (>2 matches)
        (4, "zzz qqq xxx " * 40),  # lang: no stopwords -> unknown
        (5, "the cat sat on the mat and it was good there then"),  # short
        (6, rep),             # repetition (dup_word_ppm ~ 97%)
        (7, nonalpha),        # quality (alpha_ppm < 76%) if lang passes
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([x for _, x in docs], pa.string()),
        }
    )
    got = (
        corpus_filter(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("doc_id")["status"]
        .to_dict()
    )
    assert got[1] == "kept", got
    assert got[2] == "duplicate", got
    assert got[3] == "pii", got
    assert got[4] == "lang", got
    assert got[5] == "short", got
    assert got[6] == "repetition", got
    assert got[7] == "quality", got


def test_incremental_reindex_matches_full(ray_session):
    """Incremental re-index == full reprocess bit-for-bit, on BOTH the
    broadcast path and the forced union+groupby fallback; exactly
    added+changed docs are re-processed."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from engine.pipelines.queries import _index_process
    from engine.stages.diff import incremental_reindex

    n = 200
    v1 = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i} body text alpha beta" for i in range(n)], pa.string()),
        }
    )
    # v2: %13 removed, %7 changed, 20 added
    ids2, txt2 = [], []
    for i in range(n):
        if i % 13 == 0:
            continue
        ids2.append(i)
        txt2.append(
            f"doc {i} body text alpha beta" + (" CHANGED" if i % 7 == 0 else "")
        )
    for i in range(n, n + 20):
        ids2.append(i)
        txt2.append(f"brand new doc {i}")
    v2 = pa.table(
        {"doc_id": pa.array(ids2, pa.int64()), "text": pa.array(txt2, pa.string())}
    )
    n_changed = sum(1 for i in ids2 if i < n and i % 7 == 0)
    n_added = 20

    old_state = (
        ray.data.from_arrow(v1)
        .repartition(4)
        .map_batches(_index_process, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    full = (
        ray.data.from_arrow(v2)
        .map_batches(_index_process, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for gate in (5_000_000, 0):  # broadcast path, then forced fallback
        res, n_re, n_keep = incremental_reindex(
            old_state,
            ray.data.from_arrow(v2).repartition(4),
            key_col="doc_id",
            content_col="text",
            process_fn=_index_process,
            state_h_col="h",
            broadcast_max=gate,
        )
        got = res.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[full.columns.tolist()], full)
        assert n_re == n_changed + n_added, (gate, n_re)
        assert n_keep == len(ids2) - n_re, (gate, n_keep)


def test_export_shards_roundtrip(ray_session, tmp_path):
    """Sharded export: manifest totals match the input, shard routing is
    the cross-engine md5 gate, files are internally id-sorted, and a
    re-run replaces (never appends) the output."""
    from hashlib import md5 as _md5

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from engine.stages.export import export_shards

    n = 400
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        }
    )
    out = str(tmp_path / "shards")
    for _run in range(2):  # second run must replace, not append
        man = (
            export_shards(
                ray.data.from_arrow(t).repartition(4),
                id_col="doc_id",
                out_dir=out,
                n_shards=8,
            )
            .to_pandas()
            .sort_values("shard")
            .reset_index(drop=True)
        )
        assert man["n_rows"].sum() == n, man
        # oracle manifest from the raw ids
        exp = {}
        for i in range(n):
            hx = _md5(str(i).encode()).hexdigest()
            s = int(hx[:8], 16) % 8
            c, h = exp.get(s, (0, 0))
            exp[s] = (c + 1, h + int(hx[8:16], 16))
        for row in man.itertuples(index=False):
            assert exp[row.shard] == (row.n_rows, row.sum_idh), row
    # within-shard parquet files are id-sorted and contain only their shard
    import glob

    seen = 0
    for d in sorted(glob.glob(out + "/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        ids = []
        for f in sorted(glob.glob(d + "/*.parquet")):
            fids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
            assert fids == sorted(fids), f  # each file internally id-sorted
            ids.extend(fids)
        assert all(
            int(_md5(str(i).encode()).hexdigest()[:8], 16) % 8 == shard for i in ids
        )
        seen += len(ids)
    assert seen == n


def test_chunk_docs_windows(ray_session):
    """Chunk boundaries, overlap, tail handling, and zero-token docs."""
    import pyarrow as pa
    import ray.data

    from engine.stages.text import chunk_docs

    toks = [f"t{i}" for i in range(10)]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([" ".join(toks), "one  two", "   "], pa.string()),
        }
    )
    got = (
        chunk_docs(ray.data.from_arrow(t), seq_len=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    d1 = got[got.doc_id == 1]
    # stride 3: starts 0,3,6 — chunk 2 reaches the end, so no redundant
    # 1-token tail chunk 't9' (it is entirely contained in chunk 2)
    assert d1["start_tok"].tolist() == [0, 3, 6]
    assert d1["chunk_text"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    assert d1["n_tok"].tolist() == [4, 4, 4]
    d2 = got[got.doc_id == 2]
    assert d2["chunk_text"].tolist() == ["one two"]  # ws-normalized join
    assert (got.doc_id == 3).sum() == 0  # zero-token doc -> zero chunks


def test_shuffle_corpus_permutation_invariant_to_partitioning(ray_session):
    """shuffle_corpus: pos is a 0..n-1 permutation, identical whatever the
    input partitioning (the determinism random_shuffle lacks), keyed only
    by (seed, id); a different seed is a different permutation."""
    import ray.data
    from hashlib import md5 as _md5

    from engine.stages.sample import shuffle_corpus

    ids = list(range(97))
    one_block = ray.data.from_items([{"doc_id": i} for i in ids])
    many_blocks = one_block.repartition(7)

    a = shuffle_corpus(one_block, seed=42).to_pandas().sort_values("doc_id")
    b = shuffle_corpus(many_blocks, seed=42).to_pandas().sort_values("doc_id")
    assert a["pos"].tolist() == b["pos"].tolist()
    assert sorted(a["pos"]) == ids  # exact permutation, no gaps/dupes

    # matches the definition directly: rank of md5("42:{id}")
    exp_order = sorted(ids, key=lambda i: (_md5(f"42:{i}".encode()).hexdigest(), i))
    exp_pos = {i: p for p, i in enumerate(exp_order)}
    assert a.set_index("doc_id")["pos"].to_dict() == exp_pos

    c = shuffle_corpus(one_block, seed=7).to_pandas().sort_values("doc_id")
    assert c["pos"].tolist() != a["pos"].tolist()


def test_stage_operators_survive_empty_corpus(ray_session):
    """Every composable text operator takes an EMPTY typed corpus to a
    typed empty result — zero-row blocks bypass map_batches and lose their
    schema, which has produced real crashes (minhash band groupby,
    export read-back, bm25 stats collect)."""
    import ray.data

    from engine.stages import clean, dedup, index_build, pack, sample, search

    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert dedup.exact_dedup(empty).count() == 0
    assert dedup.minhash_lsh_pairs(empty).count() == 0
    assert clean.line_dedup(empty).count() == 0
    assert clean.span_dedup(empty).count() == 0
    assert pack.pack_sequences(empty).count() == 0
    assert sample.shuffle_corpus(empty).count() == 0
    assert index_build.term_stats(empty).count() == 0
    assert index_build.tfidf_topk(empty).count() == 0
    bm = search.bm25_topk(empty, ["hello", "world"], k=5)
    assert bm.num_rows == 0 and bm.column_names == ["rank", "doc_id"]
    # round-5 ops: empty corpora through the new pipelines
    assert clean.ngram_novelty(empty).count() == 0
    assert clean.normalize_text(empty).count() == 0
    assert dedup.tfidf_pairs(empty).count() == 0
    assert dedup.containment_pairs(empty).count() == 0
    assert dedup.minhash_incremental(empty, empty).count() == 0
    from engine.stages.classifier import quality_classifier
    assert quality_classifier(empty.map_batches(
        lambda t: t.append_column("lang", pa.array([], pa.string())),
        batch_format="pyarrow", zero_copy_batch=True,
    )).count() == 0
    from engine.stages.export import export_warc_shards
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        empty_pages = ray.data.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
        }))
        assert export_warc_shards(empty_pages, out_dir=td).count() == 0


def test_dsir_matches_math_oracle(ray_session):
    """DSIR importance weights == a single-process math oracle (hashed
    unigram+bigram buckets, add-one log-ratio, bucket-asc left-to-right
    accumulation), partition-invariant, and English docs outscore German
    ones when English is the target."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.stages.dsir import _bucket_ids, _grams, dsir_weights

    docs = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog ate the cat and the mat", "en"),
        (3, "der hund frisst die katze", "de"),
        (4, "", "en"),  # empty: (0, 0)
        (5, "die katze sitzt auf der matte", "de"),
        (6, "the cat and the dog sat", "en"),
    ]
    B = 64
    t = pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": pa.array([x for _, x, _ in docs], pa.string()),
        "lang": pa.array([l for _, _, l in docs], pa.string()),
    })

    ct = np.zeros(B, dtype=np.int64)
    cr = np.zeros(B, dtype=np.int64)
    for _, txt, lang in docs:
        b = _bucket_ids(_grams(txt), B)
        if b.size:
            cr += np.bincount(b, minlength=B)
            if lang == "en":
                ct += np.bincount(b, minlength=B)
    nt, nr = int(ct.sum()), int(cr.sum())
    lam = [
        math.log((int(ct[b]) + 1) / (nt + B))
        - math.log((int(cr[b]) + 1) / (nr + B))
        for b in range(B)
    ]

    def oracle(txt):
        grams = _grams(txt)
        uniq, cnts = np.unique(_bucket_ids(grams, B), return_counts=True)
        acc = 0.0
        for bb, c in zip(uniq.tolist(), cnts.tolist()):
            acc += c * lam[bb]
        return len(grams), math.floor(1e9 * acc)

    ds = ray.data.from_arrow(t).repartition(3)
    target = ds.filter(expr="lang == 'en'")
    got = (
        dsir_weights(ds, target, n_buckets=B)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["doc_id", "n_grams", "w_nanonat"]
    txt_by_id = {d: x for d, x, _ in docs}
    for _, r in got.iterrows():
        ng, w = oracle(txt_by_id[r["doc_id"]])
        assert (r["n_grams"], r["w_nanonat"]) == (ng, w), r["doc_id"]
    by_id = got.set_index("doc_id")["w_nanonat"]
    assert by_id[4] == 0  # empty doc scores exactly 0
    # every English doc outscores every German doc under the en target
    assert min(by_id[1], by_id[2], by_id[6]) > max(by_id[3], by_id[5])

    # partition-invariance: 1 block vs 3 blocks, bit-identical
    got1 = (
        dsir_weights(ray.data.from_arrow(t), target, n_buckets=B)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(got1)


def test_resolve_redirects_paths_and_cycles(ray_session):
    """Redirect resolution: driver and distributed pointer-doubling paths
    are bit-identical on chains, trees, duplicate out-edges, and cycles;
    cycle members and nodes behind them flag (-1, -1)."""
    import pyarrow as pa
    import ray.data

    from engine.stages.redirects import resolve_redirects

    #  10 -> 11 -> 12 -> 13 (terminal); 20 -> 12 (joins the chain);
    #  30 -> 31 -> 30 (cycle); 40 -> 30 (behind the cycle);
    #  50 has duplicate out-edges (52 and 51) -> canonical min 51
    #  (terminal); 52 leaves the node universe with the dropped edge
    edges = [
        (10, 11), (11, 12), (12, 13), (20, 12),
        (30, 31), (31, 30), (40, 30),
        (50, 52), (50, 51),
    ]
    t = pa.table({
        "src": pa.array([s for s, _ in edges], pa.int64()),
        "dst": pa.array([d for _, d in edges], pa.int64()),
    })
    expect = {
        10: (13, 3), 11: (13, 2), 12: (13, 1), 13: (13, 0), 20: (13, 2),
        30: (-1, -1), 31: (-1, -1), 40: (-1, -1),
        50: (51, 1), 51: (51, 0),
    }
    for force_distributed in (False, True):
        got = (
            resolve_redirects(
                ray.data.from_arrow(t).repartition(3),
                driver_max_edges=0 if force_distributed else 2_000_000,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert list(got.columns) == ["node", "final", "hops"]
        assert {
            int(r["node"]): (int(r["final"]), int(r["hops"]))
            for _, r in got.iterrows()
        } == expect, f"distributed={force_distributed}"

    # empty edge set -> typed empty result
    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
    }))
    assert resolve_redirects(empty).count() == 0


def test_source_kl_drift_semantics(ray_session):
    """Per-source KL divergence: a source matching the corpus-wide token
    mix scores near zero, a skewed source scores strictly higher; the
    integer fixed-point sum is partition-invariant; empty corpus -> typed
    empty."""
    import pyarrow as pa
    import ray.data

    from engine.stages.lm import source_kl

    rows = []
    # balanced: two sources with the same token distribution
    for i in range(10):
        rows.append((i, "alpha beta gamma delta", "bal_a"))
        rows.append((100 + i, "alpha beta gamma delta", "bal_b"))
    # skewed: one source of tokens rare in the rest of the corpus
    for i in range(10):
        rows.append((200 + i, "zeta zeta zeta eta", "skew"))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    got = (
        source_kl(ray.data.from_arrow(t).repartition(4))
        .to_pandas()
        .set_index("source")
    )
    assert list(got.columns) == ["n_tokens", "kl_nanonat"]
    assert got.loc["bal_a", "n_tokens"] == 40
    assert got.loc["skew", "n_tokens"] == 40
    # skew's exclusive tokens give KL = ln(3) nats (its mass is 1/3 of the
    # corpus); balanced sources see only the dilution term ln(3/2)
    assert got.loc["skew", "kl_nanonat"] > 2 * got.loc["bal_a", "kl_nanonat"]
    assert abs(got.loc["skew", "kl_nanonat"] - 1_098_612_288) < 10
    assert got.loc["bal_a", "kl_nanonat"] == got.loc["bal_b", "kl_nanonat"]

    got1 = source_kl(ray.data.from_arrow(t)).to_pandas().set_index("source")
    assert got.equals(got1)  # partition-invariant, bit-for-bit

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
    }))
    assert source_kl(empty).count() == 0


def test_bloom_filter_new_no_false_negatives(ray_session):
    """Bloom incremental dedup: every text present in the seen corpus is
    dropped (no false negatives, the Bloom guarantee); the false-positive
    drop rate on genuinely-new texts stays within the analytic bound; the
    result is deterministic across partitionings."""
    import pyarrow as pa
    import ray.data

    from engine.stages.sketch import bloom_filter_new

    seen_texts = [f"seen document number {i} body" for i in range(2000)]
    new_texts = [f"fresh document number {i} body" for i in range(2000)]
    seen = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(2000), pa.int64()),
        "text": pa.array(seen_texts, pa.string()),
    })).repartition(4)
    # incoming wave: half re-crawled (seen), half fresh
    inc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4000), pa.int64()),
        "text": pa.array(seen_texts + new_texts, pa.string()),
    })).repartition(5)

    m_bits, k = 1 << 16, 4  # deliberately small so FPs are observable
    kept = bloom_filter_new(inc, seen, m_bits=m_bits, k=k).to_pandas()
    kept_ids = set(kept["doc_id"])
    assert not (kept_ids & set(range(2000))), "a seen doc survived the filter"
    # FP bound: (1 - e^{-kn/m})^k for n=2000, m=2^16, k=4 -> ~0.0003;
    # allow 10x slack
    import math
    fp_bound = (1 - math.exp(-k * 2000 / m_bits)) ** k
    n_new_kept = len(kept_ids & set(range(2000, 4000)))
    assert 2000 - n_new_kept <= max(10, 10 * fp_bound * 2000), (
        f"dropped {2000 - n_new_kept} fresh docs (bound {fp_bound:.5f})"
    )

    kept1 = bloom_filter_new(
        inc.repartition(1), seen.repartition(1), m_bits=m_bits, k=k
    ).to_pandas()
    assert sorted(kept1["doc_id"]) == sorted(kept["doc_id"])


def test_source_overlap_bitmask_exact(ray_session):
    """All-pairs slice Jaccard via the bitmask device == hand-computed
    set arithmetic; pair order is lexicographic; degenerate slice counts
    behave (one slice -> empty, >63 slices -> explicit refusal)."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from engine.stages.clean import source_overlap

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d",      # s1 {a,b,c,d}
            "c d e",        # s2 {c,d,e}
            "x y",          # s3 {x,y}
            "d e",          # s2 again (dup tokens collapse)
        ], pa.string()),
        "source": pa.array(["s1", "s2", "s3", "s2"], pa.string()),
    })
    got = (
        source_overlap(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index(["src_a", "src_b"])
    )
    # s1={a,b,c,d} s2={c,d,e} s3={x,y}
    assert got.loc[("s1", "s2")].tolist() == [2, 5, 400000]
    assert got.loc[("s1", "s3")].tolist() == [0, 6, 0]
    assert got.loc[("s2", "s3")].tolist() == [0, 5, 0]
    assert len(got) == 3

    one = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a"], pa.string()),
        "source": pa.array(["only"], pa.string()),
    }))
    assert source_overlap(one).count() == 0

    wide = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(64), pa.int64()),
        "text": pa.array(["tok"] * 64, pa.string()),
        "source": pa.array([f"g{i:02d}" for i in range(64)], pa.string()),
    }))
    with _pytest.raises(NotImplementedError):
        source_overlap(wide)


def test_suffix_array_prefix_doubling(ray_session):
    """Distributed prefix-doubling suffix array == a single-process
    sorted-suffix oracle: prefix rule (shorter suffix first), cross-doc
    EQUAL suffixes share a dense rank, empty docs contribute nothing,
    and the result is partition-invariant (exercises the cross-block
    dense-rank boundary exchange)."""
    import pyarrow as pa
    import ray.data

    from engine.stages.suffix import suffix_array
    from engine.stages.text import _TOKEN

    docs = [
        (1, "b a n a n a"),
        (2, "a n a"),          # suffixes tie with doc 1's tail
        (3, ""),               # no positions
        (4, "b a n a n a"),    # exact duplicate: every suffix ties
        (5, "z z y"),
    ]
    sufs = []
    for d, txt in docs:
        toks = _TOKEN.findall(txt)
        for p in range(len(toks)):
            sufs.append((tuple(toks[p:]), d, p))
    rank_of = {s: i for i, s in enumerate(sorted({s for s, _, _ in sufs}))}
    expect = {(d, p): rank_of[s] for s, d, p in sufs}

    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    for parts in (1, 4):
        df = suffix_array(ray.data.from_arrow(t).repartition(parts)).to_pandas()
        got = {
            (int(a), int(b)): int(c)
            for a, b, c in zip(df["doc_id"], df["pos"], df["rank"])
        }
        assert got == expect, f"parts={parts}"
    # equal-suffix tie pinned explicitly: doc1 and doc4 identical
    assert expect[(1, 0)] == got[(4, 0)] and got[(1, 0)] == got[(4, 0)]

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert suffix_array(empty).count() == 0


def test_dup_spans_exact_windows(ray_session):
    """Sparse-table duplicated-window detection == literal window-string
    counting, including a non-power-of-two span length (exercises the
    (r_g(i), r_g(i+L-g)) overlap combine) and cross-document duplicates."""
    from collections import Counter as _Counter

    import pyarrow as pa
    import ray.data

    from engine.stages.suffix import dup_spans
    from engine.stages.text import _TOKEN

    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "said the quick brown fox jumps over the lazy dog"),  # shares a long run
        (3, "completely different words here with no overlap at all"),
        (4, ""),
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    for L in (3, 5):  # 5 is not a power of two: g=4, shift=1
        grams = _Counter()
        per_pos = {}
        for d, txt in docs:
            toks = _TOKEN.findall(txt)
            for p in range(len(toks) - L + 1):
                gram = tuple(toks[p : p + L])
                grams[gram] += 1
                per_pos[(d, p)] = gram
        expect = {k: grams[v] for k, v in per_pos.items()}
        df = dup_spans(
            ray.data.from_arrow(t).repartition(3), span_len=L
        ).to_pandas()
        got = {
            (int(a), int(b)): int(c)
            for a, b, c in zip(df["doc_id"], df["pos"], df["n_occ"])
        }
        assert got == expect, f"L={L}"
        assert max(expect.values()) == 2  # the shared run is detected


@pytest.mark.parametrize(
    "gate", [100_000, 0], ids=["driver-path", "distributed-path"]
)
def test_lcp_adjacent_matches_literal_oracle(ray_session, gate):
    """Sparse-table LCP over the suffix order == a literal
    compare-adjacent-suffixes oracle, covering the truncation-overshoot
    clamp (equal full suffixes), cross-doc ties, the global first row,
    and a single-suffix corpus — on BOTH the gated driver fast path and
    the distributed doubling path (gate=0 forces it)."""
    import pyarrow as pa
    import ray.data

    from engine.stages.suffix import lcp_adjacent
    from engine.stages.text import _TOKEN

    docs = [
        (1, "b a n a n a"),
        (2, "a n a"),          # suffix 'a n a' EQUALS doc1 pos3 (clamp path)
        (3, ""),
        (4, "b a n a n a"),    # full duplicate: every suffix ties
        (5, "z z y a n"),
        (6, "n a n a b"),
    ]
    sufs = []
    for d, txt in docs:
        toks = _TOKEN.findall(txt)
        for p in range(len(toks)):
            sufs.append((tuple(toks[p:]), d, p))
    sufs.sort()
    expect = {}
    for i, (s, d, p) in enumerate(sufs):
        if i == 0:
            expect[(d, p)] = 0
        else:
            prev = sufs[i - 1][0]
            n = 0
            while n < min(len(s), len(prev)) and s[n] == prev[n]:
                n += 1
            expect[(d, p)] = n

    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    df = lcp_adjacent(
        ray.data.from_arrow(t).repartition(3), driver_max_positions=gate
    ).to_pandas()
    got = {
        (int(a), int(b)): int(c)
        for a, b, c in zip(df["doc_id"], df["pos"], df["lcp"])
    }
    assert got == expect
    # the duplicate doc pair produces a full-length lcp somewhere
    assert max(got.values()) == 6

    one = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array(["solo"], pa.string()),
    }))
    assert lcp_adjacent(
        one, driver_max_positions=gate
    ).to_pandas().values.tolist() == [[9, 0, 0]]

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    }))
    assert lcp_adjacent(empty, driver_max_positions=gate).count() == 0


def test_bigram_nll_conditional_semantics(ray_session):
    """Bigram NLL: deterministic transitions score 0 (p(w2|w1)=1),
    unpredictable transitions score higher, < 2-token docs get (0, 0),
    and the integer sum is partition-invariant."""
    import pyarrow as pa
    import ray.data

    from engine.stages.lm import bigram_nll

    docs = [
        (1, "a b a b a b a b"),   # only transitions a->b, b->a
        (2, "a b a b a b a b"),
        (3, "a c b d a e b f"),   # a and b fan out -> uncertain
        (4, "x"),                 # no pairs
        (5, ""),
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([x for _, x in docs], pa.string()),
    })
    got = (
        bigram_nll(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.columns) == ["n_pairs", "nll2_sum_nanonat"]
    assert got.loc[4].tolist() == [0, 0]
    assert got.loc[5].tolist() == [0, 0]
    assert got.loc[1, "n_pairs"] == 7
    # doc 3 makes a->b fan out, so docs 1/2 pay a small positive cost;
    # doc 3's rare transitions cost far more per pair
    assert 0 < got.loc[1, "nll2_sum_nanonat"] < got.loc[3, "nll2_sum_nanonat"]
    assert got.loc[1, "nll2_sum_nanonat"] == got.loc[2, "nll2_sum_nanonat"]

    got1 = (
        bigram_nll(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.equals(got1)


def test_split_corpus_disjoint_exhaustive_deterministic(ray_session):
    """split_corpus assigns every row exactly one split, is
    partitioning-independent, independent of the sampling gate's salt,
    and tracks the requested fractions within hash noise."""
    import pyarrow as pa
    import ray.data

    from engine.stages.sample import split_corpus

    n = 3000
    t = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    got1 = (
        split_corpus(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got8 = (
        split_corpus(ray.data.from_arrow(t).repartition(8))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got1.equals(got8)
    assert len(got1) == n  # exhaustive: every row assigned exactly once
    by = got1.groupby("split").size().to_dict()
    assert set(by) == {"train", "val", "test"}
    assert abs(by["train"] - 2700) < 90 and abs(by["val"] - 150) < 60, by
    # the split gate is salted independently of deterministic_sample's
    # default gate: sampling at 90% does not reproduce the train split
    from engine.stages.sample import deterministic_sample

    samp = set(
        deterministic_sample(ray.data.from_arrow(t), rate_pct=90)
        .to_pandas()["doc_id"]
    )
    train = set(got1[got1["split"] == "train"]["doc_id"])
    assert samp != train

    import pytest

    with pytest.raises(ValueError):
        split_corpus(ray.data.from_arrow(t), splits=(("a", 50), ("b", 40)))


def test_pmi_pairs_semantics_and_partition_invariance(ray_session):
    """pmi_pairs ranks a perfectly-bound pair above an independent pair,
    applies min_count, and is block-layout independent."""
    import math

    import pyarrow as pa
    import ray.data

    from engine.stages.lm import pmi_pairs

    # 'alpha beta' always bound (always adjacent); 'the' promiscuous.
    docs = ["alpha beta the x the y", "alpha beta the z the w",
            "alpha beta the q the r"]
    t = pa.table({"text": pa.array(docs * 4, pa.string())})
    got1 = (
        pmi_pairs(ray.data.from_arrow(t), min_count=2, top_k=10)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    got8 = (
        pmi_pairs(ray.data.from_arrow(t).repartition(8), min_count=2, top_k=10)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert got1.equals(got8)
    top = (got1.iloc[0]["w1"], got1.iloc[0]["w2"])
    assert top == ("alpha", "beta")
    # every surviving pair meets min_count
    assert (got1["pair_count"] >= 2).all()
    # score check against the closed form on the top pair:
    # c12('alpha','beta')=12, c1('alpha')=12, c2('beta')=12, N = 12*5 pairs
    n_bigrams = 12 * 5
    want = math.floor(1e9 * math.log((n_bigrams * 12) / (12 * 12)))
    assert int(got1.iloc[0]["pmi_nano"]) == want


def test_stupid_backoff_all_levels_and_partition_invariance(ray_session):
    """stupid_backoff_nll matches a single-process oracle on a corpus
    engineered so every branch fires — seen trigram, bigram backoff,
    unigram backoff, AND unseen-w3 OOV floor — zero-trigram scored docs
    appear as (0, 0), and the result is block-layout independent."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from engine.stages.lm import stupid_backoff_nll
    from engine.stages.text import _TOKEN

    docs = {
        0: "a b c a b c a b d",          # train
        2: "x y z q r s",                # train
        1: "z b c k k c",                # score: bi (z,b,c), uni (k,k,c)
        3: "q r s novel",                # score: tri(q,r,s), OOV 'novel'
        5: "hi there",                   # score: < 3 tokens -> (0, 0)
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )

    # single-process oracle
    train: Counter = Counter()
    for d, txt in docs.items():
        if d % 2 == 0:
            toks = _TOKEN.findall(txt)
            for g in zip(toks, toks[1:], toks[2:]):
                train[g] += 1
    c12, c23, c2, c3 = Counter(), Counter(), Counter(), Counter()
    for (a, b, c), n in train.items():
        c12[(a, b)] += n; c23[(b, c)] += n; c2[b] += n; c3[c] += n
    n_tri = sum(train.values())
    want = {}
    for d, txt in docs.items():
        if d % 2 == 0:
            continue
        toks = _TOKEN.findall(txt)
        tf: Counter = Counter(zip(toks, toks[1:], toks[2:]))
        acc = 0
        for (a, b, c), f in tf.items():
            if train[(a, b, c)]:
                acc += math.floor(
                    (-1e9 * f) * math.log(train[(a, b, c)] / c12[(a, b)])
                )
            elif c23[(b, c)]:
                acc += math.floor(
                    (-1e9 * f) * math.log(0.4 * c23[(b, c)] / c2[b])
                )
            else:
                acc += math.floor(
                    (-1e9 * f) * math.log(0.4 * 0.4 * max(c3[c], 1) / n_tri)
                )
        want[d] = (sum(tf.values()), acc)

    for nparts in (1, 4):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = (
            stupid_backoff_nll(ds, n_buckets=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(got["doc_id"]) == [1, 3, 5]
        for _, r in got.iterrows():
            assert (int(r["n_tri"]), int(r["sb_nll_nanonat"])) == want[int(r["doc_id"])]
    # sanity: the engineered corpus really exercises every branch
    toks1 = _TOKEN.findall(docs[1]); toks3 = _TOKEN.findall(docs[3])
    tris = list(zip(toks1, toks1[1:], toks1[2:])) + list(
        zip(toks3, toks3[1:], toks3[2:])
    )
    lvls = set()
    for g in tris:
        if train[g]:
            lvls.add("tri")
        elif c23[(g[1], g[2])]:
            lvls.add("bi")
        elif c3[g[2]]:
            lvls.add("uni")
        else:
            lvls.add("oov")
    assert lvls == {"tri", "bi", "uni", "oov"}


@pytest.mark.parametrize("gate", [2_000_000, 0], ids=["driver", "distributed"])
def test_hits_matches_numpy_oracle(ray_session, gate):
    """Both HITS paths (gated driver numpy, distributed join rounds) ==
    a single-process numpy oracle with identical L2 normalization, on a
    graph with in-only and out-only nodes and a duplicate edge."""
    import math

    import ray.data

    from engine.stages.graph import hits

    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (0, 1), (4, 5)]
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    got = (
        hits(ray.data.from_arrow(t).repartition(3), iters=8,
             driver_max_edges=gate)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    nodes = sorted({x for e in E for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    h = np.full(N, 1.0 / math.sqrt(N))
    for _ in range(8):
        a = np.zeros(N)
        for s, d in E:
            a[idx[d]] += h[idx[s]]
        a /= np.sqrt((a * a).sum()) or 1.0
        h = np.zeros(N)
        for s, d in E:
            h[idx[s]] += a[idx[d]]
        h /= np.sqrt((h * h).sum()) or 1.0
    assert got["node"].tolist() == nodes
    assert np.allclose(got["hub"].to_numpy(), h, atol=1e-9)
    assert np.allclose(got["authority"].to_numpy(), a, atol=1e-9)
    # structure sanity: winners agree with the oracle (the duplicate
    # 0->1 edge makes node 1 the top authority), node 0 the strongest
    # hub; sink 5 has zero hub score
    assert got.loc[got["authority"].idxmax(), "node"] == nodes[int(np.argmax(a))]
    assert got.loc[got["hub"].idxmax(), "node"] == 0
    assert got.loc[got["node"] == 5, "hub"].iloc[0] == 0.0


def test_compress_ratio_exact(ray_session):
    """compress_ratio == a direct zlib call per doc; empty docs score
    (0, 0); repetitive text compresses below random-ish text; block
    layout does not matter (stateless map)."""
    import zlib

    import pyarrow as pa
    import ray.data

    from engine.stages.text import compress_ratio

    docs = ["spam " * 200, "the quick brown fox jumps over the lazy dog", "",
            "9f8e7d6c5b4a" * 3]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    got = (
        ray.data.from_arrow(t).repartition(3)
        .map_batches(compress_ratio, batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, txt in enumerate(docs):
        raw = txt.encode("utf-8")
        want = (1_000_000 * len(zlib.compress(raw, 6))) // len(raw) if raw else 0
        assert int(got.loc[i, "zlib_ratio_ppm"]) == want
        assert int(got.loc[i, "n_bytes"]) == len(raw)
    assert got.loc[0, "zlib_ratio_ppm"] < got.loc[1, "zlib_ratio_ppm"]


def test_dedup_keep_best_argmax_policy(ray_session):
    """dedup_keep_best keeps the max-score row per content hash with
    min-id tie-break, independent of block layout (the per-block argmax
    combiner forwards one candidate per hash)."""
    import pyarrow as pa
    import ray.data

    from engine.stages.dedup import dedup_keep_best

    rows = [
        (1, "same text", 10, "en"),
        (2, "same text", 30, "de"),   # winner: max score
        (3, "same text", 30, "fr"),   # loses tie to id 2
        (4, "other", 5, "en"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    for nparts in (1, 4):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = (
            dedup_keep_best(ds, score_col="n_chars", carry_cols=("lang",))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [2, 4]
        assert got.loc[0, "lang"] == "de"


def test_anchor_terms_matches_oracle(ray_session):
    """anchor_terms == a single-process oracle built from the SAME parse
    helpers (the conformance rule for extraction semantics): relative
    hrefs resolve against the page url, every anchor occurrence counts,
    non-canonicalizable targets drop, ranking is (count desc, token asc),
    and block layout does not matter."""
    from collections import Counter
    from urllib.parse import urljoin

    import pyarrow as pa
    import ray.data

    from engine.canonicalize import canonicalize_url
    from engine.html_extract import HTMLTree, get_anchors
    from engine.stages.anchors import anchor_terms
    from engine.stages.text import _TOKEN

    pages = {
        "http://a.com/": (
            '<html><body><a href="http://b.com/x">great data engine</a>'
            '<a href="/self">home page</a>'
            '<a href="http://b.com/x">great engine</a>'
            '<a href="mailto:x@y.z">mail me</a>'
            '<a href="">empty</a></body></html>'
        ),
        "http://c.com/": (
            '<html><body><a href="http://b.com/x">fast engine</a>'
            '<a href="http://a.com/self">another home</a></body></html>'
        ),
    }
    t = pa.table(
        {
            "url": pa.array(list(pages), pa.string()),
            "warc_ts": pa.array([None, None], pa.timestamp("us")),
            "html": pa.array([v.encode() for v in pages.values()], pa.binary()),
            "text": pa.array([None, None], pa.string()),
            "lang": pa.array([None, None], pa.string()),
        }
    )

    cnt = Counter()
    for page_url, html in pages.items():
        tree = HTMLTree.parse(html)
        for href, text in get_anchors(tree):
            target = canonicalize_url(urljoin(page_url, href))
            if target is None:
                continue
            for tok in _TOKEN.findall(text):
                cnt[(target, tok)] += 1
    want = {}
    by_url = {}
    for (u, tok), n in cnt.items():
        by_url.setdefault(u, []).append((-n, tok))
    for u, items in by_url.items():
        for r, (negn, tok) in enumerate(sorted(items)[:5], start=1):
            want[(u, tok)] = (-negn, r)

    for nparts in (1, 3):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = anchor_terms(ds, k=5).to_pandas()
        assert len(got) == len(want)
        for _, r in got.iterrows():
            assert want[(r["url"], r["token"])] == (
                int(r["anchor_count"]), int(r["term_rank"])
            ), (r["url"], r["token"])
    # the duplicate-anchor target counts 'engine' twice from a.com + once
    # from c.com
    assert want[("http://b.com/x", "engine")][0] == 3
    # mailto target never appears
    assert not any(u.startswith("mailto") for (u, _) in want)


def test_weighted_sample_bias_and_partition_invariance(ray_session):
    """weighted_sample is block-layout independent and actually
    weight-biased: rows with 100x the weight are drawn far above their
    population share (A-ES keys u^(1/w))."""
    import pyarrow as pa
    import ray.data

    from engine.stages.sample import weighted_sample

    n = 2000
    w = [100 if i < 100 else 1 for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "n_chars": pa.array(w, pa.int64()),
        }
    )
    kw = dict(id_col="doc_id", weight_col="n_chars", k=200)
    got1 = (
        weighted_sample(ray.data.from_arrow(t), **kw)
        .to_pandas().sort_values("sample_rank").reset_index(drop=True)
    )
    got8 = (
        weighted_sample(ray.data.from_arrow(t).repartition(8), **kw)
        .to_pandas().sort_values("sample_rank").reset_index(drop=True)
    )
    assert got1.equals(got8)
    assert len(got1) == 200
    heavy = int((got1["doc_id"] < 100).sum())
    # heavy rows are 5% of the population but ~100x weighted: under
    # uniform sampling E[heavy]=10; weighted they dominate (>60 of 200)
    assert heavy > 60, heavy
    # determinism: rerun identical
    again = (
        weighted_sample(ray.data.from_arrow(t), **kw)
        .to_pandas().sort_values("sample_rank").reset_index(drop=True)
    )
    assert got1.equals(again)


def test_cluster_topics_matches_oracle(ray_session):
    """cluster_topics == a single-process oracle that reuses the engine's
    own (deterministic, seeded) centroids and replays featurize + assign
    + count + top-k in plain Python, at two partitionings; topical
    corpora separate."""
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from engine.stages.ann import train_centroids
    from engine.stages.cluster import (
        _hash_vector,
        cluster_topics,
        hashed_tf_vectors,
    )
    from engine.stages.text import _TOKEN

    cooking = ["stir the sauce then bake the bread", "bake sauce pans daily",
               "bread sauce stir fry"]
    racing = ["fast cars race the track", "track cars pit crew race",
              "race track lap speed"]
    docs = (cooking * 5) + (racing * 5)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    dim, k = 64, 4
    base = ray.data.from_arrow(t)
    cent = train_centroids(
        hashed_tf_vectors(base, dim=dim), 4, lloyd_iters=2
    )

    cnt: Counter = Counter()
    import numpy as np

    for txt in docs:
        toks = _TOKEN.findall(txt)
        v = _hash_vector(toks, dim)
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        a = int(np.argmax(v @ cent.T))
        for tok in toks:
            cnt[(a, tok)] += 1
    by_cluster = {}
    for (a, tok), n in cnt.items():
        by_cluster.setdefault(a, []).append((-n, tok))
    want = {}
    for a, items in by_cluster.items():
        for r, (negn, tok) in enumerate(sorted(items)[:k], start=1):
            want[(a, tok)] = (-negn, r)

    for nparts in (1, 4):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = cluster_topics(
            ds, n_clusters=4, dim=dim, top_k=k
        ).to_pandas()
        assert len(got) == len(want)
        for _, r in got.iterrows():
            assert want[(int(r["cluster_id"]), r["token"])] == (
                int(r["term_count"]), int(r["term_rank"])
            )
    # topical separation: 'sauce' and 'race' label different clusters
    sauce = {a for (a, tok) in want if tok == "sauce"}
    race = {a for (a, tok) in want if tok == "race"}
    assert sauce and race and sauce.isdisjoint(race)


def test_degree_stats_mutual_and_self_loops(ray_session):
    """degree_stats: reciprocity counts mutual pairs once per endpoint,
    self-loops count for in/out degree but never for mutual_deg, and the
    result is block-layout independent."""
    import pyarrow as pa
    import ray.data

    from engine.stages.graph import degree_stats

    E = [(1, 2), (2, 1), (1, 3), (3, 3), (4, 1)]
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    for nparts in (1, 3):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = (
            degree_stats(ds).to_pandas()
            .sort_values("node").reset_index(drop=True)
        )
        rows = {
            int(r["node"]): (int(r["out_deg"]), int(r["in_deg"]),
                             int(r["mutual_deg"]))
            for _, r in got.iterrows()
        }
        assert rows == {
            1: (2, 2, 1),   # 1<->2 mutual
            2: (1, 1, 1),
            3: (1, 2, 0),   # self-loop 3->3 counts degrees, not mutual
            4: (1, 0, 0),
        }


def test_triangle_counts_known_graph(ray_session):
    """triangle_counts on a hand-checked graph: K4 minus one edge has two
    triangles sharing an edge; direction of input edges is irrelevant;
    degree ties orient consistently; block layout does not matter."""
    import pyarrow as pa
    import ray.data

    from engine.stages.graph import triangle_counts

    # K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    # Node 5-6 pendant edge: no triangles.  Mixed edge directions.
    E = [(1, 2), (3, 1), (2, 3), (1, 4), (4, 2), (5, 6)]
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    want = {1: 2, 2: 2, 3: 1, 4: 1, 5: 0, 6: 0}
    for nparts in (1, 3):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = triangle_counts(ds, n_buckets=4).to_pandas()
        assert {int(r["node"]): int(r["tri_cnt"]) for _, r in got.iterrows()} == want


def test_cms_counts_bounds_and_exactness(ray_session):
    """Count-Min estimates are >= the true counts always (one-sided
    error), exactly equal when the width dwarfs the vocabulary, within
    the (e/width)*N analytic bound, and partitioning-independent."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from engine.stages.sketch import cms_counts
    from engine.stages.text import _TOKEN

    docs = ["the cat sat on the mat"] * 7 + ["dogs chase the red ball"] * 3
    truth: Counter = Counter()
    for d in docs:
        truth.update(_TOKEN.findall(d))
    terms = ["the", "cat", "ball", "unseen"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    n_total = sum(truth.values())
    for nparts in (1, 4):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = cms_counts(ds, terms, width=2048, depth=4).to_pandas()
        est = dict(zip(got["token"], got["cms_count"]))
        for tok in terms:
            assert est[tok] >= truth[tok]
            assert est[tok] <= truth[tok] + math.e / 2048 * n_total + 1
        # width 2048 >> 11 distinct tokens: collision-free, so exact
        assert est == {tok: truth[tok] for tok in terms}
    # tiny width forces collisions: still an overestimate, never under
    got = cms_counts(ray.data.from_arrow(t), terms, width=4, depth=2).to_pandas()
    for tok, e_ in zip(got["token"], got["cms_count"]):
        assert e_ >= truth[tok]


def test_tfidf_pairs_matches_oracle(ray_session):
    """tfidf_pairs == a single-process oracle building the same capped
    tf-idf vectors and scoring every pair exactly: same pair set, cosine
    within float-reassociation tolerance, near-dup docs found, unrelated
    docs absent; block layout does not matter; the posting cap drops a
    ubiquitous term without losing the pair that shares a rare term."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from engine.stages.dedup import tfidf_pairs
    from engine.stages.text import _TOKEN

    docs = {
        0: "quantum flux capacitor runs the reactor",
        1: "quantum flux capacitor powers the reactor",   # near-dup of 0
        2: "recipe for sourdough bread and butter",
        3: "sourdough bread recipe with butter and salt",  # near-dup of 2
        4: "the annual report of unrelated finance topics",
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    # vocab_size below the distinct-token count so the cap is actually
    # exercised; term_stats caps by (cf desc, token asc) — mirror that
    vocab_size, top_m, thr = 12, 8, 0.3

    n_docs = len(docs)
    df: Counter = Counter()
    cf: Counter = Counter()
    toks = {d: _TOKEN.findall(txt) for d, txt in docs.items()}
    for d, ts in toks.items():
        df.update(set(ts))
        cf.update(ts)
    assert len(cf) > vocab_size  # the cap is live
    vocab = {
        tok: df[tok]
        for tok, _ in sorted(cf.items(), key=lambda x: (-x[1], x[0]))[:vocab_size]
    }
    vecs = {}
    for d, ts in toks.items():
        cnt = Counter(tok for tok in ts if tok in vocab)
        scored = sorted(
            ((c * math.log(n_docs / df[tok]), tok) for tok, c in cnt.items()),
            key=lambda x: (-x[0], x[1]),
        )[:top_m]
        norm = math.sqrt(sum(w * w for w, _ in scored))
        if norm > 0:
            vecs[d] = {tok: w / norm for w, tok in scored}
    want = {}
    ids = sorted(vecs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            cos = sum(
                w * vecs[b][tok] for tok, w in vecs[a].items() if tok in vecs[b]
            )
            if cos >= thr:
                want[(a, b)] = cos

    for nparts in (1, 3):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = tfidf_pairs(
            ds, vocab_size=vocab_size, top_m=top_m, threshold=thr, n_buckets=4
        ).to_pandas()
        pairs = {
            (int(r["doc_a"]), int(r["doc_b"])): int(r["cos_ppm"])
            for _, r in got.iterrows()
        }
        assert set(pairs) == set(want)
        for k, ppm in pairs.items():
            assert abs(ppm - math.floor(1e6 * want[k])) <= 1
    assert (0, 1) in want and (2, 3) in want
    assert not any(4 in k for k in want)

    # posting cap: vocab term count for a cap-exceeding posting is dropped,
    # pairs sharing only that term vanish, others survive
    got_capped = tfidf_pairs(
        ray.data.from_arrow(t), vocab_size=vocab_size, top_m=top_m,
        threshold=0.0, max_posting=2, n_buckets=4,
    ).to_pandas()
    capped_pairs = {
        (int(r["doc_a"]), int(r["doc_b"])) for _, r in got_capped.iterrows()
    }
    assert (0, 1) in capped_pairs  # rare shared terms have small postings


def test_stupid_backoff_empty_model(ray_session):
    """No training doc has >= 3 tokens: scores are defined (0 nanonats,
    matching the oracle's NULL-ln coalesce), not a ZeroDivisionError."""
    import pyarrow as pa
    import ray.data

    from engine.stages.lm import stupid_backoff_nll

    t = pa.table(
        {
            "doc_id": pa.array([0, 2, 1], pa.int64()),
            "text": pa.array(["hi there", "ok", "a b c d"], pa.string()),
        }
    )
    got = (
        stupid_backoff_nll(ray.data.from_arrow(t), n_buckets=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1]
    assert int(got.loc[0, "n_tri"]) == 2  # 4 tokens -> 2 trigrams
    assert int(got.loc[0, "sb_nll_nanonat"]) == 0


def test_log_odds_distinctive_terms(ray_session):
    """log_odds surfaces A-distinctive tokens at the head, shared tokens
    near zero, and swapping the groups negates every z (the Fightin'
    Words symmetry); block layout does not matter."""
    import pyarrow as pa
    import ray.data

    from engine.stages.lm import log_odds

    a_docs = ["stir sauce bake bread shared"] * 6
    b_docs = ["race track lap speed shared"] * 6
    rows = [(i, t, "en") for i, t in enumerate(a_docs)] + [
        (100 + i, t, "de") for i, t in enumerate(b_docs)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    kw = dict(group_a="en", group_b="de", top_k=20, n_buckets=4)
    got1 = (
        log_odds(ray.data.from_arrow(t), **kw)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    got4 = (
        log_odds(ray.data.from_arrow(t).repartition(4), **kw)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert got1.equals(got4)
    z = dict(zip(got1["token"], got1["z_nano"]))
    assert set(got1.head(4)["token"]) == {"stir", "sauce", "bake", "bread"}
    assert abs(z["shared"]) < min(z[tok] for tok in ("stir", "sauce"))
    # symmetry: swapping groups negates z for every token
    swapped = (
        log_odds(ray.data.from_arrow(t), group_a="de", group_b="en",
                 top_k=20, n_buckets=4)
        .to_pandas()
    )
    zs = dict(zip(swapped["token"], swapped["z_nano"]))
    for tok, val in z.items():
        # floor() of the negated double: -z or -z-1
        assert zs[tok] in (-val, -val - 1)


def test_textrank_keywords_hub_graph(ray_session):
    """TextRank surfaces the co-occurrence hub: a token adjacent to every
    other token outranks the spokes; output tokens resolve back from the
    hash ids correctly; block layout does not matter."""
    import pyarrow as pa
    import ray.data

    from engine.stages.graph import textrank_keywords

    # 'data' co-occurs with everything (hub); spokes only with 'data'
    docs = [f"data {w}" for w in
            ["cats", "dogs", "fish", "birds", "mice", "ants"]] * 3
    t = pa.table({"text": pa.array(docs, pa.string())})
    for nparts in (1, 3):
        ds = ray.data.from_arrow(t)
        if nparts > 1:
            ds = ds.repartition(nparts)
        got = (
            textrank_keywords(ds, window=2, top_k=5, iters=8)
            .to_pandas().sort_values("kw_rank").reset_index(drop=True)
        )
        assert got.iloc[0]["token"] == "data"
        assert len(got) == 5
        assert got["rank_ppb"].is_monotonic_decreasing


def test_containment_pairs_matches_set_oracle(ray_session):
    """containment_pairs == a single-process oracle computing exact
    n-gram-set containment with the same df cap: a small doc fully
    embedded in a larger one scores 1.0 (the asymmetric case Jaccard
    dilutes), a boilerplate gram above max_df is excluded from the
    intersection on BOTH sides, unrelated docs emit no pair, and the
    block layout does not matter."""
    import pyarrow as pa
    import ray.data

    from engine.stages.clean import _word_ngrams
    from engine.stages.dedup import containment_pairs

    boiler = "copyright footer text"
    docs = {
        0: "alpha beta gamma delta epsilon zeta",
        # doc 0's token stream is a verbatim PREFIX -> every gram of 0 in 1
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lam mu nu xi omicron pi rho sigma tau " + boiler,
        2: "one two three four five six seven " + boiler,
        3: "five six seven eight nine ten eleven " + boiler,
        4: "totally unrelated content about nothing shared " + boiler,
    }
    n, max_df, min_ppm = 3, 3, 100_000

    grams = {d: _word_ngrams(txt, n) for d, txt in docs.items()}
    df: dict = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    # the boilerplate grams really are over the cap
    assert any(c > max_df for c in df.values())
    kept = {d: {g for g in gs if 2 <= df[g] <= max_df} for d, gs in grams.items()}
    expect = {}
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(kept[a] & kept[b])
            if inter == 0:
                continue
            ppm = inter * 1_000_000 // min(len(grams[a]), len(grams[b]))
            if ppm >= min_ppm:
                expect[(a, b)] = (inter, len(grams[a]), len(grams[b]), ppm)

    # doc 0 subset of doc 1 must survive at full containment
    assert expect[(0, 1)][3] == 1_000_000

    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    for n_blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(n_blocks)
        got = containment_pairs(
            ds, n=n, min_ppm=min_ppm, max_df=max_df
        ).to_pandas()
        got_map = {
            (int(r.id_a), int(r.id_b)): (
                int(r.inter_grams), int(r.n_a), int(r.n_b),
                int(r.containment_ppm),
            )
            for r in got.itertuples()
        }
        assert got_map == expect
    # the unrelated doc appears in no pair
    assert not any(4 in k for k in expect)


def test_winnow_overlap_pairs_matches_set_oracle(ray_session):
    """winnow_overlap_pairs == a single-process oracle building the same
    window-min fingerprint sets: a verbatim shared passage (>= window
    consecutive tokens) surfaces the pair, disjoint docs don't, a short
    doc (< window tokens) contributes its single min hash, and the block
    layout does not matter."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from engine.stages.dedup import winnow_overlap_pairs
    from engine.stages.text import _TOKEN, fnv1a_batch

    passage = ("the quick brown fox jumps over the lazy dog near "
               "the riverbank at dawn every single day")
    docs = {
        0: "intro words here " + passage + " closing remarks",
        1: "completely different opening " + passage + " and another tail",
        2: "unrelated text about cooking pasta with garlic and olive oil",
        3: "short doc",                      # < window tokens: single min
        4: "short doc",                      # identical -> same single min
    }
    window, max_df = 8, 128

    def fps(txt):
        toks = _TOKEN.findall(txt)
        th = fnv1a_batch([t.encode() for t in toks])
        if len(th) == 0:
            return np.asarray([], dtype=np.uint64)
        if len(th) >= window:
            return np.unique(
                np.lib.stride_tricks.sliding_window_view(th, window).min(axis=1)
            )
        return np.asarray([th.min()], dtype=np.uint64)

    sets = {d: fps(txt) for d, txt in docs.items()}
    from collections import Counter
    df = Counter()
    for s in sets.values():
        df.update(int(x) for x in s)
    kept = {
        d: {int(x) for x in s if 2 <= df[int(x)] <= max_df}
        for d, s in sets.items()
    }

    def oracle(min_shared):
        expect = {}
        ids = sorted(docs)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                shared = len(kept[a] & kept[b])
                if shared >= min_shared:
                    ppm = shared * 1_000_000 // min(len(sets[a]), len(sets[b]))
                    expect[(a, b)] = (shared, len(sets[a]), len(sets[b]), ppm)
        return expect

    # the passage-sharing pair is found at threshold 1 (consecutive sliding
    # windows reuse a min, so a 17-token shared passage yields only ~2
    # DISTINCT shared fingerprints); the unrelated doc pairs with no one
    assert (0, 1) in oracle(1)
    assert not any(2 in k for k in oracle(1))

    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    for min_shared in (1, 3):
        expect = oracle(min_shared)
        for n_blocks in (1, 3):
            ds = ray.data.from_arrow(t).repartition(n_blocks)
            got = winnow_overlap_pairs(
                ds, window=window, min_shared=min_shared, max_df=max_df
            ).to_pandas()
            got_map = {
                (int(r.id_a), int(r.id_b)): (
                    int(r.shared_fps), int(r.n_a), int(r.n_b), int(r.overlap_ppm)
                )
                for r in got.itertuples()
            }
            assert got_map == expect, (min_shared, n_blocks)


def test_more_like_this_literal_oracle(ray_session):
    """MLT vs an independent single-process oracle on a literal corpus:
    Lucene-idf term selection (tf * lnidf desc, token asc), BM25 scoring
    over the selected terms, seed self-exclusion, (score desc, id asc)
    ranking — identical across block layouts."""
    import math
    import ray.data
    from collections import Counter

    from engine.stages.search import more_like_this

    docs = {
        0: "apple banana cherry apple durian",
        1: "apple banana banana fig",
        2: "cherry cherry durian grape",
        3: "banana fig grape apple cherry",
        4: "durian durian apple fig fig grape",
        5: "fig grape grape banana",
        6: "apple cherry fig durian banana grape",
        7: "grape banana apple apple",
    }
    seed_mod, n_seeds, n_terms, k, k1, b = 3, 2, 2, 3, 1.2, 0.75

    # independent oracle
    toks = {i: txt.split() for i, txt in docs.items()}
    N = len(docs)
    avgdl = sum(len(w) for w in toks.values()) / N
    vocab = sorted({w for ws in toks.values() for ws in [ws] for w in ws})
    df = {w: sum(1 for ws in toks.values() if w in ws) for w in vocab}
    lnidf = {w: math.log(1 + (N - df[w] + 0.5) / (df[w] + 0.5)) for w in vocab}
    seeds = sorted(i for i in docs if i % seed_mod == 0)[:n_seeds]
    expect = []
    for sid in seeds:
        cnt = Counter(toks[sid])
        sel = sorted(cnt, key=lambda w: (-cnt[w] * lnidf[w], w))[:n_terms]
        scored = []
        for d in docs:
            if d == sid:
                continue
            c = Counter(toks[d])
            s = 0.0
            for w in sorted(sel):
                tf = c[w]
                if tf:
                    s += (lnidf[w] * tf * (k1 + 1.0)) / (
                        tf + k1 * (1 - b + b * (len(toks[d]) / avgdl))
                    )
            if s > 0:
                scored.append((-s, d))
        scored.sort()
        for rank, (_, d) in enumerate(scored[:k], 1):
            expect.append((sid, rank, d))

    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    for n_blocks in (1, 4):
        got = more_like_this(
            ray.data.from_arrow(t).repartition(n_blocks),
            seed_mod=seed_mod,
            n_seeds=n_seeds,
            n_terms=n_terms,
            k=k,
        ).to_pandas()
        rows = [
            (int(r.seed_id), int(r.rank), int(r.doc_id)) for r in got.itertuples()
        ]
        assert rows == expect, n_blocks


def test_more_like_this_empty_corpus(ray_session):
    import ray.data
    from engine.stages.search import more_like_this

    t = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    got = more_like_this(ray.data.from_arrow(t))
    assert got.num_rows == 0
    assert got.column_names == ["seed_id", "rank", "doc_id"]


def test_quantized_topk_oracle_and_recall(ray_session):
    """quantized_topk == a single-process numpy replica of the SAME
    algorithm (scales -> int8 candidates by (iscore desc, id asc) ->
    exact rerank); recall@10 vs the exact baseline is high; and the
    output is invariant under repartitioning (integer candidate order)."""
    import numpy as np
    import ray.data

    from engine.stages.ann import _dim_scales, _normalize, _quantize, quantized_topk

    rs = np.random.RandomState(7)
    n, dim, nq, k = 400, 24, 5, 10
    vecs = rs.normal(size=(n, dim))
    ids = list(range(n))
    qm = rs.normal(size=(nq, dim))
    qids = list(range(100, 100 + nq))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )

    def run(n_blocks):
        ds = ray.data.from_arrow(tbl).repartition(n_blocks)
        return quantized_topk(ds, qids, qm, k=k, rerank_factor=4)

    got = run(4)

    # single-process replica
    vn = _normalize(vecs.astype(np.float64))
    qn = _normalize(qm.astype(np.float64))
    scales = np.abs(vn).max(axis=0)
    scales[scales == 0] = 1.0
    scales = scales / 127.0
    dq = _quantize(vn, scales)
    qq = _quantize(qn, scales)
    m = k * 4
    exp_rows = []
    for qi, qid in enumerate(qids):
        sc = (qq[qi].astype(np.int64) * dq.astype(np.int64)).sum(axis=1)
        order = sorted(range(n), key=lambda j: (-sc[j], ids[j]))[:m]
        rer = sorted(
            ((round(float(np.dot(qn[qi], vn[j])), 6), ids[j]) for j in order),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for r, (s, vid) in enumerate(rer, 1):
            exp_rows.append((qid, vid, s, r))
    got_rows = list(
        zip(
            got.column("query_id").to_pylist(),
            got.column("vec_id").to_pylist(),
            got.column("sim").to_pylist(),
            got.column("rank").to_pylist(),
        )
    )
    assert got_rows == exp_rows

    # partitioning invariance: same bytes at 1, 4 and 13 blocks
    assert run(1).equals(got) and run(13).equals(got)

    # recall@k vs the exact float baseline
    hits = 0
    for qi, qid in enumerate(qids):
        sims = vn @ qn[qi]
        exact = set(
            ids[j] for j in sorted(range(n), key=lambda j: (-sims[j], ids[j]))[:k]
        )
        mine = {vid for q, vid, _, _ in got_rows if q == qid}
        hits += len(exact & mine)
    recall = hits / (nq * k)
    assert recall >= 0.9, recall


def test_url_templates_literal(ray_session):
    """Digit folding + query strip collapse paginator/trap URLs onto one
    template; ties at the k boundary resolve by (n_urls desc, template)."""
    import ray.data

    from engine.stages.urlfilter import url_templates

    urls = (
        [f"https://a.com/page/{i}" for i in range(5)]
        + [f"https://b{j}.com/item?id={j}" for j in range(3)]
        + ["https://c.com/about", "ftp://d.com/files/2024/x"]
    )
    out = (
        url_templates(
            ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())})),
            k=3,
        )
        .to_pandas()
    )
    rows = list(zip(out["template"], out["n_urls"], out["n_hosts"]))
    assert rows == [
        ("https://a.com/page/N", 5, 1),
        ("https://bN.com/item", 3, 3),
        ("ftp://d.com/files/N/x", 1, 1),  # tie n=1 -> lexicographic
    ]


def test_pq_topk_invariance_and_recall(ray_session):
    """pq_topk is partitioning-invariant (fixed-order ADC float sums +
    total-order cuts) and recall@10 vs the exact baseline stays high at
    8 subvectors x 16 centroids on clustered data."""
    import numpy as np
    import ray.data

    from engine.stages.ann import _normalize, pq_topk

    rs = np.random.RandomState(11)
    # clustered corpus (PQ recall on pure noise is meaningless)
    centers = rs.normal(size=(10, 32)) * 3
    vecs = np.vstack([c + rs.normal(size=(40, 32)) for c in centers])
    n = len(vecs)
    ids = list(range(n))
    qm = centers[:5] + rs.normal(size=(5, 32)) * 0.1
    qids = list(range(500, 505))
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }
    )

    def run(n_blocks):
        return pq_topk(
            ray.data.from_arrow(tbl).repartition(n_blocks), qids, qm, k=10
        )

    got = run(4)
    assert got.column_names == ["query_id", "vec_id", "sim", "rank"]
    assert run(1).equals(got) and run(11).equals(got)

    vn = _normalize(vecs.astype(np.float64))
    qn = _normalize(qm.astype(np.float64))
    hits = 0
    got_rows = list(zip(got.column("query_id").to_pylist(), got.column("vec_id").to_pylist()))
    for qi, qid in enumerate(qids):
        sims = vn @ qn[qi]
        exact = set(ids[j] for j in sorted(range(n), key=lambda j: (-sims[j], ids[j]))[:10])
        mine = {vid for q, vid in got_rows if q == qid}
        assert len(mine) == 10
        hits += len(exact & mine)
    recall = hits / 50
    assert recall >= 0.8, recall


# ---------------------------------------------------------------------------
# search: phrase / snippet / facets
# ---------------------------------------------------------------------------


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_phrase_search_overlap_boundary_and_oracle(ray_session):
    """Overlapping counts, doc-boundary isolation, single-word phrase,
    null/short texts — against a per-row Python oracle."""
    from engine.stages.search import phrase_search

    rows = [
        (1, "a a a b"),          # "a a" overlaps: count 2, first_pos 1
        (2, "x a"),              # phrase would continue into doc 3: no
        (3, "a y a a"),          # count 1 at pos 3
        (4, None),               # null text
        (5, "a"),                # shorter than phrase
        (6, "b a a b a a"),      # count 2, first_pos 2
    ]
    got = (
        phrase_search(_docs_ds(rows), "a a")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def oracle(toks, words):
        hits = [
            i
            for i in range(len(toks) - len(words) + 1)
            if toks[i : i + len(words)] == words
        ]
        return (hits[0] + 1 if hits else 0, len(hits))

    exp = []
    for did, txt in rows:
        toks = (txt or "").split()
        fp, cnt = oracle(toks, ["a", "a"])
        if cnt:
            exp.append((did, fp, cnt))
    assert list(map(tuple, got.to_numpy())) == exp

    one = (
        phrase_search(_docs_ds(rows), "b")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, one.to_numpy())) == [(1, 4, 1), (6, 1, 2)]


def test_phrase_search_partition_invariant(ray_session):
    """Same result at 1 block and many blocks (no cross-block phrase)."""
    from engine.stages.search import phrase_search

    rows = [(i, "w p q " * (i % 4) + "p q") for i in range(40)]
    a = (
        phrase_search(_docs_ds(rows), "p q")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        phrase_search(_docs_ds(rows).repartition(13), "p q")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) == 40


def test_snippet_search_unicode_ties_and_window(ray_session):
    """Char (not byte) anchor positions on non-ASCII rows; query-order
    tie-break; window clamped at text start; AND semantics."""
    from engine.stages.search import snippet_search

    rows = [
        (1, "ßß foo bar"),        # ß = 2 bytes: byte pos of foo 5, CHAR pos 4
        (2, "foo bar"),           # tie at pos 1? no: foo at 1, bar at 5
        (3, "barfoo"),            # both present, bar first
        (4, "foo only"),          # AND fails
        (5, None),
        (6, "FOO BAR upper"),     # case-insensitive
    ]
    got = (
        snippet_search(_docs_ds(rows), ["foo", "bar"], before=2, width=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    recs = {int(r.doc_id): r for r in got.itertuples()}
    assert set(recs) == {1, 2, 3, 6}
    assert recs[1].anchor_term == "foo" and recs[1].anchor_pos == 4
    assert recs[1].snippet == "ß foo"[:5]
    assert recs[2].anchor_term == "foo" and recs[2].anchor_pos == 1
    assert recs[2].snippet == "foo b"
    assert recs[3].anchor_term == "bar" and recs[3].anchor_pos == 1
    assert recs[6].anchor_term == "foo" and recs[6].snippet == "foo b"

    # exact tie: both terms first occur at the same position -> query order
    tie = (
        snippet_search(_docs_ds([(9, "zz z")]), ["z", "zz"])
        .to_pandas()
    )
    assert tie["anchor_term"].tolist() == ["z"]


def test_search_facets_nulls_and_empty(ray_session):
    import ray.data

    from engine.stages.search import search_facets

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["hit x", "hit y", "miss", None], pa.string()),
            "lang": pa.array(["en", None, "de", "en"], pa.string()),
            "source": pa.array(["s0", "s0", "s1", "s0"], pa.string()),
        }
    )
    got = search_facets(ray.data.from_arrow(t), "HIT").to_pandas()
    got = got.sort_values(["facet", "value"], na_position="first").reset_index(
        drop=True
    )
    assert [tuple(r) for r in got.to_numpy()] == [
        ("lang", None, 1),
        ("lang", "en", 1),
        ("source", "s0", 2),
    ]
    none = search_facets(ray.data.from_arrow(t), "absent-term")
    assert none.num_rows == 0 and none.column_names == [
        "facet", "value", "doc_count",
    ]


def test_lev_batch_matches_python_dp():
    """Batched numpy Levenshtein vs a per-pair Python DP oracle, incl.
    unicode and empty strings."""
    import itertools

    from engine.stages.search import _lev_batch

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(cur[-1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    words = ["", "a", "ab", "table", "tabel", "tälbe", "ßoß", "batch",
             "tble", "ttable", "xyzzy"]
    for q in ["table", "", "ß", "tälbe", "bat"]:
        got = _lev_batch(words, q).tolist()
        exp = [lev(w, q) for w in words]
        assert got == exp, (q, got, exp)


def test_spell_suggest_ranking_and_gate(ray_session):
    """dist asc > cf desc > term asc; exact match first; length gate does
    not drop in-range candidates; empty corpus returns typed empty."""
    import ray.data

    from engine.stages.search import spell_suggest

    rows = [
        (1, "cat cat cat car bat bats cart scatter"),
        (2, "car car car cap cap zebra"),
    ]
    got = spell_suggest(_docs_ds(rows), "cat", k=4, max_dist=2)
    recs = [tuple(r) for r in got.to_pandas().to_numpy()]
    # cat dist0; dist1: car(4) cap(2) bat(1); cart dist1 cf1 ties bat? no:
    # bat is dist1 (sub), cart dist1 (ins); cf: car 4 > cap 2 > bat 1 = cart 1
    assert recs[0] == ("cat", 3, 0)
    assert recs[1] == ("car", 4, 1)
    assert recs[2] == ("cap", 2, 1)
    assert recs[3] in (("bat", 1, 1),)  # term asc beats cart

    empty = spell_suggest(
        ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
        ),
        "cat",
    )
    assert empty.num_rows == 0 and empty.column_names == ["term", "cf", "dist"]


def test_regex_search_nulls_and_partition_invariance(ray_session):
    from engine.stages.search import regex_search

    rows = [(1, "ab ab ab"), (2, None), (3, "zzz"), (4, "xabx")]
    got = (
        regex_search(_docs_ds(rows), "ab")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.to_numpy()] == [(1, 3), (4, 1)]
    many = (
        regex_search(_docs_ds(rows).repartition(7), "ab")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(many)


def test_emb_covariance_partition_invariant_and_exact(ray_session):
    """Integer moments identical at 1 vs 11 blocks and equal to a direct
    numpy computation on the full matrix."""
    import ray.data

    from engine.stages.linalg import emb_covariance

    rng = np.random.default_rng(7)
    X = rng.normal(0, 0.3, size=(97, 5)).astype(np.float32)
    t = pa.table(
        {"embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32()))}
    )
    a = emb_covariance(ray.data.from_arrow(t)).to_pandas()
    b = (
        emb_covariance(ray.data.from_arrow(t).repartition(11))
        .to_pandas()
    )
    assert a.equals(b)
    Q = np.floor(X.astype(np.float64) * 65536.0 + 0.5).astype(np.int64)
    S2 = Q.T @ Q
    s = Q.sum(axis=0)
    for r in a.itertuples():
        assert r.s2 == S2[r.i - 1, r.j - 1]
        assert r.si == s[r.i - 1] and r.sj == s[r.j - 1] and r.n == 97


def test_emb_pca_eigen_equation(ray_session):
    """Loadings satisfy C v = λ v on the exactly-reconstructed covariance;
    orthonormal; eigenvalues descending; sign pivot positive."""
    import ray.data

    from engine.stages.linalg import emb_pca

    rng = np.random.default_rng(11)
    # anisotropic: a dominant direction plus noise
    base = rng.normal(0, 1, size=(200, 1)) @ rng.normal(0, 1, size=(1, 6))
    X = (base + rng.normal(0, 0.1, size=(200, 6))).astype(np.float32)
    t = pa.table(
        {"embedding": pa.array([r.tolist() for r in X], pa.list_(pa.float32()))}
    )
    got = emb_pca(ray.data.from_arrow(t), n_components=3).to_pandas()
    Q = np.floor(X.astype(np.float64) * 65536.0 + 0.5)
    n = len(Q)
    C = (n * (Q.T @ Q) - np.outer(Q.sum(0), Q.sum(0))) / (n * (n - 1)) / 65536.0**2
    vs, lams = [], []
    for c in (1, 2, 3):
        sub = got[got.component == c].sort_values("i")
        v = sub["loading"].to_numpy()
        lam = sub["eigenvalue"].iloc[0]
        assert np.linalg.norm(C @ v - lam * v) < 1e-9
        assert abs(np.linalg.norm(v) - 1) < 1e-12
        piv = np.argmax(np.abs(v))
        assert v[piv] > 0
        vs.append(v)
        lams.append(lam)
    assert lams[0] >= lams[1] >= lams[2]
    assert abs(vs[0] @ vs[1]) < 1e-9 and abs(vs[1] @ vs[2]) < 1e-9

    # empty corpus: typed empty
    e = emb_pca(
        ray.data.from_arrow(
            pa.table({"embedding": pa.array([], pa.list_(pa.float32()))})
        )
    )
    assert e.num_rows == 0 and e.column_names == [
        "component", "i", "loading", "eigenvalue",
    ]


def test_readability_counts_and_fixedpoint(ray_session):
    """Counting rules vs a per-row re oracle; zero-word drop; punctuation
    floor; integer Flesch formula."""
    import re

    from engine.stages.text import readability

    rows = [
        (1, "The quick brown fox. It jumps! Over dogs?"),
        (2, "no punctuation here just words"),
        (3, "   "),              # zero words -> dropped
        (4, None),               # dropped
        (5, "xyz bcd fgh"),      # zero syllables
    ]
    got = (
        readability(_docs_ds(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [1, 2, 5]
    for r in got.itertuples():
        txt = dict(rows)[r.doc_id] or ""
        w = len(re.findall(r"[^\t\n\v\f\r ]+", txt))
        s = max(len(re.findall(r"[.!?]+", txt)), 1)
        syl = len(re.findall(r"[aeiouy]+", txt.lower()))
        assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, syl)
        assert r.flesch_milli == 206835 - (1015 * w) // s - (84600 * syl) // w


def test_prefix_suggest_ranking_and_empty(ray_session):
    import ray.data

    from engine.stages.search import prefix_suggest

    rows = [(1, "car cart cart cap cat dog"), (2, "car car dog dog")]
    got = prefix_suggest(_docs_ds(rows), "ca", k=3).to_pandas()
    # cap and cat tie at cf=1 -> term asc picks cap
    assert [tuple(r) for r in got.to_numpy()] == [
        ("car", 3), ("cart", 2), ("cap", 1),
    ]
    none = prefix_suggest(_docs_ds(rows), "zz")
    assert none.num_rows == 0 and none.column_names == ["term", "cf"]


def test_significant_terms_literal_and_empty_fg(ray_session):
    """Hand-computed fg/bg dfs and scores; zero-foreground returns typed
    empty; query term itself ranks first."""
    from engine.stages.search import significant_terms

    rows = [
        (1, "apple banana"),
        (2, "apple cherry"),
        (3, "banana cherry"),
        (4, "date"),
    ]
    got = significant_terms(_docs_ds(rows), "apple", k=10).to_pandas()
    # fg = docs 1,2 (n_fg=2), n_bg=4
    # apple: fg 2 bg 2 -> 2*4-2*2=4 ; banana: fg 1 bg 2 -> 0
    # cherry: fg 1 bg 2 -> 0 ; date: fg 0 -> dropped
    recs = {r.term: (r.fg_df, r.bg_df, r.score) for r in got.itertuples()}
    assert recs == {
        "apple": (2, 2, 4),
        "banana": (1, 2, 0),
        "cherry": (1, 2, 0),
    }
    assert got.term.iloc[0] == "apple"
    none = significant_terms(_docs_ds(rows), "absent", k=5)
    assert none.num_rows == 0 and none.column_names == [
        "term", "fg_df", "bg_df", "score",
    ]


def test_collapse_topk_per_group_and_invariance(ray_session):
    """One row per group, best by (tf desc, id asc); partition-invariant."""
    import ray.data

    from engine.stages.search import collapse_topk

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "text": pa.array(
                ["x x x", "x x x", "x", "y", "x x", None], pa.string()
            ),
            "source": pa.array(["a", "a", "b", "b", "c", "c"], pa.string()),
        }
    )
    got = collapse_topk(
        ray.data.from_arrow(t), "x", group_col="source", k=10
    ).to_pandas()
    # a: docs 1,2 tf 3 -> doc 1 wins by id; b: doc 3 tf 1; c: doc 5 tf 2
    assert [tuple(r) for r in got.to_numpy()] == [
        (1, "a", 1, 3), (2, "c", 5, 2), (3, "b", 3, 1),
    ]
    many = collapse_topk(
        ray.data.from_arrow(t).repartition(5), "x", group_col="source", k=10
    ).to_pandas()
    assert got.equals(many)


def test_percentile_ranks_literal_and_invariance(ray_session):
    import ray.data

    from engine.stages.quantiles import percentile_ranks

    t = pa.table({"n_chars": pa.array([10, 20, 30, 40, 50], pa.int64())})
    got = percentile_ranks(
        ray.data.from_arrow(t), [5, 20, 45, 100], col="n_chars"
    ).to_pandas()
    assert got.value.tolist() == [5.0, 20.0, 45.0, 100.0]
    assert got.cnt_le.tolist() == [0, 2, 4, 5]
    assert got.rank_ppm.tolist() == [0, 400000, 800000, 1000000]
    many = percentile_ranks(
        ray.data.from_arrow(t).repartition(4), [5, 20, 45, 100], col="n_chars"
    ).to_pandas()
    assert got.equals(many)


def test_encoding_anomalies_dirty_strings(ray_session):
    """U+FFFD and non-ws controls counted; \\t\\n\\v\\f\\r excluded; empty
    text dropped; ppm floor-exact."""
    from engine.stages.clean import encoding_anomalies

    rows = [
        (1, "clean text"),
        (2, "bad � byte �"),
        (3, "ctrl\x07and\x00del\x7f"),
        (4, "ws only \t\n\v\f\r fine"),
        (5, ""),
        (6, None),
    ]
    got = (
        encoding_anomalies(_docs_ds(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.index.tolist() == [1, 2, 3, 4]
    assert got.loc[1].tolist() == [10, 0, 0, 0]
    assert got.loc[2, "n_replacement"] == 2 and got.loc[2, "n_control"] == 0
    assert got.loc[2, "anomaly_ppm"] == (1_000_000 * 2) // len("bad � byte �")
    assert got.loc[3, "n_control"] == 3 and got.loc[3, "n_replacement"] == 0
    assert got.loc[4, "n_control"] == 0 and got.loc[4, "anomaly_ppm"] == 0


def test_phrase_from_index_matches_direct_scan(ray_session):
    """The positional-index phrase algorithm is pinned bit-identical to
    the direct-scan phrase_search on overlap, repeats, boundaries, and
    under repartitioning."""
    from engine.stages.index_build import phrase_from_index
    from engine.stages.search import phrase_search

    rows = [
        (1, "a a a b a a"),
        (2, "x a"),
        (3, "a y a a a"),
        (4, None),
        (5, "b a a b"),
        (6, "a"),
    ]
    for phrase in ("a a", "a a a", "b a", "a"):
        direct = (
            phrase_search(_docs_ds(rows), phrase)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        via_index = (
            phrase_from_index(_docs_ds(rows).repartition(4), phrase)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert direct.equals(via_index), phrase


def test_positional_postings_literal(ray_session):
    from engine.stages.index_build import positional_postings

    rows = [(7, "w v w w"), (8, "v v"), (9, "zzz")]
    got = positional_postings(_docs_ds(rows), ["w", "v"]).to_pandas()
    recs = {(r.token, r.doc_id): (r.tf, r.positions) for r in got.itertuples()}
    assert recs == {
        ("w", 7): (3, "1,3,4"),
        ("v", 7): (1, "2"),
        ("v", 8): (2, "1,2"),
    }
    # sorted (token, doc_id)
    assert got.token.tolist() == sorted(got.token.tolist())


def test_rescore_topk_window_contract(ray_session):
    """Phase-2 score can only reorder INSIDE the phase-1 window: a doc
    with huge tf2 but tf1 below the window cut is excluded (the ES
    rescore contract); partial per-block windows merge superset-safe."""
    from engine.stages.search import rescore_topk

    rows = [(i, "q " * (100 - i) + "r") for i in range(10)]          # tf1 desc
    rows.append((99, "q " + "r " * 500))                             # tf1=1, huge tf2
    got = rescore_topk(
        _docs_ds(rows), "q", "r", window=5, k=5, w1=1, w2=1
    ).to_pandas()
    # window = docs 0..4 (tf1 100..96); doc 99 (tf1=1) outside
    assert 99 not in set(got.doc_id)
    assert set(got.doc_id) == {0, 1, 2, 3, 4}
    # rescore with w2: each windowed doc has tf2=1, so order stays tf1
    assert got.doc_id.tolist() == [0, 1, 2, 3, 4]
    many = rescore_topk(
        _docs_ds(rows).repartition(6), "q", "r", window=5, k=5, w1=1, w2=1
    ).to_pandas()
    assert got.equals(many)


def test_fuzzy_search_rewrite_and_counts(ray_session):
    """Rewrite set = vocab within max_dist; counts are OCCURRENCES; best
    dist is the min present per doc; no-match docs absent."""
    from engine.stages.search import fuzzy_search

    rows = [
        (1, "cat cat cut dog"),   # cat d0 x2, cut d1 -> n=3 best=0
        (2, "cut cot"),           # both d1 -> n=2 best=1
        (3, "dog dog"),           # no match
        (4, None),
    ]
    got = (
        fuzzy_search(_docs_ds(rows), "cat", max_dist=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.to_numpy()] == [(1, 3, 0), (2, 2, 1)]
    many = (
        fuzzy_search(_docs_ds(rows).repartition(3), "cat", max_dist=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(many)


def test_bool_search_clauses(ray_session):
    from engine.stages.search import bool_search

    rows = [
        (1, "A B C"),      # case-insensitive must a, should b+c
        (2, "a x"),        # should misses min 2
        (3, "a b bad"),    # must_not
        (4, "b c"),        # must misses
        (5, None),
    ]
    got = (
        bool_search(
            _docs_ds(rows),
            must=["a"],
            should=["b", "c"],
            must_not=["bad"],
            min_should=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.to_numpy()] == [(1, 2)]
    # no should clauses: pure must/must_not filter, n_should = 0
    g2 = bool_search(_docs_ds(rows), must=["a"], must_not=["bad"]).to_pandas()
    assert sorted(g2.doc_id) == [1, 2]
    assert (g2.n_should == 0).all()


def test_image_phash_pairs_matches_bruteforce(ray_session):
    """Banded dHash pairs == brute-force all-pairs hamming <= 3 (the
    4x16 pigeonhole is lossless at that threshold); exact clones and a
    +1-uniform-brightness clone (order-preserving: hamming 0) found."""
    import ray.data

    from engine.stages.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_ppm,
        image_dhash,
        image_phash_pairs,
    )

    rs = np.random.RandomState(3)
    ids, payloads, mimes = [], [], []
    imgs = {}
    for i in range(12):
        w, h = int(rs.randint(16, 48)), int(rs.randint(16, 48))
        px = rs.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        imgs[f"i{i:02d}"] = px
        ids.append(f"i{i:02d}")
        payloads.append(encode_bmp(px))
        mimes.append("image/bmp")
    for i in (0, 3):
        imgs[f"c{i:02d}"] = imgs[f"i{i:02d}"]
        ids.append(f"c{i:02d}")
        payloads.append(encode_bmp(imgs[f"i{i:02d}"]))
        mimes.append("image/bmp")
    b = np.minimum(imgs["i05"].astype(np.int64) + 1, 255).astype(np.uint8)
    imgs["b05"] = b
    ids.append("b05")
    payloads.append(encode_ppm(b))
    mimes.append("image/x-portable-pixmap")
    t = pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )
    got = set(
        map(
            tuple,
            image_phash_pairs(ray.data.from_arrow(t).repartition(4))
            .to_pandas()
            .to_numpy(),
        )
    )
    hs = {k: image_dhash(v) for k, v in imgs.items()}
    ks = sorted(hs)
    exp = {
        (ks[i], ks[j], bin(hs[ks[i]] ^ hs[ks[j]]).count("1"))
        for i in range(len(ks))
        for j in range(i + 1, len(ks))
        if bin(hs[ks[i]] ^ hs[ks[j]]).count("1") <= 3
    }
    assert got == exp
    assert ("b05", "i05", 0) in got and ("c00", "i00", 0) in got


def test_image_dhash_properties():
    """Deterministic; invariant to uniform brightness shift (exact
    cross-multiplied comparisons); sensitive to content change; works on
    tiny images."""
    from engine.stages.multimodal import image_dhash

    rs = np.random.RandomState(9)
    px = rs.randint(0, 200, size=(33, 21, 3)).astype(np.uint8)
    h1 = image_dhash(px)
    assert h1 == image_dhash(px.copy())
    assert image_dhash((px + 10).astype(np.uint8)) == h1
    flipped = px.copy()
    flipped[:16, :10] = 255 - flipped[:16, :10]
    assert image_dhash(flipped) != h1
    tiny = rs.randint(0, 256, size=(3, 5, 3)).astype(np.uint8)
    assert 0 <= image_dhash(tiny) < (1 << 64)


def test_audio_phash_pairs_matches_bruteforce(ray_session):
    """Banded envelope-hash pairs == brute-force all-pairs hamming <= 3;
    exact clone and half-gain clone found; gain invariance exact for
    lossless scaling."""
    import ray.data

    from engine.stages.multimodal import (
        MEDIA_SCHEMA,
        audio_envelope_hash,
        audio_phash_pairs,
        encode_wav,
    )

    rs = np.random.RandomState(5)
    ids, payloads = [], []
    sigs = {}
    for i in range(10):
        s = (
            rs.standard_normal(int(rs.randint(500, 4000))) * 6000
        ).astype(np.int16)
        sigs[f"a{i:02d}"] = s
        ids.append(f"a{i:02d}")
        payloads.append(encode_wav(s, 16000))
    sigs["c00"] = sigs["a00"]
    ids.append("c00")
    payloads.append(encode_wav(sigs["a00"], 16000))
    t = pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(["audio"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * len(ids), pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )
    got = set(
        map(
            tuple,
            audio_phash_pairs(ray.data.from_arrow(t).repartition(3))
            .to_pandas()
            .to_numpy(),
        )
    )
    hs = {k: audio_envelope_hash(v) for k, v in sigs.items()}
    ks = sorted(hs)
    exp = {
        (ks[i], ks[j], bin(hs[ks[i]] ^ hs[ks[j]]).count("1"))
        for i in range(len(ks))
        for j in range(i + 1, len(ks))
        if bin(hs[ks[i]] ^ hs[ks[j]]).count("1") <= 3
    }
    assert got == exp and ("a00", "c00", 0) in got
    assert audio_envelope_hash(sigs["a05"].astype(np.int64) * 3) == (
        audio_envelope_hash(sigs["a05"])
    )


def test_index_size_est_varints_and_stitching(ray_session):
    """Multi-byte varint gaps and cross-block stitching: sparse large ids
    vs a per-token Python varint oracle, identical at 1 and 7 blocks."""
    from engine.stages.index_build import index_size_est

    def vb(v):
        v = max(v, 0)
        n = 1
        while v >= 128:
            v >>= 7
            n += 1
        return n

    rows = []
    ids_w, ids_v = [], []
    for i in range(60):
        did = i * (1 << (i % 3 * 7))  # gaps spanning 1-3 varint bytes
        txt = "w" if i % 2 else "w v"
        rows.append((did, txt))
        ids_w.append(did)
        if i % 2 == 0:
            ids_v.append(did)

    def oracle(ids):
        ids = sorted(ids)
        total = vb(ids[0])
        for a, b in zip(ids, ids[1:]):
            total += vb(b - a)
        return len(ids), total

    for nparts in (1, 7):
        got = (
            index_size_est(_docs_ds(rows).repartition(nparts), ["w", "v"])
            .to_pandas()
            .set_index("token")
        )
        for tok, ids in (("w", ids_w), ("v", ids_v)):
            df, bytes_ = oracle(ids)
            assert got.loc[tok, "df"] == df, (nparts, tok)
            assert got.loc[tok, "postings_bytes"] == bytes_, (nparts, tok)


def test_round5_ops_empty_corpus(ray_session):
    """Zero-row hardening for the round-5 session-5 operator batch: every
    new operator must return its TYPED empty output on an empty corpus
    (zero-row blocks bypass map_batches; empty materialized datasets lose
    schemas — CLAUDE.md)."""
    import ray.data

    from engine.stages.clean import encoding_anomalies
    from engine.stages.export import balanced_shards
    from engine.stages.index_build import (
        index_size_est,
        phrase_from_index,
        positional_postings,
    )
    from engine.stages.quantiles import percentile_ranks
    from engine.stages.search import (
        bool_search,
        collapse_topk,
        fuzzy_search,
        phrase_search,
        regex_search,
        rescore_topk,
        search_facets,
        significant_terms,
        snippet_search,
        spell_suggest,
        prefix_suggest,
    )
    from engine.stages.text import readability

    empty_docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    )

    def rows(x):
        import pyarrow as _pa

        if isinstance(x, _pa.Table):
            return x.num_rows
        return x.count()

    assert rows(phrase_search(empty_docs, "a b")) == 0
    assert rows(snippet_search(empty_docs, ["a"])) == 0
    assert rows(search_facets(empty_docs, "a", facets=("lang", "source"))) == 0
    assert rows(spell_suggest(empty_docs, "abc")) == 0
    assert rows(prefix_suggest(empty_docs, "a")) == 0
    assert rows(regex_search(empty_docs, "a+")) == 0
    assert rows(significant_terms(empty_docs, "a")) == 0
    assert rows(collapse_topk(empty_docs, "a")) == 0
    assert rows(rescore_topk(empty_docs, "a", "b")) == 0
    assert rows(fuzzy_search(empty_docs, "abc")) == 0
    assert rows(bool_search(empty_docs, must=["a"], should=["b"])) == 0
    assert rows(readability(empty_docs)) == 0
    assert rows(encoding_anomalies(empty_docs)) == 0
    assert rows(balanced_shards(empty_docs)) == 0
    assert rows(percentile_ranks(empty_docs, [1, 2], col="n_chars")) == 0
    assert rows(positional_postings(empty_docs, ["a"])) == 0
    assert rows(phrase_from_index(empty_docs, "a b")) == 0
    assert rows(index_size_est(empty_docs, ["a"])) == 0


def test_percolate_registry_and_empty(ray_session):
    from engine.stages.search import percolate

    rows = [(1, "Alpha beta"), (2, "beta gamma"), (3, None)]
    reg = [(10, ["alpha"], []), (20, ["beta"], ["gamma"]), (30, ["x"], [])]
    got = (
        percolate(_docs_ds(rows), reg)
        .to_pandas()
        .sort_values(["doc_id", "query_id"])
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.to_numpy()] == [(1, 10), (1, 20)]
    assert percolate(_docs_ds([]), reg).count() == 0


def test_query_dsl_dispatch(ray_session):
    """Every DSL clause routes to the verified operator and matches a
    direct call; unknown clauses rejected loudly."""
    import pytest

    from engine.stages import search as s
    from engine.stages.dsl import run_query_dsl

    rows = [(1, "alpha beta gamma"), (2, "beta beta"), (3, "delta")]
    ds = _docs_ds(rows)

    def pdf(x):
        return (
            x.to_pandas().sort_values("doc_id").reset_index(drop=True)
            if hasattr(x, "to_pandas")
            else x
        )

    assert pdf(run_query_dsl(_docs_ds(rows), {"phrase": "beta beta"})).equals(
        pdf(s.phrase_search(_docs_ds(rows), "beta beta"))
    )
    assert pdf(
        run_query_dsl(
            _docs_ds(rows),
            {"bool": {"must": ["beta"], "must_not": ["delta"]}},
        )
    ).equals(pdf(s.bool_search(_docs_ds(rows), must=["beta"], must_not=["delta"])))
    assert pdf(
        run_query_dsl(_docs_ds(rows), {"fuzzy": {"term": "bita"}})
    ).equals(pdf(s.fuzzy_search(_docs_ds(rows), "bita", max_dist=1)))
    assert pdf(run_query_dsl(_docs_ds(rows), {"regexp": "be+ta"})).equals(
        pdf(s.regex_search(_docs_ds(rows), "be+ta"))
    )
    assert pdf(
        run_query_dsl(_docs_ds(rows), {"match": {"terms": ["alpha", "beta"]}})
    ).equals(pdf(s.snippet_search(_docs_ds(rows), ["alpha", "beta"])))
    assert pdf(
        run_query_dsl(
            _docs_ds(rows),
            {"dis_max": {"queries": ["beta", "delta"],
                         "tie_breaker_milli": 300}},
        )
    ).equals(
        pdf(s.dis_max(_docs_ds(rows), ["beta", "delta"], tie_milli=300))
    )
    assert pdf(
        run_query_dsl(_docs_ds(rows), {"multi_match": {"term": "beta"}})
    ).equals(pdf(s.multi_match(_docs_ds(rows), "beta")))
    assert pdf(
        run_query_dsl(
            _docs_ds(rows), {"span_near": {"a": "alpha", "b": "gamma",
                                           "slop": 1}}
        )
    ).equals(pdf(s.span_near(_docs_ds(rows), "alpha", "gamma", slop=1)))
    assert pdf(
        run_query_dsl(_docs_ds(rows), {"phrase_prefix": "alpha b"})
    ).equals(pdf(s.phrase_search(_docs_ds(rows), "alpha b", last_prefix=True)))
    assert pdf(
        run_query_dsl(
            _docs_ds(rows),
            {"boosting": {"positive": ["beta"], "negative": ["delta"],
                          "negative_boost_milli": 200}},
        )
    ).equals(
        pdf(s.boosting_search(_docs_ds(rows), ["beta"], ["delta"],
                              neg_milli=200))
    )
    with pytest.raises(ValueError):
        run_query_dsl(ds, {"nope": 1})
    with pytest.raises(ValueError):
        run_query_dsl(ds, {"phrase": "a", "regexp": "b"})


def test_oov_rate_boundary_ties_and_empty(ray_session):
    """Vocab head ties at the size boundary break by term asc (both
    sides); zero-token docs drop; empty corpus typed-empty."""
    from engine.stages.text import oov_rate

    rows = [
        (1, "a a b b c"),   # cf: a2 b2 c1
        (2, "c d"),
        (3, "   "),
        (4, None),
    ]
    # vocab_size=2: cf ties a=2,b=2 -> both in; c,d out
    got = (
        oov_rate(_docs_ds(rows), vocab_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert [tuple(r) for r in got.to_numpy()] == [
        (1, 5, 1, 200000),
        (2, 2, 2, 1000000),
    ]
    # vocab_size=3 boundary tie between c(1) and d(1) -> c by term asc
    g3 = oov_rate(_docs_ds(rows), vocab_size=3).to_pandas().set_index("doc_id")
    assert g3.loc[2, "n_oov"] == 1
    assert oov_rate(_docs_ds([]), vocab_size=2).count() == 0


def test_plan_lsh_matches_shipped_constants():
    """The S-curve planner reproduces the shipped LSH banding at the
    default 0.5 threshold (constants can't silently drift from the math),
    is monotone in threshold (higher threshold -> more rows per band),
    and rejects bad thresholds."""
    import pytest

    from engine.stages.dedup import _LSH_BANDS, _N_PERM, _ROWS_PER_BAND, plan_lsh

    assert plan_lsh(_N_PERM, 0.5) == (_LSH_BANDS, _ROWS_PER_BAND)
    rows = [plan_lsh(64, th)[1] for th in (0.3, 0.5, 0.7, 0.9)]
    assert rows == sorted(rows) and rows[0] < rows[-1]
    b, r = plan_lsh(128, 0.5)
    assert b * r == 128
    with pytest.raises(ValueError):
        plan_lsh(64, 1.0)


def test_cdc_boundaries_match_sequential_oracle(ray_session):
    """Vectorized windowed gear hash == per-byte sequential formulation;
    min/max enforcement; edit locality (middle insert disturbs O(1)
    chunks); empty payload."""
    from engine.stages.cdc import _GEAR, _W, cdc_boundaries

    def oracle(data, mask_bits=8, min_size=64, max_size=1024):
        n = len(data)
        cand = []
        for i in range(n):
            h = 0
            for k in range(_W):
                if i - k < 0:
                    break
                h = (h + (int(_GEAR[data[i - k]]) << k)) % (1 << 64)
            if h & ((1 << mask_bits) - 1) == 0:
                cand.append(i + 1)
        ends, start = [], 0
        for c in cand:
            if c - start < min_size:
                continue
            while c - start > max_size:
                start += max_size
                ends.append(start)
            ends.append(c)
            start = c
        while n - start > max_size:
            start += max_size
            ends.append(start)
        if start < n:
            ends.append(n)
        return ends

    rng = np.random.RandomState(1)
    for _ in range(3):
        data = bytes(
            rng.randint(0, 256, size=rng.randint(0, 3000)).astype(np.uint8)
        )
        assert cdc_boundaries(data) == oracle(data)
    assert cdc_boundaries(b"") == []
    for ends, data in [(cdc_boundaries(b"x" * 5000), b"x" * 5000)]:
        sizes = np.diff([0] + ends)
        assert (sizes <= 1024).all() and ends[-1] == len(data)

    base = bytes(rng.randint(0, 256, size=5000).astype(np.uint8))
    edited = base[:2500] + b"XXXX" + base[2500:]

    def chunks(d):
        out, s = [], 0
        for e in cdc_boundaries(d):
            out.append(d[s:e])
            s = e
        return out

    assert len(set(chunks(base)) & set(chunks(edited))) >= len(chunks(base)) - 4


def test_cdc_chunk_stats_distributed_matches_driver(ray_session):
    from collections import Counter
    from hashlib import md5

    import ray.data

    from engine.stages.cdc import cdc_boundaries, cdc_chunk_stats

    base = "lorem ipsum dolor sit amet " * 40
    rows = [(i, base + f" unique tail {i} " * 10) for i in range(30)]
    got = cdc_chunk_stats(_docs_ds(rows).repartition(5)).to_pandas()
    c: Counter = Counter()
    sizes = {}
    for _, txt in rows:
        d = txt.encode()
        s = 0
        for e in cdc_boundaries(d):
            h = md5(d[s:e]).hexdigest()
            c[h] += 1
            sizes[h] = e - s
            s = e
    total = sum(sizes[h] * n for h, n in c.items())
    uniq = sum(sizes.values())
    exp = (
        sum(c.values()), len(c), total, uniq,
        ((total - uniq) * 1_000_000) // total,
    )
    assert tuple(got.iloc[0]) == exp
    assert got.iloc[0]["saved_ppm"] > 300_000


def test_search_after_and_multi_match_edges(ray_session):
    """Keyset pagination: page 1 (no cursor) + page 2 (cursor = page 1's
    last sort values) tile the corpus without overlap or gap; exhausted
    cursor and empty corpus return typed empties.  multi_match: the
    title/body split lands exactly at title_tokens; absent term is
    empty."""
    import ray.data

    from engine.stages.search import multi_match, search_after_page

    def docs(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([i for i, _ in rows], pa.int64()),
                    "text": pa.array([t for _, t in rows], pa.string()),
                }
            )
        )

    corpus = docs([(i, "w " * (5 + (i * 3) % 7) + f"tail{i}") for i in range(12)])
    p1 = search_after_page(corpus, size=5).to_pandas().sort_values("rank")
    cursor = (int(p1.iloc[-1]["n_tokens"]), int(p1.iloc[-1]["doc_id"]))
    p2 = search_after_page(corpus, after=cursor, size=5).to_pandas().sort_values("rank")
    p3 = search_after_page(
        corpus,
        after=(int(p2.iloc[-1]["n_tokens"]), int(p2.iloc[-1]["doc_id"])),
        size=5,
    ).to_pandas().sort_values("rank")
    seen = list(p1["doc_id"]) + list(p2["doc_id"]) + list(p3["doc_id"])
    assert len(seen) == 12 and sorted(seen) == list(range(12))
    # fully ordered across pages: (n_tokens desc, id asc)
    keys = [
        (-int(n), int(i))
        for n, i in zip(
            list(p1["n_tokens"]) + list(p2["n_tokens"]) + list(p3["n_tokens"]), seen
        )
    ]
    assert keys == sorted(keys)
    exhausted = search_after_page(corpus, after=(0, 10**9), size=5)
    assert exhausted.count() == 0

    empty = docs([])
    assert search_after_page(empty, size=3).count() == 0
    assert multi_match(empty, "x").count() == 0

    # doc 1: 'q' at positions 0 and 5 (title, title_tokens=6) and 6, 8 (body)
    mm = docs([(1, "q a b c d q q z q"), (2, "a b c")])
    got = multi_match(mm, "q", title_tokens=6, title_weight=3).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["tf_title"], r["tf_body"], r["score"]) == (2, 2, 8)
    assert multi_match(mm, "absent").count() == 0


def test_decay_topk_clamps_and_caps(ray_session):
    """Future events decay as age 0 (full weight); ancient events hit the
    62-half-life shift cap (weight 0); empty input is a typed empty."""
    import ray.data

    from engine.stages.topk import decay_topk

    us_day = 86_400_000_000
    anchor = 20_000
    rows = [
        (1, (anchor + 5) * us_day),    # future -> age 0 -> 1_000_000
        (1, (anchor - 7) * us_day),    # one half-life -> 500_000
        (2, (anchor - 14) * us_day),   # two -> 250_000
        (3, (anchor - 7 * 100) * us_day),  # capped -> 0
    ]
    t = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
        }
    )
    got = (
        decay_topk(
            ray.data.from_arrow(t), anchor_days=anchor, halflife_days=7, k=10
        )
        .to_pandas()
        .sort_values("rank")
    )
    assert list(got["user_id"]) == [1, 2, 3]
    assert list(got["score"]) == [1_500_000, 250_000, 0]
    empty = ray.data.from_arrow(t.slice(0, 0))
    assert decay_topk(empty, anchor_days=anchor).count() == 0


def test_zone_map_prune(ray_session):
    """Zone maps (zonemap.zone_map_prune): per-shard (count,min,max) zones
    plus the disjointness verdict for a half-open window, vs hand-computed
    zones; multi-block input exercises the partial+merge path; empty input
    returns the typed empty table."""
    import ray.data

    from engine.stages.zonemap import zone_map_prune

    t = pa.table(
        {
            "k": pa.array([0, 1, 2, 10, 11, 25], pa.int64()),
            "v": pa.array([5, 3, 9, 100, 120, 300], pa.int64()),
        }
    )
    got = zone_map_prune(
        ray.data.from_arrow(t).repartition(4),
        key_col="k",
        val_col="v",
        shard_size=10,
        lo=50,
        hi=200,
    ).to_pandas()
    assert got["shard"].tolist() == [0, 1, 2]
    assert got["n_rows"].tolist() == [3, 2, 1]
    assert got["vmin"].tolist() == [3, 100, 300]
    assert got["vmax"].tolist() == [9, 120, 300]
    # shard 0 entirely below lo, shard 2 entirely at/above hi -> skipped
    assert got["skipped"].tolist() == [True, False, True]

    empty = zone_map_prune(
        ray.data.from_arrow(t.slice(0, 0)),
        key_col="k",
        val_col="v",
        shard_size=10,
        lo=50,
        hi=200,
    ).to_pandas()
    assert len(empty) == 0
    assert list(empty.columns) == ["shard", "n_rows", "vmin", "vmax", "skipped"]


def test_shard_term_bloom(ray_session):
    """Per-shard term blooms (bloomindex.shard_term_bloom): the routing
    table has one row per (shard, probe); `actual` matches exact
    containment computed by a Python oracle; the bloom NEVER false-negates
    (actual implies maybe); multi-block input exercises the partial
    bitwise-OR merge; empty input returns the typed empty table."""
    import ray.data

    from engine.stages.bloomindex import shard_term_bloom
    from engine.stages.text import _TOKEN

    texts = [
        "merge sort is stable",
        "window functions scan rows",
        "the quick brown fox",
        "quantum leap over merge",
        "zebra stripes",
        "",
    ]
    ids = [0, 1, 49, 50, 99, 100]
    probes = ["merge", "scan", "window", "zebra", "quantum", "absent"]
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = shard_term_bloom(
        ray.data.from_arrow(t).repartition(3), probes, shard_size=50
    ).to_pandas()

    # oracle: exact containment per shard
    shard_toks: dict = {}
    for i, txt in zip(ids, texts):
        shard_toks.setdefault(i // 50, set()).update(_TOKEN.findall(txt))
    shards = sorted(shard_toks)
    assert got["shard"].tolist() == [s for s in shards for _ in probes]
    for _, row in got.iterrows():
        want = row["term"] in shard_toks[row["shard"]]
        assert row["actual"] == want
        if row["actual"]:
            assert row["maybe"], "bloom false negative"

    empty = shard_term_bloom(
        ray.data.from_arrow(t.slice(0, 0)), probes, shard_size=50
    ).to_pandas()
    assert len(empty) == 0
    assert list(empty.columns) == ["shard", "term", "maybe", "actual"]


def test_span_near_gaps_boundaries_and_empty(ray_session):
    """span_near: exact min gaps, either-order matching, doc-boundary
    isolation (a at end of one doc + b at start of the next must NOT
    pair), slop filtering, typed zero-row output."""
    import ray.data

    from engine.stages.search import span_near

    texts = [
        "value x table",            # gap 2
        "table value",              # gap 1 (reversed order counts)
        "value a b c d e table",    # gap 6 — beyond slop=3 window (4)
        "value only here",          # no b term
        "x y value",                # a at END of this doc ...
        "table z z",                # ... b at START of next: must not pair
        "",                         # empty doc
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        span_near(ray.data.from_arrow(t).repartition(2), "value", "table", slop=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1]
    assert got["min_gap"].tolist() == [2, 1]
    # widen the slop: doc 2's gap-6 pair appears
    wide = (
        span_near(ray.data.from_arrow(t), "value", "table", slop=5)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert wide["doc_id"].tolist() == [0, 1, 2]
    # no-match input exercises the typed-empty path (zero-row INPUT
    # blocks bypass map_batches entirely — CLAUDE.md)
    nomatch = span_near(
        ray.data.from_arrow(t), "value", "zebra_absent"
    ).to_pandas()
    assert len(nomatch) == 0  # (column names drop on zero-row Datasets
    # in to_pandas — known Ray block-less schema loss, CLAUDE.md)
    assert len(span_near(ray.data.from_arrow(t.slice(0, 0)), "value",
                         "table").to_pandas()) == 0


def test_reshard_moves_hrw_invariants(ray_session):
    """HRW rendezvous property: growing N -> N+1 moves ONLY docs whose
    winner is the new shard (every move targets shard N), the move rate
    is ~1/(N+1) not ~N/(N+1), and the per-batch partial + driver reduce
    equals a single-batch run under any partitioning."""
    import numpy as np

    import ray.data

    from engine.stages.reshard import _hrw_assign, reshard_moves

    ids = np.arange(5000, dtype=np.int64)
    old, new = _hrw_assign(ids, 8)
    moved = old != new
    assert (new[moved] == 8).all(), "HRW move must target the added shard"
    frac = moved.mean()
    assert 0.05 < frac < 0.20, f"move rate {frac} not ~1/9 (salt regression)"
    # per-row reference fold == the vectorized prefix-extension path
    from engine.stages.reshard import _HRW_MOD, _HRW_SALT

    def ref_weight(i: int, s: int) -> int:
        h = 0xCBF29CE484222325
        for byte in f"{i}:{(s * _HRW_SALT) % _HRW_MOD}".encode():
            h = ((h ^ byte) * 0x100000001B3) % (1 << 64)
        return h

    for i in [0, 1, 17, 4999]:
        ws = [ref_weight(i, s) for s in range(9)]
        assert old[i] == int(np.argmax(ws[:8]))
        assert new[i] == int(np.argmax(ws))

    t = pa.table({"doc_id": pa.array(ids)})
    a = reshard_moves(ray.data.from_arrow(t), n_shards=8).to_pandas()
    b = reshard_moves(
        ray.data.from_arrow(t).repartition(7), n_shards=8
    ).to_pandas()
    assert a.equals(b)
    assert int(a["n_docs"].sum()) == len(ids)
    assert int(a["n_moved"].sum()) == int(moved.sum())
    empty = reshard_moves(
        ray.data.from_arrow(t.slice(0, 0)), n_shards=8
    ).to_pandas()
    assert len(empty) == 0
    assert list(empty.columns) == ["shard", "n_docs", "n_moved"]


def test_rank_eval_metrics(ray_session):
    """rank_eval: hand-computed precision@k / MRR on a tiny corpus where
    the tf ranking and the title labels are obvious."""
    import ray.data

    from engine.stages.search import rank_eval

    texts = [
        "merge a b c d e merge merge",   # tf=3, 'merge' in first 6 -> rel
        "x y z merge merge",             # tf=2, not in first 6... pos 4 IS in first 6 -> rel
        "a b c d e f merge",             # tf=1, pos 7 -> not rel
        "no hits here",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = rank_eval(
        ray.data.from_arrow(t).repartition(2), ["merge"], k=2
    ).to_pandas()
    # ranking by tf desc: doc0 (rel), doc1 (rel); k=2 -> prec 100%, MRR 1
    assert got.iloc[0].tolist() == ["merge", 2, 2, 10000, 1_000_000]
    # k=3: doc2 enters unrelevant -> prec 2/3
    got3 = rank_eval(ray.data.from_arrow(t), ["merge"], k=3).to_pandas()
    assert got3.iloc[0].tolist() == ["merge", 3, 2, 6666, 1_000_000]
    emptyc = rank_eval(
        ray.data.from_arrow(t), ["zebra_absent"], k=3
    ).to_pandas()
    assert len(emptyc) == 0


def test_mmr_rerank_matches_numpy_oracle(ray_session):
    """mmr_rerank == the full-corpus numpy greedy MMR reference (same
    candidate pool, same lambda, same tie rule) on planted vectors with
    a near-duplicate cluster — and actually diversifies (the dup's copy
    is deferred past its pure-cosine rank)."""
    import numpy as np

    import ray.data

    from engine.stages.ann import _normalize, mmr_rerank

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16)
    base[1] = base[0] + 1e-3 * rng.randn(16)  # near-dup of vec 0
    q = base[0] + 0.1 * rng.randn(16)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in base]),
        }
    )
    got = mmr_rerank(
        ray.data.from_arrow(t).repartition(4), q, k=6, n_candidates=20,
        lam=0.5,
    ).to_pandas()

    qn = _normalize(q.reshape(1, -1))[0]
    Vn = _normalize(base.astype(np.float64))
    sims = Vn @ qn
    ids = np.arange(40)
    order = np.lexsort((ids, -sims))[:20]
    cid, cm = ids[order], Vn[order]
    rel, pair = cm @ qn, cm @ cm.T
    lam, picked = 0.5, np.zeros(20, bool)
    max_div = np.full(20, -np.inf)
    sel = []
    for _ in range(6):
        score = lam * rel - ((1 - lam) * max_div if sel else 0)
        score = np.where(picked, -np.inf, score)
        b = np.lexsort((cid, -score))[0]
        picked[b] = True
        sel.append(int(cid[b]))
        max_div = np.maximum(max_div, pair[:, b])
    assert got["vec_id"].tolist() == sel
    # pure cosine would put the near-dup (vec 1) adjacent to vec 0;
    # MMR must NOT pick it second
    assert got["vec_id"].tolist()[1] != 1
    assert got["rank"].tolist() == [1, 2, 3, 4, 5, 6]


def test_charset_sniff_ladder(ray_session):
    """WHATWG ladder: BOM > declaration > heuristic; provenance flags;
    truncated/empty payloads never crash."""
    import ray.data

    from engine.stages.charset import charset_sniff

    payloads = [
        b"\xef\xbb\xbfx",                                   # utf-8 BOM
        b"\xff\xfe",                                        # bare utf-16le BOM
        b"\xfe\xffB",                                       # utf-16be BOM
        b'<meta charset="ISO-8859-1">',                     # declaration
        b"\xef\xbb\xbf<meta charset=latin-1>",              # BOM beats meta
        b"ascii only",
        b"caf\xc3\xa9",                                     # high byte -> utf-8
        b"",                                                # empty
        b'<meta content="a/b; charset=EUC-JP">tail',        # http-equiv form
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(payloads))), pa.int64()),
            "html": pa.array(payloads, pa.binary()),
        }
    )
    got = (
        charset_sniff(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = [
        ("utf-8", 1, 0), ("utf-16le", 1, 0), ("utf-16be", 1, 0),
        ("iso-8859-1", 0, 1), ("utf-8", 1, 0), ("ascii", 0, 0),
        ("utf-8", 0, 0), ("ascii", 0, 0), ("euc-jp", 0, 1),
    ]
    assert list(zip(got.encoding, got.bom, got.declared)) == exp


# ---------------------------------------------------------------------------
# round-5 session-7 batch: segments / c4 / webfilter / stopwords
# ---------------------------------------------------------------------------


def test_segment_merge_remap(ray_session):
    """The merged dictionary is the sorted token union with dense global
    ids; each posting's local_term_id is the token's rank in its OWN
    segment dictionary; output is (term_id, doc_id)-sorted."""
    import ray.data

    from engine.stages.segments import segment_merge

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["b a b", "c b", "a", "d a"], pa.string()
            ),
        }
    )
    out = segment_merge(
        ray.data.from_arrow(t).repartition(2), n_segments=2
    ).to_pandas()
    # seg 0 docs {0, 2}: dict [a, b]; seg 1 docs {1, 3}: dict [a, b, c, d]
    # merged dict [a, b, c, d]
    by = {
        (r.token, r.doc_id): (r.term_id, r.seg, r.local_term_id, r.tf)
        for r in out.itertuples()
    }
    assert by[("b", 0)] == (1, 0, 1, 2)
    assert by[("a", 0)] == (0, 0, 0, 1)
    assert by[("a", 2)] == (0, 0, 0, 1)
    assert by[("c", 1)] == (2, 1, 2, 1)
    assert by[("b", 1)] == (1, 1, 1, 1)
    assert by[("d", 3)] == (3, 1, 3, 1)
    assert by[("a", 3)] == (0, 1, 0, 1)
    # sorted by (term_id, doc_id)
    pairs = list(zip(out["term_id"], out["doc_id"]))
    assert pairs == sorted(pairs)


def test_segment_merge_dict_gate(ray_session):
    import ray.data

    from engine.stages.segments import segment_merge

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c", "d e f"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="dict_max"):
        segment_merge(ray.data.from_arrow(t), n_segments=2, dict_max=3)


def test_apply_deletes_counts(ray_session):
    import ray.data

    from engine.stages.segments import apply_deletes

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["x x y", "x z", "y"], pa.string()),
        }
    )
    out = (
        apply_deletes(ray.data.from_arrow(t).repartition(2), [2])
        .to_pandas()
        .set_index("token")
    )
    assert out.loc["x", "df_total"] == 2
    assert out.loc["x", "df_live"] == 1
    assert out.loc["x", "cf_live"] == 2  # doc 1 has x twice
    assert out.loc["z", "df_live"] == 0
    assert out.loc["z", "cf_live"] == 0
    assert out.loc["y", "df_live"] == 2
    with pytest.raises(ValueError, match="deleted_max"):
        apply_deletes(ray.data.from_arrow(t), range(10), deleted_max=5)


def test_c4_line_filter_buckets(ray_session):
    """Each drop bucket, the banned>short>punct precedence, the curly
    doc-drop, and the joined clean_chars arithmetic."""
    import ray.data

    from engine.stages.c4 import c4_line_filter

    docs = [
        # 3 keepable lines -> kept; one short, one punct-less, one banned
        (
            0,
            "one two three four five.\nsix seven eight nine ten!\n"
            'eleven twelve thirteen fourteen fifteen"\nshort line.\n'
            "no terminal punctuation here at all\n"
            "enable javascript please now.",
        ),
        # banned AND short: counted banned (precedence)
        (1, "javascript.\ngood line with five words."),
        # curly marker kills the doc even with 3 kept lines
        (
            2,
            "one two three four five.\nsix seven eight nine ten.\n"
            "this has a { marker and six words.",
        ),
        (3, ""),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([x for _, x in docs], pa.string()),
        }
    )
    out = (
        c4_line_filter(ray.data.from_arrow(t).repartition(2), min_lines=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    r0 = out.loc[0]
    assert (
        r0.n_lines,
        r0.kept_lines,
        r0.drop_banned,
        r0.drop_short,
        r0.drop_punct,
        r0.doc_kept,
    ) == (6, 3, 1, 1, 1, 1)
    kept_lines = [
        "one two three four five.",
        "six seven eight nine ten!",
        'eleven twelve thirteen fourteen fifteen"',
    ]
    assert r0.clean_chars == sum(len(x) for x in kept_lines) + 2
    r1 = out.loc[1]
    assert (r1.drop_banned, r1.drop_short, r1.kept_lines, r1.doc_kept) == (
        1,
        0,
        1,
        0,
    )
    r2 = out.loc[2]
    assert (r2.kept_lines, r2.doc_kept) == (3, 0)  # curly kills it
    r3 = out.loc[3]
    assert (r3.n_lines, r3.kept_lines, r3.doc_kept) == (1, 0, 0)


def test_badword_stats_edges(ray_session):
    import ray.data

    from engine.stages.webfilter import badword_stats

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["bad  good   bad", "", None, "clean words only"], pa.string()
            ),
        }
    )
    out = (
        badword_stats(
            ray.data.from_arrow(t).repartition(2),
            ("bad",),
            max_bad_ppm=500_000,
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.n_tokens) == [3, 0, 0, 3]
    assert list(out.n_bad) == [2, 0, 0, 0]
    assert out.loc[0, "bad_ppm"] == 666_666
    assert list(out.flagged) == [1, 0, 0, 0]


def test_mirror_detect_semantics(ray_session):
    """Same hash on one host (self-duplicate) is NOT a mirror; the same
    hash across hosts is, with exact host/page counts and min-id rep."""
    import ray.data

    from engine.stages.webfilter import mirror_detect

    t = pa.table(
        {
            "doc_id": pa.array([5, 3, 9, 10, 11], pa.int64()),
            "text": pa.array(["A", "A", "A", "B", "B"], pa.string()),
            "host": pa.array(
                ["h1", "h2", "h1", "h9", "h9"], pa.string()
            ),
        }
    )
    out = mirror_detect(ray.data.from_arrow(t).repartition(3)).to_pandas()
    assert len(out) == 1  # B is same-host only
    assert (
        int(out.n_hosts[0]),
        int(out.n_pages[0]),
        int(out.rep_doc[0]),
    ) == (2, 3, 3)


def test_soft404_gate(ray_session):
    import ray.data

    from engine.stages.webfilter import soft404_detect

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "title": pa.array(
                ["Page Not Found", "Page Not Found", "Welcome"], pa.string()
            ),
            "n_chars": pa.array([100, 5000, 100], pa.int64()),
        }
    )
    out = soft404_detect(ray.data.from_arrow(t)).to_pandas()
    assert list(out.marker) == [1, 1, 0]
    assert list(out.soft404) == [1, 0, 0]


def test_stopword_list_threshold(ray_session):
    import ray.data

    from engine.stages.index_build import stopword_list

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["the cat", "the dog", "the fox", "a fox"], pa.string()
            ),
        }
    )
    out = (
        stopword_list(ray.data.from_arrow(t).repartition(2), min_df_ppm=500_000)
        .to_pandas()
        .set_index("token")
    )
    assert set(out.index) == {"the", "fox"}
    assert out.loc["the", "df"] == 3 and out.loc["the", "df_ppm"] == 750_000
    assert out.loc["fox", "df_ppm"] == 500_000


def test_session7_ops_empty_corpus(ray_session):
    """Typed empties on a zero-row corpus for the session-7 batch."""
    import ray.data

    from engine.stages.c4 import c4_line_filter
    from engine.stages.index_build import stopword_list
    from engine.stages.segments import apply_deletes, segment_merge
    from engine.stages.webfilter import (
        badword_stats,
        mirror_detect,
        soft404_detect,
    )

    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "title": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    )
    assert segment_merge(empty).count() == 0
    assert apply_deletes(empty, [1]).count() == 0
    assert c4_line_filter(empty).count() == 0
    assert badword_stats(empty, ("x",)).count() == 0
    assert mirror_detect(empty).count() == 0
    assert soft404_detect(empty).count() == 0
    assert stopword_list(empty).count() == 0


def test_terms_set_exact_token_threshold(ray_session):
    """Whole-token membership (substring hits don't count) with the
    per-doc minimum_should_match_field threshold."""
    import ray.data

    from engine.stages.search import terms_set_search

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "join merge scan",      # 3 distinct matches
                    "joins merges scans",   # substrings only -> 0
                    "join join join",       # distinct -> 1
                    "",
                ],
                pa.string(),
            ),
            "req": pa.array([2, 1, 1, 1], pa.int64()),
        }
    )
    out = (
        terms_set_search(
            ray.data.from_arrow(t).repartition(2),
            ("join", "merge", "scan"),
            req_col="req",
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert set(out.index) == {0, 2}
    assert out.loc[0, "n_matched"] == 3
    assert out.loc[2, "n_matched"] == 1


def test_composite_page_cursor(ray_session):
    """after_key pagination: page 1 (after=None), a mid cursor, and a
    final page shorter than size."""
    import ray.data

    from engine.stages.topk import composite_page

    t = pa.table(
        {
            "event_id": pa.array(list(range(8)), pa.int64()),
            "event_type": pa.array(
                ["a", "a", "b", "b", "b", "c", "c", "a"], pa.string()
            ),
            "bucket": pa.array([0, 1, 0, 0, 1, 0, 1, 0], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    p1 = composite_page(ds, keys=("event_type", "bucket"), size=3).to_pandas()
    assert list(zip(p1.event_type, p1.bucket)) == [("a", 0), ("a", 1), ("b", 0)]
    assert list(p1["rank"]) == [1, 2, 3]
    assert p1.set_index(["event_type", "bucket"]).loc[("a", 0), "n_rows"] == 2
    assert p1.set_index(["event_type", "bucket"]).loc[("b", 0), "min_id"] == 2
    p2 = composite_page(
        ds, keys=("event_type", "bucket"), after=("b", 0), size=3
    ).to_pandas()
    assert list(zip(p2.event_type, p2.bucket)) == [("b", 1), ("c", 0), ("c", 1)]
    p3 = composite_page(
        ds, keys=("event_type", "bucket"), after=("c", 0), size=3
    ).to_pandas()
    assert list(zip(p3.event_type, p3.bucket)) == [("c", 1)]
    # empty page past the end
    assert (
        composite_page(
            ds, keys=("event_type", "bucket"), after=("c", 1), size=3
        ).count()
        == 0
    )


def test_y4m_roundtrip_and_errors():
    """encode_y4m/decode_y4m round-trip (mono and C420 with odd dims),
    plus the malformed-input contract."""
    import numpy as np

    from engine.stages.multimodal import decode_y4m, encode_y4m

    rs = np.random.RandomState(3)
    fr = rs.randint(0, 256, (4, 9, 7)).astype(np.uint8)
    for cs in ("mono", "420"):
        lu, w, h, num, den = decode_y4m(
            encode_y4m(fr, fps=(30, 1), colorspace=cs)
        )
        assert (lu == fr).all() and (w, h, num, den) == (7, 9, 30, 1)
    ok = encode_y4m(fr, colorspace="mono")
    with pytest.raises(ValueError):
        decode_y4m(b"RIFFnot a video")
    with pytest.raises(ValueError):
        decode_y4m(ok[:-5])  # truncated final frame
    with pytest.raises(ValueError):
        decode_y4m(ok.replace(b"FRAME", b"FRAMX", 1))
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C999\nFRAME\n" + b"\0" * 16)


def test_sample_video_frames_oracle(ray_session):
    """Distributed frame sampling matches a single-process decode of the
    same corpus exactly (timestamps, luma stats, per-frame dHash), and
    the malformed payload takes the skip row."""
    import numpy as np
    import ray.data

    from engine.stages.multimodal import (
        decode_y4m,
        frame_sample_indices,
        image_dhash,
        sample_video_frames,
        synth_video_table,
    )

    t = synth_video_table(n=12)
    got = sample_video_frames(
        ray.data.from_arrow(t).repartition(3), n_samples=6
    ).to_pandas()
    exp = {}
    for mid, payload in zip(
        t.column("media_id").to_pylist(), t.column("payload").to_pylist()
    ):
        try:
            luma, w, h, num, den = decode_y4m(payload)
        except ValueError:
            exp[(mid, -1)] = (-1, -1, 0, 0, 0)
            continue
        nf, area = luma.shape[0], w * h
        for idx in frame_sample_indices(nf, 6):
            fr = luma[idx]
            s = int(fr.astype(np.int64).sum())
            dh = image_dhash(np.stack([fr, fr, fr], axis=-1)) & ((1 << 63) - 1)
            exp[(mid, idx)] = (nf, (1000 * idx * den) // num, s,
                               (1000 * s) // area, dh)
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert (
            r.n_frames, r.ts_ms, r.luma_sum, r.luma_mean_milli, r.frame_dhash
        ) == exp[(r.media_id, r.frame_idx)]
    assert (got.frame_idx == -1).sum() == 1  # the malformed payload


def test_resize_images_oracle(ray_session):
    """Distributed resize matches resize_image_box exactly and the PPM
    re-encode round-trips; upscale degrades to nearest-neighbor."""
    import numpy as np
    import ray.data

    from engine.stages.multimodal import (
        decode_bmp,
        decode_ppm,
        resize_image_box,
        resize_images,
        synth_real_media_table,
    )

    t = synth_real_media_table(n=12)
    got = resize_images(
        ray.data.from_arrow(t).repartition(2), out_w=16, out_h=12
    ).to_pandas()
    pay = dict(zip(t.column("media_id").to_pylist(), t.column("payload").to_pylist()))
    mim = dict(zip(t.column("media_id").to_pylist(), t.column("mime").to_pylist()))
    n_img = 0
    for r in got.itertuples():
        mime = mim[r.media_id]
        if mime == "image/bmp":
            px = decode_bmp(pay[r.media_id])
        elif mime.startswith("image"):
            px = decode_ppm(pay[r.media_id])
        else:
            assert r.in_w == -1 and r.payload_out == b""
            continue
        rz = resize_image_box(px, 16, 12)
        assert r.px_sum == int(rz.astype(np.int64).sum())
        back = decode_ppm(r.payload_out)
        assert back.shape == (12, 16, 3) and (back == rz).all()
        n_img += 1
    assert n_img == 8
    # upscale: each output pixel equals its floor-grid source pixel
    px = (np.arange(2 * 3 * 3, dtype=np.uint8) * 3).reshape(2, 3, 3)
    up = resize_image_box(px, 6, 4)
    for i in range(4):
        for j in range(6):
            assert (up[i, j] == px[(i * 2) // 4, (j * 3) // 6]).all()
    with pytest.raises(ValueError):
        resize_image_box(px, 0, 4)


def test_host_boilerplate_scoping(ray_session):
    """Boilerplate is HOST-scoped: the same line on two hosts with 2
    docs each does not qualify at min_docs=3; within-doc repeats raise
    n_occurrences but not n_docs."""
    import ray.data

    from engine.stages.webfilter import host_boilerplate

    docs = [
        (0, "a", "nav\nx y z"),
        (1, "a", "nav\nnav\np q"),      # nav twice in one doc
        (2, "a", "nav\nr s"),
        (3, "b", "nav\nt u"),
        (4, "b", "nav\nv w"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
            "host": pa.array([h for _, h, _ in docs], pa.string()),
            "text": pa.array([x for _, _, x in docs], pa.string()),
        }
    )
    out = host_boilerplate(
        ray.data.from_arrow(t).repartition(2), min_docs=3
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.host, r.line, int(r.n_docs), int(r.n_occurrences)) == (
        "a",
        "nav",
        3,
        4,
    )
    assert host_boilerplate(
        ray.data.from_arrow(t.slice(0, 0))
    ).count() == 0


def test_ltr_features_values(ray_session):
    """Exact tf/dl/df bookkeeping and the fixed-point scores against a
    direct recompute on a hand corpus."""
    import math

    import numpy as np
    import ray.data

    from engine.stages.search import ltr_features

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["join join scan extra", "scan only here", "nothing else"],
                pa.string(),
            ),
        }
    )
    out = (
        ltr_features(ray.data.from_arrow(t).repartition(2), ("join", "scan"))
        .to_pandas()
        .set_index(["doc_id", "token"])
        .sort_index()
    )
    assert set(out.index) == {(0, "join"), (0, "scan"), (1, "scan")}
    assert out.loc[(0, "join"), "tf"] == 2
    assert out.loc[(0, "join"), "dl"] == 4
    assert out.loc[(0, "join"), "n_matched"] == 2
    assert out.loc[(1, "scan"), "n_matched"] == 1
    n_docs, total = 3, 9  # dl: 4 + 3 + 2
    for (d, tok), row in out.iterrows():
        df = 1 if tok == "join" else 2
        idf = math.log((n_docs - df + 0.5) / (df + 0.5))
        assert row["idf_nano"] == math.floor(1e9 * idf)
        tf, dl = int(row["tf"]), int(row["dl"])
        norm = float(dl * n_docs) / float(total)
        bm = 1000000000.0 * idf * (tf * 2.2) / (tf + 0.3 + 0.9 * norm)
        assert row["bm25_nano"] == np.floor(bm).astype(np.int64)
    # empty corpus -> typed empty
    assert ltr_features(
        ray.data.from_arrow(t.slice(0, 0)), ("join",)
    ).count() == 0


def test_htmlmeta_stages(ray_session):
    """htmlmeta.meta_robots / hreflang_map vs the doc_id-arithmetic
    oracle the SQL uses, plus typed zero-row output (empty corpus)."""
    import ray.data

    from engine.pipelines.queries import _htmlmeta_page
    from engine.stages.htmlmeta import hreflang_map, meta_robots

    ids = list(range(24))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "html": pa.array([_htmlmeta_page(d) for d in ids], pa.string()),
            }
        )
    )
    rb = meta_robots(ds).to_pandas().set_index("doc_id").sort_index()
    exp_flags = {
        0: (0, 0, 0, 0), 1: (1, 0, 0, 0), 2: (1, 1, 0, 0),
        3: (0, 1, 1, 0), 4: (0, 0, 0, 0), 5: (0, 1, 0, 1),
    }
    for d in ids:
        assert tuple(
            rb.loc[d, ["noindex", "nofollow", "noarchive", "nosnippet"]]
        ) == exp_flags[d % 6], d

    hl = hreflang_map(ds).to_pandas()
    got = {
        d: sorted(g["hreflang"]) for d, g in hl.groupby("doc_id")
    }
    exp_langs = {0: ["de", "en", "x-default"], 2: ["fr"], 3: ["en-gb"]}
    for d in ids:
        assert got.get(d, []) == exp_langs.get(d % 4, []), d
    assert (
        hl["href"]
        == "https://alt.example.com/" + hl["hreflang"] + "/"
        + hl["doc_id"].astype(str)
    ).all()

    empty = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "html": pa.array([], pa.string())}
        )
    )
    for fn in (meta_robots, hreflang_map):
        assert fn(empty).count() == 0


def test_extended_stats_exact(ray_session):
    """aggs.extended_stats vs a Python-int oracle (exact moments +
    floor-division variance), NaN drop, empty corpus."""
    import math

    import ray.data

    from engine.stages.aggs import extended_stats

    vals = [1.2345, -2.5, 0.0, 7.77, 1.2345, 3.3, float("nan"), 9.1]
    grps = ["a", "a", "b", "b", "a", "b", "a", "b"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(grps, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        )
    ).repartition(3)
    got = extended_stats(ds).to_pandas().set_index("event_type")
    for g in ("a", "b"):
        vm = [
            math.floor(v * 1000 + 0.5)
            for v, gg in zip(vals, grps)
            if gg == g and not math.isnan(v)
        ]
        n, s, ssq = len(vm), sum(vm), sum(x * x for x in vm)
        assert got.loc[g, "n"] == n
        assert got.loc[g, "sum_m"] == s
        assert got.loc[g, "min_m"] == min(vm)
        assert got.loc[g, "max_m"] == max(vm)
        assert got.loc[g, "ssq_m"] == ssq
        assert got.loc[g, "var_m2"] == (n * ssq - s * s) // (n * n)
    empty = ray.data.from_arrow(
        pa.table(
            {"event_type": pa.array([], pa.string()),
             "value": pa.array([], pa.float64())}
        )
    )
    assert extended_stats(empty).num_rows == 0


def test_dis_max_scoring(ray_session):
    """search.dis_max vs hand-computed best-field scores; tie_breaker
    algebra; docs with zero hits drop; empty corpus."""
    from engine.stages.search import dis_max

    rows = [
        (1, "join join merge"),        # tf (2,1,0): 2000 + 300*1 = 2300
        (2, "scan scan scan"),         # tf (0,0,3): 3000
        (3, "join merge scan"),        # tf (1,1,1): 1000 + 300*2 = 1600
        (4, "nothing here"),           # drops
    ]
    ds = _docs_ds(rows)
    got = (
        dis_max(ds, ("join", "merge", "scan"), tie_milli=300, k=10)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == [2, 1, 3]
    assert list(got["score_milli"]) == [3000, 2300, 1600]
    assert list(got["max_tf"]) == [3, 2, 1]
    assert list(got["sum_tf"]) == [3, 3, 3]
    assert dis_max(_docs_ds([]), ("a",)).count() == 0


def test_hreflang_reciprocal_semijoin(ray_session):
    """htmlmeta.hreflang_reciprocal: reciprocal pair, dangling edge,
    one-sided double annotation (two langs same pair still needs the
    REVERSE direction), self-link drop."""
    import ray.data

    from engine.stages.htmlmeta import hreflang_reciprocal

    def page(url, alts):
        links = "".join(
            f'<link rel="alternate" hreflang="{lg}" href="{h}">'
            for lg, h in alts
        )
        return f"<html><head>{links}</head><body></body></html>"

    rows = [
        (1, "https://e.com/a", [("de", "https://e.com/b")]),
        (2, "https://e.com/b", [("en", "https://e.com/a")]),
        (3, "https://e.com/c", [("fr", "https://e.com/d")]),   # dangling
        (4, "https://e.com/d", []),
        # one page annotating the same target twice (two langs) without
        # a reverse edge must NOT count as reciprocal
        (5, "https://e.com/e", [("es", "https://e.com/f"),
                                ("pt", "https://e.com/f")]),
        (6, "https://e.com/g", [("it", "https://e.com/g")]),   # self: drop
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "html": pa.array(
                    [page(r[1], r[2]) for r in rows], pa.string()
                ),
            }
        )
    ).repartition(3)
    got = (
        hreflang_reciprocal(ds)
        .to_pandas()
        .sort_values(["doc_id", "hreflang"])
        .reset_index(drop=True)
    )
    rec = dict(zip(zip(got["doc_id"], got["hreflang"]), got["reciprocal"]))
    assert rec == {
        (1, "de"): 1, (2, "en"): 1, (3, "fr"): 0,
        (5, "es"): 0, (5, "pt"): 0,
    }
    assert 6 not in set(got["doc_id"])


def test_change_rate_schedule_ladder(ray_session):
    """cachecontrol.change_rate_schedule vs a Counter oracle: exact
    Laplace ratio, ladder thresholds inclusive, cross-batch merge."""
    import ray.data

    from engine.stages.cachecontrol import change_rate_schedule

    log = (
        [(10, 1)] * 9 + [(10, 0)]          # 9/10 -> ratio 833333 hot
        + [(20, 1)] * 1 + [(20, 0)] * 9    # 1/10 -> 166666  warm@100k
        + [(30, 0)] * 18                   # 0/18 -> 50000   cold
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url_id": pa.array([u for u, _ in log], pa.int64()),
                "changed": pa.array([c for _, c in log], pa.int64()),
            }
        )
    ).repartition(4)
    got = (
        change_rate_schedule(ds)
        .to_pandas()
        .set_index("url_id")
        .sort_index()
    )
    assert got.loc[10, "ratio_ppm"] == (1_000_000 * 10) // 12
    assert got.loc[10, "revisit_s"] == 3600
    assert got.loc[20, "ratio_ppm"] == (1_000_000 * 2) // 12
    assert got.loc[20, "revisit_s"] == 86400
    assert got.loc[30, "ratio_ppm"] == 1_000_000 // 20
    assert got.loc[30, "revisit_s"] == 604800
    assert (got["visits"] == [10, 10, 18]).all()
    assert (got["changes"] == [9, 1, 0]).all()


def test_adjacency_matrix_counts(ray_session):
    """aggs.adjacency_matrix vs hand-counted intersections; zero pairs
    kept; empty corpus -> all-zero matrix (k*(k+1)/2 rows)."""
    import ray.data

    from engine.stages.aggs import adjacency_matrix

    rows = [
        (1, "a b"), (2, "a c"), (3, "b c a"), (4, "d"), (5, None),
    ]
    ds = _docs_ds(rows).repartition(2)
    got = adjacency_matrix(ds, ("a", "b", "c")).to_pandas()
    cnt = dict(zip(zip(got["filter_a"], got["filter_b"]), got["doc_count"]))
    assert cnt == {
        ("a", "a"): 3, ("a", "b"): 2, ("a", "c"): 2,
        ("b", "b"): 2, ("b", "c"): 1, ("c", "c"): 2,
    }
    empty = adjacency_matrix(_docs_ds([]), ("a", "b")).to_pandas()
    assert len(empty) == 3 and (empty["doc_count"] == 0).all()


def test_lexical_diversity_exact(ray_session):
    """text.lexical_diversity vs per-doc set oracle; zero-token -1;
    repeat-heavy doc scores low."""
    from engine.stages.text import _TOKEN, lexical_diversity

    rows = [
        (1, "spam spam spam spam"),
        (2, "all distinct tokens here now"),
        (3, ""),
        (4, None),
        (5, "x y x y z"),
    ]
    got = (
        lexical_diversity(_docs_ds(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for d, txt in rows:
        toks = _TOKEN.findall(txt or "")
        assert got.loc[d, "n_tokens"] == len(toks)
        assert got.loc[d, "n_types"] == len(set(toks))
        exp = (1_000_000 * len(set(toks))) // len(toks) if toks else -1
        assert got.loc[d, "ttr_ppm"] == exp
    assert got.loc[1, "ttr_ppm"] < got.loc[2, "ttr_ppm"]


def test_stale_pages_join(ray_session):
    """sitemaps.stale_pages: lastmod>capture stale, never-captured
    stale, missing lastmod not stale when captured, newest capture
    wins, sitemap-index members excluded."""
    import ray.data

    from engine.stages.sitemaps import stale_pages

    sm = ray.data.from_arrow(
        pa.table(
            {
                "host": pa.array(["h1", "h1", "h2"], pa.string()),
                "xml": pa.array(
                    [
                        "<urlset>"
                        "<url><loc>u1</loc><lastmod>2026-01-10</lastmod></url>"
                        "<url><loc>u2</loc><lastmod>2026-01-05</lastmod></url>"
                        "</urlset>",
                        "<urlset><url><loc>u3</loc></url>"
                        "<url><loc>u4</loc><lastmod>2026-02-01</lastmod></url>"
                        "</urlset>",
                        "<sitemapindex><sitemap><loc>sub.xml</loc>"
                        "</sitemap></sitemapindex>",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    day = lambda s: __import__("datetime").date.fromisoformat(s).toordinal() - 719163
    cap = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["u1", "u1", "u2", "u3"], pa.string()),
                "capture_day": pa.array(
                    [day("2026-01-08"), day("2026-01-02"),
                     day("2026-01-06"), day("2026-01-01")],
                    pa.int64(),
                ),
            }
        )
    )
    got = stale_pages(sm, cap).to_pandas().set_index("url").sort_index()
    assert set(got.index) == {"u1", "u2", "u3", "u4"}  # no sub.xml
    assert got.loc["u1", "stale"] == 1          # 01-10 > newest 01-08
    assert got.loc["u1", "capture_day"] == day("2026-01-08")
    assert got.loc["u2", "stale"] == 0          # 01-05 < 01-06
    assert got.loc["u3", "stale"] == 0          # no lastmod, captured
    assert got.loc["u3", "lastmod_day"] == -1
    assert got.loc["u4", "stale"] == 1          # never captured
    assert got.loc["u4", "capture_day"] == -1


def test_robots_directives_header_merge(ray_session):
    """htmlmeta.robots_directives: header+meta union, scoped header
    groups ignored, missing header column tolerated."""
    import ray.data

    from engine.stages.htmlmeta import robots_directives

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "html": pa.array(
                [
                    '<head><meta name="robots" content="noindex"></head>',
                    "<head></head>",
                    "<head></head>",
                ],
                pa.string(),
            ),
            "x_robots_tag": pa.array(
                ["noarchive", "googlebot: noindex", "none"], pa.string()
            ),
        }
    )
    got = (
        robots_directives(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, ["noindex", "noarchive"]].tolist() == [1, 1]
    assert got.loc[1, ["from_header", "from_meta"]].tolist() == [1, 1]
    assert got.loc[2].tolist() == [0, 0, 0, 0, 0, 0]  # scoped ignored
    assert got.loc[3, ["noindex", "nofollow", "from_header"]].tolist() == [1, 1, 1]
    # header column absent: meta-only path
    got2 = (
        robots_directives(ray.data.from_arrow(t.drop_columns(["x_robots_tag"])))
        .to_pandas()
        .set_index("doc_id")
    )
    assert got2.loc[1, "noindex"] == 1 and got2.loc[1, "from_header"] == 0
    assert got2.loc[3].sum() == 0


def test_link_rel_stats_classification(ray_session):
    """htmlmeta.link_rel_stats: subdomain internal via eTLD+1, relative
    resolution, rel token matching (compound counts, superstring
    doesn't), unparsable page -> zero row."""
    import ray.data

    from engine.stages.htmlmeta import link_rel_stats

    rows = [
        (1, "https://www.a.co.uk/p",
         '<body><a href="https://shop.a.co.uk/x">s</a>'
         '<a href="../up">r</a>'
         '<a rel="sponsored nofollow" href="https://b.com/y">e</a>'
         '<a rel="nofollower" href="https://c.com/z">d</a></body>'),
        (2, "https://a.com/", "<body><p>none</p></body>"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "url": pa.array([r[1] for r in rows], pa.string()),
                "html": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    got = link_rel_stats(ds).to_pandas().set_index("doc_id").sort_index()
    # shop.a.co.uk and ../up are internal to a.co.uk; b.com/c.com external
    assert got.loc[1].tolist() == [4, 2, 2, 1]
    assert got.loc[2].tolist() == [0, 0, 0, 0]


def test_wand_topk_identical_to_exact_and_actually_prunes(ray_session):
    """search.wand_topk must return EXACTLY bm25_topk's (rank, id) table
    under any partitioning, and the upper-bound skip must really skip:
    with k << candidates in one block, n_scored < n_candidates."""
    import ray.data

    from engine.stages.search import bm25_topk, wand_topk

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(120)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(5, 80))))
        for _ in range(400)
    ]
    terms = ["w1", "w2", "w3"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        exact = bm25_topk(ds, terms, k=25)
        got, stats = wand_topk(ds, terms, k=25, return_stats=True)
        assert got.column("doc_id").to_pylist() == exact.column("doc_id").to_pylist()
        assert got.column("rank").to_pylist() == exact.column("rank").to_pylist()
        assert stats["n_scored"] <= stats["n_candidates"]
    # single block, tiny k, small chunk: the bound must cut the tail
    ds1 = ray.data.from_arrow(tbl).repartition(1)
    got, stats = wand_topk(ds1, terms, k=5, chunk=16, return_stats=True)
    exact = bm25_topk(ds1, terms, k=5)
    assert got.column("doc_id").to_pylist() == exact.column("doc_id").to_pylist()
    assert stats["n_scored"] < stats["n_candidates"], stats
    # zero-match query: typed empty, no crash
    none_t, none_s = wand_topk(ds1, ["zzzz_absent"], k=5, return_stats=True)
    assert none_t.num_rows == 0 and none_s["n_scored"] == 0


@pytest.mark.parametrize(
    "gate", [2_000_000, 0], ids=["driver-path", "distributed-path"]
)
def test_bfs_hops_matches_reference(ray_session, gate):
    """Both bfs_hops paths (gated driver BFS, distributed join rounds) ==
    a single-process reference BFS, on a graph with an unreachable
    island, an isolated seed, a cycle back into the seed, and a node
    reachable two ways at different depths (min must win)."""
    import ray.data

    from engine.stages.graph import bfs_hops

    E = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (4, 3), (7, 8), (8, 7),
         (2, 5), (5, 6)]
    seeds = [0, 9]  # 9 is isolated (not in the edge list at all)
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    st = pa.table({"node": pa.array(seeds, pa.int64())})
    got = (
        bfs_hops(
            ray.data.from_arrow(t).repartition(3),
            ray.data.from_arrow(st),
            max_hops=4,
            driver_max_edges=gate,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # reference BFS
    from collections import deque

    adj = {}
    for a, b in E:
        adj.setdefault(a, []).append(b)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= 4:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    exp = sorted(dist.items())
    assert list(zip(got["node"], got["hop"])) == exp
    # island 7/8 unreachable; node 3 min(3 via ring, 2 via 0->4->3) == 2
    assert 7 not in got["node"].tolist()
    assert dict(exp)[3] == 2


@pytest.mark.parametrize(
    "gate", [2_000_000, 0], ids=["driver-path", "distributed-path"]
)
def test_kcore_matches_peel(ray_session, gate):
    """Both kcore paths (driver bucket peel, distributed h-index
    fixpoint) == a reference iterative peel, on a 4-clique with a tail
    and a separate triangle: clique coreness 3, triangle 2, tail 1.
    Direction and duplicate edges must not matter (undirected dedup)."""
    import ray.data

    from engine.stages.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    E = clique + [(3, 10), (10, 11), (20, 21), (21, 22), (22, 20),
                  (1, 0)]  # duplicate of (0,1), reversed
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    got = (
        kcore(ray.data.from_arrow(t).repartition(3), driver_max_edges=gate)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    # reference peel
    und = {tuple(sorted(e)) for e in E}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {u: len(vs) for u, vs in adj.items()}
    # standard peel along the degeneracy ordering: coreness = running max
    # of the remaining degree at removal time
    core2 = {}
    live = dict(deg)
    kmax = 0
    while live:
        u = min(live, key=lambda x: (live[x], x))
        kmax = max(kmax, live[u])
        core2[u] = kmax
        del live[u]
        for v in adj[u]:
            if v in live:
                live[v] -= 1
    exp = sorted(core2.items())
    assert list(zip(got["node"], got["coreness"])) == exp
    by_node = dict(exp)
    assert all(by_node[n] == 3 for n in range(4))
    assert by_node[20] == by_node[21] == by_node[22] == 2
    assert by_node[10] == by_node[11] == 1


def test_phrase_prefix_semantics(ray_session):
    """match_phrase_prefix: final-position prefix expansion (multiple
    vocab expansions), exact-word positions unaffected, a doc matching
    only the non-prefix phrase does NOT match, and a bare prefix equal to
    a full word still matches that word."""
    import ray.data

    from engine.stages.search import phrase_search

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            [
                "the scan runs the sort",   # two expansions -> count 2
                "the table",                # 's' prefix miss
                "a the s end",              # exact token 's' matches prefix 's'
                "the",                      # phrase crosses doc end -> miss
            ],
            pa.string(),
        ),
    })
    got = (
        phrase_search(ray.data.from_arrow(t), "the s", last_prefix=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 3]
    assert got["phrase_count"].tolist() == [2, 1]
    assert got["first_pos"].tolist() == [1, 2]


def test_boosting_search_semantics(ray_session):
    """ES boosting: negative term DEMOTES (never excludes), docs with
    only the negative term do not match, demotion is exact integer
    floor(base*neg/1000)."""
    import ray.data

    from engine.stages.search import boosting_search

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            [
                "merge merge batch",      # pos_tf 3, clean -> 3000
                "merge slow",             # pos_tf 1, demoted -> 300
                "slow slow",              # no positive -> excluded
                "batch",                  # pos_tf 1 -> 1000
            ],
            pa.string(),
        ),
    })
    got = (
        boosting_search(
            ray.data.from_arrow(t), ["merge", "batch"], ["slow"],
            neg_milli=300, k=10,
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 4, 2]
    assert got["score_milli"].tolist() == [3000, 1000, 300]
    assert got["demoted"].tolist() == [0, 0, 1]


def test_sentence_stats_edges(ray_session):
    """Sentence splitter edge cases: boundary needs TRAILING whitespace
    (end-of-doc punct stays in the last sentence), multi-space boundaries
    collapse, '!' and '?' split, empty text yields one empty sentence,
    null text treated as empty."""
    import ray.data

    from engine.stages.text import sentence_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            ["one two. three! four? five.", "a.  b", "", None], pa.string()
        ),
    })
    got = (
        sentence_stats(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values(["doc_id", "sent_idx"])
        .reset_index(drop=True)
    )
    by_doc = {
        d: g["sentence"].tolist() for d, g in got.groupby("doc_id")
    }
    assert by_doc[1] == ["one two.", "three!", "four?", "five."]
    assert by_doc[2] == ["a.", "b"]
    assert by_doc[3] == [""]
    assert by_doc[4] == [""]
    r1 = got[(got["doc_id"] == 1) & (got["sent_idx"] == 1)].iloc[0]
    assert r1["n_chars"] == 8 and r1["n_tokens"] == 2


def test_fold_accents_edges(ray_session):
    """Folding: uppercase accents fold through lowercase+NFKD, ligatures
    decompose (NFKD), ø/ß have no mark decomposition and pass through
    (DuckDB strip_accents parity), pure-ASCII rows use the fast path and
    set changed only when case changes."""
    import ray.data

    from engine.stages.text import fold_accents

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            ["Héllo WÖRLD", "naïve ﬁle", "søren ß", "plain ascii"],
            pa.string(),
        ),
    })
    got = (
        fold_accents(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["folded"].tolist() == [
        "hello world", "naive file", "søren ß", "plain ascii"
    ]
    assert got["changed"].tolist() == [1, 1, 0, 0]


def test_terms_error_bounds_protocol(ray_session):
    """Hand-computed ES shard protocol: 2 shards, shard_size 2.  Terms
    seen per shard: s0 {a:3, b:2, c:1}, s1 {c:3, d:2, a:1}.  Kept: s0
    (a,b), s1 (c,d); last counts 2 and 2.  Merged: a=3 (missing s1 ->
    err 2), b=2 (err 2), c=3 (err 2), d=2 (err 2); order a,c,b,d by
    (count desc, term)."""
    import ray.data

    from engine.stages.aggs import terms_error_bounds

    # shard = doc_id % 2; craft docs so per-(shard,term) doc counts match
    rows = []
    did = 0

    def add(shard, terms):
        nonlocal did
        while did % 2 != shard:
            did += 1
        rows.append((did, " ".join(terms)))
        did += 1

    for _ in range(3):
        add(0, ["a"])
    for _ in range(2):
        add(0, ["b"])
    add(0, ["c"])
    for _ in range(3):
        add(1, ["c"])
    for _ in range(2):
        add(1, ["d"])
    add(1, ["a"])
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    got = terms_error_bounds(
        ray.data.from_arrow(t).repartition(3),
        n_shards=2, shard_size=2, size=10,
    ).to_pandas()
    assert got["term"].tolist() == ["a", "c", "b", "d"]
    assert got["doc_count"].tolist() == [3, 3, 2, 2]
    assert got["doc_count_error"].tolist() == [2, 2, 2, 2]
    assert got["rank"].tolist() == [1, 2, 3, 4]


def test_auto_date_histogram_ladder(ray_session):
    """Ladder decision: a 10-minute span fits 50 minute buckets ->
    interval 60; a 2-year span overflows every rung -> 30-day fallback.
    Bucket starts are epoch-aligned (multiples of the interval)."""
    import ray.data

    from engine.stages.aggs import auto_date_histogram

    base = np.datetime64("2024-01-01T00:00:00", "us")
    tight = pa.table({
        "ts": pa.array(
            (base + np.arange(0, 600, 13).astype("timedelta64[s]")).astype(
                "datetime64[us]"
            )
        )
    })
    got = auto_date_histogram(ray.data.from_arrow(tight), target_buckets=50)
    assert got.column("interval_s").to_pylist()[0] == 60
    assert all(b % 60 == 0 for b in got.column("bucket_s").to_pylist())
    assert sum(got.column("n").to_pylist()) == tight.num_rows

    wide = pa.table({
        "ts": pa.array(
            (base + np.arange(0, 730, 7).astype("timedelta64[D]")).astype(
                "datetime64[us]"
            )
        )
    })
    got2 = auto_date_histogram(ray.data.from_arrow(wide), target_buckets=20)
    assert got2.column("interval_s").to_pylist()[0] == 2_592_000


def test_prefix_sum_segmented_scan(ray_session):
    """Distributed segmented prefix scan == numpy cumsum in key order,
    with keys deliberately shuffled across blocks, non-contiguous
    (gaps), and bucket boundaries crossing block boundaries
    (bucket_span=4 over interleaved keys)."""
    import ray.data

    from engine.stages.scan import prefix_sum

    rng = np.random.RandomState(7)
    keys = np.unique(rng.randint(0, 1000, 300)).astype(np.int64)
    rng.shuffle(keys)
    vals = rng.randint(1, 50, len(keys)).astype(np.int64)
    t = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    got = (
        prefix_sum(
            ray.data.from_arrow(t).repartition(7),
            key_col="k", value_col="v", out_col="cum", bucket_span=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    order = np.argsort(keys, kind="mergesort")
    exp = np.cumsum(vals[order])
    assert got["k"].tolist() == keys[order].tolist()
    assert got["cum"].tolist() == exp.tolist()
    assert got["v"].tolist() == vals[order].tolist()


@pytest.mark.parametrize(
    "gate", [2_000_000, 0], ids=["driver-path", "distributed-path"]
)
def test_trustrank_matches_oracle(ray_session, gate):
    """Both TrustRank paths == numpy oracle (teleport over seeds only,
    dangling mass redistributed to seeds), on a graph with a dangling
    node, an isolated seed, and a spam clique far from the seeds whose
    rank must stay ~0."""
    import ray.data

    from engine.stages.graph import trustrank

    E = [(0, 1), (1, 2), (2, 0), (2, 3), (4, 5), (5, 4),
         (6, 7)]  # 4-5 spam pair; 3 dangling; 6->7 chain off-seed
    seeds = [0, 9]  # 9 isolated
    t = pa.table({
        "src": pa.array([a for a, _ in E], pa.int64()),
        "dst": pa.array([b for _, b in E], pa.int64()),
    })
    st = pa.table({"node": pa.array(seeds, pa.int64())})
    got = (
        trustrank(
            ray.data.from_arrow(t).repartition(3),
            ray.data.from_arrow(st),
            damping=0.85, iters=12, driver_max_edges=gate,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes = sorted({x for e in E for x in e} | set(seeds))
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    tele = np.zeros(N)
    for s in seeds:
        tele[idx[s]] = 1.0 / len(seeds)
    outdeg = np.zeros(N)
    for a, _ in E:
        outdeg[idx[a]] += 1
    r = tele.copy()
    d = 0.85
    for _ in range(12):
        contrib = np.zeros(N)
        for a, b in E:
            contrib[idx[b]] += r[idx[a]] / outdeg[idx[a]]
        dangling = r[outdeg == 0].sum()
        r = (1 - d) * tele + d * (contrib + dangling * tele)
    # distributed path emits rows only for nodes reachable by mass or in
    # the carrier (all nodes + seeds) — same universe as the oracle
    assert got["node"].tolist() == nodes
    assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    # spam pair 4<->5 and off-seed chain hold ~zero trust
    for spam in (4, 5, 6, 7):
        assert got.set_index("node").loc[spam, "rank"] < 1e-9


def test_fuzzy_join_completeness(ray_session):
    """FastSS deletion-neighborhood join finds EVERY ED==1 pair class
    (substitution, insertion at each end, middle deletion), excludes
    ED==2 and equal strings, and the O(n) verifier matches a full DP."""
    import itertools

    import ray.data

    from engine.stages.join import _edit_distance_leq1, fuzzy_join

    strs = ["cat", "cut", "cart", "at", "dog", "dig", "dogs", "scat",
            "banana", "bananas", "zebra"]
    t = pa.table({"title": pa.array(strs * 2, pa.string())})  # dups collapse
    got = (
        fuzzy_join(ray.data.from_arrow(t).repartition(3), text_col="title")
        .to_pandas()
    )
    got_pairs = {tuple(r) for r in got[["title_a", "title_b"]].itertuples(index=False)}

    def dp(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                cur = min(d[j] + 1, d[j - 1] + 1,
                          prev + (a[i - 1] != b[j - 1]))
                prev, d[j] = d[j], cur
        return d[lb]

    exp = {
        (a, b)
        for a, b in itertools.combinations(sorted(set(strs)), 2)
        if dp(a, b) == 1
    }
    assert got_pairs == exp
    # classes present: substitution, prefix-insert, suffix-insert
    assert ("cat", "cut") in exp and ("cat", "scat") in exp
    assert ("dog", "dogs") in exp and ("at", "cat") in exp
    # verifier == DP on random strings
    rng = np.random.RandomState(5)
    pool = ["".join(rng.choice(list("abc"), rng.randint(0, 5)))
            for _ in range(40)]
    for a in pool:
        for b in pool:
            assert _edit_distance_leq1(a, b) == (dp(a, b) <= 1), (a, b)


def test_fair_share_waterfilling(ray_session):
    """Max-min fair allocation vs a brute-force level scan: scarce
    budget (level solve + leftover bonuses to first capped hosts),
    abundant budget (everyone gets full demand, no bonus), and
    budget < n_hosts (level 0, pure bonuses)."""
    import ray.data

    from engine.stages.aggs import fair_share

    demands = {"a": 10, "b": 3, "c": 7, "d": 10, "e": 1}

    def brute(budget):
        maxd = max(demands.values())
        level = max(
            L for L in range(0, maxd + 1)
            if sum(min(d, L) for d in demands.values()) <= budget
        ) if sum(demands.values()) > budget else maxd
        used = sum(min(d, level) for d in demands.values())
        leftover = budget - used if sum(demands.values()) > budget else 0
        capped = sorted(k for k, d in demands.items() if d > level)
        bonus = set(capped[:leftover])
        return {
            k: min(d, level) + (1 if k in bonus else 0)
            for k, d in demands.items()
        }

    t = pa.table({
        "host": pa.array(list(demands), pa.string()),
        "demand": pa.array(list(demands.values()), pa.int64()),
    })
    for budget in (20, 100, 3):
        got = (
            fair_share(
                ray.data.from_arrow(t).repartition(2),
                key_col="host", demand_col="demand", budget=budget,
            )
            .to_pandas()
            .set_index("host")["alloc"]
            .to_dict()
        )
        exp = brute(budget)
        assert got == exp, (budget, got, exp)
        assert sum(got.values()) == min(budget, sum(demands.values()))


def test_round5_session7_ops_empty_corpus(ray_session):
    """Zero-row hardening for the seventh-session operator batch: every
    new operator returns its TYPED empty (or correctly-empty) output on
    an empty input (zero-row blocks bypass map_batches; empty
    materialized datasets lose schemas — CLAUDE.md)."""
    import ray.data

    from engine.stages.aggs import (
        auto_date_histogram,
        cohort_retention,
        dispersion_stats,
        event_bigrams,
        fair_share,
        ip_prefix_agg,
        terms_error_bounds,
    )
    from engine.stages.diff import ivm_maintain
    from engine.stages.graph import bfs_hops, kcore, trustrank
    from engine.stages.join import fuzzy_join, outer_groupjoin
    from engine.stages.scan import prefix_sum, rollover_assign
    from engine.stages.search import boosting_search
    from engine.stages.text import fold_accents, sentence_stats

    empty_docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
                "title": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "demand": pa.array([], pa.int64()),
            }
        )
    )
    empty_events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_type": pa.array([], pa.string()),
                "event_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
            }
        )
    )
    empty_edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
            }
        )
    )
    empty_seeds = ray.data.from_arrow(
        pa.table({"node": pa.array([], pa.int64())})
    )
    one_seed = ray.data.from_arrow(
        pa.table({"node": pa.array([5], pa.int64())})
    )

    def rows(x):
        import pyarrow as _pa

        if isinstance(x, _pa.Table):
            return x.num_rows
        return x.count()

    assert rows(dispersion_stats(empty_docs, group_col="lang",
                                 value_col="n_chars")) == 0
    assert rows(terms_error_bounds(empty_docs)) == 0
    assert rows(auto_date_histogram(empty_events)) == 0
    assert rows(cohort_retention(empty_events)) == 0
    assert rows(event_bigrams(empty_events)) == 0
    assert rows(ip_prefix_agg(empty_docs)) == 0
    assert rows(fair_share(empty_docs, key_col="host",
                           demand_col="demand", budget=10)) == 0
    assert rows(ivm_maintain(empty_docs, empty_docs, empty_docs,
                             group_col="lang", value_col="n_chars")) == 0
    for gate in (2_000_000, 0):
        assert rows(kcore(empty_edges, driver_max_edges=gate)) == 0
        # seeds survive with hop 0 even on an empty graph
        bh = bfs_hops(empty_edges, one_seed, driver_max_edges=gate).to_pandas()
        assert bh["node"].tolist() == [5] and bh["hop"].tolist() == [0]
        assert rows(bfs_hops(empty_edges, empty_seeds,
                             driver_max_edges=gate)) == 0
    assert rows(trustrank(empty_edges, empty_seeds)) == 0
    tr = trustrank(empty_edges, one_seed).to_pandas()
    assert tr["node"].tolist() == [5] and abs(tr["rank"].sum() - 1.0) < 1e-12
    assert rows(fuzzy_join(empty_docs, text_col="title")) == 0
    assert rows(outer_groupjoin(empty_docs, empty_docs, key_col="doc_id",
                                right_value_col="n_chars")) == 0
    assert rows(prefix_sum(empty_docs, key_col="doc_id",
                           value_col="n_chars")) == 0
    assert rows(rollover_assign(empty_docs)) == 0
    assert rows(boosting_search(empty_docs, ["a"], ["b"])) == 0
    assert rows(sentence_stats(empty_docs)) == 0
    assert rows(fold_accents(empty_docs)) == 0


def test_jsonld_blocks_edges(ray_session):
    """JSON-LD extraction edges: block in BODY, type attr case/space
    tolerant, @type list takes the first element, non-dict JSON and
    array-wrapped payloads dropped, javascript decoys never returned."""
    import ray.data

    from engine.html_extract import HTMLTree, get_jsonld_blocks
    from engine.stages.htmlmeta import jsonld_types

    html = (
        "<html><head>"
        '<script type=" Application/LD+JSON ">{"@type":["Movie","x"],'
        '"position":4}</script>'
        '<script type="text/javascript">{"@type":"Fake"}</script>'
        "</head><body>"
        '<script type="application/ld+json">[1,2,3]</script>'
        '<script type="application/ld+json">{"@type":"Book","position":1,'
        '"isbn":"0"}</script>'
        "</body></html>"
    )
    blocks = get_jsonld_blocks(HTMLTree.parse(html))
    assert len(blocks) == 3  # decoy excluded; array block still a BLOCK
    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "html": pa.array([html], pa.string()),
    })
    got = (
        jsonld_types(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("ld_type")
        .reset_index(drop=True)
    )
    # array payload dropped (not a dict); Movie list-@type takes first
    assert got["ld_type"].tolist() == ["Book", "Movie"]
    assert got["n_keys"].tolist() == [3, 2]
    assert got["position"].tolist() == [1, 4]


def test_feed_and_srcset_edges(ray_session):
    """parse_feed: Atom self/alternate link attr order tolerance, CDATA-
    free broken feeds, linkless entries dropped; image_srcset: width
    descriptor beats bare src on dedup, malformed width falls back to
    -1, empty srcset tolerated."""
    from engine.stages.sitemaps import parse_feed

    rss = (
        "<rss><channel><item><link> https://a/1 </link>"
        "<pubDate>X</pubDate></item>"
        "<item><guid>g</guid></item></channel></rss>"
    )
    rows = parse_feed(rss)
    assert rows == [{"url": "https://a/1", "published": "X", "is_atom": 0}]
    atom = (
        '<feed><entry><link rel="alternate" href="https://a/2"/>'
        "<published>P</published></entry></feed>"
    )
    assert parse_feed(atom) == [
        {"url": "https://a/2", "published": "P", "is_atom": 1}
    ]
    assert parse_feed("") == [] and parse_feed("<rss>junk") == []

    import ray.data

    from engine.stages.htmlmeta import image_srcset

    html = (
        '<html><body><img src="a.jpg" srcset="a.jpg 640w, b.jpg bogus,'
        ' c.jpg 2x"><img src=""></body></html>'
    )
    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "html": pa.array([html], pa.string()),
    })
    got = image_srcset(ray.data.from_arrow(t)).to_pandas()
    m = dict(zip(got["img_url"], got["width"]))
    assert m == {"a.jpg": 640, "b.jpg": -1, "c.jpg": -1}


def test_setsim_join_complete_vs_bruteforce(ray_session):
    """PPJoin prefix filter is COMPLETE: distributed result == the
    quadratic brute force on random small token sets at tau 0.5 and
    0.8 (prefix lengths differ per tau), including duplicate token
    lists, singletons, and empty sets (dropped)."""
    import itertools

    import ray.data

    from engine.stages.join import setsim_join

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(60):
        k = rng.randint(0, 6)
        rows.append((i, sorted(rng.choice(vocab, k, replace=False).tolist())))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "tk": pa.array([r[1] for r in rows], pa.list_(pa.string())),
    })
    for tn, td in ((1, 2), (4, 5)):
        got = (
            setsim_join(
                ray.data.from_arrow(t).repartition(4),
                id_col="doc_id", tokens_col="tk",
                tau_num=tn, tau_den=td,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        exp = []
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
            A, B = set(sa), set(sb)
            if not A or not B:
                continue
            inter = len(A & B)
            uni = len(A | B)
            if td * inter >= tn * uni:
                exp.append((ia, ib, inter, uni))
        exp.sort()
        assert [tuple(r) for r in got.itertuples(index=False)] == exp, (tn, td)


def test_homoglyph_hosts_edges(ray_session):
    """Skeleton detection: mixed Cyrillic/Greek spoofs cluster with the
    ASCII original, pure-ASCII distinct hosts never cluster, a spoof
    WITHOUT its ASCII original still clusters when two spoof variants
    collide, and is_ascii flags the legitimate member."""
    import ray.data

    from engine.stages.urlfilter import homoglyph_hosts

    hosts = [
        "paypal.com", "раypal.com",          # Cyrillic р,а spoof
        "google.com",                          # singleton -> dropped
        "bank.example", "bаnk.example", "bαnk.example",  # two spoof variants
        "nеtflix.io", "netflix.io",
    ]
    t = pa.table({"host": pa.array(hosts, pa.string())})
    got = (
        homoglyph_hosts(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values(["skeleton", "host"])
        .reset_index(drop=True)
    )
    assert "google.com" not in got["host"].tolist()
    grp = got[got["skeleton"] == "bank.example"]
    assert len(grp) == 3 and grp["n_hosts"].tolist() == [3, 3, 3]
    assert grp.set_index("host")["is_ascii"].to_dict() == {
        "bank.example": 1, "bаnk.example": 0, "bαnk.example": 0
    }
    assert set(got[got["skeleton"] == "paypal.com"]["host"]) == {
        "paypal.com", "раypal.com"
    }


def test_cohort_retention_huge_ids(ray_session):
    """The 2-column-unique fallback (user ids >= 2^43) produces the same
    retention cells as the packed-key fast path on equivalent data."""
    import ray.data

    from engine.stages.aggs import cohort_retention

    base = np.datetime64("2024-01-01T00:00:00", "us")
    days = np.array([0, 0, 1, 3, 0, 1, 1], np.int64)
    users_small = np.array([1, 1, 1, 1, 2, 2, 2], np.int64)
    HUGE = np.int64(1 << 50)
    for users in (users_small, users_small + HUGE):
        t = pa.table({
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(
                (base + (days * 86_400_000_000).astype("timedelta64[us]"))
            ),
        })
        got = (
            cohort_retention(ray.data.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values(["cohort_day", "offset_day"])
            .reset_index(drop=True)
        )
        # both users cohort at day 19723 (2024-01-01); user1 active at
        # +0,+1,+3; user2 at +0,+1 -> cells (0,2),(1,2),(3,1)
        assert got["offset_day"].tolist() == [0, 1, 3]
        assert got["n_users"].tolist() == [2, 2, 1]


def test_geo_distance_bbox_and_circle(ray_session):
    """bbox survivors outside the circle (the corner cases) are cut by
    the exact d2 test; nearest-first ordering with doc_id tiebreak;
    empty result keeps the typed schema."""
    import ray.data

    from engine.stages.search import geo_distance

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lat_u": pa.array([0, 9, 10, 100], pa.int64()),
        "lon_u": pa.array([0, 9, 0, 100], pa.int64()),
    })
    got = geo_distance(
        ray.data.from_arrow(t), center_lat_u=0, center_lon_u=0,
        radius_u=10, k=10,
    ).to_pandas()
    # doc 2 is inside the bbox (|9|<=10 both axes) but d2=162 > 100
    assert got["doc_id"].tolist() == [1, 3]
    assert got["d2"].tolist() == [0, 100]
    assert got["rank"].tolist() == [1, 2]
    empty = geo_distance(
        ray.data.from_arrow(t), center_lat_u=10**9, center_lon_u=10**9,
        radius_u=1, k=10,
    ).to_pandas()
    assert len(empty) == 0
