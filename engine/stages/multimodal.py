"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Two decode paths:

- ``fake=True``: deterministic pseudo-metadata from a blake2b of the
  payload — exercises the pipeline shape (schemas, batching, joins) for
  any mime type.
- ``fake=False``: REAL decoding for the container-less formats a stdlib +
  numpy environment can parse bit-exactly — uncompressed 24-bit BMP,
  binary PPM/PGM (P6/P5), and PCM WAV — yielding true dimensions/duration
  and a deterministic 16-dim content feature (documented layout below).
  Formats that require codec libraries (PNG/JPEG/MP4 — not in this
  container) raise ``NotImplementedError`` at decode time, clearly marked.

Feature layout (``feature_dim`` >= 16, trailing dims zero):
- image: [0:3] mean RGB / 255, [3:6] std RGB / 255, [6:14] 8-bin gray
  histogram (fractions), [14] w/h, [15] log2(w*h).
- audio: [0] mean, [1] std, [2] rms, [3] zero-crossing rate (over
  samples in [-1, 1]), [4:12] 8-bin |amplitude| histogram (fractions),
  [12] log2(sample_rate), [13] log2(n_samples + 1).
All in float32; byte-level oracle test in tests/test_stages.py.

Sizing note (memory-aware, per the build brief): binary payloads are large,
so these stages use SMALL batch sizes (default 32) and ``pyarrow`` batches
end-to-end — a 10 MB-mean image column at batch_size=1024 would put 10 GB
in one task's heap.
"""

from __future__ import annotations

import struct
from hashlib import blake2b
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),   # image | audio | video
        ("payload", pa.binary()),      # opaque encoded bytes
        ("mime", pa.string()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),
        ("width", pa.int32()),         # image/video; null for audio
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),   # audio/video; null for image
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # embedding-like feature vector
    ]
)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB.  Pure struct/numpy."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression}: only uncompressed "
            "24-bit BMP decodes without codec libraries"
        )
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_off + row * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8, count=row * h, offset=data_off)
    px = raw.reshape(h, row)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return px[::-1] if flip else px


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5), maxval <= 255 -> (h, w, 3) uint8 RGB."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    gray = payload[:2] == b"P5"
    # header: magic, width, height, maxval as ASCII tokens; '#' comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = w * h * (1 if gray else 3)
    if len(payload) < pos + n:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    if gray:
        return np.repeat(px.reshape(h, w, 1), 3, axis=2)
    return px.reshape(h, w, 3)


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """PCM WAV (8/16-bit) -> (samples float32 in [-1, 1] mono-mixed, rate)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits}: only 8/16-bit PCM "
            "decodes without codec libraries"
        )
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if channels > 1:
        s = s[: len(s) - len(s) % channels].reshape(-1, channels).mean(axis=1)
    return s, rate


def image_feature(px: np.ndarray, dim: int) -> np.ndarray:
    """(h, w, 3) uint8 -> float32 feature (layout in module docstring)."""
    f = np.zeros(dim, dtype=np.float32)
    pxf = px.astype(np.float32) / np.float32(255.0)
    f[0:3] = pxf.mean(axis=(0, 1))
    f[3:6] = pxf.std(axis=(0, 1))
    gray = pxf.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    f[6:14] = (hist / gray.size).astype(np.float32)
    h, w = px.shape[:2]
    f[14] = np.float32(w / h)
    f[15] = np.float32(np.log2(w * h))
    return f


def audio_feature(s: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """(n,) float32 samples -> float32 feature (layout in docstring)."""
    f = np.zeros(dim, dtype=np.float32)
    if len(s):
        f[0] = s.mean()
        f[1] = s.std()
        f[2] = np.sqrt(np.mean(s * s))
        f[3] = np.float32(np.count_nonzero(np.diff(np.signbit(s))) / len(s))
        hist, _ = np.histogram(np.abs(s), bins=8, range=(0.0, 1.0))
        f[4:12] = (hist / len(s)).astype(np.float32)
    f[12] = np.float32(np.log2(rate))
    f[13] = np.float32(np.log2(len(s) + 1))
    return f


class DecodeMedia:
    """Actor-pool stage: binary payload -> typed metadata + feature vector.

    ``__init__`` is where a real deployment loads the codec/model once per
    actor (PIL/ffmpeg/torchvision).  ``fake=True`` derives deterministic
    pseudo-metadata from a blake2b of the payload so the pipeline shape
    (schemas, batching, downstream joins) is exercisable for any mime;
    ``fake=False`` REALLY decodes BMP / PPM / PGM / PCM-WAV payloads
    (module-level stdlib parsers, byte-level oracle-tested) and raises
    NotImplementedError only for codec-requiring formats (PNG/JPEG/MP4 —
    libraries not in this environment; clearly marked stub).
    """

    def __init__(self, fake: bool = True, feature_dim: int = 16):
        self.fake = fake
        self.dim = feature_dim

    def _real_decode(self, media_id: str, mtype: str, payload: Optional[bytes]):
        p = payload or b""
        if p[:2] == b"BM":
            px = decode_bmp(p)
            h, w = px.shape[:2]
            return {
                "media_id": media_id,
                "media_type": mtype,
                "width": w,
                "height": h,
                "duration_ms": None,
                "n_frames": 1,
                "feature": image_feature(px, self.dim).tolist(),
            }
        if p[:2] in (b"P6", b"P5"):
            px = decode_ppm(p)
            h, w = px.shape[:2]
            return {
                "media_id": media_id,
                "media_type": mtype,
                "width": w,
                "height": h,
                "duration_ms": None,
                "n_frames": 1,
                "feature": image_feature(px, self.dim).tolist(),
            }
        if p[:4] == b"RIFF":
            s, rate = decode_wav(p)
            return {
                "media_id": media_id,
                "media_type": mtype,
                "width": None,
                "height": None,
                "duration_ms": int(round(len(s) / rate * 1000)),
                "n_frames": min(len(s), 2**31 - 1),
                "feature": audio_feature(s, rate, self.dim).tolist(),
            }
        raise NotImplementedError(
            "Real decode of this payload requires codec libraries "
            "(PIL/ffmpeg) not present in this environment; only BMP/PPM/"
            "PGM/PCM-WAV decode natively.  Construct with fake=True for "
            "pipeline-shape testing."
        )

    def _fake_decode(self, media_id: str, mtype: str, payload: Optional[bytes]):
        h = blake2b(payload or b"", digest_size=16).digest()
        rs = np.random.RandomState(int.from_bytes(h[:4], "big"))
        feat = rs.standard_normal(self.dim).astype(np.float32)
        is_img = mtype == "image"
        is_audio = mtype == "audio"
        return {
            "media_id": media_id,
            "media_type": mtype,
            "width": None if is_audio else 16 + h[4] % 240,
            "height": None if is_audio else 16 + h[5] % 240,
            "duration_ms": None if is_img else 1000 + int.from_bytes(h[6:8], "big"),
            "n_frames": 1 if is_img else 1 + h[8] % 64,
            "feature": feat.tolist(),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._fake_decode if self.fake else self._real_decode
        rows = [
            decode(m, t, p)
            for m, t, p in zip(
                batch.column("media_id").to_pylist(),
                batch.column("media_type").to_pylist(),
                batch.column("payload").to_pylist(),
            )
        ]
        cols = {
            f.name: pa.array([r[f.name] for r in rows], type=f.type)
            for f in FEATURE_SCHEMA
        }
        return pa.table(cols, schema=FEATURE_SCHEMA)


def decode_media_dataset(
    ds: ray.data.Dataset, *, fake: bool = True, batch_size: int = 32, concurrency=(1, 2)
) -> ray.data.Dataset:
    """Media table -> feature table via an actor pool with small batches."""
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs=dict(fake=fake),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed bottom-up 24-bit BMP bytes."""
    h, w = px.shape[:2]
    row = (w * 3 + 3) & ~3
    body = np.zeros((h, row), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6) bytes."""
    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def encode_wav(samples_i16: np.ndarray, rate: int) -> bytes:
    """(n,) int16 mono PCM -> WAV bytes."""
    data = samples_i16.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def synth_real_media_table(n: int = 48, seed: int = 13) -> pa.Table:
    """Deterministic media table whose payloads are VALID BMP / PPM / WAV
    files (decodable by the fake=False path end-to-end)."""
    rs = np.random.RandomState(seed)
    ids, tys, payloads, mimes = [], [], [], []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            w, h = int(rs.randint(4, 40)), int(rs.randint(4, 40))
            px = rs.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            ids.append(f"r{i:04d}"); tys.append("image")
            payloads.append(encode_bmp(px)); mimes.append("image/bmp")
        elif kind == 1:
            w, h = int(rs.randint(4, 40)), int(rs.randint(4, 40))
            px = rs.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            ids.append(f"r{i:04d}"); tys.append("image")
            payloads.append(encode_ppm(px)); mimes.append("image/x-portable-pixmap")
        else:
            rate = int(rs.choice([8000, 16000, 44100]))
            s = (rs.standard_normal(int(rs.randint(200, 4000))) * 8000).astype(np.int16)
            ids.append(f"r{i:04d}"); tys.append("audio")
            payloads.append(encode_wav(s, rate)); mimes.append("audio/wav")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(tys, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic fake media table for tests (binary payloads)."""
    rs = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    ids, tys, payloads, mimes = [], [], [], []
    for i in range(n):
        t = types[i % 3]
        ids.append(f"m{i:04d}")
        tys.append(t)
        payloads.append(rs.bytes(64 + int(rs.randint(0, 256))))
        mimes.append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[t])
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(tys, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )


def image_dhash(px: np.ndarray) -> int:
    """64-bit difference hash (dHash, public: Krawetz 2013) of an RGB
    image, integer-exact: grayscale by the luma integer weights
    (77R + 150G + 29B, the >> 8 fixed-point of Rec.601), box-downsample
    to a 9x8 grid of exact integer cell sums, then bit (r, c) = 1 iff
    cell (r, c) brighter than cell (r, c+1) — compared CROSS-MULTIPLIED
    by the cell areas so unequal grid cells never need a division.  Same
    bit order row-major, MSB first.  Deterministic for any input size
    >= 9x8 pixels is NOT required — any h, w >= 1 works (cells are
    [floor(k*h/8), floor((k+1)*h/8)) etc., empty cells impossible when
    h >= 8; for tiny images cells repeat rows/cols via the same floor
    grid, still deterministic)."""
    h, w, _ = px.shape
    lum = (
        77 * px[:, :, 0].astype(np.int64)
        + 150 * px[:, :, 1].astype(np.int64)
        + 29 * px[:, :, 2].astype(np.int64)
    )
    # exact 2-D prefix sums -> integer cell sums of the 8x9 grid
    P = np.zeros((h + 1, w + 1), np.int64)
    np.cumsum(np.cumsum(lum, axis=0), axis=1, out=P[1:, 1:])
    rb = [(k * h) // 8 for k in range(9)]
    cb = [(k * w) // 9 for k in range(10)]
    # guard degenerate tiny images: force non-empty cells by clamping
    rb = [min(max(v, i), h) for i, v in enumerate(rb[:-1])] + [h]
    cb = [min(max(v, i), w) for i, v in enumerate(cb[:-1])] + [w]
    bits = 0
    for r in range(8):
        r0, r1 = rb[r], rb[r + 1]
        if r1 <= r0:
            r0, r1 = min(r, h - 1), min(r, h - 1) + 1
        for c in range(8):
            c0, c1 = cb[c], cb[c + 1]
            c2, c3 = cb[c + 1], cb[c + 2]
            if c1 <= c0:
                c0, c1 = min(c, w - 1), min(c, w - 1) + 1
            if c3 <= c2:
                c2, c3 = min(c + 1, w - 1), min(c + 1, w - 1) + 1
            s1 = P[r1, c1] - P[r0, c1] - P[r1, c0] + P[r0, c0]
            a1 = (r1 - r0) * (c1 - c0)
            s2 = P[r1, c3] - P[r0, c3] - P[r1, c2] + P[r0, c2]
            a2 = (r1 - r0) * (c3 - c2)
            bits = (bits << 1) | (1 if int(s1) * a2 > int(s2) * a1 else 0)
    return bits


def image_phash_pairs(
    media: ray.data.Dataset,
    *,
    max_hamming: int = 3,
) -> pa.Table:
    """Near-duplicate image pairs by dHash — the multimodal analog of
    simhash text dedup: decode (BMP/PPM only — the honest-decode
    contract), 64-bit dHash per image, then 4x16-bit pigeonhole banding
    (hamming <= 3 across 64 bits leaves >= 1 of 4 bands IDENTICAL, so
    banding loses nothing at this threshold), all-pairs hamming inside
    each band bucket only, driver dedupe of the (tiny) pair set.
    Output ``(id_a, id_b, hamming)``, id_a < id_b, sorted.

    Per block: decode + hash per image (CPU-bound actor-pool candidate at
    scale); emit (band, key, media_id, hash64) — 4 small rows per image,
    never pixels.  The band groupby is the only shuffle.
    """
    from engine.stages.common import collect_arrow_blocks

    def hash_block(t: pa.Table) -> pa.Table:
        ids: List[str] = []
        hs: List[int] = []
        for mid, mime, payload in zip(
            t.column("media_id").to_pylist(),
            t.column("mime").to_pylist(),
            t.column("payload").to_pylist(),
        ):
            if payload is None:
                continue
            try:
                if mime == "image/bmp":
                    px = decode_bmp(payload)
                elif mime in ("image/x-portable-pixmap", "image/x-portable-graymap"):
                    px = decode_ppm(payload)
                else:
                    continue
            except (ValueError, NotImplementedError):
                continue
            ids.append(mid)
            hs.append(image_dhash(px))
        out_band: List[int] = []
        out_key: List[int] = []
        out_id: List[str] = []
        out_h: List[int] = []
        for mid, hv in zip(ids, hs):
            for b in range(4):
                out_band.append(b)
                out_key.append((hv >> (16 * b)) & 0xFFFF)
                out_id.append(mid)
                # store the 64-bit pattern in int64 (two's complement view)
                out_h.append(hv - (1 << 64) if hv >= (1 << 63) else hv)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int64()),
                "key": pa.array(out_key, pa.int64()),
                "media_id": pa.array(out_id, pa.string()),
                "h64": pa.array(out_h, pa.int64()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g.column("media_id").to_pylist()
        hs = g.column("h64").to_numpy(zero_copy_only=False).astype(np.int64)
        out_a: List[str] = []
        out_b: List[str] = []
        out_d: List[int] = []
        n = len(ids)
        for i in range(n):
            x = np.bitwise_xor(hs[i + 1 :], hs[i])
            d = np.array(
                [bin(int(v) & ((1 << 64) - 1)).count("1") for v in x], np.int64
            )
            for j in np.flatnonzero(d <= max_hamming):
                a, b = ids[i], ids[i + 1 + int(j)]
                if a > b:
                    a, b = b, a
                out_a.append(a)
                out_b.append(b)
                out_d.append(int(d[j]))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.string()),
                "id_b": pa.array(out_b, pa.string()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    hashed = media.map_batches(
        hash_block, batch_format="pyarrow", zero_copy_batch=True
    )
    return _banded_pairs(hashed, bucket_pairs)


def _banded_pairs(hashed: ray.data.Dataset, bucket_pairs) -> pa.Table:
    """Shared tail of the banded-hamming dedup family (image dHash, audio
    envelope hash): band-bucket groupby -> in-bucket all-pairs ->
    driver dedupe of the result-sized pair set, sorted (id_a, id_b)."""
    from engine.stages.common import collect_arrow_blocks

    pairs_ds = hashed.groupby(["band", "key"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    blocks = collect_arrow_blocks(pairs_ds, required_col="hamming")
    empty = pa.table(
        {
            "id_a": pa.array([], pa.string()),
            "id_b": pa.array([], pa.string()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    if not blocks:
        return empty
    import pyarrow.compute as pc

    allp = pa.concat_tables(
        [b.select(["id_a", "id_b", "hamming"]) for b in blocks],
        promote_options="default",
    )
    # a pair collides in up to 4 bands: dedupe on the driver (pair set is
    # result-sized by the banding gate)
    seen = set()
    keep = []
    for i, (a, b) in enumerate(
        zip(allp.column("id_a").to_pylist(), allp.column("id_b").to_pylist())
    ):
        if (a, b) not in seen:
            seen.add((a, b))
            keep.append(i)
    allp = allp.take(pa.array(keep, pa.int64()))
    return allp.take(
        pc.sort_indices(
            allp, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]
        )
    )


def audio_envelope_hash(samples: np.ndarray, *, n_frames: int = 65) -> int:
    """64-bit energy-envelope fingerprint of a PCM signal, integer-exact:
    the signal is cut into ``n_frames`` equal frames by the same floor
    grid as image_dhash's cells, each frame's energy is the exact int64
    sum of squared samples, and bit ``f`` = 1 iff frame ``f+1`` is louder
    than frame ``f`` CROSS-MULTIPLIED by the frame lengths (no division).
    GAIN-INVARIANT by construction (x -> g*x scales every energy by g^2,
    preserving all comparisons) — the time-domain analog of the
    Haitsma-Kalker sign-of-delta fingerprint, honest about not having an
    FFT's frequency selectivity (no scipy in this environment)."""
    n = len(samples)
    if n == 0:
        return 0
    if np.issubdtype(samples.dtype, np.floating):
        # decode_wav emits int16/32768.0 float32 — recover the exact
        # integers (float32 holds any int16/32768 exactly)
        x = np.round(samples.astype(np.float64) * 32768.0).astype(np.int64)
    else:
        x = samples.astype(np.int64)
    e2 = np.zeros(n + 1, np.int64)
    np.cumsum(x * x, out=e2[1:])
    b = [(k * n) // n_frames for k in range(n_frames + 1)]
    bits = 0
    for f in range(n_frames - 1):
        f0, f1, f2 = b[f], b[f + 1], b[f + 2]
        if f1 <= f0:
            f0, f1 = min(f, n - 1), min(f, n - 1) + 1
        if f2 <= f1:
            f2 = min(f1 + 1, n)
        e_a = int(e2[f1] - e2[f0])
        l_a = f1 - f0
        e_b = int(e2[f2] - e2[f1])
        l_b = max(f2 - f1, 1)
        bits = (bits << 1) | (1 if e_b * l_a > e_a * l_b else 0)
    return bits


def audio_phash_pairs(
    media: ray.data.Dataset,
    *,
    max_hamming: int = 3,
) -> pa.Table:
    """Near-duplicate audio pairs by the envelope fingerprint — the audio
    member of the banded-hamming dedup family (see image_phash_pairs):
    real PCM-WAV decode, 64-bit envelope hash, 4x16-bit pigeonhole
    banding (lossless at hamming <= 3), in-bucket all-pairs, driver
    dedupe.  Output ``(id_a, id_b, hamming)`` sorted."""

    def hash_block(t: pa.Table) -> pa.Table:
        out_band: List[int] = []
        out_key: List[int] = []
        out_id: List[str] = []
        out_h: List[int] = []
        for mid, mime, payload in zip(
            t.column("media_id").to_pylist(),
            t.column("mime").to_pylist(),
            t.column("payload").to_pylist(),
        ):
            if payload is None or mime not in ("audio/wav", "audio/x-wav"):
                continue
            try:
                samples, _rate = decode_wav(payload)
            except (ValueError, NotImplementedError):
                continue
            hv = audio_envelope_hash(samples)
            for b in range(4):
                out_band.append(b)
                out_key.append((hv >> (16 * b)) & 0xFFFF)
                out_id.append(mid)
                out_h.append(hv - (1 << 64) if hv >= (1 << 63) else hv)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int64()),
                "key": pa.array(out_key, pa.int64()),
                "media_id": pa.array(out_id, pa.string()),
                "h64": pa.array(out_h, pa.int64()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g.column("media_id").to_pylist()
        hs = g.column("h64").to_numpy(zero_copy_only=False).astype(np.int64)
        out_a: List[str] = []
        out_b: List[str] = []
        out_d: List[int] = []
        for i in range(len(ids)):
            x = np.bitwise_xor(hs[i + 1 :], hs[i])
            d = np.array(
                [bin(int(v) & ((1 << 64) - 1)).count("1") for v in x], np.int64
            )
            for j in np.flatnonzero(d <= max_hamming):
                a, b = ids[i], ids[i + 1 + int(j)]
                if a > b:
                    a, b = b, a
                out_a.append(a)
                out_b.append(b)
                out_d.append(int(d[j]))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.string()),
                "id_b": pa.array(out_b, pa.string()),
                "hamming": pa.array(out_d, pa.int64()),
            }
        )

    hashed = media.map_batches(
        hash_block, batch_format="pyarrow", zero_copy_batch=True
    )
    return _banded_pairs(hashed, bucket_pairs)


# ---------------------------------------------------------------------------
# video: YUV4MPEG2 (y4m) container + frame sampling; image: exact box resize
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    luma_frames: np.ndarray,
    *,
    fps: Tuple[int, int] = (25, 1),
    colorspace: str = "mono",
) -> bytes:
    """Encode luma frames (n, h, w uint8) as a valid YUV4MPEG2 stream
    (public format: the mjpegtools/ffmpeg uncompressed interchange
    container).  ``mono`` writes Cmono planes; ``420`` writes C420jpeg
    with neutral (128) chroma."""
    n, h, w = luma_frames.shape
    cs = {"mono": b"Cmono", "420": b"C420jpeg"}[colorspace]
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (
        w, h, fps[0], fps[1], cs,
    )
    out = [head]
    chroma = bytes([128]) * ((w // 2) * (h // 2)) if colorspace == "420" else b""
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(luma_frames[f].astype(np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> Tuple[np.ndarray, int, int, int, int]:
    """Parse a YUV4MPEG2 stream; returns (luma [n, h, w] uint8, w, h,
    fps_num, fps_den).  Supports C420*, C422, C444 and Cmono; chroma
    planes are skipped (features below need luma only).  Raises
    ValueError on malformed input — same contract as decode_bmp."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated y4m header")
    w = h = 0
    num, den = 25, 1
    cs = "420"
    for param in payload[len(_Y4M_MAGIC):nl].split(b" "):
        if not param:
            continue
        tag, val = param[:1], param[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            a, b = val.split(b":")
            num, den = int(a), int(b)
        elif tag == b"C":
            cs = val.decode("ascii", "replace")
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        raise ValueError("bad y4m geometry")
    if cs.startswith("420"):
        chroma = 2 * ((w // 2) * (h // 2))
    elif cs.startswith("422"):
        chroma = 2 * ((w // 2) * h)
    elif cs.startswith("444"):
        chroma = 2 * (w * h)
    elif cs.startswith("mono"):
        chroma = 0
    else:
        raise ValueError(f"unsupported y4m colorspace {cs!r}")
    luma_sz = w * h
    frames = []
    pos = nl + 1
    n_bytes = len(payload)
    while pos < n_bytes:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad y4m FRAME marker")
        pos = fnl + 1
        if pos + luma_sz + chroma > n_bytes:
            raise ValueError("truncated y4m frame")
        frames.append(
            np.frombuffer(payload, np.uint8, luma_sz, pos).reshape(h, w)
        )
        pos += luma_sz + chroma
    if not frames:
        raise ValueError("y4m stream has no frames")
    return np.stack(frames), w, h, num, den


def frame_sample_indices(n_frames: int, n_samples: int) -> List[int]:
    """Uniform sampling grid ``(i * n_frames) // n_samples`` (the same
    exact floor grid image_dhash/audio_envelope_hash use), deduplicated
    in order — short clips yield fewer than ``n_samples`` frames."""
    seen: List[int] = []
    for i in range(n_samples):
        k = (i * n_frames) // n_samples
        if not seen or k != seen[-1]:
            seen.append(k)
    return seen


def sample_video_frames(
    ds: "ray.data.Dataset",
    *,
    n_samples: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> "ray.data.Dataset":
    """Per video: decode the y4m container and emit one row per sampled
    frame — (media_id, frame_idx, n_frames, ts_ms, luma_sum,
    luma_mean_milli, frame_dhash).  Integer-exact: ``ts_ms = floor(1000
    * idx * den / num)`` via integer arithmetic, ``luma_mean_milli =
    floor(1000 * sum / (w*h))``, and the per-frame dHash reuses
    image_dhash on the gray frame stacked to RGB (77+150+29 = 256, so
    the luma weighting is a pure scale — bit-identical ordering).

    Shape: stateless ``map_batches`` flat expansion, output rows ∝
    videos × n_samples, payload bytes never leave the task.  Undecodable
    payloads are skipped (n_frames = -1 rows), mirroring
    decode_media_dataset's error policy."""
    out_schema = {
        id_col: pa.string(),
        "frame_idx": pa.int64(),
        "n_frames": pa.int64(),
        "ts_ms": pa.int64(),
        "luma_sum": pa.int64(),
        "luma_mean_milli": pa.int64(),
        "frame_dhash": pa.int64(),
    }

    def per_batch(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in out_schema}
        for mid, payload in zip(
            t.column(id_col).to_pylist(), t.column(payload_col).to_pylist()
        ):
            try:
                luma, w, h, num, den = decode_y4m(payload or b"")
            except ValueError:
                cols[id_col].append(mid)
                cols["frame_idx"].append(-1)
                cols["n_frames"].append(-1)
                cols["ts_ms"].append(-1)
                cols["luma_sum"].append(0)
                cols["luma_mean_milli"].append(0)
                cols["frame_dhash"].append(0)
                continue
            nf = luma.shape[0]
            area = w * h
            for idx in frame_sample_indices(nf, n_samples):
                fr = luma[idx]
                s = int(fr.astype(np.int64).sum())
                rgb = np.stack([fr, fr, fr], axis=-1)
                dh = image_dhash(rgb)
                cols[id_col].append(mid)
                cols["frame_idx"].append(idx)
                cols["n_frames"].append(nf)
                cols["ts_ms"].append((1000 * idx * den) // num)
                cols["luma_sum"].append(s)
                cols["luma_mean_milli"].append((1000 * s) // area)
                # mask to 63 bits: int64 keys stay on Arrow's native path
                cols["frame_dhash"].append(dh & ((1 << 63) - 1))
        return pa.table(
            {k: pa.array(v, typ) for (k, typ), v in
             zip(out_schema.items(), cols.values())}
        )

    return ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def resize_image_box(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Exact integer box resize: output pixel (i, j) is the per-channel
    ``sum // area`` over the source box ``[i*h//oh, max((i+1)*h//oh,
    i*h//oh + 1))`` (and likewise for columns) — the floor grid forces
    at least one source row/col per output pixel, so downscales are box
    averages and upscales degrade to nearest-neighbor, with no floats
    anywhere."""
    h, w, ch = px.shape
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize target must be positive")
    P = np.zeros((h + 1, w + 1, ch), np.int64)
    np.cumsum(np.cumsum(px.astype(np.int64), axis=0), axis=1, out=P[1:, 1:])
    r0 = np.array([(i * h) // out_h for i in range(out_h)], np.int64)
    r1 = np.maximum(
        np.array([((i + 1) * h) // out_h for i in range(out_h)], np.int64),
        r0 + 1,
    )
    c0 = np.array([(j * w) // out_w for j in range(out_w)], np.int64)
    c1 = np.maximum(
        np.array([((j + 1) * w) // out_w for j in range(out_w)], np.int64),
        c0 + 1,
    )
    sums = (
        P[r1][:, c1]
        - P[r0][:, c1]
        - P[r1][:, c0]
        + P[r0][:, c0]
    )
    areas = ((r1 - r0)[:, None] * (c1 - c0)[None, :])[:, :, None]
    return (sums // areas).astype(np.uint8)


def resize_images(
    ds: "ray.data.Dataset",
    *,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
) -> "ray.data.Dataset":
    """Decode BMP/PPM payloads, box-resize to (out_w, out_h), re-encode
    as PPM.  Output (media_id, in_w, in_h, out_w, out_h, px_sum,
    payload_out) — px_sum is the exact int64 pixel sum of the RESIZED
    image, the cheap cross-check a downstream stage can verify without
    re-decoding.  Stateless map_batches; bytes stay in the task;
    undecodable/non-image rows are skipped (in_w = -1)."""
    out_schema = {
        id_col: pa.string(),
        "in_w": pa.int64(),
        "in_h": pa.int64(),
        "out_w": pa.int64(),
        "out_h": pa.int64(),
        "px_sum": pa.int64(),
        "payload_out": pa.binary(),
    }

    def per_batch(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in out_schema}
        for mid, payload, mime in zip(
            t.column(id_col).to_pylist(),
            t.column(payload_col).to_pylist(),
            t.column(mime_col).to_pylist(),
        ):
            px = None
            try:
                if mime == "image/bmp":
                    px = decode_bmp(payload or b"")
                elif mime in ("image/x-portable-pixmap", "image/ppm"):
                    px = decode_ppm(payload or b"")
            except ValueError:
                px = None
            if px is None:
                cols[id_col].append(mid)
                cols["in_w"].append(-1)
                cols["in_h"].append(-1)
                cols["out_w"].append(out_w)
                cols["out_h"].append(out_h)
                cols["px_sum"].append(0)
                cols["payload_out"].append(b"")
                continue
            rz = resize_image_box(px, out_w, out_h)
            cols[id_col].append(mid)
            cols["in_w"].append(px.shape[1])
            cols["in_h"].append(px.shape[0])
            cols["out_w"].append(out_w)
            cols["out_h"].append(out_h)
            cols["px_sum"].append(int(rz.astype(np.int64).sum()))
            cols["payload_out"].append(encode_ppm(rz))
        return pa.table(
            {k: pa.array(v, typ) for (k, typ), v in
             zip(out_schema.items(), cols.values())}
        )

    return ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def synth_video_table(n: int = 24, seed: int = 29) -> pa.Table:
    """Deterministic y4m video corpus: mono and C420 streams with
    varying geometry, frame counts and fps, plus one malformed payload
    (the skip path)."""
    rs = np.random.RandomState(seed)
    ids, tys, payloads, mimes = [], [], [], []
    for i in range(n):
        if i == n - 1:
            ids.append(f"v{i:04d}")
            tys.append("video")
            payloads.append(b"NOT A VIDEO")
            mimes.append("video/x-yuv4mpeg")
            continue
        w = int(rs.randint(8, 33))
        h = int(rs.randint(8, 33))
        nf = int(rs.randint(1, 40))
        fps = (int(rs.choice([24, 25, 30])), 1)
        frames = rs.randint(0, 256, size=(nf, h, w)).astype(np.uint8)
        cs = "mono" if i % 2 == 0 else "420"
        ids.append(f"v{i:04d}")
        tys.append("video")
        payloads.append(encode_y4m(frames, fps=fps, colorspace=cs))
        mimes.append("video/x-yuv4mpeg")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(tys, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )
