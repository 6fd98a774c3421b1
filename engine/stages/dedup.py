"""Deduplication operators for training-data pipelines (first-class per the
build brief): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

All are Ray-Data-native: vectorized ``map_batches`` for per-doc signatures,
``groupby`` shuffles only on the *small* derived keys (hash / band / bucket),
never on raw text.  Shuffle cost analysis in each docstring.

Determinism: all hash seeds fixed; no Python ``hash``; candidate pairs are
emitted with doc_a < doc_b and outputs sorted by the caller.
"""

from __future__ import annotations

import logging
import re
from hashlib import blake2b, md5
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from engine.stages.common import as_arrow
from ray.data.aggregate import Count, Min

_TOKEN = re.compile(r"\S+")

_log = logging.getLogger("engine.dedup")

_PLANES_CACHE: Dict[Tuple[int, int], np.ndarray] = {}


def _hyperplanes(n_total: int, dim: int) -> np.ndarray:
    """Deterministic random-hyperplane matrix, generated once per worker
    process (not per batch) — fixed seed, keyed by shape."""
    key = (n_total, dim)
    p = _PLANES_CACHE.get(key)
    if p is None:
        p = np.random.RandomState(98765).standard_normal((n_total, dim))
        _PLANES_CACHE[key] = p
    return p


# Hot-bucket gate: above this many members, a single LSH bucket stops
# emitting all O(m^2) pairs and switches to the STAR pattern — every member
# paired with the bucket's min-id representative, O(m) pairs.  Rationale
# (100 TB): one pathological bucket of 10^6 boilerplate near-identicals
# would otherwise emit ~10^12 pairs inside ONE map_groups task.  The star
# keeps the bucket connected (sufficient for dedup / connected-components
# clustering) at the cost of not enumerating every intra-bucket edge;
# verification below the caller's threshold can drop star edges, in which
# case recall within that pathological bucket is partial — the switch is
# logged so the loss is visible, never silent.
_STAR_GATE = 4096


def _join_partitions(requested: int | None = None) -> int:
    """Join/shuffle partition count sized to the session.

    The native join spawns hash-shuffle aggregator actors per operator;
    chaining several joins with num_partitions >= session CPUs deadlocks
    the streaming executor on small sessions (same failure mode as the
    fixed-actor-pool rule in CLAUDE.md — measured: 3 chained 16-partition
    joins hang at 8 CPUs, run fine at cpus//2).  On a real cluster pass
    ``requested`` explicitly; partition count should scale with aggregate
    cores, not per-node.
    """
    if requested is not None:
        return requested
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(2, min(64, cpus // 2))

# Fixed MinHash parameters (Broder'97 resemblance estimation).
# Universal hashing over the Mersenne prime 2^31-1: with a,b,x < 2^31 the
# product a*x < 2^62 fits a uint64 EXACTLY — a 2^61-1 modulus would silently
# wrap the product mod 2^64 first and void the universality guarantee.
_N_PERM = 64
_LSH_BANDS = 16
_ROWS_PER_BAND = _N_PERM // _LSH_BANDS
_MERSENNE = (1 << 31) - 1
_rs = np.random.RandomState(0xC0FFEE)
_PERM_A = _rs.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rs.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64).astype(np.uint64)


def _hash_grams(grams) -> np.ndarray:
    hs = np.fromiter(
        (
            int.from_bytes(blake2b(g.encode(), digest_size=8).digest(), "big")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )
    return np.unique(hs)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64, deduped)."""
    toks = _TOKEN.findall(text or "")
    if len(toks) < k:
        base = toks if toks else [""]
        grams = [" ".join(base)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return _hash_grams(grams)


def _char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Character k-gram shingle hashes over the whitespace-normalized text
    (uint64, deduped) — finer-grained than word shingles: robust to
    punctuation/word-boundary edits that break word k-grams."""
    norm = " ".join(_TOKEN.findall(text or ""))
    if len(norm) < k:
        grams = [norm]
    else:
        grams = [norm[i : i + k] for i in range(len(norm) - k + 1)]
    return _hash_grams(grams)


def minhash_signature(text: str, k: int = 3, shingle_fn=None) -> np.ndarray:
    """64-perm MinHash signature via exact universal hashing ((a*x+b) mod
    2^31-1; all intermediates fit uint64 — see module constants).

    ``shingle_fn(text, k)`` defaults to word k-gram shingles (_shingles);
    pass _char_shingles for character-level resemblance."""
    sh = (shingle_fn or _shingles)(text, k) % np.uint64(_MERSENNE)
    # (n_perm, n_shingles) is fine: shingle counts are bounded by doc length.
    vals = (_PERM_A[:, None] * sh[None, :] + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1).astype(np.uint64)


def content_md5_batch(texts) -> List[str]:
    """THE exact-dedup content hash (md5 of the raw utf-8 text; '' for
    null) — exact_dedup / dedup_keep_first / dedup_keep_best and the
    dedup_report monitoring view must all share this definition, or the
    report silently diverges from the operator it monitors."""
    return [md5((x or "").encode()).hexdigest() for x in texts]


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact dedup: md5 content hash -> hash-partitioned group -> first id.

    Shuffle moves only (hash, id) pairs, never text (SURVEY.md §2.6 A6
    batch-dedup pattern).  Output: (h, doc_id=min id, n_dups=count).
    """

    def add_hash(t: pa.Table) -> pa.Table:
        hs = content_md5_batch(t.column(text_col).to_pylist())
        return pa.table({
            "h": pa.array(hs, pa.string()),
            id_col: t.column(id_col),
        })

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return hashed.groupby("h").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )


def dedup_keep_first(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: Tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Materialize the DEDUPLICATED corpus: keep the min-id row per exact
    content hash (the standard keep-first policy on top of exact_dedup).

    Shuffle moves (hash, id, *carry) — never the text: the content hash is
    computed per batch, the text column is dropped before the groupby, and
    the winner row is picked inside map_groups.  Output columns:
    (id_col, *carry_cols).
    """

    def hash_and_strip(t: pa.Table) -> pa.Table:
        hs = content_md5_batch(t.column(text_col).to_pylist())
        cols = {"h": pa.array(hs, pa.string()), id_col: t.column(id_col)}
        for c in carry_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    def first(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(id_col, kind="mergesort")
            .head(1)
            .drop(columns=["h"])
        )

    return (
        ds.map_batches(hash_and_strip, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("h")
        .map_groups(first, batch_format="pandas")
    )


def dedup_keep_best(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "n_chars",
    carry_cols: Tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Keep the BEST row per exact content hash — max ``score_col``,
    ties broken by min id (a total order, so the winner is
    partitioning-independent).  The keep-most-complete / keep-highest-
    quality alternative to ``dedup_keep_first``: e.g. among mirrored
    copies of a page, keep the one the quality model scores highest.

    Same scale shape as keep-first (hash computed map-side, text dropped
    at the stage boundary, the shuffle moves (hash, id, score, *carry)
    rows), plus a per-BLOCK argmax pre-aggregation so each block forwards
    at most one candidate per hash — the combiner the keep-first policy
    doesn't need but an argmax does for hot hashes (one viral page
    duplicated across the crawl).  Output: (id_col, score_col,
    *carry_cols)."""

    def hash_and_strip(t: pa.Table) -> pa.Table:
        hs = content_md5_batch(t.column(text_col).to_pylist())
        cols = {
            "h": pa.array(hs, pa.string()),
            id_col: t.column(id_col),
            score_col: t.column(score_col),
        }
        for c in carry_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    def block_best(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([score_col, id_col], ascending=[False, True],
                           kind="mergesort")
            .groupby("h", sort=False)
            .head(1)
        )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([score_col, id_col], ascending=[False, True],
                           kind="mergesort")
            .head(1)
            .drop(columns=["h"])
        )

    return (
        as_arrow(
            ds.map_batches(
                hash_and_strip, batch_format="pyarrow", zero_copy_batch=True
            ).map_batches(block_best, batch_format="pandas")
        )
        .groupby("h")
        .map_groups(best, batch_format="pandas")
    )


class MinHashStage:
    """Per-doc MinHash -> flat (band, band_hash, doc_id) rows for LSH."""

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 3,
        shingle_fn=None,
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.shingle_fn = shingle_fn or _shingles

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: List = []
        bands: List[int] = []
        bhash: List[int] = []
        for i, txt in zip(
            batch.column(self.id_col).to_pylist(), batch.column(self.text_col).to_pylist()
        ):
            sig = minhash_signature(txt, self.k, self.shingle_fn)
            for b in range(_LSH_BANDS):
                chunk = sig[b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
                # 63-bit key: int64 keeps Ray's groupby/sort on the native
                # Arrow path (uint64 keys fall back to pickled objects)
                h = (
                    int.from_bytes(blake2b(chunk.tobytes(), digest_size=8).digest(), "big")
                    & 0x7FFFFFFFFFFFFFFF
                )
                ids.append(i)
                bands.append(b)
                bhash.append(h)
        return pa.table(
            {
                # int64 (not int32): groupby aggregates promote keys to
                # int64 and the native join requires exact type equality
                "band": pa.array(bands, pa.int64()),
                "band_hash": pa.array(bhash, pa.int64()),
                "doc_id": pa.array(ids),
            }
        )


def _bucket_pairs(df: pd.DataFrame, max_bucket: int = _STAR_GATE) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket (doc_a < doc_b).

    Buckets larger than ``max_bucket`` emit the star pattern (min-id
    representative x every member, O(m)) instead of all O(m^2) pairs —
    see _STAR_GATE.
    """
    ids = df["doc_id"].sort_values(kind="mergesort").reset_index(drop=True)
    m = len(ids)
    dt = ids.dtype
    if m > max_bucket:
        _log.warning(
            "LSH bucket of %d members exceeds gate %d: emitting star "
            "pattern (%d pairs) instead of %d all-pairs",
            m, max_bucket, m - 1, m * (m - 1) // 2,
        )
        a = ids.iloc[np.zeros(m - 1, dtype=np.int64)].reset_index(drop=True)
        b = ids.iloc[1:].reset_index(drop=True)
    else:
        iu, ju = np.triu_indices(m, k=1)
        a = ids.iloc[iu].reset_index(drop=True)
        b = ids.iloc[ju].reset_index(drop=True)
    return pd.DataFrame({"doc_a": a.astype(dt), "doc_b": b.astype(dt)})


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    texts: ray.data.Dataset | None = None,
    num_partitions: int | None = None,
    broadcast_hot_max: int = 1_000_000,
    broadcast_pairs_max: int = 100_000,
    max_bucket: int = _STAR_GATE,
    shingle_fn=None,
) -> ray.data.Dataset:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification.

    No corpus-proportional driver or broadcast state anywhere:

    1. shingle->minhash per batch -> explode to (band, band_hash, doc_id).
    2. hot buckets: groupby + Count, ``n >= 2`` filtered in a map_batches
       stage — the full band aggregate never touches the driver.
    3. colliding band rows: semi-join of bands against the hot-key set.
       Size-gated hybrid (the crawl pipeline's budget-bounded pattern):
       when the COLLISION key set is small (<= broadcast_hot_max, the
       common case — collisions are rare by construction) the keys are
       broadcast and filtered in a task stage; above the gate it falls
       back to the native hash join.  Broadcast state is O(collisions),
       never O(corpus); measured: each native join costs ~2-4 s of
       aggregator-actor spin-up, which dominates small/medium corpora.
    4. pairwise candidates inside each colliding bucket, deduped with a
       groupby Count.  Buckets above ``max_bucket`` members emit the
       O(m) star pattern instead of O(m^2) all-pairs (see _STAR_GATE) —
       a 10^6-member boilerplate bucket stays bounded.
    5. exact-Jaccard verification: texts for the candidate doc ids are
       fetched with the same gated pattern — small candidate sets
       broadcast the ID set, semi-join the text table in a task stage and
       broadcast only the CANDIDATE texts; large ones hash-join the pair
       list against the text table twice (doc_a -> text_a, doc_b ->
       text_b).  Driver/broadcast state is O(candidates x text), shuffle
       volume O(candidate pairs x text size).

    ``texts`` defaults to ``ds`` itself (only ``id_col``/``text_col`` are
    read).  Output: (doc_a, doc_b, jaccard), jaccard rounded float64.
    """
    import pyarrow.compute as pc

    shingle_fn = shingle_fn or _shingles
    num_partitions = _join_partitions(num_partitions)
    bands = ds.map_batches(
        MinHashStage(text_col=text_col, id_col=id_col, k=k, shingle_fn=shingle_fn),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # consumed twice (hot aggregate + semi-join); band rows are small
    # derived keys (docs x bands), never raw text
    bands = bands.materialize()

    if bands.count() == 0:
        # empty/too-short corpus: a block-less materialized dataset has no
        # schema, so the band groupby below would KeyError — typed early
        # exit (CLAUDE.md zero-row rule).  The input may itself be
        # schema-less (e.g. a filter kept nothing), hence the fallback.
        try:
            from engine.stages.join import _arrow_types

            id_type = _arrow_types(ds).get(id_col, pa.int64())
        except Exception:
            id_type = pa.int64()
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], id_type),
                    "doc_b": pa.array([], id_type),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    # Almost every LSH bucket is a singleton; running a Python map_groups
    # call per bucket dominates wall time.  Find colliding buckets with a
    # vectorized hash aggregate first, filter n >= 2 DISTRIBUTED.
    hot = bands.groupby(["band", "band_hash"]).aggregate(Count(alias_name="n"))
    hot_keys = hot.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), 2)).select(
            ["band", "band_hash"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if hot_keys.count() <= broadcast_hot_max:
        hot_t = pa.concat_tables(
            ray.get(hot_keys.to_arrow_refs()), promote_options="default"
        )
        hot_ref = ray.put(
            set(
                zip(
                    hot_t.column("band").to_pylist(),
                    hot_t.column("band_hash").to_pylist(),
                )
            )
        )

        def keep_hot(t: pa.Table, ref=hot_ref) -> pa.Table:
            keys = ray.get(ref)
            mask = [
                (b, h) in keys
                for b, h in zip(
                    t.column("band").to_pylist(), t.column("band_hash").to_pylist()
                )
            ]
            return t.filter(pa.array(mask))

        colliding = bands.map_batches(
            keep_hot, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        colliding = bands.join(
            hot_keys,
            join_type="inner",
            num_partitions=num_partitions,
            on=("band", "band_hash"),
        )

    from functools import partial

    cand = colliding.groupby(["band", "band_hash"]).map_groups(
        partial(_bucket_pairs, max_bucket=max_bucket), batch_format="pandas"
    )
    # Arrow-convert the pandas map_groups blocks BEFORE the next shuffle
    # (pandas-block groupby is ~20x slower; PERF.md #31)
    uniq = as_arrow(cand).groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands")
    ).materialize()

    if uniq.count() == 0:
        # zero candidates: a block-less materialized dataset has no schema,
        # so downstream joins/collects would fail — return a typed empty
        from engine.stages.join import _arrow_types

        id_type = _arrow_types(ds).get(id_col, pa.int64())
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], id_type),
                    "doc_b": pa.array([], id_type),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )

    if texts is None:
        texts = ds
    texts = texts.map_batches(
        lambda t: t.select([id_col, text_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _jaccard_rows(das, dbs, tas, tbs):
        ja, keep_a, keep_b = [], [], []
        # per-batch shingle cache: candidate pairs share docs heavily
        # (every pair re-derives both sides), so memoizing by doc id cuts
        # shingle computations from 2x pairs to <= distinct docs per batch
        cache: dict = {}

        def sh(d, txt):
            s = cache.get(d)
            if s is None:
                s = shingle_fn(txt, k)
                cache[d] = s
            return s

        for da, db, ta, tb in zip(das, dbs, tas, tbs):
            sa, sb = sh(da, ta), sh(db, tb)
            inter = len(np.intersect1d(sa, sb))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                keep_a.append(da)
                keep_b.append(db)
                ja.append(round(j, 6))
        return keep_a, keep_b, ja

    if uniq.count() * 2 <= broadcast_pairs_max:
        # small path: broadcast the candidate ID set, semi-join the text
        # table in a task stage, broadcast only the candidate texts
        uniq_t = pa.concat_tables(
            ray.get(uniq.to_arrow_refs()), promote_options="default"
        )
        cand_ids = set(uniq_t.column("doc_a").to_pylist()) | set(
            uniq_t.column("doc_b").to_pylist()
        )
        ids_ref = ray.put(cand_ids)

        def keep_cand(t: pa.Table, ref=ids_ref) -> pa.Table:
            ids = ray.get(ref)
            mask = [i in ids for i in t.column(id_col).to_pylist()]
            return t.filter(pa.array(mask))

        cand_texts = texts.map_batches(
            keep_cand, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        ct = pa.concat_tables(
            ray.get(cand_texts.to_arrow_refs()), promote_options="default"
        )
        texts_ref = ray.put(
            dict(zip(ct.column(id_col).to_pylist(), ct.column(text_col).to_pylist()))
        )

        def verify_small(t: pa.Table, ref=texts_ref) -> pa.Table:
            lookup = ray.get(ref)
            das = t.column("doc_a").to_pylist()
            dbs = t.column("doc_b").to_pylist()
            missing = [d for d in das + dbs if d not in lookup]
            if missing:
                raise KeyError(
                    f"minhash_lsh_pairs: texts table is missing candidate "
                    f"doc ids {missing[:5]!r} — every id in `ds` must "
                    f"appear in `texts`"
                )
            keep_a, keep_b, ja = _jaccard_rows(
                das, dbs, [lookup[d] for d in das], [lookup[d] for d in dbs]
            )
            return pa.table(
                {
                    "doc_a": pa.array(keep_a, t.column("doc_a").type),
                    "doc_b": pa.array(keep_b, t.column("doc_b").type),
                    "jaccard": pa.array(ja, pa.float64()),
                }
            )

        return uniq.map_batches(verify_small, batch_format="pyarrow")

    # scale path: two native hash joins pull each side's text next to the
    # pair row; nothing corpus-sized is ever broadcast or collected
    def _rename(t: pa.Table, old: str, new: str, drop) -> pa.Table:
        t = t.drop_columns([c for c in drop if c in t.column_names])
        names = [new if c == old else c for c in t.column_names]
        return t.rename_columns(names)

    with_a = uniq.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=(id_col,),
    ).map_batches(
        lambda t: _rename(t, text_col, "text_a", [id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    with_b = with_a.join(
        texts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=(id_col,),
    ).map_batches(
        lambda t: _rename(t, text_col, "text_b", [id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    # inner joins silently DROP pairs whose ids are absent from `texts`;
    # fail loudly instead (mirrors the broadcast path's KeyError)
    n_joined = with_b.count()
    n_pairs = uniq.count()
    if n_joined != n_pairs:
        raise KeyError(
            f"minhash_lsh_pairs: text join produced {n_joined} rows for "
            f"{n_pairs} candidate pairs — `texts` must contain exactly one "
            f"row per candidate doc id (missing ids drop pairs, duplicate "
            f"ids multiply them)"
        )

    def verify(t: pa.Table) -> pa.Table:
        keep_a, keep_b, ja = _jaccard_rows(
            t.column("doc_a").to_pylist(),
            t.column("doc_b").to_pylist(),
            t.column("text_a").to_pylist(),
            t.column("text_b").to_pylist(),
        )
        return pa.table(
            {
                "doc_a": pa.array(keep_a, t.column("doc_a").type),
                "doc_b": pa.array(keep_b, t.column("doc_b").type),
                "jaccard": pa.array(ja, pa.float64()),
            }
        )

    return with_b.map_batches(verify, batch_format="pyarrow")


class SimHashStage:
    """64-bit SimHash (Charikar'02) per doc over token hashes.

    Output column ``simhash`` as fixed-width hex string (portable across
    engines that lack uint64).
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    _POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for txt in batch.column(self.text_col).to_pylist():
            toks = _TOKEN.findall(txt or "")
            if not toks:
                out.append(f"{0:016x}")
                continue
            # Vectorized kernel: hash UNIQUE tokens once (blake2b is the
            # only per-item Python call left), expand the uint64 hashes to
            # a (n_uniq, 64) bit matrix in one unpackbits, then weight by
            # occurrence counts — acc[bit] = 2*set_count - n_tokens, so
            # the output bit is set iff 2*set_count > n_tokens.  Exactly
            # the Charikar +1/-1 accumulate, ~50x fewer numpy dispatches.
            uniq, counts = np.unique(toks, return_counts=True)
            hs = np.fromiter(
                (
                    int.from_bytes(blake2b(t.encode(), digest_size=8).digest(), "big")
                    for t in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            # little-endian host: byte 0 of the uint64 view is the LSByte,
            # so bitorder="little" puts bit i of the hash in column i
            bits = np.unpackbits(
                hs[:, None].view(np.uint8), axis=1, bitorder="little"
            ).astype(np.int64)
            set_cnt = counts.astype(np.int64) @ bits
            sim_bits = (2 * set_cnt) > len(toks)
            sim = int(sim_bits.astype(np.uint64) @ self._POW2)
            out.append(f"{sim:016x}")
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(out, pa.string()),
            }
        )


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = _STAR_GATE,
) -> ray.data.Dataset:
    """SimHash near-dup pairs: 64-bit fingerprints paired when their
    Hamming distance is <= ``max_hamming`` (Manku et al., WWW'07 table
    trick).  Buckets above ``max_bucket`` emit the O(m) star pattern
    (see _STAR_GATE).

    The fingerprint is split into 4 x 16-bit bands; any pair within
    Hamming distance 3 agrees EXACTLY on at least one band (pigeonhole),
    so a groupby on (band_no, band_value) generates all candidates with no
    all-pairs pass; the exact Hamming check runs inside the bucket.
    Shuffle moves (band_no, band_value, doc_id, simhash) — 4 small rows
    per doc, never text.  Output: (doc_a, doc_b, hamming), deduped across
    bands with a groupby Min.
    """
    st = SimHashStage(text_col=text_col, id_col=id_col)

    def bandize(t: pa.Table) -> pa.Table:
        sim_t = st(t)
        ids = sim_t.column(id_col).to_pylist()
        sims = [int(x, 16) for x in sim_t.column("simhash").to_pylist()]
        out_id, out_band, out_val, out_sim = [], [], [], []
        for i, s in zip(ids, sims):
            # simhash carried as int64 two's complement — keeps Arrow's
            # native groupby path; hamming is XOR-popcount, sign-agnostic
            s64 = s - (1 << 64) if s >= (1 << 63) else s
            for b in range(4):
                out_id.append(i)
                out_band.append(b)
                out_val.append((s >> (16 * b)) & 0xFFFF)
                out_sim.append(s64)
        return pa.table(
            {
                "band_no": pa.array(out_band, pa.int64()),
                "band_val": pa.array(out_val, pa.int64()),
                id_col: pa.array(out_id),
                "sim": pa.array(out_sim, pa.int64()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # a doc emits exactly one row per band_no, so ids are unique within
        # a bucket; drop_duplicates is defensive (identical rows carry
        # identical sims, so dropping is semantics-preserving)
        df = (
            df.drop_duplicates(subset=[id_col])
            .sort_values(id_col, kind="mergesort")
            .reset_index(drop=True)
        )
        m = len(df)
        dt = df[id_col].dtype
        if m < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=dt),
                    "doc_b": pd.Series([], dtype=dt),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        sims = df["sim"].to_numpy(np.int64).view(np.uint64)
        if m > max_bucket:
            _log.warning(
                "simhash bucket of %d members exceeds gate %d: star pattern",
                m, max_bucket,
            )
            iu = np.zeros(m - 1, dtype=np.int64)
            ju = np.arange(1, m, dtype=np.int64)
        else:
            iu, ju = np.triu_indices(m, k=1)
        keep_a, keep_b, keep_h = [], [], []
        # chunked XOR-popcount: bounds the (pairs x 64) unpackbits buffer
        for lo in range(0, len(iu), 1 << 20):
            ic, jc = iu[lo : lo + (1 << 20)], ju[lo : lo + (1 << 20)]
            x = sims[ic] ^ sims[jc]
            d = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(
                axis=1, dtype=np.int64
            )
            sel = d <= max_hamming
            keep_a.append(ic[sel])
            keep_b.append(jc[sel])
            keep_h.append(d[sel])
        ai = np.concatenate(keep_a)
        bi = np.concatenate(keep_b)
        ids = df[id_col]
        return pd.DataFrame(
            {
                "doc_a": ids.iloc[ai].reset_index(drop=True).astype(dt),
                "doc_b": ids.iloc[bi].reset_index(drop=True).astype(dt),
                "hamming": pd.Series(np.concatenate(keep_h), dtype="int64"),
            }
        )

    bands = ds.map_batches(bandize, batch_format="pyarrow", zero_copy_batch=True)
    cand = bands.groupby(["band_no", "band_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return as_arrow(cand).groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.2,
    texts: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """All-pairs CHARACTER n-gram Jaccard above threshold, LSH-pruned.

    Distinct from minhash_lsh_pairs: resemblance is over character k-grams
    of the whitespace-normalized text (_char_shingles) — robust to
    punctuation/word-boundary edits that break word shingles.  Same LSH
    machinery; recall for J>=0.2 at 16 bands x 4 rows is partial BY DESIGN
    (documented cap: candidate generation is approximate; exact all-pairs
    is O(n^2) and only used by tests at tiny scale).
    """
    return minhash_lsh_pairs(
        ds,
        text_col=text_col,
        id_col=id_col,
        k=k,
        threshold=threshold,
        texts=texts,
        shingle_fn=_char_shingles,
    )


def embedding_nn_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 8,
    max_bucket: int = _STAR_GATE,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup via multi-table random-hyperplane LSH.

    Standard (L tables x b hyperplanes) construction: per batch, normalize
    vectors and emit one (table_id, bucket) row per table; groupby the
    (table_id, bucket) key; within-bucket exact cosine; pairs >= threshold,
    deduped across tables with a groupby Max.  Recall for cosine c is
    1-(1-(1-acos(c)/pi)^b)^L — approximate BY DESIGN; exact comparisons use
    brute_force_topk.  Buckets above ``max_bucket`` emit the O(m) star
    pattern (see _STAR_GATE).  Output: (id_a, id_b, cos), cos rounded to
    6 decimals.
    """

    def bucketize(t: pa.Table) -> pa.Table:
        vecs = np.array(t.column(vec_col).to_pylist(), dtype=np.float64)
        n = np.linalg.norm(vecs, axis=1, keepdims=True)
        n[n == 0] = 1.0
        vn = vecs / n
        planes = _hyperplanes(n_tables * n_planes, vecs.shape[1])
        signs = (vn @ planes.T) > 0  # (rows, L*b)
        tids, buckets, ids, vcol = [], [], [], []
        raw_ids = t.column(id_col).to_pylist()
        raw_vecs = t.column(vec_col).to_pylist()
        for l in range(n_tables):
            chunk = signs[:, l * n_planes : (l + 1) * n_planes]
            b = np.zeros(len(vn), dtype=np.int64)
            for pbit in range(n_planes):
                b |= chunk[:, pbit].astype(np.int64) << pbit
            tids.extend([l] * len(vn))
            buckets.extend(b.tolist())
            ids.extend(raw_ids)
            vcol.extend(raw_vecs)
        return pa.table(
            {
                "table_id": pa.array(tids, pa.int32()),
                "bucket": pa.array(buckets, pa.int64()),
                id_col: pa.array(ids),
                vec_col: pa.array(vcol),
            }
        )

    def bucket_cosine(df: pd.DataFrame) -> pd.DataFrame:
        idt = df[id_col].dtype
        if len(df) < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=idt),
                    "id_b": pd.Series([], dtype=idt),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        df = df.sort_values(id_col).reset_index(drop=True)
        m = len(df)
        vecs = np.array(df[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = vecs / norms
        if m > max_bucket:
            _log.warning(
                "cosine LSH bucket of %d members exceeds gate %d: star pattern",
                m, max_bucket,
            )
            iu = np.zeros(m - 1, dtype=np.int64)
            ju = np.arange(1, m, dtype=np.int64)
            sim_vals = vn[1:] @ vn[0]
        else:
            iu, ju = np.triu_indices(m, k=1)
            sim_vals = (vn @ vn.T)[iu, ju]
        sel = sim_vals >= threshold
        ids = df[id_col]
        return pd.DataFrame(
            {
                "id_a": ids.iloc[iu[sel]].reset_index(drop=True).astype(idt),
                "id_b": ids.iloc[ju[sel]].reset_index(drop=True).astype(idt),
                # Python round (correctly-rounded), not np.round: keeps the
                # output bit-identical to the previous per-pair kernel; the
                # selected set is small so the comprehension is cheap
                "cos": pd.Series(
                    [round(float(x), 6) for x in sim_vals[sel]], dtype="float64"
                ),
            }
        )

    buckets = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = buckets.groupby(["table_id", "bucket"]).map_groups(
        bucket_cosine, batch_format="pandas"
    )
    from ray.data.aggregate import Max as _Max

    return as_arrow(pairs).groupby(["id_a", "id_b"]).aggregate(
        _Max("cos", alias_name="cos")
    )


def semdedup(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    lloyd_iters: int = 2,
    seed: int = 20240817,
    max_cluster: int = 100_000,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al., arXiv:2303.09540): k-means-cluster the
    embedding space, then drop near-duplicate members WITHIN each cluster
    by pairwise cosine — cross-cluster pairs are never scored, which is
    what makes the O(n^2) semantic-dedup idea tractable at corpus scale.

    Deviation from the paper's keep-farthest-from-centroid rule: keeps the
    LOWEST id of each near-dup set (greedy keep-first in id order) — the
    same deterministic tie-break every other dedup family here uses, so
    outputs are stable under any partitioning.

    Output: (id_col, cluster_id, kept) for every input row; filter
    kept==True for the surviving corpus.

    100-TB shape: centroids train via ann.train_centroids (per-batch
    partial sums, driver reduce over n_clusters rows); assignment is one
    stateless map; the only shuffle is groupby(cluster_id) carrying
    (id, vector) — pick n_clusters ~ n/target so a cluster (the paper
    uses n/10k..n/100k) fits one task; a cluster above ``max_cluster``
    degrades to star-vs-first scoring (the _STAR_GATE device) instead of
    the full gram matrix, keeping worst-case memory O(m*d)."""
    from engine.stages.ann import _normalize, train_centroids

    cent = train_centroids(
        ds, n_clusters, vec_col=vec_col, lloyd_iters=lloyd_iters, seed=seed
    )
    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = _normalize(np.array(t.column(vec_col).to_pylist(), dtype=np.float64))
        a = np.argmax(v @ c.T, axis=1) if len(v) else np.array([], dtype=np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster_id": pa.array(a.astype(np.int64), pa.int64()),
                vec_col: t.column(vec_col),
            }
        )

    def greedy(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col).reset_index(drop=True)
        m = len(df)
        vn = _normalize(np.array(df[vec_col].tolist(), dtype=np.float64))
        kept = np.zeros(m, dtype=bool)
        if m > max_cluster:
            # star gate: score everyone against the first (kept) member
            # only — recall loss bounded the same way _bucket_pairs' is
            kept[0] = True
            kept[1:] = vn[1:] @ vn[0] < threshold
        else:
            sims = vn @ vn.T
            for i in range(m):
                prior = kept[:i]
                kept[i] = not bool((sims[:i][prior, i] >= threshold).any())
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "cluster_id": df["cluster_id"].astype("int64"),
                "kept": pd.Series(kept, dtype="bool"),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    out = assigned.groupby("cluster_id").map_groups(greedy, batch_format="pandas")
    return as_arrow(out)


def _connected_components_driver(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Driver union-find over a gated-small symmetrized edge set; min-id
    representative per component — identical output to the distributed
    min-label propagation (both pinned to the union-find oracle test)."""
    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(edges)
    tbl = pa.concat_tables(blocks, promote_options="default")
    id_type = tbl.schema.field("src").type
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = codes[: len(src)], codes[len(src) :]
    parent = np.arange(len(nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(si.tolist(), di.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the MIN code as root: np.unique sorts, so min code
            # == min node id — the distributed path's cluster_id
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(len(nodes))])
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(nodes.tolist(), id_type),
                "cluster_id": pa.array(nodes[roots].tolist(), id_type),
            }
        )
    )


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
    num_partitions: int | None = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """Cluster near-duplicate pairs into components by iterative min-label
    propagation (the distributed-friendly alternative to driver union-find):

        label(v) <- min(label(v), min over neighbors(label(u)))

    Fully distributed: edges and labels stay Datasets end-to-end — per
    round, one hash-join (edges x labels on src) and one groupby(node).Min;
    the pair set is never driver-materialized or broadcast.  Converges in
    O(component diameter) rounds; near-dup components are shallow in
    practice.

    Convergence is detected without a per-round join: labels only ever
    decrease under Min-propagation, so the label multiset changes iff its
    deterministic fingerprint (sum of per-row splitmix64(node, label) mod
    2^64 — vectorized numpy for integer ids, blake2b fallback otherwise)
    changes — one cheap aggregate per round, dtype-agnostic.

    Output: (doc_id, cluster_id) where cluster_id is the component's
    minimum id, sorted by the caller.

    Size-gated driver fast path: a pair set below ``driver_max_edges``
    runs union-find on the driver — near-dup pair sets are duplicate-
    multiplicity sized (a clean corpus yields FEW pairs even at 100 TB),
    and each distributed propagation round costs seconds of join/groupby
    launch overhead to move a handful of rows.  Both paths produce the
    identical (doc_id, min-id cluster) output and are pinned against the
    same union-find oracle in tests.
    """
    from ray.data.aggregate import Min as _Min

    num_partitions = _join_partitions(num_partitions)

    def to_sym(t: pa.Table) -> pa.Table:
        a, b = t.column(a_col).combine_chunks(), t.column(b_col).combine_chunks()
        return pa.table(
            {
                "src": pa.chunked_array([a, b]),
                "dst": pa.chunked_array([b, a]),
            }
        )

    edges = pairs.map_batches(
        to_sym, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    n_edges = edges.count()
    if n_edges == 0:
        # block-less empty datasets have no schema; joins would fail
        from engine.stages.join import _arrow_types

        id_type = _arrow_types(pairs).get(a_col, pa.int64())
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], id_type),
                    "cluster_id": pa.array([], id_type),
                }
            )
        )
    if n_edges <= driver_max_edges:
        return _connected_components_driver(edges)

    # initial labels: label(v) = v, one row per distinct node
    labels = (
        edges.groupby("src")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"node": t.column("src"), "label": t.column("src")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    # acero hash joins fail ("No match for FieldRef") when a partition gets
    # zero rows on one side — even npart <= nodes can leave one empty via
    # hash skew.  Require >= 32 expected nodes per partition (the
    # graph.pagerank density guard); sparse pair sets (few near-dups in a
    # clean corpus) then run single-partition.
    num_partitions = max(1, min(num_partitions, labels.count() // 32))

    def _mix64(v: np.ndarray) -> np.ndarray:
        # splitmix64 finalizer, vectorized; uint64 arithmetic wraps mod 2^64
        v = v + np.uint64(0x9E3779B97F4A7C15)
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return v ^ (v >> np.uint64(31))

    def _fingerprint(lab: ray.data.Dataset) -> int:
        # Sum of per-row hashes mod 2^64 is partition-independent (addition
        # is commutative; per-block wrap + driver wrap = total mod 2^64
        # regardless of block boundaries).  Integer label types take the
        # vectorized splitmix64 path (the common case — one numpy pass per
        # block); anything else falls back to per-row blake2b.
        def fp(t: pa.Table) -> pa.Table:
            node = t.column("node").combine_chunks()
            label = t.column("label").combine_chunks()
            if pa.types.is_integer(node.type) and pa.types.is_integer(label.type):
                n = (
                    node.to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    .view(np.uint64)
                )
                l = (
                    label.to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    .view(np.uint64)
                )
                s = int(_mix64(n ^ _mix64(l)).sum(dtype=np.uint64))
            else:
                s = 0
                for n_, l_ in zip(node.to_pylist(), label.to_pylist()):
                    h = blake2b(f"{n_}|{l_}".encode(), digest_size=8).digest()
                    s += int.from_bytes(h, "big")
            return pa.table({"fp": pa.array([str(s)], pa.string())})

        parts = lab.map_batches(fp, batch_format="pyarrow").take_all()
        return sum(int(r["fp"]) for r in parts) & 0xFFFFFFFFFFFFFFFF

    prev_fp = _fingerprint(labels)
    for _ in range(max_iters):
        # candidate labels: each edge proposes src's label to dst, plus the
        # node's own current label (self-loop) so labels never regress
        prop = (
            edges.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("node",),
            )
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("dst"), "cand": t.column("label")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        own = labels.map_batches(
            lambda t: pa.table({"node": t.column("node"), "cand": t.column("label")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        labels = (
            prop.union(own)
            .groupby("node")
            .aggregate(_Min("cand", alias_name="cand"))
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "label": t.column("cand")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()  # cut lineage: round k must not re-run round k-1
        )
        fp = _fingerprint(labels)
        if fp == prev_fp:
            break
        prev_fp = fp

    return labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("node"), "cluster_id": t.column("label")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def tfidf_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 500,
    top_m: int = 8,
    threshold: float = 0.5,
    max_posting: int = 10_000,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT sparse all-pairs similarity join (Bayardo et al., WWW 2007
    family): every document pair whose tf-idf cosine over the capped
    sparse vectors meets ``threshold`` — ``(doc_a, doc_b, cos_ppm)``,
    doc_a < doc_b.  The exact counterpart of ``embedding_nn_pairs``'s
    LSH recall: pairs are found through the inverted index, so any pair
    sharing at least one indexed term is scored exactly (no hashing, no
    candidates missed modulo the documented posting cap).

    Vector: each doc's ``top_m`` tf-idf terms over the ``vocab_size``
    frequency-capped vocabulary (the tfidf_topk construction),
    L2-normalized over the KEPT terms, so the cosine is a plain dot
    product of sparse weights.

    Shape (no all-pairs scan, text never shuffles):
    1. one (token, df) shuffle caps the vocab; the idf map broadcasts;
    2. a stateless pass emits inverted-index rows (token, doc, weight) —
       <= top_m rows per doc;
    3. ONE coarse hash(token)-bucket groupby generates partial products
       (lo, hi, w_a*w_b) per co-occurring pair WITHIN each posting
       (vectorized outer products per token).  Posting lists longer than
       ``max_posting`` are DROPPED with a logged count — the Bayardo
       prefix-filtering insight degenerated to a df cap: ubiquitous
       terms have tiny idf weights and contribute noise pairs
       quadratically (the star-gate rationale);
    4. ONE coarse hash(doc_a, doc_b)-bucket groupby accumulates the dot
       products (a pair's key fixes its bucket, so the reduce is a
       vectorized in-bucket pandas sum — Ray's Aggregate operator's
       per-task overhead dominated at this volume); threshold filter
       inside the reduce.
    """
    import math
    from collections import Counter

    from engine.stages.common import collect_arrow_blocks
    from engine.stages.index_build import term_stats
    from engine.stages.text import _TOKEN, fnv1a_batch

    vocab_rows = collect_arrow_blocks(
        as_arrow(
            term_stats(ds, id_col=id_col, text_col=text_col, top_n=vocab_size)
        ),
        required_col="df",
    )
    n_docs = ds.count()
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "cos_ppm": pa.array([], pa.int64()),
        }
    )
    if n_docs == 0 or not vocab_rows:
        return ray.data.from_arrow(empty)
    vocab_t = pa.concat_tables(vocab_rows, promote_options="default")
    idf = {
        tok: math.log(float(n_docs) / float(df))
        for tok, df in zip(
            vocab_t.column("token").to_pylist(), vocab_t.column("df").to_pylist()
        )
    }
    idf_ref = ray.put(idf)

    def index_rows(t: pa.Table, ref=idf_ref) -> pa.Table:
        idf_map = ray.get(ref)
        out_tok, out_id, out_w = [], [], []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            cnt = Counter(tok for tok in _TOKEN.findall(txt or "") if tok in idf_map)
            scored = sorted(
                ((c * idf_map[tok], tok) for tok, c in cnt.items()),
                key=lambda x: (-x[0], x[1]),
            )[:top_m]
            norm = math.sqrt(sum(w * w for w, _ in scored))
            if norm <= 0:
                continue
            for w, tok in scored:
                out_tok.append(tok)
                out_id.append(d)
                out_w.append(w / norm)
        return pa.table(
            {
                "token": pa.array(out_tok, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
                "w": pa.array(out_w, pa.float64()),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        h = fnv1a_batch([s.encode("utf-8") for s in t.column("token").to_pylist()])
        tb = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("tb", pa.array(tb, pa.int64()))

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        dropped = 0
        for _, g in df.groupby("token", sort=False):
            n = len(g)
            if n < 2:
                continue
            if n > max_posting:
                dropped += 1
                continue
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            ws = g["w"].to_numpy()
            iu, ju = np.triu_indices(n, k=1)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_a": ids[iu],
                        "doc_b": ids[ju],
                        "p": ws[iu] * ws[ju],
                    }
                )
            )
        if dropped:
            logging.getLogger(__name__).warning(
                "tfidf_pairs: dropped %d postings over max_posting=%d",
                dropped, max_posting,
            )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_a": np.asarray([], dtype=np.int64),
                    "doc_b": np.asarray([], dtype=np.int64),
                    "p": np.asarray([], dtype=np.float64),
                }
            )
        # in-bucket partial sum: co-similar docs share many tokens, so the
        # same (doc_a, doc_b) appears once per shared token — combining here
        # cuts the rows entering the global Sum shuffle (the float sum is
        # already order-free across buckets, this only regroups it)
        return (
            pd.concat(outs, ignore_index=True)
            .groupby(["doc_a", "doc_b"], sort=False, as_index=False)["p"]
            .sum()
        )

    def pair_bucket(t: pa.Table) -> pa.Table:
        # a pair's key determines its bucket, so ALL partial products of a
        # (doc_a, doc_b) co-locate in one coarse bucket (PERF.md #31) — a
        # vectorized in-bucket reduce replaces Ray's Aggregate operator,
        # whose per-task overhead dominated at this row volume (measured
        # 6 s mean aggregate task on a 500-doc corpus)
        a = t.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        pb = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("pb", pa.array(pb, pa.int64()))

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], sort=False, as_index=False)["p"].sum()
        g = g[g["p"] >= threshold]
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].to_numpy(np.int64),
                "doc_b": g["doc_b"].to_numpy(np.int64),
                "cos_ppm": np.floor(g["p"].to_numpy(np.float64) * 1e6).astype(
                    np.int64
                ),
            }
        )

    return (
        as_arrow(
            ds.map_batches(index_rows, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("tb")
            .map_groups(
                lambda df: pair_partials(df.drop(columns=["tb"])),
                batch_format="pandas",
            )
        )
        .map_batches(pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(
            lambda df: reduce_pairs(df.drop(columns=["pb"])), batch_format="pandas"
        )
    )


def minhash_incremental(
    indexed: ray.data.Dataset,
    incoming: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_buckets: int = 64,
    doc_buckets: int = 64,
    shingle_fn=None,
) -> ray.data.Dataset:
    """Incremental near-dup gate: flag INCOMING documents whose MinHash
    LSH bands collide with the already-INDEXED corpus — the LSH analog of
    ``sketch.bloom_dedup`` (exact membership) for the continuous-crawl
    loop: a wave is screened against the standing index before ingest,
    and no incoming-vs-incoming pair is ever flagged (that is
    ``minhash_lsh_pairs``' job on the survivors).

    Output: (id_col, n_hit_bands, is_dup) for EVERY incoming doc.

    Shape (the corpus_overlap device — NO broadcast, NO driver funnel):
    both sides emit (band, band_hash) keys folded to one int63; ONE
    coarse hash(key)-bucket groupby resolves membership vectorized
    (indexed keys present in the bucket mark incoming rows); per-doc
    sentinel rows (negative key) ride the same shuffle so zero-hit docs
    stay in the output; ONE coarse doc-bucket groupby sums the
    <= docs x buckets partial rows.  Band signatures never broadcast;
    text never shuffles.
    """
    stage_idx = MinHashStage(text_col=text_col, id_col=id_col, k=k, shingle_fn=shingle_fn)
    stage_inc = MinHashStage(text_col=text_col, id_col=id_col, k=k, shingle_fn=shingle_fn)

    def fold(t: pa.Table, side: int, sentinels: bool) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        key = ((bh.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
               ^ band.astype(np.uint64)) & np.uint64((1 << 63) - 1)
        key = key.astype(np.int64)
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        kb = key % np.int64(n_buckets)
        if sentinels:
            sd = np.unique(d)
            key = np.concatenate([key, -sd - 1])
            kb = np.concatenate([kb, sd % np.int64(n_buckets)])
            d = np.concatenate([d, sd])
        return pa.table(
            {
                "kb": pa.array(kb, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "d": pa.array(d, pa.int64()),
                "side": pa.array(np.full(len(d), side, dtype=np.int64), pa.int64()),
            }
        )

    idx_keys = indexed.map_batches(
        stage_idx, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: fold(t, 0, False), batch_format="pyarrow", zero_copy_batch=True
    )
    inc_keys = incoming.map_batches(
        stage_inc, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda t: fold(t, 1, True), batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_member(df: pd.DataFrame) -> pd.DataFrame:
        sent = df[df["key"] < 0]
        real = df[df["key"] >= 0]
        parts = []
        if len(real):
            idx_set = real.loc[real["side"] == 0, "key"].unique()
            inc = real[real["side"] == 1]
            if len(inc):
                hit = inc["key"].isin(idx_set).to_numpy()
                g = (
                    pd.DataFrame({"d": inc["d"].to_numpy(np.int64), "hit": hit.astype(np.int64)})
                    .groupby("d", sort=False, as_index=False)["hit"]
                    .sum()
                )
                parts.append(g.rename(columns={"hit": "n"}))
        if len(sent):
            sent_inc = sent[sent["side"] == 1]
            if len(sent_inc):
                parts.append(
                    pd.DataFrame(
                        {
                            "d": sent_inc["d"].to_numpy(np.int64),
                            "n": np.zeros(len(sent_inc), np.int64),
                        }
                    )
                )
        if not parts:
            return pd.DataFrame(
                {"d": np.asarray([], np.int64), "n": np.asarray([], np.int64)}
            )
        return pd.concat(parts, ignore_index=True)

    def add_db(t: pa.Table) -> pa.Table:
        db = t.column("d").to_numpy(zero_copy_only=False) % np.int64(doc_buckets)
        return t.append_column("db", pa.array(db, pa.int64()))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("d", sort=False, as_index=False)["n"].sum()
        n = g["n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: g["d"].to_numpy(np.int64),
                "n_hit_bands": n,
                "is_dup": (n > 0).astype(np.int64),
            }
        )

    return (
        as_arrow(
            idx_keys.union(inc_keys)
            .groupby("kb")
            .map_groups(
                lambda df: bucket_member(df.drop(columns=["kb"])),
                batch_format="pandas",
            )
        )
        .map_batches(add_db, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("db")
        .map_groups(
            lambda df: final(df.drop(columns=["db"])), batch_format="pandas"
        )
    )



def _shared_key_pairs(
    keys: ray.data.Dataset,
    *,
    max_df: int,
    min_inter: int,
    min_ppm: int,
    n_buckets: int,
    label: str,
) -> ray.data.Dataset:
    """Pair machinery shared by containment_pairs / winnow_overlap_pairs:
    ``keys`` rows are (kb, h, d, nk) — coarse bucket, 63-bit key hash,
    doc id, and the emitting doc's TOTAL distinct-key count (sizes ride
    the shuffle; no sizes join, no broadcast).  ONE coarse
    hash(key)-bucket groupby emits per-key pair partials (keys with
    df > ``max_df`` are DROPPED with a logged count — the boilerplate
    cap, mirrored exactly in each caller's SQL oracle), in-bucket sums
    combine repeats; ONE coarse hash(a,b)-bucket groupby accumulates
    intersections and applies both thresholds vectorized.  Output:
    (id_a, id_b, inter, n_a, n_b, ppm) with
    ppm = inter * 1e6 // min(n_a, n_b).
    """

    def key_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        dropped = 0
        for _, g in df.groupby("h", sort=False):
            m = len(g)
            if m < 2:
                continue
            if m > max_df:
                dropped += 1
                continue
            g = g.sort_values("d", kind="mergesort")
            ids = g["d"].to_numpy()
            nks = g["nk"].to_numpy()
            iu, ju = np.triu_indices(m, k=1)
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ids[iu],
                        "id_b": ids[ju],
                        "n_a": nks[iu],
                        "n_b": nks[ju],
                        "c": np.ones(len(iu), dtype=np.int64),
                    }
                )
            )
        if dropped:
            _log.warning(
                "%s: dropped %d keys over max_df=%d", label, dropped, max_df
            )
        if not outs:
            return pd.DataFrame(
                {
                    "id_a": np.asarray([], dtype=np.int64),
                    "id_b": np.asarray([], dtype=np.int64),
                    "n_a": np.asarray([], dtype=np.int64),
                    "n_b": np.asarray([], dtype=np.int64),
                    "c": np.asarray([], dtype=np.int64),
                }
            )
        return (
            pd.concat(outs, ignore_index=True)
            .groupby(["id_a", "id_b"], sort=False, as_index=False)
            .agg(n_a=("n_a", "first"), n_b=("n_b", "first"), c=("c", "sum"))
        )

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ b
        return t.append_column(
            "pb", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], sort=False, as_index=False).agg(
            inter=("c", "sum"), n_a=("n_a", "first"), n_b=("n_b", "first")
        )
        inter = g["inter"].to_numpy(np.int64)
        mn = np.minimum(g["n_a"].to_numpy(np.int64), g["n_b"].to_numpy(np.int64))
        ppm = inter * 1_000_000 // mn
        sel = (ppm >= min_ppm) & (inter >= min_inter)
        return pd.DataFrame(
            {
                "id_a": g["id_a"].to_numpy(np.int64)[sel],
                "id_b": g["id_b"].to_numpy(np.int64)[sel],
                "inter": inter[sel],
                "n_a": g["n_a"].to_numpy(np.int64)[sel],
                "n_b": g["n_b"].to_numpy(np.int64)[sel],
                "ppm": ppm[sel],
            }
        )

    return (
        as_arrow(
            keys.groupby("kb").map_groups(
                lambda df: key_pairs(df.drop(columns=["kb"])),
                batch_format="pandas",
            )
        )
        .map_batches(pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(
            lambda df: reduce_pairs(df.drop(columns=["pb"])), batch_format="pandas"
        )
    )


def _rename_pairs(ds: ray.data.Dataset, inter_name: str, ppm_name: str) -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: t.select(["id_a", "id_b", "inter", "n_a", "n_b", "ppm"])
        .rename_columns(["id_a", "id_b", inter_name, "n_a", "n_b", ppm_name]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _empty_pairs(inter_name: str, ppm_name: str) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                inter_name: pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                ppm_name: pa.array([], pa.int64()),
            }
        )
    )


def containment_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_ppm: int = 100_000,
    max_df: int = 256,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """All-pairs word n-gram SET containment — the asymmetric near-dup
    measure (Broder's containment, used by RefinedWeb/Dolma-style
    partial-overlap screens): for documents a < b sharing at least one
    n-gram, ``containment_ppm = |G_a ∩ G_b| * 1e6 // min(|G_a|, |G_b|)``
    — the fraction of the SMALLER document's distinct grams found in the
    other.  Catches near-supersets (quote inclusion, page-in-page
    aggregation, truncated mirrors) that symmetric Jaccard dilutes: a
    200-gram page fully embedded in a 10,000-gram page has J ~= 0.02 but
    containment 1.0.

    Output: (id_a, id_b, inter_grams, n_a, n_b, containment_ppm) for
    pairs with containment_ppm >= min_ppm; integer-exact, SQL-verified
    (the df cap is mirrored exactly in the oracle).

    Shape (the tfidf_pairs device — no all-pairs scan, no sizes join,
    text never shuffles): each doc emits its DISTINCT 63-bit FNV gram
    hashes once, every row carrying the doc's gram count so both
    denominators ride the shuffle; pair generation and the two coarse
    bucket groupbys are ``_shared_key_pairs``.
    """
    from engine.stages.clean import _word_ngrams
    from engine.stages.text import fnv1a_batch

    if ds.count() == 0:
        return _empty_pairs("inter_grams", "containment_ppm")

    def gram_rows(t: pa.Table) -> pa.Table:
        flat: List[bytes] = []
        out_d: List[int] = []
        out_nk: List[int] = []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            grams = _word_ngrams(txt, n)
            if not grams:
                continue  # gramless docs can't join any pair
            flat.extend(g.encode("utf-8") for g in grams)
            out_d.extend([int(d)] * len(grams))
            out_nk.extend([len(grams)] * len(grams))
        if flat:
            h = (fnv1a_batch(flat) & np.uint64((1 << 63) - 1)).astype(np.int64)
        else:
            h = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "kb": pa.array(h % np.int64(n_buckets), pa.int64()),
                "h": pa.array(h, pa.int64()),
                "d": pa.array(np.asarray(out_d, dtype=np.int64), pa.int64()),
                "nk": pa.array(np.asarray(out_nk, dtype=np.int64), pa.int64()),
            }
        )

    keys = ds.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    pairs = _shared_key_pairs(
        keys,
        max_df=max_df,
        min_inter=1,
        min_ppm=min_ppm,
        n_buckets=n_buckets,
        label="containment_pairs",
    )
    return _rename_pairs(pairs, "inter_grams", "containment_ppm")


def winnow_overlap_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_shared: int = 3,
    max_df: int = 128,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """MOSS-style winnowing fingerprint overlap join (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003): documents a < b sharing >= ``min_shared``
    DISTINCT window-min token-hash fingerprints — the positional-evidence
    complement of set resemblance: a shared fingerprint certifies a
    shared ``window``-token run, so pairs surface on verbatim passage
    reuse (plagiarism, syndication, template prose) even when the
    documents' overall gram sets barely overlap.

    Fingerprints are exactly ``engine.stages.text.fingerprint``'s
    construction (FNV-1a token hashes, sliding ``window``-min, distinct),
    BEFORE the xor-fold — the set, not the digest.  Docs with fewer than
    ``window`` tokens contribute their single min hash; empty docs none.

    Output: (id_a, id_b, shared_fps, n_a, n_b, overlap_ppm) with
    overlap_ppm = shared * 1e6 // min(|F_a|, |F_b|); integer-exact,
    SQL-verified (FNV + winnowing + the df cap mirrored in the oracle).

    Shape: identical to containment_pairs (``_shared_key_pairs``); the
    fingerprint density is ~2/(window+1) of the token count, so the
    shuffle is an order of magnitude lighter than the gram shuffle.
    """
    from engine.stages.text import _TOKEN, fnv1a_batch

    if ds.count() == 0:
        return _empty_pairs("shared_fps", "overlap_ppm")

    def fp_rows(t: pa.Table) -> pa.Table:
        tok_lists = [
            _TOKEN.findall(txt or "") for txt in t.column(text_col).to_pylist()
        ]
        ids = t.column(id_col).to_pylist()
        flat = [tok.encode("utf-8") for toks in tok_lists for tok in toks]
        th_all = fnv1a_batch(flat)
        counts = np.fromiter(
            (len(toks) for toks in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        bounds = np.zeros(len(tok_lists) + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        out_h: List[np.ndarray] = []
        out_d: List[int] = []
        out_nk: List[int] = []
        for i, d in enumerate(ids):
            th = th_all[bounds[i] : bounds[i + 1]]
            if len(th) == 0:
                continue
            if len(th) >= window:
                mins = np.unique(
                    np.lib.stride_tricks.sliding_window_view(th, window).min(axis=1)
                )
            else:
                mins = np.asarray([th.min()], dtype=np.uint64)
            out_h.append(mins)
            out_d.extend([int(d)] * len(mins))
            out_nk.extend([len(mins)] * len(mins))
        if out_h:
            h = (np.concatenate(out_h) & np.uint64((1 << 63) - 1)).astype(np.int64)
        else:
            h = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "kb": pa.array(h % np.int64(n_buckets), pa.int64()),
                "h": pa.array(h, pa.int64()),
                "d": pa.array(np.asarray(out_d, dtype=np.int64), pa.int64()),
                "nk": pa.array(np.asarray(out_nk, dtype=np.int64), pa.int64()),
            }
        )

    keys = ds.map_batches(fp_rows, batch_format="pyarrow", zero_copy_batch=True)
    pairs = _shared_key_pairs(
        keys,
        max_df=max_df,
        min_inter=min_shared,
        min_ppm=0,
        n_buckets=n_buckets,
        label="winnow_overlap_pairs",
    )
    return _rename_pairs(pairs, "shared_fps", "overlap_ppm")


def plan_lsh(
    num_perm: int,
    threshold: float,
    *,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> Tuple[int, int]:
    """Choose (bands, rows_per_band) for MinHash LSH — the standard
    S-curve optimizer (public: Leskovec/Rajaraman/Ullman MMDS §3.4;
    datasketch's `_optimal_param`): collision probability at similarity
    ``s`` is ``1 - (1 - s^r)^b``; pick the factorization minimizing the
    weighted false-positive integral below ``threshold`` plus the
    false-negative integral above it (midpoint rule, 512 steps —
    deterministic, no RNG).  Only EXACT factorizations ``b * r ==
    num_perm`` are considered — the banded implementation slices every
    signature completely, wasting no permutations.

    Returns ``(bands, rows_per_band)``.  The repo default
    (_LSH_BANDS=16 x _ROWS_PER_BAND=4 over _N_PERM=64) matches this
    planner's output for the default 0.5 threshold — asserted in tests
    so the shipped constants can never silently drift from the math."""
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    best = None
    steps = 512
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        # false positive area: s in (0, threshold)
        fp = 0.0
        for i in range(steps):
            s = threshold * (i + 0.5) / steps
            fp += 1.0 - (1.0 - s**r) ** b
        fp *= threshold / steps
        # false negative area: s in (threshold, 1)
        fn = 0.0
        for i in range(steps):
            s = threshold + (1.0 - threshold) * (i + 0.5) / steps
            fn += (1.0 - s**r) ** b
        fn *= (1.0 - threshold) / steps
        err = fp_weight * fp + fn_weight * fn
        if best is None or err < best[0] - 1e-15:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]
