"""End-to-end training-corpus build — the full pipeline a reference user
would run to turn a crawled document table into training shards:

    documents ──corpus_filter──► kept docs
              ──MinHash-LSH + connected components──► near-dup survivors
              ──mixture_sample (optional)──► target source mix
              ──pack_sequences──► (stream_offset, pack_id) per doc
              ──export_shards──► N hash-assigned parquet shards + manifest

Every stage is an individually SQL-/oracle-verified operator (see
COVERAGE.md); this module is pure composition plus the stage-boundary key
plumbing, all through ``diff.select_by_keys`` (gated broadcast with a
union+groupby semi-join above the gate — text never joins, only key
sets move).  Determinism: every stage is hash-gated / min-id-canonical,
so two runs over the same input produce byte-identical shard membership
(pinned by tests/test_pipeline_e2e.py::test_build_corpus, which also
forces the fallback key path and compares).

Scale notes: the only all-to-all exchanges are the ones the component
operators already pay (content-hash groupby in the filter, LSH bucket
groupby + label propagation in dedup, the (shard, id) sort in export);
stage boundaries add zero shuffles below the broadcast gate.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from engine.stages import dedup as dd
from engine.stages.diff import select_by_keys
from engine.stages.export import export_shards
from engine.stages.filter_pipeline import corpus_filter
from engine.stages.pack import pack_sequences
from engine.stages.sample import mixture_sample


def build_corpus(
    docs: ray.data.Dataset,
    *,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    weights_bp: Optional[Dict[str, int]] = None,
    out_frac_pct: int = 100,
    minhash_threshold: float = 0.5,
    seq_len: int = 2048,
    n_shards: int = 16,
    broadcast_max: int = 5_000_000,
    shuffle_seed: Optional[int] = None,
) -> Tuple[ray.data.Dataset, Dict[str, int]]:
    """Run the whole corpus build (module docstring).  ``docs`` must carry
    (id_col, text_col[, domain_col if weights_bp]).  Returns
    (shard manifest dataset, per-stage row counts).

    ``shuffle_seed`` packs in a seeded-deterministic SHUFFLED stream order
    (sample.shuffle_corpus's md5 key, derived per batch as a column — no
    join, text never re-shuffles beyond the pack sort it already pays):
    shard MEMBERSHIP is unchanged (export assigns shards by id hash),
    only stream_offset/pack_id reorder.  None (default) keeps id order."""
    stats: Dict[str, int] = {"input": docs.count()}

    # 1. cleaning chain -> kept doc ids
    verdicts = corpus_filter(
        docs.map_batches(
            lambda t: t.select([id_col, text_col]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        id_col=id_col,
        text_col=text_col,
    )
    kept_keys = verdicts.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), "kept")).select([id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    stats["kept"] = kept_keys.count()
    kept = select_by_keys(
        docs, kept_keys, stats["kept"], key_col=id_col, broadcast_max=broadcast_max
    ).materialize()

    # 2. near-dup drop: LSH pairs -> components -> drop non-canonical members
    pairs = dd.minhash_lsh_pairs(
        kept, id_col=id_col, text_col=text_col, threshold=minhash_threshold
    )
    clusters = dd.connected_components(pairs)
    # connected_components emits hard-coded (doc_id, cluster_id); realign
    # with the caller's id column name.  select() by name first so a
    # changed/reordered upstream schema fails loudly instead of silently
    # swapping ids with cluster ids.
    if id_col != "doc_id":
        clusters = clusters.map_batches(
            lambda t: t.select(["doc_id", "cluster_id"]).rename_columns(
                [id_col, "cluster_id"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    drop_keys = clusters.map_batches(
        lambda t: t.filter(
            pc.not_equal(t.column(id_col), t.column("cluster_id"))
        ).select([id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    n_drop = drop_keys.count()
    stats["neardup_dropped"] = n_drop
    surviving = select_by_keys(
        kept, drop_keys, n_drop, key_col=id_col,
        broadcast_max=broadcast_max, invert=True,
    )

    # 3. optional source-mixture sampling
    if weights_bp is not None:
        surviving = mixture_sample(
            surviving.materialize(),
            id_col=id_col,
            domain_col=domain_col,
            weights_bp=weights_bp,
            out_frac_pct=out_frac_pct,
        )
    final = surviving.materialize()
    stats["final_docs"] = final.count()

    # 4. sequence packing (adds n_tokens / stream_offset / pack_id),
    #    optionally in seeded-shuffled stream order
    pack_in = final.map_batches(
        lambda t: t.select([id_col, text_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if shuffle_seed is not None:
        from engine.stages.sample import shuffle_keys

        def add_key(t: pa.Table) -> pa.Table:
            return t.append_column(
                "shuf_key",
                pa.array(
                    shuffle_keys(t.column(id_col).to_pylist(), shuffle_seed),
                    pa.string(),
                ),
            )

        pack_in = pack_in.map_batches(
            add_key, batch_format="pyarrow", zero_copy_batch=True
        )
        packed = pack_sequences(
            pack_in, id_col=id_col, text_col=text_col,
            seq_len=seq_len, sort_col="shuf_key",
        )
    else:
        packed = pack_sequences(
            pack_in, id_col=id_col, text_col=text_col, seq_len=seq_len
        )

    # 5. sharded export + round-trip manifest
    manifest = export_shards(
        packed, id_col=id_col, out_dir=out_dir, n_shards=n_shards
    ).materialize()
    stats["shards"] = manifest.count()
    stats["exported_rows"] = int(
        pa.concat_tables(
            ray.get(manifest.to_arrow_refs()), promote_options="default"
        )
        .column("n_rows")
        .to_pandas()
        .sum()
    ) if stats["shards"] else 0
    return manifest, stats
