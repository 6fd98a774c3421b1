"""Redirect-chain resolution over a functional link graph.

A crawl's redirect edges (HTTP 3xx: ``src -> dst``, at most one target per
source after canonicalization) form a functional graph; indexing needs
every URL mapped to its FINAL target plus the chain length, with cycles
flagged (reference analog: the chatnoir indexer stores canonical target
URIs per record, warc_indexer/indexer/process.py metadata handling; chain
resolution itself is new surface for the crawl tier).

Algorithm: pointer doubling (pointer jumping, Wyllie '79 — the textbook
parallel list-ranking primitive).  State holds one row per node
``(node, ptr, hops, done)`` where ``ptr`` is the node reached after
``hops`` hops (terminals: ``ptr = node, hops = 0, done``).  Each round
every active row jumps through its pointer's CURRENT row:

    (u, v, h, _) x (v, w, h2, d2)  ->  (u, w, h + h2, d2)

so covered distance doubles per round and any finite chain (length <= n)
resolves in ceil(log2(n)) + 1 rounds; rows still active after that are on
or behind a cycle and are flagged ``(final, hops) = (-1, -1)``.

Scale shape: the state table never exceeds one row per node; each round
is ONE native hash join keyed on ``ptr`` (partitions sized by
``dedup._join_partitions`` — never more than the small side's distinct
keys, the acero empty-partition hazard) plus a union with the done rows.
Log-many rounds total, so a 100 TB frontier with billion-node chains costs
~31 joins of node-sized tables — no per-hop iteration, nothing
corpus-sized on the driver.  A size-gated driver fast path (same
threshold rationale as graph.pagerank) resolves small graphs with a
memoized numpy/dict walk; both paths are pinned to the same oracle in
tests.
"""

from __future__ import annotations

import math
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min

from engine.stages.dedup import _join_partitions

_EMPTY = pa.table(
    {
        "node": pa.array([], pa.int64()),
        "final": pa.array([], pa.int64()),
        "hops": pa.array([], pa.int64()),
    }
)


def resolve_redirects(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: Optional[int] = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """Resolve every node of a redirect graph to its terminal target:
    ``(node, final, hops)`` over the node universe (sources union
    targets).  Terminals map to themselves with 0 hops; nodes on or
    behind a cycle get ``(-1, -1)``.  Duplicate out-edges per source are
    canonicalized deterministically to the minimum target."""
    edges = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "src": t.column(src_col).cast(pa.int64()),
                    "dst": t.column(dst_col).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("src")
        .aggregate(Min("dst", alias_name="dst"))
        .materialize()
    )

    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_EMPTY)
    if n_edges <= driver_max_edges:
        return _resolve_driver(edges)

    # node universe = srcs UNION dsts (groupby dedup, no join)
    def both_ends(t: pa.Table) -> pa.Table:
        s, d = t.column("src").combine_chunks(), t.column("dst").combine_chunks()
        return pa.table({"node": pa.chunked_array([s, d])})

    nodes = (
        edges.map_batches(both_ends, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("node", alias_name="_n"))
        .map_batches(
            lambda t: t.select(["node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_nodes = nodes.count()
    npart = num_partitions or max(1, min(_join_partitions(), n_nodes // 32))

    # initial state: edge rows are active (ptr = target, 1 hop); terminal
    # nodes (no out-edge) self-map done — their presence makes every jump
    # a guaranteed-match INNER join (no anti-join / outer-join needed)
    def edge_state(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "node": t.column("src"),
                "ptr": t.column("dst"),
                "hops": pa.array([1] * n, pa.int64()),
                "done": pa.array([False] * n, pa.bool_()),
            }
        )

    active = edges.map_batches(
        edge_state, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # terminals = nodes minus srcs: semi-join via union+groupby (srcs are
    # tagged 0, universe rows 1; a node is terminal iff its min tag is 1)
    srcs0 = edges.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("src"),
                "_t": pa.array([0] * t.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    all1 = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "_t": pa.array([1] * t.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    done = (
        srcs0.union(all1)
        .groupby("node")
        .aggregate(Min("_t", alias_name="_t"))
        .map_batches(
            lambda t: (
                lambda term: pa.table(
                    {
                        "node": term,
                        "ptr": term,
                        "hops": pa.array([0] * len(term), pa.int64()),
                        "done": pa.array([True] * len(term), pa.bool_()),
                    }
                )
            )(t.filter(pc.equal(t.column("_t"), 1)).column("node")),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    max_rounds = math.ceil(math.log2(max(2, n_nodes))) + 1
    for _ in range(max_rounds):
        n_active = active.count()
        if n_active == 0:
            break
        state = active.union(done).materialize()
        jumped = (
            active.join(
                state,
                join_type="inner",
                num_partitions=max(1, min(npart, n_active)),
                on=("ptr",),
                right_on=("node",),
                right_suffix="_r",
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "ptr": t.column("ptr_r"),
                        "hops": pc.add(t.column("hops"), t.column("hops_r")),
                        "done": t.column("done_r"),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        newly_done = jumped.filter(expr="done == True").materialize()
        active = jumped.filter(expr="done == False").materialize()
        done = done.union(newly_done).materialize()

    resolved = done.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "final": t.column("ptr"),
                "hops": t.column("hops"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # rows still active after ceil(log2 n)+1 doublings are on/behind a cycle
    cyclic = active.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "final": pa.array([-1] * t.num_rows, pa.int64()),
                "hops": pa.array([-1] * t.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return resolved.union(cyclic)


def _resolve_driver(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Driver-side memoized resolution (gated small-graph path): iterative
    chain walk with a visited stack — O(nodes), explicit cycle marking.
    Same output contract as the distributed rounds."""
    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(edges)
    if not blocks:
        return ray.data.from_arrow(_EMPTY)
    tbl = pa.concat_tables(blocks, promote_options="default")
    src = tbl.column("src").to_pylist()
    dst = tbl.column("dst").to_pylist()
    succ = dict(zip(src, dst))
    nodes = sorted(set(src) | set(dst))
    memo: dict = {}  # node -> (final, hops) or (-1, -1)
    for start in nodes:
        if start in memo:
            continue
        path = []
        u = start
        on_path = set()
        while u in succ and u not in memo and u not in on_path:
            path.append(u)
            on_path.add(u)
            u = succ[u]
        if u in on_path:  # walked into a fresh cycle
            final = (-1, -1)
            tail_hops = None
        elif u in memo:
            final, tail_hops = memo[u][0], memo[u][1]
        else:  # terminal
            final, tail_hops = u, 0
        for i in range(len(path) - 1, -1, -1):
            if final == (-1, -1) or final == -1:
                memo[path[i]] = (-1, -1)
            else:
                tail_hops += 1
                memo[path[i]] = (final, tail_hops)
        if start not in memo:  # start itself terminal
            memo[start] = (start, 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "final": pa.array([memo[n][0] for n in nodes], pa.int64()),
                "hops": pa.array([memo[n][1] for n in nodes], pa.int64()),
            }
        )
    )
