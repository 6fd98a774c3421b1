"""Distributed graph analytics over the crawl link graph.

``pagerank``: classic damped PageRank (Page et al. 1999, public) as an
iterative Ray-Data pipeline — the same edges-join-labels shape as
``dedup.connected_components`` but with weighted contributions and the
dangling-mass correction:

    rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + dangling/N)

Per iteration: ONE native hash join (static edge weights x current ranks
on src), one union with zero rows (so sink-only nodes keep a row — a
union+groupby, never an outer join: the acero join loses schema on empty
hash partitions), one groupby-sum, and one tiny aggregate for the
dangling mass (dangling = 1 - total contribution, exact because the
update preserves sum(rank) == 1).  Edge weights are joined ONCE up front
and materialized; ranks are materialized per round to cut lineage.

Exactly verified against a single-process numpy power iteration in
tests/test_stages.py (same formula, same iteration count).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute  # noqa: F401 — pa.compute used below
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from engine.stages.dedup import _join_partitions


def pagerank(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    num_partitions: Optional[int] = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """PageRank over an edge list; returns (node, rank) after ``iters``
    rounds.  Duplicate edges contribute once each (multigraph semantics —
    match the oracle).  Ranks sum to exactly 1.0 up to float addition.

    Size-gated driver fast path: an edge list below ``driver_max_edges``
    (~32 MB of int64 pairs at the default) runs the numpy power iteration
    on the driver — 10 distributed rounds of join+groupby cost ~10 s of
    pure per-round launch overhead to move a few thousand rows (the
    PERF.md #24 rationale).  Both paths implement the identical formula
    and are pinned to the same oracle in tests (each forced explicitly).
    """
    edges = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column(src_col), "dst": t.column(dst_col)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if edges.count() <= driver_max_edges:
        return _pagerank_driver(edges, damping=damping, iters=iters)

    # node universe: distinct src UNION dst (groupby, no join)
    def both_ends(t: pa.Table) -> pa.Table:
        s, d = t.column("src").combine_chunks(), t.column("dst").combine_chunks()
        return pa.table({"node": pa.chunked_array([s, d])})

    nodes = (
        edges.map_batches(both_ends, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )
    outdeg = (
        edges.groupby("src").aggregate(Count(alias_name="outdeg")).materialize()
    )
    n_src = outdeg.count()  # >= 1: empty edge sets returned above
    # join partitions sized to the graph: tiny graphs get 1 partition and
    # npart never exceeds the joins' small-side distinct key count (distinct
    # src — both the outdeg join and the per-round ranks join hash on src),
    # so no hash partition is ever empty (acero schema-loss hazard on
    # sink-heavy graphs where few nodes have outlinks)
    npart = num_partitions or max(1, min(_join_partitions(), n_nodes // 32, n_src))
    # static edge weights w = 1/outdeg(src), joined ONCE
    ew = (
        edges.join(
            outdeg,
            join_type="inner",
            num_partitions=npart,
            on=("src",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src"),
                    "dst": t.column("dst"),
                    "w": pa.compute.divide(
                        pa.scalar(1.0, pa.float64()),
                        t.column("outdeg").cast(pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    init = 1.0 / n_nodes
    ranks = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array([init] * t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    zeros = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "c": pa.array([0.0] * t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    for _ in range(iters):
        contribs = ew.join(
            ranks,
            join_type="inner",
            num_partitions=npart,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("dst"),
                    "c": pa.compute.multiply(t.column("rank"), t.column("w")),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        summed = (
            contribs.union(zeros)
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
            .materialize()
        )
        # exact dangling mass: update preserves sum(rank) == 1, and
        # sum(contribs) == sum of non-dangling ranks
        total_in = summed.sum("c") or 0.0
        dangling = max(0.0, 1.0 - total_in)
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        def renew(t: pa.Table, _base=base) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    "rank": pa.compute.add(
                        pa.scalar(_base, pa.float64()),
                        pa.compute.multiply(
                            pa.scalar(damping, pa.float64()), t.column("c")
                        ),
                    ),
                }
            )

        ranks = summed.map_batches(
            renew, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    return ranks


def _pagerank_driver(
    edges: ray.data.Dataset, *, damping: float, iters: int
) -> ray.data.Dataset:
    """Driver-side numpy power iteration (gated small-graph path).  Same
    formula as the distributed rounds: multigraph contributions, exact
    dangling-mass correction."""
    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(edges)
    if not blocks:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            )
        )
    tbl = pa.concat_tables(blocks, promote_options="default")
    node_type = tbl.schema.field("src").type
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = codes[: len(src)], codes[len(src) :]
    n = len(nodes)
    outdeg = np.zeros(n, dtype=np.float64)
    np.add.at(outdeg, si, 1.0)
    dangling_mask = outdeg == 0
    safe_out = np.where(dangling_mask, 1.0, outdeg)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] / safe_out[si])
        dangling = float(r[dangling_mask].sum())
        r = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes.tolist(), node_type),
                "rank": pa.array(r, pa.float64()),
            }
        )
    )


def hits(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    num_partitions: Optional[int] = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """HITS hubs & authorities (Kleinberg, JACM 1999) over an edge list;
    returns ``(node, hub, authority)`` after ``iters`` rounds of the
    L2-normalized power iteration

        a(v) = sum_{u->v} h(u);  h(u) = sum_{u->v} a(v)

    (each half-step divided by its L2 norm).  Multigraph semantics:
    duplicate edges contribute once each, matching the numpy oracle.

    Same distributed shape as ``pagerank`` — per round TWO native hash
    joins (static edges x current hubs on src, then edges x new
    authorities on dst), each followed by a union-with-zeros + groupby
    Sum so in-only/out-only nodes keep rows (never an outer join: acero
    loses schema on empty hash partitions); the L2 norms are tiny
    sum-of-squares aggregates.  Join partitions are capped by BOTH
    distinct-src and distinct-dst counts (each round hashes on each).
    Size-gated driver fast path below ``driver_max_edges`` (PERF.md #24),
    pinned to the same oracle as the distributed rounds in tests.
    """
    edges = edges.map_batches(
        lambda t: pa.table(
            {"src": t.column(src_col), "dst": t.column(dst_col)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if edges.count() <= driver_max_edges:
        return _hits_driver(edges, iters=iters)

    def both_ends(t: pa.Table) -> pa.Table:
        s, d = t.column("src").combine_chunks(), t.column("dst").combine_chunks()
        return pa.table({"node": pa.chunked_array([s, d])})

    nodes = (
        edges.map_batches(both_ends, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_nodes = nodes.count()
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64()),
        }
    )
    if n_nodes == 0:
        return ray.data.from_arrow(empty)
    n_src = edges.groupby("src").aggregate(Count(alias_name="_c")).count()
    n_dst = edges.groupby("dst").aggregate(Count(alias_name="_c")).count()
    npart = num_partitions or max(
        1, min(_join_partitions(), n_nodes // 32, n_src, n_dst)
    )

    def const_col(name, val):
        def mk(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t.column("node"),
                    name: pa.array([val] * t.num_rows, pa.float64()),
                }
            )

        return mk

    zeros = nodes.map_batches(
        const_col("v", 0.0), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    init = 1.0 / math.sqrt(n_nodes)
    hubs = nodes.map_batches(
        const_col("v", init), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    auths = hubs

    def _propagate(vec: ray.data.Dataset, join_on: str, out_key: str):
        """One half-step: edges x vec joined on ``join_on``, summed onto
        the opposite endpoint, zero-unioned, then L2-normalized."""
        raw = (
            edges.join(
                vec,
                join_type="inner",
                num_partitions=npart,
                on=(join_on,),
                right_on=("node",),
            )
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column(out_key), "c": t.column("v")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .union(
                zeros.map_batches(
                    lambda t: t.rename_columns(["node", "c"]),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
            .materialize()
        )
        sq = raw.map_batches(
            lambda t: pa.table(
                {"s": [pa.compute.sum(
                    pa.compute.multiply(t.column("c"), t.column("c"))
                ).as_py() or 0.0]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("s") or 0.0
        norm = math.sqrt(sq) or 1.0
        return raw.map_batches(
            lambda t, _n=norm: pa.table(
                {
                    "node": t.column("node"),
                    "v": pa.compute.divide(t.column("c"), pa.scalar(_n, pa.float64())),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    for _ in range(iters):
        auths = _propagate(hubs, "src", "dst")
        hubs = _propagate(auths, "dst", "src")

    return hubs.join(
        auths,
        join_type="inner",
        num_partitions=npart,
        on=("node",),
        right_on=("node",),
        left_suffix="_h",
        right_suffix="_a",
    ).map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "hub": t.column("v_h"),
                "authority": t.column("v_a"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _hits_driver(edges: ray.data.Dataset, *, iters: int) -> ray.data.Dataset:
    """Driver-side numpy HITS (gated small-graph path); identical formula
    and normalization to the distributed rounds."""
    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(edges)
    if not blocks:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "hub": pa.array([], pa.float64()),
                    "authority": pa.array([], pa.float64()),
                }
            )
        )
    tbl = pa.concat_tables(blocks, promote_options="default")
    node_type = tbl.schema.field("src").type
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = codes[: len(src)], codes[len(src) :]
    n = len(nodes)
    h = np.full(n, 1.0 / math.sqrt(n))
    a = h.copy()
    for _ in range(iters):
        a = np.zeros(n)
        np.add.at(a, di, h[si])
        a /= np.sqrt((a * a).sum()) or 1.0
        h = np.zeros(n)
        np.add.at(h, si, a[di])
        h /= np.sqrt((h * h).sum()) or 1.0
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes.tolist(), node_type),
                "hub": pa.array(h, pa.float64()),
                "authority": pa.array(a, pa.float64()),
            }
        )
    )


def degree_stats(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Per-node link-graph degree statistics: ``(node, out_deg, in_deg,
    mutual_deg)`` — out/in degree plus reciprocity (how many of the
    node's neighbors link back), the structural signals behind link-spam
    and mirror detection.  Input edges are assumed distinct (the crawl's
    link extraction dedups per page); self-loops are ignored for
    mutual_deg.

    All-shuffle-no-join shape: degrees are two Count groupbys; mutual
    edges resolve by the canonical-pair device — each edge maps to
    (lo, hi, dir) with dir 1 for lo->hi and 2 for hi->lo, ONE
    groupby(lo,hi) with Min/Max(dir) marks pairs seeing both directions,
    and the three per-node partial tables union into ONE final
    groupby(node) Sum.  Nothing corpus-sized reaches the driver."""
    from ray.data.aggregate import Max, Min

    def to_pair(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s, d = t.column(src_col), t.column(dst_col)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        direction = pc.if_else(
            pc.less(s, d), pa.scalar(1, pa.int64()), pa.scalar(2, pa.int64())
        )
        return pa.table({"lo": lo, "hi": hi, "dir": direction})

    mutual_pairs = (
        edges.map_batches(to_pair, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lo", "hi"])
        .aggregate(Min("dir", alias_name="dmin"), Max("dir", alias_name="dmax"))
        .map_batches(
            lambda t: (
                lambda f: pa.table(
                    {
                        "node": pa.chunked_array(
                            [
                                f.column("lo").combine_chunks(),
                                f.column("hi").combine_chunks(),
                            ]
                        ),
                        "out_deg": pa.array([0] * (2 * f.num_rows), pa.int64()),
                        "in_deg": pa.array([0] * (2 * f.num_rows), pa.int64()),
                        "mutual_deg": pa.array([1] * (2 * f.num_rows), pa.int64()),
                    }
                )
            )(
                t.filter(
                    pa.compute.and_(
                        pa.compute.equal(t.column("dmin"), 1),
                        pa.compute.equal(t.column("dmax"), 2),
                    )
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def part(col, out_name):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            zero = pa.array([0] * n, pa.int64())
            one = pa.array([1] * n, pa.int64())
            return pa.table(
                {
                    "node": t.column(col),
                    "out_deg": one if out_name == "out_deg" else zero,
                    "in_deg": one if out_name == "in_deg" else zero,
                    "mutual_deg": zero,
                }
            )

        return f

    outs = edges.map_batches(
        part(src_col, "out_deg"), batch_format="pyarrow", zero_copy_batch=True
    )
    ins = edges.map_batches(
        part(dst_col, "in_deg"), batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        outs.union(ins)
        .union(mutual_pairs)
        .groupby("node")
        .aggregate(
            Sum("out_deg", alias_name="out_deg"),
            Sum("in_deg", alias_name="in_deg"),
            Sum("mutual_deg", alias_name="mutual_deg"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "out_deg": t.column("out_deg").cast(pa.int64()),
                    "in_deg": t.column("in_deg").cast(pa.int64()),
                    "mutual_deg": t.column("mutual_deg").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def triangle_counts(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 64,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-node triangle participation counts over the UNDIRECTED graph
    induced by the edge list: ``(node, tri_cnt)`` for every node with at
    least one edge (tri_cnt 0 rows included).  Triangles are the local
    clustering signal (link farms are triangle-dense; genuine hub pages
    are not).

    The node-iterator algorithm with DEGREE ORDERING (Schank & Wagner
    2005): orient every undirected edge from the (degree, node)-smaller
    endpoint to the larger, enumerate wedges only from each node's
    OUT-neighbors — total wedge volume is O(m^1.5) regardless of skew
    (a star's hub has out-degree <= its rank, so a 10^8-follower hub
    emits no quadratic wedge set) — and confirm each wedge against the
    undirected edge set, finding each triangle exactly once.

    Shapes: dedup to canonical (lo, hi) pairs (one groupby); degrees via
    a Count groupby; endpoint degrees attach with two node-keyed hash
    joins (node-sized small sides, partitions capped); wedge->edge
    confirmation is a COARSE hash-bucket groupby (PERF.md #31 — the
    distinct wedge-pair count is huge, so buckets resolve membership
    vectorized via a pandas merge instead of paying per-pair Python);
    per-triangle credit fans out 3 rows into one final groupby(node) Sum.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from engine.stages.common import as_arrow
    from engine.stages.dedup import _join_partitions

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column(src_col), t.column(dst_col)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"lo": pc.min_element_wise(s, d), "hi": pc.max_element_wise(s, d)}
        )

    und = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["lo", "hi"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "tri_cnt": pa.array([], pa.int64())}
    )
    m = und.count()
    if m == 0:
        return ray.data.from_arrow(empty)

    def ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.chunked_array(
                    [t.column("lo").combine_chunks(), t.column("hi").combine_chunks()]
                )
            }
        )

    deg = (
        und.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .materialize()
    )
    n_nodes = deg.count()
    npart = num_partitions or max(1, min(_join_partitions(), n_nodes))

    # attach both endpoint degrees, orient by (deg, node)
    directed = (
        und.join(deg, join_type="inner", num_partitions=npart,
                 on=("lo",), right_on=("node",))
        .map_batches(
            lambda t: pa.table(
                {"lo": t.column("lo"), "hi": t.column("hi"),
                 "dlo": t.column("deg").cast(pa.int64())}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .join(deg, join_type="inner", num_partitions=npart,
              on=("hi",), right_on=("node",))
        .map_batches(
            lambda t: (
                lambda lo, hi, dlo, dhi: pa.table(
                    {
                        "u": pc.if_else(
                            pc.or_(
                                pc.less(dlo, dhi),
                                pc.and_(pc.equal(dlo, dhi), pc.less(lo, hi)),
                            ),
                            lo, hi,
                        ),
                        "v": pc.if_else(
                            pc.or_(
                                pc.less(dlo, dhi),
                                pc.and_(pc.equal(dlo, dhi), pc.less(lo, hi)),
                            ),
                            hi, lo,
                        ),
                    }
                )
            )(
                t.column("lo"), t.column("hi"),
                t.column("dlo"), t.column("deg").cast(pa.int64()),
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )

    # wedges from out-neighbor pairs: groupby(u) is safe — out-degree is
    # rank-bounded by construction
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        u = int(df["u"].iloc[0])
        vs = sorted(int(x) for x in df["v"])
        xs, ys = [], []
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i], vs[j]
                xs.append(min(a, b))
                ys.append(max(a, b))
        return pd.DataFrame(
            {
                "x": np.asarray(xs, dtype=np.int64),
                "y": np.asarray(ys, dtype=np.int64),
                "u": np.full(len(xs), u, dtype=np.int64),
                "role": pd.Series(["c"] * len(xs), dtype="string"),
            }
        )

    cand = as_arrow(
        directed.groupby("u").map_groups(wedges, batch_format="pandas")
    )
    marks = und.map_batches(
        lambda t: pa.table(
            {
                "x": t.column("lo"),
                "y": t.column("hi"),
                "u": pa.array([-1] * t.num_rows, pa.int64()),
                "role": pa.array(["e"] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.uint64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (x * np.uint64(0x9E3779B97F4A7C15) ^ y) % np.uint64(n_buckets)
        return t.append_column("tb", pa.array(h.astype(np.int64), pa.int64()))

    def confirm(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["role"] == "e"][["x", "y"]]
        c = df[df["role"] == "c"]
        if not len(c) or not len(e):
            return pd.DataFrame(
                {"node": np.asarray([], dtype=np.int64),
                 "t": np.asarray([], dtype=np.int64)}
            )
        hit = c.merge(e.drop_duplicates(), on=["x", "y"], how="inner")
        nodes = np.concatenate(
            [hit["x"].to_numpy(), hit["y"].to_numpy(), hit["u"].to_numpy()]
        ).astype(np.int64)
        return pd.DataFrame(
            {"node": nodes, "t": np.ones(len(nodes), dtype=np.int64)}
        )

    credits = as_arrow(
        cand.union(marks)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(
            lambda df: confirm(df.drop(columns=["tb"])), batch_format="pandas"
        )
    )
    zeros = deg.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"),
             "t": pa.array([0] * t.num_rows, pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return (
        credits.union(zeros)
        .groupby("node")
        .aggregate(Sum("t", alias_name="tri_cnt"))
        .map_batches(
            lambda t: pa.table(
                {"node": t.column("node"),
                 "tri_cnt": t.column("tri_cnt").cast(pa.int64())}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )


def textrank_keywords(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    window: int = 2,
    top_k: int = 20,
    iters: int = 10,
    damping: float = 0.85,
) -> ray.data.Dataset:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau,
    EMNLP 2004): PageRank over the token co-occurrence graph — tokens
    co-occurring within ``window`` positions get edges in BOTH
    directions, one edge per occurrence, and ``pagerank``'s multigraph
    semantics (each duplicate edge contributes) realize the classic
    co-occurrence weighting without a weighted-graph variant.  Output:
    ``(token, rank_ppb, kw_rank)`` for the ``top_k`` tokens.

    Shape: tokens become 63-bit FNV node ids map-side (collisions are
    2^-63 events; the id->token resolution at the end is a top_k-sized
    broadcast filter, never a vocab shuffle); edges flow straight into
    ``pagerank`` (driver numpy under the gate, join rounds above);
    the final ranking is ``global_topk``'s per-block candidates."""
    from engine.stages.text import _TOKEN, fnv1a_batch
    from engine.stages.topk import global_topk

    MASK = np.uint64((1 << 63) - 1)

    def edges(t: pa.Table) -> pa.Table:
        src: list = []
        dst: list = []
        for txt in t.column(text_col).to_pylist():
            toks = _TOKEN.findall(txt or "")
            if len(toks) < 2:
                continue
            hs = (fnv1a_batch([x.encode("utf-8") for x in toks]) & MASK).astype(
                np.int64
            )
            for d in range(1, window + 1):
                a, b = hs[:-d], hs[d:]
                keep = a != b
                src.extend(a[keep].tolist())
                dst.extend(b[keep].tolist())
        both = pa.table(
            {
                "src": pa.array(src + dst, pa.int64()),
                "dst": pa.array(dst + src, pa.int64()),
            }
        )
        return both

    ranks = pagerank(
        ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True),
        damping=damping,
        iters=iters,
    )

    def to_ppb(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "node": t.column("node"),
                "rank_ppb": pc.cast(
                    pc.floor(pc.multiply(t.column("rank"), 1e9)), pa.int64()
                ),
            }
        )

    top = global_topk(
        ranks.map_batches(to_ppb, batch_format="pyarrow", zero_copy_batch=True),
        order_cols=["rank_ppb", "node"],
        descending=[True, False],
        k=top_k,
        rank_col="kw_rank",
    ).materialize()
    top_rows = top.to_pandas()
    if not len(top_rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "rank_ppb": pa.array([], pa.int64()),
                    "kw_rank": pa.array([], pa.int64()),
                }
            )
        )
    want = ray.put(set(int(x) for x in top_rows["node"]))

    def resolve(t: pa.Table) -> pa.Table:
        ws = ray.get(want)
        out: dict = {}
        for txt in t.column(text_col).to_pylist():
            toks = _TOKEN.findall(txt or "")
            if not toks:
                continue
            hs = (fnv1a_batch([x.encode("utf-8") for x in toks]) & MASK).astype(
                np.int64
            )
            for tok, h in zip(toks, hs):
                if int(h) in ws:
                    out[int(h)] = tok
        return pa.table(
            {
                "node": pa.array(list(out.keys()), pa.int64()),
                "token": pa.array(list(out.values()), pa.string()),
            }
        )

    import pandas as pd

    name_blocks = (
        ds.map_batches(resolve, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .map_groups(lambda df: df.head(1), batch_format="pandas")
        .to_pandas()
    )
    merged = top_rows.merge(name_blocks, on="node", how="inner")
    merged = merged.sort_values("kw_rank")
    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array(merged["token"], pa.string()),
                "rank_ppb": pa.array(
                    merged["rank_ppb"].astype("int64"), pa.int64()
                ),
                "kw_rank": pa.array(merged["kw_rank"].astype("int64"), pa.int64()),
            }
        )
    )


def bfs_hops(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_hops: int = 8,
    num_partitions: Optional[int] = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """Minimal DIRECTED hop distance from a seed set: ``(node, hop)`` for
    every node reachable within ``max_hops`` clicks (seeds at hop 0, even
    when isolated) — the crawl-depth audit (how deep does the frontier
    reach from the seed list?) and the link-distance feature
    spam-analysis pipelines use (distance-from-trusted-seeds, the
    TrustRank neighborhood).

    Distributed shape: classic frontier expansion — per round ONE native
    hash join (static edges x current frontier on src; partitions capped
    by the FRONTIER size so no hash partition is empty on the small
    side), then union with the standing distances and a groupby
    ``Min(hop)``; the new frontier is exactly the rows whose min hop
    equals this round's (a node first reached now cannot hold a smaller
    hop).  Early exit on an empty frontier.  Per-round volume is
    O(edges-out-of-frontier), never all-pairs; ``hop`` stays int64.

    Size-gated driver fast path below ``driver_max_edges`` (PERF.md #24):
    numpy/dict BFS, pinned to the same output as the distributed rounds
    in tests (each forced explicitly).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    edges = edges.map_batches(
        lambda t: pa.table({"src": t.column(src_col), "dst": t.column(dst_col)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    seed_tbl = seeds.map_batches(
        lambda t: pa.table({"node": t.column(seed_col).cast(pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if edges.count() <= driver_max_edges:
        return _bfs_driver(edges, seed_tbl, max_hops=max_hops)

    dist = (
        seed_tbl.groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "hop": pa.array([0] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        npart = num_partitions or max(1, min(_join_partitions(), n_frontier))
        cand = edges.join(
            frontier,
            join_type="inner",
            num_partitions=npart,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda t, _h=h: pa.table(
                {
                    "node": t.column("dst"),
                    "hop": pa.array([_h] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        dist = (
            dist.union(cand)
            .groupby("node")
            .aggregate(Min("hop", alias_name="hop"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "hop": t.column("hop").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        frontier = dist.map_batches(
            lambda t, _h=h: t.filter(pc.equal(t.column("hop"), _h)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    return dist


def _bfs_driver(
    edges: ray.data.Dataset, seed_tbl: ray.data.Dataset, *, max_hops: int
) -> ray.data.Dataset:
    """Driver-side BFS (gated small-graph path); identical contract to
    the distributed rounds."""
    from engine.stages.common import collect_arrow_blocks

    seed_blocks = collect_arrow_blocks(seed_tbl)
    seeds = set()
    for b in seed_blocks:
        seeds.update(b.column("node").to_pylist())
    blocks = collect_arrow_blocks(edges)
    adj: dict = {}
    if blocks:
        tbl = pa.concat_tables(blocks, promote_options="default")
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        dst = tbl.column("dst").to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        uniq = np.unique(src)
        starts = np.searchsorted(src, uniq, side="left")
        ends = np.searchsorted(src, uniq, side="right")
        for u, a, b in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
            adj[u] = dst[a:b]
    hop = {s: 0 for s in sorted(seeds)}
    frontier = sorted(seeds)
    for h in range(1, max_hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):  # numpy slice iterates int64 scalars
                v = int(v)
                if v not in hop:
                    hop[v] = h
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    nodes = sorted(hop)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "hop": pa.array([hop[n] for n in nodes], pa.int64()),
            }
        )
    )


def kcore(
    edges: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: Optional[int] = None,
    driver_max_edges: int = 2_000_000,
    max_rounds: int = 100,
) -> ray.data.Dataset:
    """k-core decomposition over the UNDIRECTED graph induced by the edge
    list: ``(node, coreness)`` — the largest k such that the node survives
    in the k-core (every member has >= k neighbors in the subgraph).
    Coreness separates link-farm cores / dense mirror clusters from
    genuinely sparse link neighborhoods (degree is spoofable by pointing
    anywhere; coreness requires the NEIGHBORS to be dense too).

    Distributed algorithm: the h-index fixpoint (Lu, Chen, Ren et al.,
    Nature Physics 2016) — start from c(v) = degree(v) and repeatedly set
    c(v) to the H-INDEX of its neighbors' current values (the largest h
    with >= h neighbors valued >= h); the sequence is monotonically
    non-increasing and converges exactly to coreness.  Per round: ONE
    native hash join (directed-both-ways edges x current values on the
    neighbor end), then a COARSE node-bucket ``map_groups`` (PERF.md #31
    — per-node h-index resolves VECTORIZED inside each bucket: sort by
    (node, value desc), 1-based cumcount, h = per-node sum of
    value >= rank), and convergence detection is one tiny Sum aggregate
    (monotonicity makes sum(c) a complete change detector).

    Size-gated driver fast path below ``driver_max_edges``: the classic
    O(m) peel (Batagelj & Zaversnik 2003) — pinned identical to the
    distributed fixpoint in tests (each forced explicitly).
    """
    import pandas as pd
    import pyarrow.compute as pc

    from engine.stages.common import as_arrow

    def canon(t: pa.Table) -> pa.Table:
        s, d = t.column(src_col), t.column(dst_col)
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"lo": pc.min_element_wise(s, d), "hi": pc.max_element_wise(s, d)}
        )

    und = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["lo", "hi"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "coreness": pa.array([], pa.int64())}
    )
    m = und.count()
    if m == 0:
        return ray.data.from_arrow(empty)
    if m <= driver_max_edges:
        return _kcore_driver(und)

    # both directions: one row per (node, neighbor)
    ndir = und.map_batches(
        lambda t: pa.table(
            {
                "node": pa.chunked_array(
                    [t.column("lo").combine_chunks(), t.column("hi").combine_chunks()]
                ),
                "nbr": pa.chunked_array(
                    [t.column("hi").combine_chunks(), t.column("lo").combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    cvals = (
        ndir.groupby("node")
        .aggregate(Count(alias_name="c"))
        .map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "c": t.column("c").cast(pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_nodes = cvals.count()
    npart = num_partitions or max(1, min(_join_partitions(), n_nodes))
    # power of two so bucketing is one Arrow bit_wise_and (pyarrow 16 has
    # no arithmetic mod kernel)
    n_buckets = 1 << max(0, min(256, n_nodes // 64).bit_length() - 1)

    def hindex_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["node", "cu"], ascending=[True, False], kind="mergesort")
        rank = df.groupby("node").cumcount() + 1
        ok = (df["cu"].to_numpy() >= rank.to_numpy()).astype(np.int64)
        out = (
            pd.DataFrame({"node": df["node"].to_numpy(), "h": ok})
            .groupby("node", as_index=False)["h"]
            .sum()
        )
        return pd.DataFrame(
            {
                "node": out["node"].to_numpy(np.int64),
                "c": out["h"].to_numpy(np.int64),
            }
        )

    prev_total = None
    for _ in range(max_rounds):
        nb = (
            ndir.join(
                cvals,
                join_type="inner",
                num_partitions=npart,
                on=("nbr",),
                right_on=("node",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "cu": t.column("c"),
                        "kb": pc.cast(
                            pc.bit_wise_and(
                                t.column("node"),
                                pa.scalar(n_buckets - 1, pa.int64()),
                            ),
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        cvals = as_arrow(
            nb.groupby("kb").map_groups(
                lambda df: hindex_bucket(df.drop(columns=["kb"])),
                batch_format="pandas",
            )
        ).materialize()
        total = cvals.sum("c") or 0
        if total == prev_total:
            break
        prev_total = total
    else:
        import logging

        # h-index convergence is O(graph-dependent rounds); an unconverged
        # exit returns UPPER BOUNDS on coreness — callers must not treat
        # it as exact (never hit in tests; belt for pathological graphs)
        logging.getLogger("engine.graph").warning(
            "kcore: h-index fixpoint not converged after %d rounds", max_rounds
        )
    return cvals.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "coreness": t.column("c").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _kcore_driver(und: ray.data.Dataset) -> ray.data.Dataset:
    """Driver-side O(m) bucket peel (Batagelj & Zaversnik 2003) over the
    deduped undirected edge table; identical contract to the distributed
    h-index fixpoint."""
    from engine.stages.common import collect_arrow_blocks

    blocks = collect_arrow_blocks(und)
    tbl = pa.concat_tables(blocks, promote_options="default")
    lo = tbl.column("lo").to_numpy(zero_copy_only=False)
    hi = tbl.column("hi").to_numpy(zero_copy_only=False)
    nodes, codes = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    li, hj = codes[: len(lo)], codes[len(lo) :]
    n = len(nodes)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, li, 1)
    np.add.at(deg, hj, 1)
    # adjacency as CSR
    adj_idx = np.concatenate([li, hj])
    adj_val = np.concatenate([hj, li])
    order = np.argsort(adj_idx, kind="stable")
    adj_val = adj_val[order]
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(adj_idx, minlength=n), out=starts[1:])
    # bucket peel
    core = deg.copy()
    md = int(deg.max())
    bins = np.zeros(md + 2, np.int64)
    np.cumsum(np.bincount(deg, minlength=md + 1), out=bins[1:])
    pos_of = np.argsort(deg, kind="stable")
    vert_pos = np.empty(n, np.int64)
    vert_pos[pos_of] = np.arange(n)
    bin_start = bins[:-1].copy()
    d = deg.copy()
    for i in range(n):
        v = pos_of[i]
        core[v] = d[v]
        for u in adj_val[starts[v] : starts[v + 1]]:
            if d[u] > d[v]:
                # swap u to the front of its degree bucket, decrement
                du = d[u]
                pu, pw = vert_pos[u], bin_start[du]
                w = pos_of[pw]
                if u != w:
                    pos_of[pu], pos_of[pw] = w, u
                    vert_pos[u], vert_pos[w] = pw, pu
                bin_start[du] += 1
                d[u] -= 1
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes.tolist(), pa.int64()),
                "coreness": pa.array(core.tolist(), pa.int64()),
            }
        )
    )


def trustrank(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    damping: float = 0.85,
    iters: int = 10,
    num_partitions: Optional[int] = None,
    driver_max_edges: int = 2_000_000,
) -> ray.data.Dataset:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    personalized PageRank whose teleport distributes over a TRUSTED SEED
    set instead of uniformly — trust flows out from vetted pages and
    decays with link distance, so link farms far from any seed score ~0
    however densely they interlink.  The web-spam demotion signal
    complementing ``bfs_hops``' raw seed distance.

        rank'(v) = (1-d)*t(v) + d*(sum_{u->v} rank(u)/outdeg(u)
                                    + dangling*t(v))

    with t uniform over the seeds (seeds absent from the graph still
    hold teleport mass — matches the numpy oracle).  Ranks sum to 1.

    Same per-round shape as ``pagerank`` (ONE edges x ranks join, one
    union+groupby Sum — the teleport column rides the zero-row union as
    a Max-aggregated constant, so no extra join); size-gated driver numpy
    path below ``driver_max_edges``, both pinned to the oracle in tests.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    edges = edges.map_batches(
        lambda t: pa.table({"src": t.column(src_col), "dst": t.column(dst_col)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    seed_tbl = (
        seeds.map_batches(
            lambda t: pa.table({"node": t.column(seed_col).cast(pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_seeds = seed_tbl.count()
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
    )
    if n_seeds == 0:
        return ray.data.from_arrow(empty)

    if edges.count() <= driver_max_edges:
        return _trustrank_driver(
            edges, seed_tbl, damping=damping, iters=iters
        )

    tele_v = 1.0 / n_seeds

    def both_ends(t: pa.Table) -> pa.Table:
        s, d = t.column("src").combine_chunks(), t.column("dst").combine_chunks()
        return pa.table({"node": pa.chunked_array([s, d])})

    nodes = (
        edges.map_batches(both_ends, batch_format="pyarrow", zero_copy_batch=True)
        .union(seed_tbl)
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["node"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_nodes = nodes.count()
    outdeg = edges.groupby("src").aggregate(Count(alias_name="outdeg")).materialize()
    n_src = max(1, outdeg.count())
    npart = num_partitions or max(1, min(_join_partitions(), n_nodes // 32, n_src))
    ew = (
        edges.join(
            outdeg, join_type="inner", num_partitions=npart, on=("src",)
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t.column("src"),
                    "dst": t.column("dst"),
                    "w": pa.compute.divide(
                        pa.scalar(1.0, pa.float64()),
                        t.column("outdeg").cast(pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    # zero-row union carrier: every node keeps a row AND its teleport
    seed_mark = seed_tbl.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "c": pa.array([0.0] * t.num_rows, pa.float64()),
                "tele": pa.array([tele_v] * t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    zeros = (
        nodes.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "c": pa.array([0.0] * t.num_rows, pa.float64()),
                    "tele": pa.array([0.0] * t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .union(seed_mark)
        .materialize()
    )

    ranks = seed_tbl.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array([tele_v] * t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    for _ in range(iters):
        contribs = ew.join(
            ranks,
            join_type="inner",
            num_partitions=npart,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("dst"),
                    "c": pa.compute.multiply(t.column("rank"), t.column("w")),
                    "tele": pa.array([0.0] * t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        summed = (
            contribs.union(zeros)
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"), Max("tele", alias_name="tele"))
            .materialize()
        )
        total_in = summed.sum("c") or 0.0
        dangling = max(0.0, 1.0 - total_in)
        coef = (1.0 - damping) + damping * dangling

        ranks = summed.map_batches(
            lambda t, _co=coef: pa.table(
                {
                    "node": t.column("node"),
                    "rank": pc.add(
                        pc.multiply(
                            pa.scalar(damping, pa.float64()), t.column("c")
                        ),
                        pc.multiply(
                            pa.scalar(_co, pa.float64()), t.column("tele")
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    return ranks


def _trustrank_driver(
    edges: ray.data.Dataset,
    seed_tbl: ray.data.Dataset,
    *,
    damping: float,
    iters: int,
) -> ray.data.Dataset:
    """Driver-side numpy TrustRank (gated small-graph path); identical
    formula to the distributed rounds."""
    from engine.stages.common import collect_arrow_blocks

    seed_ids = set()
    for b in collect_arrow_blocks(seed_tbl):
        seed_ids.update(b.column("node").to_pylist())
    blocks = collect_arrow_blocks(edges)
    if blocks:
        tbl = pa.concat_tables(blocks, promote_options="default")
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    else:
        src = np.asarray([], np.int64)
        dst = np.asarray([], np.int64)
    nodes = np.unique(
        np.concatenate([src, dst, np.fromiter(seed_ids, np.int64,
                                               count=len(seed_ids))])
    )
    idx = {int(v): i for i, v in enumerate(nodes)}
    si = np.fromiter((idx[int(x)] for x in src), np.int64, count=len(src))
    di = np.fromiter((idx[int(x)] for x in dst), np.int64, count=len(dst))
    n = len(nodes)
    tele = np.zeros(n)
    for s in seed_ids:
        tele[idx[int(s)]] = 1.0 / len(seed_ids)
    outdeg = np.zeros(n)
    np.add.at(outdeg, si, 1.0)
    dangling_mask = outdeg == 0
    safe_out = np.where(dangling_mask, 1.0, outdeg)
    r = tele.copy()
    d = damping
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] / safe_out[si])
        dangling = float(r[dangling_mask].sum())
        r = (1.0 - d) * tele + d * (contrib + dangling * tele)
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes.tolist(), pa.int64()),
                "rank": pa.array(r, pa.float64()),
            }
        )
    )
