"""Join operators: partitioned hash join and as-of join.

The reference has only broadcast lookup joins (SURVEY.md §2.5); a complete
training-data engine also needs large×large joins:

- ``hash_join`` — Ray Data's native ``Dataset.join`` (hash-partitioned on
  the key) when both sides are big.
- ``bucketed_hash_join`` — the explicit portable pattern from the Ray
  guide: add ``bucket = key_hash % B`` to both sides, group each bucket,
  join matching buckets pairwise inside map_groups.  Same semantics; kept
  as the documented fallback (and to make the partitioning explicit for
  skew analysis: salt hot keys into sub-buckets by also hashing a second
  column when one key dominates).
- ``asof_join`` — per-key backward as-of (greatest right ts <= left ts):
  bucket by key, ``pd.merge_asof`` per sorted group.  Matches DuckDB's
  ``ASOF JOIN`` semantics (inner; ties on the right broken BEFORE the join
  by deduplicating to one row per (key, ts) — as-of tie-break is otherwise
  engine-defined and non-portable).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _arrow_types(ds: ray.data.Dataset) -> "dict[str, pa.DataType]":
    """name -> Arrow type for any Dataset, including pandas-backed ones
    (whose ``schema().base_schema`` is a PandasBlockSchema namedtuple, not a
    pyarrow.Schema — iterating it as fields crashes)."""
    sch = ds.schema()
    base = sch.base_schema
    if isinstance(base, pa.Schema):
        return {f.name: f.type for f in base}
    out = {}
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            out[name] = typ
        else:
            try:
                out[name] = pa.from_numpy_dtype(typ)
            except pa.ArrowNotImplementedError:
                out[name] = pa.string()  # pandas object columns are strings here
    return out


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    join_type: str = "inner",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Native hash-partitioned join (both sides shuffled on the key)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def bucketed_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Explicit partitioned inner hash join (portable pattern).

    Both sides get ``bucket = hash(key) % B``; a single groupby('bucket',
    side-tagged union) brings matching buckets together and a pandas merge
    joins them.  One all-to-all exchange total.
    """
    right_on = right_on or on

    # deterministic bucket from the key's string form (never Python hash())
    from hashlib import blake2b

    def add_bucket(t: pa.Table, key: str, side: int) -> pa.Table:
        bs = [
            int.from_bytes(blake2b(str(k).encode(), digest_size=4).digest(), "big")
            % num_buckets
            for k in t.column(key).to_pylist()
        ]
        t = t.append_column("bucket", pa.array(bs, pa.int32()))
        return t.append_column("_side", pa.array([side] * t.num_rows, pa.int8()))

    l = left.map_batches(
        lambda t: add_bucket(t, on, 0), batch_format="pyarrow", zero_copy_batch=True
    )
    r = right.map_batches(
        lambda t: add_bucket(t, right_on, 1), batch_format="pyarrow", zero_copy_batch=True
    )

    ltypes, rtypes = _arrow_types(left), _arrow_types(right)
    lcols, rcols = list(ltypes), list(rtypes)
    # the side-tagged union carries the other side's columns as nulls, which
    # promotes pandas int columns to float64 — cast back after the (inner,
    # hence null-free) merge
    int_cols = {
        c: "int64"
        for c, t in {**ltypes, **rtypes}.items()
        if pa.types.is_integer(t)
    }

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df["_side"] == 0][lcols + ["bucket"]].drop(columns=["bucket"])
        rdf = df[df["_side"] == 1][rcols + ["bucket"]].drop(columns=["bucket"])
        out = ldf.merge(rdf, left_on=on, right_on=right_on, how="inner")
        return out.astype({c: t for c, t in int_cols.items() if c in out.columns})

    return l.union(r).groupby("bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    left_ts: str,
    right_ts: str,
    right_by: Optional[str] = None,
    right_value_cols: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Backward as-of join: for each left row, the right row of the same key
    with the greatest ``right_ts`` <= ``left_ts``; left rows with no match
    are dropped (DuckDB ASOF JOIN inner semantics).

    Partitioning assumption (documented per the build brief): rows are
    hash-grouped by ``by``; each key's group must fit a task.  For skewed
    keys, range-partition ``left_ts`` within the hot key and replicate the
    right side per range.
    """
    right_by = right_by or by
    rschema = _arrow_types(right)
    rv = right_value_cols or [
        n for n in rschema if n not in (right_by, right_ts)
    ]

    # Union requires aligned schemas: each side carries the other side's
    # columns as typed nulls (types taken from the source schemas).
    lschema = _arrow_types(left)
    lcols = list(lschema)
    r_out_types = {right_ts: rschema[right_ts], **{c: rschema[c] for c in rv}}

    canon = list(lcols) + [c for c in ([right_ts] + rv) if c not in lcols] + ["_side"]

    def pad_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        for c, typ in r_out_types.items():
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(n, typ))
        return t.append_column("_side", pa.array([0] * n, pa.int8())).select(canon)

    def pad_right(t: pa.Table) -> pa.Table:
        t = t.select([right_by, right_ts] + rv).rename_columns([by, right_ts] + rv)
        n = t.num_rows
        for c in lcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(n, lschema[c]))
        return t.append_column("_side", pa.array([1] * n, pa.int8())).select(canon)

    l = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
    r = right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df["_side"] == 0][lcols].sort_values(left_ts, kind="mergesort")
        # Deterministic tie-break INSIDE the operator: duplicate (key, ts)
        # right rows would otherwise surface whichever row arrived last in
        # the shuffle.  Sort by (ts, *values) and keep the last per ts —
        # the max value-tuple wins, independent of arrival order.
        rdf = (
            df[df["_side"] == 1][[by, right_ts] + rv]
            .sort_values([right_ts] + rv, kind="mergesort")
            .drop_duplicates(subset=[right_ts], keep="last")
        )
        if ldf.empty or rdf.empty:
            empty = ldf.head(0).copy()
            for c in rv:
                empty[c] = pd.Series([], dtype=rdf[c].dtype)
            return empty[lcols + rv]
        out = pd.merge_asof(
            ldf,
            rdf.drop(columns=[by]),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
        )
        out = out[out[right_ts].notna()]
        return out[lcols + rv]

    return l.union(r).groupby(by).map_groups(merge_group, batch_format="pandas")


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    right_by: Optional[str] = None,
    right_value_cols: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Interval/range join: left rows matched to every right interval of the
    same key with ``right_start <= left_ts < right_end``.

    Same partitioning as asof_join (hash-group by key; per-group numpy
    interval scan).  Emits one output row per (left row, matching interval)
    pair — inner semantics, like a SQL inequality join.
    """
    right_by = right_by or by
    rv = right_value_cols or [
        n for n in right.schema().names if n not in (right_by, right_start, right_end)
    ]
    lschema = _arrow_types(left)
    rschema = _arrow_types(right)
    lcols = list(lschema)
    canon = list(lcols) + [right_start, right_end] + rv + ["_side"]

    def pad_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        for c in [right_start, right_end] + rv:
            t = t.append_column(c, pa.nulls(n, rschema[c]))
        return t.append_column("_side", pa.array([0] * n, pa.int8())).select(canon)

    def pad_right(t: pa.Table) -> pa.Table:
        t = t.select([right_by, right_start, right_end] + rv).rename_columns(
            [by, right_start, right_end] + rv
        )
        n = t.num_rows
        for c in lcols:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(n, lschema[c]))
        return t.append_column("_side", pa.array([1] * n, pa.int8())).select(canon)

    l = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
    r = right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)

    def join_group(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df["_side"] == 0][lcols]
        rdf = df[df["_side"] == 1][[right_start, right_end] + rv]
        out_cols = lcols + [right_start, right_end] + rv
        if ldf.empty or rdf.empty:
            empty = ldf.head(0).copy()
            for c in [right_start, right_end] + rv:
                empty[c] = pd.Series([], dtype=rdf[c].dtype if not rdf.empty else "object")
            return empty[out_cols]
        lv = ldf[left_ts].to_numpy()
        starts = rdf[right_start].to_numpy()
        ends = rdf[right_end].to_numpy()
        li, ri = [], []
        for j in range(len(rdf)):
            hits = np.nonzero((lv >= starts[j]) & (lv < ends[j]))[0]
            li.extend(hits.tolist())
            ri.extend([j] * len(hits))
        out = ldf.iloc[li].reset_index(drop=True)
        radd = rdf.iloc[ri].reset_index(drop=True)
        for c in [right_start, right_end] + rv:
            out[c] = radd[c]
        return out[out_cols]

    return l.union(r).groupby(by).map_groups(join_group, batch_format="pandas")


def outer_groupjoin(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key_col: str,
    right_value_col: str,
) -> ray.data.Dataset:
    """FULL OUTER join + per-key aggregate in one exchange — the
    schema-safe outer-join device this repo standardizes on: acero's
    native outer join loses schema when a hash partition is empty on one
    side (CLAUDE.md), so both sides are UNIONED as tagged partial rows
    and ONE ``groupby(key)`` aggregates them.  Emits per key:
    ``(key, left_present, n_right, sum_value)`` — keys present on either
    side survive, missing sides show 0 (the relational outer-join NULL,
    kept as int64 0/absent-count so the schema never widens to nullable
    floats — pandas promotes int64+null to float64).

    Left is assumed key-unique (a dimension); right is the fact side.
    One shuffle total; nothing is broadcast, so it holds when BOTH sides
    are corpus-sized.  Any richer outer join (row-level payloads) should
    hang the payload columns on the partial rows the same way.
    """
    from ray.data.aggregate import Max, Sum

    lp = left.map_batches(
        lambda t: pa.table(
            {
                key_col: t.column(key_col).cast(pa.int64()),
                "left_present": pa.array([1] * t.num_rows, pa.int64()),
                "n_right": pa.array([0] * t.num_rows, pa.int64()),
                "sum_value": pa.array([0] * t.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rp = right.map_batches(
        lambda t: pa.table(
            {
                key_col: t.column(key_col).cast(pa.int64()),
                "left_present": pa.array([0] * t.num_rows, pa.int64()),
                "n_right": pa.array([1] * t.num_rows, pa.int64()),
                "sum_value": t.column(right_value_col).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        lp.union(rp)
        .groupby(key_col)
        .aggregate(
            Max("left_present", alias_name="left_present"),
            Sum("n_right", alias_name="n_right"),
            Sum("sum_value", alias_name="sum_value"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    key_col: t.column(key_col),
                    "left_present": t.column("left_present").cast(pa.int64()),
                    "n_right": t.column("n_right").cast(pa.int64()),
                    "sum_value": t.column("sum_value").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def _edit_distance_leq1(a: str, b: str) -> bool:
    """Exact Levenshtein <= 1 in O(n): length gate, then one scan
    (substitution for equal lengths, single skip for off-by-one)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def fuzzy_join(
    ds: ray.data.Dataset,
    *,
    text_col: str = "title",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Edit-distance-1 string similarity SELF-join (FastSS: Bocek,
    Hunt & Stiller 2007): all pairs of DISTINCT strings with Levenshtein
    distance exactly 1 — the near-identical-title / query-typo clustering
    join (fuzzy_search answers one query; this finds every pair).

    Candidate generation is the deletion neighborhood: two strings with
    ED <= 1 necessarily share a member of {s} ∪ {s minus one char}
    (substitution: delete the differing position from both; indel: the
    shorter string IS a deletion variant of the longer).  Complete, no
    misses; candidates then verify with the exact O(n) <= 1 check.

    Shapes: distinct strings via ONE groupby; per batch each string
    emits its <= len+1 variants keyed by a 63-bit FNV bucket; ONE
    coarse-bucket groupby resolves candidate pairs VECTORIZED inside the
    bucket (pandas merge on the variant hash, not per-variant Python
    groups — PERF.md #31); pair dedup is a final groupby.  Variant
    volume is O(total string chars) — linear, never the quadratic cross
    join the oracle runs at test scale."""
    import pandas as pd
    import pyarrow.compute as pc  # noqa: F401

    from engine.stages.common import as_arrow
    from engine.stages.text import fnv1a_batch
    from ray.data.aggregate import Count

    nb = 1 << max(0, n_buckets.bit_length() - 1)
    MASK = np.uint64((1 << 63) - 1)

    distinct = (
        ds.map_batches(
            lambda t: pa.table({"s": t.column(text_col).cast(pa.string())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("s")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["s"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def variants(t: pa.Table) -> pa.Table:
        strs, keys = [], []
        for s in t.column("s").to_pylist():
            vs = {s}
            for i in range(len(s)):
                vs.add(s[:i] + s[i + 1 :])
            for v in vs:
                strs.append(s)
                keys.append(v.encode("utf-8"))
        if not strs:
            return pa.table(
                {
                    "s": pa.array([], pa.string()),
                    "vh": pa.array([], pa.int64()),
                    "vb": pa.array([], pa.int64()),
                }
            )
        vh = (fnv1a_batch(keys) & MASK).astype(np.int64)
        return pa.table(
            {
                "s": pa.array(strs, pa.string()),
                "vh": pa.array(vh, pa.int64()),
                "vb": pa.array(vh & np.int64(nb - 1), pa.int64()),
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"title_a": pd.Series([], dtype="string"),
                                 "title_b": pd.Series([], dtype="string")})
        m = df.merge(df, on="vh")
        m = m[m["s_x"] < m["s_y"]].drop_duplicates(["s_x", "s_y"])
        keep = [
            _edit_distance_leq1(a, b) and a != b
            for a, b in zip(m["s_x"], m["s_y"])
        ]
        m = m[np.asarray(keep, bool)] if len(m) else m
        return pd.DataFrame(
            {
                "title_a": m["s_x"].astype("string"),
                "title_b": m["s_y"].astype("string"),
            }
        )

    cand = as_arrow(
        distinct.map_batches(
            variants, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vb")
        .map_groups(
            lambda df: pairs(df.drop(columns=["vb"])), batch_format="pandas"
        )
    )
    # a pair can surface from several shared variants across buckets
    return (
        cand.groupby(["title_a", "title_b"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: t.select(["title_a", "title_b"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def setsim_join(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tk",
    tau_num: int = 6,
    tau_den: int = 10,
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """EXACT token-set similarity self-join with PREFIX FILTERING
    (PPJoin family: Xiao, Wang, Lin & Yu, WWW 2008): all id pairs whose
    token sets have Jaccard >= tau (a rational ``tau_num/tau_den`` so
    the threshold compare is exact integer cross-multiplication:
    ``tau_den * |A∩B| >= tau_num * |A∪B|``).  The exact counterpart to
    the MinHash-LSH band family — no false negatives, no probability.

    Prefix filter: order every set by a GLOBAL token order (lexicographic
    — frequency ordering only changes candidate volume, never
    correctness); a pair with Jaccard >= tau must share at least one
    token among each side's first ``|s| - ceil(tau*|s|) + 1`` tokens, so
    each record is keyed only by its prefix tokens.  Candidate volume is
    sum-of-prefix-lengths, never the cross join the oracle runs at test
    scale.

    Shapes: one map_batches emits (prefix-token-bucket, id, sorted token
    list); ONE coarse-bucket groupby resolves candidates and verifies
    the exact Jaccard VECTORIZED per bucket (pandas merge on the prefix
    token hash, set intersection on the short sorted lists); pair dedup
    (a pair can share several prefix tokens) is a final groupby Min —
    output ``(id_a, id_b, inter, uni)``.
    """
    import pandas as pd
    import pyarrow.compute as pc  # noqa: F401

    from engine.stages.common import as_arrow
    from engine.stages.text import fnv1a_batch
    from ray.data.aggregate import Min

    nb = 1 << max(0, n_buckets.bit_length() - 1)
    MASK = np.uint64((1 << 63) - 1)

    def prefixes(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pid": pa.array([], pa.int64()),
                "toks": pa.array([], pa.string()),
                "ph": pa.array([], pa.int64()),
                "pb": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids_out, toks_out, keys = [], [], []
        for did, toks in zip(
            t.column(id_col).to_pylist(), t.column(tokens_col).to_pylist()
        ):
            s = sorted(set(toks or ()))
            if not s:
                continue
            k = len(s)
            # ceil(tau*k) = ceil(tau_num*k / tau_den)
            plen = k - (-(-tau_num * k // tau_den)) + 1
            joined = "\x1f".join(s)
            for tok in s[: max(1, plen)]:
                ids_out.append(did)
                toks_out.append(joined)
                keys.append(tok.encode("utf-8"))
        if not ids_out:
            return empty
        ph = (fnv1a_batch(keys) & MASK).astype(np.int64)
        return pa.table(
            {
                "pid": pa.array(ids_out, pa.int64()),
                "toks": pa.array(toks_out, pa.string()),
                "ph": pa.array(ph, pa.int64()),
                "pb": pa.array(ph & np.int64(nb - 1), pa.int64()),
            }
        )

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": np.asarray([], np.int64),
                "id_b": np.asarray([], np.int64),
                "inter": np.asarray([], np.int64),
                "uni": np.asarray([], np.int64),
            }
        )
        if len(df) < 2:
            return empty
        m = df.merge(df, on="ph")
        m = m[m["pid_x"] < m["pid_y"]].drop_duplicates(["pid_x", "pid_y"])
        if not len(m):
            return empty
        ia, ib, inters, unis = [], [], [], []
        for pa_, pb_, ta, tb in zip(
            m["pid_x"], m["pid_y"], m["toks_x"], m["toks_y"]
        ):
            sa, sb = set(ta.split("\x1f")), set(tb.split("\x1f"))
            inter = len(sa & sb)
            uni = len(sa) + len(sb) - inter
            if tau_den * inter >= tau_num * uni:
                ia.append(pa_)
                ib.append(pb_)
                inters.append(inter)
                unis.append(uni)
        return pd.DataFrame(
            {
                "id_a": np.asarray(ia, np.int64),
                "id_b": np.asarray(ib, np.int64),
                "inter": np.asarray(inters, np.int64),
                "uni": np.asarray(unis, np.int64),
            }
        )

    cand = as_arrow(
        ds.map_batches(prefixes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(
            lambda df: candidates(df.drop(columns=["pb"])),
            batch_format="pandas",
        )
    )
    return (
        cand.groupby(["id_a", "id_b"])
        .aggregate(Min("inter", alias_name="inter"), Min("uni", alias_name="uni"))
        .map_batches(
            lambda t: pa.table(
                {
                    "id_a": t.column("id_a"),
                    "id_b": t.column("id_b"),
                    "inter": t.column("inter").cast(pa.int64()),
                    "uni": t.column("uni").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
