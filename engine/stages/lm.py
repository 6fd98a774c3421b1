"""Unigram language-model scoring (perplexity-style quality signal).

CCNet (Wenzek et al., arXiv:1911.00359) ranks web documents by language-
model perplexity to split a crawl into quality buckets; the reference
pipeline's corpus feeds exactly such filters downstream.  A full
Kneser-Ney/transformer LM needs model weights this environment doesn't
have, but the unigram LM is self-contained: train on the corpus itself in
one distributed pass (token -> collection frequency cf, total N), then
score every document by its mean negative log-likelihood

    nll(d) = -(1/dl) * sum_{distinct t in d} tf_t * ln(cf_t / N)

(perplexity = exp(nll), monotone — the ranking and bucketing signal is
identical, so the exp is left to the caller).

Bit-reproducibility device (stronger than bm25's rank-only output): both
the engine and the DuckDB oracle accumulate the per-token components
``tf * ln(cf/N)`` in TOKEN-ASCENDING order with a left-to-right ``+``
chain (Python loop here; ``list_reduce(list(c ORDER BY token), ...)``
there).  ln/division/multiplication on identical doubles are identical
libm calls, and an ordered float sum has exactly one result — so the
fixed-point ``nll_nanonat = floor(-1e9 * lp / dl)`` is hash-verifiable
for every document, not just rank-stable.

Scale plan (100 TB):

1. Model pass: per-batch Counter partials -> groupby(token).Sum — the
   shuffle carries (token, cf) rows, never text.  Vocabulary under the
   webtext tokenizer is bounded (~1e7-1e8 distinct tokens), orders of
   magnitude below corpus size.
2. Scoring: vocab <= ``head_max`` broadcasts {token: ln(cf/N)} once
   (``ray.put``, read per actor) — one streaming pass, no shuffle.
3. Above the gate (hybrid, pinned identical by tests): the HEAD — the
   ``head_max`` most frequent tokens, which by Zipf carry almost all
   occurrences — still broadcasts, and head hits resolve map-side; only
   TAIL tokens (cf below the head threshold, so every token-group is
   small by construction — no hot keys) resolve through a union +
   groupby(token) semi-join against the model rows.  Per-doc components
   then regroup by doc_id (volume = the sparse tf table, standard
   inverted-index exchange; text never shuffles) and sum in token order.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List

import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from engine.stages.text import _TOKEN


def _cf_table(ds: ray.data.Dataset, text_col: str) -> ray.data.Dataset:
    """One distributed pass: (token, cf) — per-batch Counter partials so
    the shuffle moves distinct-token rows, never positions or text."""

    def partials(t: pa.Table) -> pa.Table:
        cf: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            cf.update(_TOKEN.findall(txt or ""))
        toks = list(cf.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "cf": pa.array([cf[tok] for tok in toks], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cf", alias_name="cf"))
        .materialize()
    )


def _out_table(id_arr, dls: List[int], nlls: List[int]) -> pa.Table:
    return pa.table(
        {
            "doc_id": id_arr,
            "n_tokens": pa.array(dls, pa.int64()),
            "nll_nanonat": pa.array(nlls, pa.int64()),
        }
    )


def _fixed_point(lp: float, dl: int) -> int:
    # identical expression shape to the oracle's
    # floor(-1000000000.0 * lp / dl): (-1e9 * lp) then / dl, then floor
    return math.floor((-1e9 * lp) / dl) if dl else 0


def unigram_nll(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_max: int = 5_000_000,
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Mean negative log-likelihood under the corpus's own unigram LM:
    (id_col, n_tokens, nll_nanonat[, *keep_cols]) per document (module
    docstring).  ``keep_cols`` carries per-doc metadata (e.g. a language
    column) through the scoring pass join-free: on the broadcast head
    path they ride the same batch; on the hybrid scale path they travel
    on the per-doc dl sentinel row, so the downstream bucketing join the
    composition would otherwise need never happens."""
    cf_ds = _cf_table(ds, text_col)
    vocab = cf_ds.count()
    n_total = int(cf_ds.sum("cf") or 0)

    def _lp_map(tbl: pa.Table) -> Dict[str, float]:
        return {
            tok: math.log(c / n_total)
            for tok, c in zip(
                tbl.column("token").to_pylist(), tbl.column("cf").to_pylist()
            )
        }

    if vocab <= head_max:
        if vocab == 0:
            ref = ray.put({})
        else:
            ref = ray.put(
                _lp_map(
                    pa.concat_tables(
                        ray.get(cf_ds.to_arrow_refs()), promote_options="default"
                    )
                )
            )

        def score(t: pa.Table) -> pa.Table:
            lpm = ray.get(ref)
            dls, nlls = [], []
            for txt in t.column(text_col).to_pylist():
                cnt = Counter(_TOKEN.findall(txt or ""))
                dl = sum(cnt.values())
                acc = 0.0
                for tok in sorted(cnt):  # token-asc, left-to-right: the
                    acc += cnt[tok] * lpm[tok]  # oracle's list_reduce order
                dls.append(dl)
                nlls.append(_fixed_point(acc, dl))
            out = _out_table(t.column(id_col), dls, nlls)
            for c in keep_cols:
                out = out.append_column(c, t.column(c))
            return out

        return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # --- hybrid scale path: broadcast head + token-keyed tail semi-join ---
    head_tabs = (
        ray.get(
            cf_ds.sort(key=["cf", "token"], descending=[True, False])
            .limit(head_max)
            .to_arrow_refs()
        )
        if head_max > 0
        else []
    )
    head_tbl = (
        pa.concat_tables(head_tabs, promote_options="default")
        if head_tabs
        else pa.table(
            {"token": pa.array([], pa.string()), "cf": pa.array([], pa.int64())}
        )
    )
    href = ray.put(_lp_map(head_tbl))
    from engine.stages.join import _arrow_types

    src_types = _arrow_types(ds)
    id_type = src_types.get(id_col, pa.int64())
    kc_types = {c: src_types.get(c, pa.string()) for c in keep_cols}

    def comp_rows(t: pa.Table) -> pa.Table:
        """Per (doc, distinct token): resolved comp rows for head tokens,
        pending (comp=NaN) rows for tail tokens, plus one dl sentinel row
        per doc (token '', comp 0.0 — sorts first, adds an exact 0).
        keep_cols values ride ONLY the sentinel row (None elsewhere)."""
        lpm = ray.get(href)
        out_id, out_tok, out_tf, out_comp = [], [], [], []
        out_kc: Dict[str, list] = {c: [] for c in keep_cols}
        kc_src = {c: t.column(c).to_pylist() for c in keep_cols}
        for i, (d, txt) in enumerate(
            zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist())
        ):
            cnt = Counter(_TOKEN.findall(txt or ""))
            out_id.append(d)
            out_tok.append("")
            out_tf.append(sum(cnt.values()))  # dl sentinel
            out_comp.append(0.0)
            for c in keep_cols:
                out_kc[c].append(kc_src[c][i])
            for tok, c in cnt.items():
                lp = lpm.get(tok)
                out_id.append(d)
                out_tok.append(tok)
                out_tf.append(c)
                out_comp.append(c * lp if lp is not None else math.nan)
                for kc in keep_cols:
                    out_kc[kc].append(None)
        cols = {
            id_col: pa.array(out_id, id_type),
            "token": pa.array(out_tok, pa.string()),
            "tf": pa.array(out_tf, pa.int64()),
            "comp": pa.array(out_comp, pa.float64()),
        }
        for c in keep_cols:
            cols[c] = pa.array(out_kc[c], kc_types[c])
        return pa.table(cols)

    rows = ds.map_batches(comp_rows, batch_format="pyarrow", zero_copy_batch=True)

    import pyarrow.compute as pc

    pending = rows.map_batches(
        lambda t: t.filter(pc.is_nan(t.column("comp"))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    resolved = rows.map_batches(
        lambda t: t.filter(pc.invert(pc.is_nan(t.column("comp")))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # explicit type: an empty value set would otherwise be null-typed
    head_tokens = pa.array(head_tbl.column("token").to_pylist(), pa.string())

    def model_rows(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("token"), value_set=head_tokens)
        tail = t.filter(pc.invert(mask))
        n = tail.num_rows
        cols = {
            id_col: pa.array([None] * n, id_type),
            "token": tail.column("token"),
            "tf": tail.column("cf"),
            "comp": pa.array([math.nan] * n, pa.float64()),
        }
        for c in keep_cols:
            cols[c] = pa.array([None] * n, kc_types[c])
        return pa.table(cols)

    # tail model rows ride the same union; tail groups are small by
    # construction (cf < the head threshold), so no hot token keys
    tail_model = cf_ds.map_batches(
        model_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def resolve(df):
        import pandas as pd

        model = df[df[id_col].isna()]
        lp = math.log(int(model["tf"].iloc[0]) / n_total)
        occ = df[df[id_col].notna()]
        out = {
            id_col: occ[id_col].astype("int64")
            if pa.types.is_integer(id_type)
            else occ[id_col],
            "token": occ["token"],
            "tf": occ["tf"].astype("int64"),
            "comp": occ["tf"].astype("int64") * lp,
        }
        for c in keep_cols:  # pending rows never carry keep values
            out[c] = pd.Series([None] * len(occ), index=occ.index, dtype="object")
        return pd.DataFrame(out)

    def to_arrow(df) -> pa.Table:
        # the final groupby sorts; its input blocks must all be Arrow
        # (mixing pandas map_groups blocks with Arrow blocks trips the
        # sort boundary sampler's block-type assertion)
        cols = {
            id_col: pa.array(df[id_col], id_type),
            "token": pa.array(df["token"], pa.string()),
            "tf": pa.array(df["tf"], pa.int64()),
            "comp": pa.array(df["comp"], pa.float64()),
        }
        for c in keep_cols:
            cols[c] = pa.array(df[c], kc_types[c])
        return pa.table(cols)

    tail_resolved = (
        pending.union(tail_model)
        .groupby("token")
        .map_groups(resolve, batch_format="pandas")
        .map_batches(to_arrow, batch_format="pandas")
    )

    def doc_sum(df):
        import pandas as pd

        df = df.sort_values("token", kind="mergesort")
        sentinel = df[df["token"] == ""]
        dl = int(sentinel["tf"].iloc[0])
        acc = 0.0
        for v in df.loc[df["token"] != "", "comp"].tolist():
            acc += v
        d = df[id_col].iloc[0]
        out = {
            id_col: pd.Series([d], dtype=df[id_col].dtype),
            "n_tokens": pd.Series([dl], dtype="int64"),
            "nll_nanonat": pd.Series([_fixed_point(acc, dl)], dtype="int64"),
        }
        for c in keep_cols:  # metadata rides the sentinel row only
            out[c] = pd.Series([sentinel[c].iloc[0]], dtype="object")
        return pd.DataFrame(out)

    return (
        resolved.union(tail_resolved)
        .groupby(id_col)
        .map_groups(doc_sum, batch_format="pandas")
    )


def ppl_buckets(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    q_low: float = 0.25,
    q_high: float = 0.75,
    head_max: int = 5_000_000,
) -> ray.data.Dataset:
    """CCNet-style per-language perplexity bucketing (Wenzek et al.,
    arXiv:1911.00359 §4.3: split each language's documents into
    head/middle/tail by LM perplexity; reference pipelines feed exactly
    such buckets downstream of the indexer's corpus).

    Output: (id_col, lang_col, nll_nanonat, bucket) — bucket is 'head'
    when nll <= the language's q_low discrete quantile (low nll = fluent),
    'tail' when nll > the q_high quantile, else 'middle'.  Integer
    fixed-point nll + discrete quantiles keep it bit-verifiable in SQL.

    Shape at 100 TB: unigram_nll carries lang join-free (keep_cols);
    the skinny (id, lang, 2×int64) signal table is checkpointed once
    because it has two consumers (threshold scan + bucket map) — ~40
    bytes/doc, not the text corpus.  Thresholds are one row per language
    (driver-sized) and broadcast; bucket assignment is a stateless
    vectorized map — no further shuffle.
    """
    import numpy as np

    scored = unigram_nll(
        ds, id_col=id_col, text_col=text_col, head_max=head_max,
        keep_cols=(lang_col,),
    ).materialize()  # two consumers; skinny signal table, never text

    from engine.stages.quantiles import grouped_quantiles_disc

    th = grouped_quantiles_disc(
        scored, group_col=lang_col, value_col="nll_nanonat", qs=(q_low, q_high)
    )
    # (lang, q<lo>, q<hi>, n_rows) — select threshold columns by NAME
    # (grouped_quantiles_disc labels them q{float}); quantile_disc picks
    # stored values, so the float->int64 cast below is exact
    thr = {
        g: (int(lo), int(hi))
        for g, lo, hi in zip(
            th.column(lang_col).to_pylist(),
            th.column(f"q{q_low}").to_pylist(),
            th.column(f"q{q_high}").to_pylist(),
        )
    }
    tref = ray.put(thr)

    def bucket(t: pa.Table) -> pa.Table:
        tm = ray.get(tref)
        langs = t.column(lang_col).to_pylist()
        nll = np.asarray(t.column("nll_nanonat").to_pylist(), dtype=np.int64)
        lo = np.array([tm[g][0] for g in langs], dtype=np.int64)
        hi = np.array([tm[g][1] for g in langs], dtype=np.int64)
        lab = np.select([nll <= lo, nll > hi], ["head", "tail"], default="middle")
        return pa.table(
            {
                id_col: t.column(id_col),
                lang_col: pa.array(langs, pa.string()),
                "nll_nanonat": pa.array(nll, pa.int64()),
                "bucket": pa.array(lab.tolist(), pa.string()),
            }
        )

    return scored.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)


def source_kl(
    ds: ray.data.Dataset,
    *,
    group_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-slice corpus drift: KL(p_slice || p_corpus) over unigram
    distributions, one row ``(group_col, n_tokens, kl_nanonat)`` per
    slice with at least one token.  The monitoring signal behind mixture
    rebalancing (which sources diverge from the corpus-wide token
    distribution).

    Fixed-point convention (STRONGER than the unigram_nll ordering
    device): each (slice, token) contribution

        floor(1e9 * (c_st/N_s) * (ln(c_st/N_s) - ln(c_t/N)))

    is floored to integer nanonats INDIVIDUALLY, so the per-slice total
    is an integer sum — order-independent, shuffle-friendly, and exactly
    SQL-expressible with no list_reduce ordering contract.

    Scale shape: per-batch Counter partials (slice, token, cnt) — the
    shuffle never carries text or positions; ONE groupby keyed on a
    COARSE token-hash bucket (fnv % n_buckets, the PERF.md #31 device:
    per-group Python overhead paid n_buckets times, not vocab times)
    resolves global c_st and c_t vectorized within the bucket (every row
    of a token lands in one bucket by construction); per-slice totals
    N_s are driver-sized (slices are a handful) and reduce on the driver
    (PERF.md #24).  Bucket outputs are <= n_slices rows each and merge
    on the driver."""
    import numpy as np

    from engine.stages.common import collect_arrow_blocks
    from engine.stages.text import hash_bucket_column

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, txt in zip(
            t.column(group_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            for tok in _TOKEN.findall(txt or ""):
                c[(g, tok)] += 1
        items = list(c.items())
        return pa.table(
            {
                group_col: pa.array([g for (g, _), _ in items], pa.string()),
                "token": pa.array([tok for (_, tok), _ in items], pa.string()),
                "cnt": pa.array([n for _, n in items], pa.int64()),
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # N_s: slices are driver-sized — per-block pyarrow group_by partials,
    # reduced on the driver
    n_s: Dict[str, int] = {}
    for blk in collect_arrow_blocks(
        partials.map_batches(
            lambda t: t.group_by(group_col).aggregate([("cnt", "sum")]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        required_col="cnt_sum",
    ):
        for g, n in zip(
            blk.column(group_col).to_pylist(), blk.column("cnt_sum").to_pylist()
        ):
            n_s[g] = n_s.get(g, 0) + int(n)
    if not n_s:
        return ray.data.from_arrow(
            pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n_tokens": pa.array([], pa.int64()),
                    "kl_nanonat": pa.array([], pa.int64()),
                }
            )
        )
    n_total = sum(n_s.values())

    def add_bucket(t: pa.Table) -> pa.Table:
        return hash_bucket_column(t, "token", n_buckets)

    def resolve(df, n_s=n_s, n_total=n_total):
        import pandas as pd

        cst = (
            df.groupby([group_col, "token"], sort=False)["cnt"].sum().reset_index()
        )
        ctt = cst.groupby("token", sort=False)["cnt"].sum()
        ct = cst["token"].map(ctt)
        acc: Counter = Counter()
        for g, c_st, c_t in zip(cst[group_col], cst["cnt"], ct):
            c_st, c_t = int(c_st), int(c_t)
            ns_g = n_s[g]
            acc[g] += math.floor(
                1000000000.0
                * (c_st / ns_g)
                * (math.log(c_st / ns_g) - math.log(c_t / n_total))
            )
        return pd.DataFrame(
            {group_col: list(acc.keys()), "k": list(acc.values())}
        )

    kl: Dict[str, int] = {g: 0 for g in n_s}
    bucketed = (
        partials.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(resolve, batch_format="pandas")
    )
    for blk in collect_arrow_blocks(bucketed, required_col="k"):
        for g, k in zip(blk.column(group_col).to_pylist(), blk.column("k").to_pylist()):
            kl[g] += int(k)

    groups = sorted(n_s)
    return ray.data.from_arrow(
        pa.table(
            {
                group_col: pa.array(groups, pa.string()),
                "n_tokens": pa.array([n_s[g] for g in groups], pa.int64()),
                "kl_nanonat": pa.array([kl[g] for g in groups], pa.int64()),
            }
        )
    )


def bigram_nll(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Conditional bigram negative log-likelihood (one step from the
    unigram signal toward CCNet's KenLM): per document,

        nll2_sum = -sum_{(w1,w2) in d} tf * ln( c(w1,w2) / c(w1,*) )

    as ``(doc_id, n_pairs, nll2_sum_nanonat)`` — each (doc, bigram)
    contribution floors to integer nanonats INDIVIDUALLY (the source_kl
    device), so all sums are order-free integer sums, exact in SQL.
    Documents with < 2 tokens score (0, 0); n_pairs = token count - 1.

    Shape: per-batch (doc, w1, w2, tf) Counter partials (text never
    shuffles), ONE groupby keyed on hash(w1) % n_buckets — every row of
    a given w1 lands in one bucket, so the bucket resolves BOTH model
    counts (c12 by (w1,w2), c1* by w1) and the per-row contributions
    vectorized (math.log loop for libm/DuckDB ln parity) — then ONE
    doc-keyed groupby sums the integers.  A Zipf-hot w1 concentrates its
    distinct (doc, w1, w2) rows in one bucket: bounded by docs x
    distinct-successors, the standard inverted-index exchange volume."""
    import numpy as np

    from engine.stages.text import hash_bucket_column

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        zero_ids = []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            toks = _TOKEN.findall(txt or "")
            if len(toks) < 2:
                zero_ids.append(d)
                continue
            for a, b in zip(toks, toks[1:]):
                c[(d, a, b)] += 1
        items = list(c.items())
        # sentinel rows (w1 = None) keep zero-pair docs in the final
        # doc groupby without touching model counts
        return pa.table(
            {
                id_col: pa.array(
                    [d for (d, _, _), _ in items] + zero_ids, pa.int64()
                ),
                "w1": pa.array(
                    [a for (_, a, _), _ in items] + [None] * len(zero_ids),
                    pa.string(),
                ),
                "w2": pa.array(
                    [b for (_, _, b), _ in items] + [None] * len(zero_ids),
                    pa.string(),
                ),
                "tf": pa.array(
                    [n for _, n in items] + [0] * len(zero_ids), pa.int64()
                ),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        return hash_bucket_column(t, "w1", n_buckets)

    def resolve(df):
        import pandas as pd

        zero = df[df["w1"].isna()]
        df = df[~df["w1"].isna()]
        out_frames = []
        if len(df):
            cc = df.groupby(["w1", "w2"], sort=False)["tf"].transform("sum").to_numpy()
            cs = df.groupby("w1", sort=False)["tf"].transform("sum").to_numpy()
            ks = [
                math.floor(
                    (-1000000000.0 * int(tf)) * math.log(int(a) / int(b))
                )
                for tf, a, b in zip(df["tf"], cc, cs)
            ]
            out_frames.append(
                pd.DataFrame(
                    {
                        id_col: df[id_col].to_numpy(),
                        "k": np.array(ks, dtype=np.int64),
                        "tf": df["tf"].to_numpy(),
                    }
                )
            )
        if len(zero):
            out_frames.append(
                pd.DataFrame(
                    {
                        id_col: zero[id_col].to_numpy(),
                        "k": np.zeros(len(zero), dtype=np.int64),
                        "tf": np.zeros(len(zero), dtype=np.int64),
                    }
                )
            )
        return pd.concat(out_frames, ignore_index=True)

    from engine.stages.common import as_arrow

    contrib = as_arrow(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(resolve, batch_format="pandas")
    )
    return (
        contrib.groupby(id_col)
        .aggregate(Sum("tf", alias_name="n_pairs"), Sum("k", alias_name="_k"))
        .map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    "n_pairs": t.column("n_pairs").cast(pa.int64()),
                    "nll2_sum_nanonat": t.column("_k").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def pmi_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
    n_buckets: int = 64,
    window: int = 1,
) -> ray.data.Dataset:
    """Top-k collocations by pointwise mutual information

        pmi(w1,w2) = ln( N * c12 / (c1 * c2) )

    over the corpus bigram table (c12 = bigram count, c1/c2 = the bigram
    first/second-element marginals, N = total bigrams) — the classic
    collocation-discovery statistic (Church & Hanks 1990), a corpus
    profiling signal alongside domain_terms/heavy_hitters.  Output:
    ``(w1, w2, pair_count, pmi_nano, rank)`` for the ``top_k`` pairs with
    ``pair_count >= min_count``, ranked by (pmi desc, w1 asc, w2 asc).

    Fixed point: ``pmi_nano = floor(1e9 * ln((N*c12)/(c1*c2)))`` — all
    inputs integers, one ln, libm/DuckDB double parity (the unigram_nll
    device) — so the query is SQL-verified including scores.

    ``window`` widens the pair generator to the skip-gram statistic
    (word2vec-style ordered co-occurrence within ``window`` positions;
    window=1 is the classic adjacent bigram): pairs are emitted for every
    offset 1..window, N and the marginals become window-co-occurrence
    totals, and everything downstream is unchanged.

    Scale shape (no vocab-sized join, no all-to-all sort):
    1. per-batch bigram Counter partials — (w1, w2, cnt) rows, never text;
    2. ONE groupby on hash(w1) % n_buckets: all partials of a bigram land
       in one bucket (key is a function of w1), so the bucket resolves
       global c12 AND the w1-marginal c1 vectorized (PERF.md #31);
    3. ONE groupby on hash(w2) % n_buckets attaches the w2-marginal c2
       the same way — both passes move distinct-bigram rows only;
    4. min_count filter, stateless scoring, then global_topk's
       per-block-candidate pattern (<= top_k x blocks rows to the final
       resolve; no AllToAll Sort of the bigram table).
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from engine.stages.common import as_arrow
    from engine.stages.text import hash_bucket_column
    from engine.stages.topk import global_topk

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column(text_col).to_pylist():
            toks = _TOKEN.findall(txt or "")
            for d in range(1, window + 1):
                for a, b in zip(toks, toks[d:]):
                    c[(a, b)] += 1
        items = list(c.items())
        return pa.table(
            {
                "w1": pa.array([a for (a, _), _ in items], pa.string()),
                "w2": pa.array([b for (_, b), _ in items], pa.string()),
                "cnt": pa.array([n for _, n in items], pa.int64()),
            }
        )

    def bucket_on(col):
        def add(t: pa.Table) -> pa.Table:
            return hash_bucket_column(t, col, n_buckets)

        return add

    def resolve_c12_c1(df: pd.DataFrame) -> pd.DataFrame:
        c12 = df.groupby(["w1", "w2"], sort=False)["cnt"].sum().reset_index()
        c12 = c12.rename(columns={"cnt": "c12"})
        c12["c1"] = c12.groupby("w1", sort=False)["c12"].transform("sum")
        return c12

    def attach_c2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["c2"] = df.groupby("w2", sort=False)["c12"].transform("sum")
        return df

    resolved = as_arrow(
        as_arrow(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(bucket_on("w1"), batch_format="pyarrow", zero_copy_batch=True)
            .groupby("tb")
            .map_groups(
                lambda df: resolve_c12_c1(df.drop(columns=["tb"])),
                batch_format="pandas",
            )
        )
        .map_batches(bucket_on("w2"), batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(
            lambda df: attach_c2(df.drop(columns=["tb"])), batch_format="pandas"
        )
    ).materialize()
    n_total = int(resolved.sum("c12") or 0)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("c12"), min_count))
        pmi = [
            math.floor(1000000000.0 * math.log((n_total * int(c)) / (int(a) * int(b))))
            for c, a, b in zip(
                t.column("c12").to_pylist(),
                t.column("c1").to_pylist(),
                t.column("c2").to_pylist(),
            )
        ]
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "pair_count": t.column("c12").cast(pa.int64()),
                "pmi_nano": pa.array(pmi, pa.int64()),
            }
        )

    scored = resolved.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return global_topk(
        scored,
        order_cols=["pmi_nano", "w1", "w2"],
        descending=[True, False, False],
        k=top_k,
    )


def stupid_backoff_nll(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Trigram Stupid Backoff scoring (Brants et al., EMNLP 2007 — "Large
    Language Models in Machine Translation", THE distributed-LM paper:
    counts-only smoothing designed so the model is a pure MapReduce
    artifact).  Documents with even ids train the count tables; odd-id
    documents are scored (held-out, so backoff genuinely fires):

        S(w3 | w1 w2) = c123/c12           if c123 > 0
                      = 0.4 * c23/c2       elif c23 > 0        (backoff)
                      = 0.4 * 0.4 * max(c3,1)/N                (unigram;
                                           unseen w3 floors at count 1)

    per-doc output ``(doc_id, n_tri, sb_nll_nanonat)`` over scored docs,
    where each (doc, trigram) contribution floors to integer nanonats
    INDIVIDUALLY (order-free integer sums — the source_kl device), so the
    query is SQL-verified end to end including every backoff branch.

    All model marginals are TRIGRAM-table sums (c12 = prefix, c23 =
    suffix-pair, c2 = middle, c3 = last, N = total trigrams), which is
    what makes the shuffle shape work: every count a trigram's first two
    backoff levels need is a function of its MIDDLE word w2, so ONE
    groupby on hash(w2) % n_buckets co-locates the train partials with
    the score rows and resolves c123/c12/c23/c2 vectorized in-bucket
    (PERF.md #31).  Only the unigram-level residue — score rows whose
    trigram AND suffix-bigram are unseen, plus per-bucket (w3, cnt)
    partials — takes a second, much smaller hash(w3) bucket pass.  Text
    never shuffles; both exchanges carry distinct-n-gram rows.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from engine.stages.common import as_arrow
    from engine.stages.text import hash_bucket_column

    def partial(t: pa.Table) -> pa.Table:
        train: Counter = Counter()
        score: Counter = Counter()
        zero_ids: List[int] = []
        for d, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            toks = _TOKEN.findall(txt or "")
            if d % 2 == 0:
                for a, b, c in zip(toks, toks[1:], toks[2:]):
                    train[(a, b, c)] += 1
            elif len(toks) < 3:
                zero_ids.append(d)
            else:
                for a, b, c in zip(toks, toks[1:], toks[2:]):
                    score[(d, a, b, c)] += 1
        roles, docs, w1s, w2s, w3s, cnts = [], [], [], [], [], []
        for (a, b, c), n in train.items():
            roles.append("t"); docs.append(-1)
            w1s.append(a); w2s.append(b); w3s.append(c); cnts.append(n)
        for (d, a, b, c), n in score.items():
            roles.append("s"); docs.append(d)
            w1s.append(a); w2s.append(b); w3s.append(c); cnts.append(n)
        for d in zero_ids:
            roles.append("z"); docs.append(d)
            w1s.append(""); w2s.append(""); w3s.append(""); cnts.append(0)
        return pa.table(
            {
                "role": pa.array(roles, pa.string()),
                id_col: pa.array(docs, pa.int64()),
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "w3": pa.array(w3s, pa.string()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    def bucket_on(col):
        def add(t: pa.Table) -> pa.Table:
            return hash_bucket_column(t, col, n_buckets)

        return add

    OUT_COLS = ["role", id_col, "w3", "cnt", "k"]

    def _out(role, docs, w3s, cnts, ks) -> pd.DataFrame:
        # pd.StringDtype so EMPTY frames still convert to arrow string
        # columns (object-dtype empties become null-typed, the CLAUDE.md
        # empty-block schema hazard)
        n = len(docs)
        return pd.DataFrame(
            {
                "role": pd.Series([role] * n, dtype="string"),
                id_col: np.asarray(docs, dtype=np.int64),
                "w3": pd.Series(list(w3s), dtype="string"),
                "cnt": np.asarray(cnts, dtype=np.int64),
                "k": np.asarray(ks, dtype=np.int64),
            }
        )

    def resolve_mid(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        tr = df[df["role"] == "t"]
        c123 = (
            tr.groupby(["w1", "w2", "w3"], sort=False)["cnt"].sum().reset_index()
            if len(tr)
            else pd.DataFrame(columns=["w1", "w2", "w3", "cnt"])
        )
        if len(c123):
            # unigram-level partials for pass 2: per-bucket (w3, cnt)
            u = c123.groupby("w3", sort=False)["cnt"].sum().reset_index()
            out.append(_out("u", [-1] * len(u), u["w3"], u["cnt"], [0] * len(u)))
        zero = df[df["role"] == "z"]
        if len(zero):
            out.append(
                _out("k", zero[id_col], [""] * len(zero), [0] * len(zero),
                     [0] * len(zero))
            )
        sc = df[df["role"] == "s"]
        if len(sc):
            sc = (
                sc.groupby([id_col, "w1", "w2", "w3"], sort=False)["cnt"]
                .sum().reset_index().rename(columns={"cnt": "tf"})
            )
            c12 = (
                c123.groupby(["w1", "w2"], sort=False)["cnt"].sum()
                .reset_index().rename(columns={"cnt": "c12"})
            )
            c23 = (
                c123.groupby(["w2", "w3"], sort=False)["cnt"].sum()
                .reset_index().rename(columns={"cnt": "c23"})
            )
            c2 = (
                c123.groupby("w2", sort=False)["cnt"].sum()
                .reset_index().rename(columns={"cnt": "c2"})
            )
            m = sc.merge(
                c123.rename(columns={"cnt": "c123"}),
                on=["w1", "w2", "w3"], how="left",
            )
            m = m.merge(c12, on=["w1", "w2"], how="left")
            m = m.merge(c23, on=["w2", "w3"], how="left")
            m = m.merge(c2, on="w2", how="left")
            lvl1 = m["c123"].notna()
            lvl2 = (~lvl1) & m["c23"].notna()
            resid = ~(lvl1 | lvl2)
            if lvl1.any():
                g = m[lvl1]
                ks = [
                    math.floor((-1000000000.0 * int(tf)) * math.log(int(a) / int(b)))
                    for tf, a, b in zip(g["tf"], g["c123"], g["c12"])
                ]
                out.append(_out("k", g[id_col], [""] * len(g), g["tf"], ks))
            if lvl2.any():
                g = m[lvl2]
                ks = [
                    math.floor(
                        (-1000000000.0 * int(tf)) * math.log(0.4 * int(a) / int(b))
                    )
                    for tf, a, b in zip(g["tf"], g["c23"], g["c2"])
                ]
                out.append(_out("k", g[id_col], [""] * len(g), g["tf"], ks))
            if resid.any():
                g = m[resid]
                out.append(_out("r", g[id_col], g["w3"], g["tf"], [0] * len(g)))
        if not out:
            return _out("k", [], [], [], [])
        return pd.concat(out, ignore_index=True)

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    n_tri = int(
        partials.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            pc.sum(
                                pc.if_else(
                                    pc.equal(t.column("role"), "t"),
                                    t.column("cnt"),
                                    pa.scalar(0, pa.int64()),
                                )
                            ).as_py()
                            or 0
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        or 0
    )

    mid = as_arrow(
        partials.map_batches(
            bucket_on("w2"), batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("tb")
        .map_groups(
            lambda df: resolve_mid(df.drop(columns=["tb"])), batch_format="pandas"
        )
    ).materialize()

    done = mid.filter(expr="role == 'k'")

    def resolve_last(df: pd.DataFrame) -> pd.DataFrame:
        c3 = df[df["role"] == "u"].groupby("w3", sort=False)["cnt"].sum()
        g = df[df["role"] == "r"]
        if not len(g):
            return _out("k", [], [], [], [])
        cs = g["w3"].map(c3)
        if n_tri == 0:
            # empty model: the oracle's ln(.../NULL) nulls every component
            # and coalesces the per-doc sum to 0 — mirror that exactly
            ks = [0] * len(g)
        else:
            ks = [
                math.floor(
                    (-1000000000.0 * int(tf))
                    * math.log(0.4 * 0.4 * (int(c) if c == c else 1) / n_tri)
                )
                for tf, c in zip(g["cnt"], cs)
            ]
        return _out("k", g[id_col], [""] * len(g), g["cnt"], ks)

    last = as_arrow(
        mid.filter(expr="role != 'k'")
        .map_batches(bucket_on("w3"), batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(
            lambda df: resolve_last(df.drop(columns=["tb"])), batch_format="pandas"
        )
    )

    return (
        done.union(last)
        .groupby(id_col)
        .aggregate(Sum("cnt", alias_name="n_tri"), Sum("k", alias_name="_k"))
        .map_batches(
            lambda t: pa.table(
                {
                    id_col: t.column(id_col),
                    "n_tri": t.column("n_tri").cast(pa.int64()),
                    "sb_nll_nanonat": t.column("_k").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def log_odds(
    ds: ray.data.Dataset,
    *,
    group_col: str = "lang",
    group_a: str = "en",
    group_b: str = "de",
    text_col: str = "text",
    top_k: int = 50,
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """Corpus comparison by weighted log-odds ("Fightin' Words", Monroe
    et al. 2008, uninformative Dirichlet prior alpha=1): which tokens are
    DISTINCTIVE of slice A vs slice B — the statistic behind corpus-drift
    and source-vocabulary diffs (raw count ratios overweight rare words;
    the z-score corrects by the delta's variance):

        delta_w = ln((c_aw+1)/(N_a+|V|-c_aw-1)) - ln((c_bw+1)/(N_b+|V|-c_bw-1))
        z_w     = delta_w / sqrt(1/(c_aw+1) + 1/(c_bw+1))

    Output ``(token, cnt_a, cnt_b, z_nano, rank)`` for the ``top_k``
    tokens by (z desc, token asc) — A-distinctive head; swap the groups
    for the B side.  Each token's z floors to nanounits INDIVIDUALLY
    (order-free, libm ln/sqrt parity), so the query is SQL-verified
    including scores.

    Shape: per-batch (side, token, cnt) Counter partials (text never
    shuffles); |V| and the side totals are a token-keyed count and a
    driver-sized reduce; ONE hash(token)-bucket groupby co-locates both
    sides' counts and scores vectorized; global_topk's per-block
    candidates rank the head (no all-to-all sort)."""
    import numpy as np
    import pandas as pd

    from engine.stages.common import as_arrow, collect_arrow_blocks
    from engine.stages.text import hash_bucket_column
    from engine.stages.topk import global_topk

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for g, txt in zip(
            t.column(group_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            if g == group_a:
                side = "a"
            elif g == group_b:
                side = "b"
            else:
                continue
            for tok in _TOKEN.findall(txt or ""):
                c[(side, tok)] += 1
        items = list(c.items())
        return pa.table(
            {
                "side": pa.array([s for (s, _), _ in items], pa.string()),
                "token": pa.array([tok for (_, tok), _ in items], pa.string()),
                "cnt": pa.array([n for _, n in items], pa.int64()),
            }
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "cnt_a": pa.array([], pa.int64()),
            "cnt_b": pa.array([], pa.int64()),
            "z_nano": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    # |V| over BOTH sides (one token-keyed count shuffle)
    v = (
        partials.groupby("token")
        .aggregate(Sum("cnt", alias_name="_c"))
        .count()
    )
    if v == 0:
        return ray.data.from_arrow(empty)
    # side totals: driver-sized reduce (two rows)
    n_side = {"a": 0, "b": 0}
    for blk in collect_arrow_blocks(
        partials.map_batches(
            lambda t: t.group_by("side").aggregate([("cnt", "sum")]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        required_col="cnt_sum",
    ):
        for s, n in zip(
            blk.column("side").to_pylist(), blk.column("cnt_sum").to_pylist()
        ):
            n_side[s] += int(n)
    na, nb = n_side["a"], n_side["b"]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.pivot_table(
                index="token", columns="side", values="cnt",
                aggfunc="sum", fill_value=0,
            )
            .reset_index()
        )
        ca = g["a"].astype("int64") if "a" in g else pd.Series(0, index=g.index)
        cb = g["b"].astype("int64") if "b" in g else pd.Series(0, index=g.index)
        zs = [
            math.floor(
                1000000000.0
                * (
                    (
                        math.log((int(a) + 1.0) / (na + v - int(a) - 1.0))
                        - math.log((int(b) + 1.0) / (nb + v - int(b) - 1.0))
                    )
                    / math.sqrt(1.0 / (int(a) + 1.0) + 1.0 / (int(b) + 1.0))
                )
            )
            for a, b in zip(ca, cb)
        ]
        return pd.DataFrame(
            {
                "token": g["token"],
                "cnt_a": ca.to_numpy(),
                "cnt_b": cb.to_numpy(),
                "z_nano": np.asarray(zs, dtype=np.int64),
            }
        )

    scored = as_arrow(
        partials.map_batches(
            lambda t: hash_bucket_column(t, "token", n_buckets),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("tb")
        .map_groups(lambda df: score(df.drop(columns=["tb"])), batch_format="pandas")
    )
    return global_topk(
        scored,
        order_cols=["z_nano", "token"],
        descending=[True, False],
        k=top_k,
    )
