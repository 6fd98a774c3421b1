"""Search query DSL — the JSON query language tying the ES-parity query
family together (the reference's consumers speak ES query DSL to the
index this engine replaces; analog of the `query` object in an ES
`_search` request body).

One clause per query, dispatched to the already-verified operators:

    {"bool":   {"must": [..], "should": [..], "must_not": [..],
                "min_should": 1}}
    {"phrase": "value table"}
    {"fuzzy":  {"term": "tble", "max_dist": 1}}
    {"regexp": "ta[bg]le"}
    {"match":  {"terms": ["merge", "batch"]}}        # AND + snippets
    {"dis_max": {"queries": ["join", "scan"], "tie_breaker_milli": 300}}
    {"multi_match": {"term": "merge", "k": 10}}       # title^3 + body
    {"span_near": {"a": "value", "b": "table", "slop": 4}}
    {"phrase_prefix": "the s"}                        # last term a prefix
    {"boosting": {"positive": ["merge"], "negative": ["slow"],
                  "negative_boost_milli": 300}}

Each returns the operator's own output schema (the DSL adds no new
semantics — every clause type is individually SQL-verified or
conformance-pinned, so the runner is a thin, total dispatcher that
rejects unknown shapes loudly).
"""

from __future__ import annotations

from typing import Any, Dict

import ray.data


def run_query_dsl(ds: ray.data.Dataset, dsl: Dict[str, Any]):
    """Dispatch one DSL clause against a documents dataset.  Raises
    ValueError on unknown/ambiguous clauses (never guesses)."""
    from engine.stages import search as s

    if not isinstance(dsl, dict) or len(dsl) != 1:
        raise ValueError(
            "query DSL must be a single-clause object, got: %r" % (dsl,)
        )
    kind, body = next(iter(dsl.items()))
    if kind == "bool":
        return s.bool_search(
            ds,
            must=body.get("must", ()),
            should=body.get("should", ()),
            must_not=body.get("must_not", ()),
            min_should=int(body.get("min_should", 1)),
        )
    if kind == "phrase":
        return s.phrase_search(ds, str(body))
    if kind == "fuzzy":
        return s.fuzzy_search(
            ds, str(body["term"]), max_dist=int(body.get("max_dist", 1))
        )
    if kind == "regexp":
        return s.regex_search(ds, str(body))
    if kind == "match":
        return s.snippet_search(ds, list(body["terms"]))
    if kind == "dis_max":
        return s.dis_max(
            ds,
            list(body["queries"]),
            tie_milli=int(body.get("tie_breaker_milli", 0)),
            k=int(body.get("k", 10)),
        )
    if kind == "multi_match":
        return s.multi_match(ds, str(body["term"]), k=int(body.get("k", 10)))
    if kind == "span_near":
        return s.span_near(
            ds,
            str(body["a"]),
            str(body["b"]),
            slop=int(body.get("slop", 3)),
        )
    if kind == "phrase_prefix":
        return s.phrase_search(ds, str(body), last_prefix=True)
    if kind == "boosting":
        return s.boosting_search(
            ds,
            list(body["positive"]),
            list(body["negative"]),
            neg_milli=int(body.get("negative_boost_milli", 300)),
            k=int(body.get("k", 50)),
        )
    raise ValueError(f"unknown query DSL clause: {kind!r}")
