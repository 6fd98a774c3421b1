"""quality_classifier conformance: single-process oracle equality on BOTH
training paths (driver / distributed — the integer-gradient device makes
them bit-identical), partition invariance, and separation on a corpus
with a real signal."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from engine.stages.classifier import (
    _doc_features,
    _grad_nano,
    classifier_scores,
    train_quality_classifier,
)

_NANO = 1_000_000_000


def _toy_table(n=60):
    # en docs share a 'clean prose' vocabulary; others a different one
    rows = {"doc_id": [], "text": [], "lang": []}
    for i in range(n):
        rows["doc_id"].append(i)
        if i % 3 == 0:
            rows["lang"].append("en")
            rows["text"].append(f"the quick clear prose sentence number {i} reads well")
        elif i % 3 == 1:
            rows["lang"].append("de")
            rows["text"].append(f"der schnelle unklare satz nummer {i} liest sich")
        else:
            rows["lang"].append("zz")
            rows["text"].append(f"zz{i} spam spam buy now click here {i} zz")
    return pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )


def _oracle_train(tbl, n_buckets=256, epochs=6, lr=25.0):
    """Single-process reference: same quantized-gradient recipe, plain
    Python loop in doc order (order must not matter — integer sums)."""
    docs = [
        (int(d), 1 if l == "en" else 0, t)
        for d, t, l in zip(
            tbl.column("doc_id").to_pylist(),
            tbl.column("text").to_pylist(),
            tbl.column("lang").to_pylist(),
        )
    ]
    feats = [(y, *_doc_features(t, n_buckets)) for _, y, t in docs]
    w = np.zeros(n_buckets, dtype=np.float64)
    bias = 0.0
    for _ in range(epochs):
        acc = np.zeros(n_buckets, dtype=np.int64)
        accb = 0
        for y, b, x in feats:
            g, gb = _grad_nano(b, x, y, w, bias)
            np.add.at(acc, b, g)
            accb += gb
        w = w - lr * (acc.astype(np.float64) / _NANO) / len(docs)
        bias = bias - lr * (accb / _NANO) / len(docs)
    return w, bias


def _scores_df(ds, w, bias, n_buckets):
    return (
        classifier_scores(ds, w, bias, n_buckets=n_buckets)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_both_training_paths_match_oracle(ray_session):
    tbl = _toy_table()
    ow, ob = _oracle_train(tbl)
    for blocks in (1, 7):
        for gate in (10**9, 0):  # driver path / forced distributed path
            ds = ray.data.from_arrow(tbl).repartition(blocks)
            w, b = train_quality_classifier(
                ds, n_buckets=256, epochs=6, lr=25.0, driver_max_train=gate
            )
            assert b == ob
            assert np.array_equal(w, ow), f"blocks={blocks} gate={gate}"


def test_separation_and_fixed_point(ray_session):
    tbl = _toy_table()
    ds = ray.data.from_arrow(tbl)
    w, b = train_quality_classifier(ds, n_buckets=256, epochs=30, lr=25.0)
    df = _scores_df(ds, w, b, 256)
    en = df[df.label == 1]["prob_nano"].mean()
    rest = df[df.label == 0]["prob_nano"].mean()
    assert en > rest + 0.5 * _NANO, (en, rest)
    # fixed-point scoring replays exactly
    from engine.stages.classifier import _dot_nano

    ids, x = _doc_features(tbl.column("text")[0].as_py(), 256)
    z = b + _dot_nano(ids, x, w) / _NANO
    expect = int(math.floor(_NANO / (1.0 + math.exp(-z))))
    assert df.iloc[0]["prob_nano"] == expect


def test_empty_and_signal_free_docs(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["", "xyz"], pa.string()),
            "lang": pa.array(["en", "de"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    w, b = train_quality_classifier(ds, n_buckets=64, epochs=2, lr=1.0)
    df = _scores_df(ds, w, b, 64)
    assert len(df) == 2 and df["prob_nano"].between(0, _NANO).all()
