"""apply_updates (the reference's update_action/upsert-by-id analog)."""

import pyarrow as pa
import ray.data


def test_apply_updates(ray_session):
    from engine.pipelines.index_pipeline import apply_updates

    base = ray.data.from_arrow(
        pa.table({"uuid": ["a", "b", "c"], "val": [1, 2, 3], "tag": ["x", "y", "z"]})
    )
    delta = ray.data.from_arrow(
        pa.table({"uuid": ["b", "d"], "val": [20, 40], "tag": ["Y", "D"]})
    )
    out = apply_updates(base, delta).to_pandas().sort_values("uuid").reset_index(drop=True)
    assert out["uuid"].tolist() == ["a", "b", "c", "d"]
    assert out["val"].tolist() == [1, 20, 3, 40]
    assert out["tag"].tolist() == ["x", "Y", "z", "D"]


def test_apply_updates_idempotent(ray_session):
    from engine.pipelines.index_pipeline import apply_updates

    base = ray.data.from_arrow(pa.table({"uuid": ["a", "b"], "val": [1, 2]}))
    delta = ray.data.from_arrow(pa.table({"uuid": ["b"], "val": [99]}))
    once = apply_updates(base, delta).to_pandas().sort_values("uuid").reset_index(drop=True)
    twice = (
        apply_updates(ray.data.from_pandas(once), delta)
        .to_pandas()
        .sort_values("uuid")
        .reset_index(drop=True)
    )
    assert once.equals(twice)


def test_bucketed_hash_join_matches_pandas(ray_session):
    """Explicit bucketed join == pandas merge, incl. pandas-backed datasets."""
    import pandas as pd
    import ray.data

    from engine.stages.join import bucketed_hash_join

    ldf = pd.DataFrame({"k": [1, 2, 2, 3, 5], "lv": ["a", "b", "c", "d", "e"]})
    rdf = pd.DataFrame({"k2": [2, 2, 3, 4], "rv": [10, 20, 30, 40]})
    got = (
        bucketed_hash_join(
            ray.data.from_pandas(ldf), ray.data.from_pandas(rdf), on="k", right_on="k2"
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        ldf.merge(rdf, left_on="k", right_on="k2", how="inner")
        .sort_values(["k", "lv", "rv"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
