"""Unit tests for deterministic per-group sampling and JSON extraction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.sampling import sample_per_group
from temporalscope_ray.stages.text import json_extract_scalar


def test_sample_per_group_cap_and_determinism(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"g": ["a"] * 10 + ["b"] * 2, "k": list(range(12))})
    )
    out1 = sample_per_group(ds, "g", "k", n=3, salt="x", num_buckets=2).to_pandas()
    out2 = sample_per_group(ds, "g", "k", n=3, salt="x", num_buckets=4).to_pandas()
    # cap applies; a group smaller than n keeps all rows
    assert (out1.groupby("g").size() == pd.Series({"a": 3, "b": 2})).all()
    # selection is independent of bucket layout
    assert sorted(out1["k"]) == sorted(out2["k"])
    # a different salt draws a different sample (overwhelmingly likely)
    out3 = sample_per_group(ds, "g", "k", n=3, salt="y", num_buckets=2).to_pandas()
    assert sorted(out3[out3["g"] == "a"]["k"]) != sorted(out1[out1["g"] == "a"]["k"])
    # the hash helper column does not leak into the output
    assert set(out1.columns) == {"g", "k"}


def test_sample_per_group_rejects_bad_n(ray_session):
    ds = ray.data.from_arrow(pa.table({"g": ["a"], "k": [1]}))
    with pytest.raises(ValueError, match="n must be"):
        sample_per_group(ds, "g", "k", n=0)


def test_json_extract_types_and_nulls(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": [1, 2, 3, 4, 5, 6],
                "j": [
                    '{"k": 42, "s": "hi"}',
                    '{"s": "x", "k": -7}',
                    '{"k": null}',
                    '{"other": 1}',
                    None,
                    '{"k": "12"}',
                ],
            }
        )
    )
    out = (
        json_extract_scalar(ds, "j", "k", out_type="int64")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out["k"].tolist()[:2] == [42, -7]
    assert pd.isna(out["k"][2]) and pd.isna(out["k"][3]) and pd.isna(out["k"][4])
    assert out["k"][5] == 12  # quoted number parses under int64 cast

    s = (
        json_extract_scalar(ds, "j", "s", out_type="string")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert s["s"].tolist()[:2] == ["hi", "x"]
    assert pd.isna(s["s"][2])


def test_json_extract_rejects_nested_paths(ray_session):
    ds = ray.data.from_arrow(pa.table({"j": ['{"a": {"b": 1}}']}))
    with pytest.raises(ValueError, match="real JSON parser"):
        json_extract_scalar(ds, "j", "a.b")
