"""SlidingWindowPartitioner + padding tests (reference W1-W9 semantics)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray import TemporalDataset
from temporalscope_ray.stages.partition import (
    SlidingWindowPartitioner,
    determine_partition_scheme,
    mean_fill_pad,
    mean_fill_pad_per_entity,
    validate_cardinality,
    validate_percentages,
)


# -- W5 percentages
def test_validate_percentages_complete_missing():
    assert validate_percentages(0.7, None, None) == (0.7, pytest.approx(0.3), 0.0)
    assert validate_percentages(0.6, 0.3, None) == (0.6, 0.3, pytest.approx(0.1))
    assert validate_percentages(0.6, None, 0.1) == (0.6, pytest.approx(0.3), 0.1)


def test_validate_percentages_errors():
    with pytest.raises(ValueError, match="`train_pct` must be between 0 and 1."):
        validate_percentages(1.5, None, None)
    with pytest.raises(ValueError, match="must sum to 1.0"):
        validate_percentages(0.5, 0.2, 0.1)


# -- W6/W7 scheme math
def test_determine_partition_scheme():
    assert determine_partition_scheme(4, None, 100, None) == ("num_partitions", 4, 25)
    assert determine_partition_scheme(None, 30, 100, None) == ("window_size", 3, 30)
    assert determine_partition_scheme(None, 30, 100, 10) == ("window_size", 8, 30)
    with pytest.raises(ValueError, match="Either `num_partitions` or `window_size`"):
        determine_partition_scheme(None, None, 100, None)


def test_validate_cardinality():
    with pytest.raises(ValueError, match=r"Insufficient rows \(10\) for `num_partitions=20`"):
        validate_cardinality(20, 1, 10)
    with pytest.raises(ValueError, match=r"Insufficient rows \(10\) for `window_size=20`"):
        validate_cardinality(2, 20, 10)


def make_td(n=100):
    df = pd.DataFrame({"time": np.arange(n, dtype=np.float64), "target": np.arange(n, dtype=np.float64)})
    return TemporalDataset(ray.data.from_pandas(df), time_col="time", target_col="target")


# -- W2 boundary math
def test_fit_window_boundaries():
    p = SlidingWindowPartitioner(make_td(100), window_size=50, stride=25, train_pct=0.6, test_pct=0.4)
    p.fit()
    parts = p.metadata["partitions"]
    assert len(parts) == 3  # starts at rows 0, 25, 50
    # window 0: rows 0..49 → times 0..49; delta=49; train=[0, 29.4), test=[29.4, 49)
    t0 = parts[0]
    assert t0["train"] == (0.0, pytest.approx(29.4))
    assert t0["test"] == (pytest.approx(29.4), 49.0)
    assert t0["validation"] is None


def test_transform_filters_rows():
    p = SlidingWindowPartitioner(make_td(100), window_size=50, stride=50, train_pct=0.6, test_pct=0.4)
    p.fit()
    wins = list(p.transform())
    assert len(wins) == 2
    train0 = wins[0]["train"].to_pandas()
    test0 = wins[0]["test"].to_pandas()
    # train [0, 29.4) → rows 0..29 ; test [29.4, 49) → rows 30..48
    assert train0["time"].min() == 0.0 and train0["time"].max() == 29.0 and len(train0) == 30
    assert test0["time"].min() == 30.0 and test0["time"].max() == 48.0


def test_tag_windows_single_pass_consistent_with_transform():
    p = SlidingWindowPartitioner(make_td(60), window_size=30, stride=15, train_pct=0.5, test_pct=0.5)
    p.fit()
    tagged = p.tag_windows().to_pandas()
    wins = list(p.transform())
    for wid, win in enumerate(wins):
        for split in ("train", "test"):
            via_filter = set(win[split].to_pandas()["time"])
            via_tag = set(tagged[(tagged["window_id"] == wid) & (tagged["split"] == split)]["time"])
            assert via_filter == via_tag, (wid, split)


def test_num_partitions_scheme():
    p = SlidingWindowPartitioner(make_td(100), num_partitions=4)
    assert p.window_size == 25 and p.stride == 25
    p.fit()
    assert len(p.metadata["partitions"]) == 4


def test_transform_before_fit_raises():
    p = SlidingWindowPartitioner(make_td(50), window_size=10)
    with pytest.raises(RuntimeError, match="Call `fit` before `transform`."):
        next(p.transform())


# -- W9 padding
def test_mean_fill_pad_post():
    df = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
    out = mean_fill_pad(ray.data.from_pandas(df), target_len=5, padding="post").to_pandas()
    assert len(out) == 5
    # mean preservation (reference test invariant, 1e-6)
    assert out["a"].mean() == pytest.approx(2.0, abs=1e-6)
    assert out["b"].mean() == pytest.approx(5.0, abs=1e-6)
    assert (out["a"].to_numpy()[3:] == 2.0).all()


def test_mean_fill_pad_errors():
    df = pd.DataFrame({"a": [1.0, None, 3.0]})
    with pytest.raises(ValueError, match="Cannot process data containing null values"):
        mean_fill_pad(ray.data.from_pandas(df), target_len=5)
    ok = pd.DataFrame({"a": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError, match="padding must be 'pre' or 'post'"):
        mean_fill_pad(ray.data.from_pandas(ok), target_len=5, padding="sideways")
    with pytest.raises(ValueError, match=r"target_len \(2\) must be greater than current length \(3\)"):
        mean_fill_pad(ray.data.from_pandas(ok), target_len=2)


def test_mean_fill_pad_per_entity():
    df = pd.DataFrame({"id": [1, 1, 2], "v": [1.0, 3.0, 10.0]})
    out = mean_fill_pad_per_entity(ray.data.from_pandas(df), id_col="id", target_len=3).to_pandas()
    assert len(out) == 6
    g1 = out[out["id"] == 1]["v"]
    g2 = out[out["id"] == 2]["v"]
    assert len(g1) == 3 and g1.tolist()[-1] == pytest.approx(2.0)  # entity-1 mean
    assert len(g2) == 3 and (g2.to_numpy()[1:] == 10.0).all()


def test_fit_with_validation_split():
    # W2 semantics: validation = [end, end + delta*val_pct) — starts AT
    # the window end (reference sliding_window.py:384-402)
    p = SlidingWindowPartitioner(make_td(100), window_size=50, stride=50,
                                 train_pct=0.5, test_pct=0.3, val_pct=0.2)
    p.fit()
    part = p.metadata["partitions"][0]
    # window rows 0..49: start=0, end=49, delta=49
    assert part["train"] == (0.0, pytest.approx(24.5))
    assert part["test"] == (pytest.approx(24.5), 49.0)
    assert part["validation"] == (49.0, pytest.approx(49.0 + 49.0 * 0.2))
    wins = list(p.transform())
    val0 = wins[0]["validation"].to_pandas()
    # [49, 58.8) → rows 49..58
    assert val0["time"].min() == 49.0 and val0["time"].max() == 58.0
    tagged = p.tag_windows().to_pandas()
    assert set(tagged["split"]) == {"train", "test", "validation"}
