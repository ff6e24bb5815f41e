"""Round-5 numeric-width axis fixes, pinned (VERDICT r4 #6).

The dtype adversarial axis narrows columns (int32 ids, float32 values,
ms timestamps) and caught three real divergence families:
hour/day-bucketing kernels reading a ms column's int64 as microseconds,
join/union/asof operators refusing promotable mixed-width keys, and
float32 partial sums diverging from the SQL engines' promote-to-double
contract. Each fix is pinned here against the canonical-width result.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.exchange import promote_type


def _events_frame(n=400, users=7):
    rng = np.random.default_rng(5)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 3 * 86400, n)), unit="s"),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "value": rng.uniform(0, 100, n),
    })


def _narrow(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        k = out[c].dtype.kind
        if k == "i":
            out[c] = out[c].astype(np.int32)
        elif k == "f":
            out[c] = out[c].astype(np.float32)
        elif k == "M":
            out[c] = out[c].astype("datetime64[ms]")
    return out


def test_promote_type_matrix():
    assert promote_type(pa.int32(), pa.int64()) == pa.int64()
    assert promote_type(pa.int64(), pa.int64()) == pa.int64()
    assert promote_type(pa.float32(), pa.float64()) == pa.float64()
    assert promote_type(pa.int32(), pa.float32()) == pa.float64()
    assert promote_type(pa.timestamp("ms"), pa.timestamp("us")) == pa.timestamp("us")
    assert promote_type(pa.timestamp("us"), pa.timestamp("ns")) == pa.timestamp("ns")
    assert promote_type(pa.string(), pa.int64()) is None
    assert promote_type(pa.timestamp("us", tz="UTC"), pa.timestamp("us")) is None
    # uint64+int64 would numpy-promote to float64, silently corrupting
    # ids above 2^53 — the engine refuses (loud raise at the caller)
    assert promote_type(pa.uint64(), pa.int64()) is None
    assert promote_type(pa.uint32(), pa.int32()) == pa.int64()


def test_time_bucket_aggregate_ms_equals_us(ray_session):
    from temporalscope_ray.stages.agg import time_bucket_aggregate

    df = _events_frame()
    aggs = {"n": (None, "count"), "sum_v": ("value", "sum")}
    wide = time_bucket_aggregate(
        ray.data.from_pandas(df), "ts", "1h", aggs).to_pandas()
    ms = df.copy()
    ms["ts"] = ms["ts"].astype("datetime64[ms]")
    narrow = time_bucket_aggregate(
        ray.data.from_pandas(ms), "ts", "1h", aggs).to_pandas()
    key = ["bucket_start"]
    a = wide.sort_values(key).reset_index(drop=True)
    b = narrow.sort_values(key).reset_index(drop=True)
    # ts values are second-resolution, so ms narrowing loses nothing:
    # the hourly buckets must be IDENTICAL (the ms int64 read as us put
    # every row in 1970 before the fix)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (a["bucket_start"].dt.year == 2024).all()


def test_hash_groupby_float32_sums_accumulate_in_double(ray_session):
    """DuckDB SUM/AVG(FLOAT) promote to DOUBLE; the combiner must too.
    A float32-width accumulation of these values diverges from the
    double sum in the 7th digit — the fix pins exact equality with
    summing the float32 values (exactly represented in float64)."""
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate

    rng = np.random.default_rng(11)
    v32 = rng.uniform(0, 1, 20000).astype(np.float32)
    df = pd.DataFrame({"g": np.zeros(len(v32), dtype=np.int64), "v": v32})
    out = hash_groupby_aggregate(
        ray.data.from_pandas(df).repartition(8), ["g"],
        {"s": ("v", "sum"), "m": ("v", "mean")}, num_buckets=2).to_pandas()
    exact_sum = v32.astype(np.float64).sum()
    assert out["s"].iloc[0] == pytest.approx(exact_sum, rel=0, abs=1e-9)
    assert out["m"].iloc[0] == pytest.approx(exact_sum / len(v32), rel=0, abs=1e-12)
    # regression guard: the float32-width accumulation is measurably off
    assert abs(np.sum(v32) - exact_sum) > 1e-5


def test_equi_join_widens_int_key_widths(ray_session):
    from temporalscope_ray.stages.join import equi_join

    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int32),
                         "a": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": np.array([2, 4], dtype=np.int64),
                          "b": [200, 400]})
    out = equi_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    "k", how="inner", broadcast=False, num_buckets=2).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == [2, 4]
    assert list(out["b"]) == [200, 400]


def test_asof_join_mixed_timestamp_units(ray_session):
    from temporalscope_ray.stages.asof import asof_join

    left = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 02:00"]).astype("datetime64[ms]"),
        "uid": np.array([1, 1], dtype=np.int32),
    })
    right = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00"]).astype("datetime64[us]"),
        "uid": np.array([1, 1], dtype=np.int64),
        "px": [5.0, 7.0],
    })
    for broadcast in (True, False):
        out = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="ts", by="uid", right_cols=["px"], broadcast=broadcast,
            num_buckets=2,
        ).to_pandas().sort_values("ts").reset_index(drop=True)
        assert list(out["px"]) == [5.0, 7.0], f"broadcast={broadcast}"


def test_target_encode_expanding_daily_ms_equals_us(ray_session):
    from temporalscope_ray.stages.stats import target_encode_expanding_daily

    df = _events_frame()
    df["event_type"] = np.where(df["event_id"] % 2 == 0, "a", "b")
    wide = target_encode_expanding_daily(
        ray.data.from_pandas(df), cat_col="event_type", target_col="value",
        time_col="ts").to_pandas().sort_values("event_id").reset_index(drop=True)
    ms = df.copy()
    ms["ts"] = ms["ts"].astype("datetime64[ms]")
    narrow = target_encode_expanding_daily(
        ray.data.from_pandas(ms), cat_col="event_type", target_col="value",
        time_col="ts").to_pandas().sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        wide["value_te_asof"], narrow["value_te_asof"], check_dtype=False)
    # day-1 rows must have real history encodings (the ms-as-us bug
    # collapsed every day to 1970 epoch-day 0 -> all-null encodings)
    later = wide[wide["ts"] >= wide["ts"].min() + pd.Timedelta("1d")]
    assert later["value_te_asof"].notna().any()


def test_pad_union_many_mixed_units_and_widths(ray_session):
    from temporalscope_ray.stages.exchange import pad_union_many

    a = pd.DataFrame({"k": np.array([1, 2], dtype=np.int32), "x": [1.0, 2.0]})
    b = pd.DataFrame({"k": np.array([3], dtype=np.int64), "y": [9.0]})
    unioned, ordered = pad_union_many(
        [ray.data.from_pandas(a), ray.data.from_pandas(b)])
    out = unioned.to_pandas()
    assert sorted(out["k"]) == [1, 2, 3]
    assert out["k"].dtype == np.int64
