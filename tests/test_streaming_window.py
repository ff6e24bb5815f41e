"""Stateful streaming window actor: cross-batch state must reproduce the
batch (bucket-shuffle) operators exactly, regardless of batch size."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray.stages.streaming_window import StreamingWindowState, streaming_window_features
from temporalscope_ray.stages.window_features import add_temporal_features


def events_df(n_per=50, entities=(1, 2, 3), seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for e in entities:
        t = 0.0
        for _ in range(n_per):
            t += float(rng.integers(1, 100))
            rows.append({"user_id": e, "ts": t, "value": float(rng.normal())})
    return pd.DataFrame(rows)


def expected(df):
    out = add_temporal_features(
        ray.data.from_pandas(df), id_col="user_id", time_col="ts", value_cols=["value"],
        lags=[1, 3], rolling_windows=[4], rolling_fns=("mean", "sum"), session_gap=50.0, num_buckets=4,
    ).to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    return out


@pytest.mark.parametrize("batch_size", [7, 64, 1000])
def test_streaming_matches_batch_operators(batch_size):
    df = events_df()
    stream = streaming_window_features(
        ray.data.from_pandas(df), id_col="user_id", time_col="ts", value_cols=["value"],
        lags=[1, 3], windows=[4], session_gap=50.0, batch_size=batch_size,
    ).to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    exp = expected(df)
    for col in ["value_lag_1", "value_lag_3", "session_id"]:
        a, b = stream[col], exp[col]
        assert ((a.isna() & b.isna()) | (a == b)).all(), col
    for col in ["value_roll_mean_4", "value_roll_sum_4"]:
        # different cumsum groupings -> ulp-level differences are fine
        assert np.allclose(stream[col], exp[col], rtol=1e-12), col


def test_actor_state_carries_across_calls_directly():
    """Drive the actor class itself with two batches split mid-entity."""
    df = events_df(n_per=10, entities=(5,)).sort_values(["user_id", "ts"]).reset_index(drop=True)
    actor = StreamingWindowState("user_id", "ts", ["value"], lags=[2], windows=[3], session_gap=50.0)
    out1 = actor(df.iloc[:4].copy())
    out2 = actor(df.iloc[4:].copy())
    out = pd.concat([out1, out2], ignore_index=True)
    # pandas oracle on the single entity
    exp_lag2 = df["value"].shift(2)
    exp_roll3 = df["value"].rolling(3, min_periods=1).mean()
    # row 4's lag_2 must reach back INTO the previous batch
    assert out.loc[4, "value_lag_2"] == df.loc[2, "value"]
    a = out["value_lag_2"]
    assert ((a.isna() & exp_lag2.isna()) | (a == exp_lag2)).all()
    assert np.allclose(out["value_roll_mean_3"], exp_roll3, rtol=1e-12)
    assert (out["session_id"] >= 0).all()


def test_sharded_streaming_matches_single_actor_and_keeps_global_context_clean():
    """concurrency=4 (one ordered pool per entity-hash shard) must equal
    the concurrency=1 stream exactly, with tiny batches forcing
    cross-batch carried state — and neither may flip the PROCESS-global
    preserve_order flag."""
    from ray.data import DataContext

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": np.arange(n, dtype=np.float64),
        "value": rng.normal(size=n).round(4),
    })
    ds = ray.data.from_pandas(df).repartition(8)
    kw = dict(id_col="user_id", time_col="ts", value_cols=["value"], lags=[1, 3], windows=[4],
              session_gap=10.0, batch_size=128)
    a = streaming_window_features(ds, concurrency=1, **kw).to_pandas()
    b = streaming_window_features(ds, concurrency=4, **kw).to_pandas()
    assert DataContext.get_current().execution_options.preserve_order is False
    key = ["user_id", "ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_sharded_streaming_overclamp_does_not_deadlock():
    """Asking for more shards than the CPU budget supports (16 pools at
    0.5 CPU each on a 4-CPU session would reserve every CPU) must clamp
    to a safe shard count and complete with identical results, not hang
    (regression: unclamped pools starved the per-shard filter tasks)."""
    rng = np.random.default_rng(5)
    n = 1200
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "ts": np.arange(n, dtype=np.float64),
        "value": rng.normal(size=n).round(4),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    kw = dict(id_col="user_id", time_col="ts", value_cols=["value"], lags=[1], windows=[3],
              session_gap=7.0, batch_size=64)
    a = streaming_window_features(ds, concurrency=1, **kw).to_pandas()
    b = streaming_window_features(ds, concurrency=16, **kw).to_pandas()
    key = ["user_id", "ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
