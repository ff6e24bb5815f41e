"""Tutorial 6 — Temporal feature engineering at scale (beyond the reference).

The full feature-building pass a training pipeline runs over an event
stream, composed from this repo's oracle-gated stages:

1. lag / rolling statistics + sessionization (ONE entity-bucket
   exchange feeds every kernel),
2. session-relative position / elapsed-time features (same exchange
   shape),
3. rolling autocorrelation (co-movement regime signal),
4. inter-arrival cadence,
5. zero-shuffle encoders: cyclical calendar features, frequency and
   smoothed target encoding of the categorical column, equal-width
   value binning, and a hashed (type × user) feature cross.

Only steps 1–4 shuffle (each one bucket exchange); every encoder in
step 5 is a broadcast-apply or a pure projection, so at 100 TB the
plan moves the fact table through at most the windowing exchanges.

Run: ``PYTHONPATH=. python examples/06_feature_engineering.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray.stages.stats import (
        equal_width_bin,
        feature_cross,
        frequency_encode,
        target_encode,
    )
    from temporalscope_ray.stages.window_features import (
        add_calendar_features,
        add_interarrival,
        add_rolling_corr,
        add_session_features,
        add_temporal_features,
    )

    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(1, 9, n),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 7 * 24 * 3600, n)), unit="s"),
        "event_type": rng.choice(["view", "click", "buy"], n, p=[0.7, 0.25, 0.05]),
        "value": rng.normal(10, 3, n).round(2),
    })
    ds = ray.data.from_pandas(df).repartition(4)

    # -- windowed features: one bucket exchange does lags+rolling+session
    feats = add_temporal_features(
        ds, id_col="user_id", time_col="ts", value_cols=["value"],
        lags=[1], rolling_windows=[4], rolling_fns=["mean"],
        session_gap=pd.Timedelta("45min"), tiebreak=["event_id"],
    )
    feats = add_session_features(
        feats, id_col="user_id", time_col="ts", gap=pd.Timedelta("45min"),
        session_col="session_id2", tiebreak=["event_id"],
    )
    feats = add_rolling_corr(
        feats, id_col="user_id", time_col="ts", x_col="value",
        y_col="value_lag_1", window=8, out_col="autocorr", tiebreak=["event_id"],
    )
    feats = add_interarrival(
        feats, id_col="user_id", time_col="ts", tiebreak=["event_id"])

    # -- zero-shuffle encoders
    feats = add_calendar_features(feats, time_col="ts")
    feats = frequency_encode(feats, "event_type")
    feats = target_encode(feats, "event_type", "value", smoothing=20.0)
    feats = equal_width_bin(feats, "value", k=10)
    feats = feature_cross(feats, ["event_type", "user_id"], out_col="type_user_cross")

    out = feats.to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    feature_cols = [
        "value_lag_1", "value_roll_mean_4", "session_id", "session_pos",
        "since_session_start_us", "autocorr", "interarrival_us",
        "hour_sin", "dow_cos", "is_weekend",
        "event_type_freq", "value_te", "value_bin", "type_user_cross",
    ]
    print(f"{len(out)} rows, {len(out.columns)} columns; feature sample:")
    print(out[["user_id", "ts", "value", *feature_cols]].head(8).to_string())

    # sanity: every engineered column exists and has the expected reach
    assert all(c in out.columns for c in feature_cols)
    assert out["value_bin"].dropna().between(0, 9).all()
    assert out["session_pos"].min() == 0
    print("feature engineering pipeline OK")


if __name__ == "__main__":
    main()
