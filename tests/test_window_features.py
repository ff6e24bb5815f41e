"""Windowed feature stage tests: lag/lead, rolling, backfill, sessionize
vs pandas oracles (zero-leakage invariants)."""

import numpy as np
import pandas as pd
import ray.data

from temporalscope_ray.stages.window_features import (
    add_lag_lead_features,
    add_rolling_features,
    add_time_rolling_features,
    backfill,
    session_stats,
    sessionize,
)


def events_df(n_per=12, entities=(1, 2, 3), seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for e in entities:
        ts = pd.Timestamp("2023-01-01")
        for i in range(n_per):
            ts = ts + pd.Timedelta(minutes=int(rng.integers(1, 60)))
            rows.append({"user_id": e, "ts": ts, "value": float(rng.normal())})
    return pd.DataFrame(rows)


def sorted_out(ds):
    return ds.to_pandas().sort_values(["user_id", "ts"]).reset_index(drop=True)


def test_lag_lead_matches_pandas():
    df = events_df()
    out = sorted_out(
        add_lag_lead_features(
            ray.data.from_pandas(df), id_col="user_id", time_col="ts", value_cols=["value"], lags=[1, 2], leads=[1]
        )
    )
    exp = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    g = exp.groupby("user_id")["value"]
    exp["value_lag_1"], exp["value_lag_2"], exp["value_lead_1"] = g.shift(1), g.shift(2), g.shift(-1)
    pd.testing.assert_frame_equal(out, exp, check_like=True)


def test_rolling_matches_pandas_and_no_leakage():
    df = events_df()
    out = sorted_out(
        add_rolling_features(
            ray.data.from_pandas(df), id_col="user_id", time_col="ts", value_cols=["value"], window=4,
            fns=("mean", "sum"),
        )
    )
    exp = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    r = exp.groupby("user_id")["value"].rolling(4, min_periods=1)
    exp["value_roll_mean_4"] = r.mean().reset_index(level=0, drop=True)
    exp["value_roll_sum_4"] = r.sum().reset_index(level=0, drop=True)
    pd.testing.assert_frame_equal(out, exp, check_like=True)
    # leakage check: first row's rolling mean == its own value (trailing window)
    first = out.groupby("user_id").head(1)
    assert np.allclose(first["value_roll_mean_4"], first["value"])


def test_time_rolling_matches_pandas():
    df = events_df()
    out = sorted_out(
        add_time_rolling_features(
            ray.data.from_pandas(df), id_col="user_id", time_col="ts", value_cols=["value"], window="30min"
        )
    )
    exp = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    r = exp.set_index("ts").groupby("user_id")["value"].rolling("30min", closed="both").mean()
    exp["value_troll_mean"] = r.reset_index(drop=True).to_numpy()
    pd.testing.assert_frame_equal(out, exp, check_like=True)


def test_backfill_ffill_per_entity():
    df = events_df()
    df.loc[df.index % 3 == 1, "value"] = np.nan
    out = sorted_out(
        backfill(ray.data.from_pandas(df), id_col="user_id", time_col="ts", value_cols=["value"], method="ffill")
    )
    exp = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    exp["value"] = exp.groupby("user_id")["value"].ffill()
    pd.testing.assert_frame_equal(out, exp, check_like=True)


def test_sessionize_gap_breaks():
    rows = []
    base = pd.Timestamp("2023-01-01")
    # user 1: two sessions split by a 2-hour gap; user 2: one session
    for m in [0, 5, 10, 130, 135]:
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=m), "value": 1.0})
    for m in [0, 20, 40]:
        rows.append({"user_id": 2, "ts": base + pd.Timedelta(minutes=m), "value": 1.0})
    df = pd.DataFrame(rows)
    out = sorted_out(
        sessionize(ray.data.from_pandas(df), id_col="user_id", time_col="ts", gap=pd.Timedelta("30min"))
    )
    assert out[out["user_id"] == 1]["session_id"].tolist() == [0, 0, 0, 1, 1]
    assert out[out["user_id"] == 2]["session_id"].tolist() == [0, 0, 0]


def test_session_stats():
    rows = []
    base = pd.Timestamp("2023-01-01")
    for m in [0, 5, 100, 105, 110]:
        rows.append({"user_id": 7, "ts": base + pd.Timedelta(minutes=m), "value": 2.0})
    df = pd.DataFrame(rows)
    out = session_stats(
        ray.data.from_pandas(df), id_col="user_id", time_col="ts", gap=pd.Timedelta("30min"), value_col="value"
    ).to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "n_events"] == 2 and out.loc[1, "n_events"] == 3
    assert out.loc[1, "value_sum"] == 6.0


def test_numeric_time_sessionize():
    df = pd.DataFrame({"user_id": [1] * 4, "ts": [0.0, 1.0, 10.0, 11.0], "value": [0.0] * 4})
    out = sorted_out(sessionize(ray.data.from_pandas(df), id_col="user_id", time_col="ts", gap=5.0))
    assert out["session_id"].tolist() == [0, 0, 1, 1]


def test_rolling_with_nans_matches_pandas():
    """NaNs are missing observations: must not poison later windows
    (regression for the cumsum fast path)."""
    df = events_df()
    df.loc[df.index % 4 == 1, "value"] = np.nan
    out = sorted_out(
        add_rolling_features(
            ray.data.from_pandas(df), id_col="user_id", time_col="ts", value_cols=["value"], window=3,
            fns=("mean", "sum", "count"),
        )
    )
    exp = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    r = exp.groupby("user_id")["value"].rolling(3, min_periods=1)
    for f, col in [("mean", "value_roll_mean_3"), ("sum", "value_roll_sum_3"), ("count", "value_roll_count_3")]:
        expected = getattr(r, f)().reset_index(level=0, drop=True)
        a, b = out[col], expected
        assert ((a.isna() & b.isna()) | np.isclose(a, b, rtol=1e-12, equal_nan=True)).all(), f


def test_chunked_hot_entity_matches_unchunked():
    """One Zipf-hot entity (70% of all rows) processed via the chunked
    boundary-carry path must match the plain bucket pass row-for-row —
    lags, leads, rolling, session ids and the label shift."""
    from temporalscope_ray.stages.window_features import (
        add_temporal_features,
        add_temporal_features_chunked,
    )

    rng = np.random.default_rng(5)
    n = 4000
    hot_n = int(n * 0.7)
    ids = np.concatenate([np.full(hot_n, 99), rng.integers(0, 25, n - hot_n)])
    df = pd.DataFrame({
        "user_id": ids,
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 10_000_000, n), unit="s"),
        "event_id": np.arange(n),
        "value": rng.normal(size=n).round(4),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    kw = dict(
        id_col="user_id", time_col="ts", value_cols=["value"], lags=[1, 2], leads=[1],
        rolling_windows=[4], rolling_fns=("mean", "sum", "max", "std"), session_gap=pd.Timedelta("2h"),
        label_shift={"value_col": "value", "n": 1, "out_col": "value_shift_1"},
        tiebreak=["event_id"],
    )
    plain = add_temporal_features(ds, num_buckets=8, **kw).to_pandas()
    chunked = add_temporal_features_chunked(
        ds, hot_entities=[99], chunks_per_hot=7, num_buckets=8, **kw
    ).to_pandas()
    key = ["user_id", "ts", "event_id"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = chunked.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)

    # the auto wrapper must detect entity 99 (2800 rows > hot_min_rows)
    # on its own and produce the same result via the chunked path
    from temporalscope_ray.stages.window_features import add_temporal_features_auto

    auto = add_temporal_features_auto(
        ds, num_buckets=8, hot_min_rows=1000, chunk_target_rows=500, **kw
    ).to_pandas()
    c = auto.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], c[sorted(c.columns)], check_dtype=False)

    # no hot entities above threshold -> falls back to the plain pass
    cold = add_temporal_features_auto(ds, num_buckets=8, hot_min_rows=10_000, **kw).to_pandas()
    d = cold.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], d[sorted(d.columns)], check_dtype=False)

    # SAMPLED detection (the 100 TB path: a bounded randomized-block
    # read instead of a full key-column scan) must still find the hot
    # entity and produce the identical result — from_pandas datasets
    # expose a free count, so a tiny detect_sample_rows forces the gate
    sampled = add_temporal_features_auto(
        ds, num_buckets=8, hot_min_rows=1000, chunk_target_rows=500,
        detect_sample_rows=1500, **kw
    ).to_pandas()
    e = sampled.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], e[sorted(e.columns)], check_dtype=False)


def test_pass1_combiner_matches_exchange_and_overflow_falls_back(monkeypatch):
    """The map-only combiner pass-1 (per-block session-run partials,
    gap-closure interval merge on the driver) must produce the same
    carries/offsets — hence identical rows INCLUDING session ids — as
    the exchange pass-1, on a layout where every block's subset of the
    hot entity interleaves in time with every other block's. And when a
    block-group overflows the run cap, the combiner must fall back to
    the exchange pass, still row-identical."""
    from temporalscope_ray.stages import window_features as wf

    rng = np.random.default_rng(11)
    n = 3000
    ids = np.concatenate([np.full(2400, 7), rng.integers(0, 10, n - 2400)])
    df = pd.DataFrame({
        "user_id": ids,
        # irregular ts with many >gap holes; random row order across blocks
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(
            np.sort(rng.choice(20_000_000, n, replace=False))[rng.permutation(n)], unit="s"),
        "event_id": np.arange(n),
        "value": rng.normal(size=n).round(4),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    kw = dict(
        id_col="user_id", time_col="ts", value_cols=["value"], lags=[1], leads=[1],
        rolling_windows=[3], rolling_fns=("mean",), session_gap=pd.Timedelta("90min"),
        label_shift={"value_col": "value", "n": 1, "out_col": "value_shift_1"},
        tiebreak=["event_id"],
    )
    key = ["user_id", "ts", "event_id"]

    def run(**extra):
        out = wf.add_temporal_features_chunked(
            ds, hot_entities=[7], chunks_per_hot=5, num_buckets=4, **kw, **extra
        ).to_pandas()
        return out.sort_values(key).reset_index(drop=True)

    exch = run(pass1_mode="exchange")
    comb = run(pass1_mode="combiner")
    pd.testing.assert_frame_equal(exch[sorted(exch.columns)], comb[sorted(comb.columns)],
                                  check_dtype=False)
    # session ids genuinely exercised: multiple sessions exist
    assert exch.loc[exch.user_id == 7, "session_id"].nunique() > 1

    # overflow: cap of 1 run per block-group forces the fallback
    monkeypatch.setattr(wf, "_PASS1_RUN_CAP", 1)
    fb = run(pass1_mode="auto")
    pd.testing.assert_frame_equal(exch[sorted(exch.columns)], fb[sorted(fb.columns)],
                                  check_dtype=False)


def test_interarrival_matches_pandas_diff():
    from temporalscope_ray.stages.window_features import add_interarrival

    df = events_df(n_per=20)
    out = sorted_out(add_interarrival(
        ray.data.from_pandas(df).repartition(4), id_col="user_id", time_col="ts"
    ))
    exp = (df.sort_values(["user_id", "ts"])
             .groupby("user_id")["ts"].diff().dt.total_seconds() * 1_000_000)
    mine = out["interarrival_us"].astype("Float64").to_numpy(dtype=np.float64, na_value=np.nan)
    assert np.allclose(mine, exp.to_numpy(), equal_nan=True)
    # first row of every entity is null
    firsts = out.groupby("user_id").head(1)["interarrival_us"]
    assert firsts.isna().all()


def test_target_encode_shrinks_rare_categories():
    from temporalscope_ray.stages.stats import target_encode

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "cat": ["big"] * 1000 + ["rare"] * 3,
        "y": np.concatenate([rng.normal(10.0, 1, 1000), [100.0, 100.0, 100.0]]),
    })
    out = target_encode(ray.data.from_pandas(df).repartition(3), "cat", "y",
                        smoothing=20.0).to_pandas()
    gm = df["y"].mean()
    enc_big = out.loc[out["cat"] == "big", "y_te"].iloc[0]
    enc_rare = out.loc[out["cat"] == "rare", "y_te"].iloc[0]
    # big category ~ its own mean; rare category pulled strongly toward global
    assert abs(enc_big - df[df.cat == "big"]["y"].mean()) < 0.05
    assert abs(enc_rare - 100.0) > abs(enc_rare - gm)
    # deterministic across block layouts
    out2 = target_encode(ray.data.from_pandas(df).repartition(11), "cat", "y",
                         smoothing=20.0).to_pandas()
    m = out.merge(out2, on=["cat", "y"])
    assert (m["y_te_x"] == m["y_te_y"]).all()


def test_rolling_corr_matches_pandas_pairwise():
    from temporalscope_ray.stages.window_features import add_rolling_corr

    df = events_df(n_per=30)
    df["value2"] = df["value"].to_numpy()[::-1] + np.linspace(0, 1, len(df))
    # plant nulls on both sides
    df.loc[df.index[::7], "value"] = np.nan
    df.loc[df.index[::11], "value2"] = np.nan
    out = sorted_out(add_rolling_corr(
        ray.data.from_pandas(df).repartition(4), id_col="user_id",
        time_col="ts", x_col="value", y_col="value2", window=5, out_col="c"))
    # reference: per-row pairwise-complete corr over the trailing frame
    ref = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    exp = np.full(len(ref), np.nan)
    for uid, g in ref.groupby("user_id"):
        idx = g.index.to_numpy()
        for j, i in enumerate(idx):
            w = g.iloc[max(0, j - 4): j + 1]
            pair = w[["value", "value2"]].dropna()
            if len(pair) >= 2 and pair["value"].nunique() > 1 and pair["value2"].nunique() > 1:
                exp[i] = np.corrcoef(pair["value"], pair["value2"])[0, 1]
    assert np.allclose(out["c"].to_numpy(), exp, equal_nan=True, atol=1e-9)


def test_session_features_position_and_elapsed():
    from temporalscope_ray.stages.window_features import add_session_features

    df = events_df(n_per=25)
    out = sorted_out(add_session_features(
        ray.data.from_pandas(df).repartition(3), id_col="user_id",
        time_col="ts", gap=pd.Timedelta("30min")))
    # reference via pandas
    ref = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    brk = (ref.groupby("user_id")["ts"].diff() > pd.Timedelta("30min")).astype(int)
    ref["sid"] = brk.groupby(ref["user_id"]).cumsum()
    ref["pos"] = ref.groupby(["user_id", "sid"]).cumcount()
    first_ts = ref.groupby(["user_id", "sid"])["ts"].transform("first")
    ref["since"] = (ref["ts"] - first_ts).dt.total_seconds() * 1_000_000
    assert (out["session_id"].to_numpy() == ref["sid"].to_numpy()).all()
    assert (out["session_pos"].to_numpy() == ref["pos"].to_numpy()).all()
    assert np.allclose(out["since_session_start_us"].to_numpy(), ref["since"].to_numpy())


def test_calendar_features_cyclical_closure():
    from temporalscope_ray.stages.window_features import add_calendar_features

    df = pd.DataFrame({"ts": pd.date_range("2023-01-01", periods=200, freq="37min")})
    out = add_calendar_features(ray.data.from_pandas(df), time_col="ts").to_pandas()
    # sin^2+cos^2 == 1, hour/dow ranges, weekend flag consistency
    assert np.allclose(out["hour_sin"] ** 2 + out["hour_cos"] ** 2, 1.0)
    assert out["hour"].between(0, 23).all() and out["dow"].between(1, 7).all()
    assert (out["is_weekend"] == (out["dow"] >= 6).astype(int)).all()
    # cyclical closeness: hour 23 and hour 0 nearer than hour 12
    import math
    d = lambda h1, h2: math.hypot(
        math.sin(2 * math.pi * h1 / 24) - math.sin(2 * math.pi * h2 / 24),
        math.cos(2 * math.pi * h1 / 24) - math.cos(2 * math.pi * h2 / 24))
    assert d(23, 0) < d(12, 0)


def test_resample_ffill_grid_and_carry():
    from temporalscope_ray.stages.window_features import resample_ffill

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2023-01-01 00:00", "2023-01-01 00:07",
                              "2023-01-01 00:31", "2023-01-01 10:00",
                              "2023-01-01 10:00"]),  # user 2: duplicate ts
        "value": [1.0, 2.0, 3.0, 5.0, 9.0],
    })
    out = sorted_out(resample_ffill(
        ray.data.from_pandas(df).repartition(2), id_col="user_id",
        time_col="ts", value_col="value", freq="10min"))
    u1 = out[out["user_id"] == 1]
    # grid 00:00,00:10,00:20,00:30 (inclusive end only if exact multiple; 00:31 not)
    assert list(u1["ts"].dt.strftime("%H:%M")) == ["00:00", "00:10", "00:20", "00:30"]
    assert list(u1["value"]) == [1.0, 2.0, 2.0, 2.0]  # 00:31 event after last grid pt
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and u2["value"].iloc[0] == 9.0  # dup ts -> MAX


def test_rolling_minmax_kernel_matches_pandas():
    """The shifted-fmax kernel must equal pandas rolling min/max with
    NaNs present, across entity boundaries."""
    df = events_df(n_per=40)
    df.loc[df.index[::5], "value"] = np.nan
    out = sorted_out(add_rolling_features(
        ray.data.from_pandas(df).repartition(3), id_col="user_id",
        time_col="ts", value_cols=["value"], window=6, fns=("min", "max")))
    ref = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    grp = ref.groupby("user_id")["value"].rolling(6, min_periods=1)
    for f in ("min", "max"):
        exp = getattr(grp, f)().reset_index(level=0, drop=True).to_numpy()
        assert np.allclose(out[f"value_roll_{f}_6"].to_numpy(), exp, equal_nan=True)


def test_time_to_next_is_lead_of_interarrival():
    from temporalscope_ray.stages.window_features import add_interarrival, add_time_to_next

    df = events_df(n_per=15)
    nxt = sorted_out(add_time_to_next(
        ray.data.from_pandas(df).repartition(3), id_col="user_id", time_col="ts"))
    arr = sorted_out(add_interarrival(
        ray.data.from_pandas(df), id_col="user_id", time_col="ts"))
    # time_to_next at row i == interarrival at row i+1 (same entity)
    for uid in df["user_id"].unique():
        a = nxt[nxt["user_id"] == uid]["time_to_next_us"].to_numpy()
        b = arr[arr["user_id"] == uid]["interarrival_us"].to_numpy()
        assert (a[:-1] == b[1:]).all()
        assert pd.isna(nxt[nxt["user_id"] == uid]["time_to_next_us"].iloc[-1])


def test_expanding_features_match_pandas():
    from temporalscope_ray.stages.window_features import add_expanding_features

    df = events_df(n_per=25)
    df.loc[df.index[::6], "value"] = np.nan
    out = sorted_out(add_expanding_features(
        ray.data.from_pandas(df).repartition(3), id_col="user_id",
        time_col="ts", value_cols=["value"], fns=("mean", "std")))
    ref = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    g = ref.groupby("user_id")["value"].expanding()
    exp_mean = g.mean().reset_index(level=0, drop=True).to_numpy()
    exp_std = g.std().reset_index(level=0, drop=True).to_numpy()
    assert np.allclose(out["value_exp_mean"].to_numpy(), exp_mean, equal_nan=True, atol=1e-9)
    assert np.allclose(out["value_exp_std"].to_numpy(), exp_std, equal_nan=True, atol=1e-9)


def test_session_conversion_order_sensitivity():
    from temporalscope_ray.stages.window_features import session_conversion

    base = pd.Timestamp("2023-01-01")
    rows = [
        # user 1, session 0: view then purchase -> converted
        {"user_id": 1, "ts": base, "event_type": "view"},
        {"user_id": 1, "ts": base + pd.Timedelta("5min"), "event_type": "purchase"},
        # user 1, session 1 (2h later): purchase BEFORE view -> not converted
        {"user_id": 1, "ts": base + pd.Timedelta("3h"), "event_type": "purchase"},
        {"user_id": 1, "ts": base + pd.Timedelta("3h 5min"), "event_type": "view"},
        # user 2: view only -> not converted
        {"user_id": 2, "ts": base, "event_type": "view"},
    ]
    df = pd.DataFrame(rows)
    out = session_conversion(
        ray.data.from_pandas(df).repartition(2), id_col="user_id",
        time_col="ts", type_col="event_type", from_type="view",
        to_type="purchase", gap=pd.Timedelta("30min"),
    ).to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert out["converted"].tolist() == [1, 0, 0]
    assert out["n_events"].tolist() == [2, 2, 1]


def test_rolling_slope_matches_polyfit():
    from temporalscope_ray.stages.window_features import add_rolling_slope

    df = events_df(n_per=30)
    df["value"] = df["value"] + np.linspace(0, 5, len(df))  # add real trend
    out = sorted_out(add_rolling_slope(
        ray.data.from_pandas(df).repartition(3), id_col="user_id",
        time_col="ts", value_col="value", window=6, per="h", out_col="sl"))
    ref = df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    exp = np.full(len(ref), np.nan)
    for uid, g in ref.groupby("user_id"):
        idx = g.index.to_numpy()
        xs = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy() / 3.6e9
        ys = g["value"].to_numpy()
        for j, i in enumerate(idx):
            lo = max(0, j - 5)
            x, y = xs[lo:j + 1], ys[lo:j + 1]
            if len(x) >= 2 and (len(x) * (x**2).sum() - x.sum()**2) >= 0.01:
                exp[i] = np.polyfit(x - x.mean(), y, 1)[0]
    assert np.allclose(out["sl"].to_numpy(), exp, equal_nan=True, atol=1e-6)


def test_anomaly_flag_catches_planted_spike():
    from temporalscope_ray.stages.window_features import add_anomaly_flag

    rng = np.random.default_rng(13)
    n = 200
    df = pd.DataFrame({
        "user_id": np.ones(n, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
        "value": rng.normal(10, 0.5, n),
    })
    df.loc[150, "value"] = 50.0   # 80-sigma spike
    out = sorted_out(add_anomaly_flag(
        ray.data.from_pandas(df).repartition(3), id_col="user_id",
        time_col="ts", value_col="value", window=8, k=3.0))
    assert out.loc[150, "is_anomaly"] == 1
    # quiet region stays quiet and the first row (no std) is null
    assert pd.isna(out.loc[0, "is_anomaly"])
    # prior-window sample std has t-tails (n=8): a few percent FP rate
    assert out.loc[10:100, "is_anomaly"].fillna(0).sum() <= 5


def test_add_rolling_distinct_matches_pandas_nunique(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import add_rolling_distinct

    rng = np.random.default_rng(13)
    n = 600
    df = pd.DataFrame({
        "eid": np.arange(n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
        "uid": rng.integers(0, 7, n),
        "cat": pd.Series(rng.choice(["a", "b", "c", None], n)),
    })
    out = add_rolling_distinct(
        ray.data.from_pandas(df).repartition(4), id_col="uid", time_col="ts",
        cat_col="cat", window=4, tiebreak=["eid"],
    ).to_pandas().sort_values(["uid", "ts", "eid"]).reset_index(drop=True)

    ref = df.sort_values(["uid", "ts", "eid"]).reset_index(drop=True)
    # pandas rolling has no object-dtype support -> brute-force windows
    vals = []
    for _, g in ref.groupby("uid", sort=False):
        c = g["cat"].tolist()
        for i in range(len(c)):
            win = [x for x in c[max(0, i - 3):i + 1] if x is not None and x == x]
            vals.append(len(set(win)))
    assert out["cat_roll_nunique_4"].tolist() == vals


def test_add_decayed_sum_closed_form(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from temporalscope_ray.stages.window_features import add_decayed_sum

    # hand-checkable: events at 0, 1h, 2h -> weights 1, 1/2, 1/4
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00"])
    df = pd.DataFrame({"eid": [0, 1, 2], "ts": ts, "uid": [1, 1, 1],
                       "v": [4.0, 2.0, 1.0]})
    out = add_decayed_sum(ray.data.from_pandas(df), id_col="uid", time_col="ts",
                          value_col="v", halflife_s=3600.0, window=8,
                          tiebreak=["eid"]).to_pandas().sort_values("eid")
    got = out["v_decay_sum_8"].to_numpy()
    assert got[0] == pytest.approx(4.0)
    assert got[1] == pytest.approx(2.0 + 4.0 * 0.5)
    assert got[2] == pytest.approx(1.0 + 2.0 * 0.5 + 4.0 * 0.25)

    # truncation: only the last `window` events contribute
    n = 20
    ts2 = pd.date_range("2024-01-01", periods=n, freq="h")
    df2 = pd.DataFrame({"eid": range(n), "ts": ts2, "uid": [7] * n,
                        "v": np.ones(n)})
    out2 = add_decayed_sum(ray.data.from_pandas(df2).repartition(3),
                           id_col="uid", time_col="ts", value_col="v",
                           halflife_s=3600.0, window=4,
                           tiebreak=["eid"]).to_pandas().sort_values("eid")
    want_full = 1 + 0.5 + 0.25 + 0.125
    assert out2["v_decay_sum_4"].to_numpy()[-1] == pytest.approx(want_full)

    # segment isolation: another user's events never leak in
    df3 = pd.concat([df2, pd.DataFrame({"eid": [100], "ts": [ts2[0]],
                                        "uid": [8], "v": [1000.0]})])
    out3 = add_decayed_sum(ray.data.from_pandas(df3), id_col="uid",
                           time_col="ts", value_col="v", halflife_s=3600.0,
                           window=4, tiebreak=["eid"]).to_pandas()
    u8 = out3[out3["uid"] == 8]["v_decay_sum_4"]
    assert u8.tolist() == [1000.0]


def test_add_future_event_flag_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import add_future_event_flag

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: purchase 2h after first view (inside 3h horizon),
        # nothing after the purchase
        (1, base, "view"), (1, base + pd.Timedelta("2h"), "purchase"),
        # user 2: purchase exactly AT the horizon boundary (inclusive)
        (2, base, "view"), (2, base + pd.Timedelta("3h"), "purchase"),
        # user 3: purchase at the SAME microsecond as the view — "strictly
        # after" excludes it
        (3, base, "view"), (3, base, "purchase"),
        # user 4: purchase outside the horizon
        (4, base, "view"), (4, base + pd.Timedelta("3h") + pd.Timedelta("1us"), "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["uid", "ts", "t"])
    df["eid"] = np.arange(len(df))
    out = add_future_event_flag(
        ray.data.from_pandas(df).repartition(3), id_col="uid", time_col="ts",
        type_col="t", target_type="purchase", horizon_s=3 * 3600.0,
        out_col="flag", tiebreak=["eid"],
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    #           u1 view, u1 buy, u2 view, u2 buy, u3 view, u3 buy, u4 view, u4 buy
    assert out["flag"].tolist() == [1, 0, 1, 0, 0, 0, 0, 0]

    # cross-entity isolation: user 5's purchase never flags user 6
    df2 = pd.DataFrame({"uid": [5, 6], "ts": [base, base + pd.Timedelta("1h")],
                        "t": ["purchase", "view"], "eid": [0, 1]})
    out2 = add_future_event_flag(
        ray.data.from_pandas(df2), id_col="uid", time_col="ts", type_col="t",
        target_type="purchase", horizon_s=86400.0, out_col="flag",
        tiebreak=["eid"]).to_pandas()
    assert out2["flag"].tolist() == [0, 0]


def test_ordered_funnel_strict_chaining(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import ordered_funnel

    base = pd.Timestamp("2024-01-01")
    m = pd.Timedelta("1min")
    rows = [
        # s0 (u1): full ordered chain -> 3
        (1, base + 0 * m, "view"), (1, base + 1 * m, "click"), (1, base + 2 * m, "purchase"),
        # s1 (u2): purchase BEFORE click -> stops at 2 (view, click)
        (2, base + 0 * m, "view"), (2, base + 1 * m, "purchase"), (2, base + 2 * m, "click"),
        # s2 (u3): click only, no view -> 0 (order required from step 1)
        (3, base + 0 * m, "click"), (3, base + 1 * m, "purchase"),
        # s3 (u4): view and click at the SAME microsecond -> strict > blocks -> 1
        (4, base + 0 * m, "view"), (4, base + 0 * m, "click"),
        # u5: two sessions (2h gap): first reaches 1, second reaches 3
        (5, base + 0 * m, "view"),
        (5, base + 200 * m, "view"), (5, base + 201 * m, "click"), (5, base + 202 * m, "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["uid", "ts", "t"])
    df["eid"] = np.arange(len(df))
    out = ordered_funnel(
        ray.data.from_pandas(df).repartition(3), id_col="uid", time_col="ts",
        type_col="t", steps=["view", "click", "purchase"],
        gap=pd.Timedelta("30min"), tiebreak=["eid"],
    ).to_pandas().sort_values(["uid", "session_id"]).reset_index(drop=True)
    got = list(zip(out["uid"], out["session_id"], out["steps_reached"]))
    assert got == [(1, 0, 3), (2, 0, 2), (3, 0, 0), (4, 0, 1), (5, 0, 1), (5, 1, 3)]
    assert out["n_events"].tolist() == [3, 3, 2, 2, 1, 3]


def test_future_event_flag_random_vs_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import add_future_event_flag

    rng = np.random.default_rng(77)
    n = 1200
    df = pd.DataFrame({
        "uid": rng.integers(0, 25, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 3_000_000, n), unit="s"),
        "t": rng.choice(["a", "b", "c"], n),
        "eid": np.arange(n),
    })
    h = 86_400.0  # 1 day
    out = add_future_event_flag(
        ray.data.from_pandas(df).repartition(5), id_col="uid", time_col="ts",
        type_col="t", target_type="b", horizon_s=h, out_col="flag",
        tiebreak=["eid"],
    ).to_pandas().sort_values("eid").reset_index(drop=True)

    want = np.zeros(n, dtype=np.int64)
    for uid, g in df.groupby("uid"):
        tb = np.sort(g.loc[g["t"] == "b", "ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        for i in g.index:
            t0 = df.loc[i, "ts"].value // 1000
            j = np.searchsorted(tb, t0, side="right")
            want[i] = int(j < len(tb) and tb[j] <= t0 + int(h * 1e6))
    assert out.set_index("eid")["flag"].reindex(range(n)).to_numpy().tolist() == want.tolist()


def test_ordered_funnel_random_vs_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import ordered_funnel

    rng = np.random.default_rng(88)
    n = 800
    df = pd.DataFrame({
        "uid": rng.integers(0, 15, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 400_000, n), unit="s"),
        "t": rng.choice(["x", "y", "z", "w"], n),
        "eid": np.arange(n),
    })
    steps = ["x", "y", "z"]
    gap = pd.Timedelta("30min")
    out = ordered_funnel(
        ray.data.from_pandas(df).repartition(4), id_col="uid", time_col="ts",
        type_col="t", steps=steps, gap=gap, tiebreak=["eid"],
    ).to_pandas().set_index(["uid", "session_id"])

    # brute-force sessions + greedy chain
    ref = df.sort_values(["uid", "ts", "eid"])
    for uid, g in ref.groupby("uid"):
        ts = g["ts"].to_numpy()
        brk = np.zeros(len(g), dtype=np.int64)
        brk[1:] = (np.diff(ts) > gap.to_timedelta64()).astype(np.int64)
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            sub = g[sid == s]
            t_prev = pd.Timestamp.min
            reached = 0
            for step in steps:
                cand = sub[(sub["t"] == step) & (sub["ts"] > t_prev)]
                if len(cand) == 0:
                    break
                t_prev = cand["ts"].min()
                reached += 1
            row = out.loc[(uid, s)]
            assert int(row["steps_reached"]) == reached, (uid, s)
            assert int(row["n_events"]) == len(sub)


def test_grouped_autocorr_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from temporalscope_ray.stages.window_features import grouped_autocorr

    rng = np.random.default_rng(61)
    n = 900
    df = pd.DataFrame({
        "eid": np.arange(n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
        "uid": rng.integers(0, 6, n),
        # AR(1)-ish per-entity signal so autocorr is clearly positive
        "v": rng.normal(0, 1, n),
    })
    df = df.sort_values(["uid", "ts"]).reset_index(drop=True)
    df["v"] = df.groupby("uid")["v"].transform(lambda s: s.cumsum() * 0.3 + s)
    out = grouped_autocorr(ray.data.from_pandas(df).repartition(4),
                           id_col="uid", time_col="ts", value_col="v",
                           lag=1, tiebreak=["eid"]) \
        .to_pandas().set_index("uid")
    for uid, g in df.groupby("uid"):
        g = g.sort_values(["ts", "eid"])
        want = g["v"].corr(g["v"].shift(1))
        assert out.loc[uid, "autocorr"] == pytest.approx(want, abs=1e-6)
        assert out.loc[uid, "n_pairs"] == len(g) - 1


def test_drop_consecutive_duplicates_run_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import drop_consecutive_duplicates

    ts = pd.date_range("2024-01-01", periods=8, freq="h")
    df = pd.DataFrame({
        "eid": range(8),
        "ts": ts,
        "uid": [1, 1, 1, 1, 2, 2, 2, 2],
        "t": ["a", "a", "a", "b", "a", None, None, "a"],
        "v": [1.0, 1.0, 2.0, 2.0, np.nan, np.nan, np.nan, np.nan],
    })
    out = drop_consecutive_duplicates(
        ray.data.from_pandas(df).repartition(3), id_col="uid", time_col="ts",
        value_cols=["t", "v"], tiebreak=["eid"],
    ).to_pandas().sort_values("eid")
    # uid1: keep eid0 (first), drop eid1 (dup a/1.0), keep eid2 (v changed),
    # keep eid3 (t changed); uid2: keep eid4 (first), keep eid5 (t a->None),
    # drop eid6 (None/NaN == None/NaN), keep eid7 (t back to a)
    assert out["eid"].tolist() == [0, 2, 3, 4, 5, 7]


def test_history_sequence_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import add_history_sequence

    df = pd.DataFrame({
        "id": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2], unit="s"),
        "cat": ["a", "b", None, "c", "x", "y"],
    })
    out = add_history_sequence(
        ray.data.from_pandas(df).repartition(3), id_col="id", time_col="ts",
        cat_col="cat", window=2, num_buckets=2,
    ).to_pandas().sort_values(["id", "ts"]).reset_index(drop=True)
    hists = [list(a) for a in out["cat_hist_2"]]
    # entity firsts: empty; strictly-prior, oldest-first; nulls carried
    assert hists == [[], ["a"], ["a", "b"], ["b", None], [], ["x"]]
    # brute-force check on random data at window 4
    rng = np.random.default_rng(5)
    big = pd.DataFrame({
        "id": rng.integers(0, 20, 600),
        "ts": pd.to_datetime(rng.permutation(600), unit="s"),
        "cat": rng.choice(["u", "v", "w"], 600),
    })
    got = add_history_sequence(
        ray.data.from_pandas(big).repartition(5), id_col="id", time_col="ts",
        cat_col="cat", window=4, num_buckets=4,
    ).to_pandas().sort_values(["id", "ts"]).reset_index(drop=True)
    ref = big.sort_values(["id", "ts"]).reset_index(drop=True)
    for key, sub in ref.groupby("id"):
        vals = sub["cat"].tolist()
        for j, (ri, _) in enumerate(sub.iterrows()):
            expect = vals[max(0, j - 4):j]
            mask = (got["id"] == key) & (got["ts"] == sub["ts"].iloc[j])
            assert list(got.loc[mask, "cat_hist_4"].iloc[0]) == expect


def test_cusum_recursion_and_exactness(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import add_cusum

    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame({
        "id": rng.integers(0, 8, n),
        "ts": pd.to_datetime(rng.permutation(n), unit="s"),
        "v": np.round(rng.normal(50, 10, n), 2),
    })
    df.loc[rng.choice(n, 20, replace=False), "v"] = np.nan
    out = add_cusum(ray.data.from_pandas(df).repartition(4), id_col="id",
                    time_col="ts", value_col="v", target_units=5000,
                    num_buckets=4).to_pandas().sort_values(["id", "ts"])
    # reference: the literal max(0, S + dev) recursion in cents
    ref = df.sort_values(["id", "ts"])
    for key, sub in ref.groupby("id"):
        s = 0
        got = out[out["id"] == key]["v_cusum"].to_numpy()
        for j, v in enumerate(sub["v"]):
            dev = 0 if np.isnan(v) else int(np.rint(v * 100)) - 5000
            s = max(0, s + dev)
            assert got[j] == s / 100.0, (key, j)
    # a planted upward shift drives CUSUM up; stable series stays near 0
    shift = pd.DataFrame({
        "id": np.zeros(100, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(100), unit="s"),
        "v": np.concatenate([np.full(50, 10.0), np.full(50, 20.0)]),
    })
    res = add_cusum(ray.data.from_pandas(shift), id_col="id", time_col="ts",
                    value_col="v", num_buckets=2).to_pandas().sort_values("ts")
    assert res["v_cusum"].iloc[49] == 0.0         # at-mean prefix never rises
    assert res["v_cusum"].iloc[-1] > 200.0        # 50 rows x +5 drift


def test_session_paths_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import session_paths

    # user 1: session A = [a, b, c, d] (path a>b>c), 40-min gap,
    # session B = [x]; user 2: [None, p] (null consumes slot, no sep)
    df = pd.DataFrame({
        "id": [1, 1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime([0, 60, 120, 180, 3000, 0, 60], unit="s"),
        "t": ["a", "b", "c", "d", "x", None, "p"],
    })
    out = session_paths(ray.data.from_pandas(df).repartition(3), id_col="id",
                        time_col="ts", type_col="t",
                        gap=pd.Timedelta("30min"), k=3, num_buckets=2) \
        .to_pandas().sort_values(["id", "session_id"]).reset_index(drop=True)
    assert list(out["path"]) == ["a>b>c", "x", "p"]
    assert list(out["id"]) == [1, 1, 2]


def test_throttle_greedy_chain_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import throttle

    rng = np.random.default_rng(11)
    n = 800
    df = pd.DataFrame({
        "i": np.arange(n),
        "id": rng.integers(0, 12, n),
        "ts": pd.to_datetime(rng.integers(0, 3_600, n), unit="s"),
    }).drop_duplicates(subset=["id", "ts"])  # unique (id, ts): total order without tiebreak

    gap = 300_000_000  # 5 min in us
    out = throttle(ray.data.from_pandas(df).repartition(5), "id", "ts",
                   min_gap_us=gap, num_buckets=4).to_pandas()

    # brute-force greedy reference
    expect = []
    for _, g in df.sort_values(["id", "ts"]).groupby("id"):
        last = None
        for _, r in g.iterrows():
            t = r["ts"].value // 1000  # ns -> us
            if last is None or t >= last + gap // 1:
                expect.append(r["i"])
                last = t
    assert sorted(out["i"].tolist()) == sorted(expect)
    # survivors within an entity are >= gap apart; firsts survive
    for _, g in out.sort_values(["id", "ts"]).groupby("id"):
        d = g["ts"].astype("datetime64[us]").astype(np.int64).diff().dropna()
        assert (d >= gap).all()


def test_time_weighted_average_hold_last(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import time_weighted_average

    # user 1: v=10 holds 6h, v=0 holds 1min, final obs weightless
    #         -> twa = (10*21600 + 0*60) / 21660
    # user 2: nulls skipped (5 holds straight through), then 1 for 100s
    # user 3: single observation -> no output row
    df = pd.DataFrame({
        "e": range(8),
        "id": [1, 1, 1, 2, 2, 2, 2, 3],
        "ts": pd.to_datetime([0, 21600, 21660, 0, 50, 100, 200, 7], unit="s"),
        "v": [10.0, 0.0, 99.0, 5.0, None, 1.0, 2.0, 4.0],
    })
    out = time_weighted_average(
        ray.data.from_pandas(df).repartition(3), "id", "ts", "v",
        tiebreak=["e"], num_buckets=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == [1, 2]
    t = out.set_index("id")["twa"]
    assert np.isclose(t[1], round(10 * 21600 / 21660, 6))
    # user 2: v=5 holds 0->100s (through the null), v=1 holds 100->200s
    assert np.isclose(t[2], round((5 * 100 + 1 * 100) / 200, 6))


def test_add_time_since_event_strict_prior(ray_session):
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import add_time_since_event

    df = pd.DataFrame({
        "e": range(6),
        "id": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime([0, 10, 20, 30, 5, 15], unit="s"),
        "t": ["buy", "x", "buy", "x", "x", "buy"],
    })
    out = add_time_since_event(
        ray.data.from_pandas(df).repartition(3), id_col="id", time_col="ts",
        type_col="t", target_type="buy", tiebreak=["e"], num_buckets=2,
    ).to_pandas().sort_values("e").reset_index(drop=True)
    v = out["us_since_buy"].tolist()
    # row0: first buy, no prior -> NA; row1: 10s after buy@0; row2: a buy
    # measures to the PREVIOUS buy (20s), not itself; row3: 10s after buy@20
    assert pd.isna(v[0])
    assert v[1] == 10_000_000 and v[2] == 20_000_000 and v[3] == 10_000_000
    # user 2: no prior buy until row5's own (strict -> NA on it too? no:
    # row4 has no prior buy -> NA; row5 is a buy with no earlier buy -> NA
    assert pd.isna(v[4]) and pd.isna(v[5])


def test_last_touch_attribution_session_rule(ray_session):
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.window_features import last_touch_attribution

    df = pd.DataFrame({
        "e": range(6),
        "id": [1, 1, 1, 1, 2, 2],
        "ts": pd.to_datetime([0, 60, 120, 4000, 0, 30], unit="s"),
        "t": ["view", "click", "buy", "buy", "buy", "buy"],
    })
    out = last_touch_attribution(
        ray.data.from_pandas(df).repartition(3), id_col="id", time_col="ts",
        type_col="t", target_type="buy", gap_us=1_800_000_000,
        tiebreak=["e"], num_buckets=2,
    ).to_pandas().sort_values("e").reset_index(drop=True)
    # buy@120 follows click in-session; buy@4000 opens a new session
    # (gap 3880s > 1800s) -> null; user 2: first buy direct, second
    # attributed to the prior buy (30s gap)
    assert out["e"].tolist() == [2, 3, 4, 5]
    v = out["touch_type"].tolist()
    assert v[0] == "click" and v[1] is None and v[2] is None and v[3] == "buy"


def test_incremental_temporal_features_refresh(ray_session):
    """CDC refresh: delta entities fully recomputed from their whole
    history, untouched entities' rows pass through from the PRIOR
    feature table (proven by a sentinel perturbation that survives),
    and the result equals the full recompute over base ∪ delta."""
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.incremental import incremental_temporal_features
    from temporalscope_ray.stages.window_features import add_temporal_features

    rng = np.random.default_rng(31)
    rows = []
    for e in ["A", "B", "C"]:
        for t in range(40):
            rows.append({"id": e, "time": float(t), "value": float(rng.normal())})
    full = pd.DataFrame(rows)
    # delta: the last 8 rows of entity B (late-arriving data for B only)
    is_delta = (full["id"] == "B") & (full["time"] >= 32)
    base_df, delta_df = full[~is_delta], full[is_delta]

    kw = dict(id_col="id", time_col="time", value_cols=["value"], lags=[1],
              rolling_windows=[4], rolling_fns=("mean",),
              label_shift={"value_col": "value", "n": 1, "out_col": "value_shift_1"},
              num_buckets=4)
    base_feats = add_temporal_features(ray.data.from_pandas(base_df), **kw).to_pandas()
    # sentinel: perturb untouched entity A's features — the refresh must
    # carry these rows through verbatim (proof it never recomputes A)
    sent = base_feats.copy()
    sent.loc[sent["id"] == "A", "value_roll_mean_4"] += 1000.0

    out = incremental_temporal_features(
        ray.data.from_pandas(sent), ray.data.from_pandas(base_df),
        ray.data.from_pandas(delta_df), **kw,
    ).to_pandas().sort_values(["id", "time"]).reset_index(drop=True)

    ref = add_temporal_features(ray.data.from_pandas(full), **kw).to_pandas()
    ref = ref.sort_values(["id", "time"]).reset_index(drop=True)
    assert len(out) == len(ref)
    # A carries the sentinel (pass-through), B and C match the full recompute
    a = out[out["id"] == "A"]["value_roll_mean_4"].to_numpy()
    a_ref = ref[ref["id"] == "A"]["value_roll_mean_4"].to_numpy()
    assert np.allclose(a, a_ref + 1000.0)
    for e in ["B", "C"]:
        for c in ["value_lag_1", "value_roll_mean_4", "value_shift_1"]:
            x = out[out["id"] == e][c].to_numpy(dtype=float)
            y = ref[ref["id"] == e][c].to_numpy(dtype=float)
            assert np.allclose(x, y, equal_nan=True), (e, c)


def test_regularize_grid_ffill_and_bound():
    """Grid points are epoch-aligned multiples of step inside
    [first, last]; the carried value is the LAST row at-or-before the
    grid point with duplicate timestamps resolving by tiebreak; an
    entity whose grid would blow past the bound fails loudly."""
    from temporalscope_ray.stages.window_features import regularize_grid

    ts = pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:05",
                         "2024-01-01 02:30", "2024-01-01 05:59"])
    df = pd.DataFrame({"user_id": [1, 1, 1, 1], "event_id": [10, 11, 12, 13],
                       "ts": ts, "value": [1.0, 2.0, 3.0, 4.0]})
    ds = ray.data.from_pandas(df)
    out = regularize_grid(ds, id_col="user_id", time_col="ts", value_col="value",
                          step=pd.Timedelta("1h"), tiebreak=["event_id"],
                          num_buckets=2).to_pandas().sort_values("ts_grid")
    # grid: 01:00 .. 05:00 (ceil(00:05)=01:00, floor(05:59)=05:00)
    assert list(out["ts_grid"].dt.hour) == [1, 2, 3, 4, 5]
    # 01:00/02:00 carry the duplicate-ts row with the LARGER event_id
    assert list(out["value_ffill"]) == [2.0, 2.0, 3.0, 3.0, 3.0]

    import pytest

    with pytest.raises(ValueError, match="grid rows"):
        regularize_grid(ds, id_col="user_id", time_col="ts", value_col="value",
                        step=pd.Timedelta("1min"), tiebreak=["event_id"],
                        max_grid_rows_per_entity=10, num_buckets=2).to_pandas()




def test_single_task_path_matches_bucketed(ray_session):
    # grouped_ordered_map's size-gated single-task path (total_rows hint
    # <= threshold -> coalesce + one kernel call over the whole sorted
    # frame) must be row-identical to the bucket-exchange path on the
    # full flagship composite, including the label-shift row drops
    from temporalscope_ray.stages.window_features import add_temporal_features

    df = events_df(n_per=40, entities=tuple(range(1, 12)), seed=9)
    df["event_id"] = np.arange(len(df))
    kw = dict(
        id_col="user_id", time_col="ts", value_cols=["value"],
        lags=[1, 2], rolling_windows=[4], rolling_fns=("mean", "sum"),
        session_gap=pd.Timedelta("30min"),
        label_shift={"value_col": "value", "n": 1, "out_col": "value_shift_1"},
        num_buckets=8, tiebreak=["event_id"],
    )
    ds = ray.data.from_pandas(df).repartition(5)
    single = add_temporal_features(ds, total_rows=len(df), **kw)
    # the single-task plan must NOT contain the sort-groupby exchange
    single = single.materialize()
    assert "Sort" not in single.stats()
    bucketed = add_temporal_features(
        ray.data.from_pandas(df).repartition(5), total_rows=len(df),
        single_task_threshold=0, **kw,
    ).materialize()
    assert "Sort" in bucketed.stats()

    key = ["user_id", "ts", "event_id"]
    a = single.to_pandas().sort_values(key).reset_index(drop=True)
    b = bucketed.to_pandas().sort_values(key).reset_index(drop=True)
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
