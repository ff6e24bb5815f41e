"""Unit tests for the general equi-join and wide-aggregate stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.agg import (
    grouped_distinct_count,
    pivot_counts,
    time_bucket_aggregate,
    value_histogram,
)
from temporalscope_ray.stages.join import equi_join


def _left():
    return ray.data.from_arrow(
        pa.table(
            {
                "k": [1, 2, 2, 3, None, 9_223_372_036_854_775_000],
                "lv": [10.0, 20.0, 21.0, 30.0, 40.0, 50.0],
            }
        )
    )


def _right():
    return ray.data.from_arrow(
        pa.table(
            {
                "k": [1, 2, 4, None, 9_223_372_036_854_775_000],
                "rv": ["a", "b", "d", "n", "big"],
            }
        )
    )


@pytest.mark.parametrize("broadcast", [True, False])
def test_inner_join_null_keys_never_match(ray_session, broadcast):
    out = (
        equi_join(_left(), _right(), "k", how="inner", broadcast=broadcast, num_buckets=4)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    # null keys on either side match nothing; the 2^63-ish key survives
    # bit-exact (no float64 round-trip)
    assert out["k"].tolist() == [1, 2, 2, 9_223_372_036_854_775_000]
    assert out["rv"].tolist() == ["a", "b", "b", "big"]


@pytest.mark.parametrize("broadcast", [True, False])
def test_left_join_unmatched_rows_get_nulls(ray_session, broadcast):
    out = (
        equi_join(_left(), _right(), "k", how="left", broadcast=broadcast, num_buckets=4)
        .to_pandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    assert len(out) == 6  # every left row exactly once (unique right keys)
    unmatched = out[out["rv"].isna()]
    assert sorted(unmatched["lv"].tolist()) == [30.0, 40.0]  # k=3 and k=null


def test_join_rejects_overlapping_non_key_columns(ray_session):
    l = ray.data.from_arrow(pa.table({"k": [1], "x": [1.0]}))
    r = ray.data.from_arrow(pa.table({"k": [1], "x": [2.0]}))
    with pytest.raises(ValueError, match="non-key columns"):
        equi_join(l, r, "k")


def test_join_key_width_mismatch_widens_incompatible_raises(ray_session):
    # round-5 dtype axis: promotable widths WIDEN (int32 key joins an
    # int64 key via the promoted common type)...
    l = ray.data.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
    r = ray.data.from_arrow(
        pa.table({"k": pa.array([1], type=pa.int32()), "v": [1.0]})
    )
    out = equi_join(l, r, "k", broadcast=False).to_pandas()
    assert list(out["v"]) == [1.0]
    # ...while truly incompatible kinds still raise loudly
    r2 = ray.data.from_arrow(
        pa.table({"k": pa.array(["1"], type=pa.string()), "v": [1.0]})
    )
    with pytest.raises(ValueError, match="type mismatch"):
        equi_join(l, r2, "k", broadcast=False)


def test_join_pandas_right_broadcasts(ray_session):
    r = pd.DataFrame({"k": [1, 2], "rv": ["a", "b"]})
    out = equi_join(_left(), r, "k", how="inner").to_pandas()
    assert sorted(out["rv"].tolist()) == ["a", "b", "b"]


def _events_tbl():
    ts = pa.array(
        np.arange(10) * 1_800_000_000 + 1_700_000_000_000_000, type=pa.timestamp("us")
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "ts": ts,
                "g": ["a", "a", "b", "b", "a", None, "b", "a", "b", "a"],
                "v": [1.0, 2.0, 3.0, None, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0],
            }
        )
    )


def test_time_bucket_aggregate_hourly(ray_session):
    out = (
        time_bucket_aggregate(
            _events_tbl(), "ts", "1h", {"n": (None, "count"), "s": ("v", "sum")}
        )
        .to_pandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    # 10 half-hour-spaced rows -> 5 hourly buckets of 2 rows each
    assert out["n"].tolist() == [2, 2, 2, 2, 2]
    assert out["s"].tolist() == [3.0, 3.0, 11.0, 15.0, 19.0]


def test_time_bucket_aggregate_rejects_bad_every(ray_session):
    with pytest.raises(ValueError, match="cannot parse"):
        time_bucket_aggregate(_events_tbl(), "ts", "1fortnight", {"n": (None, "count")})


def test_grouped_distinct_count_null_semantics(ray_session):
    # null group key forms a group; null values don't count
    out = (
        grouped_distinct_count(_events_tbl(), "g", "v", num_buckets=2)
        .to_pandas()
        .sort_values("g", na_position="last")
        .reset_index(drop=True)
    )
    assert out["n_distinct"].tolist() == [5, 3, 1]  # a: 5 non-null, b: 3 non-null, null-g: 1


def test_pivot_counts_fixed_values(ray_session):
    out = (
        pivot_counts(_events_tbl(), "g", "g", values=["a", "b"], num_buckets=2)
        .to_pandas()
        .sort_values("g", na_position="last")
        .reset_index(drop=True)
    )
    assert out["a"].tolist() == [5, 0, 0]
    assert out["b"].tolist() == [0, 4, 0]


def test_value_histogram_bounds_and_nulls(ray_session):
    t = value_histogram(_events_tbl(), "v", lo=0.0, hi=10.0, bins=5).to_pandas()
    # values 1..9 (null dropped, 10.0 outside hi) in bins of width 2
    assert t["count"].sum() == 8
    assert t["count"].tolist() == [1, 2, 1, 2, 2]


def test_cumulative_features_per_entity(ray_session):
    from temporalscope_ray.stages.window_features import add_cumulative_features

    n = 12
    ts = pa.array(np.arange(n) * 1_000_000, type=pa.timestamp("us"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": ["x", "y"] * (n // 2),
                "ts": ts,
                "v": np.arange(n, dtype=np.int64),
            }
        )
    )
    out = (
        add_cumulative_features(
            ds, id_col="id", time_col="ts", value_cols=["v"],
            ops=("cumsum", "cummax", "cummin"), row_number="rn", num_buckets=2,
        )
        .to_pandas()
        .sort_values(["id", "ts"])
        .reset_index(drop=True)
    )
    x = out[out["id"] == "x"]
    assert x["v_cumsum"].tolist() == np.cumsum(np.arange(0, 12, 2)).tolist()
    assert x["v_cummax"].tolist() == list(range(0, 12, 2))
    assert x["v_cummin"].tolist() == [0] * 6
    assert x["rn"].tolist() == list(range(1, 7))
    assert out["v_cumsum"].dtype == np.int64  # int stays int (bit-exact)


def test_full_join_both_sides_unmatched(ray_session):
    out = (
        equi_join(_left(), _right(), "k", how="full", broadcast=False, num_buckets=4)
        .to_pandas()
    )
    # matched: k=1 (1 left row), k=2 (2 left rows), big key (1) -> 4
    # left-unmatched: k=3, k=null -> 2 ; right-unmatched: k=4, k=null -> 2
    assert len(out) == 8
    assert out[out["lv"].isna()]["rv"].sort_values().tolist() == ["d", "n"]
    assert sorted(out[out["rv"].isna()]["lv"].tolist()) == [30.0, 40.0]


def test_full_join_rejects_broadcast_paths(ray_session):
    with pytest.raises(ValueError, match="full outer"):
        equi_join(_left(), _right(), "k", how="full", broadcast=True)
    with pytest.raises(ValueError, match="Dataset right side"):
        equi_join(_left(), pd.DataFrame({"k": [1], "rv": ["a"]}), "k", how="full")


def test_hopping_window_aggregate(ray_session):
    from temporalscope_ray.stages.agg import hopping_window_aggregate

    out = (
        hopping_window_aggregate(
            _events_tbl(), "ts", window="1h", hop="30min",
            aggs={"n": (None, "count")},
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # rows at 30min spacing, 1h windows hopping 30min: every row is in
    # 2 windows; interior windows hold 2 rows
    assert out["n"].sum() == 20
    assert out["n"].max() == 2

    with pytest.raises(ValueError, match="multiple of hop"):
        hopping_window_aggregate(_events_tbl(), "ts", window="1h", hop="7min",
                                 aggs={"n": (None, "count")})


def test_approx_distinct_kmv_accuracy_and_determinism():
    from temporalscope_ray.stages.agg import approx_distinct_kmv

    rng = np.random.default_rng(11)
    n = 30_000
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], n // 2),
        "key": np.concatenate([
            rng.integers(0, 5_000, n // 2),     # ~5000 distinct
            rng.integers(0, 40, n // 2),        # 40 distinct (< k: exact)
        ]),
    })
    out = approx_distinct_kmv(ray.data.from_pandas(df).repartition(6),
                              "g", "key", k=256).to_pandas().set_index("g")
    exact = df.groupby("g")["key"].nunique()
    # group below k is EXACT; group above k within ~4/sqrt(k)
    assert out.loc["b", "approx_distinct"] == exact["b"]
    rel = abs(out.loc["a", "approx_distinct"] - exact["a"]) / exact["a"]
    assert rel < 4 / np.sqrt(256), rel
    # deterministic across block layouts
    out2 = approx_distinct_kmv(ray.data.from_pandas(df).repartition(17),
                               "g", "key", k=256).to_pandas().set_index("g")
    assert (out["approx_distinct"] == out2["approx_distinct"]).all()


def test_cohort_retention_matches_pandas():
    from temporalscope_ray.stages.agg import cohort_retention

    rng = np.random.default_rng(4)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 35 * 86400, n), unit="s"),
    })
    out = cohort_retention(ray.data.from_pandas(df).repartition(5),
                           id_col="user_id", time_col="ts").to_pandas()
    wk = 7 * 86_400_000_000
    us = df["ts"].astype("datetime64[us]").astype(np.int64)
    first = us.groupby(df["user_id"]).transform("min")
    ref = pd.DataFrame({
        "user_id": df["user_id"],
        "cohort": first // wk,
        "period_offset": us // wk - first // wk,
    }).groupby(["cohort", "period_offset"])["user_id"].nunique().reset_index(name="n_users")
    m = out.merge(ref, on=["cohort", "period_offset"], suffixes=("", "_ref"), how="outer")
    assert m["n_users"].notna().all() and m["n_users_ref"].notna().all()
    assert (m["n_users"] == m["n_users_ref"]).all()
    # week-0 cell of each cohort contains every cohort member
    w0 = out[out["period_offset"] == 0].set_index("cohort")["n_users"]
    cohort_sizes = pd.DataFrame({"u": df["user_id"], "c": first // wk}) \
        .drop_duplicates().groupby("c")["u"].nunique()
    assert (w0.sort_index() == cohort_sizes.sort_index()).all()


def test_transition_counts_matches_pandas():
    from temporalscope_ray.stages.agg import transition_counts

    rng = np.random.default_rng(8)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.Timestamp("2024-02-01") + pd.to_timedelta(rng.permutation(n) * 61, unit="s"),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    out = transition_counts(ray.data.from_pandas(df).repartition(5),
                            id_col="user_id", time_col="ts",
                            type_col="event_type").to_pandas()
    ref = df.sort_values(["user_id", "ts"])
    ref["prev"] = ref.groupby("user_id")["event_type"].shift(1)
    exp = ref.dropna(subset=["prev"]).groupby(["prev", "event_type"]).size()
    got = out.set_index(["prev_type", "cur_type"])["n"]
    assert int(got.sum()) == int(exp.sum())
    for k, v in exp.items():
        assert got[k] == v


def test_grouped_mode_ties_and_nulls():
    from temporalscope_ray.stages.agg import grouped_mode

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3, 3],
        "v": ["b", "a", "a", "z", "y", None, None],  # g2: tie -> smallest; g3: all null
    })
    out = grouped_mode(ray.data.from_pandas(df).repartition(3), "g", "v") \
        .to_pandas().set_index("g")
    assert out.loc[1, "mode"] == "a" and out.loc[1, "mode_count"] == 2
    assert out.loc[2, "mode"] == "y"          # 1-1 tie broken by value asc
    assert 3 not in out.index                  # all-null group emits nothing


def test_top_k_rows_partial_merge_and_ties(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import top_k_rows

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"id": np.arange(1000), "v": rng.integers(0, 50, 1000)})
    df.loc[3, "v"] = np.nan  # NaN never qualifies
    got = top_k_rows(ray.data.from_pandas(df).repartition(7), "v", 10,
                     tiebreak=["id"])
    want = df.dropna(subset=["v"]).sort_values(["v", "id"],
                                               ascending=[False, True]).head(10)
    assert got["id"].tolist() == want["id"].tolist()
    assert got["v"].tolist() == want["v"].tolist()
    # ascending path
    got_a = top_k_rows(ray.data.from_pandas(df).repartition(7), "v", 5,
                       ascending=True, tiebreak=["id"])
    want_a = df.dropna(subset=["v"]).sort_values(["v", "id"]).head(5)
    assert got_a["id"].tolist() == want_a["id"].tolist()


def test_grouped_entropy_known_distributions(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import grouped_entropy

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4 + ["c"] * 3,
        "t": ["x", "x", "x", "x",          # zero entropy
              "x", "y", "x", "y",          # ln 2
              "x", None, "y"],             # nulls excluded -> ln 2
    })
    out = grouped_entropy(ray.data.from_pandas(df).repartition(3), "g", "t") \
        .to_pandas().set_index("g")["entropy"]
    assert out["a"] == 0.0
    assert out["b"] == pytest.approx(np.log(2), abs=1e-6)
    assert out["c"] == pytest.approx(np.log(2), abs=1e-6)


def test_rolling_active_entities_window_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import rolling_active_entities

    base = pd.Timestamp("2024-01-01")
    rows = []
    # u1 active on days 0 and 10; u2 on days 0..2; u3 only day 10
    for d, u in [(0, 1), (10, 1), (0, 2), (1, 2), (2, 2), (10, 3)]:
        rows.append({"ts": base + pd.Timedelta(days=d), "uid": u})
        rows.append({"ts": base + pd.Timedelta(days=d, hours=5), "uid": u})  # dup
    df = pd.DataFrame(rows)
    out = rolling_active_entities(
        ray.data.from_pandas(df).repartition(3), "ts", "uid",
        window_days=7, day_col="day", out_col="wau",
    ).to_pandas().sort_values("day").reset_index(drop=True)
    d0 = base.value // 1000 // 86_400_000_000
    got = dict(zip(out["day"] - d0, out["wau"]))
    # observed days: 0, 1, 2, 10
    assert got == {0: 2, 1: 2, 2: 2, 10: 2}   # day 10: u1 + u3 (u2 aged out)
    assert len(out) == 4                      # only observed days emitted


def test_attach_transition_prob(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import attach_transition_prob

    # user 1: a -> b -> a -> buy ; user 2: a -> buy ; 'end' only terminal
    df = pd.DataFrame({
        "id": [1, 1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2, 1], unit="s"),
        "t": ["a", "b", "a", "buy", "a", "buy", "end"],
    })
    out = attach_transition_prob(
        ray.data.from_pandas(df).repartition(3), id_col="id", time_col="ts",
        type_col="t", target_type="buy", num_buckets=2,
    ).to_pandas().sort_values(["id", "ts"]).reset_index(drop=True)
    # transitions from 'a': a->b, a->buy, a->buy  => p = 2/3
    # from 'b': b->a => 0; from 'buy' and 'end': never a predecessor -> null
    p = out.set_index(["id", "ts"])["p_next_buy"]
    a_rows = out[out["t"] == "a"]["p_next_buy"]
    assert np.allclose(a_rows, 2 / 3) and a_rows.notna().all()
    assert (out[out["t"] == "b"]["p_next_buy"] == 0.0).all()
    assert out[out["t"].isin(["buy", "end"])]["p_next_buy"].isna().all()


def test_attach_surprisal(ray_session):
    import math

    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import attach_surprisal

    # user 1: a -> b -> a -> c ; user 2: a -> b ; user 3: z (first only)
    df = pd.DataFrame({
        "id": [1, 1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime([1, 2, 3, 4, 1, 2, 1], unit="s"),
        "t": ["a", "b", "a", "c", "a", "b", "z"],
    })
    out = attach_surprisal(
        ray.data.from_pandas(df).repartition(3), id_col="id", time_col="ts",
        type_col="t", num_buckets=2,
    ).to_pandas().sort_values(["id", "ts"]).reset_index(drop=True)
    # transitions: a->b x2, a->c x1 (P(b|a)=2/3, P(c|a)=1/3), b->a x1 (P=1)
    s = out["surprisal"]
    # entity firsts -> null
    assert s[out.groupby("id").cumcount() == 0].isna().all()
    by = out.set_index(["id", "ts"])["surprisal"]
    assert math.isclose(by[(1, pd.Timestamp(2, unit="s"))], -np.log(2 / 3), abs_tol=1e-6)
    assert math.isclose(by[(1, pd.Timestamp(4, unit="s"))], -np.log(1 / 3), abs_tol=1e-6)
    assert by[(1, pd.Timestamp(3, unit="s"))] == 0.0  # b->a is certain
    assert math.isclose(by[(2, pd.Timestamp(2, unit="s"))], -np.log(2 / 3), abs_tol=1e-6)
    # prev_type carried
    assert out.loc[out.groupby("id").cumcount() == 0, "prev_type"].isna().all()
    assert (out.set_index(["id", "ts"])["prev_type"][(1, pd.Timestamp(2, unit="s"))]) == "a"


def test_interval_overlap_pairs_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.join import interval_overlap_pairs

    rng = np.random.default_rng(11)
    n = 250
    s = rng.integers(0, 5_000, n)
    df = pd.DataFrame({
        "iv_id": np.arange(n),
        "s": s,
        "e": s + rng.integers(0, 800, n),    # spans cross many width-100 buckets
    })
    ds = ray.data.from_pandas(df).repartition(4)

    def got_pairs(width):
        out = interval_overlap_pairs(
            ds, key_cols=["iv_id"], start_col="s", end_col="e",
            bucket_width_us=width, num_buckets=4,
        ).to_pandas()
        return sorted((min(a, b), max(a, b))
                      for a, b in zip(out["a_iv_id"], out["b_iv_id"]))

    # brute reference: closed-end overlap, unordered, once
    ref = sorted(
        (i, j)
        for i in range(n) for j in range(i + 1, n)
        if df["s"][i] <= df["e"][j] and df["s"][j] <= df["e"][i]
    )
    p100 = got_pairs(100)
    assert p100 == ref                        # exact + exactly-once
    assert got_pairs(1000) == ref             # width-invariant
    assert got_pairs(37) == ref               # odd width, heavy replication
    # closed-end touch counts as overlap
    touch = pd.DataFrame({"iv_id": [0, 1], "s": [0, 10], "e": [10, 20]})
    t = interval_overlap_pairs(ray.data.from_pandas(touch), key_cols=["iv_id"],
                               start_col="s", end_col="e",
                               bucket_width_us=7, num_buckets=2).to_pandas()
    assert len(t) == 1


def test_ohlc_bars_matches_pandas_brute(ray_session):
    from temporalscope_ray.stages.agg import ohlc_bars

    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        # coarse second grid so (uid, ts) duplicates occur -> tiebreak matters
        "ts": pd.to_datetime(rng.integers(0, 40, n) * 600_000_000, unit="us"),
        "uid": rng.integers(0, 5, n).astype(np.int64),
        "v": rng.normal(size=n),
    })
    df.loc[rng.choice(n, 60, replace=False), "v"] = np.nan

    ds = ray.data.from_pandas(df).repartition(7)
    out = (
        ohlc_bars(ds, "ts", "v", "1h", by=["uid"], tiebreak=["eid"])
        .to_pandas().sort_values(["uid", "bucket_start"]).reset_index(drop=True)
    )

    g = df.assign(bucket_start=df["ts"].dt.floor("h")) \
          .sort_values(["uid", "bucket_start", "ts", "eid"], kind="mergesort")
    gb = g.groupby(["uid", "bucket_start"], sort=True)
    exp = pd.DataFrame({
        "open_v": gb["v"].agg(lambda s: s.iloc[0]),
        "high_v": gb["v"].max(),
        "low_v": gb["v"].min(),
        "close_v": gb["v"].agg(lambda s: s.iloc[-1]),
        "n": gb.size().astype(np.int64),
    }).reset_index()

    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(
        out[["uid", "bucket_start", "open_v", "high_v", "low_v", "close_v", "n"]],
        exp, check_dtype=False)


def test_ohlc_bars_global_no_keys(ray_session):
    from temporalscope_ray.stages.agg import ohlc_bars

    df = pd.DataFrame({
        "eid": [1, 2, 3, 4],
        "ts": pd.to_datetime([0, 10, 3600, 3610], unit="s"),
        "v": [5.0, np.nan, 1.0, 9.0],
    })
    out = (
        ohlc_bars(ray.data.from_pandas(df).repartition(3), "ts", "v", "1h",
                  tiebreak=["eid"])
        .to_pandas().sort_values("bucket_start").reset_index(drop=True)
    )
    assert out["open_v"].tolist() == [5.0, 1.0]
    # close of hour 0 lands on the NaN row: boundary value is the row's value
    assert np.isnan(out["close_v"].iloc[0]) and out["close_v"].iloc[1] == 9.0
    assert out["high_v"].tolist() == [5.0, 9.0]
    assert out["n"].tolist() == [2, 2]


def test_trailing_global_aggregate_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import trailing_global_aggregate

    rng = np.random.default_rng(17)
    n = 1500
    ts_s = np.sort(rng.integers(0, 5_000, n))
    # force duplicate timestamps (peer semantics) and bucket-boundary hits
    ts_s[10:20] = ts_s[10]
    ts_s[100] = 600  # exactly one window width
    df = pd.DataFrame({"e": np.arange(n),
                       "ts": pd.to_datetime(ts_s, unit="s"),
                       "v": rng.normal(0, 1, n)})
    w = 600_000_000  # 10 min
    out = trailing_global_aggregate(
        ray.data.from_pandas(df.sample(frac=1, random_state=0)).repartition(6),
        "ts", window_us=w, value_col="v",
    ).to_pandas().sort_values("e").reset_index(drop=True)

    us = (ts_s.astype(np.int64)) * 1_000_000
    for i in [0, 10, 15, 100, 700, n - 1]:
        m = (us >= us[i] - w) & (us <= us[i])
        assert out.loc[i, "w_count"] == m.sum()
        assert np.isclose(out.loc[i, "w_sum"], df["v"].to_numpy()[m].sum(), atol=1e-5)


def test_rolling_distinct_sketch_merge_property(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import rolling_distinct_sketch

    rng = np.random.default_rng(23)
    # 14 days, 80 users/day drawn from 300 — sketch estimate must track
    # the exact trailing-7-day distinct within KMV error (~1/sqrt(k))
    frames = []
    for d in range(14):
        u = rng.choice(300, 80, replace=False)
        frames.append(pd.DataFrame({
            "ts": pd.to_datetime(d * 86_400 + np.arange(80), unit="s"),
            "uid": u,
        }))
    df = pd.concat(frames, ignore_index=True)
    out = rolling_distinct_sketch(
        ray.data.from_pandas(df).repartition(6), "ts", "uid",
        window_days=7, k=64,
    ).set_index("day")["approx_active"]

    day = (df["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000)
    for d in range(14):
        exact = df.loc[(day > d - 7) & (day <= d), "uid"].nunique()
        rel = abs(out[d] - exact) / exact
        assert rel < 0.35, (d, out[d], exact)
    # layout invariance
    out2 = rolling_distinct_sketch(
        ray.data.from_pandas(df).repartition(2), "ts", "uid",
        window_days=7, k=64,
    ).set_index("day")["approx_active"]
    assert (out == out2).all()


def test_max_streak_days_islands(ray_session):
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import max_streak_days

    # user 1: days 0,1,2, 5,6 -> streak 3; user 2: days 10 only -> 1;
    # user 3: 0,2,4 (no consecutive) -> 1
    days = {1: [0, 1, 2, 5, 6], 2: [10], 3: [0, 2, 4]}
    rows = [(u, d * 86_400 + 5) for u, ds_ in days.items() for d in ds_ for _ in (0, 1)]
    df = pd.DataFrame(rows, columns=["id", "sec"])
    df["ts"] = pd.to_datetime(df["sec"], unit="s")
    out = max_streak_days(
        ray.data.from_pandas(df[["id", "ts"]]).repartition(3),
        id_col="id", time_col="ts", num_buckets=2,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert out.set_index("id")["max_streak"].to_dict() == {1: 3, 2: 1, 3: 1}


def test_latest_row_per_key_distributive(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import latest_row_per_key

    rng = np.random.default_rng(41)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n),
        "ts": pd.to_datetime(rng.integers(0, 1000, n), unit="s"),
        "seq": np.arange(n),
        "v": rng.normal(size=n),
    })
    out = latest_row_per_key(
        ray.data.from_pandas(df).repartition(7), "k",
        order_by=["ts", "seq"], num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    expect = df.sort_values(["ts", "seq"]).groupby("k").tail(1) \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["k", "ts", "seq", "v"]], expect[["k", "ts", "seq", "v"]])
    # layout invariance
    out2 = latest_row_per_key(
        ray.data.from_pandas(df).repartition(2), "k",
        order_by=["ts", "seq"], num_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert (out["seq"].to_numpy() == out2["seq"].to_numpy()).all()


def test_trailing_global_aggregate_burst_guard(ray_session):
    """Round-2 verdict #4: all rows inside ONE window must not land in
    one giant bucket. Force the split (max_bucket_rows tiny) and pin
    row-identical output vs the unsplit plan and a brute reference."""
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import trailing_global_aggregate

    rng = np.random.default_rng(29)
    n = 800
    # the whole burst inside one 10-min window (plus stragglers around)
    ts_s = np.concatenate([rng.integers(1000, 1300, n - 60),
                           rng.integers(0, 4000, 60)])
    df = pd.DataFrame({"e": np.arange(n),
                       "ts": pd.to_datetime(np.sort(ts_s), unit="s"),
                       "v": rng.normal(size=n)})
    w = 600_000_000
    src = ray.data.from_pandas(df.sample(frac=1, random_state=1)).repartition(5)
    base = trailing_global_aggregate(src, "ts", window_us=w, value_col="v",
                                     sub_buckets=1).to_pandas().sort_values("e").reset_index(drop=True)
    split = trailing_global_aggregate(src, "ts", window_us=w, value_col="v",
                                      max_bucket_rows=100).to_pandas().sort_values("e").reset_index(drop=True)
    expl = trailing_global_aggregate(src, "ts", window_us=w, value_col="v",
                                     sub_buckets=7).to_pandas().sort_values("e").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, split)
    pd.testing.assert_frame_equal(base, expl)
    us = df.sort_values("e")["ts"].astype("int64").to_numpy() // 1000  # ns -> us
    for i in [0, 100, 400, n - 1]:
        m = (us >= us[i] - w) & (us <= us[i])
        assert base.loc[i, "w_count"] == m.sum()


def test_concentration_deciles_whale_dominates(ray_session):
    """One user holding ~all value: decile 1 must carry ~the whole
    cumulative share, and shares must sum to 1."""
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.agg import concentration_deciles

    df = pd.DataFrame({"user_id": np.arange(100).repeat(2),
                       "value": [0.5] * 200})
    df.loc[df["user_id"] == 7, "value"] = 5000.0
    out = concentration_deciles(ray.data.from_pandas(df).repartition(4),
                                "user_id", "value")
    assert len(out) == 10 and out["users"].sum() == 100
    assert out.loc[0, "share"] > 0.9  # the whale decile
    assert abs(out["share"].sum() - 1.0) < 1e-5
    assert out["cum_share"].iloc[-1] == 1.0
