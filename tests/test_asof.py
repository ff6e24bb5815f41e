"""As-of join tests: broadcast and bucketed paths vs pd.merge_asof oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray.stages.asof import asof_join, semi_join


def make_sides(seed=5, n_left=60, n_right=40, entities=(1, 2, 3, 4)):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2023-01-01")
    left = pd.DataFrame(
        {
            "user_id": rng.choice(entities, n_left),
            "ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.integers(0, 10_000, n_left)],
            "lval": rng.normal(size=n_left),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rng.choice(entities, n_right),
            "ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.integers(0, 10_000, n_right)],
            "state": rng.normal(size=n_right),
        }
    )
    # dedupe (user_id, ts) so the oracle is unambiguous
    left = left.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    right = right.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    return left, right


def oracle(left, right, tolerance=None):
    return pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
        tolerance=tolerance,
    )


def normalize(df):
    return df.sort_values(["user_id", "ts"]).reset_index(drop=True)


def test_asof_broadcast_matches_oracle():
    left, right = make_sides()
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id", broadcast=True
    ).to_pandas()
    pd.testing.assert_frame_equal(normalize(out), normalize(oracle(left, right)), check_like=True)


def test_asof_bucketed_matches_oracle():
    left, right = make_sides()
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id",
        broadcast=False, num_buckets=4,
    ).to_pandas()
    pd.testing.assert_frame_equal(normalize(out)[["user_id", "ts", "lval", "state"]],
                                  normalize(oracle(left, right))[["user_id", "ts", "lval", "state"]],
                                  check_like=True)


def test_asof_tolerance():
    left, right = make_sides()
    tol = pd.Timedelta("500min")
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id",
        broadcast=True, tolerance=tol,
    ).to_pandas()
    pd.testing.assert_frame_equal(normalize(out), normalize(oracle(left, right, tolerance=tol)), check_like=True)


def test_asof_zero_leakage():
    """The joined state must come strictly from the past (right.ts <= left.ts)."""
    left = pd.DataFrame({"user_id": [1, 1], "ts": [5.0, 10.0], "lval": [0.0, 0.0]})
    right = pd.DataFrame({"user_id": [1, 1, 1], "ts": [4.0, 9.0, 11.0], "state": [40.0, 90.0, 110.0]})
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id", broadcast=True
    ).to_pandas().sort_values("ts")
    assert out["state"].tolist() == [40.0, 90.0]  # never 110.0 (future)


def test_asof_suffix_on_overlap():
    left = pd.DataFrame({"user_id": [1], "ts": [5.0], "state": [1.0]})
    right = pd.DataFrame({"user_id": [1], "ts": [4.0], "state": [2.0]})
    out = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id",
                    broadcast=True).to_pandas()
    assert out["state"].tolist() == [1.0] and out["state_right"].tolist() == [2.0]


def test_asof_invalid_direction():
    left, right = make_sides()
    with pytest.raises(ValueError, match="direction must be"):
        asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", direction="sideways")


def test_semi_and_anti_join():
    df = pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": list("abcde")})
    ds = ray.data.from_pandas(df)
    kept = semi_join(ds, [2, 4], "k").to_pandas()
    assert sorted(kept["k"]) == [2, 4]
    dropped = semi_join(ds, [2, 4], "k", anti=True).to_pandas()
    assert sorted(dropped["k"]) == [1, 3, 5]


def test_asof_bucketed_nullable_int_left_column():
    """Left int column containing nulls must survive the union/restore
    round-trip (plain astype(int64) would raise on NaN)."""
    import pyarrow as pa

    left = pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([5.0, 10.0, 7.0]),
        "flag": pa.array([7, None, 9], type=pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([4.0, 6.0]),
        "state": pa.array([40.0, 60.0]),
    })
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), on="ts", by="user_id",
                    broadcast=False, num_buckets=2).to_pandas().sort_values(["user_id", "ts"])
    assert out["state"].tolist() == [40.0, 40.0, 60.0]
    assert out["flag"].isna().sum() == 1 and out["flag"].dropna().tolist() == [7, 9]


def test_asof_bucketed_preserves_big_int64_ids():
    """int64 values above 2^53 must come through the bucketed path
    bit-exact (the old pandas union round-trip went through float64 and
    silently corrupted snowflake-style ids)."""
    import pyarrow as pa

    big = [(1 << 62) + 12345678901234567, (1 << 62) + 12345678901234568, (1 << 61) + 3]
    left = pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([5.0, 10.0, 7.0]),
        "row_id": pa.array(big, type=pa.int64()),
    })
    right = pa.table({
        "user_id": pa.array([1, 2], type=pa.int64()),
        "ts": pa.array([4.0, 6.0]),
        "state": pa.array([40.0, 60.0]),
    })
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right), on="ts", by="user_id",
                    broadcast=False, num_buckets=2).to_pandas().sort_values(["user_id", "ts"])
    assert sorted(out["row_id"].tolist()) == sorted(big)  # adjacent big ints stay distinct


def test_range_join_bucketed_matches_broadcast():
    from temporalscope_ray.stages.asof import range_join

    rng = np.random.default_rng(3)
    n = 500
    left = pd.DataFrame({
        "user_id": rng.integers(0, 20, n), "ts": rng.uniform(0, 100, n).round(3), "lv": np.arange(n, dtype=np.float64),
    })
    right = pd.DataFrame({
        "user_id": rng.integers(0, 20, n), "ts": rng.uniform(0, 100, n).round(3), "rv": np.arange(n, dtype=np.float64),
    })
    kw = dict(on="ts", by="user_id", lower=-5.0, upper=0.0, right_cols=["rv"])
    a = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right), broadcast=True, **kw).to_pandas()
    b = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right), broadcast=False, num_buckets=4, **kw).to_pandas()
    key = ["user_id", "ts", "lv", "ts_right", "rv"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])


def test_asof_nearest_tie_prefers_backward():
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.asof import asof_join

    left = pd.DataFrame({"id": [1, 1, 1], "ts": [10, 20, 30], "k": [0, 1, 2]})
    right = pd.DataFrame({"id": [1, 1, 1, 1], "ts": [5, 15, 25, 35], "v": [1.0, 2.0, 3.0, 4.0]})
    for broadcast in (True, False):
        out = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="ts", by="id", right_cols=["v"], direction="nearest",
            broadcast=broadcast, num_buckets=2,
        ).to_pandas().sort_values("k")
        # every tie (equidistant prior/next) resolves to the PAST row
        assert out["v"].tolist() == [1.0, 2.0, 3.0], f"broadcast={broadcast}"


def test_semi_join_bucketed_path_matches_broadcast(ray_session):
    """VERDICT r1 item 2 closure: force the survivor set ABOVE the
    broadcast threshold so the bucketed exchange path runs, and pin it
    row-for-row against the broadcast path (semi AND anti)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.asof import semi_join

    rng = np.random.default_rng(19)
    left = pd.DataFrame({"k": rng.integers(0, 5000, 20_000),
                         "v": rng.random(20_000)})
    # survivor set = 95% of the key space (the dedup shape: nearly
    # everything survives)
    keys = pd.DataFrame({"k": np.arange(0, 4750, dtype=np.int64)})
    lds = ray.data.from_pandas(left).repartition(6)
    kds = ray.data.from_pandas(keys).repartition(4)

    for anti in (False, True):
        bc = semi_join(lds, kds, "k", anti=anti).to_pandas() \
            .sort_values(["k", "v"]).reset_index(drop=True)
        bucketed = semi_join(lds, kds, "k", anti=anti,
                             broadcast_limit_rows=0).to_pandas() \
            .sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(bc, bucketed)
        want = left[left["k"].isin(keys["k"]) != anti]
        assert len(bc) == len(want)
