"""Distributed prefix scan + token-budget packing (stages/scan.py).

The two-pass scan must be exact regardless of block layout, so every
test repartitions the input to force multiple blocks and compares
against a single-process pandas replay.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from temporalscope_ray.stages.scan import (
    global_running_sum,
    pack_by_budget,
    with_global_index,
)


def _ds(df: pd.DataFrame, blocks: int = 7) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(blocks)


def _frame(n: int = 500, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.permutation(n),  # unique order key, shuffled
            "vi": rng.integers(-50, 50, size=n),
            "vf": rng.standard_normal(n),
        }
    )
    df.loc[df.index % 11 == 3, "vf"] = np.nan
    return df


def test_running_sum_int_exact():
    df = _frame()
    out = (
        global_running_sum(_ds(df), order_by=["k"], value_col="vi", out_col="rs")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.sort_values("k").reset_index(drop=True)
    assert out["rs"].dtype == np.int64
    np.testing.assert_array_equal(out["rs"].to_numpy(), exp["vi"].cumsum().to_numpy())


def test_running_sum_exclusive_int():
    df = _frame(301, seed=1)
    out = (
        global_running_sum(_ds(df, 5), order_by=["k"], value_col="vi", out_col="rs", exclusive=True)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.sort_values("k").reset_index(drop=True)
    expected = exp["vi"].cumsum().to_numpy() - exp["vi"].to_numpy()
    np.testing.assert_array_equal(out["rs"].to_numpy(), expected)


def test_running_sum_float_nan_skipping():
    df = _frame(400, seed=3)
    out = (
        global_running_sum(_ds(df, 9), order_by=["k"], value_col="vf", out_col="rs")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = df.sort_values("k").reset_index(drop=True)
    expected = exp["vf"].fillna(0.0).cumsum().to_numpy()
    np.testing.assert_allclose(out["rs"].to_numpy(), expected, atol=1e-9)


def test_global_index_is_rank():
    df = _frame(250, seed=5)
    out = (
        with_global_index(_ds(df, 6), order_by=["k"], out_col="idx")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(out["idx"].to_numpy(), np.arange(250))
    assert "__one__" not in out.columns


def test_pack_by_budget_matches_replay():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"doc": np.arange(600), "tok": rng.integers(1, 900, size=600)})
    cap = 2048
    out = (
        pack_by_budget(_ds(df, 8), order_by=["doc"], token_col="tok", capacity=cap)
        .to_pandas()
        .sort_values("doc")
        .reset_index(drop=True)
    )
    prefix = df["tok"].cumsum().to_numpy() - df["tok"].to_numpy()
    np.testing.assert_array_equal(out["chunk_id"].to_numpy(), prefix // cap)
    # chunks are contiguous and non-decreasing in corpus order
    assert (np.diff(out["chunk_id"].to_numpy()) >= 0).all()
    assert "__prefix__" not in out.columns


def test_pack_rejects_bad_capacity():
    df = pd.DataFrame({"doc": [1], "tok": [3]})
    try:
        pack_by_budget(_ds(df, 1), order_by=["doc"], token_col="tok", capacity=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_running_sum_composite_order_key():
    # duplicate ts disambiguated by event_id — the documented contract
    df = pd.DataFrame(
        {
            "ts": np.repeat(np.arange(50), 4),
            "eid": np.arange(200),
            "v": np.ones(200, dtype=np.int64),
        }
    )
    out = (
        global_running_sum(_ds(df.sample(frac=1.0, random_state=0), 5),
                           order_by=["ts", "eid"], value_col="v", out_col="rs")
        .to_pandas()
        .sort_values(["ts", "eid"])
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(out["rs"].to_numpy(), np.arange(1, 201))


def test_global_running_max(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.scan import global_running_max

    df = pd.DataFrame({"k": np.arange(10),
                       "v": pd.array([3, None, 5, 1, None, 9, 2, 9, 1, 12],
                                     dtype="Int64")})
    ds = ray.data.from_pandas(df).repartition(3)
    incl = global_running_max(ds, order_by=["k"], value_col="v") \
        .to_pandas().sort_values("k")["running_max"].tolist()
    assert incl == [3, 3, 5, 5, 5, 9, 9, 9, 9, 12]
    excl = global_running_max(ds, order_by=["k"], value_col="v",
                              exclusive=True) \
        .to_pandas().sort_values("k")["running_max"]
    assert pd.isna(excl.iloc[0]) and excl.iloc[1:].tolist() == [3, 3, 5, 5, 5, 9, 9, 9, 9]
    # int64 beyond 2^53 must survive bit-exact (no float round-trip)
    big = pd.DataFrame({"k": [0, 1], "v": [2**62 + 3, 2**62 + 1]})
    ob = global_running_max(ray.data.from_pandas(big), order_by=["k"],
                            value_col="v").to_pandas().sort_values("k")
    assert ob["running_max"].tolist() == [2**62 + 3, 2**62 + 3]
    # floats with NaN: skipped, inherited
    fl = pd.DataFrame({"k": np.arange(5), "v": [1.5, np.nan, 0.5, 7.25, np.nan]})
    of = global_running_max(ray.data.from_pandas(fl).repartition(2),
                            order_by=["k"], value_col="v") \
        .to_pandas().sort_values("k")
    assert of["running_max"].tolist() == [1.5, 1.5, 1.5, 7.25, 7.25]
    # timestamps keep their type
    tsdf = pd.DataFrame({"k": [0, 1, 2],
                         "v": pd.to_datetime([30, 10, 50], unit="s")})
    ot = global_running_max(ray.data.from_pandas(tsdf), order_by=["k"],
                            value_col="v").to_pandas()
    assert list(ot["running_max"]) == list(pd.to_datetime([30, 30, 50], unit="s"))


def test_grouped_global_index_matches_row_number(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.scan import grouped_global_index

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(500),
        "g": rng.choice(["a", "b", "c"], 500, p=[0.7, 0.2, 0.1]),
    })
    out = grouped_global_index(
        ray.data.from_pandas(df).repartition(7), "g", order_by=["id"],
    ).to_pandas()
    expect = df.sort_values(["g", "id"]).assign(
        gi=lambda d: d.groupby("g").cumcount())
    merged = out.merge(expect[["id", "gi"]], on="id")
    assert (merged["group_idx"] == merged["gi"]).all()
    # layout invariance
    out2 = grouped_global_index(
        ray.data.from_pandas(df).repartition(2), "g", order_by=["id"],
    ).to_pandas().sort_values("id").reset_index(drop=True)
    assert (out2.merge(expect[["id", "gi"]], on="id")["group_idx"]
            == out2.merge(expect[["id", "gi"]], on="id")["gi"]).all()
