"""Range (interval) join and IVF ANN tests."""

import numpy as np
import pandas as pd
import ray.data

from temporalscope_ray.stages.asof import range_join
from temporalscope_ray.stages.similarity import knn_brute, knn_ivf


def test_range_join_matches_pandas_oracle():
    rng = np.random.default_rng(6)
    left = pd.DataFrame({"user_id": rng.integers(0, 4, 60), "ts": rng.uniform(0, 100, 60).round(2),
                         "lval": np.arange(60.0)})
    right = pd.DataFrame({"user_id": rng.integers(0, 4, 40), "ts": rng.uniform(0, 100, 40).round(2),
                          "state": np.arange(40.0)})
    out = range_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id",
        lower=-10.0, upper=0.0, concurrency=1,
    ).to_pandas()
    # oracle: cross join per user filtered to the window
    oracle = left.merge(right, on="user_id", suffixes=("", "_right"))
    oracle = oracle[(oracle["ts_right"] >= oracle["ts"] - 10.0) & (oracle["ts_right"] <= oracle["ts"])]
    key = ["user_id", "ts", "ts_right"]
    a = out.sort_values(key).reset_index(drop=True)
    b = oracle.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["state"].to_numpy() == b["state"].to_numpy()).all()
    assert (a["lval"].to_numpy() == b["lval"].to_numpy()).all()


def test_range_join_no_future_rows():
    left = pd.DataFrame({"user_id": [1], "ts": [50.0], "lval": [0.0]})
    right = pd.DataFrame({"user_id": [1, 1, 1], "ts": [45.0, 49.0, 51.0], "state": [1.0, 2.0, 3.0]})
    out = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="ts", by="user_id",
                     lower=-10.0, upper=0.0, concurrency=1).to_pandas()
    assert sorted(out["state"]) == [1.0, 2.0]  # 51.0 (future) excluded


def test_knn_ivf_recall_vs_brute():
    rng = np.random.default_rng(12)
    mat = rng.standard_normal((500, 16))
    df = pd.DataFrame({"vec_id": range(500), "embedding": list(mat)})
    ds = ray.data.from_pandas(df)
    q = mat[[5, 100, 250]]
    exact = knn_brute(ds, q, k=10, concurrency=1)
    approx = knn_ivf(ds, q, k=10, nlist=8, nprobe=4, concurrency=1)
    # recall@10 with half the lists probed should be high; self always found
    for qi, vid in enumerate([5, 100, 250]):
        ex = set(exact[exact["query_idx"] == qi]["vec_id"])
        ap = set(approx[approx["query_idx"] == qi]["vec_id"])
        assert vid in ap
        assert len(ex & ap) / 10 >= 0.5, (qi, len(ex & ap))
