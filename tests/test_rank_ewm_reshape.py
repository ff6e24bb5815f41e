"""Unit tests for rank features, EWM smoothing, rolling median, unpivot."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.reshape import unpivot
from temporalscope_ray.stages.window_features import (
    add_ewm_features,
    add_rank_features,
    add_rolling_features,
)


def _ds():
    n = 8
    ts = pa.array(np.arange(n) * 1_000_000, type=pa.timestamp("us"))
    return ray.data.from_arrow(
        pa.table(
            {
                "id": ["a"] * 4 + ["b"] * 4,
                "ts": ts,
                "v": [3.0, 1.0, 3.0, 2.0, 10.0, np.nan, 30.0, 20.0],
            }
        )
    )


def test_rank_features_sql_semantics(ray_session):
    out = (
        add_rank_features(_ds(), id_col="id", value_col="v",
                          methods=("rank", "dense_rank", "pct_rank"), num_buckets=2)
        .to_pandas()
        .sort_values(["id", "ts"])
        .reset_index(drop=True)
    )
    a = out[out["id"] == "a"]
    # values 3,1,3,2 -> RANK (min, gaps): 3,1,3,2 ; DENSE: 3,1,3,2
    assert a["v_rank"].tolist() == [3, 1, 3, 2]
    assert a["v_dense_rank"].tolist() == [3, 1, 3, 2]
    # PERCENT_RANK = (rank-1)/(n-1), n=4
    assert a["v_pct_rank"].tolist() == pytest.approx([2 / 3, 0.0, 2 / 3, 1 / 3])
    b = out[out["id"] == "b"]
    # NaN ranks last (SQL NULLS LAST): 10->1, nan->4, 30->3, 20->2
    assert b["v_rank"].tolist() == [1, 4, 3, 2]


def test_ewm_recursion_matches_pandas(ray_session):
    out = (
        add_ewm_features(_ds(), id_col="id", time_col="ts", value_cols=["v"],
                         alpha=0.5, num_buckets=2)
        .to_pandas()
        .sort_values(["id", "ts"])
        .reset_index(drop=True)
    )
    a = out[out["id"] == "a"]["v_ewm"].tolist()
    # e1=3; e2=.5*3+.5*1=2; e3=.5*2+.5*3=2.5; e4=.5*2.5+.5*2=2.25
    assert a == pytest.approx([3.0, 2.0, 2.5, 2.25])
    b = out[out["id"] == "b"]["v_ewm"].tolist()
    # NaN carries previous: e=[10, 10, .5*10+.5*30=20, 20]
    assert b == pytest.approx([10.0, 10.0, 20.0, 20.0])


def test_ewm_rejects_bad_alpha(ray_session):
    with pytest.raises(ValueError, match="alpha"):
        add_ewm_features(_ds(), id_col="id", time_col="ts", value_cols=["v"], alpha=0.0)


def test_rolling_median_skips_nan(ray_session):
    out = (
        add_rolling_features(_ds(), id_col="id", time_col="ts", value_cols=["v"],
                             window=3, fns=("median",), num_buckets=2)
        .to_pandas()
        .sort_values(["id", "ts"])
        .reset_index(drop=True)
    )
    b = out[out["id"] == "b"]["v_roll_median_3"].tolist()
    # windows: [10] ; [10,nan] ; [10,nan,30] ; [nan,30,20]
    assert b == pytest.approx([10.0, 10.0, 20.0, 25.0])


def test_unpivot_row_multiplication_and_promotion(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": [1, 2],
                "x": pa.array([10, 20], type=pa.int32()),
                "y": [0.5, 1.5],
            }
        )
    )
    out = (
        unpivot(ds, id_cols=["k"], value_cols=["x", "y"])
        .to_pandas()
        .sort_values(["k", "variable"])
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert out["value"].dtype == np.float64  # int32 promoted with float64
    assert out[out["variable"] == "x"]["value"].tolist() == [10.0, 20.0]
    assert out[out["variable"] == "y"]["value"].tolist() == [0.5, 1.5]


def test_unpivot_rejects_missing_and_mixed(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": [1], "x": [1.0], "s": ["a"]}))
    with pytest.raises(ValueError, match="not in dataset"):
        unpivot(ds, id_cols=["k"], value_cols=["nope"])
    with pytest.raises(ValueError, match="non-numeric"):
        unpivot(ds, id_cols=["k"], value_cols=["x", "s"])


def test_ntile_sql_arithmetic(ray_session):
    from temporalscope_ray.stages.window_features import _sql_ntile

    # 7 rows, 3 buckets: q=2, r=1 -> sizes [3, 2, 2]
    rn = np.arange(1, 8, dtype=np.int64)
    n = np.full(7, 7, dtype=np.int64)
    assert _sql_ntile(rn, n, 3).tolist() == [1, 1, 1, 2, 2, 3, 3]
    # fewer rows than buckets: row i -> bucket i
    rn = np.arange(1, 3, dtype=np.int64)
    n = np.full(2, 2, dtype=np.int64)
    assert _sql_ntile(rn, n, 5).tolist() == [1, 2]


def test_add_rank_features_ntile(ray_session):
    from temporalscope_ray.stages.window_features import add_rank_features

    ds = ray.data.from_arrow(
        pa.table({"id": ["a"] * 5, "k": [1, 2, 3, 4, 5],
                  "v": [50.0, 10.0, 40.0, 20.0, 30.0]})
    )
    out = (
        add_rank_features(ds, id_col="id", value_col="v", methods=(),
                          ntile=2, tiebreak=["k"], num_buckets=2)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    # value order 10,20,30,40,50 -> buckets [1,1,1,2,2] (first gets extra)
    assert out["v_ntile"].tolist() == [1, 1, 1, 2, 2]


def test_top_ngrams_boundaries(ray_session):
    from temporalscope_ray.stages.text import top_ngrams

    ds = ray.data.from_arrow(
        pa.table({"text": ["the cat sat", "the cat", "dog", None, ""]})
    )
    out = top_ngrams(ds, "text", n=2, k=10).to_pandas()
    got = dict(zip(out["term"], out["cnt"]))
    # 'the cat' appears in both docs; no gram crosses documents,
    # single-token and empty/null docs emit nothing
    assert got == {"the cat": 2, "cat sat": 1}

    tri = top_ngrams(ds, "text", n=3, k=10).to_pandas()
    assert dict(zip(tri["term"], tri["cnt"])) == {"the cat sat": 1}

    with pytest.raises(ValueError, match="n must be"):
        top_ngrams(ds, "text", n=1)
