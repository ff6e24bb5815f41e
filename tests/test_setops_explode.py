"""Unit tests for set operations, list explode, grouped quantiles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.agg import grouped_quantile
from temporalscope_ray.stages.reshape import explode_list
from temporalscope_ray.stages.setops import except_distinct, intersect_distinct


def test_setops_distinct_and_null_safe(ray_session):
    l = ray.data.from_arrow(
        pa.table({"a": [1, 1, 2, 3, None], "b": ["x", "x", "y", "z", None]})
    )
    r = ray.data.from_arrow(pa.table({"a": [2, None], "b": ["y", None]}))
    ex = (
        except_distinct(l, r, num_buckets=4)
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    # duplicates collapse; (2,y) and the all-null row are null-safe-equal
    assert ex["a"].tolist() == [1, 3]
    it = intersect_distinct(l, r, num_buckets=4).to_pandas()
    assert len(it) == 2
    assert set(it["b"].dropna()) == {"y"}
    assert it["a"].isna().sum() == 1  # the all-null row intersects


def test_setops_reject_schema_mismatch(ray_session):
    l = ray.data.from_arrow(pa.table({"a": [1]}))
    r = ray.data.from_arrow(pa.table({"b": [1]}))
    with pytest.raises(ValueError, match="schemas must match"):
        except_distinct(l, r)


def test_explode_list_ordinality_and_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": [1, 2, 3, 4],
                "v": pa.array([[10.0, 11.0], [], None, [42.0]],
                              type=pa.list_(pa.float64())),
            }
        )
    )
    out = (
        explode_list(ds, "v", idx_col="i", value_name="x")
        .to_pandas()
        .sort_values(["k", "i"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 1, 4]  # empty + null lists emit nothing
    assert out["i"].tolist() == [0, 1, 0]
    assert out["x"].tolist() == [10.0, 11.0, 42.0]


def test_explode_list_rejects_non_list(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="not a list"):
        explode_list(ds, "k")


def test_grouped_quantile_matches_numpy(ray_session):
    rng = np.random.default_rng(5)
    g = np.repeat(["a", "b"], 50)
    v = rng.normal(size=100)
    v[3] = np.nan  # nulls dropped per group
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v}))
    out = (
        grouped_quantile(ds, "g", "v", q=0.5, num_buckets=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp_a = np.nanquantile(v[:50], 0.5)
    exp_b = np.nanquantile(v[50:], 0.5)
    assert out["v_p50"].tolist() == pytest.approx([exp_a, exp_b])
    with pytest.raises(ValueError, match="must be in"):
        grouped_quantile(ds, "g", "v", q=1.5)


def test_robust_scale_per_group(ray_session):
    from temporalscope_ray.stages.stats import robust_scale_per_group

    g = np.repeat(["a", "b"], 5)
    v = np.array([1.0, 2.0, 3.0, 4.0, 100.0,   # heavy tail in 'a'
                  7.0, 7.0, 7.0, 7.0, 7.0])    # zero IQR in 'b'
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v}))
    out = (
        robust_scale_per_group(ds, "g", "v", num_buckets=2)
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    a = out[out["g"] == "a"]
    med, iqr = 3.0, np.quantile(v[:5], 0.75) - np.quantile(v[:5], 0.25)
    assert a["v_robust"].tolist() == pytest.approx(((np.sort(v[:5]) - med) / iqr).tolist())
    # zero IQR -> NaN, mirroring SQL NULLIF
    assert out[out["g"] == "b"]["v_robust"].isna().all()


def test_table_diff_counts_and_atol(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.setops import table_diff

    a = pd.DataFrame({"k": [1, 2, 3, 4, 5],
                      "cap": ["a", "b", "c", "d", "e"],
                      "v": [1.0, 2.0, 3.0, np.nan, 5.0]})
    b = pd.DataFrame({"k": [2, 3, 4, 5, 6],
                      "cap": ["b", "X", "d", "e", "f"],          # k=3 caption differs
                      "v": [2.0, 3.0, np.nan, 5.0 + 1e-9, 6.0]}) # k=5 off by 1e-9
    da, db = ray.data.from_pandas(a).repartition(2), ray.data.from_pandas(b)

    exact = table_diff(da, db, "k", ["cap", "v"]).iloc[0]
    assert exact["n_left"] == 5 and exact["n_right"] == 5
    assert exact["n_both"] == 4 and exact["n_only_left"] == 1 == exact["n_only_right"]
    assert exact["n_mismatch"] == 2          # caption diff + float ulp diff
    assert exact["pass_rate"] == 0.5
    # NaN == NaN matched (k=4 passes in both runs)

    loose = table_diff(da, db, "k", ["cap", "v"], atol=1e-6).iloc[0]
    assert loose["n_mismatch"] == 1          # only the caption diff survives

    with pytest.raises(Exception):           # duplicate keys refuse
        table_diff(ray.data.from_pandas(pd.DataFrame({"k": [1, 1], "cap": ["a", "a"], "v": [0.0, 0.0]})),
                   db, "k", ["cap", "v"])


def test_table_diff_composite_key_image_grain(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.setops import table_diff

    ts = pd.date_range("2024-01-01", periods=4, freq="h")
    a = pd.DataFrame({"eid": ["u1", "u1", "u2", "u2"], "ts": ts.tolist(),
                      "cap": ["a", "b", "c", "d"], "phash": [1, 2, 3, 4]})
    b = a.copy()
    b.loc[2, "cap"] = "X"
    rep = table_diff(ray.data.from_pandas(a), ray.data.from_pandas(b),
                     ["eid", "ts"], ["cap", "phash"]).iloc[0]
    assert rep["n_both"] == 4 and rep["n_mismatch"] == 1
    assert rep["pass_rate"] == 0.75
