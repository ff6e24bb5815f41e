"""Per-partition model training (ST2 shape) and MASV scoring (ST1 shape)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray.modeling import MasvScorer, TemporalModelTrainer, calculate_masv
from temporalscope_ray.stages.base_protocol import TemporalPartitionerProtocol
from temporalscope_ray.stages.partition import SlidingWindowPartitioner


def linear_df(n=400, parts=4, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for p in range(parts):
        X = rng.normal(size=(n // parts, 2))
        y = 3.0 * X[:, 0] - 2.0 * X[:, 1] + 0.5 + rng.normal(scale=0.01, size=n // parts)
        for i in range(n // parts):
            rows.append({"pid": p, "t": float(i), "f1": X[i, 0], "f2": X[i, 1], "y": y[i]})
    return pd.DataFrame(rows)


def test_trainer_recovers_coefficients_per_partition():
    df = linear_df()
    trainer = TemporalModelTrainer(target_col="y", feature_cols=["f1", "f2"], time_col="t")
    out = trainer.fit_predict(ray.data.from_pandas(df), partition_col="pid").to_pandas()
    assert len(out) == 4
    assert np.allclose(out["coef_f1"], 3.0, atol=0.05)
    assert np.allclose(out["coef_f2"], -2.0, atol=0.05)
    assert (out["mse"] < 0.01).all()
    assert (out["r2"] > 0.99).all()


def test_trainer_time_ordered_split_no_leakage():
    # target jumps at the train/test boundary; if test rows leaked into
    # training, coef estimates would absorb the jump
    n = 100
    df = pd.DataFrame({"pid": 0, "t": np.arange(n, dtype=float), "f1": np.zeros(n), "y": np.zeros(n)})
    df.loc[df["t"] >= 70, "y"] = 100.0  # test region only (train_pct=0.7)
    out = TemporalModelTrainer(target_col="y", feature_cols=["f1"], time_col="t").fit_predict(
        ray.data.from_pandas(df), partition_col="pid"
    ).to_pandas()
    # model trained on y==0 rows only → predicts 0 → mse ≈ 100^2
    assert out["mse"].iloc[0] == pytest.approx(10000.0, rel=0.01)


def test_trainer_param_validation():
    with pytest.raises(ValueError, match="`train_pct` must be in"):
        TemporalModelTrainer(target_col="y", feature_cols=["f1"], time_col="t", train_pct=1.5)


def test_masv_linear_attributions():
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"f1": rng.normal(size=1000), "f2": rng.normal(size=1000) * 2})
    masv = calculate_masv(
        ray.data.from_pandas(df), feature_cols=["f1", "f2"], coefs=[1.0, 1.0], concurrency=1
    )
    # E|x - mean| for N(0,1) is sqrt(2/pi) ≈ 0.8; f2 has 2x the scale
    assert masv["f1"] == pytest.approx(np.abs(df["f1"] - df["f1"].mean()).mean(), rel=1e-9)
    assert masv["f2"] > masv["f1"] * 1.5


def test_partitioner_satisfies_protocol():
    from temporalscope_ray import TemporalDataset

    df = pd.DataFrame({"time": np.arange(40, dtype=float), "target": np.arange(40, dtype=float)})
    p = SlidingWindowPartitioner(
        TemporalDataset(ray.data.from_pandas(df), time_col="time", target_col="target"), window_size=10
    )
    assert isinstance(p, TemporalPartitionerProtocol)


def test_model_gate_lightgbm_absent_raises_loud():
    """model='lightgbm' without the package is a loud ImportError;
    'auto' silently falls back to ridge (documented gate contract)."""
    import pytest

    from temporalscope_ray.modeling import TemporalModelTrainer, _try_import

    if _try_import("lightgbm") is not None:
        pytest.skip("lightgbm present: gate takes the reference path")
    with pytest.raises(ImportError, match="lightgbm"):
        TemporalModelTrainer("y", ["x"], "t", model="lightgbm")
    assert TemporalModelTrainer("y", ["x"], "t", model="auto").model == "ridge"
    with pytest.raises(ValueError, match="model must be"):
        TemporalModelTrainer("y", ["x"], "t", model="xgboost")


def test_masv_gate_shap_absent_raises_loud(ray_session):
    import pytest

    from temporalscope_ray.modeling import _try_import, calculate_masv

    if _try_import("shap") is not None:
        pytest.skip("shap present: gate takes the reference path")
    import pandas as pd
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    with pytest.raises(ImportError, match="shap"):
        calculate_masv(ds, feature_cols=["x"], coefs=[2.0], means=[2.0],
                       explainer="shap")
    # auto falls back to the exact linear explainer: |2*(x-2)| -> 4/3
    out = calculate_masv(ds, feature_cols=["x"], coefs=[2.0], means=[2.0],
                         explainer="auto")
    assert abs(out["x"] - 4.0 / 3.0) < 1e-12


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("lightgbm") is None,
    reason="lightgbm not installed (gated reference path)")
def test_trainer_lightgbm_reference_path(ray_session):
    """Runs ONLY where lightgbm exists: same output schema as ridge."""
    import pandas as pd
    import ray.data

    from temporalscope_ray.modeling import TemporalModelTrainer

    df = pd.DataFrame({"p": ["a"] * 40, "t": range(40),
                       "x": [float(i) for i in range(40)],
                       "y": [2.0 * i for i in range(40)]})
    out = TemporalModelTrainer("y", ["x"], "t", model="lightgbm") \
        .fit_predict(ray.data.from_pandas(df), "p").to_pandas()
    assert set(out.columns) >= {"partition_id", "n_rows", "mse", "coef_x"}
