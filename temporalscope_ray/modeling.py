"""Per-partition model training and scoring — ST1/ST2 in SURVEY.md §2.3.

Reference shapes (both commented-out/planned in the snapshot; the
semantics are taken from their docstrings):

- ``TemporalModelTrainer`` (reference
  `/root/reference/src/temporalscope/modeling/temporal_model_trainer.py:42-114`):
  fit a model per partition on the train slice, predict, report
  metrics. The reference uses LightGBM — IMPORT-GATED here (the
  ``lance`` pattern of ``sources/fragments.py``): ``model="auto"``
  runs a per-partition ``LGBMRegressor`` when lightgbm is importable
  and otherwise falls back to a closed-form ridge regression (numpy
  normal equations), which is REAL, deterministic and exercises the
  identical distributed shape: one fit per group via
  ``groupby(partition_col).map_groups``. ``model="lightgbm"`` raises
  ImportError when absent (loud, never silent).
- ``calculate_masv`` (Mean Absolute SHAP Values, reference
  ``metrics/masv.py:33-98``): the explainer is loaded ONCE per actor
  (``__init__``), batches are scored in ``__call__``. SHAP is
  IMPORT-GATED the same way: ``explainer="auto"`` builds a
  ``shap.LinearExplainer`` per actor when shap is importable, else
  computes exact linear-model attributions ``|coef_j * (x_j -
  mean_j)|`` — for linear models the two are THE SAME VALUES (this is
  the Shapley value of a linear feature), so the gate swaps
  implementation, never semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import ray
import ray.data


def _try_import(name: str):
    """Import-gate for optional reference-true dependencies (the
    ``lance`` pattern of ``sources/fragments.py``): returns the module
    or None, never raises — environments WITH shap/lightgbm run the
    reference's actual model family, environments without keep the
    documented exact fallbacks."""
    try:
        return __import__(name)
    except ImportError:
        return None


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
        model: str = "auto",
        model_params: Optional[dict] = None,
    ):
        if not 0 < train_pct < 1:
            raise ValueError("`train_pct` must be in (0, 1)")
        if model not in ("auto", "ridge", "lightgbm"):
            raise ValueError("model must be 'auto', 'ridge' or 'lightgbm'")
        if model == "lightgbm" and _try_import("lightgbm") is None:
            raise ImportError(
                "model='lightgbm' requires the lightgbm package (the "
                "reference's model family, temporal_model_trainer.py:42-114); "
                "use model='ridge' or 'auto' for the closed-form fallback")
        # 'auto' = reference-true LightGBM when importable, else ridge
        self.model = ("lightgbm" if _try_import("lightgbm") is not None
                      else "ridge") if model == "auto" else model
        self.model_params = dict(model_params or {})
        self.target_col = target_col
        self.feature_cols = list(feature_cols)
        self.time_col = time_col
        self.train_pct = train_pct
        self.l2 = l2

    def fit_predict(self, ds: ray.data.Dataset, partition_col: str) -> ray.data.Dataset:
        target, feats, tcol, pct, l2 = self.target_col, self.feature_cols, self.time_col, self.train_pct, self.l2
        use_lgbm, lgbm_params = self.model == "lightgbm", self.model_params

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
            if use_lgbm:
                # reference-true family (LightGBM regressor per
                # partition, import-gated; deterministic single-thread
                # params so re-runs reproduce)
                import lightgbm as lgb

                params = {"n_estimators": 50, "num_leaves": 15,
                          "deterministic": True, "n_jobs": 1,
                          "random_state": 7, "verbosity": -1,
                          **lgbm_params}
                mdl = lgb.LGBMRegressor(**params).fit(X[:cut], y[:cut])
                pred = mdl.predict(X[cut:])
                # surface gain importances in the coef_* slots so the
                # output schema is identical across model families
                w = np.concatenate(
                    ([0.0], mdl.booster_.feature_importance("gain")))
            else:
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


class ShapMasvScorer:
    """Import-gated reference-true MASV scorer: a ``shap.LinearExplainer``
    is built ONCE per actor in ``__init__`` (same load-once contract as
    ``MasvScorer``); batches emit the same partial-row layout, so
    ``calculate_masv`` reduces both scorers identically. For linear
    models shap's exact values equal ``coef_j * (x_j - mean_j)``."""

    def __init__(self, model_ref, feature_cols: Sequence[str]):
        import shap  # import-gated: only constructed when importable

        model = ray.get(model_ref)
        coefs = np.asarray(model["coefs"], dtype=np.float64)
        self.means = np.asarray(model["means"], dtype=np.float64)
        self.feature_cols = list(feature_cols)
        self.explainer = shap.LinearExplainer(
            (coefs, 0.0), masker=shap.maskers.Independent(
                self.means.reshape(1, -1)))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        X = batch[self.feature_cols].to_numpy(dtype=np.float64)
        phi = np.abs(np.asarray(self.explainer.shap_values(X), dtype=np.float64))
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
    explainer: str = "auto",
) -> dict[str, float]:
    """Mean absolute attribution per feature over the whole Dataset
    (reference ``masv.py:33-98`` semantics: mean |SHAP| per feature).
    One streaming actor-pool pass + tiny driver reduction.

    ``explainer``: ``"linear"`` computes the exact linear-model Shapley
    ``|coef_j * (x_j - mean_j)|`` (always available); ``"shap"``
    requires the shap package (import-gated, the reference's actual
    explainer) and runs ``shap.LinearExplainer`` per actor in
    ``__init__`` — for a linear model the two produce the SAME values,
    so the gate swaps implementation, not semantics. ``"auto"`` picks
    shap when importable, else linear."""
    from .stages.grouped import clamp_concurrency

    if explainer not in ("auto", "linear", "shap"):
        raise ValueError("explainer must be 'auto', 'linear' or 'shap'")
    if explainer == "shap" and _try_import("shap") is None:
        raise ImportError(
            "explainer='shap' requires the shap package (reference "
            "masv.py:33-98); use explainer='linear' or 'auto' for the "
            "exact linear fallback")
    use_shap = (_try_import("shap") is not None) if explainer == "auto"         else explainer == "shap"
    scorer_cls = ShapMasvScorer if use_shap else MasvScorer
    feature_cols = list(feature_cols)
    if means is None:
        from ray.data.aggregate import Mean

        row = ds.aggregate(*[Mean(c, alias_name=c) for c in feature_cols])
        means = [float(row[c]) for c in feature_cols]
    model_ref = ray.put({"coefs": list(coefs), "means": list(means)})
    parts = ds.map_batches(
        scorer_cls,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(model_ref, feature_cols),
    ).to_pandas()
    return {
        c: float(parts[f"masv_{c}"].sum() / max(int(parts[f"__n_{c}__"].sum()), 1))
        for c in feature_cols
    }
