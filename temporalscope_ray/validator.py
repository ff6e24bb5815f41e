"""DatasetValidator — quality-gate checks (reference
`/root/reference/src/temporalscope/datasets/dataset_validator.py:77-448`,
A8-A13 in SURVEY.md §2.5), re-expressed as streaming aggregates.

Scale notes: row counts are metadata-cheap; null counts are one
partial-per-batch pass; per-feature distinct counts use a *bounded
distinct sketch* — each batch emits its K smallest distinct values per
column, whose union provably contains the K smallest global values, so
the predicate ``n_unique >= K`` is EXACT without a full distinct
shuffle (K = ``min_unique_values``, default 10).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .core import _is_numeric, _schema, count_dataset_column_nulls


@dataclass
class ValidationResult:
    """Mirrors the reference dataclass (dataset_validator.py:35-70)."""

    passed: bool
    message: Optional[str] = None
    details: Dict[str, Any] = field(default_factory=dict)
    severity: str = "WARNING"


class DatasetValidator:
    AVAILABLE_CHECKS = {
        "sample_size",
        "feature_count",
        "feature_ratio",
        "feature_variability",
        "class_balance",
    }

    def __init__(
        self,
        time_col: str,
        target_col: str,
        min_samples: int = 3000,
        max_samples: int = 50000,
        min_features: int = 4,
        max_features: int = 500,
        max_feature_ratio: float = 0.1,
        min_unique_values: int = 10,
        checks_to_run: Optional[List[str]] = None,
        enable_warnings: bool = True,
    ):
        self.time_col = time_col
        self.target_col = target_col
        self.min_samples = min_samples
        self.max_samples = max_samples
        self.min_features = min_features
        self.max_features = max_features
        self.max_feature_ratio = max_feature_ratio
        self.min_unique_values = min_unique_values
        if checks_to_run is not None:
            bad = set(checks_to_run) - self.AVAILABLE_CHECKS
            if bad:
                raise ValueError(f"Invalid checks: {sorted(bad)}. Available: {sorted(self.AVAILABLE_CHECKS)}")
        self.checks_to_run = set(checks_to_run) if checks_to_run is not None else set(self.AVAILABLE_CHECKS)
        self.enable_warnings = enable_warnings

    # -- helpers -----------------------------------------------------------
    def _feature_columns(self, ds: ray.data.Dataset) -> List[str]:
        return [c for c in ds.schema().names if c not in (self.time_col, self.target_col)]

    def _warn(self, msg: str) -> None:
        if self.enable_warnings:
            warnings.warn(msg)

    # -- fit: pre-checks (dataset_validator.py:368-401) --------------------
    def fit(self, ds: ray.data.Dataset) -> "DatasetValidator":
        schema = _schema(ds)
        for col in self._feature_columns(ds):
            if not _is_numeric(schema.field(col).type):
                raise ValueError(f"Column '{col}' must be numeric")
        nulls = count_dataset_column_nulls(ds, list(schema.names))
        bad = {c: n for c, n in nulls.items() if n > 0}
        if bad:
            raise ValueError(f"Null values found in columns: {sorted(bad)}")
        return self

    # -- individual checks -------------------------------------------------
    def _check_sample_size(self, num_samples: int) -> ValidationResult:
        details = {"num_samples": num_samples}
        if num_samples < self.min_samples:
            msg = (
                f"Dataset has {num_samples} samples, fewer than recommended minimum ({self.min_samples}). "
                "This may be insufficient for complex models."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        if num_samples > self.max_samples:
            msg = (
                f"Dataset has {num_samples} samples, more than recommended maximum ({self.max_samples}). "
                "Consider using scalable implementations."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        return ValidationResult(True, None, details)

    def _check_feature_count(self, num_features: int) -> ValidationResult:
        details = {"num_features": num_features}
        if num_features < self.min_features:
            msg = (
                f"Dataset has {num_features} features, fewer than recommended minimum ({self.min_features}). "
                "This may result in an oversimplified model."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        if num_features > self.max_features:
            msg = (
                f"Dataset has {num_features} features, more than recommended maximum ({self.max_features}). "
                "Consider dimensionality reduction."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        return ValidationResult(True, None, details)

    def _check_feature_ratio(self, num_features: int, num_samples: int) -> ValidationResult:
        if num_samples == 0:
            msg = "Dataset has zero samples. Cannot calculate feature ratio."
            self._warn(msg)
            return ValidationResult(False, msg, {"ratio": 0.0})
        ratio = num_features / num_samples
        details = {"ratio": float(f"{ratio:.3f}")}
        if ratio > self.max_feature_ratio:
            msg = (
                f"Feature-to-sample ratio ({ratio:.3f}) exceeds recommended maximum ({self.max_feature_ratio}). "
                "This may increase risk of overfitting."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        return ValidationResult(True, None, details)

    def _bounded_distinct(self, ds: ray.data.Dataset, cols: List[str], k: int) -> Dict[str, int]:
        """min(k, n_unique) per column via the K-smallest sketch: each
        batch emits its k smallest distinct values; the union contains
        the k smallest global values, so reaching k proves
        ``n_unique >= k`` exactly."""

        def partial(batch: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                arr = batch.column(c).to_numpy(zero_copy_only=False)
                arr = arr[~pd.isna(arr)]
                uniq = np.unique(arr)[:k]
                out[c] = pa.array([uniq.astype(np.float64).tolist()], type=pa.list_(pa.float64()))
            return pa.table(out)

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        result = {}
        for c in cols:
            merged: set = set()
            for vals in parts[c]:
                merged.update(vals)
                if len(merged) >= k:
                    break
            result[c] = min(len(merged), k)
        return result

    def _check_feature_variability(self, ds: ray.data.Dataset) -> ValidationResult:
        details: Dict[str, Any] = {"numeric_feature": True}
        feature_cols = self._feature_columns(ds)
        if not feature_cols:
            msg = "No feature columns found. Cannot check feature variability."
            self._warn(msg)
            return ValidationResult(False, msg, details)
        nulls = count_dataset_column_nulls(ds, feature_cols)
        uniq = self._bounded_distinct(ds, feature_cols, self.min_unique_values)
        failed = []
        for col in feature_cols:
            details[col] = uniq[col]
            if uniq[col] < self.min_unique_values or nulls[col] > 0:
                failed.append(col)
        if failed:
            msg = (
                f"Features with insufficient variability or quality issues: {failed}. "
                f"Minimum unique values: {self.min_unique_values}, no null values allowed."
            )
            self._warn(msg)
            return ValidationResult(False, msg, details)
        return ValidationResult(True, None, details)

    def _check_class_balance(self, num_samples: int) -> ValidationResult:
        if not self.target_col:
            return ValidationResult(True, "No target column specified")
        return ValidationResult(True, None, {"class_counts": {"total": num_samples}})

    # -- transform (dataset_validator.py:403-448) --------------------------
    def transform(self, ds: ray.data.Dataset) -> Dict[str, ValidationResult]:
        num_samples = ds.count()
        num_features = len(self._feature_columns(ds))
        results: Dict[str, ValidationResult] = {}
        if "sample_size" in self.checks_to_run:
            results["sample_size"] = self._check_sample_size(num_samples)
        if "feature_count" in self.checks_to_run:
            results["feature_count"] = self._check_feature_count(num_features)
        if "feature_ratio" in self.checks_to_run:
            results["feature_ratio"] = self._check_feature_ratio(num_features, num_samples)
        if "feature_variability" in self.checks_to_run:
            results["feature_variability"] = self._check_feature_variability(ds)
        if "class_balance" in self.checks_to_run:
            results["class_balance"] = self._check_class_balance(num_samples)
        return results

    def fit_transform(self, ds: ray.data.Dataset) -> Dict[str, ValidationResult]:
        return self.fit(ds).transform(ds)

    def print_report(self, results: Dict[str, ValidationResult]) -> None:
        print("Validation Report\n")
        for name, res in results.items():
            status = "PASSED" if res.passed else "FAILED"
            print(f"  {name:<22} {status}  {res.message or ''}")
