"""Named demo-dataset registry — the reference's ``DatasetLoader``
(`/root/reference/src/temporalscope/datasets/datasets.py:47-148`)
re-expressed over Ray Datasets.

The reference's only registry entry is ``macrodata`` (statsmodels US
macro quarterly data with a ``ds`` datetime column built from
year/quarter and ``realgdp`` as target, ``datasets.py:52-70``).
statsmodels is not available in this environment, so ``macrodata``
here is a deterministic synthetic table with the same SHAPE: quarterly
``ds`` from 1959Q1, ``realgdp`` target plus macro-style numeric
feature columns. The loader contract (registry + ``load_data`` ->
(dataset, target_col)) is identical; user extensions register a
callable returning ``(ray.data.Dataset, target_col)``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..synth import hash_uniform

_MACRO_COLS = ["realgdp", "realcons", "realinv", "realgovt", "cpi", "m1", "tbilrate", "unemp", "pop", "infl"]


def _load_macrodata() -> tuple[ray.data.Dataset, str]:
    """Quarterly macro-shaped table, 1959Q1..2009Q3 (203 rows like the
    statsmodels original), deterministic."""
    n = 203
    idx = np.arange(n, dtype=np.int64)
    ds_col = pd.period_range("1959Q1", periods=n, freq="Q").to_timestamp().to_numpy().astype("datetime64[us]")
    cols: dict[str, pa.Array] = {"ds": pa.array(ds_col, type=pa.timestamp("us"))}
    for j, name in enumerate(_MACRO_COLS):
        base = 100.0 * (j + 1)
        trend = idx * (0.5 + 0.1 * j)
        noise = (hash_uniform(7, 300 + j, idx) - 0.5) * 10.0
        cols[name] = pa.array(base + trend + noise, type=pa.float64())
    return ray.data.from_arrow(pa.table(cols)), "realgdp"


AVAILABLE_DATASETS: dict[str, Callable[[], tuple[ray.data.Dataset, str]]] = {
    "macrodata": _load_macrodata,
}


class DatasetLoader:
    """Registry-backed loader (reference ``datasets.py:73-148``)."""

    def __init__(self, dataset_name: str = "macrodata"):
        if dataset_name not in AVAILABLE_DATASETS:
            raise ValueError(
                f"Dataset '{dataset_name}' is not supported. Available datasets: {sorted(AVAILABLE_DATASETS)}"
            )
        self.dataset_name = dataset_name

    def load_data(self) -> tuple[ray.data.Dataset, str]:
        ds, target_col = AVAILABLE_DATASETS[self.dataset_name]()
        return ds, target_col
