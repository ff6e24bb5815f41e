"""Tutorial 2 — Single-step target shifting (zero temporal leakage).

Mirrors `tutorial_notebooks/Introduction/
2_single_step_target_shifting.ipynb`: fit/transform on a
TemporalDataset, direct use on a bare ``ray.data.Dataset``, and the
row-drop contract (n rows in → n − n_lags·groups rows out). The shift
is a distributed boundary-exchange — per-entity buckets shift
in-task; the global single-series path exchanges only block-edge rows.

Run: ``PYTHONPATH=. python examples/02_single_step_target_shifting.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray import TemporalDataset
    from temporalscope_ray.stages.shift import SingleStepTargetShifter

    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "ds": pd.date_range("2023-01-01", periods=365, freq="D"),
        "systolic": 120 + 5 * np.sin(2 * np.pi * np.arange(365) / 365) + rng.normal(0, 3, 365),
    })

    # --- TemporalDataset route (reference: shifter.fit_transform(tf)) ---
    td = TemporalDataset(ray.data.from_pandas(df), time_col="ds", target_col="systolic")
    shifter = SingleStepTargetShifter(n_lags=1, verbose=True)
    shifted = shifter.fit_transform(td)
    n_in, n_out = td.ds.count(), shifted.ds.count()
    print(f"rows: {n_in} -> {n_out} (one dropped: the last row's target is unknowable)")
    print(shifted.ds.take(3))

    # --- bare-Dataset route (reference: shifter on a raw DataFrame) ---
    raw = ray.data.from_pandas(df.rename(columns={"systolic": "target"}))
    out = SingleStepTargetShifter(target_col="target", n_lags=2).fit_transform(raw)
    print(f"bare Dataset, n_lags=2: {raw.count()} -> {out.count()} rows")

    # --- leakage check: the shifted target at t equals the original at t+1 ---
    pdf = shifted.ds.to_pandas().sort_values("ds").reset_index(drop=True)
    orig = df.sort_values("ds").reset_index(drop=True)
    assert np.allclose(pdf["systolic_shift_1"].to_numpy(), orig["systolic"].to_numpy()[1:])
    print("zero-leakage check passed: target_t == original_{t+1} for every row")


if __name__ == "__main__":
    import ray

    main()
    ray.shutdown()
