"""Tutorial 1 — Loading data into a TemporalDataset (Ray-Data-first).

Mirrors the reference's `tutorial_notebooks/Introduction/
1_load_data_timeframe.ipynb` (TimeFrame modes, group-level temporal
uniqueness, metadata) re-expressed over ``ray.data.Dataset``: the
dataset stays lazy and distributed; validation and sorting are
streaming operators, not in-memory DataFrame passes.

Run: ``PYTHONPATH=. python examples/01_load_data_temporal_dataset.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray import TemporalDataset
    from temporalscope_ray.sources.datasets import DatasetLoader

    # --- built-in dataset loader (reference: DatasetLoader("macrodata")) ---
    loader = DatasetLoader("macrodata")
    ds, target = loader.load_data()
    print(f"macrodata: {ds.count()} rows, target={target!r}")
    print(ds.take(3))

    # --- single-series mode ---
    df = pd.DataFrame({
        "ds": pd.date_range("2023-01-01", periods=30, freq="D"),
        "value": np.linspace(0.0, 1.0, 30),
    })
    td = TemporalDataset(ray.data.from_pandas(df), time_col="ds", target_col="value")
    print("single-series TemporalDataset validated; head:")
    print(td.ds.take(3))

    # --- group-level temporal uniqueness (duplicate ts in DIFFERENT
    # groups is fine; inside one group it raises) ---
    from temporalscope_ray.core import validate_temporal_ordering
    from temporalscope_ray.exceptions import TimeColumnError

    ok = pd.DataFrame({
        "ds": pd.to_datetime(["2023-01-01", "2023-01-01", "2023-01-02", "2023-01-02"]),
        "grp": [1, 2, 1, 2],
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    validate_temporal_ordering(ray.data.from_pandas(ok), "ds", id_col="grp")
    print("per-group uniqueness: OK (duplicate ts across groups allowed)")
    bad = ok.assign(grp=[1, 1, 2, 2])
    try:
        validate_temporal_ordering(ray.data.from_pandas(bad), "ds", id_col="grp")
    except TimeColumnError as e:
        print(f"per-group uniqueness violation correctly raised: {e}")

    # --- metadata (reference: tf.metadata['model_config']) ---
    td.metadata["model_config"] = {"model_type": "lstm", "forecast_horizon": 1}
    print("metadata:", td.metadata)


if __name__ == "__main__":
    import ray

    main()
    ray.shutdown()
