"""Tutorial 4 — End-to-end: synthetic health monitoring.

Mirrors `tutorial_notebooks/End to End/
synthetic_health_monitoring_analysis.ipynb` (generate → TimeFrame →
SingleStepTargetShifter) and extends it with the engine's distributed
stages the notebook's roadmap names as future work: sliding-window
partitioning, per-partition model training, and MASV feature scoring
— all streaming over ``ray.data.Dataset``.

Run: ``PYTHONPATH=. python examples/04_end_to_end_health_monitoring.py``
"""

import numpy as np
import pandas as pd


def generate_health_data(start_date: str = "2023-01-01", days: int = 365, seed: int = 42) -> pd.DataFrame:
    """Synthetic health metrics with seasonal/weekly structure
    (deterministic re-expression of the notebook's generator)."""
    rng = np.random.default_rng(seed)
    dates = pd.date_range(start=start_date, periods=days, freq="D")
    t = np.arange(days)
    seasonal = 5 * np.sin(2 * np.pi * t / 365)
    weekly = 3 * np.sin(2 * np.pi * t / 7)
    return pd.DataFrame({
        "ds": dates,
        "systolic": 120 + seasonal + weekly + rng.normal(0, 3, days),
        "heart_rate": 70 + weekly + rng.normal(0, 3, days),
    })


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray import TemporalDataset
    from temporalscope_ray.core import convert_time_column_to_numeric
    from temporalscope_ray.modeling import TemporalModelTrainer, calculate_masv
    from temporalscope_ray.stages.partition import SlidingWindowPartitioner, print_config
    from temporalscope_ray.stages.shift import SingleStepTargetShifter

    health_df = generate_health_data()
    print("Preview of generated health data:")
    print(health_df.head())

    # --- TimeFrame + one-step-ahead shift (the notebook's core flow) ---
    ds = ray.data.from_pandas(health_df)
    systolic_td = TemporalDataset(ds, time_col="ds", target_col="systolic")
    shifted = SingleStepTargetShifter(n_lags=1, verbose=True).fit_transform(systolic_td)
    print(f"Original {systolic_td.ds.count()} rows -> transformed {shifted.ds.count()} "
          "(one less: last target unknowable)")

    # --- sliding-window partitioning over the shifted series ---
    numeric = convert_time_column_to_numeric(shifted.ds, "ds", "us")
    td = TemporalDataset(numeric, time_col="ds", target_col="systolic_shift_1",
                         sort=False, validate=False)
    partitioner = SlidingWindowPartitioner(td, num_partitions=4, train_pct=0.7, test_pct=0.3)
    partitioner.fit()
    print_config({
        "scheme": partitioner.scheme, "num_partitions": partitioner.num_partitions,
        "window_size": partitioner.window_size, "stride": partitioner.stride,
        "train_pct": partitioner.train_pct, "test_pct": partitioner.test_pct,
    })
    tagged = partitioner.tag_windows()

    # --- one ridge model per window, zero-leakage in-window split ---
    feats = ["heart_rate"]
    trainer = TemporalModelTrainer(target_col="systolic_shift_1", feature_cols=feats,
                                   time_col="ds", train_pct=0.7)
    metrics = trainer.fit_predict(tagged, partition_col="window_id").to_pandas()
    print("per-window model metrics:")
    print(metrics.sort_values("partition_id").to_string(index=False))

    # --- MASV attribution scores over the full series ---
    coefs = [float(metrics[f"coef_{c}"].mean()) for c in feats]
    masv = calculate_masv(shifted.ds, feature_cols=feats, coefs=coefs)
    print("MASV (mean absolute attribution per feature):")
    for feat, score in sorted(masv.items()):
        print(f"  {feat}: {score:.4f}")


if __name__ == "__main__":
    import ray

    main()
    ray.shutdown()
