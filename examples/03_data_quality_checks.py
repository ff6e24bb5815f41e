"""Tutorial 3 — XAI data-quality validation.

Mirrors `tutorial_notebooks/Introduction/3_xai_data_quality_checks.ipynb`:
run the DatasetValidator's research-backed checks (sample size,
feature count/ratio, variability, class balance) over a good and a
deliberately problematic dataset, plus the TimeFrame-level error
probes (string time column, missing column, duplicate timestamps).
All checks are streaming aggregates — nothing materializes the
dataset on the driver.

Run: ``PYTHONPATH=. python examples/03_data_quality_checks.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray.validator import DatasetValidator

    rng = np.random.default_rng(1)
    good = pd.DataFrame(
        {f"f{i}": rng.normal(size=4000) for i in range(8)}
        | {"t": np.arange(4000), "target": rng.integers(0, 2, 4000)}
    )
    validator = DatasetValidator(time_col="t", target_col="target")
    results = validator.fit_transform(ray.data.from_pandas(good))
    validator.print_report(results)

    problematic = pd.DataFrame({
        "t": np.arange(40),
        "f0": np.ones(40),                       # zero variability
        "target": [0] * 38 + [1] * 2,            # imbalanced classes
    })
    results = DatasetValidator(time_col="t", target_col="target").fit_transform(
        ray.data.from_pandas(problematic))
    failed = sorted(k for k, v in results.items() if not v.passed)
    print(f"problematic dataset fails: {failed}")

    # --- TimeFrame-level error probes (reference error-message parity) ---
    from temporalscope_ray import TemporalDataset
    from temporalscope_ray.exceptions import TimeColumnError

    dup = pd.DataFrame({
        "ds": pd.to_datetime(["2023-01-01", "2023-01-01", "2023-01-02"]),
        "value": [1.0, 2.0, 3.0],
    })
    try:
        TemporalDataset(ray.data.from_pandas(dup), time_col="ds", target_col="value",
                        enforce_temporal_uniqueness=True)
    except TimeColumnError as e:
        print(f"duplicate-timestamp probe raised: {e}")

    try:
        TemporalDataset(ray.data.from_pandas(dup), time_col="nope", target_col="value")
    except ValueError as e:
        print(f"missing-column probe raised: {e}")


if __name__ == "__main__":
    import ray

    main()
    ray.shutdown()
