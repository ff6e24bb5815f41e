"""Tutorial 11 — Distributed analytics closures (beyond the reference).

The pattern this tutorial demonstrates: REDUCE the fact table once to a
small exact aggregate (partial sums / transition counts / covariance —
each a combiner + ONE exchange), then CLOSE the analysis on the driver
over that vocabulary- or dimension-sized object. Every stage here is
oracle-gated in ``__ray_entry__`` with a bit-exact or rounded DuckDB
replay:

1. calendar OLS via the Gram reduce (int64 normal-equation moments,
   closed-form Cramer solve) — "how much of this metric is clock?",
2. Markov removal-effect attribution (first-conversion journey chain,
   per-channel graph surgery, fixed power steps),
3. PageRank over the event-type transition graph,
4. PCA top-component loadings by per-step-quantized power iteration,
5. frequency-domain seasonality (relative DFT amplitude at 24h/168h),
6. Holt level+trend smoothing — a true per-entity recursion whose
   per-row output is bit-exact against a recursive-CTE replay.

Scale shape: the fact table never reaches the driver; what does is
O(groups), O(|types|²) or O(d²) — constants at any corpus size.

Run: ``PYTHONPATH=. python examples/11_analytics_closures.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray.stages.graph import pagerank_types, removal_effect_attribution
    from temporalscope_ray.stages.linalg import pca_power_loadings
    from temporalscope_ray.stages.stats import (
        holt_smooth_by_entity,
        ols_calendar_by_group,
        spectral_amplitude_by_group,
    )

    rng = np.random.default_rng(31)
    n = 4000
    ts = pd.Timestamp("2024-02-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 40 * 86400, n)), unit="s")
    hour = ts.hour.to_numpy()
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(1, 60, n),
        "ts": ts,
        "event_type": rng.choice(["view", "click", "cart", "purchase"],
                                 n, p=[0.5, 0.3, 0.12, 0.08]),
        # plant a clock signal the OLS and the DFT should both find
        "value": 10.0 + 1.5 * hour + rng.normal(0, 3.0, n),
    })
    ds = ray.data.from_pandas(df).repartition(4)

    # 1: Gram-reduce OLS — recovers the planted 1.5/hour slope
    ols = ols_calendar_by_group(ds, "event_type", "ts", "value").to_pandas()
    print("calendar OLS (planted b_hour=1.5):")
    print(ols.round(3).to_string(index=False))

    # 2: which channel actually drives conversion?
    eff = removal_effect_attribution(
        ds, id_col="user_id", time_col="ts", type_col="event_type",
        conv_type="purchase", tiebreak=["event_id"], iters=12)
    print("\nremoval effects (1 - P(conv|channel removed)/P(conv)):")
    print(eff.to_string(index=False))

    # 3: stationary behavioral importance of each state
    pr = pagerank_types(ds, id_col="user_id", time_col="ts",
                        type_col="event_type", tiebreak=["event_id"])
    print("\npagerank over the transition graph:")
    print(pr.to_string(index=False))

    # 4: dominant embedding axis, SQL-replayably
    emb = rng.normal(0, 0.05, size=(800, 8))
    emb[:, 3] += rng.normal(0, 2.0, 800)  # plant the principal axis
    eds = ray.data.from_pandas(
        pd.DataFrame({"embedding": list(emb.astype(np.float32))})).repartition(3)
    load = pca_power_loadings(eds, "embedding")
    top = load.loc[load["loading"].abs().idxmax()]
    print(f"\nPCA top component: dim {int(top['i'])} "
          f"(loading {top['loading']:.4f}) — planted dim 3")
    assert int(top["i"]) == 3

    # 5: is there a daily rhythm? (uniform seconds -> weak; compare a
    # planted 9am-spike series)
    spiky = pd.DataFrame({
        "ts": pd.date_range("2024-02-01 09:00", periods=300, freq="24h"),
        "event_type": "rhythmic"})
    amp = spectral_amplitude_by_group(
        ray.data.from_pandas(pd.concat([df[["ts", "event_type"]], spiky],
                                       ignore_index=True)),
        "ts", "event_type", periods_hours=(24,))
    print("\nrelative DFT amplitude at the daily frequency:")
    print(amp.to_string(index=False))

    # 6: trend-aware smoothing, per-row state
    holt = holt_smooth_by_entity(
        ds, "user_id", "ts", "value", alpha=0.3, beta=0.1,
        tiebreak=["event_id"], keep_cols=["event_id"]).to_pandas()
    one = holt.merge(df[["event_id", "value"]], on="event_id") \
              .query("user_id == 1").head(5)
    print("\nHolt level/trend (user 1, first rows):")
    print(one[["event_id", "value", "holt_level", "holt_trend"]]
          .round(3).to_string(index=False))


if __name__ == "__main__":
    import ray

    main()
    ray.shutdown()
