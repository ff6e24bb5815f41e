"""Tutorial 7 — Behavioral analytics & drift monitoring (beyond the
reference).

The event-stream rollups a production pipeline runs next to feature
engineering, each an oracle-gated stage:

1. session funnel conversion (view → purchase within a session),
2. weekly cohort retention (distinct users per first-week × offset),
3. event-type transition counts (the Markov matrix),
4. value-drift PSI between the first and second half of the stream.

Scale shape: 1 and 3 ride the one entity-bucket exchange, 2 is a
combiner min + broadcast + distinct-pair combiner, 4 is zero-shuffle
counting — nothing event-sized ever reaches the driver.

Run: ``PYTHONPATH=. python examples/07_behavioral_analytics.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray.stages.agg import cohort_retention, transition_counts
    from temporalscope_ray.stages.stats import population_stability
    from temporalscope_ray.stages.window_features import session_conversion

    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(1, 40, n),
        "ts": pd.Timestamp("2024-05-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 21 * 86400, n)), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase"], n, p=[0.6, 0.3, 0.1]),
        # drifting metric: second half of the window runs hotter
        "value": np.concatenate([rng.normal(10, 2, n // 2), rng.normal(13, 2, n - n // 2)]),
    })
    ds = ray.data.from_pandas(df).repartition(4)

    funnel = session_conversion(
        ds, id_col="user_id", time_col="ts", type_col="event_type",
        from_type="view", to_type="purchase", gap=pd.Timedelta("30min"),
        tiebreak=["event_id"],
    ).to_pandas()
    rate = funnel["converted"].mean()
    print(f"sessions: {len(funnel)}, view->purchase conversion rate: {rate:.3f}")

    cohorts = cohort_retention(ds, id_col="user_id", time_col="ts").to_pandas()
    wide = cohorts.pivot_table(index="cohort", columns="period_offset",
                               values="n_users", fill_value=0)
    print("weekly retention matrix (users):")
    print(wide.to_string())

    trans = transition_counts(ds, id_col="user_id", time_col="ts",
                              type_col="event_type", tiebreak=["event_id"]).to_pandas()
    top = trans.sort_values("n", ascending=False).head(5)
    print("top transitions:")
    print(top.to_string(index=False))

    psi = population_stability(ds, "value", "ts")
    print(f"value drift PSI (1st vs 2nd half): {psi['psi'].iloc[0]:.4f} "
          f"(ref n={psi['n_ref'].iloc[0]}, cur n={psi['n_cur'].iloc[0]})")

    assert len(funnel) > 0 and 0 <= rate <= 1
    assert (cohorts[cohorts["period_offset"] == 0]["n_users"] > 0).all()
    assert psi["psi"].iloc[0] > 0.1  # the planted mean shift must register
    print("behavioral analytics pipeline OK")


if __name__ == "__main__":
    main()
