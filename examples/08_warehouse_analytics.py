"""Tutorial 8 — Warehouse analytics, model evaluation & product
metrics (the round-2 additions in one tour).

1. star-schema revenue rollup (TPC-H Q5 shape: three bucketed fact
   exchanges, fixed dims resolved on the driver, exact int64 money),
2. ROC-AUC of a score column at corpus scale (distinct-score combiner
   + one sorted scan — never ranks facts on the driver),
3. exact two-sample KS drift between the stream's time halves,
4. rolling 7-day active users (pair-table combiner, bounded ×7
   replication, exact distinct-count exchange),
5. 3-step strict-order funnel per session (grouped-min chaining).

Run: ``PYTHONPATH=. python examples/08_warehouse_analytics.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray.stages.agg import rolling_active_entities
    from temporalscope_ray.stages.stats import ks_drift, roc_auc
    from temporalscope_ray.stages.window_features import ordered_funnel

    rng = np.random.default_rng(21)
    n = 2000
    y = rng.integers(0, 2, n)
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(1, 50, n),
        "ts": pd.Timestamp("2024-06-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 28 * 86400, n)), unit="s"),
        "event_type": np.where(y == 1, "purchase",
                               rng.choice(["view", "click"], n)),
        # score correlated with the purchase label -> informative AUC
        "value": y * 1.2 + rng.normal(0, 1.0, n),
    })
    ds = ray.data.from_pandas(ev).repartition(4)

    # 1. Q5-shaped star join over the TPC-H test tables
    from temporalscope_ray.pipelines.starjoin import revenue_by_nation

    sf = "/root/testdata/sf0.001"
    rd = lambda t, cols=None: ray.data.read_parquet(f"{sf}/{t}.parquet", columns=cols)  # noqa: E731
    rev = revenue_by_nation(
        rd("lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        rd("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        rd("customer", ["c_custkey", "c_nationkey"]),
        rd("supplier", ["s_suppkey", "s_nationkey"]),
        rd("nation"), rd("region"),
        region_name="ASIA", date_lo="1995-01-01", date_hi="2002-01-01",
    ).to_pandas()
    print("Q5 revenue by nation:\n", rev.to_string(index=False))

    # 2. how predictive is `value` of a purchase?
    lab = ds.map_batches(
        lambda df: pd.DataFrame({"value": df["value"],
                                 "y": (df["event_type"] == "purchase").astype("int64")}),
        batch_format="pandas")
    print("ROC-AUC:", roc_auc(lab, "value", "y").iloc[0].to_dict())

    # 3. did the value distribution drift between the two stream halves?
    print("KS drift:", ks_drift(ds, "value", "ts").iloc[0].to_dict())

    # 4. rolling 7-day active users
    wau = rolling_active_entities(ds, "ts", "user_id", window_days=7,
                                  out_col="wau").to_pandas().sort_values("day")
    print(f"WAU: {len(wau)} days, peak {int(wau['wau'].max())}")

    # 5. view -> click -> purchase funnel per 30-min session
    fun = ordered_funnel(ds, id_col="user_id", time_col="ts",
                         type_col="event_type",
                         steps=["view", "click", "purchase"],
                         gap=pd.Timedelta("30min"),
                         tiebreak=["event_id"]).to_pandas()
    depth = fun["steps_reached"].value_counts().sort_index().to_dict()
    print("funnel depth -> sessions:", depth)


if __name__ == "__main__":
    main()
