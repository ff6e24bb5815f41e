"""Tutorial 9 — Point-in-time behavioral feature store (beyond the
reference).

Builds the leakage-free training table a churn/LTV model consumes,
every stage oracle-gated in ``__ray_entry__``:

1. greedy 6h throttle (stream compaction — survivors re-arm the timer),
2. Markov surprisal over the compacted stream (-ln P(cur | prev)),
3. strict-prior time-since-purchase (the type-conditional recency),
4. point-in-time RFM snapshot at a cutoff (recency/frequency/monetary
   strictly before it),
5. entity-level group k-fold + purged temporal split (no user straddles
   folds; an embargo gap separates train from test).

Scale shape: 1-3 ride the one entity-bucket exchange (facts never
widen), 4 is a combiner with a scan-level time prune, 5 is zero
shuffle. Nothing event-sized ever reaches the driver.

Run: ``PYTHONPATH=. python examples/09_behavioral_feature_store.py``
"""

import numpy as np
import pandas as pd


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    from temporalscope_ray.stages.agg import attach_surprisal, rfm_snapshot
    from temporalscope_ray.stages.sampling import time_split_embargo, with_group_fold
    from temporalscope_ray.stages.window_features import add_time_since_event, throttle

    rng = np.random.default_rng(29)
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(1, 50, n),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 30 * 86400, n)), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase"], n, p=[0.6, 0.3, 0.1]),
        "value": rng.exponential(20.0, n),
    })
    ds = ray.data.from_pandas(df).repartition(4)

    # 1-3: compaction → surprisal → type-conditional recency, one plan
    kept = throttle(ds, "user_id", "ts", min_gap_us=6 * 3_600_000_000,
                    tiebreak=["event_id"])
    feats = attach_surprisal(kept, id_col="user_id", time_col="ts",
                             type_col="event_type", tiebreak=["event_id"])
    feats = add_time_since_event(feats, id_col="user_id", time_col="ts",
                                 type_col="event_type", target_type="purchase",
                                 tiebreak=["event_id"])
    fdf = feats.to_pandas()
    print(f"compacted {n} events -> {len(fdf)} (6h throttle); "
          f"surprisal nulls (entity firsts): {fdf['surprisal'].isna().sum()}")

    # 4: point-in-time RFM at the split cutoff — the features a model
    # scores with AT the boundary, leakage-free by construction
    cutoff = "2024-03-25"
    rfm = rfm_snapshot(ds, id_col="user_id", time_col="ts", cutoff=cutoff,
                       value_col="value", value_filter=("event_type", "purchase"))
    rdf = rfm.to_pandas().sort_values("monetary", ascending=False)
    print("top spenders before cutoff:")
    print(rdf.head(3).to_string(index=False))

    # 5: leakage-safe evaluation plumbing
    folded = with_group_fold(ds, "user_id", k=5)
    split = time_split_embargo(folded, "ts", cutoff=cutoff,
                               embargo_us=2 * 86_400_000_000)
    sdf = split.to_pandas()
    per_fold = sdf.groupby("fold")["user_id"].nunique()
    # entity-level folds: a user appears in exactly one fold
    assert sdf.groupby("user_id")["fold"].nunique().max() == 1
    # the embargo gap is empty
    gap = sdf[(sdf["ts"] >= pd.Timestamp("2024-03-23"))
              & (sdf["ts"] < pd.Timestamp(cutoff))]
    assert len(gap) == 0
    print(f"folds (distinct users): {per_fold.to_dict()}; "
          f"train={len(sdf[sdf['split'] == 'train'])} test={len(sdf[sdf['split'] == 'test'])} "
          f"(embargo purged {n - len(sdf)} rows)")

    assert len(fdf) < n and (fdf["us_since_purchase"].dropna() >= 0).all()
    assert (rdf["n_events"] > 0).all()
    print("behavioral feature store OK")


if __name__ == "__main__":
    main()
