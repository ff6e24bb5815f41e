"""multi_asof_join: K-table point-in-time join — every execution path
(all-broadcast pool, one-exchange bucketed, mixed small+large) must be
row-identical to folding pd.merge_asof left-to-right."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray.stages.asof import multi_asof_join


def make_tables(seed=11, n_left=80, entities=(1, 2, 3, 4, 5)):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2023-01-01")

    def mk(n, cols):
        df = pd.DataFrame(
            {
                "user_id": rng.choice(entities, n),
                "ts": [base + pd.Timedelta(minutes=int(m)) for m in rng.integers(0, 10_000, n)],
            }
        )
        for c in cols:
            df[c] = rng.normal(size=n)
        return df.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)

    return mk(n_left, ["lval"]), mk(40, ["state"]), mk(25, ["price"])


def fold_oracle(left, r1, r2, tol1=None, dir2="backward"):
    out = pd.merge_asof(
        left.sort_values("ts"), r1.sort_values("ts"), on="ts", by="user_id",
        direction="backward", tolerance=tol1,
    )
    out = pd.merge_asof(
        out.sort_values("ts"), r2.sort_values("ts"), on="ts", by="user_id", direction=dir2,
    )
    return out


def normalize(df):
    df = df[sorted(df.columns)]
    return df.sort_values(["user_id", "ts"]).reset_index(drop=True)


def run(left, r1, r2, **kw):
    out = multi_asof_join(
        ray.data.from_pandas(left),
        {"st": ray.data.from_pandas(r1), "pr": ray.data.from_pandas(r2)},
        on="ts", by="user_id", **kw,
    ).to_pandas()
    return out


def test_multi_asof_broadcast_matches_fold():
    left, r1, r2 = make_tables()
    out = run(left, r1, r2, broadcast=True)
    pd.testing.assert_frame_equal(normalize(out), normalize(fold_oracle(left, r1, r2)))


def test_multi_asof_bucketed_matches_fold():
    left, r1, r2 = make_tables(seed=12)
    out = run(left, r1, r2, broadcast=False, num_buckets=8)
    pd.testing.assert_frame_equal(normalize(out), normalize(fold_oracle(left, r1, r2)))


def test_multi_asof_mixed_paths_match_fold():
    # r1 (40 rows) above the bound -> bucketed; r2 (25 rows) below -> broadcast
    left, r1, r2 = make_tables(seed=13)
    out = run(left, r1, r2, broadcast_limit_rows=max(len(r2), 30), num_buckets=8)
    assert len(r1) > 30 >= len(r2)
    pd.testing.assert_frame_equal(normalize(out), normalize(fold_oracle(left, r1, r2)))


def test_multi_asof_per_table_tolerance_and_direction():
    left, r1, r2 = make_tables(seed=14)
    tol = pd.Timedelta(minutes=500)
    out = run(
        left, r1, r2, broadcast=True,
        tolerance={"st": tol, "pr": None},
        direction={"st": "backward", "pr": "forward"},
    )
    pd.testing.assert_frame_equal(
        normalize(out), normalize(fold_oracle(left, r1, r2, tol1=tol, dir2="forward"))
    )


def test_multi_asof_collision_gets_table_suffix():
    left, r1, r2 = make_tables(seed=15)
    r2 = r2.rename(columns={"price": "lval"})  # collides with the spine column
    out = run(left, r1, r2, broadcast=True)
    assert "lval_pr" in out.columns
    ref = fold_oracle(left, r1, r2.rename(columns={"lval": "lval_pr"}))
    pd.testing.assert_frame_equal(normalize(out), normalize(ref))


def test_multi_asof_empty_rights_is_identity():
    left, _, _ = make_tables(seed=16)
    out = multi_asof_join(ray.data.from_pandas(left), {}, on="ts", by="user_id").to_pandas()
    pd.testing.assert_frame_equal(normalize(out), normalize(left))


def test_multi_asof_missing_key_raises():
    left, r1, _ = make_tables(seed=17)
    with pytest.raises(ValueError, match="does not exist"):
        multi_asof_join(
            ray.data.from_pandas(left),
            {"st": ray.data.from_pandas(r1.drop(columns=["user_id"]))},
            on="ts", by="user_id",
        )


def test_multi_asof_hot_entity_salting_matches_unsalted():
    # one entity owns ~70% of the spine; salting must keep results
    # row-identical (spine rows salt, every feature table replicates)
    left, r1, r2 = make_tables(seed=19, n_left=200)
    left.loc[left.index % 10 < 7, "user_id"] = 3
    left = left.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    out_plain = run(left, r1, r2, broadcast=False, num_buckets=8)
    out_salted = multi_asof_join(
        ray.data.from_pandas(left),
        {"st": ray.data.from_pandas(r1), "pr": ray.data.from_pandas(r2)},
        on="ts", by="user_id", broadcast=False, num_buckets=8,
        hot_entities=[3], num_salts=4,
    ).to_pandas()
    pd.testing.assert_frame_equal(normalize(out_salted), normalize(out_plain))
    pd.testing.assert_frame_equal(normalize(out_salted), normalize(fold_oracle(left, r1, r2)))
