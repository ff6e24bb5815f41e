"""Lineage/checkpoint-resume and DatasetValidator tests."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray.state import lineage
from temporalscope_ray.validator import DatasetValidator


def events_df(n=200, entities=10, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, entities, n),
            "ts": np.arange(n, dtype=np.float64),
            "value": rng.normal(size=n),
        }
    )


def test_run_partitioned_writes_and_resumes(tmp_path):
    out = str(tmp_path / "out")
    df = events_df()
    ds = ray.data.from_pandas(df)

    def feat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        g["value_lag_1"] = g.groupby("user_id")["value"].shift(1)
        return g

    summary = lineage.run_partitioned(ds, key="user_id", out_dir=out, num_buckets=8, transform=feat, time_col="ts")
    assert summary["buckets_skipped"] == 0
    assert summary["rows_written"] == len(df)
    assert lineage.validate_manifest(out)

    # read back: all rows present, feature computed
    back = lineage.read_partitioned(out).to_pandas()
    assert len(back) == len(df)
    assert "value_lag_1" in back.columns

    # resume: everything already done → nothing recomputed
    summary2 = lineage.run_partitioned(ds, key="user_id", out_dir=out, num_buckets=8, transform=feat, time_col="ts")
    assert summary2["buckets_written"] == 0
    assert summary2["buckets_skipped"] == summary["buckets_written"]


def test_run_partitioned_partial_resume(tmp_path):
    out = str(tmp_path / "out")
    df = events_df()
    ds = ray.data.from_pandas(df)
    full = lineage.run_partitioned(ds, key="user_id", out_dir=out, num_buckets=8, time_col="ts")
    total_buckets = full["buckets_written"]
    assert total_buckets > 1

    # simulate a partially-failed run: delete half the lineage records + outputs
    recs = lineage.completed_buckets(out)
    victims = sorted(recs.keys())[: total_buckets // 2]
    for b in victims:
        os.remove(os.path.join(out, "_lineage", f"bucket-{b:04d}.json"))
        shutil.rmtree(os.path.join(out, f"bucket={b:04d}"))

    resumed = lineage.run_partitioned(ds, key="user_id", out_dir=out, num_buckets=8, time_col="ts")
    assert resumed["buckets_written"] == len(victims)
    assert resumed["buckets_skipped"] == total_buckets - len(victims)
    back = lineage.read_partitioned(out).to_pandas()
    assert len(back) == len(df)
    assert lineage.validate_manifest(out)


def test_lineage_records_contents(tmp_path):
    out = str(tmp_path / "out")
    ds = ray.data.from_pandas(events_df(50, entities=3))
    lineage.run_partitioned(ds, key="user_id", out_dir=out, num_buckets=4, time_col="ts")
    recs = lineage.completed_buckets(out)
    rec = next(iter(recs.values()))
    for field in ("partition_id", "key", "num_buckets", "row_count", "byte_size", "watermark", "checksum", "wall_secs", "output"):
        assert field in rec
    assert rec["key"] == "user_id"


def make_valid_ds(n=5000, k=5):
    rng = np.random.default_rng(1)
    data = {"time": np.arange(n, dtype=np.float64), "target": rng.normal(size=n)}
    for i in range(k):
        data[f"feature_{i}"] = rng.normal(size=n)
    return ray.data.from_pandas(pd.DataFrame(data))


def test_validator_all_pass():
    v = DatasetValidator(time_col="time", target_col="target")
    results = v.fit_transform(make_valid_ds())
    assert all(r.passed for r in results.values()), {k: r.message for k, r in results.items() if not r.passed}


def test_validator_sample_size_bounds():
    v = DatasetValidator(time_col="time", target_col="target", min_samples=10, max_samples=20)
    with pytest.warns(UserWarning, match="more than recommended maximum"):
        res = v.fit_transform(make_valid_ds(100))
    assert not res["sample_size"].passed


def test_validator_feature_variability_fails_on_constant():
    n = 5000
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "time": np.arange(n, dtype=np.float64),
            "target": rng.normal(size=n),
            "feature_0": np.ones(n),
            "feature_1": rng.normal(size=n),
            "feature_2": rng.normal(size=n),
            "feature_3": rng.normal(size=n),
        }
    )
    v = DatasetValidator(time_col="time", target_col="target")
    with pytest.warns(UserWarning, match="insufficient variability"):
        res = v.fit_transform(ray.data.from_pandas(df))
    assert not res["feature_variability"].passed
    assert res["feature_variability"].details["feature_0"] == 1


def test_validator_fit_rejects_nulls_and_non_numeric():
    df = pd.DataFrame({"time": [1.0, 2.0], "target": [1.0, None], "feature_0": [1.0, 2.0]})
    v = DatasetValidator(time_col="time", target_col="target")
    with pytest.raises(ValueError, match="Null values found in columns"):
        v.fit(ray.data.from_pandas(df))
    df2 = pd.DataFrame({"time": [1.0], "target": [1.0], "feature_0": ["x"]})
    with pytest.raises(ValueError, match="Column 'feature_0' must be numeric"):
        v.fit(ray.data.from_pandas(df2))


def test_validator_checks_subset():
    v = DatasetValidator(time_col="time", target_col="target", checks_to_run=["sample_size"])
    res = v.fit_transform(make_valid_ds())
    assert set(res.keys()) == {"sample_size"}
    with pytest.raises(ValueError, match="Invalid checks"):
        DatasetValidator(time_col="t", target_col="y", checks_to_run=["bogus"])


def test_job_cli_end_to_end(tmp_path):
    """The ray-job entry: fresh run writes all partitions; rerun skips."""
    from temporalscope_ray import synth
    from temporalscope_ray.job import run_job
    from temporalscope_ray.state import lineage as lin

    src = str(tmp_path / "imgs")
    synth.materialize_image_table(src, 80, num_entities=8, seed=42, num_blocks=2)
    out = str(tmp_path / "features")
    s1 = run_job(src, out, num_buckets=4)
    assert s1["buckets_written"] > 0 and s1["rows_written"] == 80
    s2 = run_job(src, out, num_buckets=4)
    assert s2["buckets_written"] == 0 and s2["buckets_skipped"] == s1["buckets_written"]
    back = lin.read_partitioned(out).to_pandas()
    assert len(back) == 80
    assert {"target_lag_1", "target_roll_mean_4", "session_id", "brightness"} <= set(back.columns)
    assert lin.validate_manifest(out)
    # fragment-aware read end-to-end: every lineage record names its
    # input fragments + row ranges (the north rule's lineage fields),
    # and the provenance columns never reach the written output
    recs = lin.completed_buckets(out)
    assert all(r.get("input_fragments") for r in recs.values())
    frags = {f["fragment_id"] for r in recs.values() for f in r["input_fragments"]}
    assert frags == {0, 1}  # both source fragments accounted for
    assert all(f["rows_used"] >= 1 and f["row_max"] >= f["row_min"]
               for r in recs.values() for f in r["input_fragments"])
    assert "__fragment_id__" not in back.columns and "__row_start__" not in back.columns


def test_read_table_auto_csv_jsonl_roundtrip(tmp_path):
    """CSV and JSONL sources reach the same rows + parsed timestamps as
    the parquet original (source-format parity)."""
    import duckdb

    from temporalscope_ray.sources.reader import read_table_auto

    src = "/root/testdata/sf0.001/events.parquet"
    con = duckdb.connect()
    df = con.execute(
        f"SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id, value "
        f"FROM read_parquet('{src}') LIMIT 500"
    ).df()
    csv_p, jsonl_p = str(tmp_path / "ev.csv"), str(tmp_path / "ev.jsonl")
    df.to_csv(csv_p, index=False)
    df.to_json(jsonl_p, orient="records", lines=True)

    ref = df.copy()
    ref["ts"] = pd.to_datetime(ref["ts"]).astype("datetime64[us]")
    for path in (csv_p, jsonl_p):
        got = read_table_auto(path, time_col="ts").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert got["ts"].dtype == np.dtype("datetime64[us]") or str(got["ts"].dtype).startswith("datetime64[us")
        merged = got.merge(ref, on="event_id", suffixes=("", "_ref"))
        assert len(merged) == 500
        assert (merged["ts"] == merged["ts_ref"]).all()
        assert np.allclose(merged["value"].astype(float),
                           merged["value_ref"].astype(float), equal_nan=True)

    # parquet path keeps column pruning + needs no parsing
    pq = read_table_auto(src, columns=["event_id", "ts"])
    assert set(pq.schema().names) == {"event_id", "ts"}
