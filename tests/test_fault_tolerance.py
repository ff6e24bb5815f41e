"""Fault-tolerance evidence for the north rule's fixed-cluster story:
a worker process dying mid-pipeline is absorbed by Ray's task retry
(the block is recomputed on another worker) and the pipeline completes
with EXACTLY the rows an undisturbed run produces.

The kill is deterministic-but-once: the first task to observe an
unclaimed flag file claims it atomically (os.O_EXCL) and SIGKILLs its
own worker process — a real process death, not an exception, so the
retry path exercised is the object-loss/worker-failure one, not
application error handling.

The resumable sink's crash story (driver death mid-job) is covered
separately in test_pipelines.py::test_job_entrypoint_writes_and_resumes
and test_lineage_validator.py — this file is about WORKER loss inside
a live streaming plan.
"""

import os  # noqa: F401  (used by nested killer closures)

import numpy as np
import pandas as pd
import ray.data


def _make_killer(flag_path: str):
    """A self-contained kill-once closure. Everything is captured by
    VALUE (cloudpickle) — a module-level helper would pickle by
    reference to this test module, which a FRESHLY RESTARTED worker
    (spawned after the kill, during lineage reconstruction) cannot
    import."""

    def kill_once() -> None:
        import os as _os
        import signal as _sig

        try:
            fd = _os.open(flag_path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            _os.close(fd)
        except FileExistsError:
            return
        _os.kill(_os.getpid(), _sig.SIGKILL)  # real worker death

    return kill_once


def test_worker_death_mid_map_is_retried(ray_session, tmp_path):
    flag = str(tmp_path / "killed.flag")
    df = pd.DataFrame({
        "user_id": np.repeat(np.arange(40), 50),
        "ts": pd.date_range("2024-01-01", periods=2000, freq="min"),
        "value": np.arange(2000, dtype=np.float64),
    })

    killer = _make_killer(flag)

    def transform(b: pd.DataFrame) -> pd.DataFrame:
        killer()
        out = b.copy()
        out["doubled"] = out["value"] * 2
        return out

    out = (
        ray.data.from_pandas(df).repartition(8)
        .map_batches(transform, batch_format="pandas")
        .to_pandas()
    )
    assert os.path.exists(flag)  # the kill actually fired
    out = out.sort_values("value").reset_index(drop=True)
    assert len(out) == 2000
    assert (out["doubled"].to_numpy() == out["value"].to_numpy() * 2).all()


def test_worker_death_mid_feature_exchange_is_retried(ray_session, tmp_path):
    """Kill a worker inside the entity-bucket feature pass (the
    engine's canonical exchange) and assert the result is row-identical
    to an undisturbed run — retries must not duplicate or drop bucket
    groups."""
    from temporalscope_ray.stages.window_features import add_temporal_features

    flag = str(tmp_path / "killed_fx.flag")
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, 3000),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.sort(rng.integers(0, 10**9, 3000)), unit="us"),
        "value": rng.normal(size=3000),
        "event_id": np.arange(3000),
    })
    kw = dict(id_col="user_id", time_col="ts", value_cols=["value"],
              lags=[1], rolling_windows=[3], num_buckets=6, tiebreak=["event_id"])

    killer = _make_killer(flag)

    def chaos(b: pd.DataFrame) -> pd.DataFrame:
        killer()
        return b

    src = ray.data.from_pandas(df).repartition(6).map_batches(chaos, batch_format="pandas")
    # total_rows=None -> the bucketed exchange path (the one that must
    # survive worker loss); chaos rides upstream of the shuffle
    got = add_temporal_features(src, **kw).to_pandas()
    want = add_temporal_features(ray.data.from_pandas(df).repartition(6), **kw).to_pandas()
    assert os.path.exists(flag)
    key = ["user_id", "ts", "event_id"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
