"""End-to-end pipeline tests: flagship parity, image pipeline invariants
(PSNR >= 40 dB / exact decode + caption equality — the north-rule
per-row payload contract), payload attach semantics, dataset loader."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray import codec, synth
from temporalscope_ray.pipelines.flagship import image_pipeline_over, temporal_feature_pipeline
from temporalscope_ray.sources import AVAILABLE_DATASETS, DatasetLoader
from temporalscope_ray.stages.payload import attach_features_broadcast

SF = "/root/testdata/sf0.001"


def test_flagship_pipeline_schema_and_leakage():
    out = temporal_feature_pipeline(SF, num_buckets=8).to_pandas()
    assert len(out) > 0
    expected = {"event_id", "ts", "user_id", "value", "o_totalprice", "value_lag_1", "value_lag_2",
                "value_roll_mean_4", "value_roll_sum_4", "session_id", "value_shift_1"}
    assert expected <= set(out.columns)
    # zero leakage: the label is the NEXT value per user; rolling uses only the past
    g = out.sort_values(["user_id", "ts"]).groupby("user_id")
    lead = g["value"].shift(-1)
    # within the pipeline output, value_shift_1 == next row's value where next row exists
    chk = out.sort_values(["user_id", "ts"]).assign(lead=lead).dropna(subset=["lead"])
    assert np.allclose(chk["value_shift_1"], chk["lead"])


def test_image_pipeline_payload_invariants(tmp_path):
    path = str(tmp_path / "imgs")
    synth.materialize_image_table(path, 120, num_entities=10, seed=42, num_blocks=4)
    out = image_pipeline_over(path, num_buckets=4, concurrency=2).to_pandas()
    src = ray.data.read_parquet(path).to_pandas().set_index(["image_id", "ts"])
    assert len(out) == 120
    for _, row in out.head(40).iterrows():
        orig = src.loc[(row["image_id"], row["ts"])]
        # caption EXACT equality through the whole pipeline
        assert row["caption"] == orig["caption"]
        # payload decodes; lossless exact vs stored bytes, lossy >= 40 dB
        mine = codec.decode_image(row["bytes"], int(row["w"]), int(row["h"]), row["fmt"])
        ref = codec.decode_image(orig["bytes"], int(orig["w"]), int(orig["h"]), orig["fmt"])
        p = codec.psnr(ref, mine)
        assert p == float("inf") if row["fmt"] in codec.LOSSLESS_FMTS else p >= 40.0
        assert bool(row["phash_check"])
    # temporal features present and zero-leakage per entity
    assert {"target_lag_1", "target_roll_mean_4", "session_id", "brightness"} <= set(out.columns)
    first_rows = out.sort_values(["image_id", "ts"]).groupby("image_id").head(1)
    assert first_rows["target_lag_1"].isna().all()  # no past → no lag


def test_attach_features_broadcast_inner_semantics():
    df = pd.DataFrame({"k": [1, 2, 3], "ts": [1.0, 2.0, 3.0], "payload": ["a", "b", "c"], "v": [1.0, 2.0, 3.0]})

    def feature_fn(narrow):
        # drop k==2, add a doubled column
        return narrow.map_batches(
            lambda b: b[b["k"] != 2].assign(v2=lambda d: d["v"] * 2), batch_format="pandas"
        )

    out = attach_features_broadcast(
        ray.data.from_pandas(df), feature_fn, keys=["k", "ts"], narrow_cols=["k", "ts", "v"], concurrency=1
    ).to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 3]  # inner merge drops the filtered row
    assert out["v2"].tolist() == [2.0, 6.0]
    assert out["payload"].tolist() == ["a", "c"]  # payload rode along


def test_dataset_loader_macrodata():
    ds, target = DatasetLoader("macrodata").load_data()
    assert target == "realgdp"
    df = ds.to_pandas()
    assert len(df) == 203
    assert "ds" in df.columns and "realgdp" in df.columns
    with pytest.raises(ValueError, match="not supported"):
        DatasetLoader("nope")
    assert "macrodata" in AVAILABLE_DATASETS


def test_flagship_feature_vectors_allclose_vs_rematerialized_reference():
    """North-rule gate: the feature vector at every entity×timestamp must
    match (allclose) a single-process pandas rematerialization of the
    same semantics — as-of state, lags, trailing rolling stats, session
    ids, and the zero-leakage label."""
    out = temporal_feature_pipeline(SF, num_buckets=8).to_pandas()
    out = out.sort_values(["user_id", "ts"]).reset_index(drop=True)

    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    state = (orders.groupby(["o_custkey", "o_orderdate"], as_index=False)["o_totalprice"].max()
             .rename(columns={"o_custkey": "user_id", "o_orderdate": "ts"}))
    ref = pd.merge_asof(ev.sort_values("ts"), state.sort_values("ts"), on="ts", by="user_id")
    ref = ref.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
    g = ref.groupby("user_id", sort=False)
    ref["value_lag_1"] = g["value"].shift(1)
    ref["value_lag_2"] = g["value"].shift(2)
    roll = g["value"].rolling(4, min_periods=1)
    ref["value_roll_mean_4"] = roll.mean().reset_index(level=0, drop=True)
    ref["value_roll_sum_4"] = roll.sum().reset_index(level=0, drop=True)
    brk = (ref["ts"].diff() > pd.Timedelta("30min")) & (ref["user_id"] == ref["user_id"].shift(1))
    ref["session_id"] = brk.astype("int64").groupby(ref["user_id"], sort=False).cumsum()
    ref["value_shift_1"] = g["value"].shift(-1)
    ref = ref[~ref["value_shift_1"].isna()].sort_values(["user_id", "ts"]).reset_index(drop=True)

    assert len(out) == len(ref)
    feature_cols = ["value", "o_totalprice", "value_lag_1", "value_lag_2",
                    "value_roll_mean_4", "value_roll_sum_4", "session_id", "value_shift_1"]
    for c in feature_cols:
        a = out[c].to_numpy(dtype=float)
        b = ref[c].to_numpy(dtype=float)
        assert np.allclose(a, b, rtol=1e-9, equal_nan=True), c


def test_partitioned_attach_matches_broadcast(tmp_path):
    """The co-partitioned feature attach (100 TB path) must produce
    exactly the broadcast path's rows — same keys, same feature values."""
    path = str(tmp_path / "imgtbl")
    synth.materialize_image_table(path, 150, num_entities=12, seed=7, num_blocks=4)
    a = image_pipeline_over(path, num_buckets=4, concurrency=2, with_decode=False,
                            attach="broadcast").to_pandas()
    b = image_pipeline_over(path, num_buckets=4, concurrency=2, with_decode=False,
                            attach="partitioned", feature_dir=str(tmp_path / "feats")).to_pandas()
    cols = sorted(c for c in a.columns if c != "bytes")
    a2 = a[cols].sort_values(["image_id", "ts"]).reset_index(drop=True)
    b2 = b[cols].sort_values(["image_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a2, b2)
    assert (a["bytes"].map(len).sum()) == (b["bytes"].map(len).sum())


def test_partitioned_attach_resumes_from_lineage(tmp_path):
    """A second run over the same feature_dir must skip all completed
    feature buckets (lineage resume) and still produce full output."""
    from temporalscope_ray.state import lineage

    path = str(tmp_path / "imgtbl")
    synth.materialize_image_table(path, 100, num_entities=8, seed=9, num_blocks=2)
    fdir = str(tmp_path / "feats")
    out1 = image_pipeline_over(path, num_buckets=4, concurrency=2, with_decode=False,
                               attach="partitioned", feature_dir=fdir).to_pandas()
    done = lineage.completed_buckets(fdir)
    assert len(done) > 0
    out2 = image_pipeline_over(path, num_buckets=4, concurrency=2, with_decode=False,
                               attach="partitioned", feature_dir=fdir).to_pandas()
    assert len(out1) == len(out2)


def test_partitioned_attach_schema_stable_when_bucket_has_no_features(tmp_path):
    """A payload batch whose rows all hash to a bucket with NO feature
    partition file must still emit blocks carrying the full feature
    schema (regression: keys-only fallback produced heterogeneous
    blocks that break downstream schema unification)."""
    import ray
    from temporalscope_ray.stages.payload import attach_features_partitioned
    from temporalscope_ray.stages import grouped

    n = 60
    df = pd.DataFrame({
        "image_id": np.arange(n, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
        "score": np.linspace(0.0, 1.0, n),
        "bytes": [b"x" * 32] * n,
    })
    num_buckets = 4
    buckets = grouped.hash_key_column(df["image_id"], num_buckets)
    # feature_fn drops EVERY row of one present bucket -> no partition
    # file is written for it
    victim = int(pd.Series(buckets).mode()[0])

    def feature_fn(narrow):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            keep = grouped.hash_key_column(b["image_id"], num_buckets) != victim
            out = b[keep].copy()
            out["feat"] = out["score"] * 2.0
            return out
        return narrow.map_batches(f, batch_format="pandas")

    out = attach_features_partitioned(
        ray.data.from_pandas(df), feature_fn,
        keys=["image_id"], narrow_cols=["image_id", "score"],
        feature_dir=str(tmp_path / "feats"), num_buckets=num_buckets,
        concurrency=2, narrow_blocks=2,
    )
    got = out.to_pandas()  # schema unification across blocks must not fail
    assert "feat" in got.columns
    # inner-join semantics: the victim bucket's rows drop
    assert set(got["image_id"]) == {i for i, b in zip(df["image_id"], buckets) if b != victim}
    assert np.allclose(got["feat"], got["score"] * 2.0)


def test_curate_image_corpus_on_synth_table(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from temporalscope_ray import synth
    from temporalscope_ray.pipelines.curation import curate_image_corpus

    path = synth.materialize_image_table(str(tmp_path / "imgtbl"), 300,
                                         num_entities=30)
    # the synth table's image_id is the ENTITY key of its (id, ts)
    # series (30 entities x 10 stamps); curation wants one unique id
    # per image, so key on (entity, timestamp)
    def uniq(b):
        b = b.copy()
        b["image_id"] = b["image_id"] + "@" + b["ts"].astype("int64").astype(str)
        return b.drop(columns=["ts"])

    images = ray.data.read_parquet(path).map_batches(uniq, batch_format="pandas")
    out = curate_image_corpus(
        images, num_buckets=4, concurrency=2,
        gate_kwargs={"min_side": 8, "max_tokens": 400},
    ).to_pandas()
    # survivors exist; triplets well-formed
    assert 0 < len(out) <= 300
    assert (out["neg_idx"] != out["idx"]).all()
    assert set(out.columns) >= {"image_id", "caption", "idx", "neg_idx",
                                "neg_image_id", "neg_caption"}
    # the dense index is a 0..n-1 permutation and negatives resolve in-corpus
    n = len(out)
    assert sorted(out["idx"]) == list(range(n))
    assert out["neg_idx"].between(0, n - 1).all()
    # negative payloads are consistent: neg_caption is the caption of neg_image_id
    cap = out.set_index("idx")["caption"]
    assert (out["neg_caption"].to_numpy() == cap.loc[out["neg_idx"]].to_numpy()).all()
    # phash dedup actually dropped near-dups (synth table plants them)
    assert n < 300


def test_flagship_size_adaptive_asof_path(ray_session):
    # the dimension side is compacted DISTRIBUTED and asof_join's size
    # adaptivity picks the path: broadcast while the compacted side fits
    # the bound, bucketed sort-merge when it exceeds it — identical rows
    # either way (the scale-safety contract for the headline pipeline)
    import pandas as pd

    from temporalscope_ray.pipelines.flagship import temporal_feature_pipeline

    sf = "/root/testdata/sf0.001"
    bc = temporal_feature_pipeline(sf).materialize()
    assert "_BroadcastAsof" in bc.stats()

    bkt = temporal_feature_pipeline(sf, asof_broadcast_limit_rows=0).materialize()
    assert "_BroadcastAsof" not in bkt.stats()

    a = bc.to_pandas()
    b = bkt.to_pandas()
    key = sorted(a.columns)
    a = a[key].sort_values(key).reset_index(drop=True)
    b = b[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_attach_auto_size_gates_to_partitioned(tmp_path):
    """attach="auto" must pick broadcast under the row bound and the
    partitioned (100 TB) path above it — observable via feature_dir
    materializing only on the partitioned path — with identical rows
    either way (round-2 verdict finding #3)."""
    import os

    path = str(tmp_path / "imgtbl")
    synth.materialize_image_table(path, 120, num_entities=10, seed=13, num_blocks=3)

    fdir_small = str(tmp_path / "feats_small")
    a = image_pipeline_over(path, num_buckets=4, concurrency=2, with_decode=False,
                            attach="auto", broadcast_limit_rows=1_000_000,
                            feature_dir=fdir_small).to_pandas()
    assert not os.path.exists(fdir_small)  # broadcast chosen: nothing written

    fdir_big = str(tmp_path / "feats_big")
    b = image_pipeline_over(path, num_buckets=4, concurrency=2, with_decode=False,
                            attach="auto", broadcast_limit_rows=10,
                            feature_dir=fdir_big).to_pandas()
    assert os.path.isdir(fdir_big)  # partitioned chosen above the bound

    cols = sorted(c for c in a.columns if c != "bytes")
    a2 = a[cols].sort_values(["image_id", "ts"]).reset_index(drop=True)
    b2 = b[cols].sort_values(["image_id", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a2, b2)


def test_job_entrypoint_writes_and_resumes(ray_session, tmp_path):
    """`python -m temporalscope_ray.job` contract, driven in-process
    (the Ray session is already owned by the test fixture — main()
    guards its ray.init): a fresh run writes one lineage-tracked
    partition per non-empty bucket; an identical re-submit skips every
    completed partition and writes nothing."""
    import json

    from temporalscope_ray.job import main
    from temporalscope_ray.state.lineage import completed_buckets, read_partitioned

    out = str(tmp_path / "job_out")
    args = ["--pipeline", "flagship", "--sf-dir", SF, "--output", out, "--num-buckets", "8"]
    assert main(args) == 0
    recs = completed_buckets(out)
    assert recs and all("checksum" in r and "row_count" in r for r in recs.values())
    rows_written = sum(r["row_count"] for r in recs.values())
    assert rows_written == len(temporal_feature_pipeline(SF, num_buckets=8).to_pandas())

    # resume: nothing re-written, manifest unchanged
    assert main(args) == 0
    assert completed_buckets(out).keys() == recs.keys()
    assert read_partitioned(out).count() == rows_written


def test_attach_async_features_matches_sync(ray_session, tmp_path):
    """The attach-overlap path (features via one detached parquet-read
    task) must be row-identical to the Dataset-computed feature path —
    same kernel, same sort, different transport."""
    path = str(tmp_path / "imgs")
    synth.materialize_image_table(path, 300, num_entities=12, seed=3, num_blocks=3)

    fast = image_pipeline_over(path, num_buckets=4, concurrency=2,
                               with_decode=False).to_pandas()
    # broadcast_limit_rows below nrows pushes attach to "partitioned",
    # whose features go through the full Dataset path — the sync oracle
    slow = image_pipeline_over(path, num_buckets=4, concurrency=2, with_decode=False,
                               attach="partitioned",
                               feature_dir=str(tmp_path / "fd")).to_pandas()
    key = ["image_id", "ts"]
    cols = sorted(fast.columns)
    assert cols == sorted(slow.columns)
    a = fast[cols].sort_values(key).reset_index(drop=True)
    b = slow[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
