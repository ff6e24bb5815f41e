"""Audio (RIFF/WAVE PCM16) and video (vid1 frame container) codecs +
actor-pool feature stages over the deterministic synthetic tables."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from temporalscope_ray import codec, synth
from temporalscope_ray.stages import multimodal


def test_wav_roundtrip_and_features():
    sr = 8000
    t = np.arange(sr) / sr
    wave = 0.5 * np.sin(2 * np.pi * 440 * t)
    buf = codec.encode_wav(wave, sr)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    out, sr2 = codec.decode_wav(buf)
    assert sr2 == sr
    assert np.allclose(out, wave, atol=2 / 32767)
    f = codec.audio_features(out, sr)
    assert abs(f["duration_s"] - 1.0) < 1e-9
    assert abs(f["rms_energy"] - 0.5 / np.sqrt(2)) < 1e-3
    # a pure 440 Hz tone crosses zero ~2*440 times/sec and centroids at ~440 Hz
    assert abs(f["zero_crossings"] - 880) <= 2
    assert abs(f["spectral_centroid_hz"] - 440) < 15


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        codec.decode_wav(b"not audio at all")


def test_video_roundtrip_and_sampling():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (20, 16, 16)).astype(np.uint8)
    buf = codec.encode_video(frames, 10.0)
    out, fps = codec.decode_video(buf)
    assert fps == 10.0 and (out == frames).all()
    s = codec.sample_frames(out, 5)
    assert (s == frames[[0, 4, 8, 12, 16]]).all()


def test_audio_stage_real_decode_matches_generator():
    """The synthetic generator's target IS the tone frequency; the real
    decode stage must recover it via the spectral centroid."""
    ds = synth.generate_audio_table(24, num_entities=4, num_blocks=3)
    out = multimodal.add_audio_features(ds, concurrency=1).to_pandas()
    assert len(out) == 24
    err = np.abs(out["spectral_centroid_hz"].to_numpy() - out["target"].to_numpy())
    assert err.max() < 25, err.max()
    # deterministic regardless of parallelism
    out2 = multimodal.add_audio_features(
        synth.generate_audio_table(24, num_entities=4, num_blocks=7), concurrency=1
    ).to_pandas()
    a = out.sort_values("clip_id").reset_index(drop=True)
    b = out2.sort_values("clip_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_audio_stage_strict_and_stub_paths():
    df = pd.DataFrame([{"clip_id": 1, "bytes": b"abc"}, {"clip_id": 2, "bytes": b"def"}])
    with pytest.raises(Exception, match="not available in this environment"):
        multimodal.add_audio_features(ray.data.from_pandas(df), concurrency=1).to_pandas()
    lax = multimodal.add_audio_features(ray.data.from_pandas(df), strict=False, concurrency=1).to_pandas()
    assert lax["rms_energy"].isna().all()
    stub = multimodal.add_audio_features(ray.data.from_pandas(df), mode="stub", concurrency=1).to_pandas()
    assert {"rms_energy", "zero_crossings"} <= set(stub.columns)
    # legacy alias still honored
    with pytest.raises(Exception, match="not available in this environment"):
        multimodal.add_audio_features(ray.data.from_pandas(df), fake=False, concurrency=1).to_pandas()


def test_video_stage_motion_tracks_generator():
    """motion_energy must rank clips by the generator's step speed."""
    ds = synth.generate_video_table(16, num_entities=4, num_blocks=2)
    out = multimodal.add_video_features(ds, sample_k=8, concurrency=1).to_pandas()
    assert len(out) == 16
    assert (out["n_frames"] == 16).all()
    by_speed = out.groupby("motion")["motion_energy"].mean()
    assert by_speed.is_monotonic_increasing, by_speed
    with pytest.raises(Exception, match="requires ffmpeg"):
        bad = pd.DataFrame([{"video_id": "x", "bytes": b"mp4garbage"}])
        multimodal.add_video_features(ray.data.from_pandas(bad), concurrency=1).to_pandas()


def test_hamming_to_previous_exact_distances(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.multimodal import hamming_to_previous

    ts = pd.date_range("2024-01-01", periods=6, freq="h")
    # user 1: 0b0000 -> 0b0111 (3 bits) -> 0b0110 (1 bit); user 2: single
    # image (null); user 3: identical consecutive hashes (0 bits, flagged)
    df = pd.DataFrame({
        "id": [1, 1, 1, 2, 3, 3],
        "ts": [ts[0], ts[1], ts[2], ts[0], ts[0], ts[1]],
        "h": np.array([0, 7, 6, 123, -1, -1], dtype=np.int64),
    })
    out = hamming_to_previous(
        ray.data.from_pandas(df).repartition(3),
        id_col="id", time_col="ts", hash_col="h", flag_threshold=2,
    ).to_pandas().sort_values(["id", "ts"]).reset_index(drop=True)
    assert out["hamming_prev"].tolist() == [pd.NA, 3, 1, pd.NA, pd.NA, 0]
    assert out["is_near_prev"].tolist() == [pd.NA, False, True, pd.NA, pd.NA, True]


def test_caption_image_gate_rules(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from temporalscope_ray.stages.multimodal import caption_image_gate

    df = pd.DataFrame({
        "image_id": range(7),
        "w": [128, 32, 128, 400, 128, 128, 128],
        "h": [128, 128, 40, 100, 128, 128, 128],
        "caption": [
            "a clean caption with words",   # keep
            "ignored small",                # size (w)
            "ignored short",                # size (h)
            "wide aspect ratio image",      # aspect (4.0)
            "word",                         # tokens (1 < 2)
            "!!! ??? ***",                  # alnum (0 ratio)
            None,                           # tokens (null -> 0)
        ],
    })
    out = caption_image_gate(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(out["keep"]) == [1, 0, 0, 0, 0, 0, 0]
    assert out["drop_reason"].iloc[0] is pd.NA or pd.isna(out["drop_reason"].iloc[0])
    assert list(out["drop_reason"].iloc[1:]) == [
        "size", "size", "aspect", "tokens", "alnum", "tokens"]
    # precedence: a row failing size AND tokens reports size
    both = pd.DataFrame({"image_id": [0], "w": [10], "h": [10], "caption": ["x"]})
    r = caption_image_gate(ray.data.from_pandas(both)).to_pandas()
    assert r["drop_reason"].iloc[0] == "size"
    # token cap: 51 tokens fails
    many = pd.DataFrame({"image_id": [0], "w": [128], "h": [128],
                         "caption": [" ".join(["tok"] * 51)]})
    r2 = caption_image_gate(ray.data.from_pandas(many)).to_pandas()
    assert r2["drop_reason"].iloc[0] == "tokens" and r2["keep"].iloc[0] == 0


def test_decode_features_batched_bitexact_vs_per_image():
    """The round-4 batched feature kernel (shape-grouped stacks) must be
    BIT-equal to the per-image reference on every output — including the
    batched mean-hash fast path (8-divisible dims) and the per-image
    fallback (odd dims), across all three codecs."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray import codec
    from temporalscope_ray.stages.multimodal import DecodeImageFeatures

    rng = np.random.default_rng(5)
    rows = []
    for i in range(120):
        w, h = [(32, 32), (40, 24), (17, 13)][i % 3]
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        fmt = ["raw", "png", "qnt6"][i % 3]
        data = codec.encode_image(px, fmt)
        dec = codec.decode_image(data, w, h, fmt)
        rows.append({"bytes": data, "w": w, "h": h, "fmt": fmt,
                     "phash": codec.phash64(dec)})
    batch = pd.DataFrame(rows)

    n = len(batch)
    bright = np.full(n, np.nan)
    contrast = np.full(n, np.nan)
    edge = np.full(n, np.nan)
    ph = np.zeros(n, bool)
    for i, (buf, w, h, fmt, p) in enumerate(zip(
            batch["bytes"], batch["w"], batch["h"], batch["fmt"], batch["phash"])):
        px = codec.decode_image(buf, int(w), int(h), fmt)
        f = px.astype(np.float64)
        bright[i] = f.mean()
        contrast[i] = f.std()
        gray = f.mean(axis=2)
        edge[i] = np.abs(np.diff(gray, axis=1)).mean() + np.abs(np.diff(gray, axis=0)).mean()
        ph[i] = codec.phash64(px) == int(p) or fmt in codec.LOSSY_FMTS

    out = DecodeImageFeatures()(batch)
    assert np.array_equal(bright, out["brightness"].to_numpy())
    assert np.array_equal(contrast, out["contrast"].to_numpy())
    assert np.array_equal(edge, out["edge_energy"].to_numpy())
    assert np.array_equal(ph, out["phash_check"].to_numpy())
    assert out["phash_check"].all()  # decode invariant holds end-to-end
