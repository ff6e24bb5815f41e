"""Multimodal (image/audio/video) stages: decode, feature-extract,
resize, frame-sample.

Payloads are opaque ``binary`` columns with typed metadata
(``w, h, fmt`` — the graft ``input_hint`` schema). Every stage is an
actor-pool ``map_batches`` class — codec state initialized once per
actor, small batches (binary payloads are wide; a 256-row batch of
1 MB images is ~256 MB, so default ``batch_size`` here is small and the
object store handles spill).

The sandbox has no PIL/ffmpeg; formats outside this repo's numpy+zlib
codecs (`temporalscope_ray.codec`: raw/PNG/qnt6 images, RIFF/WAVE
PCM16 audio, vid1 frame-packed video) raise ``NotImplementedError``
with a clear message — the Ray-side plumbing (schemas, actor
signatures, batch sizing, output layout) is real and tested either
way. ``AudioFeaturesStub`` remains as the deterministic fallback for
codec-blocked payloads.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .. import codec
from .grouped import clamp_concurrency

DEFAULT_IMAGE_BATCH = 256


class DecodeImageFeatures:
    """Decode each image and emit numeric features:
    ``brightness, contrast, edge_energy, phash_check`` (+ passthrough).

    Unknown ``fmt`` values raise ``NotImplementedError`` (no real image
    libraries in this environment) unless ``strict=False``, in which
    case the row's features are null.
    """

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        bright = np.full(n, np.nan)
        contrast = np.full(n, np.nan)
        edge = np.full(n, np.nan)
        ph_ok = np.zeros(n, dtype=bool)
        # Pass 1 — decode (irreducibly per-row: png/qnt6 are one zlib
        # stream per image), grouping rows by pixel shape.
        by_shape: dict = {}
        for i, (buf, w, h, fmt, ph) in enumerate(
            zip(batch["bytes"], batch["w"], batch["h"], batch["fmt"], batch["phash"])
        ):
            try:
                px = codec.decode_image(buf, int(w), int(h), fmt)
            except ValueError:
                if self.strict:
                    raise NotImplementedError(
                        f"image format '{fmt}' needs a real decoder (PIL/libvips), not available in this environment"
                    )
                continue
            by_shape.setdefault(px.shape, ([], [], [], [])) \
                [0].append(px)
            g = by_shape[px.shape]
            g[1].append(i)
            g[2].append(int(ph))
            g[3].append(fmt in codec.LOSSY_FMTS)
        # Pass 2 — features BATCHED per shape group: per-image numpy
        # calls on 32×32 arrays cost more in dispatch than in compute
        # (~64 µs/img features + ~55 µs/img phash, vs ~6+10 µs batched —
        # measured; decode is ~63 µs and unchanged). Reductions keep the
        # identical per-image element order (trailing-axis means over
        # the same contiguous elements), so every value is bit-equal to
        # the per-image path — pinned by test.
        for shape, (pxs, idxs, phs, lossy) in by_shape.items():
            stack = np.stack(pxs)
            ii = np.array(idxs)
            F = stack.astype(np.float64)
            m = F.reshape(len(ii), -1)
            bright[ii] = m.mean(axis=1)
            contrast[ii] = m.std(axis=1)
            gray = F.mean(axis=3)
            edge[ii] = (np.abs(np.diff(gray, axis=2)).reshape(len(ii), -1).mean(axis=1)
                        + np.abs(np.diff(gray, axis=1)).reshape(len(ii), -1).mean(axis=1))
            hh, ww = shape[0], shape[1]
            if hh % 8 == 0 and ww % 8 == 0:
                # batched mean-hash: same cell reduction shape as
                # codec.phash64's divisible fast path
                cells = gray.reshape(len(ii), 8, hh // 8, 8, ww // 8).mean(axis=(2, 4))
                flat = cells.reshape(len(ii), 64)
                bits = flat > np.median(flat, axis=1, keepdims=True)
                vals = np.packbits(bits, axis=1).astype(np.uint64)
                hashes = np.zeros(len(ii), dtype=np.uint64)
                for b in range(8):
                    hashes = (hashes << np.uint64(8)) | vals[:, b]
                ph_ok[ii] = (hashes.view(np.int64) == np.array(phs, dtype=np.int64)) \
                    | np.array(lossy)
            else:
                ph_ok[ii] = np.array(
                    [codec.phash64(px) == p for px, p in zip(pxs, phs)]
                ) | np.array(lossy)
        out = batch.copy()
        out["brightness"] = bright
        out["contrast"] = contrast
        out["edge_energy"] = edge
        out["phash_check"] = ph_ok
        return out


class ResizeImages:
    """Block-mean resize to ``size``×``size``, re-encoded as ``raw``.
    Updates ``bytes, w, h, fmt`` in place (lossy by nature; PSNR
    invariants apply to the decode step, not downsampling)."""

    def __init__(self, size: int):
        self.size = size

    def _resize(self, px: np.ndarray) -> np.ndarray:
        # block-mean via two reduceat passes (rows then cols) — one
        # vectorized kernel instead of an O(size^2) Python loop of
        # per-cell .mean() calls
        h, w, _ = px.shape
        s = self.size
        ys = (np.arange(s + 1) * h) // s
        xs = (np.arange(s + 1) * w) // s
        f = px.astype(np.float64)
        row_sum = np.add.reduceat(f, ys[:-1], axis=0)          # (s, w, 3)
        cell_sum = np.add.reduceat(row_sum, xs[:-1], axis=1)   # (s, s, 3)
        counts = np.diff(ys)[:, None] * np.diff(xs)[None, :]
        return (cell_sum / counts[:, :, None]).round().astype(np.uint8)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        new_bytes, new_wh = [], []
        for buf, w, h, fmt in zip(batch["bytes"], batch["w"], batch["h"], batch["fmt"]):
            px = codec.decode_image(buf, int(w), int(h), fmt)
            small = self._resize(px)
            new_bytes.append(codec.encode_raw(small))
        out = batch.copy()
        out["bytes"] = new_bytes
        out["w"] = np.int32(self.size)
        out["h"] = np.int32(self.size)
        out["fmt"] = "raw"
        return out


class AudioFeatures:
    """REAL audio decode for RIFF/WAVE PCM16 payloads
    (``codec.decode_wav`` — standard container, numpy+struct only):
    emits ``duration_s, rms_energy, zero_crossings,
    spectral_centroid_hz``. Compressed formats (mp3/ogg/flac) need
    external codecs (soundfile/librosa) and raise
    ``NotImplementedError`` (``strict=True``) or null out
    (``strict=False``)."""

    def __init__(self, payload_col: str = "bytes", strict: bool = True):
        self.payload_col = payload_col
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        cols = {"duration_s": np.full(n, np.nan), "rms_energy": np.full(n, np.nan),
                "zero_crossings": np.full(n, -1, dtype=np.int64),
                "spectral_centroid_hz": np.full(n, np.nan)}
        for i, buf in enumerate(batch[self.payload_col]):
            try:
                samples, sr = codec.decode_wav(buf)
            except ValueError:
                if self.strict:
                    raise NotImplementedError(
                        "non-WAV audio decoding requires soundfile/librosa, "
                        "not available in this environment"
                    )
                continue
            f = codec.audio_features(samples, sr)
            for k in cols:
                cols[k][i] = f[k]
        out = batch.copy()
        for k, v in cols.items():
            out[k] = v
        return out


class AudioFeaturesStub:
    """STUB fallback for payloads no in-sandbox codec can parse. Emits
    deterministic pseudo-features (seeded by payload CRC) so pipeline
    plumbing is exercised end-to-end regardless of codec availability."""

    def __init__(self, fake: bool = True, payload_col: str = "bytes"):
        self.fake = fake
        self.payload_col = payload_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "audio decoding requires soundfile/librosa, not available in this environment"
            )
        import zlib

        crcs = np.array([zlib.crc32(b) for b in batch[self.payload_col]], dtype=np.uint64)
        out = batch.copy()
        out["rms_energy"] = (crcs % 1000).astype(np.float64) / 1000.0
        out["zero_crossings"] = (crcs % 97).astype(np.int64)
        return out


class VideoFeatures:
    """REAL video decode for the ``vid1`` frame-packed container
    (``codec.decode_video``): uniform-samples ``sample_k`` frames and
    emits ``n_frames, fps, motion_energy`` (mean |frame diff| over the
    sampled grid — the standard cheap temporal-activity signal) and
    ``mean_brightness``. Real containers (mp4/webm) need ffmpeg and
    raise ``NotImplementedError`` under ``strict=True``."""

    def __init__(self, payload_col: str = "bytes", sample_k: int = 8, strict: bool = True):
        self.payload_col = payload_col
        self.sample_k = sample_k
        self.strict = strict

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        cols = {"n_frames": np.full(n, -1, dtype=np.int64), "fps": np.full(n, np.nan),
                "motion_energy": np.full(n, np.nan), "mean_brightness": np.full(n, np.nan)}
        for i, buf in enumerate(batch[self.payload_col]):
            try:
                frames, fps = codec.decode_video(buf)
            except ValueError:
                if self.strict:
                    raise NotImplementedError(
                        "mp4/webm decoding requires ffmpeg, not available in this environment"
                    )
                continue
            samp = codec.sample_frames(frames, self.sample_k).astype(np.float64)
            cols["n_frames"][i] = len(frames)
            cols["fps"][i] = fps
            cols["mean_brightness"][i] = samp.mean() if len(samp) else np.nan
            cols["motion_energy"][i] = (
                float(np.abs(np.diff(samp, axis=0)).mean()) if len(samp) > 1 else 0.0
            )
        out = batch.copy()
        for k, v in cols.items():
            out[k] = v
        return out


def add_image_features(
    ds: ray.data.Dataset, *, strict: bool = True, concurrency=16, batch_size: int = DEFAULT_IMAGE_BATCH
) -> ray.data.Dataset:
    return ds.map_batches(
        DecodeImageFeatures, batch_format="pandas", batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency), fn_constructor_args=(strict,),
    )


def resize_images(
    ds: ray.data.Dataset, size: int, *, concurrency=16, batch_size: int = DEFAULT_IMAGE_BATCH
) -> ray.data.Dataset:
    return ds.map_batches(
        ResizeImages, batch_format="pandas", batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency), fn_constructor_args=(size,),
    )


def add_audio_features(
    ds: ray.data.Dataset, *, mode: str = "wav", payload_col: str = "bytes", strict: bool = True,
    concurrency=16, batch_size: int = DEFAULT_IMAGE_BATCH,
    fake: Optional[bool] = None,
) -> ray.data.Dataset:
    """``mode="wav"`` — real RIFF/PCM16 decode + spectral features;
    ``mode="stub"`` — deterministic fake for codec-blocked payloads.
    (``fake=True/False`` kept as a back-compat alias for stub/raise.)"""
    if fake is not None:  # legacy alias
        mode = "stub" if fake else "raise"
    if mode == "stub" or mode == "raise":
        return ds.map_batches(
            AudioFeaturesStub, batch_format="pandas", batch_size=batch_size,
            concurrency=clamp_concurrency(concurrency), fn_constructor_args=(mode == "stub", payload_col),
        )
    return ds.map_batches(
        AudioFeatures, batch_format="pandas", batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency), fn_constructor_args=(payload_col, strict),
    )


def add_video_features(
    ds: ray.data.Dataset, *, payload_col: str = "bytes", sample_k: int = 8, strict: bool = True,
    concurrency=16, batch_size: int = 64,
) -> ray.data.Dataset:
    """Frame-sampled video features (vid1 container; small batches —
    video payloads are the widest rows in the table)."""
    return ds.map_batches(
        VideoFeatures, batch_format="pandas", batch_size=batch_size,
        concurrency=clamp_concurrency(concurrency), fn_constructor_args=(payload_col, sample_k, strict),
    )


def hamming_to_previous(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    hash_col: str,
    out_col: str = "hamming_prev",
    flag_threshold: Optional[int] = None,
    flag_col: str = "is_near_prev",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets=None,
) -> ray.data.Dataset:
    """Per-entity temporal perceptual-hash delta: Hamming distance of
    each image's 64-bit hash to the SAME entity's previous image —
    consecutive-frame near-duplicate detection, the streaming cousin of
    ``dedup.phash_dedup`` (that one dedups the whole corpus; this one
    answers "did this camera/user just upload the same shot again?").
    Null on each entity's first image. With ``flag_threshold`` set,
    also emits a boolean near-dup flag (null on firsts).

    One entity-bucket exchange (``grouped.grouped_ordered_map``, same
    hot-entity contract as every windowed op); the distance is a
    vectorized byte-table popcount of ``h ⊕ lag₁(h)`` — uint64 XOR,
    ``_POP8`` lookup over the byte view, no per-row Python. Exact
    integers end to end: the SQL replay is
    ``bit_count(xor(h, lag(h) OVER (PARTITION BY id ORDER BY ts, tb)))``.
    """
    from .dedup import _POP8
    from . import grouped

    order = [time_col, *(tiebreak or [])]
    nb = num_buckets if num_buckets is not None else grouped.DEFAULT_NUM_BUCKETS

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        h = g[hash_col].to_numpy().astype(np.int64).view(np.uint64)
        prev = np.empty_like(h)
        prev[1:] = h[:-1]
        prev[0] = h[0]
        segs = grouped.entity_segments(g[id_col].to_numpy())
        first = np.zeros(len(g), dtype=bool)
        first[segs[:-1]] = True
        x = (h ^ prev).copy()
        d = _POP8[x.view(np.uint8).reshape(len(g), 8)].sum(axis=1).astype(np.int64)
        out[out_col] = pd.array(np.where(first, 0, d), dtype="Int64")
        out.loc[first, out_col] = pd.NA
        if flag_threshold is not None:
            f = pd.array(d <= flag_threshold, dtype="boolean")
            f[first] = pd.NA
            out[flag_col] = f
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=nb)


def caption_image_gate(
    ds: ray.data.Dataset,
    *,
    caption_col: str = "caption",
    w_col: str = "w",
    h_col: str = "h",
    min_side: int = 64,
    max_aspect: float = 3.0,
    min_tokens: int = 2,
    max_tokens: int = 50,
    min_alnum_ratio: float = 0.5,
    keep_col: str = "keep",
    reason_col: str = "drop_reason",
) -> ray.data.Dataset:
    """LAION-style image↔caption curation gate over the north-rule
    table shape ``(image_id, bytes, w, h, fmt, caption, phash)``: flag
    each pair with ``keep`` (int64 0/1) and the FIRST failing rule in
    ``reason_col`` (null when kept), so the drop-reason histogram is
    one groupby away. Rules, in precedence order:

    1. ``size``   — either side below ``min_side`` px
    2. ``aspect`` — max(w,h)/min(w,h) above ``max_aspect``
    3. ``tokens`` — caption whitespace-token count outside
       [``min_tokens``, ``max_tokens``] (null caption counts 0)
    4. ``alnum``  — alphanumeric character share of the caption below
       ``min_alnum_ratio``

    Zero shuffle: one vectorized pandas-str pass (metadata + caption
    only — never decodes bytes); every comparison is int-derived double
    arithmetic shared verbatim with a SQL replay, so the gate decision
    is bit-exact and auditable. Filter afterwards with
    ``ds.filter(expr="keep == 1")`` or keep the flags for reporting.
    """
    def gate(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        w = b[w_col].to_numpy(dtype=np.int64)
        h = b[h_col].to_numpy(dtype=np.int64)
        cap = b[caption_col].fillna("")
        # explicit RE2 \S class for SQL-replay parity on exotic whitespace
        ntok = cap.str.count(r"[^\t\n\f\r ]+").to_numpy(dtype=np.int64)
        nalnum = cap.str.count(r"[a-zA-Z0-9]").to_numpy(dtype=np.int64)
        clen = cap.str.len().to_numpy(dtype=np.int64)
        bad_size = (w < min_side) | (h < min_side)
        with np.errstate(divide="ignore", invalid="ignore"):
            bad_aspect = (np.maximum(w, h).astype(np.float64)
                          / np.minimum(w, h)) > max_aspect
            ratio = nalnum.astype(np.float64) / clen
        bad_tokens = (ntok < min_tokens) | (ntok > max_tokens)
        bad_alnum = ratio < min_alnum_ratio
        reason = np.select(
            [bad_size, bad_aspect, bad_tokens, bad_alnum],
            ["size", "aspect", "tokens", "alnum"],
            default=None,
        )
        out[keep_col] = (reason == np.array(None)).astype(np.int64)
        out[reason_col] = pd.array(reason, dtype="string")
        return out

    return ds.map_batches(gate, batch_format="pandas")


def aspect_bucket_batches(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    batch_size: int = 16,
    ratio_breaks_e3: "Sequence[int]" = (500, 800, 1250, 2000),
    bucket_col: str = "aspect_bucket",
    out_col: str = "batch_idx",
) -> "ray.data.Dataset":
    """Aspect-ratio bucketed batch assignment — the SDXL-style batching
    rule for image training: images group into fixed aspect buckets
    (so a batch resizes to ONE target shape without destructive
    cropping), and within each bucket rows pack into dense
    ``batch_size``-row batches ordered by ``id_col``. The bucket id is
    a searchsorted over INTEGER mille-ratios ``w*1000 // h`` (exact,
    SQL CASE-replayable — no float aspect math to disagree on), and
    the within-bucket dense rank is the grouped two-pass block-offset
    scan: a bucket holding a third of the corpus is never co-located,
    only its per-block counts reach the driver.
    """
    import numpy as np
    import pyarrow as pa

    from .scan import grouped_global_index

    breaks = np.asarray(list(ratio_breaks_e3), dtype=np.int64)

    def tag(t: pa.Table) -> pa.Table:
        w = t.column(w_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column(h_col).to_numpy(zero_copy_only=False).astype(np.int64)
        r = (w * 1000) // h
        b = np.searchsorted(breaks, r, side="right").astype(np.int64)
        return t.append_column(bucket_col, pa.array(b))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    idx = grouped_global_index(tagged, bucket_col, order_by=[id_col], out_col="__gi__")

    def finish(t: pa.Table) -> pa.Table:
        gi = t.column("__gi__").to_numpy(zero_copy_only=False)
        return t.drop_columns(["__gi__"]).append_column(
            out_col, pa.array(gi // np.int64(batch_size), type=pa.int64()))

    return idx.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
