"""Deterministic, parallelism-independent synthetic data generators.

Two tables:

1. ``generate_synthetic_time_series`` — the reference's test fixture
   (`/root/reference/src/temporalscope/datasets/synthetic_data_generator.py:164-289`):
   ``time`` (daily datetime or float64 index), ``target``,
   ``feature_1..k`` uniform [0,1), optional null/NaN row injection.
2. ``generate_image_caption_table`` — the graft input (BASELINE.json
   ``input_hint``): ``(image_id, ts, bytes, w, h, fmt, caption, phash,
   target, feature_*)`` with Zipf-skewed entities (hot phash clusters)
   and per-entity strictly-increasing timestamps.

Content is a pure function of ``(seed, row_index)`` via a vectorized
splitmix64 counter hash — the same table materializes at ANY
parallelism level (blocks own disjoint row ranges; no sequential RNG
state). Generation itself is a Ray Dataset pipeline: one task per
block spec, each emitting an Arrow table.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from . import codec
from .core import MODE_SINGLE_TARGET

RANDOM_SEED = 100  # reference synthetic_data_generator.py:43

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK
    return z ^ (z >> np.uint64(31))


def hash_u64(seed: int, stream: int, idx: np.ndarray) -> np.ndarray:
    """Counter-based hash: uniform uint64 per (seed, stream, index)."""
    base = np.uint64((seed * 0x9E3779B97F4A7C15 + stream * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF)
    return _splitmix64(idx.astype(np.uint64) ^ base)


def hash_uniform(seed: int, stream: int, idx: np.ndarray) -> np.ndarray:
    """Uniform [0, 1) float64 per (seed, stream, index)."""
    return hash_u64(seed, stream, idx).astype(np.float64) / 18446744073709551616.0


def _block_specs(num_samples: int, num_blocks: int) -> list[dict]:
    num_blocks = max(1, min(num_blocks, max(1, num_samples)))
    edges = [(num_samples * i) // num_blocks for i in range(num_blocks + 1)]
    return [
        {"start": edges[i], "stop": edges[i + 1]}
        for i in range(num_blocks)
        if edges[i + 1] > edges[i]
    ]


def _validate_synthetic_params(
    num_samples: int, num_features: int, mode: str, null_percentage: float, nan_percentage: float
) -> None:
    # verbatim messages: synthetic_data_generator.py:126-161
    if num_samples < 0 or num_features < 0:
        raise ValueError("`num_samples` and `num_features` must be non-negative.")
    if mode != MODE_SINGLE_TARGET:
        raise ValueError(f"Unsupported mode: {mode}. Only 'single_target' mode is supported.")
    if not 0.0 <= null_percentage <= 1.0:
        raise ValueError("null_percentage must be between 0.0 and 1.0")
    if not 0.0 <= nan_percentage <= 1.0:
        raise ValueError("nan_percentage must be between 0.0 and 1.0")


def generate_synthetic_time_series(
    *,
    num_samples: int = 100,
    num_features: int = 3,
    with_nulls: bool = False,
    with_nans: bool = False,
    null_percentage: float = 0.05,
    nan_percentage: float = 0.05,
    mode: str = MODE_SINGLE_TARGET,
    time_col_numeric: bool = False,
    drop_time: bool = False,
    random_seed: int = RANDOM_SEED,
    num_blocks: int = 8,
) -> ray.data.Dataset:
    """Distributed re-expression of the reference generator (S3).

    Null injection is hash-thresholded per row (row 0 forced when
    enabled, mirroring the reference's "at least one row" guarantee,
    synthetic_data_generator.py:107-112). Nulls take precedence over
    NaNs on the same row (reference ``:64-66``).
    """
    _validate_synthetic_params(num_samples, num_features, mode, null_percentage, nan_percentage)

    feature_cols = [f"feature_{i + 1}" for i in range(num_features)]
    epoch_2023_us = 1672531200000000  # 2023-01-01 in µs

    def gen(batch: pa.Table) -> pa.Table:
        out_tables = []
        for row in batch.to_pylist():
            start, stop = row["start"], row["stop"]
            idx = np.arange(start, stop, dtype=np.int64)
            cols: dict[str, pa.Array] = {}
            if not drop_time:
                if time_col_numeric:
                    cols["time"] = pa.array(idx.astype(np.float64), type=pa.float64())
                else:
                    us = epoch_2023_us + idx * 86_400_000_000  # daily
                    cols["time"] = pa.array(us, type=pa.timestamp("us"))
            cols["target"] = pa.array(hash_uniform(random_seed, 1, idx), type=pa.float64())
            null_u = hash_uniform(random_seed, 2, idx)
            is_null = with_nulls & ((null_u < null_percentage) | (idx == 0))
            nan_u = hash_uniform(random_seed, 3, idx)
            is_nan = with_nans & ((nan_u < nan_percentage) | (idx == 0)) & ~is_null
            for j, name in enumerate(feature_cols):
                vals = hash_uniform(random_seed, 10 + j, idx)
                vals = np.where(is_nan, np.nan, vals)
                cols[name] = pa.array(vals, type=pa.float64(), mask=np.asarray(is_null, dtype=bool))
            out_tables.append(pa.table(cols))
        return pa.concat_tables(out_tables) if out_tables else pa.table({})

    specs = _block_specs(num_samples, num_blocks)
    if not specs:
        # zero-row table with the right schema
        cols: dict[str, pa.Array] = {}
        if not drop_time:
            cols["time"] = pa.array([], type=pa.float64() if time_col_numeric else pa.timestamp("us"))
        cols["target"] = pa.array([], type=pa.float64())
        for name in feature_cols:
            cols[name] = pa.array([], type=pa.float64())
        return ray.data.from_arrow(pa.table(cols))
    return ray.data.from_items(specs).map_batches(gen, batch_format="pyarrow", batch_size=1)


# ---------------------------------------------------------------------------
# image + caption event table (graft input_hint, FIXTURES.md F3)
# ---------------------------------------------------------------------------

def zipf_entity_offsets(num_rows: int, num_entities: int, alpha: float = 1.2) -> np.ndarray:
    """Deterministic Zipf row counts per entity -> prefix offsets (len E+1).

    Entity 0 is the hottest; counts ∝ 1/rank^alpha, normalized to
    ``num_rows`` with largest-remainder rounding. Used both by the
    generator (row -> entity via searchsorted) and by skew tests.
    """
    ranks = np.arange(1, num_entities + 1, dtype=np.float64)
    w = 1.0 / np.power(ranks, alpha)
    w /= w.sum()
    counts = np.floor(w * num_rows).astype(np.int64)
    remainder = num_rows - counts.sum()
    frac = w * num_rows - counts
    order = np.argsort(-frac, kind="stable")
    counts[order[: int(remainder)]] += 1
    offsets = np.zeros(num_entities + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return offsets


def render_pixels(seed: int, row_idx: int, entity: int, size: int) -> np.ndarray:
    """Deterministic RGB image: entity-colored gradient + per-row noise.

    Same-entity images are visually similar (shared phash cluster);
    different rows differ by noise.
    """
    yy, xx = np.mgrid[0:size, 0:size]
    base = hash_u64(seed, 100, np.array([entity], dtype=np.int64))[0]
    r0 = int(base & np.uint64(0xFF))
    g0 = int((base >> np.uint64(8)) & np.uint64(0xFF))
    b0 = int((base >> np.uint64(16)) & np.uint64(0xFF))
    grad = (xx + yy).astype(np.float64) / (2 * size - 2) * 96.0
    pix = np.stack(
        [np.clip(r0 * 0.6 + grad, 0, 255), np.clip(g0 * 0.6 + grad, 0, 255), np.clip(b0 * 0.6 + grad, 0, 255)],
        axis=2,
    )
    n = size * size * 3
    noise_idx = np.arange(n, dtype=np.int64) + row_idx * n
    noise = (hash_u64(seed, 101, noise_idx) & np.uint64(0x7)).astype(np.float64).reshape(size, size, 3)
    return np.clip(pix + noise - 3.5, 0, 255).astype(np.uint8)


def caption_for(entity: int, occurrence: int, seed: int) -> str:
    """Deterministic caption (no Python ``hash`` — that is process-salted)."""
    mix = np.array([(entity << 20) ^ occurrence], dtype=np.int64)
    tok = hash_u64(seed, 102, mix)[0]
    return f"caption of img_{entity:08d} frame {occurrence} tag {int(tok) % 99991:05d}"


IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("ts", pa.timestamp("us")),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("target", pa.float64()),
        ("feature_1", pa.float64()),
        ("feature_2", pa.float64()),
        ("feature_3", pa.float64()),
    ]
)


def generate_image_caption_table(
    num_rows: int,
    num_entities: Optional[int] = None,
    *,
    seed: int = 42,
    img_size: int = 32,
    num_blocks: int = 8,
    alpha: float = 1.2,
    fmts: tuple[str, ...] = codec.ALL_FMTS,
) -> ray.data.Dataset:
    """The graft's input table, synthesized as a Ray Dataset.

    Layout is entity-major: entity row counts follow a Zipf(alpha)
    distribution (hot phash clusters for skew/salting tests); within an
    entity, ``ts`` is strictly increasing at a per-entity cadence. Every
    cell is a pure function of (seed, global row index), so any
    parallelism level yields the identical table.
    """
    if num_entities is None:
        num_entities = max(1, num_rows // 8)
    offsets = zipf_entity_offsets(num_rows, num_entities, alpha)
    epoch_us = 1672531200000000
    fmts = tuple(fmts)

    def gen(batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            start, stop = spec["start"], spec["stop"]
            idx = np.arange(start, stop, dtype=np.int64)
            ent = np.searchsorted(offsets, idx, side="right") - 1
            occ = idx - offsets[ent]
            # per-entity cadence: (1 + entity % 7) minutes
            cadence_us = (1 + (ent % 7)) * 60_000_000
            ts = epoch_us + occ * cadence_us + ent  # +ent keeps global ts near-unique
            image_ids = [f"img_{e:08d}" for e in ent]
            n = len(idx)
            bufs, phashes, caps, fmt_col = [], [], [], []
            for k in range(n):
                pix = render_pixels(seed, int(idx[k]), int(ent[k]), img_size)
                fmt = fmts[int(hash_u64(seed, 103, idx[k : k + 1])[0] % np.uint64(len(fmts)))]
                bufs.append(codec.encode_image(pix, fmt))
                fmt_col.append(fmt)
                phashes.append(codec.phash64(pix))
                caps.append(caption_for(int(ent[k]), int(occ[k]), seed))
            cols = {
                "image_id": pa.array(image_ids, type=pa.string()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "bytes": pa.array(bufs, type=pa.binary()),
                "w": pa.array(np.full(n, img_size, dtype=np.int32)),
                "h": pa.array(np.full(n, img_size, dtype=np.int32)),
                "fmt": pa.array(fmt_col, type=pa.string()),
                "caption": pa.array(caps, type=pa.string()),
                "phash": pa.array(phashes, type=pa.int64()),
                "target": pa.array(hash_uniform(seed, 104, idx), type=pa.float64()),
                "feature_1": pa.array(hash_uniform(seed, 105, idx), type=pa.float64()),
                "feature_2": pa.array(hash_uniform(seed, 106, idx), type=pa.float64()),
                "feature_3": pa.array(hash_uniform(seed, 107, idx), type=pa.float64()),
            }
            tables.append(pa.table(cols, schema=IMAGE_SCHEMA))
        return pa.concat_tables(tables) if tables else IMAGE_SCHEMA.empty_table()

    specs = _block_specs(num_rows, num_blocks)
    if not specs:
        return ray.data.from_arrow(IMAGE_SCHEMA.empty_table())
    return ray.data.from_items(specs).map_batches(gen, batch_format="pyarrow", batch_size=1)


def generate_events_table(
    num_rows: int,
    num_users: Optional[int] = None,
    *,
    seed: int = 42,
    num_blocks: int = 32,
    alpha: float = 1.1,
) -> ray.data.Dataset:
    """Large synthetic events table for compute-dominated benchmarks:
    ``(event_id, ts, user_id, value)``, Zipf-skewed users, per-user
    strictly increasing ts. Same counter-hash determinism as the other
    generators."""
    if num_users is None:
        num_users = max(1, num_rows // 100)
    offsets = zipf_entity_offsets(num_rows, num_users, alpha)
    epoch_us = 1672531200000000

    def gen(batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            start, stop = spec["start"], spec["stop"]
            idx = np.arange(start, stop, dtype=np.int64)
            ent = np.searchsorted(offsets, idx, side="right") - 1
            occ = idx - offsets[ent]
            cadence_us = (30 + (ent % 90)) * 1_000_000
            ts = epoch_us + occ * cadence_us + ent
            tables.append(
                pa.table(
                    {
                        "event_id": pa.array(idx),
                        "ts": pa.array(ts, type=pa.timestamp("us")),
                        "user_id": pa.array(ent),
                        "value": pa.array(hash_uniform(seed, 201, idx), type=pa.float64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    specs = _block_specs(num_rows, num_blocks)
    return ray.data.from_items(specs).map_batches(gen, batch_format="pyarrow", batch_size=1)


def generate_documents_table(
    num_rows: int,
    *,
    seed: int = 23,
    num_blocks: int = 64,
    tokens_per_doc: int = 24,
    vocab_size: int = 4096,
    dup_rate: float = 0.1,
) -> ray.data.Dataset:
    """Large synthetic documents table for dedup scale probes:
    ``(doc_id, text)`` — each doc is ``tokens_per_doc`` vocab words
    drawn by counter-hash (deterministic at any block layout). A
    ``dup_rate`` fraction of docs REPLAYS the token stream of an
    earlier doc with one token mutated, planting near-duplicate pairs
    that MinHash banding must catch — so the probe's shuffle carries a
    realistic duplicate structure, not an all-unique corpus."""
    vocab = np.array([f"w{i:04d}" for i in range(vocab_size)], dtype=object)

    def gen(batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            start, stop = spec["start"], spec["stop"]
            idx = np.arange(start, stop, dtype=np.int64)
            # near-dup planting: doc i with hash<dup_rate replays doc
            # i-1's tokens (same token stream by construction) with
            # token 0 swapped
            is_dup = (hash_uniform(seed, 301, idx) < dup_rate) & (idx > 0)
            base = np.where(is_dup, idx - 1, idx)
            toks = np.empty((len(idx), tokens_per_doc), dtype=object)
            for j in range(tokens_per_doc):
                u = hash_uniform(seed, 310 + j, base)
                toks[:, j] = vocab[(u * vocab_size).astype(np.int64) % vocab_size]
            mut = vocab[(hash_uniform(seed, 399, idx) * vocab_size).astype(np.int64) % vocab_size]
            toks[is_dup, 0] = mut[is_dup]
            text = np.array([" ".join(row) for row in toks], dtype=object)
            tables.append(pa.table({"doc_id": pa.array(idx),
                                    "text": pa.array(text, type=pa.string())}))
        return pa.concat_tables(tables)

    specs = _block_specs(num_rows, num_blocks)
    return ray.data.from_items(specs).map_batches(gen, batch_format="pyarrow", batch_size=1)


def generate_embeddings_table(
    num_rows: int,
    *,
    dim: int = 32,
    seed: int = 29,
    num_blocks: int = 64,
    num_clusters: int = 64,
) -> ray.data.Dataset:
    """Large synthetic embeddings table for ANN scale probes:
    ``(vec_id, embedding fixed_size_list<double, dim>)``. Vectors are
    drawn around ``num_clusters`` counter-hashed cluster centers (so an
    IVF coarse quantizer has real structure to learn) with per-vector
    counter-hash noise — deterministic at any block layout, like every
    generator here."""
    centers_idx = np.arange(num_clusters, dtype=np.int64)
    centers = np.stack([
        hash_uniform(seed, 500 + j, centers_idx) * 4.0 - 2.0 for j in range(dim)
    ], axis=1)  # (num_clusters, dim)

    def gen(batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            start, stop = spec["start"], spec["stop"]
            idx = np.arange(start, stop, dtype=np.int64)
            c = (hash_u64(seed, 499, idx) % np.uint64(num_clusters)).astype(np.int64)
            noise = np.stack([
                hash_uniform(seed, 600 + j, idx) - 0.5 for j in range(dim)
            ], axis=1)
            mat = centers[c] + noise
            emb = pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(mat).ravel(), type=pa.float64()), dim)
            tables.append(pa.table({"vec_id": pa.array(idx), "embedding": emb}))
        return pa.concat_tables(tables)

    specs = _block_specs(num_rows, num_blocks)
    return ray.data.from_items(specs).map_batches(gen, batch_format="pyarrow", batch_size=1)


def materialize_embeddings_table(path: str, num_rows: int, **kwargs) -> str:
    """Cache the XL embeddings table as parquet; returns the path."""
    import os

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    generate_embeddings_table(num_rows, **kwargs).write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def materialize_documents_table(path: str, num_rows: int, **kwargs) -> str:
    """Cache the XL documents table as parquet; returns the path."""
    import os

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    generate_documents_table(num_rows, **kwargs).write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def materialize_events_table(path: str, num_rows: int, **kwargs) -> str:
    """Cache the XL events table as parquet; returns the path."""
    import os

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    generate_events_table(num_rows, **kwargs).write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def materialize_image_table(path: str, num_rows: int, **kwargs) -> str:
    """Write the synthetic image table to parquet (cached fixture for
    tests / bench / queries). Returns the path."""
    import os

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    ds = generate_image_caption_table(num_rows, **kwargs)
    ds.write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def generate_audio_table(
    num_rows: int,
    num_entities: Optional[int] = None,
    *,
    seed: int = 42,
    sample_rate: int = 8000,
    duration_s: float = 0.5,
    num_blocks: int = 8,
) -> ray.data.Dataset:
    """Audio+caption table: ``(clip_id, ts, speaker_id, bytes (WAV
    PCM16), sr, n_samples, caption, target)``. Each clip is a
    deterministic sine mixture (fundamental keyed by the row hash) —
    every cell a pure function of (seed, row index), so any parallelism
    yields the identical table, and the spectral-centroid feature is
    analytically predictable per row."""
    if num_entities is None:
        num_entities = max(1, num_rows // 8)
    n_samp = int(sample_rate * duration_s)
    epoch_us = 1672531200000000

    def gen(batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            start, stop = spec["start"], spec["stop"]
            idx = np.arange(start, stop, dtype=np.int64)
            ent = idx % num_entities
            freq = 100.0 + np.floor(hash_uniform(seed, 301, idx) * 20.0) * 50.0  # 100..1050 Hz
            amp = 0.3 + 0.5 * hash_uniform(seed, 302, idx)
            t = np.arange(n_samp, dtype=np.float64) / sample_rate
            bufs = []
            for j, i in enumerate(idx):
                wave = amp[j] * np.sin(2 * np.pi * freq[j] * t)
                bufs.append(codec.encode_wav(wave, sample_rate))
            tables.append(pa.table({
                "clip_id": pa.array([f"clip_{i:08d}" for i in idx]),
                "ts": pa.array(epoch_us + idx * 1_000_000 + ent, type=pa.timestamp("us")),
                "speaker_id": pa.array(ent),
                "bytes": pa.array(bufs, type=pa.binary()),
                "sr": pa.array(np.full(len(idx), sample_rate, dtype=np.int32)),
                "n_samples": pa.array(np.full(len(idx), n_samp, dtype=np.int32)),
                "caption": pa.array([f"tone {f:.0f}hz clip {i}" for f, i in zip(freq, idx)]),
                "target": pa.array(freq, type=pa.float64()),
            }))
        return pa.concat_tables(tables)

    specs = _block_specs(num_rows, num_blocks)
    return ray.data.from_items(specs).map_batches(gen, batch_format="pyarrow", batch_size=1)


def generate_video_table(
    num_rows: int,
    num_entities: Optional[int] = None,
    *,
    seed: int = 42,
    n_frames: int = 16,
    frame_size: int = 24,
    fps: float = 8.0,
    num_blocks: int = 8,
) -> ray.data.Dataset:
    """Video table: ``(video_id, ts, channel_id, bytes (vid1), n_frames,
    w, h, caption, motion)`` — each clip is a moving bright square whose
    per-frame step size ("motion") is row-keyed, so the decoded
    motion-energy feature is monotonic in the generator's parameter."""
    if num_entities is None:
        num_entities = max(1, num_rows // 8)
    epoch_us = 1672531200000000

    def gen(batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            start, stop = spec["start"], spec["stop"]
            idx = np.arange(start, stop, dtype=np.int64)
            ent = idx % num_entities
            speed = 1 + (hash_u64(seed, 401, idx) % np.uint64(4)).astype(np.int64)  # 1..4 px/frame
            bufs = []
            for j, i in enumerate(idx):
                frames = np.zeros((n_frames, frame_size, frame_size), dtype=np.uint8)
                sq = max(2, frame_size // 6)
                for f in range(n_frames):
                    pos = int((int(speed[j]) * f) % (frame_size - sq))
                    frames[f, pos : pos + sq, pos : pos + sq] = 220
                bufs.append(codec.encode_video(frames, fps))
            tables.append(pa.table({
                "video_id": pa.array([f"vid_{i:08d}" for i in idx]),
                "ts": pa.array(epoch_us + idx * 2_000_000 + ent, type=pa.timestamp("us")),
                "channel_id": pa.array(ent),
                "bytes": pa.array(bufs, type=pa.binary()),
                "n_frames": pa.array(np.full(len(idx), n_frames, dtype=np.int32)),
                "w": pa.array(np.full(len(idx), frame_size, dtype=np.int32)),
                "h": pa.array(np.full(len(idx), frame_size, dtype=np.int32)),
                "caption": pa.array([f"square speed {s} clip {i}" for s, i in zip(speed, idx)]),
                "motion": pa.array(speed.astype(np.float64)),
            }))
        return pa.concat_tables(tables)

    specs = _block_specs(num_rows, num_blocks)
    return ray.data.from_items(specs).map_batches(gen, batch_format="pyarrow", batch_size=1)


def materialize_audio_table(path: str, num_rows: int, **kwargs) -> str:
    """Cache the synthetic audio table as parquet; returns the path."""
    import os

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    generate_audio_table(num_rows, **kwargs).write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def materialize_video_table(path: str, num_rows: int, **kwargs) -> str:
    """Cache the synthetic video table as parquet; returns the path."""
    import os

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    generate_video_table(num_rows, **kwargs).write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path
