"""End-to-end resumable job — the ``ray job submit`` entry point.

Runs the north-star pipeline (temporal features + decoded image
features over the image+caption table) into a RESUMABLE partitioned
parquet output via `state.lineage.run_partitioned`: one output
partition per entity-hash bucket, each with a lineage record (rows,
bytes, watermark, checksum, wall time, input fragments when the read
is fragment-aware). Re-running after a failure skips completed
partitions before the shuffle.

Usage (driver-less):

    python -m temporalscope_ray.job --input /tmp/imgs --out /tmp/features \
        --num-buckets 64 [--resume-demo]

Owns its Ray session (guarded init, as a CLI must); the library itself
never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_job(input_path: str, out_dir: str, *, num_buckets: int = 32, with_decode: bool = True) -> dict:
    import numpy as np
    import pandas as pd
    import ray.data

    from .stages import grouped
    from .stages.multimodal import DecodeImageFeatures
    from .stages.window_features import _seg_rolling, _seg_session_ids, _seg_shift, _segment_ids
    from .state import lineage

    ds = ray.data.read_parquet(input_path)
    decoder = DecodeImageFeatures(strict=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["image_id", "ts"], kind="mergesort")
        segs = grouped.entity_segments(g["image_id"].to_numpy())
        seg_id = _segment_ids(segs)
        seg_start = np.repeat(segs[:-1], np.diff(segs))
        out = g.copy()
        for col in ("target", "feature_1"):
            v = g[col].to_numpy(dtype=np.float64)
            out[f"{col}_lag_1"] = _seg_shift(v, seg_id, 1)
            s, cnt = _seg_rolling(v, seg_start, 4)
            out[f"{col}_roll_mean_4"] = s / cnt
        out["session_id"] = _seg_session_ids(g["ts"].to_numpy(), segs, pd.Timedelta("10min"))
        if with_decode:
            out = decoder(out)
        return out

    t0 = time.perf_counter()
    summary = lineage.run_partitioned(
        ds, key="image_id", out_dir=out_dir, num_buckets=num_buckets,
        transform=per_bucket, time_col="ts",
    )
    summary["wall_secs"] = round(time.perf_counter() - t0, 3)
    if summary["wall_secs"] > 0 and summary["rows_written"]:
        summary["rows_per_sec"] = round(summary["rows_written"] / summary["wall_secs"], 1)
    return summary


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="image+caption parquet path")
    parser.add_argument("--out", required=True, help="resumable partitioned output dir")
    parser.add_argument("--num-buckets", type=int, default=32)
    parser.add_argument("--num-cpus", type=int, default=None)
    parser.add_argument("--no-decode", action="store_true")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        owns = True
    else:
        owns = False
    try:
        summary = run_job(args.input, args.out, num_buckets=args.num_buckets, with_decode=not args.no_decode)
        print(json.dumps(summary))
    finally:
        if owns:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
