"""End-to-end resumable jobs — the ``ray job submit`` entry point.

Two job shapes, both sinking through the RESUMABLE partitioned writer
(`state.lineage.run_partitioned`: one output partition per key-hash
bucket, each with a lineage record — rows, bytes, watermark, checksum,
wall time, input fragments when the read is fragment-aware; re-running
the SAME command after a mid-run failure skips completed partitions
before the shuffle, so the re-run's exchange moves only unfinished
data):

- ``--pipeline image-table --input <parquet>`` (default): the
  north-star job — temporal features + decoded image features over an
  image+caption table, partitioned by ``image_id``.
- ``--pipeline flagship --sf-dir <dir>``: the events⟕orders flagship
  (as-of join → windowed features → zero-leakage shift), partitioned
  by ``user_id``.

On a real cluster::

    ray job submit --address http://<head>:8265 --working-dir . \
        -- python -m temporalscope_ray.job \
           --pipeline image-table --input s3://bucket/imgs \
           --output s3://bucket/features_run1 --num-buckets 512

The job driver attaches to the CLUSTER Ray (``RAY_ADDRESS`` is set by
the job supervisor; standalone it falls back to a local session).
Prints one JSON metrics line to stdout — the line ``ray job logs``
surfaces. This module is the ONLY library-adjacent code that may call
``ray.init`` (guarded): it is a script entrypoint, not part of the
importable engine surface.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def run_job(input_path: str, out_dir: str, *, num_buckets: int = 32, with_decode: bool = True) -> dict:
    """The image-table job body (callable in-process for tests)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from .sources.fragments import read_parquet_fragments
    from .stages import grouped
    from .stages.multimodal import DecodeImageFeatures
    from .stages.window_features import _seg_rolling, _seg_session_ids, _seg_shift, _segment_ids
    from .state import lineage

    # fragment-aware read: every row carries (fragment id, row offset),
    # so each partition's lineage record names exactly which input
    # fragments + row ranges produced it (the north rule's lineage
    # fields); run_partitioned strips the provenance columns before the
    # transform and the written output
    ds = read_parquet_fragments(input_path)
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


def run_flagship_job(sf_dir: str, out_dir: str, *, num_buckets: int = 64, concurrency: int = 8) -> dict:
    """The flagship job body: the full events⟕orders pipeline Dataset
    sunk through the resumable partitioned writer by ``user_id``."""
    from .pipelines.flagship import temporal_feature_pipeline
    from .state.lineage import run_partitioned

    t0 = time.perf_counter()
    ds = temporal_feature_pipeline(sf_dir, num_buckets=num_buckets, concurrency=concurrency)
    summary = run_partitioned(ds, key="user_id", out_dir=out_dir,
                              num_buckets=num_buckets, time_col="ts")
    summary["wall_secs"] = round(time.perf_counter() - t0, 3)
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m temporalscope_ray.job", description=__doc__)
    ap.add_argument("--pipeline", choices=("image-table", "flagship"), default="image-table")
    ap.add_argument("--input", help="image+caption parquet path (image-table job)")
    ap.add_argument("--sf-dir", help="testdata table directory (flagship job)")
    ap.add_argument("--output", "--out", dest="output", required=True,
                    help="resumable partitioned output dir")
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--no-decode", action="store_true")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # under `ray job submit` the supervisor exports RAY_ADDRESS and
        # this attaches to the cluster; standalone it stays local
        kwargs = dict(address=os.environ.get("RAY_ADDRESS", "local"),
                      include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    try:
        if args.pipeline == "image-table":
            if not args.input:
                ap.error("--pipeline image-table requires --input")
            summary = run_job(args.input, args.output, num_buckets=args.num_buckets,
                              with_decode=not args.no_decode)
        else:
            if not args.sf_dir:
                ap.error("--pipeline flagship requires --sf-dir")
            summary = run_flagship_job(args.sf_dir, args.output,
                                       num_buckets=args.num_buckets,
                                       concurrency=args.concurrency)
        summary["pipeline"] = args.pipeline
        print(json.dumps(summary))
    finally:
        if owns_session:  # never tear down a caller-owned session (tests)
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
