"""``ray job submit`` entrypoint (north rule: "run via ray job submit
on a fixed-size multi-node Ray cluster").

On a real cluster::

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python -m temporalscope_ray.job \
           --pipeline flagship --sf-dir s3://bucket/sfN \
           --output s3://bucket/features_run1 --num-buckets 512

The job driver connects to the CLUSTER Ray (``RAY_ADDRESS`` is set by
the job supervisor; locally it falls back to ``address="local"``), runs
the named pipeline, and sinks the result through the resumable
partitioned writer (`state.lineage.run_partitioned`) — one parquet
partition + lineage record per key bucket, so re-submitting the SAME
command after a mid-run failure skips completed partitions and the
re-run's shuffle moves only unfinished data.

Prints one JSON metrics line (rows, partitions written/skipped, wall
seconds) to stdout — the line ``ray job logs`` surfaces.

This module is the ONLY library-adjacent code that may call
``ray.init`` (guarded): it is a script entrypoint, not part of the
importable engine surface (the driver contract in ``__ray_entry__``
never routes here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


PIPELINES = ("flagship", "image")


def build_pipeline(name: str, sf_dir: str, num_buckets: int, concurrency: int):
    from .pipelines.flagship import image_pipeline_over, image_table_for, temporal_feature_pipeline

    if name == "flagship":
        return temporal_feature_pipeline(sf_dir, num_buckets=num_buckets, concurrency=concurrency), "user_id"
    if name == "image":
        return (
            image_pipeline_over(
                image_table_for(sf_dir), num_buckets=num_buckets, concurrency=concurrency
            ),
            "image_id",
        )
    raise SystemExit(f"unknown --pipeline {name!r}; choose from {PIPELINES}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m temporalscope_ray.job")
    ap.add_argument("--pipeline", choices=PIPELINES, default="flagship")
    ap.add_argument("--sf-dir", required=True, help="input table directory (parquet)")
    ap.add_argument("--output", required=True, help="partitioned output directory")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=8)
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # under `ray job submit` the supervisor exports RAY_ADDRESS and
        # this attaches to the cluster; standalone it stays local
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .state.lineage import run_partitioned

    t0 = time.perf_counter()
    ds, key = build_pipeline(args.pipeline, args.sf_dir, args.num_buckets, args.concurrency)
    summary = run_partitioned(ds, key=key, out_dir=args.output, num_buckets=args.num_buckets)
    summary["pipeline"] = args.pipeline
    summary["wall_secs"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(summary))
    if owns_session:  # never tear down a caller-owned session (tests)
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
