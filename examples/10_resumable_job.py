"""Tutorial 10 — Resumable, lineage-tracked feature jobs (the
``ray job submit`` story).

The north-rule operational contract: a feature job over an
image+caption table runs via ``ray job submit`` on a fixed-size
cluster, writes one parquet partition per key-hash bucket, and every
partition carries a lineage record — row count, byte size, time
watermark, order-insensitive checksum, wall seconds, and (with the
fragment-aware read) the exact input fragment ids + row ranges that
produced it. Re-submitting the SAME command after a mid-run failure
skips completed partitions BEFORE the shuffle, so the re-run's
exchange moves only unfinished data.

This tutorial drives that flow in-process (the CLI shape is
``python -m temporalscope_ray.job --pipeline image-table
--input <parquet> --output <dir>``):

1. synthesize an image+caption table (deterministic, no external data),
2. run the job fresh — all partitions written, lineage recorded,
3. simulate a partial failure by deleting some partitions' outputs
   AND their lineage records (a crash between data rename and record
   publish can leave neither: the writer publishes data FIRST, record
   AFTER, so a record always implies its data),
4. re-run — only the missing partitions are recomputed,
5. validate the manifest (every record's file exists, row counts add
   up) and inspect one lineage record.

Run: ``PYTHONPATH=. python examples/10_resumable_job.py``
"""

import glob
import json
import os
import shutil
import tempfile


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from temporalscope_ray import synth
    from temporalscope_ray.job import run_job
    from temporalscope_ray.state import lineage as lin

    tmp = tempfile.mkdtemp(prefix="tsray_ex10_")
    src = os.path.join(tmp, "imgs")
    out = os.path.join(tmp, "features")
    synth.materialize_image_table(src, 400, num_entities=16, seed=11, num_blocks=4)

    # 1-2. fresh run
    s1 = run_job(src, out, num_buckets=8)
    print(f"fresh run: wrote {s1['buckets_written']} partitions, "
          f"{s1['rows_written']} rows in {s1['wall_secs']}s")

    # 3. simulate losing two partitions (data + record)
    lost = sorted(glob.glob(os.path.join(out, "bucket=*")))[:2]
    for d in lost:
        bucket = os.path.basename(d).split("=")[1]
        shutil.rmtree(d)
        os.remove(os.path.join(out, "_lineage", f"bucket-{bucket}.json"))
    print(f"simulated failure: deleted {len(lost)} partitions")

    # 4. resume — only the lost partitions recompute
    s2 = run_job(src, out, num_buckets=8)
    print(f"resume: re-wrote {s2['buckets_written']} partitions, "
          f"skipped {s2['buckets_skipped']} completed ones")
    assert s2["buckets_written"] == len(lost)
    assert s2["buckets_skipped"] == s1["buckets_written"] - len(lost)

    # 5. manifest validation + one record
    assert lin.validate_manifest(out)
    total = lin.read_partitioned(out).count()
    assert total == 400, total
    rec = next(iter(lin.completed_buckets(out).values()))
    view = {k: rec[k] for k in ("partition_id", "row_count", "watermark", "checksum")}
    view["input_fragments"] = rec.get("input_fragments", [])[:2]
    print("lineage record:", json.dumps(view, default=str))
    print(f"manifest valid; {total} rows readable across partitions")

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
