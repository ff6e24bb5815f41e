"""Per-partition lineage + checkpoint/resume (north rule §checkpointing).

Output layout (resumable, one directory per hash bucket of the
partition key):

    out_dir/
      bucket=0003/part-0.parquet          (written to *.tmp, then renamed)
      _lineage/bucket-0003.json           (written AFTER the data rename)
      _lineage/...

A lineage record carries ``partition_id, key, num_buckets, row_count,
byte_size, watermark (max time value fully processed), checksum
(order-insensitive row hash), wall_secs`` — the fields the north rule
names (input fragments are the bucket's key-hash domain; with
parquet-fragment inputs, add the fragment list to ``extra``).

Resume protocol: completed bucket ids are read from ``_lineage/``
BEFORE scheduling; their rows are dropped at the map stage (a
vectorized filter on the bucket column), so the re-run's shuffle moves
ONLY unfinished data — the job resumes mid-shuffle without
recomputing or re-writing completed partitions.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..stages import grouped


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_buckets(out_dir: str) -> dict[int, dict]:
    """Read the manifest: bucket_id -> lineage record."""
    d = _lineage_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if name.startswith("bucket-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[int(rec["partition_id"])] = rec
    return out


def run_partitioned(
    ds: ray.data.Dataset,
    *,
    key: str,
    out_dir: str,
    num_buckets: int = grouped.DEFAULT_NUM_BUCKETS,
    transform: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None,
    time_col: Optional[str] = None,
) -> dict:
    """Execute ``transform`` per entity-complete bucket and write each
    bucket's output as its own parquet partition with a lineage record.
    Already-completed buckets are skipped (their input rows are dropped
    before the shuffle). Returns a run summary.
    """
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    done = completed_buckets(out_dir)
    done_ids = np.array(sorted(done.keys()), dtype=np.int32)

    bucketed = grouped.with_bucket(ds, key, num_buckets)
    if len(done_ids):
        def drop_done(t: pa.Table) -> pa.Table:
            mask = ~np.isin(t.column(grouped.BUCKET_COL).to_numpy(zero_copy_only=False), done_ids)
            return t.filter(pa.array(mask))

        bucketed = bucketed.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)

    from ..sources.fragments import FRAGMENT_COL, ROW_START_COL

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        bucket_id = int(g[grouped.BUCKET_COL].iloc[0])
        g = g.drop(columns=[grouped.BUCKET_COL])
        # input provenance: when the read was fragment-aware
        # (sources.fragments.read_parquet_fragments), record which
        # fragments + row ranges fed this partition, then drop the
        # lineage columns from the written output
        input_fragments = None
        if FRAGMENT_COL in g.columns:
            spans = g.groupby(FRAGMENT_COL)[ROW_START_COL].agg(["min", "max", "count"])
            input_fragments = [
                {"fragment_id": int(fid), "row_min": int(r["min"]), "row_max": int(r["max"]),
                 "rows_used": int(r["count"])}
                for fid, r in spans.iterrows()
            ]
            g = g.drop(columns=[FRAGMENT_COL, ROW_START_COL])
        if transform is not None:
            g = transform(g)
        part_dir = os.path.join(out_dir, f"bucket={bucket_id:04d}")
        os.makedirs(part_dir, exist_ok=True)
        final = os.path.join(part_dir, "part-0.parquet")
        tmp = final + ".tmp"
        table = pa.Table.from_pandas(g, preserve_index=False)
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic publish
        checksum = int(pd.util.hash_pandas_object(g, index=False).to_numpy().sum(dtype=np.uint64)) & 0x7FFFFFFFFFFFFFFF
        rec = {
            "partition_id": bucket_id,
            "key": key,
            "num_buckets": num_buckets,
            "row_count": int(len(g)),
            "byte_size": int(table.nbytes),
            "watermark": (str(g[time_col].max()) if time_col and len(g) else None),
            "checksum": checksum,
            "wall_secs": round(time.perf_counter() - t0, 4),
            "output": final,
        }
        if input_fragments is not None:
            rec["input_fragments"] = input_fragments
        lineage_tmp = os.path.join(_lineage_dir(out_dir), f"bucket-{bucket_id:04d}.json.tmp")
        lineage_final = lineage_tmp[: -len(".tmp")]
        with open(lineage_tmp, "w") as f:
            json.dump(rec, f)
        os.replace(lineage_tmp, lineage_final)
        return pd.DataFrame([{k: v for k, v in rec.items() if k in ("partition_id", "row_count", "wall_secs")}])

    ran = (
        bucketed.groupby(grouped.BUCKET_COL)
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    return {
        "out_dir": out_dir,
        "buckets_written": int(len(ran)),
        "buckets_skipped": int(len(done)),
        "rows_written": int(ran["row_count"].sum()) if len(ran) else 0,
    }


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back a partitioned output (only published partitions)."""
    recs = completed_buckets(out_dir)
    paths = [r["output"] for r in recs.values()]
    return ray.data.read_parquet(paths)


def validate_manifest(out_dir: str) -> bool:
    """Re-hash every published partition against its lineage checksum."""
    for rec in completed_buckets(out_dir).values():
        g = pq.read_table(rec["output"]).to_pandas()
        checksum = int(pd.util.hash_pandas_object(g, index=False).to_numpy().sum(dtype=np.uint64)) & 0x7FFFFFFFFFFFFFFF
        if checksum != rec["checksum"] or len(g) != rec["row_count"]:
            return False
    return True
