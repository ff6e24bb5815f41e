"""Size-aware parquet reads.

Ray Data's auto read parallelism targets ``~2 x num_cpus`` output
blocks regardless of input size; for a small table (a dimension file,
an sf0.1 fact table) that yields tens of KB-sized blocks, and every
downstream sort-based exchange (groupby / sort / map_groups) then
pays an ``O(blocks^2)`` partial-block matrix of scheduling + transfer
overhead that dwarfs the actual data movement (measured: a 150k-row
groupby-Max at 64 blocks costs ~5 s of pure exchange overhead; at 4
blocks it is sub-second).

``sized_read_parquet`` overrides the block count ONLY when the input
is small enough that Ray's auto choice over-splits: blocks are sized
to ``target_block_bytes`` of on-disk parquet (compressed; in-memory
is typically 3-5x larger, still far below the 128 MiB default target
block size). Inputs larger than ``2 x num_cpus x target`` keep Ray's
auto behavior untouched — at 100 TB this helper is a no-op and the
streaming executor's own sizing governs.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import ray
import ray.data

DEFAULT_TARGET_BLOCK_BYTES = 8 << 20  # 8 MiB parquet ~= 24-40 MiB in memory


def _path_bytes(path: str) -> int:
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith((".parquet", ".pq")):
                    total += os.path.getsize(os.path.join(root, f))
        return total
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        return 8


def sized_read_parquet(
    path: str | Sequence[str],
    *,
    columns: Optional[Sequence[str]] = None,
    target_block_bytes: int = DEFAULT_TARGET_BLOCK_BYTES,
    min_blocks: int = 16,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with an input-size-aware block count.

    Small inputs (< ``2 x cpus x target_block_bytes`` on disk) get
    ``override_num_blocks = ceil(bytes / target_block_bytes)`` so
    downstream exchanges see a handful of meaty blocks instead of
    ``2 x cpus`` splinters; large inputs pass through untouched.

    ``min_blocks`` floors the override (default 16, clamped to the CPU
    count): Ray's sort-based exchange produces roughly one output
    partition per input block, so a 1-block read would serialize every
    downstream ``map_groups`` — keep a handful of blocks so bucketed
    stages still fan out. Pass ``min_blocks=1`` for dimension tables
    that never feed an exchange.
    """
    paths = [path] if isinstance(path, str) else list(path)
    if "override_num_blocks" not in kwargs:
        total = sum(_path_bytes(p) for p in paths)
        cpus = _cluster_cpus()
        if 0 < total < 2 * cpus * target_block_bytes:
            blocks = max(min(min_blocks, cpus), -(-total // target_block_bytes))
            kwargs["override_num_blocks"] = int(blocks)
    if columns is not None:
        kwargs["columns"] = list(columns)
    return ray.data.read_parquet(path, **kwargs)


def read_table_auto(
    path: str,
    *,
    columns: Optional[Sequence[str]] = None,
    time_col: Optional[str] = None,
    format: Optional[str] = None,
) -> "ray.data.Dataset":
    """Format-dispatched table source: Parquet (via the size-aware
    reader), CSV, and JSON-lines from one entry point — the connector
    surface a pipeline needs when upstream feeds aren't columnar yet.

    Parquet keeps column pruning at the read. CSV/JSONL cannot prune
    columns at the scan (row-oriented formats), so ``columns`` becomes
    a projection immediately after; they also carry no timestamp type,
    so when ``time_col`` is given the reference's 3-step parse cascade
    (direct cast → string parse → epoch numeric) normalizes it to
    ``timestamp[us]`` right behind the read. Extension decides the
    format unless ``format`` is passed explicitly."""
    fmt = format
    if fmt is None:
        low = path.lower()
        if low.endswith((".parquet", ".pq")) or os.path.isdir(path):
            fmt = "parquet"
        elif low.endswith(".csv"):
            fmt = "csv"
        elif low.endswith((".json", ".jsonl", ".ndjson")):
            fmt = "json"
        else:
            raise ValueError(f"read_table_auto: cannot infer format of '{path}'")
    if fmt == "parquet":
        ds = sized_read_parquet(path, columns=list(columns) if columns else None)
    elif fmt == "csv":
        ds = ray.data.read_csv(path)
        if columns:
            ds = ds.select_columns(list(columns))
    elif fmt == "json":
        ds = ray.data.read_json(path)
        if columns:
            ds = ds.select_columns(list(columns))
    else:
        raise ValueError(f"read_table_auto: unsupported format '{fmt}'")
    if time_col is not None:
        from ..core import convert_column_to_datetime_type

        ds = convert_column_to_datetime_type(ds, time_col)
    return ds
