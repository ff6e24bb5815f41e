"""Execution-context tuning for the engine's canonical exchange.

The entity-bucket shuffle (``stages/grouped.py``) is a
``groupby(__bucket__)`` over a small integer key space. Ray's default
sort-based shuffle pays a global sample-sort it doesn't need for that
shape; the hash-shuffle strategy (Ray >= 2.46) streams blocks straight
to hash-partitioned aggregator actors — no global sort barrier, and
measured on the 16M-row flagship exchange it is both faster at width
(50 s vs 59 s at 16 cpus) and dramatically better-scaling
(4→16 cpu efficiency 0.96 vs 0.51, best-of-2 per level).

Ray's defaults assume a large cluster (parallelism 200, up to 64
aggregator actors); on a small node the aggregators' CPU reservations
starve the map tasks (observed: 20 pending CPU requests on a 16-cpu
box, pipeline crawling). ``configure_exchange`` right-sizes both to
the session's CPU budget.

Strategy is sized to EXCHANGE VOLUME, not just CPU count: an actor
pool only pays off when the shuffled bytes amortize its spin-up —
measured at sf0.1 (~100k-row exchanges) hash shuffle was 3-8x SLOWER
per pipeline, while on the 16M-row exchange it was faster and
near-linear. Rule of thumb: enable for exchanges above ~1M rows per
pipeline run; keep Ray's default sort shuffle below that.

Owned by session owners (bench, CLI entry points, tests) — the library
never mutates a DataContext it doesn't own (driver-owned sessions keep
the driver's strategy).
"""

from __future__ import annotations


def _fast_hash_partition(table, *, hash_cols, num_partitions):
    """Vectorized replacement for Ray's ``hash_partition``.

    Ray 2.49's map-side shuffle partitioner hashes ROW BY ROW in pure
    Python (``transform_pyarrow.hash_partition``: ``hash(tuple(...)) ``
    per row) — measured 236 ms per 62.5k-row block, 62 s of CPU on a
    16M-row exchange, ~2x the cost of the actual feature compute it
    feeds. This path hashes whole columns with ``pd.util.hash_array``
    (vectorized cython), orders rows with ONE stable argsort, gathers
    ONCE, and emits zero-copy slices per partition: 4.8 ms per block
    (~50x). Routing only needs to be *consistent* (same key -> same
    partition everywhere), not identical to Python ``hash``; every
    process in the session is patched (driver via
    ``configure_exchange``, workers via ``worker_process_setup_hook``),
    so both sides of any hash exchange agree.

    Fast path covers null-free integer/boolean keys — the engine's
    canonical ``__bucket__`` exchange key is always a null-free int.
    Anything else falls back to Ray's original implementation.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ray.data._internal.arrow_ops.transform_pyarrow import (
        try_combine_chunked_columns,
    )

    def _fallback():
        return _ORIGINAL_HASH_PARTITION(
            table, hash_cols=hash_cols, num_partitions=num_partitions
        )

    if table.num_rows == 0:
        return {}
    if num_partitions == 1:
        return {0: table}
    h = None
    for name in hash_cols:
        col = table.column(name)
        t = col.type
        if not (pa.types.is_integer(t) or pa.types.is_boolean(t)) or col.null_count:
            return _fallback()
        arr = col.combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False
        )
        hv = pd.util.hash_array(arr)
        h = hv if h is None else h * np.uint64(0x9E3779B1) + hv
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    order = np.argsort(part, kind="stable")  # stable: input order kept in-partition
    bounds = np.searchsorted(part[order], np.arange(num_partitions + 1))
    gathered = try_combine_chunked_columns(table).take(order)
    return {
        p: gathered.slice(bounds[p], bounds[p + 1] - bounds[p])
        for p in range(num_partitions)
        if bounds[p + 1] > bounds[p]
    }


_ORIGINAL_HASH_PARTITION = None


def install_fast_hash_partition() -> None:
    """Patch the vectorized partitioner into this process's Ray modules.

    Idempotent. Must run in EVERY process that executes shuffle map
    tasks: call it from the driver (``configure_exchange`` does) and
    pass it as ``runtime_env={"worker_process_setup_hook":
    "temporalscope_ray.tuning.install_fast_hash_partition"}`` at
    ``ray.init`` so task workers are patched too (``_shuffle_block`` is
    a module-level ``@ray.remote`` pickled by reference — a driver-only
    patch would not propagate).
    """
    global _ORIGINAL_HASH_PARTITION
    from ray.data._internal.arrow_ops import transform_pyarrow
    from ray.data._internal.execution.operators import hash_shuffle

    if _ORIGINAL_HASH_PARTITION is None:
        _ORIGINAL_HASH_PARTITION = transform_pyarrow.hash_partition
    transform_pyarrow.hash_partition = _fast_hash_partition
    hash_shuffle.hash_partition = _fast_hash_partition


def configure_exchange(num_cpus: int, ctx=None) -> None:
    """Size the hash-shuffle exchange for a ``num_cpus``-CPU session.

    Call AFTER ``ray.init`` from code that owns the Ray session.
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    install_fast_hash_partition()
    ctx = ctx or DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Partition count 2*cpus measured best on the 16M-row exchange:
    # raising it to 4x/8x cpus (hoping to shorten the post-barrier
    # dispatch tail, whose widest partition is a ~950k-row task) made
    # exec 1.5-2x SLOWER — per-shard submit overhead (blocks x
    # partitions object transfers) outweighs the shorter tail.
    ctx.default_hash_shuffle_parallelism = max(8, num_cpus * 2)
    ctx.max_hash_shuffle_aggregators = max(2, num_cpus // 2)
    # NOTE: halving the per-aggregator CPU reservation (the
    # hash_shuffle_operator_actor_num_cpus_per_partition_override knob)
    # to let concurrent pools coexist was measured WORSE on the 16M-row
    # exchange (20.6 -> 34 s at 16 cpus): the main exchange's
    # aggregation is real work and a starved pool serializes it. Keep
    # single-exchange plans instead (see window_features' pass-1 note).
