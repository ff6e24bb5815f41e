"""Distributed global prefix scan + token-budget sequence packing.

A prefix sum over a TOTAL order is the one primitive the bucket
exchange cannot express (it is inherently cross-bucket sequential).
The distributed form is the classic two-pass scan:

1. sort by the (unique) order key and pin the block layout;
2. pass 1 reduces each block to ``(first_key, rows, block_sum)`` —
   O(blocks) bytes to the driver, never O(rows);
3. the driver prefix-sums the per-block sums into per-block OFFSETS
   (broadcast back via ``ray.put``);
4. pass 2 adds ``offset + local cumsum`` inside each block.

Block identity uses the same signature trick as
``shift.shift_column_global`` (first key + row count + checksum); the
order key must be globally UNIQUE (e.g. a primary key, or a
``(ts, event_id)`` pair) — with duplicate keys spanning block
boundaries, block order among the ties would be one valid sort order,
not canonical.

``pack_by_budget`` builds on it: sequential token-budget chunking of a
corpus (chunk = floor(exclusive-prefix-tokens / capacity)) — the
deterministic, SQL-replayable cousin of greedy sequence packing for
LLM pre-training batches. All arithmetic stays int64, so the DuckDB
oracle (window SUM + integer division) matches bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _sig(batch: pa.Table, order_by: Sequence[str], value_col: str) -> str:
    first = tuple(batch.column(c)[0].as_py() for c in order_by)
    v = batch.column(value_col).to_numpy(zero_copy_only=False)
    return repr((first, batch.num_rows, float(np.nansum(v.astype(np.float64)))))


def global_running_sum(
    ds: ray.data.Dataset,
    *,
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "running_sum",
    exclusive: bool = False,
) -> ray.data.Dataset:
    """Running sum of ``value_col`` over the total ``order_by`` order
    (inclusive by default; ``exclusive=True`` gives the sum of strictly
    preceding rows). Integer inputs stay int64 (exact); floats use
    null-skipping cumsum. ``order_by`` must be globally unique."""
    order_by = list(order_by)
    sorted_ds = ds.sort(order_by).materialize()

    def part(batch: pa.Table) -> pa.Table:
        first = batch.select(order_by).slice(0, min(1, batch.num_rows))
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        n = first.num_rows
        first = first.append_column(
            "__sig__", pa.array([_sig(batch, order_by, value_col)] * n, type=pa.string())
        )
        return first.append_column("__sum__", pa.array([float(np.nansum(v))] * n))

    parts = sorted_ds.map_batches(part, batch_size=None, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        # fully empty input (e.g. a filter kept nothing): no non-empty
        # block will ever look up an offset, and the empty frame may be
        # schema-less — skip the sort that would KeyError on it
        offset_by_sig: dict = {}
    else:
        # block order = order of the (typed, unique) first keys
        ordered = parts.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        sums = ordered["__sum__"].to_numpy()
        offsets = np.concatenate(([0.0], np.cumsum(sums)[:-1]))
        offset_by_sig = dict(zip(ordered["__sig__"], offsets))
    ref = ray.put(offset_by_sig)
    is_excl = exclusive

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            vt = batch.schema.field(value_col).type
            ot = pa.int64() if pa.types.is_integer(vt) else pa.float64()
            return batch.append_column(out_col, pa.array([], type=ot))
        off = ray.get(ref)[_sig(batch, order_by, value_col)]
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.integer):
            local = np.cumsum(v.astype(np.int64))
            if is_excl:
                local = local - v.astype(np.int64)
            out = local + np.int64(round(off))
            return batch.append_column(out_col, pa.array(out, type=pa.int64()))
        vf = v.astype(np.float64)
        local = np.nancumsum(vf)
        if is_excl:
            local = local - np.nan_to_num(vf)
        return batch.append_column(out_col, pa.array(local + off, type=pa.float64()))

    return sorted_ds.map_batches(apply, batch_size=None, batch_format="pyarrow")


def with_global_index(
    ds: ray.data.Dataset, *, order_by: Sequence[str], out_col: str = "row_idx"
) -> ray.data.Dataset:
    """0-based global row index over the total ``order_by`` order —
    the same two-pass scan with count partials."""
    tmp = "__one__"
    with_one = ds.map_batches(
        lambda t: t.append_column(tmp, pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = global_running_sum(with_one, order_by=order_by, value_col=tmp,
                             out_col=out_col, exclusive=True)
    return out.drop_columns([tmp])


def pack_by_budget(
    ds: ray.data.Dataset,
    *,
    order_by: Sequence[str],
    token_col: str,
    capacity: int,
    out_col: str = "chunk_id",
) -> ray.data.Dataset:
    """Sequential token-budget chunking: walking the corpus in
    ``order_by`` order, row i goes to chunk
    ``floor(tokens_before_i / capacity)`` — contiguous chunks of
    ~``capacity`` tokens (a document longer than the remaining budget
    spills into the next chunk rather than splitting). int64-exact and
    SQL-replayable; the deterministic baseline for LLM sequence
    packing (a bin-packing optimizer would be a non-associative scan —
    intentionally out of scope)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    summed = global_running_sum(ds, order_by=order_by, value_col=token_col,
                                out_col="__prefix__", exclusive=True)

    def chunk(batch: pa.Table) -> pa.Table:
        p = batch.column("__prefix__").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.drop_columns(["__prefix__"]).append_column(
            out_col, pa.array(p // np.int64(capacity), type=pa.int64())
        )

    return summed.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


def global_running_max(
    ds: ray.data.Dataset,
    *,
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "running_max",
    exclusive: bool = False,
) -> ray.data.Dataset:
    """Running MAX of ``value_col`` over the total ``order_by`` order —
    the watermark primitive (``exclusive=True`` gives the high-water
    mark of strictly preceding rows: null on the first row, the SQL
    ``MAX() OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING)`` frame). Same two-pass block-offset shape as
    ``global_running_sum``: pass 1 reduces each block to its max
    (O(blocks) driver bytes), the driver prefix-maxes the offsets, pass
    2 folds ``maximum(offset, local cummax)`` per block. Integer and
    timestamp inputs stay int64 END-TO-END (never a float64 round-trip
    — above 2^53 that silently corrupts snowflake-style ids; INT64_MIN
    is the internal null sentinel and is rejected as a value); nulls
    never raise the watermark and inherit it.
    """
    import pyarrow.compute as pc

    order_by = list(order_by)
    sorted_ds = ds.sort(order_by).materialize()
    from ..core import _schema

    vt = _schema(sorted_ds).field(value_col).type
    is_int = pa.types.is_integer(vt) or pa.types.is_timestamp(vt)
    INT_MIN = np.iinfo(np.int64).min

    def part(batch: pa.Table) -> pa.Table:
        first = batch.select(order_by).slice(0, min(1, batch.num_rows))
        n = first.num_rows
        sig = pa.array([_sig(batch, order_by, value_col)] * n, type=pa.string())
        first = first.append_column("__sig__", sig)
        if is_int:
            m = pc.max(batch.column(value_col).cast(pa.int64()))
            mx = m.as_py() if m.is_valid else INT_MIN
            if mx == INT_MIN and m.is_valid:
                raise ValueError("global_running_max: INT64_MIN value collides "
                                 "with the null sentinel")
            return first.append_column(
                "__max__", pa.array([mx] * n, type=pa.int64()))
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mx = float(np.nanmax(v)) if n and not np.isnan(v).all() else float("-inf")
        return first.append_column("__max__", pa.array([mx] * n))

    parts = sorted_ds.map_batches(part, batch_size=None, batch_format="pyarrow").to_pandas()
    ordered = parts.sort_values(order_by, kind="mergesort").reset_index(drop=True)
    if is_int:
        maxes = ordered["__max__"].to_numpy(dtype=np.int64)
        offsets = np.concatenate(
            ([INT_MIN], np.maximum.accumulate(maxes)[:-1])).astype(np.int64)
    else:
        maxes = ordered["__max__"].to_numpy(dtype=np.float64)
        offsets = np.concatenate(([-np.inf], np.maximum.accumulate(maxes)[:-1]))
    offset_by_sig = dict(zip(ordered["__sig__"], offsets))
    ref = ray.put(offset_by_sig)
    is_excl = exclusive

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            ot = vt if pa.types.is_timestamp(vt) else (
                pa.int64() if is_int else pa.float64())
            return batch.append_column(out_col, pa.array([], type=ot))
        off = ray.get(ref)[_sig(batch, order_by, value_col)]
        if is_int:
            ci = batch.column(value_col).cast(pa.int64())
            if isinstance(ci, pa.ChunkedArray):
                ci = ci.combine_chunks()
            vals = np.asarray(ci.fill_null(INT_MIN))
            local = np.maximum.accumulate(vals)
            if is_excl:
                local = np.concatenate(([INT_MIN], local[:-1]))
            out = np.maximum(local, np.int64(off))
            isnull = out == INT_MIN
            arr = pc.if_else(pa.array(~isnull), pa.array(out, type=pa.int64()),
                             pa.scalar(None, type=pa.int64()))
            if pa.types.is_timestamp(vt):
                arr = arr.cast(vt)
            return batch.append_column(out_col, arr)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        filled = np.where(np.isnan(v), -np.inf, v)
        local = np.maximum.accumulate(filled)
        if is_excl:
            local = np.concatenate(([-np.inf], local[:-1]))
        out = np.maximum(local, off)
        res = np.where(np.isinf(out), np.nan, out)
        return batch.append_column(out_col, pa.array(res, type=pa.float64()))

    return sorted_ds.map_batches(apply, batch_size=None, batch_format="pyarrow")


def grouped_global_index(
    ds: ray.data.Dataset,
    group_col: str,
    *,
    order_by: Sequence[str],
    out_col: str = "group_idx",
) -> ray.data.Dataset:
    """0-based dense index WITHIN each group over the total
    ``(group, order_by)`` order — SQL ``row_number() OVER (PARTITION BY
    group ORDER BY order_by) - 1`` — without ever co-locating a group:
    the same two-pass block-offset scan as ``with_global_index``, with
    the partials split per (block, group). A group larger than the
    whole cluster's memory is fine because its rows NEVER meet; only
    per-(block, group) counts reach the driver (O(blocks × groups-per-
    block) rows), and the running per-group offsets broadcast back.

    The driver holds one running counter per group — appropriate for
    group vocabularies (aspect buckets, shards, languages), not for
    entity-cardinality keys (use the bucket exchange there).
    ``order_by`` must be globally unique within each group."""
    gorder = [group_col, *order_by]
    sorted_ds = ds.sort(gorder).materialize()
    fcols = [f"__f{i}__" for i in range(len(gorder))]

    def part(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pandas()
        counts = g.groupby(g, sort=False, dropna=False).size()
        n = len(counts)
        first = tuple(batch.column(c)[0].as_py() for c in gorder) if batch.num_rows else ()
        sig = repr((first, batch.num_rows))
        cols = {
            group_col: pa.array(counts.index.to_numpy(),
                                type=batch.schema.field(group_col).type),
            "__cnt__": pa.array(counts.to_numpy(np.int64)),
            "__sig__": pa.array([sig] * n, type=pa.string()),
        }
        # typed block-first keys: the driver orders BLOCKS by these
        for f, c in zip(fcols, gorder):
            cols[f] = batch.column(c).slice(0, 1).take(
                pa.array(np.zeros(n, dtype=np.int64))) if n else batch.column(c).slice(0, 0)
        return pa.table(cols)

    parts = sorted_ds.map_batches(part, batch_size=None, batch_format="pyarrow").to_pandas()
    # canonical block order = typed first-key order (unique order key ⇒
    # distinct block firsts); within that order accumulate one running
    # counter per group
    parts = parts.sort_values(fcols, kind="mergesort").reset_index(drop=True)
    offsets: dict = {}
    running: dict = {}
    for sig, grp, cnt in zip(parts["__sig__"], parts[group_col], parts["__cnt__"]):
        offsets[(sig, grp)] = running.get(grp, 0)
        running[grp] = offsets[(sig, grp)] + int(cnt)
    ref = ray.put(offsets)

    def apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], type=pa.int64()))
        first = tuple(batch.column(c)[0].as_py() for c in gorder)
        sig = repr((first, batch.num_rows))
        table = ray.get(ref)
        g = batch.column(group_col).to_pandas()
        local = g.groupby(g, sort=False, dropna=False).cumcount().to_numpy(np.int64)
        m = {grp: table.get((sig, grp), 0) for grp in pd.unique(g)}
        off = g.map(m).to_numpy(np.int64)
        return batch.append_column(out_col, pa.array(local + off, type=pa.int64()))

    return sorted_ds.map_batches(apply, batch_size=None, batch_format="pyarrow")
