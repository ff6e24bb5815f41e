"""Shape transforms: wide ↔ long. Stateless, embarrassingly parallel —
pure per-batch projections, zero shuffle, zero driver state.

``unpivot`` (melt) is the training-data workhorse: a wide feature
table (one column per feature) becomes the long ``(id, feature,
value)`` form that feature stores and per-feature statistics pipelines
consume. The inverse of ``agg.pivot_counts``'s wide output.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray.data


def unpivot(
    ds: ray.data.Dataset,
    *,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Wide → long: each input row yields ``len(value_cols)`` output
    rows ``(*id_cols, var_name=<col name>, value_name=<col value>)``.

    Equivalent SQL: ``UNION ALL`` of one SELECT per value column (or
    DuckDB ``UNPIVOT``). Implemented per batch in Arrow: id columns are
    index-taken (zero value copies beyond the gather), value columns
    concatenate after a cast to their common promoted type — so int32
    and float64 feature columns can melt together. Output row order
    within a batch is row-major (all variables of row 0, then row 1,
    …) — deterministic, and irrelevant to set-semantic consumers.
    """
    id_cols = list(id_cols)
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("unpivot: value_cols must be non-empty")
    from ..core import _schema

    schema = _schema(ds)
    missing = [c for c in (*id_cols, *value_cols) if c not in schema.names]
    if missing:
        raise ValueError(f"unpivot: columns not in dataset: {missing}")
    # common promoted type for the melted value column
    vtypes = [schema.field(c).type for c in value_cols]
    common = vtypes[0]
    for t in vtypes[1:]:
        if t != common:
            if all(pa.types.is_integer(x) or pa.types.is_floating(x) for x in (t, common)):
                common = pa.float64()
            else:
                raise ValueError(
                    f"unpivot: value columns mix non-numeric types ({vtypes}); "
                    "cast them to a common type first"
                )
    k = len(value_cols)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # row-major interleave: row i emits its k variables consecutively
        take_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        cols = {c: t.column(c).take(take_idx) for c in id_cols}
        names = pa.array(np.tile(np.array(value_cols, dtype=object), n), type=pa.string())
        parts = [t.column(c).cast(common).combine_chunks() for c in value_cols]
        # gather: output slot (i*k + j) = parts[j][i]
        stacked = pa.concat_arrays(
            [p if isinstance(p, pa.Array) else p.combine_chunks() for p in parts]
        )
        gather = pa.array(
            (np.tile(np.arange(k, dtype=np.int64) * n, n)
             + np.repeat(np.arange(n, dtype=np.int64), k))
        )
        values = stacked.take(gather)
        cols[var_name] = names
        cols[value_name] = values
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def explode_list(
    ds: ray.data.Dataset,
    list_col: str,
    *,
    idx_col: str = "idx",
    value_name: str = "value",
    keep_cols: Sequence[str] | None = None,
) -> ray.data.Dataset:
    """UNNEST a ``list<T>`` column WITH ORDINALITY: each input row
    yields one output row per element — ``(*keep_cols,
    idx_col=0-based position, value_name=element)``. Empty and null
    lists yield no rows (SQL UNNEST semantics).

    Pure Arrow per batch: the element buffer comes out via
    ``flatten()`` (no element copies), parents are index-taken with
    repeat counts from the list offsets, positions are one arange
    minus the repeated offsets. Zero shuffle.
    """
    from ..core import _schema

    schema = _schema(ds)
    if list_col not in schema.names:
        raise ValueError(f"explode_list: column '{list_col}' not in dataset")
    if not pa.types.is_list(schema.field(list_col).type) and not pa.types.is_large_list(
        schema.field(list_col).type
    ):
        raise ValueError(
            f"explode_list: column '{list_col}' is {schema.field(list_col).type}, not a list"
        )
    keep = [c for c in (keep_cols if keep_cols is not None else schema.names) if c != list_col]

    def ex(t: pa.Table) -> pa.Table:
        arr = t.column(list_col).combine_chunks()
        lens = arr.value_lengths().to_numpy(zero_copy_only=False)
        lens = np.where(np.isnan(lens.astype(np.float64)), 0, lens).astype(np.int64)
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        # element position within its list: arange over the flat buffer
        # minus each element's list start
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
        flat = arr.flatten()
        take = pa.array(parent)
        cols = {c: t.column(c).take(take) for c in keep}
        cols[idx_col] = pa.array(pos)
        cols[value_name] = flat
        return pa.table(cols)

    return ds.map_batches(ex, batch_format="pyarrow", zero_copy_batch=True)
