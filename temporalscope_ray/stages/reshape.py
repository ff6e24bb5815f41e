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
