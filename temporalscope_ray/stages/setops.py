"""Distinct-set operations between datasets: EXCEPT / INTERSECT.

SQL set semantics (both operands reduced to DISTINCT rows, null-safe
row equality — two all-null rows are equal). The physical plan is the
engine's standard combiner → one-exchange shape:

1. combiner: each block of each side deduplicates locally and tags
   itself (``__side__``), so the exchange moves at most the distinct
   rows of every block, never raw row counts;
2. ONE hash exchange on a whole-row digest — equal rows land in the
   same bucket regardless of which side or block they came from;
3. per-bucket final: a vectorized pandas merge-indicator pass emits
   rows present only-left (EXCEPT) or both (INTERSECT).

Skew note: the bucket key is a 64-bit row digest, so buckets are
uniform by construction — set ops cannot hot-spot the way a
natural-key groupby can.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .grouped import BUCKET_COL, DEFAULT_NUM_BUCKETS

_SIDE = "__side__"


def _set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    op: str,
    num_buckets: int,
) -> ray.data.Dataset:
    from ..core import _schema

    ls, rs = _schema(left), _schema(right)
    if ls.names != rs.names or any(ls.field(c).type != rs.field(c).type for c in ls.names):
        raise ValueError(
            f"{op}: operand schemas must match exactly ({ls.names} vs {rs.names})"
        )
    cols = list(ls.names)

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            # Arrow-backed dtypes: a plain to_pandas would give an
            # int64 column float64 dtype in blocks that contain a null
            # and int64 in blocks that don't — the same logical row
            # would then hash to different buckets. ArrowDtype keeps
            # one dtype everywhere (and is null-safe for big ints).
            df = t.to_pandas(types_mapper=pd.ArrowDtype).drop_duplicates()
            h = pd.util.hash_pandas_object(df, index=False).to_numpy()
            out = pa.Table.from_pandas(df, schema=ls, preserve_index=False)
            out = out.append_column(_SIDE, pa.array(np.full(len(df), side, dtype=np.int8)))
            bucket = (h % np.uint64(num_buckets)).astype(np.int32)
            return out.append_column(BUCKET_COL, pa.array(bucket))

        return fn

    lt = left.map_batches(prep(0), batch_format="pyarrow")
    rt = right.map_batches(prep(1), batch_format="pyarrow")

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        body = t.drop_columns([_SIDE, BUCKET_COL])
        lf = body.filter(pa.array(side == 0)).to_pandas(types_mapper=pd.ArrowDtype).drop_duplicates()
        rf = body.filter(pa.array(side == 1)).to_pandas(types_mapper=pd.ArrowDtype).drop_duplicates()
        merged = lf.merge(rf, on=cols, how="left", indicator=True, sort=False)
        if op == "except":
            out = merged[merged["_merge"] == "left_only"].drop(columns=["_merge"])
        else:
            out = merged[merged["_merge"] == "both"].drop(columns=["_merge"])
        return pa.Table.from_pandas(out, schema=ls, preserve_index=False)

    return lt.union(rt).groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def except_distinct(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """SQL ``left EXCEPT right``: distinct left rows absent from right.

    pandas merge treats NaN keys as equal, which here is exactly SQL's
    set-operation null handling (EXCEPT/INTERSECT use null-safe row
    equality, unlike join predicates)."""
    return _set_op(left, right, "except", num_buckets)


def intersect_distinct(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """SQL ``left INTERSECT right``: distinct rows present on both sides."""
    return _set_op(left, right, "intersect", num_buckets)
