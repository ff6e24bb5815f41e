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


def table_diff(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: "str | list[str]",
    cols: "list[str]",
    *,
    atol: float = 0.0,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> pd.DataFrame:
    """Keyed two-table parity report — the operator behind the north
    rule's per-row invariant check ("feature-vector allclose + caption
    equality pass rate") run AT SCALE: diff an engine output against a
    reference output without materializing either.

    Both sides are projected to ``(key, *cols)``, tagged, and co-located
    by ONE key-hash exchange; each bucket outer-merges its two sides and
    reduces to six counters, so the driver folds O(buckets) rows no
    matter the table size. Comparison semantics are SQL
    ``IS NOT DISTINCT FROM``: null == null is a match; float columns
    match within ``atol`` (0.0 = exact — captions/ids want exact,
    decoded feature vectors want an allclose tolerance). ``key`` must be
    unique per side (it's a primary-key diff; duplicate keys raise).

    Returns a 1-row DataFrame ``(n_left, n_right, n_both, n_only_left,
    n_only_right, n_mismatch, pass_rate)`` with ``pass_rate =
    (n_both − n_mismatch) / n_both`` (NaN when nothing overlaps).
    """
    keys = [key] if isinstance(key, str) else list(key)
    proj = [*keys, *cols]
    lt = left.select_columns(proj)
    rt = right.select_columns(proj)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            h = pd.util.hash_pandas_object(
                t.select(keys).to_pandas(), index=False).to_numpy()
            t = t.append_column(_SIDE, pa.array(np.full(t.num_rows, side, dtype=np.int8)))
            bucket = (h % np.uint64(num_buckets)).astype(np.int32)
            return t.append_column(BUCKET_COL, pa.array(bucket))
        return fn

    unioned = lt.map_batches(tag(0), batch_format="pyarrow").union(
        rt.map_batches(tag(1), batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g[_SIDE] == 0].drop(columns=[_SIDE, BUCKET_COL])
        b = g[g[_SIDE] == 1].drop(columns=[_SIDE, BUCKET_COL])
        for side_name, side_df in (("left", a), ("right", b)):
            if side_df.duplicated(subset=keys).any():
                raise ValueError(f"table_diff: duplicate {keys} values on the {side_name} side")
        m = a.merge(b, on=keys, how="outer", suffixes=("__l", "__r"), indicator=True)
        both = m["_merge"] == "both"
        mismatch = np.zeros(len(m), dtype=bool)
        for c in cols:
            x, y = m[f"{c}__l"], m[f"{c}__r"]
            if atol > 0 and pd.api.types.is_float_dtype(x):
                neq = ~(np.isclose(x.astype(np.float64), y.astype(np.float64),
                                   rtol=0.0, atol=atol, equal_nan=True))
            else:
                neq = (~((x.isna() & y.isna()) | (x == y))).to_numpy()
            mismatch |= neq
        return pd.DataFrame([{
            "n_left": int((m["_merge"] != "right_only").sum()),
            "n_right": int((m["_merge"] != "left_only").sum()),
            "n_both": int(both.sum()),
            "n_only_left": int((m["_merge"] == "left_only").sum()),
            "n_only_right": int((m["_merge"] == "right_only").sum()),
            "n_mismatch": int((mismatch & both.to_numpy()).sum()),
        }])

    parts = unioned.groupby(BUCKET_COL).map_groups(
        per_bucket, batch_format="pandas").to_pandas()
    tot = parts.sum()
    n_both, n_mis = int(tot["n_both"]), int(tot["n_mismatch"])
    rate = (n_both - n_mis) / n_both if n_both else float("nan")
    return pd.DataFrame([{
        "n_left": int(tot["n_left"]), "n_right": int(tot["n_right"]),
        "n_both": n_both, "n_only_left": int(tot["n_only_left"]),
        "n_only_right": int(tot["n_only_right"]), "n_mismatch": n_mis,
        "pass_rate": rate,
    }])
