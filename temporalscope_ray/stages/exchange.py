"""Schema-aligned tagged union — the shared building block for
bucketed two-sided operators (semi/anti join, range join, as-of).

Ray's ``union`` requires identical schemas; a bucketed two-sided
operator wants both sides flowing through ONE ``groupby(bucket)``
exchange. ``pad_union`` aligns the schemas by padding each side with
the other's missing columns as TYPED nulls (types taken from the
source schemas, so no untyped-null inference) and tags rows with
``__side__`` (0 = left, 1 = right). Downstream per-bucket kernels
split on the tag and convert each side to pandas SEPARATELY — the
padded null columns are dropped before conversion, so left-side int64
columns never round-trip through float64 (which would corrupt values
above 2^53, e.g. snowflake-style ids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SIDE_COL = "__side__"

_TS_RANK = {"s": 0, "ms": 1, "us": 2, "ns": 3}


def promote_type(a: pa.DataType, b: pa.DataType) -> "pa.DataType | None":
    """Common WIDER type for two mismatched-but-compatible column types
    (int widths, float widths, int+float, timestamp units with equal
    tz) — the engine's DuckDB-like promotion contract for join keys and
    shared union columns (round-5 dtype axis). None = not promotable
    (caller raises its loud type-mismatch error)."""
    if a == b:
        return a
    ints = (pa.types.is_integer(a), pa.types.is_integer(b))
    floats = (pa.types.is_floating(a), pa.types.is_floating(b))
    if all(ints) or (any(ints) and any(floats)) or all(floats):
        try:
            common = pa.from_numpy_dtype(
                np.promote_types(a.to_pandas_dtype(), b.to_pandas_dtype()))
        except Exception:
            return None
        # uint64 vs int64 numpy-promotes to float64 — a float64 common
        # type for two INTEGER columns would silently corrupt values
        # above 2^53 (snowflake-style ids); no safe common integer
        # exists, so refuse and let the caller raise loudly
        if all(ints) and pa.types.is_floating(common):
            return None
        return common
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b) and a.tz == b.tz:
        unit = max(a.unit, b.unit, key=lambda u: _TS_RANK.get(u, -1))
        return pa.timestamp(unit, tz=a.tz)
    return None


def cast_columns(ds: ray.data.Dataset, casts: "dict[str, pa.DataType]") -> ray.data.Dataset:
    """Streaming per-batch cast of named columns to target types."""
    if not casts:
        return ds

    def project(t: pa.Table) -> pa.Table:
        for name, ty in casts.items():
            i = t.schema.get_field_index(name)
            t = t.set_column(i, pa.field(name, ty), t.column(i).cast(ty))
        return t

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def pad_union(left: ray.data.Dataset, right: ray.data.Dataset) -> tuple[ray.data.Dataset, list[str], list[str]]:
    """Union ``left`` and ``right`` with typed-null padding + side tag.

    Shared column names must have identical types (they are the join
    keys). Returns ``(unioned, left_only_cols, right_only_cols)``; the
    output column order is ``[*left_cols, *right_only_cols, SIDE_COL]``.
    """
    from ..core import _schema

    ls, rs = _schema(left), _schema(right)
    left_names = list(ls.names)
    right_names = list(rs.names)
    right_only = [c for c in right_names if c not in left_names]
    left_only = [c for c in left_names if c not in right_names]
    l_casts: dict[str, pa.DataType] = {}
    r_casts: dict[str, pa.DataType] = {}
    for c in set(left_names) & set(right_names):
        lt, rt = ls.field(c).type, rs.field(c).type
        if lt != rt:
            common = promote_type(lt, rt)
            if common is None:
                raise ValueError(
                    f"pad_union: column '{c}' type mismatch: {lt} vs {rt}"
                )
            if lt != common:
                l_casts[c] = common
            if rt != common:
                r_casts[c] = common
    if l_casts or r_casts:  # widen BEFORE padding so schemas align
        left = cast_columns(left, l_casts)
        right = cast_columns(right, r_casts)
        ls = pa.schema([pa.field(f.name, l_casts.get(f.name, f.type)) for f in ls])
        rs = pa.schema([pa.field(f.name, r_casts.get(f.name, f.type)) for f in rs])
    left_t = {c: ls.field(c).type for c in left_only}
    right_t = {c: rs.field(c).type for c in right_only}
    ordered = [*left_names, *right_only, SIDE_COL]

    def pad_l(t: pa.Table) -> pa.Table:
        for c in right_only:
            t = t.append_column(c, pa.nulls(t.num_rows, type=right_t[c]))
        t = t.append_column(SIDE_COL, pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return t.select(ordered)

    def pad_r(t: pa.Table) -> pa.Table:
        for c in left_only:
            t = t.append_column(c, pa.nulls(t.num_rows, type=left_t[c]))
        t = t.append_column(SIDE_COL, pa.array(np.ones(t.num_rows, dtype=np.int8)))
        return t.select(ordered)

    lt = left.map_batches(pad_l, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(pad_r, batch_format="pyarrow", zero_copy_batch=True)
    return lt.union(rt), left_only, right_only


def pad_union_many(sides: "list[ray.data.Dataset]") -> tuple[ray.data.Dataset, list[str]]:
    """K-way generalization of ``pad_union``: union every dataset with
    typed-null padding and ``SIDE_COL`` = the dataset's index. Column
    names must be globally unique apart from shared join keys (callers
    pre-rename value columns); shared names must agree on type. Output
    column order is first-seen order across ``sides`` + ``SIDE_COL``.

    This is what lets a K-table co-partitioned operator (e.g. a
    feature-store point-in-time join of K feature tables onto one
    spine) ride ONE groupby(bucket) exchange instead of K."""
    from ..core import _schema

    schemas = [_schema(ds) for ds in sides]
    ordered: list[str] = []
    types: dict[str, pa.DataType] = {}
    for s in schemas:
        for name in s.names:
            t = s.field(name).type
            if name in types:
                if types[name] != t:
                    common = promote_type(types[name], t)
                    if common is None:
                        raise ValueError(
                            f"pad_union_many: column '{name}' type mismatch: {types[name]} vs {t}"
                        )
                    types[name] = common  # widen shared keys (dtype axis)
            else:
                types[name] = t
                ordered.append(name)
    sides = [
        cast_columns(ds, {n: types[n] for n in s.names if s.field(n).type != types[n]})
        for ds, s in zip(sides, schemas)
    ]
    schemas = [pa.schema([pa.field(n, types[n]) for n in s.names]) for s in schemas]
    out_cols = [*ordered, SIDE_COL]

    def make_pad(idx: int, have: set):
        def pad(t: pa.Table) -> pa.Table:
            for c in ordered:
                if c not in have:
                    t = t.append_column(c, pa.nulls(t.num_rows, type=types[c]))
            t = t.append_column(SIDE_COL, pa.array(np.full(t.num_rows, idx, dtype=np.int8)))
            return t.select(out_cols)

        return pad

    padded = [
        ds.map_batches(make_pad(i, set(s.names)), batch_format="pyarrow", zero_copy_batch=True)
        for i, (ds, s) in enumerate(zip(sides, schemas))
    ]
    out = padded[0]
    for p in padded[1:]:
        out = out.union(p)
    return out, ordered
