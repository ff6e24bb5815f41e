"""Point-in-time (as-of) join — J1, the north rule's core operator.

For each left row, take the latest right row with
``right.ts <= left.ts`` (direction="backward"; optional tolerance)
within the same entity — i.e. features as they were KNOWN at the event
time, never the future: the distributed generalization of the
reference's zero-leakage ordering contract
(`/root/reference/src/temporalscope/target_shifters/single_step.py:290-295`
drops future rows; an as-of join *looks up* only the past).

Execution paths:

- **broadcast** (right side fits in memory — dimension tables, model
  state): the right table is sorted once per actor (``__init__``) from
  a ``ray.put`` handle; each left batch runs a vectorized
  ``pd.merge_asof`` against it. No shuffle at all; the 100 TB default
  whenever the right side is < a few GiB.
- **bucketed** (both sides large): both sides get the SAME
  ``hash(entity) % B`` bucket column, are unioned with a side tag, and
  one ``groupby(bucket).map_groups`` runs a per-bucket sort-merge
  (``pd.merge_asof`` with ``by=entity``). One shuffle, reusing the
  engine's canonical exchange key.

Skew: a hot LEFT entity is harmless in the broadcast path (left rows
are independent). In the bucketed path hot entities inflate one
bucket; mitigate by raising ``num_buckets`` (entity placement is
hash-uniform) or switching that entity's rows to the broadcast path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from . import grouped
from .grouped import clamp_concurrency


def _merge_asof_frames(
    left: pd.DataFrame,
    right: pd.DataFrame,
    *,
    on: str,
    by: Optional[str],
    tolerance,
    direction: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
) -> pd.DataFrame:
    left_sorted = left.sort_values(on, kind="mergesort")
    right_sorted = right.sort_values(on, kind="mergesort")
    # widen mismatched key dtypes to their numpy-promoted common type
    # (ms vs us timestamps -> us, int32 vs int64 -> int64): merge_asof
    # refuses mixed-width keys, and the engine contract is DuckDB-like
    # promotion, never narrowing (round-5 dtype axis)
    for c in [on, *([by] if by else [])]:
        lt, rt = left_sorted[c].dtype, right_sorted[c].dtype
        if lt != rt and lt.kind in "Mmiuf" and rt.kind in "Mmiuf":
            common = np.promote_types(lt, rt)
            left_sorted = left_sorted.astype({c: common})
            right_sorted = right_sorted.astype({c: common})
    kwargs = dict(on=on, direction=direction, suffixes=("", suffix))
    if by is not None:
        kwargs["by"] = by
    if tolerance is not None:
        kwargs["tolerance"] = tolerance
    out = pd.merge_asof(left_sorted, right_sorted[list(dict.fromkeys([on, *([by] if by else []), *right_cols]))], **kwargs)
    return out


class _BroadcastAsof:
    """Actor-pool stage: right side fetched and sorted ONCE per actor."""

    def __init__(self, right_ref, on: str, by: Optional[str], tolerance, direction: str, right_cols, suffix: str):
        right: pd.DataFrame = ray.get(right_ref)
        self.right = right.sort_values(on, kind="mergesort").reset_index(drop=True)
        self.on, self.by, self.tolerance, self.direction = on, by, tolerance, direction
        self.right_cols, self.suffix = right_cols, suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return _merge_asof_frames(
            batch,
            self.right,
            on=self.on,
            by=self.by,
            tolerance=self.tolerance,
            direction=self.direction,
            right_cols=self.right_cols,
            suffix=self.suffix,
        )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    by: Optional[str] = None,
    tolerance=None,
    direction: str = "backward",
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    broadcast: Optional[bool] = None,
    broadcast_limit_rows: int = 5_000_000,
    num_buckets: Optional[int] = None,
    concurrency: int | tuple[int, int] = 8,
    hot_entities: Optional[Sequence] = None,
    num_salts: int = 8,
) -> ray.data.Dataset:
    """Distributed as-of join. ``right_cols`` defaults to all non-key
    right columns; overlapping names get ``suffix``.

    ``hot_entities`` (e.g. from ``grouped.detect_hot_keys``) activates
    skew handling in the bucketed path: a hot entity's LEFT rows are
    salted across ``num_salts`` buckets (each left row's lookup is
    independent, so any split is valid), and its RIGHT rows are
    REPLICATED into every salt bucket so each salted shard still sees
    the full point-in-time state. Cost: ``num_salts×`` duplication of
    the hot entities' right rows only."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    # auto-size the exchange from LEFT-side metadata while it is still
    # metadata-priced (select_columns/map kill _meta_count downstream)
    num_buckets = grouped.resolve_num_buckets(left, num_buckets)
    # A pandas right side is accepted for the broadcast path: a
    # dimension-sized right is driver-materialized there anyway, so
    # callers that already hold (or can cheaply produce) the frame skip
    # a Ray round-trip — and can pre-dedupe in pandas instead of paying
    # a distributed groupby for a dimension table.
    right_is_frame = isinstance(right, pd.DataFrame)
    if right_is_frame and broadcast is False:
        right = ray.data.from_pandas(right)
        right_is_frame = False
    right_names = list(right.columns) if right_is_frame else right.schema().names
    key_cols = {on} | ({by} if by else set())
    if right_cols is None:
        right_cols = [c for c in right_names if c not in key_cols]
    missing = [c for c in [on, *([by] if by else [])] if c not in right_names]
    if missing:
        raise ValueError(f"Column '{missing[0]}' does not exist in right Dataset")

    if broadcast is None:
        cnt = len(right) if right_is_frame else right.count()
        broadcast = cnt is not None and cnt <= broadcast_limit_rows

    if broadcast:
        keep = list(dict.fromkeys([on, *([by] if by else []), *right_cols]))
        right_df = right[keep] if right_is_frame else right.select_columns(keep).to_pandas()
        right_ref = ray.put(right_df)
        return left.map_batches(
            _BroadcastAsof,
            batch_format="pandas",
            concurrency=clamp_concurrency(concurrency),
            fn_constructor_args=(right_ref, on, by, tolerance, direction, list(right_cols), suffix),
        )

    # ---- bucketed sort-merge path (both sides large) ----
    if by is None:
        raise ValueError("bucketed asof_join requires `by` (entity key); use broadcast=True for a global as-of")

    side_col = "__side__"
    keep_right = list(dict.fromkeys([on, by, *right_cols]))
    left_tagged = left.map_batches(
        lambda t: t.append_column(side_col, pa.array(np.zeros(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    right_tagged = right.select_columns(keep_right).map_batches(
        lambda t: t.append_column(side_col, pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # union requires aligned schemas: pad each side with the other's
    # columns as typed nulls (types from the source schemas)
    from ..core import _schema

    left_schema = _schema(left)
    right_schema = _schema(right)
    left_names = list(left_schema.names)
    out_right_cols = [c if c not in left_names else f"{c}{suffix}" for c in right_cols]
    right_type = {c: right_schema.field(c).type for c in right_cols}
    out_right_type = dict(zip(out_right_cols, (right_type[c] for c in right_cols)))
    left_type = {c: left_schema.field(c).type for c in left_names}

    def pad_left(t: pa.Table) -> pa.Table:
        for c in out_right_cols:
            t = t.append_column(c, pa.nulls(t.num_rows, type=out_right_type[c]))
        return t

    def pad_right(t: pa.Table) -> pa.Table:
        # rename right cols to output names, pad with left-only columns
        rename = {c: (f"{c}{suffix}" if c in left_names else c) for c in right_cols}
        cols = {}
        for name in t.column_names:
            if name in (on, by, side_col):
                cols[name] = t.column(name)
            elif name in rename:
                cols[rename[name]] = t.column(name)
        out = pa.table(cols)
        for c in left_names:
            if c not in out.column_names:
                out = out.append_column(c, pa.nulls(out.num_rows, type=left_type[c]))
        return out

    lt = left_tagged.map_batches(pad_left, batch_format="pyarrow")
    rt = right_tagged.map_batches(pad_right, batch_format="pyarrow")
    # column order must match for union
    ordered = [*left_names, *out_right_cols, side_col]
    lt = lt.select_columns(ordered)
    rt = rt.select_columns(ordered)
    both = lt.union(rt)

    # The union put typed nulls into each side's foreign columns; the
    # per-bucket kernel splits the sides while still ARROW tables and
    # drops the padded columns BEFORE the pandas conversion, so a left
    # int64 column never round-trips through float64 (which silently
    # corrupts values above 2^53, e.g. snowflake-style ids).
    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column(side_col).to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 0)
        l = t.filter(lmask).drop_columns([side_col, *out_right_cols]).to_pandas()
        r = t.filter(pa.compute.invert(lmask)).select([on, by, *out_right_cols]).to_pandas()
        if len(l) == 0:
            out = l.copy()
            for c in out_right_cols:
                out[c] = pd.Series([], dtype=out_right_type[c].to_pandas_dtype())
        else:
            out = _merge_asof_frames(
                l, r, on=on, by=by, tolerance=tolerance, direction=direction,
                right_cols=out_right_cols, suffix=suffix,
            )
        return pa.Table.from_pandas(out, preserve_index=False)

    if hot_entities:
        hot_ref = ray.put(pa.array(sorted(set(hot_entities))))

        def salted_bucket(t: pa.Table) -> pa.Table:
            hot = ray.get(hot_ref)
            keys = t.column(by)
            is_hot = pa.compute.is_in(keys, value_set=hot).to_numpy(zero_copy_only=False)
            base = grouped.hash_key_column(keys, num_buckets).astype(np.int64)
            side = t.column(side_col).to_numpy(zero_copy_only=False)
            n = t.num_rows
            # cold rows: plain bucket; hot left rows: salt by row position
            salt_left = np.arange(n) % num_salts
            out_tables = []
            cold_or_left = ~is_hot | (side == 0)
            bucket = base.copy()
            hot_left = is_hot & (side == 0)
            bucket[hot_left] = (base[hot_left] * np.int64(num_salts) + salt_left[hot_left]) % num_buckets
            sub = t.filter(pa.array(cold_or_left)).append_column(
                grouped.BUCKET_COL, pa.array(bucket[cold_or_left].astype(np.int32))
            )
            out_tables.append(sub)
            # hot right rows: replicate into every salt bucket
            hot_right_mask = is_hot & (side == 1)
            if hot_right_mask.any():
                hr = t.filter(pa.array(hot_right_mask))
                hr_base = base[hot_right_mask]
                for s in range(num_salts):
                    b = ((hr_base * np.int64(num_salts) + s) % num_buckets).astype(np.int32)
                    out_tables.append(hr.append_column(grouped.BUCKET_COL, pa.array(b)))
            return pa.concat_tables(out_tables)

        bucketed = both.map_batches(salted_bucket, batch_format="pyarrow", zero_copy_batch=True)
    else:
        bucketed = grouped.with_bucket(both, by, num_buckets)
    return bucketed.groupby(grouped.BUCKET_COL).map_groups(
        lambda t: per_bucket(t.drop_columns([grouped.BUCKET_COL])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# range (interval) join
# ---------------------------------------------------------------------------

def _right_index(right_sorted: pd.DataFrame, on: str, by: str):
    """entity -> (start, stop) slice map over a (by, on)-sorted frame."""
    r_by = right_sorted[by].to_numpy()
    r_on = right_sorted[on].to_numpy()
    change = np.flatnonzero(r_by[1:] != r_by[:-1]) + 1
    starts = np.concatenate(([0], change))
    stops = np.concatenate((change, [len(r_by)]))
    return r_on, {r_by[s]: (s, e) for s, e in zip(starts, stops)}


def _range_join_frames(
    batch: pd.DataFrame, right_sorted: pd.DataFrame, r_on: np.ndarray, slices: dict,
    *, on: str, by: str, lower, upper, right_cols: Sequence[str], suffix: str,
) -> pd.DataFrame:
    """Vectorized interval join of one left frame against a (by, on)-
    sorted right frame: per entity-RUN (not per row), one pair of
    searchsorted calls finds each row's [on+lower, on+upper] window."""
    from .grouped import entity_segments

    order = np.argsort(batch[by].to_numpy(), kind="mergesort")
    l_on = batch[on].to_numpy()[order]
    l_by = batch[by].to_numpy()[order]
    out_left_parts, out_right_parts = [], []
    segs = entity_segments(l_by)
    for s0, e0 in zip(segs[:-1], segs[1:]):
        sl = slices.get(l_by[s0])
        if sl is None:
            continue
        s, e = sl
        run_on = l_on[s0:e0]
        lo = np.searchsorted(r_on[s:e], run_on + lower, side="left") + s
        hi = np.searchsorted(r_on[s:e], run_on + upper, side="right") + s
        counts = hi - lo
        has = counts > 0
        if not has.any():
            continue
        left_rows = np.repeat(order[s0:e0][has], counts[has])
        right_rows = np.concatenate([np.arange(a, b) for a, b in zip(lo[has], hi[has])])
        out_left_parts.append(left_rows)
        out_right_parts.append(right_rows)
    out_left_idx = np.concatenate(out_left_parts) if out_left_parts else []
    out_right_idx = np.concatenate(out_right_parts) if out_right_parts else []
    if len(out_left_idx) == 0:
        out = batch.iloc[0:0].copy()
        for c in right_cols:
            name = f"{c}{suffix}" if c in batch.columns else c
            out[name] = pd.Series([], dtype=right_sorted[c].dtype)
        out[f"{on}{suffix}"] = pd.Series([], dtype=right_sorted[on].dtype)
        return out
    left_part = batch.iloc[out_left_idx].reset_index(drop=True)
    right_part = right_sorted.iloc[out_right_idx].reset_index(drop=True)
    out = left_part
    out[f"{on}{suffix}"] = right_part[on]
    for c in right_cols:
        name = f"{c}{suffix}" if c in batch.columns else c
        out[name] = right_part[c]
    return out


class _BroadcastRangeJoin:
    """Actor: right side fetched + sorted by (by, on) ONCE per actor;
    each left batch rides the shared searchsorted kernel."""

    def __init__(self, right_ref, on, by, lower, upper, right_cols, suffix):
        right: pd.DataFrame = ray.get(right_ref)
        self.right = right.sort_values([by, on], kind="mergesort").reset_index(drop=True)
        self.r_on, self.slices = _right_index(self.right, on, by)
        self.on, self.by, self.lower, self.upper = on, by, lower, upper
        self.right_cols, self.suffix = right_cols, suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return _range_join_frames(
            batch, self.right, self.r_on, self.slices,
            on=self.on, by=self.by, lower=self.lower, upper=self.upper,
            right_cols=self.right_cols, suffix=self.suffix,
        )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    by: str,
    lower,
    upper,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_right",
    concurrency: int | tuple[int, int] = 8,
    broadcast: Optional[bool] = None,
    broadcast_limit_rows: int = 5_000_000,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Interval join: every (left, right) pair within the same entity
    with ``left.on + lower <= right.on <= left.on + upper`` (inner —
    unmatched left rows drop). With ``lower=-w, upper=0`` this is the
    trailing-window join (all state in the last ``w``, not just the
    latest as-of row).

    Two execution paths, mirroring ``asof_join``: **broadcast** (right
    side below ``broadcast_limit_rows``: sorted once per actor, no
    shuffle) and **bucketed** (both sides large: one tagged-union
    entity-hash exchange, per-bucket searchsorted — sides split while
    still Arrow, so no null-padding dtype corruption)."""
    _rs, _ls = right.schema(), left.schema()
    if _rs is None or _ls is None:
        # a side whose plan produced zero blocks is schema-less (Ray
        # drops empty blocks); an INNER interval join with an empty side
        # is empty — return the canonical schema-less empty dataset
        # rather than crash (filters legitimately empty a side)
        return ray.data.from_items([])
    right_names = _rs.names
    if right_cols is None:
        right_cols = [c for c in right_names if c not in (on, by)]
    right_cols = list(right_cols)
    keep_right = list(dict.fromkeys([on, by, *right_cols]))

    if broadcast is None:
        cnt = right.count()
        broadcast = cnt is not None and cnt <= broadcast_limit_rows

    if broadcast:
        right_df = right.select_columns(keep_right).to_pandas()
        right_ref = ray.put(right_df)
        return left.map_batches(
            _BroadcastRangeJoin,
            batch_format="pandas",
            concurrency=clamp_concurrency(concurrency),
            fn_constructor_args=(right_ref, on, by, lower, upper, right_cols, suffix),
        )

    # ---- bucketed path: one entity-hash exchange moves both sides ----
    from .exchange import SIDE_COL, pad_union

    left_names = list(_ls.names)
    # rename overlapping right value columns BEFORE the union (`on` is
    # emitted as on+suffix; `by` is the shared key)
    out_right_cols = [c if c not in left_names else f"{c}{suffix}" for c in right_cols]
    rename = dict(zip(right_cols, out_right_cols))
    on_out = f"{on}{suffix}"

    def prep_right(t: pa.Table) -> pa.Table:
        cols = {}
        for name in t.column_names:
            if name == by:
                cols[by] = t.column(name)
            elif name == on:
                cols[on_out] = t.column(name)
            if name in rename:
                cols[rename[name]] = t.column(name)
        return pa.table(cols)

    rt = right.select_columns(keep_right).map_batches(prep_right, batch_format="pyarrow")
    both, _, _ = pad_union(left, rt)
    bucketed = grouped.with_bucket(both, by, num_buckets)
    r_side_cols = list(dict.fromkeys([on_out, by, *out_right_cols]))

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column(SIDE_COL).to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 0)
        l = t.filter(lmask).select(left_names).to_pandas()
        r = t.filter(pa.compute.invert(lmask)).select(r_side_cols).to_pandas()
        r = r.rename(columns={on_out: on})
        r = r.sort_values([by, on], kind="mergesort").reset_index(drop=True)
        r_on, slices = _right_index(r, on, by)
        out = _range_join_frames(
            l, r, r_on, slices, on=on, by=by, lower=lower, upper=upper,
            right_cols=out_right_cols, suffix=suffix,
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed.groupby(grouped.BUCKET_COL).map_groups(
        lambda t: per_bucket(t.drop_columns([grouped.BUCKET_COL])), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# feature-store point-in-time join: K feature tables, one spine
# ---------------------------------------------------------------------------

class _MultiBroadcastAsof:
    """Actor-pool stage: ALL small feature tables fetched and sorted
    ONCE per actor; each spine batch runs the K as-of merges back to
    back — one streaming pass regardless of how many dimension tables
    are attached."""

    def __init__(self, specs, on: str, by: str):
        # specs: list of (right_ref, tolerance, direction, out_cols)
        self.specs = []
        for right_ref, tolerance, direction, out_cols in specs:
            right: pd.DataFrame = ray.get(right_ref)
            self.specs.append((right, tolerance, direction, out_cols))
        self.on, self.by = on, by

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch
        for right, tolerance, direction, out_cols in self.specs:
            out = _merge_asof_frames(
                out, right, on=self.on, by=self.by, tolerance=tolerance,
                direction=direction, right_cols=out_cols,
            )
        return out


def multi_asof_join(
    left: ray.data.Dataset,
    rights: "dict[str, ray.data.Dataset | pd.DataFrame]",
    *,
    on: str,
    by: str,
    right_cols: Optional[dict] = None,
    tolerance=None,
    direction="backward",
    broadcast: Optional[bool] = None,
    broadcast_limit_rows: int = 5_000_000,
    num_buckets: Optional[int] = None,
    concurrency: int | tuple[int, int] = 8,
    hot_entities: Optional[Sequence] = None,
    num_salts: int = 8,
) -> ray.data.Dataset:
    """Feature-store point-in-time enrichment: as-of join K feature
    tables onto one spine in AT MOST one shuffle + one broadcast stage
    TOTAL, instead of K sequential ``asof_join`` passes (K exchanges /
    K actor pools). The per-row semantics are identical to folding
    ``asof_join`` left-to-right over ``rights`` in dict order — each
    left row reads, per table, the latest right row with
    ``right.on <= left.on`` (direction='backward') in the same entity:
    features as they were KNOWN at event time, zero leakage (the
    distributed generalization of the reference's ordering contract,
    `/root/reference/src/temporalscope/target_shifters/single_step.py:290-295`).

    Scale shape: tables whose row count fits ``broadcast_limit_rows``
    ride ONE ``_MultiBroadcastAsof`` actor pool (each actor fetches and
    sorts every small table once in ``__init__``); larger tables are
    tagged ``SIDE=1..K`` and pad-unioned with the spine (``SIDE=0``)
    into ONE ``groupby(hash(entity) % B)`` exchange whose per-bucket
    kernel runs the K-way sort-merge. With K feature tables the
    alternative is K all-to-all shuffles of the (growing) spine — this
    is the difference between 1 and K spine materializations at 100 TB.

    ``tolerance`` / ``direction`` may be scalars (applied to every
    table) or dicts keyed like ``rights``. Output columns keep their
    right-table names; collisions with the spine or an earlier table
    get ``_{name}`` appended.

    ``hot_entities`` (same contract as ``asof_join``) activates skew
    handling in the bucketed path: a hot entity's SPINE rows are salted
    across ``num_salts`` buckets (each spine row's K lookups are
    independent, so any split is valid) and EVERY feature table's hot
    rows are replicated into each salt bucket, so each salted shard
    still sees the full point-in-time state of all K tables.
    """
    num_buckets = grouped.resolve_num_buckets(left, num_buckets)
    if not rights:
        return left
    tol = tolerance if isinstance(tolerance, dict) else {k: tolerance for k in rights}
    dirn = direction if isinstance(direction, dict) else {k: direction for k in rights}
    for k, d in dirn.items():
        if d not in ("backward", "forward", "nearest"):
            raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    cols_by_name = right_cols or {}
    from ..core import _schema

    left_names = list(_schema(left).names)
    used = set(left_names)
    plans = []  # (name, ds_or_frame, orig_cols, out_cols, n_rows)
    for name, r in rights.items():
        is_frame = isinstance(r, pd.DataFrame)
        names = list(r.columns) if is_frame else r.schema().names
        missing = [c for c in (on, by) if c not in names]
        if missing:
            raise ValueError(f"Column '{missing[0]}' does not exist in right Dataset '{name}'")
        orig = list(cols_by_name.get(name) or [c for c in names if c not in (on, by)])
        outs = []
        for c in orig:
            oc = c if c not in used else f"{c}_{name}"
            if oc in used:
                raise ValueError(f"multi_asof_join: output column '{oc}' collides twice")
            used.add(oc)
            outs.append(oc)
        n = len(r) if is_frame else r.count()
        plans.append((name, r, orig, outs, n))

    if broadcast is None:
        is_small = [p[4] is not None and p[4] <= broadcast_limit_rows for p in plans]
    elif broadcast:
        is_small = [True] * len(plans)
    else:
        is_small = [False] * len(plans)
    small = [p for p, s in zip(plans, is_small) if s]
    large = [p for p, s in zip(plans, is_small) if not s]

    out = left
    out_names = list(left_names)

    if large:
        # ---- ONE bucket exchange for all large tables ----
        from .exchange import SIDE_COL, pad_union_many

        sides = [out]
        per_side = []  # (out_cols, tolerance, direction) for side i>=1
        for name, r, orig, outs, _n in large:
            if isinstance(r, pd.DataFrame):
                r = ray.data.from_pandas(r)
            keep = [on, by, *orig]
            rename = dict(zip(orig, outs))

            def project(t: pa.Table, keep=keep, rename=rename) -> pa.Table:
                t = t.select(keep)
                return t.rename_columns([rename.get(c, c) for c in t.column_names])

            sides.append(r.map_batches(project, batch_format="pyarrow", zero_copy_batch=True))
            per_side.append((outs, tol[name], dirn[name]))

        both, ordered = pad_union_many(sides)
        spine_cols = list(out_names)
        all_out_types = {}
        sch = _schema(both)
        for _outs, _t, _d in per_side:
            for c in _outs:
                all_out_types[c] = sch.field(c).type

        def per_bucket(t: pa.Table) -> pa.Table:
            side = t.column(SIDE_COL).to_numpy(zero_copy_only=False)
            l = t.filter(pa.array(side == 0)).select(spine_cols).to_pandas()
            if len(l) == 0:
                for _outs, _t, _d in per_side:
                    for c in _outs:
                        l[c] = pd.Series([], dtype=all_out_types[c].to_pandas_dtype())
                return pa.Table.from_pandas(l, preserve_index=False)
            for i, (_outs, _tol, _dir) in enumerate(per_side, start=1):
                r = t.filter(pa.array(side == i)).select([on, by, *_outs]).to_pandas()
                l = _merge_asof_frames(
                    l, r, on=on, by=by, tolerance=_tol, direction=_dir, right_cols=_outs,
                )
            return pa.Table.from_pandas(l, preserve_index=False)

        if hot_entities:
            hot_ref = ray.put(pa.array(sorted(set(hot_entities))))

            def salted_bucket(t: pa.Table) -> pa.Table:
                hot = ray.get(hot_ref)
                keys = t.column(by)
                is_hot = pa.compute.is_in(keys, value_set=hot).to_numpy(zero_copy_only=False)
                base = grouped.hash_key_column(keys, num_buckets).astype(np.int64)
                side = t.column(SIDE_COL).to_numpy(zero_copy_only=False)
                n = t.num_rows
                # cold rows and hot SPINE rows pass once; hot spine rows
                # are salted by row position (lookups are independent)
                salt = np.arange(n) % num_salts
                bucket = base.copy()
                hot_spine = is_hot & (side == 0)
                bucket[hot_spine] = (base[hot_spine] * np.int64(num_salts) + salt[hot_spine]) % num_buckets
                keep_once = ~is_hot | (side == 0)
                out_tables = [
                    t.filter(pa.array(keep_once)).append_column(
                        grouped.BUCKET_COL, pa.array(bucket[keep_once].astype(np.int32))
                    )
                ]
                # hot FEATURE rows (any side >= 1): replicate into every
                # salt bucket so each shard sees the full state
                hot_feat = is_hot & (side != 0)
                if hot_feat.any():
                    hf = t.filter(pa.array(hot_feat))
                    hf_base = base[hot_feat]
                    for s in range(num_salts):
                        b = ((hf_base * np.int64(num_salts) + s) % num_buckets).astype(np.int32)
                        out_tables.append(hf.append_column(grouped.BUCKET_COL, pa.array(b)))
                return pa.concat_tables(out_tables)

            bucketed = both.map_batches(salted_bucket, batch_format="pyarrow", zero_copy_batch=True)
        else:
            bucketed = grouped.with_bucket(both, by, num_buckets)
        out = bucketed.groupby(grouped.BUCKET_COL).map_groups(
            lambda t: per_bucket(t.drop_columns([grouped.BUCKET_COL])), batch_format="pyarrow"
        )
        for _name, _r, _orig, outs, _n in large:
            out_names.extend(outs)

    if small:
        # ---- ONE actor pool for all small tables ----
        specs = []
        for name, r, orig, outs, _n in small:
            keep = [on, by, *orig]
            rdf = r[keep].copy() if isinstance(r, pd.DataFrame) else r.select_columns(keep).to_pandas()
            rdf.columns = [on, by, *outs]
            rdf = rdf.sort_values(on, kind="mergesort").reset_index(drop=True)
            specs.append((ray.put(rdf), tol[name], dirn[name], outs))

        out = out.map_batches(
            _MultiBroadcastAsof, batch_format="pandas",
            concurrency=clamp_concurrency(concurrency),
            fn_constructor_args=(specs, on, by),
        )
    return out


# ---------------------------------------------------------------------------
# J2 — broadcast semi / anti lookup
# ---------------------------------------------------------------------------

def semi_join(
    left: ray.data.Dataset, keys: ray.data.Dataset | Sequence, key_col: str, *, anti: bool = False,
    assume_unique: bool = False, broadcast_limit_rows: int = 2_000_000,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Keep left rows whose ``key_col`` is (semi) / is not (anti) in the
    key set.

    Execution is size-adaptive: a key set below
    ``broadcast_limit_rows`` is broadcast via ``ray.put`` (no shuffle
    on the left side); a larger key Dataset takes the BUCKETED path —
    both sides get the same ``hash(key) % B`` bucket and one
    ``groupby(bucket)`` co-locates them, so the key set is never
    materialized on the driver (the round-1 scale flaw: dedup survivor
    sets are ~95% of the corpus). ``assume_unique=True`` skips the
    distinct pass on a keys Dataset when the caller guarantees
    uniqueness (e.g. one row per id by construction)."""
    if isinstance(keys, ray.data.Dataset):
        # materialize ONCE: count() would otherwise execute the keys
        # lineage, and unique()/to_pandas() would re-execute it from
        # scratch — measured as a full re-run of a 3-stage dedup
        # pipeline per consumer. The materialized set lives in the
        # (distributed, spillable) object store, never on the driver.
        keys = keys.materialize()
        cnt = keys.count()
        if cnt == 0:
            # empty key set: anti keeps everything, semi keeps nothing
            return left if anti else left.limit(0)
        if cnt is not None and cnt > broadcast_limit_rows:
            return _semi_join_bucketed(left, keys, key_col, anti=anti, num_buckets=num_buckets)
        if assume_unique:
            value_set = pa.array(keys.select_columns([key_col]).to_pandas()[key_col].to_numpy())
        else:
            value_set = pa.array(keys.unique(key_col))
    else:
        value_set = pa.array(sorted(set(keys)))
    ref = ray.put(value_set)  # Arrow array: zero-copy reads in every task

    def filt(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        mask = pa.compute.is_in(batch.column(key_col), value_set=vs)
        if anti:
            mask = pa.compute.invert(mask)
        return batch.filter(mask)

    return left.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def _semi_join_bucketed(
    left: ray.data.Dataset, keys: ray.data.Dataset, key_col: str, *, anti: bool,
    num_buckets: int,
) -> ray.data.Dataset:
    """Distributed semi/anti join: one bucket exchange, per-bucket
    vectorized ``is_in``. Key rows carry only ``key_col`` through the
    shuffle; each side is filtered separately on the side tag so left
    columns never pass through a null-padding dtype coercion."""
    from .exchange import SIDE_COL, pad_union

    left_cols = list(left.schema().names)
    both, _, _ = pad_union(left, keys.select_columns([key_col]))
    bucketed = grouped.with_bucket(both, key_col, num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column(SIDE_COL).to_numpy(zero_copy_only=False)
        lmask = side == 0
        l = t.filter(pa.array(lmask)).select(left_cols)
        key_set = pa.compute.unique(t.filter(pa.array(~lmask)).column(key_col))
        mask = pa.compute.is_in(l.column(key_col), value_set=key_set)
        if anti:
            mask = pa.compute.invert(mask)
        return l.filter(mask)

    return bucketed.groupby(grouped.BUCKET_COL).map_groups(
        lambda t: per_bucket(t.drop_columns([grouped.BUCKET_COL])), batch_format="pyarrow"
    )
