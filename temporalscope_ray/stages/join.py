"""General equi-join (inner / left) — broadcast and bucketed plans.

The reference implements no joins (verified in SURVEY.md §2.4: no
``join``/``merge`` anywhere under ``/root/reference/src``); its users
pre-join inputs with pandas/polars before building a ``TimeFrame``. A
distributed engine must own that step, with the same two physical
plans every distributed SQL engine picks between:

* **broadcast** — the right side is a dimension table that fits in
  memory: materialize it ONCE, ship it via ``ray.put`` (one object
  store copy per node, zero copies per task), and every left batch
  merges against it inside ``map_batches``. The fact table never
  shuffles. This is the 100 TB plan whenever the right side is
  ≲ a few GiB.
* **bucketed** — both sides are big: schema-align them with a tagged
  union (``exchange.pad_union``), add ``__bucket__ = hash(key) % B``,
  and run ONE hash exchange; each bucket splits back into its two
  sides IN ARROW (so padded nulls never force an int64→float64
  round-trip — values above 2^53 survive bit-exact) and merges with a
  vectorized pandas hash join.

Non-key column names must be disjoint between the two sides — the
engine refuses to guess a suffixing scheme; callers rename first
(``select_columns`` / ``map_batches`` projection). Key columns must
share types.

Left-join null semantics: unmatched left rows get typed nulls in the
right-side columns (pandas merge yields NaN; the Arrow conversion
restores the right side's nullable types via explicit schema).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .exchange import SIDE_COL, cast_columns, pad_union, promote_type
from .grouped import BUCKET_COL, DEFAULT_NUM_BUCKETS, clamp_concurrency, hash_key_column

_BROADCAST_ROW_LIMIT = 5_000_000


def _check_disjoint(left_schema: pa.Schema, right_schema: pa.Schema, on: list[str]) -> None:
    overlap = (set(left_schema.names) & set(right_schema.names)) - set(on)
    if overlap:
        raise ValueError(
            f"equi_join: non-key columns present on both sides: {sorted(overlap)}; "
            "rename before joining"
        )


def _to_pandas_nullsafe(t: pa.Table) -> pd.DataFrame:
    """Arrow → pandas keeping Arrow-backed dtypes: an int64 column
    containing nulls must NOT round-trip through float64 (values above
    2^53 — e.g. snowflake-style ids — would be silently corrupted)."""
    return t.to_pandas(types_mapper=pd.ArrowDtype)


def _merge_frames(
    lf: pd.DataFrame, rf: pd.DataFrame, on: list[str], how: str
) -> pd.DataFrame:
    # SQL join semantics: NULL keys never match (pandas merge would
    # pair NaN with NaN). Dropping null-keyed right rows makes inner
    # drop null-keyed left rows and left-join pass them through
    # unmatched — both correct. A FULL join must instead KEEP
    # null-keyed right rows as unmatched output rows, so they are
    # split off before the merge and appended after.
    rnull = rf[rf[on].isna().any(axis=1)] if how == "full" else None
    rf = rf.dropna(subset=on)
    out = lf.merge(rf, on=on, how="outer" if how == "full" else how, sort=False)
    if rnull is not None and len(rnull):
        out = pd.concat([out, rnull.reindex(columns=out.columns)], ignore_index=True)
    return out


class _BroadcastJoin:
    """Actor-pool stage: right side pulled from the object store once
    per actor (``__init__``), merged per batch (``__call__``)."""

    def __init__(
        self,
        right_ref,
        on: Sequence[str],
        how: str,
        out_schema: pa.Schema,
        right_schema: "pa.Schema | None" = None,
    ):
        # right_ref: list of ObjectRefs to Arrow tables (Dataset path —
        # never converted to pandas on the driver, so nullable int64
        # keys reach the actor uncorrupted) or one ref to a caller's
        # pandas frame. Normalized ONCE per actor to Arrow-backed
        # dtypes so every batch merge is null-safe (_to_pandas_nullsafe).
        if isinstance(right_ref, list):
            # strip per-block schema metadata (from_pandas leftovers)
            # and drop schema-less EMPTY blocks (e.g. from empty
            # groupby buckets) — concat_tables needs identical schemas.
            # to_arrow_refs can hand back raw PANDAS blocks for
            # pandas-born datasets (tiny inputs route through pandas
            # map_groups) — normalize per block before touching Arrow
            # methods.
            tabs = [
                (pa.Table.from_pandas(t, preserve_index=False)
                 if isinstance(t, pd.DataFrame) else t).replace_schema_metadata(None)
                for t in ray.get(right_ref)
            ]
            tabs = [t for t in tabs if t.num_columns > 0]
            rt = pa.concat_tables(tabs) if tabs else pa.schema(right_schema).empty_table()
        else:
            r = ray.get(right_ref) if not isinstance(right_ref, pd.DataFrame) else right_ref
            rt = pa.Table.from_pandas(r, preserve_index=False)
        self.right = _to_pandas_nullsafe(rt)
        self.on = list(on)
        self.how = how
        self.out_schema = out_schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        lf = _to_pandas_nullsafe(batch)
        out = _merge_frames(lf, self.right, self.on, self.how)
        # strip the pandas metadata from_pandas embeds: a downstream
        # cast would otherwise be silently undone when to_pandas
        # replays the recorded dtypes over the new Arrow types
        return pa.Table.from_pandas(
            out, schema=self.out_schema, preserve_index=False
        ).replace_schema_metadata(None)


def _out_schema(ls: pa.Schema, rs: pa.Schema, on: list[str], how: str) -> pa.Schema:
    """Output schema: left columns then right-only columns; for a left
    join every right-only column becomes nullable (it already is — all
    Arrow fields here are nullable), and integer right columns must
    survive the pandas NaN round-trip, so we keep the Arrow types and
    convert back with an explicit schema."""
    fields = list(ls)
    for f in rs:
        if f.name not in on:
            fields.append(f)
    return pa.schema(fields)


def equi_join(
    left: ray.data.Dataset,
    right: "ray.data.Dataset | pd.DataFrame",
    on: "str | Sequence[str]",
    *,
    how: str = "inner",
    broadcast: Optional[bool] = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    concurrency: int = 8,
) -> ray.data.Dataset:
    """Join ``left`` with ``right`` on equality of ``on`` columns.

    ``how`` ∈ {"inner", "left", "full"}. ``broadcast=None``
    auto-selects: a pandas right side always broadcasts; a Dataset
    right side broadcasts when its count is under
    ``_BROADCAST_ROW_LIMIT``, otherwise both sides flow through one
    bucketed hash exchange. Full outer is bucketed-only (a broadcast
    task cannot know which right rows every OTHER task matched).
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "full"):
        raise ValueError(f"equi_join: how must be 'inner', 'left' or 'full', got '{how}'")
    if how == "full" and broadcast:
        raise ValueError(
            "equi_join: full outer join requires the bucketed plan "
            "(broadcast tasks cannot track right-side rows unmatched across batches)"
        )
    from ..core import _schema

    # a side whose plan produced zero blocks is schema-less (Ray drops
    # empty blocks, schema() → None — e.g. a filter kept nothing). An
    # INNER join with a provably-empty side is empty; for left/full the
    # missing side's column names are unrecoverable, so fail loud with
    # an actionable message instead of an AttributeError deep inside.
    _l_raw = left.schema()
    _r_raw = right.schema() if not isinstance(right, pd.DataFrame) else True
    if _l_raw is None or _r_raw is None:
        if how == "inner":
            return ray.data.from_items([])
        raise ValueError(
            "equi_join: a join side is empty and schema-less (its plan "
            "produced zero blocks); a left/full join cannot name the "
            "missing side's columns — materialize a schema-ful side or "
            "use how='inner'"
        )

    ls = _schema(left)

    if isinstance(right, pd.DataFrame):
        if how == "full":
            raise ValueError(
                "equi_join: full outer join needs a Dataset right side (bucketed plan)"
            )
        rs = pa.Schema.from_pandas(right, preserve_index=False)
        _check_disjoint(ls, rs, on)
        out_schema = _out_schema(ls, rs, on, how)
        ref = ray.put(right)
        return left.map_batches(
            _BroadcastJoin,
            fn_constructor_args=(ref, on, how, out_schema),
            batch_format="pyarrow",
            concurrency=clamp_concurrency(concurrency),
            num_cpus=1,
        )

    rs = _schema(right)
    _check_disjoint(ls, rs, on)
    l_casts: dict = {}
    r_casts: dict = {}
    for c in on:
        lt, rt = ls.field(c).type, rs.field(c).type
        if lt != rt:
            # widen promotable key widths (int32 vs int64, ms vs us —
            # round-5 dtype axis); only truly incompatible types raise
            common = promote_type(lt, rt)
            if common is None:
                raise ValueError(
                    f"equi_join: key '{c}' type mismatch: {lt} vs {rt}"
                )
            if lt != common:
                l_casts[c] = common
            if rt != common:
                r_casts[c] = common
    if l_casts:
        left = cast_columns(left, l_casts)
        ls = pa.schema([pa.field(f.name, l_casts.get(f.name, f.type)) for f in ls])
    if r_casts:
        right = cast_columns(right, r_casts)
        rs = pa.schema([pa.field(f.name, r_casts.get(f.name, f.type)) for f in rs])
    if broadcast is None:
        if how == "full":
            broadcast = False
        else:
            # materialize once: count() would otherwise execute the right
            # plan, and the broadcast refs would execute it a second time
            right = right.materialize()
            broadcast = right.count() <= _BROADCAST_ROW_LIMIT
    if broadcast:
        out_schema = _out_schema(ls, rs, on, how)
        refs = list(right.to_arrow_refs())
        return left.map_batches(
            _BroadcastJoin,
            fn_constructor_args=(refs, on, how, out_schema, rs),
            batch_format="pyarrow",
            concurrency=clamp_concurrency(concurrency),
            num_cpus=1,
        )

    # ---- bucketed plan: ONE hash exchange moves both sides ----
    unioned, left_only, right_only = pad_union(left, right)
    out_schema = _out_schema(ls, rs, on, how)
    key = on[0]

    def add_bucket(t: pa.Table) -> pa.Table:
        b = hash_key_column(t.column(key), num_buckets)
        return t.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    bucketed = unioned.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    left_cols = [c for c in ls.names]
    right_cols = [c for c in rs.names]

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column(SIDE_COL).to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(left_cols)
        rt = t.filter(pa.array(side == 1)).select(right_cols)
        lf, rf = _to_pandas_nullsafe(lt), _to_pandas_nullsafe(rt)
        out = _merge_frames(lf, rf, on, how)
        # metadata stripped for the same reason as the broadcast path
        return pa.Table.from_pandas(
            out, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        bucketed.groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pyarrow", num_cpus=2)
    )


def interval_overlap_pairs(
    ds: ray.data.Dataset,
    *,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    bucket_width_us: int = 3_600_000_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Interval overlap SELF-join: every unordered pair of intervals
    with ``s_a ≤ e_b AND s_b ≤ e_a`` (closed ends), emitted once as
    ``a_* / b_*`` key columns with the later-starting interval on the
    ``b`` side — the co-occurrence primitive (concurrent sessions,
    overlapping campaigns, co-active devices) that neither the equality
    join nor the as-of family expresses.

    Partitioning pattern (new in this repo): TIME-BUCKET REPLICATION
    with owner-bucket emission. Each interval replicates to every
    ``bucket_width_us`` bucket its span touches (one exchange of
    replicated interval-stub rows — never payloads); a pair is detected
    in every shared bucket but EMITTED only in the bucket that owns
    ``max(s_a, s_b)`` — exactly-once without any dedup exchange. Per
    bucket the sweep is sort-by-start + one ``searchsorted`` (each
    interval pairs with the contiguous run of later starts ≤ its end),
    so work is O(b log b + pairs), never a blind b² scan. Size
    ``bucket_width_us`` near the typical interval span: too wide packs
    unrelated intervals into one task, too narrow replicates long
    intervals many times.
    """
    import pandas as _pd

    from .grouped import with_bucket

    key_cols = list(key_cols)
    W = int(bucket_width_us)
    if W <= 0:
        raise ValueError("interval_overlap_pairs: bucket_width_us must be > 0")
    tb = "__tbucket__"

    def explode(b: _pd.DataFrame) -> _pd.DataFrame:
        def _us(col):  # unit-safe: bucket_width_us is MICROsecond-scaled
            arr = b[col].to_numpy()
            if arr.dtype.kind == "M":
                arr = arr.astype("datetime64[us]")
            return arr.astype(np.int64)
        s = _us(start_col)
        e = _us(end_col)
        if (e < s).any():
            raise ValueError("interval_overlap_pairs: end before start")
        lo = s // W
        hi = e // W
        reps = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), reps)
        # bucket id per replica: lo[i], lo[i]+1, ..., hi[i]
        offs = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        out = _pd.DataFrame({c: b[c].to_numpy()[idx] for c in key_cols})
        out["__s__"] = s[idx]
        out["__e__"] = e[idx]
        out[tb] = lo[idx] + offs
        return out

    stubs = ds.select_columns([*key_cols, start_col, end_col]).map_batches(
        explode, batch_format="pandas")
    bucketed = with_bucket(stubs, tb, num_buckets)

    def per_hash_bucket(g: _pd.DataFrame) -> _pd.DataFrame:
        outs = []
        for tbv, sub in g.groupby(tb, sort=False):
            s = sub["__s__"].to_numpy()
            order = np.argsort(s, kind="mergesort")
            s = s[order]
            e = sub["__e__"].to_numpy()[order]
            n = len(s)
            if n < 2:
                continue
            k = np.searchsorted(s, e, side="right") - np.arange(n) - 1
            k = np.maximum(k, 0)
            total = int(k.sum())
            if total == 0:
                continue
            ii = np.repeat(np.arange(n), k)
            offs = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(k)[:-1])), k)
            jj = ii + 1 + offs
            own = (s[jj] // W) == tbv          # later start owns the pair
            ii, jj = ii[own], jj[own]
            if not len(ii):
                continue
            cols = {}
            for c in key_cols:
                v = sub[c].to_numpy()[order]
                cols[f"a_{c}"] = v[ii]
                cols[f"b_{c}"] = v[jj]
            outs.append(_pd.DataFrame(cols))
        if not outs:
            return _pd.DataFrame({f"{p}_{c}": _pd.Series([], dtype=g[c].dtype)
                                  for p in ("a", "b") for c in key_cols})
        return _pd.concat(outs, ignore_index=True)

    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda g: per_hash_bucket(g.drop(columns=[BUCKET_COL])),
        batch_format="pandas")
