"""Zero-leakage target shifting (lag/lead) and multi-step expanded targets.

Reference semantics
(`/root/reference/src/temporalscope/target_shifters/single_step.py:265-301`):
``{target}_shift_{n}`` = target value ``n`` rows AHEAD in the current
sort order (a lead / future label); rows whose shifted value falls off
the end are dropped (exactly ``n`` per ordered series), so no row ever
trains on a label that does not exist — the zero-temporal-leakage
contract. Output column naming and row-drop counts are preserved
verbatim (reference tests ``test_single_step.py:122-148``).

Two distributed execution paths:

- **per-entity** (``id_col`` set): one bucket shuffle
  (``grouped.grouped_ordered_map``), then a vectorized segment-wise
  shift inside each entity-complete bucket. This is the 100 TB path —
  entities never cross buckets, no global order is needed.
- **global single-series** (no ``id_col``; the reference's exact
  semantics): a range-partition ``sort(time_col)`` followed by a
  block-boundary exchange — each sorted block's first ``n`` rows are
  collected (tiny: ``n × num_blocks`` rows), broadcast via ``ray.put``,
  and a second stateless pass appends its successor rows before
  shifting, so blocks never see more than ``n`` foreign rows.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..core import MODE_MULTI_TARGET, MODE_SINGLE_TARGET, VALID_MODES
from ..dataset import TemporalDataset
from . import grouped


def _shift_segment_values(values: np.ndarray, segments: np.ndarray, n: int) -> np.ndarray:
    """Vectorized per-segment lead: out[i] = values[i+n] within segment,
    NaN past the segment end (works on float64; callers cast).

    Delegates to the fully vectorized ``_seg_shift`` kernel (shared with
    window_features) — no per-entity Python loop, so buckets with many
    small entities cost one numpy pass, not one iteration per entity."""
    from .window_features import _seg_shift, _segment_ids

    # _seg_shift's sign convention: k>0 = lag (past), k<0 = lead (future);
    # this helper's n>0 means lead, so negate.
    return _seg_shift(values, _segment_ids(segments), -n)


def shift_column_per_entity(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    id_col: str,
    time_col: str,
    n: int,
    out_col: str,
    drop_null_shift: bool = True,
    num_buckets: int = grouped.DEFAULT_NUM_BUCKETS,
    tiebreak: Optional[list[str]] = None,
) -> ray.data.Dataset:
    """Per-entity lead (n>0) / lag (n<0) of ``value_col`` into ``out_col``."""
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[id_col].to_numpy()
        segs = grouped.entity_segments(keys)
        vals = g[value_col].to_numpy(dtype=np.float64)
        g = g.copy()
        g[out_col] = _shift_segment_values(vals, segs, n)
        if drop_null_shift:
            g = g[~g[out_col].isna()]
        return g

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def shift_column_global(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    time_col: str,
    n: int,
    out_col: str,
    drop_null_shift: bool = True,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """Global-order lead over the total time order.

    Adaptive execution: below ``single_task_threshold`` rows the whole
    series is processed by ONE worker task (coalesce + in-task pandas
    sort/shift) — a distributed range-partition sort costs ~3x a local
    sort at single-node scale, so small series take the local path
    (matching the reference's single-node throughput). Above the
    threshold: distributed sort + block-boundary exchange — only the
    first ``n`` rows of every sorted block travel to the driver. The
    2M-row default keeps the single task under ~100 MB of pandas; pass
    ``single_task_threshold=0`` to force the distributed branch.
    """
    if n <= 0:
        raise ValueError("global shift currently supports n > 0 (lead)")
    total = ds.count()
    if total is not None and total <= single_task_threshold:
        def local(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.sort_values(time_col, kind="mergesort")
            out[out_col] = out[value_col].shift(-n)
            if drop_null_shift:
                out = out[~out[out_col].isna()]
            return out

        return ds.repartition(1).map_batches(local, batch_size=None, batch_format="pandas")
    sorted_ds = ds.sort(time_col).materialize()  # pin so both passes see identical blocks
    heads_ref = _collect_block_heads(sorted_ds, time_col, value_col, n)

    # pass 2: shift inside each block with successor head rows appended
    def shift_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], type=pa.float64()))
        extra = _successor_values(batch, heads_ref, time_col, value_col, n)
        vals = np.concatenate([batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64), extra])
        shifted = vals[n : n + batch.num_rows]
        pad = batch.num_rows - len(shifted)
        if pad > 0:
            shifted = np.concatenate([shifted, np.full(pad, np.nan)])
        out = batch.append_column(out_col, pa.array(shifted, type=pa.float64()))
        if drop_null_shift:
            out = out.filter(pa.array(~np.isnan(shifted)))
        return out

    return sorted_ds.map_batches(shift_block, batch_size=None, batch_format="pyarrow")


def _block_sig(batch: pa.Table, time_col: str, value_col: str, n: int) -> str:
    """Per-block signature (start ts, row count, checksum of the first
    ``n`` values) identifying MY block in the pass-2 successor lookup —
    excluding by start ts alone would wrongly drop a successor block
    that happens to start with the same (duplicate) timestamp. NOTE:
    when duplicate timestamps span a block boundary, the global order
    among the ties is one valid sort order, not a canonical one (same
    as any unstable distributed sort); provide a unique time key for
    strict determinism."""
    k = min(n, batch.num_rows)
    head_vals = batch.column(value_col).slice(0, k).to_numpy(zero_copy_only=False)
    return repr((
        batch.column(time_col)[0].as_py(),
        batch.num_rows,
        float(np.nansum(head_vals)),
    ))


def _collect_block_heads(sorted_ds: ray.data.Dataset, time_col: str, value_col: str, n: int) -> "ray.ObjectRef":
    """Pass 1 of the block-boundary exchange: collect each sorted
    block's first ``n`` (ts, value) rows plus its signature — tiny
    (``n × num_blocks`` rows) — and broadcast the merged frame."""

    def head_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = batch.select([time_col, value_col])
            return t.append_column("__blk_sig__", pa.array([], type=pa.string()))
        k = min(n, batch.num_rows)
        head = batch.select([time_col, value_col]).slice(0, k)
        sig = _block_sig(batch, time_col, value_col, n)
        return head.append_column("__blk_sig__", pa.array([sig] * k, type=pa.string()))

    heads = sorted_ds.map_batches(head_rows, batch_size=None, batch_format="pyarrow").to_pandas()
    heads = heads.sort_values([time_col]).reset_index(drop=True)
    return ray.put(heads)


def _successor_values(batch: pa.Table, heads_ref, time_col: str, value_col: str, n: int) -> np.ndarray:
    """The first ``n`` values strictly AFTER this block in the global
    order: head rows at/after my last ts, excluding exactly my own
    block's heads (full signature match). Blocks smaller than ``n``
    contribute their whole head, so the first ``n`` successors are
    always covered even when they span several blocks."""
    h: pd.DataFrame = ray.get(heads_ref)
    my_sig = _block_sig(batch, time_col, value_col, n)
    last = batch.column(time_col)[batch.num_rows - 1].as_py()
    succ = h[(h["__blk_sig__"] != my_sig) & (h[time_col] >= last)].sort_values(time_col)
    return succ[value_col].to_numpy(dtype=np.float64)[:n]


def expand_targets_global(
    ds: ray.data.Dataset,
    *,
    target_col: str,
    horizon: int,
    time_col: str,
    out_col: Optional[str] = None,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """MODE_MULTI_TARGET expanded targets over the GLOBAL time order
    (no entity key): per row, the list<float64> of the next ``horizon``
    target values; the last ``horizon`` rows of the series drop.

    Same adaptive plan as ``shift_column_global``: one worker task
    below ``single_task_threshold``, else a distributed sort + the
    block-boundary head exchange (each block needs only its ``horizon``
    successor values — never another full block)."""
    if horizon <= 0:
        raise ValueError("expand_targets_global: horizon must be > 0")
    out_col = out_col or f"{target_col}_seq_{horizon}"

    def _window_lists(vals: np.ndarray, n_keep: int) -> pa.ListArray:
        # vectorized: row i's window = vals[i+1 : i+1+horizon]; callers
        # guarantee vals has >= n_keep + horizon entries
        if n_keep <= 0:
            return pa.ListArray.from_arrays(
                pa.array([0], type=pa.int32()), pa.array([], type=pa.float64()))
        win = np.lib.stride_tricks.sliding_window_view(vals, horizon)[1 : n_keep + 1]
        flat = np.ascontiguousarray(win).ravel()
        offsets = np.arange(0, (n_keep + 1) * horizon, horizon, dtype=np.int32)
        return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.float64()))

    total = ds.count()
    if total is not None and total <= single_task_threshold:
        def local(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.sort_values(time_col, kind="mergesort")
            vals = out[target_col].to_numpy(dtype=np.float64)
            n_keep = max(0, len(out) - horizon)
            out = out.iloc[:n_keep].copy()
            out[out_col] = _window_lists(vals, n_keep).to_pylist()
            return out

        return ds.repartition(1).map_batches(local, batch_size=None, batch_format="pandas")

    sorted_ds = ds.sort(time_col).materialize()
    heads_ref = _collect_block_heads(sorted_ds, time_col, target_col, horizon)

    def expand_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], type=pa.list_(pa.float64())))
        extra = _successor_values(batch, heads_ref, time_col, target_col, horizon)
        vals = np.concatenate([
            batch.column(target_col).to_numpy(zero_copy_only=False).astype(np.float64),
            extra,
            np.full(horizon, np.nan),  # sliding-window slack; kept rows never read it
        ])
        # row i keeps iff its whole horizon exists: i + horizon <= num_rows + len(extra) - 1
        n_keep = min(batch.num_rows, batch.num_rows + len(extra) - horizon)
        n_keep = max(0, n_keep)
        out = batch.slice(0, n_keep)
        return out.append_column(out_col, _window_lists(vals, n_keep))

    return sorted_ds.map_batches(expand_block, batch_size=None, batch_format="pyarrow")


class SingleStepTargetShifter:
    """sklearn-style shifter over ``TemporalDataset`` / ``ray.data.Dataset``.

    API parity with the reference (``single_step.py:33-544``): ``fit`` /
    ``transform`` / ``fit_transform``; ``n_lags`` leads the target by
    ``n`` steps, row count shrinks by exactly ``n_lags`` per ordered
    series, output target renamed ``{target}_shift_{n}``; error
    messages verbatim.

    ``mode=MODE_MULTI_TARGET`` implements the seq2seq semantics the
    reference documents but never ships (core_utils.py:40-72): the
    target becomes the VECTOR of the next ``n_lags`` values
    (list<float64> column ``{target}_seq_{n}``, shape
    (num_samples, sequence_length)); the last ``n_lags`` rows per
    ordered series drop, preserving the zero-leakage contract.
    ``tiebreak`` columns extend the per-entity time sort key for
    deterministic output under duplicate (id, time) pairs.
    """

    def __init__(
        self,
        target_col: Optional[str] = None,
        n_lags: int = 1,
        drop_target: bool = True,
        verbose: bool = False,
        mode: str = MODE_SINGLE_TARGET,
        num_buckets: int = grouped.DEFAULT_NUM_BUCKETS,
        tiebreak: Optional[list[str]] = None,
        single_task_threshold: Optional[int] = None,
    ):
        if n_lags <= 0:
            raise ValueError("`n_lags` must be greater than 0")
        if mode not in VALID_MODES:
            raise ValueError(f"Invalid mode '{mode}'. Must be one of {VALID_MODES}.")
        self.target_col = target_col
        self.n_lags = n_lags
        self.drop_target = drop_target
        self.verbose = verbose
        self.mode = mode
        self.num_buckets = num_buckets
        self.tiebreak = tiebreak
        self.single_task_threshold = single_task_threshold

    def fit(self, X: Union[TemporalDataset, ray.data.Dataset], y=None) -> "SingleStepTargetShifter":
        if isinstance(X, TemporalDataset):
            if self.target_col is None:
                self.target_col = X.target_col
        elif isinstance(X, ray.data.Dataset):
            if self.target_col is not None and self.target_col not in X.schema().names:
                raise ValueError(f"Column '{self.target_col}' does not exist in DataFrame")
        if self.target_col is None:
            raise ValueError("target_col must be set before transform (call fit first)")
        return self

    def transform(
        self, X: Union[TemporalDataset, ray.data.Dataset], y=None
    ) -> Union[TemporalDataset, ray.data.Dataset]:
        if self.target_col is None:
            raise ValueError("target_col must be set before transform (call fit first)")
        is_td = isinstance(X, TemporalDataset)
        ds = X.ds if is_td else X
        time_col = X.time_col if is_td else None
        id_col = X.id_col if is_td else None

        rows_before = ds.count()
        if rows_before == 0:
            raise ValueError("Cannot transform empty DataFrame")

        if self.mode == MODE_MULTI_TARGET:
            return self._transform_multi_target(X, ds, time_col, id_col, rows_before)
        out_col = f"{self.target_col}_shift_{self.n_lags}"
        if id_col is not None:
            shifted = shift_column_per_entity(
                ds,
                value_col=self.target_col,
                id_col=id_col,
                time_col=time_col,
                n=self.n_lags,
                out_col=out_col,
                num_buckets=self.num_buckets,
                tiebreak=self.tiebreak,
            )
        elif time_col is not None:
            kw = {} if self.single_task_threshold is None else {
                "single_task_threshold": self.single_task_threshold}
            shifted = shift_column_global(
                ds, value_col=self.target_col, time_col=time_col, n=self.n_lags, out_col=out_col,
                **kw,
            )
        else:
            # bare Dataset: the reference shifts the frame in its
            # CURRENT order (single_step.py:290-295). Coalesce to one
            # worker task and shift in received order under
            # preserve_order — set on THIS dataset lineage's context
            # (not the process global), so later pipelines don't pay
            # ordered-execution cost (small-data semantics; wrap large
            # data in a TemporalDataset for the distributed paths).
            ds.context.execution_options.preserve_order = True
            n, ocol, vcol = self.n_lags, out_col, self.target_col

            def local(batch: pd.DataFrame) -> pd.DataFrame:
                out = batch.copy()
                out[ocol] = out[vcol].shift(-n)
                return out[~out[ocol].isna()]

            shifted = ds.repartition(1).map_batches(local, batch_size=None, batch_format="pandas")
        return self._finalize(X, is_td, shifted, rows_before, out_col)

    def _transform_multi_target(self, X, ds: ray.data.Dataset, time_col, id_col, rows_before):
        """MODE_MULTI_TARGET branch: the target becomes the vector of
        the next ``n_lags`` values (list<float64>), routed to the
        per-entity / global / current-order expanded-target stage the
        same way the scalar shift routes."""
        out_col = f"{self.target_col}_seq_{self.n_lags}"
        if id_col is not None:
            shifted = expand_targets_multi_step(
                ds,
                target_col=self.target_col,
                horizon=self.n_lags,
                id_col=id_col,
                time_col=time_col,
                out_col=out_col,
                num_buckets=self.num_buckets,
                tiebreak=self.tiebreak,
            )
        elif time_col is not None:
            kw = {} if self.single_task_threshold is None else {
                "single_task_threshold": self.single_task_threshold}
            shifted = expand_targets_global(
                ds, target_col=self.target_col, horizon=self.n_lags, time_col=time_col,
                out_col=out_col, **kw,
            )
        else:
            # bare Dataset: current order, single task (small-data
            # semantics — same contract as the scalar branch)
            ds.context.execution_options.preserve_order = True
            h, ocol, vcol = self.n_lags, out_col, self.target_col

            def local(batch: pd.DataFrame) -> pd.DataFrame:
                vals = batch[vcol].to_numpy(dtype=np.float64)
                n_keep = max(0, len(batch) - h)
                out = batch.iloc[:n_keep].copy()
                out[ocol] = [vals[i + 1 : i + 1 + h].tolist() for i in range(n_keep)]
                return out

            shifted = ds.repartition(1).map_batches(local, batch_size=None, batch_format="pandas")
        return self._finalize(X, isinstance(X, TemporalDataset), shifted, rows_before, out_col)

    def _finalize(self, X, is_td: bool, shifted: ray.data.Dataset, rows_before: int, out_col: str):
        if self.drop_target:
            shifted = shifted.drop_columns([self.target_col])

        # one execution: pin the (already shrunk) result, then count it
        shifted = shifted.materialize()
        rows_after = shifted.count()
        if rows_after == 0:
            raise ValueError("All rows were dropped during transformation")
        if self.verbose:
            print(f"Rows before: {rows_before}; Rows after: {rows_after}; Dropped: {rows_before - rows_after}")

        if is_td:
            return TemporalDataset(
                shifted,
                time_col=X.time_col,
                target_col=out_col,
                id_col=X.id_col,
                mode=self.mode,
                ascending=X.ascending,
                sort=False,
                validate=False,
            )
        return shifted

    def fit_transform(self, X, y=None):
        return self.fit(X).transform(X)


def expand_targets_multi_step(
    ds: ray.data.Dataset,
    *,
    target_col: str,
    horizon: int,
    id_col: str,
    time_col: str,
    out_col: Optional[str] = None,
    num_buckets: int = grouped.DEFAULT_NUM_BUCKETS,
    tiebreak: Optional[list[str]] = None,
) -> ray.data.Dataset:
    """MODE_MULTI_TARGET expanded targets (T5): per row, the vector of the
    next ``horizon`` target values within the entity (list<float64>
    column); the last ``horizon`` rows per entity are dropped.

    The reference documents but never implements this
    (core_utils.py:61-72); semantics follow that documentation.
    ``tiebreak`` columns extend the per-entity sort key — required for
    deterministic output when (id, time) pairs can repeat.
    """
    out_col = out_col or f"{target_col}_seq_{horizon}"
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[id_col].to_numpy()
        segs = grouped.entity_segments(keys)
        vals = g[target_col].to_numpy(dtype=np.float64)
        n = len(g)
        if n == 0:
            g = g.copy()
            g[out_col] = []
            return g
        # vectorized: seq[i] = vals[i+1 : i+1+horizon]; keep rows whose
        # whole horizon stays inside the entity segment
        lens = np.diff(segs)
        seg_id = np.repeat(np.arange(len(lens)), lens)
        windows = np.lib.stride_tricks.sliding_window_view(
            np.concatenate([vals, np.full(horizon, np.nan)]), horizon
        )[1 : n + 1]
        keep = np.zeros(n, dtype=bool)
        if n > horizon:
            keep[:-horizon] = seg_id[:-horizon] == seg_id[horizon:]
        g = g.copy()
        g[out_col] = list(windows)
        g = g[keep]
        g[out_col] = g[out_col].map(lambda w: w.tolist())
        return g

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)
