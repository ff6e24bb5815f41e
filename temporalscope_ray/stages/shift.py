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

from ..core import MODE_SINGLE_TARGET
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
    single_task_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """Global-order lead over the total time order.

    Adaptive execution: below ``single_task_threshold`` rows the whole
    series is processed by ONE worker task (coalesce + in-task pandas
    sort/shift) — a distributed range-partition sort costs ~3x a local
    sort at single-node scale, so small series take the local path
    (matching the reference's single-node throughput). Above the
    threshold: distributed sort + block-boundary exchange — only the
    first ``n`` rows of every sorted block travel to the driver.
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

    # pass 1: head rows + a per-block signature (start value, row count,
    # checksum of the head values). The signature identifies MY block in
    # pass 2 so only my own heads are excluded — excluding by start
    # value alone would wrongly drop a successor block that happens to
    # start with the same (duplicate) timestamp. NOTE: when duplicate
    # timestamps span a block boundary, the global order among the ties
    # is one valid sort order, not a canonical one (same as any
    # unstable distributed sort); provide a unique time key for strict
    # determinism.
    def _blk_sig(batch: pa.Table) -> tuple:
        k = min(n, batch.num_rows)
        head_vals = batch.column(value_col).slice(0, k).to_numpy(zero_copy_only=False)
        return (
            batch.column(time_col)[0].as_py(),
            batch.num_rows,
            float(np.nansum(head_vals)),
        )

    def head_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = batch.select([time_col, value_col])
            return t.append_column("__blk_sig__", pa.array([], type=pa.string()))
        k = min(n, batch.num_rows)
        head = batch.select([time_col, value_col]).slice(0, k)
        sig = repr(_blk_sig(batch))
        return head.append_column("__blk_sig__", pa.array([sig] * k, type=pa.string()))

    heads = sorted_ds.map_batches(head_rows, batch_size=None, batch_format="pyarrow").to_pandas()
    heads = heads.sort_values([time_col]).reset_index(drop=True)
    heads_ref = ray.put(heads)

    # pass 2: shift inside each block with successor head rows appended
    def shift_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], type=pa.float64()))
        h: pd.DataFrame = ray.get(heads_ref)
        my_sig = repr(_blk_sig(batch))
        last = batch.column(time_col)[batch.num_rows - 1].as_py()
        # successor rows: head rows at/after my last ts, in time order,
        # excluding exactly my own block's heads (full signature match)
        succ = h[(h["__blk_sig__"] != my_sig) & (h[time_col] >= last)].sort_values(time_col)
        extra = succ[value_col].to_numpy(dtype=np.float64)[: n]
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


class SingleStepTargetShifter:
    """sklearn-style shifter over ``TemporalDataset`` / ``ray.data.Dataset``.

    API parity with the reference (``single_step.py:33-544``): ``fit`` /
    ``transform`` / ``fit_transform``; ``n_lags`` leads the target by
    ``n`` steps, row count shrinks by exactly ``n_lags`` per ordered
    series, output target renamed ``{target}_shift_{n}``; error
    messages verbatim.
    """

    def __init__(
        self,
        target_col: Optional[str] = None,
        n_lags: int = 1,
        drop_target: bool = True,
        verbose: bool = False,
        mode: str = MODE_SINGLE_TARGET,
        num_buckets: int = grouped.DEFAULT_NUM_BUCKETS,
    ):
        if n_lags <= 0:
            raise ValueError("`n_lags` must be greater than 0")
        self.target_col = target_col
        self.n_lags = n_lags
        self.drop_target = drop_target
        self.verbose = verbose
        self.mode = mode
        self.num_buckets = num_buckets

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
            )
        elif time_col is not None:
            shifted = shift_column_global(
                ds, value_col=self.target_col, time_col=time_col, n=self.n_lags, out_col=out_col
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
