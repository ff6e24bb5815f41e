"""Windowed per-entity feature engineering: lag/lead, rolling windows,
backfill, sessionization — the north rule's ST3 stage.

All operators ride the canonical entity-bucket shuffle
(``grouped.grouped_ordered_map``): one hash exchange co-locates whole
entities, then vectorized pandas/numpy kernels run over the
``(entity, ts)``-sorted bucket. Per-entity segment boundaries come from
``grouped.entity_segments`` so no kernel ever crosses entities —
the distributed generalization of the reference's
sort-then-positional-expression pattern
(`/root/reference/src/temporalscope/core/core_utils.py:1151-1207`,
`.../target_shifters/single_step.py:290-295`) with the same
zero-temporal-leakage guarantee: every derived feature at row *t* reads
only rows with ``ts <= t`` within the same entity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import grouped


def _ts_quantile_bounds(samp: pd.DataFrame, key: str, ts_col: str, chunks_per_hot) -> dict:
    """Per-hot-entity chunk boundaries: interior ts quantiles of the
    entity's sampled timestamps (dtype-preserving for datetime64).

    ``chunks_per_hot`` is an int (same split for every entity — legacy)
    or a dict ``entity -> chunk count`` so each hot entity is split
    proportionally to its OWN row count: sizing every entity to the
    largest one multiplies the hot group count (and with it pass-1
    summaries, carry-map size, and per-group dispatch overhead) by up
    to ``max_chunks`` for entities that needed 2."""
    bounds: dict = {}
    for ent, sub in samp.groupby(key):
        k = chunks_per_hot.get(ent, 2) if isinstance(chunks_per_hot, dict) else chunks_per_hot
        ts_np = sub[ts_col].to_numpy()
        is_dt = ts_np.dtype.kind == "M"
        vals = ts_np.view("int64") if is_dt else ts_np.astype(np.float64)
        qs = np.quantile(vals, np.linspace(0, 1, k + 1)[1:-1]) if len(vals) else np.array([])
        qs = np.unique(qs)
        bounds[ent] = qs.astype("int64").view(ts_np.dtype) if is_dt else qs
    return bounds


_REF_CACHE: dict = {}


def _cached_get(ref):
    """Worker-local cache around ``ray.get`` for per-plan broadcast refs.

    ``ray.get`` of a plasma object DESERIALIZES it on every call; the
    chunked dispatch calls it once per hot group, so at 1.5k hot chunks
    the carry map (itself 1.5k pickled frames) was unpickled 1.5k times
    per partition — a quadratic 770 CPU-s on a 64M-row probe. One
    deserialize per worker process is the right cost. Bounded: a plan
    broadcasts a handful of refs; 32 entries is plenty."""
    key = ref.binary()
    hit = _REF_CACHE.get(key)
    if hit is None:
        import ray as _r

        if len(_REF_CACHE) >= 32:
            _REF_CACHE.pop(next(iter(_REF_CACHE)))
        hit = _REF_CACHE[key] = _r.get(ref)
    return hit


def _chain_entity(sub: pd.DataFrame, *, session_gap, carry_back: int, carry_fwd: int):
    """Chain ONE entity's per-chunk pass-1 summaries into effective
    tail/head carries and cumulative session offsets. Returns
    ``(chunks, tails, heads, offsets)`` keyed by chunk id."""
    import pickle

    sub = sub.sort_values("__chunk__")
    eff_tail = pickle.loads(sub["tail_blob"].iloc[0]).head(0)  # empty, right schema
    off = 0
    prev_last = None
    tails, offs = {}, {}
    for _, row in sub.iterrows():
        c = int(row["__chunk__"])
        tails[c] = eff_tail
        offs[c] = off
        boundary = 0
        if session_gap is not None and prev_last is not None:
            gv = session_gap
            if isinstance(gv, pd.Timedelta):
                gv = np.timedelta64(gv.to_timedelta64())
            boundary = int((row["first_ts"] - prev_last) > gv)
        off = off + boundary + int(row["internal_breaks"])
        eff_tail = pd.concat([eff_tail, pickle.loads(row["tail_blob"])]).tail(carry_back)
        prev_last = row["last_ts"]
    heads = {}
    eff_head = pickle.loads(sub["head_blob"].iloc[0]).head(0)
    for _, row in sub.iloc[::-1].iterrows():
        c = int(row["__chunk__"])
        heads[c] = eff_head
        eff_head = pd.concat([pickle.loads(row["head_blob"]), eff_head]).head(carry_fwd)
    chunks = sorted(tails)
    return chunks, tails, heads, offs

# Per-(block, entity, chunk) session-run cap for the combiner pass-1:
# time- or entity-clustered layouts (any real log) have a handful of
# runs per block-group; an adversarially scattered layout can approach
# one run per row, where the partial would be data-sized — overflow
# falls back to the exchange pass, which is layout-independent.
_PASS1_RUN_CAP = 512

_ROLL_FNS = {"mean", "sum", "min", "max", "std", "count", "median"}
_FAST_ROLL_FNS = {"mean", "sum", "count", "std", "min", "max"}
# min/max go vectorized only while window·n passes beat a deque; above
# this the pandas fallback wins
_MINMAX_FAST_MAX_WINDOW = 32


def _seg_rolling_minmax(v: np.ndarray, seg_id: np.ndarray, window: int, fn: str) -> np.ndarray:
    """Trailing rolling min/max as ``window`` shifted fmin/fmax passes —
    segment-safe (shift never crosses entities) and NaN-correct
    (``fmax(NaN, x) = x``: a window is NaN only when every observation
    is, pandas ``min_periods=1`` semantics). O(n·window) vectorized,
    which beats the per-group pandas deque for small windows."""
    op = np.fmax if fn == "max" else np.fmin
    out = v.astype(np.float64, copy=True)
    for j in range(1, window):
        out = op(out, _seg_shift(v, seg_id, j))
    return out


def _seg_rolling_std(v, sx, sxx, cnt, min_periods: int) -> np.ndarray:
    """Sample std (ddof=1, pandas/SQL STDDEV convention) from the shared
    rolling sums — closed form ``(Σx² − (Σx)²/n)/(n−1)`` clipped at 0
    (the naive form can go a few ulp negative where pandas' stable
    update would give exactly 0). < 2 observations → NaN.

    PRECISION CONTRACT: the absolute std error is bounded by
    ``|offset|·√(2nε)`` where offset is the distance between the
    window's level and the centering point (callers center by the
    batch mean, so offset ≤ the batch's own spread). A window whose
    true std is below that bound reads as cancellation noise — e.g. a
    constant-zero window in a batch whose mean an extreme outlier
    dragged to 20 reads ~1.6e-6 instead of 0 (hypothesis-found). No
    data-independent floor can separate that phantom from a genuine
    std of the same size, so none is applied; Welford (pandas/SQL)
    resolves both exactly, and gates that round at fixed decimals rely
    on window levels staying within a few orders of magnitude of the
    batch mean — true for the gated tables, asserted by the
    hypothesis property test against this exact bound."""
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (sxx - sx * sx / cnt) / (cnt - 1)
        out = np.sqrt(np.clip(var, 0, None))
    out[cnt < max(min_periods, 2)] = np.nan
    return out


# ---------------------------------------------------------------------------
# vectorized segment kernels (no per-group pandas objects — a hot Zipf
# entity bucket with ~1M rows must cost milliseconds, not seconds;
# pandas groupby.rolling was measured as a 15 s straggler task)
# ---------------------------------------------------------------------------


def _segment_ids(segs: np.ndarray) -> np.ndarray:
    """Row -> segment ordinal, from entity_segments offsets."""
    lens = np.diff(segs)
    return np.repeat(np.arange(len(lens), dtype=np.int64), lens)


def _seg_shift(values: np.ndarray, seg_id: np.ndarray, k: int) -> np.ndarray:
    """Per-segment shift by k (k>0 = lag/past, k<0 = lead/future),
    NaN outside the segment. Fully vectorized."""
    n = len(values)
    out = np.full(n, np.nan)
    if n == 0 or k == 0:
        return values.astype(np.float64, copy=True) if k == 0 else out
    a = abs(k)
    if a >= n:
        return out
    if k > 0:
        valid = seg_id[a:] == seg_id[:-a]
        out[a:][valid] = values[:-a][valid]
    else:
        valid = seg_id[:-a] == seg_id[a:]
        out[:-a][valid] = values[a:][valid]
    return out


def _seg_rolling(values: np.ndarray, seg_start: np.ndarray, window: int, min_periods: int = 1):
    """Trailing ROWS-window sum/count per segment via one cumsum:
    ``lo = max(seg_start, i-window+1)``; sum = csum[i] - csum[lo-1].
    NaNs are treated as missing observations (pandas rolling
    semantics): they don't poison later windows, aren't counted, and a
    window of only-NaN yields NaN. Returns (sum, count) float64 arrays
    where count = number of non-NaN observations in the window."""
    n = len(values)
    if n == 0:
        return np.array([]), np.array([])
    valid = ~np.isnan(values)
    filled = np.where(valid, values, 0.0)
    csum = np.concatenate(([0.0], np.cumsum(filled, dtype=np.float64)))
    cvalid = np.concatenate(([0], np.cumsum(valid, dtype=np.int64)))
    idx = np.arange(n, dtype=np.int64)
    lo = np.maximum(seg_start, idx - window + 1)
    s = csum[idx + 1] - csum[lo]
    cnt = (cvalid[idx + 1] - cvalid[lo]).astype(np.float64)
    s = np.where(cnt >= max(1, min_periods), s, np.nan)
    return s, cnt


def _seg_session_ids(ts: np.ndarray, segs: np.ndarray, gap) -> np.ndarray:
    """0-based per-entity session index from gap breaks (vectorized)."""
    n = len(ts)
    breaks = np.zeros(n, dtype=np.int64)
    if n > 1:
        gv = gap
        if isinstance(gv, pd.Timedelta):
            gv = np.timedelta64(gv.to_timedelta64())
        breaks[1:] = (ts[1:] - ts[:-1] > gv).astype(np.int64)
    breaks[segs[:-1]] = 0
    csum = np.cumsum(breaks)
    base = np.repeat(csum[segs[:-1]], np.diff(segs))
    return csum - base


def add_lag_lead_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (),
    leads: Sequence[int] = (),
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Adds ``{col}_lag_{k}`` / ``{col}_lead_{k}`` per entity (nulls at
    segment edges are KEPT — feature semantics, unlike the shifter's
    label semantics which drops them)."""
    order = [time_col, *(tiebreak or [])]
    lags = list(lags)
    leads = list(leads)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        for col in value_cols:
            v = g[col].to_numpy(dtype=np.float64)
            for k in lags:
                out[f"{col}_lag_{k}"] = _seg_shift(v, seg_id, k)
            for k in leads:
                out[f"{col}_lead_{k}"] = _seg_shift(v, seg_id, -k)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_cumulative_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str] = (),
    ops: Sequence[str] = ("cumsum",),
    row_number: Optional[str] = None,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Per-entity expanding-window features over the ``(id, ts)``
    order: ``{col}_{op}`` for op ∈ cumsum|cummax|cummin, plus an
    optional 1-based ``row_number`` column (SQL
    ``ROW_NUMBER() OVER (PARTITION BY id ORDER BY ts)``).

    Values keep their input dtype — int64 inputs accumulate in int64,
    so results are bit-exact against a SQL window-SUM oracle (no float
    association-order noise). One entity-bucket exchange; the cum ops
    are pandas' Cython grouped kernels over the per-bucket segment ids
    (never a Python loop per entity).
    """
    allowed = {"cumsum", "cummax", "cummin"}
    bad = set(ops) - allowed
    if bad:
        raise ValueError(f"add_cumulative_features: unsupported ops {sorted(bad)}")
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        gb = g.groupby(seg_id, sort=False)
        for col in value_cols:
            for op in ops:
                out[f"{col}_{op}"] = gb[col].transform(op)
        if row_number:
            out[row_number] = (gb.cumcount() + 1).astype(np.int64)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def _sql_ntile(rn: np.ndarray, n: np.ndarray, b: int) -> np.ndarray:
    """SQL NTILE(b) from 1-based row numbers ``rn`` and per-row
    partition sizes ``n`` (both arrays — fully vectorized across all
    partitions at once): bucket sizes differ by at most one, EARLIER
    buckets get the extra row (q = n//b, first n%b buckets have q+1
    rows) — reproduced exactly, not approximated with qcut. Partitions
    with fewer rows than buckets put row i in bucket i."""
    q, r = np.divmod(n, b)
    big = r * (q + 1)
    qs = np.maximum(q, 1)
    full = np.where(rn <= big, (rn - 1) // (q + 1) + 1, r + (rn - 1 - big) // qs + 1)
    return np.where(q == 0, rn, full).astype(np.int64)


def add_rank_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    value_col: str,
    methods: Sequence[str] = ("rank",),
    ntile: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity value ranks: ``{col}_rank`` (SQL ``RANK()`` — ties
    share the min rank, gaps after), ``{col}_dense_rank``,
    ``{col}_pct_rank`` (SQL ``PERCENT_RANK() = (rank-1)/(n-1)``, 0 for
    a single-row entity). Rank is order-free within the entity (it
    depends only on values) so the only requirement is entity
    co-location — the same one-exchange bucket plan; nulls rank last
    and keep SQL's behavior of *ranking* (DuckDB ranks NULLS LAST by
    default).

    All three are pandas' Cython grouped rank kernels — no Python loop
    per entity.
    """
    allowed = {"rank", "dense_rank", "pct_rank"}
    bad = set(methods) - allowed
    if bad:
        raise ValueError(f"add_rank_features: unsupported methods {sorted(bad)}")
    if ntile is not None and ntile < 1:
        raise ValueError("add_rank_features: ntile must be >= 1")
    # ntile reads ROW order, so ties need a total order (SQL leaves
    # tie placement implementation-defined; we pin it with tiebreak)
    order = [value_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        gb = g.groupby(seg_id, sort=False)[value_col]
        if "rank" in methods or "pct_rank" in methods:
            r = gb.rank(method="min", na_option="bottom")
            if "rank" in methods:
                out[f"{value_col}_rank"] = r.astype(np.int64)
            if "pct_rank" in methods:
                n = gb.transform("size").to_numpy(dtype=np.float64)
                out[f"{value_col}_pct_rank"] = np.where(
                    n > 1, (r.to_numpy() - 1.0) / np.maximum(n - 1.0, 1.0), 0.0
                )
        if "dense_rank" in methods:
            out[f"{value_col}_dense_rank"] = gb.rank(
                method="dense", na_option="bottom"
            ).astype(np.int64)
        if ntile is not None:
            gobj = g.groupby(seg_id, sort=False)
            rn = (gobj.cumcount() + 1).to_numpy(dtype=np.int64)
            n = gobj[value_col].transform("size").to_numpy(dtype=np.int64)
            out[f"{value_col}_ntile"] = _sql_ntile(rn, n, ntile)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_ewm_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    alpha: float,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Per-entity exponentially-weighted moving average over the
    ``(id, ts)`` order: ``{col}_ewm`` with the recursive
    ``adjust=False`` definition ``e_1 = v_1;
    e_i = (1-alpha)·e_{i-1} + alpha·v_i`` — the zero-leakage smoothing
    feature (reads only the past). NaN observations carry the previous
    EWM forward (pandas ``ignore_na=False`` decay semantics are NOT
    used; missing rows simply don't update). One entity-bucket
    exchange; the kernel is pandas' Cython grouped ewm.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("add_ewm_features: alpha must be in (0, 1]")
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        ew = g.groupby(seg_id, sort=False)[list(value_cols)].ewm(
            alpha=alpha, adjust=False, ignore_na=True
        ).mean()
        res = ew.reset_index(level=0, drop=True)
        for col in value_cols:
            out[f"{col}_ewm"] = res[col].to_numpy()
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_rolling_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    window: int,
    fns: Sequence[str] = ("mean",),
    min_periods: int = 1,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Trailing row-based rolling aggregates per entity:
    ``{col}_roll_{fn}_{window}`` over ``ROWS BETWEEN window-1 PRECEDING
    AND CURRENT ROW`` — the zero-leakage trailing window."""
    bad = set(fns) - _ROLL_FNS
    if bad:
        raise ValueError(f"Unsupported rolling fns: {sorted(bad)}. Supported: {sorted(_ROLL_FNS)}")
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        segs = grouped.entity_segments(g[id_col].to_numpy())
        seg_start = np.repeat(segs[:-1], np.diff(segs))
        fast = set(fns) & _FAST_ROLL_FNS
        if window > _MINMAX_FAST_MAX_WINDOW or min_periods > 1:
            fast -= {"min", "max"}  # deque / min_periods masking beat the shifted passes
        slow = set(fns) - fast
        seg_id = _segment_ids(segs) if {"min", "max"} & fast else None
        for col in value_cols:
            v = g[col].to_numpy(dtype=np.float64)
            if fast:
                s, cnt = _seg_rolling(v, seg_start, window, min_periods)
                if "sum" in fast:
                    out[f"{col}_roll_sum_{window}"] = s
                if "mean" in fast:
                    out[f"{col}_roll_mean_{window}"] = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
                if "count" in fast:
                    out[f"{col}_roll_count_{window}"] = cnt
                if "std" in fast:
                    # std is shift-invariant: centering by the batch mean
                    # kills the (Σx²−(Σx)²/n) cancellation that costs
                    # digits when window-std ≪ batch mean
                    nv = np.count_nonzero(~np.isnan(v))
                    vc = v - (np.nansum(v) / nv) if nv else v
                    sc, _ = _seg_rolling(vc, seg_start, window, min_periods)
                    sxxc, _ = _seg_rolling(vc * vc, seg_start, window, min_periods)
                    out[f"{col}_roll_std_{window}"] = _seg_rolling_std(vc, sc, sxxc, cnt, min_periods)
                for f in ("min", "max"):
                    if f in fast:
                        out[f"{col}_roll_{f}_{window}"] = _seg_rolling_minmax(v, seg_id, window, f)
        if slow:  # large-window min/max fall back to pandas rolling
            roll = g.groupby(id_col, sort=False)[list(value_cols)].rolling(window, min_periods=min_periods)
            for f in sorted(slow):
                res = getattr(roll, f)().reset_index(level=0, drop=True)
                for col in value_cols:
                    out[f"{col}_roll_{f}_{window}"] = res[col]
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_time_rolling_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    window: str | pd.Timedelta,
    fns: Sequence[str] = ("mean",),
    closed: str = "both",
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Trailing TIME-based rolling aggregates per entity:
    ``{col}_troll_{fn}``. Default ``closed="both"`` = SQL
    ``RANGE BETWEEN window PRECEDING AND CURRENT ROW`` (both endpoints
    included); pandas' native default would be ``closed="right"``.

    Duplicate-timestamp semantics match SQL RANGE frames exactly: all
    rows sharing an (entity, ts) are PEERS and see the same window —
    including each other. pandas' time rolling is positional among
    equal timestamps (the first peer would not see the second), an
    order-dependent divergence the adversarial dup-(entity, ts) parity
    sweep caught; the fix broadcasts each peer run's LAST result (whose
    positional window is precisely the RANGE window) to the whole run.
    """
    bad = set(fns) - _ROLL_FNS
    if bad:
        raise ValueError(f"Unsupported rolling fns: {sorted(bad)}. Supported: {sorted(_ROLL_FNS)}")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        idx = g.set_index(time_col)
        roll = idx.groupby(id_col, sort=False)[list(value_cols)].rolling(window, closed=closed)
        ids = g[id_col].to_numpy()
        ts = g[time_col].to_numpy()
        n = len(g)
        # index of the LAST row of each (entity, ts) peer run (g is
        # (entity, ts)-sorted); rows map to their run-end row
        new_run = np.empty(n, dtype=bool)
        if n:
            new_run[0] = True
            new_run[1:] = (ids[1:] != ids[:-1]) | (ts[1:] != ts[:-1])
        run_id = np.cumsum(new_run) - 1 if n else np.array([], dtype=np.int64)
        is_last = np.empty(n, dtype=bool)
        if n:
            is_last[:-1] = new_run[1:]
            is_last[-1] = True
        last_pos = np.flatnonzero(is_last)[run_id] if n else run_id
        for f in fns:
            res = getattr(roll, f)().reset_index(drop=True)
            for col in value_cols:
                out[f"{col}_troll_{f}"] = res[col].to_numpy()[last_pos]
        return out

    return grouped.grouped_ordered_map(ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets)


def backfill(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    method: str = "ffill",
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Per-entity fill of missing values along the time order.

    ``ffill`` propagates the last observed value forward (the
    point-in-time-safe direction: only past values flow to the
    present); ``bfill`` propagates backward (leaks future state — only
    valid for label construction, flagged in the docstring on purpose).
    """
    if method not in ("ffill", "bfill"):
        raise ValueError("method must be 'ffill' or 'bfill'")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        gb = out.groupby(id_col, sort=False)[list(value_cols)]
        out[list(value_cols)] = gb.ffill() if method == "ffill" else gb.bfill()
        return out

    return grouped.grouped_ordered_map(ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets)


def interpolate_linear(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
    suffix: str = "_interp",
) -> ray.data.Dataset:
    """Per-entity linear interpolation of missing values in TIME (not
    row position): a null between two observations gets
    ``v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)``.
    Leading/trailing nulls stay null (no extrapolation). Complements
    ``backfill`` — ffill is the point-in-time-safe gap fill, linear
    interpolation the offline-analysis one (it reads a FUTURE value;
    never use it to build features for training).

    Vectorized across the whole bucket: prev/next-valid row indices
    come from two global monotone accumulates, reset at entity
    boundaries via each row's segment bounds — no per-entity loop.
    Arithmetic is evaluated in SQL's left-to-right order over int64-us
    time deltas so the DuckDB oracle (``epoch_us``-based) reproduces it
    bit-for-bit."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        n = len(g)
        if n == 0:
            for c in value_cols:
                out[f"{c}{suffix}"] = pd.Series([], dtype=np.float64)
            return out
        t = g[time_col].to_numpy()
        tf = t.view("int64").astype(np.float64) if t.dtype.kind in "Mm" else t.astype(np.float64)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        lens = np.diff(segs)
        seg_start = np.repeat(segs[:-1], lens)
        seg_end = np.repeat(segs[1:], lens)
        idx = np.arange(n)
        for c in value_cols:
            v = g[c].to_numpy(dtype=np.float64)
            valid = ~np.isnan(v)
            prev_i = np.maximum.accumulate(np.where(valid, idx, -1))
            nxt = np.where(valid, idx, n)
            next_i = np.minimum.accumulate(nxt[::-1])[::-1]
            has_prev = prev_i >= seg_start
            has_next = next_i < seg_end
            fill = ~valid & has_prev & has_next
            res = v.copy()
            if fill.any():
                p, q = prev_i[fill], next_i[fill]
                # SQL left-to-right order: ((vn - vp) * dt1) / dt2
                res[fill] = v[p] + ((v[q] - v[p]) * (tf[fill] - tf[p])) / (tf[q] - tf[p])
            out[f"{c}{suffix}"] = res
        return out

    return grouped.grouped_ordered_map(
        ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets
    )


def sessionize(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    gap: pd.Timedelta | float | int,
    session_col: str = "session_id",
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Gap-based sessionization: within an entity, a new session starts
    when ``ts - previous_ts > gap``. ``session_col`` is the 0-based
    per-entity session index (int64).

    Equivalent SQL (the DuckDB oracle):
    ``SUM(CASE WHEN ts - LAG(ts) OVER w > gap THEN 1 ELSE 0 END) OVER w``.
    """
    gap_val = gap

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        segs = grouped.entity_segments(g[id_col].to_numpy())
        out = g.copy()
        out[session_col] = _seg_session_ids(g[time_col].to_numpy(), segs, gap_val)
        return out

    return grouped.grouped_ordered_map(ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets)


def add_temporal_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (),
    leads: Sequence[int] = (),
    rolling_windows: Sequence[int] = (),
    rolling_fns: Sequence[str] = ("mean",),
    session_gap=None,
    session_col: str = "session_id",
    label_shift: Optional[dict] = None,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
    total_rows: Optional[int] = None,
    single_task_threshold: int = 2_000_000,
) -> ray.data.Dataset:
    """The flagship composite: lag/lead + rolling + sessionization (+
    optionally the zero-leakage label shift) in ONE entity-bucket pass
    — a single shuffle feeds every kernel over the same sorted bucket,
    instead of one exchange per feature family. Output columns follow
    the individual operators' naming.

    ``label_shift={"value_col": ..., "n": 1, "out_col": ...}`` appends
    the shifter's lead label and drops the tail rows per entity (the
    reference shifter contract, single_step.py:265-301) without a
    second shuffle.

    ``total_rows`` (a caller-supplied hint — e.g. the metadata-only
    parquet count of an untransformed read) lets the bucket pass take
    ``grouped_ordered_map``'s single-task path for small inputs,
    skipping the exchange entirely; see that docstring."""
    num_buckets = grouped.resolve_num_buckets(ds, num_buckets)
    bad = set(rolling_fns) - _ROLL_FNS
    if bad:
        raise ValueError(f"Unsupported rolling fns: {sorted(bad)}. Supported: {sorted(_ROLL_FNS)}")
    order = [time_col, *(tiebreak or [])]
    fn = _flagship_kernel(
        id_col=id_col, time_col=time_col, value_cols=value_cols, lags=lags, leads=leads,
        rolling_windows=rolling_windows, rolling_fns=rolling_fns, session_gap=session_gap,
        session_col=session_col, label_shift=label_shift,
    )
    return grouped.grouped_ordered_map(
        ds, id_col, order, fn, num_buckets=num_buckets,
        total_rows=total_rows, single_task_threshold=single_task_threshold,
    )


def _flagship_kernel(
    *, id_col, time_col, value_cols, lags, leads, rolling_windows, rolling_fns,
    session_gap, session_col, label_shift,
):
    """The per-bucket flagship kernel (lags/leads + rolling + sessions +
    label shift over a ``(entity, ts)``-sorted frame) — shared by the
    plain bucket pass and the hot-entity dispatch pass."""
    lags, leads = list(lags), list(leads)
    windows = list(rolling_windows)

    fast = set(rolling_fns) & (_FAST_ROLL_FNS - {"min", "max"})
    mm = set(rolling_fns) & {"min", "max"}
    slow_base = set(rolling_fns) - fast - mm

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        segs = grouped.entity_segments(g[id_col].to_numpy())
        seg_id = _segment_ids(segs)
        seg_start = np.repeat(segs[:-1], np.diff(segs))
        vals = {col: g[col].to_numpy(dtype=np.float64) for col in value_cols}
        for col, v in vals.items():
            for k in lags:
                out[f"{col}_lag_{k}"] = _seg_shift(v, seg_id, k)
            for k in leads:
                out[f"{col}_lead_{k}"] = _seg_shift(v, seg_id, -k)
        for w in windows:
            for col, v in vals.items():
                if fast:
                    s, cnt = _seg_rolling(v, seg_start, w)
                    if "sum" in fast:
                        out[f"{col}_roll_sum_{w}"] = s
                    if "mean" in fast:
                        out[f"{col}_roll_mean_{w}"] = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
                    if "count" in fast:
                        out[f"{col}_roll_count_{w}"] = cnt
                    if "std" in fast:
                        nv = np.count_nonzero(~np.isnan(v))
                        vc = v - (np.nansum(v) / nv) if nv else v
                        sc, _ = _seg_rolling(vc, seg_start, w)
                        sxxc, _ = _seg_rolling(vc * vc, seg_start, w)
                        out[f"{col}_roll_std_{w}"] = _seg_rolling_std(vc, sc, sxxc, cnt, 1)
                if mm and w <= _MINMAX_FAST_MAX_WINDOW:
                    for f in sorted(mm):
                        out[f"{col}_roll_{f}_{w}"] = _seg_rolling_minmax(v, seg_id, w, f)
            slow = slow_base | (mm if w > _MINMAX_FAST_MAX_WINDOW else set())
            if slow:
                roll = g.groupby(id_col, sort=False)[list(value_cols)].rolling(w, min_periods=1)
                for f in sorted(slow):
                    res = getattr(roll, f)().reset_index(level=0, drop=True)
                    for col in value_cols:
                        out[f"{col}_roll_{f}_{w}"] = res[col]
        if session_gap is not None:
            out[session_col] = _seg_session_ids(g[time_col].to_numpy(), segs, session_gap)
        if label_shift is not None:
            n = label_shift.get("n", 1)
            vcol = label_shift["value_col"]
            ocol = label_shift.get("out_col", f"{vcol}_shift_{n}")
            lead = _seg_shift(vals.get(vcol, g[vcol].to_numpy(dtype=np.float64)), seg_id, -n)
            out[ocol] = lead
            out = out[~np.isnan(lead)]
        return out

    return fn


def add_temporal_features_chunked(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    hot_entities: Sequence,
    lags: Sequence[int] = (),
    leads: Sequence[int] = (),
    rolling_windows: Sequence[int] = (),
    rolling_fns: Sequence[str] = ("mean",),
    session_gap=None,
    session_col: str = "session_id",
    label_shift: Optional[dict] = None,
    chunks_per_hot: int = 8,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
    bounds: Optional[dict] = None,
    pass1_mode: str = "auto",
) -> ray.data.Dataset:
    """``add_temporal_features`` with HOT-ENTITY overflow handling — the
    window-family counterpart of the as-of join's right-replication
    (north rule: phash-skewed hot entities).

    The canonical bucket pass assumes an entity fits in one bucket
    task. Entities in ``hot_entities`` (e.g. from
    ``grouped.detect_hot_keys``) instead get CHUNKED by time range into
    ``chunks_per_hot`` independent tasks with boundary carry:

    1. chunk boundaries = ts quantiles from a distributed sample;
    2. pass 1 over (entity, chunk) groups collects each chunk's head /
       tail carry rows (``max(lag, window-1, shift)`` rows — tiny) plus
       per-chunk session-break counts; the driver chains them into
       effective carries and per-chunk session offsets (a
       boundary-exchange, like the global shifter's);
    3. the MAIN pass is still ONE exchange: hot (entity, chunk) pairs
       get dedicated bucket ids above the cold hash range, so a single
       ``groupby(__bucket__)`` shuffle carries cold buckets and hot
       chunks together; the per-group fn dispatches — cold buckets run
       the plain kernel, hot chunks recompute WITH their neighbor
       carries prepended/appended and emit only their own rows,
       sessions offset to the entity-global index.

    Results are row-identical to the unchunked operator (tested with
    one entity ≫ the bucket target)."""
    num_buckets = grouped.resolve_num_buckets(ds, num_buckets)
    import ray as _ray

    hot = sorted(set(hot_entities))
    if not hot:
        return add_temporal_features(
            ds, id_col=id_col, time_col=time_col, value_cols=value_cols, lags=lags, leads=leads,
            rolling_windows=rolling_windows, rolling_fns=rolling_fns, session_gap=session_gap,
            session_col=session_col, label_shift=label_shift, num_buckets=num_buckets, tiebreak=tiebreak,
        )
    order = [time_col, *(tiebreak or [])]
    lags, leads, windows = list(lags), list(leads), list(rolling_windows)
    shift_n = int(label_shift["n"]) if label_shift else 0
    carry_back = max([*lags, *(w - 1 for w in windows), 1 if session_gap is not None else 0, 0])
    carry_fwd = max([*leads, shift_n, 0])
    hot_arr = pa.array(hot)
    hot_ref = _ray.put(hot_arr)

    def split_hot(t: pa.Table):
        """Yield the block's hot rows (schema-metadata-stripped), or
        nothing: empty blocks must not enter the summary exchange — a
        schema-less empty RefBundle intermittently poisons the hash
        aggregator's schema broadcast (observed: finalize sort failing
        on a zero-column block)."""
        mask = pa.compute.is_in(t.column(id_col), value_set=_cached_get(hot_ref))
        sub = t.filter(mask)
        if sub.num_rows:
            yield sub.replace_schema_metadata(None)

    hot_ds = None
    if bounds is None:
        # Legacy path (direct callers without precomputed boundaries):
        # the hot subset is consumed twice before the main pass (boundary
        # sample, pass-1 carry collection); materialize it ONCE into the
        # object store instead of re-running the upstream read+filter per
        # consumer. Bounded by the hot-entity mass — small relative to
        # the corpus, distributed and spillable, never driver-resident.
        hot_ds = ds.map_batches(
            split_hot, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        def sample_ts(t: pa.Table) -> pa.Table:
            sub = t.select([id_col, time_col])
            n = sub.num_rows
            step = max(1, n // 256)
            return sub.take(np.arange(0, n, step))

        samp = hot_ds.map_batches(sample_ts, batch_format="pyarrow").to_pandas()
        bounds = _ts_quantile_bounds(samp, id_col, time_col, chunks_per_hot)
    bounds_ref = _ray.put(bounds)

    def add_chunk(t: pa.Table) -> pa.Table:
        bmap = _cached_get(bounds_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ts = t.column(time_col).to_numpy(zero_copy_only=False)
        chunk = np.zeros(t.num_rows, dtype=np.int32)
        for ent, bs in bmap.items():
            m = ids == ent
            if m.any() and len(bs):
                chunk[m] = np.searchsorted(bs, ts[m], side="right").astype(np.int32)
        return t.append_column("__chunk__", pa.array(chunk)).replace_schema_metadata(None)

    # --- pass 1: per-chunk carries + session metadata (tiny output) ---
    carry_cols = [time_col, *(tiebreak or []), *dict.fromkeys(value_cols)]
    gap_np = None
    if session_gap is not None:
        gap_np = session_gap
        if isinstance(gap_np, pd.Timedelta):
            gap_np = np.timedelta64(gap_np.to_timedelta64())

    def pass1_partial(t: pa.Table):
        """Per-BLOCK combiner partial for pass 1 — no exchange. For each
        (entity, chunk) present in the block: block-local head/tail carry
        rows, row count, ts extrema, and the block-local SESSION RUNS
        (maximal ≤gap subsequences, stored as [start_ts, end_ts]
        intervals). Heads/tails/counts merge trivially on the driver;
        session-break counts merge EXACTLY by gap-closure interval
        merging — a run guarantees a ≤gap-dense chain over its interval,
        so sessionizing the union of any partials equals merging their
        run intervals with the same gap tolerance, for ANY row layout.
        Partial SIZE is the only layout risk (an adversarially scattered
        layout can have ~one run per row), so a run-count cap marks the
        group for fallback to the exchange pass."""
        import pickle

        mask = pa.compute.is_in(t.column(id_col), value_set=_cached_get(hot_ref))
        sub = t.filter(mask)
        if not sub.num_rows:
            return
        bmap = _cached_get(bounds_ref)
        need = list(dict.fromkeys([id_col, *carry_cols]))
        df = sub.select(need).to_pandas()
        ids = df[id_col].to_numpy()
        tsv = df[time_col].to_numpy()
        chunk = np.zeros(len(df), dtype=np.int32)
        for ent, bs in bmap.items():
            m = ids == ent
            if m.any() and len(bs):
                chunk[m] = np.searchsorted(bs, tsv[m], side="right").astype(np.int32)
        df["__chunk__"] = chunk
        recs = []
        for (ent, c), g in df.groupby([id_col, "__chunk__"], sort=False):
            g = g.sort_values(order, kind="mergesort")
            gts = g[time_col].to_numpy()
            runs_blob = b""
            if gap_np is not None:
                brk = np.flatnonzero((gts[1:] - gts[:-1]) > gap_np)
                if len(brk) + 1 > _PASS1_RUN_CAP:
                    runs_blob = None  # overflow marker → driver falls back
                else:
                    starts = gts[np.r_[0, brk + 1]]
                    ends = gts[np.r_[brk, len(gts) - 1]]
                    runs_blob = pickle.dumps((starts, ends))
            recs.append({
                id_col: ent, "__chunk__": int(c), "n_rows": len(g),
                "first_ts": gts[0], "last_ts": gts[-1],
                "head_blob": pickle.dumps(g.head(carry_fwd)[carry_cols] if carry_fwd
                                          else g.head(0)[carry_cols]),
                "tail_blob": pickle.dumps(g.tail(carry_back)[carry_cols] if carry_back
                                          else g.tail(0)[carry_cols]),
                "runs_blob": runs_blob,
            })
        out = pd.DataFrame(recs)
        yield pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    def pass1_combiner_meta() -> Optional[pd.DataFrame]:
        """Map-only pass 1: collect per-block partials, merge per
        (entity, chunk) on the driver into the same summary frame the
        exchange pass produces. Returns None if any block-group
        overflowed the run cap (caller falls back to the exchange)."""
        import pickle

        src = hot_ds if hot_ds is not None else ds
        parts = src.map_batches(
            pass1_partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        if parts.empty:
            return pd.DataFrame(columns=[id_col, "__chunk__", "n_rows", "first_ts",
                                         "last_ts", "internal_breaks", "head_blob", "tail_blob"])
        if gap_np is not None and parts["runs_blob"].isna().any():
            return None
        rows = []
        for (ent, c), sub in parts.groupby([id_col, "__chunk__"], sort=False):
            brk = 0
            if gap_np is not None:
                loaded = [pickle.loads(b) for b in sub["runs_blob"]]
                starts = np.concatenate([r[0] for r in loaded])
                ends = np.concatenate([r[1] for r in loaded])
                o = np.argsort(starts, kind="stable")
                starts, ends = starts[o], ends[o]
                cummax_end = np.maximum.accumulate(ends)
                brk = int((starts[1:] - cummax_end[:-1] > gap_np).sum())
            head = pd.concat([pickle.loads(b) for b in sub["head_blob"]], ignore_index=True)
            tail = pd.concat([pickle.loads(b) for b in sub["tail_blob"]], ignore_index=True)
            rows.append({
                id_col: ent, "__chunk__": int(c), "n_rows": int(sub["n_rows"].sum()),
                "first_ts": sub["first_ts"].min(), "last_ts": sub["last_ts"].max(),
                "internal_breaks": brk,
                "head_blob": pickle.dumps(head.sort_values(order, kind="mergesort").head(carry_fwd)),
                "tail_blob": pickle.dumps(tail.sort_values(order, kind="mergesort").tail(carry_back)),
            })
        return pd.DataFrame(rows)

    def pass1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        ts = g[time_col].to_numpy()
        brk = 0
        if session_gap is not None and len(g) > 1:
            gv = session_gap
            if isinstance(gv, pd.Timedelta):
                gv = np.timedelta64(gv.to_timedelta64())
            brk = int((ts[1:] - ts[:-1] > gv).sum())
        head = g.head(carry_fwd)[carry_cols] if carry_fwd else g.head(0)[carry_cols]
        tail = g.tail(carry_back)[carry_cols] if carry_back else g.tail(0)[carry_cols]
        import pickle

        out = pd.DataFrame([{
            id_col: g[id_col].iloc[0], "__chunk__": int(g["__chunk__"].iloc[0]),
            "n_rows": len(g), "first_ts": ts[0], "last_ts": ts[-1], "internal_breaks": brk,
            "head_blob": pickle.dumps(head), "tail_blob": pickle.dumps(tail),
        }])
        # clean Arrow out: pandas-origin schema metadata in the summary
        # exchange triggers the aggregators' mixed-schema slow path
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    # Pass-1 strategy. "combiner" (default via "auto"): ONE map-only
    # scan emits per-block partials and the driver merges them — no
    # exchange at all (measured: the exchange pass-1 was ~40% as costly
    # as the main pass and scaled at 0.43 efficiency, being
    # latency-bound). "exchange": groupby((entity, chunk)) over the hot
    # subset — the scalable path when the driver merge would be large
    # (partial count ≈ blocks × hot chunks), selected automatically for
    # huge inputs and on run-cap overflow. Two other designs were
    # rejected with measurements: (a) a rendezvous actor pass-2 blocks
    # on — blocked ray.get releases CPU slots, oversubscribing narrow
    # sessions (dishonest scaling); (b) carries as rows through a
    # summaries→chain→union dataflow in ONE plan — three concurrent
    # hash-shuffle aggregator pools starve the maps (20.6→34 s @16).
    meta = None
    if pass1_mode != "exchange":
        rows_hint = grouped.cheap_row_count(ds)
        if pass1_mode == "combiner" or (rows_hint is not None and rows_hint <= 512_000_000):
            meta = pass1_combiner_meta()
    if meta is None:
        if hot_ds is None:
            hot_ds = ds.map_batches(split_hot, batch_format="pyarrow", zero_copy_batch=True)
        chunked = hot_ds.map_batches(add_chunk, batch_format="pyarrow", zero_copy_batch=True)
        meta = chunked.groupby([id_col, "__chunk__"]).map_groups(
            pass1, batch_format="pandas"
        ).to_pandas()
    carries: dict = {}
    offsets: dict = {}
    for ent, sub in meta.groupby(id_col):
        e_chunks, e_tails, e_heads, e_offs = _chain_entity(
            sub, session_gap=session_gap, carry_back=carry_back, carry_fwd=carry_fwd
        )
        for c in e_chunks:
            carries[(ent, c)] = (e_tails[c], e_heads[c])
            offsets[(ent, c)] = e_offs[c]
    carry_ref = _ray.put((carries, offsets))

    # pass2 emits only sum/mean/count from the cumsum kernel; everything
    # else (std/min/max/median) takes the pd.Series fallback — chunk
    # frames are bounded (~chunk_target_rows), so the fallback is cheap
    # here, and this keeps the emit list and the split in one place
    fast = set(rolling_fns) & {"sum", "mean", "count"}
    slow = set(rolling_fns) - fast

    # --- pass 2: recompute with carries, emit own rows only ---
    def pass2(g: pd.DataFrame) -> pd.DataFrame:
        carries_m, offsets_m = _cached_get(carry_ref)
        ent = g[id_col].iloc[0]
        c = int(g["__chunk__"].iloc[0])
        drop = [col for col in ("__chunk__", grouped.BUCKET_COL) if col in g.columns]
        g = g.drop(columns=drop).sort_values(order, kind="mergesort").reset_index(drop=True)
        tail, head = carries_m.get((ent, c), (g.head(0), g.head(0)))
        sess_offset = offsets_m.get((ent, c), 0)
        n_tail, n_own = len(tail), len(g)
        full = pd.concat([tail, g[carry_cols], head], ignore_index=True)
        out = g.copy()
        ts = full[time_col].to_numpy()
        own = slice(n_tail, n_tail + n_own)
        seg_id = np.zeros(len(full), dtype=np.int64)  # one entity
        seg_start = np.zeros(len(full), dtype=np.int64)
        for col in dict.fromkeys(value_cols):
            v = full[col].to_numpy(dtype=np.float64)
            for k in lags:
                out[f"{col}_lag_{k}"] = _seg_shift(v, seg_id, k)[own]
            for k in leads:
                out[f"{col}_lead_{k}"] = _seg_shift(v, seg_id, -k)[own]
            for w in windows:
                if fast:
                    s, cnt = _seg_rolling(v, seg_start, w)
                    if "sum" in fast:
                        out[f"{col}_roll_sum_{w}"] = s[own]
                    if "mean" in fast:
                        out[f"{col}_roll_mean_{w}"] = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)[own]
                    if "count" in fast:
                        out[f"{col}_roll_count_{w}"] = cnt[own]
                for f in sorted(slow):
                    r = getattr(pd.Series(v).rolling(w, min_periods=1), f)().to_numpy()
                    out[f"{col}_roll_{f}_{w}"] = r[own]
        if session_gap is not None:
            segs = np.array([0, len(full)], dtype=np.int64)
            sess = _seg_session_ids(ts, segs, session_gap)
            # subtract breaks inside the TAIL carry (sess at the tail's
            # last row), not sess[own][0] — the boundary break between
            # chunk c-1 and c belongs to the own rows' session index
            sess_tail_end = sess[n_tail - 1] if n_tail else 0
            out[session_col] = sess[own] - sess_tail_end + sess_offset
        if label_shift is not None:
            n = label_shift.get("n", 1)
            vcol = label_shift["value_col"]
            ocol = label_shift.get("out_col", f"{vcol}_shift_{n}")
            lead = _seg_shift(full[vcol].to_numpy(dtype=np.float64), seg_id, -n)[own]
            out[ocol] = lead
            out = out[~np.isnan(lead)]
        return out

    # --- main pass: ONE exchange for cold buckets AND hot chunks ---
    # Hot (entity, chunk) pairs get dedicated bucket ids ABOVE the cold
    # range, so a single groupby("__bucket__") shuffle co-locates cold
    # entities per hash bucket and each hot chunk in its own task; the
    # per-group function dispatches on the ``__chunk__`` marker. (Two
    # parallel DATA-sized sort exchanges in one DAG — the previous
    # cold.union(hot) design — thrash the streaming executor: measured
    # 52 s where the single exchange runs the same work in ~25 s.)
    # Per-entity bucket bases: entity ``ent``'s chunk ``c`` gets bucket
    # ``base[ent] + c``; bases are packed by each entity's ACTUAL chunk
    # count (len(bounds)+1), not a uniform stride — a uniform
    # ``chunks_per_hot`` stride sized to the largest entity wastes the
    # id space and (with per-entity chunk counts) would collide.
    hot_base: dict = {}
    acc = num_buckets
    for ent in hot:
        hot_base[ent] = acc
        acc += len(bounds.get(ent, ())) + 1
    hot_base_ref = _ray.put(hot_base)
    cold_fn = _flagship_kernel(
        id_col=id_col, time_col=time_col, value_cols=value_cols, lags=lags, leads=leads,
        rolling_windows=windows, rolling_fns=rolling_fns, session_gap=session_gap,
        session_col=session_col, label_shift=label_shift,
    )

    def assign(t: pa.Table) -> pa.Table:
        bmap = _cached_get(bounds_ref)
        base = _cached_get(hot_base_ref)
        ids_col = t.column(id_col)
        bucket = grouped.hash_key_column(ids_col, num_buckets)
        chunk = np.full(t.num_rows, -1, dtype=np.int32)
        hot_mask = pa.compute.is_in(ids_col, value_set=_cached_get(hot_ref)).to_numpy(zero_copy_only=False)
        if hot_mask.any():
            ids = ids_col.to_numpy(zero_copy_only=False)
            ts = t.column(time_col).to_numpy(zero_copy_only=False)
            for ent, bs in bmap.items():
                m = ids == ent
                if not m.any():
                    continue
                c = (
                    np.searchsorted(bs, ts[m], side="right").astype(np.int32)
                    if len(bs) else np.zeros(int(m.sum()), dtype=np.int32)
                )
                chunk[m] = c
                bucket[m] = base[ent] + c
        t = t.append_column(grouped.BUCKET_COL, pa.array(bucket, type=pa.int32()))
        return t.append_column("__chunk__", pa.array(chunk))

    def dispatch(g: pd.DataFrame) -> pd.DataFrame:
        if int(g["__chunk__"].iloc[0]) >= 0:
            return pass2(g)
        drop = [col for col in ("__chunk__", grouped.BUCKET_COL) if col in g.columns]
        g = g.drop(columns=drop).sort_values([id_col, *order], kind="mergesort")
        return cold_fn(g)

    tagged = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby(grouped.BUCKET_COL).map_groups(
        dispatch, batch_format="pandas", num_cpus=2
    )


def add_temporal_features_auto(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (),
    leads: Sequence[int] = (),
    rolling_windows: Sequence[int] = (),
    rolling_fns: Sequence[str] = ("mean",),
    session_gap=None,
    session_col: str = "session_id",
    label_shift: Optional[dict] = None,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
    hot_min_rows: int = 250_000,
    chunk_target_rows: int = 250_000,
    max_chunks_per_hot: int = 64,
    detect_on: Optional[ray.data.Dataset] = None,
    detect_sample_rows: Optional[int] = 4_000_000,
    cache_input: str | bool = "auto",
    cache_input_max_bytes: int = 8 << 30,
    pass1_mode: str = "auto",
) -> ray.data.Dataset:
    """Skew-aware ``add_temporal_features``: a cheap counting pre-pass
    (``grouped.detect_hot_keys`` — per-batch partial counts over the
    key column only, then a tiny top-k groupby) finds entities whose
    row count exceeds ``hot_min_rows`` (i.e. would turn one bucket task
    into a straggler) and routes them through the chunked overflow path
    with ``chunks_per_hot`` scaled to the largest entity. Cold data
    takes the normal one-shuffle pass; results are row-identical to the
    unchunked operator.

    ``detect_on`` lets the caller run detection on a cheaper upstream
    dataset (e.g. the raw parquet read before an enrichment join) when
    ``ds`` itself is mid-pipeline — entity row counts are the same.

    Sizing rationale (north rule: phash-skewed hot entities): a bucket
    task costs ~linear in rows, so any entity a few × the mean bucket
    size (= total/num_buckets) serializes the whole stage; at a Zipf
    tail the top entity can hold >10% of the corpus. 250k rows ≈ a
    single-digit-seconds task at measured kernel throughput."""
    kw = dict(
        id_col=id_col, time_col=time_col, value_cols=value_cols, lags=lags, leads=leads,
        rolling_windows=rolling_windows, rolling_fns=rolling_fns, session_gap=session_gap,
        session_col=session_col, label_shift=label_shift, num_buckets=num_buckets, tiebreak=tiebreak,
    )
    # The skew-aware plan consumes the input up to THREE times (detect
    # scan, pass-1 carry collection, main pass) — each consumer re-runs
    # the parquet read+decode. When the decoded input fits a bounded
    # slice of the object store, materialize it ONCE so every consumer
    # reads zero-copy Arrow from plasma instead of re-decoding parquet
    # (measured: the three decodes were ~40% of wall at 4 cpus on a
    # 16M-row table). SIZE-GATED: at 100 TB the gate stays off and the
    # consumers stream from storage, whose bandwidth scales with nodes.
    if cache_input == "auto":
        try:
            nbytes = ds.size_bytes()
        except Exception:
            nbytes = None
        # size_bytes() on an untransformed read estimates IN-MEMORY
        # bytes from sampled blocks; apply a 2x safety margin anyway
        cache_input = nbytes is not None and 2 * nbytes <= cache_input_max_bytes
    if cache_input:
        ds = ds.materialize()
    probe = detect_on if detect_on is not None else ds
    # SAMPLED detection: at 100 TB a full detect scan is an entire extra
    # read of the key column; a hot key by definition spans many blocks,
    # so a bounded randomized-block sample estimates its count at
    # frac × true_count. The threshold gets a 0.5 safety factor (sampling
    # variance), counts are scaled back up for chunk sizing, and a missed
    # key costs ONLY a straggler task — the output is row-identical for
    # ANY hot set (pinned by tests). Documented layout assumption: rows
    # of a hot entity are spread across blocks (true for time-ordered
    # logs); for entity-CLUSTERED storage pass detect_sample_rows=None
    # to keep the exact full scan.
    min_count_eff, scale = hot_min_rows, 1.0
    if detect_sample_rows:
        total = grouped.cheap_row_count(probe)
        if total is not None and total > 2 * int(detect_sample_rows):
            frac = float(detect_sample_rows) / total
            probe = probe.randomize_block_order(seed=17).limit(int(detect_sample_rows))
            min_count_eff = max(64, int(hot_min_rows * frac * 0.5))
            scale = 1.0 / frac
    # prune: drop sub-threshold per-block counts before the driver merge —
    # lossless for layouts up to ~2048 blocks (pigeonhole, see
    # detect_hot_keys); beyond that a too-thinly-spread hot key could be
    # missed, which only costs a straggler task, never correctness.
    # sample_col piggybacks the chunk-boundary ts sample on the SAME
    # scan, so the chunked path needs no second read + materialize.
    # top_k=256: at larger corpora MANY entities clear the row bar; a
    # tight cap leaves true hot entities cold, and each one left cold is
    # a multi-second straggler bucket (measured: a 64M-row Zipf table has
    # >32 entities above 250k rows). The driver merge stays tiny.
    hot_df, samp = grouped.detect_hot_keys(
        probe, id_col, min_count=min_count_eff, top_k=256,
        prune=max(2, min_count_eff // 2048), sample_col=time_col,
    )
    if hot_df.empty:
        return add_temporal_features(ds, **kw)
    # Per-entity chunk counts: split each hot entity by its OWN
    # (scaled) count, not the largest one's — a uniform split sized to
    # the top entity multiplies hot group count (pass-1 summaries,
    # carry-map size, per-group dispatch calls) by up to max_chunks for
    # entities that needed 2.
    per_ent = {
        ent: int(max(2, min(np.ceil(cnt * scale / float(chunk_target_rows)), max_chunks_per_hot)))
        for ent, cnt in zip(hot_df[id_col], hot_df["cnt"])
    }
    bounds = _ts_quantile_bounds(samp, id_col, time_col, per_ent)
    return add_temporal_features_chunked(
        ds, hot_entities=hot_df[id_col].tolist(),
        chunks_per_hot=max(per_ent.values()), bounds=bounds,
        pass1_mode=pass1_mode, **kw
    )


def session_stats(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    gap: pd.Timedelta | float | int,
    value_col: Optional[str] = None,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Sessionize then aggregate one row per (entity, session):
    ``n_events, session_start, session_end`` (+ ``value_sum`` when
    ``value_col`` given). Composition stays inside the SAME bucket pass
    — no second shuffle."""
    gap_val = gap

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        segs = grouped.entity_segments(g[id_col].to_numpy())
        ts = g[time_col].to_numpy()
        sess = _seg_session_ids(ts, segs, gap_val)
        tmp = pd.DataFrame({id_col: g[id_col].to_numpy(), "session_id": sess, time_col: ts})
        aggs = {"n_events": (time_col, "size"), "session_start": (time_col, "min"), "session_end": (time_col, "max")}
        if value_col is not None:
            tmp[value_col] = g[value_col].to_numpy()
        gb = tmp.groupby([id_col, "session_id"], sort=False)
        out = gb.agg(**aggs)
        if value_col is not None:
            # min_count=1: SQL SUM of an all-NULL session is NULL, not 0.0
            out["value_sum"] = gb[value_col].sum(min_count=1)
        return out.reset_index()

    return grouped.grouped_ordered_map(ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets)


def add_interarrival(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    out_col: str = "interarrival_us",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity inter-arrival time: microseconds since the entity's
    previous event (null on each entity's first row) — the canonical
    activity-cadence feature. Exact int64 arithmetic end to end, so the
    SQL replay (``ts_us - lag(ts_us) OVER (PARTITION BY id ORDER BY
    time, tiebreak)``) matches bit-for-bit. One bucket exchange, same
    as every windowed feature.

    Hot-entity note: like the other ``grouped_ordered_map`` consumers,
    a single entity larger than a bucket target serializes its task;
    for phash-skewed data route through the chunked overflow path —
    inter-arrival is exactly ``ts − lag₁(ts)``, so
    ``add_temporal_features_auto(lags=[1], value_cols=[ts_us])`` plus a
    subtraction reproduces it with boundary carry."""
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        d = np.empty(len(g), dtype=np.int64)
        d[1:] = ts_us[1:] - ts_us[:-1]
        d[0] = 0
        first = np.zeros(len(g), dtype=bool)
        first[segs[:-1]] = True
        out[out_col] = pd.array(np.where(first, 0, d), dtype="Int64")
        out.loc[first, out_col] = pd.NA
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_time_to_next(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    out_col: str = "time_to_next_us",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Lead-side cadence: microseconds until the entity's NEXT event
    (null on each entity's last row) — the churn / time-to-event label
    construction. Exact int64; SQL replay ``lead(ts_us) OVER (...) -
    ts_us``. NOTE: unlike every feature here, this column reads the
    FUTURE — it is a LABEL, never an input feature at its own row."""
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        d = np.empty(len(g), dtype=np.int64)
        d[:-1] = ts_us[1:] - ts_us[:-1]
        d[-1] = 0
        last = np.zeros(len(g), dtype=bool)
        last[segs[1:] - 1] = True
        out[out_col] = pd.array(np.where(last, 0, d), dtype="Int64")
        out.loc[last, out_col] = pd.NA
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_rolling_corr(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    x_col: str,
    y_col: str,
    window: int,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Trailing rolling Pearson correlation of two columns per entity
    (``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``) — the
    co-movement feature. SQL ``CORR() OVER`` semantics: a window pair
    counts only when BOTH values are non-null; fewer than 2 pairs or a
    zero-variance side yields null.

    Vectorized over whole buckets: five shared-mask rolling sums via
    the one-cumsum segment kernel (no per-window loop), then the closed
    form ``(nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))``. Consumers
    should quantize (the gate rounds to 6dp) — the oracle's
    incremental-merge covariance and this closed form agree only to
    ulp-level."""
    order = [time_col, *(tiebreak or [])]
    dst = out_col or f"{x_col}_{y_col}_corr_{window}"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        x = g[x_col].to_numpy(dtype=np.float64)
        y = g[y_col].to_numpy(dtype=np.float64)
        valid = ~np.isnan(x) & ~np.isnan(y)
        a = np.where(valid, x, np.nan)
        b = np.where(valid, y, np.nan)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        seg_start = np.repeat(segs[:-1], np.diff(segs))
        sx, n = _seg_rolling(a, seg_start, window, 1)
        sy, _ = _seg_rolling(b, seg_start, window, 1)
        sxy, _ = _seg_rolling(a * b, seg_start, window, 1)
        sxx, _ = _seg_rolling(a * a, seg_start, window, 1)
        syy, _ = _seg_rolling(b * b, seg_start, window, 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            corr = np.where((n >= 2) & (vx > 0) & (vy > 0),
                            cov / np.sqrt(vx * vy), np.nan)
        out[dst] = corr
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_session_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    gap: pd.Timedelta | float | int,
    session_col: str = "session_id",
    pos_col: str = "session_pos",
    since_col: str = "since_session_start_us",
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Session-RELATIVE features in the same single bucket pass as
    sessionization: the 0-based position within the session and the
    exact int64 microseconds since the session's first event — the
    engagement-depth features every behavioral model wants. SQL replay:
    ``row_number() OVER (PARTITION BY id, session ...) - 1`` and
    ``epoch_us(ts) - first_value(epoch_us(ts)) OVER (...)``.

    Hot-entity note: session position/elapsed are prefix quantities, so
    a bucket-overflowing entity needs the chunked boundary-carry path
    (carry = last chunk's session id, internal break count and last
    ts — the same carry ``add_temporal_features_chunked`` threads for
    ``session_gap``); with entity sizes below the bucket target this
    single-exchange form is the cheaper plan."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        ts = g[time_col].to_numpy()
        segs = grouped.entity_segments(g[id_col].to_numpy())
        sid = _seg_session_ids(ts, segs, gap)
        out[session_col] = sid
        # session boundaries: entity change OR session index change
        n = len(g)
        start = np.zeros(n, dtype=bool)
        start[0] = True
        start[segs[1:-1]] = True
        start[1:] |= sid[1:] != sid[:-1]
        sess_start_idx = np.maximum.accumulate(np.where(start, np.arange(n), -1))
        out[pos_col] = np.arange(n, dtype=np.int64) - sess_start_idx
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        out[since_col] = ts_us - ts_us[sess_start_idx]
        return out

    return grouped.grouped_ordered_map(
        ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets
    )


def add_calendar_features(
    ds: ray.data.Dataset,
    *,
    time_col: str,
    prefix: str = "",
) -> ray.data.Dataset:
    """Cyclical calendar encodings — the standard temporal feature set:
    hour-of-day and day-of-week as sin/cos pairs (so midnight≈23:59 and
    Sunday≈Monday are close in feature space), plus the raw hour/dow
    ints and a weekend flag. Zero shuffle, one vectorized pass; numpy
    and SQL trig agree bit-for-bit on these grid inputs (both libm
    doubles — probed), so the gate needs no rounding."""
    hr = f"{prefix}hour"
    dw = f"{prefix}dow"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        t = pd.DatetimeIndex(df[time_col])
        hour = t.hour.to_numpy(dtype=np.float64)
        # ISO day-of-week 1=Mon..7=Sun (DuckDB isodow)
        dow = (t.dayofweek.to_numpy(dtype=np.int64) + 1).astype(np.float64)
        out[hr] = hour.astype(np.int64)
        out[dw] = dow.astype(np.int64)
        out[f"{hr}_sin"] = np.sin(2.0 * np.pi * hour / 24.0)
        out[f"{hr}_cos"] = np.cos(2.0 * np.pi * hour / 24.0)
        out[f"{dw}_sin"] = np.sin(2.0 * np.pi * dow / 7.0)
        out[f"{dw}_cos"] = np.cos(2.0 * np.pi * dow / 7.0)
        out[f"{prefix}is_weekend"] = (dow >= 6.0).astype(np.int64)
        return out

    return ds.map_batches(fn, batch_format="pandas")


def resample_ffill(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    freq: pd.Timedelta | str,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Regularize an irregular series: per entity, emit a fixed-``freq``
    time grid from the entity's first to last event (inclusive, like
    SQL ``generate_series``) carrying the value of the latest event at
    or before each grid point — the constructive counterpart of the
    validator's equidistant checks, and the standard prep before
    fixed-step sequence models. Duplicate ``(id, ts)`` pairs collapse
    to their MAX value first (the as-of state convention, so the result
    is deterministic and matches a SQL ``ASOF JOIN`` on the grid).

    One bucket exchange; grid generation and the fill are vectorized
    (per-entity arange via offsets + one searchsorted over the sorted
    state — no per-grid-point loop)."""
    step = pd.Timedelta(freq)
    step_us = np.int64(step.value // 1000)
    if step_us <= 0:
        raise ValueError("freq must be a positive timedelta")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # collapse duplicate (id, ts) to MAX(value) — deterministic state
        st = g.groupby([id_col, time_col], sort=False)[value_col].max().reset_index()
        st = st.sort_values([id_col, time_col], kind="mergesort")
        ids = st[id_col].to_numpy()
        ts_us = st[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = st[value_col].to_numpy(dtype=np.float64)
        segs = grouped.entity_segments(ids)
        lo = ts_us[segs[:-1]]
        hi = ts_us[segs[1:] - 1]
        n_pts = ((hi - lo) // step_us + 1).astype(np.int64)
        total = int(n_pts.sum())
        ent = np.repeat(np.arange(len(n_pts), dtype=np.int64), n_pts)
        offs = np.concatenate(([0], np.cumsum(n_pts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(offs, n_pts)
        gts = np.repeat(lo, n_pts) + local * step_us
        # per-entity ffill: ONE global searchsorted serves every entity
        # at once by lifting each entity's RELATIVE times (bounded by
        # its own duration) into a disjoint key range: key = ent·span +
        # (t − lo[ent]). span is the longest duration + step, so ranges
        # never overlap; relative keys keep ent·span inside int64 for
        # any realistic bucket (guarded).
        ent_of_state = np.repeat(np.arange(len(n_pts), dtype=np.int64), np.diff(segs))
        span = np.int64((hi - lo).max()) + step_us + 1
        if len(n_pts) * int(span) >= 2**62:
            raise ValueError(
                "resample_ffill: entity-count × duration exceeds the key "
                "space — lower num_buckets or resample coarser")
        key_state = ent_of_state * span + (ts_us - lo[ent_of_state])
        key_grid = ent * span + local * step_us
        pos = np.searchsorted(key_state, key_grid, side="right") - 1
        out = pd.DataFrame({
            id_col: ids[segs[:-1]][ent],
            time_col: gts.astype("datetime64[us]"),
            value_col: vals[pos],
        })
        return out

    return grouped.grouped_ordered_map(ds, id_col, [time_col], fn, num_buckets=num_buckets)


def add_expanding_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    fns: Sequence[str] = ("mean",),
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity EXPANDING statistics over the ``(id, ts)`` order —
    ``{col}_exp_mean`` / ``{col}_exp_std`` (sample std, null below 2
    observations): every row summarizes its entity's entire past
    including itself, the leakage-safe running-profile feature.
    One cumsum pass per statistic (NaN-skipping), centered by the batch
    mean for the std so cancellation never costs digits; SQL replay is
    ``AVG/STDDEV_SAMP(...) OVER (PARTITION BY id ORDER BY ... ROWS
    UNBOUNDED PRECEDING)``."""
    allowed = {"mean", "std"}
    bad = set(fns) - allowed
    if bad:
        raise ValueError(f"add_expanding_features: unsupported fns {sorted(bad)}")
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        segs = grouped.entity_segments(g[id_col].to_numpy())
        seg_id = _segment_ids(segs)
        n_rows = len(g)
        for col in value_cols:
            v = g[col].to_numpy(dtype=np.float64)
            valid = ~np.isnan(v)
            # SEQUENTIAL per-entity prefix sums (Cython grouped cumsum),
            # not csum[i]−csum[entity_start]: the global-cumsum
            # subtraction differs from a SQL engine's in-partition
            # running accumulation by an ulp, which any fixed rounding
            # grid eventually straddles on dyadic means
            sdf = pd.DataFrame({"s": np.where(valid, v, 0.0), "n": valid.astype(np.int64)})
            gb = sdf.groupby(seg_id, sort=False)
            sx = gb["s"].cumsum().to_numpy()
            cnt = gb["n"].cumsum().to_numpy().astype(np.float64)
            if "mean" in fns:
                out[f"{col}_exp_mean"] = np.where(cnt > 0, sx / np.maximum(cnt, 1), np.nan)
            if "std" in fns:
                nv = int(valid.sum())
                vc = v - (np.nansum(v) / nv) if nv else v
                seg_start = np.repeat(segs[:-1], np.diff(segs))
                sc, _ = _seg_rolling(vc, seg_start, n_rows or 1, 1)
                sxxc, _ = _seg_rolling(vc * vc, seg_start, n_rows or 1, 1)
                out[f"{col}_exp_std"] = _seg_rolling_std(vc, sc, sxxc, cnt, 1)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def session_conversion(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    gap: pd.Timedelta | float | int,
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Within-session funnel: one row per (entity, session) with
    ``n_events`` and ``converted`` = 1 iff a ``to_type`` event occurs at
    or after some ``from_type`` event in the SAME session (event order =
    ``(time, tiebreak)``) — the view→purchase conversion measure,
    computed in the same single bucket pass as sessionization.

    Vectorized: saw-``from`` is a running maximum reset at session
    starts (mirroring SQL ``MAX(...) OVER (... ROWS UNBOUNDED
    PRECEDING)``), conversion rows are one boolean AND, and the
    per-session rollup is a grouped any()."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[time_col].to_numpy()
        segs = grouped.entity_segments(g[id_col].to_numpy())
        sid = _seg_session_ids(ts, segs, gap)
        n = len(g)
        start = np.zeros(n, dtype=bool)
        if n:
            start[0] = True
            start[segs[1:-1]] = True
            start[1:] |= sid[1:] != sid[:-1]
        # running "saw from_type" with session resets: segmented cummax
        from_mask = (g[type_col].to_numpy() == from_type).astype(np.int64)
        sess_ord = np.cumsum(start) - 1                   # global session ordinal
        saw_from = pd.Series(from_mask).groupby(sess_ord).cummax().to_numpy()
        conv_row = (g[type_col].to_numpy() == to_type) & (saw_from > 0)
        roll = pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "session_id": sid,
            "__conv__": conv_row.astype(np.int64),
        })
        out = roll.groupby([id_col, "session_id"], sort=False).agg(
            n_events=("__conv__", "size"), converted=("__conv__", "max")
        ).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["converted"] = out["converted"].astype(np.int64)
        return out

    return grouped.grouped_ordered_map(
        ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets
    )


def add_rolling_slope(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    window: int,
    per: str = "h",
    min_time_var: float = 0.01,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Trailing rolling REGRESSION SLOPE of the value against time per
    entity (value units per ``per`` ∈ s|min|h|d) — the local-trend
    feature. SQL ``REGR_SLOPE(y, x) OVER`` semantics: pairs where the
    value is null are excluded; fewer than 2 pairs or zero time
    variance yields null. Same five shared-mask rolling sums as
    ``add_rolling_corr`` (slope is shift-invariant in both arguments,
    so x and y are centered by their batch means to keep the closed
    form ``(nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`` numerically clean —
    epoch-scale x would otherwise lose every digit to cancellation).

    ``min_time_var``: windows whose denominator ``n·Σx² − (Σx)² =
    n²·Var(x)`` (in ``per``² units; shift-invariant, so any engine
    computes the same quantity) falls below this floor yield null — a
    slope fit on near-coincident timestamps is numerically meaningless
    (two events a minute apart extrapolated to units/hour), and it is
    exactly where independent float implementations diverge."""
    scale = {"s": 1e6, "min": 6e7, "h": 3.6e9, "d": 8.64e10}[per]
    order = [time_col, *(tiebreak or [])]
    dst = out_col or f"{value_col}_slope_{window}"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.float64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.float64)
        x = ts_us / scale
        y = g[value_col].to_numpy(dtype=np.float64)
        valid = ~np.isnan(y)
        nx = int(valid.sum())
        xm = x - (x[valid].sum() / nx if nx else 0.0)
        ym = y - (np.nansum(y) / nx if nx else 0.0)
        a = np.where(valid, xm, np.nan)
        b = np.where(valid, ym, np.nan)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        seg_start = np.repeat(segs[:-1], np.diff(segs))
        sx, n = _seg_rolling(a, seg_start, window, 1)
        sy, _ = _seg_rolling(b, seg_start, window, 1)
        sxy, _ = _seg_rolling(a * b, seg_start, window, 1)
        sxx, _ = _seg_rolling(a * a, seg_start, window, 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            out[dst] = np.where((n >= 2) & (den >= min_time_var), num / den, np.nan)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_anomaly_flag(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    window: int,
    k: float = 3.0,
    out_col: str = "is_anomaly",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Rolling z-score anomaly flag: 1 iff ``|x − mean_prior| >
    k·std_prior`` where the statistics come from the PRIOR ``window``
    rows of the same entity (``ROWS BETWEEN window PRECEDING AND 1
    PRECEDING``) — the current row must be excluded, because an
    inclusive window self-masks: with sample std the extreme point's
    own z-score is capped at ``(n−1)/√n`` (≈2.47 for n=8), so an
    inclusive k=3 detector can mathematically NEVER fire. Null where
    the prior window has no defined std (entity firsts, singleton
    history). Composition of the gated rolling kernels + one per-entity
    shift + one vectorized compare. Costs TWO bucket exchanges (the
    rolling pass, then the shift pass — the shift needs entity-complete
    sorted frames again); fold the flag into a custom
    ``grouped_ordered_map`` fn if the extra exchange matters."""
    feats = add_rolling_features(
        ds, id_col=id_col, time_col=time_col, value_cols=[value_col],
        window=window, fns=("mean", "std"), num_buckets=num_buckets,
        tiebreak=tiebreak,
    )
    m, s = f"{value_col}_roll_mean_{window}", f"{value_col}_roll_std_{window}"
    order = [time_col, *(tiebreak or [])]

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        x = g[value_col].to_numpy(dtype=np.float64)
        mu = _seg_shift(g[m].to_numpy(dtype=np.float64), seg_id, 1)
        sd = _seg_shift(g[s].to_numpy(dtype=np.float64), seg_id, 1)
        with np.errstate(invalid="ignore"):
            f = np.abs(x - mu) > k * sd
        out = g.drop(columns=[m, s])
        res = pd.array(f.astype(np.int64), dtype="Int64")
        res[np.isnan(sd) | np.isnan(x)] = pd.NA
        out[out_col] = res
        return out

    # the prior-window shift must see entity-complete sorted frames, so
    # it rides the same grouped pass (feats is already bucket-resident,
    # but a plain map_batches would see arbitrary block boundaries)
    return grouped.grouped_ordered_map(feats, id_col, order, flag, num_buckets=num_buckets)


def _rolling_distinct_codes(codes: np.ndarray, seg_id: np.ndarray, window: int) -> np.ndarray:
    """Trailing distinct-count of factorized codes (−1 = null, never
    counted) over per-segment windows — the pure kernel behind
    ``add_rolling_distinct``; O(window²) vectorized comparisons."""
    cols = [codes.astype(np.float64)]
    for k in range(1, window):
        cols.append(_seg_shift(codes.astype(np.float64), seg_id, k))
    m = np.stack(cols)                      # (window, rows); NaN = out of segment
    m = np.where(np.isnan(m) | (m < 0), -1.0, m)
    valid = m >= 0
    dup = np.zeros_like(valid)
    for j in range(1, window):
        eq = (m[j] == m[:j]) & valid[j] & valid[:j]
        dup[j] = eq.any(axis=0)
    return (valid & ~dup).sum(axis=0).astype(np.int64)


def add_rolling_distinct(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    cat_col: str,
    window: int = 4,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Trailing distinct-category count per entity — "how many different
    event types in the user's last ``window`` rows" (current row
    inclusive), the behavioral-diversity WINDOW feature next to the
    whole-history ``agg.grouped_entropy``. SQL semantics:
    ``COUNT(DISTINCT cat) OVER (PARTITION BY id ORDER BY ... ROWS
    window−1 PRECEDING)`` — nulls never counted, an all-null window
    yields 0 (never null). Exact int64.

    One entity-bucket exchange; per bucket the categories are
    ``pd.factorize``d to int codes once, the window is laid out as
    ``window`` segment-safe shifted code columns, and "distinct" is
    counted as entries with no equal value in any EARLIER column — an
    O(window²) stack of vectorized int comparisons, no per-row Python.
    Designed for the small windows this feature means (≤ ~16); a wide
    window wants a different kernel (sorted dedup per window).
    """
    if window < 1:
        raise ValueError("add_rolling_distinct: window must be >= 1")
    order = [time_col, *(tiebreak or [])]
    dst = out_col or f"{cat_col}_roll_nunique_{window}"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        codes, _ = pd.factorize(g[cat_col], use_na_sentinel=True)  # null -> -1
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        out[dst] = _rolling_distinct_codes(codes, seg_id, window)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def session_paths(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    gap,
    k: int = 3,
    sep: str = ">",
    out_col: str = "path",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """User-journey signatures: one row per (entity, session) holding
    the session's first ``k`` event types joined by ``sep`` (SQL
    ``string_agg`` semantics: null types consume their position slot
    but contribute nothing — no doubled separator). The journey-mining
    primitive: count the paths and you have the top flows, diff them
    across cohorts and you have the behavior drift.

    One entity-bucket exchange; sessionization, within-session row
    numbers and the path concat all run in the SAME pass — the concat
    is ``k`` vectorized masked appends over pivoted type columns, not a
    per-session join loop.
    """
    gap_val = gap
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        segs = grouped.entity_segments(g[id_col].to_numpy())
        sess = _seg_session_ids(g[time_col].to_numpy(), segs, gap_val)
        key = pd.DataFrame({id_col: g[id_col].to_numpy(), "session_id": sess,
                            type_col: g[type_col].to_numpy()})
        rn = key.groupby([id_col, "session_id"], sort=False).cumcount()
        sub = key[rn < k].copy()
        sub["__rn__"] = rn[rn < k]
        w = sub.pivot(index=[id_col, "session_id"], columns="__rn__",
                      values=type_col)
        acc = np.full(len(w), "", dtype=object)
        has = np.zeros(len(w), dtype=bool)
        for i in range(k):
            if i not in w.columns:
                continue
            v = w[i]
            m = v.notna().to_numpy()
            sv = v.fillna("").astype(str).to_numpy(dtype=object)
            acc = np.where(m & has, acc + sep + sv, np.where(m, sv, acc))
            has |= m
        out = w.index.to_frame(index=False)
        out[out_col] = acc
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_cusum(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    target_units: Optional[int] = None,
    slack_units: int = 0,
    scale: float = 100.0,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity one-sided CUSUM change-point score: ``S_t = max(0,
    S_{t-1} + (x_t − target − slack))`` over the entity's ``(ts,
    tiebreak)`` order — the classic sequential drift detector (flag an
    entity when S exceeds a decision threshold h). Uses the prefix
    closed form ``S_t = C_t − min(0, min_{i≤t} C_i)`` with ``C`` the
    running deviation sum, so the recursion is two Cython grouped scans
    (cumsum + cummin), never a per-row loop.

    Exactness: values are quantized to integer units (half-away
    ``sign·floor(|x|·scale+½)``, matching SQL ROUND
    — DuckDB ``ROUND(x*scale, 0)``), so C, the running min, and S are
    all int64 and BIT-exact in any engine; the only float op is the
    final ``S/scale``, one identical division in both. ``target_units``
    defaults to the global mean in units rounded half-away (an exact
    int ratio → identical double → identical floor in both engines);
    null values contribute zero deviation (SQL SUM OVER ignores nulls).

    One combiner pass for the default target + one entity-bucket
    exchange. The reference has no monitoring operators; this joins
    the drift family (PSI, KS) with the *sequential* detector a
    streaming feature platform needs.
    """
    order = [time_col, *(tiebreak or [])]
    dst = out_col or f"{value_col}_cusum"

    if target_units is None:
        def partials(b: pd.DataFrame) -> pd.DataFrame:
            v = b[value_col].to_numpy(dtype=np.float64)
            u = np.sign(v) * np.floor(np.abs(v) * scale + 0.5)
            ok = ~np.isnan(v)
            return pd.DataFrame({"__s__": [int(u[ok].sum())], "__n__": [int(ok.sum())]})

        tot = ds.select_columns([value_col]).map_batches(
            partials, batch_format="pandas").to_pandas().sum()
        if int(tot["__n__"]) == 0:
            raise ValueError(f"add_cusum: no non-null values in '{value_col}'")
        mean_units = float(tot["__s__"]) / float(tot["__n__"])
        target_units = int(np.floor(mean_units + 0.5))
    ref = int(target_units) + int(slack_units)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        v = g[value_col].to_numpy(dtype=np.float64)
        units = np.sign(v) * np.floor(np.abs(v) * scale + 0.5)
        dev = np.where(np.isnan(v), 0, units - ref).astype(np.int64)
        c = pd.Series(dev).groupby(seg_id, sort=False).cumsum().to_numpy()
        m = pd.Series(c).groupby(seg_id, sort=False).cummin().to_numpy()
        out[dst] = (c - np.minimum(m, 0)).astype(np.float64) / scale
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_history_sequence(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    cat_col: str,
    window: int = 5,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-row history sequence: the entity's PREVIOUS ≤``window``
    ``cat_col`` values as a list column, ordered oldest→newest — the
    input constructor for sequence models (next-event prediction,
    session transformers). Strictly-prior frame (``ROWS BETWEEN window
    PRECEDING AND 1 PRECEDING``), so the feature is leakage-free by
    construction; entity firsts get an empty list, never null. Null
    category values are carried as null list elements (SQL ``list()``
    keeps nulls).

    One entity-bucket exchange; per bucket the categories are
    factorized once, the window is laid out as ``window`` segment-safe
    shifted code columns (oldest first), and the lists are materialized
    with ONE row-major masked gather — no per-row Python in the value
    path. Small-window design like ``add_rolling_distinct``.

    The reference's multi-step expanded targets
    (`/root/reference/src/temporalscope/target_shifters/single_step.py`
    semantics, T5) look FORWARD; this is the backward mirror a
    training-data pipeline needs for autoregressive features.
    """
    if window < 1:
        raise ValueError("add_history_sequence: window must be >= 1")
    order = [time_col, *(tiebreak or [])]
    dst = out_col or f"{cat_col}_hist_{window}"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        n = len(g)
        codes, cats = pd.factorize(g[cat_col], use_na_sentinel=True)  # null -> -1
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        if n == 0:
            out[dst] = pd.Series([], dtype=object)
            return out
        # columns oldest -> newest: lag window, ..., lag 1; NaN = out of segment
        m = np.stack([_seg_shift(codes.astype(np.float64), seg_id, k)
                      for k in range(window, 0, -1)], axis=1)
        valid = ~np.isnan(m)
        counts = valid.sum(axis=1)
        flat = m[valid].astype(np.int64)          # row-major: per row oldest first
        cats_arr = np.asarray(cats, dtype=object)
        vals_flat = np.where(flat >= 0, cats_arr[np.maximum(flat, 0)], None)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        out[dst] = pd.Series(
            [vals_flat[bounds[i]:bounds[i + 1]] for i in range(n)],
            index=g.index, dtype=object)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def _decayed_sum(tf: np.ndarray, v: np.ndarray, seg_id: np.ndarray,
                 lam: float, window: int) -> np.ndarray:
    """Fixed-order finite decayed sum (k = 0..window−1 of
    ``exp(−lam·Δt_k)·v_{i−k}`` within segments; null terms contribute
    0) — the pure kernel behind ``add_decayed_sum``. The accumulation
    order (k ascending) is part of the bit-reproducibility contract."""
    acc = np.where(np.isnan(v), 0.0, v)  # k = 0: weight exp(0) = 1
    for k in range(1, window):
        tv = _seg_shift(tf, seg_id, k)
        vv = _seg_shift(v, seg_id, k)
        term = np.exp(-lam * (tf - tv)) * vv
        acc = acc + np.where(np.isnan(term), 0.0, term)
    return acc


def add_decayed_sum(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    halflife_s: float = 3600.0,
    window: int = 8,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Time-decayed recency-weighted sum per entity — the fraud/recsys
    "how much has this user done LATELY" feature for irregularly
    sampled events, where a row-step EWM (``add_ewm_features``) is
    wrong because a 1-minute-ago event and a 1-week-ago event must not
    weigh the same. Each row gets
    ``Σ_{k=0..window−1} 2^(−Δt_k / halflife) · v_{i−k}`` over the
    entity's last ``window`` events (current row weight 1, Δt in wall
    time).

    Truncating at ``window`` events is what makes the result
    BIT-reproducible across engines: the infinite recursion
    ``s = v + s_prev·decay`` has no parallel closed form that doesn't
    overflow ``exp(λ·t)`` over a long stream, while the finite form is
    a fixed-order sum of ``window`` identical double products —
    evaluated here as ``window`` segment-safe shifted passes (no
    per-row Python) in exactly the order the SQL oracle's explicit
    ``+`` chain uses. Rows whose value is null contribute nothing and
    receive a weight-1 zero term (filter nulls upstream if SQL-null
    propagation matters). Weights below ~1e−308 underflow to 0.0
    identically in every IEEE engine.
    """
    order = [time_col, *(tiebreak or [])]
    dst = out_col or f"{value_col}_decay_sum_{window}"
    lam = np.log(2.0) / (halflife_s * 1e6)  # per microsecond

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        v = g[value_col].to_numpy(dtype=np.float64)
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        out[dst] = _decayed_sum(ts_us.astype(np.float64), v, seg_id, lam, window)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_future_event_flag(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    target_type: str,
    horizon_s: float,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Future-window event LABEL: for every row, does the SAME entity
    emit a ``target_type`` event strictly after this row's time and
    within ``horizon_s`` seconds — the standard churn / conversion /
    will-buy-in-7-days target constructor. Exact int64 microsecond
    arithmetic; "strictly after" on µs-quantized timestamps is
    identical to the SQL replay's ``RANGE BETWEEN INTERVAL 1
    MICROSECOND FOLLOWING AND INTERVAL horizon FOLLOWING`` window.
    Like ``add_time_to_next`` this column reads the FUTURE — it is a
    label, never a same-row input feature.

    One entity-bucket exchange; the whole bucket is probed with ONE
    ``searchsorted`` over (segment, relative-time) composite int64 keys
    — the disjoint-key-range trick the resampler uses — so there is no
    per-entity loop (the fallback loop runs only if the composite would
    overflow 63 bits, i.e. pathological time spans). Output is int64
    0/1 (never null: "no future event" is a legitimate 0, exactly the
    churn class).
    """
    order = [time_col, *(tiebreak or [])]
    h_us = np.int64(round(horizon_s * 1e6))
    dst = out_col or f"will_{target_type}_{int(horizon_s)}s"

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        is_t = (g[type_col] == target_type).to_numpy()
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        flag = np.zeros(len(g), dtype=np.int64)
        n = len(g)
        if n and is_t.any():
            rel = ts_us - ts_us.min()
            bits = int(rel.max()).bit_length() + 1   # +1 headroom for rel+h
            n_seg = int(seg_id[-1]) + 1 if n else 0
            if n_seg.bit_length() + bits < 63:
                comp = (seg_id << np.int64(bits)) | rel
                tgt_comp = comp[is_t]                 # sorted: rows sorted by (id, ts)
                tgt_ts = ts_us[is_t]
                tgt_seg = seg_id[is_t]
                pos = np.searchsorted(tgt_comp, comp, side="right")
                has = pos < len(tgt_comp)
                safe = np.minimum(pos, len(tgt_comp) - 1)
                flag = (has & (tgt_seg[safe] == seg_id)
                        & (tgt_ts[safe] <= ts_us + h_us)).astype(np.int64)
            else:  # overflow fallback: per-segment probes
                segs = grouped.entity_segments(g[id_col].to_numpy())
                for s, e in zip(segs[:-1], segs[1:]):
                    tgt = ts_us[s:e][is_t[s:e]]
                    if len(tgt) == 0:
                        continue
                    p = np.searchsorted(tgt, ts_us[s:e], side="right")
                    hn = p < len(tgt)
                    nxt = tgt[np.minimum(p, len(tgt) - 1)]
                    flag[s:e] = (hn & (nxt <= ts_us[s:e] + h_us)).astype(np.int64)
        out[dst] = flag
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def ordered_funnel(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    steps: Sequence[str],
    gap: "pd.Timedelta | float | int",
    out_col: str = "steps_reached",
    num_buckets: Optional[int] = None,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """N-step strict-order funnel per (entity, session): the greedy
    earliest subsequence — ``t₁ = min ts of step 1``, ``t_k = min ts of
    step k STRICTLY after t_{k−1}`` — and ``steps_reached`` = deepest k
    whose ``t_k`` exists. Strict ``>`` chaining makes the result a pure
    function of timestamps (two same-microsecond events can never chain,
    so no tiebreak rule leaks into the answer), which is exactly what
    lets the SQL replay use plain ``MIN``/``>`` joins.

    The generalization of the 2-step ``session_conversion`` (any depth,
    order REQUIRED — a purchase before the first view does not count).
    One bucket exchange; each chaining level is one ``np.minimum.at``
    grouped-min over that step's rows plus one gather — no per-session
    loop. Output: one row per (entity, session): ``(id, session_id,
    n_events, steps_reached)``.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("ordered_funnel: steps must be non-empty")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        sid = _seg_session_ids(ts, segs, gap)
        n = len(g)
        start = np.zeros(n, dtype=bool)
        if n:
            start[0] = True
            start[segs[1:-1]] = True
            start[1:] |= sid[1:] != sid[:-1]
        sess_ord = np.cumsum(start) - 1
        n_sess = int(sess_ord[-1]) + 1 if n else 0
        types = g[type_col].to_numpy()

        BIG = np.iinfo(np.int64).max
        t_prev = np.full(n_sess, -1, dtype=np.int64)  # "before everything"
        reached = np.zeros(n_sess, dtype=np.int64)
        alive = np.ones(n_sess, dtype=bool)
        for k, step in enumerate(steps):
            rows = (types == step)
            if k > 0:
                rows &= ts_us > t_prev[sess_ord]
            rows &= alive[sess_ord]
            t_k = np.full(n_sess, BIG, dtype=np.int64)
            np.minimum.at(t_k, sess_ord[rows], ts_us[rows])
            hit = t_k < BIG
            reached[hit & alive] = k + 1
            alive &= hit
            t_prev = t_k

        counts = np.bincount(sess_ord, minlength=n_sess).astype(np.int64)
        first_idx = np.flatnonzero(start)
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy()[first_idx],
            "session_id": sid[first_idx],
            "n_events": counts,
            out_col: reached,
        })
        return out

    return grouped.grouped_ordered_map(
        ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets
    )


def grouped_autocorr(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    lag: int = 1,
    out_col: str = "autocorr",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Whole-history lag-k autocorrelation per entity — behavioral
    persistence ("does a high value predict the next one") as one
    number per entity, beside the WINDOWED rolling autocorrelation.
    SQL ``corr(v, lag(v, k))`` per group: pairwise-complete (both ends
    non-null), NULL when fewer than 2 pairs or either side constant.

    One entity-bucket exchange: the segment-safe lag and the per-entity
    Pearson reduce in the SAME pass (pandas grouped sums over the
    already-co-located bucket — no second exchange, no broadcast).
    6dp-quantized: DuckDB's incremental-merge covariance and the
    grouped-sum closed form agree past 1e-9 but not bitwise.
    """
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy(dtype=np.float64)
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        lv = _seg_shift(v, seg_id, lag)
        ok = ~(np.isnan(v) | np.isnan(lv))
        d = pd.DataFrame({id_col: g[id_col].to_numpy()[ok],
                          "x": v[ok], "y": lv[ok]})
        s = d.groupby(id_col, sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"))
        # centered second pass within the bucket (exact per-group means)
        dk = d[id_col].to_numpy()
        mx = grouped.probe_f64(dk, s["sx"] / s["n"])
        my = grouped.probe_f64(dk, s["sy"] / s["n"])
        cx = d["x"].to_numpy() - mx
        cy = d["y"].to_numpy() - my
        d2 = pd.DataFrame({id_col: d[id_col], "xx": cx * cx, "yy": cy * cy,
                           "xy": cx * cy})
        m = d2.groupby(id_col, sort=False).sum()
        n = s["n"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = m["xy"].to_numpy() / np.sqrt(m["xx"].to_numpy() * m["yy"].to_numpy())
        r = np.where((n < 2) | (m["xx"].to_numpy() <= 0) | (m["yy"].to_numpy() <= 0),
                     np.nan, r)
        scale = 1e6
        with np.errstate(invalid="ignore"):
            r = np.sign(r) * np.floor(np.abs(r) * scale + 0.5) / scale
        got = pd.DataFrame({id_col: s.index.to_numpy(),
                            "n_pairs": s["n"].to_numpy().astype(np.int64),
                            out_col: np.asarray(r)})
        # SQL GROUP BY emits EVERY entity — including those with zero
        # complete pairs (single-row or all-null histories): n_pairs=0,
        # autocorr NULL. The ok-filter above silently dropped them.
        all_ents = pd.DataFrame({id_col: pd.unique(g[id_col])})
        out = all_ents.merge(got, on=id_col, how="left")
        out["n_pairs"] = out["n_pairs"].fillna(0).astype(np.int64)
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def drop_consecutive_duplicates(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Stream compaction: drop a row when EVERY ``value_cols`` entry
    equals the entity's previous row (null == null counts as equal —
    the SQL ``IS NOT DISTINCT FROM`` rule) — collapsing bounce/repeat
    noise (double-fired trackers, idempotent state re-emits) while
    keeping the first of each run. Entity firsts always survive. One
    bucket exchange, vectorized lag compares per column.
    """
    order = [time_col, *(tiebreak or [])]
    cols = list(value_cols)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        seg_id = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = seg_id[1:] != seg_id[:-1]
        same = ~first  # candidate: same entity as previous row
        for c in cols:
            col = g[c]
            prev = col.shift(1)
            eq = (col.isna() & prev.isna()) | (col == prev)
            same &= eq.to_numpy()
        return g[~same]

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def throttle(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    *,
    min_gap_us: int,
    tiebreak: "Optional[Sequence[str]]" = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity greedy debounce / throttle: keep a row only when at
    least ``min_gap_us`` has elapsed since the entity's LAST KEPT row
    (entity firsts always kept) — the rate-limit / notification-dedup /
    sensor-downsampling semantic. Unlike tumbling-bucket thinning, the
    kept set is the greedy chain (each survivor re-arms the timer), so
    two events 2·gap apart both survive regardless of bucket phase.

    The chain has no parallel closed form (each keep depends on the
    previous keep), but it resolves in ONE entity-bucket exchange with
    per-segment work O(kept · log seg) — a C-speed ``searchsorted``
    jump per SURVIVOR, never a per-row Python step; a billion-row
    entity throttled to hourly keeps ~10⁴ rows and costs ~10⁴ jumps.
    ``tiebreak`` totalizes the order under duplicate timestamps.

    This is the streaming counterpart of the reference's
    per-partition temporal-ordering contract
    (`/root/reference/src/temporalscope/core/temporal_data_loader.py`);
    the reference has no stream-compaction surface at all.
    """
    gap = int(min_gap_us)
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        keep = np.zeros(len(g), dtype=bool)
        for s, e in zip(segs[:-1], segs[1:]):
            sub = ts_us[s:e]
            i = 0
            end = e - s
            while i < end:
                keep[s + i] = True
                i = int(np.searchsorted(sub, sub[i] + gap, side="left"))
        return g[keep]

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def time_weighted_average(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    out_col: str = "twa",
    tiebreak: "Optional[Sequence[str]]" = None,
    round_to: int | None = 6,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity time-weighted average under step-function (hold-last)
    semantics: ``Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first)`` over the
    entity's non-null observations — the telemetry / pricing aggregate
    where a value that HELD for six hours must weigh 360× one that
    held a minute (the row-mean lies whenever sampling is irregular,
    which is the north rule's whole premise). Null values are skipped
    (the previous observation holds through them); entities with < 2
    non-null observations emit nothing (zero total duration).

    One entity-bucket exchange; inside the bucket everything is
    vectorized (segment-masked diffs + two bincounts) — weights stay
    EXACT int64 microseconds, so the only float work is one
    multiply-sum per entity, quantized at ``round_to``."""
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[value_col].notna()]
        if not len(g):
            return pd.DataFrame({id_col: g[id_col], out_col: np.array([], dtype=np.float64)})
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        v = g[value_col].to_numpy(dtype=np.float64)
        ids = g[id_col].to_numpy()
        seg = _segment_ids(grouped.entity_segments(ids))
        nseg = int(seg[-1]) + 1
        w = np.empty(len(g), dtype=np.int64)
        w[:-1] = ts_us[1:] - ts_us[:-1]
        w[-1] = 0
        last = np.zeros(len(g), dtype=bool)
        last[np.nonzero(np.diff(seg))[0]] = True
        last[-1] = True
        w[last] = 0  # the final observation holds for zero time
        num = np.bincount(seg, weights=v * w, minlength=nseg)
        den = np.bincount(seg, weights=w, minlength=nseg).astype(np.float64)
        firsts = np.zeros(len(g), dtype=bool)
        firsts[0] = True
        firsts[np.nonzero(np.diff(seg))[0] + 1] = True
        keep = den > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            twa = num / den
        if round_to is not None:
            s = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                twa = np.sign(twa) * np.floor(np.abs(twa) * s + 0.5) / s
        return pd.DataFrame({id_col: ids[firsts][keep], out_col: twa[keep]})

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def add_time_since_event(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    target_type: str,
    out_col: Optional[str] = None,
    tiebreak: "Optional[Sequence[str]]" = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Type-conditional recency: microseconds since the entity's last
    STRICTLY PRIOR event of ``target_type`` (null until the entity's
    first such event; a target-type row measures to the PREVIOUS one,
    not itself) — the "days since last purchase" feature, leakage-free
    by the strict-priority frame. Exact int64; SQL replay
    ``ts_us - MAX(CASE WHEN type = t THEN ts_us END) OVER (... ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    One entity-bucket exchange; the prior-match index is one masked
    ``np.maximum.accumulate`` with segment-start resets — no per-row
    work."""
    dst = out_col or f"us_since_{target_type}"
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        n = len(g)
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        segs = grouped.entity_segments(g[id_col].to_numpy())
        seg_start = np.repeat(segs[:-1], np.diff(segs))
        match = g[type_col].to_numpy() == target_type
        idx = np.arange(n)
        pm = np.maximum.accumulate(np.where(match, idx, -1))
        # strict: a matching row looks at the accumulate one row back
        prev = pm.copy()
        prev[match] = np.concatenate(([-1], pm[:-1]))[match]
        has = prev >= seg_start
        vals = np.zeros(n, dtype=np.int64)
        vals[has] = ts_us[has] - ts_us[prev[has]]
        col = pd.array(vals, dtype="Int64")
        col[~has] = pd.NA
        out[dst] = col
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def last_touch_attribution(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    target_type: str,
    gap_us: int,
    out_col: str = "touch_type",
    tiebreak: "Optional[Sequence[str]]" = None,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Last-touch conversion attribution: for every ``target_type``
    event (the conversion), the type of the immediately preceding event
    in the SAME session (gap ≤ ``gap_us``; the predecessor IS the
    latest strictly-prior in-session event) — null when the conversion
    opens its session (direct conversion). The marketing-attribution
    primitive; one entity-bucket exchange, two segment-safe shifts,
    no session-id materialization needed."""
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        t = g[type_col].to_numpy(dtype=object)
        prev_t = np.empty(n, dtype=object)
        prev_t[1:] = t[:-1]
        prev_t[0] = None
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = ts_us[1:] - ts_us[:-1]
        gap[0] = -1
        segs = grouped.entity_segments(g[id_col].to_numpy())
        firsts = np.zeros(n, dtype=bool)
        firsts[segs[:-1]] = True
        in_session = (~firsts) & (gap <= gap_us)
        touch = np.where(in_session, prev_t, None)
        conv = t == target_type
        out = g[conv].drop(columns=[type_col]).copy()
        out[out_col] = touch[conv]
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def grouped_gap_quantile(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    q: float = 0.5,
    out_col: str = "gap_q_us",
    type_col: "Optional[str]" = None,
    only_type: "Optional[str]" = None,
    tiebreak: "Optional[Sequence[str]]" = None,
    round_to: int | None = 6,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity quantile of consecutive inter-arrival gaps (µs),
    optionally restricted to one event type first — e.g. the median
    inter-PURCHASE time, the cadence feature behind replenishment and
    churn models. Entities with < 2 qualifying rows emit null.

    One entity-bucket exchange does everything: the type filter, the
    segment-safe diff, and the per-entity interpolated quantile
    (numpy = SQL ``quantile_cont``) all run inside the same bucket
    pass — gaps never become a second exchange."""
    order = [time_col, *(tiebreak or [])]
    cols = [id_col, time_col, *(tiebreak or [])]
    if type_col:
        cols.append(type_col)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if only_type is not None and type_col:
            g = g[g[type_col] == only_type]
        ids = g[id_col].to_numpy()
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.int64)
        segs = grouped.entity_segments(ids)
        d = np.diff(ts_us).astype(np.float64)
        seg_id = _segment_ids(segs)
        same = seg_id[1:] == seg_id[:-1] if len(g) > 1 else np.array([], dtype=bool)
        gaps = pd.DataFrame({id_col: ids[1:][same], "__g__": d[same]})
        qv = gaps.groupby(id_col, sort=False)["__g__"].quantile(q)
        firsts = np.zeros(len(g), dtype=bool)
        if len(g):
            firsts[segs[:-1]] = True
        out = pd.DataFrame({id_col: ids[firsts]})
        vals = qv.reindex(out[id_col]).to_numpy(np.float64)
        if round_to is not None:
            sc = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                vals = np.sign(vals) * np.floor(np.abs(vals) * sc + 0.5) / sc
        out[out_col] = vals
        return out

    return grouped.grouped_ordered_map(
        ds.select_columns(list(dict.fromkeys(cols))), id_col, order, fn,
        num_buckets=num_buckets)


def add_log_return(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    out_col: str = "log_return",
    tiebreak: "Optional[Sequence[str]]" = None,
    round_to: int | None = 6,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-entity log return ``ln(v_t / v_{t-1})`` — the scale-free
    change feature of financial/telemetry modeling (additive across
    steps, symmetric up/down). Null on entity firsts and whenever the
    ratio is undefined or non-positive (null/zero/negative values, SQL
    ``ln`` domain). One entity-bucket exchange, one segment-safe shift."""
    order = [time_col, *(tiebreak or [])]

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        v = g[value_col].to_numpy(np.float64)
        seg = _segment_ids(grouped.entity_segments(g[id_col].to_numpy()))
        prev = _seg_shift(v, seg, 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = v / prev
            lr = np.log(ratio)
        lr = np.where(np.isfinite(lr) & (ratio > 0), lr, np.nan)
        if round_to is not None:
            sc = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                lr = np.sign(lr) * np.floor(np.abs(lr) * sc + 0.5) / sc
        out[out_col] = lr
        return out

    return grouped.grouped_ordered_map(ds, id_col, order, fn, num_buckets=num_buckets)


def regularize_grid(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    step: pd.Timedelta,
    tiebreak: Optional[Sequence[str]] = None,
    max_grid_rows_per_entity: int = 100_000,
    num_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Upsample each entity to a REGULAR **epoch-aligned** grid with
    last-observation-carried-forward. Sibling of ``resample_ffill``
    with different alignment semantics: that one anchors each entity's
    grid at its own first event and collapses duplicate (id, ts) to
    MAX(value); this one puts every entity on the SAME global grid
    (multiples of ``step`` since the epoch — what cross-entity feature
    matrices and FFTs need) and resolves duplicate timestamps by the
    (ts, tiebreak) order.
    Grid points are the multiples of ``step`` inside [first_ts, last_ts]
    per entity; the carried value is the LAST row at-or-before the grid
    point in (ts, tiebreak) order, so duplicate timestamps resolve
    deterministically. One entity-bucket exchange; per entity the grid
    is an ``arange`` + one ``searchsorted`` (no row loops).

    An entity whose grid would exceed ``max_grid_rows_per_entity``
    fails LOUDLY (a sparse decade-long series at 1-minute steps is a
    500k-row blow-up per entity — silent emission would flood
    downstream); raise the bound explicitly if that's intended.

    Output: (id, ts_grid, value_ffill).
    """
    step_us = int(step // pd.Timedelta(microseconds=1))
    if step_us <= 0:
        raise ValueError("step must be a positive Timedelta")
    order = [time_col, *(tiebreak or [])]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        ts_us = g[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g[value_col].to_numpy()
        segs = grouped.entity_segments(ids)
        out_ids, out_ts, out_vals = [], [], []
        for a, b in zip(segs[:-1], segs[1:]):
            k0 = -((-ts_us[a]) // step_us)  # ceil(first/step)
            k1 = ts_us[b - 1] // step_us    # floor(last/step)
            if k1 < k0:
                continue
            if k1 - k0 + 1 > max_grid_rows_per_entity:
                raise ValueError(
                    f"regularize_grid: entity {ids[a]!r} needs {k1 - k0 + 1} grid rows "
                    f"(> max_grid_rows_per_entity={max_grid_rows_per_entity}); "
                    "raise the bound or coarsen `step`"
                )
            grid = np.arange(k0, k1 + 1, dtype=np.int64) * step_us
            idx = np.searchsorted(ts_us[a:b], grid, side="right") - 1
            out_ids.append(np.repeat(ids[a], len(grid)))
            out_ts.append(grid)
            out_vals.append(vals[a:b][idx])
        if not out_ids:
            return pd.DataFrame(columns=[id_col, "ts_grid", "value_ffill"])
        return pd.DataFrame({
            id_col: np.concatenate(out_ids),
            "ts_grid": np.concatenate(out_ts).view("datetime64[us]"),
            "value_ffill": np.concatenate(out_vals),
        })

    return grouped.grouped_ordered_map(ds, id_col, order, per_bucket, num_buckets=num_buckets)
