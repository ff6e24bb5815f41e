"""Wide-aggregate operators built on the combiner → one-exchange plan.

All four follow the same scale discipline as
``grouped.hash_groupby_aggregate``: each block is first reduced to a
small partial (combiner) so the only all-to-all exchange — when one is
needed at all — moves partials, never raw rows. At 100 TB the fact
table streams through the combiners once; what shuffles is bounded by
``groups × blocks`` (time buckets, distinct pairs, pivot cells) or by
nothing (histogram partials tree-reduce to the driver).

The reference has no aggregate surface beyond per-column means/counts
(`/root/reference/src/temporalscope/core/core_utils.py:381-483`,
`partition/single_target/padding/functional.py:148-158`); these are
the wide-step generalizations a distributed engine needs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .grouped import BUCKET_COL, DEFAULT_NUM_BUCKETS, hash_groupby_aggregate, hash_key_column, with_bucket

_US = {"s": 1_000_000, "min": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}


def time_bucket_aggregate(
    ds: ray.data.Dataset,
    ts_col: str,
    every: "str | int",
    aggs: dict,
    *,
    by: Optional[Sequence[str]] = None,
    bucket_col: str = "bucket_start",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Tumbling-window aggregate: rows land in
    ``floor(epoch_us(ts) / width)`` buckets and aggregate per
    ``(bucket, *by)`` with ``hash_groupby_aggregate`` semantics
    (``aggs: out_col -> (src_col, fn)``, fn ∈ max|min|sum|count|mean).

    ``every`` is microseconds (int) or ``"<n><unit>"`` with unit in
    s|min|h|d (e.g. ``"1h"``). The output ``bucket_col`` is the bucket
    START as ``timestamp[us]`` — directly comparable to SQL
    ``to_timestamp(floor(epoch_us(ts)/width)*width / 1e6)``.

    The bucket id is computed in a stateless vectorized projection, so
    the exchange that follows moves one combiner partial per
    (block, bucket, by) — a day of events at any scale reduces to
    ``blocks × 24`` rows for hourly buckets.
    """
    if isinstance(every, str):
        for unit in sorted(_US, key=len, reverse=True):
            if every.endswith(unit):
                width = int(every[: -len(unit)]) * _US[unit]
                break
        else:
            raise ValueError(f"time_bucket_aggregate: cannot parse every='{every}'")
    else:
        width = int(every)
    if width <= 0:
        raise ValueError("time_bucket_aggregate: bucket width must be positive")
    by = list(by or [])

    def add_bucket(t: pa.Table) -> pa.Table:
        # normalize to us first (dtype axis): a ms/ns timestamp column
        # cast straight to int64 would be floor-divided on the wrong scale
        col = t.column(ts_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        start = (us // width) * width
        return t.append_column(
            bucket_col, pa.array(start, type=pa.int64()).cast(pa.timestamp("us"))
        )

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return hash_groupby_aggregate(tagged, [bucket_col, *by], aggs, num_buckets=num_buckets)


def grouped_distinct_count(
    ds: ray.data.Dataset,
    keys: "str | Sequence[str]",
    value_col: str,
    *,
    out_col: str = "n_distinct",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Exact ``COUNT(DISTINCT value) GROUP BY keys``.

    Combiner: each block deduplicates to its distinct
    ``(keys, value)`` pairs — the only thing the exchange moves.
    Per-bucket final: ``nunique`` over the union of partials. SQL
    semantics: null values don't count; null keys form a group.

    Scale bound: the exchange carries ≤ global-distinct-pairs rows
    (not fact rows). For a distinct count whose pair set itself is
    huge relative to memory per bucket, raise ``num_buckets``; for
    monitoring-grade counts an HLL sketch is cheaper (see
    ``validator._hll``) — this is deliberately the exact path.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([*keys, value_col]).to_pandas()
        df = df.dropna(subset=[value_col]).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = hash_key_column(t.column(keys[0]), num_buckets)
        return t.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))

    bucketed = pairs.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def final(t: pa.Table) -> pa.Table:
        df = t.drop_columns([BUCKET_COL]).to_pandas().drop_duplicates()
        out = (
            df.groupby(keys, sort=False, dropna=False)[value_col]
            .nunique()
            .rename(out_col)
            .reset_index()
        )
        out[out_col] = out[out_col].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed.groupby(BUCKET_COL).map_groups(final, batch_format="pyarrow")


def pivot_counts(
    ds: ray.data.Dataset,
    key: str,
    pivot_col: str,
    *,
    values: Optional[Sequence[str]] = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Wide one-hot count table: one row per ``key``, one int64 column
    per ``pivot_col`` value (count of rows with that value).

    ``values`` fixes the output columns (required for a stable schema
    across blocks). When omitted, a combiner-style distinct pass
    discovers them first — that pass materializes only the distinct
    pivot values on the driver, which for a pivot to *columns* must be
    small by construction.

    Per-block crosstab partials → one hash exchange keyed on ``key``
    → per-bucket sum. Equivalent SQL:
    ``SUM(CASE WHEN pivot = v THEN 1 ELSE 0 END) AS v`` per value.
    """
    if values is None:
        import pyarrow.dataset  # noqa: F401

        distinct = ds.select_columns([pivot_col]).unique(pivot_col)
        values = sorted(str(v) for v in distinct if v is not None)
    values = list(values)
    aggs = {v: (f"__p_{i}__", "sum") for i, v in enumerate(values)}

    def partial(t: pa.Table) -> pa.Table:
        cols = [key] if key == pivot_col else [key, pivot_col]
        df = t.select(cols).to_pandas()
        pv = df[pivot_col].astype("string")
        cols = {}
        for i, v in enumerate(values):
            cols[f"__p_{i}__"] = (pv == v).to_numpy(dtype=np.int64, na_value=0)
        out = pd.DataFrame({key: df[key], **cols})
        g = out.groupby(key, sort=False, dropna=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return hash_groupby_aggregate(partials, [key], aggs, num_buckets=num_buckets)


def value_histogram(
    ds: ray.data.Dataset,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int,
) -> pa.Table:
    """Fixed-bin histogram of a numeric column — combiner-only, ZERO
    shuffle: every block reduces to a ``bins``-long int64 partial, the
    partials stream to the driver as ``bins``-row tables and sum there
    (O(blocks × bins) driver work on tiny arrays; nothing else moves).

    Bin b covers ``[lo + b*w, lo + (b+1)*w)`` with
    ``w = (hi-lo)/bins``; values outside [lo, hi) and nulls are
    dropped (matches the SQL floor-arithmetic oracle). Returns a small
    in-memory ``pa.Table(bin, bin_lo, count)`` — a driver-side result,
    like any scalar aggregate.
    """
    if bins <= 0 or not hi > lo:
        raise ValueError("value_histogram: need bins > 0 and hi > lo")
    w = (float(hi) - float(lo)) / bins

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v < hi)]
        idx = np.floor((v - lo) / w).astype(np.int64)
        # right-edge float rounding can land exactly on `bins`
        idx = np.clip(idx, 0, bins - 1)
        counts = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"bin": np.arange(bins, dtype=np.int64), "count": counts})

    total = np.zeros(bins, dtype=np.int64)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        b = batch.column("bin").to_numpy(zero_copy_only=False)
        c = batch.column("count").to_numpy(zero_copy_only=False)
        np.add.at(total, b, c)
    bin_lo = lo + np.arange(bins, dtype=np.float64) * w
    return pa.table(
        {"bin": np.arange(bins, dtype=np.int64), "bin_lo": bin_lo, "count": total}
    )


def grouped_quantile(
    ds: ray.data.Dataset,
    keys: "str | Sequence[str]",
    value_col: str,
    *,
    q: "float | Sequence[float]",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Exact per-group quantiles with linear interpolation — numpy's
    default method, identical to SQL ``quantile_cont`` / ``MEDIAN``.

    Quantiles are holistic (not algebraic), so unlike the
    combiner-able aggregates this op must co-locate each group's
    values: one hash exchange of the PROJECTED ``(keys, value)``
    pairs (never the full rows), then a vectorized per-bucket pandas
    groupby-quantile. Nulls are dropped per group (SQL aggregate
    semantics); an all-null group yields null. For
    monitoring-grade percentiles at extreme cardinality a mergeable
    sketch is cheaper — this is deliberately the exact path (same
    contract as ``stats.exact_quantiles`` for the global case).

    Output: one row per group with ``{value_col}_p{percent}`` columns.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = [q] if isinstance(q, (int, float)) else list(q)
    if any(not (0.0 <= x <= 1.0) for x in qs):
        raise ValueError("grouped_quantile: q values must be in [0, 1]")

    def col_name(x: float) -> str:
        pct = round(float(x) * 100, 6)
        s = f"{pct:g}".replace(".", "_")
        return f"{value_col}_p{s}"

    proj = ds.select_columns([*keys, value_col])
    bucketed = with_bucket(proj, keys[0], num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.drop_columns([BUCKET_COL]).to_pandas()
        gb = df.groupby(keys, sort=False, dropna=False)[value_col]
        pieces = {col_name(x): gb.quantile(x) for x in qs}
        out = pd.DataFrame(pieces).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def hopping_window_aggregate(
    ds: ray.data.Dataset,
    ts_col: str,
    *,
    window: "str | int",
    hop: "str | int",
    aggs: dict,
    by: Optional[Sequence[str]] = None,
    bucket_col: str = "window_start",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Hopping (overlapping sliding) window aggregate: windows of
    length ``window`` starting every ``hop`` (``window % hop == 0``);
    each row contributes to ``window/hop`` windows. The streaming-SQL
    ``HOP``/sliding-window operator, as a batch transform.

    A stateless projection REPLICATES each row once per covering
    window (a bounded ×window/hop blowup of combiner partials, never
    of shuffled facts — the per-block combiner inside
    ``hash_groupby_aggregate`` still reduces each (block, window) to
    one partial row before the single exchange). Windows are emitted
    only where data exists (no empty-window densification — match the
    oracle with an INNER lateral).

    ``aggs`` as in ``hash_groupby_aggregate``; ``window``/``hop`` as
    in ``time_bucket_aggregate`` (e.g. "1h", "15min").
    """
    w = _parse_every(window)
    h = _parse_every(hop)
    if w % h != 0:
        raise ValueError("hopping_window_aggregate: window must be a multiple of hop")
    k = w // h
    by = list(by or [])

    def replicate(t: pa.Table) -> pa.Table:
        col = t.column(ts_col)
        if pa.types.is_timestamp(col.type):  # normalize unit (dtype axis)
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        n = len(us)
        # covering window starts: latest = floor(ts/hop)*hop, then k-1
        # earlier hops (those with start > ts - window)
        latest = (us // h) * h
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * h, n)
        starts = np.repeat(latest, k) - offs
        take = pa.array(idx)
        out = pa.table({c: t.column(c).take(take) for c in t.column_names})
        return out.append_column(
            bucket_col, pa.array(starts).cast(pa.timestamp("us"))
        )

    tagged = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
    return hash_groupby_aggregate(tagged, [bucket_col, *by], aggs, num_buckets=num_buckets)


def _parse_every(every: "str | int") -> int:
    if isinstance(every, str):
        for unit in sorted(_US, key=len, reverse=True):
            if every.endswith(unit):
                return int(every[: -len(unit)]) * _US[unit]
        raise ValueError(f"cannot parse time width '{every}'")
    width = int(every)
    if width <= 0:
        raise ValueError("time width must be positive")
    return width


def approx_distinct_kmv(
    ds: ray.data.Dataset,
    group_col: str,
    key_col: str,
    *,
    k: int = 256,
    round_to: int = 6,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Approximate per-group distinct count via the K-Minimum-Values
    sketch: keep each group's ``k`` smallest ``md5(key)`` values;
    fewer than ``k`` collected means the count is EXACT, otherwise
    ``(k−1)·2⁶⁴ / h_k`` estimates it (standard KMV, ±~1/√k relative
    error). The exact grouped distinct (``grouped_distinct_count``)
    exchanges every distinct pair; this sketch caps the exchange at
    ``k × blocks`` rows per group no matter the cardinality — the
    monitoring-grade path at 100 TB.

    Because the hash is md5 (not a seeded process hash), the sketch is
    DETERMINISTIC: the same inputs give the same estimate on any
    cluster, and a SQL engine replays it bit-for-bit
    (``row_number() OVER (ORDER BY md5_number_lower(...))`` to h_k,
    same float expression — see the ``approx_distinct_users`` oracle).
    """
    from .dedup import _md5_lower64

    if k < 2:
        raise ValueError("k must be >= 2")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[group_col, key_col]].drop_duplicates()
        h = _md5_lower64(d[key_col].astype(str))
        p = pd.DataFrame({group_col: d[group_col].to_numpy(), "__h__": h})
        p = p.drop_duplicates().sort_values([group_col, "__h__"], kind="mergesort")
        return p.groupby(group_col, sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[group_col, "__h__"]].drop_duplicates().sort_values(
            [group_col, "__h__"], kind="mergesort")
        capped = d.groupby(group_col, sort=False).head(k)
        gb = capped.groupby(group_col, sort=False)["__h__"]
        n = gb.size()
        kth = gb.max()  # k-th smallest of the capped set
        est = np.where(
            n < k, n.astype(np.float64),
            np.round((k - 1) * 2.0 ** 64 / kth.to_numpy(dtype=np.float64), round_to),
        )
        return pd.DataFrame({group_col: n.index.to_numpy(), "approx_distinct": est})

    parts = ds.map_batches(partial, batch_format="pandas")
    bucketed = with_bucket(parts, group_col, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda g: final(g.drop(columns=[BUCKET_COL])), batch_format="pandas"
    )


def cohort_retention(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    period_us: int = 7 * 86_400_000_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Cohort retention rollup: assign every entity to the period of its
    FIRST event (cohort), then count distinct entities active at each
    ``(cohort, offset)`` — the classic week-0/week-N retention matrix in
    long form.

    Scale shape: one combiner ``min(ts)`` exchange reduces the facts to
    one row per entity (the cohort table, entity-sized — broadcast via
    ``ray.put``; beyond broadcast scale use the bucketed equi-join
    instead), the fact pass tags each event with ``(cohort, offset)``
    zero-shuffle, and the distinct-entity count per cell rides the
    distinct-pair combiner (``grouped_distinct_count``)."""
    firsts = hash_groupby_aggregate(
        ds.select_columns([id_col, time_col]), [id_col],
        {"__first__": (time_col, "min")},
    ).to_pandas()
    f_us = firsts["__first__"].to_numpy().astype("datetime64[us]").astype(np.int64)
    cohort = dict(zip(firsts[id_col], (f_us // period_us).astype(np.int64)))
    import ray
    ref = ray.put(cohort)
    p_us = np.int64(period_us)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        from .grouped import probe_f64
        coh_f = probe_f64(df[id_col].to_numpy(), pd.Series(c))
        # loud-failure guard (ADVICE r4): a batch id missing from the
        # cohort map probes to NaN, which .astype(int64) would silently
        # cast to INT64_MIN — keep the old map().to_numpy(int64) raise
        if np.isnan(coh_f).any():
            missing = df[id_col].to_numpy()[np.isnan(coh_f)][:5]
            raise ValueError(
                f"cohort_retention: ids absent from the cohort map: {list(missing)!r}")
        coh = coh_f.astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cohort": coh,
            "period_offset": (ts_us // p_us) - coh,
        })

    tagged = ds.select_columns([id_col, time_col]).map_batches(tag, batch_format="pandas")
    return grouped_distinct_count(
        tagged, ["cohort", "period_offset"], id_col, out_col="n_users",
        num_buckets=num_buckets,
    )


def transition_counts(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Corpus-wide event-type transition counts: how often ``prev_type →
    type`` occurs consecutively within an entity's timeline (the Markov
    transition matrix behavioral models and anomaly detectors start
    from). Each entity's first event has no predecessor and emits
    nothing.

    One entity-bucket exchange computes the in-order lag, each bucket
    reduces to per-(prev, cur) partial counts (combiner), and one tiny
    type²-sized hash aggregate merges them."""
    from .grouped import grouped_ordered_map

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from .grouped import entity_segments

        t = g[type_col].to_numpy()
        n = len(g)
        prev = np.empty(n, dtype=object)
        prev[1:] = t[:-1]
        prev[0] = None
        segs = entity_segments(g[id_col].to_numpy())
        first = np.zeros(n, dtype=bool)
        first[segs[:-1]] = True
        keep = ~first
        out = pd.DataFrame({"prev_type": prev[keep], "cur_type": t[keep]})
        return out.groupby(["prev_type", "cur_type"], sort=False).size() \
            .reset_index(name="n")

    partials = grouped_ordered_map(
        ds.select_columns([id_col, time_col, type_col, *(tiebreak or [])]),
        id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets,
    )
    return hash_groupby_aggregate(
        partials, ["prev_type", "cur_type"], {"n": ("n", "sum")}, num_buckets=4,
    )


def grouped_mode(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    *,
    out_col: str = "mode",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Most frequent ``value_col`` per ``key`` (deterministic: count
    desc, then smallest value — SQL ``row_number() OVER (PARTITION BY
    key ORDER BY cnt DESC, value) = 1``). Null values don't compete;
    a key whose values are all null emits no row.

    Combiner: per-block (key, value) counts; ONE exchange of those
    partials (bounded by distinct pairs, never facts); per-bucket merge
    + argmax."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[key, value_col]].dropna(subset=[value_col])
        return d.groupby([key, value_col], sort=False, dropna=False) \
                .size().reset_index(name="__c__")

    parts = ds.select_columns([key, value_col]).map_batches(partial, batch_format="pandas")
    merged = hash_groupby_aggregate(
        parts, [key, value_col], {"__c__": ("__c__", "sum")}, num_buckets=num_buckets,
    )

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        srt = df.sort_values([key, "__c__", value_col],
                             ascending=[True, False, True], kind="mergesort")
        top = srt.groupby(key, sort=False, dropna=False).head(1)
        out = top.rename(columns={value_col: out_col, "__c__": "mode_count"})
        out["mode_count"] = out["mode_count"].astype(np.int64)
        return out

    # per-key rows share a bucket (hash on key), so the argmax is local
    bucketed = with_bucket(merged, key, max(4, num_buckets // 8))
    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda g: argmax(g.drop(columns=[BUCKET_COL])), batch_format="pandas"
    )


def top_k_rows(
    ds: ray.data.Dataset,
    by: str,
    k: int,
    *,
    ascending: bool = False,
    tiebreak: Optional[Sequence[str]] = None,
) -> pd.DataFrame:
    """Global top-k rows by ``by`` WITHOUT a global sort: each block
    reduces to its own k candidates (vectorized ``argpartition`` +
    local sort), the driver merges ``O(blocks · k)`` rows — the
    ``knn_brute`` partial-top-k pattern generalized to plain rows.
    Correct because a global top-k row is a top-k row of its block.

    Deterministic under ties when ``tiebreak`` makes the order total
    (ties beyond k are otherwise resolved by block layout — pass a
    unique key). NaNs in ``by`` never qualify. Returns a k-row
    DataFrame (a small RESULT, fetched to the driver by design).
    """
    tb = list(tiebreak or [])
    asc = [ascending] + [True] * len(tb)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[by].notna()]
        if len(df) > k:
            # tie-safe block prune: keep EVERY row at least as good as
            # the kth value (ties included), so the tiebreak sort below
            # decides among equals — argpartition alone would drop an
            # arbitrary tied candidate before the tiebreak ever runs
            v = df[by].to_numpy()
            key = v if ascending else -v
            kth = np.partition(key, k - 1)[k - 1]
            df = df[key <= kth]
        return df.sort_values([by, *tb], ascending=asc, kind="mergesort").head(k)

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(cand) == 0:
        # fully-empty input: the frame may be schema-less (Ray drops
        # empty blocks) — sort_values would KeyError on the sort keys
        return cand
    return cand.sort_values([by, *tb], ascending=asc, kind="mergesort") \
        .head(k).reset_index(drop=True)


def grouped_entropy(
    ds: ray.data.Dataset,
    key: str,
    cat_col: str,
    *,
    out_col: str = "entropy",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Shannon entropy (nats) of the categorical distribution within
    each group — the behavioral-diversity feature (a user who only ever
    clicks scores 0; uniform over m types scores ln m). Null categories
    are excluded (SQL COUNT semantics); a group with no non-null
    categories emits nothing.

    Two bounded exchanges, facts never move twice: the distinct-pair
    combiner reduces the stream to ``(key, cat, n)`` (≤ |keys|·|cats|
    rows), then one key-bucket pass computes ``−Σ (n/N)·ln(n/N)``
    vectorized per group. The arithmetic is shared verbatim with the
    SQL oracle; per-group term counts are vocabulary-sized, so 6dp
    quantization is far beyond summation-order ulp.
    """
    def drop_null_cats(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, cat_col]].dropna(subset=[cat_col])

    pairs = hash_groupby_aggregate(
        ds.select_columns([key, cat_col]).map_batches(
            drop_null_cats, batch_format="pandas"),
        [key, cat_col],
        {"n": (None, "count")},
        num_buckets=num_buckets,
    )
    bucketed = with_bucket(pairs, key, num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.drop_columns([BUCKET_COL]).to_pandas()
        n = df["n"].to_numpy(dtype=np.float64)
        tot = df.groupby(key, sort=False)["n"].transform("sum").to_numpy(dtype=np.float64)
        p = n / tot
        df["__t__"] = -(p * np.log(p))
        out = df.groupby(key, sort=False, as_index=False)["__t__"].sum()
        e = out["__t__"].to_numpy()
        if round_to is not None:
            scale = 10.0 ** round_to
            e = np.sign(e) * np.floor(np.abs(e) * scale + 0.5) / scale
        res = pd.DataFrame({key: out[key], out_col: e})
        return pa.Table.from_pandas(res, preserve_index=False)

    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pyarrow")


def rolling_active_entities(
    ds: ray.data.Dataset,
    time_col: str,
    entity_col: str,
    *,
    window_days: int = 7,
    day_col: str = "day",
    out_col: str = "active",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Rolling distinct active entities per calendar day — the WAU/MAU
    family: for every day PRESENT in the data, the count of distinct
    entities active in the trailing ``window_days`` days (inclusive).
    Distinct counts do not merge across windows, which is why a naive
    per-window COUNT(DISTINCT) rescans the facts ``window`` times; here
    the stream is first reduced to DISTINCT ``(day, entity)`` pairs by
    the combiner (bounded by actives·days, never events), each pair is
    replicated to the ≤ ``window_days`` window-days it can serve (a
    bounded blow-up of the small pair table, not of facts), clipped to
    days that actually occur, and finished by the exact
    ``grouped_distinct_count`` exchange. Day ids are exact int64 epoch
    days (``epoch_us // 86 400e6`` — shared verbatim with SQL).
    """
    us_per_day = np.int64(86_400_000_000)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ok = df[entity_col].notna().to_numpy()
        return pd.DataFrame({day_col: ts_us[ok] // us_per_day,
                             entity_col: df[entity_col][ok]}).drop_duplicates()

    pairs = hash_groupby_aggregate(
        ds.select_columns([time_col, entity_col]).map_batches(
            to_pairs, batch_format="pandas"),
        [day_col, entity_col],
        {"__n__": (None, "count")},
        num_buckets=num_buckets,
    )
    observed = set(
        int(d) for d in
        pairs.groupby(day_col).count().to_pandas()[day_col].tolist()
    )
    obs_ref = ray.put(observed)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        obs = ray.get(obs_ref)
        d = df[day_col].to_numpy(dtype=np.int64)
        reps = np.repeat(np.arange(window_days, dtype=np.int64), len(df))
        wday = np.tile(d, window_days) + reps
        ent = np.tile(df[entity_col].to_numpy(), window_days)
        keep = np.isin(wday, np.fromiter(obs, dtype=np.int64))
        return pd.DataFrame({day_col: wday[keep], entity_col: ent[keep]})

    exploded = pairs.map_batches(explode, batch_format="pandas")
    return grouped_distinct_count(exploded, day_col, entity_col,
                                  out_col=out_col, num_buckets=num_buckets)


def new_vs_returning_daily(
    ds: ray.data.Dataset,
    time_col: str,
    entity_col: str,
    *,
    day_col: str = "day",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Per observed day: distinct entities seen for the FIRST time that
    day vs returning — the daily acquisition/retention split. Facts
    reduce once to distinct ``(day, entity)`` pairs (combiner); the
    per-entity first day comes from a ``min`` over those pairs (a
    second combiner exchange bounded by the pair table, NOT a
    driver-side entity map — entities can be 10⁹); the pair table then
    joins its own firsts back per bucket and reduces to per-day
    counters. int64 epoch days shared verbatim with SQL.
    """
    us_per_day = np.int64(86_400_000_000)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ok = df[entity_col].notna().to_numpy()
        return pd.DataFrame({day_col: ts_us[ok] // us_per_day,
                             entity_col: df[entity_col][ok]}).drop_duplicates()

    pairs = hash_groupby_aggregate(
        ds.select_columns([time_col, entity_col]).map_batches(
            to_pairs, batch_format="pandas"),
        [day_col, entity_col],
        {"__n__": (None, "count")},
        num_buckets=num_buckets,
    )
    firsts = hash_groupby_aggregate(
        pairs, [entity_col], {"__first__": (day_col, "min")},
        num_buckets=num_buckets,
    )
    from .join import equi_join

    joined = equi_join(
        pairs.select_columns([day_col, entity_col]), firsts,
        on=entity_col, num_buckets=num_buckets,
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        new = (df[day_col] == df["__first__"]).to_numpy()
        return pd.DataFrame({day_col: df[day_col],
                             "__new__": new.astype(np.int64),
                             "__ret__": (~new).astype(np.int64)})

    return hash_groupby_aggregate(
        joined.map_batches(tag, batch_format="pandas"),
        [day_col],
        {"new_users": ("__new__", "sum"), "returning_users": ("__ret__", "sum")},
        num_buckets=8,
    )


def attach_transition_prob(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    target_type: str,
    out_col: Optional[str] = None,
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Markov next-event propensity feature: attach to every row the
    corpus-estimated ``P(next event = target_type | current type)`` —
    transition counts from ``transition_counts`` (one bucket exchange +
    combiner), finished as an exact integer ratio per type. The
    type²-sized probability table broadcasts once (``ray.put``) into a
    zero-shuffle vectorized map — the canonical small-side-lookup
    shape, never a join exchange. Types never observed with a
    successor get a null propensity (no evidence ≠ zero).

    Exactness: hits/total is a ratio of exact int64 counts, so both
    engines hold the identical double — bit-exact, SQL-replayable.
    """
    import ray as _ray

    dst = out_col or f"p_next_{target_type}"
    tc = transition_counts(ds, id_col=id_col, time_col=time_col,
                           type_col=type_col, tiebreak=tiebreak,
                           num_buckets=num_buckets).to_pandas()
    if len(tc) == 0:
        # no observed transitions anywhere (every entity has a single
        # row): the empty frame may be schema-less; every type maps to
        # the no-evidence null, matching SQL's COUNT(next)=0 → NULL
        prob = {}
    else:
        tot = tc.groupby("prev_type")["n"].sum()
        hits = tc[tc["cur_type"] == target_type].set_index("prev_type")["n"]
        prob = (hits.reindex(tot.index, fill_value=0).astype(np.float64)
                / tot.astype(np.float64)).to_dict()
    ref = _ray.put(prob)

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        from .grouped import probe_f64
        p = _ray.get(ref)
        out = b.copy()
        out[dst] = probe_f64(b[type_col].to_numpy(), pd.Series(p))
        return out

    return ds.map_batches(attach, batch_format="pandas")


def attach_surprisal(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    out_col: str = "surprisal",
    prev_col: str = "prev_type",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Markov surprisal feature: every row gains
    ``-ln P(cur_type | prev_type)`` under the corpus's own first-order
    transition matrix — the sequence-anomaly score (how unexpected was
    this step given the step before it) that session-fraud and
    bot-detection models start from. Entity firsts (no predecessor) and
    null-typed rows get a null score; every observed (prev, cur) pair
    has count ≥ 1 by construction, so no smoothing is needed and the
    log argument is an EXACT ratio of int64 counts — both engines take
    ``ln`` of the identical double. The result is quantized at 6dp
    because libm and DuckDB's ``ln`` may differ in the last ulp.

    Plan: the transition matrix comes from ``transition_counts`` (one
    exchange of type²-sized partials), broadcasts once via ``ray.put``,
    and the per-row lag + lookup happen inside ONE entity-bucket
    exchange of the fact table — two bounded exchanges total, only one
    of which moves facts.

    The reference has no sequence-model surface; this extends its
    per-partition temporal ordering contract
    (`/root/reference/src/temporalscope/core/temporal_data_loader.py`)
    to a corpus-level conditional estimate.
    """
    import ray as _ray

    from .grouped import entity_segments, grouped_ordered_map

    tc = transition_counts(ds, id_col=id_col, time_col=time_col,
                           type_col=type_col, tiebreak=tiebreak,
                           num_buckets=num_buckets).to_pandas()
    if len(tc) == 0:
        # no observed transitions anywhere (every entity has one row):
        # the empty frame may be schema-less; every lookup below maps to
        # the unseen (-1 → NaN) path
        vocab = pd.Index([], dtype=object)
        mat = np.full((0, 0), np.nan)
    else:
        tot = tc.groupby("prev_type")["n"].sum()
        p = tc["n"].to_numpy(np.float64) / tot.reindex(tc["prev_type"]).to_numpy(np.float64)
        # vocab² surprisal matrix: NaN where the transition was never seen
        # (only reachable for a type that appears solely as an entity-first)
        vocab = pd.Index(sorted(set(tc["prev_type"]) | set(tc["cur_type"])))
        mat = np.full((len(vocab), len(vocab)), np.nan)
        # half-away-from-zero at 6dp (the SQL ROUND rule); -ln p >= 0 always
        mat[vocab.get_indexer(tc["prev_type"]), vocab.get_indexer(tc["cur_type"])] = \
            np.floor(-np.log(p) * 1e6 + 0.5) / 1e6
    ref = _ray.put((vocab, mat))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        voc, m = _ray.get(ref)
        t = g[type_col].to_numpy(dtype=object)
        n = len(g)
        prev = np.empty(n, dtype=object)
        prev[1:] = t[:-1]
        prev[0] = None
        segs = entity_segments(g[id_col].to_numpy())
        prev[segs[:-1]] = None
        pi = voc.get_indexer(prev)   # None / unseen → -1
        ci = voc.get_indexer(t)
        vals = np.full(n, np.nan)
        ok = (pi >= 0) & (ci >= 0)
        vals[ok] = m[pi[ok], ci[ok]]
        out = g.copy()
        out[prev_col] = prev
        out[out_col] = vals
        return out

    return grouped_ordered_map(
        ds, id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets,
    )


def ohlc_bars(
    ds: ray.data.Dataset,
    ts_col: str,
    value_col: str,
    every: "str | int",
    *,
    by: Optional[Sequence[str]] = None,
    tiebreak: Optional[Sequence[str]] = None,
    bucket_col: str = "bucket_start",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """OHLC downsampling: per ``(by, tumbling bucket)`` emit the value
    at the FIRST row (open), MAX/MIN over non-null values (high/low),
    the value at the LAST row (close) and ``COUNT(*)`` — the bar
    constructor that turns an irregular event stream into the fixed
    training grid of a financial / telemetry model.

    first/last-by-time are DISTRIBUTIVE once the order key rides along:
    each block reduces to one partial row per (by, bucket) carrying
    ``(order key, value)`` for both boundaries plus high/low/n, the
    exchange moves only partials, and the per-bucket final re-applies
    the same boundary pick over partial rows (min-of-mins is the min).
    ``tiebreak`` extends the order to a total one under duplicate
    timestamps; the boundary value is the value AT the boundary row
    (null if that row's value is null — SQL ``CASE WHEN rn=1`` form),
    while high/low skip nulls like SQL MAX/MIN.

    The reference has no resampling surface at all; this is the
    wide-step counterpart of its per-partition pandas-style access
    (`/root/reference/src/temporalscope/core/temporal_data_loader.py`).
    """
    width = _parse_every(every)
    by = list(by or [])
    order = [ts_col, *(tiebreak or [])]
    gcols = [*by, bucket_col]

    def tag(t: pa.Table) -> pa.Table:
        # normalize to us first: a pandas-born timestamp[ns] column would
        # otherwise be floor-divided as if its int64 were microseconds
        ts = pc.cast(t.column(ts_col), pa.timestamp("us"))
        us = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        start = (us // width) * width
        return t.append_column(
            bucket_col, pa.array(start, type=pa.int64()).cast(pa.timestamp("us"))
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # Positional alignment between first/last/groupby frames is
        # safe: all are ordered primarily by ``gcols`` after the sort,
        # so the group sequence is identical across them.
        a = df.sort_values([*gcols, *order], kind="mergesort")
        first = a.loc[~a.duplicated(subset=gcols, keep="first")]
        last = a.loc[~a.duplicated(subset=gcols, keep="last")]
        g = a.groupby(gcols, sort=False, dropna=False)[value_col]
        out = first[gcols].reset_index(drop=True)
        for i, c in enumerate(order):
            out[f"__ok{i}"] = first[c].to_numpy()
            out[f"__ck{i}"] = last[c].to_numpy()
        out["open_v"] = first[value_col].to_numpy()
        out["close_v"] = last[value_col].to_numpy()
        out["high_v"] = g.max().to_numpy()
        out["low_v"] = g.min().to_numpy()
        out["n"] = g.size().to_numpy().astype(np.int64)
        return out

    ok = [f"__ok{i}" for i in range(len(order))]
    ck = [f"__ck{i}" for i in range(len(order))]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if BUCKET_COL in df.columns:
            df = df.drop(columns=[BUCKET_COL])
        a = df.sort_values([*gcols, *ok], kind="mergesort")
        first = a.loc[~a.duplicated(subset=gcols, keep="first")]
        d = df.sort_values([*gcols, *ck], kind="mergesort")
        last = d.loc[~d.duplicated(subset=gcols, keep="last")]
        g = a.groupby(gcols, sort=False, dropna=False)
        out = first[gcols].reset_index(drop=True)
        out["open_v"] = first["open_v"].to_numpy()
        out["high_v"] = g["high_v"].max().to_numpy()
        out["low_v"] = g["low_v"].min().to_numpy()
        out["close_v"] = last["close_v"].to_numpy()
        out["n"] = g["n"].sum().to_numpy().astype(np.int64)
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    partials = tagged.map_batches(partial, batch_format="pandas")
    key = (by or [bucket_col])[0]
    bucketed = with_bucket(partials, key, num_buckets)
    return bucketed.groupby(BUCKET_COL).map_groups(final, batch_format="pandas")


def rfm_snapshot(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    cutoff,
    value_col: Optional[str] = None,
    value_filter: Optional[tuple[str, str]] = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Point-in-time RFM snapshot (Recency = last activity timestamp,
    Frequency = event count, Monetary = value sum, all STRICTLY BEFORE
    ``cutoff``) — the classic feature-store aggregate for churn / LTV
    models, leakage-free by construction because the cutoff filter runs
    before anything else. ``value_filter=(col, val)`` restricts the
    monetary sum to matching rows (e.g. purchases), contributing 0
    otherwise (SQL ``SUM(CASE ... ELSE 0 END)``).

    Shape: the time filter prunes at the scan, each block reduces to
    one partial per entity (combiner max/count/sum), one entity-hash
    exchange of partials finishes — facts never shuffle."""
    cutoff = pd.Timestamp(cutoff)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[time_col] < cutoff]
        mv = b[value_col].fillna(0.0).to_numpy(np.float64) if value_col else np.zeros(len(b))
        if value_filter is not None and value_col:
            col, val = value_filter
            mv = np.where(b[col].to_numpy() == val, mv, 0.0)
        return pd.DataFrame({id_col: b[id_col], time_col: b[time_col], "__mv__": mv})

    pre = ds.map_batches(prep, batch_format="pandas")
    return hash_groupby_aggregate(
        pre, [id_col],
        {"last_ts": (time_col, "max"), "n_events": (None, "count"),
         "monetary": ("__mv__", "sum")},
        num_buckets=num_buckets,
    )


def latest_row_per_key(
    ds: ray.data.Dataset,
    key: str,
    *,
    order_by: Sequence[str],
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """CDC compaction / upsert-apply: keep each key's single LATEST row
    under the total ``order_by`` order (ties impossible when the caller
    includes a unique column, e.g. ``(ts, event_id)``) — the
    change-log → current-snapshot materialization every warehouse
    needs. DISTRIBUTIVE: each block first reduces to one candidate row
    per key it contains (a vectorized tail-per-key), the exchange moves
    ≤ keys×blocks candidate rows (never the log), and the per-bucket
    final re-applies the same pick — the latest of per-block latests is
    the latest."""
    order_by = list(order_by)

    def block_latest(df: pd.DataFrame) -> pd.DataFrame:
        # na_position="first": a null order key must never win over a
        # real one (SQL ORDER BY ... DESC ranks NULLs last) — tail(1)
        # picks the max NON-null; an all-null key still emits its row
        d = df.sort_values(order_by, kind="mergesort", na_position="first")
        return d.groupby(key, sort=False, dropna=False).tail(1)

    parts = ds.map_batches(block_latest, batch_format="pandas")
    bucketed = with_bucket(parts, key, num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).sort_values(
            order_by, kind="mergesort", na_position="first")
        return d.groupby(key, sort=False, dropna=False).tail(1)

    return bucketed.groupby(BUCKET_COL).map_groups(final, batch_format="pandas")


def trailing_global_aggregate(
    ds: ray.data.Dataset,
    time_col: str,
    *,
    window_us: int,
    value_col: Optional[str] = None,
    count_col: str = "w_count",
    sum_col: str = "w_sum",
    round_to: int | None = 6,
    max_bucket_rows: int | None = 4_000_000,
    sub_buckets: int | None = None,
) -> ray.data.Dataset:
    """GLOBAL trailing-window aggregate per event: for every row, the
    count (and optional value sum) of ALL rows — any entity — with
    ``ts ∈ [t − window, t]`` (inclusive both ends, peers included: SQL
    ``RANGE BETWEEN <w> PRECEDING AND CURRENT ROW``). This is the
    crowding / system-load / traffic-spike feature, and it is the
    window the entity-bucket exchange CANNOT express (no key).

    Plan — time-bucket replication, never a global sort: with bucket
    width = ``window_us / s``, a row's window can only reach into its
    own bucket and the ``s`` before, so each row ships once to its
    owner bucket and once per successor bucket within window reach as
    context; one bucket exchange co-locates them, and inside each
    bucket two ``searchsorted`` calls against the sorted local+context
    timestamps answer every row — O(b log b) per bucket, exchange
    ``(1+s)×`` stub traffic. Timestamps are exact int64 µs; the sum is
    quantized at ``round_to`` (summation-order tolerance), the count is
    exact.

    Burst guard (round-2 verdict #4): with ``s = 1`` a traffic burst
    concentrated inside ONE window lands in one giant bucket. When
    ``sub_buckets`` is None, a cheap pre-scan (ts column only, per-batch
    combiner counts; driver table = one row per distinct time bucket)
    measures the largest bucket and splits it to ``≈ max_bucket_rows``
    rows by shrinking the bucket width — replication cost rises
    linearly while the straggler bucket shrinks. Pass ``sub_buckets``
    explicitly (or ``max_bucket_rows=None``) to skip the pre-scan."""
    w = int(window_us)
    if w <= 0:
        raise ValueError("window_us must be positive")
    has_val = value_col is not None
    SIDE = "__ctx__"

    def _us(col: "pa.ChunkedArray") -> np.ndarray:
        # normalize to us BEFORE integer math: a pandas-born ns column
        # would land buckets 1000x off
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)

    if sub_buckets is None:
        s = 1
        if max_bucket_rows is not None:
            # combiner pre-scan: per-batch counts of ts // w, summed on
            # the driver (rows = distinct coarse buckets, bounded by
            # time-range / window — a metadata-scale table)
            def bucket_counts(t: pa.Table) -> pa.Table:
                b, n = np.unique(_us(t.column(time_col)) // w, return_counts=True)
                return pa.table({"b": pa.array(b), "n": pa.array(n.astype(np.int64))})

            counts = ds.select_columns([time_col]).map_batches(
                bucket_counts, batch_format="pyarrow", zero_copy_batch=True
            ).to_pandas()
            if len(counts):
                biggest = int(counts.groupby("b")["n"].sum().max())
                s = min(64, -(-biggest // int(max_bucket_rows)))
    else:
        s = max(1, int(sub_buckets))
    wb = -(-w // s)  # ceil: s sub-buckets always cover a full window

    def replicate(t: pa.Table) -> pa.Table:
        us = _us(t.column(time_col))
        b = us // wb
        cols = {c: t.column(c) for c in t.column_names}
        parts = [pa.table({**cols, BUCKET_COL: pa.array((b % (1 << 31)).astype(np.int32)),
                           SIDE: pa.array(np.zeros(len(us), dtype=np.int8))})]
        # context stubs: a successor bucket within window reach may look
        # back into this row; only ts (+ value) matter downstream; other
        # columns ride along null-free by reuse (cheap at stub scale)
        for k in range(1, s + 1):
            parts.append(pa.table({**cols, BUCKET_COL: pa.array(((b + k) % (1 << 31)).astype(np.int32)),
                                   SIDE: pa.array(np.ones(len(us), dtype=np.int8))}))
        return pa.concat_tables(parts)

    keep = [time_col] + ([value_col] if has_val else [])
    rest = [c for c in ds.schema().names if c not in keep]
    bucketed = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(t: pa.Table) -> pa.Table:
        side = t.column(SIDE).to_numpy(zero_copy_only=False)
        us = _us(t.column(time_col))
        order = np.argsort(us, kind="stable")
        s_us = us[order]
        own_mask = side == 0
        own = t.filter(pa.array(own_mask)).drop_columns([SIDE])
        o_us = us[own_mask]
        hi = np.searchsorted(s_us, o_us, side="right")
        lo = np.searchsorted(s_us, o_us - w, side="left")
        out = own.append_column(count_col, pa.array((hi - lo).astype(np.int64)))
        if has_val:
            v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
            vs = v[order]
            sv = np.concatenate(([0.0], np.cumsum(np.nan_to_num(vs))))
            ws = sv[hi] - sv[lo]
            if round_to is not None:
                sc = 10.0 ** round_to
                ws = np.sign(ws) * np.floor(np.abs(ws) * sc + 0.5) / sc
            # SQL SUM ignores NULLs but returns NULL (not 0.0) when the
            # window holds no non-null value — track the non-null prefix
            # count and mask those windows
            nz = np.concatenate(([0], np.cumsum((~np.isnan(vs)).astype(np.int64))))
            out = out.append_column(
                sum_col, pa.array(ws, mask=(nz[hi] - nz[lo]) == 0))
        return out

    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda t: per_bucket(t.drop_columns([BUCKET_COL])), batch_format="pyarrow")


def grouped_trimmed_mean(
    ds: ray.data.Dataset,
    keys: "str | Sequence[str]",
    value_col: str,
    *,
    trim: float = 0.05,
    out_col: str = "trimmed_mean",
    round_to: int | None = 6,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Per-group trimmed mean: the mean of values inside the group's
    ``[q_trim, q_(1-trim)]`` interpolated quantile band (bounds
    INCLUSIVE — a value equal to the cut survives, SQL ``BETWEEN``) —
    the robust central-tendency metric that one corrupted shard cannot
    move, unlike the raw mean.

    Two stages, neither moving facts twice: the quantile bounds come
    from ``grouped_quantile`` (one projected-pair exchange), the
    groups-sized bound table broadcasts, and the trimmed sum/count
    reduce as an ordinary combiner. Groups with no in-band values (or
    all nulls) emit null."""
    import ray as _ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    if not (0.0 <= trim < 0.5):
        raise ValueError("grouped_trimmed_mean: trim must be in [0, 0.5)")
    qlo, qhi = trim, 1.0 - trim
    bounds = grouped_quantile(ds, keys, value_col, q=[qlo, qhi],
                              num_buckets=num_buckets).to_pandas()
    cols = [c for c in bounds.columns if c not in keys]
    lo_c, hi_c = cols[0], cols[1]
    table = {tuple(r[k] for k in keys): (r[lo_c], r[hi_c])
             for _, r in bounds.iterrows()}
    ref = _ray.put(table)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _ray.get(ref)
        v = df[value_col].to_numpy(np.float64)
        kt = list(zip(*(df[k] for k in keys)))
        m = {k: t.get(k, (np.nan, np.nan)) for k in set(kt)}
        lo = np.fromiter((m[k][0] for k in kt), dtype=np.float64, count=len(kt))
        hi = np.fromiter((m[k][1] for k in kt), dtype=np.float64, count=len(kt))
        ok = ~np.isnan(v) & (v >= lo) & (v <= hi)
        d = pd.DataFrame({**{k: df[k] for k in keys},
                          "__s__": np.where(ok, v, 0.0),
                          "__n__": ok.astype(np.int64)})
        return d.groupby(keys, sort=False, dropna=False).sum().reset_index()

    parts = ds.select_columns([*keys, value_col]).map_batches(partial, batch_format="pandas")
    merged = hash_groupby_aggregate(parts, keys, {"s": ("__s__", "sum"), "n": ("__n__", "sum")},
                                    num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            tm = df["s"].to_numpy(np.float64) / n
        tm = np.where(n > 0, tm, np.nan)
        if round_to is not None:
            sc = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                tm = np.sign(tm) * np.floor(np.abs(tm) * sc + 0.5) / sc
        out = df[keys].copy()
        out[out_col] = tm
        out["n_kept"] = df["n"].astype(np.int64)
        return out

    return merged.map_batches(finish, batch_format="pandas")


def rollup_aggregate(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    aggs: dict,
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """SQL ``GROUP BY ROLLUP(k1, k2, …)``: the finest-grain aggregate
    plus every prefix subtotal and the grand total, with NULLs in the
    rolled-up key positions. Aggregation functions must be MERGEABLE
    (sum/count/min/max) — that is the whole point of the plan: the fact
    table is scanned and exchanged exactly ONCE for the finest grain,
    and every coarser level derives from the groups-sized aggregate
    (count re-merges as sum), never from facts. ``aggs`` follows the
    ``hash_groupby_aggregate`` convention ``out -> (src, fn)``."""
    keys = list(keys)
    allowed = {"sum", "count", "min", "max"}
    for out, (_, fn) in aggs.items():
        if fn not in allowed:
            raise ValueError(f"rollup_aggregate: {fn} is not mergeable (use {allowed})")
    from ..core import _schema

    finest = hash_groupby_aggregate(ds, keys, aggs, num_buckets=num_buckets)
    fschema = _schema(finest)
    key_types = {k: fschema.field(k).type for k in keys}
    order = [*keys, *aggs]
    levels = [finest.map_batches(lambda t: t.select(order), batch_format="pyarrow",
                                 zero_copy_batch=True)]
    cur = finest
    for depth in range(len(keys) - 1, -1, -1):
        gk = keys[:depth]
        merge = {out: (out, "sum" if fn in ("sum", "count") else fn)
                 for out, (_, fn) in aggs.items()}
        if gk:
            lvl = hash_groupby_aggregate(cur, gk, merge, num_buckets=4)
        else:
            import ray as _ray

            df = cur.to_pandas()  # groups-sized by construction
            row = {}
            for out, (_, fn) in merge.items():
                col = df[out]
                row[out] = [col.sum() if fn == "sum" else
                            (col.min() if fn == "min" else col.max())]
            lvl = ray.data.from_pandas(pd.DataFrame(row))

        def pad(t: pa.Table, _gk=tuple(gk), _types=dict(key_types)) -> pa.Table:
            for k in keys:
                if k not in _gk:
                    t = t.append_column(k, pa.nulls(t.num_rows, type=_types[k]))
            return t.select(order)

        levels.append(lvl.map_batches(pad, batch_format="pyarrow"))
        cur = lvl
    out = levels[0]
    for l in levels[1:]:
        out = out.union(l)
    return out


def rolling_distinct_sketch(
    ds: ray.data.Dataset,
    time_col: str,
    key_col: str,
    *,
    window_days: int = 7,
    k: int = 64,
    round_to: int = 6,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Trailing-window distinct-count series from MERGEABLE daily KMV
    sketches: per observed day, the estimated distinct ``key_col``
    over the last ``window_days`` days — the monitoring-grade
    WAU/MAU curve. The exact path (``rolling_active_entities``)
    exchanges every distinct (day, entity) pair; this one caps the
    exchange at ``k × blocks`` rows per day AND — the property that
    matters — window re-aggregation merges SKETCHES, never re-touching
    facts: the k smallest of a union of per-day k-smallest sets IS the
    union's k smallest, so any window recomposes from the days×k driver
    table for free. md5-deterministic, SQL-replayable (same estimate
    expression as ``approx_distinct_kmv``)."""
    from .dedup import _md5_lower64

    DAY_US = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame({"day": ts_us // DAY_US,
                          "__h__": _md5_lower64(df[key_col].astype(str))})
        d = d.drop_duplicates().sort_values(["day", "__h__"], kind="mergesort")
        return d.groupby("day", sort=False).head(k)

    parts = ds.select_columns([time_col, key_col]).map_batches(partial, batch_format="pandas")
    bucketed = with_bucket(parts, "day", num_buckets)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["day", "__h__"]].drop_duplicates().sort_values(
            ["day", "__h__"], kind="mergesort")
        return d.groupby("day", sort=False).head(k)

    daily = bucketed.groupby(BUCKET_COL).map_groups(
        lambda g: final(g.drop(columns=[BUCKET_COL])), batch_format="pandas"
    ).to_pandas()  # days × k RESULT — the mergeable sketch store

    days = np.sort(daily["day"].unique())
    by_day = {d: g["__h__"].to_numpy(np.uint64)
              for d, g in daily.groupby("day", sort=False)}
    rows = []
    for d in days:
        window = [by_day[x] for x in by_day if d - window_days < x <= d]
        merged = np.unique(np.concatenate(window))[:k]
        n = len(merged)
        if n < k:
            est = float(n)
        else:
            est = float(np.round((k - 1) * 2.0 ** 64 / float(merged[-1]), round_to))
        rows.append((int(d), est))
    return pd.DataFrame(rows, columns=["day", "approx_active"])


def burstiness_fano(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    out_col: str = "fano",
    round_to: int | None = 6,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Per-entity burstiness: the Fano factor ``var_samp / mean`` of
    the entity's DAILY event counts over its observed days — ≈1 for a
    Poisson visitor, ≫1 for bursty bot/batch traffic, the behavioral
    regularity feature. Entities observed on a single day emit null
    (sample variance undefined).

    Two combiner exchanges, neither moving facts twice: facts reduce
    once to (entity, day, n) partials, those reduce to per-entity
    (Σn, Σn², days) — the variance closes from exact int64 sums, so
    the only float work is the final expression (``round_to``-quantized
    to absorb SQL's incremental-variance ulp)."""
    DAY_US = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        col = t.column(time_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({id_col: t.column(id_col),
                         "__day__": pa.array(us // DAY_US)})

    daily = hash_groupby_aggregate(
        ds.select_columns([id_col, time_col]).map_batches(tag, batch_format="pyarrow"),
        [id_col, "__day__"], {"n": (None, "count")}, num_buckets=num_buckets)

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        return pd.DataFrame({id_col: df[id_col], "__s__": n, "__s2__": n * n,
                             "__d__": np.ones(len(df), dtype=np.int64)})

    per = hash_groupby_aggregate(
        daily.map_batches(sq, batch_format="pandas"), [id_col],
        {"s": ("__s__", "sum"), "s2": ("__s2__", "sum"), "d": ("__d__", "sum")},
        num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy(np.float64)
        s2 = df["s2"].to_numpy(np.float64)
        d = df["d"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (s2 - s * s / d) / (d - 1.0)
            fano = var / (s / d)
        fano = np.where(d > 1, fano, np.nan)
        if round_to is not None:
            sc = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                fano = np.sign(fano) * np.floor(np.abs(fano) * sc + 0.5) / sc
        return pd.DataFrame({id_col: df[id_col], out_col: fano,
                             "n_days": df["d"].astype(np.int64)})

    return per.map_batches(finish, batch_format="pandas")


def daily_volume_anomalies(
    ds: ray.data.Dataset,
    *,
    time_col: str,
    by: str,
    z_threshold: float = 3.0,
    round_to: int = 6,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Volume-anomaly report: per ``(by, day)`` event count with its
    z-score against the group's own daily-count distribution, flagging
    |z| ≥ ``z_threshold`` — the pipeline-health monitor that catches a
    dead producer (volume crater) or a runaway bot (volume spike)
    before any value-level drift test fires. Groups observed on < 2
    days get a null z (sample std undefined); zero-variance groups
    likewise.

    Facts reduce ONCE to (by, day, n) partials; the per-group moments
    close from exact int64 sums on the groups×days aggregate; the
    z-scores are a broadcast-free second pass over that same small
    table. Output: ``(by, day, n, z, is_anomaly)``."""
    DAY_US = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        col = t.column(time_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({by: t.column(by), "day": pa.array(us // DAY_US)})

    daily = hash_groupby_aggregate(
        ds.select_columns([by, time_col]).map_batches(tag, batch_format="pyarrow"),
        [by, "day"], {"n": (None, "count")}, num_buckets=num_buckets)

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        g = df.groupby(by, sort=False, dropna=False)["n"]
        d = g.transform("size").to_numpy(np.float64)
        s = g.transform("sum").to_numpy(np.float64)
        s2 = g.transform(lambda x: (x.astype(np.float64) ** 2).sum()).to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (s2 - s * s / d) / (d - 1.0)
            z = (n - s / d) / np.sqrt(var)
        z = np.where((d > 1) & (var > 0), z, np.nan)
        sc = 10.0 ** round_to
        with np.errstate(invalid="ignore"):
            zq = np.sign(z) * np.floor(np.abs(z) * sc + 0.5) / sc
        return pd.DataFrame({by: df[by], "day": df["day"].astype(np.int64),
                             "n": df["n"].astype(np.int64), "z": zq,
                             "is_anomaly": np.abs(zq) >= z_threshold})

    bucketed = with_bucket(daily, by, 8)
    return bucketed.groupby(BUCKET_COL).map_groups(
        lambda g: per_group(g.drop(columns=[BUCKET_COL])), batch_format="pandas")


def top_type_ngrams(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    n: int = 3,
    k: int = 20,
    sep: str = ">",
    tiebreak: Optional[Sequence[str]] = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Top-k most frequent length-``n`` event-type sequences across all
    entity timelines (every sliding window, entity-bounded) — the
    sequence-pattern miner behind funnel discovery and bot-signature
    detection. Ties order by the sequence string.

    One entity-bucket exchange; inside each bucket the n-grams come
    from n shifted array concats masked at entity boundaries (no
    per-row Python), reduce to per-bucket counts (combiner), and a tiny
    vocabulary^n-bounded aggregate + sort/limit finishes."""
    from .grouped import grouped_ordered_map

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from .grouped import entity_segments

        t = g[type_col].to_numpy(dtype=object).astype(str)
        m = len(g) - (n - 1)
        if m <= 0:
            return pd.DataFrame({"seq": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        segs = entity_segments(g[id_col].to_numpy())
        seg_id = np.repeat(np.arange(len(segs) - 1), np.diff(segs))
        same = seg_id[: m] == seg_id[n - 1:]
        parts = [t[i: m + i] for i in range(n)]
        seq = parts[0]
        for p in parts[1:]:
            seq = np.char.add(np.char.add(seq, sep), p)
        c = pd.Series(seq[same]).value_counts(sort=False)
        return pd.DataFrame({"seq": c.index.to_numpy(),
                             "cnt": c.to_numpy(np.int64)})

    parts = grouped_ordered_map(
        ds.select_columns([id_col, time_col, type_col, *(tiebreak or [])]),
        id_col, [time_col, *(tiebreak or [])], fn, num_buckets=num_buckets)
    agg = hash_groupby_aggregate(parts, ["seq"], {"cnt": ("cnt", "sum")},
                                 num_buckets=4)
    return agg.sort(["cnt", "seq"], descending=[True, False]).limit(k)


def max_streak_days(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    out_col: str = "max_streak",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Longest consecutive-active-day streak per entity (the engagement
    / habit-formation metric; the classic gaps-and-islands query): facts
    reduce ONCE to distinct (entity, day) pairs (combiner), one
    entity-hash exchange co-locates each entity's days, and the longest
    run is a vectorized diff==1 run-length over the sorted day list —
    nothing event-sized moves, no per-row Python."""
    DAY_US = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        col = t.column(time_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({id_col: t.column(id_col).to_pandas(),
                          "__day__": us // DAY_US}).drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False)

    p = ds.select_columns([id_col, time_col]).map_batches(pairs, batch_format="pyarrow")
    bucketed = with_bucket(p, id_col, num_buckets)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop(columns=[BUCKET_COL]).drop_duplicates() \
            .sort_values([id_col, "__day__"], kind="mergesort")
        ids = d[id_col].to_numpy()
        days = d["__day__"].to_numpy(np.int64)
        n = len(d)
        if n == 0:
            return pd.DataFrame({id_col: ids, out_col: days})
        # island id = day - dense index within entity; runs share it
        new_ent = np.ones(n, dtype=bool)
        new_ent[1:] = ids[1:] != ids[:-1]
        idx_in_ent = np.arange(n) - np.maximum.accumulate(
            np.where(new_ent, np.arange(n), 0))
        island = days - idx_in_ent
        key = pd.DataFrame({id_col: ids, "__i__": island})
        run_len = key.groupby([id_col, "__i__"], sort=False)[id_col] \
            .transform("size").to_numpy(np.int64)
        out = pd.DataFrame({id_col: ids, out_col: run_len}) \
            .groupby(id_col, sort=False, dropna=False).max().reset_index()
        out[out_col] = out[out_col].astype(np.int64)
        return out

    return bucketed.groupby(BUCKET_COL).map_groups(final, batch_format="pandas")


def activation_lag(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    goal_type: str,
    out_col: str = "activation_us",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Activation lag per entity: microseconds from the FIRST
    ``start_type`` event to the first ``goal_type`` event AT OR AFTER
    it (signup → first purchase — the activation-funnel health metric);
    null when either anchor is missing. One entity-bucket exchange;
    both anchors come from two ``np.minimum.reduceat`` segment reduces
    — no per-entity Python loop. Surfaced as double (µs magnitudes
    cross float53 when 6dp-quantized, so the value is NOT rounded —
    it is an exact integer difference)."""
    from .grouped import entity_segments, grouped_ordered_map

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        ts = g[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64).astype(np.float64) \
            if np.issubdtype(ts.dtype, np.datetime64) else ts.astype(np.float64)
        t = g[type_col].to_numpy()
        segs = entity_segments(ids)
        starts = segs[:-1]
        fs = np.minimum.reduceat(np.where(t == start_type, ts_us, np.inf), starts)
        fs_b = np.repeat(fs, np.diff(segs))
        goal = np.where((t == goal_type) & (ts_us >= fs_b), ts_us, np.inf)
        fp = np.minimum.reduceat(goal, starts)
        lag = fp - fs
        lag[~np.isfinite(lag)] = np.nan
        return pd.DataFrame({id_col: ids[starts], out_col: lag})

    return grouped_ordered_map(
        ds.select_columns([id_col, time_col, type_col]), id_col, [time_col],
        fn, num_buckets=num_buckets)


def volume_bars(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    threshold: float,
    tiebreak: Sequence[str] = (),
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Activity-driven (volume) bars per entity: instead of fixed time
    buckets, a new bar starts every ``threshold`` units of cumulative
    |value| — the event-time-warped resample quant pipelines use so
    busy periods get MORE bars, quiet ones fewer (fixed-information
    bars). bar_id = floor(exclusive-prefix-sum(|v|) / threshold) over
    the entity's (ts, tiebreak) order, then OHLC + volume close per
    (entity, bar) INSIDE the same bucket pass (entities are
    bucket-complete, so the cumulative sum and the per-bar reduction
    never need a second exchange). Null values count as zero volume.

    Volume is quantized to milli-units so the prefix sum and the bar
    boundary (integer floor-division) are EXACT int64 arithmetic —
    a float prefix sum flipped bar boundaries vs the SQL window-sum
    form at ~6k rows/entity — and the emitted volume is the shared
    exact-int ratio Σvolmil/1000 (unrounded: bit-identical everywhere).

    Output: (id, bar_id, bar_start_ts, open_v, high_v, low_v, close_v,
    volume, n).
    """
    from .grouped import entity_segments, grouped_ordered_map

    order = [time_col, *tiebreak]

    thr_mil = int(round(float(threshold) * 1000.0))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        v = g[value_col].to_numpy(dtype=np.float64)
        vol = np.floor(np.abs(np.nan_to_num(v, nan=0.0)) * 1000.0 + 0.5).astype(np.int64)
        segs = entity_segments(ids)
        # exclusive prefix sum restarting at each entity — exact int64
        cs = np.cumsum(vol)
        base = np.repeat(cs[segs[:-1]] - vol[segs[:-1]], np.diff(segs))
        prefix = cs - vol - base  # exclusive, per-entity
        bar = prefix // thr_mil
        if len(g) == 0:
            return pd.DataFrame({
                id_col: ids, "bar_id": np.array([], dtype=np.int64),
                "bar_start_ts": g[time_col].to_numpy(), "open_v": v,
                "high_v": v, "low_v": v, "close_v": v,
                "volume": np.array([], dtype=np.float64),
                "n": np.array([], dtype=np.int64),
            })
        ts = g[time_col].to_numpy()
        # (entity, bar) runs are contiguous in the (ts, tiebreak)-sorted
        # frame (bar ids are nondecreasing within an entity), so every
        # per-bar reduction is a reduceat over run boundaries — no pandas
        # groupby, and open/close are POSITIONAL row values (SQL
        # row_number() ORDER BY ts picks the first/last ROW's raw value,
        # which may be NULL — pandas' groupby 'first'/'last' skip NaN and
        # silently substituted the first non-null, caught by adv_sweep's
        # injected null values). high/low skip NaN like SQL MAX/MIN
        # (np.fmax/fmin; an all-null bar stays NaN = SQL NULL).
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        change[1:] = (ids[1:] != ids[:-1]) | (bar[1:] != bar[:-1])
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(g)] - 1
        return pd.DataFrame({
            id_col: ids[starts],
            "bar_id": bar[starts],
            "bar_start_ts": ts[starts],
            "open_v": v[starts],
            "high_v": np.fmax.reduceat(v, starts),
            "low_v": np.fmin.reduceat(v, starts),
            "close_v": v[ends],
            "volume": np.add.reduceat(vol, starts).astype(np.float64) / 1000.0,
            "n": (np.r_[starts[1:], len(g)] - starts).astype(np.int64),
        })

    return grouped_ordered_map(ds, id_col, order, per_bucket, num_buckets=num_buckets)


def feature_hash_counts(
    ds: ray.data.Dataset,
    id_col: str,
    cat_col: str,
    *,
    num_hash_buckets: int = 8,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """Hashing-trick categorical encoding: category → md5-lower-64 mod
    ``num_hash_buckets`` (portable — bit-identical to DuckDB's
    ``md5_number_lower(cat)``), counted per (entity, hash bucket).
    Unbounded vocabularies become fixed-width count features with
    collisions summed, the standard trick when one-hot width is
    unbounded. Per-block combiner partials (hash computed ONCE per
    distinct category per block, merged into the counts before the
    exchange) → one partial-row hash exchange; facts never move.

    Output: (id, fh_bucket, n) — long form; pivot downstream if a wide
    matrix is needed.
    """
    from .dedup import _md5_lower64

    def partial(t: pa.Table) -> pa.Table:
        counts = t.group_by([id_col, cat_col]).aggregate([(cat_col, "count")])
        cats = counts.column(cat_col).to_pylist()
        hb = (_md5_lower64([str(c) for c in cats]) % np.uint64(num_hash_buckets)).astype(np.int64)
        return pa.table({
            id_col: counts.column(id_col),
            "fh_bucket": pa.array(hb),
            "n": counts.column(f"{cat_col}_count"),
        })

    parts = ds.select_columns([id_col, cat_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    return hash_groupby_aggregate(
        parts, [id_col, "fh_bucket"], {"n": ("n", "sum")}, num_buckets=num_buckets
    )


def concentration_deciles(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    *,
    scale: float = 100.0,
    round_to: int = 6,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Lorenz-style concentration report: entities ranked by their
    total value (desc, id tiebreak) and split into 10 NTILE groups —
    what share of total value the top decile of users carries (the
    whale-curve companion to the Gini scalar in
    ``q_gini_user_activity``). Per-entity sums are cents-quantized
    int64 (exact in any engine/order); the decile split mirrors SQL
    NTILE exactly (first ``n % 10`` groups take one extra row); shares
    divide int sums cast to double at the same points, rounded
    half-away. One combiner exchange (O(entities) partials); the
    10-row closure runs on the driver. A zero/negative total yields
    null shares (NULLIF semantics). Output:
    ``(decile, users, share, cum_share)``."""
    import pyarrow.compute as _pc

    def tag(t: pa.Table) -> pa.Table:
        m = _pc.and_(_pc.is_valid(t.column(key_col)), _pc.is_valid(t.column(value_col)))
        t = t.filter(m)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({key_col: t.column(key_col),
                         "u": pa.array((np.sign(v) * np.floor(np.abs(v) * scale + 0.5))
                                       .astype(np.int64))})

    from .grouped import hash_groupby_aggregate as _hga

    per_key = _hga(
        ds.select_columns([key_col, value_col]).map_batches(tag, batch_format="pyarrow"),
        [key_col], {"v": ("u", "sum")}, num_buckets=num_buckets,
    ).to_pandas()  # O(entities)
    if not len(per_key):
        return pd.DataFrame({"decile": np.array([], dtype=np.int64),
                             "users": np.array([], dtype=np.int64),
                             "share": np.array([], dtype=np.float64),
                             "cum_share": np.array([], dtype=np.float64)})
    srt = per_key.sort_values(["v", key_col], ascending=[False, True], kind="mergesort")
    v = srt["v"].to_numpy(np.int64)
    n = len(v)
    k = min(10, n)
    base, extra = divmod(n, 10)
    sizes = np.array([base + (1 if i < extra else 0) for i in range(10)], dtype=np.int64)
    sizes = sizes[sizes > 0]  # NTILE(10) over n<10 rows yields n 1-row groups
    bounds = np.concatenate(([0], np.cumsum(sizes)))
    dv = np.add.reduceat(v, bounds[:-1])
    total = np.float64(int(v.sum()))
    sc = 10.0 ** round_to
    with np.errstate(divide="ignore", invalid="ignore"):
        share = np.where(total > 0, dv.astype(np.float64) / total, np.nan)
        cum = np.where(total > 0, np.cumsum(dv).astype(np.float64) / total, np.nan)
    return pd.DataFrame({
        "decile": np.arange(1, len(sizes) + 1, dtype=np.int64),
        "users": sizes,
        "share": np.sign(share) * np.floor(np.abs(share) * sc + 0.5) / sc,
        "cum_share": np.sign(cum) * np.floor(np.abs(cum) * sc + 0.5) / sc,
    })
