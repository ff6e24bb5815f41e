"""Distributed normalization + exact quantiles.

``zscore_per_entity`` — per-entity standardization, the feature-scaling
step the reference's modeling path leaves to the user (its MASV /
trainer stages consume raw features;
`/root/reference/src/temporalscope/metrics/masv.py` notes scaling as a
pre-step). Two streaming passes, ZERO shuffle of the fact table:

1. stats pass: per-block partial (Σv, Σv², n) per entity via
   ``hash_groupby_aggregate`` (combiner → one partial-row exchange);
2. apply pass: the per-entity stats table (one small row per entity)
   is broadcast via ``ray.put`` and every batch standardizes with a
   vectorized merge.

The broadcast assumption — the ENTITY table fits the object store —
holds to ~10^9 entities (3 doubles/entity ≈ 24 GB); beyond that,
compute the same stats and apply them inside one entity-bucket
exchange (``grouped.grouped_ordered_map``) instead.

``exact_quantiles`` — exact order statistics over a column at any
scale: one distributed sort of the SINGLE projected column, then
``split_at_indices`` fetches just the rank rows (driver pulls k rows,
never the column). Exact beats sketches when the value feeds a
filter/clip threshold that must be reproducible; for monitoring-grade
percentiles a t-digest is cheaper — this is deliberately the exact
path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .grouped import hash_groupby_aggregate


def entity_stats(
    ds: ray.data.Dataset, id_col: str, value_col: str, *, num_buckets: int = 32
) -> ray.data.Dataset:
    """Per-entity ``n, mean, std`` (population, ddof=0 — matches SQL
    ``STDDEV_POP``) in one combiner-style pass."""

    def with_sq(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column("__v2__", pa.array(v * v))

    partials = hash_groupby_aggregate(
        ds.select_columns([id_col, value_col]).map_batches(
            with_sq, batch_format="pyarrow", zero_copy_batch=True
        ),
        [id_col],
        {"__s__": (value_col, "sum"), "__s2__": ("__v2__", "sum"), "n": (value_col, "count")},
        num_buckets=num_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["n"].to_numpy(dtype=np.float64)
        mean = df["__s__"].to_numpy() / n
        # population variance; clip the tiny negative residue of
        # floating-point cancellation
        var = np.maximum(df["__s2__"].to_numpy() / n - mean * mean, 0.0)
        out = pd.DataFrame({id_col: df[id_col], "n": df["n"], "mean": mean, "std": np.sqrt(var)})
        return pa.Table.from_pandas(out, preserve_index=False)

    return partials.map_batches(finish, batch_format="pyarrow")


from .grouped import probe_f64 as _probe_f64


def zscore_per_entity(
    ds: ray.data.Dataset,
    id_col: str,
    value_col: str,
    *,
    out_col: str | None = None,
    stats: ray.data.Dataset | pd.DataFrame | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Append ``(v - mean_entity) / std_entity`` (NaN where std == 0,
    mirroring SQL ``/ NULLIF(stddev_pop, 0)``).

    Pass ``stats`` (from ``entity_stats`` on the TRAIN split) to apply
    train-fit normalization to val/test — the leakage-safe form."""
    out_col = out_col or f"{value_col}_z"
    if stats is None:
        stats = entity_stats(ds, id_col, value_col, num_buckets=num_buckets)
    stats_df = stats.to_pandas() if isinstance(stats, ray.data.Dataset) else stats
    lookup = stats_df.set_index(id_col)[["mean", "std"]]
    ref = ray.put(lookup)

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        lk: pd.DataFrame = ray.get(ref)
        keys = batch[id_col].to_numpy()
        m = _probe_f64(keys, lk["mean"])
        s = _probe_f64(keys, lk["std"])
        v = batch[value_col].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(s > 0, (v - m) / s, np.nan)
        out = batch.copy()
        out[out_col] = z
        return out

    return ds.map_batches(apply, batch_format="pandas")


def exact_quantiles(
    ds: ray.data.Dataset, col: str, qs: Sequence[float]
) -> pd.DataFrame:
    """Exact lower-rank quantiles: value at sorted index
    ``floor(q * (n - 1))`` for each q. Returns a small driver frame
    ``(q, value)`` — the DATA never reaches the driver: the projected
    column is sorted distributed, ``split_at_indices`` cuts at the rank
    positions (block-metadata arithmetic, no second pass), and only the
    k rank rows are fetched."""
    qs = list(qs)
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("quantiles must be in [0, 1]")
    proj = ds.select_columns([col])
    n = proj.count()
    if not n:
        # SQL parity: the rank join over zero rows emits NO rows (not
        # NaN-padded quantile rows) — caught by the empty-table axis
        return pd.DataFrame({"q": np.array([], dtype=np.float64),
                             "value": np.array([], dtype=np.float64)})
    ranks = [int(np.floor(q * (n - 1))) for q in qs]
    uniq = sorted(set(ranks))
    srt = proj.sort(col).materialize()
    splits = srt.split_at_indices(uniq)
    vals = {}
    for r, part in zip(uniq, splits[1:]):
        vals[r] = part.limit(1).take(1)[0][col]
    return pd.DataFrame({"q": qs, "value": [vals[r] for r in ranks]})


def robust_scale_per_group(
    ds: ray.data.Dataset,
    id_col: str,
    value_col: str,
    *,
    out_col: str | None = None,
    stats: "ray.data.Dataset | pd.DataFrame | None" = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Outlier-resistant per-group normalization:
    ``(v - median_group) / IQR_group`` with IQR = p75 − p25 (linear
    interpolation, SQL ``quantile_cont``); NaN where IQR == 0 —
    mirrors ``/ NULLIF(q75 - q25, 0)``. The robust sibling of
    ``zscore_per_entity`` for heavy-tailed features (web-corpus
    quality scores, token counts) where mean/std are dominated by the
    tail.

    Quantiles are holistic, so the stats pass is one projected-pair
    exchange (``agg.grouped_quantile``); the per-group (median, IQR)
    table — one small row per group — then broadcasts via ``ray.put``
    and the fact table never shuffles. Pass ``stats`` (from the TRAIN
    split) to apply train-fit scaling to val/test, the leakage-safe
    form.
    """
    from .agg import grouped_quantile

    out_col = out_col or f"{value_col}_robust"
    if stats is None:
        stats = grouped_quantile(
            ds, id_col, value_col, q=[0.25, 0.5, 0.75], num_buckets=num_buckets
        )
    stats_df = stats.to_pandas() if isinstance(stats, ray.data.Dataset) else stats
    p25 = f"{value_col}_p25"
    p50 = f"{value_col}_p50"
    p75 = f"{value_col}_p75"
    lookup = stats_df.set_index(id_col)[[p25, p50, p75]]
    ref = ray.put(lookup)

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        lk: pd.DataFrame = ray.get(ref)
        keys = batch[id_col].to_numpy()
        med = _probe_f64(keys, lk[p50])
        iqr = _probe_f64(keys, lk[p75]) - _probe_f64(keys, lk[p25])
        v = batch[value_col].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(iqr > 0, (v - med) / iqr, np.nan)
        out = batch.copy()
        out[out_col] = r
        return out

    return ds.map_batches(apply, batch_format="pandas")


def target_encode(
    ds: ray.data.Dataset,
    cat_col: str,
    target_col: str,
    *,
    smoothing: float = 20.0,
    out_col: str | None = None,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Smoothed target (mean) encoding — the classic high-cardinality
    categorical feature: ``enc(cat) = (Σ_cat target + m·global_mean) /
    (n_cat + m)``, shrinking rare categories toward the global mean.

    Same two-pass zero-fact-shuffle shape as ``zscore_per_entity``:
    a combiner (Σ, n) exchange reduces the facts to one row per
    category; the global mean comes from THOSE vocab-sized partials
    (Σ of sums / Σ of counts — never a second pass over the facts);
    the encoding table is broadcast and applied vectorized. A category
    with no non-null targets encodes null (SQL semantics). ``round_to``
    quantizes the encoding so SQL replay is immune to float
    summation-order ulp (the oracle derives everything from its own
    SUM/COUNT — see ``target_encode_events``).
    """
    stats = hash_groupby_aggregate(
        ds.select_columns([cat_col, target_col]),
        [cat_col],
        {"__s__": (target_col, "sum"), "__c__": (target_col, "count")},
    ).to_pandas()  # vocab-sized
    c = stats["__c__"].to_numpy(dtype=np.float64)
    s = stats["__s__"].to_numpy(dtype=np.float64)
    gm = s.sum() / c.sum()
    enc = (s + smoothing * gm) / (c + smoothing)
    enc = np.where(c > 0, enc, np.nan)
    if round_to is not None:
        enc = np.round(enc, round_to)
    table = dict(zip(stats[cat_col], enc))
    ref = ray.put(table)
    dst = out_col or f"{target_col}_te"

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)
        out = df.copy()
        out[dst] = _probe_f64(df[cat_col].to_numpy(), pd.Series(t))
        return out

    return ds.map_batches(apply, batch_format="pandas")


def frequency_encode(
    ds: ray.data.Dataset, cat_col: str, *, out_col: str | None = None
) -> ray.data.Dataset:
    """Frequency (count) encoding: each row gets its category's total
    row count — the cheap high-cardinality signal that often matches
    target encoding. One combiner count exchange to a vocab-sized
    table, broadcast, exact int64 (SQL replay is a COUNT(*) join)."""
    cnt = hash_groupby_aggregate(
        ds.select_columns([cat_col]), [cat_col], {"__c__": (None, "count")},
    ).to_pandas()
    table = dict(zip(cnt[cat_col], cnt["__c__"].astype(np.int64)))
    ref = ray.put(table)
    dst = out_col or f"{cat_col}_freq"

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[dst] = pd.Series(
            _probe_f64(df[cat_col].to_numpy(), pd.Series(ray.get(ref)))).astype("Int64")
        return out

    return ds.map_batches(apply, batch_format="pandas")


def equal_width_bin(
    ds: ray.data.Dataset, col: str, *, k: int, out_col: str | None = None
) -> ray.data.Dataset:
    """Equal-width discretization into ``k`` bins over the global
    [min, max]: ``bin = min(floor((x - lo) * k / (hi - lo)), k - 1)``.
    The boundary expression is written identically here and in the SQL
    oracle, so IEEE determinism makes every bin assignment bit-exact —
    no rounding tolerance needed. Min/max come from one tree-reduce
    (O(blocks) to the driver); the binning pass is zero-shuffle. Null
    and NaN values bin to null."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(col), Max(col))
    lo, hi = float(agg[f"min({col})"]), float(agg[f"max({col})"])
    dst = out_col or f"{col}_bin"

    def apply(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            b = np.floor((x - lo) * k / (hi - lo)) if hi > lo else np.zeros(len(x))
        b = np.minimum(b, k - 1)
        out = pd.array(np.nan_to_num(b, nan=0).astype(np.int64), dtype="Int64")
        out[np.isnan(x)] = pd.NA
        return batch.append_column(dst, pa.array(out))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def feature_cross(
    ds: ray.data.Dataset,
    cols: Sequence[str],
    *,
    num_bins: int = 1_000_000,
    out_col: str = "cross",
    sep: str = "#",
) -> ray.data.Dataset:
    """Hashing-trick feature cross: ``md5_lower64(a ‖ sep ‖ b ‖ ...) %
    num_bins`` — the classic bounded-cardinality interaction feature.
    Zero shuffle, vectorized, SQL-replayable bit-for-bit
    (``md5_number_lower(CAST(a AS VARCHAR) || sep || ...) % D``). Any
    null input yields a null cross (SQL ``||`` semantics)."""
    from ..stages.dedup import _md5_lower64

    cols = list(cols)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        bad = df[cols].isna().any(axis=1).to_numpy()
        key = df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key + sep + df[c].astype(str)
        h = _md5_lower64(key) % np.uint64(num_bins)
        res = pd.array(h.astype(np.int64), dtype="Int64")
        res[bad] = pd.NA
        out[out_col] = res
        return out

    return ds.map_batches(apply, batch_format="pandas")


def minmax_scale_per_group(
    ds: ray.data.Dataset,
    id_col: str,
    value_col: str,
    *,
    out_col: str | None = None,
    stats: "ray.data.Dataset | pd.DataFrame | None" = None,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Per-group min-max scaling to [0, 1]: ``(v - min_g) / (max_g -
    min_g)``, NaN where the group is constant (mirrors ``/ NULLIF(max -
    min, 0)``) — completes the scaler family (zscore / robust / minmax).
    Same two-pass zero-fact-shuffle shape: a combiner min/max exchange
    to one small row per group, broadcast, vectorized apply. Pass
    ``stats`` (from the TRAIN split) for leakage-safe val/test scaling."""
    out_col = out_col or f"{value_col}_mm"
    if stats is None:
        stats = hash_groupby_aggregate(
            ds.select_columns([id_col, value_col]), [id_col],
            {"__lo__": (value_col, "min"), "__hi__": (value_col, "max")},
        )
    stats_df = stats.to_pandas() if isinstance(stats, ray.data.Dataset) else stats
    lookup = stats_df.set_index(id_col)[["__lo__", "__hi__"]]
    ref = ray.put(lookup)

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        lk: pd.DataFrame = ray.get(ref)
        keys = batch[id_col].to_numpy()
        lo = _probe_f64(keys, lk["__lo__"])
        hi = _probe_f64(keys, lk["__hi__"])
        v = batch[value_col].to_numpy(dtype=np.float64)
        out = batch.copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = np.where(hi > lo, (v - lo) / (hi - lo), np.nan)
        out[out_col] = np.round(scaled, round_to) if round_to is not None else scaled
        return out

    return ds.map_batches(apply, batch_format="pandas")


def population_stability(
    ds: ray.data.Dataset,
    value_col: str,
    time_col: str,
    *,
    bins: int = 10,
    round_to: int = 6,
) -> pd.DataFrame:
    """Population Stability Index of ``value_col`` between the FIRST and
    SECOND half of the time range (split at the midpoint of
    [min ts, max ts]) — the standard drift monitor for features and
    labels. PSI = Σ (p−q)·ln(p/q) over ``bins`` equal-width bins of the
    global [min, max], with +0.5 Laplace smoothing per bin so empty
    bins stay finite AND the whole computation is SQL-replayable
    (shared bin expression with ``equal_width_bin``; integer counts are
    exact, the final 10-term float sum rounds at ``round_to``).

    Scale shape: one tree-reduce for the four extrema, then ONE
    zero-shuffle pass reducing every block to ≤ 2×bins count rows;
    only those partials reach the driver. Returns a 1-row DataFrame
    ``(psi, n_ref, n_cur)`` — a scalar monitoring result, not a
    Dataset."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(value_col), Max(value_col), Min(time_col), Max(time_col))
    lo, hi = float(agg[f"min({value_col})"]), float(agg[f"max({value_col})"])
    t_lo = pd.Timestamp(agg[f"min({time_col})"]).value // 1000
    t_hi = pd.Timestamp(agg[f"max({time_col})"]).value // 1000
    cut = (t_lo + t_hi) // 2
    k = bins

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        side = (ts_us > cut).astype(np.int64)
        with np.errstate(invalid="ignore"):
            b = np.floor((v - lo) * k / (hi - lo)) if hi > lo else np.zeros(len(v))
        b = np.minimum(b, k - 1)
        key = side[ok] * k + b[ok].astype(np.int64)
        cnt = np.bincount(key, minlength=2 * k)
        return pd.DataFrame({"key": np.arange(2 * k), "n": cnt.astype(np.int64)})

    parts = ds.select_columns([value_col, time_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    tot = parts.groupby("key")["n"].sum()
    n0 = tot.reindex(range(k), fill_value=0).to_numpy(dtype=np.float64)
    n1 = tot.reindex(range(k, 2 * k), fill_value=0).to_numpy(dtype=np.float64)
    t0, t1 = n0.sum(), n1.sum()
    p = (n0 + 0.5) / (t0 + 0.5 * k)
    q = (n1 + 0.5) / (t1 + 0.5 * k)
    psi = float(np.sum((p - q) * np.log(p / q)))
    scale = 10.0 ** round_to
    psi_q = np.sign(psi) * np.floor(abs(psi) * scale + 0.5) / scale  # SQL ROUND rule
    return pd.DataFrame({
        "psi": [psi_q],
        "n_ref": [np.int64(t0)],
        "n_cur": [np.int64(t1)],
    })


def grouped_moments(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    *,
    num_buckets: int = 32,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Per-group sample skewness and excess kurtosis with the standard
    small-sample bias corrections — DuckDB ``skewness()/kurtosis()``,
    pandas ``.skew()/.kurt()`` and this closed form agree to ~1e-12
    (verified empirically; the corrections are G1 = g1·√(n(n−1))/(n−2)
    and G2 = ((n+1)·g2 + 6)·(n−1)/((n−2)(n−3))).

    Shape: two streaming passes, ZERO shuffle of the fact table.

    1. combiner ``(Σv, n, min, max)`` exchange → per-group means
       (group-vocab-sized table pulled to the driver and broadcast via
       ``ray.put`` — the same vocabulary assumption as
       ``zscore_per_entity``; beyond ~10⁹ groups compute inside one
       entity-bucket exchange instead);
    2. per-block centered powers ``(v−μ_g)^{2,3,4}`` reduced through
       the same combiner sum exchange. Centering on the FINAL group
       mean is what makes order-3/4 power sums numerically viable:
       raw ``Σv⁴ − …`` telescopes lose essentially all digits, while
       central-moment sums of near-zero-mean terms keep them.

    NULL rules (= DuckDB): skewness NULL when ``n < 3`` or the group is
    constant; kurtosis NULL when ``n < 4`` or constant. Constancy is
    detected EXACTLY via the pass-1 ``min == max`` (a float variance
    threshold cannot distinguish a genuinely tiny spread from the ulp
    residue of ``v − Σv/n`` on a constant group — same lesson as the
    rolling-std precision contract in ``window_features``).

    Output: ``key_col, n (int64), skewness, kurtosis`` rounded to
    ``round_to`` (half-away-from-zero, the SQL ROUND rule).
    """
    base = ds.select_columns([key_col, value_col])
    stats = hash_groupby_aggregate(
        base,
        [key_col],
        {
            "__s__": (value_col, "sum"),
            "__n__": (value_col, "count"),
            "__lo__": (value_col, "min"),
            "__hi__": (value_col, "max"),
        },
        num_buckets=num_buckets,
    ).to_pandas()  # group-vocab-sized
    n1 = stats["__n__"].to_numpy(dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mu = stats["__s__"].to_numpy(dtype=np.float64) / n1
    means = dict(zip(stats[key_col], mu))
    const = set(stats.loc[stats["__lo__"] == stats["__hi__"], key_col])
    means_ref, const_ref = ray.put(means), ray.put(const)

    def centered(df: pd.DataFrame) -> pd.DataFrame:
        m = _probe_f64(df[key_col].to_numpy(), pd.Series(ray.get(means_ref)))
        c = df[value_col].to_numpy(dtype=np.float64) - m
        c2 = c * c
        return pd.DataFrame({
            key_col: df[key_col], "__c2__": c2, "__c3__": c2 * c, "__c4__": c2 * c2,
        })

    sums = hash_groupby_aggregate(
        base.map_batches(centered, batch_format="pandas"),
        [key_col],
        {
            "n": ("__c2__", "count"),
            "__m2__": ("__c2__", "sum"),
            "__m3__": ("__c3__", "sum"),
            "__m4__": ("__c4__", "sum"),
        },
        num_buckets=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        is_const = df[key_col].isin(ray.get(const_ref)).to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            m2 = df["__m2__"].to_numpy(dtype=np.float64) / n
            m3 = df["__m3__"].to_numpy(dtype=np.float64) / n
            m4 = df["__m4__"].to_numpy(dtype=np.float64) / n
            sk = np.sqrt(n * (n - 1.0)) / (n - 2.0) * m3 / np.power(m2, 1.5)
            g2 = m4 / (m2 * m2) - 3.0
            ku = ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))
        sk = np.where((n < 3) | is_const, np.nan, sk)
        ku = np.where((n < 4) | is_const, np.nan, ku)
        if round_to is not None:
            scale = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                sk = np.sign(sk) * np.floor(np.abs(sk) * scale + 0.5) / scale
                ku = np.sign(ku) * np.floor(np.abs(ku) * scale + 0.5) / scale
        return pd.DataFrame({
            key_col: df[key_col],
            "n": df["n"].astype(np.int64),
            "skewness": sk,
            "kurtosis": ku,
        })

    return sums.map_batches(finish, batch_format="pandas")


def winsorize_per_group(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    *,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group winsorization: clip ``value_col`` to the group's
    ``[q_lower, q_upper]`` exact quantiles — the outlier-robust feature
    transform (tail shocks stop dominating scale-sensitive models).

    Shape: ``grouped_quantile`` co-locates only the projected
    ``(key, value)`` pairs for the holistic quantile (one exchange of
    two columns), the group-vocab-sized bounds table broadcasts via
    ``ray.put``, and the clip is a zero-shuffle vectorized pass over
    the untouched fact stream.

    Precision contract: the BOUNDS are quantized to 6 decimals before
    clipping (half-away-from-zero, the SQL ROUND rule), not the
    output. numpy/pandas linear interpolation ``(1−g)·a + g·b`` and
    SQL ``quantile_cont``'s ``a + (b−a)·g`` differ by ulp; quantizing
    the bound collapses that, after which every comparison is against
    a bit-identical double and the clipped column needs NO rounding —
    unclipped rows pass through bit-exact. Null values stay null.
    """
    from .agg import grouped_quantile

    bounds = grouped_quantile(
        ds, key_col, value_col, q=[lower, upper], num_buckets=num_buckets
    ).to_pandas()  # group-vocab-sized
    lo_col, hi_col = bounds.columns[1], bounds.columns[2]
    scale = 1e6
    lo_q = np.sign(bounds[lo_col]) * np.floor(np.abs(bounds[lo_col]) * scale + 0.5) / scale
    hi_q = np.sign(bounds[hi_col]) * np.floor(np.abs(bounds[hi_col]) * scale + 0.5) / scale
    ref = ray.put(pd.DataFrame({key_col: bounds[key_col], "__lo__": lo_q, "__hi__": hi_q}))
    dst = out_col or f"{value_col}_wins"

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        m = df[[key_col]].merge(ray.get(ref), on=key_col, how="left")  # keeps row order
        v = df[value_col].to_numpy(dtype=np.float64)
        out = df.copy()
        out[dst] = np.minimum(
            np.maximum(v, m["__lo__"].to_numpy(np.float64)),
            m["__hi__"].to_numpy(np.float64),
        )
        return out

    return ds.map_batches(apply, batch_format="pandas")


def pairwise_corr(
    ds: ray.data.Dataset,
    target_col: str,
    feature_cols: Sequence[str],
    *,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Pearson correlation of each feature against the target — the
    feature-selection screen. SQL ``corr(x, y)`` semantics: pairwise
    complete (rows where BOTH are non-null), NULL when ``n < 2`` or
    either side is constant.

    Two streaming passes over only the projected columns, zero fact
    shuffle: pass 1 reduces each block to one long-form partial row per
    feature ``(n, Σx, Σy)`` on the pairwise mask (merged by the
    combiner exchange into per-feature means); pass 2 reduces centered
    ``Σcx², Σcy², Σcxcy`` the same way. Centering on the final pairwise
    means keeps the cross sums from cancellation (corr is scale-free,
    so the (n−1) factors cancel: r = Σcxcy / √(Σcx²·Σcy²)).

    Output: one row per feature — ``(feature, n, corr)``.
    """
    feats = list(feature_cols)
    proj = ds.select_columns([target_col, *feats])

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        y = df[target_col].to_numpy(dtype=np.float64)
        rows = []
        for f in feats:
            x = df[f].to_numpy(dtype=np.float64)
            ok = ~(np.isnan(x) | np.isnan(y))
            rows.append((f, int(ok.sum()), float(x[ok].sum()), float(y[ok].sum())))
        return pd.DataFrame(rows, columns=["feature", "__n__", "__sx__", "__sy__"])

    m = hash_groupby_aggregate(
        proj.map_batches(p1, batch_format="pandas"),
        ["feature"],
        {"n": ("__n__", "sum"), "sx": ("__sx__", "sum"), "sy": ("__sy__", "sum")},
        num_buckets=1,
    ).to_pandas()  # one row per feature
    with np.errstate(invalid="ignore", divide="ignore"):
        mx = dict(zip(m["feature"], m["sx"] / m["n"]))
        my = dict(zip(m["feature"], m["sy"] / m["n"]))
    mx_ref, my_ref = ray.put(mx), ray.put(my)

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        gx, gy = ray.get(mx_ref), ray.get(my_ref)
        y = df[target_col].to_numpy(dtype=np.float64)
        rows = []
        for f in feats:
            x = df[f].to_numpy(dtype=np.float64)
            ok = ~(np.isnan(x) | np.isnan(y))
            cx = x[ok] - gx[f]
            cy = y[ok] - gy[f]
            rows.append((f, float((cx * cx).sum()), float((cy * cy).sum()),
                         float((cx * cy).sum())))
        return pd.DataFrame(rows, columns=["feature", "__xx__", "__yy__", "__xy__"])

    s = hash_groupby_aggregate(
        proj.map_batches(p2, batch_format="pandas"),
        ["feature"],
        {"xx": ("__xx__", "sum"), "yy": ("__yy__", "sum"), "xy": ("__xy__", "sum")},
        num_buckets=1,
    ).to_pandas()
    s = s.merge(m[["feature", "n"]], on="feature")
    with np.errstate(invalid="ignore", divide="ignore"):
        r = s["xy"].to_numpy() / np.sqrt(s["xx"].to_numpy() * s["yy"].to_numpy())
    n = s["n"].to_numpy()
    r = np.where((n < 2) | (s["xx"].to_numpy() <= 0) | (s["yy"].to_numpy() <= 0), np.nan, r)
    if round_to is not None:
        scale = 10.0 ** round_to
        with np.errstate(invalid="ignore"):
            r = np.sign(r) * np.floor(np.abs(r) * scale + 0.5) / scale
    out = pd.DataFrame({"feature": s["feature"], "n": n.astype(np.int64), "corr": r})
    return ray.data.from_pandas(out.sort_values("feature").reset_index(drop=True))


def mutual_information(
    ds: ray.data.Dataset,
    cat_col: str,
    value_col: str,
    *,
    bins: int = 10,
    round_to: int | None = 6,
) -> pd.DataFrame:
    """Mutual information (nats) between a categorical column and an
    equal-width binning of a numeric column — the nonlinear
    feature-relevance score PSI/corr can't see.

    One tree-reduce for the value extrema, then ONE combiner count
    exchange of ``(cat, bin)`` pairs (bounded by |cats|·bins partial
    rows per block, never facts); the MI sum runs on the driver over
    the tiny joint table. Rows where either side is null are excluded
    (SQL aggregate semantics). The bin expression
    ``least(floor((v−lo)·k/(hi−lo)), k−1)`` is shared verbatim with the
    oracle so bin ids are IEEE-bit-exact.

    Returns a 1-row DataFrame ``(mi, n)`` — a scalar monitoring/ranking
    result, not a Dataset.
    """
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(agg[f"min({value_col})"]), float(agg[f"max({value_col})"])
    k = bins

    def to_bins(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        c = df[cat_col]
        ok = (~np.isnan(v)) & c.notna().to_numpy()
        with np.errstate(invalid="ignore"):
            b = np.floor((v - lo) * k / (hi - lo)) if hi > lo else np.zeros(len(v))
        b = np.minimum(b, k - 1)
        return pd.DataFrame({cat_col: c[ok], "__bin__": b[ok].astype(np.int64)})

    joint = hash_groupby_aggregate(
        ds.select_columns([cat_col, value_col]).map_batches(to_bins, batch_format="pandas"),
        [cat_col, "__bin__"],
        {"n": (None, "count")},
        num_buckets=1,
    ).to_pandas()  # |cats|·bins rows
    n = joint["n"].to_numpy(dtype=np.float64)
    total = n.sum()
    ni = joint.groupby(cat_col)["n"].transform("sum").to_numpy(dtype=np.float64)
    nj = joint.groupby("__bin__")["n"].transform("sum").to_numpy(dtype=np.float64)
    mi = float(np.sum((n / total) * np.log((n * total) / (ni * nj)))) if total > 0 else np.nan
    if round_to is not None and not np.isnan(mi):
        scale = 10.0 ** round_to
        mi = np.sign(mi) * np.floor(abs(mi) * scale + 0.5) / scale
    return pd.DataFrame({"mi": [mi], "n": [np.int64(total)]})


def ks_drift(
    ds: ray.data.Dataset,
    value_col: str,
    time_col: str,
    *,
    round_to: int | None = 6,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between the first
    and second halves of the time range — the sharp drift test next to
    the binned PSI (KS sees any CDF divergence, PSI only what its 10
    bins resolve). Same time cut as ``population_stability``:
    ``(epoch_us(min)+epoch_us(max)) // 2``, side = ts strictly after.

    Distributed exactness without materializing values on the driver:

    1. combiner count exchange reduces the stream to one
       ``(value, n_before, n_after)`` row per DISTINCT value — ties are
       collapsed here, so the CDF step at a tied value is evaluated
       once, after all its rows (the KS definition; a per-row running
       max would overestimate mid-tie);
    2. one distributed sort of that distinct table;
    3. the two-pass block scan of ``scan.global_running_sum``: pass 1
       ships O(blocks) ``(first_value, Σa, Σb)`` partials to the
       driver for exclusive offsets, pass 2 computes each block's
       running CDFs ``(off + cumsum)/n`` and reduces the block to ONE
       candidate max — the driver folds block maxima.

    All counts are int64; ``ca/na − cb/nb`` is evaluated with the same
    arithmetic as the SQL oracle, so the statistic is bit-stable at any
    parallelism. Returns a 1-row DataFrame ``(ks, n_ref, n_cur)``.
    """
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(time_col), Max(time_col))
    t_lo = pd.Timestamp(agg[f"min({time_col})"]).value // 1000
    t_hi = pd.Timestamp(agg[f"max({time_col})"]).value // 1000
    cut = (t_lo + t_hi) // 2

    def sides(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        after = ts_us > cut
        return pd.DataFrame({
            "v": v[ok],
            "__a__": (~after[ok]).astype(np.int64),
            "__b__": after[ok].astype(np.int64),
        })

    per_v = hash_groupby_aggregate(
        ds.select_columns([value_col, time_col]).map_batches(sides, batch_format="pandas"),
        ["v"],
        {"a": ("__a__", "sum"), "b": ("__b__", "sum")},
        num_buckets=num_buckets,
    )
    sorted_ds = per_v.sort("v").materialize()

    def _sig(t: pa.Table) -> str:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return repr((float(t.column("v")[0].as_py()), t.num_rows,
                     int(a.sum()), int(b.sum())))

    def part(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"v": pd.Series(dtype=np.float64),
                                 "__sig__": pd.Series(dtype=object),
                                 "sa": pd.Series(dtype=np.int64),
                                 "sb": pd.Series(dtype=np.int64)})
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pd.DataFrame({"v": [float(t.column("v")[0].as_py())],
                             "__sig__": [_sig(t)],
                             "sa": [int(a.sum())], "sb": [int(b.sum())]})

    parts = sorted_ds.map_batches(part, batch_size=None, batch_format="pyarrow").to_pandas()
    ordered = parts.sort_values("v", kind="mergesort").reset_index(drop=True)
    na = float(ordered["sa"].sum())
    nb = float(ordered["sb"].sum())
    if na == 0 or nb == 0:
        return pd.DataFrame({"ks": [np.nan], "n_ref": [np.int64(na)], "n_cur": [np.int64(nb)]})
    offa = np.concatenate(([0], np.cumsum(ordered["sa"].to_numpy())[:-1]))
    offb = np.concatenate(([0], np.cumsum(ordered["sb"].to_numpy())[:-1]))
    off_ref = ray.put(dict(zip(ordered["__sig__"], zip(offa, offb))))

    def block_max(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"d": pd.Series(dtype=np.float64)})
        oa, ob = ray.get(off_ref)[_sig(t)]
        ca = np.cumsum(t.column("a").to_numpy(zero_copy_only=False)) + np.int64(oa)
        cb = np.cumsum(t.column("b").to_numpy(zero_copy_only=False)) + np.int64(ob)
        d = np.abs(ca / na - cb / nb).max()
        return pd.DataFrame({"d": [float(d)]})

    dmax = sorted_ds.map_batches(block_max, batch_size=None, batch_format="pyarrow") \
        .to_pandas()["d"].max()
    ks = float(dmax)
    if round_to is not None:
        scale = 10.0 ** round_to
        ks = np.sign(ks) * np.floor(abs(ks) * scale + 0.5) / scale
    return pd.DataFrame({"ks": [ks], "n_ref": [np.int64(na)], "n_cur": [np.int64(nb)]})


def impute_per_group(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    *,
    strategy: str = "median",
    out_col: str | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-group missing-value imputation — nulls become the group's
    median (robust default) or mean. Same two-pass zero-fact-shuffle
    shape as ``winsorize_per_group``: the group statistic comes from
    one projected-pair exchange (``grouped_quantile``) or a combiner
    pass (mean), the vocab-sized fill table broadcasts, and the fill is
    a vectorized ``where`` over the untouched fact stream.

    Precision contract: the FILL value is quantized to 6 decimals
    (half-away-from-zero) so both engines substitute a bit-identical
    double; non-null rows pass through bit-exact with no rounding. A
    group whose values are all null fills nothing (stays null — SQL
    ``COALESCE`` with a null aggregate).
    """
    if strategy not in ("median", "mean"):
        raise ValueError(f"impute_per_group: unknown strategy '{strategy}'")
    if strategy == "median":
        from .agg import grouped_quantile

        stats = grouped_quantile(ds, key_col, value_col, q=0.5,
                                 num_buckets=num_buckets).to_pandas()
        fill = stats.iloc[:, 1].to_numpy(dtype=np.float64)
        keys = stats[key_col]
    else:
        stats = hash_groupby_aggregate(
            ds.select_columns([key_col, value_col]), [key_col],
            {"__s__": (value_col, "sum"), "__n__": (value_col, "count")},
            num_buckets=num_buckets).to_pandas()
        with np.errstate(invalid="ignore", divide="ignore"):
            fill = np.where(stats["__n__"] > 0,
                            stats["__s__"] / stats["__n__"], np.nan)
        keys = stats[key_col]
    scale = 1e6
    with np.errstate(invalid="ignore"):
        fill = np.sign(fill) * np.floor(np.abs(fill) * scale + 0.5) / scale
    ref = ray.put(pd.DataFrame({key_col: keys, "__fill__": fill}))
    dst = out_col or f"{value_col}_imputed"

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        m = df[[key_col]].merge(ray.get(ref), on=key_col, how="left")
        v = df[value_col].to_numpy(dtype=np.float64)
        out = df.copy()
        out[dst] = np.where(np.isnan(v), m["__fill__"].to_numpy(np.float64), v)
        return out

    return ds.map_batches(apply, batch_format="pandas")


def add_cume_dist(
    ds: ray.data.Dataset,
    value_col: str,
    *,
    out_col: str | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Global empirical-CDF transform: each row gets
    ``P(value ≤ v) = (# non-null rows ≤ v) / N`` — SQL ``CUME_DIST()``,
    the probability-integral-transform feature (rank-normalization that
    is monotone, bounded, and robust to any marginal distribution).
    Nulls map to null.

    Distributed exactness without ranking the fact table: (1) the
    distinct-value combiner reduces the stream to ``(value, count)``
    (ties collapse here, so tied rows share one CDF step — the
    CUME_DIST rule); (2) ``scan.global_running_sum`` turns the sorted
    distinct table into inclusive cumulative counts with O(blocks)
    driver traffic; (3) the facts pick up their value's CDF through an
    ``equi_join`` on the value itself (auto plan: broadcast while the
    distinct table is small, one bucketed exchange at scale). Counts
    are int64, the division is the same two integers in both engines —
    bit-exact, no rounding.

    Join-key canonicalization: ``−0.0`` is normalized to ``+0.0``
    (``v + 0.0``) on BOTH sides before grouping and joining — the two
    zeros compare equal (one CDF step, the SQL order) but their BYTES
    differ, so a byte-hash bucket exchange splits them into two
    distinct rows and routes facts away from their CDF row (caught by
    the unit test: two adjacent CDF steps for the same value).
    """
    from .join import equi_join
    from .scan import global_running_sum

    dst = out_col or f"{value_col}_cume"
    vkey = "__vkey__"

    def keyed(t: pa.Table) -> pa.Table:
        v = pa.compute.add(t.column(value_col), pa.scalar(0.0))  # -0.0 -> +0.0
        return t.append_column(vkey, v)

    facts = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)

    def distinct_in(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.is_valid(t.column(vkey)))
        return t.select([vkey])

    counts = hash_groupby_aggregate(
        facts.map_batches(distinct_in, batch_format="pyarrow", zero_copy_batch=True),
        [vkey],
        {"__n__": (None, "count")},
        num_buckets=num_buckets,
    )
    ranks = global_running_sum(counts, order_by=[vkey], value_col="__n__",
                               out_col="__cum__").materialize()
    total = int(ranks.max("__cum__"))

    def finish(t: pa.Table) -> pa.Table:
        cum = t.column("__cum__").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            vkey: t.column(vkey),
            dst: pa.array(cum / float(total)),
        })

    cdf = ranks.map_batches(finish, batch_format="pyarrow")
    joined = equi_join(facts, cdf, on=vkey, how="left")
    return joined.map_batches(lambda t: t.drop_columns([vkey]),
                              batch_format="pyarrow", zero_copy_batch=True)


def grouped_ols(
    ds: ray.data.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    num_buckets: int = 32,
    round_to: int | None = 6,
) -> ray.data.Dataset:
    """Per-group simple linear regression (OLS slope + intercept of y on
    x) — the whole-history trend profile beside the windowed
    ``add_rolling_slope``. SQL ``regr_slope / regr_intercept``
    semantics: pairwise-complete rows, NULL when fewer than 2 pairs or
    x is constant within the group (verified: DuckDB returns NULL for
    both).

    Same two-pass combiner shape as ``grouped_moments``: pass 1 reduces
    to per-group ``(n, Σx, Σy, min x, max x)``; pass 2 reduces centered
    ``Σcx², Σcx·cy`` — centering on the final group means keeps the
    cross sums conditioned regardless of where x lives (callers should
    still feed a sane x origin, e.g. hours since stream start, so the
    INTERCEPT extrapolates to something meaningful). Constant-x is
    detected exactly via min == max, never a variance floor. Facts are
    scanned twice and never shuffled.

    Output: ``key, n (int64), slope, intercept`` rounded to
    ``round_to``.
    """
    proj = ds.select_columns([key_col, x_col, y_col])

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        sub = pd.DataFrame({key_col: df[key_col][ok], "__x__": x[ok], "__y__": y[ok]})
        return sub

    m = hash_groupby_aggregate(
        proj.map_batches(p1, batch_format="pandas"),
        [key_col],
        {"n": ("__x__", "count"), "sx": ("__x__", "sum"), "sy": ("__y__", "sum"),
         "lo": ("__x__", "min"), "hi": ("__x__", "max")},
        num_buckets=num_buckets,
    ).to_pandas()
    with np.errstate(invalid="ignore", divide="ignore"):
        mx = m["sx"].to_numpy() / m["n"].to_numpy()
        my = m["sy"].to_numpy() / m["n"].to_numpy()
    means = pd.DataFrame({key_col: m[key_col], "__mx__": mx, "__my__": my})
    means_ref = ray.put(means)
    const = set(m.loc[m["lo"] == m["hi"], key_col])
    const_ref = ray.put(const)

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        mm = df[[key_col]].merge(ray.get(means_ref), on=key_col, how="left")
        cx = x - mm["__mx__"].to_numpy()
        cy = y - mm["__my__"].to_numpy()
        return pd.DataFrame({
            key_col: df[key_col][ok],
            "__xx__": (cx * cx)[ok],
            "__xy__": (cx * cy)[ok],
        })

    stats_ref = ray.put(m[[key_col, "n"]].merge(means, on=key_col))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mm = df[[key_col]].merge(ray.get(stats_ref), on=key_col, how="left")
        n = mm["n"].to_numpy(dtype=np.float64)
        is_const = df[key_col].isin(ray.get(const_ref)).to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = df["xy"].to_numpy() / df["xx"].to_numpy()
            intercept = mm["__my__"].to_numpy() - slope * mm["__mx__"].to_numpy()
        bad = (n < 2) | is_const
        slope = np.where(bad, np.nan, slope)
        intercept = np.where(bad, np.nan, intercept)
        if round_to is not None:
            scale = 10.0 ** round_to
            with np.errstate(invalid="ignore"):
                slope = np.sign(slope) * np.floor(np.abs(slope) * scale + 0.5) / scale
                intercept = np.sign(intercept) * np.floor(
                    np.abs(intercept) * scale + 0.5) / scale
        return pd.DataFrame({key_col: df[key_col], "n": mm["n"].astype(np.int64),
                             "slope": slope, "intercept": intercept})

    return hash_groupby_aggregate(
        proj.map_batches(p2, batch_format="pandas"),
        [key_col],
        {"xx": ("__xx__", "sum"), "xy": ("__xy__", "sum")},
        num_buckets=num_buckets,
    ).map_batches(finish, batch_format="pandas")


def approx_quantile_hist(
    ds: ray.data.Dataset,
    value_col: str,
    qs: Sequence[float],
    *,
    bins: int = 1024,
    num_buckets: int = 8,
) -> pd.DataFrame:
    """Sort-free quantile ESTIMATE — the monitoring-grade scale path the
    exact operator (``exact_quantiles``, one global sort) is too heavy
    for: one min/max tree-reduce plus one combiner count exchange of at
    most ``bins`` partial rows per block, never a sort, never the
    column on the driver. The estimate is the RIGHT EDGE of the
    equal-width bin containing rank ``ceil(q·N)``, so the error is
    bounded by one bin width ``(max−min)/bins`` — deterministic, not
    probabilistic, and every arithmetic step (bin expression, float
    rank, edge interpolation) is shared verbatim with the SQL replay,
    making even this APPROXIMATION bit-exactly reproducible across
    engines. Nulls ignored; an empty or all-null column yields zero rows\n    (SQL bin-join parity).

    Returns a small driver DataFrame ``(q, value)``.
    """
    from ray.data.aggregate import Max, Min

    qs = list(qs)
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("approx_quantile_hist: q values must be in [0, 1]")
    agg = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = agg[f"min({value_col})"], agg[f"max({value_col})"]
    if lo is None or (isinstance(lo, float) and np.isnan(lo)):
        # empty / all-null column: SQL's bin-join replay emits NO rows
        return pd.DataFrame({"q": np.array([], dtype=np.float64),
                             "value": np.array([], dtype=np.float64)})
    lo, hi = float(lo), float(hi)
    k = bins

    def to_bins(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        with np.errstate(invalid="ignore"):
            b = np.floor((v - lo) * k / (hi - lo)) if hi > lo else np.zeros(len(v))
        b = np.minimum(b, k - 1).astype(np.int64)
        cnt = np.bincount(b, minlength=k)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"__bin__": nz, "__n__": cnt[nz].astype(np.int64)})

    counts = hash_groupby_aggregate(
        ds.select_columns([value_col]).map_batches(to_bins, batch_format="pandas"),
        ["__bin__"],
        {"n": ("__n__", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values("__bin__")  # ≤ bins rows
    cum = counts["n"].cumsum().to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return pd.DataFrame({"q": np.array([], dtype=np.float64),
                             "value": np.array([], dtype=np.float64)})
    out = []
    for q in qs:
        # float rank on purpose: ceil(q·N) in IEEE arithmetic, shared
        # with SQL CEILING(q * N) — consistency beats intuition at the
        # representability edge (e.g. 0.99 * 10000 = 9900.000...02)
        rank = max(1.0, np.ceil(q * total))
        idx = int(np.searchsorted(cum, rank, side="left"))
        b = int(counts["__bin__"].to_numpy()[idx])
        est = lo + (b + 1) * (hi - lo) / k if hi > lo else lo
        out.append(est)
    return pd.DataFrame({"q": qs, "value": out})


def roc_auc(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    *,
    round_to: int | None = 6,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """EXACT distributed ROC-AUC (= the Mann–Whitney U statistic,
    average-rank tie handling) — model evaluation at corpus scale
    without ranking the fact table on the driver: rows collapse to one
    ``(score, n_pos, n_neg)`` row per DISTINCT score in the combiner,
    ``scan.global_running_sum`` gives each distinct score its exclusive
    preceding-row count, and the rank identity
    ``AUC = (Σ_pos avg_rank − n⁺(n⁺+1)/2) / (n⁺·n⁻)`` finishes with
    O(blocks) driver traffic. A tie group's average rank is
    ``cum_before + (cnt+1)/2``; every term is a HALF-INTEGER, exactly
    representable in float64, so the sum — and therefore the AUC — is
    bit-identical to the SQL ``RANK() + (c−1)/2`` replay in any
    summation order. Rows with a null score or label are excluded;
    single-class inputs yield NaN.

    Returns a 1-row DataFrame ``(auc, n_pos, n_neg)``.
    """
    from .scan import global_running_sum

    def sides(df: pd.DataFrame) -> pd.DataFrame:
        s = df[score_col].to_numpy(dtype=np.float64)
        y = df[label_col]
        ok = (~np.isnan(s)) & y.notna().to_numpy()
        pos = (y[ok].to_numpy() != 0).astype(np.int64)
        return pd.DataFrame({"v": s[ok] + 0.0,  # -0.0 -> +0.0 (one rank step)
                             "__p__": pos, "__n__": 1 - pos})

    per_v = hash_groupby_aggregate(
        ds.select_columns([score_col, label_col]).map_batches(
            sides, batch_format="pandas"),
        ["v"],
        {"p": ("__p__", "sum"), "n": ("__n__", "sum")},
        num_buckets=num_buckets,
    )

    def with_tot(t: pa.Table) -> pa.Table:
        p = t.column("p").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        return t.append_column("__t__", pa.array((p + n).astype(np.int64)))

    ranked = global_running_sum(
        per_v.map_batches(with_tot, batch_format="pyarrow", zero_copy_batch=True),
        order_by=["v"], value_col="__t__", out_col="__before__", exclusive=True,
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        p = t.column("p").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        before = t.column("__before__").to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = p + n
        contrib = p * (before + (cnt + 1.0) / 2.0)   # half-integers: exact
        return pd.DataFrame({"s": [float(contrib.sum())],
                             "np": [int(p.sum())], "nn": [int(n.sum())]})

    parts = ranked.map_batches(partial, batch_size=None,
                               batch_format="pyarrow").to_pandas()
    s = float(parts["s"].sum())
    n_pos, n_neg = int(parts["np"].sum()), int(parts["nn"].sum())
    if n_pos == 0 or n_neg == 0:
        auc = float("nan")
    else:
        auc = (s - n_pos * (n_pos + 1) / 2.0) / (float(n_pos) * float(n_neg))
        if round_to is not None:
            scale = 10.0 ** round_to
            auc = np.sign(auc) * np.floor(abs(auc) * scale + 0.5) / scale
    return pd.DataFrame({"auc": [auc], "n_pos": [np.int64(n_pos)],
                         "n_neg": [np.int64(n_neg)]})


def grouped_quantile_hist(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    qs: Sequence[float],
    *,
    bins: int = 256,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Per-group sort-free quantile ESTIMATES — the bounded-exchange
    scale path beside the exact ``agg.grouped_quantile`` (which must
    co-locate every (key, value) pair because quantiles are holistic).
    Here the exchange carries at most ``groups × bins`` combiner rows
    per block: per-group extrema from one min/max combiner pass
    (broadcast, vocab-sized), then per-group equal-width bin counts,
    then a per-bucket rank pick. Same estimate contract as
    ``approx_quantile_hist``: right edge of the bin holding rank
    ``ceil(q·N_g)``, error ≤ one bin width ``(max_g−min_g)/bins`` per
    group, every arithmetic step shared verbatim with the SQL replay —
    a bit-exact approximation. Nulls ignored; a group whose values are
    all null emits nothing; a constant group estimates its constant.

    Output: one row per group per q — ``(key, q, value)``.
    """
    from .grouped import BUCKET_COL, with_bucket

    qs = list(qs)
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("grouped_quantile_hist: q values must be in [0, 1]")
    k = bins
    ext = hash_groupby_aggregate(
        ds.select_columns([key_col, value_col]),
        [key_col],
        {"__lo__": (value_col, "min"), "__hi__": (value_col, "max"),
         "__n__": (value_col, "count")},
        num_buckets=num_buckets,
    ).to_pandas()  # vocab-sized
    ext = ext[ext["__n__"] > 0]
    ref = ray.put(ext[[key_col, "__lo__", "__hi__"]])

    def to_bins(df: pd.DataFrame) -> pd.DataFrame:
        m = df[[key_col]].merge(ray.get(ref), on=key_col, how="left")
        v = df[value_col].to_numpy(dtype=np.float64)
        lo = m["__lo__"].to_numpy(np.float64)
        hi = m["__hi__"].to_numpy(np.float64)
        ok = ~np.isnan(v)
        with np.errstate(invalid="ignore", divide="ignore"):
            b = np.where(hi > lo, np.floor((v - lo) * k / (hi - lo)), 0.0)
        b = np.minimum(b, k - 1)
        return pd.DataFrame({key_col: df[key_col][ok],
                             "__bin__": b[ok].astype(np.int64)})

    counts = hash_groupby_aggregate(
        ds.select_columns([key_col, value_col]).map_batches(to_bins, batch_format="pandas"),
        [key_col, "__bin__"],
        {"n": (None, "count")},
        num_buckets=num_buckets,
    )
    bucketed = with_bucket(counts, key_col, num_buckets)
    qs_arr = np.asarray(qs, dtype=np.float64)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[BUCKET_COL]).sort_values([key_col, "__bin__"],
                                                     kind="mergesort")
        lk = ray.get(ref).set_index(key_col)
        out_k, out_q, out_v = [], [], []
        for key, sub in g.groupby(key_col, sort=False):
            cum = sub["n"].cumsum().to_numpy()
            total = int(cum[-1])
            lo = float(lk.loc[key, "__lo__"])
            hi = float(lk.loc[key, "__hi__"])
            b_arr = sub["__bin__"].to_numpy()
            for q in qs_arr:
                rank = max(1.0, np.ceil(q * total))  # float on purpose (see approx_quantile_hist)
                b = int(b_arr[int(np.searchsorted(cum, rank, side="left"))])
                est = lo + (b + 1) * (hi - lo) / k if hi > lo else lo
                out_k.append(key)
                out_q.append(float(q))
                out_v.append(est)
        return pd.DataFrame({key_col: out_k, "q": out_q, "value": out_v})

    return bucketed.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def spearman_corr(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    *,
    round_to: int = 6,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Global Spearman rank correlation between two columns — the
    robust (monotone-invariant, outlier-resistant) dependence measure
    next to the Pearson ``feature_corr``. Pairwise-complete: rows with
    either side null are excluded BEFORE ranking. Returns a one-row
    frame ``(n_pairs, spearman)``; null when fewer than 2 pairs or
    either side constant.

    Never ranks the fact table: each side reduces to its distinct
    values (combiner), ``scan.global_running_sum`` turns the sorted
    distinct table into inclusive cumulative counts with O(blocks)
    driver traffic, and average ranks ``(cum − n) + (n+1)/2`` — exact
    half-integers, equal to SQL ``RANK() + (ties−1)/2`` — join back to
    the facts through the size-adaptive ``equi_join`` (the ECDF shape,
    twice). The Pearson finish is one combiner moments pass; the
    result is quantized to ``round_to`` dp (half-away-from-zero)
    because DuckDB's incremental covariance and the closed form agree
    past 1e-12 but not bitwise. Join keys canonicalize −0.0 → +0.0 on
    both sides (equal values must share one rank row; their bytes hash
    apart).

    The two-column projection is materialized once (it feeds both rank
    builders and the join) — 2 float64 columns, never the full table.
    """
    import pyarrow.compute as pc

    from .join import equi_join
    from .scan import global_running_sum

    vx, vy, rx, ry = "__spx__", "__spy__", "__rkx__", "__rky__"

    def keyed(t: pa.Table) -> pa.Table:
        x = pc.add(pc.cast(t.column(x_col), pa.float64()), pa.scalar(0.0))
        y = pc.add(pc.cast(t.column(y_col), pa.float64()), pa.scalar(0.0))
        out = pa.table({vx: x, vy: y})
        return out.filter(pc.and_(pc.is_valid(x), pc.is_valid(y)))

    facts = ds.map_batches(keyed, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    def rank_table(col: str, rcol: str) -> ray.data.Dataset:
        counts = hash_groupby_aggregate(
            facts.map_batches(lambda t, c=col: t.select([c]),
                              batch_format="pyarrow", zero_copy_batch=True),
            [col], {"__n__": (None, "count")}, num_buckets=num_buckets)
        ranks = global_running_sum(counts, order_by=[col],
                                   value_col="__n__", out_col="__cum__")

        def fin(t: pa.Table, c=col, r=rcol) -> pa.Table:
            cum = t.column("__cum__").to_numpy(zero_copy_only=False).astype(np.float64)
            n = t.column("__n__").to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({c: t.column(c), r: (cum - n) + (n + 1) / 2.0})

        return ranks.map_batches(fin, batch_format="pyarrow")

    j = equi_join(facts, rank_table(vx, rx), on=vx, num_buckets=num_buckets)
    j = equi_join(j, rank_table(vy, ry), on=vy, num_buckets=num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        a = t.column(rx).to_numpy(zero_copy_only=False)
        b = t.column(ry).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([float(len(a))]), "sx": pa.array([a.sum()]),
            "sy": pa.array([b.sum()]), "sxx": pa.array([(a * a).sum()]),
            "syy": pa.array([(b * b).sum()]), "sxy": pa.array([(a * b).sum()]),
        })

    tot = j.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = float(tot["n"])
    rho = np.nan
    if n >= 2:
        cov = tot["sxy"] - tot["sx"] * tot["sy"] / n
        vxx = tot["sxx"] - tot["sx"] ** 2 / n
        vyy = tot["syy"] - tot["sy"] ** 2 / n
        if vxx > 0 and vyy > 0:
            r = cov / np.sqrt(vxx * vyy)
            scale = 10.0 ** round_to
            rho = float(np.sign(r) * np.floor(np.abs(r) * scale + 0.5) / scale)
    return pd.DataFrame({"n_pairs": [int(n)], "spearman": [rho]})


def target_encode_expanding_daily(
    ds: ray.data.Dataset,
    *,
    cat_col: str,
    target_col: str,
    time_col: str,
    out_col: str | None = None,
    scale: float = 100.0,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """LEAKAGE-FREE target encoding: each row gets the mean target over
    all STRICTLY EARLIER DAYS for its category — the as-of-date
    aggregate a production feature store serves, where the whole-corpus
    ``target_encode`` (which sees the row's own day, including the row
    itself) would leak the label into training. Rows of a category's
    first observed day get null (no history ≠ zero).

    Shape: one combiner pass reduces the stream to the (category × day)
    grid of integer-unit target sums and counts; the exclusive per-
    category prefix runs on the driver over that VOCAB-SIZED grid (types
    × days — never row-scale); the encoded values broadcast once into a
    zero-shuffle vectorized merge. Exactness: sums are int64 units
    (``sign·floor(|x|·scale+½)`` — half-away, matching SQL ROUND), prefixes
    are exact integer arithmetic, and the
    finish ``cs / cc / scale`` is the same two divisions in both
    engines — bit-exact, SQL-replayable.
    """
    import ray as _ray

    dst = out_col or f"{target_col}_te_asof"
    day_col = "__ted_day__"

    def part(b: pd.DataFrame) -> pd.DataFrame:
        v = b[target_col].to_numpy(dtype=np.float64)
        units = np.sign(v) * np.floor(np.abs(v) * scale + 0.5)
        df = pd.DataFrame({
            cat_col: b[cat_col].to_numpy(),
            day_col: (b[time_col].to_numpy().astype("datetime64[us]")
                      .astype(np.int64) // 86_400_000_000),
            "__s__": np.where(np.isnan(v), 0, units).astype(np.int64),
            "__c__": (~np.isnan(v)).astype(np.int64),
        })
        return df.groupby([cat_col, day_col], sort=False).sum().reset_index()

    grid = hash_groupby_aggregate(
        ds.select_columns([cat_col, target_col, time_col]).map_batches(
            part, batch_format="pandas"),
        [cat_col, day_col],
        {"__s__": ("__s__", "sum"), "__c__": ("__c__", "sum")},
        num_buckets=num_buckets,
    ).to_pandas().sort_values([cat_col, day_col], kind="mergesort")

    gb = grid.groupby(cat_col, sort=False)
    cs = (gb["__s__"].cumsum() - grid["__s__"]).to_numpy(dtype=np.int64)
    cc = (gb["__c__"].cumsum() - grid["__c__"]).to_numpy(dtype=np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        enc = np.where(cc > 0, cs.astype(np.float64) / cc / scale, np.nan)
    lut = pd.DataFrame({cat_col: grid[cat_col].to_numpy(),
                        day_col: grid[day_col].to_numpy(), dst: enc})
    ref = _ray.put(lut)

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        table: pd.DataFrame = _ray.get(ref)
        out = b.copy()
        out[day_col] = (b[time_col].to_numpy().astype("datetime64[us]")
                        .astype(np.int64) // 86_400_000_000)
        out = out.merge(table, on=[cat_col, day_col], how="left")
        return out.drop(columns=[day_col])

    return ds.map_batches(attach, batch_format="pandas")


def psi_daily(
    ds: ray.data.Dataset,
    value_col: str,
    time_col: str,
    *,
    bins: int = 10,
    round_to: int = 6,
) -> pd.DataFrame:
    """Day-over-day Population Stability Index time series — the
    production drift MONITOR (one PSI per calendar day vs the previous
    calendar day) rather than the one-shot first/second-half probe of
    ``population_stability``. Same bin expression, same +0.5 Laplace
    smoothing, same exact-integer counts; a day emits a row only when
    the previous calendar day was also observed.

    Scale shape: one tree-reduce for the value extrema, then ONE
    zero-shuffle pass reducing every block to its (day, bin) counts;
    the exchange/merge carries ≤ days × bins rows and the per-day
    window math runs on that DAYS-sized aggregate on the driver (a
    deliberate small-result finish — the fact table is touched once).
    Returns ``(day, psi, n_ref, n_cur)`` with ``day`` the int64 epoch
    day of the CURRENT side."""
    from ray.data.aggregate import Max, Min

    from .grouped import hash_groupby_aggregate

    agg = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = float(agg[f"min({value_col})"]), float(agg[f"max({value_col})"])
    k = bins
    DAY_US = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        day = ts_us // DAY_US
        with np.errstate(invalid="ignore"):
            b = np.floor((v - lo) * k / (hi - lo)) if hi > lo else np.zeros(len(v))
        b = np.minimum(b, k - 1)
        out = pd.DataFrame({"day": day[ok], "b": b[ok].astype(np.int64)})
        return out.groupby(["day", "b"], sort=False).size().reset_index(name="n")

    parts = hash_groupby_aggregate(
        ds.select_columns([value_col, time_col]).map_batches(partial, batch_format="pandas"),
        ["day", "b"], {"n": ("n", "sum")}, num_buckets=8,
    ).to_pandas()  # days × bins RESULT
    if not len(parts):
        return pd.DataFrame({"day": pd.array([], dtype="int64"), "psi": [],
                             "n_ref": pd.array([], dtype="int64"),
                             "n_cur": pd.array([], dtype="int64")})
    grid = parts.pivot_table(index="day", columns="b", values="n",
                             fill_value=0, aggfunc="sum") \
        .reindex(columns=range(k), fill_value=0).sort_index()
    days = grid.index.to_numpy(np.int64)
    counts = grid.to_numpy(np.float64)
    tots = counts.sum(axis=1)
    rows = []
    scale = 10.0 ** round_to
    for i in range(1, len(days)):
        if days[i] - days[i - 1] != 1:
            continue
        p = (counts[i - 1] + 0.5) / (tots[i - 1] + 0.5 * k)
        q = (counts[i] + 0.5) / (tots[i] + 0.5 * k)
        psi = float(np.sum((q - p) * np.log(q / p)))
        psi = np.sign(psi) * np.floor(abs(psi) * scale + 0.5) / scale
        rows.append((days[i], psi, int(tots[i - 1]), int(tots[i])))
    out = pd.DataFrame(rows, columns=["day", "psi", "n_ref", "n_cur"])
    out["day"] = out["day"].astype(np.int64)
    out["n_ref"] = out["n_ref"].astype(np.int64)
    out["n_cur"] = out["n_cur"].astype(np.int64)
    return out


def seasonal_deviation(
    ds: ray.data.Dataset,
    *,
    time_col: str,
    value_col: str,
    by: str,
    round_to: int = 6,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Seasonality-adjusted deviation feature: every row gains its
    ``(by, hour-of-day)`` corpus baseline mean and the residual
    ``value − baseline`` — the de-seasonalized input an anomaly model
    wants instead of the raw value (a 3am spike is not a 3pm spike).
    One combiner pass reduces each block to ≤ |by|×24 (Σ, n) partials,
    the tiny baseline table broadcasts, and the attach is zero-shuffle.
    Baselines are quantized at ``round_to`` BEFORE the residual so the
    subtraction is bit-exact and SQL-replayable; null values get null
    residuals and don't contribute to the baseline."""
    import ray as _ray

    from .grouped import hash_groupby_aggregate

    HOUR_US = 3_600_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        hod = (ts_us // HOUR_US) % 24
        d = pd.DataFrame({by: df[by], "__h__": hod, "__s__": np.where(ok, v, 0.0),
                          "__n__": ok.astype(np.int64)})
        return d.groupby([by, "__h__"], sort=False, dropna=False) \
            .sum().reset_index()

    base = hash_groupby_aggregate(
        ds.select_columns([by, time_col, value_col]).map_batches(partial, batch_format="pandas"),
        [by, "__h__"], {"s": ("__s__", "sum"), "n": ("__n__", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()  # |by|×24-sized
    scale = 10.0 ** round_to
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = base["s"].to_numpy(np.float64) / base["n"].to_numpy(np.float64)
    mean = np.sign(mean) * np.floor(np.abs(mean) * scale + 0.5) / scale
    table = {(g, int(h)): m for g, h, m in zip(base[by], base["__h__"], mean)}
    ref = _ray.put(table)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        t = _ray.get(ref)
        ts_us = df[time_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        hod = (ts_us // HOUR_US) % 24
        keys = list(zip(df[by], hod))
        m = {k: t.get(k, np.nan) for k in set(keys)}
        baseline = np.fromiter((m[k] for k in keys), dtype=np.float64, count=len(keys))
        v = df[value_col].to_numpy(np.float64)
        resid = v - baseline
        resid = np.sign(resid) * np.floor(np.abs(resid) * scale + 0.5) / scale
        out = df.copy()
        out["baseline"] = baseline
        out["deviation"] = resid
        return out

    return ds.map_batches(attach, batch_format="pandas")


def median_absolute_deviation(ds: ray.data.Dataset, col: str) -> pd.DataFrame:
    """Global median and MAD (median of |x − median|) — the robust
    location/scale pair an outlier gate should use instead of mean/std
    (one corrupted shard can move a mean arbitrarily; it cannot move a
    median). Two exact lower-rank quantile passes (distributed sort +
    ``split_at_indices`` rank fetch — the data never reaches the
    driver); the absolute deviations are a zero-shuffle projection, and
    both emitted values are raw data points, so no rounding tolerance
    is needed anywhere. Assumes a non-null column (filter upstream)."""
    med_df = exact_quantiles(ds, col, [0.5])
    if len(med_df) == 0:
        # empty input: no median exists — emit zero rows like the SQL
        # rank-join replay, not a NaN row
        return pd.DataFrame({"median": np.array([], dtype=np.float64),
                             "mad": np.array([], dtype=np.float64)})
    med = float(med_df["value"].iloc[0])

    def dev(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        return pa.table({"__ad__": pa.array(np.abs(v - med))})

    devs = ds.select_columns([col]).map_batches(dev, batch_format="pyarrow")
    mad = float(exact_quantiles(devs, "__ad__", [0.5])["value"].iloc[0])
    return pd.DataFrame({"median": [med], "mad": [mad]})


def theil_sen_by_entity(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_col: str,
    out_col: str = "ts_slope",
    per_unit_us: float = 3_600_000_000.0,
    round_to: int | None = 6,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity Theil–Sen slope (median of all pairwise slopes,
    units per ``per_unit_us`` µs — default units/hour): the robust
    trend estimate a single corrupted reading cannot move, unlike the
    OLS slope (``grouped_trend``). Null values drop; entities with < 2
    distinct-time observations emit null.

    One entity-bucket exchange; per entity the pairwise slopes are a
    vectorized upper-triangle broadcast — O(n²) slopes per entity, so
    this estimator is for BOUNDED per-entity histories (sensor/user
    grain); for an unbounded entity, window or subsample upstream (the
    same contract as the reference's per-partition operations)."""
    from .grouped import grouped_ordered_map

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        from .grouped import entity_segments

        g2 = g[g[value_col].notna()]
        ids = g2[id_col].to_numpy()
        ts = g2[time_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.float64) if np.issubdtype(
            ts.dtype, np.datetime64) else ts.astype(np.float64)
        v = g2[value_col].to_numpy(np.float64)
        segs = entity_segments(ids)
        out_ids, out_sl = [], []
        for s, e in zip(segs[:-1], segs[1:]):
            t_, v_ = ts_us[s:e], v[s:e]
            i, j = np.triu_indices(e - s, k=1)
            dt = t_[j] - t_[i]
            ok = dt != 0
            if not ok.any():
                sl = np.nan
            else:
                sl = float(np.median((v_[j][ok] - v_[i][ok]) / dt[ok] * per_unit_us))
                if round_to is not None:
                    sc = 10.0 ** round_to
                    sl = np.sign(sl) * np.floor(abs(sl) * sc + 0.5) / sc
            out_ids.append(ids[s])
            out_sl.append(sl)
        return pd.DataFrame({id_col: out_ids, out_col: np.array(out_sl, dtype=np.float64)})

    return grouped_ordered_map(ds, id_col, [time_col], fn, num_buckets=num_buckets)


def hourly_count_acf(
    ds: ray.data.Dataset,
    time_col: str,
    *,
    max_lag: int = 6,
    round_to: int = 6,
) -> pd.DataFrame:
    """Autocorrelation function of the GLOBAL hourly event-count series
    (Pearson corr of x_t vs x_{t+lag} for lag = 1..max_lag over the
    dense hour grid, missing hours = 0) — the periodicity diagnostic
    (a 24-lag peak = daily seasonality) run before fitting any temporal
    model. Facts reduce ONCE to hours-sized count partials; the grid
    densification and per-lag correlations run on that aggregate on the
    driver (hours are bounded: a decade is <9e4 rows). Null for a lag
    whose overlap is constant or shorter than 2 points."""
    from .grouped import hash_groupby_aggregate

    HOUR_US = 3_600_000_000

    def tag(t: pa.Table) -> pa.Table:
        col = t.column(time_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(us // HOUR_US)})

    hourly = hash_groupby_aggregate(
        ds.select_columns([time_col]).map_batches(tag, batch_format="pyarrow"),
        ["h"], {"n": (None, "count")}, num_buckets=8).to_pandas()
    if not len(hourly):
        return pd.DataFrame({"lag": pd.array([], dtype="int64"), "acf": []})
    lo, hi = int(hourly["h"].min()), int(hourly["h"].max())
    dense = np.zeros(hi - lo + 1, dtype=np.float64)
    dense[hourly["h"].to_numpy(np.int64) - lo] = hourly["n"].to_numpy(np.float64)
    rows = []
    sc = 10.0 ** round_to
    for lag in range(1, max_lag + 1):
        a, b = dense[:-lag], dense[lag:]
        if len(a) == 0:
            # no (x_t, x_{t+lag}) pair exists for this lag: the SQL
            # replay's inner join emits NO row — skip, don't pad NaN
            continue
        if len(a) < 2 or a.std() == 0 or b.std() == 0:
            rows.append((lag, np.nan))
            continue
        r = float(np.corrcoef(a, b)[0, 1])
        rows.append((lag, np.sign(r) * np.floor(abs(r) * sc + 0.5) / sc))
    out = pd.DataFrame(rows, columns=["lag", "acf"])
    out["lag"] = out["lag"].astype(np.int64)
    return out


def chi2_independence(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
    *,
    round_to: int = 6,
) -> pd.DataFrame:
    """Pearson chi² test of independence between two categorical
    columns — the corpus-QA probe ("is language independent of source?"
    — if not, a language filter silently skews the source mix). Facts
    reduce ONCE to |A|×|B| contingency partials; the statistic closes
    on that vocabulary-sized table from exact int64 counts (expected
    cells are exact ratios of int products, so both engines share the
    same doubles; the final cell sum rounds at ``round_to``). Rows with
    a null on either side drop (SQL GROUP BY would keep them as
    categories — the engine matches the scipy convention instead and
    the oracle filters nulls explicitly). Returns one row:
    ``(chi2, dof, n)``."""
    from .grouped import hash_groupby_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[col_a, col_b]].dropna()
        return d.groupby([col_a, col_b], sort=False).size().reset_index(name="__n__")

    cont = hash_groupby_aggregate(
        ds.select_columns([col_a, col_b]).map_batches(partial, batch_format="pandas"),
        [col_a, col_b], {"n": ("__n__", "sum")}, num_buckets=4,
    ).to_pandas()  # |A|×|B|-sized
    if not len(cont):
        return pd.DataFrame({"chi2": [np.nan], "dof": pd.array([0], dtype="int64"),
                             "n": pd.array([0], dtype="int64")})
    pivot = cont.pivot_table(index=col_a, columns=col_b, values="n",
                             fill_value=0, aggfunc="sum").to_numpy(np.float64)
    n = pivot.sum()
    row = pivot.sum(axis=1, keepdims=True)
    col = pivot.sum(axis=0, keepdims=True)
    e = row @ col / n
    with np.errstate(invalid="ignore", divide="ignore"):
        cells = (pivot - e) ** 2 / e
    chi2 = float(np.nansum(np.where(e > 0, cells, 0.0)))
    sc = 10.0 ** round_to
    chi2 = np.sign(chi2) * np.floor(abs(chi2) * sc + 0.5) / sc
    dof = (pivot.shape[0] - 1) * (pivot.shape[1] - 1)
    return pd.DataFrame({"chi2": [chi2], "dof": pd.array([dof], dtype="int64"),
                         "n": pd.array([int(n)], dtype="int64")})


def cusum_changepoint_by_entity(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    tiebreak: Sequence[str] = (),
    min_rows: int = 8,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Single-changepoint localization per entity via the CUSUM argmax:
    with S_k = Σ_{i≤k}(v_i − v̄), the k maximizing |S_k| is the classic
    estimate of where the mean shifts (drift localization — WHERE a
    feed broke, not just that it drifted). One entity-bucket exchange;
    inside a bucket every entity is scanned in one vectorized pass
    (segment cumsum − k·mean, no per-entity Python loop). Ties on |S|
    resolve to the earliest (ts, tiebreak). Entities with fewer than
    ``min_rows`` rows or any null value are skipped (a changepoint of a
    5-row series is noise; nulls make S_k undefined).

    Output: one row per kept entity — (id, cp_ts, cp_index [1-based
    rank of the argmax row], s_max = |S_k*| rounded 6dp, n).
    """
    from . import grouped

    order = [time_col, *tiebreak]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        v = g[value_col].to_numpy(dtype=np.float64)
        segs = grouped.entity_segments(ids)
        out = []
        for a, b in zip(segs[:-1], segs[1:]):
            n = b - a
            vs = v[a:b]
            if n < min_rows or np.isnan(vs).any():
                continue
            vmil = np.floor(vs * 1000.0 + 0.5).astype(np.int64)
            cs = np.cumsum(vmil)
            total = cs[-1]
            ks = np.arange(1, n + 1, dtype=np.int64)
            key = np.abs(n * cs - ks * total)  # exact int64, no float path
            k = int(np.argmax(key))  # first max = earliest (ts, tiebreak)
            out.append({
                id_col: ids[a], "cp_ts": g[time_col].iloc[a + k],
                "cp_index": k + 1,
                "s_max": float(key[k]) / (n * 1000.0), "n": n,
            })
        cols = [id_col, "cp_ts", "cp_index", "s_max", "n"]
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return grouped.grouped_ordered_map(ds, id_col, order, per_bucket, num_buckets=num_buckets)


def mase_by_entity(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    period: int = 24,
    tiebreak: Sequence[str] = (),
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity forecastability via the MASE ratio of naive errors:
    mean|v_t − v_{t−period}| / mean|v_t − v_{t−1}| (row lags in the
    entity's (ts, tiebreak) order). < 1 means the seasonal-naive beats
    the last-value-naive — "is a seasonal model worth fitting for THIS
    entity", the per-series triage before any model spend. One bucket
    exchange; both lag arrays come from the shared segment-shift kernel
    over the whole bucket (no per-entity loop). Entities without a full
    period of history, or with a zero/undefined denominator, are
    dropped (the ratio is meaningless there).

    Values are quantized to milli-units so every sum is exact integer
    arithmetic; the ratio and the two MAEs surface UNROUNDED as shared
    float expressions of those ints — bit-identical across engines at
    any row count or summation order (rounding would reintroduce
    half-even vs half-away flips).

    Output: (id, mase [6dp], seasonal_mae [6dp], naive_mae [6dp], n).
    """
    from . import grouped
    from .window_features import _seg_shift, _segment_ids

    order = [time_col, *tiebreak]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        v = g[value_col].to_numpy(dtype=np.float64)
        # milli-unit quantization: diffs/sums below are exact integers
        # carried in float64 (exact to 2^53), engine-order-independent
        vmil = np.floor(v * 1000.0 + 0.5)
        segs = grouped.entity_segments(ids)
        seg_id = _segment_ids(segs)
        e1 = np.abs(vmil - _seg_shift(vmil, seg_id, 1))
        ep = np.abs(vmil - _seg_shift(vmil, seg_id, period))
        out = []
        for a, b in zip(segs[:-1], segs[1:]):
            n = b - a
            if n <= period:
                continue
            den_v = e1[a:b]
            num_v = ep[a:b]
            cd, cn = int(np.isfinite(den_v).sum()), int(np.isfinite(num_v).sum())
            if cd == 0 or cn == 0:
                continue
            sd, sn = float(np.nansum(den_v)), float(np.nansum(num_v))
            if sd == 0.0:
                continue
            out.append({
                id_col: ids[a], "mase": (sn * cd) / (sd * cn),
                "seasonal_mae": sn / cn / 1000.0,
                "naive_mae": sd / cd / 1000.0, "n": n,
            })
        cols = [id_col, "mase", "seasonal_mae", "naive_mae", "n"]
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return grouped.grouped_ordered_map(ds, id_col, order, per_bucket, num_buckets=num_buckets)


def residual_quantile_by_entity(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    window: int = 4,
    q: float = 0.9,
    tiebreak: Sequence[str] = (),
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-entity conformal-style residual band: the q-quantile
    (linear interpolation, SQL ``quantile_cont``) of |v_t −
    rolling_mean_window(v)_t| — the width of a distribution-free
    prediction interval around the trailing-mean forecast, per series.
    Residuals come from the shared segment rolling kernel inside ONE
    bucket exchange; the quantile closes per entity on the residual
    vector (entities are bucket-complete). Output: (id, resid_qXX
    [6dp], n_resid).
    """
    from . import grouped
    from .window_features import _seg_rolling, _segment_ids

    order = [time_col, *tiebreak]
    qlab = f"resid_q{int(round(q * 100)):02d}"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        v = g[value_col].to_numpy(dtype=np.float64)
        segs = grouped.entity_segments(ids)
        seg_start = np.repeat(segs[:-1], np.diff(segs))
        s, cnt = _seg_rolling(v, seg_start, window)
        resid = np.abs(v - np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan))
        out = []
        for a, b in zip(segs[:-1], segs[1:]):
            r = resid[a:b]
            r = r[np.isfinite(r)]
            if not len(r):
                continue
            out.append({id_col: ids[a],
                        qlab: round(float(np.quantile(r, q)), 6), "n_resid": len(r)})
        cols = [id_col, qlab, "n_resid"]
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return grouped.grouped_ordered_map(ds, id_col, order, per_bucket, num_buckets=num_buckets)


def max_drawdown_by_entity(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    tiebreak: Sequence[str] = (),
    scale: float = 100.0,
    num_buckets: int = 32,
    total_rows: int | None = None,
) -> ray.data.Dataset:
    """Per-entity maximum drawdown of the cumulative value series:
    ``max_t ( max_{i<=t} C_i  -  C_t )`` with ``C`` the running sum of
    value in ``(ts, tiebreak)`` order — the classic risk / regression
    severity feature (how far an entity's cumulative metric fell from
    its own peak). The reference has no cumulative-risk operators; this
    joins the sequential family beside ``add_cusum``.

    Exactness: values quantize to integer units (half-away
    ``sign·floor(|v|·scale+½)``, matching SQL ROUND —
    DuckDB ``ROUND(v*scale, 0)``), so the running sum, running max and
    every drawdown are int64 and bit-exact in any engine; the one float
    op is the final ``/scale``, identical on both sides. Null values
    contribute zero change (SQL ``SUM OVER`` ignores nulls). A 1-row
    (or all-null) entity has drawdown 0.

    One entity-bucket exchange; inside a bucket the recursion is three
    Cython grouped scans (cumsum, cummax, segment max) — no per-row
    Python. Output: one row per entity, ``(id, max_drawdown, n)``."""
    from . import grouped

    order = [time_col, *tiebreak]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        segs = grouped.entity_segments(ids)
        sizes = np.diff(segs)
        seg_id = np.repeat(np.arange(len(sizes)), sizes)
        v = g[value_col].to_numpy(dtype=np.float64)
        units = np.where(np.isnan(v), 0.0,
                         np.sign(v) * np.floor(np.abs(v) * scale + 0.5)).astype(np.int64)
        cum = pd.Series(units).groupby(seg_id, sort=False).cumsum().to_numpy()
        runmax = pd.Series(cum).groupby(seg_id, sort=False).cummax().to_numpy()
        dd = runmax - cum  # int64, >= 0 by construction
        mdd = np.maximum.reduceat(dd, segs[:-1]) if len(g) else np.array([], dtype=np.int64)
        return pd.DataFrame({
            id_col: ids[segs[:-1]],
            "max_drawdown": mdd.astype(np.float64) / scale,
            "n": sizes.astype(np.int64),
        })

    return grouped.grouped_ordered_map(
        ds.select_columns([id_col, *order, value_col]), id_col, order,
        per_bucket, num_buckets=num_buckets, total_rows=total_rows,
    )


def hourly_xcorr_pair(
    ds: ray.data.Dataset,
    time_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    *,
    max_lag: int = 3,
    round_to: int = 6,
) -> pd.DataFrame:
    """Lead/lag cross-correlation between the hourly count series of
    two categories: Pearson corr of ``a_t`` vs ``b_{t+lag}`` for lag in
    ``-max_lag..max_lag`` over the dense hour grid spanning BOTH series
    (missing hours = 0) — the "does A lead B?" diagnostic (a peak at a
    positive lag means A moves first). Same shape as
    ``hourly_count_acf``: facts reduce ONCE to hours-sized (h, type)
    count partials; grid densification + per-lag correlations close on
    that aggregate on the driver (hours are bounded). A lag with no
    overlapping pair emits no row (SQL inner join); a constant overlap
    gives null. Null-timestamp rows are dropped before the hour cast
    (mirroring ``spectral_amplitude_by_group``): the SQL replay's
    epoch_us(NULL) never joins the grid, and an unfiltered null would
    otherwise float-promote the ``h`` column (schema drift across
    blocks) and cast NaN to INT64_MIN downstream."""
    HOUR_US = 3_600_000_000

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(time_col)))
        col = t.column(time_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        ty = t.column(type_col).to_pandas().to_numpy(dtype=object)
        keep = (ty == type_a) | (ty == type_b)
        return pa.table({"h": pa.array(us[keep] // HOUR_US),
                         "t": pa.array(ty[keep].astype(str))})

    hourly = hash_groupby_aggregate(
        ds.select_columns([time_col, type_col]).map_batches(tag, batch_format="pyarrow"),
        ["h", "t"], {"n": (None, "count")}, num_buckets=8).to_pandas()
    if not len(hourly):
        return pd.DataFrame({"lag": pd.array([], dtype="int64"), "xcorr": []})
    lo, hi = int(hourly["h"].min()), int(hourly["h"].max())
    n_grid = hi - lo + 1
    dense_a = np.zeros(n_grid, dtype=np.float64)
    dense_b = np.zeros(n_grid, dtype=np.float64)
    ha = hourly[hourly["t"] == type_a]
    hb = hourly[hourly["t"] == type_b]
    dense_a[ha["h"].to_numpy(np.int64) - lo] = ha["n"].to_numpy(np.float64)
    dense_b[hb["h"].to_numpy(np.int64) - lo] = hb["n"].to_numpy(np.float64)
    rows = []
    sc = 10.0 ** round_to
    for lag in range(-max_lag, max_lag + 1):
        s = max(0, -lag)
        e = n_grid - max(0, lag)
        if e - s <= 0:
            continue  # no (a_t, b_{t+lag}) pair: SQL join emits no row
        a, b = dense_a[s:e], dense_b[s + lag:e + lag]
        if len(a) < 2 or a.std() == 0 or b.std() == 0:
            rows.append((lag, np.nan))
            continue
        r = float(np.corrcoef(a, b)[0, 1])
        rows.append((lag, np.sign(r) * np.floor(abs(r) * sc + 0.5) / sc))
    out = pd.DataFrame(rows, columns=["lag", "xcorr"])
    out["lag"] = out["lag"].astype(np.int64)
    return out


def ols_calendar_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    time_col: str,
    value_col: str,
    *,
    scale: float = 100.0,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Per-group OLS of value on calendar features (hour-of-day 0–23,
    ISO day-of-week 1–7) with intercept — "how much of this metric is
    clock?" — via the canonical distributed linear-algebra shape: the
    **Gram reduce**. Each block collapses to int64 partial sums of the
    normal-equation moments (n, Σh, Σd, Σh², Σhd, Σd², Σy, Σhy, Σdy)
    per group; ONE partials exchange sums them (all-integer — value is
    quantized to half-away ``sign·floor(|v|·scale+½)`` units (matching SQL
    ROUND), features are small ints, so
    every sum is EXACT in any engine and any addition order); the 3×3
    solve is a closed-form Cramer expansion over the group-count-sized
    aggregate with a pinned float-op order, so the betas are
    bit-identical to a SQL replay computing the same expansion. This is
    the same shape that fits streaming ridge / linear probes at 100 TB:
    the fact table never moves, only 9 numbers per (group, block).

    Rows with null group/time/value are excluded (both sides). A
    singular system (rank-deficient features: n<3 or collinear hours)
    yields null betas, never a crash. Output per group:
    ``(group, n, b0, b_hour, b_dow)`` with betas in value units.

    int64 bound: Σhy ≤ n·23·max|v|·scale — wraps only past ~4e12 rows
    at |v|≤1e4. NOTE the failure mode past that bound is a SILENT wrap
    (pandas ``groupby().sum()`` on int64 wraps with no warning) while
    the DuckDB oracle's SUM promotes to HUGEINT and stays exact, so an
    engine/oracle comparison would diverge rather than raise; approach
    the bound with per-group sharded partials (int128 via two int64
    lanes). The ``moments`` stage raises loudly if a single block's
    ``max|u|`` already exceeds 2^46 (which would let even modest row
    counts wrap)."""

    def moments(t: pa.Table) -> pa.Table:
        df = t.select([group_col, time_col, value_col]).to_pandas()
        df = df[df[group_col].notna() & df[time_col].notna() & df[value_col].notna()]
        if not len(df):
            return pa.table({c: pa.array([], t) for c, t in [
                (group_col, pa.string()), ("n", pa.int64()),
                ("sh", pa.int64()), ("sd", pa.int64()), ("shh", pa.int64()),
                ("shd", pa.int64()), ("sdd", pa.int64()), ("sy", pa.int64()),
                ("shy", pa.int64()), ("sdy", pa.int64())]})
        ts = pd.to_datetime(df[time_col])
        h = ts.dt.hour.to_numpy(np.int64)
        d = (ts.dt.dayofweek.to_numpy(np.int64) + 1)  # ISO: Mon=1..Sun=7
        vv = df[value_col].to_numpy(np.float64)
        u = (np.sign(vv) * np.floor(np.abs(vv) * scale + 0.5)).astype(np.int64)
        if len(u) and int(np.abs(u).max()) > (1 << 46):
            raise OverflowError(
                "ols_calendar_by_group: |value|*scale exceeds 2^46 units; "
                "int64 moment sums could wrap silently — rescale the value "
                "column or shard partials into two int64 lanes")
        p = pd.DataFrame({
            group_col: df[group_col].to_numpy(),
            "n": np.ones(len(df), dtype=np.int64),
            "sh": h, "sd": d, "shh": h * h, "shd": h * d, "sdd": d * d,
            "sy": u, "shy": h * u, "sdy": d * u,
        })
        g = p.groupby(group_col, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = hash_groupby_aggregate(
        ds.select_columns([group_col, time_col, value_col])
          .map_batches(moments, batch_format="pyarrow"),
        [group_col],
        {c: (c, "sum") for c in
         ("n", "sh", "sd", "shh", "shd", "sdd", "sy", "shy", "sdy")},
        num_buckets=num_buckets,
    )

    def det3(a, b, c, d_, e, f, g_, h_, i):
        # first-row cofactor expansion — the SQL oracle mirrors this
        # literal expression, so identical double inputs give identical
        # IEEE outputs
        return a * (e * i - f * h_) - b * (d_ * i - f * g_) + c * (d_ * h_ - e * g_)

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        sh = df["sh"].to_numpy(np.float64); sd = df["sd"].to_numpy(np.float64)
        shh = df["shh"].to_numpy(np.float64); shd = df["shd"].to_numpy(np.float64)
        sdd = df["sdd"].to_numpy(np.float64); sy = df["sy"].to_numpy(np.float64)
        shy = df["shy"].to_numpy(np.float64); sdy = df["sdy"].to_numpy(np.float64)
        det = det3(n, sh, sd, sh, shh, shd, sd, shd, sdd)
        d0 = det3(sy, sh, sd, shy, shh, shd, sdy, shd, sdd)
        d1 = det3(n, sy, sd, sh, shy, shd, sd, sdy, sdd)
        d2 = det3(n, sh, sy, sh, shh, shy, sd, shd, sdy)
        with np.errstate(divide="ignore", invalid="ignore"):
            b0 = np.where(det != 0, d0 / det / scale, np.nan)
            b1 = np.where(det != 0, d1 / det / scale, np.nan)
            b2 = np.where(det != 0, d2 / det / scale, np.nan)
        return pd.DataFrame({group_col: df[group_col],
                             "n": df["n"].to_numpy(np.int64),
                             "b0": b0, "b_hour": b1, "b_dow": b2})

    return sums.map_batches(solve, batch_format="pandas")


def spectral_amplitude_by_group(
    ds: ray.data.Dataset,
    time_col: str,
    group_col: str,
    *,
    periods_hours: Sequence[int] = (24, 168),
    round_to: int = 6,
    num_buckets: int = 8,
) -> pd.DataFrame:
    """Frequency-domain seasonality per group: the relative DFT
    amplitude of the hourly event-count series at fixed periods
    (daily=24h, weekly=168h by default) — ``2·|Σ_t n_t e^{-iωt}| /
    Σ_t n_t``, i.e. what fraction of a group's event mass oscillates
    at that frequency (≈1 for a pure daily rhythm, ≈0 for flat/noise).
    The spectral companion to the time-domain ACF (`hourly_count_acf`)
    and variance-ratio seasonality strength.

    One exchange total: facts reduce to (hour, group) count partials
    (zero hours contribute nothing to a DFT sum, so no grid fill is
    needed); the two projection sums per (group, period) close on that
    aggregate. Phase is reduced to ``h mod P`` BEFORE the trig call so
    both engines hand libm small same-sign arguments (DuckDB ``%``
    follows the dividend sign, so the SQL replay uses
    ``((h % P) + P) % P``; cos/sin are then equal to ~1 ulp and the
    half-away ``round_to`` absorbs it). Null time/group rows drop on
    both sides. Output: ``(group, period_hours, amplitude)``."""
    HOUR_US = 3_600_000_000

    def tag(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t.column(time_col)), pc.is_valid(t.column(group_col)))
        t = t.filter(mask)
        col = t.column(time_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(us // HOUR_US),
                         "g": t.column(group_col)})

    hourly = hash_groupby_aggregate(
        ds.select_columns([time_col, group_col]).map_batches(tag, batch_format="pyarrow"),
        ["g", "h"], {"n": (None, "count")}, num_buckets=num_buckets).to_pandas()
    if not len(hourly):
        return pd.DataFrame({"g": pd.array([], dtype="string"),
                             "period_hours": np.array([], dtype=np.int64),
                             "amplitude": np.array([], dtype=np.float64)})
    h = hourly["h"].to_numpy(np.int64)
    n = hourly["n"].to_numpy(np.float64)
    sc = 10.0 ** round_to
    frames = []
    for p in periods_hours:
        ph = np.mod(h, p).astype(np.float64)  # non-negative, matches SQL ((h%P)+P)%P
        ang = 2.0 * np.pi * ph / float(p)
        d = pd.DataFrame({"g": hourly["g"],
                          "c": n * np.cos(ang), "s": n * np.sin(ang), "n": n})
        agg = d.groupby("g", sort=False, dropna=False).sum()
        amp = 2.0 * np.sqrt(agg["c"] ** 2 + agg["s"] ** 2) / agg["n"]
        amp = np.sign(amp) * np.floor(np.abs(amp) * sc + 0.5) / sc
        frames.append(pd.DataFrame({
            "g": agg.index.to_numpy(),
            "period_hours": np.full(len(agg), p, dtype=np.int64),
            "amplitude": amp.to_numpy(np.float64),
        }))
    out = pd.concat(frames, ignore_index=True)
    out["g"] = out["g"].astype("string")
    return out.sort_values(["g", "period_hours"]).reset_index(drop=True)


def holt_smooth_by_entity(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    alpha: float = 0.3,
    beta: float = 0.1,
    tiebreak: Sequence[str] = (),
    keep_cols: Sequence[str] = (),
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Holt double-exponential smoothing per entity — level + trend
    state for every row:

        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},   l_1 = y_1, b_1 = 0

    the classic trend-aware smoother (EWM has no trend term; `ewm_*`
    covers the memoryless case). Null values are excluded up front
    (both sides of the oracle); a 1-row entity is its own level with
    zero trend.

    Exactness: the recursion is ELEMENT-WISE (no reductions), so with
    literally mirrored expressions both engines walk identical IEEE
    sequences — the per-row output is bit-exact against a recursive-CTE
    replay, unrounded. Distribution: one entity-bucket exchange; inside
    a bucket the scan vectorizes ACROSS entities (one numpy step per
    time index, all entities' k-th rows updated at once), so cost is
    O(max series length) vector ops, not O(rows) Python. A single
    billion-row entity would serialize this chain — that is the
    recursion's own data dependence; the associative-scan (Blelloch)
    formulation would parallelize it but reorders the float ops and is
    deliberately not used here.
    """
    from . import grouped

    order = [time_col, *tiebreak]
    a, bt = float(alpha), float(beta)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[value_col].notna()]
        n = len(g)
        base_cols = [id_col, *keep_cols]
        if n == 0:
            return pd.DataFrame({**{c: g[c] for c in base_cols},
                                 "holt_level": np.array([], dtype=np.float64),
                                 "holt_trend": np.array([], dtype=np.float64)})
        ids = g[id_col].to_numpy()
        y = g[value_col].to_numpy(np.float64)
        segs = grouped.entity_segments(ids)
        starts, sizes = segs[:-1], np.diff(segs)
        l = np.empty(n); b = np.zeros(n)
        l[starts] = y[starts]
        for k in range(1, int(sizes.max())):
            rows = starts[sizes > k] + k
            prev = rows - 1
            lp, bp = l[prev], b[prev]
            ln = a * y[rows] + (1.0 - a) * (lp + bp)
            b[rows] = bt * (ln - lp) + (1.0 - bt) * bp
            l[rows] = ln
        out = {c: g[c].to_numpy() for c in base_cols}
        out["holt_level"] = l
        out["holt_trend"] = b
        return pd.DataFrame(out)

    cols = list(dict.fromkeys([id_col, *order, value_col, *keep_cols]))
    return grouped.grouped_ordered_map(
        ds.select_columns(cols), id_col, order, per_bucket,
        num_buckets=num_buckets)


def benford_deviation_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    scale: float = 100.0,
    round_to: int = 6,
    num_buckets: int = 8,
) -> pd.DataFrame:
    """Benford first-digit audit per group: chi-square and mean absolute
    deviation of the observed leading-digit distribution vs Benford's
    law ``p_d = log10(1 + 1/d)`` — the classic fabricated-/synthetic-
    data tripwire for financial-style value columns.

    Digit extraction is EXACT, not float-log based: values quantize to
    integer units (half-away ``floor(|v|·scale+½)``, matching SQL ROUND;
    zero/null excluded) and the
    leading digit is the first character of the INTEGER's decimal
    string — identical in any engine, where ``floor(log10(v))`` differs
    across libms at representation boundaries. One combiner exchange of
    (group, digit) counts; the 9-term chi-square closes on the driver.
    Output: ``(group, n, chi2, mad)``, rounded half-away."""

    def tag(t: pa.Table) -> pa.Table:
        df = t.select([group_col, value_col]).to_pandas()
        df = df[df[group_col].notna() & df[value_col].notna()]
        u = np.floor(np.abs(df[value_col].to_numpy(np.float64)) * scale + 0.5).astype(np.int64)
        keep = u > 0
        digit = pd.Series(u[keep]).astype(str).str[0].astype(np.int64).to_numpy()
        return pa.table({"g": pa.array(df[group_col].to_numpy()[keep]),
                         "d": pa.array(digit)})

    counts = hash_groupby_aggregate(
        ds.select_columns([group_col, value_col]).map_batches(tag, batch_format="pyarrow"),
        ["g", "d"], {"n": (None, "count")}, num_buckets=num_buckets).to_pandas()
    if not len(counts):
        return pd.DataFrame({"g": pd.array([], dtype="string"),
                             "n": np.array([], dtype=np.int64),
                             "chi2": np.array([], dtype=np.float64),
                             "mad": np.array([], dtype=np.float64)})
    digits = np.arange(1, 10, dtype=np.int64)
    p = np.log10(1.0 + 1.0 / digits.astype(np.float64))
    sc = 10.0 ** round_to
    rows = []
    for g, sub in counts.groupby("g", sort=True, dropna=False):
        obs = np.zeros(9)
        obs[sub["d"].to_numpy(np.int64) - 1] = sub["n"].to_numpy(np.float64)
        n = obs.sum()
        exp = n * p
        chi2 = float(np.sum((obs - exp) ** 2 / exp))
        mad = float(np.sum(np.abs(obs / n - p)) / 9.0)
        rows.append((g, int(n),
                     np.sign(chi2) * np.floor(abs(chi2) * sc + 0.5) / sc,
                     np.sign(mad) * np.floor(abs(mad) * sc + 0.5) / sc))
    out = pd.DataFrame(rows, columns=["g", "n", "chi2", "mad"])
    out["g"] = out["g"].astype("string")
    out["n"] = out["n"].astype(np.int64)
    return out


def trend_break_by_entity(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    value_col: str,
    *,
    tiebreak: Sequence[str] = (),
    min_rows: int = 8,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Segmented regression at the CUSUM breakpoint: per entity, locate
    the mean-shift argmax (same exact-integer key and earliest-tie rule
    as ``cusum_changepoint_by_entity`` — the two operators agree on
    WHERE by construction) and fit an OLS slope to each side — "did
    behavior change, and from what trend to what trend". The row index
    is the regressor (slope per step); both sides use the Cramer 2×2
    closed form over exact int64 moment sums (x small int, y in
    milli-units), so the slopes are bit-identical to the SQL replay's
    identical expression.

    One entity-bucket exchange; per-entity work is three vectorized
    segment scans + two O(side) integer reductions. Entities with fewer
    than ``min_rows`` rows or any null value are skipped (same contract
    as the changepoint op). A side with <2 points or zero variance
    yields a null slope. int64 note: the ``n·cs`` CUSUM key wraps
    SILENTLY past ~2^63 (numpy int64; DuckDB's HUGEINT promotion would
    stay exact) — out of range below ~1e9 rows·units per entity, but
    the asymmetry is silent divergence, not a loud error. Output: ``(id, cp_ts, cp_index, n, slope_pre,
    slope_post)`` with slopes in value units per row step."""
    from . import grouped

    order = [time_col, *tiebreak]

    def _slope(x: np.ndarray, y: np.ndarray):
        m = np.float64(len(x))
        sx = np.float64(int(x.sum())); sy = np.float64(int(y.sum()))
        sxx = np.float64(int((x * x).sum())); sxy = np.float64(int((x * y).sum()))
        det = m * sxx - sx * sx
        if det == 0:
            return np.nan
        return float(((m * sxy - sx * sy) / det) / 1000.0)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        v = g[value_col].to_numpy(dtype=np.float64)
        segs = grouped.entity_segments(ids)
        out = []
        for a, b in zip(segs[:-1], segs[1:]):
            n = b - a
            vs = v[a:b]
            if n < min_rows or np.isnan(vs).any():
                continue
            vmil = np.floor(vs * 1000.0 + 0.5).astype(np.int64)
            cs = np.cumsum(vmil)
            total = cs[-1]
            ks = np.arange(1, n + 1, dtype=np.int64)
            key = np.abs(n * cs - ks * total)
            k = int(np.argmax(key))  # first max = earliest (ts, tiebreak)
            pre_y, post_y = vmil[: k + 1], vmil[k + 1:]
            out.append({
                id_col: ids[a], "cp_ts": g[time_col].iloc[a + k],
                "cp_index": k + 1, "n": n,
                "slope_pre": _slope(np.arange(len(pre_y), dtype=np.int64), pre_y),
                "slope_post": _slope(np.arange(len(post_y), dtype=np.int64), post_y),
            })
        cols = [id_col, "cp_ts", "cp_index", "n", "slope_pre", "slope_post"]
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return grouped.grouped_ordered_map(ds, id_col, order, per_bucket, num_buckets=num_buckets)


def kaplan_meier_survival(
    ds: ray.data.Dataset,
    id_col: str,
    time_col: str,
    type_col: str,
    event_type: str,
    *,
    unit_us: int = 86_400_000_000,
    round_to: int = 6,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Kaplan–Meier survival over time-to-first-``event_type``: each
    entity contributes one duration from its FIRST event to its first
    ``event_type`` occurrence (event=1) or to its LAST event (censored,
    event=0), in integer ``unit_us`` units (days by default) — the
    right-censored "how long until users convert" curve, the survival-
    analysis family's entry point (complements the point estimates in
    ``activation_lag`` / ``time_to_next``).

    Distribution: per-entity (first ts, last ts, first event ts) via
    ONE combiner exchange (min/max/conditional-min are algebraic —
    O(entities) partials, the fact table never widens); the KM product
    closes on the driver over the distinct-event-time table. The SQL
    replay uses a sequential ``product() OVER (ORDER BY t)`` window —
    the same ascending multiply order as the numpy cumprod, so the
    curve matches to the shared rounding.

    Rows with null id/time/type drop. Output one row per distinct
    event duration: ``(t, n_risk, d_events, survival)``."""

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(t.column(id_col)), pc.is_valid(t.column(time_col))),
                    pc.is_valid(t.column(type_col)))
        t = t.filter(m)
        col = t.column(time_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.timestamp("us"))
        us = pc.cast(col, pa.int64())
        is_ev = pc.equal(t.column(type_col), pa.scalar(event_type))
        ev_us = pc.if_else(is_ev, us, pa.scalar(None, pa.int64()))
        return pa.table({id_col: t.column(id_col), "us": us, "ev_us": ev_us})

    per_entity = hash_groupby_aggregate(
        ds.select_columns([id_col, time_col, type_col]).map_batches(prep, batch_format="pyarrow"),
        [id_col],
        {"t0": ("us", "min"), "tlast": ("us", "max"), "tev": ("ev_us", "min")},
        num_buckets=num_buckets,
    ).to_pandas()  # O(entities)
    cols = {"t": np.array([], dtype=np.int64), "n_risk": np.array([], dtype=np.int64),
            "d_events": np.array([], dtype=np.int64), "survival": np.array([], dtype=np.float64)}
    if not len(per_entity):
        return pd.DataFrame(cols)
    tev = per_entity["tev"]
    end = tev.fillna(per_entity["tlast"]).to_numpy(np.int64)
    t0 = per_entity["t0"].to_numpy(np.int64)
    dur = (end - t0) // unit_us
    event = tev.notna().to_numpy()
    ev_times = np.unique(dur[event])
    if not len(ev_times):
        return pd.DataFrame(cols)
    # deaths at each event time; at-risk = durations >= t (ascending t)
    d = np.array([(dur[event] == t).sum() for t in ev_times], dtype=np.int64)
    nr = np.array([(dur >= t).sum() for t in ev_times], dtype=np.int64)
    surv = np.cumprod(1.0 - d.astype(np.float64) / nr.astype(np.float64))
    sc = 10.0 ** round_to
    return pd.DataFrame({
        "t": ev_times.astype(np.int64), "n_risk": nr, "d_events": d,
        "survival": np.sign(surv) * np.floor(np.abs(surv) * sc + 0.5) / sc,
    })
