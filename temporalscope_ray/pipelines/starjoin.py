"""Star-schema revenue rollup — the TPC-H Q5 shape on Ray Data.

The reference has no joins at all (SURVEY.md §2.4); its users pre-join
in pandas. A standalone engine must run the canonical warehouse
pattern end to end: fact ⋈ fact ⋈ dimension chains feeding a grouped
rollup. This module composes the existing ``equi_join`` physical plans
into that pipeline with the scale decisions made explicitly:

* ``lineitem ⋈ orders`` and the ``customer`` / ``supplier`` joins are
  BUCKETED (one hash exchange each) — all three of those tables grow
  with scale factor, so broadcast would be wrong at 100 TB even though
  it happens to fit at test scale. ``broadcast=False`` is forced.
* ``nation ⋈ region`` is a FIXED-size dimension (25 × 5 rows at any
  scale factor), resolved on the driver to a ``nationkey → n_name``
  map for the chosen region and applied as a zero-shuffle vectorized
  filter+map. No exchange.
* Money is exact: revenue is accumulated as the INT64 number of
  10⁻⁴-dollar units, ``floor(price·100 + ½) · floor(100 − discount·100 + ½)`` (half-away,
  matching SQL ``round`` on the positive domain)
  — TPC-H prices and discounts carry exactly two decimals, so the
  product is exact and every partial sum is an integer. The final
  division by 10⁴ produces a double bit-identical to any engine that
  sums the same integers (the DuckDB oracle replays this verbatim —
  no rounding tolerance anywhere). int64 holds to ~9·10¹⁸ unit-sums
  per group; at 100 TB (SF ≈ 10⁵) a per-nation sum is ~10¹⁷ — inside
  range, noted here because a GLOBAL unsalted total would not be.

Column pruning happens at the parquet read (callers pass projected
datasets); the order-date filter runs before the first exchange so
only surviving fact rows are hashed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..stages.grouped import hash_groupby_aggregate
from ..stages.join import equi_join


def _proj(ds: ray.data.Dataset, cols: list) -> ray.data.Dataset:
    """Schema-faithful projection for post-map_groups datasets."""
    return ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow",
                          zero_copy_batch=True)


def revenue_by_nation(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: ray.data.Dataset,
    region: ray.data.Dataset,
    *,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Revenue per nation where customer and supplier share the nation,
    restricted to one region and an order-date range (TPC-H Q5
    semantics). Output: ``(n_name, revenue)`` with ``revenue`` a double
    equal to ``Σ floor(100·price+½)·floor(100−100·discount+½) / 10⁴``."""
    lo = pa.scalar(pd.Timestamp(date_lo), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(date_hi), type=pa.timestamp("us"))

    def keep_dates(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return t.select(["o_orderkey", "o_custkey"]).rename_columns(
            ["o_orderkey", "c_custkey"])

    ord_f = orders.map_batches(keep_dates, batch_format="pyarrow", zero_copy_batch=True)

    def to_units(t: pa.Table) -> pa.Table:
        p = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        d = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(p * 100.0 + 0.5).astype(np.int64) * np.floor(100.0 - d * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "s_suppkey": t.column("l_suppkey"),
            "rev_e4": pa.array(rev),
        })

    li = lineitem.map_batches(to_units, batch_format="pyarrow", zero_copy_batch=True)

    # fact ⋈ fact ⋈ fact: three bucketed exchanges, facts never broadcast.
    # Projections after a bucketed join go through an explicit Arrow
    # select in map_batches: Dataset.select_columns over a map_groups
    # output mis-infers the schema (the Project is ignored by schema(),
    # which breaks the next join's pad_union layout).
    j = equi_join(li, ord_f, on="o_orderkey", broadcast=False, num_buckets=num_buckets)
    j = equi_join(
        _proj(j, ["s_suppkey", "rev_e4", "c_custkey"]),
        customer.select_columns(["c_custkey", "c_nationkey"]),
        on="c_custkey", broadcast=False, num_buckets=num_buckets,
    )
    j = equi_join(
        _proj(j, ["s_suppkey", "rev_e4", "c_nationkey"]),
        supplier.select_columns(["s_suppkey", "s_nationkey"]),
        on="s_suppkey", broadcast=False, num_buckets=num_buckets,
    )

    # fixed-size dims on the driver: nationkey -> name for the region
    nat = nation.select_columns(["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    keys = reg.loc[reg["r_name"] == region_name, "r_regionkey"]
    nat = nat[nat["n_regionkey"].isin(set(keys))]
    name_of = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    name_ref = ray.put(name_of)

    def tag_nation(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(name_ref)
        df = df[df["c_nationkey"] == df["s_nationkey"]]
        names = df["s_nationkey"].map(m)
        df = pd.DataFrame({"n_name": names, "rev_e4": df["rev_e4"]})
        return df[df["n_name"].notna()]

    tagged = j.map_batches(tag_nation, batch_format="pandas")
    agg = hash_groupby_aggregate(
        tagged, ["n_name"], {"rev_e4": ("rev_e4", "sum")}, num_buckets=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": df["n_name"],
            "revenue": df["rev_e4"].to_numpy(dtype=np.int64) / 10000.0,
        })

    return agg.map_batches(finish, batch_format="pandas")


def top_unshipped_orders(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    *,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TPC-H Q3 shape: the k highest-revenue orders of one market
    segment that were placed before ``date`` but still have lineitems
    shipping after it. Same exact-money contract as
    ``revenue_by_nation`` (int64 10⁻⁴-dollar units), so the ranking
    key is an INTEGER — ties and near-ties order identically in any
    engine, and the tiebreak (``o_orderkey`` asc) makes the top-k
    unique. Two bucketed fact exchanges + one combiner aggregate; the
    final top-k is ``agg.top_k_rows`` (per-block partial top-k, an
    O(blocks·k) driver merge — never a global sort).

    Returns a k-row DataFrame ``(o_orderkey, revenue, o_orderdate)``.
    """
    from ..stages.agg import top_k_rows

    cut = pa.scalar(pd.Timestamp(date), type=pa.timestamp("us"))

    def keep_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), cut))
        return t.select(["o_orderkey", "o_custkey", "o_orderdate"]).rename_columns(
            ["o_orderkey", "c_custkey", "o_orderdate"])

    def keep_cust(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("c_mktsegment"), pa.scalar(segment)))
        return t.select(["c_custkey"])

    def keep_lines(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), cut))
        p = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        d = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(p * 100.0 + 0.5).astype(np.int64) * np.floor(100.0 - d * 100.0 + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": t.column("l_orderkey"), "rev_e4": pa.array(rev)})

    ord_f = orders.map_batches(keep_orders, batch_format="pyarrow", zero_copy_batch=True)
    cust_f = customer.map_batches(keep_cust, batch_format="pyarrow", zero_copy_batch=True)
    li_f = lineitem.map_batches(keep_lines, batch_format="pyarrow", zero_copy_batch=True)

    seg_orders = equi_join(ord_f, cust_f, on="c_custkey",
                           broadcast=False, num_buckets=num_buckets)
    # explicit Arrow select (see _proj note in revenue_by_nation)
    j = equi_join(li_f, _proj(seg_orders, ["o_orderkey", "o_orderdate"]),
                  on="o_orderkey", broadcast=False, num_buckets=num_buckets)
    agg = hash_groupby_aggregate(
        j, ["o_orderkey", "o_orderdate"], {"rev_e4": ("rev_e4", "sum")},
        num_buckets=num_buckets)
    top = top_k_rows(agg, "rev_e4", k, tiebreak=["o_orderkey"])
    if len(top) == 0:
        # empty segment/date selection: schema-less empty frame — emit
        # the typed empty report (SQL's LIMIT over zero rows)
        return pd.DataFrame({
            "o_orderkey": np.array([], dtype=np.int64),
            "revenue": np.array([], dtype=np.float64),
            "o_orderdate": pd.DatetimeIndex([]),
        })
    return pd.DataFrame({
        "o_orderkey": top["o_orderkey"],
        "revenue": top["rev_e4"].to_numpy(dtype=np.int64) / 10000.0,
        "o_orderdate": top["o_orderdate"],
    })


def promo_revenue_share(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    *,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-07-01",
    promo_prefix: str = "PROMO",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """TPC-H Q14 shape: the percentage of revenue in a ship-date window
    that came from promo parts. One bucketed ``lineitem ⋈ part``
    exchange (part grows with SF — 2·10¹⁰ rows at 100 TB, not a
    broadcast) feeding a two-cell combiner reduce; the share is a ratio
    of two EXACT int64 unit sums, evaluated with the same operand order
    as the SQL oracle (``100.0 · promo / total``), so no tolerance is
    needed. Returns a 1-row DataFrame
    ``(promo_share, promo_rev, total_rev)``.
    """
    lo = pa.scalar(pd.Timestamp(date_lo), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(date_hi), type=pa.timestamp("us"))

    def keep_lines(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate")
        t = t.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        # SQL SUM skips rows whose revenue term is NULL (null price or
        # discount); without this filter NaN would cast to int64 garbage
        t = t.filter(pc.and_(pc.is_valid(t.column("l_extendedprice")),
                             pc.is_valid(t.column("l_discount"))))
        p = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(p * 100.0 + 0.5).astype(np.int64) * np.floor(100.0 - disc * 100.0 + 0.5).astype(np.int64)
        return pa.table({"p_partkey": t.column("l_partkey"), "rev_e4": pa.array(rev)})

    def keep_parts(t: pa.Table) -> pa.Table:
        promo = pc.starts_with(t.column("p_type"), promo_prefix)
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "is_promo": pc.cast(promo, pa.int64())})

    li = lineitem.map_batches(keep_lines, batch_format="pyarrow", zero_copy_batch=True)
    pt = part.map_batches(keep_parts, batch_format="pyarrow", zero_copy_batch=True)
    j = equi_join(li, pt, on="p_partkey", broadcast=False, num_buckets=num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev_e4"].to_numpy(dtype=np.int64)
        promo = df["is_promo"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"promo_e4": [int((rev * promo).sum())],
                             "total_e4": [int(rev.sum())]})

    sums = j.map_batches(partial, batch_format="pandas").to_pandas()
    if len(sums) == 0:
        # a fully-empty join (every line filtered): SQL SUM over zero
        # rows is NULL, so the whole one-row report is NULL — and the
        # empty Ray result is schema-less, so guard before indexing
        return pd.DataFrame({
            "promo_share": [np.nan], "promo_rev": [np.nan], "total_rev": [np.nan],
        })
    promo_u, total_u = int(sums["promo_e4"].sum()), int(sums["total_e4"].sum())
    share = 100.0 * promo_u / total_u if total_u else np.nan
    return pd.DataFrame({
        "promo_share": [share],
        "promo_rev": [promo_u / 10000.0],
        "total_rev": [total_u / 10000.0],
    })
