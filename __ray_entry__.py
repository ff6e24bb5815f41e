"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship temporal-feature pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + the scale extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query. Column names
match between the two sides; derived float columns are rounded to a
fixed number of decimals ON BOTH SIDES so the driver's value-hash is
not sensitive to summation-order ulp noise.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` anywhere in this module or the
library it uses.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _make_worker_safe() -> None:
    """Ray workers inherit the raylet's environment, not this module's
    ``sys.path`` — if the driver ran ``ray.init`` outside /root/repo,
    workers cannot import ``temporalscope_ray`` and every UDF fails
    with ModuleNotFoundError. Registering the package for BY-VALUE
    cloudpickle serialization ships the code with each task instead of
    by module reference, making the contract independent of the
    driver's cwd/PYTHONPATH."""
    import importlib
    import pkgutil

    import temporalscope_ray

    for info in pkgutil.walk_packages(temporalscope_ray.__path__, prefix="temporalscope_ray."):
        try:
            importlib.import_module(info.name)
        except Exception:
            pass
    try:
        from ray import cloudpickle as _rcp

        for name, mod in list(sys.modules.items()):
            if name.startswith("temporalscope_ray") and mod is not None:
                try:
                    _rcp.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass


_make_worker_safe()


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    """Size-aware read: small files get few, meaty blocks so sort-based
    exchanges don't pay the O(blocks^2) splinter overhead; large inputs
    keep Ray's auto parallelism (see sources/reader.py)."""
    from temporalscope_ray.sources.reader import sized_read_parquet

    return sized_read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _events(sf_dir: str, columns=("event_id", "ts", "user_id", "event_type", "value")) -> ray.data.Dataset:
    return _read(sf_dir, "events", columns=list(columns))


def _round_cols(ds: ray.data.Dataset, cols: list[str], ndigits: int = 6) -> ray.data.Dataset:
    """Quantize float columns HALF-AWAY-FROM-ZERO — the SQL ROUND rule
    (np.round is banker's: an expanding mean over a power-of-two count
    of 2-decimal values lands on an exact half at the 6th decimal and
    the two rules split)."""
    scale = 10.0 ** ndigits

    def r(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            x = batch[c].astype(np.float64).to_numpy()
            with np.errstate(invalid="ignore"):
                batch[c] = np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
        return batch

    return ds.map_batches(r, batch_format="pandas")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_shift_lead1(sf_dir: str):
    from temporalscope_ray.stages.shift import shift_column_per_entity

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return shift_column_per_entity(
        ev, value_col="value", id_col="user_id", time_col="ts", n=1,
        out_col="value_shift_1", tiebreak=["event_id"],
    )


def q_lag_lead_features(sf_dir: str):
    from temporalscope_ray.stages.window_features import add_lag_lead_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return add_lag_lead_features(
        ev, id_col="user_id", time_col="ts", value_cols=["value"], lags=[1, 2], leads=[1],
        tiebreak=["event_id"],
    )


def q_rolling_mean4(sf_dir: str):
    from temporalscope_ray.stages.window_features import add_rolling_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = add_rolling_features(
        ev, id_col="user_id", time_col="ts", value_cols=["value"], window=4,
        fns=("mean", "sum"), tiebreak=["event_id"],
    )
    return _round_cols(out, ["value_roll_mean_4", "value_roll_sum_4"])


def q_time_rolling_30min(sf_dir: str):
    from temporalscope_ray.stages.window_features import add_time_rolling_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = add_time_rolling_features(
        ev, id_col="user_id", time_col="ts", value_cols=["value"], window="30min", fns=("mean",),
    )
    return _round_cols(out, ["value_troll_mean"])


def q_sessionize(sf_dir: str):
    from temporalscope_ray.stages.window_features import sessionize

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return sessionize(ev, id_col="user_id", time_col="ts", gap=pd.Timedelta("30min"))


def q_session_stats(sf_dir: str):
    from temporalscope_ray.stages.window_features import session_stats

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = session_stats(ev, id_col="user_id", time_col="ts", gap=pd.Timedelta("30min"), value_col="value")
    return _round_cols(out, ["value_sum"])


def _order_state(sf_dir: str) -> ray.data.Dataset:
    """One row per (custkey, orderdate): the point-in-time order state.
    GLOBAL dedupe via groupby-Max — a per-block dedupe would leave
    cross-block duplicates once Ray splits the file. Uses the engine's
    combiner-style ``hash_groupby_aggregate`` (per-block partial Max →
    one hash exchange of partials → per-bucket final), which replaced a
    native Ray sort-based Aggregate measured at ~8 s of the bucketed
    as-of query's 12 s at sf0.1."""
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    deduped = hash_groupby_aggregate(
        orders, ["o_custkey", "o_orderdate"], {"o_totalprice": ("o_totalprice", "max")}, num_buckets=16
    )

    def rename(t: pa.Table) -> pa.Table:
        t = t.rename_columns(
            ["user_id" if c == "o_custkey" else "ts" if c == "o_orderdate" else c for c in t.column_names]
        )
        # Ray's groupby can coarsen timestamp resolution; restore us so
        # merge_asof keys match the left side
        i = t.schema.get_field_index("ts")
        import pyarrow.compute as pc
        return t.set_column(i, "ts", pc.cast(t.column(i), pa.timestamp("us")))

    return deduped.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def q_asof_latest_order(sf_dir: str):
    from temporalscope_ray.stages.asof import asof_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return asof_join(ev, _order_state(sf_dir), on="ts", by="user_id", broadcast=True,
                     right_cols=["o_totalprice"])


def q_asof_latest_order_tol(sf_dir: str):
    from temporalscope_ray.stages.asof import asof_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return asof_join(ev, _order_state(sf_dir), on="ts", by="user_id", broadcast=True,
                     right_cols=["o_totalprice"], tolerance=pd.Timedelta(days=7))


def q_asof_next_order(sf_dir: str):
    """direction='forward' as-of: each event reads the NEXT order
    state at-or-after its timestamp (the look-ahead labeling join —
    deliberate future access, the mirror of the zero-leakage backward
    default)."""
    from temporalscope_ray.stages.asof import asof_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return asof_join(ev, _order_state(sf_dir), on="ts", by="user_id", broadcast=True,
                     right_cols=["o_totalprice"], direction="forward")


def q_asof_nearest_order(sf_dir: str):
    """direction='nearest' as-of: each event reads the order state
    CLOSEST in time (either side; ties prefer the backward/past row,
    the pandas merge_asof rule) — the sensor-alignment join where
    staleness matters more than leakage."""
    from temporalscope_ray.stages.asof import asof_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return asof_join(ev, _order_state(sf_dir), on="ts", by="user_id", broadcast=True,
                     right_cols=["o_totalprice"], direction="nearest")


def q_asof_bucketed(sf_dir: str):
    from temporalscope_ray.stages.asof import asof_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return asof_join(ev, _order_state(sf_dir), on="ts", by="user_id", broadcast=False,
                     right_cols=["o_totalprice"], num_buckets=16).select_columns(
        ["event_id", "ts", "user_id", "value", "o_totalprice"]
    )


def _purchase_state(sf_dir: str) -> ray.data.Dataset:
    """One row per (user, ts) purchase: the second point-in-time
    feature table for the multi-as-of queries (max value on ties,
    mirroring ``_order_state``'s dedupe)."""
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate

    ev = _events(sf_dir, ("ts", "user_id", "event_type", "value"))
    pur = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    deduped = hash_groupby_aggregate(
        pur, ["user_id", "ts"], {"purchase_value": ("value", "max")}, num_buckets=16
    )

    def fix_ts(t: pa.Table) -> pa.Table:
        # Ray's groupby can coarsen timestamp resolution; restore us so
        # merge_asof keys match the left side
        import pyarrow.compute as pc

        i = t.schema.get_field_index("ts")
        return t.set_column(i, "ts", pc.cast(t.column(i), pa.timestamp("us")))

    return deduped.map_batches(fix_ts, batch_format="pyarrow", zero_copy_batch=True)


def q_multi_asof_features(sf_dir: str):
    """Feature-store point-in-time enrichment: K feature tables (order
    state + last-purchase state) as-of joined onto the event spine by
    ONE operator — at most one shuffle + one broadcast pool total,
    instead of K sequential as-of passes (each a spine-sized exchange).
    Size-adaptive: both tables fit the broadcast bound here, so the
    whole query is a single zero-shuffle actor-pool pass."""
    from temporalscope_ray.stages.asof import multi_asof_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = multi_asof_join(
        ev, {"ord": _order_state(sf_dir), "pur": _purchase_state(sf_dir)},
        on="ts", by="user_id",
    )
    return out.select_columns(
        ["event_id", "ts", "user_id", "value", "o_totalprice", "purchase_value"]
    )


def q_multi_asof_bucketed(sf_dir: str):
    """Same K-table point-in-time join forced down the bucketed path:
    spine + ALL feature tables tagged and pad-unioned into ONE
    groupby(hash(entity) % B) exchange whose per-bucket kernel runs the
    K-way sort-merge — the 100 TB shape when the feature tables are
    themselves fact-sized (vs K spine-sized shuffles for K sequential
    as-of joins)."""
    from temporalscope_ray.stages.asof import multi_asof_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = multi_asof_join(
        ev, {"ord": _order_state(sf_dir), "pur": _purchase_state(sf_dir)},
        on="ts", by="user_id", broadcast=False, num_buckets=16,
    )
    return out.select_columns(
        ["event_id", "ts", "user_id", "value", "o_totalprice", "purchase_value"]
    )


def q_range_join_clicks(sf_dir: str):
    """Every purchase joined to ALL clicks by the same user in the
    trailing 30 minutes (interval join, not just the latest as-of)."""
    from temporalscope_ray.stages.asof import range_join

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type", "value"))
    purchases = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    clicks = ev.filter(expr="event_type == 'click'").drop_columns(["event_type"])
    # broadcast=False: the correctness gate exercises the BUCKETED
    # (both-sides-large) path; the broadcast path is covered by pytest
    return range_join(
        purchases, clicks, on="ts", by="user_id",
        lower=-pd.Timedelta(minutes=30), upper=pd.Timedelta(0),
        right_cols=["event_id", "value"], broadcast=False, num_buckets=16,
    )


def q_knn_ivf(sf_dir: str):
    """IVF at full probe (nprobe=nlist): every inverted list is scanned,
    so the ANN result is EXACT and the DuckDB brute-force oracle
    applies — this oracle-checks the whole IVF machinery (quantizer
    assignment, inverted-list groupby, per-list scoring, global merge).
    ANN recall at nprobe<nlist is covered by the pytest recall suite."""
    from temporalscope_ray.stages.similarity import knn_ivf

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_rows = emb.filter(expr="vec_id == 0").to_pandas()
    queries = np.stack(q_rows["embedding"].to_numpy()).astype(np.float64)
    out = knn_ivf(emb, queries, k=10, nlist=8, nprobe=8, concurrency=(1, 2))
    out = out.sort_values(["query_idx", "cos_sim", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out


def q_knn_ivf_reuse(sf_dir: str):
    """The round-4 two-phase IVF API (build once -> query many) driven
    end-to-end: build_ivf_index materializes the inverted lists, then
    query_ivf_index serves the same full-probe query as knn_ivf_10 —
    and must produce byte-identical results, so the SAME brute-force
    DuckDB oracle gates the reuse path."""
    from temporalscope_ray.stages.similarity import build_ivf_index, query_ivf_index

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_rows = emb.filter(expr="vec_id == 0").to_pandas()
    queries = np.stack(q_rows["embedding"].to_numpy()).astype(np.float64)
    index = build_ivf_index(emb, nlist=8, concurrency=(1, 2))
    out = query_ivf_index(index, queries, k=10, nprobe=8)
    out = out.sort_values(["query_idx", "cos_sim", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out


def q_knn_ivf_saved(sf_dir: str):
    """The round-5 cross-session persistence path driven end-to-end:
    build -> save_ivf_index (hive bucket=N parquet, distributed write)
    -> load_ivf_index (per-bucket refs restored) -> full-probe query —
    byte-identical to knn_ivf_10, so the SAME brute-force DuckDB
    oracle gates the save/load machinery."""
    import tempfile

    from temporalscope_ray.stages.similarity import (
        build_ivf_index, load_ivf_index, query_ivf_index, save_ivf_index)

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_rows = emb.filter(expr="vec_id == 0").to_pandas()
    queries = np.stack(q_rows["embedding"].to_numpy()).astype(np.float64)
    index = build_ivf_index(emb, nlist=8, concurrency=(1, 2))
    path = tempfile.mkdtemp(prefix="tsray_ivf_saved_")
    save_ivf_index(index, path)
    out = query_ivf_index(load_ivf_index(path), queries, k=10, nprobe=8)
    out = out.sort_values(["query_idx", "cos_sim", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out


def q_global_shift(sf_dir: str):
    from temporalscope_ray.stages.shift import shift_column_global

    ev = _events(sf_dir, ("ts", "user_id", "value")).filter(expr="user_id == 7")
    ev = ev.select_columns(["ts", "value"]).repartition(8)
    return shift_column_global(ev, value_col="value", time_col="ts", n=1, out_col="value_shift_1")


def q_global_shift_dist(sf_dir: str):
    """Same series as global_shift_lead1 but with
    ``single_task_threshold=0`` forcing the DISTRIBUTED sort +
    block-boundary head exchange (the branch the round-2 verdict
    flagged as test-dead), and n=2 so successor heads carry >1 row."""
    from temporalscope_ray.stages.shift import shift_column_global

    ev = _events(sf_dir, ("ts", "user_id", "value")).filter(expr="user_id == 7")
    ev = ev.select_columns(["ts", "value"]).repartition(8)
    return shift_column_global(
        ev, value_col="value", time_col="ts", n=2, out_col="value_shift_2",
        single_task_threshold=0,
    )


def q_shift_multi_target(sf_dir: str):
    """MODE_MULTI_TARGET through the FULL TemporalDataset →
    SingleStepTargetShifter lifecycle (reference core_utils.py:40-72
    seq2seq semantics): target becomes the next-3 value vector, last 3
    rows per entity drop. Exploded to (row, step, value) for the
    oracle compare, like expand_targets_h3."""
    from temporalscope_ray import MODE_MULTI_TARGET, SingleStepTargetShifter, TemporalDataset

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    td = TemporalDataset(ev, time_col="ts", target_col="value", id_col="user_id", sort=False)
    out = SingleStepTargetShifter(
        n_lags=3, mode=MODE_MULTI_TARGET, drop_target=False, tiebreak=["event_id"]
    ).fit_transform(td)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        h = 3
        n = len(b)
        seqs = np.concatenate([np.asarray(s) for s in b["value_seq_3"]]) if n else np.array([], dtype=np.float64)
        rep = np.repeat(np.arange(n), h)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy()[rep],
                "ts": b["ts"].to_numpy()[rep],
                "user_id": b["user_id"].to_numpy()[rep],
                "value": b["value"].to_numpy()[rep],
                "step": np.tile(np.arange(1, h + 1), n),
                "target_value": np.asarray(seqs, dtype=np.float64),
            }
        )

    return out.ds.map_batches(explode, batch_format="pandas")


def q_incremental_features(sf_dir: str):
    """CDC-style feature refresh: a delta (every 5th user's events)
    arrives; ONLY those entities are recomputed — untouched entities
    pass through from the prior feature table without re-execution —
    and the result must equal the full recompute over base ∪ delta
    (the invariant the SQL oracle expresses as one window query over
    the whole events table)."""
    from temporalscope_ray.stages.incremental import incremental_temporal_features
    from temporalscope_ray.stages.window_features import add_temporal_features

    kw = dict(id_col="user_id", time_col="ts", value_cols=["value"], lags=[1],
              rolling_windows=[4], rolling_fns=("mean",),
              label_shift={"value_col": "value", "n": 1, "out_col": "value_shift_1"},
              tiebreak=["event_id"])
    def split(keep_delta: bool):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mod = pc.subtract(t.column("user_id"),
                              pc.multiply(pc.divide(t.column("user_id"), 5), 5))
            m = pc.equal(mod, 0) if keep_delta else pc.not_equal(mod, 0)
            return t.filter(m)
        return f

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    base = ev.map_batches(split(False), batch_format="pyarrow", zero_copy_batch=True)
    delta = ev.map_batches(split(True), batch_format="pyarrow", zero_copy_batch=True)
    base_feats = add_temporal_features(base, **kw)
    out = incremental_temporal_features(base_feats, base, delta, **kw)
    return _round_cols(out, ["value_roll_mean_4"], ndigits=6)


def q_null_counts(sf_dir: str):
    from temporalscope_ray.core import count_dataset_column_nulls

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type", "value", "props"))
    counts = count_dataset_column_nulls(ev, ["event_id", "ts", "user_id", "event_type", "value", "props"])
    return pa.table({k: pa.array([v], type=pa.int64()) for k, v in counts.items()})


def q_dup_ts_pairs(sf_dir: str):
    from ray.data.aggregate import Count

    ev = _events(sf_dir, ("ts", "user_id"))
    dups = (
        ev.groupby(["user_id", "ts"]).aggregate(Count(alias_name="cnt")).filter(expr="cnt > 1").count()
    )
    return pa.table({"n_dups": pa.array([dups], type=pa.int64())})


def q_equidistant_by_user(sf_dir: str):
    """A5/A6 as a result table: per-entity duplicate-timestamp and
    distinct-delta summary (the grouped equidistant check's internals,
    core.py:validate_temporal_ordering) — one bucket pass, one tiny row
    per entity."""
    from temporalscope_ray.stages import grouped

    ev = _events(sf_dir, ("ts", "user_id"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        segs = grouped.entity_segments(keys)
        out = []
        tsi = ts.astype("datetime64[us]").view("int64")
        for s, e in zip(segs[:-1], segs[1:]):
            d = np.diff(tsi[s:e])
            out.append((keys[s], int(e - s), int((d == 0).sum()), int(len(np.unique(d)))))
        return pd.DataFrame(out, columns=["user_id", "n_rows", "n_dups", "n_deltas"])

    return grouped.grouped_ordered_map(ev, "user_id", ["ts"], per_bucket)


def q_time_to_numeric(sf_dir: str):
    """M2: convert_datetime_column_to_timestamp — us-resolution
    timestamps to float64 epoch-microseconds (core.py)."""
    from temporalscope_ray.core import convert_time_column_to_numeric

    ev = _events(sf_dir, ("event_id", "ts"))
    return convert_time_column_to_numeric(ev, "ts", "us")


def q_window_tags(sf_dir: str):
    from temporalscope_ray.core import convert_time_column_to_numeric
    from temporalscope_ray.dataset import TemporalDataset
    from temporalscope_ray.stages.partition import SlidingWindowPartitioner

    ev = _events(sf_dir, ("event_id", "ts", "value"))
    ev = convert_time_column_to_numeric(ev, "ts", "us")
    td = TemporalDataset(ev, time_col="ts", target_col="value", sort=False, validate=False)
    p = SlidingWindowPartitioner(td, num_partitions=4, train_pct=0.6, test_pct=0.4)
    p.fit()
    return p.tag_windows().select_columns(["event_id", "window_id", "split"])


def q_mean_pad_value(sf_dir: str):
    from temporalscope_ray.stages.partition import mean_fill_pad

    ev = _events(sf_dir, ("value",))
    n = ev.count()
    return _round_cols(mean_fill_pad(ev, target_len=n + 100, padding="post"), ["value"])


def q_dedup_exact_docs(sf_dir: str):
    from temporalscope_ray.stages.dedup import exact_dedup

    docs = _read(sf_dir, "documents")
    return exact_dedup(docs, id_col="doc_id", content_cols=["text"])


def q_text_stats(sf_dir: str):
    from temporalscope_ray.stages.text import add_text_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_text_stats(docs, concurrency=(1, 2))
    return out.select_columns(["doc_id", "n_chars_calc", "n_tokens", "n_words"])


def q_token_sum_by_lang(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from temporalscope_ray.stages.text import add_text_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    stats = add_text_stats(docs, concurrency=(1, 2))
    return (
        stats.select_columns(["lang", "n_tokens"])
        .groupby("lang")
        .aggregate(Sum("n_tokens", alias_name="tokens_total"), Count(alias_name="n_docs"))
    )


def q_knn_brute(sf_dir: str):
    from temporalscope_ray.stages.similarity import knn_brute

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_rows = emb.filter(expr="vec_id == 0 or vec_id == 1").to_pandas().sort_values("vec_id")
    queries = np.stack(q_rows["embedding"].to_numpy()).astype(np.float64)
    out = knn_brute(emb, queries, k=10, concurrency=(1, 2))
    out = out.sort_values(["query_idx", "cos_sim", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out


def q_embedding_norms(sf_dir: str):
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(), "l2_norm": np.round(np.linalg.norm(mat, axis=1), 6)})

    return emb.map_batches(norms, batch_format="pandas")


def q_lineitem_agg(sf_dir: str):
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    # partial pre-aggregation inside map_batches, tiny final groupby
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"), sum_price=("l_extendedprice", "sum"), n=("l_quantity", "size")
        )
        return g

    agg = (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price", alias_name="sum_price"),
            Sum("n", alias_name="n"),
        )
    )
    return _round_cols(agg, ["sum_price"], ndigits=2)


def q_backfill(sf_dir: str):
    from temporalscope_ray.stages.window_features import backfill

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type", "value"))

    def mask(batch: pd.DataFrame) -> pd.DataFrame:
        batch["value_filled"] = batch["value"].where(batch["event_type"] != "click", np.nan)
        return batch[["event_id", "ts", "user_id", "value_filled"]]

    masked = ev.map_batches(mask, batch_format="pandas")
    return backfill(masked, id_col="user_id", time_col="ts", value_cols=["value_filled"], method="ffill")


def q_expand_targets(sf_dir: str):
    """Multi-step expanded targets, flattened to (row, step, value) for
    the oracle compare — list columns don't survive the driver's
    sort+hash, so the sequence is exploded losslessly: step s holds
    seq[s-1], i.e. the target s steps ahead."""
    from temporalscope_ray.stages.shift import expand_targets_multi_step

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = expand_targets_multi_step(
        ev, target_col="value", horizon=3, id_col="user_id", time_col="ts", tiebreak=["event_id"]
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        h = 3
        n = len(b)
        seqs = np.concatenate(b["value_seq_3"].to_numpy()) if n else np.array([], dtype=np.float64)
        rep = np.repeat(np.arange(n), h)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy()[rep],
                "ts": b["ts"].to_numpy()[rep],
                "user_id": b["user_id"].to_numpy()[rep],
                "value": b["value"].to_numpy()[rep],
                "step": np.tile(np.arange(1, h + 1), n),
                "target_value": np.asarray(seqs, dtype=np.float64),
            }
        )

    return out.map_batches(explode, batch_format="pandas")


def q_rolling_minmax(sf_dir: str):
    from temporalscope_ray.stages.window_features import add_rolling_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = add_rolling_features(
        ev, id_col="user_id", time_col="ts", value_cols=["value"], window=4,
        fns=("min", "max", "std"), tiebreak=["event_id"],
    )
    return _round_cols(out, ["value_roll_std_4"])


def q_streaming_features(sf_dir: str):
    """The stateful actor-pool path (cross-batch window state), SHARDED
    (concurrency=2: one ordered single-actor pool per entity-hash
    shard) — must equal the bucket-shuffle operators, so it shares
    their oracle."""
    from temporalscope_ray.stages.streaming_window import streaming_window_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = streaming_window_features(
        ev, id_col="user_id", time_col="ts", value_cols=["value"], lags=[1], windows=[4],
        session_gap=pd.Timedelta("30min"), batch_size=4096, concurrency=2, tiebreak=["event_id"],
    )
    out = _round_cols(out, ["value_roll_mean_4", "value_roll_sum_4"])
    return out.select_columns(
        ["event_id", "ts", "user_id", "value", "value_lag_1", "value_roll_mean_4", "value_roll_sum_4", "session_id"]
    )


def q_masv_lineitem(sf_dir: str):
    from temporalscope_ray.modeling import calculate_masv

    li = _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])
    masv = calculate_masv(li, feature_cols=["l_quantity", "l_discount"], coefs=[1.0, 2.0], concurrency=2)
    return pa.table({
        "masv_l_quantity": pa.array([round(masv["l_quantity"], 6)]),
        "masv_l_discount": pa.array([round(masv["l_discount"], 6)]),
    })


def q_simhash_kept_docs(sf_dir: str):
    """portable=True: token hashes are md5-lower-64, so the DuckDB
    oracle recomputes every doc's 64-bit simhash bit-for-bit and
    replays chunk bucketing + Hamming verification exactly."""
    from temporalscope_ray.stages.dedup import simhash_dedup

    docs = _read(sf_dir, "documents")
    return simhash_dedup(
        docs, text_col="text", id_col="doc_id", concurrency=2, portable=True
    ).select_columns(["doc_id"])


def q_jaccard_kept_docs(sf_dir: str):
    """Oracle = EXACT shingle-set Jaccard over all pairs in SQL; the
    engine's LSH candidates + exact verify must reproduce it (banding
    recall for pairs >= threshold is ~1-1e-13 at these params)."""
    from temporalscope_ray.stages.dedup import jaccard_dedup

    docs = _read(sf_dir, "documents")
    return jaccard_dedup(docs, text_col="text", id_col="doc_id", threshold=0.7, concurrency=2).select_columns(
        ["doc_id"]
    )


def q_embedding_kept_vecs(sf_dir: str):
    """Oracle = exact pairwise cosine in SQL (list_cosine_similarity);
    the banded multi-table hyperplane LSH + exact verify must match."""
    from temporalscope_ray.stages.dedup import embedding_dedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_dedup(emb, emb_col="embedding", id_col="vec_id", threshold=0.995, concurrency=2).select_columns(
        ["vec_id"]
    )


def q_knn_lsh(sf_dir: str):
    from temporalscope_ray.stages.similarity import knn_lsh

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_rows = emb.filter(expr="vec_id == 0").to_pandas()
    queries = np.stack(q_rows["embedding"].to_numpy()).astype(np.float64)
    out = knn_lsh(emb, queries, k=10, nbits=5, multiprobe=1, concurrency=2)
    out["cos_sim"] = np.round(out["cos_sim"], 6)
    return out


def q_validator_report(sf_dir: str):
    from temporalscope_ray.validator import DatasetValidator

    ev = _events(sf_dir, ("ts", "value")).map_batches(
        lambda b: b.rename(columns={"value": "target"}).assign(
            feature_1=lambda d: d["target"] * 2,
            feature_2=lambda d: d["target"] + 1,
            feature_3=lambda d: d["target"] ** 2,
            feature_4=lambda d: -d["target"],
        ),
        batch_format="pandas",
    )
    v = DatasetValidator(time_col="ts", target_col="target", max_samples=10_000_000, enable_warnings=False)
    results = v.fit_transform(ev)
    return pa.table({
        "check": pa.array(sorted(results.keys())),
        "passed": pa.array([results[k].passed for k in sorted(results.keys())]),
    })


def q_minhash_kept_docs(sf_dir: str):
    """portable=True: shingle hashes are md5-lower-64 of the joined
    token window, so the DuckDB oracle recomputes the full 64-perm
    MinHash signature (HUGEINT arithmetic replicating numpy's uint64
    wrap) and replays the banding decision exactly."""
    from temporalscope_ray.stages.dedup import minhash_dedup

    docs = _read(sf_dir, "documents")
    return minhash_dedup(
        docs, text_col="text", id_col="doc_id", concurrency=(1, 2), portable=True
    ).select_columns(["doc_id"])


def q_curation_pipeline(sf_dir: str):
    """Curation flagship (PII redact → Gopher gate → MinHash dedup) —
    a composition of three individually-green stages under ONE composed
    DuckDB oracle. ``portable=True`` so the MinHash leg is
    SQL-replayable."""
    from temporalscope_ray.pipelines.curation import curate_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return curate_documents(docs, concurrency=(1, 2), portable=True)


def q_ngram_lm_docs(sf_dir: str):
    """Corpus bigram-LM quality scores (add-0.5 smoothing against the
    corpus's own counts). Distributed end-to-end: two combiner count
    exchanges, two bucketed equi-joins, one per-doc combiner average —
    the vocabulary never touches the driver. Scores round to 6dp on
    both sides (log2 ulp + summation-order noise is ~1e-13)."""
    from temporalscope_ray.stages.text import ngram_lm_scores

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_lm_scores(docs, num_buckets=16)


def q_pii_redact_docs(sf_dir: str):
    """PII detection + redaction under a FULL value oracle: the shared
    RE2-compatible pattern list (email / phone / IPv4, applied
    sequentially) is replayed by DuckDB ``regexp_extract_all`` /
    ``regexp_replace('g')``. Deterministic PII is injected into every
    third document (both sides build the identical string) so the
    counts and replacements actually fire; the other docs gate the
    zero-match path."""
    from temporalscope_ray.stages.text import add_pii_redaction

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        d = b["doc_id"]
        extra = (
            " reach user" + d.astype(str) + "@mail.example.com or 555-123-"
            + (d % 10000).map("{:04d}".format)
            + " from 10." + (d % 256).astype(str) + ".0.1"
        )
        return pd.DataFrame({
            "doc_id": d.to_numpy(),
            "text": np.where(d.to_numpy() % 3 == 0, t + extra, t),
        })

    out = add_pii_redaction(docs.map_batches(inject, batch_format="pandas"),
                            concurrency=(1, 2))
    return out.select_columns(["doc_id", "n_email", "n_phone", "n_ipv4", "text_redacted"])


def q_line_dedup_docs(sf_dir: str):
    """Corpus-level C4 line dedup under a FULL value oracle: documents
    are deterministically re-lined (8-token lines — both sides build
    identical lines from '\\S+' tokens), then every line survives only
    at its first (doc_id, line_idx) occurrence corpus-wide and docs are
    reassembled; DuckDB replays via ROW_NUMBER over (line) + string_agg."""
    import re as _re

    from temporalscope_ray.stages.dedup import line_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # explicit RE2-parity class: Python's \S would treat \v / U+3000 as
    # whitespace, RE2's \S (= [^\t\n\f\r ]) does not
    from temporalscope_ray.stages.text import ASCII_NONSPACE_RE

    tok_re = _re.compile(ASCII_NONSPACE_RE)

    def to_lines(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in b["text"].fillna(""):
            toks = tok_re.findall(t)
            out.append("\n".join(" ".join(toks[j:j + 8]) for j in range(0, len(toks), 8)))
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "text": np.array(out, dtype=object)})

    lined = docs.map_batches(to_lines, batch_format="pandas")
    return line_dedup(lined, text_col="text", id_col="doc_id", num_buckets=16)


def q_phash_dedup_events(sf_dir: str):
    """Perceptual-hash near-dup dedup (the north-rule image table's
    ``phash:int64`` column) under a FULL value oracle: a deterministic
    64-bit hash derived from the events view (md5-lower-64 of the user
    id, low 4 bits XOR-perturbed by the event id — so same-user rows
    sit at Hamming distance 0–4, straddling the threshold), thinned to
    ``event_id % 3 == 0`` so the SQL brute-force pair scan stays small.
    4×16-bit chunk banding is pigeonhole-exact at threshold 3, so the
    kept set must EQUAL DuckDB's global
    ``NOT EXISTS(smaller id with bit_count(xor(h_i,h_j)) <= 3)``."""
    from temporalscope_ray.stages.dedup import _md5_lower64, phash_dedup

    ev = _events(sf_dir, ("event_id", "user_id"))

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_id"] % 3 == 0]
        h = _md5_lower64([str(u) for u in b["user_id"].tolist()])
        noise = (b["event_id"].to_numpy() % 16).astype(np.uint64)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "phash": (h ^ noise).view(np.int64),
        })

    hashed = ev.map_batches(mk, batch_format="pandas")
    return phash_dedup(
        hashed, hash_col="phash", id_col="event_id", hamming_threshold=3,
        concurrency=(1, 2), num_buckets=16,
    ).select_columns(["event_id"])


def q_image_pipeline(sf_dir: str):
    """attach="partitioned": the gate exercises the 100 TB co-partitioned
    feature-attach path (broadcast disabled); broadcast-vs-partitioned
    equality is pytest-verified."""
    from temporalscope_ray.pipelines.flagship import image_feature_pipeline

    out = image_feature_pipeline(sf_dir, concurrency=(1, 2), attach="partitioned")
    return out.drop_columns(["bytes"])


def q_audio_pipeline(sf_dir: str):
    """REAL WAV decode (numpy RIFF/PCM16 codec) + temporal lag over the
    deterministic synthetic audio table (no SQL oracle possible — the
    table is not a driver view and the decode is not SQL-expressible;
    decode correctness is pytest-gated: spectral centroid recovers the
    generator's tone frequency)."""
    from temporalscope_ray import synth
    from temporalscope_ray.stages.multimodal import add_audio_features
    from temporalscope_ray.stages.window_features import add_lag_lead_features

    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    rows = max(64, int(2000 * sf * 10))
    path = synth.materialize_audio_table(f"/tmp/tsray_audio_tables/{name}_{rows}", rows,
                                         num_entities=max(4, rows // 16))
    ds = ray.data.read_parquet(path)
    feats = add_audio_features(ds, concurrency=(1, 4))
    out = add_lag_lead_features(
        feats.drop_columns(["bytes"]), id_col="speaker_id", time_col="ts",
        value_cols=["rms_energy"], lags=[1], num_buckets=8,
    )
    return out.select_columns(["clip_id", "speaker_id", "spectral_centroid_hz",
                               "rms_energy", "rms_energy_lag_1"])


def q_video_pipeline(sf_dir: str):
    """vid1 decode + uniform frame sampling + motion features, then
    per-channel session stats (rows-only check; motion-vs-generator
    monotonicity is pytest-gated)."""
    from temporalscope_ray import synth
    from temporalscope_ray.stages.multimodal import add_video_features

    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    rows = max(32, int(500 * sf * 10))
    path = synth.materialize_video_table(f"/tmp/tsray_video_tables/{name}_{rows}", rows,
                                         num_entities=max(4, rows // 8))
    ds = ray.data.read_parquet(path)
    out = add_video_features(ds, sample_k=8, concurrency=(1, 4)).drop_columns(["bytes"])
    return out.select_columns(["video_id", "channel_id", "n_frames", "fps",
                               "motion_energy", "mean_brightness"])


def q_flagship(sf_dir: str):
    from temporalscope_ray.pipelines.flagship import temporal_feature_pipeline

    out = temporal_feature_pipeline(sf_dir)
    return _round_cols(out, ["value_roll_mean_4", "value_roll_sum_4"])


# deterministic-split / sampling / normalization / vocabulary queries
# (training-data plumbing; md5-keyed decisions so DuckDB replays them)

SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SAMPLE_RATES = {"en": 0.3, "fr": 1.0}
SAMPLE_DEFAULT_RATE = 0.6


def q_hash_split_docs(sf_dir: str):
    """Every document with its deterministic train/val/test assignment
    (keyed on md5 of the doc id — reproducible at any parallelism)."""
    from temporalscope_ray.stages.sampling import with_split_column

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return with_split_column(docs, "doc_id", SPLIT_FRACTIONS, portable=True)


def q_stratified_sample_docs(sf_dir: str):
    """Language-stratified downsample: cap 'en' at 30%, keep all 'fr',
    60% elsewhere — the web-corpus rebalancing move."""
    from temporalscope_ray.stages.sampling import stratified_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample(docs, "doc_id", strata_col="lang", portable=True,
                             rates=SAMPLE_RATES, default_rate=SAMPLE_DEFAULT_RATE)


def q_shuffle_docs(sf_dir: str):
    """Reproducible epoch shuffle: every document with its global
    post-shuffle position (md5-keyed total order — identical at any
    parallelism; the position column makes the permutation order-free
    and SQL-auditable)."""
    from temporalscope_ray.stages.sampling import deterministic_shuffle

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return deterministic_shuffle(docs, "doc_id", salt="epoch0", pos_col="shuffle_pos",
                                 portable=True)


def q_sample_k_docs(sf_dir: str):
    """Exactly-100 deterministic uniform sample (largest md5(key||'eval')
    wins) — held-out eval-set selection; k-cap combiner, no global sort."""
    from temporalscope_ray.stages.sampling import sample_k

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return sample_k(docs, "doc_id", k=100, salt="eval", portable=True)


def q_normalize_text_docs(sf_dir: str):
    """Canonical curation normalization: lowercase + collapse ASCII
    whitespace runs + trim — pure Arrow kernels, zero shuffle."""
    from temporalscope_ray.stages.text import normalize_text

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return normalize_text(docs, "text", out_col="norm_text").drop_columns(["text"])


def q_temperature_resample_docs(sf_dir: str):
    """Language rebalancing at temperature alpha=0.3 (heads shrink,
    tails keep rate 1.0); rates derived from corpus counts via one
    combiner exchange, decision integer-exact per row."""
    from temporalscope_ray.stages.sampling import temperature_resample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return temperature_resample(docs, "doc_id", "lang", alpha=0.3, salt="tmp",
                                portable=True)


def q_interarrival_by_user(sf_dir: str):
    """Per-user microseconds since the previous event (null on each
    user's first) — exact int64 diffs, surfaced as double for the gate."""
    from temporalscope_ray.stages.window_features import add_interarrival

    ev = _events(sf_dir, ("event_id", "ts", "user_id"))
    out = add_interarrival(ev, id_col="user_id", time_col="ts", tiebreak=["event_id"])
    return _round_cols(out, ["interarrival_us"])


def q_time_to_next_by_user(sf_dir: str):
    """Per-user microseconds to the NEXT event (null on each user's
    last) — the time-to-event label; exact int64, surfaced as double."""
    from temporalscope_ray.stages.window_features import add_time_to_next

    ev = _events(sf_dir, ("event_id", "ts", "user_id"))
    out = add_time_to_next(ev, id_col="user_id", time_col="ts", tiebreak=["event_id"])
    return _round_cols(out, ["time_to_next_us"])


def q_rolling_slope_by_user(sf_dir: str):
    """Per-user trailing 8-row regression slope of value vs time
    (units/hour) — the local-trend feature."""
    from temporalscope_ray.stages.window_features import add_rolling_slope

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = add_rolling_slope(ev, id_col="user_id", time_col="ts",
                            value_col="value", window=8, per="h",
                            out_col="value_slope_8", tiebreak=["event_id"])
    # units/hour slopes reach 1e3–1e4, so the gate quantizes at 2dp
    # (magnitude-aware: a 6dp grid on 1e4-scale floats is finer than
    # cross-engine float agreement); the operator's time-variance floor
    # already nulls the ill-conditioned windows on both sides
    return _round_cols(out, ["value_slope_8"], ndigits=2)


def q_anomaly_flags_by_user(sf_dir: str):
    """Trailing 8-row z-score anomaly flag per user (k=3; null where the
    window has no std; exact int flag surfaced as double for the gate)."""
    from temporalscope_ray.stages.window_features import add_anomaly_flag

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = add_anomaly_flag(ev, id_col="user_id", time_col="ts",
                           value_col="value", window=8, k=3.0,
                           tiebreak=["event_id"])
    return _round_cols(out, ["is_anomaly"])


def q_doc_keywords(sf_dir: str):
    """Per-document keyword (argmax tf·idf term, deterministic ties) —
    keyword extraction over the corpus."""
    from temporalscope_ray.stages.text import top_keyword

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return top_keyword(docs)


def q_moments_by_type(sf_dir: str):
    """Per-event-type sample skewness and excess kurtosis of value
    (the distribution-shape profile feature): two combiner exchanges,
    facts never shuffle; group-mean centering keeps the order-3/4
    power sums exact, constancy detected via exact min==max."""
    from temporalscope_ray.stages.stats import grouped_moments

    ev = _events(sf_dir, ("event_type", "value"))
    return grouped_moments(ev, "event_type", "value")


def q_revenue_by_nation(sf_dir: str):
    """TPC-H Q5-shaped star join: revenue per nation where customer and
    supplier share the nation, one region, an order-date window. Three
    bucketed fact exchanges (lineitem⋈orders⋈customer⋈supplier — all
    grow with SF, broadcast would be wrong at 100 TB), fixed-size
    nation⋈region resolved on the driver, int64 10^-4-dollar units so
    the rollup is bit-exact against any engine (no rounding)."""
    from temporalscope_ray.pipelines.starjoin import revenue_by_nation

    return revenue_by_nation(
        _read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        _read(sf_dir, "nation"), _read(sf_dir, "region"),
        region_name="ASIA", date_lo="1995-01-01", date_hi="2002-01-01",
    )


def q_winsorize_by_type(sf_dir: str):
    """Per-event-type winsorization of value at [p05, p95] (exact
    grouped quantiles, bounds quantized to 6dp so clips compare against
    bit-identical doubles and the output needs no rounding)."""
    from temporalscope_ray.stages.stats import winsorize_per_group

    ev = _events(sf_dir, ("event_id", "event_type", "value"))
    return winsorize_per_group(ev, "event_type", "value",
                               lower=0.05, upper=0.95)


def q_feature_corr_lineitem(sf_dir: str):
    """Feature-selection screen: Pearson corr of each lineitem numeric
    feature against extendedprice (pairwise-complete, SQL corr()
    semantics) — two combiner passes, zero fact shuffle."""
    from temporalscope_ray.stages.stats import pairwise_corr

    li = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_quantity", "l_discount", "l_tax"])
    return pairwise_corr(li, "l_extendedprice",
                         ["l_quantity", "l_discount", "l_tax"])


def q_mi_type_value(sf_dir: str):
    """Mutual information (nats) between event_type and a 10-bin
    equal-width binning of value — nonlinear feature relevance; one
    tree-reduce + one tiny combiner count exchange."""
    from temporalscope_ray.stages.stats import mutual_information

    ev = _events(sf_dir, ("event_type", "value"))
    return mutual_information(ev, "event_type", "value", bins=10)


def q_ks_drift_value(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov statistic of value between
    the first and second time halves — the sharp drift test beside the
    binned PSI; distinct-value combiner reduce, one sorted scan, block
    maxima folded on the driver."""
    from temporalscope_ray.stages.stats import ks_drift

    ev = _events(sf_dir, ("ts", "value"))
    return ks_drift(ev, "value", "ts")


def q_phash_stream_prev(sf_dir: str):
    """Consecutive-frame image near-dup stream: per user, Hamming
    distance of each image phash to the SAME user's previous image
    (ordered ts, event_id; null on firsts), flag at <=3 bits — the
    temporal sibling of phash_dedup_events, one bucket exchange with a
    vectorized byte-table popcount."""
    from temporalscope_ray.stages.dedup import _md5_lower64
    from temporalscope_ray.stages.multimodal import hamming_to_previous

    ev = _events(sf_dir, ("event_id", "ts", "user_id"))

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_id"] % 3 == 0]
        h = _md5_lower64([str(u) for u in b["user_id"].tolist()])
        noise = (b["event_id"].to_numpy() % 16).astype(np.uint64)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "ts": b["ts"].to_numpy(),
            "user_id": b["user_id"].to_numpy(),
            "phash": (h ^ noise).view(np.int64),
        })

    hashed = ev.map_batches(mk, batch_format="pandas")
    out = hamming_to_previous(
        hashed, id_col="user_id", time_col="ts", hash_col="phash",
        flag_threshold=3, tiebreak=["event_id"])
    # exact small ints / booleans, surfaced as double (driver-compare
    # convention for nullable columns)
    return _round_cols(out.select_columns(["event_id", "hamming_prev", "is_near_prev"]),
                       ["hamming_prev", "is_near_prev"])


def q_entropy_by_user(sf_dir: str):
    """Shannon entropy (nats) of each user's event-type distribution —
    the behavioral-diversity feature; distinct-pair combiner then a
    vocab-bounded per-key pass, facts never shuffle twice."""
    from temporalscope_ray.stages.agg import grouped_entropy

    ev = _events(sf_dir, ("user_id", "event_type"))
    return grouped_entropy(ev, "user_id", "event_type")


def q_top_orders_building(sf_dir: str):
    """TPC-H Q3 shape: 10 highest-revenue BUILDING-segment orders placed
    before 1998-01-01 with lineitems still shipping after it — two
    bucketed fact exchanges, combiner rollup, partial top-k merge (no
    global sort); int64 money units make the ranking key exact."""
    from temporalscope_ray.pipelines.starjoin import top_unshipped_orders

    return top_unshipped_orders(
        _read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]),
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]),
        segment="BUILDING", date="1998-01-01", k=10,
    )


def q_promo_revenue_share(sf_dir: str):
    """TPC-H Q14 shape: percentage of ship-window revenue from promo
    parts - one bucketed lineitem-part exchange, two-cell combiner
    reduce, exact int64 unit sums so the ratio needs no tolerance."""
    from temporalscope_ray.pipelines.starjoin import promo_revenue_share

    return promo_revenue_share(
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]),
        _read(sf_dir, "part", columns=["p_partkey", "p_type"]),
    )


def q_rolling_type_diversity(sf_dir: str):
    """Distinct event types in each user's trailing 4 rows (current
    inclusive) - the windowed behavioral-diversity feature; factorized
    codes + O(window^2) vectorized comparisons in one bucket pass."""
    from temporalscope_ray.stages.window_features import add_rolling_distinct

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return add_rolling_distinct(ev, id_col="user_id", time_col="ts",
                                cat_col="event_type", window=4,
                                tiebreak=["event_id"])


def q_table_diff_customer(sf_dir: str):
    """Keyed two-table parity report (the scale form of the north
    rule's per-row invariant check): diff two derived views of customer
    - side B drops different keys and perturbs acctbal on c_custkey%97
    - via ONE key-hash exchange reduced to six counters per bucket."""
    from temporalscope_ray.stages.setops import table_diff

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])

    def side_a(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["c_custkey"] % 29 != 0]

    def side_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_custkey"] % 31 != 0].copy()
        hit = (df["c_custkey"] % 97 == 0).to_numpy()
        df["c_acctbal"] = np.where(hit, df["c_acctbal"].to_numpy() + 1.0,
                                   df["c_acctbal"].to_numpy())
        return df

    a = cust.map_batches(side_a, batch_format="pandas")
    b = cust.map_batches(side_b, batch_format="pandas")
    out = table_diff(a, b, "c_custkey", ["c_name", "c_acctbal"])
    scale = 1e6
    out["pass_rate"] = np.sign(out["pass_rate"]) * np.floor(
        np.abs(out["pass_rate"]) * scale + 0.5) / scale
    return out


def q_decayed_sum_by_user(sf_dir: str):
    """Time-decayed recency-weighted value sum (halflife 1h, last 8
    events) per user - the irregular-sampling recency feature a
    row-step EWM gets wrong; fixed-order finite sum so the SQL chain
    replays bit-for-bit. Nulls filtered on both sides (same convention
    as ewm_value_by_user)."""
    from temporalscope_ray.stages.window_features import add_decayed_sum

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value")).map_batches(
        lambda t: t.filter(pa.compute.is_valid(t.column("value"))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = add_decayed_sum(ev, id_col="user_id", time_col="ts",
                          value_col="value", halflife_s=3600.0, window=8,
                          tiebreak=["event_id"])
    return _round_cols(out, ["value_decay_sum_8"])


def q_impute_median_by_type(sf_dir: str):
    """Per-type median imputation of value (nulls planted at
    event_id % 13 == 0 so the fill path is exercised on this data);
    fill value quantized to 6dp so both engines substitute an
    identical double, non-null rows pass through bit-exact."""
    from temporalscope_ray.stages.stats import impute_per_group

    ev = _events(sf_dir, ("event_id", "event_type", "value"))

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["value"] = np.where(df["event_id"] % 13 == 0, np.nan, df["value"])
        return out

    masked = ev.map_batches(mask, batch_format="pandas")
    return impute_per_group(masked, "event_type", "value", strategy="median")


def q_cume_dist_value(sf_dir: str):
    """Global ECDF (CUME_DIST) of value per event row - the
    probability-integral-transform normalization; distinct-value
    combiner + one sorted scan + value join-back, counts int64 so the
    division is bit-exact."""
    from temporalscope_ray.stages.stats import add_cume_dist

    ev = _events(sf_dir, ("event_id", "value"))
    return add_cume_dist(ev, "value")


def q_trend_by_user(sf_dir: str):
    """Per-user whole-history OLS trend of value vs hours-since-stream-
    start (slope = value units/hour, intercept = level at stream start):
    two combiner passes with final-mean centering, regr_slope/intercept
    NULL rules (n<2 or constant x)."""
    from ray.data.aggregate import Min

    from temporalscope_ray.stages.stats import grouped_ols

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    t0 = int(pd.Timestamp(ev.aggregate(Min("ts"))["min(ts)"]).value // 1000)

    def hours(df: pd.DataFrame) -> pd.DataFrame:
        tu = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"user_id": df["user_id"],
                             "x_hours": (tu - t0) / 3.6e9,
                             "value": df["value"]})

    xs = ev.map_batches(hours, batch_format="pandas")
    return grouped_ols(xs, "user_id", "x_hours", "value")


def q_value_quantiles_sketch(sf_dir: str):
    """Sort-free histogram quantile estimate of value at p50/p90/p99
    (error bounded by one bin width; every arithmetic step shared with
    the SQL replay so even the approximation is bit-exact): one
    min/max tree-reduce + one combiner count exchange, never a sort."""
    from temporalscope_ray.stages.stats import approx_quantile_hist

    ev = _events(sf_dir, ("value",))
    return approx_quantile_hist(ev, "value", [0.5, 0.9, 0.99], bins=1024)


def q_will_purchase_7d(sf_dir: str):
    """Churn/conversion LABEL: does the same user emit a purchase
    strictly after each row within 7 days - exact int64 microseconds,
    one bucket exchange, bucket-wide composite-key searchsorted (no
    per-entity loop)."""
    from temporalscope_ray.stages.window_features import add_future_event_flag

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return add_future_event_flag(
        ev, id_col="user_id", time_col="ts", type_col="event_type",
        target_type="purchase", horizon_s=7 * 86400.0,
        out_col="will_purchase_7d", tiebreak=["event_id"])


def q_wau_daily(sf_dir: str):
    """Rolling 7-day distinct active users per observed day (the WAU
    curve): distinct (day,user) combiner, bounded x7 pair replication,
    exact grouped distinct-count - facts are never rescanned per
    window."""
    from temporalscope_ray.stages.agg import rolling_active_entities

    ev = _events(sf_dir, ("ts", "user_id"))
    return rolling_active_entities(ev, "ts", "user_id", window_days=7,
                                   day_col="day", out_col="wau")


def q_new_vs_returning_daily(sf_dir: str):
    """Daily acquisition split: distinct users seen for the first time
    that day vs returning - pair-table combiners + a bucketed
    self-join of the pairs with their per-entity first day (no
    driver-side entity map)."""
    from temporalscope_ray.stages.agg import new_vs_returning_daily

    ev = _events(sf_dir, ("ts", "user_id"))
    return new_vs_returning_daily(ev, "ts", "user_id")


def q_funnel_vcp_30min(sf_dir: str):
    """3-step strict-order funnel per session (view -> click ->
    purchase, greedy earliest chain, strict > so same-microsecond
    events never chain): one bucket pass, grouped-min chaining, no
    per-session loop."""
    from temporalscope_ray.stages.window_features import ordered_funnel

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return ordered_funnel(ev, id_col="user_id", time_col="ts",
                          type_col="event_type",
                          steps=["view", "click", "purchase"],
                          gap=pd.Timedelta("30min"), tiebreak=["event_id"])


def q_dedup_keep_longest(sf_dir: str):
    """Quality-aware dedup completing the cluster story: within each
    verified Jaccard duplicate cluster keep the LONGEST document (ties
    -> smallest id), keep everything unclustered - combiner argmax per
    cluster + size-adaptive anti-join, nothing corpus-sized anywhere."""
    from temporalscope_ray.stages.dedup import jaccard_pairs, keep_best
    from temporalscope_ray.stages.graph import connected_components

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    pairs = jaccard_pairs(docs, text_col="text", id_col="doc_id",
                          threshold=0.7, concurrency=2)
    clusters = connected_components(pairs, num_buckets=16)
    return keep_best(docs, clusters, id_col="doc_id", score_col="n_chars")


def q_late_events_5min(sf_dir: str):
    """Watermark lateness report: per event (in event_id ARRIVAL
    order), the high-water mark of strictly earlier arrivals'
    timestamps and how far behind it this event's timestamp is — the
    streaming out-of-orderness monitor that sizes allowed-lateness.
    Built on the new global_running_max two-pass scan (int64 us
    end-to-end)."""
    from temporalscope_ray.stages.scan import global_running_max

    ev = _events(sf_dir, ("event_id", "ts"))
    wm = global_running_max(ev, order_by=["event_id"], value_col="ts",
                            out_col="watermark", exclusive=True)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        # unit-safe epoch-us (dtype axis: a ms-resolution ts column's
        # .astype("int64") would yield ms, breaking the us thresholds)
        t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        mask = pd.notna(b["watermark"]).to_numpy()
        wi_us = b["watermark"].to_numpy().astype("datetime64[us]")
        wi = np.where(mask, wi_us.astype(np.int64), 0)
        late = np.maximum(wi - t, 0).astype(np.float64)
        out = pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "ts": b["ts"].to_numpy(),
            "watermark": b["watermark"].to_numpy(),
            "lateness_us": np.where(mask, late, np.nan),
            "is_late": np.where(mask & (wi - t > 300_000_000), 1, 0).astype(np.int64),
        })
        return out

    return wm.map_batches(finish, batch_format="pandas")


def q_top_journeys_30min(sf_dir: str):
    """Journey mining: the 10 most common session-opening paths (first
    3 event types per 30-min session, '>'-joined) — sessionize + rn +
    vectorized path concat in ONE bucket pass, then a tiny path count
    and the blockwise partial top-k merge."""
    from temporalscope_ray.stages.agg import top_k_rows
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate
    from temporalscope_ray.stages.window_features import session_paths

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    paths = session_paths(ev, id_col="user_id", time_col="ts",
                          type_col="event_type", gap=pd.Timedelta("30min"),
                          k=3, tiebreak=["event_id"])
    counts = hash_groupby_aggregate(
        paths.select_columns(["path"]), ["path"],
        {"n_sessions": (None, "count")}, num_buckets=4)
    return top_k_rows(counts, "n_sessions", 10, tiebreak=["path"])


def q_session_coactivity_30min(sf_dir: str):
    """Cross-user co-activity: how often each user pair had overlapping
    30-min sessions — the interval overlap self-join under time-bucket
    replication with owner-bucket exactly-once emission, then a tiny
    user-pair count aggregate."""
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate
    from temporalscope_ray.stages.join import interval_overlap_pairs
    from temporalscope_ray.stages.window_features import session_stats

    ev = _events(sf_dir, ("event_id", "ts", "user_id"))
    sess = session_stats(ev, id_col="user_id", time_col="ts",
                         gap=pd.Timedelta("30min"), tiebreak=["event_id"])
    pairs = interval_overlap_pairs(
        sess, key_cols=["user_id"], start_col="session_start",
        end_col="session_end", bucket_width_us=3_600_000_000, num_buckets=8)

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        ua = b["a_user_id"].to_numpy()
        ub = b["b_user_id"].to_numpy()
        keep = ua != ub
        return pd.DataFrame({"user_a": np.minimum(ua, ub)[keep],
                             "user_b": np.maximum(ua, ub)[keep]})

    cp = pairs.map_batches(canon, batch_format="pandas")
    return hash_groupby_aggregate(cp, ["user_a", "user_b"],
                                  {"n_overlaps": (None, "count")}, num_buckets=8)


def q_target_encode_asof_events(sf_dir: str):
    """LEAKAGE-FREE target encoding: mean value over all strictly
    earlier DAYS of the row's event type (the as-of-date feature-store
    aggregate; the whole-corpus encoder sees the row's own label).
    Combiner to the type×day grid, driver-side exclusive prefix,
    broadcast merge — exact integer units end-to-end."""
    from temporalscope_ray.stages.stats import target_encode_expanding_daily

    ev = _events(sf_dir, ("event_id", "ts", "event_type", "value"))
    return target_encode_expanding_daily(ev, cat_col="event_type",
                                         target_col="value", time_col="ts")


def q_image_curation_pipeline(sf_dir: str):
    """North-rule showpiece composition: caption/metadata gate → phash
    near-dup dedup → dense re-index → deterministic contrastive
    negative pairing, end-to-end over a deterministic image view of
    documents (phash families keyed on (lang, source) with id%16 bit
    noise so pairs straddle the Hamming threshold)."""
    from temporalscope_ray.pipelines.curation import curate_image_corpus
    from temporalscope_ray.stages.dedup import _md5_lower64

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy()
        keys = [f"{l}|{s}" for l, s in zip(b["lang"].fillna(""),
                                           b["source"].fillna(""))]
        h = _md5_lower64(keys)
        noise = (d % 16).astype(np.uint64)
        return pd.DataFrame({
            "image_id": d,
            "w": (16 + (d * 7) % 120).astype(np.int64),
            "h": (16 + (d * 13) % 120).astype(np.int64),
            "caption": b["text"].fillna("").str.slice(0, 120),
            "phash": (h ^ noise).view(np.int64),
        })

    images = docs.map_batches(mk, batch_format="pandas")
    return curate_image_corpus(images, num_buckets=8, concurrency=2, portable=True)


def q_trending_daily_types(sf_dir: str):
    """Daily trending event types (top-2 per day by count, ties by
    type name): combiner counts per (day, type), then group_top_k's
    k-cap combiner — two bounded exchanges, exact int64 day ids."""
    from temporalscope_ray.stages.grouped import group_top_k, hash_groupby_aggregate

    ev = _events(sf_dir, ("ts", "event_type"))

    def day(b: pd.DataFrame) -> pd.DataFrame:
        ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = ts_us // 86_400_000_000
        return pd.DataFrame({"day": d, "event_type": b["event_type"]})

    daily = ev.map_batches(day, batch_format="pandas")
    counts = hash_groupby_aggregate(daily, ["day", "event_type"],
                                    {"n": (None, "count")}, num_buckets=8)
    return group_top_k(counts, "day", "n", k=2, tiebreak=["event_type"],
                       num_buckets=8)


def q_curriculum_shards_docs(sf_dir: str):
    """Curriculum construction: documents split into 8 near-equal
    shards of the (n_chars, doc_id) order — train easy-to-hard; exact
    NTILE arithmetic, O(blocks) driver traffic, no global sort
    materialization."""
    from temporalscope_ray.stages.sampling import curriculum_shards

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return curriculum_shards(docs, order_by=["n_chars", "doc_id"], n_shards=8)


def q_spearman_qty_price(sf_dir: str):
    """Global Spearman rank correlation of lineitem quantity vs
    extendedprice — distinct-value rank machinery (never ranks the
    fact table), exact half-integer average ranks, 6dp finish."""
    from temporalscope_ray.stages.stats import spearman_corr

    li = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
    return spearman_corr(li, "l_quantity", "l_extendedprice")


def q_next_purchase_prop_events(sf_dir: str):
    """Markov next-event propensity: every row gains the corpus
    P(next = purchase | current type) — transition-count combiner +
    vocab-sized broadcast lookup, exact int ratio so bit-exact."""
    from temporalscope_ray.stages.agg import attach_transition_prob

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return attach_transition_prob(ev, id_col="user_id", time_col="ts",
                                  type_col="event_type",
                                  target_type="purchase",
                                  tiebreak=["event_id"])


def q_dedup_rate_by_source(sf_dir: str):
    """Duplication health per source: distinct-text count, total, and
    the duplicate rate 1 − distinct/total (which feeds are copy farms):
    distinct (source, text-hash) pairs through one combiner exchange."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.agg import grouped_distinct_count
    from temporalscope_ray.stages.dedup import _md5_lower64
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def h(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"source": b["source"],
                             "th": _md5_lower64(b["text"].fillna("").tolist())
                             .view(np.int64)})

    hashed = docs.map_batches(h, batch_format="pandas").materialize()
    uniq = grouped_distinct_count(hashed, "source", "th", out_col="n_distinct")
    tot = hash_groupby_aggregate(hashed, ["source"], {"n_docs": (None, "count")},
                                 num_buckets=4)
    out = tot.to_pandas().merge(uniq.to_pandas(), on="source")
    out["n_docs"] = out["n_docs"].astype("int64")
    rate = 1.0 - out["n_distinct"].to_numpy(np.float64) / out["n_docs"].to_numpy(np.float64)
    out["dup_rate"] = np.floor(np.abs(rate) * 1e6 + 0.5) / 1e6 * np.sign(rate)
    return out


def q_peak_error_burst(sf_dir: str):
    """Worst error burst: the single event maximizing the trailing-1h
    global error count (ties → earliest, then event id) — the incident
    headline number. Filter → keyless time-bucket-replication window →
    partial top-k; never a global sort."""
    from temporalscope_ray.stages.agg import top_k_rows, trailing_global_aggregate

    ev = _events(sf_dir, ("event_id", "ts", "event_type"))
    errs = ev.filter(expr="event_type == 'error'").drop_columns(["event_type"])
    win = trailing_global_aggregate(errs, "ts", window_us=3_600_000_000)
    top = top_k_rows(win, "w_count", 1, tiebreak=["ts", "event_id"])
    return top[["event_id", "ts", "w_count"]]


def q_gini_user_activity(sf_dir: str):
    """Gini coefficient of per-user event counts (activity inequality —
    a concentration spike means bots or a broken producer): facts
    reduce once to per-user counts, the USERS-sized aggregate gets a
    dense rank from the two-pass block-offset index scan (no driver
    sort of users), and the Gini closes from exact int64 term sums."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.grouped import hash_groupby_aggregate
    from temporalscope_ray.stages.scan import with_global_index

    ev = _events(sf_dir, ("user_id",))
    counts = hash_groupby_aggregate(ev, ["user_id"], {"n": (None, "count")})
    idx = with_global_index(counts, order_by=["n", "user_id"], out_col="i")

    def terms(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        i = b["i"].to_numpy(np.int64) + 1  # 1-based rank
        return pd.DataFrame({"t": (2 * i) * n, "tn": n,
                             "one": np.ones(len(b), dtype=np.int64)})

    part = idx.map_batches(terms, batch_format="pandas").to_pandas()
    N, T = int(part["one"].sum()), int(part["tn"].sum())
    # Σ(2i - N - 1)·n = Σ2i·n - (N+1)·T  (exact int arithmetic)
    num = int(part["t"].sum()) - (N + 1) * T
    gini = num / (N * T) if N and T else np.nan
    gini = np.floor(abs(gini) * 1e6 + 0.5) / 1e6 * (1 if gini >= 0 else -1)
    return pd.DataFrame({"gini": [gini],
                         "n_users": pd.array([N], dtype="int64")})


def q_seasonality_strength_value(sf_dir: str):
    """Seasonality strength of events.value: eta² of the hour-of-day
    grouping (SS_between / SS_total — how much of the variance the
    daily cycle explains; the 'is a seasonal model worth it'
    diagnostic). One combiner pass to 24 (sum, sum², n) partials; the
    scalar closes on that tiny table."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.grouped import hash_groupby_aggregate

    ev = _events(sf_dir, ("ts", "value"))

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        ok = ~np.isnan(v)
        hod = (b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
               // 3_600_000_000) % 24
        return pd.DataFrame({"hod": hod[ok], "__s__": v[ok],
                             "__s2__": v[ok] * v[ok],
                             "__n__": np.ones(ok.sum(), dtype=np.int64)})

    agg = hash_groupby_aggregate(
        ev.map_batches(tag, batch_format="pandas"), ["hod"],
        {"s": ("__s__", "sum"), "s2": ("__s2__", "sum"), "n": ("__n__", "sum")},
        num_buckets=2).to_pandas()
    s, s2, n = (agg["s"].to_numpy(np.float64), agg["s2"].to_numpy(np.float64),
                agg["n"].to_numpy(np.float64))
    S, S2, N = s.sum(), s2.sum(), n.sum()
    ss_total = S2 - S * S / N
    ss_between = float(np.sum(s * s / n)) - S * S / N
    eta2 = ss_between / ss_total if ss_total > 0 else np.nan
    eta2 = np.floor(abs(eta2) * 1e6 + 0.5) / 1e6 * (1 if eta2 >= 0 else -1)
    return pd.DataFrame({"eta2_hod": [eta2],
                         "n": pd.array([int(N)], dtype="int64")})


def q_activation_lag_events(sf_dir: str):
    """Signup → first-purchase activation lag per user (µs; null when
    either anchor is missing): two minimum.reduceat segment reduces in
    one bucket pass, exact integer difference surfaced as double."""
    from temporalscope_ray.stages.agg import activation_lag

    ev = _events(sf_dir, ("ts", "user_id", "event_type"))
    return activation_lag(ev, id_col="user_id", time_col="ts",
                          type_col="event_type", start_type="signup",
                          goal_type="purchase")


def q_daily_value_bands(sf_dir: str):
    """Daily P50/P90 bands of events.value (the monitoring envelope a
    dashboards draws around the metric): one projected-pair exchange
    keyed on the day, per-day interpolated quantiles on the aggregate."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.agg import grouped_quantile

    ev = _events(sf_dir, ("ts", "value"))

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        return pd.DataFrame({"day": day, "value": b["value"]})

    tagged = ev.map_batches(tag, batch_format="pandas")
    out = grouped_quantile(tagged, "day", "value", q=[0.5, 0.9])
    return _round_cols(out, ["value_p50", "value_p90"])


def q_dn_retention_events(sf_dir: str):
    """Global D1/D7 retention (fraction of users active exactly 1 / 7
    days after their first day — the product health-check number):
    facts reduce once to distinct (user, day) pairs, one user-bucket
    pass computes first-day + offset flags, three scalars close from
    exact int counts."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.grouped import BUCKET_COL, with_bucket

    ev = _events(sf_dir, ("ts", "user_id"))

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        return pd.DataFrame({"user_id": b["user_id"], "day": day}).drop_duplicates()

    p = ev.map_batches(pairs, batch_format="pandas")
    bucketed = with_bucket(p, "user_id", 16)

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop(columns=[BUCKET_COL]).drop_duplicates()
        f = d.groupby("user_id", sort=False)["day"].min()
        have = set(zip(d["user_id"], d["day"]))
        d1 = np.fromiter(((u, fd + 1) in have for u, fd in f.items()), bool, len(f))
        d7 = np.fromiter(((u, fd + 7) in have for u, fd in f.items()), bool, len(f))
        return pd.DataFrame({"n": [len(f)], "d1": [int(d1.sum())], "d7": [int(d7.sum())]})

    part = bucketed.groupby(BUCKET_COL).map_groups(flags, batch_format="pandas").to_pandas()
    n, d1, d7 = int(part["n"].sum()), int(part["d1"].sum()), int(part["d7"].sum())
    return pd.DataFrame({
        "n_users": pd.array([n], dtype="int64"),
        "d1_rate": [np.floor(d1 / n * 1e6 + 0.5) / 1e6 if n else np.nan],
        "d7_rate": [np.floor(d7 / n * 1e6 + 0.5) / 1e6 if n else np.nan],
    })


def q_entropy_rate_events(sf_dir: str):
    """Markov entropy rate of the event stream: H(next | cur) =
    Σ_p P(p) Σ_c −P(c|p) ln P(c|p) over the corpus transition matrix —
    the sequence-predictability scalar (0 = deterministic journeys).
    One type²-partial exchange; the scalar closes from exact int
    counts on the vocab²-sized aggregate."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.agg import transition_counts

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    tc = transition_counts(ev, id_col="user_id", time_col="ts",
                           type_col="event_type",
                           tiebreak=["event_id"]).to_pandas()
    if len(tc) == 0:
        # no transitions anywhere (every entity is a single row): SQL's
        # aggregate-over-zero-rows result is ONE all-NULL row
        return pd.DataFrame({"entropy_rate": pd.array([None], dtype="float64"),
                             "n_transitions": pd.array([None], dtype="Int64")})
    tot = tc.groupby("prev_type")["n"].sum()
    grand = float(tc["n"].sum())
    p_cond = tc["n"].to_numpy(np.float64) / tot.reindex(tc["prev_type"]).to_numpy(np.float64)
    w = tot.reindex(tc["prev_type"]).to_numpy(np.float64) / grand
    h = float(np.sum(-w * p_cond * np.log(p_cond)))
    h = np.floor(abs(h) * 1e6 + 0.5) / 1e6 * (1 if h >= 0 else -1)
    return pd.DataFrame({"entropy_rate": [h],
                         "n_transitions": pd.array([int(grand)], dtype="int64")})


def q_max_streak_by_user(sf_dir: str):
    """Longest consecutive-active-day streak per user (gaps-and-
    islands): facts reduce once to distinct (user, day) pairs; the run
    length is a vectorized diff==1 scan over each user's sorted days."""
    from temporalscope_ray.stages.agg import max_streak_days

    ev = _events(sf_dir, ("ts", "user_id"))
    return max_streak_days(ev, id_col="user_id", time_col="ts")


def q_top_type_trigrams(sf_dir: str):
    """Top-20 event-type trigram sequences across user timelines (the
    funnel-discovery / bot-signature miner): n shifted concats masked
    at entity boundaries inside one bucket pass, vocabulary³-bounded
    aggregate, sort/limit on the aggregate only."""
    from temporalscope_ray.stages.agg import top_type_ngrams

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return top_type_ngrams(ev, id_col="user_id", time_col="ts",
                           type_col="event_type", n=3, k=20,
                           tiebreak=["event_id"])


def q_chi2_source_lang(sf_dir: str):
    """Chi² independence of source × lang (is the language filter
    skewing the source mix?): facts reduce once to a |A|×|B|
    contingency table; the statistic closes from exact int counts."""
    from temporalscope_ray.stages.stats import chi2_independence

    docs = _read(sf_dir, "documents", columns=["source", "lang"])
    return chi2_independence(docs, "source", "lang")


def q_acf_hourly_events(sf_dir: str):
    """ACF of global hourly event counts, lags 1..6 (periodicity
    diagnostic): facts reduce once to hours-sized partials, grid
    densification + per-lag corr on that aggregate."""
    from temporalscope_ray.stages.stats import hourly_count_acf

    ev = _events(sf_dir, ("ts",))
    return hourly_count_acf(ev, "ts", max_lag=6)


def q_type_share_by_user(sf_dir: str):
    """Behavioral profile: each user's share of activity per event type
    (n / user_total, exact int ratio — identical doubles both engines):
    one combiner exchange of (user, type, n) partials, the per-user
    total derived INSIDE the same user-bucket pass (entities are
    bucket-complete), zero extra exchange."""
    import pandas as pd

    from temporalscope_ray.stages.grouped import BUCKET_COL, hash_groupby_aggregate, with_bucket

    ev = _events(sf_dir, ("user_id", "event_type"))
    counts = hash_groupby_aggregate(ev, ["user_id", "event_type"],
                                    {"n": (None, "count")})
    bucketed = with_bucket(counts, "user_id", 16)

    def share(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[BUCKET_COL])
        tot = g.groupby("user_id", sort=False)["n"].transform("sum")
        g["n"] = g["n"].astype("int64")
        g["share"] = g["n"].astype("float64") / tot.astype("float64")
        return g

    return bucketed.groupby(BUCKET_COL).map_groups(share, batch_format="pandas")


def q_log_return_by_user(sf_dir: str):
    """Per-user log return ln(v_t / v_{t-1}) — scale-free change
    feature; null on entity firsts and non-positive ratios (SQL ln
    domain). One bucket exchange, one segment-safe shift."""
    from temporalscope_ray.stages.window_features import add_log_return

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return add_log_return(ev, id_col="user_id", time_col="ts",
                          value_col="value", tiebreak=["event_id"])


def q_hourly_rank_users(sf_dir: str):
    """Cross-sectional leaderboard: each user's dense activity rank
    among ALL users active the same hour (count desc, user asc) — the
    panel-data rank feature; facts reduce once to (hour, user, n)
    partials, ranking runs on that aggregate inside an hour-bucket
    pass, never on facts."""
    import pandas as pd

    from temporalscope_ray.stages.agg import time_bucket_aggregate
    from temporalscope_ray.stages.grouped import BUCKET_COL, with_bucket

    ev = _events(sf_dir, ("ts", "user_id"))
    hourly = time_bucket_aggregate(ev, "ts", "1h", {"n": (None, "count")},
                                   by=["user_id"])
    bucketed = with_bucket(hourly, "bucket_start", 16)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=[BUCKET_COL]).sort_values(
            ["bucket_start", "n", "user_id"], ascending=[True, False, True],
            kind="mergesort")
        g["rnk"] = g.groupby("bucket_start", sort=False).cumcount() + 1
        g["n"] = g["n"].astype("int64")
        g["rnk"] = g["rnk"].astype("int64")
        return g

    return bucketed.groupby(BUCKET_COL).map_groups(rank, batch_format="pandas")


def q_readability_docs(sf_dir: str):
    """Flesch-style reading-ease per document (vowel-group syllable
    surrogate, [.!?]+ sentences, \\w+ words — all SQL-replayable exact
    counts): zero shuffle, one vectorized actor pass."""
    from temporalscope_ray.stages.text import Readability

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(Readability(), batch_format="pandas", concurrency=2)
    return out.select_columns(["doc_id", "n_sentences", "n_words",
                               "n_syllables", "flesch"])


def q_behavior_features_pipeline(sf_dir: str):
    """Behavioral feature-store showpiece — three of this round's
    operators composed into one plan and gated END-TO-END by a single
    chained oracle: 6h greedy throttle (stream compaction) → Markov
    surprisal OVER THE SURVIVORS (the transition matrix is re-estimated
    on the compacted stream, not the raw one) → strict-prior
    time-since-purchase. Three entity-bucket exchanges, facts never
    widen."""
    import pandas as pd

    from temporalscope_ray.stages.agg import attach_surprisal
    from temporalscope_ray.stages.window_features import (
        add_time_since_event, throttle)

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    kept = throttle(ev, "user_id", "ts", min_gap_us=6 * 3_600_000_000,
                    tiebreak=["event_id"])
    surp = attach_surprisal(kept, id_col="user_id", time_col="ts",
                            type_col="event_type", tiebreak=["event_id"])
    out = add_time_since_event(surp, id_col="user_id", time_col="ts",
                               type_col="event_type", target_type="purchase",
                               tiebreak=["event_id"])

    def as_double(b: pd.DataFrame) -> pd.DataFrame:
        b["us_since_purchase"] = b["us_since_purchase"].astype("float64")
        return b

    return out.map_batches(as_double, batch_format="pandas")


def q_volume_anomalies_daily(sf_dir: str):
    """Daily volume-anomaly flags per event type (|z| >= 3 of the
    type's own daily-count distribution — catches dead producers and
    runaway bots before value-level drift fires): facts reduce once to
    (type, day, n); moments close from exact int sums."""
    from temporalscope_ray.stages.agg import daily_volume_anomalies

    ev = _events(sf_dir, ("ts", "event_type"))
    return daily_volume_anomalies(ev, time_col="ts", by="event_type")


def q_burstiness_by_user(sf_dir: str):
    """Per-user Fano factor of daily event counts (~1 Poisson, >>1
    bursty bot/batch traffic): facts reduce once to (user, day, n)
    partials, then per-user exact-int moment sums."""
    from temporalscope_ray.stages.agg import burstiness_fano

    ev = _events(sf_dir, ("ts", "user_id"))
    return burstiness_fano(ev, id_col="user_id", time_col="ts")


def q_purchase_cadence_by_user(sf_dir: str):
    """Median µs between consecutive purchases per user (the
    replenishment-cadence feature): type filter, segment diff and the
    per-entity interpolated quantile all inside ONE bucket pass. No
    rounding — interpolated midpoints of int64 gaps are exact doubles
    (quantizing ~1e10-µs gaps at 6dp would cross float53)."""
    from temporalscope_ray.stages.window_features import grouped_gap_quantile

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return grouped_gap_quantile(ev, id_col="user_id", time_col="ts", q=0.5,
                                out_col="median_gap_us", type_col="event_type",
                                only_type="purchase", tiebreak=["event_id"],
                                round_to=None)


def q_theil_sen_by_user(sf_dir: str):
    """Per-user Theil–Sen slope (median pairwise slope, units/hour) —
    the robust trend beside the OLS grouped_trend: one entity-bucket
    exchange, vectorized upper-triangle pair slopes per entity."""
    from temporalscope_ray.stages.stats import theil_sen_by_entity

    ev = _events(sf_dir, ("ts", "user_id", "value"))
    return theil_sen_by_entity(ev, id_col="user_id", time_col="ts",
                               value_col="value")


def q_wau_sketch_daily(sf_dir: str):
    """Trailing-7-day distinct users per day from MERGEABLE daily KMV
    sketches (k=16): exchange capped at k×blocks per day, window
    re-aggregation merges sketches — facts are never re-touched."""
    from temporalscope_ray.stages.agg import rolling_distinct_sketch

    ev = _events(sf_dir, ("ts", "user_id"))
    return rolling_distinct_sketch(ev, "ts", "user_id", window_days=7, k=16)


def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(returnflag, linestatus) — finest grain exchanged
    once, every subtotal derived from the groups-sized aggregate."""
    from temporalscope_ray.stages.agg import rollup_aggregate

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    out = rollup_aggregate(li, ["l_returnflag", "l_linestatus"],
                           {"sum_qty": ("l_quantity", "sum"),
                            "n": (None, "count")})
    return _round_cols(out, ["sum_qty"])


def q_trimmed_mean_by_type(sf_dir: str):
    """Per-type 5% trimmed mean of value (robust central tendency a
    corrupted shard can't move): quantile bounds from one projected-
    pair exchange, broadcast, then an ordinary combiner sum/count."""
    from temporalscope_ray.stages.agg import grouped_trimmed_mean

    ev = _events(sf_dir, ("event_type", "value"))
    return grouped_trimmed_mean(ev, "event_type", "value", trim=0.05)


def q_crowding_10min_events(sf_dir: str):
    """Global trailing-10-min count + value sum per event (the
    crowding / system-load feature — keyless, so the entity exchange
    can't express it): time-bucket replication with bucket width =
    window, 2× stub traffic, two searchsorted per bucket, no global
    sort."""
    from temporalscope_ray.stages.agg import trailing_global_aggregate

    ev = _events(sf_dir, ("event_id", "ts", "value"))
    return trailing_global_aggregate(ev, "ts", window_us=600_000_000,
                                     value_col="value")


def q_mad_value(sf_dir: str):
    """Global median + MAD of events.value (robust location/scale for
    outlier gating): two distributed-sort rank fetches, raw data-point
    outputs, no rounding tolerance."""
    from temporalscope_ray.stages.stats import median_absolute_deviation

    ev = _events(sf_dir, ("value",))
    return median_absolute_deviation(ev, "value")


def q_fingerprint_docs(sf_dir: str):
    """Portable content fingerprint per document (md5-lower-64 of the
    whitespace-collapsed lowered text), surfaced modulo a prime so the
    unsigned 64-bit value is SQL-comparable — the exact-dup key and
    cache key of a corpus pipeline."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.text import Fingerprint

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(Fingerprint(portable=True), batch_format="pandas",
                           concurrency=2)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        u = b["fingerprint"].to_numpy(np.int64).view(np.uint64)
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "fp_mod": (u % np.uint64(1_000_000_007)).astype(np.int64)})

    return out.map_batches(fin, batch_format="pandas")


def q_caption_spam_images(sf_dir: str):
    """Caption-spam audit over the north-rule image table: caption keys
    attached to >= 3 DISTINCT images (the LAION 'same boilerplate
    caption, thousands of images' failure) — distinct-pair combiner,
    one caption-hash exchange of pairs, never rows."""
    import pandas as pd

    from temporalscope_ray.stages.agg import grouped_distinct_count

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"image_id": b["doc_id"],
                             "caption": b["text"].fillna("").str.slice(0, 10)})

    img = docs.map_batches(mk, batch_format="pandas")
    out = grouped_distinct_count(img, "caption", "image_id", out_col="n_images")
    return out.filter(expr="n_images >= 3")


def q_langid_docs(sf_dir: str):
    """Stopword-overlap language ID per document (en/de/fr/es/und) —
    the actor-pool heuristic, now under a FULL value oracle: the SQL
    replays the token regex, the four stopword tables, the exact
    hit-ratio scores and the argmax tie order."""
    from temporalscope_ray.stages.text import LangId

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(LangId(), batch_format="pandas", concurrency=2)
    return out.select_columns(["doc_id", "lang_pred", "lang_score"])


def q_last_touch_events(sf_dir: str):
    """Last-touch attribution per purchase (type of the immediately
    preceding in-session event, 30-min gap rule; null = direct): one
    entity-bucket pass, two segment-safe shifts."""
    from temporalscope_ray.stages.window_features import last_touch_attribution

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return last_touch_attribution(ev, id_col="user_id", time_col="ts",
                                  type_col="event_type", target_type="purchase",
                                  gap_us=1_800_000_000, tiebreak=["event_id"])


def q_latest_snapshot_events(sf_dir: str):
    """CDC compaction: each user's single latest event row (change-log →
    current-snapshot) — distributive per-block tail-per-key, the
    exchange moves <= keys×blocks candidates, never the log."""
    from temporalscope_ray.stages.agg import latest_row_per_key

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type", "value"))
    return latest_row_per_key(ev, "user_id", order_by=["ts", "event_id"])


def q_group_kfold_events(sf_dir: str):
    """Entity-level 5-fold assignment balance report (every row of a
    user in the SAME fold — the leakage-safe CV split): zero-shuffle
    fold tag, combiner row counts + exact distinct-user counts, 5-row
    result."""
    import pandas as pd

    from temporalscope_ray.stages.agg import grouped_distinct_count
    from temporalscope_ray.stages.grouped import hash_groupby_aggregate
    from temporalscope_ray.stages.sampling import with_group_fold

    ev = _events(sf_dir, ("event_id", "user_id"))
    tagged = with_group_fold(ev, "user_id", k=5).materialize()
    rows = hash_groupby_aggregate(tagged, ["fold"], {"n_rows": (None, "count")},
                                  num_buckets=2).to_pandas()
    users = grouped_distinct_count(tagged, "fold", "user_id",
                                   out_col="n_users", num_buckets=2).to_pandas()
    out = rows.merge(users, on="fold").sort_values("fold").reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_seasonal_deviation_events(sf_dir: str):
    """Seasonality-adjusted residual per event (value minus its
    (type, hour-of-day) corpus baseline): one |types|×24 combiner pass,
    broadcast baseline, zero-shuffle attach."""
    from temporalscope_ray.stages.stats import seasonal_deviation

    ev = _events(sf_dir, ("event_id", "ts", "event_type", "value"))
    return seasonal_deviation(ev, time_col="ts", value_col="value",
                              by="event_type")


def q_psi_daily_value(sf_dir: str):
    """Day-over-day PSI drift series of events.value (the production
    drift monitor): one extrema tree-reduce + one zero-shuffle
    (day, bin) counting pass; per-day math on the days×bins aggregate."""
    from temporalscope_ray.stages.stats import psi_daily

    ev = _events(sf_dir, ("ts", "value"))
    return psi_daily(ev, "value", "ts", bins=10)


def q_source_token_share_docs(sf_dir: str):
    """Training-mix composition: per-source token totals, share, and
    cumulative share in descending order — combiner counts, one
    sources-sized exchange, window math on the aggregate only."""
    from temporalscope_ray.stages.text import source_token_share

    docs = _read(sf_dir, "documents", columns=["source", "text"])
    return source_token_share(docs)


def q_time_since_purchase_events(sf_dir: str):
    """Type-conditional recency per row (µs since the user's last
    STRICTLY PRIOR purchase — 'days since last purchase', leakage-free):
    one entity-bucket pass, masked cummax with segment resets."""
    from temporalscope_ray.stages.window_features import add_time_since_event

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    out = add_time_since_event(ev, id_col="user_id", time_col="ts",
                               type_col="event_type", target_type="purchase",
                               tiebreak=["event_id"])
    def as_double(b: pd.DataFrame) -> pd.DataFrame:
        # exact int64 (< 2^53) surfaced as double — NOT rounded: the
        # 6dp quantizer would push x*1e6 past float53 and corrupt it
        b["us_since_purchase"] = b["us_since_purchase"].astype("float64")
        return b

    return out.map_batches(as_double, batch_format="pandas")


def q_pmi_pairs_docs(sf_dir: str):
    """Top-30 document-level PMI collocations (pairs >= 5 docs): d²
    pair partials per doc through one pair-hash exchange, vocabulary
    table broadcast into a zero-shuffle PMI map, sort/limit on the
    aggregate only."""
    from temporalscope_ray.stages.text import pmi_pairs

    docs = _read(sf_dir, "documents", columns=["text"])
    return pmi_pairs(docs, min_pair_count=5, k=30)


def q_aspect_batches_images(sf_dir: str):
    """SDXL-style aspect-ratio bucketed batching over the north-rule
    image table: integer mille-ratio buckets (SQL-exact), then a dense
    within-bucket rank from the grouped two-pass block-offset scan —
    a bucket holding a third of the corpus is never co-located."""
    import pandas as pd

    from temporalscope_ray.stages.multimodal import aspect_bucket_batches

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy()
        return pd.DataFrame({"image_id": d, "w": 16 + (d * 7) % 120,
                             "h": 16 + (d * 13) % 120})

    img = docs.map_batches(mk, batch_format="pandas")
    return aspect_bucket_batches(img, batch_size=16)


def q_twa_value_by_user(sf_dir: str):
    """Per-user time-weighted average of value (hold-last semantics —
    the irregular-sampling-honest mean): one entity-bucket exchange,
    exact int64-microsecond weights, vectorized segment math."""
    from temporalscope_ray.stages.window_features import time_weighted_average

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return time_weighted_average(ev, "user_id", "ts", "value",
                                 tiebreak=["event_id"])


def q_throttle_6h_events(sf_dir: str):
    """Per-user greedy debounce (keep a row only >= 6h after the last
    KEPT row — each survivor re-arms the timer): one entity-bucket
    exchange, a searchsorted jump per SURVIVOR, never per row."""
    from temporalscope_ray.stages.window_features import throttle

    ev = _events(sf_dir, ("event_id", "ts", "user_id"))
    return throttle(ev, "user_id", "ts", min_gap_us=6 * 3_600_000_000,
                    tiebreak=["event_id"])


def q_time_split_events(sf_dir: str):
    """Purged temporal split (train < cutoff−embargo, test >= cutoff,
    the 2-day embargo gap dropped so lookback features can't leak
    across the boundary) — zero-shuffle stateless pass."""
    from temporalscope_ray.stages.sampling import time_split_embargo

    ev = _events(sf_dir, ("event_id", "ts"))
    return time_split_embargo(ev, "ts", cutoff="2024-02-15",
                              embargo_us=2 * 86_400_000_000)


def q_rfm_features_events(sf_dir: str):
    """Point-in-time RFM snapshot per user (recency/frequency/monetary
    strictly before the cutoff — leakage-free by construction): scan-
    level time prune, one combiner partial per (block, user), one
    entity-hash exchange of partials."""
    from temporalscope_ray.stages.agg import rfm_snapshot

    ev = _events(sf_dir, ("ts", "user_id", "event_type", "value"))
    out = rfm_snapshot(ev, id_col="user_id", time_col="ts",
                       cutoff="2024-02-01", value_col="value",
                       value_filter=("event_type", "purchase"))
    return _round_cols(out, ["monetary"])


def q_split_leakage_images(sf_dir: str):
    """Train/holdout leakage audit over the north-rule image table:
    every val/test image whose EXACT phash also appears in train (the
    split-contamination check run before any eval number is trusted).
    Deterministic md5 split + size-adaptive phash semi-join — at scale
    the train key set takes the bucketed exchange path, never the
    driver. The derived phash is entropy-limited (doc_id % 97) so
    cross-split collisions actually exist at test scale."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.asof import semi_join
    from temporalscope_ray.stages.dedup import _md5_lower64
    from temporalscope_ray.stages.sampling import with_split_column

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        ph = _md5_lower64([str(int(x) % 97) for x in b["doc_id"]])
        # int64 wraparound view: the join is bit-equality, and Arrow's
        # uint64 path trips on values above 2^63
        return pd.DataFrame({"image_id": b["doc_id"].to_numpy(),
                             "phash": ph.astype(np.uint64).view(np.int64)})

    img = with_split_column(docs.map_batches(mk, batch_format="pandas"), "image_id",
                            portable=True)
    train_keys = img.filter(expr="split == 'train'").select_columns(["phash"])
    holdout = img.filter(expr="split != 'train'")
    leaked = semi_join(holdout, train_keys, "phash")
    return leaked.select_columns(["image_id", "split"])


def q_heavy_hitters_docs(sf_dir: str):
    """Exact heavy-hitter terms (count >= 100) via the two-pass
    count-min-sketch plan: fixed-size sketch merge (no vocabulary
    exchange), then an exact recount of only the sketch's candidates —
    bit-identical to the full GROUP BY ... HAVING."""
    from temporalscope_ray.stages.text import heavy_hitter_terms

    docs = _read(sf_dir, "documents", columns=["text"])
    return heavy_hitter_terms(docs, threshold=100)


def q_label_coherence_vecs(sf_dir: str):
    """Intra-class coherence: cosine of every embedding to its own
    label's mean vector (the mislabel/outlier audit) — one combiner
    centroid pass (labels×d partials), broadcast, zero-shuffle cosine."""
    from temporalscope_ray.stages.linalg import label_centroid_cosine

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    return label_centroid_cosine(emb)


def q_source_overlap_docs(sf_dir: str):
    """Pairwise shingle-set Jaccard between document sources (the
    training-mix overlap report): distinct (hash, source) combiner →
    one shingle-hash exchange → in-bucket self-merge partials → a
    sources²-sized finish. Text never moves; counts are exact int64."""
    from temporalscope_ray.stages.dedup import source_overlap

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return source_overlap(docs, shingle_k=5, portable=True)


def q_kmeans_step_embeddings(sf_dir: str):
    """One Lloyd iteration of distributed k-means (k=4, deterministic
    smallest-vec_id seeds): assignment is a zero-shuffle broadcast map,
    the update is a pure combiner reduction (≤ k partial rows per
    block through one k-sized exchange — bytes never a function of row
    count). Emits (cluster, n, dim, centroid) long-form, 6dp."""
    import numpy as np
    import pandas as pd

    from temporalscope_ray.stages.linalg import kmeans_iterate, kmeans_seed_centroids

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    seeds = kmeans_seed_centroids(emb, "embedding", 4, id_col="vec_id")
    cents, counts = kmeans_iterate(emb, "embedding", seeds, iters=1)
    k, d = cents.shape
    q = np.sign(cents) * np.floor(np.abs(cents) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({
        "cluster": np.repeat(np.arange(k, dtype=np.int64), d),
        "n": np.repeat(counts, d),
        "dim": np.tile(np.arange(d, dtype=np.int64), k),
        "centroid": q.reshape(-1),
    })


def q_surprisal_events(sf_dir: str):
    """Markov surprisal: every event gains -ln P(cur | prev) under the
    corpus transition matrix — the sequence-anomaly score. Two bounded
    exchanges (type²-sized transition partials, then one entity-bucket
    fact pass with the broadcast vocab² matrix); the log argument is an
    exact int64 ratio so both engines take ln of the same double."""
    from temporalscope_ray.stages.agg import attach_surprisal

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return attach_surprisal(ev, id_col="user_id", time_col="ts",
                            type_col="event_type", tiebreak=["event_id"])


def q_cluster_cap_docs(sf_dir: str):
    """Cluster-cap subsampling (keep_best's softened k=2 form): each
    verified Jaccard duplicate family keeps its 2 longest documents
    (ties -> smallest id) plus everything unclustered — bounding the
    training weight of duplicate families without exact removal."""
    from temporalscope_ray.stages.dedup import cap_clusters, jaccard_pairs
    from temporalscope_ray.stages.graph import connected_components

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    pairs = jaccard_pairs(docs, text_col="text", id_col="doc_id",
                          threshold=0.7, concurrency=2)
    clusters = connected_components(pairs, num_buckets=16)
    return cap_clusters(docs, clusters, id_col="doc_id", k=2, score_col="n_chars")


def q_auc_value_purchase(sf_dir: str):
    """Exact distributed ROC-AUC of value as a purchase-predictor
    (Mann-Whitney rank form, average-rank ties): distinct-score
    combiner + one sorted scan, O(blocks) driver traffic; half-integer
    rank terms make the statistic bit-exact in any summation order."""
    from temporalscope_ray.stages.stats import roc_auc

    ev = _events(sf_dir, ("event_type", "value"))

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"value": df["value"],
                             "y": (df["event_type"] == "purchase").astype("int64")})

    return roc_auc(ev.map_batches(lab, batch_format="pandas"), "value", "y")


def q_quantile_sketch_by_type(sf_dir: str):
    """Per-type p50/p90 histogram-sketch quantiles - the bounded
    exchange (groups x bins combiner rows) scale path beside the exact
    pair-exchange grouped quantiles; bit-exact approximation (shared
    bin/rank/edge arithmetic with SQL)."""
    from temporalscope_ray.stages.stats import grouped_quantile_hist

    ev = _events(sf_dir, ("event_type", "value"))
    return grouped_quantile_hist(ev, "event_type", "value", [0.5, 0.9], bins=256)


def q_autocorr1_by_user(sf_dir: str):
    """Whole-history lag-1 value autocorrelation per user (behavioral
    persistence): segment lag + per-entity Pearson reduced in ONE
    bucket pass - corr(v, lag(v)) GROUP BY user semantics."""
    from temporalscope_ray.stages.window_features import grouped_autocorr

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return grouped_autocorr(ev, id_col="user_id", time_col="ts",
                            value_col="value", lag=1, tiebreak=["event_id"])


def q_compact_stream_events(sf_dir: str):
    """Stream compaction: drop rows whose (event_type, value) equal the
    user's previous row (null-safe equality), keeping run firsts -
    double-fire/bounce noise removal in one bucket exchange."""
    from temporalscope_ray.stages.window_features import drop_consecutive_duplicates

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type", "value"))
    return drop_consecutive_duplicates(
        ev, id_col="user_id", time_col="ts",
        value_cols=["event_type", "value"], tiebreak=["event_id"])


def q_contamination_rate_docs(sf_dir: str):
    """Graded decontamination: per even-id doc, the fraction of its
    distinct 5-token shingles present anywhere in the odd-id reference
    half (GPT-3-style n-gram overlap rate) - one hash exchange, per-doc
    (hits, total) combiner partials, exact integer ratio."""
    from temporalscope_ray.stages.dedup import contamination_rate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def par(keep):
        def f(t: pa.Table) -> pa.Table:
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(d % 2 == keep))
        return f

    corpus = docs.map_batches(par(0), batch_format="pyarrow", zero_copy_batch=True)
    reference = docs.map_batches(par(1), batch_format="pyarrow", zero_copy_batch=True)
    return contamination_rate(corpus, reference, portable=True, shingle_k=5)


def q_length_weighted_sample_docs(sf_dir: str):
    """Length-proportional deterministic corpus thinning (inclusion
    probability ~ n_chars, expected keep ~30%): integer weights make
    the mean a ratio of exact ints so both engines hold the same rate
    double; hash-grid coin, zero shuffle."""
    from temporalscope_ray.stages.sampling import importance_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return importance_sample(docs, "doc_id", "n_chars",
                             target_frac=0.3, salt="lw", portable=True)


def q_contrastive_triplets_docs(sf_dir: str):
    """CLIP-style contrastive triplet construction over the
    image↔caption proxy corpus (doc_id = image id, text = caption):
    anchor + positive caption + ONE deterministically drawn negative
    caption (md5 coin mod n, self-collision bumped), fetched through
    the equi-join — the training-set constructor for a contrastive
    objective; change the salt per epoch to redraw negatives."""
    from temporalscope_ray.stages.sampling import negative_pair

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return negative_pair(docs, "doc_id", ["text"], salt="neg", portable=True)


def q_history_seq_by_user(sf_dir: str):
    """Per-row autoregressive history (previous ≤5 event types, oldest
    first, leakage-free strictly-prior frame) — flattened to (row, pos,
    prev_type) for the oracle compare, like expand_targets_h3."""
    from temporalscope_ray.stages.window_features import add_history_sequence

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    out = add_history_sequence(ev, id_col="user_id", time_col="ts",
                               cat_col="event_type", window=5,
                               tiebreak=["event_id"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        col = b["event_type_hist_5"].to_numpy()
        counts = np.array([len(a) for a in col], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame({"event_id": np.array([], dtype=np.int64),
                                 "pos": np.array([], dtype=np.int64),
                                 "prev_type": pd.array([], dtype="string")})
        rep = np.repeat(b["event_id"].to_numpy(), counts)
        pos = np.concatenate([np.arange(1, c + 1) for c in counts if c > 0])
        prev = np.concatenate([np.asarray(a, dtype=object) for a in col if len(a)])
        return pd.DataFrame({"event_id": rep, "pos": pos,
                             "prev_type": pd.array(prev, dtype="string")})

    return out.map_batches(explode, batch_format="pandas")


def q_caption_gate_images(sf_dir: str):
    """LAION-style image↔caption curation gate over a deterministic
    image-metadata view of documents (w/h derived from doc_id, caption
    = first 120 chars): keep flag + first-fail drop reason
    (size → aspect → tokens → alnum), every comparison int-derived and
    bit-exact vs the SQL replay."""
    from temporalscope_ray.stages.multimodal import caption_image_gate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_img(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy()
        return pd.DataFrame({
            "image_id": d,
            "w": (16 + (d * 7) % 120).astype(np.int64),
            "h": (16 + (d * 13) % 120).astype(np.int64),
            "caption": b["text"].fillna("").str.slice(0, 120),
        })

    img = docs.map_batches(to_img, batch_format="pandas")
    out = caption_image_gate(img)
    return out.map_batches(
        lambda t: t.select(["image_id", "w", "h", "keep", "drop_reason"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_embedding_int8(sf_dir: str):
    """uint8 scalar quantization of the embedding column (per-dim
    min/max affine codes — the 4× index-compression step before ANN),
    exploded to (vec_id, dim, q) for the gate; the code assignment is
    bit-exact, not approximately close."""
    from temporalscope_ray.stages.linalg import quantize_embeddings

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = quantize_embeddings(emb, "embedding", bits=8)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        codes = b["embedding_q8"].to_numpy()
        n = len(b)
        if n == 0:
            return pd.DataFrame({"vec_id": np.array([], dtype=np.int64),
                                 "dim": np.array([], dtype=np.int64),
                                 "q": np.array([], dtype=np.int64)})
        d = len(codes[0])
        flat = np.concatenate([np.asarray(c, dtype=np.int64) for c in codes])
        return pd.DataFrame({
            "vec_id": np.repeat(b["vec_id"].to_numpy(), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "q": flat,
        })

    return out.drop_columns(["embedding"]).map_batches(explode, batch_format="pandas")


def q_cusum_value_by_user(sf_dir: str):
    """Per-user one-sided CUSUM drift score of value against the global
    mean (cents-exact: the whole recursion is int64, the only float op
    is the final /100) — the sequential change detector beside the
    batch drift monitors (PSI, KS)."""
    from temporalscope_ray.stages.window_features import add_cusum

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return add_cusum(ev, id_col="user_id", time_col="ts", value_col="value",
                     tiebreak=["event_id"])


def q_mode_event_type_by_user(sf_dir: str):
    """Each user's most frequent event type (deterministic ties:
    count desc then value asc) — the categorical profile feature."""
    from temporalscope_ray.stages.agg import grouped_mode

    ev = _events(sf_dir, ("user_id", "event_type"))
    return grouped_mode(ev, "user_id", "event_type")


def q_jaccard_clusters_docs(sf_dir: str):
    """Text duplicate-cluster labeling: verified exact-Jaccard pairs
    (LSH candidates + shingle-set verify, threshold 0.7) fed into
    distributed connected components — the text-modality mirror of
    phash_clusters_events."""
    from temporalscope_ray.stages.dedup import jaccard_pairs
    from temporalscope_ray.stages.graph import connected_components

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = jaccard_pairs(docs, text_col="text", id_col="doc_id",
                          threshold=0.7, concurrency=2)
    return connected_components(pairs, num_buckets=16)


def q_label_centroids(sf_dir: str):
    """Per-label mean embedding (class centroids) in long form —
    combiner vector sums, vectors never shuffle."""
    from temporalscope_ray.stages.linalg import group_mean_embedding

    emb = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    return group_mean_embedding(emb, "label")


def q_value_drift_psi(sf_dir: str):
    """Population Stability Index of events.value between the first and
    second half of the time range — the drift monitor; one tree-reduce
    + one zero-shuffle counting pass."""
    from temporalscope_ray.stages.stats import population_stability

    ev = _events(sf_dir, ("ts", "value"))
    return population_stability(ev, "value", "ts", bins=10)


def q_event_transitions(sf_dir: str):
    """Corpus-wide event-type transition counts (Markov matrix, long
    form) — in-order lag per user inside one bucket pass, combiner
    counts, tiny type² final aggregate."""
    from temporalscope_ray.stages.agg import transition_counts

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return transition_counts(ev, id_col="user_id", time_col="ts",
                             type_col="event_type", tiebreak=["event_id"])


def q_cohort_retention_weekly(sf_dir: str):
    """Weekly cohort retention in long form: distinct users per
    (first-activity week, week offset)."""
    from temporalscope_ray.stages.agg import cohort_retention

    ev = _events(sf_dir, ("user_id", "ts"))
    return cohort_retention(ev, id_col="user_id", time_col="ts")


def q_session_conversion_30min(sf_dir: str):
    """Per (user, 30-min session): did a purchase follow a view within
    the session — the funnel-conversion rollup, one bucket pass."""
    from temporalscope_ray.stages.window_features import session_conversion

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    import pandas as pd
    return session_conversion(ev, id_col="user_id", time_col="ts",
                              type_col="event_type", from_type="view",
                              to_type="purchase", gap=pd.Timedelta("30min"),
                              tiebreak=["event_id"])


def q_expanding_stats_by_user(sf_dir: str):
    """Per-user expanding mean/std of value (entire past incl. self) —
    the leakage-safe running profile."""
    from temporalscope_ray.stages.window_features import add_expanding_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))

    # the MEAN gate is integer-exact by construction: value has 2
    # decimals, so the operator runs on a cents int column whose
    # per-entity cumsum is exact in float64 — both engines then perform
    # the SAME single division, bit-identical regardless of summation
    # order (DuckDB's windowed SUM is segment-tree ordered; a float
    # fold can never bit-match it, and dyadic expanding means sit
    # exactly on every quantization boundary). The float mean path is
    # pytest-gated vs pandas; std (centered closed form) gates at 6dp.
    def add_cents(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(dtype=np.float64)
        c = np.rint(v * 100.0)
        b["cents"] = np.where(np.isnan(v), np.nan, c)
        return b

    out = add_expanding_features(ev.map_batches(add_cents, batch_format="pandas"),
                                 id_col="user_id", time_col="ts",
                                 value_cols=["cents", "value"], fns=("mean", "std"),
                                 tiebreak=["event_id"])

    def q(batch: pd.DataFrame) -> pd.DataFrame:
        batch["value_exp_mean"] = batch["cents_exp_mean"].to_numpy() / 100.0
        x = batch["value_exp_std"].astype(np.float64).to_numpy()
        with np.errstate(invalid="ignore"):
            batch["value_exp_std"] = np.floor(x * 1e6 + 0.25) / 1e6
        return batch.drop(columns=["cents", "cents_exp_mean", "cents_exp_std",
                                   "value_exp_mean"], errors="ignore").assign(
            value_exp_mean=batch["value_exp_mean"])

    return out.map_batches(q, batch_format="pandas")


def q_target_encode_events(sf_dir: str):
    """Smoothed mean-target encoding of event_type (m=20 shrink toward
    the global mean) — the high-cardinality categorical feature."""
    from temporalscope_ray.stages.stats import target_encode

    ev = _events(sf_dir, ("event_id", "event_type", "value"))
    return target_encode(ev, "event_type", "value", smoothing=20.0)


def q_freq_encode_events(sf_dir: str):
    """Frequency (count) encoding of event_type — exact int64."""
    from temporalscope_ray.stages.stats import frequency_encode

    ev = _events(sf_dir, ("event_id", "event_type"))
    return frequency_encode(ev, "event_type")


def q_value_bins_events(sf_dir: str):
    """Equal-width 10-bin discretization of events.value over the global
    [min,max]; boundary expression shared verbatim with the oracle so
    bins are IEEE-bit-exact. Null values bin to null (surfaced as
    double for the gate)."""
    from temporalscope_ray.stages.stats import equal_width_bin

    ev = _events(sf_dir, ("event_id", "value"))
    return _round_cols(equal_width_bin(ev, "value", k=10), ["value_bin"])


def q_cross_type_user_events(sf_dir: str):
    """Hashing-trick feature cross of (event_type, user_id) into 10^6
    bins — md5-exact in SQL."""
    from temporalscope_ray.stages.stats import feature_cross

    ev = _events(sf_dir, ("event_id", "event_type", "user_id"))
    return feature_cross(ev, ["event_type", "user_id"], out_col="type_user_cross")


def q_rolling_autocorr_by_user(sf_dir: str):
    """Per-user trailing 8-row Pearson autocorrelation of value vs its
    lag-1 — the co-movement / regime feature. Composed: lag stage then
    rolling-corr stage, both on the entity-bucket exchange."""
    from temporalscope_ray.stages.window_features import (
        add_lag_lead_features,
        add_rolling_corr,
    )

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    lagged = add_lag_lead_features(ev, id_col="user_id", time_col="ts",
                                   value_cols=["value"], lags=[1], leads=[],
                                   tiebreak=["event_id"])
    out = add_rolling_corr(lagged, id_col="user_id", time_col="ts",
                           x_col="value", y_col="value_lag_1", window=8,
                           out_col="autocorr", tiebreak=["event_id"])
    return _round_cols(out, ["autocorr"])


def q_session_features_30min(sf_dir: str):
    """Session-relative features (0-based position in session, exact
    microseconds since session start) in the same bucket pass as
    sessionization."""
    import pandas as pd
    from temporalscope_ray.stages.window_features import add_session_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id"))
    return add_session_features(ev, id_col="user_id", time_col="ts",
                                gap=pd.Timedelta("30min"), tiebreak=["event_id"])


def q_calendar_features_events(sf_dir: str):
    """Cyclical hour/day-of-week encodings + weekend flag over events.ts
    — zero shuffle; trig is bit-exact vs SQL (probed), no rounding."""
    from temporalscope_ray.stages.window_features import add_calendar_features

    ev = _events(sf_dir, ("event_id", "ts"))
    return add_calendar_features(ev, time_col="ts")


def q_minmax_by_user(sf_dir: str):
    """Per-user min-max scaling of value to [0,1] (NaN for constant
    users) — train-fit-able like the other scalers."""
    from temporalscope_ray.stages.stats import minmax_scale_per_group

    ev = _events(sf_dir, ("event_id", "user_id", "value"))
    return minmax_scale_per_group(ev, "user_id", "value")


def q_source_filter_docs(sf_dir: str):
    """Domain-level curation: keep documents only from sources whose
    MEAN distinct-word fraction clears 0.5 (doc scoring shuffle-free,
    one combiner rollup, broadcast verdict) — the C4 drop-bad-domains
    move at corpus scale."""
    from temporalscope_ray.stages.text import source_quality_filter

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    out = source_quality_filter(docs, min_mean=0.5)
    return out.drop_columns(["text"])


def q_resample_1h_by_user(sf_dir: str):
    """Regularized per-user series: hourly grid from first to last event
    carrying the latest value at or before each grid point (duplicate
    (user, ts) collapse to MAX — the as-of state convention)."""
    from temporalscope_ray.stages.window_features import resample_ffill

    ev = _events(sf_dir, ("user_id", "ts", "value"))
    return resample_ffill(ev, id_col="user_id", time_col="ts",
                          value_col="value", freq="1h")


def q_chunk_docs(sf_dir: str):
    """Context-window chunking: 48-token chunks with 8-token overlap
    per document — zero shuffle, list-slice-exact in SQL."""
    from temporalscope_ray.stages.text import chunk_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(docs, chunk_tokens=48, overlap=8)


def q_phash_clusters_events(sf_dir: str):
    """Image near-dup CLUSTER labeling: verified phash Hamming pairs
    (chunk banding, pigeonhole-exact at threshold 3) fed into
    distributed connected components; cluster_id = min reachable id.
    Same deterministic md5-derived phash column as phash_dedup_events."""
    from temporalscope_ray.stages.dedup import _md5_lower64, hamming_pairs
    from temporalscope_ray.stages.graph import connected_components

    ev = _events(sf_dir, ("event_id", "user_id"))

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_id"] % 3 == 0]
        h = _md5_lower64([str(u) for u in b["user_id"].tolist()])
        noise = (b["event_id"].to_numpy() % 16).astype(np.uint64)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(),
            "phash": (h ^ noise).view(np.int64),
        })

    hashed = ev.map_batches(mk, batch_format="pandas")
    pairs = hamming_pairs(hashed, hash_col="phash", id_col="event_id",
                          threshold=3, num_buckets=16)
    return connected_components(pairs, num_buckets=16)


def q_approx_distinct_users(sf_dir: str):
    """KMV sketch (k=16) of distinct users per event type — the
    bounded-exchange cardinality path; md5-deterministic, so the SQL
    oracle replays the exact estimate."""
    from temporalscope_ray.stages.agg import approx_distinct_kmv

    ev = _events(sf_dir, ("event_type", "user_id"))
    return approx_distinct_kmv(ev, "event_type", "user_id", k=16)


def q_training_mix_docs(sf_dir: str):
    """The full training-mix prep pass, composed end to end:
    temperature resample (alpha=0.5 language rebalance) → deterministic
    train split → epoch shuffle with materialized position →
    token-budget sequence packing. Only the shuffle sorts; every other
    stage is a combiner exchange or a zero-shuffle filter."""
    from temporalscope_ray.stages.sampling import (
        deterministic_shuffle,
        hash_split,
        temperature_resample,
    )
    from temporalscope_ray.stages.scan import pack_by_budget

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    mixed = temperature_resample(docs, "doc_id", "lang", alpha=0.5, salt="mix",
                                 portable=True)
    train = hash_split(mixed, "doc_id", SPLIT_FRACTIONS, portable=True)["train"]
    shuffled = deterministic_shuffle(train, "doc_id", salt="epoch0", pos_col="pos",
                                     portable=True)
    return pack_by_budget(shuffled, order_by=["pos"], token_col="n_chars",
                          capacity=4096)


def q_zscore_by_user(sf_dir: str):
    """Per-entity standardization of the value series (population std;
    NaN where an entity's std is 0)."""
    from temporalscope_ray.stages.stats import zscore_per_entity

    ev = _events(sf_dir, ("event_id", "user_id", "value"))
    out = zscore_per_entity(ev, "user_id", "value")
    return _round_cols(out, ["value_z"])


def q_value_quantiles(sf_dir: str):
    """Exact lower-rank order statistics of events.value (non-null):
    distributed single-column sort + rank-row fetch; the emitted values
    are EXISTING table values, so parity is arithmetic-free."""
    from temporalscope_ray.stages.stats import exact_quantiles

    ev = _events(sf_dir, ("value",)).map_batches(
        lambda t: t.filter(pa.compute.is_valid(t.column("value"))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return exact_quantiles(ev, "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def q_top_terms(sf_dir: str):
    """Corpus top-50 terms (count desc, term asc — total order)."""
    from temporalscope_ray.stages.text import top_terms

    docs = _read(sf_dir, "documents", columns=["text"])
    return top_terms(docs, "text", k=50)


def q_tfidf_docs(sf_dir: str):
    """Per-document TF-IDF mass (lexical salience quality signal)."""
    from temporalscope_ray.stages.text import tfidf_score

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return _round_cols(tfidf_score(docs, "text", "doc_id"), ["tfidf_sum"])


def q_bm25_docs(sf_dir: str):
    """Per-document Okapi BM25 against a fixed 4-term query — lexical
    retrieval scoring (two streaming passes, zero shuffles)."""
    from temporalscope_ray.stages.text import bm25_score

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_score(docs, "text", "doc_id",
                      ["hash", "join", "stream", "window"], round_to=6)


def q_embedding_cov(sf_dir: str):
    """Upper-triangle population covariance of the embedding column —
    O(d^2)-per-block combiner reduction, never row-count-sized."""
    from temporalscope_ray.stages.linalg import embedding_covariance

    emb = _read(sf_dir, "embeddings", columns=["embedding"])
    out = embedding_covariance(emb, "embedding")
    out["cov"] = np.round(out["cov"], 6)
    return out


def q_interp_value(sf_dir: str):
    """Per-entity linear interpolation of null values in time (no
    extrapolation at the edges)."""
    from temporalscope_ray.stages.window_features import interpolate_linear

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = interpolate_linear(ev, id_col="user_id", time_col="ts",
                             value_cols=["value"], tiebreak=["event_id"])
    return _round_cols(out, ["value_interp"])


def q_top3_events_by_user(sf_dir: str):
    """Per-group top-k: each user's 3 highest-value events
    (combiner top-k → one exchange of partials → final top-k)."""
    from temporalscope_ray.stages.grouped import group_top_k

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return group_top_k(ev, "user_id", "value", k=3, tiebreak=["event_id"])


def q_running_sum_value(sf_dir: str):
    """Distributed two-pass prefix scan (block partials -> driver
    offsets -> per-block cumsum): corpus-order running sum over the
    total (ts, event_id) order. The summand is ``floor(value*1000)``
    as int64 (null -> 0) so both sides are integer-exact — float
    cumsum association order would put ulp noise under the driver's
    value hash."""
    from temporalscope_ray.stages.scan import global_running_sum

    ev = _events(sf_dir, ("event_id", "ts", "value"))

    def to_int(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        mil = np.floor(np.nan_to_num(v, nan=0.0) * 1000.0).astype(np.int64)
        return batch.drop_columns(["value"]).append_column("value_mil", pa.array(mil))

    out = global_running_sum(
        ev.map_batches(to_int, batch_format="pyarrow", zero_copy_batch=True),
        order_by=["ts", "event_id"], value_col="value_mil", out_col="running_value_mil",
    )
    return out


def q_row_index_events(sf_dir: str):
    """0-based global row index over the total (ts, event_id) order —
    the count-partials form of the same two-pass scan."""
    from temporalscope_ray.stages.scan import with_global_index

    ev = _events(sf_dir, ("event_id", "ts"))
    return with_global_index(ev, order_by=["ts", "event_id"], out_col="row_idx")


def q_pack_chunks_docs(sf_dir: str):
    """Token-budget sequence packing: walking documents in doc_id
    order, each doc goes to chunk floor(tokens_before / capacity) —
    contiguous ~8 KiB-of-chars pre-training chunks, int64-exact."""
    from temporalscope_ray.stages.scan import pack_by_budget

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return pack_by_budget(docs, order_by=["doc_id"], token_col="n_chars",
                          capacity=8192, out_col="chunk_id")


def q_join_orders_customer(sf_dir: str):
    """Bucketed inner equi-join (fact × fact plan): both sides flow
    through ONE tagged-union hash exchange; per-bucket Arrow-side
    split keeps int64 keys out of any float64 round-trip."""
    from temporalscope_ray.stages.join import equi_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name", "c_acctbal"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return equi_join(orders, cust, "o_custkey", how="inner", broadcast=False)


def q_left_join_orders_customer(sf_dir: str):
    """Broadcast left join against a filtered dimension side —
    unmatched orders keep typed nulls in the customer columns."""
    from temporalscope_ray.stages.join import equi_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name", "c_acctbal"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).filter(expr="c_acctbal > 5000")
    return equi_join(orders, cust, "o_custkey", how="left", broadcast=True)


def q_full_join_orders_customer(sf_dir: str):
    """Bucketed FULL OUTER equi-join: orders restricted to odd order
    keys × customers with acctbal > 5000 — both sides contribute
    unmatched rows with typed nulls on the other side."""
    from temporalscope_ray.stages.join import equi_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(
            pa.compute.equal(pa.compute.bit_wise_and(t.column("o_orderkey"), 7), 0)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name", "c_acctbal"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).filter(expr="c_acctbal > 5000")
    out = equi_join(orders, cust, "o_custkey", how="full", broadcast=False)

    # nullable-int columns (unmatched rows) compare driver-side as
    # float64 — cast on BOTH sides so the value hash sees one type
    def f64(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("o_orderkey")
        return t.set_column(i, "o_orderkey", t.column("o_orderkey").cast(pa.float64()))

    return out.map_batches(f64, batch_format="pyarrow", zero_copy_batch=True)


def q_hourly_event_stats(sf_dir: str):
    """Tumbling 1-hour window aggregate via the combiner → one-hash-
    exchange plan (a day of events at any scale moves blocks×24
    partial rows, never facts)."""
    from temporalscope_ray.stages.agg import time_bucket_aggregate

    ev = _events(sf_dir, ("ts", "value"))
    out = time_bucket_aggregate(
        ev, "ts", "1h",
        {"n": (None, "count"), "sum_v": ("value", "sum"), "max_v": ("value", "max")},
    )
    return _round_cols(out, ["sum_v"])


def q_ohlc_hourly_by_user(sf_dir: str):
    """Per-user hourly OHLC bars (open/high/low/close/n) — first/last-
    by-time carried as distributive partials with their order keys, so
    the exchange moves one row per (block, user, hour), never facts;
    boundary values pass through untouched (bit-exact vs the SQL
    row_number form), high/low skip nulls like SQL MAX/MIN."""
    from temporalscope_ray.stages.agg import ohlc_bars

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = ohlc_bars(ev, "ts", "value", "1h", by=["user_id"], tiebreak=["event_id"])
    return out.map_batches(
        lambda t: t.select(["user_id", "bucket_start", "open_v", "high_v",
                            "low_v", "close_v", "n"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type — the exchange
    moves per-block distinct pairs only."""
    from temporalscope_ray.stages.agg import grouped_distinct_count

    ev = _events(sf_dir, ("event_type", "user_id"))
    return grouped_distinct_count(ev, "event_type", "user_id")


def q_event_type_pivot(sf_dir: str):
    """Per-user one-hot event-type count table (crosstab combiner
    partials through the standard hash-aggregate exchange)."""
    from temporalscope_ray.stages.agg import pivot_counts

    ev = _events(sf_dir, ("user_id", "event_type"))
    return pivot_counts(
        ev, "user_id", "event_type",
        values=["click", "error", "purchase", "signup", "view"],
    )


def q_value_histogram_events(sf_dir: str):
    """Fixed-bin histogram: zero shuffle, per-block bincount partials
    tree-summed on the driver."""
    from temporalscope_ray.stages.agg import value_histogram

    ev = _events(sf_dir, ("value",))
    return value_histogram(ev, "value", lo=0.0, hi=500.0, bins=20)


def q_cumulative_events_by_user(sf_dir: str):
    """Per-entity expanding features (cumsum/cummax/row_number) over
    the (user, ts, event_id) order; the summand is int64 mil so the
    window-SUM is bit-exact against the oracle."""
    from temporalscope_ray.stages.window_features import add_cumulative_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))

    def to_int(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        mil = np.floor(np.nan_to_num(v, nan=0.0) * 1000.0).astype(np.int64)
        return t.drop_columns(["value"]).append_column("value_mil", pa.array(mil))

    return add_cumulative_features(
        ev.map_batches(to_int, batch_format="pyarrow", zero_copy_batch=True),
        id_col="user_id", time_col="ts", value_cols=["value_mil"],
        ops=("cumsum", "cummax"), row_number="rn", tiebreak=["event_id"],
    )


def q_rolling_median4(sf_dir: str):
    """Trailing 4-row rolling MEDIAN per entity — the order-statistic
    window the mean/sum kernels can't fold; rides the same one-exchange
    bucket plan with pandas' Cython rolling-median kernel."""
    from temporalscope_ray.stages.window_features import add_rolling_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = add_rolling_features(
        ev, id_col="user_id", time_col="ts", value_cols=["value"], window=4,
        fns=("median",), tiebreak=["event_id"],
    )
    return _round_cols(out, ["value_roll_median_4"])


def q_value_ranks_by_user(sf_dir: str):
    """Per-entity RANK / DENSE_RANK / PERCENT_RANK by value — order-free
    within the entity, so only co-location is required (one exchange)."""
    from temporalscope_ray.stages.window_features import add_rank_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    out = add_rank_features(
        ev, id_col="user_id", value_col="value",
        methods=("rank", "dense_rank", "pct_rank"),
    )
    return _round_cols(out, ["value_pct_rank"])


def q_ewm_value_by_user(sf_dir: str):
    """Per-entity EWMA (alpha=0.3, adjust=False recursion) over the
    (ts, event_id) order — zero-leakage smoothing; the oracle is the
    closed-form weighted sum, so null values are filtered on BOTH
    sides (pandas would carry the previous EWM through them)."""
    from temporalscope_ray.stages.window_features import add_ewm_features

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value")).map_batches(
        lambda t: t.filter(pa.compute.is_valid(t.column("value"))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = add_ewm_features(
        ev, id_col="user_id", time_col="ts", value_cols=["value"],
        alpha=0.3, tiebreak=["event_id"],
    )

    # floor-quantize to int64 micro-units with a 12-digit offset:
    # the recursion and the oracle's closed-form sum agree to ~1e-14,
    # but early-chain EWM values are EXACT 1e-6 decimals (step i has
    # i+1 decimal digits), so a bare floor(x*1e6) sits on a knife
    # edge and ROUND's half-rule differs between numpy (half-even)
    # and DuckDB (half-away). The offset moves every representable
    # short decimal ~1e-12 micro away from a floor boundary — far
    # beyond the 1e-14 cross-side noise.
    def quant(t: pa.Table) -> pa.Table:
        e = t.column("value_ewm").to_numpy(zero_copy_only=False)
        micro = np.floor(e * 1e6 + 0.112233445566).astype(np.int64)
        return t.drop_columns(["value_ewm"]).append_column(
            "value_ewm_micro", pa.array(micro)
        )

    return out.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


def q_unpivot_lineitem(sf_dir: str):
    """Wide→long melt of three lineitem measures — stateless zero-copy
    Arrow gather per batch, zero shuffle."""
    from temporalscope_ray.stages.reshape import unpivot

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount"])
    return unpivot(
        li, id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount"],
        var_name="measure", value_name="val",
    )


def q_sample3_docs_per_lang(sf_dir: str):
    """Deterministic per-group cap (≤3 docs per language by md5-hash
    order) — the 'at most n per domain' corpus-rebalancing move; the
    k-cap combiner means a hot language moves ≤3 rows per block."""
    from temporalscope_ray.stages.sampling import sample_per_group

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return sample_per_group(docs, "lang", "doc_id", n=3, salt="s1", portable=True)


def q_json_extract_props(sf_dir: str):
    """Top-level scalar JSON field extraction from events.props via a
    single compiled vectorized regex (no per-row json.loads)."""
    from temporalscope_ray.stages.text import json_extract_scalar

    ev = _events(sf_dir, ("event_id", "props"))
    return json_extract_scalar(ev, "props", "k", out_col="k", out_type="int64")


def q_top_bigrams(sf_dir: str):
    """Corpus top-30 token bigrams — n-grams built from ONE exploded
    token array via shifted-array concat masked at document
    boundaries (no per-document loop), then the value_counts combiner
    and term-hash exchange."""
    from temporalscope_ray.stages.text import top_ngrams

    docs = _read(sf_dir, "documents", columns=["text"])
    return top_ngrams(docs, "text", n=2, k=30)


def q_value_ntile4_by_user(sf_dir: str):
    """SQL NTILE(4) per entity over the (value, event_id) total order
    — exact earlier-buckets-get-the-extra-row arithmetic, vectorized
    across all entities in the bucket at once."""
    from temporalscope_ray.stages.window_features import add_rank_features

    ev = _events(sf_dir, ("event_id", "user_id", "value"))
    return add_rank_features(
        ev, id_col="user_id", value_col="value", methods=(),
        ntile=4, tiebreak=["event_id"],
    )


def _custkey_sides(sf_dir: str):
    cust = _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["custkey"]), batch_format="pyarrow", zero_copy_batch=True
    )
    # a strict subset of ordering customers (orderkey & 3 == 0) so the
    # EXCEPT result is non-trivial
    ords = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.filter(
            pa.compute.equal(pa.compute.bit_wise_and(t.column("o_orderkey"), 3), 0)
        ).select(["o_custkey"]).rename_columns(["custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return cust, ords


def q_except_customers(sf_dir: str):
    """SQL EXCEPT (distinct, null-safe row equality): per-block
    distinct combiner → one row-digest hash exchange → per-bucket
    merge-indicator — digest bucketing cannot hot-spot."""
    from temporalscope_ray.stages.setops import except_distinct

    cust, ords = _custkey_sides(sf_dir)
    return except_distinct(cust, ords)


def q_intersect_customers(sf_dir: str):
    """SQL INTERSECT on the same plan as EXCEPT."""
    from temporalscope_ray.stages.setops import intersect_distinct

    cust, ords = _custkey_sides(sf_dir)
    return intersect_distinct(cust, ords)


def q_explode_embeddings(sf_dir: str):
    """UNNEST WITH ORDINALITY of the embedding list column — pure
    Arrow offsets arithmetic per batch (flatten + index-take), zero
    shuffle; 32k rows in, 32k×d rows out at sf0.001."""
    from temporalscope_ray.stages.reshape import explode_list

    emb = _read(sf_dir, "embeddings").select_columns(["vec_id", "embedding"])
    out = explode_list(emb, "embedding", idx_col="dim", value_name="component")

    def r(t: pa.Table) -> pa.Table:
        c = t.column("component").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.drop_columns(["component"]).append_column(
            "component", pa.array(np.round(c, 6))
        )

    return out.map_batches(r, batch_format="pyarrow", zero_copy_batch=True)


def q_value_quantiles_by_type(sf_dir: str):
    """Exact per-group p50/p90 (linear interpolation = SQL
    quantile_cont): quantiles are holistic, so the one exchange moves
    the projected (key, value) pairs, never full rows."""
    from temporalscope_ray.stages.agg import grouped_quantile

    ev = _events(sf_dir, ("event_type", "value"))
    out = grouped_quantile(ev, "event_type", "value", q=[0.5, 0.9])
    return _round_cols(out, ["value_p50", "value_p90"])


def q_dup_clusters_chain(sf_dir: str):
    """Duplicate-cluster labeling: connected components (distributed
    min-label propagation — one bucketed join + one combiner
    groupby-min per round, driver fixpoint on the strictly-decreasing
    label sum) over a deterministic pair graph linking doc_id to
    doc_id-1 when n_chars % 5 == 0, which yields real multi-hop
    chains; cluster_id = min doc id reachable. The oracle is DuckDB's
    recursive-CTE transitive closure."""
    from temporalscope_ray.stages.graph import connected_components

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def mk_pairs(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_chars").to_numpy(zero_copy_only=False)
        m = (n % 5 == 0) & (d > 0)
        return pa.table({"id_a": pa.array(d[m]), "id_b": pa.array(d[m] - 1)})

    pairs = docs.map_batches(mk_pairs, batch_format="pyarrow", zero_copy_batch=True)
    return connected_components(pairs)


def q_contaminated_docs(sf_dir: str):
    """Eval-set decontamination probe: even-id docs sharing any
    5-token shingle with the odd-id 'reference' half. Both corpora
    reduce to distinct shingle hashes per block; ONE hash exchange
    co-locates matches (text never moves); md5-portable hashing so
    the exact hash arithmetic replays in SQL."""
    from temporalscope_ray.stages.dedup import contaminated_ids

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def par(keep):
        def f(t: pa.Table) -> pa.Table:
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(d % 2 == keep))
        return f

    corpus = docs.map_batches(par(0), batch_format="pyarrow", zero_copy_batch=True)
    reference = docs.map_batches(par(1), batch_format="pyarrow", zero_copy_batch=True)
    return contaminated_ids(corpus, reference, portable=True, shingle_k=5)


def q_parse_datetime_strings(sf_dir: str):
    """M3 string→datetime cascade under oracle: events.ts is rendered
    to ISO strings (a format the Arrow fast path handles) and to
    '%m/%d/%Y %H:%M:%S' strings (a strptime-chain format), parsed back
    with convert_column_to_datetime_type, and both must reproduce the
    second-truncated timestamp DuckDB computes."""
    from temporalscope_ray.core import convert_column_to_datetime_type

    ev = _events(sf_dir, ("event_id", "ts"))

    def stringify(t: pa.Table) -> pa.Table:
        s = t.column("ts").to_pandas().dt.floor("s")
        iso = s.dt.strftime("%Y-%m-%dT%H:%M:%S")
        us = s.dt.strftime("%m/%d/%Y %H:%M:%S")
        return pa.table({
            "event_id": t.column("event_id"),
            "iso_str": pa.array(iso, type=pa.string()),
            "us_str": pa.array(us, type=pa.string()),
        })

    strs = ev.map_batches(stringify, batch_format="pyarrow", zero_copy_batch=True)
    parsed = convert_column_to_datetime_type(strs, "iso_str")
    parsed = convert_column_to_datetime_type(parsed, "us_str")
    return parsed.map_batches(
        lambda t: pa.table({
            "event_id": t.column("event_id"),
            "ts_iso": t.column("iso_str"),
            "ts_us": t.column("us_str"),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def q_robust_value_by_user(sf_dir: str):
    """Per-entity robust scaling (median/IQR): holistic quantile stats
    via one projected-pair exchange, then a broadcast apply — the fact
    table never shuffles."""
    from temporalscope_ray.stages.stats import robust_scale_per_group

    ev = _events(sf_dir, ("event_id", "user_id", "value"))
    out = robust_scale_per_group(ev, "user_id", "value")

    # offset-floor micro quantization (same rationale as the EWM
    # gate): (v-med)/IQR often lands on dyadic rationals, exactly at
    # ROUND's half boundary where numpy (half-even) and DuckDB
    # (half-away) disagree
    def quant(t: pa.Table) -> pa.Table:
        # explicit float64 coercion: a block whose groups are all
        # single-row emits an all-null robust column, which to_numpy
        # surfaces as object-dtype Nones (TypeError under arithmetic)
        r = t.column("value_robust").to_pandas().astype("float64").to_numpy()
        micro = np.floor(r * 1e6 + 0.112233445566)
        mask = np.isnan(micro)
        out_i = pa.array(np.where(mask, 0, micro).astype(np.int64), mask=mask)
        return t.drop_columns(["value_robust"]).append_column(
            "value_robust_micro", out_i
        )

    return out.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


def q_hopping_hourly_15min(sf_dir: str):
    """Overlapping sliding windows (1h length, 15min hop): bounded ×4
    replication of combiner partials, one exchange — the streaming
    HOP operator as a batch transform."""
    from temporalscope_ray.stages.agg import hopping_window_aggregate

    ev = _events(sf_dir, ("ts", "value"))
    out = hopping_window_aggregate(
        ev, "ts", window="1h", hop="15min",
        aggs={"n": (None, "count"), "sum_v": ("value", "sum")},
    )
    return _round_cols(out, ["sum_v"])


def q_sink_roundtrip_events(sf_dir: str):
    """S4 sink under oracle: events written through the resumable
    partitioned sink (one parquet partition + lineage record per
    entity bucket, atomic publish) and read back must reproduce the
    source table exactly."""
    import shutil

    from temporalscope_ray.state.lineage import run_partitioned

    out_dir = f"/tmp/tsray_gate_sink_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    run_partitioned(ev, key="user_id", out_dir=out_dir, num_buckets=8)
    # read only the bucket partitions ("_lineage/" holds JSON records);
    # drop the hive-partition column the reader derives from bucket=NNNN
    return ray.data.read_parquet(out_dir, file_extensions=["parquet"]).drop_columns(["bucket"])


def q_gopher_quality_docs(sf_dir: str):
    """Gopher-style word-repetition quality filter: per-document
    distinct/top-word/dup-word/top-bigram fractions (exact integer-ratio
    doubles, bit-matching the SQL oracle) plus the keep gate."""
    from temporalscope_ray.stages.text import add_repetition_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = add_repetition_stats(docs, concurrency=(1, 2))
    return out.select_columns(
        ["doc_id", "n_words", "distinct_word_frac", "top_word_frac",
         "dup_word_frac", "top_bigram_frac", "keep"]
    )


def q_calendar_features_events(sf_dir: str):
    """Calendar/cyclical encodings (ISO dow) — zero shuffle, one
    vectorized pass; numpy and SQL trig agree bit-for-bit on these grid
    inputs (probed), so no rounding is needed."""
    from temporalscope_ray.stages.window_features import add_calendar_features

    ev = _events(sf_dir, ("event_id", "ts"))
    out = add_calendar_features(ev, time_col="ts")
    return out.select_columns(
        ["event_id", "hour", "dow", "hour_sin", "hour_cos",
         "dow_sin", "dow_cos", "is_weekend"])


def q_volume_bars_by_user(sf_dir: str):
    """Activity-driven (volume) bars: bar boundaries from the per-entity
    exclusive prefix sum of |value| — busy periods get more bars
    (fixed-information resampling). Cumsum + per-bar OHLC close inside
    ONE entity-bucket exchange."""
    from temporalscope_ray.stages.agg import volume_bars

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return volume_bars(ev, "user_id", "ts", "value", threshold=250.0,
                       tiebreak=["event_id"], num_buckets=16)


def q_feature_hash_type_by_user(sf_dir: str):
    """Hashing-trick categorical encoding (md5-lower-64 mod 8, DuckDB-
    portable): per-block combiner partials, facts never move."""
    from temporalscope_ray.stages.agg import feature_hash_counts

    ev = _events(sf_dir, ("user_id", "event_type"))
    return feature_hash_counts(ev, "user_id", "event_type", num_hash_buckets=8)


def q_mase_by_user(sf_dir: str):
    """Per-entity forecastability triage: MASE ratio of seasonal-naive
    to last-value-naive MAE (row lags 24 and 1). One bucket exchange,
    shared segment-shift kernel."""
    from temporalscope_ray.stages.stats import mase_by_entity

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return mase_by_entity(ev, "user_id", "ts", "value", period=24,
                          tiebreak=["event_id"], num_buckets=16)


def q_cusum_changepoint_by_user(sf_dir: str):
    """Drift LOCALIZATION per entity: the CUSUM |S_k| argmax row (where
    the mean shifted), ties to the earliest (ts, event_id). One bucket
    exchange, vectorized cumsum per segment."""
    from temporalscope_ray.stages.stats import cusum_changepoint_by_entity

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return cusum_changepoint_by_entity(ev, "user_id", "ts", "value",
                                       tiebreak=["event_id"], num_buckets=16)


def q_residual_q90_by_user(sf_dir: str):
    """Conformal-style prediction-band width per entity: q90 of
    |value − trailing-mean₄| residuals (quantile_cont interpolation)."""
    from temporalscope_ray.stages.stats import residual_quantile_by_entity

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return residual_quantile_by_entity(ev, "user_id", "ts", "value", window=4,
                                       q=0.9, tiebreak=["event_id"], num_buckets=16)


def q_grid_ffill_1h_by_user(sf_dir: str):
    """Upsample each user to a regular epoch-aligned 1h grid with
    last-observation-carried-forward (duplicate timestamps resolve to
    the max event_id — deterministic). arange + one searchsorted per
    entity inside ONE bucket exchange; loud bound on grid blow-up."""
    from temporalscope_ray.stages.window_features import regularize_grid

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return regularize_grid(ev, id_col="user_id", time_col="ts", value_col="value",
                           step=pd.Timedelta("1h"), tiebreak=["event_id"], num_buckets=16)


def q_max_drawdown_by_user(sf_dir: str):
    """Per-user maximum drawdown of the cumulative value series
    (cents-exact: cumsum, running max and every drawdown are int64;
    the only float op is the final /100) — the risk / regression
    severity feature beside the CUSUM detector."""
    from temporalscope_ray.stages.stats import max_drawdown_by_entity

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return max_drawdown_by_entity(ev, "user_id", "ts", "value",
                                  tiebreak=["event_id"], num_buckets=16)


def q_xcorr_click_purchase(sf_dir: str):
    """Lead/lag cross-correlation of hourly click vs purchase counts
    (lags -3..3 over the dense shared hour grid) — does click volume
    lead purchase volume? Facts reduce once to (hour, type) partials;
    correlations close on that aggregate."""
    from temporalscope_ray.stages.stats import hourly_xcorr_pair

    ev = _events(sf_dir, ("ts", "event_type"))
    return hourly_xcorr_pair(ev, "ts", "event_type", "click", "purchase",
                             max_lag=3)


def q_pagerank_event_types(sf_dir: str):
    """PageRank over the event-type transition graph (10 fixed power
    iterations, damping 0.85, dangling mass teleported uniformly) —
    stationary behavioral importance of each state; facts reduce once
    through the transition exchange, iteration runs on the
    vocabulary-sized graph."""
    from temporalscope_ray.stages.graph import pagerank_types

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    out = pagerank_types(ev, id_col="user_id", time_col="ts",
                         type_col="event_type", tiebreak=["event_id"],
                         damping=0.85, iters=10)
    return out.rename(columns={"node": "event_type"})


def q_postings_docs(sf_dir: str):
    """Inverted-index postings (terms with df>=10, first 20 ascending
    doc ids each, pre-flattened to (term, df, pos, doc_id)) — the
    retrieval-index build step as one term-bucketed exchange of
    (term, id) pairs; text never shuffles."""
    from temporalscope_ray.stages.text import inverted_postings

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return inverted_postings(docs, text_col="text", id_col="doc_id",
                             min_df=10, cap=20, num_buckets=16)


def q_value_concentration_deciles(sf_dir: str):
    """Lorenz whale curve: user deciles by total value with per-decile
    and cumulative value shares — cents-exact int sums through one
    combiner exchange, NTILE-mirrored split, 10-row driver closure."""
    from temporalscope_ray.stages.agg import concentration_deciles

    ev = _events(sf_dir, ("user_id", "value"))
    return concentration_deciles(ev, "user_id", "value")


def q_km_survival_purchase(sf_dir: str):
    """Kaplan-Meier time-to-first-purchase curve (days, censored at the
    last observed event): ONE combiner exchange of per-entity
    min/max/conditional-min, KM product closes on the driver; the SQL
    replay multiplies in the same ascending order via product() OVER."""
    from temporalscope_ray.stages.stats import kaplan_meier_survival

    ev = _events(sf_dir, ("ts", "user_id", "event_type"))
    return kaplan_meier_survival(ev, "user_id", "ts", "event_type",
                                 "purchase")


def q_trend_break_by_user(sf_dir: str):
    """Segmented regression at the CUSUM breakpoint per user: the exact
    int64 argmax locates the shift, a Cramer 2x2 over int moment sums
    fits each side's slope — bit-exact vs the SQL replay."""
    from temporalscope_ray.stages.stats import trend_break_by_entity

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return trend_break_by_entity(ev, "user_id", "ts", "value",
                                 tiebreak=["event_id"], min_rows=8,
                                 num_buckets=16)


def q_benford_value_by_type(sf_dir: str):
    """Benford first-digit audit per event type (chi2 + MAD vs
    log10(1+1/d)) — digit extraction is exact (integer-string head of
    the cents-quantized value, never floor(log10)); one (group, digit)
    combiner exchange, the 9-term closure runs on the driver."""
    from temporalscope_ray.stages.stats import benford_deviation_by_group

    ev = _events(sf_dir, ("event_type", "value"))
    out = benford_deviation_by_group(ev, "event_type", "value")
    return out.rename(columns={"g": "event_type"})


def q_holt_by_user(sf_dir: str):
    """Holt double-exponential smoothing (level + trend per row,
    alpha=0.3 beta=0.1) — a true per-entity recursion, bit-exact vs a
    recursive-CTE replay; one entity-bucket exchange, the scan
    vectorizes across entities (one numpy step per time index)."""
    from temporalscope_ray.stages.stats import holt_smooth_by_entity

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "value"))
    return holt_smooth_by_entity(ev, "user_id", "ts", "value",
                                 alpha=0.3, beta=0.1, tiebreak=["event_id"],
                                 keep_cols=["event_id"], num_buckets=16)


def q_spectral_daily_weekly(sf_dir: str):
    """Relative DFT amplitude of hourly event counts at the daily and
    weekly frequencies, per event type — frequency-domain seasonality;
    facts reduce once to (hour, type) partials, the projection sums
    close on the aggregate."""
    from temporalscope_ray.stages.stats import spectral_amplitude_by_group

    ev = _events(sf_dir, ("ts", "event_type"))
    out = spectral_amplitude_by_group(ev, "ts", "event_type",
                                      periods_hours=(24, 168))
    return out.rename(columns={"g": "event_type"})


def q_edit_dup_pairs_docs(sf_dir: str):
    """Character-level near-dup pairs: exact Levenshtein <= 16 under
    deterministic 12-char prefix blocking (ASCII-normalized so the
    engine's codepoint DP == DuckDB's byte levenshtein); one block-key
    exchange, in-block pairs are the small side."""
    from temporalscope_ray.stages.dedup import edit_distance_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return edit_distance_pairs(docs, text_col="text", id_col="doc_id",
                               max_dist=16, prefix_len=12, max_len=1000,
                               max_block=256, num_buckets=16)


def q_pca_loadings_embeddings(sf_dir: str):
    """Top principal-component loadings by power iteration with
    per-step quantization — exact SQL replay of distributed PCA: the
    combiner covariance is rounded once, then 10 pinned steps."""
    from temporalscope_ray.stages.linalg import pca_power_loadings

    emb = _read(sf_dir, "embeddings", columns=["embedding"])
    return pca_power_loadings(emb, "embedding", iters=10)


def q_attribution_markov_events(sf_dir: str):
    """Markov removal-effect attribution per channel (first-conversion
    journeys to 'purchase', 12 fixed power steps): one entity-bucket
    exchange builds truncated-path transitions, the per-variant
    absorption closes on the vocabulary-sized chain."""
    from temporalscope_ray.stages.graph import removal_effect_attribution

    ev = _events(sf_dir, ("event_id", "ts", "user_id", "event_type"))
    return removal_effect_attribution(
        ev, id_col="user_id", time_col="ts", type_col="event_type",
        conv_type="purchase", tiebreak=["event_id"], iters=12)


def q_ols_calendar_by_type(sf_dir: str):
    """Per-type OLS of value on (hour-of-day, ISO dow) with intercept —
    the distributed Gram reduce: int64 normal-equation partials per
    block, ONE partials exchange, closed-form Cramer solve with a
    pinned float-op order (bit-identical to the SQL expansion)."""
    from temporalscope_ray.stages.stats import ols_calendar_by_group

    ev = _events(sf_dir, ("ts", "event_type", "value"))
    return ols_calendar_by_group(ev, "event_type", "ts", "value")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return q_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "shift_lead1_by_user": q_shift_lead1,
        "lag_lead_features": q_lag_lead_features,
        "rolling_mean_4": q_rolling_mean4,
        "time_rolling_30min": q_time_rolling_30min,
        "sessionize_30min": q_sessionize,
        "session_stats_30min": q_session_stats,
        "asof_latest_order": q_asof_latest_order,
        "asof_latest_order_tol": q_asof_latest_order_tol,
        "asof_next_order": q_asof_next_order,
        "asof_nearest_order": q_asof_nearest_order,
        "asof_bucketed": q_asof_bucketed,
        "multi_asof_features": q_multi_asof_features,
        "multi_asof_bucketed": q_multi_asof_bucketed,
        "global_shift_lead1": q_global_shift,
        "global_shift_lead1_dist": q_global_shift_dist,
        "max_drawdown_by_user": q_max_drawdown_by_user,
        "xcorr_click_purchase": q_xcorr_click_purchase,
        "pagerank_event_types": q_pagerank_event_types,
        "ols_calendar_by_type": q_ols_calendar_by_type,
        "attribution_markov_events": q_attribution_markov_events,
        "pca_loadings_embeddings": q_pca_loadings_embeddings,
        "edit_dup_pairs_docs": q_edit_dup_pairs_docs,
        "spectral_daily_weekly": q_spectral_daily_weekly,
        "holt_by_user": q_holt_by_user,
        "benford_value_by_type": q_benford_value_by_type,
        "trend_break_by_user": q_trend_break_by_user,
        "km_survival_purchase": q_km_survival_purchase,
        "value_concentration_deciles": q_value_concentration_deciles,
        "postings_docs": q_postings_docs,
        "shift_multi_target": q_shift_multi_target,
        "incremental_features_refresh": q_incremental_features,
        "null_counts_events": q_null_counts,
        "dup_ts_pairs": q_dup_ts_pairs,
        "equidistant_by_user": q_equidistant_by_user,
        "time_to_numeric": q_time_to_numeric,
        "window_tags": q_window_tags,
        "mean_pad_value": q_mean_pad_value,
        "dedup_exact_docs": q_dedup_exact_docs,
        "text_stats_docs": q_text_stats,
        "token_sum_by_lang": q_token_sum_by_lang,
        "knn_brute_10": q_knn_brute,
        "embedding_norms": q_embedding_norms,
        "lineitem_agg": q_lineitem_agg,
        "backfill_ffill": q_backfill,
        "expand_targets_h3": q_expand_targets,
        "minhash_kept_docs": q_minhash_kept_docs,
        "phash_dedup_events": q_phash_dedup_events,
        "pii_redact_docs": q_pii_redact_docs,
        "ngram_lm_docs": q_ngram_lm_docs,
        "curation_pipeline": q_curation_pipeline,
        "line_dedup_docs": q_line_dedup_docs,
        "image_pipeline": q_image_pipeline,
        "audio_pipeline": q_audio_pipeline,
        "video_pipeline": q_video_pipeline,
        "flagship_pipeline": q_flagship,
        "rolling_minmax_4": q_rolling_minmax,
        "streaming_features": q_streaming_features,
        "masv_lineitem": q_masv_lineitem,
        "simhash_kept_docs": q_simhash_kept_docs,
        "jaccard_kept_docs": q_jaccard_kept_docs,
        "embedding_kept_vecs": q_embedding_kept_vecs,
        "knn_lsh_10": q_knn_lsh,
        "validator_report": q_validator_report,
        "range_join_clicks_30min": q_range_join_clicks,
        "knn_ivf_10": q_knn_ivf,
        "knn_ivf_reuse_10": q_knn_ivf_reuse,
        "knn_ivf_saved_10": q_knn_ivf_saved,
        "hash_split_docs": q_hash_split_docs,
        "stratified_sample_docs": q_stratified_sample_docs,
        "shuffle_docs": q_shuffle_docs,
        "sample_k_docs": q_sample_k_docs,
        "temperature_resample_docs": q_temperature_resample_docs,
        "interarrival_by_user": q_interarrival_by_user,
        "time_to_next_by_user": q_time_to_next_by_user,
        "expanding_stats_by_user": q_expanding_stats_by_user,
        "session_conversion_30min": q_session_conversion_30min,
        "cohort_retention_weekly": q_cohort_retention_weekly,
        "rolling_slope_by_user": q_rolling_slope_by_user,
        "event_transitions": q_event_transitions,
        "value_drift_psi": q_value_drift_psi,
        "label_centroids": q_label_centroids,
        "anomaly_flags_by_user": q_anomaly_flags_by_user,
        "jaccard_clusters_docs": q_jaccard_clusters_docs,
        "mode_event_type_by_user": q_mode_event_type_by_user,
        "moments_by_type": q_moments_by_type,
        "revenue_by_nation": q_revenue_by_nation,
        "winsorize_by_type": q_winsorize_by_type,
        "feature_corr_lineitem": q_feature_corr_lineitem,
        "mi_type_value": q_mi_type_value,
        "ks_drift_value": q_ks_drift_value,
        "phash_stream_prev": q_phash_stream_prev,
        "entropy_by_user": q_entropy_by_user,
        "top_orders_building": q_top_orders_building,
        "promo_revenue_share": q_promo_revenue_share,
        "rolling_type_diversity": q_rolling_type_diversity,
        "table_diff_customer": q_table_diff_customer,
        "decayed_sum_by_user": q_decayed_sum_by_user,
        "impute_median_by_type": q_impute_median_by_type,
        "cume_dist_value": q_cume_dist_value,
        "trend_by_user": q_trend_by_user,
        "value_quantiles_sketch": q_value_quantiles_sketch,
        "will_purchase_7d": q_will_purchase_7d,
        "wau_daily": q_wau_daily,
        "new_vs_returning_daily": q_new_vs_returning_daily,
        "funnel_vcp_30min": q_funnel_vcp_30min,
        "dedup_keep_longest": q_dedup_keep_longest,
        "auc_value_purchase": q_auc_value_purchase,
        "quantile_sketch_by_type": q_quantile_sketch_by_type,
        "autocorr1_by_user": q_autocorr1_by_user,
        "compact_stream_events": q_compact_stream_events,
        "contamination_rate_docs": q_contamination_rate_docs,
        "length_weighted_sample_docs": q_length_weighted_sample_docs,
        "contrastive_triplets_docs": q_contrastive_triplets_docs,
        "history_seq_by_user": q_history_seq_by_user,
        "cusum_value_by_user": q_cusum_value_by_user,
        "embedding_int8": q_embedding_int8,
        "caption_gate_images": q_caption_gate_images,
        "cluster_cap_docs": q_cluster_cap_docs,
        "next_purchase_prop_events": q_next_purchase_prop_events,
        "surprisal_events": q_surprisal_events,
        "kmeans_step_embeddings": q_kmeans_step_embeddings,
        "source_overlap_docs": q_source_overlap_docs,
        "label_coherence_vecs": q_label_coherence_vecs,
        "heavy_hitters_docs": q_heavy_hitters_docs,
        "split_leakage_images": q_split_leakage_images,
        "rfm_features_events": q_rfm_features_events,
        "time_split_events": q_time_split_events,
        "throttle_6h_events": q_throttle_6h_events,
        "twa_value_by_user": q_twa_value_by_user,
        "aspect_batches_images": q_aspect_batches_images,
        "pmi_pairs_docs": q_pmi_pairs_docs,
        "time_since_purchase_events": q_time_since_purchase_events,
        "source_token_share_docs": q_source_token_share_docs,
        "psi_daily_value": q_psi_daily_value,
        "seasonal_deviation_events": q_seasonal_deviation_events,
        "group_kfold_events": q_group_kfold_events,
        "latest_snapshot_events": q_latest_snapshot_events,
        "last_touch_events": q_last_touch_events,
        "langid_docs": q_langid_docs,
        "caption_spam_images": q_caption_spam_images,
        "fingerprint_docs": q_fingerprint_docs,
        "mad_value": q_mad_value,
        "crowding_10min_events": q_crowding_10min_events,
        "trimmed_mean_by_type": q_trimmed_mean_by_type,
        "rollup_lineitem": q_rollup_lineitem,
        "wau_sketch_daily": q_wau_sketch_daily,
        "theil_sen_by_user": q_theil_sen_by_user,
        "purchase_cadence_by_user": q_purchase_cadence_by_user,
        "burstiness_by_user": q_burstiness_by_user,
        "volume_anomalies_daily": q_volume_anomalies_daily,
        "behavior_features_pipeline": q_behavior_features_pipeline,
        "readability_docs": q_readability_docs,
        "log_return_by_user": q_log_return_by_user,
        "type_share_by_user": q_type_share_by_user,
        "acf_hourly_events": q_acf_hourly_events,
        "chi2_source_lang": q_chi2_source_lang,
        "top_type_trigrams": q_top_type_trigrams,
        "max_streak_by_user": q_max_streak_by_user,
        "entropy_rate_events": q_entropy_rate_events,
        "dn_retention_events": q_dn_retention_events,
        "daily_value_bands": q_daily_value_bands,
        "activation_lag_events": q_activation_lag_events,
        "seasonality_strength_value": q_seasonality_strength_value,
        "gini_user_activity": q_gini_user_activity,
        "dedup_rate_by_source": q_dedup_rate_by_source,
        "peak_error_burst": q_peak_error_burst,
        "hourly_rank_users": q_hourly_rank_users,
        "spearman_qty_price": q_spearman_qty_price,
        "curriculum_shards_docs": q_curriculum_shards_docs,
        "trending_daily_types": q_trending_daily_types,
        "image_curation_pipeline": q_image_curation_pipeline,
        "target_encode_asof_events": q_target_encode_asof_events,
        "session_coactivity_30min": q_session_coactivity_30min,
        "top_journeys_30min": q_top_journeys_30min,
        "late_events_5min": q_late_events_5min,
        "doc_keywords": q_doc_keywords,
        "target_encode_events": q_target_encode_events,
        "freq_encode_events": q_freq_encode_events,
        "value_bins_events": q_value_bins_events,
        "cross_type_user_events": q_cross_type_user_events,
        "rolling_autocorr_by_user": q_rolling_autocorr_by_user,
        "session_features_30min": q_session_features_30min,
        "calendar_features_events": q_calendar_features_events,
        "training_mix_docs": q_training_mix_docs,
        "minmax_by_user": q_minmax_by_user,
        "source_filter_docs": q_source_filter_docs,
        "chunk_docs": q_chunk_docs,
        "resample_1h_by_user": q_resample_1h_by_user,
        "approx_distinct_users": q_approx_distinct_users,
        "phash_clusters_events": q_phash_clusters_events,
        "normalize_text_docs": q_normalize_text_docs,
        "zscore_by_user": q_zscore_by_user,
        "value_quantiles": q_value_quantiles,
        "top_terms_50": q_top_terms,
        "interp_value": q_interp_value,
        "top3_events_by_user": q_top3_events_by_user,
        "tfidf_docs": q_tfidf_docs,
        "embedding_cov": q_embedding_cov,
        "running_sum_value": q_running_sum_value,
        "row_index_events": q_row_index_events,
        "pack_chunks_docs": q_pack_chunks_docs,
        "join_orders_customer": q_join_orders_customer,
        "left_join_orders_customer": q_left_join_orders_customer,
        "full_join_orders_customer": q_full_join_orders_customer,
        "hourly_event_stats": q_hourly_event_stats,
        "ohlc_hourly_by_user": q_ohlc_hourly_by_user,
        "calendar_features_events": q_calendar_features_events,
        "volume_bars_by_user": q_volume_bars_by_user,
        "feature_hash_type_by_user": q_feature_hash_type_by_user,
        "mase_by_user": q_mase_by_user,
        "cusum_changepoint_by_user": q_cusum_changepoint_by_user,
        "residual_q90_by_user": q_residual_q90_by_user,
        "grid_ffill_1h_by_user": q_grid_ffill_1h_by_user,
        "distinct_users_by_type": q_distinct_users_by_type,
        "event_type_pivot": q_event_type_pivot,
        "value_histogram_events": q_value_histogram_events,
        "cumulative_events_by_user": q_cumulative_events_by_user,
        "rolling_median_4": q_rolling_median4,
        "value_ranks_by_user": q_value_ranks_by_user,
        "ewm_value_by_user": q_ewm_value_by_user,
        "unpivot_lineitem": q_unpivot_lineitem,
        "sample3_docs_per_lang": q_sample3_docs_per_lang,
        "json_extract_props": q_json_extract_props,
        "top_bigrams_30": q_top_bigrams,
        "value_ntile4_by_user": q_value_ntile4_by_user,
        "except_customers": q_except_customers,
        "intersect_customers": q_intersect_customers,
        "explode_embeddings": q_explode_embeddings,
        "value_quantiles_by_type": q_value_quantiles_by_type,
        "dup_clusters_chain": q_dup_clusters_chain,
        "contaminated_docs": q_contaminated_docs,
        "parse_datetime_strings": q_parse_datetime_strings,
        "robust_value_by_user": q_robust_value_by_user,
        "hopping_hourly_15min": q_hopping_hourly_15min,
        "sink_roundtrip_events": q_sink_roundtrip_events,
        "gopher_quality_docs": q_gopher_quality_docs,
        "bm25_docs": q_bm25_docs,
    }


def _lsh_oracle_sql() -> str:
    """knn_lsh oracle: the hyperplane projection is data-INdependent
    (fixed seed 13, dim 64, nbits 5), so the exact plane vectors are
    embedded as SQL literals and DuckDB recomputes every vector's LSH
    bucket, the query's multiprobe set (own bucket + Hamming-1), and
    the exact cosine top-k over the candidate union — an end-to-end
    replication of the ANN path, not just a rows-only check. repr()
    floats round-trip exactly to the same doubles DuckDB parses."""
    nbits, dim, seed = 5, 64, 13
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, nbits))

    def lit(vec) -> str:
        return "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"

    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(e, {lit(planes[:, b])}) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(nbits)
    )
    masks = [0] + [1 << b for b in range(nbits)]
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          WHERE list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) > 0),
        vb AS (SELECT vec_id, e, {bucket_expr} AS bucket FROM v),
        q AS (SELECT e AS qe, bucket AS qb FROM vb WHERE vec_id = 0),
        probes AS (
          SELECT DISTINCT xor(q.qb::BIGINT, m.mask::BIGINT) AS pb, q.qe
          FROM q CROSS JOIN (SELECT unnest({masks}) AS mask) m),
        cand AS (SELECT vb.vec_id, vb.e, p.qe FROM vb JOIN probes p ON vb.bucket = p.pb)
        SELECT 0 AS query_idx, vec_id,
               ROUND(list_cosine_similarity(e, qe), 6) AS cos_sim
        FROM cand
        QUALIFY ROW_NUMBER() OVER (ORDER BY list_cosine_similarity(e, qe) DESC, vec_id) <= 10
    """


_P61 = (1 << 61) - 1
_W64 = 1 << 64

# shared SQL fragments for the text-dedup oracles: k=5 token shingles,
# tokenization identical to the engine (`\w+` on lowered text — RE2 and
# Python agree on ASCII; the testdata corpus is pure ASCII)
_SQL_TOKS = "SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents"
_SQL_SHINGLE_IDX = (
    "CROSS JOIN LATERAL (SELECT unnest(generate_series(1, "
    "CASE WHEN len(t) = 0 THEN 0 WHEN len(t) < 5 THEN 1 ELSE len(t) - 4 END)) AS i) g"
)


def _minhash_oracle_sql(src: str = "documents") -> str:
    """minhash_kept_docs oracle: full algorithm replication in SQL.
    The permutation parameters are data-independent (seed 7), embedded
    as HUGEINT literals; shingle hashes are md5_number_lower of the
    space-joined token window (the engine's portable mode); the
    (a*x)%2^64%p wrap mirrors numpy's uint64 overflow exactly (probed);
    bands compare as ordered 4-value lists (the engine compares band
    hashes — equality is identical up to ~2^-61 collisions).
    ``src`` lets a composed oracle (curation pipeline) feed a CTE
    instead of the raw documents view."""
    return f"""
        WITH {_minhash_ctes(src)}
        SELECT doc_id FROM {src} WHERE doc_id NOT IN (SELECT id_b FROM dropped)
    """


def _minhash_ctes(src: str) -> str:
    """The MinHash replication as a bare CTE list (``toks`` …
    ``dropped``) reading from ``src`` — embeddable in a larger WITH."""
    rng = np.random.default_rng(7)
    a = rng.integers(1, _P61, size=64, dtype=np.uint64)
    b = rng.integers(0, _P61, size=64, dtype=np.uint64)
    perm_rows = ", ".join(f"({j}, {int(a[j])}::HUGEINT, {int(b[j])}::HUGEINT)" for j in range(64))
    return f"""toks AS ({_SQL_TOKS.replace("FROM documents", "FROM " + src)}),
        sh AS (
          SELECT doc_id, md5_number_lower(array_to_string(t[i : i + 4], ' ')) AS h
          FROM toks {_SQL_SHINGLE_IDX}),
        dsh AS (SELECT DISTINCT doc_id, h FROM sh),
        perms AS (SELECT * FROM (VALUES {perm_rows}) p(j, a, b)),
        sigs AS (
          SELECT doc_id, p.j,
                 MIN((((p.a * (h::HUGEINT % {_P61})) % {_W64}) % {_P61} + p.b) % {_P61}) AS sig
          FROM dsh CROSS JOIN perms p GROUP BY doc_id, p.j),
        bands AS (
          SELECT doc_id, j // 4 AS band_id, list(sig ORDER BY j) AS bsig
          FROM sigs GROUP BY doc_id, j // 4),
        dropped AS (
          SELECT DISTINCT b2.doc_id AS id_b
          FROM bands a2 JOIN bands b2
            ON a2.band_id = b2.band_id AND a2.bsig = b2.bsig AND a2.doc_id < b2.doc_id)"""


def _curation_oracle_sql() -> str:
    """Composed oracle for the curation flagship: PII-redact →
    Gopher-repetition keep gate → MinHash near-dup dedup, each stage
    the EXACT SQL already proven green standalone, chained through
    CTEs. The final kept set carries the redacted text."""
    pii = """
        red AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(coalesce(text, ''),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS text
          FROM documents),
    """
    gopher = """
        gt AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '\\w+')) AS w,
                 generate_subscripts(regexp_extract_all(lower(text), '\\w+'), 1) AS pos
          FROM red),
        gwc AS (SELECT doc_id, w, COUNT(*) AS c FROM gt GROUP BY doc_id, w),
        gagg AS (
          SELECT doc_id, SUM(c) AS n_words, MAX(c) AS top_c,
                 SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ
          FROM gwc GROUP BY doc_id),
        gbg AS (
          SELECT doc_id, w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS g
          FROM gt),
        gbgc AS (SELECT doc_id, g, COUNT(*) AS c FROM gbg WHERE g IS NOT NULL GROUP BY doc_id, g),
        gbga AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bc FROM gbgc GROUP BY doc_id),
        kept_gate AS (
          SELECT r.doc_id, r.text
          FROM red r LEFT JOIN gagg a USING (doc_id) LEFT JOIN gbga b USING (doc_id)
          WHERE COALESCE(
            CAST(a.top_c AS DOUBLE) / a.n_words <= 0.10
            AND CAST(a.dup_occ AS DOUBLE) / a.n_words <= 0.85
            AND NOT (CAST(b.top_bc AS DOUBLE) / b.n_bigrams > 0.20), FALSE)),
    """
    return f"""
        WITH {pii} {gopher} {_minhash_ctes("kept_gate")}
        SELECT k.doc_id, k.text
        FROM kept_gate k
        WHERE k.doc_id NOT IN (SELECT id_b FROM dropped)
    """


def oracle_sql() -> dict[str, str]:
    order_state = (
        "SELECT o_custkey AS user_id, o_orderdate AS ots, MAX(o_totalprice) AS o_totalprice "
        "FROM orders GROUP BY 1, 2"
    )
    from temporalscope_ray.stages.sampling import split_thresholds

    _split_bounds = split_thresholds(SPLIT_FRACTIONS)
    # the last bin is the CASE/ELSE remainder; the inner bounds are
    # shared integer literals with the engine
    _U64 = float(2**64)

    def _rate_thr(stratum) -> int:
        r = SAMPLE_RATES.get(stratum, SAMPLE_DEFAULT_RATE) if stratum else SAMPLE_DEFAULT_RATE
        return min(2**64 - 1, int(r * _U64))

    from temporalscope_ray.stages.text import _STOPWORDS as _SW

    def _sw(lang: str) -> str:
        return ", ".join(f"'{w}'" for w in sorted(_SW[lang]))

    # PageRank unrolled as chained CTEs (DuckDB forbids aggregates in a
    # recursive term): p0 = uniform, each p{i} applies ONE power step
    # with the SAME float-op order as the engine — r*(cnt/tot), then
    # s + dang/N, then (1-d)/N + d*(...). 0.85 is CAST to DOUBLE so SQL
    # does IEEE arithmetic, never decimal (DuckDB parses bare 0.85 as
    # DECIMAL and 1-0.85 would round differently from Python's 1-0.85).
    _pr_iters, _pr_steps = 10, []
    for _i in range(1, 11):
        _pr_steps.append(f"""
            p{_i} AS MATERIALIZED (
              SELECT n.node,
                     (1.0 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                     + CAST(0.85 AS DOUBLE) * (COALESCE(s.s, 0)
                       + (SELECT COALESCE(SUM(p.r), 0) FROM p{_i-1} p
                          LEFT JOIN outdeg o ON o.node = p.node
                          WHERE o.node IS NULL) / (SELECT n FROM nn)) AS r
              FROM nodes n
              LEFT JOIN (SELECT e.cur AS node, SUM(p.r * (e.cnt / o.tot)) AS s
                         FROM e JOIN p{_i-1} p ON p.node = e.prev
                              JOIN outdeg o ON o.node = e.prev
                         GROUP BY 1) s ON s.node = n.node
            )""")
    _pagerank_sql = f"""
        WITH e AS (
          SELECT prev, cur, CAST(COUNT(*) AS DOUBLE) AS cnt FROM (
            SELECT user_id, event_type AS cur,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events)
          WHERE prev IS NOT NULL AND cur IS NOT NULL GROUP BY 1, 2),
        outdeg AS (SELECT prev AS node, SUM(cnt) AS tot FROM e GROUP BY 1),
        nodes AS (SELECT DISTINCT event_type AS node FROM events
                  WHERE event_type IS NOT NULL),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        p0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
        {','.join(_pr_steps)}
        SELECT node AS event_type, ROUND(r, 6) AS pagerank FROM p{_pr_iters}
    """
    # OLS Gram oracle: the SQL mirrors stats.ols_calendar_by_group's
    # first-row cofactor expansion LITERALLY (same helper shape) — the
    # int64 moment sums are exact on both sides, so identical doubles
    # enter identical IEEE expressions and the betas match bit-for-bit.
    def _det3(a, b, c, d, e, f, g, h, i):
        return (f"({a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g})"
                f" + {c}*({d}*{h} - {e}*{g}))")

    _ols_det = _det3("n", "sh", "sd", "sh", "shh", "shd", "sd", "shd", "sdd")
    _ols_d0 = _det3("sy", "sh", "sd", "shy", "shh", "shd", "sdy", "shd", "sdd")
    _ols_d1 = _det3("n", "sy", "sd", "sh", "shy", "shd", "sd", "sdy", "sdd")
    _ols_d2 = _det3("n", "sh", "sy", "sh", "shh", "shy", "sd", "shd", "sdy")
    _ols_sql = f"""
        WITH f AS (
          SELECT event_type AS g,
                 CAST(hour(ts) AS BIGINT) AS h,
                 CAST(isodow(ts) AS BIGINT) AS d,
                 CAST(ROUND(value * 100, 0) AS BIGINT) AS u
          FROM events
          WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        s AS (
          SELECT g,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(CAST(SUM(h) AS BIGINT) AS DOUBLE) AS sh,
                 CAST(CAST(SUM(d) AS BIGINT) AS DOUBLE) AS sd,
                 CAST(CAST(SUM(h*h) AS BIGINT) AS DOUBLE) AS shh,
                 CAST(CAST(SUM(h*d) AS BIGINT) AS DOUBLE) AS shd,
                 CAST(CAST(SUM(d*d) AS BIGINT) AS DOUBLE) AS sdd,
                 CAST(CAST(SUM(u) AS BIGINT) AS DOUBLE) AS sy,
                 CAST(CAST(SUM(h*u) AS BIGINT) AS DOUBLE) AS shy,
                 CAST(CAST(SUM(d*u) AS BIGINT) AS DOUBLE) AS sdy
          FROM f GROUP BY 1),
        k AS (
          SELECT g, CAST(n AS BIGINT) AS n, {_ols_det} AS det,
                 {_ols_d0} AS d0, {_ols_d1} AS d1, {_ols_d2} AS d2
          FROM s)
        SELECT g AS event_type, n,
               CASE WHEN det <> 0 THEN d0 / det / 100.0 END AS b0,
               CASE WHEN det <> 0 THEN d1 / det / 100.0 END AS b_hour,
               CASE WHEN det <> 0 THEN d2 / det / 100.0 END AS b_dow
        FROM k
    """
    # Markov removal-effect attribution, unrolled like the PageRank
    # oracle but VARIANT-PARAMETRIC: every per-channel surgery (edges
    # into c → __NULL__, edges out of c dropped) is one row-set keyed
    # by variant v, so a single chain of 12 mass-step CTEs iterates ALL
    # variants at once — channels come from the data, never hardcoded.
    # Float-op order mirrors graph.removal_effect_attribution:
    # r*(n/tot) per edge, absorbing states keep prior mass + inflow,
    # ROUND half-away only at the final effect.
    _ma_steps = []
    for _i in range(1, 13):
        _ma_steps.append(f"""
            m{_i} AS MATERIALIZED (
              SELECT s.v, s.st,
                     CASE WHEN s.st IN ('__CONV__', '__NULL__')
                          THEN COALESCE(p.r, 0) + COALESCE(i.s, 0)
                          ELSE COALESCE(i.s, 0) END AS r
              FROM vstates s
              LEFT JOIN m{_i-1} p ON p.v = s.v AND p.st = s.st
              LEFT JOIN (SELECT e.v, e.cur AS st, SUM(p.r * (e.n / o.tot)) AS s
                         FROM vedges e
                         JOIN m{_i-1} p ON p.v = e.v AND p.st = e.prev
                         JOIN outdeg o ON o.v = e.v AND o.node = e.prev
                         GROUP BY 1, 2) i ON i.v = s.v AND i.st = s.st
            )""")
    _markov_sql = f"""
        WITH pre AS (
          SELECT user_id, event_type, ts, event_id FROM events
          WHERE event_type IS NOT NULL),
        ordx AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM pre),
        fc AS (SELECT user_id, MIN(rn) AS crn FROM ordx
               WHERE event_type = 'purchase' GROUP BY 1),
        path AS (
          SELECT o.user_id, o.rn,
                 CASE WHEN o.rn = f.crn THEN '__CONV__'
                      ELSE o.event_type END AS t
          FROM ordx o LEFT JOIN fc f USING (user_id)
          WHERE f.crn IS NULL OR o.rn <= f.crn),
        tr AS (
          SELECT t AS cur,
                 COALESCE(LAG(t) OVER (PARTITION BY user_id ORDER BY rn),
                          '__START__') AS prev
          FROM path),
        tail AS (
          SELECT '__NULL__' AS cur, p.t AS prev
          FROM (SELECT user_id, t,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY rn DESC) AS rr
                FROM path) p
          LEFT JOIN fc ON fc.user_id = p.user_id
          WHERE p.rr = 1 AND fc.crn IS NULL),
        edges AS (
          SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT prev, cur FROM tr UNION ALL SELECT prev, cur FROM tail)
          GROUP BY 1, 2),
        chan AS (SELECT DISTINCT event_type AS v FROM pre
                 WHERE event_type <> 'purchase'),
        variants AS (SELECT v FROM chan UNION ALL SELECT '__BASE__'),
        vedges AS (
          SELECT vv.v, e.prev,
                 CASE WHEN vv.v <> '__BASE__' AND e.cur = vv.v
                      THEN '__NULL__' ELSE e.cur END AS cur,
                 CAST(SUM(e.n) AS DOUBLE) AS n
          FROM edges e JOIN variants vv ON vv.v = '__BASE__' OR e.prev <> vv.v
          GROUP BY 1, 2, 3),
        outdeg AS (SELECT v, prev AS node, SUM(n) AS tot FROM vedges GROUP BY 1, 2),
        states AS (SELECT DISTINCT st FROM (
          SELECT prev AS st FROM edges UNION SELECT cur FROM edges
          UNION SELECT '__START__' UNION SELECT '__CONV__' UNION SELECT '__NULL__')),
        vstates AS (SELECT vv.v, s.st FROM variants vv CROSS JOIN states s),
        m0 AS (SELECT v, st, CASE WHEN st = '__START__' THEN 1.0 ELSE 0.0 END AS r
               FROM vstates),
        {','.join(_ma_steps)}
        SELECT c.v AS channel,
               CASE WHEN b.r > 0 THEN ROUND(1.0 - m.r / b.r, 6) END AS removal_effect
        FROM chan c
        JOIN m12 m ON m.v = c.v AND m.st = '__CONV__'
        JOIN (SELECT r FROM m12 WHERE v = '__BASE__' AND st = '__CONV__') b ON TRUE
    """
    # PCA power iteration unrolled: identical rounded covariance both
    # sides (ROUND 6 half-away), then v <- ROUND(Cv/||Cv||, 9) ten
    # times — per-step quantization re-locks the engines (intra-step
    # float drift ~1e-16 << the 5e-10 boundary), so loadings match
    # bit-for-bit, not approximately. Zero norm -> NULL loadings via
    # NULLIF, mirroring the engine's NaN propagation.
    _pca_steps = []
    for _t in range(1, 11):
        _pca_steps.append(f"""
            u{_t} AS MATERIALIZED (
              SELECT c.i, SUM(c.c * p.x) AS u
              FROM covm c JOIN v{_t-1} p ON p.i = c.j GROUP BY 1),
            n{_t} AS (SELECT sqrt(SUM(u*u)) AS nrm FROM u{_t}),
            v{_t} AS (SELECT i, ROUND(u / NULLIF((SELECT nrm FROM n{_t}), 0), 9) AS x
                      FROM u{_t})""")
    _pca_sql = f"""
        WITH pairs AS (
          SELECT a.i AS i, b.i AS j
          FROM range(64) a(i), range(64) b(i) WHERE a.i <= b.i),
        tri AS (
          SELECT p.i, p.j,
                 ROUND(AVG(CAST(embedding[p.i + 1] AS DOUBLE) * CAST(embedding[p.j + 1] AS DOUBLE))
                       - AVG(CAST(embedding[p.i + 1] AS DOUBLE)) * AVG(CAST(embedding[p.j + 1] AS DOUBLE)),
                       6) AS c
          FROM embeddings, pairs p GROUP BY 1, 2),
        covm AS (SELECT i, j, c FROM tri
                 UNION ALL SELECT j AS i, i AS j, c FROM tri WHERE i <> j),
        dims AS (SELECT CAST(MAX(i) + 1 AS DOUBLE) AS d FROM covm),
        v0 AS (SELECT i, 1.0 / sqrt((SELECT d FROM dims)) AS x
               FROM (SELECT DISTINCT i FROM covm)),
        {','.join(_pca_steps)},
        pick AS (SELECT x FROM v10 ORDER BY abs(x) DESC NULLS LAST, i LIMIT 1)
        SELECT v.i,
               CASE WHEN (SELECT x FROM pick) < 0 THEN -v.x ELSE v.x END AS loading
        FROM v10 v
    """
    return {
        "ols_calendar_by_type": _ols_sql,
        "attribution_markov_events": _markov_sql,
        "pca_loadings_embeddings": _pca_sql,
        # phase reduced mod P BEFORE the trig call (DuckDB % follows the
        # dividend sign -> ((h%P)+P)%P); cos/sin then agree to ~1 ulp and
        # ROUND 6 absorbs the sum-order drift
        # NTILE split + int-sum shares, division points mirrored
        "value_concentration_deciles": """
            WITH s AS (
              SELECT user_id,
                     CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
              FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
              GROUP BY 1),
            tot AS (SELECT CAST(SUM(v) AS DOUBLE) AS t FROM s),
            t AS (SELECT *, NTILE(10) OVER (ORDER BY v DESC, user_id) AS decile FROM s),
            d AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS users,
                         CAST(SUM(v) AS BIGINT) AS dv
                  FROM t GROUP BY 1)
            SELECT CAST(decile AS BIGINT) AS decile, users,
                   CASE WHEN (SELECT t FROM tot) > 0
                        THEN ROUND(CAST(dv AS DOUBLE) / (SELECT t FROM tot), 6)
                   END AS share,
                   CASE WHEN (SELECT t FROM tot) > 0
                        THEN ROUND(CAST(SUM(dv) OVER (ORDER BY decile
                                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                                   / (SELECT t FROM tot), 6)
                   END AS cum_share
            FROM d
        """,
        # the KM product multiplies in the SAME ascending order on both
        # sides (numpy cumprod vs a sequential product() window), so the
        # curve matches to the shared rounding; durations are exact ints
        "km_survival_purchase": """
            WITH e AS (SELECT user_id, ts, event_type FROM events
                       WHERE user_id IS NOT NULL AND ts IS NOT NULL
                         AND event_type IS NOT NULL),
            u AS (SELECT user_id, MIN(ts) AS t0, MAX(ts) AS tlast,
                         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tev
                  FROM e GROUP BY 1),
            dur AS (SELECT CAST(floor(epoch_us(COALESCE(tev, tlast) - t0)
                                      / 86400000000.0) AS BIGINT) AS d,
                           CASE WHEN tev IS NOT NULL THEN 1 ELSE 0 END AS ev
                    FROM u),
            dd AS (SELECT d AS t, CAST(COUNT(*) AS BIGINT) AS d_events
                   FROM dur WHERE ev = 1 GROUP BY 1),
            km AS (SELECT dd.t, dd.d_events,
                          (SELECT CAST(COUNT(*) AS BIGINT) FROM dur x
                           WHERE x.d >= dd.t) AS n_risk
                   FROM dd)
            SELECT t, n_risk, d_events,
                   ROUND(product(1.0 - CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
                         OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6) AS survival
            FROM km
        """,
        # same exact-int CUSUM key and earliest-tie rule as the
        # changepoint oracle; per-side Cramer over int sums cast to
        # DOUBLE at the same points -> bit-exact slopes
        "trend_break_by_user": """
            WITH f AS (
              SELECT user_id, ts, event_id,
                     CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vmil,
                     row_number() OVER w AS rn,
                     COUNT(*) OVER (PARTITION BY user_id) AS n,
                     CASE WHEN bool_or(value IS NULL)
                               OVER (PARTITION BY user_id)
                          THEN 1 ELSE 0 END AS has_null
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            g AS (SELECT * FROM f WHERE n >= 8 AND has_null = 0),
            c AS (SELECT user_id, ts, rn, n, vmil,
                         SUM(vmil) OVER (PARTITION BY user_id ORDER BY rn
                                         ROWS UNBOUNDED PRECEDING) AS cs,
                         SUM(vmil) OVER (PARTITION BY user_id) AS total
                  FROM g),
            star AS (
              SELECT user_id, ts AS cp_ts, rn AS kstar, n
              FROM c
              QUALIFY row_number() OVER (PARTITION BY user_id
                                         ORDER BY abs(n * cs - rn * total) DESC,
                                                  rn) = 1),
            sides AS (
              SELECT g.user_id, s.kstar, s.n, s.cp_ts,
                     CASE WHEN g.rn <= s.kstar THEN 0 ELSE 1 END AS side,
                     CASE WHEN g.rn <= s.kstar THEN g.rn - 1
                          ELSE g.rn - s.kstar - 1 END AS x,
                     g.vmil AS y
              FROM g JOIN star s ON s.user_id = g.user_id),
            agg AS (
              SELECT user_id, kstar, n, cp_ts, side,
                     CAST(COUNT(*) AS DOUBLE) AS m,
                     CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
                     CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
                     CAST(CAST(SUM(x*x) AS BIGINT) AS DOUBLE) AS sxx,
                     CAST(CAST(SUM(x*y) AS BIGINT) AS DOUBLE) AS sxy
              FROM sides GROUP BY 1, 2, 3, 4, 5),
            sl AS (
              SELECT user_id, side,
                     CASE WHEN (m * sxx - sx * sx) <> 0
                          THEN ((m * sxy - sx * sy) / (m * sxx - sx * sx)) / 1000.0
                     END AS slope
              FROM agg)
            SELECT s.user_id, s.cp_ts, CAST(s.kstar AS BIGINT) AS cp_index,
                   CAST(s.n AS BIGINT) AS n,
                   pre.slope AS slope_pre, post.slope AS slope_post
            FROM star s
            LEFT JOIN (SELECT user_id, slope FROM sl WHERE side = 0) pre USING (user_id)
            LEFT JOIN (SELECT user_id, slope FROM sl WHERE side = 1) post USING (user_id)
        """,
        # exact digit extraction: integer-string head of the quantized
        # value — floor(log10(v)) would diverge across libms at
        # representation boundaries
        "benford_value_by_type": """
            WITH f AS (
              SELECT event_type AS g,
                     CAST(ROUND(abs(value) * 100, 0) AS BIGINT) AS u
              FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
            d AS (SELECT g, CAST(substr(CAST(u AS VARCHAR), 1, 1) AS BIGINT) AS d,
                         COUNT(*) AS n
                  FROM f WHERE u > 0 GROUP BY 1, 2),
            tot AS (SELECT g, CAST(SUM(n) AS DOUBLE) AS n FROM d GROUP BY 1),
            dig AS (SELECT unnest(generate_series(1, 9)) AS d),
            grid AS (SELECT t.g, t.n AS tot, dig.d,
                            log10(1.0 + 1.0 / CAST(dig.d AS DOUBLE)) AS p
                     FROM tot t CROSS JOIN dig),
            j AS (SELECT grid.g, grid.tot, grid.d, grid.p,
                         CAST(COALESCE(dd.n, 0) AS DOUBLE) AS obs
                  FROM grid LEFT JOIN d dd ON dd.g = grid.g AND dd.d = grid.d)
            SELECT g AS event_type, CAST(MAX(tot) AS BIGINT) AS n,
                   ROUND(SUM((obs - tot * p) * (obs - tot * p) / (tot * p)), 6) AS chi2,
                   ROUND(SUM(abs(obs / tot - p)) / 9.0, 6) AS mad
            FROM j GROUP BY 1
        """,
        # element-wise recursion, literally mirrored expressions ->
        # bit-exact per-row output, unrounded (no reductions anywhere);
        # CAST(0.3 AS DOUBLE) == Python 0.3 (nearest double to 3/10)
        "holt_by_user": """
            WITH RECURSIVE ordx AS (
              SELECT user_id, event_id, CAST(value AS DOUBLE) AS y,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events WHERE value IS NOT NULL),
            r AS (
              SELECT user_id, event_id, rn, y AS l, CAST(0 AS DOUBLE) AS b
              FROM ordx WHERE rn = 1
              UNION ALL
              SELECT o.user_id, o.event_id, o.rn,
                     CAST(0.3 AS DOUBLE) * o.y
                       + (1.0 - CAST(0.3 AS DOUBLE)) * (r.l + r.b),
                     CAST(0.1 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * o.y
                       + (1.0 - CAST(0.3 AS DOUBLE)) * (r.l + r.b)) - r.l)
                       + (1.0 - CAST(0.1 AS DOUBLE)) * r.b
              FROM r JOIN ordx o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
            SELECT user_id, event_id, l AS holt_level, b AS holt_trend FROM r
        """,
        "spectral_daily_weekly": """
            WITH b AS (
              SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
                     event_type AS g, CAST(COUNT(*) AS DOUBLE) AS n
              FROM events
              WHERE ts IS NOT NULL AND event_type IS NOT NULL
              GROUP BY 1, 2),
            p AS (SELECT unnest([24, 168]) AS period_hours),
            terms AS (
              SELECT b.g, p.period_hours,
                     b.n * cos(2.0 * pi() * CAST(((b.h % p.period_hours) + p.period_hours) % p.period_hours AS DOUBLE) / CAST(p.period_hours AS DOUBLE)) AS c,
                     b.n * sin(2.0 * pi() * CAST(((b.h % p.period_hours) + p.period_hours) % p.period_hours AS DOUBLE) / CAST(p.period_hours AS DOUBLE)) AS s,
                     b.n AS n
              FROM b CROSS JOIN p)
            SELECT g AS event_type, CAST(period_hours AS BIGINT) AS period_hours,
                   ROUND(2.0 * sqrt(SUM(c) * SUM(c) + SUM(s) * SUM(s)) / SUM(n), 6) AS amplitude
            FROM terms GROUP BY 1, 2
        """,
        # byte-based DuckDB levenshtein == the engine's codepoint DP
        # BECAUSE normalization strips to ASCII first (both sides)
        "edit_dup_pairs_docs": """
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')),
                          '[^a-z0-9 \\t\\n\\r\\f\\v]', '', 'g'),
                          '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) AS t
              FROM documents),
            elig AS (SELECT doc_id, t, substr(t, 1, 12) AS k FROM norm
                     WHERE length(t) BETWEEN 1 AND 1000),
            blk AS (SELECT * FROM elig
                    QUALIFY COUNT(*) OVER (PARTITION BY k) <= 256)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
            FROM blk a JOIN blk b ON a.k = b.k AND a.doc_id < b.doc_id
            WHERE levenshtein(a.t, b.t) <= 16
        """,
        "shift_lead1_by_user": """
            SELECT * FROM (
              SELECT event_id, ts, user_id, value,
                     LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_shift_1
              FROM events) WHERE value_shift_1 IS NOT NULL
        """,
        # cents-exact drawdown: cum, running max and dd are all BIGINT;
        # the single float op (/100) is shared with the engine
        "max_drawdown_by_user": """
            WITH d AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN value IS NULL THEN 0
                          ELSE CAST(ROUND(value * 100, 0) AS BIGINT) END AS u
              FROM events),
            c AS (
              SELECT user_id, ts, event_id,
                     SUM(u) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM d),
            m AS (
              SELECT user_id,
                     MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) - cum AS dd
              FROM c)
            SELECT user_id, CAST(MAX(dd) AS DOUBLE) / 100.0 AS max_drawdown,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM m GROUP BY 1
        """,
        "xcorr_click_purchase": """
            WITH b AS (SELECT CAST(CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS BIGINT) AS h,
                              event_type AS t, COUNT(*) AS n
                       FROM events WHERE event_type IN ('click', 'purchase')
                       GROUP BY 1, 2),
            r AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM b),
            grid AS (SELECT unnest(generate_series(lo, hi)) AS h FROM r),
            a AS (SELECT g.h, CAST(COALESCE(x.n, 0) AS DOUBLE) AS n
                  FROM grid g LEFT JOIN (SELECT h, n FROM b WHERE t = 'click') x USING (h)),
            f AS (SELECT g.h, CAST(COALESCE(x.n, 0) AS DOUBLE) AS n
                  FROM grid g LEFT JOIN (SELECT h, n FROM b WHERE t = 'purchase') x USING (h)),
            lags AS (SELECT unnest(generate_series(-3, 3)) AS lag)
            SELECT CAST(lags.lag AS BIGINT) AS lag,
                   ROUND(corr(a.n, f2.n), 6) AS xcorr
            FROM lags
            JOIN a ON TRUE
            JOIN f f2 ON f2.h = a.h + lags.lag
            GROUP BY 1
        """,
        "pagerank_event_types": _pagerank_sql,
        "postings_docs": """
            WITH ex AS (SELECT doc_id,
                               unnest(regexp_extract_all(lower(COALESCE(text, '')), '\\w+')) AS term
                        FROM documents),
            pairs AS (SELECT DISTINCT doc_id, term FROM ex),
            d AS (SELECT term, doc_id,
                         COUNT(*) OVER (PARTITION BY term) AS df,
                         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS pos
                  FROM pairs)
            SELECT term, CAST(df AS BIGINT) AS df, CAST(pos AS BIGINT) AS pos, doc_id
            FROM d WHERE df >= 10 AND pos <= 20
        """,
        "lag_lead_features": """
            SELECT event_id, ts, user_id, value,
                   LAG(value, 1) OVER w AS value_lag_1,
                   LAG(value, 2) OVER w AS value_lag_2,
                   LEAD(value, 1) OVER w AS value_lead_1
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "rolling_mean_4": """
            SELECT event_id, ts, user_id, value,
                   ROUND(AVG(value) OVER w, 6) AS value_roll_mean_4,
                   ROUND(SUM(value) OVER w, 6) AS value_roll_sum_4
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "time_rolling_30min": """
            SELECT event_id, ts, user_id, value,
                   ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW), 6) AS value_troll_mean
            FROM events
        """,
        "sessionize_30min": """
            SELECT event_id, ts, user_id, value,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                  FROM events)
        """,
        "calendar_features_events": """
            SELECT event_id, ts,
                   CAST(extract(hour FROM ts) AS BIGINT) AS hour,
                   CAST(isodow(ts) AS BIGINT) AS dow,
                   sin(2.0 * pi() * extract(hour FROM ts) / 24.0) AS hour_sin,
                   cos(2.0 * pi() * extract(hour FROM ts) / 24.0) AS hour_cos,
                   sin(2.0 * pi() * isodow(ts) / 7.0) AS dow_sin,
                   cos(2.0 * pi() * isodow(ts) / 7.0) AS dow_cos,
                   CAST(isodow(ts) >= 6 AS BIGINT) AS is_weekend
            FROM events
        """,
        "session_features_30min": """
            WITH s AS (
              SELECT event_id, ts, user_id,
                     CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                    FROM events))
            SELECT event_id, ts, user_id, session_id,
                   CAST(row_number() OVER (PARTITION BY user_id, session_id
                                           ORDER BY ts, event_id) - 1 AS BIGINT) AS session_pos,
                   epoch_us(ts) - first_value(epoch_us(ts)) OVER (
                        PARTITION BY user_id, session_id ORDER BY ts, event_id)
                     AS since_session_start_us
            FROM s
        """,
        "session_stats_30min": """
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   ROUND(SUM(value), 6) AS value_sum
            FROM (SELECT user_id, ts, value,
                         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                  FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                        FROM events))
            GROUP BY user_id, session_id
        """,
        "asof_latest_order": f"""
            SELECT e.event_id, e.ts, e.user_id, e.value, os.o_totalprice
            FROM events e ASOF LEFT JOIN ({order_state}) os
              ON e.user_id = os.user_id AND e.ts >= os.ots
        """,
        "asof_latest_order_tol": f"""
            SELECT e.event_id, e.ts, e.user_id, e.value,
                   CASE WHEN os.ots >= e.ts - INTERVAL 7 DAY THEN os.o_totalprice END AS o_totalprice
            FROM events e ASOF LEFT JOIN ({order_state}) os
              ON e.user_id = os.user_id AND e.ts >= os.ots
        """,
        "asof_bucketed": f"""
            SELECT e.event_id, e.ts, e.user_id, e.value, os.o_totalprice
            FROM events e ASOF LEFT JOIN ({order_state}) os
              ON e.user_id = os.user_id AND e.ts >= os.ots
        """,
        "asof_next_order": f"""
            SELECT e.event_id, e.ts, e.user_id, e.value, os.o_totalprice
            FROM events e ASOF LEFT JOIN ({order_state}) os
              ON e.user_id = os.user_id AND e.ts <= os.ots
        """,
        "multi_asof_features": f"""
            SELECT e.event_id, e.ts, e.user_id, e.value,
                   os.o_totalprice, ps.purchase_value
            FROM events e
            ASOF LEFT JOIN ({order_state}) os
              ON e.user_id = os.user_id AND e.ts >= os.ots
            ASOF LEFT JOIN (SELECT user_id, ts AS pts, MAX(value) AS purchase_value
                            FROM events WHERE event_type = 'purchase'
                            GROUP BY 1, 2) ps
              ON e.user_id = ps.user_id AND e.ts >= ps.pts
        """,
        "multi_asof_bucketed": f"""
            SELECT e.event_id, e.ts, e.user_id, e.value,
                   os.o_totalprice, ps.purchase_value
            FROM events e
            ASOF LEFT JOIN ({order_state}) os
              ON e.user_id = os.user_id AND e.ts >= os.ots
            ASOF LEFT JOIN (SELECT user_id, ts AS pts, MAX(value) AS purchase_value
                            FROM events WHERE event_type = 'purchase'
                            GROUP BY 1, 2) ps
              ON e.user_id = ps.user_id AND e.ts >= ps.pts
        """,
        "asof_nearest_order": f"""
            SELECT event_id, ts, user_id, value, o_totalprice FROM (
              SELECT e.event_id, e.ts, e.user_id, e.value, os.o_totalprice,
                     ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY ABS(epoch_us(e.ts) - epoch_us(os.ots)),
                                CASE WHEN os.ots <= e.ts THEN 0 ELSE 1 END) AS rn
              FROM events e LEFT JOIN ({order_state}) os ON e.user_id = os.user_id)
            WHERE rn = 1
        """,
        "global_shift_lead1": """
            SELECT * FROM (
              SELECT ts, value, LEAD(value) OVER (ORDER BY ts) AS value_shift_1
              FROM events WHERE user_id = 7) WHERE value_shift_1 IS NOT NULL
        """,
        "global_shift_lead1_dist": """
            SELECT * FROM (
              SELECT ts, value, LEAD(value, 2) OVER (ORDER BY ts) AS value_shift_2
              FROM events WHERE user_id = 7) WHERE value_shift_2 IS NOT NULL
        """,
        "incremental_features_refresh": """
            SELECT * FROM (
              SELECT event_id, ts, user_id, value,
                     LAG(value, 1) OVER w AS value_lag_1,
                     ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS value_roll_mean_4,
                     LEAD(value, 1) OVER w AS value_shift_1
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) WHERE value_shift_1 IS NOT NULL
        """,
        "shift_multi_target": """
            SELECT event_id, ts, user_id, value, s.step,
                   CASE s.step WHEN 1 THEN v1 WHEN 2 THEN v2 ELSE v3 END AS target_value
            FROM (
              SELECT event_id, ts, user_id, value,
                     LEAD(value, 1) OVER w AS v1,
                     LEAD(value, 2) OVER w AS v2,
                     LEAD(value, 3) OVER w AS v3,
                     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) CROSS JOIN (SELECT unnest([1, 2, 3]) AS step) s
            WHERE rn <= n - 3
        """,
        "null_counts_events": """
            SELECT COUNT(*) - COUNT(event_id) AS event_id,
                   COUNT(*) - COUNT(ts) AS ts,
                   COUNT(*) - COUNT(user_id) AS user_id,
                   COUNT(*) - COUNT(event_type) AS event_type,
                   COUNT(*) - COUNT(value) AS value,
                   COUNT(*) - COUNT(props) AS props
            FROM events
        """,
        "dup_ts_pairs": """
            SELECT COUNT(*) AS n_dups FROM (
              SELECT user_id, ts FROM events GROUP BY user_id, ts HAVING COUNT(*) > 1)
        """,
        "equidistant_by_user": """
            WITH d AS (
              SELECT user_id,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS delta
              FROM events)
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER (WHERE delta = 0) AS BIGINT) AS n_dups,
                   CAST(COUNT(DISTINCT delta) AS BIGINT) AS n_deltas
            FROM d GROUP BY user_id
        """,
        "time_to_numeric": """
            SELECT event_id, CAST(epoch_us(ts) AS DOUBLE) AS ts FROM events
        """,
        "window_tags": """
            WITH e AS (SELECT event_id, CAST(epoch_us(ts) AS DOUBLE) AS t FROM events),
            o AS (SELECT event_id, t, ROW_NUMBER() OVER (ORDER BY t) - 1 AS rn FROM e),
            params AS (SELECT COUNT(*) AS n, COUNT(*) // 4 AS w FROM e),
            starts AS (SELECT unnest(generate_series(0, (SELECT n - w FROM params), (SELECT w FROM params))) AS i),
            bounds AS (
              SELECT CAST(s.i / (SELECT w FROM params) AS INT) AS window_id,
                     (SELECT t FROM o WHERE rn = s.i) AS start_t,
                     (SELECT t FROM o WHERE rn = s.i + (SELECT w FROM params) - 1) AS end_t
              FROM starts s),
            b2 AS (SELECT window_id, start_t, end_t, start_t + (end_t - start_t) * 0.6 AS train_end FROM bounds)
            SELECT o.event_id, b.window_id,
                   CASE WHEN o.t < b.train_end THEN 'train' ELSE 'test' END AS split
            FROM o JOIN b2 b ON o.t >= b.start_t AND o.t < b.end_t
        """,
        "mean_pad_value": """
            SELECT ROUND(value, 6) AS value FROM events
            UNION ALL
            SELECT ROUND((SELECT AVG(value) FROM events), 6) AS value FROM generate_series(1, 100)
        """,
        "dedup_exact_docs": """
            SELECT * FROM documents
            WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
        """,
        "text_stats_docs": r"""
            -- COALESCE: the engine's documented null-text contract is
            -- "null = empty string" (fillna('') before every str kernel)
            SELECT doc_id,
                   LENGTH(COALESCE(text, '')) AS n_chars_calc,
                   LENGTH(regexp_extract_all(COALESCE(text, ''), '\S+')) AS n_tokens,
                   LENGTH(regexp_extract_all(COALESCE(text, ''), '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_words
            FROM documents
        """,
        "token_sum_by_lang": r"""
            SELECT lang,
                   CAST(SUM(LENGTH(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens_total,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "knn_brute_10": """
            WITH q AS (
              SELECT 0 AS query_idx, CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
              UNION ALL
              SELECT 1, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 1)
            SELECT query_idx, vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
            FROM embeddings e CROSS JOIN q
            -- engine ANN contract: zero-norm vectors (failed encodes)
            -- are never neighbor candidates
            WHERE list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) > 0
            QUALIFY ROW_NUMBER() OVER (PARTITION BY query_idx
                     ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, vec_id) <= 10
        """,
        "embedding_norms": """
            SELECT vec_id,
                   ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm
            FROM embeddings
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "backfill_ffill": """
            SELECT event_id, ts, user_id,
                   LAST_VALUE(CASE WHEN event_type = 'click' THEN NULL ELSE value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS value_filled
            FROM events
        """,
        "rolling_minmax_4": """
            SELECT event_id, ts, user_id, value,
                   MIN(value) OVER w AS value_roll_min_4,
                   MAX(value) OVER w AS value_roll_max_4,
                   ROUND(STDDEV(value) OVER w, 6) AS value_roll_std_4
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "streaming_features": """
            SELECT event_id, ts, user_id, value,
                   LAG(value, 1) OVER w AS value_lag_1,
                   ROUND(AVG(value) OVER w2, 6) AS value_roll_mean_4,
                   ROUND(SUM(value) OVER w2, 6) AS value_roll_sum_4,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                   w2 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "range_join_clicks_30min": """
            SELECT l.event_id, l.ts, l.user_id, l.value,
                   r.ts AS ts_right, r.event_id AS event_id_right, r.value AS value_right
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND r.ts >= l.ts - INTERVAL 30 MINUTE AND r.ts <= l.ts
            WHERE l.event_type = 'purchase' AND r.event_type = 'click'
        """,
        "masv_lineitem": """
            SELECT ROUND(AVG(ABS(1.0 * (l_quantity - (SELECT AVG(l_quantity) FROM lineitem)))), 6) AS masv_l_quantity,
                   ROUND(AVG(ABS(2.0 * (l_discount - (SELECT AVG(l_discount) FROM lineitem)))), 6) AS masv_l_discount
            FROM lineitem
        """,
        "expand_targets_h3": """
            SELECT event_id, ts, user_id, value, s.step,
                   CASE s.step WHEN 1 THEN v1 WHEN 2 THEN v2 ELSE v3 END AS target_value
            FROM (
              SELECT event_id, ts, user_id, value,
                     LEAD(value, 1) OVER w AS v1,
                     LEAD(value, 2) OVER w AS v2,
                     LEAD(value, 3) OVER w AS v3,
                     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) CROSS JOIN (SELECT unnest([1, 2, 3]) AS step) s
            WHERE rn <= n - 3
        """,
        "flagship_pipeline": f"""
            WITH enr AS (
              SELECT e.event_id, e.ts, e.user_id, e.value, os.o_totalprice
              FROM events e ASOF LEFT JOIN ({order_state}) os
                ON e.user_id = os.user_id AND e.ts >= os.ots),
            feat AS (
              SELECT event_id, ts, user_id, value, o_totalprice,
                     LAG(value, 1) OVER w AS value_lag_1,
                     LAG(value, 2) OVER w AS value_lag_2,
                     ROUND(AVG(value) OVER w2, 6) AS value_roll_mean_4,
                     ROUND(SUM(value) OVER w2, 6) AS value_roll_sum_4,
                     CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
                     LEAD(value, 1) OVER w AS value_shift_1
              FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                    FROM enr)
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                     w2 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            )
            SELECT * FROM feat WHERE value_shift_1 IS NOT NULL
        """,
        "validator_report": """
            WITH t AS (SELECT value AS target, value * 2 AS feature_1, value + 1 AS feature_2,
                              value * value AS feature_3, -value AS feature_4, ts FROM events),
            m AS (SELECT COUNT(*) AS n,
                         COUNT(DISTINCT feature_1) AS u1, COUNT(DISTINCT feature_2) AS u2,
                         COUNT(DISTINCT feature_3) AS u3, COUNT(DISTINCT feature_4) AS u4,
                         COUNT(*) - COUNT(feature_1) AS n1, COUNT(*) - COUNT(feature_2) AS n2,
                         COUNT(*) - COUNT(feature_3) AS n3, COUNT(*) - COUNT(feature_4) AS n4
                  FROM t)
            SELECT 'class_balance' AS "check", TRUE AS passed
            UNION ALL SELECT 'feature_count', 4 BETWEEN 4 AND 500
            UNION ALL SELECT 'feature_ratio', (4.0 / n) <= 0.1 FROM m
            UNION ALL SELECT 'feature_variability',
                      (LEAST(u1, u2, u3, u4) >= 10 AND n1 + n2 + n3 + n4 = 0) FROM m
            UNION ALL SELECT 'sample_size', n BETWEEN 3000 AND 10000000 FROM m
        """,
        "knn_ivf_10": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
            SELECT 0 AS query_idx, vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) > 0
            QUALIFY ROW_NUMBER() OVER (
                     ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, vec_id) <= 10
        """,
        "knn_ivf_reuse_10": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
            SELECT 0 AS query_idx, vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) > 0
            QUALIFY ROW_NUMBER() OVER (
                     ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, vec_id) <= 10
        """,
        "knn_ivf_saved_10": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
            SELECT 0 AS query_idx, vec_id,
                   ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)) > 0
            QUALIFY ROW_NUMBER() OVER (
                     ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) DESC, vec_id) <= 10
        """,
        "knn_lsh_10": _lsh_oracle_sql(),
        "minhash_kept_docs": _minhash_oracle_sql(),
        "curation_pipeline": _curation_oracle_sql(),
        # corpus bigram LM with add-0.5 smoothing; docs with <2 tokens
        # have no bigram positions and are absent on both sides
        "ngram_lm_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w,
                     generate_subscripts(regexp_extract_all(lower(text), '\w+'), 1) AS pos
              FROM documents),
            big AS (
              SELECT a.doc_id, a.w AS w1, a.w || ' ' || b.w AS gram
              FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
            cb AS (SELECT gram, COUNT(*) AS nb FROM big GROUP BY gram),
            cu AS (SELECT w, COUNT(*) AS nu FROM toks GROUP BY w),
            v AS (SELECT COUNT(*) AS vocab FROM cu),
            scored AS (
              SELECT big.doc_id,
                     log2((cb.nb + 0.5) / (cu.nu + 0.5 * v.vocab)) AS lp
              FROM big JOIN cb USING (gram) JOIN cu ON big.w1 = cu.w CROSS JOIN v)
            SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(lp), 6) AS lm_score
            FROM scored GROUP BY doc_id
        """,
        # sequential count-then-redact per pattern; RE2 == Python re on
        # this pattern subset (classes, bounded repeats, \b only)
        "pii_redact_docs": r"""
            WITH inj AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN
                       coalesce(text, '') || ' reach user' || doc_id ||
                       '@mail.example.com or 555-123-' ||
                       lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
                       ' from 10.' || (doc_id % 256) || '.0.1'
                     ELSE coalesce(text, '') END AS t0
              FROM documents),
            s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                     regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
              FROM inj),
            s2 AS (
              SELECT doc_id, n_email,
                     len(regexp_extract_all(t1, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
                     regexp_replace(t1, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t2
              FROM s1),
            s3 AS (
              SELECT doc_id, n_email, n_phone,
                     len(regexp_extract_all(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
                     regexp_replace(t2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t3
              FROM s2)
            SELECT doc_id, n_email, n_phone, n_ipv4, t3 AS text_redacted FROM s3
        """,
        # same 8-token re-lining on both sides, then first-(doc,line_idx)
        # occurrence per line corpus-wide, reassembled in line order
        "line_dedup_docs": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS t
              FROM documents),
            docs2 AS (
              SELECT doc_id,
                     coalesce((SELECT string_agg(array_to_string(t[i : i + 7], ' '), chr(10) ORDER BY i)
                               FROM (SELECT unnest(generate_series(1, len(t), 8)) AS i)), '') AS text
              FROM toks),
            lines AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS line_idx
              FROM docs2),
            ranked AS (
              SELECT doc_id, line_idx, line,
                     ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
              FROM lines)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS text
            FROM ranked WHERE rn = 1 GROUP BY doc_id
        """,
        # brute-force global pair scan; exact because 4x16 chunk banding
        # is pigeonhole-complete at Hamming threshold 3
        "phash_dedup_events": """
            WITH t AS (
              SELECT event_id,
                     xor(md5_number_lower(user_id::VARCHAR),
                         (event_id % 16)::UBIGINT) AS h
              FROM events WHERE event_id % 3 = 0
            )
            SELECT event_id FROM t t1
            WHERE NOT EXISTS (
              SELECT 1 FROM t t2
              WHERE t2.event_id < t1.event_id
                AND bit_count(xor(t1.h, t2.h)) <= 3
            )
        """,
        "jaccard_kept_docs": f"""
            WITH toks AS ({_SQL_TOKS}),
            sh AS (
              SELECT doc_id, array_to_string(t[i : i + 4], ' ') AS s
              FROM toks {_SQL_SHINGLE_IDX}),
            dsh AS (SELECT DISTINCT doc_id, s FROM sh),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
              FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            dropped AS (
              SELECT DISTINCT i.id_b
              FROM inter i JOIN cnt ca ON ca.doc_id = i.id_a JOIN cnt cb ON cb.doc_id = i.id_b
              WHERE i.c * 1.0 / (ca.n + cb.n - i.c) >= 0.7)
            SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id_b FROM dropped)
        """,
        "simhash_kept_docs": """
            WITH th AS (
              SELECT doc_id, md5_number_lower(unnest(regexp_extract_all(lower(text), '\\w+'))) AS h
              FROM documents),
            bits AS (
              SELECT doc_id, b.bit,
                     SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS score
              FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
              GROUP BY doc_id, b.bit),
            sim AS (
              SELECT doc_id,
                     SUM(CASE WHEN score > 0 THEN (1::UBIGINT << bit) ELSE 0 END)::UBIGINT AS sh
              FROM bits GROUP BY doc_id),
            chunks AS (
              SELECT doc_id, sh, c.c AS chunk_id, (sh >> (16 * c.c)) & 65535 AS chunk_val
              FROM sim CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c) c),
            dropped AS (
              SELECT DISTINCT b.doc_id AS id_b
              FROM chunks a JOIN chunks b
                ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
              WHERE bit_count(xor(a.sh, b.sh)) <= 3)
            SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id_b FROM dropped)
        """,
        "embedding_kept_vecs": """
            SELECT vec_id FROM embeddings WHERE vec_id NOT IN (
              SELECT b.vec_id FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) >= 0.995)
        """,
        # split/sample decisions replay exactly: md5_number_lower == the
        # engine's _md5_lower64, thresholds are the SAME integer
        # literals (computed once by split_thresholds)
        "hash_split_docs": f"""
            SELECT doc_id, lang,
                   CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) < {_split_bounds[0][1]}::UBIGINT THEN '{_split_bounds[0][0]}'
                        WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) < {_split_bounds[1][1]}::UBIGINT THEN '{_split_bounds[1][0]}'
                        ELSE '{_split_bounds[2][0]}' END AS split
            FROM documents
        """,
        "stratified_sample_docs": f"""
            SELECT doc_id, lang FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) <
                  (CASE lang WHEN 'en' THEN {_rate_thr('en')}::UBIGINT
                             WHEN 'fr' THEN {_rate_thr('fr')}::UBIGINT
                             ELSE {_rate_thr(None)}::UBIGINT END)
        """,
        "shuffle_docs": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                        ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || 'epoch0'),
                                 doc_id) - 1 AS BIGINT) AS shuffle_pos
            FROM documents
        """,
        "sample_k_docs": """
            SELECT doc_id, lang FROM documents
            ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || 'eval') DESC, doc_id
            LIMIT 100
        """,
        "normalize_text_docs": """
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '[ \\t\\r\\n\\f\\v]+', ' ', 'g')) AS norm_text
            FROM documents
        """,
        "interarrival_by_user": """
            SELECT event_id, ts, user_id,
                   CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
                     AS interarrival_us
            FROM events
        """,
        # x centered on a fixed epoch so the SQL denominator keeps its
        # digits; den = n·Σx²−(Σx)² is shift-invariant, so the 0.01 h²
        # conditioning floor matches the engine's exactly
        "rolling_slope_by_user": """
            WITH b AS (
              SELECT event_id, ts, user_id, value,
                     CASE WHEN value IS NOT NULL
                          THEN (epoch_us(ts) - epoch_us(TIMESTAMP '2023-01-01'))
                               / 3600000000.0 END AS xh
              FROM events),
            w AS (
              SELECT event_id, ts, user_id, value,
                     COUNT(value) OVER win AS n,
                     SUM(xh) OVER win AS sx,
                     SUM(xh * xh) OVER win AS sxx,
                     REGR_SLOPE(value, xh) OVER win AS sl
              FROM b
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
            SELECT event_id, ts, user_id, value,
                   ROUND(CASE WHEN n >= 2 AND n * sxx - sx * sx >= 0.01
                              THEN sl END, 2) AS value_slope_8
            FROM w
        """,
        # PRIOR-window stats (current row excluded): an inclusive window
        # caps the extreme point's own z at (n-1)/sqrt(n) < 3
        "anomaly_flags_by_user": """
            SELECT event_id, ts, user_id, value,
                   CAST(CASE WHEN value IS NULL OR STDDEV_SAMP(value) OVER w IS NULL
                             THEN NULL
                             WHEN ABS(value - AVG(value) OVER w)
                                  > 3.0 * STDDEV_SAMP(value) OVER w THEN 1
                             ELSE 0 END AS DOUBLE) AS is_anomaly
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
        """,
        "doc_keywords": """
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            sc AS (SELECT tf.doc_id, tf.term, tf.tf * ln(n.n / df.df) AS s
                   FROM tf JOIN df USING (term) CROSS JOIN n),
            r AS (SELECT doc_id, term, s,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY s DESC, term) AS rn
                  FROM sc)
            SELECT d.doc_id, r.term AS keyword, ROUND(r.s, 6) AS keyword_score
            FROM documents d LEFT JOIN (SELECT * FROM r WHERE rn = 1) r USING (doc_id)
        """,
        "feature_corr_lineitem": """
            SELECT 'l_quantity' AS feature,
                   regr_count(l_extendedprice, l_quantity) AS n,
                   ROUND(corr(l_extendedprice, l_quantity), 6) AS corr
            FROM lineitem
            UNION ALL
            SELECT 'l_discount', regr_count(l_extendedprice, l_discount),
                   ROUND(corr(l_extendedprice, l_discount), 6) FROM lineitem
            UNION ALL
            SELECT 'l_tax', regr_count(l_extendedprice, l_tax),
                   ROUND(corr(l_extendedprice, l_tax), 6) FROM lineitem
        """,
        "mi_type_value": """
            WITH m AS (SELECT MIN(value) lo, MAX(value) hi FROM events),
            t AS (SELECT event_type c,
                         CAST(LEAST(FLOOR((value - m.lo) * 10 / (m.hi - m.lo)), 9) AS BIGINT) b
                  FROM events, m WHERE value IS NOT NULL AND event_type IS NOT NULL),
            j AS (SELECT c, b, COUNT(*)::DOUBLE n FROM t GROUP BY c, b),
            tot AS (SELECT SUM(n) t FROM j),
            mar AS (SELECT n, SUM(n) OVER (PARTITION BY c) ni,
                           SUM(n) OVER (PARTITION BY b) nj FROM j)
            SELECT ROUND(SUM((n / t) * ln((n * t) / (ni * nj))), 6) AS mi,
                   CAST(MAX(t) AS BIGINT) AS n
            FROM mar, tot
        """,
        "entropy_by_user": """
            WITH c AS (SELECT user_id, event_type, COUNT(*)::DOUBLE n
                       FROM events WHERE event_type IS NOT NULL
                       GROUP BY user_id, event_type),
                 t AS (SELECT user_id, n,
                              SUM(n) OVER (PARTITION BY user_id) tot FROM c)
            SELECT user_id, ROUND(SUM(-(n / tot) * ln(n / tot)), 6) AS entropy
            FROM t GROUP BY user_id
        """,
        "autocorr1_by_user": """
            WITH l AS (SELECT user_id, value,
                              LAG(value) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS vlag
                       FROM events)
            SELECT user_id, regr_count(value, vlag) AS n_pairs,
                   ROUND(corr(value, vlag), 6) AS autocorr
            FROM l GROUP BY user_id
        """,
        "length_weighted_sample_docs": """
            WITH m AS (SELECT SUM(n_chars)::DOUBLE / COUNT(n_chars) AS mw
                       FROM documents),
                 r AS (SELECT doc_id, n_chars,
                              CAST(FLOOR(LEAST(1.0, 0.3 * n_chars / m.mw)
                                         * 1000000 + 0.5) AS BIGINT) AS ri
                       FROM documents, m WHERE n_chars > 0)
            SELECT doc_id, n_chars FROM r
            WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || 'lw')
                       % 1000000 AS BIGINT) < ri
        """,
        "contrastive_triplets_docs": """
            WITH nn AS (SELECT count(*) AS n FROM documents),
            a AS (SELECT doc_id, text,
                    CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || 'neg')
                         % (SELECT CAST(n AS UBIGINT) FROM nn) AS BIGINT) AS raw
                  FROM documents),
            b AS (SELECT doc_id, text,
                    CASE WHEN raw = doc_id THEN (raw + 1) % (SELECT n FROM nn)
                         ELSE raw END AS neg_doc_id
                  FROM a)
            SELECT b.doc_id, b.text, b.neg_doc_id, d.text AS neg_text
            FROM b JOIN documents d ON d.doc_id = b.neg_doc_id
        """,
        "late_events_5min": """
            WITH w AS (
              SELECT event_id, ts,
                     MAX(ts) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS watermark
              FROM events)
            SELECT event_id, ts, watermark,
                   CASE WHEN watermark IS NULL THEN NULL
                        ELSE CAST(GREATEST(epoch_us(watermark) - epoch_us(ts),
                                           0) AS DOUBLE) END AS lateness_us,
                   CAST(CASE WHEN watermark IS NOT NULL
                             AND epoch_us(watermark) - epoch_us(ts) > 300000000
                             THEN 1 ELSE 0 END AS BIGINT) AS is_late
            FROM w
        """,
        "top_journeys_30min": """
            WITH s AS (
              SELECT user_id, ts, event_id, event_type,
                     CAST(SUM(brk) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (
                                        PARTITION BY user_id
                                        ORDER BY ts, event_id)
                                        > INTERVAL 30 MINUTE
                                   THEN 1 ELSE 0 END AS brk
                    FROM events)),
            r AS (SELECT user_id, session_id, event_type,
                         row_number() OVER (PARTITION BY user_id, session_id
                                            ORDER BY ts, event_id) AS rn
                  FROM s),
            p AS (SELECT user_id, session_id,
                         string_agg(event_type, '>' ORDER BY rn) AS path
                  FROM r WHERE rn <= 3 GROUP BY 1, 2),
            c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1)
            SELECT path, n_sessions FROM c
            ORDER BY n_sessions DESC, path LIMIT 10
        """,
        "session_coactivity_30min": """
            WITH sess AS (
              SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
              FROM (SELECT user_id, ts,
                           CAST(SUM(brk) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                    FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (
                                              PARTITION BY user_id
                                              ORDER BY ts, event_id)
                                              > INTERVAL 30 MINUTE
                                         THEN 1 ELSE 0 END AS brk
                          FROM events))
              GROUP BY user_id, session_id),
            p AS (
              SELECT a.user_id AS user_a, b.user_id AS user_b
              FROM sess a JOIN sess b
                ON a.s <= b.e AND b.s <= a.e AND a.user_id < b.user_id)
            SELECT user_a, user_b, COUNT(*) AS n_overlaps
            FROM p GROUP BY 1, 2
        """,
        "target_encode_asof_events": """
            WITH d AS (
              SELECT event_type, CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                     COALESCE(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)), 0) AS s,
                     COUNT(value) AS c
              FROM events GROUP BY 1, 2),
            x AS (
              SELECT event_type, day,
                     SUM(s) OVER w AS cs, SUM(c) OVER w AS cc
              FROM d
              WINDOW w AS (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
            SELECT e.event_id, e.ts, e.event_type, e.value,
                   CASE WHEN x.cc IS NULL OR x.cc = 0 THEN NULL
                        ELSE CAST(x.cs AS DOUBLE) / x.cc / 100.0
                   END AS value_te_asof
            FROM events e JOIN x ON x.event_type = e.event_type
                                AND x.day = CAST(floor(epoch_us(e.ts) / 86400000000.0) AS BIGINT)
        """,
        "image_curation_pipeline": """
            WITH img AS (
              SELECT doc_id AS image_id,
                     CAST(16 + (doc_id * 7) % 120 AS BIGINT) AS w,
                     CAST(16 + (doc_id * 13) % 120 AS BIGINT) AS h,
                     substr(COALESCE(text, ''), 1, 120) AS caption,
                     xor(md5_number_lower(COALESCE(lang, '') || '|'
                                          || COALESCE(source, '')),
                         (doc_id % 16)::UBIGINT) AS ph
              FROM documents),
            r AS (
              SELECT image_id, w, h, caption, ph,
                     len(regexp_extract_all(caption, '\\S+')) AS ntok,
                     length(regexp_replace(caption, '[^a-zA-Z0-9]', '', 'g')) AS nalnum,
                     length(caption) AS clen
              FROM img),
            kept AS (
              SELECT image_id, caption, ph FROM r
              WHERE NOT (w < 64 OR h < 64)
                AND NOT (GREATEST(w, h)::DOUBLE / LEAST(w, h) > 3.0)
                AND ntok BETWEEN 2 AND 50
                AND (CASE WHEN clen = 0 THEN 0.0
                          ELSE nalnum::DOUBLE / clen END) >= 0.5),
            dd AS (
              SELECT image_id, caption FROM kept t1
              WHERE NOT EXISTS (
                SELECT 1 FROM kept t2
                WHERE t2.image_id < t1.image_id
                  AND bit_count(xor(t1.ph, t2.ph)) <= 3)),
            ix AS (SELECT image_id, caption,
                          row_number() OVER (ORDER BY image_id) - 1 AS idx,
                          COUNT(*) OVER () AS n
                   FROM dd),
            a2 AS (SELECT *, CAST(md5_number_lower(CAST(idx AS VARCHAR) || 'neg')
                                  % CAST(n AS UBIGINT) AS BIGINT) AS raw
                   FROM ix),
            b2 AS (SELECT image_id, caption, idx,
                          CASE WHEN raw = idx THEN (raw + 1) % n ELSE raw END AS neg_idx
                   FROM a2)
            SELECT b2.image_id, b2.caption, CAST(b2.idx AS BIGINT) AS idx,
                   b2.neg_idx, d2.image_id AS neg_image_id,
                   d2.caption AS neg_caption
            FROM b2 JOIN ix d2 ON d2.idx = b2.neg_idx
        """,
        "trending_daily_types": """
            WITH c AS (SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                              event_type, COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT day, event_type, n,
                         row_number() OVER (PARTITION BY day
                                            ORDER BY n DESC, event_type) AS rn
                  FROM c)
            SELECT day, event_type, n FROM r WHERE rn <= 2
        """,
        "curriculum_shards_docs": """
            SELECT doc_id, n_chars,
                   CAST(NTILE(8) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS shard
            FROM documents
        """,
        "spearman_qty_price": """
            WITH f AS (
              SELECT l_quantity + 0.0 AS x, l_extendedprice + 0.0 AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
            r AS (
              SELECT RANK() OVER (ORDER BY x)
                       + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
                     RANK() OVER (ORDER BY y)
                       + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry
              FROM f)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   ROUND(corr(rx, ry), 6) AS spearman
            FROM r
        """,
        "next_purchase_prop_events": """
            WITH t AS (
              SELECT event_type,
                     LEAD(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS nxt
              FROM events),
            c AS (
              SELECT event_type, COUNT(nxt) AS tot,
                     COUNT(*) FILTER (WHERE nxt = 'purchase') AS hits
              FROM t GROUP BY event_type)
            SELECT e.event_id, e.ts, e.user_id, e.event_type,
                   CASE WHEN c.tot IS NULL OR c.tot = 0 THEN NULL
                        ELSE CAST(c.hits AS DOUBLE) / c.tot END AS p_next_purchase
            FROM events e LEFT JOIN c USING (event_type)
        """,
        "dedup_rate_by_source": """
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT md5_number_lower(COALESCE(text, '')))
                        AS BIGINT) AS n_distinct,
                   ROUND(1.0 - CAST(COUNT(DISTINCT
                                    md5_number_lower(COALESCE(text, '')))
                                    AS DOUBLE) / COUNT(*), 6) AS dup_rate
            FROM documents GROUP BY 1
        """,
        "peak_error_burst": """
            WITH e AS (SELECT event_id, ts FROM events
                       WHERE event_type = 'error'),
            w AS (SELECT event_id, ts,
                         CAST(COUNT(*) OVER (ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS w_count
                  FROM e)
            SELECT event_id, ts, w_count FROM w
            ORDER BY w_count DESC, ts, event_id LIMIT 1
        """,
        "gini_user_activity": """
            WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
            r AS (SELECT n,
                         row_number() OVER (ORDER BY n, user_id) AS i,
                         COUNT(*) OVER () AS nu,
                         SUM(n) OVER () AS t
                  FROM c)
            SELECT ROUND(CAST(SUM((2 * i - nu - 1) * n) AS DOUBLE)
                         / (MAX(nu) * MAX(t)), 6) AS gini,
                   CAST(MAX(nu) AS BIGINT) AS n_users
            FROM r
        """,
        "seasonality_strength_value": """
            WITH h AS (SELECT CAST((((CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)) % 24) + 24) % 24 AS BIGINT)
                              AS hod,
                              SUM(value) AS s,
                              SUM(value * value) AS s2,
                              CAST(COUNT(value) AS BIGINT) AS n
                       FROM events WHERE value IS NOT NULL GROUP BY 1),
            g AS (SELECT SUM(s) AS S, SUM(s2) AS S2, SUM(n) AS N,
                         SUM(s * s / n) AS sb
                  FROM h)
            SELECT ROUND((sb - S * S / N) / (S2 - S * S / N), 6) AS eta2_hod,
                   CAST(N AS BIGINT) AS n
            FROM g
        """,
        "activation_lag_events": """
            WITH s AS (SELECT user_id, MIN(ts) AS st FROM events
                       WHERE event_type = 'signup' GROUP BY 1),
            p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS pt
                  FROM events e JOIN s ON s.user_id = e.user_id
                  WHERE e.event_type = 'purchase' AND e.ts >= s.st
                  GROUP BY 1)
            SELECT u.user_id,
                   CAST(p.pt - epoch_us(s.st) AS DOUBLE) AS activation_us
            FROM (SELECT DISTINCT user_id FROM events) u
            LEFT JOIN s USING (user_id) LEFT JOIN p USING (user_id)
        """,
        "daily_value_bands": """
            SELECT CAST(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS BIGINT) AS day,
                   ROUND(quantile_cont(value, 0.5), 6) AS value_p50,
                   ROUND(quantile_cont(value, 0.9), 6) AS value_p90
            FROM events GROUP BY 1
        """,
        "dn_retention_events": """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS BIGINT) AS day
                       FROM events),
            f AS (SELECT user_id, MIN(day) AS fd FROM d GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   ROUND(CAST(COUNT(d1.user_id) AS DOUBLE) / COUNT(*), 6)
                     AS d1_rate,
                   ROUND(CAST(COUNT(d7.user_id) AS DOUBLE) / COUNT(*), 6)
                     AS d7_rate
            FROM f
            LEFT JOIN d d1 ON d1.user_id = f.user_id AND d1.day = f.fd + 1
            LEFT JOIN d d7 ON d7.user_id = f.user_id AND d7.day = f.fd + 7
        """,
        "entropy_rate_events": """
            WITH t AS (
              SELECT event_type AS c,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS p
              FROM events),
            cnt AS (SELECT p, c, COUNT(*) AS n FROM t
                    WHERE p IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT p, SUM(n) AS tp FROM cnt GROUP BY 1),
            g AS (SELECT SUM(n) AS grand FROM cnt)
            SELECT ROUND(SUM(-(CAST(tot.tp AS DOUBLE) / g.grand)
                              * (CAST(cnt.n AS DOUBLE) / tot.tp)
                              * ln(CAST(cnt.n AS DOUBLE) / tot.tp)), 6)
                     AS entropy_rate,
                   CAST(MAX(g.grand) AS BIGINT) AS n_transitions
            FROM cnt JOIN tot USING (p), g
        """,
        "max_streak_by_user": """
            WITH d AS (SELECT DISTINCT user_id,
                              CAST(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS BIGINT) AS day
                       FROM events),
            i AS (SELECT user_id, day,
                         day - row_number() OVER (PARTITION BY user_id
                                                  ORDER BY day) AS island
                  FROM d),
            r AS (SELECT user_id, COUNT(*) AS len
                  FROM i GROUP BY user_id, island)
            SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
            FROM r GROUP BY 1
        """,
        "top_type_trigrams": """
            WITH t AS (
              SELECT user_id, event_type,
                     LEAD(event_type, 1) OVER w AS t1,
                     LEAD(event_type, 2) OVER w AS t2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT event_type || '>' || t1 || '>' || t2 AS seq,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM t WHERE t1 IS NOT NULL AND t2 IS NOT NULL
            GROUP BY 1 ORDER BY cnt DESC, seq LIMIT 20
        """,
        "chi2_source_lang": """
            WITH f AS (SELECT source AS a, lang AS b FROM documents
                       WHERE source IS NOT NULL AND lang IS NOT NULL),
            c AS (SELECT a, b, COUNT(*) AS n FROM f GROUP BY 1, 2),
            aa AS (SELECT DISTINCT a FROM f),
            bb AS (SELECT DISTINCT b FROM f),
            grid AS (SELECT aa.a, bb.b, COALESCE(c.n, 0) AS o
                     FROM aa CROSS JOIN bb LEFT JOIN c USING (a, b)),
            tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM grid),
            rs AS (SELECT a, CAST(SUM(o) AS DOUBLE) AS r FROM grid GROUP BY 1),
            cs AS (SELECT b, CAST(SUM(o) AS DOUBLE) AS cc FROM grid GROUP BY 1)
            -- GREATEST/COALESCE: over an EMPTY table the bare forms give
            -- dof = (0-1)*(0-1) = 1 and n = NULL; the engine's (and
            -- scipy's) degenerate answer is dof 0, n 0
            SELECT ROUND(SUM(power(g.o - rs.r * cs.cc / tot.n, 2)
                             / (rs.r * cs.cc / tot.n)), 6) AS chi2,
                   CAST(GREATEST(COUNT(DISTINCT g.a) - 1, 0)
                        * GREATEST(COUNT(DISTINCT g.b) - 1, 0) AS BIGINT) AS dof,
                   CAST(COALESCE(MAX(tot.n), 0) AS BIGINT) AS n
            FROM grid g JOIN rs USING (a) JOIN cs USING (b), tot
        """,
        "acf_hourly_events": """
            WITH b AS (SELECT CAST(CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS BIGINT) AS h,
                              COUNT(*) AS n
                       FROM events GROUP BY 1),
            r AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM b),
            grid AS (SELECT unnest(generate_series(lo, hi)) AS h FROM r),
            d AS (SELECT g.h, CAST(COALESCE(b.n, 0) AS DOUBLE) AS n
                  FROM grid g LEFT JOIN b USING (h)),
            lags AS (SELECT unnest(generate_series(1, 6)) AS lag)
            SELECT CAST(lags.lag AS BIGINT) AS lag,
                   ROUND(corr(a.n, f.n), 6) AS acf
            FROM lags
            JOIN d a ON TRUE
            JOIN d f ON f.h = a.h + lags.lag
            GROUP BY 1
        """,
        "type_share_by_user": """
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER (PARTITION BY user_id) AS share
            FROM events GROUP BY 1, 2
        """,
        "log_return_by_user": """
            WITH t AS (
              SELECT event_id, ts, user_id, value,
                     LAG(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS pv
              FROM events)
            SELECT event_id, ts, user_id, value,
                   CASE WHEN pv IS NOT NULL AND value / pv > 0
                        THEN ROUND(ln(CAST(value AS DOUBLE) / pv), 6) END AS log_return
            FROM t
        """,
        "hourly_rank_users": """
            WITH h AS (
              SELECT CAST(to_timestamp((CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT))
                          * 3600000000 / 1e6) AS TIMESTAMP) AS bucket_start,
                     user_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2)
            SELECT bucket_start, user_id, n,
                   CAST(row_number() OVER (PARTITION BY bucket_start
                                           ORDER BY n DESC, user_id)
                        AS BIGINT) AS rnk
            FROM h
        """,
        "readability_docs": """
            WITH c AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(COALESCE(text, '')),
                                            '[.!?]+')) AS n_sentences,
                     len(regexp_extract_all(lower(COALESCE(text, '')),
                                            '\\w+')) AS n_words,
                     len(regexp_extract_all(lower(COALESCE(text, '')),
                                            '[aeiouy]+')) AS n_syllables
              FROM documents)
            SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
                   CAST(n_words AS BIGINT) AS n_words,
                   CAST(n_syllables AS BIGINT) AS n_syllables,
                   CASE WHEN n_words > 0 AND n_sentences > 0
                        THEN ROUND(206.835
                                   - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                                   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
                                   6) END AS flesch
            FROM c
        """,
        "behavior_features_pipeline": """
            WITH RECURSIVE keep AS (
              SELECT user_id, MIN(ts) AS ts FROM events GROUP BY user_id
              UNION ALL
              SELECT k.user_id,
                     (SELECT MIN(e.ts) FROM events e
                      WHERE e.user_id = k.user_id
                        AND epoch_us(e.ts) >= epoch_us(k.ts) + 21600000000) AS ts
              FROM keep k
              WHERE EXISTS (SELECT 1 FROM events e
                            WHERE e.user_id = k.user_id
                              AND epoch_us(e.ts) >= epoch_us(k.ts) + 21600000000)),
            s AS (SELECT e.event_id, e.ts, e.user_id, e.event_type
                  FROM keep JOIN events e USING (user_id, ts)
                  QUALIFY row_number() OVER (PARTITION BY e.user_id, e.ts
                                             ORDER BY e.event_id) = 1),
            t AS (SELECT *, LAG(event_type) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id) AS prev_type
                  FROM s),
            c AS (SELECT prev_type AS p, event_type AS c, COUNT(*) AS n
                  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT p, SUM(n) AS tot FROM c GROUP BY p)
            SELECT t.event_id, t.ts, t.user_id, t.event_type, t.prev_type,
                   CASE WHEN t.prev_type IS NULL THEN NULL
                        ELSE ROUND(-ln(CAST(c.n AS DOUBLE) / tot.tot), 6)
                   END AS surprisal,
                   CAST(epoch_us(t.ts) - MAX(CASE WHEN t.event_type = 'purchase'
                                                  THEN epoch_us(t.ts) END)
                          OVER (PARTITION BY t.user_id ORDER BY t.ts, t.event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS DOUBLE) AS us_since_purchase
            FROM t
            LEFT JOIN c ON t.prev_type = c.p AND t.event_type = c.c
            LEFT JOIN tot ON t.prev_type = tot.p
        """,
        "volume_anomalies_daily": """
            WITH d AS (SELECT event_type,
                              CAST(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS BIGINT) AS day,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2),
            s AS (SELECT event_type, COUNT(*) AS cnt, AVG(n) AS mu,
                         stddev_samp(n) AS sd
                  FROM d GROUP BY 1),
            z AS (SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n,
                         CASE WHEN s.cnt > 1 AND s.sd > 0
                              THEN ROUND((d.n - s.mu) / s.sd, 6) END AS z
                  FROM d JOIN s USING (event_type))
            SELECT event_type, day, n, z,
                   COALESCE(ABS(z) >= 3.0, FALSE) AS is_anomaly
            FROM z
        """,
        "burstiness_by_user": """
            WITH d AS (SELECT user_id,
                              CAST(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS BIGINT) AS day,
                              COUNT(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT user_id,
                   CASE WHEN COUNT(*) > 1
                        THEN ROUND(var_samp(n) / AVG(n), 6) END AS fano,
                   CAST(COUNT(*) AS BIGINT) AS n_days
            FROM d GROUP BY 1
        """,
        "purchase_cadence_by_user": """
            WITH p AS (SELECT user_id, ts, event_id FROM events
                       WHERE event_type = 'purchase'),
            d AS (SELECT user_id,
                         CAST(epoch_us(ts) - LAG(epoch_us(ts))
                              OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS DOUBLE) AS g
                  FROM p),
            m AS (SELECT user_id, quantile_cont(g, 0.5) AS median_gap_us
                  FROM d WHERE g IS NOT NULL GROUP BY 1)
            SELECT u.user_id, m.median_gap_us
            FROM (SELECT DISTINCT user_id FROM p) u LEFT JOIN m USING (user_id)
        """,
        "theil_sen_by_user": """
            WITH f AS (SELECT user_id, ts, value FROM events
                       WHERE value IS NOT NULL),
            p AS (SELECT a.user_id,
                         (b.value - a.value)
                           / (epoch_us(b.ts) - epoch_us(a.ts))
                           * 3600000000.0 AS sl
                  FROM f a JOIN f b ON a.user_id = b.user_id AND a.ts < b.ts),
            m AS (SELECT user_id, ROUND(quantile_cont(sl, 0.5), 6) AS ts_slope
                  FROM p GROUP BY 1)
            SELECT u.user_id, m.ts_slope
            FROM (SELECT DISTINCT user_id FROM f) u LEFT JOIN m USING (user_id)
        """,
        "wau_sketch_daily": """
            WITH p AS (SELECT DISTINCT
                              CAST(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS BIGINT) AS day,
                              md5_number_lower(CAST(user_id AS VARCHAR)) AS hv
                       FROM events),
            days AS (SELECT DISTINCT day FROM p),
            u AS (SELECT d.day, pp.hv FROM days d
                  JOIN p pp ON pp.day BETWEEN d.day - 6 AND d.day
                  GROUP BY 1, 2),
            r AS (SELECT day, hv,
                         row_number() OVER (PARTITION BY day ORDER BY hv) AS rn,
                         COUNT(*) OVER (PARTITION BY day) AS n
                  FROM u)
            SELECT day,
                   CASE WHEN MAX(n) < 16 THEN CAST(MAX(n) AS DOUBLE)
                        ELSE ROUND(15.0 * 18446744073709551616.0
                                   / CAST(MAX(CASE WHEN rn = 16 THEN hv END)
                                          AS DOUBLE), 6)
                   END AS approx_active
            FROM r GROUP BY day
        """,
        "rollup_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 6) AS sum_qty,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "trimmed_mean_by_type": """
            WITH b AS (SELECT event_type,
                              quantile_cont(value, 0.05) AS lo,
                              quantile_cont(value, 0.95) AS hi
                       FROM events GROUP BY 1)
            SELECT e.event_type,
                   ROUND(AVG(e.value) FILTER (WHERE e.value BETWEEN b.lo AND b.hi),
                         6) AS trimmed_mean,
                   CAST(COUNT(*) FILTER (WHERE e.value BETWEEN b.lo AND b.hi)
                        AS BIGINT) AS n_kept
            FROM events e JOIN b USING (event_type)
            GROUP BY 1
        """,
        "crowding_10min_events": """
            SELECT event_id, ts, value,
                   CAST(COUNT(*) OVER w AS BIGINT) AS w_count,
                   ROUND(SUM(value) OVER w, 6) AS w_sum
            FROM events
            WINDOW w AS (ORDER BY ts
                         RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                               AND CURRENT ROW)
        """,
        "mad_value": """
            WITH v AS (SELECT value FROM events),
            n AS (SELECT COUNT(*) AS n FROM v),
            med AS (SELECT value AS m
                    FROM (SELECT value, row_number() OVER (ORDER BY value) AS rn
                          FROM v), n
                    WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1),
            d AS (SELECT ABS(value - m) AS av FROM v, med),
            n2 AS (SELECT COUNT(*) AS n FROM d),
            mad AS (SELECT av
                    FROM (SELECT av, row_number() OVER (ORDER BY av) AS rn
                          FROM d), n2
                    WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1)
            SELECT med.m AS median, mad.av AS mad FROM med, mad
        """,
        "fingerprint_docs": """
            -- collapse \\s+ BEFORE trimming: DuckDB trim() strips only
            -- spaces, but the engine's .str.strip() strips \\n/\\t/\\r
            -- too; collapsing first reduces any edge whitespace to one
            -- plain space, which trim then removes on both sides
            SELECT doc_id,
                   CAST(md5_number_lower(
                        trim(regexp_replace(lower(COALESCE(text, '')),
                                            '\\s+', ' ', 'g')))
                        % 1000000007 AS BIGINT) AS fp_mod
            FROM documents
        """,
        "caption_spam_images": """
            SELECT substr(COALESCE(text, ''), 1, 10) AS caption,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_images
            FROM documents GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 3
        """,
        "langid_docs": f"""
            WITH tok AS (
              SELECT doc_id,
                     lower(unnest(regexp_extract_all(COALESCE(text, ''),
                           '[a-zA-ZäöüßéèêàçñÁ-ÿ]+'))) AS t
              FROM documents),
            s AS (SELECT doc_id, COUNT(*) AS nt,
                         COUNT(*) FILTER (WHERE t IN ({{en}})) AS c_en,
                         COUNT(*) FILTER (WHERE t IN ({{de}})) AS c_de,
                         COUNT(*) FILTER (WHERE t IN ({{fr}})) AS c_fr,
                         COUNT(*) FILTER (WHERE t IN ({{es}})) AS c_es
                  FROM tok GROUP BY 1)
            SELECT d.doc_id,
                   CASE WHEN s.nt IS NULL OR s.nt = 0 THEN 'und'
                        WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0
                             THEN 'und'
                        WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es
                             THEN 'en'
                        WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
                        WHEN c_fr >= c_es THEN 'fr'
                        ELSE 'es' END AS lang_pred,
                   CASE WHEN s.nt IS NULL OR s.nt = 0 THEN 0.0
                        ELSE CAST(greatest(c_en, c_de, c_fr, c_es) AS DOUBLE)
                             / s.nt END AS lang_score
            FROM documents d LEFT JOIN s USING (doc_id)
        """.format(en=_sw("en"), de=_sw("de"), fr=_sw("fr"), es=_sw("es")),
        "last_touch_events": """
            WITH t AS (
              SELECT event_id, ts, user_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS pt,
                     epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM events)
            SELECT event_id, ts, user_id,
                   CASE WHEN gap IS NOT NULL AND gap <= 1800000000
                        THEN pt END AS touch_type
            FROM t WHERE event_type = 'purchase'
        """,
        "latest_snapshot_events": """
            SELECT event_id, ts, user_id, event_type, value FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) = 1
        """,
        "group_kfold_events": """
            WITH f AS (SELECT user_id,
                              md5_number_lower(CAST(user_id AS VARCHAR)) % 5 AS fold
                       FROM events)
            SELECT CAST(fold AS BIGINT) AS fold,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM f GROUP BY 1
        """,
        "seasonal_deviation_events": """
            WITH m AS (
              SELECT event_type,
                     CAST((((CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)) % 24) + 24) % 24 AS BIGINT) AS h,
                     ROUND(AVG(value), 6) AS baseline
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
            SELECT e.event_id, e.ts, e.event_type, e.value, m.baseline,
                   ROUND(e.value - m.baseline, 6) AS deviation
            FROM events e
            LEFT JOIN m ON m.event_type = e.event_type
                       AND m.h = CAST((((CAST(floor(epoch_us(e.ts) / 3600000000.0) AS BIGINT)) % 24) + 24) % 24 AS BIGINT)
        """,
        "psi_daily_value": """
            WITH ext AS (SELECT MIN(value) AS lo, MAX(value) AS hi
                         FROM events WHERE value IS NOT NULL),
            f AS (SELECT CAST(CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS BIGINT) AS day,
                         CAST(LEAST(FLOOR((value - lo) * 10 / (hi - lo)), 9)
                              AS BIGINT) AS b
                  FROM events, ext WHERE value IS NOT NULL),
            days AS (SELECT DISTINCT day FROM f),
            grid AS (SELECT d.day, g.b FROM days d
                     CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS b) g),
            c AS (SELECT grid.day, grid.b, COALESCE(cnt.n, 0) AS n
                  FROM grid LEFT JOIN (SELECT day, b, COUNT(*) AS n
                                       FROM f GROUP BY 1, 2) cnt
                  USING (day, b)),
            tot AS (SELECT day, SUM(n) AS t FROM c GROUP BY 1)
            SELECT cur.day,
                   ROUND(SUM(((cur.n + 0.5) / (tc.t + 5.0)
                              - (prev.n + 0.5) / (tp.t + 5.0))
                             * ln(((cur.n + 0.5) / (tc.t + 5.0))
                                  / ((prev.n + 0.5) / (tp.t + 5.0)))), 6) AS psi,
                   CAST(MIN(tp.t) AS BIGINT) AS n_ref,
                   CAST(MIN(tc.t) AS BIGINT) AS n_cur
            FROM c cur
            JOIN c prev ON prev.day = cur.day - 1 AND prev.b = cur.b
            JOIN tot tc ON tc.day = cur.day
            JOIN tot tp ON tp.day = cur.day - 1
            GROUP BY 1
        """,
        "source_token_share_docs": """
            WITH tok AS (SELECT source,
                                len(regexp_extract_all(lower(text), '\\w+')) AS n
                         FROM documents),
            s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tokens
                  FROM tok GROUP BY 1),
            t AS (SELECT SUM(tokens) AS tot FROM s)
            SELECT source, tokens,
                   ROUND(CAST(tokens AS DOUBLE) / tot, 6) AS share,
                   ROUND(CAST(SUM(tokens) OVER (ORDER BY tokens DESC, source)
                              AS DOUBLE) / tot, 6) AS cum_share
            FROM s, t
        """,
        "time_since_purchase_events": """
            SELECT event_id, ts, user_id, event_type,
                   epoch_us(ts) - MAX(CASE WHEN event_type = 'purchase'
                                           THEN epoch_us(ts) END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS us_since_purchase
            FROM events
        """,
        "pmi_pairs_docs": """
            WITH t AS (
              SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
              FROM documents),
            df AS (SELECT term, COUNT(*) AS n FROM t GROUP BY 1),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            p AS (SELECT a.term AS ta, b.term AS tb, COUNT(*) AS nab
                  FROM t a JOIN t b USING (doc_id)
                  WHERE a.term < b.term GROUP BY 1, 2)
            SELECT p.ta, p.tb, p.nab,
                   ROUND(ln(CAST(p.nab AS DOUBLE) * nd.n / (da.n * db.n)), 6) AS pmi
            FROM p, nd
            JOIN df da ON p.ta = da.term
            JOIN df db ON p.tb = db.term
            WHERE p.nab >= 5
            QUALIFY row_number() OVER (ORDER BY pmi DESC, p.ta, p.tb) <= 30
        """,
        "aspect_batches_images": """
            WITH img AS (SELECT doc_id AS image_id,
                                16 + (doc_id * 7) % 120 AS w,
                                16 + (doc_id * 13) % 120 AS h
                         FROM documents),
            b AS (SELECT image_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
                         CASE WHEN (w * 1000) // h < 500 THEN 0
                              WHEN (w * 1000) // h < 800 THEN 1
                              WHEN (w * 1000) // h < 1250 THEN 2
                              WHEN (w * 1000) // h < 2000 THEN 3
                              ELSE 4 END AS aspect_bucket
                  FROM img)
            SELECT image_id, w, h, CAST(aspect_bucket AS BIGINT) AS aspect_bucket,
                   CAST((row_number() OVER (PARTITION BY aspect_bucket
                                            ORDER BY image_id) - 1) // 16
                        AS BIGINT) AS batch_idx
            FROM b
        """,
        "twa_value_by_user": """
            WITH f AS (SELECT event_id, user_id, ts, value
                       FROM events WHERE value IS NOT NULL),
            d AS (SELECT user_id, value,
                         epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id))
                           - epoch_us(ts) AS w
                  FROM f)
            SELECT user_id, ROUND(SUM(value * w) / SUM(w), 6) AS twa
            FROM d WHERE w IS NOT NULL
            GROUP BY 1 HAVING SUM(w) > 0
        """,
        "throttle_6h_events": """
            WITH RECURSIVE keep AS (
              SELECT user_id, MIN(ts) AS ts FROM events GROUP BY user_id
              UNION ALL
              SELECT k.user_id,
                     (SELECT MIN(e.ts) FROM events e
                      WHERE e.user_id = k.user_id
                        AND epoch_us(e.ts) >= epoch_us(k.ts) + 21600000000) AS ts
              FROM keep k
              WHERE EXISTS (SELECT 1 FROM events e
                            WHERE e.user_id = k.user_id
                              AND epoch_us(e.ts) >= epoch_us(k.ts) + 21600000000)
            )
            -- QUALIFY: under duplicate (user_id, ts) the engine keeps
            -- exactly ONE row per kept timestamp (min event_id via the
            -- tiebreak); the bare join would fan out to every dup
            SELECT e.event_id, e.ts, e.user_id
            FROM keep JOIN events e USING (user_id, ts)
            QUALIFY row_number() OVER (PARTITION BY e.user_id, e.ts
                                       ORDER BY e.event_id) = 1
        """,
        "time_split_events": """
            SELECT event_id, ts,
                   CASE WHEN ts < TIMESTAMP '2024-02-13' THEN 'train'
                        ELSE 'test' END AS split
            FROM events
            WHERE ts < TIMESTAMP '2024-02-13' OR ts >= TIMESTAMP '2024-02-15'
        """,
        "rfm_features_events": """
            SELECT user_id, MAX(ts) AS last_ts,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(CASE WHEN event_type = 'purchase'
                                  THEN value ELSE 0 END), 6) AS monetary
            FROM events WHERE ts < TIMESTAMP '2024-02-01'
            GROUP BY 1
        """,
        "split_leakage_images": f"""
            WITH img AS (
              SELECT doc_id AS image_id,
                     md5_number_lower(CAST(doc_id % 97 AS VARCHAR)) AS phash,
                     CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) < {_split_bounds[0][1]}::UBIGINT THEN '{_split_bounds[0][0]}'
                          WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) < {_split_bounds[1][1]}::UBIGINT THEN '{_split_bounds[1][0]}'
                          ELSE '{_split_bounds[2][0]}' END AS split
              FROM documents)
            SELECT v.image_id, v.split FROM img v
            WHERE v.split <> 'train'
              AND EXISTS (SELECT 1 FROM img t
                          WHERE t.split = 'train' AND t.phash = v.phash)
        """,
        "heavy_hitters_docs": """
            WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS term
                         FROM documents)
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY 1 HAVING COUNT(*) >= 100
        """,
        "label_coherence_vecs": """
            WITH cent AS (
              SELECT label, u.i AS i, AVG(CAST(embedding[u.i] AS DOUBLE)) AS c
              FROM embeddings
              CROSS JOIN LATERAL (
                SELECT unnest(generate_series(1, len(embedding))) AS i) u
              GROUP BY 1, 2),
            s AS (
              SELECT e.vec_id, e.label,
                     SUM(CAST(e.embedding[c.i] AS DOUBLE) * c.c) AS dot,
                     SUM(CAST(e.embedding[c.i] AS DOUBLE)
                         * CAST(e.embedding[c.i] AS DOUBLE)) AS ne2,
                     SUM(c.c * c.c) AS nc2
              FROM embeddings e JOIN cent c USING (label)
              GROUP BY 1, 2)
            SELECT vec_id, label,
                   CASE WHEN ne2 = 0 OR nc2 = 0 THEN NULL
                        ELSE ROUND(dot / (sqrt(ne2) * sqrt(nc2)), 6)
                   END AS cos_centroid
            FROM s
        """,
        "source_overlap_docs": """
            WITH tok AS (SELECT source, regexp_extract_all(lower(text), '\\w+') AS t
                         FROM documents),
            sh AS (SELECT DISTINCT source,
                          md5_number_lower(array_to_string(t[i : i + 4], ' ')) AS h
                   FROM tok CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
                        CASE WHEN len(t) = 0 THEN 0
                             WHEN len(t) < 5 THEN 1
                             ELSE len(t) - 4 END)) AS i) g),
            tot AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1),
            inter AS (SELECT a.source AS source_a, b.source AS source_b,
                             COUNT(*) AS n_common
                      FROM sh a JOIN sh b USING (h)
                      WHERE a.source < b.source GROUP BY 1, 2)
            SELECT i.source_a, i.source_b, ta.n AS n_a, tb.n AS n_b, i.n_common,
                   ROUND(CAST(i.n_common AS DOUBLE) / (ta.n + tb.n - i.n_common), 6)
                     AS jaccard
            FROM inter i JOIN tot ta ON i.source_a = ta.source
                         JOIN tot tb ON i.source_b = tb.source
        """,
        "kmeans_step_embeddings": """
            WITH seeds AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                     CAST(embedding AS DOUBLE[]) AS c
              FROM (SELECT vec_id, embedding FROM embeddings
                    ORDER BY vec_id LIMIT 4)),
            d AS (
              SELECT e.vec_id, s.cid,
                     list_distance(CAST(e.embedding AS DOUBLE[]), s.c) AS dist
              FROM embeddings e CROSS JOIN seeds s),
            asg AS (
              SELECT vec_id, cid FROM d
              QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) = 1),
            cnt AS (SELECT cid, COUNT(*) AS n FROM asg GROUP BY 1),
            cent AS (
              SELECT a.cid, u.i - 1 AS dim,
                     ROUND(AVG(CAST(e.embedding[u.i] AS DOUBLE)), 6) AS centroid
              FROM asg a JOIN embeddings e USING (vec_id)
              CROSS JOIN LATERAL (
                SELECT unnest(generate_series(1, len(e.embedding))) AS i) u
              GROUP BY 1, 2)
            SELECT c.cid AS cluster, cnt.n, c.dim, c.centroid
            FROM cent c JOIN cnt USING (cid)
        """,
        "surprisal_events": """
            WITH t AS (
              SELECT event_id, ts, user_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_type
              FROM events),
            c AS (
              SELECT prev_type AS p, event_type AS c, COUNT(*) AS n
              FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT p, SUM(n) AS tot FROM c GROUP BY p)
            SELECT t.event_id, t.ts, t.user_id, t.event_type, t.prev_type,
                   CASE WHEN t.prev_type IS NULL THEN NULL
                        ELSE ROUND(-ln(CAST(c.n AS DOUBLE) / tot.tot), 6)
                   END AS surprisal
            FROM t
            LEFT JOIN c ON t.prev_type = c.p AND t.event_type = c.c
            LEFT JOIN tot ON t.prev_type = tot.p
        """,
        "caption_gate_images": """
            WITH img AS (
              SELECT doc_id AS image_id,
                     CAST(16 + (doc_id * 7) % 120 AS BIGINT) AS w,
                     CAST(16 + (doc_id * 13) % 120 AS BIGINT) AS h,
                     substr(COALESCE(text, ''), 1, 120) AS caption
              FROM documents),
            r AS (
              SELECT image_id, w, h,
                     len(regexp_extract_all(caption, '\\S+')) AS ntok,
                     length(regexp_replace(caption, '[^a-zA-Z0-9]', '', 'g')) AS nalnum,
                     length(caption) AS clen
              FROM img),
            g AS (
              SELECT image_id, w, h,
                     CASE WHEN w < 64 OR h < 64 THEN 'size'
                          WHEN GREATEST(w, h)::DOUBLE / LEAST(w, h) > 3.0 THEN 'aspect'
                          WHEN ntok < 2 OR ntok > 50 THEN 'tokens'
                          WHEN nalnum::DOUBLE / clen < 0.5 THEN 'alnum'
                     END AS drop_reason
              FROM r)
            SELECT image_id, w, h,
                   CAST(CASE WHEN drop_reason IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
                   drop_reason
            FROM g
        """,
        "embedding_int8": """
            WITH u AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                              generate_subscripts(embedding, 1) AS dim1
                       FROM embeddings),
            m AS (SELECT dim1, MIN(v) AS mn, MAX(v) AS mx FROM u GROUP BY dim1)
            SELECT u.vec_id, CAST(u.dim1 - 1 AS BIGINT) AS dim,
                   CASE WHEN m.mx = m.mn THEN 0
                        ELSE CAST(FLOOR((u.v - m.mn)
                             / ((m.mx - m.mn) / 255.0) + 0.5) AS BIGINT)
                   END AS q
            FROM u JOIN m USING (dim1)
        """,
        "cusum_value_by_user": """
            WITH t AS (
              SELECT CAST(FLOOR(
                       SUM(CAST(ROUND(value * 100, 0) AS BIGINT))::DOUBLE
                       / COUNT(value) + 0.5) AS BIGINT) AS tgt
              FROM events),
            d AS (
              SELECT event_id, ts, user_id, value,
                     CASE WHEN value IS NULL THEN 0
                          ELSE CAST(ROUND(value * 100, 0) AS BIGINT)
                               - (SELECT tgt FROM t) END AS dev
              FROM events),
            c AS (
              SELECT event_id, ts, user_id, value,
                     SUM(dev) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
              FROM d)
            SELECT event_id, ts, user_id, value,
                   CAST(cum - LEAST(0, MIN(cum) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING)) AS DOUBLE) / 100.0
                     AS value_cusum
            FROM c
        """,
        "history_seq_by_user": """
            WITH s AS (
              SELECT event_id,
                     list(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS hist
              FROM events)
            SELECT event_id, CAST(g.i AS BIGINT) AS pos, hist[g.i] AS prev_type
            FROM s CROSS JOIN LATERAL
                 (SELECT unnest(generate_series(1, len(hist))) AS i) g
        """,
        "contamination_rate_docs": """
            WITH ta AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
                        FROM documents WHERE doc_id % 2 = 0),
            tb AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
                   FROM documents WHERE doc_id % 2 = 1),
            ha AS (SELECT doc_id, md5_number_lower(array_to_string(t[i : i + 4], ' ')) AS h
                   FROM ta CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
                        CASE WHEN len(t) = 0 THEN 0
                             WHEN len(t) < 5 THEN 1
                             ELSE len(t) - 4 END)) AS i) g),
            da AS (SELECT DISTINCT doc_id, h FROM ha),
            hb AS (SELECT DISTINCT md5_number_lower(array_to_string(t[i : i + 4], ' ')) AS h
                   FROM tb CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
                        CASE WHEN len(t) = 0 THEN 0
                             WHEN len(t) < 5 THEN 1
                             ELSE len(t) - 4 END)) AS i) g)
            SELECT doc_id, COUNT(*) AS n_shingles,
                   ROUND(SUM(CASE WHEN h IN (SELECT h FROM hb) THEN 1 ELSE 0 END)
                         * 1.0 / COUNT(*), 6) AS contamination_rate
            FROM da GROUP BY doc_id
        """,
        "compact_stream_events": """
            WITH l AS (SELECT event_id, ts, user_id, event_type, value,
                              LAG(event_type) OVER w AS pt,
                              LAG(value) OVER w AS pv,
                              row_number() OVER w AS rn
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT event_id, ts, user_id, event_type, value
            FROM l
            WHERE rn = 1
               OR NOT ((event_type IS NOT DISTINCT FROM pt)
                       AND (value IS NOT DISTINCT FROM pv))
        """,
        "quantile_sketch_by_type": """
            WITH m AS (SELECT event_type, MIN(value) lo, MAX(value) hi,
                              COUNT(value) total
                       FROM events GROUP BY event_type HAVING COUNT(value) > 0),
                 b AS (SELECT e.event_type,
                              CAST(CASE WHEN m.hi > m.lo
                                        THEN LEAST(FLOOR((CAST(e.value AS DOUBLE) - m.lo) * 256 / (CAST(m.hi AS DOUBLE) - m.lo)), 255)
                                        ELSE 0 END AS BIGINT) AS bin
                       FROM events e JOIN m USING (event_type)
                       WHERE e.value IS NOT NULL),
                 c AS (SELECT event_type, bin, COUNT(*) n FROM b GROUP BY event_type, bin),
                 w AS (SELECT event_type, bin,
                              SUM(n) OVER (PARTITION BY event_type ORDER BY bin) cum
                       FROM c),
                 qs(q) AS (VALUES (0.5), (0.9)),
                 r AS (SELECT w.event_type, qs.q, MIN(w.bin) AS bin
                       FROM qs, w JOIN m USING (event_type)
                       WHERE w.cum >= GREATEST(1.0, CEILING(qs.q * m.total))
                       GROUP BY w.event_type, qs.q)
            SELECT r.event_type, r.q,
                   CASE WHEN m.hi > m.lo THEN CAST(m.lo AS DOUBLE) + (r.bin + 1) * (CAST(m.hi AS DOUBLE) - m.lo) / 256
                        ELSE m.lo END AS value
            FROM r JOIN m USING (event_type)
        """,
        "auc_value_purchase": """
            WITH s AS (SELECT value AS score,
                              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
                       FROM events WHERE value IS NOT NULL),
                 r AS (SELECT y,
                              RANK() OVER (ORDER BY score) + 
                              (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS ar
                       FROM s),
                 t AS (SELECT SUM(y)::BIGINT AS np,
                              SUM(1 - y)::BIGINT AS nn,
                              SUM(CASE WHEN y = 1 THEN ar END) AS sp FROM r)
            SELECT ROUND((sp - np * (np + 1) / 2.0) / (np::DOUBLE * nn), 6) AS auc,
                   np AS n_pos, nn AS n_neg
            FROM t
        """,
        "dedup_keep_longest": f"""
            WITH RECURSIVE
            toks AS ({_SQL_TOKS}),
            sh AS (
              SELECT doc_id, array_to_string(t[i : i + 4], ' ') AS s
              FROM toks {_SQL_SHINGLE_IDX}),
            dsh AS (SELECT DISTINCT doc_id, s FROM sh),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
              FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            p AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN cnt ca ON ca.doc_id = i.id_a JOIN cnt cb ON cb.doc_id = i.id_b
              WHERE i.c * 1.0 / (ca.n + cb.n - i.c) >= 0.7),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION SELECT id_b, id_a FROM p),
            cc(id, lab) AS (
                SELECT a, a FROM e
                UNION
                SELECT e.b, cc.lab FROM cc JOIN e ON cc.id = e.a
            ),
            labels AS (SELECT id, CAST(MIN(lab) AS BIGINT) AS cluster_id FROM cc GROUP BY id),
            scored AS (SELECT l.cluster_id, d.doc_id,
                              row_number() OVER (PARTITION BY l.cluster_id
                                                 ORDER BY d.n_chars DESC, d.doc_id) AS rn
                       FROM labels l JOIN documents d ON d.doc_id = l.id)
            SELECT doc_id FROM scored WHERE rn = 1
            UNION ALL
            SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM labels)
        """,
        "cluster_cap_docs": f"""
            WITH RECURSIVE
            toks AS ({_SQL_TOKS}),
            sh AS (
              SELECT doc_id, array_to_string(t[i : i + 4], ' ') AS s
              FROM toks {_SQL_SHINGLE_IDX}),
            dsh AS (SELECT DISTINCT doc_id, s FROM sh),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
              FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            p AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN cnt ca ON ca.doc_id = i.id_a JOIN cnt cb ON cb.doc_id = i.id_b
              WHERE i.c * 1.0 / (ca.n + cb.n - i.c) >= 0.7),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION SELECT id_b, id_a FROM p),
            cc(id, lab) AS (
                SELECT a, a FROM e
                UNION
                SELECT e.b, cc.lab FROM cc JOIN e ON cc.id = e.a
            ),
            labels AS (SELECT id, CAST(MIN(lab) AS BIGINT) AS cluster_id FROM cc GROUP BY id),
            scored AS (SELECT l.cluster_id, d.doc_id,
                              row_number() OVER (PARTITION BY l.cluster_id
                                                 ORDER BY d.n_chars DESC, d.doc_id) AS rn
                       FROM labels l JOIN documents d ON d.doc_id = l.id)
            SELECT doc_id FROM scored WHERE rn <= 2
            UNION ALL
            SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM labels)
        """,
        "funnel_vcp_30min": """
            WITH s AS (
              SELECT event_id, ts, user_id, event_type,
                     CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                    FROM events)),
            t1 AS (SELECT user_id, session_id, MIN(ts) AS ts1 FROM s
                   WHERE event_type = 'view' GROUP BY user_id, session_id),
            t2 AS (SELECT s.user_id, s.session_id, MIN(s.ts) AS ts2
                   FROM s JOIN t1 USING (user_id, session_id)
                   WHERE s.event_type = 'click' AND s.ts > t1.ts1
                   GROUP BY s.user_id, s.session_id),
            t3 AS (SELECT s.user_id, s.session_id, MIN(s.ts) AS ts3
                   FROM s JOIN t2 USING (user_id, session_id)
                   WHERE s.event_type = 'purchase' AND s.ts > t2.ts2
                   GROUP BY s.user_id, s.session_id)
            SELECT s.user_id, s.session_id, COUNT(*) AS n_events,
                   CASE WHEN MAX(t3.ts3) IS NOT NULL THEN 3
                        WHEN MAX(t2.ts2) IS NOT NULL THEN 2
                        WHEN MAX(t1.ts1) IS NOT NULL THEN 1
                        ELSE 0 END AS steps_reached
            FROM s LEFT JOIN t1 USING (user_id, session_id)
                   LEFT JOIN t2 USING (user_id, session_id)
                   LEFT JOIN t3 USING (user_id, session_id)
            GROUP BY s.user_id, s.session_id
        """,
        "new_vs_returning_daily": """
            WITH p AS (SELECT DISTINCT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, user_id
                       FROM events WHERE user_id IS NOT NULL),
                 f AS (SELECT user_id, MIN(day) AS first_day FROM p GROUP BY user_id)
            SELECT p.day,
                   SUM(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END) AS new_users,
                   SUM(CASE WHEN p.day = f.first_day THEN 0 ELSE 1 END) AS returning_users
            FROM p JOIN f USING (user_id) GROUP BY p.day
        """,
        "wau_daily": """
            WITH p AS (SELECT DISTINCT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day, user_id
                       FROM events WHERE user_id IS NOT NULL),
                 d AS (SELECT DISTINCT day FROM p)
            SELECT d.day, COUNT(DISTINCT p.user_id) AS wau
            FROM d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
        """,
        "will_purchase_7d": """
            SELECT event_id, ts, user_id, event_type,
                   COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 1 MICROSECOND FOLLOWING
                                        AND INTERVAL 7 DAY FOLLOWING),
                            0) AS will_purchase_7d
            FROM events
        """,
        "value_quantiles_sketch": """
            WITH m AS (SELECT MIN(value) lo, MAX(value) hi FROM events),
                 b AS (SELECT CAST(LEAST(FLOOR((value - m.lo) * 1024 / (m.hi - m.lo)),
                                         1023) AS BIGINT) AS bin
                       FROM events, m WHERE value IS NOT NULL),
                 c AS (SELECT bin, COUNT(*) n FROM b GROUP BY bin),
                 w AS (SELECT bin, SUM(n) OVER (ORDER BY bin) cum FROM c),
                 t AS (SELECT SUM(n) total FROM c),
                 qs(q) AS (VALUES (0.5), (0.9), (0.99)),
                 r AS (SELECT q, MIN(bin) AS bin FROM qs, w, t
                       WHERE w.cum >= GREATEST(1.0, CEILING(q * t.total)) GROUP BY q)
            SELECT q, m.lo + (bin + 1) * (m.hi - m.lo) / 1024 AS value FROM r, m
        """,
        "trend_by_user": """
            WITH t0 AS (SELECT MIN(epoch_us(ts)) AS v FROM events),
                 f AS (SELECT user_id,
                              (epoch_us(ts) - t0.v) / 3600000000.0 AS x,
                              value FROM events, t0)
            SELECT user_id, regr_count(value, x) AS n,
                   ROUND(regr_slope(value, x), 6) AS slope,
                   ROUND(regr_intercept(value, x), 6) AS intercept
            FROM f GROUP BY user_id
        """,
        "cume_dist_value": """
            WITH f AS (SELECT event_id, value FROM events WHERE value IS NOT NULL),
                 c AS (SELECT event_id, CUME_DIST() OVER (ORDER BY value) AS value_cume
                       FROM f)
            SELECT e.event_id, e.value, c.value_cume
            FROM events e LEFT JOIN c USING (event_id)
        """,
        "impute_median_by_type": """
            WITH e AS (SELECT event_id, event_type,
                              CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
                       FROM events),
                 m AS (SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
                       FROM e GROUP BY event_type)
            SELECT event_id, e.event_type, e.value,
                   COALESCE(e.value, m.med) AS value_imputed
            FROM e LEFT JOIN m USING (event_type)
        """,
        "decayed_sum_by_user": """
            WITH f AS (SELECT event_id, ts, user_id, value, epoch_us(ts) AS tu
                       FROM events WHERE value IS NOT NULL)
            SELECT event_id, ts, user_id, value,
                   ROUND(value
                   + COALESCE(exp(-1.9254088348887368e-10 * (tu - lag(tu, 1) OVER w)) * lag(value, 1) OVER w, 0)
                   + COALESCE(exp(-1.9254088348887368e-10 * (tu - lag(tu, 2) OVER w)) * lag(value, 2) OVER w, 0)
                   + COALESCE(exp(-1.9254088348887368e-10 * (tu - lag(tu, 3) OVER w)) * lag(value, 3) OVER w, 0)
                   + COALESCE(exp(-1.9254088348887368e-10 * (tu - lag(tu, 4) OVER w)) * lag(value, 4) OVER w, 0)
                   + COALESCE(exp(-1.9254088348887368e-10 * (tu - lag(tu, 5) OVER w)) * lag(value, 5) OVER w, 0)
                   + COALESCE(exp(-1.9254088348887368e-10 * (tu - lag(tu, 6) OVER w)) * lag(value, 6) OVER w, 0)
                   + COALESCE(exp(-1.9254088348887368e-10 * (tu - lag(tu, 7) OVER w)) * lag(value, 7) OVER w, 0), 6) AS value_decay_sum_8
            FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "table_diff_customer": """
            WITH a AS (SELECT c_custkey, c_name, c_acctbal FROM customer
                       WHERE c_custkey % 29 != 0),
                 b AS (SELECT c_custkey, c_name,
                              CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 1.0
                                   ELSE c_acctbal END AS c_acctbal
                       FROM customer WHERE c_custkey % 31 != 0),
                 j AS (SELECT a.c_custkey IS NOT NULL AS la,
                              b.c_custkey IS NOT NULL AS rb,
                              ((a.c_name IS NOT DISTINCT FROM b.c_name)
                               AND (a.c_acctbal IS NOT DISTINCT FROM b.c_acctbal)) AS eq
                       FROM a FULL JOIN b ON a.c_custkey = b.c_custkey),
                 s AS (SELECT SUM(CASE WHEN la THEN 1 ELSE 0 END) AS n_left,
                              SUM(CASE WHEN rb THEN 1 ELSE 0 END) AS n_right,
                              SUM(CASE WHEN la AND rb THEN 1 ELSE 0 END) AS n_both,
                              SUM(CASE WHEN la AND NOT rb THEN 1 ELSE 0 END) AS n_only_left,
                              SUM(CASE WHEN rb AND NOT la THEN 1 ELSE 0 END) AS n_only_right,
                              SUM(CASE WHEN la AND rb AND NOT eq THEN 1 ELSE 0 END) AS n_mismatch
                       FROM j)
            SELECT n_left, n_right, n_both, n_only_left, n_only_right, n_mismatch,
                   ROUND((n_both - n_mismatch) / CAST(n_both AS DOUBLE), 6) AS pass_rate
            FROM s
        """,
        "rolling_type_diversity": """
            SELECT event_id, ts, user_id, event_type,
                   COUNT(DISTINCT event_type) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS event_type_roll_nunique_4
            FROM events
        """,
        "promo_revenue_share": """
            WITH u AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                              * CAST(round(100 - l_discount * 100) AS BIGINT) AS rev,
                              (p_type LIKE 'PROMO%') AS promo
                       FROM lineitem, part
                       WHERE l_partkey = p_partkey
                         AND l_shipdate >= TIMESTAMP '1996-01-01'
                         AND l_shipdate <  TIMESTAMP '1996-07-01')
            SELECT 100.0 * SUM(CASE WHEN promo THEN rev ELSE 0 END) / SUM(rev) AS promo_share,
                   SUM(CASE WHEN promo THEN rev ELSE 0 END) / 10000.0 AS promo_rev,
                   SUM(rev) / 10000.0 AS total_rev
            FROM u
        """,
        "top_orders_building": """
            SELECT o_orderkey,
                   SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(100 - l_discount * 100) AS BIGINT)) / 10000.0 AS revenue,
                   o_orderdate
            FROM lineitem, orders, customer
            WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(100 - l_discount * 100) AS BIGINT)) DESC, o_orderkey
            LIMIT 10
        """,
        "phash_stream_prev": """
            WITH t AS (
              SELECT event_id, user_id, ts,
                     xor(md5_number_lower(user_id::VARCHAR),
                         (event_id % 16)::UBIGINT) AS h
              FROM events WHERE event_id % 3 = 0)
            SELECT event_id,
                   CAST(bit_count(xor(h, lag(h) OVER w)) AS DOUBLE) AS hamming_prev,
                   CAST(bit_count(xor(h, lag(h) OVER w)) <= 3 AS DOUBLE) AS is_near_prev
            FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "ks_drift_value": """
            WITH m AS (SELECT CAST(floor((epoch_us(MIN(ts)) + epoch_us(MAX(ts))) / 2.0) AS BIGINT) AS cut FROM events),
            s AS (SELECT value v, CASE WHEN epoch_us(ts) > m.cut THEN 1 ELSE 0 END side
                  FROM events, m WHERE value IS NOT NULL),
            c AS (SELECT v, SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) a,
                         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) b FROM s GROUP BY v),
            t AS (SELECT SUM(a)::DOUBLE na, SUM(b)::DOUBLE nb FROM c),
            cum AS (SELECT SUM(a) OVER (ORDER BY v) ca, SUM(b) OVER (ORDER BY v) cb FROM c)
            SELECT ROUND(MAX(ABS(ca / t.na - cb / t.nb)), 6) AS ks,
                   CAST(MAX(t.na) AS BIGINT) AS n_ref, CAST(MAX(t.nb) AS BIGINT) AS n_cur
            FROM cum, t
        """,
        "winsorize_by_type": """
            WITH b AS (SELECT event_type,
                              ROUND(quantile_cont(value, 0.05), 6) AS lo,
                              ROUND(quantile_cont(value, 0.95), 6) AS hi
                       FROM events GROUP BY event_type)
            SELECT event_id, e.event_type, e.value,
                   CASE WHEN e.value IS NULL THEN NULL
                        ELSE GREATEST(LEAST(e.value, b.hi), b.lo) END AS value_wins
            FROM events e JOIN b USING (event_type)
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                       * CAST(round(100 - l_discount*100) AS BIGINT)) / 10000.0 AS revenue
            FROM lineitem, orders, customer, supplier, nation, region
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '2002-01-01'
            GROUP BY n_name
        """,
        "moments_by_type": """
            SELECT event_type, COUNT(value) AS n,
                   ROUND(skewness(value), 6) AS skewness,
                   ROUND(kurtosis(value), 6) AS kurtosis
            FROM events GROUP BY event_type
        """,
        "mode_event_type_by_user": """
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                       FROM events WHERE event_type IS NOT NULL
                       GROUP BY user_id, event_type),
                 r AS (SELECT user_id, event_type, n,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY n DESC, event_type) AS rn
                       FROM c)
            SELECT user_id, event_type AS mode, n AS mode_count
            FROM r WHERE rn = 1
        """,
        "jaccard_clusters_docs": f"""
            WITH RECURSIVE
            toks AS ({_SQL_TOKS}),
            sh AS (
              SELECT doc_id, array_to_string(t[i : i + 4], ' ') AS s
              FROM toks {_SQL_SHINGLE_IDX}),
            dsh AS (SELECT DISTINCT doc_id, s FROM sh),
            cnt AS (SELECT doc_id, COUNT(*) AS n FROM dsh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
              FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            p AS (
              SELECT i.id_a, i.id_b
              FROM inter i JOIN cnt ca ON ca.doc_id = i.id_a JOIN cnt cb ON cb.doc_id = i.id_b
              WHERE i.c * 1.0 / (ca.n + cb.n - i.c) >= 0.7),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION SELECT id_b, id_a FROM p),
            cc(id, lab) AS (
                SELECT a, a FROM e
                UNION
                SELECT e.b, cc.lab FROM cc JOIN e ON cc.id = e.a
            )
            SELECT id, CAST(MIN(lab) AS BIGINT) AS cluster_id FROM cc GROUP BY id
        """,
        "label_centroids": """
            WITH u AS (SELECT label, unnest(embedding) AS e,
                              generate_subscripts(embedding, 1) AS dim1
                       FROM embeddings)
            SELECT label, CAST(dim1 - 1 AS BIGINT) AS dim,
                   ROUND(AVG(e), 6) AS mean_val
            FROM u GROUP BY label, dim1
        """,
        # shared bin expression with value_bins_events; +0.5 Laplace
        # smoothing keeps empty bins finite and the arithmetic mirrored
        "value_drift_psi": """
            WITH m AS (SELECT MIN(value) AS lo, MAX(value) AS hi,
                              CAST(floor((epoch_us(MIN(ts)) + epoch_us(MAX(ts))) / 2.0) AS BIGINT) AS cut
                       FROM events),
            t AS (SELECT CASE WHEN epoch_us(ts) > m.cut THEN 1 ELSE 0 END AS side,
                         CAST(LEAST(FLOOR((value - m.lo) * 10 / (m.hi - m.lo)), 9) AS BIGINT) AS b
                  FROM events, m WHERE value IS NOT NULL),
            c AS (SELECT b, SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS n0,
                         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n1
                  FROM t GROUP BY b),
            g AS (SELECT gs.b, COALESCE(c.n0, 0) AS n0, COALESCE(c.n1, 0) AS n1
                  FROM (SELECT unnest(range(0, 10)) AS b) gs LEFT JOIN c USING (b)),
            tot AS (SELECT SUM(n0)::DOUBLE AS t0, SUM(n1)::DOUBLE AS t1 FROM g)
            SELECT ROUND(SUM(((n0 + 0.5) / (t0 + 5.0) - (n1 + 0.5) / (t1 + 5.0))
                         * ln(((n0 + 0.5) / (t0 + 5.0)) / ((n1 + 0.5) / (t1 + 5.0)))), 6) AS psi,
                   CAST(MAX(t0) AS BIGINT) AS n_ref, CAST(MAX(t1) AS BIGINT) AS n_cur
            FROM g, tot
        """,
        "event_transitions": """
            WITH l AS (SELECT user_id, event_type,
                              LAG(event_type) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id) AS prev_type
                       FROM events)
            SELECT prev_type, event_type AS cur_type, COUNT(*) AS n
            FROM l WHERE prev_type IS NOT NULL
            GROUP BY prev_type, cur_type
        """,
        "cohort_retention_weekly": """
            WITH f AS (SELECT user_id, MIN(ts) AS fts FROM events GROUP BY user_id),
                 t AS (SELECT e.user_id,
                              CAST(floor(epoch_us(f.fts) / 604800000000.0) AS BIGINT) AS cohort,
                              CAST(floor(epoch_us(e.ts) / 604800000000.0) AS BIGINT)
                                - CAST(floor(epoch_us(f.fts) / 604800000000.0) AS BIGINT) AS period_offset
                       FROM events e JOIN f USING (user_id))
            SELECT cohort, period_offset,
                   COUNT(DISTINCT user_id) AS n_users
            FROM t GROUP BY cohort, period_offset
        """,
        "session_conversion_30min": """
            WITH s AS (
              SELECT event_id, ts, user_id, event_type,
                     CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                    FROM events)),
            f AS (
              SELECT *, MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id, session_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS saw_from
              FROM s)
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   CAST(MAX(CASE WHEN event_type = 'purchase' AND saw_from = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS converted
            FROM f GROUP BY user_id, session_id
        """,
        "expanding_stats_by_user": """
            SELECT event_id, ts, user_id, value,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS DOUBLE)
                     / COUNT(value) OVER w / 100.0 AS value_exp_mean,
                   FLOOR(STDDEV_SAMP(value) OVER w * 1000000 + 0.25) / 1000000 AS value_exp_std
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        "time_to_next_by_user": """
            SELECT event_id, ts, user_id,
                   CAST(lead(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts)
                        AS DOUBLE) AS time_to_next_us
            FROM events
        """,
        "target_encode_events": """
            WITH s AS (SELECT event_type, SUM(value) AS s, COUNT(value) AS c
                       FROM events GROUP BY event_type)
            SELECT e.event_id, e.event_type, e.value,
                   ROUND((s.s + 20.0 * (SELECT SUM(s) FROM s) / (SELECT SUM(c) FROM s))
                         / (s.c + 20.0), 6) AS value_te
            FROM events e JOIN s USING (event_type)
        """,
        "freq_encode_events": """
            SELECT e.event_id, e.event_type, c.c AS event_type_freq
            FROM events e JOIN (SELECT event_type, COUNT(*) AS c
                                FROM events GROUP BY event_type) c USING (event_type)
        """,
        # binning boundary expression is written IDENTICALLY here and in
        # equal_width_bin (same op order), so IEEE determinism makes every
        # assignment bit-exact with no rounding tolerance
        "value_bins_events": """
            WITH m AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
            SELECT event_id, value,
                   CASE WHEN value IS NULL THEN NULL
                        ELSE CAST(LEAST(FLOOR((value - m.lo) * 10 / (m.hi - m.lo)), 9) AS DOUBLE)
                   END AS value_bin
            FROM events, m
        """,
        "cross_type_user_events": """
            SELECT event_id, event_type, user_id,
                   CAST(md5_number_lower(event_type || '#' || CAST(user_id AS VARCHAR))
                        % 1000000 AS BIGINT) AS type_user_cross
            FROM events
        """,
        # pairwise-complete CORR over the trailing 8-row frame; 6dp
        # rounding reconciles DuckDB's incremental-merge covariance with
        # the engine's closed-form rolling sums
        "rolling_autocorr_by_user": """
            WITH l AS (SELECT event_id, user_id, ts, value,
                              LAG(value) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS value_lag_1
                       FROM events)
            SELECT event_id, user_id, ts, value, value_lag_1,
                   ROUND(CORR(value, value_lag_1) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 7 PRECEDING AND CURRENT ROW), 6) AS autocorr
            FROM l
        """,
        # rates are RE-DERIVED from the oracle's own counts (not copied
        # from the engine); the 10^6 integer decision grid makes every
        # per-row keep/drop replayable bit-for-bit
        "temperature_resample_docs": """
            WITH cnt AS (SELECT lang, COUNT(*)::DOUBLE AS c FROM documents GROUP BY lang),
                 w AS (SELECT lang, POWER(c / (SELECT SUM(c) FROM cnt), 0.3 - 1.0) AS w FROM cnt),
                 r AS (SELECT lang, CAST(ROUND(w / (SELECT MAX(w) FROM w) * 1000000, 0) AS BIGINT) AS rate_int FROM w)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN r USING (lang)
            WHERE CAST(md5_number_lower(CAST(d.doc_id AS VARCHAR) || 'tmp') % 1000000 AS BIGINT)
                  < r.rate_int
        """,
        # the composed training-mix pass: each CTE is the already-proven
        # oracle of one stage, chained (resample -> train split -> epoch
        # shuffle -> token-budget packing)
        "training_mix_docs": f"""
            WITH cnt AS (SELECT lang, COUNT(*)::DOUBLE AS c FROM documents GROUP BY lang),
                 w AS (SELECT lang, POWER(c / (SELECT SUM(c) FROM cnt), 0.5 - 1.0) AS w FROM cnt),
                 r AS (SELECT lang, CAST(ROUND(w / (SELECT MAX(w) FROM w) * 1000000, 0) AS BIGINT) AS rate_int FROM w),
                 mixed AS (
                   SELECT d.doc_id, d.lang, d.n_chars
                   FROM documents d JOIN r USING (lang)
                   WHERE CAST(md5_number_lower(CAST(d.doc_id AS VARCHAR) || 'mix') % 1000000 AS BIGINT)
                         < r.rate_int),
                 train AS (
                   SELECT * FROM mixed
                   WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) < {_split_bounds[0][1]}::UBIGINT),
                 shuf AS (
                   SELECT *, CAST(row_number() OVER (
                        ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || 'epoch0'),
                                 doc_id) - 1 AS BIGINT) AS pos
                   FROM train)
            SELECT doc_id, lang, n_chars, pos,
                   CAST(COALESCE(SUM(n_chars) OVER (ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       // 4096 AS BIGINT) AS chunk_id
            FROM shuf
        """,
        "phash_clusters_events": """
            WITH RECURSIVE
            t AS (SELECT event_id,
                         xor(md5_number_lower(user_id::VARCHAR),
                             (event_id % 16)::UBIGINT) AS h
                  FROM events WHERE event_id % 3 = 0),
            p AS (SELECT t1.event_id AS id_a, t2.event_id AS id_b
                  FROM t t1 JOIN t t2
                    ON t1.event_id < t2.event_id
                   AND bit_count(xor(t1.h, t2.h)) <= 3),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION SELECT id_b, id_a FROM p),
            cc(id, lab) AS (
                SELECT a, a FROM e
                UNION
                SELECT e.b, cc.lab FROM cc JOIN e ON cc.id = e.a
            )
            SELECT id, CAST(MIN(lab) AS BIGINT) AS cluster_id FROM cc GROUP BY id
        """,
        # KMV: k-th smallest md5 per group; same float expression as the
        # engine ((k-1)·2^64 / h_k) so the estimate replays bit-for-bit
        "approx_distinct_users": """
            WITH h AS (SELECT DISTINCT event_type,
                              md5_number_lower(CAST(user_id AS VARCHAR)) AS hv
                       FROM events),
                 r AS (SELECT event_type, hv,
                              row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
                              COUNT(*) OVER (PARTITION BY event_type) AS n
                       FROM h)
            SELECT event_type,
                   CASE WHEN MAX(n) < 16 THEN CAST(MAX(n) AS DOUBLE)
                        ELSE ROUND(15.0 * 18446744073709551616.0
                                   / CAST(MAX(CASE WHEN rn = 16 THEN hv END) AS DOUBLE), 6)
                   END AS approx_distinct
            FROM r GROUP BY event_type
        """,
        "resample_1h_by_user": """
            WITH st AS (SELECT user_id, ts, MAX(value) AS v
                        FROM events GROUP BY user_id, ts),
                 b AS (SELECT user_id, MIN(ts) AS lo, MAX(ts) AS hi
                       FROM events GROUP BY user_id),
                 grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ts
                          FROM b)
            SELECT g.user_id, g.ts, s.v AS value
            FROM grid g ASOF LEFT JOIN st s
              ON g.user_id = s.user_id AND g.ts >= s.ts
        """,
        # W=48, stride=40; DuckDB list slice is 1-based inclusive, so
        # 0-based token window [c*40, min(c*40+48, n)) maps to
        # toks[c*40+1 : least(c*40+48, n)]
        "chunk_docs": r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                       FROM documents),
                 n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
                 c AS (SELECT doc_id, toks, n,
                              unnest(range(0, CASE WHEN n <= 48 THEN 1
                                   ELSE 1 + CAST(ceil((n - 48) / 40.0) AS BIGINT) END)) AS chunk_idx
                       FROM n)
            SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   array_to_string(toks[chunk_idx * 40 + 1 : least(chunk_idx * 40 + 48, n)], ' ')
                     AS chunk_text
            FROM c
        """,
        # doc scores -> per-source AVG rounded to 6dp on BOTH sides
        # before the threshold, so summation-order ulp cannot flip a
        # source verdict
        "source_filter_docs": r"""
            WITH toks AS (
                SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
                FROM documents),
            wc AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w),
            agg AS (SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct
                    FROM wc GROUP BY doc_id),
            src AS (
                SELECT d.source,
                       ROUND(AVG(CAST(a.n_distinct AS DOUBLE) / a.n_words), 6) AS m
                FROM documents d LEFT JOIN agg a USING (doc_id)
                GROUP BY d.source)
            SELECT d.doc_id, d.source
            FROM documents d JOIN src USING (source)
            WHERE src.m >= 0.5
        """,
        "minmax_by_user": """
            SELECT e.event_id, e.user_id, e.value,
                   ROUND((CAST(e.value AS DOUBLE) - s.lo) / NULLIF(CAST(s.hi AS DOUBLE) - s.lo, 0), 6) AS value_mm
            FROM events e JOIN (
              SELECT user_id, MIN(value) AS lo, MAX(value) AS hi
              FROM events GROUP BY user_id) s USING (user_id)
        """,
        "zscore_by_user": """
            SELECT e.event_id, e.user_id, e.value,
                   ROUND(CASE WHEN s.std > 0 THEN (e.value - s.mean) / s.std END, 6) AS value_z
            FROM events e JOIN (
              SELECT user_id, AVG(value) AS mean, STDDEV_POP(value) AS std
              FROM events GROUP BY user_id) s USING (user_id)
        """,
        "value_quantiles": """
            WITH s AS (
              SELECT value, row_number() OVER (ORDER BY value) - 1 AS rn,
                     COUNT(*) OVER () AS n
              FROM events WHERE value IS NOT NULL)
            SELECT CAST(q AS DOUBLE) AS q, value
            FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9), (0.99)) AS qs(q)
            JOIN s ON s.rn = CAST(FLOOR(CAST(q AS DOUBLE) * (s.n - 1)) AS BIGINT)
        """,
        "top_terms_50": """
            SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS term FROM documents)
            GROUP BY term ORDER BY cnt DESC, term LIMIT 50
        """,
        # epoch_us keeps the time deltas in int64 microseconds — the
        # same doubles the engine divides, so the interpolation is
        # bit-identical before the shared round
        "interp_value": """
            SELECT event_id, ts, user_id, value,
                   ROUND(CASE WHEN value IS NOT NULL THEN value
                              WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                                prev_v + ((next_v - prev_v) * CAST(epoch_us(ts) - prev_t AS DOUBLE))
                                         / CAST(next_t - prev_t AS DOUBLE)
                         END, 6) AS value_interp
            FROM (
              SELECT event_id, ts, user_id, value,
                     LAST_VALUE(value IGNORE NULLS) OVER wp AS prev_v,
                     LAST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER wp AS prev_t,
                     FIRST_VALUE(value IGNORE NULLS) OVER wn AS next_v,
                     FIRST_VALUE(CASE WHEN value IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS) OVER wn AS next_t
              FROM events
              WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     wn AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        """,
        "top3_events_by_user": """
            SELECT event_id, ts, user_id, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                         ORDER BY value DESC, event_id) AS rn
              FROM events)
            WHERE rn <= 3
        """,
        "tfidf_docs": """
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
            df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            s AS (SELECT doc_id, SUM(tf * ln(n.n / df.df)) AS sc
                  FROM tf JOIN df USING (term) CROSS JOIN n GROUP BY doc_id)
            SELECT d.doc_id, ROUND(COALESCE(s.sc, 0), 6) AS tfidf_sum
            FROM documents d LEFT JOIN s USING (doc_id)
        """,
        "embedding_cov": """
            WITH pairs AS (
              SELECT a.i AS i, b.i AS j
              FROM range(64) a(i), range(64) b(i) WHERE a.i <= b.i)
            SELECT p.i, p.j,
                   ROUND(AVG(CAST(embedding[p.i + 1] AS DOUBLE) * CAST(embedding[p.j + 1] AS DOUBLE))
                         - AVG(CAST(embedding[p.i + 1] AS DOUBLE)) * AVG(CAST(embedding[p.j + 1] AS DOUBLE)),
                         6) AS cov
            FROM embeddings, pairs p GROUP BY p.i, p.j
        """,
        "running_sum_value": """
            SELECT event_id, ts,
                   CAST(COALESCE(FLOOR(value * 1000), 0) AS BIGINT) AS value_mil,
                   CAST(SUM(CAST(COALESCE(FLOOR(value * 1000), 0) AS BIGINT))
                       OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_mil
            FROM events
        """,
        "row_index_events": """
            SELECT event_id, ts,
                   ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS row_idx
            FROM events
        """,
        "pack_chunks_docs": """
            SELECT doc_id, n_chars,
                   CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       // 8192 AS BIGINT) AS chunk_id
            FROM documents
        """,
        "join_orders_customer": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_acctbal
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "left_join_orders_customer": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_acctbal
            FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000)
            ON o_custkey = c_custkey
        """,
        "full_join_orders_customer": """
            SELECT CAST(o_orderkey AS DOUBLE) AS o_orderkey,
                   COALESCE(o.o_custkey, c.c_custkey) AS o_custkey,
                   o_totalprice, c_name, c_acctbal
            FROM (SELECT * FROM orders WHERE o_orderkey & 7 = 0) o
            FULL JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
              ON o.o_custkey = c.c_custkey
        """,
        "hourly_event_stats": """
            SELECT CAST(to_timestamp((CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)) * 3600000000 / 1e6)
                        AS TIMESTAMP) AS bucket_start,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 6) AS sum_v,
                   MAX(value) AS max_v
            FROM events GROUP BY 1
        """,
        "ohlc_hourly_by_user": """
            WITH b AS (
              SELECT user_id,
                     CAST(to_timestamp((CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT)) * 3600000000 / 1e6)
                          AS TIMESTAMP) AS bucket_start,
                     ts, event_id, value
              FROM events),
            r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY user_id, bucket_start
                                        ORDER BY ts, event_id) AS rn_a,
                     row_number() OVER (PARTITION BY user_id, bucket_start
                                        ORDER BY ts DESC, event_id DESC) AS rn_d
              FROM b)
            SELECT user_id, bucket_start,
                   MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
                   MAX(value) AS high_v,
                   MIN(value) AS low_v,
                   MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
                   COUNT(*) AS n
            FROM r GROUP BY 1, 2
        """,
        "distinct_users_by_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY 1
        """,
        "event_type_pivot": """
            SELECT user_id,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
                   SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
                   SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view
            FROM events GROUP BY 1
        """,
        "value_histogram_events": """
            WITH b AS (
                SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin
                FROM events WHERE value >= 0 AND value < 500 AND value IS NOT NULL
            )
            SELECT g.bin, g.bin * 25.0 AS bin_lo, COALESCE(c.n, 0) AS count
            FROM (SELECT UNNEST(RANGE(20)) AS bin) g
            LEFT JOIN (SELECT bin, COUNT(*) AS n FROM b GROUP BY 1) c USING (bin)
        """,
        "cumulative_events_by_user": """
            SELECT event_id, ts, user_id,
                   CAST(COALESCE(FLOOR(value * 1000), 0) AS BIGINT) AS value_mil,
                   CAST(SUM(CAST(COALESCE(FLOOR(value * 1000), 0) AS BIGINT)) OVER w AS BIGINT)
                       AS value_mil_cumsum,
                   CAST(MAX(CAST(COALESCE(FLOOR(value * 1000), 0) AS BIGINT)) OVER w AS BIGINT)
                       AS value_mil_cummax,
                   ROW_NUMBER() OVER w AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        "rolling_median_4": """
            SELECT event_id, ts, user_id, value,
                   ROUND(MEDIAN(value) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
                         6) AS value_roll_median_4
            FROM events
        """,
        "value_ranks_by_user": """
            SELECT event_id, ts, user_id, value,
                   RANK() OVER w AS value_rank,
                   DENSE_RANK() OVER w AS value_dense_rank,
                   ROUND(PERCENT_RANK() OVER w, 6) AS value_pct_rank
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value)
        """,
        "ewm_value_by_user": """
            WITH t AS (
                SELECT event_id, ts, user_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events WHERE value IS NOT NULL
            )
            SELECT a.event_id, a.ts, a.user_id, a.value,
                   CAST(FLOOR(SUM(b.value * POWER(0.7, a.rn - b.rn)
                              * CASE WHEN b.rn = 1 THEN 1.0 ELSE 0.3 END) * 1e6
                              + 0.112233445566)
                        AS BIGINT) AS value_ewm_micro
            FROM t a JOIN t b ON a.user_id = b.user_id AND b.rn <= a.rn
            GROUP BY a.event_id, a.ts, a.user_id, a.value
        """,
        "unpivot_lineitem": """
            SELECT l_orderkey, l_linenumber,
                   'l_quantity' AS measure, CAST(l_quantity AS DOUBLE) AS val
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
            FROM lineitem
        """,
        "sample3_docs_per_lang": """
            SELECT doc_id, lang, n_chars FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY lang
                ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR) || 's1') DESC,
                         doc_id) <= 3
        """,
        "json_extract_props": """
            SELECT event_id, props,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "top_bigrams_30": """
            WITH t AS (SELECT regexp_extract_all(lower(text), '\\w+') AS toks
                       FROM documents),
            g AS (SELECT toks[i] || ' ' || toks[i+1] AS term FROM t
                  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(toks)-1)) AS i) u
                  WHERE len(toks) >= 2)
            SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM g
            GROUP BY 1 ORDER BY cnt DESC, term LIMIT 30
        """,
        "value_ntile4_by_user": """
            SELECT event_id, user_id, value,
                   NTILE(4) OVER (PARTITION BY user_id
                                  ORDER BY value, event_id) AS value_ntile
            FROM events
        """,
        "except_customers": """
            SELECT c_custkey AS custkey FROM customer
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderkey & 3 = 0
        """,
        "intersect_customers": """
            SELECT c_custkey AS custkey FROM customer
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderkey & 3 = 0
        """,
        "explode_embeddings": """
            SELECT vec_id, u.i - 1 AS dim,
                   ROUND(CAST(embedding[u.i] AS DOUBLE), 6) AS component
            FROM embeddings
            CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
        """,
        "value_quantiles_by_type": """
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.5), 6) AS value_p50,
                   ROUND(quantile_cont(value, 0.9), 6) AS value_p90
            FROM events GROUP BY 1
        """,
        "dup_clusters_chain": """
            WITH RECURSIVE
            p AS (SELECT doc_id AS id_a, doc_id - 1 AS id_b FROM documents
                  WHERE n_chars % 5 = 0 AND doc_id > 0),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION SELECT id_b, id_a FROM p),
            cc(id, lab) AS (
                SELECT a, a FROM e
                UNION
                SELECT e.b, cc.lab FROM cc JOIN e ON cc.id = e.a
            )
            SELECT id, CAST(MIN(lab) AS BIGINT) AS cluster_id FROM cc GROUP BY id
        """,
        "contaminated_docs": """
            WITH ta AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
                        FROM documents WHERE doc_id % 2 = 0),
            tb AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
                   FROM documents WHERE doc_id % 2 = 1),
            ha AS (SELECT doc_id, md5_number_lower(array_to_string(t[i : i + 4], ' ')) AS h
                   FROM ta CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
                        CASE WHEN len(t) = 0 THEN 0
                             WHEN len(t) < 5 THEN 1
                             ELSE len(t) - 4 END)) AS i) g),
            hb AS (SELECT DISTINCT md5_number_lower(array_to_string(t[i : i + 4], ' ')) AS h
                   FROM tb CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
                        CASE WHEN len(t) = 0 THEN 0
                             WHEN len(t) < 5 THEN 1
                             ELSE len(t) - 4 END)) AS i) g)
            SELECT DISTINCT doc_id FROM ha WHERE h IN (SELECT h FROM hb)
        """,
        "parse_datetime_strings": """
            SELECT event_id,
                   date_trunc('second', ts) AS ts_iso,
                   date_trunc('second', ts) AS ts_us
            FROM events
        """,
        "robust_value_by_user": """
            WITH s AS (
                SELECT user_id,
                       quantile_cont(CAST(value AS DOUBLE), 0.25) AS q25,
                       quantile_cont(CAST(value AS DOUBLE), 0.50) AS q50,
                       quantile_cont(CAST(value AS DOUBLE), 0.75) AS q75
                FROM events GROUP BY 1
            )
            SELECT e.event_id, e.user_id, e.value,
                   CAST(FLOOR((CAST(e.value AS DOUBLE) - s.q50) / NULLIF(s.q75 - s.q25, 0) * 1e6
                              + 0.112233445566) AS BIGINT)
                       AS value_robust_micro
            FROM events e LEFT JOIN s USING (user_id)
        """,
        "hopping_hourly_15min": """
            WITH r AS (
                SELECT value,
                       CAST(to_timestamp(((CAST(floor(epoch_us(ts) / 900000000.0) AS BIGINT)) * 900000000
                                          - o.j * 900000000) / 1e6) AS TIMESTAMP)
                           AS window_start
                FROM events
                CROSS JOIN LATERAL (SELECT unnest(range(4)) AS j) o
            )
            SELECT window_start, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_v
            FROM r GROUP BY 1
        """,
        "sink_roundtrip_events": """
            SELECT event_id, ts, user_id, value FROM events
        """,
        # Gopher-style repetition quality signals. Tokenizer parity: the
        # Ray stage uses Python \\w+ over lowered text; documents are
        # ASCII-only so RE2 \\w+ in DuckDB matches identically. Fractions
        # are exact IEEE divisions of integer counts on both sides.
        "gopher_quality_docs": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\w+')) AS w,
                       generate_subscripts(regexp_extract_all(lower(text), '\w+'), 1) AS pos
                FROM documents
            ),
            wc AS (
                SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w
            ),
            agg AS (
                SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct,
                       MAX(c) AS top_c,
                       SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ
                FROM wc GROUP BY doc_id
            ),
            bg AS (
                SELECT doc_id,
                       w || ' ' || LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS g
                FROM toks
            ),
            bgc AS (
                SELECT doc_id, g, COUNT(*) AS c FROM bg WHERE g IS NOT NULL GROUP BY doc_id, g
            ),
            bga AS (
                SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bc FROM bgc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_words, 0) AS n_words,
                   CAST(a.n_distinct AS DOUBLE) / a.n_words AS distinct_word_frac,
                   CAST(a.top_c AS DOUBLE) / a.n_words AS top_word_frac,
                   CAST(a.dup_occ AS DOUBLE) / a.n_words AS dup_word_frac,
                   CAST(b.top_bc AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
                   COALESCE(
                       CAST(a.top_c AS DOUBLE) / a.n_words <= 0.10
                       AND CAST(a.dup_occ AS DOUBLE) / a.n_words <= 0.85
                       AND NOT (CAST(b.top_bc AS DOUBLE) / b.n_bigrams > 0.20),
                       FALSE) AS keep
            FROM documents d
            LEFT JOIN agg a USING (doc_id)
            LEFT JOIN bga b USING (doc_id)
        """,
        "bm25_docs": """
            WITH q AS (SELECT unnest(['hash', 'join', 'stream', 'window']) AS term),
            toks AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
              FROM documents),
            dl AS (
              SELECT d.doc_id, CAST(COUNT(t.term) AS DOUBLE) AS dl
              FROM documents d LEFT JOIN toks t USING (doc_id) GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            avgdl AS (SELECT SUM(dl) / (SELECT n FROM n) AS avgdl FROM dl),
            df AS (
              SELECT q.term, CAST(COUNT(DISTINCT t.doc_id) AS DOUBLE) AS df
              FROM q LEFT JOIN toks t ON t.term = q.term GROUP BY 1),
            tf AS (
              SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf
              FROM toks t JOIN q ON t.term = q.term GROUP BY 1, 2),
            sc AS (
              SELECT tf.doc_id,
                     SUM(ln(1 + ((SELECT n FROM n) - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf * (1.2 + 1.0)
                         / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                                           / (SELECT avgdl FROM avgdl)))) AS s
              FROM tf JOIN df USING (term) JOIN dl USING (doc_id) GROUP BY 1)
            SELECT d.doc_id, ROUND(COALESCE(sc.s, 0), 6) AS bm25
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        "calendar_features_events": """
            SELECT event_id,
                   EXTRACT(hour FROM ts)::BIGINT AS hour,
                   isodow(ts)::BIGINT AS dow,
                   sin(2 * pi() * EXTRACT(hour FROM ts) / 24) AS hour_sin,
                   cos(2 * pi() * EXTRACT(hour FROM ts) / 24) AS hour_cos,
                   sin(2 * pi() * isodow(ts) / 7) AS dow_sin,
                   cos(2 * pi() * isodow(ts) / 7) AS dow_cos,
                   CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS is_weekend
            FROM events
        """,
        "volume_bars_by_user": """
            WITH q AS (
              SELECT user_id, ts, event_id, value,
                     CAST(FLOOR(COALESCE(ABS(value), 0) * 1000 + 0.5) AS BIGINT) AS volmil
              FROM events),
            o AS (
              SELECT *, COALESCE(SUM(volmil) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
              FROM q),
            b AS (
              SELECT *, pfx // 250000 AS bar_id,
                     row_number() OVER (PARTITION BY user_id, pfx // 250000
                                        ORDER BY ts, event_id) AS rn_a,
                     row_number() OVER (PARTITION BY user_id, pfx // 250000
                                        ORDER BY ts DESC, event_id DESC) AS rn_d
              FROM o)
            SELECT user_id, bar_id,
                   MAX(CASE WHEN rn_a = 1 THEN ts END) AS bar_start_ts,
                   MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
                   MAX(value) AS high_v, MIN(value) AS low_v,
                   MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
                   CAST(SUM(volmil) AS DOUBLE) / 1000.0 AS volume,
                   COUNT(*) AS n
            FROM b GROUP BY 1, 2
        """,
        "feature_hash_type_by_user": """
            SELECT user_id,
                   CAST(md5_number_lower(event_type) % 8 AS BIGINT) AS fh_bucket,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "mase_by_user": """
            WITH q AS (
              SELECT user_id, ts, event_id,
                     CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vmil
              FROM events),
            l AS (
              SELECT user_id, vmil,
                     lag(vmil, 1)  OVER w AS l1,
                     lag(vmil, 24) OVER w AS l24,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            a AS (
              SELECT user_id, n,
                     SUM(ABS(vmil - l1))  AS sd, COUNT(ABS(vmil - l1))  AS cd,
                     SUM(ABS(vmil - l24)) AS sn, COUNT(ABS(vmil - l24)) AS cn
              FROM l GROUP BY 1, 2)
            SELECT user_id,
                   (CAST(sn AS DOUBLE) * cd) / (CAST(sd AS DOUBLE) * cn) AS mase,
                   CAST(sn AS DOUBLE) / cn / 1000.0 AS seasonal_mae,
                   CAST(sd AS DOUBLE) / cd / 1000.0 AS naive_mae, n
            FROM a
            WHERE n > 24 AND cd > 0 AND cn > 0 AND sd <> 0
        """,
        "cusum_changepoint_by_user": """
            WITH q AS (
              SELECT user_id, ts, event_id, value,
                     CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vmil
              FROM events),
            s AS (
              SELECT user_id, ts, vmil,
                     SUM(vmil) OVER w AS cs,
                     row_number() OVER w AS k,
                     SUM(vmil) OVER (PARTITION BY user_id) AS stot,
                     COUNT(*) OVER (PARTITION BY user_id) AS n,
                     COUNT(CASE WHEN value IS NULL THEN 1 END)
                       OVER (PARTITION BY user_id) AS nnull
              FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            d AS (
              SELECT user_id, ts, k, n, ABS(n * cs - k * stot) AS keyint
              FROM s WHERE n >= 8 AND nnull = 0),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY keyint DESC, k ASC) AS rn
              FROM d)
            SELECT user_id, ts AS cp_ts, CAST(k AS BIGINT) AS cp_index,
                   CAST(keyint AS DOUBLE) / (n * 1000.0) AS s_max, n
            FROM r WHERE rn = 1
        """,
        "residual_q90_by_user": """
            WITH r AS (
              SELECT user_id,
                     ABS(value - AVG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS resid
              FROM events)
            SELECT user_id, ROUND(quantile_cont(resid, 0.9), 6) AS resid_q90,
                   COUNT(resid) AS n_resid
            FROM r WHERE resid IS NOT NULL GROUP BY 1
        """,
        "grid_ffill_1h_by_user": """
            WITH b AS (
              SELECT user_id, MIN(epoch_us(ts)) AS fmin, MAX(epoch_us(ts)) AS fmax
              FROM events GROUP BY 1),
            g AS (
              SELECT user_id, gs * 3600000000 AS gus
              FROM b, LATERAL unnest(generate_series(
                     CAST(ceil(fmin / 3600000000.0) AS BIGINT), CAST(floor(fmax / 3600000000.0) AS BIGINT))) AS t(gs)),
            u AS (
              SELECT user_id, epoch_us(ts) AS tsu, event_id, value, 0 AS is_grid FROM events
              UNION ALL
              SELECT user_id, gus, NULL, NULL, 1 FROM g),
            f AS (
              SELECT user_id, tsu, is_grid,
                     (last_value(CASE WHEN is_grid = 0 THEN {'v': value} END IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY tsu, is_grid, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v AS v
              FROM u)
            SELECT user_id, make_timestamp(tsu) AS ts_grid, v AS value_ffill
            FROM f WHERE is_grid = 1
        """,
    }
