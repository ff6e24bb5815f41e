"""Stateful streaming window stage — ST3's actor-pool form.

The bucket pass (``window_features``) is the batch/scale path: one
shuffle, whole entities per task. This module is the STREAMING form
the north rule names: a ``map_batches`` actor that carries per-entity
window state ACROSS batches — last timestamp, session counter, a
trailing deque of values, the previous ``k`` values for lags — so
ordered data can flow through in arbitrary batch sizes without ever
co-locating an entity's full history.

Ordering contract (documented partitioning assumption): the actor
assumes its input stream is ``(entity, ts)``-sorted and that each
entity's rows all pass through the SAME actor in order. In local
single-partition use that means ``concurrency=1``; on a cluster you
run one such actor per entity-range partition (the output of the
canonical ``sort([entity, ts])`` range partitioning, e.g. one
``StreamingWindowState`` pool instance per ``ds.split(...)`` shard)
— exactly how a keyed streaming operator shards state. Batch
boundaries are safe because the state dict carries the tail of the
previous batch.

Restart semantics: Ray Data restarts a died map actor FRESH and
re-runs only the lost/pending blocks — it does NOT replay the
partition from its start, so a restarted actor would silently compute
lags/sessions from empty state. The stage therefore pins
``max_restarts=0`` on its actors: an actor death fails the job loudly
(re-run it end-to-end; the input is immutable), never produces
silently wrong window values. Checkpoint/resume at the JOB level lives
in ``state/lineage.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import ray.data


class StreamingWindowState:
    """Carry-across-batches window state per entity.

    Emits, per row: ``{col}_lag_{k}`` for each requested lag,
    ``{col}_roll_mean_{w}`` / ``{col}_roll_sum_{w}`` over the trailing
    ``w`` rows, and ``session_id`` (gap-based) — all computed with at
    most ``max(lags, windows)`` rows of per-entity state, never the
    full history.
    """

    def __init__(
        self,
        id_col: str,
        time_col: str,
        value_cols: Sequence[str],
        lags: Sequence[int] = (),
        windows: Sequence[int] = (),
        session_gap=None,
    ):
        self.id_col, self.time_col = id_col, time_col
        self.value_cols = list(value_cols)
        self.lags = sorted(set(int(k) for k in lags))
        self.windows = sorted(set(int(w) for w in windows))
        self.session_gap = session_gap
        self.keep = max([*(k for k in self.lags), *(w - 1 for w in self.windows), 0])
        # entity -> {"tail": {col: np.ndarray}, "last_ts": scalar, "session": int}
        self.state: dict = {}

    def _gap_value(self):
        g = self.session_gap
        if isinstance(g, pd.Timedelta):
            return np.timedelta64(g.to_timedelta64())
        return g

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_cols: dict[str, list] = {
            **{f"{c}_lag_{k}": [] for c in self.value_cols for k in self.lags},
            **{f"{c}_roll_{s}_{w}": [] for c in self.value_cols for w in self.windows for s in ("sum", "mean")},
        }
        if self.session_gap is not None:
            out_cols["session_id"] = []
        gap = self._gap_value() if self.session_gap is not None else None

        ids = batch[self.id_col].to_numpy()
        ts = batch[self.time_col].to_numpy()
        vals = {c: batch[c].to_numpy(dtype=np.float64) for c in self.value_cols}

        # process per entity-run within the batch (vectorized per run),
        # stitching the carried tail in front of each run
        from .grouped import entity_segments

        segs = entity_segments(ids)
        for s, e in zip(segs[:-1], segs[1:]):
            ent = ids[s]
            st = self.state.get(ent)
            if st is None:
                st = {"tail": {c: np.array([], dtype=np.float64) for c in self.value_cols},
                      "last_ts": None, "session": 0}
            run_ts = ts[s:e]
            if self.session_gap is not None:
                breaks = np.zeros(e - s, dtype=np.int64)
                if st["last_ts"] is not None:
                    breaks[0] = 1 if (run_ts[0] - st["last_ts"]) > gap else 0
                if e - s > 1:
                    breaks[1:] = (run_ts[1:] - run_ts[:-1] > gap).astype(np.int64)
                sess = st["session"] + np.cumsum(breaks)
                out_cols["session_id"].extend(sess.tolist())
                st["session"] = int(sess[-1])
            for c in self.value_cols:
                tail = st["tail"][c]
                v = np.concatenate([tail, vals[c][s:e]])
                off = len(tail)
                n = e - s
                for k in self.lags:
                    idx = np.arange(off, off + n) - k
                    lag = np.where(idx >= 0, v[np.maximum(idx, 0)], np.nan)
                    out_cols[f"{c}_lag_{k}"].extend(lag.tolist())
                if self.windows:
                    valid = ~np.isnan(v)
                    csum = np.concatenate(([0.0], np.cumsum(np.where(valid, v, 0.0))))
                    cvalid = np.concatenate(([0], np.cumsum(valid)))
                    idx = np.arange(off, off + n)
                    for w in self.windows:
                        lo = np.maximum(idx - w + 1, 0)
                        ssum = csum[idx + 1] - csum[lo]
                        cnt = (cvalid[idx + 1] - cvalid[lo]).astype(np.float64)
                        ssum = np.where(cnt > 0, ssum, np.nan)
                        out_cols[f"{c}_roll_sum_{w}"].extend(ssum.tolist())
                        out_cols[f"{c}_roll_mean_{w}"].extend(
                            np.where(cnt > 0, ssum / np.maximum(cnt, 1), np.nan).tolist())
                st["tail"][c] = v[-self.keep:] if self.keep else np.array([], dtype=np.float64)
            st["last_ts"] = run_ts[-1]
            self.state[ent] = st

        out = batch.copy()
        for name, col in out_cols.items():
            out[name] = col
        return out


def streaming_window_features(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    time_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (),
    windows: Sequence[int] = (),
    session_gap=None,
    batch_size: int = 8192,
    presorted: bool = False,
    concurrency: int = 1,
    tiebreak: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Run the stateful window actor over the ``(entity, ts)``-sorted
    stream.

    ``concurrency=1``: one ordered actor over the whole sorted stream.
    ``concurrency=K>1``: the SHARDED cluster form — entities are
    hash-assigned to K shards, ONE sort co-locates and orders every
    shard (``[shard, entity, ts]``), and each shard streams through its
    own single-actor ordered pool; the shard outputs union back into
    one Dataset. Every entity's rows pass through exactly one actor in
    order — the keyed-streaming-operator topology the north rule names
    — and per-shard state stays bounded at ``max(lags, windows)`` rows
    per live entity.

    ``preserve_order`` is set on THIS dataset lineage's own
    ``DataContext`` (Ray captures one per dataset), not the process
    global — later pipelines in the process are unaffected.
    """
    order = [id_col, time_col, *(tiebreak or [])]
    ctor = (id_col, time_col, list(value_cols), list(lags), list(windows), session_gap)
    # stateful actors must NOT silently restart (a fresh actor would
    # recompute lags/sessions from empty state mid-stream) — fail loud
    fail_loud = {"max_restarts": 0, "max_task_retries": 0}
    if concurrency <= 1:
        if not presorted:
            ds = ds.sort(order)
        ds.context.execution_options.preserve_order = True
        return ds.map_batches(
            StreamingWindowState, batch_format="pandas", batch_size=batch_size, concurrency=1,
            fn_constructor_args=ctor, **fail_loud,
        )

    # ---- sharded: one ordered single-actor pool per entity-hash shard ----
    from . import grouped

    # K shards spawn K single-actor pools at 0.5 CPU each (K/2 CPUs
    # reserved); clamp K so the pools can never reserve every CPU and
    # starve the per-shard filter/scan tasks (the deadlock
    # clamp_concurrency guards against for full-CPU pools):
    # K/2 <= cpus - 2  =>  K <= 2*(cpus - 2)
    try:
        import ray as _ray

        _avail = int(_ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, min(int(concurrency), 2 * (_avail - 2)))
    except Exception:
        pass
    if concurrency <= 1:
        if not presorted:
            ds = ds.sort(order)
        ds.context.execution_options.preserve_order = True
        return ds.map_batches(
            StreamingWindowState, batch_format="pandas", batch_size=batch_size, concurrency=1,
            fn_constructor_args=ctor, **fail_loud,
        )
    bucketed = grouped.with_bucket(ds, id_col, concurrency)
    # one sort orders ALL shards ([shard, entity, ts]); materialize pins
    # the sorted blocks so the K per-shard filters scan the object store,
    # not the source (at cluster scale, split at shard boundaries
    # instead of filtering)
    sorted_all = bucketed.sort([grouped.BUCKET_COL, *order]).materialize()
    sorted_all.context.execution_options.preserve_order = True
    shards = []
    for s in range(concurrency):
        shard = (
            sorted_all.filter(expr=f"{grouped.BUCKET_COL} == {s}")
            .drop_columns([grouped.BUCKET_COL])
            .map_batches(
                StreamingWindowState, batch_format="pandas", batch_size=batch_size, concurrency=1,
                fn_constructor_args=ctor,
                # fractional reservation: K single-actor pools must not
                # reserve every CPU or the upstream filter/scan tasks
                # starve and the pipeline deadlocks (the actor's work is
                # one vectorized pass per batch — far below a full core)
                num_cpus=0.5,
                **fail_loud,
            )
        )
        shards.append(shard)
    return shards[0].union(*shards[1:])
