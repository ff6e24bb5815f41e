"""Incremental (CDC-style) refresh of per-entity temporal features.

At 100 TB you do not recompute the feature table because one day of
events arrived — you recompute ONLY the entities the delta touches and
keep every other entity's rows as-is. All features produced by
``add_temporal_features`` (lag/lead, rolling, sessionize, zero-leakage
label shift) are ENTITY-LOCAL, so a per-entity recomputation over that
entity's full history is exactly equal to the full-corpus recompute
restricted to those entities — the invariant the oracle pins.

Plan (no driver materialization, two size-adaptive semi-joins + one
bucket exchange over ONLY the affected slice):

1. the delta's distinct entity ids are the (small) key side;
2. ``semi_join`` narrows the base FACTS to affected entities (bucketed
   automatically when the id set outgrows the broadcast bound), the
   delta facts are affected by definition — union them;
3. one ``add_temporal_features`` bucket pass over the affected slice;
4. ``semi_join(..., anti=True)`` keeps untouched entities' rows from
   the PRIOR feature table (never recomputed, never reshuffled);
5. streaming union of (4) and (3).

Requires the base fact stream to carry each affected entity's full
history (the usual feature-store layout: facts partitioned by entity
hash, so the affected buckets are a partition-pruned read).
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data

from . import grouped
from .asof import semi_join
from .window_features import add_temporal_features


def incremental_temporal_features(
    base_features: ray.data.Dataset,
    base_events: ray.data.Dataset,
    delta_events: ray.data.Dataset,
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
    num_buckets: int = grouped.DEFAULT_NUM_BUCKETS,
    tiebreak: Optional[Sequence[str]] = None,
    broadcast_limit_rows: int = 2_000_000,
) -> ray.data.Dataset:
    """Refresh ``base_features`` after ``delta_events`` arrive: entities
    present in the delta are fully recomputed from
    ``base_events ∪ delta_events``; every other entity's feature rows
    pass through from ``base_features`` untouched (verifiably so — they
    are never re-executed). Output ≡ ``add_temporal_features`` over the
    full fact union (the oracle contract)."""
    delta_ids = delta_events.select_columns([id_col])
    affected = semi_join(
        base_events, delta_ids, id_col, broadcast_limit_rows=broadcast_limit_rows,
        num_buckets=num_buckets,
    ).union(delta_events)
    recomputed = add_temporal_features(
        affected,
        id_col=id_col,
        time_col=time_col,
        value_cols=value_cols,
        lags=lags,
        leads=leads,
        rolling_windows=rolling_windows,
        rolling_fns=rolling_fns,
        session_gap=session_gap,
        session_col=session_col,
        label_shift=label_shift,
        num_buckets=num_buckets,
        tiebreak=tiebreak,
    )
    untouched = semi_join(
        base_features, delta_ids, id_col, anti=True,
        broadcast_limit_rows=broadcast_limit_rows, num_buckets=num_buckets,
    )
    return untouched.union(recomputed)
