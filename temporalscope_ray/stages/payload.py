"""Payload projection: keep wide binary columns out of shuffles.

The temporal operators only read narrow numeric/key columns, but the
image+caption table carries ~KB-MB binary payloads per row. Shuffling
those through the entity-bucket exchange multiplies shuffle bytes by
orders of magnitude for no semantic gain (SURVEY.md §7.4 "very wide
rows").

``attach_features_broadcast`` computes features on the NARROW
projection (one small shuffle), then maps them back onto the untouched
payload stream with a broadcast hash-merge keyed by the row key — the
payload never enters a shuffle. Valid whenever the feature table fits
in the object store (≲ a few GiB); beyond that, write the feature
table partitioned by the same key (`state.lineage.run_partitioned`)
and co-partition the payload read instead.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
import ray
import ray.data

from .grouped import clamp_concurrency


def attach_features_broadcast(
    payload_ds: ray.data.Dataset,
    feature_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
    *,
    keys: Sequence[str],
    narrow_cols: Sequence[str],
    concurrency=8,
    narrow_blocks: int | None = 16,
) -> ray.data.Dataset:
    """Run ``feature_fn`` over the narrow projection of ``payload_ds``
    and broadcast-merge the new columns back by ``keys``.

    ``narrow_cols`` must include ``keys``. Feature rows that drop out
    (e.g. a label shift) drop the matching payload rows too (inner
    merge), so row semantics match running the pipeline directly.
    """
    keys = list(keys)
    narrow = payload_ds.select_columns(list(dict.fromkeys([*keys, *narrow_cols])))
    if narrow_blocks is not None:
        # the narrow projection inherits the payload read's block count;
        # coalescing it first cuts the bucket shuffle's per-block fixed
        # cost (measured 4x on small tables)
        narrow = narrow.repartition(narrow_blocks)
    features = feature_fn(narrow).to_pandas()
    feat_ref = ray.put(features)

    class Attach:
        def __init__(self):
            feats: pd.DataFrame = ray.get(feat_ref)
            # drop the narrow value columns that already live in the
            # payload stream; keep keys + NEW feature columns
            dup = [c for c in feats.columns if c not in keys and c in narrow_cols]
            self.feats = feats.drop(columns=dup).set_index(keys)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            merged = batch.join(self.feats, on=keys, how="inner")
            return merged.reset_index(drop=True)

    return payload_ds.map_batches(Attach, batch_format="pandas", concurrency=clamp_concurrency(concurrency))
