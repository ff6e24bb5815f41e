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

import os
from collections import OrderedDict
from typing import Callable, Optional, Sequence

import pandas as pd
import ray
import ray.data

from .grouped import clamp_concurrency


def attach_features_broadcast(
    payload_ds: ray.data.Dataset,
    feature_fn: Optional[Callable[[ray.data.Dataset], ray.data.Dataset]],
    *,
    keys: Sequence[str],
    narrow_cols: Sequence[str],
    concurrency=8,
    narrow_blocks: int | None = 16,
    features_ref: Optional["ray.ObjectRef"] = None,
) -> ray.data.Dataset:
    """Run ``feature_fn`` over the narrow projection of ``payload_ds``
    and broadcast-merge the new columns back by ``keys``.

    ``narrow_cols`` must include ``keys``. Feature rows that drop out
    (e.g. a label shift) drop the matching payload rows too (inner
    merge), so row semantics match running the pipeline directly.

    ``features_ref`` (mutually exclusive with ``feature_fn``): an
    ObjectRef resolving to the feature DataFrame — typically a plain
    Ray task dispatched BEFORE this call, so the feature compute runs
    concurrently with the payload read instead of ahead of it (see
    ``pipelines.flagship.image_pipeline_over``'s small path).
    """
    keys = list(keys)
    if features_ref is not None:
        # pre-dispatched feature promise (e.g. a detached task reading
        # the narrow columns straight from parquet): the payload plan
        # below starts its read IMMEDIATELY and the Attach actors block
        # in __init__ until the promise resolves — the feature compute
        # overlaps the payload read instead of serializing ahead of it
        feat_ref = features_ref
    else:
        narrow = payload_ds.select_columns(list(dict.fromkeys([*keys, *narrow_cols])))
        if narrow_blocks is not None:
            # the narrow projection inherits the payload read's block
            # count; coalescing it first cuts the bucket shuffle's
            # per-block fixed cost (measured 4x on small tables)
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


class _PartitionedAttach:
    """Actor: joins payload batches against key-hash-partitioned feature
    parquet. Per-bucket feature frames load lazily on first touch and
    live in a bounded LRU — worker memory is ``cache_buckets`` feature
    partitions, NOT the whole feature table (the broadcast path's 100 TB
    flaw). When the payload read is itself partitioned by the same key
    hash, each task touches exactly one partition and the cache never
    evicts."""

    def __init__(self, feature_dir: str, keys: Sequence[str], narrow_cols: Sequence[str],
                 num_buckets: int, cache_buckets: int):
        self.feature_dir = feature_dir
        self.keys = list(keys)
        self.narrow_cols = list(narrow_cols)
        self.num_buckets = num_buckets
        self.cache: OrderedDict[int, pd.DataFrame] = OrderedDict()
        self.cache_buckets = cache_buckets
        # schema-stable empty fallback: a bucket with NO feature
        # partition file (feature_fn dropped every row that hashed
        # there) must still join against a frame with the FULL feature
        # schema, or the emitted block would miss the feature columns
        # and downstream schema unification fails. The template comes
        # from any written partition (they all share one schema).
        self.empty_feats: pd.DataFrame | None = None

    def _empty_template(self) -> pd.DataFrame:
        if self.empty_feats is None:
            import glob

            import pyarrow.parquet as pq

            parts = glob.glob(os.path.join(self.feature_dir, "bucket=*", "*.parquet"))
            if parts:
                self.empty_feats = pq.read_schema(parts[0]).empty_table().to_pandas()
            else:  # no partitions at all: keys-only (degenerate but consistent)
                self.empty_feats = pd.DataFrame(columns=self.keys)
        return self.empty_feats

    def _bucket_frame(self, b: int) -> pd.DataFrame:
        hit = self.cache.get(b)
        if hit is not None:
            self.cache.move_to_end(b)
            return hit
        import pyarrow.parquet as pq

        path = os.path.join(self.feature_dir, f"bucket={b:04d}", "part-0.parquet")
        feats = pq.read_table(path).to_pandas() if os.path.exists(path) else self._empty_template()
        dup = [c for c in feats.columns if c not in self.keys and c in self.narrow_cols]
        feats = feats.drop(columns=dup).set_index(self.keys)
        self.cache[b] = feats
        while len(self.cache) > self.cache_buckets:
            self.cache.popitem(last=False)
        return feats

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from . import grouped

        buckets = grouped.hash_key_column(batch[self.keys[0]], self.num_buckets)
        parts = []
        for b in pd.unique(buckets):
            sub = batch[buckets == b]
            merged = sub.join(self._bucket_frame(int(b)), on=self.keys, how="inner")
            parts.append(merged.reset_index(drop=True))
        if parts:
            return pd.concat(parts, ignore_index=True)
        # empty batch: emit the full joined schema, not payload-only
        return batch.iloc[0:0].join(self._bucket_frame(0), on=self.keys, how="inner").reset_index(drop=True)


def attach_features_partitioned(
    payload_ds: ray.data.Dataset,
    feature_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
    *,
    keys: Sequence[str],
    narrow_cols: Sequence[str],
    feature_dir: str,
    num_buckets: int = 32,
    cache_buckets: int = 8,
    concurrency=8,
    narrow_blocks: int | None = 16,
) -> ray.data.Dataset:
    """Co-partitioned feature attach — the 100 TB path.

    ``feature_fn`` runs over the narrow projection, and its output is
    WRITTEN to ``feature_dir`` partitioned by ``hash(keys[0]) % B``
    (``state.lineage.run_partitioned`` — atomic publish + lineage
    records, so a resumed job skips completed feature buckets). The
    payload stream then joins per batch against the matching feature
    partition through a bounded per-actor LRU. Nothing feature-table-
    sized is ever broadcast or held on the driver; payload bytes still
    never enter a shuffle."""
    from ..state import lineage

    keys = list(keys)
    narrow = payload_ds.select_columns(list(dict.fromkeys([*keys, *narrow_cols])))
    if narrow_blocks is not None:
        narrow = narrow.repartition(narrow_blocks)
    features = feature_fn(narrow)
    lineage.run_partitioned(features, key=keys[0], out_dir=feature_dir, num_buckets=num_buckets)
    return payload_ds.map_batches(
        _PartitionedAttach,
        batch_format="pandas",
        concurrency=clamp_concurrency(concurrency),
        fn_constructor_args=(feature_dir, keys, list(narrow_cols), num_buckets, cache_buckets),
    )
