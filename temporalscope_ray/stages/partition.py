"""Sliding-window partitioning and mean-fill padding (SURVEY.md §2.9).

Reference semantics reproduced exactly:

- scheme math (``num_partitions`` XOR ``window_size``, stride default =
  window_size) — `/root/reference/src/temporalscope/partition/single_target/utils.py:100-155`;
- percentage validation/completion — ``utils.py:29-97``;
- per-window split boundaries by TIME-RANGE fraction (not row
  fraction): train ``[start, start+Δ·train_pct)``, test
  ``[train_end, end)``, validation ``[end, end+Δ·val_pct)`` —
  ``static/sliding_window.py:384-402`` (commented reference code, the
  north rule mandates implementing it);
- ``mean_fill_pad`` — ``padding/functional.py:90-198``.

Scale design: ``fit`` never materializes the time column. Boundary
timestamps are looked up by global row index via a two-pass
block-offset protocol over the sorted (and pinned) single-column ts
dataset: pass 1 emits per-block ``(min, max, count)`` signatures, the
driver assigns global offsets, pass 2 extracts only the K requested
boundary rows. ``transform`` offers both the reference's lazy
per-window filtered datasets AND a single tagged pass
(``tag_windows``) that assigns ``window_id``/``split`` to every row in
one ``map_batches`` against the broadcast boundary list — W windows in
one scan instead of W scans.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..dataset import TemporalDataset

# ---------------------------------------------------------------------------
# driver-side pure functions (verbatim reference semantics)
# ---------------------------------------------------------------------------

def validate_percentages(
    train_pct: float, test_pct: Optional[float], val_pct: Optional[float], precision: float = 1e-6
) -> tuple[float, float, float]:
    """utils.py:29-97 — validate/complete train/test/val fractions."""
    if not (0 <= train_pct <= 1):
        raise ValueError("`train_pct` must be between 0 and 1.")
    if test_pct is not None and not (0 <= test_pct <= 1):
        raise ValueError("`test_pct` must be between 0 and 1.")
    if val_pct is not None and not (0 <= val_pct <= 1):
        raise ValueError("`val_pct` must be between 0 and 1.")

    if test_pct is None and val_pct is None:
        test_pct_val, val_pct_val = 1.0 - train_pct, 0.0
    elif test_pct is not None and val_pct is None:
        test_pct_val, val_pct_val = test_pct, 1.0 - train_pct - test_pct
    elif test_pct is None and val_pct is not None:
        val_pct_val, test_pct_val = val_pct, 1.0 - train_pct - val_pct
    else:
        test_pct_val, val_pct_val = test_pct, val_pct

    if not abs(train_pct + test_pct_val + val_pct_val - 1.0) < precision:
        raise ValueError("Train, test, and validation percentages must sum to 1.0.")
    return train_pct, test_pct_val, val_pct_val


def determine_partition_scheme(
    num_partitions: Optional[int], window_size: Optional[int], total_rows: int, stride: Optional[int]
) -> tuple[str, int, int]:
    """utils.py:100-155 — derive the missing of (num_partitions, window_size)."""
    if num_partitions is None and window_size is None:
        raise ValueError("Either `num_partitions` or `window_size` must be specified.")
    if num_partitions is not None:
        if num_partitions <= 0:
            raise ValueError("`num_partitions` must be a positive integer.")
        return "num_partitions", num_partitions, total_rows // num_partitions
    if window_size <= 0:
        raise ValueError("`window_size` must be a positive integer.")
    stride_val = stride if stride is not None else window_size
    return "window_size", (total_rows - window_size) // stride_val + 1, window_size


def validate_cardinality(num_partitions: int, window_size: int, total_rows: int) -> None:
    """utils.py:158-189."""
    if num_partitions > total_rows:
        raise ValueError(f"Insufficient rows ({total_rows}) for `num_partitions={num_partitions}`.")
    if window_size > total_rows:
        raise ValueError(f"Insufficient rows ({total_rows}) for `window_size={window_size}`.")


def print_config(config: dict) -> None:
    """utils.py:192-233 (tabulate swapped for a plain table)."""
    allowed_types = (int, float, bool, str)
    invalid = [(k, type(v).__name__) for k, v in config.items() if not isinstance(v, allowed_types)]
    if invalid:
        raise TypeError("Invalid data types in config:\n" + "\n".join(f"{k}: {t}" for k, t in invalid))
    print("Configuration Details:\n")
    width = max(len(str(k)) for k in config) if config else 0
    for k, v in config.items():
        print(f"  {str(k):<{width}}  {v}")


# ---------------------------------------------------------------------------
# boundary-row extraction without materializing the time column
# ---------------------------------------------------------------------------

def _values_at_sorted_indices(ds: ray.data.Dataset, time_col: str, indices: list[int]) -> list:
    """ts values at global row indices of the time-sorted dataset.

    Two block-aligned passes (batch == block) over a pinned sort of the
    single ts column; only ``len(indices)`` values ever reach the driver.
    """
    sorted_ts = ds.select_columns([time_col]).sort(time_col).materialize()

    def block_sig(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lo": pa.array([], type=batch.schema.field(time_col).type),
                             "hi": pa.array([], type=batch.schema.field(time_col).type),
                             "cnt": pa.array([], type=pa.int64())})
        col = batch.column(time_col)
        return pa.table({"lo": [col[0].as_py()], "hi": [col[batch.num_rows - 1].as_py()], "cnt": [batch.num_rows]})

    sigs = sorted_ts.map_batches(block_sig, batch_size=None, batch_format="pyarrow").to_pandas()
    sigs = sigs.sort_values(["lo", "hi"]).reset_index(drop=True)
    starts = np.concatenate(([0], np.cumsum(sigs["cnt"].to_numpy())[:-1]))
    # map requested global index -> (block signature, local offset)
    wanted: dict[tuple, list[tuple[int, int]]] = {}
    for j, gidx in enumerate(indices):
        b = int(np.searchsorted(starts, gidx, side="right") - 1)
        sig = (sigs.loc[b, "lo"], sigs.loc[b, "hi"], int(sigs.loc[b, "cnt"]))
        wanted.setdefault(sig, []).append((j, int(gidx - starts[b])))
    wanted_ref = ray.put(wanted)

    def extract(batch: pa.Table) -> pa.Table:
        req = ray.get(wanted_ref)
        if batch.num_rows == 0:
            return pa.table({"j": pa.array([], type=pa.int64()),
                             "val": pa.array([], type=batch.schema.field(time_col).type)})
        col = batch.column(time_col)
        sig = (col[0].as_py(), col[batch.num_rows - 1].as_py(), batch.num_rows)
        hits = req.get(sig, [])
        return pa.table({"j": pa.array([j for j, _ in hits], type=pa.int64()),
                         "val": pa.array([col[off].as_py() for _, off in hits],
                                         type=batch.schema.field(time_col).type)})

    got = sorted_ts.map_batches(extract, batch_size=None, batch_format="pyarrow").to_pandas()
    # Two blocks can share a (lo, hi, cnt) signature when the time
    # column is heavily duplicated; both then answer the same request.
    # Identical answers are fine (dedupe); differing answers mean the
    # requested index is genuinely ambiguous under ties — report that,
    # not a generic mismatch.
    per_j = got.groupby("j")["val"].agg(["nunique", "first", "size"])
    if len(per_j) != len(indices):
        raise RuntimeError("boundary extraction mismatch (non-deterministic block layout?)")
    if (per_j["nunique"] > 1).any():
        bad = per_j[per_j["nunique"] > 1].index.tolist()
        raise RuntimeError(
            f"ambiguous boundary values at request indices {bad}: duplicate-timestamp blocks "
            "share a signature with differing values; provide a unique time column"
        )
    return per_j.sort_index()["first"].tolist()


# ---------------------------------------------------------------------------
# the partitioner
# ---------------------------------------------------------------------------

class SlidingWindowPartitioner:
    """W1-W4: sliding windows over the time-sorted dataset with
    time-fraction train/test/val splits inside each window.

    Implements the reference's 4-method lifecycle protocol
    (``partition/base_protocol.py:88-181``): ``setup`` (validate config),
    ``fit`` (window metadata), ``transform`` (lazy slices),
    ``fit_transform``.

    Reference-faithful quirks kept on purpose: ``truncate`` is stored
    but unused (the reference's fit also never reads it,
    ``sliding_window.py:355-405`` — trailing partial windows are always
    dropped by the ``range(0, total-w+1, stride)`` start math), and
    with ``num_partitions=N`` where ``total % N != 0`` the derived
    ``window_size = total // N`` can yield MORE than N windows, exactly
    as the reference's formulas do (``utils.py:100-155``).
    """

    def __init__(
        self,
        td: TemporalDataset,
        num_partitions: Optional[int] = None,
        window_size: Optional[int] = None,
        stride: Optional[int] = None,
        train_pct: float = 0.7,
        test_pct: Optional[float] = None,
        val_pct: Optional[float] = None,
        truncate: bool = True,
        precision: float = 1e-6,
        verbose: bool = False,
    ):
        self.td = td
        self.train_pct, self.test_pct, self.val_pct = validate_percentages(
            train_pct, test_pct, val_pct, precision
        )
        self.num_partitions = num_partitions
        self.window_size = window_size
        self.stride = stride
        self.truncate = truncate
        self.verbose = verbose
        self.metadata: Optional[dict] = None
        self._partition_cache: Optional[list] = None
        self.setup()

    def setup(self) -> None:
        total_rows = self.td.ds.count()
        self.total_rows = total_rows
        scheme, n, w = determine_partition_scheme(
            self.num_partitions, self.window_size, total_rows, self.stride
        )
        self.scheme = scheme
        self.num_partitions = n
        self.window_size = w
        validate_cardinality(n, w, total_rows)
        if self.stride is None:
            self.stride = w

    def fit(self) -> None:
        """Compute per-window (train/test/validation) time boundaries.

        Row-index windows ``i in range(0, total - w + 1, stride)``; each
        needs ts at indices ``i`` and ``i+w-1`` — fetched via the
        block-offset protocol, NOT by materializing the ts column
        (reference materializes: ``sliding_window.py:375``).
        """
        w, stride, total = self.window_size, self.stride, self.total_rows
        if total < w:
            raise ValueError(f"Total rows ({total}) are insufficient for the requested partitions.")
        starts = list(range(0, total - w + 1, stride))
        idx_wanted: list[int] = []
        for i in starts:
            idx_wanted.extend([i, i + w - 1])
        vals = _values_at_sorted_indices(self.td.ds, self.td.time_col, idx_wanted)
        partitions = []
        for k, i in enumerate(starts):
            start_time, end_time = vals[2 * k], vals[2 * k + 1]
            delta = end_time - start_time
            train_end = start_time + delta * self.train_pct
            partitions.append(
                {
                    "train": (start_time, train_end),
                    "test": (train_end, end_time),
                    "validation": None if not self.val_pct else (end_time, end_time + delta * self.val_pct),
                }
            )
        self.metadata = {
            "partitions": partitions,
            "window_size": w,
            "stride": stride,
            "total_rows": total,
        }
        if self.verbose:
            print(f"Fit complete with {len(partitions)} partitions, window size {w}, stride {stride}.")

    def transform(self) -> Iterator[dict[str, Optional[ray.data.Dataset]]]:
        """Lazy per-window filtered datasets (reference parity,
        ``sliding_window.py:407-445``): ``>= lo`` and ``< hi`` filters."""
        if self.metadata is None:
            raise RuntimeError("Call `fit` before `transform`.")
        ds = self.td.ds
        tcol = self.td.time_col
        for part in self.metadata["partitions"]:
            out: dict[str, Optional[ray.data.Dataset]] = {}
            for split in ("train", "test", "validation"):
                rng = part[split]
                if rng is None:
                    out[split] = None
                    continue
                lo, hi = rng
                out[split] = ds.map_batches(
                    lambda t, lo=lo, hi=hi: t.filter(
                        pa.compute.and_(
                            pa.compute.greater_equal(t.column(tcol), pa.scalar(lo)),
                            pa.compute.less(t.column(tcol), pa.scalar(hi)),
                        )
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            yield out

    @property
    def partitions(self) -> list[dict[str, Optional[ray.data.Dataset]]]:
        if self.metadata is None:
            raise RuntimeError("Call `fit` before accessing `partitions`.")
        if self._partition_cache is None:
            self._partition_cache = list(self.transform())
        return self._partition_cache

    def fit_transform(self) -> Iterator[dict[str, Optional[ray.data.Dataset]]]:
        self.fit()
        return self.transform()

    # -- the scale path: all windows in ONE scan
    def tag_windows(self) -> ray.data.Dataset:
        """Single tagged pass: each row is emitted once per window
        containing it (overlap factor = window_size/stride) with
        ``window_id`` and ``split`` columns, against the broadcast
        boundary list. W windows in one scan instead of W scans."""
        if self.metadata is None:
            raise RuntimeError("Call `fit` before `transform`.")
        parts = self.metadata["partitions"]
        bounds = []
        for wid, p in enumerate(parts):
            for split in ("train", "test", "validation"):
                if p[split] is not None:
                    bounds.append((wid, split, p[split][0], p[split][1]))
        bounds_ref = ray.put(bounds)
        tcol = self.td.time_col

        def tag(batch: pa.Table) -> pa.Table:
            bl = ray.get(bounds_ref)
            ts = batch.column(tcol).to_numpy(zero_copy_only=False)
            pieces = []
            for wid, split, lo, hi in bl:
                lo_v = lo.to_numpy() if hasattr(lo, "to_numpy") else lo
                hi_v = hi.to_numpy() if hasattr(hi, "to_numpy") else hi
                mask = (ts >= lo_v) & (ts < hi_v)
                if not mask.any():
                    continue
                sub = batch.filter(pa.array(mask))
                sub = sub.append_column("window_id", pa.array(np.full(sub.num_rows, wid, dtype=np.int32)))
                sub = sub.append_column("split", pa.array([split] * sub.num_rows, type=pa.string()))
                pieces.append(sub)
            if not pieces:
                empty = batch.slice(0, 0)
                empty = empty.append_column("window_id", pa.array([], type=pa.int32()))
                return empty.append_column("split", pa.array([], type=pa.string()))
            return pa.concat_tables(pieces)

        return self.td.ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# W9 — mean-fill padding
# ---------------------------------------------------------------------------

def mean_fill_pad(
    ds: ray.data.Dataset, target_len: int, padding: str = "post"
) -> ray.data.Dataset:
    """Pad to ``target_len`` rows with per-column means
    (padding/functional.py:90-198; messages verbatim).

    Means come from one streaming aggregate (A7, partial+final); the pad
    block is synthesized driver-side (tiny) and unioned in ``pre``/``post``
    order. Null anywhere -> error, as in the reference. The pre/post row
    order is made observable by setting ``preserve_order`` on the RESULT
    dataset's own ``DataContext`` (scoped to this lineage — the process
    global is untouched; Ray's streaming executor may otherwise complete
    blocks out of order).
    """
    from ray.data.aggregate import Mean

    from ..core import count_dataset_column_nulls

    cols = ds.schema().names
    null_counts = count_dataset_column_nulls(ds, cols)
    if any(v > 0 for v in null_counts.values()):
        raise ValueError("Cannot process data containing null values")
    if padding not in {"pre", "post"}:
        raise ValueError("padding must be 'pre' or 'post'")
    current_len = ds.count()
    if target_len <= current_len:
        raise ValueError(f"target_len ({target_len}) must be greater than current length ({current_len})")

    means_row = ds.aggregate(*[Mean(c, alias_name=c) for c in cols])
    pad_count = target_len - current_len
    pad_tbl = pa.table({c: pa.array([float(means_row[c])] * pad_count, type=pa.float64()) for c in cols})
    pad_ds = ray.data.from_arrow(pad_tbl)
    # cast original columns to float64 so union schemas align (means are floats)
    def to_f64(t: pa.Table) -> pa.Table:
        arrays = [pa.compute.cast(t.column(c), pa.float64()) for c in cols]
        return pa.table(dict(zip(cols, arrays)))

    ds_f = ds.map_batches(to_f64, batch_format="pyarrow", zero_copy_batch=True)
    out = pad_ds.union(ds_f) if padding == "pre" else ds_f.union(pad_ds)
    out.context.execution_options.preserve_order = True
    return out


def mean_fill_pad_per_entity(
    ds: ray.data.Dataset, *, id_col: str, target_len: int, padding: str = "post"
) -> ray.data.Dataset:
    """Per-entity variant: every entity padded to ``target_len`` with its
    OWN column means — one ``groupby(id).map_groups`` pass."""
    if padding not in {"pre", "post"}:
        raise ValueError("padding must be 'pre' or 'post'")

    def pad_group(g: pd.DataFrame) -> pd.DataFrame:
        if g.isna().any().any():
            raise ValueError("Cannot process data containing null values")
        if len(g) >= target_len:
            return g
        value_cols = [c for c in g.columns if c != id_col]
        means = {c: g[c].mean() for c in value_cols}
        pad = pd.DataFrame({id_col: [g[id_col].iloc[0]] * (target_len - len(g)), **{c: means[c] for c in value_cols}})
        return pd.concat([pad, g] if padding == "pre" else [g, pad], ignore_index=True)

    return ds.groupby(id_col).map_groups(pad_group, batch_format="pandas")
