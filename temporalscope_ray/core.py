"""Core schema validation and time-column conversion operators.

Ray-Data-native re-expression of the reference's ``core_utils``
(`/root/reference/src/temporalscope/core/core_utils.py`):

- type gates run against the Dataset's Arrow schema on the driver
  (Arrow types are known; no cast-probing needed) — M4/M5/M7 in
  SURVEY.md §2.2;
- conversions are stateless zero-copy ``map_batches`` projections over
  ``pyarrow.compute`` kernels — M1/M2/M3/M6;
- aggregates (null counts, duplicate-timestamp and equidistant checks)
  are partial-per-batch + tiny final reductions, never full
  materializations — A1/A3-A6 (reference
  ``core_utils.py:381-483, 1062-1207``).

Error messages are kept verbatim where the reference's tests match on
them (e.g. "Duplicate timestamps found within groups in '{col}'",
``core_utils.py:1164``).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .exceptions import TimeColumnError

# Modes (reference core_utils.py:91-93)
MODE_SINGLE_TARGET = "single_target"
MODE_MULTI_TARGET = "multi_target"
VALID_MODES = [MODE_SINGLE_TARGET, MODE_MULTI_TARGET]

# Max unique time deltas allowed by the equidistant-sampling check
# (reference core_utils.py:102)
MAX_UNIQUE_DELTAS = 1


# ---------------------------------------------------------------------------
# Arrow type predicates
# ---------------------------------------------------------------------------

def _is_numeric(t: pa.DataType) -> bool:
    """Castable-to-Float64 in the reference's sense (bools rejected)."""
    return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)


def _is_datetime(t: pa.DataType) -> bool:
    return pa.types.is_timestamp(t) or pa.types.is_date(t)


def _to_arrow_type(t) -> pa.DataType:
    """Normalize a Ray Schema entry (Arrow type, numpy dtype, or Python
    type for pandas object blocks) to an Arrow DataType."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        # pandas object dtype — treated as string (non-numeric/non-datetime)
        return pa.string()


def _schema(ds: ray.data.Dataset) -> pa.Schema:
    """Arrow schema of a Dataset (metadata-cheap on parquet reads)."""
    s = ds.schema()
    return pa.schema([(n, _to_arrow_type(t)) for n, t in zip(s.names, s.types)])


# ---------------------------------------------------------------------------
# L6 — env/config helpers (core_utils.py:109-185)
# ---------------------------------------------------------------------------

def get_api_keys() -> dict[str, Optional[str]]:
    """Retrieve LLM-integration API keys from environment variables
    (reference ``core_utils.py:109-159``; same key names, same missing-
    key warning). No LLM calls are made anywhere in this engine — the
    helper exists for API parity with downstream code that checks it."""
    import os

    api_keys = {
        "OPENAI_API_KEY": os.getenv("OPENAI_API_KEY"),
        "CLAUDE_API_KEY": os.getenv("CLAUDE_API_KEY"),
    }
    for key, value in api_keys.items():
        if value is None:
            print(f"Warning: {key} is not set in the environment variables.")
    return api_keys


def print_divider(char: str = "=", length: int = 70) -> None:
    """Print a visual divider line (reference ``core_utils.py:162-185``)."""
    print(char * length)


# ---------------------------------------------------------------------------
# M7 — emptiness
# ---------------------------------------------------------------------------

def is_dataset_empty(ds: Optional[ray.data.Dataset]) -> bool:
    """True if the dataset has no columns or no rows.

    Reference: ``is_dataframe_empty`` (core_utils.py:303-378).
    ``ds.count()`` is metadata-only on parquet-backed datasets.
    """
    if ds is None:
        raise ValueError("DataFrame cannot be None.")
    schema = ds.schema(fetch_if_missing=True)
    if schema is None or len(schema.names) == 0:
        return True
    return ds.count() == 0


# ---------------------------------------------------------------------------
# A1 — per-column null counts (partial per batch + driver sum)
# ---------------------------------------------------------------------------

def count_dataset_column_nulls(ds: ray.data.Dataset, column_names: list[str]) -> dict[str, int]:
    """Per-column null counts in ONE streaming pass.

    Reference: ``count_dataframe_column_nulls`` (core_utils.py:381-483).
    Each batch emits one row of partial counts; the driver sums the tiny
    partial table — no shuffle, no materialization of the input.
    """
    schema = ds.schema(fetch_if_missing=True)
    if schema is None or len(schema.names) == 0:
        raise ValueError("Empty DataFrame provided.")
    missing = [c for c in column_names if c not in schema.names]
    if missing:
        raise ValueError(f"Column '{missing[0]}' not found")

    cols = list(column_names)

    def partial(batch: pa.Table) -> pa.Table:
        arrays = [pa.array([batch.column(c).null_count], type=pa.int64()) for c in cols]
        arrays.append(pa.array([batch.num_rows], type=pa.int64()))
        return pa.Table.from_arrays(arrays, names=[*cols, "__rows__"])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or int(parts["__rows__"].sum()) == 0:
        raise ValueError("Empty DataFrame provided.")
    return {c: int(parts[c].sum()) for c in cols}


# ---------------------------------------------------------------------------
# M4 / M5 — type gates (driver-side, schema only)
# ---------------------------------------------------------------------------

def validate_column_numeric_or_datetime(ds: ray.data.Dataset, time_col: str) -> None:
    """Raise unless ``time_col`` is numeric or datetime.

    Reference: core_utils.py:805-899 (cast-probe); here a direct Arrow
    schema check.
    """
    schema = _schema(ds)
    if time_col not in schema.names:
        raise ValueError(f"Column '{time_col}' does not exist in DataFrame")
    t = schema.field(time_col).type
    if not (_is_numeric(t) or _is_datetime(t)):
        raise ValueError(f"Column '{time_col}' is neither numeric nor datetime.")


def validate_feature_columns_numeric(ds: ray.data.Dataset, time_col: Optional[str] = None) -> None:
    """All non-time columns must be numeric. Reference: core_utils.py:978-1059."""
    schema = _schema(ds)
    if time_col is not None and time_col not in schema.names:
        raise TimeColumnError(f"Column '{time_col}' does not exist")
    for name in schema.names:
        if name == time_col:
            continue
        if not _is_numeric(schema.field(name).type):
            raise ValueError(f"Column '{name}' must be numeric")


# ---------------------------------------------------------------------------
# M1 / M2 — datetime -> numeric epoch projections
# ---------------------------------------------------------------------------

def convert_time_column_to_numeric(
    ds: ray.data.Dataset, time_col: str, time_unit: str = "us"
) -> ray.data.Dataset:
    """Datetime time column -> numeric since epoch; numeric passthrough.

    ``us``/``ms`` -> float64, ``ns`` -> int64 (overflow-safe), matching
    the reference (core_utils.py:574-683). Stateless zero-copy
    ``map_batches`` projection.
    """
    if time_unit not in ("us", "ms", "ns"):
        raise ValueError(f"Invalid time_unit '{time_unit}'. Must be one of 'us', 'ms', or 'ns'.")
    schema = _schema(ds)
    if time_col not in schema.names:
        raise ValueError(f"Column '{time_col}' does not exist in the DataFrame.")
    t = schema.field(time_col).type
    if _is_numeric(t):
        return ds
    if not _is_datetime(t):
        raise TimeColumnError(f"Column '{time_col}' must be datetime type to convert")

    target = pa.int64() if time_unit == "ns" else pa.float64()

    def project(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(time_col)
        col = batch.column(i)
        as_ts = pc.cast(col, pa.timestamp(time_unit))
        out = pc.cast(pc.cast(as_ts, pa.int64()), target)
        return batch.set_column(i, time_col, out)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def convert_datetime_column_to_microseconds(ds: ray.data.Dataset, time_col: str) -> ray.data.Dataset:
    """M1 — datetime -> float64 microseconds since epoch (core_utils.py:486-571)."""
    schema = _schema(ds)
    if time_col not in schema.names:
        raise ValueError(f"Column '{time_col}' does not exist in the DataFrame.")
    t = schema.field(time_col).type
    if _is_numeric(t):
        return ds
    if not _is_datetime(t):
        raise TimeColumnError(f"Column '{time_col}' is not a datetime column, cannot convert to numeric.")
    return convert_time_column_to_numeric(ds, time_col, "us")


# ---------------------------------------------------------------------------
# M3 — cascading parse to datetime
# ---------------------------------------------------------------------------

def convert_column_to_datetime_type(ds: ray.data.Dataset, time_col: str) -> ray.data.Dataset:
    """String/numeric column -> timestamp[us].

    Reference 3-step cascade (core_utils.py:686-802): direct cast ->
    string parse -> numeric epoch cast; booleans rejected. Strings use
    Arrow's ISO-8601 cast; numerics are epoch values in the column's
    natural resolution (int64 treated as microseconds).
    """
    schema = _schema(ds)
    if time_col not in schema.names:
        raise TimeColumnError(f"Column '{time_col}' does not exist in DataFrame")
    t = schema.field(time_col).type
    if pa.types.is_boolean(t):
        raise TimeColumnError(f"Column '{time_col}' is boolean type and cannot be converted to datetime")
    if _is_datetime(t):
        def as_us(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index(time_col)
            return batch.set_column(i, time_col, pc.cast(batch.column(i), pa.timestamp("us")))
        return ds.map_batches(as_us, batch_format="pyarrow", zero_copy_batch=True)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        # the reference's string step is a general `str.to_datetime()`
        # parse (core_utils.py:795-797, narwhals -> pd.to_datetime under
        # the pandas backend). Cascade: Arrow ISO cast (vectorized fast
        # path) -> common strptime formats -> pandas mixed-format
        # inference (per-element, so heterogeneous batches parse too);
        # total failure raises the reference's TimeColumnError message.
        _FORMATS = (
            "%Y-%m-%d", "%Y/%m/%d", "%m/%d/%Y", "%d-%m-%Y", "%d.%m.%Y",
            "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y/%m/%d %H:%M:%S",
            "%m/%d/%Y %H:%M:%S", "%Y%m%d",
        )

        def parse(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index(time_col)
            col = batch.column(i)
            out = None
            try:
                out = pc.cast(col, pa.timestamp("us"))
            except pa.ArrowInvalid:
                for fmt in _FORMATS:
                    try:
                        out = pc.cast(pc.strptime(col, format=fmt, unit="us"), pa.timestamp("us"))
                        break
                    except pa.ArrowInvalid:
                        continue
            if out is None:
                try:
                    parsed = pd.to_datetime(col.to_pandas(), format="mixed")
                    out = pa.Array.from_pandas(parsed.astype("datetime64[us]"))
                except (ValueError, TypeError):
                    raise TimeColumnError(
                        f"Column '{time_col}' must be string or numeric to convert to datetime"
                    )
            return batch.set_column(i, time_col, out)
        return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
    if _is_numeric(t):
        def from_epoch(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index(time_col)
            col = pc.cast(batch.column(i), pa.int64())
            return batch.set_column(i, time_col, pc.cast(col, pa.timestamp("us")))
        return ds.map_batches(from_epoch, batch_format="pyarrow", zero_copy_batch=True)
    raise TimeColumnError(f"Column '{time_col}' must be string or numeric to convert to datetime")


# ---------------------------------------------------------------------------
# M6 — dispatcher
# ---------------------------------------------------------------------------

def validate_and_convert_time_column(
    ds: ray.data.Dataset, time_col: str, conversion_type: Optional[str] = None
) -> ray.data.Dataset:
    """Reference dispatcher (core_utils.py:902-975)."""
    schema = _schema(ds)
    if time_col not in schema.names:
        raise TimeColumnError(f"Column '{time_col}' does not exist in the DataFrame.")
    if conversion_type not in (None, "numeric", "datetime"):
        raise ValueError(
            f"Invalid conversion_type '{conversion_type}'. Must be one of 'numeric', 'datetime', or None."
        )
    if conversion_type == "numeric":
        return convert_datetime_column_to_microseconds(ds, time_col)
    if conversion_type == "datetime":
        return convert_column_to_datetime_type(ds, time_col)
    validate_column_numeric_or_datetime(ds, time_col)
    return ds


# ---------------------------------------------------------------------------
# O1 — global temporal sort
# ---------------------------------------------------------------------------

def sort_dataset_time(ds: ray.data.Dataset, time_col: str, ascending: bool = True) -> ray.data.Dataset:
    """Distributed range-partition sort by the time column.

    Reference: ``sort_dataframe_time`` (core_utils.py:1210-1265).
    """
    schema = _schema(ds)
    if time_col not in schema.names:
        raise ValueError(f"Column '{time_col}' does not exist in DataFrame")
    validate_column_numeric_or_datetime(ds, time_col)
    return ds.sort(time_col, descending=not ascending)


# ---------------------------------------------------------------------------
# L4 — temporal ordering validation (A3-A6)
# ---------------------------------------------------------------------------

def validate_temporal_ordering(
    ds: ray.data.Dataset,
    time_col: str,
    id_col: Optional[str] = None,
    enforce_equidistant_sampling: bool = False,
) -> None:
    """Distributed re-expression of core_utils.py:1062-1207.

    One hash-partitioned pass: batches are grouped by ``id_col`` (or a
    single global group), and each group's duplicate/delta checks run
    vectorized inside ``map_groups`` after a local sort. Duplicate and
    delta state never leaves the workers — each group emits one tiny
    summary row (dup count, distinct-delta count) which the driver
    reduces. For the global (no ``id_col``) variant the delta check
    needs a total order, so the distinct *time values* per batch are
    combined via a groupby on the time value (dup check) and a
    driver-side union of per-partition boundary-aware delta sets after
    a range-partition sort.
    """
    validate_column_numeric_or_datetime(ds, time_col)
    schema = _schema(ds)
    if id_col is not None and id_col not in schema.names:
        raise ValueError(f"Column '{id_col}' does not exist")

    if id_col is not None:
        import numpy as np
        import pandas as pd

        from .stages import grouped as _grouped

        def check_bucket(g: pd.DataFrame) -> pd.DataFrame:
            """Vectorized dup/delta summary over the (entity, ts)-sorted
            bucket — one row out per bucket, not per entity (a
            per-entity map_groups costs one Python call per entity)."""
            ts = g[time_col].to_numpy()
            keys = g[id_col].to_numpy()
            segs = _grouped.entity_segments(keys)
            same_entity = np.zeros(len(g), dtype=bool)
            if len(g) > 1:
                same_entity[1:] = keys[1:] == keys[:-1]
            dup = int(((ts[1:] == ts[:-1]) & same_entity[1:]).sum()) if len(g) > 1 else 0
            max_deltas = 0
            if enforce_equidistant_sampling and len(g) > 1:
                deltas = ts[1:] - ts[:-1]
                ent_of_delta = keys[1:]
                valid = same_entity[1:]
                d = pd.DataFrame({"e": ent_of_delta[valid], "d": deltas[valid]})
                if len(d):
                    max_deltas = int(d.groupby("e")["d"].nunique().max())
            return pd.DataFrame({"dups": [dup], "n_deltas": [max_deltas]})

        summary = _grouped.grouped_ordered_map(
            ds.select_columns([id_col, time_col]), id_col, [time_col], check_bucket
        ).to_pandas()
        if (summary["dups"] > 0).any():
            raise TimeColumnError(f"Duplicate timestamps found within groups in '{time_col}'")
        if enforce_equidistant_sampling and (summary["n_deltas"] > MAX_UNIQUE_DELTAS).any():
            raise TimeColumnError(
                f"Irregular time sampling found within group(s) for '{time_col}'. "
                "Equidistant sampling is required within each group when enforce_equidistant_sampling=True."
            )
    else:
        from ray.data.aggregate import Count

        dups = (
            ds.select_columns([time_col])
            .groupby(time_col)
            .aggregate(Count(alias_name="cnt"))
            .filter(lambda r: r["cnt"] > 1)
            .count()
        )
        if dups > 0:
            raise TimeColumnError(f"Duplicate timestamps found in '{time_col}'")
        if enforce_equidistant_sampling:
            import numpy as np

            # Range-partition sort then per-block delta sets + block
            # boundary values; union on the driver (tiny: <= a few
            # distinct deltas per block or the check fails anyway).
            sorted_ds = ds.select_columns([time_col]).sort(time_col)

            def block_deltas(batch: pa.Table) -> pa.Table:
                ts = batch.column(time_col).to_numpy(zero_copy_only=False)
                if len(ts) == 0:
                    return pa.table({"deltas": pa.array([], type=pa.list_(pa.float64())),
                                     "lo": pa.array([], type=pa.float64()),
                                     "hi": pa.array([], type=pa.float64())})
                tsf = ts.astype("float64")
                d = np.unique(tsf[1:] - tsf[:-1]) if len(tsf) > 1 else np.array([], dtype="float64")
                return pa.table({
                    "deltas": pa.array([d.tolist()], type=pa.list_(pa.float64())),
                    "lo": pa.array([float(tsf[0])], type=pa.float64()),
                    "hi": pa.array([float(tsf[-1])], type=pa.float64()),
                })

            parts = sorted_ds.map_batches(block_deltas, batch_format="pyarrow").to_pandas()
            parts = parts.sort_values("lo")
            all_deltas: set[float] = set()
            prev_hi = None
            for _, row in parts.iterrows():
                all_deltas.update(row["deltas"])
                if prev_hi is not None:
                    all_deltas.add(float(row["lo"]) - prev_hi)
                prev_hi = float(row["hi"])
            if len(all_deltas) > MAX_UNIQUE_DELTAS:
                raise TimeColumnError(
                    f"Irregular time sampling found in '{time_col}'. "
                    "Equidistant sampling is required when enforce_equidistant_sampling=True."
                )
