"""``TemporalDataset`` — the Ray-Data-native analogue of the reference's
``TimeFrame`` (`/root/reference/src/temporalscope/core/temporal_data_loader.py:88-700`).

A thin driver-side wrapper around one lazy ``ray.data.Dataset`` plus
column-role metadata ``(time_col, target_col, id_col, mode, ascending)``.
It never materializes data: validation is Arrow-schema checks plus tiny
streaming aggregates, the canonical setup pipeline
(validate -> convert -> sort, reference ``temporal_data_loader.py:468-622``)
is composed lazily, and the wrapped Dataset stays a streaming plan.
"""

from __future__ import annotations

from typing import Any, Optional

import ray.data

from . import core
from .core import MODE_SINGLE_TARGET, VALID_MODES


class TemporalDataset:
    """One validated temporal table as a lazy Ray Dataset.

    Parameters mirror ``TimeFrame.__init__``
    (temporal_data_loader.py:125-261); parameter-validation messages are
    kept verbatim (``:263-337``).
    """

    def __init__(
        self,
        ds: ray.data.Dataset,
        time_col: str,
        target_col: str,
        id_col: Optional[str] = None,
        time_col_conversion: Optional[str] = None,
        enforce_temporal_uniqueness: bool = False,
        sort: bool = True,
        ascending: bool = True,
        mode: str = MODE_SINGLE_TARGET,
        verbose: bool = False,
        validate: bool = True,
    ):
        self._time_col = time_col
        self._target_col = target_col
        self._id_col = id_col
        self._time_col_conversion = time_col_conversion
        self._enforce_temporal_uniqueness = enforce_temporal_uniqueness
        self._sort = sort
        self._ascending = ascending
        self._mode = mode
        self._verbose = verbose
        self._metadata: dict[str, Any] = {}
        self._validate_parameters()
        self._ds = self.setup(ds, validate=validate, sort=sort)

    # -- parameter validation (verbatim messages, temporal_data_loader.py:263-337)
    def _validate_parameters(self) -> None:
        if not isinstance(self._time_col, str):
            raise TypeError(f"`time_col` must be a string. Got {type(self._time_col).__name__}.")
        if not isinstance(self._target_col, str):
            raise TypeError(f"`target_col` must be a string. Got {type(self._target_col).__name__}.")
        if not isinstance(self._sort, bool):
            raise TypeError(f"`sort` must be a boolean. Got {type(self._sort).__name__}.")
        if not isinstance(self._ascending, bool):
            raise TypeError(f"`ascending` must be a boolean. Got {type(self._ascending).__name__}.")
        if not isinstance(self._verbose, bool):
            raise TypeError(f"`verbose` must be a boolean. Got {type(self._verbose).__name__}.")
        if self._id_col is not None and not isinstance(self._id_col, str):
            raise TypeError(f"`id_col` must be a string or None. Got {type(self._id_col).__name__}.")
        if self._time_col_conversion not in {None, "numeric", "datetime"}:
            raise ValueError(
                f"Invalid `time_col_conversion` value '{self._time_col_conversion}'. "
                f"Must be one of {{None, 'numeric', 'datetime'}}."
            )
        if self._mode not in VALID_MODES:
            raise ValueError(f"Invalid mode '{self._mode}'. Must be one of {VALID_MODES}.")

    # -- composite validation (temporal_data_loader.py:390-466)
    def validate_dataset(self, ds: ray.data.Dataset) -> None:
        if core.is_dataset_empty(ds):
            raise ValueError("Empty DataFrame provided")
        names = ds.schema().names
        if self._time_col not in names:
            raise ValueError(f"Column '{self._time_col}' does not exist in DataFrame")
        if self._target_col not in names:
            raise ValueError(f"Column '{self._target_col}' does not exist in DataFrame")
        core.validate_column_numeric_or_datetime(ds, self._time_col)
        # Feature columns = everything but time (id col exempted; it is a
        # grouping key, not a feature).
        non_features = {self._time_col}
        if self._id_col is not None:
            non_features.add(self._id_col)
        import warnings

        import pyarrow as pa

        from .exceptions import TargetColumnWarning

        schema = core._schema(ds)
        target_type = schema.field(self._target_col).type
        if self._mode != MODE_SINGLE_TARGET and pa.types.is_list(target_type):
            # reference exceptions.py:51-70: sequential targets need
            # mode-appropriate handling
            warnings.warn(
                "`target_col` appears to contain sequential data. Ensure it is transformed "
                "appropriately for MODE_MULTI_TARGET.",
                TargetColumnWarning,
            )
        for name in schema.names:
            if name in non_features:
                continue
            t = schema.field(name).type
            if self._mode != MODE_SINGLE_TARGET and name == self._target_col and pa.types.is_list(t):
                # multi-target list column allowed — but its elements
                # must still be numeric (Y = (num_samples, seq_len))
                if not core._is_numeric(t.value_type):
                    raise ValueError(f"Column '{name}' must be numeric")
                continue
            if not core._is_numeric(t):
                raise ValueError(f"Column '{name}' must be numeric")

    # -- canonical setup pipeline (temporal_data_loader.py:468-622)
    def setup(self, ds: ray.data.Dataset, validate: bool = True, sort: bool = True) -> ray.data.Dataset:
        if validate:
            self.validate_dataset(ds)
        if self._time_col_conversion is not None:
            ds = core.validate_and_convert_time_column(ds, self._time_col, self._time_col_conversion)
        if self._enforce_temporal_uniqueness:
            core.validate_temporal_ordering(ds, self._time_col, id_col=self._id_col)
        if sort:
            if self._id_col is not None:
                ds = ds.sort([self._id_col, self._time_col], descending=not self._ascending)
            else:
                ds = ds.sort(self._time_col, descending=not self._ascending)
        return ds

    # -- replace data, re-run setup (temporal_data_loader.py:624-700)
    def update_dataset(self, ds: ray.data.Dataset) -> None:
        self._ds = self.setup(ds, validate=True, sort=self._sort)

    def sort_dataset_time(self, ascending: bool = True) -> ray.data.Dataset:
        return core.sort_dataset_time(self._ds, self._time_col, ascending=ascending)

    # -- accessors (mirroring TimeFrame properties, :702-861)
    @property
    def ds(self) -> ray.data.Dataset:
        return self._ds

    # reference calls this `df`
    df = ds

    @property
    def time_col(self) -> str:
        return self._time_col

    @property
    def target_col(self) -> str:
        return self._target_col

    @property
    def id_col(self) -> Optional[str]:
        return self._id_col

    @property
    def mode(self) -> str:
        return self._mode

    @property
    def ascending(self) -> bool:
        return self._ascending

    @property
    def metadata(self) -> dict[str, Any]:
        return self._metadata
