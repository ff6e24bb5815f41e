"""temporalscope_ray — a Ray-Data-native temporal feature-engineering engine.

A from-scratch re-expression of `philip-ndikum/TemporalScope`'s
capabilities (point-in-time semantics, zero-leakage target shifting,
sliding-window partitioning, temporal validation) as streaming
`ray.data.Dataset` pipelines over zero-copy Arrow batches, extended
with the operators a web-scale training-data pipeline needs: as-of
joins, sessionization, windowed/rolling features, backfill,
deduplication (exact / MinHash-LSH / SimHash / embedding),
similarity search, text analysis, and multimodal (image) stages.

Nothing in this package calls ``ray.init`` — the calling script or
test fixture owns the Ray session.
"""

from .core import (
    MODE_MULTI_TARGET,
    MODE_SINGLE_TARGET,
    VALID_MODES,
    convert_column_to_datetime_type,
    convert_datetime_column_to_microseconds,
    convert_time_column_to_numeric,
    count_dataset_column_nulls,
    is_dataset_empty,
    sort_dataset_time,
    validate_and_convert_time_column,
    validate_column_numeric_or_datetime,
    validate_feature_columns_numeric,
    validate_temporal_ordering,
)
from .dataset import TemporalDataset
from .stages.shift import SingleStepTargetShifter
from .exceptions import (
    DataFrameValidationError,
    ModeValidationError,
    TargetColumnWarning,
    TimeColumnError,
    TimeFrameError,
)

__all__ = [
    "TemporalDataset",
    "SingleStepTargetShifter",
    "MODE_SINGLE_TARGET",
    "MODE_MULTI_TARGET",
    "VALID_MODES",
    "convert_column_to_datetime_type",
    "convert_datetime_column_to_microseconds",
    "convert_time_column_to_numeric",
    "count_dataset_column_nulls",
    "is_dataset_empty",
    "sort_dataset_time",
    "validate_and_convert_time_column",
    "validate_column_numeric_or_datetime",
    "validate_feature_columns_numeric",
    "validate_temporal_ordering",
    "TimeFrameError",
    "TimeColumnError",
    "TargetColumnWarning",
    "ModeValidationError",
    "DataFrameValidationError",
]

__version__ = "0.1.0"
