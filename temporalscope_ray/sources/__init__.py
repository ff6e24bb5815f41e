"""Dataset sources: named demo-dataset registry and parquet readers."""

from .datasets import AVAILABLE_DATASETS, DatasetLoader  # noqa: F401
from .fragments import read_lance_or_fragments, read_parquet_fragments  # noqa: F401
from .reader import sized_read_parquet  # noqa: F401
