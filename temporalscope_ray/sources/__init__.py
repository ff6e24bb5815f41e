"""Dataset sources: named demo-dataset registry and parquet readers."""

from .datasets import AVAILABLE_DATASETS, DatasetLoader  # noqa: F401
