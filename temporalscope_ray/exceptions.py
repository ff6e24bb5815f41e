"""Error taxonomy matching the reference library.

Exception class names and message conventions mirror the reference
(`/root/reference/src/temporalscope/core/exceptions.py:26-123`) so
error-path tests can match messages verbatim.
"""

from __future__ import annotations


class TimeFrameError(Exception):
    """Base class for temporal-dataset errors."""


class TimeColumnError(TimeFrameError):
    """Validation issues with the time column."""


class TargetColumnWarning(UserWarning):
    """Potential issues with the target column."""


class ModeValidationError(TimeFrameError):
    """Invalid mode specified."""

    def __init__(self, mode, message: str = "Invalid mode specified"):
        self.mode = mode
        self.message = f"{message}: {mode}"
        super().__init__(self.message)


class DataFrameValidationError(TimeFrameError):
    """Dataset validation issues (invalid data / schema mismatch)."""
