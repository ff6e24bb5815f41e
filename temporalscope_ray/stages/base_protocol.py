"""The partitioner lifecycle protocol — the user-extension surface
(reference `/root/reference/src/temporalscope/partition/base_protocol.py:88-181`).

Any partitioner exposes the same 4-method lifecycle with Dataset-in /
Dataset-out semantics:

- ``setup()``   — validate configuration against the data's shape
- ``fit()``     — compute partition metadata (boundaries, indices)
- ``transform()`` — lazily yield partition slices (Datasets)
- ``fit_transform()`` — fit then transform

``SlidingWindowPartitioner`` (stages/partition.py) implements it; new
partition strategies (expanding windows, event-count windows,
entity-stratified splits) plug in by implementing this protocol.
"""

from __future__ import annotations

from typing import Iterator, Optional, Protocol, runtime_checkable

import ray.data


@runtime_checkable
class TemporalPartitionerProtocol(Protocol):
    metadata: Optional[dict]

    def setup(self) -> None: ...

    def fit(self) -> None: ...

    def transform(self) -> Iterator[dict[str, Optional[ray.data.Dataset]]]: ...

    def fit_transform(self) -> Iterator[dict[str, Optional[ray.data.Dataset]]]: ...
