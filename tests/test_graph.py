"""Unit tests for connected-components duplicate clustering."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from temporalscope_ray.stages.graph import connected_components


def test_chain_triangle_and_isolated_pair(ray_session):
    pairs = ray.data.from_arrow(
        pa.table({"id_a": [2, 3, 10, 21, 22, 22], "id_b": [1, 2, 11, 20, 21, 20]})
    )
    out = connected_components(pairs, num_buckets=4).to_pandas()
    got = dict(zip(out["id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(ray_session):
    # a 40-vertex path (diameter 39): pointer jumping must converge in
    # ~log2(39)+2 rounds, far under the default max_iters
    n = 40
    pairs = ray.data.from_arrow(
        pa.table({"id_a": list(range(1, n)), "id_b": list(range(n - 1))})
    )
    out = connected_components(pairs, num_buckets=4, max_iters=10).to_pandas()
    assert (out["cluster_id"] == 0).all()
    assert len(out) == n


def test_max_iters_fails_loud(ray_session):
    n = 30
    pairs = ray.data.from_arrow(
        pa.table({"id_a": list(range(1, n)), "id_b": list(range(n - 1))})
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(pairs, num_buckets=2, max_iters=2)
