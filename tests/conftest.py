import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # NOTE: no global preserve_order here — order-sensitive operators
    # (streaming window, bare-Dataset shifter, mean_fill_pad) scope the
    # flag to their own dataset lineage's DataContext; the suite runs
    # under production defaults to prove that scoping works.
    yield
    ray.shutdown()
