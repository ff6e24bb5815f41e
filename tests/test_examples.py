"""Smoke-run the tutorial examples (reference parity:
tutorial_notebooks/Introduction/1-3 + End to End). Each example's
``main()`` reuses the session Ray fixture (it only calls ray.init when
no session exists)."""

import importlib.util
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(name: str) -> None:
    path = os.path.abspath(os.path.join(EXAMPLES_DIR, name))
    spec = importlib.util.spec_from_file_location(name.removesuffix(".py"), path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    mod.main()


@pytest.mark.parametrize("name", [
    "01_load_data_temporal_dataset.py",
    "02_single_step_target_shifting.py",
    "03_data_quality_checks.py",
    "04_end_to_end_health_monitoring.py",
    "05_corpus_curation.py",
    "06_feature_engineering.py",
    "07_behavioral_analytics.py",
    "08_warehouse_analytics.py",
    "09_behavioral_feature_store.py",
    "10_resumable_job.py",
    "11_analytics_closures.py",
])
def test_example_runs(name, capsys):
    _run(name)
    out = capsys.readouterr().out
    assert out.strip(), "example produced no output"
