"""Opt-in REAL-DEVICE test suite (SURVEY §4 gap: tests/ pins everything to
the CPU backend + Pallas interpret mode, so the Mosaic-compiled kernels are
otherwise only exercised by bench/training, never asserted).

Run manually on a TPU host:  python -m pytest tests_tpu -q
Skips itself cleanly when no TPU is attached.
"""
import jax
import pytest


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        return
    skip = pytest.mark.skip(reason="no TPU backend attached")
    for item in items:
        item.add_marker(skip)
