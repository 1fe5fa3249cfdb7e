"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's device parametrization strategy (reference:
tests/test_layers.py:10-15 runs every test on cpu and cuda): here every test runs on
the CPU XLA backend, and sharding-aware tests see an 8-device virtual mesh via
--xla_force_host_platform_device_count, per SURVEY.md §4.

The session environment pins JAX_PLATFORMS=axon (single tunneled TPU chip) through a
sitecustomize hook, so the env var alone is not enough — we also update jax.config
after import.
"""
import os

if os.environ.get("MESHRCNN_TEST_TPU", "0") != "1":
    # default: CPU backend with 8 virtual devices (most tests; CI-safe)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


# Tiering: heavy modules (full train-step compiles, production shapes) carry the
# `slow` marker so `pytest -m "not slow"` is the fast (~2 min) feedback loop on
# this 1-core host; the full suite is unchanged. Per-module idle timings:
# test_train_step ~14 min, test_pix3d+test_ops ~6 min, test_checkpoint ~5 min,
# test_convert ~5 min, test_api ~4 min, test_harness ~2 min; everything else
# (geometry/data/detection ops, layers, metrics, parity, IO) totals ~2-3 min.
_SLOW_MODULES = {"test_train_step", "test_pix3d", "test_ops", "test_harness",
                 "test_convert", "test_api", "test_checkpoint"}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
# MESHRCNN_TEST_TPU=1 leaves the session backend alone so the TPU-gated tests
# (Pallas kernels; skipif on jax.default_backend()) run on the real chip:
#   MESHRCNN_TEST_TPU=1 python -m pytest tests/test_chamfer_pallas.py -q
