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
# MESHRCNN_TEST_TPU=1 leaves the session backend alone so the TPU-gated tests
# (Pallas kernels; skipif on jax.default_backend()) run on the real chip:
#   MESHRCNN_TEST_TPU=1 python -m pytest tests/test_chamfer_pallas.py -q
