"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's device parametrization strategy (reference:
tests/test_layers.py:10-15 runs every test on cpu and cuda): here every test runs on
the CPU XLA backend, and sharding-aware tests see an 8-device virtual mesh via
--xla_force_host_platform_device_count, per SURVEY.md §4.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
