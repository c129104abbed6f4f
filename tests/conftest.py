"""Test harness config: force an 8-virtual-device CPU platform so sharding
tests exercise a real Mesh without TPU hardware.

Note: this environment ships an `axon` TPU plugin whose site hook re-forces
JAX_PLATFORMS=axon, so setting the env var alone is not enough — we must
also call jax.config.update after import (safe: no backend has initialized
yet at conftest import time).

Set JET_TPU_TESTS=1 to keep the real accelerator instead — used to run the
on-chip Pallas regression suite (tests/test_tpu_kernels.py) in the bench
environment; every other test still passes there, just slower to compile.
"""
import os

ON_CHIP = os.environ.get("JET_TPU_TESTS", "") == "1"

if not ON_CHIP:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy statistical/FD tests — excluded from the fast tier "
        "(`pytest -m 'not slow'`, <5 min); run the full suite nightly/CI",
    )


if not ON_CHIP:
    jax.config.update("jax_platforms", "cpu")

    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8, jax.devices()
