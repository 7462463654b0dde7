"""Test configuration: force JAX onto a virtual 8-device CPU platform so
sharding/multi-chip tests run anywhere; kernels are still written for TPU
and exercised on real hardware by bench.py.

Note: in this environment the axon TPU plugin ignores JAX_PLATFORMS, so we
use jax.config.update (which wins) in addition to the env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
