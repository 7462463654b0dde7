"""Test configuration: force JAX onto a virtual 8-device CPU platform so
sharding/multi-chip tests run anywhere; kernels are still written for TPU
and exercised on real hardware by bench.py."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
