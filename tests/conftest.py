"""Test configuration: force JAX onto CPU with 8 virtual devices.

Unit/parity tests must be hardware-independent and able to exercise
multi-chip sharding logic, so JAX is pinned to the CPU platform with
``--xla_force_host_platform_device_count=8`` (the same mechanism the driver
uses to dry-run the multi-chip path).  Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
