"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Real-TPU benchmarking happens in bench.py, not in tests; tests validate
numerics + multi-chip sharding on the CPU backend (the strategy SURVEY.md §4
prescribes: --xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
