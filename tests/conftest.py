"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Real-TPU benchmarking happens in bench.py, not in tests; tests validate
numerics + multi-chip sharding on the CPU backend (the strategy SURVEY.md §4
prescribes: --xla_force_host_platform_device_count).

Note: the environment pre-registers a TPU PJRT plugin via sitecustomize and
exports JAX_PLATFORMS=axon, so a plain setdefault is not enough -- we must
override the env var AND pin jax_platforms via the config API before any
backend initializes (otherwise every jit in the suite compiles through the
TPU tunnel at ~60s each).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    # the limb-arithmetic graphs are wide chains of tiny integer ops; XLA:CPU's
    # optimizer is superlinear on them and adds minutes per jit at -O1+
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/vgen_tpu/jaxcache-test")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy numerics-conformance compiles (XLA:CPU takes minutes "
        "per jit at -O0; this env's persistent cache cannot reload CPU AOT "
        "results, so they recompile every run).  Skipped unless RUN_SLOW=1; "
        "run them once per change to ops/ numerics.",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow numerics conformance (set RUN_SLOW=1 to run)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
