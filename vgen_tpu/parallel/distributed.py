"""Multi-host distribution: jax.distributed bootstrap for pod-scale scans.

The reference has no multi-node/multi-device distribution at all (single
process, single wgpu queue -- SURVEY.md §2.3); this module is the TPU-native
replacement the survey calls for: `jax.distributed.initialize` + a
process-spanning `jax.sharding.Mesh`, with XLA collectives riding ICI
intra-slice and DCN across hosts.

Usage -- run ONE process per host, each seeing its local chips:

    # TPU pod slice (GKE/GCE TPU VMs): cluster env is auto-detected
    vgen-tpu generate -p '^1Cat' ...

    # explicit bootstrap (any cluster):
    VGEN_COORDINATOR=host0:8476 VGEN_NUM_PROCESSES=2 VGEN_PROCESS_ID=0 \
        vgen-tpu generate -p '^1Cat' ...

After initialization `jax.devices()` spans every chip of every host;
parallel.mesh.MeshScanner shards the key space over that global device list,
psum-reduces counts over the mesh, and all-gathers the per-device match
indices so every host re-derives (and can report) every match.  Checkpoint
files are written by process 0 only.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False

# env vars that indicate jax.distributed.initialize() can auto-detect the
# cluster (TPU pod runtime / GKE / Cloud TPU environments)
_AUTO_ENV_HINTS = (
    "TPU_WORKER_HOSTNAMES",
    "TPU_WORKER_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "CLOUD_TPU_TASK_ID",
    "JAX_COORDINATOR_ADDRESS",
)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize jax.distributed for multi-host scanning.

    Explicit args (or VGEN_COORDINATOR / VGEN_NUM_PROCESSES /
    VGEN_PROCESS_ID env vars) bootstrap any cluster; with no args the
    TPU pod cluster environment is auto-detected when present.  Safe to
    call repeatedly.  Returns True iff more than one process participates.

    MUST run before the first JAX backend touch (the CLI calls it from
    resolve_use_device, ahead of the device probe).
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1

    # CPU clusters need a cross-process collectives backend; the flag is a
    # no-op for TPU backends, and must be set before the backend initializes
    # (verified: 2-process x 4-virtual-device CPU mesh psum over gloo,
    # tests/test_distributed.py)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older/newer jax without the flag
        pass

    coordinator_address = coordinator_address or os.environ.get(
        "VGEN_COORDINATOR"
    )
    if num_processes is None and os.environ.get("VGEN_NUM_PROCESSES"):
        num_processes = int(os.environ["VGEN_NUM_PROCESSES"])
    if process_id is None and os.environ.get("VGEN_PROCESS_ID"):
        process_id = int(os.environ["VGEN_PROCESS_ID"])

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _INITIALIZED = True
        return jax.process_count() > 1

    if any(os.environ.get(k) for k in _AUTO_ENV_HINTS):
        try:
            jax.distributed.initialize()
            _INITIALIZED = True
            return jax.process_count() > 1
        except Exception:
            return False  # hint env was a false positive; stay single-host
    return False


def is_initialized() -> bool:
    return _INITIALIZED


def is_multi_host() -> bool:
    import jax

    return _INITIALIZED and jax.process_count() > 1


def process_index() -> int:
    import jax

    return jax.process_index() if _INITIALIZED else 0
