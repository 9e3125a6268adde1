"""Multi-host bootstrap helpers (single-process degenerate behavior; the
process-spanning path needs a real multi-host pod and is exercised by the
same code through dryrun_multichip's mesh on this CPU platform)."""

import os

from vgen_tpu.parallel import distributed


def test_initialize_noop_without_cluster_env(monkeypatch):
    for k in distributed._AUTO_ENV_HINTS + ("VGEN_COORDINATOR",):
        monkeypatch.delenv(k, raising=False)
    assert distributed.initialize() is False
    assert distributed.is_initialized() is False
    assert distributed.is_multi_host() is False
    assert distributed.process_index() == 0


def test_initialize_false_hint_stays_single_host(monkeypatch):
    # a hint var is set but jax.distributed cannot actually detect a
    # cluster -> must quietly stay single-host, not crash the CLI
    monkeypatch.setenv("CLOUD_TPU_TASK_ID", "0")
    assert distributed.initialize() in (False,)
