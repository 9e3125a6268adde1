"""_tile_plan boundary behavior (VERDICT r3 weak-6): workable batch sizes
produce Mosaic-legal (vsub, lane) blocks; unworkable ones fast-fail with a
clear message instead of an opaque Mosaic compile error."""

import pytest

from vgen_tpu.ops.pallas_fused import _tile_plan


# every budget used by the fused kernels (interval 4096, DFA 2048,
# GLV-DFA 1024, Ethereum GLV-DFA 512)
BUDGETS = (4096, 2048, 1024, 512)


@pytest.mark.parametrize("budget", BUDGETS)
@pytest.mark.parametrize(
    "batch", [1024, 2048, 4096, 65536, 262144, 524288, 1048576, 2097152]
)
def test_workable_batches(batch, budget):
    vsub, lane = _tile_plan(batch, 512, max_keys=budget)
    # Mosaic-legal: lane tile a multiple of the 128-lane register width,
    # block divides the array, block fits the VMEM budget
    assert lane >= 128 and lane % 128 == 0
    assert batch % vsub == 0
    span = batch // vsub
    assert span % lane == 0
    assert vsub * lane <= budget


@pytest.mark.parametrize("batch", [256, 768, 1000, 123456])
def test_unworkable_batches_fast_fail(batch):
    with pytest.raises(ValueError, match="power-of-two batch"):
        _tile_plan(batch, 512, max_keys=512)


def test_error_message_names_the_batch():
    with pytest.raises(ValueError, match="batch=1000"):
        _tile_plan(1000, 512)
