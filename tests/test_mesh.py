"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import re

import numpy as np
import pytest

from vgen_tpu.crypto.address import AddressFormat, AddressGenerator
from vgen_tpu.parallel.mesh import MeshScanner, make_mesh
from vgen_tpu.pattern import Pattern

BATCH = 256


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_super_batch_match_all():
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    counts, indices, ops, total_count, total_ops = sc.run_super_batch(
        Pattern("^1"), base_scalar=10_000
    )
    assert total_count == 8 * BATCH
    assert total_ops == 8 * BATCH
    assert list(counts) == [BATCH] * 8


def test_super_batch_device_key_mapping():
    """A specific key's match must appear on the right device at the right
    index -- validates the key-space sharding arithmetic."""
    base = 50_000
    dev, idx = 5, 37
    key = base + dev * BATCH + 1 + idx
    addr = AddressGenerator(AddressFormat.P2PKH).generate(
        key.to_bytes(32, "big")
    ).address
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    counts, indices, ops, total_count, _ = sc.run_super_batch(
        Pattern(f"^{re.escape(addr)}$"), base_scalar=base
    )
    assert total_count == 1
    assert counts[dev] == 1
    assert int(indices[dev][0]) == idx


def test_mesh_scan_range_finds_key():
    key = 0x54321
    addr = AddressGenerator(AddressFormat.P2PKH).generate(
        key.to_bytes(32, "big")
    ).address
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    res = sc.scan(
        Pattern(f"^{re.escape(addr)}$"),
        count=1,
        start=0x54000,
        end=0x55000,
    )
    assert len(res.matches) == 1
    assert res.matches[0].hex == key.to_bytes(32, "big").hex()


def test_mesh_scan_random_mode():
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    res = sc.scan(Pattern("^1"), count=3)
    assert len(res.matches) == 3
    assert res.operations >= 3


def test_mesh_range_remaining_mask():
    """Range shorter than one super-batch: ops must equal the range size."""
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    n_keys = 3 * BATCH + 17  # spans 4 devices partially
    res = sc.scan(
        Pattern("^1ZZZZZZZZZZZ"), count=1, start=9000, end=9000 + n_keys - 1
    )
    assert res.matches == []
    assert res.operations == n_keys


def test_mesh_scan_checkpoint_resume(tmp_path):
    """Interrupt a mesh range scan via max_super_batches, resume from the
    checkpoint, and match an uninterrupted run exactly."""
    from vgen_tpu.scan.checkpoint import CheckpointManager

    pat = Pattern("^1B")
    start, end = 0x100, 0x100 + 5 * 8 * BATCH - 1  # 5 super-batches

    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    full = sc.scan(pat, count=0, start=start, end=end)
    expected = sorted(m.address for m in full.matches)
    assert expected

    def mgr():
        return CheckpointManager(
            str(tmp_path / "mesh.json"), pattern="^1B", fmt="p2pkh",
            start=start, end=end, save_interval_secs=0.0,
        )

    partial = sc.scan(
        pat, count=0, start=start, end=end, checkpoint=mgr(),
        max_super_batches=2,
    )
    assert partial.operations == 2 * 8 * BATCH

    resumed = sc.scan(pat, count=0, start=start, end=end, checkpoint=mgr())
    assert resumed.operations == full.operations
    assert sorted(m.address for m in resumed.matches) == expected


def test_mesh_scan_pipelined_matches_unpipelined():
    """in_flight=3 must visit exactly the same keys as in_flight=1."""
    key = 0x54321
    addr = AddressGenerator(AddressFormat.P2PKH).generate(
        key.to_bytes(32, "big")
    ).address
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    for n in (1, 3):
        res = sc.scan(
            Pattern(f"^{re.escape(addr)}$"), count=0,
            start=0x54000, end=0x54000 + 4 * 8 * BATCH - 1, in_flight=n,
        )
        assert [m.hex for m in res.matches] == [
            key.to_bytes(32, "big").hex()
        ]
        assert res.operations == 4 * 8 * BATCH


def test_scan_with_progress_mesh_routing():
    """ScanConfig(mesh=True) routes the public scan API over the mesh."""
    from vgen_tpu.scan import scanner as sc

    key = 0x2BEEF
    addr = AddressGenerator(AddressFormat.P2PKH).generate(
        key.to_bytes(32, "big")
    ).address
    res = sc.scan_with_progress(
        Pattern(f"^{re.escape(addr)}$"),
        sc.ScanConfig(
            format=AddressFormat.P2PKH, device_batch_size=BATCH,
            start=0x2B000, end=0x2C000, mesh=True,
        ),
    )
    assert [m.hex for m in res.matches] == [key.to_bytes(32, "big").hex()]


def test_mesh_range_reports_all_matches_beyond_topk():
    """Windows whose match count exceeds the TOP_K index slots must be
    recovered in full on the mesh drain path too."""
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    start = 7000
    n_keys = 8 * BATCH + 100  # second super-batch partially filled
    res = sc.scan(Pattern("^1"), count=0, start=start,
                  end=start + n_keys - 1)
    assert res.operations == n_keys
    keys = sorted(int(m.hex, 16) for m in res.matches)
    assert keys == list(range(start, start + n_keys))


def test_mesh_overflow_deep_pipeline_doubling_slot():
    """in_flight=3 + every key matching + a low base (activating the
    masked doubling-slot host check, key == 2*base) must still report
    every range key exactly once, in order (VERDICT r4 item 7)."""
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    start = 50  # base_scalar 49 <= batch: window 0 masks key 98 on device
    n_keys = 2 * 8 * BATCH + 100  # 2.5 super-batches
    res = sc.scan(Pattern("^1"), count=0, start=start,
                  end=start + n_keys - 1, in_flight=3)
    keys = [int(m.hex, 16) for m in res.matches]
    assert keys == list(range(start, start + n_keys))
    assert res.operations == n_keys


def test_mesh_resume_after_mid_scan_stop(tmp_path):
    """Stop a pipelined mesh range scan mid-run via the stop flag, resume
    from the checkpoint, and require the union to cover the whole range
    with no key lost or double-reported."""
    from vgen_tpu.scan.checkpoint import CheckpointManager
    from vgen_tpu.scan.scanner import StopFlag

    pat = Pattern("^1")
    start, end = 6000, 6000 + 4 * 8 * BATCH - 1

    def mgr():
        return CheckpointManager(
            str(tmp_path / "mesh_stop.json"), pattern="^1", fmt="p2pkh",
            start=start, end=end, save_interval_secs=0.0,
        )

    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    flag = StopFlag()
    fired = []

    def cb(ops):
        # fire mid-run: in_flight=2 leaves a super-batch in flight when
        # the stop lands, exercising the post-stop drain ordering
        if not fired:
            fired.append(ops)
            flag.set()

    partial = sc.scan(pat, count=0, start=start, end=end,
                      checkpoint=mgr(), in_flight=2, stop_flag=flag,
                      progress_callback=cb)
    assert fired and partial.operations < end - start + 1

    resumed = sc.scan(pat, count=0, start=start, end=end,
                      checkpoint=mgr(), in_flight=2)
    keys = [int(m.hex, 16) for m in resumed.matches]
    assert keys == list(range(start, end + 1))
    assert resumed.operations == end - start + 1


def test_mesh_random_overflow_recovery_reaches_count():
    """Random mesh scan with target far beyond the TOP_K slots per window:
    the overflow-recovery gate (with the round-5 in-super-batch projected
    count) must still deliver the requested number of matches."""
    sc = MeshScanner(AddressFormat.P2PKH, BATCH)
    want = 2 * 8 * pipeline_topk()
    res = sc.scan(Pattern("^1"), count=want)
    assert len(res.matches) == want
    # no key reported twice
    assert len({m.hex for m in res.matches}) == want


def pipeline_topk():
    from vgen_tpu.ops import pipeline

    return pipeline.TOP_K
