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
