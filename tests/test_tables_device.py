"""On-device iG table construction (tables.ig_table_jax) vs the host
incremental oracle (crypto.secp256k1.ig_table).

The device build is a log-doubling construction that uploads only ~20
base points (tables.py module doc); these tests pin its output to the
host table bit-for-bit, including the doubling lanes (i = 2^s) the
branch-free mixed add must route through its doubling path, and
non-power-of-two counts.

slow-marked: each build jit costs ~60 s on XLA:CPU at -O0 (the same
pathology as the other slow-marked numerics conformance tests).  On the
real chip the build is additionally certified by scripts/validate_fused.py
+ bench.py, whose oracle sections scan with a device-built table."""

import numpy as np
import pytest

from vgen_tpu.scan import tables


def _host(count):
    tx, ty = tables.ig_table_limbs(count)
    return np.asarray(tx), np.asarray(ty)


@pytest.mark.slow
def test_device_build_matches_host_pow2():
    tx_d, ty_d = tables.ig_table_jax(256)
    tx_h, ty_h = _host(256)
    np.testing.assert_array_equal(np.asarray(tx_d), tx_h)
    np.testing.assert_array_equal(np.asarray(ty_d), ty_h)


@pytest.mark.slow
def test_device_build_matches_host_non_pow2():
    tx_d, ty_d = tables.ig_table_jax(100)
    tx_h, ty_h = _host(100)
    np.testing.assert_array_equal(np.asarray(tx_d), tx_h)
    np.testing.assert_array_equal(np.asarray(ty_d), ty_h)


@pytest.mark.slow
def test_device_build_single_point():
    tx_d, ty_d = tables.ig_table_jax(1)
    tx_h, ty_h = _host(1)
    np.testing.assert_array_equal(np.asarray(tx_d), tx_h)
    np.testing.assert_array_equal(np.asarray(ty_d), ty_h)


@pytest.mark.slow
def test_device_build_matches_host_pow2_large():
    # crosses the chain_len=256 boundary of the final normalization
    tx_d, ty_d = tables.ig_table_jax(512)
    tx_h, ty_h = _host(512)
    np.testing.assert_array_equal(np.asarray(tx_d), tx_h)
    np.testing.assert_array_equal(np.asarray(ty_d), ty_h)


def test_ig_table_arrays_cpu_uses_host_path():
    # on the CPU test platform ig_table_arrays returns the npz table
    # (NOT slow: no builder jit on this path)
    tx, ty = tables.ig_table_arrays(64)
    tx_h, ty_h = _host(64)
    np.testing.assert_array_equal(np.asarray(tx), tx_h)
    np.testing.assert_array_equal(np.asarray(ty), ty_h)
