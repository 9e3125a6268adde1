"""batch_inverse_chain_pallas fallback path (CPU-testable): non-tiling
widths must route to the XLA chain and produce exact inverses.  The
Pallas branch itself is TPU-only and certified on device by
scripts/validate_fused.py (every fused step runs through it)."""

import numpy as np

import jax.numpy as jnp

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.ops import pallas_fused, u256


def test_fallback_small_width_exact():
    import random

    rng = random.Random(3)
    n = 96  # % 4096 != 0 -> XLA chain fallback
    vals = [rng.randrange(1, ec.P - 1) for _ in range(n)]
    limbs = jnp.asarray(
        np.stack([np.asarray(u256.from_int(v)) for v in vals], axis=1)
    )
    inv = np.asarray(pallas_fused.batch_inverse_chain_pallas(limbs))
    got = u256.to_int(inv)
    for v, g in zip(vals, got):
        assert (v * g) % ec.P == 1


def test_fallback_width_one():
    v = 0xDEADBEEF12345
    limbs = jnp.asarray(np.asarray(u256.from_int(v)).reshape(16, 1))
    inv = np.asarray(pallas_fused.batch_inverse_chain_pallas(limbs))
    g = u256.to_int(inv)[0]
    assert (v * g) % ec.P == 1


def test_fallback_guard_zero():
    """guard_zero=True maps zero inputs to finite garbage and still
    inverts every nonzero entry exactly (the P2TR Z-chain contract:
    dead lanes are masked by the caller)."""
    import random

    rng = random.Random(7)
    n = 96
    vals = [rng.randrange(1, ec.P - 1) for _ in range(n)]
    for dead in (0, 17, 95):
        vals[dead] = 0
    limbs = jnp.asarray(
        np.stack([np.asarray(u256.from_int(v)) for v in vals], axis=1)
    )
    inv = np.asarray(
        pallas_fused.batch_inverse_chain_pallas(limbs, guard_zero=True)
    )
    got = u256.to_int(inv)
    for v, g in zip(vals, got):
        if v:
            assert (v * g) % ec.P == 1
        else:
            assert 0 <= g < ec.P  # finite, caller masks
