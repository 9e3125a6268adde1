"""GLV variant-bitmask resolution: device masks -> host candidate keys.

Device GLV kernels report, per matched index, a 6-bit mask with bit 2v+pi
set when the variant with x = BETA^v * x(kG) and parity index pi matched
(ops/pipeline.glv_interval_mask).  The host derives candidates via
crypto.secp256k1.glv_bit_variant_keys instead of all 6 variants
(scan/scanner.py drain).  These tests pin the bit -> private-key
correspondence against ground-truth point arithmetic.
"""

import pytest

from vgen_tpu.crypto import secp256k1 as ec


KS = [0x123456789ABCDEF, 0xDEADBEEF, 3, ec.N - 5, 0x54321]


def _variant_point(k):
    return ec.scalar_mult(k)


@pytest.mark.parametrize("k", KS)
def test_bit_layout_matches_variant_geometry(k):
    """Variant 2v+s of glv_variant_keys has x = BETA^v * x(kG); the two
    signs of a v share x and have opposite y parities."""
    x0, y0 = _variant_point(k)
    variants = ec.glv_variant_keys(k)
    for v, beta_pow in enumerate((1, ec.BETA, ec.BETA2)):
        xv = x0 * beta_pow % ec.P
        kp, kn = variants[2 * v], variants[2 * v + 1]
        xp, yp = _variant_point(kp)
        xn, yn = _variant_point(kn)
        assert xp == xv and xn == xv
        assert yp % 2 != yn % 2  # opposite parities
        assert yn == ec.P - yp


@pytest.mark.parametrize("k", KS)
def test_hash160_bits_cover_matching_variant(k):
    """hash160 formats: bit 2v+pi means the point (BETA^v x, y with
    y%2 == pi) matched -- glv_bit_variant_keys must return the private key
    of that point among its (at most two) candidates for v."""
    x0, y0 = _variant_point(k)
    variants = ec.glv_variant_keys(k)
    for v in range(3):
        for pi in range(2):
            bits = 1 << (2 * v + pi)
            cands = ec.glv_bit_variant_keys(k, bits)
            # exactly the +- pair of this v, nothing from other vs
            assert set(cands) == {variants[2 * v], variants[2 * v + 1]}
            # the real key (matching parity pi) is among them
            real = next(
                kk for kk in (variants[2 * v], variants[2 * v + 1])
                if _variant_point(kk)[1] % 2 == pi
            )
            assert real in cands


@pytest.mark.parametrize("k", KS)
def test_ethereum_bits_resolve_exactly(k):
    """Ethereum: the kernel hashes (BETA^v x, +-y0) with pi indexing the
    sign directly, so parity_exact resolves bit 2v+pi to ONE key: the one
    whose point y equals y0 (pi=0) / P-y0 (pi=1)."""
    x0, y0 = _variant_point(k)
    for v, beta_pow in enumerate((1, ec.BETA, ec.BETA2)):
        for pi in range(2):
            bits = 1 << (2 * v + pi)
            cands = ec.glv_bit_variant_keys(k, bits, parity_exact=True)
            assert len(cands) == 1
            x, y = _variant_point(cands[0])
            assert x == x0 * beta_pow % ec.P
            assert y == (y0 if pi == 0 else ec.P - y0)


def test_zero_bits_falls_back_to_all_variants():
    k = 0xABCDE
    assert ec.glv_bit_variant_keys(k, 0) == ec.glv_variant_keys(k)


def test_multi_v_bits_union():
    k = 0x999
    variants = ec.glv_variant_keys(k)
    cands = ec.glv_bit_variant_keys(k, (1 << 0) | (1 << 5))  # v=0 and v=2
    assert set(cands) == {variants[0], variants[1], variants[4], variants[5]}
