"""Partial-evaluated word-level hash160 path vs hashlib and the byte path.

The word path (ops/bitops.py + sha256.compress_pe + ripemd160
._rounds_pe) is what the fused Pallas interval kernels run; these tests pin
it to hashlib ground truth and to the generic byte-level implementations
(the reference validates its device hashes only implicitly, SURVEY §4 --
we check them directly)."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.crypto.hashes import ripemd160 as host_ripemd
from vgen_tpu.ops import encode, pipeline, sha256 as dev_sha, u256

rng = random.Random(41)
B = 16


def _rand_xs(n=B):
    return [rng.getrandbits(256) % ((1 << 256) - 2**32 - 977) for _ in range(n)]


def _words_to_bytes(wlist):
    w = np.asarray(jnp.stack(wlist))
    return [
        b"".join(int(w[i, b]).to_bytes(4, "big") for i in range(w.shape[0]))
        for b in range(w.shape[1])
    ]


def test_sha256_x33_state_int_parity():
    xs = _rand_xs()
    limbs = jnp.asarray(u256.from_int(xs))
    for parity in (2, 3):
        got = _words_to_bytes(dev_sha.sha256_x33_state(limbs, parity))
        for b, x in enumerate(xs):
            msg = bytes([parity]) + x.to_bytes(32, "big")
            assert got[b] == hashlib.sha256(msg).digest()


def test_sha256_x33_state_traced_parity():
    xs = _rand_xs()
    limbs = jnp.asarray(u256.from_int(xs))
    par = np.asarray([2 + (i & 1) for i in range(B)], dtype=np.uint32)
    got = _words_to_bytes(dev_sha.sha256_x33_state(limbs, jnp.asarray(par)))
    for b, x in enumerate(xs):
        msg = bytes([int(par[b])]) + x.to_bytes(32, "big")
        assert got[b] == hashlib.sha256(msg).digest()


def test_hash160_words_vs_hashlib():
    xs = _rand_xs()
    limbs = jnp.asarray(u256.from_int(xs))
    got = _words_to_bytes(encode.hash160_33_words_from_x(limbs, 3))
    for b, x in enumerate(xs):
        msg = bytes([3]) + x.to_bytes(32, "big")
        ref = host_ripemd(hashlib.sha256(msg).digest())
        assert got[b] == ref


def test_script_hash_words_vs_byte_path():
    xs = _rand_xs()
    limbs = jnp.asarray(u256.from_int(xs))
    got = _words_to_bytes(
        encode.script_hash_words(encode.hash160_33_words_from_x(limbs, 2))
    )
    for b, x in enumerate(xs):
        msg = bytes([2]) + x.to_bytes(32, "big")
        h160 = host_ripemd(hashlib.sha256(msg).digest())
        ref = host_ripemd(
            hashlib.sha256(bytes([0x00, 0x14]) + h160).digest()
        )
        assert got[b] == ref


def test_interval_value_words_unroll_parity():
    xs = _rand_xs()
    ys = _rand_xs()
    xl = jnp.asarray(u256.from_int(xs))
    yl = jnp.asarray(u256.from_int(ys))
    for fmt in (AddressFormat.P2PKH, AddressFormat.P2WPKH,
                AddressFormat.P2SH_P2WPKH):
        w1, ok1 = pipeline.interval_value_words(fmt, xl, yl, unroll=True)
        w0, ok0 = pipeline.interval_value_words(fmt, xl, yl, unroll=False)
        assert ok1 is None and ok0 is None
        assert len(w1) == len(w0) == 5
        for a, b in zip(w1, w0):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_glv_interval_mask_unroll_parity():
    xs = _rand_xs()
    ys = _rand_xs()
    xl = jnp.asarray(u256.from_int(xs))
    yl = jnp.asarray(u256.from_int(ys))
    lo = jnp.zeros((2, 5), dtype=jnp.uint32)
    hi = jnp.full((2, 5), 0xFFFFFFFF, dtype=jnp.uint32)
    hi = hi.at[0, 0].set(0x3FFFFFFF)  # narrow slot 0 so masks vary
    hi = hi.at[1, 0].set(0x0000FFFF)
    for fmt in (AddressFormat.P2PKH, AddressFormat.P2SH_P2WPKH,
                AddressFormat.P2PKH_UNCOMPRESSED):
        m1 = np.asarray(
            pipeline.glv_interval_mask(fmt, xl, yl, lo, hi, unroll=True)
        )
        m0 = np.asarray(
            pipeline.glv_interval_mask(fmt, xl, yl, lo, hi, unroll=False)
        )
        np.testing.assert_array_equal(m1, m0)
        assert m1.any()  # slot hi=full-range guarantees some hits


def test_symbols_unroll_parity():
    """Word-path symbols (unroll=True) == byte-path symbols (unroll=False)
    for every Base58/Bech32 hash160 format."""
    xs = _rand_xs()
    ys = _rand_xs()
    xl = jnp.asarray(u256.from_int(xs))
    yl = jnp.asarray(u256.from_int(ys))
    for fn in (pipeline.symbols_p2pkh, pipeline.symbols_p2wpkh,
               pipeline.symbols_p2sh_p2wpkh):
        s1, l1 = fn(xl, yl, unroll=True)
        s0, l0 = fn(xl, yl, unroll=False)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))


def test_base58check_checksum_word():
    import hashlib as hl

    xs = _rand_xs()
    limbs = jnp.asarray(u256.from_int(xs))
    h160w = encode.hash160_33_words_from_x(limbs, 2)
    for version in (0, 5):
        cw = np.asarray(encode.base58check_checksum_word(version, h160w))
        h160b = _words_to_bytes(h160w)
        for b in range(B):
            payload = bytes([version]) + h160b[b]
            ref = hl.sha256(hl.sha256(payload).digest()).digest()[:4]
            assert int(cw[b]).to_bytes(4, "big") == ref


def test_hash160_65_words_vs_hashlib():
    xs = _rand_xs()
    ys = _rand_xs()
    xl = jnp.asarray(u256.from_int(xs))
    yl = jnp.asarray(u256.from_int(ys))
    got = _words_to_bytes(encode.hash160_65_words_from_xy(xl, yl))
    for b in range(B):
        msg = (bytes([4]) + xs[b].to_bytes(32, "big")
               + ys[b].to_bytes(32, "big"))
        assert got[b] == host_ripemd(hashlib.sha256(msg).digest())
    # symbols parity for the uncompressed format
    s1, l1 = pipeline.symbols_p2pkh_uncompressed(xl, yl, unroll=True)
    s0, l0 = pipeline.symbols_p2pkh_uncompressed(xl, yl, unroll=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
    w1, _ = pipeline.interval_value_words(
        AddressFormat.P2PKH_UNCOMPRESSED, xl, yl, unroll=True
    )
    w0, _ = pipeline.interval_value_words(
        AddressFormat.P2PKH_UNCOMPRESSED, xl, yl, unroll=False
    )
    for a, c in zip(w1, w0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_eth_account_words_from_xy():
    from vgen_tpu.crypto.hashes import keccak256
    from vgen_tpu.ops import keccak as dev_keccak

    xs = _rand_xs()
    ys = _rand_xs()
    xl = jnp.asarray(u256.from_int(xs))
    yl = jnp.asarray(u256.from_int(ys))
    got = _words_to_bytes(dev_keccak.eth_account_words_from_xy(xl, yl))
    for b in range(B):
        pub = xs[b].to_bytes(32, "big") + ys[b].to_bytes(32, "big")
        assert got[b] == keccak256(pub)[12:32]
    # interval path parity (unroll True vs False)
    w1, _ = pipeline.interval_value_words(
        AddressFormat.ETHEREUM, xl, yl, unroll=True
    )
    w0, _ = pipeline.interval_value_words(
        AddressFormat.ETHEREUM, xl, yl, unroll=False
    )
    for a, c in zip(w1, w0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_symbols_ethereum_unroll_parity():
    """Gather-free EIP-55 word path == fori_loop byte path (symbols+case)."""
    xs = _rand_xs()
    ys = _rand_xs()
    xl = jnp.asarray(u256.from_int(xs))
    yl = jnp.asarray(u256.from_int(ys))
    s1, l1 = pipeline.symbols_ethereum(xl, yl, unroll=True)
    s0, l0 = pipeline.symbols_ethereum(xl, yl, unroll=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))


def test_glv_mask_ethereum_unroll_parity():
    from vgen_tpu.crypto import secp256k1 as ec

    # real curve points so +-y are genuine (any y works for mask parity)
    xs = _rand_xs()
    ys = _rand_xs()
    xl = jnp.asarray(u256.from_int(xs))
    yl = jnp.asarray(u256.from_int([y % ec.P for y in ys]))
    lo = jnp.zeros((2, 5), dtype=jnp.uint32)
    hi = jnp.full((2, 5), 0xFFFFFFFF, dtype=jnp.uint32)
    hi = hi.at[0, 0].set(0x3FFFFFFF)
    m1 = np.asarray(pipeline.glv_interval_mask(
        AddressFormat.ETHEREUM, xl, yl, lo, hi, unroll=True))
    m0 = np.asarray(pipeline.glv_interval_mask(
        AddressFormat.ETHEREUM, xl, yl, lo, hi, unroll=False))
    np.testing.assert_array_equal(m1, m0)


def test_compress_pe_all_traced_matches_loop():
    # generic traced inputs: PE path == fori_loop path
    msgs = [bytes([rng.randrange(256) for _ in range(55)]) for _ in range(B)]
    arr = np.zeros((55, B), dtype=np.uint32)
    for b, m in enumerate(msgs):
        for i, byte in enumerate(m):
            arr[i, b] = byte
    data = jnp.asarray(arr)
    d1 = np.asarray(dev_sha.sha256_bytes(data, 55, unroll=True))
    d0 = np.asarray(dev_sha.sha256_bytes(data, 55, unroll=False))
    np.testing.assert_array_equal(d1, d0)
