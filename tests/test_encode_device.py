"""Device encoders vs the host oracle, in digit-symbol space."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from vgen_tpu.crypto.encode import (
    BASE58_ALPHABET,
    BECH32_CHARSET,
    base58check_encode,
    eip55_checksum_address,
    segwit_addr_encode,
)
from vgen_tpu.ops import encode as dev_enc

rng = random.Random(11)
B = 8


def batch_bytes(messages):
    L = len(messages[0])
    arr = np.zeros((L, len(messages)), dtype=np.uint32)
    for b, m in enumerate(messages):
        for i, byte in enumerate(m):
            arr[i, b] = byte
    return jnp.asarray(arr)


def test_div58_f32_exhaustive():
    # exact for the full carry-sweep input range
    v = jnp.arange(1 << 20, dtype=jnp.uint32)
    q = jax.jit(dev_enc._div58_f32)(v)
    np.testing.assert_array_equal(np.asarray(q), np.arange(1 << 20) // 58)


def test_div58_magic_exhaustive():
    cur = jnp.arange(58 * 256, dtype=jnp.uint32)
    q, r = jax.jit(dev_enc._divmod58)(cur)
    np.testing.assert_array_equal(np.asarray(q), np.arange(58 * 256) // 58)
    np.testing.assert_array_equal(np.asarray(r), np.arange(58 * 256) % 58)


def _check_base58(payloads):
    syms, length = jax.jit(dev_enc.base58check_symbols)(batch_bytes(payloads))
    syms = np.asarray(syms)
    length = np.asarray(length)
    for b, payload in enumerate(payloads):
        expect = base58check_encode(payload)
        got = "".join(BASE58_ALPHABET[syms[j, b]] for j in range(length[b]))
        assert got == expect, (payload.hex(), got, expect)


def test_base58check_p2pkh_random():
    payloads = [bytes([0]) + bytes(rng.randrange(256) for _ in range(20)) for _ in range(B)]
    _check_base58(payloads)


def test_base58check_leading_zero_hash():
    payloads = [
        bytes([0]) + bytes(z) + bytes(rng.randrange(1, 256) for _ in range(20 - z))
        for z in (0, 1, 2, 5, 10, 19, 20, 3)
    ]
    _check_base58(payloads)


def test_base58check_p2sh_version():
    payloads = [bytes([5]) + bytes(rng.randrange(256) for _ in range(20)) for _ in range(B)]
    _check_base58(payloads)


def test_segwit_v0_symbols():
    progs = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(B)]
    syms, length = jax.jit(lambda p: dev_enc.segwit_symbols(p, 0))(batch_bytes(progs))
    syms = np.asarray(syms)
    assert np.all(np.asarray(length) == 39)
    for b, prog in enumerate(progs):
        expect = segwit_addr_encode("bc", 0, prog)
        got = "bc1" + "".join(BECH32_CHARSET[syms[j, b]] for j in range(39))
        assert got == expect, (prog.hex(), got, expect)


def test_segwit_v1_symbols():
    progs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(B)]
    syms, length = jax.jit(lambda p: dev_enc.segwit_symbols(p, 1))(batch_bytes(progs))
    syms = np.asarray(syms)
    assert np.all(np.asarray(length) == 59)
    for b, prog in enumerate(progs):
        expect = segwit_addr_encode("bc", 1, prog)
        got = "bc1" + "".join(BECH32_CHARSET[syms[j, b]] for j in range(59))
        assert got == expect, (prog.hex(), got, expect)


def test_eth_symbols_eip55():
    from vgen_tpu.pattern.pattern import DIGITS_ETH

    addrs = [bytes(rng.randrange(256) for _ in range(20)) for _ in range(B)]
    syms, length = jax.jit(dev_enc.eth_symbols)(batch_bytes(addrs))
    syms = np.asarray(syms)
    assert np.all(np.asarray(length) == 40)
    for b, a in enumerate(addrs):
        expect = eip55_checksum_address(a)
        got = "0x" + "".join(DIGITS_ETH[syms[j, b]] for j in range(40))
        assert got == expect, (a.hex(), got, expect)


def test_hash160_65():
    import hashlib

    from vgen_tpu.crypto.hashes import ripemd160

    msgs = [bytes(rng.randrange(256) for _ in range(65)) for _ in range(B)]
    got = np.asarray(jax.jit(dev_enc.hash160_65)(batch_bytes(msgs)))
    for b, m in enumerate(msgs):
        expect = ripemd160(hashlib.sha256(m).digest())
        assert bytes(got[:, b].astype(np.uint8)) == expect
