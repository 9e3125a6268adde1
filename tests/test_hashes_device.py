"""Device hash kernels vs the host oracle (hashlib / pure-Python reference)."""

import hashlib
import random

import jax
import jax.numpy as jnp
import numpy as np

from vgen_tpu.crypto.hashes import keccak256, ripemd160, tagged_hash
from vgen_tpu.ops import keccak as dev_keccak
from vgen_tpu.ops import ripemd160 as dev_ripemd
from vgen_tpu.ops import sha256 as dev_sha

rng = random.Random(3)
B = 8


def batch_bytes(messages):
    """list of equal-length byte strings -> (L, B) uint32 array."""
    L = len(messages[0])
    arr = np.zeros((L, len(messages)), dtype=np.uint32)
    for b, m in enumerate(messages):
        for i, byte in enumerate(m):
            arr[i, b] = byte
    return jnp.asarray(arr)


def unbatch(arr):
    a = np.asarray(arr)
    return [bytes(a[:, b].astype(np.uint8)) for b in range(a.shape[1])]


def test_sha256_33byte():
    msgs = [bytes([rng.randrange(256) for _ in range(33)]) for _ in range(B)]
    got = unbatch(jax.jit(lambda d: dev_sha.sha256_bytes(d, 33))(batch_bytes(msgs)))
    assert got == [hashlib.sha256(m).digest() for m in msgs]


def test_sha256_25byte_and_double():
    msgs = [bytes([rng.randrange(256) for _ in range(25)]) for _ in range(B)]
    got = unbatch(jax.jit(lambda d: dev_sha.sha256_bytes(d, 25))(batch_bytes(msgs)))
    assert got == [hashlib.sha256(m).digest() for m in msgs]
    got2 = unbatch(
        jax.jit(lambda d: dev_sha.double_sha256_bytes(d, 25))(batch_bytes(msgs))
    )
    assert got2 == [hashlib.sha256(hashlib.sha256(m).digest()).digest() for m in msgs]


def test_sha256_edge_lengths():
    for L in (1, 22, 55):
        msgs = [bytes([rng.randrange(256) for _ in range(L)]) for _ in range(B)]
        got = unbatch(
            jax.jit(lambda d, L=L: dev_sha.sha256_bytes(d, L))(batch_bytes(msgs))
        )
        assert got == [hashlib.sha256(m).digest() for m in msgs], L


def test_ripemd160_digest32():
    msgs = [bytes([rng.randrange(256) for _ in range(32)]) for _ in range(B)]
    got = unbatch(jax.jit(dev_ripemd.ripemd160_digest32)(batch_bytes(msgs)))
    assert got == [ripemd160(m) for m in msgs]


def test_hash160_pipeline():
    pubs = [bytes([rng.randrange(256) for _ in range(33)]) for _ in range(B)]
    f = jax.jit(
        lambda d: dev_ripemd.ripemd160_digest32(dev_sha.sha256_bytes(d, 33))
    )
    got = unbatch(f(batch_bytes(pubs)))
    assert got == [ripemd160(hashlib.sha256(m).digest()) for m in pubs]


def test_keccak256_64byte():
    msgs = [bytes([rng.randrange(256) for _ in range(64)]) for _ in range(B)]
    got = unbatch(
        jax.jit(lambda d: dev_keccak.keccak256_bytes(d, 64))(batch_bytes(msgs))
    )
    assert got == [keccak256(m) for m in msgs]


def test_keccak256_40byte():
    msgs = [bytes([rng.randrange(256) for _ in range(40)]) for _ in range(B)]
    got = unbatch(
        jax.jit(lambda d: dev_keccak.keccak256_bytes(d, 40))(batch_bytes(msgs))
    )
    assert got == [keccak256(m) for m in msgs]


def test_keccak256_full_block_edge():
    msgs = [bytes([rng.randrange(256) for _ in range(135)]) for _ in range(B)]
    got = unbatch(
        jax.jit(lambda d: dev_keccak.keccak256_bytes(d, 135))(batch_bytes(msgs))
    )
    assert got == [keccak256(m) for m in msgs]


def test_tagged_hash_midstate():
    mid = dev_sha.tagged_midstate("TapTweak")
    msgs = [bytes([rng.randrange(256) for _ in range(32)]) for _ in range(B)]
    got = unbatch(
        jax.jit(lambda d: dev_sha.tagged_hash_32(mid, d))(batch_bytes(msgs))
    )
    assert got == [tagged_hash("TapTweak", m) for m in msgs]
