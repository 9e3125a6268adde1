"""Compare mul_wide formulations on TPU: scalar-row elementwise (current),
limb-row vectorized, and 4-plane dots."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/vgen_tpu/jaxcache"),
)

from vgen_tpu.ops import u256
from vgen_tpu.ops.u256 import LIMB_BITS, LIMB_MASK, NLIMBS, carry_propagate

W = 8192
rng = np.random.default_rng(7)
a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, W), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, W), dtype=np.uint32))


def mul_v1(a, b):  # current scalar-row elementwise
    n = NLIMBS
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * n)
    for i in range(n):
        for j in range(n):
            q = a[i] * b[j]
            k = i + j
            cols[k] = cols[k] + (q & LIMB_MASK)
            cols[k + 1] = cols[k + 1] + (q >> LIMB_BITS)
    prod, _ = carry_propagate(cols, 2 * n)
    return prod


def mul_v2(a, b):  # limb-row vectorized: 16 iterations of (16..32, W) ops
    n = NLIMBS
    batch = a.shape[1:]
    zrow = jnp.zeros((1,) + tuple(batch), dtype=jnp.uint32)
    acc_lo = jnp.zeros((2 * n,) + tuple(batch), dtype=jnp.uint32)
    acc_hi = jnp.zeros((2 * n,) + tuple(batch), dtype=jnp.uint32)
    for j in range(n):
        q = a * b[j][None]  # (16, W)
        lo = q & LIMB_MASK
        hi = q >> LIMB_BITS
        pad_b = jnp.tile(zrow, (j, 1))
        pad_t = jnp.tile(zrow, (2 * n - n - j, 1))
        acc_lo = acc_lo + jnp.concatenate([pad_b, lo, pad_t], axis=0)
        pad_b2 = jnp.tile(zrow, (j + 1, 1))
        pad_t2 = jnp.tile(zrow, (2 * n - n - j - 1, 1))
        acc_hi = acc_hi + jnp.concatenate([pad_b2, hi, pad_t2], axis=0)
    cols = acc_lo + acc_hi  # per-column < 32 * 2^16 = 2^21
    prod, _ = carry_propagate([cols[k] for k in range(2 * n)], 2 * n)
    return prod


def mul_v3(a, b):  # 4-plane dots
    n = NLIMBS
    batch_shape = a.shape[1:]
    p = a[:, None] * b[None, :]
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS
    S0, S1 = u256._antidiag_matrices(n)
    ll = u256.u32_to_f32(lo & jnp.uint32(0xFF)).reshape(n * n, -1)
    lh = u256.u32_to_f32(lo >> 8).reshape(n * n, -1)
    hl = u256.u32_to_f32(hi & jnp.uint32(0xFF)).reshape(n * n, -1)
    hh = u256.u32_to_f32(hi >> 8).reshape(n * n, -1)
    plane0 = (
        jnp.dot(S0, ll, preferred_element_type=jnp.float32)
        + jnp.dot(S1, hl, preferred_element_type=jnp.float32)
    )
    plane1 = (
        jnp.dot(S0, lh, preferred_element_type=jnp.float32)
        + jnp.dot(S1, hh, preferred_element_type=jnp.float32)
    )
    cols = (
        u256.f32_to_u32(plane0) + (u256.f32_to_u32(plane1) << 8)
    ).reshape((2 * n,) + batch_shape)
    prod, _ = carry_propagate([cols[k] for k in range(2 * n)], 2 * n)
    return prod


N_INNER = 100


def loop_fn(mul):
    @jax.jit
    def f(a, b):
        def body(_, x):
            # rotate result back to 16 limbs so the loop carries state
            return mul(x, b)[:16] | (x[:16] & 0)

        def body2(_, x):
            return mul(x, b)[:16]

        return jax.lax.fori_loop(0, N_INNER, body2, a)

    return f


def timeit(f, *args, n=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


# correctness cross-check on 64 elems
ref = np.asarray(jax.jit(mul_v1)(a, b))[:, :64]
for name, m in [("v2", mul_v2), ("v3", mul_v3)]:
    got = np.asarray(jax.jit(m)(a, b))[:, :64]
    ok = np.array_equal(got, ref)
    print(f"{name} matches v1: {ok}", flush=True)

for name, m in [("v1 scalar-row", mul_v1), ("v2 limb-row", mul_v2),
                ("v3 dots4", mul_v3)]:
    t = timeit(loop_fn(m), a, b)
    print(f"{name}: {t/N_INNER*1e6:8.1f} us/op at (16,{W})", flush=True)
