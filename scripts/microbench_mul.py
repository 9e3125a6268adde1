"""Microbench + exactness check of mul/square/inv on the live backend.

All timing loops run INSIDE one jit (lax.fori_loop) so the device tunnel's
per-dispatch RTT doesn't pollute per-op numbers.
"""
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

from vgen_tpu.ops import field, u256

W = 8192
rng = np.random.default_rng(7)


def rand_limbs(w):
    return jnp.asarray(
        rng.integers(0, 1 << 16, size=(16, w), dtype=np.uint32)
    )


a = rand_limbs(W)
b = rand_limbs(W)

# exactness vs Python ints on a slice
mw = jax.jit(u256.mul_wide)
sw = jax.jit(u256.square_wide)
got_m = np.asarray(mw(a, b))[:, :64]
got_s = np.asarray(sw(a))[:, :64]
ai = u256.to_int(np.asarray(a)[:, :64])
bi = u256.to_int(np.asarray(b)[:, :64])
exp_m = [x * y for x, y in zip(ai, bi)]
exp_s = [x * x for x in ai]
assert u256.to_int(got_m.astype(np.uint32)) == exp_m, "mul_wide mismatch"
assert u256.to_int(got_s.astype(np.uint32)) == exp_s, "square_wide mismatch"
print("exactness OK", flush=True)

N_INNER = 100


@jax.jit
def mul_loop(a, b):
    def body(_, x):
        return field.mul(x, b)

    return jax.lax.fori_loop(0, N_INNER, body, a)


@jax.jit
def square_loop(a):
    def body(_, x):
        return field.square(x)

    return jax.lax.fori_loop(0, N_INNER, body, a)


def timeit(f, *args, n=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


t = timeit(mul_loop, a, b)
print(f"field.mul    (16,{W}): {t/N_INNER*1e6:8.1f} us/op", flush=True)
t = timeit(square_loop, a)
print(f"field.square (16,{W}): {t/N_INNER*1e6:8.1f} us/op", flush=True)

# the inversion stage exactly as the fused step runs it: (16, 256, 8192)
TOT = 8 * 262144
C = 256
chain = jax.jit(
    lambda v: field.batch_inverse_chain(v.reshape(16, C, TOT // C))
)
big = jnp.asarray(rng.integers(1, 1 << 16, size=(16, TOT), dtype=np.uint32))
t = timeit(chain, big, n=3)
print(f"batch_inverse_chain {TOT//1024}K keys: {t*1e3:8.1f} ms  "
      f"({TOT/t/1e6:.1f} Mkeys/s inversion-only)", flush=True)
