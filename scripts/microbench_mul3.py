"""Width scaling + loop-overhead baseline for field.mul on TPU."""
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

from vgen_tpu.ops import field

N_INNER = 100
rng = np.random.default_rng(7)


def timeit(f, *args, n=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


@jax.jit
def trivial_loop(a):
    def body(_, x):
        return (x + jnp.uint32(1)) & jnp.uint32(0xFFFF)

    return jax.lax.fori_loop(0, N_INNER, body, a)


@jax.jit
def mul_loop(a, b):
    def body(_, x):
        return field.mul(x, b)

    return jax.lax.fori_loop(0, N_INNER, body, a)


for W in (2048, 8192, 32768, 131072):
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, W), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, W), dtype=np.uint32))
    t0 = timeit(trivial_loop, a)
    t1 = timeit(mul_loop, a, b)
    print(
        f"W={W:7d}: trivial {t0/N_INNER*1e6:7.2f} us/iter   "
        f"mul {t1/N_INNER*1e6:7.2f} us/iter   "
        f"({t1/N_INNER/W*1e12:6.1f} ps/elem)",
        flush=True,
    )
