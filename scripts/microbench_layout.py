"""Does the batch-dim layout matter for per-limb (row) ops inside Pallas?

u256/hash helpers treat values as (16, *batch) and run most work on
(*batch,)-shaped per-limb rows.  If Mosaic lays a (T,) row out as (1, T)
(1 of 8 sublanes live), every carry/hash op wastes 7/8 of the VPU; a
(8, 128)-shaped batch would fill one native vreg exactly.

Modes (per field.mul of R reps):
  flat  : batch shape (T,)        -- current production layout
  vreg  : batch shape (8, 128)    -- one full native vreg per op
  wide  : batch shape (16, 128)   -- two vregs per op
  sq    : batch shape (32, 32)    -- square-ish tile

Env: T (default 1024 = elems per grid step), B total elems, R reps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/vgen_tpu/jaxcache"),
)

from vgen_tpu.ops import field

B = int(os.environ.get("B", 1 << 20))
R = int(os.environ.get("R", 8))

SHAPES = {
    "flat": (1024,),
    "vreg": (8, 128),
    "wide": (16, 128),
    "sq": (32, 32),
}


def _sync(r):
    np.asarray(jax.device_get(r.ravel()[:1]))


def timeit(f, *args, n=10):
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


def make(mode):
    bshape = SHAPES[mode]
    tile = int(np.prod(bshape))

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...].reshape((16,) + bshape)
        b = b_ref[...].reshape((16,) + bshape)
        for _ in range(R):
            r = field.mul_weak(a, b) & jnp.uint32(0xFFFF)
            a = r
            b = b ^ a
        o_ref[...] = a.reshape(16, tile)

    limb = lambda: pl.BlockSpec((16, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=B // tile,
        in_specs=[limb(), limb()],
        out_specs=limb(),
        out_shape=jax.ShapeDtypeStruct((16, B), jnp.uint32),
    )
    return jax.jit(call)


rng = np.random.default_rng(7)
a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))

for mode in os.environ.get("MODES", "flat,vreg,wide,sq").split(","):
    try:
        f = make(mode)
        t = timeit(f, a, b)
        per = t / R / B
        print(f"{mode:5s}: {t*1e3:7.2f} ms -> {per*1e9:6.2f} ns/elem",
              flush=True)
    except Exception as e:
        print(f"{mode:5s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
