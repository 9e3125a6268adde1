"""Raw VPU instruction-cost microbench inside Pallas kernels.

Times R repetitions of a single op on a (16, T) tile across a B-wide grid,
isolating per-op cost: u32 add / u32 mul / f32 mul / shifts / cvt.
The loop body XORs/permutes to defeat CSE between iterations.
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

T = int(os.environ.get("T", 512))
B = int(os.environ.get("B", 524288))
R = int(os.environ.get("R", 256))


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


def make(op):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        for _ in range(R):
            if op == "add":
                a = a + b
            elif op == "mul":
                a = a * b
            elif op == "mulmask":
                a = (a * b) & jnp.uint32(0xFFFF)
            elif op == "shr":
                a = (a >> 16) + b
            elif op == "fmul":
                af = a.astype(jnp.float32) * 0.5
                a = (af * af).astype(jnp.uint32) + b
            elif op == "xor":
                a = a ^ b
            b = b ^ a  # serialize
        o_ref[...] = a

    limb = lambda: pl.BlockSpec((16, T), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=B // T,
        in_specs=[limb(), limb()],
        out_specs=pl.BlockSpec((16, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, B), jnp.uint32),
    )
    return jax.jit(call)


rng = np.random.default_rng(7)
a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))

n_elem = 16 * B
for op in ("xor", "add", "mul", "mulmask", "shr", "fmul"):
    f = make(op)
    t = timeit(f, a, b)
    per = t / (R * 2)  # 2 serialized ops per rep (op + xor)
    print(f"{op:8s}: {t*1e3:7.2f} ms  ->  {per*1e12/n_elem*1024:7.2f} "
          f"ps/elem*1024lanes ({per/ (1/0.94e9) / (n_elem/1024):.2f} cyc/nativeop)",
          flush=True)
