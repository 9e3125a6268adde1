"""Per-component cost of field.mul inside a Pallas kernel on TPU.

Times R serialized repetitions of: full field.mul, mul_wide only,
_fold512 only, carry_propagate only, and the 16-iteration accumulate loop
without carries -- to locate where the ~9ns/elem (vs ~4ns native-op
estimate) goes.
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

from vgen_tpu.ops import field, ripemd160, sha256, u256
from vgen_tpu.ops.u256 import LIMB_BITS, LIMB_MASK, NLIMBS, carry_propagate

T = int(os.environ.get("T", 512))
B = int(os.environ.get("B", 524288))
R = int(os.environ.get("R", 8))


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


def mul_wide_nocarry(a, b):
    """mul_wide without the final carry pass (returns (32,T) columns)."""
    n = NLIMBS
    batch = tuple(a.shape[1:])
    zrow = jnp.zeros((1,) + batch, dtype=jnp.uint32)

    def shifted(rows, k):
        m = rows.shape[0]
        parts = []
        if k:
            parts.append(jnp.broadcast_to(zrow, (k,) + batch))
        parts.append(rows)
        if 2 * n - m - k:
            parts.append(jnp.broadcast_to(zrow, (2 * n - m - k,) + batch))
        return jnp.concatenate(parts, axis=0)

    acc = None
    for j in range(n):
        q = a * b[j][None]
        contrib = shifted(q & LIMB_MASK, j) + shifted(q >> LIMB_BITS, j + 1)
        acc = contrib if acc is None else acc + contrib
    return acc


def make(mode):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        for _ in range(R):
            if mode == "fieldmul":
                r = field.mul(a, b)
            elif mode == "mulwide":
                r = u256.mul_wide(a, b)[:16]
            elif mode == "nocarry":
                r = mul_wide_nocarry(a, b)[:16] & LIMB_MASK
            elif mode == "fold":
                wide = jnp.concatenate([a, b], axis=0)
                r = field._fold512(wide)
            elif mode == "carry32":
                cols = [a[i % 16] for i in range(32)]
                r = carry_propagate(cols, 32)[0][:16]
            elif mode == "square":
                r = field.square(a)
            elif mode == "mulweak":
                r = field.mul_weak(a, b)
            elif mode == "squareweak":
                r = field.square_weak(a)
            elif mode == "hash160":
                from vgen_tpu.ops import encode

                xb = u256.to_bytes_be(a)
                prefix = jnp.full((1,) + xb.shape[1:], 2, dtype=jnp.uint32)
                h = encode.hash160_33(
                    jnp.concatenate([prefix, xb], axis=0), unroll=True
                )
                r = a ^ (h[:16] << 8) ^ h[2:18]
            elif mode == "sha":
                xb = u256.to_bytes_be(a)
                prefix = jnp.full((1,) + xb.shape[1:], 2, dtype=jnp.uint32)
                d = sha256.sha256_bytes(
                    jnp.concatenate([prefix, xb], axis=0), 33, unroll=True
                )
                r = a ^ (d[:16] << 8) ^ d[16:32]
            elif mode == "ripemd":
                xb = u256.to_bytes_be(a)
                h = ripemd160.ripemd160_digest32(xb)
                r = a ^ (h[:16] << 8) ^ h[4:20]
            a = r & LIMB_MASK
            b = b ^ a
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

base = None
modes = os.environ.get(
    "MODES",
    "carry32,nocarry,mulwide,fold,fieldmul,square,mulweak,squareweak,"
    "sha,ripemd,hash160",
).split(",")
for mode in modes:
    f = make(mode)
    t = timeit(f, a, b)
    per = t / R / B
    print(f"{mode:9s}: {t*1e3:7.2f} ms -> {per*1e9:6.2f} ns/elem "
          f"({per*0.94e9*1024:7.0f} cyc/1024elems)", flush=True)
