"""A/B prototype: (V, T) 2D-batch tiles vs flat (tile,) rows in the fused
GLV interval kernel (the flagship P2PKH hot path).

Round-3 measurement (scripts/microbench_rows.py + follow-ups on the real
chip, with forced host sync -- block_until_ready does not block through the
tunnel): the VPU is LATENCY-bound on dependent chains of narrow row ops
(~150 G lane-ops/s at one (1024,)-row per op vs ~890 G marginal at width
16).  The fused kernels' SHA/RIPEMD word paths and carry chains are exactly
such chains on (tile,) rows.  Tiling the batch as (V, T) rows gives every
chain step V*T lanes, amortizing instruction latency.

Usage: python scripts/proto_vtile.py [B] [V] [T]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/vgen_tpu/jaxcache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import pallas_fused, pipeline


def make_vtile_range_glv(fmt, B, V, T):
    NV = B // T
    assert NV % V == 0
    grid = NV // V

    def kernel(rem_ref, lo_ref, hi_ref, bx_ref, by_ref, tx_ref, ty_ref,
               inv_ref, match_ref):
        i = pl.program_id(0)
        bx = bx_ref[:, 0, 0][:, None, None]
        by = by_ref[:, 0, 0][:, None, None]
        x3, valid = pallas_fused._ec_finish_x(
            bx, by, tx_ref[...], ty_ref[...], inv_ref[...]
        )
        mask = pipeline.glv_interval_mask(fmt, x3, None, lo_ref, hi_ref,
                                          unroll=True)
        gidx = (
            i * (V * T)
            + jax.lax.broadcasted_iota(jnp.int32, (V, T), 0) * T
            + jax.lax.broadcasted_iota(jnp.int32, (V, T), 1)
        )
        valid = valid & (gidx < rem_ref[0])
        match_ref[0] = jnp.where(valid, mask, 0)

    limb = lambda: pl.BlockSpec((16, V, T), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # remaining (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo
            pl.BlockSpec(memory_space=pltpu.SMEM),  # hi
            pl.BlockSpec((16, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            limb(),
            limb(),
            limb(),
        ],
        out_specs=pl.BlockSpec((1, V, T), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NV, T), jnp.int32),
    )

    def fn(remaining, lo, hi, bx, by, tx, ty, inv_dx):
        out = call(
            jnp.reshape(jnp.asarray(remaining, dtype=jnp.int32), (1,)),
            lo, hi,
            bx.reshape(16, 1, 1), by.reshape(16, 1, 1),
            tx.reshape(16, NV, T),
            ty.reshape(16, NV, T),
            inv_dx.reshape(16, NV, T),
        )
        return out.reshape(1, B)

    return fn


def _force(r):
    return np.asarray(jnp.sum(r & jnp.int32(3)))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    fmt = AddressFormat.P2PKH
    print(f"backend={jax.default_backend()} B={B} V={V} T={T}")

    rng = np.random.RandomState(7)
    mk = lambda: jnp.asarray(
        rng.randint(0, 1 << 16, size=(16, B)).astype(np.uint32)
    )
    tx, ty, inv = mk(), mk(), mk()
    bx = jnp.asarray(rng.randint(0, 1 << 16, size=(16,)).astype(np.uint32))
    by = jnp.asarray(rng.randint(0, 1 << 16, size=(16,)).astype(np.uint32))
    # a couple of non-empty intervals so matching logic isn't all-false
    lo = np.zeros((8, 5), dtype=np.uint32)
    hi = np.zeros((8, 5), dtype=np.uint32)
    lo[:, 4] = 1
    lo[0] = [0, 0, 0, 0, 0]
    hi[0] = [1 << 24, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF]
    lo_j, hi_j = jnp.asarray(lo), jnp.asarray(hi)

    cur = jax.jit(pallas_fused.fused_range_match_fn(fmt, B, tile=512,
                                                    glv=True))
    new = jax.jit(make_vtile_range_glv(fmt, B, V, T))

    t0 = time.perf_counter()
    m_cur = np.asarray(cur(B, lo_j, hi_j, bx, by, tx, ty, inv))
    print(f"current compiled+ran in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    m_new = np.asarray(new(B, lo_j, hi_j, bx, by, tx, ty, inv))
    print(f"vtile   compiled+ran in {time.perf_counter()-t0:.1f}s")
    equal = np.array_equal(m_cur, m_new)
    print(f"masks equal: {equal}  (nonzero cur={np.count_nonzero(m_cur)} "
          f"new={np.count_nonzero(m_new)})")

    for name, f in (("current", cur), ("vtile", new)):
        _force(f(B, lo_j, hi_j, bx, by, tx, ty, inv))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                r = f(B, lo_j, hi_j, bx, by, tx, ty, inv)
            _force(r)
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"{name:8s} {best*1e3:8.2f} ms/window  "
              f"{B/best/1e6:8.1f} M pos/s  {6*B/best/1e6:8.1f} M keys/s")


if __name__ == "__main__":
    main()
