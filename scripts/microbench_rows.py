"""Measure Mosaic's effective VPU throughput for 1D row ops vs 2D row ops.

Hypothesis (round 3): the fused kernels' word paths (SHA/RIPEMD/carry
chains) operate on 1D (tile,) rows; if Mosaic lays 1D vectors out as
(1, N) -- one sublane of eight -- those ops run at <=1/8 of VPU peak,
which would explain the ~20% VPU utilization plateau of the GLV kernel
(ROUND2.md item 8).

Four kernels, identical logical work (a dependent chain of CH_LEN u32
add/xor/rot ops over LANES lanes), different row shapes:
  row1d   : rows are (LANES,) 1D              (current kernel layout)
  row2d   : rows are (LANES//128, 128) 2D     (proposed layout)
  full2d  : ops on whole (16, LANES) arrays   (field-op layout, control)
  mul1d/2d: same but with u32 multiply in the chain (mul cost probe)

Run on the real chip:  python scripts/microbench_rows.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024
CH_LEN = 8192  # dependent ops per chain
GRID = 128     # tiles per launch (amortize launch overhead)
REPS = 3


def _chain_body(r, x_rows, mul: bool):
    # dependent chain: each step consumes the previous result
    for i in range(CH_LEN):
        xi = x_rows[i % len(x_rows)]
        if mul and i % 4 == 0:
            r = r * xi + jnp.uint32(1)
        else:
            r = (r + xi) ^ ((r << 7) | (r >> 25))
    return r


def make_row1d(mul=False):
    def kernel(x_ref, o_ref):
        rows = [x_ref[i] for i in range(16)]  # (LANES,) 1D rows
        o_ref[0] = _chain_body(rows[0], rows, mul)

    return pl.pallas_call(
        kernel,
        grid=GRID,
        in_specs=[pl.BlockSpec((16, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, GRID * LANES), jnp.uint32),
    )


def make_row2d(mul=False):
    R = LANES // 128

    def kernel(x_ref, o_ref):
        rows = [x_ref[i] for i in range(16)]  # (R, 128) 2D rows
        o_ref[0] = _chain_body(rows[0], rows, mul)

    return pl.pallas_call(
        kernel,
        grid=GRID,
        in_specs=[pl.BlockSpec((16, R, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, GRID * R, 128), jnp.uint32),
    )


def make_full2d(mul=False):
    # whole-(16, LANES) ops: 16x the lanes per op, CH_LEN//16 steps
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        r = x
        for i in range(CH_LEN // 16):
            if mul and i % 4 == 0:
                r = r * x + jnp.uint32(1)
            else:
                r = (r + x) ^ ((r << 7) | (r >> 25))
        o_ref[...] = r

    return pl.pallas_call(
        kernel,
        grid=GRID,
        in_specs=[pl.BlockSpec((16, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, GRID * LANES), jnp.uint32),
    )


def _force(r):
    """block_until_ready does NOT block through the axon tunnel (measured:
    40,545 "TFLOPs" on a 394-TFLOP chip) -- force completion by pulling a
    data-dependent scalar to the host."""
    import numpy as np

    return np.asarray(jnp.sum(r.astype(jnp.uint32) & jnp.uint32(1)))


def bench(name, fn, x, calls: int = 16):
    f = jax.jit(fn)
    _force(f(x))  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(calls):
            r = f(x)
        _force(r)
        best = min(best, (time.perf_counter() - t0) / calls)
    lane_ops = CH_LEN * LANES * GRID  # one chain of CH_LEN ops per tile
    print(f"{name:10s} {best*1e3:8.3f} ms   "
          f"{lane_ops/best/1e9:9.1f} G lane-ops/s")
    return lane_ops / best


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    x1 = jnp.arange(16 * GRID * LANES, dtype=jnp.uint32).reshape(
        16, GRID * LANES)
    x2 = x1.reshape(16, GRID * LANES // 128, 128)
    r1 = bench("row1d", make_row1d(), x1)
    r2 = bench("row2d", make_row2d(), x2)
    rf = bench("full2d", make_full2d(), x1)
    m1 = bench("mul1d", make_row1d(mul=True), x1)
    m2 = bench("mul2d", make_row2d(mul=True), x2)
    print(f"\nrow2d/row1d speedup: {r2/r1:.2f}x")
    print(f"full2d/row1d speedup: {rf/r1:.2f}x")
    print(f"mul2d/mul1d speedup: {m2/m1:.2f}x")
    print(f"mul vs xor-add cost (2d): {r2/m2:.2f}x")


if __name__ == "__main__":
    main()
