"""Precomputed device tables (i*G, fixed windows).

The reference computes its i*G table on the GPU once at startup
(shaders/init.wgsl:4-10, one full scalar-mult per thread).  Here the
accelerator builds it ON DEVICE by log-doubling (ig_table_jax below):
given T_n = [1..n]G, one batch affine add with a chained inversion yields
T_2n = T_n ∪ (nG + T_n) -- 20 steps for half a million points, total work
one add per point.  Only G and ~20 doubling patch points (2.5 KB) ever
cross the host↔device link; uploading the 64 MB host-built table took
~360 s through the device tunnel (measured round 4, ~0.18 MB/s).

The host incremental builder (crypto/secp256k1.ig_table + on-disk npz
cache) remains the path for CPU runs and the independent oracle the
device build is tested against.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

from vgen_tpu.crypto import secp256k1 as ec

CACHE_DIR = os.environ.get(
    "VGEN_TPU_CACHE", os.path.expanduser("~/.cache/vgen_tpu")
)


def _ints_to_limbs(values, nlimbs: int = 16) -> np.ndarray:
    """Bulk int -> (N, nlimbs) uint16-limbs-in-uint32 conversion via bytes."""
    buf = b"".join(v.to_bytes(2 * nlimbs, "little") for v in values)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(values), nlimbs)
    return arr.astype(np.uint32)


def ig_table_limbs(count: int) -> Tuple[np.ndarray, np.ndarray]:
    """(tx, ty): (16, count) uint32 limb arrays for [1..count]*G, disk-cached."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"ig_table_{count}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["tx"], z["ty"]
    pts = ec.ig_table(count, start=1)
    tx = _ints_to_limbs([p[0] for p in pts]).T.copy()  # (16, count)
    ty = _ints_to_limbs([p[1] for p in pts]).T.copy()
    np.savez(path, tx=tx, ty=ty)
    return tx, ty


@functools.lru_cache(maxsize=8)
def _ig_builder(count: int):
    """Jitted on-device [1..2^ceil(lg count)]G builder (see module doc).

    (basex, basey (steps, 16): host affine points 2^s·G) -> tx, ty
    (16, count).  The table accumulates in JACOBIAN coordinates with the
    branch-free mixed add (handles the i == n doubling lane), so the loop
    contains NO field inversions -- one chained Montgomery inversion
    normalizes everything at the end.  (A first version did an affine add
    + chained inversion per step; its ~20 Fermat-ladder instances made
    XLA compiles minutes long for no runtime win.)"""
    import jax
    import jax.numpy as jnp

    from vgen_tpu.ops import curve, u256

    steps = max((count - 1).bit_length(), 1)
    B = 1 << steps

    @jax.jit
    def build(basex, basey):
        # Full-width masked steps under ONE lax.scan: every step runs the
        # mixed add over all B columns and a roll-by-n places T_i at
        # column n+i; columns outside [n, 2n) keep their old value.  The
        # wasted work (steps*B adds instead of 2B) is milliseconds on
        # chip; the payoff is a program with ONE traced add instead of
        # `steps` unrolled ones (~19x smaller compile).
        col = jnp.arange(B, dtype=jnp.int32)
        X = jnp.broadcast_to(basex[0][:, None], (16, B))
        Y = jnp.broadcast_to(basey[0][:, None], (16, B))
        Z = jnp.asarray(u256.constant(1, (B,)))

        def body(carry, xs):
            X, Y, Z = carry
            n, bx, by = xs
            x2 = jnp.broadcast_to(bx[:, None], (16, B))
            y2 = jnp.broadcast_to(by[:, None], (16, B))
            Xn, Yn, Zn = curve.jacobian_add_affine(X, Y, Z, x2, y2)
            grow = (col >= n) & (col < 2 * n)
            X = u256.select(grow, jnp.roll(Xn, n, axis=1), X)
            Y = u256.select(grow, jnp.roll(Yn, n, axis=1), Y)
            Z = u256.select(grow, jnp.roll(Zn, n, axis=1), Z)
            return (X, Y, Z), None

        ns = jnp.asarray([1 << s for s in range(steps)], dtype=jnp.int32)
        (X, Y, Z), _ = jax.lax.scan(body, (X, Y, Z), (ns, basex, basey))
        # i + n < group order throughout, so no lane is ever infinity
        C = min(256, B)
        x, y = curve.batch_jacobian_to_affine(X, Y, Z, chain_len=C)
        return x[:, :count], y[:, :count]

    return build, steps


def ig_table_jax(count: int, device=None):
    """(tx, ty) as ON-DEVICE (16, count) uint32 jax arrays, built on chip.

    Uploads ~20 points (2.5 KB) instead of count * 128 B.  Works on any
    backend; DeviceScanner/MeshScanner use it whenever the target is an
    accelerator (the CPU path keeps the host npz cache)."""
    import jax
    import jax.numpy as jnp

    build, steps = _ig_builder(count)
    base_pts = [ec.scalar_mult(1 << s) for s in range(steps)]
    basex = jnp.asarray(_ints_to_limbs([p[0] for p in base_pts]))
    basey = jnp.asarray(_ints_to_limbs([p[1] for p in base_pts]))
    if device is not None:
        ctx = jax.default_device(device)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        tx, ty = build(basex, basey)
    return tx, ty


def ig_table_arrays(count: int, device=None):
    """On-device (tx, ty) jax arrays by the cheapest route for the target:
    on-chip build for accelerators, host npz + upload for CPU."""
    import jax
    import jax.numpy as jnp

    dev = device or jax.devices()[0]
    if dev.platform != "cpu":
        return ig_table_jax(count, dev)
    tx, ty = ig_table_limbs(count)
    return (
        jax.device_put(jnp.asarray(tx), dev),
        jax.device_put(jnp.asarray(ty), dev),
    )


def window_table_u32(window_bits: int = 8) -> np.ndarray:
    """(32, 256, 2, 16) fixed-window table for t*G, disk-cached."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"window_table_{window_bits}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["tbl"]
    tbl = ec.window_table(window_bits)
    np.savez(path, tbl=tbl)
    return tbl


def step_point(batch: int):
    """Affine batch*G (the per-batch base-point stride)."""
    return ec.scalar_mult(batch)
