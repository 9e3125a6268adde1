"""Split the fused P2TR step's time by stage on the real chip.

Stages (the round-5 fully-Pallas tail):
  inv_dx   -- shared window-difference Montgomery chain (all K windows)
  ladder   -- EC finish + TapTweak + 32-window ladder kernel (one window)
  zchain   -- guard-zero Montgomery chain over the ladder's Z outputs
  finish   -- qx = X*zi^2 + interval compare kernel
  step     -- the complete fused_p2tr_range_scan_step at k_sub windows

Usage: python scripts/profile_p2tr_split.py [B] [K]
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

from vgen_tpu.ops import pallas_fused
from vgen_tpu.scan import tables


def _force(r):
    leaves = jax.tree_util.tree_leaves(r)
    return np.asarray(jnp.sum(leaves[0].astype(jnp.uint32) & jnp.uint32(3)))


def bench(name, f, *args, calls=6, keys=None):
    _force(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(calls):
            r = f(*args)
        _force(r)
        best = min(best, (time.perf_counter() - t0) / calls)
    rate = f"  {keys / best / 1e6:9.2f} M keys/s" if keys else ""
    print(f"{name:10s} {best * 1e3:9.2f} ms{rate}", flush=True)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"B={B} K={K} (P2TR interval path)")

    from vgen_tpu.crypto import secp256k1 as ec
    from vgen_tpu.scan.tables import _ints_to_limbs

    tx, ty = tables.ig_table_arrays(B)
    wt = jnp.asarray(tables.window_table_u32(8))
    loT, hiT = pallas_fused.p2tr_planes(wt)
    loT = jax.block_until_ready(loT)
    hiT = jax.block_until_ready(hiT)
    pts = [ec.scalar_mult_base_fast(0x5EED + 7 * k) for k in range(K)]
    bx = jnp.asarray(_ints_to_limbs([p[0] for p in pts]))
    by = jnp.asarray(_ints_to_limbs([p[1] for p in pts]))
    lo = jnp.zeros((1, 8), dtype=jnp.uint32)
    lo = lo.at[0, 7].set(1)  # empty interval (never matches)
    hi = jnp.zeros((1, 8), dtype=jnp.uint32)
    rem = jnp.full((K,), B, jnp.int32)
    rem1 = jnp.full((1,), B, jnp.int32)

    # stage pieces (single window)
    invdx = jax.jit(lambda bx, tx: pallas_fused.batch_inverse_dx_pallas(
        bx, tx
    ))
    t_invdx = bench("inv_dx(K)", invdx, bx, tx)

    inv1 = np.asarray(invdx(bx[:1], tx))  # one window's inverses
    inv1j = jnp.asarray(inv1[:, :B])
    ladder = pallas_fused.p2tr_ladder_finish_fn(B)
    lad = jax.jit(lambda *a: ladder(*a))
    t_lad = bench("ladder", lad, bx[0], by[0], tx, ty, inv1j, loT, hiT,
                  keys=B)

    X, Y, Z, ok_i = [jax.block_until_ready(v)
                     for v in lad(bx[0], by[0], tx, ty, inv1j, loT, hiT)]
    zch = jax.jit(lambda z: pallas_fused.batch_inverse_chain_pallas(
        z, guard_zero=True
    ))
    t_z = bench("zchain", zch, Z)

    zi = jax.block_until_ready(zch(Z))
    fin = pallas_fused.p2tr_finish_range_fn(B, 1)
    finj = jax.jit(lambda *a: fin(*a))
    t_fin = bench("finish", finj, rem1[:1], lo, hi, X, Z, zi, ok_i)

    step = pallas_fused.fused_p2tr_range_scan_step(B, 1024, k_sub=K,
                                                   n_slots=1)
    t_step = bench("step(K)", step, bx, by, tx, ty, lo, hi, rem, wt,
                   keys=K * B)

    per_win = t_step / K
    known = t_invdx / K + t_lad + t_z + t_fin
    print(f"\nper-window: step {per_win * 1e3:.2f} ms, sum-of-stages "
          f"{known * 1e3:.2f} ms, unexplained "
          f"{(per_win - known) * 1e3:.2f} ms")
    print(f"ladder share {t_lad / per_win:.0%}; "
          f"ns/key: step {per_win / B * 1e9:.1f}, ladder "
          f"{t_lad / B * 1e9:.1f}")


if __name__ == "__main__":
    main()
