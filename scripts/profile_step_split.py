"""Split the fused scan step's time: XLA Montgomery inversion vs Pallas tail.

After the V-tile kernel speedup (round 3) the XLA inversion stage may
dominate; this measures each stage separately WITH forced host sync
(block_until_ready does not block through the device tunnel).

Usage: python scripts/profile_step_split.py [B] [K] [CHAIN]
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

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import field, pallas_fused, u256


def _force(r):
    leaves = jax.tree_util.tree_leaves(r)
    return np.asarray(jnp.sum(leaves[0].astype(jnp.uint32) & jnp.uint32(3)))


def bench(name, f, *args, calls=8, keys=None):
    _force(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(calls):
            r = f(*args)
        _force(r)
        best = min(best, (time.perf_counter() - t0) / calls)
    rate = f"  {keys/best/1e6:9.1f} M keys/s" if keys else ""
    print(f"{name:24s} {best*1e3:9.2f} ms{rate}")
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    CHAIN = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    fmt = AddressFormat.P2PKH
    print(f"B={B} K={K} chain={CHAIN} (GLV interval path, keys = 6*K*B)")

    rng = np.random.RandomState(5)
    mk = lambda shape: jnp.asarray(
        rng.randint(0, 1 << 16, size=shape).astype(np.uint32)
    )
    bx, by = mk((K, 16)), mk((K, 16))
    # real on-device tables: uploading (16, B) arrays through the device
    # tunnel costs ~0.18 MB/s (tables.py module doc)
    from vgen_tpu.scan.tables import ig_table_arrays

    tx, ty = ig_table_arrays(B)
    lo = np.zeros((8, 5), dtype=np.uint32)
    hi = np.zeros((8, 5), dtype=np.uint32)
    lo[:, 4] = 1
    hi[0] = [1 << 20, -1 & 0xFFFFFFFF, -1 & 0xFFFFFFFF, -1 & 0xFFFFFFFF,
             -1 & 0xFFFFFFFF]
    lo_j, hi_j = jnp.asarray(lo), jnp.asarray(hi)
    rem = jnp.full((K,), B, jnp.int32)

    # 1. full step
    step = pallas_fused.fused_range_scan_step(fmt, B, CHAIN, k_sub=K,
                                              glv=True)
    t_step = bench("full step", step, bx, by, tx, ty, lo_j, hi_j, rem,
                   keys=6 * K * B)

    # 2a. dx materialization + zero-guard alone
    @jax.jit
    def dx_stage(bx, tx):
        bxl = jnp.transpose(bx)
        dx = field.sub(tx[:, None, :], bxl[:, :, None])
        dx_flat = dx.reshape(16, K * B)
        return u256.select(
            ~u256.is_zero(dx_flat), dx_flat, u256.constant(1, (K * B,))
        )

    t_dx = bench("dx+select", dx_stage, bx, tx, keys=6 * K * B)

    # 2b. the Pallas inversion chain alone (round 4; the XLA chain it
    # replaced measured 57.7 ms at these shapes)
    dx_built = dx_stage(bx, tx)
    chain_fn = jax.jit(pallas_fused.batch_inverse_chain_pallas)
    t_chain = bench("pallas inv chain", chain_fn, dx_built, keys=6 * K * B)

    # 2c. result pack (top_k) alone, K windows
    inv_flat = chain_fn(dx_built)

    @jax.jit
    def pack_stage(m):
        outs = []
        for k in range(K):
            outs.append(pallas_fused._pack_tail(
                m[k * B:(k + 1) * B], jnp.int32(B), B, ops_mult=6
            ))
        return jnp.stack(outs)

    match_vec = (dx_built[0] & jnp.uint32(1)).astype(jnp.int32)
    t_pack = bench("pack/top_k (K)", pack_stage, match_vec, keys=6 * K * B)

    t_inv = t_dx + t_chain

    # 3. kernel alone (K sequential windows, precomputed inverse);
    # ty doubles as a stand-in inverse (any nonzero limb pattern works)
    match_fn = pallas_fused.fused_range_match_fn(fmt, B, glv=True)
    inv1 = ty

    @jax.jit
    def kernels_only(bx, by, tx, ty, inv1, lo, hi):
        outs = []
        for k in range(K):
            outs.append(match_fn(B, lo, hi, bx[k], by[k], tx, ty, inv1))
        return jnp.stack(outs)

    t_kern = bench("pallas kernels (K)", kernels_only, bx, by, tx, ty, inv1,
                   lo_j, hi_j, keys=6 * K * B)

    print(f"\ndx/step = {t_dx/t_step:.0%}  chain/step = {t_chain/t_step:.0%}"
          f"  kernels/step = {t_kern/t_step:.0%}  "
          f"pack/step = {t_pack/t_step:.0%}  other = "
          f"{(t_step-t_inv-t_kern-t_pack)/t_step:.0%}")


if __name__ == "__main__":
    main()
