"""Sweep the Montgomery-inversion chain length C on the real chip.

The inversion stage is 2*C dependent field muls over (16, K*B/C) arrays
plus one fe_inv over the (16, K*B/C) chain totals.  Large C makes each
scan step NARROW (K*B/C lanes) and the dependent chain LONG -- the same
VPU latency pathology the V-tile layout fixed in the kernels (round 3).
Smaller C widens each step and shortens the chain; the single fe_inv
gets wider (more chains) but stays one ~380-op ladder either way.

Usage: python scripts/sweep_inv_chain.py [B] [K]
Env: CHAINS (csv, default 32,64,128,256,512,1024)
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

from vgen_tpu.ops import field


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chains = [
        int(c)
        for c in os.environ.get("CHAINS", "32,64,128,256,512,1024").split(",")
    ]
    rng = np.random.RandomState(7)
    dx = jnp.asarray(
        rng.randint(1, 1 << 16, size=(16, K * B)).astype(np.uint32)
    )

    def make(C):
        @jax.jit
        def inv_stage(dx):
            return field.batch_inverse_chain(
                dx.reshape(16, C, K * B // C)
            ).reshape(16, K * B)

        return inv_stage

    for C in chains:
        if (K * B) % C:
            print(f"C={C:5d}  skipped (K*B={K*B} not divisible by C)")
            continue
        f = make(C)
        r = f(dx)
        np.asarray(r.ravel()[:1])  # forced host sync (tunnel)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                r = f(dx)
            np.asarray(r.ravel()[:1])
            best = min(best, (time.perf_counter() - t0) / 4)
        print(
            f"C={C:5d}  {best*1e3:8.2f} ms  "
            f"{6*K*B/best/1e6:8.1f} M keys/s (GLV-equivalent)",
            flush=True,
        )


if __name__ == "__main__":
    main()
