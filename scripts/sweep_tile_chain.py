"""Sweep Pallas tile width and inversion chain length for the GLV
interval step (the bench hot path) on the real chip.

Env: B (batch, default 524288), K (k_sub, default 8),
     TILES (csv, default 256,512,1024,2048), CHAINS (csv, default
     512,1024,2048,4096), N (timing reps, default 5).
"""
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import pallas_fused, pipeline
from vgen_tpu.pattern import Pattern
from vgen_tpu.scan.tables import _ints_to_limbs, ig_table_limbs

B = int(os.environ.get("B", 524288))
K = int(os.environ.get("K", 8))
N = int(os.environ.get("N", 5))
TILES = [int(t) for t in os.environ.get("TILES", "256,512,1024,2048").split(",")]
CHAINS = [int(c) for c in os.environ.get("CHAINS", "512,1024,2048,4096").split(",")]


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(f, *args, n=N):
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


tx = jnp.asarray(ig_table_limbs(B)[0])
ty = jnp.asarray(ig_table_limbs(B)[1])
pts = [ec.scalar_mult(0xABC0 + i) for i in range(K)]
bx = jnp.asarray(_ints_to_limbs([p[0] for p in pts]))
by = jnp.asarray(_ints_to_limbs([p[1] for p in pts]))
pat = Pattern(os.environ.get("VGEN_BENCH_PATTERN", "^1C"))
ivs = pat.match_intervals(AddressFormat.P2PKH)
lo_np, hi_np = pipeline.intervals_to_words(
    ivs, n_slots=pipeline.interval_slot_count(len(ivs)))
lo = jnp.asarray(lo_np)
hi = jnp.asarray(hi_np)
rem = jnp.full((K,), B, jnp.int32)

best = None
for tile in TILES:
    for chain in CHAINS:
        if B % tile or (K * B) % chain:
            continue
        try:
            step = pallas_fused.fused_range_scan_step(
                AddressFormat.P2PKH, B, chain, tile, K, True)
            t = timeit(step, bx, by, tx, ty, lo, hi, rem)
        except Exception as e:
            print(f"tile={tile:5d} chain={chain:5d}  FAILED: {type(e).__name__}",
                  flush=True)
            continue
        rate = 6 * K * B / t
        print(f"tile={tile:5d} chain={chain:5d}  {t*1e3:7.1f} ms  "
              f"{rate/1e6:7.1f} Mkeys/s", flush=True)
        if best is None or rate > best[0]:
            best = (rate, tile, chain)

if best:
    print(f"BEST: tile={best[1]} chain={best[2]} {best[0]/1e6:.1f} Mkeys/s")
