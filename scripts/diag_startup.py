"""Diagnose where bench startup time goes: trace vs compile vs table vs scan.

Usage: python scripts/diag_startup.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("VGEN_TPU_CACHE", os.path.expanduser("~/.cache/vgen_tpu"))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.environ["VGEN_TPU_CACHE"], "jaxcache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

T0 = time.monotonic()


def mark(name):
    print(f"[{time.monotonic()-T0:7.1f}s] {name}", flush=True)


mark("start")
_ = jax.devices()
mark("devices")

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.scan import tables

batch = 524288
tx_np, ty_np = tables.ig_table_limbs(batch)
mark("ig_table_limbs (host)")
tx = jax.device_put(jnp.asarray(tx_np))
ty = jax.device_put(jnp.asarray(ty_np))
tx.block_until_ready()
np.asarray(tx[:1, :8])  # force through tunnel
mark("device_put tables")

from vgen_tpu.ops import pallas_fused
from vgen_tpu.pattern import Pattern

pat = Pattern("^1C")
ivs = pat.match_intervals(AddressFormat.P2PKH)
mark("pattern intervals")

from vgen_tpu.ops import pipeline

lo_np, hi_np = pallas_fused.intervals_to_words(
    ivs, n_slots=pipeline.interval_slot_count(len(ivs))
)
step = pallas_fused.fused_range_scan_step(
    AddressFormat.P2PKH, batch, 1024, k_sub=8, glv=True
)
mark("build step (no trace yet)")

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.scan.tables import _ints_to_limbs

pts = [ec.scalar_mult_base_fast(1000 + i * batch) for i in range(8)]
bx = jnp.asarray(_ints_to_limbs([p[0] for p in pts]))
by = jnp.asarray(_ints_to_limbs([p[1] for p in pts]))
rem = jnp.full((8,), batch, jnp.int32)
lo_j, hi_j = jnp.asarray(lo_np), jnp.asarray(hi_np)
mark("base points")

# step is a jax.jit function; measure trace+lower separately from compile
lowered = step.lower(bx, by, tx, ty, lo_j, hi_j, rem)
mark("trace+lower")
compiled = lowered.compile()
mark("compile (cache?)")
out = compiled(bx, by, tx, ty, lo_j, hi_j, rem)
np.asarray(out)
mark("first run + transfer")
out = compiled(bx, by, tx, ty, lo_j, hi_j, rem)
np.asarray(out)
mark("second run")
