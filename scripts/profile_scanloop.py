"""Time the host-side phases of the device scan loop per super-step."""
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

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import pallas_fused, pipeline
from vgen_tpu.pattern import Pattern
from vgen_tpu.scan.tables import _ints_to_limbs, ig_table_limbs

BATCH, K = 262144, 8
tx = jnp.asarray(ig_table_limbs(BATCH)[0])
ty = jnp.asarray(ig_table_limbs(BATCH)[1])
pat = Pattern("^1NeverMatchesXx")
dev = pat.device_dfa(AddressFormat.P2PKH)
flat, accept = pipeline.pad_device_dfa(dev)
S = accept.shape[0]
dfa_f32 = jnp.asarray(flat.reshape(S, -1).astype(np.float32))
acc_f32 = jnp.asarray(accept.astype(np.float32).reshape(S, 1))
rem = jnp.full((K,), BATCH, jnp.int32)
step = pallas_fused.fused_scan_step(
    AddressFormat.P2PKH, BATCH, S, 256, 512, K
)

t_mult = t_conv = t_upload = t_dispatch = t_drain = 0.0
N_STEPS = 20
inflight = []
next_key = 0x123456789
np.asarray(step(  # warm
    jnp.asarray(_ints_to_limbs([ec.scalar_mult_base_fast(1)[0]])),
    jnp.asarray(_ints_to_limbs([ec.scalar_mult_base_fast(1)[1]])),
    tx, ty, dfa_f32, acc_f32, jnp.int32(dev.start), rem[:1],
)) if False else None

# warm compile via one full run
bx0 = jnp.asarray(_ints_to_limbs(
    [ec.scalar_mult_base_fast(next_key + i * BATCH)[0] for i in range(K)]))
by0 = jnp.asarray(_ints_to_limbs(
    [ec.scalar_mult_base_fast(next_key + i * BATCH)[1] for i in range(K)]))
np.asarray(step(bx0, by0, tx, ty, dfa_f32, acc_f32, jnp.int32(dev.start), rem))

t_all0 = time.perf_counter()
for i in range(N_STEPS):
    t0 = time.perf_counter()
    scalars = [next_key + k * BATCH for k in range(K)]
    pts = [ec.scalar_mult_base_fast(s) for s in scalars]
    t1 = time.perf_counter()
    bx_np = _ints_to_limbs([p[0] for p in pts])
    by_np = _ints_to_limbs([p[1] for p in pts])
    t2 = time.perf_counter()
    bx = jnp.asarray(bx_np)
    by = jnp.asarray(by_np)
    t3 = time.perf_counter()
    packed = step(bx, by, tx, ty, dfa_f32, acc_f32, jnp.int32(dev.start), rem)
    t4 = time.perf_counter()
    inflight.append(packed)
    if len(inflight) >= 4:
        arr = np.asarray(inflight.pop(0))
    t5 = time.perf_counter()
    t_mult += t1 - t0
    t_conv += t2 - t1
    t_upload += t3 - t2
    t_dispatch += t4 - t3
    t_drain += t5 - t4
    next_key += K * BATCH
for p in inflight:
    np.asarray(p)
t_all = time.perf_counter() - t_all0

print(f"per super-step ({K*BATCH//1024}K keys):")
print(f"  scalar_mults: {t_mult/N_STEPS*1e3:7.1f} ms")
print(f"  limb convert: {t_conv/N_STEPS*1e3:7.1f} ms")
print(f"  upload      : {t_upload/N_STEPS*1e3:7.1f} ms")
print(f"  dispatch    : {t_dispatch/N_STEPS*1e3:7.1f} ms")
print(f"  drain       : {t_drain/N_STEPS*1e3:7.1f} ms")
print(f"  TOTAL loop  : {t_all/N_STEPS*1e3:7.1f} ms "
      f"-> {K*BATCH/(t_all/N_STEPS)/1e6:.1f} Mkeys/s", flush=True)
