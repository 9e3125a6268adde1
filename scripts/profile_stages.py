"""Stage-split timing for the fused scan step: inversion vs Pallas tail.

Each stage is timed as ONE device dispatch repeated n times (tunnel RTT
~tens of ms is amortized by the large per-dispatch work).
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

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import field, pallas_fused, pipeline, u256
from vgen_tpu.pattern import Pattern
from vgen_tpu.scan.tables import _ints_to_limbs, ig_table_limbs

BATCH = int(os.environ.get("B", 262144))
K = int(os.environ.get("K", 8))
CHAIN = int(os.environ.get("C", 256))
TILE = int(os.environ.get("T", 512))


def _sync(r):
    """block_until_ready through the axon tunnel does NOT wait for device
    execution; only a host transfer does."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(f, *args, n=5):
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


tx_np, ty_np = ig_table_limbs(BATCH)
tx = jnp.asarray(tx_np)
ty = jnp.asarray(ty_np)
pts = [ec.scalar_mult(0xABC0 + i) for i in range(K)]
bx = jnp.asarray(_ints_to_limbs([p[0] for p in pts]))
by = jnp.asarray(_ints_to_limbs([p[1] for p in pts]))
pat = Pattern("^1C")
dev = pat.device_dfa(AddressFormat.P2PKH)
flat, accept = pipeline.pad_device_dfa(dev)
S = accept.shape[0]
dfa_f32 = jnp.asarray(flat.reshape(S, -1).astype(np.float32))
acc_f32 = jnp.asarray(accept.astype(np.float32).reshape(S, 1))
rem = jnp.full((K,), BATCH, jnp.int32)


# stage 1: inversion exactly as fused_scan_step computes it
@jax.jit
def inversion(bx, by, tx, ty):
    bxl = jnp.transpose(bx)
    dx = field.sub(tx[:, None, :], bxl[:, :, None])
    dx_flat = dx.reshape(16, K * BATCH)
    dx_safe = u256.select(
        ~u256.is_zero(dx_flat), dx_flat, u256.constant(1, dx_flat.shape[1:])
    )
    C = min(CHAIN, K * BATCH)
    return field.batch_inverse_chain(
        dx_safe.reshape(16, C, K * BATCH // C)
    ).reshape(16, K * BATCH)


inv_flat = inversion(bx, by, tx, ty); _sync(inv_flat)
t_inv = timeit(inversion, bx, by, tx, ty)
print(f"inversion (K*B = {K*BATCH}): {t_inv*1e3:8.1f} ms "
      f"({K*BATCH/t_inv/1e6:.1f} Mkeys/s)", flush=True)

# stage 2: Pallas tail, one sub-window
match_fn = pallas_fused.fused_match_fn(AddressFormat.P2PKH, BATCH, S, TILE)
inv0 = inv_flat[:, :BATCH]
jit_match = jax.jit(
    lambda *a: match_fn(*a)
)
args = (jnp.int32(dev.start), jnp.int32(BATCH), bx[0], by[0], tx, ty,
        inv0, dfa_f32, acc_f32)
t_tail = timeit(jit_match, *args, n=10)
print(f"pallas tail  (B = {BATCH}): {t_tail*1e3:8.1f} ms "
      f"({BATCH/t_tail/1e6:.1f} Mkeys/s)", flush=True)

# full step
step = pallas_fused.fused_scan_step(AddressFormat.P2PKH, BATCH, S, CHAIN,
                                    TILE, K)
t_step = timeit(step, bx, by, tx, ty, dfa_f32, acc_f32,
                jnp.int32(dev.start), rem)
print(f"full step (K={K}, B={BATCH}): {t_step*1e3:8.1f} ms "
      f"({K*BATCH/t_step/1e6:.1f} Mkeys/s)", flush=True)
print(f"  -> inversion {t_inv*1e3:.1f} + K*tail {K*t_tail*1e3:.1f} "
      f"= {(t_inv + K*t_tail)*1e3:.1f} ms accounted", flush=True)
