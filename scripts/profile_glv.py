"""Stage-split timing for the GLV interval scan step (the bench hot path).

Splits the fused step into: batch inversion (XLA stage) vs the Pallas GLV
tail (EC finish-x + 6x hash160 + interval compare), and times sub-pieces of
the tail by compiling reduced kernels:
  - ec-only:    finish-x + beta muls, no hashing (emits a cheap checksum)
  - hash2:      one x-coordinate, both parities (2 hash160s)
  - full:       the production 6-variant kernel
Run on the real TPU.  Env: B (batch), C (chain), T (tile).
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgen_tpu.crypto import secp256k1 as ec
from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import encode, field, pallas_fused, pipeline, u256
from vgen_tpu.pattern import Pattern
from vgen_tpu.scan.tables import _ints_to_limbs, ig_table_limbs

BATCH = int(os.environ.get("B", 524288))
CHAIN = int(os.environ.get("C", 1024))
TILE = int(os.environ.get("T", 512))
FMT = AddressFormat.P2PKH


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(f, *args, n=10):
    r = f(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n


tx = jnp.asarray(ig_table_limbs(BATCH)[0])
ty = jnp.asarray(ig_table_limbs(BATCH)[1])
pt = ec.scalar_mult(0xABC0)
bx = jnp.asarray(_ints_to_limbs([pt[0]])[0])
by = jnp.asarray(_ints_to_limbs([pt[1]])[0])

pat = Pattern("^1C")
ivs = pat.match_intervals(FMT)
lo_np, hi_np = pipeline.intervals_to_words(ivs)
lo = jnp.asarray(lo_np)
hi = jnp.asarray(hi_np)
print(f"pattern ^1C -> {len(ivs)} interval(s)", flush=True)


@jax.jit
def inversion(bx, by, tx, ty):
    dx = field.sub(tx, bx[:, None])
    dx_safe = u256.select(
        ~u256.is_zero(dx), dx, u256.constant(1, dx.shape[1:])
    )
    return field.batch_inverse_chain(
        dx_safe.reshape(16, CHAIN, BATCH // CHAIN)
    ).reshape(16, BATCH)


inv = inversion(bx, by, tx, ty)
t_inv = timeit(inversion, bx, by, tx, ty)
print(f"inversion: {t_inv*1e3:7.1f} ms ({BATCH/t_inv/1e6:.1f} Mpos/s)",
      flush=True)


def make_kernel(mode: str):
    from vgen_tpu.crypto import secp256k1 as ecc

    def kernel(rem_ref, lo_ref, hi_ref, bx_ref, by_ref, tx_ref, ty_ref,
               inv_ref, match_ref):
        i = pl.program_id(0)
        bxv = bx_ref[:, 0][:, None]
        byv = by_ref[:, 0][:, None]
        x3, valid = pallas_fused._ec_finish_x(
            bxv, byv, tx_ref[...], ty_ref[...], inv_ref[...]
        )
        beta = u256.constant(ecc.BETA, x3.shape[1:])
        beta2 = u256.constant(ecc.BETA2, x3.shape[1:])
        xs = (x3, field.mul(x3, beta), field.mul(x3, beta2))
        mask = jnp.zeros(x3.shape[1:], dtype=jnp.int32)
        if mode == "ecc":
            # column-accumulator mul (no concat/pad shifting)
            from vgen_tpu.ops.u256 import (LIMB_BITS, LIMB_MASK, NLIMBS,
                                           carry_propagate)

            def mulc(av, bv):
                n = NLIMBS
                zero = jnp.zeros(av.shape[1:], jnp.uint32)
                cols = [zero] * (2 * n)
                for j in range(n):
                    q = av * bv[j][None]
                    lov = q & LIMB_MASK
                    hiv = q >> LIMB_BITS
                    for ii in range(n):
                        cols[ii + j] = cols[ii + j] + lov[ii]
                        cols[ii + j + 1] = cols[ii + j + 1] + hiv[ii]
                prod, _ = carry_propagate(cols, 2 * n)
                return field._fold512(prod)

            for nrep in range(2):
                xs = tuple(mulc(xv, beta) for xv in xs)
            for v, xv in enumerate(xs):
                mask = mask | jnp.where(
                    xv[0] == jnp.uint32(v), jnp.int32(1), 0
                )
        elif mode.startswith("ec"):
            extra = int(mode[2:] or 0)
            for _ in range(extra):
                xs = tuple(field.mul(xv, beta) for xv in xs)
            for v, xv in enumerate(xs):
                mask = mask | jnp.where(
                    xv[0] == jnp.uint32(v), jnp.int32(1), 0
                )
        else:
            n_var = {"hash2": 1, "hash2r": 1, "full": 3, "fullr": 3}[mode]
            resh = mode.endswith("r")
            for v, xv in enumerate(xs[:n_var]):
                xb = u256.to_bytes_be(xv)
                if resh:
                    xb = xb.reshape(32, 8, TILE // 8)
                for pi in range(2):
                    prefix = jnp.full(
                        (1,) + xb.shape[1:], 2 + pi, dtype=jnp.uint32
                    )
                    h = encode.hash160_33(
                        jnp.concatenate([prefix, xb], axis=0), unroll=True
                    )
                    m = pipeline.in_intervals(
                        pipeline.bytes_be_words(h), lo_ref, hi_ref
                    )
                    if resh:
                        m = m.reshape(TILE)
                    mask = mask | jnp.where(m, jnp.int32(1 << (2*v+pi)), 0)
        gidx = i * TILE + jax.lax.broadcasted_iota(
            jnp.int32, (1, TILE), 1
        )[0]
        valid = valid & (gidx < rem_ref[0])
        match_ref[0, :] = jnp.where(valid, mask, 0)

    limb = lambda: pl.BlockSpec((16, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=BATCH // TILE,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rep((16, 1)), rep((16, 1)), limb(), limb(), limb(),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, BATCH), jnp.int32),
    )

    def fn(rem, lo, hi, bx, by, tx, ty, inv):
        return call(rem, lo, hi, bx.reshape(16, 1), by.reshape(16, 1),
                    tx, ty, inv)

    return jax.jit(fn)


rem = jnp.full((1,), BATCH, jnp.int32)
for mode in ("ec", "ec2", "ecc"):
    fn = make_kernel(mode)
    t = timeit(fn, rem, lo, hi, bx, by, tx, ty, inv)
    print(f"tail[{mode:5s}]: {t*1e3:7.1f} ms "
          f"({BATCH/t/1e6:.1f} Mpos/s)", flush=True)

step = pallas_fused.fused_range_scan_step(FMT, BATCH, CHAIN, TILE, 1, True)
bxk = jnp.asarray(_ints_to_limbs([pt[0]]))
byk = jnp.asarray(_ints_to_limbs([pt[1]]))
t_full = timeit(step, bxk, byk, tx, ty, lo, hi,
                jnp.full((1,), BATCH, jnp.int32))
print(f"production step: {t_full*1e3:7.1f} ms "
      f"({6*BATCH/t_full/1e6:.1f} Mkeys/s)", flush=True)
