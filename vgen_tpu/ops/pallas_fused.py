"""Pallas-fused scan pipeline: the hot path in one VMEM-resident kernel.

The pure-XLA tail streams every intermediate (outer products, hash state,
digit arrays) through HBM -- ~10+ KB per key.  This kernel keeps the entire
EC-finish -> pubkey -> hash160 -> Base58Check -> DFA pipeline in VMEM per
batch tile, reading only the table points + shared inverse (3 x 64 B/key)
and writing one match byte per key.

The batch-wide Montgomery inversion stays in XLA (its scan structure does
not tile), mirroring how the reference splits `compute_jacobian` /
`batch_normalize` into two passes (shaders/search.wgsl:39-135); everything
the reference then did on the CPU per candidate (gpu.rs:1030-1093) lives
INSIDE this kernel.

All numeric helpers are the same jnp functions the XLA path uses -- they
trace identically under pallas_call with batch shape (T,).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import curve, encode, field, pipeline, u256

DEFAULT_TILE = 512

# Sublane rows per kernel tile.  Tiles are (16, V, T) limb blocks -- the
# batch is 2D (V sublane rows x T lanes) INSIDE the kernel, so every
# word-path / carry-chain op processes V*T lanes per instruction.  The VPU
# is latency-bound on dependent chains of narrow ops (measured round 3:
# ~150 G lane-ops/s on (512,) rows vs ~890 G marginal at width 16;
# scripts/microbench_rows.py), and the hash word paths are exactly such
# chains -- the flat-row GLV interval kernel ran 4.7x slower than the
# (8, 512)-tiled one (scripts/proto_vtile.py, bit-exact).
V_SUB = 8


def _tile_plan(batch: int, tile: int, max_keys: int = 4096):
    """Choose the (vsub, lane_tile) block shape for a batch.

    Arrays are reshaped (16, B) -> (16, vsub, B/vsub) and the grid runs
    over the LAST dim with (16, vsub, lane_tile) blocks -- the block's
    middle dim always equals the array's, which Mosaic accepts for any
    vsub (its divisible-by-8 rule applies only to partial blocks).

    max_keys is the per-tile VMEM budget under the 16 MB scoped limit
    (measured OOMs, round 3): interval kernels fit 4096 keys/tile, the
    plain DFA 2048, GLV-DFA 1024 (512 for Ethereum's 6 unrolled keccaks);
    vsub drops below 8 only when the budget demands it.

    Fast-fails (ValueError) when no workable block exists: the lane tile
    must be a multiple of the 128-lane VPU register width or Mosaic fails
    at compile time deep inside a scan with an opaque layout error
    (VERDICT r3 weak-6).  In practice any power-of-two batch >= 1024
    works for every budget."""
    vsub = V_SUB
    while vsub > 1 and (batch % vsub or max_keys // vsub < 128):
        vsub //= 2
    span = batch // vsub
    lane = min(tile, span, max_keys // vsub)
    while span % lane:
        lane //= 2
    if lane < 128 or lane % 128:
        raise ValueError(
            f"no workable Pallas tile for batch={batch} (budget "
            f"{max_keys} keys/tile): best block is ({vsub}, {lane}) but "
            f"the lane dim must be a multiple of 128. Use a power-of-two "
            f"batch size >= 1024 (e.g. 524288, the default)."
        )
    return vsub, lane


def _tile_gidx(i, v: int, t: int, span: int):
    """Global key index of each (V, T) tile position for grid step i.

    Arrays are (16, V, span) with flat key k = v*span + lane; grid step i
    covers lanes [i*t, (i+1)*t) of every v row."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (v, t), 0) * span
        + i * t
        + jax.lax.broadcasted_iota(jnp.int32, (v, t), 1)
    )


def _ec_finish(bx, by, tx, ty, inv_dx):
    """Affine add with precomputed inverse + validity (dx == 0) mask."""
    dx = field.sub(tx, bx)
    valid = ~u256.is_zero(dx)
    x3, y3 = curve.affine_add_batch(bx, by, tx, ty, inv_dx)
    return x3, y3, valid


FUSED_FORMATS = (
    AddressFormat.P2PKH,
    AddressFormat.P2PKH_UNCOMPRESSED,
    AddressFormat.P2WPKH,
    AddressFormat.P2SH_P2WPKH,
    # EIP-55 casing runs on-chip too: the second keccak over the 40
    # lowercase-hex ASCII bytes is gather-free (encode.eth_symbols), so the
    # cased-hex DFA matches checksummed addresses entirely on-device --
    # the reference never ran Ethereum on its GPU at all (lib.rs:316-319)
    AddressFormat.ETHEREUM,
)

# Formats with an interval (range-compare) fused path.
RANGE_FORMATS = FUSED_FORMATS


def _symbols_for(fmt: AddressFormat, x3, y3, b58_basis):
    # unroll=True: statically unrolled hash rounds (Mosaic rejects the
    # fori_loop form's captured constant arrays)
    if fmt == AddressFormat.P2PKH:
        return pipeline.symbols_p2pkh(x3, y3, b58_basis, unroll=True)
    if fmt == AddressFormat.P2WPKH:
        return pipeline.symbols_p2wpkh(x3, y3, unroll=True)
    if fmt == AddressFormat.P2SH_P2WPKH:
        return pipeline.symbols_p2sh_p2wpkh(x3, y3, b58_basis, unroll=True)
    if fmt == AddressFormat.P2PKH_UNCOMPRESSED:
        return pipeline.symbols_p2pkh_uncompressed(
            x3, y3, b58_basis, unroll=True
        )
    if fmt == AddressFormat.ETHEREUM:
        return pipeline.symbols_ethereum(x3, y3, unroll=True)
    raise ValueError(f"fused path does not support {fmt}")


def _match_tile(table_f32, accept_f32, start, syms, length):
    """DFA over (T_sym, *B) symbols inside the kernel (same matmul scheme
    as pipeline.match_symbols, unrolled over positions -- T_sym is small).
    B may be flat (T,) or a 2D (V, T) tile; dot_general contracts the
    symbol one-hot's leading dim either way."""
    S, W = table_f32.shape
    assert S <= 256, "bf16 matmul keeps DFA state ids exact only up to 256"
    B = syms.shape[1:]
    sids = jax.lax.broadcasted_iota(jnp.int32, (S,) + B, 0)
    sids_f = sids.astype(jnp.float32)
    wids = jax.lax.broadcasted_iota(jnp.int32, (W,) + B, 0)
    state1h = u256.bool_to_f32(sids == start)
    n_pos = syms.shape[0]
    eos = jnp.int32(W - 2)
    pad = jnp.int32(W - 1)
    acc_b = accept_f32.reshape((S,) + (1,) * len(B))
    for j in range(n_pos + 1):
        row = syms[min(j, n_pos - 1)]
        sym = jnp.where(j < length, row, jnp.where(j == length, eos, pad))
        sym1h = u256.bool_to_f32(wids == sym[None])
        R = jax.lax.dot_general(
            table_f32, sym1h,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        next_id = jnp.sum(state1h * R, axis=0)
        state1h = u256.bool_to_f32(sids_f == next_id[None])
    acc = jnp.sum(state1h * acc_b, axis=0)
    return acc > 0.5


def _make_kernel(fmt: AddressFormat, vsub: int, tile: int, span: int):
    def kernel(start_ref, rem_ref, bx_ref, by_ref, tx_ref, ty_ref, inv_ref,
               dfa_ref, acc_ref, b58_ref, match_ref):
        i = pl.program_id(0)
        bx = bx_ref[:, 0, 0][:, None, None]  # broadcasts over (16, V, T)
        by = by_ref[:, 0, 0][:, None, None]
        tx = tx_ref[...]
        ty = ty_ref[...]
        inv_dx = inv_ref[...]

        x3, y3, valid = _ec_finish(bx, by, tx, ty, inv_dx)
        syms, length = _symbols_for(fmt, x3, y3, b58_ref[...])

        start = start_ref[0]
        remaining = rem_ref[0]
        valid = valid & (_tile_gidx(i, vsub, tile, span) < remaining)

        matched = _match_tile(
            dfa_ref[...], acc_ref[...], start, syms, length
        )
        match_ref[0] = jnp.where(matched & valid, 1, 0)

    return kernel


def _make_glv_dfa_kernel(fmt: AddressFormat, vsub: int, tile: int,
                         span: int):
    """GLV DFA kernel: each window position DFA-matches the addresses of
    all 6 endomorphism variants {±k, ±λk, ±λ²k} -- 6 keys per EC add for
    arbitrary regex patterns, not just interval-compilable prefixes.  The
    variants' points share x-coordinates {x, βx, β²x}; compressed-hash160
    formats cover ± via the two compressed prefixes (x-only finish),
    GLV_EXACT_Y formats (Ethereum, uncompressed p2pkh) via ±y (full
    finish)."""
    from vgen_tpu.crypto import secp256k1 as ec

    def kernel(start_ref, rem_ref, bx_ref, by_ref, tx_ref, ty_ref, inv_ref,
               dfa_ref, acc_ref, b58_ref, match_ref):
        i = pl.program_id(0)
        bx = bx_ref[:, 0, 0][:, None, None]
        by = by_ref[:, 0, 0][:, None, None]
        exact_y = fmt in pipeline.GLV_EXACT_Y
        if exact_y:
            x3, y3, valid = _ec_finish(bx, by, tx_ref[...], ty_ref[...],
                                       inv_ref[...])
            ny3 = field.neg(y3)
        else:
            x3, valid = _ec_finish_x(bx, by, tx_ref[...], ty_ref[...],
                                     inv_ref[...])
            y3 = ny3 = None
        start = start_ref[0]
        remaining = rem_ref[0]
        valid = valid & (_tile_gidx(i, vsub, tile, span) < remaining)
        beta = u256.constant(ec.BETA, x3.shape[1:])
        b58 = b58_ref[...]
        dfa = dfa_ref[...]
        acc = acc_ref[...]

        # Variant scheduling (round-5 measurements, p2pkh / ethereum
        # dfa-pure cells):
        # - exact-y formats: ONE traced fori_loop over all 6 variants
        #   (yv selected by parity bit).  Live set = 1 pipeline -> the
        #   VMEM budget doubles to 2048 keys/tile and the rate went
        #   44.8 -> 76 M (ethereum).
        # - parity (compressed-hash160) formats: fori_loop over the 3
        #   beta powers with the +- pair UNROLLED inside (pi stays a
        #   Python int, preserving the hash word path's parity partial
        #   evaluation -- tracing the parity into the SHA schedule
        #   measured 25% slower on p2pkh despite 2x bigger tiles).  The
        #   2-pipeline pair body exceeds scoped VMEM at 2048 (23.7M
        #   vs 16M), so the budget stays 1024.
        zero_bits = jnp.zeros(x3.shape[1:], dtype=jnp.int32)
        if exact_y:
            def body(w, carry):
                xv, bits = carry
                pi = w % 2
                xv = u256.select(
                    jnp.broadcast_to((pi == 0) & (w > 0), xv.shape[1:]),
                    field.mul(xv, beta), xv,
                )
                yv = u256.select(
                    jnp.broadcast_to(pi == 0, y3.shape[1:]), y3, ny3
                )
                syms, length = pipeline.glv_variant_symbols(
                    fmt, xv, yv, pi, b58, unroll=True
                )
                m = _match_tile(dfa, acc, start, syms, length)
                bits = bits | jnp.where(m, jnp.int32(1) << w, 0)
                return xv, bits

            _, bits = jax.lax.fori_loop(0, 6, body, (x3, zero_bits))
        else:
            def body(v, carry):
                xv, bits = carry
                xv = u256.select(
                    jnp.broadcast_to(v > 0, xv.shape[1:]),
                    field.mul(xv, beta), xv,
                )
                for pi in range(2):
                    syms, length = pipeline.glv_variant_symbols(
                        fmt, xv, None, pi, b58, unroll=True
                    )
                    m = _match_tile(dfa, acc, start, syms, length)
                    bits = bits | jnp.where(
                        m, jnp.int32(1 << pi) << (2 * v), 0
                    )
                return xv, bits

            _, bits = jax.lax.fori_loop(0, 3, body, (x3, zero_bits))
        match_ref[0] = jnp.where(valid, bits, 0)

    return kernel


@functools.lru_cache(maxsize=16)
def fused_match_fn(fmt: AddressFormat, batch: int, n_states: int,
                   tile: int = DEFAULT_TILE, glv: bool = False):
    """Compiled fused matcher: (start, remaining, bx, by, tx, ty, inv_dx,
    dfa_f32 (S,W), accept_f32 (S,1)) -> match (1, batch) int32."""
    width = pipeline.FORMAT_DFA_WIDTH[fmt]
    # VMEM budget (measured scoped-VMEM OOMs): plain DFA fits 2048
    # keys/tile.  GLV: exact-y formats' single-pipeline traced body also
    # fits 2048; the parity pair body needs 1024 (23.7M at 2048 vs the
    # 16M scoped limit).  VGEN_GLV_DFA_KEYS overrides for sweeps.
    import os as _os

    if glv:
        default_keys = 2048 if fmt in pipeline.GLV_EXACT_Y else 1024
        max_keys = int(_os.environ.get("VGEN_GLV_DFA_KEYS", default_keys))
    else:
        max_keys = 2048
    vsub, tile = _tile_plan(batch, tile, max_keys=max_keys)
    span = batch // vsub
    grid = span // tile
    maker = _make_glv_dfa_kernel if glv else _make_kernel
    kernel = maker(fmt, vsub, tile, span)

    limb = lambda: pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # start (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # remaining (1,)
            rep((16, 1, 1)),  # bx
            rep((16, 1, 1)),  # by
            limb(),  # tx
            limb(),  # ty
            limb(),  # inv_dx
            rep((n_states, width)),  # dfa table f32
            rep((n_states, 1)),  # accept f32
            rep((34, 25)),  # base58 power basis f32
        ],
        out_specs=pl.BlockSpec((1, vsub, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, vsub, span), jnp.int32),
    )

    def fn(start, remaining, bx, by, tx, ty, inv_dx, dfa_f32, accept_f32):
        from vgen_tpu.ops.encode import _POW256_B58

        return call(
            jnp.reshape(jnp.asarray(start, dtype=jnp.int32), (1,)),
            jnp.reshape(jnp.asarray(remaining, dtype=jnp.int32), (1,)),
            bx.reshape(16, 1, 1),
            by.reshape(16, 1, 1),
            tx.reshape(16, vsub, span),
            ty.reshape(16, vsub, span),
            inv_dx.reshape(16, vsub, span),
            dfa_f32,
            accept_f32,
            jnp.asarray(_POW256_B58),
        ).reshape(1, batch)

    return fn


def _pack_tail(match, remaining, batch, ops_mult: int = 1):
    """(batch,) match vector (0 = miss, nonzero = hit / GLV variant mask)
    -> packed [count, ops, top-K indices, top-K variant bitmasks].
    ops_mult scales the reported key-check count (6 for GLV steps: each
    position checks 6 keys).  The per-index variant bitmask lets the host
    derive only the variants that matched instead of all 6."""
    idx = jnp.arange(batch, dtype=jnp.int32)
    matched = match > 0
    count = jnp.sum(matched.astype(jnp.int32))
    scores = jnp.where(matched, idx, jnp.int32(-1))
    top = pipeline.top_k_match_indices(scores)
    vbits = jnp.where(top >= 0, match[jnp.maximum(top, 0)], 0)
    ops = jnp.minimum(jnp.maximum(remaining, jnp.int32(0)), jnp.int32(batch))
    ops = ops * jnp.int32(ops_mult)
    return jnp.concatenate([count[None], ops[None], top, vbits])


# ---------------------------------------------------------------------------
# Pallas Montgomery inversion: the XLA chain was 59% of the whole scan step
# (round-4 step-split profile: 57.7 ms of a 97 ms step at K=8, B=512K).
# Its cost is per-STEP overhead, not compute: the fwd/bwd lax.scans and the
# Fermat ladder's fori_loops each pay ~100 us of XLA while-loop overhead at
# the narrow (16, 4096) shapes the chain wants.  These kernels run the same
# algorithm with the sequential chain as the Pallas GRID (hardware loop,
# ~us per step) over V-tiled (16, 8, 512) blocks, with the running
# product/accumulator carried in VMEM scratch across grid steps.
# ---------------------------------------------------------------------------

_INV_VSUB = 8
_INV_LANES = 512
_INV_W = _INV_VSUB * _INV_LANES


def _u256_one(shape):
    limb = jax.lax.broadcasted_iota(jnp.int32, (16,) + shape, 0)
    return jnp.where(limb == 0, jnp.uint32(1), jnp.uint32(0))


@functools.lru_cache(maxsize=8)
def _inv_chain_calls(C: int, guard_zero: bool = False):
    vsub, lanes = _INV_VSUB, _INV_LANES

    def _v(v_ref):
        v = v_ref[:, 0]
        if guard_zero:
            # zero values (e.g. dead-lane ladder Z's) are guarded to 1 so
            # the chain stays invertible; callers mask those lanes anyway
            v = u256.select(
                ~u256.is_zero(v), v, _u256_one((vsub, lanes))
            )
        return v

    def fwd_kernel(v_ref, pex_ref, tot_ref, run_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            run_ref[...] = _u256_one((vsub, lanes))

        run = run_ref[...]
        v = _v(v_ref)
        pex_ref[:, 0] = run  # prefix EXCLUSIVE: v0..v(c-1)
        nxt = field.mul_weak(run, v)
        run_ref[...] = nxt

        @pl.when(c == C - 1)
        def _():
            tot_ref[...] = nxt

    def inv_kernel(tot_ref, out_ref):
        out_ref[...] = field.inv(tot_ref[...])

    def bwd_kernel(v_ref, pex_ref, tinv_ref, out_ref, acc_ref):
        i = pl.program_id(0)  # chain index c = C-1-i via the index maps

        @pl.when(i == 0)
        def _():
            acc_ref[...] = tinv_ref[...]

        acc = acc_ref[...]
        v = _v(v_ref)
        pex = pex_ref[:, 0]
        out_ref[:, 0] = field.normalize_weak_to_canonical(
            field.mul_weak(acc, pex)
        )
        acc_ref[...] = field.mul_weak(acc, v)

    chain_blk = lambda im: pl.BlockSpec((16, 1, vsub, lanes), im,
                                        memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((16, vsub, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    arr4 = jax.ShapeDtypeStruct((16, C, vsub, lanes), jnp.uint32)
    arr3 = jax.ShapeDtypeStruct((16, vsub, lanes), jnp.uint32)
    scratch = [pltpu.VMEM((16, vsub, lanes), jnp.uint32)]

    fwd = pl.pallas_call(
        fwd_kernel,
        grid=C,
        in_specs=[chain_blk(lambda c: (0, c, 0, 0))],
        out_specs=[chain_blk(lambda c: (0, c, 0, 0)), whole],
        out_shape=[arr4, arr3],
        scratch_shapes=scratch,
    )
    invc = pl.pallas_call(
        inv_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=arr3,
    )
    rev = lambda c: (0, C - 1 - c, 0, 0)
    bwd = pl.pallas_call(
        bwd_kernel,
        grid=C,
        in_specs=[chain_blk(rev), chain_blk(rev), whole],
        out_specs=chain_blk(rev),
        out_shape=arr4,
        scratch_shapes=scratch,
    )
    return fwd, invc, bwd


def batch_inverse_chain_pallas(values, guard_zero: bool = False):
    """Drop-in replacement for field.batch_inverse_chain on flat (16, N)
    arrays (zero-free unless guard_zero, weak-tolerant, canonical output).
    Chains run over N/4096 grid steps of V-tiled (16, 8, 512) blocks;
    falls back to the XLA chain when N does not tile.  guard_zero=True
    maps zero inputs to 1 INSIDE the kernels (their "inverses" are
    arbitrary finite values the caller must mask)."""
    N = values.shape[1]
    if N % _INV_W or N < 2 * _INV_W:
        if guard_zero:
            values = u256.select(
                ~u256.is_zero(values), values,
                u256.constant(1, values.shape[1:]),
            )
        C = min(256, N)
        while N % C:
            C //= 2
        return field.batch_inverse_chain(
            values.reshape(16, C, N // C)
        ).reshape(16, N)
    C = N // _INV_W
    fwd, invc, bwd = _inv_chain_calls(C, guard_zero)
    v4 = values.reshape(16, C, _INV_VSUB, _INV_LANES)
    pex, tot = fwd(v4)
    tinv = invc(tot)
    return bwd(v4, pex, tinv).reshape(16, N)


def _smem_point_vec(ref, k, shape):
    """(16,) u256 vector block from 16 dynamically-indexed SMEM scalars."""
    return jnp.concatenate([
        jnp.broadcast_to(ref[k, l], (1,) + shape) for l in range(16)
    ])


@functools.lru_cache(maxsize=8)
def _inv_dx_calls(C: int, n_b: int):
    """Chain kernels that COMPUTE dx = tx - bx[window] on the fly instead
    of reading a materialized dx array: the XLA dx+select stage measured
    16.5 ms of a 65 ms step (round-4 profile) against ~2 ms of extra
    in-kernel work here.  n_b = window size B in 4096-lane chain blocks;
    window k = c // n_b, zero dx lanes (the doubling slot) are guarded to
    1 exactly like the XLA path (the match tail re-derives validity)."""
    vsub, lanes = _INV_VSUB, _INV_LANES

    def _dx_blk(bx_ref, tx_blk, c):
        bxv = _smem_point_vec(bx_ref, c // n_b, (vsub, lanes))
        dx = field.sub(tx_blk, bxv)
        return u256.select(
            ~u256.is_zero(dx), dx, _u256_one((vsub, lanes))
        )

    def fwd_kernel(bx_ref, tx_ref, pex_ref, tot_ref, run_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            run_ref[...] = _u256_one((vsub, lanes))

        run = run_ref[...]
        v = _dx_blk(bx_ref, tx_ref[:, 0], c)
        pex_ref[:, 0] = run
        nxt = field.mul_weak(run, v)
        run_ref[...] = nxt

        @pl.when(c == C - 1)
        def _():
            tot_ref[...] = nxt

    def inv_kernel(tot_ref, out_ref):
        out_ref[...] = field.inv(tot_ref[...])

    def bwd_kernel(bx_ref, tx_ref, pex_ref, tinv_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = tinv_ref[...]

        acc = acc_ref[...]
        v = _dx_blk(bx_ref, tx_ref[:, 0], C - 1 - i)
        pex = pex_ref[:, 0]
        out_ref[:, 0] = field.normalize_weak_to_canonical(
            field.mul_weak(acc, pex)
        )
        acc_ref[...] = field.mul_weak(acc, v)

    chain_blk = lambda im: pl.BlockSpec((16, 1, vsub, lanes), im,
                                        memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((16, vsub, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    arr4 = jax.ShapeDtypeStruct((16, C, vsub, lanes), jnp.uint32)
    arr3 = jax.ShapeDtypeStruct((16, vsub, lanes), jnp.uint32)
    scratch = [pltpu.VMEM((16, vsub, lanes), jnp.uint32)]
    tx_blk = lambda im: pl.BlockSpec((16, 1, vsub, lanes), im,
                                     memory_space=pltpu.VMEM)

    fwd = pl.pallas_call(
        fwd_kernel,
        grid=C,
        in_specs=[smem, tx_blk(lambda c: (0, c % n_b, 0, 0))],
        out_specs=[chain_blk(lambda c: (0, c, 0, 0)), whole],
        out_shape=[arr4, arr3],
        scratch_shapes=scratch,
    )
    invc = pl.pallas_call(
        inv_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=arr3,
    )
    rev = lambda c: (0, C - 1 - c, 0, 0)
    bwd = pl.pallas_call(
        bwd_kernel,
        grid=C,
        in_specs=[smem, tx_blk(lambda c: (0, (C - 1 - c) % n_b, 0, 0)),
                  chain_blk(rev), whole],
        out_specs=chain_blk(rev),
        out_shape=arr4,
        scratch_shapes=scratch,
    )
    return fwd, invc, bwd


def batch_inverse_dx_pallas(bx, tx):
    """Window-difference inverses without materializing dx: bx (K, 16)
    window base points, tx (16, B) table -> (16, K*B) canonical inverses
    of (tx[b] - bx[k]) with zero differences guarded to arbitrary finite
    values (callers mask them by validity, as with the XLA dx path).
    Requires B % 4096 == 0; returns None otherwise (caller falls back)."""
    K, B = bx.shape[0], tx.shape[1]
    if B % _INV_W:
        return None
    n_b = B // _INV_W
    C = K * n_b
    fwd, invc, bwd = _inv_dx_calls(C, n_b)
    tx4 = tx.reshape(16, n_b, _INV_VSUB, _INV_LANES)
    pex, tot = fwd(bx, tx4)
    tinv = invc(tot)
    return bwd(bx, tx4, pex, tinv).reshape(16, K * B)


def _build_step(tail_one, batch: int, chain_len: int, k_sub: int):
    """Shared step scaffold: ONE Montgomery inversion spanning all k_sub
    windows (each sequential XLA loop step costs ~100us of dispatch
    overhead, so the ~400-step chain+ladder must amortize over k_sub*batch
    keys, not per window), then the per-window Pallas tail.

    tail_one(bx (16,), by (16,), tx, ty, inv_dx, remaining, *margs) ->
    (34,) packed.  Returns jitted step(bx (K,16), by (K,16), tx, ty,
    remaining (K,), *margs) -> (K, 34) int32.
    """

    def step(bx, by, tx, ty, remaining, *margs):
        K = bx.shape[0]
        inv_flat = batch_inverse_dx_pallas(bx, tx)
        if inv_flat is None:
            # batch does not tile into chain blocks: materialize dx and
            # run the generic chain (the original XLA-side structure)
            bxl = jnp.transpose(bx)  # (16, K)
            dx = field.sub(tx[:, None, :], bxl[:, :, None])
            dx_flat = dx.reshape(16, K * batch)
            dx_safe = u256.select(
                ~u256.is_zero(dx_flat), dx_flat,
                u256.constant(1, dx_flat.shape[1:])
            )
            inv_flat = batch_inverse_chain_pallas(dx_safe)

        if k_sub == 1:
            return tail_one(bx[0], by[0], tx, ty, inv_flat[:, :batch],
                            remaining[0], *margs)[None]

        # per-window inverse slabs come from LANE-dim dynamic slices: a
        # (16, K, batch) -> (K, 16, batch) moveaxis changes the sublane
        # dim and relayouts the whole 128 MB array
        def body(_, xs):
            bxk, byk, remk, k = xs
            invk = jax.lax.dynamic_slice(
                inv_flat, (jnp.int32(0), k * batch), (16, batch)
            )
            return None, tail_one(bxk, byk, tx, ty, invk, remk, *margs)

        ks = jnp.arange(K, dtype=jnp.int32)
        _, outs = jax.lax.scan(body, None, (bx, by, remaining, ks))
        return outs

    return jax.jit(step)


@functools.lru_cache(maxsize=16)
def fused_scan_step(fmt: AddressFormat, batch: int, n_states: int,
                    chain_len: int = 256, tile: int = DEFAULT_TILE,
                    k_sub: int = 1, glv: bool = False):
    """Full jitted step: XLA inversion + fused Pallas DFA tail + top-K.

    With k_sub > 1 the step scans k_sub consecutive key windows (one base
    point each, same replicated table) in ONE dispatch, returning a packed
    (k_sub, 34) int32 result [[count, ops, idx0..15, vbits0..15], ...].  Host<->device
    round trips through the device tunnel cost ~27 ms each, so results for
    k_sub * batch keys ship as a single transfer.

    glv=True (random scans): each position DFA-matches the 6 GLV variants
    of its key (ops reported 6x; the host re-derives all variants of a
    reported index, exactly like the interval GLV path).

    (bx (K,16), by (K,16), tx, ty, dfa_f32, accept_f32, start,
     remaining (K,)) -> (K, 34) int32
    """
    match_fn = fused_match_fn(fmt, batch, n_states, tile, glv)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, dfa_f32, accept_f32,
                  start):
        match = match_fn(
            start, remaining, bx, by, tx, ty, inv_dx, dfa_f32, accept_f32
        )[0]
        return _pack_tail(match, remaining, batch, ops_mult=6 if glv else 1)

    built = _build_step(_tail_one, batch, chain_len, k_sub)

    def step(bx, by, tx, ty, dfa_f32, accept_f32, start, remaining):
        return built(bx, by, tx, ty, remaining, dfa_f32, accept_f32, start)

    return step


@functools.lru_cache(maxsize=16)
def fused_scan_mask_step(fmt: AddressFormat, batch: int, n_states: int,
                         chain_len: int = 256, tile: int = DEFAULT_TILE,
                         glv: bool = False):
    """Full-mask variant of fused_scan_step for >TOP_K overflow recovery:
    (bx (1,16), by (1,16), tx, ty, dfa_f32, accept_f32, start,
    remaining (1,)) -> (1, batch) int32 match mask."""
    match_fn = fused_match_fn(fmt, batch, n_states, tile, glv)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, dfa_f32, accept_f32,
                  start):
        return match_fn(
            start, remaining, bx, by, tx, ty, inv_dx, dfa_f32, accept_f32
        )[0]

    built = _build_step(_tail_one, batch, chain_len, k_sub=1)

    def step(bx, by, tx, ty, dfa_f32, accept_f32, start, remaining):
        return built(bx, by, tx, ty, remaining, dfa_f32, accept_f32, start)

    return step


# ---------------------------------------------------------------------------
# P2TR TapTweak ladder kernel: the XLA while-loop ladder spends ~70% of its
# time on HBM<->VMEM copies/spills of the (16, B) accumulator state (device
# profile, round 2).  This kernel keeps the whole Q = P + t*G computation
# VMEM-resident per tile: tagged hash -> 32 x (one-hot MXU table select +
# lean Jacobian mixed add), no inversions inside (Jacobian accumulation);
# the single batch normalization happens outside in XLA.
# ---------------------------------------------------------------------------


def _make_p2tr_ladder_kernel(vsub: int, tile: int, finish: bool = False):
    """finish=False: inputs are affine points (x, y).  finish=True: inputs
    are (bx, by, tx, ty, inv_dx) and the kernel performs the EC finish
    itself -- the fully-fused scan path (VERDICT r3 item 5: the packed XLA
    P2TR step's program grew past the remote compiler's memory limit at
    batch 262144; keeping EC+tweak+ladder in one kernel both shrinks the
    XLA program and removes its HBM streaming)."""
    from vgen_tpu.ops import sha256 as _sha

    mid = _sha.tagged_midstate("TapTweak")

    def _core(x, y, lo_ref, hi_ref, X_ref, Y_ref, Z_ref, ok_ref, valid):
        # BIP341: even-Y internal key
        y = u256.select(y[0] & jnp.uint32(1) == 0, y, field.neg(y))
        xb = u256.to_bytes_be(x)
        tb = _sha.tagged_hash_32(mid, xb, unroll=True)
        t = u256.from_bytes_be(tb)
        n_limbs = u256.constant(field.N_INT, t.shape[1:])
        ok = ~u256.geq(t, n_limbs)

        X, Y = x, y
        Z = u256.constant(1, x.shape[1:])
        # digit one-hot leads with the table dim so the select is one
        # dot_general contraction per plane -- no transposes (the flat-row
        # version transposed (T, 16) twice per window, 64 per tile)
        ids = jax.lax.broadcasted_iota(jnp.int32, (256, vsub, tile), 0)
        # (32, V, T) window digits, extracted up front so the ladder can
        # run as a fori_loop: the 32-window UNROLLED kernel serialized to
        # ~11 MB of MLIR and the remote compile helper was OOM-killed
        # (round-4 measurement); tracing the window body ONCE keeps the
        # program ~32x smaller.  lo/hi stay refs, indexed dynamically.
        digits = jnp.stack([
            ((t[w // 2] >> jnp.uint32(8 * (w % 2))) & jnp.uint32(255))
            .astype(jnp.int32)
            for w in range(32)
        ])
        widx = jax.lax.broadcasted_iota(jnp.int32, (32, 1, 1), 0)

        def body(w, carry):
            # all carries are i32 vectors: i1 vector loop carries fail
            # Mosaic's scf.for legalization
            X, Y, Z, ok32 = carry
            ok = ok32 > 0
            # Mosaic has no dynamic_slice on VALUES; select the window's
            # digit row by masked sum (32 rows, cheap) and its table
            # planes by dynamic REF load (supported)
            digit = jnp.sum(jnp.where(widx == w, digits, 0), axis=0)
            lo_w = lo_ref[pl.dslice(w, 1), :, :][0]
            hi_w = hi_ref[pl.dslice(w, 1), :, :][0]
            oh = u256.bool_to_f32(ids == digit[None])
            dn = (((1,), (0,)), ((), ()))
            sel = jax.lax.dot_general(
                lo_w, oh, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ) + 256.0 * jax.lax.dot_general(
                hi_w, oh, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )  # (32, V, T) exact: byte planes <= 255 are bf16-exact
            tx = u256.f32_to_u32(sel[:16])
            ty = u256.f32_to_u32(sel[16:])
            nz = digit != 0
            Xn, Yn, Zn, add_ok = curve.jacobian_add_affine_lean(
                X, Y, Z, tx, ty
            )
            # H == 0 (P == +-Q, vanishing probability) is masked, not
            # branched; a dead lane stays dead via the latched ok
            ok = ok & (add_ok | ~nz)
            X = u256.select(nz, Xn, X)
            Y = u256.select(nz, Yn, Y)
            Z = u256.select(nz, Zn, Z)
            return X, Y, Z, jnp.where(ok, 1, 0)

        X, Y, Z, ok32 = jax.lax.fori_loop(
            0, 32, body, (X, Y, Z, jnp.where(ok, 1, 0))
        )
        ok = ok32 > 0
        if valid is not None:
            ok = ok & valid
        X_ref[...] = X
        Y_ref[...] = Y
        Z_ref[...] = Z
        ok_ref[0] = jnp.where(ok, 1, 0)

    if finish:
        def kernel(bx_ref, by_ref, tx_ref, ty_ref, inv_ref,
                   lo_ref, hi_ref, X_ref, Y_ref, Z_ref, ok_ref):
            bx = bx_ref[:, 0, 0][:, None, None]
            by = by_ref[:, 0, 0][:, None, None]
            x, y, valid = _ec_finish(bx, by, tx_ref[...], ty_ref[...],
                                     inv_ref[...])
            _core(x, y, lo_ref, hi_ref, X_ref, Y_ref, Z_ref, ok_ref, valid)
    else:
        def kernel(x_ref, y_ref, lo_ref, hi_ref, X_ref, Y_ref, Z_ref,
                   ok_ref):
            _core(x_ref[...], y_ref[...], lo_ref, hi_ref,
                  X_ref, Y_ref, Z_ref, ok_ref, None)

    return kernel


@functools.lru_cache(maxsize=4)
def p2tr_ladder_fn(batch: int, tile: int = DEFAULT_TILE):
    """Compiled VMEM-resident TapTweak ladder: (x, y (16,B), loT, hiT
    (32,32,256) f32 byte planes of the window table, [window, limb-col,
    digit] order) -> (X, Y, Z (16,B) Jacobian output key, ok (1,B)).

    max_keys=2048 is MEASURED optimal: (8,512) 4096-key tiles were tried
    (round 5, chasing the leanadd-at-(8,512) roofline) and ran 7% SLOWER
    (5.46 vs 5.85 M e2e) -- the ladder's 4 carried state arrays + table
    planes spill at the larger tile, outweighing the extra ILP."""
    vsub, tile = _tile_plan(batch, tile, max_keys=2048)
    span = batch // vsub
    grid = span // tile
    kernel = _make_p2tr_ladder_kernel(vsub, tile)

    limb_in = lambda: pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            limb_in(),  # x
            limb_in(),  # y
            rep((32, 32, 256)),  # lo plane (transposed)
            rep((32, 32, 256)),  # hi plane (transposed)
        ],
        out_specs=[
            pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vsub, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, vsub, span), jnp.uint32),
            jax.ShapeDtypeStruct((16, vsub, span), jnp.uint32),
            jax.ShapeDtypeStruct((16, vsub, span), jnp.uint32),
            jax.ShapeDtypeStruct((1, vsub, span), jnp.int32),
        ],
    )

    def fn(x, y, loT, hiT):
        X, Y, Z, ok = call(
            x.reshape(16, vsub, span), y.reshape(16, vsub, span), loT, hiT
        )
        return (
            X.reshape(16, batch), Y.reshape(16, batch),
            Z.reshape(16, batch), ok.reshape(1, batch),
        )

    return fn


def p2tr_output_key_pallas(x3, y3, window_table, chain_len: int = 256):
    """Taproot output-key x-coordinate via the Pallas ladder + one XLA
    batch normalization.  Same contract as pipeline.p2tr_output_key:
    (qx (16,B) limbs, ok mask)."""
    B = x3.shape[1]
    tblf = window_table.astype(jnp.float32).reshape(32, 256, 32)
    tblf = jnp.transpose(tblf, (0, 2, 1))  # (32, 32, 256) [w, limb, digit]
    lo = tblf % 256.0
    hi = jnp.floor(tblf / 256.0)
    X, Y, Z, ok_i = p2tr_ladder_fn(B)(x3, y3, lo, hi)
    ok = (ok_i[0] > 0) & ~u256.is_zero(Z)
    z_safe = u256.select(ok, Z, u256.constant(1, Z.shape[1:]))
    C = min(chain_len, B)
    if B % C:
        C = B
    zi = field.batch_inverse_chain(
        z_safe.reshape(16, C, B // C)
    ).reshape(16, B)
    qx = field.mul(X, field.square(zi))
    return qx, ok


def p2tr_planes(window_table):
    """(32, 256, 2, 16) u32 window table -> (loT, hiT) f32 byte planes in
    [window, limb-col, digit] order, the ladder kernels' table layout."""
    tblf = window_table.astype(jnp.float32).reshape(32, 256, 32)
    tblf = jnp.transpose(tblf, (0, 2, 1))
    return tblf % 256.0, jnp.floor(tblf / 256.0)


@functools.lru_cache(maxsize=4)
def p2tr_ladder_finish_fn(batch: int, tile: int = DEFAULT_TILE):
    """EC finish + TapTweak + windowed ladder in ONE kernel:
    (bx, by (16,), tx, ty, inv_dx (16,B), loT, hiT (32,32,256)) ->
    (X, Y, Z (16,B) Jacobian output key, ok (1,B) incl. dx-validity).
    max_keys=2048 measured optimal (see p2tr_ladder_fn: 4096 spills)."""
    vsub, tile = _tile_plan(batch, tile, max_keys=2048)
    span = batch // vsub
    grid = span // tile
    kernel = _make_p2tr_ladder_kernel(vsub, tile, finish=True)

    limb_in = lambda: pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    limb_out = lambda n: pl.BlockSpec((n, vsub, tile), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            rep((16, 1, 1)),  # bx
            rep((16, 1, 1)),  # by
            limb_in(),  # tx
            limb_in(),  # ty
            limb_in(),  # inv_dx
            rep((32, 32, 256)),  # lo plane
            rep((32, 32, 256)),  # hi plane
        ],
        out_specs=[limb_out(16), limb_out(16), limb_out(16), limb_out(1)],
        out_shape=[
            jax.ShapeDtypeStruct((16, vsub, span), jnp.uint32),
            jax.ShapeDtypeStruct((16, vsub, span), jnp.uint32),
            jax.ShapeDtypeStruct((16, vsub, span), jnp.uint32),
            jax.ShapeDtypeStruct((1, vsub, span), jnp.int32),
        ],
    )

    def fn(bx, by, tx, ty, inv_dx, loT, hiT):
        X, Y, Z, ok = call(
            bx.reshape(16, 1, 1), by.reshape(16, 1, 1),
            tx.reshape(16, vsub, span), ty.reshape(16, vsub, span),
            inv_dx.reshape(16, vsub, span), loT, hiT,
        )
        return (
            X.reshape(16, batch), Y.reshape(16, batch),
            Z.reshape(16, batch), ok.reshape(1, batch),
        )

    return fn


def _p2tr_qx_in_kernel(X_ref, Z_ref, zi_ref, ok_ref):
    """Shared finish inside the P2TR tail kernels: qx = X * zi^2 with the
    dead-lane mask.  The round-4 XLA version of this (select + 2 field
    muls + word extraction at (16, 512K)) streamed every intermediate
    through HBM and held P2TR to 45% of its ladder bound (VERDICT r4
    weak-3); in-kernel the whole finish stays VMEM-resident."""
    Z = Z_ref[...]
    ok = (ok_ref[0] > 0) & ~u256.is_zero(Z)
    qx = field.mul(X_ref[...], field.square(zi_ref[...]))
    return qx, ok


def _make_p2tr_finish_match_kernel(vsub: int, tile: int, span: int):
    """Jacobian-output finish + bech32m encode + DFA match in one kernel:
    (start, remaining, X, Z, zi, ok, dfa, accept) -> match.  zi is the
    (guard_zero) chain inverse of Z; dead lanes (ok=0 or Z=0) carry
    arbitrary finite zi and are masked here."""

    def kernel(start_ref, rem_ref, X_ref, Z_ref, zi_ref, ok_ref, dfa_ref,
               acc_ref, match_ref):
        i = pl.program_id(0)
        qx, okv = _p2tr_qx_in_kernel(X_ref, Z_ref, zi_ref, ok_ref)
        syms, length = encode.segwit_symbols(u256.to_bytes_be(qx), 1)
        valid = okv & (_tile_gidx(i, vsub, tile, span) < rem_ref[0])
        m = _match_tile(dfa_ref[...], acc_ref[...], start_ref[0], syms,
                        length)
        match_ref[0] = jnp.where(m & valid, 1, 0)

    return kernel


def _make_p2tr_finish_range_kernel(vsub: int, tile: int, span: int):
    """Jacobian-output finish + 8-word interval compare in one kernel:
    (remaining, lo, hi, X, Z, zi, ok) -> match."""

    def kernel(rem_ref, lo_ref, hi_ref, X_ref, Z_ref, zi_ref, ok_ref,
               match_ref):
        i = pl.program_id(0)
        qx, okv = _p2tr_qx_in_kernel(X_ref, Z_ref, zi_ref, ok_ref)
        words = pipeline.bytes_be_words(u256.to_bytes_be(qx))
        matched = pipeline.in_intervals(words, lo_ref, hi_ref)
        valid = okv & (_tile_gidx(i, vsub, tile, span) < rem_ref[0])
        match_ref[0] = jnp.where(matched & valid, 1, 0)

    return kernel


@functools.lru_cache(maxsize=4)
def p2tr_finish_match_fn(batch: int, n_states: int,
                         tile: int = DEFAULT_TILE):
    """Compiled P2TR finish+DFA tail over Jacobian ladder outputs."""
    width = pipeline.FORMAT_DFA_WIDTH[AddressFormat.P2TR]
    vsub, tile = _tile_plan(batch, tile, max_keys=2048)
    span = batch // vsub
    grid = span // tile
    kernel = _make_p2tr_finish_match_kernel(vsub, tile, span)

    limb = lambda: pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # start (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # remaining (1,)
            limb(),  # X
            limb(),  # Z
            limb(),  # zi
            pl.BlockSpec((1, vsub, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),  # ok
            rep((n_states, width)),  # dfa f32
            rep((n_states, 1)),  # accept f32
        ],
        out_specs=pl.BlockSpec((1, vsub, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, vsub, span), jnp.int32),
    )

    def fn(start, remaining, X, Z, zi, ok_i, dfa_f32, accept_f32):
        return call(
            jnp.reshape(jnp.asarray(start, dtype=jnp.int32), (1,)),
            jnp.reshape(jnp.asarray(remaining, dtype=jnp.int32), (1,)),
            X.reshape(16, vsub, span),
            Z.reshape(16, vsub, span),
            zi.reshape(16, vsub, span),
            ok_i.reshape(1, vsub, span),
            dfa_f32,
            accept_f32,
        ).reshape(1, batch)

    return fn


@functools.lru_cache(maxsize=4)
def p2tr_finish_range_fn(batch: int, n_slots: int,
                         tile: int = DEFAULT_TILE):
    """Compiled P2TR finish+interval tail over Jacobian ladder outputs."""
    vsub, tile = _tile_plan(batch, tile, max_keys=2048)
    span = batch // vsub
    grid = span // tile
    kernel = _make_p2tr_finish_range_kernel(vsub, tile, span)

    limb = lambda: pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # remaining (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo (slots, 8)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # hi (slots, 8)
            limb(),  # X
            limb(),  # Z
            limb(),  # zi
            pl.BlockSpec((1, vsub, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),  # ok
        ],
        out_specs=pl.BlockSpec((1, vsub, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, vsub, span), jnp.int32),
    )

    def fn(remaining, lo, hi, X, Z, zi, ok_i):
        return call(
            jnp.reshape(jnp.asarray(remaining, dtype=jnp.int32), (1,)),
            lo, hi,
            X.reshape(16, vsub, span),
            Z.reshape(16, vsub, span),
            zi.reshape(16, vsub, span),
            ok_i.reshape(1, vsub, span),
        ).reshape(1, batch)

    return fn


def _p2tr_ladder_zi(ladder, bx, by, tx, ty, inv_dx, loT, hiT):
    """Ladder kernel + guard-zero Pallas inversion of Z.  Everything after
    (qx = X*zi^2, encode/compare, masks) happens inside the finish kernels
    -- the XLA version of that tail streamed (16, 512K) intermediates
    through HBM and held P2TR at 45% of its ladder bound (round-4
    ROOFLINE)."""
    X, _, Z, ok_i = ladder(bx, by, tx, ty, inv_dx, loT, hiT)
    zi = batch_inverse_chain_pallas(Z, guard_zero=True)
    return X, Z, zi, ok_i


@functools.lru_cache(maxsize=8)
def fused_p2tr_range_scan_step(batch: int, chain_len: int = 256,
                               tile: int = DEFAULT_TILE, k_sub: int = 1,
                               n_slots: int = pipeline.MAX_INTERVALS):
    """Fully-fused P2TR interval scan step: XLA inversion -> Pallas
    [EC finish + TapTweak + ladder] -> Pallas Z-chain -> Pallas
    [finish + 8-word range compare].  (bx (K,16), by (K,16), tx, ty,
    lo/hi (slots,8) u32, remaining (K,), window_table) -> (K,34) int32.

    No GLV: the TapTweak rebinds the key, so endomorphism variants do not
    share output keys (pipeline.GLV_FORMATS excludes P2TR)."""
    ladder = p2tr_ladder_finish_fn(batch, tile)
    finish = p2tr_finish_range_fn(batch, n_slots, tile)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, lo, hi, loT, hiT):
        X, Z, zi, ok_i = _p2tr_ladder_zi(ladder, bx, by, tx, ty, inv_dx,
                                         loT, hiT)
        match = finish(remaining, lo, hi, X, Z, zi, ok_i)[0]
        return _pack_tail(match, remaining, batch)

    built = _build_step(_tail_one, batch, chain_len, k_sub)

    def step(bx, by, tx, ty, lo, hi, remaining, window_table):
        loT, hiT = p2tr_planes(window_table)
        return built(bx, by, tx, ty, remaining, lo, hi, loT, hiT)

    return step


@functools.lru_cache(maxsize=8)
def fused_p2tr_scan_step(batch: int, n_states: int, chain_len: int = 256,
                         tile: int = DEFAULT_TILE, k_sub: int = 1):
    """Fully-fused P2TR DFA scan step: ladder kernel + Pallas Z-chain +
    Pallas [finish + bech32m-encode/DFA] kernel.  (bx (K,16), by (K,16),
    tx, ty, dfa_f32, accept_f32, start, remaining (K,), window_table) ->
    (K, 34) int32."""
    ladder = p2tr_ladder_finish_fn(batch, tile)
    finish = p2tr_finish_match_fn(batch, n_states, tile)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, dfa_f32, accept_f32,
                  start, loT, hiT):
        X, Z, zi, ok_i = _p2tr_ladder_zi(ladder, bx, by, tx, ty, inv_dx,
                                         loT, hiT)
        match = finish(start, remaining, X, Z, zi, ok_i, dfa_f32,
                       accept_f32)[0]
        return _pack_tail(match, remaining, batch)

    built = _build_step(_tail_one, batch, chain_len, k_sub)

    def step(bx, by, tx, ty, dfa_f32, accept_f32, start, remaining,
             window_table):
        loT, hiT = p2tr_planes(window_table)
        return built(bx, by, tx, ty, remaining, dfa_f32, accept_f32, start,
                     loT, hiT)

    return step


@functools.lru_cache(maxsize=8)
def fused_p2tr_range_mask_step(batch: int, chain_len: int = 256,
                               tile: int = DEFAULT_TILE,
                               n_slots: int = pipeline.MAX_INTERVALS):
    """Full-mask variant of fused_p2tr_range_scan_step (overflow
    recovery): -> (1, batch) int32 match mask."""
    ladder = p2tr_ladder_finish_fn(batch, tile)
    finish = p2tr_finish_range_fn(batch, n_slots, tile)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, lo, hi, loT, hiT):
        X, Z, zi, ok_i = _p2tr_ladder_zi(ladder, bx, by, tx, ty, inv_dx,
                                         loT, hiT)
        return finish(remaining, lo, hi, X, Z, zi, ok_i)[0]

    built = _build_step(_tail_one, batch, chain_len, k_sub=1)

    def step(bx, by, tx, ty, lo, hi, remaining, window_table):
        loT, hiT = p2tr_planes(window_table)
        return built(bx, by, tx, ty, remaining, lo, hi, loT, hiT)

    return step


@functools.lru_cache(maxsize=8)
def fused_p2tr_scan_mask_step(batch: int, n_states: int,
                              chain_len: int = 256,
                              tile: int = DEFAULT_TILE):
    """Full-mask variant of fused_p2tr_scan_step (overflow recovery)."""
    ladder = p2tr_ladder_finish_fn(batch, tile)
    finish = p2tr_finish_match_fn(batch, n_states, tile)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, dfa_f32, accept_f32,
                  start, loT, hiT):
        X, Z, zi, ok_i = _p2tr_ladder_zi(ladder, bx, by, tx, ty, inv_dx,
                                         loT, hiT)
        return finish(start, remaining, X, Z, zi, ok_i, dfa_f32,
                      accept_f32)[0]

    built = _build_step(_tail_one, batch, chain_len, k_sub=1)

    def step(bx, by, tx, ty, dfa_f32, accept_f32, start, remaining,
             window_table):
        loT, hiT = p2tr_planes(window_table)
        return built(bx, by, tx, ty, remaining, dfa_f32, accept_f32, start,
                     loT, hiT)

    return step


# ---------------------------------------------------------------------------
# Interval (anchored-prefix) fast path: hash160 range compare instead of
# encode+DFA (pattern/intervals.py).  Tail work per key drops to
# EC-finish + SHA-256 + RIPEMD-160 + a few word compares.
# ---------------------------------------------------------------------------

# Shared interval helpers live in ops/pipeline.py (the same jnp code traces
# in the XLA tail and inside these kernels); aliased here for the public
# surface scanner/validate use.
MAX_IV = pipeline.MAX_INTERVALS
GLV_FORMATS = pipeline.GLV_FORMATS
intervals_to_words = pipeline.intervals_to_words


def _hash_words(fmt: AddressFormat, x3, y3):
    words, ok = pipeline.interval_value_words(fmt, x3, y3, unroll=True)
    assert ok is None, fmt  # P2TR (windowed tweak) has no fused kernel
    return words


def _make_range_kernel(fmt: AddressFormat, vsub: int, tile: int, span: int):
    def kernel(rem_ref, lo_ref, hi_ref, bx_ref, by_ref, tx_ref, ty_ref,
               inv_ref, match_ref):
        i = pl.program_id(0)
        bx = bx_ref[:, 0, 0][:, None, None]
        by = by_ref[:, 0, 0][:, None, None]
        x3, y3, valid = _ec_finish(bx, by, tx_ref[...], ty_ref[...],
                                   inv_ref[...])
        words = _hash_words(fmt, x3, y3)
        matched = pipeline.in_intervals(words, lo_ref, hi_ref)
        valid = valid & (_tile_gidx(i, vsub, tile, span) < rem_ref[0])
        match_ref[0] = jnp.where(matched & valid, 1, 0)

    return kernel


def _ec_finish_x(bx, by, tx, ty, inv_dx):
    """x-coordinate-only affine add: one field mul cheaper than _ec_finish
    (skips y3), enough for GLV parity-pair matching."""
    dx = field.sub(tx, bx)
    valid = ~u256.is_zero(dx)
    lam = field.mul_weak(field.sub(ty, by), inv_dx)
    x3 = field.normalize_weak_to_canonical(
        field.sub(field.sub(field.square_weak(lam), bx), tx)
    )
    return x3, valid


def _make_range_glv_kernel(fmt: AddressFormat, vsub: int, tile: int, span: int):
    """GLV endomorphism kernel: 6 keys {±k, ±λk, ±λ²k} per EC add.  The
    variants' points share x-coordinates {x, βx, β²x}; for hash160 formats
    the ± pair is exactly the two compressed-prefix parities, so y is never
    computed at all (x-only finish).  Ethereum hashes full coordinates, and
    phi(x, y) = (βx, y) keeps y, so one full finish feeds all variants.
    (The same amortization VanitySearch uses; the reference checks 1 key
    per add, search.wgsl:3-31.)"""

    def kernel(rem_ref, lo_ref, hi_ref, bx_ref, by_ref, tx_ref, ty_ref,
               inv_ref, match_ref):
        i = pl.program_id(0)
        bx = bx_ref[:, 0, 0][:, None, None]
        by = by_ref[:, 0, 0][:, None, None]
        if fmt in pipeline.GLV_EXACT_Y:
            x3, y3, valid = _ec_finish(bx, by, tx_ref[...], ty_ref[...],
                                       inv_ref[...])
        else:
            x3, valid = _ec_finish_x(bx, by, tx_ref[...], ty_ref[...],
                                     inv_ref[...])
            y3 = None
        mask = pipeline.glv_interval_mask(fmt, x3, y3, lo_ref, hi_ref,
                                          unroll=True)
        valid = valid & (_tile_gidx(i, vsub, tile, span) < rem_ref[0])
        match_ref[0] = jnp.where(valid, mask, 0)

    return kernel


@functools.lru_cache(maxsize=16)
def fused_range_match_fn(fmt: AddressFormat, batch: int,
                         tile: int = DEFAULT_TILE, glv: bool = False):
    """Compiled interval matcher: (remaining, lo, hi, bx, by, tx, ty,
    inv_dx) -> match (1, batch) int32 (0/1, or a 6-bit variant mask when
    glv -- any nonzero means some GLV variant of the key matched)."""
    vsub, tile = _tile_plan(batch, tile)
    span = batch // vsub
    grid = span // tile
    maker = _make_range_glv_kernel if glv else _make_range_kernel
    kernel = maker(fmt, vsub, tile, span)

    limb = lambda: pl.BlockSpec((16, vsub, tile), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # remaining (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lo (MAX_IV, 5)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # hi (MAX_IV, 5)
            rep((16, 1, 1)),  # bx
            rep((16, 1, 1)),  # by
            limb(),  # tx
            limb(),  # ty
            limb(),  # inv_dx
        ],
        out_specs=pl.BlockSpec((1, vsub, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, vsub, span), jnp.int32),
    )

    def fn(remaining, lo, hi, bx, by, tx, ty, inv_dx):
        return call(
            jnp.reshape(jnp.asarray(remaining, dtype=jnp.int32), (1,)),
            lo, hi,
            bx.reshape(16, 1, 1), by.reshape(16, 1, 1),
            tx.reshape(16, vsub, span),
            ty.reshape(16, vsub, span),
            inv_dx.reshape(16, vsub, span),
        ).reshape(1, batch)

    return fn


@functools.lru_cache(maxsize=16)
def fused_range_scan_step(fmt: AddressFormat, batch: int,
                          chain_len: int = 256, tile: int = DEFAULT_TILE,
                          k_sub: int = 1, glv: bool = False):
    """Interval-matching scan step (same shape contract as fused_scan_step):

    (bx (K,16), by (K,16), tx, ty, lo (8,5) u32, hi (8,5) u32,
     remaining (K,)) -> (K, 34) int32 packed results.

    With glv=True each window position checks the 6 GLV variant keys of
    base+1+idx (ops reported 6x).  The packed row's vbits slots carry a
    per-index variant bitmask (bit 2v+pi, see pipeline.glv_variant_symbols);
    the host derives only the flagged candidates via
    crypto.secp256k1.glv_bit_variant_keys instead of all 6.
    """
    match_fn = fused_range_match_fn(fmt, batch, tile, glv)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, lo, hi):
        match = match_fn(remaining, lo, hi, bx, by, tx, ty, inv_dx)[0]
        return _pack_tail(match, remaining, batch, ops_mult=6 if glv else 1)

    built = _build_step(_tail_one, batch, chain_len, k_sub)

    def step(bx, by, tx, ty, lo, hi, remaining):
        return built(bx, by, tx, ty, remaining, lo, hi)

    return step


@functools.lru_cache(maxsize=16)
def fused_range_mask_step(fmt: AddressFormat, batch: int,
                          chain_len: int = 256, tile: int = DEFAULT_TILE,
                          glv: bool = False):
    """Full-mask variant of fused_range_scan_step for >TOP_K overflow
    recovery: (bx (1,16), by (1,16), tx, ty, lo, hi, remaining (1,)) ->
    (1, batch) int32 match/variant mask."""
    match_fn = fused_range_match_fn(fmt, batch, tile, glv)

    def _tail_one(bx, by, tx, ty, inv_dx, remaining, lo, hi):
        return match_fn(remaining, lo, hi, bx, by, tx, ty, inv_dx)[0]

    built = _build_step(_tail_one, batch, chain_len, k_sub=1)

    def step(bx, by, tx, ty, lo, hi, remaining):
        return built(bx, by, tx, ty, remaining, lo, hi)

    return step
