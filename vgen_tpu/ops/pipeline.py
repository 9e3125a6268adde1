"""Fused per-format scan pipelines: EC point -> hash -> encode -> DFA match.

This is the device-side replacement for the reference's per-batch host loop
(gpu.rs:1030-1093: readback 512K hash160s, rayon-encode, regex-match).  Here
a single jitted step turns a batch of table points + one base point into a
match count and top-K matching indices; the host only ever sees those.

Formats (parity: reference AddressFormat, address.rs:11-24):
  p2pkh / p2pkh-uncompressed / p2sh-p2wpkh  -> Base58Check digit symbols
  p2wpkh / p2tr                             -> bech32(m) digit symbols
  ethereum                                  -> EIP-55 cased-hex symbols
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.ops import curve, encode, field, keccak, sha256, u256

U32 = jnp.uint32
TOP_K = 16  # fixed result slots per batch (SURVEY.md §7 hard part (d))


def match_symbols(dfa_flat, dfa_accept, start: int, width: int, syms, length):
    """Run the projected DFA over (T,*B) symbols with EOS/PAD overlay.

    dfa_flat: (S*width,) int32 flattened transition table.
    width = n_digits + 2; EOS = width-2, PAD = width-1.

    TPU-native formulation: the naive per-char `table[state*W + sym]` gather
    serializes on the gather unit (~7 cycles/element: measured 72ms/batch =
    the whole pipeline's bottleneck) and compiles terribly.  Instead the
    state is carried as a one-hot (S, B) f32 matrix and each step is
        R = T_f32 @ sym_onehot        (S,W)@(W,B) -- MXU
        next_id = sum_s state1h * R   (VPU reduce)
        state1h' = onehot(next_id)    (VPU compare)
    All quantities are small ints, exact in f32.  ~2 Gflop/char rides the
    MXU at full batch width instead of 262K serialized lookups.
    """
    T = syms.shape[0]
    B = syms.shape[1]
    S = dfa_flat.shape[0] // width
    # TPU f32 dots are single-pass bf16: state ids stay exact only up to 256,
    # so larger automata use two byte-plane dots (see u256.mul_wide)
    table_i = dfa_flat.reshape(S, width)
    table = table_i.astype(jnp.float32)
    table_hi = (table_i // 256).astype(jnp.float32) if S > 256 else None
    table_lo = (table_i % 256).astype(jnp.float32) if S > 256 else None
    eos = jnp.int32(width - 2)
    pad = jnp.int32(width - 1)
    wids = jnp.arange(width, dtype=jnp.int32)[:, None]  # (W, 1)
    sids = jnp.arange(S, dtype=jnp.int32)[:, None]  # (S, 1)

    state1h0 = (sids == start).astype(jnp.float32)  # (S, 1)
    state1h0 = jnp.broadcast_to(state1h0, (S, B))

    def body(j, state1h):
        row = jax.lax.dynamic_index_in_dim(
            syms, jnp.minimum(j, T - 1), 0, keepdims=False
        )
        sym = jnp.where(j < length, row, jnp.where(j == length, eos, pad))
        sym1h = (wids == sym[None, :]).astype(jnp.float32)  # (W, B)
        if S > 256:
            R = jax.lax.dot(
                table_lo, sym1h, preferred_element_type=jnp.float32
            ) + 256.0 * jax.lax.dot(
                table_hi, sym1h, preferred_element_type=jnp.float32
            )
        else:
            R = jax.lax.dot(
                table, sym1h, preferred_element_type=jnp.float32,
            )  # (S, B): R[s, b] = T[s, sym_b]
        next_id = jnp.sum(state1h * R, axis=0)  # (B,) exact small ints
        return (sids.astype(jnp.float32) == next_id[None, :]).astype(
            jnp.float32
        )

    state1h = jax.lax.fori_loop(0, T + 1, body, state1h0)
    acc = jnp.sum(state1h * dfa_accept.astype(jnp.float32)[:, None], axis=0)
    return acc > 0.5


def match_symbols_gather(dfa_flat, dfa_accept, start: int, width: int, syms,
                         length):
    """Reference gather-based DFA runner (slow on TPU; kept for testing)."""
    T = syms.shape[0]
    B = syms.shape[1:]
    eos = jnp.int32(width - 2)
    pad = jnp.int32(width - 1)

    def body(j, state):
        row = jax.lax.dynamic_index_in_dim(
            syms, jnp.minimum(j, T - 1), 0, keepdims=False
        )
        sym = jnp.where(j < length, row, jnp.where(j == length, eos, pad))
        return dfa_flat[state * width + sym]

    state0 = jnp.full(B, start, dtype=jnp.int32)
    state = jax.lax.fori_loop(0, T + 1, body, state0)
    return dfa_accept[state]


def compressed_pubkey_bytes(x, y):
    """(16,*B) affine coords -> (33,*B) SEC1 compressed serialization."""
    parity = y[0] & jnp.uint32(1)
    prefix = (jnp.uint32(2) + parity)[None]
    return jnp.concatenate([prefix, u256.to_bytes_be(x)], axis=0)


def uncompressed_pubkey_bytes(x, y):
    """(16,*B) affine coords -> (65,*B) SEC1 uncompressed serialization."""
    four = jnp.full((1,) + x.shape[1:], 4, dtype=U32)
    return jnp.concatenate(
        [four, u256.to_bytes_be(x), u256.to_bytes_be(y)], axis=0
    )


def _base58_payload(version: int, h160):
    v = jnp.full((1,) + h160.shape[1:], version, dtype=U32)
    return jnp.concatenate([v, h160], axis=0)


def symbols_p2pkh(x, y, b58_basis=None):
    h160 = encode.hash160_33(compressed_pubkey_bytes(x, y))
    return encode.base58check_symbols(_base58_payload(0, h160), b58_basis)


def symbols_p2pkh_uncompressed(x, y, b58_basis=None):
    h160 = encode.hash160_65(uncompressed_pubkey_bytes(x, y))
    return encode.base58check_symbols(_base58_payload(0, h160), b58_basis)


def symbols_p2wpkh(x, y, b58_basis=None):
    h160 = encode.hash160_33(compressed_pubkey_bytes(x, y))
    return encode.segwit_symbols(h160, 0)


def symbols_p2sh_p2wpkh(x, y, b58_basis=None):
    h160 = encode.hash160_33(compressed_pubkey_bytes(x, y))
    B = h160.shape[1:]
    script = jnp.concatenate(
        [
            jnp.zeros((1,) + B, dtype=U32),
            jnp.full((1,) + B, 0x14, dtype=U32),
            h160,
        ],
        axis=0,
    )
    return encode.base58check_symbols(
        _base58_payload(5, encode.hash160_22(script)), b58_basis
    )


def symbols_ethereum(x, y):
    pub64 = jnp.concatenate([u256.to_bytes_be(x), u256.to_bytes_be(y)], axis=0)
    digest = keccak.keccak256_bytes(pub64, 64)
    return encode.eth_symbols(digest[12:])


_TAPTWEAK_MIDSTATE = sha256.tagged_midstate("TapTweak")


def symbols_p2tr(x, y, window_table, valid):
    """P2TR: even-Y normalize, TapTweak on-chip, Q = P_int + t*G, bech32m.

    The reference computes the tweak per candidate on the CPU
    (gpu.rs:1282-1291); here the windowed ladder keeps it on-chip.
    Returns (syms, length, valid&tweak_valid)."""
    B = x.shape[1:]
    y_even = u256.select(y[0] & jnp.uint32(1) == 0, y, field.neg(y))
    xb = u256.to_bytes_be(x)
    t_bytes = sha256.tagged_hash_32(_TAPTWEAK_MIDSTATE, xb)  # (32,*B)
    t_limbs = u256.from_bytes_be(t_bytes)
    # BIP341: t must be < n (negligible failure probability, still masked)
    n_limbs = u256.constant(field.N_INT, B)
    t_ok = ~u256.geq(t_limbs, n_limbs)
    TX, TY, TZ = curve.scalar_mul_windowed(t_limbs, window_table, 8)
    # Q = t*G + P_internal (t*G is never infinity for t != 0)
    QX, QY, QZ = curve.jacobian_add_affine(
        TX, TY, TZ, x, y_even, z1_is_zero=u256.is_zero(TZ)
    )
    q_ok = ~u256.is_zero(QZ)
    # guard Z=0 for batch normalization
    QZ_safe = u256.select(q_ok, QZ, u256.constant(1, B))
    qx, _ = curve.batch_jacobian_to_affine(QX, QY, QZ_safe)
    syms, length = encode.segwit_symbols(u256.to_bytes_be(qx), 1)
    return syms, length, valid & t_ok & q_ok


class StepResult(NamedTuple):
    count: jnp.ndarray  # () int32 -- number of matches in batch
    indices: jnp.ndarray  # (TOP_K,) int32 -- match indices, -1 padded
    ops: jnp.ndarray  # () int32 -- valid keys scanned


# DFA width (n_digits + 2) is a per-format constant; state count is padded to
# a bucket so one compiled step serves every pattern of a format.
FORMAT_DFA_WIDTH = {
    AddressFormat.P2PKH: 60,
    AddressFormat.P2PKH_UNCOMPRESSED: 60,
    AddressFormat.P2SH_P2WPKH: 60,
    AddressFormat.P2WPKH: 34,
    AddressFormat.P2TR: 34,
    AddressFormat.ETHEREUM: 24,
}


def pad_device_dfa(dev, bucket_min: int = 32):
    """Pad a pattern.DeviceDFA to a power-of-two state count.

    Keeps the jitted step's shapes stable across patterns: only the padded
    bucket size changes (rarely), not every new regex."""
    S, W = dev.table.shape
    S2 = max(bucket_min, 1 << (S - 1).bit_length())
    table = np.zeros((S2, W), dtype=np.int32)
    table[:S] = dev.table
    accept = np.zeros((S2,), dtype=np.int32)
    accept[:S] = dev.accept.astype(np.int32)
    return table.reshape(-1), accept


@functools.lru_cache(maxsize=8)
def jitted_points_step(chain_len: int = 256):
    """Shared EC stage: (bx, by, tx, ty) -> (x3, y3, valid).

    Compiled once per (batch, chain) for ALL formats and patterns."""
    return jax.jit(
        lambda bx, by, tx, ty: curve.batch_affine_add(
            bx, by, tx, ty, chain_len=chain_len
        )
    )


def make_format_tail(fmt: AddressFormat):
    """Hash+encode+match stage: (x3, y3, valid, dfa_flat, dfa_accept, start,
    remaining, *extras) -> StepResult.  start/remaining are traced scalars."""
    width = FORMAT_DFA_WIDTH[fmt]

    def tail(x3, y3, valid, dfa_flat, dfa_accept, start, remaining, *extras):
        B = x3.shape[1]
        idx = jnp.arange(B, dtype=jnp.int32)
        valid = valid & (idx < remaining)

        if fmt == AddressFormat.P2TR:
            syms, length, valid = symbols_p2tr(x3, y3, extras[0], valid)
        elif fmt == AddressFormat.P2PKH:
            syms, length = symbols_p2pkh(x3, y3)
        elif fmt == AddressFormat.P2PKH_UNCOMPRESSED:
            syms, length = symbols_p2pkh_uncompressed(x3, y3)
        elif fmt == AddressFormat.P2WPKH:
            syms, length = symbols_p2wpkh(x3, y3)
        elif fmt == AddressFormat.P2SH_P2WPKH:
            syms, length = symbols_p2sh_p2wpkh(x3, y3)
        elif fmt == AddressFormat.ETHEREUM:
            syms, length = symbols_ethereum(x3, y3)
        else:  # pragma: no cover
            raise AssertionError(fmt)

        matched = match_symbols(dfa_flat, dfa_accept, start, width, syms, length)
        matched = matched.astype(bool) & valid

        count = jnp.sum(matched.astype(jnp.int32))
        scores = jnp.where(matched, idx, jnp.int32(-1))
        top, _ = jax.lax.top_k(scores, TOP_K)
        ops = jnp.sum(valid.astype(jnp.int32))
        return StepResult(count=count, indices=top, ops=ops)

    return tail


@functools.lru_cache(maxsize=16)
def jitted_format_tail(fmt: AddressFormat):
    return jax.jit(make_format_tail(fmt))


def run_scan_step(fmt, bx, by, tx, ty, dfa_flat, dfa_accept, start, remaining,
                  extras=(), chain_len: int = 256):
    """Convenience wrapper: shared points stage + per-format tail."""
    x3, y3, valid = jitted_points_step(chain_len)(bx, by, tx, ty)
    return jitted_format_tail(fmt)(
        x3, y3, valid, dfa_flat, dfa_accept, jnp.int32(start),
        jnp.int32(remaining), *extras
    )


@functools.lru_cache(maxsize=4)
def _jitted_pack():
    return jax.jit(
        lambda count, ops, idx: jnp.concatenate(
            [count[None], ops[None], idx]
        )
    )


def pack_result(res: StepResult):
    """[count, ops, idx0..idx15] as one device array (single host transfer)."""
    return _jitted_pack()(res.count, res.ops, res.indices)
