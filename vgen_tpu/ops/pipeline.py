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


def _h160_words_33(x, y):
    """hash160 of the compressed pubkey as 5 BE u32 word rows (word path)."""
    parity = 2 + (y[0] & jnp.uint32(1))
    return encode.hash160_33_words_from_x(x, parity)


def symbols_p2pkh(x, y, b58_basis=None, unroll=False):
    if unroll:
        return encode.base58check_symbols_words(
            0, _h160_words_33(x, y), b58_basis
        )
    h160 = encode.hash160_33(compressed_pubkey_bytes(x, y), unroll=unroll)
    return encode.base58check_symbols(
        _base58_payload(0, h160), b58_basis, unroll=unroll
    )


def symbols_p2pkh_uncompressed(x, y, b58_basis=None, unroll=False):
    if unroll:
        return encode.base58check_symbols_words(
            0, encode.hash160_65_words_from_xy(x, y), b58_basis
        )
    h160 = encode.hash160_65(uncompressed_pubkey_bytes(x, y), unroll=unroll)
    return encode.base58check_symbols(
        _base58_payload(0, h160), b58_basis, unroll=unroll
    )


def symbols_p2wpkh(x, y, b58_basis=None, unroll=False):
    if unroll:
        h160 = encode.words_to_bytes_be(_h160_words_33(x, y))
    else:
        h160 = encode.hash160_33(compressed_pubkey_bytes(x, y), unroll=unroll)
    return encode.segwit_symbols(h160, 0)


def symbols_p2sh_p2wpkh(x, y, b58_basis=None, unroll=False):
    if unroll:
        return encode.base58check_symbols_words(
            5, encode.script_hash_words(_h160_words_33(x, y)), b58_basis
        )
    h160 = encode.hash160_33(compressed_pubkey_bytes(x, y), unroll=unroll)
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
        _base58_payload(5, encode.hash160_22(script, unroll=unroll)),
        b58_basis, unroll=unroll,
    )


def symbols_ethereum(x, y, unroll=False):
    if unroll:
        acct = encode.words_to_bytes_be(
            keccak.eth_account_words_from_xy(x, y, unroll=True)
        )
        return encode.eth_symbols(acct, unroll=True)
    pub64 = jnp.concatenate([u256.to_bytes_be(x), u256.to_bytes_be(y)], axis=0)
    digest = keccak.keccak256_bytes(pub64, 64, unroll=unroll)
    return encode.eth_symbols(digest[12:], unroll=unroll)


_TAPTWEAK_MIDSTATE = sha256.tagged_midstate("TapTweak")


def p2tr_output_key(x, y, window_table, unroll: bool = False):
    """Taproot output key: even-Y normalize, TapTweak on-chip, Q = P + t*G.

    The reference computes the tweak per candidate on the CPU
    (gpu.rs:1282-1291); here the windowed ladder keeps it on-chip.
    Returns (qx (16,*B) limbs, ok mask)."""
    # Q = P_internal + t*G.  On accelerators (unroll=True) the whole
    # pipeline (even-Y normalize, tagged hash, ladder) runs in a
    # VMEM-resident Pallas kernel with Jacobian accumulation + ONE batch
    # normalization -- the XLA while-loop ladder was copy/spill-bound
    # (~70% of its time moving the accumulator state, device profile r2).
    # The fori_loop affine ladder keeps XLA:CPU compiles small for
    # tests/fallback.
    if unroll:
        from vgen_tpu.ops import pallas_fused

        return pallas_fused.p2tr_output_key_pallas(x, y, window_table)
    B = x.shape[1:]
    y_even = u256.select(y[0] & jnp.uint32(1) == 0, y, field.neg(y))
    xb = u256.to_bytes_be(x)
    t_bytes = sha256.tagged_hash_32(_TAPTWEAK_MIDSTATE, xb, unroll=unroll)
    t_limbs = u256.from_bytes_be(t_bytes)
    # BIP341: t must be < n (negligible failure probability, still masked)
    n_limbs = u256.constant(field.N_INT, B)
    t_ok = ~u256.geq(t_limbs, n_limbs)
    qx, _, q_ok = curve.scalar_mul_add_windowed_affine(
        t_limbs, window_table, x, y_even, 8
    )
    return qx, t_ok & q_ok


def symbols_p2tr(x, y, window_table, valid, unroll: bool = False):
    """P2TR bech32m symbols.  Returns (syms, length, valid&tweak_valid)."""
    qx, ok = p2tr_output_key(x, y, window_table, unroll=unroll)
    syms, length = encode.segwit_symbols(u256.to_bytes_be(qx), 1)
    return syms, length, valid & ok


class StepResult(NamedTuple):
    count: jnp.ndarray  # () int32 -- number of matches in batch
    indices: jnp.ndarray  # (TOP_K,) int32 -- match indices, -1 padded
    ops: jnp.ndarray  # () int32 -- valid keys scanned
    vbits: jnp.ndarray  # (TOP_K,) int32 -- per-index GLV variant bitmask
    # (bit 2v+pi, see glv_interval_mask); 1 on non-GLV paths, 0 padded


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


def glv_variant_symbols(fmt: AddressFormat, xv, yv, pi: int,
                        b58_basis=None, unroll: bool = False):
    """Address symbols for one GLV variant point: x-coordinate xv with
    compressed-pubkey parity index pi (prefix byte 2+pi); yv is the ±y
    coordinate (consulted by Ethereum only, which hashes full coords).

    The variant↔(xv, pi) assignment is LOAD-BEARING: the GLV kernels report
    a per-index bitmask with bit 2v+pi set for variant (xv=β^v·x, parity
    pi), and the host derives ONLY the candidates
    crypto.secp256k1.glv_bit_variant_keys maps from those bits.  The
    pairing is pinned by tests/test_glv_bits.py and
    scripts/validate_fused.py (vbits_ok) -- do not reorder one side
    without the other."""
    if fmt == AddressFormat.ETHEREUM:
        if unroll:
            acct = encode.words_to_bytes_be(
                keccak.eth_account_words_from_xy(xv, yv, unroll=True)
            )
            return encode.eth_symbols(acct, unroll=True)
        pub64 = jnp.concatenate(
            [u256.to_bytes_be(xv), u256.to_bytes_be(yv)], axis=0
        )
        digest = keccak.keccak256_bytes(pub64, 64)
        return encode.eth_symbols(digest[12:])
    if fmt == AddressFormat.P2PKH_UNCOMPRESSED:
        # full-coordinate hash: yv is the exact ±y (GLV_EXACT_Y), pi only
        # selects which sign the caller passed
        if unroll:
            return encode.base58check_symbols_words(
                0, encode.hash160_65_words_from_xy(xv, yv), b58_basis
            )
        h160 = encode.hash160_65(uncompressed_pubkey_bytes(xv, yv))
        return encode.base58check_symbols(_base58_payload(0, h160), b58_basis)
    if unroll:
        h160w = encode.hash160_33_words_from_x(xv, 2 + pi)
        if fmt == AddressFormat.P2PKH:
            return encode.base58check_symbols_words(0, h160w, b58_basis)
        if fmt == AddressFormat.P2WPKH:
            return encode.segwit_symbols(encode.words_to_bytes_be(h160w), 0)
        if fmt == AddressFormat.P2SH_P2WPKH:
            return encode.base58check_symbols_words(
                5, encode.script_hash_words(h160w), b58_basis
            )
        raise ValueError(fmt)
    xb = u256.to_bytes_be(xv)
    prefix = jnp.full((1,) + xb.shape[1:], 2 + pi, dtype=U32)
    h160 = encode.hash160_33(jnp.concatenate([prefix, xb], axis=0))
    if fmt == AddressFormat.P2PKH:
        return encode.base58check_symbols(_base58_payload(0, h160), b58_basis)
    if fmt == AddressFormat.P2WPKH:
        return encode.segwit_symbols(h160, 0)
    if fmt == AddressFormat.P2SH_P2WPKH:
        return encode.base58check_symbols(
            _base58_payload(5, script_hash(h160)), b58_basis
        )
    raise ValueError(fmt)


def xla_tail_unroll() -> bool:
    """Whether jitted XLA tails should use the unrolled (word-path) hash
    forms: yes on accelerators; no on XLA:CPU, whose -O0 builds evaluate a
    64-round unrolled DAG as an expression tree (minutes per compile)."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def make_format_mask(fmt: AddressFormat, unroll: bool = False,
                     glv: bool = False):
    """Hash+encode+match mask stage: (x3, y3, valid, dfa_flat, dfa_accept,
    start, remaining, *extras) -> (matchbits (B,) int32, valid (B,) bool).

    ``matchbits`` already includes the validity/remaining mask: 0 = miss;
    on GLV paths the 6-bit variant mask (glv_interval_mask bit layout),
    1 otherwise.  ``valid`` is the ops-counting mask (pre-P2TR-tweak
    refinement, matching how the scan loop reports operations)."""
    width = FORMAT_DFA_WIDTH[fmt]

    def mask(x3, y3, valid, dfa_flat, dfa_accept, start, remaining, *extras):
        B = x3.shape[1]
        idx = jnp.arange(B, dtype=jnp.int32)
        valid = valid & (idx < remaining)

        if glv:
            assert fmt in GLV_FORMATS, fmt
            from vgen_tpu.crypto import secp256k1 as ec

            beta = u256.constant(ec.BETA, x3.shape[1:])
            beta2 = u256.constant(ec.BETA2, x3.shape[1:])
            ys = (
                (y3, field.neg(y3))
                if fmt in GLV_EXACT_Y else (None, None)
            )
            bits = jnp.zeros(B, dtype=jnp.int32)
            for v, xv in enumerate(
                (x3, field.mul(x3, beta), field.mul(x3, beta2))
            ):
                for pi in range(2):
                    syms, length = glv_variant_symbols(
                        fmt, xv, ys[pi], pi, unroll=unroll
                    )
                    m = match_symbols(
                        dfa_flat, dfa_accept, start, width, syms, length
                    )
                    bits = bits | jnp.where(
                        m.astype(bool), jnp.int32(1 << (2 * v + pi)), 0
                    )
            return jnp.where(valid, bits, 0), valid

        if fmt == AddressFormat.P2TR:
            syms, length, mvalid = symbols_p2tr(x3, y3, extras[0], valid,
                                                unroll=unroll)
        else:
            mvalid = valid
            if fmt == AddressFormat.P2PKH:
                syms, length = symbols_p2pkh(x3, y3, unroll=unroll)
            elif fmt == AddressFormat.P2PKH_UNCOMPRESSED:
                syms, length = symbols_p2pkh_uncompressed(x3, y3,
                                                          unroll=unroll)
            elif fmt == AddressFormat.P2WPKH:
                syms, length = symbols_p2wpkh(x3, y3, unroll=unroll)
            elif fmt == AddressFormat.P2SH_P2WPKH:
                syms, length = symbols_p2sh_p2wpkh(x3, y3, unroll=unroll)
            elif fmt == AddressFormat.ETHEREUM:
                syms, length = symbols_ethereum(x3, y3, unroll=unroll)
            else:  # pragma: no cover
                raise AssertionError(fmt)

        matched = match_symbols(dfa_flat, dfa_accept, start, width, syms,
                                length)
        return (
            jnp.where(matched.astype(bool) & mvalid, jnp.int32(1), 0),
            mvalid,
        )

    return mask


_TOPK_BLOCK = 512


def top_k_match_indices(scores):
    """Exact top-TOP_K of a (B,) int32 score vector (score = index for
    matches, -1 for misses) via a two-stage reduction.

    lax.top_k over the full 512K batch measured 7.4 ms of a ~50 ms scan
    step (round-4 step-split profile).  Stage 1 takes a per-block max
    (one full-width VPU pass) and top-Ks the B/512 block maxima; stage 2
    top-Ks the 16 selected blocks' 8192 raw scores.  Exactness: scores
    are distinct indices or -1, so every block holding one of the global
    top-K has block-max >= the K-th largest score and outranks every
    non-holding block; there are at most K such blocks, so the K selected
    blocks cover the global top-K."""
    B = scores.shape[0]
    if B % _TOPK_BLOCK or B < 2 * _TOPK_BLOCK * TOP_K:
        top, _ = jax.lax.top_k(scores, TOP_K)
        return top
    s2 = scores.reshape(B // _TOPK_BLOCK, _TOPK_BLOCK)
    bmax = jnp.max(s2, axis=1)
    _, bidx = jax.lax.top_k(bmax, TOP_K)
    seg = s2[bidx].reshape(-1)
    top, _ = jax.lax.top_k(seg, TOP_K)
    return top


def mask_to_result(matchbits, valid, ops_mult: int = 1) -> "StepResult":
    """(matchbits, valid) -> packed StepResult (count, top-K, ops, vbits).

    matchbits (B,) int32: 0 = miss; nonzero = match.  On GLV paths the
    value is the 6-bit variant mask (glv_interval_mask bit layout), shipped
    per top-K index so the host derives only the variants that actually
    matched instead of all 6."""
    B = matchbits.shape[0]
    idx = jnp.arange(B, dtype=jnp.int32)
    matched = matchbits > 0
    count = jnp.sum(matched.astype(jnp.int32))
    scores = jnp.where(matched, idx, jnp.int32(-1))
    top = top_k_match_indices(scores)
    vbits = jnp.where(top >= 0, matchbits[jnp.maximum(top, 0)], 0)
    ops = jnp.sum(valid.astype(jnp.int32)) * jnp.int32(ops_mult)
    return StepResult(count=count, indices=top, ops=ops, vbits=vbits)


def make_format_tail(fmt: AddressFormat, unroll: bool = False,
                     glv: bool = False):
    """Hash+encode+match stage: (x3, y3, valid, dfa_flat, dfa_accept, start,
    remaining, *extras) -> StepResult.  start/remaining are traced scalars.

    glv=True: DFA-matches all 6 GLV endomorphism variants {±k, ±λk, ±λ²k}
    of each window key (6 keys per EC add -- the same amortization the
    interval path uses, extended to arbitrary regex patterns)."""
    mask = make_format_mask(fmt, unroll, glv)

    def tail(x3, y3, valid, dfa_flat, dfa_accept, start, remaining, *extras):
        matched, mvalid = mask(x3, y3, valid, dfa_flat, dfa_accept, start,
                               remaining, *extras)
        # GLV ops count uses the pre-refinement valid mask (6 keys per add);
        # the non-GLV P2TR path reports post-tweak-validity ops
        return mask_to_result(matched, mvalid, 6 if glv else 1)

    return tail


@functools.lru_cache(maxsize=16)
def jitted_format_tail(fmt: AddressFormat, unroll: bool = False,
                       glv: bool = False):
    return jax.jit(make_format_tail(fmt, unroll, glv))


def run_scan_step(fmt, bx, by, tx, ty, dfa_flat, dfa_accept, start, remaining,
                  extras=(), chain_len: int = 256, glv: bool = False):
    """Convenience wrapper: shared points stage + per-format tail."""
    x3, y3, valid = jitted_points_step(chain_len)(bx, by, tx, ty)
    return jitted_format_tail(fmt, xla_tail_unroll(), glv)(
        x3, y3, valid, dfa_flat, dfa_accept, jnp.int32(start),
        jnp.int32(remaining), *extras
    )


# packed per-window result row: [count, ops, idx0..15, vbits0..15]
PACKED_WIDTH = 2 + 2 * TOP_K


@functools.lru_cache(maxsize=4)
def _jitted_pack():
    return jax.jit(
        lambda count, ops, idx, vbits: jnp.concatenate(
            [count[None], ops[None], idx, vbits]
        )
    )


def pack_result(res: StepResult):
    """[count, ops, idx0..15, vbits0..15] as one device array (single host
    transfer)."""
    return _jitted_pack()(res.count, res.ops, res.indices, res.vbits)


# ---------------------------------------------------------------------------
# Interval (anchored-prefix) matching: the pattern/intervals.py fast path.
# Shared jnp helpers -- the same code traces in the XLA tail here (any
# backend, multi-chip shard_map) and inside the Pallas kernels
# (ops/pallas_fused.py).  Matching compares the format's device-checked
# value (hash160 / account bytes / taproot output key) against precompiled
# inclusive [lo, hi] word intervals instead of encode+DFA.
# ---------------------------------------------------------------------------

MAX_INTERVALS = 8  # comparator slots (pattern.intervals.MAX_INTERVALS)

# big-endian u32 words of the compared value, per format
INTERVAL_WORDS = {
    AddressFormat.P2PKH: 5,
    AddressFormat.P2PKH_UNCOMPRESSED: 5,
    AddressFormat.P2SH_P2WPKH: 5,
    AddressFormat.P2WPKH: 5,
    AddressFormat.P2TR: 8,
    AddressFormat.ETHEREUM: 5,
}

# formats where the GLV endomorphism checks 6 keys {±k, ±λk, ±λ²k} per EC
# add (random scans only; see crypto/secp256k1.glv_variant_keys).  P2TR is
# excluded: the TapTweak scalar-mult dominates and is per-variant.
GLV_FORMATS = (
    AddressFormat.P2PKH,
    AddressFormat.P2PKH_UNCOMPRESSED,
    AddressFormat.P2WPKH,
    AddressFormat.P2SH_P2WPKH,
    AddressFormat.ETHEREUM,
)

# GLV formats whose hashed value covers the full (x, y) point, so the ±
# variant pair maps to exact {+y, -y} coordinates instead of the two
# compressed-pubkey parity prefixes.  The device kernels run the full EC
# finish (y needed) and the host resolves variant bits with
# crypto.secp256k1.glv_bit_variant_keys(parity_exact=True): bit 2v+pi is
# exactly key λ^v·k (pi=0, y=+y) or N−λ^v·k (pi=1, y=−y).
GLV_EXACT_Y = (
    AddressFormat.P2PKH_UNCOMPRESSED,
    AddressFormat.ETHEREUM,
)


def intervals_to_words(ivs, n_words: int = 5, n_slots: int = MAX_INTERVALS):
    """Host: [(lo, hi)] ints -> (lo, hi) uint32 arrays (n_slots, n_words),
    big-endian words, padded with empty (lo=1 > hi=0) intervals."""
    lo = np.zeros((n_slots, n_words), dtype=np.uint32)
    hi = np.zeros((n_slots, n_words), dtype=np.uint32)
    lo[:, n_words - 1] = 1  # empty padding: lo > hi never matches
    for j, (l, h) in enumerate(ivs):
        for w in range(n_words):
            sh = 32 * (n_words - 1 - w)
            lo[j, w] = (l >> sh) & 0xFFFFFFFF
            hi[j, w] = (h >> sh) & 0xFFFFFFFF
    return lo, hi


def bytes_be_words(h):
    """(4*W, T) big-endian value bytes -> list of W (T,) u32 word rows."""
    n = h.shape[0] // 4
    return [
        (h[4 * i] << 24) | (h[4 * i + 1] << 16)
        | (h[4 * i + 2] << 8) | h[4 * i + 3]
        for i in range(n)
    ]


def script_hash(h160, unroll: bool = False):
    """hash160(OP_0 OP_PUSH20 <h160>) -- the P2SH-P2WPKH redeem script."""
    B = h160.shape[1:]
    script = jnp.concatenate(
        [
            jnp.zeros((1,) + B, dtype=jnp.uint32),
            jnp.full((1,) + B, 0x14, dtype=jnp.uint32),
            h160,
        ],
        axis=0,
    )
    return encode.hash160_22(script, unroll=unroll)


def eth_account(x3, y3, unroll: bool = False):
    """(20, T) Ethereum account bytes = keccak256(x||y)[12:].

    unroll=True statically unrolls the keccak rounds (required inside
    Pallas kernels; see ops/keccak.keccak_f1600)."""
    pub64 = jnp.concatenate(
        [u256.to_bytes_be(x3), u256.to_bytes_be(y3)], axis=0
    )
    return keccak.keccak256_bytes(pub64, 64, unroll=unroll)[12:32]


def interval_value_words(fmt: AddressFormat, x3, y3, *extras,
                         unroll: bool = False):
    """Format's device-checked value as big-endian u32 word rows (+ok mask
    refinement for P2TR)."""
    ok = None
    if fmt in (AddressFormat.P2PKH, AddressFormat.P2WPKH):
        if unroll:
            parity = 2 + (y3[0] & jnp.uint32(1))
            return encode.hash160_33_words_from_x(x3, parity), None
        h = encode.hash160_33(compressed_pubkey_bytes(x3, y3), unroll=unroll)
    elif fmt == AddressFormat.P2PKH_UNCOMPRESSED:
        if unroll:
            return encode.hash160_65_words_from_xy(x3, y3), None
        h = encode.hash160_65(uncompressed_pubkey_bytes(x3, y3), unroll=unroll)
    elif fmt == AddressFormat.P2SH_P2WPKH:
        if unroll:
            parity = 2 + (y3[0] & jnp.uint32(1))
            return encode.script_hash_words(
                encode.hash160_33_words_from_x(x3, parity)
            ), None
        h = script_hash(
            encode.hash160_33(compressed_pubkey_bytes(x3, y3), unroll=unroll),
            unroll=unroll,
        )
    elif fmt == AddressFormat.ETHEREUM:
        if unroll:
            return keccak.eth_account_words_from_xy(x3, y3, unroll=True), None
        h = eth_account(x3, y3, unroll=unroll)
    elif fmt == AddressFormat.P2TR:
        qx, ok = p2tr_output_key(x3, y3, extras[0], unroll=unroll)
        h = u256.to_bytes_be(qx)
    else:  # pragma: no cover
        raise ValueError(f"interval path does not support {fmt}")
    return bytes_be_words(h), ok


def interval_slot_count(n_ivs: int) -> int:
    """Slots to compile for n_ivs intervals: next power of two (compile-cache
    friendly), capped at MAX_INTERVALS.  Most anchored prefixes need 1-2
    slots; always comparing all 8 wastes ~5% of the GLV kernel."""
    return min(MAX_INTERVALS, max(1, 1 << (n_ivs - 1).bit_length()))


def in_intervals(words, lo, hi):
    """Lexicographic lo <= words <= hi over the (static) slot dimension.

    words: list of W (T,) uint32 rows; lo/hi: (n_slots, W) uint32 bound
    tables (jnp arrays or Pallas SMEM refs -- both index the same)."""
    n = len(words)
    matched = None
    for j in range(lo.shape[0]):
        ge = words[n - 1] >= lo[j, n - 1]
        le = words[n - 1] <= hi[j, n - 1]
        for w in range(n - 2, -1, -1):
            lw = lo[j, w]
            hw = hi[j, w]
            ge = (words[w] > lw) | ((words[w] == lw) & ge)
            le = (words[w] < hw) | ((words[w] == hw) & le)
        hit = ge & le
        matched = hit if matched is None else (matched | hit)
    return matched


def glv_interval_mask(fmt: AddressFormat, x3, y3, lo, hi,
                      unroll: bool = False):
    """6-bit GLV variant mask per key: bit 2v+s set iff variant s*λ^v
    (s: 0=+, 1=-) of the key's point matches the intervals.

    The 6 points are {x, βx, β²x} × {±y}.  For compressed-hash160 formats
    the ± pair is exactly the two compressed-prefix parities, so y3 is never
    consulted (pass None); GLV_EXACT_Y formats (Ethereum, uncompressed
    p2pkh) hash full coordinates so y3 is required."""
    from vgen_tpu.crypto import secp256k1 as ec

    beta = u256.constant(ec.BETA, x3.shape[1:])
    beta2 = u256.constant(ec.BETA2, x3.shape[1:])
    ys = (y3, field.neg(y3)) if fmt in GLV_EXACT_Y else None
    mask = jnp.zeros(x3.shape[1:], dtype=jnp.int32)
    for v, xv in enumerate((x3, field.mul(x3, beta), field.mul(x3, beta2))):
        xb = None if unroll else u256.to_bytes_be(xv)
        for pi in range(2):
            if fmt == AddressFormat.ETHEREUM:
                if unroll:
                    words = keccak.eth_account_words_from_xy(
                        xv, ys[pi], unroll=True
                    )
                    m = in_intervals(words, lo, hi)
                    mask = mask | jnp.where(
                        m, jnp.int32(1 << (2 * v + pi)), 0
                    )
                    continue
                h = eth_account(xv, ys[pi], unroll=unroll)
            elif fmt == AddressFormat.P2PKH_UNCOMPRESSED:
                if unroll:
                    words = encode.hash160_65_words_from_xy(xv, ys[pi])
                    m = in_intervals(words, lo, hi)
                    mask = mask | jnp.where(
                        m, jnp.int32(1 << (2 * v + pi)), 0
                    )
                    continue
                h = encode.hash160_65(
                    uncompressed_pubkey_bytes(xv, ys[pi]), unroll=unroll
                )
            elif unroll:
                # word path: int parity folds into the schedule constant
                words = encode.hash160_33_words_from_x(xv, 2 + pi)
                if fmt == AddressFormat.P2SH_P2WPKH:
                    words = encode.script_hash_words(words)
                m = in_intervals(words, lo, hi)
                mask = mask | jnp.where(m, jnp.int32(1 << (2 * v + pi)), 0)
                continue
            else:
                prefix = jnp.full(
                    (1,) + xb.shape[1:], 2 + pi, dtype=jnp.uint32
                )
                h = encode.hash160_33(
                    jnp.concatenate([prefix, xb], axis=0), unroll=unroll
                )
                if fmt == AddressFormat.P2SH_P2WPKH:
                    h = script_hash(h, unroll=unroll)
            m = in_intervals(bytes_be_words(h), lo, hi)
            mask = mask | jnp.where(m, jnp.int32(1 << (2 * v + pi)), 0)
    return mask


def make_range_mask(fmt: AddressFormat, glv: bool = False,
                    unroll: bool = False):
    """Interval-matching mask stage: (x3, y3, valid, lo, hi, remaining,
    *extras) -> (matchbits (B,) int32, valid (B,) bool).  matchbits: 0 =
    miss; the 6-bit GLV variant mask on GLV paths, 1 otherwise."""

    def mask(x3, y3, valid, lo, hi, remaining, *extras):
        B = x3.shape[1]
        idx = jnp.arange(B, dtype=jnp.int32)
        valid = valid & (idx < remaining)
        if glv:
            assert fmt in GLV_FORMATS, fmt
            vmask = glv_interval_mask(fmt, x3, y3, lo, hi, unroll=unroll)
            return jnp.where(valid, vmask, 0), valid
        words, ok = interval_value_words(fmt, x3, y3, *extras, unroll=unroll)
        if ok is not None:
            valid = valid & ok
        matched = in_intervals(words, lo, hi) & valid
        return jnp.where(matched, jnp.int32(1), 0), valid

    return mask


def make_range_tail(fmt: AddressFormat, glv: bool = False,
                    unroll: bool = False):
    """Interval-matching tail: (x3, y3, valid, lo, hi, remaining, *extras)
    -> StepResult.  The XLA counterpart of the fused Pallas range kernel --
    used on non-TPU backends and under shard_map on device meshes
    (unroll=True selects the word-path hashes there)."""
    mask = make_range_mask(fmt, glv, unroll)

    def tail(x3, y3, valid, lo, hi, remaining, *extras):
        matched, mvalid = mask(x3, y3, valid, lo, hi, remaining, *extras)
        return mask_to_result(matched, mvalid, 6 if glv else 1)

    return tail


@functools.lru_cache(maxsize=16)
def jitted_range_tail(fmt: AddressFormat, glv: bool = False,
                      unroll: bool = False):
    return jax.jit(make_range_tail(fmt, glv, unroll))


def run_range_scan_step(fmt, bx, by, tx, ty, lo, hi, remaining,
                        extras=(), chain_len: int = 256, glv: bool = False):
    """Convenience wrapper: shared points stage + interval tail."""
    x3, y3, valid = jitted_points_step(chain_len)(bx, by, tx, ty)
    return jitted_range_tail(fmt, glv, xla_tail_unroll())(
        x3, y3, valid, jnp.asarray(lo), jnp.asarray(hi),
        jnp.int32(remaining), *extras
    )


@functools.lru_cache(maxsize=16)
def packed_xla_scan_step(fmt: AddressFormat, kind: str, glv: bool,
                         chain_len: int, k_sub: int, unroll: bool,
                         n_extras: int = 0):
    """k_sub-window packed scan step for formats WITHOUT a fused Pallas
    kernel (P2TR's windowed TapTweak ladder lives in the XLA tail): scans
    k_sub consecutive key windows per dispatch and returns one packed
    (k_sub, PACKED_WIDTH) result, amortizing the host<->device round trip
    exactly like ops/pallas_fused.fused_scan_step does for the fused
    formats.

    kind: "range" (margs = (lo, hi)) or "dfa" (margs = (dfa_flat,
    dfa_accept, start)).  Signature: step(bx (K,16), by (K,16), tx, ty,
    remaining (K,), *margs, *extras) -> (K, PACKED_WIDTH) int32."""
    tail = (
        make_range_tail(fmt, glv, unroll) if kind == "range"
        else make_format_tail(fmt, unroll, glv)
    )
    n_margs = 2 if kind == "range" else 3

    def step(bx, by, tx, ty, remaining, *args):
        margs = args[:n_margs]
        extras = args[n_margs:]

        def one(bxk, byk, remk):
            x3, y3, valid = curve.batch_affine_add(
                bxk, byk, tx, ty, chain_len=chain_len
            )
            res = tail(x3, y3, valid, *margs, remk, *extras)
            return jnp.concatenate(
                [res.count[None], res.ops[None], res.indices, res.vbits]
            )

        if k_sub == 1:
            return one(bx[0], by[0], remaining[0])[None]

        def body(_, xs):
            bxk, byk, remk = xs
            return None, one(bxk, byk, remk)

        _, outs = jax.lax.scan(body, None, (bx, by, remaining))
        return outs

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Full-mask recovery: when a window matches more than TOP_K keys, the packed
# result's index slots truncate (the count does not).  The scanners re-run
# the window through these mask steps and pull the complete (B,) match
# vector to the host -- a rare extra dispatch + ~2 MB transfer instead of
# silently dropping matches (the reference reports every match per batch,
# gpu.rs:1030-1093).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _jitted_format_mask(fmt: AddressFormat, unroll: bool = False,
                        glv: bool = False):
    mask = make_format_mask(fmt, unroll, glv)
    return jax.jit(
        lambda *a: mask(*a)[0].astype(jnp.int32)
    )


@functools.lru_cache(maxsize=16)
def _jitted_range_mask(fmt: AddressFormat, glv: bool = False,
                       unroll: bool = False):
    mask = make_range_mask(fmt, glv, unroll)
    return jax.jit(
        lambda *a: mask(*a)[0].astype(jnp.int32)
    )


def run_scan_mask(fmt, bx, by, tx, ty, dfa_flat, dfa_accept, start,
                  remaining, extras=(), chain_len: int = 256,
                  glv: bool = False):
    """Full (B,) int32 match mask for one window (DFA path)."""
    x3, y3, valid = jitted_points_step(chain_len)(bx, by, tx, ty)
    return _jitted_format_mask(fmt, xla_tail_unroll(), glv)(
        x3, y3, valid, dfa_flat, dfa_accept, jnp.int32(start),
        jnp.int32(remaining), *extras
    )


def run_range_scan_mask(fmt, bx, by, tx, ty, lo, hi, remaining,
                        extras=(), chain_len: int = 256, glv: bool = False):
    """Full (B,) int32 match mask for one window (interval path)."""
    x3, y3, valid = jitted_points_step(chain_len)(bx, by, tx, ty)
    return _jitted_range_mask(fmt, glv, xla_tail_unroll())(
        x3, y3, valid, jnp.asarray(lo), jnp.asarray(hi),
        jnp.int32(remaining), *extras
    )
