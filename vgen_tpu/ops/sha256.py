"""Batched SHA-256 on TPU (uint32 lanes over the batch dimension).

Device counterpart of the reference's single-block-specialized WGSL SHA-256
(shaders/sha256.wgsl:1-170) plus the TapTweak midstate variant the reference
defined but never ran on-device (sha256.wgsl:177-249).  Message schedules for
our fixed-size inputs (33-byte pubkey, 25-byte address payload, 32-byte
digests) are built with constant padding baked in.

Structure: one round per fori_loop iteration under jit (rotating schedule
buffer, dynamic K lookup), fully unrolled with scalar constants inside
Pallas kernels (unroll=True) where Mosaic rejects captured arrays and the
round chain is register-resident anyway.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
).reshape(4, 16)

IV = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
     0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def compress(state, w, unroll: bool = False):
    """One SHA-256 compression: state (8,*B) or list, w list of 16 (*B,) words.

    unroll=True (Pallas kernels): 64 static rounds with scalar K constants
    -- no captured arrays and no dynamic indexing (Mosaic rejects both).
    unroll=False (jit/XLA, the default): one round per fori_loop iteration
    with a rotating 16-word schedule buffer.  The unrolled form's 64-round
    reconvergent DAG makes some XLA:CPU builds evaluate it as an expression
    TREE (cost grows ~2.4x per round -- minutes per batch); the loop body
    stays under that cliff and the sequential rounds can't be parallelized
    anyway.
    Returns the new (8, *B) state (IV-added)."""
    if unroll:
        return jnp.stack(compress_pe([state[i] for i in range(8)], w))

    kvec = jnp.asarray(_K.reshape(-1))
    st0 = jnp.stack([state[i] for i in range(8)])
    from vgen_tpu.ops import bitops as bo

    w = [bo.materialize(w[i], st0.shape[1:], jnp) for i in range(16)]
    # rotating schedule buffer: at round t, buf[i] = w[t-16+i] (mod history);
    # rounds 0-15 pop buf[0] and push it back unchanged, so at round 16 the
    # buffer again holds w[0..15] and the recurrence
    # w[t] = w[t-16] + s0(w[t-15]) + w[t-7] + s1(w[t-2]) reads static slots
    # buf[0], buf[1], buf[9], buf[14].
    buf0 = jnp.stack([w[i] for i in range(16)])

    def round_body(t, carry):
        stv, buf = carry
        a, b, c, d, e, f, g, h = [stv[i] for i in range(8)]
        s0 = _rotr(buf[1], 7) ^ _rotr(buf[1], 18) ^ (buf[1] >> 3)
        s1 = _rotr(buf[14], 17) ^ _rotr(buf[14], 19) ^ (buf[14] >> 10)
        wnew = buf[0] + s0 + buf[9] + s1
        wt = jnp.where(t < 16, buf[0], wnew)
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + kvec[t] + wt
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        nst = jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g])
        nbuf = jnp.concatenate([buf[1:], wt[None]], axis=0)
        return nst, nbuf

    stv, _ = jax.lax.fori_loop(0, 64, round_body, (st0, buf0))
    return stv + st0


IV_INTS = [int(v) for v in IV]
_K_INTS = [int(v) for v in _K.reshape(-1)]


def compress_pe(state, w):
    """Partial-evaluating unrolled SHA-256 compression.

    state: list of 8 entries, w: list of 16 entries -- each a traced uint32
    row OR a Python int constant (bitops partial evaluation).  Constant
    schedule words (padding/length), a constant IV, and K[t]+w[t] combining
    then cost nothing at run time, and ch/maj use the re-associated forms
    with their shared-subexpression carried across rounds:

      ch  = g ^ (e & (f^g)),   f^g this round == e^f last round
      maj = b ^ ((a^b) & (b^c)), b^c this round == a^b last round

    ~3 ops/round cheaper than the textbook forms the reference executes
    (shaders/sha256.wgsl:131-158).  Returns the 8 state entries as a list
    (traced rows where data-dependent).
    """
    from vgen_tpu.ops import bitops as bo

    st0 = list(state)
    a, b, c, d, e, f, g, h = st0
    w = list(w[:16])
    fg = bo.xor2(f, g)  # f^g for round 0
    bc = bo.xor2(b, c)  # b^c for round 0
    for t in range(64):
        if t >= 16:
            w15 = w[(t - 15) % 16]
            w2 = w[(t - 2) % 16]
            s0 = bo.xor2(
                bo.xor2(bo.rotr(w15, 7), bo.rotr(w15, 18)), bo.shr(w15, 3)
            )
            s1 = bo.xor2(
                bo.xor2(bo.rotr(w2, 17), bo.rotr(w2, 19)), bo.shr(w2, 10)
            )
            w[t % 16] = bo.addn(w[t % 16], s0, w[(t - 7) % 16], s1)
        s1 = bo.xor2(bo.xor2(bo.rotr(e, 6), bo.rotr(e, 11)), bo.rotr(e, 25))
        ch = bo.xor2(g, bo.and2(e, fg))
        t1 = bo.addn(h, s1, ch, _K_INTS[t], w[t % 16])
        s0 = bo.xor2(bo.xor2(bo.rotr(a, 2), bo.rotr(a, 13)), bo.rotr(a, 22))
        ab = bo.xor2(a, b)
        maj = bo.xor2(b, bo.and2(ab, bc))
        ef = bo.xor2(e, f)
        h, g, f, e, d, c, b, a = (
            g, f, e, bo.addn(d, t1), c, b, a, bo.addn(t1, s0, maj)
        )
        fg, bc = ef, ab
    out = [bo.addn(v, st0[i]) for i, v in enumerate([a, b, c, d, e, f, g, h])]
    shp = None
    for v in out:
        if not bo.is_const(v):
            shp = v.shape
            break
    return [bo.materialize(v, shp, jnp) for v in out]


def x33_schedule_words(x_limbs, parity):
    """Schedule words for SHA-256(parity_byte || x_be_32bytes) built straight
    from 16-bit limbs -- no per-byte materialization (saves ~80 VPU ops per
    hash vs to_bytes_be + words_from_bytes).

    x_limbs: (16, *B) uint32 little-endian 16-bit limbs; parity: Python int
    (2/3) or traced uint32 row of {2,3}.  Returns the 16-entry word list for
    compress_pe (words 9..15 are int constants)."""
    from vgen_tpu.ops import bitops as bo

    l = x_limbs
    w = [
        bo.or2(bo.shl(parity, 24), bo.or2(bo.shl(l[15], 8), bo.shr(l[14], 8)))
    ]
    for i in range(1, 8):
        w.append(
            bo.or2(
                bo.shl(bo.and2(l[16 - 2 * i], 0xFF), 24),
                bo.or2(bo.shl(l[15 - 2 * i], 8), bo.shr(l[14 - 2 * i], 8)),
            )
        )
    w.append(bo.or2(bo.shl(bo.and2(l[0], 0xFF), 24), 0x00800000))
    w += [0, 0, 0, 0, 0, 0, 264]
    return w


def sha256_x33_state(x_limbs, parity):
    """SHA-256 state words (8, *B) of a compressed pubkey (parity||x) built
    from limbs; feed to ripemd160.ripemd160_sha_state_words for hash160."""
    return compress_pe(IV_INTS, x33_schedule_words(x_limbs, parity))


def sha256_x65_state(x_limbs, y_limbs):
    """SHA-256 state words of the 65-byte uncompressed pubkey 0x04||x||y
    (two compress_pe blocks, schedule words straight from limbs)."""
    from vgen_tpu.ops import bitops as bo

    def span(l, j):
        # message word covering value bytes 4j-1 .. 4j+2 of a BE 32-byte value
        return bo.or2(
            bo.shl(bo.and2(l[16 - 2 * j], 0xFF), 24),
            bo.or2(bo.shl(l[15 - 2 * j], 8), bo.shr(l[14 - 2 * j], 8)),
        )

    xl, yl = x_limbs, y_limbs
    w = [bo.or2(0x04 << 24, bo.or2(bo.shl(xl[15], 8), bo.shr(xl[14], 8)))]
    for j in range(1, 8):
        w.append(span(xl, j))
    w.append(
        bo.or2(
            bo.shl(bo.and2(xl[0], 0xFF), 24),
            bo.or2(bo.shl(yl[15], 8), bo.shr(yl[14], 8)),
        )
    )
    for j in range(1, 8):
        w.append(span(yl, j))
    st = compress_pe(IV_INTS, w)
    w2 = [bo.or2(bo.shl(bo.and2(yl[0], 0xFF), 24), 0x00800000)]
    w2 += [0] * 14 + [520]
    return compress_pe(st, w2)


def initial_state(batch_shape):
    return jnp.stack(
        [jnp.full(tuple(batch_shape), int(v), dtype=U32) for v in IV]
    )


def words_from_bytes(data, msg_len: int):
    """Build the 16-word single-block schedule for a message of msg_len bytes
    (<= 55) given data as a (msg_len, *B) byte array.  Padding/length words
    come out as Python-int constants, so compress_pe folds them for free
    (compress materializes them for the fori_loop path)."""
    from vgen_tpu.ops import bitops as bo

    assert msg_len <= 55
    w = []
    for wi in range(16):
        word = 0
        for b in range(4):
            idx = wi * 4 + b
            if idx < msg_len:
                byte = data[idx]
            elif idx == msg_len:
                byte = 0x80
            elif wi == 15 and idx >= 62:
                byte = ((msg_len * 8) >> (8 * (63 - idx))) & 0xFF
            else:
                byte = 0
            word = bo.or2(bo.shl(word, 8), byte)
        w.append(word)
    return w


def sha256_bytes(data, msg_len: int, unroll: bool = False):
    """SHA-256 of fixed-length (<= 55 byte) messages: (L,*B) bytes -> (32,*B)."""
    B = data.shape[1:]
    st = compress(initial_state(B), words_from_bytes(data, msg_len),
                  unroll=unroll)
    return state_to_bytes(st)


def sha256_bytes_2block(data, msg_len: int, unroll: bool = False):
    """SHA-256 for 56 <= msg_len <= 119 byte messages (two blocks).

    Needed for the 65-byte uncompressed pubkey (P2PKH-uncompressed path,
    which the reference only ever hashed on CPU via the bitcoin crate)."""
    assert 56 <= msg_len <= 119
    B = data.shape[1:]
    zero = jnp.zeros(B, dtype=U32)
    # block 1: bytes 0..63 straight from the message
    w1 = []
    for wi in range(16):
        word = zero
        for b in range(4):
            idx = wi * 4 + b
            byte = data[idx] if idx < min(msg_len, 64) else (
                jnp.full(B, 0x80, dtype=U32) if idx == msg_len else zero
            )
            word = (word << 8) | byte
        w1.append(word)
    st = compress(initial_state(B), w1, unroll=unroll)
    # block 2: remaining bytes + pad + length
    w2 = []
    bits = msg_len * 8
    for wi in range(16):
        word = zero
        for b in range(4):
            idx = 64 + wi * 4 + b
            if idx < msg_len:
                byte = data[idx]
            elif idx == msg_len:
                byte = jnp.full(B, 0x80, dtype=U32)
            elif idx >= 126:
                byte = jnp.full(B, (bits >> (8 * (127 - idx))) & 0xFF, dtype=U32)
            else:
                byte = zero
            word = (word << 8) | byte
        w2.append(word)
    return state_to_bytes(compress(st, w2, unroll=unroll))


def state_to_bytes(state):
    """(8, *B) state words -> (32, *B) big-endian digest bytes."""
    out = []
    for i in range(8):
        for shift in (24, 16, 8, 0):
            out.append((state[i] >> shift) & jnp.uint32(0xFF))
    return jnp.stack(out)


def double_sha256_bytes(data, msg_len: int, unroll: bool = False):
    """SHA256(SHA256(msg)) for msg_len <= 55 (checksum path)."""
    return sha256_bytes(sha256_bytes(data, msg_len, unroll=unroll), 32,
                        unroll=unroll)


def tagged_midstate(tag: str) -> np.ndarray:
    """Host: midstate after compressing SHA256(tag)||SHA256(tag) (= 1 block).

    BIP340 tagged hash with the first block precomputed -- finishing the job
    the reference's dead code started (sha256.wgsl:177-184)."""
    import hashlib

    t = hashlib.sha256(tag.encode()).digest()
    block = t + t
    # run one compression on the host
    w = [int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(16)]
    state = [int(x) for x in IV]
    k = [int(x) for x in _K.reshape(-1)]
    M = 0xFFFFFFFF

    def rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & M

    a, b, c, d, e, f, g, h = state
    ws = list(w)
    for i in range(64):
        if i >= 16:
            s0 = rotr(ws[(i - 15) % 16], 7) ^ rotr(ws[(i - 15) % 16], 18) ^ (
                ws[(i - 15) % 16] >> 3
            )
            s1 = rotr(ws[(i - 2) % 16], 17) ^ rotr(ws[(i - 2) % 16], 19) ^ (
                ws[(i - 2) % 16] >> 10
            )
            ws[i % 16] = (ws[i % 16] + s0 + ws[(i - 7) % 16] + s1) & M
        wi = ws[i % 16]
        s1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g) & M
        t1 = (h + s1 + ch + k[i] + wi) & M
        s0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (s0 + maj) & M
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M, c, b, a, (t1 + t2) & M
    return np.array(
        [(x + y) & M for x, y in zip([a, b, c, d, e, f, g, h], state)],
        dtype=np.uint32,
    )


def tagged_hash_32(midstate: np.ndarray, data32, unroll: bool = False):
    """SHA256 tagged hash of a 32-byte payload given the tag midstate.

    Message is tag32||tag32||data32 = 96 bytes; block 2 = data32 + padding."""
    B = data32.shape[1:]
    zero = jnp.zeros(B, dtype=U32)
    w = []
    for wi in range(8):
        word = zero
        for b in range(4):
            word = (word << 8) | data32[wi * 4 + b]
        w.append(word)
    if unroll:
        # PE path: int midstate + int padding words fold into the rounds
        w += [0x80000000, 0, 0, 0, 0, 0, 0, 96 * 8]
        st = compress_pe([int(v) for v in np.asarray(midstate)], w)
        return state_to_bytes(jnp.stack(st))
    w.append(jnp.full(B, 0x80000000, dtype=U32))  # w[8]
    for _ in range(6):
        w.append(zero)
    w.append(jnp.full(B, 96 * 8, dtype=U32))  # w[15] = bit length 768
    st = jnp.stack(
        [jnp.full(tuple(B), int(v), dtype=U32) for v in np.asarray(midstate)]
    )
    return state_to_bytes(compress(st, w, unroll=unroll))
