"""Partial-evaluating u32 bit-op helpers for unrolled hash kernels.

Values are either traced uint32 arrays or plain Python ints (compile-time
constants).  Every helper folds int×int at trace time and applies identity
simplifications (x^0, x&0, x+0, ...), so hash rounds written against these
helpers automatically specialize to their constant message/IV structure --
constant-padding schedule words, IV-start rounds, and K+w combining cost
zero or one op instead of the generic count.  (The reference pays the full
generic cost per round on GPU: shaders/sha256.wgsl:147-158,
shaders/ripemd160.wgsl:54-99.)

Int results are kept masked to 32 bits.  Traced uint32 arithmetic wraps
mod 2^32 natively, and mixing a Python int operand into a jnp uint32 op is
a weakly-typed scalar constant -- no broadcast materialization.
"""

from __future__ import annotations

import numpy as np

M32 = 0xFFFFFFFF


def is_const(x) -> bool:
    return isinstance(x, (int, np.integer))


def rotr(x, n: int):
    if n == 0:
        return x
    if is_const(x):
        x = int(x)
        return ((x >> n) | (x << (32 - n))) & M32
    return (x >> n) | (x << (32 - n))


def rotl(x, n: int):
    return rotr(x, (32 - n) % 32)


def shr(x, n: int):
    if n == 0:
        return x
    return (int(x) >> n) if is_const(x) else (x >> n)


def shl(x, n: int):
    if n == 0:
        return x
    return ((int(x) << n) & M32) if is_const(x) else (x << n)


def xor2(a, b):
    if is_const(a) and is_const(b):
        return (int(a) ^ int(b)) & M32
    if is_const(a):
        a, b = b, a
    if is_const(b):
        b = int(b)
        if b == 0:
            return a
        return a ^ np.uint32(b)
    return a ^ b


def and2(a, b):
    if is_const(a) and is_const(b):
        return int(a) & int(b) & M32
    if is_const(a):
        a, b = b, a
    if is_const(b):
        b = int(b)
        if b == 0:
            return 0
        if b == M32:
            return a
        return a & np.uint32(b)
    return a & b


def or2(a, b):
    if is_const(a) and is_const(b):
        return (int(a) | int(b)) & M32
    if is_const(a):
        a, b = b, a
    if is_const(b):
        b = int(b)
        if b == 0:
            return a
        return a | np.uint32(b)
    return a | b


def not1(x):
    if is_const(x):
        return (~int(x)) & M32
    return ~x


def addn(*xs):
    """n-ary add: folds all int operands into one masked constant."""
    c = 0
    ts = []
    for x in xs:
        if is_const(x):
            c = (c + int(x)) & M32
        else:
            ts.append(x)
    if not ts:
        return c
    r = ts[0]
    for t in ts[1:]:
        r = r + t
    if c:
        r = r + np.uint32(c)
    return r


def bswap32(v):
    """Byte-swap a u32 row (or int constant)."""
    return or2(
        or2(shr(v, 24), and2(shr(v, 8), 0xFF00)),
        or2(shl(and2(v, 0xFF00), 8), shl(and2(v, 0xFF), 24)),
    )


def bswap16(v):
    """Swap the two low bytes of a 16-bit value held in a u32 row."""
    return or2(shr(v, 8), shl(and2(v, 0xFF), 8))


def materialize(x, batch_shape, jnp):
    """Ensure a traced (batch,)-shaped uint32 row (broadcast int constants)."""
    if is_const(x):
        return jnp.full(tuple(batch_shape), int(x) & M32, dtype=jnp.uint32)
    return x
