"""Cross-check the PE word-level hash160 path against byte paths + hashlib."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import hashlib

import jax.numpy as jnp
import numpy as np

from vgen_tpu.ops import encode, pipeline, ripemd160, sha256, u256
from vgen_tpu.crypto.address import AddressFormat

rng = np.random.default_rng(11)
B = 64
xs = [int.from_bytes(rng.bytes(32), "big") % ((1 << 256) - 1) for _ in range(B)]
x_limbs = jnp.asarray(u256.from_int(xs))

fails = 0

# 1) sha256_x33_state vs hashlib, both parities (int constants)
for parity in (2, 3):
    st = sha256.sha256_x33_state(x_limbs, parity)
    st = np.asarray(jnp.stack(st))
    for b in range(B):
        msg = bytes([parity]) + xs[b].to_bytes(32, "big")
        ref = hashlib.sha256(msg).digest()
        got = b"".join(int(st[i, b]).to_bytes(4, "big") for i in range(8))
        if got != ref:
            fails += 1
            print("SHA x33 mismatch", parity, b)
            break

# traced parity row
par_row = jnp.asarray((rng.integers(0, 2, B) + 2).astype(np.uint32))
st = np.asarray(jnp.stack(sha256.sha256_x33_state(x_limbs, par_row)))
for b in range(B):
    msg = bytes([int(par_row[b])]) + xs[b].to_bytes(32, "big")
    ref = hashlib.sha256(msg).digest()
    got = b"".join(int(st[i, b]).to_bytes(4, "big") for i in range(8))
    if got != ref:
        fails += 1
        print("SHA x33 traced-parity mismatch", b)
        break

# 2) full hash160 word path vs byte path + hashlib-sha256 -> ripemd ref path
w5 = encode.hash160_33_words_from_x(x_limbs, 2)
w5 = np.asarray(jnp.stack(w5))
pub = jnp.concatenate(
    [jnp.full((1, B), 2, dtype=jnp.uint32), u256.to_bytes_be(x_limbs)], axis=0
)
h_bytes = np.asarray(encode.hash160_33(pub))
for b in range(B):
    got = b"".join(int(w5[i, b]).to_bytes(4, "big") for i in range(5))
    ref = bytes(int(h_bytes[i, b]) for i in range(20))
    if got != ref:
        fails += 1
        print("hash160 word/byte mismatch", b)
        break

# 3) script_hash_words vs script_hash
sw = np.asarray(jnp.stack(encode.script_hash_words(
    encode.hash160_33_words_from_x(x_limbs, 3))))
pub3 = jnp.concatenate(
    [jnp.full((1, B), 3, dtype=jnp.uint32), u256.to_bytes_be(x_limbs)], axis=0
)
sh_bytes = np.asarray(pipeline.script_hash(encode.hash160_33(pub3)))
for b in range(B):
    got = b"".join(int(sw[i, b]).to_bytes(4, "big") for i in range(5))
    ref = bytes(int(sh_bytes[i, b]) for i in range(20))
    if got != ref:
        fails += 1
        print("script_hash word/byte mismatch", b)
        break

# 4) unrolled compress (generic words_from_bytes path) still OK: brainwallet
data = np.frombuffer(b"correct horse battery staple", dtype=np.uint8)
d = jnp.asarray(data.astype(np.uint32))[:, None]
dig = np.asarray(sha256.sha256_bytes(d, len(data), unroll=True))[:, 0]
assert bytes(dig.astype(np.uint8)) == hashlib.sha256(bytes(data)).digest(), \
    "unrolled sha256_bytes broken"

# 5) glv_interval_mask / interval_value_words: unroll True vs False parity
ys = [pow(x, 3, (1 << 256)) for x in xs]  # arbitrary "y" values (parity only)
y_limbs = jnp.asarray(u256.from_int(ys))
lo = jnp.asarray(
    np.stack([u256.from_int(0x1111111100000000000000 << 100)[:10:2][:5]
              for _ in range(2)]), dtype=jnp.uint32)
# build simple word-bound tables: compare against halves of the space
lo = jnp.zeros((2, 5), dtype=jnp.uint32)
hi = jnp.full((2, 5), 0xFFFFFFFF, dtype=jnp.uint32).at[0, 0].set(0x7FFFFFFF)
for fmt in (AddressFormat.P2PKH, AddressFormat.P2SH_P2WPKH):
    m1 = np.asarray(pipeline.glv_interval_mask(fmt, x_limbs, y_limbs, lo, hi,
                                               unroll=True))
    m0 = np.asarray(pipeline.glv_interval_mask(fmt, x_limbs, y_limbs, lo, hi,
                                               unroll=False))
    if not (m1 == m0).all():
        fails += 1
        print("glv mask mismatch", fmt)
    w1, _ = pipeline.interval_value_words(fmt, x_limbs, y_limbs, unroll=True)
    w0, _ = pipeline.interval_value_words(fmt, x_limbs, y_limbs, unroll=False)
    if not all((np.asarray(a) == np.asarray(b)).all() for a, b in zip(w1, w0)):
        fails += 1
        print("interval words mismatch", fmt)

print("FAILS:", fails)
