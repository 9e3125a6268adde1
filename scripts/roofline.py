"""Roofline: measured primitive costs x per-key op counts vs achieved rates.

VERDICT r3 item 4 asked for "a committed measured roofline (ops/key x
measured issue rate) proving the achieved rate is within ~1.5x of bound".
This script produces that artifact (ROOFLINE.json):

1. Measures each pipeline primitive ON DEVICE inside a Pallas kernel at the
   production V-tile block shape (16, 8, 512) -- the same layout the fused
   scan kernels use (pallas_fused._tile_plan) -- giving ns/key for:
   field mul (weak), compressed hash160 word path, script-hash (P2SH's
   second hash160), uncompressed hash160 (2-block SHA), Ethereum
   account keccak, the P2TR tagged TapTweak SHA, and one lean Jacobian
   mixed add (the P2TR ladder window body).

   Methodology (reworked round 5 -- ADVICE r4 found the old
   empty-harness-subtract + max(delta, 0) clamp reported exactly 0.0 for
   primitives cheaper than the ~4.5 ms dispatch-noise floor): each
   primitive is timed at R and 2R serialized repetitions and costed as
   (t(2R) - t(R)) / R, which cancels dispatch/copy overhead exactly.  R
   doubles until the delta clears a measured noise floor; a primitive
   whose delta never clears it is reported as a MEASUREMENT ERROR (the
   script exits nonzero) instead of silently contributing 0 to bounds.

2. Composes per-path per-key bounds from static op counts read off the
   kernels (citations inline below), mirroring how the reference's
   throughput sweep frames per-element cost (benches/gpu_bench.rs:24-52 --
   the reference never published a roofline; its shader cost model is
   implicit).

3. Loads BENCH_MATRIX.json and reports utilization = bound_ns / achieved_ns
   per matrix row it can model (interval + P2TR rows; DFA rows add a
   pattern-dependent automaton cost that has no single bound).

Run on the real chip:  python scripts/roofline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/vgen_tpu/jaxcache"),
)

from vgen_tpu.ops import curve, encode, field, keccak, sha256, u256
from vgen_tpu.ops.u256 import LIMB_MASK

B = int(os.environ.get("B", 524288))
# starting rep count per primitive; measure() doubles it until the
# (t(2R) - t(R)) delta clears the noise floor
R0 = int(os.environ.get("R", 16))
VSUB, TILE = 8, 512  # production block plan (pallas_fused._tile_plan)
SPAN = B // VSUB

TAPTWEAK_MID = sha256.tagged_midstate("TapTweak")


def _feedback(a, words):
    """Fold a list/array of u32 word rows back into 16 limb rows so the
    next repetition depends on this one (prevents dead-code elimination
    and models the dependent-chain issue rate the real kernels see)."""
    rows = [words[i % len(words)] for i in range(16)]
    return (a ^ jnp.stack(rows)) & LIMB_MASK


def _body(mode, a, b, c):
    if mode == "empty":
        return _feedback(a, [b[0]])
    if mode.startswith("dfachar"):
        # one character step of the one-hot MXU DFA (pipeline.match_symbols
        # / pallas_fused._match_tile): sym one-hot build + (S,W)@(W,B) dot
        # + state reduce + one-hot rebuild.  Table synthesized from iota
        # (Mosaic rejects captured constant arrays).
        W = int(mode[len("dfachar"):])
        S = 32
        ti = (
            jax.lax.broadcasted_iota(jnp.int32, (S, W), 0) * 5
            + jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)
        )
        table = (ti % S).astype(jnp.float32)
        B_sh = a.shape[1:]
        sym = (a[0] % jnp.uint32(W)).astype(jnp.int32)
        state = (b[0] % jnp.uint32(S)).astype(jnp.int32)
        sids = jax.lax.broadcasted_iota(jnp.int32, (S,) + B_sh, 0)
        wids = jax.lax.broadcasted_iota(jnp.int32, (W,) + B_sh, 0)
        state1h = u256.bool_to_f32(sids == state[None])
        sym1h = u256.bool_to_f32(wids == sym[None])
        R = jax.lax.dot_general(
            table, sym1h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        nxt = jnp.sum(state1h * R, axis=0)
        nxt1h = u256.bool_to_f32(sids == nxt[None])
        # Mosaic has no f32->u32 cast; route through i32
        out = (
            jnp.sum(nxt1h, axis=0).astype(jnp.int32)
            + nxt.astype(jnp.int32)
        ).astype(jnp.uint32)
        return _feedback(a, [out])
    if mode == "b58syms":
        # Base58Check digit symbols from 5 h160 words (the encode stage
        # of the DFA path; checksum double-SHA + divmod-58 basis matmul)
        syms, _ = encode.base58check_symbols_words(
            0, [a[i] for i in range(5)], c
        )
        return _feedback(a, [syms[i] for i in range(syms.shape[0])])
    if mode == "ethsyms":
        # EIP-55 cased-hex symbols from 20 account bytes (second keccak)
        acct = jnp.stack([a[i % 16] & jnp.uint32(0xFF) for i in range(20)])
        syms, _ = encode.eth_symbols(acct, unroll=True)
        return _feedback(a, [syms[i] for i in range(syms.shape[0])])
    if mode == "mulweak":
        r = field.mul_weak(a, b)
        return _feedback(a, list(r))
    if mode == "hash160c":
        # GLV interval per-variant cost (pipeline.glv_interval_mask)
        w = encode.hash160_33_words_from_x(a, 2)
        return _feedback(a, list(w))
    if mode == "scripthash":
        # only the second hash160 (of the 22-byte redeem script); the
        # p2sh bound adds this on top of hash160c
        w = encode.script_hash_words([a[i] for i in range(5)])
        return _feedback(a, list(w))
    if mode == "hash160u":
        w = encode.hash160_65_words_from_xy(a, b)
        return _feedback(a, list(w))
    if mode == "keccak":
        w = keccak.eth_account_words_from_xy(a, b, unroll=True)
        return _feedback(a, list(w))
    if mode == "tagged":
        xb = u256.to_bytes_be(a)
        tb = sha256.tagged_hash_32(TAPTWEAK_MID, xb, unroll=True)
        return _feedback(a, list(tb))
    if mode == "leanadd":
        X, Y, Z, ok = curve.jacobian_add_affine_lean(a, b, a, b, a)
        return _feedback(a, [X[0], Y[0], Z[0]])
    raise ValueError(mode)


def make(mode, reps):
    def kernel(a_ref, b_ref, c_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        c = c_ref[...]
        for _ in range(reps):
            a = _body(mode, a, b, c)
            b = b ^ a
        o_ref[...] = a

    limb = lambda: pl.BlockSpec((16, VSUB, TILE), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=SPAN // TILE,
        in_specs=[limb(), limb(),
                  pl.BlockSpec((34, 25), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=limb(),
        out_shape=jax.ShapeDtypeStruct((16, VSUB, SPAN), jnp.uint32),
    )
    basis = jnp.asarray(encode._POW256_B58)

    def fn(a, b):
        return call(a, b, basis)

    return jax.jit(fn)


def _sync(r):
    np.asarray(jax.device_get(r.ravel()[:1]))


def _time_call(f, a, b, n=8):
    """Best-of-n wall time of one compiled call (the tunneled dispatch adds
    multi-ms noise per call; MIN is the right estimator for a fixed-work
    kernel).  Also returns the spread (2nd best - best) as a jitter
    estimate."""
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(a, b)
        _sync(r)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[0], times[1] - times[0]


def measure(mode, a, b, n=8, max_reps=4096):
    """ns/key for one primitive via the two-rep-count delta:
    cost = (t(2R) - t(R)) / R -- dispatch/copy overhead cancels exactly.
    Doubles R until the delta clears the noise floor (5x per-call jitter,
    min 1 ms).  Returns (ns_per_key, meta dict); ns_per_key is None when
    the primitive stayed unmeasurable at max_reps (caller must treat this
    as an error, NOT as zero -- ADVICE r4)."""
    reps = R0
    while True:
        f1 = make(mode, reps)
        f2 = make(mode, 2 * reps)
        t0 = time.perf_counter()
        r = f1(a, b)
        _sync(r)
        r = f2(a, b)
        _sync(r)
        print(f"# {mode} R={reps}: compile+first "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        t1, j1 = _time_call(f1, a, b, n)
        t2, j2 = _time_call(f2, a, b, n)
        delta = t2 - t1
        floor = max(5 * max(j1, j2), 1e-3)
        print(f"#   {mode} R={reps}: t1={t1 * 1e3:.3f} ms t2={t2 * 1e3:.3f} "
              f"ms delta={delta * 1e3:.3f} ms floor={floor * 1e3:.3f} ms",
              file=sys.stderr, flush=True)
        if delta >= floor:
            meta = {"reps": reps, "t1_ms": round(t1 * 1e3, 3),
                    "t2_ms": round(t2 * 1e3, 3),
                    "delta_ms": round(delta * 1e3, 3),
                    "floor_ms": round(floor * 1e3, 3)}
            return delta / reps / B * 1e9, meta
        if 2 * reps > max_reps:
            return None, {"reps": reps, "t1_ms": round(t1 * 1e3, 3),
                          "t2_ms": round(t2 * 1e3, 3),
                          "delta_ms": round(delta * 1e3, 3),
                          "floor_ms": round(floor * 1e3, 3),
                          "error": "delta below noise floor at max reps"}
        reps *= 2


def main():
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "ROOFLINE.json")
    # --paths-only: reuse the committed primitive measurements (they do
    # not depend on BENCH_MATRIX) and recompute only the paths section
    # against the current matrix.  Each primitive costs minutes of
    # (cache-defeating) Mosaic recompiles per full run; re-running them
    # after a matrix refresh measures nothing new.
    paths_only = "--paths-only" in sys.argv[1:]
    if paths_only:
        with open(out_path) as f:
            prev = json.load(f)
        prim = prev["primitives_ns_per_key"]
        prim_meta = prev.get("primitive_measurements", {})
        dev_kind = prev["device"]
    else:
        dev = jax.devices()[0]
        dev_kind = dev.device_kind
        print(f"# device: {dev_kind}", file=sys.stderr, flush=True)
        rng = np.random.default_rng(11)
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, VSUB, SPAN),
                                     dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, VSUB, SPAN),
                                     dtype=np.uint32))

        prim = {}
        prim_meta = {}
        errors = []
        for mode in ("mulweak", "hash160c", "scripthash", "hash160u",
                     "keccak", "tagged", "leanadd", "dfachar60",
                     "dfachar24", "b58syms", "ethsyms"):
            ns, meta = measure(mode, a, b)
            prim_meta[mode] = meta
            if ns is None:
                errors.append(mode)
                print(f"# {mode:10s}: MEASUREMENT ERROR ({meta})",
                      file=sys.stderr, flush=True)
                continue
            prim[mode] = ns
            print(f"# {mode:10s}: {ns:7.2f} ns/key (R={meta['reps']})",
                  file=sys.stderr, flush=True)
        if errors:
            print(json.dumps({"error": "unmeasurable primitives",
                              "primitives": errors}))
            sys.exit(1)

    # Per-key op counts, from the kernels:
    #  - GLV interval paths (pallas_fused._make_range_glv_kernel): 6 keys
    #    per EC add; per SLOT: x-only finish = mul_weak + square_weak
    #    (~2 muls, pallas_fused._ec_finish_x), beta/beta2 muls (2,
    #    pipeline.glv_interval_mask:645), Pallas inversion chain ~4 mul-
    #    equivalents/slot (fwd+bwd walk + amortized Fermat,
    #    pallas_fused.batch_inverse_dx_pallas) => ~8 muls / 6 keys.
    #  - per KEY: one hash160 word path (two for P2SH: script_hash_words).
    #  - uncompressed (GLV since round 5, full finish because the hash
    #    covers (x, y)): per slot full finish ~3 muls + chain ~4 + beta
    #    muls 2 => ~9 muls / 6 keys; per key one 2-block hash160_65.
    #  - P2TR (pallas_fused._make_p2tr_ladder_kernel): EC finish (~3) +
    #    tagged TapTweak SHA + 32 lean mixed adds + chain ~4 + ladder
    #    output normalization ~5 muls; the per-window one-hot table
    #    select rides the MXU concurrently with the VPU adds and is not
    #    in the VPU bound.
    m = prim["mulweak"]
    glv_ec = 8.0 * m / 6.0
    glv_ec_full = 9.0 * m / 6.0  # full (x, y) finish: one more mul/slot
    # DFA-path per-key costs: every variant pays hash + encode-to-symbols
    # + (n_symbols + 1 EOS) one-hot DFA char steps.  35 steps for the
    # 34-symbol Base58 formats (W=60), 41 for Ethereum's 40 cased-hex
    # symbols (the fixed 0x prefix is projected out, W=24).
    dfa_p2pkh = (
        prim["hash160c"] + prim["b58syms"] + 35.0 * prim["dfachar60"]
    )
    dfa_eth = prim["keccak"] + prim["ethsyms"] + 41.0 * prim["dfachar24"]
    bounds = {
        "p2pkh/interval": prim["hash160c"] + glv_ec,
        "p2wpkh/interval": prim["hash160c"] + glv_ec,
        "p2sh-p2wpkh/interval": prim["hash160c"] + prim["scripthash"]
        + glv_ec,
        "ethereum/interval": prim["keccak"] + glv_ec_full,
        "p2pkh-uncompressed/interval": prim["hash160u"] + glv_ec_full,
        "p2tr/interval": prim["tagged"] + 32.0 * prim["leanadd"]
        + 12.0 * m,
        # dfa-pure rows: wildcard-head patterns, full on-device
        # encode+DFA for all 6 GLV variants
        "p2pkh/dfa-pure": dfa_p2pkh + glv_ec,
        "p2sh-p2wpkh/dfa-pure": dfa_p2pkh + prim["scripthash"] + glv_ec,
        "p2pkh-uncompressed/dfa-pure": (
            prim["hash160u"] + prim["b58syms"]
            + 35.0 * prim["dfachar60"] + glv_ec_full
        ),
        "ethereum/dfa-pure": dfa_eth + glv_ec_full,
        # p2wpkh dfa-pure: 33 bech32 symbols + EOS, W=34 DFA (between the
        # two measured widths; use the wider one as the cost proxy)
        "p2wpkh/dfa-pure": (
            prim["hash160c"] + 34.0 * prim["dfachar60"] + glv_ec
        ),
    }

    rows = []
    mpath = os.path.join(os.path.dirname(__file__), "..",
                         "BENCH_MATRIX.json")
    with open(mpath) as f:
        matrix = json.load(f)
    for row in matrix["rows"]:
        key = f"{row['format']}/{row['path']}"
        if key not in bounds or bounds[key] <= 0:
            continue
        achieved_ns = 1e9 / row["keys_per_sec"]
        bound_ns = bounds[key]
        rows.append({
            "path": key,
            "bound_ns_per_key": round(bound_ns, 3),
            "achieved_ns_per_key": round(achieved_ns, 3),
            "bound_keys_per_sec": round(1e9 / bound_ns),
            "achieved_keys_per_sec": round(row["keys_per_sec"]),
            "utilization": round(bound_ns / achieved_ns, 3),
        })
        print(f"# {key:28s} bound {bound_ns:7.2f} ns/key  achieved "
              f"{achieved_ns:7.2f}  util {bound_ns / achieved_ns:5.1%}",
              file=sys.stderr, flush=True)

    out = {
        "device": dev_kind,
        "block": [16, VSUB, TILE],
        "batch": B,
        "primitives_ns_per_key": {k: round(v, 3) for k, v in prim.items()},
        "primitive_measurements": prim_meta,
        "paths": rows,
        "note": (
            "bound = sum of measured primitive costs at the production "
            "V-tile shape; primitive cost = (t(2R)-t(R))/R two-point delta "
            "(dispatch overhead cancels; R doubled until the delta clears "
            "the noise floor -- see primitive_measurements). Primitive "
            "costs carry ~+-25% run-to-run variance through the tunneled "
            "device link (hash160c measured 0.91 and 1.04 ns in "
            "back-to-back runs), and the serialized-repetition harness "
            "denies the cross-variant instruction overlap the real "
            "kernels get, so utilization ~0.7-1.3 reads as AT-BOUND; "
            "clearly below (p2tr) means real headroom. dfa-pure rows "
            "model the per-variant encode+DFA cost with measured "
            "dfachar/b58syms/ethsyms primitives."
        ),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"rows": len(rows)}))


if __name__ == "__main__":
    main()
