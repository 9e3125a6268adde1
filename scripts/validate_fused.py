"""On-TPU validation: fused Pallas pipeline vs XLA pipeline, bit-exact.

Run directly (python scripts/validate_fused.py) on a TPU host; also invoked
by tests/test_pallas_fused.py when the test platform is a TPU, and by
bench.py as the pre-report correctness gate.

Structured as a list of independent SECTIONS so callers can run them under
a deadline (VERDICT r3 item 1: the round-3 driver bench timed out inside
this gate and destroyed the round's perf record -- a truncated validation
run must still report how far it got).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_sections(batch: int = 262144, tile: int = 512,
                   quick: bool = False):
    """Return a list of (name, thunk) validation sections.

    Each thunk returns True/False and prints one summary line.  quick=True
    keeps one format per section group (bench.py's per-round gate); the
    full matrix is the per-ops-change certification run.
    """
    os.environ.setdefault(
        "VGEN_TPU_CACHE", os.path.expanduser("~/.cache/vgen_tpu")
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.environ["VGEN_TPU_CACHE"], "jaxcache"),
    )
    from vgen_tpu.crypto import secp256k1 as ec
    from vgen_tpu.crypto.address import AddressFormat, AddressGenerator
    from vgen_tpu.ops import pallas_fused, pipeline
    from vgen_tpu.pattern import Pattern
    from vgen_tpu.scan.tables import _ints_to_limbs, ig_table_arrays

    tx, ty = ig_table_arrays(batch)

    # ORACLE ground truth on a small window (catches numerics bugs that
    # corrupt fused and XLA paths identically, e.g. bf16 matmul rounding)
    n_oracle = 2048
    base_oracle = 0xABCDEF012345
    base = ec.scalar_mult(base_oracle)
    bx1 = jnp.asarray(_ints_to_limbs([base[0]]))
    by1 = jnp.asarray(_ints_to_limbs([base[1]]))

    def _cases(cases, nq: int = 1):
        """quick=True keeps the first nq cases of the group (bench.py's
        per-round gate); nq=2 where the second case is the only on-device
        coverage a shipped kernel gets (VERDICT r4 item 1:
        p2pkh-uncompressed fused kernels must be in the quick gate)."""
        return cases[:nq] if quick else cases

    class _OracleAddrs:
        """Expected-address provider: bulk native C++ derivation (an
        independent 4x64-limb implementation, ~20us/key) with a per-window
        sample cross-check against the pure-Python oracle; falls back to
        the Python oracle wholesale when the native library is absent.
        The Python loop cost ~2ms/key and dominated validation wall time
        (a GLV section derives 6*2048 expectation keys)."""

        def __init__(self, fmt):
            from vgen_tpu import native

            self.fmt = fmt
            self.gen = AddressGenerator(fmt)
            self.native = native if native.available() else None
            self.cache = {}

        def _python(self, k):
            ga = self.gen.generate(k.to_bytes(32, "big"))
            return None if ga is None else ga.address

        def get_many(self, keys):
            missing = sorted(
                {k for k in keys if k not in self.cache and 1 <= k}
            )
            if missing:
                addrs = (
                    self.native.derive_addresses(missing, self.fmt.value)
                    if self.native else None
                )
                if addrs is None:
                    for k in missing:
                        self.cache[k] = self._python(k)
                else:
                    for k, a in zip(missing, addrs):
                        self.cache[k] = (
                            a if a is not None else self._python(k)
                        )
                    # anchor the native bulk to the Python oracle on a
                    # deterministic sample
                    for k in missing[:: max(1, len(missing) // 8)][:8]:
                        assert self.cache[k] == self._python(k), (
                            self.fmt, k,
                        )
            return [self.cache.get(k) for k in keys]

        def get(self, k):
            return self.get_many([k])[0]

    sections = []

    def _expect_oracle(oa, pat):
        addrs = oa.get_many(
            [base_oracle + 1 + i for i in range(n_oracle)]
        )
        return sorted(
            i for i, a in enumerate(addrs)
            if a is not None and pat.matches(a)
        )

    # --- oracle DFA sections -------------------------------------------
    def _oracle_case(fmt, pattern):
        oa = _OracleAddrs(fmt)
        pat = Pattern(pattern)
        expect_small = _expect_oracle(oa, pat)
        dev = pat.device_dfa(fmt)
        flat, accept = pipeline.pad_device_dfa(dev)
        S = accept.shape[0]
        step = pallas_fused.fused_scan_step(fmt, batch, S, 256, tile, 1)
        packed = np.asarray(
            step(
                bx1, by1, tx, ty,
                jnp.asarray(flat.reshape(S, -1).astype(np.float32)),
                jnp.asarray(accept.astype(np.float32).reshape(S, 1)),
                jnp.int32(dev.start),
                jnp.full((1,), n_oracle, jnp.int32),
            )
        )[0]
        got_small = sorted(int(i) for i in packed[2:18] if i >= 0)
        # result slots cap at TOP_K=16 and keep the LARGEST indices
        expect_capped = expect_small[-16:]
        oracle_ok = got_small == expect_capped and int(packed[0]) == len(
            expect_small
        )
        print(f"{fmt.value}: oracle window match = {oracle_ok} "
              f"(count {packed[0]} vs {len(expect_small)})")
        return oracle_ok

    for fmt, pattern in _cases([
        (AddressFormat.P2PKH, "^1C"),
        (AddressFormat.P2PKH_UNCOMPRESSED, "^1A"),
        (AddressFormat.P2WPKH, "^bc1qq"),
        (AddressFormat.P2SH_P2WPKH, "^3J"),
        (AddressFormat.ETHEREUM, "^0x1[2Ff]"),  # exercises EIP-55 casing
    ], nq=2):
        sections.append((
            f"oracle-dfa:{fmt.value}",
            lambda fmt=fmt, pattern=pattern: _oracle_case(fmt, pattern),
        ))

    # --- interval (anchored-prefix) fast path --------------------------
    # Device hits may over-approximate by the checksum widening (< 2^-32
    # probability), so require: oracle set subset of device set AND every
    # device hit re-derives to a pattern match.
    def _interval_case(fmt, pattern):
        oa = _OracleAddrs(fmt)
        pat = Pattern(pattern)
        ivs = pat.match_intervals(fmt)
        assert ivs, (fmt, pattern)
        expect_small = _expect_oracle(oa, pat)
        lo_np, hi_np = pallas_fused.intervals_to_words(ivs)
        rstep = pallas_fused.fused_range_scan_step(fmt, batch, 256, tile, 1)
        packed = np.asarray(
            rstep(
                bx1, by1, tx, ty,
                jnp.asarray(lo_np), jnp.asarray(hi_np),
                jnp.full((1,), n_oracle, jnp.int32),
            )
        )[0]
        got = sorted(int(i) for i in packed[2:18] if i >= 0)
        extra = [
            i for i in got
            if not pat.matches(oa.get(base_oracle + 1 + i))
        ]
        missing = [i for i in expect_small[-16:] if i not in got]
        range_ok = not missing and not extra
        print(f"{fmt.value}: interval window match = {range_ok} "
              f"(count {packed[0]} vs {len(expect_small)}, "
              f"missing={missing}, spurious={extra})")
        return range_ok

    for fmt, pattern in _cases([
        (AddressFormat.P2PKH, "^1C"),
        (AddressFormat.P2PKH_UNCOMPRESSED, "^1A"),
        (AddressFormat.P2WPKH, "^bc1qq"),
        (AddressFormat.P2SH_P2WPKH, "^3J"),
        (AddressFormat.ETHEREUM, "^0x12"),
    ], nq=2):
        sections.append((
            f"interval:{fmt.value}",
            lambda fmt=fmt, pattern=pattern: _interval_case(fmt, pattern),
        ))

    # --- GLV interval path ---------------------------------------------
    # A window position i hits iff ANY of the 6 endomorphism variants of
    # k_i = base+1+i matches the pattern.
    def _glv_bits_ok(oa, pat, fmt, got, vbits):
        # every variant key that matches must be derivable from the
        # reported bitmask (the host drain derives ONLY these candidates)
        return all(
            set(
                v for v in ec.glv_variant_keys(base_oracle + 1 + i)
                if pat.matches(oa.get(v))
            )
            <= set(ec.glv_bit_variant_keys(
                base_oracle + 1 + i, vbits[i],
                parity_exact=fmt in pipeline.GLV_EXACT_Y,
            ))
            for i in got
        )

    def _expect_glv(oa, pat):
        variant_keys = [
            ec.glv_variant_keys(base_oracle + 1 + i)
            for i in range(n_oracle)
        ]
        oa.get_many([k for ks in variant_keys for k in ks])  # bulk warm
        return sorted(
            i for i, ks in enumerate(variant_keys)
            if any(pat.matches(oa.get(k)) for k in ks)
        )

    def _glv_interval_case(fmt, pattern):
        oa = _OracleAddrs(fmt)
        pat = Pattern(pattern)
        ivs = pat.match_intervals(fmt)
        expect_glv = _expect_glv(oa, pat)
        lo_np, hi_np = pallas_fused.intervals_to_words(ivs)
        gstep = pallas_fused.fused_range_scan_step(
            fmt, batch, 256, tile, 1, glv=True
        )
        packed = np.asarray(
            gstep(
                bx1, by1, tx, ty,
                jnp.asarray(lo_np), jnp.asarray(hi_np),
                jnp.full((1,), n_oracle, jnp.int32),
            )
        )[0]
        got = sorted(int(i) for i in packed[2:18] if i >= 0)
        vbits = {
            int(i): int(b) for i, b in zip(packed[2:18], packed[18:34])
            if i >= 0
        }
        extra = [i for i in got if i not in expect_glv]
        missing = [i for i in expect_glv[-16:] if i not in got]
        bits_ok = _glv_bits_ok(oa, pat, fmt, got, vbits)
        glv_ok = (
            not missing and not extra and bits_ok
            and int(packed[0]) == len(expect_glv)
            and int(packed[1]) == 6 * n_oracle
        )
        print(f"{fmt.value}: GLV window match = {glv_ok} "
              f"(count {packed[0]} vs {len(expect_glv)}, ops {packed[1]}, "
              f"missing={missing}, spurious={extra}, vbits_ok={bits_ok})")
        return glv_ok

    for fmt, pattern in _cases([
        (AddressFormat.P2PKH, "^1C"),
        (AddressFormat.P2PKH_UNCOMPRESSED, "^1A"),
        (AddressFormat.P2WPKH, "^bc1qq"),
        (AddressFormat.P2SH_P2WPKH, "^3J"),
        (AddressFormat.ETHEREUM, "^0x12"),
    ], nq=2):
        sections.append((
            f"glv-interval:{fmt.value}",
            lambda fmt=fmt, pattern=pattern: _glv_interval_case(fmt, pattern),
        ))

    # --- GLV on the generic DFA path -----------------------------------
    # Arbitrary (non-interval) regex, 6 variants per position (suffix
    # patterns exercise the full encode).
    def _glv_dfa_case(fmt, pattern):
        oa = _OracleAddrs(fmt)
        pat = Pattern(pattern)
        expect_glv = _expect_glv(oa, pat)
        dev = pat.device_dfa(fmt)
        flat, accept = pipeline.pad_device_dfa(dev)
        S = accept.shape[0]
        gstep = pallas_fused.fused_scan_step(
            fmt, batch, S, 256, tile, 1, glv=True
        )
        packed = np.asarray(
            gstep(
                bx1, by1, tx, ty,
                jnp.asarray(flat.reshape(S, -1).astype(np.float32)),
                jnp.asarray(accept.astype(np.float32).reshape(S, 1)),
                jnp.int32(dev.start),
                jnp.full((1,), n_oracle, jnp.int32),
            )
        )[0]
        got = sorted(int(i) for i in packed[2:18] if i >= 0)
        vbits = {
            int(i): int(b) for i, b in zip(packed[2:18], packed[18:34])
            if i >= 0
        }
        extra = [i for i in got if i not in expect_glv]
        missing = [i for i in expect_glv[-16:] if i not in got]
        bits_ok = _glv_bits_ok(oa, pat, fmt, got, vbits)
        gdfa_ok = (
            not missing and not extra and bits_ok
            and int(packed[0]) == len(expect_glv)
            and int(packed[1]) == 6 * n_oracle
        )
        print(f"{fmt.value}: GLV-DFA window match = {gdfa_ok} "
              f"(count {packed[0]} vs {len(expect_glv)}, ops {packed[1]}, "
              f"missing={missing}, spurious={extra})")
        return gdfa_ok

    for fmt, pattern in _cases([
        (AddressFormat.P2PKH, "^1C"),
        (AddressFormat.P2PKH_UNCOMPRESSED, "^1A"),
        (AddressFormat.P2WPKH, "q$"),
        (AddressFormat.P2SH_P2WPKH, "J$"),
        (AddressFormat.ETHEREUM, "^0x1[2Ff]"),
    ], nq=2):
        sections.append((
            f"glv-dfa:{fmt.value}",
            lambda fmt=fmt, pattern=pattern: _glv_dfa_case(fmt, pattern),
        ))

    # --- P2TR ----------------------------------------------------------
    # Validate the fully-fused P2TR steps (EC finish + TapTweak + ladder
    # kernel, interval compare / bech32m-DFA kernel tail) against the
    # oracle.  The packed XLA P2TR fallback is NOT validated here: its
    # unrolled program exceeds the remote compiler's memory at production
    # batches (round-4 measurement: SIGKILL at batch 262144 after 650 s);
    # its loop-form tails are covered by the CPU suite.
    from vgen_tpu.scan.tables import window_table_u32

    def _p2tr_fused_case(kind, pattern):
        fmt = AddressFormat.P2TR
        wt = jnp.asarray(window_table_u32(8))
        oa = _OracleAddrs(fmt)
        pat = Pattern(pattern)
        expect_small = _expect_oracle(oa, pat)
        rem1 = jnp.full((1,), n_oracle, jnp.int32)
        if kind == "range":
            ivs = pat.match_intervals(fmt)
            assert ivs, pattern
            lo_np, hi_np = pipeline.intervals_to_words(
                ivs, pipeline.INTERVAL_WORDS[fmt],
                n_slots=pipeline.interval_slot_count(len(ivs)),
            )
            step = pallas_fused.fused_p2tr_range_scan_step(
                batch, 256, tile, 1
            )
            packed = np.asarray(step(
                bx1, by1, tx, ty,
                jnp.asarray(lo_np), jnp.asarray(hi_np), rem1, wt,
            ))[0]
        else:
            dev = pat.device_dfa(fmt)
            flat, accept = pipeline.pad_device_dfa(dev)
            S = accept.shape[0]
            step = pallas_fused.fused_p2tr_scan_step(batch, S, 256, tile, 1)
            packed = np.asarray(step(
                bx1, by1, tx, ty,
                jnp.asarray(flat.reshape(S, -1).astype(np.float32)),
                jnp.asarray(accept.astype(np.float32).reshape(S, 1)),
                jnp.int32(dev.start), rem1, wt,
            ))[0]
        got = sorted(int(i) for i in packed[2:18] if i >= 0)
        extra = [
            i for i in got
            if not pat.matches(oa.get(base_oracle + 1 + i))
        ]
        missing = [i for i in expect_small[-16:] if i not in got]
        p2tr_ok = (
            not missing and not extra
            and int(packed[0]) == len(expect_small)
        )
        print(f"p2tr fused ({kind}): oracle window match = {p2tr_ok} "
              f"(count {packed[0]} vs {len(expect_small)}, "
              f"missing={missing}, spurious={extra})")
        return p2tr_ok

    for kind, pattern in _cases([("range", "^bc1pq"),
                                 ("dfa", "^bc1p[qp]")]):
        sections.append((
            f"p2tr-fused:{kind}",
            lambda kind=kind, pattern=pattern: _p2tr_fused_case(
                kind, pattern
            ),
        ))

    # --- fused vs XLA cross-check --------------------------------------
    def _fused_vs_xla_case(fmt, pattern):
        pat = Pattern(pattern)
        dev = pat.device_dfa(fmt)
        flat, accept = pipeline.pad_device_dfa(dev)
        S = accept.shape[0]
        dfa_f32 = jnp.asarray(flat.reshape(S, -1).astype(np.float32))
        acc_f32 = jnp.asarray(accept.astype(np.float32).reshape(S, 1))
        flatd = jnp.asarray(flat)
        accd = jnp.asarray(accept)

        step = pallas_fused.fused_scan_step(fmt, batch, S, 256, tile, 1)
        packed = np.asarray(
            step(bx1, by1, tx, ty, dfa_f32, acc_f32, jnp.int32(dev.start),
                 jnp.full((1,), batch, jnp.int32))
        )[0]

        x3, y3, valid = pipeline.jitted_points_step(256)(
            bx1[0], by1[0], tx, ty
        )
        ref = pipeline.jitted_format_tail(fmt)(
            x3, y3, valid, flatd, accd, jnp.int32(dev.start), jnp.int32(batch)
        )
        ref_count = int(np.asarray(ref.count))
        ref_idx = sorted(int(i) for i in np.asarray(ref.indices) if i >= 0)
        got_idx = sorted(int(i) for i in packed[2:18] if i >= 0)
        match = (int(packed[0]) == ref_count) and (got_idx == ref_idx)
        print(f"{fmt.value}: fused count={packed[0]} xla count={ref_count} "
              f"indices_equal={got_idx == ref_idx}")
        return match

    for fmt, pattern in _cases([
        (AddressFormat.P2PKH, "^1C"),
        (AddressFormat.P2PKH_UNCOMPRESSED, "^1A"),
        (AddressFormat.P2WPKH, "^bc1qq"),
        (AddressFormat.P2SH_P2WPKH, "^3J"),
        (AddressFormat.ETHEREUM, "^0x1[2Ff]"),
    ], nq=2):
        sections.append((
            f"fused-vs-xla:{fmt.value}",
            lambda fmt=fmt, pattern=pattern: _fused_vs_xla_case(fmt, pattern),
        ))

    return sections


def run_validation_detail(batch: int = 262144, tile: int = 512,
                          quick: bool = False,
                          deadline: float | None = None,
                          only: str | None = None) -> dict:
    """Run validation sections, optionally stopping at a wall-clock
    deadline (time.monotonic() value).  Returns
    {"passed": bool, "done": n, "total": m, "failed": [names],
    "sections": [{name, ok, secs}]} -- passed means every section that
    RAN passed; done < total means the deadline truncated the run.

    only: comma-separated substrings; keep sections whose name contains
    any of them (targeted re-runs after touching one kernel family)."""
    sections = build_sections(batch, tile, quick)
    if only:
        keys = [s.strip() for s in only.split(",") if s.strip()]
        sections = [
            (name, thunk) for name, thunk in sections
            if any(k in name for k in keys)
        ]
    done = 0
    failed = []
    results = []
    for name, thunk in sections:
        if deadline is not None and time.monotonic() >= deadline:
            break
        t0 = time.monotonic()
        try:
            ok = bool(thunk())
        except Exception as e:
            print(f"{name}: CRASH {e!r}")
            ok = False
        done += 1
        if not ok:
            failed.append(name)
        secs = time.monotonic() - t0
        results.append({"name": name, "ok": ok, "secs": round(secs, 1)})
        print(f"# section {name}: {secs:.1f}s "
              f"[{done}/{len(sections)}]", file=sys.stderr)
    return {
        "passed": not failed,
        "done": done,
        "total": len(sections),
        "failed": failed,
        "sections": results,
    }


def run_validation(batch: int = 262144, tile: int = 512,
                   quick: bool = False) -> bool:
    res = run_validation_detail(batch, tile, quick)
    return res["passed"] and res["done"] == res["total"]


if __name__ == "__main__":
    quick = os.environ.get("VGEN_VALIDATE_QUICK", "0") == "1"
    res = run_validation_detail(
        quick=quick, only=os.environ.get("VGEN_VALIDATE_ONLY")
    )
    out_path = os.environ.get("VGEN_VALIDATE_JSON")
    if out_path:
        import json

        import jax

        res_out = dict(res)
        res_out["device"] = jax.devices()[0].device_kind
        res_out["quick"] = quick
        with open(out_path, "w") as f:
            json.dump(res_out, f, indent=1)
    print(f"sections: {res['done']}/{res['total']} "
          f"failed={res['failed']}")
    print("PASS" if res["passed"] and res["done"] == res["total"] else "FAIL")
    sys.exit(0 if res["passed"] and res["done"] == res["total"] else 1)
