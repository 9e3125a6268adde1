"""Validate + benchmark the fused Pallas path under a device mesh on the
real chip.

The MeshScanner routes accelerator meshes through the same fused Pallas
kernels as the single-chip DeviceScanner (parallel/mesh.py
_sharded_fused_step).  This script checks, on the real TPU:

1. correctness: a known key is found through the mesh on the fused interval
   path, the fused DFA path, and the GLV random path;
2. rate: mesh-mode throughput on this 1-chip mesh vs the single-chip
   DeviceScanner fused rate (VERDICT r1 asks for within ~10%).

Writes a JSON summary to MESH_FUSED.json at the repo root.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/vgen_tpu/jaxcache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from vgen_tpu.crypto.address import AddressFormat, AddressGenerator
from vgen_tpu.parallel.mesh import MeshScanner, make_mesh
from vgen_tpu.pattern import Pattern
from vgen_tpu.scan.scanner import (
    CHAIN_LEN, DEFAULT_DEVICE_BATCH, DeviceScanner, ScanConfig, StopFlag,
)

SECS = float(os.environ.get("SECS", 8))
B = int(os.environ.get("B", DEFAULT_DEVICE_BATCH))
# never-match: the rate phase runs count=10**9, and a matching pattern
# floods the host drain with millions of derivations (observed round 5:
# the ^1C default burned 25+ CPU-minutes without finishing a super-batch
# comparison).  Mesh-vs-single overhead is pattern-independent.
PAT = os.environ.get("VGEN_BENCH_PATTERN", "^1CBenchNeverMatchesXx")

out = {"n_devices": len(jax.devices())}
mesh = make_mesh(jax.devices())

# --- correctness: small-batch mesh scans must find a planted key ---------
SKIP_CORRECTNESS = os.environ.get("SKIP_CORRECTNESS", "0") == "1"
gen = AddressGenerator(AddressFormat.P2PKH)
key = 0xC0FFEE
addr = gen.generate(key.to_bytes(32, "big")).address
if not SKIP_CORRECTNESS:
    small = MeshScanner(AddressFormat.P2PKH, 2048, chain_len=256, mesh=mesh)

    res = small.scan(Pattern(f"^{re.escape(addr)}$"), count=1,
                     start=key - 1500, end=key + 500)
    assert [m.hex for m in res.matches] == [key.to_bytes(32, "big").hex()], (
        "fused interval path missed the planted key", res.matches)
    out["interval_found"] = True
    print(f"mesh fused interval path: found {addr} OK")

    # DFA path: a character class defeats interval compilation
    prefix = addr[:5]
    res = small.scan(Pattern(f"^{prefix[:4]}[{prefix[4]}]"), count=0,
                     start=key - 1500, end=key + 500)
    assert any(m.hex == key.to_bytes(32, "big").hex() for m in res.matches), (
        "fused DFA path missed the planted key", res.matches)
    out["dfa_found"] = True
    print(f"mesh fused DFA path: found {addr} among {len(res.matches)} OK")

    # GLV random path: scan until one ^1C match arrives
    res = small.scan(Pattern("^1C"), count=1)
    assert res.matches and res.matches[0].address.startswith("1C")
    out["glv_found"] = True
    print(f"mesh fused GLV path: found {res.matches[0].address} OK")


# --- rate: mesh-mode vs single-chip DeviceScanner ------------------------
def timed_rate(scan_fn):
    stop = StopFlag()
    t0 = time.time()

    def cb(ops):
        if time.time() - t0 >= SECS:
            stop.set()

    res = scan_fn(stop, cb)
    return res.rate()


pat = Pattern(PAT)
ms = MeshScanner(AddressFormat.P2PKH, B, chain_len=CHAIN_LEN, mesh=mesh)
# warmup (compile)
ws = StopFlag()
# in_flight=4 matches the product default (ScanConfig.in_flight) -- the
# scan() signature default of 2 measured 0.68x of single-chip purely from
# pipeline depth at the round-5 step rate, not from mesh overhead
ms.scan(pat, count=10**9, stop_flag=ws, max_super_batches=3, in_flight=4)
mesh_rate = timed_rate(lambda stop, cb: ms.scan(
    pat, count=10**9, stop_flag=stop, progress_callback=cb, in_flight=4))
print(f"mesh rate     : {mesh_rate/1e6:.1f} Mkeys/s "
      f"({len(jax.devices())} device(s))")

ds = DeviceScanner(AddressFormat.P2PKH, B, chain_len=CHAIN_LEN)
cfg = ScanConfig(format=AddressFormat.P2PKH, count=10**9,
                 device_batch_size=B)
ws = StopFlag()
ops_seen = {"n": 0}


def wcb(ops):
    ops_seen["n"] = ops
    if ops >= 2 * 6 * 8 * B:
        ws.set()


ds.scan(pat, cfg, wcb, ws)
single_rate = timed_rate(lambda stop, cb: ds.scan(pat, cfg, cb, stop))
print(f"single rate   : {single_rate/1e6:.1f} Mkeys/s")

out["mesh_keys_per_sec"] = mesh_rate
out["single_keys_per_sec"] = single_rate
out["mesh_vs_single"] = mesh_rate / single_rate if single_rate else 0.0
out["batch"] = B
out["pattern"] = PAT
print(f"mesh/single   : {out['mesh_vs_single']:.3f}")

with open(os.path.join(os.path.dirname(__file__), "..",
                       "MESH_FUSED.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
