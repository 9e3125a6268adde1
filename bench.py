"""Benchmark: P2PKH regex scan rate on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "keys/s", "vs_baseline": N/2e6}

Baseline: the reference's best-case GPU rate of 2M keys/s (README.md:176,
BASELINE.md).  Config mirrors BASELINE.json's headline: P2PKH prefix scan
"^1C" -- full keygen -> hash160 -> Base58Check -> regex pipeline per key.

Env knobs: VGEN_BENCH_BATCH (default 524288), VGEN_BENCH_SECONDS (default 10),
VGEN_BENCH_PATTERN (default "^1C").
"""

import json
import os
import sys
import time


def main():
    os.environ.setdefault("VGEN_TPU_CACHE", os.path.expanduser("~/.cache/vgen_tpu"))
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.environ["VGEN_TPU_CACHE"], "jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    batch = int(os.environ.get("VGEN_BENCH_BATCH", 524_288))
    seconds = float(os.environ.get("VGEN_BENCH_SECONDS", 10))
    pattern = os.environ.get("VGEN_BENCH_PATTERN", "^1C")
    chain = int(os.environ.get("VGEN_BENCH_CHAIN", 1024))
    k_sub = int(os.environ.get("VGEN_BENCH_KSUB", 8))

    # a dead TPU runtime HANGS in backend init rather than raising; probe
    # with a deadline so the driver gets an honest JSON line either way
    import threading

    probe: dict = {}

    def _probe():
        try:
            probe["n"] = len(jax.devices())
        except Exception as e:
            probe["error"] = repr(e)

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(float(os.environ.get("VGEN_TPU_DEVICE_TIMEOUT", "300")))
    if "n" not in probe:
        print(
            json.dumps(
                {
                    "metric": "keys/sec/chip (P2PKH regex scan)",
                    "value": 0,
                    "unit": "keys/s",
                    "vs_baseline": 0.0,
                    "error": probe.get(
                        "error", "device init timed out (TPU unreachable)"
                    ),
                }
            )
        )
        return

    from vgen_tpu.crypto.address import AddressFormat
    from vgen_tpu.scan.scanner import benchmark_device

    t0 = time.time()

    # Correctness gate: on-device oracle validation of the fused kernels
    # (all formats, intervals, GLV, EIP-55 casing, P2TR ladder) BEFORE the
    # rate is reported -- a fast wrong kernel must not produce a bench win.
    validated = None
    if (
        os.environ.get("VGEN_BENCH_VALIDATE", "1") != "0"
        and jax.devices()[0].platform != "cpu"
    ):
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import contextlib

            from scripts.validate_fused import run_validation

            # keep stdout to the single JSON line; progress goes to stderr.
            # quick=1 (default): one format per path section (~5 min warm
            # through the device tunnel); VGEN_BENCH_VALIDATE=full runs the
            # whole matrix (~25 min)
            quick = os.environ.get("VGEN_BENCH_VALIDATE", "1") != "full"
            with contextlib.redirect_stdout(sys.stderr):
                validated = bool(run_validation(batch=262144, quick=quick))
        except Exception as e:  # pragma: no cover
            print(f"# validation crashed: {e!r}", file=sys.stderr)
            validated = False
        print(f"# fused-kernel validation: "
              f"{'PASS' if validated else 'FAIL'}", file=sys.stderr)

    stats = benchmark_device(
        AddressFormat.P2PKH,
        pattern_str=pattern,
        batch_size=batch,
        min_seconds=seconds,
        chain_len=chain,
        k_sub=k_sub,
    )
    rate = stats["keys_per_sec"]
    out = {
        "metric": "keys/sec/chip (P2PKH regex scan)",
        "value": rate,
        "unit": "keys/s",
        "vs_baseline": rate / 2_000_000.0,
    }
    if validated is not None:
        out["validated"] = validated
    print(json.dumps(out))
    print(
        f"# device={jax.devices()[0].device_kind} batch={batch} "
        f"ops={stats['operations']} elapsed={stats['elapsed']:.2f}s "
        f"total_wall={time.time()-t0:.1f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
