"""Benchmark: P2PKH regex scan rate on the local accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "keys/s", "vs_baseline": N/2e6}

Baseline: the reference's best-case GPU rate of 2M keys/s (README.md:176,
BASELINE.md).  Config mirrors BASELINE.json's headline: P2PKH prefix scan
"^1C" -- full keygen -> hash160 -> Base58Check -> regex pipeline per key.

Deadline-managed (VERDICT r3 item 1: the round-3 run timed out inside the
validation gate and produced NO number).  All work runs on a daemon worker
thread; the main thread enforces VGEN_BENCH_DEADLINE (seconds, default 780)
and ALWAYS emits the JSON line -- with the measured rate and
validated="partial:n/m" if validation was truncated, or value 0 plus an
error field if even the measurement did not finish.  SIGTERM triggers the
same early emit, so an external `timeout` still yields a parsable line.
Stage wall-times go to stderr so any future truncation is diagnosable.

Env knobs: VGEN_BENCH_BATCH (default 524288), VGEN_BENCH_SECONDS (default
10), VGEN_BENCH_PATTERN (default "^1C"), VGEN_BENCH_CHAIN (default 1024),
VGEN_BENCH_KSUB (default 16; round-5 sweep: 653.5 vs 650.0 Mkeys/s at 8),
VGEN_BENCH_VALIDATE (1 default / 0 / full),
VGEN_BENCH_DEADLINE (default 780).
"""

import json
import os
import signal
import sys
import threading
import time


STATE = {
    "stage": "init",
    "value": 0.0,
    "validated": None,  # None (not attempted) / dict from validate_fused
    "error": None,
    "detail": "",
    "done": False,
}
EMITTED = threading.Event()


def emit():
    """Print the single JSON line (exactly once).

    Written straight to file descriptor 1: the validation stage runs the
    worker under contextlib.redirect_stdout(sys.stderr) (its prints are
    progress, not the result), and redirect_stdout swaps the GLOBAL
    sys.stdout -- a SIGTERM landing mid-validation would otherwise send
    this line to stderr where the driver's stdout parse cannot see it
    (observed round 5: the 650 M line ended up in the stderr log)."""
    if EMITTED.is_set():
        return
    EMITTED.set()
    out = {
        "metric": "keys/sec/chip (P2PKH regex scan)",
        "value": STATE["value"],
        "unit": "keys/s",
        "vs_baseline": STATE["value"] / 2_000_000.0,
    }
    v = STATE["validated"]
    if v is not None:
        if v["done"] < v["total"]:
            out["validated"] = (
                f"partial:{v['done']}/{v['total']}"
                + ("" if v["passed"] else ":FAIL")
            )
        else:
            out["validated"] = v["passed"]
    err = STATE["error"]
    if err is None and STATE["value"] == 0:
        err = f"benchmark did not complete (stage={STATE['stage']})"
    if err is not None:
        out["error"] = err
    os.write(1, (json.dumps(out) + "\n").encode())
    if STATE["detail"]:
        print(STATE["detail"], file=sys.stderr)


def stage(name):
    STATE["stage"] = name
    STATE["t_stage"] = time.monotonic()
    print(f"# stage {name} ...", file=sys.stderr, flush=True)


def stage_done(name):
    dt = time.monotonic() - STATE.get("t_stage", time.monotonic())
    print(f"# stage {name}: {dt:.1f}s", file=sys.stderr, flush=True)


def worker(deadline: float):
    os.environ.setdefault("VGEN_TPU_CACHE", os.path.expanduser("~/.cache/vgen_tpu"))
    try:
        stage("import-jax")
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.environ["VGEN_TPU_CACHE"], "jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        stage_done("import-jax")

        batch = int(os.environ.get("VGEN_BENCH_BATCH", 524_288))
        seconds = float(os.environ.get("VGEN_BENCH_SECONDS", 10))
        pattern = os.environ.get("VGEN_BENCH_PATTERN", "^1C")
        chain = int(os.environ.get("VGEN_BENCH_CHAIN", 1024))
        k_sub = int(os.environ.get("VGEN_BENCH_KSUB", 16))

        # a dead TPU runtime HANGS in backend init rather than raising;
        # the main thread's deadline turns that into an honest error line
        stage("device-probe")
        n_dev = len(jax.devices())
        platform = jax.devices()[0].platform
        stage_done("device-probe")
        print(f"# devices: {n_dev} x {jax.devices()[0].device_kind}",
              file=sys.stderr, flush=True)

        # MEASURE FIRST (round-3 lesson: a truncated run must still carry
        # a rate).  The scan warmup compiles the same kernels the product
        # scan uses; the persistent cache makes later runs fast.
        stage("measure")
        from vgen_tpu.crypto.address import AddressFormat
        from vgen_tpu.scan.scanner import benchmark_device

        stats = benchmark_device(
            AddressFormat.P2PKH,
            pattern_str=pattern,
            batch_size=batch,
            min_seconds=seconds,
            chain_len=chain,
            k_sub=k_sub,
        )
        STATE["value"] = stats["keys_per_sec"]
        STATE["detail"] = (
            f"# device={jax.devices()[0].device_kind} batch={batch} "
            f"ops={stats['operations']} elapsed={stats['elapsed']:.2f}s"
        )
        stage_done("measure")

        # Correctness gate: on-device oracle validation of the fused
        # kernels BEFORE the rate is final -- a fast wrong kernel must not
        # produce a bench win.  Runs sections until the deadline margin.
        validate = os.environ.get("VGEN_BENCH_VALIDATE", "1")
        if validate != "0" and platform != "cpu":
            stage("validate")
            import contextlib

            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from scripts.validate_fused import run_validation_detail

            # keep stdout to the single JSON line; progress -> stderr
            with contextlib.redirect_stdout(sys.stderr):
                STATE["validated"] = run_validation_detail(
                    batch=262144,
                    quick=validate != "full",
                    deadline=deadline - 20.0,
                )
            stage_done("validate")
    except Exception as e:  # pragma: no cover
        STATE["error"] = f"{type(e).__name__}: {e}"
    finally:
        STATE["done"] = True


def main():
    budget = float(os.environ.get("VGEN_BENCH_DEADLINE", "780"))
    deadline = time.monotonic() + budget

    def on_term(signum, frame):
        print(f"# signal {signum}: emitting early", file=sys.stderr,
              flush=True)
        emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    th = threading.Thread(target=worker, args=(deadline,), daemon=True)
    th.start()
    while not STATE["done"] and time.monotonic() < deadline:
        time.sleep(0.5)
    if not STATE["done"]:
        print(f"# deadline ({budget:.0f}s) hit in stage "
              f"{STATE['stage']}", file=sys.stderr, flush=True)
    emit()
    # the worker may be stuck in a device call; don't wait for it
    os._exit(0)


if __name__ == "__main__":
    main()
