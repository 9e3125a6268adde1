"""Native C++ CPU scanner: conformance against the Python oracle.

Mirrors the reference's implicit GPU-correctness strategy (SURVEY.md §4):
every native result is checked against an independent implementation."""

import secrets

import pytest

from vgen_tpu import native
from vgen_tpu.crypto.address import AddressFormat, AddressGenerator
from vgen_tpu.pattern import Pattern

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}"
)

ALL_FORMATS = [
    "p2pkh", "p2pkh-uncompressed", "p2wpkh", "p2sh-p2wpkh", "p2tr", "ethereum"
]


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_native_derivation_matches_oracle(fmt):
    gen = AddressGenerator(AddressFormat(fmt))
    for _ in range(10):
        k = secrets.randbelow(2**256 - 2**33) + 1
        expected = gen.generate(k.to_bytes(32, "big")).address
        assert native.derive_address(k, fmt) == expected


def test_native_derivation_key1():
    # the canonical key-1 known-answer vector (reference address.rs tests)
    assert (
        native.derive_address(1, "p2pkh")
        == "1BgGZ9tcN4rm9KBzDn7KprQz87SZ26SAMH"
    )
    assert (
        native.derive_address(1, "p2wpkh")
        == "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4"
    )
    assert (
        native.derive_address(1, "ethereum")
        == "0x7E5F4552091A69125d5DfCb7b8C2659029395Bdf"
    )


def test_native_scan_window_exact():
    from vgen_tpu.pattern.redfa import compile_dfa

    sc = native.NativeScanner(batch=256)
    dfa = compile_dfa("^1C")
    gen = AddressGenerator(AddressFormat.P2PKH)
    start, count = 0xDEAD0000, 1024
    expected = [
        start + i
        for i in range(count)
        if gen.generate((start + i).to_bytes(32, "big")).address.startswith(
            "1C"
        )
    ]
    keys, ops = sc.scan(start, count, "p2pkh", dfa, n_threads=2)
    assert ops == count
    assert keys == expected


def test_native_scan_case_insensitive():
    from vgen_tpu.pattern.redfa import compile_dfa

    sc = native.NativeScanner(batch=256)
    dfa = compile_dfa("^1c", ignore_case=True)
    gen = AddressGenerator(AddressFormat.P2PKH)
    start, count = 0xBEEF0000, 512
    expected = [
        start + i
        for i in range(count)
        if gen.generate((start + i).to_bytes(32, "big"))
        .address.lower()
        .startswith("1c")
    ]
    keys, _ = sc.scan(start, count, "p2pkh", dfa, n_threads=1)
    assert keys == expected


def test_native_cpu_scanner_integration():
    from vgen_tpu.pattern import Pattern
    from vgen_tpu.scan.scanner import ScanConfig, scan_with_progress

    cfg = ScanConfig(
        format=AddressFormat.P2PKH,
        count=2,
        use_device=False,
        start=0x100,
        end=0x2000,
    )
    res = scan_with_progress(Pattern("^1B"), cfg)
    assert len(res.matches) == 2
    assert all(m.address.startswith("1B") for m in res.matches)
    # deterministic: lowest matching keys in the range
    ks = [int(m.hex, 16) for m in res.matches]
    assert ks == sorted(ks)


def test_native_stop_flag():
    import threading
    import time

    from vgen_tpu.pattern import Pattern
    from vgen_tpu.scan.scanner import ScanConfig, StopFlag, scan_with_progress

    stop = StopFlag()
    cfg = ScanConfig(
        format=AddressFormat.P2PKH, count=1, use_device=False,
        cpu_batch_size=65536,
    )
    timer = threading.Timer(0.5, stop.set)
    timer.start()
    t0 = time.time()
    res = scan_with_progress(
        Pattern("^1NeverEverMatchesAnything"), cfg, None, stop
    )
    assert time.time() - t0 < 10
    assert res.matches == []
    timer.cancel()


def test_native_scan_doubling_degenerate_key():
    """The C++ batch add's dx==0 slot (key == 2*base) must be recomputed
    via jac_double, not derived from the garbage masked point."""
    import re

    from vgen_tpu.pattern.redfa import compile_dfa

    key = 4  # scan starts at base 2 -> degenerate slot j == 2 -> key 4
    addr = AddressGenerator(AddressFormat.P2PKH).generate(
        key.to_bytes(32, "big")
    ).address
    sc = native.NativeScanner(batch=1024)
    dfa = compile_dfa(f"^{re.escape(addr)}$")
    found, ops = sc.scan(2, 1024, "p2pkh", dfa)
    assert ops == 1024
    assert key in found


def test_native_random_scan_draws_fresh_window_per_chunk(monkeypatch):
    """The native random scan draws a fresh uniform START per chunk
    (sequential inside; scanner.rs:128-145 draws per key -- equivalent hit
    distribution for uniformly-hashed targets, and documented as such).
    Verify successive chunks are NOT contiguous continuations."""
    import vgen_tpu.scan.scanner as sc
    from vgen_tpu import native

    if not native.available():
        pytest.skip("native scanner unavailable")

    starts = []
    real_scan = native.NativeScanner.scan

    def spy(self, start, n, fmt, dfa, **kw):
        starts.append(start)
        return real_scan(self, start, n, fmt, dfa, **kw)

    monkeypatch.setattr(native.NativeScanner, "scan", spy)
    stop = sc.StopFlag()
    seen = {"n": 0}

    def cb(ops):
        seen["n"] += 1
        if seen["n"] >= 3:
            stop.set()

    sc._scan_cpu_native(
        Pattern("^1NeverMatchesAnything"),
        sc.ScanConfig(use_device=False, cpu_batch_size=8192, count=1),
        cb, stop,
    )
    assert len(starts) >= 3
    gaps = [starts[i + 1] - (starts[i] + 8192) for i in range(2)]
    # contiguous continuation would make every gap exactly 0
    assert any(g != 0 for g in gaps), starts


@pytest.mark.parametrize("fmt", ALL_FORMATS)
def test_native_bulk_derive_matches_single(fmt):
    """derive_addresses == derive_address per key, in order, across the
    threaded chunking (n > 64 exercises multiple C++ threads)."""
    keys = [secrets.randbelow(2**256 - 2**33) + 1 for _ in range(130)]
    keys += [1, 2, 3]  # known-answer smalls
    bulk = native.derive_addresses(keys, fmt)
    assert bulk is not None and len(bulk) == len(keys)
    for k, addr in zip(keys[:8] + keys[-3:], bulk[:8] + bulk[-3:]):
        assert addr == native.derive_address(k, fmt)


def test_native_bulk_derive_empty_and_threads():
    assert native.derive_addresses([], "p2pkh") == []
    keys = [5, 6, 7]
    assert native.derive_addresses(keys, "p2pkh", n_threads=2) == [
        native.derive_address(k, "p2pkh") for k in keys
    ]


def test_bulk_derive_checked_matches_per_key():
    """_derive_checked_bulk yields the same (key, address) stream as
    per-key _derive_checked, including out-of-range keys -> None."""
    from vgen_tpu.crypto import secp256k1 as ec
    from vgen_tpu.scan.scanner import _derive_checked, _derive_checked_bulk

    fmt = AddressFormat.P2PKH
    gen = AddressGenerator(fmt)
    keys = [1, 2, ec.N - 1, ec.N, 0, secrets.randbelow(ec.N - 2) + 1]
    bulk = list(_derive_checked_bulk(keys, fmt, gen))
    assert [k for k, _ in bulk] == keys
    for k, ga in bulk:
        single = _derive_checked(k, fmt, gen)
        if single is None:
            assert ga is None
        else:
            assert ga is not None and ga.address == single.address
            assert ga.wif == single.wif
