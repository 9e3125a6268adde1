"""Checkpoint/resume for range scans (the gap SURVEY.md §5 flags: the
reference never persists scan position)."""

import json
import threading

import pytest

from vgen_tpu import native
from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.pattern import Pattern
from vgen_tpu.scan.checkpoint import CheckpointManager
from vgen_tpu.scan.scanner import ScanConfig, StopFlag, scan_with_progress

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native scanner unavailable"
)


def _mgr(path, start=0x100, end=0x4000, pattern="^1B"):
    return CheckpointManager(
        str(path), pattern=pattern, fmt="p2pkh", start=start, end=end,
        save_interval_secs=0.0,
    )


def test_checkpoint_roundtrip(tmp_path):
    p = tmp_path / "ck.json"
    m = _mgr(p)
    m.advance(0x1234, 999, [0x111, 0x222], force=True)
    m2 = _mgr(p)
    state = m2.load()
    assert state == {
        "next_key": 0x1234,
        "operations": 999,
        "match_keys": [0x111, 0x222],
    }


def test_checkpoint_rejects_mismatched_params(tmp_path):
    p = tmp_path / "ck.json"
    _mgr(p).advance(0x1234, 1, [], force=True)
    assert _mgr(p, pattern="^1C").load() is None
    assert _mgr(p, end=0x5000).load() is None


def test_checkpoint_file_is_json(tmp_path):
    p = tmp_path / "ck.json"
    _mgr(p).advance(0x300, 5, [0x123], force=True)
    data = json.loads(p.read_text())
    assert data["next_key"] == "0x300"
    assert data["matches"] == ["0x123"]


def test_scan_resume_completes_range(tmp_path):
    """Interrupt a range scan, resume it, and get the same matches as an
    uninterrupted run."""
    pat = Pattern("^1B")
    start, end = 0x100, 0x3000

    # ground truth: uninterrupted scan of the whole range
    full = scan_with_progress(
        pat,
        ScanConfig(
            format=AddressFormat.P2PKH, count=0, use_device=False,
            start=start, end=end, cpu_batch_size=4096,
        ),
    )
    expected = sorted(m.address for m in full.matches)
    assert expected  # ^1B occurs plenty in 0x2f00 keys

    # interrupted scan with checkpoint
    ckpath = tmp_path / "scan.json"
    stop = StopFlag()
    cfg = ScanConfig(
        format=AddressFormat.P2PKH, count=0, use_device=False,
        start=start, end=end, cpu_batch_size=4096,
        checkpoint=_mgr(ckpath, start, end),
    )

    calls = {"n": 0}

    def cb(ops):
        calls["n"] += 1
        if calls["n"] >= 1:
            stop.set()  # stop after the first chunk

    partial = scan_with_progress(pat, cfg, cb, stop)
    assert partial.operations < full.operations

    # resume to completion
    cfg2 = ScanConfig(
        format=AddressFormat.P2PKH, count=0, use_device=False,
        start=start, end=end, cpu_batch_size=4096,
        checkpoint=_mgr(ckpath, start, end),
    )
    resumed = scan_with_progress(pat, cfg2)
    assert resumed.operations == full.operations
    assert sorted(m.address for m in resumed.matches) == expected


def test_cli_checkpoint_flag(tmp_path, capsys):
    from vgen_tpu.cli import run_from_args

    ck = tmp_path / "c.json"
    rc = run_from_args(
        ["range", "--range", "100:2000", "-p", "^1B", "--no-tui", "--no-gpu",
         "-c", "0", "-o", "minimal", "--checkpoint", str(ck)]
    )
    assert rc == 0
    data = json.loads(ck.read_text())
    assert int(data["next_key"], 16) == 0x2001
    out1 = capsys.readouterr().out.strip().splitlines()

    # re-running resumes at the end: no rescan, matches replayed from file
    rc = run_from_args(
        ["range", "--range", "100:2000", "-p", "^1B", "--no-tui", "--no-gpu",
         "-c", "0", "-o", "minimal", "--checkpoint", str(ck)]
    )
    assert rc == 0
    out2 = capsys.readouterr().out.strip().splitlines()
    assert out1 == out2
