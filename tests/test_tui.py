"""TUI tests: drive the curses draw loop against a fake screen.

The draw loop is pure curses-API calls; injecting a fake stdscr (and
no-op'ing the curses init/color functions) exercises the real wiring:
stats rendering, match list, sparkline, and the q-to-quit stop-flag
propagation into a running scan.  (The reference's ratatui TUI has no
tests at all, lib.rs:1099-1556.)
"""

from __future__ import annotations

import pytest

from vgen_tpu.crypto.address import AddressFormat
from vgen_tpu.pattern import Pattern
from vgen_tpu.scan.scanner import ScanConfig, StopFlag
from vgen_tpu import tui


class FakeScreen:
    """Minimal curses-screen stand-in recording every drawn string."""

    def __init__(self, keys=()):
        self.keys = list(keys)
        self.calls = 0
        self.drawn = []  # (y, x, s) of every addnstr

    def nodelay(self, flag):
        pass

    def erase(self):
        pass

    def getmaxyx(self):
        return (40, 120)

    def addnstr(self, y, x, s, n, attr=0):
        self.drawn.append((y, x, s))

    def refresh(self):
        pass

    def getch(self):
        self.calls += 1
        if self.keys:
            return self.keys.pop(0)
        if self.calls > 600:  # safety: force-quit a stuck loop
            return ord("q")
        return -1

    def text(self) -> str:
        return "\n".join(s for _, _, s in self.drawn)


@pytest.fixture
def fake_curses(monkeypatch):
    def wrap(screen):
        monkeypatch.setattr(tui.curses, "wrapper", lambda f: f(screen))
        monkeypatch.setattr(tui.curses, "curs_set", lambda *_: None)
        monkeypatch.setattr(tui.curses, "start_color", lambda: None)
        monkeypatch.setattr(tui.curses, "use_default_colors", lambda: None)
        monkeypatch.setattr(tui.curses, "init_pair", lambda *_: None)
        monkeypatch.setattr(tui.curses, "color_pair", lambda *_: 0)
        return screen

    return wrap


def test_tui_renders_stats_and_match(fake_curses):
    """A trivially-satisfiable CPU scan under the TUI: the result must come
    back through run_tui and the final frames must show the stats block and
    the found match (address + WIF)."""
    screen = fake_curses(FakeScreen())
    config = ScanConfig(
        format=AddressFormat.P2PKH, count=1, use_device=False,
        cpu_batch_size=512,
    )
    res = tui.run_tui(Pattern("^1"), config, StopFlag())
    assert len(res.matches) == 1
    text = screen.text()
    assert "VGEN-TPU" in text
    assert "Pattern: ^1" in text
    assert "Hashrate:" in text
    assert "Search complete." in text
    assert "MATCH #1" in text
    assert res.matches[0].address in text
    assert res.matches[0].wif in text


def test_tui_quit_key_stops_search(fake_curses):
    """'q' must set the stop flag and end an unbounded search promptly."""
    screen = fake_curses(FakeScreen(keys=[-1, ord("q")]))
    config = ScanConfig(
        format=AddressFormat.P2PKH, count=1, use_device=False,
        cpu_batch_size=256,
    )
    stop = StopFlag()
    res = tui.run_tui(Pattern("^1ZZZZZZZZZZZZZZ"), config, stop)
    assert stop.is_set()
    assert res.matches == []
    assert "Q: quit" in screen.text()


def test_tui_luck_indicator(fake_curses):
    """The luck line renders once ops > 0 on a random (difficulty > 0)
    search."""
    screen = fake_curses(FakeScreen())
    config = ScanConfig(
        format=AddressFormat.P2PKH, count=1, use_device=False,
        cpu_batch_size=512,
    )
    tui.run_tui(Pattern("^1"), config, StopFlag())
    assert "Luck:" in screen.text()


def test_sparkline_shape():
    assert tui._sparkline([], 10) == ""
    s = tui._sparkline([0.0, 0.5, 1.0], 10)
    assert len(s) == 3
    assert s[-1] == "█"
    # zero rates render as blanks, not a crash
    assert tui._sparkline([0.0, 0.0], 5) == "  "
