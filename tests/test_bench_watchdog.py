"""bench.py deadline watchdog: the driver runs `python bench.py` and parses
exactly one JSON line. The harness tunnel has been observed to hang
indefinitely on a single RPC, so a watchdog prints whatever legs completed
(plus the in-flight leg's name) when MEDMOE_BENCH_DEADLINE_S expires.
These tests drive the watchdog machinery directly (no device work)."""

import json
import sys
import time

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench

    # isolate module-level state between tests
    monkeypatch.setattr(bench, "_PARTIAL", {})
    monkeypatch.setattr(bench, "_STAGE", ["startup"])
    monkeypatch.setattr(bench, "_WATCHDOG", [])
    monkeypatch.setattr(bench, "_EMITTED", [False])
    return bench


def test_fire_emits_partial_json(bench_mod, monkeypatch, capsys):
    bench = bench_mod
    monkeypatch.setenv("MEDMOE_BENCH_DEADLINE_S", "0.05")
    bench._PARTIAL["b32_value"] = 123.0
    bench._PARTIAL["ddp_value"] = 456.0
    bench._STAGE[0] = "unit-test leg"
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    bench._watchdog_start()
    deadline = time.time() + 5.0
    while not exits and time.time() < deadline:
        time.sleep(0.02)
    assert exits == [0]     # legs existed -> success exit
    out = capsys.readouterr().out.strip()
    parsed = json.loads(out)            # exactly one parseable JSON line
    assert parsed["value"] == 456.0     # headline prefers the ddp leg
    assert parsed["unit"] == "pairs/sec/chip"
    assert parsed["b32_value"] == 123.0
    assert "vs_baseline" in parsed and "baseline_method" in parsed
    assert "unit-test leg" in parsed["deadline_note"]


def test_fire_with_no_legs_exits_nonzero(bench_mod, monkeypatch, capsys):
    bench = bench_mod
    monkeypatch.setenv("MEDMOE_BENCH_DEADLINE_S", "0.05")
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    bench._watchdog_start()
    deadline = time.time() + 5.0
    while not exits and time.time() < deadline:
        time.sleep(0.02)
    assert exits == [2]     # nothing measured -> failure exit
    parsed = json.loads(capsys.readouterr().out.strip())
    assert parsed["value"] == 0.0


def test_cancel_suppresses_fire(bench_mod, monkeypatch, capsys):
    bench = bench_mod
    monkeypatch.setenv("MEDMOE_BENCH_DEADLINE_S", "0.1")
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    bench._watchdog_start()
    bench._watchdog_cancel()
    time.sleep(0.3)
    assert exits == []
    assert capsys.readouterr().out == ""


def test_disabled_by_nonpositive_deadline(bench_mod, monkeypatch):
    bench = bench_mod
    monkeypatch.setenv("MEDMOE_BENCH_DEADLINE_S", "0")
    bench._watchdog_start()
    assert bench._WATCHDOG == []


def test_emit_once_first_writer_wins(bench_mod, capsys):
    """Timer.cancel() is a no-op once _fire has started, so the watchdog
    and main()'s final print race at the deadline boundary — _emit_once is
    the arbiter: exactly one JSON line, first writer wins."""
    bench = bench_mod
    assert bench._emit_once({"value": 1.0}) is True
    assert bench._emit_once({"value": 2.0}) is False     # already printed
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 1.0


def test_fire_after_main_emitted_does_not_exit(bench_mod, monkeypatch,
                                               capsys):
    """If main() prints the real line just as the deadline expires, the
    in-flight _fire must neither print a second line nor os._exit."""
    bench = bench_mod
    monkeypatch.setenv("MEDMOE_BENCH_DEADLINE_S", "0.05")
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    bench._emit_once({"value": 42.0})          # main() won the race
    bench._watchdog_start()
    time.sleep(0.4)                            # let the timer fire
    assert exits == []
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1 and json.loads(lines[0])["value"] == 42.0
