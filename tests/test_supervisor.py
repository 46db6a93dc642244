"""Watchdog/auto-resume test: a deliberately-injected stall recovers
with zero human action (VERDICT r3 next #7).

Runs the real supervisor (scripts/train_supervisor.py) over a tiny CPU
train, SIGSTOPs the child mid-run to fake a wedged device call, and
asserts the supervisor (a) detects the stall, (b) kills the exact
process group, (c) relaunches, and (d) the relaunched child resumes
from the compact snapshot and keeps training.
"""

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

ROOT = pathlib.Path(__file__).parent.parent


def _events(path):
    if not path.exists():
        return []
    return [json.loads(l) for l in path.read_text().splitlines() if l]


@pytest.mark.slow
def test_stall_injection_recovers(tmp_path):
    workdir = tmp_path / "work"
    log = tmp_path / "train.log"
    sup = subprocess.Popen(
        [sys.executable, str(ROOT / "scripts" / "train_supervisor.py"),
         "--cpu", "--duration", "600", "--stall-s", "20",
         "--startup-stall-s", "300", "--poll-s", "2", "--nice", "0",
         "--workdir", str(workdir), "--log", str(log), "--",
         "--epochs", "1000000", "--batch", "8", "--table-log2", "12",
         "--flush-min", "0.05"],
        cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    events_path = workdir / "supervisor.jsonl"
    try:
        # wait for launch + first snapshot + first metrics line
        deadline = time.time() + 420
        child_pid = None
        while time.time() < deadline:
            ev = _events(events_path)
            launches = [e for e in ev if e["kind"] == "launch"]
            if launches:
                child_pid = launches[0]["pid"]
            if (child_pid is not None
                    and (workdir / "blueprint_compact.npz").exists()
                    and log.exists() and b'"uptime_s"' in log.read_bytes()):
                break
            time.sleep(2)
        assert child_pid is not None, f"no launch event: {_events(events_path)}"
        assert (workdir / "blueprint_compact.npz").exists(), \
            "no snapshot before stall injection"

        # inject the stall: freeze the child (simulates a wedged device
        # call — the process is alive but makes no progress and cannot
        # service SIGTERM's graceful path promptly)
        os.kill(child_pid, signal.SIGSTOP)

        deadline = time.time() + 240
        while time.time() < deadline:
            ev = _events(events_path)
            if any(e["kind"] == "stall_kill" for e in ev):
                break
            time.sleep(2)
        ev = _events(events_path)
        assert any(e["kind"] == "stall_kill" for e in ev), \
            f"stall not detected: {ev}"

        # the relaunched child must resume from compact and progress
        deadline = time.time() + 420
        relaunched = False
        while time.time() < deadline:
            ev = _events(events_path)
            launches = [e for e in ev if e["kind"] == "launch"]
            if len(launches) >= 2:
                relaunched = True
                pid2 = launches[-1]["pid"]
                if pid2 != child_pid and b"resumed compact blueprint" \
                        in log.read_bytes():
                    break
            time.sleep(2)
        assert relaunched, f"no relaunch: {_events(events_path)}"
        assert b"resumed compact blueprint" in log.read_bytes(), \
            "relaunched child did not resume from the compact snapshot"
        # the frozen first child must actually be gone (exact-pgid kill)
        with pytest.raises(ProcessLookupError):
            os.kill(child_pid, 0)
    finally:
        sup.terminate()
        try:
            sup.wait(timeout=20)
        except subprocess.TimeoutExpired:
            sup.kill()
            sup.wait()
        # reap any child train the supervisor left behind (exact pids
        # from its own event log — never pattern kills)
        for e in _events(events_path):
            if e["kind"] == "launch":
                try:
                    os.killpg(os.getpgid(e["pid"]), signal.SIGKILL)
                except (ProcessLookupError, PermissionError, OSError):
                    pass
