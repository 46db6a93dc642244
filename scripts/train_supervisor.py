"""Production-train watchdog: detect a wedged device call, kill, resume.

VERDICT r3 next #7: two consecutive production trains died with their
sessions or wedged in a device call (the remote-TPU relay's known
failure mode), and recovery needed a human PID-kill. The reference's
stance is degradation-over-crash (ref: crates/nlhe/src/encoder.rs:155-178
— saturate and keep going); for a long-running train the equivalent is
supervised auto-resume: loss is bounded by the snapshot cadence because
resume-from-compact is automatic in forge (nlhe/forge.py:102-116).

Design:
- The train runs as a child in its OWN process group (exact-pgid kills
  only — never pattern kills), niced to -5 so co-running CPU jobs can't
  starve its dispatch thread (2-core-host lesson, round 3).
- Progress signal = growth of the train's log file (Metrics.maybe_log
  prints every 60 s; flush pauses are <2 min). No growth for
  --stall-s (default 420 s) ⇒ wedged: SIGTERM the pgid (graceful brb
  snapshot if the runtime can service it), grace, then SIGKILL.
- After each (re)launch a longer --startup-stall-s grace applies
  (default 1800 s) to cover TPU grant recovery (5-20 min post-wedge)
  plus cold parity compiles (~10 min).
- The overall --duration budget spans restarts: each relaunch gets
  TRAIN_DURATION = time left, so the LAST child exits gracefully at
  the supervisor deadline with its dense exit snapshot.
- Events append to <workdir>/supervisor.jsonl for post-mortems.

Usage:
    python3 scripts/train_supervisor.py --duration 18000 \
        --workdir artifacts/r4 --log logs/train_r4.log -- \
        --epochs 1000000 --batch 256 --table-log2 23 --parity \
        --cap-margin 1.4 --abstraction artifacts/abstraction_full \
        --flush-min 8 --warmstart-bias

Stall-injection test (tests/test_supervisor.py) SIGSTOPs the child and
asserts the supervisor kills + relaunches it with zero human action.
"""

import argparse
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def _event(path, **kw):
    with open(path, "a") as f:
        f.write(json.dumps({"t": time.time(), **kw}) + "\n")


def _kill_group(pgid, term_grace_s):
    """SIGTERM the exact pgid, wait, SIGKILL stragglers. Never patterns."""
    try:
        os.killpg(pgid, signal.SIGTERM)
    except ProcessLookupError:
        return
    deadline = time.monotonic() + term_grace_s
    while time.monotonic() < deadline:
        try:
            os.killpg(pgid, 0)
        except ProcessLookupError:
            return
        time.sleep(2.0)
    try:
        os.killpg(pgid, signal.SIGKILL)
    except ProcessLookupError:
        pass


def supervise(train_argv, duration_s, workdir, log_path, stall_s,
              startup_stall_s, poll_s=15.0, term_grace_s=60.0,
              relaunch_cooldown_s=30.0, nice=-5, env_extra=None,
              max_restarts=50, cpu=False):
    workdir = pathlib.Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    log_path = pathlib.Path(log_path)
    log_path.parent.mkdir(parents=True, exist_ok=True)
    events = workdir / "supervisor.jsonl"
    deadline = time.monotonic() + duration_s
    restarts = 0

    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 60:
            _event(events, kind="budget_exhausted", restarts=restarts)
            return 0
        env = dict(os.environ, TRAIN_DURATION=str(int(remaining)))
        if env_extra:
            env.update(env_extra)
        logf = open(log_path, "ab", buffering=0)
        logf.write(f"\n=== supervisor launch #{restarts} "
                   f"(budget {int(remaining)}s) ===\n".encode())

        def _pre():
            os.setsid()
            try:
                os.setpriority(os.PRIO_PROCESS, 0, nice)
            except OSError:
                pass

        if cpu:  # test path: pin the child to the host CPU backend
            entry = [sys.executable,
                     str(pathlib.Path(__file__).parent / "cpu_cli.py")]
        else:
            entry = [sys.executable, "-m", "robopoker_tpu.cli"]
        child = subprocess.Popen(
            entry + ["train", "--workdir", str(workdir)] + train_argv,
            stdout=logf, stderr=subprocess.STDOUT, env=env,
            preexec_fn=_pre)
        pgid = os.getpgid(child.pid)
        _event(events, kind="launch", pid=child.pid, n=restarts,
               budget_s=int(remaining))

        # Startup grace holds until the first METRICS line (a JSON
        # record containing "uptime_s", printed every 60 s by
        # Metrics.maybe_log) — raw log growth is NOT progress, because
        # startup prints arrive seconds before the multi-minute cold
        # parity compiles' silence, which must not read as a stall.
        grace = startup_stall_s
        offset = log_path.stat().st_size if log_path.exists() else 0
        last_growth = time.monotonic()
        while True:
            time.sleep(poll_s)
            rc = child.poll()
            if rc is not None:
                logf.close()
                if rc == 0:
                    _event(events, kind="clean_exit", rc=0,
                           restarts=restarts)
                    return 0
                _event(events, kind="crash", rc=rc)
                break  # relaunch
            size = log_path.stat().st_size
            if size > offset:
                with open(log_path, "rb") as f:
                    f.seek(offset)
                    chunk = f.read(size - offset)
                offset = size
                if b"adaptive caps" in chunk:
                    # mid-run cap recompile: minutes of silence follow;
                    # re-enter the long grace until the next metrics line
                    last_growth = time.monotonic()
                    grace = startup_stall_s
                elif grace == stall_s or b'"uptime_s"' in chunk:
                    last_growth = time.monotonic()
                    grace = stall_s  # first metrics line ends startup grace
            idle = time.monotonic() - last_growth
            if idle > grace:
                _event(events, kind="stall_kill", idle_s=int(idle),
                       pid=child.pid)
                _kill_group(pgid, term_grace_s)
                child.wait()
                logf.close()
                break  # relaunch (resume-from-compact is automatic)
            if time.monotonic() > deadline + stall_s + term_grace_s:
                # child missed its own TRAIN_DURATION exit — force it
                _event(events, kind="deadline_kill", pid=child.pid)
                _kill_group(pgid, term_grace_s)
                child.wait()
                logf.close()
                _event(events, kind="budget_exhausted", restarts=restarts)
                return 0
        restarts += 1
        if restarts > max_restarts:
            _event(events, kind="giving_up", restarts=restarts)
            return 1
        time.sleep(relaunch_cooldown_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, required=True,
                    help="total training budget in seconds, spans restarts")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--log", default=None,
                    help="train log file (default logs/train_<workdir>.log)")
    ap.add_argument("--stall-s", type=float, default=420.0)
    ap.add_argument("--startup-stall-s", type=float, default=1800.0)
    ap.add_argument("--poll-s", type=float, default=15.0)
    ap.add_argument("--nice", type=int, default=-5)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the child to the host CPU backend (tests)")
    ap.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="args after -- go to `robopoker_tpu.cli train`")
    args = ap.parse_args()
    train_argv = args.train_args
    if train_argv and train_argv[0] == "--":
        train_argv = train_argv[1:]
    log = args.log or f"logs/train_{pathlib.Path(args.workdir).name}.log"
    rc = supervise(train_argv, args.duration, args.workdir, log,
                   args.stall_s, args.startup_stall_s,
                   poll_s=args.poll_s, nice=args.nice, cpu=args.cpu)
    sys.exit(rc)


if __name__ == "__main__":
    main()
