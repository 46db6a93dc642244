"""Graceful-shutdown signal handling.

TPU-native counterpart of the reference's ``brb()/kys()/interrupted()``
(ref: crates/pokerkit/src/lib.rs:226-283): SIGINT/SIGTERM (and an
optional wall-clock deadline from ``TRAIN_DURATION``) set an atomic flag;
the training loop polls it at batch boundaries and checkpoints before
exit.
"""

from __future__ import annotations

import os
import signal
import threading
import time

_FLAG = threading.Event()
_DEADLINE: float | None = None
# anchor for TRAIN_DURATION at import (≈ process start). install() used
# to anchor at its own call site, which in a training entry point sits
# AFTER artifact loading and the first remote-TPU compile — the round-1
# production run's deadline fired ~5 min late at 3000 s because those
# minutes never counted (VERDICT round-1 weak #9)
_T0 = time.monotonic()


def interrupted() -> bool:
    if _FLAG.is_set():
        return True
    if _DEADLINE is not None and time.monotonic() >= _DEADLINE:
        _FLAG.set()
        return True
    return False


def _handler(signum, frame):
    _FLAG.set()


def install(train_duration_s: float | None = None) -> None:
    """Install handlers; honors TRAIN_DURATION (seconds) from env.

    The duration counts from process start (module import), not from
    this call — callers invoke install() after setup work that can take
    minutes, and the external supervisor measures wall-clock from launch.
    """
    global _DEADLINE
    signal.signal(signal.SIGTERM, _handler)
    signal.signal(signal.SIGINT, _handler)
    dur = train_duration_s
    if dur is None and os.environ.get("TRAIN_DURATION"):
        dur = float(os.environ["TRAIN_DURATION"])
    if dur is not None:
        _DEADLINE = _T0 + dur


def reset() -> None:
    global _DEADLINE
    _FLAG.clear()
    _DEADLINE = None
