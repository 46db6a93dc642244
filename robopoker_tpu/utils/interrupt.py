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
    """Install handlers; honors TRAIN_DURATION (seconds) from env."""
    global _DEADLINE
    signal.signal(signal.SIGTERM, _handler)
    signal.signal(signal.SIGINT, _handler)
    dur = train_duration_s
    if dur is None and os.environ.get("TRAIN_DURATION"):
        dur = float(os.environ["TRAIN_DURATION"])
    if dur is not None:
        _DEADLINE = time.monotonic() + dur


def reset() -> None:
    global _DEADLINE
    _FLAG.clear()
    _DEADLINE = None
