"""Metric export sinks.

Counterpart of the reference's OTLP telemetry stack
(ref: crates/vitals/src/lib.rs:57-100): the ``Metrics`` registry takes a
pluggable ``sink`` callback; this module provides two concrete exporters
that work without any third-party telemetry dependency:

- ``TensorBoardSink``: writes standard TensorBoard scalar event files
  (TFRecord framing + hand-encoded Event protos — the wire format is
  tiny and stable, so we emit it directly rather than depending on
  tensorflow/tensorboardX, which this image does not ship).
- ``OtlpJsonSink``: POSTs OTLP/HTTP JSON metric payloads to
  ``OTEL_EXPORTER_OTLP_ENDPOINT``. Export failures are swallowed — the
  reference's telemetry likewise never takes down training.

``sink_from_env()`` mirrors the reference's env-driven init
(``OTEL_EXPORTER_OTLP_ENDPOINT`` / ``RBP_TELEMETRY_DISABLED`` and the
TensorBoard analog ``RBP_TENSORBOARD_DIR``).
"""

from __future__ import annotations

import json
import os
import pathlib
import socket
import struct
import time
import urllib.request

# --- crc32c (Castagnoli), required by TFRecord framing ----------------------

_CRC_TABLE = []


def _crc_table():
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tab = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# --- minimal protobuf encoding (varint + the 3 Event fields we emit) --------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _pb_double(num: int, v: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", v)


def _pb_float(num: int, v: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", v)


def _pb_int(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v)


def _pb_bytes(num: int, v: bytes) -> bytes:
    return _field(num, 2) + _varint(len(v)) + v


def _event(wall_time: float, step: int | None = None,
           file_version: str | None = None,
           scalars: dict[str, float] | None = None) -> bytes:
    """Event proto: wall_time=1(double), step=2(int64), file_version=3,
    summary=5 { value=1 { tag=1, simple_value=2 } }."""
    msg = _pb_double(1, wall_time)
    if step is not None:
        msg += _pb_int(2, step)
    if file_version is not None:
        msg += _pb_bytes(3, file_version.encode())
    if scalars:
        summary = b"".join(
            _pb_bytes(1, _pb_bytes(1, tag.encode()) + _pb_float(2, val))
            for tag, val in scalars.items()
        )
        msg += _pb_bytes(5, summary)
    return msg


def _tfrecord(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


class TensorBoardSink:
    """Append Metrics records as TensorBoard scalars.

    Every numeric entry in the record becomes a scalar tagged with its
    metric name; ``step`` is taken from ``mccfr_steps`` when present,
    else a monotone record counter.
    """

    def __init__(self, logdir: str | pathlib.Path):
        logdir = pathlib.Path(logdir)
        logdir.mkdir(parents=True, exist_ok=True)
        host = socket.gethostname()
        self.path = logdir / f"events.out.tfevents.{int(time.time())}.{host}"
        self._n = 0
        with open(self.path, "wb") as f:
            f.write(_tfrecord(_event(time.time(),
                                     file_version="brain.Event:2")))

    def __call__(self, record: dict) -> None:
        self._n += 1
        step = int(record.get("mccfr_steps", self._n))
        scalars = {k: float(v) for k, v in record.items()
                   if isinstance(v, (int, float))}
        with open(self.path, "ab") as f:
            f.write(_tfrecord(_event(time.time(), step=step,
                                     scalars=scalars)))


class OtlpJsonSink:
    """OTLP/HTTP JSON metric exporter (gauges only — counters are
    exported as cumulative sums). Never raises."""

    def __init__(self, endpoint: str, service: str = "robopoker_tpu",
                 timeout_s: float = 2.0):
        self.url = endpoint.rstrip("/") + "/v1/metrics"
        self.timeout_s = timeout_s
        self.resource = {"attributes": [{
            "key": "service.name", "value": {"stringValue": service}}]}

    def __call__(self, record: dict) -> None:
        now = str(time.time_ns())
        metrics = [
            {"name": k, "gauge": {"dataPoints": [
                {"timeUnixNano": now, "asDouble": float(v)}]}}
            for k, v in record.items() if isinstance(v, (int, float))
        ]
        body = json.dumps({"resourceMetrics": [{
            "resource": self.resource,
            "scopeMetrics": [{"scope": {"name": "rbp"},
                              "metrics": metrics}],
        }]}).encode()
        req = urllib.request.Request(
            self.url, data=body,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=self.timeout_s).close()
        except Exception:
            pass  # telemetry must never take down training


def sink_from_env() -> "callable | None":
    """Env-driven sink selection (ref: vitals/src/lib.rs:71-78). The
    returned sink also prints each record, preserving the default
    stdout logging."""
    if os.environ.get("RBP_TELEMETRY_DISABLED", "").lower() in (
            "1", "true", "yes"):
        return None
    sinks = []
    tb = os.environ.get("RBP_TENSORBOARD_DIR")
    if tb:
        sinks.append(TensorBoardSink(tb))
    otlp = os.environ.get("OTEL_EXPORTER_OTLP_ENDPOINT")
    if otlp:
        sinks.append(OtlpJsonSink(otlp))
    if not sinks:
        return None

    def tee(record: dict) -> None:
        print(json.dumps(record), flush=True)
        for s in sinks:
            s(record)

    return tee
