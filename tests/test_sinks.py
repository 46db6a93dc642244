"""Metric sink tests (ref: crates/vitals/src/lib.rs telemetry stack)."""

import json
import struct

from robopoker_tpu.utils import sinks
from robopoker_tpu.utils.metrics import Metrics


def read_tfrecords(path):
    """Parse TFRecord framing back, verifying both masked CRCs."""
    out = []
    data = open(path, "rb").read()
    i = 0
    while i < len(data):
        (n,) = struct.unpack_from("<Q", data, i)
        (hcrc,) = struct.unpack_from("<I", data, i + 8)
        assert hcrc == sinks._masked_crc(data[i:i + 8])
        payload = data[i + 12:i + 12 + n]
        (pcrc,) = struct.unpack_from("<I", data, i + 12 + n)
        assert pcrc == sinks._masked_crc(payload)
        out.append(payload)
        i += 12 + n + 4
    return out


def parse_scalars(event_bytes):
    """Minimal proto walk: extract {tag: simple_value} and step."""
    scalars, step = {}, None
    i = 0

    def varint(b, i):
        v = s = 0
        while True:
            v |= (b[i] & 0x7F) << s
            s += 7
            i += 1
            if not b[i - 1] & 0x80:
                return v, i

    while i < len(event_bytes):
        key, i = varint(event_bytes, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            val, i = varint(event_bytes, i)
            if num == 2:
                step = val
        elif wire == 1:
            i += 8
        elif wire == 5:
            i += 4
        elif wire == 2:
            n, i = varint(event_bytes, i)
            body = event_bytes[i:i + n]
            i += n
            if num == 5:  # summary
                j = 0
                while j < len(body):
                    k2, j = varint(body, j)
                    vn, j = varint(body, j)
                    value = body[j:j + vn]
                    j += vn
                    # value: tag=1 (len-delim), simple_value=2 (float)
                    m = 0
                    tag = None
                    while m < len(value):
                        k3, m = varint(value, m)
                        if k3 >> 3 == 1 and k3 & 7 == 2:
                            ln, m = varint(value, m)
                            tag = value[m:m + ln].decode()
                            m += ln
                        elif k3 & 7 == 5:
                            (sv,) = struct.unpack_from("<f", value, m)
                            m += 4
                            scalars[tag] = sv
                        else:
                            raise AssertionError("unexpected field")
    return scalars, step


def test_tensorboard_sink_roundtrip(tmp_path):
    sink = sinks.TensorBoardSink(tmp_path)
    sink({"mccfr_steps": 7, "mccfr_sum_regret": 123.5, "note": "text"})
    recs = read_tfrecords(sink.path)
    assert len(recs) == 2  # file_version header + one scalar event
    scalars, step = parse_scalars(recs[1])
    assert step == 7
    assert scalars["mccfr_sum_regret"] == 123.5
    assert scalars["mccfr_steps"] == 7.0
    assert "note" not in scalars


def test_crc32c_vectors():
    # published CRC-32C test vectors (RFC 3720 appendix B.4 style)
    assert sinks.crc32c(b"") == 0
    assert sinks.crc32c(b"123456789") == 0xE3069283
    assert sinks.crc32c(bytes(32)) == 0x8A9136AA


def test_metrics_env_sink(tmp_path, monkeypatch):
    monkeypatch.setenv("RBP_TENSORBOARD_DIR", str(tmp_path))
    m = Metrics(log_interval_s=0.0)
    m.inc("mccfr_steps", 3)
    rec = m.maybe_log(force=True)
    assert rec["mccfr_steps"] == 3
    evfiles = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(evfiles) == 1
    assert len(read_tfrecords(evfiles[0])) == 2


def test_otlp_sink_never_raises():
    s = sinks.OtlpJsonSink("http://127.0.0.1:1", timeout_s=0.1)
    s({"mccfr_steps": 1})  # endpoint closed: swallowed


def test_disabled_env(monkeypatch):
    monkeypatch.setenv("RBP_TELEMETRY_DISABLED", "1")
    monkeypatch.setenv("RBP_TENSORBOARD_DIR", "/nonexistent-should-not-matter")
    assert sinks.sink_from_env() is None
