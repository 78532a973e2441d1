"""Wire-format tests for the xplane decoder (scripts/xplane_tools.py):
a hand-encoded XSpace protobuf (schema:
tensorflow/core/profiler/protobuf/xplane.proto) must decode to the same
planes/events/stats, and the MXU summary must derive busy% from the
flops stats only — events without a flops stat contribute zero."""

import importlib.util
import os
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "xplane_tools", os.path.join(REPO, "scripts", "xplane_tools.py"))
xpt = importlib.util.module_from_spec(spec)
spec.loader.exec_module(xpt)


def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num, wt, payload):
    key = _varint((num << 3) | wt)
    if wt == 2:
        return key + _varint(len(payload)) + payload
    if wt == 0:
        return key + _varint(payload)
    return key + payload


def _stat(md_id, double=None, uint=None):
    b = _field(1, 0, md_id)
    if double is not None:
        b += _field(2, 1, struct.pack("<d", double))
    if uint is not None:
        b += _field(3, 0, uint)
    return b


def _event(md_id, offset_ps, dur_ps, stats=()):
    b = _field(1, 0, md_id) + _field(2, 0, offset_ps) + _field(3, 0, dur_ps)
    for s in stats:
        b += _field(4, 2, s)
    return b


def _md_entry(fnum, key, name):
    inner = _field(2, 2, name.encode())
    return _field(fnum, 2, _field(1, 0, key) + _field(2, 2, inner))


def _make_space():
    # plane "/device:TPU:0": one line "XLA Ops", two ops:
    #   fusion.1: 10 us, 1.97e9 flops (10% of a 197 TF/s MXU)
    #   copy.2:   10 us, no flops stat
    line = _field(2, 2, b"XLA Ops")
    line += _field(4, 2, _event(1, 0, 10_000_000,
                                [_stat(7, double=1.97e9)]))
    line += _field(4, 2, _event(2, 10_000_000, 10_000_000))
    plane = _field(2, 2, b"/device:TPU:0")
    plane += _field(3, 2, line)
    plane += _md_entry(4, 1, "fusion.1")
    plane += _md_entry(4, 2, "copy.2")
    plane += _md_entry(5, 7, "flops")
    return _field(1, 2, plane)


def test_parse_and_aggregate(tmp_path):
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(_make_space())
    planes = xpt.parse_xspace(str(p))
    assert len(planes) == 1
    name, md, lines, smd = planes[0]
    assert name == "/device:TPU:0"
    assert md == {1: "fusion.1", 2: "copy.2"}
    assert smd == {7: "flops"}
    agg = xpt.aggregate(planes)
    ops = agg[("/device:TPU:0", "XLA Ops")]
    assert ops["fusion.1"] == (10_000_000, 1)
    assert ops["copy.2"] == (10_000_000, 1)


def test_mxu_summary(tmp_path, capsys):
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(_make_space())
    planes = xpt.parse_xspace(str(p))
    res = xpt.mxu_summary(planes, peak_tflops=197.0)
    assert len(res) == 1
    pname, lname, span_ps, total_flops, per_op = res[0]
    assert span_ps == 20_000_000  # 20 us window
    assert total_flops == 1.97e9
    # busy = 1.97e9 / 20e-6 / 197e12 = 50%
    busy = total_flops / (span_ps * 1e-12) / 197e12
    assert abs(busy - 0.5) < 1e-9
    out = capsys.readouterr().out
    assert "MXU busy" in out and "50.0%" in out
    # events with no flops stat claim nothing
    assert per_op["copy.2"][0] == 0.0
