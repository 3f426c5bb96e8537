"""Minimal pure-Python XSpace/XPlane protobuf reader for TPU op profiles.

jax.profiler.trace writes ``plugins/profile/<run>/*.xplane.pb`` — an XSpace
proto (tsl/profiler/protobuf/xplane.proto). The standard readers (XProf,
TensorBoard) are heavyweight UI deps; this module decodes just enough of the
wire format to answer the question the perf work actually asks: *which ops
burned the device time?*

The reference's analogue is the chrome-trace dump of torch.autograd.profiler
(MVSNet/train.py:279-307) which is similarly post-processed by hand.

Wire-format notes: protobuf messages are (field_number << 3 | wire_type)
varint-keyed; we only need varint (0), 64-bit (1), length-delimited (2) and
32-bit (5). Unknown fields are skipped, so schema drift is tolerated.
"""

from __future__ import annotations

import gzip
from collections import defaultdict
from pathlib import Path

__all__ = ["parse_xspace", "op_summary", "find_xplane_files", "load_op_summary"]


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:  # groups (3/4): not used by xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_event(buf: memoryview):
    """XEvent: metadata_id=1, offset_ps=2, duration_ps=3, num_occurrences=5."""
    md = dur = 0
    occ = 1
    for field, wt, val in _fields(buf):
        if field == 1 and wt == 0:
            md = val
        elif field == 3 and wt == 0:
            dur = val
        elif field == 5 and wt == 0:
            occ = val
    return md, dur, occ


def _parse_line(buf: memoryview):
    """XLine: name=2, events=4, display_name=11. Returns (name, [events])."""
    name = ""
    disp = ""
    events = []
    for field, wt, val in _fields(buf):
        if field == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 11 and wt == 2:
            disp = bytes(val).decode("utf-8", "replace")
        elif field == 4 and wt == 2:
            events.append(_parse_event(val))
    return disp or name, events


def _parse_event_metadata(buf: memoryview):
    """XEventMetadata: id=1, name=2, display_name=3."""
    mid = 0
    name = disp = ""
    for field, wt, val in _fields(buf):
        if field == 1 and wt == 0:
            mid = val
        elif field == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 3 and wt == 2:
            disp = bytes(val).decode("utf-8", "replace")
    return mid, disp or name


def _parse_metadata_entry(buf: memoryview):
    """map<int64, XEventMetadata> entry: key=1, value=2."""
    key = 0
    meta = (0, "")
    for field, wt, val in _fields(buf):
        if field == 1 and wt == 0:
            key = val
        elif field == 2 and wt == 2:
            meta = _parse_event_metadata(val)
    return key, meta[1]


def _parse_plane(buf: memoryview):
    """XPlane: name=2, lines=3, event_metadata=4."""
    name = ""
    lines = []
    metadata = {}
    for field, wt, val in _fields(buf):
        if field == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 3 and wt == 2:
            lines.append(_parse_line(val))
        elif field == 4 and wt == 2:
            k, v = _parse_metadata_entry(val)
            metadata[k] = v
    return {"name": name, "lines": lines, "event_metadata": metadata}


def parse_xspace(path: str | Path) -> list[dict]:
    """Parse an .xplane.pb file -> list of plane dicts."""
    data = Path(path).read_bytes()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    planes = []
    for field, wt, val in _fields(memoryview(data)):
        if field == 1 and wt == 2:  # XSpace.planes
            planes.append(_parse_plane(val))
    return planes


def op_summary(planes: list[dict], plane_filter: str = "TPU",
               line_filter: str = "XLA Ops") -> dict[str, dict]:
    """Aggregate device-op wall time by op name.

    Returns {op_name: {"time_ms", "count"}} summed over matching planes/lines.
    ``line_filter`` picks the per-op line of the device plane ("XLA Ops" on
    TPU; "XLA Modules" gives whole-program totals instead).
    """
    out: dict[str, dict] = defaultdict(lambda: {"time_ms": 0.0, "count": 0})
    for plane in planes:
        if plane_filter not in plane["name"]:
            continue
        md = plane["event_metadata"]
        for line_name, events in plane["lines"]:
            if line_filter and line_filter not in line_name:
                continue
            for mid, dur_ps, occ in events:
                name = md.get(mid, f"#{mid}")
                rec = out[name]
                rec["time_ms"] += dur_ps / 1e9
                rec["count"] += occ
    return dict(out)


def find_xplane_files(logdir: str | Path) -> list[Path]:
    return sorted(Path(logdir).rglob("*.xplane.pb"))


def load_op_summary(logdir: str | Path, **kw) -> dict[str, dict]:
    """Merge op summaries over every .xplane.pb under logdir."""
    total: dict[str, dict] = defaultdict(lambda: {"time_ms": 0.0, "count": 0})
    for f in find_xplane_files(logdir):
        for name, rec in op_summary(parse_xspace(f), **kw).items():
            total[name]["time_ms"] += rec["time_ms"]
            total[name]["count"] += rec["count"]
    return dict(total)
