"""Self-contained XPlane (jax.profiler trace) reader.

Parses the protobuf wire format of `*.xplane.pb` files directly (no
tensorflow/tensorboard dependency — the environment's profile plugins are
version-mismatched) and aggregates per-op device time, giving the profiling
subsystem a usable text report:

    python -m diffusionhandles_tpu.utils.xplane /tmp/trace
"""

from __future__ import annotations

import glob
import pathlib
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos:pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            yield field, wire, buf[pos:pos + 4]
            pos += 4
        elif wire == 1:  # 64-bit
            yield field, wire, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _parse_event(buf: bytes) -> Tuple[int, int]:
    """XEvent: metadata_id=1 (varint), duration_ps=3 (varint)."""
    mid = 0
    dur = 0
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            mid = val
        elif field == 3 and wire == 0:
            dur = val
    return mid, dur


def _parse_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    """XLine: name=2, display_name=11, events=4 (messages)."""
    events = []
    name = ""
    display = ""
    for field, wire, val in _fields(buf):
        if field == 4 and wire == 2:
            events.append(_parse_event(val))
        elif field == 2 and wire == 2:
            name = val.decode("utf-8", "replace")
        elif field == 11 and wire == 2:
            display = val.decode("utf-8", "replace")
    return (display or name), events


def _parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    """XEventMetadata: id=1, name=2."""
    mid = 0
    name = ""
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            mid = val
        elif field == 2 and wire == 2:
            name = val.decode("utf-8", "replace")
    return mid, name


def _parse_metadata_entry(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry: key=1, value=2."""
    key = 0
    name = ""
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            key = val
        elif field == 2 and wire == 2:
            mid, name2 = _parse_event_metadata(val)
            name = name2
            if mid:
                key = key or mid
    return key, name


def parse_xplane(path) -> Dict[str, List[dict]]:
    """Parse an xplane.pb -> {plane_name: [{'name', 'total_us', 'count'}]}.

    Aggregates event durations by op name per plane.
    """
    buf = pathlib.Path(path).read_bytes()
    planes_out: Dict[str, List[dict]] = {}
    for field, wire, plane_buf in _fields(buf):
        if field != 1 or wire != 2:
            continue  # XSpace.planes only
        name = ""
        meta: Dict[int, str] = {}
        lines = []
        for pfield, pwire, pval in _fields(plane_buf):
            if pfield == 2 and pwire == 2:
                name = pval.decode("utf-8", "replace")
            elif pfield == 3 and pwire == 2:
                lines.append(pval)
            elif pfield == 4 and pwire == 2:
                key, mname = _parse_metadata_entry(pval)
                meta[key] = mname
        by_line: Dict[str, dict] = {}
        for line_buf in lines:
            lname, events = _parse_line(line_buf)
            slot = by_line.setdefault(
                lname, {"total": defaultdict(float),
                        "count": defaultdict(int)})
            for mid, dur in events:
                opname = meta.get(mid, f"op_{mid}")
                slot["total"][opname] += dur / 1e6  # ps -> us
                slot["count"][opname] += 1
        planes_out[name] = {
            lname: sorted(
                ({"name": k, "total_us": v, "count": slot["count"][k]}
                 for k, v in slot["total"].items()),
                key=lambda d: -d["total_us"])
            for lname, slot in by_line.items()}
    return planes_out


def report(trace_dir, top: int = 25, device_only: bool = True) -> str:
    """Aggregate the newest trace in `trace_dir` into a top-ops report."""
    files = sorted(glob.glob(str(pathlib.Path(trace_dir)
                                 / "**" / "*.xplane.pb"), recursive=True))
    if not files:
        return f"no xplane.pb files under {trace_dir}"
    out = []
    planes = parse_xplane(files[-1])
    for pname, by_line in planes.items():
        if device_only and not ("TPU" in pname or "Device" in pname
                                or "/device" in pname.lower()):
            continue
        for lname, ops in by_line.items():
            total = sum(o["total_us"] for o in ops) or 1.0
            out.append(f"== {pname} / line '{lname}' "
                       f"(total {total / 1e3:.2f} ms across ops)")
            for o in ops[:top]:
                out.append(f"  {o['total_us']:10.1f} us  "
                           f"{100 * o['total_us'] / total:5.1f}%  "
                           f"x{o['count']:<5d} {o['name'][:100]}")
    if not out:
        # fall back to all planes
        return report(trace_dir, top=top, device_only=False)
    return "\n".join(out)


if __name__ == "__main__":
    import sys
    print(report(sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"))
