"""Aggregate device op self-times from a profiler ``*.xplane.pb`` dump.

The axon tunnel's trace.json conversion truncates at ~1M events (the host
python lane swallows the budget), so per-op TPU timings must be read from
the raw XSpace protobuf.  This is a dependency-free wire-format parser for
the stable xplane.proto schema (XSpace.planes -> XPlane{name, lines,
event_metadata} -> XLine.events -> XEvent{metadata_id, duration_ps}) that
prints, for each device plane, the top ops by total duration and by
hlo_category when present.

Usage:  python scripts/xplane_summary.py <path.xplane.pb> [top_n] [steps]
"""

import sys
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer.
    value: int for varint/fixed, memoryview for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}  # id -> (name, display_name)
    for fno, _, v in fields(buf):
        if fno == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fno == 3:
            lines.append(v)
        elif fno == 4:  # map entry: key=1 varint, value=2 XEventMetadata
            k = None
            em = None
            for f2, _, v2 in fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    em = v2
            if em is not None:
                mname, disp, category = "", "", ""
                for f3, _, v3 in fields(em):
                    if f3 == 2:
                        mname = bytes(v3).decode("utf-8", "replace")
                    elif f3 == 3:
                        disp = bytes(v3).decode("utf-8", "replace")
                meta[k] = disp or mname
    return name, lines, meta


def parse_line(buf):
    lname = ""
    events = []
    for fno, _, v in fields(buf):
        if fno == 2:
            lname = bytes(v).decode("utf-8", "replace")
        elif fno == 11:
            lname = bytes(v).decode("utf-8", "replace") or lname
        elif fno == 4:
            events.append(v)
    return lname, events


def summarize(path, top_n=40, steps=1):
    data = memoryview(open(path, "rb").read())
    for fno, _, plane_buf in fields(data):
        if fno != 1:
            continue
        pname, lines, meta = parse_plane(plane_buf)
        if "TPU" not in pname and "Device" not in pname:
            continue
        print(f"\n=== plane: {pname} ({len(lines)} lines) ===")
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if not events:
                continue
            agg = defaultdict(int)
            cnt = defaultdict(int)
            for ebuf in events:
                mid = dur = 0
                for f2, _, v2 in fields(ebuf):
                    if f2 == 1:
                        mid = v2
                    elif f2 == 3:
                        dur = v2
                name = meta.get(mid, str(mid))
                # strip uniquifier: fusion.123 -> fusion
                base = name.split(".")[0]
                agg[base] += dur
                cnt[base] += 1
            total = sum(agg.values())
            print(f"\n-- line: {lname} | {len(events)} events | "
                  f"{total/1e9/steps:.2f} ms/step device time --")
            print(f"{'op':<44}{'ms/step':>10}{'%':>7}{'n/step':>9}")
            for nm, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"{nm:<44}{ps/1e9/steps:>10.2f}{100*ps/total:>6.1f}%"
                      f"{cnt[nm]/steps:>9.1f}")
            if lname == "XLA Ops":
                solo = defaultdict(int)
                scnt = defaultdict(int)
                for ebuf in events:
                    mid = dur = 0
                    for f2, _, v2 in fields(ebuf):
                        if f2 == 1:
                            mid = v2
                        elif f2 == 3:
                            dur = v2
                    nm = meta.get(mid, str(mid))
                    solo[nm] += dur
                    scnt[nm] += 1
                print(f"\n-- top individual ops ({lname}) --")
                for nm, ps in sorted(solo.items(), key=lambda kv: -kv[1])[:top_n]:
                    print(f"{nm[:76]:<76}{ps/1e9/steps:>9.2f} ms/step"
                          f"{scnt[nm]/steps:>9.1f}/step")


if __name__ == "__main__":
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    summarize(path, top, steps)
