"""Summarize a JAX profiler .xplane.pb: per-op device time.

The tensorboard profile plugin in this image has a protobuf version
conflict, so this decodes the XSpace wire format directly (field numbers
from tensorflow/core/profiler/protobuf/xplane.proto, stable since 2020).

Usage: python scripts/xplane_summary.py [trace_dir|xplane.pb] [top_n]
"""

import collections
import glob
import struct
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a protobuf message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack("<q", buf[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<i", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse(path, top_n=30):
    data = open(path, "rb").read()
    for fno, _, plane_buf in fields(data):
        if fno != 1:
            continue
        name = ""
        ev_names = {}
        dur = collections.Counter()
        cnt = collections.Counter()
        lines_bufs = []
        for pf, _, pv in fields(plane_buf):
            if pf == 2:
                name = pv.decode()
            elif pf == 3:
                lines_bufs.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                k = v = None
                for mf, _, mv in fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for ef, _, ev in fields(mv):
                            if ef == 2:
                                v = ev.decode()
                if k is not None and v:
                    ev_names[k] = v
        for lb in lines_bufs:
            lname = ""
            dur = collections.Counter()
            cnt = collections.Counter()
            for lf, _, lv in fields(lb):
                if lf == 2:
                    lname = lv.decode()
                elif lf == 11:
                    lname = lv.decode() or lname
                elif lf == 4:
                    mid = d = 0
                    for ef, _, ev in fields(lv):
                        if ef == 1:
                            mid = ev
                        elif ef == 3:
                            d = ev
                    dur[mid] += d
                    cnt[mid] += 1
            if not dur:
                continue
            tot = sum(dur.values())
            print(f"\n== plane: {name} | line: {lname}  total {tot/1e9:.2f} ms ==")
            for mid, d in dur.most_common(top_n):
                print(
                    f"  {d/1e9:9.3f} ms {100*d/tot:5.1f}% x{cnt[mid]:<5} "
                    f"{ev_names.get(mid, mid)}"[:150]
                )


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = (
        [arg]
        if arg.endswith(".pb")
        else sorted(glob.glob(arg + "/**/*.xplane.pb", recursive=True))
    )
    parse(paths[-1], top)
