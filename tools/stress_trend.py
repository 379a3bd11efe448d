#!/usr/bin/env python3
"""Compare two SmokeOne sweeps at different scale factors.

Usage: stress_trend.py <lo.log> <hi.log> <lo_factor> <hi_factor>

Parses `[smoke] name head=..s xN=..s ratio=.. shuffleMB=a -> b` lines and
prints, per query, the time and shuffle trend between the two factors. For
a linear operator both trends sit near hi/lo (e.g. 10 for 10x -> 100x);
the time trend reads LOW when the lo-factor run is still scheduling-floor
dominated, so shuffle trend is the primary superlinearity signal and time
trend the confirmation.
"""
import re
import sys

PAT = re.compile(
    r"\[smoke\] (\S+)\s+head=\s*([\d.]+)s x(\d+)=\s*([\d.]+)s ratio=\s*([\d.]+) "
    r"shuffleMB=\s*([\d.-]+) ->\s*([\d.-]+)")


def parse(path):
    out = {}
    for line in open(path):
        m = PAT.search(line)
        if m:
            q, head, _f, sec, _r, mb_head, mb = m.groups()
            out[q] = (float(head), float(sec), float(mb))
    return out


def main():
    lo_log, hi_log, lo_f, hi_f = sys.argv[1:5]
    lo, hi = parse(lo_log), parse(hi_log)
    scale = float(hi_f) / float(lo_f)
    print(f"{'query':34} {'t@'+lo_f+'x':>8} {'t@'+hi_f+'x':>8} {'t_trend':>8} "
          f"{'MB@'+lo_f+'x':>9} {'MB@'+hi_f+'x':>9} {'mb_trend':>8}  flag(>{scale:.0f}x)")
    for q in sorted(set(lo) & set(hi), key=lambda q: -(hi[q][2])):
        tl, th = lo[q][1], hi[q][1]
        ml, mh = lo[q][2], hi[q][2]
        tt = th / tl if tl > 0 else float("nan")
        mt = mh / ml if ml > 0.05 else float("nan")  # sub-0.05MB lo side: trend meaningless
        flag = " <== SUPERLINEAR" if (mt == mt and mt > scale * 1.5) else ""
        print(f"{q:34} {tl:8.2f} {th:8.2f} {tt:8.2f} {ml:9.1f} {mh:9.1f} {mt:8.2f}{flag}")
    missing = sorted(set(lo) ^ set(hi))
    if missing:
        print("only in one sweep:", ", ".join(missing))


if __name__ == "__main__":
    main()
