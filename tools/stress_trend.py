#!/usr/bin/env python3
"""Compare two SmokeOne sweeps at different scale factors against the
per-query shuffle-class manifest (tools/stress_classes.json).

Usage: stress_trend.py <lo.log> <hi.log> <lo_factor> <hi_factor> [manifest]

Parses `[smoke] name head=..s xN=..s ratio=.. shuffleMB=a -> b` lines and
prints, per query, the time and shuffle trend between the two factors plus
the query's DECLARED class. Flags only deviations from the declared class
(VERDICT r13 task #2 — the bare >1.5x-of-scale heuristic flagged 10
known-additive broadcast->shuffle transitions as SUPERLINEAR and their true
adjudications lived only in PERF_NOTES prose):

  linear       mb_trend must be <= scale * 1.5 once the lo side is past the
               0.05 MB floor (time trend reads LOW when the lo run is still
               scheduling-floor dominated, so shuffle is the primary signal)
  transition   an additive broadcast->shuffle degrade: at the lo factor one
               side still broadcasts (possibly leaving a small residual
               shuffle), at the hi factor the DESIGNED shuffle shape
               appears once — a growth STEP, not a growth RATE, so a trend
               ratio is meaningless across the step. The manifest pins
               hi_mb_cap (~2x the measured hi-factor bytes) as the
               contract: a real class change (quadratic candidate growth)
               blows through the cap, re-measured layout noise does not.
  zero         scan-bound: no data-proportional exchange at either factor
               (hi_mb <= 8 MB covers footer/stats traffic)

A query in the sweep but not the manifest (or vice versa) is itself a flag:
every new smoke query must declare its class, and a manifest row must not
outlive its query. Exit code 1 on any flag, so the sweep is a gate.
"""
import json
import os
import re
import sys

PAT = re.compile(
    r"\[smoke\] (\S+)\s+head=\s*([\d.]+)s x(\d+)=\s*([\d.]+)s ratio=\s*([\d.-]+) "
    r"shuffleMB=\s*([\d.-]+) ->\s*([\d.-]+)")

DEFAULT_MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "stress_classes.json")


def parse(path):
    out = {}
    for line in open(path):
        m = PAT.search(line)
        if m:
            q, head, _f, sec, _r, mb_head, mb = m.groups()
            out[q] = (float(head), float(sec), float(mb))
    return out


def classify(cls, scale, tl, th, ml, mh):
    """Return (trend_str, flag_str). flag_str empty = conforms to class."""
    kind = cls.get("class")
    mt = mh / ml if ml > 0.05 else float("nan")
    if kind == "zero":
        if mh > 8.0:
            return mt, f" <== CLASS-VIOLATION zero: hi={mh:.1f}MB > 8MB"
        return mt, ""
    if kind == "transition":
        cap = cls["hi_mb_cap"]
        if mh > cap:
            return mt, f" <== CLASS-VIOLATION transition: hi={mh:.1f}MB > cap={cap}MB"
        return mt, ""
    if kind == "linear":
        if mt == mt and mt > scale * 1.5:
            return mt, f" <== CLASS-VIOLATION linear: mb_trend={mt:.1f} > {scale * 1.5:.0f}"
        return mt, ""
    return mt, f" <== UNKNOWN CLASS {kind!r}"


def main():
    lo_log, hi_log, lo_f, hi_f = sys.argv[1:5]
    manifest_path = sys.argv[5] if len(sys.argv) > 5 else DEFAULT_MANIFEST
    manifest = json.load(open(manifest_path))
    lo, hi = parse(lo_log), parse(hi_log)
    scale = float(hi_f) / float(lo_f)
    flags = []
    print(f"{'query':34} {'t@'+lo_f+'x':>8} {'t@'+hi_f+'x':>8} {'t_trend':>8} "
          f"{'MB@'+lo_f+'x':>9} {'MB@'+hi_f+'x':>9} {'mb_trend':>8} {'class':>10}  deviation")
    for q in sorted(set(lo) & set(hi), key=lambda q: -(hi[q][2])):
        tl, th = lo[q][1], hi[q][1]
        ml, mh = lo[q][2], hi[q][2]
        tt = th / tl if tl > 0 else float("nan")
        cls = manifest.get(q)
        if cls is None:
            mt = mh / ml if ml > 0.05 else float("nan")
            flag = " <== UNCLASSIFIED: add to tools/stress_classes.json"
            kind = "-"
        else:
            mt, flag = classify(cls, scale, tl, th, ml, mh)
            kind = cls["class"]
        if flag:
            flags.append(q + flag)
        print(f"{q:34} {tl:8.2f} {th:8.2f} {tt:8.2f} {ml:9.1f} {mh:9.1f} {mt:8.2f} {kind:>10}{flag}")
    missing = sorted(set(lo) ^ set(hi))
    if missing:
        flags.extend(missing)
        print("only in one sweep:", ", ".join(missing))
    stale = sorted(k for k in set(manifest) - (set(lo) & set(hi))
                   if not k.startswith("_"))
    if stale:
        print("manifest rows not in this sweep (stale or not swept):",
              ", ".join(stale))
    if flags:
        print(f"\n{len(flags)} FLAG(S):")
        for f in flags:
            print(" ", f)
        sys.exit(1)
    print("\nall queries conform to their declared shuffle class")


if __name__ == "__main__":
    main()
