#!/usr/bin/env python3
"""Diff two SweepScale logs (1x and Nx) into a per-lane scale-exponent
table: ratio = warm(Nx)/warm(1x), exponent = log(ratio)/log(N).
Usage: sweep_exponents.py sweep1.log sweep32.log 32
"""
import math
import re
import sys


def parse(path):
    out = {}
    for line in open(path):
        m = re.search(r"lane=(\S+) status=(\S+) cold=(\S+) warm=(\S+)", line)
        if m:
            out[m.group(1)] = (m.group(2), float(m.group(3)), float(m.group(4)))
    return out


def main():
    a, b, n = parse(sys.argv[1]), parse(sys.argv[2]), int(sys.argv[3])
    rows = []
    for lane, (st1, _, w1) in sorted(a.items()):
        stN, _, wN = b.get(lane, ("missing", -1, -1))
        if st1 == "ok" and stN == "ok" and w1 > 0 and wN > 0:
            # floor the 1x time: sub-0.3s lanes are fixed-cost dominated and
            # their ratio measures scheduling, not data scaling
            ratio = wN / max(w1, 0.3)
            expo = math.log(ratio) / math.log(n) if ratio > 0 else float("nan")
            rows.append((lane, w1, wN, ratio, expo, stN))
        else:
            rows.append((lane, w1, wN, float("nan"), float("nan"), stN))
    rows.sort(key=lambda r: -(r[3] if r[3] == r[3] else 1e9))
    print(f"{'lane':28s} {'w1x':>7s} {'wNx':>8s} {'ratio':>7s} {'exp':>5s}  status")
    for lane, w1, wN, ratio, expo, st in rows:
        rs = f"{ratio:7.1f}" if ratio == ratio else "      -"
        es = f"{expo:5.2f}" if expo == expo else "    -"
        print(f"{lane:28s} {w1:7.2f} {wN:8.2f} {rs} {es}  {st}")
    ok = [r for r in rows if r[3] == r[3]]
    sup = [r for r in ok if r[3] > n * 1.5]
    print(f"\n{len(ok)} comparable lanes; {len(sup)} super-linear beyond "
          f"{n}x*1.5: {[r[0] for r in sup]}")
    to = [r[0] for r in rows if r[5] == "timeout"]
    err = [(r[0], r[5]) for r in rows if r[5] not in ("ok", "timeout")]
    print(f"timeouts: {to}")
    print(f"errors: {err}")


if __name__ == "__main__":
    main()
