"""Round-over-round bench regression diff.

Usage: python tools/bench_diff.py BENCH_r01.json BENCH_r02.json
Prints per-query wall-time deltas (sec and ratio) so regressions are
visible at a glance; exits 1 if any query regressed by >25%.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    def load(p):
        d = json.load(open(p))
        return d.get("parsed", d)  # driver BENCH_r{N}.json wraps under "parsed"

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    qo, qn = old.get("queries", {}), new.get("queries", {})
    regressed = []
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name in sorted(set(qo) | set(qn)):
        a, b = qo.get(name), qn.get(name)
        if a is None or b is None:
            print(f"{name:34s} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8}   (new/removed)")
            continue
        ratio = b / a if a else float("inf")
        flag = " <-- REGRESSED" if ratio > 1.25 else ""
        if flag:
            regressed.append(name)
        print(f"{name:34s} {a:8.2f} {b:8.2f} {ratio:7.2f}{flag}")
    for key in ("value", "pairs_scored_per_sec"):
        if key in old and key in new:
            print(f"{key}: {old[key]} -> {new[key]}")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
