"""Compare two bench JSON artifacts (steady-state `queries` maps):
geomean speedup, biggest movers. Usage:
python tools/bench_compare_r14.py BEFORE.json AFTER.json [driver BENCH_rNN.json]
Accepts either the raw one-line bench output or the driver's wrapper
({"parsed": {...}})."""

from __future__ import annotations

import json
import math
import sys


def load(path):
    d = json.load(open(path))
    if "parsed" in d:
        d = d["parsed"]
    return d


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ratios = {k: qa[k] / qb[k] for k in common if qa[k] > 0 and qb[k] > 0}
    gm = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"common={len(common)} geomean speedup (before/after) = {gm:.3f}")
    print(f"total before={a.get('value')} after={b.get('value')}")
    print(
        f"sentinels before={a.get('sentinel_1task_sec')}/{a.get('sentinel_end_1task_sec')}"
        f" after={b.get('sentinel_1task_sec')}/{b.get('sentinel_end_1task_sec')}"
    )
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    print("\nslowed most (before/after < 1):")
    for k, r in movers[:12]:
        print(f"  {r:5.2f}x  {k}: {qa[k]} -> {qb[k]}")
    print("\nimproved most:")
    for k, r in movers[-12:][::-1]:
        print(f"  {r:5.2f}x  {k}: {qa[k]} -> {qb[k]}")


if __name__ == "__main__":
    main()
