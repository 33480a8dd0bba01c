#!/usr/bin/env python3
"""Compare two graft.Bench JSON outputs taken at different data scales.

Usage: scale.py <bench_small.json-line-file> <bench_big.json-line-file> [mult]

`mult` is the data-size ratio between the two runs (default 10 = sf0.1 vs
sf1). For each shared query prints time ratio and the implied scaling
exponent  e = log(t_big/t_small) / log(mult)  — e<=1 is linear-or-better,
e around 1.05 is ~O(n log n) at these sizes, anything past EXP_FLAG is a
super-linear suspect worth a plan audit.

Queries faster than FLOOR seconds at the SMALL scale are exponent-unreliable
(fixed scheduling/JVM overhead dominates) and are only flagged on the big-run
absolute time.
"""
import json, math, sys

FLOOR = 0.15      # small-run seconds below which exponents are noise
EXP_FLAG = 1.15   # exponent above this => super-linear suspect
ABS_FLAG = 20.0   # big-run seconds above this is a wall-clock outlier


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if '"metric"' in line:
                # sbt prefixes stdout lines with "[info] "
                return json.loads(line[line.index('{'):])
    raise SystemExit(f"no metric line in {path}")


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    mult = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    shared = sorted(set(qs) & set(qb))
    rows = []
    for q in shared:
        ts, tb = qs[q], qb[q]
        ratio = tb / ts if ts > 0 else float("inf")
        exp = math.log(ratio) / math.log(mult) if ratio > 0 else 0.0
        rows.append((q, ts, tb, ratio, exp))
    rows.sort(key=lambda r: -r[3])
    suspects = []
    print(f"{'query':<34}{'t_small':>9}{'t_big':>9}{'ratio':>8}{'exp':>7}")
    for q, ts, tb, ratio, exp in rows:
        mark = ""
        if ts >= FLOOR and exp > EXP_FLAG:
            mark = "  <-- SUPER-LINEAR"
            suspects.append(q)
        elif tb > ABS_FLAG:
            mark = "  <-- SLOW-ABS"
            suspects.append(q)
        print(f"{q:<34}{ts:>9.3f}{tb:>9.3f}{ratio:>8.2f}{exp:>7.2f}{mark}")
    tot_s = sum(qs[q] for q in shared)
    tot_b = sum(qb[q] for q in shared)
    print(f"\n{'TOTAL':<34}{tot_s:>9.2f}{tot_b:>9.2f}"
          f"{tot_b / tot_s:>8.2f}{math.log(tot_b / tot_s) / math.log(mult):>7.2f}")
    if suspects:
        print("\nsuspects:", ", ".join(suspects))
        sys.exit(1)
    print("\nall queries scale <= ~O(n log n) at this size range")


if __name__ == "__main__":
    main()
