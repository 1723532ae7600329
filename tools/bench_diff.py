#!/usr/bin/env python3
"""Per-query before/after comparison of two Bench captures (full-contract
JSON). Normalizes by host drift measured on UNTOUCHED queries: the median
after/before steady ratio over untouched queries with steady >= min_s.

Usage: bench_diff.py before.json after.json touched_query[,query...]
"""
import sys, json, statistics

def main():
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    touched = set(q for arg in sys.argv[3:] for q in arg.split(","))
    b, a = before["queries_steady_min"], after["queries_steady_min"]
    common = set(b) & set(a)
    untouched = [q for q in common if q not in touched and b[q] >= 0.3]
    drift = statistics.median(a[q] / b[q] for q in untouched)
    qs = sorted(untouched, key=lambda q: a[q] / b[q])
    n = len(qs)
    q25, q75 = a[qs[n // 4]] / b[qs[n // 4]], a[qs[3 * n // 4]] / b[qs[3 * n // 4]]
    print(f"untouched(n={n}, steady_min>=0.3s) drift median={drift:.3f} "
          f"q25={q25:.3f} q75={q75:.3f}")
    print(f"{'query':34} {'before':>8} {'after':>8} {'norm':>8} {'speedup':>8}")
    rows = []
    for q in sorted(touched & common, key=lambda q: -b[q]):
        norm = a[q] / drift
        rows.append((q, b[q], a[q], norm, b[q] / norm if norm else 0))
    for q, bb, aa, norm, sp in rows:
        print(f"{q:34} {bb:8.3f} {aa:8.3f} {norm:8.3f} {sp:7.2f}x")
    ts = lambda d: (sum(d["queries_steady"].values()), d.get("run1_sum"),
                    d.get("warmup_sum"))
    print("totals before steady/run1/warmup:", ts(before))
    print("totals after  steady/run1/warmup:", ts(after))

if __name__ == "__main__":
    main()
