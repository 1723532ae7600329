#!/usr/bin/env python3
"""10x scale-cliff audit: parse two BenchOne logs (base sf0.1 and the
ScaleGen x10 corpus) and emit BENCH_SCALE10.json with per-query steady
times and growth ratios. A join/agg-shaped plan should grow roughly
linearly (<= ~15x on 10x data on a fixed 32-thread host); anything
superlinear is either a plan defect or a documented quadratic bound."""
import sys, json, re

def parse(path):
    runs = {}
    for line in open(path):
        m = re.search(r"\[benchone\] (\S+) run(\d+) ([0-9.]+)s", line)
        if m:
            runs.setdefault(m.group(1), {})[int(m.group(2))] = float(m.group(3))
        m = re.search(r"\[benchone\] warmup ([0-9.]+)s", line)
        if m:
            runs["__warmup__"] = {1: float(m.group(1))}
    out = {}
    for q, r in runs.items():
        steady = min(v for k, v in r.items() if k >= 2) if len(r) > 1 else r[1]
        out[q] = {"run1": r.get(1), "steady": steady}
    return out

def main():
    base_log, x10_log, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    base, x10 = parse(base_log), parse(x10_log)
    queries = {}
    for q in sorted(set(base) | set(x10)):
        if q == "__warmup__":
            continue
        b = base.get(q, {}).get("steady")
        s = x10.get(q, {}).get("steady")
        queries[q] = {
            "base_s": b, "x10_s": s,
            "ratio": round(s / b, 2) if b and s else None,
        }
    ratios = [v["ratio"] for v in queries.values() if v["ratio"]]
    doc = {
        "metric": "scale_cliff_x10",
        "unit": "ratio",
        "data_growth": 10,
        "host": "local[32]",
        "warmup_base_s": base.get("__warmup__", {}).get(1),
        "warmup_x10_s": x10.get("__warmup__", {}).get(1),
        "n_queries": len(queries),
        "max_ratio": max(ratios) if ratios else None,
        "median_ratio": sorted(ratios)[len(ratios) // 2] if ratios else None,
        "over_15x": sorted(q for q, v in queries.items()
                           if v["ratio"] and v["ratio"] > 15),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    print(json.dumps({k: v for k, v in doc.items() if k != "queries"}, indent=1))
    for q, v in sorted(queries.items(), key=lambda kv: -(kv[1]["ratio"] or 0)):
        print(f"{v['ratio'] if v['ratio'] else '?':>6}x  "
              f"{v['base_s']:>7}s -> {v['x10_s']:>8}s  {q}")

if __name__ == "__main__":
    main()
