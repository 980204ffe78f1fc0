#!/usr/bin/env python3
"""Compare a scale-tier bench run against the committed sf0.1 round record.

Usage: python3 tools/tier_compare.py <tier_out.json> [base_samples.json]

Prints per-query growth ratios (tier / sf0.1-median) sorted descending,
plus totals. For a K=10 tier, compute-bound queries should grow <= ~10x
(sub-linear via fixed-cost amortization); anything well above 10x is a
scale-killer candidate worth a plan read. Queries dominated by per-query
fixed cost (sub-second at sf0.1) will show noisy small ratios - the
interesting rows are the ones that were already >= ~0.5s at sf0.1.

Key formats differ by construction: bench_out.json "queries" carries the
SHORT keys (q01) the stdout-tail contract requires, bench_samples.json the
full names (q01_pricing_summary). Both inputs are normalized to the short
prefix before matching (r13 ADVICE: unnormalized names never matched, every
ratio printed inf).
"""
import json, statistics, sys

tier_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "bench_samples.json"

tier = json.load(open(tier_path))
base = json.load(open(base_path))


def short(name):
    return name.split("_", 1)[0]


def reported(samples, runs, fired):
    """Mirror BenchSampling.reported: drop the single worst sample before
    the median exactly when the stall defense FIRED on that query. New
    bench_samples.json files carry the fired set explicitly (r14 ADVICE:
    inferring it from row length > runs misses the all-extras-failed case,
    where the row stays length == runs yet the round record used the
    drop-max median); the length heuristic remains as the fallback for
    pre-r15 files that lack the field."""
    if fired or (runs and len(samples) > runs):
        if len(samples) >= 2:
            samples = sorted(samples)[:-1]
    return statistics.median(samples)


base_runs = base.get("runs")
base_fired = {short(n) for n in base.get("fired", [])}
base_q = {short(k): reported(v, base_runs, short(k) in base_fired)
          for k, v in base["queries"].items() if v}
tier_q = {short(k): v for k, v in tier["queries"].items()}

rows = []
for name, t in sorted(tier_q.items()):
    b = base_q.get(name)
    if b is None or t is None or t < 0:
        rows.append((float("inf"), name, t, b))
        continue
    rows.append((t / b if b > 0 else float("inf"), name, t, b))

rows.sort(reverse=True)
print(f"{'query':34s} {'sf0.1':>7s} {'tier':>8s} {'ratio':>7s}")
for ratio, name, t, b in rows:
    flag = ""
    if b is not None and t is not None and t >= 0:
        if ratio > 12 and b >= 0.5:
            flag = "  <== SUPER-LINEAR (compute-bound)"
        elif ratio > 12:
            flag = "  (fixed-cost base, noisy ratio)"
    print(f"{name:34s} {b if b is not None else -1:7.2f} "
          f"{t if t is not None else -1:8.2f} {ratio:7.2f}{flag}")

tt = sum(t for t in tier_q.values() if t is not None and t >= 0)
bt = sum(base_q.get(n, 0) for n in tier_q)
if bt > 0:
    print(f"\ntotal tier {tt:.1f}s vs sf0.1 {bt:.1f}s -> {tt / bt:.2f}x for 10x data")
else:
    print(f"\ntotal tier {tt:.1f}s (no matching sf0.1 base rows - check key formats)")
failed = [n for n, t in tier_q.items() if t is None or t < 0]
if failed:
    print("FAILED:", ", ".join(sorted(failed)))
