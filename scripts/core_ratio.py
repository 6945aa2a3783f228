#!/usr/bin/env python3
"""Core-scaling record: per-query low-core/high-core time ratios.

The r12 verdict's one un-checkable claim was parallelism: at sf0.1 the
suite is per-job fixed-overhead bound (~0.3-1.4 s/query floor), so 8
vs 32 cores is indistinguishable and `suspect_cpus_ignored` fired.
This script assembles the r13 answer: run graft.Bench on the heavy
family at a work-dominated scale (the K=10 probe corpus) once with
SPARK_GRAFT_CPUS=32 and once with SPARK_GRAFT_CPUS=8, then merge the
two records into SCALING_r13-style JSON with the per-query core ratio

    ratio = t_low_cores / t_high_cores

A query that parallelises perfectly would show 4.0 at 8-vs-32 cores
(capped by Amdahl + the job floor); a serial query shows ~1.0.

Usage:
    python3 scripts/core_ratio.py BENCH_HIGH.json BENCH_LOW.json \
        [--out SCALING_r13.json] [--note "..."]

Both inputs are graft.Bench one-line JSON records (the same contract
the driver parses); cpus are read from the records if present, else
from --cpus-high/--cpus-low.
"""
import json
import statistics
import sys


def main():
    args = sys.argv[1:]
    out, note = None, ""
    cpus_high, cpus_low = 32, 8
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out = args[i + 1]; i += 1
        elif args[i] == "--note":
            note = args[i + 1]; i += 1
        elif args[i] == "--cpus-high":
            cpus_high = int(args[i + 1]); i += 1
        elif args[i] == "--cpus-low":
            cpus_low = int(args[i + 1]); i += 1
        else:
            pos.append(args[i])
        i += 1
    hi = json.load(open(pos[0]))
    lo = json.load(open(pos[1]))
    ratios = {}
    for q, t_hi in hi["queries"].items():
        t_lo = lo["queries"].get(q)
        if t_lo is None or t_hi <= 0 or t_lo <= 0:
            continue
        ratios[q] = round(t_lo / t_hi, 2)
    med = statistics.median(ratios.values()) if ratios else None
    rec = {
        "metric": "core_ratio",
        "cpus_high": cpus_high,
        "cpus_low": cpus_low,
        "sf": hi.get("sf"),
        "n_queries": len(ratios),
        "total_high": round(sum(
            t for q, t in hi["queries"].items() if q in ratios), 1),
        "total_low": round(sum(
            t for q, t in lo["queries"].items() if q in ratios), 1),
        "median_ratio": med,
        "ratios": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
        "note": note,
    }
    line = json.dumps(rec)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
