#!/usr/bin/env python3
"""Per-query engine scaling report: BENCH_K10 vs BENCH_LOCAL.

The K=10 magnitude probe is a 10x key-offset replication of sf0.1, so
a query whose engine time grows ~10x is scaling linearly with data;
sub-linear (fixed-cost dominated at this size) is common and fine. A
ratio far ABOVE the data ratio is the red flag — it means some stage
is super-linear (pair blowup, skew collapse, a sort that stopped
fitting) and would be magnified another 100x on the way to 100 TB.

Usage:
    python3 scripts/scaling_report.py [BENCH_BASE] [BENCH_SCALED] \
        [--data-ratio D]    # scaled/base data volume; default 10
        [--flag-ratio R]    # default 2x the data ratio

Any adjacent pair of bench records works — (BENCH_LOCAL, BENCH_K10)
with the default --data-ratio 10, or (BENCH_K10, BENCH_K30) with
--data-ratio 3 — so a three-point fit is two invocations: a query
clean on sf0.1->K10 but flagged on K10->K30 has a stage that went
super-linear only past the first decade. Prints a JSON summary
(flagged queries + distribution, median = statistics.median) and a
sorted worst-10 table. Small absolute times are noise-dominated:
queries under --min-sec (default 0.5 s) at BOTH scales are never
flagged.
"""
import sys, json, statistics

def main():
    args = [a for a in sys.argv[1:]]
    flag_ratio, min_sec, data_ratio = None, 0.5, 10.0
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--flag-ratio":
            flag_ratio = float(args[i + 1]); i += 1
        elif args[i] == "--min-sec":
            min_sec = float(args[i + 1]); i += 1
        elif args[i] == "--data-ratio":
            # ratio of the SECOND record's data volume to the first
            # (10 for sf0.1->K10, 3 for K10->K30)
            data_ratio = float(args[i + 1])
            i += 1
        else:
            pos.append(args[i])
        i += 1
    # default flag threshold: 2x the data ratio — derived AFTER parsing
    # so an explicit --flag-ratio wins regardless of argument order
    if flag_ratio is None:
        flag_ratio = 2.0 * data_ratio
    base_p = pos[0] if len(pos) > 0 else "BENCH_LOCAL.json"
    k10_p = pos[1] if len(pos) > 1 else "BENCH_K10.json"
    base = json.load(open(base_p))["queries"]
    k10 = json.load(open(k10_p))["queries"]
    rows = []
    for q, t10 in k10.items():
        t1 = base.get(q)
        if t1 is None or t1 <= 0 or t10 <= 0:
            continue
        rows.append((q, t1, t10, t10 / t1))
    rows.sort(key=lambda r: -r[3])
    flagged = [q for q, t1, t10, r in rows
               if r > flag_ratio and (t1 >= min_sec or t10 >= min_sec)]
    ratios = sorted(r for _, _, _, r in rows)
    med = statistics.median(ratios) if ratios else None
    print(json.dumps({
        "n": len(rows),
        "data_ratio": data_ratio,
        "flag_ratio": flag_ratio,
        "flagged": flagged,
        "median_time_ratio": round(med, 2) if med is not None else None,
        "total_base_sec": round(sum(r[1] for r in rows), 1),
        "total_scaled_sec": round(sum(r[2] for r in rows), 1),
        "base_record": base_p,
        "scaled_record": k10_p,
    }))
    print(f"{'query':34s} {'base_s':>8s} {'scaled_s':>8s} {'ratio':>6s}")
    for q, t1, t10, r in rows[:10]:
        mark = " <FLAG" if q in flagged else ""
        print(f"{q:34s} {t1:8.2f} {t10:8.2f} {r:6.1f}{mark}")

if __name__ == "__main__":
    main()
