#!/usr/bin/env python3
"""Assemble the round's per-query probe evidence into PROBES_r07.json.

Merges the per-job --json outputs of scripts/check_oracle.py runs at
the K=3 (sf0.3-equivalent) and K=10 (sf1-equivalent) magnitude probes
into one {query: {k3: status, k10: status, k30: status,
k*_oracle_sec}} map plus a summary (any k<N>= tier accepted), so the SURVEY §6
highest-confirmed-scale table is generated from recorded runs, not
assertions. Schema note: PROBES_r07.json used the old *_sec key names;
r09 onward uses *_oracle_sec (the value is the DuckDB oracle's wall
time, not the engine's) — cross-round readers must handle both. Pass any number of JSON paths
tagged k3=/k10= on the command line:

    python3 scripts/assemble_probe_evidence.py out.json \
        k3=/tmp/k3_4.json k3=/tmp/k3_17.json k10=/tmp/k10_4.json ...
"""
import sys, json

def main():
    out_path = sys.argv[1]
    merged = {}
    for arg in sys.argv[2:]:
        tier, path = arg.split("=", 1)
        if not __import__("re").fullmatch(r"k\d+", tier):
            # A typo'd tier would silently merge under a key the summary
            # ignores, making a forgotten/mistagged probe look complete.
            sys.exit(f"unknown tier {tier!r} in {arg!r}: expected k<N>= (k3=/k10=/k30=)")
        try:
            data = json.load(open(path))
        except FileNotFoundError:
            print(f"missing: {path}", file=sys.stderr)
            continue
        for q, rec in data.items():
            e = merged.setdefault(q, {})
            # ONE current status per (query, tier): a later record for the
            # same tier SUPERSEDES the earlier one (e.g. a spill-abort
            # retried with --stage), and the superseded attempt moves to
            # an attempts list instead of lingering as a contradictory
            # detail blob next to a pass (the r7 q_embed_clusters lesson).
            if tier in e:
                e.setdefault(f"{tier}_attempts", []).append(
                    {"status": e[tier],
                     **({"detail": e.pop(f"{tier}_detail")}
                        if f"{tier}_detail" in e else {}),
                     **({"oracle_sec": e.pop(f"{tier}_oracle_sec")}
                        if f"{tier}_oracle_sec" in e else {})})
            e[tier] = rec.get("status")
            e.pop(f"{tier}_detail", None)
            e.pop(f"{tier}_oracle_sec", None)
            if "sec" in rec:
                # check_oracle timings measure the DUCKDB oracle, not the
                # engine — name them so: engine seconds live in the
                # BENCH_K10-style artifacts, not here.
                e[f"{tier}_oracle_sec"] = rec["sec"]
            if rec.get("status") not in ("pass", "no-oracle"):
                e[f"{tier}_detail"] = rec
    tiers = sorted({t for e in merged.values() for t in e
                    if __import__("re").fullmatch(r"k\d+", t)},
                   key=lambda t: int(t[1:]))
    summary = {"n_queries": len(merged), "tiers": tiers}
    for t in tiers:
        summary[f"{t}_pass"] = sum(
            1 for e in merged.values() if e.get(t) == "pass")
        summary[f"{t}_other"] = sorted(
            q for q, e in merged.items() if t in e and e[t] != "pass")
        # Queries with no record at a tier are distinct from non-passes:
        # a forgotten probe job must not read as evidence-complete.
        # (A subset tier like k30-top-25 legitimately has many missing;
        # the SURVEY text names the subset rule.)
        summary[f"{t}_missing"] = sorted(
            q for q, e in merged.items() if t not in e)
    json.dump({"summary": summary, "queries": merged},
              open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))

if __name__ == "__main__":
    main()
