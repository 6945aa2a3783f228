#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Reads each parquet result dumped by graft.Verify under OUTDIR, runs the
corresponding DuckDB oracle SQL (from OUTDIR/oracle_sql.json) against
the same testdata tables, sorts columns by name on both sides, and
compares values exactly. Usage:

    python3 scripts/check_oracle.py SFDIR OUTDIR [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        if only and name not in only:
            continue
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        cols = sorted(spark_rel.columns)
        got = con.execute(
            f"SELECT {', '.join(cols)} FROM '{outdir}/{name}/*.parquet'"
        ).fetchall()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
            ecols = sorted(exp_rel.columns)
            exp = con.execute(
                f"SELECT {', '.join(ecols)} FROM ({oracle[name]})"
            ).fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if cols != ecols:
            print(f"FAIL  {name}: columns {cols} vs oracle {ecols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: {len(got)} rows vs oracle {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if tuple(map(norm, g)) != tuple(map(norm, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL  {name}: first diff at row {bad[0]}:")
            print(f"      spark:  {bad[1]}")
            print(f"      oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(got)} rows, {len(cols)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
