#!/usr/bin/env python3
"""Lint every oracle SQL's result-column types against a pinned set.

The r3/r4 red-row class was always the same: a DuckDB oracle column whose
type drifts across DuckDB builds or diverges from Spark's output type —
HUGEINT from sum()/window-sum/integer division, or INTEGER from a bare
list literal — while values still compare equal locally. A type-sensitive
hasher at the driver (Arrow decimal128 vs int64) then flags a hash
mismatch. This lint retires the class: every oracle result column must
have a type in the pinned set below.

Runs each query under `LIMIT 0` semantics (DESCRIBE) so the whole corpus
lints in seconds. Usage:

    python3 scripts/lint_oracle_types.py SFDIR ORACLE_JSON [query ...]

where ORACLE_JSON is the oracle_sql.json dumped by graft.Verify.
"""
import sys, os, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types Spark's parquet dump can represent one-to-one and whose Arrow
# encoding is stable: anything else has bitten us (HUGEINT ×3 rounds).
PINNED = re.compile(
    r"^(BIGINT|DOUBLE|VARCHAR|DATE|TIMESTAMP|TIMESTAMP WITH TIME ZONE|"
    r"BOOLEAN|FLOAT|DECIMAL\(\d+,\d+\)|"
    r"(BIGINT|DOUBLE|VARCHAR)\[\]|INTEGER|SMALLINT|TINYINT)$")
# INTEGER/SMALLINT/TINYINT are allowed only when they come straight from
# a parquet column (the fixtures have none — all int64 — so in practice
# any INTEGER is literal-sourced and suspect). Flag them as warnings.
WARN = {"INTEGER", "SMALLINT", "TINYINT"}


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    n_ok = n_warn = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle does not parse: {e}")
            n_fail += 1
            continue
        bad = [(c, t) for (c, t, *_) in desc if not PINNED.match(t)]
        warn = [(c, t) for (c, t, *_) in desc if t in WARN]
        if bad:
            print(f"FAIL  {name}: unpinned column types {bad}")
            n_fail += 1
        elif warn:
            print(f"WARN  {name}: literal-width integer columns {warn}")
            n_warn += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_warn} warn, {n_fail} fail "
          f"(of {len(only) if only else len(oracle)} linted)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
