#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Reads each parquet result dumped by graft.Verify under OUTDIR, runs the
corresponding DuckDB oracle SQL (from OUTDIR/oracle_sql.json) against
the same testdata tables, sorts columns by name on both sides, and
compares values exactly. Usage:

    python3 scripts/check_oracle.py SFDIR OUTDIR [query ...] \
        [--stage] [--mem LIMIT] [--tmp DIR] [--threads N] [--json OUT]

--stage rewrites each oracle's top-level non-recursive CTE prefix into
CREATE OR REPLACE TEMP TABLE steps executed one at a time, so a heavy
chain (the graph/LPA/CDC oracles unroll their pipelines over ~100x
pair volume at the K=10 probe) materializes each stage to disk instead
of holding the whole monolithic plan's intermediates in memory — the
r6 probe's four >79 GB spill aborts were exactly this. Recursive CTEs
stay in a WITH RECURSIVE wrapper over the staged prefix (temp tables
are visible to it). Results are identical; only peak memory changes.
--mem/--tmp/--threads set the matching DuckDB PRAGMAs so the probe run
is resource-bounded instead of OOM-killed.
"""
import sys, os, json, math, re, time, functools
print = functools.partial(print, flush=True)
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def split_ctes(sql):
    """Parse a top-level `WITH [RECURSIVE] a AS (..), b AS (..) SELECT ..`
    into ([(name, body), ...], final_select). Returns (None, sql) when
    the statement has no top-level WITH. Tracks paren depth and
    single-quote state only (the oracle corpus uses no quoted
    identifiers or dollar strings)."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.I)
    if not m:
        return None, sql
    i = m.end()
    ctes = []
    n = len(sql)
    while True:
        m2 = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", sql[i:], re.I)
        if not m2:
            return None, sql  # unparseable shape: run monolithic
        name = m2.group(1)
        j = i + m2.end()  # position after the opening paren
        depth, q, k = 1, False, j
        while k < n and depth > 0:
            c = sql[k]
            if q:
                if c == "'":
                    q = False
            elif c == "'":
                q = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth != 0:
            return None, sql
        ctes.append((name, sql[j:k - 1]))
        m3 = re.match(r"\s*,", sql[k:])
        if m3:
            i = k + m3.end()
        else:
            return ctes, sql[k:]

def self_refs(name, body):
    return re.search(r"\b%s\b" % re.escape(name), body) is not None

def stage_query(con, sql):
    """Execute the maximal non-recursive CTE prefix as temp tables;
    return (final_sql_for_compare, staged_names)."""
    ctes, final = split_ctes(sql)
    if not ctes:
        # Distinguish "no WITH clause" (nothing to stage) from "WITH
        # present but unparseable" (silent monolithic fallback would
        # reintroduce the r6 spill-abort class with no signal).
        fellback = bool(re.match(r"\s*WITH\b", sql, re.I))
        return sql, [], fellback
    staged = []
    rest = []
    for idx, (name, body) in enumerate(ctes):
        if rest or self_refs(name, body):
            rest.append((name, body))
        else:
            con.execute(f"CREATE OR REPLACE TEMP TABLE {name} AS {body}")
            staged.append(name)
    if rest:
        with_clause = "WITH RECURSIVE " + ", ".join(
            f"{name} AS ({body})" for name, body in rest)
        return with_clause + " " + final, staged, False
    return final, staged, False

def main():
    args = [a for a in sys.argv[1:]]
    opts = {"stage": False, "mem": None, "tmp": None, "threads": None,
            "json": None}
    pos = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--stage":
            opts["stage"] = True
        elif a in ("--mem", "--tmp", "--threads", "--json"):
            opts[a[2:]] = args[i + 1]
            i += 1
        else:
            pos.append(a)
        i += 1
    sfdir, outdir = pos[0], pos[1]
    only = set(pos[2:])

    # Disk-bounding (r11): spills always go to a PINNED temp dir, and
    # the sweep refuses to start without headroom — a shard that would
    # ENOSPC mid-flight reddens every suite sharing the filesystem.
    if not opts["tmp"]:
        opts["tmp"] = "/tmp/duck_tmp"
    os.makedirs(opts["tmp"], exist_ok=True)
    free_gb = os.statvfs(opts["tmp"]).f_bavail * os.statvfs(opts["tmp"]).f_frsize / 2**30
    min_free = float(os.environ.get("GRAFT_MIN_FREE_GB", "20"))
    if free_gb < min_free:
        print(f"check_oracle: only {free_gb:.1f}G free under {opts['tmp']} "
              f"(need {min_free}G; clean spills, or run heavy shards "
              f"sequentially, or set GRAFT_MIN_FREE_GB)")
        sys.exit(2)

    def fresh_connection():
        c = duckdb.connect()
        if opts["mem"]:
            c.execute(f"SET memory_limit='{opts['mem']}'")
        if opts["tmp"]:
            c.execute(f"SET temp_directory='{opts['tmp']}'")
        if opts["threads"]:
            c.execute(f"SET threads={opts['threads']}")
        for t in TABLES:
            p = f"{sfdir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    con = fresh_connection()
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    record = {}
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        if only and name not in only:
            continue
        t0 = time.time()
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        cols = sorted(spark_rel.columns)
        got = con.execute(
            f"SELECT {', '.join(cols)} FROM '{outdir}/{name}/*.parquet'"
        ).fetchall()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            record[name] = {"status": "no-oracle", "rows": len(got)}
            n_skip += 1
            continue
        staged = []
        stage_fallback = False
        try:
            if opts["stage"]:
                final_sql, staged, stage_fallback = stage_query(con, oracle[name])
                if stage_fallback:
                    print(f"NOTE  {name}: --stage requested but WITH "
                          f"clause unparseable; ran monolithic")
            else:
                final_sql = oracle[name]
            exp_rel = con.sql(final_sql)
            ecols = sorted(exp_rel.columns)
            exp = con.execute(
                f"SELECT {', '.join(ecols)} FROM ({final_sql})"
            ).fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            record[name] = {"status": "oracle-error", "err": str(e)[:300]}
            n_fail += 1
            if "No space left" in str(e):
                # a spill-aborted query leaves its temp storage PINNED
                # by the connection; without a reset every later query
                # ENOSPCs on the same dead file (the r10 cascade:
                # one heavy failure took out 10 innocent queries)
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_connection()
                print(f"NOTE  {name}: reset connection after spill abort")
            continue
        finally:
            for s in staged:
                try:
                    con.execute(f"DROP TABLE IF EXISTS {s}")
                except Exception:
                    pass
        dt = round(time.time() - t0, 2)
        if cols != ecols:
            print(f"FAIL  {name}: columns {cols} vs oracle {ecols}")
            record[name] = {"status": "cols", "spark": cols, "oracle": ecols}
            if stage_fallback:
                record[name]["stage_fallback"] = True
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: {len(got)} rows vs oracle {len(exp)}")
            record[name] = {"status": "rows", "spark": len(got),
                            "oracle": len(exp)}
            if stage_fallback:
                record[name]["stage_fallback"] = True
            n_fail += 1
            continue
        bad = None
        for i2, (g, e) in enumerate(zip(got, exp)):
            if tuple(map(norm, g)) != tuple(map(norm, e)):
                bad = (i2, g, e)
                break
        if bad:
            print(f"FAIL  {name}: first diff at row {bad[0]}:")
            print(f"      spark:  {bad[1]}")
            print(f"      oracle: {bad[2]}")
            record[name] = {"status": "values", "row": bad[0],
                            "spark": str(bad[1])[:300],
                            "oracle": str(bad[2])[:300]}
            if stage_fallback:
                record[name]["stage_fallback"] = True
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(got)} rows, {len(cols)} cols, {dt}s)")
            record[name] = {"status": "pass", "rows": len(got), "sec": dt}
            if stage_fallback:
                record[name]["stage_fallback"] = True
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} no-oracle")
    if opts["json"]:
        with open(opts["json"], "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
