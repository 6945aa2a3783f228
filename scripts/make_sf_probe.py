#!/usr/bin/env python3
"""Generate a larger-SF magnitude probe from the driver testdata.

The scale-revealed failure class so far (q_tpch_disjunct ulp at sf0.1,
r3 q_kmeans_step, the r4 HUGEINT reds) only surfaces when aggregate
MAGNITUDES grow — sums crossing int32/ulp/width edges — so the probe's
job is magnitude, not distribution realism. It replicates sf0.1 K times
with consistent key offsets (referential integrity preserved: lineitem
→ orders/part/supplier, orders/events → customer), keeping the dims
(region, nation) single-copy so fixture-calibrated constants (NATION_2,
date ranges) stay valid. Payload columns (text, embeddings, ts) are
copied verbatim: copies are exact near-dup clusters, which stresses the
dedup/ANN paths at 3x the pair volume — deterministic on both engines,
so the DuckDB oracle compare stays exact.

Usage: python3 scripts/make_sf_probe.py [SRC_SF_DIR] [OUT_DIR] [K]
Defaults: /root/testdata/sf0.1 /tmp/graft_sfprobe 3
"""
import sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sfprobe"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 3

# r13: row-group size for the replicated tables. DuckDB's default
# (122,880 rows) makes every probe table a ONE-row-group file, and a
# parquet row group is Spark's scan-parallelism quantum — so the whole
# tokenize/decode map phase of every text-family query ran on ONE task
# at K=10 (q_bm25 profile: a 50 s single-task stage while 31 cores
# idled), which measures a fixture artifact, not the plans: production
# tables have >= cores splits. Small row groups (together with a probe
# maxPartitionBytes below the file size, e.g.
# SPARK_GRAFT_CONF=spark.sql.files.maxPartitionBytes=8m) give the
# probe corpus the many-splits shape real data has. Pass 0 to keep the
# writer default.
RGS = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
RG = f" (ROW_GROUP_SIZE {RGS})" if RGS else ""

# One offset unit per keyspace, far above any sf1 key.
OFF = 100_000_000

# table -> {column: offset-multiplier-slot}; slots keep foreign keys
# consistent across tables (orders.o_custkey and events.user_id share
# the customer slot, etc.). Columns not listed are copied verbatim.
KEYED = {
    "customer": {"c_custkey": 1},
    "supplier": {"s_suppkey": 2},
    "part": {"p_partkey": 3},
    "orders": {"o_orderkey": 4, "o_custkey": 1},
    "lineitem": {"l_orderkey": 4, "l_partkey": 3, "l_suppkey": 2},
    "events": {"event_id": 5, "user_id": 1},
    "documents": {"doc_id": 6},
    "embeddings": {"vec_id": 7},
}
SINGLE = ["region", "nation"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in SINGLE:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet'{RG}")
        print(f"{t}: single copy")
    for t, keys in KEYED.items():
        cols = [c for (c, _, *_) in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        parts = []
        for k in range(K):
            sel = ", ".join(
                f"{c} + {k * keys[c] * OFF} AS {c}" if c in keys else c
                for c in cols)
            parts.append(f"SELECT {sel} FROM '{SRC}/{t}.parquet'")
        union = " UNION ALL ".join(parts)
        con.execute(f"COPY ({union}) TO '{OUT}/{t}.parquet'{RG}")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {K} copies, {n} rows")


if __name__ == "__main__":
    main()
