#!/usr/bin/env python3
"""Build a sf1-scale probe dataset by replicating the sf0.1 fact tables 10x
with shifted primary keys (dims copied as-is). Dev tool only — NOT part of
the shipped library; used for the per-round superlinearity probe recorded in
PLANS.md.

Key shifting keeps joins consistent: l_orderkey and o_orderkey shift
together, so every lineitem still finds its order; foreign keys into the
dims (custkey, suppkey, partkey, nationkey) are left unchanged, so per-dim
fan-in grows 10x — exactly what a 10x corpus does to a fixed dim.

Usage: scripts/make_sf1.py [srcDir] [dstDir] [copies]
"""
import os, shutil, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 100_000_000  # beyond any key in sf0.1

# fact table -> columns to shift per copy
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

con = duckdb.connect()
os.makedirs(DST, exist_ok=True)
for d in DIMS:
    shutil.copyfile(f"{SRC}/{d}.parquet", f"{DST}/{d}.parquet")
for t, keys in FACTS.items():
    outdir = f"{DST}/{t}.parquet"
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
    ).fetchall()]
    for i in range(COPIES):
        sel = ", ".join(
            f"{c} + {i * SHIFT} AS {c}" if c in keys else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{outdir}/part-{i:02d}.parquet' (FORMAT PARQUET)")
    print(f"{t}: {COPIES} copies -> {outdir}")
print("done")
