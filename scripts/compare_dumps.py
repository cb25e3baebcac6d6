#!/usr/bin/env python3
"""Parallelism-independence census: compare two graft.Verify dump trees
(e.g. local[4] vs local[16]) under the strict compare — arrow types AND
exact sorted cell values per query. Dev tool only.

Usage: scripts/compare_dumps.py <dirA> <dirB>
"""
import sys, os, glob

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pyarrow.parquet as pq
from check import canon_type, table_rows


def read_dir(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


def main():
    a_root, b_root = sys.argv[1], sys.argv[2]
    names = sorted(n for n in os.listdir(a_root)
                   if os.path.isdir(os.path.join(a_root, n)))
    b_names = sorted(n for n in os.listdir(b_root)
                     if os.path.isdir(os.path.join(b_root, n)))
    if names != b_names:
        print(f"FAIL query sets differ: only-A={set(names)-set(b_names)} "
              f"only-B={set(b_names)-set(names)}")
        sys.exit(1)
    bad = 0
    for n in names:
        ta = read_dir(os.path.join(a_root, n))
        tb = read_dir(os.path.join(b_root, n))
        if ta is None or tb is None:
            print(f"FAIL {n}: missing parquet ({ta is None} / {tb is None})")
            bad += 1
            continue
        cols = sorted(ta.column_names)
        if cols != sorted(tb.column_names):
            print(f"FAIL {n}: columns {cols} vs {sorted(tb.column_names)}")
            bad += 1
            continue
        ta, tb = ta.select(cols), tb.select(cols)
        tya = [canon_type(f.type) for f in ta.schema]
        tyb = [canon_type(f.type) for f in tb.schema]
        if tya != tyb:
            print(f"FAIL {n}: types {tya} vs {tyb}")
            bad += 1
            continue
        if table_rows(ta) != table_rows(tb):
            print(f"FAIL {n}: cell values differ")
            bad += 1
            continue
    print(f"== {len(names) - bad} identical / {bad} differ ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
