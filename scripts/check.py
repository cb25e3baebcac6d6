#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (t2): run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Spark result parquet
written by graft.Verify. Dev tool only — NOT part of the shipped library.

Compare is strict: column names (sorted), row count, and exact cell values
after sorting rows by all columns. If this passes, any reasonable hash-based
compare passes too.

Usage: scripts/check.py [sfDir] [outDir] [only_query ...]
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable primitives
    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        # arrays BEFORE the numpy-scalar branch: ndarray also has .item,
        # which raises on multi-element arrays
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(cell(x) for x in v)
        if hasattr(v, "item"):  # numpy scalar
            v = v.item()
        import decimal
        if isinstance(v, decimal.Decimal):
            # EXACT value compare (canonical exponent, so 1.50 == 1.5 but a
            # 1-ulp diff fails). Collapsing to float here hid the r4
            # q_lit_wallet_tx_volume sub-float-precision mismatch that the
            # driver's exact hash caught — decimals must never degrade.
            return ("dec", str(v.normalize()))
        return v
    # build plain-python rows directly — pandas re-coerces None to NaN on
    # column assignment, and nan != nan would produce spurious diffs
    raw = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows = sorted(raw, key=lambda r: tuple(
        (x is None, str(type(x)), str(x)) for x in r))
    return df.columns.tolist(), rows


def selftest():
    """norm() must distinguish decimals that differ by 1 ulp at scale 6 (the
    r4 failure class) and must treat rescaled-equal decimals as equal."""
    from decimal import Decimal
    a = pd.DataFrame({"x": [Decimal("20893331.915740")]})
    b = pd.DataFrame({"x": [Decimal("20893331.915741")]})
    c = pd.DataFrame({"x": [Decimal("20893331.91574000")]})
    assert norm(a) != norm(b), "1-ulp decimal diff must FAIL the compare"
    assert norm(a) == norm(c), "trailing-zero rescale must still compare equal"
    assert norm(a) != norm(pd.DataFrame({"x": [20893331.915740]})), \
        "decimal vs float type confusion must FAIL, not coerce"
    print("selftest OK")
    sys.exit(0)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written multi-file table (sf1 probe)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = f"{out}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {res_dir}")
            n_fail += 1
            continue
        try:
            exp_cols, exp_rows = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got_cols, got_rows = norm(con.execute(
            f"SELECT * FROM read_parquet({files!r})").df())
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns differ\n  oracle: {exp_cols}\n  spark : {got_cols}")
            n_fail += 1
            continue
        if len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: row count oracle={len(exp_rows)} spark={len(got_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(exp_rows, got_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(exp_rows)} rows differ; first at {i}:\n  oracle: {a}\n  spark : {b}\n  cols  : {exp_cols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp_rows)} rows)")
            n_pass += 1
    # queries without oracle get a rows-only note
    res_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
    for name in sorted(res_dirs - set(oracle)):
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{name}/*.parquet')").fetchone()[0]
        print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
