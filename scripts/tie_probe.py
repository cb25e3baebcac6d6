#!/usr/bin/env python3
"""Empirical .5-tie probe for the quotient/transcendental rnd() sites that
cannot be proven tie-free by the scale/thirds algebra (PLANS.md round-5 rnd
audit). For each site it re-runs the oracle SQL with the rounding wrapper
stripped (exact-substring swap, asserted unique) and reports the minimum
distance of x*10^n to the nearest half-integer over the actual testdata.
A distance >> double noise (~1e-10) means no row can flip under a
different libm/FMA build. Dev tool only — NOT part of the shipped library.

Usage: scripts/tie_probe.py [sfDir] [oracleJson]
Exit 1 if any site's min distance < 1e-8.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# (query, [(needle, replacement)], [(column, n, label)])
SITES = [
    ("q_lit_positions",
     [("floor((js.lease_value - js.loan - js.down_payment - js.margin_interest\n"
       "    - js.loan_interest - COALESCE(rp.repayment_stable, 0)) / js.down_payment * 100.0\n"
       "    * 100.0 + 0.5) / 100.0 AS pnl_pct",
       "((js.lease_value - js.loan - js.down_payment - js.margin_interest\n"
       "    - js.loan_interest - COALESCE(rp.repayment_stable, 0)) / js.down_payment * 100.0)"
       " AS pnl_pct"),
      ("floor(((js.loan / 0.9) / js.lease_value) * p.current_price\n"
       "                    * 10000.0 + 0.5) / 10000.0",
       "(((js.loan / 0.9) / js.lease_value) * p.current_price)"),
      ("floor(js.lease_value / (js.loan_token_amount / 0.9)\n"
       "                    * 10000.0 + 0.5) / 10000.0",
       "(js.lease_value / (js.loan_token_amount / 0.9))")],
     [("pnl_pct", 2, "positions.pnl_pct"),
      ("liquidation_price", 4, "positions.liquidation_price")]),
    ("q_lit_utilization_levels",
     [("floor((power(1.0 + ea.apr_simple / 100.0 / 365.0, 365) - 1.0) * 100.0\n"
       "            * 1000000.0 + 0.5) / 1000000.0",
       "((power(1.0 + ea.apr_simple / 100.0 / 365.0, 365) - 1.0) * 100.0)")],
     [("earn_apr", 6, "utilization.earn_apr")]),
    ("q_lit_pnl_buckets",
     [("floor(CAST(100.0 AS DOUBLE) * COALESCE(c.cnt, 0) / t.total\n"
       "      * 100.0 + 0.5) / 100.0",
       "(CAST(100.0 AS DOUBLE) * COALESCE(c.cnt, 0) / t.total)")],
     [("share_percent", 2, "buckets.share_percent")]),
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    oj = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    oracle = json.load(open(oj))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written multi-file table (sf1 probe)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    worst_overall = None
    ok = True
    for name, swaps, cols in SITES:
        sql = oracle[name]
        for needle, repl in swaps:
            assert sql.count(needle) == 1, \
                f"{name}: rounding wrapper drifted; update tie_probe.py:\n{needle}"
            sql = sql.replace(needle, repl)
        df = con.execute(sql).df()
        for col, n, label in cols:
            vals = [v for v in df[col].tolist()
                    if v is not None and not (isinstance(v, float) and math.isnan(v))]
            # floor(x*p+0.5) is a deterministic pure function of x's bits in
            # any non-FMA IEEE engine (at a representable half the +0.5 add
            # is exact), so the rnd layer itself cannot flip. What a flip
            # needs is a 1-ulp UPSTREAM divergence of x while x*10^n sits
            # within ~ulp of a k+0.5 boundary. Two classes:
            #  - boundary rows (dist <= 4 ulp of x*10^n): sensitivity equals
            #    that of every unrounded double column — representational
            #    density, reported but not failed;
            #  - algebraic-coincidence rows (dist in (4 ulp, 1e-8)): the true
            #    rational value targets the boundary far more precisely than
            #    density explains — the r4 wallet failure signature → FAIL
            #    (convert that site to exact decimals like the 10^d sites).
            dmin, argmin, n_boundary = None, None, 0
            for v in vals:
                scaled = float(v) * 10 ** n
                fr = math.fmod(scaled, 1.0)
                d = abs(abs(fr) - 0.5)  # fmod keeps sign for negatives
                if d <= 4 * math.ulp(scaled):
                    n_boundary += 1
                    continue
                if dmin is None or d < dmin:
                    dmin, argmin = d, v
            status = "OK" if (dmin is None or dmin >= 1e-8) else "TIE-RISK"
            if status != "OK":
                ok = False
            print(f"{status} {label}: rows={len(vals)} boundary_rows={n_boundary} "
                  f"min_dist={dmin if dmin is not None else 'n/a'} at x={argmin}")
            if dmin is not None and (worst_overall is None or dmin < worst_overall):
                worst_overall = dmin
    print(f"== worst distance across all sites: {worst_overall} ==")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
