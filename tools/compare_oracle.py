#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables, compare row/schema/hash.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, stringify values, sort rows (driver-style)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        got_dir = f"{out_dir}/{name}"
        if not os.path.isdir(got_dir):
            print(f"[{name}] MISSING spark output"); n_fail += 1; continue
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"[{name}] ORACLE ERROR: {e}"); n_fail += 1; continue
        files = glob.glob(f"{got_dir}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files})")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if sorted(got_cols) != sorted(want_cols):
            print(f"[{name}] SCHEMA MISMATCH got={sorted(got_cols)} want={sorted(want_cols)}")
            n_fail += 1; continue
        g, w = canon(got_rows, got_cols), canon(want_rows, want_cols)
        if g == w:
            print(f"[{name}] OK rows={len(g)}"); n_pass += 1
        else:
            only_g = [x for x in g if x not in set(w)][:3]
            only_w = [x for x in w if x not in set(g)][:3]
            print(f"[{name}] ROW MISMATCH got={len(g)} want={len(w)}")
            print(f"   only-got : {only_g}")
            print(f"   only-want: {only_w}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
