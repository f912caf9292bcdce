#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables, compare row/schema/hash.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [--skip q1,q2,...] [--json out.json]

--skip: query names whose ORACLE is itself quadratic at this scale (the
  documented gate-scale-bounded mirrors) — recorded as "skipped" in the
  JSON artifact, not silently dropped.
--json: write a CORRECTNESS-style per-query artifact.
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

def main(sf_dir, out_dir, skip=(), json_out=None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if name in skip:
            print(f"[{name}] SKIPPED (quadratic oracle at this scale)")
            results[name] = {"skipped": True}
            continue
        got_dir = f"{out_dir}/{name}"
        if not os.path.isdir(got_dir):
            print(f"[{name}] MISSING spark output"); n_fail += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": "missing spark output"}
            continue
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"[{name}] ORACLE ERROR: {e}"); n_fail += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"oracle: {e}"[:200]}
            continue
        files = glob.glob(f"{got_dir}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files})")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if sorted(got_cols) != sorted(want_cols):
            print(f"[{name}] SCHEMA MISMATCH got={sorted(got_cols)} want={sorted(want_cols)}")
            n_fail += 1
            results[name] = {"rows_match": len(got_rows) == len(want_rows),
                             "schema_match": False, "hash_match": False,
                             "spark_rows": len(got_rows), "oracle_rows": len(want_rows),
                             "err": None}
            continue
        g, w = canon(got_rows, got_cols), canon(want_rows, want_cols)
        results[name] = {"rows_match": len(g) == len(w), "schema_match": True,
                         "hash_match": g == w, "spark_rows": len(g),
                         "oracle_rows": len(w), "err": None}
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
    if json_out:
        json.dump(results, open(json_out, "w"), indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    skip, json_out = (), None
    if "--skip" in args:
        i = args.index("--skip"); skip = tuple(args[i + 1].split(",")); del args[i:i + 2]
    if "--json" in args:
        i = args.index("--json"); json_out = args[i + 1]; del args[i:i + 2]
    sys.exit(main(args[0], args[1], skip, json_out))
