#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables and
compare (columns sorted by name, rows sorted, values normalized).

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    results = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    n_pass = n_fail = n_weak = 0
    # a query that THREW inside graft.Verify leaves no dump at all — surface
    # it as a FAIL instead of silently comparing only what exists (Verify
    # catches per-query errors to keep the rest of the dump going)
    dumped = {os.path.basename(d) for d in results}
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL  {name}: oracle declared but no result dumped "
              f"(query likely threw — check the Verify log)")
        n_fail += 1
    for d in results:
        name = os.path.basename(d)
        try:
            scols = [x[0] for x in con.execute(
                f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()]
            srows = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchall()
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            # golden-file compare for outputs not derivable in SQL (e.g. DDL
            # strings): tools/goldens/<name>.json = {"columns": [...], "rows": [[...]]}
            gpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "goldens", f"{name}.json")
            if os.path.exists(gpath):
                want = json.load(open(gpath))
                sc, sr = canon(scols, srows)
                wc, wr = canon(want["columns"], [tuple(r) for r in want["rows"]])
                if sc == wc and sr == wr:
                    print(f"PASS  {name}: {len(sr)} rows (golden)")
                    n_pass += 1
                else:
                    print(f"FAIL  {name}: golden mismatch "
                          f"(cols {sc} vs {wc}; first row diff "
                          f"{next(((a, b) for a, b in zip(sr, wr) if a != b), None)})")
                    n_fail += 1
                continue
            print(f"WEAK  {name}: no oracle, rows={len(srows)}")
            n_weak += 1
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [x[0] for x in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(scols, srows)
        oc, orws = canon(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: schema mismatch spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orws:
            n_fail += 1
            diff = [(a, b) for a, b in zip(sr, orws) if a != b]
            extra_s = len(sr) - len(orws)
            print(f"FAIL  {name}: rows spark={len(sr)} oracle={len(orws)} "
                  f"(first diffs: {diff[:3]}, rowcount delta {extra_s}) cols={sc}")
            oset, sset = set(orws), set(sr)
            only_s = [r for r in sr if r not in oset][:2]
            only_o = [r for r in orws if r not in sset][:2]
            print(f"      only-spark: {only_s}  only-oracle: {only_o}")
        else:
            print(f"PASS  {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
