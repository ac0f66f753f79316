#!/usr/bin/env python3
"""Local t2 mirror (dev-only; the driver runs its own copy of this logic).

Usage: python3 tools/compare.py <sfDir> <outDir>

For each <outDir>/<name>/ parquet written by graft.Verify, run the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same parquet
tables, sort columns by name (the driver's compare does the same), and diff
row counts, dtypes, and exact values.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle sql"); continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        errs = []
        if list(got.columns) != list(want.columns):
            errs.append(f"cols spark={list(got.columns)} oracle={list(want.columns)}")
        if len(got) != len(want):
            errs.append(f"rows spark={len(got)} oracle={len(want)}")
        if not errs:
            for c in got.columns:
                gd, wd = str(got[c].dtype), str(want[c].dtype)
                if gd != wd:
                    errs.append(f"dtype {c}: spark={gd} oracle={wd}")
            # NaN==NaN via DataFrame.equals; exact otherwise (hash-match mirror)
            if not got.reset_index(drop=True).equals(want.reset_index(drop=True)):
                try:
                    diff = got.reset_index(drop=True).compare(want.reset_index(drop=True))
                    errs.append(f"{len(diff)} differing rows; first:\n{diff.head(3)}")
                except Exception as e:
                    errs.append(f"values differ (compare failed: {e})")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs)); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
