#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

For each query dir under <verifyOutDir>: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables =
<sfDir>/*.parquet registered as views), sort columns by name, sort rows,
and compare values. Prints PASS/FAIL per query. Dev tool only — the
shipped Scala library never touches DuckDB.
"""
import json, sys, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for q in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, q)
        if not os.path.isdir(qdir):
            continue
        if only and q not in only:
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if q not in oracle:
            print(f"SKIP {q}: no oracle ({len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            duck_df = con.execute(oracle[q]).fetchdf()
        except Exception as e:
            print(f"FAIL {q}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {q}: columns {list(s.columns)} != {list(d.columns)}")
            n_fail += 1
            continue
        s = s.sort_values(by=list(s.columns), ignore_index=True)
        d = d.sort_values(by=list(d.columns), ignore_index=True)
        if len(s) != len(d):
            print(f"FAIL {q}: rows {len(s)} != {len(d)}")
            n_fail += 1
            continue
        # value compare with dtype tolerance (int32 vs int64 etc.)
        ok = True
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                import pandas as pd
                if sv.dtype.kind in "fc" or dv.dtype.kind in "fc":
                    import numpy as np
                    if os.environ.get("STRICT"):
                        # driver-faithful: hash compare distinguishes -0.0
                        # from 0.0 and any last-ulp difference — compare
                        # bit patterns, not tolerances
                        sb = sv.astype(float).map(lambda x: repr(float(x)))
                        db = dv.astype(float).map(lambda x: repr(float(x)))
                        if not sb.equals(db):
                            ok = False
                            mism = sb != db
                            for i in mism[mism].index[:8]:
                                print(f"    STRICT row {i}: spark={sb[i]} duck={db[i]}")
                    elif not np.allclose(sv.astype(float), dv.astype(float),
                                         rtol=0, atol=0, equal_nan=True):
                        ok = False
                elif not sv.astype(str).equals(dv.astype(str)):
                    ok = False
            except Exception as e:
                print(f"  compare error col {c}: {e}")
                ok = False
            if not ok:
                print(f"FAIL {q}: column '{c}' differs")
                mism = (sv.astype(str) != dv.astype(str))
                idx = mism[mism].index[:5]
                for i in idx:
                    print(f"    row {i}: spark={sv[i]!r} duck={dv[i]!r}")
                break
        if ok:
            print(f"PASS {q} ({len(s)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
