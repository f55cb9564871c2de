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
import pyarrow as pa
import pyarrow.parquet as pq

def _norm_type(t):
    """Normalize an arrow type to what a type-faithful hash would see.

    Only representation-level wrappers are collapsed (dictionary
    encoding, large_* offsets); VALUE types are kept exact — int64 vs
    decimal128 or float32 vs float64 must FAIL, that is the point.
    """
    if pa.types.is_dictionary(t):
        return _norm_type(t.value_type)
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(_norm_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(t.field(i).name, _norm_type(t.field(i).type))
                          for i in range(t.num_fields)])
    if pa.types.is_map(t):
        return pa.map_(_norm_type(t.key_type), _norm_type(t.item_type))
    return t

def _dtype_mismatches(qdir, duck_rel):
    """Compare Spark-written parquet arrow types vs DuckDB result arrow
    types per column. Returns list of (col, spark_type, duck_type)."""
    parts = sorted(glob.glob(os.path.join(qdir, "part-*.parquet"))) or \
        sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    if not parts:
        return [("<no parquet parts found>", "-", "-")]
    schemas = [pq.ParquetFile(p).schema_arrow for p in parts]
    if any(sch != schemas[0] for sch in schemas[1:]):
        return [("<part files disagree on schema>", "-", "-")]
    spark_schema = schemas[0]
    duck_schema = duck_rel.schema
    duck_types = {f.name: f.type for f in duck_schema}
    bad = []
    for f in spark_schema:
        dt = duck_types.get(f.name)
        if dt is None:
            continue  # column-name mismatch is reported separately
        st_n, dt_n = _norm_type(f.type), _norm_type(dt)
        if st_n != dt_n:
            bad.append((f.name, str(f.type), str(dt)))
    return bad

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
            duck_rel = con.execute(oracle[q]).arrow()
            duck_df = duck_rel.to_pandas()
        except Exception as e:
            print(f"FAIL {q}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # type-faithful gate: the driver hashes typed values, so an
        # int64-vs-decimal128 (uncast DuckDB sum) or float32-vs-float64
        # divergence fails there even when every value matches after
        # pandas coercion. Catch it here, before the value compare.
        bad_types = _dtype_mismatches(qdir, duck_rel)
        if bad_types:
            for c, st, dt in bad_types:
                print(f"FAIL {q}: dtype '{c}' spark={st} duck={dt}")
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
        # value compare. Schema-level dtype differences were already
        # rejected by the strict gate above; the float branch here only
        # absorbs pandas-coercion artifacts (nullable-int -> float etc.),
        # not engine type divergence.
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
