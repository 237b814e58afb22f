#!/usr/bin/env python3
"""Dev-only oracle precheck, mirroring the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the same sf dir, then
compares against the Spark parquet dump (columns sorted by name, rows
sorted, exact value equality). Usage:
    python3 tools/precheck.py /tmp/verify_out /root/testdata/sf0.01
Not part of the engine — the engine is pure Scala/Spark.
"""
import sys, json, os, glob
import duckdb

def main(outdir, sfdir):
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        try:
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
            want = con.sql(sql).df()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            for df in (got, want):  # bytearray isn't sortable/hashable
                for c in df.columns:
                    if df[c].dtype == object:
                        df[c] = df[c].map(
                            lambda v: bytes(v) if isinstance(v, (bytes, bytearray)) else v)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1; continue
            if got.shape != want.shape:
                print(f"FAIL {name}: shape {got.shape} vs {want.shape}")
                n_fail += 1; continue
            gs = got.sort_values(by=list(got.columns), ignore_index=True)
            ws = want.sort_values(by=list(want.columns), ignore_index=True)
            if gs.equals(ws):
                print(f"PASS {name} ({got.shape[0]} rows)")
                n_pass += 1
            else:
                neq = (gs != ws) & ~(gs.isna() & ws.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {bad.sum()} mismatched rows of {len(gs)}")
                print("  spark:", gs[bad].head(3).to_dict("records"))
                print("  oracle:", ws[bad].head(3).to_dict("records"))
                n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
