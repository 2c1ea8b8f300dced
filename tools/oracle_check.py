#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate:
run Verify's parquet dumps against DuckDB oracles on the same tables.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def norm(df):
    # driver sorts columns by name before hashing values
    df = df[sorted(df.columns)]
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s, o = norm(spark_df), norm(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1; continue
        # row-order-insensitive value compare (sort by all columns)
        s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o2 = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(s2, o2, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")[0:6]
            print(f"FAIL {name}: values differ: " + " | ".join(msg)); n_fail += 1
            # show first few diffs
            for c in s2.columns:
                neq = ~(s2[c].eq(o2[c]) | (s2[c].isna() & o2[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"   col {c}: row {i}: spark={s2[c][i]!r} oracle={o2[c][i]!r} ({int(neq.sum())} diffs)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
