#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against the DuckDB oracle in oracle_sql.json.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            ora_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        s, o = norm(spark_df), norm(ora_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        except AssertionError as e:
            # Show whether it's a near-miss (float jitter) or a real mismatch
            close = False
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
                close = True
            except AssertionError:
                pass
            tag = "NEAR-MISS (float jitter)" if close else "MISMATCH"
            print(f"FAIL {name}: {tag}")
            print(str(e).splitlines()[-6:])
            # print first differing rows
            for i in range(min(len(s), len(o))):
                if not s.iloc[i].equals(o.iloc[i]):
                    print("  spark :", s.iloc[i].to_dict())
                    print("  oracle:", o.iloc[i].to_dict())
                    break
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
