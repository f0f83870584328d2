#!/usr/bin/env python3
"""Dev-only harness: emulate the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]
Compares each <verifyOutDir>/<name> (parquet dir written by graft.Verify)
against oracle_sql.json run in DuckDB over <sfDir>/*.parquet.
Optional trailing names restrict the compare (pairs with graft.Verify's
SPARK_GRAFT_ONLY for quick iteration on a few queries).
Not part of the engine (engine is Scala); this is local test tooling.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: timestamps to ns UTC-naive, ints to int64
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            got = norm(pd.read_parquet(res_dir))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # the driver hashes exact values incl. type, so dtype-kind drift
        # (e.g. DuckDB HUGEINT -> object/float vs Spark BIGINT -> int64)
        # must fail here even though assert_frame_equal coerces past it
        kind_bad = [c for c in got.columns
                    if got[c].dtype.kind != want[c].dtype.kind]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch "
                  f"{[(c, str(got[c].dtype), str(want[c].dtype)) for c in kind_bad]}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}"); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
