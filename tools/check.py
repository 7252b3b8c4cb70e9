#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare. Usage:
    python3 tools/check.py <sfDir> <outDir>
(after: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{os.path.join(outdir, name, '*.parquet')}'").df()
        # driver behavior: sort columns by name before hashing values
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        ok, msg = compare(exp, got)
        if ok:
            print(f"PASS {name} ({len(got)} rows){' ' + msg if msg else ''}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def compare(exp, got):
    if list(exp.columns) != list(got.columns):
        return False, f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}"
    if len(exp) != len(got):
        return False, f"row count differs: oracle={len(exp)} spark={len(got)}"
    exp_n = normalize(exp)
    got_n = normalize(got)
    if exp_n.equals(got_n):
        return True, ""
    # The driver compares in order; an unordered-only match is a FAIL here
    # too (it means an ORDER BY regression), but label it for triage.
    cols = list(exp_n.columns)
    e2 = exp_n.sort_values(cols, kind="mergesort").reset_index(drop=True)
    g2 = got_n.sort_values(cols, kind="mergesort").reset_index(drop=True)
    if e2.equals(g2):
        return False, "rows match only after re-sorting (ORDER BY mismatch)"
    for c in cols:
        if not exp_n[c].equals(got_n[c]):
            for i in range(len(exp_n)):
                a, b = exp_n[c].iloc[i], got_n[c].iloc[i]
                if a != b and not (pd.isna(a) and pd.isna(b)):
                    return False, (f"col '{c}' differs at row {i}: "
                                   f"oracle={a!r} spark={b!r}")
    return False, "values differ (dtype only?): " + str(
        {c: (str(exp_n[c].dtype), str(got_n[c].dtype)) for c in cols
         if str(exp_n[c].dtype) != str(got_n[c].dtype)})

def normalize(df):
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list,)) else
                                (tuple(v.tolist()) if hasattr(v, "tolist") and not isinstance(v, str) else v))
    return df.reset_index(drop=True)

if __name__ == "__main__":
    main()
