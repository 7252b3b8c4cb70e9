#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare. Usage:
    python3 tools/check.py [--cache] <sfDir> <outDir>
(after: sbt "runMain graft.Verify <sfDir> <outDir>")

--cache (r14 verdict task #6): memoize each ORACLE result as parquet
keyed by sha256(data-dir fingerprint + oracle SQL), so a re-grade over
unchanged testdata + unchanged SQL skips the DuckDB execution (the
>10-min cost center of the sf0.1 round-close pass). Invalidation is
structural (any file size/mtime change or SQL edit changes the key) and
LOUD (a fingerprint flip per data dir prints ORACLE CACHE INVALIDATED).
A cache-hit comparison can only ever *pass* a query from cache: any
cache-hit FAIL is re-run against fresh DuckDB before being reported, so
a parquet round-trip artifact can never fail a healthy query. Without
the flag, behavior is byte-identical to before.
"""
import sys, json, glob, os, hashlib, inspect
import duckdb
import pandas as pd

# Folded into every cache key: a DuckDB upgrade is exactly the
# engine-divergence class the oracle-parity rules exist for (decimal,
# libm, recursive-union behavior shift between versions), and a cached
# PASS from the old engine must not vouch for the new one. The compare
# logic itself is part of the engine: a hash of compare()+normalize()'s
# SOURCE is folded in below (r15 ADVICE) so an edit to the comparison
# semantics auto-invalidates every cached verdict — the manual
# CACHE_SCHEMA bump stays only for changes OUTSIDE those two functions
# (e.g. the column-sort discipline in main()).
CACHE_SCHEMA = "v1"


def _compare_logic_hash():
    src = inspect.getsource(compare) + inspect.getsource(normalize)
    return hashlib.sha256(src.encode()).hexdigest()[:16]

def dir_fingerprint(sfdir):
    engine_tag = (f"duckdb={duckdb.__version__};schema={CACHE_SCHEMA};"
                  f"compare={_compare_logic_hash()}")
    ents = []
    for p in sorted(glob.glob(os.path.join(sfdir, "*.parquet"))):
        st = os.stat(p)
        ents.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return engine_tag + "|" + sfdir + "|" + ";".join(ents)

def main():
    args = [a for a in sys.argv[1:] if a != "--cache"]
    use_cache = "--cache" in sys.argv[1:]
    sfdir, outdir = args[0], args[1]
    cache_dir = None
    fp = None
    if use_cache:
        cache_dir = os.environ.get("GRAFT_ORACLE_CACHE",
                                   "/tmp/graft_oracle_cache")
        os.makedirs(cache_dir, exist_ok=True)
        fp = dir_fingerprint(sfdir)
        tag = hashlib.sha256(sfdir.encode()).hexdigest()[:16]
        fp_file = os.path.join(cache_dir, f"fingerprint_{tag}.txt")
        if os.path.exists(fp_file):
            old = open(fp_file).read()
            if old != fp:
                print(f"ORACLE CACHE INVALIDATED for {sfdir}: testdata or "
                      "oracle engine changed (size/mtime/duckdb-version "
                      "fingerprint flipped) — all oracle queries re-run "
                      "fresh", flush=True)
        with open(fp_file, "w") as f:
            f.write(fp)
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_cached = 0
    for name, sql in sorted(oracle.items()):
        exp, cache_hit, cpath = None, False, None
        if cache_dir:
            key = hashlib.sha256((fp + "\n" + sql).encode()).hexdigest()
            cpath = os.path.join(cache_dir, key + ".parquet")
            if os.path.exists(cpath):
                try:
                    exp = pd.read_parquet(cpath)
                    cache_hit = True
                    n_cached += 1
                except Exception:
                    exp = None
        if exp is None:
            try:
                exp = con.sql(sql).df()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                n_fail += 1
                continue
            if cpath is not None:
                try:
                    exp.to_parquet(cpath)
                except Exception:
                    pass  # uncacheable dtype: stays a fresh run next time
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
        if not ok and cache_hit:
            # never FAIL from cache: re-run fresh so a parquet round-trip
            # dtype artifact cannot masquerade as a real mismatch
            n_cached -= 1
            try:
                exp = con.sql(sql).df()
                exp = exp[sorted(exp.columns)]
                if cpath is not None:
                    try:
                        exp.to_parquet(cpath)
                    except Exception:
                        pass
                ok, msg = compare(exp, got)
                if ok:
                    msg = "(stale oracle cache entry refreshed)"
            except Exception as e:
                ok, msg = False, f"oracle SQL error: {e}"
        if ok:
            print(f"PASS {name} ({len(got)} rows){' ' + msg if msg else ''}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    cached_note = f" ({n_cached} oracle results from cache)" if cache_dir else ""
    print(f"\n{n_pass} pass / {n_fail} fail{cached_note}")
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
