#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (dev tool only —
the shipped library has no Python dependency).

Runs DuckDB oracle SQL from <outDir>/oracle_sql.json against the fixture
parquet tables and compares against the Spark results graft.Verify wrote
to <outDir>/<name>/ — columns sorted by name, rows sorted, exact value
compare (floats bitwise, no tolerance) AND dtype-identical: the driver's
hash is dtype-aware, so an int64 column vs DuckDB's HUGEINT-widened
float64 is a FAIL here even when every value compares equal.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            results[name] = "EMPTY-DIR"
            continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                             ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS-ONLY ({len(spark_df)} rows)"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        s, dck = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(dck.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(s.columns)} duck={list(dck.columns)}"
            continue
        if len(s) != len(dck):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(s)} duck={len(dck)}"
            continue
        mismatches = []
        for c in s.columns:
            a, b = s[c], dck[c]
            if a.dtype != b.dtype:
                mismatches.append(f"{c}: dtype spark={a.dtype} duck={b.dtype}")
                continue
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = (~eq).argmax()
                mismatches.append(f"{c}[row{i}]: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
        results[name] = "OK" if not mismatches else "VALUE-MISMATCH " + "; ".join(mismatches[:3])
    ok = sum(1 for v in results.values() if v == "OK")
    rows_only = sum(1 for v in results.values() if v.startswith("ROWS-ONLY"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v=='OK' else ('INFO' if v.startswith('ROWS-ONLY') else 'FAIL'):4} {k}: {v}")
    print(f"\n{ok} oracle-verified OK, {rows_only} rows-only, "
          f"{len(results)-ok-rows_only} failing, of {len(results)}")
    sys.exit(0 if ok + rows_only == len(results) else 1)

if __name__ == "__main__":
    main()
