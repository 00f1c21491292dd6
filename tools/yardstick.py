#!/usr/bin/env python3
"""Per-query DuckDB yardstick (dev tool only): times every oracle SQL
from a Verify dump's oracle_sql.json against the fixture tables — the
like-for-like single-node comparator for the Spark bench. Run
`sbt "runMain graft.Verify <sfDir> <outDir>"` FIRST so the handoff
parquets the oracle SQL reads exist for the SAME sfDir.

Usage: python3 tools/yardstick.py <sfDir> <outDir> [repeats]
Prints one line per query (median of repeats) plus a sorted summary and
the total, as JSON on the last line.
"""
import sys, os, json, time, statistics
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    times, errs = {}, {}
    for name in sorted(oracle):
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            try:
                con.execute(oracle[name]).fetchall()
            except Exception as e:
                errs[name] = str(e).split("\n")[0][:200]
                break
            runs.append(time.time() - t0)
        if runs:
            times[name] = statistics.median(runs)
            print(f"{name}: {times[name]:.3f} s")
    for name, e in errs.items():
        print(f"ERROR {name}: {e}")
    total = sum(times.values())
    worst = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print("\nslowest:", ", ".join(f"{n}={v:.2f}s" for n, v in worst))
    print(json.dumps({"total_sec": round(total, 1), "queries": len(times),
                      "errors": len(errs), "repeats": repeats}))

if __name__ == "__main__":
    main()
