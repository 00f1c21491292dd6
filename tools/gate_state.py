#!/usr/bin/env python3
"""Render the driver's CORRECTNESS_r*.json verbatim as a gate-state
summary + markdown table (dev tool only).

The driver scoreboard is the ONLY source of truth for gate state —
SURVEY §8 and commit messages must quote it, not local runs (round-1
lesson: local verify passed while the driver recorded 3 hash-fails the
local compare was too lenient to see).

Usage: python3 tools/gate_state.py CORRECTNESS_r01.json [--table]
"""
import sys, json

def main():
    path = sys.argv[1]
    d = json.load(open(path))
    rows = []
    counts = {"oracle-green": 0, "hash-fail": 0, "rows-only": 0, "err": 0}
    for name, r in sorted(d.items()):
        if not isinstance(r, dict):
            continue
        err = r.get("err")
        if err == "no_oracle":
            status = "rows-only"
        elif err:
            status = "err"
        elif r.get("hash_match") is True:
            status = "oracle-green"
        else:
            status = "hash-fail"
        counts[status] += 1
        rows.append((name, status, r.get("spark_rows"), r.get("oracle_rows")))
    total = sum(counts.values())
    print(f"{path}: {total} queries — "
          f"{counts['oracle-green']} oracle-green, {counts['hash-fail']} hash-fail, "
          f"{counts['rows-only']} rows-only, {counts['err']} err")
    bad = [r for r in rows if r[1] in ("hash-fail", "err")]
    for name, status, sr, orr in bad:
        print(f"  {status.upper():9} {name} (spark_rows={sr} oracle_rows={orr})")
    if "--table" in sys.argv:
        print("\n| query | status | spark rows | oracle rows |")
        print("|---|---|---|---|")
        for name, status, sr, orr in rows:
            print(f"| {name} | {status} | {sr} | {orr} |")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
