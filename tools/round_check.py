#!/usr/bin/env python3
"""Round-close gate: fail loudly if the board is red.

Usage: python3 tools/round_check.py [CORRECTNESS.json] [bench_detail.json]

Defaults to the highest-numbered CORRECTNESS_r*.json in the repo root
and bench_detail.json next to it. Exit 0 only when:

  - every oracle-checked query has rows_match/schema_match/hash_match
    all true and no err;
  - every rows-only query (err == "no_oracle") returned > 0 rows;
  - no benchmarked query failed (time < 0 in the bench detail map).

Run this before closing a round: round 7 shipped a one-line loader bug
that silently took 22 queries and 14 specs red, and nothing in the
builder loop noticed. This script is the thing that notices.
"""
import glob
import json
import os
import re
import sys


def latest_correctness(root):
    cands = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not cands:
        return None
    return max(cands, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cpath = sys.argv[1] if len(sys.argv) > 1 else latest_correctness(root)
    bpath = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "bench_detail.json")
    problems = []

    if cpath and os.path.exists(cpath):
        correctness = json.load(open(cpath))
        for name, r in sorted(correctness.items()):
            if r.get("err") == "no_oracle":
                if not (r.get("spark_rows") or 0) > 0:
                    problems.append(f"{name}: rows-only query returned 0 rows")
            elif r.get("err"):
                problems.append(f"{name}: err={r['err']}")
            elif not all(r.get(m) is True
                         for m in ("rows_match", "schema_match", "hash_match")):
                bad = [m for m in ("rows_match", "schema_match", "hash_match")
                       if r.get(m) is not True]
                problems.append(f"{name}: {','.join(bad)} "
                                f"(spark={r.get('spark_rows')} oracle={r.get('oracle_rows')})")
        print(f"correctness: {cpath} — {len(correctness)} queries checked")
    else:
        problems.append("no CORRECTNESS_r*.json found")

    if os.path.exists(bpath):
        bench = json.load(open(bpath))
        failed = sorted(q for q, t in bench.get("queries", {}).items() if t < 0)
        for q in failed:
            problems.append(f"{q}: bench failed (-1)")
        print(f"bench: {bpath} — {len(bench.get('queries', {}))} queries, "
              f"{len(failed)} failed")
    else:
        problems.append(f"no bench detail at {bpath}")

    if problems:
        print(f"\nROUND RED — {len(problems)} problem(s):")
        for p in problems:
            print(f"  FAIL {p}")
        sys.exit(1)
    print("\nROUND GREEN")


if __name__ == "__main__":
    main()
