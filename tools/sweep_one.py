#!/usr/bin/env python3
"""One-query oracle check in its own process — the big-SF sweep runner.

Usage: python3 tools/sweep_one.py <sfDir> <verifyOutDir> <query>

Same compare semantics as check_oracle.py (values exact, types
compared), but isolated so a query whose DuckDB replay exhausts the
process address space (recursive-CTE hash replays at sf1+) fails ALONE
instead of poisoning the allocator for every query after it (the r14
sf1 cascade). Tuned for large inputs: insertion order off, bounded
threads, disk spill.
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import TABLES, norm  # noqa: E402


def main(sf_dir, out_dir, name):
    con = duckdb.connect()
    con.execute("SET memory_limit='35GB'")
    con.execute("SET threads=8")
    con.execute("SET preserve_insertion_order=false")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)[name]
    try:
        got_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = sorted(got_rel.columns)
        got_types = dict(zip(got_rel.columns, map(str, got_rel.types)))
        got = got_rel.select(", ".join(f'"{c}"' for c in got_cols)).fetchall()
        exp_rel = con.sql(sql)
        exp_cols = sorted(exp_rel.columns)
        exp_types = dict(zip(exp_rel.columns, map(str, exp_rel.types)))
        exp = exp_rel.select(", ".join(f'"{c}"' for c in exp_cols)).fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        return 1
    if got_cols != exp_cols:
        print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
        return 1
    skew = [(c, got_types[c], exp_types[c]) for c in got_cols
            if got_types[c] != exp_types[c]]
    if skew:
        print(f"FAIL {name}: type skew ({skew})")
        return 1
    # sort-insensitive compare: preserve_insertion_order=false makes
    # DuckDB's (and the dumped parquet's) row order nondeterministic,
    # so compare as sorted multisets — the driver's hasher is likewise
    # order-insensitive at this stage (it hashes sorted value lists)
    g = sorted(tuple(str(norm(v)) for v in row) for row in got)
    e = sorted(tuple(str(norm(v)) for v in row) for row in exp)
    if g == e:
        print(f"PASS {name} ({len(g)} rows)")
        return 0
    if len(g) != len(e):
        print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
    else:
        diffs = [(a, b) for a, b in zip(g, e) if a != b]
        print(f"FAIL {name}: {len(diffs)} differing rows; first:")
        print(f"  spark : {diffs[0][0]}")
        print(f"  oracle: {diffs[0][1]}")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
