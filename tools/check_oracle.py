#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same sfDir tables, sorts columns by name, and compares values exactly
(floats exact too, so rounding-contract violations surface here before
the driver sees them).

Also compares RESULT TYPES per column (DuckDB's view of the Spark
parquet vs the oracle relation): the driver's hasher is type-tagged, so
a value-identical result with an int128-class type skew (HUGEINT vs
BIGINT, r4's q_zipf_coverage) still hash-fails at the driver. Catch it
here first.
"""
import json
import os
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def connect(sf_dir):
    """Fresh connection with view setup. Per-QUERY at large SFs: one
    OOM'd query poisons its connection's allocator, and without a
    reconnect every later query cascades into 'bad allocation' (the
    r14 sf1 sweep lost 218 queries to one recursive-CTE OOM)."""
    con = duckdb.connect()
    # bound memory and spill to disk instead of dying: the sf1 replica
    # runs recursive-CTE replays whose intermediates exceed RAM
    con.execute("SET memory_limit='48GB'")
    con.execute("SET threads=16")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written
        # replicas (BenchScale) are part-file DIRECTORIES — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def main(sf_dir, out_dir, resume_log=None):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    skip = set()
    if resume_log and os.path.exists(resume_log):
        import re as _re
        with open(resume_log) as f:
            skip = set(_re.findall(r"^PASS (\S+)", f.read(), _re.M))
        print(f"[resume] skipping {len(skip)} already-passed queries")
    n_pass = n_fail = 0
    n_pass += len(skip)
    con = None
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
        try:
            if con is None:
                con = connect(sf_dir)
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
            print(f"FAIL {name}: exec error: {e}", flush=True)
            n_fail += 1
            # poisoned-allocator guard: rebuild the connection
            try:
                con.close()
            except Exception:
                pass
            con = None
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        type_skew = [(c, got_types[c], exp_types[c]) for c in got_cols
                     if got_types[c] != exp_types[c]]
        if type_skew:
            n_fail += 1
            detail = ", ".join(f"{c}: spark={g} oracle={e}"
                               for c, g, e in type_skew)
            print(f"FAIL {name}: type skew ({detail})")
            continue
        g = [tuple(norm(v) for v in row) for row in got]
        e = [tuple(norm(v) for v in row) for row in exp]
        if g == e:
            print(f"PASS {name} ({len(g)} rows)", flush=True)
            n_pass += 1
        else:
            n_fail += 1
            if len(g) != len(e):
                print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
            else:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
                i, a, b = diffs[0]
                print(f"FAIL {name}: {len(diffs)} differing rows; first at {i}:")
                print(f"  spark : {a}")
                print(f"  oracle: {b}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
