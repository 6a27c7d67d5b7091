#!/usr/bin/env python3
"""Aggregate big-SF sweep logs into the round's SWEEP_r{N}.json entry.

Usage: python3 tools/sweep_aggregate.py <out.json> <sf_label> <log> [<log>...]

Reads PASS/FAIL lines from the per-query sweep logs (check_oracle.py or
sweep_one.py format), dedupes by query (a later PASS supersedes an
earlier cascade FAIL), and writes/merges the {sf_label: {...}} entry
into <out.json>. FAILed queries are listed with their first recorded
reason so an infeasible-oracle entry is explicit, never silent.
"""
import json
import os
import re
import sys


def main(out_path, label, logs):
    status = {}
    reason = {}
    for lg in logs:
        with open(lg) as f:
            for line in f:
                m = re.match(r"^(PASS|FAIL) (\S+?):? ", line)
                if not m:
                    continue
                st, q = m.group(1), m.group(2)
                # PASS wins over FAIL (isolated re-run supersedes a
                # cascade failure); FAIL never downgrades a PASS
                if status.get(q) != "PASS":
                    status[q] = st
                if st == "FAIL" and q not in reason:
                    reason[q] = line.split(":", 1)[1].strip()[:160]
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    fails = sorted(q for q, st in status.items() if st == "FAIL")
    doc[label] = {
        "pass": sum(1 for st in status.values() if st == "PASS"),
        "fail": len(fails),
        "queries": len(status),
        "failed": {q: reason.get(q, "?") for q in fails},
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(doc[label], indent=1, sort_keys=True)[:2000])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
