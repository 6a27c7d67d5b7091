#!/usr/bin/env python3
"""Cross-check SURVEY.md §2 against the live query registry.

Usage: python3 tools/survey_check.py <verifyOutDir>

Every `q_*` token mentioned in a §2 row must exist as a registered
query (a dumped directory under the Verify output), and every
registered query must be claimed by at least one §2 row — SURVEY
drift in either direction is how a coverage table silently rots.
Exits 1 on any mismatch.
"""
import os
import re
import sys


def main(verify_dir):
    with open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")) as f:
        text = f.read()
    s2 = text.split("## §2", 1)[1].split("## §3", 1)[0]
    # q1_agg's digit-bearing prefix is the reason this is not "q_*"
    claimed = set(re.findall(r"\bq\d*_[a-z0-9_]+", s2))
    registered = {d for d in os.listdir(verify_dir)
                  if re.fullmatch(r"q\d*_[a-z0-9_]+", d)
                  and os.path.isdir(os.path.join(verify_dir, d))}
    missing = sorted(claimed - registered)   # SURVEY cites a ghost
    unclaimed = sorted(registered - claimed)  # shipped but undeclared
    for q in missing:
        print(f"GHOST   {q}: cited in SURVEY §2 but not registered")
    for q in unclaimed:
        print(f"SILENT  {q}: registered but no SURVEY §2 row claims it")
    print(f"== {len(claimed)} claimed, {len(registered)} registered, "
          f"{len(missing)} ghosts, {len(unclaimed)} silent ==")
    return 1 if missing or unclaimed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
