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
import subprocess
import sys


def latest_correctness(root):
    cands = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not cands:
        return None
    return max(cands, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def last_two_benches(root):
    # strict BENCH_r<N>.json only — scale artifacts like
    # BENCH_r13_10x.json measure DIFFERENT data and must never become
    # a drift baseline (caught r13: every sf0.1 row read as a
    # "regression" against its own 10x-replica time)
    cands = [p for p in glob.glob(os.path.join(root, "BENCH_r*.json"))
             if re.fullmatch(r"BENCH_r\d+\.json", os.path.basename(p))]
    cands.sort(key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    return cands[-2:] if len(cands) >= 2 else []


def classify_bench_drift(root, sf_dir="/root/testdata/sf0.1"):
    """Automate the drift adjudication a judge used to do by hand
    (the r9 q_dedup_containment case): any query whose latest BENCH
    time is > 1.5x its prior-round time AND above a 1 s floor is
    re-benched in ISOLATION (SPARK_GRAFT_ONLY, its own JVM). Noise
    verdict when the isolated time lands at or below
    max(1.7x prior, 0.6x latest): the first arm absorbs cold-JIT
    single-query overhead (the r9 case re-benched at 1.2-1.7x prior
    across runners for identical code), the second recognizes an
    in-run number inflated by harness order. Only a drift that
    REPRODUCES in isolation is a real regression.
    Writes BENCH_DRIFT.json (and a round-stamped BENCH_DRIFT_r{N}.json)
    covering EVERY query — (prior, latest, ratio, verdict) for all,
    plus the isolated re-bench time for the flagged movers — so the
    full adjudication record survives the round, not just the
    suspects.
    """
    pair = last_two_benches(root)
    # BENCH_LATEST/BENCH_ROUND: adjudicate a LOCAL candidate bench (the
    # builder's own full-suite run) against the last driver round —
    # the driver only writes BENCH_r{N}.json at round close, after the
    # builder's last commit, so the in-round adjudication needs this.
    if os.environ.get("BENCH_LATEST"):
        # candidate mode: compare against the last driver round's FULL
        # per-query detail (bench_detail.json) — the BENCH_r{N}.json
        # driver wrapper truncates `queries` to the top 15
        prior = os.path.join(root, "bench_detail.json")
        if not os.path.exists(prior):
            prior = pair[-1] if pair else None
        if not prior:
            return []
        pair = [prior, os.environ["BENCH_LATEST"]]
    if len(pair) < 2:
        return []

    def rec(path):
        d = json.load(open(path))
        # the driver wraps Bench's JSON line under "parsed"
        return d.get("parsed", d) or {}

    prevr, curr = rec(pair[0]), rec(pair[1])
    # cross-METHODOLOGY comparison is meaningless: r10 switched the
    # bench from count() (which let the optimizer prune entire
    # pipelines) to noop-forced full materialization — every honest
    # row would read as a fake "regression" against a pruned prior
    if prevr.get("force") != curr.get("force"):
        note = {"methodology_flip": {
            "prior": prevr.get("force") or "count",
            "latest": curr.get("force") or "count"}}
        print("bench drift: methodology changed "
              f"({note['methodology_flip']['prior']} -> "
              f"{note['methodology_flip']['latest']}) — skipping row "
              "triage this round; comparisons resume next round")
        with open(os.path.join(root, "BENCH_DRIFT.json"), "w") as f:
            json.dump(note, f, indent=1, sort_keys=True)
        return []
    prev = prevr.get("queries", {}) or {}
    cur = curr.get("queries", {}) or {}
    m = re.search(r"_r(\d+)", os.path.basename(pair[1]))
    # the final fallback (derive from the PRIOR's name) can itself miss
    # (e.g. prior == bench_detail.json in candidate mode) — guard it
    # instead of .group()ing a None match
    m_prev = re.search(r"_r(\d+)", os.path.basename(pair[0]))
    round_n = (int(os.environ["BENCH_ROUND"]) if os.environ.get("BENCH_ROUND")
               else int(m.group(1)) if m
               else int(m_prev.group(1)) + 1 if m_prev
               else 0)
    suspects = sorted(
        q for q, t in cur.items()
        if t is not None and t > 1.0 and prev.get(q) is not None
        and prev[q] > 0 and t > 1.5 * prev[q])
    # full-coverage record: every query gets a row; non-suspects are
    # adjudicated "ok" (new queries "new") without an isolated re-run
    record = {
        q: {"prior": prev.get(q), "latest": t,
            "ratio": (round(t / prev[q], 3)
                      if prev.get(q) and prev[q] > 0 else None),
            "verdict": "new" if prev.get(q) is None else "ok"}
        for q, t in sorted(cur.items())}

    def flush():
        for p in (os.path.join(root, "BENCH_DRIFT.json"),
                  os.path.join(root, f"BENCH_DRIFT_r{round_n}.json")):
            with open(p, "w") as f:
                json.dump(record, f, indent=1, sort_keys=True)

    if not suspects:
        flush()
        return []
    print(f"bench drift: {len(suspects)} suspect(s) vs {os.path.basename(pair[0])} "
          f"— re-benching each in isolation")
    problems = []
    for q in suspects:
        # SPARK_GRAFT_BENCH_OUT: keep the isolated probe from
        # clobbering the round's real bench_detail.json
        env = dict(os.environ,
                   SPARK_GRAFT_ONLY=q, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_BENCH_OUT=f"/tmp/bench_drift_{q}.json")
        try:
            out = subprocess.run(
                ["sbt", "-batch", "runMain graft.Bench"],
                cwd=root, env=env, capture_output=True, text=True,
                timeout=1200).stdout
            line = next(l for l in out.splitlines() if '"metric"' in l)
            iso = json.loads(re.sub(r"^\[info\] ", "", line))["queries"][q]
        except Exception as e:  # noqa: BLE001 — any failure is a finding
            iso = -1.0
            problems.append(f"{q}: isolated re-bench failed ({e})")
        verdict = ("noise"
                   if 0 <= iso <= max(1.7 * prev[q], 0.6 * cur[q])
                   else "regression")
        record[q].update({"isolated": iso, "verdict": verdict})
        print(f"  {q}: prior {prev[q]:.2f}s -> latest {cur[q]:.2f}s, "
              f"isolated {iso:.2f}s => {verdict}")
        if verdict == "regression":
            problems.append(
                f"{q}: bench regression reproduces in isolation "
                f"({prev[q]:.2f}s -> {iso:.2f}s)")
    flush()
    return problems


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

    # drift classification is advisory-by-default noise triage, but a
    # regression that reproduces in isolation is a real problem
    if os.environ.get("SKIP_DRIFT_CHECK") != "1":
        problems.extend(classify_bench_drift(root))

    if problems:
        print(f"\nROUND RED — {len(problems)} problem(s):")
        for p in problems:
            print(f"  FAIL {p}")
        sys.exit(1)
    print("\nROUND GREEN")


if __name__ == "__main__":
    main()
