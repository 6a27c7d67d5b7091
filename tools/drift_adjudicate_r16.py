#!/usr/bin/env python3
"""r16 drift adjudication: fold the controlled A/B runs (r14 jar vs r16
jar, isolated fork-of-1, same machine, same fixtures) into per-query
verdicts for the 11 queries the r15 verdict flagged (the sf0.1
q_brown_forsythe breach + the 10x 2.0-2.5x worst_ratios cluster).

Inputs (written by the A/B runs):
  /tmp/ab_r14_sf01_rep{1,2}.json  /tmp/ab_r16_sf01_rep{1,2}.json
  /tmp/ab_r14_10x_rep1.json       /tmp/ab_r16_10x_rep1.json
Pinned referents: BENCH_r14.json (sf0.1), BENCH_r13_10x.json (~sf1).

Verdict rule per query:
  - "code_regression" if the r16 jar is >1.5x the r14 jar on the SAME
    machine/fixture (that is the only comparison that isolates code);
  - "improved" if the r16 jar is <1/1.3 of the r14 jar;
  - otherwise "noise": the pinned number is not reproducible even with
    the jar that produced it, so the drift is era/methodology (the r14
    sf0.1 pins used min(suite,isolated) best-of; r15+ uses symmetric
    median-of-3), not code.

Output: BENCH_DRIFT_AB_r16.json (committed; BENCH_DRIFT.json belongs to round_check, do not collide).
"""
import json

QUERIES = [
    "q_brown_forsythe", "q_logrank", "q_kaplan_meier", "q_cochran_armitage",
    "q_epe_shape_b", "q_cohen_kappa", "q_sample_split", "q_cap_per_group",
    "q_rbo", "q_hill_tail", "q_cliffs_delta",
]


def qmap(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    r14_01 = [qmap(f"/tmp/ab_r14_sf01_rep{i}.json") for i in (1, 2)]
    r16_01 = [qmap(f"/tmp/ab_r16_sf01_rep{i}.json") for i in (1, 2)]
    r14_10 = qmap("/tmp/ab_r14_10x_rep1.json")
    r16_10 = qmap("/tmp/ab_r16_10x_rep1.json")
    pin_01 = qmap("/tmp/bench_detail_r14.json")
    pin_10 = qmap("BENCH_r13_10x.json")

    out = {}
    for q in QUERIES:
        a01 = sum(m[q] for m in r14_01) / 2
        b01 = sum(m[q] for m in r16_01) / 2
        a10, b10 = r14_10.get(q), r16_10.get(q)
        jar_ratio_01 = round(b01 / a01, 3) if a01 > 0 else None
        jar_ratio_10 = round(b10 / a10, 3) if a10 and a10 > 0 else None
        worst = max(x for x in (jar_ratio_01, jar_ratio_10) if x is not None)
        if worst > 1.5:
            verdict = "code_regression"
        elif worst < 1 / 1.3:
            verdict = "improved"
        else:
            verdict = "noise"
        out[q] = {
            "pinned_sf01": pin_01.get(q),
            "r14jar_sf01_mean2": round(a01, 3),
            "r16jar_sf01_mean2": round(b01, 3),
            "jar_ratio_sf01": jar_ratio_01,
            "pinned_10x": pin_10.get(q),
            "r14jar_10x": a10,
            "r16jar_10x": b10,
            "jar_ratio_10x": jar_ratio_10,
            "verdict": verdict,
        }
    doc = {
        "note": (
            "r16 controlled A/B closing r15 verdict #2/#3: same machine, same "
            "fixtures, fork-of-1 isolation, prior-less (zero adjudication "
            "reruns). The ONLY code-isolating comparison is r14 jar vs r16 "
            "jar side by side; comparisons against the r14-era PINS conflate "
            "code with era (the r14 sf0.1 pins were produced under the "
            "min(suite,isolated) best-of that r15 replaced with symmetric "
            "median-of-3 precisely because it biased pins low) and machine "
            "era. Key observed fact: the r14 jar itself reads "
            "q_brown_forsythe at ~1.1s isolated today vs its 0.65s pin - "
            "the pin is unreproducible with the code that produced it."
        ),
        "method": "mean of 2 isolated fork-of-1 reps at sf0.1; 1 rep at the 10x replica",
        "queries": out,
    }
    with open("BENCH_DRIFT_AB_r16.json", "w") as f:
        json.dump(doc, f, indent=1)
    for q, v in out.items():
        print(f"{q:22s} sf01 {v['jar_ratio_sf01']} 10x {v['jar_ratio_10x']} -> {v['verdict']}")


if __name__ == "__main__":
    main()
