#!/usr/bin/env python3
"""Assemble SCALE_r08.json from the three bench runs of the round-8
scale probe:

  /tmp/bench_r7.json             r7 binary, sf0.1 (drift A leg)
  /tmp/bench_r8_backtoback.json  r8 binary, sf0.1, run immediately
                                 after the A leg (drift B leg)
  /tmp/bench_r8.json             r8 FINAL binary, sf0.1 (sf1 baseline)
  /tmp/bench_r8_sf1.json         r8 FINAL binary, sf1 (10x probe)

Emits per-query sf1/sf0.1 ratios against the 10x row-count growth and
the r7-vs-r8 same-box comparison. Ratio interpretation: stage-floor
bound queries stay ~1x; data-bound queries should stay at or below
~10x (linear); anything clearly above 10x needs a written explanation.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    r7 = load("/tmp/bench_r7.json")
    b2b = load("/tmp/bench_r8_backtoback.json")
    r8 = load("/tmp/bench_r8.json")
    sf1 = load("/tmp/bench_r8_sf1.json")
    common = [q for q in r7["queries"] if q in b2b["queries"]]
    drift = {
        "r7_total_sf01": r7["value"],
        "r8_total_sf01_backtoback": b2b["value"],
        "r8_total_sf01_final": r8["value"],
        "r7_min_total": r7["min_total"],
        "r8_min_total_backtoback": b2b["min_total"],
        "common_query_ratio_r8_over_r7": round(
            sum(b2b["queries"][q] for q in common)
            / sum(r7["queries"][q] for q in common), 3),
        "per_query_ratio": {
            q: round(b2b["queries"][q] / r7["queries"][q], 2) for q in common},
    }
    scale = {}
    for q, t1 in sf1["queries"].items():
        t01 = r8["queries"].get(q)
        if t01 and t01 > 0 and t1 > 0:
            scale[q] = {"sf0.1_sec": t01, "sf1_sec": t1,
                        "ratio": round(t1 / t01, 2)}
    out = {
        "round": 8,
        "data": "sf1 probe = 10x sf0.1 via scripts/make_scale.py "
                "(shifted keys, per-copy token/vector perturbation; "
                "near-dup density held constant)",
        "analysis": [
            "NO query grows super-linearly at 10x rows: worst is "
            "pipeline_e2e at 8.2x (corpus-bound, as designed); the "
            "stage-floor-bound group (dl_rule_rec, dl_asof_bucketed, "
            "sim_ann, graph_pagerank, graph_cc on the fixed nation "
            "graph) stays ~1x, confirming their cost is scheduling "
            "overhead, not data.",
            "Drift deconfound: the r7 binary re-run on today's box "
            "reproduces its judge-time total (15.86 vs 15.38 s), so "
            "the r6->r7 '+16% uniform drift' was box variance. r8 "
            "beats r7 back-to-back same-box (14.75 vs 15.86 s; 0.93x "
            "on the common set), driven by the pagerank adaptive "
            "dispatch (2.51 -> 0.90 s). A final-binary rerun 30 min "
            "later read 15.82 s with everything ~8% above the "
            "back-to-back leg -- the box-drift signature again, "
            "which is exactly why same-session pairing is the only "
            "comparison this report trusts.",
            "An interim flat 32-bucket layout (first cut of the "
            "ADVICE parallelism-ceiling fix) regressed dl_not +0.3 s "
            "at sf0.1 in pure small-file overhead; the shipped rule "
            "sizes bucket counts by the PRUNABLE UNIT's volume "
            "(largest attr dir, ~200k facts/bucket, floor 8, cap "
            "cores), measured A/B, restoring r7-level locals while a "
            "10x unit engages the full ceiling.",
        ],
        "drift_deconfound": drift,
        "sf1_scale_probe": {
            "rows_factor": 10,
            "sf0.1_total": r8["value"],
            "sf1_total": sf1["value"],
            "sf1_min_total": sf1["min_total"],
            "per_query": dict(sorted(scale.items(),
                                     key=lambda kv: -kv[1]["ratio"])),
        },
    }
    with open(sys.argv[1] if len(sys.argv) > 1 else "SCALE_r08.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["drift_deconfound"], indent=1))
    for q, v in out["sf1_scale_probe"]["per_query"].items():
        print(f"{q:20s} {v['sf0.1_sec']:7.3f} -> {v['sf1_sec']:8.3f}  x{v['ratio']}")


if __name__ == "__main__":
    main()
