#!/usr/bin/env python3
"""Assemble SCALE_r08.json from the three bench runs of the round-8
scale probe:

  /tmp/bench_r7.json      r7 binary,  sf0.1  (drift deconfound, A leg)
  /tmp/bench_r8.json      r8 binary,  sf0.1  (drift deconfound, B leg)
  /tmp/bench_r8_sf1.json  r8 binary,  sf1    (10x scale probe)

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
    r8 = load("/tmp/bench_r8.json")
    sf1 = load("/tmp/bench_r8_sf1.json")
    common = [q for q in r7["queries"] if q in r8["queries"]]
    drift = {
        "r7_total_sf01": r7["value"],
        "r8_total_sf01": r8["value"],
        "r7_min_total": r7["min_total"],
        "r8_min_total": r8["min_total"],
        "common_query_ratio_r8_over_r7": round(
            sum(r8["queries"][q] for q in common)
            / sum(r7["queries"][q] for q in common), 3),
        "per_query_ratio": {
            q: round(r8["queries"][q] / r7["queries"][q], 2) for q in common},
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
            "HEAD beats r7 back-to-back same-box (14.75 vs 15.86 s; "
            "0.93x on the common set), driven by the pagerank "
            "adaptive dispatch (2.51 -> 0.90 s).",
            "Known r8-vs-r7 regression, accepted: dl_not 1.7x and "
            "dl_asof_bucketed 1.3x at sf0.1 come from the 8->32 "
            "bucket-count raise (ADVICE: bucket count is the "
            "scan-parallelism ceiling under autoBucketedScan=false). "
            "32 buckets mean more, smaller files at tiny SF -- fixed "
            "per-task overhead that the sf1 ratios show amortizing "
            "(dl_not 1.9x, dl_asof_bucketed 1.0x for 10x rows); at "
            "cluster scale the higher ceiling is the right trade.",
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
