#!/usr/bin/env python3
"""Build BENCH_medians_rNN.json from N bench detail maps.

Usage: python3 tools/medians.py <out.json> <note> <run1.json> [run2.json ...]

Each input is a Bench full-line JSON ({"metric":"total","queries":{...}});
the output is the per-query median across runs plus the run totals.
"""
import json
import statistics
import sys


def main():
    out, note = sys.argv[1], sys.argv[2]
    runs = [json.load(open(p)) for p in sys.argv[3:]]
    names = set()
    for r in runs:
        names.update(k for k, v in r["queries"].items() if v >= 0)
    med = {
        n: round(statistics.median([r["queries"][n] for r in runs
                                    if r["queries"].get(n, -1) >= 0]), 4)
        for n in sorted(names)
    }
    # Per-query sample counts (r14 advice): a 1-of-3 flaky query's median
    # must not look as trustworthy as a 3-of-3 one. Only queries with
    # fewer samples than n_runs are listed, so the common case stays small.
    short = {
        n: sum(1 for r in runs if r["queries"].get(n, -1) >= 0)
        for n in sorted(names)
    }
    short = {n: c for n, c in short.items() if c < len(runs)}
    doc = {
        "metric": "per_query_median",
        "unit": "sec",
        "sf": runs[0].get("sf"),
        "n_runs": len(runs),
        "runs_total_sec": [round(r["value"], 1) for r in runs],
        "queries_with_fewer_samples": short,
        "note": note,
        "queries": med,
    }
    with open(out, "w") as f:
        json.dump(doc, f)
    print(f"wrote {out}: {len(med)} queries, totals "
          f"{[round(r['value'], 1) for r in runs]}")


if __name__ == "__main__":
    main()
