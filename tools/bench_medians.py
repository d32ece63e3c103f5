"""Per-query medians across repeated bench runs — the round-over-round
comparison protocol instituted in r14 (PLANS.md: same-code headline totals
swing ±20% on this box, so only medians-to-medians deltas are citable).

Reads the BENCH_DETAIL.json copies saved after each full bench run,
computes each query's median wall time across runs, writes the medians
artifact, and prints every line whose median moved more than the noise
threshold (1.3x either way) against a prior medians artifact.

Usage: python tools/bench_medians.py OUT.json PRIOR.json DETAIL1 DETAIL2 ...
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path, prior_path, *details = sys.argv[1:]
    runs = [json.load(open(p))["queries"] for p in details]
    names = sorted({n for r in runs for n in r})
    medians = {
        n: round(statistics.median([r[n] for r in runs if n in r]), 3)
        for n in names
    }
    presence = {n: sum(1 for r in runs if n in r) for n in names}
    partial = {n: c for n, c in presence.items() if c != len(runs)}
    out = {
        "metric": "per_query_medians",
        "n_runs": len(runs),
        "headline_sum_of_medians": round(sum(medians.values()), 3),
        "queries": medians,
    }
    if partial:
        out["partial_presence"] = partial
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)

    prior = json.load(open(prior_path))["queries"]
    print(f"wrote {out_path}: {len(medians)} queries, "
          f"sum {out['headline_sum_of_medians']}s over {len(runs)} runs")
    movers = []
    for n in names:
        if n in prior and prior[n] > 0:
            ratio = medians[n] / prior[n]
            if ratio > 1.3 or ratio < 1 / 1.3:
                movers.append((ratio, n, prior[n], medians[n]))
    new = [n for n in names if n not in prior]
    gone = [n for n in prior if n not in medians]
    for ratio, n, was, now in sorted(movers, reverse=True):
        print(f"MOVER {ratio:5.2f}x  {n}: {was} -> {now}")
    if new:
        print("new lines (no prior):", " ".join(new))
    if gone:
        print("dropped lines:", " ".join(gone))
    if not movers:
        print("no per-query median moved beyond the 1.3x noise threshold")


if __name__ == "__main__":
    main()
