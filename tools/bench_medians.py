"""Per-query medians across repeated bench runs — the round-over-round
comparison protocol instituted in r14 (PLANS.md: same-code headline totals
swing ±20% on this box, so only medians-to-medians deltas are citable).

Reads the BENCH_DETAIL.json copies saved after each full bench run,
computes each query's median wall time across runs, writes the medians
artifact, and prints every line whose median moved more than the noise
threshold (1.3x either way) against a prior medians artifact.

Budget gate (r18, VERDICT r17 item 5): a detail file whose run exceeded
bench.py's soft wall budget has a COLD single-shot tail that fabricates
1.3-1.9x "movers" on unchanged code — it happened in r12 and again in r17.
This tool now refuses such files mechanically: any detail with a non-empty
``degraded`` list, or wall_total >= budget, aborts before medians are
computed (override with --allow-degraded only to inspect, never to cite).
Pre-r18 detail files without the recorded fields fall back to the ERA-
MINIMUM 480 s budget and a wall_total check alone (degraded set
unrecorded) — the largest-default fallback used before r19 silently
passed the very r12/r17-era degraded files the gate exists to refuse.

Usage: python tools/bench_medians.py [--allow-degraded] OUT.json PRIOR.json DETAIL1 DETAIL2 ...
"""

from __future__ import annotations

import json
import statistics
import sys


def check_budget(path: str, detail: dict) -> str | None:
    """Return a refusal reason if this detail file's tail degraded."""
    # Pre-r18 detail files recorded neither budget nor degraded list.  The
    # only safe assumption for them is the ERA-MINIMUM soft budget (480 s,
    # the r4-r11 default): falling back to the LARGEST historical default
    # (1080) would wave through exactly the r12/r17-era files whose tails
    # degraded under their real 480/720 budgets — the files this gate
    # exists to refuse (ADVICE r18).
    budget = detail.get("budget", 480.0)
    wall = detail.get("wall_total")
    degraded = detail.get("degraded")
    if degraded:
        return (
            f"{path}: {len(degraded)} queries degraded to cold single-shots "
            f"(first: {degraded[:3]}) — raise SPARK_GRAFT_BENCH_BUDGET and re-run"
        )
    if wall is not None and wall >= budget:
        return (
            f"{path}: wall_total {wall} >= budget {budget} — the tail ran "
            "cold; raise SPARK_GRAFT_BENCH_BUDGET and re-run"
        )
    return None


def main() -> None:
    args = sys.argv[1:]
    allow_degraded = "--allow-degraded" in args
    if allow_degraded:
        args.remove("--allow-degraded")
    out_path, prior_path, *details = args
    detail_objs = [json.load(open(p)) for p in details]
    problems = [r for r in (check_budget(p, d) for p, d in zip(details, detail_objs)) if r]
    for msg in problems:
        print(f"BUDGET GATE: {msg}", file=sys.stderr)
    if problems and not allow_degraded:
        raise SystemExit(
            "refusing degraded detail files (cold-tail movers are not "
            "citable); pass --allow-degraded to inspect anyway"
        )
    runs = [d["queries"] for d in detail_objs]
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
