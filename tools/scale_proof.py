"""sf1 scale proof: measure headline operators at sf0.1 and at a 10x
scaled corpus (tools/gen_scale.py) and record per-query scaling ratios.

Near-linear scaling (ratio <= ~12x for 10x data on the same 32-thread
box) is the evidence that the plan shapes — bucketed LSH, hash-keyed
decontamination joins, histogram aggregates, windowed sessionization —
have no hidden quadratic term or state blow-up.  Super-linear outliers
get named in the artifact instead of hiding in an average.

Writes BENCH_sf1.json:
  {"sf0.1": {q: sec}, "sf1": {q: sec}, "ratio": {q: x}, ...}

Usage: python tools/scale_proof.py [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_minhash_ngram",
    "ngram_decontaminate",
    "contamination_overlap",
    "curation_pipeline_e2e",
    "sessionize",
    "tpch_q9_profit",
    "stedi_flagship",
    # round-7 extension: the r6 additions the verdict flagged as
    # perf-unmeasured at scale
    "dedup_components",
    "dedup_incremental",
    "countmin_sketch",
    "hll_registers",
    "bm25_term_scores",
    "tfidf_top_terms",
    # round-7 additions: clustering, runtime-filter pruning, window sketch
    # merge, perplexity-proxy coverage, suffix-blocked edit distance, and
    # the staged-base-index incremental dedup
    "kmeans_embeddings",
    "bloom_prune_join",
    "hll_window_merge",
    "lm_bigram_coverage",
    "dedup_editdistance",
    "dedup_incremental_indexed",
    # late-round-7 additions: blocked exact-Jaccard join, BPE encode,
    # linear quality classifier, mergeable quantile sketch
    "dedup_jaccard_prefix",
    "bpe_encode",
    "quality_logit_score",
    "quantile_sketch_merge",
    "sim_pq_topk",
    "multimodal_fusion",
    "cdc_tombstone_merge",
    "compaction_plan",
    "anomaly_zscore",
    "streaming_quality_gate",
    "streaming_quantile",
    "streaming_anomaly",
    # round-8 extension: the r7 verdict's six scale-unproven lines — the
    # graph trio heavies (now reading the staged pair graph; the first
    # trio query pays the staging, so components carries the one-off
    # candidate-generation cost in its ratio) plus the remaining r7
    # additions without a 10x ratio
    "dedup_pagerank",
    "dedup_triangles",
    "substring_dup_spans",
    "retrieval_rrf_fusion",
    "multimodal_audio",
    "streaming_scd2_lookup",
    # round-8 additions
    "sim_range_search",
    "mixture_cap_sample",
    "mv_incremental_update",
    "fk_integrity_audit",
    "streaming_mv_update",
    "recursive_rollup",
    "window_lag_lead",
    "regex_pretokenize",
    "snapshot_diff",
    "k_anonymity_audit",
    "lateral_topk",
    "streaming_semi_join",
    # round-9 extension: the r8 verdict's remaining scale-unproven top-20
    # bench lines, plus the r9 additions
    "streaming_dedup_incremental",
    "streaming_stedi_join",
    "sim_recall_report",
    "column_profile",
    "streaming_interval_join",
    "bpe_merge_steps",
    "streaming_full_outer_join",
    "streaming_observed_metrics",
    "envelope_pyds_roundtrip",
    "dedup_agreement_report",
    # late-round-9 additions
    "sql_udf_pricing",
    "param_sql_topk",
    "compaction_execute",
    "schema_merge_read",
    "state_store_inspect",
    "envelope_pyds_sink",
    "envelope_pyds_stream",
    "bucketed_join",
    "lm_perplexity_filter",
    "dpp_prune_join",
    "streaming_ppl_gate",
    "streaming_chained_windows",
    "agg_moments",
    "streaming_rate_source",
]


def run_bench(sf_dir: str, queries: list[str], runs: int = 3) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_BENCH_RUNS=str(runs))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *queries],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    # bench.py now prints the full artifact line FOLLOWED by a compact
    # tail line without the per-query map (driver tail-buffer contract);
    # scan from the end for the line that still carries "queries".
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in parsed:
            return parsed
    raise RuntimeError(f"no full bench line in output:\n{out.stdout[-2000:]}")


def main() -> None:
    queries = sys.argv[1:] or QUERIES
    sf1_dir = os.path.join(REPO, ".scale", "sf1")
    if not os.path.exists(os.path.join(sf1_dir, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_scale.py")],
            check=True,
            timeout=1200,
        )
    small = run_bench("/root/testdata/sf0.1", queries)
    big = run_bench(sf1_dir, queries)
    ratio = {
        q: round(big["queries"][q] / small["queries"][q], 2)
        for q in queries
        if q in small.get("queries", {}) and q in big.get("queries", {})
        and small["queries"][q] > 0
    }
    # merge into the existing artifact so an argv-subset run EXTENDS the
    # proof instead of silently shrinking it to the subset
    prior: dict = {}
    artifact = os.path.join(REPO, "BENCH_sf1.json")
    if os.path.exists(artifact):
        with open(artifact) as f:
            prior = json.load(f)
    result = {
        "metric": "sf1_scale_proof",
        "data_scale": 10,
        "sf0.1": {**prior.get("sf0.1", {}), **small.get("queries", {})},
        "sf1": {**prior.get("sf1", {}), **big.get("queries", {})},
        "ratio": {**prior.get("ratio", {}), **ratio},
        "errors": {**small.get("errors", {}), **big.get("errors", {})},
        "note": (
            "10x data on the same local[32] box; near-linear = ratio <= ~12. "
            "Sub-linear ratios mean the sf0.1 time was fixed-overhead-bound."
        ),
    }
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
