"""Query registry — the driver-facing operator inventory.

Every implemented operator from SURVEY.md §2 is registered here as a
``QuerySpec``: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the ANSI-SQL twin DuckDB runs as the correctness oracle.
Column names/aliases are identical on both sides (driver hashes values after
sorting columns by name).

Numeric-parity discipline (SURVEY.md §7 "hard parts"):
- money/maths aggregates go through exact DECIMAL arithmetic and are cast to
  DOUBLE only at the end — bit-identical in Spark and DuckDB;
- timestamps are pinned to UTC (session.py) and emitted as strings or
  date_trunc'd values, never raw zone-dependent renderings;
- only IEEE-exact scalar functions (abs/floor/ceil/sqrt/arithmetic) are
  hash-compared; libm-dependent ones (ln/exp) are rounded.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class QuerySpec(NamedTuple):
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


def registry() -> dict[str, QuerySpec]:
    from . import curation, llm, reference, relational, streaming, tpch, udfs

    merged: dict[str, QuerySpec] = {}
    # Order decides which entries land in the driver's bounded CORRECTNESS
    # window (first ~50): rotate the round-2-unchecked LLM/streaming/UDF
    # families to the front; the relational/reference entries (all green in
    # CORRECTNESS_r02) rotate behind them.
    for mod in (llm, streaming, udfs, reference, relational, tpch, curation):
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = spec
    # Round-18 rotation (the driver checks the first ~50).  Composition is
    # MECHANICAL — `tools/proof_ledger.py queue 50` at the r18 tree (stale
    # first, then oldest-proof-first fill); executes VERDICT r17 item 1:
    # (a) positions 0-6: the NEW r18 queries — ingest_admission_day2
    #     (day-2 batch gated against the MERGED base ∪ extension indexes:
    #     exact copies and appended-tail near-copies of day-1 ADMITTED
    #     docs rejected through the extension rows; two-day full-replay
    #     oracle — VERDICT r17 item 2) and ingest_index_compaction (the
    #     band-index cap re-application job over a deliberately
    #     over-appended fixture — VERDICT r17 item 3), plus the
    #     foreachBatch day-2 twin streaming_ingest_admission_day2
    #     (added mid-round; displaced length_drift_report from the r13
    #     fill tail per the displacement rule), and the VECTOR-side
    #     merge/day-2 trio — sim_index_merge (assign admitted vectors to
    #     their nearest centroid, append to the cluster-partitioned
    #     table; centroids refresh by rebuild/re-train), sim_topk_day2
    #     (the merged-index probe: copies of day-1 admitted vectors flag
    #     at cosine ~1.0 only through the appended rows) and its
    #     foreachBatch twin streaming_sim_topk_day2 — displacing
    #     filtered_revenue, funnel_stages, hll_registers from the tail,
    #     and sim_centroid_drift (the IVF rebuild monitor: per-cluster
    #     centroid drift of the merged table vs the staged quantizer —
    #     displacing dedup_passages);
    # (b) positions 7-9: the fit trio — stale again: the streaming drift
    #     twin became SPLIT-SAFE (per-batch sufficient statistics
    #     accumulated and solved once — VERDICT r17 item 6), which
    #     refactored quality_linear_fit into its mergeable halves;
    # (c) positions 10-12: the three rows-only-by-design names (r0 in the
    #     ledger — they can never carry a hash proof; the queue emits
    #     them with the oldest tier and the driver re-records their
    #     rows-only checks);
    # (d) positions 13-44: 32 of the 47 remaining r11-proven names
    #     (alphabetical; map_entries_explode + map_in_arrow head them —
    #     the two displaced from the r17 tail);
    # (e) positions 45-49: the r13-proven head minus the displaced tail the r13-proven head (alphabetical).
    front = [
        n
        for n in (
            # (a) NEW r18: day-2 merged-index gating + band compaction
            "ingest_admission_day2",
            "ingest_index_compaction",
            "streaming_ingest_admission_day2",
            "sim_index_merge",
            "sim_topk_day2",
            "streaming_sim_topk_day2",
            "sim_centroid_drift",
            # (b) fit trio: split-safe streaming drift refactor
            "quality_linear_fit",
            "quality_fit_drift",
            "streaming_quality_drift",
            # (c) rows-only-by-design (re-record the weaker check)
            "approx_distinct",
            "column_profile_approx",
            "serialize_json",
            # (d) the r11-proven fill (32, alphabetical)
            "map_entries_explode",
            "map_in_arrow",
            "merge_upsert",
            "ngram_lm_counts",
            "pack_sequences",
            "pandas_udf_grouped_agg",
            "pii_redact",
            "python_udf_scalar",
            "python_udtf",
            "quality_filter_pipeline",
            "quantize_embeddings",
            "rebalance_write",
            "rlhf_pair_stats",
            "runtime_bloom_join",
            "semdedup_representatives",
            "stratified_sample",
            "streaming_idempotent_sink",
            "text_normalize",
            "token_budget_split",
            "tpch_q10_returned",
            "tpch_q11_important_stock",
            "tpch_q12_shipmode",
            "tpch_q13_cust_distribution",
            "tpch_q16_parts_supplier",
            "tpch_q17_small_qty",
            "tpch_q19_discounted",
            "tpch_q20_potential_promo",
            "tpch_q22_global_sales",
            "url_host_dedup",
            "vocab_coverage",
            "window_dedup_rank",
            "zorder_stats",
            # (e) the r13-proven head (10, alphabetical)
            "asof_join",
            "bm25_term_scores",
            "contamination_overlap",
            "countmin_sketch",
            "dedup_editdistance",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
