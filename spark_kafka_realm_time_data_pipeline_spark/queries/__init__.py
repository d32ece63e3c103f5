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
    # Round-12 rotation (the driver checks the first ~50).  Composition
    # (executes the r11 verdict's queued window exactly):
    # (a) positions 0-2: the three r11 PLAN-CHANGED queries whose current
    #     physical plans have no driver proof (bm25 one-tokenize checkpoint,
    #     rrf matched-frame materialization, editdistance id-only
    #     candidates) — the r11 verdict's top item;
    # (b) queries NEW in r12 — never driver-checked (test_registry
    #     enforces these sit inside the window);
    # (c) the 33 remaining names whose latest driver proof is r6;
    # (d) the r7-proven tail, dedup funnel + streaming sketch families
    #     first, filling the window to 50.  After this round every
    #     oracled name's latest driver proof is r7 or newer.
    front = [
        n
        for n in (
            # (a) r11 plan-changed, driver-unproven in current shape
            "bm25_term_scores",
            "retrieval_rrf_fusion",
            "dedup_editdistance",
            # (b) new in r12 — never driver-checked
            "multimodal_png_stats",
            "column_profile_approx",
            "dedup_containment",
            "dedup_passages",
            "recursive_cte_closure",
            "sql_script_histogram",
            "dedup_keep_containment",
            "avro_pyds_roundtrip",
            # (b') plan/value-changed in r12 (translate()-based char
            # counting; packed-aggregate pretokenize; broadened phone
            # pattern) — re-proof before the tail
            "regex_pretokenize",
            "quality_logit_score",
            "pii_redact_v2",
            "try_arithmetic",
            # (c) r6-proven
            "asof_join",
            "contamination_overlap",
            "countmin_sketch",
            "filtered_revenue",
            "funnel_stages",
            "hll_registers",
            "length_drift_report",
            "ngram_decontaminate",
            "orderby_limit",
            "pivot_events",
            "pricing_summary",
            "scd2_intervals",
            "sessionize",
            "stedi_flagship",
            "streaming_cdc_latest",
            "streaming_dedup",
            "streaming_dedup_watermark",
            "streaming_foreachbatch_topk",
            "streaming_late_window",
            "streaming_outer_join",
            "streaming_session_window",
            "streaming_stateful_count",
            "tfidf_top_terms",
            "time_gapfill",
            "topk_per_group",
            "tpch_q3_shipping",
            "tpch_q4_order_priority",
            "tpch_q5_local_supplier",
            "tpch_q6_forecast",
            "tpch_q7_volume",
            "window_range_frame",
            "window_rank",
            "window_running",
            # (d) r7-proven tail: dedup funnel + streaming sketches first
            "dedup_minhash_lsh",
            "dedup_minhash_ngram",
            "dedup_jaccard_prefix",
            "dedup_components",
            "dedup_pagerank",
            "dedup_triangles",
            "dedup_incremental",
            "streaming_dedup_incremental",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
