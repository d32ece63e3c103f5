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
    # Round-4 rotation: the 10 round-3 additions land at positions 0-9 (they
    # were past the r3 window; every other oracled query already has a green
    # row in CORRECTNESS_r02 or _r03), queries whose code/oracle changed this
    # round come next so the fix itself is driver-proven, then the round-4
    # additions fill the rest of the ~50-entry window.  Previously-proven
    # entries rotate behind.
    front = [
        n
        for n in (
            # new in r3, mirror-verified, not yet driver-green
            "tpch_q9_profit",
            "scd2_intervals",
            "funnel_stages",
            "zorder_stats",
            "pii_redact",
            "heavy_hitters",
            "streaming_interval_join",
            "time_gapfill",
            "merge_upsert",
            "streaming_foreachbatch_topk",
            # changed in r4 (plan restructures — need fresh green rows)
            "ngram_decontaminate",
            "dedup_minhash_ngram",
            # new in r4
            "tpch_q3_shipping",
            "tpch_q4_order_priority",
            "tpch_q5_local_supplier",
            "tpch_q6_forecast",
            "tpch_q8_market_share",
            "tpch_q10_returned",
            "tpch_q11_important_stock",
            "tpch_q12_shipmode",
            "tpch_q13_cust_distribution",
            "tpch_q16_parts_supplier",
            "tpch_q17_small_qty",
            "tpch_q19_discounted",
            "tpch_q20_potential_promo",
            "tpch_q22_global_sales",
            "text_normalize",
            "domain_mix_weights",
            "curriculum_buckets",
            "embedding_normalize",
            "ann_ivf_centroids",
            "ngram_lm_counts",
            "url_host_dedup",
            "contamination_overlap",
            "quality_filter_pipeline",
            "token_budget_split",
            "rlhf_pair_stats",
            "window_dedup_rank",
            "bpe_pair_counts",
            "doc_chunk_overlap",
            "semdedup_representatives",
            "vocab_coverage",
            "curation_pipeline_e2e",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
