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
    # Round-11 rotation (the driver checks the first ~50).  Composition:
    # (a) queries NEW in r11 — never driver-checked, so they must sit
    #     inside the window (test_registry enforces this);
    # (b) the 8 names whose latest driver proof is still r3 (they sat at
    #     positions 50-57 — just outside a 50-wide window — for three
    #     consecutive rounds: the pandas/arrow UDF and map families plus
    #     the theta band join);
    # (c) the 35 names whose latest driver proof is r5 (dedup/stat
    #     utilities, 9 TPC-H shapes, and the 17 curation names).
    #     8 + 35 = 43, leaving 7 window slots for (a).  After this round
    #     every oracled name's latest driver proof is r6 or newer.
    front = [
        n
        for n in (
            # (a) new in r11 — never driver-checked
            "join_skew_aqe",
            "streaming_idempotent_sink",
            "pii_redact_v2",
            "rebalance_write",
            "agg_listagg",
            "fim_transform",
            "runtime_bloom_join",
            # (b) r3-era (stuck at positions 50-57 since r8)
            "join_theta_band",
            "pandas_udf_grouped_agg",
            "apply_in_pandas",
            "python_udf_scalar",
            "python_udtf",
            "map_in_arrow",
            "map_functions",
            "map_entries_explode",
            # (c) r5-era
            "dedup_exact",
            "dedup_simhash",
            "zorder_stats",
            "pii_redact",
            "heavy_hitters",
            "merge_upsert",
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
            "quality_filter_pipeline",
            "length_histogram",
            "url_host_dedup",
            "window_dedup_rank",
            "stratified_sample",
            "pack_sequences",
            "token_budget_split",
            "curriculum_buckets",
            "domain_mix_weights",
            "doc_chunk_overlap",
            "vocab_coverage",
            "ngram_lm_counts",
            "bpe_pair_counts",
            "rlhf_pair_stats",
            "embedding_normalize",
            "quantize_embeddings",
            "semdedup_representatives",
            "ann_ivf_centroids",
            "curation_pipeline_e2e",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
