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
    # Round-8 rotation (the driver checks the first ~50).  Composition:
    # (a) the two r7 driver-fails, now fixed (uncast DuckDB HUGEINT in the
    #     oracle SQL — CAST(... AS BIGINT) added; Spark side unchanged) —
    #     window head so CORRECTNESS_r08 records the re-proof;
    # (a') the 21 queries NEW in r8 — never driver-checked, so they must
    #     sit inside the window (test_registry enforces this);
    # (b) the 34 r2-era names whose last driver proof predates two corpus
    #     regenerations (reference chain, scalar/set-op/subquery/agg/join
    #     families, r2 relational core) — oldest-proof-first per the r7
    #     verdict; with 20 head entries a 50-wide window reaches ~30 of
    #     them, the tail plus
    # (c) the 24 r3-era names (dedup/similarity/text/multimodal/UDF
    #     families) queue immediately behind for the r9 window;
    # (d) every query whose PLAN changed this round (staged pair-graph
    #     trio + keep_corpus, heavy_hitters fan-out removal, range-search
    #     bucket cap, aggregate-first null-safe join, boilerplate
    #     min-support, anomaly decimal-square) — driver-proven in r7 or
    #     new-this-round, re-proven by the local sf0.01 sweep after the
    #     change, rotated here in case the window is wider than 50.
    front = [
        n
        for n in (
            # (a) r7 driver-fails, oracle fixed
            "bpe_encode",
            "compaction_plan",
            # (a') new in r8 — never driver-checked
            "sim_range_search",
            "mixture_cap_sample",
            "mv_incremental_update",
            "fk_integrity_audit",
            "streaming_mv_update",
            "recursive_rollup",
            "window_lag_lead",
            "variant_json_get",
            "regex_pretokenize",
            "snapshot_diff",
            "k_anonymity_audit",
            "column_profile",
            "lateral_topk",
            "join_null_safe",
            "streaming_semi_join",
            "dedup_agreement_report",
            "xml_roundtrip",
            "mixture_repeat_plan",
            "cogroup_apply_in_pandas",
            "agg_string_concat",
            "streaming_session_dynamic",
            # (b) r2-era: reference chain
            "envelope_roundtrip",
            "cast_projection",
            "json_extract",
            "null_filter_split",
            "temp_view_sql",
            # (b) r2-era: scalar / set-op / subquery / agg / join families
            "scalar_string",
            "scalar_date",
            "scalar_array",
            "set_union",
            "set_intersect",
            "set_except",
            "exists_subquery",
            "scalar_subquery",
            "correlated_min_subquery",
            "agg_rollup",
            "agg_cube",
            "agg_grouping_sets",
            "agg_having",
            "join_anti",
            "join_semi",
            "join_full",
            "view_over_agg_max",
            "in_aggregate_subquery",
            "multi_exists_anti",
            # (b) r2-era: relational core
            "group_stats",
            "percentiles",
            "topk_join",
            "nation_revenue",
            "join_left",
            "join_range",
            "cdc_upsert_latest",
            "time_rollup",
            "distinct_pairs",
            "unpivot_measures",
            # (c) r3-era
            "scalar_math",
            "tpch_q14_promo",
            "dedup_simhash_hamming",
            "dedup_embedding",
            "sim_bruteforce_topk",
            "sim_lsh_topk",
            "text_quality",
            "text_tokens",
            "text_langid",
            "text_fingerprint",
            "text_repetition",
            "multimodal_meta",
            "multimodal_frames",
            "multimodal_resize",
            "embedding_stats",
            "pandas_udf_scalar",
            "pandas_udf_grouped_agg",
            "apply_in_pandas",
            "python_udf_scalar",
            "python_udtf",
            "map_in_arrow",
            "map_functions",
            "map_entries_explode",
            "join_theta_band",
            # (d) r8 plan changes (driver-green in r7; local sweep re-proof)
            "dedup_components",
            "dedup_pagerank",
            "dedup_triangles",
            "heavy_hitters",
            "streaming_quantile",
            "streaming_anomaly",
            "streaming_dedup_incremental",
            "boilerplate_strip",
            "anomaly_zscore",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
