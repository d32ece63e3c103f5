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
    # Round-15 rotation (the driver checks the first ~50).  Composition
    # (executes the r14 verdict's items 1-2 exactly):
    # (a) positions 0-1: dedup_containment + dedup_keep_containment —
    #     their shared pipeline (containment_pairs, operators/dedup.py)
    #     changed plan twice in r14 (rank-stage n_toks count-window +
    #     verify semi-filter) but they were NOT in the r14 window, so
    #     their newest driver proof (r13) predates their current
    #     physical plans.  Mandated re-proofs, ahead of everything;
    # (b) the 45 remaining r8-proven names (agg_cube .. xml_roundtrip,
    #     per COVERAGE.md's planned-r15 queue) — after this round every
    #     oracled name's newest proof is r10-or-newer;
    # (c) head of the 49 r10-proven names (agg_moments, apply_in_arrow,
    #     binaryfile_source) to fill 50.  Any r15 additions displace
    #     from this r10 fill, never from the (a)/(b) head.
    #     After this round every oracled name's proof is r10-or-newer and
    #     the window's only overlap with r14's is empty (the containment
    #     pair's newest proof is r13, so nothing here repeats r14).
    front = [
        n
        for n in (
            # (a) r14 plan-changed, proof predates the plan: the shared
            # containment pipeline (operators/dedup.py containment_pairs)
            # gained the rank-stage count-window and the verify
            # semi-filter in r14 while these two sat OUTSIDE the r14
            # window — mandated re-proofs at positions 0-1
            "dedup_containment",
            "dedup_keep_containment",
            # (a2) NEW in r15: color JPEG decode through DRI restart
            # intervals, and progressive (SOF2) JPEG decode (never
            # driver-checked — new queries enter the window in the
            # registering commit); they displace binaryfile_source and
            # apply_in_arrow (both r10-proven) from the fill below
            "multimodal_jpeg_dri",
            "multimodal_jpeg_progressive",
            "multimodal_jpeg_progressive_color",
            # (b) the 45 remaining r8-proven names
            "agg_cube",
            "agg_grouping_sets",
            "agg_having",
            "agg_rollup",
            "agg_string_concat",
            "bpe_encode",
            "cast_projection",
            "compaction_plan",
            "correlated_min_subquery",
            "envelope_roundtrip",
            "exists_subquery",
            "fk_integrity_audit",
            "group_stats",
            "in_aggregate_subquery",
            "join_anti",
            "join_full",
            "join_null_safe",
            "join_semi",
            "json_extract",
            "k_anonymity_audit",
            "lateral_topk",
            "mixture_cap_sample",
            "mixture_repeat_plan",
            "multi_exists_anti",
            "mv_incremental_update",
            "null_filter_split",
            "percentiles",
            "recursive_rollup",
            "scalar_array",
            "scalar_date",
            "scalar_string",
            "scalar_subquery",
            "set_except",
            "set_intersect",
            "set_union",
            "snapshot_diff",
            "streaming_mv_update",
            "streaming_semi_join",
            "streaming_session_dynamic",
            "temp_view_sql",
            "topk_join",
            "variant_json_get",
            "view_over_agg_max",
            "window_lag_lead",
            "xml_roundtrip",
            # (c) no fill: 2 mandated re-proofs + 3 r15 additions + the
            # 45 r8-proven names above make exactly 50.  The remaining 3
            # r8-proven names (cogroup_apply_in_pandas, column_profile,
            # sim_range_search — displaced from the r14 fill) head the
            # r16 queue (COVERAGE.md)
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
