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
    # Round-6 rotation: the 7 queries broken by the corpus's TIMESTAMP_NTZ
    # flip (fixed this round via inferTimestampNTZ.enabled=false +
    # convert_nano_ts NTZ->LTZ normalization) go first so the fix itself is
    # driver-proven with fresh green rows — their old green rows predate the
    # corpus regeneration and are stale.  Queries whose plans changed this
    # round (MinHash trim, flagship broadcast removal) come next.  The rest
    # of the ~50-entry window re-proves the timestamp-consuming batch
    # families under the restored LTZ read path.  Previously-proven entries
    # rotate behind.
    front = [
        n
        for n in (
            # broken by the NTZ corpus flip, fixed in r6 — must re-prove
            "sessionize",
            "streaming_stedi_join",
            "streaming_outer_join",
            "streaming_late_window",
            "streaming_session_window",
            "streaming_dedup_watermark",
            "streaming_interval_join",
            # plans changed in r6 — need fresh green rows
            "dedup_minhash_lsh",
            "dedup_minhash_ngram",
            # new in r6
            "dedup_components",
            "dedup_keep_corpus",
            "tfidf_top_terms",
            "bm25_term_scores",
            "dedup_incremental",
            "countmin_sketch",
            "streaming_countmin",
            "hll_registers",
            "dedup_editdistance",
            "streaming_dedup_incremental",
            "length_drift_report",
            # gram keys switched md5 -> polynomial in r6 — old greens stale
            "ngram_decontaminate",
            "contamination_overlap",
            # runner replay profile changed in r6 — re-prove the one
            # streaming query not already listed above
            "streaming_foreachbatch_topk",
            "stedi_flagship",
            "join_skew_salted",
            # timestamp-consuming families: re-prove hash parity under the
            # restored LTZ-under-UTC read path
            "streaming_window_tumbling",
            "streaming_window_sliding",
            "streaming_stedi_unbounded",
            "streaming_dedup",
            "streaming_cdc_latest",
            "streaming_stateful_count",
            "streaming_static_join",
            "streaming_union",
            "time_gapfill",
            "scd2_intervals",
            "asof_join",
            "window_range_frame",
            "pivot_events",
            "funnel_stages",
            "orderby_limit",
            "window_rank",
            "window_running",
            "topk_per_group",
            "pricing_summary",
            "filtered_revenue",
            "tpch_q3_shipping",
            "tpch_q4_order_priority",
            "tpch_q5_local_supplier",
            "tpch_q6_forecast",
            "tpch_q7_volume",
            "tpch_q8_market_share",
            "tpch_q9_profit",
            "tpch_q10_returned",
            "tpch_q12_shipmode",
            "tpch_q14_promo",
            "view_over_agg_max",
            "in_aggregate_subquery",
            "tpch_q19_discounted",
            "tpch_q20_potential_promo",
            "multi_exists_anti",
            "merge_upsert",
            "heavy_hitters",
            "zorder_stats",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
