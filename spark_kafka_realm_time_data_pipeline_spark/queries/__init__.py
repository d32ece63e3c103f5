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
    # Round-7 rotation (the driver checks the first ~50).  Composition:
    # (a) new queries + every query whose PLAN changed this round — staged
    #     base-index dedup, the now-oracled IVF + recall report, the 48-hash
    #     MinHash family, suffix-blocked edit distance, the real BMP decode,
    #     the pmod salt fix, and the 8 streaming replays that now skip the
    #     trailing no-data batch;
    # (b) the 13 r5-era front-tail entries the r6 window never re-proved
    #     (the r6 front list overflowed the 50-entry window);
    # (c) the oldest r2-era greens (scalar families, set ops, subqueries,
    #     agg shapes, join shapes) — their rows predate two corpus
    #     regenerations.  The 11 late-session r7 additions (exact-Jaccard
    #     join, BPE encode, quality classifier + streaming gate, quantile
    #     sketch + streaming twin, PQ scan, compaction planner, tombstone
    #     CDC, anomaly monitor + streaming twin) take the window head, so
    #     the tail from ~tpch_q20 onward (plus the r2/r3-era scalar/set-op/
    #     subquery/agg/join names) rotates in r8; ALL of them are
    #     check.py-green at sf0.01 today (full-sweep log, round 7).
    front = [
        n
        for n in (
            # (a) new in r7
            "dedup_jaccard_prefix",
            "bpe_encode",
            "quality_logit_score",
            "quantile_sketch_merge",
            "sim_pq_topk",
            "streaming_quantile",
            "compaction_plan",
            "cdc_tombstone_merge",
            "anomaly_zscore",
            "streaming_quality_gate",
            "streaming_anomaly",
            "multimodal_fusion",
            "retrieval_rrf_fusion",
            "boilerplate_strip",
            "streaming_scd2_lookup",
            "dedup_triangles",
            "epoch_shuffle",
            "kmeans_embeddings",
            "bloom_prune_join",
            "hll_window_merge",
            "lm_bigram_coverage",
            "streaming_hll",
            "substring_dup_spans",
            "multimodal_audio",
            "ann_pq_codes",
            "streaming_bloom",
            "dedup_pagerank",
            "bpe_merge_steps",
            "dedup_incremental_indexed",
            "sim_recall_report",
            "sim_ivf_topk",
            # (a) MinHash family: 64 -> 48 hashes (6x8 banding)
            "dedup_minhash_lsh",
            "dedup_minhash_ngram",
            "dedup_components",
            "dedup_keep_corpus",
            "dedup_incremental",
            "streaming_dedup_incremental",
            # (a) plan changes
            "dedup_editdistance",
            "multimodal_features",
            "join_skew_salted",
            # (a) replay profile changed: no-data batch skipped
            "streaming_stedi_join",
            "streaming_stedi_unbounded",
            "streaming_interval_join",
            "streaming_static_join",
            "streaming_window_tumbling",
            "streaming_window_sliding",
            "streaming_union",
            "streaming_countmin",
            # (b) r5-era tail never re-proven in the r6 window
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
            # (c) oldest r2-era greens: scalar / set-op / subquery / agg /
            # join families
            "scalar_string",
            "scalar_date",
            "scalar_array",
            "scalar_math",
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
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
