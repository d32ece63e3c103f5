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
    # Round-14 rotation (the driver checks the first ~50).  Composition
    # (executes the r13 verdict's queued window exactly):
    # (a) positions 0-1: the never-driver-checked names — the r13
    #     grayscale JPEG query and the NEW r14 color JPEG query;
    # (b) position 2: avro_pyds_roundtrip — plan changed in r13 (the write
    #     path moved to distributed per-partition containers), so its r13
    #     proof predates the current physical shape;
    # (c) next 43: all names whose newest driver proof is r7 (graph trio,
    #     jaccard-prefix, incremental dedup, the streaming sketch family,
    #     IVF/PQ similarity, tpch q8/q9, multimodal audio/features/fusion,
    #     ...);
    # (d) r14 plan-changed re-proofs: the MinHash tiers (verify-stage
    #     semi-filter) and the agreement report (inherits both
    #     prefix-tier re-plans);
    # (e) r8-proven fill to 50.
    #     After this round every oracled name's proof is r8-or-newer and
    #     the window's only overlaps with r13's are the mandated
    #     plan-changed re-proofs in (b) and (d).
    front = [
        n
        for n in (
            # (a) never driver-checked: the r13 grayscale JPEG query and
            # the NEW r14 color JPEG query
            "multimodal_jpeg_stats",
            "multimodal_jpeg_color",
            # (b) plan changed in r13 — distributed Avro write path
            "avro_pyds_roundtrip",
            # (c) the 43 r7-proven names
            "ann_pq_codes",
            "anomaly_zscore",
            "bloom_prune_join",
            "boilerplate_strip",
            "bpe_merge_steps",
            "cdc_tombstone_merge",
            "dedup_components",
            "dedup_incremental",
            "dedup_incremental_indexed",
            "dedup_jaccard_prefix",
            "dedup_keep_corpus",
            "dedup_pagerank",
            "dedup_triangles",
            "epoch_shuffle",
            "hll_window_merge",
            "join_skew_salted",
            "kmeans_embeddings",
            "lm_bigram_coverage",
            "multimodal_audio",
            "multimodal_features",
            "multimodal_fusion",
            "quantile_sketch_merge",
            "sim_ivf_topk",
            "sim_pq_topk",
            "sim_recall_report",
            "streaming_anomaly",
            "streaming_bloom",
            "streaming_countmin",
            "streaming_dedup_incremental",
            "streaming_hll",
            "streaming_interval_join",
            "streaming_quality_gate",
            "streaming_quantile",
            "streaming_scd2_lookup",
            "streaming_static_join",
            "streaming_stedi_join",
            "streaming_stedi_unbounded",
            "streaming_union",
            "streaming_window_sliding",
            "streaming_window_tumbling",
            "substring_dup_spans",
            "tpch_q8_market_share",
            "tpch_q9_profit",
            # (d) plan-changed in r14 — the candidate-participant
            # semi-filter in jaccard_verify_arrays reshapes the MinHash
            # tiers' verify stage, so they re-prove despite their r13
            # proof (same rule as avro_pyds_roundtrip above);
            # dedup_agreement_report inherits both r14 prefix-tier
            # re-plans
            "dedup_minhash_lsh",
            "dedup_minhash_ngram",
            "dedup_agreement_report",
            # dedup_embedding: norm folded once per vector instead of per
            # pair (value-exact, but the plan changed -> re-prove)
            "dedup_embedding",
            # (e) r8-proven names that yielded their fill slots to the
            # r14 plan-changed re-proofs: envelope_roundtrip,
            # column_profile, cogroup_apply_in_pandas, sim_range_search —
            # all r8-proven, so they are safe outside the window and sit
            # at the head of the r15 queue (COVERAGE.md)
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
