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
    # Round-16 rotation (the driver checks the first ~50).  Composition
    # (executes the r15 verdict's items 1 + 3 exactly):
    # (a) positions 0-1: multimodal_jpeg_stats + multimodal_jpeg_color —
    #     their shared decoder module (operators/multimodal.py) churned
    #     in r15 (+941 lines: DRI/SOF2 branches, baseline-color sampling
    #     generalization) while their newest driver proofs stayed
    #     r13/r14.  Mandated re-proofs, ahead of everything;
    # (b) position 2: NEW r16 registration multimodal_jpeg_sampling
    #     (non-4:2:0 baseline color layouts — decoder + pytests landed
    #     r15, QuerySpec lands this round);
    # (c) positions 3-4: the two progressive JPEG queries — r15-proven,
    #     but r16 changed their VALUE PATH (n_scans is now counted from
    #     the scans the decoder consumed instead of replaying the
    #     encoder formula, per ADVICE r15) so the proof must follow;
    # (d) positions 5-6: NEW r16 pair — the incremental containment
    #     batch query and its availableNow streaming twin (VERDICT r15
    #     item 5's preferred next surface), sharing one oracle;
    # (e) positions 7-9: the 3 remaining r8-proven stragglers
    #     (displaced from the r14 fill; the r15 additions left no slot);
    # (f) positions 10-11: NEW r16 pair #2 — the incremental ANN batch
    #     query (staged cluster-partitioned IVF index, DPP probe) and
    #     its availableNow streaming twin, sharing one oracle;
    # (g) positions 12-13: sim_ivf_topk + sim_recall_report — their
    #     shared centroid computation moved into ivf_centroids /
    #     _ivf_probe_topk this round (same plan, refactored closure),
    #     so the proof-freshness gate correctly forces a re-proof;
    # (h) position 14: NEW r16 quality_linear_fit — the in-engine
    #     closed-form ridge fit (one-scan integer sufficient statistics
    #     + exact per-group Cramer solve);
    # (i) positions 15-16: NEW r16 pair #3 — the end-to-end
    #     ingest-admission funnel (exact-hash -> containment -> quality
    #     gates vs the maintained indexes) and its foreachBatch
    #     availableNow twin, sharing one oracle;
    # (j) positions 17-18: NEW r16 pair #4 — the fit-drift monitor
    #     (fresh-batch ridge re-fit vs the staged base model table)
    #     and its foreachBatch availableNow twin, sharing one oracle;
    # (k) position 19: NEW r16 sim_incremental_range — the embedding
    #     near-dup ingest gate (k=1 staged-IVF probe, cosine>=0.99);
    # (l) positions 20-49: the first 30 of the 48 r10-proven names —
    #     the oldest-proof tier outside this front.  The alphabetical
    #     tail (sim_bruteforce_topk .. unpivot_measures) heads the r17
    #     queue.  Any further r16 additions displace from this r10
    #     fill tail, never from the (a)-(k) head.
    front = [
        n
        for n in (
            # (a) decoder-module churn re-proofs (VERDICT r15 item 1)
            "multimodal_jpeg_stats",
            "multimodal_jpeg_color",
            # (b) NEW in r16
            "multimodal_jpeg_sampling",
            # (c) n_scans value-path change (ADVICE r15)
            "multimodal_jpeg_progressive",
            "multimodal_jpeg_progressive_color",
            # (d) NEW in r16: incremental containment + streaming twin
            "dedup_containment_incremental",
            "streaming_dedup_containment",
            # (e) r8-proven stragglers
            "cogroup_apply_in_pandas",
            "column_profile",
            "sim_range_search",
            # (f) NEW in r16: incremental ANN + streaming twin
            "sim_incremental_topk",
            "streaming_sim_topk",
            # (g) closure refactored this round (ivf_centroids split)
            "sim_ivf_topk",
            "sim_recall_report",
            # (h) NEW in r16: in-engine closed-form ridge fit
            "quality_linear_fit",
            # (i) NEW in r16: the ingest-admission funnel + streaming twin
            "ingest_admission",
            "streaming_ingest_admission",
            # (j) NEW in r16: fit-drift monitor + streaming twin
            "quality_fit_drift",
            "streaming_quality_drift",
            # (k) NEW in r16: embedding near-dup ingest gate
            "sim_incremental_range",
            # (l) the r10-proven head (30 of 48, alphabetical)
            "agg_moments",
            "apply_in_arrow",
            "binaryfile_source",
            "bitmap_distinct",
            "bucketed_join",
            "cdc_upsert_latest",
            "collation_group",
            "compaction_execute",
            "csv_column_roundtrip",
            "dedup_simhash_hamming",
            "distinct_pairs",
            "dpp_prune_join",
            "embedding_stats",
            "envelope_pyds_roundtrip",
            "envelope_pyds_sink",
            "envelope_pyds_stream",
            "join_left",
            "join_range",
            "lm_perplexity_filter",
            "multimodal_frames",
            "multimodal_meta",
            "multimodal_resize",
            "nation_revenue",
            "pandas_udf_scalar",
            "param_sql_topk",
            "python_udtf_table_arg",
            "scalar_math",
            "schema_merge_read",
            "set_except_all",
            "set_intersect_all",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
