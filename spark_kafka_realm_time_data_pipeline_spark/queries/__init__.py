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
    # Round-17 rotation (the driver checks the first ~50).  Composition
    # (executes the r16 verdict's items 1-4 exactly; the changed set below
    # is MECHANICAL — the fixed closure walker (tools/closure_fp.py now
    # resolves function-body imports) diffed against the r16-close tree):
    # (a) positions 0-2: the fit trio — quality_linear_fit's milli
    #     outputs moved from IEEE double division to integral `div`
    #     (ADVICE r16 medium: the old path diverges past 2^53), the
    #     drift monitor became a LEFT join surfacing fresh-only
    #     languages (with a new novel-lang 'xx' delta arm), and the
    #     streaming twin gained the second-micro-batch guard;
    # (b) positions 3-4: the admission funnel pair — now FOUR gates
    #     (exact -> containment -> MinHash near-dup on the
    #     doubly-cleared sliver -> quality) with a fourth
    #     appended-tail delta arm and the band-chain oracle;
    # (c) positions 5-8: the containment/near-dup incremental pairs —
    #     their staging boilerplate moved into the shared _staged_index
    #     helper (ADVICE r16), flipping their closures;
    # (d) positions 9-11: the staged-IVF trio — same helper move PLUS
    #     the n_lists growth rule (label quantizer <= 4000 vectors,
    #     sqrt(N)-scaled k-means lists beyond — VERDICT r16 item 3);
    # (e) position 12: kmeans_embeddings — the Lloyd loop moved into
    #     _km_loop (shared with the new kmeans_assign that IVF staging
    #     trains on) and its oracle's centroid rebuild switched to `//`
    #     on the exact multiple (same class as the ADVICE medium);
    # (f) positions 13-14: the NEW r17 queries — ingest_index_merge
    #     (MERGE-shaped maintenance: append admitted docs' rows to the
    #     hash/band indexes, read-back-verified counts) and
    #     curation_admission_e2e (the full ingest story: 4-gate
    #     admission -> admitted join the corpus -> curation funnel
    #     report) — VERDICT r16 item 8's two options, both shipped;
    #     their slots displaced map_in_arrow and map_entries_explode
    #     from the r11 fill tail per the displacement rule;
    # (g) positions 15-32: ALL 18 r10-proven names — the oldest-proof
    #     tier retires this round (VERDICT r16 item 1);
    # (h) positions 33-49: the first 17 of the 48 remaining r11-proven
    #     names (alphabetical).  Any further r17 additions displace
    #     from this r11 fill tail, never from the (a)-(f) head.
    front = [
        n
        for n in (
            # (a) fit trio: integer-div fix + left-join drift + guard
            "quality_linear_fit",
            "quality_fit_drift",
            "streaming_quality_drift",
            # (b) 4-gate admission funnel + streaming twin
            "ingest_admission",
            "streaming_ingest_admission",
            # (c) staging-helper closure changes: containment + near-dup
            "dedup_containment_incremental",
            "streaming_dedup_containment",
            "dedup_incremental_indexed",
            "streaming_dedup_incremental",
            # (d) staged-IVF trio: helper move + n_lists growth rule
            "sim_incremental_topk",
            "streaming_sim_topk",
            "sim_incremental_range",
            # (e) kmeans refactor + oracle `//`
            "kmeans_embeddings",
            # (f) NEW r17: MERGE-shaped index maintenance + e2e chain
            "ingest_index_merge",
            "curation_admission_e2e",
            # (g) the 18 r10-proven names — oldest tier retires
            "sim_bruteforce_topk",
            "sim_lsh_topk",
            "sql_udf_pricing",
            "state_store_inspect",
            "streaming_chained_windows",
            "streaming_full_outer_join",
            "streaming_observed_metrics",
            "streaming_ppl_gate",
            "streaming_rate_source",
            "text_fingerprint",
            "text_langid",
            "text_quality",
            "text_repetition",
            "text_tokens",
            "time_rollup",
            "tpch_q14_promo",
            "transpose_metrics",
            "unpivot_measures",
            # (h) the r11-proven head (17 of 48, alphabetical)
            "agg_listagg",
            "ann_ivf_centroids",
            "apply_in_pandas",
            "bpe_pair_counts",
            "curation_pipeline_e2e",
            "curriculum_buckets",
            "dedup_exact",
            "dedup_simhash",
            "doc_chunk_overlap",
            "domain_mix_weights",
            "embedding_normalize",
            "fim_transform",
            "heavy_hitters",
            "join_skew_aqe",
            "join_theta_band",
            "length_histogram",
            "map_functions",
        )
        if n in merged  # ordering hint only — a renamed query must not break registry()
    ]
    rest = [n for n in merged if n not in front]
    ordered = front + rest
    return {n: merged[n] for n in ordered}
