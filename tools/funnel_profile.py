"""Per-gate profile of the ingest-admission funnel — proves the
funnel-pruning claim quantitatively instead of asserting it.

For each corpus (sf0.1 and, when staged, the 10x .scale/sf1), the tool
times each gate of ``operators/ingest.ingest_admission_batch`` in
isolation over the same three-arm delta the registered query uses:

- exact:       sha256 of the delta + broadcast semi-probe of the staged
               hash index (the cheapest gate, runs first);
- containment: the staged-index probe on the NOT-EXACT sliver only
               (what the funnel actually pays) AND on the FULL delta
               (what a naive unordered pipeline would pay) — the delta
               between those two numbers IS the funnel-pruning win;
- near-dup:    the staged MinHash band-index probe on the doubly-cleared
               sliver only AND on the full delta — the second
               funnel-pruning win, measured the same A/B way;
- quality:     the fixed-weight integer logit over the full delta.

Each timing materializes the gate's output with a count() after the
shared inputs are staged/warmed, so the numbers isolate per-gate work,
not index staging.  Prints one JSON line per corpus.

Usage: python tools/funnel_profile.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators import dedup as D
from spark_kafka_realm_time_data_pipeline_spark.operators import ingest as I
from spark_kafka_realm_time_data_pipeline_spark.operators.text import (
    quality_logit_score,
)
from spark_kafka_realm_time_data_pipeline_spark.queries.llm import (
    _ingest_delta,
    staged_base_index,
    staged_containment_index,
    staged_hash_index,
)
from spark_kafka_realm_time_data_pipeline_spark.session import get_spark
from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table


def _timed(fn, reps: int = 3):
    """Median-of-``reps`` wall time (single warm runs are ±10% on this
    box, which can drown a 20-30% pruning delta) plus the result count."""
    import statistics

    times, n = [], None
    for _ in range(reps):
        t0 = time.monotonic()
        n = fn()
        times.append(time.monotonic() - t0)
    return round(statistics.median(times), 3), n


def profile(spark, sf_dir: str) -> dict:
    cidx = staged_containment_index(spark, sf_dir)
    hidx = staged_hash_index(spark, sf_dir)
    bidx = staged_base_index(spark, sf_dir)
    delta = _ingest_delta(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    bh = spark.read.parquet(f"{hidx}/bh")

    def exact_ids():
        dh = delta.select("doc_id", F.sha2("text", 256).alias("h"))
        return bh.join(F.broadcast(dh), "h").select("doc_id").distinct()

    # warm the exact gate too (hash-index read + codegen), mirroring the
    # containment warm-up below — otherwise t_exact absorbs the staged
    # index's first read and skews the per-gate comparison
    exact_ids().count()
    t_exact, n_exact = _timed(lambda: exact_ids().count())
    ids = exact_ids().localCheckpoint(eager=True)
    not_exact = delta.join(F.broadcast(ids), "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    # warm both variants once (staged-index pages + codegen), then time the
    # warm pass — the first containment run otherwise absorbs all index
    # read warmup and the A/B points the wrong way
    D.containment_vs_base_batch(spark, cidx, not_exact).count()
    D.containment_vs_base_batch(spark, cidx, delta).count()
    t_cont_sliver, n_cont = _timed(
        lambda: D.containment_vs_base_batch(spark, cidx, not_exact).count()
    )
    t_cont_full, _ = _timed(
        lambda: D.containment_vs_base_batch(spark, cidx, delta).count()
    )
    # near-dup gate: doubly-cleared sliver (what the funnel pays) vs the
    # full delta (what an unordered pipeline would pay) — same warm-then-
    # time discipline as the containment pair
    contained = (
        D.containment_vs_base_batch(spark, cidx, not_exact)
        .select(F.col("delta_id").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    survivors = not_exact.join(
        F.broadcast(contained), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    D.incremental_near_dup_batch(spark, bidx, survivors).count()
    D.incremental_near_dup_batch(spark, bidx, delta).count()
    t_nd_sliver, n_nd = _timed(
        lambda: D.incremental_near_dup_batch(spark, bidx, survivors).count()
    )
    t_nd_full, _ = _timed(
        lambda: D.incremental_near_dup_batch(spark, bidx, delta).count()
    )
    t_quality, n_delta = _timed(lambda: quality_logit_score(delta).count())
    return {
        "sf_dir": sf_dir,
        "n_delta": n_delta,
        "n_exact": n_exact,
        "n_contained_pairs": n_cont,
        "n_near_dup_pairs": n_nd,
        "gate_secs": {
            "exact": t_exact,
            "containment_not_exact_only": t_cont_sliver,
            "containment_full_delta": t_cont_full,
            "near_dup_survivors_only": t_nd_sliver,
            "near_dup_full_delta": t_nd_full,
            "quality": t_quality,
        },
        "funnel_pruning_win_secs": round(t_cont_full - t_cont_sliver, 3),
        "near_dup_pruning_win_secs": round(t_nd_full - t_nd_sliver, 3),
    }


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark()
    for d in dirs:
        print(json.dumps(profile(spark, d)))


if __name__ == "__main__":
    main()
