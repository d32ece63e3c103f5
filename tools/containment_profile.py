"""Stage profile for the directed-containment funnel (VERDICT r13 task #5).

Re-executes containment_pairs' internal stages with a materialization
barrier after each, so the sf1 wall cost decomposes into named stages:
tokenize, rank (df join + window + checkpoint), prefix/index builds,
candidate join (+positional prune), exact verify.  Each stage's input is
the PREVIOUS stage's checkpoint, so timings are additive, not nested.

Usage: python tools/containment_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators import dedup as D
from spark_kafka_realm_time_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = get_spark()
    tnum, tden, cap = 9, 10, D.PREFIX_CAP
    stages: dict[str, float] = {}

    t0 = time.time()
    corpus = D.planted_corpus(spark, sf_dir)
    toks = D.doc_shingles(D.fan_out(corpus)).localCheckpoint(eager=True)
    stages["tokenize"] = time.time() - t0

    t0 = time.time()
    df = toks.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        toks.join(df, "tok")
        .withColumn("p", F.row_number().over(w))
        .withColumn("n_toks", F.count("*").over(Window.partitionBy("doc_id")))
        .localCheckpoint(eager=True)
    )
    stages["rank"] = time.time() - t0

    t0 = time.time()
    prefix_len = (
        F.col("n_toks")
        - F.expr(f"({tnum} * n_toks + {tden} - 1) div {tden}")
        + F.lit(1)
    )
    wt = Window.partitionBy("tok").orderBy("doc_id")
    pref = (
        ranked.filter(F.col("p") <= prefix_len)
        .withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= cap)
        .select(
            F.col("doc_id").alias("doc_a"), "tok",
            F.col("p").alias("pa"), F.col("n_toks").alias("n_a"),
        )
        .localCheckpoint(eager=True)
    )
    stages["prefix_build"] = time.time() - t0

    t0 = time.time()
    idx = (
        ranked.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= cap)
        .select(
            F.col("doc_id").alias("doc_b"), "tok",
            F.col("p").alias("pb"), F.col("n_toks").alias("n_b"),
        )
        .localCheckpoint(eager=True)
    )
    stages["index_build"] = time.time() - t0

    t0 = time.time()
    grouped = (
        pref.join(idx, "tok")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            & (tden * F.col("n_b") >= tnum * F.col("n_a"))
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.min("pa").alias("fa"), F.min("pb").alias("fb"),
            F.first("n_a").alias("n_a"), F.first("n_b").alias("n_b"),
        )
    )
    need = F.expr(f"({tnum} * n_a + {tden} - 1) div {tden}")
    ub = F.lit(1) + F.least(F.col("n_a") - F.col("fa"), F.col("n_b") - F.col("fb"))
    cands = grouped.filter(ub >= need).select("doc_a", "doc_b").localCheckpoint(eager=True)
    n_cands = cands.count()
    stages["candidate_join"] = time.time() - t0

    t0 = time.time()
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    arrs = (
        toks.join(cand_ids, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("tok").alias("arr"))
    )
    a = arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    b = arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    n_inter = F.size(F.array_intersect("arr_a", "arr_b")).cast("bigint")
    n_pairs = (
        cands.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", F.size("arr_a").cast("bigint").alias("n_a"), n_inter.alias("n_inter"))
        .filter(tden * F.col("n_inter") >= tnum * F.col("n_a"))
        .count()
    )
    stages["verify"] = time.time() - t0

    out = {
        "sf_dir": sf_dir,
        "stages_sec": {k: round(v, 2) for k, v in stages.items()},
        "total_sec": round(sum(stages.values()), 2),
        "n_candidates": n_cands,
        "n_pairs": n_pairs,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
