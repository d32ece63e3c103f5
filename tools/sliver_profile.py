"""Semi-filter A/B proof on a SLIVER-shaped candidate corpus (VERDICT r14 #5).

The r14 verify-stage semi-filter (operators/dedup.py: jaccard_verify_arrays
and containment_pairs both semi-join the token frame to candidate
participants before collect_set) was measured ~neutral on the planted
corpus, because there the containment candidate set touches MOST docs
(~1M pairs over 50k docs at sf0.1).  PLANS.md honestly records that the
claimed win is asymptotic: on a real corpus, candidates are a sliver of
the corpus and the full-corpus array build is pure waste.  This tool
proves (or refutes) that claim directly:

- corpus: the sf1 documents table with every word tagged by a doc-unique
  base-36 suffix, then contained copies planted for doc_id % plant_mod
  == 0 only.  The tagging makes cross-doc 5-gram shingle sharing rare
  (only shingles fully inside long original words survive across docs),
  which is the realistic-corpus property the synthetic table lacks — its
  small shared vocabulary makes 60%+ of docs containment candidates of
  each other ORGANICALLY (measured: plant_mod=200 at sf0.1 still yields
  candidate_doc_fraction 0.61), which is exactly the degenerate shape
  the r14 caveat was about.  Each planted copy is a character PREFIX of
  its source's TAGGED text (tags included, like a real verbatim
  inclusion), so its shingle set is a strict subset of the source's and
  directed containment(copy ⊂ source) = 1.0;
- funnel: the exact containment_pairs stages (df rank -> prefix probe ->
  capped index -> candidate join -> positional prune), checkpointed so
  the verify stage is isolated;
- A/B: the verify stage (collect_set array build + pair join +
  array_intersect) is timed twice per variant — WITH the candidate-id
  semi-filter (shipped code shape) and WITHOUT it (pre-r14 shape,
  full-corpus collect_set) — and the surviving pair counts are asserted
  identical (the filter is value-neutral by construction; this check
  makes the A/B itself prove it).

Usage: python tools/sliver_profile.py [sf_dir] [plant_mod]
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
    plant_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark()
    tnum, tden, cap = 9, 10, D.PREFIX_CAP

    raw = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # per-doc word tagging: suffix every word with the doc's base-36 id so
    # unrelated docs share almost no character 5-grams (a shingle crossing
    # a word boundary always contains the doc-unique tag).  This gives the
    # corpus the sliver-candidate shape of real web-scale text; the
    # planted verbatim inclusions below keep their source's tags, exactly
    # like a real quoted passage.
    tag = F.conv(F.col("doc_id").cast("string"), 10, 36)
    base = raw.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split("text", " "), lambda w: F.concat(w, F.lit("x"), tag)
            ),
            " ",
        ).alias("text"),
    )
    # contained copy = character prefix (>= 40% of the text, >= 25 chars):
    # every 5-gram shingle of the copy appears in the source, so the
    # directed containment of copy-in-source is exactly 1.0 >= 9/10.
    planted = base.filter(F.col("doc_id") % plant_mod == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.substring(
            "text",
            1,
            F.greatest(
                (F.length("text") * 2 / 5).cast("int"), F.lit(25)
            ),
        ).alias("text"),
    )
    corpus = base.unionByName(planted)
    n_docs = corpus.count()
    n_planted = planted.count()

    # --- funnel up to candidates (containment_pairs stages, barriered) ---
    toks = D.doc_shingles(D.fan_out(corpus)).localCheckpoint(eager=True)
    df = toks.groupBy("tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = (
        toks.join(df, "tok")
        .withColumn("p", F.row_number().over(w))
        .withColumn("n_toks", F.count("*").over(Window.partitionBy("doc_id")))
        .localCheckpoint(eager=True)
    )
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
            F.col("doc_id").alias("doc_a"),
            "tok",
            F.col("p").alias("pa"),
            F.col("n_toks").alias("n_a"),
        )
        .localCheckpoint(eager=True)
    )
    idx = (
        ranked.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= cap)
        .select(
            F.col("doc_id").alias("doc_b"),
            "tok",
            F.col("p").alias("pb"),
            F.col("n_toks").alias("n_b"),
        )
        .localCheckpoint(eager=True)
    )
    grouped = (
        pref.join(idx, "tok")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            & (tden * F.col("n_b") >= tnum * F.col("n_a"))
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.min("pa").alias("fa"),
            F.min("pb").alias("fb"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    need = F.expr(f"({tnum} * n_a + {tden} - 1) div {tden}")
    ub = F.lit(1) + F.least(F.col("n_a") - F.col("fa"), F.col("n_b") - F.col("fb"))
    cands = (
        grouped.filter(ub >= need)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_cands = cands.count()
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cand_docs = cand_ids.count()

    def verify(semi_filter: bool) -> tuple[float, int]:
        t0 = time.time()
        src = toks.join(cand_ids, "doc_id", "left_semi") if semi_filter else toks
        arrs = src.groupBy("doc_id").agg(F.collect_set("tok").alias("arr"))
        a = arrs.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
        b = arrs.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
        n_inter = F.size(F.array_intersect("arr_a", "arr_b")).cast("bigint")
        n = (
            cands.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.size("arr_a").cast("bigint").alias("n_a"),
                n_inter.alias("n_inter"),
            )
            .filter(tden * F.col("n_inter") >= tnum * F.col("n_a"))
            .count()
        )
        return time.time() - t0, n

    # interleave A/B/A/B so box drift hits both variants equally
    runs: dict[str, list[float]] = {"with_semi_filter": [], "without": []}
    counts: set[int] = set()
    for _ in range(2):
        dt, n = verify(semi_filter=True)
        runs["with_semi_filter"].append(round(dt, 2))
        counts.add(n)
        dt, n = verify(semi_filter=False)
        runs["without"].append(round(dt, 2))
        counts.add(n)
    assert len(counts) == 1, f"variants disagree on pair count: {counts}"

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_planted": n_planted,
        "n_candidates": n_cands,
        "n_candidate_docs": n_cand_docs,
        "candidate_doc_fraction": round(n_cand_docs / n_docs, 4),
        "n_verified_pairs": counts.pop(),
        "verify_sec": runs,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
