"""IVF-ANN recall guarantees (the claim queries/llm.py makes for
sim_ivf_topk, which is rows-only in the driver's oracle check).

The synthetic embeddings are isotropic noise with random labels (verified:
within-label and across-label mean cosine are both ~0), so the honest IVF
guarantee on this corpus is statistical: expected recall ~= n_probe /
n_lists for arbitrary queries, and ~1.0 for the near-duplicate case (a
query's near-copy shares its list, and the query's own list is always
probed).  Both are asserted.
"""

import pytest
from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table

from conftest import SF_DIR

K = 5
N_PROBE = 3


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_ivf_statistical_recall_floor(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=K).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, queries, k=K, n_probe=N_PROBE).collect()}
    n_lists = emb.select("label").distinct().count()
    recall = len(bf & ivf) / len(bf)
    # expected n_probe/n_lists on isotropic data; allow statistical slack
    assert recall >= 0.6 * (N_PROBE / n_lists), recall


def test_ivf_finds_planted_near_duplicates(spark, emb):
    """The LLM-pipeline case IVF exists for: a near-identical vector must be
    retrieved at rank 1 with cosine ~1 for every query."""
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
        )
    )
    queries = emb.filter(F.col("vec_id") < 10)
    top1 = {
        r.query_id: (r.neighbor_id, r.cosine)
        for r in ivf_topk(planted, queries, k=1, n_probe=N_PROBE).collect()
    }
    assert set(top1) == set(range(10))
    for qid, (nid, cos) in top1.items():
        assert nid == qid + 100000, (qid, nid)
        assert cos > 0.9999, (qid, cos)


def test_lsh_finds_planted_near_duplicates(spark, emb):
    """Random-hyperplane LSH: an exact copy lands in the same bucket by
    construction, so it must be retrieved at rank 1 with cosine ~1."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import lsh_topk

    planted = emb.unionByName(
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
        )
    )
    queries = emb.filter(F.col("vec_id") < 10)
    top1 = {
        r.query_id: (r.neighbor_id, r.cosine)
        for r in lsh_topk(planted, queries, k=1).collect()
    }
    assert set(top1) == set(range(10))
    for qid, (nid, cos) in top1.items():
        assert nid == qid + 100000, (qid, nid)
        assert cos > 0.9999, (qid, cos)


def test_brute_force_matches_oracle_ranking(spark, emb):
    """brute_force_topk is the exact baseline: for one query, its top-k by
    direct cosine computation matches."""
    import numpy as np

    rows = emb.collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=float) for r in rows}
    q = vecs[0]
    scored = sorted(
        (
            (float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v))), vid)
            for vid, v in vecs.items()
            if vid != 0
        ),
        key=lambda t: (-t[0], t[1]),
    )[:K]
    expected = [vid for _c, vid in scored]
    queries = emb.filter(F.col("vec_id") == 0)
    got = [
        r.neighbor_id
        for r in brute_force_topk(emb, queries, k=K).orderBy("rank").collect()
    ]
    assert got == expected


def test_pq_adc_ranks_exact_copy_first(spark, emb):
    """ADC sanity: a query's exact vector copy encodes to the same PQ code
    word in every subspace, so its asymmetric distance equals the query's
    own quantization distortion — the minimum possible — and the copy must
    rank first.  Also pins the scan's determinism (integer distances,
    (adist, vec_id) tie-break): two runs give identical rows."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import (
        pq_topk,
    )

    base = emb.limit(200)
    copies = base.filter(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = base.unionByName(copies)
    queries = corpus.filter(F.col("vec_id") < 3)
    out = pq_topk(corpus, queries, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in (0, 1, 2):
        top = sorted(by_q[qid])[0]
        assert top[1] == qid + 100000, (qid, by_q[qid])
    out2 = pq_topk(corpus, queries, k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_staged_ivf_matches_inline_ivf(spark, emb, tmp_path):
    """r16 incremental ANN: probing the staged cluster-partitioned index
    (stage_ivf_index -> ann_vs_base_batch) is value-identical to the
    inline ivf_topk over the same frames — the property that lets the
    incremental/streaming pair share the batch IVF oracle."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import (
        ann_vs_base_batch,
        stage_ivf_index,
    )

    base = emb.limit(200)
    queries = base.filter(F.col("vec_id") < 8)
    idx = str(tmp_path / "ividx")
    stage_ivf_index(base, idx)
    staged = sorted(
        map(tuple, ann_vs_base_batch(spark, idx, queries, k=K, n_probe=N_PROBE).collect())
    )
    inline = sorted(map(tuple, ivf_topk(base, queries, k=K, n_probe=N_PROBE).collect()))
    assert staged == inline and len(staged) > 0


def test_staged_ivf_probe_uses_dynamic_partition_pruning(spark, emb, tmp_path):
    """The staged vector table is partitioned by cluster, and the probe
    equi-join must reach it through DYNAMIC PARTITION PRUNING — the scan
    reads only the probed clusters' files, which is the whole point of
    an inverted file at corpus scale.  Pins the plan property, not just
    the result."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import (
        ann_vs_base_batch,
        stage_ivf_index,
    )

    idx = str(tmp_path / "ividx_dpp")
    stage_ivf_index(emb, idx)
    df = ann_vs_base_batch(spark, idx, emb.filter(F.col("vec_id") < 4))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_incremental_range_gate_flags_copies_never_noise(spark):
    """r16 near-dup ingest gate: exact copies flag (within IVF probe
    recall — their source's cluster must land in the n_probe set), and
    the shifted-noise arm NEVER flags (zero false positives — the
    property that makes the gate safe to auto-reject on)."""
    from spark_kafka_realm_time_data_pipeline_spark.queries.llm import (
        q_sim_incremental_range,
    )

    from conftest import SF_DIR

    rows = q_sim_incremental_range(spark, SF_DIR).collect()
    near = [r for r in rows if r.query_id >= 2000000]
    noise = [r for r in rows if r.query_id < 2000000]
    assert near and noise
    flagged = sum(1 for r in near if r.is_dup)
    # statistical floor: own-cluster probe recall ~= 1 when ranked, but
    # isotropic centroids make the floor n_probe/n_lists-ish; observed 0.69
    assert flagged / len(near) >= 0.4, (flagged, len(near))
    for r in near:
        if r.is_dup:
            assert r.cosine >= 0.99
    assert not any(r.is_dup for r in noise), "noise arm must never flag"


def test_ivf_growth_rule_thresholds(tmp_path):
    """The staged-IVF n_lists growth rule (VERDICT r16 item 3): registered
    corpora (2000 vectors) keep the label quantizer — their staged index
    and DuckDB oracle must never change — while a 10x corpus grows to
    isqrt(N)//4 discovered k-means lists."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_kafka_realm_time_data_pipeline_spark.queries.llm import (
        _ivf_grown_n_lists,
    )

    assert _ivf_grown_n_lists("/root/testdata/sf0.001") is None
    assert _ivf_grown_n_lists("/root/testdata/sf0.01") is None
    pq.write_table(
        pa.table({"x": pa.array(range(20000))}),
        str(tmp_path / "embeddings.parquet"),
    )
    grown = _ivf_grown_n_lists(str(tmp_path))
    assert grown == math.isqrt(20000) // 4 == 35


def test_ivf_day2_flips_without_merge(spark, emb, tmp_path):
    """r18: day-2 semantics of the vector-index merge.  A novel vector is
    admitted on day 1 (no base neighbor at cosine >= 0.99) and merged
    into the staged IVF index; a day-2 exact copy of it is flagged as a
    dup against the MERGED index (cosine ~1.0 via the appended row) and
    NOT flagged against the un-merged base index — the rejection is
    caused by the merge.  The merge report's read-back arithmetic and
    centroid-assignment invariant are checked on the way."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import (
        ann_vs_base_batch,
        merge_admitted_into_ivf,
        stage_ivf_index,
    )

    bidx = str(tmp_path / "ivf")
    stage_ivf_index(emb, bidx)

    # day-1 batch: one +0.25-shifted novel vector (admitted)
    delta1 = emb.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") + 0.25).alias(
            "embedding"
        ),
    )
    top1 = ann_vs_base_batch(spark, bidx, delta1, k=1)
    assert top1.collect()[0].cosine < 0.99
    admitted = spark.createDataFrame([(1000003,)], "vec_id long")
    ext = str(tmp_path / "ext")
    report = {
        r.cluster: r
        for r in merge_admitted_into_ivf(
            spark, bidx, delta1, admitted, ext
        ).collect()
    }
    assert sum(r.rows_appended for r in report.values()) == 1
    for r in report.values():
        assert r.rows_after == r.rows_before + r.rows_appended

    # merged = base ∪ extension vecs; centroids verbatim
    midx = str(tmp_path / "midx")
    spark.read.parquet(f"{bidx}/centroids").write.parquet(f"{midx}/centroids")
    spark.read.parquet(f"{bidx}/vecs").unionByName(
        spark.read.parquet(f"{ext}/vecs")
    ).write.partitionBy("cluster").parquet(f"{midx}/vecs")

    # day-2: an exact copy of the admitted vector
    delta2 = delta1.select(
        (F.col("vec_id") + 2000000).alias("vec_id"), "embedding"
    )
    merged_hit = ann_vs_base_batch(spark, midx, delta2, k=1).collect()[0]
    assert merged_hit.neighbor_id == 1000003 and merged_hit.cosine >= 0.99

    unmerged_hit = ann_vs_base_batch(spark, bidx, delta2, k=1).collect()[0]
    assert unmerged_hit.cosine < 0.99


def test_centroid_drift_only_on_touched_clusters(spark, emb):
    """r18: the IVF rebuild monitor's defining invariant — a cluster that
    absorbed no admissions recomputes to the same centroid fold
    (cosine ~1.0 within float ulps, not drifted); a cluster that
    absorbed admissions reports the drift.  Uses the registered query's
    own machinery over a controlled merge: one far-off vector assigned
    to its nearest cluster."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import (
        cosine,
        ivf_centroids,
    )

    base = emb.select("vec_id", "embedding", F.col("label").alias("cluster"))
    # one admitted vector: a +2.0-shifted copy of vec 0 (drastic drift)
    add = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") + 2.0).alias(
            "embedding"
        ),
        F.col("label").alias("cluster"),  # pin to its source cluster
    )
    touched = add.collect()[0].cluster
    merged = base.unionByName(add)
    old_c = ivf_centroids(base, "cluster").select(
        "cluster", F.col("centroid").alias("old_c")
    )
    new_c = ivf_centroids(merged, "cluster").select(
        "cluster", F.col("centroid").alias("new_c")
    )
    rows = {
        r.cluster: r.cos
        for r in old_c.join(new_c, "cluster")
        .select("cluster", cosine("old_c", "new_c").alias("cos"))
        .collect()
    }
    assert rows[touched] < 0.9999, rows[touched]
    for cl, cos in rows.items():
        if cl != touched:
            assert abs(cos - 1.0) < 1e-9, (cl, cos)


def test_rebuild_clears_drift_and_keeps_recall(spark):
    """r19 (VERDICT r18 item 3): the re-train the drift monitor schedules,
    actually executed — (a) every cluster reconverges against the merged
    corpus (drifted clusters' cosine returns to ~1.0 vs the rebuilt
    quantizer), and (b) recall on copies of day-1 ADMITTED vectors stays
    1.0 through the rebuilt index (probe routing moved with the new
    centroids, yet every admitted twin is still caught; the never-dup
    control arm still flags nothing)."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.similarity import (
        ann_vs_base_batch,
    )
    from spark_kafka_realm_time_data_pipeline_spark.queries.llm import (
        _ann_delta2,
        q_sim_index_rebuild,
        staged_rebuilt_ivf_index,
    )

    rows = q_sim_index_rebuild(spark, SF_DIR).collect()
    assert rows
    assert any(r.was_drifted for r in rows)  # day-1 merge really drifted cells
    for r in rows:
        # Lloyd fixpoint reached: the stored quantizer IS its own cells'
        # fold, so the monitor's post-rebuild reading is exactly ~1.0
        assert r.reconverged, (r.cluster, r.rebuilt_centroid_cos)
        assert abs(r.rebuilt_centroid_cos - 1.0) < 1e-9, r
        assert r.n_before > 0 and r.n_after > 0, r

    ridx = staged_rebuilt_ivf_index(spark, SF_DIR)
    delta2 = _ann_delta2(load_table(spark, SF_DIR, "embeddings"))
    top1 = ann_vs_base_batch(spark, ridx, delta2, k=1)
    flagged = {r.query_id for r in top1.collect() if r.cosine >= 0.99}
    replay = {r.vec_id for r in delta2.filter("vec_id < 4000000").collect()}
    control = {r.vec_id for r in delta2.filter("vec_id >= 4000000").collect()}
    assert replay, "replay arm must be non-empty"
    missed = replay - flagged
    assert not missed, f"rebuild lost recall on admitted copies: {sorted(missed)[:5]}"
    assert not (control & flagged), "control arm must never flag"


def test_rebuild_acceptance_gate(spark):
    """r19: the registered acceptance gate's pinned semantics — on the
    day-2 batch, the rebuilt index loses NO true dup the exact brute
    force finds (replay arm recall 1.0, missed 0) and the control arm
    flags nothing on either side."""
    from spark_kafka_realm_time_data_pipeline_spark.queries.llm import (
        q_sim_rebuild_recall,
    )

    rows = {r.arm: r for r in q_sim_rebuild_recall(spark, SF_DIR).collect()}
    assert set(rows) == {"replay", "control"}
    rep, ctl = rows["replay"], rows["control"]
    assert rep.n_queries > 0 and rep.bf_dups == rep.n_queries  # all true dups
    assert rep.missed == 0 and rep.recall == 1.0, rep
    assert ctl.bf_dups == 0 and ctl.ann_dups == 0 and ctl.recall == 1.0, ctl
