"""Semantic invariants for the r8 additions — budget-capped mixture
sampling, incremental MV maintenance, FK integrity audit, cosine range
search.  The oracle hash proves engine parity; these pin the meaning
(budget exactness, merge-equals-recompute, verified-candidate soundness)
the hash can't express.
"""

from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators import similarity as S
from spark_kafka_realm_time_data_pipeline_spark.operators import training as TR
from spark_kafka_realm_time_data_pipeline_spark.queries import registry

from conftest import SF_DIR


def _run(spark, name):
    return registry()[name].fn(spark, SF_DIR)


def test_mixture_cap_sample_exact_budget(spark):
    """Every source emits exactly min(n_docs, cap) rows — the output size
    is deterministic, not binomial."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    source_sizes = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total = sum(source_sizes.values())
    cap = (TR.MIX_BUDGET_NUM * total) // (TR.MIX_BUDGET_DEN * len(source_sizes))
    out = _run(spark, "mixture_cap_sample")
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in source_sizes.items():
        assert got.get(src, 0) == min(n, cap), (src, n, cap)


def test_mixture_cap_sample_deterministic(spark):
    a = sorted(tuple(r) for r in _run(spark, "mixture_cap_sample").collect())
    b = sorted(tuple(r) for r in _run(spark, "mixture_cap_sample").collect())
    assert a == b


def test_mv_incremental_equals_full_recompute(spark):
    """The defining property: merging the delta aggregate into the base
    aggregate equals aggregating everything from scratch."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    full = {
        r.o_custkey: (round(r.total, 2), r.n)
        for r in orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    merged = {
        r.o_custkey: (round(r.total_spent, 2), r.n_orders)
        for r in _run(spark, "mv_incremental_update").collect()
    }
    assert merged == full


def test_fk_integrity_clean_corpus_all_zero_orphans(spark):
    rows = _run(spark, "fk_integrity_audit").collect()
    assert len(rows) == 7
    for r in rows:
        assert r.n_rows > 0, r.edge
        assert r.n_orphans == 0 and r.n_orphan_keys == 0, r.edge


def test_fk_integrity_detects_planted_orphan(spark):
    """An audit that can't fail is not an audit: plant two orphan rows
    sharing one bogus FK value and run them through the audit query's own
    counting path (n_orphans / n_orphan_keys per edge)."""
    from spark_kafka_realm_time_data_pipeline_spark.queries.relational import (
        fk_integrity_audit,
    )

    tables = {
        t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        for t in ("orders", "lineitem", "part", "supplier", "customer", "nation", "region")
    }
    bad = tables["orders"].limit(2).withColumn("o_custkey", F.lit(-999_999))
    tables["orders"] = tables["orders"].unionByName(bad)
    rows = {r.edge: r for r in fk_integrity_audit(tables).collect()}
    hit = rows["orders.o_custkey->customer.c_custkey"]
    assert hit.n_orphans == 2 and hit.n_orphan_keys == 1
    # every other edge stays clean
    for edge, r in rows.items():
        if edge != "orders.o_custkey->customer.c_custkey":
            assert r.n_orphans == 0 and r.n_orphan_keys == 0, edge


def test_range_search_sound_and_symmetric_free(spark):
    """Every emitted pair really has cosine >= tau (no false positives),
    ids are ordered (no duplicate symmetric pairs)."""
    out = _run(spark, "sim_range_search").collect()
    assert out, "expected some pairs at the configured tau"
    for r in out:
        assert r.vec_a < r.vec_b
        assert r.cosine >= 0.25


def test_range_search_finds_planted_duplicate(spark):
    """A vector identical to an existing one collides in every LSH bucket
    and has cosine 1.0 — it must be found."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    first = emb.orderBy("vec_id").first()
    planted = spark.createDataFrame(
        [(9_000_001, first.embedding, first.label)], emb.schema
    )
    pairs = S.range_search(emb.unionByName(planted), tau=0.25).collect()
    hit = [r for r in pairs if r.vec_a == first.vec_id and r.vec_b == 9_000_001]
    assert hit and abs(hit[0].cosine - 1.0) < 1e-9
