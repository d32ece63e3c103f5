"""Staged pair-graph invariants (operators/dedup.stage_pair_graph +
queries/llm._staged_pair_graph): the graph trio's shared intermediate must
be staged exactly once per (session, corpus) and must equal the pairs the
self-contained MinHash pipeline produces — otherwise the trio would be fast
but computing over a different graph than the oracles describe.
"""

from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators import dedup as D
from spark_kafka_realm_time_data_pipeline_spark.queries import llm

from conftest import SF_DIR


def test_staged_once_per_session_and_corpus(spark):
    before = dict(llm._PAIR_GRAPH_DIRS)
    df1 = llm._staged_pair_graph(spark, SF_DIR)
    after_first = dict(llm._PAIR_GRAPH_DIRS)
    df2 = llm._staged_pair_graph(spark, SF_DIR)
    after_second = dict(llm._PAIR_GRAPH_DIRS)
    # exactly one new cache entry, and the second call added nothing
    assert len(after_first) >= len(before)
    assert after_second == after_first
    assert df1.count() == df2.count()


def test_staged_pairs_equal_selfcontained_pipeline(spark):
    staged = {
        (r.doc_a, r.doc_b)
        for r in llm._staged_pair_graph(spark, SF_DIR).collect()
    }
    fresh = {
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_dedup(
            D.planted_corpus(spark, SF_DIR),
            threshold=0.8,
            tokenizer=D.doc_shingles,
            tok_hashed=True,
        )
        .select("doc_a", "doc_b")
        .collect()
    }
    assert staged == fresh and staged, "staged graph must match the live pipeline"


def test_trio_reads_staged_graph_without_tokenize(spark):
    """The staged path's plan must be a parquet scan of the edge list —
    no re-tokenization of raw text (the whole point of staging)."""
    df = llm.q_dedup_triangles(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan, "trio plan re-reads raw corpus text"


def test_shingle_arrays_stay_in_sync_with_exploded_shingles(spark):
    """doc_shingle_arrays deliberately duplicates doc_shingles' hash body
    (inlining rationale in doc_shingles' docstring); this pins the two
    implementations value-equal — covering the empty-text and
    shorter-than-n tail positions — so an edit to one cannot silently
    desynchronize the streaming batch-dedup path from every other shingle
    consumer."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, ""),            # empty: single position-1 whole-text shingle
            (3, "abc"),         # shorter than n=5: zero-padded tail
            (4, "aaaaaaaaaa"),  # degenerate repeats: array_distinct path
        ],
        "doc_id long, text string",
    )
    exploded = {
        (r.doc_id, r.tok) for r in D.doc_shingles(docs).collect()
    }
    from_arrays = {
        (r.doc_id, r.tok)
        for r in D.doc_shingle_arrays(docs)
        .select("doc_id", F.explode("arr").alias("tok"))
        .collect()
    }
    assert exploded == from_arrays and len(exploded) > 4
