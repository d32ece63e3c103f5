"""Property tests for the round-4 curation operators (operators/curation.py).

The oracle hash (tools/check.py / driver) is the primary gate; these assert
the *semantic* properties the hash can't see: partition totals, flag
consistency, split coverage, cluster structure on the planted corpus."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from conftest import SF_DIR
from spark_kafka_realm_time_data_pipeline_spark.operators import curation as C
from spark_kafka_realm_time_data_pipeline_spark.operators import dedup as D
from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table


def test_domain_mix_weights_shares_sum_to_one(spark):
    res = C.domain_mix_weights(load_table(spark, SF_DIR, "documents")).collect()
    assert abs(sum(r.token_share for r in res) - 1.0) < 1e-9
    # weight * share == uniform share for every source
    n = len(res)
    for r in res:
        assert abs(r.mix_weight * r.token_share - 1.0 / n) < 1e-9


def test_curriculum_buckets_cover_all_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    res = C.curriculum_buckets(docs).collect()
    assert sum(r.n_docs for r in res) == docs.count()
    # stages are contiguous non-overlapping length ranges per language
    by_lang: dict[str, list] = {}
    for r in res:
        by_lang.setdefault(r.lang, []).append(r)
    for rows in by_lang.values():
        rows.sort(key=lambda r: r.stage)
        for lo, hi in zip(rows, rows[1:]):
            assert lo.max_chars <= hi.min_chars


def test_quality_filter_keep_is_conjunction(spark):
    res = C.quality_filter_pipeline(load_table(spark, SF_DIR, "documents"))
    bad = res.filter(
        F.col("keep")
        != (
            F.col("pass_length")
            & F.col("pass_words")
            & F.col("pass_word_len")
            & F.col("pass_stopwords")
            & F.col("pass_distinct")
        )
    )
    assert bad.count() == 0


def test_token_budget_split_is_total_and_ordered(spark):
    docs = load_table(spark, SF_DIR, "documents")
    res = C.token_budget_split(docs)
    assert res.count() == docs.count()
    # within each source, train docs all precede val docs precede test docs
    order = F.when(F.col("split") == "train", 0).when(F.col("split") == "val", 1).otherwise(2)
    lagged = res.withColumn("o", order).withColumn(
        "prev_o", F.lag("o").over(Window.partitionBy("source").orderBy("doc_id"))
    )
    assert lagged.filter(F.col("prev_o") > F.col("o")).count() == 0
    # train gets the lion's share of tokens per source
    per = res.groupBy("source").pivot("split", ["train", "val", "test"]).sum("n_tokens")
    for r in per.collect():
        total = (r.train or 0) + (r.val or 0) + (r.test or 0)
        assert (r.train or 0) >= 0.7 * total


def test_window_dedup_rank_clusters_planted_copies(spark):
    corpus = D.planted_corpus(spark, SF_DIR)
    res = C.window_dedup_rank(corpus)
    # every cluster has exactly one rank-1 member
    per = res.groupBy("cluster_key").agg(
        F.sum((F.col("rank") == 1).cast("int")).alias("n_best"),
        F.max("n_members").alias("n_members"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    assert per.filter(F.col("n_best") != 1).count() == 0
    assert per.filter(F.col("n_members") != F.col("n_rows")).count() == 0
    # planted exact copies (doc_id+1000000) must land in their original's cluster
    pairs = res.alias("a").join(
        res.alias("b"), F.col("a.doc_id") + 1000000 == F.col("b.doc_id")
    )
    mismatched = pairs.filter(F.col("a.cluster_key") != F.col("b.cluster_key"))
    assert mismatched.count() == 0


def test_contamination_overlap_planted_positive(spark):
    res = C.contamination_overlap(D.planted_corpus(spark, SF_DIR)).collect()
    assert len(res) > 0
    for r in res:
        assert 0 <= r.n_hit_grams <= r.n_grams
        assert 0.0 <= r.contaminated_frac <= 1.0
    # planted copies of bench docs (doc_id%97==0 and %10==0 -> doc 0 copied)
    # guarantee at least one contaminated benchmark doc
    assert any(r.n_hit_grams > 0 for r in res)


def test_ivf_centroid_counts(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    res = C.ivf_centroid_stats(emb).collect()
    assert sum(r.n_vectors for r in res) == emb.count()
    for r in res:
        assert r.centroid_norm >= 0.0


def test_normalize_embeddings_unit_bounds(spark):
    res = C.normalize_embeddings(load_table(spark, SF_DIR, "embeddings"))
    bad = res.filter(
        (F.col("l2_norm") > 0)
        & ((F.col("unit_min") < -1.0000001) | (F.col("unit_max") > 1.0000001))
    )
    assert bad.count() == 0


def test_url_host_dedup_partitions_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    res = C.url_host_dedup(docs).collect()
    assert sum(r.n_dupes for r in res) == docs.count()
    for r in res:
        assert 1 <= r.n_raw_variants <= r.n_dupes


def test_chunk_overlap_covers_every_token(spark):
    docs = load_table(spark, SF_DIR, "documents")
    res = C.chunk_documents(docs)
    # chunk lengths are positive and capped; last chunk ends exactly at doc end
    assert res.filter((F.col("chunk_len") <= 0) | (F.col("chunk_len") > C.CHUNK_TOKENS)).count() == 0
    last = res.groupBy("doc_id").agg(
        F.max("chunk_start").alias("last_start"),
        F.max(F.col("chunk_start") + F.col("chunk_len")).alias("cover_end"),
    )
    toks = docs.select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n"))
    joined = last.join(toks, "doc_id")
    assert joined.filter(F.col("cover_end") != F.col("n")).count() == 0
    # consecutive chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens
    assert C.CHUNK_STRIDE < C.CHUNK_TOKENS


def test_semdedup_rep_is_cluster_member(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    res = C.semdedup_representatives(emb)
    # one representative per cluster, and it belongs to that cluster
    assert res.count() == emb.select("label").distinct().count()
    bad = res.join(
        emb.select(F.col("vec_id").alias("rep_vec_id"), F.col("label").alias("cluster")),
        ["rep_vec_id", "cluster"],
        "left_anti",
    )
    assert bad.count() == 0
    # cosine to own-cluster centroid is high for the representative
    assert res.filter(F.col("centroid_cos") < 0).count() == 0


def test_vocab_coverage_bounds(spark):
    res = C.vocab_coverage(load_table(spark, SF_DIR, "documents"))
    assert res.filter((F.col("oov_ratio") < 0) | (F.col("oov_ratio") > 1)).count() == 0
    assert res.filter(F.col("n_oov") > F.col("n_tokens")).count() == 0


def test_bpe_pairs_are_two_chars(spark):
    res = C.bpe_pair_counts(load_table(spark, SF_DIR, "documents"))
    assert res.filter(F.length("pair") != 2).count() == 0
    assert res.filter(F.col("n") < C.BPE_MIN_COUNT).count() == 0


def test_curation_pipeline_funnel_adds_up(spark):
    from spark_kafka_realm_time_data_pipeline_spark.queries.curation import (
        q_curation_pipeline_e2e,
    )

    res = q_curation_pipeline_e2e(spark, SF_DIR).collect()
    assert len(res) > 0
    total_dups = 0
    for r in res:
        assert r.n_input == r.n_dup_dropped + r.n_quality_dropped + r.n_kept
        total_dups += r.n_dup_dropped
    # the planted exact copies must be caught by the normalize+hash dedup
    assert total_dups > 0


def test_dup_components_hand_graph(spark):
    """Min-label propagation on a hand-built graph: chain a-b-c collapses
    to one component labeled by its min node; disjoint pair keeps its own;
    every node of a component gets the same id."""
    from pyspark.sql import functions as SF

    from spark_kafka_realm_time_data_pipeline_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (40, 50)], ["doc_a", "doc_b"]
    )
    got = {
        r.doc_id: r.component_id
        for r in dup_components(pairs).collect()
    }
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_bpe_encode_compression_invariants(spark):
    """Every merge can only shrink a doc's symbol sequence, so the encoded
    count is bounded by the base symbol count, strictly below it whenever
    the learned pair occurs, and never below the word count (a word is at
    least one symbol)."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.curation import (
        bpe_encode,
    )

    rows = [
        (1, "the theme thesis there"),
        (2, "aa bb cc dd"),
        (3, "x"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bpe_encode(docs).collect()}
    for r in out.values():
        assert r["n_bpe_tokens"] <= r["n_base_syms"], r
        assert r["n_bpe_tokens"] >= r["n_words"], r
    # 'th'/'the'-family merges dominate this vocabulary: doc 1 must compress
    assert out[1]["n_bpe_tokens"] < out[1]["n_base_syms"], out[1]
    # single-char doc: nothing to merge
    assert out[3]["n_bpe_tokens"] == 1 and out[3]["n_base_syms"] == 1, out[3]


def test_bpe_ops_tolerate_empty_and_degenerate_corpora(spark):
    """Library robustness: an empty corpus (or one with no adjacent symbol
    pairs) must end BPE training cleanly instead of crashing on the argmax
    — and encoding must pass such docs through unchanged."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.curation import (
        bpe_encode,
        bpe_merge_steps,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_merge_steps(empty).collect() == []
    assert bpe_encode(empty).collect() == []
    # single-char words: no adjacent pairs anywhere -> zero merges learned
    degenerate = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert bpe_merge_steps(degenerate).collect() == []
    out = bpe_encode(degenerate).collect()[0]
    assert out["n_bpe_tokens"] == 3 == out["n_base_syms"], out


def test_lm_perplexity_filter_scores_every_multiword_doc(spark):
    """Every doc with >= 2 words gets a score; the milli-bit average is
    exactly the integer identity of its parts; and the fixed threshold
    actually splits the corpus (both verdicts occur)."""
    docs = load_table(spark, SF_DIR, "documents")
    out = C.lm_perplexity_filter(docs).collect()
    n_multi = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    assert len(out) == n_multi
    assert {r["keep"] for r in out} == {True, False}
    for r in out:
        assert r["avg_milli_bits"] == (1000 * r["total_bits"]) // r["n_bigrams"]
        assert r["keep"] == (r["avg_milli_bits"] <= C.PPL_KEEP_MILLI_BITS)


def test_pii_redact_v2_masks_planted_pii(spark):
    """Planted-PII proof for the broadened scrub: literal emails, phone
    formats, IPv4s, and bare id runs must each be replaced by their typed
    placeholder (in the fixed EMAIL -> IP -> PHONE -> ID order), counts
    must match what was planted, and PII-free text must pass through
    unchanged."""
    from pyspark.sql import functions as SF

    from spark_kafka_realm_time_data_pipeline_spark.operators.text import (
        pii_redact_v2,
    )

    rows = [
        (1, "reach john.doe+x@mail.example.org or 25-989-741-2988 now"),
        (2, "login from 192.168.0.1 with id 12345 and 172.16.254.3"),
        (3, "no pii here, just words"),
        (4, "a@b.io 10-123-456-7890 1.2.3.4 987654321"),
        # 3-group NANP form (r12 broadened pattern) + unseparated 10-digit
        # run, which deliberately types as <ID> (no separator signal)
        (5, "call 555-123-4567 or 5551234567"),
    ]
    df = spark.createDataFrame(rows, ["k", "txt"])
    got = {
        r["k"]: r.asDict() for r in pii_redact_v2(df, "txt", "k").collect()
    }
    assert got[1]["redacted"] == "reach <EMAIL> or <PHONE> now"
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (1, 1, 0)
    assert got[2]["redacted"] == "login from <IP> with id <ID> and <IP>"
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (0, 0, 2)
    assert got[3]["redacted"] == "no pii here, just words"
    assert (got[3]["n_emails"], got[3]["n_phones"], got[3]["n_ips"]) == (0, 0, 0)
    assert got[3]["digits_seen"] == 0
    assert got[4]["redacted"] == "<EMAIL> <PHONE> <IP> <ID>"
    assert (got[4]["n_emails"], got[4]["n_phones"], got[4]["n_ips"]) == (1, 1, 1)
    assert got[5]["redacted"] == "call <PHONE> or <ID>"
    assert (got[5]["n_emails"], got[5]["n_phones"], got[5]["n_ips"]) == (0, 1, 0)
    # pseudonym is stable and derived from the ORIGINAL text
    again = {
        r["k"]: r["pseudo_id"] for r in pii_redact_v2(df, "txt", "k").collect()
    }
    assert all(again[k] == got[k]["pseudo_id"] for k in again)
