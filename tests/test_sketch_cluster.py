"""Semantic properties for the round-7 operators — k-means clustering,
Bloom-filter join pruning, sliding-window HLL merge, bigram coverage.

The oracle hash (tools/check.py / driver) is the primary gate; these assert
what the hash can't see: cluster recovery on a planted mixture, the Bloom
filter's no-false-negative guarantee, the window merge's equality with a
brute-force register max, and coverage bounds."""

from pyspark.sql import functions as F

from conftest import SF_DIR
from spark_kafka_realm_time_data_pipeline_spark.operators import curation as C
from spark_kafka_realm_time_data_pipeline_spark.operators import text as T
from spark_kafka_realm_time_data_pipeline_spark.queries import registry
from spark_kafka_realm_time_data_pipeline_spark.sources.files import load_table


def test_kmeans_recovers_planted_separated_clusters(spark):
    """Two planted clusters at opposite corners of the space: after the
    fixed iteration count every vector must sit with its planted side and
    the two centroid L1 masses must be far apart."""
    rows = []
    for i in range(40):
        base = 10.0 if i % 2 == 0 else -10.0
        rows.append((i, [base + 0.01 * i for _ in range(4)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = C.kmeans_embeddings(emb, k=2, iters=3).collect()
    assert len(out) == 2
    sizes = sorted(r.n_vectors for r in out)
    assert sizes == [20, 20], out
    l1s = sorted(r.centroid_l1 for r in out)
    # both centroids near |10| * scale * dim, far from zero
    assert l1s[0] > 4 * 9 * C.KM_SCALE, out


def test_kmeans_partition_is_total(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = C.kmeans_embeddings(emb).collect()
    assert sum(r.n_vectors for r in out) == emb.count()
    assert all(r.inertia_q >= 0 for r in out)


def test_bloom_filter_has_no_false_negatives(spark):
    """Every urgent orderkey that appears in lineitem MUST be a candidate:
    n_true_matches == |urgent ∩ probe| exactly (Bloom filters only err on
    the positive side)."""
    row = registry()["bloom_prune_join"].fn(spark, SF_DIR).collect()[0]
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("key")
    )
    expected_true = (
        li.select(F.col("l_orderkey").alias("key")).distinct().join(urgent, "key").count()
    )
    assert row.n_true_matches == expected_true
    assert row.n_candidates >= row.n_true_matches
    assert row.n_false_pos == row.n_candidates - row.n_true_matches
    assert 0 < row.n_bits_set <= 4 * urgent.count()


def test_hll_window_merge_matches_bruteforce_daily_max(spark):
    """register_sum for each day must equal the brute-force max-merge of
    the trailing 7 days' daily registers, recomputed in plain Python from
    the (tiny) daily register table."""
    ev = load_table(spark, SF_DIR, "events")
    out = {r.day_num: r for r in T.hll_window_merge(ev).collect()}

    from spark_kafka_realm_time_data_pipeline_spark.operators.dedup import SHINGLE_P

    n_buckets = 1 << T.HLL_P
    daily_rows = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
            F.pmod(F.col("user_id").cast("long") * T.HLL_USER_MULT, F.lit(SHINGLE_P)).alias("wk"),
        )
        .select(
            "day_num",
            (F.col("wk") % n_buckets).alias("bucket"),
            F.expr(f"wk div {n_buckets}").alias("w"),
        )
        .collect()
    )
    daily: dict[tuple[int, int], int] = {}
    for r in daily_rows:
        rank = (T.HLL_SUFFIX_BITS + 1) if r.w == 0 else (
            T.HLL_SUFFIX_BITS + 1 - len(bin(r.w)) + 2  # bin() has '0b' prefix
        )
        k = (r.day_num, r.bucket)
        daily[k] = max(daily.get(k, 0), rank)
    days = sorted({d for d, _ in daily})
    for day in days:
        regs: dict[int, int] = {}
        for (d, b), rank in daily.items():
            if day - (T.HLL_WIN_DAYS - 1) <= d <= day:
                regs[b] = max(regs.get(b, 0), rank)
        assert out[day].n_active_buckets == len(regs), day
        assert out[day].register_sum == sum(regs.values()), day


def test_bigram_coverage_bounds_and_totals(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = C.lm_bigram_coverage(docs)
    bad = out.filter(
        (F.col("n_covered") > F.col("n_bigrams"))
        | (F.col("coverage_pct") < 0)
        | (F.col("coverage_pct") > 1)
    )
    assert bad.count() == 0
    # total bigram occurrences = sum over docs of max(words-1, 0)
    expected = (
        docs.select(
            F.greatest(F.size(F.split("text", " ")) - 1, F.lit(0)).alias("nb")
        )
        .agg(F.sum("nb"))
        .collect()[0][0]
    )
    got = out.agg(F.sum("n_bigrams")).collect()[0][0]
    assert got == expected


def test_substring_spans_cover_planted_exact_copies(spark):
    """An exact doc copy repeats EVERY window, so both the copy and its
    original must be reported with near-total duplicated fraction (the
    stride can only miss the final <16 chars)."""
    from spark_kafka_realm_time_data_pipeline_spark.operators import dedup as D

    corpus = D.planted_corpus(spark, SF_DIR)
    out = {r.doc_id: r for r in D.substring_dup_spans(corpus).collect()}
    copies = (
        corpus.filter(
            (F.col("doc_id") >= 1000000)
            & (F.col("doc_id") < 2000000)
            & (F.length("text") >= D.SPAN_WIN)
        )
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    )
    assert copies, "fixture must plant exact copies"
    for r in copies:
        rep = out.get(r.doc_id)
        assert rep is not None, r.doc_id
        assert rep.dup_chars >= r.n - (D.SPAN_STRIDE - 1) - (D.SPAN_WIN - 1), r
        orig = out.get(r.doc_id - 1000000)
        assert orig is not None and orig.dup_frac > 0.5, r.doc_id


def test_pq_codebook_members_have_zero_distortion(spark):
    """Vectors that ARE codewords must encode to themselves: zero
    reconstruction error and pq_key == sum(own_id << 4j)."""
    from spark_kafka_realm_time_data_pipeline_spark.operators import similarity as S

    emb = load_table(spark, SF_DIR, "embeddings")
    out = {r.vec_id: r for r in S.pq_codes(emb).collect()}
    assert len(out) == emb.count()
    expected_self_key = sum(1 << (4 * j) for j in range(S.PQ_SUBS))
    for vid in range(S.PQ_CODES):
        assert out[vid].recon_err_q == 0, vid
        assert out[vid].pq_key == vid * expected_self_key, vid
    assert all(r.recon_err_q >= 0 for r in out.values())


def test_pagerank_ranks_hub_above_leaves(spark):
    """On a star graph the hub receives mass from every leaf and must
    out-rank all of them; total rank stays near n * SCALE (no mass
    creation)."""
    from spark_kafka_realm_time_data_pipeline_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r for r in D.dup_pagerank(pairs).collect()}
    hub, leaves = out[0], [out[i] for i in range(1, 9)]
    assert hub.out_deg == 8 and all(l.out_deg == 1 for l in leaves)
    assert all(hub.rank_q > l.rank_q for l in leaves)
    total = sum(r.rank_q for r in out.values())
    assert total <= 9 * D.PR_SCALE  # floor divisions only ever lose mass
    assert total > 8 * D.PR_SCALE


def test_bpe_merge_steps_learns_predictable_merges(spark):
    """Hand corpus 'aaab' x3: merge 1 must be (a,a) weight 6, merge 2 the
    lexicographic tie-winner (a,b) weight 3, merge 3 (aa,ab) weight 3."""
    docs = spark.createDataFrame(
        [(0, "aaab aaab"), (1, "aaab")], "doc_id long, text string"
    )
    out = [(r.step, r.lhs, r.rhs, r.pair_count) for r in C.bpe_merge_steps(docs).collect()]
    assert sorted(out) == [(1, "a", "a", 6), (2, "a", "b", 3), (3, "aa", "ab", 3)], out


def test_quantile_sketch_is_mergeable(spark):
    """The defining sketch property: cell tables from disjoint shards,
    merged by summing counts, give the same quantile edges as one pass
    over the whole corpus."""
    from pyspark.sql import functions as F

    from spark_kafka_realm_time_data_pipeline_spark.operators.text import (
        quantile_sketch_merge,
    )

    rows = [(i, "s%d" % (i % 2), 10 * i) for i in range(1, 201)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    whole = {
        (r.source, r.n_docs, r.p50_hi, r.p90_hi, r.p99_hi)
        for r in quantile_sketch_merge(docs).collect()
    }
    # shard on doc parity, sketch each shard, merge cells, re-derive edges
    shard_a = docs.filter(F.col("doc_id") % 2 == 0)
    shard_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = {
        (r.source, r.n_docs, r.p50_hi, r.p90_hi, r.p99_hi)
        for r in quantile_sketch_merge(shard_a.unionAll(shard_b)).collect()
    }
    assert whole == merged


def test_approx_distinct_hll_error_is_bounded(spark):
    """The registry entry's accuracy claim (r19: now also hash-checked via
    the bounds oracle): the RAW HLL++ estimate at default rsd=0.05 must
    sit within 3x the claimed standard error (15% relative) of the exact
    count — a tighter pin than the registered query's own 25% gate — and
    the registered query's exact counts and booleans must agree."""
    rows = {
        r.event_type: r
        for r in registry()["approx_distinct"].fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    raw = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.approx_count_distinct("event_id").alias("approx_events"),
            F.count_distinct("user_id").alias("users"),
            F.count_distinct("event_id").alias("events"),
        )
        .collect()
    }
    assert rows.keys() == raw.keys() and rows
    for et, got in rows.items():
        e = raw[et]
        assert (got.n_users, got.n_events) == (e.users, e.events), (et, got, e)
        assert got.approx_users_within_rsd and got.approx_events_within_rsd, got
        assert abs(e.approx_users - e.users) <= max(0.15 * e.users, 1), (et, e)
        assert abs(e.approx_events - e.events) <= max(0.15 * e.events, 1), (et, e)


def test_column_profile_approx_matches_exact_tier(spark):
    """The scale-tier profile must agree with the exact tier on every
    exact column (nulls/min/max) and bound the HLL++ distinct estimate
    within 15% relative error per column."""
    reg = registry()
    approx = {r.col_name: r for r in reg["column_profile_approx"].fn(spark, SF_DIR).collect()}
    exact = {r.col_name: r for r in reg["column_profile"].fn(spark, SF_DIR).collect()}
    assert approx.keys() == exact.keys() and approx
    for col, a in approx.items():
        e = exact[col]
        assert (a.n_nulls, a.min_val, a.max_val) == (e.n_nulls, e.min_val, e.max_val)
        assert abs(a.n_distinct_approx - e.n_distinct) <= max(0.15 * e.n_distinct, 1), (
            col, a, e,
        )
