"""Semantics fixtures for the r12 dedup additions: directed shingle
containment (the asymmetric inclusion Jaccard misses on size-mismatched
pairs) and global passage-level dedup with document reassembly."""

import hashlib

from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators import dedup as D


def test_containment_flags_quote_inclusion_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer one: containment
    (A->B) = 1000 while Jaccard is far below any near-dup threshold — the
    exact pair class the symmetric tiers are blind to."""
    short = "the quick brown fox jumps over the lazy dog tonight"
    long_ = (
        short
        + " and then a very large amount of entirely unrelated trailing"
        + " commentary follows the quotation for many more words"
        + " diluting the union far below any symmetric threshold"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment_milli
        for r in D.containment_pairs(docs).collect()
    }
    assert got.get((1, 2)) == 1000, got
    # the reverse direction is NOT contained (long in short)
    assert (2, 1) not in got
    # and symmetric Jaccard on the same pair is low: |A| / |B| bound
    toks = D.doc_shingles(docs)
    n = {r.doc_id: r.n for r in toks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert n[1] / n[2] < 0.5  # union-based score can't reach 0.9


def test_containment_threshold_excludes_partial_overlap(spark):
    """Two docs sharing only a clause stay below t=0.9 and emit nothing."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma completely different ending here now"),
        ],
        "doc_id long, text string",
    )
    assert D.containment_pairs(docs).count() == 0


def test_keep_containment_policy_on_fixture(spark):
    """Drop policy over the directed pairs: mutual containment (twins)
    keeps the LOWER doc_id; a containment chain keeps only the outermost
    doc; untouched docs survive.  Replays q_dedup_keep_containment's
    drop rule on a hand-built pair list."""
    from pyspark.sql import functions as F

    # (a contained-in b) edges: 1<->2 mutual twins, 3 -> 4 -> 5 chain
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    rev = pairs.select(
        F.col("doc_a").alias("doc_b"), F.col("doc_b").alias("doc_a")
    ).withColumn("mutual", F.lit(1))
    drops = (
        pairs.join(rev, ["doc_a", "doc_b"], "left")
        .filter(F.col("mutual").isNull() | (F.col("doc_b") < F.col("doc_a")))
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    dropped = {r.doc_id for r in drops.collect()}
    # twin 2 drops (1 survives); chain drops 3 and 4 (outermost 5 survives)
    assert dropped == {2, 3, 4}


def test_passage_dedup_keeps_first_and_reassembles(spark):
    """Keep-first by (doc_id, pos) corpus-wide; reassembly md5 is the md5
    of the surviving passages joined in original order."""
    w = [f"w{i}" for i in range(D.PASSAGE_WORDS)]
    p1 = " ".join(w)
    p2 = " ".join(f"x{i}" for i in range(D.PASSAGE_WORDS))
    p3 = " ".join(f"y{i}" for i in range(D.PASSAGE_WORDS))
    docs = spark.createDataFrame(
        [
            (1, f"{p1} {p2}"),      # owns both passages
            (2, f"{p1} {p3}"),      # p1 duplicate -> keeps p3 only
            (3, f"{p1} {p2}"),      # exact copy of doc 1 -> keeps nothing
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in D.passage_dedup(docs).collect()}
    assert (got[1].n_paras, got[1].n_kept) == (2, 2)
    assert (got[2].n_paras, got[2].n_kept) == (2, 1)
    assert (got[3].n_paras, got[3].n_kept) == (2, 0)
    assert got[1].clean_md5 == hashlib.md5(f"{p1} {p2}".encode()).hexdigest()
    assert got[2].clean_md5 == hashlib.md5(p3.encode()).hexdigest()
    # zero survivors reassemble to the empty string, not NULL
    assert got[3].clean_md5 == hashlib.md5(b"").hexdigest()


def test_passage_dedup_ragged_tail_and_short_doc(spark):
    """Docs shorter than one passage form a single ragged passage; the
    ragged tail is its own passage, deduped like any other."""
    tail = "short trailing bit"
    p1 = " ".join(f"w{i}" for i in range(D.PASSAGE_WORDS))
    docs = spark.createDataFrame(
        [(1, tail), (2, f"{p1} {tail}")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in D.passage_dedup(docs).collect()}
    assert (got[1].n_paras, got[1].n_kept) == (1, 1)
    # doc 2's ragged tail duplicates doc 1's whole text -> dropped
    assert (got[2].n_paras, got[2].n_kept) == (2, 1)
    assert got[2].clean_md5 == hashlib.md5(p1.encode()).hexdigest()


def test_containment_vs_base_batch_finds_inclusions_rejects_noise(spark, tmp_path):
    """r16 incremental containment: a delta doc that is a text PREFIX of
    a base doc is flagged at 1000 milli against that doc; an unrelated
    delta doc is not flagged; a delta with ~90%+ overlap lands between.
    Exercises the staged index end-to-end (stage -> probe -> verify)."""
    base_texts = {
        10: "the quick brown fox jumps over the lazy dog again and again",
        11: "entirely different content about spark physical plans and shuffles",
        12: "numbers one two three four five six seven eight nine ten eleven",
    }
    base = spark.createDataFrame(
        list(base_texts.items()), "doc_id long, text string"
    )
    idx = str(tmp_path / "cidx")
    D.stage_containment_index(base, idx)
    delta = spark.createDataFrame(
        [
            (100, base_texts[10][: 2 * len(base_texts[10]) // 3]),  # prefix
            (101, "completely unrelated delta text about nothing here"),
            (102, base_texts[12]),  # exact copy: contained at 1000
        ],
        "doc_id long, text string",
    )
    got = {
        (r.delta_id, r.base_id): r
        for r in D.containment_vs_base_batch(spark, idx, delta).collect()
    }
    assert (100, 10) in got and got[(100, 10)].containment_milli == 1000
    assert (102, 12) in got and got[(102, 12)].containment_milli == 1000
    assert not any(d == 101 for d, _b in got)
    # directedness: n_a is the DELTA's shingle count, the denominator
    assert got[(100, 10)].n_a < got[(100, 10)].n_b
