"""Corpus-curation operators, round 4: the remaining pipeline stages a
100 TB pretraining run needs between raw crawl and tokenized shards —
normalization, domain mixing, curriculum assignment, URL dedup, LM counts,
contamination profiling, quality gating, split assignment, preference-pair
stats, keep-best dedup, plus embedding unit-normalization and IVF centroid
construction on the vector side.

Same engine-portability discipline as operators/training.py: every float is
produced by a deterministic left fold or a single IEEE division, every hash
is md5-derived, and integer arithmetic does the heavy lifting — so each op
has a full DuckDB value oracle that replays the arithmetic bit-for-bit.

Scale notes are per-function.  None of these ops collects to the driver;
the widest intermediate (word n-grams in ``contamination_overlap``) reuses
the hashed-gram-key design from ``ngram_decontaminate`` (one join shuffle,
dedup after the match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .training import (
    BENCH_MOD,
    NGRAM_N,
    ORA_GRAM_KEY_CTES,
    _word_ngrams,
    gram_key_pairs,
)

# --- text normalization ------------------------------------------------------


def _norm_text(col: str = "text") -> Column:
    """Canonical text form: lowercase, strip non-[a-z0-9 ], collapse runs
    of spaces, trim.  The normalization every dedup/quality stage upstream
    agrees on before hashing."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9 ]", ""), " +", " "
        )
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Per-doc normalized form summary: original/normalized lengths and a
    stable md5 content key over the normalized text (the key exact-dedup
    runs on).  Narrow map, zero shuffles — full scan speed at any SF."""
    norm = _norm_text()
    return docs.select(
        "doc_id",
        F.length("text").alias("orig_chars"),
        F.length(norm).alias("norm_chars"),
        F.substring(F.md5(norm.cast("binary")), 1, 16).alias("norm_hash"),
    )


ORA_NORMALIZE_TEXT = """
WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       length(text) AS orig_chars,
       length(norm) AS norm_chars,
       substring(md5(norm), 1, 16) AS norm_hash
FROM n
"""


# --- domain mix weights ------------------------------------------------------


def domain_mix_weights(docs: DataFrame) -> DataFrame:
    """Per-source token share and the resampling weight that would flatten
    the mixture to uniform (weight = uniform_share / actual_share) — the
    core computation behind domain-reweighted pretraining mixes (DoReMi-style
    pipelines start from exactly these statistics).

    Shape: one groupBy(source) with map-side combine (shuffle bounded by
    |sources|, not corpus rows), then unpartitioned windows over the
    |sources|-row aggregate — negligible at any scale."""
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w).cast("double")
    n_src = F.count(F.lit(1)).over(w).cast("double")
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / total).alias("token_share"),
        (total / (n_src * F.col("n_tokens").cast("double"))).alias("mix_weight"),
    )


ORA_DOMAIN_MIX_WEIGHTS = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share,
       CAST(SUM(n_tokens) OVER () AS DOUBLE)
         / (CAST(COUNT(*) OVER () AS DOUBLE) * CAST(n_tokens AS DOUBLE)) AS mix_weight
FROM per
"""


# --- curriculum buckets ------------------------------------------------------

N_STAGES = 4


def curriculum_buckets(docs: DataFrame) -> DataFrame:
    """Curriculum-stage assignment: length quartile within each language,
    then per-(lang, stage) profile.  Short-to-long length scheduling is the
    standard text curriculum.

    Deliberately NOT ``ntile() OVER (PARTITION BY lang)``: that window
    funnels every document of a language through ONE task, and at 100 TB a
    dominant language is half the corpus.  Instead the quartile is computed
    on the compact (lang, n_chars) HISTOGRAM — stage = 1 + (4·cum_before)
    div total, pure integer math over cumulative counts — so the raw corpus
    only ever feeds a bounded groupBy (map-side combined, shuffle rows =
    |lang|×|distinct lengths|) and the window runs over that tiny
    aggregate.  Equal-length docs land in the same stage (never split on an
    arbitrary tiebreak), which is also the better curriculum semantics."""
    hist = docs.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    staged = (
        hist.withColumn("cum_before", F.sum("c").over(w_cum) - F.col("c"))
        .withColumn("total", F.sum("c").over(w_all))
        .withColumn(
            "stage",
            (F.lit(1) + F.expr(f"({N_STAGES} * cum_before) div total")).cast("int"),
        )
    )
    return staged.groupBy("lang", "stage").agg(
        F.sum("c").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


ORA_CURRICULUM_BUCKETS = f"""
WITH h AS (
  SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY lang, n_chars
), staged AS (
  SELECT lang, n_chars, c,
         CAST(SUM(c) OVER (PARTITION BY lang ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - c AS cum_before,
         CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS total
  FROM h
)
SELECT lang,
       CAST(1 + ({N_STAGES} * cum_before) // total AS INT) AS stage,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM staged GROUP BY lang, stage
"""


# --- embedding unit-normalization -------------------------------------------


def normalize_embeddings(emb: DataFrame) -> DataFrame:
    """L2 unit-normalization summary per vector: the norm plus min/max and
    a deterministic left-fold checksum of the unit vector (emitting scalars
    keeps the oracle compare rendering-independent; the unit array itself is
    the same transform minus the final aggregates).  Narrow map, zero
    shuffles."""
    from .similarity import fold_sum, norm

    vnorm = norm("embedding")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    with_norm = emb.select("vec_id", emb_d.alias("emb_d"), vnorm.alias("l2_norm"))
    unit = F.transform("emb_d", lambda x: x / F.col("l2_norm"))
    zero = F.lit(0.0)
    guard = F.col("l2_norm") == 0.0
    return with_norm.select(
        "vec_id",
        "l2_norm",
        F.when(guard, zero).otherwise(F.array_min(unit)).alias("unit_min"),
        F.when(guard, zero).otherwise(F.array_max(unit)).alias("unit_max"),
        F.when(guard, zero).otherwise(fold_sum(unit)).alias("unit_sum"),
    )


_ORA_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)

ORA_NORMALIZE_EMBEDDINGS = f"""
WITH n AS (
  SELECT vec_id, embedding, {_ORA_NORM} AS l2_norm FROM embeddings
), u AS (
  SELECT vec_id, l2_norm,
         list_transform(embedding, x -> CAST(x AS DOUBLE) / l2_norm) AS unit
  FROM n
)
SELECT vec_id, l2_norm,
       CASE WHEN l2_norm = 0 THEN 0.0 ELSE list_aggregate(unit, 'min') END AS unit_min,
       CASE WHEN l2_norm = 0 THEN 0.0 ELSE list_aggregate(unit, 'max') END AS unit_max,
       CASE WHEN l2_norm = 0 THEN 0.0
            ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE), unit), (acc, x) -> acc + x)
       END AS unit_sum
FROM u
"""


# --- IVF centroid construction ----------------------------------------------

# Fixed-point quantization scale for centroid sums: floor(x * 2^20) is exact
# IEEE arithmetic (power-of-two multiply), making the per-cluster component
# sums pure integer math — order-independent across partitions, unlike a
# float sum.  Overflow bound: |x| <~ 2^10 leaves room for ~2^32 vectors per
# cluster in a signed 64-bit accumulator.
CENT_SCALE = 1 << 20


def ivf_centroid_stats(emb: DataFrame, cluster_col: str = "label") -> DataFrame:
    """IVF coarse-quantizer construction: per-cluster centroid from
    fixed-point component sums (the training half of the IVF ANN index —
    ``similarity.ivf_topk`` is the probe half, rows-only because it uses
    float ``avg``; this op is the hash-exact scale path).

    Shape: posexplode is a narrow ×dim flatMap; ONE shuffle on
    (cluster, pos) with map-side integer combine; the final per-cluster
    array is dim-bounded (64 doubles), never corpus-bounded.

    Centroid construction is shared with ``semdedup_representatives`` via
    ``_centroid_frame`` so the two queries can never diverge from their
    common oracle prefix."""
    cent = _centroid_frame(emb, cluster_col)
    from .similarity import fold_sum

    cnorm = F.sqrt(fold_sum(F.transform("centroid", lambda x: x * x)))
    return cent.select(
        "cluster",
        "n_vectors",
        cnorm.alias("centroid_norm"),
        fold_sum(F.col("centroid")).alias("centroid_sum"),
    )


ORA_IVF_CENTROIDS = f"""
WITH expl AS (
  SELECT label AS cluster,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {CENT_SCALE}) AS BIGINT))) AS qval
  FROM embeddings
), per AS (
  SELECT cluster, pos, SUM(qval) AS s, COUNT(*) AS n FROM expl GROUP BY cluster, pos
), means AS (
  SELECT cluster, pos,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / CAST({CENT_SCALE} AS DOUBLE) AS m, n
  FROM per
), cent AS (
  SELECT cluster, list(m ORDER BY pos) AS centroid, MAX(n) AS n_vectors
  FROM means GROUP BY cluster
)
SELECT cluster, CAST(n_vectors AS BIGINT) AS n_vectors,
       sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(centroid, x -> x * x)), (acc, x) -> acc + x)) AS centroid_norm,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), centroid),
                   (acc, x) -> acc + x) AS centroid_sum
FROM cent
"""


# --- bigram LM counts --------------------------------------------------------

LM_MIN_COUNT = 5


def ngram_lm_counts(docs: DataFrame) -> DataFrame:
    """Bigram language-model counts with conditional probabilities
    P(w2 | w1) = count(w1 w2) / count(w1 ·) — the n-gram-LM statistic
    perplexity-based quality filters (CCNet-style) are built on.

    Shape: explode is narrow; groupBy(bigram) shuffles at most |vocab|^2
    keys after map-side combine; the context aggregate and join run over
    the already-collapsed count table (vocab-bounded, not corpus-bounded).
    The count floor keeps the emitted model head-only."""
    from .dedup import fan_out

    big = fan_out(docs).select(F.explode(_word_ngrams(n=2)).alias("bigram"))
    counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    with_ctx = counts.withColumn("w1", F.split("bigram", " ")[0])
    ctx = with_ctx.groupBy("w1").agg(F.sum("n").alias("ctx_n"))
    return (
        with_ctx.join(ctx, "w1")
        .filter(F.col("n") >= LM_MIN_COUNT)
        .select(
            "bigram",
            "n",
            "ctx_n",
            (F.col("n").cast("double") / F.col("ctx_n").cast("double")).alias("cond_p"),
        )
    )


ORA_NGRAM_LM_COUNTS = f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
), big AS (
  SELECT array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + 1), ' ') AS bigram
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM w)
), counts AS (
  SELECT bigram, COUNT(*) AS n, split_part(bigram, ' ', 1) AS w1
  FROM big GROUP BY bigram
), ctx AS (
  SELECT w1, CAST(SUM(n) AS BIGINT) AS ctx_n FROM counts GROUP BY w1
)
SELECT bigram, n, ctx_n,
       CAST(n AS DOUBLE) / CAST(ctx_n AS DOUBLE) AS cond_p
FROM counts JOIN ctx USING (w1)
WHERE n >= {LM_MIN_COUNT}
"""


# --- bigram-LM perplexity filter ---------------------------------------------

# Keep threshold in milli-bits of average per-bigram surprisal: docs whose
# mean floor(log2(1/P(w2|w1))) exceeds this read as LM-implausible (noise,
# boilerplate soup, wrong-language shards) and are dropped.  4300 sits in
# the upper half of every test corpus's score distribution (centers drift
# down as the corpus grows — more data, lower perplexity — from ~4.33
# bits at sf0.001 to ~4.14 at sf0.1), so both verdicts occur at every SF;
# production would tune this on a held-out set exactly like CCNet does.
PPL_KEEP_MILLI_BITS = 4300


def lm_perplexity_filter(docs: DataFrame) -> DataFrame:
    """CCNet-style perplexity quality filter, self-scored: train the bigram
    model on the corpus (ngram_lm_counts' shape, unfloored so every observed
    bigram has a probability), then score each doc by its average per-bigram
    surprisal and keep the low-perplexity side of the threshold.

    Surprisal is BIT-QUANTIZED — floor(log2(ctx_n / n)) computed as
    length(bin(ctx_n div n)) - 1, pure integer arithmetic — so the score is
    hash-exact across engines (the repo's no-libm discipline: ln() differs
    by ulps between JVM and C libm).  Production swaps in a KenLM scorer via
    mapInPandas; the Spark shape is identical either way: one explode pass
    shared by train and score (r21 — the self-scored variant used to
    explode + split the corpus TWICE, once without doc_id for the model
    and once with it for scoring; the model's counts are the same frame
    with doc_id dropped, so one persisted bigram pass feeds both), the
    vocab-bounded model joined back (broadcastable when the vocab head is
    small; a key-shuffle join otherwise), one per-doc aggregate.  At
    100 TB the model is a maintained table — train once, score every
    shard (the streaming gate's staged_ppl_model path)."""
    from pyspark import StorageLevel

    from .dedup import fan_out

    big = (
        fan_out(docs)
        .select("doc_id", F.explode(_word_ngrams(n=2)).alias("bigram"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
        with_ctx = counts.withColumn("w1", F.split("bigram", " ")[0])
        ctx = with_ctx.groupBy("w1").agg(
            F.sum("n").cast("bigint").alias("ctx_n")
        )
        model = with_ctx.join(ctx, "w1").select(
            "bigram",
            (F.length(F.bin(F.expr("ctx_n div n"))) - 1)
            .cast("bigint")
            .alias("bits"),
        )
        scored = big.join(model, "bigram").groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").cast("bigint").alias("total_bits"),
        )
        avg_milli = F.expr("(1000 * total_bits) div n_bigrams")
        return scored.select(
            "doc_id",
            "n_bigrams",
            "total_bits",
            avg_milli.cast("bigint").alias("avg_milli_bits"),
            (avg_milli <= PPL_KEEP_MILLI_BITS).alias("keep"),
        ).localCheckpoint(eager=True)
    finally:
        big.unpersist()


def lm_bigram_model(docs: DataFrame) -> DataFrame:
    """The (bigram, bits) surprisal model lm_perplexity_filter trains:
    bigram counts, per-context totals, bits = floor(log2(ctx_n div n)).
    Vocab-bounded — at 100 TB this is the maintained model table the
    training pipeline refreshes, not something recomputed per scoring
    pass (see queries/curation.staged_ppl_model)."""
    from .dedup import fan_out

    big = fan_out(docs).select(F.explode(_word_ngrams(n=2)).alias("bigram"))
    counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    with_ctx = counts.withColumn("w1", F.split("bigram", " ")[0])
    ctx = with_ctx.groupBy("w1").agg(F.sum("n").cast("bigint").alias("ctx_n"))
    return with_ctx.join(ctx, "w1").select(
        "bigram",
        (F.length(F.bin(F.expr("ctx_n div n"))) - 1).cast("bigint").alias("bits"),
    )


def lm_score_docs(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Score docs against a (bigram, bits) model: one explode, one join
    against the vocab-bounded model, one per-doc aggregate.  Shared by the
    batch filter (model = same corpus) and the streaming gate (model = the
    staged table; each micro-batch pays only its own explode+join)."""
    from .dedup import fan_out

    big = fan_out(docs).select(
        "doc_id", F.explode(_word_ngrams(n=2)).alias("bigram")
    )
    scored = big.join(model, "bigram").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits").cast("bigint").alias("total_bits"),
    )
    avg_milli = F.expr("(1000 * total_bits) div n_bigrams")
    return scored.select(
        "doc_id",
        "n_bigrams",
        "total_bits",
        avg_milli.cast("bigint").alias("avg_milli_bits"),
        (avg_milli <= PPL_KEEP_MILLI_BITS).alias("keep"),
    )


ORA_LM_PERPLEXITY = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), big AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + 1), ' ') AS bigram
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w)
), counts AS (
  SELECT bigram, COUNT(*) AS n, split_part(bigram, ' ', 1) AS w1
  FROM big GROUP BY bigram
), ctx AS (
  SELECT w1, CAST(SUM(n) AS BIGINT) AS ctx_n FROM counts GROUP BY w1
), model AS (
  SELECT bigram, length(bin(CAST(ctx_n // n AS BIGINT))) - 1 AS bits
  FROM counts JOIN ctx USING (w1)
), scored AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(bits) AS BIGINT) AS total_bits
  FROM big JOIN model USING (bigram) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, total_bits,
       CAST((1000 * total_bits) // n_bigrams AS BIGINT) AS avg_milli_bits,
       (1000 * total_bits) // n_bigrams <= {PPL_KEEP_MILLI_BITS} AS keep
FROM scored
"""


# --- URL canonicalization dedup ---------------------------------------------


def _synthetic_url() -> Column:
    """Deterministic URL per doc (the corpus has no URL column): host case
    and query/fragment noise vary by doc_id so canonicalization has real
    work to do, exactly replayed by the oracle."""
    host = F.when(F.col("doc_id") % 2 == 1, F.upper("source")).otherwise(F.col("source"))
    noise = (
        F.when(F.col("doc_id") % 3 == 1, F.lit("?utm_source=feed"))
        .when(F.col("doc_id") % 3 == 2, F.lit("#frag"))
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit("https://"), host, F.lit(".example.com/page/"),
        (F.col("doc_id") % 50).cast("string"), noise,
    )


def url_host_dedup(docs: DataFrame) -> DataFrame:
    """URL-canonicalized dedup: lowercase the URL, strip query string and
    fragment, then collapse to one canonical doc per normalized URL — the
    first-pass dedup every web-crawl pipeline runs (far cheaper than
    content hashing, catches mirror/tracking-param duplicates).

    Shape: narrow normalize map, ONE shuffle on the normalized URL with
    map-side combine."""
    norm_url = F.lower(F.regexp_replace(_synthetic_url(), "[?#].*$", ""))
    return (
        docs.select("doc_id", _synthetic_url().alias("url"), norm_url.alias("norm_url"))
        .groupBy("norm_url")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dupes"),
            F.count_distinct("url").alias("n_raw_variants"),
        )
    )


ORA_URL_HOST_DEDUP = """
WITH u AS (
  SELECT doc_id,
         concat('https://',
                CASE WHEN doc_id % 2 = 1 THEN upper(source) ELSE source END,
                '.example.com/page/', CAST(doc_id % 50 AS VARCHAR),
                CASE doc_id % 3 WHEN 1 THEN '?utm_source=feed'
                                WHEN 2 THEN '#frag' ELSE '' END) AS url
  FROM documents
)
SELECT lower(regexp_replace(url, '[?#].*$', '')) AS norm_url,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_dupes,
       COUNT(DISTINCT url) AS n_raw_variants
FROM u GROUP BY 1
"""


# --- contamination overlap profile ------------------------------------------


# gram keys come from training._gram_keys (shared polynomial fold — r6
# replaced the md5-per-gram-string key; see that docstring)


def contamination_overlap(docs: DataFrame) -> DataFrame:
    """The inverse view of ``ngram_decontaminate``: per BENCHMARK doc, how
    much of it leaks into the training corpus — distinct contaminated
    grams, distinct touching train docs, and the contaminated fraction.
    This is the report eval owners read to decide whether to rotate a
    benchmark out.

    Shape: identical scale posture to the decontaminate op — the bench
    side's per-doc distinct is bounded (fixed eval suite), train grams stay
    raw until after the equi-join, dedup (count_distinct) runs over the
    matched sliver only, ONE full-width shuffle (the join)."""
    grams = gram_key_pairs(docs)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = (
        grams.filter(is_bench)
        .select(F.col("doc_id").alias("bench_doc_id"), "gram_key")
        .distinct()
    )
    bench_tot = bench.groupBy("bench_doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    train = grams.filter(~is_bench).select(
        F.col("doc_id").alias("train_doc_id"), "gram_key"
    )
    hits = (
        bench.join(train, "gram_key")
        .groupBy("bench_doc_id")
        .agg(
            F.count_distinct("gram_key").alias("n_hit_grams"),
            F.count_distinct("train_doc_id").alias("n_train_docs"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        bench_tot.join(hits, "bench_doc_id", "left")
        .select(
            "bench_doc_id",
            "n_grams",
            F.coalesce("n_hit_grams", zero).alias("n_hit_grams"),
            F.coalesce("n_train_docs", zero).alias("n_train_docs"),
            (
                F.coalesce("n_hit_grams", zero).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("contaminated_frac"),
        )
    )


ORA_CONTAMINATION_OVERLAP = f"""
WITH {{corpus_cte}}
{ORA_GRAM_KEY_CTES},
grams AS (
  SELECT DISTINCT doc_id, gram_key FROM grams_raw
), bench AS (
  SELECT doc_id AS bench_doc_id, gram_key FROM grams WHERE doc_id % {BENCH_MOD} = 0
), bench_tot AS (
  SELECT bench_doc_id, COUNT(*) AS n_grams FROM bench GROUP BY bench_doc_id
), hits AS (
  SELECT b.bench_doc_id,
         COUNT(DISTINCT b.gram_key) AS n_hit_grams,
         COUNT(DISTINCT g.doc_id) AS n_train_docs
  FROM bench b JOIN grams g
    ON g.gram_key = b.gram_key AND g.doc_id % {BENCH_MOD} <> 0
  GROUP BY b.bench_doc_id
)
SELECT t.bench_doc_id, t.n_grams,
       COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
       COALESCE(h.n_train_docs, 0) AS n_train_docs,
       CAST(COALESCE(h.n_hit_grams, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
         AS contaminated_frac
FROM bench_tot t LEFT JOIN hits h USING (bench_doc_id)
"""


# --- quality filter pipeline -------------------------------------------------

QF_MIN_CHARS = 50
QF_MAX_CHARS = 5000
QF_MIN_WORDS = 10
QF_MIN_AVG_WLEN = 2.0
QF_MAX_AVG_WLEN = 12.0
QF_MAX_STOPWORD = 0.5
QF_MIN_DISTINCT = 0.3


def quality_filter_pipeline(docs: DataFrame) -> DataFrame:
    """C4/Gopher-style chained quality gate: per-doc boolean verdict for
    each rule plus the final keep decision — kept as columns (not a filter)
    so curation runs can audit *why* documents drop.  All signals are
    narrow array/string expressions: zero shuffles, full scan speed."""
    from .text import STOPWORDS

    toks = F.split("text", " ")
    n_words = F.size(toks)
    compact = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    avg_wlen = compact.cast("double") / n_words.cast("double")
    stop_list = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_list, t))).cast("double")
        / n_words.cast("double")
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_words.cast("double")
    p_len = (F.col("n_chars") >= QF_MIN_CHARS) & (F.col("n_chars") <= QF_MAX_CHARS)
    p_words = n_words >= QF_MIN_WORDS
    p_wlen = (avg_wlen >= QF_MIN_AVG_WLEN) & (avg_wlen <= QF_MAX_AVG_WLEN)
    p_stop = stop_ratio <= QF_MAX_STOPWORD
    p_distinct = distinct_ratio >= QF_MIN_DISTINCT
    return docs.select(
        "doc_id",
        p_len.alias("pass_length"),
        p_words.alias("pass_words"),
        p_wlen.alias("pass_word_len"),
        p_stop.alias("pass_stopwords"),
        p_distinct.alias("pass_distinct"),
        (p_len & p_words & p_wlen & p_stop & p_distinct).alias("keep"),
    )


def _ora_quality_filter() -> str:
    from .text import STOPWORDS

    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
WITH s AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_wlen,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> list_contains({stop}, t))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio
  FROM documents
)
SELECT doc_id,
       (n_chars >= {QF_MIN_CHARS} AND n_chars <= {QF_MAX_CHARS}) AS pass_length,
       (n_words >= {QF_MIN_WORDS}) AS pass_words,
       (avg_wlen >= {QF_MIN_AVG_WLEN} AND avg_wlen <= {QF_MAX_AVG_WLEN}) AS pass_word_len,
       (stop_ratio <= {QF_MAX_STOPWORD}) AS pass_stopwords,
       (distinct_ratio >= {QF_MIN_DISTINCT}) AS pass_distinct,
       (n_chars >= {QF_MIN_CHARS} AND n_chars <= {QF_MAX_CHARS}
        AND n_words >= {QF_MIN_WORDS}
        AND avg_wlen >= {QF_MIN_AVG_WLEN} AND avg_wlen <= {QF_MAX_AVG_WLEN}
        AND stop_ratio <= {QF_MAX_STOPWORD}
        AND distinct_ratio >= {QF_MIN_DISTINCT}) AS keep
FROM s
"""


# --- token-budget split assignment -------------------------------------------

# train/val/test boundaries in tenths of each source's token total
SPLIT_TRAIN_TENTHS = 8
SPLIT_VAL_TENTHS = 9


def token_budget_split(docs: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment by cumulative token budget
    within each source shard: first 80% of tokens -> train, next 10% ->
    val, rest -> test.  The comparisons are pure integer cross-multiplies
    (cum*10 vs total*8) — no float boundary jitter, bit-identical in any
    engine.

    Shape: same single per-source window shuffle as ``pack_sequences``
    (shards are independent; no global ordering)."""
    w_cum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    with_cum = (
        docs.withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
        .withColumn("cum_excl", F.sum("n_tokens").over(w_cum) - F.col("n_tokens"))
        .withColumn("total", F.sum("n_tokens").over(w_all))
    )
    split = (
        F.when(F.col("cum_excl") * 10 < F.col("total") * SPLIT_TRAIN_TENTHS, F.lit("train"))
        .when(F.col("cum_excl") * 10 < F.col("total") * SPLIT_VAL_TENTHS, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return with_cum.select("doc_id", "source", "n_tokens", split.alias("split"))


ORA_TOKEN_BUDGET_SPLIT = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_tokens AS cum_excl,
         CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS total
  FROM t
)
SELECT doc_id, source, n_tokens,
       CASE WHEN cum_excl * 10 < total * {SPLIT_TRAIN_TENTHS} THEN 'train'
            WHEN cum_excl * 10 < total * {SPLIT_VAL_TENTHS} THEN 'val'
            ELSE 'test' END AS split
FROM c
"""


# --- RLHF preference-pair stats ----------------------------------------------


def rlhf_pair_stats(docs: DataFrame) -> DataFrame:
    """Preference-pair audit: pair adjacent docs (even doc_id = chosen, the
    following odd = rejected), then per-source length-bias statistics —
    the standard check that a reward dataset isn't just teaching "longer is
    better".

    Shape: self-equi-join on the derived pair key (both sides shuffle on
    doc_id — co-partitioned), then a |sources|-bounded aggregate."""
    chosen = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", F.col("n_chars").alias("chosen_chars")
    )
    rejected = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("n_chars").alias("rejected_chars")
    )
    pairs = chosen.join(rejected, "doc_id")
    delta = F.col("chosen_chars") - F.col("rejected_chars")
    return (
        pairs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(delta > 0, 1).otherwise(0)).alias("n_chosen_longer"),
            F.sum(delta).alias("delta_sum"),
        )
        .select(
            "source",
            "n_pairs",
            "n_chosen_longer",
            (F.col("delta_sum").cast("double") / F.col("n_pairs").cast("double")).alias(
                "avg_len_delta"
            ),
        )
    )


ORA_RLHF_PAIR_STATS = """
WITH pairs AS (
  SELECT c.source, c.n_chars AS chosen_chars, r.n_chars AS rejected_chars
  FROM (SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 2 = 0) c
  JOIN (SELECT doc_id - 1 AS doc_id, n_chars FROM documents WHERE doc_id % 2 = 1) r
    USING (doc_id)
)
SELECT source, COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN chosen_chars > rejected_chars THEN 1 ELSE 0 END) AS BIGINT)
         AS n_chosen_longer,
       CAST(SUM(chosen_chars - rejected_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_len_delta
FROM pairs GROUP BY source
"""


# --- keep-best window dedup --------------------------------------------------

PREFIX_CHARS = 40


def window_dedup_rank(corpus: DataFrame) -> DataFrame:
    """Keep-best dedup: cluster on an md5 prefix key of the first
    PREFIX_CHARS characters (catches exact and suffix-edited near copies),
    rank members longest-first within each cluster, keep-best = rank 1.
    Emitting every member with its rank and cluster size makes the op
    auditable; the keep decision is ``rank = 1``.

    Shape: ONE window shuffle on the cluster key.  Clusters are naturally
    small (prefix collisions), so per-key ordering is cheap; a degenerate
    hot prefix would be handled by the same bucket-cap discipline as LSH."""
    ckey = F.substring(
        F.md5(F.substring("text", 1, PREFIX_CHARS).cast("binary")), 1, 12
    )
    with_key = corpus.withColumn("cluster_key", ckey)
    w = Window.partitionBy("cluster_key").orderBy(
        F.desc(F.length("text")), F.col("doc_id")
    )
    return with_key.select(
        "doc_id",
        "cluster_key",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy("cluster_key")).alias("n_members"),
    )


ORA_WINDOW_DEDUP_RANK = f"""
WITH {{corpus_cte}}
k AS (
  SELECT doc_id, text,
         substring(md5(substring(text, 1, {PREFIX_CHARS})), 1, 12) AS cluster_key
  FROM corpus
)
SELECT doc_id, cluster_key,
       row_number() OVER (PARTITION BY cluster_key
                          ORDER BY length(text) DESC, doc_id) AS rank,
       COUNT(*) OVER (PARTITION BY cluster_key) AS n_members
FROM k
"""


# --- BPE pair counts (tokenizer training, first merge iteration) -------------

BPE_MIN_COUNT = 10


def bpe_pair_counts(docs: DataFrame) -> DataFrame:
    """The inner loop of BPE tokenizer training, iteration one: count
    adjacent symbol pairs inside each word, weighted by word frequency —
    the argmax pair is the first merge.  Computing over the *distinct word
    list* x its corpus count (instead of re-scanning every occurrence) is
    the standard trick: pair extraction runs once per vocabulary entry, so
    the explode is |vocab|-bounded, not corpus-bounded.

    Shape: one corpus-wide shuffle collapses tokens to (word, count) with
    map-side combine; pair explode + the (pair) aggregate then run over
    vocabulary-sized data."""
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )
    pair_arr = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.col("word").substr(i, F.lit(2)),
    )
    return (
        words.select(F.explode(pair_arr).alias("pair"), "wcount")
        .groupBy("pair")
        .agg(F.sum("wcount").alias("n"))
        .filter(F.col("n") >= BPE_MIN_COUNT)
    )


ORA_BPE_PAIR_COUNTS = f"""
WITH words AS (
  SELECT word, COUNT(*) AS wcount FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE length(word) >= 2 GROUP BY word
), pairs AS (
  SELECT unnest(list_transform(range(1, length(word)),
                i -> substring(word, CAST(i AS INT), 2))) AS pair,
         wcount
  FROM words
)
SELECT pair, CAST(SUM(wcount) AS BIGINT) AS n
FROM pairs GROUP BY pair HAVING SUM(wcount) >= {BPE_MIN_COUNT}
"""


# --- sliding-window chunking --------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Sliding-window document chunking (the RAG / long-context pretraining
    shape): fixed-size token windows with overlap, one output row per
    chunk.  A pure narrow flatMap — explode over a stepped sequence of
    chunk starts; zero shuffles at any scale."""
    n_tokens = F.size(F.split("text", " "))
    starts = F.sequence(F.lit(0), n_tokens - 1, F.lit(CHUNK_STRIDE))
    return (
        docs.withColumn("n_tokens", n_tokens.cast("long"))
        .select(
            "doc_id",
            "n_tokens",
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                F.col("n_tokens") - F.col("chunk_start"),
            ).alias("chunk_len"),
        )
    )


ORA_CHUNK_DOCUMENTS = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, n_tokens,
         unnest(range(0, n_tokens, {CHUNK_STRIDE})) AS chunk_start,
         generate_subscripts(range(0, n_tokens, {CHUNK_STRIDE}), 1) - 1 AS chunk_idx
  FROM t
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       least({CHUNK_TOKENS}, n_tokens - chunk_start) AS chunk_len
FROM s
"""


# --- SemDeDup cluster representatives ----------------------------------------


def _centroid_frame(emb: DataFrame, cluster_col: str = "label") -> DataFrame:
    """(cluster, n_vectors, centroid: array<double>) via the fixed-point
    integer-sum path of ``ivf_centroid_stats`` — shared by the centroid
    stats query and SemDeDup representative selection."""
    qvals = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * CENT_SCALE).cast("long")
    )
    expl = emb.select(
        F.col(cluster_col).alias("cluster"), F.posexplode(qvals).alias("pos", "qval")
    )
    per = expl.groupBy("cluster", "pos").agg(
        F.sum("qval").alias("s"), F.count(F.lit(1)).alias("n")
    )
    mean = (
        F.col("s").cast("double") / F.col("n").cast("double") / F.lit(float(CENT_SCALE))
    )
    return (
        per.select("cluster", "pos", mean.alias("m"), "n")
        .groupBy("cluster")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pairs"),
            F.max("n").alias("n_vectors"),
        )
        .select(
            "cluster",
            "n_vectors",
            F.transform("pairs", lambda p: p.getField("m")).alias("centroid"),
        )
    )


def semdedup_representatives(emb: DataFrame, cluster_col: str = "label") -> DataFrame:
    """SemDeDup-style representative selection: within each embedding
    cluster, rank members by cosine similarity to the (fixed-point exact)
    cluster centroid and keep the closest as the cluster representative —
    the keep-one-per-semantic-cluster dedup step (Abbas et al. 2023 shape).

    Shape: centroid build is the two-integer-shuffle plan of
    ``ivf_centroid_stats``; the member-to-centroid join is an equi-join on
    cluster id with the |clusters|-row centroid side broadcast; ranking is
    one window shuffle partitioned by cluster."""
    from .similarity import cosine

    cent = _centroid_frame(emb, cluster_col)
    members = emb.select(
        F.col(cluster_col).alias("cluster"), "vec_id", "embedding"
    )
    scored = members.join(F.broadcast(cent), "cluster").withColumn(
        "centroid_cos", cosine("embedding", "centroid")
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("centroid_cos"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "cluster",
            F.col("vec_id").alias("rep_vec_id"),
            "centroid_cos",
            "n_vectors",
        )
    )


_ORA_COS_CENT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip(embedding, centroid), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x) "
    "/ (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, x) -> acc + x)) "
    "* sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(centroid, x -> x * x)), (acc, x) -> acc + x)))"
)

ORA_SEMDEDUP_REPRESENTATIVES = f"""
WITH expl AS (
  SELECT label AS cluster,
         unnest(range(0, len(embedding))) AS pos,
         unnest(list_transform(embedding,
                x -> CAST(floor(CAST(x AS DOUBLE) * {CENT_SCALE}) AS BIGINT))) AS qval
  FROM embeddings
), per AS (
  SELECT cluster, pos, SUM(qval) AS s, COUNT(*) AS n FROM expl GROUP BY cluster, pos
), means AS (
  SELECT cluster, pos,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / CAST({CENT_SCALE} AS DOUBLE) AS m, n
  FROM per
), cent AS (
  SELECT cluster, list(m ORDER BY pos) AS centroid, MAX(n) AS n_vectors
  FROM means GROUP BY cluster
), scored AS (
  SELECT e.label AS cluster, e.vec_id, c.n_vectors,
         {_ORA_COS_CENT} AS centroid_cos
  FROM embeddings e JOIN cent c ON e.label = c.cluster
)
SELECT cluster, vec_id AS rep_vec_id, centroid_cos, CAST(n_vectors AS BIGINT) AS n_vectors
FROM (
  SELECT cluster, vec_id, centroid_cos, n_vectors,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY centroid_cos DESC, vec_id) AS rnk
  FROM scored
) WHERE rnk = 1
"""


# --- vocabulary OOV coverage --------------------------------------------------

VOCAB_SIZE = 200


def vocab_coverage(docs: DataFrame) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the top-VOCAB_SIZE word
    vocabulary (count desc, word asc — deterministic), then measure each
    document's out-of-vocabulary token ratio — the go/no-go check before
    freezing a tokenizer on a corpus mix.

    Shape: vocabulary is a corpus-wide aggregate bounded by |vocab| after
    map-side combine, then a broadcast left-anti-style membership join on
    the exploded tokens (broadcast is |VOCAB_SIZE| rows — always tiny) and
    one per-doc aggregate."""
    from .text import heavy_hitters

    vocab = heavy_hitters(docs, k=VOCAB_SIZE).select("word", F.lit(1).alias("in_vocab"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    flagged = toks.join(F.broadcast(vocab), "word", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
                "oov_ratio"
            ),
        )
    )


ORA_VOCAB_COVERAGE = f"""
WITH vocab AS (
  SELECT word FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
  ORDER BY COUNT(*) DESC, word LIMIT {VOCAB_SIZE}
), toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_ratio
FROM toks t LEFT JOIN vocab v USING (word)
WHERE t.word <> ''
GROUP BY t.doc_id
"""


# --- end-to-end curation pipeline --------------------------------------------


def curation_pipeline(docs: DataFrame) -> DataFrame:
    """The whole curation funnel as ONE composed Catalyst plan —
    normalize -> exact-dedup on the normalized hash -> quality gate ->
    per-language funnel report (inputs, dup drops, quality drops, kept
    docs + kept tokens).  Input needs (doc_id, text, lang).

    This is the query a user actually ships: each stage is a column
    expression or a high-cardinality window, so the optimizer fuses the
    narrow stages into one codegen'd pass over the scan, and the only
    shuffles are the dedup window (keyed by the md5 hash — uniformly
    distributed, no skew) and the final |langs|-row aggregate.  Staging
    tables between these steps would cost a full materialization each at
    100 TB; composing them costs nothing."""
    from .text import STOPWORDS

    norm_hash = F.md5(_norm_text().cast("binary"))
    w = Window.partitionBy("norm_hash").orderBy("doc_id")

    toks = F.split("text", " ")
    n_words = F.size(toks)
    n_chars = F.length("text")
    compact = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    avg_wlen = compact.cast("double") / n_words.cast("double")
    stop_list = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_list, t))).cast("double")
        / n_words.cast("double")
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_words.cast("double")
    q_keep = (
        (n_chars >= QF_MIN_CHARS)
        & (n_chars <= QF_MAX_CHARS)
        & (n_words >= QF_MIN_WORDS)
        & (avg_wlen >= QF_MIN_AVG_WLEN)
        & (avg_wlen <= QF_MAX_AVG_WLEN)
        & (stop_ratio <= QF_MAX_STOPWORD)
        & (distinct_ratio >= QF_MIN_DISTINCT)
    )

    staged = docs.select(
        "doc_id",
        "lang",
        norm_hash.alias("norm_hash"),
        n_words.cast("long").alias("n_tokens"),
        q_keep.alias("q_keep"),
    ).withColumn("is_dup", F.row_number().over(w) > 1)

    kept = ~F.col("is_dup") & F.col("q_keep")
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return staged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_input"),
        one_if(F.col("is_dup")).alias("n_dup_dropped"),
        one_if(~F.col("is_dup") & ~F.col("q_keep")).alias("n_quality_dropped"),
        one_if(kept).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
    )


ORA_CURATION_PIPELINE = f"""
WITH {{corpus_cte}}
attrs AS (
  SELECT c.doc_id, c.text, d.lang
  FROM corpus c JOIN documents d ON d.doc_id = c.doc_id % 1000000
), staged AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))
           ORDER BY doc_id) > 1 AS is_dup,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         (length(text) >= {QF_MIN_CHARS} AND length(text) <= {QF_MAX_CHARS}
          AND len(string_split(text, ' ')) >= {QF_MIN_WORDS}
          AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE) >= {QF_MIN_AVG_WLEN}
          AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE) <= {QF_MAX_AVG_WLEN}
          AND CAST(len(list_filter(string_split(text, ' '),
                   t -> list_contains({{stop_list}}, t))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE) <= {QF_MAX_STOPWORD}
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE) >= {QF_MIN_DISTINCT}
         ) AS q_keep
  FROM attrs
)
SELECT lang,
       COUNT(*) AS n_input,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
       CAST(SUM(CASE WHEN NOT is_dup AND NOT q_keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_dropped,
       CAST(SUM(CASE WHEN NOT is_dup AND q_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN NOT is_dup AND q_keep THEN n_tokens ELSE 0 END) AS BIGINT)
         AS tokens_kept
FROM staged GROUP BY lang
"""


# --- integer-exact k-means (embedding clustering) ----------------------------

# Power-of-two fixed-point scale: floor(x * 2^10) is exact IEEE arithmetic,
# so the quantized components are plain integers and every distance /
# centroid computation below is integer math both engines replay exactly.
# Overflow bound: |qval| <= ~5 * 2^10, so a per-pair squared distance is
# <= 64 * (2^13)^2 < 2^32 and a corpus-wide inertia sum has ~2^31 rows of
# headroom in a signed 64-bit accumulator.
KM_SCALE = 1 << 10
KM_K = 8
KM_ITERS = 3


def _km_loop(emb: DataFrame, k: int, iters: int):
    """The shared Lloyd loop: quantize, seed from the k smallest vec_ids,
    iterate assign/rebuild ``iters`` times.  Returns (assigned, cent) for
    the FINAL iteration — assigned is (vec_id, cluster, d2, qv), cent is
    the k-row centroid frame rebuilt from that assignment."""
    qv = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * KM_SCALE).cast("long")
    )
    q = emb.select("vec_id", qv.alias("qv")).persist()
    cent = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), F.col("qv").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cluster")
    assigned = None
    for _ in range(iters):
        scored = q.crossJoin(F.broadcast(cent)).withColumn("d2", d2)
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster", "d2", "qv")
        )
        percomp = (
            assigned.select("cluster", F.posexplode("qv").alias("pos", "qval"))
            .groupBy("cluster", "pos")
            .agg(F.sum("qval").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        cent = (
            percomp.withColumn("cval", F.expr("(s - pmod(s, n)) div n"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda st: st["cval"],
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return assigned, cent


def kmeans_assign(
    emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS
) -> DataFrame:
    """The assignment half of ``kmeans_embeddings``, exposed for callers
    that need the PER-VECTOR cluster ids rather than per-cluster stats —
    IVF-index training above all (``similarity.stage_ivf_index`` re-
    clusters with this when the corpus outgrows its label quantizer).
    Returns (vec_id, cluster) for the final iteration's assignment; same
    determinism contract and per-iteration shape as the stats query (one
    broadcast-crossJoin pass + one k x dim shuffle per iteration,
    quantized-integer math throughout)."""
    assigned, _ = _km_loop(emb, k, iters)
    return assigned.select("vec_id", "cluster")


def kmeans_embeddings(emb: DataFrame, k: int = KM_K, iters: int = KM_ITERS) -> DataFrame:
    """Lloyd's k-means over fixed-point-quantized embeddings — the
    clustering stage SemDeDup / topic-balancing / IVF-index training all
    sit on (here ``label`` is NOT used: the clusters are discovered).

    Determinism contract: components are quantized to integers
    (floor(x * 2^10)), centroids are the exact floor of the per-cluster
    component mean ((s - pmod(s, n)) div n — integer division after
    removing the positive remainder, identical in Spark and DuckDB), the
    argmin tie-breaks on cluster id, and seeds are the k smallest vec_ids.
    Every iteration is therefore a pure integer fixpoint step the DuckDB
    oracle unrolls CTE-for-CTE — no float accumulation anywhere.

    Shape per iteration: assignment is a crossJoin against the BROADCAST
    k-row centroid frame with a whole-array zip_with distance (no ×dim
    row explosion), so its cost is one narrow pass over the vectors; the
    rebuild posexplodes only for the (cluster, pos) sum — ONE shuffle of
    k × dim groups after map-side combine.  The quantized vector frame is
    persisted once and reused by all iterations; the k-row centroid frame
    is eagerly localCheckpoint'ed so the plan does not deepen with the
    iteration count.  At 100 TB nothing here is corpus-bounded except the
    two narrow passes per iteration — the textbook scalable k-means shape.

    Output per discovered cluster: member count, centroid L1 mass, and
    the exact quantized inertia of the final assignment — all BIGINT."""
    assigned, cent = _km_loop(emb, k, iters)
    stats = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.sum("d2").alias("inertia_q")
    )
    l1 = cent.select(
        "cluster",
        F.aggregate(
            F.transform("cv", lambda c: F.abs(c)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("centroid_l1"),
    )
    return stats.join(l1, "cluster").select(
        "cluster", "n_vectors", "centroid_l1", "inertia_q"
    )


def _km_iter_sql(i: int) -> str:
    """One unrolled Lloyd iteration as oracle CTEs (assignment a{i} against
    centroids c{i-1}, rebuild c{i} from the winners m{i})."""
    prev = f"c{i - 1}" if i > 1 else "cent0"
    return f"""
a{i} AS (
  SELECT e.vec_id, c.cluster,
         SUM((e.qval - c.cval) * (e.qval - c.cval)) AS d2
  FROM expl e JOIN {prev} c USING (pos) GROUP BY e.vec_id, c.cluster
), m{i} AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT vec_id, cluster, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
    FROM a{i}
  ) WHERE rn = 1
), c{i} AS (
  SELECT m.cluster, e.pos,
         CAST((SUM(e.qval) - ((SUM(e.qval) % COUNT(*)) + COUNT(*)) % COUNT(*))
              / COUNT(*) AS BIGINT) AS cval
  FROM m{i} m JOIN expl e USING (vec_id) GROUP BY m.cluster, e.pos
)"""


ORA_KMEANS_EMBEDDINGS = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)) AS qv
  FROM embeddings
), expl AS (
  SELECT vec_id, unnest(range(0, len(qv))) AS pos, unnest(qv) AS qval FROM q
), cent0 AS (
  SELECT vec_id AS cluster, pos, qval AS cval FROM expl WHERE vec_id < {KM_K}
),{",".join(_km_iter_sql(i) for i in range(1, KM_ITERS + 1))},
fin AS (
  SELECT cluster, COUNT(*) AS n_vectors, CAST(SUM(d2) AS BIGINT) AS inertia_q
  FROM m{KM_ITERS} GROUP BY cluster
), cl1 AS (
  SELECT cluster, CAST(SUM(abs(cval)) AS BIGINT) AS centroid_l1
  FROM c{KM_ITERS} GROUP BY cluster
)
SELECT f.cluster, f.n_vectors, cl1.centroid_l1, f.inertia_q
FROM fin f JOIN cl1 USING (cluster)
"""


# --- bigram coverage (perplexity-proxy quality score) ------------------------


def lm_bigram_coverage(docs: DataFrame) -> DataFrame:
    """Per-document bigram coverage against the corpus bigram LM — the
    integer-exact stand-in for perplexity-based quality filtering
    (CCNet-style): a document most of whose bigrams are rare corpus-wide
    is the same document a small LM would assign high perplexity.

    Emits (doc_id, n_bigrams, n_covered, coverage_pct) where a bigram
    occurrence is covered when its corpus count >= LM_MIN_COUNT; the only
    float is the final single division.  Shape: the count table is
    vocab²-bounded (not corpus-bounded) after one map-side-combined
    groupBy; the coverage join shuffles on the bigram key — uniformly
    distributed text keys, no skew — and the per-doc rollup is the second
    and last shuffle.  Docs shorter than two words have no bigrams and are
    absent from the report by construction (same in the oracle)."""
    from .dedup import fan_out

    # file-split trap (see dedup.fan_out): fan the compact doc rows out
    # before the ~|words|x explode
    big = fan_out(docs).select("doc_id", F.explode(_word_ngrams(n=2)).alias("bigram"))
    counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    per = (
        big.join(counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("n") >= LM_MIN_COUNT, 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
        )
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        "n_covered",
        (F.col("n_covered").cast("double") / F.col("n_bigrams").cast("double")).alias(
            "coverage_pct"
        ),
    )


ORA_LM_BIGRAM_COVERAGE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), big AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, CAST(i AS INT), CAST(i AS INT) + 1), ' ')
           AS bigram
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w)
), counts AS (
  SELECT bigram, COUNT(*) AS n FROM big GROUP BY bigram
), per AS (
  SELECT b.doc_id, COUNT(*) AS n_bigrams,
         CAST(SUM(CASE WHEN c.n >= {LM_MIN_COUNT} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered
  FROM big b JOIN counts c USING (bigram) GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, n_covered,
       CAST(n_covered AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS coverage_pct
FROM per
"""


# --- unrolled BPE merge training steps ---------------------------------------

BPE_MERGE_STEPS = 3


def bpe_merge_steps(docs: DataFrame, steps: int = BPE_MERGE_STEPS) -> DataFrame:
    """The BPE tokenizer-training loop itself, first ``steps`` merges:
    count adjacent symbol pairs over the frequency-weighted vocabulary,
    pick the argmax pair (count desc, then lexicographic — fully
    deterministic), apply the merge to every word's symbol sequence, and
    repeat.  Emits one row per learned merge: (step, lhs, rhs,
    pair_count) — the head of the merges.txt a real tokenizer ships.

    Merge application is a delimiter-padded string replace: sequences are
    ' s y m s ' (single-space separators, padded ends), the pair (a, b)
    rewrites ' a b ' -> ' ab '.  Spark's replace and DuckDB's replace share
    leftmost non-overlapping scan semantics, so the operator's DEFINED
    merge semantics (an overlapping chain 'e e e e' merges once per scan
    window, not twice) are bit-identical in both engines — the oracle
    unrolls the whole train loop CTE-for-CTE, argmax included.

    Shape: one corpus-bounded shuffle collapses tokens to (word, freq);
    every iteration after that runs on the |vocab|-row frame — pair
    explode (narrow), one |pairs|-bounded groupBy with map-side combine,
    and a 1-row argmax that the driver reads to build the next literal
    replace (the k-scalars-per-round pattern shared with dup_components /
    kmeans).  The vocab frame is eagerly checkpointed per round so the
    replace chain does not deepen the plan."""
    from .dedup import fan_out

    words = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq0 = F.concat(
        F.lit(" "), F.array_join(F.split("word", ""), " "), F.lit(" ")
    )
    cur = words.select("freq", seq0.alias("seq")).localCheckpoint(eager=True)
    merges = []
    for step in range(1, steps + 1):
        syms = F.split(F.trim("seq"), " ")
        pair_structs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.get(syms, i - 1).alias("lhs"), F.get(syms, i).alias("rhs")
            ),
        )
        guarded = F.when(F.size(syms) >= 2, pair_structs).otherwise(
            F.array().cast("array<struct<lhs:string,rhs:string>>")
        )
        top = (
            cur.select(F.explode(guarded).alias("p"), "freq")
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .first()
        )
        if top is None:  # empty corpus or no adjacent pairs left: done
            break
        merges.append((step, top.lhs, top.rhs, top.pair_count))
        cur = cur.select(
            "freq",
            F.replace(
                "seq",
                F.lit(f" {top.lhs} {top.rhs} "),
                F.lit(f" {top.lhs}{top.rhs} "),
            ).alias("seq"),
        ).localCheckpoint(eager=True)
    return docs.sparkSession.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count bigint"
    )


def bpe_encode(docs: DataFrame, steps: int = BPE_MERGE_STEPS) -> DataFrame:
    """Tokenizer APPLICATION: encode every document with the merges the
    bpe_merge_steps training loop just learned — the deploy half of the
    BPE story (train emits merges.txt; encode is what the 100 TB
    tokenization job actually runs per shard).

    Each word becomes its delimiter-padded symbol sequence and the learned
    merges replay IN TRAINING ORDER as literal string replaces (leftmost
    non-overlapping scan — identical semantics in Spark and DuckDB, see
    bpe_merge_steps); the encoded length is the post-merge symbol count.
    Emits per doc: base symbol count (chars sans spaces), encoded BPE
    token count, word count — the compression the learned merges buy.

    Scale shape: training runs once on the |vocab|-row frame (driver reads
    ``steps`` argmax scalars — the k-scalars-per-round pattern); encoding
    itself is embarrassingly parallel Catalyst — a per-row transform +
    aggregate over the words array with ZERO extra shuffles, exactly how a
    real tokenize pass maps over shards.  In production the merges would
    be a broadcast literal list, which is precisely what the driver-built
    replace chain is."""
    from .dedup import fan_out

    words_vocab = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq0 = F.concat(
        F.lit(" "), F.array_join(F.split("word", ""), " "), F.lit(" ")
    )
    cur = words_vocab.select("freq", seq0.alias("seq")).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _step in range(1, steps + 1):
        syms = F.split(F.trim("seq"), " ")
        pair_structs = F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.get(syms, i - 1).alias("lhs"), F.get(syms, i).alias("rhs")
            ),
        )
        guarded = F.when(F.size(syms) >= 2, pair_structs).otherwise(
            F.array().cast("array<struct<lhs:string,rhs:string>>")
        )
        top = (
            cur.select(F.explode(guarded).alias("p"), "freq")
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lhs", "rhs")
            .first()
        )
        if top is None:  # empty corpus or no adjacent pairs left: done
            break
        merges.append((top.lhs, top.rhs))
        cur = cur.select(
            "freq",
            F.replace(
                "seq",
                F.lit(f" {top.lhs} {top.rhs} "),
                F.lit(f" {top.lhs}{top.rhs} "),
            ).alias("seq"),
        ).localCheckpoint(eager=True)

    def encode_word(word):
        seq = F.concat(
            F.lit(" "), F.array_join(F.split(word, ""), " "), F.lit(" ")
        )
        for lhs, rhs in merges:
            seq = F.replace(
                seq, F.lit(f" {lhs} {rhs} "), F.lit(f" {lhs}{rhs} ")
            )
        return F.size(F.split(F.trim(seq), " "))

    doc_words = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    n_bpe = F.aggregate(
        F.transform(doc_words, encode_word),
        F.lit(0),
        lambda acc, n: acc + n,
    )
    n_base = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return docs.select(
        "doc_id",
        n_base.cast("bigint").alias("n_base_syms"),
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        F.size(doc_words).cast("bigint").alias("n_words"),
    )


def _bpe_iter_sql(i: int) -> str:
    """One unrolled BPE training iteration: pair counts p{i} over w{i-1},
    argmax t{i}, merged vocabulary w{i}."""
    prev = f"w{i - 1}"
    return f"""
p{i} AS (
  SELECT syms[CAST(k AS INT)] AS lhs, syms[CAST(k AS INT) + 1] AS rhs,
         CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM (
    SELECT freq, string_split(trim(seq), ' ') AS syms FROM {prev}
  ), LATERAL unnest(range(1, len(syms))) AS t(k)
  GROUP BY 1, 2
), t{i} AS (
  SELECT lhs, rhs, pair_count FROM p{i}
  ORDER BY pair_count DESC, lhs, rhs LIMIT 1
), w{i} AS (
  SELECT freq,
         replace(seq, ' ' || lhs || ' ' || rhs || ' ', ' ' || lhs || rhs || ' ')
           AS seq
  FROM {prev} CROSS JOIN t{i}
)"""


ORA_BPE_MERGE_STEPS = f"""
WITH words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
), w0 AS (
  SELECT freq,
         ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq
  FROM words
),{",".join(_bpe_iter_sql(i) for i in range(1, BPE_MERGE_STEPS + 1))}
{" UNION ALL ".join(
    f"SELECT {i} AS step, lhs, rhs, pair_count FROM t{i}"
    for i in range(1, BPE_MERGE_STEPS + 1)
)}
"""


def _ora_bpe_encode() -> str:
    seq = "' ' || array_to_string(string_split(word, ''), ' ') || ' '"
    for i in range(1, BPE_MERGE_STEPS + 1):
        seq = (
            f"replace({seq}, ' ' || (SELECT lhs FROM t{i}) || ' ' || "
            f"(SELECT rhs FROM t{i}) || ' ', ' ' || (SELECT lhs || rhs FROM t{i}) || ' ')"
        )
    iters = ",".join(_bpe_iter_sql(i) for i in range(1, BPE_MERGE_STEPS + 1))
    return f'''
WITH words AS (
  SELECT word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
), w0 AS (
  SELECT freq,
         ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq
  FROM words
),{iters},
encw AS (
  SELECT doc_id, CAST(len(string_split(trim({seq}), ' ')) AS BIGINT) AS n
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
)
SELECT d.doc_id,
       CAST(length(replace(d.text, ' ', '')) AS BIGINT) AS n_base_syms,
       CAST(COALESCE(SUM(e.n), 0) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_filter(string_split(d.text, ' '), w -> w <> '')) AS BIGINT)
         AS n_words
FROM documents d LEFT JOIN encw e ON d.doc_id = e.doc_id
GROUP BY d.doc_id, d.text
'''


ORA_BPE_ENCODE = _ora_bpe_encode()
