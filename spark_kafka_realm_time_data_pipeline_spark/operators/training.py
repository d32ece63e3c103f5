"""Training-data-curation operators beyond the reference's surface: the ops
a 100 TB LLM pre-training pipeline runs between raw corpus and tokenized
shards.  All Catalyst-native (string/array/higher-order functions + window
aggregates) — zero Python on executors, and every oracle replays the exact
arithmetic (integer div/mod, IEEE double ops, md5 hex) so results are
hash-identical in DuckDB.

Operators:
- benchmark n-gram decontamination (the eval-leakage scrub every published
  pretraining run documents): word 8-gram equi-join against a held-out set;
- deterministic stratified sampling: md5-keyed per-language rates — stable
  across reruns and engines, unlike Bernoulli rand() sampling;
- sequence packing (concat-and-chunk): per-source cumulative token count
  div budget — the standard "concatenate then split every N tokens" shape;
- corpus length histogram: width-bucketed doc-length profile;
- int8 embedding quantization: per-vector max-abs scale + floor quantize.

100 TB posture notes are on each function; none of these ops collects to
the driver, and the only shuffles are the ngram-join/groupBys themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# --- decontamination ---------------------------------------------------------

NGRAM_N = 8  # word n-gram width; published scrubs use 8-13
BENCH_MOD = 97  # synthetic "benchmark" membership: doc_id % 97 == 0


def _word_ngrams(text_col: str = "text", n: int = NGRAM_N) -> Column:
    """Space-joined word n-grams as an array<string>; empty for short docs.
    (Spark's sequence(1, k) is DESCENDING for k < 1, so the short-doc case
    must be guarded explicitly — unlike DuckDB's range(), which is empty.)"""
    words = F.split(text_col, " ")
    starts = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(words, i, n), " "))
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_decontaminate(docs: DataFrame) -> DataFrame:
    """Flag training docs sharing any word 8-gram with the benchmark set
    (docs with doc_id % BENCH_MOD == 0 stand in for MMLU/GSM8K/etc).

    Shape: explode raw (doc_id, gram_key) pairs, distinct ONLY the (small)
    benchmark side, equi-join on the gram key, then countDistinct per doc.
    The per-pair dedup runs over the matched sliver (~1% of grams) inside
    the final groupBy instead of globally before the join — that global
    distinct was a second full-corpus shuffle and 40% of the whole bench.
    At 100 TB the benchmark side is a *fixed-size* eval suite (a few MB of
    grams): its distinct is a bounded shuffle, and AQE converts the join to
    broadcast at runtime once the bench stage's size is known (no static
    hint here because this synthetic benchmark grows with SF).  The
    training-side explode feeds ONE shuffle — the join — and the explode
    itself is a narrow map.
    """
    # shuffle the 60-bit md5-derived gram key, not the 8-word string: the
    # join moves ~8 bytes/row instead of ~60, and the hash is
    # engine-portable so the oracle replays it bit-for-bit (collision odds
    # at 60 bits are negligible and replayed identically anyway)
    gram_key = F.conv(F.substring(F.md5(F.col("ngram").cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )
    grams = docs.select("doc_id", F.explode(_word_ngrams()).alias("ngram")).select(
        "doc_id", gram_key.alias("gram_key")
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = grams.filter(is_bench).select("gram_key").distinct()
    train = grams.filter(~is_bench)
    return (
        train.join(bench, "gram_key")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram_key").alias("n_contaminated"))
    )


# Registered query runs over the dedup module's planted corpus (exact +
# near copies), which guarantees cross-boundary 8-gram overlap at every SF —
# the raw random-word corpus shares almost no true 8-grams by chance.
ORA_NGRAM_DECONTAMINATE = f"""
WITH {{corpus_cte}}
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
), starts AS (
  SELECT doc_id, w, unnest(range(1, len(w) - {NGRAM_N - 2})) AS i FROM words
), grams AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(
           array_to_string(list_slice(w, CAST(i AS INT), CAST(i AS INT) + {NGRAM_N - 1}), ' ')
         ), 1, 15)) AS BIGINT) AS gram_key
  FROM starts
), bench AS (
  SELECT DISTINCT gram_key FROM grams WHERE doc_id % {BENCH_MOD} = 0
)
SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram_key) AS BIGINT) AS n_contaminated
FROM grams g JOIN bench b USING (gram_key)
WHERE g.doc_id % {BENCH_MOD} <> 0
GROUP BY g.doc_id
"""


# --- deterministic stratified sampling --------------------------------------

# per-language keep rate in sixteenths: keep iff first md5 hex char of the
# doc key is lexicographically below the threshold char.  en is downsampled
# hardest (most abundant), tail languages kept at higher rates — the usual
# rebalancing direction.
STRATA_RATES: dict[str, str] = {"en": "4", "es": "8", "fr": "8", "de": "c", "zh": "c"}
DEFAULT_RATE = "8"


def _sample_key() -> Column:
    return F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic per-language downsampling: md5(doc_id) is a stable,
    engine-portable uniform key, so the sample is reproducible across
    reruns, partitionings, and engines — Bernoulli rand() sampling is none
    of those.  Pure narrow map + filter: zero shuffles at any scale."""
    thresh = F.lit(DEFAULT_RATE)
    for lang, rate in STRATA_RATES.items():
        thresh = F.when(F.col("lang") == lang, F.lit(rate)).otherwise(thresh)
    return docs.select(
        "doc_id", "lang", "source", _sample_key().alias("sample_key")
    ).filter(F.col("sample_key") < thresh)


def _ora_strata_case() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN '{rate}'" for lang, rate in STRATA_RATES.items()
    )
    return f"CASE lang {whens} ELSE '{DEFAULT_RATE}' END"


ORA_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS sample_key
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < {_ora_strata_case()}
"""


# --- sequence packing --------------------------------------------------------

PACK_BUDGET = 512  # tokens per packed training sequence


def pack_sequences(docs: DataFrame) -> DataFrame:
    """Concat-and-chunk packing: within each source shard, docs are laid out
    in doc_id order and cut every PACK_BUDGET whitespace tokens — each doc
    gets its sequence id and offset.  (Docs straddle chunk boundaries, as in
    standard pretraining packing.)

    Scale shape: ONE shuffle, partitioned by source — a global ordering
    would serialize 100 TB through one task; per-shard packing is what real
    pipelines do (pack within file/shard, shards are independent)."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
        .withColumn("cum_excl", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr(f"cum_excl div {PACK_BUDGET}").alias("seq_id"),
            (F.col("cum_excl") % PACK_BUDGET).alias("seq_offset"),
        )
    )


ORA_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_tokens AS cum_excl
  FROM t
)
SELECT doc_id, source, n_tokens,
       cum_excl // {PACK_BUDGET} AS seq_id,
       cum_excl % {PACK_BUDGET} AS seq_offset
FROM c
"""


# --- corpus profile ----------------------------------------------------------

HIST_BUCKET = 100  # chars per histogram bucket


def length_histogram(docs: DataFrame) -> DataFrame:
    """Doc-length profile: width-bucketed histogram over n_chars — the
    first thing a curation run looks at.  Map-side combine makes this one
    tiny shuffle (bucket cardinality, not row count)."""
    return (
        docs.withColumn("bucket", F.expr(f"n_chars div {HIST_BUCKET}"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


ORA_LENGTH_HISTOGRAM = f"""
SELECT n_chars // {HIST_BUCKET} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY 1
"""


# --- embedding quantization --------------------------------------------------

Q_LEVELS = 127


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x|, q_i =
    floor(x_i / scale * 127).  Emits scalar summaries (min/max/sum of the
    quantized vector) rather than the array itself so the oracle compare is
    rendering-independent; the full quantized array is the same transform
    without the final aggregates.

    Narrow map, zero shuffles; float->double widening and the /,* ordering
    are IEEE-identical in DuckDB, so even this float path is hash-exact."""
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    scaled = embeddings.withColumn("scale", F.array_max(F.transform(emb_d, F.abs)))
    q = F.transform(
        emb_d, lambda x: F.floor(x / F.col("scale") * Q_LEVELS)
    )
    zero = F.lit(0).cast("long")
    guard = F.col("scale") == 0.0
    return scaled.select(
        "vec_id",
        "scale",
        F.when(guard, zero).otherwise(F.array_min(q)).alias("q_min"),
        F.when(guard, zero).otherwise(F.array_max(q)).alias("q_max"),
        F.when(guard, zero)
        .otherwise(F.aggregate(q, zero, lambda acc, x: acc + x))
        .alias("q_sum"),
    )


ORA_QUANTIZE_EMBEDDINGS = f"""
WITH s AS (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, scale,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) / scale * {Q_LEVELS}) AS BIGINT)) AS qv
  FROM s
)
SELECT vec_id, scale,
       CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) ELSE list_aggregate(qv, 'min') END AS q_min,
       CASE WHEN scale = 0 THEN CAST(0 AS BIGINT) ELSE list_aggregate(qv, 'max') END AS q_max,
       CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
            ELSE list_reduce(list_prepend(CAST(0 AS BIGINT), qv), (acc, x) -> acc + x)
       END AS q_sum
FROM q
"""
