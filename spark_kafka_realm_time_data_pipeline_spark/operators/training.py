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

from .dedup import SHINGLE_B, SHINGLE_P, fan_out

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


def gram_key_pairs(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, gram_key) pairs: each word folded to an integer with the
    shared Rabin-Karp polynomial (one pass over its chars), then the n
    word-keys of each gram folded again with the same polynomial.

    Round-6 replacement for md5(array_join(slice(words, i, n))): the gram
    STRING (~60 bytes) is never materialized and no digest runs per gram —
    pure integer arithmetic end to end, replayed bit-for-bit by the DuckDB
    oracle (ORA_GRAM_KEY_CTES).  Word boundaries stay significant because
    words are hashed individually before the gram fold.  Overflow-safe in
    both engines: acc < P (2^42), acc*B + key < 2^62.1 + 2^42 < 2^63.

    MUST be a two-Project DataFrame op, not one nested expression: when the
    per-start lambda references the word-key transform as a subexpression,
    Catalyst re-evaluates the ENTIRE word-key array per start position —
    O(words^2) folds per doc (measured 2.2s -> 15.6s at sf0.1 before this
    split).  Materializing the array as a named column pins one evaluation
    per row; CollapseProject keeps multi-referenced non-cheap aliases."""
    docs = fan_out(docs)
    wk = F.transform(
        F.split("text", " "),
        lambda w: F.aggregate(
            F.transform(F.split(w, ""), lambda c: F.ascii(c)),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * SHINGLE_B + c) % SHINGLE_P,
        ),
    )
    grams = F.when(
        F.size("_wk") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_wk") - (n - 1)),
            lambda i: F.aggregate(
                F.slice(F.col("_wk"), i, F.lit(n)),
                F.lit(0).cast("long"),
                lambda acc, k: (acc * SHINGLE_B + k) % SHINGLE_P,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return docs.withColumn("_wk", wk).select(
        "doc_id", F.explode(grams).alias("gram_key")
    )


# DuckDB twin of _gram_keys, shared by the decontaminate and contamination
# oracles (format with the corpus CTE already in scope): words -> per-word
# polynomial keys -> per-start slice fold.
ORA_GRAM_KEY_CTES = f"""words AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           w -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                (acc, c) -> (acc * {SHINGLE_B} + c) % {SHINGLE_P})) AS wk
  FROM corpus
), grams_raw AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                                  list_slice(wk, CAST(i AS INT), CAST(i AS INT) + {NGRAM_N - 1})),
                     (acc, k) -> (acc * {SHINGLE_B} + k) % {SHINGLE_P}) AS gram_key
  FROM (SELECT doc_id, wk, unnest(range(1, len(wk) - {NGRAM_N - 2})) AS i FROM words)
)"""


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
    # shuffle an 8-byte integer gram key, not the 8-word string: the join
    # moves ~8 bytes/row instead of ~60, and the polynomial key
    # (gram_key_pairs) is engine-portable so the oracle replays it
    # bit-for-bit (collision odds at 42 bits are negligible and replayed
    # identically anyway)
    grams = gram_key_pairs(docs)
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
{ORA_GRAM_KEY_CTES},
bench AS (
  SELECT DISTINCT gram_key FROM grams_raw WHERE doc_id % {BENCH_MOD} = 0
)
SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram_key) AS BIGINT) AS n_contaminated
FROM grams_raw g JOIN bench b USING (gram_key)
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


# --- budget-capped mixture sampling ------------------------------------------

# Global doc budget as a fraction of the corpus (numerator/denominator so the
# per-source cap is exact integer arithmetic both engines replay).
MIX_BUDGET_NUM, MIX_BUDGET_DEN = 1, 2


def mixture_cap_sample(docs: DataFrame) -> DataFrame:
    """Budget-capped mixture sampling: flatten the source mixture toward
    uniform by giving every source the SAME doc budget (global budget B =
    corpus/2, cap = B div n_sources) and deterministically sampling each
    source down to its cap — the "no source dominates the mix" rebalance a
    pretraining data pipeline runs after computing ``domain_mix_weights``.
    Sources under the cap keep everything (no upsampling here; repetition
    policy is a separate knob).

    Sampling is EXACT to the budget, not rate-based: docs rank within
    their source by md5(doc_id) (uniform, engine-portable, reproducible)
    and the first ``cap`` win — so the output size is exactly
    sum(min(n_s, cap)), unlike threshold sampling whose size is binomial.

    Shape: one |sources|-row aggregate for the caps (map-side combine), a
    broadcast join back, and a row_number window partitioned by source.
    The window sorts each source's keys once — the same cost as writing
    the source's shard files, and the standard deterministic-reservoir
    shape.  At 100 TB a single mega-source makes that window the long
    pole; pre-shard it by the key's high bits and take per-shard
    sub-budgets (exactly ``epoch_shuffle``'s shard trick) if one source
    exceeds a worker's sort budget."""
    from pyspark.sql import Window

    key = F.md5(F.col("doc_id").cast("string").cast("binary"))
    keyed = docs.select("doc_id", "source", key.alias("k"))
    sizes = keyed.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    caps = sizes.select(
        "source",
        "n_docs",
        F.expr(
            f"(CAST({MIX_BUDGET_NUM} AS BIGINT) * sum(n_docs) OVER ()) "
            f"div ({MIX_BUDGET_DEN} * count(*) OVER ())"
        ).alias("cap"),
    )
    w = Window.partitionBy("source").orderBy("k", "doc_id")
    return (
        keyed.join(F.broadcast(caps), "source")
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= F.col("cap"))
        .select(
            "doc_id",
            "source",
            F.col("pick").cast("bigint").alias("pick"),
            F.col("cap").cast("bigint").alias("cap"),
        )
    )


ORA_MIXTURE_CAP_SAMPLE = f"""
WITH keyed AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents
), caps AS (
  SELECT source,
         CAST(({MIX_BUDGET_NUM} * SUM(COUNT(*)) OVER ())
              // ({MIX_BUDGET_DEN} * COUNT(*) OVER ()) AS BIGINT) AS cap
  FROM keyed GROUP BY source
), picked AS (
  SELECT k.doc_id, k.source,
         row_number() OVER (PARTITION BY k.source ORDER BY k.k, k.doc_id) AS pick,
         c.cap
  FROM keyed k JOIN caps c USING (source)
)
SELECT doc_id, source, CAST(pick AS BIGINT) AS pick, cap
FROM picked WHERE pick <= cap
"""


MAX_REPEAT_MILLI = 4000  # upsampling ceiling: no source repeats more than 4x


def mixture_repeat_plan(docs: DataFrame) -> DataFrame:
    """The UPSAMPLING side of mixture rebalancing: given a uniform
    per-source TOKEN budget (total div n_sources), compute each source's
    repeat factor — how many times its documents recur per epoch to fill
    its share — capped at 4x (repeating a small source more buys
    memorization, not balance; the residual share is left to the large
    sources).  `mixture_cap_sample` downsamples the over-represented
    sources; this plans the repetition of the under-represented ones —
    together they are the resample half of a DoReMi-style mix.

    All milli-exact integer arithmetic (1000 * share div n_tokens,
    capped), so the plan is engine-portable with zero float divisions.
    Shape: one map-side-combined groupBy(source) + window totals over the
    |sources|-row aggregate — nothing scales with corpus rows."""
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    share = F.expr("sum(n_tokens) OVER () div count(*) OVER ()")
    out = per.withColumn("share_tokens", share.cast("bigint"))
    repeat = F.least(
        F.expr("(1000 * share_tokens) div n_tokens"), F.lit(MAX_REPEAT_MILLI)
    )
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        "share_tokens",
        repeat.cast("bigint").alias("repeat_milli"),
        F.expr(
            f"(n_tokens * least((1000 * share_tokens) div n_tokens, {MAX_REPEAT_MILLI})) div 1000"
        ).cast("bigint").alias("effective_tokens"),
    )


ORA_MIXTURE_REPEAT_PLAN = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT source, n_docs, n_tokens,
         CAST(SUM(n_tokens) OVER () // COUNT(*) OVER () AS BIGINT) AS share_tokens
  FROM per
)
SELECT source, n_docs, n_tokens, share_tokens,
       CAST(least((1000 * share_tokens) // n_tokens, {MAX_REPEAT_MILLI}) AS BIGINT)
         AS repeat_milli,
       CAST((n_tokens * least((1000 * share_tokens) // n_tokens, {MAX_REPEAT_MILLI})) // 1000
            AS BIGINT) AS effective_tokens
FROM tot
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


# --- fill-in-the-middle transform --------------------------------------------

FIM_RATE_PCT = 50  # share of docs transformed (the public FIM paper's rate)
FIM_HASH_A = 2654435761  # Knuth multiplicative constant — split-point hash
FIM_HASH_P = 1000003


def fim_transform(docs: DataFrame) -> DataFrame:
    """Fill-in-the-middle (FIM) pretraining transform (Bavarian et al.
    2022, "Efficient Training of Language Models to Fill in the Middle"):
    each selected document is split at two points into (prefix, middle,
    suffix) and re-serialized in PSM sentinel order
    ``<PRE>prefix<SUF>suffix<MID>middle`` — the transform that teaches an
    autoregressive model to infill.  FIM_RATE_PCT of docs are transformed;
    the rest keep plain AR order, exactly the mixed regime the paper
    trains on.

    Everything is derived from integer hashes of doc_id — the transform
    is REPRODUCIBLE and shard-independent (no RNG state to coordinate
    across 1000 executors; re-running any shard yields the same bytes).
    A narrow row-local projection: zero shuffles, zero Python, and the
    identical arithmetic replays in the DuckDB oracle.

    Overflow discipline: doc_id is reduced mod the hash modulus BEFORE the
    Knuth multiply — value-identical for every doc_id by modular identity
    ((d mod P)*A ≡ d*A (mod P)) and keeps the product under
    (P-1)*A ≈ 2.7e15 < 2^63, so the arithmetic can never wrap in Spark
    nor raise in DuckDB (which errors on BIGINT overflow where Spark
    silently wraps) on any id a 100 TB corpus could hold.

    NULL-text assumption: `sample` concatenates sentinel literals with
    text slices, where Spark's concat returns NULL if ANY argument is
    NULL while DuckDB's skips NULLs — the corpus guard
    (tests/test_corpus_assumptions.py) asserts documents.text is never
    NULL, so the divergence is unreachable; on a nullable corpus add
    coalesce(text, '') before this transform."""
    L = F.length("text")
    did = F.pmod(F.col("doc_id"), F.lit(FIM_HASH_P))
    h1 = F.pmod(did * FIM_HASH_A + 97, F.lit(FIM_HASH_P))
    h2 = F.pmod(did * FIM_HASH_A + 31337, F.lit(FIM_HASH_P))
    c1 = F.pmod(h1, L + 1)
    c2 = F.pmod(h2, L + 1)
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    is_fim = F.pmod(F.pmod(F.col("doc_id"), F.lit(100)) * 31 + 7, F.lit(100)) < FIM_RATE_PCT
    prefix = F.expr("substring(text, 1, __lo)")
    middle = F.expr("substring(text, __lo + 1, __hi - __lo)")
    suffix = F.expr("substring(text, __hi + 1)")
    return (
        docs.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .select(
            "doc_id",
            is_fim.alias("is_fim"),
            F.when(
                is_fim,
                F.concat(
                    F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix,
                    F.lit("<MID>"), middle,
                ),
            )
            .otherwise(F.col("text"))
            .alias("sample"),
            F.when(is_fim, F.col("__lo")).otherwise(L).cast("long").alias("n_prefix"),
            F.when(is_fim, F.col("__hi") - F.col("__lo"))
            .otherwise(0)
            .cast("long")
            .alias("n_middle"),
            F.when(is_fim, L - F.col("__hi")).otherwise(0).cast("long").alias("n_suffix"),
        )
    )


ORA_FIM_TRANSFORM = f"""
WITH cuts AS (
  SELECT doc_id, text, length(text) AS L,
         (doc_id % {FIM_HASH_P} * {FIM_HASH_A} + 97) % {FIM_HASH_P}
           % (length(text) + 1) AS c1,
         (doc_id % {FIM_HASH_P} * {FIM_HASH_A} + 31337) % {FIM_HASH_P}
           % (length(text) + 1) AS c2,
         (doc_id % 100 * 31 + 7) % 100 < {FIM_RATE_PCT} AS is_fim
  FROM documents
), spans AS (
  SELECT doc_id, text, L, is_fim,
         least(c1, c2) AS lo, greatest(c1, c2) AS hi
  FROM cuts
)
SELECT doc_id, is_fim,
       CASE WHEN is_fim THEN concat('<PRE>', substring(text, 1, lo),
                                    '<SUF>', substring(text, hi + 1),
                                    '<MID>', substring(text, lo + 1, hi - lo))
            ELSE text END AS sample,
       CAST(CASE WHEN is_fim THEN lo ELSE L END AS BIGINT) AS n_prefix,
       CAST(CASE WHEN is_fim THEN hi - lo ELSE 0 END AS BIGINT) AS n_middle,
       CAST(CASE WHEN is_fim THEN L - hi ELSE 0 END AS BIGINT) AS n_suffix
FROM spans
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


EPOCH_SHARDS = 8


def epoch_shuffle(docs: DataFrame, epoch: int = 1) -> DataFrame:
    """Deterministic EPOCH SHUFFLE: assign every doc a reproducible
    (shard, position) for a given epoch by ordering on
    md5(epoch || doc_id) — the property a training job needs so any
    worker, any restart, and any reimplementation sees the identical data
    order, with a different but equally-uniform order per epoch.

    Shape: a narrow md5 projection, one hash partition by shard, and a
    row_number window per shard (each window sorts ~N/EPOCH_SHARDS keys
    — the per-shard file write a real run does anyway).  No global sort:
    the shard is the high nibble of the key, so position is only defined
    within a shard, exactly like sharded training data on disk."""
    from pyspark.sql import Window

    key = F.md5(
        F.concat(F.lit(f"epoch{epoch}:"), F.col("doc_id").cast("string")).cast(
            "binary"
        )
    )
    keyed = docs.select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars"), key.alias("k")
    ).withColumn(
        "shard", F.expr(f"CAST(conv(substring(k, 1, 8), 16, 10) AS BIGINT) % {EPOCH_SHARDS}")
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id",
        "n_chars",
        F.col("shard").cast("int").alias("shard"),
        F.row_number().over(w).alias("position"),
    )



# --- in-engine quality-model fitting -------------------------------------------

RIDGE_LAMBDA = 1  # integer L2 term; also guarantees det > 0 for any group


def _floor_div_expr(a: str, d: str) -> str:
    """Exact floor division for possibly-negative integer numerators as a
    SQL fragment over NAMED bigint columns: pmod is always non-negative,
    so (a - pmod(a, d)) divides exactly, and integral `div` on the exact
    multiple introduces no truncation-direction ambiguity.  Everything
    stays in bigint — no double roundtrip: `/` would evaluate as IEEE
    long/long -> double, which silently loses exactness once
    |numerator| exceeds 2^53 (~9.0e15; with the documented sf1 caps the
    milli numerators reach ~6e17)."""
    return f"(({a}) - pmod({a}, {d})) div ({d})"


def quality_linear_fit(docs: DataFrame) -> DataFrame:
    """Fit the per-language chars~tokens linear model IN the engine — the
    closed-form ridge least-squares fit that distributed ML systems
    reduce to at scale: ONE scan aggregates the integer sufficient
    statistics (n, Σx, Σx², Σt, Σxt) per group with map-side combine,
    then the 2x2 normal equations solve exactly per group via Cramer's
    rule.  The fitted slope is the chars-per-token rate (≈ avg word
    length + 1) each language's corpus should exhibit — the calibration
    statistic a quality/drift monitor compares fresh crawls against; the
    supervised sibling of text.quality_logit_score, which only SCORES
    with fixed weights.

    Determinism contract: features are integers (x = whitespace token
    count, t = char count), statistics are integer sums, λ = 1 joins the
    diagonal so det = (n+λ)(Σx²+λ) − (Σx)² > 0, and the reported
    slope/intercept are exact FLOOR milli-units via the pmod identity
    (a − pmod(a,d)) div d — integral division end-to-end, no IEEE
    division (or double roundtrip) anywhere, so the oracle replays the
    whole fit bit-for-bit at any magnitude the bigint range holds.

    100 TB posture: the scan is embarrassingly parallel and the shuffle
    carries one 5-long row per (partition, lang) after partial
    aggregation; the per-group solve is O(1).  Integer ranges hold
    through sf1 (numerators ≤ ~1e18 with these caps: tokens ≤ ~100/doc,
    chars ≤ ~600/doc, ≤ ~1e4 docs/lang); beyond that promote the final
    Cramer arithmetic to decimal(38,0) or solve driver-side from the
    (tiny) statistics table — the statistics stay bigint far longer."""
    return quality_fit_solve(quality_fit_stats(docs))


def quality_fit_stats(docs: DataFrame) -> DataFrame:
    """The MERGEABLE half of quality_linear_fit: one scan aggregates the
    integer sufficient statistics (lang, n_docs, Σx, Σx², Σt, Σxt) with
    map-side combine.  Because bigint addition is associative, partial
    stats rows from DISJOINT batches merge exactly (merge_fit_stats), so
    a multi-trigger stream accumulates per-batch rows and solves ONCE at
    the end — the split-safe formulation of the fit."""
    x = F.size(F.split("text", " ")).cast("long")
    t = F.length("text").cast("long")
    return (
        docs.select(F.col("lang"), x.alias("x"), t.alias("t"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum("t").alias("st"),
            F.sum(F.col("x") * F.col("t")).alias("sxt"),
        )
    )


def merge_fit_stats(parts: DataFrame) -> DataFrame:
    """Merge per-batch sufficient-statistic rows (the quality_fit_stats
    schema) into corpus totals: integer sums of sums, exact at any split
    of the input into batches.  k_langs × n_batches tiny rows in, k_langs
    rows out — driver-free and shuffle-bounded by the language count."""
    return parts.groupBy("lang").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sx").cast("long").alias("sx"),
        F.sum("sxx").cast("long").alias("sxx"),
        F.sum("st").cast("long").alias("st"),
        F.sum("sxt").cast("long").alias("sxt"),
    )


def quality_fit_solve(stats: DataFrame) -> DataFrame:
    """The per-group 2×2 Cramer solve over a sufficient-statistics frame
    (see quality_linear_fit for the determinism contract): O(1) integer
    arithmetic per language, exact FLOOR milli-units via the pmod
    identity, no IEEE division anywhere."""
    lam = F.lit(RIDGE_LAMBDA).cast("long")
    det = (F.col("n_docs") + lam) * (F.col("sxx") + lam) - F.col("sx") * F.col("sx")
    slope_num = (F.col("n_docs") + lam) * F.col("sxt") - F.col("sx") * F.col("st")
    icept_num = (F.col("sxx") + lam) * F.col("st") - F.col("sx") * F.col("sxt")
    solved = stats.select(
        "lang",
        "n_docs",
        "sx",
        "sxx",
        "st",
        "sxt",
        det.cast("long").alias("det"),
        (F.lit(1000).cast("long") * slope_num).alias("_slope_num_m"),
        (F.lit(1000).cast("long") * icept_num).alias("_icept_num_m"),
    )
    return solved.select(
        "lang",
        "n_docs",
        "sx",
        "sxx",
        "st",
        "sxt",
        "det",
        F.expr(_floor_div_expr("_slope_num_m", "det"))
        .cast("long")
        .alias("slope_milli"),
        F.expr(_floor_div_expr("_icept_num_m", "det"))
        .cast("long")
        .alias("icept_milli"),
    )


def ora_linear_fit(src: str) -> str:
    """The whole ridge fit as a SQL SELECT parametrized over its source
    relation — same statistics, same Cramer numerators, same pmod floor-
    division identity ((a - ((a % d) + d) % d) // d, INTEGER division on
    an exact multiple — `//` keeps the arithmetic in bigint exactly as
    Spark's `div` does, where `/` would roundtrip through double and
    diverge past 2^53).  Shared by ORA_QUALITY_LINEAR_FIT
    (src='documents') and the drift monitor's base/fresh arms."""
    return f"""WITH stats AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x*x) AS BIGINT) AS sxx,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(x*t) AS BIGINT) AS sxt
  FROM (
    SELECT lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
           CAST(length(text) AS BIGINT) AS t
    FROM {src}
  )
  GROUP BY lang
),
solved AS (
  SELECT *,
         (n_docs + {RIDGE_LAMBDA}) * (sxx + {RIDGE_LAMBDA}) - sx * sx AS det,
         (n_docs + {RIDGE_LAMBDA}) * sxt - sx * st AS slope_num,
         (sxx + {RIDGE_LAMBDA}) * st - sx * sxt AS icept_num
  FROM stats
)
SELECT lang, n_docs, sx, sxx, st, sxt,
       CAST(det AS BIGINT) AS det,
       CAST((1000 * slope_num - (((1000 * slope_num) % det) + det) % det) // det AS BIGINT) AS slope_milli,
       CAST((1000 * icept_num - (((1000 * icept_num) % det) + det) % det) // det AS BIGINT) AS icept_milli
FROM solved"""


# DuckDB twin of quality_linear_fit over the raw documents table.
ORA_QUALITY_LINEAR_FIT = f"""
{ora_linear_fit("documents")}
"""


DRIFT_TOL_MILLI = 150  # |fresh slope - base slope| beyond this flags the lang


def quality_fit_drift(
    base_fit: DataFrame, fresh: DataFrame, tol_milli: int = DRIFT_TOL_MILLI
) -> DataFrame:
    """The monitor that completes the in-engine trainer: re-fit the
    chars~tokens model on a FRESH batch of documents and compare each
    language's slope against the STAGED base fit — the calibration-drift
    check a crawl pipeline runs per ingest batch ("did this batch's
    text-shape statistics move?").  A drifted slope means the batch's
    chars-per-token relation changed (tokenizer damage, markup leak,
    language mislabel), which is exactly the regression a fixed quality
    threshold would silently absorb.

    ``base_fit`` is the (staged, k-row) output of ``quality_linear_fit``
    on the corpus; it rides a broadcast onto the fresh batch's fit, so
    the monitor's only corpus-scale work is the fresh batch's one-scan
    sufficient statistics.  Drift is an exact integer milli-unit
    difference — the oracle replays both fits and the comparison.

    The join is LEFT from the fresh fit: a language present only in the
    fresh batch — a mislabel or a brand-new language, the strongest
    drift signal there is — surfaces as a row with NULL base columns and
    ``drifted`` forced true, instead of silently vanishing the way an
    inner join would drop it."""
    return quality_fit_drift_from_stats(
        base_fit, quality_fit_stats(fresh), tol_milli
    )


def quality_fit_drift_from_stats(
    base_fit: DataFrame,
    fresh_stats: DataFrame,
    tol_milli: int = DRIFT_TOL_MILLI,
) -> DataFrame:
    """quality_fit_drift over PRE-AGGREGATED sufficient statistics (the
    quality_fit_stats schema) — the split-safe entry point a multi-
    trigger stream uses: accumulate per-batch stats rows, merge with
    merge_fit_stats, solve and compare ONCE here.  Value-identical to
    quality_fit_drift on the concatenation of the batches, whatever the
    split, because the statistics are exact integer sums."""
    fresh_fit = quality_fit_solve(fresh_stats).select(
        "lang",
        F.col("n_docs").alias("n_fresh"),
        F.col("slope_milli").alias("fresh_slope_milli"),
        F.col("icept_milli").alias("fresh_icept_milli"),
    )
    base = base_fit.select(
        "lang",
        F.col("slope_milli").alias("base_slope_milli"),
        F.col("icept_milli").alias("base_icept_milli"),
    )
    drift = F.abs(F.col("fresh_slope_milli") - F.col("base_slope_milli"))
    return (
        fresh_fit.join(F.broadcast(base), "lang", "left")
        .select(
            "lang",
            "n_fresh",
            "base_slope_milli",
            "fresh_slope_milli",
            drift.cast("long").alias("slope_drift_milli"),
            F.when(F.col("base_slope_milli").isNull(), F.lit(True))
            .otherwise(drift > tol_milli)
            .alias("drifted"),
        )
    )
