"""Text-analysis operators for LLM data pipelines: quality stats, token
counting, language-ID heuristic, document fingerprinting.

All Catalyst-native (string/array/higher-order functions) — no Python on
executors; every op is a narrow map over the documents scan, so it scales
embarrassingly (zero shuffles)."""

from __future__ import annotations

import string as _string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and")

# Character-class literals for translate()-based counting (a codegen'd
# char-map delete — identical counts to a [0-9]/[^a-zA-Z0-9 ] regex on the
# ASCII-guarded corpus, ~30x cheaper than regexp_count at the 10x corpus).
DIGIT_CHARS = _string.digits
ALNUM_SPACE_CHARS = _string.ascii_letters + _string.digits + " "

# tiny marker lists per language for the n-gram/stopword-vote heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "zh": ("de", "shi", "le"),
}

FP_MOD = 1_000_000_007


def _toks(col: str = "text") -> Column:
    return F.split(col, " ")


def quality_stats(docs: DataFrame) -> DataFrame:
    toks = _toks()
    n_words = F.size(toks)
    compact_len = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    stop_list = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_list, t)))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_distinct_words"),
        (compact_len.cast("double") / n_words.cast("double")).alias("avg_word_len"),
        (n_stop.cast("double") / n_words.cast("double")).alias("stopword_ratio"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count (alpha runs, digit
    runs, and any residual non-space char each count as one token)."""
    return docs.select(
        "doc_id",
        F.size(_toks()).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).alias("re_tokens"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias(
            "n_spaces"
        ),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-vote language ID: count marker-token hits per language, pick
    the argmax (lexicographically-first language on ties). Deterministic and
    SQL-expressible — the mechanism of a real n-gram langid at toy size."""
    toks = _toks()
    scores = []
    for lang in sorted(LANG_MARKERS):
        marker_arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))).alias(
                f"score_{lang}"
            )
        )
    scored = docs.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best.alias("detected_lang"),
        best_score.alias("marker_hits"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-doc repetition ratio (top word frequency / total words) — the
    Gopher/C4-style repetition quality signal.  Pure integer counting plus
    one final IEEE division, so it is hash-exact across engines with no
    rounding tricks.  Argmax tie-breaks on the word itself (max_by over a
    (count, word) struct) for determinism.

    Two shuffles: (doc_id, word) count with map-side combine, then the
    per-doc argmax — both keyed aggregations, no windows over raw rows."""
    counts = (
        docs.select("doc_id", F.explode(_toks()).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.max_by("word", F.struct(F.col("cnt"), F.col("word"))).alias("top_word"),
            F.max("cnt").alias("top_count"),
            F.sum("cnt").alias("n_words"),
        )
        .select(
            "doc_id",
            "top_word",
            "top_count",
            "n_words",
            (F.col("top_count").cast("double") / F.col("n_words").cast("double")).alias(
                "repetition_ratio"
            ),
        )
    )


ORA_REPETITION = """
WITH counts AS (
  SELECT doc_id, word, COUNT(*) AS cnt FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ) GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, word, cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, word DESC) AS rn,
         CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_words
  FROM counts
)
SELECT doc_id, word AS top_word, cnt AS top_count, n_words,
       CAST(cnt AS DOUBLE) / CAST(n_words AS DOUBLE) AS repetition_ratio
FROM ranked WHERE rn = 1
"""


def pii_redact(df: DataFrame, col: str, key_col: str) -> DataFrame:
    """PII scrubbing pass (training-data hygiene): mask numeric identifier
    runs with a placeholder, count the characters redacted, and derive a
    stable pseudonymous id (md5 prefix) so downstream joins still work
    after the raw identifier is gone.

    A narrow map — zero shuffles, zero Python; regexp_replace/md5 are
    codegen'd JVM expressions, so this runs at full scan speed on 100 TB."""
    digits = F.length(col) - F.length(F.regexp_replace(col, "[0-9]", ""))
    return df.select(
        key_col,
        F.regexp_replace(col, "[0-9]+", "<ID>").alias("redacted"),
        digits.cast("bigint").alias("digits_redacted"),
        F.substring(F.md5(F.col(col)), 1, 8).alias("pseudo_id"),
    )


# Dialect-portable PII patterns (identical semantics in Java regex and
# DuckDB's RE2: ASCII classes, \b word boundaries, bounded quantifiers —
# no lookaround, no unicode classes).  Order of redaction matters and is
# fixed: EMAIL first (an email contains digit runs a later pass would
# otherwise shred), then IP, then PHONE, then bare digit-run IDs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Phone shapes: 4-group (NN[N]-NNN-NNN-NNNN) and the common 3-group
# NANP form (NNN-NNN-NNNN) via an optional middle group — (?:...) is
# supported identically by Java regex and RE2.  Unseparated 10-digit
# numbers are intentionally left to the <ID> pass: with no separator
# there is no phone-vs-identifier signal, and the digits are masked
# either way (only the placeholder type differs).
PII_PHONE_RE = r"\b\d{2,3}[- ]\d{3}[- ](?:\d{3}[- ])?\d{4}\b"
PII_ID_RE = r"[0-9]+"


def pii_redact_v2(df: DataFrame, col: str, key_col: str) -> DataFrame:
    """Broadened PII scrub (training-data hygiene): mask emails, IPv4
    addresses, phone numbers, and remaining numeric-identifier runs with
    typed placeholders, count each category's occurrences (counted on the
    ORIGINAL text, each with its own pattern), and keep the stable md5
    pseudonym so downstream joins survive redaction.

    Same scale shape as pii_redact: one narrow codegen'd projection —
    regexp_replace/regexp_extract_all/md5 are JVM expressions, zero
    shuffles, zero Python — so the pass runs at scan speed on 100 TB.
    The patterns are deliberately RE2-compatible so the DuckDB oracle
    replays them byte-for-byte."""
    c = F.col(col)

    def n_matches(pat: str):
        return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast("bigint")

    red = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IP_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    red = F.regexp_replace(red, PII_ID_RE, "<ID>")
    return df.select(
        key_col,
        red.alias("redacted"),
        n_matches(PII_EMAIL_RE).alias("n_emails"),
        n_matches(PII_IP_RE).alias("n_ips"),
        n_matches(PII_PHONE_RE).alias("n_phones"),
        (F.length(c) - F.length(F.regexp_replace(c, "[0-9]", "")))
        .cast("bigint")
        .alias("digits_seen"),
        F.substring(F.md5(c), 1, 8).alias("pseudo_id"),
    )


def heavy_hitters(docs: DataFrame, k: int = 20) -> DataFrame:
    """Corpus vocabulary heavy hitters: explode -> two-phase hash aggregate
    -> deterministic global top-k (count desc, word asc).

    Scale shape: map-side combine collapses each partition to its local
    vocabulary before the shuffle, so shuffle volume is bounded by |vocab|,
    not corpus size; the final top-k sorts only the aggregated vocabulary
    (TakeOrderedAndProject — no global sort of raw tokens).

    Deliberately NOT fan_out'd: the per-row work here is one split+explode
    feeding a partial aggregate, far too light to repay the fan-out's
    partition probe + compact-row shuffle (A/B at sf0.1: plain 0.28 s,
    width-4 fan-out 0.38 s, session-width fan-out 0.59 s — the r7
    regression).  fan_out stays on the operators whose per-row work is
    genuinely wide (MinHash signatures, n-gram shingling, codec passes),
    where seconds of compute amortize its fixed cost."""
    return (
        docs.select(F.explode(_toks()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(k)
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling polynomial hash over the token stream:
    acc = (acc*31 + len(tok) + (ascii(first_char)-96)*131) mod 1e9+7.
    A deterministic left fold — the oracle replays it with list_reduce."""
    tok_vals = F.transform(
        _toks(),
        lambda t: F.length(t) + (F.ascii(F.substring(t, 1, 1)) - 96) * 131,
    )
    fp = F.aggregate(
        tok_vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k most characteristic terms per document by tf-idf with a
    rational (BM25-style) idf: score = tf * (2N - 2df + 1) / (2df + 1).

    The rational idf is deliberate: every factor is an exact integer (tf,
    doc count N, doc frequency df), so the score is ONE IEEE double
    division of exact integers — bit-identical in Spark and DuckDB, where
    ln()-based idf would differ in the last ulp across libm
    implementations and silently flip ranks on near-ties.  Ties break on
    (score DESC, term ASC), so the top-k set is fully deterministic.

    Scale shape: tf is one groupBy(doc_id, term) with map-side combine;
    df is one groupBy(term) over the (already aggregated) tf frame; N is
    a broadcast scalar; ranking is a window over per-doc groups, bounded
    by WindowGroupLimit pushdown, never a global sort of the corpus."""
    from pyspark.sql import Window

    from .dedup import fan_out

    docs = fan_out(docs)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    # tf feeds both the score join and the df_ aggregate as two subtrees
    # of one plan; a tf checkpoint was MEASURED r11 and rejected (1.52s ->
    # 1.61s): materializing the doc x term frame costs as much as the one
    # cheap re-aggregate it would save (PLANS.md checkpoint-barrier rule —
    # contrast bm25_term_scores, where the same pin kills 3 extra
    # tokenize passes and wins 25%).
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                (F.col("tf") * (2 * F.col("n_docs") - 2 * F.col("df") + 1)).cast(
                    "double"
                )
                / (2 * F.col("df") + 1).cast("double")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "score", "rank")
    )


# BM25 parameters (standard Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_term_scores(docs: DataFrame, query_doc_id: int = 17) -> DataFrame:
    """Per-(doc, term) BM25 contributions for the terms of one query doc —
    the scoring kernel of lexical retrieval over the corpus.

    Deliberately emits per-TERM rows instead of the per-doc sum: summing
    double contributions is shuffle-order-dependent, which would break
    hash parity with the oracle; every emitted score is instead a FIXED
    expression dag over exact integers (tf, df, dl, N, total_len), so both
    engines evaluate bit-identical IEEE doubles.  The idf is the rational
    BM25 form (N - df + 0.5)/(df + 0.5) written as integer halves.

    Scale shape: one tf groupBy (map-side combine), df over the aggregated
    frame, doc lengths from the same pass, query terms broadcast (a query
    is a handful of terms), ranking bounded per doc."""
    from .dedup import fan_out

    docs = fan_out(docs)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    # One tokenize, period: tf / df_ / dl / totals previously sat as four
    # subtrees of ONE plan, each re-running the explode (no ReusedExchange).
    # tf is checkpointed once (shuffle-sized executor blocks), df_ reads it,
    # and dl is derived ALGEBRAICALLY from it — sum(tf) per doc IS the
    # token count — so the exploded frame is never aggregated a second
    # time.  Serial linear pipeline: the eager barrier costs nothing
    # (PLANS.md r11 checkpoint-barrier rule).
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    qterms = (
        toks.filter(F.col("doc_id") == query_doc_id).select("term").distinct()
    )
    # idf = (2N - 2df + 1)/(2df + 1); tf-norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    idf = (2 * F.col("n_docs") - 2 * F.col("df") + 1).cast("double") / (
        2 * F.col("df") + 1
    ).cast("double")
    tfnorm = (F.col("tf").cast("double") * (BM25_K1 + 1)) / (
        F.col("tf").cast("double")
        + BM25_K1 * (1 - BM25_B + BM25_B * (F.col("dl").cast("double") / avgdl))
    )
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .filter(F.col("doc_id") != query_doc_id)
        .select("doc_id", "term", (idf * tfnorm).alias("bm25"))
    )


# Count-Min sketch geometry: depth 4 (independent Carter-Wegman rows), width
# 256 counters per row.
CMS_DEPTH = 4
CMS_WIDTH = 256


def countmin_sketch(docs: DataFrame) -> DataFrame:
    """Count-Min sketch of the corpus token-frequency stream: (row_id, col,
    cnt) — the mergeable sketch a 100 TB pipeline maintains instead of an
    exact vocabulary count when only approximate frequencies are needed.

    Each token occurrence increments one counter per row; row r's column is
    the Carter-Wegman map ``(a + r*(2b+1)) % P % width`` over the token's
    polynomial key (a, b residues mod two distinct primes — the same family
    the MinHash signatures use).  The sketch IS a groupBy count, so Spark
    gives the mergeability for free: partial sketches combine map-side and
    the shuffle carries at most depth*width rows per task.  Every counter
    is exact integer arithmetic, so the DuckDB oracle reproduces the sketch
    cell-for-cell — the estimate's correctness (min over rows >= true
    count) is then a mathematical consequence, not a sampled claim."""
    from .dedup import MINHASH_PRIME, MINHASH_PRIME_B, SHINGLE_B, SHINGLE_P, fan_out

    word_key = F.aggregate(
        F.transform(F.split(F.col("tok"), ""), lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * SHINGLE_B + c) % SHINGLE_P,
    )
    toks = (
        fan_out(docs).select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .withColumn("wk", word_key)
        .select(
            (F.col("wk") % MINHASH_PRIME).alias("a"),
            (F.col("wk") % MINHASH_PRIME_B).alias("b"),
        )
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row_id"),
                    (
                        (F.col("a") + r * (F.col("b") * 2 + 1)) % MINHASH_PRIME
                        % CMS_WIDTH
                    ).alias("col"),
                )
                for r in range(CMS_DEPTH)
            ]
        )
    )
    return (
        toks.select(rows.alias("rc"))
        .select("rc.row_id", "rc.col")
        .groupBy("row_id", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# HyperLogLog geometry: 2^8 registers over the 42-bit polynomial key space.
HLL_P = 8
HLL_SUFFIX_BITS = 34  # 42-bit key minus the 8 bucket bits


def hll_registers(docs: DataFrame) -> DataFrame:
    """HyperLogLog register table over the corpus vocabulary: (bucket,
    register) where register = max over keys of (leading zeros of the
    34-bit key suffix + 1).

    The portable, value-exact complement to the built-in
    ``approx_count_distinct`` (whose sketch is engine-specific and can only
    be rows-only checked): every register is exact integer arithmetic —
    the leading-zero count comes from length(bin(w)), identical in Spark
    and DuckDB — so the oracle reproduces the sketch register-for-register.
    Max is idempotent, so no distinct pass is needed, partials combine
    map-side, and the shuffle carries at most 2^p rows per task.  The
    cardinality estimate is the standard harmonic mean over these
    registers — derivable from this table in either engine."""
    from .dedup import SHINGLE_B, SHINGLE_P, fan_out

    word_key = F.aggregate(
        F.transform(F.split(F.col("tok"), ""), lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * SHINGLE_B + c) % SHINGLE_P,
    )
    n_buckets = 1 << HLL_P
    keyed = (
        fan_out(docs).select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(word_key.alias("wk"))
        .select(
            (F.col("wk") % n_buckets).alias("bucket"),
            F.expr(f"wk div {n_buckets}").alias("w"),
        )
    )
    rank = F.when(F.col("w") == 0, F.lit(HLL_SUFFIX_BITS + 1)).otherwise(
        HLL_SUFFIX_BITS + 1 - F.length(F.bin("w"))
    )
    return (
        keyed.select("bucket", rank.alias("rank"))
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )


DRIFT_BUCKET_WIDTH = 100


def length_drift_report(docs: DataFrame) -> DataFrame:
    """Per-source length-distribution drift report: for every (source,
    length-bucket) cell, the observed doc count, the count expected if the
    source followed the corpus-wide length distribution, and the cell's
    chi-square contribution — the monitoring table a pipeline inspects
    when one ingest source starts shipping truncated or padded documents.

    Every input to the float math is an exact integer (cell count, bucket
    total, source total, grand total), and expected / chi2 are a fixed
    IEEE dag over them — bit-identical across engines, no sampling.
    Shape: three map-side-combined groupBys over the same narrow
    projection plus broadcast-size joins (|sources| x |buckets| cells);
    nothing scales with corpus size after the first aggregation."""
    cells = docs.select(
        "source",
        (F.floor(F.col("n_chars") / DRIFT_BUCKET_WIDTH) * DRIFT_BUCKET_WIDTH)
        .cast("long")
        .alias("bucket"),
    )
    obs = cells.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("n"))
    bucket_tot = cells.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    source_tot = cells.groupBy("source").agg(F.count(F.lit(1)).alias("source_n"))
    grand = cells.agg(F.count(F.lit(1)).alias("grand_n"))
    expected = (
        F.col("bucket_n").cast("double")
        * F.col("source_n").cast("double")
        / F.col("grand_n").cast("double")
    )
    return (
        obs.join(bucket_tot, "bucket")
        .join(F.broadcast(source_tot), "source")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "bucket",
            "n",
            expected.alias("expected"),
            (
                (F.col("n").cast("double") - expected)
                * (F.col("n").cast("double") - expected)
                / expected
            ).alias("chi2_term"),
        )
    )


# --- sliding-window HLL merge -------------------------------------------------

HLL_WIN_DAYS = 7
HLL_USER_MULT = 2654435761  # Knuth multiplicative hash constant


def hll_window_merge(events: DataFrame) -> DataFrame:
    """Daily HyperLogLog register tables over ``user_id`` merged across a
    7-day sliding window — the trailing-week-uniques dashboard query, and
    the demonstration of WHY sketches win at 100 TB: a day's users compress
    to 2^p registers, and the week-over-day merge is a max over those
    registers instead of a re-scan of seven days of raw events.

    Register-exact like ``hll_registers``: the 42-bit key is one modular
    multiply, the rank comes from length(bin(w)), and the merge is an
    idempotent MAX — so the DuckDB oracle replays every register.  Shape:
    ONE corpus-bounded shuffle (day × bucket groupBy with map-side max
    combine, <= 2^p rows per day after it); the dense day-grid crossJoin,
    the RANGE window, and the final per-day rollup all run on that
    sketch-sized table.  Missing calendar days contribute nothing and the
    RANGE (not ROWS) frame keeps the window honest across gaps."""
    from .dedup import SHINGLE_P

    n_buckets = 1 << HLL_P
    wk = F.pmod(F.col("user_id").cast("long") * HLL_USER_MULT, F.lit(SHINGLE_P))
    keyed = events.select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_num"),
        wk.alias("wk"),
    ).select(
        "day_num",
        (F.col("wk") % n_buckets).alias("bucket"),
        F.expr(f"wk div {n_buckets}").alias("w"),
    )
    rank = F.when(F.col("w") == 0, F.lit(HLL_SUFFIX_BITS + 1)).otherwise(
        HLL_SUFFIX_BITS + 1 - F.length(F.bin("w"))
    )
    daily = (
        keyed.select("day_num", "bucket", rank.alias("rank"))
        .groupBy("day_num", "bucket")
        .agg(F.max("rank").alias("register"))
    )
    days = daily.select("day_num").distinct()
    grid = days.select(
        "day_num", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket")
    )
    from pyspark.sql.window import Window

    win = (
        Window.partitionBy("bucket")
        .orderBy("day_num")
        .rangeBetween(-(HLL_WIN_DAYS - 1), 0)
    )
    merged = (
        grid.join(daily, ["day_num", "bucket"], "left")
        .withColumn("merged_register", F.max("register").over(win))
        .filter(F.col("merged_register").isNotNull())
    )
    return merged.groupBy("day_num").agg(
        F.count(F.lit(1)).alias("n_active_buckets"),
        F.sum("merged_register").alias("register_sum"),
    )


def quality_logit_score(docs: DataFrame) -> DataFrame:
    """Linear quality CLASSIFIER over the handcrafted feature vector — the
    model-scoring stage a fastText-style quality filter runs at 100 TB,
    with fixed public weights instead of learned ones.  Every feature is
    an exact integer in milli-units (scaled integer division, never IEEE):
    stopword ratio, average word length, digit ratio, punctuation ratio.
    The logit is their fixed-weight integer combination and ``keep`` is
    the sign — so the whole score is hash-exact across engines, unlike a
    float sigmoid (libm exp differs across platforms).

    Scale shape: a narrow map over the documents scan — zero shuffles,
    whole-stage codegen end to end; weights would arrive as a broadcast
    literal exactly as they are inlined here.  The digit/punct character
    counts use ``translate`` (a codegen'd char-map delete) instead of
    ``regexp_count``: identical values on the ASCII-guarded corpus, and
    measured 30x cheaper at the 10x corpus (two regexp_counts alone were
    1.78 s of this query's ~2 s sf1 wall; the r12 plan runs in ~0.2 s)."""
    toks = _toks()
    n_words = F.size(toks)
    stop_list = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_list, t)))
    n_chars = F.length("text")
    safe_chars = F.greatest(n_chars, F.lit(1))
    compact = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_digits = n_chars - F.length(F.translate(F.col("text"), DIGIT_CHARS, ""))
    n_punct = F.length(F.translate(F.col("text"), ALNUM_SPACE_CHARS, ""))
    from .dedup import fan_out

    docs = fan_out(docs.select("doc_id", "text"))
    feats = docs.select(
        "doc_id",
        (1000 * n_stop.cast("bigint")).alias("_stop"),
        (1000 * compact.cast("bigint")).alias("_wlen"),
        (1000 * n_digits.cast("bigint")).alias("_dig"),
        (1000 * n_punct.cast("bigint")).alias("_pun"),
        n_words.cast("bigint").alias("_nw"),
        safe_chars.cast("bigint").alias("_nc"),
    ).select(
        "doc_id",
        F.expr("_stop div _nw").alias("stop_ratio_m"),
        F.expr("_wlen div _nw").alias("wlen_m"),
        F.expr("_dig div _nc").alias("digit_ratio_m"),
        F.expr("_pun div _nc").alias("punct_ratio_m"),
    )
    logit = (
        F.lit(-2600)
        + 6 * F.col("stop_ratio_m")
        + F.expr("wlen_m div 2")
        - 3 * F.col("digit_ratio_m")
        - 4 * F.col("punct_ratio_m")
    )
    return feats.select(
        "doc_id",
        "stop_ratio_m",
        "wlen_m",
        "digit_ratio_m",
        "punct_ratio_m",
        logit.cast("bigint").alias("logit_milli"),
        (logit >= 0).alias("keep"),
    )


def quantile_sketch_merge(docs: DataFrame, bin_width: int = 64) -> DataFrame:
    """MERGEABLE quantile sketch per source: the (source, bin) histogram
    cell table IS the sketch — the deterministic equi-width cousin of
    t-digest/KLL with the same algebraic property (merging shards = adding
    cells; the cell count is bounded by the value range, not the row
    count), which is exactly what lets a 1000-executor job compute
    quantiles with one map-side-combinable aggregation instead of a global
    sort.  Quantiles read off the merged sketch: the reported p50/p90/p99
    are the upper edge of the first bin whose cumulative count reaches the
    rank — exact integers, so the whole result hash-matches the oracle
    (percentile_approx and exact percentiles both interpolate in ways that
    differ across engines; bin edges don't).

    Scale shape: one groupBy(source, bin) with map-side combine over the
    scan, then windows over the tiny cell table.  Nothing downstream of
    the first aggregation scales with corpus size."""
    from pyspark.sql import Window

    bin_col = F.expr(f"n_chars div {bin_width}")
    cells = docs.groupBy(F.col("source"), bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wc = Window.partitionBy("source").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("source")
    cum = (
        cells.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("total", F.sum("cnt").over(wt))
    )
    def edge(pct):
        hit = F.when(100 * F.col("cum") >= pct * F.col("total"), F.col("bin"))
        return (bin_width * (F.min(hit) + 1)).cast("bigint")
    return (
        cum.groupBy("source")
        .agg(
            F.max("total").cast("bigint").alias("n_docs"),
            edge(50).alias("p50_hi"),
            edge(90).alias("p90_hi"),
            edge(99).alias("p99_hi"),
        )
    )


RRF_K = 60
RRF_SCALE = 1_000_000
RRF_POOL = 100  # per-ranker candidate pool before fusion


def retrieval_rrf_fusion(
    docs: DataFrame, query_doc_id: int = 17, k: int = 20
) -> DataFrame:
    """Hybrid retrieval via Reciprocal-Rank Fusion: two lexical rankers
    score the corpus for one query doc's terms, each keeps its top
    RRF_POOL candidates, and the fused score is the classic
    sum(1/(K + rank)) — here as the scaled integer RRF_SCALE div
    (K + rank), so fusion is exact in both engines.

    The two rankers are deliberately INTEGER-exact (the BM25 kernel's own
    docstring explains why per-doc double sums cannot be hash-compared):
    - ranker A (idf-weighted): sum of tf * (2N - 2df + 1) * 1000 div
      (2df + 1) — the rational-idf tf-idf family;
    - ranker B (length-normalized): sum of tf * 1000000 div dl — a
      query-likelihood-style ranker that penalizes long docs.
    Integer sums are shuffle-order-independent, so both rankers, both rank
    assignments, and the fused ordering replay bit-for-bit in DuckDB.

    Scale shape: tf/df/dl are the shared one-shuffle aggregates; each
    ranker's pool is a TakeOrderedAndProject top-RRF_POOL (no global
    sort); the rank window runs over <= RRF_POOL rows; fusion is a
    full-outer join of two 100-row frames.  This is the fan-in step of a
    production hybrid search stack (lexical + semantic + fusion)."""
    from pyspark.sql import Window

    from .dedup import fan_out

    docs = fan_out(docs)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    qterms = (
        toks.filter(F.col("doc_id") == query_doc_id).select("term").distinct()
    )
    # Both ranker pools consume `matched`; uncheckpointed, its lineage
    # (the tokenize-explode plus the tf/df/dl aggregate joins) sits as two
    # subtrees of the ONE returned plan and runs twice.  Materialize the
    # small matched frame (docs x query terms only) once.
    matched = (
        tf.join(F.broadcast(qterms), "term")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("doc_id") != query_doc_id)
        .localCheckpoint(eager=True)
    )
    score_a = F.sum(
        F.expr("tf * (2 * n_docs - 2 * df + 1) * 1000 div (2 * df + 1)")
    ).alias("score")
    score_b = F.sum(F.expr(f"tf * {RRF_SCALE} div dl")).alias("score")

    def pool(scored):
        w = Window.orderBy(F.desc("score"), "doc_id")
        return (
            scored.orderBy(F.desc("score"), "doc_id")
            .limit(RRF_POOL)
            .withColumn("rank", F.row_number().over(w))
            .select("doc_id", "rank")
        )

    pa = pool(matched.groupBy("doc_id").agg(score_a))
    pb = pool(matched.groupBy("doc_id").agg(score_b))
    fused = (
        pa.withColumnRenamed("rank", "rank_a")
        .join(pb.withColumnRenamed("rank", "rank_b"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_a", F.lit(0)).alias("rank_a"),
            F.coalesce("rank_b", F.lit(0)).alias("rank_b"),
            (
                F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + rank_a)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + rank_b)"), F.lit(0)
                )
            ).cast("bigint").alias("rrf_milli"),
        )
    )
    w = Window.orderBy(F.desc("rrf_milli"), "doc_id")
    return (
        fused.orderBy(F.desc("rrf_milli"), "doc_id")
        .limit(k)
        .withColumn("fused_rank", F.row_number().over(w))
        .select("doc_id", "rank_a", "rank_b", "rrf_milli", "fused_rank")
    )


# GPT-2-style pre-tokenizer class pattern: alpha runs, digit runs, single
# punctuation — the split a BPE tokenizer applies BEFORE merges.  Plain
# character classes only, so the Java (Spark) and RE2 (DuckDB) regex
# dialects agree on every input.
PRETOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def regex_pretokenize(docs: DataFrame) -> DataFrame:
    """Regex pre-tokenization counts per doc: total pre-tokens plus the
    alpha/digit/punct class split — the token-accounting pass run before
    BPE training to size the corpus in pre-tokens rather than whitespace
    words (digits and punctuation each become their own tokens, exactly
    what inflates LLM token counts vs word counts).

    One regexp_extract_all per doc (narrow map, no shuffle); class
    membership is decided by the FIRST CHARACTER's integer code (the
    pattern guarantees class-homogeneous tokens), keeping the classifier
    in pure integer compares instead of a second regex pass.

    r12 plan: all three class counts come from ONE aggregate() traversal
    of the token array's first-char codes, folded into a packed struct.
    The previous shape (size(filter(...)) per class) re-evaluated the
    regexp_extract_all once per output column — higher-order filter
    lambdas are outside whole-stage codegen, so Catalyst's subexpression
    elimination never fused them (measured 3.1 s -> 0.85 s at the 10x
    corpus, with fan_out supplying scan parallelism the one-file fixture
    corpus lacks)."""
    from .dedup import fan_out

    toks = F.regexp_extract_all(F.col("text"), F.lit(PRETOKEN_PATTERN), 0)
    codes = F.transform(toks, lambda t: F.ascii(F.substring(t, 1, 1)))
    is_alpha = lambda c: ((c >= 65) & (c <= 90)) | ((c >= 97) & (c <= 122))
    is_digit = lambda c: (c >= 48) & (c <= 57)
    packed = F.aggregate(
        codes,
        F.struct(F.lit(0).alias("a"), F.lit(0).alias("d"), F.lit(0).alias("n")),
        lambda acc, c: F.struct(
            (acc["a"] + F.when(is_alpha(c), 1).otherwise(0)).alias("a"),
            (acc["d"] + F.when(is_digit(c), 1).otherwise(0)).alias("d"),
            (acc["n"] + 1).alias("n"),
        ),
    )
    return (
        fan_out(docs.select("doc_id", "text"))
        .select("doc_id", packed.alias("p"))
        .select(
            "doc_id",
            F.col("p.n").cast("bigint").alias("n_pretokens"),
            F.col("p.a").cast("bigint").alias("n_alpha"),
            F.col("p.d").cast("bigint").alias("n_digit"),
            (F.col("p.n") - F.col("p.a") - F.col("p.d")).cast("bigint").alias("n_punct"),
        )
    )


ORA_REGEX_PRETOKENIZE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{PRETOKEN_PATTERN.replace("'", "''")}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_pretokens,
       CAST(len(list_filter(toks, t -> (ascii(t) BETWEEN 65 AND 90)
                                    OR (ascii(t) BETWEEN 97 AND 122))) AS BIGINT)
         AS n_alpha,
       CAST(len(list_filter(toks, t -> ascii(t) BETWEEN 48 AND 57)) AS BIGINT)
         AS n_digit,
       CAST(len(toks)
            - len(list_filter(toks, t -> (ascii(t) BETWEEN 65 AND 90)
                                      OR (ascii(t) BETWEEN 97 AND 122)))
            - len(list_filter(toks, t -> ascii(t) BETWEEN 48 AND 57)) AS BIGINT)
         AS n_punct
FROM t
"""


BOILER_PREFIX_CHARS = 32
# Minimum docs sharing a prefix before it counts as boilerplate: without
# this, a source whose prefixes are all unique (every n=1, ties broken by
# pk) gets one arbitrary doc flagged and 32 chars stripped from it.
BOILER_MIN_SUPPORT = 2


def boilerplate_strip(docs: DataFrame) -> DataFrame:
    """Per-source boilerplate HEADER detection and strip accounting: the
    majority first-BOILER_PREFIX_CHARS prefix of each source (ties broken
    on the prefix key) is declared that source's boilerplate; every doc
    carrying it is flagged and its clean length excludes the header — the
    header/footer-removal stage crawl pipelines run before dedup, as
    exact algebra.

    Prefixes are folded to the engine-wide polynomial key before the
    vote, so the heavy groupBys shuffle 8-byte integers, never text.
    Shape: one groupBy(source, prefix_key) with map-side combine (bounded
    by |sources| x |distinct prefixes|), a row_number over that cell
    table for the majority vote, and a broadcast-sized join back onto the
    doc stream.  Nothing scales past the first aggregation."""
    from pyspark.sql import Window

    from .dedup import SHINGLE_B, SHINGLE_P

    prefix_key = F.aggregate(
        F.transform(
            F.split(F.substring("text", 1, BOILER_PREFIX_CHARS), ""),
            lambda c: F.ascii(c),
        ),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * SHINGLE_B + c) % SHINGLE_P,
    )
    keyed = docs.select(
        "doc_id", "source", F.length("text").alias("n_chars"), prefix_key.alias("pk")
    )
    votes = keyed.groupBy("source", "pk").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), "pk")
    majority = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("n") >= BOILER_MIN_SUPPORT)
        .select("source", F.col("pk").alias("boiler_pk"), F.col("n").alias("boiler_n"))
    )
    # left join: a source with no >=MIN_SUPPORT prefix has no boilerplate
    # row at all — its docs must still flow through, unflagged.
    return (
        keyed.join(F.broadcast(majority), "source", "left")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.coalesce(F.col("pk") == F.col("boiler_pk"), F.lit(False)).alias(
                "has_boilerplate"
            ),
            F.when(
                F.col("pk") == F.col("boiler_pk"),
                F.greatest(F.col("n_chars") - BOILER_PREFIX_CHARS, F.lit(0)),
            )
            .otherwise(F.col("n_chars"))
            .cast("bigint")
            .alias("clean_chars"),
        )
    )
