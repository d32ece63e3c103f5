"""Deduplication operators for LLM training-data pipelines.

Design rules for 100 TB:
- exact dedup = hash + groupBy (one shuffle on the content hash; map-side
  combine collapses most duplicates before the wire);
- near-dup = candidate generation (MinHash-LSH band buckets / SimHash
  blocks) followed by verification (exact Jaccard) — never an O(n^2)
  cross join;
- all hashes are md5/sha2-based, NOT Spark's murmur3 `hash()`, so results
  are engine-independent and the DuckDB oracle can replay them exactly.

The synthetic corpus has no planted duplicates, so dedup queries operate on
``planted_corpus`` — the documents table unioned with deterministic exact
and near copies — giving real positives the oracle reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_table

N_MINHASH = 8  # 4 bands x 2 rows
BAND_ROWS = 2


def planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + exact copies (doc_id%10==0, +1000000) + near copies
    (doc_id%7==0, +2000000, one token appended)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


ORA_CORPUS = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, concat(text, ' zz') AS text
  FROM documents WHERE doc_id % 7 = 0
)
"""


def exact_dedup_groups(corpus: DataFrame) -> DataFrame:
    """sha256 content hash -> duplicate groups. Output: one row per
    duplicated content (canonical = min doc_id)."""
    return (
        corpus.select("doc_id", F.sha2("text", 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def doc_tokens(corpus: DataFrame) -> DataFrame:
    """Distinct (doc_id, token) pairs — the set representation used by
    MinHash and Jaccard."""
    return corpus.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )


def minhash_signatures(toks: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """MinHash signature per doc: sig_i = min over tokens of
    md5(i || '_' || token).  One groupBy(doc_id) with conditional-min
    aggregates — a single shuffle regardless of n_hashes."""
    seeds = list(range(n_hashes))
    hashed = toks.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{s}_"), F.col("tok"))).alias(f"h{s}")
            for s in seeds
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"s{s}") for s in seeds]
    )


def lsh_candidate_pairs(sigs: DataFrame, n_hashes: int = N_MINHASH, band_rows: int = BAND_ROWS) -> DataFrame:
    """Band the signature and bucket-join: docs sharing any band become
    candidates.  The join key is (band_id, band_key) — equi-shuffle, no
    cross product."""
    n_bands = n_hashes // band_rows
    bands = None
    for b in range(n_bands):
        cols = [f"s{b * band_rows + r}" for r in range(band_rows)]
        one = sigs.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            F.concat_ws("|", *cols).alias("band_key"),
        )
        bands = one if bands is None else bands.unionByName(one)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_id", "band_key"
    )
    b_ = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    return (
        a.join(b_, ["band_id", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, toks: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over token sets for candidate pairs only.
    intersection via (doc,tok) equi-joins; union = |A|+|B|-|A∩B|.
    Division of exact ints in double — engine-identical."""
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_toks"))
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_toks").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_toks").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(corpus: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH bands -> candidates ->
    exact-Jaccard verification."""
    toks = doc_tokens(corpus)
    sigs = minhash_signatures(toks)
    cands = lsh_candidate_pairs(sigs)
    return jaccard_verify(cands, toks, threshold)


def simhash_fingerprints(corpus: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash over token md5s: bit j is the sign of the majority vote of
    token-hash nibble parities.  16 bits = 16 md5 hex nibbles; all string ops
    + integer math, engine-portable (no murmur)."""
    toks = doc_tokens(corpus)
    hashed = toks.select("doc_id", F.md5("tok").alias("h"))
    votes = [
        F.sum(
            F.when(
                F.expr(f"(instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1) % 2")
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    simhash = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return agg.select("doc_id", simhash.cast("long").alias("simhash"))


def simhash_dup_groups(corpus: DataFrame) -> DataFrame:
    """Block on exact simhash equality (hamming 0): the scalable first tier
    of simhash dedup (wider hamming radii probe bit-flip variants of the
    same blocking key — still equi-joins, not cross products)."""
    fp = simhash_fingerprints(corpus)
    return (
        fp.groupBy("simhash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
