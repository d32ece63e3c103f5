"""The ingest-admission funnel: the decision a production corpus makes for
every incoming document — admit it, or reject it with a reason — composed
from the staged-index probes the dedup/quality tiers already maintain:

1. EXACT gate: sha256 content hash against the staged base hash index
   (``stage_hash_index``) — the cheapest check runs first;
2. CONTAINMENT gate, only for survivors of (1): directed containment
   against the staged containment index
   (``dedup.containment_vs_base_batch`` — "is this new doc already
   quoted/contained in the corpus?");
3. NEAR-DUP gate, only for survivors of (1) and (2): MinHash-LSH
   Jaccard against the staged band index
   (``dedup.incremental_near_dup_batch`` — "is this new doc an edited
   copy of something we have?" — the symmetric tier that catches
   high-overlap rewrites the directed containment test misses when the
   new doc ADDS material, pushing containment below threshold while
   Jaccard stays high);
4. QUALITY gate: the fixed-weight integer quality classifier
   (``text.quality_logit_score``).

Admission = passed all four.  Every gate's base side stays a parquet
SCAN probed by broadcasts of delta-derived frames, so nothing
corpus-sized shuffles per batch — the same posture as the individual
incremental operators, now composed into the funnel a real ingestion
pipeline runs.  The funnel ORDER is itself the optimization: the exact
gate is a hash semi-join; only its survivors pay the shingle/prefix
machinery of the containment probe; and only the doubly-cleared sliver
pays the MinHash signature chain of the near-dup probe.

Everything is hash-exact vs the DuckDB oracle: sha2(256) text hashes,
the integer containment probe, the replayed MinHash band chain with
exact-Jaccard verify, and the integer-milli quality logit.

Durability note (applies to every staged-probe operator's
``localCheckpoint(eager=True)`` barriers): localCheckpoint stores the
checkpointed blocks UNREPLICATED on executors, so on a real cluster an
executor loss mid-batch fails the batch (the driver retries it) rather
than recomputing the lineage.  That is the right trade for these
delta-sized frames — the barrier exists to pin a tiny plan, and a
retried micro-batch is idempotent against the staged index — but a
deployment that cannot tolerate batch retries should switch the
barriers to reliable ``checkpoint()`` on a shared filesystem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import containment_vs_base_batch, incremental_near_dup_batch
from .text import quality_logit_score


def stage_hash_index(base: DataFrame, path: str) -> None:
    """Materialize the base corpus's distinct sha256 content hashes as a
    parquet table — the exact-dup arm of the admission funnel.  One
    32-byte-hex row per distinct content; at any corpus size this is the
    smallest possible exact-dup index, and the per-batch probe is a scan
    + broadcast semi-join, never a shuffle of the base."""
    (
        base.select(F.sha2("text", 256).alias("h"))
        .distinct()
        .write.mode("overwrite")
        .parquet(f"{path}/bh")
    )


def ingest_admission_batch(
    spark: SparkSession,
    containment_index: str,
    hash_index: str,
    band_index: str,
    delta: DataFrame,
) -> DataFrame:
    """Per-micro-batch admission decisions for DELTA docs against the
    staged indexes: (doc_id, is_exact, is_contained, is_near_dup,
    quality_keep, admitted).  ``is_contained`` is evaluated ONLY on the
    not-exact sliver, and ``is_near_dup`` ONLY on the
    not-exact-and-not-contained sliver (each dup gate's rejects skip
    every more expensive probe downstream — funnel pruning; an exact
    copy is trivially contained and near-dup, and a contained doc needs
    no Jaccard check, so the flags stay disjoint by construction and
    the oracle replays the same restrictions).  All four gate results
    ride tiny broadcast frames onto the delta.

    On executor loss mid-batch the localCheckpoint barriers fail the
    batch instead of recomputing (see the module docstring for the
    durability trade)."""
    bh = spark.read.parquet(f"{hash_index}/bh")
    dh = delta.select("doc_id", F.sha2("text", 256).alias("h"))
    # base hash scan probed by the broadcast delta hashes — the delta ids
    # that already exist verbatim in the corpus
    exact_ids = (
        bh.join(F.broadcast(dh), "h")
        .select("doc_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    not_exact = delta.join(F.broadcast(exact_ids), "doc_id", "left_anti")
    contained_ids = (
        containment_vs_base_batch(spark, containment_index, not_exact)
        .select(F.col("delta_id").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    survivors = not_exact.join(F.broadcast(contained_ids), "doc_id", "left_anti")
    near_dup_ids = (
        incremental_near_dup_batch(spark, band_index, survivors)
        .select(F.col("delta_id").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    quality = quality_logit_score(delta).select(
        "doc_id", F.col("keep").alias("quality_keep")
    )
    is_exact = F.coalesce("_e", F.lit(False))
    is_contained = F.coalesce("_c", F.lit(False))
    is_near_dup = F.coalesce("_n", F.lit(False))
    return (
        quality.join(
            F.broadcast(exact_ids.withColumn("_e", F.lit(True))), "doc_id", "left"
        )
        .join(
            F.broadcast(contained_ids.withColumn("_c", F.lit(True))),
            "doc_id",
            "left",
        )
        .join(
            F.broadcast(near_dup_ids.withColumn("_n", F.lit(True))),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            is_exact.alias("is_exact"),
            is_contained.alias("is_contained"),
            is_near_dup.alias("is_near_dup"),
            "quality_keep",
            (
                ~is_exact & ~is_contained & ~is_near_dup & F.col("quality_keep")
            ).alias("admitted"),
        )
    )
