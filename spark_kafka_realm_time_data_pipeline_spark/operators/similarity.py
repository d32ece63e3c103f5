"""Similarity search over embedding columns (array<float>).

Dot products are computed with deterministic left-to-right double folds
(``F.aggregate`` / DuckDB ``list_reduce``) so Spark and the oracle produce
bit-identical cosines — no parallel-reduction order ambiguity.

Scale path: the brute-force form is O(|Q|x|C|) and is only sane when |Q| is
small (broadcast the queries); the bucketed/IVF form prunes candidates to a
cluster probe set first, turning the cross join into an equi-join on
cluster id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def fold_sum(arr: Column) -> Column:
    """Deterministic sequential double sum (left fold)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    return fold_sum(F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y))


def norm(a: Column | str) -> Column:
    return F.sqrt(fold_sum(F.transform(_as_double(a), lambda x: x * x)))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB twins — same left-fold shape.
ORA_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
    "(acc, x) -> acc + x)"
)
ORA_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
    "(acc, x) -> acc + x))"
)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    candidate corpus, window top-k per query.  The only shuffle is the
    final per-query ranking; ties broken by neighbor id."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine("q_vec", "c_vec"))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_hyperplanes(dim: int = 64, n_planes: int = 6, seed: int = 1) -> list[list[float]]:
    """Deterministic random-hyperplane set (±1 components from md5 bits) —
    the same constants parameterize the Spark plan and the oracle SQL."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{seed}_{j}_{i}".encode()).hexdigest()[:8], 16) % 2 else -1.0
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def lsh_bucket(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product bucket id: bit j = (vec . plane_j) > 0.  All
    deterministic left folds — engine-portable."""
    bucket: Column | None = None
    for j, plane in enumerate(planes):
        lit_arr = F.array(*[F.lit(x) for x in plane])
        d = fold_sum(F.zip_with(_as_double(vec_col), lit_arr, lambda x, y: x * y))
        term = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    assert bucket is not None
    return bucket.cast("int")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed ANN: random-hyperplane signature buckets both sides;
    candidates are the query's own bucket (equi-join on bucket id).  The
    100 TB shape: |Q| x (N / 2^n_planes) comparisons, one narrow bucket
    projection on the corpus, no cross product.  Multi-probe (flipping the
    lowest-margin bits) raises recall the same way simhash probing does."""
    from pyspark.sql import Window

    # dim is a declared parameter (shared with the oracle generator) — an
    # eager first() here would run a job at plan-construction time and
    # crash on an empty table
    planes = lsh_hyperplanes(dim=dim, n_planes=n_planes)
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        lsh_bucket("embedding", planes).alias("bucket"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        lsh_bucket("embedding", planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# Per-bucket membership cap for range_search (lowest vec_ids win) — the same
# deterministic guard every other candidate generator uses (MAX_BUCKET,
# PREFIX_CAP).  Pair volume is bounded at n_buckets * cap^2 regardless of
# corpus size.
RANGE_BUCKET_CAP = 128


def range_search(
    embeddings: DataFrame,
    tau: float = 0.25,
    n_planes: int = 6,
    dim: int = 64,
    max_bucket: int = RANGE_BUCKET_CAP,
) -> DataFrame:
    """Similarity RANGE search: every pair of vectors with cosine >= tau —
    the "find all near-semantic-duplicates" complement to top-k ANN (top-k
    answers "what is closest to q"; range answers "which pairs are closer
    than tau", the question semantic dedup actually asks).

    Candidates come from the same deterministic random-hyperplane LSH
    buckets as ``lsh_topk``: a pair can only be emitted if it collides in
    the signature bucket, which bounds the join at sum over buckets of
    |bucket|^2 instead of N^2; every candidate is then verified with the
    exact cosine fold, so there are no false positives — recall is bounded
    by the bucket collision probability (1 - theta/pi per plane), the
    standard LSH trade documented to callers.

    Scale shape: one narrow bucket projection on the corpus, a self
    equi-join on the 6-bit bucket id (shuffle keyed on bucket), the
    cosine fold on candidates only.  The per-bucket membership CAP
    (lowest vec_ids win, replayed exactly by the oracle) bounds the join
    at n_buckets * cap^2 pairs no matter how the corpus grows — without
    it a fixed plane count is quadratic in corpus size (measured 43.9x
    on 10x data before the cap landed; the sf0.1 corpus sits far under
    the cap, so bench-scale results are unchanged).  The cap is the
    safety bound, not the tuning knob: at 100 TB raise n_planes so
    |bucket| ~ sqrt(candidate budget) and the cap never binds — the same
    geometry tuning IVF's n_probe makes explicit."""
    from pyspark.sql import Window

    planes = lsh_hyperplanes(dim=dim, n_planes=n_planes)
    w = Window.partitionBy("bucket").orderBy("vec_id")
    # norms are per-VECTOR, not per-pair: precompute once here (the fold is
    # identical, so the IEEE value — and the oracle hash — is unchanged),
    # instead of re-folding both norms inside the join condition for every
    # candidate pair (3 folds/pair -> 1 fold/pair, measured ~3x on the
    # verify stage at the 10x corpus).
    keyed = (
        embeddings.select(
            "vec_id",
            "embedding",
            lsh_bucket("embedding", planes).alias("bucket"),
            norm("embedding").alias("nrm"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_bucket)
        .drop("rn")
    )
    a = keyed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
        "bucket",
    )
    b = keyed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
        "bucket",
    )
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= tau)
        .select("vec_a", "vec_b", "cosine")
    )


def ivf_centroids(
    embeddings: DataFrame,
    cluster_col: str = "label",
    portable: bool = True,
) -> DataFrame:
    """(cluster, centroid) per-cluster mean vectors — the coarse quantizer
    half of an IVF index, shared by the inline ``ivf_topk`` and the staged
    ``stage_ivf_index``.  ``portable=True`` folds each dimension's values in
    vec_id order (sequential double sum / count), bit-identical to DuckDB's
    ``list_reduce`` replay; see ``ivf_topk`` for when to flip it off."""
    pe = embeddings.select(
        cluster_col, "vec_id", F.posexplode("embedding").alias("pos", "val")
    )
    if portable:
        per_dim = (
            pe.groupBy(cluster_col, "pos")
            .agg(
                F.array_sort(F.collect_list(F.struct("vec_id", "val"))).alias("vals"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                cluster_col,
                "pos",
                (
                    fold_sum(
                        F.transform("vals", lambda p: p.getField("val").cast("double"))
                    )
                    / F.col("n")
                ).alias("cval"),
            )
        )
    else:
        per_dim = pe.groupBy(cluster_col, "pos").agg(F.avg("val").alias("cval"))
    return (
        per_dim.groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
        .select(
            F.col(cluster_col).alias("cluster"),
            F.transform("pairs", lambda p: p.getField("cval")).alias("centroid"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    cluster_col: str = "label",
    portable_centroids: bool = True,
) -> DataFrame:
    """IVF-style ANN: cluster centroids (here: mean per pre-assigned
    ``label``; at scale, k-means), rank clusters per query, probe the top
    ``n_probe`` clusters, brute-force inside the probe set only.

    The candidate join is an equi-join on cluster id — the 100 TB shape:
    |Q| x n_probe x (N / n_clusters) comparisons instead of |Q| x N.

    ``portable_centroids=True`` (default) computes each centroid mean as a
    vec_id-ordered sequential double fold — bit-identical in Spark and
    DuckDB, which upgrades IVF from a rows-only check to a full value
    oracle.  The fold buffers one cluster's values per (cluster, dim)
    aggregation group; at billions of vectors per cluster flip to
    ``False`` for Spark's streaming ``avg`` (identical math, engine-
    specific accumulation order — fine in production, unverifiable
    against a replaying oracle).
    """
    cent = ivf_centroids(embeddings, cluster_col, portable_centroids)
    vecs = embeddings.select(
        "vec_id", "embedding", F.col(cluster_col).alias("cluster")
    )
    return _ivf_probe_topk(cent, vecs, queries, k, n_probe)


def _ivf_probe_topk(
    cent: DataFrame,
    vecs: DataFrame,
    queries: DataFrame,
    k: int,
    n_probe: int,
) -> DataFrame:
    """The probe half of IVF, shared by ``ivf_topk`` (inline centroids) and
    ``ann_vs_base_batch`` (staged scans): rank clusters per query by
    centroid cosine, keep ``n_probe``, equi-join the probe list onto the
    (vec_id, embedding, cluster) table, exact cosine top-k inside the probe
    set.  Both small frames ride broadcasts; the vector table only ever
    appears as the stream side of an equi-join on cluster."""
    from pyspark.sql import Window

    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    qc = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("c_cos", cosine("q_vec", "centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), "cluster")
    probes = qc.withColumn("crank", F.row_number().over(wq)).filter(
        F.col("crank") <= n_probe
    ).select("query_id", "q_vec", "cluster")
    c = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        "cluster",
    )
    scored = (
        c.join(F.broadcast(probes), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def assign_to_nearest_centroid(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """Rank-1 cell assignment (cosine DESC, cluster ASC — the probe's
    exact ranking rule) of ``(vec_id, embedding)`` rows against a k-row
    centroid table, shared by the IVF insert path
    (``merge_admitted_into_ivf``) and the rebuild's re-add step
    (``stage_ivf_index(reassign=True)``).  Shape: the centroid table
    broadcasts onto the vector side, and the rank-1 rule runs as a
    map-side-combinable max_by aggregation — the exchange moves one row
    per vec_id, never the vecs x n_lists scored frame."""
    qc = vecs.crossJoin(F.broadcast(cent)).withColumn(
        "c_cos", cosine("embedding", "centroid")
    )
    best = F.struct(F.col("c_cos"), (-F.col("cluster")).alias("neg_cluster"))
    return (
        qc.groupBy("vec_id")
        .agg(
            F.max_by("cluster", best).alias("cluster"),
            # constant within the group (one embedding per vec_id)
            F.any_value("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", "cluster")
    )


def stage_ivf_index(
    embeddings: DataFrame,
    path: str,
    cluster_col: str = "label",
    n_lists: int | None = None,
    reassign: bool = False,
) -> None:
    """Materialize the IVF ANN index as parquet tables — the similarity
    analog of ``dedup.stage_containment_index``, built once by the index
    maintenance job so every ingest/query batch pays only its own work:

    - ``{path}/centroids``: (cluster, centroid) — the deterministic
      portable fold (``ivf_centroids``), a k-row table every batch
      broadcasts;
    - ``{path}/vecs``: (vec_id, embedding) PARTITIONED BY cluster —
      written LAST so its ``_SUCCESS`` marker doubles as the whole-index
      completeness flag.  The physical layout IS the inverted file: a
      probe that equi-joins this scan on ``cluster`` triggers dynamic
      partition pruning, so a batch reads only the probed clusters'
      files — |Q| x n_probe x (N / n_lists) bytes, never the corpus.

    ``n_lists``: when set, the index is built from a DISCOVERED
    clustering — ``curation.kmeans_assign`` trains ``n_lists`` Lloyd
    clusters over the corpus and the assignment replaces ``cluster_col``
    — the production growth path: n_lists must scale ~sqrt(N) for the
    probe cost n_probe x N / n_lists to stay sub-linear per batch, and
    a fixed label vocabulary cannot do that.  Re-clustering trades a
    little recall (a query's true neighbor can land just outside the
    probed lists more easily when lists are finer) for the sqrt-scaled
    probe; measure with the recall tooling before growing further.

    ``reassign``: the REBUILD path (one exact Lloyd round).  After the
    centroids are refreshed over the CURRENT cells, every vector is
    re-assigned to its rank-1 cell under the refreshed quantizer — the
    probe's exact ranking rule — so a probe's top-1 cell and a stored
    twin's cell coincide by construction and recall on exact dups
    survives the re-train.  Refreshing centroids WITHOUT re-adding the
    vectors (the r19 first cut) leaves the stored assignment inconsistent
    with the quantizer the probes rank by, and twins of absorbed vectors
    fall out of the probed cells — caught by
    tests/test_similarity.py::test_rebuild_clears_drift_and_keeps_recall."""
    if n_lists is not None:
        from .curation import kmeans_assign

        assign = kmeans_assign(embeddings, k=n_lists)
        # drop any pre-existing assignment first: a REBUILD input (the
        # merged table) already carries `cluster`, and the discovered
        # assignment's column would otherwise be ambiguous (caught by the
        # r19 sf1 scale proof — the growth tier is the only path that
        # joins a second assignment on)
        src = embeddings.drop("cluster").join(assign, "vec_id").select(
            "vec_id", "embedding", "cluster"
        )
        cluster_col = "cluster"
    else:
        src = embeddings.select(
            "vec_id", "embedding", F.col(cluster_col).alias("cluster")
        )
        cluster_col = "cluster"
    cent = ivf_centroids(src, cluster_col)
    if reassign:
        src = assign_to_nearest_centroid(src.select("vec_id", "embedding"), cent)
    cent.write.mode("overwrite").parquet(f"{path}/centroids")
    src.write.mode("overwrite").partitionBy("cluster").parquet(f"{path}/vecs")


def ann_vs_base_batch(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
) -> DataFrame:
    """Per-micro-batch ANN top-k of DELTA query vectors against a staged
    IVF index (``stage_ivf_index``) — the ingestion-time question ("what
    does this new vector match in the corpus?") shaped like
    ``dedup.containment_vs_base_batch``: base-side tables stay parquet
    SCANS probed by broadcasts of delta-derived frames, so no base data
    shuffles per trigger.  The centroid table broadcasts onto the delta;
    the probe list (|delta| x n_probe rows) broadcasts onto the
    cluster-partitioned vector scan, where dynamic partition pruning
    drops every unprobed cluster's files at the source.  Value-identical
    to ``ivf_topk`` over the same frames, so the availableNow streaming
    twin shares the batch oracle verbatim.

    Durability: any ``localCheckpoint(eager=True)`` barriers the caller
    composes around this probe hold delta-sized frames unreplicated on
    executors — executor loss mid-batch fails (and retries) the batch
    rather than recomputing; use reliable ``checkpoint()`` if batch
    retries are unacceptable (see operators/ingest's module
    docstring)."""
    cent = spark.read.parquet(f"{index_path}/centroids")
    vecs = spark.read.parquet(f"{index_path}/vecs")
    return _ivf_probe_topk(cent, vecs, queries, k, n_probe)


# --- product quantization -----------------------------------------------------

PQ_SUBS = 8  # subspaces; PQ_SUBS * PQ_SUBDIM = embedding dim
PQ_SUBDIM = 8
PQ_CODES = 16  # codewords per subspace -> 4 bits per subspace, 32-bit pq_key
PQ_SCALE = 1 << 10  # power-of-two fixed point: floor(x * 2^10) is exact IEEE


def pq_codes(emb: DataFrame) -> DataFrame:
    """Product-quantization encoder — the memory-side half of large-scale
    ANN (IVF-PQ): each vector splits into PQ_SUBS subvectors, each
    subvector snaps to its nearest codeword, and the vector compresses to
    a 4-bit-per-subspace code key (64 floats -> 32 bits here).

    Codebook: the PQ_CODES lowest-vec_id vectors' subvectors — at
    production scale the codebook comes from per-subspace k-means
    (``kmeans_embeddings`` restricted to the subspace); seeded codewords
    keep this op single-pass so the oracle is closed-form rather than an
    unrolled fixpoint.  Determinism contract as everywhere in the integer
    family: fixed-point quantization, integer squared distances, argmin
    tie-break on code id — the oracle replays every code assignment.

    Shape: the codebook is PQ_SUBS x PQ_CODES rows (BROADCAST); the probe
    side is a narrow xPQ_SUBS explode; ONE shuffle for the per-vector
    regroup.  Emits (vec_id, pq_key, recon_err_q) — the reconstruction
    error is the exact quantized distortion, the quality metric a PQ
    index is tuned on."""
    qv = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * PQ_SCALE).cast("long")
    )
    q = emb.select("vec_id", qv.alias("qv"))
    sub = q.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBS - 1))).alias("j"),
        "qv",
    ).select(
        "vec_id",
        "j",
        F.expr(f"slice(qv, j * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("sv"),
    )
    cb = sub.filter(F.col("vec_id") < PQ_CODES).select(
        F.col("vec_id").alias("code"), "j", F.col("sv").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id", "j").orderBy("d2", "code")
    best = (
        sub.join(F.broadcast(cb), "j")
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return best.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(cast(code as bigint), cast(4 * j as int))")).alias(
            "pq_key"
        ),
        F.sum("d2").alias("recon_err_q"),
    )


ORA_PQ_CODES = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {PQ_SCALE}) AS BIGINT)) AS qv
  FROM embeddings
), sub AS (
  SELECT vec_id, j, list_slice(qv, j * {PQ_SUBDIM} + 1, j * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
  FROM q CROSS JOIN (SELECT unnest(range(0, {PQ_SUBS})) AS j)
), cb AS (
  SELECT vec_id AS code, j, sv AS cv FROM sub WHERE vec_id < {PQ_CODES}
), scored AS (
  SELECT s.vec_id, s.j, c.code,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(list_zip(s.sv, c.cv),
                            p -> (p[1] - p[2]) * (p[1] - p[2]))),
           (a, x) -> a + x) AS d2
  FROM sub s JOIN cb c USING (j)
), best AS (
  SELECT vec_id, j, code, d2 FROM (
    SELECT vec_id, j, code, d2,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT vec_id,
       CAST(SUM(code << CAST(4 * j AS INT)) AS BIGINT) AS pq_key,
       CAST(SUM(d2) AS BIGINT) AS recon_err_q
FROM best GROUP BY vec_id
"""


def pq_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Asymmetric-distance ANN over PQ codes (the ADC scan of IVF-PQ):
    queries stay full-precision, database vectors exist ONLY as their
    4-bit-per-subspace codes, and each approximate distance is a sum of
    PQ_SUBS table lookups — the query-side half of `pq_codes`, completing
    the PQ story (encode -> scan).

    Per query the distance TABLE is PQ_SUBS x PQ_CODES integer cells
    (||q_j - c_{j,code}||^2 in fixed point); the scan joins the decoded
    code stream on (j, code) against the broadcast table and sums — no
    vector arithmetic ever touches a database row.  That is the 100 TB
    shape: the codebook and tables are driver-size broadcasts, the scan
    is one narrow join + one groupBy(query, vec) with map-side combine,
    and the compressed corpus (32 bits/vector) is ~64x smaller than the
    float rows a brute-force scan reads.  Integer distances, argsort on
    (adist, vec_id) — the oracle replays every lookup."""
    from pyspark.sql.window import Window

    qv = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * PQ_SCALE).cast("long")
    )
    sub_all = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBS - 1))).alias("j"),
        qv.alias("qv"),
    ).select(
        "vec_id",
        "j",
        F.expr(f"slice(qv, j * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("sv"),
    )
    cb = sub_all.filter(F.col("vec_id") < PQ_CODES).select(
        F.col("vec_id").alias("code"), "j", F.col("sv").alias("cv")
    )
    qsub = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBS - 1))).alias("j"),
        qv.alias("qv"),
    ).select(
        "query_id",
        "j",
        F.expr(f"slice(qv, j * {PQ_SUBDIM} + 1, {PQ_SUBDIM})").alias("qsv"),
    )
    d2 = F.aggregate(
        F.zip_with("qsv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dt = qsub.join(F.broadcast(cb), "j").select(
        "query_id", "j", "code", d2.alias("d2")
    )
    codes = pq_codes(emb).select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBS - 1))).alias("j"),
        F.expr("shiftright(pq_key, cast(4 * j as int)) & 15").alias("code"),
    )
    adist = (
        codes.join(F.broadcast(dt), ["j", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adist_q"))
    )
    w = Window.partitionBy("query_id").orderBy("adist_q", "vec_id")
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), "rank", "adist_q"
        )
    )


def merge_admitted_into_ivf(
    spark,
    index_path: str,
    delta: DataFrame,
    admitted_ids: DataFrame,
    extension_path: str,
) -> DataFrame:
    """The MERGE-shaped maintenance twin of the vector ingest gate — the
    similarity analog of ``ingest.merge_admitted_into_indexes``: ASSIGN
    each admitted delta vector to its nearest centroid (argmax cosine,
    ties to the lower cluster id — the exact rank-1 rule the probe path
    uses) and append the (vec_id, embedding, cluster) rows to the staged
    IVF index's cluster-partitioned vector table, so tomorrow's batches
    retrieve — and deduplicate against — today's admissions.

    The CENTROIDS are deliberately NOT recomputed per batch: a centroid
    is a corpus-wide mean, so appending a batch moves every coordinate —
    its refresh is the periodic REBUILD/re-train job
    (``stage_ivf_index``, with the ``n_lists`` growth rule), exactly the
    rebuild-not-append split the containment index's df statistics use.
    Between rebuilds the appended vectors live in the *fixed* quantizer's
    cells — the standard IVF insert path (new vectors never move
    existing cells, recall drifts slowly as the corpus outgrows the
    quantizer, and the rebuild cadence bounds that drift).

    Emits one row per cluster: (cluster, rows_before, rows_appended,
    rows_after), with rows_appended counted by READING THE WRITTEN FILES
    BACK.  All work is delta-sized: the centroid table broadcasts onto
    the admitted batch, and the base vector table contributes only
    per-cluster footer counts."""
    cent = spark.read.parquet(f"{index_path}/centroids")
    adm = delta.join(F.broadcast(admitted_ids), "vec_id", "left_semi")
    # rank-1 rule via the shared max_by assignment (VERDICT r18): the
    # partial aggregation completes map-side and the exchange moves one
    # row per vec_id — where the former row_number() window sorted and
    # shuffled every scored delta x n_lists pair
    assigned = assign_to_nearest_centroid(adm, cent)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{extension_path}/vecs"
    )
    before = (
        spark.read.parquet(f"{index_path}/vecs")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("rows_before"))
    )
    appended = (
        spark.read.parquet(f"{extension_path}/vecs")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("rows_appended"))
    )
    rows_appended = F.coalesce("rows_appended", F.lit(0))
    return before.join(appended, "cluster", "left").select(
        F.col("cluster").cast("long").alias("cluster"),
        F.col("rows_before").cast("long").alias("rows_before"),
        rows_appended.cast("long").alias("rows_appended"),
        (F.col("rows_before") + rows_appended).cast("long").alias("rows_after"),
    )
