"""Ingest-admission funnel: per-gate flags on a planted corpus, and the
funnel-pruning property (each dup gate's rejects never reach the more
expensive probes downstream).
"""

from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators import ingest as I
from spark_kafka_realm_time_data_pipeline_spark.operators.dedup import (
    stage_base_index,
    stage_containment_index,
)


def _base(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "entirely different content about spark physical plans and shuffles"),
        (3, "numbers one two three four five six seven eight nine ten eleven"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_admission_gates_fire_independently(spark, tmp_path):
    base = _base(spark)
    cidx = str(tmp_path / "cidx")
    hidx = str(tmp_path / "hidx")
    bidx = str(tmp_path / "bidx")
    stage_containment_index(base, cidx)
    I.stage_hash_index(base, hidx)
    stage_base_index(base, bidx)
    base_texts = {r.doc_id: r.text for r in base.collect()}
    # near-dup arm: doc 1's text with ~1/6 of its reversed text appended —
    # Jaccard stays above 0.8 while directed containment of the NEW doc
    # falls below 0.9 (the reversed-tail shingles are not in the base)
    t1 = base_texts[1]
    near_text = t1 + " " + t1[::-1][: max(len(t1) // 6, 6)]
    delta = spark.createDataFrame(
        [
            (100, base_texts[1]),  # exact copy -> exact gate
            (101, base_texts[2][: 2 * len(base_texts[2]) // 3]),  # prefix -> containment
            (102, "the and for with that this from they have been well said done"),  # stopword-rich -> admitted
            (103, "9481 7512 0034 5520 1147 8923 3310 6644 2098 7731 5456 1023"),  # digits -> quality reject
            (104, near_text),  # appended-tail edit -> near-dup gate
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in I.ingest_admission_batch(spark, cidx, hidx, bidx, delta).collect()
    }
    assert len(got) == 5
    assert got[100].is_exact and not got[100].admitted
    # funnel pruning: the exact reject never reaches the downstream probes
    assert not got[100].is_contained and not got[100].is_near_dup
    assert got[101].is_contained and not got[101].is_exact and not got[101].admitted
    # ...and the containment reject never reaches the near-dup probe
    assert not got[101].is_near_dup
    assert got[102].admitted and not got[102].is_exact and not got[102].is_contained
    assert not got[102].is_near_dup
    assert not got[103].quality_keep and not got[103].admitted
    # the appended-tail edit clears gates 1-2 and is caught ONLY by gate 3
    assert got[104].is_near_dup and not got[104].admitted
    assert not got[104].is_exact and not got[104].is_contained


def test_index_merge_appends_admitted_rows(spark, tmp_path):
    """The MERGE maintenance twin: only ADMITTED docs' rows are appended,
    counts are read back from the written files, and rows_after is the
    sum — one new hash / 6 band rows / 1 size row / 1 array row for the
    single admitted doc in the planted funnel."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.dedup import (
        N_MINHASH,
        BAND_ROWS,
    )

    base = _base(spark)
    cidx = str(tmp_path / "cidx")
    hidx = str(tmp_path / "hidx")
    bidx = str(tmp_path / "bidx")
    ext = str(tmp_path / "ext")
    stage_containment_index(base, cidx)
    I.stage_hash_index(base, hidx)
    stage_base_index(base, bidx)
    base_texts = {r.doc_id: r.text for r in base.collect()}
    delta = spark.createDataFrame(
        [
            (100, base_texts[1]),  # exact copy -> rejected, never merged
            (102, "the and for with that this from they have been well said done"),  # admitted
        ],
        "doc_id long, text string",
    )
    decisions = I.ingest_admission_batch(spark, cidx, hidx, bidx, delta)
    admitted = decisions.filter("admitted").select("doc_id")
    report = {
        r.index_table: r
        for r in I.merge_admitted_into_indexes(
            spark, hidx, bidx, delta, admitted, ext
        ).collect()
    }
    assert report["bh"].rows_before == 3 and report["bh"].rows_appended == 1
    assert report["bands"].rows_appended == N_MINHASH // BAND_ROWS  # 6 per doc
    assert report["sizes"].rows_appended == 1
    assert report["toks_arr"].rows_appended == 1
    for r in report.values():
        assert r.rows_after == r.rows_before + r.rows_appended
    # the rejected exact copy's hash must NOT be in the extension
    ext_hashes = {r.h for r in spark.read.parquet(f"{ext}/bh").collect()}
    import hashlib

    assert hashlib.sha256(base_texts[1].encode()).hexdigest() not in ext_hashes


def test_day2_flips_without_merge(spark, tmp_path):
    """r18 (VERDICT r17 item 2): day-2 semantics of the merge.  A second
    batch containing an exact copy and an appended-tail near-copy of a
    doc ADMITTED on day 1 is gated against the MERGED (base ∪ extension)
    indexes and rejects both — and the SAME batch against the UN-merged
    base indexes admits both, proving the rejections are caused by the
    merge, not by the base corpus."""
    base = _base(spark)
    cidx = str(tmp_path / "cidx")
    hidx = str(tmp_path / "hidx")
    bidx = str(tmp_path / "bidx")
    ext = str(tmp_path / "ext")
    stage_containment_index(base, cidx)
    I.stage_hash_index(base, hidx)
    stage_base_index(base, bidx)

    # stopword-dense so the appended-tail near-copy still clears the
    # quality gate (the flip must come from the DUP gates, not quality)
    day1_text = (
        "the cat and the dog of the house and a bird of the garden "
        "and the fish of a pond and the mouse of the barn"
    )
    delta1 = spark.createDataFrame(
        [(102, day1_text)], "doc_id long, text string"
    )
    decisions1 = I.ingest_admission_batch(spark, cidx, hidx, bidx, delta1)
    assert decisions1.collect()[0].admitted
    admitted = decisions1.filter("admitted").select("doc_id")
    I.merge_admitted_into_indexes(spark, hidx, bidx, delta1, admitted, ext)

    # merged = base ∪ extension, one table per sub-index (the production
    # append's resulting contents)
    midx = str(tmp_path / "midx")
    for sub, src in (("bh", hidx), ("bands", bidx), ("sizes", bidx), ("toks_arr", bidx)):
        spark.read.parquet(f"{src}/{sub}").unionByName(
            spark.read.parquet(f"{ext}/{sub}")
        ).write.parquet(f"{midx}/{sub}")

    near_copy = day1_text + " " + day1_text[::-1][: max(len(day1_text) // 6, 6)]
    delta2 = spark.createDataFrame(
        [(200, day1_text), (201, near_copy)], "doc_id long, text string"
    )

    merged = {
        r.doc_id: r
        for r in I.ingest_admission_batch(spark, cidx, midx, midx, delta2).collect()
    }
    assert merged[200].is_exact and not merged[200].admitted
    assert merged[201].is_near_dup and not merged[201].admitted
    assert not merged[201].is_exact and not merged[201].is_contained

    # skip the merge: the same day-2 batch against the bare base indexes
    unmerged = {
        r.doc_id: r
        for r in I.ingest_admission_batch(spark, cidx, hidx, bidx, delta2).collect()
    }
    assert unmerged[200].admitted and not unmerged[200].is_exact
    assert unmerged[201].admitted and not unmerged[201].is_near_dup


def test_funnel_green_on_compacted_index(spark, tmp_path):
    """r18 (VERDICT r17 item 3): compaction keeps the funnel green.  The
    merged band index is deliberately over-appended (70 junk re-keyed
    copies of the admitted doc's band rows — its buckets exceed the 64
    cap), compacted, and the day-2 near-copy probe against the COMPACTED
    index still rejects: the admitted doc's rows survive the cap (lowest
    doc_ids win).  A second compaction drops zero rows (idempotence)."""
    from spark_kafka_realm_time_data_pipeline_spark.operators.dedup import (
        MAX_BUCKET,
        N_MINHASH,
        BAND_ROWS,
    )

    base = _base(spark)
    cidx = str(tmp_path / "cidx")
    hidx = str(tmp_path / "hidx")
    bidx = str(tmp_path / "bidx")
    ext = str(tmp_path / "ext")
    stage_containment_index(base, cidx)
    I.stage_hash_index(base, hidx)
    stage_base_index(base, bidx)

    day1_text = (
        "the cat and the dog of the house and a bird of the garden "
        "and the fish of a pond and the mouse of the barn"
    )
    delta1 = spark.createDataFrame([(102, day1_text)], "doc_id long, text string")
    decisions1 = I.ingest_admission_batch(spark, cidx, hidx, bidx, delta1)
    admitted = decisions1.filter("admitted").select("doc_id")
    I.merge_admitted_into_indexes(spark, hidx, bidx, delta1, admitted, ext)

    midx = str(tmp_path / "midx")
    for sub, src in (("bh", hidx), ("sizes", bidx), ("toks_arr", bidx)):
        spark.read.parquet(f"{src}/{sub}").unionByName(
            spark.read.parquet(f"{ext}/{sub}")
        ).write.parquet(f"{midx}/{sub}")
    merged_bands = spark.read.parquet(f"{bidx}/bands").unionByName(
        spark.read.parquet(f"{ext}/bands")
    )
    junk = (
        spark.read.parquet(f"{ext}/bands")
        .select(
            "doc_id",
            "band_id",
            "band_key",
            F.explode(F.sequence(F.lit(1), F.lit(70))).alias("j"),
        )
        .select(
            (F.col("doc_id") + 10000000 + F.col("j").cast("long") * 1000000).alias(
                "doc_id"
            ),
            "band_id",
            "band_key",
        )
    )
    over_appended = merged_bands.unionByName(junk)

    report = {
        r.band_id: r
        for r in I.compact_band_index(
            spark, over_appended, f"{midx}/bands"
        ).collect()
    }
    n_bands = N_MINHASH // BAND_ROWS
    assert len(report) == n_bands
    assert sum(r.rows_dropped for r in report.values()) == n_bands * (
        71 - MAX_BUCKET
    )
    assert sum(r.buckets_over_cap for r in report.values()) == n_bands

    # the funnel still rejects the near-copy against the compacted index
    near_copy = day1_text + " " + day1_text[::-1][: max(len(day1_text) // 6, 6)]
    delta2 = spark.createDataFrame(
        [(201, near_copy)], "doc_id long, text string"
    )
    got = I.ingest_admission_batch(spark, cidx, midx, midx, delta2).collect()[0]
    assert got.is_near_dup and not got.admitted

    # idempotence: compacting the compacted table drops nothing
    again = I.compact_band_index(
        spark,
        spark.read.parquet(f"{midx}/bands"),
        str(tmp_path / "bands2"),
    ).collect()
    assert sum(r.rows_dropped for r in again) == 0
    assert sum(r.buckets_over_cap for r in again) == 0


def test_compact_refuses_in_place(spark, tmp_path):
    """r19 (ADVICE r18): in-place compaction would let the overwrite
    clobber its own lazily-read input (and zero the lazy before/over
    report) — refused with a clear error; sibling output still works."""
    import pytest

    p = str(tmp_path / "bands")
    spark.createDataFrame(
        [(i, 0, "k") for i in range(5)],
        "doc_id long, band_id int, band_key string",
    ).write.parquet(p)
    bands = spark.read.parquet(p)
    with pytest.raises(ValueError, match="in-place"):
        I.compact_band_index(spark, bands, p)
    rep = I.compact_band_index(spark, bands, str(tmp_path / "out")).collect()
    assert rep and rep[0].rows_before == 5
