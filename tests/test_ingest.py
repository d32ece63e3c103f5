"""Ingest-admission funnel: per-gate flags on a planted corpus, and the
funnel-pruning property (exact rejects never reach the containment probe).
"""

from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.operators import ingest as I
from spark_kafka_realm_time_data_pipeline_spark.operators.dedup import (
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
    stage_containment_index(base, cidx)
    I.stage_hash_index(base, hidx)
    base_texts = {r.doc_id: r.text for r in base.collect()}
    delta = spark.createDataFrame(
        [
            (100, base_texts[1]),  # exact copy -> exact gate
            (101, base_texts[2][: 2 * len(base_texts[2]) // 3]),  # prefix -> containment
            (102, "the and for with that this from they have been well said done"),  # stopword-rich -> admitted
            (103, "9481 7512 0034 5520 1147 8923 3310 6644 2098 7731 5456 1023"),  # digits -> quality reject
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in I.ingest_admission_batch(spark, cidx, hidx, delta).collect()}
    assert len(got) == 4
    assert got[100].is_exact and not got[100].admitted
    # funnel pruning: the exact reject never reaches the containment probe
    assert not got[100].is_contained
    assert got[101].is_contained and not got[101].is_exact and not got[101].admitted
    assert got[102].admitted and not got[102].is_exact and not got[102].is_contained
    assert not got[103].quality_keep and not got[103].admitted
