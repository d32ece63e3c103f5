"""Property-based round-trip tests (SURVEY.md §5.2 item 4) — hypothesis
generates adversarial customer documents; each example set is batched into
ONE DataFrame so Spark runs one job per example, not per row."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.functions.codec import (
    decode_redis_envelope,
    encode_customer_envelope,
)

# JSON-hostile but non-null text: control chars, quotes, backslashes, unicode
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
_person = st.tuples(_text, _text.filter(lambda s: s != ""), _text, _text)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_person, min_size=1, max_size=8))
def test_codec_roundtrip_property(spark, people):
    df = spark.createDataFrame(
        people, "customerName string, email string, phone string, birthDay string"
    )
    wire = encode_customer_envelope(
        df,
        {
            "customerName": F.col("customerName"),
            "email": F.col("email"),
            "phone": F.col("phone"),
            "birthDay": F.col("birthDay"),
        },
    )
    got = sorted(
        (r.customerName, r.email, r.phone, r.birthDay)
        for r in decode_redis_envelope(wire).collect()
    )
    assert got == sorted(people)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.dates(), min_size=1, max_size=8
    )
)
def test_birthyear_split_equals_year(spark, dates):
    """The reference's split(birthDay,'-')[0] equals the honest-typed
    year(to_date(...)) for every ISO date (sparkpykafkajoin.py:131)."""
    rows = [(d.isoformat(),) for d in dates]
    df = spark.createDataFrame(rows, "birthDay string")
    out = df.select(
        F.split("birthDay", "-").getItem(0).alias("split_year"),
        F.year(F.to_date("birthDay")).cast("string").alias("typed_year"),
    ).collect()
    for r in out:
        # split keeps zero-padding; year() drops it — compare numerically
        assert int(r.split_year) == int(r.typed_year)


def test_envelope_wire_is_valid_json(spark):
    """Every encoded envelope is parseable JSON with the exact Kafka-Connect
    field set (FIXTURES.md §1)."""
    df = spark.createDataFrame(
        [("N", "n@x.com", "1", "2000-01-01")],
        "customerName string, email string, phone string, birthDay string",
    )
    wire = encode_customer_envelope(
        df,
        {
            "customerName": F.col("customerName"),
            "email": F.col("email"),
            "phone": F.col("phone"),
            "birthDay": F.col("birthDay"),
        },
    ).collect()
    doc = json.loads(wire[0].value)
    assert set(doc) == {"key", "existType", "Ch", "Incr", "zSetEntries"}
    assert doc["key"] == "Q3VzdG9tZXI="
