"""Codec-chain tests: round-trip identity, the reference's real wire bytes,
and the PERMISSIVE-parse edge cases FIXTURES.md calls out.

Reference chain under test (sparkpykafkajoin.py:57,91-131): envelope JSON ->
zSetEntries[0].element -> unbase64 -> customer JSON -> null filter ->
split(birthDay,'-')[0] AS birthYear.
"""

import base64
import json

import pytest
from pyspark.sql import functions as F

from spark_kafka_realm_time_data_pipeline_spark.functions.codec import (
    customer_birth_year,
    decode_redis_envelope,
    encode_customer_envelope,
    parse_stedi_events,
)


from conftest import make_envelope as _envelope


# The literal sample envelope from the reference Guide (FIXTURES.md §1):
# decodes to Sam Test / sam.test@test.com / 2001-01-03.
GUIDE_ENVELOPE = (
    '{"key":"Q3VzdG9tZXI=","existType":"NONE","Ch":false,"Incr":false,'
    '"zSetEntries":[{"element":"eyJjdXN0b21lck5hbWUiOiJTYW0gVGVzdCIsImVtYWlsIjoic2Ft'
    'LnRlc3RAdGVzdC5jb20iLCJwaG9uZSI6IjgwMTU1NTEyMTIiLCJiaXJ0aERheSI6IjIwMDEtMDEtMDMifQ==",'
    '"score":"0.0"}]}'
)


def test_guide_envelope_decodes(spark):
    df = spark.createDataFrame([(GUIDE_ENVELOPE,)], "value string")
    rows = decode_redis_envelope(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.customerName == "Sam Test"
    assert r.email == "sam.test@test.com"
    assert r.phone == "8015551212"
    assert r.birthDay == "2001-01-03"


def test_roundtrip_identity(spark):
    """encode -> decode is the identity on (customerName,email,phone,birthDay),
    including unicode, empty strings, and JSON-hostile characters."""
    people = [
        ("Sam Test", "sam.test@test.com", "8015551212", "2001-01-03"),
        ("Trevor Anderson", "Trevor.Anderson@test.com", "8015551212", "1946-01-01"),
        ("Zoë Müller", "zoe@example.com", "", "1999-12-31"),
        ('quote " backslash \\', "q@ex.com", "000", "1970-01-01"),
        ("", "empty.name@ex.com", "1", "2000-02-29"),
    ]
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
    got = {
        (r.customerName, r.email, r.phone, r.birthDay)
        for r in decode_redis_envelope(wire).collect()
    }
    assert got == set(people)


def test_birth_year_extraction(spark):
    df = spark.createDataFrame(
        [
            ("a@x.com", "1961-09-01"),
            ("b@x.com", "2001-01-03"),
            (None, "1999-01-01"),  # filtered: null email
            ("c@x.com", None),  # filtered: null birthDay
        ],
        "email string, birthDay string",
    )
    got = {(r.email, r.birthYear) for r in customer_birth_year(df).collect()}
    assert got == {("a@x.com", "1961"), ("b@x.com", "2001")}


def test_malformed_json_is_null_filtered(spark):
    """PERMISSIVE parse: malformed envelope/customer JSON becomes nulls and
    is dropped by the IS NOT NULL filter, not an exception
    (SURVEY.md §1.3; reference relies on this at sparkpykafkajoin.py:125-127)."""
    rows = [
        ("this is not json",),
        ('{"key":"Q3VzdG9tZXI=","zSetEntries":[]}',),  # empty array -> [0] is null
        (_envelope("not-a-customer-doc!"),),  # inner doc malformed
        (_envelope({"customerName": "OK", "email": "ok@x.com", "phone": "1",
                    "birthDay": "1980-05-05"}),),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = customer_birth_year(decode_redis_envelope(df)).collect()
    assert [(r.email, r.birthYear) for r in out] == [("ok@x.com", "1980")]


def test_redundant_lowercase_zsetentries_ignored(spark):
    """Live payloads carry a redundant lowercase `zsetEntries` field; only
    the camelCase one is parsed (sparkpykafkajoin.py:75-81)."""
    doc = {"customerName": "Real", "email": "real@x.com", "phone": "1",
           "birthDay": "1990-01-01"}
    decoy = {"customerName": "Decoy", "email": "decoy@x.com", "phone": "2",
             "birthDay": "1991-01-01"}
    env = json.loads(_envelope(doc))
    env["zsetEntries"] = json.loads(_envelope(decoy))["zSetEntries"]
    df = spark.createDataFrame([(json.dumps(env),)], "value string")
    rows = decode_redis_envelope(df).collect()
    assert [r.email for r in rows] == ["real@x.com"]


def test_stedi_event_score_quoted_and_unquoted(spark):
    """FIXTURES.md §3: score arrives both as JSON number and JSON string;
    both must parse to the same double."""
    rows = [
        ('{"customer":"a@x.com","score":-16.0,"riskDate":"2023-03-20T15:05:09.155Z"}',),
        ('{"customer":"b@x.com","score":"28.5","riskDate":"2020-09-14T07:54:06.417Z"}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = {(r.customer, r.score) for r in parse_stedi_events(df).collect()}
    assert got == {("a@x.com", -16.0), ("b@x.com", 28.5)}
