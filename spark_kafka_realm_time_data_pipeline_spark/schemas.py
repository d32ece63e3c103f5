"""Declared schemas — the engine's schema registry.

The reference declares every schema by hand (schema inference deliberately
off): the Redis CDC envelope at ``sparkpykafkajoin.py:8-21``, the customer
document at ``:25-30``, and the risk event at ``:164-168``.  The new engine
keeps explicit ``StructType`` declarations but types data *honestly*
(``score: double``, ``riskDate: timestamp``, ``birthDay: date``) with casts
at the ingestion edge — the reference's all-string typing (SURVEY.md §1.2) is
a limitation, not a semantic requirement.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Reference-parity schemas (string-typed, matching the wire format) -----

# Redis CDC envelope on the `redis-server` topic (sparkpykafkajoin.py:8-21).
# The live payload also carries a redundant lowercase `zsetEntries` field;
# declaring only `zSetEntries` ignores it, same as the reference (:75-81).
REDIS_ENVELOPE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("existType", StringType()),
        StructField("Ch", BooleanType()),
        StructField("Incr", BooleanType()),
        StructField(
            "zSetEntries",
            ArrayType(
                StructType(
                    [
                        StructField("element", StringType()),
                        StructField("score", StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Customer JSON decoded from zSetEntries[0].element (sparkpykafkajoin.py:25-30).
CUSTOMER_WIRE_SCHEMA = StructType(
    [
        StructField("customerName", StringType()),
        StructField("email", StringType()),
        StructField("phone", StringType()),
        StructField("birthDay", StringType()),
    ]
)

# Risk event JSON on the `stedi-events` topic (sparkpykafkajoin.py:164-168).
STEDI_EVENT_WIRE_SCHEMA = StructType(
    [
        StructField("customer", StringType()),
        StructField("score", StringType()),
        StructField("riskDate", StringType()),
    ]
)

# --- Honest-typed variants (the engine's internal model) --------------------

CUSTOMER_SCHEMA = StructType(
    [
        StructField("customerName", StringType()),
        StructField("email", StringType()),
        StructField("phone", StringType()),
        StructField("birthDay", DateType()),
    ]
)

STEDI_EVENT_SCHEMA = StructType(
    [
        StructField("customer", StringType()),
        StructField("score", DoubleType()),
        StructField("riskDate", TimestampType()),
    ]
)

# --- Synthetic test-corpus schemas (TESTDATA.md) ----------------------------

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", LongType()),
    ]
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
