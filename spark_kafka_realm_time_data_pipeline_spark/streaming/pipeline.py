"""The STEDI pipeline, re-expressed — batch and streaming twins.

Reference flagship: ``sparkpykafkajoin.py`` — two Kafka topics, codec
chains, and an unbounded stream-stream inner equi-join on
``customer = email`` (:184-187) republished to Kafka (:202-209).

Engine version:
- the transformation graph is shared code (functions/codec.py) that works on
  both batch and streaming DataFrames (Structured Streaming's unbounded-table
  model makes them the same API);
- the streaming join is **watermarked** with a time-range condition so state
  is evicted — fixing the reference's unbounded-state defect
  (SURVEY.md §2.6 defect (b)); the reference's exact (unbounded) semantics
  remain available via ``watermark=None`` for parity testing;
- sinks are pluggable (kafka / memory / foreachBatch) instead of the
  reference's hardcoded console+kafka pair with the dead second sink
  (sparkpykafkajoin.py:211).

At cluster scale the join shuffles both sides hash-partitioned on the key
into ``StreamingSymmetricHashJoinExec``; watermark TTL bounds per-partition
state, and the RocksDB state store (config, not code) holds it off-heap.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import (
    customer_birth_year,
    decode_redis_envelope,
    encode_customer_envelope,
    parse_stedi_events,
    serialize_risk_output,
)
from ..sources.files import load_table

# Deterministic synthetic identity derivation shared by both sides of the
# flagship join (and mirrored in the DuckDB oracle SQL): the corpus has no
# email/birthday columns, so they are derived from the integer key.
EMAIL_SQL = "concat('user', cast({k} as string), '@test.com')"
BIRTHDAY_SQL = "date_add(date'1940-01-01', cast(({k} * 73) % 21915 as int))"


def synth_customer_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer.parquet -> Redis-CDC envelope stream analog (FIXTURES.md §5):
    each row becomes one envelope JSON value, exactly the wire shape the
    Kafka Connect Redis source produces (Guide.ipynb cell 2)."""
    cust = load_table(spark, sf_dir, "customer")
    enriched = cust.select(
        F.col("c_name"),
        F.expr(EMAIL_SQL.format(k="c_custkey")).alias("email"),
        F.expr(f"cast({BIRTHDAY_SQL.format(k='c_custkey')} as string)").alias("birthDay"),
    )
    return encode_customer_envelope(
        enriched,
        {
            "customerName": F.col("c_name"),
            "email": F.col("email"),
            "phone": F.lit("8015551212"),
            "birthDay": F.col("birthDay"),
        },
    )


def synth_event_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet -> stedi-events JSON analog: customer=derived email,
    score=value, riskDate=ts (FIXTURES.md §3/§5)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.to_json(
            F.struct(
                F.expr(EMAIL_SQL.format(k="user_id")).alias("customer"),
                F.col("value").alias("score"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("riskDate"),
            )
        ).alias("value")
    )


def stedi_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full flagship pipeline, batch mode: encode -> decode chain -> filter ->
    derive -> join -> project.  Returns (customer, score, email, birthYear)."""
    customers = customer_birth_year(decode_redis_envelope(synth_customer_wire(spark, sf_dir)))
    risk = parse_stedi_events(synth_event_wire(spark, sf_dir)).select("customer", "score")
    # No static broadcast hint: the customer side grows with SF, so a
    # hardcoded broadcast becomes an OOM at scale.  AQE converts the
    # shuffle join to broadcast-hash at runtime whenever the built side
    # is actually under the threshold (verified in tests/test_plans.py).
    joined = risk.join(customers, F.expr("customer = email"))
    return joined.select("customer", "score", "email", "birthYear")


def stedi_batch_serialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship + Kafka-sink projection (sparkpykafkajoin.py:202)."""
    return serialize_risk_output(stedi_batch(spark, sf_dir))


# --- Streaming twin ---------------------------------------------------------

# Wire timestamp pinned mid-corpus (events span 2024-01): every event falls
# inside the ±45-day join window, so the watermarked streaming join is
# result-equivalent to the batch equi-join — which is what makes it
# oracle-checkable while still exercising state eviction machinery.
CUSTOMER_WIRE_TS = "2024-01-15 00:00:00"
JOIN_WINDOW_SECONDS = 45 * 24 * 3600


def synth_customer_wire_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of synth_customer_wire: (value, ts) rows from a file
    source — the bounded analog of the `redis-server` Kafka topic."""
    from ..sources.files import stream_table

    cust = stream_table(spark, sf_dir, "customer")
    enriched = cust.select(
        F.col("c_name"),
        F.expr(EMAIL_SQL.format(k="c_custkey")).alias("email"),
        F.expr(f"cast({BIRTHDAY_SQL.format(k='c_custkey')} as string)").alias("birthDay"),
    )
    wire = encode_customer_envelope(
        enriched,
        {
            "customerName": F.col("c_name"),
            "email": F.col("email"),
            "phone": F.lit("8015551212"),
            "birthDay": F.col("birthDay"),
        },
    )
    return wire.withColumn("ts", F.lit(CUSTOMER_WIRE_TS).cast("timestamp"))


def synth_event_wire_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of synth_event_wire: (value, ts) rows — the bounded
    analog of the `stedi-events` Kafka topic (event time = corpus ts)."""
    from ..sources.files import stream_table

    ev = stream_table(spark, sf_dir, "events")
    return ev.select(
        F.to_json(
            F.struct(
                F.expr(EMAIL_SQL.format(k="user_id")).alias("customer"),
                F.col("value").alias("score"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("riskDate"),
            )
        ).alias("value"),
        F.col("ts"),
    )


def build_streaming_stedi(
    spark: SparkSession,
    customer_wire: DataFrame,
    event_wire: DataFrame,
    watermark: str | None = "2 hours",
    join_window_seconds: int = 3600,
    join_type: str = "inner",
) -> DataFrame:
    """Watermarked streaming STEDI join (see stedi_streaming_join doc).

    Both inputs: streaming DF with columns (value: string, ts: timestamp).
    """
    from ..schemas import CUSTOMER_WIRE_SCHEMA, REDIS_ENVELOPE_SCHEMA, STEDI_EVENT_WIRE_SCHEMA

    customers = (
        customer_wire.withColumn(
            "env", F.from_json(F.col("value").cast("string"), REDIS_ENVELOPE_SCHEMA)
        )
        .withColumn(
            "customer_doc",
            F.from_json(
                F.unbase64(
                    F.try_element_at("env.zSetEntries", F.lit(1)).getField("element")
                ).cast("string"),
                CUSTOMER_WIRE_SCHEMA,
            ),
        )
        .select(
            F.col("customer_doc.email").alias("email"),
            F.split("customer_doc.birthDay", "-").getItem(0).alias("birthYear"),
            F.col("ts").alias("cust_ts"),
        )
        .filter(F.col("email").isNotNull())
    )
    risk = event_wire.withColumn(
        "ev", F.from_json(F.col("value").cast("string"), STEDI_EVENT_WIRE_SCHEMA)
    ).select(
        F.col("ev.customer").alias("customer"),
        F.col("ev.score").cast("double").alias("score"),
        F.col("ts").alias("risk_ts"),
    )
    if watermark is not None:
        customers = customers.withWatermark("cust_ts", watermark)
        risk = risk.withWatermark("risk_ts", watermark)
        cond = F.expr(
            "customer = email AND "
            f"risk_ts BETWEEN cust_ts - INTERVAL {join_window_seconds} SECONDS "
            f"AND cust_ts + INTERVAL {join_window_seconds} SECONDS"
        )
    else:
        cond = F.expr("customer = email")
    return risk.join(customers, cond, join_type).select(
        "customer", "score", "email", "birthYear"
    )


def assemble_stedi_stream(
    spark: SparkSession,
    cust_raw: DataFrame,
    ev_raw: DataFrame,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """The production composition between Kafka source and sink: binary->
    string cast (P1), decode chains, watermarked stream-stream join, sink
    projection.  Takes raw source DFs with the Kafka wire schema (key/value
    binary + timestamp), so a broker-less smoke can drive the exact same
    assembly from a `rate` source (tests/test_sinks.py) — catching option /
    column-name typos the builder unit tests can't."""
    from ..sources.kafka import cast_kv_string

    cust_wire = cast_kv_string(cust_raw).select("value", "ts")
    ev_wire = cast_kv_string(ev_raw).select("value", "ts")
    joined = build_streaming_stedi(spark, cust_wire, ev_wire, watermark=watermark)
    return serialize_risk_output(joined)


def stedi_kafka_pipeline(
    spark: SparkSession,
    bootstrap_servers: str = "localhost:9092",
    output_topic: str = "risk-score-topic",
    checkpoint_dir: str | None = None,
    watermark: str | None = "2 hours",
):
    """The complete reference pipeline over real Kafka — source topics,
    decode chains, stream-stream join, Kafka sink — for a cluster with a
    broker (sparkpykafkajoin.py end-to-end: sources :48-54/:136-142, join
    :184-187, sink :202-209).  Returns the started StreamingQuery; the
    caller owns awaitTermination.

    Differences from the reference, on purpose:
    - watermarked join (bounded state) unless watermark=None;
    - maxOffsetsPerTrigger backpressure on both sources;
    - no inline awaitTermination (its :209 made the :211 sink dead code).
    """
    from ..sources.kafka import REDIS_SERVER, STEDI_EVENTS, kafka_stream
    from .sinks import kafka_sink

    out = assemble_stedi_stream(
        spark,
        kafka_stream(spark, REDIS_SERVER),
        kafka_stream(spark, STEDI_EVENTS),
        watermark=watermark,
    )
    if checkpoint_dir is None:
        # stable default keyed by (cluster, topic) — NOT a per-call temp
        # dir (a restarted pipeline must find the same offset log) and NOT
        # topic-only (the same topic name on a different cluster must not
        # resume from the wrong cluster's offsets).  Production deployments
        # should still pass an explicit durable path: the system temp dir
        # does not survive reboots.
        import hashlib

        cluster_key = hashlib.md5(bootstrap_servers.encode()).hexdigest()[:8]
        checkpoint_dir = os.path.join(
            tempfile.gettempdir(), f"stedi_ckpt_{cluster_key}_{output_topic}"
        )
    return kafka_sink(
        out,
        topic=output_topic,
        bootstrap_servers=bootstrap_servers,
        checkpoint_dir=checkpoint_dir,
    )
