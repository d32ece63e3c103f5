"""spark_kafka_realm_time_data_pipeline_spark — a PySpark-native analytics
engine with the query/data-processing capabilities of the STEDI real-time
pipeline (reference: Hyacinth-Ali/spark-kafka-realm-time-data-pipeline),
rebuilt Spark-first and extended with the relational algebra and
LLM-data-pipeline operators described in SURVEY.md §2.
"""

from .session import get_spark  # noqa: F401
