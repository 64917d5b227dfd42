"""kafka_etl_automation_spark — a PySpark-native streaming + batch ETL/analytics engine.

Re-implements, Spark-first, the capability surface of the reference harness
``Sharan-Shivamurthy1/Kafka-ETL-Automation`` (a Bash/Oracle/Hive test-automation
suite for a Kafka -> landing -> conformed -> staging -> 3NF -> dimensional
pipeline), per /root/repo/SURVEY.md. Nothing here is a port: the reference
ships SQL text to Oracle/Hive; this engine expresses the same operators as
DataFrame/SQL logical plans and lets Catalyst/Tungsten pick physical
execution. Extensions (dedup, similarity search, text analysis) target
100 TB-scale training-data pipelines.
"""

__version__ = "0.1.0"

from kafka_etl_automation_spark.session import get_spark  # noqa: F401
from kafka_etl_automation_spark.catalog import load_tables, TABLE_NAMES  # noqa: F401
