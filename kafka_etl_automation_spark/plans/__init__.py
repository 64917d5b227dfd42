"""Named query plans — the correctness surface.

Importing this package populates the registry with every implemented
operator from SURVEY.md §2 (plus the scale extensions), each as a
(PySpark builder, DuckDB oracle SQL) pair.
"""

from kafka_etl_automation_spark.plans.registry import QUERIES, ORACLES, register  # noqa: F401

# Populate the registry.
from kafka_etl_automation_spark.plans import relational  # noqa: F401,E402
from kafka_etl_automation_spark.plans import extensions  # noqa: F401,E402
from kafka_etl_automation_spark.plans import lifecycle  # noqa: F401,E402
