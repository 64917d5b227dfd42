from kafka_etl_automation_spark.functions.scalar import (  # noqa: F401
    dec,
    dsum,
    nvl,
    occurrences,
)
