"""Structured-Streaming ingest layer (S1/S2/S4, T1-T4)."""

from kafka_etl_automation_spark.streaming.enrich import interval_join  # noqa: F401
from kafka_etl_automation_spark.streaming.ingest import (  # noqa: F401
    AUDIT_SCHEMA,
    IngestResult,
    ProgressAuditListener,
    conservation_check,
    contiguity_violations,
    exactly_once_dedup,
    kafka_batch_source,
    kafka_stream_source,
    parse_kafka_records,
    read_audit,
    run_file_ingest,
    to_kafka_shape,
)
