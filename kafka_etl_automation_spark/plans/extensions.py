"""Scale-extension queries: dedup, similarity search, text analysis.

These go beyond the reference's own surface (per the north star in
BASELINE.json): the operators a 100 TB training-data pipeline needs.
Implementations live in kafka_etl_automation_spark.operators.*; this module
registers them as named queries with DuckDB oracles where SQL-expressible.
"""

from __future__ import annotations

# Populated in the extensions milestone (operators/dedup.py, similarity.py,
# text.py). Imported by plans/__init__ so registration is centralized.
