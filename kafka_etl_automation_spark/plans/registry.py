"""Query registry: name -> PySpark builder + DuckDB oracle SQL.

Mirrors the reference's differential-testing method (SURVEY.md §5): each
operator is validated by running the Spark plan and an independent ANSI-SQL
oracle over the same tables and requiring identical row sets — the Spark
analog of the reference's source-query vs target-query MINUS checks
(/root/reference/FACT_AUTOMATION.sh:182-193).

Determinism rules for hash-matching the oracle:
- every computed column is aliased identically on both sides;
- double aggregations go through DECIMAL so the sum is order-independent
  and exact, then CAST to DOUBLE at the end (bit-identical both engines);
- window rankings always carry a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL over the same views
    (omit for non-SQL-expressible ops -> driver runs a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
