"""Scalar/aggregate helpers (SURVEY.md §2.8).

The reference's scalar surface is Oracle built-ins (NVL, TO_DATE, TO_NUMBER,
CASE, LISTAGG — /root/reference/query.txt:1, FACT_AUTOMATION.sh:49); here
each maps to a JVM-side Catalyst expression — no Python UDFs anywhere on
this path, so every use stays inside whole-stage codegen.

Determinism note: double addition is not associative, so a parallel SUM of
doubles is run-order dependent. Aggregating through DECIMAL makes the sum
exact and order-independent — mandatory for differential testing against
another engine, and a good idea at 100 TB where partition counts (and thus
summation order) change run to run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast to DECIMAL for exact, order-independent arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact SUM of a double column: decimal-accumulate, emit double.

    The emitted double is bit-identical across engines/partitionings because
    the decimal value is exact and decimal->double conversion is IEEE
    round-to-nearest in both Spark and DuckDB.
    """
    return F.sum(dec(col, precision, scale)).cast("double")


def nvl(col: Column | str, default) -> Column:
    """Oracle NVL (/root/reference/FACT_AUTOMATION.sh:49) -> coalesce."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


