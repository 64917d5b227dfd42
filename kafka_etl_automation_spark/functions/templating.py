"""F9: parameterized query templating.

The reference substitutes runtime values into stored query text with sed
(/root/reference/FACT_AUTOMATION.sh:116-128: ``TESTING_QUERIES`` rows +
``sed -e "s/$MIN_RUN_ID_CURRENT/${MIN}/g"``). The Spark-native form is
parameterized ``spark.sql(query, args=...)`` — named placeholders bound
server-side, no string-injection surface, plan cache friendly (SURVEY §7.4:
"No sed-based SQL templating").

``render_template`` keeps a literal-substitution fallback ONLY for
non-value tokens (table names, column lists) that SQL parameters cannot
bind; values always go through ``args``.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def run_template(
    spark: SparkSession, sql: str, args: dict[str, Any] | None = None
) -> DataFrame:
    """Execute templated SQL with named parameters (``:name`` markers)."""
    return spark.sql(sql, args=args or {})


_TOKEN = re.compile(r"\$\{(\w+)\}")


def render_template(sql: str, identifiers: dict[str, str]) -> str:
    """Substitute ``${token}`` *identifier* slots (table/column names) before
    parameter binding. Raises on unknown tokens so a typo cannot silently
    ship the template text, and validates substituted identifiers."""

    def sub(m: re.Match) -> str:
        tok = m.group(1)
        if tok not in identifiers:
            raise KeyError(f"template token ${{{tok}}} has no binding")
        val = identifiers[tok]
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", val):
            raise ValueError(f"identifier binding {tok}={val!r} is not a bare identifier")
        return val

    return _TOKEN.sub(sub, sql)
