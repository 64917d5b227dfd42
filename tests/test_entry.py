"""Driver-contract tests: __spark_entry__ on a vanilla session.

This is the test that would have caught round 1's failure: every query must
run on a session built WITHOUT the engine's factory confs.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

from tests.conftest import SF_SMALL


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert "c_custkey" in df.columns or len(df.columns) > 0


def test_queries_and_oracles_aligned():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(qs) >= 50
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle without query: {unknown}"


def test_events_table_readable_on_vanilla_session(spark):
    """events.parquet is TIMESTAMP(NANOS); the catalog must make it
    readable on any session (the round-1 killer)."""
    from kafka_etl_automation_spark.catalog import load_table

    df = load_table(spark, SF_SMALL, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() > 0


def test_representative_queries_run_on_vanilla_session(spark):
    qs = entry_mod.queries()
    for name in ("flagship_dim_customer", "a3_pricing_summary",
                 "w1_latest_per_group", "ext_exact_dedup", "q1_count_check"):
        df = qs[name](spark, SF_SMALL)
        assert df.count() >= 0, name
