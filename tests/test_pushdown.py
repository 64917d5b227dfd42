"""Scan hygiene: filters must reach the parquet reader (PushedFilters) and
projections must prune the read schema — at 100 TB the difference between
scanning 2 columns and scanning 20 is the job."""

from __future__ import annotations

import contextlib
import io as _io

import pytest

from kafka_etl_automation_spark.catalog import load_table


def physical_plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_filter_pushed_to_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000.0
    ).select("o_orderkey", "o_totalprice")
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThan(o_totalprice" in plan, plan


def test_projection_prunes_read_schema(spark, sf_dir):
    df = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plan = physical_plan(df)
    # ReadSchema carries only the projected columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "c_custkey" in read[0] and "c_name" in read[0]
    assert "c_acctbal" not in read[0], read[0]


def test_registered_query_scans_are_pruned(spark, sf_dir):
    """A representative registered query: predicate pushed AND schema
    pruned on the big-side scan."""
    import __spark_entry__ as m

    df = m.queries()["p2_eq_filter"](spark, sf_dir)
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan
    # '*' marks whole-stage-codegen'd operators in formatted explain —
    # the filter/projection must stay JVM-side
    assert "* Filter" in plan and "* Project" in plan, plan
