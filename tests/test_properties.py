"""Property-based tests (hypothesis): invariants that must hold for ANY
input, mirroring the reference's metadata-derived assertion style
(SURVEY §5.3 — checks generated from structure, not hand-picked cases).

Examples are kept small (local Spark round-trips are ~100ms each); the
value is the generator exploring edge shapes (empty frames, all-duplicate
keys, null attributes, unicode text) that hand-written cases miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_etl_automation_spark import quality, scd
from kafka_etl_automation_spark.operators import dedup

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=40,
)
# unique keys: scd_merge's dropDuplicates picks an arbitrary row per key,
# so duplicate-key snapshots would make value assertions ambiguous
snapshots = st.dictionaries(
    st.integers(0, 5), st.one_of(st.none(), st.text(max_size=5)), max_size=6
).map(lambda d: sorted(d.items()))


@given(rows=snapshots, rows2=snapshots)
@settings(**SETTINGS)
def test_scd2_invariants(spark, rows, rows2):
    """For any two snapshots: (a) at most one current row per key, (b) every
    incoming key is current with its incoming value, (c) re-merging the
    same snapshot changes nothing (idempotence)."""
    snap1 = spark.createDataFrame(rows, "k long, seg string") if rows else None
    snap2 = spark.createDataFrame(rows2, "k long, seg string") if rows2 else None
    if snap1 is None or snap2 is None:
        return
    d1 = scd.scd_merge(None, snap1, ["k"], "2", 1)
    d2 = scd.scd_merge(d1, snap2, ["k"], "2", 2)

    cur = scd.current_rows(d2)
    per_key = cur.groupBy("k").count().filter("count > 1")
    assert per_key.isEmpty(), "multiple current rows for a key"

    incoming = dict(rows2)
    current = {r.k: r.seg for r in cur.collect()}
    for k, v in incoming.items():
        assert current.get(k, "<missing>") == v

    d3 = scd.scd_merge(d2, snap2, ["k"], "2", 3)
    a = sorted(map(tuple, scd.current_rows(d3).select("k", "seg").collect()))
    b = sorted(map(tuple, cur.select("k", "seg").collect()))
    assert a == b, "re-merging the same snapshot must not change current state"


@given(docs=st.lists(st.tuples(st.integers(0, 50), texts), min_size=1, max_size=10))
@settings(**SETTINGS)
def test_exact_dedup_conserves_rows(spark, docs):
    """Sum of n_copies == input rows; canonical ids are real doc ids."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.exact_dedup(df).collect()
    assert sum(r.n_copies for r in out) == len(docs)
    ids = {d for d, _ in docs}
    assert all(r.canonical_id in ids for r in out)


@given(docs=st.lists(st.tuples(st.integers(0, 50), texts), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_shingles_never_error_and_normalization_idempotent(spark, docs):
    """Any text (unicode, empty, whitespace-only) must shingle without
    error, and normalizing twice equals normalizing once."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = df.select(
        dedup.shingles("text", 3).alias("sh"),
        dedup.normalized_text("text").alias("n1"),
        dedup.normalized_text(dedup.normalized_text("text")).alias("n2"),
        F.size(F.split(dedup.normalized_text("text"), " ")).alias("ntok"),
    ).collect()
    for r in rows:
        assert r.n1 == r.n2
        if r.ntok >= 3:
            assert len(r.sh) >= 1
        else:
            assert r.sh == []


@given(
    rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), max_size=12)
)
@settings(**SETTINGS)
def test_quality_checks_consistent(spark, rows):
    """count_check(df, df) always passes; dup_check fails iff a key
    repeats; data_diff(df, df) always passes."""
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, v int")
    assert quality.count_check(df, df).first().status == "PASS"
    assert quality.data_diff(df, df).first().status == "PASS"
    has_dup = len({k for k, _ in rows}) < len(rows)
    got = quality.dup_check(df, ["k", "v"]).first().status
    expect_dup = len({(k, v) for k, v in rows}) < len(rows)
    assert got == ("FAIL" if expect_dup else "PASS")


budget_rows = st.lists(
    st.tuples(
        st.integers(1, 200),            # n_tokens
        st.sampled_from([0.1, 0.25, 0.5, 0.5, 0.75, 0.9]),  # quality, tie-rich
    ),
    min_size=0,
    max_size=12,
)


@given(rows=budget_rows, budget=st.integers(0, 800))
@settings(**SETTINGS)
def test_token_budget_matches_global_greedy(spark, rows, budget):
    """For ANY scored corpus and budget, the two-pass cutoff selection must
    equal the naive global greedy (order by quality DESC, id ASC, take
    while running token sum <= budget) — including tie-heavy boundaries."""
    from kafka_etl_automation_spark.operators import curation

    scored_rows = [(i, n, q) for i, (n, q) in enumerate(rows)]
    expected, cum = set(), 0
    for i, n, q in sorted(scored_rows, key=lambda r: (-r[2], r[0])):
        cum += n
        if cum > budget:
            break
        expected.add(i)
    scored = spark.createDataFrame(
        scored_rows, "doc_id long, n_tokens long, quality double"
    )
    got = {
        r.doc_id
        for r in curation.token_budget_select(scored, budget=budget).collect()
    }
    assert got == expected


@given(
    vals=st.lists(
        st.decimals(
            min_value="-99999.99", max_value="99999.99", places=2
        ),
        min_size=1,
        max_size=40,
    ),
    nparts=st.sampled_from([1, 3, 8]),
)
@settings(**SETTINGS)
def test_exact_sum_equals_plain_decimal_sum(spark, vals, nparts):
    """exact_sum's hi/lo compact split must equal the plain (non-compact)
    decimal SUM exactly — any values incl. negatives, any partitioning."""
    from pyspark.sql import functions as F

    from kafka_etl_automation_spark.functions.scalar import exact_sum

    df = spark.createDataFrame(
        [(str(v),) for v in vals], "s string"
    ).repartition(nparts).select(F.col("s").cast("decimal(8,2)").alias("x"))
    got = df.agg(exact_sum(F.col("x"), scale=2).alias("s")).collect()[0].s
    want = df.agg(F.sum(F.col("x").cast("decimal(12,2)")).alias("s")).collect()[0].s
    assert got == want


@given(
    vals=st.lists(
        st.decimals(
            min_value="-99.9999999999", max_value="99.9999999999", places=10
        ),
        min_size=1,
        max_size=40,
    ),
    nparts=st.sampled_from([1, 3, 8]),
)
@settings(**SETTINGS)
def test_exact_sum_scale10_equals_plain_decimal_sum(spark, vals, nparts):
    """exact_sum_scale10's three-way compact split must equal the plain
    decimal(30,10) SUM exactly — any values incl. negatives, any
    partitioning (the centroid-mean shape exact_sum's scale<=7 cannot
    serve)."""
    from pyspark.sql import functions as F

    from kafka_etl_automation_spark.functions.scalar import exact_sum_scale10

    df = spark.createDataFrame(
        [(str(v),) for v in vals], "s string"
    ).repartition(nparts).select(F.col("s").cast("decimal(30,10)").alias("x"))
    got = df.agg(exact_sum_scale10(F.col("x")).alias("s")).collect()[0].s
    want = df.agg(F.sum("x").alias("s")).collect()[0].s
    assert got == want


def test_decimal_to_double_2p53_rule():
    """Pin the cross-engine conversion mechanism behind the round-5 a3
    catch: a decimal whose scaled integer exceeds 2^53 double-rounds
    through DuckDB's int128 -> double -> x10^-scale path (vs Python/Java
    single correct rounding), and rounding the decimal to a small scale
    first removes the divergence. Guards the scalar.dsum rule against
    DuckDB behavior changes; the a3/bigram gate hashes pin the queries
    themselves.
    """
    from decimal import Decimal

    import duckdb

    con = duckdb.connect()
    # 2^53 + 1 is the first unrepresentable odd integer; at scale 6 the
    # decimal (2^53+1)/1e6 has scaled int 2^53+1 and an exactly-half ulp
    # tail, the worst case for the two-step conversion.
    val = Decimal(2**53 + 1) / Decimal(10**6)
    (duck,) = con.execute(
        "SELECT CAST(CAST($v AS DECIMAL(38,6)) AS DOUBLE)", {"v": str(val)}
    ).fetchone()
    correct = float(val)  # Python: single correct rounding, like Java
    # the mechanism: two-step conversion lands one ulp off here
    assert duck != correct
    # the fix: reduce scale below the 2^53 bound first -> exact in both
    (duck_fixed,) = con.execute(
        "SELECT CAST(round(CAST($v AS DECIMAL(38,6)), 2) AS DOUBLE)",
        {"v": str(val)},
    ).fetchone()
    want = float(val.quantize(Decimal("0.01")))
    assert duck_fixed == want
