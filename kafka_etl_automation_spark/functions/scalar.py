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

    The emitted double is bit-identical across engines/partitionings
    PROVIDED the scaled integer (value x 10^scale) stays under 2^53: the
    decimal value is exact, and below that bound both engines' decimal->
    double conversions are a single exact int->double. Above it, Java
    still single-rounds (BigDecimal.doubleValue) but DuckDB's int128 ->
    double -> x10^-scale path double-rounds — the round-5 30x sweep
    caught a real 1-ulp divergence this way (a3 sum_charge at scale 6).
    Rule: cap the emitted scale so |sum| x 10^scale < 2^53 with margin —
    round/cast the exact decimal to a smaller scale (money: 2 dp; ratios:
    <= 10 dp for sums < 1e4) BEFORE the double cast, identically in both
    engines (Spark decimal cast = HALF_UP; DuckDB round(), since its
    decimal CAST truncates). Audit of every decimal-sum->double site is
    in BENCH_SCALE.md's catch #6 note and the a3/bigram docstrings.
    """
    return F.sum(dec(col, precision, scale)).cast("double")


def _guarded_floor(col: Column, int_digits: int) -> Column:
    """floor(col) cast to decimal(int_digits,0), raising loudly on any row
    whose integer part does not fit: with ANSI off, the overflow would cast
    to NULL and silently corrupt the hi/lo split sums (ADVICE r05). The
    guard stays inside whole-stage codegen (when + raise_error are both
    codegen expressions), so the compact-buffer speed the split exists for
    is unaffected.

    The bound must hold for the FLOORED value, not |col| (ADVICE r06):
    floor(x) fits decimal(d,0) iff -(10^d - 1) <= floor(x) <= 10^d - 1,
    i.e. x >= -(10^d - 1) and x < 10^d — the old abs(x) < 10^d guard let
    fractional x in (-10^d, -(10^d - 1)) through, where floor(x) = -10^d
    overflows to NULL. NULL inputs pass through as NULL (decimal-typed so
    both when-branches agree) and are skipped by SUM, matching plain
    SUM's NULL semantics instead of aborting (ADVICE r06)."""
    bound = 10 ** int_digits
    return (
        F.when(col.isNull(), F.lit(None).cast(f"decimal({int_digits},0)"))
        .when(
            (col >= F.lit(-(bound - 1))) & (col < F.lit(bound)),
            F.floor(col).cast(f"decimal({int_digits},0)"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    f"exact_sum input out of range: floor(x) outside "
                    f"+-(1e{int_digits}-1) overflows the compact hi buffer "
                    f"(see functions/scalar.py)"
                )
            )
        )
    )


def exact_sum(col: Column, scale: int, int_digits: int = 8) -> Column:
    """Order-independent exact SUM of a decimal column at compact-decimal
    speed: hi/lo split so both sum buffers stay <= 18 digits.

    Spark stores Decimal values with precision <= 18 in a plain long
    (compact) and mutates aggregate buffers in place; a SUM over input
    precision > 8 gets a buffer of precision p+10 > 18, which falls into
    per-row BigDecimal boxing — measured 8-13x slower on the round-5
    scale-proof (sf3.0: sum(decimal(12,2)) 7.9s vs 1.0s for the same sum
    with a compact buffer; a3_pricing_summary 22.6s -> ~3s). The split

        sum(x) = sum(floor(x)) + sum(x - floor(x))

    is exact for any decimal x (also negative: x - floor(x) in [0,1)), so
    the result is the same exact decimal — bit-identical after cast to
    double, and still partition-order independent, because integer
    arithmetic is associative. Buffer headroom at 100 TB: hi sums in
    decimal(18,0) (capacity 1e18 ~ 1e12 lineitem-sized rows x 1e5 values);
    lo sums in decimal(18,scale) (capacity 10^(18-scale) rows of < 1.0
    each — ~1e12 at scale=6). Beyond that, pre-aggregate per partition
    first. ``scale`` must match the input column's decimal scale (<= 7);
    ``int_digits`` must cover the integer part of every value (a too-small
    cast would NULL out rows under non-ANSI overflow) — 8 covers any
    per-row value < 1e8 while keeping the buffer compact.
    """
    if not 0 <= scale <= 7:
        raise ValueError(f"exact_sum supports scale 0..7, got {scale}")
    if not 1 <= int_digits <= 8:
        raise ValueError(f"int_digits must be 1..8, got {int_digits}")
    hi = _guarded_floor(col, int_digits)
    lo = (col - F.floor(col)).cast(f"decimal(8,{scale})")
    return (F.sum(hi).cast(f"decimal(38,{scale})") + F.sum(lo)).cast(
        f"decimal(38,{scale})"
    )


def exact_sum_scale10(col: Column) -> Column:
    """Order-independent exact SUM of a decimal(p,10) column with every
    aggregate buffer compact: three-way split

        sum(x) = sum(floor(x)) + (sum(f1) + sum(f2)) * 1e-5

    where f1 = the first five fractional digits of r = x - floor(x)
    (as the integer floor(r * 1e5), r in [0,1) also for negative x) and
    f2 = the last five (a scale-5 decimal in [0,1)). Every split step is
    exact decimal arithmetic, so the result VALUE equals ``F.sum(col)``
    exactly — oracles over the plain decimal sum are unaffected — while
    the three sum buffers stay at precisions 18/16/18 (compact longs,
    in-place mutation) instead of the p+10 > 18 buffer of the plain sum,
    which boxes a BigDecimal per row (see exact_sum; measured 8-13x).
    The recombination stays exact by construction: sum(f1) is cast to
    decimal(20,5) (capacity ~1e15 rows of < 1e5 each — beyond exact_sum's
    documented 1e12-row headroom) so the final multiply's ideal precision
    (27,10) never exceeds 38, which is what would force Spark to shave
    scale digits. For |x| < 1e8 with scale 10 — the element-wise
    centroid-mean shape exact_sum's scale <= 7 limit cannot serve.
    """
    hi = _guarded_floor(col, 8)
    # r in [0,1) needs only decimal(11,10); narrowing it is what keeps the
    # *1e5 multiply's ideal type (18,10) under precision 38 — on the wide
    # intermediate type Spark would shave scale digits (precision loss)
    r = (col - F.floor(col)).cast("decimal(11,10)")
    r5 = r * F.lit(100000)  # d1..d5 . d6..d10, exact
    f1 = F.floor(r5).cast("decimal(6,0)")
    f2 = (r5 - F.floor(r5)).cast("decimal(8,5)")  # 5 digits, exact
    frac = (
        (F.sum(f1).cast("decimal(20,5)") + F.sum(f2).cast("decimal(20,5)"))
        .cast("decimal(20,5)")
        * F.lit(0.00001).cast("decimal(6,5)")
    )
    # hi's cast stays at (28,10) — 18 integer digits of capacity — so the
    # final add's ideal precision is 29, not the 39 that (38,10) + frac
    # would demand (39 > 38 again shaves a scale digit)
    return (F.sum(hi).cast("decimal(28,10)") + frac).cast("decimal(38,10)")


def nvl(col: Column | str, default) -> Column:
    """Oracle NVL (/root/reference/FACT_AUTOMATION.sh:49) -> coalesce."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


