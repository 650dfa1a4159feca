"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent: Spark's partial aggregation adds
partition subtotals in a partitioning-dependent order, while a single-node
engine (the DuckDB oracle) adds sequentially — the two can differ in the last
ulp and break value-hash comparisons. These helpers accumulate in DECIMAL
(exact, associative, order-insensitive) and cast the final result back to
DOUBLE, so the same SQL shape on any engine yields bit-identical results at
any parallelism. This is also the right call at 100 TB: decimal partial
aggregation is still map-side combinable and shuffle-friendly, and the result
does not drift as the cluster re-partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default decimal shape: 25 digits / 6 fractional covers sums of ~1e12
#: row-values at 1e13 rows without overflow on intermediate (Spark widens
#: the sum type by +10 digits automatically).
DEFAULT_PRECISION = 25
DEFAULT_SCALE = 6


def dsum(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive SUM: cast each value to decimal, sum exactly, cast
    back to double. SQL twin: ``cast(sum(cast(x as decimal(25,6))) as double)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({DEFAULT_PRECISION},{scale})")).cast("double")


def dsum_dec(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Exact decimal SUM with NO final double cast — for mergeable /
    incremental aggregates (cdc.maintain_agg) where partial decimal sums
    are combined across batches first: decimal addition is exact and
    associative, so (old + delta) equals a full recompute bit-for-bit,
    which would NOT hold after a per-batch double rounding. Cast to
    double (or round) only at the presentation edge."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({DEFAULT_PRECISION},{scale})"))


def davg(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-insensitive AVG as exact-sum / count.
    SQL twin: ``cast(sum(cast(x as decimal(25,6))) as double) / count(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """The SQL twin of :func:`dsum` for DuckDB oracle queries.

    The final decimal→double hop goes THROUGH VARCHAR: DuckDB's direct
    decimal→double cast divides the int128 payload by 10^scale in
    floating point (two roundings), which diverges from Spark's
    correctly-rounded BigDecimal.doubleValue by 1 ulp once the sum
    exceeds 2^53 micro-units (~9e9 in value units — first observed on
    sf1 TPC-H Q1 sums). decimal→string is exact and string→double is
    correctly-rounded strtod, so this route matches Spark bit-for-bit
    at any magnitude; below the boundary both routes agree, so the
    sf0.01 driver gate is unaffected."""
    return (
        "cast(cast(sum(cast("
        f"{expr} as decimal({DEFAULT_PRECISION},{scale}))) as string) as double)"
    )


def davg_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    return f"({dsum_sql(expr, scale)} / count({expr}))"


def floor6(col: Column | str) -> Column:
    """Engine-identical 6-decimal quantization: floor(x*1e6 + 0.5)/1e6.

    Use this — never ``F.round`` / SQL ``round()`` / ``np.round`` — for
    any float that feeds a cross-engine value hash: engine round()
    semantics differ exactly at half boundaries (Spark rounds the
    double's exact decimal expansion HALF_UP, DuckDB multiplies by 1e6
    first, numpy rounds half-EVEN; a knife-edge value at sf1 produced
    43.472812 vs 43.472813), while these three double ops are identical
    everywhere. SQL twin: :func:`floor6_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def floor6_sql(expr: str) -> str:
    """The DuckDB twin of :func:`floor6`."""
    return f"floor(({expr}) * 1e6 + 0.5) / 1e6"
