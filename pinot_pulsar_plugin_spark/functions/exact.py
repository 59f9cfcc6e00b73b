"""Bit-reproducible aggregate helpers.

Floating-point ``SUM`` is order-dependent; Spark's partial aggregation
order varies with partitioning while the DuckDB oracle sums in its own
order, so a naive ``SUM(double)`` can differ in the last ulps and break
an exact value-hash comparison. These helpers make money-style
aggregates exactly reproducible on BOTH engines by summing integers:

    exact_sum(e)  =  SUM(CAST(ROUND(e * 10^d) AS BIGINT)) / 10^d

Each term is rounded once to ``d`` digits (decimal fixed-point), the sum
is exact 64-bit integer arithmetic (commutative — order can't matter),
and the final division by a power of ten is a single IEEE-deterministic
double op. The same formula is emitted as ANSI SQL for the oracle.

Overflow headroom (r11 audit, SCALING.md §7): with d=4, terms up to
9.2e14 and 1e9 rows per group stay within int64 — fine for
scaling-key grains (order/supplier/part/…), where per-key fan-in
bounds the group. For FIXED-grain groups (global/brand/nation/year…),
whose row count grows with the corpus past 1e10, use
``exact_sum_wide``/``exact_avg_wide``: identical per-row rounding, a
DECIMAL(38,0) accumulator, and the same correctly-rounded
integer→double conversion the DuckDB oracle applies to its int128
sum.

Also here: sequential left-to-right fold helpers for array dot products
(``F.aggregate`` in Spark ≡ ``list_reduce`` in DuckDB), which make
cosine similarity bit-identical across engines by fixing the reduction
order and accumulating in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(expr: Column, name: str, digits: int = 4) -> Column:
    """Order-independent fixed-point sum of a double expression."""
    scale = 10**digits
    return (F.sum(F.round(expr * scale).cast("long")) / float(scale)).alias(name)


def exact_avg(expr: Column, name: str, digits: int = 4) -> Column:
    """Order-independent average: integer sum / count / scale."""
    scale = 10**digits
    return (
        F.sum(F.round(expr * scale).cast("long")) / F.count(expr) / float(scale)
    ).alias(name)


def exact_sum_sql(sql_expr: str, name: str, digits: int = 4) -> str:
    scale = 10**digits
    return (
        f"SUM(CAST(ROUND(({sql_expr}) * {scale}) AS BIGINT)) / {scale}.0 AS {name}"
    )


def exact_avg_sql(sql_expr: str, name: str, digits: int = 4) -> str:
    scale = 10**digits
    return (
        f"SUM(CAST(ROUND(({sql_expr}) * {scale}) AS BIGINT)) / COUNT({sql_expr})"
        f" / {scale}.0 AS {name}"
    )


# Split unit for the wide accumulators: each fixed-point term t
# decomposes as t = hi·1e6 + lo with BOTH partial sums int64-safe at
# the 100 TB design point: |Σhi| ≤ n·(T/1e6 + 1) and |Σlo| ≤ n·2e6
# (|lo| < 1e6 canonically, < 2e6 if the double divide slips the
# quotient by one). Envelope covering every current call site:
# per-row terms T ≤ ~5.6e9 (o_totalprice ≈ 5.6e5 at d=4 — the largest
# money domain; line-level d=4 terms are ≤ ~1.3e9, quantities far
# less) and n ≤ ~1e12 rows/group ⇒ |Σhi| ≤ ~5.6e15, |Σlo| ≤ ~2e18 —
# both inside int64. A new call site must re-check T·n/1e6 + n·2e6
# against 9.2e18. The decomposition need not be canonical, only
# EXACT: hi comes from a double divide (±1 of the true quotient is
# fine) and lo = t − hi·1e6 is computed in long, so hi·1e6 + lo ≡ t
# always.
_WIDE_SPLIT = 10**6


def wide_fp_total(term: Column) -> Column:
    """Exact DECIMAL(38,0) total of a long fixed-point term over a
    group whose row count outgrows int64 accumulation (r11 100-TB
    audit, SCALING.md §7).

    The hot path stays pure long whole-stage codegen — two long sums
    per group — and the only decimal arithmetic is ONE recombine per
    OUTPUT GROUP (measured on q01 at sf0.1: +0.09s vs the long form,
    where a per-row DECIMAL(38,0) accumulator cost +1.6s). The result
    equals the Python-bigint sum exactly; DECIMAL→double downstream is
    the same correctly-rounded conversion the DuckDB oracle applies to
    its int128 sum."""
    hi = (term / _WIDE_SPLIT).cast("long")
    lo = term - hi * _WIDE_SPLIT
    return F.sum(hi).cast("decimal(38,0)") * _WIDE_SPLIT + F.sum(lo)


def exact_sum_wide(expr: Column, name: str, digits: int = 4) -> Column:
    """:func:`exact_sum` for groups at FIXED grain (global / flag /
    brand / nation / year / priority …) whose term count grows with
    the corpus (r11 100-TB audit, SCALING.md §7).

    At the 100 TB design point a fixed-grain group holds 1e10-6e11
    rows; with d=4 the int64 accumulator of :func:`exact_sum` passes
    9.2e18 (q01's sum_base_price measures ~3.6e19) and raises ANSI
    ARITHMETIC_OVERFLOW. Here each term is still rounded once to a
    double-exact integer (per-row fixed-point values are bounded far
    below 2^53 by the money/quantity domains) and totaled exactly via
    :func:`wide_fp_total` — order-independent, map-side combinable,
    long-codegen hot path. Keep plain :func:`exact_sum` for
    scaling-key grains (order/supplier/part/…), where per-group
    magnitude is bounded by per-key fan-in."""
    scale = 10**digits
    term = F.round(expr * scale).cast("long")
    return (wide_fp_total(term).cast("double") / float(scale)).alias(name)


def exact_avg_wide(expr: Column, name: str, digits: int = 4) -> Column:
    """:func:`exact_avg` with the :func:`exact_sum_wide` accumulator.

    Division order matches the oracle SQL exactly: (double)sum /
    (double)count / scale — two IEEE divides on correctly-rounded
    conversions of the exact integers."""
    scale = 10**digits
    term = F.round(expr * scale).cast("long")
    return (
        wide_fp_total(term).cast("double") / F.count(expr) / float(scale)
    ).alias(name)


def fold_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays as a sequential double fold.

    Left-to-right accumulation in double — bit-identical to DuckDB's
    ``list_reduce(list_transform(list_zip(a,b), p -> p.one::DOUBLE *
    p.two::DOUBLE), (acc, x) -> acc + x)``.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def fold_norm(a: Column | str) -> Column:
    """sqrt of the sequential-fold sum of squares (double)."""
    return F.sqrt(fold_dot(a, a))


def fold_dot_sql(a: str, b: str) -> str:
    """DuckDB SQL matching :func:`fold_dot` bit-for-bit.

    DuckDB's ``list_reduce`` without an initial value seeds the
    accumulator with the first element, which equals Spark's
    ``aggregate(…, 0.0, +)`` because ``0.0 + x == x``.
    """
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def fold_norm_sql(a: str) -> str:
    return f"sqrt({fold_dot_sql(a, a)})"
