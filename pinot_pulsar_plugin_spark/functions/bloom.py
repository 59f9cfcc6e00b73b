"""Broadcast Bloom-filter semi-join pruning — the runtime-filter /
dynamic-partition-pruning analog for non-partition keys.

Spark's own runtime filtering (`spark.sql.optimizer.runtimeFilter.*`)
inserts exactly this shape JVM-side but exposes no Python control; this
module makes it a first-class, plan-visible technique:

1. BUILD (distributed): hash every build-side key to k bit positions,
   reduce to a fixed-width bitset with a map-side-combinable ``bit_or``
   aggregate — the shuffle carries at most ``m_bits/64`` rows
   regardless of build-side cardinality. The final collect is
   ``m_bits/64`` longs (1 KiB at the default m=8192), i.e. the same
   driver round-trip a BroadcastExchange does, but constant-size.
2. PROBE (scan-side): the bitset is embedded as a literal array in a
   pure-JVM predicate (multiplicative hash → element_at → bitwise AND),
   so the probe filter runs inside whole-stage codegen AT THE SCAN,
   before any exchange: at 100 TB the fact table drops non-matching
   rows before they ever reach the join shuffle.

False positives pass the filter (rate ≈ (1-e^{-kn/m})^k; ~0.4% at
n=500, m=8192, k=2) and are eliminated by the real join that follows —
the combination is semantics-preserving, which is why q84's oracle is
simply the plain semi-join. False negatives are impossible: the probe
applies the identical hashes to the identical bitset.

Hash design: a multiplicative step (32-bit golden-ratio constant, so
the product stays inside signed-64 under ANSI mode) followed by a
xorshift mix, with the two probe positions drawn from DISJOINT bit
ranges of the mixed value. Two plain multiplicative hashes mod a
power of two would be affine functions of each other (multiply-mod-2^k
permutes the low bits) — perfectly correlated probes that collapse the
filter to k=1; the nonlinear xor-of-shifted-self breaks that. Pure
BIGINT arithmetic — deterministic and engine-portable.
"""

from __future__ import annotations

from pinot_pulsar_plugin_spark.caching import persist_once

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GOLD = 2654435769  # 0x9E3779B9
_SHIFTS = (0, 13)  # disjoint bit windows of the mixed value


def _positions_sql(key_sql: str, m_bits: int) -> list[str]:
    """The k bit positions for a key, as SQL strings — the single
    source of truth shared verbatim by build and probe."""
    # mask to 31 bits first: an unmasked key times _GOLD overflows
    # int64 (throws under ANSI mode). 31 bits bounds the product by
    # (2^31-1)*0x9E3779B9 < 2^62.33, safely inside signed-64; a 32-bit
    # mask would NOT (any key with bit 31 set in the low word, e.g.
    # every negative key, still overflowed — ADVICE r3). Identity for
    # non-negative 31-bit keys; wider keys just fold, which only adds
    # false positives that the real join removes.
    x = f"((CAST({key_sql} AS BIGINT) & 2147483647L) * {_GOLD}L)"
    mixed = f"({x} ^ shiftright({x}, 31))"
    return [f"pmod(shiftright({mixed}, {s}), {m_bits})" for s in _SHIFTS]


def build_bloom(df: DataFrame, key_col: str, m_bits: int = 8192) -> list[int]:
    """Distributed Bloom build: returns the filter as ``m_bits/64``
    signed-64-bit words. One narrow shuffle of ≤ m_bits/64 rows."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    positions = "array(" + ",".join(_positions_sql(key_col, m_bits)) + ")"
    words = (
        # NULL keys are dropped: they can never match an equi-join, and
        # the probe predicate is NULL (filtered) for a NULL probe key —
        # the same semantics as the join the filter fronts.
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(F.expr(positions)).alias("pos"))
        .select(
            F.expr("CAST(pos div 64 AS INT)").alias("w"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r.w] = r.bits
    return out


def might_contain(words: list[int], key_sql: str, m_bits: int = 8192) -> Column:
    """Probe predicate: True for every key inserted at build time
    (never a false negative), almost always False otherwise. Pure SQL
    expression over a literal bitset — codegen-friendly, scan-pushable.

    The literal embeds m_bits/64 longs in the expression tree, so it is
    only for SMALL filters (the driver-collected ≤128-long default).
    Above ``LITERAL_MAX_BITS`` use :func:`build_bloom_df` +
    :func:`might_contain_subquery`, which keep the bitset out of the
    plan text entirely."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    return _probe_expr(arr, key_sql, m_bits)


def _probe_expr(arr_sql: str, key_sql: str, m_bits: int) -> Column:
    def test(h: str) -> str:
        return (
            f"(element_at({arr_sql}, CAST({h} div 64 AS INT) + 1) & "
            f"shiftleft(1L, CAST(pmod({h}, 64) AS INT))) != 0"
        )

    return F.expr(" AND ".join(f"({test(h)})" for h in _positions_sql(key_sql, m_bits)))


# Largest filter the literal path may embed in the expression tree
# (8192 bits = 128 longs ≈ 2.5 KB of plan text). A 100 TB runtime
# filter wants millions of bits; inlining those as a literal would blow
# plan compilation, hence the scalar-subquery path below.
LITERAL_MAX_BITS = 8192


def build_bloom_df(df: DataFrame, key_col: str, m_bits: int) -> DataFrame:
    """Distributed Bloom build with NO driver round-trip: returns a
    one-row DataFrame ``bits: array<bigint>`` of length m_bits/64.

    Same bit_or word aggregation as :func:`build_bloom`, then the
    sparse words densify via a range LEFT JOIN (every word index gets
    its bits or 0) and an ordered collect — each step is O(m_bits/64)
    with JVM hash lookups. (An earlier map_from_entries +
    per-index try_element_at scatter was O(words × m_bits/64) through
    the interpreted ArrayBasedMapData linear probe: ~5s at m=2^20 vs
    ~0.3s for this shape.) The bitset never touches the driver, so
    m_bits can be millions without a collect or a multi-MB literal.
    This is the Python-visible analog of Spark's own
    ``bloom_filter_agg`` runtime filter, which is not SQL-registered
    and unreachable from PySpark."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    positions = "array(" + ",".join(_positions_sql(key_col, m_bits)) + ")"
    words = (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(F.expr(positions)).alias("pos"))
        .select(
            F.expr("CAST(pos div 64 AS INT)").alias("w"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    spark = df.sparkSession
    dense = (
        spark.range(0, m_bits // 64)
        .select(F.col("id").cast("int").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    # array_sort on (w, bits) structs is ordered by w (lexicographic,
    # w unique), so the projected bits land at index w+1 — the exact
    # layout _probe_expr's element_at addressing assumes
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("arr")
    ).select(F.expr("transform(arr, x -> x.bits)").alias("bits"))


# Each subquery probe registers its bitset under a fresh view name:
# reusing one name across two filters would silently rebind the first
# predicate's subquery to the second bitset (wrong bits, possibly wrong
# m_bits) — false negatives, violating the no-false-negative contract.
_VIEW_SEQ = itertools.count()


def might_contain_subquery(
    bloom_df: DataFrame, key_sql: str, m_bits: int, view_name: str | None = None
) -> Column:
    """Probe predicate over a bitset held in a one-row relation,
    referenced via a scalar subquery — the same shape Catalyst's
    InjectRuntimeFilter emits. The expression tree carries only the
    subquery node (plan text stays compact at ANY m_bits); Spark
    executes the subquery once and broadcasts the value into the
    codegen'd filter, so the probe still runs at the fact scan before
    the join shuffle.

    The backing temp view gets a unique generated name per call unless
    an explicit ``view_name`` is given; an explicit name that already
    exists raises rather than clobbering another filter's bitset.

    The bitset is persisted: the predicate holds one scalar subquery
    per hash probe, and Spark's ReuseSubquery does not collapse them
    under AQE — uncached, each probe would re-run the whole build
    aggregation; cached, the k-1 extra executions are one-row memory
    scans."""
    if view_name is None:
        view_name = f"__bloom_bits_{next(_VIEW_SEQ)}__"
    else:
        catalog = bloom_df.sparkSession.catalog
        if catalog.tableExists(view_name):
            raise ValueError(
                f"temp view {view_name!r} already exists; reusing it would "
                "rebind earlier bloom probes to the wrong bitset"
            )
    persist_once(bloom_df)  # plain call: the side effect is the point
    bloom_df.createOrReplaceTempView(view_name)
    return _probe_expr(f"(SELECT bits FROM {view_name})", key_sql, m_bits)
