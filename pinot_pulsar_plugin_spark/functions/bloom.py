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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GOLD = 2654435769  # 0x9E3779B9
_SHIFTS = (0, 13)  # disjoint bit windows of the mixed value


def _positions_sql(key_sql: str, m_bits: int) -> list[str]:
    """The k bit positions for a key, as SQL strings — the single
    source of truth shared verbatim by build and probe."""
    # mask to 32 bits first: an unmasked 64-bit key times _GOLD
    # overflows int64 (throws under ANSI mode); masking keeps the
    # product within 63 bits and is the identity for 32-bit keys
    x = f"((CAST({key_sql} AS BIGINT) & 4294967295L) * {_GOLD}L)"
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
    expression over a literal bitset — codegen-friendly, scan-pushable."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"

    def test(h: str) -> str:
        return (
            f"(element_at({arr}, CAST({h} div 64 AS INT) + 1) & "
            f"shiftleft(1L, CAST(pmod({h}, 64) AS INT))) != 0"
        )

    return F.expr(" AND ".join(f"({test(h)})" for h in _positions_sql(key_sql, m_bits)))
