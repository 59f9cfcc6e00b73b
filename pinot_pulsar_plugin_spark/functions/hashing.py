"""Deterministic Knuth-hash bucketing, overflow-safe at snowflake ids.

The engine's reproducible sampling/splitting/bucketing all reduce to
``(key · 2654435761) mod B`` — deterministic, engine-agnostic, uniform
enough for bucket assignment (q44's sample, q95/q165's PPS priority,
q74/q78/q80/q101's train/val/test splits, q171's skew report). The
raw BIGINT product overflows int64 once the key passes ~3.47e9
(snowflake-scale; ANSI mode — the Spark 4 default — turns that into a
job abort), and DuckDB's BIGINT multiply is overflow-CHECKED too (no
int128 promotion for products — only SUM promotes to HUGEINT), so the
oracle side needs the same treatment. Two regimes (r11 audit,
SCALING.md §7):

- modulus ≤ 2^31: ring-reduce the key first — ((k % B)·M) % B ≡
  (k·M) % B exactly (ring homomorphism,
  tests/test_overflow_100tb.py::test_knuth_mod_reduce_identity_exhaustive),
  and the reduced product is ≤ (2^31−1)·M < 2^62.4.
- modulus = 2^32 (the split-hash family): ring reduction is NOT
  enough — (2^32−1)·M ≈ 1.8e19 — so the product runs in 16-bit limbs:
  with k32 = k & (2^32−1), lo16 = k32 & (2^16−1), hi16 = k32 >> 16,

      (k·M) mod 2^32 = (lo16·M + ((hi16·M mod 2^32) << 16)) mod 2^32

  because (x·2^16) mod 2^32 depends only on x mod 2^16 ⊆ x mod 2^32.
  Every intermediate is < 2^63 (lo16·M < 2^48, the shifted term
  < 2^48, their sum < 2^49) — pure long whole-stage codegen, no
  per-row decimal on the corpus-scale scan path.

Both forms are value-identical to the naive product for EVERY key
(pinned against Python bigints in tests/test_overflow_100tb.py), so
the DuckDB oracles — ring-reduced the same way, or HUGEINT-cast where
the modulus is 2^32 — keep matching at any id scale.

The same pattern with a second constant (2246822519) lives inline in
eventanalytics' coordinate injections (q86/q169/q189, fixed in
e75321f before this helper existed).

Keys are assumed non-negative (ids); the bitwise mask and ``%`` rely
on it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761

_MASK32 = (1 << 32) - 1
_MASK16 = (1 << 16) - 1


def knuth_bucket(key: Column, mod: int) -> Column:
    """``(key · KNUTH) mod mod`` for a modulus ≤ 2^31 (ring-reduced)."""
    if not 1 <= mod <= (1 << 31):
        raise ValueError("modulus must be in [1, 2^31] for ring reduction")
    return F.pmod(F.pmod(key, F.lit(mod)) * KNUTH, F.lit(mod))


def knuth_bucket_sql(key_sql: str, mod: int) -> str:
    """:func:`knuth_bucket` as a SQL string (Spark and DuckDB agree on
    ``%`` for the non-negative operands used)."""
    if not 1 <= mod <= (1 << 31):
        raise ValueError("modulus must be in [1, 2^31] for ring reduction")
    return f"((({key_sql}) % {mod}) * {KNUTH}) % {mod}"


def split_hash32(key: Column) -> Column:
    """``(key · KNUTH) mod 2^32`` in pure-long 16-bit limbs (see
    module docstring) — the split-bucket hash for q74/q78/q80/q101."""
    k32 = key.bitwiseAND(F.lit(_MASK32))
    lo16 = k32.bitwiseAND(F.lit(_MASK16))
    hi16 = F.shiftright(k32, 16)
    shifted = F.shiftleft((hi16 * KNUTH).bitwiseAND(F.lit(_MASK32)), 16)
    return (lo16 * KNUTH + shifted).bitwiseAND(F.lit(_MASK32))
