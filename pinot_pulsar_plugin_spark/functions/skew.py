"""Skew-mitigation: salted join.

AQE's skew-join handles moderate skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); salting is
the explicit fallback for pathological keys (one key = 30% of 100 TB):

- big side: deterministic salt in [0, n) derived from a per-row column;
- small side: replicated n times, one copy per salt;
- join on (key, salt) → the hot key spreads across n tasks.

Result is row-identical to the unsalted join (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with an ``n_salts``-way salt.

    ``salt_source`` must be an expression over ``big``'s columns that
    varies within a key (defaults to a hash of all of big's columns);
    determinism of the salt keeps the join reproducible.

    Only join types where the replicated small side cannot surface
    unmatched rows are allowed: with ``right``/``full`` an unmatched
    small-side row would be emitted once per salt (n_salts duplicates),
    so those raise.
    """
    safe = {
        "inner", "cross",
        "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti",
    }
    if how.lower().replace(" ", "") not in safe:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — replicating the small "
            "side per salt duplicates unmatched small-side rows under "
            "right/full outer joins"
        )
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in big.columns])
    big_s = big.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
