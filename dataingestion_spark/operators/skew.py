"""Skew mitigation: salted joins for hot keys.

When one join key holds a disproportionate share of rows (the classic hot
document / hot user), a plain shuffle sends the whole hot key to one task.
Salting splits it: the big side gets a deterministic salt in [0, S), the
small side is replicated S ways, and the join runs on (key, salt) — the hot
key now spreads across S tasks. AQE's skew-join handles moderate skew
automatically; salting is the explicit tool for the extreme cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str, salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The salt is derived from a hash of the big side's whole row (xxhash64
    over all columns) — deterministic, uniform, no RNG state. Result matches
    ``big.join(small, key, how)`` for the supported join types; right/full
    outer would emit one unmatched copy of a small row PER SALT and are
    rejected."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated small "
            "side would duplicate unmatched rows in right/full outer joins"
        )
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = big_salted.join(small_replicated, [key, "_salt"], how)
    return joined.drop("_salt")
