"""Skew mitigation: salted equi-join.

AQE's skew-join handles sort-merge skew automatically; this operator is
the explicit fallback for the cases AQE can't re-plan (e.g. a hot key
into a broadcast-ineligible aggregate join, or deliberate key-split for
streaming state). Standard construction:

  * left side gets a uniform salt in [0, salt);
  * right side is replicated once per salt value (explode of a
    0..salt-1 sequence);
  * the join key becomes (key, salt) → a hot key's rows spread over
    ``salt`` reducers instead of one.

Valid for inner / left / left_semi joins (right-row replication breaks
right/full outer semantics — rejected explicitly). The salt is random
but the *result* is salt-invariant: every (left row, right row) key
match meets on exactly one salt value."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = {"inner", "left", "left_outer", "left_semi"}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    if how not in _SUPPORTED:
        raise ValueError(
            f"salted_join supports {sorted(_SUPPORTED)}; {how!r} would "
            "multiply unmatched right rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l.join(r, keys + ["__salt"], how)
    return out.drop("__salt")
