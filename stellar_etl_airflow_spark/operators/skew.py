"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one build-side key is so
hot that even split partitions overwhelm a task (SURVEY §4; the guide's
"salt the hot key"). ``salted_join`` implements the standard recipe:

  fact side:  salt = pmod(hash(<salt basis>), n)        (random spread)
  dim side:   exploded n times, one row per salt value

so the hot key's rows spread across n tasks while the join stays an
equi-join on (key, salt). Deterministic: the salt derives from a stable
row expression, never rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_basis: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join facts->dim on ``key`` with an ``n_salts``-way salt.

    ``salt_basis`` defaults to a hash of all fact columns — any stable
    per-row expression works (an id column is cheapest).

    Only fact-side-preserving joins are supported: with the dim side
    exploded n_salts times, right/full outer would emit one null-padded
    row PER SALT for unmatched dim keys.
    """
    if how in ("right", "rightouter", "right_outer", "full", "fullouter", "full_outer", "outer"):
        raise ValueError(f"salted_join does not support '{how}' (dim side is exploded {n_salts}x)")
    basis = salt_basis if salt_basis is not None else F.hash(*[F.col(c) for c in facts.columns])
    f = facts.withColumn("_salt", F.pmod(basis, F.lit(n_salts)))
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d, [key, "_salt"], how).drop("_salt")
