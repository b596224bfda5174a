"""Skew-handling join strategies for the 100 TB posture.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
this engine's session) handles moderate skew at runtime. Salting is the
explicit strategy for the pathological case AQE can't fix: a single hot
key whose rows exceed one executor's memory on BOTH join sides, or a
skewed aggregation key.

- :func:`salted_join` — replicate the small side ``salt`` times, spread
  the big side's hot rows across ``salt`` sub-keys. Shuffle load for the
  hot key drops from 1 partition to ``salt`` partitions; result is
  byte-identical to the plain join.
- :func:`two_phase_agg` — salted partial aggregation: groupBy
  (key, salt) first, then re-aggregate by key. Works for any
  associative-decomposable aggregate (sum/count/min/max); Spark's own
  partial aggregation already does this per-partition, so this is only
  for the case where the MERGE side (post-shuffle) is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Salt column name (internal, dropped before returning).
_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``.

    ``big`` rows get a uniform random salt in [0, salt); ``small`` rows
    are replicated once per salt value (size × salt — keep the small
    side actually small, or broadcast instead). The join key becomes
    (on, salt), so the hot key's rows land in ``salt`` different shuffle
    partitions instead of one.

    rand() here is allowed to be non-deterministic: any salt value joins
    against a replica of the matching small row, so the RESULT is
    deterministic even though row placement is not.
    """
    salted_big = big.withColumn(_SALT, (F.rand() * salt).cast("int"))
    salted_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(salted_small, on=[on, _SALT], how=how)
    return out.drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt: int = 8,
) -> DataFrame:
    """Aggregate ``df`` by ``key`` in two shuffles, splitting hot keys.

    ``aggs`` maps output column name → FIRST-phase aggregate expression
    (must be sum/count/min/max-like: the second phase re-applies the
    matching merge — sum for sum and count, min for min, max for max —
    inferred from the expression name).

    Example::

        two_phase_agg(li, "l_orderkey",
                      {"qty": F.sum("l_quantity"), "n": F.count("*")})
    """
    phase1 = (
        df.withColumn(_SALT, (F.rand() * salt).cast("int"))
        .groupBy(key, _SALT)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )

    def merge_fn(name: str, expr: Column) -> Column:
        low = str(expr).lower()  # Column<'sum(l_quantity)'> → "column<'sum(..."
        low = low.split("'", 1)[-1]
        if low.startswith("min"):
            return F.min(name).alias(name)
        if low.startswith("max"):
            return F.max(name).alias(name)
        # sum and count both merge by summing partials
        return F.sum(name).alias(name)

    return phase1.groupBy(key).agg(
        *[merge_fn(name, expr) for name, expr in aggs.items()]
    )
