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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Salt column name (internal, dropped before returning).
_SALT = "__salt"

#: Join types for which salting is result-preserving (normalized
#: spellings). Right/full outer are NOT: an unmatched small-side row
#: exists once per salt replica, so it would surface ``salt`` times.
_SALT_SAFE_HOW = {"inner", "left", "leftouter", "leftsemi", "leftanti"}


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

    Result-preserving ONLY for inner / left(-outer) / left_semi /
    left_anti: each ``big`` row carries exactly one salt value, so it
    matches exactly the replicas of its key. Right and full outer joins
    would emit each unmatched small-side row once per replica (``salt``
    duplicates) — those join types raise ``ValueError``; salt the other
    side (swap the arguments) instead.

    rand() here is allowed to be non-deterministic: any salt value joins
    against a replica of the matching small row, so the RESULT is
    deterministic even though row placement is not.
    """
    if how.lower().replace("_", "") not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} is not result-preserving under salting "
            "(unmatched small-side rows would be duplicated once per replica); "
            "use inner/left/left_semi/left_anti, or swap the join sides"
        )
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

    ``aggs`` maps output column name → FIRST-phase aggregate expression.
    Only aggregates whose per-salt partials merge exactly are accepted:
    sum and count (merged by summing partials), min and max (merged by
    re-applying min/max). Anything else — avg, DISTINCT forms,
    percentile, … — raises ``ValueError`` rather than silently merging
    wrong (an avg of per-salt avgs is not the avg; a sum of per-salt
    distinct counts over-counts).

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
        # The analyzer's generated alias is the one spelling that keeps
        # DISTINCT visible ("count(DISTINCT p)"); str(expr) hides it in
        # Spark 4. Schema-only — plans nothing, runs nothing.
        desc = df.agg(expr).columns[0]
        m = re.match(r"(\w+)\((.*)\)$", desc)
        fn = m.group(1).lower() if m else ""
        distinct = m is not None and m.group(2).upper().startswith("DISTINCT ")
        if fn not in ("sum", "count", "min", "max") or distinct:
            raise ValueError(
                f"two_phase_agg: aggregate {desc!r} for {name!r} does not "
                "decompose into mergeable per-salt partials; only non-DISTINCT "
                "sum/count/min/max are supported (use approx/sketch operators "
                "for distinct counts, or compute avg as sum + count)"
            )
        if fn == "min":
            return F.min(name).alias(name)
        if fn == "max":
            return F.max(name).alias(name)
        # sum and count both merge by summing partials
        return F.sum(name).alias(name)

    return phase1.groupBy(key).agg(
        *[merge_fn(name, expr) for name, expr in aggs.items()]
    )
