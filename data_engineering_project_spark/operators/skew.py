"""Skew mitigation operators — salting for hot keys.

AQE's skew-join splitting handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py), but two
cases still need explicit salting at 100 TB:

- **aggregation skew**: one giant group funnels into one reducer.
  :func:`salted_agg` runs commutative aggregates in two phases over a
  synthetic (key, salt) space, so the hot key fans out ``salt_buckets``
  ways before the final combine.
- **join skew with replication**: :func:`salted_join` replicates the
  small side per salt bucket and salts the big side deterministically,
  so a hot key's rows spread across ``salt_buckets`` tasks.

Salts are derived with ``xxhash64`` from existing columns — never
``rand()``, which breaks determinism under task retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMBINE = {"sum": F.sum, "count": "sum", "min": F.min, "max": F.max}


def _salt(cols: list[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs``: output_name → (function, column) with function in
    {sum, count, min, max} (the commutative set that re-combines
    losslessly). ``salt_from``: columns whose hash spreads the hot
    group (any high-cardinality payload column works).

    Note Spark's partial aggregation already does map-side combine —
    salting additionally splits the *reduce* of a single giant group
    across ``salt_buckets`` reducers before a cheap second combine over
    ``|groups| × salt_buckets`` rows.
    """
    salted = df.withColumn("__salt", _salt(salt_from, salt_buckets))
    phase1_aggs = []
    for out, (fn, col) in aggs.items():
        f1 = F.count(col) if fn == "count" else getattr(F, fn)(col)
        phase1_aggs.append(f1.alias(f"__p_{out}"))
    phase1 = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = []
    for out, (fn, _) in aggs.items():
        combine = F.sum if fn in ("sum", "count") else getattr(F, fn)
        phase2_aggs.append(combine(f"__p_{out}").alias(out))
    return phase1.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side.

    Cost: small side × ``salt_buckets`` (only viable when the small
    side really is small — same precondition as a broadcast, but this
    works when the small side exceeds the broadcast threshold while a
    few big-side keys are hot).
    """
    big_s = big.withColumn("__salt", _salt(salt_from, salt_buckets))
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_r, [key, "__salt"], how)
    return out.drop("__salt")
