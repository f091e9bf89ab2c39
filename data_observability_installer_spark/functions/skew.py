"""Skew-handling join utilities.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) repairs sort-merge skew at runtime, but it only splits the
STREAM side — a hot key whose build side also explodes, or a shuffle
hash join, still funnels one key through one task. Explicit salting is
the deterministic fix the engine exposes for those plans:

- the skewed (large, hot-keyed) side gets a uniform salt 0..s-1 —
  hash-based, not random, so retried tasks recompute identical rows;
- the other side replicates each row s times (one per salt), so every
  (key, salt) pair still co-locates;
- the join key becomes (key, salt): the hot key's rows spread over s
  tasks instead of one.

Replication multiplies the small side by s — use on joins where the
non-skewed side is modest (dimension-sized or pre-aggregated), which
is exactly the shape where one hot key hurts most.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Join with the skewed side salted over ``salts`` buckets.

    ``salt_source`` names a column whose hash spreads the hot key's
    rows (default: a per-row monotonic id — any column unique-ish
    within the hot key works better and cheaper, e.g. the fact row's
    id). Result equals ``skewed.join(other, on, how)`` row-for-row;
    only the physical distribution changes.
    """
    keys = [on] if isinstance(on, str) else list(on)
    src = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    s = skewed.withColumn(SALT_COL, F.pmod(F.xxhash64(src), F.lit(salts)).cast("int"))
    o = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return s.join(o, keys + [SALT_COL], how).drop(SALT_COL)
