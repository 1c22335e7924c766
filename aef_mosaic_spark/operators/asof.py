"""Merge-asof join as a reusable operator.

The reference has no as-of (exact year equality only,
/root/reference/src/index/spatial_lookup.rs:61-74); SURVEY §2.3 notes
it as the one missing join type. Implemented with the scalable
union+window shape: tag both sides, union, one shuffle on the key,
`last(value, ignorenulls)` over an ordered frame — no per-key collect,
no cogroup, linear in rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, left_on: str, right_on: str,
              left_by: str, right_by: str, value_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """For each left row, attach the `value_cols` of the most recent
    right row with right_on <= left_on (direction='backward') or the
    next one with right_on >= left_on ('forward'), within matching
    by-keys. Right rows sort before left rows at equal timestamps, so
    an exactly-equal right row matches (pandas merge_asof semantics)."""
    lv = left.select(
        F.col(left_by).alias("_k"), F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"), F.struct(*left.columns).alias("_row"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
    )
    rv = right.select(
        F.col(right_by).alias("_k"), F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"), F.lit(None).cast(lv.schema["_row"].dataType).alias("_row"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    u = lv.unionByName(rv)
    if direction == "backward":
        w = Window.partitionBy("_k").orderBy("_t", "_side").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        picked = [F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                  for c in value_cols]
    elif direction == "forward":
        w = Window.partitionBy("_k").orderBy(
            F.col("_t").asc(), F.col("_side").desc()).rowsBetween(
            Window.currentRow, Window.unboundedFollowing)
        picked = [F.first(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
                  for c in value_cols]
    else:
        raise ValueError(f"bad direction {direction!r}")
    out = u.select("_side", "_row", *picked).where(F.col("_side") == 1)
    return out.select("_row.*", *[f"asof_{c}" for c in value_cols])
