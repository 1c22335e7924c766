"""2-D Pareto skyline (maximize one dimension, minimize the other) —
the classic dominance query (Borzsonyi 2001, "The Skyline Operator").

A row x is on the skyline iff no row y has (y.minc <= x.minc AND
y.maxc >= x.maxc) with at least one strict inequality — e.g. "parts
where no other part is both cheaper and larger".  The naive form is an
O(n^2) NOT EXISTS self-join; the 2-D structure collapses it to a
GROUP BY + one window over the per-value group table:

    x on skyline  <=>  x.minc == m(x.maxc)            (best in group)
                   AND min over maxc' > x.maxc of m(maxc') > x.minc
                       (no strictly-better group beats it)

Ties: rows with identical (maxc, minc) dominate neither way, so ALL
of them are kept (the standard skyline convention).

Scale shape (100 TB): one map-side-combinable groupBy(maxc) collapses
the corpus to a |distinct maxc|-row dimension table (p_size has ~50
values); the prefix-min window runs over THAT table, never the corpus;
the verdict joins back broadcast.  The second corpus pass is an
equi-join on maxc against a broadcast 50-row table — zero wide
shuffles of the big side beyond the partial agg.  For high-cardinality
dimensions quantize maxc into buckets first (the skyline of bucket
minima is a superset filter), or fall back to the sort-based sweep.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, key: str, min_col: str,
               max_col: str) -> DataFrame:
    """Skyline rows of `df` minimizing `min_col` and maximizing
    `max_col` -> (key, max_col, min_col)."""
    p = df.select(key, max_col, min_col)
    g = p.groupBy(max_col).agg(F.min(min_col).alias("_m"))
    w = Window.orderBy(F.col(max_col).desc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    verdict = g.select(max_col, "_m", F.min("_m").over(w).alias("_better"))
    return (p.join(F.broadcast(verdict), max_col)
            .where((F.col(min_col) == F.col("_m"))
                   & (F.col("_better").isNull()
                      | (F.col("_better") > F.col(min_col))))
            .select(key, max_col, min_col))


def part_skyline(part: DataFrame) -> DataFrame:
    """Skyline of `part`: no other part both cheaper and larger.
    Price is quantized to exact integer cents (floor(x*100 + 0.5),
    the repo's half-up law) so both engines agree bit-for-bit."""
    p = part.select(
        "p_partkey", "p_size",
        F.expr("CAST(floor(p_retailprice * 100 + 0.5e0) AS BIGINT)")
        .alias("price_c"))
    return skyline_2d(p, "p_partkey", "price_c", "p_size")


def part_skyline_sql(part: str = "part") -> str:
    """DuckDB twin of part_skyline."""
    return f"""
    WITH p AS (
      SELECT p_partkey, p_size,
             CAST(floor(p_retailprice * 100 + 0.5e0) AS BIGINT) AS price_c
      FROM {part}),
    g AS (SELECT p_size, min(price_c)::BIGINT AS m
          FROM p GROUP BY p_size),
    w AS (SELECT p_size, m,
                 min(m) OVER (ORDER BY p_size DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS better
          FROM g)
    SELECT p.p_partkey, p.p_size, p.price_c
    FROM p JOIN w USING (p_size)
    WHERE p.price_c = w.m AND (w.better IS NULL OR w.better > p.price_c)
    """
