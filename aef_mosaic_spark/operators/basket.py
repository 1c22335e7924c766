"""Market-basket association rules — pairwise co-occurrence with
support / confidence / lift (Agrawal 1993), exact integer scaling.

Why this op: "items bought together" over order baskets is the classic
retail-analytics primitive the engine's TPC-H surface invites; the
same pair-lift statistic is the curation diagnostic for "which tags /
domains co-occur beyond chance" (the PMI sibling of q138, but over
transactions instead of token windows).

Law (exact integer, both engines): baskets are the distinct
(orderkey, partkey) pairs; for a canonical item pair a < b
    n      = #baskets,  c_x = #baskets containing x,
    c_ab   = #baskets containing both
    supp_ppm      = (c_ab * 10^6)          div n
    conf_ab_ppm   = (c_ab * 10^6)          div c_a      (a => b)
    conf_ba_ppm   = (c_ab * 10^6)          div c_b      (b => a)
    lift_ppm      = (c_ab * n * 10^6)      div (c_a * c_b)
Bounds: c_ab * n * 10^6 < 2^63 needs n < ~3e6 baskets at full
precision — at larger corpora drop the ppm scale to 10^3 or pre-divide
(documented; the engine's <2^63 DuckDB law).

Scale shape (100 TB): the pair join is WITHIN basket (self-join on the
basket key, a < b) so candidates are sum(basket_size^2), never
item x item or basket x basket; per-item counts ride one groupBy and
join back broadcast (item-dimension sized). A hot mega-basket is a
data property — cap basket size upstream like DBSCAN's POINT_CAP.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 10 ** 6
BASKET_MIN_PAIR = 2


def association_rules(lineitem: DataFrame,
                      min_pair: int = BASKET_MIN_PAIR) -> DataFrame:
    """Pair rules over order baskets ->
    (pa, pb, n_ab, n_a, n_b, supp_ppm, conf_ab_ppm, conf_ba_ppm,
    lift_ppm), canonical pa < pb, pairs seen in >= min_pair baskets."""
    b = (lineitem.select(F.col("l_orderkey").alias("ok"),
                         F.col("l_partkey").alias("pk"))
         .distinct())
    n_b = b.select("ok").distinct().count()
    item = b.groupBy(F.col("pk")).agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    pairs = (b.alias("x").join(b.alias("y"), "ok")
             .where(F.col("x.pk") < F.col("y.pk"))
             .groupBy(F.col("x.pk").alias("pa"),
                      F.col("y.pk").alias("pb"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
             .where(F.col("n_ab") >= min_pair))
    out = (pairs
           .join(F.broadcast(item.select(F.col("pk").alias("pa"),
                                         F.col("c").alias("n_a"))), "pa")
           .join(F.broadcast(item.select(F.col("pk").alias("pb"),
                                         F.col("c").alias("n_b"))), "pb"))
    return out.select(
        "pa", "pb", "n_ab", "n_a", "n_b",
        F.expr(f"(n_ab * {PPM}) div {n_b}").cast("long").alias("supp_ppm"),
        F.expr(f"(n_ab * {PPM}) div n_a").cast("long").alias("conf_ab_ppm"),
        F.expr(f"(n_ab * {PPM}) div n_b").cast("long").alias("conf_ba_ppm"),
        F.expr(f"(n_ab * {n_b} * {PPM}) div (n_a * n_b)").cast("long")
        .alias("lift_ppm"))


def association_rules_sql(lineitem: str = "lineitem",
                          min_pair: int = BASKET_MIN_PAIR) -> str:
    """DuckDB twin of association_rules."""
    return f"""
    WITH b AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM {lineitem}),
    nn AS (SELECT count(DISTINCT ok)::BIGINT AS n FROM b),
    item AS MATERIALIZED (
      SELECT pk, count(*)::BIGINT AS c FROM b GROUP BY pk),
    pr AS (
      SELECT x.pk AS pa, y.pk AS pb, count(*)::BIGINT AS n_ab
      FROM b x JOIN b y ON x.ok = y.ok AND x.pk < y.pk
      GROUP BY x.pk, y.pk
      HAVING count(*) >= {min_pair})
    SELECT pa, pb, n_ab, ia.c AS n_a, ib.c AS n_b,
           ((n_ab * {PPM}) // (SELECT n FROM nn))::BIGINT AS supp_ppm,
           ((n_ab * {PPM}) // ia.c)::BIGINT AS conf_ab_ppm,
           ((n_ab * {PPM}) // ib.c)::BIGINT AS conf_ba_ppm,
           ((n_ab * (SELECT n FROM nn) * {PPM})
            // (ia.c * ib.c))::BIGINT AS lift_ppm
    FROM pr JOIN item ia ON ia.pk = pr.pa
            JOIN item ib ON ib.pk = pr.pb
    """
