"""Weight-of-evidence / information-value feature binning — the
credit-scorecard & feature-selection classic (Siddiqi 2006), in the
repo's exact integer micro-nat law.

For a binary target over bucketed feature values:
    woe(b)  = ln( (pos_b / POS) / (neg_b / NEG) )
    iv      = sum_b (pos_b/POS - neg_b/NEG) * woe(b)
WOE tells a modeler how a bucket shifts the log-odds; IV ranks
features by total separation (rule of thumb: < 0.02 useless,
> 0.5 suspicious).

Exact-parity law (the q113/q122 micro-nat recipe): counts are
Laplace-smoothed (+1 per class per bucket, documented) so the ratio
is never 0/inf; the single ln runs on ONE exact O(1) integer ratio
(pos_b * NEG) / (neg_b * POS) and is quantized to micro-nats
(floor(x*1e6 + 0.5)).  The IV contribution multiplies the micro-nat
WOE by ppm class shares and rescales — all BIGINT, bit-equal in both
engines.

Scale shape: ONE map-side-combinable groupBy(bucket) over the corpus;
totals derive FROM the checkpointed bucket aggregate (scan-audit
law); everything after is arithmetic on a bucket-sized table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WOE_PPM = 10 ** 6
WOE_BUCKET_WIDTH = 50


def woe_iv(events: DataFrame, target_type: str = "purchase",
           bucket_width: int = WOE_BUCKET_WIDTH) -> DataFrame:
    """WOE/IV of the bucketed `value` feature against the binary
    target event_type == target_type ->
    (bucket, n_pos, n_neg, woe_micro, iv_contrib_micro)."""
    base = events.select(
        F.expr(f"CAST(floor(value) AS BIGINT) div {bucket_width}")
        .alias("bucket"),
        F.when(F.col("event_type") == target_type, 1).otherwise(0)
        .alias("is_pos"))
    agg = (base.groupBy("bucket")
           .agg(F.expr("CAST(sum(is_pos) AS BIGINT) + 1").alias("n_pos"),
                F.expr("CAST(sum(1 - is_pos) AS BIGINT) + 1")
                .alias("n_neg"))
           .localCheckpoint(eager=False))       # totals derive from it
    tot = agg.agg(F.sum("n_pos").cast("long").alias("P"),
                  F.sum("n_neg").cast("long").alias("N"))
    woe = ("CAST(floor(ln(CAST(n_pos * N AS DOUBLE) / "
           "CAST(n_neg * P AS DOUBLE)) * 1e6 + 0.5e0) AS BIGINT)")
    return (agg.crossJoin(F.broadcast(tot))
            .select(
                "bucket", "n_pos", "n_neg",
                F.expr(woe).alias("woe_micro"),
                F.expr(f"(((n_pos * {WOE_PPM}) div P"
                       f" - (n_neg * {WOE_PPM}) div N) * ({woe}))"
                       f" div {WOE_PPM}")
                .cast("long").alias("iv_contrib_micro")))


def woe_iv_sql(events: str = "events", target_type: str = "purchase",
               bucket_width: int = WOE_BUCKET_WIDTH) -> str:
    """DuckDB twin of woe_iv."""
    woe = ("(floor(ln((n_pos * N)::DOUBLE / (n_neg * P)::DOUBLE) "
           "* 1e6 + 0.5e0))::BIGINT")
    return f"""
    WITH base AS (
      SELECT CAST(floor(value) AS BIGINT) // {bucket_width} AS bucket,
             CASE WHEN event_type = '{target_type}' THEN 1 ELSE 0 END
               AS is_pos
      FROM {events}),
    agg AS MATERIALIZED (
      SELECT bucket, sum(is_pos)::BIGINT + 1 AS n_pos,
             sum(1 - is_pos)::BIGINT + 1 AS n_neg
      FROM base GROUP BY bucket),
    tot AS (SELECT sum(n_pos)::BIGINT AS P, sum(n_neg)::BIGINT AS N
            FROM agg)
    SELECT bucket, n_pos, n_neg,
           {woe} AS woe_micro,
           ((((n_pos * {WOE_PPM}) // P - (n_neg * {WOE_PPM}) // N)
             * ({woe})) // {WOE_PPM})::BIGINT AS iv_contrib_micro
    FROM agg CROSS JOIN tot
    """
