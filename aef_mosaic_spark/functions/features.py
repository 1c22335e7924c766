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


# ------------------------------------------------------------------ #
# Benford first-digit audit                                            #
# ------------------------------------------------------------------ #

# micro-probabilities round(log10(1 + 1/d) * 1e6) — injected as the
# SAME integer literals into both dialects so no engine ever
# evaluates a log
BENFORD_P_U = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757)


def benford_audit(df: DataFrame, value_col: str,
                  group_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law per
    group -> (group, digit, n_d, n, p_u, dev_q): the classic
    fabricated-/synthetic-data audit (Benford 1938; standard in fraud
    and data-quality screening).  dev_q is the digit's chi-square
    contribution (n_d - n*p_d)^2 / (n*p_d).

    Law: digit = first character of CAST(floor(value) AS BIGINT)
    over rows with value >= 1 (identical string law both engines);
    expected probabilities are the fixed BENFORD_P_U micro-integers;
    the deviation is a = n_d*1e6 - n*p_u (exact BIGINT, < 2^53 so its
    double square is computed identically), dev = a^2 / (1e6*n*p_u)
    quantized half-up at 1e6.  Missing digits surface as n_d = 0 rows
    (the strongest deviation signal) via the groups x 9-digit
    constant frame.

    Scale shape: ONE map-side-combinable groupBy onto |groups|*9
    rows; group totals derive FROM that aggregate (scan-audit law);
    the digit frame is a 9-row broadcast."""
    counts = (df.where(F.expr(f"{value_col} >= 1"))
              .select(F.col(group_col).alias("grp"),
                      F.expr(f"CAST(substring(CAST(CAST(floor({value_col})"
                             f" AS BIGINT) AS STRING), 1, 1) AS INT)")
                      .alias("digit"))
              .groupBy("grp", "digit")
              .agg(F.count(F.lit(1)).cast("long").alias("n_d"))
              .localCheckpoint(eager=False))   # totals derive from it
    totals = counts.groupBy("grp").agg(F.sum("n_d").cast("long")
                                       .alias("n"))
    frame = totals.select("grp", "n", F.explode(F.array(*[
        F.struct(F.lit(d + 1).alias("digit"),
                 F.lit(p).cast("long").alias("p_u"))
        for d, p in enumerate(BENFORD_P_U)])).alias("e")) \
        .select("grp", "n", "e.digit", "e.p_u")
    return (frame.join(counts, ["grp", "digit"], "left")
            .select(F.col("grp").alias(group_col), "digit",
                    F.coalesce("n_d", F.lit(0)).cast("long").alias("n_d"),
                    "n", "p_u")
            .withColumn("_a", F.expr("n_d * 1000000 - n * p_u"))
            .withColumn("dev_q", F.expr(
                "floor(CAST(_a AS DOUBLE) * CAST(_a AS DOUBLE)"
                " / (1e6 * CAST(n AS DOUBLE) * CAST(p_u AS DOUBLE))"
                " * 1e6 + 0.5e0) / 1e6"))
            .select(group_col, "digit", "n_d", "n", "p_u", "dev_q"))


def benford_audit_sql(source_sql: str, value_col: str,
                      group_col: str) -> str:
    pvals = ", ".join(f"({d + 1}, {p}::BIGINT)"
                      for d, p in enumerate(BENFORD_P_U))
    return f"""
    WITH counts AS MATERIALIZED (
      SELECT {group_col} AS grp,
             CAST(substring(CAST(CAST(floor({value_col}) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INT) AS digit,
             count(*)::BIGINT AS n_d
      FROM ({source_sql})
      WHERE {value_col} >= 1
      GROUP BY 1, 2),
    totals AS (SELECT grp, sum(n_d)::BIGINT AS n FROM counts
               GROUP BY grp),
    frame AS (SELECT t.grp, t.n, e.digit, e.p_u
              FROM totals t JOIN (VALUES {pvals}) e(digit, p_u) ON true),
    j AS (SELECT f.grp, f.digit, coalesce(c.n_d, 0)::BIGINT AS n_d,
                 f.n, f.p_u,
                 (coalesce(c.n_d, 0) * 1000000 - f.n * f.p_u)::BIGINT
                 AS a
          FROM frame f LEFT JOIN counts c
            ON c.grp = f.grp AND c.digit = f.digit)
    SELECT grp AS {group_col}, digit, n_d, n, p_u,
           floor(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                 / (1e6 * CAST(n AS DOUBLE) * CAST(p_u AS DOUBLE))
                 * 1e6 + 0.5e0) / 1e6 AS dev_q
    FROM j
    """
