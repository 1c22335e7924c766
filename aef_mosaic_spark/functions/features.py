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


# ------------------------------------------------------------------ #
# Inter-event burstiness + behavioral entropy + spend Gini            #
# ------------------------------------------------------------------ #

BURST_MIN_GAPS = 5


def burstiness(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               min_gaps: int = BURST_MIN_GAPS) -> DataFrame:
    """Goh-Barabasi burstiness of inter-event gaps per key ->
    (user_id, n_gaps, s, ss, burstiness_q): B = (sigma - mu) /
    (sigma + mu) in [-1, 1] — -1 periodic, 0 Poisson, -> 1 bursty.
    The point-process diagnostic that separates machine heartbeats
    from human sessions.

    Law: gaps are integer seconds between (unix_timestamp, event_id)
    -ordered events; with S = sum g, SS = sum g^2, D = n*SS - S^2
    (all BIGINT), B = (sqrt(D) - S) / (sqrt(D) + S) — numerator and
    denominator are n*sigma and n*mu + ... both scaled by n, so the
    ratio needs no division before the one correctly-rounded sqrt;
    quantized half-up at 1e6.  Keys with < min_gaps gaps or all-zero
    gaps emit nothing.  Bound: n*SS < 2^63 holds through ~10^5
    events/key at month-scale spans (document longer keys by
    chunking gaps to coarser units).

    Scale shape: one user exchange for the lead window, one
    map-side-combinable groupBy."""
    from pyspark.sql import Window

    wo = Window.partitionBy(user_col).orderBy("es", id_col)
    g = (events
         .withColumn("es", F.unix_timestamp(F.col(ts_col)))
         .withColumn("g", F.lead("es").over(wo) - F.col("es"))
         .where(F.col("g").isNotNull()))
    return (g.groupBy(user_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
                 F.sum("g").cast("long").alias("s"),
                 F.sum(F.expr("g * g")).cast("long").alias("ss"))
            .where((F.col("n_gaps") >= min_gaps) & (F.col("s") > 0))
            .withColumn("_d", F.expr("n_gaps * ss - s * s"))
            .select(user_col, "n_gaps", "s", "ss",
                    F.expr("floor((sqrt(CAST(_d AS DOUBLE))"
                           " - CAST(s AS DOUBLE))"
                           " / (sqrt(CAST(_d AS DOUBLE))"
                           " + CAST(s AS DOUBLE)) * 1e6 + 0.5e0)"
                           " / 1e6").alias("burstiness_q")))


def burstiness_sql(table: str = "events",
                   min_gaps: int = BURST_MIN_GAPS) -> str:
    return f"""
    WITH e AS (SELECT user_id, event_id,
                      floor(epoch(ts))::BIGINT AS es
               FROM {table}),
    g AS (SELECT user_id,
                 lead(es) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) - es AS g
          FROM e),
    a AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
                 sum(g)::BIGINT AS s, sum(g * g)::BIGINT AS ss
          FROM g WHERE g IS NOT NULL
          GROUP BY user_id
          HAVING count(*) >= {min_gaps} AND sum(g) > 0)
    SELECT user_id, n_gaps, s, ss,
           floor((sqrt(CAST(n_gaps * ss - s * s AS DOUBLE))
                  - CAST(s AS DOUBLE))
                 / (sqrt(CAST(n_gaps * ss - s * s AS DOUBLE))
                    + CAST(s AS DOUBLE)) * 1e6 + 0.5e0) / 1e6
           AS burstiness_q
    FROM a
    """


def behavioral_entropy(events: DataFrame, user_col: str = "user_id",
                       type_col: str = "event_type") -> DataFrame:
    """Shannon entropy of each key's event-type mix in integer
    micro-nats -> (user_id, n, n_types, entropy_u): the "how varied
    is this actor" feature (bot/monoculture detection; 0 = single
    type, ln|types| = uniform).

    Law (the lm.py micro-nat recipe): H = ln(n) - (1/n) sum_t n_t
    ln(n_t); each ln runs on an exact integer and is quantized to
    floor(ln(x)*1e6 + 0.5) BEFORE any arithmetic, so the remainder is
    pure BIGINT: entropy_u = lnq(n) - (sum n_t*lnq(n_t)) div n.
    Scale shape: one groupBy onto (user, type), totals derive FROM it
    (scan-audit law)."""
    counts = (events.groupBy(user_col, type_col)
              .agg(F.count(F.lit(1)).cast("long").alias("n_t"))
              .localCheckpoint(eager=False))
    tot = counts.groupBy(user_col).agg(
        F.sum("n_t").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.expr("n_t * CAST(floor(ln(CAST(n_t AS DOUBLE)) * 1e6"
                     " + 0.5e0) AS BIGINT)")).cast("long").alias("_s"))
    return tot.select(
        user_col, "n", "n_types",
        F.expr("CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5e0) AS"
               " BIGINT) - _s div n").cast("long").alias("entropy_u"))


def behavioral_entropy_sql(table: str = "events") -> str:
    return f"""
    WITH c AS MATERIALIZED (
      SELECT user_id, event_type, count(*)::BIGINT AS n_t
      FROM {table} GROUP BY 1, 2),
    t AS (SELECT user_id, sum(n_t)::BIGINT AS n,
                 count(*)::BIGINT AS n_types,
                 sum(n_t * floor(ln(CAST(n_t AS DOUBLE)) * 1e6
                                 + 0.5e0)::BIGINT)::BIGINT AS s
          FROM c GROUP BY user_id)
    SELECT user_id, n, n_types,
           (floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5e0)::BIGINT
            - s // n)::BIGINT AS entropy_u
    FROM t
    """


def spend_gini(orders: DataFrame, group_col: str = "c_nationkey"
               ) -> DataFrame:
    """Gini coefficient of per-customer spend within each group ->
    (group, n, sum_x, gini_q): the inequality / concentration lens on
    any keyed total ("is this nation's demand a few whales or a broad
    base").

    Law: x = per-customer total in whole dollars (floor; dollar
    granularity keeps sum(i*x) < 2^63 through ~10^7 customers/group);
    ranked ascending by (x, custkey); G = (2*sum(i*x_i)
    - (n+1)*sum x) / (n * sum x), quantized half-up at 1e6.

    Scale shape: one groupBy to customer totals, one in-group
    row_number window (at 10^9+ customers per group swap in
    sampling.sharded_keyed_rank — same law, no single-task window),
    one final group agg."""
    from pyspark.sql import Window

    cust = (orders.groupBy(group_col, "o_custkey")
            .agg(F.sum(F.expr("CAST(floor(o_totalprice) AS BIGINT)"))
                 .cast("long").alias("x")))
    w = Window.partitionBy(group_col).orderBy("x", "o_custkey")
    r = cust.withColumn("i", F.row_number().over(w).cast("long"))
    return (r.groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("x").cast("long").alias("sum_x"),
                 F.sum(F.expr("i * x")).cast("long").alias("_six"))
            .where(F.col("sum_x") > 0)
            .select(group_col, "n", "sum_x",
                    F.expr("floor(CAST(2 * _six - (n + 1) * sum_x AS"
                           " DOUBLE) / CAST(n * sum_x AS DOUBLE)"
                           " * 1e6 + 0.5e0) / 1e6").alias("gini_q")))


def spend_gini_sql(orders_sql: str, group_col: str = "c_nationkey"
                   ) -> str:
    return f"""
    WITH cust AS (
      SELECT {group_col}, o_custkey,
             sum(floor(o_totalprice)::BIGINT)::BIGINT AS x
      FROM ({orders_sql}) GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY {group_col}
                                       ORDER BY x, o_custkey)::BIGINT
                 AS i
          FROM cust),
    a AS (SELECT {group_col}, count(*)::BIGINT AS n,
                 sum(x)::BIGINT AS sum_x, sum(i * x)::BIGINT AS six
          FROM r GROUP BY 1
          HAVING sum(x) > 0)
    SELECT {group_col}, n, sum_x,
           floor(CAST(2 * six - (n + 1) * sum_x AS DOUBLE)
                 / CAST(n * sum_x AS DOUBLE) * 1e6 + 0.5e0) / 1e6
           AS gini_q
    FROM a
    """


def spend_hhi(orders: DataFrame, group_col: str = "c_nationkey"
              ) -> DataFrame:
    """Herfindahl-Hirschman concentration of per-customer spend
    within each group -> (group, n, sum_x, hhi_q): HHI = sum of
    squared shares in [1/n, 1] — the antitrust-style "is demand
    concentrated" metric beside q189's Gini (HHI weights the head,
    Gini the whole curve).

    Law: x = dollar-floor customer totals; HHI = sum(x^2) / S^2
    computed from two exact BIGINTs, one quantized double at 1e6.
    Bound: sum(x^2) <= S^2 < 2^63 for S < 3e9 dollars/group
    (document larger groups by switching to kilo-dollar floors).

    Scale shape: one groupBy to customer totals, one map-side
    combinable group agg — no rank, no window (unlike Gini), so it
    is the cheap always-on monitor of the pair."""
    cust = (orders.groupBy(group_col, "o_custkey")
            .agg(F.sum(F.expr("CAST(floor(o_totalprice) AS BIGINT)"))
                 .cast("long").alias("x")))
    return (cust.groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("x").cast("long").alias("sum_x"),
                 F.sum(F.expr("x * x")).cast("long").alias("_sxx"))
            .where(F.col("sum_x") > 0)
            .select(group_col, "n", "sum_x",
                    F.expr("floor(CAST(_sxx AS DOUBLE)"
                           " / (CAST(sum_x AS DOUBLE)"
                           " * CAST(sum_x AS DOUBLE)) * 1e6 + 0.5e0)"
                           " / 1e6").alias("hhi_q")))


def spend_hhi_sql(orders_sql: str, group_col: str = "c_nationkey"
                  ) -> str:
    return f"""
    WITH cust AS (
      SELECT {group_col}, o_custkey,
             sum(floor(o_totalprice)::BIGINT)::BIGINT AS x
      FROM ({orders_sql}) GROUP BY 1, 2),
    a AS (SELECT {group_col}, count(*)::BIGINT AS n,
                 sum(x)::BIGINT AS sum_x, sum(x * x)::BIGINT AS sxx
          FROM cust GROUP BY 1
          HAVING sum(x) > 0)
    SELECT {group_col}, n, sum_x,
           floor(CAST(sxx AS DOUBLE) / (CAST(sum_x AS DOUBLE)
                 * CAST(sum_x AS DOUBLE)) * 1e6 + 0.5e0) / 1e6
           AS hhi_q
    FROM a
    """
