"""Corpus drift detection — per-source Jensen-Shannon divergence of
unigram distributions against the rest of the corpus, in integer
micro-nats.

The dataset-shift monitor of a training-data pipeline: a crawl slice
/ new source whose token distribution diverges from the corpus is
flagged before it trains. JSD (Lin 1991) is the standard symmetric,
bounded ([0, ln 2]) choice:

    JSD(P, Q) = 0.5 KL(P || M) + 0.5 KL(Q || M),  M = (P + Q) / 2

with P = source unigram dist, Q = rest-of-corpus unigram dist.

Exact-parity law (the lm.py micro-nat recipe): each word's log-ratio
ln(p/m) is computed from an EXACT integer ratio — p/m = 2*c_s*T_r /
(c_s*T_r + c_r*T_s) where c = word count, T = source total, both
BIGINT products — through one correctly-rounded double division, then
quantized to integer micro-nats (floor(ln(r)*1e6+0.5)), weighted by
the integer count, summed as BIGINT (order-free), and normalized with
integer half-up division. The only cross-engine hazard is a <=1-ulp
libm-vs-java.lang.Math ln() divergence flipping a floor at a .5
boundary — probability ~1e-9 per word (the same exposure q113 carries
green at three scale factors).

Scale shape: explode -> ONE groupBy (source, word) -> vocab-sized
tables; the source x vocab grid is |sources| * |vocab| rows (built
with a broadcast of per-source totals), and every downstream agg is
vocab-bound, never corpus-bound. Zero UDFs, zero Python stages.

Overflow bound: the c*T products must stay < 2^63, which holds
through ~1e9-count words against ~1e9-token totals (1e18 < 9.2e18);
at true 100 TB scale (totals ~1e12) divide both totals by a common
2^k first — the ratio law is scale-invariant (documented contract,
same class as the bloom/sketch register bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lnq_spark(num: str, den: str) -> str:
    return (f"CAST(floor(ln(CAST({num} AS DOUBLE) / "
            f"CAST({den} AS DOUBLE)) * 1000000 + 0.5d) AS BIGINT)")


def _lnq_duck(num: str, den: str) -> str:
    return (f"(floor(ln(({num})::DOUBLE / ({den})::DOUBLE) "
            f"* 1000000 + 0.5e0))::BIGINT")


def source_js_drift(docs: DataFrame, source_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """-> (source, n_tokens, n_words, kl_src_micro, kl_rest_micro,
    jsd_micro) — one row per source; jsd_micro in [0, ln2 * 1e6]."""
    toks = (docs.select(F.col(source_col).alias("source"),
                        F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                          r"\s+")).alias("w"))
                .where(F.col("w") != ""))
    cnt = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("c_s"))
    # cnt feeds FOUR consumers (tot/glob/gtot/the grid join); without
    # a cut Catalyst re-executes the corpus scan + explode per branch
    # (measured: 4x "Scan parquet" in the physical plan, zero
    # ReusedExchange). localCheckpoint materializes the vocab-sized
    # table once — every downstream pass is vocab-bound, and the
    # corpus is read exactly once.
    cnt = cnt.localCheckpoint()
    tot = cnt.groupBy("source").agg(
        F.sum("c_s").alias("t_s"),
        F.count(F.lit(1)).alias("n_words"))
    glob = cnt.groupBy("w").agg(F.sum("c_s").alias("c_g"))
    gtot = cnt.agg(F.sum("c_s").alias("t_g"))

    # source x vocab grid: every (source, word) with the word's global
    # count; own count defaults 0. glob (vocab-sized) streams; the
    # per-source totals + grand total ride in broadcast.
    grid = glob.crossJoin(
        F.broadcast(tot.crossJoin(gtot)))
    g = (grid.join(cnt, ["source", "w"], "left")
             .select("source", "w", "t_s", "n_words",
                     F.coalesce(F.col("c_s"), F.lit(0).cast("long"))
                     .alias("c_s"),
                     (F.col("c_g")
                      - F.coalesce(F.col("c_s"), F.lit(0))).alias("c_r"),
                     (F.col("t_g") - F.col("t_s")).alias("t_r")))

    den = "(c_s * t_r + c_r * t_s)"
    term_s = (f"CASE WHEN c_s > 0 THEN c_s * "
              f"{_lnq_spark(f'2 * c_s * t_r', den)} ELSE 0L END")
    term_r = (f"CASE WHEN c_r > 0 THEN c_r * "
              f"{_lnq_spark(f'2 * c_r * t_s', den)} ELSE 0L END")
    agg = (g.withColumn("_ts", F.expr(term_s))
            .withColumn("_tr", F.expr(term_r))
            .groupBy("source")
            .agg(F.max("t_s").alias("n_tokens"),
                 F.max("n_words").alias("n_words"),
                 F.max("t_r").alias("_t_r"),
                 F.sum("_ts").alias("_ss"),
                 F.sum("_tr").alias("_sr")))
    # half-up integer division; numerators are >= -D/2 by the
    # quantization error bound, so (2N + D) div (2D) is safe
    return agg.select(
        "source", "n_tokens", "n_words",
        F.expr("(2 * _ss + n_tokens) div (2 * n_tokens)")
        .alias("kl_src_micro"),
        F.expr("(2 * _sr + _t_r) div (2 * _t_r)").alias("kl_rest_micro"),
    ).withColumn(
        "jsd_micro",
        F.expr("(kl_src_micro + kl_rest_micro + 1) div 2"))


N_OVERLAP_PERMS = 64


def source_overlap_matrix(docs: DataFrame, source_col: str = "source",
                          text_col: str = "text",
                          n_perms: int = N_OVERLAP_PERMS) -> DataFrame:
    """Pairwise vocabulary-overlap estimate between sources -> one row
    per unordered source pair: (source_a, source_b, matches,
    jaccard_micro). The corpus-level dedup diagnostic: which crawl
    slices are near-copies of each other BEFORE paying per-document
    near-dup costs between them.

    Corpus-level MinHash (Broder): per source, the signature is the
    min over its DISTINCT words of h32(word || ':' || p) for each of
    n_perms permutations; P(min_a == min_b) = J(vocab_a, vocab_b), so
    matches/n_perms estimates vocabulary Jaccard. Signature table is
    |sources| x n_perms rows — pairwise comparison is sources^2 x
    n_perms, corpus-independent (the whole point at 100 TB: the
    corpus is read once, the quadratic part is over SOURCES).

    Exact cross-engine law: md5-h32 is the shared hash; matches and
    the half-up micro-Jaccard are pure integers."""
    from .hashes import h32_col

    words = (docs.select(F.col(source_col).alias("source"),
                         F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                           r"\s+")).alias("w"))
                 .where(F.col("w") != "")
                 .distinct())
    hashed = words.select(
        "source",
        F.explode(F.expr(f"sequence(0, {n_perms - 1})")).alias("p"),
        "w").select(
        "source", "p",
        h32_col(F.concat_ws(":", F.col("w"), F.col("p"))).alias("h"))
    sig = hashed.groupBy("source", "p").agg(F.min("h").alias("mh"))
    sig = sig.localCheckpoint()  # two consumers (both join sides)
    a = sig.select(F.col("source").alias("source_a"), "p",
                   F.col("mh").alias("ha"))
    b = sig.select(F.col("source").alias("source_b"), "p",
                   F.col("mh").alias("hb"))
    return (a.join(b, "p")
             .where(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.sum((F.col("ha") == F.col("hb")).cast("long"))
                  .alias("matches"))
             .withColumn("jaccard_micro",
                         F.expr(f"(matches * 2000000 + {n_perms}) "
                                f"div (2 * {n_perms})")))


def source_overlap_matrix_sql(table: str = "documents",
                              source_col: str = "source",
                              text_col: str = "text",
                              n_perms: int = N_OVERLAP_PERMS) -> str:
    from .hashes import h32_sql
    h = h32_sql(f"(w || ':' || p::VARCHAR)")
    return f"""
    WITH words AS (
      SELECT DISTINCT source, w FROM (
        SELECT {source_col} AS source,
               unnest(string_split_regex(lower(trim({text_col})),
                                         '\\s+')) AS w
        FROM {table})
      WHERE w <> ''),
    hashed AS (
      SELECT source, p, {h} AS hh
      FROM words, (SELECT unnest(generate_series(0, {n_perms - 1}))
                   AS p)),
    sig AS (SELECT source, p, min(hh) AS mh
            FROM hashed GROUP BY source, p),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)::BIGINT
               AS matches
      FROM sig a JOIN sig b ON a.p = b.p AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT source_a, source_b, matches,
           (matches * 2000000 + {n_perms}) // (2 * {n_perms})
             AS jaccard_micro
    FROM pairs
    """


def source_js_drift_sql(table: str = "documents",
                        source_col: str = "source",
                        text_col: str = "text") -> str:
    """DuckDB twin — identical integer law, CTE-materialized grid."""
    den = "(c_s * t_r + c_r * t_s)"
    term_s = (f"CASE WHEN c_s > 0 THEN c_s * "
              f"{_lnq_duck('2 * c_s * t_r', den)} ELSE 0 END")
    term_r = (f"CASE WHEN c_r > 0 THEN c_r * "
              f"{_lnq_duck('2 * c_r * t_s', den)} ELSE 0 END")
    return f"""
    WITH toks AS (
      SELECT * FROM (
        SELECT {source_col} AS source,
               unnest(string_split_regex(lower(trim({text_col})),
                                         '\\s+')) AS w
        FROM {table})
      WHERE w <> ''),
    cnt AS (SELECT source, w, count(*)::BIGINT AS c_s
            FROM toks GROUP BY source, w),
    tot AS (SELECT source, sum(c_s)::BIGINT AS t_s,
                   count(*)::BIGINT AS n_words
            FROM cnt GROUP BY source),
    gcnt AS (SELECT w, sum(c_s)::BIGINT AS c_g FROM cnt GROUP BY w),
    gtot AS (SELECT sum(c_s)::BIGINT AS t_g FROM cnt),
    grid AS (
      SELECT t.source, t.t_s, t.n_words, gt.t_g, gl.w, gl.c_g,
             coalesce(c.c_s, 0)::BIGINT AS c_s
      FROM tot t CROSS JOIN gtot gt CROSS JOIN gcnt gl
      LEFT JOIN cnt c ON c.source = t.source AND c.w = gl.w),
    g AS (SELECT source, w, t_s, n_words, c_s,
                 c_g - c_s AS c_r, t_g - t_s AS t_r
          FROM grid),
    terms AS (SELECT source, t_s, n_words, t_r,
                     {term_s} AS ts_, {term_r} AS tr_
              FROM g),
    agg AS (SELECT source, max(t_s) AS n_tokens,
                   max(n_words) AS n_words, max(t_r) AS t_r_,
                   sum(ts_)::BIGINT AS ss_, sum(tr_)::BIGINT AS sr_
            FROM terms GROUP BY source),
    kl AS (SELECT source, n_tokens, n_words,
                  (2 * ss_ + n_tokens) // (2 * n_tokens)
                    AS kl_src_micro,
                  (2 * sr_ + t_r_) // (2 * t_r_) AS kl_rest_micro
           FROM agg)
    SELECT source, n_tokens, n_words, kl_src_micro, kl_rest_micro,
           (kl_src_micro + kl_rest_micro + 1) // 2 AS jsd_micro
    FROM kl
    """


# ------------------------------------------------------------------ #
# Zipf rank-frequency diagnostic — integer OLS over log2 buckets      #
# ------------------------------------------------------------------ #

def zipf_slope(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus Zipf diagnostic -> ONE row (n_vocab, n_tokens,
    slope_centi, intercept_centi): the OLS slope of log2(freq) vs
    log2(rank) over the vocabulary.  Natural text sits near slope
    -1 (Zipf 1949); a corpus drifting toward template/boilerplate
    flattens the head, machine-generated spam fattens the tail —
    the one-number companion to the q122 JS drift and q99 Gopher
    battery.

    Exactness law: both "logs" are the EXACT bit length
    (length(bin(x)) - 1, the q118 bucket law — no float log
    anywhere); the OLS is the q115 integer law in centi-units,
    slope = 100*(n*Sxy - Sx*Sy) div (n*Sxx - Sx^2); intercept uses
    the already-quantized slope: (100*Sy - slope*Sx) div n.
    All sums fit BIGINT with huge margin (buckets <= 63).

    Scale shape: ONE token groupBy onto the vocab table; the rank
    window runs over the VOCAB (corpus-small, the q119 node-table
    argument — swap in sampling.sharded_keyed_rank if the vocabulary
    ever rivals the corpus); the OLS is a single agg over vocab
    rows."""
    from pyspark.sql import Window

    vocab = (docs.select(F.explode(F.split(F.lower(F.trim(
                 F.col(text_col))), r"\s+")).alias("w"))
             .where(F.col("w") != "")
             .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("f")))
    rk = vocab.select(
        "f",
        F.row_number().over(Window.orderBy(F.desc("f"), "w"))
        .cast("long").alias("rank"))
    pts = rk.select(
        F.expr("CAST(length(bin(rank)) - 1 AS BIGINT)").alias("x"),
        F.expr("CAST(length(bin(f)) - 1 AS BIGINT)").alias("y"),
        "f")
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.expr("CAST((100 * (count(1) * sum(x * y) - sum(x) * sum(y)))"
               " div (count(1) * sum(x * x) - sum(x) * sum(x))"
               " AS BIGINT)").alias("slope_centi"),
        F.expr("CAST((100 * sum(y) - ((100 * (count(1) * sum(x * y)"
               " - sum(x) * sum(y))) div (count(1) * sum(x * x)"
               " - sum(x) * sum(x))) * sum(x)) div count(1) AS BIGINT)")
        .alias("intercept_centi"))


def zipf_slope_sql(table: str = "documents",
                   text_col: str = "text") -> str:
    """DuckDB twin of zipf_slope."""
    return f"""
    WITH vocab AS MATERIALIZED (
      SELECT w, count(*)::BIGINT AS f FROM (
        SELECT unnest(string_split_regex(lower(trim({text_col})),
                                         '\\s+')) AS w
        FROM {table}) WHERE w <> '' GROUP BY w),
    rk AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w)::BIGINT AS rank
      FROM vocab),
    pts AS (
      SELECT (length(bin(rank)) - 1)::BIGINT AS x,
             (length(bin(f)) - 1)::BIGINT AS y, f
      FROM rk)
    SELECT count(*)::BIGINT AS n_vocab,
           sum(f)::BIGINT AS n_tokens,
           ((100 * (count(*) * sum(x * y) - sum(x) * sum(y)))
            // (count(*) * sum(x * x) - sum(x) * sum(x)))::BIGINT
             AS slope_centi,
           ((100 * sum(y)
             - ((100 * (count(*) * sum(x * y) - sum(x) * sum(y)))
                // (count(*) * sum(x * x) - sum(x) * sum(x))) * sum(x))
            // count(*))::BIGINT AS intercept_centi
    FROM pts
    """
