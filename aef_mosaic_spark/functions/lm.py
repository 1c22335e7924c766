"""Bigram language-model perplexity scoring (CCNet-style quality
filtering) — train an add-one-smoothed word-bigram LM on a
deterministic corpus slice, score EVERY document by average negative
log-likelihood, keep the low-perplexity ones.

This is the shape of the CCNet / Wenzek 2020 pipeline step (they use
a 5-gram KenLM; the bigram keeps the statistic SQL-expressible while
exercising the identical plan): train-side aggregation -> two count
tables -> score-side join -> per-doc reduce.  At 100 TB the count
tables are vocabulary-sized (shuffle-join or AQE-broadcast, both
fine); the hot path is one explode + two equi-joins + one groupBy —
all JVM, zero Python.

Exact-parity law (the q102/q107 integer-scoring recipe): each bigram's
log-probability is quantized to integer MICRO-NATS
(floor(ln(q6(p)) * 1e6 + 0.5)), summed as BIGINT (exact, order-free),
and the per-doc average is computed with integer half-up division —
so Spark and the DuckDB oracle agree bit-for-bit; the only float step
is one final /1e6 display division.

P(w2|w1) = (B(w1,w2) + 1) / (C(w1) + V)
  B = train bigram count, C = train count of w1 as a bigram context
  (positions 0..n-2), V = distinct train vocabulary.  Unseen context
  -> uniform 1/V fallback via the same formula with C=0, B=0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashes import h32_col, h32_sql
from .text import _q6_col, _q6_sql

DEFAULT_TRAIN_MOD = 5       # train on the h32(doc_id) % 5 == 0 slice
DEFAULT_NLL_KEEP_MICRO = 3_500_000   # keep: avg nll <= 3.5 nats


def _bigrams_df(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) exploded adjacent-token pairs.  The token array is
    materialized as its own projected column FIRST (repo law: no CSE
    inside lambda exprs), then zip_with pairs it with its shift."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks"))
    pairs = toks.select(
        "_id",
        F.expr("zip_with(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
               "slice(_toks, 2, greatest(size(_toks) - 1, 0)), "
               "(a, b) -> struct(a AS w1, b AS w2))").alias("_bg"))
    return (pairs.select("_id", F.explode("_bg").alias("bg"))
                 .select("_id", "bg.w1", "bg.w2"))


def bigram_perplexity(docs: DataFrame, id_col: str, text_col: str,
                      train_mod: int = DEFAULT_TRAIN_MOD,
                      keep_micro: int = DEFAULT_NLL_KEEP_MICRO) -> DataFrame:
    """-> (id_col, n_bigrams, nll_micro, nll_avg, keep) for every doc
    with at least one bigram."""
    is_train = F.pmod(h32_col(F.col(id_col).cast("string")),
                      F.lit(train_mod)) == 0
    train = docs.where(is_train)
    tbg = _bigrams_df(train, id_col, text_col)

    # ONE pass over the train bigrams: ctx and vocab derive from the
    # bigram count table (sum over w2 == the w1 context count; the
    # distinct words of big's two columns == the distinct words of
    # tbg's), and big is localCheckpointed because it feeds three
    # consumers — without the cut Catalyst re-executes the train scan
    # + explode per branch (scan_audit: 5 scans -> 2).
    big = (tbg.groupBy("w1", "w2")
              .agg(F.count(F.lit(1)).cast("long").alias("b"))
              .localCheckpoint())
    ctx = big.groupBy("w1").agg(F.sum("b").cast("long").alias("c"))
    # V = distinct vocabulary over ALL train token positions (w1 of
    # every bigram plus the final w2 covers every token of every doc
    # with >= 2 tokens)
    vocab = (big.select(F.col("w1").alias("w")).unionAll(
             big.select(F.col("w2").alias("w")))
             .agg(F.countDistinct("w").cast("long").alias("v")))

    sbg = _bigrams_df(docs, id_col, text_col)
    scored = (sbg
              .join(big, ["w1", "w2"], "left")
              .join(ctx, ["w1"], "left")
              .crossJoin(F.broadcast(vocab))
              .select(
                  "_id",
                  F.floor(F.log(_q6_col(
                      (F.coalesce(F.col("b"), F.lit(0)) + 1).cast("double")
                      / (F.coalesce(F.col("c"), F.lit(0)) + F.col("v"))
                  )) * 1000000 + F.lit(0.5)).cast("long").alias("lp")))
    agg = (scored.groupBy("_id")
           .agg(F.sum("lp").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n_bigrams")))
    return agg.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        F.expr("(-s * 2 + n_bigrams) div (2 * n_bigrams)")
         .cast("long").alias("nll_micro"),
    ).select(
        id_col, "n_bigrams", "nll_micro",
        (F.col("nll_micro") / F.lit(1000000.0)).alias("nll_avg"),
        (F.col("nll_micro") <= F.lit(keep_micro)).alias("keep"))


def bigram_perplexity_sql(table: str, id_col: str, text_col: str,
                          train_mod: int = DEFAULT_TRAIN_MOD,
                          keep_micro: int = DEFAULT_NLL_KEEP_MICRO) -> str:
    """DuckDB twin — identical counts, quantization, and integer
    average."""
    toks = f"string_split_regex(lower(trim({text_col})), '\\s+')"
    bg_src = f"""
      SELECT {id_col} AS _id,
             unnest(t[1:len(t)-1]) AS w1,
             unnest(t[2:len(t)]) AS w2
      FROM (SELECT {id_col}, {toks} AS t FROM {table})"""
    p = _q6_sql("(coalesce(b.b, 0) + 1)::DOUBLE / (coalesce(c.c, 0) + v.v)")
    return f"""
    WITH allbg AS ({bg_src}),
    trainbg AS (SELECT * FROM allbg
                WHERE ({h32_sql('_id::VARCHAR')} % {train_mod}) = 0),
    ctx AS (SELECT w1, count(*)::BIGINT AS c FROM trainbg GROUP BY w1),
    big AS (SELECT w1, w2, count(*)::BIGINT AS b
            FROM trainbg GROUP BY w1, w2),
    voc AS (SELECT count(DISTINCT w)::BIGINT AS v FROM
            (SELECT w1 AS w FROM trainbg
             UNION ALL SELECT w2 AS w FROM trainbg)),
    scored AS (
      SELECT a._id,
             floor(ln({p}) * 1000000 + 0.5e0)::BIGINT AS lp
      FROM allbg a
      LEFT JOIN big b ON a.w1 = b.w1 AND a.w2 = b.w2
      LEFT JOIN ctx c ON a.w1 = c.w1
      CROSS JOIN voc v),
    agg AS (SELECT _id, sum(lp)::BIGINT AS s,
                   count(*)::BIGINT AS n_bigrams
            FROM scored GROUP BY _id)
    SELECT _id AS {id_col}, n_bigrams,
           ((-s * 2 + n_bigrams) // (2 * n_bigrams))::BIGINT AS nll_micro,
           (((-s * 2 + n_bigrams) // (2 * n_bigrams)) / 1000000.0e0)
             AS nll_avg,
           (((-s * 2 + n_bigrams) // (2 * n_bigrams)) <= {keep_micro})
             AS keep
    FROM agg
    """


PMI_MIN_COUNT = 5
PMI_TOP_K = 100


def pmi_pairs(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", min_count: int = PMI_MIN_COUNT,
              k: int = PMI_TOP_K) -> DataFrame:
    """Top-k adjacent-pair PMI (pointwise mutual information — the
    classic collocation/association miner, Church & Hanks 1990) ->
    (w1, w2, n_pair, pmi_micro), ordered deterministically by
    (pmi desc, w1, w2) with an exact tiebreak.

    Law: pmi = ln(b * N / (c1 * c2)) with all four counts exact
    integers; the ratio is ONE double division of two exact <= 2^53
    products (IEEE-identical in both engines), 6dp-floor-quantized
    BEFORE the single ln, then micro-quantized (the q113/q122 law).

    Scale shape: everything after the bigram groupBy is
    vocabulary-sized; the count table feeds four consumers (c1, c2,
    N, scoring) and is localCheckpointed once — the scan-audit law.
    The top-k is TakeOrderedAndProject, never a global window."""
    bg = _bigrams_df(docs, id_col, text_col)
    big = (bg.groupBy("w1", "w2")
             .agg(F.count(F.lit(1)).cast("long").alias("b"))
             .localCheckpoint())
    c1 = big.groupBy("w1").agg(F.sum("b").cast("long").alias("c1"))
    c2 = big.groupBy("w2").agg(F.sum("b").cast("long").alias("c2"))
    n = big.agg(F.sum("b").cast("long").alias("n"))
    ratio = _q6_col((F.col("b") * F.col("n")).cast("double")
                    / (F.col("c1") * F.col("c2")).cast("double"))
    return (big.where(F.col("b") >= min_count)
            .join(c1, "w1").join(c2, "w2")
            .crossJoin(F.broadcast(n))
            .select("w1", "w2", F.col("b").alias("n_pair"),
                    F.floor(F.log(ratio) * 1000000 + F.lit(0.5))
                    .cast("long").alias("pmi_micro"))
            .orderBy(F.desc("pmi_micro"), "w1", "w2")
            .limit(k))


def pmi_pairs_sql(table: str, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_count: int = PMI_MIN_COUNT,
                  k: int = PMI_TOP_K) -> str:
    """DuckDB twin — identical counts, quantization, ordering."""
    toks = f"string_split_regex(lower(trim({text_col})), '\\s+')"
    ratio = _q6_sql("(b.b * n.n)::DOUBLE / (c1.c1 * c2.c2)::DOUBLE")
    return f"""
    WITH bg AS (
      SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
      FROM (SELECT {toks} AS t FROM {table})),
    b AS (SELECT w1, w2, count(*)::BIGINT AS b FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(b)::BIGINT AS c1 FROM b GROUP BY w1),
    c2 AS (SELECT w2, sum(b)::BIGINT AS c2 FROM b GROUP BY w2),
    n AS (SELECT sum(b)::BIGINT AS n FROM b)
    SELECT b.w1, b.w2, b.b AS n_pair,
           floor(ln({ratio}) * 1000000 + 0.5e0)::BIGINT AS pmi_micro
    FROM b JOIN c1 ON c1.w1 = b.w1
           JOIN c2 ON c2.w2 = b.w2
           CROSS JOIN n
    WHERE b.b >= {min_count}
    ORDER BY pmi_micro DESC, b.w1, b.w2
    LIMIT {k}
    """
