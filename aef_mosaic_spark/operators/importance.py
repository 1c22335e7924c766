"""DSIR-style importance weighting for data selection (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling"
— public). Score every document by how much its hashed bag-of-ngram
features look like a TARGET distribution vs the SOURCE distribution:

    weight(doc) = sum over gram instances g of
                  ln p_target(bucket(g)) - ln p_source(bucket(g))

with Laplace-smoothed bucket probabilities over `n_buckets` hashed
(unigram + bigram) features. High-weight docs are the ones importance
resampling keeps when curating a web-scale corpus toward a small
high-quality target (the paper's Pile -> Wikipedia/book setup).

Scale shape (10^12 docs): one explode over grams (~tokens/doc), one
map-side-combined groupBy(bucket) (output <= n_buckets rows), one
broadcast join of the bucket table back onto the gram stream, one
groupBy(doc). No windows, no driver-side loops; the only collected
state is nothing at all — totals ride a 1-row crossJoin.

Engine-parity recipe: the per-bucket log-ratio is floor-quantized to
6dp AS AN INTEGER (lrq = floor(lr * 1e6 + 0.5) :: BIGINT), so the
per-doc aggregation is an EXACT integer sum — order-independent
across partitions and engines (float log-ratio sums would drift with
summation order). The final weight divides the exact sum by 1e6 once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aef_mosaic_spark.functions.hashes import h32_col, h32_sql

DSIR_BUCKETS = 512


def _grams_col(text):
    """Unigrams + bigrams of whitespace tokens (lowercased). Guard the
    bigram sequence: Spark's sequence(1, 0) steps BACKWARD, so a
    one-token doc must take the empty-array branch explicitly."""
    w = F.split(F.lower(F.trim(text)), r"\s+")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat(F.element_at(w, i), F.lit(" "),
                               F.element_at(w, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(w, bigrams)


def dsir_weights(df: DataFrame, id_col: str, text_col: str,
                 target_col: str, target_value: str,
                 n_buckets: int = DSIR_BUCKETS,
                 salt: str = "dsir-v1") -> DataFrame:
    """-> (id_col, n_grams int, weight double), one row per input doc.
    Target corpus = rows with df[target_col] == target_value; source =
    the rest. weight > 0 means the doc's hashed-ngram profile is more
    target-like than source-like."""
    b = int(n_buckets)
    grams = df.select(
        F.col(id_col),
        (F.col(target_col) == target_value).cast("int").alias("_is_t"),
        F.explode(_grams_col(F.col(text_col))).alias("_gram"),
    ).withColumn(
        "_bucket",
        F.pmod(h32_col(F.concat(F.lit(f"{salt}:"), F.col("_gram"))),
               F.lit(b)).cast("int"),
    ).drop("_gram")
    stats = grams.groupBy("_bucket").agg(
        F.sum("_is_t").cast("long").alias("_c_t"),
        F.sum(1 - F.col("_is_t")).cast("long").alias("_c_s"),
    )
    totals = stats.agg(F.sum("_c_t").cast("long").alias("_n_t"),
                       F.sum("_c_s").cast("long").alias("_n_s"))
    lr = stats.crossJoin(F.broadcast(totals)).select(
        "_bucket",
        F.floor(
            (F.log((F.col("_c_t") + 1) / (F.col("_n_t") + b))
             - F.log((F.col("_c_s") + 1) / (F.col("_n_s") + b)))
            * 1000000 + F.lit(0.5)
        ).cast("long").alias("_lrq"),
    )
    return (grams.join(F.broadcast(lr), "_bucket")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_grams"),
                 F.sum("_lrq").cast("long").alias("_wq"))
            .select(id_col, "n_grams",
                    (F.col("_wq") / 1000000).alias("weight")))


def dsir_weights_sql(table: str, id_col: str, text_col: str,
                     target_col: str, target_value: str,
                     n_buckets: int = DSIR_BUCKETS,
                     salt: str = "dsir-v1") -> str:
    """DuckDB twin: identical grams, buckets, smoothing and integer
    quantization (every integer sum carries ::BIGINT — HUGEINT
    corrupts through the driver's Arrow fetch)."""
    b = int(n_buckets)
    w = f"string_split_regex(lower(trim({text_col})), '\\s+')"
    h = h32_sql(f"('{salt}:' || gram)")
    return f"""
    WITH base AS (
      SELECT {id_col},
             (CASE WHEN {target_col} = '{target_value}' THEN 1
                   ELSE 0 END) AS is_t,
             list_concat(
               {w},
               (CASE WHEN len({w}) >= 2 THEN
                  list_transform(generate_series(1, len({w}) - 1),
                                 i -> {w}[i] || ' ' || {w}[i + 1])
                ELSE [] END)) AS grams
      FROM {table}
    ),
    g AS (
      SELECT {id_col}, is_t, ({h} % {b})::INT AS bucket
      FROM (SELECT {id_col}, is_t, unnest(grams) AS gram FROM base)
    ),
    stats AS (
      SELECT bucket, sum(is_t)::BIGINT AS c_t,
             sum(1 - is_t)::BIGINT AS c_s
      FROM g GROUP BY bucket
    ),
    tot AS (
      SELECT sum(c_t)::BIGINT AS n_t, sum(c_s)::BIGINT AS n_s
      FROM stats
    ),
    lr AS (
      SELECT bucket,
             CAST(floor((ln((c_t + 1)::DOUBLE / (n_t + {b}))
                         - ln((c_s + 1)::DOUBLE / (n_s + {b})))
                        * 1000000 + 0.5e0) AS BIGINT) AS lrq
      FROM stats, tot
    )
    SELECT g.{id_col}, count(*)::INT AS n_grams,
           (sum(lr.lrq)::BIGINT / 1000000) AS weight
    FROM g JOIN lr USING (bucket)
    GROUP BY g.{id_col}
    """
