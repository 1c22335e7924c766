"""Embedding-column preparation functions (ANN/index prep, pure JVM
array expressions with exact DuckDB twins — no Python touches the
vectors).

matryoshka_truncate: keep the first `dim` components and L2-renormalize
(Matryoshka representation learning, Kusupati et al. 2022, public) —
the standard storage/compute knob before indexing: a 64-d corpus
searched at 16-d costs 4x less with most of the recall. The truncated
norm is reported so downstream can filter degenerate vectors (tiny
norm = the prefix carries no signal for that row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def matryoshka_truncate(df: DataFrame, id_col: str, vec_col: str,
                        dim: int, eps: float = 1e-12) -> DataFrame:
    """-> (id, vec array<double> unit-normalized prefix, prefix_norm).
    prefix_norm is rounded to 9dp (distributed float sums are
    summation-order-dependent across engines at the last ulps)."""
    v = F.slice(F.col(vec_col).cast("array<double>"), 1, dim)
    df = df.select(F.col(id_col), v.alias("_v"))
    norm = F.sqrt(F.aggregate("_v", F.lit(0.0), lambda a, x: a + x * x))
    df = df.select(F.col(id_col), "_v", norm.alias("_norm"))
    unit = F.transform("_v", lambda x: x / F.greatest("_norm", F.lit(eps)))
    return df.select(
        F.col(id_col),
        unit.alias("vec"),
        (F.floor(F.col("_norm") * 1e9 + 0.5) / 1e9).alias("prefix_norm"))


def matryoshka_truncate_sql(table: str, id_col: str, vec_col: str,
                            dim: int, eps: float = 1e-12) -> str:
    """DuckDB twin. The sliced list is CTE-materialized before the
    lambda passes (DuckDB re-evaluates inlined list exprs per call)."""
    return f"""
    WITH s AS MATERIALIZED (
        SELECT {id_col}, ({vec_col}::DOUBLE[])[1:{dim}] AS v
        FROM {table}),
    n AS MATERIALIZED (
        SELECT {id_col}, v,
               sqrt(list_reduce(list_transform(v, x -> x * x),
                                (a, b) -> a + b)) AS nrm
        FROM s)
    SELECT {id_col},
           list_transform(v, x -> x / greatest(nrm, {eps!r})) AS vec,
           floor(nrm * 1e9 + 0.5e0) / 1e9 AS prefix_norm
    FROM n
    """


def embedding_audit(embeddings: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding",
                    expect_dim: int = 64) -> DataFrame:
    """Embedding-corpus health audit per label -> (label, n_vecs,
    n_bad_dim, n_subunit, sum_norm_u, avg_norm_u): the ingest gate a
    vector pipeline runs before indexing (wrong dimensionality,
    collapsed / near-zero vectors, per-slice norm drift that breaks
    cosine-vs-dot assumptions).

    Law: norm_u = floor(sqrt(sequential-fold sum of squares) * 1e6 +
    0.5) per row — Spark's aggregate() and DuckDB's list_reduce fold
    in the same element order (the q62 rms precedent), and the
    per-row BIGINT makes every aggregate order-independent;
    avg_norm_u is truncating BIGINT division; n_subunit counts
    norm_u < 1e6.  Scale shape: one map-side-combinable groupBy."""
    norm_u = F.expr(
        f"CAST(floor(sqrt(aggregate({vec_col}, CAST(0.0 AS DOUBLE),"
        f" (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        f" * 1e6 + 0.5e0) AS BIGINT)")
    base = embeddings.select(
        F.col(label_col).alias("label"),
        F.size(vec_col).alias("_dim"),
        norm_u.alias("_nu"))
    return (base.groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.sum(F.expr(f"CASE WHEN _dim != {expect_dim} THEN 1"
                              f" ELSE 0 END")).cast("long")
                 .alias("n_bad_dim"),
                 F.sum(F.expr("CASE WHEN _nu < 1000000 THEN 1 ELSE 0"
                              " END")).cast("long").alias("n_subunit"),
                 F.sum("_nu").cast("long").alias("sum_norm_u"))
            .withColumn("avg_norm_u",
                        F.expr("sum_norm_u div n_vecs").cast("long")))


def embedding_audit_sql(table: str = "embeddings",
                        label_col: str = "label",
                        vec_col: str = "embedding",
                        expect_dim: int = 64) -> str:
    return f"""
    WITH e AS (SELECT {label_col} AS label,
                      len({vec_col})::BIGINT AS dim,
                      floor(sqrt(list_reduce(
                        list_transform({vec_col}::DOUBLE[],
                                       x -> x * x),
                        (a, b) -> a + b)) * 1e6 + 0.5e0)::BIGINT AS nu
               FROM {table})
    SELECT label, count(*)::BIGINT AS n_vecs,
           sum(CASE WHEN dim != {expect_dim} THEN 1 ELSE 0 END)::BIGINT
             AS n_bad_dim,
           sum(CASE WHEN nu < 1000000 THEN 1 ELSE 0 END)::BIGINT
             AS n_subunit,
           sum(nu)::BIGINT AS sum_norm_u,
           (sum(nu) // count(*))::BIGINT AS avg_norm_u
    FROM e GROUP BY label
    """
