"""Keyed interval-overlap join — the "find all pairs of time ranges
that intersect" operator (concurrent sessions, overlapping orders,
IP-lease vs flow-record matching, validity-interval reconciliation).
Spark has no native range/interval join; the naive expression is a
theta join that degenerates to a per-key cartesian product.

Algorithm (standard temporal blocking, cf. the interval-partitioning
range joins in Oracle/Trino/DuckDB literature): quantize every
interval [start, end] (closed, integer units) to the bucket range
start div W .. end div W, explode each side onto its covered buckets,
equi-join on (key, bucket), verify the exact overlap predicate, and
emit each pair EXACTLY ONCE — in the bucket containing
greatest(l.start, r.start). That bucket is covered by BOTH intervals
whenever they overlap (max(start) <= min(end)), so no distinct() /
dedup shuffle is needed.

Scale shape (100 TB): one hash exchange per side on (key, bucket);
explosion factor is ceil(len/W)+1 <= 2 when W is chosen near the
typical interval length. Long outlier intervals cost duplication
O(len/W), never a cross product. The output is bounded by true
overlaps per key — the inherent result size — not by n^2.

Behavioral reference: the reference engine joins image footprints to
chunk ranges analytically (src/mosaic: tile->chunk inversion, our
operators/mosaic.py J2); this generalizes the same
block-then-verify-once pattern to 1-D time ranges on an arbitrary
key, part of the training-pipeline extension surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET = 32


def _bucketed(df: DataFrame, key_cols: Sequence[str], id_col: str,
              start_col: str, end_col: str, w: int,
              prefix: str) -> DataFrame:
    """Explode one side onto its covered buckets; rename payload
    columns to prefix_* so the two sides never collide."""
    sel = [F.col(k) for k in key_cols] + [
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(start_col).cast("long").alias(f"{prefix}_start"),
        F.col(end_col).cast("long").alias(f"{prefix}_end"),
    ]
    b = df.select(*sel)
    return b.withColumn(
        "_bkt",
        F.explode(F.expr(
            f"sequence({prefix}_start div {w}, {prefix}_end div {w})")))


def interval_join(left: DataFrame, right: DataFrame,
                  key_cols: Sequence[str] = ("key",),
                  id_col: str = "iid", start_col: str = "start",
                  end_col: str = "end",
                  bucket: int = DEFAULT_BUCKET) -> DataFrame:
    """All (l, r) pairs sharing key_cols whose closed integer
    intervals overlap -> key_cols + (l_id, l_start, l_end, r_id,
    r_start, r_end, overlap_len). Each pair emitted exactly once."""
    lb = _bucketed(left, key_cols, id_col, start_col, end_col,
                   bucket, "l")
    rb = _bucketed(right, key_cols, id_col, start_col, end_col,
                   bucket, "r")
    on = list(key_cols) + ["_bkt"]
    j = lb.join(rb, on=on)
    overlap = (F.col("l_start") <= F.col("r_end")) & \
              (F.col("r_start") <= F.col("l_end"))
    once = F.col("_bkt") == F.expr(
        f"greatest(l_start, r_start) div {bucket}")
    return (j.where(overlap & once)
            .select(*key_cols, "l_id", "l_start", "l_end",
                    "r_id", "r_start", "r_end",
                    (F.least("l_end", "r_end")
                     - F.greatest("l_start", "r_start") + 1)
                    .alias("overlap_len")))


def concurrent_intervals(df: DataFrame,
                         key_cols: Sequence[str] = ("key",),
                         id_col: str = "iid", start_col: str = "start",
                         end_col: str = "end",
                         bucket: int = DEFAULT_BUCKET) -> DataFrame:
    """Self overlap-join with the canonical l_id < r_id ordering (each
    unordered pair once, no self-pairs)."""
    out = interval_join(df, df, key_cols, id_col, start_col, end_col,
                        bucket)
    return out.where(F.col("l_id") < F.col("r_id"))


def order_intervals(orders: DataFrame) -> DataFrame:
    """Deterministic interval table from the orders testdata: start =
    epoch-day of o_orderdate, duration o_orderkey % 30 + 1 days,
    keyed by customer. Used by q129 and its oracle twin."""
    return orders.selectExpr(
        "o_custkey AS key",
        "o_orderkey AS iid",
        "datediff(o_orderdate, DATE '1970-01-01') AS start",
        "datediff(o_orderdate, DATE '1970-01-01')"
        " + o_orderkey % 30 + 1 AS end")


def concurrent_orders_sql(table: str = "orders") -> str:
    """DuckDB twin of q129: brute-force per-key theta join (different
    algorithm, same law — the oracle never re-implements the
    blocking). DuckDB date subtraction yields integer days."""
    return f"""
    WITH iv AS (
      SELECT o_custkey AS key, o_orderkey AS iid,
             (o_orderdate::DATE - DATE '1970-01-01')::BIGINT AS s,
             ((o_orderdate::DATE - DATE '1970-01-01')
              + o_orderkey % 30 + 1)::BIGINT AS e
      FROM {table})
    SELECT a.key AS key, a.iid AS l_id, a.s AS l_start, a.e AS l_end,
           b.iid AS r_id, b.s AS r_start, b.e AS r_end,
           (least(a.e, b.e) - greatest(a.s, b.s) + 1)::BIGINT
             AS overlap_len
    FROM iv a JOIN iv b
      ON a.key = b.key AND a.iid < b.iid
     AND a.s <= b.e AND b.s <= a.e
    """
