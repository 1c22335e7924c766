"""Broadcast Bloom-filter decontamination — fixed-size approximate
membership against a benchmark fingerprint set.

The exact benchmark-contamination check (q59, `__spark_entry__.py`)
broadcasts the full benchmark fingerprint SET to every executor —
O(|benchmark|) bytes. A Bloom filter caps that broadcast state at a
FIXED size (default 1024 int64 registers ~ 8 KB for m = 2^15 bits)
with ZERO false negatives: every truly-contaminated document is still
flagged, and the tunable false-positive rate only adds a small
superset (asserted + measured in tests/test_dedup_text.py). At 100 TB
the corpus scan dominates either way; the filter makes the
decontamination state O(1) no matter how many held-out benchmarks are
pooled, and the probe is a broadcast equi-join on at most `m/32`
register rows — never a shuffle of the corpus.

Cross-engine determinism (the DuckDB oracle builds the IDENTICAL
filter): bit positions use the md5-derived h32 law (hashes.py)
    h_i(fp) = h32(CAST(fp AS STRING) || '#' || i) mod m_bits
and registers hold 32 bits each, so every stored value is < 2^32
(< 2^63: DuckDB-safe — it errors on BIGINT overflow where Spark
wraps). Build = groupBy(reg) of bit_or(1 << bit); probe = left join
on reg + `(val >> bit) & 1`; a fingerprint passes iff ALL k probes
hit; a document is contaminated iff any fingerprint passes.

Reference behavior analog: aef-mosaic has no decontamination surface;
this extends the q54/q59 winnowing family (Schleimer/Wilkerson/Aiken
2003) with the standard Bloom (1970) membership sketch.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashes import h32_col, h32_sql

BLOOM_M_BITS = 32768          # 2^15 bits -> 1024 x 32-bit registers
BLOOM_K = 3


def _pos_col(fp: Column, i: int, m_bits: int) -> Column:
    return h32_col(F.concat(fp.cast("string"), F.lit(f"#{i}"))) % m_bits


def bloom_build(fps: DataFrame, fp_col: str = "fp",
                m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """Bloom registers for a fingerprint column -> (reg, val).
    At most m_bits/32 rows; val < 2^32. The mergeable fixed-size
    state: bit_or of two builds == build of the union."""
    probes = fps.select(F.explode(F.array(
        *[_pos_col(F.col(fp_col), i, m_bits) for i in range(k)]
    )).alias("h"))
    return (probes
            .select(F.expr("h div 32").alias("reg"),
                    F.expr("CAST(h % 32 AS INT)").alias("bit"))
            .groupBy("reg")
            .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))")
                 .alias("val")))


def bloom_probe(items: DataFrame, registers: DataFrame, fp_col: str = "fp",
                m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """Membership test of every input row's fingerprint against the
    (broadcast) register table -> input columns + `bloom_hit` (int,
    1 = possibly-member, 0 = definitely-not). k probe rows per item,
    broadcast left join on reg, AND-reduced back to one row."""
    cols = items.columns
    pr = items.select(
        *cols,
        F.posexplode(F.array(
            *[_pos_col(F.col(fp_col), i, m_bits) for i in range(k)]
        )).alias("_i", "_h"))
    joined = pr.join(
        F.broadcast(registers),
        F.expr("_h div 32") == registers["reg"], "left")
    hit = F.when(
        F.expr("(shiftright(val, CAST(_h % 32 AS INT)) & 1) = 1"),
        1).otherwise(0)
    return (joined.select(*cols, hit.alias("_hit"))
            .groupBy(*cols)
            .agg(F.min("_hit").cast("int").alias("bloom_hit")))


def bloom_contamination(docs: DataFrame, doc_id: str = "doc_id",
                        text: str = "text",
                        m_bits: int = BLOOM_M_BITS,
                        k: int = BLOOM_K) -> DataFrame:
    """q59's contamination scan with the exact benchmark set replaced
    by its Bloom filter -> (doc_id, n_fp, n_hits, contaminated) for
    every non-benchmark document. Benchmark = the deterministic
    doc_id % 17 == 3 slice (q59's stand-in). Guaranteed superset of
    the exact q59 flag set (no false negatives)."""
    from .text import winnow_grams_col, winnow_mins_col

    g = docs.select(F.col(doc_id).alias("doc_id"),
                    winnow_grams_col(F.col(text)).alias("_g"))
    fp = g.select("doc_id",
                  F.explode(winnow_mins_col(F.col("_g"))).alias("fp")) \
        .distinct()
    bench = fp.where(F.col("doc_id") % 17 == 3).select("fp").distinct()
    regs = bloom_build(bench, m_bits=m_bits, k=k)
    probed = bloom_probe(fp.where(F.col("doc_id") % 17 != 3), regs,
                         m_bits=m_bits, k=k)
    return (probed.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_fp"),
                 F.sum("bloom_hit").cast("long").alias("n_hits"),
                 F.max("bloom_hit").cast("int").alias("contaminated")))


def bloom_contamination_sql(source: str, doc_id: str = "doc_id",
                            text: str = "text",
                            m_bits: int = BLOOM_M_BITS,
                            k: int = BLOOM_K) -> str:
    """DuckDB twin of bloom_contamination — builds the IDENTICAL
    filter (same h32 positions, same 32-bit registers; `//` on BIGINT
    integer-divides, and 1::BIGINT << 31 stays < 2^32)."""
    from .text import winnow_grams_sql, winnow_mins_sql

    def pos(fp_expr: str, i_expr: str) -> str:
        return (h32_sql(f"{fp_expr}::VARCHAR || '#' || {i_expr}")
                + f" % {m_bits}")

    return f"""
    WITH g AS (SELECT {doc_id} AS doc_id,
                      {winnow_grams_sql(text)} AS grams FROM {source}),
    fp AS (SELECT DISTINCT doc_id,
                  unnest({winnow_mins_sql('grams')}) AS fp FROM g),
    bench AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 17 = 3),
    bpr AS (SELECT {pos('fp', 'i')} AS h
            FROM bench, (SELECT unnest(generate_series(0, {k - 1})) AS i)),
    regs AS (SELECT h // 32 AS reg,
                    bit_or(1::BIGINT << (h % 32)::INT) AS val
             FROM bpr GROUP BY h // 32),
    dpr AS (SELECT doc_id, fp, {pos('fp', 'i')} AS h
            FROM (SELECT doc_id, fp FROM fp WHERE doc_id % 17 <> 3),
                 (SELECT unnest(generate_series(0, {k - 1})) AS i)),
    hit AS (SELECT doc_id, fp,
                   min(CASE WHEN ((r.val >> (dpr.h % 32)::INT) & 1) = 1
                       THEN 1 ELSE 0 END) AS ok
            FROM dpr LEFT JOIN regs r ON r.reg = dpr.h // 32
            GROUP BY doc_id, fp)
    SELECT doc_id, count(*)::BIGINT AS n_fp, sum(ok)::BIGINT AS n_hits,
           max(ok)::INT AS contaminated
    FROM hit GROUP BY doc_id
    """
