"""Blocked entity resolution (record linkage) — multi-pass blocking +
edit-distance verification, dedup-free emission, oracle-twinned.

Why this op: merging dirty entity tables (customer/supplier/author
records with typos) is a standard curation step; the naive form is an
all-pairs levenshtein — O(n^2) string comparisons. The standard fix
(Fellegi-Sunter / sorted-neighborhood lineage) is BLOCKING: only
compare records sharing a cheap key, with multiple complementary
passes so single-typo duplicates cannot escape every pass.

Law (deterministic, identical in the DuckDB twin — blocking IS the
operator semantics, exactly like the LSH banding in q23):
  pass 1 blocks on (length, first 2 chars), pass 2 on (length, last
  2 chars). A single-character substitution leaves at least one end
  intact (names are >= 5 chars), so planted 1-edit duplicates have
  100% recall. Verification: levenshtein(a, b) <= max_dist (built-in
  and identical in Spark and DuckDB). Pass 2 emits ONLY pairs whose
  pass-1 keys differ — each pair appears exactly once, no distinct()
  shuffle.

Scale shape (100 TB): two hash-partitioned equi-joins on small block
keys; comparisons bounded by block co-membership, never n^2. A hot
block (common surname) is a data property — lengthen the key. The
levenshtein verify runs JVM-side inside whole-stage codegen.

Behavioral reference: the reference engine has no string-linkage
surface; this extends the dedup family (SURVEY §2 extension ops)
from token/vector similarity to string edit distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import h32_col, h32_sql

WORDS = [
    "kora", "lumen", "tavi", "brask", "senna", "vorel", "micha",
    "dren", "palto", "quiv", "rosan", "telm", "ugar", "vestra",
    "wilco", "xanti", "yerba", "zolt", "ambri", "boken", "cedro",
    "dulat", "ferin", "golva", "harnet", "iskra", "jomer", "kelvi",
    "lorad", "meston", "norba", "ostin",
]
MAX_DIST = 2


def blocked_pairs(records: DataFrame, id_col: str = "rec_id",
                  name_col: str = "name",
                  max_dist: int = MAX_DIST) -> DataFrame:
    """-> (rec_a, rec_b, dist): all intra-block pairs with
    levenshtein <= max_dist, rec_a < rec_b, each pair exactly once."""
    # 4 consumers below (a/b x two passes): checkpoint the narrow
    # (id, name, keys) projection once instead of recomputing the
    # upstream 4x — the scan-audit law (8 -> 1 source scans)
    r = records.select(
        F.col(id_col).alias("_rid"), F.col(name_col).alias("_nm"),
        F.length(name_col).alias("_ln"),
        F.substring(name_col, 1, 2).alias("_pre"),
        F.expr(f"substring({name_col}, length({name_col}) - 1, 2)")
        .alias("_suf")).localCheckpoint(eager=False)
    a = r.select(*[F.col(c).alias(c + "a") for c in r.columns])
    b = r.select(*[F.col(c).alias(c + "b") for c in r.columns])
    verify = (F.col("_rida") < F.col("_ridb")) & \
        (F.levenshtein("_nma", "_nmb") <= max_dist)
    out_cols = [F.col("_rida").alias("rec_a"),
                F.col("_ridb").alias("rec_b"),
                F.levenshtein("_nma", "_nmb").alias("dist")]
    p1 = (a.join(b, (a._lna == b._lnb) & (a._prea == b._preb))
          .where(verify).select(*out_cols))
    # pass 2: suffix block, emitting only pairs pass 1 cannot see
    p2 = (a.join(b, (a._lna == b._lnb) & (a._sufa == b._sufb))
          .where(verify & (F.col("_prea") != F.col("_preb")))
          .select(*out_cols))
    return p1.unionByName(p2)


# ---------------------------------------------------------------- #
# Deterministic dirty-record table from customer + oracle twin      #
# ---------------------------------------------------------------- #

def dirty_records(customer: DataFrame) -> DataFrame:
    """Every customer yields one clean record (rec_id = 10*key); every
    key % 3 == 0 also yields a 1-substitution duplicate (10*key + 1).
    Names are 3 words drawn from WORDS by the md5-h32 law, so distinct
    entities are far apart in edit distance."""
    words = F.array(*[F.lit(w) for w in WORDS])
    key = F.col("c_custkey").cast("string")

    def pick(tag):
        return F.element_at(words,
                            (h32_col(F.concat(F.lit(tag), key)) % 32 + 1)
                            .cast("int"))

    base = customer.select(
        (F.col("c_custkey") * 10).alias("rec_id"),
        F.concat_ws(" ", pick("a"), pick("b"), pick("c")).alias("name"))
    pos = (h32_col(F.concat(F.lit("p"), key)) % F.length("name") + 1) \
        .cast("int")
    sub = F.expr("char(97 + pmod(CAST(" +
                 "conv(substring(md5(concat('l', _k)), 1, 8), 16, 10)"
                 " AS BIGINT), 26))")
    dup = (customer.where(F.col("c_custkey") % 3 == 0)
           .withColumn("_k", key)
           .withColumn("name",
                       F.concat_ws(" ", pick("a"), pick("b"), pick("c")))
           .withColumn("_pos", pos)
           .select(
               (F.col("c_custkey") * 10 + 1).alias("rec_id"),
               F.concat(
                   F.expr("substring(name, 1, _pos - 1)"), sub,
                   F.expr("substring(name, _pos + 1)")).alias("name")))
    return base.unionByName(dup)


def dirty_records_sql(table: str = "customer") -> str:
    wl = "[" + ", ".join(f"'{w}'" for w in WORDS) + "]"

    def pick(tag):
        h = h32_sql(f"'{tag}' || c_custkey::VARCHAR")
        return f"({wl})[({h} % 32 + 1)::INT]"

    nm = f"{pick('a')} || ' ' || {pick('b')} || ' ' || {pick('c')}"
    hp = h32_sql("'p' || c_custkey::VARCHAR")
    hl = h32_sql("'l' || c_custkey::VARCHAR")
    return f"""
      SELECT c_custkey * 10 AS rec_id, {nm} AS name FROM {table}
      UNION ALL
      SELECT c_custkey * 10 + 1 AS rec_id,
             substr(nm, 1, p - 1) || chr((97 + {hl} % 26)::INT)
               || substr(nm, p + 1) AS name
      FROM (SELECT c_custkey, {nm} AS nm,
                   ({hp} % length({nm}) + 1)::INT AS p
            FROM {table} WHERE c_custkey % 3 = 0)"""


def blocked_pairs_sql(table: str = "customer",
                      max_dist: int = MAX_DIST) -> str:
    """DuckDB twin: identical two-pass blocking law (the blocking is
    the semantics; a full O(n^2) scan could find 2-edit pairs that
    straddle both blocks, by design out of scope)."""
    return f"""
    WITH recs AS ({dirty_records_sql(table)}),
    r AS (SELECT rec_id, name, length(name) AS ln,
                 substr(name, 1, 2) AS pre,
                 substr(name, length(name) - 1, 2) AS suf
          FROM recs)
    SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
           levenshtein(a.name, b.name)::BIGINT AS dist
    FROM r a JOIN r b ON a.ln = b.ln AND a.pre = b.pre
    WHERE a.rec_id < b.rec_id
      AND levenshtein(a.name, b.name) <= {max_dist}
    UNION ALL
    SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
           levenshtein(a.name, b.name)::BIGINT AS dist
    FROM r a JOIN r b ON a.ln = b.ln AND a.suf = b.suf
    WHERE a.rec_id < b.rec_id AND a.pre <> b.pre
      AND levenshtein(a.name, b.name) <= {max_dist}
    """
