"""Deterministic hashes expressible identically in Spark Columns AND
ANSI SQL (DuckDB) — the foundation of the oracle-checkable dedup ops.

Engine-native hashes (Spark xxhash64/murmur vs DuckDB hash) differ, so
everything here derives from md5 hex, which both engines compute
identically: h32(x) = int(first 8 hex chars of md5(x), 16) — an
unsigned 32-bit value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MinHash permutation family: (a*h + b) mod P over the 32-bit token
# hash, P prime > 2^32 (classic universal hashing; Broder 1997).
MINHASH_P = 4294967311  # smallest prime > 2^32


def h32_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def minhash_coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs, a odd, derived from a fixed LCG so
    the identical literals appear in the Spark plan and the oracle SQL."""
    out = []
    state = seed * 6364136223846793005 + 1442695040888963407
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MINHASH_P - 2)) | 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MINHASH_P
        out.append((a, b))
    return out


def minhash_col(h: Column, a: int, b: int) -> Column:
    # (a*h + b) % P needs >64-bit intermediates: a,h < 2^32 so a*h can
    # overflow long only if a*h > 2^63 — a < 2^32, h < 2^32 -> a*h < 2^64.
    # Split h into hi/lo 16-bit halves to stay within long arithmetic.
    hi = (F.lit(a) * F.shiftrightunsigned(h, 16)) % MINHASH_P
    lo = (F.lit(a) * (h.bitwiseAND(F.lit(0xFFFF)))) % MINHASH_P
    return ((hi * F.lit(65536)) % MINHASH_P + lo + F.lit(b)) % MINHASH_P


def minhash_sql(h_expr: str, a: int, b: int) -> str:
    hi = f"(({a}::HUGEINT * ({h_expr} >> 16)) % {MINHASH_P})"
    lo = f"(({a}::HUGEINT * ({h_expr} & 65535)) % {MINHASH_P})"
    return f"((({hi} * 65536) % {MINHASH_P} + {lo} + {b}) % {MINHASH_P})::BIGINT"
