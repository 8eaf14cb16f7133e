"""Cross-engine deterministic hashing.

Every hash here is defined to produce BIT-IDENTICAL values in Spark SQL and
ANSI/DuckDB SQL, so dedup / LSH operators can be validated against an
external oracle:

* ``hash64`` — 60-bit integer from the first 15 hex chars of md5 (always
  positive, fits int64 in both engines).
* minhash permutations — ``(a*h + b) mod P`` with P = 2^61−1; the product
  needs 121 bits, computed exactly via DECIMAL(38,0) in Spark and HUGEINT in
  DuckDB.

Scale note: md5 is fine here — one hash per token, JVM-side, no shuffle; at
100 TB the cost is dominated by the tokenization scan itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1 (Mersenne prime): modulus for minhash permutations
MERSENNE_P = 2305843009213693951

# modulus for 32-bit-input permutations: fits entirely in int64 arithmetic
# (a < 2^21, h < 2^32, a*h + b < 2^53) — no wide-decimal needed
PERM32_P = 4294967291  # largest 32-bit prime

# deterministic permutation parameters (odd multipliers < 2^21)
MINHASH_PERMS: list[tuple[int, int]] = [
    (1000003 + 2 * i, 12345 + 7919 * i) for i in range(16)
]


def hash64(col: Column) -> Column:
    """60-bit positive hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    """Same hash in DuckDB SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash64_spark_sql(expr: str) -> str:
    """:func:`hash64` as Spark SQL expression text — for operators that
    build their expressions as SQL strings (one JVM parse instead of py4j
    round trips per node; see plans/views.py)."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def hash32(col: Column) -> Column:
    """32-bit positive hash (first 8 hex chars of md5) — cheap enough to
    permute in plain int64 arithmetic (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def hash32_spark_sql(expr: str) -> str:
    """:func:`hash32` as Spark SQL expression text (see hash64_spark_sql)."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def perm_hash(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod P over a 32-bit input hash — pure int64, no decimals.
    Bit-identical in both engines (exact integer math)."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(PERM32_P)


def perm_hash_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr}) * {a} + {b}) % {PERM32_P}"


def hashes_expr(tokens: Column) -> Column:
    """One 32-bit hash per token — computed ONCE; permutations reuse it."""
    return F.transform(tokens, hash32)


def minhash_from_hashes(hashes: Column, perm_index: int) -> Column:
    """min over pre-computed token hashes of the perm_index-th permutation."""
    a, b = MINHASH_PERMS[perm_index]
    return F.array_min(F.transform(hashes, lambda h: perm_hash(h, a, b)))


def minhash_sql(tokens_expr: str, perm_index: int) -> str:
    a, b = MINHASH_PERMS[perm_index]
    return (
        f"list_min(list_transform({tokens_expr}, "
        f"t -> {perm_hash_sql(hash32_sql('t'), a, b)}))"
    )
