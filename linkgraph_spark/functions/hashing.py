"""Deterministic, engine-portable hashing primitives.

Every hash here is defined so that Spark and DuckDB compute the IDENTICAL
value (the correctness driver replays our queries in DuckDB):

- base hash: first 15 hex chars of md5 parsed as a 60-bit integer
  (Spark ``conv(substring(md5(x),1,15),16,10)``;
  DuckDB ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``);
- derived hash family: ``h_j(x) = (a_j * (x mod P) + b_j) mod P`` with
  ``P = 2^31 - 1`` and small fixed ``a_j``, ``b_j`` — products stay < 2^62,
  so int64 arithmetic never overflows in either engine.

Never use engine-native ``hash()``/``xxhash64`` in anything oracle-checked:
they differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def md5_long(col: Column) -> Column:
    """60-bit integer hash of a string, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB-side mirror of :func:`md5_long`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash_params(k: int) -> list[tuple[int, int]]:
    """k fixed (a, b) pairs for the universal hash family — no RNG."""
    return [(1 + 7 * j, 13 + 97 * j) for j in range(1, k + 1)]


def affine_mod(x: Column, a: int, b: int) -> Column:
    """``(a * (x mod P) + b) mod P`` — overflow-safe in int64."""
    return (F.lit(a) * (x % F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(MERSENNE_P)


def affine_mod_sql(expr: str, a: int, b: int) -> str:
    return f"(({a} * (({expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
