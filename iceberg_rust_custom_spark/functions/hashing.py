"""Cross-engine deterministic hashing.

The LLM-pipeline operators (minhash dedup, simhash, fingerprinting) need a
hash that is (a) computable as a JVM-side Spark expression (no Python in the
hot path) and (b) reproducible in ANSI SQL so the DuckDB oracle can verify
results value-for-value.

``md5h32(x)``: interpret the first 8 hex chars of md5(x) as a 32-bit
unsigned int. md5/substr/instr behave identically in Spark SQL and DuckDB,
so ONE expression string serves both engines; the hex→int conversion is an
8-term positional-arithmetic polynomial (no engine-specific hex-parse
function needed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX_DIGITS = "0123456789abcdef"


def md5h32_sql(inner: str) -> str:
    """SQL expression (valid in BOTH Spark SQL and DuckDB) computing the
    32-bit hash of the string expression ``inner``."""
    terms = []
    for i in range(1, 9):
        weight = 16 ** (8 - i)
        terms.append(
            f"(instr('{_HEX_DIGITS}', substr(md5({inner}), {i}, 1)) - 1) * CAST({weight} AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


def md5h32_spark_sql(inner: str) -> str:
    """Spark-only spelling of the SAME hash: one md5 per row, hex-parsed
    with ``conv`` (value-identical to the polynomial — unit-asserted).
    The 8-term polynomial re-evaluates ``md5(inner)`` per term under
    Spark's codegen (no common-subexpression elimination across the
    instr/substr tree), an 8× hot-path tax; DuckDB CSEs it fine, so the
    oracle keeps the portable polynomial."""
    return f"CAST(conv(substr(md5({inner}), 1, 8), 16, 10) AS BIGINT)"


def md5h32(col_expr: str) -> Column:
    """Spark Column version of the 32-bit md5 hash (single-md5 fast form)."""
    return F.expr(md5h32_spark_sql(col_expr))


# Affine re-hash family for minhash: h_i(x) = (a_i * x + b_i) mod p.
# p = 2^31 - 1 (Mersenne prime); a_i, b_i are fixed odd constants derived
# from a deterministic LCG so Spark and the oracle agree exactly.
MERSENNE_31 = (1 << 31) - 1


def minhash_params(num_hashes: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MERSENNE_31 - 2)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_31
        params.append((a, b))
    return params


def affine_hash_sql(h_expr: str, a: int, b: int) -> str:
    """(a*h + b) mod p as SQL valid in both engines (h < 2^32, a < 2^31 →
    product < 2^63: no overflow)."""
    return f"(({a} * {h_expr} + {b}) % {MERSENNE_31})"
