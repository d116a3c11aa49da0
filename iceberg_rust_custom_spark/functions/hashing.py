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


def md5h32(col_expr: str) -> Column:
    """Spark Column version of md5h32_sql (still pure JVM expressions)."""
    return F.expr(md5h32_sql(col_expr))


def stable_token_hash(col: Column) -> Column:
    """Hash a token column → 32-bit int, JVM-side."""
    return F.expr(md5h32_sql("__token__")).alias("h")  # placeholder; prefer md5h32


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
