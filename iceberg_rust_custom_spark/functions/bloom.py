"""Per-file bloom-filter sketches for planning-time equality skipping.

Beyond the reference: its file-level pruning stops at min/max bounds
(datafusion_iceberg/src/pruning_statistics.rs:129-218), which are weak for
point lookups on high-cardinality unsorted columns (every file's [min, max]
spans the key space). A small per-file bloom filter stored in the manifest
answers `col = v` with "definitely not in this file" and prunes scans to
O(true matches + false-positive files) — the Iceberg ecosystem solves this
with parquet row-group blooms, but those still require opening every file;
a manifest-level bloom skips before any data IO, which is what matters when
the file listing itself is the 100 TB bottleneck.

Design:
* m bits (default 1024 = 16 longs — ~1% FP at ~100 distinct values/file
  with k=3; property-tunable), k=3 via Kirsch-Mitzenmacher double hashing
  from ONE murmur3_32, so the Spark build side and the Python probe side
  share a single hash implementation (metadata/transforms.py — the same
  murmur3 as the bucket transform, Iceberg's single-value encoding).
* Build is a distributed Spark aggregation over only the bloom columns:
  per-row word masks (pure codegen for numeric/date/timestamp via
  murmur3_32_long_expr; Arrow-batched pandas UDF for strings) → bit_or per
  (file, word). One narrow extra pass per write, no driver data movement.
* Probe is driver-side at plan time: murmur3 the literal, test k bits.
"""

from __future__ import annotations

import struct
import urllib.parse

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.metadata.transforms import (
    murmur3_32,
    murmur3_32_long_expr,
)

BLOOM_K = 3
DEFAULT_BLOOM_BITS = 1024
_M31 = 0x7FFFFFFF

# column type groups sharing the long-encoded hash path
_LONGISH = ("int", "long")


def bloom_positions(h32: int, m_bits: int) -> list[int]:
    """k bit positions from one 32-bit hash (double hashing)."""
    h1 = h32 & _M31
    h2 = (h1 >> 15) | 1
    return [(h1 + i * h2) % m_bits for i in range(BLOOM_K)]


def value_hash_python(value, type_name: str) -> int | None:
    """Driver-side hash of a predicate literal, matching the Spark build
    side exactly (Iceberg single-value encoding, values.rs:86-110)."""
    import datetime as _dt

    if value is None:
        return None
    if type_name in _LONGISH:
        return murmur3_32(struct.pack("<q", int(value)))
    if type_name == "date":
        if isinstance(value, str):
            value = _dt.date.fromisoformat(value)
        days = (value - _dt.date(1970, 1, 1)).days
        return murmur3_32(struct.pack("<q", days))
    if type_name == "string":
        return murmur3_32(str(value).encode("utf-8"))
    return None  # unsupported type → no bloom


def supports_bloom(type_name: str) -> bool:
    # timestamps excluded: the NTZ/TZ epoch convention would have to match
    # bit-exactly between the Spark build side and the Python probe side
    return type_name in _LONGISH or type_name in ("date", "string")


def _hash_expr(col: Column, type_name: str) -> Column:
    """murmur3_32 of a column under the same encoding as value_hash_python."""
    if type_name in _LONGISH:
        return murmur3_32_long_expr(col)
    if type_name == "date":
        return murmur3_32_long_expr(F.datediff(col, F.lit("1970-01-01")))
    if type_name == "string":

        @F.pandas_udf("long")
        def _mm3(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: None if v is None else murmur3_32(str(v).encode("utf-8"))
            ).astype("Int64")

        return _mm3(col)
    raise ValueError(f"bloom unsupported for type {type_name}")


def bloom_may_contain(words: list[int], h32: int, m_bits: int) -> bool:
    for pos in bloom_positions(h32, m_bits):
        if not (words[pos >> 6] >> (pos & 63)) & 1:
            return False
    return True


def _norm_path(p: str) -> str:
    """input_file_name() returns a file: URI; manifest paths are plain."""
    if p.startswith("file:"):
        return urllib.parse.unquote(urllib.parse.urlparse(p).path)
    return p


def compute_file_blooms(
    df: DataFrame, cols_types: dict[str, str], m_bits: int = DEFAULT_BLOOM_BITS
) -> dict[str, dict[str, list[int]]]:
    """Distributed build: {file_path: {col: [m/64 longs]}}.

    Shape: project (file, k-positions per col) → per-row word masks →
    groupBy(file).agg(bit_or per word). Shuffle is #files × #words longs —
    metadata-scale regardless of data size."""
    n_words = m_bits // 64
    sel = [F.input_file_name().alias("_file")]
    for col, tname in cols_types.items():
        h1 = _hash_expr(F.col(col), tname).bitwiseAND(F.lit(_M31))
        sel.append(h1.alias(f"_h1_{col}"))
    proj = df.select(*sel)
    # k positions per column as named long columns (h2 = (h1>>15)|1)
    pos_cols = []
    for col in cols_types:
        h1 = F.col(f"_h1_{col}")
        h2 = F.shiftrightunsigned(h1, 15).bitwiseOR(F.lit(1))
        for i in range(BLOOM_K):
            pos_cols.append(F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).alias(f"_p_{col}_{i}"))
    proj = proj.select("_file", *pos_cols)
    # per-row word masks: word = pos div 64, bit = pos % 64
    mask_cols = []
    for col in cols_types:
        for j in range(n_words):
            parts = [
                f"IF(_p_{col}_{i} IS NOT NULL AND _p_{col}_{i} div 64 = {j}, "
                f"shiftleft(1L, CAST(_p_{col}_{i} % 64 AS INT)), 0L)"
                for i in range(BLOOM_K)
            ]
            mask_cols.append(F.expr(" | ".join(parts)).alias(f"_m_{col}_{j}"))
    masked = proj.select("_file", *mask_cols)
    agg = masked.groupBy("_file").agg(
        *[
            F.bit_or(F.col(f"_m_{col}_{j}")).alias(f"_b_{col}_{j}")
            for col in cols_types
            for j in range(n_words)
        ]
    )
    out: dict[str, dict[str, list[int]]] = {}
    for row in agg.collect():
        d = row.asDict()
        out[_norm_path(d["_file"])] = {
            col: [d[f"_b_{col}_{j}"] or 0 for j in range(n_words)] for col in cols_types
        }
    return out
