"""Strict driver-gate mirror: beyond check_correctness.py's numeric
comparison, this asserts the properties the driver's value-hash actually
depends on — pandas dtype equality, float *bit* equality, and hashable
(non-list) object columns. A query that passes here should hash-match at
the driver; one that passes only check_correctness.py may still go
driver-red (round 1: FLOOR → int64 vs float64, windowed SUM(int) →
hugeint-float, list-typed columns crashing the canonicalizer).

Usage: python tools/check_bitexact.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def check(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        return [f"rows: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        if a[c].dtype == object and any(isinstance(v, (list, np.ndarray)) for v in a[c].head(50)):
            problems.append(f"col {c}: spark side is list-typed (driver canonicalizer will crash)")
        if b[c].dtype == object and any(isinstance(v, (list, np.ndarray)) for v in b[c].head(50)):
            problems.append(f"col {c}: oracle side is list-typed (driver canonicalizer will crash)")
    if problems:
        return problems
    try:
        a, b = canon(a), canon(b)
    except TypeError as e:
        return [f"canonicalize error (driver would err too): {e}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver-gate dtype semantics (calibrated on CORRECTNESS_r01): integer
        # widths are interchangeable (int32 rnk vs int64 rank hashed equal) and
        # datetime64[ns] vs [us] compare by value (asof_join was green), but
        # int-vs-float is a REAL hash mismatch (1 vs 1.0 — math_functions was
        # red). Normalize the compatible families; flag the rest.
        if str(av.dtype) != str(bv.dtype):
            if av.dtype.kind == "i" and bv.dtype.kind == "i":
                av, bv = av.astype("int64"), bv.astype("int64")
            elif str(av.dtype).startswith("datetime64") and str(bv.dtype).startswith("datetime64"):
                av, bv = av.astype("datetime64[us]"), bv.astype("datetime64[us]")
            else:
                problems.append(f"col {c}: dtype spark={av.dtype} oracle={bv.dtype}")
                continue
        if av.dtype.kind == "f":
            x, y = av.to_numpy(), bv.to_numpy()
            nan_same = np.array_equal(np.isnan(x), np.isnan(y))
            bits_same = np.array_equal(
                np.nan_to_num(x, nan=0.0).view("u8"), np.nan_to_num(y, nan=0.0).view("u8")
            )
            if not (nan_same and bits_same):
                d = np.nanmax(np.abs(np.nan_to_num(x) - np.nan_to_num(y))) if len(x) else 0
                problems.append(f"col {c}: float bits differ (max abs diff {d:.3e})")
        else:
            sa, sb = av.astype(str), bv.astype(str)
            neq = ~((sa == sb) | (av.isna() & bv.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(f"col {c}: {int(neq.sum())} values differ, e.g. {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = [x for x in sys.argv[1:] if not os.path.isdir(x)]

    from iceberg_rust_custom_spark.queries import ORACLES, QUERIES
    from iceberg_rust_custom_spark.session import get_spark

    spark = get_spark("check_bitexact")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = only or list(QUERIES)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            a = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ROWS  {name}: {len(a)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            b = con.execute(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        problems = check(name, a, b)
        if problems:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems[:6]:
                print(f"      - {p}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(a)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
