"""Local mirror of the driver's t2 correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    import numpy as np

    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
                af = av.astype(float)
                bf = bv.astype(float)
                mask = ~(af.isna() & bf.isna())
                diff = (af[mask] - bf[mask]).abs()
                if len(diff) and diff.max() > 0:
                    problems.append(f"col {c}: max abs diff {diff.max():.3e} ({int((diff > 0).sum())} rows differ)")
            else:
                neq = ~((av == bv) | (av.isna() & bv.isna()))
                if neq.any():
                    i = neq.idxmax()
                    problems.append(f"col {c}: {int(neq.sum())} values differ, e.g. {av[i]!r} vs {bv[i]!r}")
        except Exception as e:
            problems.append(f"col {c}: compare error {e}")
    return problems


def compare_band(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, spec: dict) -> list[str]:
    """Tolerance comparison for the approximate family (VERDICT r10 #4):
    row count and non-band columns exact; band columns within
    max(abs_tol, rel_tol·|exact|), elementwise for array cells."""
    import numpy as np

    cols = spec.get("cols") or sorted(oracle_pdf.columns)
    missing = [c for c in cols if c not in spark_pdf.columns]
    if missing:
        return [f"spark output lacks columns {missing}"]
    spark_pdf = spark_pdf[cols]
    oracle_pdf = oracle_pdf[[c for c in cols]]
    if len(spark_pdf) != len(oracle_pdf):
        return [f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"]
    rel, ab = spec.get("rel", {}), spec.get("abs", {})
    keys = [c for c in cols if c not in rel and c not in ab]
    # row alignment needs unique exact keys — a tolerant column can't align
    if not keys:
        return ["band spec needs at least one exact (non-band) key column"]
    if oracle_pdf.duplicated(subset=keys).any():
        return [f"band key columns {keys} are not unique in the oracle result"]
    a = spark_pdf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    b = oracle_pdf.sort_values(by=keys, kind="mergesort").reset_index(drop=True)
    problems = []
    for c in keys:
        neq = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
        if neq.any():
            i = neq.idxmax()
            problems.append(f"key col {c}: {a[c][i]!r} vs {b[c][i]!r}")
    for c in set(rel) | set(ab):
        r, t = rel.get(c, 0.0), ab.get(c, 0.0)
        for i in range(len(a)):
            sv, ov = a[c][i], b[c][i]
            sv = list(sv) if isinstance(sv, (list, tuple, np.ndarray)) else [sv]
            ov = list(ov) if isinstance(ov, (list, tuple, np.ndarray)) else [ov]
            if len(sv) != len(ov):
                problems.append(f"col {c} row {i}: array length {len(sv)} vs {len(ov)}")
                continue
            for s, o in zip(sv, ov):
                tol = max(t, r * abs(float(o)))
                if abs(float(s) - float(o)) > tol:
                    problems.append(
                        f"col {c} row {i}: {s} vs exact {o} (tol {tol:.4g})"
                    )
                    break
    return problems


def compare_recall(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, spec: dict):
    """(recall, n_exact, problem|None) against an EXACT reference set
    (r12, VERDICT r11 #5). Modes:

    * ``key_overlap``      — fraction of the oracle's key tuples present
      in the Spark result's key tuples (exact vs approx top-k);
    * ``pair_overlap``     — same over UNORDERED (id_a, id_b) pairs;
    * ``pairs_same_group`` — fraction of oracle pairs whose two ids map
      to the SAME group in the Spark result (spec id_col → group_col).

    An empty oracle set passes vacuously (nothing to recall)."""
    mode = spec["mode"]
    floor = float(spec["min_recall"])
    if not len(oracle_pdf):
        return 1.0, 0, None
    if mode == "key_overlap":
        keys = spec["keys"]
        want = set(map(tuple, oracle_pdf[keys].itertuples(index=False)))
        got = set(map(tuple, spark_pdf[keys].itertuples(index=False)))
        recall = len(want & got) / len(want)
    elif mode == "pair_overlap":
        ka, kb = spec["keys"]
        want = {
            (min(a, b), max(a, b))
            for a, b in zip(oracle_pdf[ka], oracle_pdf[kb])
        }
        got = {
            (min(a, b), max(a, b))
            for a, b in zip(spark_pdf[ka], spark_pdf[kb])
        }
        recall = len(want & got) / len(want)
    elif mode == "pairs_same_group":
        grp = dict(zip(spark_pdf[spec["id_col"]], spark_pdf[spec["group_col"]]))
        same = sum(
            1
            for a, b in zip(oracle_pdf["id_a"], oracle_pdf["id_b"])
            if a in grp and b in grp and grp[a] == grp[b]
        )
        recall = same / len(oracle_pdf)
    else:
        return 0.0, len(oracle_pdf), f"unknown recall mode {mode!r}"
    if recall < floor:
        return recall, len(oracle_pdf), (
            f"recall {recall:.3f} below floor {floor} over {len(oracle_pdf)} exact rows"
        )
    return recall, len(oracle_pdf), None


def main():
    # default to sf0.01 — the scale the driver gates at; sf0.001 is too small
    # to surface tie-ordering and float-conversion mismatches
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    from iceberg_rust_custom_spark.queries import (
        BAND_ORACLES,
        ORACLES,
        QUERIES,
        RECALL_ORACLES,
    )
    from iceberg_rust_custom_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = only or list(QUERIES)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in ORACLES:
            if name in BAND_ORACLES:
                spec = BAND_ORACLES[name]
                try:
                    oracle_pdf = con.execute(spec["sql"]).df()
                except Exception as e:
                    print(f"FAIL  {name}: band oracle error: {str(e).splitlines()[0][:160]}")
                    n_fail += 1
                    continue
                problems = compare_band(name, spark_pdf, oracle_pdf, spec)
                if problems:
                    print(f"FAIL  {name} (band) [{time.time()-t0:.1f}s]")
                    for p in problems[:4]:
                        print(f"      - {p}")
                    n_fail += 1
                else:
                    print(
                        f"BAND  {name}: {len(spark_pdf)} rows within tolerance "
                        f"[{time.time()-t0:.1f}s]"
                    )
                    n_pass += 1
                continue
            if name in RECALL_ORACLES:
                spec = RECALL_ORACLES[name]
                try:
                    oracle_pdf = con.execute(spec["sql"]).df()
                except Exception as e:
                    print(f"FAIL  {name}: recall oracle error: {str(e).splitlines()[0][:160]}")
                    n_fail += 1
                    continue
                recall, n_exact, problem = compare_recall(name, spark_pdf, oracle_pdf, spec)
                if problem:
                    print(f"FAIL  {name} (recall) [{time.time()-t0:.1f}s]")
                    print(f"      - {problem}")
                    n_fail += 1
                else:
                    print(
                        f"RECALL {name}: {recall:.3f} >= {spec['min_recall']} "
                        f"over {n_exact} exact rows [{time.time()-t0:.1f}s]"
                    )
                    n_pass += 1
                continue
            print(f"ROWS  {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            oracle_pdf = con.execute(ORACLES[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems[:4]:
                print(f"      - {p}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
