"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + column names + order-insensitive values.

Usage: python tools/check_oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWCOUNT MISMATCH spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            import numpy as np

            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                bad = (~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True)).idxmax()
                return f"VALUE MISMATCH col={c} row={bad}: spark={av[bad]!r} duck={bv[bad]!r}"
        else:
            if not av.equals(bv.astype(av.dtype) if av.dtype != bv.dtype else bv):
                neq = (av.astype(str) != bv.astype(str))
                if neq.any():
                    bad = neq.idxmax()
                    return f"VALUE MISMATCH col={c} row={bad}: spark={av[bad]!r} duck={bv[bad]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # oracles that read derived parquet (e.g. law_chunks' normalized table)
    # must derive it from the SAME sf as the Spark queries
    os.environ["DOCLING_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as E
    from docling_spark.session import get_spark

    spark = get_spark(app="oracle_parity", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    unknown = only - set(qs)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        failures += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            print(f"{name:26s} SPARK ERROR: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:26s} rows-only: {len(spark_pdf)} rows "
                  f"({'OK' if len(spark_pdf) > 0 else 'EMPTY!'})")
            if len(spark_pdf) == 0:
                failures += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"{name:26s} DUCK ERROR: {str(exc)[:160]}")
            failures += 1
            continue
        verdict = compare(name, spark_pdf, duck_pdf)
        print(f"{name:26s} {len(spark_pdf):7d} rows  {verdict}")
        if verdict != "OK":
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
