"""Order-insensitive Spark-vs-DuckDB result comparison (mirrors the
driver's correctness gate: row-count + schema + sorted-value equality)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    # The driver's value-hash is representation-sensitive: a DuckDB HUGEINT
    # (-> float64/object in pandas) vs a Spark BIGINT (int64) hash-mismatches
    # even when values are equal.  Flag any dtype divergence so local runs
    # predict the driver gate (round-1 lesson: q_scalar_math et al.).
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb and not ({ka, kb} <= {"i", "u"}):
            problems.append(f"col {c}: dtype kind spark={a[c].dtype} duck={b[c].dtype}")
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(dtype=object), b[c].to_numpy(dtype=object)
            neq = []
            for i, (x, y) in enumerate(zip(av, bv)):
                if isinstance(x, float) and isinstance(y, float):
                    if not (np.isnan(x) and np.isnan(y)) and abs(x - y) > 1e-9:
                        neq.append((i, x, y))
                elif (x is None or x != y) and not (x is None and y is None):
                    if pd.isna(x) and pd.isna(y):
                        continue
                    neq.append((i, x, y))
            if neq:
                problems.append(f"col {c}: {len(neq)} mismatches, first: {neq[:3]}")
    return problems
