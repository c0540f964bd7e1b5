"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row count + schema-insensitive value hash with columns sorted by name and
rows sorted by all values. Used by tests and by ad-hoc verification."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif str(out[c].dtype).startswith(("int", "uint", "Int")):
            out[c] = out[c].astype("int64")
        elif str(out[c].dtype).startswith("float"):
            out[c] = out[c].astype("float64")
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    got = canonical(spark_df.toPandas())
    exp = canonical(oracle_pdf)
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row counts differ: {len(got)} vs {len(exp)}"
    if not got.equals(exp):
        diff = (got != exp) & ~(got.isna() & exp.isna())
        n_bad = int(diff.any(axis=1).sum())
        sample = pd.concat(
            [got[diff.any(axis=1)].head(3), exp[diff.any(axis=1)].head(3)],
            keys=["spark", "oracle"],
        )
        return False, f"{n_bad} mismatched rows\n{sample}"
    return True, f"ok ({len(got)} rows)"
