"""Local parity harness: replicate the driver's Spark-vs-DuckDB check.

Used by tests/test_parity.py so every registered query is verified
against its oracle before commit — stricter than the driver (exact
match after canonicalization, tiny float tolerance).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from neo_olap_spark.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
        else:
            pdf[c] = s.astype("string")
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True, na_position="last")


def _column_matches(ls: pd.Series, rs: pd.Series, rtol: float) -> bool:
    """Value-equality for one canonicalized column pair (floats get a
    tiny tolerance, NaN==NaN; everything else exact)."""
    if pd.api.types.is_float_dtype(ls):
        both_nan = ls.isna() & rs.isna()
        close = np.isclose(
            ls.fillna(0.0), rs.fillna(0.0), rtol=rtol, atol=1e-9
        ) & ~(ls.isna() ^ rs.isna())
        return bool((close | both_nan).all())
    return bool(ls.equals(rs))


def compare_frames(
    left: pd.DataFrame, right: pd.DataFrame, rtol: float = 1e-9
) -> tuple[bool, bool, bool]:
    """(rows_match, schema_match, hash_match) over two CANONICALIZED
    frames — the single comparison used by both assert_parity (the
    test suite) and tools/correctness_local.py (the checked-in
    ledger), so the two can never diverge in semantics."""
    rows = len(left) == len(right)
    schema = list(left.columns) == list(right.columns)
    if not (rows and schema):
        return rows, schema, False
    values = all(_column_matches(left[c], right[c], rtol) for c in left.columns)
    return rows, schema, values


def assert_parity(spark_df: DataFrame, oracle: str, sf_dir: str, rtol: float = 1e-9) -> None:
    left = _canon(spark_df.toPandas())
    con = duck_connect(sf_dir)
    right = _canon(con.execute(oracle).fetchdf())
    con.close()

    assert list(left.columns) == list(right.columns), (
        f"column mismatch: spark={list(left.columns)} oracle={list(right.columns)}"
    )
    assert len(left) == len(right), f"row count mismatch: spark={len(left)} oracle={len(right)}"
    for c in left.columns:
        if not _column_matches(left[c], right[c], rtol):
            diff = (
                left[c].compare(right[c])
                if not pd.api.types.is_float_dtype(left[c])
                else None
            )
            raise AssertionError(
                f"value mismatch in column {c!r}:\n{diff}\n{left[c]}\n{right[c]}"
            )
