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
from pyspark.sql.types import ArrayType, MapType, StructType

from neo_olap_spark.tables import TABLES

#: Top-level output column types the driver's canonicalizer cannot
#: sort/hash (pandas sort_values factorizes object columns; a
#: list/dict cell raises `TypeError: unhashable type`). No registered
#: query may emit them — serialize to CSV (concat_ws on the Spark
#: side, array_to_string in the oracle) instead.
COMPOSITE_TYPES = (ArrayType, MapType, StructType)


def assert_no_composite_output(df: DataFrame, key: str = "<query>") -> None:
    """Raise if the DataFrame's top-level schema contains a composite
    (array/map/struct) column. Enforced at three choke points so an
    array-emitting key fails at commit time, never in the driver wave
    (the round-7 q_text_postings / q_multimodal_scenes lesson):
    assert_parity (the test suite), tools/correctness_local.py (the
    ledger), and tests/test_parity.py::test_no_composite_output_columns
    (registry-wide over the committed ledger's recorded schemas)."""
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, COMPOSITE_TYPES)
    ]
    if bad:
        raise AssertionError(
            f"{key}: output schema contains composite column(s) the "
            f"driver's canonicalizer cannot sort/hash: {bad}. Emit a "
            f"CSV string (sort numerically FIRST, then concat_ws / "
            f"array_to_string) instead."
        )


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows.

    Row sorting happens on the RAW (pre-stringify) columns, exactly
    like the driver's canonicalizer: a composite cell (list/dict/
    ndarray — e.g. an ARRAY output column) makes pandas sort_values
    raise `TypeError: unhashable type`, and that crash MUST reproduce
    locally so an array-emitting key fails at commit time, not in the
    driver wave (round-7 lesson: q_text_postings/q_multimodal_scenes
    were ledger-green but driver-red because this function used to
    stringify object columns before sorting). Stringification of
    object columns happens AFTER the sort, for value comparison only.
    """
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("boolean")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True, na_position="last")
    for c in pdf.columns:
        if not (
            pd.api.types.is_float_dtype(pdf[c])
            or pd.api.types.is_integer_dtype(pdf[c])
            or pd.api.types.is_bool_dtype(pdf[c])
        ):
            pdf[c] = pdf[c].astype("string")
    return pdf


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
    assert_no_composite_output(spark_df)
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
