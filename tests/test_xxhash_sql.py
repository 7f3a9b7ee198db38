"""The DuckDB xxhash64 pipelines must be BIT-EXACT with Spark's
xxhash64 — the random-walk oracle (and any future MinHash/SimHash
twin) replays seeded trajectories through them, where a single flipped
bit silently diverges the whole walk. Spark is the ground truth; the
Python reference in functions/xxhash_sql.py is the literal-precompute
anchor checked against both."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from neo_olap_spark.functions.xxhash_sql import (
    spark_xxhash64,
    xxhash64_sql,
)

# negatives, zero, int/long extremes, the graph-offset range
INTS = [0, 1, -1, 7, 255, 2**31 - 1, -(2**31), 12345]
LONGS = [0, 1, -1, 2**40 + 17, 2**41 + 3, 2**63 - 1, -(2**63), 987654321012]


def test_python_reference_matches_spark(spark):
    rows = [(i, l) for i in INTS for l in LONGS]
    df = spark.createDataFrame(rows, "i int, l long").select(
        "i",
        "l",
        F.xxhash64("i").alias("hi"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("l", "i").alias("hli"),
        F.xxhash64("i", "l", F.lit(42)).alias("hil42"),
    )
    for r in df.collect():
        assert r.hi == spark_xxhash64([(r.i, "int")])
        assert r.hl == spark_xxhash64([(r.l, "long")])
        assert r.hli == spark_xxhash64([(r.l, "long"), (r.i, "int")])
        assert r.hil42 == spark_xxhash64(
            [(r.i, "int"), (r.l, "long"), (42, "int")]
        )


@pytest.mark.parametrize(
    "inputs",
    [
        [("i", "int")],
        [("l", "long")],
        [("l", "long"), ("42", "int")],
        [("i", "int"), ("l", "long"), ("i", "int")],
    ],
)
def test_duckdb_pipeline_matches_python(inputs):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT i, l FROM "
        f"(SELECT CAST(unnest({INTS!r}) AS INT) AS i) ti, "
        f"(SELECT CAST(unnest({LONGS!r}) AS BIGINT) AS l) tl"
    )
    sql = xxhash64_sql("t", ["i", "l"], inputs, "h")
    for i, l, h in con.sql(sql).fetchall():  # noqa: E741
        vals = [
            (
                {"i": i, "l": l, "42": 42}[e],
                t,
            )
            for e, t in inputs
        ]
        assert h == spark_xxhash64(vals), (i, l, inputs)


def test_trunc_div_sql_negatives_agree_cross_engine(spark):
    """trunc_div_sql must compute the IDENTICAL value under DuckDB //
    (floor) and Spark ANSI div (truncate) — the negate-divide-negate
    form exists exactly for the negative-numerator case where the two
    operators diverge (floor(-7/2) = -4 vs trunc(-7/2) = -3)."""
    import duckdb

    from neo_olap_spark.functions import trunc_div_sql

    cases = [(-7, 2), (7, 2), (-7, 7), (-1, 3), (0, 5), (-100, 3), (99, 100)]
    spark_rows = spark.createDataFrame(cases, "num long, den long").selectExpr(
        "num", "den", f"{trunc_div_sql('num', 'den', 'div')} AS q"
    ).collect()
    con = duckdb.connect()
    for r in spark_rows:
        (dq,) = con.execute(
            f"SELECT {trunc_div_sql(str(r.num), str(r.den), '//')}"
        ).fetchone()
        want = int(r.num / r.den) if r.den else None  # python trunc division
        assert r.q == dq == want, (r.num, r.den, r.q, dq, want)
