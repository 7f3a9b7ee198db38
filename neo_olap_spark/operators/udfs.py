"""UDF surface demo (SURVEY.md §2.3 / §7.4 policy).

Policy: built-ins first, always — they get whole-stage codegen and
pushdown. When Python is genuinely needed, the only acceptable shape is
an Arrow-batched ``pandas_udf`` (vectorized over numpy, ~10-100× faster
than row-at-a-time Python UDFs). This module is the demo key proving
the engine's UDF plumbing: a vectorized numeric kernel whose result is
still oracle-checkable because the math is deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from neo_olap_spark.registry import query
from neo_olap_spark.tables import load


def logistic_score_udf():
    """Vectorized logistic scoring kernel: sigmoid(10·discount − 5·tax).

    Arrow moves the columns as numpy arrays; the whole batch is one
    numpy expression — no per-row Python. Built lazily because
    ``pandas_udf`` resolves its return type against the active session.
    """

    @pandas_udf("double")
    def logistic_score(discount: pd.Series, tax: pd.Series) -> pd.Series:
        z = 10.0 * discount.to_numpy() - 5.0 * tax.to_numpy()
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return logistic_score


@query(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(1.0 / (1.0 + exp(-(10.0 * l_discount - 5.0 * l_tax))), 6) AS score
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF over lineitem — the one sanctioned UDF
    shape (SURVEY.md §7.4). The filter still pushes down to the scan;
    only the surviving rows cross the JVM↔Arrow boundary."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    score = logistic_score_udf()
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(score(F.col("l_discount"), F.col("l_tax")), 6).alias("score"),
    )
