"""Subquery shapes: scalar subqueries and correlated subqueries,
expressed as the decorrelated plans Spark should run at scale.

The reference has no subquery machinery (its queries are imperative
Java loops), but any engine a warehouse user would switch to needs the
two canonical shapes:

- scalar subquery   -> aggregate-to-one-row + broadcast join (the
  1-row "subquery result" ships to every executor; the fact table
  never shuffles for the comparison);
- correlated subquery -> decorrelation into a window aggregate over
  the correlation key (one shuffle on the key, vs naive per-row
  re-execution). This is the rewrite Catalyst itself applies to
  `spark.sql` correlated subqueries; we express it directly so the
  plan is visible and testable.

Both oracle-checked against DuckDB's native subquery execution, so the
decorrelated plans are verified equivalent to the textbook semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from neo_olap_spark.functions import money_sum
from neo_olap_spark.registry import query
from neo_olap_spark.tables import load


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_above,
           CAST(CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_above
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above the global average,
    aggregated by priority.

    Scale shape: the scalar (a 1-row aggregate) is computed with a
    full map-side partial + single-row final, then broadcast; the
    orders scan is read twice but never shuffled for the comparison —
    the filter is a broadcast nested-loop over one row, fused into the
    scan's codegen stage. The only real shuffle is the tiny final
    groupBy on priority (5 groups).
    """
    o = load(spark, sf_dir, "orders")
    global_avg = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        o.join(F.broadcast(global_avg))
        .where(F.col("o_totalprice") > F.col("_avg"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_above"),
            money_sum("o_totalprice").alias("sum_above"),
        )
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT o.o_custkey,
           COUNT(*) AS n_above,
           CAST(CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_above
    FROM orders o
    WHERE o.o_totalprice > (SELECT AVG(o2.o_totalprice)
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
    GROUP BY o.o_custkey
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders priced above their own
    customer's average order price, aggregated per customer.

    Decorrelation: the per-row correlated aggregate becomes a window
    average over the correlation key (`o_custkey`). One shuffle keyed
    on the customer; the subsequent groupBy reuses that partitioning
    (Exchange reuse — no second shuffle), vs the naive plan's
    per-order re-aggregation. Customers whose every order ties the
    average (single-order customers) drop out in both engines: avg of
    one value equals the value, and the comparison is strict.
    """
    o = load(spark, sf_dir, "orders")
    cust_avg = F.avg("o_totalprice").over(W.partitionBy("o_custkey"))
    return (
        o.withColumn("_avg", cust_avg)
        .where(F.col("o_totalprice") > F.col("_avg"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_above"),
            money_sum("o_totalprice").alias("sum_above"),
        )
    )
