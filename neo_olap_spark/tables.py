"""Table loaders for the driver-generated star schema (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets column
pruning + predicate pushdown for free — the Spark-native equivalent of
the reference's light-record pre-projection before full materialization
(RelationshipPreloader.java:18-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _enable_nanos_as_long(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet columns readable on ANY session.

    ``events.parquet`` stores nanosecond timestamps, which Spark rejects
    outright (PARQUET_TYPE_ILLEGAL) unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set. Our own session
    factory sets it at build time (session.py), but callers (the driver
    harness, notebooks) may hand us a bare SparkSession — the conf is
    runtime-settable, so set it here at read time.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from a scale-factor directory."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        _enable_nanos_as_long(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) read as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong); convert to a proper
        # timestamp (micros precision, session TZ = UTC).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: double division loses precision at 1e18 nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-path queries work."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
