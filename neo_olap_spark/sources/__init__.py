"""Secondary source/sink formats (SURVEY.md §2.3: CSV/JSON).

Parquet is the primary format (columnar, splittable, pushdown-friendly
— see tables.py); CSV and JSON are interchange formats. Both writers
produce directories of part files (splittable across executors), and
both readers take an explicit schema — schema inference is a full extra
pass over the data and is never acceptable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str) -> None:
    # ignore*WhiteSpace default TRUE on write — silently trims values;
    # disabled so whitespace-bearing strings roundtrip (caught by the
    # hypothesis roundtrip property test)
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    # multiLine: records may span lines (quoted embedded newlines);
    # without it the reader splits mid-record
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)
