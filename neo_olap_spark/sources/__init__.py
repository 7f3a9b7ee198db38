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


def write_parquet_tuned(
    df: DataFrame,
    path: str,
    compression: str = "zstd",
    max_records_per_file: int = 0,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Production parquet sink with explicit layout knobs.

    - ``compression='zstd'``: ~30% smaller than snappy at comparable
      decode speed — at 100 TB that's tens of TB of storage and
      proportional scan I/O saved.
    - ``max_records_per_file``: bounds file size so downstream scans
      get even split sizes (a few huge files serialize the scan; a
      million tiny ones drown the driver in task scheduling — the
      parquet-era version of the reference's ArrayStore chunking,
      ArrayStore.java:23-25).
    - ``partition_by``: hive-style directory partitioning; equality
      predicates on these columns become directory pruning (zero I/O
      for excluded partitions) rather than row-group skipping.
    """
    w = df.write.mode("overwrite").option("compression", compression)
    if max_records_per_file > 0:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ~target-sized files. A streaming sink or per-batch writer leaves
    one file per trigger; a year of 1-minute micro-batches is 500k
    tiny files, and at 100 TB the driver spends longer listing them
    than reading them. The row count is one metadata read (parquet
    row-group stats, no data scan). Returns the file count written.

    Single-file output uses ``coalesce(1)`` (merges input splits in
    place, no shuffle). Multi-file output uses ``repartition`` — a
    full round-robin shuffle, deliberately: coalesce only glues
    adjacent input splits, so skewed inputs (one 10 GB file among
    thousands of 1 MB ones) come back out skewed, and the whole point
    of compaction is even scan splits. One extra shuffle at write time
    buys balanced files for every future read."""
    df = spark.read.parquet(src)
    n_rows = df.count()
    n_files = max(1, (n_rows + target_rows_per_file - 1) // target_rows_per_file)
    if n_files == 1:
        df = df.coalesce(1)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst)
    import glob

    return len(glob.glob(f"{dst}/part-*.parquet"))


def write_bucketed(
    df: DataFrame, table_name: str, path: str, bucket_col: str, n_buckets: int
) -> None:
    """Bucketed parquet table (hash-bucketed + sorted by the join key).

    Bucketing pre-shuffles the data ONCE at write time: a join or
    aggregation on the bucket column needs NO exchange at read time —
    both sides' bucket i files pair directly. At 100 TB this converts
    every recurring fact-fact join on the bucketed key from a full
    shuffle into a local merge; it's the storage-layout analog of the
    reference pre-partitioning its node-ID space into rounds
    (Runner.java:227-275). Registered as an external table so the data
    lives at ``path``, not the session warehouse."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)
