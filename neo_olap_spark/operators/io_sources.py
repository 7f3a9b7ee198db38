"""CSV/JSON source-sink roundtrip queries (SURVEY.md §2.3 scans table).

Each writes a dimension table out in the interchange format, reads it
back with an explicit schema, and returns the full content — so the
oracle hash-match proves the roundtrip is lossless, not just countable.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from neo_olap_spark.registry import query
from neo_olap_spark.sources import read_csv, read_json, write_csv, write_json
from neo_olap_spark.tables import load


@query("q_source_csv", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source roundtrip of the nation dim (explicit schema,
    header on; quoting handles embedded delimiters)."""
    n = load(spark, sf_dir, "nation")
    out = tempfile.mkdtemp(prefix="neo_olap_csv_") + "/nation"
    write_csv(n, out)
    return read_csv(spark, out, n.schema)


@query("q_source_json", oracle="SELECT r_regionkey, r_name FROM region")
def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source roundtrip of the region dim (explicit
    schema — inference would be an extra full pass at scale)."""
    r = load(spark, sf_dir, "region")
    out = tempfile.mkdtemp(prefix="neo_olap_json_") + "/region"
    write_json(r, out)
    return read_json(spark, out, r.schema)


@query(
    "q_source_orc",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source roundtrip of the supplier dim — the second
    columnar format (row-group pruning and column projection work the
    same as parquet; zlib-compressed, splittable)."""
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = tempfile.mkdtemp(prefix="neo_olap_orc_") + "/supplier"
    s.write.mode("overwrite").orc(out)
    return spark.read.schema(s.schema).orc(out)
