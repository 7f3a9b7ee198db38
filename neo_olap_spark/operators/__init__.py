"""Operator modules. Importing this package registers every query."""

from neo_olap_spark.operators import graph_algos, relational, scalars  # noqa: F401
