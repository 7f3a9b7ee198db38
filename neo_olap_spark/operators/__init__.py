"""Operator modules. Importing this package registers every query."""

from neo_olap_spark.operators import (  # noqa: F401
    graph_algos,
    relational,
    scalars,
    streaming,
)
